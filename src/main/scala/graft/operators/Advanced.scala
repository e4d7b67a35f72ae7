package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables
import graft.Catalog.Q

/** Typed-UDAF input: price in exact cents, integral quantity. */
final case class PriceQty(price_cents: Long, qty: Long)

/** Quantity-weighted mean price as a typed Aggregator — the
  * `Aggregator[IN, BUF, OUT]` surface (SURVEY.md §2.2 "UDAF: none
  * exposed"). Exact integer accumulation, one double division at
  * finish, so the result is bit-portable to the oracle. Spark plans
  * udaf() calls as a regular two-phase (partial + final) aggregate —
  * same shuffle shape as built-in sum.
  */
object WeightedMeanPrice extends Aggregator[PriceQty, (Long, Long), Double] {
  override def zero: (Long, Long) = (0L, 0L)
  override def reduce(b: (Long, Long), a: PriceQty): (Long, Long) =
    (b._1 + a.price_cents * a.qty, b._2 + a.qty)
  override def merge(x: (Long, Long), y: (Long, Long)): (Long, Long) =
    (x._1 + y._1, x._2 + y._2)
  override def finish(b: (Long, Long)): Double =
    b._1.toDouble / 100.0 / b._2.toDouble
  override def bufferEncoder: Encoder[(Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

/** Advanced operator breadth: JSON extraction, pivot, approximate
  * distinct (HLL), as-of join, typed UDAF.
  */
object Advanced {

  /** JSON field extraction from the events `props` column — both the
    * string-path form (get_json_object) and the typed form
    * (from_json with an explicit schema). Codegen'd, no UDF.
    */
  def q21JsonFuncs(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast(LongType).as("k_path"),
        from_json(col("props"), StructType(Seq(StructField("k", LongType))))
          .getField("k").as("k_typed"))
      .withColumn("k_sq", col("k_typed") * col("k_typed"))
      .orderBy(col("event_id"))

  /** Approximate COUNT(DISTINCT) via HyperLogLog++ — the 100 TB
    * cardinality-estimation path: a fixed-size sketch that merges
    * map-side, vs exact distinct's full shuffle of every distinct
    * key. The judged query is HLL-ONLY (an exact count alongside it
    * would be the bottleneck and defeat the operator's point at
    * scale); AdvancedSpec bounds the sketch's relative error against
    * the exact count at test scale instead. No cross-engine oracle
    * (HLL sketches differ by implementation) — rows-only judged.
    */
  def q22ApproxDistinct(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"))
      .orderBy(col("l_returnflag"))

  /** As-of join: each event picks up the user's most recent order at
    * or before the event time (orders deduped per (custkey, date) so
    * the as-of choice is well-defined). Oracle is DuckDB's native
    * ASOF LEFT JOIN — two independent implementations of the same
    * operator semantics.
    */
  def q23AsofJoin(s: SparkSession, d: String): DataFrame = {
    val ro = Tables.orders(s, d)
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"),
        max_by(col("o_totalprice"), col("o_orderkey")).as("o_totalprice"))
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("ts"))
    AsOfJoin.asOf(ev, ro, "user_id", "o_custkey", "ts", "o_orderdate")
      .select(col("event_id"), col("user_id"),
        col("asof.o_orderkey").as("last_orderkey"),
        col("asof.o_totalprice").as("last_order_price"))
      .orderBy(col("event_id"))
  }

  /** Pivot: quantity totals per linestatus × returnflag, explicit
    * value list so the plan is a single two-phase aggregate (an
    * unlisted-values pivot needs an extra distinct pass).
    */
  def q24Pivot(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_linestatus"))
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(sum(round(col("l_quantity")).cast(LongType)))
      .withColumnRenamed("A", "qty_a")
      .withColumnRenamed("N", "qty_n")
      .withColumnRenamed("R", "qty_r")
      .orderBy(col("l_linestatus"))

  /** Typed-Aggregator UDAF: quantity-weighted mean extended price per
    * returnflag.
    */
  def q25TypedUdaf(s: SparkSession, d: String): DataFrame = {
    val wavg = udaf(WeightedMeanPrice)
    Tables.lineitem(s, d)
      .select(col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast(LongType).as("price_cents"),
        round(col("l_quantity")).cast(LongType).as("qty"))
      .groupBy(col("l_returnflag"))
      .agg(wavg(col("price_cents"), col("qty")).as("wavg_price"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))
  }

  val queries: Seq[Q] = Seq(
    Q("q21_json_funcs", q21JsonFuncs, Some("""
      SELECT event_id,
             CAST(json_extract(props, '$.k') AS BIGINT) AS k_path,
             CAST(json_extract(props, '$.k') AS BIGINT) AS k_typed,
             CAST(json_extract(props, '$.k') AS BIGINT) *
               CAST(json_extract(props, '$.k') AS BIGINT) AS k_sq
      FROM events
      ORDER BY event_id""")),
    Q("q22_approx_distinct", q22ApproxDistinct, None), // HLL: no cross-engine oracle
    Q("q23_asof_join", q23AsofJoin, Some("""
      WITH ro AS (
        SELECT o_custkey, o_orderdate,
               max(o_orderkey) AS o_orderkey,
               max_by(o_totalprice, o_orderkey) AS o_totalprice
        FROM orders GROUP BY 1, 2)
      SELECT event_id, user_id,
             o_orderkey AS last_orderkey,
             o_totalprice AS last_order_price
      FROM events
      ASOF LEFT JOIN ro ON user_id = o_custkey AND ts >= o_orderdate
      ORDER BY event_id""")),
    Q("q24_pivot", q24Pivot, Some("""
      SELECT l_linestatus,
             CAST(sum(CASE WHEN l_returnflag = 'A' THEN CAST(round(l_quantity) AS BIGINT) END) AS BIGINT) AS qty_a,
             CAST(sum(CASE WHEN l_returnflag = 'N' THEN CAST(round(l_quantity) AS BIGINT) END) AS BIGINT) AS qty_n,
             CAST(sum(CASE WHEN l_returnflag = 'R' THEN CAST(round(l_quantity) AS BIGINT) END) AS BIGINT) AS qty_r
      FROM lineitem
      GROUP BY l_linestatus
      ORDER BY l_linestatus""")),
    Q("q25_typed_udaf", q25TypedUdaf, Some("""
      SELECT l_returnflag,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                      CAST(round(l_quantity) AS BIGINT)) AS DOUBLE) / 100.0 /
               CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS DOUBLE) AS wavg_price,
             count(*) AS n_rows
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag"""))
  )
}
