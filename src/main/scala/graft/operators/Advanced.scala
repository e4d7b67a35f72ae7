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

/** Top-k candidate row: natural key + ranking value. */
final case class TopKIn(l_orderkey: Long, l_linenumber: Int, qty: Double)

/** Bounded top-k as a typed Aggregator — the MAP-COMBINABLE top-k
  * shape: every partial buffer holds at most k rows, so each map
  * task ships ≤ k rows per group into the shuffle, vs the window-rank
  * formulation (q11) that sorts the ENTIRE table on the shuffle just
  * to throw away all but k rows per group. At 100 TB the window plan
  * shuffles 100 TB; this plan shuffles O(k × partitions × groups).
  * Global top-k already has this property built in
  * (TakeOrderedAndProject, q4) — this Aggregator is the per-GROUP
  * analog Spark lacks as a native operator.
  *
  * Ordering is total (qty desc, then the unique (orderkey,
  * linenumber) key ascending), so the result is deterministic under
  * any partitioning — the property the oracle's ROW_NUMBER replays.
  */
final class TopKByQty(k: Int)
    extends Aggregator[TopKIn, Seq[TopKIn], Seq[TopKIn]] {
  private val ord: Ordering[TopKIn] =
    Ordering.by(r => (-r.qty, r.l_orderkey, r.l_linenumber.toLong))
  override def zero: Seq[TopKIn] = Vector.empty
  override def reduce(b: Seq[TopKIn], a: TopKIn): Seq[TopKIn] =
    if (b.lengthCompare(k) >= 0 && ord.lteq(b.last, a)) b
    else ((b :+ a).sorted(ord)).take(k)
  override def merge(x: Seq[TopKIn], y: Seq[TopKIn]): Seq[TopKIn] =
    (x ++ y).sorted(ord).take(k)
  override def finish(b: Seq[TopKIn]): Seq[TopKIn] = b
  override def bufferEncoder: Encoder[Seq[TopKIn]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[TopKIn]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
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

  /** VARIANT (Spark 4's semi-structured type) over the events
    * `props` JSON — the modern successor to q21's string-path
    * extraction: `parse_json` builds a binary-encoded variant once,
    * `variant_get` reads typed paths from it without re-parsing the
    * string per path, and `try_variant_get` returns null (instead
    * of erroring) for absent paths — the schema-drift-tolerant read
    * a 100 TB semi-structured ingest needs. At scale the win is
    * structural: parse once into a columnar-shredded binary form,
    * then N typed path reads are cheap field lookups, vs N string
    * re-parses with get_json_object. The aggregate certifies both
    * the typed extraction and the absent-path null contract against
    * DuckDB's JSON replay.
    */
  def q105VariantExtract(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_type"), parse_json(col("props")).as("v"))
      .select(col("event_type"),
        expr("variant_get(v, '$.k', 'bigint')").as("k"),
        expr("try_variant_get(v, '$.missing', 'bigint')").as("miss"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        count(col("miss")).as("n_missing_present"))
      .orderBy(col("event_type"))

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
    // judged as a CERTIFICATE (the ANN-recall discipline): the exact
    // distinct count is oracle-replayable, and the sketch's relative
    // error vs it rides as a hash-checked boolean against the spec's
    // 15% bound (≈3σ at the default rsd 0.05) — an HLL regression
    // goes red at the driver, while the raw estimate (engine-specific
    // bytes, no cross-engine twin) stays out of the hash. The exact
    // count is validation-harness cost, not the operator's: a
    // deployment runs the sketch alone.
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("approx"),
        count_distinct(col("l_partkey")).as("exact_parts"))
      .select(col("l_returnflag"), col("exact_parts"),
        (abs(col("approx") - col("exact_parts")).cast("double") /
          col("exact_parts").cast("double") <= 0.15)
          .as("approx_within_15pct"))
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

  /** Unpivot (melt) — the inverse reshape of q24's pivot: the wide
    * (qty_a, qty_n, qty_r) frame back to (linestatus, flag, qty)
    * rows via the DataFrame `unpivot` verb. Null cells are coalesced
    * to 0 BEFORE melting: Spark's unpivot keeps null value cells
    * while SQL UNION-ALL unpivots (the oracle's form) and DuckDB's
    * UNPIVOT default drop them — zero-filling pins one semantics for
    * both engines. Round-tripping pivot→unpivot also certifies the
    * pivot's cell placement.
    */
  def q45Unpivot(s: SparkSession, d: String): DataFrame =
    q24Pivot(s, d)
      .select(col("l_linestatus"),
        coalesce(col("qty_a"), lit(0L)).as("qty_a"),
        coalesce(col("qty_n"), lit(0L)).as("qty_n"),
        coalesce(col("qty_r"), lit(0L)).as("qty_r"))
      .unpivot(Array(col("l_linestatus")),
        Array(col("qty_a"), col("qty_n"), col("qty_r")),
        "flag_col", "qty")
      .orderBy(col("l_linestatus"), col("flag_col"))

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

  /** Per-group top-k via the bounded [[TopKByQty]] Aggregator,
    * exploded back to scalar rows for the harness. k=3 highest
    * quantities per returnflag; ties broken by the unique line key.
    */
  def q50TopkPerGroup(s: SparkSession, d: String): DataFrame = {
    val topk = udaf(new TopKByQty(3))
    Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_orderkey"),
        col("l_linenumber"), col("l_quantity").as("qty"))
      .groupBy(col("l_returnflag"))
      .agg(topk(col("l_orderkey"), col("l_linenumber"), col("qty")).as("top"))
      .select(col("l_returnflag"), posexplode(col("top")))
      .select(col("l_returnflag"),
        (col("pos") + 1).cast(IntegerType).as("rk"),
        col("col.l_orderkey").as("l_orderkey"),
        col("col.l_linenumber").as("l_linenumber"),
        col("col.qty").as("qty"))
      .orderBy(col("l_returnflag"), col("rk"))
  }

  /** Recursive CTE (Spark 4's `WITH RECURSIVE`) — iterative graph
    * traversal expressed declaratively, the SQL-surface twin of d5's
    * DataFrame-loop connected components. The event ids form an
    * implicit binary heap (parent(i) = (i−1) div 2), and the
    * recursion walks it breadth-first from the root, labelling every
    * node with its depth; the result aggregates per level. Each
    * recursion step is one shuffle join of the frontier against the
    * (pruned, two-column) events scan — ~log₂(N) steps for a heap —
    * and Spark's recursion-level limit bounds runaway depth the same
    * way d5's convergence probe does. DuckDB runs the identical
    * recursive SQL as the oracle.
    */
  def q94RecursiveCte(s: SparkSession, d: String): DataFrame = {
    Tables.events(s, d).select(col("event_id"))
      .createOrReplaceTempView("events_rc")
    s.sql("""
      WITH RECURSIVE anc AS (
        SELECT CAST(0 AS BIGINT) AS node, CAST(0 AS BIGINT) AS depth
        UNION ALL
        SELECT e.event_id AS node, a.depth + CAST(1 AS BIGINT) AS depth
        FROM events_rc e JOIN anc a ON (e.event_id - 1) DIV 2 = a.node
        WHERE e.event_id > 0)
      SELECT depth, count(*) AS n_nodes,
             min(node) AS min_node, max(node) AS max_node
      FROM anc GROUP BY depth ORDER BY depth""")
  }

  val queries: Seq[Q] = Seq(
    Q("q94_recursive_cte", q94RecursiveCte, Some("""
      WITH RECURSIVE anc AS (
        SELECT CAST(0 AS BIGINT) AS node, CAST(0 AS BIGINT) AS depth
        UNION ALL
        SELECT e.event_id AS node, a.depth + CAST(1 AS BIGINT) AS depth
        FROM events e JOIN anc a ON (e.event_id - 1) // 2 = a.node
        WHERE e.event_id > 0)
      SELECT depth, count(*) AS n_nodes,
             min(node) AS min_node, max(node) AS max_node
      FROM anc GROUP BY depth ORDER BY depth""")),
    Q("q50_topk_per_group", q50TopkPerGroup, Some("""
      SELECT l_returnflag, rk, l_orderkey, l_linenumber, qty
      FROM (
        SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity AS qty,
               CAST(row_number() OVER (
                 PARTITION BY l_returnflag
                 ORDER BY l_quantity DESC, l_orderkey, l_linenumber)
                 AS INTEGER) AS rk
        FROM lineitem)
      WHERE rk <= 3
      ORDER BY l_returnflag, rk""")),
    Q("q21_json_funcs", q21JsonFuncs, Some("""
      SELECT event_id,
             CAST(json_extract(props, '$.k') AS BIGINT) AS k_path,
             CAST(json_extract(props, '$.k') AS BIGINT) AS k_typed,
             CAST(json_extract(props, '$.k') AS BIGINT) *
               CAST(json_extract(props, '$.k') AS BIGINT) AS k_sq
      FROM events
      ORDER BY event_id""")),
    Q("q105_variant_extract", q105VariantExtract, Some("""
      SELECT event_type,
             count(*) AS n_events,
             CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
               AS sum_k,
             CAST(min(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
               AS min_k,
             CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
               AS max_k,
             CAST(count(CASE WHEN json_extract(props, '$.missing') IS NOT NULL
                             THEN 1 END) AS BIGINT) AS n_missing_present
      FROM events
      GROUP BY event_type
      ORDER BY event_type""")),
    Q("q22_approx_distinct", q22ApproxDistinct, Some("""
      SELECT l_returnflag,
             count(DISTINCT l_partkey) AS exact_parts,
             TRUE AS approx_within_15pct
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag""")),
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
    Q("q45_unpivot", q45Unpivot, Some("""
      WITH w AS (
        SELECT l_linestatus,
               coalesce(sum(CASE WHEN l_returnflag = 'A' THEN CAST(round(l_quantity) AS BIGINT) END), 0) AS qty_a,
               coalesce(sum(CASE WHEN l_returnflag = 'N' THEN CAST(round(l_quantity) AS BIGINT) END), 0) AS qty_n,
               coalesce(sum(CASE WHEN l_returnflag = 'R' THEN CAST(round(l_quantity) AS BIGINT) END), 0) AS qty_r
        FROM lineitem
        GROUP BY l_linestatus)
      SELECT l_linestatus, flag_col, CAST(qty AS BIGINT) AS qty
      FROM (
        SELECT l_linestatus, 'qty_a' AS flag_col, qty_a AS qty FROM w
        UNION ALL
        SELECT l_linestatus, 'qty_n', qty_n FROM w
        UNION ALL
        SELECT l_linestatus, 'qty_r', qty_r FROM w)
      ORDER BY l_linestatus, flag_col""")),
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
