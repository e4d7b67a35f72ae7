package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Money
import graft.sources.Tables
import graft.Catalog.Q

/** Skew mitigation by salting: two-phase aggregation over an
  * artificial sub-key.
  *
  * A groupBy on a hot key sends every row of that key to one reduce
  * partition; with K distinct keys and N cores, N−K cores idle and
  * the hottest key sets the wall clock. Salting spreads each key
  * over `salts` partial groups (stage 1), then merges the partials
  * per real key (stage 2). Correct for any algebraic aggregate —
  * here SUM/COUNT, whose merge is SUM.
  *
  * The salt is a deterministic hash of the whole row, not rand():
  * results stay reproducible run to run (rand-based salting makes
  * retried tasks non-idempotent, which corrupts shuffle retries at
  * cluster scale).
  *
  * Note Spark's own partial (map-side) aggregation already handles
  * the pure-aggregation case well; explicit salting is the tool for
  * skewed JOIN keys and for aggregates whose partial states are too
  * big to combine map-side (large collect_set-style states). It is
  * judged here on the aggregate because that is oracle-checkable —
  * the operator is identical for the join case.
  */
object Skew {

  /** Two-phase salted SUM(cents)/COUNT per key.
    *
    * The salt is the per-partition row index (monotonically
    * increasing id = partition id << 33 | offset), NOT a hash of the
    * row: content-hash salting sends every copy of an identical row
    * to the same salted group, so a hot key whose volume is
    * duplicate rows — the common real-data skew — would still land
    * on one reducer. The row index spreads round-robin regardless of
    * content, and stays deterministic across task retries because a
    * parquet scan's partition contents and order are fixed by the
    * file splits (unlike rand(), which makes retried tasks
    * non-idempotent and corrupts shuffle retries).
    */
  def saltedSumCount(
      df: DataFrame, keys: Seq[String], cents: Column, salts: Int): DataFrame = {
    val keyCols = keys.map(col)
    val salted = df.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)))
    salted
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(sum(cents).as("__c"), count(lit(1)).as("__n"))
      .groupBy(keyCols: _*)
      .agg(sum(col("__c")).as("cents"), sum(col("__n")).as("n"))
  }

  /** Judged query: totals per order priority (5 hot keys — exactly
    * the cardinality where an unsalted shuffle would idle 27 of 32
    * cores) via the salted path; the oracle is the plain GROUP BY,
    * proving the decomposition exact.
    */
  def q27SaltedAgg(s: SparkSession, d: String): DataFrame =
    saltedSumCount(
      Tables.orders(s, d), Seq("o_orderpriority"),
      Money.cents(col("o_totalprice")), 16)
      .select(col("o_orderpriority"),
        Money.toAmount(col("cents")).as("total_price"),
        col("n").as("n_orders"))
      .orderBy(col("o_orderpriority"))

  /** Salted shuffle JOIN — the skew tool for fact ⋈ dim joins too
    * big (or too mid-plan) to broadcast: a hot fact key floods one
    * sort-merge/shuffle-hash partition; salting splits each fact key
    * across `salts` sub-partitions and REPLICATES the matching dim
    * row into each (dim side explodes ×salts, so keep salts modest —
    * the cost is salts × |dim|). Result is identical to the plain
    * join: every fact row still meets its dim row exactly once, in
    * the sub-partition its salt selected.
    */
  def saltedJoin(
      fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String, salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)))
    val saltedDim = dim
      .withColumn("__salt", explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedFact
      // force a shuffle join: broadcast would make the salt a no-op
      .join(saltedDim.hint("shuffle_hash"),
        saltedFact(factKey) === saltedDim(dimKey) &&
          saltedFact("__salt") === saltedDim("__salt"))
      .drop("__salt")
  }

  /** Judged query: events ⋈ customer through the salted join; the
    * oracle is the plain inner join, proving the salt-and-replicate
    * decomposition exact row-for-row.
    */
  def q30SaltedJoin(s: SparkSession, d: String): DataFrame =
    saltedJoin(Tables.events(s, d), Tables.customer(s, d),
      "user_id", "c_custkey", 8)
      .select(col("event_id"), col("user_id"), col("c_name"),
        col("event_type"))
      .orderBy(col("event_id"))

  val queries: Seq[Q] = Seq(
    Q("q27_salted_agg", q27SaltedAgg, Some("""
      SELECT o_orderpriority,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_price,
             count(*) AS n_orders
      FROM orders
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""")),
    Q("q30_salted_join", q30SaltedJoin, Some("""
      SELECT e.event_id, e.user_id, c.c_name, e.event_type
      FROM events e
      JOIN customer c ON e.user_id = c.c_custkey
      ORDER BY e.event_id"""))
  )
}
