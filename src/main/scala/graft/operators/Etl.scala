package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.Catalog.Q

/** ETL primitives: MERGE/upsert expressed on plain DataFrames.
  *
  * Spark has no built-in MERGE INTO outside table formats (Delta/
  * Iceberg own that verb); the engine-level decomposition is the
  * classic one — updates win over base on key collision, inserts
  * pass through:
  *
  *   merged = updates ∪ (base ⟕anti updates)
  *
  * One shuffle on the key for the anti join (broadcast when updates
  * are small, as here); no row ever compares more than once. At
  * 100 TB the same shape runs as a shuffle anti-join and is exactly
  * what the table formats execute under their MERGE sugar (minus
  * file-level pruning, which belongs to the format).
  */
object Etl {

  /** Upsert `updates` into `base` on `key`: update-matched rows are
    * replaced wholesale, unmatched update rows are inserts, unmatched
    * base rows pass through. Schemas must match.
    */
  def mergeUpsert(base: DataFrame, updates: DataFrame, key: String): DataFrame =
    updates.unionByName(
      base.join(updates.select(col(key)), Seq(key), "left_anti"))

  /** Judged query: a deterministic update set derived from customer —
    * high-balance customers get a VIP segment + a balance credit
    * (updates), and a shifted-key copy of the 50 lowest keys becomes
    * inserts. The oracle replays the same decomposition in SQL; row
    * counts prove update-in-place (no dup keys) + insert-append.
    */
  def q34MergeUpsert(s: SparkSession, d: String): DataFrame = {
    val base = Tables.customer(s, d)
    val updates = base.where(col("c_acctbal") > 9000)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        (col("c_acctbal") + 1000.0).as("c_acctbal"),
        lit("VIP").as("c_mktsegment"))
    val inserts = base.orderBy(col("c_custkey")).limit(50)
      .select((col("c_custkey") + 10000000L).as("c_custkey"),
        concat(lit("NEW-"), col("c_name")).as("c_name"),
        col("c_nationkey"), col("c_acctbal"),
        lit("ONBOARD").as("c_mktsegment"))
    mergeUpsert(base, updates.unionByName(inserts), "c_custkey")
      .orderBy(col("c_custkey"))
  }

  /** SCD type-2 history build: each customer's order stream becomes
    * versioned rows with [valid_from, valid_to) effective ranges —
    * valid_to = next version's start, NULL on the current row. One
    * window shuffle on the natural key; the standard dimension-
    * history primitive of a warehouse ETL.
    */
  def q38Scd2History(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("valid_from"), col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_totalprice"), col("o_orderdate").as("valid_from"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .orderBy(col("o_custkey"), col("valid_from"), col("o_orderkey"))
  }

  /** Dense gap fill: per-(nation, month) revenue with missing months
    * materialized as zero rows — the calendar-densification step
    * before any time-series model. The month spectrum is the
    * observed global set (no engine-specific date-sequence
    * generation), crossed with the nation dim (25 × months — tiny,
    * broadcast), then left-joined against actuals; money stays in
    * exact cents until the final division.
    */
  def q39GapFill(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    val monthly = o
      .join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(c("c_nationkey").as("nationkey"),
        date_format(o("o_orderdate"), "yyyy-MM").as("ym"))
      .agg(graft.functions.Money.sumCents(o("o_totalprice")).as("cents"))
    val months = o.select(date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
      .distinct()
    val spine = n.select(col("n_nationkey"), col("n_name")).crossJoin(months)
    spine.join(monthly,
        spine("n_nationkey") === monthly("nationkey") &&
          spine("ym") === monthly("ym"), "left")
      .select(col("n_name"), spine("ym"),
        graft.functions.Money.toAmount(coalesce(col("cents"), lit(0L)))
          .as("revenue"),
        col("cents").isNotNull.as("observed"))
      .orderBy(col("n_name"), spine("ym"))
  }

  val queries: Seq[Q] = Seq(
    Q("q38_scd2_history", q38Scd2History, Some("""
      SELECT o_custkey, o_orderkey, o_totalprice,
             o_orderdate AS valid_from,
             lead(o_orderdate) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey) AS valid_to,
             lead(o_orderdate) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey) IS NULL AS is_current
      FROM orders
      ORDER BY o_custkey, valid_from, o_orderkey""")),
    Q("q39_gap_fill", q39GapFill, Some("""
      WITH monthly AS (
        SELECT c.c_nationkey AS nationkey,
               strftime(o.o_orderdate, '%Y-%m') AS ym,
               sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2),
      months AS (SELECT DISTINCT strftime(o_orderdate, '%Y-%m') AS ym FROM orders),
      spine AS (SELECT n_nationkey, n_name, ym FROM nation CROSS JOIN months)
      SELECT s.n_name, s.ym,
             CAST(coalesce(m.cents, 0) AS DOUBLE) / 100.0 AS revenue,
             m.cents IS NOT NULL AS observed
      FROM spine s
      LEFT JOIN monthly m ON s.n_nationkey = m.nationkey AND s.ym = m.ym
      ORDER BY s.n_name, s.ym""")),
    Q("q34_merge_upsert", q34MergeUpsert, Some("""
      WITH upd AS (
        SELECT c_custkey, c_name, c_nationkey,
               c_acctbal + 1000.0 AS c_acctbal,
               'VIP' AS c_mktsegment
        FROM customer WHERE c_acctbal > 9000),
      ins AS (
        SELECT c_custkey + 10000000 AS c_custkey,
               'NEW-' || c_name AS c_name,
               c_nationkey, c_acctbal,
               'ONBOARD' AS c_mktsegment
        FROM (SELECT * FROM customer ORDER BY c_custkey LIMIT 50)),
      chg AS (SELECT * FROM upd UNION ALL SELECT * FROM ins)
      SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
      FROM chg
      UNION ALL
      SELECT c.c_custkey, c.c_name, c.c_nationkey, c.c_acctbal, c.c_mktsegment
      FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM chg WHERE chg.c_custkey = c.c_custkey)
      ORDER BY c_custkey""")))
}
