package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Money
import graft.sources.Tables
import graft.Catalog.Q

/** Core relational operators, re-expressed Spark-first.
  *
  * Semantics derive from the reference MapReduce jobs
  * (reference `src/main/java/org/weather_analysis/Job1.java`,
  * `Job2.java` — see SURVEY.md §2.1 O1–O16), mapped onto the
  * driver's TPC-H-ish parquet tables. The reference's hand-rolled
  * physical choices (reduce-side join of a 26-row dim, single-reducer
  * argmax, no combiner) are all replaced by the strictly better stock
  * Spark strategies: broadcast hash join for small dims, partial
  * (map-side) aggregation, and TakeOrderedAndProject top-k which does
  * per-partition partial top-k with a driver merge — no single-node
  * serialization point at any scale.
  */
object Relational {

  // ---- composable operator library ----------------------------------

  /** Global argmax with deterministic tie-break to the smallest key —
    * encodes the reference's implicit earliest-month-wins semantics
    * (`Job2.java:53-69,100`: strict `>` over keys delivered in
    * ascending sort order). Plans as TakeOrderedAndProject: partial
    * top-1 per partition, merged on the driver — O(partitions), no
    * global sort, no single-reducer bottleneck at 100 TB.
    */
  def argmaxBy(df: DataFrame, key: String, value: String): DataFrame =
    df.orderBy(desc(value), asc(key)).limit(1)

  /** Year-month bucket from a timestamp column — the reference's
    * derived `yyyy-MM` key (`Job1.java:88-95`, `Job2.java:30-36`),
    * one implementation serving both jobs.
    */
  def yearMonth(c: Column): Column = date_format(c, "yyyy-MM")

  /** Zero-fill-and-count mean: AVG(COALESCE(x, 0.0)) — the reference
    * Job1 policy where blank numerics coerce to 0.0 and still count
    * in the denominator (`Job1.java:97-99,116-123`). NOT SQL AVG.
    */
  def zeroFillAvg(c: Column): Column = avg(coalesce(c, lit(0.0)))

  /** Zero-fill total: SUM(COALESCE(x, 0.0)), Job1 policy. */
  def zeroFillSum(c: Column): Column = sum(coalesce(c, lit(0.0)))

  /** Exact total of a 2-decimal "money" double (zero-fill policy):
    * sum in integer cents, then one IEEE division back to double.
    * Plain `round(sum(x), 2)` is NOT portable across engines — double
    * summation order plus half-way rounding made Spark and DuckDB
    * disagree on ~1.6% of groups at sf0.01 — whereas an integer sum
    * is exact and a single division of the same two numbers is
    * bit-identical everywhere. Long cents overflow only past ~9e16
    * dollars, far beyond 100 TB of rows.
    */
  def exactMoneySum(c: Column): Column =
    Money.exactSum(coalesce(c, lit(0.0)))

  // ---- judged queries ------------------------------------------------

  /** Q1 analog (reference Job1, `Job1.java:82-108`): fact ⋈ dim ⋈ dim,
    * composite (name, year-month) grouping, SUM + zero-fill AVG.
    * orders⋈customer shuffles on the join key (both sides large at
    * scale; AQE picks the strategy); nation is explicitly broadcast —
    * the 25-row dim never justifies a shuffle (reference instead did a
    * reduce-side shuffle join of its 26-row dim, `Job1.java:59-80`).
    */
  def q1CityMonthAgg(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(n("n_name"), yearMonth(o("o_orderdate")).as("ym"))
      .agg(
        exactMoneySum(o("o_totalprice")).as("total_price"),
        count(lit(1)).as("n_orders"))
      .withColumn("mean_price", col("total_price") / col("n_orders"))
      .orderBy(col("n_name"), col("ym"))
  }

  /** Q2 analog (reference Job2, `Job2.java:51-78`): global argmax
    * month by total value, rows with NULL value dropped before the
    * sum (`Job2.java:38-45` drops unparseable rows), ties resolved to
    * the earliest month.
    */
  def q2ArgmaxMonth(s: SparkSession, d: String): DataFrame = {
    val agg = Tables.events(s, d)
      .where(col("value").isNotNull)
      .groupBy(yearMonth(col("ts")).as("ym"))
      .agg(exactMoneySum(col("value")).as("total"))
    argmaxBy(agg, "ym", "total")
  }

  /** Filter + projection slice: predicates and column pruning reach
    * the parquet scan (reference did both by hand inside the mapper,
    * `Job1.java:24-28,34-49`; Catalyst's PushDownPredicates +
    * ColumnPruning do it for free — verified via .explain in tests).
    */
  def q3FilterProject(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .where(col("l_quantity") > 45 && col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** Top-k with deterministic tie-break — generalizes the reference's
    * top-1 (O12) to k, still TakeOrderedAndProject (no global sort).
    */
  def q4TopkOrders(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(10)

  val queries: Seq[Q] = Seq(
    Q("q1_city_month_agg", q1CityMonthAgg, Some("""
      SELECT n_name, ym, total_price, n_orders,
             total_price / n_orders AS mean_price
      FROM (
        SELECT n_name, strftime(o_orderdate, '%Y-%m') AS ym,
               CAST(sum(CAST(round(coalesce(o_totalprice, 0.0) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_price,
               count(*) AS n_orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name, ym)
      ORDER BY n_name, ym""")),
    Q("q2_argmax_month", q2ArgmaxMonth, Some("""
      SELECT strftime(ts, '%Y-%m') AS ym,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total
      FROM events WHERE value IS NOT NULL
      GROUP BY ym
      ORDER BY total DESC, ym ASC LIMIT 1""")),
    Q("q3_filter_project", q3FilterProject, Some("""
      SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      FROM lineitem
      WHERE l_quantity > 45 AND l_returnflag = 'R'
      ORDER BY l_orderkey, l_linenumber""")),
    Q("q4_topk_orders", q4TopkOrders, Some("""
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders
      ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10"""))
  )
}
