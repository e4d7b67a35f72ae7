package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Money
import graft.sources.Tables
import graft.Catalog.Q

/** Aggregation breadth: DISTINCT aggregates, ROLLUP, CUBE — the
  * checklist categories absent from the reference (SURVEY.md §2.2).
  * All are stock hash aggregates with partial (map-side) combine;
  * distinct aggregation expands to a two-phase plan that Spark
  * handles without materializing the distinct sets on one node.
  */
object Aggregates {

  /** COUNT(DISTINCT) over two columns + plain count per group.
    * (approx_count_distinct exists as the HLL scale path but has no
    * cross-engine oracle — see q8b in tests.)
    */
  def q8DistinctAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(col("l_orderkey")).as("n_orders"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** ROLLUP over (nation, year-month): subtotal rows carry NULL group
    * keys, coalesced to an '(all)' sentinel so the oracle compare is
    * null-ordering-proof (both engines sort '(' before any NATION_x
    * in binary collation). Neither underlying key is ever NULL, so
    * the sentinel is unambiguous.
    */
  def q9Rollup(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .select(n("n_name").as("n_name"),
        date_format(o("o_orderdate"), "yyyy-MM").as("ym"),
        o("o_totalprice").as("price"))
      .rollup(col("n_name"), col("ym"))
      .agg(count(lit(1)).as("n_orders"),
        Money.exactSum(col("price")).as("total_price"))
      .select(
        coalesce(col("n_name"), lit("(all)")).as("n_name"),
        coalesce(col("ym"), lit("(all)")).as("ym"),
        col("n_orders"), col("total_price"))
      .orderBy(col("n_name"), col("ym"))
  }

  /** CUBE over (returnflag, linestatus) with exact money totals. */
  def q10Cube(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_rows"),
        Money.exactSum(col("l_extendedprice")).as("total_extprice"))
      .select(
        coalesce(col("l_returnflag"), lit("(all)")).as("l_returnflag"),
        coalesce(col("l_linestatus"), lit("(all)")).as("l_linestatus"),
        col("n_rows"), col("total_extprice"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Min/max/first-last-style extremes per group with deterministic
    * semantics only (min/max of doubles and strings — no first/last,
    * which are order-dependent).
    */
  def q18MinMax(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"),
        min(col("o_orderdate")).as("first_date"),
        max(col("o_orderdate")).as("last_date"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))

  /** Approximate quantiles (Greenwald-Khanna sketch) — the 100 TB
    * percentile path: a bounded-memory mergeable sketch vs exact
    * percentile's full sort-per-group. Rows-only judged (sketch
    * internals differ across engines); AdvancedSpec bounds the
    * rank error against the exact percentiles at test scale.
    *
    * Output is exploded to one (l_returnflag, q, value) row per
    * quantile, not an array<double> column: the driver's compare
    * harness sorts rows via pandas, which cannot hash ndarray cells —
    * the array-shaped output recorded `err` in CORRECTNESS_r02.
    */
  val QuantilePs: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.95)

  def q32ApproxQuantiles(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(percentile_approx(col("l_extendedprice"),
        typedLit(QuantilePs), lit(10000)).as("price_quantiles"))
      .select(col("l_returnflag"),
        posexplode(col("price_quantiles")).as(Seq("pos", "value")))
      .select(col("l_returnflag"),
        element_at(typedLit(QuantilePs), col("pos") + 1).as("q"),
        col("value"))
      .orderBy(col("l_returnflag"), col("q"))

  /** Explicit GROUPING SETS — finer than rollup/cube: exactly the
    * (status), (priority), and grand-total groupings, nothing else.
    * SQL surface (the DataFrame API has no grouping-sets verb), NULL
    * group keys coalesced to the '(all)' sentinel as in q9/q10.
    */
  def q33GroupingSets(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("orders_gs")
    s.sql("""
      SELECT coalesce(o_orderstatus, '(all)') AS o_orderstatus,
             coalesce(o_orderpriority, '(all)') AS o_orderpriority,
             count(*) AS n_orders,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS total_price
      FROM orders_gs
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      ORDER BY o_orderstatus, o_orderpriority""")
  }

  val queries: Seq[Q] = Seq(
    Q("q32_approx_quantiles", q32ApproxQuantiles, None), // sketch: no cross-engine oracle
    Q("q33_grouping_sets", q33GroupingSets, Some("""
      SELECT coalesce(o_orderstatus, '(all)') AS o_orderstatus,
             coalesce(o_orderpriority, '(all)') AS o_orderpriority,
             count(*) AS n_orders,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS total_price
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      ORDER BY o_orderstatus, o_orderpriority""")),
    Q("q8_distinct_agg", q8DistinctAgg, Some("""
      SELECT l_returnflag, l_linestatus,
             count(*) AS n_rows,
             count(DISTINCT l_partkey) AS n_parts,
             count(DISTINCT l_suppkey) AS n_supps,
             count(DISTINCT l_orderkey) AS n_orders
      FROM lineitem
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""")),
    Q("q9_rollup", q9Rollup, Some("""
      SELECT coalesce(n_name, '(all)') AS n_name,
             coalesce(ym, '(all)') AS ym,
             count(*) AS n_orders,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_price
      FROM (SELECT n_name, strftime(o_orderdate, '%Y-%m') AS ym, o_totalprice
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey)
      GROUP BY ROLLUP (n_name, ym)
      ORDER BY 1, 2""")),
    Q("q10_cube", q10Cube, Some("""
      SELECT coalesce(l_returnflag, '(all)') AS l_returnflag,
             coalesce(l_linestatus, '(all)') AS l_linestatus,
             count(*) AS n_rows,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_extprice
      FROM lineitem
      GROUP BY CUBE (l_returnflag, l_linestatus)
      ORDER BY 1, 2""")),
    Q("q18_minmax", q18MinMax, Some("""
      SELECT o_orderpriority,
             min(o_totalprice) AS min_price,
             max(o_totalprice) AS max_price,
             min(o_orderdate) AS first_date,
             max(o_orderdate) AS last_date,
             count(*) AS n
      FROM orders
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority"""))
  )
}
