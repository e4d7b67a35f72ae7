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

  /** The sketch value itself is not SQL-replayable (Greenwald-Khanna
    * internals differ across engines), but its GUARANTEE is: the
    * returned p-quantile must occupy an exact rank within ±1% of
    * p·n (the AdvancedSpec bound, far looser than the configured
    * 1/10000 accuracy). The judged output therefore emits the bound
    * CHECK as hash-checked columns — per (flag, q): the group's
    * exact row count and `in_bounds` — so a regressed sketch goes
    * red in the oracle gate, not just in a spec. The certification
    * pass is one broadcast join + partial agg over the 12 approx
    * values (count of rows below/at each value): no sort, no
    * per-group shuffle beyond the aggregate's own — the exact-rank
    * probe costs one extra scan, the price of judging a sketch.
    */
  def q32ApproxQuantiles(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_extendedprice"))
    val approx = li
      .groupBy(col("l_returnflag"))
      .agg(percentile_approx(col("l_extendedprice"),
        typedLit(QuantilePs), lit(10000)).as("price_quantiles"))
      .select(col("l_returnflag"),
        posexplode(col("price_quantiles")).as(Seq("pos", "value")))
      .select(col("l_returnflag"),
        element_at(typedLit(QuantilePs), col("pos") + 1).as("q"),
        col("value"))
    li.join(broadcast(approx), Seq("l_returnflag"))
      .groupBy(col("l_returnflag"), col("q"), col("value"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("l_extendedprice") < col("value"), 1L).otherwise(0L))
          .as("r_lt"),
        sum(when(col("l_extendedprice") <= col("value"), 1L).otherwise(0L))
          .as("r_le"))
      // the value occupies exact ranks [r_lt+1, r_le]; G-K promises a
      // target rank inside [(q-eps)n, (q+eps)n] — intervals intersect
      .select(col("l_returnflag"), col("q"), col("n_rows"),
        (col("r_le") >= (col("q") - lit(0.01)) * col("n_rows") &&
          (col("r_lt") + 1) <= ceil((col("q") + lit(0.01)) * col("n_rows")))
          .as("in_bounds"))
      .orderBy(col("l_returnflag"), col("q"))
  }

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

  /** Statistical aggregates — correlation and OLS regression
    * (slope/intercept) of discount-basis-points on quantity per
    * return flag — computed from EXACT integer sufficient statistics
    * (n, Σx, Σy, Σx², Σy², Σxy as BIGINTs) with ONE shared
    * closed-form applied in both engines. The built-in corr()/
    * regr_slope() use single-pass update formulas whose float
    * results differ across engines in the last ulps, so they cannot
    * sit under a hash gate; sufficient statistics make the aggregate
    * exact (and map-side combinable — the production shape for
    * moment sketches at 100 TB), and every closed-form intermediate
    * here stays < 2^53, so the final doubles are bit-identical.
    * AggregatesSpec pins Spark's own corr/covar builtins to these
    * closed forms within float tolerance — certifying the formula,
    * not replacing the builtins. At much larger N·x² the BIGINT sums
    * would need DECIMAL(38,0); the derivation note travels with the
    * code.
    */
  def q43CorrRegression(s: SparkSession, d: String): DataFrame = {
    val x = round(col("l_quantity")).cast(LongType)
    val y = round(col("l_discount") * 100).cast(LongType)
    Tables.lineitem(s, d)
      .select(col("l_returnflag"), x.as("x"), y.as("y"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .withColumn("cov_num", col("n") * col("sxy") - col("sx") * col("sy"))
      .withColumn("var_x", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("var_y", col("n") * col("syy") - col("sy") * col("sy"))
      .select(col("l_returnflag"), col("n"),
        (col("cov_num").cast(DoubleType) /
          (sqrt(col("var_x").cast(DoubleType)) *
            sqrt(col("var_y").cast(DoubleType)))).as("corr_xy"),
        (col("cov_num").cast(DoubleType) / col("var_x").cast(DoubleType))
          .as("slope"),
        ((col("sy").cast(DoubleType) -
          col("cov_num").cast(DoubleType) / col("var_x").cast(DoubleType) *
            col("sx").cast(DoubleType)) / col("n").cast(DoubleType))
          .as("intercept"))
      .orderBy(col("l_returnflag"))
  }

  /** Ordered string aggregation (LISTAGG/string_agg): supplier names
    * per nation, sorted then joined — collect_list's order is
    * partition-dependent, so the explicit array_sort is what makes
    * the result deterministic and cross-engine comparable (DuckDB:
    * string_agg ... ORDER BY). Small-group shape: the collected
    * list is bounded by the group, not the table.
    */
  def q49StringAgg(s: SparkSession, d: String): DataFrame =
    Tables.supplier(s, d)
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_suppliers"),
        array_join(array_sort(collect_list(col("s_name"))), "|").as("names"))
      .orderBy(col("s_nationkey"))

  /** EXACT discrete percentiles (ANSI PERCENTILE_DISC): the first
    * element whose cumulative distribution reaches p — an actual
    * data value, no interpolation, which is why it can be
    * cross-engine hash-exact where interpolated percentiles (and
    * windowed double sums) are not. This is the exact complement of
    * q32's Greenwald-Khanna approx path: exact quantiles buffer
    * O(group) values per group, so they are for bounded groups (3
    * return flags here); at 100 TB-wide groups the approx sketch is
    * the scale path — the pair documents the trade.
    */
  def q55PercentileDisc(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity)").as("p25"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity)").as("median"),
        expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY l_quantity)").as("p75"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  /** HLL sketch ALGEBRA — the mergeable-summary discipline that makes
    * approximate distinct counting compose at 100 TB: per-group
    * sketches (built in one partial-agg pass) union into a global
    * estimate without ever rescanning data — the law behind rollups,
    * incremental refreshes (q77's state-merge discipline applied to
    * sketches), and cross-partition counts. The union is NOT
    * bit-identical to a direct whole-table sketch (DataSketches HLL
    * promotes LIST→SET→HLL modes differently along the two paths), so
    * the honest judged law is the ERROR BOUND: both the direct and
    * the merged estimate sit within 5% (≈3 standard errors at
    * lgK=12) of the exact total, and both booleans ride in the
    * output row. Estimates are order-insensitive functions of the
    * value set, so the row is stable under any partitioning; no SQL
    * oracle because DuckDB's HLL is a different sketch — AdvancedSpec
    * pins the merge law, determinism, and the bound.
    */
  def q93HllAlgebra(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_nationkey"))
    val perNation = c.groupBy(col("c_nationkey"))
      .agg(hll_sketch_agg(col("c_custkey"), lit(12)).as("sk"),
        count_distinct(col("c_custkey")).as("exact_n"))
    // custkey is unique and each customer has one nation, so the
    // exact distinct total is the sum of per-nation exact counts
    val merged = perNation.agg(
      sum(col("exact_n")).as("exact_total"),
      hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)))
        .as("hll_merged"))
    val direct = c.agg(
      hll_sketch_estimate(hll_sketch_agg(col("c_custkey"), lit(12)))
        .as("hll_direct"))
    val pctOk = (est: org.apache.spark.sql.Column) =>
      abs(est - col("exact_total")).cast("double") /
        col("exact_total").cast("double") <= 0.05
    // certificate output (the ANN-recall discipline): the exact total
    // is oracle-replayable and the two error-bound verdicts ride as
    // hash-checked booleans; the raw estimates (sketch-implementation
    // specific) stay out of the hash — AdvancedSpec still pins the
    // merge law and determinism on them directly.
    merged.crossJoin(direct).select(
      col("exact_total"),
      pctOk(col("hll_direct")).as("direct_within_5pct"),
      pctOk(col("hll_merged")).as("merged_within_5pct"))
  }

  val queries: Seq[Q] = Seq(
    Q("q93_hll_algebra", q93HllAlgebra, Some("""
      SELECT count(DISTINCT c_custkey) AS exact_total,
             TRUE AS direct_within_5pct,
             TRUE AS merged_within_5pct
      FROM customer""")),
    Q("q55_percentile_disc", q55PercentileDisc, Some("""
      SELECT l_returnflag,
             quantile_disc(l_quantity, 0.25) AS p25,
             quantile_disc(l_quantity, 0.5) AS median,
             quantile_disc(l_quantity, 0.75) AS p75,
             count(*) AS n_rows
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag""")),
    Q("q49_string_agg", q49StringAgg, Some("""
      SELECT s_nationkey,
             count(*) AS n_suppliers,
             string_agg(s_name, '|' ORDER BY s_name) AS names
      FROM supplier
      GROUP BY s_nationkey
      ORDER BY s_nationkey""")),
    Q("q43_corr_regression", q43CorrRegression, Some("""
      WITH s AS (
        SELECT l_returnflag,
               count(*) AS n,
               sum(x) AS sx, sum(y) AS sy,
               sum(x*x) AS sxx, sum(y*y) AS syy, sum(x*y) AS sxy
        FROM (SELECT l_returnflag,
                     CAST(round(l_quantity) AS BIGINT) AS x,
                     CAST(round(l_discount * 100) AS BIGINT) AS y
              FROM lineitem)
        GROUP BY 1),
      t AS (
        SELECT l_returnflag, n,
               n*sxy - sx*sy AS cov_num,
               n*sxx - sx*sx AS var_x,
               n*syy - sy*sy AS var_y,
               sx, sy
        FROM s)
      SELECT l_returnflag,
             CAST(n AS BIGINT) AS n,
             CAST(cov_num AS DOUBLE) /
               (sqrt(CAST(var_x AS DOUBLE)) * sqrt(CAST(var_y AS DOUBLE)))
               AS corr_xy,
             CAST(cov_num AS DOUBLE) / CAST(var_x AS DOUBLE) AS slope,
             (CAST(sy AS DOUBLE) -
              CAST(cov_num AS DOUBLE) / CAST(var_x AS DOUBLE) * CAST(sx AS DOUBLE))
               / CAST(n AS DOUBLE) AS intercept
      FROM t
      ORDER BY l_returnflag""")),
    // the sketch VALUE has no cross-engine oracle, but its rank-error
    // guarantee does: the oracle replays the group counts and pins
    // in_bounds = TRUE for every (flag, quantile)
    Q("q32_approx_quantiles", q32ApproxQuantiles, Some("""
      WITH n AS (SELECT l_returnflag, count(*) AS n_rows
                 FROM lineitem GROUP BY 1)
      SELECT l_returnflag, CAST(q AS DOUBLE) AS q, n_rows,
             TRUE AS in_bounds
      FROM n CROSS JOIN (VALUES (0.25), (0.5), (0.75), (0.95)) AS t(q)
      ORDER BY l_returnflag, q""")),
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
