package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Catalog.Q
import graft.sources.Tables

/** Composite end-to-end analytics — TPC-H-shaped queries over the
  * judged operator surface. Every operator here is individually
  * gated elsewhere (scan pruning q3, SMJ q60, broadcast dims q1,
  * partial aggregation q1/q8, top-k q4); these queries certify the
  * COMPOSITION: a reference user's real report runs whole, with the
  * plan Catalyst picks when several gated operators compete for the
  * same stages. Money/ratio columns use the exact-integer patterns
  * (cents, cents×(100−disc)) so the hash gate is bit-strict across
  * engines.
  *
  * Scale shapes (the reason each query is here):
  *  - q83: one pass over the fact table, 4-group partial agg —
  *    THE map-side-combine benchmark (TPC-H Q1).
  *  - q84: selective dim filter → fact join → top-10 by revenue —
  *    filter pushdown + join order + bounded TakeOrdered, no global
  *    sort (TPC-H Q3 adapted to the schema: no shippriority col).
  *  - q85: a 6-table snowflake with a cross-dimension equality
  *    (customer and supplier in the SAME nation) — join-graph
  *    ordering with two independent dim arms meeting on the fact
  *    row (TPC-H Q5).
  */
object Composite {

  private def centsL(c: String): org.apache.spark.sql.Column =
    round(col(c) * 100).cast("long")

  /** TPC-H Q1 (pricing summary): full-scan aggregate with exact
    * sums and exact-ratio averages. revenue = Σ price·(1−disc) and
    * charge = Σ price·(1−disc)·(1+tax) are computed in integer
    * hundredths-of-cents (cents × (100±pct)), divided back once —
    * float-order-independent, so partial aggregation over any
    * partitioning is safe at any scale.
    */
  def q83TpchPricing(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .select(col("l_returnflag"), col("l_linestatus"),
        round(col("l_quantity")).cast("long").as("qty"),
        centsL("l_extendedprice").as("cents"),
        centsL("l_extendedprice").*(lit(100L) - centsL("l_discount"))
          .as("disc_e4"),
        centsL("l_extendedprice").*(lit(100L) - centsL("l_discount"))
          .*(lit(100L) + centsL("l_tax")).as("charge_e6"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("qty")).as("sum_qty"),
        (sum(col("cents")).cast("double") / 100.0).as("sum_base_price"),
        (sum(col("disc_e4")).cast("double") / 10000.0).as("sum_disc_price"),
        (sum(col("charge_e6")).cast("double") / 1000000.0).as("sum_charge"),
        (sum(col("qty")).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(col("cents")).cast("double") / 100.0 / count(lit(1)))
          .as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** TPC-H Q3 (shipping priority, schema-adapted): BUILDING-segment
    * customers' orders placed before a date, revenue from lines
    * shipped after it, top 10 by revenue. The selective dim filter
    * reaches the customer scan, the date filters reach both fact
    * scans, and the final top-10 is a bounded TakeOrdered — never a
    * global sort of the join result.
    */
  def q84TpchShipping(s: SparkSession, d: String): DataFrame = {
    val cut = lit("1997-03-15").cast("timestamp")
    val c = Tables.customer(s, d)
      .where(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val o = Tables.orders(s, d).where(col("o_orderdate") < cut)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    val l = Tables.lineitem(s, d).where(col("l_shipdate") > cut)
      .select(col("l_orderkey"),
        centsL("l_extendedprice").*(lit(100L) - centsL("l_discount"))
          .as("rev_e4"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg((sum(col("rev_e4")).cast("double") / 10000.0).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5 (local supplier volume): revenue by nation where the
    * ordering customer and the line's supplier share that nation,
    * for one region and one order-date year. Region and nation are
    * broadcast; the fact-side joins shuffle on their keys; the
    * cross-dimension c_nationkey = s_nationkey equality lands as a
    * join predicate, not a post-filter over a wider product.
    */
  def q85TpchLocalVolume(s: SparkSession, d: String): DataFrame = {
    val r = Tables.region(s, d).where(col("r_name") === "ASIA")
      .select(col("r_regionkey"))
    val n = Tables.nation(s, d)
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val c = Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"))
    val o = Tables.orders(s, d)
      .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    val sup = Tables.supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))
    val l = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"),
      centsL("l_extendedprice").*(lit(100L) - centsL("l_discount"))
        .as("rev_e4"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(sup, l("l_suppkey") === sup("s_suppkey") &&
        c("c_nationkey") === sup("s_nationkey"))
      .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg((sum(col("rev_e4")).cast("double") / 10000.0).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** TPC-H Q18 shape (large-volume orders): a HAVING-gated IN
    * subquery over the fact table feeding a 3-way join and a
    * bounded top-100. The composition under test: the IN-subquery
    * decorrelates to a semi join against the re-aggregated fact
    * (one partial-agg pass, never a correlated re-execution), the
    * customer dim broadcasts, and the final ORDER BY ... LIMIT
    * plans as TakeOrderedAndProject — three gated operators
    * competing in one plan. Quantities are integral-valued doubles;
    * summing them as longs makes the HAVING boundary (> 250) exact
    * on both engines, and money sorts by exact cents with full key
    * tie-breaks so the top-100 cut is deterministic.
    */
  def q106TpchLargeOrders(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d).select(col("l_orderkey"),
      round(col("l_quantity")).cast("long").as("qty"))
    val big = l.groupBy(col("l_orderkey"))
      .agg(sum(col("qty")).as("sum_qty"))
      .where(col("sum_qty") > 250)
      .select(col("l_orderkey"))
    val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"),
      col("o_orderdate"),
      round(col("o_totalprice") * 100).cast("long").as("total_cents"))
    val c = Tables.customer(s, d).select(col("c_custkey"), col("c_name"))
    o.join(l, col("o_orderkey") === col("l_orderkey"))
      .join(big, Seq("l_orderkey"), "left_semi")
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("total_cents"))
      .agg(sum(col("qty")).as("sum_qty"))
      .orderBy(col("total_cents").desc, col("o_orderdate").asc,
        col("o_orderkey").asc)
      .limit(100)
  }

  /** TPC-H Q10 (returned items): customers ranked by revenue lost to
    * returns in one quarter — a 4-table join where each arm carries
    * its own pushed filter (order-date window on orders, returnflag
    * on lineitem), nation broadcasts, and the top-20 is a bounded
    * TakeOrdered ON THE EXACT integer revenue (rev_e4), so the cut
    * line cannot drift between engines the way a double sort key
    * could; the double `revenue` column is derived after the cut.
    */
  def q111TpchReturnedItems(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .where(col("o_orderdate") >= lit("1996-10-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    val l = Tables.lineitem(s, d).where(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        centsL("l_extendedprice").*(lit(100L) - centsL("l_discount"))
          .as("rev_e4"))
    val c = Tables.customer(s, d).select(col("c_custkey"), col("c_name"),
      round(col("c_acctbal") * 100).cast("long").as("acct_cents"),
      col("c_nationkey"))
    val n = Tables.nation(s, d).select(col("n_nationkey"), col("n_name"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("acct_cents"),
        col("n_name"))
      .agg(sum(col("rev_e4")).as("rev_e4"))
      .orderBy(col("rev_e4").desc, col("c_custkey"))
      .limit(20)
      .select(col("c_custkey"), col("c_name"), col("acct_cents"),
        col("n_name"), (col("rev_e4").cast("double") / 10000.0).as("revenue"))
  }

  /** TPC-H Q6 (forecasting revenue change): the pure scan-filter-
    * aggregate — every predicate reaches the parquet scan, zero
    * joins, one partial-agg pass. The discount band compares in
    * exact integer cents (5..7), not on raw doubles, so the band's
    * edge rows cannot flip between engines; revenue sums in e4
    * integer units. The simplest possible 100 TB shape: cost is the
    * scan, and the scan reads three columns.
    */
  def q119TpchRevenueChange(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        centsL("l_discount").between(5, 7) &&
        round(col("l_quantity")).cast("long") < 24)
      .agg(
        count(lit(1)).as("n_lines"),
        sum(centsL("l_extendedprice") * centsL("l_discount")).as("revenue_e4"))

  /** TPC-H Q14 (promotion effect): one month of the fact table
    * against the part dimension (broadcast — parts is KB-to-MB-scale
    * next to lineitem), a conditional aggregate splitting promo
    * revenue from total, and the headline percentage derived from
    * the two EXACT integer sums in one final division — never a
    * ratio-of-floats aggregated across partitions.
    */
  def q120TpchPromoEffect(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d)
      .where(col("l_shipdate") >= lit("1997-09-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
      .select(col("l_partkey"),
        centsL("l_extendedprice").*(lit(100L) - centsL("l_discount"))
          .as("rev_e4"))
    val p = Tables.part(s, d).select(col("p_partkey"), col("p_type"))
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", col("rev_e4"))
          .otherwise(lit(0L))).as("promo_rev_e4"),
        sum(col("rev_e4")).as("total_rev_e4"))
      .select(col("promo_rev_e4"), col("total_rev_e4"),
        (col("promo_rev_e4").cast("double") * 100.0 /
          col("total_rev_e4").cast("double")).as("promo_pct"))
  }

  /** TPC-H Q19 (discounted revenue, disjunctive predicates): the
    * OR-of-conjunctions join — three (brand, size-range,
    * quantity-range) arms sharing the p_partkey = l_partkey
    * equi-key. The composition under test: Catalyst must extract
    * the COMMON equi-condition into a hash join (a literal reading
    * of the OR would fall to a nested-loop cross product), and the
    * per-side halves of the disjunction (brand/size on part,
    * quantity on lineitem) must reach their scans as pushed OR
    * filters, so both inputs shrink before the join. Quantity
    * bounds compare on exact integral longs; revenue in e4 units.
    */
  def q123TpchDisjunctive(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d).select(col("l_partkey"),
      round(col("l_quantity")).cast("long").as("qty"),
      centsL("l_extendedprice").*(lit(100L) - centsL("l_discount"))
        .as("rev_e4"))
    val p = Tables.part(s, d).select(col("p_partkey"), col("p_brand"),
      col("p_size"))
    val arm1 = col("p_brand") === "Brand#12" &&
      col("p_size").between(1, 15) && col("qty").between(1, 20)
    val arm2 = col("p_brand") === "Brand#23" &&
      col("p_size").between(1, 25) && col("qty").between(10, 30)
    val arm3 = col("p_brand") === "Brand#34" &&
      col("p_size").between(1, 35) && col("qty").between(20, 40)
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .where(arm1 || arm2 || arm3)
      .agg(count(lit(1)).as("n_lines"),
        (sum(col("rev_e4")).cast("double") / 10000.0).as("revenue"))
  }

  /** Register the tables a SQL-text composite needs under stable
    * prefixed view names (fresh each invocation — temp views are
    * session-scoped and other queries own the bare names).
    */
  private def tpchViews(s: SparkSession, d: String,
      tables: Seq[String]): Unit =
    tables.foreach(t =>
      Tables.load(s, d, t).createOrReplaceTempView(s"tpch_$t"))

  /** TPC-H Q4 (order priority checking, schema-adapted): count
    * orders per priority in one quarter having at least one line
    * shipped AFTER the order date (the dataset carries no
    * commit/receipt dates, so "late" is l_shipdate > o_orderdate).
    * Written as SQL EXISTS on purpose: the decorrelation under test
    * is Catalyst's — the correlated predicate mixes an equi key
    * (l_orderkey = o_orderkey) with a non-equi comparison against
    * the OUTER column, and must plan as one left-semi hash join with
    * the date comparison as its residual condition, never a
    * per-order re-scan or nested loop.
    */
  def q125TpchPriorityCheck(s: SparkSession, d: String): DataFrame = {
    tpchViews(s, d, Seq("orders", "lineitem"))
    s.sql("""
      SELECT o_orderpriority, count(*) AS order_count
      FROM tpch_orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate < TIMESTAMP '1997-04-01'
        AND EXISTS (SELECT 1 FROM tpch_lineitem
                    WHERE l_orderkey = o_orderkey
                      AND l_shipdate > o_orderdate)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""")
  }

  /** TPC-H Q13 (customer distribution): how many customers placed
    * 0, 1, 2, ... qualifying orders — the left-OUTER-join-then-
    * count-distribution shape (filter adapted from o_comment, which
    * the schema lacks, to excluding urgent orders). The join filter
    * lives in the JOIN condition, not a WHERE (a WHERE would turn
    * the outer join inner and silently drop the zero-order bucket);
    * count(o_orderkey) counts non-null matches so unmatched
    * customers land in c_count = 0. Two aggregations over one
    * shuffled join — no distinct, no window.
    */
  def q126TpchCustDistribution(s: SparkSession, d: String): DataFrame = {
    tpchViews(s, d, Seq("customer", "orders"))
    s.sql("""
      SELECT c_count, count(*) AS custdist
      FROM (SELECT c_custkey, count(o_orderkey) AS c_count
            FROM tpch_customer LEFT OUTER JOIN tpch_orders
              ON c_custkey = o_custkey
             AND o_orderpriority <> '1-URGENT'
            GROUP BY c_custkey) c_orders
      GROUP BY c_count
      ORDER BY custdist DESC, c_count DESC""")
  }

  /** TPC-H Q21 (suppliers who kept orders waiting, schema-adapted):
    * for finalized multi-supplier orders, the suppliers whose line
    * shipped late while EVERY other supplier on the order shipped on
    * time ("late" = l_shipdate past a fixed cut, standing in for the
    * missing receipt-vs-commit comparison). The hardest judged
    * decorrelation shape: an EXISTS and a NOT EXISTS, both
    * correlated self-joins of the fact table with a <> on the
    * correlated key — Catalyst must plan one left-semi and one
    * left-anti hash join over lineitem, sharing the orderkey
    * shuffle, with the <> and date tests as residual conditions.
    */
  def q127TpchWaitingSuppliers(s: SparkSession, d: String): DataFrame = {
    tpchViews(s, d, Seq("supplier", "lineitem", "orders"))
    s.sql("""
      SELECT s_name, count(*) AS numwait
      FROM tpch_supplier, tpch_lineitem l1, tpch_orders
      WHERE s_suppkey = l1.l_suppkey
        AND o_orderkey = l1.l_orderkey
        AND o_orderstatus = 'F'
        AND l1.l_shipdate > TIMESTAMP '1997-09-01'
        AND EXISTS (SELECT 1 FROM tpch_lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM tpch_lineitem l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.l_shipdate > TIMESTAMP '1997-09-01')
      GROUP BY s_name
      ORDER BY numwait DESC, s_name
      LIMIT 100""")
  }

  /** TPC-H Q22 (global sales opportunity, schema-adapted): lapsed
    * big-balance customers by nation — country-code prefixes become
    * a nation-key IN list (no c_phone in the schema), and "never
    * ordered" becomes "no order since 1999" (every synthetic
    * customer has ordered at least once). Composes the two
    * decorrelation shapes q61/q106 gate separately: an uncorrelated
    * SCALAR subquery (the positive-balance average, broadcast as a
    * one-row threshold) and a correlated NOT EXISTS (left-anti hash
    * join against the date-filtered orders scan). The threshold
    * compares exact integer cents against one double division of
    * two exact integers, so the cut cannot drift between engines.
    */
  def q128TpchLapsedCustomers(s: SparkSession, d: String): DataFrame = {
    tpchViews(s, d, Seq("customer", "orders"))
    s.sql("""
      SELECT c_nationkey, count(*) AS numcust,
             CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
               AS totacctbal_cents
      FROM tpch_customer
      WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
        AND CAST(round(c_acctbal * 100) AS BIGINT) >
            (SELECT CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT))
                         AS DOUBLE) / count(*)
             FROM tpch_customer
             WHERE c_acctbal > 0
               AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13))
        AND NOT EXISTS (SELECT 1 FROM tpch_orders
                        WHERE o_custkey = c_custkey
                          AND o_orderdate >= TIMESTAMP '1999-01-01')
      GROUP BY c_nationkey
      ORDER BY c_nationkey""")
  }

  /** TPC-H Q17 (small-quantity-order revenue, schema-adapted): total
    * revenue from lines of one brand's parts whose quantity is below
    * 20% of that part's average — the CORRELATED SCALAR AGGREGATE
    * INSIDE A FACT FILTER shape (the hardest of the three Q17/Q20/Q2
    * decorrelation stress shapes this trio adds): Catalyst must
    * decorrelate `avg(l_quantity) WHERE l_partkey = p_partkey` into
    * one per-part aggregate joined back to the fact scan, never a
    * per-row re-scan. The 20%-of-average cut is evaluated in pure
    * integers (5·qty·count < sum ⟺ qty < 0.2·avg, count > 0) so the
    * boundary cannot drift between engines; no p_container column
    * exists, so the brand filter stands alone.
    */
  def q133TpchSmallQtyRevenue(s: SparkSession, d: String): DataFrame = {
    tpchViews(s, d, Seq("part", "lineitem"))
    s.sql("""
      SELECT count(*) AS n_small_lines,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS sum_cents
      FROM tpch_lineitem, tpch_part
      WHERE p_partkey = l_partkey
        AND p_brand = 'Brand#13'
        AND 5 * CAST(round(l_quantity) AS BIGINT) *
            (SELECT count(*) FROM tpch_lineitem l2
             WHERE l2.l_partkey = p_partkey)
          < (SELECT CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
             FROM tpch_lineitem l2 WHERE l2.l_partkey = p_partkey)""")
  }

  /** TPC-H Q20 (potential part promotion, schema-adapted): suppliers
    * who shipped the MAJORITY of some small part's volume in 1997.
    * With no partsupp table, availqty > 0.5·shipped becomes
    * 2·(this supplier's shipped qty) > (part's total shipped qty) —
    * preserving Q20's nested shape exactly: an IN whose subquery
    * contains another IN (the part filter) AND a correlated scalar
    * aggregate under a HAVING, correlated on a GROUP BY column.
    * Catalyst must stack semi-join decorrelations: part-filter
    * semi-join inside the grouped fact scan, the per-part total as
    * a decorrelated aggregate joined on the group key, and the
    * outer IN as a final semi-join against supplier. All-integer
    * comparisons — no boundary drift.
    */
  def q134TpchPartPromotion(s: SparkSession, d: String): DataFrame = {
    tpchViews(s, d, Seq("part", "supplier", "lineitem"))
    s.sql("""
      SELECT s_name, s_nationkey
      FROM tpch_supplier
      WHERE s_suppkey IN (
        SELECT l_suppkey FROM tpch_lineitem l1
        WHERE l_partkey IN (SELECT p_partkey FROM tpch_part
                            WHERE p_size <= 10)
          AND l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l_suppkey, l_partkey
        HAVING 2 * CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) >
          (SELECT CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
           FROM tpch_lineitem l2
           WHERE l2.l_partkey = l1.l_partkey
             AND l2.l_shipdate >= TIMESTAMP '1997-01-01'
             AND l2.l_shipdate < TIMESTAMP '1998-01-01'))
      ORDER BY s_name""")
  }

  /** TPC-H Q2 (minimum-cost supplier, schema-adapted): for each
    * small part, the region-1 supplier(s) who shipped it at the
    * minimum price. With no partsupp, lineitem is the part↔supplier
    * bridge and l_extendedprice stands in for ps_supplycost — the
    * shape under test survives intact: a CORRELATED MIN ACROSS A
    * MULTI-TABLE JOIN (lineitem × supplier × nation, the region
    * filter inside the subquery), which Catalyst must decorrelate
    * into one per-part minimum over the joined snowflake, joined
    * back on the correlation key. Prices compare as exact cents;
    * DISTINCT collapses min-price ties to unique rows.
    */
  def q135TpchMinCostSupplier(s: SparkSession, d: String): DataFrame = {
    tpchViews(s, d, Seq("part", "supplier", "lineitem", "nation"))
    s.sql("""
      SELECT DISTINCT p_partkey, p_name, s_name, s_nationkey,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS min_price_cents
      FROM tpch_part, tpch_supplier, tpch_lineitem, tpch_nation
      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        AND n_nationkey = s_nationkey AND n_regionkey = 1
        AND p_size <= 8
        AND CAST(round(l_extendedprice * 100) AS BIGINT) =
          (SELECT min(CAST(round(l2.l_extendedprice * 100) AS BIGINT))
           FROM tpch_lineitem l2, tpch_supplier s2, tpch_nation n2
           WHERE l2.l_partkey = p_partkey AND s2.s_suppkey = l2.l_suppkey
             AND n2.n_nationkey = s2.s_nationkey AND n2.n_regionkey = 1)
      ORDER BY p_partkey, s_name""")
  }

  /** TPC-H Q7 (volume shipping, schema-adapted to regions): revenue
    * shipped between two REGIONS (the synthetic nation table spreads
    * 25 nations over 5 regions; single nation pairs are too sparse),
    * split by direction and ship year. The shape under test: a
    * 6-table join whose nation dims appear TWICE under different
    * roles (supplier's vs customer's), with a symmetric disjunction
    * over the two role columns — Catalyst must keep both nation
    * joins broadcast, plan the disjunction as a post-join filter
    * (not a cartesian), and aggregate on derived columns. Revenue in
    * exact integer e4 (cents × (100−disc)).
    */
  def q138TpchVolumeShipping(s: SparkSession, d: String): DataFrame = {
    tpchViews(s, d, Seq("supplier", "lineitem", "orders", "customer",
      "nation"))
    s.sql("""
      SELECT supp_region, cust_region, l_year,
             CAST(sum(vol_e4) AS BIGINT) AS revenue_e4
      FROM (SELECT n1.n_regionkey AS supp_region,
                   n2.n_regionkey AS cust_region,
                   year(l_shipdate) AS l_year,
                   CAST(round(l_extendedprice * 100) AS BIGINT) *
                     (100 - CAST(round(l_discount * 100) AS BIGINT))
                     AS vol_e4
            FROM tpch_supplier, tpch_lineitem, tpch_orders,
                 tpch_customer, tpch_nation n1, tpch_nation n2
            WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
              AND c_custkey = o_custkey
              AND s_nationkey = n1.n_nationkey
              AND c_nationkey = n2.n_nationkey
              AND ((n1.n_regionkey = 1 AND n2.n_regionkey = 3)
                OR (n1.n_regionkey = 3 AND n2.n_regionkey = 1))
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01') shipping
      GROUP BY supp_region, cust_region, l_year
      ORDER BY supp_region, cust_region, l_year""")
  }

  /** TPC-H Q8 (national market share, schema-adapted to regions):
    * region-3 suppliers' share of the region-2 customer market per
    * order year — the conditional-aggregate-ratio shape: one join
    * tree, two sums over the same rows (a CASE-gated numerator and
    * the total), the share a single double division of the two EXACT
    * integer sums so the ratio cannot drift between engines.
    */
  def q139TpchMarketShare(s: SparkSession, d: String): DataFrame = {
    tpchViews(s, d, Seq("supplier", "lineitem", "orders", "customer",
      "nation"))
    s.sql("""
      SELECT o_year,
             CAST(sum(CASE WHEN supp_region = 3 THEN vol_e4 ELSE 0 END)
                  AS BIGINT) AS nation_e4,
             CAST(sum(vol_e4) AS BIGINT) AS total_e4,
             CAST(sum(CASE WHEN supp_region = 3 THEN vol_e4 ELSE 0 END)
                  AS DOUBLE) / CAST(sum(vol_e4) AS DOUBLE) AS mkt_share
      FROM (SELECT year(o_orderdate) AS o_year,
                   n1.n_regionkey AS supp_region,
                   CAST(round(l_extendedprice * 100) AS BIGINT) *
                     (100 - CAST(round(l_discount * 100) AS BIGINT))
                     AS vol_e4
            FROM tpch_lineitem, tpch_orders, tpch_customer,
                 tpch_supplier, tpch_nation n1, tpch_nation n2
            WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
              AND l_suppkey = s_suppkey
              AND s_nationkey = n1.n_nationkey
              AND c_nationkey = n2.n_nationkey
              AND n2.n_regionkey = 2) all_nations
      GROUP BY o_year
      ORDER BY o_year""")
  }

  /** TPC-H Q15 (top supplier): a derived revenue aggregate consumed
    * TWICE — once as the join input, once under a scalar MAX
    * subquery selecting the argmax supplier(s). The uncorrelated
    * scalar-over-aggregate must plan as one broadcast one-row
    * subquery result, and revenue compares as exact integer e4 so
    * the max boundary is bit-stable.
    */
  def q140TpchTopSupplier(s: SparkSession, d: String): DataFrame = {
    tpchViews(s, d, Seq("supplier", "lineitem"))
    s.sql("""
      WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                 (100 - CAST(round(l_discount * 100) AS BIGINT)))
                 AS BIGINT) AS total_revenue_e4
        FROM tpch_lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey)
      SELECT s_suppkey, s_name, total_revenue_e4
      FROM tpch_supplier, revenue
      WHERE s_suppkey = supplier_no
        AND total_revenue_e4 = (SELECT max(total_revenue_e4) FROM revenue)
      ORDER BY s_suppkey""")
  }

  /** TPC-H Q9 (product type profit, schema-adapted): per supplier
    * nation and order year, the profit on one product family. With
    * no partsupp table, supply cost substitutes
    * `quantity × p_retailprice × 0.5` — the SHAPE survives intact: a
    * five-table join where the selective dim filter (the part-name
    * pattern) must reach the part scan and gate the whole join tree,
    * the profit expression mixes columns of THREE tables (lineitem
    * price/discount/quantity, part retail price), and the aggregate
    * groups on derived columns from two more (nation key, order
    * year). Profit in exact integer e4 — the subtraction cannot
    * drift.
    */
  def q142TpchProductProfit(s: SparkSession, d: String): DataFrame = {
    tpchViews(s, d, Seq("part", "supplier", "lineitem", "orders", "nation"))
    s.sql("""
      SELECT n_nationkey, year(o_orderdate) AS o_year,
             CAST(sum(
               CAST(round(l_extendedprice * 100) AS BIGINT) *
                 (100 - CAST(round(l_discount * 100) AS BIGINT))
               - CAST(round(l_quantity) AS BIGINT) *
                 CAST(round(p_retailprice * 100) AS BIGINT) * 50)
               AS BIGINT) AS profit_e4
      FROM tpch_part, tpch_supplier, tpch_lineitem, tpch_orders,
           tpch_nation
      WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
        AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
        AND p_name LIKE '%anvil%'
      GROUP BY n_nationkey, year(o_orderdate)
      ORDER BY n_nationkey, o_year DESC""")
  }

  /** TPC-H Q11 (important stock, schema-adapted): the parts whose
    * total shipped value through one nation group's suppliers
    * exceeds twice the average part's — a grouped aggregate HAVING
    * against UNCORRELATED scalar subqueries over the SAME join.
    * Catalyst must compute each scalar once and broadcast it into
    * the HAVING filter, never re-evaluate per group. Official Q11
    * scales its fixed fraction by 1/SF; a fixed fraction goes empty
    * (or selects everything) as part count grows, so the adapted
    * threshold is mean-relative — `n_parts · value > 2 · total`,
    * all-integer, identical semantics at every scale. With no
    * partsupp, value is Σ price_cents · qty over lineitem as the
    * part↔supplier bridge.
    */
  def q144TpchImportantStock(s: SparkSession, d: String): DataFrame = {
    tpchViews(s, d, Seq("supplier", "lineitem"))
    s.sql("""
      SELECT l_partkey,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                      CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
               AS value_cents
      FROM tpch_lineitem, tpch_supplier
      WHERE l_suppkey = s_suppkey AND s_nationkey < 13
      GROUP BY l_partkey
      HAVING (SELECT count(DISTINCT l_partkey)
              FROM tpch_lineitem, tpch_supplier
              WHERE l_suppkey = s_suppkey AND s_nationkey < 13) *
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                      CAST(round(l_quantity) AS BIGINT)) AS BIGINT) >
        2 * (SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                             CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
             FROM tpch_lineitem, tpch_supplier
             WHERE l_suppkey = s_suppkey AND s_nationkey < 13)
      ORDER BY value_cents DESC, l_partkey""")
  }

  /** TPC-H Q12 (shipping modes and order priority, schema-adapted):
    * per line status, how many shipped lines belong to critical
    * (urgent/high) vs other orders — the fact↔fact join with
    * CONDITIONAL AGGREGATION shape. The dataset has no
    * shipmode/commitdate/receiptdate columns, so l_linestatus is the
    * grouping dimension, l_returnflag ∈ {A,R} the fact-side IN
    * filter, and the ship-year range the date window; the plan under
    * test is unchanged: both date bounds and the IN filter push to
    * the lineitem scan, the orders join is a plain equi hash join,
    * and the two CASE sums fold into ONE aggregate pass (never two
    * joins or a pivot).
    */
  def q145TpchShipPriority(s: SparkSession, d: String): DataFrame = {
    tpchViews(s, d, Seq("orders", "lineitem"))
    s.sql("""
      SELECT l_linestatus,
             CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                           THEN 1 ELSE 0 END) AS BIGINT)
               AS high_line_count,
             CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                           THEN 1 ELSE 0 END) AS BIGINT)
               AS low_line_count
      FROM tpch_orders, tpch_lineitem
      WHERE o_orderkey = l_orderkey
        AND l_returnflag IN ('A', 'R')
        AND l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY l_linestatus
      ORDER BY l_linestatus""")
  }

  /** TPC-H Q16 (parts/supplier relationship, schema-adapted): how
    * many DISTINCT suppliers ship each qualifying (brand, type,
    * size) part family, excluding flagged suppliers — the
    * DISTINCT-AGGREGATE-OVER-JOIN + NOT-IN shape. The NOT IN
    * subquery (no s_comment column, so a negative account balance
    * stands in for the complaints filter) must plan as a null-aware
    * anti join evaluated ONCE, the brand/size filters must reach the
    * part scan, and count(DISTINCT l_suppkey) must plan as the
    * two-level expand-free distinct aggregate (partial distinct on
    * (group, suppkey), final count), never a per-group set collect.
    */
  def q146TpchSupplierRelation(s: SparkSession, d: String): DataFrame = {
    tpchViews(s, d, Seq("part", "supplier", "lineitem"))
    s.sql("""
      SELECT p_brand, p_type, p_size,
             count(DISTINCT l_suppkey) AS supplier_cnt
      FROM tpch_part, tpch_lineitem
      WHERE p_partkey = l_partkey
        AND p_brand <> 'Brand#13'
        AND p_size IN (1, 4, 9, 14, 23, 36, 45, 49)
        AND l_suppkey NOT IN (SELECT s_suppkey FROM tpch_supplier
                              WHERE s_acctbal < 0)
      GROUP BY p_brand, p_type, p_size
      ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""")
  }

  val queries: Seq[Q] = Seq(
    Q("q144_tpch_important_stock", q144TpchImportantStock, Some("""
      SELECT l_partkey,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                      CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
               AS value_cents
      FROM lineitem, supplier
      WHERE l_suppkey = s_suppkey AND s_nationkey < 13
      GROUP BY l_partkey
      HAVING (SELECT count(DISTINCT l_partkey)
              FROM lineitem, supplier
              WHERE l_suppkey = s_suppkey AND s_nationkey < 13) *
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                      CAST(round(l_quantity) AS BIGINT)) AS BIGINT) >
        2 * (SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                             CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
             FROM lineitem, supplier
             WHERE l_suppkey = s_suppkey AND s_nationkey < 13)
      ORDER BY value_cents DESC, l_partkey""")),
    Q("q145_tpch_ship_priority", q145TpchShipPriority, Some("""
      SELECT l_linestatus,
             CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                           THEN 1 ELSE 0 END) AS BIGINT)
               AS high_line_count,
             CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                           THEN 1 ELSE 0 END) AS BIGINT)
               AS low_line_count
      FROM orders, lineitem
      WHERE o_orderkey = l_orderkey
        AND l_returnflag IN ('A', 'R')
        AND l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY l_linestatus
      ORDER BY l_linestatus""")),
    Q("q146_tpch_supplier_relation", q146TpchSupplierRelation, Some("""
      SELECT p_brand, p_type, p_size,
             count(DISTINCT l_suppkey) AS supplier_cnt
      FROM part, lineitem
      WHERE p_partkey = l_partkey
        AND p_brand <> 'Brand#13'
        AND p_size IN (1, 4, 9, 14, 23, 36, 45, 49)
        AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                              WHERE s_acctbal < 0)
      GROUP BY p_brand, p_type, p_size
      ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""")),
    Q("q142_tpch_product_profit", q142TpchProductProfit, Some("""
      SELECT n_nationkey, year(o_orderdate) AS o_year,
             CAST(sum(
               CAST(round(l_extendedprice * 100) AS BIGINT) *
                 (100 - CAST(round(l_discount * 100) AS BIGINT))
               - CAST(round(l_quantity) AS BIGINT) *
                 CAST(round(p_retailprice * 100) AS BIGINT) * 50)
               AS BIGINT) AS profit_e4
      FROM part, supplier, lineitem, orders, nation
      WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
        AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
        AND p_name LIKE '%anvil%'
      GROUP BY n_nationkey, year(o_orderdate)
      ORDER BY n_nationkey, o_year DESC""")),
    Q("q138_tpch_volume_shipping", q138TpchVolumeShipping, Some("""
      SELECT supp_region, cust_region, l_year,
             CAST(sum(vol_e4) AS BIGINT) AS revenue_e4
      FROM (SELECT n1.n_regionkey AS supp_region,
                   n2.n_regionkey AS cust_region,
                   year(l_shipdate) AS l_year,
                   CAST(round(l_extendedprice * 100) AS BIGINT) *
                     (100 - CAST(round(l_discount * 100) AS BIGINT))
                     AS vol_e4
            FROM supplier, lineitem, orders, customer,
                 nation n1, nation n2
            WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
              AND c_custkey = o_custkey
              AND s_nationkey = n1.n_nationkey
              AND c_nationkey = n2.n_nationkey
              AND ((n1.n_regionkey = 1 AND n2.n_regionkey = 3)
                OR (n1.n_regionkey = 3 AND n2.n_regionkey = 1))
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01') shipping
      GROUP BY supp_region, cust_region, l_year
      ORDER BY supp_region, cust_region, l_year""")),
    Q("q139_tpch_market_share", q139TpchMarketShare, Some("""
      SELECT o_year,
             CAST(sum(CASE WHEN supp_region = 3 THEN vol_e4 ELSE 0 END)
                  AS BIGINT) AS nation_e4,
             CAST(sum(vol_e4) AS BIGINT) AS total_e4,
             CAST(sum(CASE WHEN supp_region = 3 THEN vol_e4 ELSE 0 END)
                  AS DOUBLE) / CAST(sum(vol_e4) AS DOUBLE) AS mkt_share
      FROM (SELECT year(o_orderdate) AS o_year,
                   n1.n_regionkey AS supp_region,
                   CAST(round(l_extendedprice * 100) AS BIGINT) *
                     (100 - CAST(round(l_discount * 100) AS BIGINT))
                     AS vol_e4
            FROM lineitem, orders, customer, supplier,
                 nation n1, nation n2
            WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
              AND l_suppkey = s_suppkey
              AND s_nationkey = n1.n_nationkey
              AND c_nationkey = n2.n_nationkey
              AND n2.n_regionkey = 2) all_nations
      GROUP BY o_year
      ORDER BY o_year""")),
    Q("q140_tpch_top_supplier", q140TpchTopSupplier, Some("""
      WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                 (100 - CAST(round(l_discount * 100) AS BIGINT)))
                 AS BIGINT) AS total_revenue_e4
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey)
      SELECT s_suppkey, s_name, total_revenue_e4
      FROM supplier, revenue
      WHERE s_suppkey = supplier_no
        AND total_revenue_e4 = (SELECT max(total_revenue_e4) FROM revenue)
      ORDER BY s_suppkey""")),
    Q("q133_tpch_small_qty_revenue", q133TpchSmallQtyRevenue, Some("""
      SELECT count(*) AS n_small_lines,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS sum_cents
      FROM lineitem, part
      WHERE p_partkey = l_partkey
        AND p_brand = 'Brand#13'
        AND 5 * CAST(round(l_quantity) AS BIGINT) *
            (SELECT count(*) FROM lineitem l2
             WHERE l2.l_partkey = p_partkey)
          < (SELECT CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
             FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""")),
    Q("q134_tpch_part_promotion", q134TpchPartPromotion, Some("""
      SELECT s_name, s_nationkey
      FROM supplier
      WHERE s_suppkey IN (
        SELECT l_suppkey FROM lineitem l1
        WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size <= 10)
          AND l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l_suppkey, l_partkey
        HAVING 2 * CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) >
          (SELECT CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
           FROM lineitem l2
           WHERE l2.l_partkey = l1.l_partkey
             AND l2.l_shipdate >= TIMESTAMP '1997-01-01'
             AND l2.l_shipdate < TIMESTAMP '1998-01-01'))
      ORDER BY s_name""")),
    Q("q135_tpch_min_cost_supplier", q135TpchMinCostSupplier, Some("""
      SELECT DISTINCT p_partkey, p_name, s_name, s_nationkey,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS min_price_cents
      FROM part, supplier, lineitem, nation
      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        AND n_nationkey = s_nationkey AND n_regionkey = 1
        AND p_size <= 8
        AND CAST(round(l_extendedprice * 100) AS BIGINT) =
          (SELECT min(CAST(round(l2.l_extendedprice * 100) AS BIGINT))
           FROM lineitem l2, supplier s2, nation n2
           WHERE l2.l_partkey = p_partkey AND s2.s_suppkey = l2.l_suppkey
             AND n2.n_nationkey = s2.s_nationkey AND n2.n_regionkey = 1)
      ORDER BY p_partkey, s_name""")),
    Q("q125_tpch_priority_check", q125TpchPriorityCheck, Some("""
      SELECT o_orderpriority, count(*) AS order_count
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate < TIMESTAMP '1997-04-01'
        AND EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey
                      AND l_shipdate > o_orderdate)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""")),
    Q("q126_tpch_cust_distribution", q126TpchCustDistribution, Some("""
      SELECT c_count, count(*) AS custdist
      FROM (SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer LEFT OUTER JOIN orders
              ON c_custkey = o_custkey
             AND o_orderpriority <> '1-URGENT'
            GROUP BY c_custkey) c_orders
      GROUP BY c_count
      ORDER BY custdist DESC, c_count DESC""")),
    Q("q127_tpch_waiting_suppliers", q127TpchWaitingSuppliers, Some("""
      SELECT s_name, count(*) AS numwait
      FROM supplier, lineitem l1, orders
      WHERE s_suppkey = l1.l_suppkey
        AND o_orderkey = l1.l_orderkey
        AND o_orderstatus = 'F'
        AND l1.l_shipdate > TIMESTAMP '1997-09-01'
        AND EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.l_shipdate > TIMESTAMP '1997-09-01')
      GROUP BY s_name
      ORDER BY numwait DESC, s_name
      LIMIT 100""")),
    Q("q128_tpch_lapsed_customers", q128TpchLapsedCustomers, Some("""
      SELECT c_nationkey, count(*) AS numcust,
             CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
               AS totacctbal_cents
      FROM customer
      WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
        AND CAST(round(c_acctbal * 100) AS BIGINT) >
            (SELECT CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT))
                         AS DOUBLE) / count(*)
             FROM customer
             WHERE c_acctbal > 0
               AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13))
        AND NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_orderdate >= TIMESTAMP '1999-01-01')
      GROUP BY c_nationkey
      ORDER BY c_nationkey""")),
    Q("q123_tpch_disjunctive", q123TpchDisjunctive, Some("""
      SELECT count(*) AS n_lines,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                      (100 - CAST(round(l_discount * 100) AS BIGINT)))
                  AS DOUBLE) / 10000.0 AS revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
             AND CAST(round(l_quantity) AS BIGINT) BETWEEN 1 AND 20)
         OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
             AND CAST(round(l_quantity) AS BIGINT) BETWEEN 10 AND 30)
         OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
             AND CAST(round(l_quantity) AS BIGINT) BETWEEN 20 AND 40)""")),
    Q("q119_tpch_revenue_change", q119TpchRevenueChange, Some("""
      SELECT count(*) AS n_lines,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                      CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT)
               AS revenue_e4
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
        AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
        AND CAST(round(l_quantity) AS BIGINT) < 24""")),
    Q("q120_tpch_promo_effect", q120TpchPromoEffect, Some("""
      WITH l AS (
        SELECT l_partkey,
               CAST(round(l_extendedprice * 100) AS BIGINT) *
                 (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_e4
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-09-01'
          AND l_shipdate < TIMESTAMP '1997-10-01')
      SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev_e4 ELSE 0 END)
                  AS BIGINT) AS promo_rev_e4,
             CAST(sum(rev_e4) AS BIGINT) AS total_rev_e4,
             CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev_e4 ELSE 0 END)
                  AS DOUBLE) * 100.0 /
               CAST(sum(rev_e4) AS DOUBLE) AS promo_pct
      FROM l JOIN part ON l_partkey = p_partkey""")),
    Q("q111_tpch_returned_items", q111TpchReturnedItems, Some("""
      SELECT c_custkey, c_name,
             CAST(round(c_acctbal * 100) AS BIGINT) AS acct_cents,
             n_name,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                      (100 - CAST(round(l_discount * 100) AS BIGINT)))
                  AS DOUBLE) / 10000.0 AS revenue
      FROM customer, orders, lineitem, nation
      WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        AND o_orderdate >= TIMESTAMP '1996-10-01'
        AND o_orderdate < TIMESTAMP '1997-01-01'
        AND l_returnflag = 'R' AND c_nationkey = n_nationkey
      GROUP BY c_custkey, c_name, acct_cents, n_name
      ORDER BY sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                   (100 - CAST(round(l_discount * 100) AS BIGINT))) DESC,
               c_custkey
      LIMIT 20""")),
    Q("q106_tpch_large_orders", q106TpchLargeOrders, Some("""
      SELECT c_name, c_custkey, o_orderkey, o_orderdate,
             CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents,
             CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
      FROM customer, orders, lineitem
      WHERE o_orderkey IN (
              SELECT l_orderkey FROM lineitem
              GROUP BY l_orderkey
              HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 250)
        AND c_custkey = o_custkey AND o_orderkey = l_orderkey
      GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, total_cents
      ORDER BY total_cents DESC, o_orderdate ASC, o_orderkey ASC
      LIMIT 100""")),
    Q("q83_tpch_pricing", q83TpchPricing, Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 AS sum_base_price,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                      (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE)
               / 10000.0 AS sum_disc_price,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                      (100 - CAST(round(l_discount * 100) AS BIGINT)) *
                      (100 + CAST(round(l_tax * 100) AS BIGINT))) AS DOUBLE)
               / 1000000.0 AS sum_charge,
             CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS DOUBLE) / count(*)
               AS avg_qty,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 / count(*) AS avg_price,
             count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""")),
    Q("q84_tpch_shipping", q84TpchShipping, Some("""
      SELECT o_orderkey, o_orderdate,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                      (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE)
               / 10000.0 AS revenue
      FROM customer, orders, lineitem
      WHERE c_mktsegment = 'BUILDING'
        AND c_custkey = o_custkey AND l_orderkey = o_orderkey
        AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
        AND l_shipdate > TIMESTAMP '1997-03-15 00:00:00'
      GROUP BY o_orderkey, o_orderdate
      ORDER BY revenue DESC, o_orderkey
      LIMIT 10""")),
    Q("q85_tpch_local_volume", q85TpchLocalVolume, Some("""
      SELECT n_name,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                      (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE)
               / 10000.0 AS revenue
      FROM customer, orders, lineitem, supplier, nation, region
      WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        AND r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY n_name
      ORDER BY revenue DESC, n_name""")))
}
