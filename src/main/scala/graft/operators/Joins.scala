package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Money
import graft.sources.Tables
import graft.Catalog.Q

/** Join-strategy breadth beyond the reference's single reduce-side
  * inner equi-join (SURVEY.md §2.2 "joins beyond inner equi").
  * Every join here states its intended physical strategy:
  * semi/anti/outer shuffle on the join key at scale (AQE picks
  * broadcast when a side is small); the band join broadcasts an
  * inline dim through a nested-loop join, the standard shape for
  * tiny theta-joins.
  */
object Joins {

  /** Left-semi: customers having at least one high-value order.
    * Semi joins ship only the key column of the right side — at
    * 100 TB this is the cheapest existence test Spark has (no
    * row duplication, dedup happens in the join itself).
    */
  def q5SemiJoin(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d).where(col("o_totalprice") > 200000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** Left-anti: customers who never placed an urgent order (plain
    * "no orders at all" is vacuously empty on this data). NOT EXISTS
    * rather than NOT IN in the oracle — the anti join expresses the
    * intent directly without the NULL trap.
    */
  def q6AntiJoin(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d).where(col("o_orderpriority") === "1-URGENT")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** Left-outer join + aggregation: per-customer order count and
    * exact spend, keeping order-less customers (count 0, NULL spend —
    * the SQL semantics both engines share).
    */
  def q7OuterJoinAgg(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy(c("c_custkey"))
      .agg(
        count(o("o_orderkey")).as("n_orders"),
        Money.exactSum(o("o_totalprice")).as("total_spend"))
      .orderBy(col("c_custkey"))
  }

  /** Theta/band join: classify orders into price bands via a
    * broadcast inline dim and a range predicate — the non-equi join
    * shape (BroadcastNestedLoopJoin) the reference has no answer to.
    * The bands side is constant-size, so the NLJ cost is
    * O(rows × bands) with zero shuffle.
    */
  def q17BandJoin(s: SparkSession, d: String): DataFrame = {
    val bands = s.createDataFrame(
      java.util.Arrays.asList(
        Row("low", 0.0, 100000.0),
        Row("mid", 100000.0, 250000.0),
        Row("high", 250000.0, Double.MaxValue)),
      StructType(Seq(
        StructField("band", StringType, nullable = false),
        StructField("lo", DoubleType, nullable = false),
        StructField("hi", DoubleType, nullable = false))))
    val o = Tables.orders(s, d)
    o.join(broadcast(bands),
        o("o_totalprice") >= bands("lo") && o("o_totalprice") < bands("hi"))
      .groupBy(col("band"))
      .agg(
        count(lit(1)).as("n_orders"),
        Money.exactSum(col("o_totalprice")).as("band_total"))
      .orderBy(col("band"))
  }

  /** Binned (bucketized) range join — the SCALE path for interval
    * joins that q17's broadcast NLJ can't take once the interval
    * side stops being tiny: every interval [lo, hi) explodes into
    * the fixed-width bins it overlaps, every point maps to exactly
    * one bin, and the join becomes an EQUI-join on the bin id with
    * a row-local residual range check. Cost is O(points + intervals
    * × width/binW) shuffled by bin — no nested loop anywhere, and
    * hot bins are ordinary AQE-splittable skew. A point meets an
    * interval in exactly one bin (its own), so no dedup step is
    * needed. The oracle is the plain range-predicate join, proving
    * the binned decomposition exact.
    *
    * 30 overlapping price bands (stride 20k, width 50k) so the
    * decomposition handles overlap, not just a partition.
    */
  def q31BinnedRangeJoin(s: SparkSession, d: String): DataFrame = {
    val bands = s.range(0, 30).select(col("id").as("band_id"),
      (col("id") * 20000L).as("lo"), (col("id") * 20000L + 50000L).as("hi"))
    val bandBins = bands.withColumn("bin",
      explode(sequence(expr("lo div 10000"), expr("(hi - 1) div 10000"))))
    val pts = Tables.orders(s, d)
      .select(col("o_totalprice"),
        floor(col("o_totalprice") / 10000).cast(LongType).as("bin"))
    pts.join(bandBins, "bin")
      .where(col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .groupBy(col("band_id"))
      .agg(count(lit(1)).as("n_orders"),
        Money.exactSum(col("o_totalprice")).as("band_total"))
      .orderBy(col("band_id"))
  }

  /** Typed cogroup — the Dataset API's asymmetric-merge escape hatch
    * (KeyValueGroupedDataset.cogroup): both sides shuffle once on
    * the key, then arbitrary per-key Scala sees BOTH groups at once.
    * This is the brief's LAST-resort rung — objects, no codegen, no
    * Catalyst visibility — so the judged query exists to document
    * parity with the declarative twin, not to recommend the API: the
    * oracle is the plain LEFT JOIN + GROUP BY every optimizer-
    * friendly formulation would use, and the two must agree exactly
    * (customers with no orders included, money in exact cents).
    * Legitimate cogroup uses are merges that genuinely cannot be
    * expressed relationally (per-key sequence alignment, custom
    * sweep-line logic); an aggregate like this one should normally
    * be the join.
    */
  def q59Cogroup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cust = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_nationkey").cast(LongType))
      .as[(Long, Long)]
    val ord = Tables.orders(s, d)
      .select(col("o_custkey"), Money.cents(col("o_totalprice")))
      .as[(Long, Long)]
    cust.groupByKey(_._1).cogroup(ord.groupByKey(_._1)) { (k, cs, os) =>
      val cl = cs.toSeq
      if (cl.isEmpty) Iterator.empty // orphan orders: none in TPC-H
      else {
        var n = 0L; var sum = 0L; var mx = 0L
        os.foreach { o =>
          n += 1; sum += o._2; if (o._2 > mx) mx = o._2
        }
        Iterator((k, cl.head._2, n, sum, mx))
      }
    }.toDF("c_custkey", "c_nationkey", "n_orders", "sum_cents", "max_cents")
      .select(col("c_custkey"),
        col("c_nationkey").cast(IntegerType).as("c_nationkey"),
        col("n_orders"),
        (col("sum_cents").cast(DoubleType) / 100.0).as("total_spend"),
        (col("max_cents").cast(DoubleType) / 100.0).as("max_order"))
      .orderBy(col("c_custkey"))
  }

  /** Plain large-large sort-merge join — the 100 TB DEFAULT join:
    * two fact tables (lineitem ⋈ orders on orderkey), neither of
    * which fits a broadcast at production scale. Completes the
    * judged join-strategy matrix: q1 gates broadcast-hash, q52 the
    * bucketed zero-exchange SMJ, q30 the salted skew join — this is
    * the unbucketed shuffle-both-sides cell. The `merge` hint pins
    * the strategy at test SF too, where AQE would otherwise
    * broadcast the small side and the gate would silently certify
    * the wrong plan; CatalogSpec asserts the SortMergeJoin node and
    * the absence of any broadcast.
    */
  def q60SortMergeJoin(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_extendedprice"))
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderpriority"))
    li.hint("merge")
      .join(o.hint("merge"), li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        Money.exactSum(col("l_extendedprice")).as("total_price"))
      .orderBy(col("o_orderpriority"))
  }

  /** Judged shuffled hash join — the middle rung of the join-strategy
    * matrix between q1's broadcast (dim fits on every executor) and
    * q60's sort-merge (both sides huge): when one side is too big to
    * broadcast but small enough to hash-build PER PARTITION, SHJ
    * shuffles both sides on the key and builds an in-memory hash
    * table from the smaller side in each task — no sort of either
    * side, which beats SMJ when the big side's sort would dominate
    * (e.g. a fact already clustered by something else). The
    * `shuffle_hash` hint on the build side picks the strategy;
    * broadcast is disabled on a CLONED session (the q64 precedent —
    * never mutate the shared conf) so AQE cannot demote the gate to
    * a broadcast at test SF. CatalogSpec asserts the
    * ShuffledHashJoin node and the absence of both sort-merge and
    * broadcast.
    */
  def q92ShuffledHashJoin(s: SparkSession, d: String): DataFrame = {
    val ss = s.newSession()
    ss.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    ss.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    val li = Tables.lineitem(ss, d)
      .select(col("l_orderkey"), col("l_quantity"))
    val o = Tables.orders(ss, d)
      .select(col("o_orderkey"), col("o_orderstatus"))
    li.join(o.hint("shuffle_hash"), li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_items"),
        sum(round(col("l_quantity")).cast("long")).as("total_qty"))
      .orderBy(col("o_orderstatus"))
  }

  /** Native broadcast range join (graft.plans.IntervalJoin — the
    * custom LogicalPlan/Strategy/SparkPlan tier, injected via
    * `injectPlannerStrategy`): lineitem prices against 4096
    * overlapping price intervals, the non-equi regime BETWEEN q17
    * and q31. With no equi key, stock Spark's only plan here is
    * BroadcastNestedLoopJoin — O(rows × 4096) predicate evaluations
    * (~2.5B at sf0.1) — while the interval side is far too small to
    * justify q31's binned SHUFFLE of the whole probe table. The
    * custom operator broadcasts the intervals sorted with a running
    * max(hi) prefix and binary-searches per probe row: O(rows ×
    * (log 4096 + matches)), probe side streams unshuffled,
    * partitioning preserved, and the search loop participates in
    * whole-stage codegen (scan → join → partial agg is one generated
    * function). RangeJoinSpec asserts the BroadcastRangeJoin node,
    * the absence of any nested loop, and the codegen span with
    * fallback disabled.
    *
    * The interval fixture is pure 64-bit arithmetic on range(4096)
    * (lo = (i·9973 mod 100000) dollars, width 10+(i mod 200)) so
    * DuckDB rebuilds it bit-for-bit and the exact-cents aggregate
    * is hash-checkable — intervals overlap (~4.5 cover any price
    * point), so this is a genuine many-to-many theta join, not a
    * partition.
    */
  def q70RangeJoinNative(s: SparkSession, d: String): DataFrame = {
    val iv = s.range(0, 4096).select(
      col("id").as("interval_id"),
      (col("id") * 9973 % 100000 * 100).as("lo_cents"),
      ((col("id") * 9973 % 100000 + 10 + col("id") % 200) * 100).as("hi_cents"))
    val probe = Tables.lineitem(s, d)
      .select(round(col("l_extendedprice") * 100).cast(LongType).as("cents"))
    graft.plans.RangeJoinApi
      .pointInRange(probe, "cents", iv, "lo_cents", "hi_cents")
      .groupBy(col("interval_id"))
      .agg(count(lit(1)).as("n_items"), sum(col("cents")).as("sum_cents"))
      .orderBy(col("interval_id"))
  }

  /** Judged runtime-bloom-filter join — the row-level runtime filter
    * that complements q63's partition-level one. When the filtered
    * dim is too large to broadcast (the 100 TB default, q60's SMJ
    * shape) the fact side normally shuffles EVERY row, matched or
    * not. Spark's InjectRuntimeFilter instead builds a bloom filter
    * over the filtered dim's join keys (a tiny aggregate, shipped to
    * the fact side) and pushes `might_contain` into the fact scan as
    * a semi-filter: only probable matches reach the shuffle. With a
    * 20%-selective dim predicate that's ~5× fewer shuffled fact
    * bytes — the mechanism warehouses call a sideways information
    * pass. Conf is scoped to a CLONED session (StreamingGate
    * precedent — never mutate the shared conf): broadcast is
    * disabled to pin the production shuffle-join shape at test SF,
    * and the application-side scan threshold (a 10 GB production
    * default that would veto the filter on test data) is lowered so
    * the judged plan IS the runtime-filtered one. JoinsBloomSpec
    * asserts bloom_filter_agg/might_contain in the plan and exact
    * agreement with the unfiltered twin. The oracle is the plain
    * join — certifying the bloom pass as a pure optimization, never
    * a semantics change.
    */
  def q64RuntimeBloomJoin(s: SparkSession, d: String): DataFrame = {
    val ss = s.newSession()
    ss.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    ss.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1KB")
    ss.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val li = Tables.lineitem(ss, d).select(col("l_orderkey"), col("l_quantity"))
    val o = Tables.orders(ss, d)
      .where(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderstatus"))
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("long")).as("sum_qty"))
      .orderBy(col("o_orderstatus"))
  }

  /** Cost-based join reorder — the optimizer tier the other gates
    * don't touch (AQE re-plans at runtime, DPP/bloom prune scans;
    * CBO reorders the JOIN TREE from ANALYZE statistics before any
    * of that). The SQL deliberately writes the worst order —
    * fact ⋈ fact first, the selective dim last; with table stats
    * and `spark.sql.cbo.joinReorder` the optimizer must rotate the
    * orders ⋈ filtered-customer join to the bottom so the big
    * lineitem join sees the reduced intermediate. At 100 TB
    * writing-the-right-order-by-hand does not survive schema
    * evolution or ad-hoc SQL; the cost model is what makes a
    * 3+-table join safe to write declaratively. JoinsCboSpec in
    * CatalogSpec asserts the rotated logical tree (bottom join =
    * {orders, customer}); conf + managed stats tables scoped via
    * cloned session + Housekeeping. Oracle = the same join over the
    * original tables with the dim filter as a WHERE.
    */
  def q69CboReorder(s: SparkSession, d: String): DataFrame = {
    val ss = s.newSession()
    ss.conf.set("spark.sql.cbo.enabled", "true")
    ss.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    val tag = java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    val (tl, to, tc) =
      (s"graft_q69_li_$tag", s"graft_q69_ord_$tag", s"graft_q69_cust_$tag")
    graft.sources.Housekeeping.tables(ss, "q69_cbo", Seq(tl, to, tc))
    Tables.lineitem(ss, d).select(col("l_orderkey"), col("l_quantity"))
      .write.saveAsTable(tl)
    Tables.orders(ss, d).select(col("o_orderkey"), col("o_custkey"))
      .write.saveAsTable(to)
    Tables.customer(ss, d).where(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey")).write.saveAsTable(tc)
    Seq(tl, to, tc).foreach(t => ss.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS"))
    ss.sql(s"""
      SELECT count(*) AS n_rows,
             sum(CAST(l_quantity AS BIGINT)) AS sum_qty
      FROM $tl l
      JOIN $to o ON l.l_orderkey = o.o_orderkey
      JOIN $tc c ON o.o_custkey = c.c_custkey""")
  }

  /** Correlated subqueries — the SQL surface Catalyst DECORRELATES
    * into the joins this module gates directly: two correlated
    * scalar subqueries (→ aggregate + join after
    * RewriteCorrelatedScalarSubquery) and an EXISTS (→ left-semi
    * after RewritePredicateSubquery). Semantics: orders costing more
    * than twice their customer's average order value, having at
    * least one high-quantity line item. The average comparison is
    * cross-multiplied into exact integer cents (price·n > 2·sum ⟺
    * price > 2·avg, n > 0 always — the customer has this very
    * order), so the judged rows never ride on last-ulp float
    * averages diverging across engines. At scale both decorrelated
    * aggregates shuffle orders once on o_custkey and the EXISTS is a
    * semi join on orderkey — no per-row re-execution anywhere, which
    * is the entire point of decorrelation.
    */
  def q61CorrelatedSubquery(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("orders_cs")
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem_cs")
    s.sql("""
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders_cs o
      WHERE CAST(round(o.o_totalprice * 100) AS BIGINT) *
              (SELECT count(*) FROM orders_cs o2
               WHERE o2.o_custkey = o.o_custkey)
            > 2 * (SELECT sum(CAST(round(o2.o_totalprice * 100) AS BIGINT))
                   FROM orders_cs o2
                   WHERE o2.o_custkey = o.o_custkey)
        AND EXISTS (SELECT 1 FROM lineitem_cs l
                    WHERE l.l_orderkey = o.o_orderkey
                      AND l.l_quantity >= 45)
      ORDER BY o_orderkey""")
  }

  /** LATERAL join — the other half of the subquery surface next to
    * q61's correlated-scalar/EXISTS forms: a per-row dependent
    * subquery with ORDER BY + LIMIT (top-2 customers per nation by
    * balance). Catalyst decorrelates the LIMIT via a rank rewrite —
    * the plan is one window over customer partitioned by nationkey
    * plus a join to nation, NOT a per-nation re-execution, which is
    * what makes the construct usable at 100 TB (the naive reading is
    * O(nations × customer-scan)). Ties broken by c_custkey so the
    * top-2 frontier is deterministic across engines.
    */
  def q66LateralJoin(s: SparkSession, d: String): DataFrame = {
    Tables.nation(s, d).createOrReplaceTempView("nation_lj")
    Tables.customer(s, d).createOrReplaceTempView("customer_lj")
    s.sql("""
      SELECT n.n_name, t.c_custkey, t.c_acctbal
      FROM nation_lj n
      JOIN LATERAL (
        SELECT c_custkey, c_acctbal FROM customer_lj c
        WHERE c.c_nationkey = n.n_nationkey
        ORDER BY c_acctbal DESC, c_custkey
        LIMIT 2
      ) t
      ORDER BY n.n_name, t.c_acctbal DESC, t.c_custkey""")
  }

  val queries: Seq[Q] = Seq(
    Q("q70_range_join_native", q70RangeJoinNative, Some("""
      SELECT iv.interval_id,
             count(*) AS n_items,
             CAST(sum(li.cents) AS BIGINT) AS sum_cents
      FROM (SELECT CAST(range AS BIGINT) AS interval_id,
                   (range * 9973 % 100000) * 100 AS lo_cents,
                   (range * 9973 % 100000 + 10 + range % 200) * 100 AS hi_cents
            FROM range(0, 4096)) iv
      JOIN (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
            FROM lineitem) li
        ON li.cents >= iv.lo_cents AND li.cents < iv.hi_cents
      GROUP BY iv.interval_id
      ORDER BY iv.interval_id""")),
    Q("q69_cbo_reorder", q69CboReorder, Some("""
      -- outer CAST: DuckDB sum(BIGINT) is HUGEINT (int128), which the
      -- driver's comparator canonicalizes differently from Spark's
      -- int64 — the only hash-mismatch cause in round 5 (q64/q69 were
      -- the catalog's only bare-HUGEINT oracles; q70's cast is green)
      SELECT count(*) AS n_rows,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE c.c_mktsegment = 'BUILDING'""")),
    Q("q66_lateral_join", q66LateralJoin, Some("""
      SELECT n.n_name, t.c_custkey, t.c_acctbal
      FROM nation n
      JOIN LATERAL (
        SELECT c_custkey, c_acctbal FROM customer c
        WHERE c.c_nationkey = n.n_nationkey
        ORDER BY c_acctbal DESC, c_custkey
        LIMIT 2
      ) t ON TRUE
      ORDER BY n.n_name, t.c_acctbal DESC, t.c_custkey""")),
    Q("q64_bloom_join", q64RuntimeBloomJoin, Some("""
      -- outer CAST: avoid a bare HUGEINT output column (see q69 note)
      SELECT o_orderstatus,
             count(*) AS n_items,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderpriority = '1-URGENT'
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus""")),
    Q("q61_correlated_subquery", q61CorrelatedSubquery, Some("""
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders o
      WHERE CAST(round(o.o_totalprice * 100) AS BIGINT) *
              (SELECT count(*) FROM orders o2
               WHERE o2.o_custkey = o.o_custkey)
            > 2 * (SELECT sum(CAST(round(o2.o_totalprice * 100) AS BIGINT))
                   FROM orders o2
                   WHERE o2.o_custkey = o.o_custkey)
        AND EXISTS (SELECT 1 FROM lineitem l
                    WHERE l.l_orderkey = o.o_orderkey
                      AND l.l_quantity >= 45)
      ORDER BY o_orderkey""")),
    Q("q92_shuffled_hash_join", q92ShuffledHashJoin, Some("""
      SELECT o_orderstatus,
             count(*) AS n_items,
             CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus""")),
    Q("q60_smj", q60SortMergeJoin, Some("""
      SELECT o_orderpriority,
             count(*) AS n_items,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS total_price
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""")),
    Q("q59_cogroup", q59Cogroup, Some("""
      SELECT c_custkey, c_nationkey,
             count(o.o_orderkey) AS n_orders,
             CAST(coalesce(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)), 0)
               AS DOUBLE) / 100.0 AS total_spend,
             CAST(coalesce(max(CAST(round(o.o_totalprice * 100) AS BIGINT)), 0)
               AS DOUBLE) / 100.0 AS max_order
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c_custkey, c_nationkey
      ORDER BY c_custkey""")),
    Q("q31_binned_range_join", q31BinnedRangeJoin, Some("""
      SELECT band_id,
             count(*) AS n_orders,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS band_total
      FROM orders
      JOIN (SELECT CAST(range AS BIGINT) AS band_id,
                   range * 20000 AS lo, range * 20000 + 50000 AS hi
            FROM range(0, 30)) bands
        ON o_totalprice >= lo AND o_totalprice < hi
      GROUP BY band_id
      ORDER BY band_id""")),
    Q("q5_semi_join", q5SemiJoin, Some("""
      SELECT c_custkey, c_name, c_mktsegment
      FROM customer
      WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 200000)
      ORDER BY c_custkey""")),
    Q("q6_anti_join", q6AntiJoin, Some("""
      SELECT c_custkey, c_name
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_orderpriority = '1-URGENT')
      ORDER BY c_custkey""")),
    Q("q7_outer_join_agg", q7OuterJoinAgg, Some("""
      SELECT c_custkey,
             count(o_orderkey) AS n_orders,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_spend
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
      ORDER BY c_custkey""")),
    Q("q17_band_join", q17BandJoin, Some("""
      SELECT band,
             count(*) AS n_orders,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS band_total
      FROM orders
      JOIN (VALUES ('low', 0.0, 100000.0),
                   ('mid', 100000.0, 250000.0),
                   ('high', 250000.0, 1e308)) v(band, lo, hi)
        ON o_totalprice >= lo AND o_totalprice < hi
      GROUP BY band
      ORDER BY band"""))
  )
}
