package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.plans.RangeJoinApi

/** The custom broadcast range join (plans/RangeJoin.scala): semantic
  * parity with the stock theta-join formulation, the boundary/NULL
  * contract, the overlap cutoff's soundness, and the plan gate that
  * makes q70 mean something (custom node present, no nested loop,
  * probe scan pruned).
  */
class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def intervals(rows: Seq[(Long, Option[Long], Option[Long])]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, lo, hi) =>
        Row(id, lo.orNull, hi.orNull)
      }),
      StructType(Seq(
        StructField("iv_id", LongType, nullable = false),
        StructField("lo", LongType, nullable = true),
        StructField("hi", LongType, nullable = true))))

  private val fixtureIv = intervals(Seq(
    (0L, Some(0L), Some(1000L)),   // wide — every in-domain point
    (1L, Some(10L), Some(20L)),    // nested inside 0
    (2L, Some(30L), Some(30L)),    // empty [30,30) — matches nothing
    (3L, Some(500L), Some(600L)),  // overlaps 0
    (4L, None, Some(50L)),         // NULL bound — dropped
    (5L, Some(40L), None)))        // NULL bound — dropped

  private def joinPoints(pts: Seq[Option[Long]]) =
    RangeJoinApi.pointInRange(
      pts.toDF("p"), "p", fixtureIv, "lo", "hi")
      .select(col("p"), col("iv_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("containment is half-open [lo, hi), overlaps emit every match") {
    assert(joinPoints(Seq(Some(550L))) ===
      Set((550L, 0L), (550L, 3L)))
    assert(joinPoints(Seq(Some(15L))) === Set((15L, 0L), (15L, 1L)))
    // p == lo matches, p == hi does not; [30,30) can never match
    assert(joinPoints(Seq(Some(10L))) === Set((10L, 0L), (10L, 1L)))
    assert(joinPoints(Seq(Some(20L))) === Set((20L, 0L)))
    assert(joinPoints(Seq(Some(30L))) === Set((30L, 0L)))
    assert(joinPoints(Seq(Some(0L))) === Set((0L, 0L)))
    assert(joinPoints(Seq(Some(1000L))) === Set.empty[(Long, Long)])
  }

  test("NULL points and out-of-domain points match nothing; empty sides are sane") {
    assert(joinPoints(Seq(None, Some(-5L), Some(5000L))) ===
      Set.empty[(Long, Long)])
    val emptyIv = intervals(Seq.empty)
    assert(RangeJoinApi.pointInRange(
      Seq(Some(5L)).toDF("p"), "p", emptyIv, "lo", "hi").count() === 0L)
    assert(RangeJoinApi.pointInRange(
      Seq.empty[Option[Long]].toDF("p"), "p", fixtureIv, "lo", "hi")
      .count() === 0L)
  }

  test("interval overlap is half-open on both sides; touching intervals do not match") {
    def probe(iv: Seq[(Long, Long)]) =
      iv.zipWithIndex.map { case ((l, h), i) => (i.toLong, l, h) }
        .toDF("p_id", "p_lo", "p_hi")
    def overlaps(iv: Seq[(Long, Long)]) =
      graft.plans.RangeJoinApi
        .intervalOverlap(probe(iv), "p_lo", "p_hi", fixtureIv, "lo", "hi")
        .select(col("p_id"), col("iv_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // fixture intervals: 0=[0,1000) 1=[10,20) 2=[30,30) 3=[500,600)
    // [600, 700) touches 3 at its hi endpoint — no overlap; inside 0
    assert(overlaps(Seq((600L, 700L))) === Set((0L, 0L)))
    // [5, 10) touches 1 at its lo endpoint — no overlap; inside 0
    assert(overlaps(Seq((5L, 10L))) === Set((0L, 0L)))
    // [15, 505) crosses 1 and 3, never matches empty 2
    assert(overlaps(Seq((15L, 505L))) ===
      Set((0L, 0L), (0L, 1L), (0L, 3L)))
    // an EMPTY probe interval overlaps nothing
    assert(overlaps(Seq((50L, 50L))) === Set.empty[(Long, Long)])
    // a probe engulfing everything matches all non-empty intervals
    assert(overlaps(Seq((-100L, 2000L))) ===
      Set((0L, 0L), (0L, 1L), (0L, 3L)))
  }

  test("construction rejects non-long operands, missing and duplicate columns") {
    val doubles = Seq(1.5).toDF("p")
    intercept[IllegalArgumentException] {
      RangeJoinApi.pointInRange(doubles, "p", fixtureIv, "lo", "hi")
    }
    intercept[IllegalArgumentException] {
      RangeJoinApi.pointInRange(Seq(1L).toDF("p"), "nope", fixtureIv, "lo", "hi")
    }
    intercept[IllegalArgumentException] {
      RangeJoinApi.pointInRange(Seq(1L).toDF("lo"), "lo", fixtureIv, "lo", "hi")
    }
  }

  test("q70 matches the stock theta-join formulation row for row") {
    val d = sf("sf0.001")
    val iv = spark.range(0, 4096).select(
      col("id").as("interval_id"),
      (col("id") * 9973 % 100000 * 100).as("lo_cents"),
      ((col("id") * 9973 % 100000 + 10 + col("id") % 200) * 100).as("hi_cents"))
    val probe = graft.sources.Tables.lineitem(spark, d)
      .select(round(col("l_extendedprice") * 100).cast(LongType).as("cents"))
    val stock = probe.join(broadcast(iv),
        col("cents") >= col("lo_cents") && col("cents") < col("hi_cents"))
      .groupBy(col("interval_id"))
      .agg(count(lit(1)).as("n_items"), sum(col("cents")).as("sum_cents"))
      .orderBy(col("interval_id"))
      .collect().toSeq
    val native = graft.operators.Joins.q70RangeJoinNative(spark, d)
      .collect().toSeq
    assert(native.nonEmpty)
    assert(native === stock)
  }

  test("q70 plans the custom node: no nested loop, probe scan pruned, no probe shuffle below the join") {
    val df = graft.operators.Joins.q70RangeJoinNative(spark, sf("sf0.001"))
    val plan = df.queryExecution.executedPlan
    val s = plan.toString
    assert(s.contains("BroadcastRangeJoin"), s"custom node missing:\n$s")
    assert(!s.contains("BroadcastNestedLoopJoin"), s"stock NLJ leaked in:\n$s")
    // the probe side streams into the join unshuffled — every
    // Exchange in the plan sits ABOVE the join (the aggregation),
    // none below it
    // AQE wraps the tree; collect() doesn't descend into it
    val inner = plan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val joinNode = inner.collectFirst {
      case j: graft.plans.BroadcastRangeJoinExec => j }
    assert(joinNode.nonEmpty, "BroadcastRangeJoinExec not found in executed plan")
    val exchangesBelow = joinNode.get.collect {
      case e if e.nodeName.contains("Exchange") => e }
    assert(exchangesBelow.isEmpty,
      s"probe side shuffled below the range join:\n$s")
    // column pruning reaches the parquet scan: only l_extendedprice read
    assert(s.contains("ReadSchema: struct<l_extendedprice:double>"),
      s"probe scan not pruned to l_extendedprice:\n$s")
  }

  test("interpreted and codegen paths are exact twins (the operator has two implementations)") {
    // BroadcastRangeJoinExec implements the same search twice: once
    // in doExecute (interpreted fallback) and once in generated Java
    // (doConsume). A divergence between them would only surface when
    // Spark silently falls back — so pin row-for-row parity with
    // whole-stage codegen force-disabled vs force-enabled.
    val off = spark.newSession()
    off.conf.set("spark.sql.codegen.wholeStage", "false")
    val on = spark.newSession()
    on.conf.set("spark.sql.codegen.wholeStage", "true")
    on.conf.set("spark.sql.codegen.fallback", "false")
    val a = graft.operators.Joins.q70RangeJoinNative(off, sf("sf0.001")).collect().toSeq
    val b = graft.operators.Joins.q70RangeJoinNative(on, sf("sf0.001")).collect().toSeq
    assert(a.nonEmpty)
    assert(a === b)
    val c = graft.operators.Sessionize
      .q75SessionWindowOverlap(off, sf("sf0.001")).collect().toSeq
    val dd = graft.operators.Sessionize
      .q75SessionWindowOverlap(on, sf("sf0.001")).collect().toSeq
    assert(c.nonEmpty)
    assert(c === dd)
  }

  test("build side over the broadcast ceiling fails loudly, not with a driver OOM") {
    // the ceiling is read per build, so the spec lowers it instead of
    // collecting a 4M-row fixture; stock broadcast joins get this
    // guard from BroadcastExchange — the custom collect must match
    sys.props("graft.rangejoin.maxBuildRows") = "3"
    try {
      val iv = spark.range(0, 10).select(
        col("id").as("iv_id"), (col("id") * 10).as("lo"),
        (col("id") * 10 + 5).as("hi"))
      val probe = Seq(1L, 12L, 23L).toDF("p")
      val e = intercept[Exception] {
        RangeJoinApi.pointInRange(probe, "p", iv, "lo", "hi").collect()
      }
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: causes(t.getCause)
      assert(causes(e).exists(c =>
        Option(c.getMessage).exists(_.contains("binned shuffle range join"))),
        s"expected the build-cap message in the cause chain: $e")
    } finally sys.props -= "graft.rangejoin.maxBuildRows"
    // and back under the default cap the same join runs
    val iv = spark.range(0, 10).select(
      col("id").as("iv_id"), (col("id") * 10).as("lo"),
      (col("id") * 10 + 5).as("hi"))
    assert(RangeJoinApi.pointInRange(
      Seq(1L, 12L, 23L).toDF("p"), "p", iv, "lo", "hi").count() === 3L)
  }

  test("q70's join participates in whole-stage codegen (starred node, fused with scan and partial agg)") {
    // fallback=false turns a generated-code compile failure into a
    // thrown error — without it Spark falls back to the interpreted
    // path SILENTLY and the starred plan string would still lie
    val ss = spark.newSession()
    ss.conf.set("spark.sql.codegen.fallback", "false")
    val df = graft.operators.Joins.q70RangeJoinNative(ss, sf("sf0.001"))
    // codegen stages materialize per-AQE-stage at execution time —
    // the pre-execution plan shows no stars anywhere
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    assert(s.matches("(?s).*\\*\\(\\d+\\) BroadcastRangeJoin.*"),
      s"range join not inside a WholeStageCodegen span:\n$s")
  }
}
