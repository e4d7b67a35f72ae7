package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Attribute, BindReferences, BoundReference, Expression, JoinedRow,
  UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{
  BinaryExecNode, CodegenSupport, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Non-equi interval join (point containment and interval overlap)
  * as a WHOLE-OPERATOR extension — the custom `LogicalPlan` +
  * `SparkStrategy` + `SparkPlan` tier of SparkSessionExtensions
  * (`injectPlannerStrategy` in GraftSession), completing the
  * extension matrix next to the injected function (CosineSimilarity)
  * and optimizer rule (FuseIntersectionSize).
  *
  * WHY an operator and not composition: `probe.p BETWEEN iv.lo AND
  * iv.hi` with NO equi-key gives stock Spark exactly one physical
  * choice, BroadcastNestedLoopJoin — O(probe × intervals) comparisons
  * per partition. That is the right plan for a constant-size band
  * table (q17 keeps it, documented) but collapses when the interval
  * side is merely SMALL-not-tiny: at 10^4 intervals every probe row
  * pays 10^4 predicate evaluations for a handful of matches. The
  * interval-join literature's fix (sort + search — the same
  * observation behind Databricks' range-join optimization, absent
  * from OSS Spark) drops that to O(log m + matches): broadcast the
  * intervals SORTED BY lo with a running max(hi) prefix, then each
  * probe row binary-searches the last lo ≤ p and walks left, cutting
  * off as soon as the running max(hi) falls to ≤ p — overlapping
  * intervals don't break the cutoff because the prefix max is
  * monotone. The probe side streams: no shuffle, no sort, partition
  * count and partitioning PRESERVED (`outputPartitioning = left`),
  * so at 100 TB the cost is one pass over the fact table plus a
  * KB–MB broadcast, the same envelope as a broadcast hash join.
  *
  * The node is the GENERAL interval-overlap join: probe interval
  * [probeLo, probeHi) joins build interval [lo, hi) iff the two SETS
  * intersect — `probeLo < hi && lo < probeHi` AND both intervals
  * non-empty. The non-emptiness clause matters: the raw two-term
  * predicate alone would let an empty [x, x) "overlap" anything
  * spanning x, which is not what intersection means (the spec's
  * engulfing-probe case caught exactly this). Empty/inverted build
  * intervals are dropped at index build; an empty probe matches
  * nothing. Point containment is the degenerate case — [p, p+1)
  * overlaps [lo, hi) iff lo ≤ p < hi — so one operator and ONE
  * search loop serve both the q70 point shape and the q75
  * session-to-window shape; the probe-side cost only grows from
  * (log m + matches) by the extra bound evaluation.
  *
  * Scope (documented, enforced at construction): inner join,
  * half-open intervals, all operands LongType (fixed-point
  * cents/micros — the engine's exact-money convention; a float
  * domain would reopen the last-ulp boundary class the Money
  * helpers exist to close). A NULL bound on either side never
  * matches, matching SQL range-predicate-under-inner-join
  * semantics.
  */
final case class IntervalJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    probeLo: Expression,
    probeHi: Expression,
    lo: Expression,
    hi: Expression) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): IntervalJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[IntervalJoin]] into [[BroadcastRangeJoinExec]]; declines
  * everything else so stock planning is untouched.
  */
object RangeJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case IntervalJoin(l, r, plo, phi, lo, hi) =>
      BroadcastRangeJoinExec(
        planLater(l), IntervalBuildExec(planLater(r)), plo, phi, lo, hi) :: Nil
    case _ => Nil
  }
}

/** Pass-through barrier over the interval (build) side. It exists for
  * plan honesty under whole-stage codegen: without it
  * CollapseCodegenStages absorbs the build subtree into the PROBE
  * stage's span (same stage id, starred) even though the build side
  * contributes no code there — it is collected and broadcast, never
  * produced. A non-codegen node here gives the build subtree its own
  * codegen region, the same display shape a BroadcastExchange gives
  * a broadcast hash join's build side.
  */
final case class IntervalBuildExec(child: SparkPlan)
    extends org.apache.spark.sql.execution.UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override protected def doExecute(): RDD[InternalRow] = child.execute()
  override def executeCollect(): Array[InternalRow] = child.executeCollect()
  override protected def withNewChildInternal(newChild: SparkPlan): IntervalBuildExec =
    copy(child = newChild)
}

/** The broadcast payload: intervals sorted by (lo, hi) as parallel
  * primitive arrays, plus the monotone prefix max of hi that makes
  * the probe-side left-walk cutoff sound under arbitrary overlap.
  */
final class RangeIndex(
    val los: Array[Long],
    val his: Array[Long],
    val maxHi: Array[Long],
    val rows: Array[InternalRow]) extends Serializable

/** Physical broadcast range join. The interval side is collected
  * (`executeCollect` — the same driver hop every broadcast join
  * makes), sorted by lo with a running max(hi) prefix, and
  * broadcast as a [[RangeIndex]]; the probe side then streams
  * through binary search + bounded left-walk per row.
  *
  * Participates in WHOLE-STAGE CODEGEN (CodegenSupport, the
  * BroadcastHashJoin produce/consume pattern): the probe scan, the
  * search loop, and the parent's partial aggregate fuse into one
  * generated function — no interpreted seam, no virtual call per
  * probe row. `doExecute` remains as the interpreted fallback the
  * engine uses when codegen is disabled or the stage is over the
  * generated-code thresholds.
  */
final case class BroadcastRangeJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    probeLo: Expression,
    probeHi: Expression,
    lo: Expression,
    hi: Expression) extends BinaryExecNode with CodegenSupport {

  override def output: Seq[Attribute] = left.output ++ right.output

  /** Broadcast semantics: the probe side's distribution is the
    * output's distribution — AQE and downstream exchanges see
    * straight through the join, exactly like BroadcastHashJoin.
    */
  override def outputPartitioning = left.outputPartitioning

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numIntervals" -> SQLMetrics.createMetric(sparkContext, "broadcast intervals"))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastRangeJoinExec =
    copy(left = newLeft, right = newRight)

  /** Driver-side index build, shared by the interpreted and codegen
    * paths (each plan instance executes once, so this runs once):
    * evaluate bounds, drop NULL intervals, sort by lo, prefix-max hi.
    */
  @transient private lazy val broadcastIndex: Broadcast[RangeIndex] = {
    val boundLo = BindReferences.bindReference(lo, right.output)
    val boundHi = BindReferences.bindReference(hi, right.output)
    val collected = right.executeCollect()
    // Stock broadcast joins go through BroadcastExchange, which
    // enforces configured row/byte ceilings; this driver-side collect
    // has no such guard, so a misapplied call on a large interval
    // table would OOM the driver. Enforce an explicit row ceiling
    // with an actionable message instead.
    val maxRows = BroadcastRangeJoinExec.maxBuildRows
    if (collected.length > maxRows)
      throw new IllegalStateException(
        s"BroadcastRangeJoin build side has ${collected.length} rows " +
          s"(max $maxRows): the interval side is collected and " +
          "broadcast, so it must be small. Use the binned shuffle " +
          "range join (q31 pattern) for large build sides.")
    val entries = collected.flatMap { r =>
      val lv = boundLo.eval(r)
      val hv = boundHi.eval(r)
      // NULL bounds and empty/inverted intervals are not sets that
      // can intersect anything — dropped here, once, driver-side
      if (lv == null || hv == null ||
        lv.asInstanceOf[Long] >= hv.asInstanceOf[Long]) None
      else Some((lv.asInstanceOf[Long], hv.asInstanceOf[Long], r.copy()))
    }.sortBy(e => (e._1, e._2))
    longMetric("numIntervals") += entries.length
    val his = entries.map(_._2)
    val maxHi = new Array[Long](entries.length)
    var i = 0
    var run = Long.MinValue
    while (i < entries.length) {
      if (his(i) > run) run = his(i)
      maxHi(i) = run
      i += 1
    }
    sparkContext.broadcast(
      new RangeIndex(entries.map(_._1), his, maxHi, entries.map(_._3)))
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val bc = broadcastIndex

    left.execute().mapPartitions { iter =>
      val idx = bc.value
      val (blos, bhis, bmax, brows) = (idx.los, idx.his, idx.maxHi, idx.rows)
      val boundPlo = BindReferences.bindReference(probeLo, left.output)
      val boundPhi = BindReferences.bindReference(probeHi, left.output)
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(output, left.output ++ right.output)
      iter.flatMap { lrow =>
        val plov = boundPlo.eval(lrow)
        val phiv = boundPhi.eval(lrow)
        if (plov == null || phiv == null || blos.length == 0 ||
          plov.asInstanceOf[Long] >= phiv.asInstanceOf[Long]) Iterator.empty
        else {
          val plo = plov.asInstanceOf[Long]
          val phi = phiv.asInstanceOf[Long]
          // rightmost index with lo < probeHi (exclusive bound search)
          var a = 0
          var b = blos.length
          while (a < b) {
            val m = (a + b) >>> 1
            if (blos(m) < phi) a = m + 1 else b = m
          }
          // walk left from it; the monotone prefix max proves that
          // once max(hi[0..j]) <= probeLo nothing earlier can overlap
          val out = Vector.newBuilder[InternalRow]
          var j = a - 1
          var n = 0L
          while (j >= 0 && bmax(j) > plo) {
            if (bhis(j) > plo) {
              out += proj(joined(lrow, brows(j))).copy()
              n += 1
            }
            j -= 1
          }
          numOutputRows += n
          out.result().iterator
        }
      }
    }
  }

  // ---- whole-stage codegen (the BroadcastHashJoin pattern) ----

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    left.asInstanceOf[CodegenSupport].inputRDDs()

  override protected def doProduce(ctx: CodegenContext): String =
    left.asInstanceOf[CodegenSupport].produce(ctx, this)

  /** One probe row fans out to several output rows that share the
    * streamed-side variables — a buffering parent must copy.
    */
  override def needCopyResult: Boolean = true

  override def doConsume(
      ctx: CodegenContext, input: Seq[ExprCode], row: ExprCode): String = {
    val numOutput = metricTerm(ctx, "numOutputRows")
    // per-stage init: unpack the broadcast RangeIndex into locals the
    // generated loop reads as plain primitive arrays
    val idxCls = classOf[RangeIndex].getName
    val bcTerm = ctx.addReferenceObj("rangeJoinBroadcast", broadcastIndex,
      classOf[Broadcast[RangeIndex]].getName)
    val idxTerm = ctx.addMutableState(idxCls, "rangeIndex",
      v => s"$v = ($idxCls) $bcTerm.value();", forceInline = true)
    val losTerm = ctx.addMutableState("long[]", "rangeLos",
      v => s"$v = $idxTerm.los();", forceInline = true)
    val hisTerm = ctx.addMutableState("long[]", "rangeHis",
      v => s"$v = $idxTerm.his();", forceInline = true)
    val maxHiTerm = ctx.addMutableState("long[]", "rangeMaxHi",
      v => s"$v = $idxTerm.maxHi();", forceInline = true)
    val rowsTerm = ctx.addMutableState("InternalRow[]", "rangeRows",
      v => s"$v = $idxTerm.rows();", forceInline = true)

    // evaluate the probe bounds from the streamed-side variables
    ctx.currentVars = input
    val ploEv =
      BindReferences.bindReference(probeLo, left.output).genCode(ctx)
    val phiEv =
      BindReferences.bindReference(probeHi, left.output).genCode(ctx)

    // interval-side column accessors read from the matched row. Their
    // code is NOT emitted here: the consume() call inside the loop
    // places it (emitting it manually as well would redeclare the
    // locals — the BroadcastHashJoin build-vars convention).
    val matchedTerm = ctx.freshName("rangeMatched")
    ctx.currentVars = null
    ctx.INPUT_ROW = matchedTerm
    val rightVars = right.output.zipWithIndex.map { case (a, i) =>
      BoundReference(i, a.dataType, a.nullable).genCode(ctx)
    }

    val plo = ctx.freshName("rangeProbeLo")
    val phi = ctx.freshName("rangeProbeHi")
    val a = ctx.freshName("rangeA")
    val b = ctx.freshName("rangeB")
    val m = ctx.freshName("rangeM")
    val j = ctx.freshName("rangeJ")
    val nullGuard = Seq(
      if (probeLo.nullable) Some(s"!${ploEv.isNull}") else None,
      if (probeHi.nullable) Some(s"!${phiEv.isNull}") else None
    ).flatten.map(_ + " && ").mkString
    s"""
       |${ploEv.code}
       |${phiEv.code}
       |if ($nullGuard$losTerm.length > 0 &&
       |    ${ploEv.value} < ${phiEv.value}) {
       |  long $plo = ${ploEv.value};
       |  long $phi = ${phiEv.value};
       |  int $a = 0;
       |  int $b = $losTerm.length;
       |  while ($a < $b) {
       |    int $m = ($a + $b) >>> 1;
       |    if ($losTerm[$m] < $phi) $a = $m + 1; else $b = $m;
       |  }
       |  for (int $j = $a - 1; $j >= 0 && $maxHiTerm[$j] > $plo; $j--) {
       |    if ($hisTerm[$j] > $plo) {
       |      InternalRow $matchedTerm = $rowsTerm[$j];
       |      $numOutput.add(1);
       |      ${consume(ctx, input ++ rightVars)}
       |    }
       |  }
       |}
     """.stripMargin
  }
}

object BroadcastRangeJoinExec {
  /** Ceiling on collected build-side rows — the contract is "small
    * interval table, broadcast like a dim"; 4M rows of (2 longs +
    * row) is roughly the same order as Spark's default 8GB/512M-row
    * broadcast limits scaled to a driver-collected array. Read per
    * build (a once-per-query driver-side check) so specs can lower
    * it without a 4M-row fixture.
    */
  def maxBuildRows: Int =
    sys.props.get("graft.rangejoin.maxBuildRows").map(_.toInt)
      .getOrElse(4 << 20)
}

/** Construction API: resolves the operand columns BY NAME against
  * each side's analyzed plan and hands Catalyst the custom logical
  * node — the DataFrame-to-DataFrame shape every built-in relational
  * verb has.
  */
object RangeJoinApi {
  import org.apache.spark.sql.catalyst.expressions.{Add, Literal}

  /** Point containment: probe.pointCol in [lo, hi). The degenerate
    * interval [p, p+1) of [[intervalOverlap]] (one probe point of
    * Long.MaxValue would overflow the +1 under ANSI — fixed-point
    * cents/micros domains never reach it).
    */
  def pointInRange(
      probe: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String): DataFrame =
    build(probe, intervals) { (lp, rp) =>
      val p = attr(lp, pointCol, "probe")
      checkLong(p +: bounds(rp, loCol, hiCol))
      IntervalJoin(lp, rp, p, Add(p, Literal(1L)),
        attr(rp, loCol, "intervals"), attr(rp, hiCol, "intervals"))
    }

  /** Interval overlap: [probeLoCol, probeHiCol) meets [lo, hi) iff
    * probeLo < hi && lo < probeHi.
    */
  def intervalOverlap(
      probe: DataFrame, probeLoCol: String, probeHiCol: String,
      intervals: DataFrame, loCol: String, hiCol: String): DataFrame =
    build(probe, intervals) { (lp, rp) =>
      val plo = attr(lp, probeLoCol, "probe")
      val phi = attr(lp, probeHiCol, "probe")
      checkLong(Seq(plo, phi) ++ bounds(rp, loCol, hiCol))
      IntervalJoin(lp, rp, plo, phi,
        attr(rp, loCol, "intervals"), attr(rp, hiCol, "intervals"))
    }

  private def attr(plan: LogicalPlan, name: String, side: String): Attribute =
    plan.output.find(_.name == name).getOrElse(throw new IllegalArgumentException(
      s"range join: no column '$name' on the $side side (have ${plan.output.map(_.name).mkString(", ")})"))

  private def bounds(rp: LogicalPlan, loCol: String, hiCol: String): Seq[Attribute] =
    Seq(attr(rp, loCol, "intervals"), attr(rp, hiCol, "intervals"))

  private def checkLong(as: Seq[Attribute]): Unit =
    for (a <- as if a.dataType != LongType)
      throw new IllegalArgumentException(
        s"range join operands must be LongType (fixed-point); '${a.name}' is ${a.dataType.simpleString}")

  private def build(probe: DataFrame, intervals: DataFrame)(
      mk: (LogicalPlan, LogicalPlan) => IntervalJoin): DataFrame = {
    val dup = probe.columns.toSet.intersect(intervals.columns.toSet)
    require(dup.isEmpty,
      s"range join output would duplicate column(s) ${dup.mkString(", ")}; alias one side first")
    org.apache.spark.sql.graft.Bridge.ofRows(probe.sparkSession,
      mk(probe.queryExecution.analyzed, intervals.queryExecution.analyzed))
  }
}
