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

/** Non-equi point-in-interval join as a WHOLE-OPERATOR extension —
  * the custom `LogicalPlan` + `SparkStrategy` + `SparkPlan` tier of
  * SparkSessionExtensions (`injectPlannerStrategy` in GraftSession),
  * completing the extension matrix next to the injected function
  * (CosineSimilarity) and optimizer rule (FuseIntersectionSize).
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
  * Scope (documented, enforced at construction): inner join,
  * half-open [lo, hi) containment, all three operands LongType
  * (fixed-point cents/micros — the engine's exact-money convention;
  * a float domain would reopen the last-ulp boundary class the
  * Money helpers exist to close). NULL point or NULL bound never
  * matches, matching SQL BETWEEN-under-inner-join semantics.
  */
final case class PointRangeJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    point: Expression,
    lo: Expression,
    hi: Expression) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): PointRangeJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[PointRangeJoin]] into [[BroadcastRangeJoinExec]]; declines
  * everything else so stock planning is untouched.
  */
object RangeJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case PointRangeJoin(l, r, p, lo, hi) =>
      BroadcastRangeJoinExec(
        planLater(l), IntervalBuildExec(planLater(r)), p, lo, hi) :: Nil
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
    point: Expression,
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
    val entries = right.executeCollect().flatMap { r =>
      val lv = boundLo.eval(r)
      val hv = boundHi.eval(r)
      if (lv == null || hv == null) None
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
      val boundPoint = BindReferences.bindReference(point, left.output)
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(output, left.output ++ right.output)
      iter.flatMap { lrow =>
        val pv = boundPoint.eval(lrow)
        if (pv == null || blos.length == 0) Iterator.empty
        else {
          val p = pv.asInstanceOf[Long]
          // rightmost index with lo <= p (exclusive upper bound search)
          var a = 0
          var b = blos.length
          while (a < b) {
            val m = (a + b) >>> 1
            if (blos(m) <= p) a = m + 1 else b = m
          }
          // walk left from it; the monotone prefix max proves that
          // once max(hi[0..j]) <= p no earlier interval can contain p
          val out = Vector.newBuilder[InternalRow]
          var j = a - 1
          var n = 0L
          while (j >= 0 && bmax(j) > p) {
            if (bhis(j) > p) {
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

    // evaluate the probe point from the streamed-side variables
    ctx.currentVars = input
    val pointEv =
      BindReferences.bindReference(point, left.output).genCode(ctx)

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

    val p = ctx.freshName("rangePoint")
    val a = ctx.freshName("rangeA")
    val b = ctx.freshName("rangeB")
    val m = ctx.freshName("rangeM")
    val j = ctx.freshName("rangeJ")
    val nullGuard =
      if (point.nullable) s"!${pointEv.isNull} && " else ""
    s"""
       |${pointEv.code}
       |if ($nullGuard$losTerm.length > 0) {
       |  long $p = ${pointEv.value};
       |  int $a = 0;
       |  int $b = $losTerm.length;
       |  while ($a < $b) {
       |    int $m = ($a + $b) >>> 1;
       |    if ($losTerm[$m] <= $p) $a = $m + 1; else $b = $m;
       |  }
       |  for (int $j = $a - 1; $j >= 0 && $maxHiTerm[$j] > $p; $j--) {
       |    if ($hisTerm[$j] > $p) {
       |      InternalRow $matchedTerm = $rowsTerm[$j];
       |      $numOutput.add(1);
       |      ${consume(ctx, input ++ rightVars)}
       |    }
       |  }
       |}
     """.stripMargin
  }
}

/** Construction API: resolves the three operand columns BY NAME
  * against each side's analyzed plan and hands Catalyst the custom
  * logical node — the DataFrame-to-DataFrame shape every built-in
  * relational verb has.
  */
object RangeJoinApi {
  def pointInRange(
      probe: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String): DataFrame = {
    val lp = probe.queryExecution.analyzed
    val rp = intervals.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String, side: String): Attribute =
      plan.output.find(_.name == name).getOrElse(throw new IllegalArgumentException(
        s"range join: no column '$name' on the $side side (have ${plan.output.map(_.name).mkString(", ")})"))
    val p = attr(lp, pointCol, "probe")
    val l = attr(rp, loCol, "intervals")
    val h = attr(rp, hiCol, "intervals")
    for (a <- Seq(p, l, h) if a.dataType != LongType)
      throw new IllegalArgumentException(
        s"range join operands must be LongType (fixed-point); '${a.name}' is ${a.dataType.simpleString}")
    val dup = probe.columns.toSet.intersect(intervals.columns.toSet)
    require(dup.isEmpty,
      s"range join output would duplicate column(s) ${dup.mkString(", ")}; alias one side first")
    org.apache.spark.sql.graft.Bridge.ofRows(
      probe.sparkSession, PointRangeJoin(lp, rp, p, l, h))
  }
}
