package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, BinaryExpression, Expression, Size}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `size(array_intersect(a, b))` without the intermediate array.
  *
  * The Jaccard verify stages ([[graft.operators.Dedup]]'s candidate
  * verification) only ever need the CARDINALITY of the intersection,
  * but the composed form materializes a GenericArrayData per row —
  * twice per row in the Jaccard formula, since the intersection term
  * appears in both numerator and denominator — only to take its
  * length. This fused kernel counts matches directly: an open-
  * addressing long set over the smaller side, a counting probe walk
  * over the other, zero per-row allocation beyond the table.
  *
  * Count semantics match `size(array_intersect(...))` exactly:
  * distinct common elements (array_intersect dedups its output), and
  * NULL when either input is NULL (the non-legacy size semantics —
  * the rewrite rule below only fires with legacySizeOfNull = false).
  */
object IntersectionKernels {
  /** |set(a) ∩ set(b)| for two long arrays (either may contain
    * duplicates; the count is over distinct values). Open-addressing
    * table sized to the smaller side; probing walks the larger.
    * Matched slots are tombstoned so duplicates on the probe side
    * count once.
    */
  def intersectionSize(a: ArrayData, b: ArrayData): Int = {
    val an = a.numElements()
    val bn = b.numElements()
    if (an == 0 || bn == 0) return 0
    val (build, probe) = if (an <= bn) (a, b) else (b, a)
    val n = build.numElements()
    // capacity = next power of two >= 2n → load factor <= 0.5
    var cap = 4
    while (cap < (n << 1)) cap <<= 1
    val mask = cap - 1
    val keys = new Array[Long](cap)
    val used = new Array[Boolean](cap)
    var i = 0
    while (i < n) {
      val k = build.getLong(i)
      var slot = (scala.util.hashing.byteswap64(k) & 0x7fffffffL).toInt & mask
      var done = false
      while (!done) {
        if (!used(slot)) { used(slot) = true; keys(slot) = k; done = true }
        else if (keys(slot) == k) done = true // build-side duplicate
        else slot = (slot + 1) & mask
      }
      i += 1
    }
    val matched = new Array[Boolean](cap)
    var count = 0
    val m = probe.numElements()
    i = 0
    while (i < m) {
      val k = probe.getLong(i)
      var slot = (scala.util.hashing.byteswap64(k) & 0x7fffffffL).toInt & mask
      var done = false
      while (!done) {
        if (!used(slot)) done = true // absent
        else if (keys(slot) == k) {
          if (!matched(slot)) { matched(slot) = true; count += 1 }
          done = true
        } else slot = (slot + 1) & mask
      }
      i += 1
    }
    count
  }
}

/** Fused `size(array_intersect(l, r))` over array<long> → int. */
case class IntersectionSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"intersection_size needs two array<long>, got $l, $r")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "intersection_size"

  override def nullSafeEval(l: Any, r: Any): Any =
    IntersectionKernels.intersectionSize(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernels =
      IntersectionKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = $kernels.intersectionSize($l, $r);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectionSize =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule (SparkSessionExtensions.injectOptimizerRule):
  * rewrite `Size(ArrayIntersect(a, b))` to [[IntersectionSize]] when
  * both inputs are array<long> with no null elements.
  *
  * Scoped to exactly the cases where the fusion is semantics-
  * preserving: non-legacy size (size(NULL) = NULL — the fused
  * expression's null contract), long elements (the kernel's key
  * type; every shingle/signature array in this engine), and
  * containsNull = false (array_intersect can emit a null element,
  * which size would still count — the kernel counts raw longs, so a
  * nullable element type must not route here). Everything else keeps
  * the built-in composition. Registered in GraftSession; the rule
  * runs inside the operator-optimization fixed point, after the
  * expressions it matches have been constant-folded/pushed to their
  * final shape.
  */
object FuseIntersectionSize extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(ArrayIntersect(l, r), false)
          if eligible(l.dataType) && eligible(r.dataType) =>
        IntersectionSize(l, r)
    }

  private def eligible(dt: DataType): Boolean = dt match {
    case ArrayType(LongType, false) => true
    case _ => false
  }
}
