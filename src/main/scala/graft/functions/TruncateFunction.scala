package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{
  BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType,
  StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The lake's `truncate(W, col)` partition transform — Iceberg's
  * truncate: RANGE-friendly partitioning for keys whose locality
  * matters (bucket destroys order; truncate keeps it). Integrals
  * floor to the nearest multiple of W (`v - (v mod W)`, floorMod so
  * negatives bin leftward like SQL `pmod`); strings keep their first
  * W characters (code points, not bytes — a multi-byte prefix never
  * splits a character). The result TYPE is the column's own type, so
  * partition values stay meaningful (a date-prefix '2026-08' or an id
  * range floor 41000 reads as what it is).
  *
  * Same one-function-everywhere discipline as [[GraftBucket]]:
  * the DDL records W, the DSv2 write clusters by this V2 function,
  * the task writer tags each rolled file `truncW(c)=<value>`, the
  * scan prunes equality/IN literals by truncating them with the SAME
  * function, and the storage-partitioned join compares both sides by
  * the bound function's type-qualified canonicalName. The pure-SQL
  * twins are built-ins: `c - pmod(c, W)` for integrals,
  * `substring(c, 1, W)` for strings — maintenance and ad-hoc layout
  * queries recompute the exact tag with codegen'd functions.
  */
object GraftTruncate {

  def value(v: Long, w: Int): Long = {
    require(w >= 1, s"truncate width must be >= 1, got $w")
    v - java.lang.Math.floorMod(v, w.toLong)
  }

  def value(v: UTF8String, w: Int): UTF8String = {
    require(w >= 1, s"truncate width must be >= 1, got $w")
    v.substring(0, w)
  }

  def value(v: String, w: Int): String =
    value(UTF8String.fromString(v), w).toString

  /** Type-aware SQL twin of [[value]] — byte-identical by
    * construction (`pmod` is floorMod; `substring` counts code
    * points like UTF8String.substring).
    */
  def valueColumnFor(c: org.apache.spark.sql.Column, w: Int, dt: DataType)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit, pmod, substring}
    if (dt == StringType) substring(c, 1, w)
    else c - pmod(c, lit(w.toLong))
  }

  /** Manifest tag column for a truncate-partitioned file:
    * `trunc<W>(<col>)` — structurally distinct from identity AND
    * bucket tags, so each prune/DML surface applies exactly its own
    * semantics.
    */
  def tagCol(w: Int, c: String): String = s"trunc$w($c)"

  private val TagPattern = "trunc(\\d+)\\(([^)]+)\\)".r

  /** `Some((width, column))` when the tag is a truncate tag. */
  def parseTag(tag: String): Option[(Int, String)] = tag match {
    case TagPattern(w, c) => Some((w.toInt, c))
    case _ => None
  }

  private val FnPattern = "trunc(\\d+)".r

  /** FunctionCatalog loader for the width-named transform functions
    * (`trunc4`, …) — see [[TruncateUnbound]]'s note.
    */
  def loadTransformFn(name: String): Option[TruncateTransformUnbound] =
    name match {
      // same width bounds as the DDL gate — a trunc0 or an
      // over-wide name resolves to nothing (clean unresolved-function
      // error), never to a function that divides by zero at runtime
      case FnPattern(w) => scala.util.Try(w.toInt).toOption
        .filter(n => n >= 1 && n <= (1 << 20))
        .map(new TruncateTransformUnbound(_))
      case _ => None
    }

  /** The one-argument transform expression the write distribution and
    * the scan's key-grouped report both use.
    */
  def transformExpr(w: Int, c: String)
      : org.apache.spark.sql.connector.expressions.Transform = {
    import org.apache.spark.sql.connector.expressions.Expressions
    Expressions.apply(s"trunc$w", Expressions.column(c))
  }
}

/** DSv2 `FunctionCatalog` faces of [[GraftTruncate]].
  *
  * TWO function shapes, deliberately: Spark's `BucketTransform` is
  * the ONLY parameterized transform it special-cases (numBuckets
  * becomes transform metadata, not a child) — any other transform's
  * literal argument stays a CHILD expression, and
  * `KeyGroupedPartitioning.satisfies0` requires every leaf of every
  * partition expression to be a join key, so a generic
  * `truncate(4, col)` transform can never satisfy a clustered
  * distribution and SPJ silently degrades to a shuffle. The engine
  * therefore carries the width in the function NAME for transform
  * use — `trunc4(col)`, one column argument, leaves = [col] — which
  * is also exactly the manifest tag name, while the two-argument
  * `truncate(W, col)` stays registered for ad-hoc SQL.
  */
object TruncateUnbound extends UnboundFunction {
  override def name(): String = "truncate"
  override def description(): String =
    "truncate(width INT, value BIGINT|STRING) -> same type: the " +
      "lake's range partition transform (INT values are refused: a " +
      "floor near Int.MinValue is not representable as INT)"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2 &&
      inputType.fields(0).dataType == IntegerType &&
      (inputType.fields(1).dataType == LongType ||
        inputType.fields(1).dataType == StringType),
      s"truncate expects (INT width, BIGINT|STRING value), got " +
        inputType.simpleString)
    new TruncateBound(inputType.fields(1).dataType)
  }
}

final class TruncateBound(valType: DataType)
    extends ScalarFunction[Any] {
  override def name(): String = "truncate"
  // type-qualified: an int-keyed and long-keyed truncation never
  // pass as co-partitioned (the bucket discipline)
  override def canonicalName(): String =
    s"graft.truncate(${valType.simpleString})"
  override def inputTypes(): Array[DataType] = Array(IntegerType, valType)
  override def resultType(): DataType = valType
  override def isDeterministic: Boolean = true

  // magic-method fast path: codegen plans a direct Invoke
  def invoke(w: Int, v: Long): Long = GraftTruncate.value(v, w)
  def invoke(w: Int, v: UTF8String): UTF8String =
    GraftTruncate.value(v, w)

  override def produceResult(input: InternalRow): Any = valType match {
    case LongType => GraftTruncate.value(input.getLong(1), input.getInt(0))
    case _ =>
      GraftTruncate.value(input.getUTF8String(1), input.getInt(0))
  }
}

/** The TRANSFORM face: width in the name (`trunc4`), ONE column
  * argument — see the [[TruncateUnbound]] note for why SPJ needs
  * this shape. `name` doubles as the manifest tag prefix.
  */
final class TruncateTransformUnbound(w: Int) extends UnboundFunction {
  override def name(): String = s"trunc$w"
  override def description(): String =
    s"trunc$w(value BIGINT|STRING) -> same type: truncate(" +
      s"$w, value) as a single-argument partition transform"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 1 &&
      (inputType.fields(0).dataType == LongType ||
        inputType.fields(0).dataType == StringType),
      s"trunc$w expects one BIGINT|STRING value, got " +
        inputType.simpleString)
    new TruncateTransformBound(inputType.fields(0).dataType, w)
  }
}

final class TruncateTransformBound(valType: DataType, w: Int)
    extends ScalarFunction[Any] {
  override def name(): String = s"trunc$w"
  // type- AND width-qualified: two tables truncated at different
  // widths (or types) never pass as co-partitioned
  override def canonicalName(): String =
    s"graft.truncate(${valType.simpleString}, w=$w)"
  override def inputTypes(): Array[DataType] = Array(valType)
  override def resultType(): DataType = valType
  override def isDeterministic: Boolean = true

  def invoke(v: Long): Long = GraftTruncate.value(v, w)
  def invoke(v: UTF8String): UTF8String = GraftTruncate.value(v, w)

  override def produceResult(input: InternalRow): Any = valType match {
    case LongType => GraftTruncate.value(input.getLong(0), w)
    case _ => GraftTruncate.value(input.getUTF8String(0), w)
  }
}
