package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.connector.catalog.functions.{
  AggregateFunction, BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{
  ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType,
  StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL functions shipped WITH the catalog (DSv2 `FunctionCatalog`),
  * not with the session. Any Spark session that mounts the graft
  * catalog can call `SELECT graftcat.cosine_sim(a, b)` — no
  * `SparkSessionExtensions` build step, no session-local registry.
  * This is deliberately the engine's THIRD function surface:
  *
  *   - `functions/` Column helpers — compile-time Scala composition;
  *   - `plans/` Catalyst expressions via `injectFunction`
  *     (`cosine_native`) — session-bound names with custom codegen;
  *   - here — catalog-bound names resolved through DSv2, the way a
  *     lakehouse ships its UDFs to every engine that mounts the
  *     catalog, with no code change in the consuming session.
  *
  * Scale posture: the scalar functions implement the MAGIC-METHOD
  * contract (`ScalarFunction.MAGIC_METHOD_NAME`), so Catalyst plans
  * them as a direct `Invoke` on an exactly-typed JVM method inside
  * whole-stage codegen — no `InternalRow` boxing per value, no
  * ScalaUDF serialization wall. The aggregate implements the V2
  * `AggregateFunction` contract, which Spark plans as a regular
  * partial/merge hash aggregate — map-side combine like built-in
  * SUM, so a 100 TB GROUP BY shuffles one Long per (partition,
  * group), not rows.
  *
  * Semantics are pinned to surfaces the DuckDB oracle already
  * certifies elsewhere in the engine:
  *   - `cosine_sim` accumulates left-to-right in index order —
  *     bit-identical to [[graft.plans.CosineSimilarity]] and the
  *     e1/e3 oracle SQL;
  *   - `token_count` replicates `size(split(trim(text), "\\s+"))`,
  *     the t1 tokenization contract (space-only trim via
  *     `UTF8String.trim`, Java regex split with limit -1);
  *   - `sum_cents` replicates `sum(round(x * 100).cast(long))`, the
  *     [[Money]] exact-cents contract (HALF_UP via BigDecimal, the
  *     exact chain Spark's `Round` + long cast performs).
  */
object V2Functions {

  val names: Seq[String] =
    Seq("cosine_sim", "token_count", "sum_cents", "bucket", "truncate")

  def load(name: String): Option[UnboundFunction] =
    name.toLowerCase(java.util.Locale.ROOT) match {
      case "cosine_sim" => Some(CosineSimUnbound)
      case "token_count" => Some(TokenCountUnbound)
      case "sum_cents" => Some(SumCentsUnbound)
      // the partition transform ([[BucketFunction]]): resolved by
      // Spark itself for bucketed writes and storage-partitioned
      // joins, and callable as SQL for debugging layouts
      case "bucket" => Some(BucketUnbound)
      case "truncate" => Some(TruncateUnbound)
      // width-named transform faces (trunc4, trunc100, …): the shape
      // SPJ needs — see TruncateFunction's note
      case other => GraftTruncate.loadTransformFn(other)
    }

  private def require2FloatArrays(inputType: StructType): Unit = {
    val ok = inputType.fields.length == 2 && inputType.fields.forall(
      _.dataType match {
        case ArrayType(FloatType, _) => true
        case _ => false
      })
    if (!ok) throw new UnsupportedOperationException(
      s"cosine_sim expects (array<float>, array<float>), got " +
        inputType.fields.map(_.dataType.simpleString).mkString("(", ", ", ")"))
  }

  object CosineSimUnbound extends UnboundFunction {
    override def name(): String = "cosine_sim"
    override def description(): String =
      "cosine_sim(array<float>, array<float>) -> double"
    override def bind(inputType: StructType): BoundFunction = {
      require2FloatArrays(inputType)
      new CosineSimBound
    }
  }

  /** Fused dot/|a|²/|b|² pass, index order — the same kernel as
    * [[graft.plans.CosineSimilarity]], reachable from pure SQL via
    * the catalog. The magic method keeps it inside codegen.
    */
  final class CosineSimBound extends ScalarFunction[java.lang.Double]
      with Serializable {
    override def name(): String = "cosine_sim"
    override def canonicalName(): String = "graft.cosine_sim"
    override def inputTypes(): Array[DataType] =
      Array(ArrayType(FloatType), ArrayType(FloatType))
    override def resultType(): DataType = DoubleType
    override def isDeterministic: Boolean = true

    /** The magic method: Catalyst plans `Invoke(this, "invoke", …)`.
      * Magic methods see raw arguments — a null input arrives as a
      * null reference (Spark does not null-skip for us), so the
      * return is boxed and null-propagating.
      */
    def invoke(a: ArrayData, b: ArrayData): java.lang.Double = {
      if (a == null || b == null) return null
      val n = math.min(a.numElements(), b.numElements())
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val xi = a.getFloat(i).toDouble
        val yi = b.getFloat(i).toDouble
        dot += xi * yi; na += xi * xi; nb += yi * yi
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }

    /** Row-boxed fallback if magic-method lookup is unavailable. */
    override def produceResult(input: InternalRow): java.lang.Double =
      if (input.isNullAt(0) || input.isNullAt(1)) null
      else invoke(input.getArray(0), input.getArray(1))
  }

  object TokenCountUnbound extends UnboundFunction {
    override def name(): String = "token_count"
    override def description(): String = "token_count(string) -> int"
    override def bind(inputType: StructType): BoundFunction = {
      val ok = inputType.fields.length == 1 &&
        inputType.fields(0).dataType == StringType
      if (!ok) throw new UnsupportedOperationException(
        s"token_count expects (string), got " +
          inputType.fields.map(_.dataType.simpleString)
            .mkString("(", ", ", ")"))
      new TokenCountBound
    }
  }

  /** Whitespace token count — exactly `size(split(trim(text),
    * "\\s+"))`: `UTF8String.trim` is space-only (like Spark's TRIM
    * and DuckDB's trim, unlike `String.trim`), and Java regex split
    * with limit -1 matches Spark's StringSplit, so `""` counts 1
    * like the t1 convention.
    */
  final class TokenCountBound extends ScalarFunction[java.lang.Integer]
      with Serializable {
    override def name(): String = "token_count"
    override def canonicalName(): String = "graft.token_count"
    override def inputTypes(): Array[DataType] = Array(StringType)
    override def resultType(): DataType = IntegerType
    override def isDeterministic: Boolean = true

    /** Null-tolerant magic method (see cosine_sim's note). */
    def invoke(s: UTF8String): java.lang.Integer =
      if (s == null) null
      else s.trim().toString.split("\\s+", -1).length

    override def produceResult(input: InternalRow): java.lang.Integer =
      if (input.isNullAt(0)) null else invoke(input.getUTF8String(0))
  }

  object SumCentsUnbound extends UnboundFunction {
    override def name(): String = "sum_cents"
    override def description(): String =
      "sum_cents(double) -> bigint: exact money sum as integer cents"
    override def bind(inputType: StructType): BoundFunction = {
      val ok = inputType.fields.length == 1 &&
        inputType.fields(0).dataType == DoubleType
      if (!ok) throw new UnsupportedOperationException(
        s"sum_cents expects (double), got " +
          inputType.fields.map(_.dataType.simpleString)
            .mkString("(", ", ", ")"))
      new SumCentsBound
    }
  }

  /** Mutable partial state: one Long + a seen bit, merged
    * associatively — the shuffle payload per (partition, group) is
    * this state, not rows.
    */
  final class SumCentsState(
      var sum: Long, var seen: Boolean) extends Serializable

  /** Exact money SUM over a double column, as integer cents —
    * [[Money.cents]]' rounding chain (`BigDecimal.valueOf(x * 100)
    * .setScale(0, HALF_UP)`, the exact arithmetic Spark's `Round`
    * performs on doubles) inside a V2 aggregate. SQL `sum_cents(x)`
    * therefore hash-matches DuckDB's
    * `sum(CAST(round(x * 100) AS BIGINT))`. Nulls are skipped; an
    * all-null (or empty) group yields NULL, matching SUM.
    */
  final class SumCentsBound
      extends AggregateFunction[SumCentsState, java.lang.Long]
      with Serializable {
    override def name(): String = "sum_cents"
    override def canonicalName(): String = "graft.sum_cents"
    override def inputTypes(): Array[DataType] = Array(DoubleType)
    override def resultType(): DataType = LongType
    override def isDeterministic: Boolean = true

    override def newAggregationState(): SumCentsState =
      new SumCentsState(0L, false)

    override def update(
        state: SumCentsState, input: InternalRow): SumCentsState = {
      if (!input.isNullAt(0)) {
        state.sum += java.math.BigDecimal.valueOf(input.getDouble(0) * 100.0)
          .setScale(0, java.math.RoundingMode.HALF_UP)
          .doubleValue().toLong
        state.seen = true
      }
      state
    }

    override def merge(
        left: SumCentsState, right: SumCentsState): SumCentsState = {
      left.sum += right.sum
      left.seen = left.seen || right.seen
      left
    }

    override def produceResult(state: SumCentsState): java.lang.Long =
      if (state.seen) state.sum else null
  }
}
