package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{
  BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType,
  StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The lake's `bucket(N, col)` partition transform — the hash that
  * makes high-cardinality keys storage-partitionable (Iceberg's
  * bucket transform shape: identity partitioning on a key with
  * millions of values would mean millions of files; hashing the key
  * into N stable buckets gives N co-located file groups, and a join
  * of two tables bucketed the same way needs ZERO shuffle on either
  * side). One function, used identically by every surface:
  *
  *  - the catalog DDL (`PARTITIONED BY (bucket(8, k))`) records N
  *    and the column;
  *  - the DSv2 write's `RequiresDistributionAndOrdering` clusters by
  *    this V2 function (Spark resolves it through the catalog's
  *    `FunctionCatalog` face and plans the repartition itself);
  *  - the task writer tags each rolled file with its bucket id;
  *  - the scan reports `KeyGroupedPartitioning(bucket(N, k))` and the
  *    storage-partitioned join compares both sides' transforms by
  *    this function's `canonicalName`;
  *  - equality/IN predicates on the column prune files by hashing
  *    the literals with the SAME function.
  *
  * The hash is Spark's own XXH64 with the engine's default seed 42 —
  * deliberately, because it makes the bucket id EXPRESSIBLE IN PURE
  * SQL as `pmod(xxhash64(cast(c AS bigint)), N)`: maintenance verbs
  * (re-bucketing compaction) and ad-hoc layout queries compute the
  * exact same id with built-in, codegen'd functions, no private
  * hooks. Full avalanche, so dense sequential ids spread uniformly.
  * `floorMod` (= SQL `pmod`) keeps ids non-negative for negative
  * keys. Determinism across JVMs is the contract that makes old
  * files' tags forever valid.
  */
object GraftBucket {

  def id(v: Long, n: Int): Int =
    java.lang.Math.floorMod(
      org.apache.spark.sql.catalyst.expressions.XXH64
        .hashLong(v, 42L), n.toLong).toInt

  /** String keys hash their UTF-8 BYTES with the same XXH64/seed 42
    * — exactly what Spark's built-in `xxhash64(stringCol)` computes,
    * so the pure-SQL twin `pmod(xxhash64(c), N)` holds for strings
    * too. This is what lets dedup/curation corpora bucket on their
    * natural keys (md5 digests, URLs) and storage-partition-join
    * without a shuffle.
    */
  def id(v: UTF8String, n: Int): Int =
    java.lang.Math.floorMod(
      org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        v.getBaseObject, v.getBaseOffset, v.numBytes, 42L),
      n.toLong).toInt

  def id(v: String, n: Int): Int = id(UTF8String.fromString(v), n)

  /** The SQL twin of [[id]] — byte-identical by construction. */
  def idColumn(c: org.apache.spark.sql.Column, n: Int)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit, pmod, xxhash64}
    pmod(xxhash64(c.cast("long")), lit(n.toLong)).cast("int")
  }

  /** Type-aware SQL twin: strings hash their bytes directly (no
    * cast), integrals hash the widened long — each matching the
    * corresponding [[id]] overload.
    */
  def idColumnFor(c: org.apache.spark.sql.Column, n: Int, dt: DataType)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit, pmod, xxhash64}
    if (dt == StringType) pmod(xxhash64(c), lit(n.toLong)).cast("int")
    else idColumn(c, n)
  }

  /** The manifest partition-tag column name for a bucketed file:
    * `bucket<N>(<col>)` — structurally distinct from any identity
    * tag, so identity-partition machinery (partition DML, SHOW
    * PARTITIONS, grouped aggregate pushdown) never mistakes a bucket
    * id for a column VALUE.
    */
  def tagCol(n: Int, c: String): String = s"bucket$n($c)"

  private val TagPattern = "bucket(\\d+)\\(([^)]+)\\)".r

  /** Parse a manifest tag column: `Some((numBuckets, column))` when
    * it is a bucket tag, `None` for identity tags.
    */
  def parseTag(tag: String): Option[(Int, String)] = tag match {
    case TagPattern(n, c) => Some((n.toInt, c))
    case _ => None
  }
}

/** DSv2 `FunctionCatalog` face of [[GraftBucket]] — what lets Spark
  * itself resolve the `bucket(N, col)` transform in write
  * distributions and `KeyGroupedPartitioning` (V2ExpressionUtils
  * loads "bucket" from the table's catalog, the Iceberg pattern).
  */
object BucketUnbound extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(numBuckets INT, value BIGINT|INT|STRING) -> INT: the " +
      "lake's hash partition transform"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2 &&
      inputType.fields(0).dataType == IntegerType &&
      (inputType.fields(1).dataType == LongType ||
        inputType.fields(1).dataType == IntegerType ||
        inputType.fields(1).dataType == StringType),
      s"bucket expects (INT numBuckets, BIGINT|INT|STRING value), got " +
        inputType.simpleString)
    new BucketBound(inputType.fields(1).dataType)
  }
}

final class BucketBound(valType: DataType)
    extends ScalarFunction[java.lang.Integer] {
  override def name(): String = "bucket"
  // the SPJ compatibility check compares both sides' bound functions
  // by canonical name — type-qualified so an int-keyed and a
  // long-keyed bucketing never pass as co-partitioned
  override def canonicalName(): String =
    s"graft.bucket(${valType.simpleString})"
  override def inputTypes(): Array[DataType] = Array(IntegerType, valType)
  override def resultType(): DataType = IntegerType
  override def isDeterministic: Boolean = true

  // magic-method fast path: codegen plans a direct Invoke, no
  // InternalRow boxing per row in the write's repartition
  def invoke(n: Int, v: Long): Int = GraftBucket.id(v, n)
  def invoke(n: Int, v: Int): Int = GraftBucket.id(v.toLong, n)
  def invoke(n: Int, v: UTF8String): Int = GraftBucket.id(v, n)

  override def produceResult(input: InternalRow): java.lang.Integer =
    valType match {
      case LongType => GraftBucket.id(input.getLong(1), input.getInt(0))
      case StringType =>
        GraftBucket.id(input.getUTF8String(1), input.getInt(0))
      case _ => GraftBucket.id(input.getInt(1).toLong, input.getInt(0))
    }
}
