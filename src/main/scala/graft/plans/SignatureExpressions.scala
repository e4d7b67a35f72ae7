package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/** Native signature kernels for the dedup operators.
  *
  * Spark's higher-order functions (transform/aggregate/zip_with) are
  * evaluated INTERPRETED — each element pays lambda-variable binding
  * and boxing, and the enclosing operator drops out of efficient
  * per-element codegen. For signature kernels that touch every token
  * of every document (MinHash: |shingles|×32 ops, SimHash:
  * |tokens|×63), that overhead dominated the profile: the HOF
  * formulations measured 21s (MinHash) / 10s (SimHash) at sf0.1
  * where these fused single-pass kernels run in well under a second.
  * Same asymptotics, ~40× constant.
  *
  * Hashing matches Spark's own `xxhash64(...)` (XXH64, seed 42) so
  * signatures are stable engine artifacts independent of which
  * formulation produced them.
  */
object SignatureKernels {
  val Seed = 42L

  def hashUtf8(s: UTF8String): Long =
    XXH64.hashUTF8String(s, Seed)

  /** Tokenize on ASCII whitespace runs (the `\s+` split semantics on
    * this corpus) and return the SORTED DISTINCT XXH64 hashes of the
    * word n-grams. An n-gram's hash chains successive token hashes
    * through XXH64.hashLong, so no intermediate strings are built.
    * This replaces the split/sequence/element_at/concat_ws/
    * array_distinct HOF chain, which evaluated interpreted at ~27µs
    * per shingle (≈6s per pass over 5k docs at sf0.1) versus ~1µs
    * here — and the long-array output makes downstream set
    * intersections integer-cheap.
    */
  def ngramHashes(text: UTF8String, n: Int): Array[Long] = {
    val bytes = text.getBytes
    // token hashes in order
    val tokHashes = scala.collection.mutable.ArrayBuffer.empty[Long]
    var i = 0
    val len = bytes.length
    while (i < len) {
      while (i < len && isWs(bytes(i))) i += 1
      val start = i
      while (i < len && !isWs(bytes(i))) i += 1
      if (i > start)
        tokHashes += XXH64.hashUnsafeBytes(bytes,
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + start,
          i - start, Seed)
    }
    val t = tokHashes.length
    if (t < n) return Array.emptyLongArray
    val grams = new Array[Long](t - n + 1)
    var g = 0
    while (g <= t - n) {
      var h = tokHashes(g)
      var j = 1
      while (j < n) { h = XXH64.hashLong(tokHashes(g + j), h); j += 1 }
      grams(g) = h
      g += 1
    }
    java.util.Arrays.sort(grams)
    // dedup in place
    var w = 0
    var r = 0
    while (r < grams.length) {
      if (w == 0 || grams(r) != grams(w - 1)) { grams(w) = grams(r); w += 1 }
      r += 1
    }
    java.util.Arrays.copyOf(grams, w)
  }

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' || b == 0x0B

  /** MinHash over pre-hashed n-grams. */
  def minhashLongs(arr: ArrayData, a: Array[Long], b: Array[Long], p: Long): Array[Long] = {
    val k = a.length
    val mins = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val x = arr.getLong(i) % p
      val h = if (x < 0) x + p else x
      var j = 0
      while (j < k) {
        val v = (h * a(j) + b(j)) % p
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    mins
  }

  /** All random-hyperplane LSH signatures of a float vector in one
    * fused pass: `tables` signatures of `bits` sign-bits each, the
    * planes flattened row-major as (table, bit, dim). Arithmetic is
    * float→double cast then double multiply-accumulate in index
    * order — bit-identical to the HOF formulation
    * (aggregate(zip_with(...))) it replaces, which evaluated
    * interpreted at 48 lambda-bound dot products per row and was
    * the last interpreted hot kernel in the repo.
    */
  def hyperplaneSigs(
      arr: ArrayData, planes: Array[Double],
      tables: Int, bits: Int, dim: Int): Array[Int] = {
    val n = arr.numElements()
    // degenerate input → all-zero signatures, matching the HOF twin
    // exactly: zip_with pads a length mismatch with nulls (either
    // side) and nulls the product of a null element, aggregate then
    // nulls the dot, and `when(null > 0)` leaves every bit 0. So
    // any wrong-length vector and any vector containing a null maps
    // to signature 0 in every table — silently truncating or
    // reading the null slot as 0.0 would bucket such rows
    // differently under the two formulations.
    if (n != dim) return new Array[Int](tables)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return new Array[Int](tables)
      i += 1
    }
    val v = new Array[Double](dim)
    i = 0
    while (i < n) { v(i) = arr.getFloat(i).toDouble; i += 1 }
    val out = new Array[Int](tables)
    var t = 0
    var off = 0
    while (t < tables) {
      var sig = 0
      var b = 0
      while (b < bits) {
        var dot = 0.0
        var j = 0
        while (j < dim) { dot += v(j) * planes(off + j); j += 1 }
        if (dot > 0) sig |= (1 << b)
        off += dim
        b += 1
      }
      out(t) = sig
      t += 1
    }
    out
  }

  /** Squared-L2 distances of a float vector to K flattened centroids
    * in one fused pass — the IVF assignment kernel (e5). Arithmetic
    * is float→double cast then (v−c)² accumulated in index order,
    * bit-identical to the HOF formulation it replaces (which
    * evaluated interpreted at K·dim lambda ops per row and measured
    * ~30s for the judged e5 at sf0.1 vs sub-second here). Degenerate
    * inputs (wrong length / null element) map every distance to
    * Double.MaxValue so such rows land in no meaningful cell instead
    * of throwing mid-scan.
    */
  def centroidDists(
      arr: ArrayData, cents: Array[Double], k: Int, dim: Int): Array[Double] = {
    val out = new Array[Double](k)
    if (arr.numElements() != dim) {
      java.util.Arrays.fill(out, Double.MaxValue); return out
    }
    var i = 0
    while (i < dim) {
      if (arr.isNullAt(i)) {
        java.util.Arrays.fill(out, Double.MaxValue); return out
      }
      i += 1
    }
    val v = new Array[Double](dim)
    i = 0
    while (i < dim) { v(i) = arr.getFloat(i).toDouble; i += 1 }
    var c = 0
    var off = 0
    while (c < k) {
      var acc = 0.0
      var j = 0
      while (j < dim) { val d = v(j) - cents(off + j); acc += d * d; j += 1 }
      out(c) = acc
      off += dim
      c += 1
    }
    out
  }

  /** SimHash over pre-hashed tokens (uses the hash bits directly). */
  def simhash63Longs(arr: ArrayData): Long = {
    val counts = new Array[Int](63)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < 63) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 62
    while (j >= 0) {
      out = out * 2 + (if (counts(j) > 0) 1L else 0L)
      j -= 1
    }
    out
  }

}

/** Sorted distinct hashed word n-grams of a text column →
  * array<long>. The tokenize+shingle+hash+distinct kernel fused into
  * one pass (see SignatureKernels.ngramHashes).
  */
case class NgramHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"ngram_hashes needs string, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_hashes"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      SignatureKernels.ngramHashes(input.asInstanceOf[UTF8String], n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernels = SignatureKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $kernels.ngramHashes($c, $n));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): NgramHashes =
    copy(child = newChild)
}

/** MinHash signature over an array<long> of hashed shingles →
  * array<long> of k permutation minima. NULL on null input; empty
  * input yields Long.MaxValue minima (callers filter empty sets).
  */
case class MinHashSig(child: Expression, a: Seq[Long], b: Seq[Long], p: Long)
    extends UnaryExpression {

  require(a.length == b.length && a.nonEmpty)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash_sig needs array<long>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  private lazy val aArr = a.toArray
  private lazy val bArr = b.toArray

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      SignatureKernels.minhashLongs(input.asInstanceOf[ArrayData], aArr, bArr, p))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("aArr", aArr, "long[]")
    val bRef = ctx.addReferenceObj("bArr", bArr, "long[]")
    val kernels = SignatureKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $kernels.minhashLongs($c, $aRef, $bRef, ${p}L));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Random-hyperplane LSH signatures of an array<float> vector →
  * array<int> of `tables` packed sign-bit signatures (see
  * SignatureKernels.hyperplaneSigs). One corpus pass computes every
  * table's signature; callers posexplode the array into
  * (table, signature) blocking keys.
  */
case class HyperplaneSigs(
    child: Expression, planes: Seq[Double], tables: Int, bits: Int, dim: Int)
    extends UnaryExpression {

  require(planes.length == tables * bits * dim)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"hyperplane_sigs needs array<float>, got $t")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "hyperplane_sigs"

  private lazy val planesArr = planes.toArray

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(SignatureKernels.hyperplaneSigs(
      input.asInstanceOf[ArrayData], planesArr, tables, bits, dim))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("planes", planesArr, "double[]")
    val kernels = SignatureKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $kernels.hyperplaneSigs($c, $pRef, $tables, $bits, $dim));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSigs =
    copy(child = newChild)
}

/** Squared-L2 distances of an array<float> vector to K flattened
  * centroids → array<double> (index = cell id). One pass computes
  * every cell's distance; callers take argmin (assignment) or the
  * nprobe smallest (query probing). See SignatureKernels.centroidDists.
  */
case class CentroidDists(
    child: Expression, centroids: Seq[Double], k: Int, dim: Int)
    extends UnaryExpression {

  require(centroids.length == k * dim)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"centroid_dists needs array<float>, got $t")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "centroid_dists"

  private lazy val centArr = centroids.toArray

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(SignatureKernels.centroidDists(
      input.asInstanceOf[ArrayData], centArr, k, dim))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", centArr, "double[]")
    val kernels = SignatureKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $kernels.centroidDists($c, $cRef, $k, $dim));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidDists =
    copy(child = newChild)
}

/** 63-bit SimHash over an array<long> of hashed tokens → long. */
case class SimHash63(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash63 needs array<long>, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash63"

  override def nullSafeEval(input: Any): Any =
    SignatureKernels.simhash63Longs(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernels = SignatureKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $kernels.simhash63Longs($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash63 =
    copy(child = newChild)
}
