package graft.sources

import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}
import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector

/** Executor-side deletion-vector application for the lake connector's
  * vectorized read path.
  *
  * The parquet reader returns each split's rows in physical order, so
  * a running ordinal plus the split's `firstRow` IS the row's file
  * position — no row-index metadata column to decode. Survivors copy
  * into fresh on-heap vectors per batch; only splits that carry a
  * vector pay the copy (clean files stay on the zero-copy columnar
  * path, and by the delete verb's CoW threshold a vectored file's
  * deleted fraction is small, so the copy is ~one batch memcpy).
  * Nested column types fall back to the row-based read path — the
  * factory declines columnar for those splits and Spark plans the
  * whole scan row-based (`ColumnarSupportMode.PARTITION_DEFINED`
  * allows no mixing).
  */
private[sources] object DvFilter {

  /** Can [[filterBatch]] copy this type? (Atomic types only — nested
    * vectors need child-offset surgery the row path avoids.)
    */
  def copyable(dt: DataType): Boolean = dt match {
    case BooleanType | ByteType | ShortType | IntegerType | DateType |
        LongType | TimestampType | TimestampNTZType | FloatType |
        DoubleType | StringType | BinaryType => true
    case _: DecimalType => true
    case _ => false
  }

  /** Stateful per-split ordinal walker: feeds batch sizes in read
    * order, returns each batch's surviving ordinals. `include = true`
    * inverts the selection — keep ONLY the listed positions (the
    * change feed's "replay just the newly-vectored rows" mode).
    *
    * Decodes the delta-varint bytes INCREMENTALLY — one position of
    * state, never a materialized `Array[Long]` — so a 100k-position
    * externalized vector costs the task its compressed byte size
    * (KBs), not 800 KB of longs. Positions strictly BEFORE the
    * split's first row are skipped during construction (the
    * streaming analogue of the old lower-bound binary search; the
    * scan is O(count), the same order as decoding ever was).
    */
  final class Walker(bytes: Array[Byte], firstRow: Long,
      include: Boolean = false) {
    private var pos = firstRow
    private var bi = 0
    private var nextDel = -1L // next deleted position; MaxValue = done
    private def advance(): Unit = {
      if (bi >= bytes.length) { nextDel = Long.MaxValue; return }
      var gap = 0L
      var shift = 0
      var more = true
      while (more) {
        val b = bytes(bi); bi += 1
        gap |= (b & 0x7FL) << shift
        shift += 7
        more = (b & 0x80) != 0
      }
      nextDel += gap
    }
    // position the stream at the first deleted position ≥ firstRow
    advance()
    while (nextDel < firstRow) advance()

    def nextSelection(n: Int): Array[Int] = {
      val sel = new scala.collection.mutable.ArrayBuilder.ofInt
      sel.sizeHint(n)
      var i = 0
      while (i < n) {
        if (nextDel == pos + i) {
          advance()
          if (include) sel += i
        } else if (!include) sel += i
        i += 1
      }
      pos += n
      sel.result()
    }
  }

  /** Copy the selected ordinals of `b` into fresh on-heap vectors
    * under `schema` (the batch's output types, in column order).
    */
  def filterBatch(b: ColumnarBatch, schema: StructType,
      sel: Array[Int]): ColumnarBatch = {
    val n = sel.length
    val out = new Array[ColumnVector](b.numCols())
    var c = 0
    while (c < b.numCols()) {
      val src = b.column(c)
      val dt = schema(c).dataType
      val v = new OnHeapColumnVector(math.max(n, 1), dt)
      var i = 0
      while (i < n) {
        val r = sel(i)
        if (src.isNullAt(r)) v.putNull(i)
        else dt match {
          case BooleanType => v.putBoolean(i, src.getBoolean(r))
          case ByteType => v.putByte(i, src.getByte(r))
          case ShortType => v.putShort(i, src.getShort(r))
          case IntegerType | DateType => v.putInt(i, src.getInt(r))
          case LongType | TimestampType | TimestampNTZType =>
            v.putLong(i, src.getLong(r))
          case FloatType => v.putFloat(i, src.getFloat(r))
          case DoubleType => v.putDouble(i, src.getDouble(r))
          case StringType =>
            val bytes = src.getUTF8String(r).getBytes
            v.putByteArray(i, bytes, 0, bytes.length): Unit
          case BinaryType =>
            val bytes = src.getBinary(r)
            v.putByteArray(i, bytes, 0, bytes.length): Unit
          case d: DecimalType =>
            v.putDecimal(i, src.getDecimal(r, d.precision, d.scale),
              d.precision)
          case other => throw new UnsupportedOperationException(
            s"deletion-vector columnar filter cannot copy $other " +
              "(the factory should have declined columnar)")
        }
        i += 1
      }
      out(c) = v
      c += 1
    }
    new ColumnarBatch(out, n)
  }
}
