package graft.sources

import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{
  SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{
  Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan,
  ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{
  EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A CUSTOM DataSource V2 connector — the source-side twin of the
  * custom physical operator: where plans/RangeJoin.scala extends the
  * EXECUTION tier, this extends the INGESTION tier with the two
  * interfaces that matter at 100 TB, `SupportsPushDownFilters` and
  * `SupportsPushDownRequiredColumns`. The built-in parquet/ORC legs
  * (q3/q40/q44/q67) PROVE pushdown happens; this connector shows the
  * engine can IMPLEMENT it for a system Spark has no reader for —
  * the external-store integration every real deployment eventually
  * writes, where pushing the predicate into the source means skipped
  * rows are never generated, transferred, or deserialized at all.
  *
  * The table is a deterministic synthetic series (a metered-sensor
  * shape): for seq_id in [0, n):
  *   sensor_id     = seq_id mod 64
  *   reading_centi = (seq_id · 9973) mod 100000
  * Pure 64-bit arithmetic, so DuckDB rebuilds the table bit-for-bit
  * from range() and the judged query is hash-checkable — the same
  * fixture discipline as q70's intervals.
  *
  * Pushdown contract: range predicates on seq_id (=, <, <=, >, >=)
  * tighten the generated [lo, hi) interval and are reported HANDLED
  * (rows outside never exist, exactly like a key-range scan against
  * an indexed store); everything else is returned as a residual for
  * Spark to evaluate. Column pruning narrows the emitted row to the
  * required fields. The scan splits the interval into fixed-count
  * slices so a 1000-executor cluster reads it in parallel.
  */
class SeriesSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SeriesSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val o = new CaseInsensitiveStringMap(properties)
    new SeriesTable(o.getLong("n", 1000000L),
      o.getLong("batchRows", 100000L))
  }
}

object SeriesSource {
  val Schema: StructType = StructType(Seq(
    StructField("seq_id", LongType, nullable = false),
    StructField("sensor_id", LongType, nullable = false),
    StructField("reading_centi", LongType, nullable = false)))

  val NumSlices = 8

  /** The row function — one place, shared by every reader slice. */
  def valueOf(field: String, seq: Long): Long = field match {
    case "seq_id" => seq
    case "sensor_id" => seq % 64
    case "reading_centi" => seq * 9973 % 100000
    case other => throw new IllegalArgumentException(s"no such field: $other")
  }
}

final class SeriesTable(n: Long, batchRows: Long = 100000L)
    extends Table with SupportsRead {
  override def name(): String = s"graft_series(n=$n)"
  override def schema(): StructType = SeriesSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SeriesScanBuilder(n, batchRows)
}

/** Accumulates pushdown state: seq_id range predicates tighten
  * [lo, hi); column pruning replaces the read schema.
  */
final class SeriesScanBuilder(n: Long, batchRows: Long = 100000L)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var lo = 0L
  private var hi = n
  private var handled = Array.empty[Filter]
  private var required = SeriesSource.Schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // v + 1 at Long.MaxValue would wrap to Long.MinValue and still be
    // reported as handled — Spark would never re-check, silently
    // emptying/inverting the range. Leave such literals residual.
    val (accepted, residual) = filters.partition {
      case EqualTo("seq_id", v: Long) if v < Long.MaxValue =>
        lo = math.max(lo, v); hi = math.min(hi, v + 1); true
      case GreaterThan("seq_id", v: Long) if v < Long.MaxValue =>
        lo = math.max(lo, v + 1); true
      case GreaterThanOrEqual("seq_id", v: Long) =>
        lo = math.max(lo, v); true
      case LessThan("seq_id", v: Long) =>
        hi = math.min(hi, v); true
      case LessThanOrEqual("seq_id", v: Long) if v < Long.MaxValue =>
        hi = math.min(hi, v + 1); true
      case _ => false
    }
    handled = accepted
    residual
  }
  override def pushedFilters(): Array[Filter] = handled

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    SeriesScan(lo, math.max(lo, hi), required, batchRows)
}

final case class SeriesScan(lo: Long, hi: Long, required: StructType,
    batchRows: Long = 100000L)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  // the plan-gate surface: the TIGHTENED range and the PRUNED columns
  // are visible in explain output, so a spec can assert the pushdown
  // actually narrowed generation, not just got reported
  override def description(): String =
    s"GraftSeries range=[$lo, $hi) cols=[${required.fieldNames.mkString(",")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val span = hi - lo
    if (span <= 0) Array.empty
    else {
      val slices = math.min(SeriesSource.NumSlices.toLong, span).toInt
      (0 until slices).map { i =>
        SeriesSlice(lo + span * i / slices, lo + span * (i + 1) / slices)
          : InputPartition
      }.toArray
    }
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SeriesReaderFactory(required.fieldNames)

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new SeriesMicroBatchStream(lo, hi, batchRows, required)
}

final case class SeriesSlice(from: Long, until: Long) extends InputPartition

/** Offset = position in the deterministic sequence — exactly a
  * single-partition Kafka offset. JSON form is the bare number, so
  * the checkpoint offset log is human-auditable.
  */
final case class SeriesOffset(pos: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = pos.toString
}

/** The STREAMING leg of the custom connector — a Kafka-shaped
  * offset-tracked source, the ingestion shape the file-source
  * streaming gates can't exercise. Admission control paces each
  * micro-batch to `batchRows` rows from the engine-supplied start
  * offset, so a restarted query resumes from the CHECKPOINT's offset
  * (handed to `latestOffset(start, _)` / `planInputPartitions`),
  * never from this object's state — the stream instance is fresh per
  * query start and holds no position of its own, which is what makes
  * crash-resume exact. More rows appearing under the same source
  * (a larger `n` on restart) is Kafka's topic-kept-growing case: the
  * offset log, not the source definition, decides where to resume.
  * Each batch's [start, end) range fans out over the same sliced
  * readers as the batch scan.
  */
final class SeriesMicroBatchStream(lo: Long, n: Long, batchRows: Long,
    required: StructType)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset => SOffset, ReadLimit}

  // Trigger.AvailableNow: without this marker interface the engine
  // falls back to Trigger.Once semantics — ONE batch with the read
  // limit ignored, exactly the unpaced over-read rowsFor() exists to
  // prevent. The prepare step is where a growing source would pin
  // its end snapshot; this sequence is immutable with end = n, which
  // latestOffset already clamps to, so pinning is a no-op and the
  // engine's batch loop (paced by the composed read limit) stops
  // when the offset reaches reportLatestOffset() = n.
  override def prepareForTriggerAvailableNow(): Unit = ()

  override def initialOffset(): SOffset = SeriesOffset(lo)
  override def deserializeOffset(json: String): SOffset =
    SeriesOffset(json.toLong)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(batchRows)

  // non-admission-control entry point; the engine prefers the
  // paced variant below when SupportsAdmissionControl is present
  override def latestOffset(): SOffset =
    throw new UnsupportedOperationException(
      "paced source: latestOffset(start, limit) is the entry point")

  // honor the ENGINE-supplied limit, not the construction-time
  // batchRows: Spark composes limits (Trigger.AvailableNow wraps the
  // default in a CompositeReadLimit), and a source that ignores the
  // argument silently over- or under-reads the moment that happens.
  // ReadAllAvailable means exactly that — advance to everything.
  private def rowsFor(limit: ReadLimit): Long = {
    import org.apache.spark.sql.connector.read.streaming.{
      CompositeReadLimit, ReadAllAvailable, ReadMaxRows}
    limit match {
      case r: ReadMaxRows => r.maxRows()
      case c: CompositeReadLimit =>
        val caps = c.getReadLimits.collect { case r: ReadMaxRows => r.maxRows() }
        if (caps.isEmpty) Long.MaxValue else caps.min
      case _: ReadAllAvailable => Long.MaxValue
      case _ => batchRows
    }
  }

  override def latestOffset(start: SOffset, limit: ReadLimit): SOffset = {
    val s = start.asInstanceOf[SeriesOffset].pos
    val step = rowsFor(limit)
    // saturating add: Long.MaxValue step must clamp to n, not wrap
    SeriesOffset(if (step >= n - s) n else s + step)
  }
  override def reportLatestOffset(): SOffset = SeriesOffset(n)

  override def planInputPartitions(start: SOffset, end: SOffset): Array[InputPartition] = {
    val s = start.asInstanceOf[SeriesOffset].pos
    val e = end.asInstanceOf[SeriesOffset].pos
    val span = e - s
    if (span <= 0) Array.empty
    else {
      val slices = math.min(SeriesSource.NumSlices.toLong, span).toInt
      (0 until slices).map { i =>
        SeriesSlice(s + span * i / slices, s + span * (i + 1) / slices)
          : InputPartition
      }.toArray
    }
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SeriesReaderFactory(required.fieldNames)

  override def commit(end: SOffset): Unit = ()
  override def stop(): Unit = ()
}

/** Judged query over the custom connector: a seq_id range predicate
  * (pushed — rows outside the range are never generated) plus a
  * sensor-level residual filter (NOT pushable, evaluated by Spark),
  * aggregated per sensor. SeriesSourceSpec asserts the scan
  * description shows the TIGHTENED range and PRUNED columns, and
  * that the residual filter survives as a Spark-side Filter node.
  * The DuckDB oracle rebuilds the whole table from range()
  * arithmetic — certifying both the generator and the pushdown's
  * slice of it.
  */
object SeriesQueries {
  import org.apache.spark.sql.{DataFrame, SparkSession}
  import org.apache.spark.sql.functions._
  import graft.Catalog.Q

  def q78CustomSource(s: SparkSession, d: String): DataFrame =
    s.read.format("graft.sources.SeriesSource").option("n", "1000000").load()
      .where(col("seq_id") >= 250000 && col("seq_id") < 750000 &&
        col("sensor_id") % 8 === 0)
      .groupBy(col("sensor_id"))
      .agg(count(lit(1)).as("n_readings"),
        sum(col("reading_centi")).as("sum_centi"))
      .orderBy(col("sensor_id"))

  /** Judged gate for the custom MICRO-BATCH source: stream the
    * deterministic series through the parquet sink in ~30k-row
    * paced batches, KILL the query after the first 90k rows are
    * committed, then restart against a grown sequence (n=200k —
    * Kafka's topic-kept-growing case). The restarted query must
    * resume from the CHECKPOINT offset: re-emitting any range
    * duplicates rows, skipping any range loses them, and either
    * flips the hash-checked per-sensor counts/sums against the
    * oracle's closed-form reconstruction of exactly [0, 200000).
    */
  def q104StreamCustomSource(s: SparkSession, d: String): DataFrame = {
    val outRoot = Housekeeping.tempDir("q104_out")
    val (sink, chk) = (s"$outRoot/data", s"$outRoot/chk")
    val ss = s.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "2")
    def start(nAvail: Long) = ss.readStream
      .format("graft.sources.SeriesSource")
      .option("n", nAvail.toString).option("batchRows", "30000").load()
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", chk)
      .start()
    val q1 = start(90000L)
    try q1.processAllAvailable() finally q1.stop() // offsets [0, 90k) committed
    val q2 = start(200000L) // resume mid-sequence from the offset log
    try q2.processAllAvailable() finally q2.stop()
    s.read.parquet(sink)
      .groupBy(col("sensor_id"))
      .agg(count(lit(1)).as("n_readings"),
        sum(col("reading_centi")).as("sum_centi"))
      .orderBy(col("sensor_id"))
  }

  /** Judged Trigger.AvailableNow backfill: drain the finite series
    * source to a parquet sink in ONE self-terminating invocation —
    * the "catch up, then stop" run a scheduled ingestion job wants,
    * vs q104's run-forever-and-kill harness. The gated property is
    * admission control under the AvailableNow wrapper: the engine
    * composes its end-snapshot bound with the source's default
    * maxRows limit, so 120k rows must land as exactly 5 paced
    * micro-batches (⌈120000/25000⌉) — the batch count rides the
    * output row and hash-fails if the source ever stops honoring
    * the engine-supplied ReadLimit (the Trigger.Once fallback would
    * land everything in 1). The aggregate certifies the drained
    * content against the oracle's closed-form rebuild.
    */
  def q113StreamAvailableNow(s: SparkSession, d: String): DataFrame = {
    val outRoot = Housekeeping.tempDir("q113_out")
    val (sink, chk) = (s"$outRoot/data", s"$outRoot/chk")
    val ss = s.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "2")
    val q = ss.readStream.format("graft.sources.SeriesSource")
      .option("n", "120000").option("batchRows", "25000").load()
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", chk)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    require(q.awaitTermination(180000),
      "AvailableNow backfill did not self-terminate")
    val batches = q.recentProgress.count(_.numInputRows > 0)
    s.read.parquet(sink)
      .agg(count(lit(1)).as("n_readings"),
        sum(col("reading_centi")).as("sum_centi"))
      .select(lit(batches).cast("long").as("n_batches"),
        col("n_readings"), col("sum_centi"))
  }

  val queries: Seq[Q] = Seq(
    Q("q113_stream_available_now", q113StreamAvailableNow, Some("""
      SELECT CAST(5 AS BIGINT) AS n_batches,
             count(*) AS n_readings,
             CAST(sum(seq_id * 9973 % 100000) AS BIGINT) AS sum_centi
      FROM range(0, 120000) t(seq_id)""")),
    Q("q78_custom_source", q78CustomSource, Some("""
      SELECT seq_id % 64 AS sensor_id,
             count(*) AS n_readings,
             CAST(sum(seq_id * 9973 % 100000) AS BIGINT) AS sum_centi
      FROM range(250000, 750000) t(seq_id)
      WHERE (seq_id % 64) % 8 = 0
      GROUP BY 1
      ORDER BY 1""")),
    Q("q104_stream_custom_source", q104StreamCustomSource, Some("""
      SELECT seq_id % 64 AS sensor_id,
             count(*) AS n_readings,
             CAST(sum(seq_id * 9973 % 100000) AS BIGINT) AS sum_centi
      FROM range(0, 200000) t(seq_id)
      GROUP BY 1
      ORDER BY 1""")))
}

final class SeriesReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val slice = partition.asInstanceOf[SeriesSlice]
    new PartitionReader[InternalRow] {
      private var seq = slice.from - 1
      private val row = new GenericInternalRow(fields.length)
      override def next(): Boolean = { seq += 1; seq < slice.until }
      override def get(): InternalRow = {
        var i = 0
        while (i < fields.length) {
          row.update(i, SeriesSource.valueOf(fields(i), seq))
          i += 1
        }
        row
      }
      override def close(): Unit = ()
    }
  }
}
