package graft.sources

import java.io.{DataInputStream, DataOutputStream, File, FileInputStream, FileOutputStream}
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.{Map => JMap, UUID}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{
  SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{
  Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan,
  ScanBuilder}
import org.apache.spark.sql.connector.write.{
  BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo,
  PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A custom DSv2 WRITE connector — the sink-side twin of
  * SeriesSource's read pushdown, demonstrating the part of the
  * connector contract q74 certifies from the outside: EXACTLY-ONCE
  * COMMIT. The format is a fixed-width binary ledger (16 bytes per
  * (key, cents) record — the external-store integration shape, not a
  * Spark format).
  *
  * The commit protocol is the two-phase shape every serious sink
  * implements:
  *  1. each task's DataWriter streams to a UNIQUELY-NAMED file under
  *     `_staging/` and returns that name as its commit message —
  *     nothing a running or failed task writes is ever visible;
  *  2. the driver's BatchWrite.commit MOVES exactly the files named
  *     in the acknowledged messages into the table root — a task
  *     retried by Spark leaves an orphan in staging that no message
  *     references, so it can never surface (LedgerSinkSpec plants
  *     one and proves it);
  *  3. BatchWrite.abort deletes the staged files, so a failed job
  *     leaves the table untouched.
  *
  * SINGLE-FILESYSTEM ASSUMPTION: writers stage via `java.io` on the
  * executor's filesystem and the driver's commit moves those paths,
  * so driver and executors must share one filesystem (true in
  * local[n]; true on a cluster only for NFS-like mounts). A
  * production port of this sink would route every path through
  * Hadoop `FileSystem` (or commit to an external store's API) so any
  * shared store works — the two-phase protocol itself is unchanged.
  * The read path lists only the table root, never staging — the
  * committed file SET is the table, the same log-not-listing
  * principle as the parquet sink's `_spark_metadata`.
  */
class LedgerSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    LedgerSink.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new LedgerTable(new CaseInsensitiveStringMap(properties).get("path"))
}

object LedgerSink {
  val Schema: StructType = StructType(Seq(
    StructField("key", LongType, nullable = false),
    StructField("cents", LongType, nullable = false)))
  val RecordBytes = 16

  def stagingDir(root: String) = s"$root/_staging"
  def committedFiles(root: String): Array[File] = {
    val f = new File(root)
    if (!f.exists()) Array.empty
    else f.listFiles().filter(_.getName.endsWith(".ledger"))
  }
}

final class LedgerTable(root: String) extends Table
    with SupportsRead with SupportsWrite {
  require(root != null, "ledger sink requires a 'path' option")
  override def name(): String = s"graft_ledger($root)"
  override def schema(): StructType = LedgerSink.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder { override def build(): Scan = new LedgerScan(root) }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val in = info.schema()
    require(in.fields.map(f => (f.name, f.dataType)).toSeq ==
      LedgerSink.Schema.fields.map(f => (f.name, f.dataType)).toSeq,
      s"ledger sink requires (key BIGINT, cents BIGINT); got ${in.simpleString}")
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new LedgerBatchWrite(root)
      }
    }
  }
}

/** One staged file name per acknowledged task. */
final case class LedgerStaged(name: String) extends WriterCommitMessage

final class LedgerBatchWrite(root: String) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    Files.createDirectories(Paths.get(LedgerSink.stagingDir(root)))
    new LedgerWriterFactory(root)
  }
  // phase 2: publish EXACTLY the acknowledged staged files — an
  // orphan from a retried/failed task is named by no message and
  // stays invisible forever
  override def commit(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach { case LedgerStaged(name) =>
      Files.move(
        Paths.get(LedgerSink.stagingDir(root), name),
        Paths.get(root, name),
        StandardCopyOption.ATOMIC_MOVE)
    }
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach { case LedgerStaged(name) =>
      Files.deleteIfExists(Paths.get(LedgerSink.stagingDir(root), name))
    }
}

final class LedgerWriterFactory(root: String) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new LedgerWriter(root, partitionId, taskId)
}

final class LedgerWriter(root: String, partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {
  private val name =
    s"part-$partitionId-$taskId-${UUID.randomUUID().toString.take(8)}.ledger"
  private val staged = new File(LedgerSink.stagingDir(root), name)
  private val out = new DataOutputStream(new FileOutputStream(staged))
  override def write(row: InternalRow): Unit = {
    out.writeLong(row.getLong(0))
    out.writeLong(row.getLong(1))
  }
  override def commit(): WriterCommitMessage = { out.close(); LedgerStaged(name) }
  override def abort(): Unit = { out.close(); staged.delete(): Unit }
  override def close(): Unit = out.close()
}

// ---- read path -------------------------------------------------------

final class LedgerScan(root: String) extends Scan with Batch {
  override def readSchema(): StructType = LedgerSink.Schema
  override def toBatch: Batch = this
  override def description(): String = s"GraftLedger($root)"
  override def planInputPartitions(): Array[InputPartition] =
    LedgerSink.committedFiles(root)
      .map(f => LedgerFile(f.getAbsolutePath): InputPartition)
  override def createReaderFactory(): PartitionReaderFactory =
    new LedgerReaderFactory
}

final case class LedgerFile(path: String) extends InputPartition

final class LedgerReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = new File(partition.asInstanceOf[LedgerFile].path)
    val nRecords = file.length() / LedgerSink.RecordBytes
    val in = new DataInputStream(new FileInputStream(file))
    new PartitionReader[InternalRow] {
      private var i = -1L
      private val row = new GenericInternalRow(2)
      override def next(): Boolean = { i += 1; i < nRecords }
      override def get(): InternalRow = {
        row.update(0, in.readLong())
        row.update(1, in.readLong())
        row
      }
      override def close(): Unit = in.close()
    }
  }
}

/** Judged query: aggregate orders to per-customer exact cents, write
  * through the ledger's two-phase commit, read back through its scan,
  * and present — the oracle computes the same aggregate from the
  * original table, so the roundtrip certifies writer encoding, commit
  * publication, and reader decoding as an exact identity.
  */
object LedgerQueries {
  import org.apache.spark.sql.{DataFrame, SparkSession}
  import org.apache.spark.sql.functions._
  import graft.Catalog.Q

  def q79CustomSink(s: SparkSession, d: String): DataFrame = {
    val dir = Housekeeping.tempDir("q79_ledger")
    Tables.orders(s, d)
      .groupBy(col("o_custkey").as("key"))
      .agg(graft.functions.Money.sumCents(col("o_totalprice")).as("cents"))
      .write.format("graft.sources.LedgerSink")
      .option("path", dir).mode("append").save()
    s.read.format("graft.sources.LedgerSink").option("path", dir).load()
      .select(col("key").as("o_custkey"),
        (col("cents").cast("double") / 100.0).as("total_spend"))
      .orderBy(col("o_custkey"))
  }

  val queries: Seq[Q] = Seq(
    Q("q79_custom_sink", q79CustomSink, Some("""
      SELECT o_custkey,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS total_spend
      FROM orders
      GROUP BY o_custkey
      ORDER BY o_custkey""")))
}
