package graft.sources

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{
  MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl,
  SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.StructType

/** Offset in the lake's version chain — a committed manifest version
  * IS a streaming offset (Delta's model): monotonic, durable, and
  * replayable, because every version's file list is immutable. JSON
  * form is the bare version number, so the checkpoint offset log is
  * human-auditable against `_log/v*.manifest`.
  */
final case class LakeVersionOffset(version: Int) extends Offset {
  override def json(): String = version.toString
}

/** The STREAMING read face of the lake connector — `readStream
  * .format("graft.sources.GraftLakeSource")` turns the table into a
  * change stream of its own appends, completing the loop the write
  * side opened (q108's exactly-once sink): lake → stream → lake
  * pipelines with no file-listing source in between.
  *
  * Semantics (Delta streaming-source contract, append-only chains):
  *
  *  - each micro-batch covers the manifest versions in `(start,
  *    end]`; its input is EXACTLY the data files that entered the
  *    manifest across those versions — a version diff on KB-scale
  *    driver metadata, never a storage listing. At 100 TB the
  *    per-trigger planning cost is O(new files), not O(table).
  *  - admission control paces ONE VERSION PER MICRO-BATCH (each
  *    commit is replayed as the atomic unit it was written as);
  *    `Trigger.AvailableNow` pins the chain head at start and
  *    drains version by version, self-terminating.
  *  - a version that REMOVED files (overwrite / merge / delete /
  *    compaction) inside a streamed range fails the batch loudly:
  *    appends are the only change this source can replay exactly
  *    (Delta without `ignoreChanges` refuses identically). Ranges
  *    wholly BEFORE the stream's start offset may contain anything —
  *    history is not replayed.
  *  - restart resumes from the CHECKPOINT's version offset: the
  *    engine hands the stored offset back, and the immutable
  *    manifests make re-planning a lost batch deterministic.
  *
  * The scan builder's stat-window/bloom prune is threaded in as
  * `keep`, so each batch's new files WOULD skip like a batch read —
  * but Spark does not currently run V2ScanRelationPushDown for
  * streaming scans (SPARK-30478), so `keep` is all-pass in practice
  * and filters evaluate row-level; the spec documents the
  * limitation and flips the gate the day the engine starts pushing.
  */
final class LakeMicroBatchStream(root: String, required: StructType,
    keep: SnapshotLake.FileStat => Boolean)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  // pinned by prepareForTriggerAvailableNow; None = follow the live head
  private var pinnedHead: Option[Int] = None

  override def prepareForTriggerAvailableNow(): Unit =
    pinnedHead = Some(SnapshotLake.headVersion(root))

  private def head: Int =
    pinnedHead.getOrElse(SnapshotLake.headVersion(root))

  /** Start BEFORE the first version, so a fresh query's first batch
    * replays v0 — "process existing data, then follow appends".
    */
  override def initialOffset(): Offset = LakeVersionOffset(-1)

  override def deserializeOffset(json: String): Offset =
    LakeVersionOffset(json.toInt)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxFiles(1)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "paced source: latestOffset(start, limit) is the entry point")

  // one version per batch by default, never past the (possibly
  // pinned) head — but the ENGINE-supplied limit rules: Trigger.Once
  // arrives as ReadAllAvailable and means exactly that (advance to
  // the head in one batch), and a composite containing it does too.
  // Ignoring the argument would terminate a Trigger.Once query after
  // v0 with the rest of the chain silently unprocessed (the same
  // contract bug rowsFor() fixes in SeriesSource).
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    import org.apache.spark.sql.connector.read.streaming.{
      CompositeReadLimit, ReadAllAvailable, ReadMaxFiles, ReadMaxRows}
    def allAvailable(l: ReadLimit): Boolean = l match {
      case _: ReadAllAvailable => true
      case c: CompositeReadLimit =>
        val ls = c.getReadLimits
        ls.exists(_.isInstanceOf[ReadAllAvailable]) &&
          !ls.exists(x => x.isInstanceOf[ReadMaxFiles] ||
            x.isInstanceOf[ReadMaxRows]) // a cap in the composite paces
      case _ => false
    }
    val s = start.asInstanceOf[LakeVersionOffset].version
    val h = math.max(s, head)
    LakeVersionOffset(if (allAvailable(limit)) h else math.min(s + 1, h))
  }

  override def reportLatestOffset(): Offset = LakeVersionOffset(head)

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[LakeVersionOffset].version
    val e = end.asInstanceOf[LakeVersionOffset].version
    if (e <= s) return Array.empty
    val prev: Set[String] =
      if (s < 0) Set.empty
      else SnapshotLake.snapshot(root, Some(s)).files.map(_.name).toSet
    val snap = SnapshotLake.snapshot(root, Some(e))
    val cur = snap.files.map(_.name).toSet
    val removed = prev.diff(cur)
    if (removed.nonEmpty)
      throw new IllegalStateException(
        s"lake stream at $root: version ${s + 1}..$e removed files " +
          s"${removed.take(3).mkString(", ")}… (overwrite/merge/delete/" +
          "compaction) — this source replays appends only; start a fresh " +
          "stream from the restated table")
    snap.files
      .filter(f => !prev(f.name) && keep(f))
      .map(f => LakeSplit(SnapshotLake.dataPath(root, f.name), 0L,
        f.bytes.getOrElse(java.nio.file.Files.size(java.nio.file.Paths.get(
          SnapshotLake.dataPath(root, f.name))))): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new LakeReaderFactory(required, LakeReaderFactory.sessionConf())

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
