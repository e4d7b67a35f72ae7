package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.UUID

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  BoundReference, UnsafeProjection}
import org.apache.spark.sql.types._

/** The Scala API verbs' write job, WITH task-side statistics — the
  * round-16 extension of the r15 DSv2 task-side stats work
  * (optimization guide §1.2 "don't compute things you throw away" /
  * §6 write-path I/O): `merge` / `delete` / `deleteRows` /
  * `updateRows` / `purgeVectors` / `compactLake` / `clusterLake` /
  * `commit` / `commitClustered` / `commitPartitioned` used to write
  * through `df.write.parquet` and then re-read EVERY written byte as
  * a second Spark job ([[SnapshotLake.statsFor]]) to build their
  * manifest entries. This job writes the same files and accumulates
  * the identical per-file stats WHILE WRITING ([[SegStatsAcc]], the
  * certified replica of the read-back aggregate), so the publish
  * needs no second data pass — at 100 TB that halves every
  * compaction/merge/re-cluster's I/O.
  *
  * Equivalence with the replaced `df.write.parquet(...)` +
  * `statsFor(batch)` pair, piece by piece:
  *
  *  - FILE SET: one output file per non-empty task, or — under
  *    `bucketCol` routing (the `partitionBy("__bucket")` replacement)
  *    — one per (task, bucket value); `repartition(col(bucket))`
  *    puts each bucket wholly in one task, so the per-bucket file
  *    counts judged fixtures pin are unchanged. Empty tasks produce
  *    nothing (FileFormatWriter's empty-partition skip).
  *  - NAMES: `part-<partition%05d>-<uuid8>.parquet` under
  *    `<bucket>=<value>/` dirs — same `part-` prefix + zero-padded
  *    partition index, so the SORTED-NAME order that drives implicit
  *    row-id base assignment ([[SnapshotLake.commitFiles]]) is the
  *    partition order, exactly as before; bucket dirs render values
  *    with Spark's partition-path escaping contract so the callers'
  *    `__bucket=…` regexes and URL-decode read the same names.
  *  - ROW ORDER within a file: the task iterator's order per bucket.
  *    The replaced path sorted each task by the bucket column alone
  *    (FileFormatWriter's required ordering) with a STABLE sort, so
  *    within-bucket order was the same iterator order — physical
  *    positions (deletion vectors, implicit row ids) are preserved.
  *    Certified by the oracle gate (234 queries, two SFs) and
  *    TaskSideStatsSpec.
  *  - STATS: [[SegStatsAcc]] per open segment, the value-identical
  *    accumulator TaskSideStatsSpec pins against a statsFor read-back
  *    (null/overflow conventions, real catalyst XxHash64, KMV
  *    k-smallest-distinct). Any unsupported column shape falls back
  *    to the read-back pass over the already-written batch — same
  *    values either way.
  *  - COMMIT SAFETY: tasks stage under `_staging/` and the driver
  *    moves EXACTLY the acknowledged set into the batch dir (the DSv2
  *    two-phase protocol) — a retried/zombie task's orphan is named
  *    by no result row and can never surface.
  */
object LakeApiWrite {

  /** One staged segment acknowledged by a write task: staging name,
    * producing partition, optional bucket value (pre-escaping), row
    * count, on-disk bytes (stat(2)'d task-side), and the task-side
    * stats (None when a column shape disabled the accumulator).
    */
  private final case class Seg(staged: String, pid: Int,
      dir: Option[String], rows: Long, bytes: Long,
      stats: Option[SegStats])

  /** Partition-directory escaping, Spark/Hive's `escapePathName`
    * contract: ASCII control chars, DEL, and the reserved set below
    * become `%XX`; everything else (including space) passes through.
    * Matches what `partitionBy` wrote for these dirs, so manifest
    * names — and the callers' `URLDecoder` reads of them — are
    * byte-identical for every value the old writer handled.
    */
  private[sources] def escapeDirValue(v: String): String = {
    val reserved = "\"#%'*/:=?\\{[]^"
    if (v.forall(c => c >= ' ' && c != '\u007f' && reserved.indexOf(c) < 0))
      v // common case: no escaping, no rebuild
    else {
      val sb = new StringBuilder(v.length + 8)
      v.foreach { c =>
        if (c < ' ' || c == '\u007f' || reserved.indexOf(c) >= 0)
          sb.append(f"%%${c.toInt}%02X")
        else sb.append(c)
      }
      sb.toString
    }
  }

  /** A row's routing-bucket value rendered as the canonical partition
    * string — the same rendering `partitionBy` used for these
    * directories (long/int/short/string/boolean; nulls take Hive's
    * default-partition name, as before).
    */
  private def renderBucket(row: InternalRow, idx: Int, dt: DataType,
      colName: String): String =
    if (row.isNullAt(idx)) "__HIVE_DEFAULT_PARTITION__"
    else dt match {
      case LongType => row.getLong(idx).toString
      case IntegerType => row.getInt(idx).toString
      case ShortType => row.getShort(idx).toString
      case StringType => row.getUTF8String(idx).toString
      case BooleanType => row.getBoolean(idx).toString
      case other => throw new IllegalArgumentException(
        s"unsupported routing-bucket type $other for '$colName'")
    }

  /** Write `df` into `$root/$batch` (one job), returning the new
    * files' manifest entries with stats accumulated task-side.
    * `bucketCol` names the routing column (excluded from the file
    * contents, rendered as a `<col>=<value>/` directory level — the
    * `partitionBy` replacement); `writeOptions` carries parquet
    * writer tuning (`parquet.block.size` / `parquet.page.size`).
    * Zero input rows produce zero files and an empty result (no
    * batch dir). Falls back to the read-back stats pass over the
    * written batch when any file's accumulator disabled itself.
    */
  private[sources] def writeBatchWithStats(s: SparkSession, root: String,
      batch: String, df: DataFrame, statCol: String,
      bloomCol: Option[String], bloomBytes: Int,
      statCol2: Option[String], bucketCol: Option[String],
      writeOptions: Map[String, String] = Map.empty)
      : Seq[SnapshotLake.FileStat] = {
    val schema = df.schema
    val bIdx = bucketCol.map { c =>
      val i = schema.fieldNames.indexWhere(_.equalsIgnoreCase(c))
      require(i >= 0, s"routing bucket column '$c' not in write schema "
        + schema.fieldNames.mkString("(", ",", ")"))
      i
    }
    val keep = schema.fields.indices.filterNot(bIdx.contains).toVector
    val writeSchema = StructType(keep.map(schema.fields(_)).toArray)
    val spec = StatsSpec(statCol, bloomCol, bloomBytes, statCol2)
    val confKVs = LakeWrite.writeConf(writeSchema)
    val staging = LakeWrite.stagingDir(root)
    Files.createDirectories(Paths.get(staging))
    val blockSize = writeOptions.get("parquet.block.size").map(_.toLong)
    val pageSize = writeOptions.get("parquet.page.size").map(_.toInt)
    val bDt = bIdx.map(schema.fields(_).dataType)
    val bName = bIdx.map(schema.fieldNames(_))
    val fields = schema.fields

    val segs: Array[Seg] = df.queryExecution.toRdd
      .mapPartitionsWithIndex { (pid, it) =>
        if (!it.hasNext) Iterator.empty
        else {
          val tid = TaskContext.get().taskAttemptId()
          // drop the routing column from the written rows (the dir
          // carries it); identity projection when there is none
          val proj = UnsafeProjection.create(keep.map(i =>
            BoundReference(i, fields(i).dataType, fields(i).nullable)))
          // one OPEN writer per bucket value seen by this task — the
          // input need not be sorted by bucket (the old path's added
          // sort is gone: stable-sort ties ≡ iterator order anyway)
          final class Open(val staged: String,
              val path: java.nio.file.Path, val dir: Option[String]) {
            val w = LakeWrite.openParquet(path, confKVs, blockSize,
              pageSize)
            val acc = new SegStatsAcc(writeSchema, spec)
            var rows = 0L
          }
          val open = scala.collection.mutable.LinkedHashMap
            .empty[Option[String], Open]
          it.foreach { row =>
            val dir = bIdx.map(i => renderBucket(row, i, bDt.get,
              bName.get))
            val o = open.getOrElseUpdate(dir, {
              val nm = s"api-$pid-$tid-${open.size}-" +
                s"${UUID.randomUUID().toString.take(8)}.parquet"
              new Open(nm, Paths.get(staging, nm), dir)
            })
            val out = proj(row)
            o.w.write(out)
            o.acc.update(out)
            o.rows += 1
          }
          val done = open.valuesIterator.map { o =>
            o.w.close()
            Seg(o.staged, pid, o.dir, o.rows, Files.size(o.path),
              o.acc.finish)
          }.toList
          done.iterator
        }
      }.collect()

    if (segs.isEmpty) return Seq.empty
    Files.createDirectories(Paths.get(root, batch))
    val moved: Seq[(Seg, String)] = segs.toSeq.map { g =>
      val fileName = f"part-${g.pid}%05d-" +
        s"${UUID.randomUUID().toString.take(8)}.parquet"
      val rel = g.dir match {
        case Some(v) => s"${bName.get}=${escapeDirValue(v)}/$fileName"
        case None => fileName
      }
      val dest = Paths.get(root, batch, rel)
      Files.createDirectories(dest.getParent)
      Files.move(Paths.get(staging, g.staged), dest,
        StandardCopyOption.ATOMIC_MOVE)
      (g, s"$batch/$rel")
    }
    if (moved.forall(_._1.stats.exists(_.specKey == spec.key)))
      moved.map { case (g, rel) =>
        val st = g.stats.get
        SnapshotLake.FileStat(rel, st.lo, st.hi, g.rows,
          bloom = st.bloom, dim2 = st.dim2, bytes = Some(g.bytes),
          sum = st.su, cstats = st.cstats)
      }.sortBy(_.name)
    else
      SnapshotLake.statsFor(s, root, batch, statCol, bloomCol,
        bloomBytes, statCol2)
  }
}
