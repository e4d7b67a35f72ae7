package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.sources.SnapshotLake

/** Streaming reads FROM the lake connector: version-paced batches,
  * checkpoint resume across restarts, pushed-filter pruning of each
  * batch's file set, and the loud refusal on non-append history.
  */
class LakeStreamSourceSpec extends SparkTestBase {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("lake_stream_").toString

  private def tbl(ids: Range) =
    ids.map(i => (i.toLong, i.toLong * 7)).toDF("k", "v")

  test("AvailableNow drains one batch per version; restart resumes from the offset log") {
    val root = freshRoot()
    val out = Files.createTempDirectory("lake_stream_out_").toString
    val (sink, chk) = (s"$out/data", s"$out/chk")
    SnapshotLake.commit(spark, root, tbl(0 until 100), "k")
    SnapshotLake.commit(spark, root, tbl(100 until 250), "k")
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "4")
    def drain(): Int = {
      val q = ss.readStream.format("graft.sources.GraftLakeSource")
        .option("path", root).load()
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", chk)
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "did not self-terminate")
      q.recentProgress.count(_.numInputRows > 0)
    }
    assert(drain() === 2) // one batch per committed version
    val ks = spark.read.parquet(sink).select("k").as[Long].collect().sorted
    assert(ks.toSeq === (0L until 250L))
    // two more appends land; the restarted stream emits ONLY them
    SnapshotLake.commit(spark, root, tbl(250 until 300), "k")
    SnapshotLake.commit(spark, root, tbl(300 until 320), "k")
    assert(drain() === 2)
    val ks2 = spark.read.parquet(sink).select("k").as[Long].collect().sorted
    assert(ks2.toSeq === (0L until 320L), "restart re-emitted or skipped rows")
  }

  test("Trigger.Once honors ReadAllAvailable: the whole chain lands in one batch") {
    val root = freshRoot()
    SnapshotLake.commit(spark, root, tbl(0 until 100), "k")
    SnapshotLake.commit(spark, root, tbl(100 until 250), "k")
    SnapshotLake.commit(spark, root, tbl(250 until 300), "k")
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "4")
    @annotation.nowarn("cat=deprecation") // Trigger.Once IS the case under test
    val q = ss.readStream.format("graft.sources.GraftLakeSource")
      .option("path", root).load()
      .writeStream.format("memory").queryName("lake_once")
      .trigger(Trigger.Once()).start()
    assert(q.awaitTermination(120000))
    import ss.implicits._
    val ks = ss.table("lake_once").select("k").as[Long].collect().sorted
    assert(ks.toSeq === (0L until 300L),
      "Trigger.Once left committed versions unprocessed")
    assert(q.recentProgress.count(_.numInputRows > 0) === 1)
  }

  test("a filtered stream stays row-exact (file prune awaits engine-side streaming pushdown)") {
    val root = freshRoot()
    // two clustered commits, each two files with tight disjoint ranges
    def commitPair(ids: Range): Unit =
      SnapshotLake.commitClustered(spark, root, tbl(ids),
        when(col("k") < ids.start + ids.size / 2, lit(0)).otherwise(lit(1)),
        "k")
    commitPair(0 until 100)
    commitPair(100 until 200)
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "4")
    val q = ss.readStream.format("graft.sources.GraftLakeSource")
      .option("path", root).load()
      .where(col("k") >= 50 && col("k") < 150) // half of each commit
      .writeStream.format("memory").queryName("lake_pruned")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000))
    // rows are exact: Spark evaluates the filter on every streamed row
    val ks = ss.table("lake_pruned").select("k").as[Long].collect().sorted
    assert(ks.toSeq === (50L until 150L))
    // Spark does NOT run V2ScanRelationPushDown for streaming scans
    // (SPARK-30478), so both files of each version are read and the
    // filter applies row-level — this assertion DOCUMENTS that
    // limitation; if a Spark upgrade starts pushing, it flips to
    // Seq(50, 50) and the stream's `keep` predicate takes over
    val sizes = q.recentProgress.map(_.numInputRows).filter(_ > 0).toSeq
    assert(sizes === Seq(100L, 100L),
      s"engine began pushing streaming filters — tighten this gate: $sizes")
  }

  test("a non-append version inside the streamed range fails loudly") {
    val root = freshRoot()
    val out = Files.createTempDirectory("lake_stream_del_").toString
    SnapshotLake.commit(spark, root, tbl(0 until 100), "k")
    SnapshotLake.commit(spark, root, tbl(100 until 200), "k")
    SnapshotLake.delete(spark, root, 0L, 50L) // v2 removes files
    val ss = spark.newSession()
    val q = ss.readStream.format("graft.sources.GraftLakeSource")
      .option("path", root).load()
      .writeStream.format("parquet")
      .option("path", s"$out/data").option("checkpointLocation", s"$out/chk")
      .trigger(Trigger.AvailableNow()).start()
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination(120000)
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    assert(causes(ex).exists(_.getMessage != null) &&
      causes(ex).exists(c => c.getMessage != null &&
        c.getMessage.contains("appends only")))
  }

  test("streaming from a time-travel pin refuses") {
    val root = freshRoot()
    SnapshotLake.commit(spark, root, tbl(0 until 10), "k")
    val ss = spark.newSession()
    val ex = intercept[Exception] {
      val q = ss.readStream.format("graft.sources.GraftLakeSource")
        .option("path", root).option("version", "0").load()
        .writeStream.format("memory").queryName("lake_pin")
        .trigger(Trigger.AvailableNow()).start()
      try { q.awaitTermination(60000); () } finally q.stop()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    assert(causes(ex).exists(c => c.getMessage != null &&
      c.getMessage.contains("never grows")))
  }
}
