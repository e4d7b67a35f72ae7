package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.SnapshotLake

/** Streaming CHANGE DATA FEED over the lake (`readStream
  * .option("readChangeFeed", "true")`): appends derive as inserts
  * from the manifest diff, metadata-only deletes as pre-image
  * deletes from the dropped files, layout-only rewrites emit
  * nothing, and CoW mutations replay the `_changes/v<N>` sidecar a
  * `changefeed=true` table materializes at mutation time — absent
  * sidecar, the stream refuses loudly instead of guessing.
  */
class LakeCdfStreamSpec extends SparkTestBase {
  import spark.implicits._

  private val cat = s"graftcdf_${java.util.UUID.randomUUID()
    .toString.take(8)}"

  private lazy val suiteBase: String =
    Files.createTempDirectory("cdf_cat_").toString

  private def withCatalog(body: => Unit): Unit = {
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.GraftLakeCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", suiteBase)
    body
  }

  private def tbl(ids: Range) =
    ids.map(i => (i.toLong, i.toLong * 7)).toDF("k", "v")

  private def drainCdf(root: String, name: String) = {
    val q = spark.readStream.format("graft.sources.GraftLakeSource")
      .option("path", root).option("readChangeFeed", "true").load()
      .writeStream.format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "did not self-terminate")
    spark.table(name)
      .groupBy(col("_commit_version"), col("_change_type"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
  }

  test("SQL timeline through a changefeed table: inserts derive, " +
      "UPDATE/MERGE replay the sidecar, metadata DELETE derives " +
      "pre-images") {
    withCatalog {
      spark.sql(s"""
        CREATE TABLE $cat.t (k BIGINT, v BIGINT)
        TBLPROPERTIES ('statCol' = 'k', 'changefeed' = 'true')""")
      tbl(0 until 100).createOrReplaceTempView("cdf_b0")
      tbl(100 until 250).createOrReplaceTempView("cdf_b1")
      spark.sql(s"INSERT INTO $cat.t SELECT * FROM cdf_b0") // v0
      spark.sql(s"INSERT INTO $cat.t SELECT * FROM cdf_b1") // v1
      spark.sql(s"UPDATE $cat.t SET v = v + 1 WHERE k % 10 = 3") // v2 CoW
      spark.sql(s"DELETE FROM $cat.t WHERE k >= 100 AND k < 250") // v3 meta
      tbl(90 until 120).createOrReplaceTempView("cdf_up")
      spark.sql(s"""
        MERGE INTO $cat.t USING cdf_up ON t.k = cdf_up.k
        WHEN MATCHED THEN UPDATE SET v = cdf_up.v * 2
        WHEN NOT MATCHED THEN INSERT (k, v) VALUES (k, v)""") // v4 CoW
      val root = s"$suiteBase/t"
      // v2's and v4's sidecars landed; v0/v1/v3 stay derivable
      assert(SnapshotLake.changeFiles(root, 2).exists(_.nonEmpty))
      assert(SnapshotLake.changeFiles(root, 3).isEmpty)
      assert(SnapshotLake.changeFiles(root, 4).exists(_.nonEmpty))

      val got = drainCdf(root, "cdf_timeline")
      def sumv(r: Range, f: Long => Long = identity): Long =
        r.map(i => f(i.toLong * 7)).sum
      assert(got((0L, "insert")) === (100L, sumv(0 until 100)))
      assert(got((1L, "insert")) === (150L, sumv(100 until 250)))
      // v2: post-images of the k%10==3 rows, v = 7k + 1
      val upd = (0 until 250).filter(_ % 10 == 3)
      assert(got((2L, "update")) ===
        (upd.size.toLong, upd.map(_.toLong * 7 + 1).sum))
      // v3: pre-images of k in [100, 250) AS OF v2 (k%10==3 carry +1)
      val del = 100 until 250
      assert(got((3L, "delete")) === (del.size.toLong,
        del.map(i => i.toLong * 7 + (if (i % 10 == 3) 1 else 0)).sum))
      // v4: k in [90, 100) matched (update, v = 14k), [100, 120) new
      assert(got((4L, "update")) === (10L, sumv(90 until 100, _ * 2)))
      assert(got((4L, "insert")) === (20L, sumv(100 until 120)))
      assert(got.size === 6, s"unexpected change groups: $got")
    }
  }

  test("a CoW mutation without a sidecar refuses loudly; " +
      "materializeChanges is the manual remedy") {
    val root = Files.createTempDirectory("cdf_nofeed_").toString
    SnapshotLake.commit(spark, root, tbl(0 until 100), "k")
    // upsert payload must DIFFER from the existing rows' — same-key
    // same-payload rows are dropped from the diff by design
    SnapshotLake.merge(spark, root,
      upserts = (50 until 150).map(i => (i.toLong, i.toLong * 7 + 1000))
        .toDF("k", "v"),
      deleteKeys = Seq(3L).toDF("k"))
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q = spark.readStream.format("graft.sources.GraftLakeSource")
        .option("path", root).option("readChangeFeed", "true").load()
        .writeStream.format("memory").queryName("cdf_refuse")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    assert(ex.getMessage.contains("_changes sidecar"),
      s"wrong refusal: ${ex.getMessage}")
    SnapshotLake.materializeChanges(spark, root, 1)
    val got = drainCdf(root, "cdf_manual")
    assert(got((1L, "insert")) ===
      (50L, (100 until 150).map(_.toLong * 7 + 1000).sum))
    assert(got((1L, "update")) ===
      (50L, (50 until 100).map(_.toLong * 7 + 1000).sum))
    assert(got((1L, "delete"))._1 === 1L)
  }

  test("compaction emits no changes; appends before and after derive") {
    val root = Files.createTempDirectory("cdf_compact_").toString
    SnapshotLake.commit(spark, root, tbl(0 until 60), "k")
    SnapshotLake.commit(spark, root, tbl(60 until 100), "k")
    SnapshotLake.compactLake(spark, root, targetRows = 1000) // v2 layout-only
    SnapshotLake.commit(spark, root, tbl(100 until 130), "k")
    val got = drainCdf(root, "cdf_compact")
    assert(!got.keySet.exists(_._1 == 2L), s"compaction leaked rows: $got")
    assert(got((0L, "insert"))._1 === 60L)
    assert(got((1L, "insert"))._1 === 40L)
    assert(got((3L, "insert"))._1 === 30L)
  }

  test("vacuum reaps change sidecars with their versions") {
    val root = Files.createTempDirectory("cdf_vacuum_").toString
    SnapshotLake.commit(spark, root, tbl(0 until 50), "k") // v0
    SnapshotLake.merge(spark, root,
      upserts = (0 until 10).map(i => (i.toLong, i.toLong + 9000))
        .toDF("k", "v"),
      deleteKeys = spark.emptyDataset[Long].toDF("k")) // v1
    SnapshotLake.materializeChanges(spark, root, 1)
    assert(SnapshotLake.changeFiles(root, 1).exists(_.nonEmpty))
    // run the chain out past the next checkpoint so the vacuum
    // cutoff (which snaps back to a full manifest) passes v1
    (2 to 17).foreach(i =>
      SnapshotLake.commit(spark, root, tbl(i * 100 until i * 100 + 5), "k"))
    SnapshotLake.vacuum(root, keepVersions = 2)
    assert(SnapshotLake.changeFiles(root, 1).isEmpty,
      "vacuum left the dropped version's CDC sidecar behind")
  }

  test("batch CDF with startingVersion/endingVersion replays " +
      "inclusive version ranges") {
    val root = Files.createTempDirectory("cdf_range_").toString
    SnapshotLake.commit(spark, root, tbl(0 until 40), "k") // v0
    SnapshotLake.commit(spark, root, tbl(40 until 100), "k") // v1
    SnapshotLake.merge(spark, root, // v2
      upserts = (0 until 10).map(i => (i.toLong, i.toLong + 5000))
        .toDF("k", "v"),
      deleteKeys = spark.emptyDataset[Long].toDF("k"))
    SnapshotLake.materializeChanges(spark, root, 2)
    SnapshotLake.commit(spark, root, tbl(100 until 130), "k") // v3
    def changesOf(from: Int, to: Option[Int]) = {
      val r = spark.read.format("graft.sources.GraftLakeSource")
        .option("path", root).option("readChangeFeed", "true")
        .option("startingVersion", from.toString)
      to.foreach(v => r.option("endingVersion", v.toString))
      r.load().groupBy(col("_commit_version"), col("_change_type"))
        .count().collect()
        .map(x => (x.getLong(0), x.getString(1)) -> x.getLong(2)).toMap
    }
    // both bounds inclusive; head default
    assert(changesOf(1, None) === Map(
      (1L, "insert") -> 60L, (2L, "update") -> 10L,
      (3L, "insert") -> 30L))
    assert(changesOf(0, Some(2)) === Map(
      (0L, "insert") -> 40L, (1L, "insert") -> 60L,
      (2L, "update") -> 10L))
    // a filter on the change columns stays a residual row filter
    val upd = spark.read.format("graft.sources.GraftLakeSource")
      .option("path", root).option("readChangeFeed", "true")
      .option("startingVersion", "0").load()
      .where(col("_change_type") === "update" && col("k") < 5)
    assert(upd.count() === 5)
    val bad = intercept[Exception] {
      spark.read.format("graft.sources.GraftLakeSource")
        .option("path", root).option("readChangeFeed", "true")
        .option("startingVersion", "2").option("endingVersion", "9")
        .load().count()
    }
    assert(bad.getMessage.contains("outside the chain"),
      s"wrong refusal: ${bad.getMessage}")
  }

  test("batch readChangeFeed without a version range is refused") {
    val root = Files.createTempDirectory("cdf_batch_").toString
    SnapshotLake.commit(spark, root, tbl(0 until 10), "k")
    val ex = intercept[Exception] {
      spark.read.format("graft.sources.GraftLakeSource")
        .option("path", root).option("readChangeFeed", "true").load()
        .count()
    }
    assert(ex.getMessage.contains("startingVersion"),
      s"wrong refusal: ${ex.getMessage}")
  }
}
