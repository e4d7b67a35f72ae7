package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.SnapshotLake

/** SQL row-level DML over the lake's `SupportsRowLevelOperations`
  * surface: `UPDATE`, `MERGE INTO`, and the `DELETE`s the metadata
  * fast path refuses all route through the group-based
  * copy-on-write rewrite — candidate files (static prune + runtime
  * group filter) are rewritten in full, untouched files carry by
  * reference, and range DELETEs still take the metadata-only path.
  */
class LakeRowLevelSpec extends SparkTestBase {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("lake_rlo_").toString

  private def tbl(ids: Range) =
    ids.map(i => (i.toLong, i.toLong * 7)).toDF("k", "v")

  /** 8 range-clustered files over k = 0 until 800, file i = [100i, 100i+99]. */
  private def clustered8(root: String): Unit = {
    val bucket = (1 to 7).foldLeft(lit(0)) { (acc, i) =>
      when(col("k") >= i * 100, lit(i)).otherwise(acc)
    }
    SnapshotLake.commitClustered(spark, root, tbl(0 until 800), bucket, "k")
  }

  private def withTable(name: String, root: String)(body: => Unit): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"""
      CREATE TABLE $name (k BIGINT, v BIGINT)
      USING graft.sources.GraftLakeSource
      OPTIONS (path '$root', statCol 'k')""")
    try body finally spark.sql(s"DROP TABLE IF EXISTS $name")
  }

  test("SQL UPDATE rewrites only the files the stat prune keeps") {
    val root = freshRoot()
    clustered8(root)
    val before = SnapshotLake.snapshot(root)
    withTable("rlo_upd", root) {
      spark.sql(
        "UPDATE rlo_upd SET v = v + 1000000 WHERE k >= 250 AND k < 350")
      val after = SnapshotLake.snapshot(root)
      assert(after.op === Some("update"))
      assert(after.version === before.version + 1)
      // only files 2 [200,299] and 3 [300,399] are candidates; the
      // other 6 must carry BY NAME (zero rewrite outside the prune)
      val beforeNames = before.files.map(_.name).toSet
      val carried = after.files.filter(f => beforeNames(f.name))
      assert(carried.size === 6,
        s"expected 6 carried files, got ${carried.size}")
      // content: exactly [250, 350) updated, everything else intact
      val rows = spark.table("rlo_upd").select("k", "v").as[(Long, Long)]
        .collect().sortBy(_._1).toSeq
      assert(rows === (0L until 800L).map(k =>
        (k, if (k >= 250 && k < 350) k * 7 + 1000000 else k * 7)))
      // time travel: the pre-update snapshot is untouched
      assert(SnapshotLake.read(spark, root, Some(before.version))
        .where(col("v") >= 1000000).count() === 0L)
    }
  }

  test("SQL UPDATE with a non-stat predicate still lands correctly") {
    val root = freshRoot()
    clustered8(root)
    withTable("rlo_upd2", root) {
      spark.sql("UPDATE rlo_upd2 SET v = -1 WHERE v % 70 = 0")
      val rows = spark.table("rlo_upd2").select("k", "v").as[(Long, Long)]
        .collect().sortBy(_._1).toSeq
      assert(rows === (0L until 800L).map(k =>
        (k, if ((k * 7) % 70 == 0) -1L else k * 7)))
      assert(SnapshotLake.snapshot(root).op === Some("update"))
    }
  }

  test("SQL MERGE INTO: matched rows update, unmatched rows insert") {
    val root = freshRoot()
    clustered8(root)
    withTable("rlo_mrg", root) {
      // source: touches k ∈ {10, 20} (updates) and {900, 901} (inserts)
      Seq((10L, 1L), (20L, 2L), (900L, 3L), (901L, 4L))
        .toDF("k", "v").createOrReplaceTempView("rlo_src")
      spark.sql("""
        MERGE INTO rlo_mrg t USING rlo_src s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET v = s.v
        WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
      val got = spark.table("rlo_mrg").select("k", "v").as[(Long, Long)]
        .collect().sortBy(_._1).toSeq
      val want = (0L until 800L).map {
        case 10L => (10L, 1L)
        case 20L => (20L, 2L)
        case k => (k, k * 7)
      } ++ Seq((900L, 3L), (901L, 4L))
      assert(got === want)
      assert(SnapshotLake.snapshot(root).op === Some("merge"))
      assert(spark.table("rlo_mrg").count() === 802L)
    }
  }

  test("SQL MERGE with a delete clause removes matched rows") {
    val root = freshRoot()
    clustered8(root)
    withTable("rlo_mrgdel", root) {
      Seq(5L, 6L, 7L).toDF("k").createOrReplaceTempView("rlo_del_src")
      spark.sql("""
        MERGE INTO rlo_mrgdel t USING rlo_del_src s ON t.k = s.k
        WHEN MATCHED THEN DELETE""")
      val ks = spark.table("rlo_mrgdel").select("k").as[Long]
        .collect().sorted.toSeq
      assert(ks === (0L until 800L).filterNot(Set(5L, 6L, 7L)))
    }
  }

  test("non-range DELETE routes through copy-on-write instead of refusing") {
    val root = freshRoot()
    clustered8(root)
    withTable("rlo_del", root) {
      // v = 7·k, so v = 3500 names exactly k = 500 — not a stat-column
      // range, previously a hard refusal, now a CoW rewrite
      spark.sql("DELETE FROM rlo_del WHERE v = 3500")
      assert(spark.table("rlo_del").count() === 799L)
      assert(spark.table("rlo_del").where(col("k") === 500L).count() === 0L)
      assert(SnapshotLake.snapshot(root).op === Some("delete"))
    }
  }

  test("range DELETE still takes the metadata-only fast path, not CoW") {
    val root = freshRoot()
    clustered8(root)
    val dataFilesBefore =
      Files.list(java.nio.file.Paths.get(root, "data")).count()
    withTable("rlo_fast", root) {
      // [200, 400) aligns on file boundaries: pure manifest edit
      spark.sql("DELETE FROM rlo_fast WHERE k >= 200 AND k < 400")
      assert(spark.table("rlo_fast").count() === 600L)
      assert(Files.list(java.nio.file.Paths.get(root, "data")).count()
        === dataFilesBefore, "metadata-only delete wrote data files")
    }
  }

  test("DELETE on an uncommitted lake is a vacuous success") {
    val root = freshRoot()
    withTable("rlo_empty", root) {
      spark.sql("DELETE FROM rlo_empty WHERE v = 7")
      assert(spark.table("rlo_empty").count() === 0L)
      assert(SnapshotLake.headVersion(root) === -1)
    }
  }

  test("_file metadata column reads per-file constants without touching decode") {
    val root = freshRoot()
    clustered8(root)
    val df = spark.read.format("graft.sources.GraftLakeSource")
      .option("path", root).load()
    // _file is hidden from SELECT * but selectable by name
    assert(!df.columns.contains("_file"))
    val perFile = df.select(col("_file"), col("k"))
      .groupBy(col("_file"))
      .agg(min(col("k")).as("mn"), max(col("k")).as("mx"),
        count(lit(1)).as("n"))
      .collect()
    assert(perFile.length === 8)
    perFile.foreach { r =>
      assert(r.getString(0).startsWith("/"), "expected an absolute path")
      assert(r.getLong(3) === 100L)
      assert(r.getLong(2) === r.getLong(1) + 99L,
        s"file ${r.getString(0)} spans [${r.getLong(1)}, ${r.getLong(2)}]")
    }
  }

  test("UPDATE then read back through every path agrees") {
    val root = freshRoot()
    clustered8(root)
    withTable("rlo_paths", root) {
      spark.sql("UPDATE rlo_paths SET v = 0 WHERE k < 100")
      val viaTable = spark.table("rlo_paths")
        .agg(sum(col("v"))).head.getLong(0)
      val viaHelper = SnapshotLake.read(spark, root)
        .agg(sum(col("v"))).head.getLong(0)
      val viaConnector = spark.read
        .format("graft.sources.GraftLakeSource").option("path", root).load()
        .agg(sum(col("v"))).head.getLong(0)
      val want = (100L until 800L).map(_ * 7).sum
      assert(viaTable === want)
      assert(viaHelper === want)
      assert(viaConnector === want)
    }
  }
}
