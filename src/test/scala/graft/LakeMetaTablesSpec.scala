package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.SnapshotLake

/** Metadata tables (`cat.t.files` / `.history` / `.snapshots` /
  * `.partitions` / `.refs`): resolution through multipart
  * identifiers, precedence of real tables over the meta namespace,
  * manifest-faithful contents (deletion vectors, sort stamps, rid
  * bases), and failure on unknown bases.
  */
class LakeMetaTablesSpec extends SparkTestBase {
  import spark.implicits._

  private val cat = "graft_meta_cat"
  private lazy val suiteBase: String =
    Files.createTempDirectory("lake_meta_").toString

  private def withCatalog(body: => Unit): Unit = {
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.GraftLakeCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", suiteBase)
    body
  }

  test("files/partitions/history/refs answer from the manifest; " +
      "live_rows tracks deletion vectors") {
    withCatalog {
      spark.sql(s"""
        CREATE TABLE $cat.m1 (k BIGINT, cents BIGINT)
        PARTITIONED BY (bucket(4, k))
        TBLPROPERTIES ('statCol' = 'cents', 'sortcol' = 'k')""")
      spark.sql(s"INSERT INTO $cat.m1 SELECT id, id * 3 FROM range(400)")
      val files = spark.sql(s"SELECT * FROM $cat.m1.files")
      assert(files.count() === 4L)
      assert(files.where(col("sorted_by") === "k").count() === 4L)
      assert(files.agg(sum(col("rows"))).head.getLong(0) === 400L)
      assert(files.where(col("rid_base").isNotNull).count() === 4L)
      val parts = spark.sql(s"SELECT * FROM $cat.m1.partitions")
      assert(parts.count() === 4L)
      assert(parts.agg(sum(col("n_rows"))).head.getLong(0) === 400L)
      // a DV delete: rows stays physical, live_rows drops
      SnapshotLake.deleteRows(spark, s"$suiteBase/m1", col("k") < 10)
      val files2 = spark.sql(s"SELECT * FROM $cat.m1.files")
      assert(files2.agg(sum(col("rows"))).head.getLong(0) === 400L)
      assert(files2.agg(sum(col("live_rows"))).head.getLong(0) === 390L)
      assert(files2.agg(sum(col("dv_count"))).head.getLong(0) === 10L)
      // history: newest first, v0 is a checkpoint
      val hist = spark.sql(s"SELECT * FROM $cat.m1.history")
        .collect()
      assert(hist.map(_.getLong(0)).toSeq === Seq(1L, 0L))
      assert(hist.last.getBoolean(6)) // v0 full manifest
      // refs appear as they are created
      assert(spark.sql(s"SELECT * FROM $cat.m1.refs").count() === 0L)
      SnapshotLake.createTag(s"$suiteBase/m1", "r1", 1)
      val refs = spark.sql(s"SELECT * FROM $cat.m1.refs")
        .as[(String, String, Long)].collect().toSet
      assert(refs === Set(("r1", "tag", 1L)))
      // meta joins like any relation: files ⋈ partitions on the tag
      val joined = spark.sql(s"""
        SELECT count(*) FROM $cat.m1.files f
        JOIN $cat.m1.partitions p
          ON f.part_col = p.part_col AND f.part_val = p.part_val""")
      assert(joined.head.getLong(0) === 4L)
    }
  }

  test("partitions carries a LEVEL column: a composed-spec table " +
      "rolls up per level, and one level sums to the table's rows") {
    withCatalog {
      spark.sql(s"""
        CREATE TABLE $cat.m3 (p BIGINT, k BIGINT, cents BIGINT)
        PARTITIONED BY (p, bucket(4, k))
        TBLPROPERTIES ('statCol' = 'cents')""")
      spark.sql(s"INSERT INTO $cat.m3 " +
        "SELECT id % 2, id, id * 3 FROM range(400)")
      val parts = spark.sql(s"SELECT * FROM $cat.m3.partitions")
      // every file contributes a row at EACH level — the consistency
      // equation holds per level, never across the union
      assert(parts.where(col("level") === 1)
        .agg(sum(col("n_rows"))).head.getLong(0) === 400L)
      assert(parts.where(col("level") === 2)
        .agg(sum(col("n_rows"))).head.getLong(0) === 400L)
      assert(parts.where(col("level") === 1).count() === 2L) // p ∈ {0,1}
      assert(parts.where(col("level") === 2).count() === 4L) // 4 buckets
      assert(parts.where(col("level") === 1)
        .select("part_col").distinct().collect().map(_.getString(0))
        .toSeq === Seq("p"))
      // a single-level table is all level 1 (the pre-level contract)
      spark.sql(s"""
        CREATE TABLE $cat.m4 (k BIGINT, cents BIGINT)
        PARTITIONED BY (bucket(4, k))
        TBLPROPERTIES ('statCol' = 'cents')""")
      spark.sql(s"INSERT INTO $cat.m4 SELECT id, id FROM range(100)")
      val p4 = spark.sql(s"SELECT * FROM $cat.m4.partitions")
      assert(p4.where(col("level") =!= 1).count() === 0L)
      assert(p4.agg(sum(col("n_rows"))).head.getLong(0) === 100L)
    }
  }

  test("history/snapshots answer from manifest HEADERS: zero full " +
      "manifest parses on a long chain") {
    withCatalog {
      spark.sql(s"""
        CREATE TABLE $cat.m5 (k BIGINT, cents BIGINT)
        TBLPROPERTIES ('statCol' = 'cents')""")
      // a chain long enough to cross a checkpoint boundary — the old
      // implementation reconstructed EVERY version (checkpoint +
      // delta replay each), O(versions × chain-depth) at planning
      (0 until 20).foreach(i =>
        spark.sql(s"INSERT INTO $cat.m5 VALUES ($i, ${i * 3})"))
      val before = SnapshotLake.manifestParses
      val hist = spark.sql(
        s"SELECT * FROM $cat.m5.history").collect()
      assert(hist.length === 20)
      // allow O(1) incidental parses (base-table schema resolution);
      // the old path cost ~2 parses PER VERSION on this chain
      assert(SnapshotLake.manifestParses - before <= 2,
        s"history cost ${SnapshotLake.manifestParses - before} full " +
          "manifest parses — headers should serve it")
      // and the header-served counts match a real reconstruction
      val headFiles = SnapshotLake.snapshot(s"$suiteBase/m5").files
      val newest = hist.head
      assert(newest.getLong(0) === 19L)
      assert(newest.getLong(2) === headFiles.size.toLong)
      assert(newest.getLong(3) === headFiles.map(_.liveRows).sum)
      assert(hist.count(_.getBoolean(6)) >= 2) // v0 + v16 checkpoints
    }
  }

  test("t.orphans is the dry-run face of remove_orphans: lists " +
      "exactly the reclaim set, deletes nothing") {
    withCatalog {
      spark.sql(s"""
        CREATE TABLE $cat.m6 (k BIGINT, cents BIGINT)
        TBLPROPERTIES ('statCol' = 'cents')""")
      spark.sql(s"INSERT INTO $cat.m6 SELECT id, id FROM range(100)")
      assert(spark.sql(s"SELECT * FROM $cat.m6.orphans").count() === 0L)
      val plant = java.nio.file.Paths.get(
        suiteBase, "m6", "data", "b-dead", "lost.parquet")
      java.nio.file.Files.createDirectories(plant.getParent)
      java.nio.file.Files.write(plant, "junk".getBytes): Unit
      val rows = spark.sql(s"SELECT * FROM $cat.m6.orphans").collect()
      assert(rows.length === 1)
      assert(rows.head.getString(0) === "data/b-dead/lost.parquet")
      assert(rows.head.getLong(1) === 4L)
      // the dry run deleted nothing
      assert(java.nio.file.Files.exists(plant))
      // the procedure then reclaims exactly what the table listed
      val removed = spark.sql("CALL " + cat +
        ".remove_orphans(table => 'm6', grace_ms => 0)")
        .head.getLong(0)
      assert(removed === 1L)
      assert(!java.nio.file.Files.exists(plant))
      assert(spark.sql(s"SELECT * FROM $cat.m6.orphans").count() === 0L)
      assert(spark.table(s"$cat.m6").count() === 100L)
    }
  }

  test("a real table wins over the meta namespace; unknown bases fail") {
    withCatalog {
      // a REAL table whose path collides with the meta suffix
      spark.sql(s"""
        CREATE TABLE $cat.m2.files (k BIGINT)
        TBLPROPERTIES ('statCol' = 'k')""")
      spark.sql(s"INSERT INTO $cat.m2.files VALUES (7)")
      assert(spark.sql(s"SELECT k FROM $cat.m2.files").head.getLong(0)
        === 7L)
      // no base table 'nope' -> standard analysis failure, not a
      // phantom empty meta relation
      intercept[Exception] {
        spark.sql(s"SELECT * FROM $cat.nope.files").collect()
      }
      spark.sql(s"DROP TABLE $cat.m2.files")
    }
  }
}
