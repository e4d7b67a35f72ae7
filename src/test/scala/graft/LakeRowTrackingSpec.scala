package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.SnapshotLake

/** Row tracking (Delta's row-id model): implicit stable ids
  * (manifest `ri=` base + physical position) assigned once from the
  * chain's monotonic high-water, the `_row_id` metadata column
  * (implicit / materialized / null sources), identity SURVIVING a
  * SQL key-column UPDATE through BOTH row-level paths — the delta
  * path's materialized `__rid` post-images and the group-based CoW
  * path's metadata-fed rewrite (`DataWriter.write(meta, row)`) —
  * and the change feed's row-id diff. Remaining honest decline: a
  * rewrite output holding any row WITHOUT a pre-image id (untracked
  * sources, a MERGE's genuine inserts) refuses the `ri=mat` mark
  * and its versions keep the key-matched diff.
  */
class LakeRowTrackingSpec extends SparkTestBase {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("lake_rid_").toString

  private def clustered4(root: String): Unit = {
    val bucket = (1 to 3).foldLeft(lit(0)) { (acc, i) =>
      when(col("k") >= i * 100, lit(i)).otherwise(acc)
    }
    SnapshotLake.commitClustered(spark, root,
      (0L until 400L).map(i => (i, i * 7)).toDF("k", "v"), bucket, "k")
  }

  private def mkDvTable(name: String, root: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"""
      CREATE TABLE $name (k BIGINT, v BIGINT)
      USING graft.sources.GraftLakeSource
      OPTIONS (path '$root', statCol 'k', dv 'true',
               changefeed 'true')""")
  }

  test("implicit ids: disjoint per-file ranges from the monotonic high-water; appends continue it") {
    val root = freshRoot()
    clustered4(root)
    val snap = SnapshotLake.snapshot(root)
    assert(snap.files.forall(_.rid.isDefined))
    // bases tile [0, 400) exactly: sorted (base, base+rows) runs
    val runs = snap.files.map(f => (f.rid.get, f.rid.get + f.rows))
      .sortBy(_._1)
    assert(runs.head._1 === 0L)
    assert(runs.sliding(2).forall {
      case Seq((_, e), (b, _)) => e == b; case _ => true })
    assert(runs.last._2 === 400L)
    // an append starts past the high-water, never reusing ids
    SnapshotLake.commit(spark, root,
      Seq((1000L, 1L), (1001L, 1L)).toDF("k", "v").coalesce(1), "k")
    val f2 = SnapshotLake.snapshot(root).files
      .find(_.rid.exists(_ >= 400L))
    assert(f2.exists(_.rid.contains(400L)))
    // _row_id reads as base + physical position, alongside _pos
    mkDvTable("rid_t1", root)
    val rows = spark.sql(
      "SELECT k, _row_id, _pos FROM rid_t1 WHERE k >= 100 AND k < 103")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // file [100,199] is one sorted run: its rows' ids are contiguous
    assert(rows.map(_._2) === Array(rows(0)._2, rows(0)._2 + 1,
      rows(0)._2 + 2))
    assert(rows.map(_._3) === Array(0L, 1L, 2L))
  }

  test("a key-column SQL UPDATE keeps each row's _row_id; the CDF classifies it as updates") {
    val root = freshRoot()
    clustered4(root)
    mkDvTable("rid_t2", root)
    val before = spark.sql(
      "SELECT k, _row_id FROM rid_t2 WHERE k IN (7, 207)")
      .as[(Long, Long)].collect().toMap
    // KEY-column update: k 7→1007, 207→1207
    spark.sql("UPDATE rid_t2 SET k = k + 1000 WHERE k IN (7, 207)")
    val after = spark.sql(
      "SELECT k, _row_id FROM rid_t2 WHERE k IN (1007, 1207)")
      .as[(Long, Long)].collect().toMap
    assert(after(1007L) === before(7L))
    assert(after(1207L) === before(207L))
    // post-images live in a materialized-id file
    assert(SnapshotLake.snapshot(root).files.exists(_.ridMat))
    // the change feed pairs pre/post by row id → proper updates
    val v = SnapshotLake.snapshot(root).version
    val byType = spark.read.format("graft.sources.GraftLakeSource")
      .option("path", root).option("readChangeFeed", "true")
      .option("startingVersion", v.toString)
      .option("endingVersion", v.toString).load()
      .groupBy(col("_change_type")).agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(byType === Map("update" -> 2L))
    // a second update of an ALREADY-MATERIALIZED row keeps the id
    spark.sql("UPDATE rid_t2 SET v = -1 WHERE k = 1007")
    val again = spark.sql(
      "SELECT _row_id FROM rid_t2 WHERE k = 1007")
      .as[Long].collect().toSeq
    assert(again === Seq(before(7L)))
  }

  test("CoW rewrites PRESERVE row ids: outputs materialize, survivors keep identity, CDF rid-diffs") {
    val root = freshRoot()
    clustered4(root)
    // read (k, id) pairs before the rewrite through the connector
    spark.sql("DROP TABLE IF EXISTS rid_cow")
    spark.sql(s"""
      CREATE TABLE rid_cow (k BIGINT, v BIGINT)
      USING graft.sources.GraftLakeSource
      OPTIONS (path '$root', statCol 'k')""")
    val before = spark.sql("SELECT k, _row_id FROM rid_cow")
      .as[(Long, Long)].collect().toMap
    // dense delete → CoW rewrite (threshold 1): the rewrite
    // MATERIALIZES survivors' ids (__rid) — row tracking survives
    SnapshotLake.deleteRows(spark, root,
      col("k") >= 100L && col("k") < 180L, cowThresholdRows = 1L)
    val after = SnapshotLake.snapshot(root)
    assert(after.files.exists(_.ridMat), "CoW output not materialized")
    val again = spark.sql("SELECT k, _row_id FROM rid_cow")
      .as[(Long, Long)].collect().toMap
    assert(again.size === 320)
    assert(again.forall { case (k, id) => before(k) == id },
      "a surviving row changed identity through the CoW rewrite")
    // the CDF rid-diff now applies to the rewrite version and
    // derives exactly the deleted rows (no phantom delete+insert
    // pairs for the 320 carried survivors)
    val (diff, _, _) = SnapshotLake.changes(spark, root,
      after.version - 1, after.version)
    val byType = diff.groupBy(col("change_type"))
      .agg(count(lit(1)).as("n")).as[(String, Long)].collect().toMap
    assert(byType === Map("delete" -> 80L))
  }

  test("upsert merge: survivors keep ids, updates keep identity, inserts tag ri=new; CDF rid-diffs the lot") {
    val root = freshRoot()
    clustered4(root)
    spark.sql("DROP TABLE IF EXISTS rid_mrg")
    spark.sql(s"""
      CREATE TABLE rid_mrg (k BIGINT, v BIGINT)
      USING graft.sources.GraftLakeSource
      OPTIONS (path '$root', statCol 'k')""")
    val before = spark.sql("SELECT k, _row_id FROM rid_mrg")
      .as[(Long, Long)].collect().toMap
    // upsert: update k∈[100,110), insert k∈[400,410), delete k=205
    SnapshotLake.merge(spark, root,
      (100L until 110L).map(k => (k, -k)).toDF("k", "v")
        .unionByName((400L until 410L).map(k => (k, k)).toDF("k", "v")),
      Seq(205L).toDF("k"))
    val snap = SnapshotLake.snapshot(root)
    assert(snap.files.exists(_.ridNew), "insert file not tagged ri=new")
    assert(snap.files.exists(_.ridMat), "rewrite not materialized")
    val again = spark.sql("SELECT k, _row_id FROM rid_mrg")
      .as[(Long, Long)].collect().toMap
    // updated rows kept their identity; inserts got fresh ids
    (100L until 110L).foreach(k => assert(again(k) == before(k),
      s"updated row $k changed identity"))
    (400L until 410L).foreach(k => assert(!before.values.toSet(again(k))))
    assert(again.values.toSeq.distinct.size === again.size)
    // CDF: rid diff classifies updates/inserts/deletes exactly
    val (diff, _, _) = SnapshotLake.changes(spark, root,
      snap.version - 1, snap.version)
    val byType = diff.groupBy(col("change_type"))
      .agg(count(lit(1)).as("n")).as[(String, Long)].collect().toMap
    assert(byType ===
      Map("update" -> 10L, "insert" -> 10L, "delete" -> 1L))
  }

  test("group-based SQL CoW (non-dv table): rewrites carry pre-image " +
      "ids via write metadata; key-column UPDATE rid-diffs as updates") {
    val root = freshRoot()
    clustered4(root)
    spark.sql("DROP TABLE IF EXISTS rid_grp")
    // NO dv option → SQL UPDATE/DELETE route through the GROUP-BASED
    // ReplaceData path (the delta fast path is never offered)
    spark.sql(s"""
      CREATE TABLE rid_grp (k BIGINT, v BIGINT)
      USING graft.sources.GraftLakeSource
      OPTIONS (path '$root', statCol 'k')""")
    val before = spark.sql("SELECT k, _row_id FROM rid_grp")
      .as[(Long, Long)].collect().toMap
    // KEY-column update — the case a key diff can only see as
    // delete+insert; the rid diff must see two updates
    spark.sql("UPDATE rid_grp SET k = k + 1000 WHERE k IN (7, 207)")
    val snap = SnapshotLake.snapshot(root)
    assert(snap.files.exists(_.ridMat),
      "group-based CoW rewrite did not materialize ids")
    val after = spark.sql("SELECT k, _row_id FROM rid_grp")
      .as[(Long, Long)].collect().toMap
    assert(after(1007L) === before(7L))
    assert(after(1207L) === before(207L))
    // carried rows in the rewritten files kept identity too
    assert(after.size === 400)
    assert(after.filterNot(kv => kv._1 == 1007L || kv._1 == 1207L)
      .forall { case (k, id) => before(k) == id })
    val (diff, _, _) = SnapshotLake.changes(spark, root,
      snap.version - 1, snap.version)
    val byType = diff.groupBy(col("change_type"))
      .agg(count(lit(1)).as("n")).as[(String, Long)].collect().toMap
    assert(byType === Map("update" -> 2L))
    // SQL DELETE through the same path: survivors keep ids, the CDF
    // derives exactly the deleted rows
    spark.sql("DELETE FROM rid_grp WHERE k % 100 = 9 AND k < 400")
    val snap2 = SnapshotLake.snapshot(root)
    val (diff2, _, _) = SnapshotLake.changes(spark, root,
      snap2.version - 1, snap2.version)
    val byType2 = diff2.groupBy(col("change_type"))
      .agg(count(lit(1)).as("n")).as[(String, Long)].collect().toMap
    assert(byType2 === Map("delete" -> 4L)) // k = 9, 109, 209, 309
    val kept = spark.sql("SELECT k, _row_id FROM rid_grp")
      .as[(Long, Long)].collect().toMap
    assert(kept.forall { case (k, id) => after(k) == id })
  }

  test("row ids survive deletion vectors: surviving rows keep their ids") {
    val root = freshRoot()
    clustered4(root)
    mkDvTable("rid_t4", root)
    val before = spark.sql(
      "SELECT k, _row_id FROM rid_t4 WHERE k >= 100 AND k < 110")
      .as[(Long, Long)].collect().toMap
    spark.sql("DELETE FROM rid_t4 WHERE k IN (103, 105)")
    val after = spark.sql(
      "SELECT k, _row_id FROM rid_t4 WHERE k >= 100 AND k < 110")
      .as[(Long, Long)].collect().toMap
    assert(!after.contains(103L) && !after.contains(105L))
    assert(after === (before - 103L - 105L))
  }
}
