package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.sources.SnapshotLake

/** Lake-level schema evolution: the manifest records each commit's
  * schema, appends widen it additively (type conflicts refuse),
  * every reader — helpers and DSv2 connector — surfaces the widened
  * union with old files null-filled, and time travel reads each
  * version under ITS OWN schema.
  */
class LakeSchemaEvolutionSpec extends SparkTestBase {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("lake_evo_").toString

  test("append widens the recorded schema; old files null-fill on every read path") {
    val root = freshRoot()
    val v0 = SnapshotLake.commit(spark, root,
      (0L until 50L).map(i => (i, i * 7)).toDF("k", "v"), "k")
    val v1 = SnapshotLake.commit(spark, root,
      (50L until 100L).map(i => (i, i * 7, s"tag$i")).toDF("k", "v", "t"), "k")
    val head = SnapshotLake.snapshot(root)
    assert(head.schema.map(_.fieldNames.toSeq) === Some(Seq("k", "v", "t")))
    // helper read: 100 rows, nulls exactly on the legacy half
    val df = SnapshotLake.read(spark, root)
    assert(df.columns.toSeq === Seq("k", "v", "t"))
    assert(df.where(col("t").isNull).count() === 50L)
    assert(df.where(col("t") === "tag75").count() === 1L)
    // connector read agrees, and pruning still works on the evolved chain
    val cdf = spark.read.format("graft.sources.GraftLakeSource")
      .option("path", root).load()
    assert(cdf.columns.toSeq === Seq("k", "v", "t"))
    assert(cdf.where(col("k") < 50).where(col("t").isNotNull).count() === 0L)
    assert(cdf.count() === 100L)
    // time travel: v0 reads under the OLD schema — no phantom column
    assert(SnapshotLake.read(spark, root, Some(v0)).columns.toSeq ===
      Seq("k", "v"))
    assert(SnapshotLake.read(spark, root, Some(v1)).columns.toSeq ===
      Seq("k", "v", "t"))
  }

  test("a subset append (old-schema writer) keeps the widened schema") {
    val root = freshRoot()
    SnapshotLake.commit(spark, root,
      (0L until 10L).map(i => (i, i * 7, s"t$i")).toDF("k", "v", "t"), "k")
    SnapshotLake.commit(spark, root,
      (10L until 20L).map(i => (i, i * 7)).toDF("k", "v"), "k")
    val head = SnapshotLake.snapshot(root)
    assert(head.schema.map(_.fieldNames.toSeq) === Some(Seq("k", "v", "t")))
    val df = SnapshotLake.read(spark, root)
    assert(df.where(col("t").isNull).count() === 10L)
  }

  test("an appended non-nullable column evolves as nullable") {
    val root = freshRoot()
    SnapshotLake.commit(spark, root,
      (0L until 10L).map(i => (i, i * 7)).toDF("k", "v"), "k")
    // writer declares the new column REQUIRED; the evolved schema
    // must relax it — pre-evolution files lack the column entirely,
    // and a REQUIRED request would fail their reads instead of
    // null-filling
    val strict = spark.createDataFrame(
      spark.sparkContext.parallelize((10L until 20L).map(i =>
        org.apache.spark.sql.Row(i, i * 7, i * 11))),
      StructType(Seq(StructField("k", LongType, nullable = false),
        StructField("v", LongType, nullable = false),
        StructField("w", LongType, nullable = false))))
    SnapshotLake.commit(spark, root, strict, "k")
    val head = SnapshotLake.snapshot(root)
    val wField = head.schema.get.fields.find(_.name == "w").get
    assert(wField.nullable, "appended column must evolve as nullable")
    // the proof: reading a pre-evolution file through the pinned
    // schema null-fills instead of failing on a missing REQUIRED col
    val df = SnapshotLake.read(spark, root)
    assert(df.where(col("w").isNull).count() === 10L)
    val cdf = spark.read.format("graft.sources.GraftLakeSource")
      .option("path", root).load()
    assert(cdf.where(col("w").isNull).count() === 10L)
  }

  test("re-typing a column refuses instead of mislabeling old files") {
    val root = freshRoot()
    SnapshotLake.commit(spark, root,
      (0L until 10L).map(i => (i, i * 7)).toDF("k", "v"), "k")
    val ex = intercept[IllegalArgumentException] {
      SnapshotLake.commit(spark, root,
        (10L until 20L).map(i => (i, s"s$i")).toDF("k", "v"), "k")
    }
    assert(ex.getMessage.contains("re-type"))
  }

  test("overwrite replaces the schema; maintenance verbs carry it through") {
    val root = freshRoot()
    SnapshotLake.commit(spark, root,
      (0L until 10L).map(i => (i, i * 7, s"t$i")).toDF("k", "v", "t"), "k")
    SnapshotLake.commit(spark, root,
      (0L until 100L).map(i => (i, i * 3)).toDF("k", "w"), "k",
      overwrite = true)
    assert(SnapshotLake.snapshot(root).schema.map(_.fieldNames.toSeq) ===
      Some(Seq("k", "w")))
    // delete and compact preserve the head schema
    SnapshotLake.delete(spark, root, 0L, 10L)
    assert(SnapshotLake.snapshot(root).schema.map(_.fieldNames.toSeq) ===
      Some(Seq("k", "w")))
    SnapshotLake.compactLake(spark, root, 1000L)
    assert(SnapshotLake.snapshot(root).schema.map(_.fieldNames.toSeq) ===
      Some(Seq("k", "w")))
    assert(SnapshotLake.read(spark, root).count() === 90L)
  }

  test("a re-cased column is the same column under case-insensitive resolution") {
    val root = freshRoot()
    SnapshotLake.commit(spark, root,
      (0L until 10L).map(i => (i, i * 7)).toDF("k", "v"), "k")
    // same column, different case, same type: no phantom duplicate
    SnapshotLake.commit(spark, root,
      (10L until 20L).map(i => (i, i * 7)).toDF("k", "V"), "k")
    assert(SnapshotLake.snapshot(root).schema.map(_.fieldNames.toSeq) ===
      Some(Seq("k", "v")))
    // re-cased AND re-typed still refuses
    val ex = intercept[IllegalArgumentException] {
      SnapshotLake.commit(spark, root,
        (20L until 30L).map(i => (i, s"s$i")).toDF("k", "V"), "k")
    }
    assert(ex.getMessage.contains("re-type"))
  }

  test("rename is metadata-only: zero file rewrites, every read path maps physical names") {
    val root = freshRoot()
    val v0 = SnapshotLake.commit(spark, root,
      (0L until 20L).map(i => (i, i * 7)).toDF("k", "v"), "k")
    val filesBefore = SnapshotLake.snapshot(root).files.map(_.name)
    SnapshotLake.renameColumn(root, "v", "w")
    val head = SnapshotLake.snapshot(root)
    assert(head.files.map(_.name) === filesBefore, "rename rewrote files")
    assert(head.op === Some("rename"))
    assert(head.schema.map(_.fieldNames.toSeq) === Some(Seq("k", "w")))
    // helper read surfaces the new logical name with the old values
    val df = SnapshotLake.read(spark, root)
    assert(df.columns.toSeq === Seq("k", "w"))
    assert(df.agg(sum(col("w"))).head.getLong(0) ===
      (0L until 20L).map(_ * 7).sum)
    // connector read maps physical → logical positionally
    val cdf = spark.read.format("graft.sources.GraftLakeSource")
      .option("path", root).load()
    assert(cdf.columns.toSeq === Seq("k", "w"))
    assert(cdf.where(col("w") === 70L).count() === 1L)
    // time travel: v0 reads under ITS OWN column name
    assert(SnapshotLake.read(spark, root, Some(v0)).columns.toSeq ===
      Seq("k", "v"))
    // appends under the new logical name STORE the physical one
    SnapshotLake.commit(spark, root,
      (20L until 30L).map(i => (i, i * 7)).toDF("k", "w"), "k")
    val after = SnapshotLake.read(spark, root)
    assert(after.count() === 30L)
    assert(after.where(col("w").isNull).count() === 0L)
    val newFiles = SnapshotLake.snapshot(root).files.map(_.name)
      .filterNot(filesBefore.toSet)
    newFiles.foreach(n =>
      assert(spark.read.parquet(s"$root/$n").columns.toSeq.contains("v"),
        s"append after rename stored logical, not physical, names in $n"))
    // CoW rewrite keeps physical naming (no silent logical column)
    SnapshotLake.delete(spark, root, 5L, 7L)
    val rewritten = SnapshotLake.read(spark, root)
    assert(rewritten.count() === 28L)
    assert(rewritten.where(col("w").isNull).count() === 0L)
    // the pruning identity may not be renamed
    intercept[IllegalArgumentException] {
      SnapshotLake.renameColumn(root, "k", "kk")
    }
  }

  test("drop column is logical: time travel keeps it, retired physical name blocks reuse") {
    val root = freshRoot()
    SnapshotLake.commit(spark, root,
      (0L until 10L).map(i => (i, i * 7)).toDF("k", "v"), "k")
    val vPre = SnapshotLake.commit(spark, root,
      (10L until 20L).map(i => (i, i * 7, s"t$i")).toDF("k", "v", "t"), "k")
    val filesBefore = SnapshotLake.snapshot(root).files.map(_.name)
    SnapshotLake.dropColumn(root, "t")
    val head = SnapshotLake.snapshot(root)
    assert(head.files.map(_.name) === filesBefore, "drop rewrote files")
    assert(head.schema.map(_.fieldNames.toSeq) === Some(Seq("k", "v")))
    assert(head.retired === Set("t"))
    assert(SnapshotLake.read(spark, root).columns.toSeq === Seq("k", "v"))
    // time travel still surfaces the dropped column
    assert(SnapshotLake.read(spark, root, Some(vPre)).columns.toSeq ===
      Seq("k", "v", "t"))
    // a new column on the retired physical name would resurface the
    // dropped bytes from old files — refused
    intercept[IllegalArgumentException] {
      SnapshotLake.commit(spark, root,
        (20L until 25L).map(i => (i, i * 7, s"x$i")).toDF("k", "v", "t"), "k")
    }
    // a differently-named column is fine
    SnapshotLake.commit(spark, root,
      (30L until 35L).map(i => (i, i * 7, s"u$i")).toDF("k", "v", "u"), "k")
    assert(SnapshotLake.read(spark, root).columns.toSeq === Seq("k", "v", "u"))
    intercept[IllegalArgumentException] {
      SnapshotLake.dropColumn(root, "k")
    }
  }

  test("a re-cased append cannot land on a retired physical name") {
    // the engine resolves columns case-insensitively, so after
    // dropColumn("t") an appended "T" is the SAME storage slot — it
    // would match old files' physical `t` bytes and silently
    // resurface the dropped values; the guard must compare under the
    // same case-insensitive key the rest of the engine uses
    val root = freshRoot()
    SnapshotLake.commit(spark, root,
      (0L until 10L).map(i => (i, i * 7, s"t$i")).toDF("k", "v", "t"), "k")
    SnapshotLake.dropColumn(root, "t")
    val err = intercept[IllegalArgumentException] {
      SnapshotLake.commit(spark, root,
        (10L until 15L).map(i => (i, i * 7, s"x$i")).toDF("k", "v", "T"), "k")
    }
    assert(err.getMessage.contains("dropped column's physical"))
  }

  test("a new column cannot collide with a renamed column's storage name") {
    // rename keeps the physical name: after cents → amount_cents the
    // files still store `cents`, so a NEW logical column named
    // `cents` would give two fields the same parquet field — refuse
    // with the guard's clear message, not an accidental
    // duplicate-column failure deep in the write path
    val root = freshRoot()
    SnapshotLake.commit(spark, root,
      (0L until 10L).map(i => (i, i * 100)).toDF("k", "cents"), "k")
    SnapshotLake.renameColumn(root, "cents", "amount_cents")
    val err = intercept[IllegalArgumentException] {
      SnapshotLake.commit(spark, root,
        (10L until 15L).map(i => (i, i * 100, i)).toDF(
          "k", "amount_cents", "cents"), "k")
    }
    assert(err.getMessage.contains("physical"),
      s"wanted the collision guard's message, got: ${err.getMessage}")
    // and the re-cased spelling of the same storage slot is equally refused
    val err2 = intercept[IllegalArgumentException] {
      SnapshotLake.commit(spark, root,
        (10L until 15L).map(i => (i, i * 100, i)).toDF(
          "k", "amount_cents", "CENTS"), "k")
    }
    assert(err2.getMessage.contains("physical"))
  }

  test("evolveSchema is union-in-parent-order with equal-type dedup") {
    val p = StructType(Seq(StructField("a", LongType), StructField("b", LongType)))
    val n = StructType(Seq(StructField("b", LongType), StructField("c", LongType)))
    assert(SnapshotLake.evolveSchema(p, n).fieldNames.toSeq ===
      Seq("a", "b", "c"))
  }
}
