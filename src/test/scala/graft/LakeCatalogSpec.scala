package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.SnapshotLake

/** The lake's `TableCatalog` face: the full table lifecycle in pure
  * SQL — CREATE / INSERT / UPDATE / MERGE / DELETE / ALTER TABLE
  * ADD|RENAME|DROP COLUMN / VERSION AS OF time travel / DROP TABLE —
  * with the ALTER verbs routed to the metadata-only column-mapping
  * commits (zero data files rewritten).
  */
class LakeCatalogSpec extends SparkTestBase {
  import spark.implicits._

  // UNIQUE name per suite instance: Spark's CatalogManager caches the
  // catalog instance by name on first use — for the whole JVM, which
  // outlives a suite in the sbt shell — so a reused name would keep
  // pointing at a previous run's (retired) root. q141's judged query
  // designs around the same constraint with a JVM-lifetime base.
  private val cat = s"graftcat_spec_${java.util.UUID.randomUUID()
    .toString.take(8)}"

  private lazy val suiteBase: String =
    Files.createTempDirectory("lake_cat_").toString

  private def withCatalog(body: String => Unit): Unit = {
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.GraftLakeCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", suiteBase)
    body(suiteBase)
  }

  test("pure-SQL lifecycle: create, insert, alter, time travel, drop") {
    withCatalog { base =>
      spark.sql(s"""
        CREATE TABLE $cat.t1 (k BIGINT, cents BIGINT)
        TBLPROPERTIES ('statCol' = 'k')""")
      assert(spark.sql(s"SHOW TABLES IN $cat").count() === 1L)
      // empty table is selectable before any insert
      assert(spark.table(s"$cat.t1").count() === 0L)
      spark.sql(s"INSERT INTO $cat.t1 SELECT id, id * 7 FROM range(100)")
      assert(spark.table(s"$cat.t1").count() === 100L)
      val root = s"$base/t1"
      val filesV0 = SnapshotLake.snapshot(root).files.size
      // ALTER: rename is metadata-only
      spark.sql(s"ALTER TABLE $cat.t1 RENAME COLUMN cents TO amount")
      assert(SnapshotLake.snapshot(root).files.size === filesV0)
      assert(spark.table(s"$cat.t1").columns.toSeq === Seq("k", "amount"))
      assert(spark.sql(s"SELECT sum(amount) FROM $cat.t1")
        .head.getLong(0) === (0L until 100L).map(_ * 7).sum)
      // ALTER: add column, null-filled on old files
      spark.sql(s"ALTER TABLE $cat.t1 ADD COLUMN note STRING")
      assert(spark.table(s"$cat.t1").columns.toSeq ===
        Seq("k", "amount", "note"))
      assert(spark.table(s"$cat.t1").where(col("note").isNull).count()
        === 100L)
      spark.sql(
        s"INSERT INTO $cat.t1 SELECT id, id, 'x' FROM range(100, 110)")
      assert(spark.table(s"$cat.t1").where(col("note") === "x").count()
        === 10L)
      // ALTER: drop is logical; the retired slot refuses reuse
      spark.sql(s"ALTER TABLE $cat.t1 DROP COLUMN note")
      assert(spark.table(s"$cat.t1").columns.toSeq === Seq("k", "amount"))
      // time travel reads v0 under its ORIGINAL column names
      val v0 = spark.sql(s"SELECT * FROM $cat.t1 VERSION AS OF 0")
      assert(v0.columns.toSeq === Seq("k", "cents"))
      assert(v0.count() === 100L)
      // DROP TABLE removes it
      spark.sql(s"DROP TABLE $cat.t1")
      assert(spark.sql(s"SHOW TABLES IN $cat").count() === 0L)
    }
  }

  test("row-level SQL DML works through catalog identifiers") {
    withCatalog { base =>
      spark.sql(s"""
        CREATE TABLE $cat.t2 (k BIGINT, v BIGINT)
        TBLPROPERTIES ('statCol' = 'k')""")
      spark.sql(s"INSERT INTO $cat.t2 SELECT id, id * 7 FROM range(100)")
      spark.sql(s"UPDATE $cat.t2 SET v = 0 WHERE k >= 90")
      assert(spark.sql(s"SELECT sum(v) FROM $cat.t2").head.getLong(0)
        === (0L until 90L).map(_ * 7).sum)
      spark.sql(s"DELETE FROM $cat.t2 WHERE k >= 50 AND k < 60")
      assert(spark.table(s"$cat.t2").count() === 90L)
      Seq((5L, 1L), (200L, 2L)).toDF("k", "v")
        .createOrReplaceTempView("cat_src")
      spark.sql(s"""
        MERGE INTO $cat.t2 t USING cat_src s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET v = s.v
        WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
      assert(spark.table(s"$cat.t2").count() === 91L)
      assert(spark.table(s"$cat.t2").where(col("k") === 5L)
        .head.getLong(1) === 1L)
      spark.sql(s"DROP TABLE $cat.t2")
    }
  }

  test("ALTER on an uncommitted table edits the declared schema") {
    withCatalog { _ =>
      spark.sql(s"""
        CREATE TABLE $cat.t3 (a BIGINT, b BIGINT)
        TBLPROPERTIES ('statCol' = 'a')""")
      spark.sql(s"ALTER TABLE $cat.t3 RENAME COLUMN b TO c")
      spark.sql(s"ALTER TABLE $cat.t3 ADD COLUMN d STRING")
      assert(spark.table(s"$cat.t3").columns.toSeq === Seq("a", "c", "d"))
      // first insert bootstraps under the ALTERed shape
      spark.sql(s"INSERT INTO $cat.t3 SELECT id, id, 'z' FROM range(5)")
      assert(spark.table(s"$cat.t3").count() === 5L)
      spark.sql(s"DROP TABLE $cat.t3")
    }
  }

  test("CALL procedures: optimize packs, vacuum reclaims, restore rolls back") {
    withCatalog { base =>
      spark.sql(s"""
        CREATE TABLE $cat.t6 (k BIGINT, v BIGINT)
        TBLPROPERTIES ('statCol' = 'k')""")
      // 4 small single-slice inserts → 4 small files
      (0 until 4).foreach(i => spark.sql(
        s"INSERT INTO $cat.t6 SELECT id, id FROM range(${i * 10}, ${i * 10 + 10}, 1, 1)"))
      val root = s"$base/t6"
      assert(SnapshotLake.snapshot(root).files.size === 4)
      val opt = spark.sql(
        s"CALL $cat.optimize(table => 't6', target_rows => 1000)").collect()
      assert(opt.length === 1)
      assert(opt(0).getLong(1) === 4L && opt(0).getLong(2) === 1L,
        s"optimize metrics: ${opt(0)}")
      assert(SnapshotLake.snapshot(root).files.size === 1)
      assert(spark.table(s"$cat.t6").count() === 40L)
      // restore to the 2-insert state
      val res = spark.sql(
        s"CALL $cat.restore(table => 't6', version => 1)").collect()
      assert(res(0).getLong(0) === SnapshotLake.headVersion(root).toLong)
      assert(spark.table(s"$cat.t6").count() === 20L)
      // vacuum keeps the head reconstructible and reports metrics
      val vac = spark.sql(
        s"CALL $cat.vacuum(table => 't6', keep_versions => 1)").collect()
      assert(vac.length === 1)
      assert(spark.table(s"$cat.t6").count() === 20L)
      // unknown procedure refuses loudly
      intercept[Exception] {
        spark.sql(s"CALL $cat.nonsense(table => 't6')")
      }
      spark.sql(s"DROP TABLE $cat.t6")
    }
  }

  test("CALL restore_to_timestamp rolls data back to the version " +
      "live at the instant (the TIMESTAMP AS OF rule), as a new " +
      "head commit") {
    withCatalog { base =>
      spark.sql(s"""
        CREATE TABLE $cat.rts (k BIGINT, v BIGINT)
        TBLPROPERTIES ('statCol' = 'k')""")
      spark.sql(s"INSERT INTO $cat.rts SELECT id, id FROM range(10)")
      val root = s"$base/rts"
      // publish ts resolution is millisecond-grained: stamp BETWEEN
      // the commits so the instant is unambiguous
      Thread.sleep(5)
      val between = System.currentTimeMillis()
      Thread.sleep(5)
      spark.sql(s"INSERT INTO $cat.rts SELECT id, id FROM range(10, 30)")
      assert(spark.table(s"$cat.rts").count() === 30L)
      val r = spark.sql(s"CALL $cat.restore_to_timestamp(" +
        s"table => 'rts', ts_ms => $between)").head
      assert(r.getLong(0) === 0L) // resolved: the v0-at-instant
      assert(r.getLong(1) === SnapshotLake.headVersion(root).toLong)
      assert(spark.table(s"$cat.rts").count() === 10L)
      // a pre-history instant refuses with a clear error
      val e = intercept[Exception](spark.sql(
        s"CALL $cat.restore_to_timestamp(table => 'rts', ts_ms => 1)")
        .collect())
      assert(e.getMessage != null)
      spark.sql(s"DROP TABLE $cat.rts")
    }
  }

  test("TIMESTAMP AS OF resolves to the version live at that instant") {
    withCatalog { base =>
      spark.sql(s"""
        CREATE TABLE $cat.t7 (k BIGINT, v BIGINT)
        TBLPROPERTIES ('statCol' = 'k')""")
      spark.sql(s"INSERT INTO $cat.t7 SELECT id, id FROM range(10)")
      Thread.sleep(25)
      val mid = System.currentTimeMillis()
      Thread.sleep(25)
      spark.sql(s"INSERT INTO $cat.t7 SELECT id, id FROM range(10, 30)")
      val root = s"$base/t7"
      assert(SnapshotLake.versionAt(root, mid) === 0)
      assert(SnapshotLake.versionAt(root, System.currentTimeMillis()) === 1)
      val midStr = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
        .withZone(java.time.ZoneOffset.UTC)
        .format(java.time.Instant.ofEpochMilli(mid))
      assert(spark.sql(
        s"SELECT * FROM $cat.t7 TIMESTAMP AS OF '$midStr'").count() === 10L)
      // an instant before the first commit refuses with a clear error
      val err = intercept[Exception] {
        spark.sql(s"SELECT * FROM $cat.t7 TIMESTAMP AS OF '1999-01-01'")
          .count()
      }
      assert(err.getMessage.contains("no committed version"),
        s"wanted the versionAt refusal, got: ${err.getMessage}")
      spark.sql(s"DROP TABLE $cat.t7")
    }
  }

  test("writeStream.toTable lands exactly-once commits in a catalog table") {
    withCatalog { base =>
      spark.sql(s"""
        CREATE TABLE $cat.t8 (k BIGINT, v BIGINT)
        TBLPROPERTIES ('statCol' = 'k')""")
      val src = java.nio.file.Files.createTempDirectory("cat_stream_src_")
        .toString
      val ckpt = java.nio.file.Files.createTempDirectory("cat_stream_ck_")
        .toString
      import spark.implicits._
      (0L until 50L).map(i => (i, i * 3)).toDF("k", "v")
        .coalesce(1).write.parquet(s"$src/b0")
      val q = spark.readStream
        .schema("k BIGINT, v BIGINT").parquet(s"$src/*")
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .toTable(s"$cat.t8")
      assert(q.awaitTermination(120000), "stream did not self-terminate")
      assert(spark.table(s"$cat.t8").count() === 50L)
      assert(spark.table(s"$cat.t8").agg(sum(col("v"))).head.getLong(0)
        === (0L until 50L).map(_ * 3).sum)
      // a second batch appends; the first is not re-landed (the sink's
      // txn map swallows replays)
      (50L until 60L).map(i => (i, i * 3)).toDF("k", "v")
        .coalesce(1).write.parquet(s"$src/b1")
      val q2 = spark.readStream
        .schema("k BIGINT, v BIGINT").parquet(s"$src/*")
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .toTable(s"$cat.t8")
      assert(q2.awaitTermination(120000))
      assert(spark.table(s"$cat.t8").count() === 60L)
      spark.sql(s"DROP TABLE $cat.t8")
    }
  }

  test("CTAS is atomic: the staged path engages, a failed SELECT strands no table") {
    withCatalog { base =>
      // the staged (atomic) exec must be chosen, not the
      // create-then-insert fallback
      val explained = spark.sql(s"""
        EXPLAIN CREATE TABLE $cat.t9 TBLPROPERTIES ('statCol' = 'k')
        AS SELECT id AS k, id * 7 AS cents FROM range(10)""")
        .head.getString(0)
      assert(explained.contains("AtomicCreateTableAsSelect"),
        s"CTAS fell back to the non-atomic path:\n$explained")
      spark.sql(s"""
        CREATE TABLE $cat.t9 TBLPROPERTIES ('statCol' = 'k')
        AS SELECT id AS k, id * 7 AS cents FROM range(100)""")
      assert(spark.table(s"$cat.t9").count() === 100L)
      assert(spark.sql(s"SELECT sum(cents) FROM $cat.t9")
        .head.getLong(0) === (0L until 100L).map(_ * 7).sum)
      // the CTAS commit is a real chain head: appends continue it
      spark.sql(s"INSERT INTO $cat.t9 SELECT id, id FROM range(100, 110)")
      assert(spark.table(s"$cat.t9").count() === 110L)
      // a CTAS whose SELECT fails mid-write leaves NO table — neither
      // a manifest nor a sidecar
      val boom = udf((i: Long) =>
        if (i > 5) throw new RuntimeException("boom") else i)
      spark.udf.register("ctas_boom", boom)
      intercept[Exception] {
        spark.sql(s"""
          CREATE TABLE $cat.t10 TBLPROPERTIES ('statCol' = 'k')
          AS SELECT ctas_boom(id) AS k FROM range(1000000)""")
      }
      assert(!spark.catalog.tableExists(s"$cat.t10"),
        "failed CTAS stranded a table")
      assert(spark.sql(s"SHOW TABLES IN $cat")
        .where(col("tableName") === "t10").count() === 0L)
      spark.sql(s"DROP TABLE $cat.t9")
    }
  }

  test("RTAS swaps contents in one commit; time travel keeps the old version") {
    withCatalog { base =>
      spark.sql(s"""
        CREATE TABLE $cat.t11 TBLPROPERTIES ('statCol' = 'k')
        AS SELECT id AS k, id * 3 AS v FROM range(50)""")
      val root = s"$base/t11"
      val headBefore = SnapshotLake.headVersion(root)
      spark.sql(s"""
        REPLACE TABLE $cat.t11 TBLPROPERTIES ('statCol' = 'k')
        AS SELECT id AS k, id * 100 AS v FROM range(20)""")
      // ONE commit: old head + 1
      assert(SnapshotLake.headVersion(root) === headBefore + 1)
      assert(spark.table(s"$cat.t11").count() === 20L)
      assert(spark.sql(s"SELECT sum(v) FROM $cat.t11")
        .head.getLong(0) === (0L until 20L).map(_ * 100).sum)
      // the pre-replace contents stay time-travelable
      assert(spark.sql(
        s"SELECT count(*) FROM $cat.t11 VERSION AS OF $headBefore")
        .head.getLong(0) === 50L)
      // CREATE OR REPLACE on a table that doesn't exist yet creates it
      spark.sql(s"""
        CREATE OR REPLACE TABLE $cat.t12
        TBLPROPERTIES ('statCol' = 'k')
        AS SELECT id AS k FROM range(7)""")
      assert(spark.table(s"$cat.t12").count() === 7L)
      // an empty-result CTAS still creates a loadable, empty table
      spark.sql(s"""
        CREATE TABLE $cat.t13 TBLPROPERTIES ('statCol' = 'k')
        AS SELECT id AS k, id * 2 AS v FROM range(10) WHERE id < 0""")
      assert(spark.table(s"$cat.t13").count() === 0L)
      assert(spark.table(s"$cat.t13").columns.toSeq === Seq("k", "v"))
      Seq("t11", "t12", "t13").foreach(t =>
        spark.sql(s"DROP TABLE $cat.$t"))
    }
  }

  test("CALL history returns the audit trail: one row per version with its verb") {
    withCatalog { _ =>
      spark.sql(s"""
        CREATE TABLE $cat.t14 TBLPROPERTIES ('statCol' = 'k')
        AS SELECT id AS k, id * 2 AS v FROM range(40)""")
      spark.sql(s"INSERT INTO $cat.t14 SELECT id, id FROM range(40, 60)")
      spark.sql(
        s"INSERT OVERWRITE $cat.t14 SELECT id, id * 5 FROM range(10)")
      spark.sql(
        s"CALL $cat.optimize(table => 't14', target_rows => 1000000)")
      val hist = spark.sql(s"CALL $cat.history(table => 't14')")
        .orderBy(col("version")).collect()
      assert(hist.map(_.getLong(0)).toSeq === Seq(0L, 1L, 2L, 3L))
      assert(hist.map(_.getString(1)).toSeq ===
        Seq("append", "append", "overwrite", "compact"))
      // row counts track each version's LIVE contents
      assert(hist.map(_.getLong(3)).toSeq === Seq(40L, 60L, 10L, 10L))
      spark.sql(s"DROP TABLE $cat.t14")
    }
  }

  test("readStream.table streams a catalog table's commits exactly once") {
    withCatalog { _ =>
      spark.sql(s"""
        CREATE TABLE $cat.t15 TBLPROPERTIES ('statCol' = 'k')
        AS SELECT id AS k, id * 3 AS v FROM range(30)""")
      val ckpt = java.nio.file.Files
        .createTempDirectory("cat_rstream_ck_").toString
      val sinkDir = java.nio.file.Files
        .createTempDirectory("cat_rstream_out_").toString
      def drain(): Unit = {
        val q = spark.readStream.table(s"$cat.t15")
          .writeStream
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .format("parquet").option("path", sinkDir)
          .outputMode("append").start()
        assert(q.awaitTermination(120000), "stream did not self-terminate")
      }
      def landed() = spark.read.parquet(sinkDir)
      drain()
      assert(landed().count() === 30L)
      // a second commit streams incrementally: only the new rows land
      spark.sql(s"INSERT INTO $cat.t15 SELECT id, id * 3 FROM range(30, 45)")
      drain()
      assert(landed().count() === 45L)
      assert(landed().agg(sum(col("v"))).head.getLong(0)
        === (0L until 45L).map(_ * 3).sum)
      spark.sql(s"DROP TABLE $cat.t15")
    }
  }

  test("RENAME TABLE moves the lake; CREATE refuses an existing name") {
    withCatalog { _ =>
      spark.sql(s"""
        CREATE TABLE $cat.t4 (k BIGINT, v BIGINT)
        TBLPROPERTIES ('statCol' = 'k')""")
      spark.sql(s"INSERT INTO $cat.t4 SELECT id, id FROM range(10)")
      spark.sql(s"ALTER TABLE $cat.t4 RENAME TO t5")
      assert(spark.table(s"$cat.t5").count() === 10L)
      intercept[Exception] {
        spark.sql(s"""
          CREATE TABLE $cat.t5 (x BIGINT) TBLPROPERTIES ('statCol' = 'x')""")
      }
      spark.sql(s"DROP TABLE $cat.t5")
    }
  }
}
