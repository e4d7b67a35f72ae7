package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{LakeScan, SnapshotLake, Tables}

/** The DSv2 partitioned WRITE path: `PARTITIONED BY` /
  * `option("partcol", …)` routes the write through
  * RequiresDistributionAndOrdering (Spark plans the cluster+sort),
  * task writers roll one single-valued file per value run, publish
  * tags each file in the manifest, and reads prune/SPJ on the tags.
  */
class PartitionedWriteSpec extends SparkTestBase {
  import spark.implicits._

  private val cat = s"graftpw_${java.util.UUID.randomUUID()
    .toString.take(8)}"

  // ONE root per suite: CatalogManager caches the instance by name
  // with the root it was first initialized with
  private lazy val suiteBase: String =
    Files.createTempDirectory("pw_cat_").toString

  private def withCatalog(body: => Unit): Unit = {
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.GraftLakeCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", suiteBase)
    body
  }

  private def ev = Tables.events(spark, sf("sf0.001"))
    .select(col("event_id"), (col("event_id") % 4).as("bucket4"),
      round(col("value") * 100).cast("long").as("cents"))

  test("path-based partitioned write tags one file per value") {
    val root = Files.createTempDirectory("pw_path_").toString
    ev.write.format("graft.sources.GraftLakeSource")
      .mode("append")
      .option("path", root)
      .option("statCol", "event_id").option("partcol", "bucket4")
      .save()
    val snap = SnapshotLake.snapshot(root)
    assert(snap.files.size === 4)
    assert(snap.files.forall(_.part.exists(_._1 == "bucket4")))
    assert(snap.files.flatMap(_.part.map(_._2)).sorted ===
      Seq("0", "1", "2", "3"))
    // row parity through the connector
    val back = spark.read.format("graft.sources.GraftLakeSource")
      .option("path", root).load()
    assert(back.count() === ev.count())
    assert(back.agg(sum(col("cents"))).collect().head.getLong(0) ===
      ev.agg(sum(col("cents"))).collect().head.getLong(0))
  }

  test("SQL lifecycle: CREATE PARTITIONED BY, INSERT, pruned read, " +
      "declared partitioning") {
    withCatalog {
      ev.createOrReplaceTempView("pw_events")
      spark.sql(s"""
        CREATE TABLE $cat.t (event_id BIGINT, bucket4 BIGINT, cents BIGINT)
        PARTITIONED BY (bucket4)
        TBLPROPERTIES ('statCol' = 'event_id')""")
      spark.sql(s"""
        INSERT INTO $cat.t SELECT event_id, bucket4, cents
        FROM pw_events""").collect()
      // declared partitioning surfaces on the table
      val parts = spark.sessionState.catalogManager
        .catalog(cat)
        .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
        .loadTable(org.apache.spark.sql.connector.catalog.Identifier
          .of(Array.empty, "t"))
        .partitioning()
      assert(parts.length === 1 && parts(0).toString.contains("bucket4"))
      // partition-pruned aggregate: one file planned
      val agg = spark.table(s"$cat.t").where(col("bucket4") === 1L)
        .agg(count(lit(1)).as("n"))
      val n = agg.collect().head.getLong(0)
      assert(n === ev.where(col("bucket4") === 1L).count())
      val scan = LakeScan.findIn(agg.queryExecution.executedPlan)
        .getOrElse(fail("no LakeScan"))
      assert(scan.files.length === 1,
        s"partition prune should plan 1 file: ${scan.description()}")
    }
  }

  test("a single task rolls files on value change (clustered+sorted " +
      "input)") {
    // 2 values through ONE shuffle partition: rolling must still
    // produce one file per value
    val root = Files.createTempDirectory("pw_roll_").toString
    val two = ev.where(col("bucket4") < 2)
    withSQLConf("spark.sql.shuffle.partitions" -> "1") {
      two.write.format("graft.sources.GraftLakeSource")
        .mode("append")
        .option("path", root)
        .option("statCol", "event_id").option("partcol", "bucket4")
        .save()
    }
    val snap = SnapshotLake.snapshot(root)
    assert(snap.files.size === 2)
    assert(snap.files.flatMap(_.part.map(_._2)).sorted === Seq("0", "1"))
  }

  private def withSQLConf(kv: (String, String))(body: => Unit): Unit = {
    val (k, v) = kv
    val old = spark.conf.getOption(k)
    spark.conf.set(k, v)
    try body
    finally old.fold(spark.conf.unset(k))(spark.conf.set(k, _))
  }

  test("null partition values are refused with a clear message") {
    val root = Files.createTempDirectory("pw_null_").toString
    val bad = Seq((1L, Some(0L), 5L), (2L, None, 7L))
      .toDF("event_id", "bucket4", "cents")
    val e = intercept[Exception] {
      bad.write.format("graft.sources.GraftLakeSource")
        .mode("append")
        .option("path", root)
        .option("statCol", "event_id").option("partcol", "bucket4")
        .save()
    }
    assert(e.getMessage != null)
    // no partial table: nothing was published
    assert(SnapshotLake.headVersion(root) === -1)
  }

  test("CTAS still refuses PARTITIONED BY with a clear message") {
    withCatalog {
      ev.createOrReplaceTempView("pw_events2")
      val e = intercept[Exception] {
        spark.sql(s"""
          CREATE TABLE $cat.ctas PARTITIONED BY (bucket4)
          TBLPROPERTIES ('statCol' = 'event_id')
          AS SELECT * FROM pw_events2""")
      }
      assert(e.getMessage.contains("PARTITIONED BY"))
    }
  }

  test("partition DELETE is metadata-only on a fully tagged table") {
    withCatalog {
      ev.createOrReplaceTempView("pw_del")
      spark.sql(s"""
        CREATE TABLE $cat.del (event_id BIGINT, bucket4 BIGINT, cents BIGINT)
        PARTITIONED BY (bucket4) TBLPROPERTIES ('statCol' = 'event_id')""")
      spark.sql(s"INSERT INTO $cat.del SELECT * FROM pw_del").collect()
      val before = SnapshotLake.snapshot(s"$suiteBase/del").files
      spark.sql(s"DELETE FROM $cat.del WHERE bucket4 IN (1, 3)")
      val after = SnapshotLake.snapshot(s"$suiteBase/del").files
      assert(after.size === 2)
      // metadata-only: no new file names appeared
      assert(after.map(_.name).toSet.subsetOf(before.map(_.name).toSet))
      assert(spark.table(s"$cat.del").count() ===
        ev.where(col("bucket4") % 2 === 0).count())
    }
  }

  test("partition DELETE declines to metadata on mixed tags and " +
      "still deletes correctly") {
    withCatalog {
      ev.createOrReplaceTempView("pw_mix")
      spark.sql(s"""
        CREATE TABLE $cat.mix (event_id BIGINT, bucket4 BIGINT, cents BIGINT)
        TBLPROPERTIES ('statCol' = 'event_id')""") // NOT partitioned
      spark.sql(s"INSERT INTO $cat.mix SELECT * FROM pw_mix").collect()
      val before = SnapshotLake.snapshot(s"$suiteBase/mix").files
      assert(before.forall(_.part.isEmpty))
      spark.sql(s"DELETE FROM $cat.mix WHERE bucket4 = 3")
      // the row-level CoW fallback rewrote — content is what matters
      assert(spark.table(s"$cat.mix").count() ===
        ev.where(col("bucket4") =!= 3).count())
    }
  }

  test("INSERT OVERWRITE PARTITION swaps exactly that partition") {
    withCatalog {
      ev.createOrReplaceTempView("pw_ow")
      spark.sql(s"""
        CREATE TABLE $cat.ow (event_id BIGINT, bucket4 BIGINT, cents BIGINT)
        PARTITIONED BY (bucket4) TBLPROPERTIES ('statCol' = 'event_id')""")
      spark.sql(s"INSERT INTO $cat.ow SELECT * FROM pw_ow").collect()
      spark.sql(s"""
        INSERT OVERWRITE $cat.ow PARTITION (bucket4 = 1)
        SELECT event_id, cents * 100 FROM pw_ow WHERE bucket4 = 1""")
        .collect()
      val snap = SnapshotLake.snapshot(s"$suiteBase/ow")
      assert(snap.files.size === 4)
      val got = spark.table(s"$cat.ow")
        .groupBy(col("bucket4")).agg(sum(col("cents")).as("c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = ev.groupBy(col("bucket4")).agg(sum(col("cents")).as("c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got(0L) === want(0L) && got(2L) === want(2L) &&
        got(3L) === want(3L))
      assert(got(1L) === 100L * want(1L))
    }
  }

  test("a mis-scoped partition overwrite is refused before publish") {
    withCatalog {
      ev.createOrReplaceTempView("pw_bad")
      spark.sql(s"""
        CREATE TABLE $cat.bad (event_id BIGINT, bucket4 BIGINT, cents BIGINT)
        PARTITIONED BY (bucket4) TBLPROPERTIES ('statCol' = 'event_id')""")
      spark.sql(s"INSERT INTO $cat.bad SELECT * FROM pw_bad").collect()
      val headBefore = SnapshotLake.snapshot(s"$suiteBase/bad").version
      // DataFrameWriterV2 overwrite(condition) with rows OUTSIDE it
      val e = intercept[Exception] {
        ev.where(col("bucket4") === 2) // rows say bucket 2...
          .writeTo(s"$cat.bad")
          .overwrite(col("bucket4") === lit(1L)) // ...condition says 1
      }
      assert(e.getMessage.contains("outside"))
      assert(SnapshotLake.snapshot(s"$suiteBase/bad").version ===
        headBefore) // nothing published
    }
  }

  test("SHOW PARTITIONS lists manifest tags; DROP PARTITION is " +
      "metadata-only") {
    withCatalog {
      ev.createOrReplaceTempView("pw_sp")
      spark.sql(s"""
        CREATE TABLE $cat.sp (event_id BIGINT, bucket4 BIGINT, cents BIGINT)
        PARTITIONED BY (bucket4) TBLPROPERTIES ('statCol' = 'event_id')""")
      spark.sql(s"INSERT INTO $cat.sp SELECT * FROM pw_sp").collect()
      val parts = spark.sql(s"SHOW PARTITIONS $cat.sp")
        .collect().map(_.getString(0)).sorted
      assert(parts === Array("bucket4=0", "bucket4=1", "bucket4=2",
        "bucket4=3"))
      val filesBefore = SnapshotLake.snapshot(s"$suiteBase/sp").files
      spark.sql(s"ALTER TABLE $cat.sp DROP PARTITION (bucket4 = 2)")
      val after = SnapshotLake.snapshot(s"$suiteBase/sp")
      assert(after.files.size === 3)
      assert(after.files.map(_.name).toSet
        .subsetOf(filesBefore.map(_.name).toSet))
      assert(spark.sql(s"SHOW PARTITIONS $cat.sp")
        .collect().map(_.getString(0)).sorted ===
        Array("bucket4=0", "bucket4=1", "bucket4=3"))
      assert(spark.table(s"$cat.sp").count() ===
        ev.where(col("bucket4") =!= 2).count())
      // dropping a missing partition without IF EXISTS errors; with
      // IF EXISTS it is a no-op
      val e = intercept[Exception] {
        spark.sql(s"ALTER TABLE $cat.sp DROP PARTITION (bucket4 = 9)")
      }
      assert(e.getMessage.toLowerCase.contains("partition"))
      spark.sql(
        s"ALTER TABLE $cat.sp DROP IF EXISTS PARTITION (bucket4 = 9)")
      // ADD PARTITION is refused: partitions are defined by data
      val e2 = intercept[Exception] {
        spark.sql(s"ALTER TABLE $cat.sp ADD PARTITION (bucket4 = 7)")
      }
      assert(e2.getMessage.contains("INSERT creates them"))
    }
  }

  test("SHOW PARTITIONS on an unpartitioned table fails with " +
      "Spark's own clear error") {
    withCatalog {
      spark.sql(s"""
        CREATE TABLE $cat.up (id BIGINT)
        TBLPROPERTIES ('statCol' = 'id')""")
      val e = intercept[Exception] {
        spark.sql(s"SHOW PARTITIONS $cat.up").collect()
      }
      assert(e.getMessage.toLowerCase.contains("partition"))
    }
  }

  test("appends to a partitioned table keep tagging; mixed specs " +
      "stay readable") {
    withCatalog {
      ev.createOrReplaceTempView("pw_events3")
      spark.sql(s"""
        CREATE TABLE $cat.m (event_id BIGINT, bucket4 BIGINT, cents BIGINT)
        PARTITIONED BY (bucket4)
        TBLPROPERTIES ('statCol' = 'event_id')""")
      spark.sql(s"""
        INSERT INTO $cat.m SELECT event_id, bucket4, cents
        FROM pw_events3 WHERE bucket4 < 2""").collect()
      spark.sql(s"""
        INSERT INTO $cat.m SELECT event_id, bucket4, cents
        FROM pw_events3 WHERE bucket4 >= 2""").collect()
      val total = spark.table(s"$cat.m").count()
      assert(total === ev.count())
      // all files tagged across both commits
      val snap = SnapshotLake.snapshot(s"$suiteBase/m")
      assert(snap.files.size === 4)
      assert(snap.files.forall(_.part.isDefined))
    }
  }
}
