package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.{LakeScan, SnapshotLake}

/** GENERATED ALWAYS AS columns: the expression stores as field
  * metadata (persisted through the manifest schema), every batch
  * write is enforced against it via the synthesized CHECK (a
  * disagreeing row throws before a file stages), and a predicate on
  * the SOURCE column derives a partition prune on the generated
  * column — the Delta generated-partition-column pattern.
  */
class GeneratedColumnSpec extends SparkTestBase {
  import spark.implicits._

  private val cat = "graft_gen_cat"
  private lazy val suiteBase: String =
    Files.createTempDirectory("lake_gen_").toString

  private def withCatalog(body: => Unit): Unit = {
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.GraftLakeCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", suiteBase)
    body
  }

  private def plannedFiles(df: org.apache.spark.sql.DataFrame): Int =
    LakeScan.findIn(df.queryExecution.executedPlan)
      .map(_.files.length).getOrElse(-1)

  test("generation expression stores, enforces on write, and survives " +
      "the manifest round-trip") {
    withCatalog {
      spark.sql(s"""
        CREATE TABLE $cat.g1 (
          ts BIGINT, cents BIGINT,
          day BIGINT GENERATED ALWAYS AS (floor(ts / 100)))
        PARTITIONED BY (day)
        TBLPROPERTIES ('statCol' = 'cents')""")
      spark.sql(s"INSERT INTO $cat.g1 " +
        "SELECT id, id * 3, CAST(floor(id / 100) AS BIGINT) " +
        "FROM range(400)")
      assert(spark.table(s"$cat.g1").count() === 400L)
      // a disagreeing row throws via the synthesized CHECK — before
      // any file stages
      val e = intercept[Exception] {
        spark.sql(s"INSERT INTO $cat.g1 VALUES (500, 1, 99)")
      }
      assert(e.getMessage.toLowerCase.contains("check") ||
        e.getMessage.contains("gen_day"), e.getMessage)
      assert(spark.table(s"$cat.g1").count() === 400L)
      // the expression survives the manifest schema round-trip
      val snap = SnapshotLake.snapshot(s"$suiteBase/g1")
      val f = snap.schema.get.fields.find(_.name == "day").get
      assert(org.apache.spark.sql.catalyst.util.GeneratedColumn
        .getGenerationExpression(f).exists(_.contains("floor")))
    }
  }

  test("derived partition pruning: predicates on the SOURCE column " +
      "prune the generated column's tags") {
    withCatalog {
      spark.sql(s"""
        CREATE TABLE $cat.g2 (
          ts BIGINT, cents BIGINT,
          day BIGINT GENERATED ALWAYS AS (floor(ts / 100)))
        PARTITIONED BY (day)
        TBLPROPERTIES ('statCol' = 'cents')""")
      spark.sql(s"INSERT INTO $cat.g2 " +
        "SELECT id + 1000, id, CAST(floor((id + 1000) / 100) AS BIGINT) " +
        "FROM range(800)") // days 10..17, one file each
      assert(SnapshotLake.snapshot(s"$suiteBase/g2").files.size === 8)
      // range on ts (never mentions day): 2 files planned
      val r = spark.table(s"$cat.g2")
        .where(col("ts") >= 1200L && col("ts") < 1400L)
      assert(plannedFiles(r) === 2)
      assert(r.count() === 200L)
      // point predicate: 1 file
      val p = spark.table(s"$cat.g2").where(col("ts") === 1550L)
      assert(plannedFiles(p) === 1)
      assert(p.select("cents").head.getLong(0) === 550L)
      // open range
      val o = spark.table(s"$cat.g2").where(col("ts") > 1699L)
      assert(plannedFiles(o) === 1)
      assert(o.count() === 100L)
      // the prune is PURE: results match the unpruned scan
      assert(spark.table(s"$cat.g2").where(col("ts") >= 1200L &&
        col("ts") < 1400L).agg(sum("cents")).head.getLong(0) ===
        (200L until 400L).sum)
    }
  }

  test("renaming a column referenced by a generation expression is " +
      "refused; unsupported expression forms never prune") {
    withCatalog {
      spark.sql(s"""
        CREATE TABLE $cat.g3 (
          ts BIGINT, cents BIGINT,
          oddity BIGINT GENERATED ALWAYS AS (ts % 7))
        PARTITIONED BY (oddity)
        TBLPROPERTIES ('statCol' = 'cents')""")
      spark.sql(s"INSERT INTO $cat.g3 " +
        "SELECT id, id, id % 7 FROM range(700)")
      val e = intercept[Exception] {
        spark.sql(s"ALTER TABLE $cat.g3 RENAME COLUMN ts TO tstamp")
      }
      assert(e.getMessage.contains("GENERATED"))
      // `ts % 7` is not monotone — no derivation, full scan, exact
      val q = spark.table(s"$cat.g3").where(col("ts") >= 100L)
      assert(plannedFiles(q) === 7)
      assert(q.count() === 600L)
      // the generated column itself may rename (metadata rides it)
      spark.sql(s"ALTER TABLE $cat.g3 RENAME COLUMN oddity TO odd7")
      assert(spark.table(s"$cat.g3").columns.contains("odd7"))
    }
  }
}
