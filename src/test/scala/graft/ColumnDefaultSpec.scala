package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{SnapshotLake, Tables}

/** Column DEFAULT values over the lake catalog (DSv2
  * SUPPORT_COLUMN_DEFAULT_VALUE + the ResolveDefaultColumns field
  * metadata): CURRENT_DEFAULT fills future INSERTs that omit the
  * column; EXISTS_DEFAULT serves for every data file missing the
  * column's bytes. Both ride the schema JSON through the manifest,
  * so ADD COLUMN ... DEFAULT stays metadata-only.
  */
class ColumnDefaultSpec extends SparkTestBase {
  import spark.implicits._

  private val cat = s"graftdf_${java.util.UUID.randomUUID()
    .toString.take(8)}"

  private lazy val suiteBase: String =
    Files.createTempDirectory("df_cat_").toString

  private def withCatalog(body: => Unit): Unit = {
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.GraftLakeCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", suiteBase)
    body
  }

  private def ev = Tables.events(spark, sf("sf0.001"))
    .select(col("event_id"),
      round(col("value") * 100).cast("long").as("cents"))

  test("CREATE TABLE with DEFAULT: omitted column fills; the " +
      "default survives the first commit") {
    withCatalog {
      ev.createOrReplaceTempView("df_ev1")
      spark.sql(s"""
        CREATE TABLE $cat.t1 (
          event_id BIGINT, cents BIGINT, src STRING DEFAULT 'legacy')
        TBLPROPERTIES ('statCol' = 'event_id')""")
      spark.sql(
        s"INSERT INTO $cat.t1 (event_id, cents) SELECT * FROM df_ev1")
      // the fill happened at write time (column materialized)
      assert(spark.table(s"$cat.t1").where(col("src") === "legacy")
        .count() === ev.count())
      // the manifest's recorded schema must STILL carry the current
      // default — a second subset INSERT after the first commit is
      // the regression this pins (losing the metadata on the first
      // schema stamp would fail it with "no default value")
      val manifestField = SnapshotLake.snapshot(s"$suiteBase/t1")
        .schema.get.fields.find(_.name == "src").get
      assert(manifestField.getCurrentDefaultValue() === Some("'legacy'"))
      spark.sql(s"""
        INSERT INTO $cat.t1 (event_id, cents)
        VALUES (9999991, 1), (9999992, 2)""")
      assert(spark.table(s"$cat.t1")
        .where(col("event_id") > 9999990L && col("src") === "legacy")
        .count() === 2)
      // an explicit NULL stays NULL (the fill is for OMITTED columns)
      spark.sql(s"INSERT INTO $cat.t1 VALUES (9999993, 3, NULL)")
      assert(spark.table(s"$cat.t1").where(col("src").isNull)
        .count() === 1)
    }
  }

  test("ADD COLUMN ... DEFAULT is metadata-only; old files read the " +
      "existence default, new inserts the current default") {
    withCatalog {
      ev.createOrReplaceTempView("df_ev2")
      spark.sql(s"""
        CREATE TABLE $cat.t2 (event_id BIGINT, cents BIGINT)
        TBLPROPERTIES ('statCol' = 'event_id')""")
      spark.sql(s"INSERT INTO $cat.t2 SELECT * FROM df_ev2")
      val before = SnapshotLake.snapshot(s"$suiteBase/t2")
      spark.sql(
        s"ALTER TABLE $cat.t2 ADD COLUMN src STRING DEFAULT 'legacy'")
      val after = SnapshotLake.snapshot(s"$suiteBase/t2")
      // metadata-only: same files, one new version
      assert(after.version === before.version + 1)
      assert(after.files.map(_.name) === before.files.map(_.name))
      // every pre-evolution row reads the EXISTS default, not null
      assert(spark.table(s"$cat.t2").where(col("src") === "legacy")
        .count() === ev.count())
      assert(spark.table(s"$cat.t2").where(col("src").isNull)
        .count() === 0)
      // new subset insert takes the CURRENT default
      spark.sql(
        s"INSERT INTO $cat.t2 (event_id, cents) VALUES (9999991, 1)")
      assert(spark.table(s"$cat.t2").where(col("src") === "legacy")
        .count() === ev.count() + 1)
      // aggregation over the filled column groups correctly
      val g = spark.table(s"$cat.t2").groupBy(col("src"))
        .agg(count(lit(1)).as("n")).collect()
      assert(g.length === 1 && g.head.getLong(1) === ev.count() + 1)
      // time travel BEFORE the evolution shows the old 2-column schema
      assert(spark.sql(
        s"SELECT * FROM $cat.t2 VERSION AS OF ${before.version}")
        .schema.fieldNames.toSeq === Seq("event_id", "cents"))
    }
  }

  test("SET DEFAULT governs future inserts only; DROP DEFAULT makes " +
      "the column required again; exists fill is untouched by both") {
    withCatalog {
      spark.sql(s"""
        CREATE TABLE $cat.t3 (event_id BIGINT, cents BIGINT)
        TBLPROPERTIES ('statCol' = 'event_id')""")
      spark.sql(s"INSERT INTO $cat.t3 VALUES (1, 10), (2, 20)")
      spark.sql(
        s"ALTER TABLE $cat.t3 ADD COLUMN src STRING DEFAULT 'legacy'")
      spark.sql(s"ALTER TABLE $cat.t3 ALTER COLUMN src SET DEFAULT 'fresh'")
      spark.sql(s"INSERT INTO $cat.t3 (event_id, cents) VALUES (3, 30)")
      val bySrc = spark.table(s"$cat.t3")
        .groupBy(col("src")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // old files keep their birth-time EXISTS fill; the new insert
      // takes the updated CURRENT default
      assert(bySrc === Map("legacy" -> 2L, "fresh" -> 1L))
      spark.sql(s"ALTER TABLE $cat.t3 ALTER COLUMN src DROP DEFAULT")
      // with the CURRENT default dropped, a subset insert null-fills
      // (spark.sql.defaultColumn.useNullsForMissingDefaultValues) —
      // 'fresh' appearing here would mean DROP DEFAULT didn't take
      spark.sql(s"INSERT INTO $cat.t3 (event_id, cents) VALUES (4, 40)")
      assert(spark.table(s"$cat.t3").where(col("event_id") === 4)
        .select(col("src")).collect().head.isNullAt(0))
      // dropping the CURRENT default does not disturb the exists fill
      assert(spark.table(s"$cat.t3").where(col("src") === "legacy")
        .count() === 2)
    }
  }

  test("CoW UPDATE on a defaulted table materializes the exists " +
      "default in rewritten files; RENAME keeps both defaults") {
    withCatalog {
      spark.sql(s"""
        CREATE TABLE $cat.t4 (event_id BIGINT, cents BIGINT)
        TBLPROPERTIES ('statCol' = 'event_id')""")
      spark.sql(s"INSERT INTO $cat.t4 VALUES (1, 10), (2, 20), (3, 30)")
      spark.sql(
        s"ALTER TABLE $cat.t4 ADD COLUMN src STRING DEFAULT 'legacy'")
      // the CoW rewrite reads old files (no src bytes) — the rewrite
      // must fill 'legacy', not null, for both touched and untouched
      // rows of the rewritten file
      spark.sql(s"UPDATE $cat.t4 SET cents = cents + 1 WHERE event_id = 2")
      val rows = spark.table(s"$cat.t4").orderBy(col("event_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      assert(rows === Array((1L, 10L, "legacy"), (2L, 21L, "legacy"),
        (3L, 30L, "legacy")))
      // rename keeps the default metadata (it rides the field through
      // column mapping)
      spark.sql(s"ALTER TABLE $cat.t4 RENAME COLUMN src TO origin")
      spark.sql(s"INSERT INTO $cat.t4 (event_id, cents) VALUES (4, 40)")
      assert(spark.table(s"$cat.t4").where(col("origin") === "legacy")
        .count() === 4)
    }
  }

  test("non-string defaults: BIGINT and DOUBLE round-trip the " +
      "literal SQL encoding") {
    withCatalog {
      spark.sql(s"""
        CREATE TABLE $cat.t5 (event_id BIGINT)
        TBLPROPERTIES ('statCol' = 'event_id')""")
      spark.sql(s"INSERT INTO $cat.t5 VALUES (1), (2)")
      spark.sql(s"ALTER TABLE $cat.t5 ADD COLUMN w BIGINT DEFAULT 42")
      spark.sql(s"ALTER TABLE $cat.t5 ADD COLUMN f DOUBLE DEFAULT 2.5")
      val rows = spark.table(s"$cat.t5").orderBy(col("event_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(rows === Array((1L, 42L, 2.5), (2L, 42L, 2.5)))
      spark.sql(s"INSERT INTO $cat.t5 (event_id) VALUES (3)")
      assert(spark.table(s"$cat.t5").where(col("event_id") === 3L)
        .select(col("w"), col("f")).collect().map(r =>
          (r.getLong(0), r.getDouble(1))).head === ((42L, 2.5)))
    }
  }
}
