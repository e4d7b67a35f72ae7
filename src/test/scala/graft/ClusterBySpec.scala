package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{LakeScan, SnapshotLake, Tables}

/** `CREATE TABLE ... CLUSTER BY (x, y)` records the clustering
  * intent; `CALL <cat>.cluster(...)` applies the Morton re-layout;
  * the DSv2 scan's 2-D prune then answers box predicates from the
  * manifest. Delta's liquid-clustering split of declare vs apply.
  */
class ClusterBySpec extends SparkTestBase {
  import spark.implicits._

  private val cat = s"graftcb_${java.util.UUID.randomUUID()
    .toString.take(8)}"

  private lazy val suiteBase: String =
    Files.createTempDirectory("cb_cat_").toString

  private def withCatalog(body: => Unit): Unit = {
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.GraftLakeCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", suiteBase)
    body
  }

  private def ev = Tables.events(spark, sf("sf0.001")).select(
    col("user_id"),
    expr("CAST(CAST(ts AS BIGINT) div 86400 AS BIGINT)").as("dy"),
    round(col("value") * 100).cast("long").as("cents"))

  test("CLUSTER BY lifecycle: DDL records, CALL cluster lays out, " +
      "2-D box predicate prunes through the DSv2 scan") {
    withCatalog {
      ev.createOrReplaceTempView("cb_ev")
      spark.sql(s"""
        CREATE TABLE $cat.t (user_id BIGINT, dy BIGINT, cents BIGINT)
        CLUSTER BY (user_id, dy)
        TBLPROPERTIES ('statCol' = 'user_id')""")
      spark.sql(s"INSERT INTO $cat.t SELECT * FROM cb_ev")
      val rows = ev.count()
      val r = spark.sql(s"""
        CALL $cat.cluster(table => 't',
          target_rows => ${(rows + 15) / 16})""").collect().head
      assert(r.getLong(3) === 16L) // buckets
      val snap = SnapshotLake.snapshot(s"$suiteBase/t")
      assert(snap.files.size === 16)
      assert(snap.statCol2 === Some("dy"))
      // every file carries a dim2 box after clustering
      assert(snap.files.forall(_.dim2.isDefined))
      // history shows the cluster op
      assert(spark.sql(s"CALL $cat.history(table => 't')")
        .collect().map(_.getString(1)).contains("cluster"))
      // box predicate through SQL: exactly the q96 lattice buckets
      val b = ev.agg(min(col("user_id")), max(col("user_id")),
        min(col("dy")), max(col("dy"))).head()
      def ceilDiv(a: Long, q: Long): Long = (a + q - 1) / q
      val xq = b.getLong(0) +
        ceilDiv(32768L * (b.getLong(1) - b.getLong(0)), 65535L)
      val yq = b.getLong(2) +
        ceilDiv(16384L * (b.getLong(3) - b.getLong(2)), 65535L)
      val boxed = spark.table(s"$cat.t")
        .where(col("user_id") >= xq && col("dy") < yq)
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("c"))
      val agg = boxed.collect().head
      val scan = LakeScan.findIn(boxed.queryExecution.executedPlan).get
      assert(scan.effectiveFiles.size === 2)
      // row parity with the unpruned computation
      val expect = ev.where(col("user_id") >= xq && col("dy") < yq)
        .agg(count(lit(1)), sum(col("cents"))).head()
      assert(agg.getLong(0) === expect.getLong(0))
      assert(agg.getLong(1) === expect.getLong(1))
      // appends after clustering stay readable and carry dim2 boxes
      // (the sidecar's statcol2 write option)
      spark.sql(s"INSERT INTO $cat.t VALUES (1, 1, 5)")
      assert(spark.table(s"$cat.t").count() === rows + 1)
    }
  }

  test("cluster procedure refuses an unclustered table; CLUSTER BY " +
      "refuses one column or PARTITIONED BY combination") {
    withCatalog {
      spark.sql(s"""
        CREATE TABLE $cat.plain (id BIGINT)
        TBLPROPERTIES ('statCol' = 'id')""")
      spark.sql(s"INSERT INTO $cat.plain VALUES (1)")
      val e = intercept[Exception] {
        spark.sql(s"CALL $cat.cluster(table => 'plain', target_rows => 10)")
          .collect()
      }
      assert(e.getMessage.contains("no clustering columns"))
      val e2 = intercept[Exception] {
        spark.sql(s"""
          CREATE TABLE $cat.one (id BIGINT, v BIGINT)
          CLUSTER BY (id)
          TBLPROPERTIES ('statCol' = 'id')""")
      }
      assert(e2.getMessage.contains("exactly two columns"))
    }
  }
}
