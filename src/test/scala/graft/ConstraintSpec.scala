package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.SnapshotLake

/** DSv2 CHECK constraints on lake catalog tables: persisted as
  * sidecar props, served via `Table.constraints()`, and enforced by
  * SPARK's own write-path validation (ResolveTableConstraints) — a
  * violating INSERT/UPDATE throws before anything publishes.
  */
class ConstraintSpec extends SparkTestBase {

  private val cat = s"graftck_${java.util.UUID.randomUUID()
    .toString.take(8)}"

  private lazy val suiteBase: String =
    Files.createTempDirectory("ck_cat_").toString

  private def withCatalog(body: => Unit): Unit = {
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.GraftLakeCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", suiteBase)
    body
  }

  test("CREATE TABLE with CHECK: valid inserts pass, violations " +
      "throw and publish nothing") {
    withCatalog {
      spark.sql(s"""
        CREATE TABLE $cat.t (
          id BIGINT, cents BIGINT,
          CONSTRAINT positive_cents CHECK (cents >= 0))
        TBLPROPERTIES ('statCol' = 'id')""")
      val served = spark.sessionState.catalogManager.catalog(cat)
        .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
        .loadTable(org.apache.spark.sql.connector.catalog.Identifier
          .of(Array.empty, "t")).constraints()
      assert(served.length === 1)
      assert(served(0).name() === "positive_cents")
      assert(served(0).enforced())
      spark.sql(s"INSERT INTO $cat.t VALUES (1, 100), (2, 0)").collect()
      assert(spark.table(s"$cat.t").count() === 2L)
      val headBefore = SnapshotLake.headVersion(s"$suiteBase/t")
      val e = intercept[Exception] {
        spark.sql(s"INSERT INTO $cat.t VALUES (3, -5)").collect()
      }
      assert(e.getMessage.toUpperCase.contains("CHECK") ||
        e.getMessage.contains("positive_cents"), e.getMessage)
      assert(SnapshotLake.headVersion(s"$suiteBase/t") === headBefore)
      assert(spark.table(s"$cat.t").count() === 2L)
    }
  }

  test("NULL check results pass (SQL CHECK semantics)") {
    withCatalog {
      spark.sql(s"""
        CREATE TABLE $cat.n (
          id BIGINT, cents BIGINT,
          CONSTRAINT positive CHECK (cents >= 0))
        TBLPROPERTIES ('statCol' = 'id')""")
      // cents NULL -> predicate NULL -> not a violation
      spark.sql(s"INSERT INTO $cat.n VALUES (1, NULL)").collect()
      assert(spark.table(s"$cat.n").count() === 1L)
    }
  }

  test("ALTER TABLE ADD/DROP CONSTRAINT round-trips") {
    withCatalog {
      spark.sql(s"""
        CREATE TABLE $cat.a (id BIGINT, cents BIGINT)
        TBLPROPERTIES ('statCol' = 'id')""")
      spark.sql(s"INSERT INTO $cat.a VALUES (1, -1)").collect()
      spark.sql(s"""
        ALTER TABLE $cat.a ADD CONSTRAINT small CHECK (cents < 1000)""")
      val e = intercept[Exception] {
        spark.sql(s"INSERT INTO $cat.a VALUES (2, 5000)").collect()
      }
      assert(e.getMessage.toUpperCase.contains("CHECK") ||
        e.getMessage.contains("small"))
      spark.sql(s"INSERT INTO $cat.a VALUES (3, 500)").collect()
      spark.sql(s"ALTER TABLE $cat.a DROP CONSTRAINT small")
      spark.sql(s"INSERT INTO $cat.a VALUES (4, 5000)").collect()
      assert(spark.table(s"$cat.a").count() === 3L)
    }
  }

  test("UPDATE cannot smuggle a violation past the constraint") {
    withCatalog {
      spark.sql(s"""
        CREATE TABLE $cat.u (
          id BIGINT, cents BIGINT,
          CONSTRAINT pos CHECK (cents >= 0))
        TBLPROPERTIES ('statCol' = 'id')""")
      spark.sql(s"INSERT INTO $cat.u VALUES (1, 10), (2, 20)").collect()
      val e = intercept[Exception] {
        spark.sql(s"UPDATE $cat.u SET cents = -1 WHERE id = 1").collect()
      }
      assert(e.getMessage.toUpperCase.contains("CHECK") ||
        e.getMessage.contains("pos"))
      assert(spark.table(s"$cat.u").where(col("cents") < 0).count() === 0L)
    }
  }

  test("non-CHECK constraints are refused with a clear message") {
    withCatalog {
      val e = intercept[Exception] {
        spark.sql(s"""
          CREATE TABLE $cat.pk (
            id BIGINT, cents BIGINT,
            CONSTRAINT pk PRIMARY KEY (id))
          TBLPROPERTIES ('statCol' = 'id')""")
      }
      assert(e.getMessage.contains("CHECK"), e.getMessage)
    }
  }
}
