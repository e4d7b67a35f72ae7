package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftBucket
import graft.sources.{LakeScan, SnapshotLake}

/** COMPOSED partition specs — `PARTITIONED BY (p, bucket(N, k))`,
  * the canonical date+bucket lakehouse layout: the clustered write
  * lands one file per (identity value, bucket id) combination,
  * tagged at BOTH levels (`pt=` primary, `p2=` second); the prune
  * intersects predicates on both columns; partition DML stays
  * metadata-only on the identity level; compaction packs within
  * combinations, never across. Plus PARTITION SPEC EVOLUTION: an
  * ALTER TABLE property change re-partitions FUTURE writes only,
  * old files keep their old tags, and mixed-spec snapshots read and
  * prune soundly per spec.
  */
class ComposedPartitionSpec extends SparkTestBase {
  import spark.implicits._

  private val cat = s"cpcat_${java.util.UUID.randomUUID()
    .toString.take(8)}"

  private lazy val suiteBase: String =
    java.nio.file.Files.createTempDirectory("lake_cp_").toString

  private def withCatalog(body: String => Unit): Unit = {
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.GraftLakeCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", suiteBase)
    body(suiteBase)
  }

  private val N = 4
  private val tag2 = GraftBucket.tagCol(N, "k")

  test("composed DDL: identity must lead; both levels validated against the schema") {
    withCatalog { _ =>
      val e = intercept[Exception] {
        spark.sql(s"""
          CREATE TABLE $cat.badlead (p BIGINT, k BIGINT, cents BIGINT)
          PARTITIONED BY (bucket(4, k), p)
          TBLPROPERTIES ('statCol' = 'cents')""")
      }
      assert(e.getMessage.contains("identity"), e.getMessage)
      val e2 = intercept[Exception] {
        spark.sql(s"""
          CREATE TABLE $cat.badcol (p BIGINT, k BIGINT, cents BIGINT)
          PARTITIONED BY (p, bucket(4, missing))
          TBLPROPERTIES ('statCol' = 'cents')""")
      }
      assert(e2.getMessage.contains("not in the table schema") ||
        e2.getMessage.contains("missing"), e2.getMessage)
    }
  }

  test("composed write: one file per (p, bucket) combo, tagged at both levels; prune intersects") {
    withCatalog { base =>
      spark.sql(s"""
        CREATE TABLE $cat.cp (p BIGINT, k BIGINT, cents BIGINT)
        PARTITIONED BY (p, bucket($N, k))
        TBLPROPERTIES ('statCol' = 'cents')""")
      spark.sql(s"""
        INSERT INTO $cat.cp
        SELECT id % 3, id, id * 7 FROM range(3000)""")
      val snap = SnapshotLake.snapshot(s"$base/cp")
      assert(snap.files.size === 3 * N)
      assert(snap.files.forall(f =>
        f.part.exists(_._1 == "p") && f.part2.exists(_._1 == tag2)))
      assert(snap.files.map(f =>
        (f.part.get._2, f.part2.get._2)).distinct.size === 3 * N)
      // every file single-valued in BOTH dimensions
      snap.files.foreach { f =>
        val rows = spark.read.parquet(s"$base/cp/${f.name}")
          .select("p", "k").as[(Long, Long)].collect()
        assert(rows.map(_._1).distinct.toSeq === Seq(f.part.get._2.toLong))
        assert(rows.forall(r =>
          GraftBucket.id(r._2, N).toString == f.part2.get._2))
      }
      def planned(df: org.apache.spark.sql.DataFrame): Int =
        LakeScan.findIn(df.queryExecution.executedPlan).get.files.length
      // identity prune: p = 1 → N of 3N files
      val byP = spark.table(s"$cat.cp").where(col("p") === 1L)
      assert(byP.count() === 1000L)
      assert(planned(byP) === N)
      // bucket prune: k = 123 → 3 of 3N files (one per p)
      val byK = spark.table(s"$cat.cp").where(col("k") === 123L)
      assert(byK.collect().map(r => (r.getLong(0), r.getLong(2)))
        .toSeq === Seq((123L % 3, 123L * 7)))
      assert(planned(byK) === 3)
      // composed prune: p AND k → exactly 1 file; the WRONG p with
      // the right k is a 1-file scan answering zero rows
      val hit = spark.table(s"$cat.cp")
        .where(col("p") === lit(123L % 3) && col("k") === 123L)
      assert(hit.count() === 1L)
      assert(planned(hit) === 1)
      val miss = spark.table(s"$cat.cp")
        .where(col("p") === lit((123L % 3) + 1) && col("k") === 123L)
      assert(miss.count() === 0L)
      assert(planned(miss) <= 1)
    }
  }

  test("identity-level partition DML stays metadata-only on a composed table") {
    withCatalog { base =>
      spark.sql(s"""
        CREATE TABLE $cat.cpdml (p BIGINT, k BIGINT, cents BIGINT)
        PARTITIONED BY (p, bucket($N, k))
        TBLPROPERTIES ('statCol' = 'cents')""")
      spark.sql(s"""
        INSERT INTO $cat.cpdml
        SELECT id % 3, id, id * 7 FROM range(3000)""")
      val before = SnapshotLake.snapshot(s"$base/cpdml").files
        .map(_.name).toSet
      spark.sql(s"DELETE FROM $cat.cpdml WHERE p = 2")
      val after = SnapshotLake.snapshot(s"$base/cpdml")
      assert(after.files.map(_.name).toSet.subsetOf(before),
        "identity-level delete rewrote files")
      assert(after.files.size === 2 * N)
      assert(spark.table(s"$cat.cpdml").count() === 2000L)
    }
  }

  test("compaction packs within (p, bucket) combos and keeps both tags; prune survives") {
    withCatalog { base =>
      spark.sql(s"""
        CREATE TABLE $cat.cpc (p BIGINT, k BIGINT, cents BIGINT)
        PARTITIONED BY (p, bucket($N, k))
        TBLPROPERTIES ('statCol' = 'cents')""")
      spark.sql(s"INSERT INTO $cat.cpc " +
        "SELECT id % 2, id, id * 7 FROM range(1000)")
      spark.sql(s"INSERT INTO $cat.cpc " +
        "SELECT id % 2, id, id * 7 FROM range(1000, 2000)")
      val root = s"$base/cpc"
      assert(SnapshotLake.snapshot(root).files.size === 2 * 2 * N)
      val cr = SnapshotLake.compactLake(spark, root,
        targetRows = 100000L)
      assert(cr.filesCompacted === 4 * N)
      val snap = SnapshotLake.snapshot(root)
      assert(snap.files.size === 2 * N)
      assert(snap.files.forall(f =>
        f.part.exists(_._1 == "p") && f.part2.exists(_._1 == tag2)))
      // compacted outputs still single-valued in both dimensions
      snap.files.foreach { f =>
        val rows = spark.read.parquet(s"$root/${f.name}")
          .select("p", "k").as[(Long, Long)].collect()
        assert(rows.map(_._1).distinct.length === 1)
        assert(rows.forall(r =>
          GraftBucket.id(r._2, N).toString == f.part2.get._2))
      }
      val hit = spark.table(s"$cat.cpc")
        .where(col("p") === lit(777L % 2) && col("k") === 777L)
      assert(hit.count() === 1L)
      assert(LakeScan.findIn(hit.queryExecution.executedPlan)
        .get.files.length === 1)
      assert(spark.table(s"$cat.cpc").count() === 2000L)
    }
  }

  test("partition spec evolution: ALTER re-partitions future writes; mixed snapshots prune per spec") {
    withCatalog { base =>
      spark.sql(s"""
        CREATE TABLE $cat.cpe (p BIGINT, k BIGINT, cents BIGINT)
        PARTITIONED BY (p)
        TBLPROPERTIES ('statCol' = 'cents')""")
      spark.sql(s"INSERT INTO $cat.cpe " +
        "SELECT id % 3, id, id * 7 FROM range(1500)")
      val root = s"$base/cpe"
      assert(SnapshotLake.snapshot(root).files
        .forall(f => f.part.exists(_._1 == "p") && f.part2.isEmpty))
      // EVOLVE the spec: future writes bucket on k instead — zero
      // files rewritten, old files keep their identity tags
      spark.sql(s"ALTER TABLE $cat.cpe SET TBLPROPERTIES (" +
        s"'partcol' = 'k', 'partbuckets' = '$N')")
      spark.sql(s"INSERT INTO $cat.cpe " +
        "SELECT id % 3, id, id * 7 FROM range(1500, 3000)")
      val snap = SnapshotLake.snapshot(root)
      val oldSpec = snap.files.filter(_.part.exists(_._1 == "p"))
      val newSpec = snap.files.filter(_.part.exists(_._1 ==
        GraftBucket.tagCol(N, "k")))
      assert(oldSpec.size === 3 && newSpec.size === N)
      assert(oldSpec.map(_.name).toSet.subsetOf(
        SnapshotLake.snapshot(root, Some(1)).files.map(_.name).toSet),
        "evolution rewrote pre-existing files")
      def planned(df: org.apache.spark.sql.DataFrame): Int =
        LakeScan.findIn(df.queryExecution.executedPlan).get.files.length
      // identity prune applies to OLD-spec files only: p = 1 keeps
      // the one old p=1 file plus every new-spec file (soundness:
      // other-spec files are never pruned)
      val byP = spark.table(s"$cat.cpe").where(col("p") === 1L)
      assert(byP.count() === 1000L)
      assert(planned(byP) === 1 + N)
      // bucket prune applies to NEW-spec files only: k = 2000 keeps
      // 1 new file plus all 3 old files
      val byK = spark.table(s"$cat.cpe").where(col("k") === 2000L)
      assert(byK.count() === 1L)
      assert(planned(byK) === 3 + 1)
      assert(spark.table(s"$cat.cpe").count() === 3000L)
    }
  }
}
