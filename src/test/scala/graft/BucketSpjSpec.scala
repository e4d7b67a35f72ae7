package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.functions.GraftBucket
import graft.sources.{LakeScan, SnapshotLake}

/** Bucket-transform partitioning (`PARTITIONED BY (bucket(N, c))`)
  * and the zero-shuffle storage-partitioned join it enables on
  * high-cardinality keys: DDL acceptance/refusal, the clustered
  * write landing exactly one tagged file per bucket, point-lookup
  * pruning by hashing the literal, the SPJ plan gate, and — the
  * scale-survival contract — partition identity carrying through
  * compaction and deletion-vector/CoW rewrites.
  */
class BucketSpjSpec extends SparkTestBase {
  import spark.implicits._

  private val cat = s"bktcat_${java.util.UUID.randomUUID()
    .toString.take(8)}"

  private lazy val suiteBase: String =
    Files.createTempDirectory("lake_bkt_").toString

  private def withCatalog(body: String => Unit): Unit = {
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.GraftLakeCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", suiteBase)
    body(suiteBase)
  }

  private val N = 8
  private val tag = GraftBucket.tagCol(N, "k")

  private def createBucketed(t: String): Unit =
    spark.sql(s"""
      CREATE TABLE $cat.$t (k BIGINT, cents BIGINT)
      PARTITIONED BY (bucket($N, k))
      TBLPROPERTIES ('statCol' = 'cents')""")

  test("bucket id: deterministic, uniform-ish, non-negative for negative keys") {
    assert(GraftBucket.id(42L, 8) === GraftBucket.id(42L, 8))
    assert(GraftBucket.id(-7L, 8) >= 0)
    // dense sequential ids spread: all 8 buckets hit within 64 ids
    assert((0L until 64L).map(GraftBucket.id(_, 8)).distinct.size === 8)
    assert(GraftBucket.parseTag("bucket8(k)") === Some((8, "k")))
    assert(GraftBucket.parseTag("k") === None)
  }

  test("DDL: bucket on an unhashable column type refused; identity still works") {
    withCatalog { _ =>
      val e = intercept[IllegalArgumentException] {
        spark.sql(s"""
          CREATE TABLE $cat.bad (s DOUBLE, cents BIGINT)
          PARTITIONED BY (bucket(8, s))
          TBLPROPERTIES ('statCol' = 'cents')""")
      }
      assert(e.getMessage.contains("BIGINT, INT, or STRING"))
    }
  }

  test("string bucket keys: SQL-twin hash, tag-only point prune, zero-shuffle SPJ on a string key") {
    withCatalog { base =>
      // the 100 TB shape this exists for: dedup/curation tables
      // keyed on digests/URLs — strings — bucketed for fact-fact SPJ
      for (t <- Seq("s1", "s2")) spark.sql(s"""
        CREATE TABLE $cat.$t (doc STRING, cents BIGINT)
        PARTITIONED BY (bucket($N, doc))
        TBLPROPERTIES ('statCol' = 'cents')""")
      spark.sql(s"INSERT INTO $cat.s1 " +
        "SELECT concat('doc-', md5(cast(id AS string))), id * 3 " +
        "FROM range(4000)")
      spark.sql(s"INSERT INTO $cat.s2 " +
        "SELECT concat('doc-', md5(cast(id AS string))), id * 5 " +
        "FROM range(4000)")
      val stag = GraftBucket.tagCol(N, "doc")
      val snap = SnapshotLake.snapshot(s"$base/s1")
      assert(snap.files.size === N)
      assert(snap.files.forall(_.part.exists(_._1 == stag)))
      // the tag is the SQL twin: pmod(xxhash64(doc), N) recomputes it
      snap.files.foreach { f =>
        val b = f.part.get._2.toInt
        val ids = spark.read.parquet(s"$base/s1/${f.name}")
          .select(expr(s"pmod(xxhash64(doc), $N)").cast("int"))
          .as[Int].collect()
        assert(ids.forall(_ === b))
        // ...and the JVM-side overload agrees byte-for-byte
        val docs = spark.read.parquet(s"$base/s1/${f.name}")
          .select("doc").as[String].collect()
        assert(docs.forall(GraftBucket.id(_, N) === b))
      }
      // string point lookup prunes to 1 of N files from tags alone
      val key = spark.sql(
        "SELECT concat('doc-', md5(cast(777 AS string)))")
        .collect().head.getString(0)
      val point = spark.table(s"$cat.s1").where(col("doc") === key)
      assert(point.collect().map(_.getLong(1)).toSeq === Seq(2331L))
      val pscan = LakeScan.findIn(point.queryExecution.executedPlan).get
      assert(pscan.filesTotal === N)
      assert(pscan.files.length === 1)
      assert(pscan.files.head.part.get._2.toInt ===
        GraftBucket.id(key, N))
      // zero-shuffle SPJ on the STRING key (one shuffle = final agg)
      val j = spark.sql(s"""
        SELECT /*+ MERGE(a) */ sum(a.cents + b.cents) AS s
        FROM $cat.s1 a JOIN $cat.s2 b ON a.doc = b.doc""")
      assert(j.collect().head.getLong(0) ===
        (0L until 4000L).map(k => k * 8).sum)
      val plan = j.queryExecution.executedPlan
      assert(LakeScan.countShuffles(plan) === 1)
      assert(LakeScan.collectIn(plan).count(
        _.description().contains(s"keyGrouped=bucket$N(doc)")) === 2)
    }
  }

  test("bucketed INSERT lands one tagged file per bucket; SPJ joins with zero shuffles on the raw key") {
    withCatalog { base =>
      createBucketed("t1")
      createBucketed("t2")
      spark.sql(
        s"INSERT INTO $cat.t1 SELECT id, id * 3 FROM range(4000)")
      spark.sql(
        s"INSERT INTO $cat.t2 SELECT id, id * 5 FROM range(4000)")
      val snap = SnapshotLake.snapshot(s"$base/t1")
      assert(snap.files.size === N)
      assert(snap.files.forall(_.part.exists(_._1 == tag)))
      assert(snap.files.flatMap(_.part.map(_._2)).sorted ===
        (0 until N).map(_.toString).sorted)
      // every file holds ONLY its bucket's keys
      snap.files.foreach { f =>
        val b = f.part.get._2.toInt
        val ks = spark.read.parquet(
          s"$base/t1/${f.name}")
          .select("k").as[Long].collect()
        assert(ks.forall(GraftBucket.id(_, N) === b))
      }
      // point lookup prunes to 1 of N files from the tags alone
      val point = spark.table(s"$cat.t1").where(col("k") === 1234L)
      assert(point.collect().map(r => (r.getLong(0), r.getLong(1)))
        .toSeq === Seq((1234L, 3702L)))
      val pscan = LakeScan.findIn(point.queryExecution.executedPlan).get
      assert(pscan.filesTotal === N)
      assert(pscan.files.length === 1)
      assert(pscan.files.head.part.get._2.toInt ===
        GraftBucket.id(1234L, N))
      // the high-cardinality join: zero shuffles for the join, one
      // for the final scalar aggregate
      val j = spark.sql(s"""
        SELECT /*+ MERGE(a) */ sum(a.cents + b.cents) AS s
        FROM $cat.t1 a JOIN $cat.t2 b ON a.k = b.k""")
      assert(j.collect().head.getLong(0) ===
        (0L until 4000L).map(k => k * 8).sum)
      val plan = j.queryExecution.executedPlan
      assert(LakeScan.countShuffles(plan) === 1)
      assert(LakeScan.collectIn(plan).count(
        _.description().contains(s"keyGrouped=bucket$N(k)")) === 2)
    }
  }

  test("partition identity survives compaction and DV/CoW rewrites; SPJ stays shuffle-free") {
    withCatalog { base =>
      createBucketed("t3")
      createBucketed("t4")
      // two commits → 2 small files per bucket → compaction packs
      // WITHIN buckets, never across
      spark.sql(
        s"INSERT INTO $cat.t3 SELECT id, id * 3 FROM range(2000)")
      spark.sql(s"INSERT INTO $cat.t3 " +
        "SELECT id, id * 3 FROM range(2000, 4000)")
      spark.sql(
        s"INSERT INTO $cat.t4 SELECT id, id * 5 FROM range(4000)")
      val root = s"$base/t3"
      assert(SnapshotLake.snapshot(root).files.size === 2 * N)
      val cr = SnapshotLake.compactLake(spark, root, targetRows = 100000L)
      assert(cr.filesCompacted === 2 * N)
      val afterCompact = SnapshotLake.snapshot(root)
      assert(afterCompact.files.size === N)
      assert(afterCompact.files.forall(_.part.exists(_._1 == tag)))
      // compacted outputs still single-bucketed
      afterCompact.files.foreach { f =>
        val b = f.part.get._2.toInt
        val ks = spark.read.parquet(s"$root/${f.name}")
          .select("k").as[Long].collect()
        assert(ks.forall(GraftBucket.id(_, N) === b))
      }
      // dense delete → every bucket file CoW-rewrites (threshold 10)
      // and the rewrite INHERITS its source's bucket tag; scattered
      // delete → deletion vector, entry keeps name AND tag
      SnapshotLake.deleteRows(spark, root,
        col("k") % 2 === 0 && col("k") < 1000L, cowThresholdRows = 10L)
      SnapshotLake.deleteRows(spark, root, col("k").isin(3001L, 3003L))
      val afterDel = SnapshotLake.snapshot(root)
      assert(afterDel.files.forall(_.part.exists(_._1 == tag)))
      assert(afterDel.files.flatMap(_.part.map(_._2)).distinct.size === N)
      assert(afterDel.files.exists(_.dv.isDefined)) // DV route taken
      // still fully bucket-tagged → the SPJ survives the rewrites
      val deleted: Long => Boolean =
        k => (k % 2 == 0 && k < 1000L) || k == 3001L || k == 3003L
      val expect = (0L until 4000L).filterNot(deleted).map(_ * 8).sum
      val j = spark.sql(s"""
        SELECT /*+ MERGE(a) */ sum(a.cents + b.cents) AS s
        FROM $cat.t3 a JOIN $cat.t4 b ON a.k = b.k""")
      assert(j.collect().head.getLong(0) === expect)
      assert(LakeScan.countShuffles(j.queryExecution.executedPlan) === 1)
      // merge-on-read UPDATE appends an UNTAGGED post-image file:
      // the scan honestly downgrades to Unknown partitioning (no
      // false co-location claim) and the join still answers exactly
      SnapshotLake.updateRows(spark, root,
        col("k") === 1001L, Seq("cents" -> lit(-1L)),
        cowThresholdRows = 100000L)
      val afterUpd = SnapshotLake.snapshot(root)
      assert(afterUpd.files.filterNot(_.name.contains("__bucket=ins"))
        .forall(_.part.exists(_._1 == tag)))
      val j2 = spark.sql(s"""
        SELECT sum(a.cents + b.cents) AS s
        FROM $cat.t3 a JOIN $cat.t4 b ON a.k = b.k""")
      val expect2 = expect - (1001L * 8) + (-1L + 1001L * 5)
      assert(j2.collect().head.getLong(0) === expect2)
      // RE-BUCKETING compaction: the untagged post-image routes back
      // into its bucket (the SQL-twin hash), the table is fully
      // tagged again, and the zero-shuffle SPJ RETURNS — the
      // maintenance loop that keeps merge-on-read updates from
      // eroding the join layout forever
      val cr2 = SnapshotLake.compactLake(spark, root,
        targetRows = 100000L)
      assert(cr2.filesCompacted >= 1)
      val afterRb = SnapshotLake.snapshot(root)
      assert(afterRb.files.forall(_.part.exists(_._1 == tag)))
      val postK = GraftBucket.id(1001L, N).toString
      assert(afterRb.files.count(_.part.exists(_._2 == postK)) >= 2)
      val j3 = spark.sql(s"""
        SELECT /*+ MERGE(a) */ sum(a.cents + b.cents) AS s
        FROM $cat.t3 a JOIN $cat.t4 b ON a.k = b.k""")
      assert(j3.collect().head.getLong(0) === expect2)
      assert(LakeScan.countShuffles(j3.queryExecution.executedPlan) === 1)
    }
  }
}
