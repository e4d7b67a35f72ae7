package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.{LakeScan, SnapshotLake}

/** Sorted bucket layout: `sortcol` orders rows within each rolled
  * file, the manifest stamps `so=` (text + checkpoint round-trip),
  * the scan reports per-split ordering through
  * SupportsReportOrdering under exactly the safe conditions, and the
  * SPJ merge join of two sorted-bucketed tables plans with zero
  * exchanges and zero sorts — while a multi-file-per-bucket snapshot
  * honestly declines the claim and re-sorts.
  */
class SortedLayoutSpec extends SparkTestBase {
  import spark.implicits._

  private val cat = "graft_sorted_cat"

  // one root for the suite: Spark caches the catalog instance on
  // first use, so re-pointing the root conf mid-suite would diverge
  // from where tables actually live
  private lazy val suiteBase: String =
    Files.createTempDirectory("lake_sorted_").toString

  private def withCatalog(body: => Unit): Unit = {
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.GraftLakeCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", suiteBase)
    body
  }

  private def rootOf(t: String): String = s"$suiteBase/$t"

  private def mkSorted(t: String, factor: Int): Unit = {
    spark.sql(s"""
      CREATE TABLE $cat.$t (k BIGINT, cents BIGINT)
      PARTITIONED BY (bucket(4, k))
      TBLPROPERTIES ('statCol' = 'cents', 'sortcol' = 'k')""")
    // adversarial input order: descending, so only the write's
    // planned sort can produce ordered files
    spark.sql(s"""
      INSERT INTO $cat.$t
      SELECT id AS k, id * $factor AS cents FROM range(2000)
      ORDER BY id DESC""")
  }

  test("files are physically key-sorted and stamped so=; " +
      "checkpoint round-trips the tag") {
    withCatalog {
      mkSorted("t1", 3)
      val snap = SnapshotLake.snapshot(rootOf("t1"))
      assert(snap.files.nonEmpty)
      assert(snap.files.forall(_.sorted.contains("k")))
      // read ONE file raw: rows must be ascending by k (manifest
      // names are root-relative)
      val one = spark.read.parquet(
        rootOf("t1") + "/" + snap.files.head.name)
      val ks = one.select("k").collect().map(_.getLong(0)).toSeq
      assert(ks === ks.sorted)
      // push the chain to a checkpoint version (v16) and re-read
      (1 to 16).foreach { i =>
        spark.sql(s"INSERT INTO $cat.t1 VALUES (${10000 + i}, 1)")
      }
      val at16 = SnapshotLake.snapshot(rootOf("t1"), Some(16))
      assert(at16.files.exists(_.sorted.contains("k")))
    }
  }

  test("SPJ merge join of two sorted-bucketed tables: zero exchanges, " +
      "zero sorts, exact answer") {
    withCatalog {
      mkSorted("a", 1)
      mkSorted("b", 2)
      val j = spark.sql(s"""
        SELECT /*+ MERGE(x) */ sum(x.cents + y.cents) AS s
        FROM $cat.a x JOIN $cat.b y ON x.k = y.k""")
      assert(j.head.getLong(0) === (0L until 2000L).map(_ * 3).sum)
      val plan = j.queryExecution.executedPlan
      assert(LakeScan.countShuffles(plan) === 1) // the scalar agg only
      assert(LakeScan.countSorts(plan) === 0)
      assert(plan.toString.contains("SortMergeJoin"))
    }
  }

  test("multi-file buckets decline the ordering claim; join stays " +
      "correct with real sorts") {
    withCatalog {
      mkSorted("c", 1)
      mkSorted("d", 2)
      // second insert: every bucket now holds TWO sorted files whose
      // key ranges interleave — an SPJ partition concatenates them,
      // so the scan must NOT report ordering
      spark.sql(s"""
        INSERT INTO $cat.c
        SELECT id AS k, id AS cents FROM range(2000, 4000)""")
      spark.sql(s"""
        INSERT INTO $cat.d
        SELECT id AS k, id * 2 AS cents FROM range(2000, 4000)""")
      val j = spark.sql(s"""
        SELECT /*+ MERGE(x) */ sum(x.cents + y.cents) AS s
        FROM $cat.c x JOIN $cat.d y ON x.k = y.k""")
      assert(j.head.getLong(0) === (0L until 4000L).map(_ * 3).sum)
      val plan = j.queryExecution.executedPlan
      // still storage-partitioned (zero join exchanges)...
      assert(LakeScan.countShuffles(plan) === 1)
      // ...but the merge join re-sorts each side honestly
      assert(LakeScan.countSorts(plan) === 2)
    }
  }

  test("OPTIMIZE preserves the sorted layout and RESTORES the " +
      "sort-free join a second insert eroded") {
    withCatalog {
      mkSorted("f", 1)
      mkSorted("g", 2)
      // erode: two sorted files per bucket -> ordering claim declined
      spark.sql(s"INSERT INTO $cat.f " +
        "SELECT id AS k, id AS cents FROM range(2000, 4000)")
      spark.sql(s"INSERT INTO $cat.g " +
        "SELECT id AS k, id * 2 AS cents FROM range(2000, 4000)")
      // compact: every pack group's sources share so=k, so outputs
      // re-sort by k and re-stamp — one sorted file per bucket again
      for (t <- Seq("f", "g"))
        spark.sql(s"CALL $cat.optimize(table => '$t', " +
          "target_rows => 100000)").collect()
      val snap = SnapshotLake.snapshot(rootOf("f"))
      assert(snap.files.size === 4)
      assert(snap.files.forall(_.sorted.contains("k")))
      // EVERY compacted file must be physically k-sorted — the
      // sort-free merge join below rides exactly this
      for (f <- snap.files) {
        val ks = spark.read.parquet(rootOf("f") + "/" + f.name)
          .select("k").collect().map(_.getLong(0)).toSeq
        assert(ks === ks.sorted, s"file ${f.name} not k-sorted")
      }
      val j = spark.sql(s"""
        SELECT /*+ MERGE(x) */ sum(x.cents + y.cents) AS s
        FROM $cat.f x JOIN $cat.g y ON x.k = y.k""")
      assert(j.head.getLong(0) === (0L until 4000L).map(_ * 3).sum)
      val plan = j.queryExecution.executedPlan
      assert(LakeScan.countShuffles(plan) === 1)
      assert(LakeScan.countSorts(plan) === 0)
    }
  }

  test("unsorted tables never claim; DML rewrites drop the stamp") {
    withCatalog {
      spark.sql(s"""
        CREATE TABLE $cat.u (k BIGINT, cents BIGINT)
        PARTITIONED BY (bucket(4, k))
        TBLPROPERTIES ('statCol' = 'cents')""")
      spark.sql(s"INSERT INTO $cat.u SELECT id, id FROM range(100)")
      assert(SnapshotLake.snapshot(rootOf("u")).files
        .forall(_.sorted.isEmpty))
      // a sorted table's CoW rewrite produces unstamped files (the
      // rewrite never re-plans the within-file sort)
      mkSorted("e", 1)
      SnapshotLake.deleteRows(spark, rootOf("e"), col("k") < 500,
        cowThresholdRows = 1L) // force copy-on-write
      val snap = SnapshotLake.snapshot(rootOf("e"))
      val rewritten = snap.files.filter(_.sorted.isEmpty)
      assert(rewritten.nonEmpty)
    }
  }

  test("a STREAMING write to a sortcol table never stamps so= — the " +
      "sink plans no sort, so the claim would lie") {
    withCatalog {
      spark.sql(s"""
        CREATE TABLE $cat.st (k BIGINT, cents BIGINT)
        PARTITIONED BY (bucket(4, k))
        TBLPROPERTIES ('statCol' = 'cents', 'sortcol' = 'k')""")
      val src = Files.createTempDirectory("sorted_stream_src_").toString
      val chk = Files.createTempDirectory("sorted_stream_chk_").toString
      // adversarially UNSORTED input
      spark.range(100).selectExpr("(99 - id) AS k", "id AS cents")
        .coalesce(1).write
        .mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(src)
      // the path-based sink carries the same table opts the catalog
      // would resolve — including sortcol, which it must IGNORE for
      // stamping because the streaming write plans no sort
      val q = spark.readStream
        .schema(new org.apache.spark.sql.types.StructType()
          .add("k", "bigint").add("cents", "bigint"))
        .parquet(src)
        .writeStream.format("graft.sources.GraftLakeSource")
        .option("path", rootOf("st"))
        .option("statCol", "cents").option("sortcol", "k")
        .option("partcol", "k")
        .option("checkpointLocation", chk)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      val snap = SnapshotLake.snapshot(rootOf("st"))
      assert(snap.files.nonEmpty)
      assert(snap.files.forall(_.sorted.isEmpty),
        "streaming sink stamped a sort it never planned")
    }
  }

  test("INSERT OVERWRITE PARTITION keeps the sort stamp on an " +
      "identity+sortcol table") {
    withCatalog {
      spark.sql(s"""
        CREATE TABLE $cat.po (p BIGINT, k BIGINT, cents BIGINT)
        PARTITIONED BY (p)
        TBLPROPERTIES ('statCol' = 'cents', 'sortcol' = 'k')""")
      spark.sql(s"INSERT INTO $cat.po " +
        "SELECT id % 4, id, id FROM range(400) ORDER BY id DESC")
      assert(SnapshotLake.snapshot(rootOf("po")).files
        .forall(_.sorted.contains("k")))
      // replace ONE partition: the replacement ran the same planned-
      // sort write, so the stamp (and the whole-table claim) survives
      spark.sql(s"INSERT OVERWRITE $cat.po PARTITION (p = 2) " +
        "SELECT id, id * 5 FROM range(1000, 1100) ORDER BY id DESC")
      val snap = SnapshotLake.snapshot(rootOf("po"))
      assert(snap.files.forall(_.sorted.contains("k")),
        "partition replace dropped the sort stamp")
      // and the replacement file really is k-sorted
      val repl = snap.files.find(_.part.exists(_._2 == "2")).get
      val ks = spark.read.parquet(rootOf("po") + "/" + repl.name)
        .select("k").collect().map(_.getLong(0)).toSeq
      assert(ks === ks.sorted)
    }
  }

  test("RENAME COLUMN cannot falsify the ordering claim: so= stamps " +
      "are physical names and the claim follows the renamed column") {
    withCatalog {
      spark.sql(s"""
        CREATE TABLE $cat.ren (k BIGINT, c BIGINT, cents BIGINT)
        PARTITIONED BY (bucket(4, k))
        TBLPROPERTIES ('statCol' = 'cents', 'sortcol' = 'k')""")
      spark.sql(s"INSERT INTO $cat.ren " +
        "SELECT id, id * 7, id AS cents FROM range(2000) ORDER BY id DESC")
      assert(SnapshotLake.snapshot(rootOf("ren")).files
        .forall(_.sorted.contains("k"))) // physical == birth name
      // THE ATTACK: rename the sort column away, then rename another
      // column onto its old name — a logical-name stamp would now
      // claim an ordering the bytes do not hold (c values are id*7,
      // physically ordered only by coincidence of this data — with a
      // lying claim a merge join would elide real sorts)
      spark.sql(s"ALTER TABLE $cat.ren RENAME COLUMN k TO kk")
      spark.sql(s"ALTER TABLE $cat.ren RENAME COLUMN c TO k")
      def orderingOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
        LakeScan.findIn(df.queryExecution.executedPlan).get
          .outputOrdering().toSeq.map(_.expression()
            .asInstanceOf[org.apache.spark.sql.connector
              .expressions.NamedReference].fieldNames()(0))
      // full projection: the claim follows the RENAMED column (kk is
      // the field whose physical storage is 'k'), never the new 'k'
      assert(orderingOf(spark.table(s"$cat.ren")) === Seq("kk"))
      // projecting only the new 'k' (physical 'c'): no claim at all
      assert(orderingOf(spark.table(s"$cat.ren")
        .select(col("k"), col("cents"))) === Seq.empty)
      // the sortcol PROPERTY followed the rename: a post-rename insert
      // still sorts by the original column (now kk) and stamps the
      // same physical name, keeping the whole-table claim uniform
      val before = SnapshotLake.snapshot(rootOf("ren"))
        .files.map(_.name).toSet
      spark.sql(s"INSERT INTO $cat.ren " +
        "SELECT id * 3, id, id AS cents FROM range(2000, 2500) " +
        "ORDER BY 1 DESC")
      val snap = SnapshotLake.snapshot(rootOf("ren"))
      assert(snap.files.forall(_.sorted.contains("k")),
        "post-rename insert lost the physical sort stamp")
      // and the new files really are ordered by kk's bytes — the raw
      // parquet read surfaces PHYSICAL names, so 'k' here is kk
      val fresh = snap.files.filterNot(f => before(f.name))
      assert(fresh.nonEmpty)
      for (f <- fresh) {
        val ks = spark.read.parquet(rootOf("ren") + "/" + f.name)
          .select("k").collect().map(_.getLong(0)).toSeq
        assert(ks === ks.sorted, s"${f.name} not kk-sorted after rename")
      }
    }
  }

  test("sortcol DDL gates: schema membership and partitioned-only") {
    withCatalog {
      intercept[Exception] {
        spark.sql(s"""
          CREATE TABLE $cat.bad1 (k BIGINT, cents BIGINT)
          PARTITIONED BY (bucket(4, k))
          TBLPROPERTIES ('statCol' = 'cents', 'sortcol' = 'nope')""")
      }
      intercept[Exception] {
        spark.sql(s"""
          CREATE TABLE $cat.bad2 (k BIGINT, cents BIGINT)
          TBLPROPERTIES ('statCol' = 'cents', 'sortcol' = 'k')""")
      }
    }
  }
}
