package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.{LakeScan, SnapshotLake}

/** The `truncate(W, col)` partition transform (Iceberg's range
  * transform): DDL gates, one single-valued file per truncated group
  * from the clustered write, `truncW(c)` manifest tags, literal
  * pruning by truncating with the same function (strings prefix,
  * integrals floor — negatives included), and the storage-partitioned
  * join of two same-truncated tables planning with zero join
  * exchanges.
  */
class TruncatePartitionSpec extends SparkTestBase {
  import spark.implicits._

  private val cat = "graft_trunc_cat"
  private lazy val suiteBase: String =
    Files.createTempDirectory("lake_trunc_").toString

  private def withCatalog(body: => Unit): Unit = {
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.GraftLakeCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", suiteBase)
    body
  }

  private def rootOf(t: String): String = s"$suiteBase/$t"

  private def plannedFiles(df: org.apache.spark.sql.DataFrame): Int =
    LakeScan.findIn(df.queryExecution.executedPlan)
      .map(_.files.length).getOrElse(-1)

  test("string truncate: one file per prefix group, tagged " +
      "trunc3(doc); prefix-point predicates plan one file") {
    withCatalog {
      spark.sql(s"""
        CREATE TABLE $cat.ts (doc STRING, cents BIGINT)
        PARTITIONED BY (truncate(3, doc))
        TBLPROPERTIES ('statCol' = 'cents')""")
      // four prefix groups: aaa*, bbb*, ccc*, ddd*
      val rows = (0 until 400).map(i =>
        (s"${Seq("aaa", "bbb", "ccc", "ddd")(i % 4)}-doc-$i",
          i.toLong))
      rows.toDF("doc", "cents").createOrReplaceTempView("ts_in")
      spark.sql(s"INSERT INTO $cat.ts SELECT * FROM ts_in")
      val snap = SnapshotLake.snapshot(rootOf("ts"))
      assert(snap.files.size === 4)
      assert(snap.files.forall(_.part.exists(_._1 === "trunc3(doc)")))
      assert(snap.files.flatMap(_.part.map(_._2)).sorted ===
        Seq("aaa", "bbb", "ccc", "ddd"))
      // each physical file really is single-valued in the prefix
      for (f <- snap.files) {
        val prefixes = spark.read.parquet(rootOf("ts") + "/" + f.name)
          .select(substring(col("doc"), 1, 3)).distinct().collect()
        assert(prefixes.length === 1)
      }
      // equality literal truncates with the same function → 1 file
      val q = spark.table(s"$cat.ts").where(col("doc") === "bbb-doc-5")
      assert(plannedFiles(q) === 1)
      assert(q.count() === 1L)
      // IN-list across two groups → 2 files
      val q2 = spark.table(s"$cat.ts")
        .where(col("doc").isin("aaa-doc-0", "ddd-doc-3"))
      assert(plannedFiles(q2) === 2)
      assert(q2.count() === 2L)
      // aggregate exact
      assert(spark.table(s"$cat.ts").agg(sum(col("cents")))
        .head.getLong(0) === (0L until 400L).sum)
    }
  }

  test("integral truncate floors to multiples of W — negative keys " +
      "bin leftward; range locality survives in the layout") {
    withCatalog {
      spark.sql(s"""
        CREATE TABLE $cat.ti (k BIGINT, cents BIGINT)
        PARTITIONED BY (truncate(100, k))
        TBLPROPERTIES ('statCol' = 'cents')""")
      ((-150) until 150).map(i => (i.toLong, i.toLong))
        .toDF("k", "cents").createOrReplaceTempView("ti_in")
      spark.sql(s"INSERT INTO $cat.ti SELECT * FROM ti_in")
      val snap = SnapshotLake.snapshot(rootOf("ti"))
      // floors: -200 (for -150..-101), -100, 0, 100
      assert(snap.files.flatMap(_.part.map(_._2)).map(_.toLong).sorted
        === Seq(-200L, -100L, 0L, 100L))
      val q = spark.table(s"$cat.ti").where(col("k") === -101L)
      assert(plannedFiles(q) === 1)
      assert(q.select("cents").head.getLong(0) === -101L)
      assert(spark.table(s"$cat.ti").agg(sum(col("cents")))
        .head.getLong(0) === ((-150L) until 150L).sum)
      // RANGE predicates prune by floored tag bounds — the point of a
      // range transform: [-101, 50) touches bins -200, -100, 0
      val r = spark.table(s"$cat.ti")
        .where(col("k") >= -101L && col("k") < 50L)
      assert(plannedFiles(r) === 3)
      assert(r.count() === 151L)
      assert(r.agg(sum(col("cents"))).head.getLong(0) ===
        ((-101L) until 50L).sum)
      // open range upward: bins 0 and 100 only
      val o = spark.table(s"$cat.ti").where(col("k") > 60L)
      assert(plannedFiles(o) === 2)
      assert(o.count() === 89L)
      // the prune is PURE: a range straddling every bin keeps all 4
      val all4 = spark.table(s"$cat.ti").where(col("k") >= -150L)
      assert(plannedFiles(all4) === 4)
      assert(all4.count() === 300L)
    }
  }

  test("SPJ: two truncate(4, doc) tables join with zero join " +
      "exchanges; answers exact") {
    withCatalog {
      for ((t, m) <- Seq(("ja", 1), ("jb", 2))) {
        spark.sql(s"""
          CREATE TABLE $cat.$t (doc STRING, cents BIGINT)
          PARTITIONED BY (truncate(4, doc))
          TBLPROPERTIES ('statCol' = 'cents')""")
        (0 until 300).map(i => (f"g${i % 5}%s-doc-$i%03d",
            i.toLong * m))
          .toDF("doc", "cents").createOrReplaceTempView(s"${t}_in")
        spark.sql(s"INSERT INTO $cat.$t SELECT * FROM ${t}_in")
      }
      val j = spark.sql(s"""
        SELECT /*+ MERGE(x) */ sum(x.cents + y.cents) AS s
        FROM $cat.ja x JOIN $cat.jb y ON x.doc = y.doc""")
      assert(j.head.getLong(0) === (0L until 300L).map(_ * 3).sum)
      val plan = j.queryExecution.executedPlan
      // the scalar aggregate's single exchange only — no join shuffle
      assert(LakeScan.countShuffles(plan) === 1)
      assert(plan.toString.contains("SortMergeJoin"))
    }
  }

  test("MIXED widths on one column (parttrunc edited between " +
      "writes): range pruning floors each file with its OWN tag " +
      "width — never a silently-missing row") {
    withCatalog {
      spark.sql(s"""
        CREATE TABLE $cat.mx (k BIGINT, cents BIGINT)
        PARTITIONED BY (truncate(100, k))
        TBLPROPERTIES ('statCol' = 'cents')""")
      (0 until 200).map(i => (i.toLong, i.toLong))
        .toDF("k", "cents").createOrReplaceTempView("mx_in1")
      spark.sql(s"INSERT INTO $cat.mx SELECT * FROM mx_in1")
      spark.sql(
        s"ALTER TABLE $cat.mx SET TBLPROPERTIES ('parttrunc' = '50')")
      (200 until 300).map(i => (i.toLong, i.toLong))
        .toDF("k", "cents").createOrReplaceTempView("mx_in2")
      spark.sql(s"INSERT INTO $cat.mx SELECT * FROM mx_in2")
      val snap = SnapshotLake.snapshot(rootOf("mx"))
      // the snapshot really mixes widths: trunc100 tags 0/100,
      // trunc50 tags 200/250
      assert(snap.files.flatMap(_.part.map(_._1)).distinct.sorted ===
        Seq("trunc100(k)", "trunc50(k)"))
      // k >= 150: the trunc100 file tagged 100 holds 150..199 and
      // MUST survive (a single derived width w=50 would floor 150 to
      // 150 and wrongly prune it); both trunc50 files survive
      val r = spark.table(s"$cat.mx").where(col("k") >= 150L)
      assert(plannedFiles(r) === 3)
      assert(r.count() === 150L)
      assert(r.agg(sum(col("cents"))).head.getLong(0) ===
        (150L until 300L).sum)
      // a two-sided range crossing the width seam: bins 100..199
      // (w=100) and 200..249 (w=50) intersect; 250..299 does not
      val r2 = spark.table(s"$cat.mx")
        .where(col("k") >= 150L && col("k") < 220L)
      assert(plannedFiles(r2) === 2)
      assert(r2.count() === 70L)
      // equality still prunes per-file: k = 160 lives in the
      // trunc100 bin only
      val e = spark.table(s"$cat.mx").where(col("k") === 160L)
      assert(plannedFiles(e) === 1)
      assert(e.head.getLong(1) === 160L)
    }
  }

  test("Long.MinValue literal declines range derivation instead of " +
      "overflowing the floor into a prune-everything bound") {
    withCatalog {
      spark.sql(s"""
        CREATE TABLE $cat.mn (k BIGINT, cents BIGINT)
        PARTITIONED BY (truncate(100, k))
        TBLPROPERTIES ('statCol' = 'cents')""")
      (0 until 200).map(i => (i.toLong, i.toLong))
        .toDF("k", "cents").createOrReplaceTempView("mn_in")
      spark.sql(s"INSERT INTO $cat.mn SELECT * FROM mn_in")
      // k > Long.MinValue matches every row; an abs()-style guard
      // lets the literal through (abs(MinValue) is negative) and the
      // wrapped floor would prune every file
      val q = spark.table(s"$cat.mn").where(col("k") > Long.MinValue)
      assert(plannedFiles(q) === 2)
      assert(q.count() === 200L)
      val q2 = spark.table(s"$cat.mn")
        .where(col("k") > Long.MinValue && col("k") < 100L)
      assert(plannedFiles(q2) === 1)
      assert(q2.count() === 100L)
    }
  }

  test("STRING range predicates prune by prefix order: URL-style " +
      "bounds ride the truncate layout; strict upper bounds at the " +
      "prefix boundary exclude the tag; non-ASCII bounds derive") {
    withCatalog {
      spark.sql(s"""
        CREATE TABLE $cat.sr (doc STRING, cents BIGINT)
        PARTITIONED BY (truncate(3, doc))
        TBLPROPERTIES ('statCol' = 'cents')""")
      val rows = (0 until 400).map(i =>
        (s"${Seq("aaa", "bbb", "ccc", "ddd")(i % 4)}-doc-$i", i.toLong))
      rows.toDF("doc", "cents").createOrReplaceTempView("sr_in")
      spark.sql(s"INSERT INTO $cat.sr SELECT * FROM sr_in")
      // [bbb, ddd): strict hi fits the width ⇒ the 'ddd' tag itself
      // is excluded — files bbb + ccc only
      val r = spark.table(s"$cat.sr")
        .where(col("doc") >= "bbb" && col("doc") < "ddd")
      assert(plannedFiles(r) === 2)
      assert(r.count() === 200L)
      // a lower bound SHORTER than the width prunes by its own
      // prefix: doc >= 'bb' keeps bbb/ccc/ddd
      val r2 = spark.table(s"$cat.sr").where(col("doc") >= "bb")
      assert(plannedFiles(r2) === 3)
      assert(r2.count() === 300L)
      // strict '<' with a 1-char bound: only the 'aaa' tag < 'b'
      val r3 = spark.table(s"$cat.sr").where(col("doc") < "b")
      assert(plannedFiles(r3) === 1)
      assert(r3.count() === 100L)
      // an upper bound LONGER than the width compares by prefix and
      // keeps the boundary tag (rows under it may still qualify)
      val r4 = spark.table(s"$cat.sr").where(col("doc") <= "bbb-doc-1")
      assert(plannedFiles(r4) === 2)
      assert(r4.count() === 101L)
      // non-ASCII bound derives too (UTF-8 byte order): 'bbé' sits
      // between 'bbb' and 'ccc', so only ccc/ddd survive the prune
      val r5 = spark.table(s"$cat.sr").where(col("doc") >= "bbé")
      assert(plannedFiles(r5) === 2)
      assert(r5.count() === 200L)
    }
  }

  test("UTF-8 byte-order pruning at the surrogate seam: a BMP bound " +
      "in [U+E000,U+FFFF] vs supplementary data, code-point widths, " +
      "and '>' successor tightening") {
    withCatalog {
      spark.sql(s"""
        CREATE TABLE $cat.u8 (doc STRING, cents BIGINT)
        PARTITIONED BY (truncate(2, doc))
        TBLPROPERTIES ('statCol' = 'cents')""")
      // four prefixes in ENGINE (UTF-8/code-point) order; the last
      // two INVERT under Java's UTF-16 order (U+FFE9 = EF BF A9 <
      // U+1F600 = F0 9F 98 80 in bytes, but ￩ > \uD83D in
      // chars) — a Java-order prune drops the wrong files here
      val pfx = Seq("é", "中", "￩", "😀")
      val rows = (0 until 400).map(i => (s"${pfx(i % 4)}-$i", i.toLong)) ++
        pfx.zipWithIndex.map { case (p, j) => (p, 1000L + j) } // exact
      rows.toDF("doc", "cents").createOrReplaceTempView("u8_in")
      spark.sql(s"INSERT INTO $cat.u8 SELECT * FROM u8_in")
      // 8 bins: each prefix alone (1 code point) and prefix + '-'
      assert(spark.table(s"$cat.u8").count() === 404L)
      // band [中, 😀): strict hi, cp(hi)=1 <= 2 excludes the 😀 tags;
      // Java order would ALSO exclude the ￩ tags (wrongly)
      val band = spark.table(s"$cat.u8")
        .where(col("doc") >= "中" && col("doc") < "😀")
      assert(plannedFiles(band) === 4) // 中, 中-, ￩, ￩-
      assert(band.count() === 202L)
      // '>' successor tightening needs cp(lo) < W — and cp must count
      // CODE POINTS ("😀".length == 2 == W would wrongly skip it):
      // doc > '😀' keeps only the '😀-' bin, excluding the exact tag
      val gt = spark.table(s"$cat.u8")
        .where(col("doc") > "😀")
      assert(plannedFiles(gt) === 1)
      assert(gt.count() === 100L)
      // … while >= keeps both 😀 bins (the exact doc re-enters)
      val ge = spark.table(s"$cat.u8")
        .where(col("doc") >= "😀")
      assert(plannedFiles(ge) === 2)
      assert(ge.count() === 101L)
      // at cp(lo) == W the boundary tag must STAY strict or not:
      // doc > '中-' (cp 2): the string '中-z' shares the '中-' tag
      val gtw = spark.table(s"$cat.u8").where(col("doc") > "中-")
      assert(plannedFiles(gtw) === 5) // 中- stays; ￩, ￩-, 😀, 😀-
      assert(gtw.count() === 302L)
      // correctness of every kept row — expected set derived by
      // PREFIX membership (order-free: Scala's String '<' is Java
      // UTF-16 order and would mis-state the engine's own answer)
      assert(band.agg(sum("cents")).head.getLong(0) ===
        rows.filter(r => r._1.startsWith("中") || r._1.startsWith("￩"))
          .map(_._2).sum)
    }
  }

  test("DDL gates: type and width") {
    withCatalog {
      intercept[Exception] {
        spark.sql(s"""
          CREATE TABLE $cat.bad1 (v DOUBLE, cents BIGINT)
          PARTITIONED BY (truncate(3, v))
          TBLPROPERTIES ('statCol' = 'cents')""")
      }
      intercept[Exception] {
        spark.sql(s"""
          CREATE TABLE $cat.bad2 (doc STRING, cents BIGINT)
          PARTITIONED BY (truncate(0, doc))
          TBLPROPERTIES ('statCol' = 'cents')""")
      }
      // composed spec must still lead with identity
      intercept[Exception] {
        spark.sql(s"""
          CREATE TABLE $cat.bad3 (doc STRING, p BIGINT, cents BIGINT)
          PARTITIONED BY (truncate(3, doc), p)
          TBLPROPERTIES ('statCol' = 'cents')""")
      }
      // INT columns are refused: a floor near Int.MinValue is not
      // representable as INT, so the tag and the V2 function would
      // disagree
      intercept[Exception] {
        spark.sql(s"""
          CREATE TABLE $cat.bad4 (k INT, cents BIGINT)
          PARTITIONED BY (truncate(100, k))
          TBLPROPERTIES ('statCol' = 'cents')""")
      }
    }
  }
}
