package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.SnapshotLake
import graft.sources.SnapshotLake.ColStat

/** Per-column manifest statistics (`cs=` records): write-time
  * [min, max, nullCount, KMV-NDV] for integral columns beyond the
  * stat envelope, folded into DSv2 `columnStats()` so CBO estimates
  * filters and joins on NON-stat columns. Pinned: record round-trip
  * (text + checkpoint), exact-below-saturation NDV, the cross-file
  * merge, CBO visibility with a join-cardinality estimate in band,
  * and the refuse-on-partial-coverage rule.
  */
class LakeColStatsSpec extends SparkTestBase {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("lake_cs_").toString

  test("cs records round-trip and NDV is exact below saturation") {
    val root = freshRoot()
    // v: 10 distinct values (< k=32) → the sketch IS the value set
    SnapshotLake.commitClustered(spark, root,
      (0L until 1000L).map(i => (i, i % 10)).toDF("k", "v"),
      when(col("k") >= 500L, lit(1)).otherwise(lit(0)), "k")
    val snap = SnapshotLake.snapshot(root)
    assert(snap.files.size === 2)
    snap.files.foreach { f =>
      val st = f.cstats("v")
      assert(st.lo === 0L && st.hi === 9L && st.nulls === 0L)
      assert(st.kmv.size === 10) // exact distinct hash set
    }
    assert(ColStat.ndv(ColStat.mergeKmv(
      snap.files.map(_.cstats("v").kmv))) === 10L)
    // the stat column itself records no cs entry (the envelope owns it)
    assert(snap.files.forall(!_.cstats.contains("k")))
  }

  test("saturated sketches estimate within the k=32 error band and merge across files") {
    val root = freshRoot()
    val n = 20000L
    SnapshotLake.commitClustered(spark, root,
      (0L until n).map(i => (i, i % 5000)).toDF("k", "v"),
      when(col("k") >= n / 2, lit(1)).otherwise(lit(0)), "k")
    val snap = SnapshotLake.snapshot(root)
    val est = ColStat.ndv(ColStat.mergeKmv(
      snap.files.map(_.cstats("v").kmv)))
    assert(est >= 5000 / 2 && est <= 5000 * 2,
      s"NDV estimate $est outside [2500, 10000] for true 5000")
  }

  test("CBO sees NDV/range/nulls for a non-stat column; join cardinality lands in band") {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.cbo.enabled", "true")
    ss.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    val root = freshRoot()
    import ss.implicits._
    SnapshotLake.commitClustered(ss, root,
      (0L until 10000L).map(i => (i, i % 100)).toDF("k", "v"),
      when(col("k") >= 5000L, lit(1)).otherwise(lit(0)), "k")
    def lake() = ss.read.format("graft.sources.GraftLakeSource")
      .option("path", root).load()
    val j = lake().as("a").join(lake().as("b"), "v")
    val prev = SparkSession.getActiveSession
    SparkSession.setActiveSession(ss)
    try {
      val cs = j.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
          r.stats.attributeStats.collectFirst {
            case (a, st) if a.name == "v" => st }
      }.flatten.headOption
      assert(cs.exists(_.distinctCount.exists(n =>
        n >= BigInt(50) && n <= BigInt(200))))
      assert(cs.exists(_.min.map(_.toString.toLong).contains(0L)))
      assert(cs.exists(_.max.map(_.toString.toLong).contains(99L)))
      assert(cs.exists(_.nullCount.contains(BigInt(0))))
      // JoinEstimation: |A ⋈ B on v| ≈ n·n / ndv(v) = 10k·10k/100 = 1M
      val est = j.queryExecution.optimizedPlan.stats.rowCount
      assert(est.exists(e =>
        e >= BigInt(250000) && e <= BigInt(4000000)),
        s"join estimate $est outside [250k, 4M] for true 1M")
    } finally prev.foreach(SparkSession.setActiveSession)
  }

  test("CBO join reorder flips on the manifest stats: the selective table moves first") {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.cbo.enabled", "true")
    ss.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    // defeat size-based broadcasting so the ORDER is the observable,
    // not the strategy
    ss.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    import ss.implicits._
    val rootA = Files.createTempDirectory("lake_cs_a_").toString
    val rootB = Files.createTempDirectory("lake_cs_b_").toString
    val rootC = Files.createTempDirectory("lake_cs_c_").toString
    // A: 20k rows, join key v (ndv 100); B: 20k rows, same key
    // domain; C: 50 rows. Syntactic order A ⋈ B ⋈ C would build the
    // 4M-row A⋈B intermediate first; with rowCount + NDV flowing
    // from the manifests, CostBasedJoinReorder pulls C in first.
    SnapshotLake.commit(ss, rootA,
      (0L until 20000L).map(i => (i, i % 100)).toDF("k", "v")
        .coalesce(2), "k")
    SnapshotLake.commit(ss, rootB,
      (0L until 20000L).map(i => (i, i % 100)).toDF("kb", "v")
        .coalesce(2), "kb")
    SnapshotLake.commit(ss, rootC,
      (0L until 50L).map(i => (i, i)).toDF("kc", "v").coalesce(1), "kc")
    def lake(r: String) = ss.read.format("graft.sources.GraftLakeSource")
      .option("path", r).load()
    val j = lake(rootA).join(lake(rootB), "v").join(lake(rootC), "v")
      .groupBy(col("v")).agg(count(lit(1)).as("n"))
    val prev = SparkSession.getActiveSession
    SparkSession.setActiveSession(ss)
    try {
      // leaf order of the optimized join tree: reordered plans put C
      // adjacent to A before B joins in (leaves identified by their
      // lake roots — column pruning leaves only `v` in the outputs)
      val leaves = j.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
          r.scan match {
            case l: graft.sources.LakeScan =>
              if (l.root == rootA) "A"
              else if (l.root == rootB) "B"
              else if (l.root == rootC) "C" else "?"
            case _ => "?"
          }
      }
      assert(leaves.sorted === Seq("A", "B", "C"))
      assert(leaves.indexOf("C") < leaves.indexOf("B"),
        s"join reorder did not flip: leaf order $leaves")
      // and the answer stays exact
      val rows = j.orderBy(col("v")).as[(Long, Long)].collect()
      assert(rows.length === 50)
      assert(rows.forall { case (v, n) => n == 200L * 200L && v < 50 })
    } finally prev.foreach(SparkSession.setActiveSession)
  }

  test("a file without a cs record for the column refuses the whole merge") {
    val root = freshRoot()
    SnapshotLake.commitClustered(spark, root,
      (0L until 1000L).map(i => (i, i % 10)).toDF("k", "v"),
      lit(0), "k")
    // second commit writes v as ALL NULL → that file records no cs
    // entry for v → the scan must NOT claim column stats for v
    SnapshotLake.commit(spark, root,
      (1000L until 1100L).map(i => (i, Option.empty[Long]))
        .toDF("k", "v").coalesce(1), "k")
    val snap = SnapshotLake.snapshot(root)
    assert(snap.files.exists(!_.cstats.contains("v")))
    val df = spark.read.format("graft.sources.GraftLakeSource")
      .option("path", root).load().where(col("k") >= 0L)
    val served = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        r.stats.attributeStats.exists { case (a, _) => a.name == "v" }
    }.exists(identity)
    assert(!served)
    // nulls COUNT exactly when present (not all-null)
    val root2 = freshRoot()
    SnapshotLake.commit(spark, root2,
      (0L until 100L).map(i =>
        (i, if (i % 4 == 0) Option.empty[Long] else Some(i % 7)))
        .toDF("k", "v").coalesce(1), "k")
    val st = SnapshotLake.snapshot(root2).files.head.cstats("v")
    assert(st.nulls === 25L)
    assert(st.lo === 0L && st.hi === 6L)
  }

  test("checkpoint reconstruction carries cs records") {
    val root = freshRoot()
    SnapshotLake.commit(spark, root,
      (0L until 500L).map(i => (i, i % 10)).toDF("k", "v").coalesce(1),
      "k")
    (0 until 16).foreach { i =>
      SnapshotLake.commit(spark, root,
        Seq((10000L + i, 3L)).toDF("k", "v").coalesce(1), "k")
    }
    assert(SnapshotLake.headVersion(root) === 16)
    val snap = SnapshotLake.snapshot(root) // checkpoint-reconstructed
    assert(snap.files.forall(_.cstats.contains("v")))
    assert(ColStat.ndv(ColStat.mergeKmv(
      snap.files.map(_.cstats("v").kmv))) === 10L)
  }

  test("string columns record stats: NDV exact below saturation, nulls, avgLen/maxLen served to CBO") {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.cbo.enabled", "true")
    val root = freshRoot()
    import ss.implicits._
    // 10 distinct string values, 25% nulls, lengths 3 and 8
    SnapshotLake.commit(ss, root,
      (0L until 1000L).map(i =>
        (i, if (i % 4 == 0) Option.empty[String]
            else Some(if (i % 10 < 5) s"s-${i % 10}"
                      else s"s-long-${i % 10}")))
        .toDF("k", "v").coalesce(2), "k")
    val snap = SnapshotLake.snapshot(root)
    assert(snap.files.forall(_.cstats.contains("v")))
    // 10 string values + the documented null phantom (xxhash64(null)
    // hashes to the seed — one extra "value", same as the long path)
    assert(ColStat.ndv(ColStat.mergeKmv(
      snap.files.map(_.cstats("v").kmv))) === 11L)
    assert(snap.files.map(_.cstats("v").nulls).sum === 250L)
    assert(snap.files.map(_.cstats("v").hi).max === 8L)
    // served through DSv2 columnStats into catalyst under CBO
    val df = ss.read.format("graft.sources.GraftLakeSource")
      .option("path", root).load().where(col("k") >= 0L)
    val prev = SparkSession.getActiveSession
    SparkSession.setActiveSession(ss)
    try {
      val st = df.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
          r.stats.attributeStats.collectFirst {
            case (a, s) if a.name == "v" => s }
      }.flatten.headOption
      assert(st.exists(_.distinctCount.contains(BigInt(11))))
      assert(st.exists(_.nullCount.contains(BigInt(250))))
      assert(st.exists(_.maxLen.contains(8L)))
      assert(st.exists(_.avgLen.exists(a => a >= 3L && a <= 8L)))
      // no fabricated bounds: a Long literal on a string attribute
      // would poison estimation
      assert(st.exists(s => s.min.isEmpty && s.max.isEmpty))
    } finally prev.foreach(SparkSession.setActiveSession)
  }

  test("CBO join reorder flips on STRING-key manifest stats") {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.cbo.enabled", "true")
    ss.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    ss.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    import ss.implicits._
    val rootA = Files.createTempDirectory("lake_css_a_").toString
    val rootB = Files.createTempDirectory("lake_css_b_").toString
    val rootC = Files.createTempDirectory("lake_css_c_").toString
    // same shape as the integral flip test, but the join key is a
    // STRING (the digest/URL shape dedup corpora key on): without
    // string cs records CBO guesses and keeps syntactic order
    def key(c: org.apache.spark.sql.Column) =
      concat(lit("v-"), (c % 100).cast("string"))
    SnapshotLake.commit(ss, rootA,
      (0L until 20000L).toDF("k").select(col("k"), key(col("k")).as("v"))
        .coalesce(2), "k")
    SnapshotLake.commit(ss, rootB,
      (0L until 20000L).toDF("kb").select(col("kb"),
        key(col("kb")).as("v")).coalesce(2), "kb")
    SnapshotLake.commit(ss, rootC,
      (0L until 50L).toDF("kc").select(col("kc"),
        key(col("kc")).as("v")).coalesce(1), "kc")
    def lake(r: String) = ss.read.format("graft.sources.GraftLakeSource")
      .option("path", r).load()
    val j = lake(rootA).join(lake(rootB), "v").join(lake(rootC), "v")
      .groupBy(col("v")).agg(count(lit(1)).as("n"))
    val prev = SparkSession.getActiveSession
    SparkSession.setActiveSession(ss)
    try {
      val leaves = j.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
          r.scan match {
            case l: graft.sources.LakeScan =>
              if (l.root == rootA) "A"
              else if (l.root == rootB) "B"
              else if (l.root == rootC) "C" else "?"
            case _ => "?"
          }
      }
      assert(leaves.sorted === Seq("A", "B", "C"))
      assert(leaves.indexOf("C") < leaves.indexOf("B"),
        s"string-key join reorder did not flip: leaf order $leaves")
      val rows = j.orderBy(col("v")).as[(String, Long)].collect()
      assert(rows.length === 50)
      assert(rows.forall { case (_, n) => n == 200L * 200L })
    } finally prev.foreach(SparkSession.setActiveSession)
  }

  test("a projected _row_id never shifts cs attribution: stats stay column-aligned") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val root = freshRoot()
    // a (0..9) and b (0..4) carry DISTINGUISHABLE cs records
    SnapshotLake.commit(spark, root,
      (0L until 1000L).map(i => (i, i % 10, i % 5))
        .toDF("k", "a", "b").coalesce(1), "k")
    // projection with _row_id at a NON-terminal slot: the physical
    // projection strips metadata and appends __rid LAST, so a naive
    // positional zip would pair _row_id↔b and b↔__rid — attributing
    // a's sketch to the wrong attribute or dropping b's entirely
    val sb = new graft.sources.LakeScanBuilder(root, None,
      StructType(Seq(
        StructField("a", LongType), StructField("_row_id", LongType),
        StructField("b", LongType))))
    val stats = sb.build()
      .asInstanceOf[org.apache.spark.sql.connector.read
        .SupportsReportStatistics].estimateStatistics()
    val cs = stats.columnStats().asScala.map { case (ref, st) =>
      ref.describe() -> st }.toMap
    def rng(c: String): (Long, Long) =
      (cs(c).min().get.asInstanceOf[Long],
        cs(c).max().get.asInstanceOf[Long])
    assert(cs.contains("a") && cs.contains("b"),
      s"column stats missing under _row_id projection: ${cs.keySet}")
    assert(rng("a") === (0L, 9L))
    assert(rng("b") === (0L, 4L))
    assert(cs("a").distinctCount().getAsLong === 10L)
    assert(cs("b").distinctCount().getAsLong === 5L)
    assert(!cs.contains("_row_id") && !cs.contains("__rid"))
  }
}
