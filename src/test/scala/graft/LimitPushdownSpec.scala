package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.{Housekeeping, LakeScan, SnapshotLake, Tables}

/** LIMIT / ORDER BY … LIMIT k pushdown into the lake scan: both
  * answered from manifest row counts (+ stat ranges for top-k), both
  * PARTIAL (Spark re-applies its own limit/sort), both refused the
  * moment a filter is present (every lake filter is residual, so
  * rows may drop post-scan and a file-prefix prune would under-fill
  * the limit).
  */
class LimitPushdownSpec extends SparkTestBase {

  // four single-file commits over contiguous event_id quarters:
  // manifest order == commit order == id order
  private lazy val (root, quarter): (String, Long) = {
    val r = Housekeeping.tempDir("limit_lake")
    val ev = Tables.events(spark, sf("sf0.001"))
      .select(col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
    val n = ev.count()
    val q = n / 4
    (0L until 4L).foreach { i =>
      val hi = if (i == 3) Long.MaxValue else (i + 1) * q
      SnapshotLake.commit(spark, r,
        ev.where(col("event_id") >= i * q && col("event_id") < hi)
          .coalesce(1),
        "event_id")
    }
    (r, q)
  }

  private def lake: DataFrame =
    spark.read.format("graft.sources.GraftLakeSource")
      .option("path", root).load()

  private def scanOf(df: DataFrame): LakeScan =
    LakeScan.findIn(df.queryExecution.executedPlan)
      .getOrElse(fail("no LakeScan planned"))

  test("limit plans a manifest-order file prefix covering the limit") {
    val n = (2 * quarter).toInt // exactly files 0 and 1
    val df = lake.limit(n)
    assert(df.count() === n.toLong)
    val scan = scanOf(df)
    assert(scan.files.length === 2,
      s"expected 2 files, planned ${scan.description()}")
    assert(scan.description().contains(s"limit=$n"))
    // content is deterministic BECAUSE the prefix covers the limit
    // exactly: the kept files' rows are all consumed
    val ids = df.agg(max(col("event_id"))).collect().head.getLong(0)
    assert(ids === 2 * quarter - 1)
  }

  test("a limit beyond the table keeps every file") {
    val df = lake.limit(Int.MaxValue)
    assert(df.count() === 4 * quarter)
    assert(scanOf(df).files.length === 4)
  }

  test("WHERE blocks the limit prune (filters are residual)") {
    val df = lake.where(col("cents") >= 0).limit(5)
    assert(df.count() === 5)
    val scan = scanOf(df)
    assert(!scan.description().contains("limit="),
      s"limit must not push under a residual filter: ${scan.description()}")
  }

  test("order-by-stat asc limit k plans only the first file") {
    val k = (quarter / 2).toInt
    val df = lake.orderBy(col("event_id")).limit(k)
    val rows = df.collect()
    assert(rows.length === k)
    assert(rows.map(_.getLong(0)).toSeq === (0L until k.toLong))
    val scan = scanOf(df)
    assert(scan.files.length === 1,
      s"expected 1 file for top-$k asc, got ${scan.description()}")
    assert(scan.description().contains(s"topk=$k(asc)"))
  }

  test("order-by-stat desc limit k plans only the last file") {
    val k = (quarter / 2).toInt
    val df = lake.orderBy(col("event_id").desc).limit(k)
    val rows = df.collect()
    assert(rows.length === k)
    assert(rows.head.getLong(0) === 4 * quarter - 1)
    val scan = scanOf(df)
    assert(scan.files.length === 1,
      s"expected 1 file for top-$k desc, got ${scan.description()}")
    assert(scan.description().contains(s"topk=$k(desc)"))
  }

  test("top-k spanning a file boundary keeps exactly the needed files") {
    val k = (quarter + 1).toInt // needs files 0 AND 1
    val df = lake.orderBy(col("event_id")).limit(k)
    assert(df.count() === k.toLong)
    assert(scanOf(df).files.length === 2)
  }

  test("ordering on a non-stat column is not pushed and stays correct") {
    val k = 10
    val df = lake.orderBy(col("cents"), col("event_id")).limit(k)
    val rows = df.collect()
    assert(rows.length === k)
    val scan = scanOf(df)
    assert(!scan.description().contains("topk="))
    assert(scan.files.length === 4)
  }

  test("overlapping file ranges defeat the top-k prune soundly") {
    // a second lake whose slices INTERLEAVE ids: every file spans
    // nearly the whole id range, so nothing may be pruned
    val r2 = Housekeeping.tempDir("limit_lake_overlap")
    val ev = Tables.events(spark, sf("sf0.001"))
      .select(col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
    (0L until 4L).foreach { i =>
      SnapshotLake.commit(spark, r2,
        ev.where(col("event_id") % 4 === i).coalesce(1), "event_id")
    }
    val df = spark.read.format("graft.sources.GraftLakeSource")
      .option("path", r2).load()
      .orderBy(col("event_id")).limit(7)
    val rows = df.collect()
    assert(rows.map(_.getLong(0)).toSeq === (0L until 7L))
    // pushed (it's the stat column) but prunes nothing: all ranges
    // overlap the top of the table
    assert(scanOf(df).files.length === 4)
  }
}
