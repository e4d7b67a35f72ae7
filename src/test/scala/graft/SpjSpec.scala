package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._

import graft.sources.{Housekeeping, SnapshotLake, Tables}

/** Storage-partitioned joins: a lake scan whose files all carry one
  * partition spec reports `KeyGroupedPartitioning`, each split
  * carries its typed key, and Spark joins two co-partitioned lake
  * tables with ZERO shuffle on either side.
  */
class SpjSpec extends SparkTestBase {
  import spark.implicits._

  private def countShuffles(plan: SparkPlan): Int =
    graft.sources.LakeScan.countShuffles(plan)

  private def lakeDf(root: String): DataFrame =
    spark.read.format("graft.sources.GraftLakeSource")
      .option("path", root).load()

  private lazy val (rootA, rootB, nRows): (String, String, Long) = {
    val a = Housekeeping.tempDir("spj_a")
    val b = Housekeeping.tempDir("spj_b")
    val ev = Tables.events(spark, sf("sf0.001"))
      .select(col("event_id"),
        (col("event_id") % 4).as("bucket4"),
        round(col("value") * 100).cast("long").as("cents"))
    SnapshotLake.commitPartitioned(spark, a, ev, "bucket4", "event_id")
    SnapshotLake.commitPartitioned(spark, b,
      ev.withColumn("cents", col("cents") * 2), "bucket4", "event_id")
    (a, b, ev.count())
  }

  test("co-partitioned lake join plans with zero shuffles") {
    val joined = lakeDf(rootA).as("a")
      .hint("merge")
      .join(lakeDf(rootB).as("b"),
        Seq("bucket4", "event_id"))
      .select(col("bucket4"), col("event_id"),
        (col("a.cents") + col("b.cents")).as("c3"))
    val n = joined.count()
    assert(n === nRows)
    val shuffles = countShuffles(joined.queryExecution.executedPlan)
    assert(shuffles === 0,
      s"expected a storage-partitioned join, got $shuffles shuffles:\n" +
        joined.queryExecution.executedPlan)
    // and the values are right: every row contributes cents + 2*cents
    val sum3 = joined.agg(sum(col("c3"))).collect().head.getLong(0)
    val sum1 = lakeDf(rootA).agg(sum(col("cents")))
      .collect().head.getLong(0)
    assert(sum3 === 3 * sum1)
  }

  test("scan reports keyGrouped in its description; splits carry keys") {
    val df = lakeDf(rootA).where(col("bucket4").isNotNull)
      .select(col("bucket4"), col("cents"))
    df.collect()
    val scan = graft.sources.LakeScan
      .findIn(df.queryExecution.executedPlan)
      .getOrElse(fail("no LakeScan planned"))
    assert(scan.description().contains("keyGrouped=bucket4"))
    val parts = scan.planInputPartitions()
    assert(parts.nonEmpty && parts.forall(
      _.isInstanceOf[org.apache.spark.sql.connector.read.HasPartitionKey]))
    val keys = parts.map(
      _.asInstanceOf[org.apache.spark.sql.connector.read.HasPartitionKey]
        .partitionKey().getLong(0)).toSet
    assert(keys === Set(0L, 1L, 2L, 3L))
  }

  test("a mixed-spec snapshot reports unknown partitioning and " +
      "still joins correctly (with shuffles)") {
    val root = Housekeeping.tempDir("spj_mixed")
    val ev = Tables.events(spark, sf("sf0.001"))
      .select(col("event_id"), (col("event_id") % 4).as("bucket4"),
        round(col("value") * 100).cast("long").as("cents"))
    SnapshotLake.commitPartitioned(spark, root,
      ev.where(col("event_id") % 2 === 0), "bucket4", "event_id")
    // second commit UNPARTITIONED: tags no longer uniform
    SnapshotLake.commit(spark, root,
      ev.where(col("event_id") % 2 === 1), "event_id")
    val df = lakeDf(root).select(col("bucket4"), col("cents"))
    df.collect()
    val scan = graft.sources.LakeScan
      .findIn(df.queryExecution.executedPlan)
      .getOrElse(fail("no LakeScan planned"))
    assert(!scan.description().contains("keyGrouped"))
    val joined = lakeDf(root).hint("merge")
      .join(lakeDf(rootB), Seq("bucket4", "event_id"))
    assert(joined.count() === nRows)
    assert(countShuffles(joined.queryExecution.executedPlan) > 0)
  }

  test("partition-value filter composes: pruned SPJ scan keeps " +
      "grouped keys consistent with kept files") {
    val df = lakeDf(rootA).where(col("bucket4") === 2L)
      .select(col("bucket4"), col("cents"))
    val n = df.count()
    assert(n > 0)
    val scan = graft.sources.LakeScan
      .findIn(df.queryExecution.executedPlan)
      .getOrElse(fail("no LakeScan planned"))
    // static partition prune kept only the bucket4=2 file; the scan
    // reports ONE group over the kept files
    assert(scan.files.length === 1)
    val parts = scan.planInputPartitions()
    assert(parts.map(
      _.asInstanceOf[org.apache.spark.sql.connector.read.HasPartitionKey]
        .partitionKey().getLong(0)).toSet === Set(2L))
  }
}
