package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkTestBase

/** Drives the streaming Q2 analog through a real micro-batch
  * execution: MemoryStream source → watermark + window agg → memory
  * sink, differentially checked against the identical plan run in
  * batch mode over the same rows.
  */
class StreamingSpec extends SparkTestBase {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("streaming windowed totals match the batch twin on the same events") {
    implicit val sql = spark.sqlContext
    import sql.implicits._

    val rows = Seq(
      (ts("2024-01-05 10:00:00"), 10.0),
      (ts("2024-01-10 11:00:00"), 5.5),
      (ts("2024-02-20 09:00:00"), 100.25),
      (ts("2024-03-05 12:00:00"), 1.0),
      (ts("2024-04-29 23:00:00"), 7.75))

    val mem = MemoryStream[(Timestamp, Double)]
    val totals = StreamingOps.windowedTotals(
      mem.toDF().toDF("ts", "value"))
    val q = totals.writeStream
      .format("memory").queryName("win_totals")
      .outputMode(OutputMode.Update)
      .start()
    try {
      mem.addData(rows.take(3): _*)
      q.processAllAvailable()
      mem.addData(rows.drop(3): _*)
      q.processAllAvailable()
    } finally q.stop()

    // memory sink in Update mode may hold superseded rows for a
    // window; keep the latest per window (max n_events)
    val streamed = spark.table("win_totals")
      .groupBy($"window_start")
      .agg(org.apache.spark.sql.functions.max_by(
        org.apache.spark.sql.functions.struct($"total", $"n_events"),
        $"n_events").as("v"))
      .select($"window_start", $"v.total", $"v.n_events")
      .collect()
      .map(r => (r.getTimestamp(0), r.getDouble(1), r.getLong(2)))
      .toSet

    val batch = StreamingOps.windowedTotals(
      rows.toDF("ts", "value"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getDouble(1), r.getLong(2)))
      .toSet

    assert(streamed === batch, s"stream=$streamed batch=$batch")
    assert(batch.nonEmpty)
  }

  test("argmax over the maintained totals picks the max window") {
    implicit val sql = spark.sqlContext
    import sql.implicits._
    val totals = StreamingOps.windowedTotals(
      Seq((ts("2024-01-05 00:00:00"), 2.0),
        (ts("2024-03-01 00:00:00"), 9.0),
        (ts("2024-03-02 00:00:00"), 1.0)).toDF("ts", "value"))
    val top = StreamingOps.argmaxWindow(totals).collect()(0)
    assert(top.getDouble(1) === 10.0)
  }
}
