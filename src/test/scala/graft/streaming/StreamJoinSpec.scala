package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkTestBase

/** Stream-stream join through a real micro-batch execution: two
  * MemoryStream sources → watermarked interval join → memory sink,
  * differentially checked against the identical plan in batch mode.
  */
class StreamJoinSpec extends SparkTestBase {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val impRows = Seq(
    (1L, ts("2024-01-01 10:00:00"), 100L),
    (1L, ts("2024-01-01 12:00:00"), 101L),
    (2L, ts("2024-01-01 10:05:00"), 102L),
    (3L, ts("2024-01-01 10:00:00"), 103L))

  private val convRows = Seq(
    (1L, ts("2024-01-01 10:10:00"), 200L, 5.0),  // within 30m of 100
    (1L, ts("2024-01-01 12:40:00"), 201L, 7.0),  // 40m after 101: outside
    (2L, ts("2024-01-01 10:04:00"), 202L, 9.0),  // BEFORE the impression: no match
    (4L, ts("2024-01-01 10:20:00"), 203L, 1.0))  // user with no impression

  test("stream-stream interval join matches its batch twin") {
    implicit val sql = spark.sqlContext
    import sql.implicits._

    val expected = Set((1L, 100L, 200L))

    // batch twin: same function, plain DataFrames
    val batch = StreamingJoin.attribute(
      impRows.toDF("user_id", "ts", "event_id"),
      convRows.toDF("user_id", "ts", "event_id", "value"))
      .select("user_id", "imp_id", "conv_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(batch === expected)

    // streaming: two MemoryStreams through the same plan
    val impMem = MemoryStream[(Long, Timestamp, Long)]
    val convMem = MemoryStream[(Long, Timestamp, Long, Double)]
    val joined = StreamingJoin.attribute(
      impMem.toDF().toDF("user_id", "ts", "event_id"),
      convMem.toDF().toDF("user_id", "ts", "event_id", "value"))
    val q = joined.writeStream
      .format("memory").queryName("attributed")
      .outputMode(OutputMode.Append)
      .start()
    try {
      impMem.addData(impRows: _*)
      convMem.addData(convRows.take(2): _*)
      q.processAllAvailable()
      convMem.addData(convRows.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("attributed")
      .select("user_id", "imp_id", "conv_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed === expected, "stream result differs from batch twin")
  }

  test("stream-stream join plan bounds state (interval condition present)") {
    implicit val sql = spark.sqlContext
    import sql.implicits._
    val joined = StreamingJoin.attribute(
      impRows.toDF("user_id", "ts", "event_id"),
      convRows.toDF("user_id", "ts", "event_id", "value"))
    // the time-range predicate must survive into the physical join —
    // it is what lets streaming execution evict buffered rows
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("conv_ts") && plan.contains("imp_ts"),
      s"interval bound missing from join:\n$plan")
  }
}
