package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkTestBase

/** Drives stateful sessionization through real micro-batches:
  * sessions split across batches must merge, gaps must close
  * sessions, and the event-time timeout must flush idle state once
  * the watermark passes.
  */
class SessionizeStreamSpec extends SparkTestBase {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("streaming sessionize closes on gaps, merges across batches, flushes on watermark") {
    implicit val sql = spark.sqlContext
    import sql.implicits._

    val mem = MemoryStream[SessionEvent]
    val q = StreamingSessionize.sessionize(mem.toDS())
      .writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: user 1 session A (2 events), then a >30min gap opens B
      mem.addData(
        SessionEvent(1L, ts("2024-01-01 10:00:00"), 10.0),
        SessionEvent(1L, ts("2024-01-01 10:10:00"), 5.0),
        SessionEvent(1L, ts("2024-01-01 11:00:00"), 2.0))
      q.processAllAvailable()
      // batch 2: B continues across the batch boundary; user 2 appears
      mem.addData(
        SessionEvent(1L, ts("2024-01-01 11:20:00"), 3.0),
        SessionEvent(2L, ts("2024-01-01 11:00:00"), 7.0))
      q.processAllAvailable()
      // batch 3: far-future event advances the watermark past every
      // open session's gap horizon → event-time timeout flushes them
      mem.addData(SessionEvent(99L, ts("2024-01-02 12:00:00"), 1.0))
      q.processAllAvailable()
      mem.addData(SessionEvent(99L, ts("2024-01-03 12:00:00"), 1.0))
      q.processAllAvailable()
    } finally q.stop()

    val out = spark.table("sess_out")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(3), r.getLong(4)))
      .toSet
    // session A: closed by the in-batch gap
    assert(out.contains((1L, ts("2024-01-01 10:00:00"), 2L, 1500L)), s"got $out")
    // session B: merged across batches (11:00 + 11:20), flushed by timeout
    assert(out.contains((1L, ts("2024-01-01 11:00:00"), 2L, 500L)), s"got $out")
    // user 2's single-event session flushed by timeout
    assert(out.contains((2L, ts("2024-01-01 11:00:00"), 1L, 700L)), s"got $out")
  }
}
