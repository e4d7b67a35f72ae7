package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkTestBase

class DedupStreamSpec extends SparkTestBase {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("streaming exact dedup drops same-content events within the watermark horizon") {
    implicit val sql = spark.sqlContext
    import sql.implicits._

    val mem = MemoryStream[(Timestamp, String)]
    val deduped = StreamingDedup.dedupExact(
      mem.toDF().toDF("ts", "text"), "text", "ts")
    val q = deduped.writeStream
      .format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(
        (ts("2024-01-01 10:00:00"), "doc A"),
        (ts("2024-01-01 10:00:05"), "doc A"),   // in-batch duplicate
        (ts("2024-01-01 10:00:10"), "doc B"))
      q.processAllAvailable()
      mem.addData(
        (ts("2024-01-01 10:20:00"), "doc A"),   // cross-batch duplicate (inside horizon)
        (ts("2024-01-01 10:20:01"), "doc C"))
      q.processAllAvailable()
    } finally q.stop()

    val texts = spark.table("dedup_out")
      .collect().map(_.getString(1)).sorted.toSeq
    assert(texts === Seq("doc A", "doc B", "doc C"),
      s"expected one copy of each, got $texts")
  }
}
