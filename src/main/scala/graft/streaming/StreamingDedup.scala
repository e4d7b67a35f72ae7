package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the stream-side of the dedup
  * ladder (batch d1). Two built-in policies, both watermark-bounded
  * so state never grows with stream length:
  *
  *  - `dedupExact`: drop any event whose key was seen while its
  *    event time is inside the watermark horizon
  *    (`dropDuplicatesWithinWatermark` — state entries expire as the
  *    watermark passes them).
  *  - keys here are content digests (md5 of the payload), the same
  *    canonicalization the batch d1 operator groups on — a document
  *    stream deduplicates identically whether replayed in batch or
  *    consumed live, which is the property a training-data pipeline
  *    needs for backfill-vs-live parity.
  */
object StreamingDedup {

  /** payloadCol → digest key; first arrival inside the watermark
    * window wins, duplicates drop.
    */
  def dedupExact(stream: DataFrame, payloadCol: String,
      tsCol: String, horizon: String = "1 hour"): DataFrame =
    stream
      .withColumn("__digest", md5(col(payloadCol).cast("binary")))
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("__digest")
      .drop("__digest")
}
