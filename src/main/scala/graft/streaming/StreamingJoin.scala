package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream inner join with event-time bounds — the last gap in
  * the streaming surface (the reference has no streaming at all; the
  * batch engine's joins are all bounded).
  *
  * Semantics: an impression stream joined to a conversion stream on
  * user_id, keeping only conversions that land within
  * [impression.ts, impression.ts + horizon]. Both sides carry
  * watermarks and the join condition carries the time bound, which
  * is what lets Spark BOUND THE BUFFERED STATE on both sides: a
  * buffered impression can be evicted once the conversion-side
  * watermark passes its ts + horizon, and vice versa. Without the
  * time-range predicate the state would grow with the stream —
  * unusable at 100 TB/day; with it, state is O(horizon × rate),
  * independent of stream length.
  *
  * The same function works on batch frames (differential testing):
  * watermarks are no-ops in batch, the time predicate is just a
  * filter.
  */
object StreamingJoin {

  /** imp(user_id, ts, event_id) ⋈ conv(user_id, ts, event_id, value)
    * within `horizon` of the impression. Column names are disjoint
    * via prefixing so the joined schema is stable.
    *
    * `joinType = "left_outer"` is the attribution-with-nulls shape
    * (every impression appears; unconverted ones carry null
    * conv_id/conv_ts/value). In streaming, Spark emits an unmatched
    * left row only once the watermark proves no future conversion
    * can land in its horizon — same state bound as the inner join,
    * plus a deferred-emission rule the q97 gate pins down.
    */
  def attribute(
      impressions: DataFrame,
      conversions: DataFrame,
      horizon: String = "30 minutes",
      joinType: String = "inner"): DataFrame = {
    val imp = impressions
      .withWatermark("ts", "1 hour")
      .select(col("user_id"),
        col("ts").as("imp_ts"), col("event_id").as("imp_id"))
    val conv = conversions
      .withWatermark("ts", "1 hour")
      .select(col("user_id").as("conv_user"),
        col("ts").as("conv_ts"), col("event_id").as("conv_id"),
        col("value"))
    imp.join(conv,
      col("user_id") === col("conv_user") &&
        col("conv_ts") >= col("imp_ts") &&
        col("conv_ts") <= col("imp_ts") + expr(s"INTERVAL $horizon"),
      joinType)
      .select(col("user_id"), col("imp_id"), col("conv_id"),
        col("imp_ts"), col("conv_ts"), col("value"))
  }
}
