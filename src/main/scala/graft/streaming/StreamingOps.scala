package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Money

/** Structured Streaming analog of the reference's Q2 (argmax month by
  * total value) — the streaming surface the reference lacks entirely
  * (SURVEY.md §2.2 "Streaming: none").
  *
  * Shape: event-time tumbling windows + watermark. The watermark
  * bounds state: closed windows are evicted after 30 days of event
  * time, so state size is O(open windows), not O(stream length) —
  * the property that lets this run forever on an unbounded 100 TB/day
  * stream. The batch Q2 argmax becomes a downstream query over the
  * continuously-maintained window totals (argmax-over-stream has no
  * bounded-state solution in Update mode; maintaining totals and
  * taking top-1 at read is the standard decomposition).
  */
object StreamingOps {

  /** Windowed running totals over an event stream with (ts, value).
    * Works identically on a batch frame (for differential testing)
    * and a streaming frame — the same declarative plan, which is the
    * whole point of Structured Streaming.
    */
  def windowedTotals(events: DataFrame, window_ : String = "30 days"): DataFrame =
    events
      .where(col("value").isNotNull)
      .withWatermark("ts", "30 days")
      .groupBy(window(col("ts"), window_).as("w"))
      .agg(
        Money.sumCents(col("value")).as("cents"),
        count(lit(1)).as("n_events"))
      .select(
        col("w.start").as("window_start"),
        Money.toAmount(col("cents")).as("total"),
        col("n_events"))

  /** Top window by total — run against the in-memory sink of
    * [[windowedTotals]] (or its batch twin) for the Q2 answer.
    */
  def argmaxWindow(totals: DataFrame): DataFrame =
    totals.orderBy(desc("total"), asc("window_start")).limit(1)

  /** Per-user tumbling-window totals — the canonical keyed streaming
    * aggregation: watermark bounds state (a window's state is evicted
    * once the watermark passes its end + delay), exact money in cents
    * per the engine convention, grouped by (user, window). Identical
    * plan batch or streaming; in append mode a (user, window) row is
    * emitted exactly once, when the watermark closes the window —
    * that closure discipline is what [[StreamingGate.q51StreamWindow]]
    * certifies against the batch GROUP BY oracle.
    */
  def userWindowTotals(
      events: DataFrame,
      windowLen: String = "1 hour",
      delay: String = "1 second"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(col("user_id"), window(col("ts"), windowLen).as("w"))
      .agg(count(lit(1)).as("n_events"),
        Money.sumCents(col("value")).as("cents"))
      .select(col("user_id"), col("w.start").as("window_start"),
        col("n_events"), Money.toAmount(col("cents")).as("total"))
}
