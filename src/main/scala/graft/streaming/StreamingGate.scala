package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.sources.Tables
import graft.Catalog.Q

/** Driver-visible gate for the streaming surface: q41 runs the REAL
  * streaming sessionizer ([[StreamingSessionize]], the
  * flatMapGroupsWithState operator with event-time timeouts) over a
  * bounded stream of the judged events table and emits exactly the
  * batch twin's schema, so the same DuckDB oracle as q26 certifies
  * backfill-vs-live parity under the hard hash gate — not just in a
  * MemoryStream spec.
  *
  * Bounded-harness shape (judged runs only): the events table is
  * small at test SF, so it is fed through a MemoryStream in one
  * micro-batch, followed by one far-future sentinel event per user
  * whose gap closes every open session deterministically (no reliance
  * on wall-clock or timeout races). Sentinel sessions themselves stay
  * open in state and are never emitted. In production the same
  * `sessionize` dataset-to-dataset transform runs unchanged on a
  * `readStream` source (Kafka / file) with the watermark + timeout
  * doing the flushing — the collect here is the bounded test harness,
  * not the operator's data path.
  */
/** Full event row for the streaming-dedup gate (value is nullable). */
final case class DedupEvent(
    event_id: Long, user_id: Long, ts: Timestamp, value: Option[Double])

object StreamingGate {

  def q41StreamSessionize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val events = Tables.events(s, d)
      .where(col("value").isNotNull)
      .select(col("user_id"), col("ts"), col("value"))
      .as[SessionEvent]
      .collect() // bounded judged harness only — see scaladoc
    val maxUs = events.iterator.map(e =>
      e.ts.getTime * 1000 + (e.ts.getNanos / 1000) % 1000).max
    // one sentinel per user, one gap past the global max: its arrival
    // closes that user's open session via the gap rule in the same
    // deterministic way a watermark-timeout would at stream scale
    val sentinelTs = new Timestamp((maxUs + StreamingSessionize.GapMicros) / 1000 + 1000)
    val sentinels = events.iterator.map(_.user_id).toSet.toSeq.sorted
      .map(u => SessionEvent(u, sentinelTs, 0.0))

    val mem = MemoryStream[SessionEvent]
    val queryName = "graft_q41_sessions"
    // streaming state-store partitioning is FROZEN at first batch from
    // spark.sql.shuffle.partitions; the bounded judged harness holds a
    // few thousand keys, and every extra partition costs a state-store
    // provider + delta file per micro-batch (32 → 8 ≈ halves the
    // harness wall-clock). Production sizing belongs to the deployed
    // session conf — this scope-and-restore only narrows the bounded
    // harness runs.
    val pKey = "spark.sql.shuffle.partitions"
    val prevP = s.conf.get(pKey)
    s.conf.set(pKey, "8")
    val query =
      try StreamingSessionize.sessionize(mem.toDS())
        .writeStream.format("memory").queryName(queryName)
        .outputMode("append").start()
      finally s.conf.set(pKey, prevP)
    try {
      mem.addData(events.toSeq)
      query.processAllAvailable()
      mem.addData(sentinels)
      query.processAllAvailable()
    } finally query.stop()

    // emitted sessions are exactly the real ones (sentinel sessions
    // never close); rebuild the batch twin's presentation: per-user
    // session sequence in time order, cents back to one double
    val w = Window.partitionBy(col("user_id")).orderBy(col("session_start"))
    s.table(queryName)
      .withColumn("session_seq", row_number().over(w).cast(LongType))
      .select(col("user_id"), col("session_seq"),
        col("session_start"), col("session_end"), col("n_events"),
        (col("total_cents").cast("double") / 100.0).as("total"))
      .orderBy(col("user_id"), col("session_seq"))
  }

  /** Driver-visible gate for the WINDOWED streaming surface: the
    * per-user tumbling-window aggregation
    * ([[StreamingOps.userWindowTotals]] — watermark + window state,
    * append mode) over a bounded stream of the judged events table,
    * checked against the plain batch GROUP BY oracle. Harness shape
    * mirrors q41, with one difference that is itself the point:
    * window closure is driven by the GLOBAL watermark, so a SINGLE
    * sentinel event (user −1, one window-length plus slack past the
    * global max) flushes every user's windows — no per-key sentinel
    * needed. The sentinel's own window never closes and is never
    * emitted, so the memory sink holds exactly the real windows.
    */
  def q51StreamWindow(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val events = Tables.events(s, d)
      .where(col("value").isNotNull)
      .select(col("user_id"), col("ts"), col("value"))
      .as[SessionEvent]
      .collect() // bounded judged harness only — see q41's scaladoc
    val maxMs = events.iterator.map(_.ts.getTime).max
    // one hour (the window length) past the max closes every real
    // window once the 1s watermark delay is subtracted; +10s slack
    val sentinel = SessionEvent(-1L,
      new Timestamp(maxMs + 3600L * 1000 + 10000), 0.0)

    val mem = MemoryStream[SessionEvent]
    val queryName = "graft_q51_windows"
    val pKey = "spark.sql.shuffle.partitions"
    val prevP = s.conf.get(pKey)
    s.conf.set(pKey, "8") // state-store sizing: see q41's comment
    val query =
      try StreamingOps.userWindowTotals(mem.toDF())
        .writeStream.format("memory").queryName(queryName)
        .outputMode("append").start()
      finally s.conf.set(pKey, prevP)
    try {
      mem.addData(events.toSeq)
      query.processAllAvailable()
      mem.addData(Seq(sentinel))
      query.processAllAvailable()
    } finally query.stop()

    s.table(queryName)
      .orderBy(col("user_id"), col("window_start"))
  }

  /** Driver-visible gate for STREAMING DEDUP
    * ([[StreamingDedup.dedupExact]] — dropDuplicatesWithinWatermark
    * on a content digest): the judged harness feeds every event
    * TWICE, in two separate micro-batches, so the duplicate
    * suppression is cross-batch STATE, not just in-batch distinct —
    * and the planted duplication makes the exactly-once claim
    * non-vacuous by construction (a prior round's d6 lesson: this
    * fixture has no natural exact duplicates). The horizon (40 days)
    * exceeds the fixture's 30-day event span, so nothing is dropped
    * as late: every batch-2 replay is suppressed by a state lookup.
    * Oracle = the events table itself — streaming dedup of a doubled
    * stream must be the identity.
    */
  def q54StreamDedup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val events = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .as[DedupEvent]
      .collect() // bounded judged harness only — see q41's scaladoc
    val mem = MemoryStream[DedupEvent]
    val queryName = "graft_q54_dedup"
    val pKey = "spark.sql.shuffle.partitions"
    val prevP = s.conf.get(pKey)
    s.conf.set(pKey, "8") // state-store sizing: see q41's comment
    // ANSI mode rejects BIGINT→BINARY, so digest a string payload
    val withPayload = mem.toDF()
      .withColumn("payload", col("event_id").cast("string"))
    val query =
      try StreamingDedup.dedupExact(withPayload, "payload", "ts", "40 days")
        .writeStream.format("memory").queryName(queryName)
        .outputMode("append").start()
      finally s.conf.set(pKey, prevP)
    try {
      mem.addData(events.toSeq)
      query.processAllAvailable()
      mem.addData(events.toSeq) // full replay: every row a duplicate
      query.processAllAvailable()
    } finally query.stop()
    s.table(queryName)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .orderBy(col("event_id"))
  }

  val queries: Seq[Q] = Seq(
    Q("q54_stream_dedup", q54StreamDedup, Some("""
      SELECT event_id, user_id, date_trunc('microsecond', ts) AS ts, value
      FROM events
      ORDER BY event_id""")),
    Q("q51_stream_window", q51StreamWindow, Some("""
      SELECT user_id,
             date_trunc('hour', ts) AS window_start,
             count(*) AS n_events,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS total
      FROM events
      WHERE value IS NOT NULL
      GROUP BY user_id, date_trunc('hour', ts)
      ORDER BY user_id, window_start""")),
    // same oracle as the batch twin q26 — THE equivalence claim.
    // Looked up BY NAME: a positional `.head` would silently attach
    // the wrong oracle if a query were ever prepended to Sessionize's
    // list; a rename now fails loudly at class-load instead.
    Q("q41_stream_sessionize", q41StreamSessionize,
      graft.operators.Sessionize.queries
        .find(_.name == "q26_sessionize")
        .getOrElse(throw new IllegalStateException(
          "q26_sessionize not found — the streaming gate shares its oracle"))
        .oracle))
}
