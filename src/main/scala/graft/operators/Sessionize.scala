package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Money
import graft.sources.Tables
import graft.Catalog.Q

/** Gap-based sessionization of the event stream (batch form): events
  * of a user belong to one session while consecutive gaps stay under
  * 30 minutes.
  *
  * Classic two-window formulation: lag → new-session flag → running
  * sum as session sequence → per-session aggregate. One shuffle on
  * user_id serves both windows and the final aggregate (they share
  * the partitioning), so the whole operator costs a single exchange
  * at any scale.
  *
  * Gap arithmetic runs on integer epoch-microseconds, not intervals:
  * exact in both engines, and it pins the ns→µs truncation boundary
  * (the oracle mirrors the truncation explicitly with
  * date_trunc('microsecond')).
  */
object Sessionize {

  val GapMicros: Long = 30L * 60 * 1000000 // 30 minutes

  /** The per-session frame (user_id, session_seq, session_start,
    * session_end, n_events, total) without the presentation sort —
    * q26's judged body, shared with q75's session-to-window overlap
    * probe (which immediately re-shuffles, so the sort would be
    * wasted work there).
    */
  private[graft] def sessionFrame(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, 0)
    Tables.events(s, d)
      .where(col("value").isNotNull)
      .select(col("user_id"), col("ts"), col("value"))
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_s",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > GapMicros, 1).otherwise(0))
      .withColumn("session_seq", sum(col("new_s")).over(wRun))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        Money.exactSum(col("value")).as("total"))
  }

  def q26Sessionize(s: SparkSession, d: String): DataFrame =
    sessionFrame(s, d).orderBy(col("user_id"), col("session_seq"))

  /** Built-in `session_window` sessionization, judged against an
    * INDEPENDENT gaps-and-islands oracle — certifying Spark's native
    * session operator, not just our hand-rolled q26 twin. Boundary
    * semantics pinned by SessionWindowSpec on an exact-gap fixture:
    * session_window's merge rule is INCLUSIVE (next.ts ≤ prev.ts +
    * gap merges — a gap of exactly the window length keeps the
    * session), which is the same island rule as q26's strict-`>`
    * break — a plausible half-open reading (`>=` break) is WRONG and
    * the spec exists because this oracle briefly encoded it; only
    * the boundary fixture exposed the error. Same single shuffle on
    * the grouping key at any scale; in streaming this exact operator
    * becomes watermark-managed session state, so the batch gate here
    * is the backfill twin of that path. session_seq derives from
    * ranking session_start per user (one more window over the
    * already-aggregated, session-count-sized frame).
    */
  def q73SessionWindow(s: SparkSession, d: String): DataFrame = {
    val sessions = Tables.events(s, d)
      .where(col("value").isNotNull)
      .select(col("user_id"), col("ts"), col("value"))
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        Money.exactSum(col("value")).as("total"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("session_start"))
    sessions
      .withColumn("session_seq", row_number().over(w).cast(LongType))
      .select(col("user_id"), col("session_seq"), col("session_start"),
        col("session_end"), col("n_events"), col("total"))
      .orderBy(col("user_id"), col("session_seq"))
  }

  /** Session-to-window attribution through the custom INTERVAL
    * OVERLAP join (graft.plans.IntervalJoin — the general case of
    * q70's point shape): per analysis window, how many user sessions
    * were active. Probe = the q26 session frame as half-open
    * [start_us, end_us + 1) intervals; build = 512 OVERLAPPING
    * analysis windows (half the span each stride, so ~2 cover any
    * instant) derived arithmetically from the event span INSIDE the
    * plan — the span aggregate is a 1-row crossJoin spine (the q39
    * precedent), collected only as part of the 512-row build side.
    * Stock Spark plans interval-overlap-with-no-equi-key as a
    * BroadcastNestedLoopJoin (sessions × 512 predicate evals); the
    * operator pays (log 512 + overlaps) per session and streams the
    * probe unshuffled. The oracle recomputes sessions via the
    * islands CTE and joins with the plain range predicate — proving
    * the sorted-search overlap exact, end to end, through integer
    * microsecond arithmetic both engines share.
    */
  def q75SessionWindowOverlap(s: SparkSession, d: String): DataFrame = {
    val sess = sessionFrame(s, d).select(
      col("user_id"),
      unix_micros(col("session_start")).as("s_lo"),
      (unix_micros(col("session_end")) + 1).as("s_hi"))
    val span = Tables.events(s, d)
      .where(col("value").isNotNull)
      .agg(unix_micros(min(col("ts"))).as("min_us"),
        unix_micros(max(col("ts"))).as("max_us"))
    val win = span.crossJoin(s.range(0, 512).select(col("id").as("w_id")))
      .withColumn("span_us", col("max_us") - col("min_us") + 1)
      .select(col("w_id"),
        (col("min_us") + expr("span_us * w_id div 512")).as("w_lo"),
        (col("min_us") + expr("span_us * (w_id + 2) div 512")).as("w_hi"))
    graft.plans.RangeJoinApi
      .intervalOverlap(sess, "s_lo", "s_hi", win, "w_lo", "w_hi")
      .groupBy(col("w_id"))
      .agg(count(lit(1)).as("n_sessions"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("w_id"))
  }

  /** Funnel analysis — the ordered-sequence event query: per user,
    * the first `view`, the first `click` strictly AFTER that view,
    * and the first `purchase` strictly after that click; stage = how
    * deep the user got. Order matters (a click before any view does
    * not count), which is what separates a funnel from three plain
    * mins. Three stage-scoped aggregates chained by inequality
    * joins, all on integer epoch-micros so the comparisons are
    * exact. Scale: each stage is one shuffle on user_id (the same
    * key every time — co-partitioned), and each stage's input is
    * pre-filtered to its event type before the join, so the joined
    * sides are the type-sliced minority of the stream, never the
    * whole firehose.
    */
  def q57Funnel(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("t"))
    def stage(tpe: String): DataFrame = ev.where(col("event_type") === tpe)
    val v = stage("view").groupBy(col("user_id")).agg(min(col("t")).as("t_view"))
    val c = stage("click").join(v, "user_id")
      .where(col("t") > col("t_view"))
      .groupBy(col("user_id"), col("t_view")).agg(min(col("t")).as("t_click"))
    val p = stage("purchase").join(c, "user_id")
      .where(col("t") > col("t_click"))
      .groupBy(col("user_id"), col("t_click")).agg(min(col("t")).as("t_buy"))
    v.join(c.select(col("user_id"), col("t_click")), Seq("user_id"), "left")
      .join(p.select(col("user_id"), col("t_buy")), Seq("user_id"), "left")
      .select(col("user_id"), col("t_view"), col("t_click"), col("t_buy"),
        (lit(1) + col("t_click").isNotNull.cast(IntegerType) +
          col("t_buy").isNotNull.cast(IntegerType)).as("funnel_stage"))
      .orderBy(col("user_id"))
  }

  val queries: Seq[Q] = Seq(
    Q("q57_funnel", q57Funnel, Some("""
      WITH e AS (
        SELECT user_id, event_type, epoch_us(ts) AS t FROM events),
      v AS (
        SELECT user_id, min(t) AS t_view
        FROM e WHERE event_type = 'view' GROUP BY user_id),
      c AS (
        SELECT e.user_id, min(e.t) AS t_click
        FROM e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.t > v.t_view
        GROUP BY e.user_id),
      p AS (
        SELECT e.user_id, min(e.t) AS t_buy
        FROM e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.t > c.t_click
        GROUP BY e.user_id)
      SELECT v.user_id, v.t_view, c.t_click, p.t_buy,
             CAST(1 + (c.t_click IS NOT NULL)::INTEGER
                    + (p.t_buy IS NOT NULL)::INTEGER AS INTEGER) AS funnel_stage
      FROM v LEFT JOIN c ON v.user_id = c.user_id
             LEFT JOIN p ON v.user_id = p.user_id
      ORDER BY v.user_id""")),
    Q("q75_session_window_overlap", q75SessionWindowOverlap, Some("""
      WITH e AS (
        SELECT user_id, date_trunc('microsecond', ts) AS ts, value
        FROM events WHERE value IS NOT NULL),
      m AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                    THEN 1 ELSE 0 END AS new_s
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      s AS (
        SELECT user_id, ts,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM m),
      sess AS (
        SELECT user_id,
               epoch_us(min(ts)) AS s_lo,
               epoch_us(max(ts)) + 1 AS s_hi
        FROM s GROUP BY user_id, session_seq),
      spans AS (
        SELECT epoch_us(min(ts)) AS min_us, epoch_us(max(ts)) AS max_us
        FROM e),
      win AS (
        SELECT CAST(range AS BIGINT) AS w_id,
               min_us + (max_us - min_us + 1) * range // 512 AS w_lo,
               min_us + (max_us - min_us + 1) * (range + 2) // 512 AS w_hi
        FROM range(0, 512), spans)
      SELECT w_id,
             count(*) AS n_sessions,
             count(DISTINCT user_id) AS n_users
      FROM win JOIN sess ON s_lo < w_hi AND w_lo < s_hi
      GROUP BY w_id
      ORDER BY w_id""")),
    Q("q73_session_window", q73SessionWindow, Some("""
      WITH e AS (
        SELECT user_id, date_trunc('microsecond', ts) AS ts, value
        FROM events WHERE value IS NOT NULL),
      m AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                    THEN 1 ELSE 0 END AS new_s
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      s AS (
        SELECT user_id, ts, value,
               CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        FROM m)
      SELECT user_id, session_seq,
             min(ts) AS session_start,
             max(ts) AS session_end,
             count(*) AS n_events,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total
      FROM s
      GROUP BY user_id, session_seq
      ORDER BY user_id, session_seq""")),
    Q("q26_sessionize", q26Sessionize, Some("""
      WITH e AS (
        SELECT user_id, date_trunc('microsecond', ts) AS ts, value
        FROM events WHERE value IS NOT NULL),
      m AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                    THEN 1 ELSE 0 END AS new_s
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      s AS (
        SELECT user_id, ts, value,
               CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        FROM m)
      SELECT user_id, session_seq,
             min(ts) AS session_start,
             max(ts) AS session_end,
             count(*) AS n_events,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total
      FROM s
      GROUP BY user_id, session_seq
      ORDER BY user_id, session_seq"""))
  )
}
