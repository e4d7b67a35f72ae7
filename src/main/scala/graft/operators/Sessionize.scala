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

  def q26Sessionize(s: SparkSession, d: String): DataFrame = {
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
      .orderBy(col("user_id"), col("session_seq"))
  }

  val queries: Seq[Q] = Seq(
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
