package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.Sessionize

/** q73's built-in session_window vs q26's lag-gap islands: measured
  * on an exact-boundary fixture, session_window's merge rule is
  * INCLUSIVE — a gap of exactly the window length KEEPS the session
  * (next.ts ≤ prev.ts + gap merges), the same island rule as q26's
  * strict-`>` break. The plausible half-open reading ([ts, ts+gap)
  * spans → `>=` break) is wrong, and q73's oracle briefly encoded
  * it — only this boundary fixture exposed the error (the judged
  * corpus has no exact-gap pair). The spec pins the true rule so
  * the oracle can never drift back.
  */
class SessionWindowSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(minutes: Long) = new Timestamp(minutes * 60 * 1000)

  // one user: an event exactly 30 minutes (the gap length) after the
  // first, a third inside the gap, then a fourth one ms PAST the gap
  // (getTime is milliseconds, so +1 is the smallest Timestamp step here)
  private def fixture = Seq(
    (1L, ts(0), 1.0),
    (1L, ts(30), 1.0),
    (1L, ts(31), 1.0),
    (1L, new Timestamp(ts(61).getTime + 1), 1.0)
  ).toDF("user_id", "ts", "value")

  test("session_window KEEPS a session on a gap of exactly the window length, splits just past it") {
    val n = fixture
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .count()
      .count()
    assert(n === 2L,
      "[t0, t30, t31] must merge (inclusive boundary); t61+1ms must split")
  }

  test("the q26 islands rule keeps a session on the exact-gap boundary") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"))
    val n = fixture
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_s",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > Sessionize.GapMicros, 1)
          .otherwise(0))
      .agg(sum(col("new_s"))).head.getLong(0)
    // session starts: the first event and the one 1 ms past the gap
    // — the exact-30-minute gap does NOT break (strict > rule), so
    // the islands agree with session_window's inclusive merge
    assert(n === 2L, "a 30-minute gap must NOT break a q26 session (> rule)")
  }

  test("q73 and q26 agree exactly when no gap sits on the boundary") {
    val d = sf("sf0.001")
    val a = Sessionize.q73SessionWindow(spark, d).collect()
    val b = Sessionize.q26Sessionize(spark, d).collect()
    // the synthetic fixture has no exact-30-minute gap, so the two
    // formulations must produce identical session sets
    assert(a.nonEmpty)
    assert(a === b)
  }
}
