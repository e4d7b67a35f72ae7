package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One user event on the stream (event-time `ts`, µs precision). */
final case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)

/** A closed session. Money carried as exact cents. */
final case class UserSession(
    user_id: Long, session_start: Timestamp, session_end: Timestamp,
    n_events: Long, total_cents: Long)

/** Open-session state held per user between micro-batches. */
final case class SessionState(
    start: Long, last: Long, n: Long, cents: Long)

/** Stateful streaming sessionization via flatMapGroupsWithState —
  * the custom-state surface (KeyValueGroupedDataset) the built-in
  * windowed aggregations can't express: session boundaries depend on
  * data (gaps), not the clock grid.
  *
  * State per user is O(1) (one open session), closed sessions emit
  * in Append mode, and the event-time timeout (watermark past the
  * gap) both flushes idle sessions and bounds state lifetime — the
  * properties that let this run indefinitely at stream scale.
  *
  * Batch twin: `operators.Sessionize.q26Sessionize` (same gap rule,
  * oracle-checked); StreamingSpec drives this one through real
  * micro-batches and compares.
  */
object StreamingSessionize {

  val GapMicros: Long = 30L * 60 * 1000000

  private def micros(t: Timestamp): Long =
    t.getTime * 1000 + (t.getNanos / 1000) % 1000

  private def toTs(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000)
    t.setNanos(((us % 1000000) * 1000).toInt)
    t
  }

  private def close(userId: Long, st: SessionState): UserSession =
    UserSession(userId, toTs(st.start), toTs(st.last), st.n, st.cents)

  /** Merge a micro-batch of one user's events into the open-session
    * state; emit every session the batch closes. Events within the
    * batch are sorted by event time (Spark does not pre-sort groups).
    */
  def updateUser(
      userId: Long,
      events: Iterator[SessionEvent],
      state: GroupState[SessionState]): Iterator[UserSession] = {
    if (state.hasTimedOut) {
      val out = state.getOption.map(close(userId, _))
      state.remove()
      return out.iterator
    }
    val sorted = events.toSeq.sortBy(e => micros(e.ts))
    var open = state.getOption
    val closed = Seq.newBuilder[UserSession]
    sorted.foreach { e =>
      val t = micros(e.ts)
      // HALF_UP away from zero, matching the batch twin's Spark
      // round() (Money.cents); math.round would round negative
      // half-cents toward +infinity and break backfill-vs-live parity
      val cents = BigDecimal(e.value * 100)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).longValue
      open match {
        case Some(st) if t - st.last <= GapMicros =>
          open = Some(SessionState(st.start, math.max(st.last, t),
            st.n + 1, st.cents + cents))
        case Some(st) =>
          closed += close(userId, st)
          open = Some(SessionState(t, t, 1, cents))
        case None =>
          open = Some(SessionState(t, t, 1, cents))
      }
    }
    open.foreach { st =>
      state.update(st)
      // flush once the watermark passes the session's gap horizon
      state.setTimeoutTimestamp(st.last / 1000 + GapMicros / 1000)
    }
    closed.result().iterator
  }

  /** events(user_id, ts, value) stream → closed-session stream. */
  def sessionize(events: Dataset[SessionEvent]): Dataset[UserSession] = {
    implicit val se = Encoders.product[SessionState]
    implicit val ue = Encoders.product[UserSession]
    val s = events.sparkSession
    import s.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(updateUser)
  }
}
