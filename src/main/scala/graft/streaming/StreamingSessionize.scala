package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization over an unbounded event stream — the
  * streaming face of the batch r18 query: the same "gap > N closes the
  * session" semantics, expressed as per-key state instead of a window
  * over a completed log.
  *
  * `flatMapGroupsWithState` with EventTimeTimeout: state is ONE open
  * session (start, last-seen, count) per active user — bounded by
  * concurrently-active keys, not event volume — and a session is
  * emitted exactly once, when the watermark passes its last event +
  * gap (no earlier: a late-but-in-horizon event can still extend it).
  * At 100 TB/day the state store shuffles on user_id like any
  * streaming agg; skew means one hot key, not one hot partition.
  *
  * Late events beyond the watermark horizon are dropped by the
  * watermark operator before they reach the state function — same
  * trade as [[StreamingStats.repoActivity]].
  */
object StreamingSessionize {

  case class SessionEvent(user_id: Long, ts: Timestamp)
  case class OpenSession(start: Long, lastMs: Long, n: Long)
  case class ClosedSession(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long)

  /** Sessionize `events` (needs `user_id` long + `ts` timestamp).
    * @param gap      max silence inside one session (e.g. "30 minutes")
    * @param lateness watermark horizon for late events
    */
  def sessions(events: DataFrame, gap: String = "30 minutes",
      lateness: String = "10 minutes"): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(gap))
    val gapMillis =
      gapMs.days * 86400000L + gapMs.microseconds / 1000L
    require(gapMs.months == 0, "gap must be a fixed-length interval")

    events.selectExpr("user_id", "ts")
      .withWatermark("ts", lateness)
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[SessionEvent], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            // watermark passed last event + gap: close and emit
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(
              user, new Timestamp(s.start), new Timestamp(s.lastMs), s.n))
          } else {
            // fold the micro-batch's events (they may arrive unsorted
            // within the batch) into the open session. An event extends
            // the session only if it falls within `gap` of the session
            // SPAN [start-gap, last+gap] — extending start backward for
            // in-horizon late events. A later event past the gap closes
            // the session; a late event more than `gap` BEFORE start is
            // emitted as its own single-event session immediately (two
            // such stragglers that would merge in a batch recompute
            // emit separately — the bounded-state trade, documented).
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var open = state.getOption
            val closed = Seq.newBuilder[ClosedSession]
            sorted.foreach { e =>
              val t = e.ts.getTime
              open match {
                case Some(s) if t >= s.start - gapMillis && t - s.lastMs <= gapMillis =>
                  open = Some(OpenSession(math.min(s.start, t),
                    math.max(s.lastMs, t), s.n + 1))
                case Some(s) if t < s.start - gapMillis =>
                  closed += ClosedSession(user, e.ts, e.ts, 1)
                case Some(s) =>
                  closed += ClosedSession(
                    user, new Timestamp(s.start), new Timestamp(s.lastMs), s.n)
                  open = Some(OpenSession(t, t, 1))
                case None =>
                  open = Some(OpenSession(t, t, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastMs + gapMillis)
            }
            closed.result().iterator
          }
      }
  }
}
