package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming windowFunnel — the batch [[graft.operators.Funnel]] DP
  * run incrementally per user, with the out-of-order problem handled
  * HONESTLY: funnel chains are order-sensitive (a step counts only if
  * it lands strictly after the previous step), so events cannot be
  * folded into the DP at arrival time. Instead each micro-batch's
  * events are BUFFERED in state, and only events at or below the
  * current watermark are drained — sorted by event time — into the DP.
  * Late-but-in-horizon events therefore land in their correct order;
  * beyond-horizon events are dropped by the watermark operator
  * upstream, the same trade the other streaming operators make.
  *
  * DP state per user is O(steps) longs: best(i) = the LATEST chain
  * start among chains that have reached step i+1 (later starts leave
  * more window room, so they dominate). Equal-timestamp groups drain
  * atomically in step order against the EVOLVING state, so
  * same-instant steps chain — ClickHouse's default non-decreasing
  * mode, pinned equal to the batch operator by spec; under
  * `strictIncrease` the group applies against the pre-group snapshot
  * instead, so a same-instant next step never extends a chain. The
  * pending buffer is bounded by the
  * watermark horizon × per-user event rate, NOT the stream's
  * lifetime; drained events leave state immediately.
  *
  * Emits (user, level, at) whenever a user's deepest level grows
  * (Update mode).
  */
object StreamingFunnel {

  case class StepEvent(user_id: Long, ts: Timestamp, step: Int)
  case class FunnelProgress(user_id: Long, level: Int, at: Timestamp)
  case class FState(pending: Vector[(Long, Int)], best: Vector[Long],
      emitted: Int)

  private val UNSET = Long.MinValue

  /** @param events  needs `user_id` long, `ts` timestamp, `step` int —
    *                the 0-based index of the funnel step the event
    *                matches (pre-computed by the caller's projection;
    *                non-matching events must be filtered out upstream)
    * @param nSteps  funnel depth
    * @param windowSec chain must complete within this many seconds of
    *                  its first event
    * @param lateness  watermark horizon
    */
  def funnel(events: DataFrame, nSteps: Int, windowSec: Long,
      lateness: String = "10 minutes",
      strictIncrease: Boolean = false): Dataset[FunnelProgress] = {
    val spark = events.sparkSession
    import spark.implicits._

    events.selectExpr("user_id", "ts", "step")
      // one malformed step index would crash the drain and the query
      // would replay it forever from the checkpoint — drop it here
      .filter(s"step >= 0 AND step < $nSteps")
      .withWatermark("ts", lateness)
      .as[StepEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FState, FunnelProgress](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout)(
        processGroup(nSteps, windowSec, strictIncrease))
  }

  /** The per-group state transition — factored out so the timeout /
    * state-removal contract is unit-testable with `TestGroupState`.
    */
  private[streaming] def processGroup(nSteps: Int, windowSec: Long,
      strictIncrease: Boolean = false)(
      user: Long, rows: Iterator[StepEvent],
      state: GroupState[FState]): Iterator[FunnelProgress] = {
    // a group is only invoked when it has input rows OR a timeout
    // fires — buffered events must schedule their own drain via
    // an event-time timeout at the earliest pending timestamp
    val prev = state.getOption.getOrElse(
      FState(Vector.empty, Vector.fill(nSteps)(UNSET), 0))
    val buffered = prev.pending ++
      rows.map(e => (e.ts.getTime, e.step))
    // drain events STRICTLY below the watermark, in event-time
    // order. Strictly: an event AT the watermark may still gain
    // same-timestamp peers in later batches (only ts < wm rows
    // are dropped upstream), and an equal-ts group must drain
    // atomically — it applies against the pre-group state so
    // strict increase holds across the group
    val wm = state.getCurrentWatermarkMs()
    val (ready, stillPending) = buffered.partition(_._1 < wm)
    var best = prev.best
    var level = prev.emitted
    var levelAt = UNSET
    ready.groupBy(_._1).toSeq.sortBy(_._1)
      .foreach { case (t, group) =>
        val before = best
        // default (CH non-decreasing): apply in step order against
        // the EVOLVING state, so a same-instant next step chains;
        // strict: read the pre-group snapshot, so it never does
        group.sortBy(_._2).foreach { case (_, step) =>
          val base = if (strictIncrease) before else best
          if (step == 0)
            best = best.updated(0, math.max(best(0), t))
          // window check floors each side to whole seconds THEN
          // diffs — the batch operator's unix_timestamp form;
          // diff-then-floor disagrees on sub-second fractions
          else if (base(step - 1) != UNSET &&
              t / 1000L - base(step - 1) / 1000L <= windowSec)
            best = best.updated(step,
              math.max(best(step), base(step - 1)))
        }
        val reached = best.lastIndexWhere(_ != UNSET) + 1
        if (reached > level) { level = reached; levelAt = t }
      }
    // drop INERT state: nothing pending and no chain can ever
    // extend (funnel complete, or every recorded start is more
    // than the window behind the watermark — any future event
    // lands past its window). A user re-appearing later re-opens
    // from scratch and may re-emit lower levels; downstream
    // consumers aggregate max(level), the same re-open trade
    // StreamingDedup.consolidateNodes documents.
    val inert = stillPending.isEmpty &&
      (level == nSteps || best.forall(b =>
        b == UNSET || b / 1000L + windowSec < wm / 1000L))
    if (inert) state.remove()
    else state.update(FState(stillPending, best, level))
    if (stillPending.nonEmpty)
      // wake this group when the watermark passes its earliest
      // still-buffered event (min pending > wm here, else it would
      // have drained above). Min pending can EQUAL the watermark
      // (strict drain) and Spark requires a timeout strictly ahead.
      state.setTimeoutTimestamp(
        math.max(stillPending.map(_._1).min, wm + 1))
    else if (!inert)
      // buffer drained but live chain starts remain: wake when the
      // NEWEST start's window expires so the inert check re-runs and
      // the state is removed even if the user never sends another
      // event — otherwise one-shot users would pin FState for the
      // stream's lifetime, breaking the bounded-state claim
      state.setTimeoutTimestamp(math.max(
        (best.filter(_ != UNSET).max / 1000L + windowSec + 1) * 1000L,
        wm + 1))
    if (level > prev.emitted)
      Iterator.single(FunnelProgress(user, level,
        new Timestamp(levelAt)))
    else Iterator.empty
  }
}
