package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequential-conversion funnel — ClickHouse's `windowFunnel`
  * re-expressed relationally: the deepest step K such that some chain
  * of events matching `steps(0) … steps(K-1)` occurs in
  * non-decreasing time order (ClickHouse's default — two steps may
  * share a timestamp; `strictIncrease = true` is CH's
  * `'strict_increase'` mode, every step strictly later) within
  * `windowSec` seconds of the chain's first event.
  *
  * Execution shape: NOT a per-user array fold (collect_list of a
  * user's full history is unbounded state at 100 TB) and NOT a theta
  * self-join (O(n²) per user). Each step advance is a forward "next
  * matching event after t" lookup, computed like [[AsOfJoin]]: union
  * the chain heads with the step's (filtered) events and run ONE
  * (user)-partitioned time-ordered window over the following frame —
  * one shuffle per step over already-filtered rows, linear per-key
  * state.
  *
  * Greedy earliest-next is exact here: for a fixed chain start t1,
  * taking the earliest valid next event minimizes every later
  * timestamp, so if ANY chain from t1 reaches step i, the greedy one
  * does. The per-user max over chain starts is then the funnel level.
  */
object Funnel {

  /** Next event time at-or-after (default) / strictly after (strict
    * mode) `tCol` matching `cond`, per key: heads(side 1) ∪ candidate
    * events(side 0). The equal-time contract lives entirely in the
    * sort's side tie-break — strict: side ASC puts an equal-time
    * candidate BEFORE the head, outside the head's following frame;
    * default: side DESC puts it AFTER the head, inside the frame, so
    * same-timestamp steps chain as ClickHouse's default mode defines.
    */
  private def nextAfter(heads: DataFrame, events: DataFrame, cond: Column,
      userCol: String, tsCol: String, tCol: String, outCol: String,
      strictIncrease: Boolean): DataFrame = {
    val headCols = heads.columns
    val h = heads
      .withColumn("__t", col(tCol))
      .withColumn("__side", lit(1))
      .withColumn("__et", lit(null).cast("timestamp"))
    val e = events.filter(cond)
      .select(Seq(col(userCol), col(tsCol).as("__t"), lit(0).as("__side"),
        col(tsCol).as("__et")) ++
        headCols.filterNot(_ == userCol).map(c => lit(null).as(c)): _*)
    val sideOrder =
      if (strictIncrease) col("__side").asc else col("__side").desc
    val w = Window.partitionBy(userCol)
      .orderBy(col("__t").asc, sideOrder)
      .rowsBetween(1, Window.unboundedFollowing)
    h.unionByName(e.select(h.columns.map(col): _*))
      .withColumn(outCol, min(col("__et")).over(w))
      .filter(col("__side") === 1)
      .select(headCols.map(col) :+ col(outCol): _*)
  }

  /** @param events  event table
    * @param userCol grouping key (the funnel is computed per user)
    * @param tsCol   event-time column
    * @param steps   ordered step predicates over `events`' columns
    * @param windowSec chain must complete within this many seconds of
    *                  its first event
    * @return one row per user present in `events`: (userCol, level)
    *         with level in [0, steps.length]
    */
  def windowFunnel(events: DataFrame, userCol: String, tsCol: String,
      steps: Seq[Column], windowSec: Long,
      strictIncrease: Boolean = false): DataFrame = {
    require(steps.nonEmpty, "windowFunnel needs at least one step")
    var chains = events.filter(steps.head)
      .select(col(userCol), col(tsCol).as("t1"))
    steps.zipWithIndex.drop(1).foreach { case (cond, i) =>
      chains = nextAfter(chains, events, cond, userCol, tsCol,
        s"t$i", s"t${i + 1}", strictIncrease)
    }
    // level of each chain: climb while each t_i exists and lands
    // within the window of t1; stop at the first miss (a later t_j
    // within the window cannot count — its chain is broken)
    val guarded = (2 to steps.length).foldLeft(lit(1)) { case (acc, i) =>
      when(acc === (i - 1) && col(s"t$i").isNotNull &&
        unix_timestamp(col(s"t$i")) - unix_timestamp(col("t1"))
          <= windowSec, lit(i)).otherwise(acc)
    }
    val perChain = chains.withColumn("level", guarded)
    val funnel = perChain.groupBy(userCol)
      .agg(max("level").as("level"))
    // users with no step-1 event at all: level 0
    events.select(userCol).distinct()
      .join(funnel, Seq(userCol), "left")
      .select(col(userCol), coalesce(col("level"), lit(0)).as("level"))
  }

  /** ClickHouse `sequenceMatch('(?1)(?2)…(?N)')` for the ordered-chain
    * pattern: true when the user has SOME strictly time-increasing
    * chain matching every step, with no window bound — windowFunnel
    * with an unbounded window, matched iff the deepest level is N.
    * (Other events may interleave, as in the CH semantics for a
    * pattern without `.*` constraints. CH leaves equal-timestamp
    * ordering UNDEFINED for sequenceMatch; this engine pins the
    * deterministic strict resolution — equal-time events never chain —
    * matching the chSequenceMatch SQL spelling.)
    */
  def sequenceMatch(events: DataFrame, userCol: String, tsCol: String,
      steps: Seq[Column]): DataFrame =
    windowFunnel(events, userCol, tsCol, steps,
        windowSec = Long.MaxValue / 4, strictIncrease = true)
      .select(col(userCol), (col("level") === steps.length).as("matched"))
}
