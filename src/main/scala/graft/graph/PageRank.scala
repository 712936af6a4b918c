package graft.graph

import graft.operators.Dedup.unpersistCheckpoint
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank over the consolidated edge table — the iterative-analytics
  * face of the graph projection (A26–A29 build the nodes/edges;
  * this ranks them).
  *
  * GraphX-style unnormalized recurrence: rank₀ = 1.0 per node,
  * rankₙ₊₁ = (1−d) + d · Σ rankₙ(in-neighbor)/outdeg(in-neighbor);
  * dangling mass is dropped, sinks keep collecting (same contract as
  * Spark GraphX's staticPageRank, which makes results comparable with
  * the ecosystem's most common implementation).
  *
  * Scale shape: per iteration ONE hash join ranks⋈edges on src (the
  * rank side is one row per node — orders smaller than the edge
  * table) and one (dst) aggregation; both shuffle on node id, so a
  * hot page is one key (AQE-splittable), never one partition. Each
  * round localCheckpoints and unpersists the previous round —
  * un-checkpointed iterative self-joins grow the logical plan
  * exponentially, and persist() alone does not truncate it (measured
  * on the connected-components loop; see Dedup.connectedComponents).
  */
object PageRank {

  /** @param edges (src, dst) directed edge table, multi-edges allowed
    *              (they weight the contribution, as repeated links do)
    */
  def run(edges: DataFrame, iterations: Int = 10, damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .localCheckpoint()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    val outDeg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("outdeg"))
    // static per-node frame reused every round: id, outdeg (null for sinks)
    val base = nodes.join(outDeg, Seq("id"), "left").localCheckpoint()

    var ranks = base.select(col("id"), lit(1.0).as("rank"))
      .localCheckpoint()
    // the most recent MATERIALIZED ranks — the unpersist target when
    // the current `ranks` is a lazy odd-round plan on top of it
    var lastMat = ranks
    var i = 0
    while (i < iterations) {
      val contribs = e
        .join(ranks.join(base, Seq("id")).select(
          col("id").as("src"), (col("rank") / col("outdeg")).as("contrib")), "src")
        .groupBy(col("dst").as("id"))
        .agg(sum("contrib").as("inflow"))
      val updated = base.select("id")
        .join(contribs, Seq("id"), "left")
        .select(col("id"),
          (lit(1.0 - damping) + lit(damping) * coalesce(col("inflow"), lit(0.0)))
            .as("rank"))
      // checkpoint every SECOND iteration: `ranks` feeds exactly one
      // consumer per round, so a lazy odd round only deepens the plan
      // (no re-execution) and the even round's checkpoint truncates
      // it — half the materialization jobs for the same plan bound
      // (measured g04: 2.07 → see bench note). The final iteration
      // always checkpoints so callers get cached state.
      if (i % 2 == 1 || i == iterations - 1) {
        val mat = updated.localCheckpoint()
        unpersistCheckpoint(lastMat)
        ranks = mat
        lastMat = mat
      } else ranks = updated
      i += 1
    }
    unpersistCheckpoint(e)
    unpersistCheckpoint(base)
    ranks
  }

  /** Per-node fixed-point residual |rank − ((1−d) + d·Σ inflow)| — one
    * extra application of the recurrence against a given rank vector.
    *
    * This is what makes PageRank oracle-able without a cross-engine
    * float compare (the g04 gate): the emitted check is a BOOLEAN
    * (residual < ε), and on a converged vector the residual is the
    * next iteration's delta (measured ~1e-14 on the test graph by
    * iteration 3, against the gate's ε = 1e-9). Same join/agg shape
    * as one [[run]] round — scales identically.
    */
  def withResidual(edges: DataFrame, ranks: DataFrame,
      damping: Double = 0.85): DataFrame = {
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
    val outDeg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("outdeg"))
    val contribs = e
      .join(ranks.join(outDeg, Seq("id")).select(
        col("id").as("src"), (col("rank") / col("outdeg")).as("contrib")), "src")
      .groupBy(col("dst").as("id"))
      .agg(sum("contrib").as("inflow"))
    ranks.join(contribs, Seq("id"), "left")
      .select(col("id"), col("rank"),
        abs(col("rank") - (lit(1.0 - damping) +
          lit(damping) * coalesce(col("inflow"), lit(0.0)))).as("residual"))
  }
}
