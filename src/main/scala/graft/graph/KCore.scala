package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronized k-core peeling — the degeneracy filter of graph-based
  * corpus curation: nodes that cannot sustain `k` connections after
  * their weakly-connected neighbors are removed (spam clusters, link
  * farms, orphan near-dups) peel away, and what remains is the
  * k-core's fixed-point approximation after a FIXED number of rounds.
  *
  * Fixed rounds — not run-to-fixpoint — for the same reason
  * [[LabelProp]] pins its iteration count: the result is a pure
  * function of the input (no convergence race), so a relational
  * oracle can unroll the same rounds exactly. At 100 TB `rounds` is
  * the per-pass iteration budget; production repeats passes until a
  * round removes nothing (each pass is this operator re-applied).
  *
  * Scale shape: each round is one degree aggregation (shuffle carries
  * (node, count)) and two LEFT SEMI joins of the edge list against
  * the surviving-node set — all hash joins on ids, no window, no
  * sort, and the edge list only ever SHRINKS. Each round's edges are
  * localCheckpointed and the previous round's checkpoint freed (the
  * CC loop's discipline, NOT LabelProp's lazy chaining): the loop
  * variable is referenced THREE times per round (semi-join left side
  * plus twice inside the degree filter), so an un-materialized chain
  * would grow the logical plan ~3^rounds and hang the driver at the
  * iteration budgets a real pass uses.
  */
object KCore {

  def peel(pairs: DataFrame, k: Int, rounds: Int,
      srcCol: String = "id_a", dstCol: String = "id_b"): DataFrame = {
    require(k >= 1 && rounds >= 1, "need k >= 1 and at least one round")
    val p = pairs.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint()
    var edges = p.union(p.select(col("dst").as("src"), col("src").as("dst")))
    var prevRound: Option[DataFrame] = None
    (1 to rounds).foreach { _ =>
      // name-based `using` joins sidestep the self-join exprId
      // ambiguity (keep is derived FROM edges, so cross-frame column
      // references would resolve against both sides)
      val keep = edges.groupBy("src").agg(count(lit(1)).as("dg"))
        .filter(col("dg") >= k).select(col("src").as("node"))
      val next = edges
        .join(keep.withColumnRenamed("node", "src"), Seq("src"), "left_semi")
        .join(keep.withColumnRenamed("node", "dst"), Seq("dst"), "left_semi")
        .localCheckpoint()
      prevRound.foreach(graft.operators.Dedup.unpersistCheckpoint)
      prevRound = Some(next)
      edges = next
    }
    val out = edges.groupBy("src").agg(count(lit(1)).as("degree"))
      .select(col("src").as("node_id"), col("degree"))
      .localCheckpoint()
    prevRound.foreach(graft.operators.Dedup.unpersistCheckpoint)
    graft.operators.Dedup.unpersistCheckpoint(p)
    out
  }
}
