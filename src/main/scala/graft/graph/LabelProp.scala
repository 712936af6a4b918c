package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronized label propagation — community detection over the
  * near-dup similarity graph (the "cluster then sample/curate per
  * community" step of corpus curation, where CC is too coarse: CC
  * merges everything reachable, LPA keeps weakly-bridged clusters
  * apart).
  *
  * Deterministic by construction, so it can carry a full relational
  * oracle: a FIXED number of synchronized rounds (no convergence
  * race), each node adopting the most frequent label among its
  * neighbors with ties to the SMALLEST label. The mode-pick is
  * `max(struct(cnt, -label))` — one aggregation, no window, no sort.
  *
  * Scale shape: per round, one hash join (edges ⋈ labels on dst, both
  * keyed small — (id, label) pairs only) and two aggregations whose
  * shuffles carry (src, label, count). The pair detector feeding the
  * edge list is checkpointed ONCE; the rounds themselves stay one
  * lazy DAG (each round's labels feed exactly one consumer, so
  * per-round materialization would buy nothing — unlike CC's loop,
  * which re-reads its own output and must cache it).
  */
object LabelProp {

  def run(pairs: DataFrame, iterations: Int,
      srcCol: String = "id_a", dstCol: String = "id_b"): DataFrame = {
    require(iterations >= 1, "need at least one round")
    val p = pairs.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint()
    val edges = p.union(p.select(col("dst").as("src"), col("src").as("dst")))
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id"))
    (1 to iterations).foreach { _ =>
      labels = edges
        .join(labels.select(col("id").as("dst"), col("lbl")), "dst")
        .groupBy("src", "lbl").agg(count(lit(1)).as("cnt"))
        .groupBy("src")
        .agg(max(struct(col("cnt"), negate(col("lbl")).as("nl"))).as("m"))
        .select(col("src").as("id"),
          negate(col("m.nl")).cast("long").as("lbl"))
    }
    // materialize the result eagerly so the pair-detector checkpoint
    // can be FREED here — a checkpoint returned inside a lazy plan
    // would otherwise stay pinned in executor storage for the session
    // (the jaccardPairsRaw leak note, avoided)
    val out = labels.localCheckpoint()
    graft.operators.Dedup.unpersistCheckpoint(p)
    out
  }
}
