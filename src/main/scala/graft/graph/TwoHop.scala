package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Two-hop neighborhood sizes over an undirected pair graph, with an
  * optional HUB-SALTED wedge join for skewed degree distributions.
  *
  * The wedge join (`e1.dst == e2.src`) keys on the INTERMEDIATE node:
  * a hub of degree D funnels D×D candidate rows through the single
  * reduce task that owns its key. This is output-explosion skew — the
  * hub's shuffle INPUT (2·D rows) looks balanced, so AQE's skew-join
  * split (which watches shuffle-read partition bytes) never fires;
  * the guard has to live in the plan. With `degreeCap > 0`:
  *
  *  - node degrees are one aggregation; nodes above the cap form the
  *    HOT set — on any real (power-law) graph a tiny relation, so it
  *    broadcasts;
  *  - wedges ARRIVING at a hot node salt deterministically by the far
  *    endpoint (`xxhash64(src) mod buckets` — reproducible, no rand());
  *  - wedges LEAVING a hot node replicate across all `buckets` salts;
  *  - the join adds the salt to the key, spreading each hub's D×D
  *    expansion over `buckets` tasks. Cold keys keep salt 0 on both
  *    sides — no replication, byte-identical work to the unguarded
  *    form.
  *
  * The result is EXACTLY the unguarded result for every graph (the
  * salt only partitions each hub's cross product; g11's oracle is
  * g08's verbatim), and the skewed-graph rehearsal leg (SCALE.md
  * graph mode) measures the max-task-time bound the guard buys
  * (measured at hub degree 5000: max task 18.4 s → 2.3 s, wall
  * 20.3 s → 4.5 s, identical output).
  *
  * DEPLOYMENT CAVEAT (measured, not theoretical): BOTH of AQE's
  * byte-counting heuristics act against this guard when the edge
  * list is small relative to the explosion —
  *  - auto-broadcast turns the wedge join into a broadcast join with
  *    no per-key reduce task at all (parallelism then = input file
  *    splits, salt irrelevant);
  *  - partition COALESCING merges the salt buckets back into one
  *    reduce task, because the join's shuffle INPUT is a few MB.
  * Output-explosion skew produces no input bytes for AQE to see. At
  * 100-TB edge lists neither fires, but a skewed SUBGRAPH extract can
  * re-enter the small-input regime: pin the salted stage with
  * `spark.sql.adaptive.coalescePartitions.enabled=false` (what the
  * rehearsal leg does) or an explicit-numPartitions repartition on
  * (key, salt).
  */
object TwoHop {

  /** @param pairs undirected edges as (idA, idB), one row per pair
    * @param degreeCap 0 = unguarded wedge join (g08's shape); > 0 =
    *   salt every intermediate node whose degree exceeds the cap
    * @param buckets salt fan-out for hot nodes (hub work per task
    *   drops to D²/buckets)
    */
  def reach2(pairs: DataFrame, idA: String = "id_a", idB: String = "id_b",
      degreeCap: Int = 0, buckets: Int = 16): DataFrame = {
    val e = pairs.select(col(idA).as("src"), col(idB).as("dst"))
      .union(pairs.select(col(idB).as("src"), col(idA).as("dst")))
    val two =
      if (degreeCap <= 0) {
        e.as("e1").join(e.as("e2"), col("e1.dst") === col("e2.src"))
          .select(col("e1.src").as("src"), col("e2.dst").as("nb"))
      } else {
        val hot = e.groupBy(col("src").as("node"))
          .agg(count(lit(1)).as("deg"))
          .filter(col("deg") > degreeCap)
          .select("node")
        val arr = e.join(broadcast(hot), e("dst") === hot("node"), "left")
          .select(e("src").as("src"), e("dst").as("dst"),
            when(hot("node").isNull, lit(0))
              .otherwise(pmod(xxhash64(e("src")), lit(buckets)).cast("int"))
              .as("salt"))
        val dep = e.join(broadcast(hot), e("src") === hot("node"), "left")
          .select(e("src").as("src"), e("dst").as("dst"),
            when(hot("node").isNull, array(lit(0)))
              .otherwise(sequence(lit(0), lit(buckets - 1))).as("salts"))
          .select(col("src"), col("dst"), explode(col("salts")).as("salt"))
        arr.as("e1").join(dep.as("e2"),
            col("e1.dst") === col("e2.src") &&
              col("e1.salt") === col("e2.salt"))
          .select(col("e1.src").as("src"), col("e2.dst").as("nb"))
      }
    e.select(col("src"), col("dst").as("nb"))
      .union(two.filter(col("src") =!= col("nb")))
      .distinct()
      .groupBy("src").agg(count(lit(1)).as("n_reach2"))
      .select(col("src").as("node_id"), col("n_reach2"))
  }
}
