package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches — the Spark analogue of
  * ClickHouse's `uniqState` / `uniqMerge` pre-aggregation pattern
  * (AggregatingMergeTree materialized views; the reference's schema is
  * designed exactly for this class of rollup over `events`, reference:
  * app/service/log_importer.ts:120-127 monthly partitioning +
  * README.md:88 distinct-flavored counts).
  *
  * The 100-TB shape: distinct-count questions ("how many distinct
  * actors per repo per month?") are the queries that CANNOT be answered
  * from an additive pre-aggregate — COUNT(DISTINCT) does not roll up.
  * A Datasketches HLL sketch does: build one sketch table at the finest
  * grain once (one scan of the fact table, map-side partial sketches,
  * shuffle carries fixed-size binaries instead of raw ids), then answer
  * every coarser rollup by unioning sketches — a scan of the sketch
  * table, which is smaller than the fact table by the group count /
  * row count ratio (here: months×types vs events).
  *
  * Both steps stay whole-stage-codegen'd Catalyst aggregates
  * (`HllSketchAgg` / `HllUnionAgg`, Datasketches HLL_8); accuracy is
  * ~1.6%/sqrt(2^(lgK-12)) relative standard error, pinned by spec at
  * lgK=12 on the test corpus. Sketch state is insertion-order
  * insensitive, so a union of disjoint partial sketches estimates the
  * same as one global sketch — also pinned by spec.
  */
object Sketches {

  /** Finest-grain sketch table: one row per `dims` group holding a
    * binary HLL sketch of `valueCol`'s distinct values. This is the
    * materialize-once side; partition the output by a `dims` prefix
    * (e.g. month) so later rollups prune.
    */
  def sketchCube(df: DataFrame, dims: Seq[String], valueCol: String,
      lgK: Int = 12): DataFrame =
    df.groupBy(dims.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK))
        .as(s"${valueCol}_sketch"))

  /** Roll a sketch table up to a coarser grain: union the group's
    * sketches, emit the distinct-count estimate. `keep` must be a
    * subset of the cube's dims.
    */
  def rollupEstimate(sketches: DataFrame, keep: Seq[String],
      sketchCol: String, estCol: String = "uniq_est"): DataFrame =
    sketches.groupBy(keep.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col(sketchCol)))
        .as(estCol))

  /** Grand-total estimate over the whole sketch table. */
  def totalEstimate(sketches: DataFrame, sketchCol: String): Long =
    sketches.agg(hll_sketch_estimate(hll_union_agg(col(sketchCol))))
      .head().getLong(0)
}
