package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Watermarked windowed aggregation over the event stream — the
  * streaming face of the batch rollups (B14/r10 month buckets, the A31
  * status counters): per-repo tumbling-window activity counts.
  *
  * Shape for 100 TB/day: the aggregation state is one row per
  * (window, repo) — bounded by the watermark horizon × active-repo
  * count, NOT by event volume; map-side partial aggregation collapses
  * each micro-batch before the state-store shuffle. Append mode emits
  * a window exactly once, when the watermark passes its end — the
  * contract a downstream parquet/JDBC sink needs for idempotent loads.
  * Late events inside `lateness` are aggregated normally; later ones
  * are dropped (the same trade ClickHouse makes at merge time — rows
  * landing after a partition is compacted are a manual backfill).
  */
object StreamingStats {

  /** Tumbling `windowLen` counts per repo: events, distinct-ish actor
    * reach (HLL sketch — exact distinct is unbounded state per window),
    * and push share.
    */
  def repoActivity(events: DataFrame, tsCol: String = "created_at",
      windowLen: String = "1 hour", lateness: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), windowLen), col("repo_id"))
      .agg(
        count(lit(1)).as("n_events"),
        approx_count_distinct("actor_id").as("n_actors"),
        sum(when(col("type") === "PushEvent", 1L).otherwise(0L)).as("n_pushes"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("repo_id"), col("n_events"), col("n_actors"), col("n_pushes"))

  /** Streaming face of [[graft.operators.Sketches]]: per-window rows
    * carrying the MERGEABLE binary HLL sketch instead of a point
    * estimate, so the stream's output parquet IS a sketch-cube shard —
    * batch rollups union it with the historical cube via
    * `Sketches.rollupEstimate` and answer distinct-count questions
    * across the batch/stream boundary without rescanning either side.
    * State per (window, dims) row is one fixed-size sketch.
    */
  def sketchActivity(events: DataFrame, dims: Seq[String],
      distinctCol: String, tsCol: String = "created_at",
      windowLen: String = "1 hour", lateness: String = "1 hour",
      lgK: Int = 12): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), windowLen) +: dims.map(col): _*)
      .agg(count(lit(1)).as("n_events"),
        hll_sketch_agg(col(distinctCol), lit(lgK))
          .as(s"${distinctCol}_sketch"))
      .select(Seq(col("window.start").as("window_start"),
        col("window.end").as("window_end")) ++
        dims.map(col) ++
        Seq(col("n_events"), col(s"${distinctCol}_sketch")): _*)
}
