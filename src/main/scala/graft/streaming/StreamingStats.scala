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
}
