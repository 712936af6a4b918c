package graft.pipeline

import graft.ingest.FilePipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Downloader policy (SURVEY A3; reference:
  * app/service/log_downloader.ts:9-71). The HTTP transfer itself is
  * injected (zero-egress container; in production it wraps the GH
  * Archive base URL) — what the engine owns is the *selection policy*:
  *
  *  - only NeedDownload files are candidates;
  *  - files missing for more than ~6 months are skipped permanently
  *    (the reference's cutoff, log_downloader.ts:17-19: GH Archive
  *    holes never backfill);
  *  - candidates are shuffled (log_downloader.ts:33-42) so a stuck
  *    prefix of the archive doesn't starve the rest, deterministically
  *    here via rand(seed).
  */
object Downloader {

  /** (relative path) => success. Production: HTTP GET + write to
    * baseDir; tests: canned behavior.
    */
  type Fetcher = String => Boolean

  /** Candidate selection with cutoff + deterministic shuffle.
    * `nowHourKey` is yyyyMMddHH (injected — keeps this pure).
    */
  def select(meta: DataFrame, nowHourKey: Long, limit: Int = 1000,
      seed: Long = 42L): DataFrame = {
    // ~6 months back in hour-key arithmetic: subtract 6 from the month
    // field via timestamp round-trip (exact month semantics, not 183 days)
    val cutoff = date_format(
      to_timestamp(lit(nowHourKey.toString), "yyyyMMddHH") - expr("INTERVAL 6 MONTHS"),
      "yyyyMMddHH").cast("long")
    meta.filter(col("status") === FilePipeline.Status.NeedDownload &&
        col("hour_key") >= cutoff)
      .orderBy(rand(seed))
      .limit(limit)
  }

  /** Drive the injected fetcher over the selected candidates; returns
    * meta rows for the files that arrived (status Downloaded).
    */
  def download(meta: DataFrame, nowHourKey: Long, fetch: Fetcher,
      limit: Int = 1000): DataFrame = {
    val spark = meta.sparkSession
    import spark.implicits._
    val fetched = select(meta, nowHourKey, limit)
      .select("path", "hour_key").as[(String, Long)].collect()
      .filter { case (p, _) => fetch(p) }
    fetched.toSeq.toDF("path", "hour_key")
      .withColumn("status", lit(FilePipeline.Status.Downloaded))
  }
}
