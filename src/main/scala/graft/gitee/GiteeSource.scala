package graft.gitee

import graft.functions.ChCompat
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gitee REST incremental puller (SURVEY A24; reference:
  * app/service/gitee_importer.ts:48-153).
  *
  * The reference runs per-repo request loops with cursor pagination
  * (`prev_id`), a two-stage new/old catch-up against per-repo
  * (maxId, minId) watermarks, and a 3-day-window stop. The HTTP client
  * itself is infrastructure (and this container has no egress), so the
  * page fetcher is injected as a function — production supplies an
  * HTTP implementation, tests supply canned pages. Everything
  * relational (watermarks, normalization, dedup-merge) is engine code.
  */
object GiteeSource {

  /** One page of raw Gitee event JSON lines for (name, prevId);
    * empty = no more pages. The reference's page size is 50
    * (gitee_importer.ts:144).
    */
  type PageFetcher = (String, Long) => Seq[String]

  /** Per-repo incremental watermarks from the events table — the
    * reference's Q-gitee-watermarks (SURVEY B13; reference:
    * app/service/gitee_importer.ts:110-125): earliest event time,
    * first/last event id per repo, left-joined to the dim table.
    * Aggregation runs on the (pruned) Gitee slice only; the dim side
    * broadcasts.
    */
  def watermarks(events: DataFrame, orgsRepos: DataFrame): DataFrame =
    events.filter(col("platform") === "Gitee")
      .groupBy("repo_id")
      .agg(min("created_at").as("min_created_at"),
        min_by(col("id"), col("created_at")).as("min_id"),
        max_by(col("id"), col("created_at")).as("max_id"))
      .join(broadcast(orgsRepos.filter(col("type") === "repo")
        .select(col("id").as("repo_id"), col("name"))),
        Seq("repo_id"), "left")

  /** Pull all pages for one repo until the fetcher is exhausted or
    * `stopAtId` is crossed (the reference's new→old stage switch:
    * events with id <= maxId are already stored). Returns normalized
    * rows conforming to the events schema.
    */
  def pullRepo(spark: SparkSession, fetch: PageFetcher, name: String,
      stopAtId: Long = 0L, maxPages: Int = 1000): DataFrame = {
    import spark.implicits._
    val pages = Iterator.iterate((0L, fetch(name, 0L), 0)) {
      case (_, page, n) =>
        val lastId = pageMinId(spark, page)
        (lastId, if (lastId > stopAtId) fetch(name, lastId) else Seq.empty, n + 1)
    }.takeWhile { case (_, page, n) => page.nonEmpty && n < maxPages }
      .flatMap(_._2).toSeq
    GiteeNormalizer.normalize(
      spark.read.schema(GiteeNormalizer.rawSchema).json(pages.toDS))
  }

  private def pageMinId(spark: SparkSession, page: Seq[String]): Long = {
    import spark.implicits._
    if (page.isEmpty) 0L
    else spark.read.schema(GiteeNormalizer.rawSchema).json(page.toDS)
      .agg(min("id")).head.getLong(0)
  }

  /** Dimension-table refresh: dedup by (id, name, type) keeping the
    * earliest created_at — the reference's `OPTIMIZE TABLE …
    * DEDUPLICATE` on the version-less ReplacingMergeTree
    * (gitee_importer.ts:426,440-448).
    */
  def dedupOrgsRepos(dim: DataFrame): DataFrame =
    dim.dropDuplicates("id", "name", "type")
}
