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
  * Retry/backoff and the reference's rotating-proxy option compose in
  * front of the injection point:
  * `Retry.rotatingFetcher(proxyPolicy, retryPolicy)(httpFetch)` is a
  * `PageFetcher` (see [[graft.pipeline.Retry.rotatingFetcher]];
  * reference proxy interface request_executor.ts:30-47).
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

  /** Event ids of a page, aligned with the page's line order. */
  private def pageIds(spark: SparkSession, page: Seq[String]): Seq[Long] = {
    import spark.implicits._
    page.zipWithIndex.toDF("line", "i")
      .select(col("i"),
        from_json(col("line"), GiteeNormalizer.rawSchema).getField("id").as("id"))
      .collect().sortBy(_.getInt(0)).map(_.getAs[Long]("id")).toSeq
  }

  /** Dimension-table refresh: dedup by (id, name, type) keeping the
    * earliest created_at — the reference's `OPTIMIZE TABLE …
    * DEDUPLICATE` on the version-less ReplacingMergeTree
    * (gitee_importer.ts:426,440-448).
    */
  def dedupOrgsRepos(dim: DataFrame): DataFrame =
    dim.dropDuplicates("id", "name", "type")

  /** Per-repo catch-up state — the reference's ReqContext watermarks
    * (gitee_importer.ts:7-16): newest/oldest stored event id, repo
    * creation time, earliest stored event time.
    */
  final case class RepoState(maxId: Long, minId: Long,
      createdAt: Option[java.sql.Timestamp],
      minCreatedAt: Option[java.sql.Timestamp])

  /** Two-stage incremental pull (gitee_importer.ts:69-101):
    *
    *  - NEW stage: page from the newest event; keep only ids > maxId.
    *    On running into a stored id: if the oldest stored event is
    *    within 3 days of the repo's creation, history is complete —
    *    stop; otherwise switch to the OLD stage.
    *  - OLD stage: backfill from prev_id = minId until the API is
    *    exhausted (the repo's history older than what we hold).
    *  - maxId == 0 (first import): take everything until no data.
    *
    * Pages arrive newest-first, so the reference's "break at the first
    * id <= maxId" is the same row set as filtering ids > maxId, which
    * is how the split is done here. maxId > 0 implies minId > 0 (both
    * come from one watermark aggregation), so the reference's
    * unreachable minId<=0 branch is not modeled.
    *
    * `complete=false` means the NEW stage ran out of its page budget
    * BEFORE reaching the stored maxId: ingesting that batch and
    * re-deriving watermarks would advance maxId past an un-fetched gap
    * that no later stage backfills (the OLD stage only walks below
    * minId). Callers must not advance the watermark on an incomplete
    * pull. A budget-exhausted OLD stage or first import (maxId == 0)
    * stays `complete`: both leave a contiguous stored range that the
    * next run resumes from minId.
    */
  final case class PullResult(events: DataFrame, complete: Boolean)

  def pullRepoTwoStage(spark: SparkSession, fetch: PageFetcher, name: String,
      st: RepoState, maxPages: Int = 1000): PullResult = {
    val keep = Seq.newBuilder[String]
    var pages = 0

    // NEW stage
    var prevId = 0L
    var newDone = false
    var ranIntoStored = false
    while (!newDone && pages < maxPages) {
      val page = fetch(name, prevId); pages += 1
      if (page.isEmpty) newDone = true
      else {
        val ids = pageIds(spark, page)
        val fresh = page.zip(ids).filter { case (_, id) => id > st.maxId }
        keep ++= fresh.map(_._1)
        if (st.maxId > 0 && ids.exists(_ <= st.maxId)) {
          ranIntoStored = true; newDone = true
        } else prevId = ids.min
      }
    }

    // OLD stage — only after running into stored data, and only when
    // the 3-day-window test says history is still incomplete
    // (gitee_importer.ts:77-84)
    val historyComplete = (st.createdAt, st.minCreatedAt) match {
      case (Some(created), Some(minEd)) =>
        minEd.toInstant.toEpochMilli > 0 &&
          minEd.getTime - created.getTime < 3L * 24 * 60 * 60 * 1000
      case _ => false
    }
    if (ranIntoStored && st.minId > 0 && !historyComplete) {
      prevId = st.minId
      var oldDone = false
      while (!oldDone && pages < maxPages) {
        val page = fetch(name, prevId); pages += 1
        if (page.isEmpty) oldDone = true
        else { keep ++= page; prevId = pageIds(spark, page).min }
      }
    }

    import spark.implicits._
    val events = GiteeNormalizer.normalize(
      spark.read.schema(GiteeNormalizer.rawSchema).json(keep.result().toDS))
    PullResult(events, complete = newDone || st.maxId == 0L)
  }

  /** RepoState for one repo from the watermark query + dim table —
    * the per-repo row of the reference's loadRepos join
    * (gitee_importer.ts:108-127).
    */
  def repoState(events: DataFrame, orgsRepos: DataFrame, name: String): RepoState = {
    val row = watermarks(events, orgsRepos)
      .filter(col("name") === name)
      .join(broadcast(orgsRepos.filter(col("type") === "repo")
        .select(col("name"), col("created_at"))), Seq("name"), "left")
      .collect().headOption
    row.fold(RepoState(0L, 0L, None, None)) { r =>
      RepoState(r.getAs[Long]("max_id"), r.getAs[Long]("min_id"),
        Option(r.getAs[java.sql.Timestamp]("created_at")),
        Option(r.getAs[java.sql.Timestamp]("min_created_at")))
    }
  }

  /** Metadata fetch for one missing dim entry: (name, "repo"|"org") →
    * the API's JSON body, None on failure (the reference logs and
    * skips bodies with no id, gitee_importer.ts:310-318).
    */
  type MetaFetcher = (String, String) => Option[String]

  /** One page of an org's repo listing: (org, page, perPage) → repo
    * JSON objects (gitee_importer.ts:389-421).
    */
  type OrgReposFetcher = (String, Int, Int) => Seq[String]

  private val metaSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("full_name",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("created_at",
      org.apache.spark.sql.types.StringType)))

  /** Dim-table build loop (gitee_importer.ts:290-433): insert the
    * configured repos/orgs missing from the dim table (metadata via the
    * injected fetcher), optionally split orgs into their repo listings
    * (cursor pagination: a full page means another page follows), then
    * dedup — the OPTIMIZE DEDUPLICATE analogue. Returns the refreshed
    * dim table (id, name, type, created_at).
    */
  def buildOrgsRepos(spark: SparkSession, existing: Option[DataFrame],
      repos: Seq[String], orgs: Seq[String], fetchMeta: MetaFetcher,
      fetchOrgRepos: OrgReposFetcher = (_, _, _) => Seq.empty,
      parseOrgs: Boolean = false, perPage: Int = 100,
      maxPages: Int = 1000): DataFrame = {
    import spark.implicits._
    val known: Set[String] = existing.fold(Set.empty[String])(
      _.select("name").collect().map(_.getString(0)).toSet)

    def metaRows(names: Seq[String], kind: String): DataFrame =
      // name comes from the REQUEST, not the response body
      // (gitee_importer.ts:319-323 spreads option.userdata)
      names.filterNot(known)
        .flatMap(n => fetchMeta(n, kind).map(b => (n, b)))
        .toDF("req_name", "body")
        .select(col("req_name"), from_json(col("body"), metaSchema).as("m"))
        .filter(col("m.id").isNotNull)
        .select(col("m.id").as("id"), col("req_name").as("name"),
          lit(kind).as("type"),
          coalesce(try_to_timestamp(col("m.created_at")), current_timestamp())
            .as("created_at"))

    val inserted = metaRows(repos, "repo").unionByName(metaRows(orgs, "org"))
    val base = existing.fold(inserted)(_.unionByName(inserted))

    val split =
      if (!parseOrgs) spark.range(0).select(
        lit(0L).as("id"), lit("").as("name"), lit("repo").as("type"),
        current_timestamp().as("created_at"))
      else {
        val orgNames = base.filter(col("type") === "org")
          .select("name").collect().map(_.getString(0)).toSeq
        val rows = orgNames.flatMap { o =>
          val out = Seq.newBuilder[String]
          var page = 1
          var done = false
          while (!done && page <= maxPages) {
            val batch = fetchOrgRepos(o, page, perPage)
            out ++= batch
            if (batch.size < perPage) done = true else page += 1
          }
          out.result()
        }
        spark.read.schema(metaSchema).json(rows.toDS)
          .filter(col("id").isNotNull)
          .select(col("id"), col("full_name").as("name"),
            lit("repo").as("type"),
            coalesce(try_to_timestamp(col("created_at")), current_timestamp())
              .as("created_at"))
      }

    dedupOrgsRepos(base.unionByName(split))
  }
}
