package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event → property-graph element extraction (SURVEY A28; reference:
  * app/service/log_tugraph_importer.ts:125-330 and the Neo4j variant
  * app/service/log_neo4j_importer.ts:134-332).
  *
  * Produces two normalized element frames from the wide events
  * relation:
  *   nodes(node_type, node_id, login, name, title, is_bot, event_ts)
  *   edges(edge_type, src, dst, edge_id, body, state, merged, event_ts)
  * which [[GraphProjection.consolidate]] collapses with the reference's
  * last-write-wins merge (A26/A27). Each extraction is a narrow
  * projection + union over one scan family — no joins; the argMax
  * consolidation is the only shuffle, keyed by node/edge id, which is
  * what lets the projection run over 100 TB of events.
  *
  * Fidelity notes:
  *  - issue/change-request nodes are keyed `"{repoId}_{number}"`
  *    (log_tugraph_importer.ts:152-156).
  *  - `close` edges on PullRequestEvent carry the merged flag
  *    (log_tugraph_importer.ts:220-234).
  *  - bot detection: login ends with `[bot]`
  *    (log_neo4j_importer.ts:344-346).
  *  - divergence: `language`/`license` nodes (log_tugraph_importer.ts
  *    :255-268) read `pull.base.repo.*` payload fields that the events
  *    relation (FieldMap) does not persist; extracting them requires
  *    the raw-payload scan, so they are out of scope for the
  *    events-relation projection.
  *  - the reference iterates ALL `requested_reviewers` for
  *    has_requested_reviewer edges (log_tugraph_importer.ts:246-253)
  *    but the events relation keeps only the first reviewer
  *    (app/parser.js:98) — we emit the edge for that one.
  */
object GraphElements {

  private val issueFamily = Seq(
    "IssuesEvent", "IssueCommentEvent", "PullRequestEvent",
    "PullRequestReviewEvent", "PullRequestReviewCommentEvent")
  private val pullFamily = Seq(
    "PullRequestEvent", "PullRequestReviewEvent",
    "PullRequestReviewCommentEvent")

  private def isBot(login: org.apache.spark.sql.Column) =
    login.endsWith("[bot]")

  private def node(df: DataFrame, nodeType: String,
      id: org.apache.spark.sql.Column,
      login: org.apache.spark.sql.Column,
      name: org.apache.spark.sql.Column,
      title: org.apache.spark.sql.Column): DataFrame =
    df.select(
      lit(nodeType).as("node_type"),
      id.cast("string").as("node_id"),
      login.as("login"), name.as("name"), title.as("title"),
      isBot(login).as("is_bot"),
      col("created_at").as("event_ts"))

  /** All graph nodes, un-consolidated (one row per witnessing event). */
  def nodes(events: DataFrame): DataFrame = {
    val e = events
    val none = lit("")
    val issueFam = e.filter(col("type").isin(issueFamily: _*))
    val issueKey = concat(col("repo_id"), lit("_"), col("issue_number"))

    val repoN = node(e, "github_repo", col("repo_id"), none, col("repo_name"), none)
    val actorN = node(e, "github_actor", col("actor_id"), col("actor_login"), none, none)
    val orgN = node(e.filter(col("org_id") =!= 0), "github_org",
      col("org_id"), col("org_login"), none, none)
    // issue vs change_request by event family (log_tugraph_importer.ts:166-174)
    val issueN = node(issueFam.filter(col("type") === "IssuesEvent" || col("type") === "IssueCommentEvent"),
      "github_issue", issueKey, none, none, col("issue_title"))
    val crN = node(issueFam.filter(col("type").isin(pullFamily: _*)),
      "github_change_request", issueKey, none, none, col("issue_title"))
    val labelN = node(
      issueFam.select(col("created_at"),
        explode(col("issue_labels")).as("l")),
      "issue_label", col("l.name"), none, none, none)
    val assigneeN = node(
      issueFam.select(col("created_at"),
        explode(col("issue_assignees")).as("a")),
      "github_actor", col("a.id"), col("a.login"), none, none)
    val reviewerN = node(
      issueFam.filter(col("pull_requested_reviewer_id") =!= 0),
      "github_actor", col("pull_requested_reviewer_id"),
      col("pull_requested_reviewer_login"), none, none)

    Seq(repoN, actorN, orgN, issueN, crN, labelN, assigneeN, reviewerN)
      .reduce(_ unionByName _)
  }

  private def edge(df: DataFrame, edgeType: String,
      src: org.apache.spark.sql.Column, dst: org.apache.spark.sql.Column,
      id: org.apache.spark.sql.Column,
      body: org.apache.spark.sql.Column,
      state: org.apache.spark.sql.Column,
      merged: org.apache.spark.sql.Column): DataFrame =
    df.select(
      lit(edgeType).as("edge_type"),
      src.cast("string").as("src"), dst.cast("string").as("dst"),
      id.cast("long").as("edge_id"),
      body.as("body"), state.as("state"), merged.as("merged"),
      col("created_at").as("event_ts"))

  /** All graph edges, un-consolidated. Anonymous (id = -1) structural
    * edges follow the reference (updateEdge id -1).
    */
  def edges(events: DataFrame): DataFrame = {
    val e = events
    val none = lit("")
    val noMerge = lit(null).cast("boolean")
    val issueFam = e.filter(col("type").isin(issueFamily: _*))
    val issueKey = concat(col("repo_id"), lit("_"), col("issue_number"))

    val hasRepo = edge(e.filter(col("org_id") =!= 0), "has_repo",
      col("org_id"), col("repo_id"), lit(-1L), none, none, noMerge)
    val hasLabel = edge(
      issueFam.select(col("created_at"), col("repo_id"), col("issue_number"),
        explode(col("issue_labels")).as("l")),
      "has_issue_label", issueKey, col("l.name"), lit(-1L), none, none, noMerge)
    val hasAssignee = edge(
      issueFam.select(col("created_at"), col("repo_id"), col("issue_number"),
        explode(col("issue_assignees")).as("a")),
      "has_assignee", issueKey, col("a.id"), lit(-1L), none, none, noMerge)
    val hasIssueCr = edge(issueFam, "has_issue_change_request",
      col("repo_id"), issueKey, lit(-1L), none, none, noMerge)
    val hasReviewer = edge(
      issueFam.filter(col("pull_requested_reviewer_id") =!= 0),
      "has_requested_reviewer", issueKey, col("pull_requested_reviewer_id"),
      lit(-1L), none, none, noMerge)

    // action edges (log_tugraph_importer.ts:201-207,220-234,213-216,...)
    val opens = edge(
      issueFam.filter(col("action") === "opened"),
      "open", col("actor_id"), issueKey, col("id"), none, none, noMerge)
    // close carries merged for PR closes (log_tugraph_importer.ts:220-234)
    val closes = edge(
      issueFam.filter(col("action") === "closed"),
      "close", col("actor_id"), issueKey, col("id"), none, none,
      when(col("type").isin(pullFamily: _*), col("pull_merged")).otherwise(noMerge))
    val comments = edge(
      e.filter(col("type") === "IssueCommentEvent"),
      "comment", col("actor_id"), issueKey, col("issue_comment_id"),
      col("body"), none, noMerge)
    val reviews = edge(
      e.filter(col("type") === "PullRequestReviewEvent"),
      "review", col("actor_id"), issueKey, col("pull_review_id"),
      col("body"), col("pull_review_state"), noMerge)
    val reviewComments = edge(
      e.filter(col("type") === "PullRequestReviewCommentEvent"),
      "review_comment", col("actor_id"), issueKey, col("pull_review_comment_id"),
      col("body"), none, noMerge)

    Seq(hasRepo, hasLabel, hasAssignee, hasIssueCr, hasReviewer,
      opens, closes, comments, reviews, reviewComments)
      .reduce(_ unionByName _)
  }

  /** Language / license nodes and edges — these read `pull.base.repo`
    * payload fields that the events relation (FieldMap) does not
    * persist, so they extract from the RAW envelope frame
    * ([[graft.ingest.GhEventParser.readRaw]]), exactly as the
    * reference's graph importer parses raw lines
    * (log_tugraph_importer.ts:255-268). Union the results into
    * [[nodes]]/[[edges]] before consolidation for the full graph.
    */
  def rawRepoFacts(raw: DataFrame): (DataFrame, DataFrame) = {
    val pr = raw
      .filter(col("type").isin(pullFamily: _*) &&
        col("payload.pull_request").isNotNull)
      .select(
        col("repo.id").as("repo_id"),
        to_timestamp(col("created_at")).as("created_at"),
        col("payload.pull_request.base.repo.language").as("language"),
        col("payload.pull_request.base.repo.license.spdx_id").as("spdx_id"))
    val none = lit("")
    val langN = node(pr.filter(col("language").isNotNull),
      "language", col("language"), none, none, none)
    val licN = node(pr.filter(col("spdx_id").isNotNull),
      "license", col("spdx_id"), none, none, none)
    val noMerge = lit(null).cast("boolean")
    val langE = edge(pr.filter(col("language").isNotNull), "has_language",
      col("repo_id"), col("language"), lit(-1L), none, none, noMerge)
    val licE = edge(pr.filter(col("spdx_id").isNotNull), "has_license",
      col("repo_id"), col("spdx_id"), lit(-1L), none, none, noMerge)
    (langN.unionByName(licN), langE.unionByName(licE))
  }

  /** Consolidated nodes table (A26 last-write-wins). */
  def nodesTable(events: DataFrame): DataFrame =
    GraphProjection.consolidateNodes(nodes(events),
      Seq("login", "name", "title", "is_bot"))

  /** Consolidated edges table (A27 last-write-wins). */
  def edgesTable(events: DataFrame): DataFrame =
    GraphProjection.consolidateEdges(edges(events),
      Seq("body", "state", "merged"))

  /** Graph bulk-upsert sink (SURVEY A29; reference's batched
    * UNWIND…MERGE Cypher, app/service/log_neo4j_importer.ts:334-407):
    * our native representation is parquet nodes/edges tables, and the
    * upsert is the same last-write-wins consolidation applied across
    * (existing ∪ new) — one argMax shuffle keyed by element id, no
    * driver-side graph. An external graph DB adapter would read these
    * tables and emit MERGE batches.
    *
    * Incremental layout: the tables are partitioned by an id-hash
    * bucket (`pmod(xxhash64(key…), numBuckets)`), the same move
    * [[graft.ingest.EventsWriter.merge]] makes with months — a merge
    * reads back only the buckets the batch touches (partition pruning)
    * and dynamic-partition-overwrites exactly those, so a small upsert
    * against a 100-TB graph rewrites a few bucket dirs, never the
    * table. Degree accumulates across merges: stored entities carry
    * their witness count forward, each fresh witness adds one.
    */
  def mergeGraph(events: DataFrame, nodesPath: String, edgesPath: String,
      numBuckets: Int = 64): Unit = {
    val spark = events.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    def mergeInto(path: String, fresh0: DataFrame, keys: Seq[String],
        props: Seq[String]): Unit = {
      val fresh = fresh0
        .withColumn("bucket",
          pmod(xxhash64(keys.map(col): _*), lit(numBuckets)).cast("int"))
        .withColumn("degree", lit(1L))
      val touched = fresh.select("bucket").distinct().collect().map(_.getInt(0))
      val existing =
        try Some(spark.read.parquet(path)
          .filter(col("bucket").isin(touched.toSeq: _*))
          .withColumnRenamed("updated_at", "event_ts"))
        catch { case _: org.apache.spark.sql.AnalysisException => None }
      val combined = existing.fold(fresh)(_ unionByName fresh)
      val aggs = props.map(p => max_by(col(p), col("event_ts")).as(p)) ++
        Seq(max(col("event_ts")).as("updated_at"), sum("degree").as("degree"))
      combined
        // bucket is functionally dependent on keys — grouping by it too
        // changes nothing, but keeps it alive as the write partition col
        .groupBy((keys :+ "bucket").map(col): _*)
        .agg(aggs.head, aggs.tail: _*)
        .write
        .mode(if (existing.isDefined) org.apache.spark.sql.SaveMode.Overwrite
              else org.apache.spark.sql.SaveMode.Append)
        .partitionBy("bucket")
        .parquet(path)
    }
    mergeInto(nodesPath, nodes(events), Seq("node_type", "node_id"),
      Seq("login", "name", "title", "is_bot"))
    mergeInto(edgesPath, edges(events), Seq("edge_type", "src", "dst", "edge_id"),
      Seq("body", "state", "merged"))
  }
}
