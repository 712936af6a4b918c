package graft.gitee

import graft.ingest.EventsSchema
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Gitee event normalizer (SURVEY A25): maps the Gitee REST API's event
  * vocabulary onto the GitHub-shaped events schema (reference:
  * app/service/gitee_importer.ts:22-46,155-288). Pure DataFrame
  * transform — the REST pagination loop lives in [[GiteeSource]]; this
  * function is unit-testable on canned pages.
  *
  * Faithfully reproduced quirks:
  *  - type remap incl. `StarEvent→WatchEvent`,
  *    `PullRequestCommentEvent→PullRequestReviewCommentEvent`
  *    (gitee_importer.ts:22-31); unsupported/unknown types dropped.
  *  - action remap `open→opened`, `rejected|merged→closed`,
  *    `starred→started`; `progressing` drops the row; an unmapped
  *    non-null action drops the row (gitee_importer.ts:37-46,188-193).
  *  - only `IssueCommentEvent` is forced to `action='created'`: the
  *    reference compares the *mapped* type against the *unmapped* name
  *    `'PullRequestCommentEvent'`, which never matches
  *    (gitee_importer.ts:194-196) — we reproduce the actual behavior,
  *    not the apparent intent.
  *  - Gitee issue numbers are base-36 (`parseInt(i.number, 36)`,
  *    gitee_importer.ts:201); PR numbers are base-10 and *override* the
  *    issue number (parsePull, gitee_importer.ts:249).
  *  - `pull_merged` is set from the ORIGINAL payload action `'merged'`
  *    (gitee_importer.ts:242-244), before remapping.
  *  - `from_api` stays false: the reference's Gitee path never sets it,
  *    so rows land with the ClickHouse column default 0
  *    (only importer_worker.js:35 ever writes it, and only with 0).
  *  - the reference's `processNestedString` quote-escaping
  *    (gitee_importer.ts:435-437) is Cypher/SQL string-building armor,
  *    not data semantics — values here stay unescaped.
  */
object GiteeNormalizer {

  /** Raw Gitee API event schema — the fields parseEvent touches. */
  val rawSchema: StructType = {
    val user = StructType(Seq(
      StructField("id", LongType), StructField("login", StringType)))
    val label = StructType(Seq(
      StructField("name", StringType), StructField("color", StringType)))
    val issueLike = StructType(Seq(
      StructField("id", LongType),
      StructField("number", StringType),
      StructField("title", StringType),
      StructField("body", StringType),
      StructField("labels", ArrayType(label)),
      StructField("user", user),
      StructField("created_at", StringType),
      StructField("updated_at", StringType),
      StructField("finished_at", StringType),
      StructField("action", StringType),
      StructField("merged_at", StringType)))
    val comment = StructType(Seq(
      StructField("id", LongType),
      StructField("body", StringType),
      StructField("commit_id", StringType),
      StructField("created_at", StringType),
      StructField("updated_at", StringType),
      StructField("user", user)))
    val pushCommit = StructType(Seq(
      StructField("author", StructType(Seq(
        StructField("name", StringType), StructField("email", StringType)))),
      StructField("message", StringType)))
    StructType(Seq(
      StructField("id", LongType),
      StructField("type", StringType),
      StructField("actor", user),
      StructField("repo", StructType(Seq(
        StructField("id", LongType), StructField("full_name", StringType)))),
      StructField("org", user),
      StructField("created_at", StringType),
      StructField("payload", StructType(Seq(
        StructField("action", StringType),
        // IssuesEvent / PullRequestEvent payloads ARE the issue/pull:
        StructField("id", LongType),
        StructField("number", StringType),
        StructField("title", StringType),
        StructField("body", StringType),
        StructField("labels", ArrayType(label)),
        StructField("user", user),
        StructField("created_at", StringType),
        StructField("updated_at", StringType),
        StructField("finished_at", StringType),
        StructField("merged_at", StringType),
        // nested variants:
        StructField("issue", issueLike),
        StructField("pull_request", issueLike),
        StructField("comment", comment),
        // push:
        StructField("size", IntegerType),
        StructField("ref", StringType),
        StructField("after", StringType),
        StructField("commits", ArrayType(pushCommit)))))))
  }

  private val typeMap: Map[String, String] = Map(
    "IssueEvent" -> "IssuesEvent",
    "IssueCommentEvent" -> "IssueCommentEvent",
    "PullRequestEvent" -> "PullRequestEvent",
    "PullRequestCommentEvent" -> "PullRequestReviewCommentEvent",
    "CommitCommentEvent" -> "CommitCommentEvent",
    "PushEvent" -> "PushEvent",
    "StarEvent" -> "WatchEvent",
    "ForkEvent" -> "ForkEvent")

  private val actionMap: Map[String, String] = Map(
    "opened" -> "opened", "open" -> "opened", "reopened" -> "reopened",
    "closed" -> "closed", "rejected" -> "closed", "merged" -> "closed",
    "starred" -> "started")

  /** base-36 string → int (JS `parseInt(x, 36)`). */
  def base36(c: Column): Column = conv(c, 36, 10).cast(IntegerType)

  // try_to_timestamp: malformed values null out instead of throwing
  // under ANSI mode (the reference's try/catch drops such events).
  private def ts(c: Column): Column = date_trunc("second", try_to_timestamp(c))
  private val epoch = to_timestamp(lit("1970-01-01 00:00:00"))
  private def sDef(c: Column): Column = coalesce(c, lit(""))
  private def lDef(c: Column): Column = coalesce(c, lit(0L))

  /** Normalize raw Gitee events to [[EventsSchema.schema]] rows. */
  def normalize(raw: DataFrame): DataFrame = {
    val mappedType = typeMap.foldLeft(lit(null).cast(StringType)) {
      case (acc, (from, to)) => when(col("type") === from, lit(to)).otherwise(acc)
    }
    val rawAction = col("payload.action")
    val mappedAction = actionMap.foldLeft(lit(null).cast(StringType)) {
      case (acc, (from, to)) => when(rawAction === from, lit(to)).otherwise(acc)
    }

    val t = col("etype") // mapped type

    val base = raw
      .withColumn("etype", mappedType)
      // drop: unknown/unsupported type; missing actor/repo/payload;
      // 'progressing' action; unmapped non-null action
      .filter(col("etype").isNotNull &&
        col("actor").isNotNull && col("repo").isNotNull &&
        col("payload").isNotNull &&
        (rawAction.isNull || (rawAction =!= "progressing" && mappedAction.isNotNull)))

    val payloadAsIssue = struct(
      col("payload.id").as("id"), col("payload.number").as("number"),
      col("payload.title").as("title"), col("payload.body").as("body"),
      col("payload.labels").as("labels"), col("payload.user").as("user"),
      col("payload.created_at").as("created_at"),
      col("payload.updated_at").as("updated_at"),
      col("payload.finished_at").as("finished_at"),
      col("payload.action").as("action"),
      col("payload.merged_at").as("merged_at"))

    val iss =
      when(t === "IssuesEvent" || t === "PullRequestEvent", payloadAsIssue)
        .when(t === "IssueCommentEvent", col("payload.issue"))
        .when(t === "PullRequestReviewCommentEvent", col("payload.pull_request"))
    val pullObj =
      when(t === "PullRequestEvent", payloadAsIssue)
        .when(t === "PullRequestReviewCommentEvent", col("payload.pull_request"))
    val cmt = col("payload.comment")

    val issueFam = t.isin("IssuesEvent", "IssueCommentEvent",
      "PullRequestEvent", "PullRequestReviewCommentEvent")
    val pullFam = t.isin("PullRequestEvent", "PullRequestReviewCommentEvent")
    val commentFam = t.isin("IssueCommentEvent", "PullRequestReviewCommentEvent")

    // parseIssue/parseComment/parseCommitComment return false (row drop)
    // when required ids are missing (gitee_importer.ts:199,223,234):
    val valid =
      (!issueFam || (iss.getField("id").isNotNull && iss.getField("id") =!= 0 &&
        iss.getField("number").isNotNull && iss.getField("number") =!= "")) &&
      (!commentFam || (cmt.isNotNull && cmt.getField("id").isNotNull && cmt.getField("id") =!= 0)) &&
      (t =!= "CommitCommentEvent" ||
        (cmt.isNotNull && cmt.getField("id").isNotNull && cmt.getField("id") =!= 0))

    val action =
      when(t === "IssueCommentEvent", lit("created")) // gitee_importer.ts:194-196
        .otherwise(coalesce(mappedAction, lit("")))

    val body =
      when(commentFam || t === "CommitCommentEvent", sDef(cmt.getField("body")))
        .when(issueFam, sDef(iss.getField("body")))
        .otherwise(lit(""))

    // PR number overrides (base 10) the issue's base-36 number
    // (parsePull runs after parseIssue, gitee_importer.ts:249):
    val issueNumber =
      when(pullFam, coalesce(pullObj.getField("number").cast(IntegerType), lit(0)))
        .when(issueFam, coalesce(base36(iss.getField("number")), lit(0)))
        .otherwise(lit(0))

    val emptyLabels = array()
      .cast(ArrayType(EventsSchema.issueLabel, containsNull = false))
    val labels = when(issueFam,
      transform(coalesce(iss.getField("labels"),
        expr("CAST(array() AS array<struct<name:string,color:string>>)")), l =>
        struct(
          sDef(l.getField("name")).as("name"),
          sDef(l.getField("color")).as("color"),
          lit(false).as("default"),      // gitee_importer.ts:209
          lit("").as("description"))))   // gitee_importer.ts:210
      .otherwise(emptyLabels)

    val out = base.filter(valid).select(
      col("id").as("id"),
      lit("Gitee").as("platform"),
      t.as("type"),
      action.as("action"),
      lDef(col("actor.id")).as("actor_id"),
      sDef(col("actor.login")).as("actor_login"),
      lDef(col("repo.id")).as("repo_id"),
      sDef(col("repo.full_name")).as("repo_name"), // full_name (gitee_importer.ts:173)
      lDef(col("org.id")).as("org_id"),
      sDef(col("org.login")).as("org_login"),
      coalesce(ts(col("created_at")), epoch).as("created_at"),
      when(issueFam, lDef(iss.getField("id"))).otherwise(lit(0L)).as("issue_id"),
      issueNumber.as("issue_number"),
      when(issueFam, sDef(iss.getField("title"))).otherwise(lit("")).as("issue_title"),
      body.as("body"),
      labels.as("issue_labels"),
      when(issueFam, lDef(iss.getField("user").getField("id"))).otherwise(lit(0L)).as("issue_author_id"),
      when(issueFam, sDef(iss.getField("user").getField("login"))).otherwise(lit("")).as("issue_author_login"),
      when(issueFam, ts(iss.getField("created_at"))).otherwise(lit(null).cast(TimestampType)).as("issue_created_at"),
      when(issueFam, ts(iss.getField("updated_at"))).otherwise(lit(null).cast(TimestampType)).as("issue_updated_at"),
      when(issueFam, ts(iss.getField("finished_at"))).otherwise(lit(null).cast(TimestampType)).as("issue_closed_at"),
      when(commentFam, lDef(cmt.getField("id"))).otherwise(lit(0L)).as("issue_comment_id"),
      when(commentFam, ts(cmt.getField("created_at"))).otherwise(lit(null).cast(TimestampType)).as("issue_comment_created_at"),
      when(commentFam, ts(cmt.getField("updated_at"))).otherwise(lit(null).cast(TimestampType)).as("issue_comment_updated_at"),
      when(commentFam, lDef(cmt.getField("user").getField("id"))).otherwise(lit(0L)).as("issue_comment_author_id"),
      when(commentFam, sDef(cmt.getField("user").getField("login"))).otherwise(lit("")).as("issue_comment_author_login"),
      // pull_merged from the ORIGINAL action (gitee_importer.ts:242-244)
      (pullFam && coalesce(
        when(t === "PullRequestEvent", rawAction)
          .otherwise(pullObj.getField("action")) === "merged", lit(false)))
        .as("pull_merged"),
      when(pullFam, ts(pullObj.getField("merged_at"))).otherwise(lit(null).cast(TimestampType)).as("pull_merged_at"),
      when(t === "CommitCommentEvent", lDef(cmt.getField("id"))).otherwise(lit(0L)).as("commit_comment_id"),
      when(t === "CommitCommentEvent", sDef(cmt.getField("commit_id"))).otherwise(lit("")).as("commit_comment_sha"),
      when(t === "CommitCommentEvent", ts(cmt.getField("created_at"))).otherwise(lit(null).cast(TimestampType)).as("commit_comment_created_at"),
      when(t === "CommitCommentEvent", ts(cmt.getField("updated_at"))).otherwise(lit(null).cast(TimestampType)).as("commit_comment_updated_at"),
      when(t === "PushEvent", coalesce(col("payload.size"), lit(0))).otherwise(lit(0)).as("push_size"),
      when(t === "PushEvent", sDef(col("payload.ref"))).otherwise(lit("")).as("push_ref"),
      when(t === "PushEvent", sDef(col("payload.after"))).otherwise(lit("")).as("push_head"),
      when(t === "PushEvent",
        transform(coalesce(col("payload.commits"),
          expr("CAST(array() AS array<struct<author:struct<name:string,email:string>,message:string>>)")), c =>
          struct(
            sDef(c.getField("author").getField("name")).as("name"),
            sDef(c.getField("author").getField("email")).as("email"),
            sDef(c.getField("message")).as("message"))))
        .otherwise(array()
          .cast(ArrayType(EventsSchema.pushCommit, containsNull = false)))
        .as("push_commits"),
      lit(false).as("from_api"))

    densify(out)
  }

  /** Fill every events-schema column the Gitee path never writes with
    * its dense default, yielding rows unionable with GitHub-parsed
    * rows (same ~95-column relation).
    */
  private def densify(df: DataFrame): DataFrame = {
    val present = df.columns.toSet
    val cols = EventsSchema.schema.fields.map { f =>
      if (present.contains(f.name)) col(f.name)
      else if (f.nullable) lit(null).cast(f.dataType).as(f.name)
      else f.dataType match {
        case LongType => lit(0L).as(f.name)
        case IntegerType => lit(0).as(f.name)
        case BooleanType => lit(false).as(f.name)
        case StringType => lit("").as(f.name)
        case at: ArrayType => array().cast(at).as(f.name)
        case other => lit(null).cast(other).as(f.name)
      }
    }
    df.select(cols: _*)
  }
}
