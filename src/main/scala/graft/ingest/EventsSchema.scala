package graft.ingest

import org.apache.spark.sql.types._

/** The engine's `events` table schema — the Spark mirror of the
  * reference's code-defined `FieldMap` column dictionary (reference:
  * app/utils.ts:20-145), following the type mapping in SURVEY §1.2:
  *
  *  - `UInt64` → `LongType` (GitHub ids fit in signed 64-bit),
  *  - `UInt32`/`UInt16` → `IntegerType`,
  *  - `UInt8` boolean-ish flags → `BooleanType`,
  *  - `String`/`LowCardinality(String)`/`Enum(...)` → `StringType`
  *    (LowCardinality is an encoding hint — Parquet dictionary encoding
  *    is the analogue; enum domains live in [[Enums]]),
  *  - `DateTime` → `TimestampType` (UTC, second precision),
  *  - `Nested(...)` parallel arrays → one array-of-struct column
  *    (zips back to parallel arrays losslessly for ClickHouse export).
  *
  * Non-Nullable ClickHouse columns get dense defaults at ingest (0 / ''
  * / [] / epoch) so the Spark relation is value-identical to what
  * ClickHouse materializes; only the declared `Nullable(DateTime)`
  * columns are nullable here.
  */
object EventsSchema {

  /** Enum domains (reference: app/utils.ts:16-18,23-27) kept as ordered
    * label lists so the code↔label maps stay byte-compatible with
    * ClickHouse exports.
    */
  object Enums {
    val eventTypes: Seq[String] = Seq(
      "CommitCommentEvent", "ForkEvent", "ReleaseEvent",
      "IssueCommentEvent", "IssuesEvent", "PullRequestEvent",
      "PullRequestReviewCommentEvent", "PushEvent", "WatchEvent",
      "PullRequestReviewEvent", "IssuesReactionEvent",
      "IssueCommentsReactionEvent")
    val userTypes: Seq[String] =
      Seq("Bot", "Mannequin", "Organization", "User")
    val associations: Seq[String] = Seq(
      "COLLABORATOR", "CONTRIBUTOR", "MEMBER", "NONE", "OWNER", "MANNEQUIN")
    val reviewStates: Seq[String] = Seq(
      "approved", "commented", "dismissed", "changes_requested", "pending")
  }

  val issueLabel: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("color", StringType, nullable = false),
    StructField("default", BooleanType, nullable = false),
    StructField("description", StringType, nullable = false)))

  val issueAssignee: StructType = StructType(Seq(
    StructField("login", StringType, nullable = false),
    StructField("id", LongType, nullable = false)))

  val pushCommit: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("email", StringType, nullable = false),
    StructField("message", StringType, nullable = false)))

  val releaseAsset: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("uploader_login", StringType, nullable = false),
    StructField("uploader_id", LongType, nullable = false),
    StructField("content_type", StringType, nullable = false),
    StructField("state", StringType, nullable = false),
    StructField("size", LongType, nullable = false),
    StructField("download_count", IntegerType, nullable = false)))

  private def f(name: String, t: DataType, nullable: Boolean = false) =
    StructField(name, t, nullable)

  /** Column order follows FieldMap exactly (reference: app/utils.ts:20-145),
    * with the event `id` first as in the generated DDL (reference:
    * app/service/log_importer.ts:109-118).
    */
  val schema: StructType = StructType(Seq(
    f("id", LongType),
    // common (app/utils.ts:22-35)
    f("platform", StringType),
    f("type", StringType),
    f("action", StringType),
    f("actor_id", LongType),
    f("actor_login", StringType),
    f("repo_id", LongType),
    f("repo_name", StringType),
    f("org_id", LongType),
    f("org_login", StringType),
    f("created_at", TimestampType),
    // issues (app/utils.ts:39-61)
    f("issue_id", LongType),
    f("issue_number", IntegerType),
    f("issue_title", StringType),
    f("body", StringType),
    f("issue_labels", ArrayType(issueLabel, containsNull = false)),
    f("issue_author_id", LongType),
    f("issue_author_login", StringType),
    f("issue_author_type", StringType),
    f("issue_author_association", StringType),
    f("issue_assignee_id", LongType),
    f("issue_assignee_login", StringType),
    f("issue_assignees", ArrayType(issueAssignee, containsNull = false)),
    f("issue_created_at", TimestampType, nullable = true),
    f("issue_updated_at", TimestampType, nullable = true),
    f("issue_comments", IntegerType),
    f("issue_closed_at", TimestampType, nullable = true),
    f("issue_closed_by_pull_request_numbers",
      ArrayType(IntegerType, containsNull = false)),
    // issue comment (app/utils.ts:63-69)
    f("issue_comment_id", LongType),
    f("issue_comment_created_at", TimestampType, nullable = true),
    f("issue_comment_updated_at", TimestampType, nullable = true),
    f("issue_comment_author_association", StringType),
    f("issue_comment_author_id", LongType),
    f("issue_comment_author_login", StringType),
    f("issue_comment_author_type", StringType),
    // pull request (app/utils.ts:73-90)
    f("pull_commits", IntegerType),
    f("pull_additions", IntegerType),
    f("pull_deletions", IntegerType),
    f("pull_changed_files", IntegerType),
    f("pull_merged", BooleanType),
    f("pull_merge_commit_sha", StringType),
    f("pull_merged_at", TimestampType, nullable = true),
    f("pull_merged_by_id", LongType),
    f("pull_merged_by_login", StringType),
    f("pull_merged_by_type", StringType),
    f("pull_requested_reviewer_id", LongType),
    f("pull_requested_reviewer_login", StringType),
    f("pull_requested_reviewer_type", StringType),
    f("pull_review_comments", IntegerType),
    f("pull_base_ref", StringType),
    f("pull_head_repo_id", LongType),
    f("pull_head_repo_name", StringType),
    f("pull_head_ref", StringType),
    // pull review / review comment (app/utils.ts:92-104)
    f("pull_review_state", StringType),
    f("pull_review_author_association", StringType),
    f("pull_review_id", LongType),
    f("pull_review_comment_id", LongType),
    f("pull_review_comment_path", StringType),
    f("pull_review_comment_position", StringType),
    f("pull_review_comment_author_id", LongType),
    f("pull_review_comment_author_login", StringType),
    f("pull_review_comment_author_type", StringType),
    f("pull_review_comment_author_association", StringType),
    f("pull_review_comment_created_at", TimestampType, nullable = true),
    f("pull_review_comment_updated_at", TimestampType, nullable = true),
    // push (app/utils.ts:106-111)
    f("push_id", LongType),
    f("push_size", IntegerType),
    f("push_distinct_size", IntegerType),
    f("push_ref", StringType),
    f("push_head", StringType),
    f("push_commits", ArrayType(pushCommit, containsNull = false)),
    // fork (app/utils.ts:113-117)
    f("fork_forkee_id", LongType),
    f("fork_forkee_full_name", StringType),
    f("fork_forkee_owner_id", LongType),
    f("fork_forkee_owner_login", StringType),
    f("fork_forkee_owner_type", StringType),
    // release (app/utils.ts:119-131)
    f("release_id", LongType),
    f("release_tag_name", StringType),
    f("release_target_commitish", StringType),
    f("release_name", StringType),
    f("release_draft", BooleanType),
    f("release_author_id", LongType),
    f("release_author_login", StringType),
    f("release_author_type", StringType),
    f("release_prerelease", BooleanType),
    f("release_created_at", TimestampType, nullable = true),
    f("release_published_at", TimestampType, nullable = true),
    f("release_body", StringType),
    f("release_assets", ArrayType(releaseAsset, containsNull = false)),
    // commit comment (app/utils.ts:133-143)
    f("commit_comment_id", LongType),
    f("commit_comment_author_id", LongType),
    f("commit_comment_author_login", StringType),
    f("commit_comment_author_type", StringType),
    f("commit_comment_author_association", StringType),
    f("commit_comment_path", StringType),
    f("commit_comment_position", StringType),
    f("commit_comment_line", StringType),
    f("commit_comment_sha", StringType),
    f("commit_comment_created_at", TimestampType, nullable = true),
    f("commit_comment_updated_at", TimestampType, nullable = true),
    // provenance (app/utils.ts:144)
    f("from_api", BooleanType)))

  /** The ReplacingMergeTree ORDER BY key (reference:
    * app/service/log_importer.ts:125) minus the derived
    * toYear/toYYYYMM terms, which [[EventsWriter]] materializes as
    * `month_key` (year is functionally dependent on it).
    */
  val orderByKey: Seq[String] = Seq(
    "platform", "org_id", "repo_id", "actor_id", "type", "action",
    "month_key", "issue_id", "issue_comment_id", "pull_review_id",
    "pull_review_comment_id", "commit_comment_id", "push_id", "release_id")

  /** `GET /query/db_schema` payload shape (reference:
    * app/controller/query.ts:7-14): (column, type) pairs.
    */
  def dbSchema: Seq[(String, String)] =
    schema.fields.map(fld => (fld.name, fld.dataType.sql)).toSeq

  /** Dimension table for the Gitee connector (reference:
    * app/service/gitee_importer.ts:440-448).
    */
  val giteeOrgsRepos: StructType = StructType(Seq(
    f("id", LongType),
    f("name", StringType),
    f("type", StringType), // Enum8('org'=1,'repo'=2)
    f("created_at", TimestampType)))
}
