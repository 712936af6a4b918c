package graft.ingest

import org.apache.spark.sql.types._

/** Input schema for raw GH Archive hour files — exactly the envelope
  * and payload fields the reference's parsers touch (reference:
  * app/parser.js:13-277), nothing more. A fixed schema (no inference)
  * is the Spark analogue of the reference's hand-written projections
  * (SURVEY §1.3): `spark.read.json` with this schema prunes the JSON
  * tokenizer to these paths and is deterministic across hours.
  *
  * All leaf timestamps arrive as ISO-8601 strings; the projection
  * converts to UTC second-precision timestamps (reference:
  * app/parser.js:6-11).
  */
object GhArchiveSchema {

  /** user object: issue/comment/release authors etc. */
  val user: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("login", StringType),
    StructField("type", StringType),
    StructField("name", StringType),
    StructField("email", StringType)))

  val label: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("color", StringType),
    StructField("default", BooleanType),
    StructField("description", StringType)))

  /** One struct type serves both `payload.issue` and
    * `payload.pull_request` (the reference reads them interchangeably:
    * `payload.issue ?? payload.pull_request`, app/parser.js:36), so the
    * two columns coalesce structurally.
    */
  val issueOrPr: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("number", IntegerType),
    StructField("title", StringType),
    StructField("body", StringType),
    StructField("labels", ArrayType(label)),
    StructField("user", user),
    StructField("author_association", StringType),
    StructField("assignee", user),
    StructField("assignees", ArrayType(user)),
    StructField("comments", IntegerType),
    StructField("created_at", StringType),
    StructField("updated_at", StringType),
    StructField("closed_at", StringType),
    // PR-only fields (app/parser.js:95-126)
    StructField("commits", IntegerType),
    StructField("additions", IntegerType),
    StructField("deletions", IntegerType),
    StructField("changed_files", IntegerType),
    StructField("merged", BooleanType),
    StructField("merge_commit_sha", StringType),
    StructField("merged_at", StringType),
    StructField("merged_by", user),
    StructField("review_comments", IntegerType),
    StructField("requested_reviewers", ArrayType(user)),
    // base.repo carries repo metadata the graph projection reads
    // (language/license/description — reference:
    // app/service/log_tugraph_importer.ts:255-275); the flattening
    // projection itself ignores them (FieldMap has no such columns).
    StructField("base", StructType(Seq(
      StructField("ref", StringType),
      StructField("sha", StringType),
      StructField("repo", StructType(Seq(
        StructField("language", StringType),
        StructField("license", StructType(Seq(
          StructField("spdx_id", StringType)))),
        StructField("description", StringType),
        StructField("default_branch", StringType))))))),
    StructField("head", StructType(Seq(
      StructField("ref", StringType),
      StructField("sha", StringType),
      StructField("repo", StructType(Seq(
        StructField("id", LongType),
        StructField("full_name", StringType)))))))))

  /** comment object: issue comments, review comments, commit comments
    * (app/parser.js:81-93,140-167,236-264).
    */
  val comment: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("pull_request_review_id", LongType),
    StructField("body", StringType),
    StructField("path", StringType),
    StructField("position", LongType),
    StructField("line", LongType),
    StructField("commit_id", StringType),
    StructField("created_at", StringType),
    StructField("updated_at", StringType),
    StructField("user", user),
    StructField("author_association", StringType)))

  val review: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("state", StringType),
    StructField("body", StringType),
    StructField("author_association", StringType)))

  val pushCommit: StructType = StructType(Seq(
    StructField("author", StructType(Seq(
      StructField("name", StringType),
      StructField("email", StringType)))),
    StructField("message", StringType)))

  val releaseAsset: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("uploader", user),
    StructField("content_type", StringType),
    StructField("state", StringType),
    StructField("size", LongType),
    StructField("download_count", IntegerType)))

  val release: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("tag_name", StringType),
    StructField("target_commitish", StringType),
    StructField("name", StringType),
    StructField("draft", BooleanType),
    StructField("author", user),
    StructField("prerelease", BooleanType),
    StructField("created_at", StringType),
    StructField("published_at", StringType),
    StructField("body", StringType),
    StructField("assets", ArrayType(releaseAsset))))

  val payload: StructType = StructType(Seq(
    StructField("action", StringType),
    StructField("issue", issueOrPr),
    StructField("pull_request", issueOrPr),
    StructField("comment", comment),
    StructField("review", review),
    StructField("push_id", LongType),
    StructField("size", IntegerType),
    StructField("distinct_size", IntegerType),
    StructField("ref", StringType),
    StructField("head", StringType),
    StructField("commits", ArrayType(pushCommit)),
    StructField("forkee", StructType(Seq(
      StructField("id", LongType),
      StructField("full_name", StringType),
      StructField("owner", user)))),
    StructField("release", release)))

  /** Envelope (app/parser.js:13-32). `id` is a numeric string
    * (`parseInt`, app/parser.js:16). `_corrupt_record` captures
    * unparseable lines for the validator (SURVEY A4/A5): PERMISSIVE
    * reads keep good lines and quarantine bad ones, mirroring the
    * reference's tolerant per-line parse (app/importer_worker.js:31-39).
    */
  val envelope: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("type", StringType),
    StructField("actor", StructType(Seq(
      StructField("id", LongType),
      StructField("login", StringType)))),
    StructField("repo", StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType)))),
    StructField("org", StructType(Seq(
      StructField("id", LongType),
      StructField("login", StringType)))),
    StructField("created_at", StringType),
    StructField("payload", payload),
    StructField("_corrupt_record", StringType)))
}
