package graft.ingest

import graft.SparkTestBase
import java.io.{File, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.zip.GZIPOutputStream

/** Parser fixtures per FIXTURES.md §1: complete, minimal (every `??`
  * default), and drop cases for each event type the reference ingests
  * (reference: app/parser.js:13-277).
  */
class GhEventParserSpec extends SparkTestBase {

  private def writeHourFile(lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("gh_fixture").toFile
    val f = new File(dir, "2015-01-01-15.json.gz")
    val out = new GZIPOutputStream(new FileOutputStream(f))
    out.write(lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    out.close()
    f.getAbsolutePath
  }

  private val issuesComplete =
    """{"id":"2489651045","type":"IssuesEvent","actor":{"id":1,"login":"alice"},
      |"repo":{"id":42,"name":"org/repo"},"org":{"id":7,"login":"org"},
      |"created_at":"2015-01-01T15:00:30Z","payload":{"action":"opened",
      |"issue":{"id":900,"number":12,"title":"T","body":"B",
      |"labels":[{"name":"bug","color":"f00","default":true,"description":"d"}],
      |"user":{"id":5,"login":"bob","type":"User"},"author_association":"MEMBER",
      |"assignee":{"id":6,"login":"carol"},
      |"assignees":[{"id":6,"login":"carol"},{"id":8,"login":"dan"}],
      |"comments":3,"created_at":"2015-01-01T10:00:00Z",
      |"updated_at":"2015-01-01T14:00:00Z","closed_at":null}}}""".stripMargin.replace("\n", "")

  private val issuesMinimal = // every ?? default: no org, no action, bare issue
    """{"id":"2","type":"IssuesEvent","actor":{"id":1,"login":"alice"},
      |"repo":{"id":42,"name":"org/repo"},"created_at":"2015-01-01T15:01:00Z",
      |"payload":{"issue":{"id":901,"number":13}}}""".stripMargin.replace("\n", "")

  private val issuesNoIssue = // parser returns null → dropped (parser.js:38-40)
    """{"id":"3","type":"IssuesEvent","actor":{"id":1,"login":"a"},
      |"repo":{"id":42,"name":"r"},"created_at":"2015-01-01T15:02:00Z",
      |"payload":{"action":"opened"}}""".stripMargin.replace("\n", "")

  private val unknownType = // dispatch miss → dropped (importer_worker.js:34)
    """{"id":"4","type":"GollumEvent","actor":{"id":1,"login":"a"},
      |"repo":{"id":42,"name":"r"},"created_at":"2015-01-01T15:03:00Z",
      |"payload":{}}""".stripMargin.replace("\n", "")

  private val pushEvent =
    """{"id":"5","type":"PushEvent","actor":{"id":2,"login":"bob"},
      |"repo":{"id":43,"name":"r2"},"created_at":"2015-01-01T15:04:00Z",
      |"payload":{"push_id":111,"size":2,"distinct_size":2,"ref":"refs/heads/main",
      |"head":"abc123","commits":[
      |{"author":{"name":"Bob","email":"b@x"},"message":"m1"},
      |{"author":null,"message":null}]}}""".stripMargin.replace("\n", "")

  private val prEvent =
    """{"id":"6","type":"PullRequestEvent","actor":{"id":3,"login":"eve"},
      |"repo":{"id":44,"name":"r3"},"created_at":"2015-01-01T15:05:00Z",
      |"payload":{"action":"closed","pull_request":{"id":902,"number":14,
      |"title":"PR","body":"pb","user":{"id":9,"login":"frank","type":"User"},
      |"comments":0,"commits":3,"additions":10,"deletions":2,"changed_files":4,
      |"merged":true,"merge_commit_sha":"sha1","merged_at":"2015-01-01T15:04:59Z",
      |"merged_by":{"id":10,"login":"gina","type":"User"},"review_comments":1,
      |"requested_reviewers":[{"id":11,"login":"hank","type":"User"},
      |{"id":12,"login":"iris","type":"User"}],
      |"base":{"ref":"main"},"head":{"ref":"feat",
      |"repo":{"id":45,"full_name":"fork/r3"}}}}}""".stripMargin.replace("\n", "")

  private val watchEvent =
    """{"id":"7","type":"WatchEvent","actor":{"id":4,"login":"watcher[bot]"},
      |"repo":{"id":46,"name":"r4"},"created_at":"2015-01-01T15:06:00Z",
      |"payload":{"action":"started"}}""".stripMargin.replace("\n", "")

  private val corruptLine = """{"id":"8","type":"WatchEvent", BROKEN"""

  private lazy val parsed = {
    val path = writeHourFile(Seq(issuesComplete, issuesMinimal, issuesNoIssue,
      unknownType, pushEvent, prEvent, watchEvent, corruptLine))
    GhEventParser.ingest(spark, Seq(path)).cache()
  }

  test("schema matches EventsSchema exactly (names, types, order)") {
    assert(parsed.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      EventsSchema.schema.fields.map(f => (f.name, f.dataType)).toSeq)
  }

  test("drops unknown types, issue-less issue events, corrupt lines") {
    // 8 input lines → 5 surviving rows
    assert(parsed.count() === 5)
    assert(parsed.filter("type = 'GollumEvent'").count() === 0)
    assert(parsed.filter("id = 3 or id = 4 or id = 8").count() === 0)
  }

  test("complete IssuesEvent row: all fields projected") {
    val r = parsed.filter("id = 2489651045").collect()(0)
    def v[T](n: String): T = r.getAs[T](n)
    assert(v[String]("platform") === "GitHub")
    assert(v[String]("type") === "IssuesEvent")
    assert(v[String]("action") === "opened")
    assert(v[Long]("actor_id") === 1L && v[String]("actor_login") === "alice")
    assert(v[Long]("repo_id") === 42L && v[String]("repo_name") === "org/repo")
    assert(v[Long]("org_id") === 7L && v[String]("org_login") === "org")
    assert(v[java.sql.Timestamp]("created_at").toInstant.toString === "2015-01-01T15:00:30Z")
    assert(v[Long]("issue_id") === 900L && v[Int]("issue_number") === 12)
    assert(v[String]("issue_title") === "T" && v[String]("body") === "B")
    val labels = r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("issue_labels")
    assert(labels.map(l => (l.getString(0), l.getString(1), l.getBoolean(2), l.getString(3))).toSeq
      === Seq(("bug", "f00", true, "d")))
    assert(v[String]("issue_author_association") === "MEMBER")
    assert(v[Long]("issue_assignee_id") === 6L)
    val assignees = r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("issue_assignees")
    assert(assignees.map(a => (a.getString(0), a.getLong(1))).toSeq === Seq(("carol", 6L), ("dan", 8L)))
    assert(v[Int]("issue_comments") === 3)
    assert(r.getAs[java.sql.Timestamp]("issue_closed_at") === null)
    assert(v[Boolean]("from_api") === false)
  }

  test("minimal IssuesEvent: dense defaults for every absent field") {
    val r = parsed.filter("id = 2").collect()(0)
    def v[T](n: String): T = r.getAs[T](n)
    assert(v[String]("action") === "")           // absent action → ''
    assert(v[Long]("org_id") === 0L && v[String]("org_login") === "")
    assert(v[String]("issue_title") === "" && v[String]("body") === "")
    assert(v[String]("issue_author_association") === "NONE") // ?? 'NONE' (parser.js:57)
    assert(r.getAs[scala.collection.Seq[_]]("issue_labels").isEmpty)
    assert(r.getAs[scala.collection.Seq[_]]("issue_assignees").isEmpty)
    assert(v[Int]("issue_comments") === 0)
    assert(r.getAs[java.sql.Timestamp]("issue_created_at") === null)
    // non-issue groups fully defaulted
    assert(v[Long]("push_id") === 0L && v[String]("push_ref") === "")
    assert(v[Boolean]("pull_merged") === false)
    assert(r.getAs[scala.collection.Seq[_]]("release_assets").isEmpty)
  }

  test("PushEvent: commits → array-of-struct with null author coerced") {
    val r = parsed.filter("id = 5").collect()(0)
    assert(r.getAs[Long]("push_id") === 111L)
    assert(r.getAs[Int]("push_size") === 2)
    val commits = r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("push_commits")
    assert(commits.map(c => (c.getString(0), c.getString(1), c.getString(2))).toSeq
      === Seq(("Bob", "b@x", "m1"), ("", "", "")))
  }

  test("PullRequestEvent: PR stats, merged flag, first reviewer only") {
    val r = parsed.filter("id = 6").collect()(0)
    def v[T](n: String): T = r.getAs[T](n)
    assert(v[Int]("pull_commits") === 3 && v[Int]("pull_additions") === 10)
    assert(v[Boolean]("pull_merged") === true)
    assert(v[String]("pull_merge_commit_sha") === "sha1")
    assert(v[Long]("pull_merged_by_id") === 10L)
    // first requested reviewer only (parser.js:98)
    assert(v[Long]("pull_requested_reviewer_id") === 11L)
    assert(v[String]("pull_requested_reviewer_login") === "hank")
    assert(v[String]("pull_base_ref") === "main")
    assert(v[Long]("pull_head_repo_id") === 45L)
    assert(v[String]("pull_head_repo_name") === "fork/r3")
    // issue fields come from pull_request (payload.issue ?? payload.pull_request)
    assert(v[Long]("issue_id") === 902L && v[Int]("issue_number") === 14)
  }

  test("WatchEvent: envelope only, everything else defaulted") {
    val r = parsed.filter("id = 7").collect()(0)
    assert(r.getAs[String]("action") === "started")
    assert(r.getAs[Long]("issue_id") === 0L)
    assert(r.getAs[String]("body") === "")
  }

  test("malformed envelope timestamp drops the row; malformed nested timestamp nulls out") {
    val badEnvelope =
      """{"id":"20","type":"WatchEvent","actor":{"id":1,"login":"a"},"repo":{"id":2,"name":"r"},"created_at":"not-a-date","payload":{"action":"started"}}"""
    val badNested =
      """{"id":"21","type":"IssuesEvent","actor":{"id":1,"login":"a"},"repo":{"id":2,"name":"r"},"created_at":"2015-01-01T15:00:00Z","payload":{"issue":{"id":1,"number":1,"created_at":"garbage"}}}"""
    val out = GhEventParser.ingest(spark, Seq(writeHourFile(Seq(badEnvelope, badNested))))
    val rows = out.collect()
    assert(rows.length === 1 && rows(0).getAs[Long]("id") === 21L)
    assert(rows(0).getAs[java.sql.Timestamp]("issue_created_at") === null)
  }

  test("validator counts the corrupt line per file (A4)") {
    val path = writeHourFile(Seq(issuesComplete, corruptLine, pushEvent))
    val v = FilePipeline.validate(spark, Seq(path)).collect()(0)
    assert(v.getAs[String]("path").endsWith("2015-01-01-15.json.gz"))
    assert(v.getAs[Long]("total_lines") === 3)
    assert(v.getAs[Long]("corrupt_lines") === 1)
    assert(v.getAs[Boolean]("valid") === false)
  }
}
