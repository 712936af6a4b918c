package graft.gitee

import graft.SparkTestBase

/** Gitee normalizer (SURVEY A25) over canned API payloads — type/action
  * vocabulary remaps, base-36 issue numbers, merged→closed+pull_merged,
  * forced `created`, drop rules (reference:
  * app/service/gitee_importer.ts:22-46,155-288).
  */
class GiteeNormalizerSpec extends SparkTestBase {

  private def normalize(lines: String*) = {
    import spark.implicits._
    GiteeNormalizer.normalize(
      spark.read.schema(GiteeNormalizer.rawSchema).json(lines.toDS))
  }

  test("StarEvent → WatchEvent with action starred→started") {
    val out = normalize(
      """{"id":10,"type":"StarEvent","actor":{"id":1,"login":"a"},
        |"repo":{"id":2,"full_name":"o/r"},"created_at":"2023-01-01T00:00:00+08:00",
        |"payload":{"action":"starred"}}""".stripMargin.replace("\n", "")).collect()
    assert(out.length === 1)
    assert(out(0).getAs[String]("type") === "WatchEvent")
    assert(out(0).getAs[String]("action") === "started")
    assert(out(0).getAs[String]("platform") === "Gitee")
    assert(out(0).getAs[String]("repo_name") === "o/r")
    assert(out(0).getAs[Boolean]("from_api") === false) // reference never sets it
  }

  test("IssueEvent → IssuesEvent with base-36 number") {
    val out = normalize(
      """{"id":11,"type":"IssueEvent","actor":{"id":1,"login":"a"},
        |"repo":{"id":2,"full_name":"o/r"},"created_at":"2023-01-01T00:00:00Z",
        |"payload":{"action":"open","id":900,"number":"I4XYZ","title":"t","body":"b",
        |"user":{"id":5,"login":"u"}}}""".stripMargin.replace("\n", "")).collect()
    assert(out.length === 1)
    assert(out(0).getAs[String]("type") === "IssuesEvent")
    assert(out(0).getAs[String]("action") === "opened") // open→opened
    assert(out(0).getAs[Int]("issue_number") === Integer.parseInt("I4XYZ", 36))
    assert(out(0).getAs[Long]("issue_id") === 900L)
  }

  test("PullRequestEvent merged → closed + pull_merged, base-10 number") {
    val out = normalize(
      """{"id":12,"type":"PullRequestEvent","actor":{"id":1,"login":"a"},
        |"repo":{"id":2,"full_name":"o/r"},"created_at":"2023-01-01T00:00:00Z",
        |"payload":{"action":"merged","id":901,"number":"17","title":"pr","body":"b",
        |"user":{"id":5,"login":"u"},"merged_at":"2023-01-01T00:00:00Z"}}"""
        .stripMargin.replace("\n", "")).collect()
    assert(out.length === 1)
    assert(out(0).getAs[String]("action") === "closed")
    assert(out(0).getAs[Boolean]("pull_merged") === true)
    assert(out(0).getAs[Int]("issue_number") === 17) // base 10 for PRs
    assert(out(0).getAs[java.sql.Timestamp]("pull_merged_at") !== null)
  }

  test("IssueCommentEvent forces action=created; PullRequestCommentEvent does NOT") {
    val issueC = normalize(
      """{"id":13,"type":"IssueCommentEvent","actor":{"id":1,"login":"a"},
        |"repo":{"id":2,"full_name":"o/r"},"created_at":"2023-01-01T00:00:00Z",
        |"payload":{"issue":{"id":900,"number":"AB12","title":"t","body":"ib",
        |"user":{"id":5,"login":"u"}},
        |"comment":{"id":70,"body":"cb","user":{"id":6,"login":"c"}}}}"""
        .stripMargin.replace("\n", "")).collect()
    assert(issueC.length === 1)
    assert(issueC(0).getAs[String]("action") === "created")
    assert(issueC(0).getAs[String]("body") === "cb") // comment body wins
    assert(issueC(0).getAs[Long]("issue_comment_id") === 70L)

    // The reference's `type === 'PullRequestCommentEvent'` check compares
    // the mapped name and never fires (gitee_importer.ts:194-196):
    val prC = normalize(
      """{"id":14,"type":"PullRequestCommentEvent","actor":{"id":1,"login":"a"},
        |"repo":{"id":2,"full_name":"o/r"},"created_at":"2023-01-01T00:00:00Z",
        |"payload":{"pull_request":{"id":901,"number":"18","title":"t","body":"pb",
        |"user":{"id":5,"login":"u"}},
        |"comment":{"id":71,"body":"rb","user":{"id":6,"login":"c"}}}}"""
        .stripMargin.replace("\n", "")).collect()
    assert(prC.length === 1)
    assert(prC(0).getAs[String]("type") === "PullRequestReviewCommentEvent")
    assert(prC(0).getAs[String]("action") === "") // no action in payload → ''
  }

  test("drops: unsupported type, progressing action, missing ids") {
    val out = normalize(
      // unsupported type
      """{"id":20,"type":"CreateEvent","actor":{"id":1,"login":"a"},"repo":{"id":2,"full_name":"o/r"},"created_at":"2023-01-01T00:00:00Z","payload":{}}""",
      // progressing action
      """{"id":21,"type":"IssueEvent","actor":{"id":1,"login":"a"},"repo":{"id":2,"full_name":"o/r"},"created_at":"2023-01-01T00:00:00Z","payload":{"action":"progressing","id":900,"number":"A1","title":"t","user":{"id":5,"login":"u"}}}""",
      // issue without number
      """{"id":22,"type":"IssueEvent","actor":{"id":1,"login":"a"},"repo":{"id":2,"full_name":"o/r"},"created_at":"2023-01-01T00:00:00Z","payload":{"action":"open","id":900,"title":"t","user":{"id":5,"login":"u"}}}""",
      // comment event without comment id
      """{"id":23,"type":"IssueCommentEvent","actor":{"id":1,"login":"a"},"repo":{"id":2,"full_name":"o/r"},"created_at":"2023-01-01T00:00:00Z","payload":{"issue":{"id":900,"number":"A1","title":"t","user":{"id":5,"login":"u"}},"comment":{"body":"cb"}}}""")
    assert(out.count() === 0)
  }

  test("normalized rows union cleanly with the GitHub schema") {
    val out = normalize(
      """{"id":10,"type":"StarEvent","actor":{"id":1,"login":"a"},
        |"repo":{"id":2,"full_name":"o/r"},"created_at":"2023-01-01T00:00:00Z",
        |"payload":{"action":"starred"}}""".stripMargin.replace("\n", ""))
    assert(out.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      graft.ingest.EventsSchema.schema.fields.map(f => (f.name, f.dataType)).toSeq)
  }
}
