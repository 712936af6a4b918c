package graft.graph

import graft.SparkTestBase
import graft.ingest.GhEventParser
import org.apache.spark.sql.functions._

/** Graph element extraction goldens (SURVEY A28) on a fixture hour:
  * node/edge identities, the repoId_number issue key, merged flag on
  * PR close edges, bot detection, and the raw-payload language/license
  * facts.
  */
class GraphElementsSpec extends SparkTestBase {
  import spark.implicits._

  private val lines = Seq(
    // bot opens an issue with a label and an assignee
    """{"id":"100","type":"IssuesEvent","actor":{"id":1,"login":"dep[bot]"},"repo":{"id":42,"name":"o/r"},"org":{"id":7,"login":"o"},"created_at":"2015-01-01T10:00:00Z","payload":{"action":"opened","issue":{"id":900,"number":12,"title":"T","labels":[{"name":"bug"}],"user":{"id":5,"login":"u"},"assignees":[{"id":6,"login":"v"}]}}}""",
    // merged PR close with language/license on base.repo
    """{"id":"101","type":"PullRequestEvent","actor":{"id":2,"login":"alice"},"repo":{"id":42,"name":"o/r"},"created_at":"2015-01-02T10:00:00Z","payload":{"action":"closed","pull_request":{"id":901,"number":13,"title":"PR","user":{"id":5,"login":"u"},"merged":true,"base":{"ref":"main","repo":{"language":"Scala","license":{"spdx_id":"Apache-2.0"}}},"head":{"ref":"f","repo":{"id":43,"full_name":"f/r"}}}}}""",
    // comment on the issue
    """{"id":"102","type":"IssueCommentEvent","actor":{"id":3,"login":"carol"},"repo":{"id":42,"name":"o/r"},"created_at":"2015-01-03T10:00:00Z","payload":{"action":"created","issue":{"id":900,"number":12,"title":"T","user":{"id":5,"login":"u"}},"comment":{"id":70,"body":"hi","user":{"id":3,"login":"carol"}}}}""")

  private lazy val raw = spark.read
    .schema(graft.ingest.GhArchiveSchema.envelope)
    .option("mode", "PERMISSIVE").json(lines.toDS)
  private lazy val events = GhEventParser.parse(raw).cache()

  test("nodes: repo/actor/org/issue/CR/label keyed per the reference") {
    val n = GraphElements.nodesTable(events)
    val byKey = n.collect()
      .map(r => (r.getAs[String]("node_type"), r.getAs[String]("node_id")) -> r).toMap
    assert(byKey.contains(("github_repo", "42")))
    assert(byKey.contains(("github_org", "7")))
    assert(byKey.contains(("github_issue", "42_12")))       // {repoId}_{number}
    assert(byKey.contains(("github_change_request", "42_13")))
    assert(byKey.contains(("issue_label", "bug")))
    assert(byKey(("github_actor", "1")).getAs[Boolean]("is_bot") === true)
    assert(byKey(("github_actor", "2")).getAs[Boolean]("is_bot") === false)
    // assignee became an actor node too
    assert(byKey.contains(("github_actor", "6")))
  }

  test("edges: open/close/comment with merged flag on the PR close") {
    val e = GraphElements.edgesTable(events)
    val rows = e.collect().map(r =>
      (r.getAs[String]("edge_type"), r.getAs[String]("src"), r.getAs[String]("dst")) -> r).toMap
    assert(rows.contains(("open", "1", "42_12")))
    val close = rows(("close", "2", "42_13"))
    assert(close.getAs[Boolean]("merged") === true)
    val cm = rows(("comment", "3", "42_12"))
    assert(cm.getAs[Long]("edge_id") === 70L && cm.getAs[String]("body") === "hi")
    assert(rows.contains(("has_repo", "7", "42")))
    assert(rows.contains(("has_issue_label", "42_12", "bug")))
    assert(rows.contains(("has_assignee", "42_12", "6")))
  }

  test("mergeGraph: incremental upsert rewrites only touched buckets; degree accumulates") {
    val dir = java.nio.file.Files.createTempDirectory("graph").toFile
    val nodesPath = new java.io.File(dir, "nodes").getAbsolutePath
    val edgesPath = new java.io.File(dir, "edges").getAbsolutePath

    GraphElements.mergeGraph(events, nodesPath, edgesPath, numBuckets = 16)
    val after1 = spark.read.parquet(nodesPath)
    val repoDeg1 = after1
      .filter(col("node_type") === "github_repo" && col("node_id") === "42")
      .head.getAs[Long]("degree")
    assert(repoDeg1 === 3L) // witnessed by all three fixture events

    // snapshot every parquet file (path -> (size, checksum)) before merge 2
    def snapshot(root: String): Map[String, (Long, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles.toSeq.flatMap(walk)
        else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
      walk(new java.io.File(root)).map { f =>
        val c = new java.util.zip.CRC32()
        c.update(java.nio.file.Files.readAllBytes(f.toPath))
        f.getAbsolutePath -> (f.length, c.getValue)
      }.toMap
    }
    val before = snapshot(nodesPath)

    // second batch: one more comment on the same issue by the same actor —
    // touches the buckets of (github_actor,3), (github_repo,42),
    // (github_issue,42_12) … but not, e.g., (issue_label,bug)'s bucket
    // unless they collide; with 16 buckets at least one bucket must
    // remain untouched and byte-identical.
    val more = GhEventParser.parse(spark.read
      .schema(graft.ingest.GhArchiveSchema.envelope)
      .option("mode", "PERMISSIVE").json(Seq(
        """{"id":"103","type":"IssueCommentEvent","actor":{"id":3,"login":"carol"},"repo":{"id":42,"name":"o/r"},"created_at":"2015-01-04T10:00:00Z","payload":{"action":"created","issue":{"id":900,"number":12,"title":"T","user":{"id":5,"login":"u"}},"comment":{"id":71,"body":"again","user":{"id":3,"login":"carol"}}}}""").toDS))
    GraphElements.mergeGraph(more, nodesPath, edgesPath, numBuckets = 16)

    val after2 = spark.read.parquet(nodesPath)
    // LWW + degree accumulation: repo 42 now has 4 witnesses total
    val repo = after2
      .filter(col("node_type") === "github_repo" && col("node_id") === "42").head
    assert(repo.getAs[Long]("degree") === 4L)
    assert(repo.getAs[java.sql.Timestamp]("updated_at").toString.startsWith("2015-01-04"))
    // entities untouched by batch 2 are still there, unchanged
    assert(after2.filter(col("node_type") === "issue_label" && col("node_id") === "bug").count() === 1L)

    val after = snapshot(nodesPath)
    val untouched = before.keySet.intersect(after.keySet)
      .filter(k => before(k) == after(k))
    assert(untouched.nonEmpty,
      "at least one bucket file must survive the merge byte-identical")
    // and some bucket WAS rewritten (the merge actually did something)
    assert(before.keySet.diff(after.keySet).nonEmpty || before != after)
  }

  test("rawRepoFacts: language/license nodes + edges from the raw payload") {
    val (n, e) = GraphElements.rawRepoFacts(raw)
    val nodes = n.select("node_type", "node_id").as[(String, String)].collect().toSet
    assert(nodes === Set(("language", "Scala"), ("license", "Apache-2.0")))
    val edges = e.select("edge_type", "src", "dst").as[(String, String, String)].collect().toSet
    assert(edges === Set(
      ("has_language", "42", "Scala"), ("has_license", "42", "Apache-2.0")))
  }
}
