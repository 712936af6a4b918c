package graft.graph

import graft.SparkTestBase
import graft.ingest.GhEventParser

/** TuGraph plugin sink (A29, second adapter): chunked update_nodes /
  * update_edges plugin calls with the reference's payload shapes,
  * driven by a recording executor.
  */
class TuGraphSinkSpec extends SparkTestBase {
  import spark.implicits._

  private val lines = Seq(
    """{"id":"100","type":"IssuesEvent","actor":{"id":1,"login":"dep[bot]"},"repo":{"id":42,"name":"o/r"},"org":{"id":7,"login":"o"},"created_at":"2015-01-01T10:00:00Z","payload":{"action":"opened","issue":{"id":900,"number":12,"title":"T","labels":[{"name":"bug"}],"user":{"id":5,"login":"u"},"assignees":[{"id":6,"login":"v"}]}}}""",
    """{"id":"102","type":"IssueCommentEvent","actor":{"id":3,"login":"carol"},"repo":{"id":42,"name":"o/r"},"created_at":"2015-01-03T10:00:00Z","payload":{"action":"created","issue":{"id":900,"number":12,"title":"T","user":{"id":5,"login":"u"}},"comment":{"id":70,"body":"hi","user":{"id":3,"login":"carol"}}}}""")

  private lazy val events = GhEventParser.parse(spark.read
    .schema(graft.ingest.GhArchiveSchema.envelope)
    .option("mode", "PERMISSIVE").json(lines.toDS)).cache()

  private type Call = (String, String, Map[String, Any])

  test("exportNodes: update_nodes plugin calls, chunked, reference payload shape") {
    val calls = scala.collection.mutable.Buffer.empty[Call]
    val table = GraphElements.nodesTable(events)
    val n = TuGraphSink.exportNodes(table,
      (pt, name, payload) => calls += ((pt, name, payload)), batchSize = 2)
    assert(n === table.count())
    // every call is callPlugin('cpp', 'update_nodes', …)
    assert(calls.forall(c => c._1 == "cpp" && c._2 == "update_nodes"))
    // chunk boundary: no batch exceeds batchSize (the splitArr contract)
    assert(calls.forall(
      _._3("nodes").asInstanceOf[Seq[Map[String, Any]]].size <= 2))
    // per-label primary keys: default id; issue_label keys on name
    val byType = calls.groupBy(_._3("type"))
    assert(byType("github_repo").head._3("primary") === "id")
    assert(byType("issue_label").head._3("primary") === "name")
    // node item: {<primary>: key, data:{…}}; keys don't leak into data
    val repoNode = byType("github_repo").flatMap(
      _._3("nodes").asInstanceOf[Seq[Map[String, Any]]])
      .find(_("id") == "42").get
    val data = repoNode("data").asInstanceOf[Map[String, Any]]
    assert(!data.contains("node_id") && !data.contains("node_type"))
    // mutable entity labels carry __updated_at as 'yyyy-MM-dd HH:mm:ss'
    // (LWW: repo 42 last touched by the 2015-01-03 event)
    assert(data("__updated_at") === "2015-01-03 10:00:00")
    // dimension labels don't get the stamp
    val labelNode = byType("issue_label").flatMap(
      _._3("nodes").asInstanceOf[Seq[Map[String, Any]]]).head
    assert(!labelNode("data").asInstanceOf[Map[String, Any]]
      .contains("__updated_at"))
  }

  test("exportEdges: update_edges plugin calls with endpoint labels/keys; " +
      "unidentified edges travel as id = -1") {
    val calls = scala.collection.mutable.Buffer.empty[Call]
    val table = GraphElements.edgesTable(events)
    val n = TuGraphSink.exportEdges(table,
      (pt, name, payload) => calls += ((pt, name, payload)), batchSize = 500)
    assert(n === table.count())
    assert(calls.forall(c => c._1 == "cpp" && c._2 == "update_edges"))

    val byLabel = calls.groupBy(_._3("label"))
    // action edge: real id, actor → issue|CR disjunction string verbatim
    val comment = byLabel("comment").head._3
    assert(comment("fromLabel") === "github_actor")
    assert(comment("toLabel") === "github_issue|github_change_request")
    assert(comment("fromKey") === "id" && comment("toKey") === "id")
    val commentEdges = comment("edges").asInstanceOf[Seq[Map[String, Any]]]
    assert(commentEdges.exists(e => e("id") == 70L && e("from") == "3"))
    // structural edge: id = -1 (the reference's `v.id ?? -1`)
    val hasRepo = byLabel("has_repo").head._3
    assert(hasRepo("fromLabel") === "github_org" &&
      hasRepo("toLabel") === "github_repo")
    assert(hasRepo("edges").asInstanceOf[Seq[Map[String, Any]]]
      .forall(_("id") == -1L))
  }
}
