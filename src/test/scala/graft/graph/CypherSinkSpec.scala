package graft.graph

import graft.SparkTestBase
import graft.ingest.GhEventParser
import org.apache.spark.sql.functions._

/** Cypher sink adapter (A29): batched UNWIND…MERGE emission over the
  * consolidated tables, driven by a recording executor.
  */
class CypherSinkSpec extends SparkTestBase {
  import spark.implicits._

  private val lines = Seq(
    """{"id":"100","type":"IssuesEvent","actor":{"id":1,"login":"dep[bot]"},"repo":{"id":42,"name":"o/r"},"org":{"id":7,"login":"o"},"created_at":"2015-01-01T10:00:00Z","payload":{"action":"opened","issue":{"id":900,"number":12,"title":"T","labels":[{"name":"bug"}],"user":{"id":5,"login":"u"},"assignees":[{"id":6,"login":"v"}]}}}""",
    """{"id":"102","type":"IssueCommentEvent","actor":{"id":3,"login":"carol"},"repo":{"id":42,"name":"o/r"},"created_at":"2015-01-03T10:00:00Z","payload":{"action":"created","issue":{"id":900,"number":12,"title":"T","user":{"id":5,"login":"u"}},"comment":{"id":70,"body":"hi","user":{"id":3,"login":"carol"}}}}""")

  private lazy val events = GhEventParser.parse(spark.read
    .schema(graft.ingest.GhArchiveSchema.envelope)
    .option("mode", "PERMISSIVE").json(lines.toDS)).cache()

  test("exportNodes: one MERGE statement stream per label, batches capped") {
    val calls = scala.collection.mutable.Buffer.empty[(String, Seq[Map[String, Any]])]
    val n = CypherSink.exportNodes(GraphElements.nodesTable(events),
      (stmt, batch) => calls += ((stmt, batch)), batchSize = 2)
    assert(n === GraphElements.nodesTable(events).count())
    assert(calls.forall(_._2.size <= 2))
    val repoStmts = calls.filter(_._1.contains("MERGE (n:github_repo{id:node.id})"))
    assert(repoStmts.nonEmpty)
    assert(repoStmts.flatMap(_._2).exists(_("id") == "42"))
    // properties travel as a nested map, key columns don't leak into it
    val anyNode = calls.head._2.head
    val props = anyNode("properties").asInstanceOf[Map[String, Any]]
    assert(!props.contains("node_id") && !props.contains("node_type"))
  }

  test("exportEdges: action edges MERGE with id, structural without; label disjunction") {
    val calls = scala.collection.mutable.Buffer.empty[(String, Seq[Map[String, Any]])]
    val n = CypherSink.exportEdges(GraphElements.edgesTable(events),
      (stmt, batch) => calls += ((stmt, batch)), batchSize = 10)
    assert(n === GraphElements.edgesTable(events).count())

    val comment = calls.filter(_._1.contains("[e:comment"))
    assert(comment.nonEmpty)
    // identified: the MERGE pattern pins the edge id
    assert(comment.forall(_._1.contains("MERGE (from)-[e:comment{id:edge.id}]->(to)")))
    assert(comment.flatMap(_._2).exists(e => e("id") == 70L && e("from") == "3"))
    // issue-or-CR endpoint → label disjunction in the MATCH
    assert(comment.head._1.contains("(to:github_issue OR to:github_change_request)"))

    val hasRepo = calls.filter(_._1.contains("[e:has_repo"))
    assert(hasRepo.nonEmpty)
    assert(hasRepo.forall(s => !s._1.contains("{id:edge.id}")))
    assert(hasRepo.head._1.contains("MATCH (from:github_org{id:edge.from})"))
  }
}
