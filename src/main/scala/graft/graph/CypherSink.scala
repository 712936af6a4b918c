package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** External graph-DB sink adapter (SURVEY A29; reference:
  * app/service/log_neo4j_importer.ts:334-407): turns the consolidated
  * parquet nodes/edges tables into batched parameterized
  * `UNWIND … MERGE` Cypher statements, handed to an injected executor —
  * the same inversion as the Gitee fetcher (the driver/session library
  * is deployment infrastructure; this container has no graph DB, tests
  * supply a recording executor).
  *
  * Statement shape follows the reference exactly: nodes MERGE on the
  * per-label primary key then `SET n += node.properties`; edges MATCH
  * both endpoints by label + key and MERGE the relationship, with
  * `{id: edge.id}` on the MERGE pattern only for identified (action)
  * edges so repeated actions stay distinct while structural edges stay
  * singletons.
  *
  * Divergence, documented: our extraction keeps `github_issue` and
  * `github_change_request` as separate labels (the tugraph shape),
  * while the Neo4j reference merges them into one label. Edge
  * endpoints that may be either are matched with a label disjunction
  * (`WHERE (n:github_issue OR n:github_change_request)`), which
  * preserves id-uniqueness per label without collapsing the two types.
  *
  * Emission streams one partition at a time through the driver
  * (`toLocalIterator`) in `batchSize` chunks — the adapter feeds a
  * single graph-DB endpoint, exactly the reference's single-node
  * write path; the heavy work (consolidation) stayed distributed in
  * [[GraphElements.mergeGraph]].
  */
object CypherSink {

  /** Executes one Cypher statement with a parameter batch. */
  type CypherExecutor = (String, Seq[Map[String, Any]]) => Unit

  private val issueish = Seq("github_issue", "github_change_request")

  /** edge_type → (fromLabels, toLabels), per the extraction semantics
    * of [[GraphElements.edges]] (reference edgeTypePair,
    * log_neo4j_importer.ts:60-85).
    */
  val edgeEndpointLabels: Map[String, (Seq[String], Seq[String])] = Map(
    "has_repo" -> (Seq("github_org"), Seq("github_repo")),
    "has_issue_label" -> (issueish, Seq("issue_label")),
    "has_assignee" -> (issueish, Seq("github_actor")),
    "has_issue_change_request" -> (Seq("github_repo"), issueish),
    "has_requested_reviewer" -> (issueish, Seq("github_actor")),
    "open" -> (Seq("github_actor"), issueish),
    "close" -> (Seq("github_actor"), issueish),
    "comment" -> (Seq("github_actor"), issueish),
    "review" -> (Seq("github_actor"), issueish),
    "review_comment" -> (Seq("github_actor"), issueish),
    "has_language" -> (Seq("github_repo"), Seq("language")),
    "has_license" -> (Seq("github_repo"), Seq("license")))

  def nodeStatement(nodeType: String): String =
    s"""UNWIND $$nodes AS node
       |MERGE (n:$nodeType{id:node.id})
       |SET n += node.properties""".stripMargin

  private def labelMatch(alias: String, labels: Seq[String], param: String): String =
    if (labels.size == 1) s"($alias:${labels.head}{id:$param})"
    else s"($alias) WHERE (${labels.map(l => s"$alias:$l").mkString(" OR ")}) AND $alias.id = $param"

  /** `identified` = the edge carries a real id (action edges); the id
    * goes into the MERGE pattern so distinct actions stay distinct.
    */
  def edgeStatement(edgeType: String, identified: Boolean): String = {
    val (fromLabels, toLabels) = edgeEndpointLabels.getOrElse(edgeType,
      (Seq.empty, Seq.empty))
    val fromM =
      if (fromLabels.isEmpty) "(from {id:edge.from})"
      else labelMatch("from", fromLabels, "edge.from")
    val toM =
      if (toLabels.isEmpty) "(to {id:edge.to})"
      else labelMatch("to", toLabels, "edge.to")
    val idPart = if (identified) "{id:edge.id}" else ""
    s"""UNWIND $$edges AS edge
       |MATCH $fromM
       |MATCH $toM
       |MERGE (from)-[e:$edgeType$idPart]->(to)
       |SET e += edge.data""".stripMargin
  }

  /** Emit every node as `{id, properties}` batches, one statement
    * stream per label. Returns nodes emitted.
    */
  def exportNodes(nodes: DataFrame, exec: CypherExecutor,
      batchSize: Int = 1000): Long = {
    import scala.jdk.CollectionConverters._
    val types = nodes.select("node_type").distinct()
      .collect().map(_.getString(0)).sorted
    var n = 0L
    types.foreach { t =>
      val propCols = nodes.columns.filterNot(Set("node_type", "node_id", "bucket"))
      val slice = nodes.filter(col("node_type") === t)
      slice.toLocalIterator().asScala.grouped(batchSize).foreach { rows =>
        val batch = rows.map { r =>
          Map[String, Any](
            "id" -> r.getAs[String]("node_id"),
            "properties" -> propCols.map(c => c -> r.getAs[Any](c)).toMap)
        }.toSeq
        exec(nodeStatement(t), batch)
        n += batch.size
      }
    }
    n
  }

  /** Emit every edge as `{from, to, id?, data}` batches, one statement
    * stream per (edge_type, identified). Returns edges emitted.
    */
  def exportEdges(edges: DataFrame, exec: CypherExecutor,
      batchSize: Int = 1000): Long = {
    import scala.jdk.CollectionConverters._
    val keys = edges.select(col("edge_type"), (col("edge_id") > 0).as("identified"))
      .distinct().collect()
      .map(r => (r.getString(0), r.getBoolean(1))).sorted
    var n = 0L
    val dataCols = edges.columns
      .filterNot(Set("edge_type", "src", "dst", "edge_id", "bucket"))
    keys.foreach { case (t, identified) =>
      val slice = edges.filter(col("edge_type") === t &&
        (if (identified) col("edge_id") > 0 else col("edge_id") <= 0))
      slice.toLocalIterator().asScala.grouped(batchSize).foreach { rows =>
        val batch = rows.map { r =>
          val base = Map[String, Any](
            "from" -> r.getAs[String]("src"),
            "to" -> r.getAs[String]("dst"),
            "data" -> dataCols.map(c => c -> r.getAs[Any](c)).toMap)
          if (identified) base + ("id" -> r.getAs[Long]("edge_id")) else base
        }.toSeq
        exec(edgeStatement(t, identified), batch)
        n += batch.size
      }
    }
    n
  }
}
