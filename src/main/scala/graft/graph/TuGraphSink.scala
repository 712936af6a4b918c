package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TuGraph plugin-call sink (SURVEY A29 second adapter; reference:
  * app/service/log_tugraph_importer.ts:346-425): where the Neo4j path
  * emits `UNWIND … MERGE` Cypher ([[CypherSink]]), the TuGraph path
  * upserts through two server-side plugins — `update_nodes` /
  * `update_edges` — each fed fixed-size chunks (500 items,
  * `splitArr`, log_tugraph_importer.ts:417-425) via
  * `callPlugin('cpp', name, payload)`.
  *
  * Payload shapes follow the reference exactly:
  *  - nodes: `{type, primary, nodes:[{<primary>: id, data:{…}}]}`
  *    (log_tugraph_importer.ts:346-369), with `data.__updated_at` set
  *    for the five mutable entity labels (actor/repo/org/issue/CR,
  *    :358-360) as the reference's `'yyyy-MM-dd HH:mm:ss'` string
  *    (`tugraphDateTime`, :416).
  *  - edges: `{fromKey, fromLabel, toKey, toLabel, label, edges:
  *    [{from, to, data, id}]}` with `id = -1` for unidentified edges
  *    (`v.id ?? -1`, :381-387) — unlike Cypher there is no separate
  *    statement per identified-ness; the plugin branches on the id.
  *
  * The per-label primary key map and the edge endpoint-label pairs
  * (including the verbatim `'github_issue|github_change_request'`
  * disjunction strings) mirror log_tugraph_importer.ts:16-46.
  *
  * Like [[CypherSink]], emission streams partitions through the driver
  * (`toLocalIterator`) — the adapter feeds a single graph-DB endpoint;
  * the distributed work (LWW consolidation) already happened in
  * [[GraphElements.mergeGraph]]. The executor is injected (this
  * container has no TuGraph server; tests record the calls).
  */
object TuGraphSink {

  /** Executes one plugin call: (pluginType, pluginName, payload) —
    * the `callPlugin('cpp', 'update_nodes', {...})` shape.
    */
  type PluginExecutor = (String, String, Map[String, Any]) => Unit

  /** reference `splitArr` default chunk length (:417). */
  val DefaultBatch = 500

  /** per-label primary key (reference :16-20); every other label keys
    * on `id`.
    */
  val nodePrimaryKey: Map[String, String] = Map(
    "issue_label" -> "name",
    "language" -> "name",
    "license" -> "spdx_id")

  def primaryOf(label: String): String = nodePrimaryKey.getOrElse(label, "id")

  /** edge type → (fromLabel, toLabel), the `'a|b'` disjunction strings
    * kept verbatim (reference :33-46) — the plugin resolves them.
    */
  val edgeTypePair: Map[String, (String, String)] = Map(
    "has_license" -> ("github_repo", "license"),
    "has_language" -> ("github_repo", "language"),
    "has_repo" -> ("github_org", "github_repo"),
    "has_issue_change_request" ->
      ("github_repo", "github_issue|github_change_request"),
    "has_issue_label" ->
      ("github_issue|github_change_request", "issue_label"),
    "open" -> ("github_actor", "github_issue|github_change_request"),
    "comment" -> ("github_actor", "github_issue|github_change_request"),
    "close" -> ("github_actor", "github_issue|github_change_request"),
    "has_assignee" ->
      ("github_issue|github_change_request", "github_actor"),
    "has_requested_reviewer" -> ("github_change_request", "github_actor"),
    "review" -> ("github_actor", "github_change_request"),
    "review_comment" -> ("github_actor", "github_change_request"))

  /** labels whose node data carries `__updated_at` (reference :358). */
  private val timestamped = Set("github_actor", "github_repo", "github_org",
    "github_issue", "github_change_request")

  private val tsFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(java.time.ZoneOffset.UTC)

  /** One `update_nodes` plugin call per ≤`batchSize` chunk per label.
    * Returns nodes emitted.
    */
  def exportNodes(nodes: DataFrame, exec: PluginExecutor,
      batchSize: Int = DefaultBatch): Long = {
    import scala.jdk.CollectionConverters._
    val types = nodes.select("node_type").distinct()
      .collect().map(_.getString(0)).sorted
    val propCols = nodes.columns
      .filterNot(Set("node_type", "node_id", "bucket", "updated_at"))
    var n = 0L
    types.foreach { t =>
      val primary = primaryOf(t)
      val slice = nodes.filter(col("node_type") === t)
      slice.toLocalIterator().asScala.grouped(batchSize).foreach { rows =>
        val batch = rows.map { r =>
          val data = propCols.map(c => c -> r.getAs[Any](c)).toMap
          val stamped =
            if (timestamped(t) && nodes.columns.contains("updated_at"))
              // updated_at is max(event_ts) and can be null when every
              // witness event had an unparseable created_at — skip the
              // stamp rather than NPE mid-export
              Option(r.getAs[java.sql.Timestamp]("updated_at"))
                .map(ts => data + ("__updated_at" -> tsFmt.format(ts.toInstant)))
                .getOrElse(data)
            else data
          Map[String, Any](primary -> r.getAs[String]("node_id"),
            "data" -> stamped)
        }.toSeq
        exec("cpp", "update_nodes",
          Map("type" -> t, "primary" -> primary, "nodes" -> batch))
        n += batch.size
      }
    }
    n
  }

  /** One `update_edges` plugin call per ≤`batchSize` chunk per edge
    * type; unidentified edges travel with `id = -1`. Returns edges
    * emitted.
    */
  def exportEdges(edges: DataFrame, exec: PluginExecutor,
      batchSize: Int = DefaultBatch): Long = {
    import scala.jdk.CollectionConverters._
    val types = edges.select("edge_type").distinct()
      .collect().map(_.getString(0)).sorted
    val dataCols = edges.columns
      .filterNot(Set("edge_type", "src", "dst", "edge_id", "bucket"))
    var n = 0L
    types.foreach { t =>
      val (fromLabel, toLabel) = edgeTypePair.getOrElse(t, ("", ""))
      val slice = edges.filter(col("edge_type") === t)
      slice.toLocalIterator().asScala.grouped(batchSize).foreach { rows =>
        val batch = rows.map { r =>
          val id = r.getAs[Long]("edge_id")
          Map[String, Any](
            "from" -> r.getAs[String]("src"),
            "to" -> r.getAs[String]("dst"),
            "data" -> dataCols.map(c => c -> r.getAs[Any](c)).toMap,
            "id" -> (if (id > 0) id else -1L))
        }.toSeq
        exec("cpp", "update_edges", Map(
          "fromKey" -> primaryOf(fromLabel), "fromLabel" -> fromLabel,
          "toKey" -> primaryOf(toLabel), "toLabel" -> toLabel,
          "label" -> t, "edges" -> batch))
        n += batch.size
      }
    }
    n
  }
}
