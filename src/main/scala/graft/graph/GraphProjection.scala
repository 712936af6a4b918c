package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Property-graph projection of an event stream (SURVEY A26–A28).
  *
  * The reference folds events into node/edge maps in driver memory with
  * last-write-wins merge keyed by node id / (from,to,id) (reference:
  * app/service/log_tugraph_importer.ts:95-123). Distributed equivalent:
  * an argMax consolidation — `max_by(properties, created_at)` per key —
  * which shuffles one consolidated row per entity instead of holding the
  * graph on one machine; this is the piece that makes the projection
  * work at 100 TB.
  */
object GraphProjection {

  /** Last-write-wins consolidation: per `keys`, keep the latest value of
    * every property column (ordered by `ord`) plus bookkeeping columns
    * `updated_at` and `degree` (event count folded into the entity).
    */
  def consolidate(df: DataFrame, keys: Seq[String], ord: Column,
      props: Seq[String]): DataFrame = {
    val aggs = props.map(p => max_by(col(p), ord).as(p)) ++
      Seq(max(ord).as("updated_at"), count(lit(1)).as("degree"))
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Nodes table from an exploded element frame
    * (node_type, node_id, props..., event_ts).
    */
  def consolidateNodes(elements: DataFrame, props: Seq[String]): DataFrame =
    consolidate(elements, Seq("node_type", "node_id"), col("event_ts"), props)

  /** Edges table from (edge_type, src, dst, edge_id, props..., event_ts). */
  def consolidateEdges(elements: DataFrame, props: Seq[String]): DataFrame =
    consolidate(elements, Seq("edge_type", "src", "dst", "edge_id"),
      col("event_ts"), props)
}
