package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join without a nested loop.
  *
  * Spark plans a bare `start <= p AND p < end` theta condition as
  * BroadcastNestedLoopJoin — O(points × intervals). This operator
  * buckets the domain into fixed-width cells: each interval explodes
  * to the cells it covers, each point maps to its one cell, and the
  * join becomes an EQUI-join on cell id with an exact containment
  * post-filter. Cost: |intervals| × avg-cells-per-interval extra rows
  * on the build side — pick `bucketWidth` near the typical interval
  * length so that factor stays small (1–3).
  *
  * Works on any numeric domain; join timestamps by passing their
  * epoch micros. Half-open semantics: start <= p < end.
  */
object RangeJoin {

  /** @param points    frame with numeric `ptCol`
    * @param intervals frame with numeric `startCol` / `endCol`
    *                  (half-open [start, end))
    * @param bucketWidth cell width in domain units
    * @return matched (point row × interval row) pairs
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      ptCol: String, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val cells = intervals
      .filter(col(startCol) < col(endCol)) // empty intervals match nothing

      .withColumn("__cell", explode(sequence(
        floor(col(startCol) / bucketWidth).cast("long"),
        // end is exclusive: the cell of (end - 1) is the last covered
        floor((col(endCol) - 1) / bucketWidth).cast("long"))))
    val pts = points
      .withColumn("__cell", floor(col(ptCol) / bucketWidth).cast("long"))
    pts.join(cells, "__cell")
      .filter(col(startCol) <= col(ptCol) && col(ptCol) < col(endCol))
      .drop("__cell")
  }
}
