package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Left as-of join: for every left row, the most recent right row with
  * `rightTime <= leftTime` on the same key (ties included) — the
  * temporal-lookup operator (latest price at trade time, latest
  * dimension version at event time) that Spark has no built-in for.
  *
  * NOT a range join: a `leftTime >= rightTime` theta condition plans
  * as BroadcastNestedLoopJoin (O(L×R) per key). Instead both sides are
  * UNIONED and a single (key)-partitioned, time-ordered window carries
  * the last-seen right payload forward onto each left row — one
  * shuffle, per-key state, linear in rows. Same-instant rows resolve
  * right-before-left (a right row AT the left timestamp matches),
  * matching DuckDB/pandas ASOF `>=` semantics.
  */
object AsOfJoin {

  /** @param left      left (probe) frame
    * @param right     right (reference) frame
    * @param key       equi-key column present on both sides
    * @param leftTime  event-time column on `left`
    * @param rightTime event-time column on `right`
    * @param payload   right columns to carry (renamed as given)
    * @return left rows + payload columns (null when no right row is
    *         at-or-before the left time)
    */
  def asOf(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      payload: Map[String, String]): DataFrame = {
    val leftCols = left.columns
    require(leftCols.contains(key) && right.columns.contains(key),
      s"key '$key' must exist on both sides")
    val payloadOut = payload.values.toSeq
    // union schema: key, __t, __side, left columns (null on right
    // rows), payload columns (null on left rows)
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .select(Seq(col(key), col("__t"), col("__side")) ++
        leftCols.filterNot(_ == key).map(col) ++
        payloadOut.map(p => lit(null).as(p)): _*)
    val r = right
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .select(Seq(col(key), col("__t"), col("__side")) ++
        leftCols.filterNot(_ == key).map(c => lit(null).as(c)) ++
        payload.toSeq.map { case (from, to) => col(from).as(to) }: _*)
    // right rows (__side 0) sort before left rows at the same instant.
    // The payload travels as ONE struct so the match is atomic per
    // right ROW — carrying columns independently with ignoreNulls
    // would stitch values from different right rows whenever a
    // payload value is legitimately null.
    val w = Window.partitionBy(key).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__p",
        when(col("__side") === 0, struct(payloadOut.map(col): _*)))
      .withColumn("__pl", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(Seq(col(key)) ++ leftCols.filterNot(_ == key).map(col) ++
        payloadOut.map(p => col(s"__pl.$p").as(p)): _*)
  }
}
