package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column↔Expression converters
  * (Spark 4 moved Column onto ColumnNode; the classic converters live in
  * org.apache.spark.sql.classic.ExpressionUtils). Lives under
  * org.apache.spark.sql so the package-private access compiles.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Eager ColumnNode→Expression conversion. `ExpressionUtils.expression`
    * wraps the node in a LAZY `ColumnNodeExpression` that only classic
    * Dataset plan construction unwraps — an expression built that way
    * and returned from a FunctionRegistry builder reaches execution
    * still wrapped (Unevaluable) and fails. The converter produces the
    * real catalyst tree (unresolved functions inside it resolve in the
    * analyzer's fixed point like any builder output).
    */
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** DataFrame over an InternalRow RDD — `internalCreateDataFrame` is
    * `private[sql]`. Iterative operators use this to re-enter the
    * DataFrame world after materializing a round's state as a
    * persisted RDD[InternalRow] (the exact representation
    * `localCheckpoint` caches) WITHOUT the external-Row round-trip of
    * `spark.createDataFrame(rdd, schema)`.
    */
  def internalCreateDataFrame(spark: org.apache.spark.sql.SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
