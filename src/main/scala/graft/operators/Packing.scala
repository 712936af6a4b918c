package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget shard assignment: the step between a cleaned corpus
  * and a training run, where documents are packed into fixed-budget
  * shards (sequence-packing buffers, tar shards, …).
  *
  * Greedy in-order packing: within each `partitionCol` group, walk
  * docs in `orderCol` order and open a new shard every time the
  * running token total passes a multiple of `budget`. A document is
  * assigned to the shard its FIRST token lands in (so a shard may
  * overflow by up to one document — the standard greedy contract;
  * docs longer than the budget get a shard of their own).
  *
  * Scale shape: ONE window over (partitionCol, orderCol) — the
  * running sum and the shard id come from the same sort, and the
  * partition column (language, source, …) bounds every window group,
  * so the work is per-group parallel, never a global single-reducer
  * sort. At 100 TB you pack per (source, date-bucket); the group key
  * is the parallelism.
  */
object Packing {

  def packByTokenBudget(df: DataFrame, partitionCols: Seq[String],
      orderCols: Seq[String], tokensCol: String, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(partitionCols.nonEmpty, "need at least one partition column")
    require(orderCols.nonEmpty, "need at least one order column")
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum_tokens", sum(col(tokensCol)).over(w))
      .withColumn("shard_id",
        floor((col("cum_tokens") - col(tokensCol)).cast("double") / budget)
          .cast("long"))
  }

  def packByTokenBudget(df: DataFrame, partitionCol: String,
      orderCol: String, tokensCol: String, budget: Long): DataFrame =
    packByTokenBudget(df, Seq(partitionCol), Seq(orderCol), tokensCol, budget)
}
