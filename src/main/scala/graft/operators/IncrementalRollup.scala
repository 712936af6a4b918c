package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incrementally-maintained pre-aggregate — ClickHouse's
  * AggregatingMergeTree / `-State`+`-Merge` combinator pattern as an
  * explicit batch operator: keep a small table of MERGEABLE partial
  * states per dimension group, fold each new batch in by merging
  * states (never rescanning history), and finalize to user-facing
  * aggregates at query time.
  *
  * Partial state per group: row count, decimal sum, min, max, and a
  * Datasketches HLL sketch for distinct counts — each one closed
  * under merge (count/sum add, min/max fold, sketches union), so
  * `merge(partials(A), partials(B)) == partials(A ∪ B)` exactly
  * (decimal sums are order-insensitive; sketch state is
  * insertion-order-insensitive). That equality is the operator's
  * contract, pinned by spec and by the r30 gate query whose oracle is
  * a flat GROUP BY over the union.
  *
  * 100-TB shape: the history never re-aggregates — each increment
  * scans only the new batch and hash-merges against a table whose
  * size is the GROUP count, not the row count. Partition the state
  * table by a dims prefix (e.g. month) and an increment rewrites only
  * the partitions its batch touches.
  */
object IncrementalRollup {

  /** Partial states for one batch: one row per `dims` group. */
  def partials(df: DataFrame, dims: Seq[String], valueCol: String,
      distinctCol: String, lgK: Int = 12): DataFrame =
    df.groupBy(dims.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(28,6)")).as("sum_v"),
        min(col(valueCol)).as("min_v"),
        max(col(valueCol)).as("max_v"),
        hll_sketch_agg(col(distinctCol), lit(lgK)).as("uniq_sketch"))

  /** Merge any number of partial-state tables (same dims/schema) into
    * one — the `-Merge` side. Also the increment step:
    * `merge(state, partials(batch))`.
    */
  def merge(states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "merge needs at least one state table")
    val dims = states.head.columns.filterNot(
      Set("n", "sum_v", "min_v", "max_v", "uniq_sketch"))
    states.reduce(_ unionByName _)
      .groupBy(dims.map(col): _*)
      .agg(
        sum(col("n")).as("n"),
        sum(col("sum_v")).as("sum_v"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"),
        hll_union_agg(col("uniq_sketch")).as("uniq_sketch"))
  }

  /** User-facing aggregates from a state table. */
  def finalizeAggs(state: DataFrame): DataFrame = {
    val dims = state.columns.filterNot(
      Set("n", "sum_v", "min_v", "max_v", "uniq_sketch"))
    state.select(
      dims.map(col) ++ Seq(
        col("n"),
        col("sum_v").cast("double").as("sum_v"),
        col("min_v"), col("max_v"),
        // divide as doubles AFTER the exact decimal sum: one rounding
        // at the end, bit-reproducible across engines
        (col("sum_v").cast("double") / col("n")).as("avg_v"),
        hll_sketch_estimate(col("uniq_sketch")).as("uniq")): _*)
  }
}
