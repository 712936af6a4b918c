package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation primitives for the cases AQE's runtime skew-join
  * split does NOT cover: AQE only splits skewed partitions of
  * sort-merge joins after a shuffle materializes, and does nothing for
  * skewed aggregation keys inside a single reducer. These rewrite the
  * plan so no single task ever owns a hot key.
  *
  *  - [[saltedJoin]]: the hot (large) side scatters each key across
  *    `salt` sub-keys; the other side replicates each row `salt` times.
  *    Shuffle volume: large side unchanged, small side × salt — the
  *    right trade when the small side is orders of magnitude smaller
  *    but too big to broadcast.
  *  - [[saltedAgg]]: two-phase aggregation — partial aggregate on
  *    (key, salt), then final aggregate on key. The hot key's partials
  *    spread over `salt` tasks; the final pass combines `salt` rows per
  *    key. Works for any algebraic aggregate (sum/count/min/max here).
  *
  * Salts are `pmod(xxhash64(monotonically_increasing_id()), salt)` —
  * deterministic per run, uniform, and independent of the key value
  * (hashing the KEY would send the whole hot key to one salt again).
  */
object Salting {

  /** Equi-join `left ⋈ right` on `keys`, with `left` treated as the
    * skewed side. Inner and left-outer semantics are preserved
    * (each left row joins the one replica of the matching right row
    * that carries its salt).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      salt: Int, joinType: String = "inner"): DataFrame = {
    require(salt > 0, "salt must be positive")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"unsupported join type for salting: $joinType")
    val salted = left.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salt.toLong)).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Two-phase skew-safe aggregation: `df.groupBy(keys).agg(...)` where
    * every aggregate is one of sum/count/min/max (algebraic — partials
    * combine). `aggs` maps output column name -> (input column,
    * "sum" | "count" | "min" | "max").
    */
  def saltedAgg(df: DataFrame, keys: Seq[String],
      aggs: Map[String, (Column, String)], salt: Int): DataFrame = {
    require(salt > 0, "salt must be positive")
    val salted = df.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salt.toLong)).cast("int"))
    val partial = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(
        aggs.head._2 match { case (c, f) => partialExpr(f, c).as(aggs.head._1) },
        aggs.tail.map { case (name, (c, f)) => partialExpr(f, c).as(name) }.toSeq: _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(
        finalExpr(aggs.head._2._2, col(aggs.head._1)).as(aggs.head._1),
        aggs.tail.map { case (name, (_, f)) =>
          finalExpr(f, col(name)).as(name) }.toSeq: _*)
  }

  private def partialExpr(fn: String, c: Column): Column = fn match {
    case "sum" => sum(c)
    case "count" => count(c)
    case "min" => min(c)
    case "max" => max(c)
    case other => throw new IllegalArgumentException(
      s"non-algebraic aggregate not supported by saltedAgg: $other")
  }

  /** Combine partials: count partials re-combine by SUM. */
  private def finalExpr(fn: String, c: Column): Column = fn match {
    case "sum" | "count" => sum(c)
    case "min" => min(c)
    case "max" => max(c)
    case other => throw new IllegalArgumentException(
      s"non-algebraic aggregate not supported by saltedAgg: $other")
  }
}
