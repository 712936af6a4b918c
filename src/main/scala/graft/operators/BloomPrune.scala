package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter semi-join pruning — the big-join prefilter Spark's
  * optimizer applies internally (runtime row-level filtering) surfaced
  * as an explicit operator, for when the planner can't see the
  * opportunity (pre-computed filter keys, cross-job reuse, filters
  * persisted next to a table).
  *
  * Shape at 100 TB: the exact semi join `big ⋉ small` shuffles every
  * big-side row that MIGHT match. Building a bloom filter over the
  * small side's keys (one aggregation producing a few-MB binary — the
  * same artifact a broadcast join ships) and testing it IN THE SCAN
  * STAGE drops the non-matching bulk before the shuffle; the exact
  * semi join afterwards removes the false positives, so the result is
  * EXACT — the bloom only prunes. With a 1% FP rate and 0.1%
  * selectivity, the shuffle shrinks ~99%.
  *
  * Keys are hashed with XxHash64 on both sides — the same pairing
  * Spark's own InjectRuntimeFilter uses; both expressions are
  * codegen'd, so the probe stays inside whole-stage codegen.
  */
object BloomPrune {

  private def xxhash(c: Column): Column =
    ColumnBridge.column(new XxHash64(Seq(ColumnBridge.expression(c))))

  /** Serialized bloom filter over `key` of `df` (distinct-insensitive:
    * duplicate inserts are no-ops). `expectedItems` sizes the filter —
    * overestimate freely; bits grow linearly.
    */
  def buildBloom(df: DataFrame, key: String,
      expectedItems: Long = 1000000L): Array[Byte] =
    df.select(ColumnBridge.column(
        new BloomFilterAggregate(
          new XxHash64(Seq(ColumnBridge.expression(col(key)))),
          Literal(expectedItems)).toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]]("bf")

  /** Probe column: true when `key` might be in `bloom` (no false
    * negatives).
    */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      ColumnBridge.expression(xxhash(key))))

  /** Exact semi join with a bloom prefilter: `big ⋉ small` on
    * `bigKey = smallKey`, where big-side rows failing the bloom probe
    * are dropped in the scan stage and never reach the shuffle. The
    * closing left-semi join removes bloom false positives — results
    * are identical to the plain semi join.
    */
  def semiJoin(big: DataFrame, bigKey: String,
      small: DataFrame, smallKey: String,
      expectedItems: Long = 1000000L): DataFrame = {
    val bloom = buildBloom(small, smallKey, expectedItems)
    // no distinct() on the small side: left-semi already emits each
    // big row at most once, and the extra aggregation is a whole
    // extra exchange at scale
    big.filter(mightContain(bloom, col(bigKey)))
      .join(small.select(col(smallKey).as(bigKey)), Seq(bigKey), "left_semi")
  }
}
