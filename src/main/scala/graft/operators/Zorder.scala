package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for the write path — multi-dimensional
  * data skipping. A table sorted by ONE column has tight parquet
  * min/max stats on that column and full-range stats on every other;
  * interleaving the bits of two (or three) key columns into one
  * Morton key and range-partitioning + sorting the write by it gives
  * every file a bounding BOX that is tight in ALL interleaved
  * dimensions (~√N span each for 2-D instead of N on the second
  * dim) — so a selective filter on EITHER column prunes files/row
  * groups. This is ClickHouse-ORDER-BY-tuple's practical analogue for
  * multi-predicate workloads, and the layout step a 100-TB events
  * table wants before handing parquet to interactive queries.
  *
  * The key is a pure codegen'd column expression (shift/and/or
  * chains — no UDF); clamping maps each dimension into [0, 2^bits)
  * so negative or oversized values degrade to the boundary cell
  * rather than corrupting the interleave.
  */
object Zorder {

  /** Morton key of two non-negative int dimensions, `bits` bits each
    * (key fits in 2·bits ≤ 62). Values are clamped to [0, 2^bits-1].
    */
  def zkey2(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "zkey2: bits must be in [1, 31]")
    def clamp(c: Column): Column =
      least(greatest(c.cast("long"), lit(0L)), lit((1L << bits) - 1))
    val (ca, cb) = (clamp(a), clamp(b))
    (0 until bits).map { i =>
      shiftleft(shiftright(ca, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(cb, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Write `df` z-ordered on (dim1, dim2): range-partition by the
    * Morton key (balanced files via range sampling), sort within
    * partitions, drop the key column from the stored schema.
    */
  def writeZOrdered(df: DataFrame, path: String, dim1: Column,
      dim2: Column, bits: Int = 16, numFiles: Int = 0): Unit = {
    val keyed = df.withColumn("__zkey", zkey2(dim1, dim2, bits))
    val parted =
      if (numFiles > 0) keyed.repartitionByRange(numFiles, col("__zkey"))
      else keyed.repartitionByRange(col("__zkey"))
    parted
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
      .write.mode("overwrite").parquet(path)
  }
}
