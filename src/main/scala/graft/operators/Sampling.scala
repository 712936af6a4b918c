package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling and split assignment for
  * training-data pipelines.
  *
  * Everything here keys off the first 16 bits of `md5(cast(id AS
  * string))`, compared as a 4-char lowercase-hex STRING against
  * precomputed hex thresholds. That choice is deliberate:
  *
  *   - md5 of a decimal-rendered id is bit-identical in every engine
  *     (Spark, DuckDB, ClickHouse, Python), so split membership is
  *     reproducible across the whole toolchain — the property a
  *     train/val/test split must have. `rand()` or Spark's `sample`
  *     give neither cross-run nor cross-engine stability.
  *   - hex-string comparison needs no hex→int conversion, which not
  *     every SQL dialect can express; lexicographic order on
  *     fixed-width lowercase hex IS numeric order.
  *   - the expressions are map-only: no shuffle, no state, trivially
  *     parallel at any scale, and usable as partition filters.
  *
  * 16 bits ⇒ fraction granularity 1/65536 (~0.0015%), plenty for
  * split ratios.
  */
object Sampling {

  /** 4-hex-char bucket of an id column: uniform over [0, 65536). */
  def hashBucket(id: Column): Column =
    substring(md5(id.cast("string")), 1, 4)

  private def hex4(fraction: Double): String = {
    // a negative input would %04x-format to a 16-char string and
    // silently corrupt the lexicographic compare — never let it through
    require(fraction >= 0, s"fraction must be >= 0, got $fraction")
    f"${math.floor(fraction * 65536).toLong.min(65535L)}%04x"
  }

  /** Split label ("train" / "val" / …) from cumulative weight ranges.
    * Weights need not sum to 1 — they are normalized. The LAST split
    * is the catch-all branch, so every row gets a label and rounding
    * slack lands in the final split.
    */
  def splitLabel(id: Column, splits: Seq[(String, Double)]): Column = {
    require(splits.size >= 2, "need at least two splits")
    splits.foreach { case (name, w) =>
      require(w >= 0, s"split '$name' has negative weight $w") }
    val total = splits.map(_._2).sum
    require(total > 0, "weights must be positive")
    val b = hashBucket(id)
    val cums = splits.map(_._2).scanLeft(0.0)(_ + _).tail.map(_ / total)
    splits.init.zip(cums).foldRight(lit(splits.last._1)) {
      case (((name, _), cum), el) => when(b < lit(hex4(cum)), lit(name)).otherwise(el)
    }
  }

  /** Keep a deterministic `fraction` of rows. Map-only filter;
    * fraction ≥ 1 keeps everything. */
  def sampleBy(df: DataFrame, id: Column, fraction: Double): DataFrame =
    if (fraction >= 1.0) df
    else df.filter(hashBucket(id) < lit(hex4(fraction)))

  /** Per-stratum sampling rates (source-mixing): keep each row with
    * its stratum's fraction, rows of unlisted strata with
    * `defaultFraction`. This is how corpus mixing ratios (e.g. "30%
    * web, 100% books") are applied deterministically: still map-only
    * — the stratum lookup is a literal CASE, not a join.
    */
  def stratifiedSample(df: DataFrame, stratum: Column, id: Column,
      fractions: Map[String, Double], defaultFraction: Double): DataFrame = {
    val thr = fractions.toSeq.sortBy(_._1).foldRight(lit(hex4(defaultFraction))) {
      case ((k, f), el) => when(stratum === lit(k), lit(hex4(f))).otherwise(el)
    }
    val keepAll = fractions.toSeq.sortBy(_._1).foldRight(lit(defaultFraction >= 1.0)) {
      case ((k, f), el) => when(stratum === lit(k), lit(f >= 1.0)).otherwise(el)
    }
    df.filter(keepAll || hashBucket(id) < thr)
  }
}
