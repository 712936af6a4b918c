package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar (int8) quantization for embedding columns — the storage/IO
  * lever for vector search at 100 TB: `array<float>` → `array<byte>` +
  * one float scale per row is 4× smaller on disk and in shuffle, and
  * the parquet scan feeding an ANN query reads a quarter of the bytes.
  *
  * Symmetric per-row quantization: `q[i] = round(v[i] · 127 / maxAbs)`,
  * reconstructed as `q[i] · scale` with `scale = maxAbs / 127`. Dot
  * products run in integer arithmetic and rescale once per pair —
  * with unit-normalized inputs the quantized dot ranks within ~1% of
  * the exact cosine (recall pinned by spec, not asserted here).
  *
  * All HOF expressions — codegen'd, no UDFs; maxAbs is hoisted into
  * its own projection (lambda-referenced expressions re-evaluate per
  * element otherwise).
  */
object Quantize {

  /** Adds `<out>` (array<tinyint>) and `<out>_scale` (double) columns.
    * Zero vectors quantize to zeros with scale 0.
    */
  def withInt8(df: DataFrame, vec: Column, out: String): DataFrame =
    df.withColumn("__maxabs",
        aggregate(vec, lit(0.0), (a, x) => greatest(a, abs(x.cast("double")))))
      .withColumn(out,
        when(col("__maxabs") === 0,
          transform(vec, _ => lit(0).cast("tinyint")))
        .otherwise(transform(vec,
          x => round(x.cast("double") * lit(127.0) / col("__maxabs"))
            .cast("tinyint"))))
      .withColumn(s"${out}_scale", col("__maxabs") / lit(127.0))
      .drop("__maxabs")

  /** Integer dot of two int8 vectors, rescaled to the original space. */
  def dotInt8(a: Column, b: Column, scaleA: Column, scaleB: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("int") * y.cast("int")),
      lit(0), (acc, x) => acc + x).cast("double") * scaleA * scaleB

  /** Brute-force top-k over a PRE-QUANTIZED corpus: same broadcast
    * query-side / single corpus scan / bounded top-k shape as
    * [[Similarity.bruteForceTopK]], but the corpus scan reads int8
    * vectors and the per-pair work is an integer dot. Vectors are
    * unit-normalized BEFORE quantization so the quantized dot
    * approximates cosine directly.
    */
  def bruteForceTopKInt8(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    def prep(df: DataFrame, idAs: String, qAs: String): DataFrame =
      withInt8(Similarity.withUnitVector(df, col(vecCol), "__uv"),
        col("__uv"), qAs)
        .select(col(idCol).as(idAs), col(qAs), col(s"${qAs}_scale"))
    val q = broadcast(prep(queries, "query_id", "q8"))
    val scored = prep(corpus, "neighbor_id", "n8")
      .crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos",
        dotInt8(col("q8"), col("n8"), col("q8_scale"), col("n8_scale")))
    Similarity.boundedTopKPublic(scored, k)
  }
}
