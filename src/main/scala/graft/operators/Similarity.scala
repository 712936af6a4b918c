package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector similarity: brute-force and blocked approximate nearest
  * neighbors over an `array<float>` embedding column.
  *
  * All arithmetic is done in double precision with a strictly
  * sequential left fold (`aggregate` over `zip_with`), which makes the
  * result bit-deterministic and reproducible across engines — required
  * for oracle comparison and for stable top-k cuts.
  *
  * Scale notes:
  *  - `bruteForceTopK` broadcasts the (small) query set and streams the
  *    corpus once — no shuffle on the corpus except the final per-query
  *    top-k, which is a tiny aggregation keyed by query id. At 100 TB
  *    corpus / O(100) queries this is a single map-scan.
  *  - `ivfTopK` is the scale path: a coarse partition column (cluster
  *    id / LSH bucket) prunes the candidate set before scoring, turning
  *    O(N·Q) into O(N/buckets·Q) — same shape as an IVF index probe.
  *  - Everything stays inside codegen'd higher-order functions; no UDF.
  */
object Similarity {

  /** dot(a, b) as double, sequential fold (deterministic). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k neighbors for each row of `queries` against `corpus`.
    * Both frames need (`idCol`, `vecCol`). Queries are broadcast.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec")))
    val scored = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("n_vec"))
      .crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("q_vec"), col("n_vec")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id")
  }

  /** IVF-style blocked ANN: only score candidates sharing `blockCol`
    * with the query (single-probe). Recall < 1 by construction; at scale
    * the block column comes from k-means / LSH and cuts the scan by the
    * bucket count.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int, blockCol: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(
      col(idCol).as("query_id"), col(vecCol).as("q_vec"), col(blockCol).as("q_block")))
    val scored = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("n_vec"), col(blockCol))
      .join(q, col(blockCol) === col("q_block"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("q_vec"), col("n_vec")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id")
  }

  /** All pairs within the same block whose cosine ≥ threshold — the
    * embedding-based near-duplicate detector. Blocking (IVF cluster /
    * LSH bucket) keeps the pair join from being O(N²) at scale.
    */
  def nearDupPairs(df: DataFrame, threshold: Double, blockCol: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = df.select(col(blockCol).as("b"), col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val b = df.select(col(blockCol).as("b"), col(idCol).as("id_b"), col(vecCol).as("v_b"))
    a.join(b, Seq("b"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", cosine(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"))
  }

  /** Random-hyperplane LSH signature (nBits ≤ 64) as a long. Planes are
    * derived from a hash of (bit index, dimension index) — deterministic,
    * no stored model; the same expression computes the bucket for
    * queries and corpus.
    */
  def rhpSignature(vec: Column, nBits: Int, dim: Int, seed: Int = 42): Column = {
    // plane(b, d) = centered deterministic pseudo-random weight in [-1, 1)
    def weight(b: Int, d: Int): Column =
      (pmod(xxhash64(lit(seed), lit(b), lit(d)), lit(2000000L)).cast("double")
        / lit(1000000.0)) - lit(1.0)
    val bits = (0 until nBits).map { bIdx =>
      val proj = (0 until dim).map(d =>
        element_at(vec, d + 1).cast("double") * weight(bIdx, d))
        .reduce(_ + _)
      when(proj >= 0, shiftleft(lit(1L), bIdx)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }
}
