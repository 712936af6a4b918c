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

  /** dot(a, b) as double — sequential left-to-right accumulation
    * (deterministic, same order as an `aggregate(zip_with(…))` fold
    * and as DuckDB's `list_inner_product`), via the codegen'd
    * [[graft.functions.DotProduct]] primitive loop. The HOF spelling
    * this replaced allocated a zipped array per PAIR — millions of
    * 64-slot allocations per task in the pair joins — and measured as
    * the dominant cost of d05/s11, not the multiplies.
    */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.functions.DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Adds a unit-normalized array<double> copy of `vec` as `out`.
    * Normalizing ONCE per row turns every pairwise cosine into a
    * single dot product — the naive `cosine(a, b)` folds each vector
    * three times per PAIR, which dominated the pair-join benchmarks
    * (d05 was 56% of the whole sf0.1 suite before this). The norm
    * lands in its own projection first: referenced from inside a
    * lambda it would otherwise re-evaluate per element.
    */
  def withUnitVector(df: DataFrame, vec: Column, out: String): DataFrame =
    df.withColumn("__nrm", norm(vec))
      .withColumn(out,
        when(col("__nrm") === 0, transform(vec, x => x.cast("double")))
          .otherwise(transform(vec, x => x.cast("double") / col("__nrm"))))
      .drop("__nrm")

  /** Two-phase bounded top-k: phase 1 keeps at most k candidates per
    * (query, input partition) — map-side, no data movement beyond k
    * rows per partition; phase 2 merges the ≤ partitions×k survivors
    * per query. Replaces the row_number window that funneled every
    * scored row of a 100-TB corpus into one partition per query
    * (Q reducers × N rows — a straggler design). Ordering ties follow
    * (cos DESC, neighbor_id ASC) exactly, as `array_sort` on
    * struct(-cos, neighbor_id) is lexicographic.
    */
  /** [[boundedTopK]] for sibling operators ([[Quantize]]). */
  private[operators] def boundedTopKPublic(scored: DataFrame, k: Int): DataFrame =
    boundedTopK(scored, k)

  private def boundedTopK(scored: DataFrame, k: Int): DataFrame = {
    val key = struct(negate(col("cos")).as("neg_cos"), col("neighbor_id").as("neighbor_id"))
    val local = scored
      .withColumn("pid", spark_partition_id())
      .groupBy("query_id", "pid")
      .agg(slice(array_sort(collect_list(key)), 1, k).as("cands"))
    local
      .select(col("query_id"), explode(col("cands")).as("c"))
      .groupBy("query_id")
      .agg(slice(array_sort(collect_list(col("c"))), 1, k).as("cands"))
      .select(col("query_id"), posexplode(col("cands")).as(Seq("pos", "c")))
      .select(col("query_id"), (col("pos") + 1).as("rank"),
        col("c.neighbor_id").as("neighbor_id"))
  }

  /** Exact top-k neighbors for each row of `queries` against `corpus`.
    * Both frames need (`idCol`, `vecCol`). Queries are broadcast; the
    * corpus is scanned once and never shuffled beyond k rows per
    * (query, partition).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(withUnitVector(queries, col(vecCol), "q_vec")
      .select(col(idCol).as("query_id"), col("q_vec")))
    val scored = withUnitVector(corpus, col(vecCol), "n_vec")
      .select(col(idCol).as("neighbor_id"), col("n_vec"))
      .crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", dot(col("q_vec"), col("n_vec")))
    boundedTopK(scored, k)
  }

  /** IVF-style blocked ANN: only score candidates sharing `blockCol`
    * with the query (single-probe). Recall < 1 by construction; at scale
    * the block column comes from k-means / LSH and cuts the scan by the
    * bucket count.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int, blockCol: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(withUnitVector(queries, col(vecCol), "q_vec")
      .select(col(idCol).as("query_id"), col("q_vec"), col(blockCol).as("q_block")))
    val scored = withUnitVector(corpus, col(vecCol), "n_vec")
      .select(col(idCol).as("neighbor_id"), col("n_vec"), col(blockCol))
      .join(q, col(blockCol) === col("q_block"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", dot(col("q_vec"), col("n_vec")))
    boundedTopK(scored, k)
  }

  /** All pairs within the same block whose cosine ≥ threshold — the
    * embedding-based near-duplicate detector. Blocking (IVF cluster /
    * LSH bucket) keeps the pair join from being O(N²) at scale.
    */
  def nearDupPairs(df: DataFrame, threshold: Double, blockCol: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val unit = withUnitVector(df, col(vecCol), "uv")
      .select(col(blockCol).as("b"), col(idCol), col("uv"))
    val a = unit.select(col("b"), col(idCol).as("id_a"), col("uv").as("v_a"))
    val b = unit.select(col("b"), col(idCol).as("id_b"), col("uv").as("v_b"))
    a.join(b, Seq("b"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", dot(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"))
  }

  /** k-NN GRAPH construction: every vector's top-k neighbors within
    * its IVF block — the all-to-all sibling of [[ivfTopK]] and the
    * substrate of SemDeDup-style clustering, NN-descent seeding, and
    * graph-based ANN indexes. Unlike ivfTopK (which broadcasts a
    * small query set), BOTH sides here are corpus-sized, so the shape
    * is a block-keyed self-join — no broadcast anywhere, candidate
    * count Σ|block|², and [[boundedTopK]] caps what leaves each
    * partition at k rows per vector. At 100 TB the block is the
    * trained coarse quantizer with nlist ∝ N, which holds |block|
    * (and so per-vector candidate cost) flat — the same scaling
    * argument SCALE.md measures for the s02 probe path.
    */
  def knnGraph(df: DataFrame, k: Int, blockCol: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val unit = withUnitVector(df, col(vecCol), "uv")
      .select(col(blockCol).as("b"), col(idCol), col("uv"))
    val q = unit.select(col("b"), col(idCol).as("query_id"),
      col("uv").as("q_vec"))
    val c = unit.select(col("b"), col(idCol).as("neighbor_id"),
      col("uv").as("n_vec"))
    val scored = q.join(c, Seq("b"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", dot(col("q_vec"), col("n_vec")))
    boundedTopK(scored, k)
  }

  /** MMR diversified re-rank: exact top-`kShortlist` per query (the
    * bounded-top-k path, with the candidate's UNIT VECTOR riding in
    * the top-k buffer — ≤ kShortlist vectors per partition ever move),
    * then [[graft.functions.MmrSelect]] greedily picks `kSelect` of
    * them trading relevance against redundancy per row. The corpus
    * never participates in the O(shortlist²) diversity work — at
    * 100 TB the expensive leg stays the measured ANN scan and MMR
    * adds a per-query constant. Query cosines are quantized
    * (floor(cos·10⁶+½)) BEFORE ranking so shortlist membership, order,
    * and the greedy itself all replay integer-exactly in the oracle.
    */
  def mmrRerank(corpus: DataFrame, queries: DataFrame, kShortlist: Int,
      kSelect: Int, lambda: Double, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    val q = broadcast(withUnitVector(queries, col(vecCol), "q_vec")
      .select(col(idCol).as("query_id"), col("q_vec")))
    val scored = withUnitVector(corpus, col(vecCol), "n_vec")
      .select(col(idCol).as("neighbor_id"), col("n_vec"))
      .crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cq",
        floor(dot(col("q_vec"), col("n_vec")) * 1e6 + lit(0.5)).cast("long"))
    val key = struct(negate(col("cq")).as("neg_cq"),
      col("neighbor_id").as("nid"), col("n_vec").as("vec"))
    val local = scored
      .withColumn("pid", spark_partition_id())
      .groupBy("query_id", "pid")
      .agg(slice(array_sort(collect_list(key)), 1, kShortlist).as("cands"))
    val merged = local
      .select(col("query_id"), explode(col("cands")).as("c"))
      .groupBy("query_id")
      .agg(slice(array_sort(collect_list(col("c"))), 1, kShortlist).as("cands"))
    merged
      .select(col("query_id"),
        posexplode(ColumnBridge.column(graft.functions.MmrSelect(
          ColumnBridge.expression(col("cands")), kSelect, lambda)))
          .as(Seq("pos", "neighbor_id")))
      .select(col("query_id"), (col("pos") + 1).as("rank"),
        col("neighbor_id"))
  }

  /** IVF ANN with a COMPUTED block: when no natural partition column
    * exists, the coarse quantizer is the random-hyperplane LSH bucket
    * ([[rhpSignature]]) — the same deterministic expression buckets
    * corpus and queries, so no trained model ships anywhere. nBits
    * controls the prune factor (2^nBits buckets, single probe);
    * recall follows the RHP collision bound cos(θ)≈1−hamming/nBits.
    *
    * Honest expectation-setting, measured on the synthetic sf0.01
    * embeddings: recall@10 = 0.13 at nBits=4 — ~2× the 1/16 chance
    * baseline, because isotropic random vectors give single-probe LSH
    * nothing to exploit. On clustered real embeddings the bucket
    * concentrates true neighbors; for high recall on hard data, probe
    * the Hamming-adjacent buckets too (multi-probe) or use a trained
    * coarse quantizer as `blockCol` with [[ivfTopK]].
    */
  def ivfTopKByRhp(corpus: DataFrame, queries: DataFrame, k: Int, nBits: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val blocked = corpus.withColumn("__block", rhpSignature(col(vecCol), nBits))
    val qBlocked = queries.withColumn("__block", rhpSignature(col(vecCol), nBits))
    ivfTopK(blocked, qBlocked, k, "__block", idCol, vecCol)
  }

  /** Multi-probe variant: each query also probes every bucket at
    * Hamming distance 1 from its own (1+nBits buckets total) — the
    * standard multi-probe LSH recall lever. Each corpus vector lives
    * in exactly one bucket, so probes never produce duplicate
    * candidates and the bounded top-k merge needs no dedup. Cost is
    * linear in probes (still a vanishing corpus fraction scanned);
    * measured on the synthetic sf0.01 embeddings this lifts recall@10
    * from 0.13 (single-probe) to 0.44 at nBits=4 (5 of 16 buckets
    * probed). Those isotropic vectors are the worst case — on
    * clustered embeddings (the regime ANN serves) the same setting
    * reaches recall@10 ≥ 0.9, pinned by SimilaritySpec's
    * clustered-recall gate.
    */
  def ivfTopKByRhpMultiProbe(corpus: DataFrame, queries: DataFrame, k: Int,
      nBits: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val blocked = corpus.withColumn("__block", rhpSignature(col(vecCol), nBits))
    val probeCols = col("__b0") +:
      (0 until nBits).map(b => col("__b0").bitwiseXOR(lit(1L << b)))
    val qBlocked = queries
      .withColumn("__b0", rhpSignature(col(vecCol), nBits))
      .withColumn("__block", explode(array(probeCols: _*)))
      .drop("__b0")
    ivfTopK(blocked, qBlocked, k, "__block", idCol, vecCol)
  }

  /** Train the IVF coarse quantizer: k-means over (a sample of) the
    * corpus, returning just the centroid array — the entire "index
    * model", nClusters × dim doubles. Training is a SEPARATE phase
    * from probing: at 100 TB the quantizer is fit once on a bounded
    * sample (`maxTrainRows` caps the training set; k-means quality
    * saturates long before the full corpus) and the centroids are
    * persisted as a tiny table/literal, then every probe query reuses
    * them with zero ML work ([[ivfTopKByCentroids]]).
    */
  def trainQuantizer(corpus: DataFrame, nClusters: Int,
      vecCol: String = "embedding", seed: Long = 42L,
      maxTrainRows: Long = 100000L): Array[Array[Double]] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val n = corpus.count()
    val sampled =
      if (n <= maxTrainRows) corpus
      else corpus.sample(withReplacement = false,
        fraction = maxTrainRows.toDouble / n, seed = seed)
    val fv = sampled.withColumn("__fv",
      array_to_vector(transform(col(vecCol), x => x.cast("double"))))
    val model = new KMeans().setK(nClusters).setSeed(seed)
      .setFeaturesCol("__fv").setPredictionCol("__pred").fit(fv)
    model.clusterCenters.map(_.toArray)
  }

  /** Persist trained centroids as a tiny parquet table (cluster_id,
    * centroid) — the index-build artifact a 100-TB deployment writes
    * once and shares across sessions/queries; [[loadQuantizer]] reads
    * it back for probing. Completes the train/probe split: train →
    * save (offline build), load → [[ivfTopKByCentroids]] (query).
    */
  def saveQuantizer(spark: org.apache.spark.sql.SparkSession,
      centroids: Array[Array[Double]], path: String): Unit = {
    import spark.implicits._
    centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cluster_id", "centroid")
      .repartition(1)
      .write.mode("overwrite").parquet(path)
  }

  def loadQuantizer(spark: org.apache.spark.sql.SparkSession,
      path: String): Array[Array[Double]] = {
    import spark.implicits._
    spark.read.parquet(path)
      .orderBy("cluster_id")
      .select("cluster_id", "centroid")
      .as[(Int, Seq[Double])].collect()
      .map(_._2.toArray)
  }

  /** Product quantizer: `m` independent sub-quantizers, one per
    * contiguous `dim/m`-dim slice of the vector, each a seeded k-means
    * with `kPerSub` centroids over a bounded training sample. The PQ
    * compression story at 100 TB: a 64-float vector (256 B) encodes as
    * m codes (m bytes at kPerSub ≤ 256) — a 32× shrink that makes the
    * re-rank candidate set fit in memory, with asymmetric distances
    * computable from m table lookups instead of a 64-mult dot product
    * (Jégou/Douze/Schmid, PAMI'11 — the IVF-PQ standard). Same
    * train/probe split as [[trainQuantizer]]: fit offline on a sample,
    * persist the tiny codebook, encode/probe as pure DataFrame work.
    */
  def trainProductQuantizer(corpus: DataFrame, m: Int, kPerSub: Int,
      vecCol: String = "embedding", seed: Long = 42L,
      maxTrainRows: Long = 100000L): Array[Array[Array[Double]]] = {
    val dim = corpus.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"vector dim $dim not divisible by m=$m")
    val d = dim / m
    // distinct seed per subspace: identically-seeded fits on correlated
    // slices would produce correlated codebooks
    (0 until m).toArray.map { j =>
      trainQuantizer(
        corpus.select(slice(col(vecCol), j * d + 1, d).as(vecCol)),
        kPerSub, vecCol, seed + j, maxTrainRows)
    }
  }

  /** Persist a product codebook as one tiny parquet
    * (sub_idx, cluster_id, centroid) — the offline index-build
    * artifact, m × kPerSub × (dim/m) doubles.
    */
  def saveProductQuantizer(spark: org.apache.spark.sql.SparkSession,
      pq: Array[Array[Array[Double]]], path: String): Unit = {
    import spark.implicits._
    pq.zipWithIndex.flatMap { case (cents, j) =>
      cents.zipWithIndex.map { case (c, i) => (j, i, c.toSeq) }
    }.toSeq.toDF("sub_idx", "cluster_id", "centroid")
      .repartition(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Encode every vector as its m nearest-sub-centroid codes — the PQ
    * compression pass. Codebooks enter as literals, so this is a
    * map-only projection over the scan (no join, no shuffle, no ML
    * model): per subspace, squared distances to the kPerSub centroids
    * via the same left-to-right zip_with/aggregate arithmetic the IVF
    * assignment uses (cross-engine bit-parity), argmin by
    * `array_min` over (distance, index) structs — ties break to the
    * lowest cluster_id, the same rule as the oracle's QUALIFY.
    */
  def pqEncode(corpus: DataFrame, pq: Array[Array[Array[Double]]],
      idCol: String = "vec_id", vecCol: String = "embedding",
      keep: Seq[String] = Nil): DataFrame = {
    val d = pq(0)(0).length
    val codeCols = pq.zipWithIndex.map { case (cents, j) =>
      val sub = slice(col(vecCol), j * d + 1, d)
      val centersLit = array(cents.map(c => typedLit(c.toSeq)): _*)
      val dists = centroidDists(sub, centersLit)
      array_min(zip_with(dists,
          sequence(lit(0), lit(cents.length - 1)),
          (dd, i) => struct(dd.as("d"), i.as("i"))))
        .getField("i").cast("int").as(s"c$j")
    }
    corpus.select(col(idCol) +: keep.map(col) ++: codeCols: _*)
  }

  /** IVF-PQ's query path: asymmetric distance computation (ADC) top-k
    * over PQ codes. Per query, a distance TABLE (m × kPerSub doubles:
    * exact squared distance from the query's j-th slice to every j-th
    * sub-centroid) is computed driver-side from the codebook — the
    * tiny per-query artifact ADC is named for — and the corpus scan
    * scores each row with m array lookups summed in fixed subspace
    * order (ties broken by neighbor id). The broadcast cross join of
    * the few-row query table against the codes scan is the DESIGNED
    * plan, same rationale as s01's brute-force: every corpus row must
    * meet every query, and the query side is tiny. At 100 TB the IVF
    * stage prunes the scan to probed buckets first; the scoring pass
    * itself reads 1 byte/subspace instead of 4 bytes/dim — the whole
    * point of PQ.
    *
    * @param codes   (idCol, c0..c{m-1}) — [[pqEncode]] output
    * @param queries (query_id, full query vector) — driver-side, few
    * @param pq      the codebook the codes were produced with
    */
  def pqAdcTopK(codes: DataFrame, queries: Array[(Long, Array[Double])],
      pq: Array[Array[Array[Double]]], k: Int,
      idCol: String = "vec_id"): DataFrame = {
    val spark = codes.sparkSession
    import spark.implicits._
    val d = pq(0)(0).length
    val m = pq.length
    // dtable[j][i] = ||q_sub_j - centroid_j_i||²; summed left-to-right
    // over dims, the same order the oracle's list_sum uses
    val qTables = queries.toSeq.map { case (qid, qv) =>
      (qid, pq.zipWithIndex.map { case (cents, j) =>
        cents.toSeq.map { c =>
          c.zip(qv.slice(j * d, j * d + d))
            .foldLeft(0.0) { case (acc, (a, b)) => acc + (a - b) * (a - b) }
        }
      }.toSeq)
    }
    val qdf = broadcast(qTables.toDF("query_id", "dtable"))
    val adc = (0 until m)
      .map(j => element_at(element_at(col("dtable"), j + 1), col(s"c$j") + 1))
      .reduce(_ + _) // fixed j-ascending fold — cross-engine order parity
    codes.crossJoin(qdf)
      .filter(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("neighbor_id"), adc.as("adc"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("adc"), col("neighbor_id"))).cast("int"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id")
  }

  /** Driver-side twin of [[graft.functions.NearestCells]] for the
    * few-row query set: same strict-< scan, same lower-id tie rule —
    * probes computed here MUST match the corpus-side assignment
    * expression bit for bit.
    */
  private[operators] def nearestCellsLocal(vec: Array[Double],
      centroids: Array[Array[Double]], n: Int): Seq[Int] = {
    val bestD = Array.fill(n)(Double.PositiveInfinity)
    val bestI = new Array[Int](n)
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      val dim = math.min(vec.length, cent.length)
      var d2 = 0.0
      var i = 0
      while (i < dim) { val d = cent(i) - vec(i); d2 += d * d; i += 1 }
      if (d2 < bestD(n - 1)) {
        var p = n - 1
        while (p > 0 && d2 < bestD(p - 1)) {
          bestD(p) = bestD(p - 1); bestI(p) = bestI(p - 1); p -= 1
        }
        bestD(p) = d2; bestI(p) = c
      }
      c += 1
    }
    bestI.toSeq
  }

  /** The COMBINED IVF-PQ probe — the full architecture s02–s05 build
    * toward, in one plan: the coarse quantizer prunes the scan to each
    * query's `nProbe` cells (an EQUI-join on cell, no cross join left
    * anywhere), then ADC ranks the survivors from their PQ codes with
    * m table lookups per row. At 100 TB this is the deployed shape:
    * the scan reads only probed partitions, and reads 1 byte/subspace
    * instead of 4 bytes/dim. Recall is bounded by the probe (cells
    * missed stay missed) — rank order within candidates is exact under
    * the codebook, which is what the oracle replays.
    *
    * @param codes (idCol, cellCol, c0..c{m-1}) — [[pqEncode]] with the
    *              cell kept
    */
  def pqAdcTopKBlocked(codes: DataFrame,
      queries: Array[(Long, Array[Double])],
      centroids: Array[Array[Double]], pq: Array[Array[Array[Double]]],
      k: Int, nProbe: Int, idCol: String = "vec_id",
      cellCol: String = "cell"): DataFrame = {
    val spark = codes.sparkSession
    import spark.implicits._
    val d = pq(0)(0).length
    val m = pq.length
    val qRows = queries.toSeq.flatMap { case (qid, qv) =>
      val dtable = pq.zipWithIndex.map { case (cents, j) =>
        cents.toSeq.map { c =>
          c.zip(qv.slice(j * d, j * d + d))
            .foldLeft(0.0) { case (acc, (a, b)) => acc + (a - b) * (a - b) }
        }
      }.toSeq
      nearestCellsLocal(qv, centroids, nProbe)
        .map(cell => (qid, cell, dtable))
    }
    val qdf = broadcast(qRows.toDF("query_id", "__qcell", "dtable"))
    val adc = (0 until m)
      .map(j => element_at(element_at(col("dtable"), j + 1), col(s"c$j") + 1))
      .reduce(_ + _) // fixed j-ascending fold — cross-engine order parity
    codes.join(qdf, col(cellCol) === col("__qcell"))
      .filter(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("neighbor_id"), adc.as("adc"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("adc"), col("neighbor_id"))).cast("int"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id")
  }

  /** Two-stage IVF-PQ search with EXACT re-ranking — the deployed
    * production shape (FAISS's search-then-refine): the ADC pass over
    * PQ codes cheaply ranks the probed cells' candidates, the top
    * `rerank` shortlist re-scores against the ORIGINAL vectors, and
    * the final cut is exact cosine. Fixes ADC's quantization error at
    * the top of the list for the price of `rerank` full-vector reads
    * per query.
    *
    * Scale shape: the shortlist is Q×rerank rows — broadcast — so the
    * refine join STREAMS the corpus (vectors never shuffle, the s08
    * lesson); the bounded top-k moves ≤ k rows per partition.
    */
  def pqAdcRerankTopK(codes: DataFrame, corpus: DataFrame,
      queries: Array[(Long, Array[Double])],
      centroids: Array[Array[Double]], pq: Array[Array[Array[Double]]],
      k: Int, nProbe: Int, rerank: Int, idCol: String = "vec_id",
      vecCol: String = "embedding", cellCol: String = "cell"): DataFrame = {
    require(rerank >= k, "rerank shortlist must be at least k")
    val spark = codes.sparkSession
    import spark.implicits._
    val shortlist = pqAdcTopKBlocked(codes, queries, centroids, pq,
      k = rerank, nProbe = nProbe, idCol = idCol, cellCol = cellCol)
      .select("query_id", "neighbor_id")
    val qdf = broadcast(withUnitVector(
      queries.toSeq.toDF("query_id", "qv"),
      col("qv"), "q_vec").select(col("query_id"), col("q_vec")))
    val unit = withUnitVector(corpus, col(vecCol), "n_vec")
      .select(col(idCol).as("neighbor_id"), col("n_vec"))
    val scored = unit.join(broadcast(shortlist), "neighbor_id")
      .join(qdf, "query_id")
      .withColumn("cos", dot(col("q_vec"), col("n_vec")))
    boundedTopK(scored, k)
  }

  /** Squared-L2 distances from `vec` to each centroid of `centersLit`
    * (an array-of-array literal), as an array column. */
  private def centroidDists(vec: Column, centersLit: Column): Column =
    transform(centersLit, c =>
      aggregate(zip_with(c, vec, (a, b) => {
        val d = a - b.cast("double"); d * d
      }), lit(0.0), (acc, x) => acc + x))

  /** IVF probe with PRECOMPUTED centroids: corpus vectors assigned to
    * their nearest centroid, queries probing the `nProbe` nearest —
    * the classic IVF-Flat probe. Pure DataFrame plan: the centroids
    * enter as a literal (they ship with the broadcast query side and
    * the corpus-side projection), so no ML fit job, no model object,
    * nothing driver-side beyond the tiny array. This is the 100-TB
    * query path; [[trainQuantizer]] is the offline index build.
    */
  /** The `n` nearest centroid ids for `vec`, ties to the lower
    * cluster_id — the shared assignment arithmetic of every
    * centroid-blocked operator, and exactly what the DuckDB oracles
    * replay. Backed by [[graft.functions.NearestCells]], a primitive-
    * loop expression: the HOF spelling (array_sort over zip_with over
    * per-centroid aggregate) allocated k arrays + a k-struct sort per
    * row and dominated d09's wall at 32+ cells (scale-rehearsal
    * measurement in SCALE.md).
    */
  private def nearestCells(vec: Column, centroids: Array[Array[Double]],
      n: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.NearestCells(
        org.apache.spark.sql.graft.ColumnBridge.expression(vec),
        centroids, n))

  /** Nearest-cell assignment as a column (map-only; the IVF index
    * build's corpus-side pass). */
  def assignCells(corpus: DataFrame, centroids: Array[Array[Double]],
      vecCol: String = "embedding", out: String = "cell"): DataFrame =
    corpus.withColumn(out, element_at(nearestCells(col(vecCol), centroids, 1), 1))

  def ivfTopKByCentroids(corpus: DataFrame, queries: DataFrame, k: Int,
      centroids: Array[Array[Double]], nProbe: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // corpus: single nearest centroid (assignment pass, map-only)
    val blocked = corpus
      .withColumn("__block", element_at(nearestCells(col(vecCol), centroids, 1), 1))
    // queries: nProbe nearest centroids, one probe row each
    val qBlocked = queries
      .withColumn("__block", explode(nearestCells(col(vecCol), centroids, nProbe)))
    ivfTopK(blocked, qBlocked, k, "__block", idCol, vecCol)
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023's shape): assign
    * every embedding to its nearest coarse-quantizer cell, then WITHIN
    * each cell drop any id that has a lower-id neighbor at cosine ≥
    * `threshold`; the reported witness is the smallest such lower id.
    * The cluster blocking is the whole scale story — the pair join is
    * O(Σ cell²), never O(N²), and at 100 TB you raise the cluster count
    * so cells stay bounded while assignment remains one map-only pass
    * against a broadcast centroid literal. Output: (drop_id,
    * witness_id, cell), one row per dropped embedding.
    */
  def semanticDedup(corpus: DataFrame, centroids: Array[Array[Double]],
      threshold: Double, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val assigned = corpus.withColumn("__cell",
      element_at(nearestCells(col(vecCol), centroids, 1), 1))
    // materialize the assignment ONCE: the pair self-join would
    // otherwise evaluate the k-centroid argmin (the expensive per-row
    // HOF chain) twice — measured ~35% of d09's wall at 32 cells. The
    // checkpoint holds (cell, id, unit-vec) only, never the raw row.
    val unit = withUnitVector(assigned, col(vecCol), "uv")
      .select(col("__cell").as("cell"), col(idCol), col("uv"))
      .localCheckpoint()
    val a = unit.select(col("cell"), col(idCol).as("id_a"), col("uv").as("v_a"))
    val b = unit.select(col("cell"), col(idCol).as("id_b"), col("uv").as("v_b"))
    a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", dot(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .groupBy(col("id_b").as("drop_id"))
      // min(cell) == the (unique) shared cell; min avoids first()'s
      // order-dependence
      .agg(min("id_a").as("witness_id"), min("cell").as("cell"))
      .select("drop_id", "witness_id", "cell")
  }

  /** Recall@k evaluation harness: how much of the exact top-k does an
    * approximate index recover, per query. The eval every ANN rollout
    * needs before trading scan cost for recall; both sides run as the
    * production operators ([[bruteForceTopK]] / [[ivfTopK]]), so the
    * number measures the shipped plans, not a model of them.
    */
  def recallAtK(exact: DataFrame, approx: DataFrame): DataFrame = {
    val hits = exact.select("query_id", "neighbor_id")
      .join(approx.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"))
      .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
    exact.groupBy("query_id").agg(count(lit(1)).as("n_exact"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"), col("n_exact"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
  }

  /** Convenience train+probe in one call (small-data / test path):
    * [[trainQuantizer]] then [[ivfTopKByCentroids]]. Production code
    * should call the two phases separately so the fit isn't glued to
    * every query invocation.
    */
  def ivfTopKByKmeans(corpus: DataFrame, queries: DataFrame, k: Int,
      nClusters: Int, nProbe: Int, idCol: String = "vec_id",
      vecCol: String = "embedding", seed: Long = 42L): DataFrame = {
    val centers = trainQuantizer(corpus, nClusters, vecCol, seed)
    ivfTopKByCentroids(corpus, queries, k, centers, nProbe, idCol, vecCol)
  }

  /** Random-hyperplane LSH signature (nBits ≤ 64) as a long. Planes
    * are derived from `xxhash64(seed, bit, dim)` — deterministic, no
    * stored model; the same expression computes the bucket for queries
    * and corpus.
    *
    * Built as ONE aggregate over the vector carrying an nBits-wide
    * projection accumulator, so the expression tree is O(nBits) —
    * the earlier unrolled form was O(nBits × dim) (≈50k nodes at 64
    * bits × 768 dims, far past codegen limits).
    */
  /** Deterministic ±1 hyperplane matrix for [[bandedLshTopK]]:
    * sign(j,k) = +1 iff the first hex nibble of md5("lsh_<j>_<k>") is
    * < 8. One line regenerates the matrix in ANY engine (Spark,
    * DuckDB, Python, CH) — no model artifact ships, unlike the s03
    * k-means centroids. Each nibble is an independent fair coin over
    * md5's output, so the planes are iid Rademacher — exactly the
    * sign-random-projection family (Charikar '02 simhash/SRP).
    */
  def hyperplaneSigns(nPlanes: Int, dim: Int): Seq[Seq[Int]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until nPlanes).map { j =>
      (0 until dim).map { k =>
        val h = md.digest(s"lsh_${j}_${k}".getBytes("UTF-8"))
        if (((h(0) >> 4) & 0xf) < 8) 1 else -1
      }
    }
  }

  /** Micro-quantized integer copy of a float vector:
    * round(x·1e6) as BIGINT via floor(x·1e6 + 0.5) — `floor` has ONE
    * definition everywhere, so this sidesteps the engines' different
    * round-half conventions. ±1-plane dots over these are exact
    * integer sums (|Σ| < 64·4e6 ≪ 2^53 even through a double
    * accumulator), so bucket signs are bit-identical in any engine
    * and any summation order — what lets the LSH path carry a full
    * DuckDB oracle where the float-weighted [[rhpSignature]] cannot
    * (an fp projection near 0 could flip a bucket between engines; an
    * integer one cannot).
    */
  def microQuantize(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * lit(1e6) + lit(0.5)).cast("long"))

  /** nPlanes-bit SRP signature of an already-[[microQuantize]]d
    * vector. The planes are compile-time literals: each bit is one
    * codegen'd `aggregate(zip_with(...))` integer fold — no join, no
    * shuffle, no per-row hashing of the plane matrix.
    */
  def signedProjectionSig(ivec: Column, planes: Seq[Seq[Int]]): Column =
    planes.zipWithIndex.map { case (p, j) =>
      val lits = array(p.map(lit(_)): _*)
      when(aggregate(zip_with(lits, ivec, (sgn, x) => sgn.cast("long") * x),
        lit(0L), (a, x) => a + x) >= 0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Banded hyperplane-LSH ANN — the OR-amplified variant of RHP
    * blocking: the nPlanes-bit SRP signature splits into `bands`
    * bands of nPlanes/bands bits; a corpus vector is a candidate for
    * a query if ANY band bucket matches (vs [[ivfTopKByRhp]]'s
    * single-bucket AND over all bits). Banding trades precision for
    * recall exactly like MinHash-LSH banding does for Jaccard: match
    * probability 1-(1-p^r)^b with p = 1 - θ/π. Candidates then rank
    * by exact cosine — so the output is the true top-k OF the
    * candidate set, and the whole path (signs, buckets, candidates,
    * ranking) is deterministically reproducible cross-engine.
    *
    * Scale shape: the banded corpus (N·bands rows of (band, bucket,
    * id)) hash-joins the broadcast banded queries — no shuffle of
    * vectors; only candidate ids shuffle for the distinct. Scoring
    * re-joins the corpus vectors by id and the final cut is the
    * two-phase bounded top-k (≤ k rows per partition move).
    */
  def bandedLshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nPlanes: Int, bands: Int, dim: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(nPlanes % bands == 0, "bands must divide nPlanes")
    val bitsPerBand = nPlanes / bands
    val mask = (1 << bitsPerBand) - 1
    val planes = hyperplaneSigns(nPlanes, dim)
    // Fail-fast dim guard: a vector shorter/longer than the plane
    // matrix would make zip_with null-pad, the per-bit aggregate go
    // null, and every bit fall to otherwise(0) — ALL signatures
    // collapse to 0, every vector collides in every band, and the
    // LSH path silently degrades to full O(N·Q) scoring. raise_error
    // inside the row pipeline surfaces the mismatch as a job failure
    // instead; the `when` branch costs one codegen'd size() compare.
    def guarded(df: DataFrame): DataFrame =
      df.withColumn(vecCol,
        when(size(col(vecCol)) === lit(dim), col(vecCol))
          .otherwise(raise_error(concat(
            lit(s"bandedLshTopK: embedding length "), size(col(vecCol)).cast("string"),
            lit(s" != dim $dim — signatures would silently collapse to 0")))))
    def banded(df0: DataFrame, idOut: String, vecOut: String): DataFrame = {
      val df = guarded(df0)
      withUnitVector(df, col(vecCol), vecOut)
        .select(col(idCol).as(idOut), col(vecOut),
          microQuantize(col(vecCol)).as("__iv"))
        .select(col(idOut), col(vecOut),
          signedProjectionSig(col("__iv"), planes).as("__sig"))
        .select(col(idOut), col(vecOut), col("__sig"),
          explode(sequence(lit(0), lit(bands - 1))).as("band"))
        .select(col(idOut), col(vecOut), col("band"),
          expr(s"shiftright(__sig, band * $bitsPerBand) & $mask").as("bucket"))
    }
    // Score DURING the band join: the corpus streams map-side into the
    // broadcast bucket match and each hit is scored in place, so
    // vectors never enter a shuffle at ANY corpus size (a
    // candidates⋈vectors re-join flips to shuffling the unit vectors
    // once the corpus outgrows the broadcast threshold — measured 30 MB
    // of vector shuffle at 52k rows in the scale rehearsal, gone with
    // this shape). A pair colliding in several bands is scored in each
    // — max() over bit-identical copies dedups it with an id+double
    // shuffle, the only data movement in the whole plan.
    val scored = banded(corpus, "neighbor_id", "n_vec")
      .join(broadcast(banded(queries, "query_id", "q_vec")), Seq("band", "bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("__cos", dot(col("q_vec"), col("n_vec")))
      .groupBy("query_id", "neighbor_id").agg(max("__cos").as("cos"))
    boundedTopK(scored, k)
  }

  /** MULTI-PROBE hyperplane-LSH ANN (Lv et al. 2007): one FULL
    * nBits-bit SRP cell per corpus vector — the maximum-precision
    * AND-composition — with each query probing its own cell plus
    * every Hamming-1 neighbor cell. The recall amplifier that does
    * NOT replicate the index: [[bandedLshTopK]] buys recall by
    * writing every corpus vector `bands` times (index-side OR);
    * multi-probe keeps the corpus at 1× and fans out the bounded
    * QUERY side instead — at 100 TB the index is the thing you
    * cannot afford to multiply. Probe cells are distinct values and
    * each corpus vector owns exactly one cell, so a (query, neighbor)
    * pair matches at most once — no dedup aggregation. The whole
    * path (integer-quantized projections over the md5-derived ±1
    * planes, probe set, exact-cosine ranking) is deterministically
    * reproducible cross-engine, so the gate carries a full oracle
    * where the float-weighted [[rhpSignature]] path cannot.
    */
  def multiProbeLshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nBits: Int, dim: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(nBits >= 1 && nBits <= 30, "multiProbeLshTopK: nBits in [1, 30]")
    val planes = hyperplaneSigns(nBits, dim)
    def sigd(df: DataFrame, idOut: String, vecOut: String): DataFrame =
      withUnitVector(df, col(vecCol), vecOut)
        .select(col(idCol).as(idOut), col(vecOut),
          microQuantize(col(vecCol)).as("__iv"))
        .select(col(idOut), col(vecOut),
          signedProjectionSig(col("__iv"), planes).as("__sig"))
    val c = sigd(corpus, "neighbor_id", "n_vec")
      .withColumnRenamed("__sig", "cell")
    val probes = col("__sig") +: (0 until nBits).map(b =>
      col("__sig").bitwiseXOR(lit(1 << b)))
    val q = sigd(queries, "query_id", "q_vec")
      .withColumn("cell", explode(array(probes: _*))).drop("__sig")
    // corpus streams map-side into the broadcast probe table and each
    // hit scores in place — vectors never enter a shuffle (the
    // bandedLshTopK shape; only the bounded top-k rows move)
    val scored = c.join(broadcast(q), Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", dot(col("q_vec"), col("n_vec")))
    boundedTopK(scored, k)
  }

  def rhpSignature(vec: Column, nBits: Int, seed: Int = 42): Column = {
    import org.apache.spark.sql.catalyst.expressions.ShiftLeft
    import org.apache.spark.sql.graft.ColumnBridge.{column => cc, expression => ce}
    def shl(v: Column, amt: Column): Column = cc(ShiftLeft(ce(v), ce(amt)))
    val bitIdx = sequence(lit(0), lit(nBits - 1))
    // deterministic weight in [-1, 1): hash of (seed, bit, dim index)
    def weight(b: Column, d: Column): Column =
      (pmod(xxhash64(lit(seed), b, d), lit(2000000L)).cast("double")
        / lit(1000000.0)) - lit(1.0)
    // projections[b] = Σ_d vec[d] · w(b, d): fold over dim indices
    val dims = sequence(lit(1), size(vec))
    val projs = aggregate(dims,
      array_repeat(lit(0.0), nBits),
      (acc, d) => zip_with(acc, bitIdx, (a, b) =>
        a + element_at(vec, d).cast("double") * weight(b, d)))
    aggregate(
      zip_with(projs, bitIdx, (p, b) => when(p >= 0, shl(lit(1L), b)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }
}
