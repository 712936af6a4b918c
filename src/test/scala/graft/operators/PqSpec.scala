package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Product quantization (s04): train/persist/encode contract. */
class PqSpec extends SparkTestBase {
  import spark.implicits._

  // 40 deterministic 16-dim vectors clustered around 4 corners, so
  // sub-quantizers have real structure to find
  private lazy val corpus = {
    val rows = (0 until 40).map { i =>
      val base = (i % 4).toDouble * 10.0
      (i.toLong, (0 until 16).map(j => (base + ((i * 7 + j * 3) % 5) * 0.1).toFloat))
    }
    rows.toDF("vec_id", "embedding")
  }

  test("pqEncode: every code is the argmin sub-centroid, ties to lowest id") {
    val pq = Similarity.trainProductQuantizer(corpus, m = 4, kPerSub = 4,
      maxTrainRows = 1000L)
    assert(pq.length === 4 && pq.forall(_.length === 4)
      && pq.forall(_.forall(_.length === 4)))
    val codes = Similarity.pqEncode(corpus, pq).collect()
    val vecs = corpus.as[(Long, Seq[Float])].collect().toMap
    codes.foreach { r =>
      val v = vecs(r.getLong(0))
      (0 until 4).foreach { j =>
        val sub = v.slice(j * 4, j * 4 + 4).map(_.toDouble)
        def d2(c: Array[Double]) =
          c.zip(sub).map { case (a, b) => (a - b) * (a - b) }.sum
        val code = r.getInt(1 + j)
        val dists = pq(j).map(d2)
        // argmin with lowest-index tie rule
        val want = dists.zipWithIndex.minBy { case (d, i) => (d, i) }._2
        assert(code === want, s"vec ${r.getLong(0)} sub $j")
      }
    }
  }

  test("save/load round-trips the codebook exactly") {
    val pq = Similarity.trainProductQuantizer(corpus, m = 2, kPerSub = 3,
      maxTrainRows = 1000L)
    val path = java.nio.file.Files.createTempDirectory("pq").toString + "/cb"
    Similarity.saveProductQuantizer(spark, pq, path)
    val back = spark.read.parquet(path)
      .orderBy("sub_idx", "cluster_id")
      .as[(Int, Int, Seq[Double])].collect()
    assert(back.length === 6)
    back.foreach { case (j, i, c) => assert(c.toArray.sameElements(pq(j)(i))) }
  }

  test("pqAdcTopK == brute-force distances to PQ reconstructions") {
    val pq = Similarity.trainProductQuantizer(corpus, m = 4, kPerSub = 4,
      maxTrainRows = 1000L)
    val vecs = corpus.as[(Long, Seq[Float])].collect().toMap
    val queries = Seq(0L, 1L).map(q => (q, vecs(q).map(_.toDouble).toArray)).toArray
    val got = Similarity.pqAdcTopK(
        Similarity.pqEncode(corpus, pq), queries, pq, k = 5)
      .orderBy("query_id", "rank")
      .as[(Long, Int, Long)].collect()
    // ADC(q, v) = ||q - reconstruction(v)||² exactly, so ranking by ADC
    // must equal ranking by distance to each vector's code centroids
    def codesOf(v: Seq[Float]): Seq[Array[Double]] = (0 until 4).map { j =>
      val sub = v.slice(j * 4, j * 4 + 4).map(_.toDouble)
      pq(j).minBy(c => c.zip(sub).map { case (a, b) => (a - b) * (a - b) }.sum)
    }
    val want = queries.flatMap { case (qid, qv) =>
      vecs.toSeq.filter(_._1 != qid)
        .map { case (id, v) =>
          val d = codesOf(v).zipWithIndex.map { case (c, j) =>
            c.zip(qv.slice(j * 4, j * 4 + 4))
              .map { case (a, b) => (a - b) * (a - b) }.sum
          }.sum
          (qid, id, d)
        }
        .sortBy { case (_, id, d) => (d, id) }.take(5).zipWithIndex
        .map { case ((q, id, _), i) => (q, i + 1, id) }
    }
    assert(got.toSeq === want.toSeq)
  }

  test("pqAdcTopKBlocked == pqAdcTopK restricted to the probed cells") {
    val pq = Similarity.trainProductQuantizer(corpus, m = 4, kPerSub = 4,
      maxTrainRows = 1000L)
    val centroids = Similarity.trainQuantizer(corpus, nClusters = 4,
      maxTrainRows = 1000L)
    val vecs = corpus.as[(Long, Seq[Float])].collect().toMap
    val queries = Seq(0L, 1L).map(q => (q, vecs(q).map(_.toDouble).toArray)).toArray
    val got = Similarity.pqAdcTopKBlocked(
        Similarity.pqEncode(Similarity.assignCells(corpus, centroids), pq,
          keep = Seq("cell")),
        queries, centroids, pq, k = 5, nProbe = 2)
      .orderBy("query_id", "rank")
      .as[(Long, Int, Long)].collect()
    // reference: full ADC ranking, filtered to vectors whose assigned
    // cell is one of the query's 2 probes, re-ranked
    val assigned = Similarity.assignCells(corpus, centroids)
      .select("vec_id", "cell").as[(Long, Int)].collect().toMap
    val full = Similarity.pqAdcTopK(
        Similarity.pqEncode(corpus, pq), queries, pq, k = 40)
      .as[(Long, Int, Long)].collect()
    val want = queries.flatMap { case (qid, qv) =>
      val probes = Similarity.nearestCellsLocal(qv, centroids, 2).toSet
      full.filter(_._1 == qid).sortBy(_._2)
        .filter { case (_, _, id) => probes.contains(assigned(id)) }
        .take(5).zipWithIndex.map { case ((q, _, id), i) => (q, i + 1, id) }
    }
    assert(got.toSeq === want.toSeq)
    // the plan is equi-join only: the IVF stage removed the cross join
    val plan = Similarity.pqAdcTopKBlocked(
        Similarity.pqEncode(Similarity.assignCells(corpus, centroids), pq,
          keep = Seq("cell")),
        queries, centroids, pq, k = 5, nProbe = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"expected equi-join plan:\n$plan")
  }

  test("pqAdcRerankTopK == exact-cosine ranking of the ADC shortlist") {
    val pq = Similarity.trainProductQuantizer(corpus, m = 4, kPerSub = 4,
      maxTrainRows = 1000L)
    val centroids = Similarity.trainQuantizer(corpus, nClusters = 4,
      maxTrainRows = 1000L)
    val vecs = corpus.as[(Long, Seq[Float])].collect().toMap
    val queries = Seq(0L, 1L).map(q => (q, vecs(q).map(_.toDouble).toArray)).toArray
    val codes = Similarity.pqEncode(Similarity.assignCells(corpus, centroids),
      pq, keep = Seq("cell"))
    val got = Similarity.pqAdcRerankTopK(codes, corpus, queries, centroids,
        pq, k = 3, nProbe = 2, rerank = 8)
      .orderBy("query_id", "rank")
      .as[(Long, Int, Long)].collect()
    // reference: the same ADC shortlist, re-ranked by exact cosine
    val shortlist = Similarity.pqAdcTopKBlocked(codes, queries, centroids,
        pq, k = 8, nProbe = 2)
      .as[(Long, Int, Long)].collect()
    def cosine(a: Seq[Float], b: Seq[Float]): Double = {
      def unit(x: Seq[Float]) = {
        val d = x.map(_.toDouble)
        val n = math.sqrt(d.map(v => v * v).sum)
        if (n == 0) d else d.map(_ / n)
      }
      unit(a).zip(unit(b)).map { case (x, y) => x * y }.sum
    }
    val want = queries.flatMap { case (qid, _) =>
      shortlist.filter(_._1 == qid)
        .map { case (_, _, id) => (id, cosine(vecs(qid), vecs(id))) }
        .sortBy { case (id, c) => (-c, id) }
        .take(3).zipWithIndex.map { case ((id, _), i) => (qid, i + 1, id) }
    }
    assert(got.toSeq === want.toSeq)
  }

  test("encode is a map-only projection — no shuffle, no join") {
    val pq = Similarity.trainProductQuantizer(corpus, m = 4, kPerSub = 4,
      maxTrainRows = 1000L)
    val plan = Similarity.pqEncode(corpus, pq)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"PQ encode should be map-only:\n$plan")
  }
}
