package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** int8 scalar quantization: round-trip error bound, zero-vector edge,
  * and quantized brute-force recall vs the exact path.
  */
class QuantizeSpec extends SparkTestBase {
  import spark.implicits._

  test("quantize round-trip: q*scale within half a step of the original") {
    val df = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Array(100f, -50f, 0f, 1f)),
      (3L, Array(0f, 0f, 0f, 0f))) // zero vector
      .toDF("vec_id", "embedding")
    val q = Quantize.withInt8(df, col("embedding"), "q8")
    q.collect().foreach { r =>
      val orig = r.getSeq[Float](1)
      val q8 = r.getSeq[Byte](2)
      val scale = r.getDouble(3)
      assert(q8.length === orig.length)
      orig.zip(q8).foreach { case (o, b) =>
        assert(math.abs(o - b * scale) <= scale / 2 + 1e-9,
          s"row ${r.getLong(0)}: $o vs ${b * scale}")
      }
    }
    // zero vector: all-zero q8, scale 0
    val z = q.filter(col("vec_id") === 3).head
    assert(z.getSeq[Byte](2).forall(_ == 0) && z.getDouble(3) === 0.0)
  }

  test("quantized brute-force top-10 recall >= 0.9 vs exact on clustered data") {
    val rnd = new scala.util.Random(23)
    val dims = 16
    val centers = Array.fill(8)(Array.fill(dims)(rnd.nextGaussian()))
    // graded noise: each cluster's points sit at increasing distance
    // from the center, so the true top-10 is separated by more than the
    // int8 dot error (~0.5%) — with 30 equidistant near-ties recall@10
    // against exact ranking is meaningless for ANY approximate scorer
    val rows = for {
      c <- centers.indices
      i <- 0 until 30
    } yield {
      val sigma = 0.02 + 0.02 * i
      val v = centers(c).map(x => (x + sigma * rnd.nextGaussian()).toFloat)
      ((c * 30 + i).toLong, c, v)
    }
    val clustered = rows.toDF("vec_id", "label", "embedding").cache()
    val queries = clustered.filter(col("vec_id") % 30 === 0)

    val exact = Similarity.bruteForceTopK(clustered, queries, k = 10)
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    val quant = Quantize.bruteForceTopKInt8(clustered, queries, k = 10)
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap

    val recalls = exact.map { case (q, truth) =>
      quant.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    val recall = recalls.sum / recalls.size
    assert(recall >= 0.9, f"int8 brute-force recall@10 = $recall%.3f")
  }
}
