package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins the banded hyperplane-LSH ANN (s08) against an independent
  * driver-side reference implementation: same md5-derived ±1 planes,
  * same micro-quantized integer projections, same band buckets, same
  * candidate union, same (cos DESC, id ASC) top-k cut — recomputed
  * with plain Scala collections so any drift in the DataFrame
  * expression pipeline (quantization, shifts, masking, dedup,
  * bounded top-k) breaks the equality.
  */
class LshSpec extends SparkTestBase {
  import spark.implicits._

  private val nPlanes = 16
  private val bands = 4
  private val dim = 8
  private val k = 5

  // deterministic tiny corpus: 60 vectors in 8 dims with planted
  // near-duplicate structure (i and i+30 are small perturbations)
  private lazy val vecs: Seq[(Long, Array[Float])] =
    (0 until 60).map { i =>
      val base = i % 30
      val eps = if (i >= 30) 0.05f else 0.0f
      val v = Array.tabulate(dim)(d =>
        (math.sin(base * 17 + d * 5) + eps * math.cos(d)).toFloat)
      (i.toLong, v)
    }

  private lazy val corpus = vecs.toDF("vec_id", "embedding").cache()

  // ---- driver-side reference ----
  private def refSigns: Seq[Seq[Int]] = Similarity.hyperplaneSigns(nPlanes, dim)

  private def refSig(v: Array[Float]): Int = {
    val iv = v.map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong)
    refSigns.zipWithIndex.map { case (p, j) =>
      val dot = p.zip(iv).map { case (s, x) => s * x }.sum
      if (dot >= 0) 1 << j else 0
    }.sum
  }

  private def refBuckets(sig: Int): Seq[(Int, Int)] =
    (0 until bands).map(b => (b, (sig >> (b * 4)) & 15))

  test("hyperplaneSigns regenerates from md5 — spot values and balance") {
    val s = refSigns
    assert(s.size == nPlanes && s.forall(_.size == dim))
    assert(s.flatten.forall(x => x == 1 || x == -1))
    // fair-coin balance over all 128 entries: both signs well represented
    val plus = s.flatten.count(_ == 1)
    assert(plus > 32 && plus < 96, s"suspiciously unbalanced: $plus")
    // cross-check one entry against a direct md5 hex computation
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest("lsh_3_5".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert((s(3)(5) == 1) == (hex.head < '8'))
  }

  test("signedProjectionSig (DataFrame) equals the driver-side reference") {
    val planes = refSigns
    val got = corpus
      .select(col("vec_id"), Similarity.microQuantize(col("embedding")).as("iv"))
      .select(col("vec_id"), Similarity.signedProjectionSig(col("iv"), planes).as("sig"))
      .as[(Long, Int)].collect().toMap
    vecs.foreach { case (id, v) =>
      assert(got(id) == refSig(v), s"sig mismatch for vec $id")
    }
  }

  test("bandedLshTopK equals the reference LSH pipeline end-to-end") {
    val queries = corpus.filter(col("vec_id") < 6)
    val got = Similarity.bandedLshTopK(corpus, queries, k, nPlanes, bands, dim)
      .orderBy("query_id", "rank")
      .as[(Long, Int, Long)].collect().toSeq

    // reference: candidates = OR over band-bucket matches, ranked by
    // exact double cosine, ties by neighbor id
    val sigs = vecs.map { case (id, v) => id -> refSig(v) }.toMap
    val buckets = vecs.map { case (id, _) => id -> refBuckets(sigs(id)).toSet }.toMap
    def cosine(a: Array[Float], b: Array[Float]): Double = {
      def unit(x: Array[Float]): Array[Double] = {
        val d = x.map(_.toDouble)
        val n = math.sqrt(d.map(v => v * v).sum)
        if (n == 0) d else d.map(_ / n)
      }
      unit(a).zip(unit(b)).map { case (x, y) => x * y }.sum
    }
    val byId = vecs.toMap
    val expected = (0L until 6L).flatMap { q =>
      val cands = vecs.collect {
        case (id, _) if id != q && buckets(id).intersect(buckets(q)).nonEmpty => id
      }
      cands.map(id => (id, cosine(byId(q), byId(id))))
        .sortBy { case (id, c) => (-c, id) }
        .take(k).zipWithIndex
        .map { case ((id, _), i) => (q, i + 1, id) }
    }
    assert(got == expected)
  }

  test("property: signatures match the reference on random vectors " +
      "(negatives, zeros, sub-quantum values)") {
    // raw ScalaCheck Gen with fixed seeds (offline deps have no
    // scalatestplus bridge — same pattern as ChSqlRewritePropertySpec);
    // one DataFrame pass scores all generated vectors at once
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val genVec: Gen[Array[Float]] = Gen.containerOfN[Array, Float](dim,
      Gen.oneOf(
        Gen.chooseNum(-2.0f, 2.0f),
        Gen.const(0.0f),
        // below the 1e-6 quantum: must quantize to 0 and never flip signs
        Gen.chooseNum(-4.0e-7f, 4.0e-7f)))
    val rnd = (0 until 120).flatMap(i =>
      genVec.apply(Gen.Parameters.default, Seed(1000L + i)))
    val planes = refSigns
    val df = rnd.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
    val got = df
      .select(col("vec_id"), Similarity.microQuantize(col("embedding")).as("iv"))
      .select(col("vec_id"), Similarity.signedProjectionSig(col("iv"), planes).as("sig"))
      .as[(Long, Int)].collect().toMap
    rnd.zipWithIndex.foreach { case (v, i) =>
      assert(got(i.toLong) == refSig(v), s"sig mismatch on random vec $i")
    }
  }

  test("banding is OR-amplified: single-bucket RHP candidates are a subset") {
    // every pair colliding on ALL 16 bits trivially collides on each
    // 4-bit band — so the banded candidate set can only be larger
    val sigs = vecs.map { case (id, v) => id -> refSig(v) }.toMap
    val full = for {
      (a, _) <- vecs; (b, _) <- vecs
      if a < b && sigs(a) == sigs(b)
    } yield (a, b)
    val banded = for {
      (a, _) <- vecs; (b, _) <- vecs
      if a < b && (0 until bands).exists(band =>
        ((sigs(a) >> (band * 4)) & 15) == ((sigs(b) >> (band * 4)) & 15))
    } yield (a, b)
    assert(full.toSet.subsetOf(banded.toSet))
    assert(banded.size >= full.size)
  }
}
