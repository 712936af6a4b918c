package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** MinHash/SimHash/Jaccard semantics, incl. the LSH recall claim made
  * by the d02 gate query (candidates found by banding ⊇ truly-similar
  * pairs at the tuned threshold, on a corpus where ground truth is
  * computable exactly).
  */
class TextDedupSpec extends SparkTestBase {
  import spark.implicits._

  test("jaccard: exact set arithmetic") {
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
    val j = df.select(TextDedup.jaccard(col("x"), col("y"))).head.getDouble(0)
    assert(j === 0.5) // |{b,c}| / |{a,b,c,d}|
    val empty = Seq((Seq.empty[String], Seq.empty[String])).toDF("x", "y")
    assert(empty.select(TextDedup.jaccard(col("x"), col("y"))).head.getDouble(0) === 0.0)
  }

  test("native ShingleJaccard equals the HOF shingle-set jaccard on ASCII text") {
    val pairs = Seq(
      ("the quick brown fox", "the quick brown dog"),
      ("abc", "abc"),
      ("ab", "xy"),               // shorter than the shingle width
      ("", "anything"),
      ("same text here", "same text here"))
    val df = pairs.toDF("x", "y")
    val got = df.select(
      graft.functions.ShingleJaccard(col("x"), col("y"), 5).as("native"),
      TextDedup.jaccard(
        TextDedup.shingles(col("x"), 5), TextDedup.shingles(col("y"), 5)).as("hof"))
      .collect()
    got.foreach(r => assert(r.getDouble(0) === r.getDouble(1),
      s"native=${r.getDouble(0)} hof=${r.getDouble(1)}"))
  }

  test("native SimHashSig equals the HOF simHash64(tokens) form") {
    val texts = Seq(
      "the quick brown fox jumps",
      "  leading and trailing   ",
      "single",
      "",
      "   ",
      "MiXeD CaSe Tokens\there")
    val df = texts.toDF("text")
    val got = df.select(
      graft.functions.SimHashSig(col("text")).as("native"),
      TextDedup.simHash64(graft.functions.TextFunctions.tokens(col("text"))).as("hof"))
      .collect()
    got.zip(texts).foreach { case (r, t) =>
      assert(r.getLong(0) === r.getLong(1), s"mismatch for '$t'")
    }
  }

  test("hamming64 counts differing bits") {
    val df = Seq((0L, -1L), (5L, 4L), (7L, 7L)).toDF("a", "b")
    val h = df.select(TextDedup.hamming64(col("a"), col("b"))).as[Int].collect().toSeq
    assert(h === Seq(64, 1, 0))
  }

  test("minhash signature: deterministic, right length, identical for identical sets") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "a completely different sentence with other words"))
      .toDF("id", "text")
      .select(col("id"), TextDedup.minHashSignature(TextDedup.shingles(col("text"), 5), 32).as("sig"))
    val rows = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(rows(1L).length === 32)
    assert(rows(1L) === rows(2L))
    assert(rows(1L) !== rows(3L))
  }

  test("LSH banding recall: high-similarity pairs (j >= 0.8) are all candidates") {
    // (16 bands × 4 rows) has its 50%-capture threshold at
    // j* = (1/16)^(1/4) = 0.5; recall is only near-certain well above
    // it — at j = 0.8 the miss probability is (1-0.8^4)^16 ≈ 2e-4.
    // So the recall contract this operator makes (and this test pins)
    // is over pairs with j >= 0.8.
    val texts = (0 until 30).flatMap { i =>
      val base = s"document number $i with some shared content about topic ${i % 5} and more filler words here"
      Seq((i.toLong, base), (i + 100L, base + " x"))
    }
    val d = texts.toDF("doc_id", "text")
      .select(col("doc_id"), TextDedup.shingles(col("text"), 5).as("sh"))
      .cache()
    // ground truth: exact all-pairs jaccard (60 docs → trivially small)
    val a = d.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val b = d.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
    val truth = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("j", TextDedup.jaccard(col("sh_a"), col("sh_b")))
      .filter(col("j") >= 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty)
    // LSH candidates with the gate query's parameters (16 bands × 4 rows)
    val sigs = d.select(col("doc_id"), TextDedup.minHashSignature(col("sh"), 64).as("sig"))
    val cand = TextDedup.candidatePairs(
      TextDedup.lshBuckets(sigs, "doc_id", "sig", bands = 16, rowsPerBand = 4), "doc_id")
      .as[(Long, Long)].collect().toSet
    assert(truth.subsetOf(cand),
      s"missed pairs: ${truth.diff(cand)}")
    // the OPH signature (the scale path d02 uses) meets the same
    // recall contract with one hash evaluation per shingle
    val ophSigs = d.select(col("doc_id"),
      TextDedup.ophSignature(transform(col("sh"), s => xxhash64(s)), 64).as("sig"))
    val ophCand = TextDedup.candidatePairs(
      TextDedup.lshBuckets(ophSigs, "doc_id", "sig", bands = 16, rowsPerBand = 4), "doc_id")
      .as[(Long, Long)].collect().toSet
    assert(truth.subsetOf(ophCand),
      s"OPH missed pairs: ${truth.diff(ophCand)}")
  }
}
