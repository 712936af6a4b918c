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

  test("overlapCoefficient: containment asymmetry jaccard misses") {
    // a 3-word doc pasted inside a 12-word doc: full containment
    val sub = Seq("a", "b", "c")
    val sup = sub ++ Seq("d", "e", "f", "g", "h", "i", "j", "k", "l")
    val df = Seq((sub, sup)).toDF("x", "y")
    val Array(ov, j) = df.select(
      TextDedup.overlapCoefficient(col("x"), col("y")),
      TextDedup.jaccard(col("x"), col("y"))).head.toSeq.toArray.map(_.asInstanceOf[Double])
    assert(ov === 1.0)       // |A∩B|/min = 3/3
    assert(j === 0.25)       // 3/12 — below any useful dedup threshold
    // symmetric in its arguments despite the asymmetric metric
    val ov2 = Seq((sup, sub)).toDF("x", "y")
      .select(TextDedup.overlapCoefficient(col("x"), col("y"))).head.getDouble(0)
    assert(ov2 === 1.0)
    // empty side → 0.0, not NaN/NULL
    val e = Seq((Seq.empty[String], Seq("a"))).toDF("x", "y")
    assert(e.select(TextDedup.overlapCoefficient(col("x"), col("y"))).head.getDouble(0) === 0.0)
  }

  test("wordNgrams: sliding word windows, short docs yield empty") {
    val df = Seq(Seq("a", "b", "c", "d"), Seq("a", "b"), Seq.empty[String])
      .toDF("toks")
    val got = df.select(TextDedup.wordNgrams(col("toks"), 3).as("g"))
      .collect().map(_.getSeq[String](0).toList).toList
    assert(got == List(List("a b c", "b c d"), Nil, Nil))
  }

  test("gramRows equals distinct exploded wordNgrams") {
    val df = Seq(
      (1L, Seq("a", "b", "c", "d", "e", "f")),
      (2L, Seq("x", "y")),                       // too short: no grams
      (3L, Seq("r", "r", "r", "r", "r", "r")))   // repeats: distinct collapses
      .toDF("id", "toks")
    val viaRows = TextDedup.gramRows(df, "id", "toks", 5)
      .as[(Long, String)].collect().toSet
    val viaArray = df.select(col("id"),
        explode(TextDedup.wordNgrams(col("toks"), 5)).as("gram"))
      .distinct().as[(Long, String)].collect().toSet
    assert(viaRows == viaArray)
    assert(viaRows.contains((1L, "a b c d e")) && viaRows.contains((1L, "b c d e f")))
    assert(!viaRows.exists(_._1 == 2L))
    assert(viaRows.count(_._1 == 3L) == 1)
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

  test("native DistinctShingles equals array_distinct over the HOF window build") {
    // d16's stop-set DF pass relies on this: same windows (original-
    // text character slices), same per-window lowercase, same
    // first-occurrence distinct order, same short-text single window
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "MIXED Case WITH Repeats repeats REPEATS",
      "aaaaaaaaaaaa",          // one distinct shingle
      "ab",                    // shorter than n → single short window
      "",                      // empty → single empty window
      "tab\tand  spaces here")
    val got = texts.toDF("t").select(
      graft.functions.DistinctShingles(col("t"), 5).as("native"),
      TextDedup.shingles(col("t"), 5).as("hof")).collect()
    got.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"native=${r.getSeq[String](0)} hof=${r.getSeq[String](1)}")
    }
  }

  test("SortedLongJaccard over ShingleHashSorted is bit-equal to per-pair ShingleJaccard") {
    // the d02 verify stage relies on this: precomputing each doc's
    // sorted shingle-hash set and merging must give EXACTLY the value
    // the per-pair hash-set form gives, including degenerate lengths
    val rnd = new scala.util.Random(7)
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    def doc() = Seq.fill(rnd.nextInt(40))(words(rnd.nextInt(words.length))).mkString(" ")
    val pairs = Seq(
      ("", ""), ("", "abcdef"), ("ab", "ab"), ("abcd", "abcde"),
      ("The Quick BROWN fox", "the quick brown fox")) ++
      Seq.fill(50)((doc(), doc()))
    val df = pairs.toDF("x", "y")
    val got = df.select(
      graft.functions.ShingleJaccard(col("x"), col("y"), 5).as("perPair"),
      graft.functions.SortedLongJaccard(
        graft.functions.ShingleHashSorted(col("x"), 5),
        graft.functions.ShingleHashSorted(col("y"), 5)).as("precomp"))
      .collect()
    got.foreach(r => assert(r.getDouble(0) == r.getDouble(1),
      s"perPair=${r.getDouble(0)} precomp=${r.getDouble(1)}"))
  }

  test("ShingleHashSorted output is sorted and distinct") {
    val df = Seq("aaaaaaaaaa", "the cat sat on the mat", "").toDF("x")
    df.select(graft.functions.ShingleHashSorted(col("x"), 5).as("sh"))
      .collect().foreach { r =>
        val arr = r.getSeq[Long](0)
        assert(arr.nonEmpty)
        assert(arr == arr.sorted, "not sorted")
        assert(arr.distinct.size == arr.size, "not distinct")
      }
    // repeated-content doc: many windows, few distinct shingles
    val rep = df.filter(col("x") === "aaaaaaaaaa")
      .select(graft.functions.ShingleHashSorted(col("x"), 5)).head.getSeq[Long](0)
    assert(rep.size == 1)
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

  test("simhashBlockPairKeys: 28 keys, recall 1 for hamming <= 6 (pigeonhole)") {
    // adversarial pairs: flip exactly 6 bits chosen to dirty 6 distinct
    // bytes (the pigeonhole worst case), plus randoms from a fixed seed
    val rnd = new scala.util.Random(7)
    val adversarial = Seq.tabulate(20) { _ =>
      val base = rnd.nextLong()
      val bytes = rnd.shuffle((0 until 8).toList).take(6)
      val flipped = bytes.foldLeft(base)((v, b) => v ^ (1L << (b * 8 + rnd.nextInt(8))))
      (base, flipped)
    }
    val random = Seq.tabulate(20)(_ => (rnd.nextLong(), rnd.nextLong()))
    val df = (adversarial ++ random).toDF("a", "b")
    val rows = df.select(
      TextDedup.hamming64(col("a"), col("b")).as("h"),
      arrays_overlap(TextDedup.simhashBlockPairKeys(col("a")),
        TextDedup.simhashBlockPairKeys(col("b"))).as("collides"),
      size(TextDedup.simhashBlockPairKeys(col("a"))).as("n"))
      .collect()
    rows.foreach { r =>
      assert(r.getInt(2) === 28)
      if (r.getInt(0) <= 6)
        assert(r.getBoolean(1), s"hamming ${r.getInt(0)} pair must collide on a byte-pair key")
    }
    // at least the 20 adversarial pairs exercised the h <= 6 branch
    assert(rows.count(_.getInt(0) <= 6) >= 20)
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

  test("densifyOph: identity on full signatures, borrow+offset on empty bins") {
    // sig with bins 1,3 empty: bin 1 borrows bin 2 (t=1 → 30+1), bin 3
    // borrows bin 0 circularly (t=1 → 10+1); full bins untouched
    val sig = Seq(Seq(10L, Long.MaxValue, 30L, Long.MaxValue)).toDF("sig")
    val dense = sig.select(TextDedup.densifyOph(col("sig"), 4)).head.getSeq[Long](0)
    assert(dense === Seq(10L, 31L, 30L, 11L))
    // all-empty stays all-sentinel (a doc with no shingles)
    val empty = Seq(Seq.fill(4)(Long.MaxValue)).toDF("sig")
    assert(empty.select(TextDedup.densifyOph(col("sig"), 4)).head.getSeq[Long](0)
      === Seq.fill(4)(Long.MaxValue))
  }

  test("native OphSig equals the densified HOF OPH form on ASCII text") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "short",                       // far fewer shingles than bins
      "ab",                          // shorter than the shingle width
      "",
      "MiXeD CaSe and punctuation!! with   spaces")
    val df = texts.toDF("text")
    val got = df.select(
      graft.functions.OphSig(col("text"), 5, 32).as("native"),
      TextDedup.densifyOph(
        TextDedup.ophSignature(TextDedup.shingleHashes(col("text"), 5), 32), 32)
        .as("hof"))
      .collect()
    got.zip(texts).foreach { case (r, t) =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1), s"mismatch for '$t'")
    }
    // identical docs → identical signatures; distinct docs → distinct
    val sigs = df.select(graft.functions.OphSig(col("text"), 5, 32)).collect()
      .map(_.getSeq[Long](0))
    assert(sigs.distinct.length === texts.length)
  }

  test("densification tames the short-doc sentinel-band explosion; recall holds") {
    // 60 SHORT docs (~40 chars, 64 bins → many empty bins): raw OPH
    // shares sentinel bands across unrelated docs; densified must not.
    // Every word embeds the doc number so UNRELATED docs share almost
    // no shingles (cross-doc jaccard ≈ 0.1, far below the banding
    // threshold) — any raw-OPH candidate between them is the sentinel
    // artifact, not genuine similarity.
    val texts = (0 until 30).flatMap { i =>
      val rnd = new scala.util.Random(i)
      val base = Seq.fill(4)(
        Seq.fill(8)(('a' + rnd.nextInt(26)).toChar).mkString).mkString(" ")
      Seq((i.toLong, base), (i + 100L, base + " x"))
    }
    val d = texts.toDF("doc_id", "text").cache()
    val sh = d.select(col("doc_id"), TextDedup.shingles(col("text"), 5).as("sh"))
    val a = sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val b = sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
    val truth = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("j", TextDedup.jaccard(col("sh_a"), col("sh_b")))
      .filter(col("j") >= 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty)

    def candidates(sigs: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      TextDedup.candidatePairs(
        TextDedup.lshBuckets(sigs, "doc_id", "sig", bands = 16, rowsPerBand = 4),
        "doc_id").as[(Long, Long)].collect().toSet

    val raw = candidates(d.select(col("doc_id"),
      TextDedup.ophSignature(TextDedup.shingleHashes(col("text"), 5), 64).as("sig")))
    val dense = candidates(d.select(col("doc_id"),
      graft.functions.OphSig(col("text"), 5, 64).as("sig")))

    // recall contract (j >= 0.8 pairs are candidates) holds densified
    assert(truth.subsetOf(dense), s"densified OPH missed: ${truth.diff(dense)}")
    // and the sentinel explosion is gone: raw candidates ~ all pairs,
    // densified stays near the true near-dup set
    assert(raw.size > 4 * dense.size,
      s"expected raw sentinel explosion (raw=${raw.size}, dense=${dense.size})")
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

  test("candidatePairsAcross: probe meets only bucket-sharing index docs, " +
      "orientation preserved, cross recall holds") {
    // index: docs 0,2 near-dup bases; probe: 1 copies 0's text, 3 is
    // unrelated. The probe must surface (1→0) and never an
    // index-index or probe-probe pair.
    val rows = Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "completely different corpus text about something else entirely"),
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "unrelated probe content that matches nothing in the index"))
    val d = rows.toDF("doc_id", "text")
      .select(col("doc_id"), TextDedup.shingles(col("text"), 5).as("sh"))
    val sigs = d.select(col("doc_id"),
      TextDedup.minHashSignature(col("sh"), 64).as("sig"))
    def buckets(f: org.apache.spark.sql.DataFrame) =
      TextDedup.lshBuckets(f, "doc_id", "sig", bands = 16, rowsPerBand = 4)
    val cand = TextDedup.candidatePairsAcross(
        buckets(sigs.filter(col("doc_id") % 2 === 1)),
        buckets(sigs.filter(col("doc_id") % 2 === 0)), "doc_id")
      .as[(Long, Long)].collect().toSet
    assert(cand.contains((1L, 0L)), "identical probe doc missed its index twin")
    // orientation: probe ids are odd, index ids even — never mixed
    assert(cand.forall { case (p, i) => p % 2 == 1 && i % 2 == 0 })
  }
}
