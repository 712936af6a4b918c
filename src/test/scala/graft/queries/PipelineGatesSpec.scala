package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Planted-data tests for the d10 (duplicate passages) and p07
  * (temperature mixing) gates: each test writes a tiny
  * `documents.parquet` with hand-computable structure into a temp SF
  * dir and checks the gate output against the hand computation — the
  * oracle gate then re-proves the same logic against DuckDB at
  * sf0.01, so together the two pin both the semantics and the
  * cross-engine reproducibility.
  */
class PipelineGatesSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpSf(rows: Seq[(Long, String, String, String, Long)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_gates").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("t26 fixture reaches the realistic-vocabulary regime: >=10k " +
      "dict entries, the full k merge rounds (un-exhausted), 200 docs") {
    // the point of t26 (VERDICT r14 #6): the sf corpora train 31
    // words / 89 possible merges, so the toy gates never exercise an
    // un-exhausted production-k run or a five-figure broadcast dict —
    // this pins that the fixture actually reaches that regime
    val out = PipelineQueries.bpe_encode_large(spark,
      "/root/testdata/sf0.001").collect()
    assert(out.length == 200, s"fixture doc count drifted: ${out.length}")
    val art = PipelineQueries.t21BpePath(PipelineQueries.t26CorpusPath)
    val dictN = spark.read.parquet(s"$art/dict").count()
    assert(dictN >= 10000L,
      s"t26 dictionary has $dictN entries — below the realistic-vocab bar")
    val mergesN = spark.read.parquet(s"$art/merges").count()
    assert(mergesN == PipelineQueries.bpeMergeRounds.toLong,
      s"t26 training exhausted at $mergesN merges — fixture too small " +
        "to exercise a full production-k run")
    // every doc's token count is strictly below its char-split count
    // somewhere: at least one merge must actually apply corpus-wide
    val sumTokens = out.map(_.getLong(3)).sum
    val sumChars = out.map(_.getLong(2)).sum
    assert(sumTokens < sumChars,
      "t26 merges never applied — token count equals char count")
  }

  test("incremental BPE trainer replays the naive full-recount loop " +
      "MERGE-FOR-MERGE on tie-heavy and overlap-heavy vocabularies") {
    // the incremental pair index is a pure optimization only if its
    // per-round selection is bit-identical to the recount — exercise
    // the hard cases: repeated-symbol overlaps (aaaa), weight ties
    // resolved by UTF-8 pair order, words that gain a pair only after
    // an earlier merge, and deep k that exhausts the vocabulary
    val vocabs = Seq(
      // overlap + ties
      Array(("aaaa", 3L), ("aab", 3L), ("bba", 3L), ("abab", 2L)),
      // deterministic pseudo-random: base-4 digit strings, skewed wf
      Array.tabulate(60) { i =>
        // multiply in Long then mask (i * <knuth>.toInt overflows Int
        // for i >= 2, yielding '-'-prefixed strings — round-14 ADVICE)
        val w = java.lang.Long.toString((i * 2654435761L) & 0xfffL, 4)
        (w, (i % 7 + 1).toLong)
      }.distinctBy(_._1),
      // every word same weight: every round is a pure tie-break test
      Array.tabulate(30)(i =>
        (java.lang.Integer.toString(i + 37, 3), 5L)).distinctBy(_._1))
    vocabs.zipWithIndex.foreach { case (wf0, vi) =>
      Seq(1, 5, 40, 200).foreach { k =>
        val (mi, si) = PipelineQueries.trainBpe(wf0, k)
        val (mn, sn) = PipelineQueries.trainBpeNaive(wf0, k)
        assert(mi == mn, s"vocab $vi k=$k: merge sequences diverge")
        assert(si.toSeq == sn.toSeq,
          s"vocab $vi k=$k: final symbolizations diverge")
      }
    }
  }

  test("p19 two-level concat-chunk equals p16's single-level form " +
      "row-for-row on a skewed planted corpus (bucket boundaries, " +
      "cross-bucket carry, single-row buckets)") {
    // doc_ids straddle the div-64 bucket boundary (63/64) and leave
    // bucket 2+ sparse; one lang dominates so the per-bucket offset
    // carry is exercised across three buckets
    val rows = (0L to 70L).map(i =>
      (i * 2, ("w " * ((i % 7).toInt + 1)).trim,
        if (i % 9 == 0) "de" else "en",
        "s", 1L)) :+ (200L, "a b c", "en", "s", 1L)
    val dir = tmpSf(rows)
    val single = PipelineQueries.concat_chunk(spark, dir).collect().toSeq
    val two = PipelineQueries.concat_chunk_scale(spark, dir).collect().toSeq
    assert(two == single)
  }

  test("d02/d13 verify-join regimes agree: the large-corpus SHUFFLE_HASH " +
      "path returns exactly the broadcast path's pair set") {
    // The big regime only activates past VerifyBroadcastMaxDocs docs,
    // which no gate SF reaches — this pins its correctness by forcing
    // it (claimed nDocs = Long.MaxValue) on the sf0.001 corpus and
    // comparing row-for-row against the broadcast regime the oracle
    // gate covers.
    val dir = "/root/testdata/sf0.001"
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val sigs = d.select(col("doc_id"),
      graft.functions.MinHashSig(col("text"), 5, 64).as("sig"))
    val cand = graft.operators.TextDedup.candidatePairs(
      graft.operators.TextDedup.lshBuckets(
        sigs, "doc_id", "sig", bands = 16, rowsPerBand = 4), "doc_id")
    val t = d.select(col("doc_id"),
      graft.functions.ShingleHashSorted(col("text"), 5).as("sh"))
    def result(nDocs: Long) =
      PipelineQueries.lshVerifyJoin(cand, t, nDocs)
        .withColumn("inter",
          graft.functions.SortedLongIntersect(col("sh_a"), col("sh_b")))
        .withColumn("un", size(col("sh_a")) + size(col("sh_b")) - col("inter"))
        .filter(col("inter").cast("double") / col("un") >= 0.8)
        .select("id_a", "id_b", "inter", "un")
        .orderBy("id_a", "id_b")
        .collect().toSeq
    val bc = result(1L)
    val shj = result(Long.MaxValue)
    assert(bc.nonEmpty, "regime-equality test ran on an empty pair set")
    assert(shj == bc, "SHUFFLE_HASH verify regime diverged from broadcast")
  }

  test("d17 edit_distance_neardup: corpus-wide length-band blocking " +
      "finds band-straddling pairs once; |Δlen|>k and dist>k excluded") {
    // ids 0/100/200/300/400 are FAR apart — any ±window candidate
    // generator would miss every pair; only corpus-wide length
    // banding finds them. base len 100 → bucket 6 (k=16); doc 200
    // len 115 → bucket 7, so (0,200) straddles adjacent bands and
    // must still surface exactly once. doc 300 (len 117) fails the
    // length invariant vs docs 0/100 (Δlen 17) even though
    // bucket-adjacent, yet still pairs with 200 (Δlen 2, dist 2) —
    // the invariant excludes per-PAIR, not per-doc. doc 400 shares
    // length 100 but is content-disjoint, so the banded Levenshtein
    // hits the threshold diagonal and returns −1.
    val base = "abcdefghij" * 10
    val dir = tmpSf(Seq(
      (0L, base, "en", "s", 1L),
      (100L, base.dropRight(1) + "Z", "en", "s", 1L),
      (200L, base + "z" * 15, "en", "s", 1L),
      (300L, base + "z" * 17, "en", "s", 1L),
      (400L, "qrstuvwxyz" * 10, "en", "s", 1L)))
    val out = PipelineQueries.edit_distance_neardup(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(out == Map((0L, 100L) -> 1, (0L, 200L) -> 15,
      (100L, 200L) -> 16, (200L, 300L) -> 2))

    // d18 composed blocking must reach the identical pair set on the
    // same fixture: the base-variant docs are shingle-similar (J well
    // above the banding S-curve knee) so the content key keeps them,
    // and doc 400 — same LENGTH as doc 0, so a guaranteed d17
    // candidate — shares no 5-shingle with any other doc and must be
    // dropped at candidate time by the content key, not at verify.
    val blocked = PipelineQueries.edit_distance_blocked(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(blocked == out, "composed blocking diverged from length-band")
    val lshCand = PipelineQueries.editLshCandidates(spark, dir, 16)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!lshCand.exists(p => p._1 == 400L || p._2 == 400L),
      "content-disjoint doc leaked into the LSH candidate set")
  }

  test("d19 exact_substrings: maximal cross-doc spans merge; " +
      "single-doc internal repeats and sub-L docs are excluded") {
    // 50 non-periodic shared chars embedded at position 6 in two docs
    // with different flanks → exactly the 11 fully-contained 40-char
    // windows are shared, merging into ONE maximal span (6, 50) per
    // doc. doc 2 repeats a 40-gram INTERNALLY (z×45) but no other doc
    // has it — countDistinct(doc) ≥ 2 must exclude it. doc 3 is
    // shorter than L and never enters the window pass.
    val shared = (('a' to 'z') ++ ('0' to '9') ++ ('a' to 'n')).mkString
    val dir = tmpSf(Seq(
      (0L, "AAAAA" + shared + "CCCCC", "en", "s", 1L),
      (1L, "DDDDD" + shared + "EEEEE", "en", "s", 1L),
      (2L, "z" * 45, "en", "s", 1L),
      (3L, "tiny", "en", "s", 1L)))
    val got = PipelineQueries.exact_substrings(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((0L, 6L, 50L), (1L, 6L, 50L)))
  }

  test("d20 exact_substr_cut: min-owner keeps, duplicates excised exactly; " +
      "overlapping islands union before the splice; non-ASCII and sub-L " +
      "docs pass through; re-running d19 on the cleaned corpus is EMPTY") {
    // P1 = d×20 e×20 and P2 = e×20 f×20 sit apart in owner doc 0 but
    // OVERLAP inside doc 1's d×20 e×20 f×20 block: doc 1's marked
    // starts {6, 26} form two islands whose char spans [6,45] and
    // [26,65] overlap — the interval union must cut [6,65] once (60
    // chars), not double-count. Doc 3 cuts doc 2's z-block exactly.
    // Doc 4 contains the same z-block but is non-ASCII (byte≠char), so
    // it never enters the window machinery and passes through uncut.
    val p1 = "d" * 20 + "e" * 20
    val p2 = "e" * 20 + "f" * 20
    val dir = tmpSf(Seq(
      (0L, "q" * 10 + p1 + "r" * 10 + p2 + "s" * 10, "en", "s", 1L),
      (1L, "t" * 5 + "d" * 20 + "e" * 20 + "f" * 20 + "u" * 5, "en", "s", 1L),
      (2L, "v" * 8 + "z" * 45 + "w" * 12, "en", "s", 1L),
      (3L, "x" * 10 + "z" * 45 + "y" * 10, "en", "s", 1L),
      (4L, "é" + "z" * 45 + "é", "en", "s", 1L),
      (5L, "tiny", "en", "s", 1L)))
    val got = PipelineQueries.exact_substr_cut(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (0L, "q" * 10 + p1 + "r" * 10 + p2 + "s" * 10, 0L), // owner keeps
      (1L, "t" * 5 + "u" * 5, 60L),                       // unioned cut
      (2L, "v" * 8 + "z" * 45 + "w" * 12, 0L),            // owner keeps
      (3L, "x" * 10 + "y" * 10, 45L),                     // exact block cut
      (4L, "é" + "z" * 45 + "é", 0L),                     // non-ASCII guard
      (5L, "tiny", 0L)))                                  // sub-L
    // fixed point (the Lee et al. contract): the cleaned corpus has no
    // cross-doc duplicated span left — on the planted corpus AND on
    // the real sf0.001 corpus
    def assertFixedPoint(srcDir: String): Unit = {
      val cleanedDir =
        java.nio.file.Files.createTempDirectory("graft_d20fp").toString
      try {
        PipelineQueries.exact_substr_cut(spark, srcDir)
          .select(col("doc_id"), col("clean_text").as("text"),
            lit("en").as("lang"), lit("s").as("source"),
            length(col("clean_text")).cast("long").as("n_chars"))
          .write.mode("overwrite").parquet(s"$cleanedDir/documents.parquet")
        val residual =
          PipelineQueries.exact_substrings(spark, cleanedDir).count()
        assert(residual == 0L,
          s"$residual cross-doc spans survive the cut in $srcDir — " +
            "exact_substr_cut is not a d19 fixed point")
      } finally org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(cleanedDir))
    }
    assertFixedPoint(dir)
    assertFixedPoint("/root/testdata/sf0.001")
  }

  test("s14 post-filter ANN: answers are eligible; the over-fetch loss " +
      "is real at this k'; and whenever the exact filtered top-1 made " +
      "the shortlist, s14 returns exactly it") {
    val dir = "/root/testdata/sf0.01"
    assume(new java.io.File(dir).isDirectory)
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val eligIds = d.filter(col("lang") === "en" && col("source") === "src3")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val post = PipelineQueries.filtered_ann_post(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(post.values.forall(eligIds), "a returned neighbor fails the predicate")
    assert(post.size < 10,
      "every query answered — k' over-fetch never lost a query, the " +
        "lossy regime this gate exists to pin is not exercised")
    // exact pre-filter answer (s13's strategy at the same predicate)
    val corpus = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = corpus.filter(col("vec_id") < 10)
    val exact = graft.operators.Similarity.ivfTopK(
        corpus.join(d.filter(col("lang") === "en" && col("source") === "src3")
          .select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi"),
        queries, k = 1, blockCol = "label")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    // shortlist membership decides agreement: if the true top-1 was
    // over-fetched, post-filter MUST return it; if it wasn't, the
    // query either misses or returns a strictly lower-ranked eligible
    val total = d.count(); val nElig = eligIds.size
    val kPrime = ((total + nElig - 1) / nElig).toInt
    val shortlist = graft.operators.Similarity
      .ivfTopK(corpus, queries, k = kPrime, blockCol = "label")
      .collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    exact.foreach { case (q, best) =>
      if (shortlist.getOrElse(q, Set.empty).contains(best))
        assert(post.get(q).contains(best),
          s"query $q: exact answer $best was in the top-$kPrime " +
            s"shortlist but s14 returned ${post.get(q)}")
      else assert(post.get(q) != Some(best))
    }
  }

  test("t24 dsir_weights: target-vocab docs score positive, off-domain " +
      "negative, mixed in between; ordering follows target-token share") {
    // disjoint vocabularies in distinct md5 buckets (alpha/bravo/charlie
    // = 35/30/9; delta/echo/foxtrot = 56/24/49 — precomputed, no
    // collisions): src0 is the target domain, so its vocabulary's
    // buckets get positive log-ratios and the off-domain buckets,
    // present in raw but absent from target, get negative ones
    // counts must dominate the add-one smoothing mass (B = 64), so
    // each doc carries ~60 tokens — with 4-token docs every smoothed
    // target probability sits below raw and all scores go negative
    val t3 = Seq.fill(20)("alpha bravo charlie").mkString(" ")
    val o3 = Seq.fill(20)("delta echo foxtrot").mkString(" ")
    val mix = Seq.fill(10)("alpha bravo delta echo").mkString(" ")
    val dir = tmpSf(Seq(
      (0L, t3, "en", "src0", 1L),
      (1L, t3, "en", "src0", 1L),
      (2L, o3, "en", "src9", 1L),
      (3L, mix, "en", "src9", 1L))) // mixed
    val got = PipelineQueries.dsir_weights(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(got(0L) > 0 && got(1L) > 0,
      s"target-domain docs must score positive: $got")
    assert(got(2L) < 0, s"off-domain doc must score negative: $got")
    assert(got(2L) < got(3L) && got(3L) < got(0L),
      s"mixed doc must sit between pure off-domain and pure target: $got")
  }

  test("p17 epoch_interleave: key order round-robins live sources, " +
      "within-source order is the md5 shuffle, keys strictly increase " +
      "with rank") {
    val dir = tmpSf(Seq(
      (0L, "a", "en", "sA", 1L), (1L, "b", "en", "sA", 1L),
      (2L, "c", "en", "sA", 1L), (3L, "d", "en", "sB", 1L),
      (4L, "e", "en", "sB", 1L), (5L, "f", "en", "sC", 1L)))
    val got = PipelineQueries.epoch_interleave(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // keys unique; per source strictly increasing with rank; the first
    // |sources| rows in key order cover every source exactly once, and
    // sources stay interleaved while live (no two consecutive equal
    // sources in the prefix where all three remain)
    assert(got.map(_._4).distinct.length == got.length)
    got.groupBy(_._2).values.foreach { ds =>
      assert(ds.sortBy(_._3).map(_._4).sliding(2).forall(p =>
        p.length < 2 || p(0) < p(1)))
    }
    val inOrder = got.sortBy(_._4).map(_._2)
    assert(inOrder.take(3).toSet == Set("sA", "sB", "sC"))
    assert(inOrder.take(5).sliding(2).forall(p => p(0) != p(1)),
      s"sources not interleaved while live: ${inOrder.mkString(",")}")
  }

  test("p16 concat_chunk: per-group running offsets, examples slice " +
      "ACROSS doc boundaries, partial tail emitted, groups independent") {
    def words(n: Int) = Seq.fill(n)("w").mkString(" ")
    // en stream: doc0 = 100 tok [ex 0], doc2 = 60 tok straddles the
    // 128 boundary [ex 0..1], doc4 = 5 tok in the partial tail [ex 1];
    // de: doc1 = 130 tok alone straddles [ex 0..1]
    val dir = tmpSf(Seq(
      (0L, words(100), "en", "s", 1L),
      (1L, words(130), "de", "s", 1L),
      (2L, words(60), "en", "s", 1L),
      (4L, words(5), "en", "s", 1L)))
    val got = PipelineQueries.concat_chunk(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      ("de", 1L, 130L, 0L, 0L, 1L),
      ("en", 0L, 100L, 0L, 0L, 0L),
      ("en", 2L, 60L, 100L, 0L, 1L),
      ("en", 4L, 5L, 160L, 1L, 1L)))
    // conservation: within each group, offsets tile the stream with no
    // gap or overlap, and example ranges are monotone in doc order
    got.groupBy(_._1).foreach { case (_, ds) =>
      val sorted = ds.sortBy(_._2)
      sorted.foldLeft(0L) { case (expOff, (_, _, n, off, fe, le)) =>
        assert(off == expOff, "offset gap/overlap in the packed stream")
        assert(fe == off / 128 && le == (off + n - 1) / 128)
        off + n
      }
    }
  }

  test("p15 shard_manifest: packing grain, source diversity, and the " +
      "order-canonical membership checksum") {
    // lang en: 3 docs of 2 tokens each under budget 2048 → one shard
    // with ids {0,2,4}, 2 distinct sources; lang de: doc 1 alone.
    // The checksum must be md5 of the SORTED comma-joined id list.
    val dir = tmpSf(Seq(
      (4L, "a b", "en", "s1", 1L),   // deliberately out of id order
      (0L, "c d", "en", "s0", 1L),
      (1L, "e f", "de", "s0", 1L),
      (2L, "g h", "en", "s0", 1L)))
    val got = PipelineQueries.shard_manifest(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(7)))
    val md5en = java.security.MessageDigest.getInstance("MD5")
      .digest("0,2,4".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val md5de = java.security.MessageDigest.getInstance("MD5")
      .digest("1".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got.toSeq == Seq(
      ("de", 0L, 1L, 2L, 1L, md5de),
      ("en", 0L, 3L, 6L, 2L, md5en)))
  }

  test("t21 bpe_merges: greedy merge rounds — overlap handling, " +
      "merged symbols re-enter pair space, tie breaks on pair string") {
    // word freqs: "aaa"×5, "ab"×3, "cd"×2, "ce"×2.
    // round 1: (a,a) appears TWICE per "aaa" (overlap counted) = 10,
    //          (a,b)=3, (c,d)=2, (c,e)=2 → winner (a,a) w=10; greedy
    //          merge turns " a  a  a " into " aa  a " (one merge, not
    //          two — the double-delimiter replace must not chain).
    // round 2: ("aa","a")=5 beats (a,b)=3 — the merged symbol must
    //          re-enter pair space as a unit.
    // round 3: (a,b)=3 beats the (c,d)/(c,e) tie.
    // round 4: (c,d) and (c,e) tie at w=2 — pair-string ASC picks
    //          (c,d), the UTF-8 tie-break under test.
    // round 5: (c,e)=2, the last pair standing.
    // rounds 6..k: every word is one symbol — the trainer must STOP
    //          emitting (vocabulary exhausted = training complete),
    //          exactly like the oracle's cascade-empty rounds.
    val dir = tmpSf(Seq(
      (0L, "aaa aaa aaa", "en", "s", 1L),
      (1L, "aaa aaa ab", "en", "s", 1L),
      (2L, "ab ab cd cd", "en", "s", 1L),
      (3L, "ce ce", "en", "s", 1L)))
    val got = PipelineQueries.bpe_merges(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq((1, "a", "a", 10L), (2, "aa", "a", 5L),
      (3, "a", "b", 3L), (4, "c", "d", 2L), (5, "c", "e", 2L)))

    // t23 applies those merges: every word fully merged to 1 symbol —
    // per-doc (n_words, n_chars, n_tokens) must reflect the TRAINED
    // segmentation, not whitespace
    val enc = PipelineQueries.bpe_encode(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(enc.toSeq == Seq(
      (0L, 3L, 9L, 3L),    // aaa aaa aaa
      (1L, 3L, 8L, 3L),    // aaa aaa ab
      (2L, 4L, 8L, 4L),    // ab ab cd cd → all 1-symbol
      (3L, 2L, 4L, 2L)))   // ce ce → 1+1

    // degenerate corpus: every word a single code point → ZERO merges
    // is the consistent trained state (empty merges table, 1-symbol
    // dict), not an error — the oracle's all-empty b-CTEs plus the
    // encode chain's left joins reproduce exactly this
    val dir0 = tmpSf(Seq(
      (0L, "a b c", "en", "s", 1L), (1L, "b c a", "en", "s", 1L)))
    assert(PipelineQueries.bpe_merges(spark, dir0).count() == 0)
    val enc0 = PipelineQueries.bpe_encode(spark, dir0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(enc0.toSeq == Seq((0L, 3L, 3L, 3L), (1L, 3L, 3L, 3L)))
  }

  test("g12 incremental_components: chain merges through an unmapped " +
      "bridge doc; untouched components keep labels; edge-free docs stay out") {
    // Jaccard (≥0.6) components: {0,1} (identical), {4,5,6}
    // (J(4,5)=J(4,6)=10/15≈0.67, J(5,6)=1). Doc 3 ("a b c d e") is in
    // NO Jaccard pair (J(0,3)=0.5) but is CONTAINED in doc 0 and in
    // doc 4 (overlap 1.0 ≥ 0.9), so the containment batch bridges
    // comp 0 — doc 3 — comp 4 transitively through a doc ABSENT from
    // the old map. {30,31} duplicate each other only: their
    // containment edge projects to a same-component pair and must be
    // dropped, leaving the label untouched. Doc 50 has no edge of
    // either kind and must not appear at all.
    val dir = tmpSf(Seq(
      (0L, "a b c d e f g h i j", "en", "s", 1L),
      (1L, "a b c d e f g h i j", "en", "s", 1L),
      (3L, "a b c d e", "en", "s", 1L),
      (4L, "a b c d e p q r s t u v w x y", "en", "s", 1L),
      (5L, "p q r s t u v w x y", "en", "s", 1L),
      (6L, "p q r s t u v w x y", "en", "s", 1L),
      (30L, "m n o aa bb cc", "en", "s", 1L),
      (31L, "m n o aa bb cc", "en", "s", 1L),
      (50L, "zz yy xx ww vv uu", "en", "s", 1L)))
    val out = PipelineQueries.incremental_components(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(0L -> 0L, 1L -> 0L, 3L -> 0L, 4L -> 0L, 5L -> 0L,
      6L -> 0L, 30L -> 30L, 31L -> 30L))
  }

  test("g12 incremental maintenance equals full CC recompute over the " +
      "union edge set at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val allEdges = PipelineQueries.jaccard_pairs(spark, dir)
      .select("id_a", "id_b")
      .unionByName(PipelineQueries.containment_pairs(spark, dir))
      .distinct()
    val full = graft.operators.Dedup.connectedComponents(allEdges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val incr = PipelineQueries.incremental_components(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(incr.nonEmpty, "incremental map came back empty")
    assert(incr == full,
      "incremental component maintenance diverged from full recompute")
  }

  test("t20 memorization_spans: planted verbatim span yields the exact " +
      "window run; scattered hits count 1; clean doc counts 0") {
    // sf0.01 has no eval-set overlap (t20 is legitimately all-zero
    // there, like t18), so the islands logic gets its exactness pinned
    // on planted data: doc 0 (0 % 97 == 0 → eval) provides tokens
    // e1..e20; doc 1 embeds a verbatim 15-token copy (e3..e17) between
    // noise, so windows starting at each of the 8 positions fully
    // inside the span hit → ONE island of 8. Doc 2 has two 8-token
    // verbatim fragments separated by noise → two islands of 1. Doc 3
    // is clean.
    val e = (1 to 20).map(i => s"tok$i")
    val span = e.slice(2, 17) // e3..e17, 15 tokens
    val frag1 = e.slice(2, 10) // e3..e10, 8 tokens = exactly 1 window
    val frag2 = e.slice(4, 12) // e5..e12
    val dir = tmpSf(Seq(
      (0L, e.mkString(" "), "en", "s", 1L),
      (1L, (Seq("x1", "x2", "x3", "x4", "x5") ++ span ++
        Seq("y1", "y2", "y3")).mkString(" "), "en", "s", 1L),
      (2L, (frag1 ++ Seq("z1", "z2", "z3", "z4") ++ frag2).mkString(" "),
        "en", "s", 1L),
      (3L, (1 to 10).map(i => s"clean$i").mkString(" "), "en", "s", 1L)))
    val out = PipelineQueries.memorization_spans(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 8L, 2L -> 1L, 3L -> 0L))
  }

  test("d10 dup_passages: planted shared span is counted window-exactly") {
    // doc 0: 10 tokens a0..a9            -> 3 windows, none duplicated
    // doc 1: 9 tokens  b0..b5 s0 s1 s2   -> 2 windows
    // doc 2: 9 tokens  s0 s1 s2 c0..c5   -> 2 windows
    // docs 1 and 2 share only a 3-token span — shorter than the
    // 8-token window, so STILL no duplicated window (span-level
    // sensitivity: only full 8-token agreement counts)
    // doc 3: exact copy of doc 0         -> all 3 windows duplicated,
    //                                       and doc 0's flip to duplicated too
    // doc 4: 7 tokens                    -> below window width, absent
    val a = (0 until 10).map("a" + _).mkString(" ")
    val d = tmpSf(Seq(
      (0L, a, "en", "src0", 1L),
      (1L, ((0 until 6).map("b" + _) ++ Seq("s0", "s1", "s2")).mkString(" "), "en", "src0", 1L),
      (2L, (Seq("s0", "s1", "s2") ++ (0 until 6).map("c" + _)).mkString(" "), "en", "src0", 1L),
      (3L, a, "en", "src1", 1L),
      (4L, (0 until 7).map("d" + _).mkString(" "), "en", "src0", 1L)))
    val got = PipelineQueries.dup_passages(spark, d)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 3L, 3L), (1L, 2L, 0L), (2L, 2L, 0L), (3L, 3L, 3L)))
  }

  test("t13 bigram_lm: micro-corpus equals a BigDecimal reference") {
    // corpus: doc0 = "a b a b" (bigrams ab, ba, ab), doc1 = "a b".
    // bf(a,b)=3, bf(b,a)=1; pf(a)=3, pf(b)=1; V=2.
    val d = tmpSf(Seq(
      (0L, "a b a b", "en", "src0", 1L),
      (1L, "a b", "en", "src0", 1L)))
    val got = PipelineQueries.bigram_lm(spark, d)
      .as[(Long, Long, Double)].collect().toSeq
    def log2(x: Double) = math.log(x) / math.log(2.0)
    def r(x: Double, p: Int) = BigDecimal(x)
      .setScale(p, BigDecimal.RoundingMode.HALF_UP).toDouble
    val wAB = r(log2(4.0) - log2(5.0), 9)  // P(b|a) = (3+1)/(3+2)
    val wBA = r(log2(2.0) - log2(3.0), 9)  // P(a|b) = (1+1)/(1+2)
    val doc0 = r((Seq(2 * wAB, wBA).sorted.sum) / 3.0, 4)
    val doc1 = r(wAB / 1.0, 4)
    assert(got == Seq((0L, 3L, doc0), (1L, 1L, doc1)))
  }

  test("p08 curriculum: decile balance, batch sweep, full coverage") {
    // 43 docs with token counts 1..43: deciles of sizes 5,5,5,4,...
    // (SQL ntile remainder-to-first), batches take one doc per decile
    val rows = (0L until 43L).map(i =>
      (i, (0 to i.toInt).map(_ => "w").mkString(" "), "en", "src0", 1L))
    val d = tmpSf(rows)
    val got = PipelineQueries.curriculum(spark, d)
      .as[(Long, Long, Int, Long)].collect().toSeq
    assert(got.map(_._1).toSet == (0L until 43L).toSet) // every doc once
    val sizes = got.groupBy(_._3).view.mapValues(_.size).toMap
    assert((1 to 3).forall(sizes(_) == 5) && (4 to 10).forall(sizes(_) == 4))
    // token counts are non-decreasing across decile boundaries
    val maxPerDecile = got.groupBy(_._3).view.mapValues(_.map(_._2).max).toMap
    val minPerDecile = got.groupBy(_._3).view.mapValues(_.map(_._2).min).toMap
    (1 to 9).foreach(dc => assert(maxPerDecile(dc) <= minPerDecile(dc + 1)))
    // batches are 1..size(decile) within each decile
    got.groupBy(_._3).foreach { case (_, g) =>
      assert(g.map(_._4).sorted == (1L to g.size.toLong))
    }
  }

  test("d11 keep_best: elects the max-quality doc per component; " +
      "singletons keep themselves") {
    // docs 0 and 1 are near-dups (Jaccard 10/13 ≈ 0.77 ≥ 0.6 within
    // the id window); doc 50 is a singleton outside every pair
    val rows = Seq(
      (0L, "the and of to a in is it alpha beta", "en", "src0", 1L),
      (1L, "the and of to a in is it alpha beta zzz !!!! ????", "en", "src0", 1L),
      (50L, "lonely document completely different tokens here", "en", "src0", 1L))
    val d = tmpSf(rows)
    val got = PipelineQueries.neardup_keep_best(spark, d)
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(got.map(_._1) == Seq(0L, 1L, 50L))
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId(0L)._2 == 0L && byId(1L)._2 == 0L) // one comp, min-id label
    assert(byId(50L)._2 == 50L && byId(50L)._3 == 50L && byId(50L)._4)
    // the elected doc is the argmax of (quality, -id), recomputed
    // through the same scorer the operator uses
    val q = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"),
        graft.functions.TextFunctions.qualityScore(col("text")).as("q"))
      .as[(Long, Double)].collect().toMap
    val expectKept = Seq(0L, 1L).maxBy(id => (q(id), -id))
    assert(byId(0L)._3 == expectKept && byId(1L)._3 == expectKept)
    assert(got.count(_._4) == 2) // exactly one kept per component
    assert(byId(expectKept)._4 && !byId(1L - expectKept)._4)
  }

  test("p12 soft_dedup: singleton always kept; pair coins match the " +
      "integer md5 rule") {
    val doc0 = "the word dog the ink word word oak the"
    val doc1 = "the word word dog the ink word word oak the"
    val d = tmpSf(Seq((0L, doc0, "en", "src0", 1L),
      (1L, doc1, "en", "src0", 1L),
      (50L, "lonely words only here", "en", "src0", 1L)))
    val got = PipelineQueries.soft_dedup(spark, d)
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    def u32(id: Long): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .take(4).map(b => f"${b & 0xff}%02x").mkString, 16)
    val expect = Seq(
      (0L, 0L, 2L, u32(0L) * 2 < 4294967296L),
      (1L, 0L, 2L, u32(1L) * 2 < 4294967296L),
      (50L, 50L, 1L, true)) // u32 < 2^32 always: singletons never drop
    assert(got == expect)
  }

  test("p11 curriculum_scale == p08 curriculum on all-distinct lengths") {
    // distinct token counts → the cut-point deciles coincide with
    // ntile's (cut ranks ARE ntile's bucket-end ranks), and the
    // two-level (decile, md5-prefix-bucket) rank must reproduce the
    // per-decile md5 row_number exactly — so the whole rows match
    val rows = (0L until 43L).map(i =>
      (i, (0 to i.toInt).map(_ => "w").mkString(" "), "en", "src0", 1L))
    val d = tmpSf(rows)
    val p08 = PipelineQueries.curriculum(spark, d)
      .as[(Long, Long, Int, Long)].collect().toSeq
    val p11 = PipelineQueries.curriculum_scale(spark, d)
      .as[(Long, Long, Int, Long)].collect().toSeq
    assert(p11 == p08)
  }

  test("p11 curriculum_scale: boundary ties land in the LOWER decile") {
    // 20 docs, ALL the same length: one cut value, every x > cut is
    // false → every doc is decile 1 and the batch rank sweeps 1..20
    // (ntile would split 2 per decile — the documented difference)
    val rows = (0L until 20L).map(i => (i, "a b c", "en", "src0", 1L))
    val d = tmpSf(rows)
    val got = PipelineQueries.curriculum_scale(spark, d)
      .as[(Long, Long, Int, Long)].collect().toSeq
    assert(got.forall(_._3 == 1))
    assert(got.map(_._4).sorted == (1L to 20L))
  }

  test("t15 cdc_chunks: boundaries exactly at md5-'0' tokens; " +
      "insertion shifts only one chunk") {
    // 'dog' / 'ink' / 'oak' have md5 starting '0' (boundary tokens —
    // each ENDS its chunk); 'the' / 'word' do not
    val doc0 = "the word dog the ink word word oak the"
    //          chunk0: the word dog | chunk1: the ink | chunk2: word word oak | chunk3: the
    val doc1 = "the word word dog the ink word word oak the" // +1 token in chunk0
    val d = tmpSf(Seq((0L, doc0, "en", "src0", 1L), (1L, doc1, "en", "src0", 1L)))
    val got = PipelineQueries.cdc_chunks(spark, d)
      .as[(Long, Long, Long, String)].collect().toSeq
    val c0 = got.filter(_._1 == 0L)
    assert(c0.map(c => (c._2, c._3)) == Seq((0L, 3L), (1L, 2L), (2L, 3L), (3L, 1L)))
    val c1 = got.filter(_._1 == 1L)
    assert(c1.map(c => (c._2, c._3)) == Seq((0L, 4L), (1L, 2L), (2L, 3L), (3L, 1L)))
    // the CDC property: the insertion changed ONLY chunk 0's hash —
    // every later chunk re-synchronized to an identical hash
    val h0 = c0.map(c => c._2 -> c._4).toMap
    val h1 = c1.map(c => c._2 -> c._4).toMap
    assert(h0(0L) != h1(0L))
    (1L to 3L).foreach(i => assert(h0(i) == h1(i), s"chunk $i diverged"))
  }

  test("d12 cdc_dup_chunks: re-synchronized chunks count as duplicates " +
      "despite the insertion") {
    // same planted pair as the t15 spec: doc1 = doc0 with one token
    // inserted in chunk 0 — chunks 1..3 re-align and hash equal, so
    // each doc has 4 chunks of which 3 are duplicated; doc 50 has none
    val doc0 = "the word dog the ink word word oak the"
    val doc1 = "the word word dog the ink word word oak the"
    val d = tmpSf(Seq((0L, doc0, "en", "src0", 1L),
      (1L, doc1, "en", "src0", 1L),
      (50L, "lonely words only here", "en", "src0", 1L)))
    val got = PipelineQueries.cdc_dup_chunks(spark, d)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 4L, 3L), (1L, 4L, 3L), (50L, 1L, 0L)))
  }

  test("m09 scene_cuts: fires exactly at the synth's mod-256 wraps") {
    val d = tmpSf((0L until 40L).map(i => (i, "t", "en", "src0", 1L)))
    val got = PipelineQueries.multimodal_scenes(spark, d)
      .as[(Long, Int, Long, Long, Long)].collect().toSeq
    val expected = (0L until 40L).flatMap { id =>
      val nf = (id % 13 + 16).toInt
      (1 until nf).flatMap { k =>
        val prev = (id + 17 * (k - 1)) % 256
        val cur = (id + 17 * k) % 256
        val jump = math.abs(cur - prev)
        if (jump >= 100) Some((id, k, prev, cur, jump)) else None
      }
    }
    assert(got == expected)
    assert(got.nonEmpty && got.forall(_._5 == 239)) // every wrap is |17-256|
  }

  test("t14 bpe_pairs: planted corpus matches hand-computed pair weights") {
    // "ab ab abc" + "ab" → wf: ab=3, abc=1. Pairs: ab→3+1=4, bc→1.
    val d = tmpSf(Seq(
      (0L, "ab ab abc", "en", "src0", 1L),
      (1L, "ab", "en", "src0", 1L)))
    val got = PipelineQueries.bpe_pairs(spark, d)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("ab", 4L), ("bc", 1L)))
  }

  test("g06 label_prop: LPA separates bridged clusters that CC merges") {
    // jaccardPairsRaw pairs docs whose word-set Jaccard >= 0.6 within
    // an id window of 20. Plant two 3-cliques of identical docs
    // (0,1,2 = "x x"-style clones; 10,11,12 = clones of another text)
    // plus a BRIDGE doc 5 sharing >= 0.6 with one member of each?
    // Keeping it simpler and fully hand-checkable: two disjoint
    // cliques — LPA must give each clique its min id as community,
    // and the two communities must stay distinct (CC over a bridged
    // graph would merge; the disjoint case pins the mode/tie rule).
    val a = "alpha beta gamma delta"
    val b = "one two three four five"
    val d = tmpSf(Seq(
      (0L, a, "en", "src0", 1L), (1L, a, "en", "src0", 1L),
      (2L, a, "en", "src0", 1L),
      (10L, b, "en", "src0", 1L), (11L, b, "en", "src0", 1L),
      (12L, b, "en", "src0", 1L)))
    val got = PipelineQueries.label_prop(spark, d)
      .as[(Long, Long)].collect().toMap
    // 3-clique, labels init to self; each round picks the smallest
    // most-frequent NEIGHBOR label. r1: 0 sees {1,2}→1, 1 sees {0,2}→0,
    // 2 sees {0,1}→0. r2: 0 sees {0,0}→0, 1 sees {1,0}→tie→0, 2 sees
    // {1,0}→0. r3: every neighborhood is all-0 → stable 0.
    assert(got(0L) == 0L && got(1L) == 0L && got(2L) == 0L)
    assert(got(10L) == 10L && got(11L) == 10L && got(12L) == 10L)
    assert(got.size == 6)
  }

  test("p09 chunking: 64-token windows at stride 48, short tail kept") {
    val d = tmpSf(Seq(
      (0L, (1 to 100).map("t" + _).mkString(" "), "en", "src0", 1L),
      (1L, (1 to 5).map("s" + _).mkString(" "), "en", "src0", 1L)))
    val got = PipelineQueries.chunk_docs(spark, d)
      .select("doc_id", "chunk_idx", "start_tok", "n_toks")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (0L, 0L, 1L, 64L), (0L, 1L, 49L, 52L), (0L, 2L, 97L, 4L),
      (1L, 0L, 1L, 5L)))
    // overlap invariant: consecutive chunks share exactly 16 planned
    // positions (start advances by 48 on a 64-wide window)
    val starts = got.filter(_._1 == 0L).map(_._3)
    assert(starts == Seq(1L, 49L, 97L))
  }

  test("p09 property: chunk spans tile every doc length exactly") {
    // one doc per length 1..200; invariants for all: starts at
    // 1+48i, 1 <= n_toks <= 64, last chunk ends at n, consecutive
    // chunks overlap by exactly 16 except a shorter tail
    val rows = (1 to 200).map(n =>
      (n.toLong, (1 to n).map("x" + _).mkString(" "), "en", "s", 1L))
    val d = tmpSf(rows)
    val got = PipelineQueries.chunk_docs(spark, d)
      .select("doc_id", "chunk_idx", "start_tok", "n_toks")
      .as[(Long, Long, Long, Long)].collect().toSeq.groupBy(_._1)
    (1 to 200).foreach { n =>
      val ch = got(n.toLong).sortBy(_._2)
      assert(ch.map(_._2) == ch.indices.map(_.toLong)) // contiguous idx
      ch.foreach { case (_, ci, st, nt) =>
        assert(st == 1 + 48 * ci && nt >= 1 && nt <= 64)
      }
      assert(ch.last._3 + ch.last._4 - 1 == n)   // tail reaches n
      assert(ch.size == (n - 1) / 48 + 1)
      ch.init.foreach { case (_, _, st, nt) => assert(st + nt - 1 >= st + 47) }
    }
  }

  test("p07 temperature_mix: sqrt-weighted budgets, md5-rank selection") {
    // sources: big=400 docs, small=4 docs. q = 20 and 2, sq = 22:
    //   target(big)   = floor(200·20/22) = 181  (the cut bites)
    //   target(small) = floor(200·2/22)  = 18   (> 4, keeps all)
    val rows = (0L until 400L).map(i => (i, s"t $i", "en", "big", 1L)) ++
      (400L until 404L).map(i => (i, s"t $i", "en", "small", 1L))
    val d = tmpSf(rows)
    val got = PipelineQueries.temperature_mix(spark, d)
      .as[(Long, String, Long)].collect().toSeq
    val bySource = got.groupBy(_._2)
    assert(bySource("big").size == 181)
    assert(bySource("small").size == 4)
    // ranks are 1..n contiguous within each source
    assert(bySource("big").map(_._3).sorted == (1L to 181L))
    // selection is EXACTLY the 181 lowest md5(doc_id) of the big source
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expectBig = (0L until 400L)
      .sortBy(i => (md5hex(i.toString), i))
      .take(181).toSet
    assert(bySource("big").map(_._1).toSet == expectBig)
    // determinism: a second run returns the identical selection
    val again = PipelineQueries.temperature_mix(spark, d)
      .as[(Long, String, Long)].collect().toSeq
    assert(again == got)
  }

  test("t16 token_entropy: closed-form docs") {
    // "a a b b": H = (2·(log2 4 − log2 2))·2 / 4 = 1.0
    // "a b c d": H = log2 4 = 2.0;  "a a a a": H = 0.0
    val d = tmpSf(Seq(
      (0L, "a a b b", "en", "s", 1L),
      (1L, "a b c d", "en", "s", 1L),
      (2L, "a a a a", "en", "s", 1L)))
    val got = PipelineQueries.token_entropy(spark, d)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((0L, 4L, 2L, 1.0), (1L, 4L, 4L, 2.0),
      (2L, 4L, 1L, 0.0)))
  }

  test("p13 group_split: components move together, singletons covered") {
    // docs 0,1,2 identical -> one component {0,1,2}; docs 30,31
    // distinct texts far apart -> singletons (outside the ±20 window
    // of anything similar)
    val d = tmpSf(Seq(
      (0L, "a b c d e", "en", "s", 1L),
      (1L, "a b c d e", "en", "s", 1L),
      (2L, "a b c d e", "en", "s", 1L),
      (30L, "p q r s t", "en", "s", 1L),
      (31L, "v w x y z", "en", "s", 1L)))
    val got = PipelineQueries.group_split(spark, d)
      .as[(Long, Long, String)].collect().toSeq
    assert(got.map(_._1).toSet == Set(0L, 1L, 2L, 30L, 31L))
    // every component carries exactly one split value
    got.groupBy(_._2).foreach { case (_, g) =>
      assert(g.map(_._3).distinct.size == 1)
    }
    assert(got.filter(_._1 <= 2L).map(_._2).toSet == Set(0L))
    assert(got.forall(r => Set("train", "val", "test").contains(r._3)))
  }

  test("g08 twohop: triangle reaches 2, isolated node absent") {
    val d = tmpSf(Seq(
      (0L, "a b c d e", "en", "s", 1L),
      (1L, "a b c d e", "en", "s", 1L),
      (2L, "a b c d e", "en", "s", 1L),
      (30L, "v w x y z", "en", "s", 1L)))
    val got = PipelineQueries.twohop(spark, d)
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((0L, 2L), (1L, 2L), (2L, 2L)))
  }

  test("t17 cms_estimate: never underestimates; exact when collision-free") {
    // corpus: "a"×8, "b"×4, "c"×2, "d"×1 spread over docs
    val d = tmpSf(Seq(
      (0L, "a a a a b b", "en", "s", 1L),
      (1L, "a a a a b b c", "en", "s", 1L),
      (2L, "c d", "en", "s", 1L)))
    val got = PipelineQueries.cms_estimate(spark, d)
      .as[(String, Long, Long)].collect().toSeq
    val byTerm = got.map(r => r._1 -> (r._2, r._3)).toMap
    assert(byTerm("a")._1 == 8L && byTerm("b")._1 == 4L &&
      byTerm("c")._1 == 2L && byTerm("d")._1 == 1L)
    // the CMS invariant: estimates NEVER undercount
    assert(got.forall { case (_, t, e) => e >= t })
    // w=16 with 4 terms: if md5 scatters these terms into distinct
    // cells in at least one row, the min is exact; verify by checking
    // each term whose estimate equals truth has a collision-free row,
    // and each inflated one does not (consistency of the grid math)
    val terms = Seq("a", "b", "c", "d")
    def cell(j: Int, t: String): Long = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest((j.toString + t).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md5.take(8), 16) % 16
    }
    val tf = Map("a" -> 8L, "b" -> 4L, "c" -> 2L, "d" -> 1L)
    val expected = terms.map { t =>
      t -> (0 until 4).map { j =>
        terms.filter(u => cell(j, u) == cell(j, t)).map(tf).sum
      }.min
    }.toMap
    got.foreach { case (t, _, e) => assert(e == expected(t),
      s"term $t: grid estimate $e != reference ${expected(t)}") }
  }

  test("g09 modularity: hand-computed triangle + pair, integer-exact") {
    // graph: triangle {0,1,2} (identical texts) + edge {30,31}; m=4.
    // 3 sync LPA rounds: the triangle converges to community 0; the
    // pair OSCILLATES (round 3 leaves 30↦31, 31↦30) — two singleton
    // communities whose shared edge is NOT intra. Contributions
    // (×4m² = ×64): triangle 4·4·3 − 6² = 12; each pair node
    // 4·4·0 − 1² = −1.
    val d = tmpSf(Seq(
      (0L, "a b c d e", "en", "s", 1L),
      (1L, "a b c d e", "en", "s", 1L),
      (2L, "a b c d e", "en", "s", 1L),
      (30L, "p q r s t", "en", "s", 1L),
      (31L, "p q r s t", "en", "s", 1L)))
    val got = PipelineQueries.modularity(spark, d)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 3L, 3L, 6L, 12L),
      (30L, 1L, 0L, 1L, -1L), (31L, 1L, 0L, 1L, -1L)))
    // sanity: Σ contrib / 4m² ∈ [-1, 1] (Q of this partition = 10/64)
    assert(got.map(_._5).sum == 10L)
  }

  test("t18 contamination_density: quoted eval fragment counted window-exactly") {
    // doc 0 (0 % 97 = 0) IS the eval set: tokens e0..e9 → windows
    // e0..e7, e1..e8, e2..e9. doc 1 quotes all 10 eval tokens after a
    // 2-token prefix: 12 tokens → 5 windows, of which exactly the 3
    // pure-eval windows match. doc 2 shares nothing → (1, 0).
    val ev = (0 until 10).map("e" + _).mkString(" ")
    val d = tmpSf(Seq(
      (0L, ev, "en", "s", 1L),
      (1L, "b0 b1 " + ev, "en", "s", 1L),
      (2L, (0 until 8).map("z" + _).mkString(" "), "en", "s", 1L)))
    val got = PipelineQueries.contamination_density(spark, d)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 5L, 3L), (2L, 1L, 0L)))
  }

  test("t19 js_divergence: zero for identical distributions, " +
      "BigDecimal reference for skewed sources") {
    def r(x: Double, p: Int) = BigDecimal(x)
      .setScale(p, BigDecimal.RoundingMode.HALF_UP).toDouble
    def log2(x: Double) = math.log(x) / math.log(2.0)
    // case 1: both sources have the same distribution -> JS = 0
    val same = tmpSf(Seq(
      (0L, "a a b", "en", "s1", 1L), (1L, "a a b", "en", "s2", 1L)))
    val g1 = PipelineQueries.js_divergence(spark, same)
      .as[(String, Long, Double)].collect().toSeq
    assert(g1 == Seq(("s1", 2L, 0.0), ("s2", 2L, 0.0)))
    // case 2: s1 = "a a b", s2 = "a b b" -> symmetric skew; replay
    // the exact summand arithmetic (round 9dp, sorted fold, round 4dp)
    val skew = tmpSf(Seq(
      (0L, "a a b", "en", "s1", 1L), (1L, "a b b", "en", "s2", 1L)))
    val g2 = PipelineQueries.js_divergence(spark, skew)
      .as[(String, Long, Double)].collect().toSeq
    def js(pa: Double, pb: Double): Double = {
      val (qa, qb) = (0.5, 0.5)
      def w(p: Double, q: Double): Double = {
        val m = (p + q) / 2.0
        r((if (p > 0) 0.5 * (p * (log2(p) - log2(m))) else 0.0)
          + 0.5 * (q * (log2(q) - log2(m))), 9)
      }
      r(Seq(w(pa, qa), w(pb, qb)).sorted.sum, 4)
    }
    val expected = js(2.0 / 3, 1.0 / 3)
    assert(g2 == Seq(("s1", 2L, expected), ("s2", 2L, js(1.0 / 3, 2.0 / 3))))
    // symmetric corpora have symmetric divergence
    assert(g2.head._3 == g2(1)._3)
    assert(expected > 0.0)
  }

  test("g10 cluster_histogram: triangle + singletons bucketed by size") {
    val d = tmpSf(Seq(
      (0L, "a b c d e", "en", "s", 1L),
      (1L, "a b c d e", "en", "s", 1L),
      (2L, "a b c d e", "en", "s", 1L),
      (30L, "p q r s t", "en", "s", 1L),
      (31L, "v w x y z", "en", "s", 1L)))
    val got = PipelineQueries.cluster_histogram(spark, d)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 2L), (3L, 1L, 3L)))
    // doc mass is conserved across the histogram
    assert(got.map(_._3).sum == 5L)
  }

  test("t27 perceptron_quality: matches an independent scalar replay " +
      "of the batch-perceptron epochs; epoch-1 update is the full sum") {
    // independent reference: same md5 bucket fold via MessageDigest,
    // same B=32+bias feature map, same E=3 batch epochs in plain
    // Scala maps — any drift in bucketing, the y·score ≤ 0 update
    // rule, or the sign(0) → −1 prediction boundary diverges
    val rows = Seq(
      (0L, "alpha beta gamma alpha", "en", "src0", 1L),  // y = +1
      (1L, "alpha beta", "en", "src3", 1L),              // y = +1
      (2L, "delta echo foxtrot", "en", "src9", 1L),      // y = -1
      (3L, "alpha delta", "en", "src7", 1L),             // y = -1
      (4L, "gamma gamma gamma", "en", "src4", 1L))       // y = +1
    val dir = tmpSf(rows)
    def bucket(w: String): Int = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(h.take(8), 16) % 32).toInt
    }
    val feats: Map[Long, Map[Int, Long]] = rows.map { case (id, text, _, _, _) =>
      val m = text.split("\\s+").groupBy(bucket).view
        .mapValues(_.length.toLong).toMap
      id -> (m + (32 -> 1L))
    }.toMap
    val ys: Map[Long, Long] = rows.map { case (id, _, _, src, _) =>
      id -> (if (Set("src0", "src1", "src2", "src3", "src4")(src)) 1L
             else -1L)
    }.toMap
    var w = Map.empty[Int, Long].withDefaultValue(0L)
    (1 to 3).foreach { _ =>
      val mis = feats.keys.filter { id =>
        val score = feats(id).map { case (b, c) => c * w(b) }.sum
        ys(id) * score <= 0L
      }
      mis.foreach { id =>
        feats(id).foreach { case (b, c) => w += b -> (w(b) + ys(id) * c) }
      }
    }
    val expect = rows.map(_._1).sorted.map { id =>
      val score = feats(id).map { case (b, c) => c * w(b) }.sum
      (id, ys(id), score, if (score > 0) 1L else -1L)
    }
    val got = PipelineQueries.perceptron_quality(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == expect)
    // the fixture exercises both label classes and both prediction
    // outcomes — otherwise the epochs never actually discriminate
    assert(got.map(_._2).toSet == Set(1L, -1L))
    assert(got.map(_._4).toSet == Set(1L, -1L),
      "degenerate fixture: every doc predicted the same class")
    // t28 rolls the same model to source grain — replay from the
    // scalar reference's final weights
    val srcOf = rows.map(r => r._1 -> r._4).toMap
    val evalExpect = rows.map(_._4).distinct.sorted.map { src =>
      val ids = rows.filter(_._4 == src).map(_._1)
      val preds = ids.map { id =>
        val score = feats(id).map { case (b, c) => c * w(b) }.sum
        if (score > 0) 1L else -1L
      }
      (src, ys(ids.head), ids.size.toLong,
        preds.count(_ == 1L).toLong,
        ids.zip(preds).count { case (id, p) => p == ys(id) }.toLong)
    }
    val evalGot = PipelineQueries.perceptron_eval(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(evalGot == evalExpect)
    assert(srcOf.values.toSet.size == evalGot.size) // one row per source
  }

  test("t29 classifier gate: drops the negatively-scored docs and " +
      "packs ONLY the survivors (sf corpora score all-positive, so " +
      "the threshold is pinned here on a discriminating fixture)") {
    // same fixture + scalar replay as the t27 test — it provably
    // produces BOTH prediction classes, so the score > 0 gate must
    // actually drop at least one doc
    val rows = Seq(
      (0L, "alpha beta gamma alpha", "en", "src0", 1L),
      (1L, "alpha beta", "en", "src3", 1L),
      (2L, "delta echo foxtrot", "en", "src9", 1L),
      (3L, "alpha delta", "en", "src7", 1L),
      (4L, "gamma gamma gamma", "en", "src4", 1L))
    val dir = tmpSf(rows)
    def bucket(w: String): Int = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(h.take(8), 16) % 32).toInt
    }
    val feats: Map[Long, Map[Int, Long]] = rows.map { case (id, text, _, _, _) =>
      val m = text.split("\\s+").groupBy(bucket).view
        .mapValues(_.length.toLong).toMap
      id -> (m + (32 -> 1L))
    }.toMap
    val ys: Map[Long, Long] = rows.map { case (id, _, _, src, _) =>
      id -> (if (Set("src0", "src1", "src2", "src3", "src4")(src)) 1L
             else -1L)
    }.toMap
    var w = Map.empty[Int, Long].withDefaultValue(0L)
    (1 to 3).foreach { _ =>
      val mis = feats.keys.filter { id =>
        val score = feats(id).map { case (b, c) => c * w(b) }.sum
        ys(id) * score <= 0L
      }
      mis.foreach { id =>
        feats(id).foreach { case (b, c) => w += b -> (w(b) + ys(id) * c) }
      }
    }
    val kept = rows.map(_._1).sorted.flatMap { id =>
      val score = feats(id).map { case (b, c) => c * w(b) }.sum
      val nTok = rows.find(_._1 == id).get._2.split("\\s+").length.toLong
      if (score > 0 && nTok > 0) Some((id, score, nTok)) else None
    }
    assert(kept.size < rows.size,
      "degenerate fixture: the gate dropped nothing — threshold unpinned")
    assert(kept.nonEmpty, "degenerate fixture: the gate dropped everything")
    var off = 0L
    val expect = kept.map { case (id, score, nTok) =>
      val r = ("en", id, score, nTok, off, off / 128L,
        (off + nTok - 1) / 128L)
      off += nTok
      r
    }
    val got = PipelineQueries.classifier_gated_corpus(spark, dir)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == expect)
  }

  test("p20 compaction: bins match the sorted-prefix-sum plan, the " +
      "rewrite is lossless, and each output bin is ONE physical file") {
    // lang en: singleton files 0..9 with bytes 1000·(i+1); sorted
    // DESC the 16384-target prefix-sum bins are {9,8} {7,6} {5,4,3,2}
    // {1,0}. lang de: one 500-byte file alone in bin 0.
    val rows = (0L until 10L).map(i =>
      (i, s"t$i", "en", "s", 1000L * (i + 1))) :+
      (20L, "d", "de", "s", 500L)
    val dir = tmpSf(rows)
    val got = PipelineQueries.compaction_manifest(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))
    def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got.toSeq == Seq(
      ("de", 0L, 1L, 1L, 500L, md5("20")),
      ("en", 0L, 2L, 2L, 19000L, md5("8,9")),
      ("en", 1L, 2L, 2L, 15000L, md5("6,7")),
      ("en", 2L, 4L, 4L, 18000L, md5("2,3,4,5")),
      ("en", 3L, 2L, 2L, 3000L, md5("0,1"))))
    // conservation: every doc lands in exactly one bin
    assert(got.map(_._4).sum == rows.size.toLong)
    // the physical contract: the rewrite put each (lang, bin) into
    // exactly one data file — 11 scattered inputs became 5 files
    val root = new java.io.File(PipelineQueries.p20CompactPath(dir))
    val binDirs = root.listFiles.filter(_.getName.startsWith("lang="))
      .flatMap(_.listFiles).filter(_.getName.startsWith("bin="))
    assert(binDirs.length == 5, s"expected 5 bin dirs: ${binDirs.toSeq}")
    binDirs.foreach { d =>
      val parts = d.listFiles.filter(f =>
        f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      assert(parts.length == 1,
        s"bin dir $d holds ${parts.length} files — compaction must " +
          "produce exactly one")
    }
  }

  test("p21 merge+split compaction: the fat file SPLITS into " +
      "target-sized pieces, small files still bin-pack, no doc is " +
      "ever split, and each output bin is ONE physical file") {
    // en: docs 0..15 at 3000 bytes. Scatter (doc_id%4<3 → file 0,
    // else 1+doc_id%16): file 0 holds 12 docs = 36000 bytes > the
    // 32768 split threshold → SPLIT by running offset div 8192:
    // pieces {0,1,2} {4,5,6} {8,9,10} {12,13} {14}. Files 4/8/12/16
    // (docs 3/7/11/15, 3000 bytes each) are small → merge plan
    // (equal sizes sort by file_id): files 4+8+12 → bin 0, file 16 →
    // bin 1. de: one 500-byte doc in file 0, under threshold → bin 0.
    val rows = (0L until 16L).map(i => (i, s"t$i", "en", "s", 3000L)) :+
      (100L, "d", "de", "s", 500L)
    val dir = tmpSf(rows)
    val got = PipelineQueries.compaction_split_manifest(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))
    def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got.toSeq == Seq(
      ("de", 0L, 1L, 1L, 500L, md5("100")),
      ("en", 0L, 3L, 3L, 9000L, md5("3,7,11")),
      ("en", 1L, 1L, 1L, 3000L, md5("15")),
      ("en", 1000000L, 1L, 3L, 9000L, md5("0,1,2")),
      ("en", 1000001L, 1L, 3L, 9000L, md5("4,5,6")),
      ("en", 1000002L, 1L, 3L, 9000L, md5("8,9,10")),
      ("en", 1000003L, 1L, 2L, 6000L, md5("12,13")),
      ("en", 1000004L, 1L, 1L, 3000L, md5("14"))))
    // the split regime actually FIRED (the round-15 gap: p20 never
    // splits), and conservation holds across both regimes
    assert(got.exists(_._2 >= 1000000L), "split regime never fired")
    assert(got.map(_._4).sum == rows.size.toLong)
    // every split piece stays within one doc of the target — a piece
    // can overshoot only by the doc that straddles the boundary
    got.filter(_._2 >= 1000000L).foreach { b =>
      assert(b._5 <= 8192L + 3000L,
        s"split piece ${b._2} holds ${b._5} bytes — exceeds " +
          "target + one straddling doc")
    }
    // physical contract: one parquet file per output bin
    val root = new java.io.File(PipelineQueries.p21CompactPath(dir))
    val binDirs = root.listFiles.filter(_.getName.startsWith("lang="))
      .flatMap(_.listFiles).filter(_.getName.startsWith("bin="))
    assert(binDirs.length == 8, s"expected 8 bin dirs: ${binDirs.toSeq}")
    binDirs.foreach { d =>
      val parts = d.listFiles.filter(f =>
        f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      assert(parts.length == 1,
        s"bin dir $d holds ${parts.length} files — compaction must " +
          "produce exactly one")
    }
  }

  test("d14 bloom_prefilter: exact dup flagged, no false negatives") {
    // doc 1 (batch) copies doc 0 (corpus) -> maybe_dup AND is_dup;
    // doc 3 (batch) is unique -> is_dup false; bloom admits no false
    // negatives, so is_dup ⇒ maybe_dup everywhere
    val d = tmpSf(Seq(
      (0L, "the quick brown fox", "en", "s", 1L),
      (1L, "the quick brown fox", "en", "s", 1L),
      (2L, "lorem ipsum dolor sit", "en", "s", 1L),
      (3L, "entirely different content here", "en", "s", 1L)))
    val got = PipelineQueries.bloom_prefilter(spark, d)
      .as[(Long, Boolean, Boolean)].collect().toSeq
    val byId = got.map(r => r._1 -> (r._2, r._3)).toMap
    assert(byId.keySet == Set(1L, 3L))       // batch = odd ids only
    assert(byId(1L) == (true, true))         // exact dup caught
    assert(got.forall(r => !r._3 || r._2))   // is_dup ⇒ maybe_dup
    assert(!byId(3L)._2)                     // unique doc is not a dup
  }
}
