package graft.functions

import graft.SparkTestBase
import graft.operators.{Similarity, TextDedup}
import org.apache.spark.sql.functions._

/** The LLM-pipeline SQL surface: every registered function exists, and
  * SQL invocations return exactly what the Column/expression API
  * returns (same builders → same execution path; this pins the wiring).
  */
class PipelineFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  private def registered(): Unit = PipelineFunctions.registerAll(spark)

  test("registerAll registers every function") {
    registered()
    PipelineFunctions.builders.keys.foreach { name =>
      assert(spark.sessionState.functionRegistry
        .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(name)),
        s"missing $name")
    }
  }

  test("CharHist: codepoint bins, case-sensitive, catch-all; ArrayL1 " +
      "bound never exceeds 2x levenshtein on planted mutations") {
    // "abz Z!" → a,b,z one each; one space; 'Z' and '!' in catch-all.
    // The astral clef (U+1D11E, two UTF-16 units) must count ONCE —
    // per-codepoint iteration is what keeps the ≤2-per-edit invariant
    // aligned with levenshtein's unit of edit.
    val h = Seq("abz Z!", "𝄞").toDF("t")
      .select(CharHist(col("t")).as("h")).collect()
      .map(_.getSeq[Int](0))
    assert(h(0)(0) == 1 && h(0)(1) == 1 && h(0)(25) == 1 &&
      h(0)(26) == 1 && h(0)(27) == 2 && h(0).sum == 6)
    assert(h(1)(27) == 1 && h(1).sum == 1)

    // invariant sweep: substitution, insert, delete, case flip, and a
    // disjoint rewrite — L1(hist) ≤ 2·dist for every pair, both
    // codegen (DataFrame filter) and interpreted (collect) paths
    val base = "the quick brown fox jumps over the lazy dog"
    val pairs = Seq(
      (base, base.replace('q', 'x')),
      (base, base + " again"),
      (base, base.drop(4)),
      (base, base.toUpperCase),
      (base, "pack my box with five dozen liquor jugs"))
    val got = pairs.toDF("a", "b").select(
      ArrayL1(CharHist(col("a")), CharHist(col("b"))).as("l1"),
      levenshtein(col("a"), col("b")).as("d")).collect()
    got.foreach(r => assert(r.getLong(0) <= 2L * r.getInt(1),
      s"count-filter bound violated: l1=${r.getLong(0)} dist=${r.getInt(1)}"))

    // ArrayL1 mismatch/null contract (DotProduct parity), both paths
    val mm = Seq((Array(1, 2), Array(1, 2, 3))).toDF("a", "b")
      .select(ArrayL1(col("a"), col("b"))).collect()
    assert(mm(0).isNullAt(0), "length mismatch must yield NULL")
    val interp = ArrayL1(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1, 5), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.IntegerType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(4, 1), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.IntegerType))).eval(null)
    assert(interp == 7L)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq((Array(1.0), Array(1))).toDF("a", "b")
        .select(ArrayL1(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("arrayl1"))
  }

  test("theta sketch family: exact set ops in the θ=1 regime, " +
      "partition-order invariant") {
    import org.apache.spark.sql.graft.ColumnBridge
    def agg(c: org.apache.spark.sql.Column) = ColumnBridge.column(
      ThetaSketchAgg(ColumnBridge.expression(c), lgNomEntries = 14)
        .toAggregateExpression())
    // analysis-time rejection of a non-string child (the ArrayL1/
    // DotProduct discipline) — previously a ClassCastException at
    // executor runtime
    val te = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(("g", 1L)).toDF("g", "v").groupBy("g")
        .agg(agg(col("v"))).collect()
    }
    assert(te.getMessage.toLowerCase.contains("theta_sketch_agg"))
    // groups: g0 = {v0..v499}, g1 = {v300..v799} → |∩| = 200 exactly
    val rows = (0 until 500).map(i => ("g0", s"v$i")) ++
      (300 until 800).map(i => ("g1", s"v$i"))
    val df = rows.toDF("g", "v")
    def matrix(d: org.apache.spark.sql.DataFrame) = {
      val sk = d.groupBy("g").agg(agg(col("v")).as("sk"))
      val a = sk.select(col("g").as("ga"), col("sk").as("ska"))
      val b = sk.select(col("g").as("gb"), col("sk").as("skb"))
      a.join(b, col("ga") < col("gb"))
        .select(
          ColumnBridge.column(ThetaIntersectEst(
            ColumnBridge.expression(col("ska")),
            ColumnBridge.expression(col("skb")))).as("inter"),
          ColumnBridge.column(ThetaEstimate(
            ColumnBridge.expression(col("ska")))).as("ca"),
          ColumnBridge.column(ThetaEstimate(
            ColumnBridge.expression(col("skb")))).as("cb"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    }
    val one = matrix(df.coalesce(1))
    val many = matrix(df.repartition(13))   // different partials/merge order
    assert(one.toSeq == Seq((200L, 500L, 500L)),
      s"theta exact regime broken: ${one.toSeq}")
    assert(many.toSeq == one.toSeq,
      "theta results must not depend on partitioning/merge order")
    // duplicates are absorbed: re-unioning the same values changes nothing
    val dup = matrix(df.unionAll(df))
    assert(dup.toSeq == one.toSeq, "duplicate updates must be absorbed")
  }

  test("MinHashSigFromHashes(ShingleHashSorted(t)) == MinHashSig(t): the " +
      "filtered-input path is bit-equal to the from-text expression") {
    // NOT pinned against TextDedup.minHashSignatureOfHashes: the HOF
    // form's per-permutation hash is Spark's multi-arg xxhash64(i, h)
    // (seed-CHAINED), while the native family uses hashLong(h, seed=i)
    // directly — two valid MinHash constructions, deliberately not
    // bit-equal. What must agree is the native family with itself:
    // d16's sig-from-hashes over an UNFILTERED shingle set must equal
    // d02's from-text signature (duplicates in MinHashSig's window
    // stream cannot change a minimum, so the deduped input is neutral).
    val df = Seq(
      "the quick brown fox jumps over the lazy dog",
      "tiny", "", "aaaaaaaaaa", "mixed CASE Text with    spaces")
      .toDF("t")
      .withColumn("sh", ShingleHashSorted(col("t"), 5))
    val rows = df.select(
      MinHashSigFromHashes(col("sh"), 16).as("native"),
      MinHashSig(col("t"), 5, 16).as("fromText")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        "sig-from-hashes diverged from the from-text expression")
    }
    // empty hash input (everything filtered away) keeps the sentinel
    val empty = Seq(Seq.empty[Long]).toDF("sh")
      .select(MinHashSigFromHashes(col("sh"), 4)).collect()
    assert(empty.head.getSeq[Long](0) == Seq.fill(4)(Long.MaxValue))
  }

  test("SQL signature/verify functions match the Column API") {
    registered()
    val df = Seq(
      ("the quick brown fox jumps over the lazy dog", "the quick brown fox jumps over a lazy dog"),
      ("", "x"), ("same", "same"))
      .toDF("a", "b")
    df.createOrReplaceTempView("pf_pairs")
    val viaSql = spark.sql(
      """SELECT minhash_sig(a, 5, 16) AS mh, simhash_sig(a) AS sh,
                shingle_jaccard(a, b, 5) AS sj,
                sorted_jaccard(shingle_hashes_sorted(a, 5),
                               shingle_hashes_sorted(b, 5)) AS pj,
                hamming64(simhash_sig(a), simhash_sig(b)) AS hd
         FROM pf_pairs""").collect()
    val viaCol = df.select(
      MinHashSig(col("a"), 5, 16).as("mh"), SimHashSig(col("a")).as("sh"),
      ShingleJaccard(col("a"), col("b"), 5).as("sj"),
      SortedLongJaccard(ShingleHashSorted(col("a"), 5),
        ShingleHashSorted(col("b"), 5)).as("pj"),
      TextDedup.hamming64(SimHashSig(col("a")), SimHashSig(col("b"))).as("hd"))
      .collect()
    viaSql.zip(viaCol).foreach { case (s, c) =>
      assert(s.getSeq[Long](0) == c.getSeq[Long](0))
      assert(s.getLong(1) == c.getLong(1))
      assert(s.getDouble(2) == c.getDouble(2))
      assert(s.getDouble(3) == c.getDouble(3))
      assert(s.getInt(4) == c.getInt(4))
    }
  }

  test("SortedLongIntersect is the integer numerator of SortedLongJaccard") {
    val df = Seq(
      ("the quick brown fox jumps over the lazy dog", "the quick brown fox jumps over a lazy dog"),
      ("", "x"), ("same", "same"), ("abcde", "vwxyz"))
      .toDF("a", "b")
      .select(ShingleHashSorted(col("a"), 5).as("sa"),
        ShingleHashSorted(col("b"), 5).as("sb"))
    val rows = df.select(
      SortedLongIntersect(col("sa"), col("sb")).as("inter"),
      size(col("sa")).as("na"), size(col("sb")).as("nb"),
      SortedLongJaccard(col("sa"), col("sb")).as("j")).collect()
    rows.foreach { r =>
      val (inter, na, nb, j) = (r.getInt(0), r.getInt(1), r.getInt(2), r.getDouble(3))
      assert(inter >= 0 && inter <= math.min(na, nb))
      val un = na + nb - inter
      // the d02/d03 gates emit (inter, un) instead of j precisely
      // because this identity reconstructs j exactly from integers
      if (un > 0) assert(j == inter.toDouble / un) else assert(j == 1.0)
    }
    // identical sets: inter == |a|, disjoint sets: inter == 0
    assert(rows(2).getInt(0) == rows(2).getInt(1))
    assert(rows(3).getInt(0) == 0)
  }

  test("TokenHashSorted matches tokenSet semantics exactly") {
    val texts = Seq(
      "the quick  brown\tfox \n jumps the the", // runs of mixed whitespace + dups
      "  leading and trailing   ", "single", "", "   ",
      "a b c d e f g h", "A B a b") // case folding collapses
    val df = texts.toDF("t")
    val rows = df.select(
      size(TokenHashSorted(col("t"))).as("nh"),
      size(array_distinct(split(trim(lower(col("t"))), "\\s+"))).as("ns"))
      .collect()
    rows.zip(texts).foreach { case (r, t) =>
      assert(r.getInt(0) === r.getInt(1), s"set size mismatch for '$t'")
    }
    // pairwise Jaccard over hashes == Jaccard over string sets
    val pairs = texts.combinations(2).map { case Seq(a, b) => (a, b) }.toSeq
    val jrows = pairs.toDF("a", "b").select(
      SortedLongJaccard(TokenHashSorted(col("a")),
        TokenHashSorted(col("b"))).as("jh"),
      graft.operators.TextDedup.jaccard(
        array_distinct(split(trim(lower(col("a"))), "\\s+")),
        array_distinct(split(trim(lower(col("b"))), "\\s+"))).as("js"))
      .collect()
    jrows.zip(pairs).foreach { case (r, p) =>
      assert(r.getDouble(0) === r.getDouble(1), s"jaccard mismatch for $p")
    }
  }

  test("SQL text-analysis functions match the Column API") {
    registered()
    val df = Seq("The quick brown fox, it is said, jumps over the lazy dog!",
      "el la de y que los", "", "12345")
      .toDF("text")
    df.createOrReplaceTempView("pf_docs")
    val viaSql = spark.sql(
      """SELECT lang_id(text) AS lang,
                quality_features(text).quality_score AS q,
                token_counts(text).bpe_regex_tokens AS bpe,
                doc_fingerprint(text) AS fp
         FROM pf_docs""").collect()
    val viaCol = df.select(
      TextFunctions.langIdCol(col("text")).as("lang"),
      struct(TextFunctions.qualityFeatures(col("text")): _*)
        .getField("quality_score").as("q"),
      struct(TextFunctions.tokenCounts(col("text")): _*)
        .getField("bpe_regex_tokens").as("bpe"),
      TextFunctions.fingerprint(col("text")).as("fp"))
      .collect()
    viaSql.zip(viaCol).foreach { case (s, c) =>
      assert(s.getString(0) == c.getString(0))
      assert(s.getDouble(1) == c.getDouble(1))
      assert(s.getLong(2) == c.getLong(2))
      assert(s.getString(3) == c.getString(3))
    }
  }

  test("cosine_sim from SQL equals Similarity.cosine") {
    registered()
    val df = Seq((Array(1.0f, 0.0f, 1.0f), Array(0.5f, 0.5f, 0.0f)))
      .toDF("u", "v")
    df.createOrReplaceTempView("pf_vecs")
    val s = spark.sql("SELECT cosine_sim(u, v) AS c FROM pf_vecs").head.getDouble(0)
    val c = df.select(Similarity.cosine(col("u"), col("v"))).head.getDouble(0)
    assert(s == c)
  }

  test("split_label / hash_bucket / overlap_coefficient from SQL match the Column API") {
    registered()
    val df = (0L until 500L).toDF("id")
    df.createOrReplaceTempView("pf_ids")
    val viaSql = spark.sql(
      """SELECT id, hash_bucket(id) AS b,
                split_label(id, 'train', 0.9, 'val', 0.05, 'test', 0.05) AS s
         FROM pf_ids ORDER BY id""").collect()
    val viaCol = df.select(col("id"),
      graft.operators.Sampling.hashBucket(col("id")).as("b"),
      graft.operators.Sampling.splitLabel(col("id"),
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)).as("s"))
      .orderBy("id").collect()
    viaSql.zip(viaCol).foreach { case (s, c) =>
      assert(s.getString(1) == c.getString(1) && s.getString(2) == c.getString(2))
    }
    val ov = Seq((Seq("a", "b"), Seq("a", "b", "c", "d"))).toDF("x", "y")
    ov.createOrReplaceTempView("pf_ov")
    assert(spark.sql("SELECT overlap_coefficient(x, y) AS o FROM pf_ov")
      .head.getDouble(0) == 1.0)
    // non-literal split weight → analyzer error, not silent misparse
    intercept[Exception] {
      spark.sql("SELECT split_label(id, 'a', id, 'b', 0.5) FROM pf_ids").collect()
    }
  }

  test("shape parameters must be integer literals") {
    registered()
    Seq((1, "x")).toDF("n", "text").createOrReplaceTempView("pf_bad")
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_sig(text, n, 16) FROM pf_bad").collect()
    }
    assert(e.getMessage.contains("integer literal") ||
      Option(e.getCause).exists(_.getMessage.contains("integer literal")))
  }

  test("raster_hash from SQL matches the Dataset helper; null-safe") {
    PipelineFunctions.registerAll(spark)
    import spark.implicits._
    val png = graft.multimodal.Multimodal.synthCheckerPng(
      16, 8, 0x112233, 0x445566)
    Seq((1L, png), (2L, "junk".getBytes), (3L, null: Array[Byte]))
      .toDF("id", "payload").createOrReplaceTempView("pf_img")
    val rows = spark.sql(
      "SELECT id, raster_hash(payload) AS h FROM pf_img ORDER BY id")
      .collect()
    assert(rows(0).getLong(1) ===
      graft.multimodal.Multimodal.rasterHash(png).get._3)
    assert(rows(1).isNullAt(1) && rows(2).isNullAt(1))
  }

  test("extensions channel injects the pipeline functions too") {
    import org.apache.spark.sql.SparkSession
    spark.sparkContext // ensure the shared context exists first
    val prev = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      // new session over the SAME SparkContext, functions injected by
      // the extensions channel alone (same code path as the
      // spark.sql.extensions config, see ChCompatSpec)
      val s2 = SparkSession.builder()
        .withExtensions(new graft.GraftExtensions())
        .getOrCreate()
      val got = s2.sql(
        "SELECT lang_id('the of and is it') AS l, toYear(TIMESTAMP '2015-03-07 00:00:00') AS y")
        .head
      assert(got.getString(0) == "en")
      assert(got.getInt(1) == 2015)
    } finally {
      prev.foreach(SparkSession.setDefaultSession)
      prev.foreach(SparkSession.setActiveSession)
    }
  }
}
