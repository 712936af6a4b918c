package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate text detection: MinHash+LSH, SimHash, and exact
  * n-gram-Jaccard verification.
  *
  * Everything is expressed with codegen'd higher-order functions over
  * arrays (`transform`, `aggregate`, `filter`) — no UDFs — and all
  * hashing is `xxhash64` with fixed seeds, so signatures are
  * deterministic across runs and cluster sizes.
  *
  * Scale shape (the standard LSH pipeline):
  *   1. per-doc signature (map-only, one pass over 100 TB);
  *   2. explode to (band, bucket) keys — output is #bands rows/doc, tiny
  *      compared to the text;
  *   3. self-join on bucket → candidate pairs (shuffle keyed on small
  *      band hashes, never on text);
  *   4. exact verification only on candidates (jaccardVerify), pulling
  *      text for the ~0.01% of pairs that collide.
  */
object TextDedup {

  /** Character shingles (distinct) of length n over the lowercased
    * text. Lowercasing happens ONCE up front: an expression like
    * `lower(text)` referenced from inside the per-shingle lambda
    * re-evaluates per element — O(len²) per document.
    */
  def shingles(text: Column, n: Int): Column =
    array_distinct(shingleList(text, n))

  private def shingleList(text: Column, n: Int): Column = {
    val arr = transform(sequence(lit(1), greatest(length(text) - (n - 1), lit(1))),
      i => text.substr(i, lit(n)))
    // one lower() over the doc, then split back into shingles? No —
    // substr positions shift under case mapping in some locales; map
    // lower over the (small) shingle strings instead.
    transform(arr, s => lower(s))
  }

  /** Per-shingle 64-bit hashes over lowercased text, NOT de-duplicated
    * — duplicates cannot change a minimum, so MinHash skips the
    * `array_distinct` pass (and the string array entirely downstream).
    */
  def shingleHashes(text: Column, n: Int): Column =
    transform(shingleList(text, n), s => xxhash64(s))

  /** MinHash signature: for permutation i, min over shingles s of
    * h_i(s) = xxhash64(i, xxhash64(s)). Returns array<long> of length
    * nPerms.
    *
    * Shape matters for speed: each shingle string is hashed ONCE
    * (`xxhash64(s)`), and the nPerms permutations re-hash only that
    * 8-byte long. The single `aggregate` pass keeps one running-minima
    * array instead of nPerms separate folds over the shingle array —
    * the naive form (nPerms × string-hash per shingle) measured ~40×
    * slower on the bench corpus.
    */
  def minHashSignature(shingleArr: Column, nPerms: Int): Column =
    minHashSignatureOfHashes(transform(shingleArr, s => xxhash64(s)), nPerms)

  /** Signature from pre-hashed shingles ([[shingleHashes]]). */
  def minHashSignatureOfHashes(hashArr: Column, nPerms: Int): Column = {
    val permIdx = sequence(lit(0), lit(nPerms - 1))
    aggregate(hashArr,
      array_repeat(lit(Long.MaxValue), nPerms),
      (acc, h) => zip_with(acc, permIdx, (a, i) => least(a, xxhash64(i, h))))
  }

  /** One-permutation MinHash (OPH; Li, Owen, Zhang 2012): a single
    * hash pass assigns each shingle hash to bin `h mod nBins` and the
    * signature is the per-bin minimum — nBins signature components
    * for ONE hash evaluation per shingle, where classic MinHash pays
    * nPerms hash evaluations per shingle. Empty bins keep the
    * Long.MaxValue sentinel (vanishingly rare for document-sized
    * shingle sets: p = (1-1/nBins)^|set|); a shared-empty-bin false
    * candidate is removed by the exact-Jaccard verify stage.
    * Component semantics are band-compatible with [[lshBuckets]],
    * BUT: without densification, corpora with many short documents
    * share sentinel-valued bins, which makes whole bands collide and
    * explodes the candidate set — use this only when |shingle set| >>
    * nBins for essentially all documents, or add a densification
    * pass; otherwise prefer [[minHashSignatureOfHashes]].
    */
  def ophSignature(hashArr: Column, nBins: Int): Column = {
    val binIdx = sequence(lit(0), lit(nBins - 1))
    aggregate(hashArr,
      array_repeat(lit(Long.MaxValue), nBins),
      (acc, h) => zip_with(acc, binIdx, (a, i) =>
        when(pmod(h, lit(nBins.toLong)) === i, least(a, h)).otherwise(a)))
  }

  /** Rotation densification for OPH (Shrivastava & Li 2014): every
    * empty bin i borrows the value of the nearest non-empty bin j to
    * its right (circularly), offset by the borrow distance t so
    * different distances stay distinguishable: out[i] = sig[j] + t.
    * Non-empty bins are untouched (t = 0). A doc with NO shingles keeps
    * the all-sentinel signature.
    *
    * This is what makes [[ophSignature]] usable on short-document
    * corpora: un-densified, empty bins share the sentinel and whole
    * sentinel bands collide across unrelated short docs — the measured
    * candidate explosion that kept the one-hash-per-shingle signature
    * out of d02. Densified, empty bins inherit doc-specific minima and
    * the band-collision probability follows Jaccard again.
    */
  def densifyOph(sig: Column, nBins: Int): Column = {
    val sentinel = lit(Long.MaxValue)
    val binIdx = sequence(lit(0), lit(nBins - 1))
    transform(binIdx, i => {
      // try_element_at: the filtered array is EMPTY for an all-sentinel
      // signature, and ANSI element_at throws on out-of-bounds
      val firstT = try_element_at(
        filter(binIdx, t =>
          element_at(sig, (pmod(i + t, lit(nBins)) + 1).cast("int")) =!= sentinel), lit(1))
      when(firstT.isNull, sentinel)
        .otherwise(
          element_at(sig, (pmod(i + firstT, lit(nBins)) + 1).cast("int")) + firstT)
    })
  }

  /** LSH banding: split the signature into bands of `rowsPerBand` and
    * hash each band → (doc, band_idx, bucket) rows.
    */
  def lshBuckets(df: DataFrame, idCol: String, sigCol: String,
      bands: Int, rowsPerBand: Int): DataFrame =
    df.select(col(idCol), posexplode(
        transform(sequence(lit(0), lit(bands - 1)), b =>
          xxhash64(b, slice(col(sigCol), b * lit(rowsPerBand) + lit(1),
            lit(rowsPerBand))))) // hash the long slice directly — no string build
      .as(Seq("band", "bucket")))

  /** Candidate pairs = docs sharing ≥1 LSH bucket. */
  def candidatePairs(buckets: DataFrame, idCol: String): DataFrame = {
    val a = buckets.select(col("band"), col("bucket"), col(idCol).as("id_a"))
    val b = buckets.select(col("band"), col("bucket"), col(idCol).as("id_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Candidates ACROSS two bucket sets — the incremental form of
    * [[candidatePairs]]: `index` is the standing corpus's banded
    * buckets (at 100 TB a persisted table, written once at
    * index-build time and bucket-partitioned), `probe` is a new
    * batch's buckets. One equi-join on (band, bucket) + distinct:
    * each new doc meets only docs sharing a band bucket, never the
    * corpus at large — the probe cost is ∝ batch × bucket occupancy,
    * independent of corpus size when buckets are balanced. No a<b
    * filter: the two sides are disjoint by construction and the
    * (probe, index) orientation is the output's meaning.
    */
  def candidatePairsAcross(probe: DataFrame, index: DataFrame,
      idCol: String): DataFrame =
    // the PROBE side broadcasts: the incremental contract is
    // batch ≪ corpus, and without the hint Spark shuffles the
    // corpus-sized index to meet the batch (measured 2.4 → 360 MB
    // shuffle growing WITH the index in the d15 rehearsal leg; with
    // the broadcast the index is probed map-side and only candidates
    // move). A batch comparable to the corpus belongs in
    // candidatePairs on the union instead. The map-side probe still
    // SCANS the index once — at deployment scale the index table is
    // bucket-partitioned, so partition pruning cuts that too.
    broadcast(probe.select(col("band"), col("bucket"),
        col(idCol).as("probe_id")))
      .join(index.select(col("band"), col("bucket"),
        col(idCol).as("index_id")), Seq("band", "bucket"))
      .select("probe_id", "index_id").distinct()

  /** Exact Jaccard similarity between two token-set columns (arrays,
    * assumed distinct). Integer set sizes → the double division is
    * bit-exact and engine-independent.
    */
  def jaccard(setA: Column, setB: Column): Column = {
    val inter = size(array_intersect(setA, setB)).cast("double")
    val uni = (size(setA) + size(setB)).cast("double") - inter
    when(uni === 0, lit(0.0)).otherwise(inter / uni)
  }

  /** Overlap coefficient |A∩B| / min(|A|,|B|): the asymmetric
    * containment metric. A short document pasted verbatim inside a
    * longer one scores ~1.0 here while its symmetric Jaccard can be
    * arbitrarily low — the screen for subset/boilerplate duplicates
    * that [[jaccard]] structurally misses. 0.0 when either set is
    * empty (no containment evidence).
    */
  def overlapCoefficient(setA: Column, setB: Column): Column = {
    val inter = size(array_intersect(setA, setB)).cast("double")
    val minSz = least(size(setA), size(setB)).cast("double")
    when(minSz === 0, lit(0.0)).otherwise(inter / minSz)
  }

  /** Word n-grams of a MATERIALIZED token-array column (HOF lambdas
    * get no CSE — pass a column reference, not a tokenizer
    * expression). Docs with fewer than n tokens yield an empty array.
    */
  def wordNgrams(toks: Column, n: Int): Column = {
    require(n >= 1, "n must be >= 1")
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k)): _*)))
      .otherwise(array().cast("array<string>"))
  }

  /** Distinct (id, gram) word-n-gram rows — the inverted-index build
    * for n-gram joins (decontamination, candidate generation).
    *
    * Deliberately NOT `explode(wordNgrams(...))`: exploding an
    * HOF-built array makes the optimizer's inferred `size(...) > 0`
    * pre-filter inline the whole lambda (and the tokenizer inside it)
    * below any exchange, re-evaluating the tokenizer once per element
    * per row on the scan partitions — measured 20 s vs < 1 s at sf0.1.
    * Exploding the window INDEXES and building each gram as a plain
    * per-row slice keeps the tokenizer evaluated once per row and
    * every expression out of lambda scope.
    *
    * @param df (idCol, toksCol) frame; toksCol an array<string> column
    */
  def gramRows(df: DataFrame, idCol: String, toksCol: String, n: Int): DataFrame = {
    require(n >= 1, "n must be >= 1")
    df.select(col(idCol), col(toksCol),
        explode(when(size(col(toksCol)) >= n,
          sequence(lit(1), size(col(toksCol)) - (n - 1)))).as("__i"))
      .select(col(idCol),
        array_join(slice(col(toksCol), col("__i"), lit(n)), " ").as("gram"))
      .distinct()
  }

  /** SimHash (64-bit) over a token array: sign-sum of per-token hashes,
    * bit by bit. Docs with small Hamming distance are near-dups.
    *
    * Like [[minHashSignature]]: one string hash per token, then a
    * single aggregate pass carrying a 64-slot vote array (the unrolled
    * 64-fold form re-hashed every token per bit).
    */
  def simHash64(tokens: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.{ShiftLeft, ShiftRight}
    import org.apache.spark.sql.graft.ColumnBridge.{column => cc, expression => ce}
    def shl(v: Column, amt: Column): Column = cc(ShiftLeft(ce(v), ce(amt)))
    def shr(v: Column, amt: Column): Column = cc(ShiftRight(ce(v), ce(amt)))
    val bitIdx = sequence(lit(0), lit(63))
    val hashes = transform(tokens, t => xxhash64(t))
    val votes = aggregate(hashes, array_repeat(lit(0), 64),
      (acc, h) => zip_with(acc, bitIdx, (a, b) =>
        a + when(shr(h, b).bitwiseAND(lit(1L)) =!= 0, lit(1)).otherwise(lit(-1))))
    aggregate(
      zip_with(votes, bitIdx, (v, b) => when(v > 0, shl(lit(1L), b)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash blocking keys: split the 64-bit fingerprint into 8 bytes
    * and emit one 16-bit bucket per unordered byte PAIR — C(8,2) = 28
    * `{band, bucket}` structs (Manku/Jain/Sarma, WWW'07 §3 shape).
    *
    * Pigeonhole guarantee: h differing bits dirty at most h of the 8
    * bytes, so h ≤ 6 leaves ≥ 2 clean bytes, and that clean pair's key
    * collides — recall 1 for hamming ≤ 6 (where J ≥ 0.8 near-dups
    * concentrate; the d03 gate's oracle equality re-proves it each run).
    * Single-byte bands would guarantee h ≤ 7 but bucket on 2⁸ values
    * (E[pairs] ≈ N²/2⁹ — quadratic); 16-bit quarter bands bucket well
    * but guarantee only h ≤ 3 (measured recall misses). Byte pairs keep
    * the 2¹⁶ bucket space AND the useful guarantee, at 28 small rows
    * per doc — a flat, text-free shuffle at 100 TB.
    */
  def simhashBlockPairKeys(sig: Column): Column = {
    val pairs = for { i <- 0 until 8; j <- i + 1 until 8 } yield (i, j)
    array(pairs.zipWithIndex.map { case ((i, j), k) =>
      struct(lit(k).as("band"),
        shiftright(sig, i * 8).bitwiseAND(lit(0xFFL))
          .bitwiseOR(shiftleft(
            shiftright(sig, j * 8).bitwiseAND(lit(0xFFL)), 8))
          .as("bucket"))
    }: _*)
  }

  /** Corpus-level boilerplate removal (the CCNet/RefinedWeb paragraph
    * dedup): a paragraph that recurs across ≥ `minDocs` DISTINCT
    * documents is boilerplate (headers, cookie banners, license
    * footers) and is dropped from every document; survivors are
    * reassembled in original order. Documents whose every paragraph is
    * boilerplate disappear entirely — the desired cleaning semantics.
    *
    * Scale shape:
    *   1. split + posexplode — map-only over the text scan;
    *   2. frequency count groups by `md5(paragraph)`, so the shuffle
    *      carries 32-hex-char keys + ids, never paragraph text (same
    *      hash-not-content discipline as [[Dedup.exactDedup]]; md5
    *      collisions are the usual 2⁻¹²⁸ non-concern);
    *   3. the boilerplate set after the ≥ minDocs filter is bounded by
    *      total_paragraphs / minDocs distinct hashes and in practice
    *      tiny (high-frequency by definition) → BROADCAST anti-join,
    *      no second text shuffle;
    *   4. one groupBy(id) reassembly shuffle of surviving text — the
    *      irreducible cost of emitting cleaned documents.
    *
    * Output: (idCol, clean_text, n_kept, n_removed), one row per
    * document that kept ≥ 1 paragraph.
    */
  def removeBoilerplate(df: DataFrame, idCol: String, textCol: String,
      sep: String = "\n\n", minDocs: Long = 5L): DataFrame = {
    val paras = df
      .select(col(idCol), posexplode(
        split(col(textCol), java.util.regex.Pattern.quote(sep))))
      .toDF(idCol, "pos", "para")
      .withColumn("ph", md5(col("para")))
    val boiler = paras.groupBy("ph")
      .agg(count_distinct(col(idCol)).as("ndocs"))
      .filter(col("ndocs") >= minDocs)
      .select("ph")
    val totals = paras.groupBy(idCol).agg(count(lit(1)).as("n_total"))
    paras.join(broadcast(boiler), Seq("ph"), "left_anti")
      .groupBy(idCol)
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("para")))),
            x => x("para")),
          sep).as("clean_text"),
        count(lit(1)).as("n_kept"))
      .join(totals, idCol)
      .withColumn("n_removed", col("n_total") - col("n_kept"))
      .drop("n_total")
  }
}
