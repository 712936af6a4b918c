package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis functions for the training-data pipeline: tokenization,
  * n-gram-heuristic language ID, quality scoring, token counting,
  * document fingerprinting.
  *
  * All column-level (codegen'd) with deterministic arithmetic: integer
  * counts plus IEEE-exact double division, so results are reproducible
  * against an external oracle. Each works as a map-only pass at 100 TB
  * (language ID is a broadcast join against a tiny stopword table).
  */
object TextFunctions {

  /** Lowercased word tokens (split on whitespace; trimmed first so no
    * empty edge tokens — matches the oracle's tokenization exactly).
    */
  def tokens(text: Column): Column = split(trim(lower(text)), "\\s+")

  /** Distinct lowercased word set. */
  def tokenSet(text: Column): Column = array_distinct(tokens(text))

  /** Stopword lists that drive the n-gram-heuristic language detector.
    * Tiny on purpose: the detector's mechanics (tokenize → match →
    * score → argmax), not lexicon completeness, are the operator.
    */
  val stopwords: Seq[(String, String)] = Seq(
    "en" -> "the", "en" -> "and", "en" -> "of", "en" -> "to", "en" -> "a",
    "en" -> "in", "en" -> "is", "en" -> "it",
    "es" -> "el", "es" -> "la", "es" -> "de", "es" -> "y", "es" -> "que",
    "es" -> "los", "es" -> "un", "es" -> "es",
    "fr" -> "le", "fr" -> "la", "fr" -> "de", "fr" -> "et", "fr" -> "les",
    "fr" -> "des", "fr" -> "un", "fr" -> "est",
    "de" -> "der", "de" -> "die", "de" -> "und", "de" -> "das", "de" -> "ist",
    "de" -> "von", "de" -> "den", "de" -> "ein",
    "zh" -> "de5", "zh" -> "shi4", "zh" -> "le5", "zh" -> "zai4", "zh" -> "he2")

  /** Predicted language per document: count stopword hits per language,
    * keep the best (ties → lexicographically first language); documents
    * with no hit get "und".
    *
    * Entirely map-side: per language, hits = count of tokens in that
    * language's (tiny, literal) stopword set; the argmax is an
    * `array_min` over (-hits, lang) structs — lexicographic struct
    * ordering gives max-hits with ties to the first language. No
    * explode, no join, no window: at 100 TB this is one narrow
    * projection over the text column. (The explode→broadcast-join→
    * window form computed the same thing through two shuffles and a
    * token-level row explosion.)
    */
  def languageId(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), langIdCol(col(textCol)).as("pred_lang"))

  /** Single-column form of the detector (usable as a SQL function):
    * zero-hit languages become null candidates (array_min skips
    * nulls), and an always-present (0, "und") sentinel loses to any
    * language with ≥1 hit — so ONE array_min evaluation yields the
    * final answer with no second pass over the struct (a bare
    * two-field read of the argmax would evaluate the HOF twice; CSE
    * does not span separate field accesses of the same expression).
    */
  def langIdCol(text: Column): Column = {
    val toks = tokens(text)
    val langs = stopwords.map(_._1).distinct.sorted
    val scoreRows = langs.map { lang =>
      val words = stopwords.filter(_._1 == lang).map(_._2)
      // count occurrences (not distinct): every token instance votes
      val hits = size(filter(toks, t => t.isin(words.map(lit): _*)))
      when(hits > 0, struct(negate(hits).as("neg_hits"), lit(lang).as("lang")))
        .otherwise(lit(null))
    }
    val und = struct(lit(0).as("neg_hits"), lit("und").as("lang"))
    array_min(array((scoreRows :+ und): _*)).getField("lang")
  }

  /** Quality features + a composite score.
    * Columns: n_chars, n_tokens, avg_token_len, stopword_ratio,
    * punct_ratio, quality_score (all deterministic arithmetic).
    */
  def qualityFeatures(text: Column): Seq[Column] = {
    val nChars = length(text)
    val toks = tokens(text)
    val nToks = size(toks)
    val enStop = stopwords.filter(_._1 == "en").map(_._2)
    val stopHits = size(filter(toks, t => t.isin(enStop.map(lit): _*)))
    val punct = nChars - length(regexp_replace(text, "[^a-zA-Z0-9\\s]", ""))
    val avgTokLen =
      when(nToks === 0, lit(0.0))
        .otherwise(length(regexp_replace(text, "\\s+", "")).cast("double")
          / nToks.cast("double"))
    val stopRatio = when(nToks === 0, lit(0.0))
      .otherwise(stopHits.cast("double") / nToks.cast("double"))
    val punctRatio = when(nChars === 0, lit(0.0))
      .otherwise(punct.cast("double") / nChars.cast("double"))
    // Doubles sitting exactly on a .5 rounding boundary diverge between
    // engines; routing through DECIMAL makes half-up rounding exact and
    // identical on both sides (the oracle SQL does the same).
    def r4(c: Column): Column = round(c.cast("decimal(20,10)"), 4).cast("double")
    val score = r4(
      lit(0.5) * stopRatio + lit(0.3) * (lit(1.0) - punctRatio)
        + lit(0.2) * least(avgTokLen / lit(10.0), lit(1.0)))
    Seq(nChars.cast("long").as("n_chars_m"), nToks.cast("long").as("n_tokens"),
      r4(avgTokLen).as("avg_token_len"),
      r4(stopRatio).as("stopword_ratio"),
      r4(punctRatio).as("punct_ratio"), score.as("quality_score"))
  }

  /** GPT-2-style pre-tokenizer pattern, restricted to constructs Java
    * regex and RE2 (the oracle's engine) interpret identically: the
    * contraction suffixes, space-prefixed letter/digit/punctuation
    * runs, then whitespace runs. The upstream pattern's `\s+(?!\S)`
    * lookahead is dropped (RE2 has no lookahead); both engines then
    * count a trailing-space run as one piece, so counts stay equal.
    */
  val bpePattern: String =
    """'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"""

  /** Whitespace token count, a BPE-style length estimate (ceil(chars/4)
    * — the published ~4-chars-per-token heuristic), and the piece count
    * of the GPT-2-style pre-tokenizer regex (what a BPE tokenizer would
    * split before merges; an upper bound on merged token count).
    */
  def tokenCounts(text: Column): Seq[Column] = Seq(
    size(tokens(text)).cast("long").as("ws_tokens"),
    floor((length(text) + lit(3)) / lit(4.0)).cast("long").as("bpe_est_tokens"),
    regexp_count(text, lit(bpePattern)).cast("long").as("bpe_regex_tokens"))

  /** Just the composite quality score — [[qualityFeatures]]' last
    * column, for callers that attach the score in place (map-only,
    * no join needed).
    */
  def qualityScore(text: Column): Column = qualityFeatures(text).last

  /** Canonical document fingerprint: md5 of the
    * whitespace-normalized, lowercased text.
    */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** Repetition signals (the Gopher-style repetitive-text filters):
    * per-doc distinct-token ratio, top-token share, and duplicate-
    * bigram fraction. Low distinct ratio / high top share / high
    * duplicate-bigram fraction mark boilerplate and generated spam.
    *
    * Shape: one explode + (doc, term) aggregation for the unigram
    * stats (map-side combinable; the shuffle carries per-doc-term
    * counts, never tokens) and one map-only bigram expression — the
    * bigram array is built from a MATERIALIZED token column, because
    * HOF lambdas get no CSE and would otherwise re-tokenize per
    * element. Ratios are DECIMAL-rounded so both engines round
    * identical values.
    */
  def repetitionSignals(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    def r4(c: Column): Column = round(c.cast("decimal(20,10)"), 4).cast("double")
    val toksDf = df.select(col(idCol), tokens(col(textCol)).as("toks"))
    val uni = toksDf
      .select(col(idCol), explode(col("toks")).as("term"))
      .groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
      .groupBy(idCol)
      .agg(sum("tf").as("n_tokens"), count(lit(1)).as("n_distinct"),
        max("tf").as("top_tf"))
    val bi = toksDf
      .select(col(idCol),
        graft.operators.TextDedup.wordNgrams(col("toks"), 2).as("bigrams"))
      .select(col(idCol),
        size(col("bigrams")).cast("long").as("n_bigrams"),
        size(array_distinct(col("bigrams"))).cast("long").as("n_distinct_bigrams"))
    uni.join(bi, idCol)
      .select(col(idCol), col("n_tokens"), col("n_distinct"), col("top_tf"),
        r4(col("n_distinct").cast("double") / col("n_tokens").cast("double"))
          .as("distinct_ratio"),
        r4(col("top_tf").cast("double") / col("n_tokens").cast("double"))
          .as("top_token_share"),
        when(col("n_bigrams") === 0, lit(0.0))
          .otherwise(r4(lit(1.0) - col("n_distinct_bigrams").cast("double")
            / col("n_bigrams").cast("double"))).as("dup_bigram_frac"))
  }
}
