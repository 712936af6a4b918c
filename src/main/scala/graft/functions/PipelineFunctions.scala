package graft.functions

import graft.operators.{Sampling, Similarity, TextDedup}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.functions.struct
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL surface for the LLM-data-pipeline functions: the same registry
  * pattern as [[ChCompat]] (analyzer-level expression builders, no
  * UDFs), so `spark-sql`/Thrift/notebook users can run the dedup,
  * similarity, and text-analysis primitives from plain SQL —
  *
  * {{{
  *   SELECT doc_id, lang_id(text), quality_features(text).quality_score
  *   FROM documents
  *   WHERE shingle_jaccard(text, other_text, 5) >= 0.35
  * }}}
  *
  * Builders resolve to the native Catalyst expressions
  * ([[MinHashSig]], [[SimHashSig]], [[ShingleJaccard]],
  * [[ShingleHashSorted]], [[SortedLongJaccard]], [[OphSig]]) or to the
  * same codegen'd column compositions the Scala API uses — SQL and
  * Column callers hit identical execution paths. Shape parameters
  * (shingle width, permutation count) must be integer literals: they
  * size per-row primitive arrays at plan time.
  */
object PipelineFunctions {

  private def litInt(es: Seq[Expression], i: Int, fn: String): Int =
    es(i) match {
      case Literal(v: Int, IntegerType) => v
      case Literal(v: Long, LongType) => v.toInt
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} must be an integer literal, got $other")
    }

  private def litStr(es: Seq[Expression], i: Int, fn: String): String =
    es(i) match {
      case Literal(v: UTF8String, StringType) => v.toString
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} must be a string literal, got $other")
    }

  private def litNum(es: Seq[Expression], i: Int, fn: String): Double =
    es(i) match {
      case Literal(v: Double, DoubleType) => v
      case Literal(v: Int, IntegerType) => v.toDouble
      case Literal(v: Long, LongType) => v.toDouble
      case Literal(v: java.math.BigDecimal, _) => v.doubleValue()
      case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} must be a numeric literal, got $other")
    }

  /** Lift a Column-API composition into a SQL builder. */
  private def viaColumns(f: Seq[Column] => Column): Seq[Expression] => Expression =
    es => ColumnBridge.expression(f(es.map(ColumnBridge.column)))

  /** name -> expression builder, applied by the analyzer with the same
    * implicit type coercion as built-ins.
    */
  val builders: Map[String, Seq[Expression] => Expression] = Map(
    // near-dup signatures (native expressions)
    "minhash_sig" -> (es => MinHashSig(es(0),
      litInt(es, 1, "minhash_sig"), litInt(es, 2, "minhash_sig"))),
    "oph_sig" -> (es => OphSig(es(0),
      litInt(es, 1, "oph_sig"), litInt(es, 2, "oph_sig"))),
    "simhash_sig" -> (es => SimHashSig(es(0))),
    // exact verification
    "shingle_jaccard" -> (es => ShingleJaccard(es(0), es(1),
      litInt(es, 2, "shingle_jaccard"))),
    "shingle_hashes_sorted" -> (es => ShingleHashSorted(es(0),
      litInt(es, 1, "shingle_hashes_sorted"))),
    "sorted_jaccard" -> (es => SortedLongJaccard(es(0), es(1))),
    "sorted_intersect" -> (es => SortedLongIntersect(es(0), es(1))),
    "token_hashes_sorted" -> (es => TokenHashSorted(es(0))),
    "hamming64" -> viaColumns(cs => TextDedup.hamming64(cs(0), cs(1))),
    // embeddings
    "cosine_sim" -> viaColumns(cs => Similarity.cosine(cs(0), cs(1))),
    // text analysis
    "lang_id" -> viaColumns(cs => TextFunctions.langIdCol(cs(0))),
    "quality_features" -> viaColumns(cs =>
      struct(TextFunctions.qualityFeatures(cs(0)): _*)),
    "token_counts" -> viaColumns(cs =>
      struct(TextFunctions.tokenCounts(cs(0)): _*)),
    "doc_fingerprint" -> viaColumns(cs => TextFunctions.fingerprint(cs(0))),
    // corpus cleaning: PII redaction + web-corpus URL canonicalization
    "scrub_pii" -> viaColumns(cs => ScrubFunctions.scrubPii(cs(0))),
    "pii_counts" -> viaColumns(cs =>
      struct(ScrubFunctions.piiCounts(cs(0)): _*)),
    "canonical_url" -> viaColumns(cs => ScrubFunctions.canonicalUrl(cs(0))),
    // containment dedup
    "overlap_coefficient" -> viaColumns(cs =>
      TextDedup.overlapCoefficient(cs(0), cs(1))),
    // multimodal: image content-dedup key (decoded-raster FNV-1a)
    "raster_hash" -> (es => RasterHash(es.head)),
    // deterministic sampling/splits: split weights are (name, weight)
    // literal pairs — split_label(id, 'train', 0.9, 'val', 0.1)
    // heavy hitters: freq_topk(x, k[, maxMapSize]) — bounded-memory
    // mergeable top-K (see FreqTopK)
    "freq_topk" -> (es => FreqTopK(
      org.apache.spark.sql.catalyst.expressions.Cast(es(0), StringType),
      litInt(es, 1, "freq_topk"),
      if (es.length > 2) litInt(es, 2, "freq_topk") else 1024)),
    // frequent-items state trio (see FreqSketchAgg scaladoc)
    "freq_sketch_agg" -> (es => FreqSketchAgg(
      org.apache.spark.sql.catalyst.expressions.Cast(es(0), StringType),
      if (es.length > 1) litInt(es, 1, "freq_sketch_agg") else 1024)),
    "freq_merge_agg" -> (es => FreqMergeAgg(es(0),
      if (es.length > 1) litInt(es, 1, "freq_merge_agg") else 1024)),
    "freq_top_items" -> (es => {
      require(es.length == 2, "freq_top_items(sketch, k) takes 2 arguments")
      FreqTopItems(es(0),
        org.apache.spark.sql.catalyst.expressions.Cast(es(1), IntegerType))
    }),
    // mergeable quantile state (KLL), mirroring the HLL trio
    "kll_sketch_agg" -> (es => KllSketchAgg(
      org.apache.spark.sql.catalyst.expressions.Cast(es(0), DoubleType),
      if (es.length > 1) litInt(es, 1, "kll_sketch_agg") else 200)),
    "kll_merge_agg" -> (es => KllMergeAgg(es(0),
      if (es.length > 1) litInt(es, 1, "kll_merge_agg") else 200)),
    // rank array cast to array<double> here: SQL fractional literals
    // arrive as decimals and the expression reads doubles
    "kll_quantiles" -> (es => KllQuantiles(es(0),
      org.apache.spark.sql.catalyst.expressions.Cast(
        es(1), ArrayType(DoubleType)))),
    "hash_bucket" -> viaColumns(cs => Sampling.hashBucket(cs(0))),
    "split_label" -> (es => {
      require(es.length >= 5 && es.length % 2 == 1,
        "split_label(id, name1, w1, name2, w2, ...) needs >= 2 literal pairs")
      val pairs = (1 until es.length by 2).map(i =>
        (litStr(es, i, "split_label"), litNum(es, i + 1, "split_label")))
      ColumnBridge.expression(
        Sampling.splitLabel(ColumnBridge.column(es(0)), pairs))
    }),
  )

  def registerAll(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, b, "built-in")
    }
}
