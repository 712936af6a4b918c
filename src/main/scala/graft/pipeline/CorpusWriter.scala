package graft.pipeline

import graft.functions.TextFunctions
import graft.operators.{Dedup, Packing, Sampling}
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** The end of the training-data pipeline: materialize a cleaned,
  * deduplicated, split-labeled, shard-packed corpus as partitioned
  * parquet a trainer can read shard-by-shard.
  *
  * Stage order is chosen for shuffle economy:
  *   1. map-only filters first (language, quality, repetition gates)
  *      — they cut the corpus BEFORE anything shuffles;
  *   2. exact dedup (hash-groupBy on md5 — the shuffle carries
  *      (hash, id), never text);
  *   3. split labeling (map-only md5 buckets, cross-engine
  *      reproducible);
  *   4. token-budget packing per (split, lang) — the window's
  *      partition key doubles as the output layout, so the pack
  *      window, the range exchange, and the partitionBy writer all
  *      reuse ONE clustering. A hot (split, lang) still spans tasks:
  *      the range exchange includes shard position.
  *
  * Layout: `path/split=…/lang=…/part-*.parquet`, rows carrying
  * shard_id ordered by (shard_id, doc id) within files, so a trainer
  * maps "one shard" to a contiguous row range with parquet row-group
  * pruning on shard_id — no small-files explosion from
  * per-shard directories when shards number in the millions.
  */
object CorpusWriter {

  /** Clean + dedup + label + pack `docs` (needs doc_id, text, lang) and
    * write to `path`. Returns the materialized frame (re-read from
    * `path`) so callers can chain.
    */
  def write(docs: DataFrame, path: String,
      minQuality: Double = 0.4, maxDupBigram: Double = 0.5,
      splits: Seq[(String, Double)] = Seq("train" -> 0.98, "val" -> 0.02),
      budget: Long = 2048L): DataFrame = {
    val s = docs.sparkSession

    // 1. quality score attached IN PLACE (map-only — no self-join for
    // a per-row expression); repetition signals are the one genuine
    // aggregation, so they are the one join
    val rep = TextFunctions.repetitionSignals(docs, "doc_id", "text")
      .select("doc_id", "dup_bigram_frac", "n_tokens")
    val kept = docs
      .withColumn("quality_score", TextFunctions.qualityScore(col("text")))
      .join(rep, "doc_id")
      .filter(col("quality_score") >= minQuality &&
        col("dup_bigram_frac") <= maxDupBigram)

    // 2. exact dedup: keep min doc_id per content hash
    val keepIds = kept
      .groupBy(md5(col("text")).as("__h"))
      .agg(min("doc_id").as("doc_id"))
      .drop("__h")
    val deduped = kept.join(keepIds, "doc_id")

    // 3 + 4. split label, then pack per (split, lang)
    val labeled = deduped
      .withColumn("split", Sampling.splitLabel(col("doc_id"), splits))
    val packed = Packing.packByTokenBudget(
      labeled, Seq("split", "lang"), Seq("doc_id"), "n_tokens", budget)

    packed
      .repartitionByRange(col("split"), col("lang"), col("shard_id"), col("doc_id"))
      .sortWithinPartitions("shard_id", "doc_id")
      .write.mode(SaveMode.Overwrite)
      .partitionBy("split", "lang")
      .parquet(path)
    s.read.parquet(path)
  }
}
