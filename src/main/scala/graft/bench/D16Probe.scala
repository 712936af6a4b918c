package graft.bench

import graft.GraftSession
import graft.operators.TextDedup
import org.apache.spark.sql.functions._

/** One-shot measurement for SCALE.md's d16 note: LSH candidate-pair
  * volume with and without stop-shingle removal on the same corpus —
  * the number d16's "deflates boilerplate-driven background
  * similarity" claim rests on.
  *
  * Usage: runMain graft.bench.D16Probe [sfDir]
  */
object D16Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = spark.read.parquet(s"$dir/documents.parquet")

    val plain = TextDedup.candidatePairs(
      TextDedup.lshBuckets(
        d.select(col("doc_id"),
          graft.functions.MinHashSig(col("text"), 5, 64).as("sig")),
        "doc_id", "sig", bands = 16, rowsPerBand = 4), "doc_id").count()

    val stop = d.select(explode(TextDedup.shingles(col("text"), 5)).as("sg"))
      .groupBy("sg").agg(count(lit(1)).as("df"))
      .orderBy(desc("df"), asc("sg")).limit(64)
      .select(xxhash64(col("sg")).as("h"))
      .collect().map(_.getLong(0)).sorted
    val stopLit = lit(stop)
    val filtered = TextDedup.candidatePairs(
      TextDedup.lshBuckets(
        d.select(col("doc_id"),
          graft.functions.MinHashSigFromHashes(
            filter(graft.functions.ShingleHashSorted(col("text"), 5),
              x => !array_contains(stopLit, x)), 64).as("sig")),
        "doc_id", "sig", bands = 16, rowsPerBand = 4), "doc_id").count()

    val docs = d.count()
    println(s"""{"docs":$docs,"cand_plain":$plain,"cand_stop":$filtered,""" +
      s""""reduction":${(plain.toDouble / math.max(filtered, 1) * 10).round / 10.0}}""")
    spark.stop()
  }
}
