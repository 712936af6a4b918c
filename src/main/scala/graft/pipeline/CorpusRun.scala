package graft.pipeline

import graft.GraftSession

/** CLI entry for the corpus-materialization pipeline: read a documents
  * parquet (doc_id, text, lang, …), run clean → dedup → split → pack,
  * write the partitioned training corpus, print a one-line summary.
  *
  * Usage: runMain graft.pipeline.CorpusRun <documentsParquet> <outDir>
  *          [minQuality] [maxDupBigram] [budget]
  */
object CorpusRun {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: CorpusRun <documentsParquet> <outDir> [minQuality] [maxDupBigram] [budget]")
    val Array(in, out) = args.take(2)
    val minQuality = args.lift(2).map(_.toDouble).getOrElse(0.4)
    val maxDupBigram = args.lift(3).map(_.toDouble).getOrElse(0.5)
    val budget = args.lift(4).map(_.toLong).getOrElse(2048L)
    val spark = GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val result = CorpusWriter.write(spark.read.parquet(in), out,
      minQuality = minQuality, maxDupBigram = maxDupBigram, budget = budget)
    val kept = result.count()
    val shards = result.select("split", "lang", "shard_id").distinct().count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(s"""{"kept":$kept,"shards":$shards,"sec":${math.round(sec * 100) / 100.0},"out":"$out"}""")
    spark.stop()
  }
}
