package graft.bench

import org.apache.spark.sql.functions._

/** Dev harness: explain + run the d15 incremental-probe leg against a
  * persisted rehearsal index dir, printing the formatted plan so the
  * exchange inputs are inspectable (which side shuffles, what rides
  * in it). Usage: runMain graft.bench.D15Probe <workDir> <sfDir>
  */
object D15Probe {
  def main(args: Array[String]): Unit = {
    val Array(work, sfDir) = args.take(2)
    val spark = graft.GraftSession
      .builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val idx = spark.read.parquet(s"$work/d15_index.parquet")
    val sh = spark.read.parquet(s"$work/d15_sh.parquet")
    val probeDocs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") % 2 === 1)
    val prb = graft.operators.TextDedup.lshBuckets(
      probeDocs.select(col("doc_id"),
        graft.functions.MinHashSig(col("text"), 5, 64).as("sig")),
      "doc_id", "sig", bands = 16, rowsPerBand = 4)
    val cand = graft.operators.TextDedup
      .candidatePairsAcross(prb, idx, "doc_id")
      .filter(col("probe_id") =!= col("index_id"))
    val prbSh = probeDocs.select(col("doc_id").as("probe_id"),
      graft.functions.ShingleHashSorted(col("text"), 5).as("sh_a"))
    val out = cand.join(prbSh, Seq("probe_id"))
      .join(sh.select(col("doc_id").as("index_id"), col("sh").as("sh_b")),
        Seq("index_id"))
      .withColumn("inter", graft.functions.SortedLongIntersect(
        col("sh_a"), col("sh_b")))
      .withColumn("un",
        size(col("sh_a")) + size(col("sh_b")) - col("inter"))
      .filter(col("inter").cast("double") / col("un") >= 0.8)
    println("=== candidate count (pre-verify): " + cand.count())
    println(out.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    println("=== verified: " + out.count())
    spark.stop()
  }
}
