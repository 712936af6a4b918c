package graft.bench

import graft.GraftSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale rehearsal for the dedup path (SCALE.md): blow the sf corpus
  * up M× and measure d02 (MinHash+LSH) and p02 (candidate pairs →
  * connected components) wall-time and shuffle volume, so the
  * "LSH/CC curves bend sub-quadratically" claim is a measurement, not
  * a design argument.
  *
  * The blow-up is M salted copies unioned: copy k offsets doc_id by
  * k·10⁷ (windowed candidate generators never pair across copies) and
  * rewrites the text through a copy-specific alphabet ROTATION —
  * `translate(text, a..z, rot_k(a..z))` changes essentially every
  * 5-char shingle, so cross-copy similarity is ~0 and the corpus's
  * near-dup DENSITY stays constant while N grows. (Plain copies would
  * instead add N·C(M,2) exact-dup pairs — measuring the corpus's
  * duplication blow-up, not the algorithm's scaling.)
  *
  * Usage: runMain graft.bench.ScaleRehearsal <sfDir> <mult> [workDir]
  * Prints one JSON line: wall seconds + shuffle read/write MB per query.
  */
object ScaleRehearsal {

  /** Sums shuffle bytes across completed stages (driver-side listener —
    * metrics only, no data).
    */
  private final class ShuffleMeter extends SparkListener {
    @volatile var read = 0L
    @volatile var written = 0L
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      read += sc.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead
      written += sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
    }
  }

  def saltedCorpus(spark: SparkSession, sfDir: String, mult: Int) = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    (0 until mult).map { k =>
      val rot = alpha.drop(k % 26) + alpha.take(k % 26)
      docs.select(
        (col("doc_id") + lit(k.toLong * 10000000L)).as("doc_id"),
        translate(col("text"), alpha, rot).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionAll _)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val mult = args(1).toInt
    // 26 distinct alphabet rotations exist; copy 26 would be an EXACT
    // clone of copy 0 and re-introduce the cross-copy dup blow-up the
    // salting is there to avoid (measured: M=30 tripled d02's pair
    // count via the 4 wrapped copies)
    require(mult >= 1 && mult <= 26, "mult must be in [1, 26]")
    val work = if (args.length > 2) args(2)
      else java.nio.file.Files.createTempDirectory("scale").toString
    val spark = GraftSession.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    saltedCorpus(spark, sfDir, mult).write.mode("overwrite")
      .parquet(s"$work/documents.parquet")
    val nDocs = spark.read.parquet(s"$work/documents.parquet").count()

    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)
    def time(fn: => Long): (Double, Double, Double, Long) = {
      val (r0, w0) = (meter.read, meter.written)
      val t0 = System.nanoTime()
      val rows = fn
      val sec = (System.nanoTime() - t0) / 1e9
      // listener events drain asynchronously; settle before reading
      // (listenerBus is private — a short fixed drain window suffices
      // for a measurement harness)
      Thread.sleep(1500)
      ((sec * 100).round / 100.0,
        ((meter.read - r0) / 1e6 * 10).round / 10.0,
        ((meter.written - w0) / 1e6 * 10).round / 10.0, rows)
    }

    val (d02s, d02r, d02w, d02n) =
      time(graft.queries.PipelineQueries.minhash_lsh_dedup(spark, work).count())
    val (p02s, p02r, p02w, p02n) =
      time(graft.queries.PipelineQueries.neardup_groups(spark, work).count())

    println(s"""{"mult":$mult,"docs":$nDocs,""" +
      s""""d02":{"sec":$d02s,"shuffle_read_mb":$d02r,"shuffle_write_mb":$d02w,"rows":$d02n},""" +
      s""""p02":{"sec":$p02s,"shuffle_read_mb":$p02r,"shuffle_write_mb":$p02w,"rows":$p02n}}""")
    spark.stop()
  }
}
