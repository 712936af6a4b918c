package graft.bench

import graft.GraftSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Per-stage shuffle attribution for one gate query — the tool that
  * answers "WHICH exchange is the 12 GB?" when a rehearsal-scale run's
  * total disagrees with the static plan's accounting (AQE re-plans,
  * re-used subtrees and skew splits all hide from explain()).
  *
  * Usage: runMain graft.bench.StageProbe <dataDir> <gateName>
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val gate = args(1)
    val spark = GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    final class StageLog extends SparkListener {
      val rows = scala.collection.mutable.ArrayBuffer.empty[String]
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        val rd = m.shuffleReadMetrics.totalBytesRead / 1e6
        val wr = m.shuffleWriteMetrics.bytesWritten / 1e6
        val rrec = m.shuffleReadMetrics.recordsRead
        val wrec = m.shuffleWriteMetrics.recordsWritten
        // every stage, not just shuffle-heavy ones: executorRunTime vs
        // numTasks is what exposes a single-task map stage hogging the
        // wall (the d17 diagnosis this probe gained the column for)
        rows += f"stage ${si.stageId}%4d tasks=${si.numTasks}%4d " +
          f"cpu=${m.executorRunTime / 1e3}%7.1fs " +
          f"read=${rd}%9.1fMB/${rrec}%11d wrote=${wr}%9.1fMB/${wrec}%11d " +
          si.name.takeWhile(_ != '\n').take(60)
      }
    }
    val log = new StageLog
    spark.sparkContext.addSparkListener(log)
    val t0 = System.nanoTime()
    // aggregate a hash of EVERY output column — under .count() Catalyst
    // prunes final projections and cardinality-preserving subtrees
    // (left-outer joins on unique keys, windows), so the per-stage
    // attribution would describe a cheaper plan than the bench runs
    // (the same trap the edit-mode rehearsal works around)
    import org.apache.spark.sql.functions._
    val df = graft.SparkEntry.queries(gate)(spark, dir)
    val cols = df.columns.map(c => coalesce(col(c).cast("string"), lit("")))
    val r = df.select(xxhash64(concat_ws("\u0001", cols.toIndexedSeq: _*)).as("h"))
      .agg(count(lit(1)), sum(col("h").cast("decimal(38,0)"))).first()
    val n = r.getLong(0)
    val sec = (System.nanoTime() - t0) / 1e9
    org.apache.spark.graft.ListenerBridge.flush(spark.sparkContext)
    println(f"== $gate rows=$n wall=${sec}%.1fs ==")
    log.rows.foreach(println)
    spark.stop()
  }
}
