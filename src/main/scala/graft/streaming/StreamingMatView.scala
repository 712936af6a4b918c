package graft.streaming

import graft.functions.ChMatView
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** A registered [[ChMatView]] maintained CONTINUOUSLY from a stream —
  * ClickHouse's materialized view is already an insert trigger, so the
  * streaming spelling is exactly `foreachBatch(applyBlock)`: each
  * micro-batch is one inserted block whose partial aggregates append
  * to the target, and reads merge via [[ChMatView.readMerged]].
  *
  * Replay protection: a restart from checkpoint re-delivers the last
  * uncommitted batch; appending its partials twice would double-count
  * (the foreachBatch pitfall [[StreamingRollup]] documents). A
  * batch-id pointer file (temp + atomic rename) skips batches already
  * applied. The crash window between the target append and the
  * pointer swap leaves AT-LEAST-ONCE semantics — the same contract as
  * ClickHouse itself, whose MV inserts into non-replicated tables
  * double-apply on insert retry (replicated CH dedups by block hash;
  * an idempotent-append analogue here would need a transactional
  * table format, out of scope by design).
  */
object StreamingMatView {

  /** Start the continuous maintenance query. `stateDir` holds both
    * the checkpoint and the replay-guard pointer.
    */
  def maintain(spark: SparkSession, name: String, source: DataFrame,
      stateDir: String,
      trigger: Trigger = Trigger.ProcessingTime("10 seconds")): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", s"$stateDir/ckpt")
      .trigger(trigger)
      .foreachBatch { (df: DataFrame, id: Long) =>
        processBatch(spark, name, df, id, stateDir); ()
      }
      .start()

  /** One micro-batch = one MV insert block. Returns true when the
    * block was applied, false when skipped as a replay. Public as the
    * unit-test surface (same pattern as StreamingRollup.processBatch).
    */
  def processBatch(spark: SparkSession, name: String, block: DataFrame,
      batchId: Long, stateDir: String): Boolean = {
    if (batchId <= lastBatchId(spark, stateDir)) return false
    ChMatView.applyBlock(spark, name, block)
    commitBatchId(spark, stateDir, batchId)
    true
  }

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def pointer(dir: String) = new Path(dir, "_mv_last_batch")

  def lastBatchId(spark: SparkSession, dir: String): Long = {
    val f = fs(spark, dir); val p = pointer(dir)
    if (!f.exists(p)) -1L
    else {
      val in = f.open(p)
      try {
        val s = scala.io.Source.fromInputStream(in).mkString.trim
        if (s.isEmpty) -1L else s.toLong
      } finally in.close()
    }
  }

  private def commitBatchId(spark: SparkSession, dir: String,
      id: Long): Unit = {
    val f = fs(spark, dir)
    val tmp = new Path(dir, s"_mv_last_batch.tmp")
    val out = f.create(tmp, true)
    try out.write(id.toString.getBytes("UTF-8")) finally out.close()
    // rename is atomic on a real filesystem; overwrite the old pointer
    f.delete(pointer(dir), false)
    f.rename(tmp, pointer(dir))
  }
}
