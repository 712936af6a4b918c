package graft.streaming

import graft.operators.IncrementalRollup
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming incremental rollup — the AggregatingMergeTree `-State` /
  * `-Merge` pattern ([[IncrementalRollup]], gate r30) run continuously:
  * each micro-batch's partial states fold into a persistent state
  * table, so history is NEVER rescanned; the stored table stays
  * group-count-sized regardless of how many rows streamed through.
  * This is the streaming face of the reference's continuously-
  * scheduled rollup ingestion (hourly batches folding into serving
  * tables).
  *
  * `foreachBatch` is the right sink: the merge needs the PREVIOUS
  * state generation as input, which no declarative sink exposes.
  * Exactly-once then has to be built, and is, via generation dirs:
  *
  *  - each batch writes a complete new generation `state_<batchId>`;
  *  - a single pointer file `_current` is atomically swapped (write
  *    temp + rename) to the new generation only after its parquet is
  *    fully written;
  *  - a REPLAYED batch (restart from checkpoint re-delivers the last
  *    uncommitted batch) is detected by `batchId <= lastBatchId` and
  *    skipped — merging it twice would double-count, the classic
  *    foreachBatch pitfall;
  *  - older generations are deleted best-effort after the swap; a
  *    crash at any point leaves `_current` pointing at a complete
  *    generation.
  */
object StreamingRollup {

  /** Stateful sink over a generation-versioned rollup table. Public
    * methods are also the unit-test surface (processBatch is called
    * directly to exercise replay protection without forcing a real
    * checkpoint recovery).
    */
  final class RollupSink(dims: Seq[String], valueCol: String,
      distinctCol: String, stateDir: String) extends Serializable {

    private def fs(spark: SparkSession) =
      new Path(stateDir).getFileSystem(spark.sparkContext.hadoopConfiguration)

    private def currentGen(spark: SparkSession): Option[String] = {
      val f = fs(spark); val p = new Path(stateDir, "_current")
      if (!f.exists(p)) None
      else {
        val in = f.open(p)
        try {
          val s = scala.io.Source.fromInputStream(in).mkString.trim
          if (s.isEmpty) None else Some(s)
        } finally in.close()
      }
    }

    /** Highest batch id folded into the current generation; -1 before
      * the first commit.
      */
    def lastBatchId(spark: SparkSession): Long =
      currentGen(spark).map(_.stripPrefix("state_").toLong).getOrElse(-1L)

    /** The current state table, if any generation has committed. */
    def state(spark: SparkSession): Option[DataFrame] =
      currentGen(spark).map(g => spark.read.parquet(s"$stateDir/$g"))

    /** Finalized user-facing aggregates of the current state. */
    def aggregates(spark: SparkSession): Option[DataFrame] =
      state(spark).map(IncrementalRollup.finalizeAggs)

    def processBatch(batch: Dataset[Row], batchId: Long): Unit = {
      val spark = batch.sparkSession
      val last = lastBatchId(spark)
      if (batchId <= last) return // replayed batch: already folded
      val fresh = IncrementalRollup.partials(
        batch.toDF(), dims, valueCol, distinctCol)
      val merged = state(spark) match {
        case Some(prev) => IncrementalRollup.merge(prev, fresh)
        case None => fresh
      }
      val gen = s"state_$batchId"
      merged.write.mode("overwrite").parquet(s"$stateDir/$gen")
      // atomic pointer swap: temp file + rename
      val f = fs(spark)
      val tmp = new Path(stateDir, s"_current.tmp.$batchId")
      val out = f.create(tmp, true)
      try out.write(gen.getBytes("UTF-8")) finally out.close()
      val cur = new Path(stateDir, "_current")
      if (f.exists(cur)) f.delete(cur, false)
      f.rename(tmp, cur)
      // best-effort cleanup of superseded generations
      currentGen(spark).foreach { keep =>
        val st = f.listStatus(new Path(stateDir))
        st.filter(s => s.isDirectory && s.getPath.getName.startsWith("state_")
            && s.getPath.getName != keep)
          .foreach(s => f.delete(s.getPath, true))
      }
    }
  }

  /** Start the rollup: every micro-batch of `stream` folds into the
    * state table at `stateDir`. Query results come from
    * `sink.aggregates(spark)` at any time (they reflect the last
    * committed generation).
    */
  def start(stream: DataFrame, dims: Seq[String], valueCol: String,
      distinctCol: String, stateDir: String,
      checkpointDir: String): (RollupSink, StreamingQuery) = {
    val sink = new RollupSink(dims, valueCol, distinctCol, stateDir)
    val q = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((b: Dataset[Row], id: Long) => sink.processBatch(b, id))
      .start()
    (sink, q)
  }
}
