package graft.bench

import graft.{GraftSession, SparkEntry}

/** Phase attribution for the streaming gates (optimization r18): runs
  * a named streaming gate and prints each drained query's per-batch
  * `durationMs` breakdown (addBatch / getBatch / commitOffsets /
  * walCommit / queryPlanning / triggerExecution) plus wall-clock
  * around the whole gate — the numbers that say whether the time goes
  * to state-store commits, planning, source listing, or the batch
  * compute itself. Usage:
  *
  *   runMain graft.bench.StreamProbe <sfDir> <gate> [gate...]
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val gates = if (args.length > 1) args.drop(1).toSeq
      else Seq("r54_stream_join")
    val spark = GraftSession.getOrCreate(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    gates.foreach { gate =>
      graft.queries.StreamingQueries.progressByGate = Map.empty
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(gate)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"== $gate: rows=$n wall=$wall%.2f s")
      graft.queries.StreamingQueries.progressByGate.toSeq.sortBy(_._1)
        .foreach { case (leg, progs) =>
          progs.zipWithIndex.foreach { case (p, i) =>
            val d = p.durationMs
            println(f"   $leg batch$i rows=${p.numInputRows} " +
              s"durations=$d")
          }
        }
    }
    spark.stop()
  }
}
