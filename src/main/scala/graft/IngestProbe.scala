package graft.ingest

import java.io.File

/** Phase-timing diagnostic for the ingest path (dev tool):
  * runMain graft.ingest.IngestProbe [hours] [perHour]
  */
object IngestProbe {
  def main(args: Array[String]): Unit = {
    val hours = args.headOption.map(_.toInt).getOrElse(16)
    val perHour = args.lift(1).map(_.toInt).getOrElse(125000)
    val outDir = java.nio.file.Files.createTempDirectory("ingest_probe").toString
    val spark = graft.GraftSession.getOrCreate(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val files = graft.IngestBench.generate(new File(outDir, "archive"), hours, perHour)
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    val parsed = GhEventParser.ingest(spark, files)
    val keyed = EventsWriter.withMonthKey(parsed)
    val cp = t("parse+checkpoint") { keyed.localCheckpoint() }
    t("count") { println("rows=" + cp.count()) }
    val table = new File(outDir, "events").getAbsolutePath
    t("dedup+count") {
      println("deduped=" + EventsWriter.dedupShaped(cp).count())
    }
    t("merge(full)") { EventsWriter.merge(cp, table) }
    spark.stop()
  }
}
