package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. A failed query is reported per-name in "errors"
  * (never a fake timing) and flips the exit code — the driver still gets
  * parseable JSON either way.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(cpus).getOrCreate()
    graft.functions.ChCompat.registerAll(spark)
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JIT + parquet footer caches, so the first timed
    // query isn't charged for JVM cold start
    try SparkEntry.queries("r01_count")(spark, sfDir).count()
    catch { case _: Throwable => () }
    val timings = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // min of two passes: single-run numbers on this box swing 4×
    // with background load; the min is the reproducible capability.
    // Queries over 60 s skip the second pass to bound wall time.
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      def once(): Option[Double] = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
        catch {
          case e: Throwable =>
            errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
              .replaceAll("[\"\\\\\n\r\t]", " ").take(200)
            None
        }
      }
      once().foreach { first =>
        val best = if (first > 60.0) first else once().fold(first)(math.min(first, _))
        timings(name) = best
      }
    }
    def jmap(m: scala.collection.Map[String, String]): String =
      m.map { case (k, v) => s""""$k":"$v"""" }.mkString("{", ",", "}")
    val qs = timings.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val total = timings.values.sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""errors":${jmap(errors)},"n_failed":${errors.size},"sf":"$sfDir"}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
