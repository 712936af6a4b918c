package graft.bench
object P02Time {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to 3).foreach { r =>
      val t0 = System.nanoTime()
      val n = graft.queries.PipelineQueries.neardup_groups(spark, args(0)).count()
      println(f"p02 run $r: ${(System.nanoTime()-t0)/1e9}%.2fs rows=$n")
    }
    spark.stop()
  }
}
