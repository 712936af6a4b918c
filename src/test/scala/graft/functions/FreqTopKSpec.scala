package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** FreqTopK heavy-hitters UDAF: exact agreement with GROUP BY in the
  * unsaturated regime, partition-count invariance (the merge path),
  * no-false-negatives at saturation, and the SQL registration path.
  */
class FreqTopKSpec extends SparkTestBase {
  import spark.implicits._

  private def topkCol(k: Int, maxMap: Int) = ColumnBridge.column(
    FreqTopK(ColumnBridge.expression(col("v")), k, maxMap)
      .toAggregateExpression())

  // Zipf-ish: value i appears ~ 600/i times
  private lazy val zipf = (1 to 30).flatMap(i =>
    Seq.fill(600 / i)(s"v$i")).toDF("v")

  private def exact(k: Int) = zipf.groupBy("v").count()
    .orderBy(col("count").desc, col("v").asc).limit(k)
    .as[(String, Long)].collect().toSeq

  test("unsaturated: equals exact GROUP BY top-k, any partitioning") {
    for (parts <- Seq(1, 7)) {
      val got = zipf.repartition(parts)
        .agg(topkCol(10, 256).as("top"))
        .select(explode(col("top")).as("t"))
        .select("t.item", "t.est")
        .as[(String, Long)].collect().toSeq
      assert(got === exact(10), s"parts=$parts")
    }
  }

  test("saturated: the dominant item survives with its estimate >= truth") {
    // 5000 distinct light values + one heavy hitter; map of 64 slots
    // saturates, but NO_FALSE_NEGATIVES keeps the true heavy hitter
    val heavy = Seq.fill(2000)("HH")
    val light = (1 to 5000).map(i => s"x$i")
    val df = scala.util.Random.shuffle(heavy ++ light).toDF("v")
    val got = df.repartition(5).agg(topkCol(1, 64).as("top"))
      .select(explode(col("top")).as("t")).select("t.item", "t.est")
      .as[(String, Long)].head()
    assert(got._1 === "HH")
    assert(got._2 >= 2000L) // Misra-Gries estimates never undercount
  }

  test("state trio: per-shard sketches merge to the direct top-k") {
    PipelineFunctions.registerAll(spark)
    zipf.withColumn("shard", pmod(crc32(col("v")), lit(5)))
      .createOrReplaceTempView("freq_sharded")
    val merged = spark.sql(
      """SELECT t.item, t.est
         FROM (SELECT explode(freq_top_items(freq_merge_agg(st), 10)) AS t
               FROM (SELECT shard, freq_sketch_agg(v, 256) AS st
                     FROM freq_sharded GROUP BY shard))""")
      .as[(String, Long)].collect().toSeq
    assert(merged === exact(10))
  }

  test("streaming aggregation: sketch state merges across micro-batches " +
      "and equals the batch result") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    val in = MemoryStream[String](spark)
    val q = in.toDF.toDF("v")
      .agg(topkCol(10, 256).as("top"))
      .writeStream.format("memory").queryName("ftk_stream")
      .outputMode(OutputMode.Complete).start()
    try {
      // deliver the zipf corpus in three micro-batches: the UDAF's
      // serialize/merge path carries the sketch through the state
      // store between batches — the streaming face of the trio test
      val rows = (1 to 30).flatMap(i => Seq.fill(600 / i)(s"v$i"))
      rows.grouped((rows.size + 2) / 3).foreach { chunk =>
        in.addData(chunk: _*); q.processAllAvailable()
      }
      val got = spark.table("ftk_stream")
        .select(explode(col("top")).as("t"))
        .select("t.item", "t.est")
        .as[(String, Long)].collect().toSeq
      assert(got === exact(10))
    } finally q.stop()
  }

  test("SQL surface: freq_topk registered via PipelineFunctions") {
    PipelineFunctions.registerAll(spark)
    zipf.createOrReplaceTempView("freq_src")
    val got = spark.sql(
      """SELECT t.item, t.est
         FROM (SELECT explode(freq_topk(v, 5, 256)) AS t FROM freq_src)""")
      .as[(String, Long)].collect().toSeq
    assert(got === exact(5))
  }

  test("topKWeighted: zero weights are no-ops, negative weights refuse") {
    ChCompat.registerAll(spark)
    Seq(("a", 5L), ("b", 3L), ("a", 0L), ("c", 0L), ("b", 1L))
      .toDF("v", "w").createOrReplaceTempView("tkw_src")
    // c appears ONLY with weight 0 — it must not surface at all, and
    // the zero rows must not crash the sketch's positive-count check
    val got = ChCompat.sql(spark,
      "SELECT topKWeighted(2)(v, w) AS top FROM tkw_src")
      .head.getSeq[String](0)
    assert(got === Seq("a", "b"))
    val err = intercept[Exception] {
      Seq(("a", -1L)).toDF("v", "w").createOrReplaceTempView("tkw_neg")
      ChCompat.sql(spark,
        "SELECT topKWeighted(1)(v, w) FROM tkw_neg").collect()
    }
    assert(err.getMessage != null)
  }
}
