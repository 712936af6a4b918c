package graft.streaming

import graft.SparkTestBase
import graft.functions.ChMatView
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming materialized view: micro-batches run through the view's
  * SELECT as insert blocks, the merged read equals one flat
  * aggregation over everything streamed, and a replayed batch never
  * double-counts.
  */
class StreamingMatViewSpec extends SparkTestBase {
  import spark.implicits._

  private def cleanup(names: String*): Unit = names.foreach { n =>
    spark.sql(s"DROP TABLE IF EXISTS $n")
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(s"spark-warehouse/$n"))
  }

  test("stream maintains the MV; merged read == flat GROUP BY; " +
      "replayed batch is a no-op") {
    cleanup("smv1__inner")
    val dir = java.nio.file.Files.createTempDirectory("smv").toString
    // an empty bound source so CREATE can resolve the view SELECT later
    Seq.empty[(Int, Double)].toDF("uid", "v")
      .createOrReplaceTempView("smv_src")
    ChMatView.create(spark,
      """CREATE MATERIALIZED VIEW smv1 ENGINE = SummingMergeTree AS
        |SELECT uid, count(*) AS cnt, sum(v) AS sv
        |FROM smv_src GROUP BY uid""".stripMargin)

    val b1 = Seq((1, 10.0), (1, 20.0), (2, 5.0))
    val b2 = Seq((1, 30.0), (3, 1.0))

    val in = MemoryStream[(Int, Double)](spark)
    val q = StreamingMatView.maintain(spark, "smv1",
      in.toDF.toDF("uid", "v"), dir,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      assert(StreamingMatView.lastBatchId(spark, dir) === 1L)
    } finally q.stop()

    def merged() = ChMatView.readMerged(spark, "smv1").orderBy("uid")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(merged() === Seq((1, 3L, 60.0), (2, 1L, 5.0), (3, 1L, 1.0)))

    // replayed block (same batch id) must be skipped
    val applied = StreamingMatView.processBatch(spark, "smv1",
      b1.toDF("uid", "v"), batchId = 0L, dir)
    assert(!applied)
    assert(merged() === Seq((1, 3L, 60.0), (2, 1L, 5.0), (3, 1L, 1.0)))

    // a NEW batch id applies
    val applied2 = StreamingMatView.processBatch(spark, "smv1",
      Seq((2, 5.0)).toDF("uid", "v"), batchId = 2L, dir)
    assert(applied2)
    assert(merged() === Seq((1, 3L, 60.0), (2, 2L, 10.0), (3, 1L, 1.0)))
  }
}
