package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Stream-stream interval join semantics: in-window pairs match,
  * out-of-window and cross-user pairs don't, and a click matches
  * every in-window purchase (not just the first). */
class StreamJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("attribution: interval and key bounds hold across micro-batches") {
    val clicks = MemoryStream[(Long, String, java.sql.Timestamp)](spark)
    val purchases = MemoryStream[(Long, String, java.sql.Timestamp)](spark)
    val out = StreamJoin.attribution(
      clicks.toDF.toDF("user_id", "click_id", "click_ts"),
      purchases.toDF.toDF("user_id", "purchase_id", "purchase_ts"),
      window = "1 hour")
    val q = out.writeStream.format("memory").queryName("sj_attr")
      .outputMode(OutputMode.Append).start()
    try {
      clicks.addData(
        (1L, "c1", ts("2023-01-01 10:00:00")),
        (2L, "c2", ts("2023-01-01 10:00:00")))
      q.processAllAvailable()
      purchases.addData(
        (1L, "p1", ts("2023-01-01 10:30:00")), // in window for c1
        (1L, "p2", ts("2023-01-01 12:30:00")), // past the 1h window
        (3L, "p3", ts("2023-01-01 10:15:00"))) // no such user's click
      q.processAllAvailable()
      clicks.addData((1L, "c3", ts("2023-01-01 12:00:00"))) // later click: catches p2
      q.processAllAvailable()

      val got = spark.table("sj_attr")
        .select("click_id", "purchase_id").as[(String, String)].collect().toSet
      assert(got == Set(("c1", "p1"), ("c3", "p2")))
    } finally q.stop()
  }
}
