package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Windowed streaming aggregation semantics: windows close exactly when
  * the watermark passes, in-horizon late events still count, and
  * too-late events are dropped.
  */
class StreamingStatsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("sketchActivity: streamed window sketches merge with a batch " +
      "cube to exact distincts (coupon regime)") {
    import org.apache.spark.sql.functions._
    val in = MemoryStream[(java.sql.Timestamp, Long, Long, String)](spark)
    val out = StreamingStats.sketchActivity(
      in.toDF.toDF("created_at", "repo_id", "actor_id", "type"),
      dims = Seq("repo_id"), distinctCol = "actor_id",
      lateness = "30 minutes")
    val q = out.writeStream.format("memory").queryName("ss_sketch")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        (ts("2023-01-01 10:05:00"), 1L, 100L, "PushEvent"),
        (ts("2023-01-01 10:20:00"), 1L, 101L, "WatchEvent"),
        (ts("2023-01-01 10:40:00"), 1L, 100L, "PushEvent"),
        (ts("2023-01-01 11:40:00"), 1L, 102L, "PushEvent"),
        (ts("2023-01-01 13:00:00"), 1L, 103L, "X")) // closes both
      q.processAllAvailable()
      val streamed = spark.table("ss_sketch")
      assert(streamed.count() === 2) // 10:00 and 11:00 windows closed
      // batch-side shard over the same repo with one overlapping and
      // one new actor; union with the streamed shards and roll up
      val batch = graft.operators.Sketches.sketchCube(
        Seq((1L, 101L), (1L, 999L)).toDF("repo_id", "actor_id"),
        Seq("repo_id"), "actor_id")
      val merged = graft.operators.Sketches.rollupEstimate(
        streamed.select(col("repo_id"), col("actor_id_sketch"))
          .unionByName(batch), Seq("repo_id"), "actor_id_sketch")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // exact across the boundary: {100,101,102} streamed ∪ {101,999}
      assert(merged === Map(1L -> 4L))
    } finally q.stop()
  }

  test("repoActivity: append-mode windows finalize on watermark, late-beyond-horizon drops") {
    val in = MemoryStream[(java.sql.Timestamp, Long, Long, String)](spark)
    val out = StreamingStats.repoActivity(
      in.toDF.toDF("created_at", "repo_id", "actor_id", "type"),
      lateness = "30 minutes")
    val q = out.writeStream.format("memory").queryName("ss_act")
      .outputMode(OutputMode.Append).start()
    try {
      // two repos inside the 10:00 window
      in.addData(
        (ts("2023-01-01 10:05:00"), 1L, 100L, "PushEvent"),
        (ts("2023-01-01 10:20:00"), 1L, 101L, "WatchEvent"),
        (ts("2023-01-01 10:40:00"), 2L, 100L, "PushEvent"))
      q.processAllAvailable()
      // nothing emitted yet: watermark hasn't passed 11:00
      assert(spark.table("ss_act").count() === 0)

      // in-horizon late event for repo 1, plus an event that advances
      // the watermark past 11:00 + 30min
      in.addData(
        (ts("2023-01-01 10:50:00"), 1L, 102L, "PushEvent"), // still open
        (ts("2023-01-01 11:45:00"), 3L, 103L, "WatchEvent"))
      q.processAllAvailable()
      in.addData( // too late for the (now closed) 10:00 window: dropped
        (ts("2023-01-01 10:59:00"), 1L, 999L, "WatchEvent"))
      q.processAllAvailable()

      val closed = spark.table("ss_act")
        .select("repo_id", "n_events", "n_actors", "n_pushes")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
      // the 10:00 window emitted exactly once per repo, late row included
      assert(closed(1L) === ((3L, 3L, 2L))) // 10:05, 10:20, late 10:50
      assert(closed(2L) === ((1L, 1L, 1L)))
      assert(!closed.contains(3L)) // 11:00 window still open
    } finally q.stop()
  }
}
