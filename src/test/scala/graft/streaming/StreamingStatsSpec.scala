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
