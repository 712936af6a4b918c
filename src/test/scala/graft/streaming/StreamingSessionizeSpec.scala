package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming gap-sessionization semantics: sessions close via
  * event-time timeout when the watermark passes last-event + gap,
  * in-batch gaps split sessions, and counts/bounds are exact.
  */
class StreamingSessionizeSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("sessions: timeout closes on watermark, in-batch gap splits, session extends across batches") {
    val in = MemoryStream[(Long, java.sql.Timestamp)](spark)
    // lateness 2h: the watermark stays behind the batch-2 extension
    // event, so it is accepted (a tighter horizon would drop it — the
    // correct trade, verified the hard way)
    val out = StreamingSessionize.sessions(
      in.toDF.toDF("user_id", "ts"), gap = "30 minutes", lateness = "2 hours")
    val q = out.writeStream.format("memory").queryName("ss_sess")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1: two events 10 min apart (one session, extended across
      // the next batch); user 2: two events 1 h apart IN ONE BATCH —
      // the first session must close inline, without any timeout
      in.addData(
        (1L, ts("2023-01-01 10:00:00")),
        (1L, ts("2023-01-01 10:10:00")),
        (2L, ts("2023-01-01 10:00:00")),
        (2L, ts("2023-01-01 11:00:00")))
      q.processAllAvailable()
      in.addData((1L, ts("2023-01-01 10:20:00"))) // extends user 1's session
      q.processAllAvailable()
      val afterInline = spark.table("ss_sess")
        .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)].collect().toSet
      assert(afterInline ==
        Set((2L, ts("2023-01-01 10:00:00"), ts("2023-01-01 10:00:00"), 1L)))

      // advance the watermark far past every open session's deadline
      in.addData((9L, ts("2023-01-01 23:00:00")))
      q.processAllAvailable()
      in.addData((9L, ts("2023-01-01 23:59:00"))) // one more batch so timeouts fire
      q.processAllAvailable()

      val all = spark.table("ss_sess")
        .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)].collect().toSet
      assert(all.contains(
        (1L, ts("2023-01-01 10:00:00"), ts("2023-01-01 10:20:00"), 3L)))
      assert(all.contains(
        (2L, ts("2023-01-01 11:00:00"), ts("2023-01-01 11:00:00"), 1L)))
    } finally q.stop()
  }

  test("late events: inside-gap extends session start backward; far-before emits own session") {
    val in = MemoryStream[(Long, java.sql.Timestamp)](spark)
    val out = StreamingSessionize.sessions(
      in.toDF.toDF("user_id", "ts"), gap = "30 minutes", lateness = "6 hours")
    val q = out.writeStream.format("memory").queryName("ss_late")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData((1L, ts("2023-01-01 10:00:00")))
      q.processAllAvailable()
      // batch 2: one late event 15 min BEFORE start (inside gap → must
      // extend start backward), one 3 h before (outside gap → its own
      // immediate single-event session, NOT absorbed)
      in.addData((1L, ts("2023-01-01 09:45:00")), (1L, ts("2023-01-01 07:00:00")))
      q.processAllAvailable()
      val inline = spark.table("ss_late")
        .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)].collect().toSet
      assert(inline == Set(
        (1L, ts("2023-01-01 07:00:00"), ts("2023-01-01 07:00:00"), 1L)))

      // advance the watermark far past the open session's deadline
      in.addData((9L, ts("2023-01-01 23:00:00")))
      q.processAllAvailable()
      in.addData((9L, ts("2023-01-01 23:59:00")))
      q.processAllAvailable()
      val all = spark.table("ss_late")
        .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)].collect().toSet
      // the open session closed with its start extended to 09:45
      assert(all.contains(
        (1L, ts("2023-01-01 09:45:00"), ts("2023-01-01 10:00:00"), 2L)))
    } finally q.stop()
  }
}
