package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming funnel: out-of-order (in-horizon) arrival still yields
  * the batch operator's result, because events drain into the DP in
  * event-time order only once the watermark passes them.
  */
class StreamingFunnelSpec extends SparkTestBase {
  import spark.implicits._

  // realistic epoch base: a ts at exactly 0 sits AT the initial
  // watermark and the upstream late-row filter drops it
  private def ts(min: Int) =
    new java.sql.Timestamp(1700000000000L + min * 60000L)

  test("shuffled arrival == batch windowFunnel; level-ups emitted") {
    // user 1: a@0 b@10 c@20 (level 3); user 2: b@0 a@5 c@9 (level 1 —
    // b precedes a); user 3: a@0 b@50 c@70 + a@30 (level 3 via the
    // later chain start)
    val data = Seq(
      (1L, ts(0), 0), (1L, ts(10), 1), (1L, ts(20), 2),
      (2L, ts(0), 1), (2L, ts(5), 0), (2L, ts(9), 2),
      (3L, ts(0), 0), (3L, ts(50), 1), (3L, ts(70), 2), (3L, ts(30), 0))

    val in = MemoryStream[(Long, java.sql.Timestamp, Int)](spark)
    // lateness must cover the whole scrambled span: Spark DROPS
    // pre-watermark rows before they reach the state function, so an
    // out-of-order event is only recoverable while in-horizon
    val out = StreamingFunnel.funnel(
      in.toDF.toDF("user_id", "ts", "step"),
      nSteps = 3, windowSec = 3600, lateness = "6 hours")
    val q = out.writeStream.format("memory").queryName("sf_out")
      .outputMode(OutputMode.Update).start()
    try {
      // deliver in a scrambled order, in two batches — every event
      // stays inside the 6h horizon of every other
      val shuffled = new scala.util.Random(5).shuffle(data)
      val (b1, b2) = shuffled.splitAt(5)
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      // advance the watermark far past every event so all buffers drain
      in.addData((99L, ts(10000), 0)); q.processAllAvailable()
      in.addData((99L, ts(20000), 0)); q.processAllAvailable()

      val got = spark.table("sf_out")
        .groupBy("user_id").agg(max("level").as("level"))
        .as[(Long, Int)].collect().toMap

      // batch reference on the same events
      val batchDf = data.map { case (u, t, s) =>
        (u, t, Seq("a", "b", "c")(s)) }.toDF("user_id", "ts", "event_type")
      val want = graft.operators.Funnel.windowFunnel(
          batchDf, "user_id", "ts",
          Seq(col("event_type") === "a", col("event_type") === "b",
            col("event_type") === "c"), 3600)
        .as[(Long, Int)].collect().toMap
        .filter(_._2 > 0) // streaming emits only level-ups, no 0 rows
      assert(got.view.filterKeys(_ != 99L).toMap === want)
      assert(want === Map(1L -> 3, 2L -> 1, 3L -> 3))
    } finally q.stop()
  }

  test("drained buffer with live chain start schedules an expiry timeout; " +
      "firing it removes the state (bounded one-shot-user state)") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import StreamingFunnel._
    val step = processGroup(nSteps = 3, windowSec = 60L) _

    // watermark 100s; a step-0 event at 50s drains immediately —
    // buffer empty, but the chain start stays live until 50+60s
    val s1 = TestGroupState.create[FState](
      Optional.empty(), GroupStateTimeout.EventTimeTimeout,
      0L, Optional.of(100000L), hasTimedOut = false)
    val out1 = step(1L,
      Iterator(StepEvent(1L, new java.sql.Timestamp(50000L), 0)), s1)
    assert(out1.toSeq.map(_.level) === Seq(1))
    assert(s1.exists && !s1.isRemoved)
    // expiry wake-up: (50 + 60 + 1) s — NOT unset, else a one-shot
    // user's state would never be re-examined
    assert(s1.getTimeoutTimestampMs.get() === 111000L)

    // the timeout fires once the watermark passes the expiry: the
    // inert check re-runs and the state is removed
    val s2 = TestGroupState.create[FState](
      Optional.of(s1.get), GroupStateTimeout.EventTimeTimeout,
      0L, Optional.of(111001L), hasTimedOut = true)
    val out2 = step(1L, Iterator.empty, s2)
    assert(out2.isEmpty)
    assert(s2.isRemoved)
  }

  test("same-instant next step chains by default (CH non-decreasing), " +
      "not under strict_increase — both equal to the batch operator") {
    def run(strict: Boolean, name: String): Int = {
      val in = MemoryStream[(Long, java.sql.Timestamp, Int)](spark)
      val out = StreamingFunnel.funnel(
        in.toDF.toDF("user_id", "ts", "step"),
        nSteps = 2, windowSec = 3600, lateness = "5 minutes",
        strictIncrease = strict)
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Update).start()
      try {
        in.addData((1L, ts(0), 0), (1L, ts(0), 1))
        q.processAllAvailable()
        in.addData((9L, ts(5000), 0)); q.processAllAvailable()
        in.addData((9L, ts(9000), 0)); q.processAllAvailable()
        spark.table(name).filter(col("user_id") === 1L)
          .agg(max("level")).as[Int].collect()
          .headOption.getOrElse(0)
      } finally q.stop()
    }
    assert(run(strict = false, "sf_default") === 2)
    assert(run(strict = true, "sf_strict") === 1)
    // both modes pinned to the batch operator on the same events
    val batchDf = Seq((1L, ts(0), "a"), (1L, ts(0), "b"))
      .toDF("user_id", "ts", "event_type")
    val steps = Seq(col("event_type") === "a", col("event_type") === "b")
    def batch(strict: Boolean) = graft.operators.Funnel
      .windowFunnel(batchDf, "user_id", "ts", steps, 3600,
        strictIncrease = strict)
      .as[(Long, Int)].collect().toMap.apply(1L)
    assert(batch(strict = false) === 2)
    assert(batch(strict = true) === 1)
  }
}
