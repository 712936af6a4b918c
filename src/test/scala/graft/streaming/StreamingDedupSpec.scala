package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Stateful streaming semantics across micro-batches, driven by
  * MemoryStream: content dedup within the watermark horizon, and LWW
  * consolidation whose state survives batches.
  */
class StreamingDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("dedupByContent drops re-arrivals of a hash across micro-batches") {
    val in = MemoryStream[(java.sql.Timestamp, String)](spark)
    val out = StreamingDedup.dedupByContent(
      in.toDF.toDF("ts", "text"), "ts", "text", "1 hour")
    val q = out.writeStream.format("memory").queryName("sd_dedup")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData((ts("2023-01-01 10:00:00"), "alpha"),
        (ts("2023-01-01 10:00:01"), "alpha"), // dup in-batch
        (ts("2023-01-01 10:00:02"), "beta"))
      q.processAllAvailable()
      in.addData((ts("2023-01-01 10:10:00"), "alpha"), // dup across batches
        (ts("2023-01-01 10:10:01"), "gamma"))
      q.processAllAvailable()
      val texts = spark.table("sd_dedup").select("text").as[String]
        .collect().sorted.toSeq
      assert(texts === Seq("alpha", "beta", "gamma"))
    } finally q.stop()
  }

  test("consolidateNodes: LWW props and degree accumulate across batches") {
    import StreamingDedup._
    val in = MemoryStream[NodeWitness](spark)
    val q = consolidateNodes(in.toDS)
      .writeStream.format("memory").queryName("sd_lww")
      .outputMode(OutputMode.Update).start()
    try {
      in.addData(
        NodeWitness("repo", "42", "name=a", ts("2023-01-01 10:00:00")),
        NodeWitness("repo", "42", "name=b", ts("2023-01-01 11:00:00")),
        NodeWitness("actor", "7", "login=x", ts("2023-01-01 10:30:00")))
      q.processAllAvailable()
      in.addData(
        // older than current state: props must NOT regress, degree +1
        NodeWitness("repo", "42", "name=stale", ts("2023-01-01 09:00:00")))
      q.processAllAvailable()

      // memory sink in Update mode appends each emission; latest row
      // per key is the current state
      val rows = spark.table("sd_lww").as[NodeState].collect()
      val repo = rows.filter(s => s.nodeType == "repo" && s.nodeId == "42")
        .maxBy(_.degree)
      assert(repo.props === "name=b") // LWW kept the 11:00 value
      assert(repo.degree === 3L)
      assert(repo.updatedAt === ts("2023-01-01 11:00:00"))
      val actor = rows.filter(_.nodeType == "actor").maxBy(_.degree)
      assert(actor.props === "login=x" && actor.degree === 1L)
    } finally q.stop()
  }
}
