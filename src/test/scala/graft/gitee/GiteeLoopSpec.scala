package graft.gitee

import graft.SparkTestBase
import graft.ingest.EventsWriter
import org.apache.spark.sql.functions._

/** Full Gitee incremental loop (A24+A25+B13+B18 together): pull canned
  * pages → normalize → Replacing-merge into the events table → the
  * watermark query reflects the new high-water mark, and a second pull
  * stopping at that watermark is idempotent.
  */
class GiteeLoopSpec extends SparkTestBase {
  import spark.implicits._

  private def star(id: Long, day: Int): String =
    f"""{"id":$id%d,"type":"StarEvent","actor":{"id":$id%d,"login":"u$id%d"},"repo":{"id":7,"full_name":"o/r"},"created_at":"2023-01-$day%02dT00:00:00Z","payload":{"action":"starred"}}"""

  test("pull -> merge -> watermark -> incremental pull is idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("gloop").toFile
    val table = new java.io.File(dir, "events").getAbsolutePath

    // first pull: ids 10..1
    val fetch1: GiteeSource.PageFetcher = (_, prevId) => {
      val start = if (prevId == 0) 10L else prevId - 1
      if (start < 1) Seq.empty else (start to math.max(start - 4, 1) by -1).map(i => star(i, i.toInt))
    }
    val batch1 = GiteeSource.pullRepo(spark, fetch1, "o/r")
    EventsWriter.merge(batch1, table)
    val t1 = spark.read.parquet(table)
    assert(t1.count() === 10)

    // watermark over the stored table
    val dim = Seq((7L, "o/r", "repo")).toDF("id", "name", "type")
    val wm = GiteeSource.watermarks(t1, dim).head()
    val maxId = wm.getAs[Long]("max_id")
    assert(maxId === 10L)

    // second pull: ids 14..1 available, but stop at the stored maxId
    val fetch2: GiteeSource.PageFetcher = (_, prevId) => {
      val start = if (prevId == 0) 14L else prevId - 1
      if (start < 1) Seq.empty else (start to math.max(start - 4, 1) by -1).map(i => star(i, (i % 27 + 1).toInt))
    }
    val batch2 = GiteeSource.pullRepo(spark, fetch2, "o/r", stopAtId = maxId)
    EventsWriter.merge(batch2, table)
    val t2 = spark.read.parquet(table)
    // 4 new events (11..14); overlapping re-pulled rows dedup away
    assert(t2.count() === 14)
    assert(t2.agg(countDistinct("id")).head.getLong(0) === 14)

    // merging the same batch again changes nothing (idempotent)
    EventsWriter.merge(batch2, table)
    assert(spark.read.parquet(table).count() === 14)
  }
}
