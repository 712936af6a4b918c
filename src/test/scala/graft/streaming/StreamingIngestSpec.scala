package graft.streaming

import graft.SparkTestBase
import java.io.{File, FileOutputStream}
import java.util.zip.GZIPOutputStream
import org.apache.spark.sql.functions._

/** Structured-Streaming ingest: AvailableNow run over a directory
  * tree, checkpointed resume picking up only new files.
  */
class StreamingIngestSpec extends SparkTestBase {

  private def write(base: File, rel: String, lines: Seq[String]): Unit = {
    val f = new File(base, rel)
    f.getParentFile.mkdirs()
    val out = new GZIPOutputStream(new FileOutputStream(f))
    out.write(lines.mkString("\n").getBytes("UTF-8"))
    out.close()
  }

  private def evt(id: String, month: Int): String =
    f"""{"id":"$id%s","type":"WatchEvent","actor":{"id":1,"login":"a"},"repo":{"id":2,"name":"r"},"created_at":"2015-$month%02d-01T10:00:00Z","payload":{"action":"started"}}"""

  test("AvailableNow ingests the tree; checkpoint resume sees only new files") {
    val dir = java.nio.file.Files.createTempDirectory("stream").toFile
    val base = new File(dir, "archive"); base.mkdirs()
    val table = new File(dir, "events").getAbsolutePath
    val ckpt = new File(dir, "ckpt").getAbsolutePath
    write(base, "2015/01/01/2015-01-01-10.json.gz", Seq(evt("1", 1), evt("2", 1)))
    write(base, "2015/02/01/2015-02-01-10.json.gz", Seq(evt("3", 2)))

    val q1 = StreamingIngest.ingestAvailable(spark, base.getAbsolutePath, table, ckpt)
    q1.awaitTermination(60000)
    val t1 = spark.read.parquet(table)
    assert(t1.count() === 3)
    // monthly partitions materialized
    assert(new File(table).list().count(_.startsWith("month_key=")) === 2)

    // new hour lands; resume ingests only it
    write(base, "2015/01/01/2015-01-01-11.json.gz", Seq(evt("4", 1)))
    val q2 = StreamingIngest.ingestAvailable(spark, base.getAbsolutePath, table, ckpt)
    q2.awaitTermination(60000)
    assert(spark.read.parquet(table).count() === 4)
  }

  test("maintenance loop: streaming scatter → compact is lossless end " +
      "to end — the compacted table still dedups to the batch-merged " +
      "oracle byte for byte") {
    // round-15 VERDICT #5: the two maintenance themes composed. A
    // per-trigger streaming sink scatters one file set per micro-batch
    // (maxFilesPerTrigger = 1 forces one batch per hour file);
    // EventsWriter.compact then rewrites the month through the normal
    // range-partitioned write path; and the r61 round-trip discipline
    // applies to the WHOLE loop: after compaction, applying the
    // Replacing dedup to the streamed table must reproduce exactly
    // what the batch merge path stored from the same hour files.
    import graft.ingest.EventsWriter
    val dir = java.nio.file.Files.createTempDirectory("stream_compact").toFile
    val archive = new File(dir, "archive")
    // realistic mixed-type events (watch/push/issues/pr payloads), all
    // in month 2015-01
    val files = graft.IngestBench.generate(archive, 6, 1500)
    val tableA = new File(dir, "batch").getAbsolutePath
    EventsWriter.ingestHours(spark, files, tableA)
    val tableB = new File(dir, "stream").getAbsolutePath
    val q = StreamingIngest.ingestAvailable(spark, archive.getAbsolutePath,
      tableB, new File(dir, "ckpt").getAbsolutePath,
      maxFilesPerTrigger = Some(1))
    q.awaitTermination(180000)
    def filesInMonth: Int = new File(tableB, "month_key=201501")
      .listFiles.count(_.getName.endsWith(".parquet"))
    // the scatter premise: at least one file set per micro-batch
    assert(filesInMonth >= 6, s"expected >=6 scattered files, got $filesInMonth")
    val rowsBefore = spark.read.parquet(tableB).count()
    assert(EventsWriter.compact(spark, tableB, maxFilesPerMonth = 2)
      === Seq(201501))
    assert(filesInMonth < 6,
      s"compaction did not reduce the file count: $filesInMonth")
    // append-path row count preserved (compact rewrites, never dedups)
    assert(spark.read.parquet(tableB).count() === rowsBefore)
    // the round-trip: dedup(streamed+compacted) == batch merge path.
    // Order-insensitive full-column hash (the Verify discipline).
    def tableHash(df: org.apache.spark.sql.DataFrame): String = {
      val cols = df.columns.sorted
        .map(c => coalesce(col(c).cast("string"), lit("\u0000")))
      val r = df.select(xxhash64(concat_ws("\u0001",
          cols.toIndexedSeq: _*)).as("h"))
        .agg(count(lit(1)), sum(col("h").cast("decimal(38,0)")),
          expr("bit_xor(h)")).first()
      s"n=${r.get(0)} sum=${r.get(1)} xor=${r.get(2)}"
    }
    val streamedDedup = EventsWriter.dedup(spark.read.parquet(tableB))
    assert(tableHash(streamedDedup) === tableHash(spark.read.parquet(tableA)),
      "streamed+compacted table no longer dedups to the batch-merged " +
        "oracle — the maintenance loop lost or duplicated rows")
  }
}
