package graft.streaming

import graft.SparkTestBase
import java.io.{File, FileOutputStream}
import java.util.zip.GZIPOutputStream

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
}
