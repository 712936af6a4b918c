package graft.pipeline

import graft.SparkTestBase
import graft.ingest.FilePipeline.Status
import java.io.{File, FileOutputStream}
import java.util.zip.GZIPOutputStream

/** End-to-end pipeline pass over a local GH Archive directory tree
  * (SURVEY A30): discovery, exist-check, validation, import,
  * reconciliation — all against a parquet checkpoint table.
  */
class OrchestratorSpec extends SparkTestBase {

  private def write(base: File, rel: String, lines: Seq[String]): Unit = {
    val f = new File(base, rel)
    f.getParentFile.mkdirs()
    val out = new GZIPOutputStream(new FileOutputStream(f))
    out.write(lines.mkString("\n").getBytes("UTF-8"))
    out.close()
  }

  // distinct actor per event: WatchEvents by the same actor/repo in the
  // same month share the full ReplacingMergeTree ORDER BY key and
  // legitimately collapse to one row (SURVEY §1.4) — which would then
  // trip the reconciler for the hour whose rows were absorbed.
  private def evt(id: String, hour: Int): String =
    f"""{"id":"$id%s","type":"WatchEvent","actor":{"id":$id%s,"login":"a$id%s"},"repo":{"id":2,"name":"r"},"created_at":"2015-01-01T$hour%02d:00:00Z","payload":{"action":"started"}}"""

  test("runOnce: discovers, validates, imports present hours; absent stay NeedDownload") {
    val dir = java.nio.file.Files.createTempDirectory("orch").toFile
    val base = new File(dir, "archive"); base.mkdirs()
    // hours 0 and 1 present on disk, hour 2 missing
    write(base, "2015/01/01/2015-01-01-0.json.gz", Seq(evt("1", 0), evt("2", 0)))
    write(base, "2015/01/01/2015-01-01-1.json.gz", Seq(evt("3", 1)))
    val table = new File(dir, "events").getAbsolutePath
    val metaPath = new File(dir, "meta").getAbsolutePath

    val meta = Orchestrator.runOnce(spark, base.getAbsolutePath, table, metaPath,
      "2015-01-01 00:00:00", "2015-01-01 03:00:00")
    val st = meta.collect().map(r =>
      r.getAs[String]("path") -> r.getAs[Int]("status")).toMap
    assert(st("2015/01/01/2015-01-01-0.json.gz") === Status.Imported)
    assert(st("2015/01/01/2015-01-01-1.json.gz") === Status.Imported)
    assert(st("2015/01/01/2015-01-01-2.json.gz") === Status.NeedDownload)
    assert(spark.read.parquet(table).count() === 3)

    // idempotence: a second pass changes nothing
    val meta2 = Orchestrator.runOnce(spark, base.getAbsolutePath, table, metaPath,
      "2015-01-01 00:00:00", "2015-01-01 03:00:00")
    assert(meta2.collect().map(r =>
      r.getAs[String]("path") -> r.getAs[Int]("status")).toMap === st)
    assert(spark.read.parquet(table).count() === 3)

    // non-reentrant guard (A30): a held lock skips the run; a released
    // (or stale) lock lets it proceed
    val lock = new File(metaPath + ".lock")
    assert(lock.createNewFile())
    assert(Orchestrator.runGuarded(spark, base.getAbsolutePath, table, metaPath,
      "2015-01-01 00:00:00", "2015-01-01 03:00:00").isEmpty)
    assert(lock.exists, "a skipped run must not release someone else's lock")
    assert(lock.setLastModified(System.currentTimeMillis() - 10_000))
    assert(Orchestrator.runGuarded(spark, base.getAbsolutePath, table, metaPath,
      "2015-01-01 00:00:00", "2015-01-01 03:00:00",
      staleLockMs = 1000L).isDefined) // stale → reclaimed and run
    assert(!lock.exists, "a completed run releases the lock")
  }
}
