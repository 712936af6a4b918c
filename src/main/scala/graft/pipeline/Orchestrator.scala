package graft.pipeline

import graft.ingest._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch pipeline orchestrator (SURVEY A30; reference:
  * app/schedule/update_log.ts:10-52): the hourly cron body as one
  * idempotent run over a checkpoint table —
  *   enumerate → discover → validate → import → reconcile → status.
  *
  * The downloader (A3) is a deployment concern (no egress here): this
  * orchestrator treats "downloaded" as "file exists under baseDir",
  * exactly what the reference's exist-checker establishes
  * (app/service/log_exist_checker.ts:8-19). State lives in a small
  * parquet checkpoint table (path, hour_key, status) — the meta.json
  * analogue that still works with millions of files.
  */
object Orchestrator {

  import FilePipeline.Status

  def loadMeta(spark: SparkSession, metaPath: String): DataFrame =
    try spark.read.parquet(metaPath)
    catch {
      case _: org.apache.spark.sql.AnalysisException =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("path",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("hour_key",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("status",
              org.apache.spark.sql.types.IntegerType))))
    }

  def saveMeta(meta: DataFrame, metaPath: String): Unit = {
    val tmp = metaPath + ".tmp"
    meta.write.mode("overwrite").parquet(tmp)
    val spark = meta.sparkSession
    // re-read + rewrite so the overwrite never reads its own input
    spark.read.parquet(tmp).write.mode("overwrite").parquet(metaPath)
  }

  /** One full pipeline pass. Returns the updated meta table. */
  def runOnce(spark: SparkSession, baseDir: String, tablePath: String,
      metaPath: String, startHour: String, endHour: String): DataFrame = {
    val meta = loadMeta(spark, metaPath)

    // 1. enumerate + discover (A1/A2)
    val expected = FilePipeline.enumerateHours(spark, startHour, endHour)
    val discovered = FilePipeline.discover(expected, meta)
      .select("path", "hour_key", "status")
    val known = meta.unionByName(discovered)

    // 2. exist-check: NeedDownload files present on disk ⇒ Downloaded
    val onDisk = known.withColumn("exists",
      when(col("status") === Status.NeedDownload,
        udfExists(col("path"), lit(baseDir))).otherwise(lit(true)))
    val afterExist = onDisk.withColumn("status",
      when(col("status") === Status.NeedDownload && col("exists"), Status.Downloaded)
        .otherwise(col("status"))).drop("exists")

    // 3. validate Downloaded files (A4); valid ⇒ Verified, corrupt stays
    val downloaded = afterExist.filter(col("status") === Status.Downloaded)
      .select("path").collect().map(r => s"$baseDir/${r.getString(0)}").toSeq
    val verified =
      if (downloaded.isEmpty) afterExist
      else {
        // validate() reports URIs (file:///...); relativize by splitting
        // on the literal baseDir prefix, robust to the slash count.
        val ok = FilePipeline.validate(spark, downloaded)
          .filter(col("valid"))
          .select(element_at(
            split(col("path"),
              java.util.regex.Pattern.quote(baseDir + "/")), 2).as("path"))
          .withColumn("ok", lit(true))
        afterExist.join(ok, Seq("path"), "left")
          .withColumn("status",
            when(col("status") === Status.Downloaded && col("ok"), Status.Verified)
              .otherwise(col("status"))).drop("ok")
      }

    // 4. import Verified files (A5–A19), then fold small per-batch
    // files back into few sorted ones — the background-merge step the
    // reference delegates to ClickHouse's MergeTree engine. Idempotent
    // and a no-op while every month is under the file limit.
    val toImport = verified.filter(col("status") === Status.Verified)
      .select("path").collect().map(r => s"$baseDir/${r.getString(0)}").toSeq
    if (toImport.nonEmpty) {
      EventsWriter.ingestHours(spark, toImport, tablePath)
      EventsWriter.compact(spark, tablePath)
    }
    val afterImport = verified.withColumn("status",
      when(col("status") === Status.Verified, Status.Imported)
        .otherwise(col("status")))

    // 5. reconcile imported hours against the table (A23); with no
    // table yet, every Imported row resets (nothing is present)
    val resets = (try Some(spark.read.parquet(tablePath))
      catch { case _: org.apache.spark.sql.AnalysisException => None }) match {
      case Some(events) =>
        FilePipeline.reconcile(afterImport, events).select("path")
          .withColumn("reset", lit(true))
      case None =>
        afterImport.filter(col("status") === Status.Imported).select("path")
          .withColumn("reset", lit(true))
    }
    val finalMeta = afterImport.join(resets, Seq("path"), "left")
      .withColumn("status",
        when(col("reset"), Status.Verified).otherwise(col("status")))
      .drop("reset")
      .select("path", "hour_key", "status")

    saveMeta(finalMeta, metaPath)
    spark.read.parquet(metaPath)
  }

  private val udfExists =
    udf((p: String, base: String) => new java.io.File(s"$base/$p").exists())

  /** Non-reentrant wrapper — the reference's in-flight guard
    * (app cache `updating` flag, app/schedule/update_log.ts:14-18):
    * a second invocation while one is running returns None and does
    * nothing. The flag is a lock file next to the checkpoint table
    * holding an OWNER TOKEN, so the guard also holds across driver
    * processes sharing the meta path; a crashed run's stale lock is
    * reclaimed after `staleLockMs`.
    *
    * Races handled explicitly:
    *  - two contenders reclaiming the same stale lock: reclaim is an
    *    atomic RENAME of the stale file to a per-contender name — only
    *    one rename can succeed, the loser backs off;
    *  - a run outliving `staleLockMs` whose lock was reclaimed by a
    *    newer run: release deletes the lock only if it still carries
    *    THIS run's token, so the old run cannot delete the new
    *    holder's lock.
    */
  def runGuarded(spark: SparkSession, baseDir: String, tablePath: String,
      metaPath: String, startHour: String, endHour: String,
      staleLockMs: Long = 6 * 60 * 60 * 1000L): Option[DataFrame] = {
    import java.nio.file.{Files, Paths, StandardCopyOption, StandardOpenOption}
    val lock = Paths.get(metaPath + ".lock")
    Option(lock.getParent).foreach(p => Files.createDirectories(p))
    val token = java.util.UUID.randomUUID().toString
    def createWithToken(): Boolean =
      try {
        // CREATE_NEW is O_EXCL-atomic; a reader in the create→write gap
        // sees an empty token, which matches no contender's
        Files.write(lock, token.getBytes("UTF-8"), StandardOpenOption.CREATE_NEW)
        true
      } catch { case _: java.nio.file.FileAlreadyExistsException => false }
    def reclaimStale(): Boolean =
      try {
        val stale = Files.getLastModifiedTime(lock).toMillis
        System.currentTimeMillis() - stale > staleLockMs && {
          // atomic rename: exactly one contender wins the stale file
          val trash = Paths.get(s"$lock.$token.reclaim")
          Files.move(lock, trash, StandardCopyOption.ATOMIC_MOVE)
          Files.deleteIfExists(trash)
          createWithToken()
        }
      } catch { case _: java.io.IOException => false }
    def ownsLock(): Boolean =
      try new String(Files.readAllBytes(lock), "UTF-8") == token
      catch { case _: java.io.IOException => false }

    if (!(createWithToken() || reclaimStale())) None
    else
      try Some(runOnce(spark, baseDir, tablePath, metaPath, startHour, endHour))
      finally if (ownsLock()) Files.deleteIfExists(lock)
  }
}
