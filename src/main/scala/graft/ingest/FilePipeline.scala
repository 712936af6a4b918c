package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The incremental file-ingest pipeline state (SURVEY A1/A2/A4/A23/A31):
  * hourly path enumeration, the per-file status state machine, the
  * gzip/JSON validator, the DB-vs-meta reconciler, and the status
  * aggregation — all as joins over small DataFrames, so the same logic
  * that the reference runs over an in-memory `meta.json`
  * (reference: app/service/file_utils.ts:16-45) scales to millions of
  * files as a checkpoint table.
  */
object FilePipeline {

  /** FileStatus enum (reference: app/types.ts:1-6). */
  object Status {
    val NeedDownload = 0
    val Downloaded = 1
    val Verified = 2
    val Imported = 3
  }

  /** A1 — hourly-file enumerator (reference: app/service/file_utils.ts:56-107,
    * which hand-rolls the calendar incl. leap years). Spark-first: one
    * `sequence` of hour timestamps → `date_format` paths. Returns
    * (path, hour_key) where hour_key = yyyyMMddHH as long (the
    * reference's `year*1000000+month*10000+day*100+hour` encoding,
    * app/service/log_importer_status_checker.ts:18).
    */
  def enumerateHours(spark: SparkSession, startInclusive: String,
      endExclusive: String): DataFrame =
    spark.range(1).select(
      explode(sequence(
        to_timestamp(lit(startInclusive)),
        to_timestamp(lit(endExclusive)) - expr("INTERVAL 1 HOUR"),
        expr("INTERVAL 1 HOUR"))).as("hour_ts"))
      .select(
        concat(
          date_format(col("hour_ts"), "yyyy/MM/dd/yyyy-MM-dd-"),
          // GH Archive hour component is unpadded (…-H.json.gz)
          hour(col("hour_ts")).cast("string"),
          lit(".json.gz")).as("path"),
        date_format(col("hour_ts"), "yyyyMMddHH").cast("long").as("hour_key"))

  /** A2 — expected-vs-known diff: new files enter the state machine as
    * NeedDownload (reference: app/service/log_exist_checker.ts:8-19).
    * `meta` is the checkpoint table (path, status).
    */
  def discover(expected: DataFrame, meta: DataFrame): DataFrame =
    expected.join(meta.select("path"), Seq("path"), "left_anti")
      .withColumn("status", lit(Status.NeedDownload))

  /** A4/A5 — validator: PERMISSIVE-read the candidate files and count
    * corrupt lines per input file; any corruption ⇒ the whole file is
    * quarantined for re-download, mirroring the reference's
    * delete-and-reset (reference: app/checker_worker.js:8-51,
    * app/service/log_valid_checker.ts:9-42). Returns
    * (path, total_lines, corrupt_lines, valid).
    */
  def validate(spark: SparkSession, files: Seq[String]): DataFrame =
    // text + from_json rather than read.json: (a) Spark disallows
    // referencing the file source's internal corrupt-record column
    // (SPARK-21610), and the cache() workaround makes
    // input_file_name() come back empty — losing the per-file
    // accounting this operator exists for; (b) from_json has no such
    // restriction and yields an all-null struct for corrupt lines.
    spark.read.text(files: _*)
      .select(input_file_name().as("path"),
        from_json(col("value"), GhArchiveSchema.envelope).as("r"))
      .select(col("path"),
        (col("r").isNull ||
          (col("r.id").isNull && col("r.type").isNull &&
            col("r.created_at").isNull)).as("corrupt"))
      .groupBy("path")
      .agg(count(lit(1)).as("total_lines"),
        sum(col("corrupt").cast("long")).as("corrupt_lines"))
      .withColumn("valid", col("corrupt_lines") === 0)

  /** A23 — import-status reconciler: hours marked Imported in meta but
    * absent from the events table get reset to Verified (re-import).
    * The reference issues a NOT-IN-subquery over arrayJoin'd hour keys
    * (reference: app/service/log_importer_status_checker.ts:23-26);
    * here it is a left-anti join of meta's imported hours against the
    * hours actually present in the table.
    */
  def reconcile(meta: DataFrame, events: DataFrame): DataFrame = {
    val importedHours = meta.filter(col("status") === Status.Imported)
    val presentHours = events
      .select(date_format(col("created_at"), "yyyyMMddHH").cast("long").as("hour_key"))
      .distinct()
    importedHours.join(presentHours, Seq("hour_key"), "left_anti")
      .withColumn("status", lit(Status.Verified))
  }

  /** A31 — status aggregation (reference: app/service/update_status.ts:9-41):
    * per-status counts, missing rate, sorted missing list.
    */
  def status(meta: DataFrame): DataFrame = {
    val total = meta.count()
    meta.groupBy("status").agg(count(lit(1)).as("files"))
      .withColumn("total", lit(total))
      .withColumn("rate", col("files").cast("double") / col("total"))
      .orderBy("status")
  }

  /** Missing files (anything not yet Imported), sorted — the
    * `missingArr` of the status document (reference:
    * app/service/update_status.ts:32-40).
    */
  def missing(meta: DataFrame): DataFrame =
    meta.filter(col("status") =!= Status.Imported)
      .select("path").orderBy("path")

  /** The reference's status document, field-for-field (reference:
    * app/service/update_status.ts:20-39):
    *
    *   total       = needDownload + downloaded + imported + verified
    *   imported    = imported
    *   importFail  = total - imported - needDownload
    *   missing     = needDownload
    *   missingRate = (total - imported) / total
    *   missingArr  = basenames of NeedDownload files, sorted
    *   updateTime  = "yyyy-MM-dd HH:mm:ss"
    *
    * Note missingArr lists only NeedDownload files (not every
    * not-yet-Imported file) — the Downloaded/Verified backlog shows up
    * in missingRate but not in the array, exactly as the reference.
    */
  final case class StatusDoc(total: Long, imported: Long, importFail: Long,
      missing: Long, missingRate: Double, missingArr: Seq[String],
      updateTime: String) {
    def toJson: String = {
      val arr = missingArr.map(p => "\"" + p.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
        .mkString("[", ",", "]")
      s"""{"total":$total,"imported":$imported,"importFail":$importFail,""" +
        s""""missing":$missing,"missingRate":$missingRate,""" +
        s""""missingArr":$arr,"updateTime":"$updateTime"}"""
    }
  }

  def statusDocument(meta: DataFrame, updateTime: String): StatusDoc = {
    // meta is checkpoint-table scale (one row per hour file); ONE
    // aggregation pass serves both the counts and the missing list —
    // the NeedDownload group's rows carry their basenames into a
    // sorted collect_list (null for every other status, so imported
    // paths never travel), where the previous shape scanned meta twice.
    val rows = meta.groupBy("status").agg(
        count(lit(1)).as("n"),
        sort_array(collect_list(when(col("status") === Status.NeedDownload,
          element_at(split(col("path"), "/"), -1)))).as("basenames"))
      .collect()
    val counts = rows.map(r => r.getInt(0) -> r.getLong(1)).toMap
    def c(s: Int) = counts.getOrElse(s, 0L)
    val total = c(Status.NeedDownload) + c(Status.Downloaded) +
      c(Status.Verified) + c(Status.Imported)
    val missingArr = rows.find(_.getInt(0) == Status.NeedDownload)
      .map(_.getSeq[String](2)).getOrElse(Seq.empty)
    StatusDoc(
      total = total,
      imported = c(Status.Imported),
      importFail = total - c(Status.Imported) - c(Status.NeedDownload),
      missing = c(Status.NeedDownload),
      missingRate =
        if (total == 0) 0.0 else (total - c(Status.Imported)).toDouble / total,
      missingArr = missingArr,
      updateTime = updateTime)
  }
}
