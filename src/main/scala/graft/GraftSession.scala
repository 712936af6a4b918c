package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's tuned defaults.
  *
  * Scale notes (the same builder is what a cluster deployment would use,
  * minus `master`):
  *  - AQE on: runtime coalescing of shuffle partitions + skew-join
  *    handling replace hand-tuned partition counts at 100 TB.
  *  - shuffle.partitions is a *starting* value; AQE
  *    (`advisoryPartitionSizeInBytes`) re-splits at runtime.
  *  - UTC session timezone: the reference stores UTC timestamps
  *    (reference: app/parser.js:6-11), and the DuckDB oracle compares
  *    wall-clock values.
  */
object GraftSession {
  def builder(cores: String): SparkSession.Builder =
    SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // Naive (no-tz) parquet timestamps read as TIMESTAMP, not
      // TIMESTAMP_NTZ: the engine's surface type is tz-aware (the
      // reference stores UTC DateTimes), and with the session tz pinned
      // to UTC the wall-clock values are identical either way.
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      // The default 4 MB file-open cost models spinning-disk/HDFS seek
      // overhead; it also FLOORS the scan split size, so a sub-4 MB
      // parquet table becomes ONE task and every fused map-heavy stage
      // above it (signature hashing, shingling, decode, band joins)
      // runs on one core of local[32] — measured 4.2 s → 1.1 s on the
      // d17 band join at sf0.1 from this setting alone. 16 KB reflects
      // NVMe/page-cache open cost; at deployment scale files are
      // ≥128 MB so maxPartitionBytes, not open cost, decides splits
      // and this setting is inert. The trade (small files pack into
      // more tasks) is the right side to be on for a 32-core node.
      .config("spark.sql.files.openCostInBytes", (16 * 1024).toString)
      .config("spark.ui.enabled", "false")

  /** Create (or reuse) the session and register the engine's SQL surface:
    * ClickHouse-compatible function aliases (so the reference's
    * documented SQL runs near-verbatim through `spark.sql`) plus the
    * LLM-pipeline functions (dedup signatures, similarity, text
    * analysis) as plain SQL functions.
    */
  def getOrCreate(cores: String = "32"): SparkSession = {
    val spark = builder(cores).getOrCreate()
    functions.ChCompat.registerAll(spark)
    functions.PipelineFunctions.registerAll(spark)
    spark
  }
}
