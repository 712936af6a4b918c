package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * Every loader takes the scale-factor directory so the same code runs at
  * sf0.001 (smoke), sf0.01 (oracle) and sf0.1 (bench) — and, unchanged, on
  * a cluster path at full scale. Reads are plain parquet scans: Catalyst
  * handles column pruning + predicate pushdown, so loaders never
  * pre-select columns.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalize(name, spark.read.parquet(s"$dir/$name.parquet"))
  }

  /** Normalize timestamp layouts across testdata generations:
    *  - events.ts as nanos-since-epoch longs (parquet nanos unit);
    *  - any naive (NTZ) timestamp column, read by a session that has
    *    inferTimestampNTZ on — cast to TIMESTAMP, lossless because the
    *    engine pins the session tz to UTC (GraftSession).
    * Shared with the STREAMING readers (StreamingQueries), which must
    * apply the same expressions on top of the RAW file schema — a
    * schema-only carry-over would make the streaming scan reject the
    * layouts this function exists to absorb.
    */
  def normalize(name: String, df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val tsFixed =
      if (name == "events" && df.schema("ts").dataType == LongType)
        df.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      else df
    val ntzCols = tsFixed.schema.fields.collect {
      case f if f.dataType == TimestampNTZType => f.name
    }
    ntzCols.foldLeft(tsFixed)((d, c) =>
      d.withColumn(c, col(c).cast(TimestampType)))
  }

  /** Register every table as a temp view so `spark.sql` works against the
    * full surface (reference's documented POST /query endpoint — SURVEY
    * B21, reference: README.md:72).
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
