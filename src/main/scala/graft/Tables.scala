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
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // the driver's testdata stores event timestamps as nanos-since-epoch
    // longs (parquet nanos unit); a user-supplied table with a real
    // TIMESTAMP column needs no conversion
    if (name == "events" &&
        df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts",
        org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else df
  }

  /** Register every table as a temp view so `spark.sql` works against the
    * full surface (reference's documented POST /query endpoint — SURVEY
    * B21, reference: README.md:72).
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
