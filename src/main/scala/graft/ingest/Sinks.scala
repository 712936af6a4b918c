package graft.ingest

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Sink adapters (SURVEY A19/A20; reference:
  * app/service/clickhouse.ts:23-61).
  *
  * The engine's primary store is the partitioned parquet layout
  * ([[EventsWriter]]); these adapters cover the reference's two other
  * data paths: a batched JDBC insert (the "INSERT FORMAT JSONEachRow"
  * analogue — point it at ClickHouse's JDBC endpoint in a deployment)
  * and the streamed query reader (`queryStream`'s row callback).
  */
object Sinks {

  /** Batched JDBC append — one executor-side batch insert per
    * partition, `batchsize` rows per round trip (the reference streams
    * one insert per hour file; here a repartition upstream controls
    * insert parallelism).
    */
  def jdbcAppend(df: DataFrame, url: String, table: String,
      batchSize: Int = 10000,
      properties: java.util.Properties = new java.util.Properties): Unit =
    df.write
      .mode(SaveMode.Append)
      .option("batchsize", batchSize)
      .jdbc(url, table, properties)

  /** Streamed query read: run SQL, hand each row to `onRow` without
    * collecting the full result on the driver (reference:
    * app/service/clickhouse.ts:23-42 `queryStream`).
    */
  def queryStream(spark: SparkSession, sql: String)(
      onRow: org.apache.spark.sql.Row => Unit): Long = {
    var n = 0L
    spark.sql(sql).toLocalIterator().forEachRemaining { r => onRow(r); n += 1 }
    n
  }

  /** Collected query (reference `query[T]`): small results only. */
  def query(spark: SparkSession, sql: String): Array[org.apache.spark.sql.Row] =
    spark.sql(sql).collect()
}
