package graft.ingest

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** A19 batch-insert sink driven end-to-end against embedded Derby (the
  * JDBC engine Spark ships for its metastore) — the "INSERT FORMAT
  * JSONEachRow" analogue writes through a real JDBC endpoint, appends
  * accumulate, and the table reads back through the JDBC source.
  */
class JdbcSinkSpec extends SparkTestBase {
  import spark.implicits._

  test("jdbcAppend writes batches; appends accumulate; roundtrip reads back") {
    val db = java.nio.file.Files.createTempDirectory("derby").resolve("db")
    val url = s"jdbc:derby:$db;create=true"
    val df = Seq((100L, "IssuesEvent", 42L), (101L, "PushEvent", 42L),
      (102L, "WatchEvent", 7L))
      .toDF("id", "type", "repo_id")

    Sinks.jdbcAppend(df, url, "events_sink", batchSize = 2)
    val back = spark.read.jdbc(url, "events_sink", new java.util.Properties)
    assert(back.count() === 3L)
    assert(back.columns.toSet === Set("id", "type", "repo_id"))
    assert(back.filter(col("id") === 100L).head.getAs[String]("type") === "IssuesEvent")

    // append mode accumulates (the reference streams one insert per
    // hour file into the same table)
    Sinks.jdbcAppend(df.withColumn("id", col("id") + 10), url, "events_sink")
    assert(spark.read.jdbc(url, "events_sink", new java.util.Properties)
      .count() === 6L)
  }
}
