package graft

import java.sql.Timestamp

/** Hand-computed edge cases for the r18/r19 B-surface extensions that
  * the sf-data oracle compare can't guarantee to exercise: the exact
  * 8h session-gap boundary, and retention day-pairing.
  */
class RefQueriesExtSpec extends SparkTestBase {
  import spark.implicits._

  private def writeEvents(rows: Seq[(Long, String, Long)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("refqext").toString
    rows.map { case (id, ts, uid) =>
      (id, Timestamp.valueOf(ts), uid, "e", 0.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("sessionize: gap strictly greater than 8h splits; exactly 8h does not") {
    val dir = writeEvents(Seq(
      (1L, "2024-01-01 00:00:00", 7L),
      (2L, "2024-01-01 08:00:00", 7L), // gap == 28800s → same session
      (3L, "2024-01-01 16:00:01", 7L), // gap == 28801s → new session
      (4L, "2024-01-02 00:00:00", 9L)))
    val got = graft.queries.RefQueries.sessionize(spark, dir)
      .select("user_id", "session_idx", "n_events").as[(Long, Long, Long)]
      .collect().toList
    assert(got == List((7L, 1L, 2L), (7L, 2L, 1L), (9L, 1L, 1L)))
  }

  test("retention: next-day actives counted, same-day and gap days not") {
    val dir = writeEvents(Seq(
      (1L, "2024-03-01 10:00:00", 1L), // active d1, returns d2 → retained
      (2L, "2024-03-02 09:00:00", 1L),
      (3L, "2024-03-01 11:00:00", 2L), // active d1, returns d3 → NOT retained
      (4L, "2024-03-03 09:00:00", 2L),
      (5L, "2024-03-01 12:00:00", 3L), // two events same day: one active row
      (6L, "2024-03-01 13:00:00", 3L)))
    val got = graft.queries.RefQueries.retention(spark, dir)
      .select($"day".cast("string"), $"active", $"retained")
      .as[(String, Long, Long)].collect().toList
    assert(got == List(
      ("2024-03-01", 3L, 1L), ("2024-03-02", 1L, 0L), ("2024-03-03", 1L, 0L)))
  }

  test("SparkEntry.entry: the driver's flagship smoke returns rows") {
    // the driver calls entry() and checks rows > 0 on sf0.001 — guard
    // the hardcoded path + query wiring here so a refactor can't
    // silently break the smoke check
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory)
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  test("r61 orc_roundtrip: equals the parquet-side rollup; " +
      "repeat invocation (overwrite path) is identical") {
    import org.apache.spark.sql.functions._
    val dir = writeEvents(Seq(
      (1L, "2024-01-05 10:00:00", 7L), (2L, "2024-01-20 11:00:00", 7L),
      (3L, "2024-02-01 09:00:00", 8L)))
    val once = graft.queries.RefQueries.orc_roundtrip(spark, dir).collect()
    val direct = spark.read.parquet(s"$dir/events.parquet")
      .groupBy(date_format(col("ts"), "yyyyMM").cast("int").as("month_key"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("sv"),
        min("event_id").as("min_id"), max("event_id").as("max_id"))
      .orderBy("month_key").collect()
    assert(once.toSeq === direct.toSeq)
    assert(once.map(_.getInt(0)).toSeq === Seq(202401, 202402))
    // the gate's contract under Verify --twice: same JVM, same path,
    // overwrite — second run must be identical
    val again = graft.queries.RefQueries.orc_roundtrip(spark, dir).collect()
    assert(again.toSeq === once.toSeq)
  }
}
