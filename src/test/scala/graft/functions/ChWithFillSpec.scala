package graft.functions

import graft.SparkTestBase

/** `ORDER BY … WITH FILL`: the CH time-series gap filler as a
  * generated-spine FULL join.
  */
class ChWithFillSpec extends SparkTestBase {

  test("integer fill: missing buckets appear with NULL aggregates") {
    ChCompat.registerAll(spark)
    import spark.implicits._
    Seq((0, 5L), (2, 7L), (9, 1L))
      .toDF("b", "cnt").createOrReplaceTempView("wf_t")
    val got = ChCompat.sql(spark, """
      SELECT b, cnt FROM wf_t
      ORDER BY b WITH FILL FROM 0 TO 5""").collect()
      .map(r => (r.getInt(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq
    // 0..4 filled (TO exclusive); the out-of-range original row b=9 kept
    assert(got === Seq((0, 5L), (1, -1L), (2, 7L), (3, -1L), (4, -1L),
      (9, 1L)))
  }

  test("STEP and a trailing LIMIT applied after filling") {
    ChCompat.registerAll(spark)
    import spark.implicits._
    Seq((10, 1L)).toDF("b", "cnt").createOrReplaceTempView("wf_s")
    val got = ChCompat.sql(spark, """
      SELECT b, cnt FROM wf_s
      ORDER BY b ASC WITH FILL FROM 0 TO 20 STEP 5 LIMIT 3""").collect()
      .map(r => (r.getInt(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq
    assert(got === Seq((0, -1L), (5, -1L), (10, 1L)))
  }

  test("timestamp fill with an INTERVAL step over an aggregate") {
    ChCompat.registerAll(spark)
    import spark.implicits._
    Seq(("2015-03-07 10:05:00", 3L), ("2015-03-07 13:45:00", 4L))
      .toDF("s", "n")
      .selectExpr("CAST(s AS TIMESTAMP) AS ts", "n")
      .createOrReplaceTempView("wf_ts")
    val got = ChCompat.sql(spark, """
      SELECT toStartOfHour(ts) AS h, sum(n) AS total
      FROM wf_ts GROUP BY h
      ORDER BY h WITH FILL
        FROM toDateTime('2015-03-07 10:00:00')
        TO toDateTime('2015-03-07 14:00:00')
        STEP INTERVAL 1 HOUR""").collect()
      .map(r => (r.getTimestamp(0).toString,
        if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq
    assert(got === Seq(
      ("2015-03-07 10:00:00.0", 3L),
      ("2015-03-07 11:00:00.0", -1L),
      ("2015-03-07 12:00:00.0", -1L),
      ("2015-03-07 13:00:00.0", 4L)))
  }

  test("descending fill: FROM high TO low, exclusive bound, DESC order") {
    import spark.implicits._
    Seq((8, 1.0), (5, 2.0)).toDF("b", "v")
      .createOrReplaceTempView("wfd_t")
    val got = ChCompat.sql(spark,
      """SELECT b, sum(v) AS sv FROM wfd_t GROUP BY b
        |ORDER BY b DESC WITH FILL FROM 9 TO 4""".stripMargin)
      .collect().map(r => (r.getInt(0),
        if (r.isNullAt(1)) -1.0 else r.getDouble(1))).toSeq
    // spine 9..5 (TO 4 exclusive), descending; data rows merge in
    assert(got === Seq((9, -1.0), (8, 1.0), (7, -1.0), (6, -1.0),
      (5, 2.0)))
  }

  test("loud rejections: data-driven bounds, INTERPOLATE, literals safe") {
    val e1 = intercept[IllegalArgumentException] {
      ChSqlRewrite("SELECT b FROM t ORDER BY b WITH FILL")
    }
    assert(e1.getMessage.contains("data-driven"))
    val e3 = intercept[IllegalArgumentException] {
      ChSqlRewrite(
        "SELECT b FROM t ORDER BY b WITH FILL FROM 0 TO 5 INTERPOLATE (x)")
    }
    assert(e3.getMessage.contains("INTERPOLATE"))
    assert(ChSqlRewrite("SELECT 'ORDER BY b WITH FILL' AS s FROM t") ===
      "SELECT 'ORDER BY b WITH FILL' AS s FROM t")
  }
}
