package graft.functions

import graft.SparkTestBase

/** Golden outputs for the ClickHouse-compat SQL aliases (SURVEY §2C) —
  * including that registerAll itself succeeds (the round-1 zero came
  * from a bad `source` string here).
  */
class ChCompatSpec extends SparkTestBase {

  test("registerAll registers every alias without throwing") {
    ChCompat.registerAll(spark)
    ChCompat.builders.keys.foreach { name =>
      assert(spark.sessionState.functionRegistry
        .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(name)),
        s"missing $name")
    }
  }

  test("date/time aliases") {
    ChCompat.registerAll(spark)
    val r = spark.sql(
      """SELECT toYYYYMM(TIMESTAMP '2015-03-07 14:15:16') AS m,
                toYYYYMMDD(TIMESTAMP '2015-03-07 14:15:16') AS d,
                toYYYYMMDDhhmmss(TIMESTAMP '2015-03-07 14:15:16') AS s,
                toYear(TIMESTAMP '2015-03-07 14:15:16') AS y,
                toMonth(TIMESTAMP '2015-03-07 14:15:16') AS mo,
                toHour(TIMESTAMP '2015-03-07 14:15:16') AS h,
                toDate(TIMESTAMP '2015-03-07 14:15:16') AS dt""").head
    assert(r.getInt(0) === 201503)
    assert(r.getInt(1) === 20150307)
    assert(r.getLong(2) === 20150307141516L)
    assert(r.getInt(3) === 2015)
    assert(r.getInt(4) === 3)
    assert(r.getInt(5) === 14)
    assert(r.getDate(6).toString === "2015-03-07")
  }

  test("argMin/argMax over groups") {
    ChCompat.registerAll(spark)
    val r = spark.sql(
      """SELECT argMin(name, ts) AS first, argMax(name, ts) AS last
         FROM VALUES ('a', 3), ('b', 1), ('c', 2) AS t(name, ts)""").head
    assert(r.getString(0) === "b" && r.getString(1) === "a")
  }

  test("JSON extraction + arrayJoin") {
    ChCompat.registerAll(spark)
    val r = spark.sql(
      """SELECT JSONExtractString('{"k":"v","n":3}', 'k') AS s,
                JSONExtractInt('{"k":"v","n":3}', 'n') AS n""").head
    assert(r.getString(0) === "v" && r.getLong(1) === 3L)
    val arr = spark.sql(
      """SELECT arrayJoin(JSONExtractArrayRaw('[1,{"a":2},"x"]')) AS e""")
      .collect().map(_.getString(0)).toSeq
    assert(arr === Seq("1", """{"a":2}""", "\"x\""))
  }

  test("countIf and intDiv") {
    ChCompat.registerAll(spark)
    val r = spark.sql(
      """SELECT countIf(x > 1) AS c, intDiv(7, 2) AS d
         FROM VALUES (1), (2), (3) AS t(x)""").head
    assert(r.getLong(0) === 2L && r.getLong(1) === 3L)
  }

  test("spark.sql.extensions=graft.GraftExtensions injects the surface") {
    import org.apache.spark.sql.SparkSession
    spark.sparkContext // ensure the shared context exists first
    val prev = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      // new session over the SAME SparkContext, functions injected by
      // the extensions channel alone — no registerAll call on this
      // session. (The spark.sql.extensions CONFIG form reads the class
      // list from the SparkContext conf at context launch, so in-JVM
      // the test goes through builder.withExtensions — the same code
      // path the config triggers.)
      val s2 = SparkSession.builder()
        .withExtensions(new graft.GraftExtensions())
        .getOrCreate()
      val r = s2.sql(
        "SELECT toYYYYMM(timestamp'2015-03-04 00:00:00') AS m").head
      assert(r.getInt(0) === 201503)
    } finally {
      prev.foreach(SparkSession.setDefaultSession)
      prev.foreach(SparkSession.setActiveSession)
    }
  }
}
