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

  test("extended date/cast/format aliases") {
    ChCompat.registerAll(spark)
    val r = spark.sql(
      """SELECT toDayOfMonth(TIMESTAMP '2015-03-07 14:15:16') AS dom,
                toDayOfWeek(TIMESTAMP '2015-03-07 14:15:16') AS dow,
                toQuarter(TIMESTAMP '2015-03-07 14:15:16') AS q,
                toMinute(TIMESTAMP '2015-03-07 14:15:16') AS mi,
                toSecond(TIMESTAMP '2015-03-07 14:15:16') AS se,
                CAST(toStartOfDay(TIMESTAMP '2015-03-07 14:15:16') AS STRING) AS sod,
                CAST(toMonday(TIMESTAMP '2015-03-07 14:15:16') AS STRING) AS mon,
                formatDateTime(TIMESTAMP '2015-03-07 14:15:16', '%Y-%m-%d %H:%M:%S') AS f,
                formatDateTime(TIMESTAMP '2015-03-07 14:15:16', '%F') AS f2,
                toInt64('42') AS i64, toFloat64('2.5') AS f64,
                ifNull(NULL, 7) AS c""").head
    // 2015-03-07 is a Saturday: ClickHouse numbering Mon=1..Sun=7 → 6
    assert(r.getInt(0) === 7 && r.getInt(1) === 6 && r.getInt(2) === 1)
    assert(r.getInt(3) === 15 && r.getInt(4) === 16)
    assert(r.getString(5) === "2015-03-07 00:00:00")
    assert(r.getString(6) === "2015-03-02")
    assert(r.getString(7) === "2015-03-07 14:15:16")
    assert(r.getString(8) === "2015-03-07")
    assert(r.getLong(9) === 42L && r.getDouble(10) === 2.5 && r.getInt(11) === 7)
  }

  test("*If combinators, uniq family, any/groupArray, median") {
    ChCompat.registerAll(spark)
    val r = spark.sql(
      """SELECT sumIf(x, x > 10) AS s, avgIf(x, x > 10) AS a,
                minIf(x, x > 10) AS mn, maxIf(x, x > 10) AS mx,
                countIf(x > 10) AS c,
                uniqExact(x % 4) AS ue, uniq(x % 4) AS u,
                any(x) AS an, anyLast(x) AS al,
                groupArray(x) AS ga, groupUniqArray(x % 4) AS gua,
                median(x) AS md
         FROM VALUES (5), (11), (20), (8), (14) AS t(x)""").head
    assert(r.getLong(0) === 45L)            // 11+20+14
    assert(r.getDouble(1) === 15.0)
    assert(r.getInt(2) === 11 && r.getInt(3) === 20)
    assert(r.getLong(4) === 3L)
    assert(r.getInt(5) === 4)               // {1,3,0,2}
    assert(r.getLong(6) === 4L)             // HLL exact at this scale
    assert(r.getInt(7) === 5 && r.getInt(8) === 14)
    assert(r.getSeq[Int](9) === Seq(5, 11, 20, 8, 14))
    assert(r.getSeq[Int](10).sorted === Seq(0, 1, 2, 3))
    assert(r.getDouble(11) === 11.0)
  }

  test("array/string helpers") {
    ChCompat.registerAll(spark)
    val r = spark.sql(
      """SELECT splitByChar(',', 'a,b,,c') AS sp,
                arrayStringConcat(array('x','y','z'), '-') AS asc1,
                arrayStringConcat(array('x','y')) AS asc2,
                arrayDistinct(array(1,2,2,1,3)) AS ad,
                has(array(1,2,3), 2) AS h1, has(array(1,2,3), 9) AS h0,
                indexOf(array('a','b','c'), 'b') AS io""").head
    assert(r.getSeq[String](0) === Seq("a", "b", "", "c"))
    assert(r.getString(1) === "x-y-z" && r.getString(2) === "xy")
    assert(r.getSeq[Int](3) === Seq(1, 2, 3))
    assert(r.getBoolean(4) && !r.getBoolean(5))
    assert(r.getLong(6) === 2L)
  }

  test("conditionals + date arithmetic (second widening pass)") {
    ChCompat.registerAll(spark)
    // ChCompat.sql: dateDiff('unit',…) needs the text rewrite — Spark's
    // parser reserves the name and rejects quoted units
    val r = ChCompat.sql(spark,
      """SELECT multiIf(1 > 2, 'a', 3 > 2, 'b', 'c') AS mi,
                dateDiff('day', DATE'2024-01-30', DATE'2024-02-02') AS dd,
                dateDiff('month', DATE'2024-01-31', DATE'2024-02-01') AS dm,
                dateDiff('year', DATE'2023-12-31', DATE'2024-01-01') AS dy,
                dateDiff('hour', TIMESTAMP'2024-01-01 10:59:00',
                                 TIMESTAMP'2024-01-01 11:01:00') AS dh,
                dateDiff('second', TIMESTAMP'2024-01-01 00:00:01',
                                   TIMESTAMP'2024-01-01 00:00:05') AS ds,
                addDays(DATE'2024-02-28', 2) AS ad,
                subtractDays(DATE'2024-03-01', 1) AS sd,
                addMonths(DATE'2024-01-31', 1) AS am,
                subtractMonths(DATE'2024-03-31', 1) AS sm,
                toStartOfQuarter(DATE'2024-05-15') AS q,
                toStartOfWeek(DATE'2024-01-10') AS w""").head
    assert(r.getString(0) === "b")
    assert(r.getInt(1) === 3)
    // boundary-crossing semantics: Jan 31 -> Feb 1 crosses one month
    // boundary even though <1 month elapsed; same for hour 10:59->11:01
    assert(r.getInt(2) === 1 && r.getInt(3) === 1 && r.getInt(4) === 1)
    assert(r.getInt(5) === 4)
    assert(r.getDate(6).toString === "2024-03-01")
    assert(r.getDate(7).toString === "2024-02-29")
    assert(r.getDate(8).toString === "2024-02-29")
    assert(r.getDate(9).toString === "2024-02-29")
    assert(r.getDate(10).toString === "2024-04-01")
    // CH toStartOfWeek default mode 0 is SUNDAY-start: Wed 2024-01-10
    // rolls back to Sun 2024-01-07 (toMonday covers Monday-start)
    assert(r.getDate(11).toString === "2024-01-07")
  }

  test("age: elapsed whole units (vs dateDiff's boundary crossings)") {
    ChCompat.registerAll(spark)
    val r = spark.sql(
      """SELECT age('hour', TIMESTAMP'2024-01-01 10:59:00',
                    TIMESTAMP'2024-01-01 11:01:00') AS ah,
                age('day', TIMESTAMP'2024-01-01 12:00:00',
                    TIMESTAMP'2024-01-03 11:00:00') AS ad,
                age('month', DATE'2024-01-31', DATE'2024-02-01') AS am,
                age('year', DATE'2023-06-01', DATE'2024-05-31') AS ay""").head
    assert(r.getInt(0) === 0)
    assert(r.getInt(1) === 1)
    assert(r.getInt(2) === 0)
    assert(r.getInt(3) === 0)
  }

  test("ChSqlRewrite: curried quantiles, count(), string-literal safety") {
    ChCompat.registerAll(spark)
    val r = ChCompat.sql(spark,
      """SELECT quantile(0.5)(x) AS q50,
                quantileExact(0.25)(x) AS q25,
                quantiles(0.25, 0.75)(x) AS qq,
                medianExact()(x) AS me,
                count() AS c,
                'quantile(0.5)(x)' AS lit
         FROM VALUES (1.0), (2.0), (3.0), (4.0), (5.0) AS t(x)""").head
    assert(r.getDouble(0) === 3.0)
    // quantileExact/medianExact return an ELEMENT of the input type
    // (decimal literals here), CH-faithfully: sorted[floor(p*n)]
    assert(r.getDecimal(1).doubleValue === 2.0) // floor(.25*5)=1 -> 2.0
    assert(r.getSeq[Double](2) === Seq(2.0, 4.0))
    assert(r.getDecimal(3).doubleValue === 3.0) // floor(.5*5)=2 -> 3.0
    assert(r.getLong(4) === 5L)
    assert(r.getString(5) === "quantile(0.5)(x)")
    // pure text checks
    assert(ChSqlRewrite("dateDiff('day', a, b)") === "chDateDiff('day', a, b)")
    assert(ChSqlRewrite("datediff(a, b)") === "datediff(a, b)")
    assert(ChSqlRewrite("dateDiff(DAY, a, b)") === "dateDiff(DAY, a, b)")
    assert(ChSqlRewrite("count( )") === "count(*)")
    assert(ChSqlRewrite("count(x)") === "count(x)")
    assert(ChSqlRewrite("'dateDiff(''day'', a, b)'") ===
      "'dateDiff(''day'', a, b)'")
    assert(ChSqlRewrite("quantile(0.5)(price)") === "chQuantile(0.5, price)")
    // curried name NOT followed by a second arg list passes through
    assert(ChSqlRewrite("quantile(0.5)") === "quantile(0.5)")
  }

  test("review fixes: range edges, position start, quantileExact " +
      "element semantics, datediff passthrough, comment safety") {
    ChCompat.registerAll(spark)
    val r = ChCompat.sql(spark,
      """SELECT range(0) AS r0, range(5, 2) AS rdesc, range(0, 10, 2) AS rstep,
                position('ababa', 'a', 2) AS p3,
                range(3) AS r3""").head
    assert(r.getSeq[Long](0) === Seq.empty)
    assert(r.getSeq[Long](1) === Seq.empty)
    assert(r.getSeq[Long](2) === Seq(0L, 2L, 4L, 6L, 8L))
    assert(r.getInt(3) === 3)
    assert(r.getSeq[Long](4) === Seq(0L, 1L, 2L))
    // quantileExact returns an ELEMENT (CH), not an interpolation
    val q = ChCompat.sql(spark,
      """SELECT quantileExact(0.5)(x) AS qe, medianExact()(x) AS me,
                quantile(0.5)(x) AS qi
         FROM (SELECT CAST(x AS DOUBLE) AS x
               FROM VALUES (1.0), (2.0), (3.0), (4.0) AS t(x))""").head
    assert(q.getDouble(0) === 3.0 && q.getDouble(1) === 3.0)
    assert(q.getDouble(2) === 2.5)
    val qs = ChCompat.sql(spark,
      """SELECT quantilesExact(0.25, 0.75)(x) AS q,
                uniqCombined(x) AS uc, uniqHLL12(x) AS uh
         FROM (SELECT CAST(x AS DOUBLE) AS x
               FROM VALUES (1.0), (2.0), (3.0), (4.0) AS t(x))""").head
    assert(qs.getSeq[Double](0) === Seq(2.0, 4.0)) // elements, floor(p*4)
    assert(qs.getLong(1) === 4L && qs.getLong(2) === 4L)
    // Spark's own 2-arg datediff with a quoted date literal is NOT a
    // CH unit form and must pass through untouched
    assert(ChSqlRewrite("datediff('2024-01-05', d)") ===
      "datediff('2024-01-05', d)")
    assert(ChSqlRewrite("dateDiff('day', a, b)") === "chDateDiff('day', a, b)")
    // apostrophes inside comments don't derail the scan
    assert(ChSqlRewrite("SELECT /* can't */ count() FROM t") ===
      "SELECT /* can't */ count(*) FROM t")
    assert(ChSqlRewrite("-- don't\nSELECT quantile(0.5)(x) FROM t") ===
      "-- don't\nSELECT chQuantile(0.5, x) FROM t")
  }

  test("string/regex aliases (third pass)") {
    ChCompat.registerAll(spark)
    val r = ChCompat.sql(spark,
      """SELECT match('hello42', '[a-z]+\\d+') AS m1,
                match('hello', '^\\d+$') AS m0,
                extract('key=value', 'key=(\\w+)') AS ex1,
                extract('abc123', '\\d+') AS ex0,
                replaceAll('a-b-c', '-', '+') AS ra,
                replaceRegexpAll('a1b22c', '\\d+', '#') AS rra,
                countSubstrings('abcabcab', 'ab') AS cs,
                trimLeft('  x ') AS tl, trimRight(' x  ') AS tr,
                arrayUniq(array(1, 2, 2, 3, 1)) AS au,
                bitCount(255) AS bc""").head
    assert(r.getBoolean(0) && !r.getBoolean(1))
    assert(r.getString(2) === "value" && r.getString(3) === "123")
    assert(r.getString(4) === "a+b+c" && r.getString(5) === "a#b#c")
    assert(r.getInt(6) === 3)
    assert(r.getString(7) === "x " && r.getString(8) === " x")
    assert(r.getInt(9) === 3)
    assert(r.getInt(10) === 8)
  }

  test("second-review fixes: extract parens, week mode, uniq tuples, " +
      "range nulls, tz dateDiff, position family start") {
    ChCompat.registerAll(spark)
    val r = ChCompat.sql(spark,
      """SELECT extract('a(b', 'a\\(') AS e_escaped,
                extract('abcabc', '(?:abc)+') AS e_noncap,
                toStartOfWeek(DATE'2024-01-10', 1) AS w_mon,
                toStartOfWeek(DATE'2024-01-10', 0) AS w_sun,
                uniq(x, y) AS u2, uniqExact(x, y) AS ue2,
                range(CAST(NULL AS BIGINT)) AS r_null,
                countSubstrings('abc', '') AS cs0,
                positionCaseInsensitive('ABABA', 'a', 2) AS pci
         FROM VALUES (1, 'p'), (1, 'q'), (2, 'p') AS t(x, y)""").head
    assert(r.getString(0) === "a(")
    assert(r.getString(1) === "abcabc")
    assert(r.getDate(2).toString === "2024-01-08")
    assert(r.getDate(3).toString === "2024-01-07")
    assert(r.getLong(4) === 3L && r.getInt(5) === 3)
    assert(r.isNullAt(6))
    assert(r.getInt(7) === 0)
    assert(r.getInt(8) === 3)
    // 4-arg CH dateDiff (timezone) is rewritten; 2-arg Spark form isn't
    assert(ChSqlRewrite("dateDiff('day', a, b, 'UTC')") ===
      "chDateDiff('day', a, b, 'UTC')")
    val tz = ChCompat.sql(spark,
      """SELECT dateDiff('day', DATE'2024-01-01', DATE'2024-01-03', 'UTC')""")
      .head()
    assert(tz.getInt(0) === 2)
  }

  test("position/extract: CH comma-forms rewrite to chPosition/chExtract; " +
      "SQL-standard forms keep Spark built-in semantics") {
    ChCompat.registerAll(spark)
    // comma-forms get CH argument order via the rewrite
    assert(ChSqlRewrite("position(h, n)") === "chPosition(h, n)")
    assert(ChSqlRewrite("position(h, n, 2)") === "chPosition(h, n, 2)")
    assert(ChSqlRewrite("extract(h, 're')") === "chExtract(h, 're')")
    // SQL-standard single-argument forms pass through untouched
    assert(ChSqlRewrite("POSITION('b' IN 'abc')") === "POSITION('b' IN 'abc')")
    assert(ChSqlRewrite("EXTRACT(YEAR FROM ts)") === "EXTRACT(YEAR FROM ts)")
    // and the built-ins still resolve correctly through the dialect entry
    val r = ChCompat.sql(spark,
      """SELECT EXTRACT(YEAR FROM TIMESTAMP '2015-03-07 14:15:16') AS y,
                POSITION('b' IN 'abc') AS p,
                position('abcabc', 'b', 3) AS chp""").head
    assert(r.getInt(0) === 2015)
    assert(r.getInt(1) === 2)
    assert(r.getInt(2) === 5) // CH order: haystack first, start 3
  }

  test("doubled-quote escapes don't desync the scanner") {
    // 'it''s' spans one literal; the rewrite after it must still fire
    assert(ChSqlRewrite("SELECT 'it''s', quantile(0.5)(x) FROM t") ===
      "SELECT 'it''s', chQuantile(0.5, x) FROM t")
    // a curried-shape string inside the escaped literal is untouched
    assert(ChSqlRewrite("SELECT 'don''t quantile(0.5)(x)' FROM t") ===
      "SELECT 'don''t quantile(0.5)(x)' FROM t")
    // doubled quote inside a function argument: paren matching holds
    assert(ChSqlRewrite("SELECT position('it''s', 's') AS p") ===
      "SELECT chPosition('it''s', 's') AS p")
    val r = ChCompat.sql(spark, "SELECT position('it''s', 's') AS p").head
    assert(r.getInt(0) === 4)
  }

  test("anyHeavy is ANSI-safe on all-NULL groups") {
    ChCompat.registerAll(spark)
    val prev = spark.conf.get("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try {
      val r = spark.sql(
        """SELECT anyHeavy(v) AS ah
           FROM VALUES (CAST(NULL AS STRING)), (CAST(NULL AS STRING)) AS t(v)
        """).head
      assert(r.isNullAt(0))
    } finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }

  test("FROM t FINAL: ReplacingMergeTree read-time dedup via registered key") {
    ChCompat.registerAll(spark)
    import spark.implicits._
    Seq((1, "a", 10, false), (1, "a", 20, true), (1, "b", 30, false),
      (2, "a", 40, false), (2, "a", 50, false))
      .toDF("k1", "k2", "v", "from_api")
      .createOrReplaceTempView("chspec_repl")
    ChSqlRewrite.registerReplacing("chspec_repl", Seq("k1", "k2"),
      "struct(from_api, v)")
    val got = ChCompat.sql(spark,
      "SELECT k1, k2, v FROM chspec_repl FINAL ORDER BY k1, k2")
      .as[(Int, String, Int)].collect().toSeq
    assert(got === Seq((1, "a", 20), (1, "b", 30), (2, "a", 50)))
    // unregistered table: loud error, not a silent alias mis-parse
    val err = intercept[IllegalArgumentException] {
      ChSqlRewrite("SELECT * FROM unregistered_tbl FINAL")
    }
    assert(err.getMessage.contains("unregistered_tbl"))
    // FINAL inside a string literal is untouched
    assert(ChSqlRewrite("SELECT 'FROM x FINAL' AS s") ===
      "SELECT 'FROM x FINAL' AS s")
  }

  test("LIMIT n BY col: per-group top-n with the statement's ORDER BY") {
    ChCompat.registerAll(spark)
    import spark.implicits._
    Seq((1, 10), (1, 30), (1, 20), (2, 5), (2, 15), (3, 1))
      .toDF("g", "v").createOrReplaceTempView("chspec_lb")
    val got = ChCompat.sql(spark,
      "SELECT g, v FROM chspec_lb ORDER BY v DESC LIMIT 2 BY g")
      .as[(Int, Int)].collect().toSeq
    assert(got === Seq((1, 30), (1, 20), (2, 15), (2, 5), (3, 1)))
    // with a trailing global LIMIT after the LIMIT BY clause
    val capped = ChCompat.sql(spark,
      "SELECT g, v FROM chspec_lb ORDER BY v DESC LIMIT 2 BY g LIMIT 3")
      .as[(Int, Int)].collect().toSeq
    assert(capped === Seq((1, 30), (1, 20), (2, 15)))
    // plain LIMIT is not touched
    assert(ChSqlRewrite("SELECT * FROM t LIMIT 5") ===
      "SELECT * FROM t LIMIT 5")
    // LIMIT BY text inside a string literal is untouched
    assert(ChSqlRewrite("SELECT 'LIMIT 2 BY g' AS s FROM t") ===
      "SELECT 'LIMIT 2 BY g' AS s FROM t")
  }

  test("If-combinators (uniqIf family) and arrayEnumerate") {
    ChCompat.registerAll(spark)
    val r = spark.sql(
      """SELECT uniqIf(x, x > 1) AS ui,
                uniqExactIf(x, x > 1) AS ue,
                groupArrayIf(x, x % 2 = 0) AS ga,
                arrayEnumerate(array('a', 'b', 'c')) AS ae,
                arrayEnumerate(array()) AS ae0
         FROM VALUES (1), (2), (2), (3) AS t(x)""").head
    assert(r.getLong(0) === 2L) // {2, 3}
    assert(r.getInt(1) === 2)
    assert(r.getSeq[Int](2) === Seq(2, 2))
    assert(r.getSeq[Int](3) === Seq(1, 2, 3))
    assert(r.getSeq[Int](4) === Seq.empty)
    // multi-arg tuple form of uniqIf counts distinct tuples
    val t = spark.sql(
      """SELECT uniqExactIf(x, y, x > 0) AS ut
         FROM VALUES (1, 'a'), (1, 'b'), (1, 'a'), (-1, 'z') AS t(x, y)""").head
    assert(t.getInt(0) === 2)
  }

  test("date/time arithmetic family (fourth pass) + splitByString") {
    ChCompat.registerAll(spark)
    val r = spark.sql(
      """SELECT addYears(DATE'2020-02-29', 1) AS ay,
                subtractYears(DATE'2020-02-29', 1) AS sy,
                addHours(TIMESTAMP'2015-03-07 23:30:00', 2) AS ah,
                addMinutes(TIMESTAMP'2015-03-07 14:59:00', 2) AS am,
                addSeconds(TIMESTAMP'2015-03-07 14:15:59', 2) AS asec,
                subtractHours(TIMESTAMP'2015-03-08 01:30:00', 2) AS sh,
                subtractMinutes(TIMESTAMP'2015-03-07 14:01:00', 2) AS sm,
                subtractSeconds(TIMESTAMP'2015-03-07 14:15:01', 2) AS ss,
                toLastDayOfMonth(DATE'2015-02-07') AS ld,
                toStartOfMinute(TIMESTAMP'2015-03-07 14:15:45') AS som,
                splitByString('||', 'a||b.c||d') AS sbs""").head
    assert(r.getDate(0).toString === "2021-02-28") // CH clamps leap day
    assert(r.getDate(1).toString === "2019-02-28")
    assert(r.getTimestamp(2).toString === "2015-03-08 01:30:00.0")
    assert(r.getTimestamp(3).toString === "2015-03-07 15:01:00.0")
    assert(r.getTimestamp(4).toString === "2015-03-07 14:16:01.0")
    assert(r.getTimestamp(5).toString === "2015-03-07 23:30:00.0")
    assert(r.getTimestamp(6).toString === "2015-03-07 13:59:00.0")
    assert(r.getTimestamp(7).toString === "2015-03-07 14:14:59.0")
    assert(r.getDate(8).toString === "2015-02-28")
    assert(r.getTimestamp(9).toString === "2015-03-07 14:15:00.0")
    // literal separator: regex metachars in '||' don't explode the split
    assert(r.getSeq[String](10) === Seq("a", "b.c", "d"))
  }

  test("PREWHERE merges into WHERE; SETTINGS/FORMAT trailers stripped") {
    // PREWHERE + WHERE: both conditions parenthesized and AND-ed
    assert(ChSqlRewrite("SELECT * FROM t PREWHERE a > 1 WHERE b OR c GROUP BY x")
      === "SELECT * FROM t WHERE (a > 1) AND (b OR c) GROUP BY x")
    // PREWHERE alone: renamed
    assert(ChSqlRewrite("SELECT * FROM t PREWHERE a > 1")
      === "SELECT * FROM t WHERE a > 1")
    // nested subquery PREWHERE; the outer WHERE is out of scope
    assert(ChSqlRewrite(
      "SELECT * FROM (SELECT * FROM t PREWHERE a WHERE b) WHERE c")
      === "SELECT * FROM (SELECT * FROM t WHERE (a) AND (b) ) WHERE c")
    // trailers
    assert(ChSqlRewrite("SELECT * FROM t WHERE a LIMIT 5 SETTINGS max_threads = 8")
      === "SELECT * FROM t WHERE a LIMIT 5")
    assert(ChSqlRewrite("SELECT * FROM t FORMAT JSON")
      === "SELECT * FROM t")
    assert(ChSqlRewrite("SELECT * FROM t SETTINGS a = 1 FORMAT TSV")
      === "SELECT * FROM t")
    // a column named format / a table named settings survive
    assert(ChSqlRewrite("SELECT format FROM t") === "SELECT format FROM t")
    assert(ChSqlRewrite("SELECT * FROM settings WHERE x = 1")
      === "SELECT * FROM settings WHERE x = 1")
    // string-literal safety
    assert(ChSqlRewrite("SELECT 'PREWHERE x FORMAT JSON' AS s FROM t")
      === "SELECT 'PREWHERE x FORMAT JSON' AS s FROM t")
    // end-to-end through the dialect entry
    import spark.implicits._
    Seq((1, "a", 150.0), (2, "error", 200.0), (3, "a", 50.0))
      .toDF("event_id", "event_type", "value")
      .createOrReplaceTempView("chspec_pw")
    val r = ChCompat.sql(spark, """
      SELECT event_type, count() AS cnt
      FROM chspec_pw PREWHERE value > 100 WHERE event_type != 'error'
      GROUP BY event_type SETTINGS max_threads = 4 FORMAT JSON""").head
    assert(r.getString(0) === "a" && r.getLong(1) === 1L)
  }

  test("ANY LEFT/INNER JOIN … USING dedups the right side by the join key") {
    assert(ChSqlRewrite("SELECT * FROM l ANY LEFT JOIN r USING (k)")
      === "SELECT * FROM l LEFT JOIN (SELECT * EXCEPT (__any_rn) FROM " +
        "(SELECT *, row_number() OVER (PARTITION BY k ORDER BY k) AS " +
        "__any_rn FROM r) WHERE __any_rn = 1) AS r USING (k)")
    // aliased right side keeps its alias; the ON form (round-7)
    // dedups by the equality key set extracted from the conjuncts
    assert(ChSqlRewrite("SELECT * FROM l ANY JOIN r AS d USING (k1, k2)")
      .contains("PARTITION BY k1, k2"))
    assert(ChSqlRewrite("SELECT * FROM l ANY JOIN r ON l.k = r.k")
      .contains("PARTITION BY k"))
    // aliased subquery right side keeps its alias
    val sub = ChSqlRewrite(
      "SELECT * FROM l ANY LEFT JOIN (SELECT k, v FROM r) t USING (k)")
    assert(sub.contains("FROM (SELECT k, v FROM r)") && sub.contains(") t USING (k)"))
    // end-to-end: at most one right row joins per key
    import spark.implicits._
    Seq((1, "x"), (2, "y")).toDF("k", "lv")
      .createOrReplaceTempView("chspec_any_l")
    Seq((1, "a"), (1, "b"), (2, "c")).toDF("k", "rv")
      .createOrReplaceTempView("chspec_any_r")
    val rows = ChCompat.sql(spark,
      """SELECT k, lv, rv FROM chspec_any_l
         ANY LEFT JOIN chspec_any_r USING (k) ORDER BY k""")
      .collect()
    assert(rows.length === 2) // one row per left key, not 3
  }

  test("review fixes: nested rewrites inside copied spans; ORDER BY format ASC") {
    // nested CH-isms inside arrayCount/arrayFirst lambdas rewrite too
    assert(ChSqlRewrite("arrayCount(x -> position(x, ',') > 0, arr)")
      === "size(filter(arr, x -> chPosition(x, ',') > 0))")
    assert(ChSqlRewrite("arrayFirst(x -> extract(x, '(a)') = 'a', arr)")
      === "try_element_at(filter(arr, x -> chExtract(x, '(a)') = 'a'), 1)")
    // nested CH-isms inside curried params/args rewrite too
    assert(ChSqlRewrite("quantile(0.5)(position(h, n))")
      === "chQuantile(0.5, chPosition(h, n))")
    // a trailing column named `format` with a sort direction survives
    assert(ChSqlRewrite("SELECT * FROM t ORDER BY format ASC")
      === "SELECT * FROM t ORDER BY format ASC")
    assert(ChSqlRewrite("SELECT * FROM t ORDER BY x, format DESC")
      === "SELECT * FROM t ORDER BY x, format DESC")
    // while a genuine trailer after an identifier still strips
    assert(ChSqlRewrite("SELECT x FROM t FORMAT JSONEachRow")
      === "SELECT x FROM t")
  }

  test("FINAL gate view isolation: the shipped events declaration survives") {
    // r35 registers its own view name; the JVM-global registry entry
    // for the ingest "events" table must keep its reference key
    val rewritten = ChSqlRewrite("SELECT * FROM events FINAL")
    assert(rewritten.contains("PARTITION BY platform, org_id, repo_id"),
      s"ingest events FINAL key clobbered: $rewritten")
    assert(rewritten.contains("struct(from_api, id) DESC"))
  }

  test("SAMPLE <fraction> maps to a seeded TABLESAMPLE") {
    assert(ChSqlRewrite("SELECT * FROM t SAMPLE 0.1 WHERE a")
      === "SELECT * FROM t TABLESAMPLE (10.0 PERCENT) REPEATABLE (42) WHERE a")
    assert(ChSqlRewrite("SELECT * FROM t SAMPLE .5")
      === "SELECT * FROM t TABLESAMPLE (50.0 PERCENT) REPEATABLE (42)")
    // row-count form passes through (needs server-side table stats)
    assert(ChSqlRewrite("SELECT * FROM t SAMPLE 10000")
      === "SELECT * FROM t SAMPLE 10000")
    // a column named sample survives
    assert(ChSqlRewrite("SELECT sample, x FROM t")
      === "SELECT sample, x FROM t")
    // runs end-to-end and returns a subset
    import spark.implicits._
    (1 to 1000).toDF("v").createOrReplaceTempView("chspec_sample")
    val n = ChCompat.sql(spark,
      "SELECT count() AS c FROM chspec_sample SAMPLE 0.2").head.getLong(0)
    assert(n > 0 && n < 1000)
  }

  test("GROUP BY … WITH TOTALS rewrites to GROUPING SETS ((cols), ())") {
    assert(ChSqlRewrite("SELECT a, count() FROM t GROUP BY a WITH TOTALS")
      === "SELECT a, count(*) FROM t GROUP BY GROUPING SETS ((a), ())")
    assert(ChSqlRewrite(
      "SELECT a, b, sum(v) FROM t GROUP BY a, b WITH TOTALS ORDER BY a")
      === "SELECT a, b, sum(v) FROM t GROUP BY GROUPING SETS ((a, b), ()) ORDER BY a")
    // WITH ROLLUP is native Spark; untouched
    assert(ChSqlRewrite("SELECT a FROM t GROUP BY a WITH ROLLUP")
      === "SELECT a FROM t GROUP BY a WITH ROLLUP")
    // CTE WITH is untouched
    assert(ChSqlRewrite("WITH x AS (SELECT 1) SELECT * FROM x")
      === "WITH x AS (SELECT 1) SELECT * FROM x")
    // end-to-end: totals row appears with NULL group key
    import spark.implicits._
    Seq(("a", 1), ("a", 2), ("b", 3)).toDF("g", "v")
      .createOrReplaceTempView("chspec_totals")
    val rows = ChCompat.sql(spark,
      "SELECT g, sum(v) AS s FROM chspec_totals GROUP BY g WITH TOTALS ORDER BY g")
      .collect().map(r => (if (r.isNullAt(0)) "TOTAL" else r.getString(0),
        r.getLong(1))).toSeq
    assert(rows.contains(("TOTAL", 6L)) &&
      rows.contains(("a", 3L)) && rows.contains(("b", 3L)))
  }

  test("array HOFs (lambda-first CH order), hasAny/hasAll, uniqUpTo") {
    ChCompat.registerAll(spark)
    val r = ChCompat.sql(spark,
      """SELECT arrayMap(x -> x * 2, array(1, 2, 3)) AS am,
                arrayFilter(x -> x > 1, array(1, 2, 3)) AS af,
                arrayExists(x -> x = 2, array(1, 2, 3)) AS ae,
                arrayAll(x -> x > 0, array(1, 2, 3)) AS aa,
                arrayCount(x -> x % 2 = 1, array(1, 2, 3)) AS ac,
                arrayFirst(x -> x > 1, array(1, 2, 3)) AS afi,
                arrayFirst(x -> x > 9, array(1, 2, 3)) AS afn,
                hasAny(array(1, 2), array(2, 3)) AS ha,
                hasAny(array(1, 2), array(3, 4)) AS ha0,
                hasAll(array(1, 2, 3), array(1, 3)) AS hl,
                hasAll(array(1, 2), array(1, 3)) AS hl0""").head
    assert(r.getSeq[Int](0) === Seq(2, 4, 6))
    assert(r.getSeq[Int](1) === Seq(2, 3))
    assert(r.getBoolean(2) && r.getBoolean(3))
    assert(r.getInt(4) === 2)
    assert(r.getInt(5) === 2)
    assert(r.isNullAt(6))
    assert(r.getBoolean(7) && !r.getBoolean(8))
    assert(r.getBoolean(9) && !r.getBoolean(10))
    // two-array map = zip_with; arity errors are loud, never silent
    val z = ChCompat.sql(spark,
      "SELECT arrayMap((x, y) -> x + y, array(1, 2), array(10, 20)) AS z")
      .head
    assert(z.getSeq[Int](0) === Seq(11, 22))
    intercept[Exception] {
      ChCompat.sql(spark,
        "SELECT arrayFilter(x -> x > 0, array(1), array(2))").collect()
    }
    // uniqUpTo: exact below the cap, N+1 at saturation
    val u = ChCompat.sql(spark,
      """SELECT uniqUpTo(5)(x) AS below, uniqUpTo(2)(x) AS capped
         FROM VALUES (1), (2), (3), (3) AS t(x)""").head
    assert(u.getInt(0) === 3)
    assert(u.getInt(1) === 3) // 3 distinct > 2 → N+1 = 3
    // TDigest/Timing estimator names flatten to the quantile aggregate
    assert(ChSqlRewrite("quantileTDigest(0.5)(x)") === "chQuantile(0.5, x)")
    assert(ChSqlRewrite("quantileTiming(0.9)(x)") === "chQuantile(0.9, x)")
  }

  test("topK(k)(x): curried heavy-hitters via the FreqTopK sketch") {
    ChCompat.registerAll(spark)
    val r = ChCompat.sql(spark,
      """SELECT topK(2)(v) AS top, anyHeavy(v) AS ah
         FROM VALUES ('a'),('b'),('a'),('c'),('a'),('b') AS t(v)""").head
    assert(r.getSeq[String](0) === Seq("a", "b"))
    assert(r.getString(1) === "a")
  }

  test("string/array helpers (second widening pass)") {
    ChCompat.registerAll(spark)
    val r = ChCompat.sql(spark,
      """SELECT empty('') AS e1, empty('x') AS e0, notEmpty('x') AS ne,
                lengthUTF8('héllo') AS l,
                position('Hello world', 'world') AS p,
                positionCaseInsensitive('Hello World', 'world') AS pc,
                substringUTF8('héllo', 2, 3) AS su,
                lowerUTF8('AbC') AS lo, upperUTF8('aBc') AS up,
                leftPad('7', 3, '0') AS lp, rightPad('7', 3) AS rp,
                trimBoth('  x  ') AS tb,
                arraySum(array(1.5, 2.5, 3.0)) AS s,
                arrayMin(array(3, 1, 2)) AS mn, arrayMax(array(3, 1, 2)) AS mx,
                arrayConcat(array(1, 2), array(3)) AS ac,
                arraySort(array(3, 1, 2)) AS aso,
                arrayReverse(array(1, 2, 3)) AS ar,
                arrayFlatten(array(array(1, 2), array(3))) AS af,
                arraySlice(array(1, 2, 3, 4), 2, 2) AS asl,
                arrayPushBack(array(1, 2), 3) AS ap,
                range(3) AS r1, range(2, 5) AS r2,
                modulo(7, 3) AS md, plus(2, 3) AS pl, minus(5, 2) AS mi,
                multiply(4, 3) AS mu, bitAnd(12, 10) AS ba, bitOr(12, 10) AS bo,
                bitXor(12, 10) AS bx, bitShiftLeft(1, 4) AS bsl,
                bitShiftRight(16, 4) AS bsr""").head
    assert(r.getBoolean(0) && !r.getBoolean(1) && r.getBoolean(2))
    assert(r.getInt(3) === 5)
    assert(r.getInt(4) === 7 && r.getInt(5) === 7)
    assert(r.getString(6) === "éll")
    assert(r.getString(7) === "abc" && r.getString(8) === "ABC")
    assert(r.getString(9) === "007" && r.getString(10) === "7  ")
    assert(r.getString(11) === "x")
    assert(r.getDouble(12) === 7.0)
    assert(r.getInt(13) === 1 && r.getInt(14) === 3)
    assert(r.getSeq[Int](15) === Seq(1, 2, 3))
    assert(r.getSeq[Int](16) === Seq(1, 2, 3))
    assert(r.getSeq[Int](17) === Seq(3, 2, 1))
    assert(r.getSeq[Int](18) === Seq(1, 2, 3))
    assert(r.getSeq[Int](19) === Seq(2, 3))
    assert(r.getSeq[Int](20) === Seq(1, 2, 3))
    assert(r.getSeq[Long](21) === Seq(0L, 1L, 2L))
    assert(r.getSeq[Long](22) === Seq(2L, 3L, 4L))
    assert(r.getInt(23) === 1 && r.getInt(24) === 5 && r.getInt(25) === 3)
    assert(r.getInt(26) === 12)
    assert(r.getInt(27) === 8 && r.getInt(28) === 14 && r.getInt(29) === 6)
    assert(r.getInt(30) === 16 && r.getInt(31) === 1)
  }

  test("review fixes: escaped parens, no grouping commas, JSON null, " +
      "ANY-ON guards, DISTINCT ON after a UNION branch") {
    ChCompat.registerAll(spark)
    val r = ChCompat.sql(spark, """SELECT
      extractAll('a(b(c', '\\(') AS ea,
      formatReadableSize(1000) AS fs,
      formatReadableQuantity(2.0e15) AS fq,
      JSONHas('{"n": null}', 'n') AS jn,
      JSONHas('{"n": null}', 'z') AS jz,
      JSONHas('[1,2,3]', 2) AS ja,
      JSONHas('[1]', 2) AS ja0""").head
    assert(r.getSeq[String](0) === Seq("(", "("))
    assert(r.getString(1) === "1000.00 B") // no grouping comma
    assert(r.getString(2) === "2000.00 trillion")
    assert(r.getBoolean(3)) // JSON null is PRESENT
    assert(!r.getBoolean(4))
    assert(r.getBoolean(5) && !r.getBoolean(6))
    // non-key-determined ANY ... ON passes through (fails loudly)
    val s1 = "SELECT 1 FROM l ANY JOIN r ON r.a = l.b + r.c"
    assert(ChSqlRewrite(s1) === s1)
    // dotted right relation keeps its full name
    assert(ChSqlRewrite("SELECT 1 FROM l ANY JOIN db.r ON l.k = r.k")
      .contains("FROM db.r)"))
    // DISTINCT ON inside a set operation cannot be scoped lexically:
    // it passes through untouched (fails loudly) instead of wrapping
    // the whole union in the per-group cut
    val u = "SELECT a FROM t LIMIT 5 UNION ALL " +
      "SELECT DISTINCT ON (k) k FROM u ORDER BY k"
    assert(ChSqlRewrite(u) === u)
  }

  test("toInterval* constructors and readable formatters") {
    ChCompat.registerAll(spark)
    val r = ChCompat.sql(spark, """SELECT
      timestamp'2024-01-01 00:00:00' + toIntervalDay(3) AS d3,
      timestamp'2024-01-01 00:00:00' + toIntervalHour(2) AS h2,
      DATE'2024-01-31' + toIntervalMonth(1) AS m1,
      formatReadableSize(1536) AS s1,
      formatReadableSize(1048576) AS s2,
      formatReadableSize(12) AS s3,
      formatReadableQuantity(1234567) AS q1,
      formatReadableQuantity(999) AS q2""").head
    assert(r.getTimestamp(0).toString.startsWith("2024-01-04 00:00:00"))
    assert(r.getTimestamp(1).toString.startsWith("2024-01-01 02:00:00"))
    assert(r.getDate(2).toString === "2024-02-29") // month-end clamp
    assert(r.getString(3) === "1.50 KiB")
    assert(r.getString(4) === "1.00 MiB")
    assert(r.getString(5) === "12.00 B")
    assert(r.getString(6) === "1.23 million")
    assert(r.getString(7) === "999.00")
  }

  test("bracket array literals convert; subscripts untouched") {
    ChCompat.registerAll(spark)
    val r = ChCompat.sql(spark, """SELECT
      [1, 2, 3] AS a,
      [[1], [2, 3]] AS nested,
      ['x,y', 'z'] AS strs,
      [1, 2][1] AS sub,
      has([10, 20], 20) AS h""").head
    assert(r.getSeq[Int](0) === Seq(1, 2, 3))
    assert(r.getSeq[Seq[Int]](1) === Seq(Seq(1), Seq(2, 3)))
    assert(r.getSeq[String](2) === Seq("x,y", "z")) // comma in quotes
    // literal then SUBSCRIPT after ] — note the DOCUMENTED divergence:
    // bracket subscripts stay Spark-0-based ([1] = second element);
    // CH's 1-based element access is arrayElement(arr, n)
    assert(r.getInt(3) === 2)
    assert(r.getBoolean(4))
    // identifier subscripts never convert
    assert(ChSqlRewrite("SELECT arr[1] FROM t") === "SELECT arr[1] FROM t")
    assert(ChSqlRewrite("SELECT f(x)[0] FROM t") ===
      "SELECT f(x)[0] FROM t")
  }

  test("eighth alias pass: date/string/float/map/JSON odds and ends") {
    ChCompat.registerAll(spark)
    val r = ChCompat.sql(spark, """SELECT
      fromUnixTimestamp(1425472200) AS t1,
      monthName(DATE'2015-03-04') AS mn,
      dateName('weekday', DATE'2015-03-04') AS wd,
      toModifiedJulianDay(DATE'1858-11-18') AS mjd,
      leftUTF8('hello', 2) AS l2,
      concatWithSeparator('-', 'a', 'b') AS cw,
      extractAll('a1b22c', '\\d+') AS ea,
      extractAll('a1b22c', '([a-z])\\d') AS eg,
      multiSearchAny('haystack', ['xyz', 'stack']) AS ms,
      isFinite(1.0) AS f1, isFinite(double('Infinity')) AS f2,
      isInfinite(double('-Infinity')) AS inf,
      ifNotFinite(double('NaN'), 42.0) AS inf42,
      roundBankers(2.5) AS rb,
      mapKeys(map('k', 1)) AS mk, mapContains(map('k', 1), 'k') AS mc,
      bitTest(5, 2) AS bt1, bitTest(5, 1) AS bt0,
      JSONExtractString('{"a":{"b":"x"}}', 'a', 'b') AS js,
      JSONExtractInt('{"n": 7}', 'n') AS ji,
      JSONHas('{"n": 7}', 'n') AS jh1, JSONHas('{"n": 7}', 'z') AS jh0,
      visitParamExtractString('{"p":"q"}', 'p') AS vp,
      timeSlot(timestamp'2024-01-01 10:44:00') AS ts""")
      .head
    assert(!r.isNullAt(0))
    assert(r.getString(1) === "March")
    assert(r.getString(2) === "Wednesday")
    assert(r.getInt(3) === 1)
    assert(r.getString(4) === "he")
    assert(r.getString(5) === "a-b")
    assert(r.getSeq[String](6) === Seq("1", "22"))
    assert(r.getSeq[String](7) === Seq("a", "b"))
    assert(r.getBoolean(8))
    assert(r.getBoolean(9) && !r.getBoolean(10))
    assert(r.getBoolean(11))
    assert(r.getDouble(12) === 42.0)
    assert(r.getDecimal(13).doubleValue() === 2.0) // banker's rounding
    assert(r.getSeq[String](14) === Seq("k") && r.getBoolean(15))
    assert(r.getInt(16) === 1 && r.getInt(17) === 0)
    assert(r.getString(18) === "x")
    assert(r.getLong(19) === 7L)
    assert(r.getBoolean(20) && !r.getBoolean(21))
    assert(r.getString(22) === "q")
    assert(r.getTimestamp(23).toString.startsWith("2024-01-01 10:30:00"))
  }

  test("seventh alias pass: bit aggs, stable variants, weighted forms") {
    import spark.implicits._
    Seq((1, 6, 2.0, 1L), (1, 3, 4.0, 3L), (2, 5, 10.0, 2L))
      .toDF("g", "b", "x", "w").createOrReplaceTempView("al7_t")
    ChCompat.registerAll(spark)
    val r = ChCompat.sql(spark, """SELECT
      groupBitAnd(b) AS band, groupBitOr(b) AS bor,
      groupBitXor(b) AS bxor,
      uniqTheta(g) AS ut,
      CAST(varSampStable(x) AS DECIMAL(10,4)) AS vs,
      avgWeighted(x, w) AS aw
      FROM al7_t""").head
    assert(r.getInt(0) === (6 & 3 & 5))
    assert(r.getInt(1) === (6 | 3 | 5))
    assert(r.getInt(2) === (6 ^ 3 ^ 5))
    assert(r.getLong(3) === 2L)
    assert(r.getDecimal(4).doubleValue() > 0)
    // (2*1 + 4*3 + 10*2) / (1+3+2) = 34/6
    assert(math.abs(r.getDouble(5) - 34.0 / 6) < 1e-12)
    // zero total weight -> NULL, not a crash
    val z = ChCompat.sql(spark,
      "SELECT avgWeighted(x, 0) AS aw FROM al7_t").head
    assert(z.isNullAt(0))
    // curried weighted topK and deterministic quantile
    val c = ChCompat.sql(spark, """SELECT
      topKWeighted(1)(g, w) AS tw,
      quantileDeterministic(0.5)(x, g) AS qd FROM al7_t""").head
    assert(c.getSeq[String](0) === Seq("1")) // weight 1+3 beats 2
    assert(c.getDouble(1) === 4.0)
  }

  test("LIMIT n WITH TIES keeps rows tying with the n-th") {
    import spark.implicits._
    Seq((1, 30), (2, 20), (3, 20), (4, 10)).toDF("id", "score")
      .createOrReplaceTempView("ties_t")
    val got = ChCompat.sql(spark,
      "SELECT id, score FROM ties_t ORDER BY score DESC LIMIT 2 WITH TIES")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    // rank 2 is shared by ids 2 and 3 → three rows survive
    assert(got.map(_._2) === Seq(30, 20, 20))
    assert(got.map(_._1).toSet === Set(1, 2, 3))
    // plain LIMIT is untouched
    assert(ChSqlRewrite("SELECT 1 LIMIT 2") === "SELECT 1 LIMIT 2")
  }

  test("LIMIT offset, count rewrites to LIMIT/OFFSET; LIMIT BY intact") {
    import spark.implicits._
    (1 to 10).map(i => (i, i * 10)).toDF("id", "v")
      .createOrReplaceTempView("lo_t")
    val got = ChCompat.sql(spark,
      "SELECT id FROM lo_t ORDER BY id LIMIT 3, 2")
      .collect().map(_.getInt(0)).toSeq
    assert(got === Seq(4, 5)) // skip 3, take 2
    assert(ChSqlRewrite("SELECT 1 LIMIT 3, 2") ===
      "SELECT 1 LIMIT 2 OFFSET 3")
    // quoted text is never rewritten
    assert(ChSqlRewrite("SELECT 'LIMIT 1, 2' AS s") ===
      "SELECT 'LIMIT 1, 2' AS s")
  }

  test("WITH scalar aliases substitute; CTEs pass through") {
    import spark.implicits._
    Seq((1, 50.0), (2, 150.0), (3, 250.0)).toDF("id", "v")
      .createOrReplaceTempView("sw_t")
    // pure scalar WITH
    val a = ChCompat.sql(spark,
      "WITH 100 AS threshold SELECT count(*) AS n FROM sw_t " +
        "WHERE v > threshold").head.getLong(0)
    assert(a === 2L)
    // expression alias + member-access and call-position immunity
    val b = ChCompat.sql(spark,
      "WITH 10 * 10 AS k SELECT id, v + k AS vk FROM sw_t t " +
        "WHERE t.id = 1").head.getDouble(1)
    assert(b === 150.0)
    // mixed: scalar + standard CTE in one WITH
    val c = ChCompat.sql(spark,
      """WITH 100 AS thr, big AS (SELECT * FROM sw_t WHERE v > thr)
        |SELECT count(*) AS n FROM big""".stripMargin).head.getLong(0)
    assert(c === 2L)
    // plain CTE-only WITH is untouched text
    val cteOnly = "WITH x AS (SELECT 1 AS a) SELECT a FROM x"
    assert(ChSqlRewrite(cteOnly) === cteOnly)
    // chained scalar aliases resolve to a fixpoint
    val d = ChCompat.sql(spark,
      "WITH 100 AS a, a * 2 AS b SELECT b + 1 AS r").head.getInt(0)
    assert(d === 201)
    // a quoted LIMIT-comma earlier in the text doesn't mask a real one
    val masked = ChSqlRewrite(
      "SELECT 'LIMIT 1, 2' AS s FROM t ORDER BY s LIMIT 3, 4")
    assert(masked.endsWith("LIMIT 4 OFFSET 3"))
  }

  test("EXPLAIN SYNTAX returns the front-end's rewritten SQL") {
    import spark.implicits._
    Seq((1, 2.0)).toDF("id", "v").createOrReplaceTempView("ex_t")
    val rewritten = ChCompat.sql(spark,
      "EXPLAIN SYNTAX SELECT quantile(0.5)(v) FROM ex_t LIMIT 3, 2")
      .head.getString(0)
    assert(rewritten.contains("chQuantile(0.5, v)"))
    assert(rewritten.contains("LIMIT 2 OFFSET 3"))
    // EXPLAIN PLAN delegates to Spark's formatted explain
    val plan = ChCompat.sql(spark,
      "EXPLAIN PLAN SELECT count() FROM ex_t").head.getString(0)
    assert(plan.contains("Physical Plan"))
  }

  test("DISTINCT ON rewrites to LIMIT 1 BY") {
    import spark.implicits._
    Seq((1, 10, "a"), (1, 20, "b"), (2, 5, "c"), (2, 50, "d"))
      .toDF("k", "v", "s").createOrReplaceTempView("don_t")
    // highest v per k: DISTINCT ON keeps the first row per key in the
    // statement's ORDER BY
    val got = ChCompat.sql(spark,
      "SELECT DISTINCT ON (k) k, v, s FROM don_t ORDER BY v DESC")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq.sorted
    assert(got === Seq((1, 20), (2, 50)))
    // trailing LIMIT applies AFTER the per-group cut
    val one = ChCompat.sql(spark,
      "SELECT DISTINCT ON (k) k, v FROM don_t ORDER BY v DESC LIMIT 1")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(one === Seq((2, 50)))
    // plain SELECT DISTINCT is untouched
    val plain = "SELECT DISTINCT k FROM don_t"
    assert(ChSqlRewrite(plain) === plain)
  }

  test("system.* introspection tables resolve against the catalog") {
    import spark.implicits._
    Seq((1, "x")).toDF("id", "s").createOrReplaceTempView("sys_probe")
    val tables = ChCompat.sql(spark,
      "SELECT name FROM system.tables WHERE name = 'sys_probe'")
    assert(tables.count() === 1)
    val cols = ChCompat.sql(spark,
      "SELECT name, type FROM system.columns WHERE table = 'sys_probe' " +
        "ORDER BY position")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(cols === Seq(("id", "int"), ("s", "string")))
    assert(ChCompat.sql(spark, "SELECT dummy FROM system.one")
      .head.getInt(0) === 0)
    assert(ChCompat.sql(spark, "SELECT count(*) AS n FROM system.databases")
      .head.getLong(0) >= 1L)
    // a column literally named `system` is untouched
    assert(ChSqlRewrite("SELECT system FROM t WHERE system = 1") ===
      "SELECT system FROM t WHERE system = 1")
  }

  test("system.* snapshots are cached per catalog epoch, DDL invalidates") {
    import spark.implicits._
    Seq((1, "x")).toDF("id", "s").createOrReplaceTempView("sys_cache_probe")
    ChCompat.invalidateSystemViews(spark) // see the view created above
    val before = ChCompat.systemViewBuilds.get()
    ChCompat.sql(spark,
      "SELECT count(*) AS n FROM system.columns WHERE table = 'sys_cache_probe'")
      .collect()
    val afterFirst = ChCompat.systemViewBuilds.get()
    assert(afterFirst > before, "first probe must walk the catalog")
    // repeated probes in the same epoch serve the snapshot — NO builds
    (1 to 3).foreach { _ =>
      ChCompat.sql(spark, "SELECT count(*) FROM system.columns").collect()
      ChCompat.sql(spark, "SELECT count(*) FROM system.tables").count()
    }
    // system.tables was not yet built this epoch — exactly one more
    assert(ChCompat.systemViewBuilds.get() === afterFirst + 1)
    // a catalog-changing statement routed through sql() bumps the epoch:
    // the next probe rebuilds and SEES the new table
    ChCompat.sql(spark,
      "CREATE TABLE sys_cache_t2 (k INT) USING parquet " +
        s"LOCATION '${java.nio.file.Files.createTempDirectory("sysc")}'")
    val n = ChCompat.sql(spark,
      "SELECT count(*) AS n FROM system.tables WHERE name = 'sys_cache_t2'")
      .head.getLong(0)
    assert(n === 1L)
    spark.sql("DROP TABLE sys_cache_t2")
  }

  test("system.* snapshots self-validate: bare-API temp view between " +
      "two probes is seen by the second") {
    import spark.implicits._
    // prime the cache with a probe that does NOT know about the view yet
    ChCompat.sql(spark, "SELECT count(*) FROM system.tables").collect()
    // mutate the catalog AROUND ChCompat.sql — no invalidate call: this
    // is the exact order-dependent staleness the fingerprint must catch
    Seq((1, "x")).toDF("id", "s")
      .createOrReplaceTempView("sys_fingerprint_probe")
    val n = ChCompat.sql(spark,
      "SELECT count(*) AS n FROM system.tables " +
        "WHERE name = 'sys_fingerprint_probe'").head.getLong(0)
    assert(n === 1L, "second probe must see the bare-API temp view")
    // and system.columns re-walks too (it shares the fingerprint)
    val cols = ChCompat.sql(spark,
      "SELECT name FROM system.columns " +
        "WHERE table = 'sys_fingerprint_probe' ORDER BY position")
      .collect().map(_.getString(0)).toSeq
    assert(cols === Seq("id", "s"))
    // unchanged catalog → snapshot served, no extra builds
    val before = ChCompat.systemViewBuilds.get()
    ChCompat.sql(spark, "SELECT count(*) FROM system.tables").collect()
    ChCompat.sql(spark, "SELECT count(*) FROM system.columns").collect()
    assert(ChCompat.systemViewBuilds.get() === before)
  }

  test("paren-less USING gains parens; DDL USING parquet untouched") {
    import spark.implicits._
    Seq((1, "a", 5), (2, "b", 6)).toDF("k", "s", "v")
      .createOrReplaceTempView("u_l")
    Seq((1, "x"), (2, "y")).toDF("k", "t").createOrReplaceTempView("u_r")
    val got = ChCompat.sql(spark,
      "SELECT k, t FROM u_l JOIN u_r USING k ORDER BY k")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(got === Seq((1, "x"), (2, "y")))
    // multi-column bare list
    Seq((1, "a", 7)).toDF("k", "s", "w").createOrReplaceTempView("u_r2")
    val got2 = ChCompat.sql(spark,
      "SELECT k, s, w FROM u_l JOIN u_r2 USING k, s").collect()
    assert(got2.length === 1 && got2.head.getInt(2) === 7)
    // no JOIN before → not a join clause → untouched
    assert(ChSqlRewrite("CREATE TABLE x (a INT) USING parquet") ===
      "CREATE TABLE x (a INT) USING parquet")
  }

  test("divide is always Float64; parseDateTimeBestEffort multi-format") {
    ChCompat.registerAll(spark)
    val r = spark.sql("""SELECT
      divide(7, 2) AS d1,
      parseDateTimeBestEffort('2015-03-04 12:30:00') AS t1,
      parseDateTimeBestEffort('2015-03-04T12:30:00') AS t2,
      parseDateTimeBestEffort('2015-03-04') AS t3,
      parseDateTimeBestEffort('1425472200') AS t4,
      parseDateTimeBestEffortOrNull('not a date') AS t5""").head
    assert(r.getDouble(0) === 3.5)
    val iso = r.getTimestamp(1).toString
    assert(iso.startsWith("2015-03-04 12:30:00"))
    assert(r.getTimestamp(2).toString.startsWith("2015-03-04 12:30:00"))
    assert(r.getTimestamp(3).toString.startsWith("2015-03-04 00:00:00"))
    assert(!r.isNullAt(4)) // epoch-seconds digits parse
    assert(r.isNullAt(5))
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
      // the round-7 lexical passes ride the same injected parser:
      // bracket literals, scalar WITH, LIMIT offset,count
      val r7 = s2.sql(
        "WITH 2 AS two SELECT x FROM (SELECT explode([1, 2, 3]) AS x) " +
          "WHERE x <= two ORDER BY x LIMIT 1, 5").head
      assert(r7.getInt(0) === 2)
    } finally {
      prev.foreach(SparkSession.setDefaultSession)
      prev.foreach(SparkSession.setActiveSession)
    }
  }
}
