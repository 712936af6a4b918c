package graft.functions

import graft.SparkTestBase

/** Breadth probe over the ClickHouse dialect surface: one-line uses of
  * the CH functions an ad-hoc analyst is most likely to type, each
  * required to parse AND execute through `ChCompat.sql`. The per-
  * function semantics are pinned elsewhere (ChCompatSpec and the
  * oracle gates); this spec guards BREADTH — a registry or rewrite
  * regression that silently drops a family fails here by name.
  */
class ChSurfaceProbeSpec extends SparkTestBase {

  private lazy val ready: Boolean = {
    ChCompat.registerAll(spark)
    val dir = "/root/testdata/sf0.001"
    if (!new java.io.File(dir).isDirectory) false
    else { graft.Tables.registerAll(spark, dir); true }
  }

  private val probes = Seq(
    "SELECT groupArray(event_type) FROM (SELECT event_type FROM events LIMIT 5)",
    "SELECT uniqExact(user_id) FROM events",
    "SELECT countIf(value > 50) FROM events",
    "SELECT sumIf(value, event_type = 'click') FROM events",
    "SELECT avgIf(value, value > 0) FROM events",
    "SELECT anyLast(event_type) FROM events",
    "SELECT arrayMap(x -> x + 1, array(1,2,3))",
    "SELECT arrayFilter(x -> x > 1, array(1,2,3))",
    "SELECT has(array(1,2,3), 2)",
    "SELECT indexOf(array(1,2,3), 2)",
    "SELECT arraySum(array(1,2,3))",
    "SELECT arrayDistinct(array(1,2,2,3))",
    "SELECT splitByChar(',', 'a,b,c')",
    "SELECT arrayStringConcat(array('a','b'), '-')",
    "SELECT empty(''), notEmpty('x')",
    "SELECT startsWith('abc','ab'), endsWith('abc','bc')",
    "SELECT substringUTF8('hello', 2, 3)",
    "SELECT lowerUTF8('ABC'), upperUTF8('abc')",
    "SELECT formatDateTime(now(), '%Y-%m-%d')",
    "SELECT toStartOfHour(now()), toStartOfDay(now()), toStartOfWeek(now())",
    "SELECT toStartOfMonth(now()), toStartOfQuarter(now()), toStartOfYear(now())",
    "SELECT addDays(now(), 3), subtractMonths(now(), 1)",
    "SELECT toUnixTimestamp(now()), fromUnixTimestamp(1700000000)",
    "SELECT dateAdd(DAY, 1, now())",
    "SELECT toDateTime('2015-01-01 00:00:00'), toDate('2015-01-01')",
    "SELECT ifNull(NULL, 'x'), nullIf(1, 1), assumeNotNull(1)",
    "SELECT multiIf(1 > 2, 'a', 2 > 1, 'b', 'c')",
    "SELECT greatest(1,2), least(1,2), intDiv(7,2), modulo(7,2)",
    "SELECT plus(1,2), minus(3,1), multiply(2,3), divide(6,2)",
    "SELECT floor(1.7), ceil(1.2)",
    "SELECT range(5)",
    "SELECT arrayJoin(array(1,2,3))",
    "SELECT bitAnd(12,10), bitOr(12,10), bitXor(12,10)",
    "SELECT cityHash64('x'), sipHash64('x')",
    "SELECT hex(255), unhex('FF')",
    "SELECT lengthUTF8('hello'), reverse('abc')",
    "SELECT extractAll('a1b2', '[0-9]')",
    "SELECT replaceOne('aaa','a','b'), replaceAll('aaa','a','b'), replaceRegexpAll('a1b2','[0-9]','')",
    "SELECT quantilesExact(0.5, 0.9)(value) FROM events",
    "SELECT topK(3)(event_type) FROM events",
    "SELECT argMax(user_id, value), argMin(user_id, value) FROM events",
    "SELECT stddevPop(value), varSamp(value) FROM events",
    "SELECT uniqCombined(user_id) FROM events",
    "SELECT toInt32('42'), toFloat64('1.5'), toString(42)",
    "SELECT JSONExtractInt(props, 'k') FROM events LIMIT 1",
    "SELECT if(1=1, 'y', 'n')",
    "SELECT arrayConcat(array(1),array(2)), arrayReverse(array(1,2,3))",
    "SELECT arraySort(array(3,1,2)), arrayUniq(array(1,1,2))"
  )

  // Batch 2 (round 10): URL/IP, deeper array algebra, string utils,
  // math, datetime parts, and conditional-aggregate spellings.
  private val probes2 = Seq(
    "SELECT domain('https://www.ex.com/a?b=1'), protocol('https://ex.com/')",
    "SELECT path('https://ex.com/a/b?c=1'), queryString('https://ex.com/a?c=1&d=2')",
    "SELECT extractURLParameter('https://ex.com/?k=v&x=1', 'k')",
    "SELECT cutQueryString('https://ex.com/a?c=1')",
    "SELECT topLevelDomain('https://www.ex.com/a')",
    "SELECT IPv4NumToString(3232235777), IPv4StringToNum('192.168.1.1')",
    "SELECT arrayExists(x -> x > 2, array(1,2,3)), arrayAll(x -> x > 0, array(1,2,3))",
    "SELECT arrayCount(x -> x > 1, array(1,2,3)), arrayFirst(x -> x > 1, array(1,2,3))",
    "SELECT arrayFirstIndex(x -> x > 1, array(1,2,3))",
    "SELECT arraySlice(array(1,2,3,4), 2, 2), arrayPushBack(array(1,2), 3)",
    "SELECT arrayPushFront(array(2,3), 1), arrayPopBack(array(1,2,3))",
    "SELECT arrayFlatten(array(array(1,2), array(3)))",
    "SELECT arrayCompact(array(1,1,2,2,3))",
    "SELECT arrayDifference(array(1,4,9)), arrayCumSum(array(1,2,3))",
    "SELECT arrayIntersect(array(1,2,3), array(2,3,4))",
    "SELECT hasAll(array(1,2,3), array(1,2)), hasAny(array(1,2), array(2,9))",
    "SELECT arrayZip(array(1,2), array('a','b'))",
    "SELECT arrayAvg(array(1,2,3)), arrayMin(array(1,2,3)), arrayMax(array(1,2,3))",
    "SELECT arrayEnumerate(array('a','b','c'))",
    "SELECT arrayReduce('sum', array(1,2,3))",
    "SELECT trimBoth('  x  '), trimLeft('  x'), trimRight('x  ')",
    "SELECT leftPad('7', 3, '0'), rightPad('7', 3, '0'), repeat('ab', 3)",
    "SELECT position('hello', 'll'), positionCaseInsensitive('HeLLo', 'll')",
    "SELECT left('hello', 2), right('hello', 2)",
    "SELECT concatWithSeparator('-', 'a', 'b', 'c')",
    "SELECT base64Encode('abc'), base64Decode('YWJj')",
    "SELECT pow(2, 10), exp(1), ln(2.718), log2(8), log10(100)",
    "SELECT sqrt(16), cbrt(27), abs(-3), sign(-5)",
    "SELECT e(), pi()",
    "SELECT intDivOrZero(7, 0), moduloOrZero(7, 0)",
    "SELECT bitShiftLeft(1, 4), bitShiftRight(16, 2), bitNot(0), bitCount(255)",
    "SELECT toYYYYMMDD(now()), toYYYYMMDDhhmmss(now())",
    "SELECT toHour(now()), toMinute(now()), toSecond(now())",
    "SELECT toDayOfWeek(now()), toDayOfMonth(now()), toDayOfYear(now())",
    "SELECT toQuarter(now()), toISOWeek(now()), toISOYear(now())",
    "SELECT today(), yesterday()",
    "SELECT dateDiff('day', toDate('2024-01-01'), toDate('2024-02-01'))",
    "SELECT toStartOfMinute(now()), toStartOfFiveMinutes(now()), toStartOfFifteenMinutes(now())",
    "SELECT toMonday(now()), toLastDayOfMonth(now())",
    "SELECT addHours(now(), 2), addMinutes(now(), 30), subtractDays(now(), 7)",
    "SELECT maxIf(value, event_type='click'), minIf(value, value>0) FROM events",
    "SELECT groupUniqArray(event_type) FROM (SELECT event_type FROM events LIMIT 20)",
    "SELECT groupArraySample(3)(event_type) FROM events",
    "SELECT any(event_type), median(value) FROM events",
    "SELECT quantileExact(0.5)(value), quantileTDigest(0.9)(value) FROM events",
    "SELECT corr(value, user_id), covarPop(value, user_id) FROM events",
    "SELECT entropy(event_type) FROM events",
    "SELECT tuple(1, 'a'), tupleElement(tuple(1, 'a'), 2)",
    "SELECT toUInt8('7'), toInt64('42'), toFloat32('1.5')",
    "SELECT isNull(NULL), isNotNull(1), coalesce(NULL, 2)",
    "SELECT xor(true, false), not(false), and(true, true), or(false, true)"
  )

  test("CH dialect breadth batch 2: every probe parses and executes") {
    assume(ready)
    val failures = probes2.flatMap { q =>
      try { ChCompat.sql(spark, q).collect(); None }
      catch { case e: Throwable =>
        Some(s"$q\n   -> ${Option(e.getMessage).getOrElse(e.getClass.getName).linesIterator.next()}")
      }
    }
    assert(failures.isEmpty,
      s"\n${failures.size}/${probes2.size} probes failed:\n" +
        failures.mkString("\n"))
  }

  test("batch-2 gap fills: pinned semantics") {
    assume(ready)
    val r = ChCompat.sql(spark,
      """SELECT IPv4NumToString(3232235777) AS ip,
                IPv4StringToNum('192.168.1.1') AS ipn,
                arrayFirstIndex(x -> x > 1, array(1,2,3)) AS afi,
                arrayFirstIndex(x -> x > 9, array(1,2,3)) AS afi0,
                intDivOrZero(7, 0) AS dz, intDivOrZero(7, 2) AS dv,
                moduloOrZero(7, 0) AS mz,
                base64Decode(base64Encode('abc')) AS b64,
                toISOYear(toDate('2021-01-01')) AS isoy,
                toISOWeek(toDate('2021-01-01')) AS isow,
                toUInt8('200') AS u8,
                xor(true, true) AS x2,
                entropy(v) AS ent
         FROM (SELECT explode(array('a','a','b','b')) AS v)""").head
    assert(r.getString(0) === "192.168.1.1")
    assert(r.getLong(1) === 3232235777L)
    assert(r.getLong(2) === 2L && r.getLong(3) === 0L) // CH 0-if-none
    assert(r.getLong(4) === 0L && r.getLong(5) === 3L && r.getLong(6) === 0L)
    assert(r.getString(7) === "abc")
    // 2021-01-01 is a Friday of ISO week 53 of ISO year 2020
    assert(r.getInt(8) === 2020 && r.getInt(9) === 53)
    assert(r.getShort(10) === 200)
    assert(r.getBoolean(11) === false)
    // two values, equal mass: exactly 1 bit
    assert(math.abs(r.getDouble(12) - 1.0) < 1e-12)
  }

  test("replaceOne replaces exactly the first occurrence") {
    assume(ready)
    val r = ChCompat.sql(spark,
      "SELECT replaceOne('aaa','a','b') AS a, " +
        "replaceOne('xyz','q','!') AS b, " +
        "replaceOne('abcabc','bc','-') AS c").head
    assert(r.getString(0) === "baa")   // first only
    assert(r.getString(1) === "xyz")   // absent needle: unchanged
    assert(r.getString(2) === "a-abc")
  }

  test("CH dialect breadth: every probe parses and executes") {
    assume(ready)
    val failures = probes.flatMap { q =>
      try { ChCompat.sql(spark, q).collect(); None }
      catch { case e: Throwable =>
        Some(s"$q\n   -> ${Option(e.getMessage).getOrElse(e.getClass.getName).linesIterator.next()}")
      }
    }
    assert(failures.isEmpty,
      s"\n${failures.size}/${probes.size} probes failed:\n" +
        failures.mkString("\n"))
  }
}
