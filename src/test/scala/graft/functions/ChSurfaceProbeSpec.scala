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
