package graft.functions

import graft.SparkTestBase

/** Golden outputs for the round-7 dialect tail: `[LEFT] ARRAY JOIN`
  * (ClickHouse's unnest clause — LOCKSTEP across multiple items, not a
  * cross product), the `numbers()` table function, `GLOBAL`/`ALL` join
  * prefixes, the generic `-If` aggregate combinator, and the
  * moment-statistics aggregate family.
  */
class ChArrayJoinSpec extends SparkTestBase {

  private def chSql(q: String) = ChCompat.sql(spark, q)

  private def mkView(): Unit = {
    import spark.implicits._
    Seq(
      (1, Seq(10, 20), Seq("a", "b")),
      (2, Seq.empty[Int], Seq.empty[String]),
      (3, Seq(30), Seq("c")))
      .toDF("id", "arr", "tags").createOrReplaceTempView("chaj_t")
  }

  test("ARRAY JOIN: single bare column explodes and SHADOWS the source") {
    ChCompat.registerAll(spark)
    mkView()
    val got = chSql(
      "SELECT id, arr FROM chaj_t ARRAY JOIN arr ORDER BY id, arr")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    // row 2 (empty array) is dropped; `arr` now means the ELEMENT
    assert(got === Seq((1, 10), (1, 20), (3, 30)))
  }

  test("LEFT ARRAY JOIN keeps empty-array rows with NULL") {
    ChCompat.registerAll(spark)
    mkView()
    val got = chSql(
      "SELECT id, arr FROM chaj_t LEFT ARRAY JOIN arr ORDER BY id, arr")
      .collect()
      .map(r => (r.getInt(0), if (r.isNullAt(1)) -1 else r.getInt(1))).toSeq
    assert(got === Seq((1, 10), (1, 20), (2, -1), (3, 30)))
  }

  test("ARRAY JOIN: `expr AS alias` keeps the source column") {
    ChCompat.registerAll(spark)
    mkView()
    val got = chSql(
      """SELECT id, size(arr) AS n, e
         FROM chaj_t ARRAY JOIN arr AS e WHERE e > 10 ORDER BY id, e""")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSeq
    // aliased item: `arr` (the full array) stays visible for size()
    assert(got === Seq((1, 2, 20), (3, 1, 30)))
  }

  test("ARRAY JOIN: multiple items advance in LOCKSTEP, not cross product") {
    ChCompat.registerAll(spark)
    mkView()
    val got = chSql(
      """SELECT id, arr, tags FROM chaj_t ARRAY JOIN arr, tags
         ORDER BY id, arr""")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSeq
    // parallel arrays pair positionally — 2 rows for id=1, never 4
    assert(got === Seq((1, 10, "a"), (1, 20, "b"), (3, 30, "c")))
  }

  test("ARRAY JOIN: multi-item with expression items (aliased)") {
    ChCompat.registerAll(spark)
    mkView()
    val got = chSql(
      """SELECT id, e, i FROM chaj_t
         ARRAY JOIN arr AS e, arrayEnumerate(arr) AS i ORDER BY id, i""")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSeq
    // the canonical CH idiom: value zipped with its 1-based index
    assert(got === Seq((1, 10, 1), (1, 20, 2), (3, 30, 1)))
  }

  test("ARRAY JOIN text inside a string literal is untouched") {
    assert(ChSqlRewrite("SELECT 'x ARRAY JOIN y' AS s FROM t") ===
      "SELECT 'x ARRAY JOIN y' AS s FROM t")
    // an un-aliased expression item is a loud error, not a mis-parse
    val err = intercept[IllegalArgumentException] {
      ChSqlRewrite("SELECT 1 FROM t ARRAY JOIN arrayMap(x -> x, a)")
    }
    assert(err.getMessage.contains("alias"))
  }

  test("numbers(n) and numbers(offset, n) map to range with column `number`") {
    ChCompat.registerAll(spark)
    val a = chSql("SELECT number FROM numbers(5) ORDER BY number")
      .collect().map(_.getLong(0)).toSeq
    assert(a === Seq(0L, 1L, 2L, 3L, 4L))
    val b = chSql("SELECT number FROM numbers(2, 3) ORDER BY number")
      .collect().map(_.getLong(0)).toSeq
    assert(b === Seq(2L, 3L, 4L))
    // user alias is preserved; implicit alias is `numbers`
    val c = chSql(
      "SELECT n.number FROM numbers(3) AS n WHERE n.number > 0 ORDER BY 1")
      .collect().map(_.getLong(0)).toSeq
    assert(c === Seq(1L, 2L))
    val d = chSql(
      "SELECT numbers.number FROM numbers(2) ORDER BY 1")
      .collect().map(_.getLong(0)).toSeq
    assert(d === Seq(0L, 1L))
    // scalar position (not after FROM/JOIN): untouched
    assert(ChSqlRewrite("SELECT numbers(3) FROM t") ===
      "SELECT numbers(3) FROM t")
  }

  test("GLOBAL and ALL join prefixes are dropped; UNION ALL survives") {
    assert(ChSqlRewrite(
      "SELECT * FROM a GLOBAL ANY LEFT JOIN b USING (k)") ===
      ChSqlRewrite("SELECT * FROM a ANY LEFT JOIN b USING (k)"))
    assert(ChSqlRewrite("SELECT * FROM a ALL INNER JOIN b ON a.k = b.k") ===
      "SELECT * FROM a INNER JOIN b ON a.k = b.k")
    assert(ChSqlRewrite("SELECT * FROM a WHERE k GLOBAL IN (SELECT k FROM b)")
      === "SELECT * FROM a WHERE k IN (SELECT k FROM b)")
    assert(ChSqlRewrite(
      "SELECT * FROM a WHERE k GLOBAL NOT IN (SELECT k FROM b)") ===
      "SELECT * FROM a WHERE k NOT IN (SELECT k FROM b)")
    // UNION ALL is set-operator syntax, never a join prefix
    assert(ChSqlRewrite("SELECT 1 UNION ALL SELECT 2") ===
      "SELECT 1 UNION ALL SELECT 2")
    // string literal safety
    assert(ChSqlRewrite("SELECT 'GLOBAL JOIN' AS s FROM t") ===
      "SELECT 'GLOBAL JOIN' AS s FROM t")
  }

  test("generic -If combinators rewrite to FILTER (WHERE …)") {
    ChCompat.registerAll(spark)
    val r = chSql(
      """SELECT argMaxIf(name, v, v < 40) AS am,
                anyIf(name, v = 20) AS a,
                groupUniqArrayIf(name, v >= 20) AS gu,
                stddevPopIf(v, v <= 20) AS sp
         FROM VALUES ('a', 10), ('b', 20), ('c', 30), ('d', 40)
           AS t(name, v)""").head
    assert(r.getString(0) === "c")
    assert(r.getString(1) === "b")
    assert(r.getSeq[String](2).sorted === Seq("b", "c", "d"))
    assert(r.getDouble(3) === 5.0d) // stddev_pop of {10, 20}
    // the hand-tuned family keeps its registered builders (no FILTER)
    assert(ChSqlRewrite("SELECT sumIf(v, v > 1) FROM t") ===
      "SELECT sumIf(v, v > 1) FROM t")
    // string-literal safety for the combinator scan
    assert(ChSqlRewrite("SELECT 'argMaxIf(a, b, c)' AS s FROM t") ===
      "SELECT 'argMaxIf(a, b, c)' AS s FROM t")
  }

  test("moment-statistics aggregates match CH formulas (incl. kurtPop +3)") {
    ChCompat.registerAll(spark)
    val r = chSql(
      """SELECT stddevPop(x) AS sp, stddevSamp(x) AS ss,
                varPop(x) AS vp, varSamp(x) AS vs,
                covarPop(x, y) AS cp, covarSamp(x, y) AS cs,
                corr(x, y) AS c, skewPop(x) AS sk, kurtPop(x) AS ku
         FROM VALUES (1.0, 2.0), (2.0, 4.0), (3.0, 6.0), (4.0, 8.0)
           AS t(x, y)""").head
    val eps = 1e-9
    assert(math.abs(r.getDouble(0) - math.sqrt(1.25)) < eps)
    assert(math.abs(r.getDouble(1) - math.sqrt(5.0 / 3.0)) < eps)
    assert(math.abs(r.getDouble(2) - 1.25) < eps)
    assert(math.abs(r.getDouble(3) - 5.0 / 3.0) < eps)
    assert(math.abs(r.getDouble(4) - 2.5) < eps)
    assert(math.abs(r.getDouble(5) - 10.0 / 3.0) < eps)
    assert(math.abs(r.getDouble(6) - 1.0) < eps)
    assert(math.abs(r.getDouble(7) - 0.0) < eps)
    // uniform 4-point distribution: excess kurtosis = -1.36, CH's
    // non-excess kurtPop = m4/m2^2 = 1.64
    assert(math.abs(r.getDouble(8) - 1.64) < eps)
  }
}
