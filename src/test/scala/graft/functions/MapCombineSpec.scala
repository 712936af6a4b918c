package graft.functions

import graft.SparkTestBase

/** sumMap/minMap/maxMap: per-key aggregation over parallel arrays —
  * CH's Nested-counter idiom, as a bounded-state UDAF.
  */
class MapCombineSpec extends SparkTestBase {

  test("sumMap combines per key across rows; keys sorted") {
    ChCompat.registerAll(spark)
    val r = spark.sql(
      """SELECT sumMap(ks, vs) AS sm
         FROM VALUES (array('b', 'a'), array(1, 2)),
                     (array('a', 'c'), array(10, 5)),
                     (array(), array()) AS t(ks, vs)""").head
    val sm = r.getStruct(0)
    assert(sm.getSeq[String](0) === Seq("a", "b", "c"))
    assert(sm.getSeq[Double](1) === Seq(12.0, 1.0, 5.0))
  }

  test("minMap / maxMap; integer keys sort numerically") {
    ChCompat.registerAll(spark)
    val r = spark.sql(
      """SELECT minMap(ks, vs) AS mn, maxMap(ks, vs) AS mx
         FROM VALUES (array(10, 2), array(5.0, 3.0)),
                     (array(2, 10), array(7.0, 1.0)) AS t(ks, vs)""").head
    val mn = r.getStruct(0); val mx = r.getStruct(1)
    assert(mn.getSeq[Int](0) === Seq(2, 10))
    assert(mn.getSeq[Double](1) === Seq(3.0, 1.0))
    assert(mx.getSeq[Int](0) === Seq(2, 10))
    assert(mx.getSeq[Double](1) === Seq(7.0, 5.0))
  }

  test("sumMap in a grouped aggregation (partial merge path)") {
    ChCompat.registerAll(spark)
    import spark.implicits._
    // enough rows that partial aggregation + shuffle merge really runs
    val df = (1 to 1000).map { i =>
      (i % 4, Seq(s"m${i % 3}", s"m${i % 5}"), Seq(1.0, 2.0))
    }.toDF("g", "ks", "vs")
    df.createOrReplaceTempView("mc_t")
    val rows = spark.sql(
      """SELECT g, sumMap(ks, vs) AS sm FROM mc_t GROUP BY g ORDER BY g""")
      .collect()
    assert(rows.length === 4)
    // cross-check group 0 against a plain exploded aggregation
    val expected = spark.sql(
      """SELECT k, sum(v) FROM (
           SELECT posexplode(ks) AS (p, k), vs[p] AS v FROM mc_t WHERE g = 0
         ) GROUP BY k ORDER BY k""")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val sm = rows.head.getStruct(1)
    val got = sm.getSeq[String](0).zip(sm.getSeq[Double](1))
    assert(got === expected)
  }

  test("null and length-mismatch safety") {
    ChCompat.registerAll(spark)
    val r = spark.sql(
      """SELECT sumMap(ks, vs) AS sm
         FROM VALUES (array('a', NULL, 'b'), array(1, 2, 3)),
                     (CAST(NULL AS ARRAY<STRING>), array(9)),
                     (array('a', 'z'), array(4)) AS t(ks, vs)""").head
    val sm = r.getStruct(0)
    // null key and null row skipped; 'z' has no paired value (trunc)
    assert(sm.getSeq[String](0) === Seq("a", "b"))
    assert(sm.getSeq[Double](1) === Seq(5.0, 3.0))
  }
}
