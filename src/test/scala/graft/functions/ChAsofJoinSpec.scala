package graft.functions

import graft.SparkTestBase

/** Golden outputs for the dialect's `ASOF JOIN` rewrite: the
  * interval-ized right side must pick exactly ClickHouse's
  * closest-match row in every inequality direction, keep the join an
  * equi-join (no nested-loop fallback), and refuse — not mis-parse —
  * the shapes it can't rewrite.
  */
class ChAsofJoinSpec extends SparkTestBase {

  private def chSql(q: String) = ChCompat.sql(spark, q)

  private def mkViews(): Unit = {
    import spark.implicits._
    // trades: one per key at ts 5, 15, 25; key 9 has no quotes at all
    Seq((1, 15L, "B"), (1, 25L, "S"), (2, 15L, "B"), (9, 15L, "B"))
      .toDF("k", "ts", "side").createOrReplaceTempView("asof_trades")
    // quotes: key 1 at ts 10 and 20; key 2 at ts 15 exactly
    Seq((1, 10L, 1.0), (1, 20L, 2.0), (2, 15L, 3.0))
      .toDF("k", "ts", "px").createOrReplaceTempView("asof_quotes")
  }

  test("ASOF JOIN >= picks the latest quote at-or-before the trade") {
    mkViews()
    val got = chSql(
      """SELECT t.k, t.ts, q.ts AS qts, q.px
        |FROM asof_trades t ASOF JOIN asof_quotes q
        |  ON t.k = q.k AND t.ts >= q.ts
        |ORDER BY t.k, t.ts""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    // trade(1,15)→quote(1,10); trade(1,25)→quote(1,20);
    // trade(2,15)→quote(2,15) (>= includes equality); trade(9,…) dropped
    assert(got === Seq((1, 15L, 10L, 1.0), (1, 25L, 20L, 2.0),
      (2, 15L, 15L, 3.0)))
  }

  test("ASOF LEFT JOIN keeps unmatched left rows with NULL right") {
    mkViews()
    val got = chSql(
      """SELECT t.k, t.ts, q.px
        |FROM asof_trades t ASOF LEFT JOIN asof_quotes q
        |  ON t.k = q.k AND t.ts >= q.ts
        |ORDER BY t.k, t.ts""".stripMargin)
      .collect().map(r => (r.getInt(0),
        if (r.isNullAt(2)) -1.0 else r.getDouble(2))).toSeq
    assert(got === Seq((1, 1.0), (1, 2.0), (2, 3.0), (9, -1.0)))
  }

  test("strict > excludes the exactly-equal timestamp") {
    mkViews()
    val got = chSql(
      """SELECT t.k, q.px FROM asof_trades t ASOF LEFT JOIN asof_quotes q
        |  ON t.k = q.k AND t.ts > q.ts
        |WHERE t.k = 2""".stripMargin)
      .collect().map(r => if (r.isNullAt(1)) -1.0 else r.getDouble(1)).toSeq
    // quote(2,15) is NOT strictly before trade(2,15)
    assert(got === Seq(-1.0))
  }

  test("<= looks FORWARD: earliest quote at-or-after the trade") {
    mkViews()
    val got = chSql(
      """SELECT t.k, t.ts, q.ts AS qts
        |FROM asof_trades t ASOF JOIN asof_quotes q
        |  ON t.k = q.k AND t.ts <= q.ts
        |ORDER BY t.k, t.ts""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    // trade(1,15)→quote(1,20) (the NEXT one); trade(1,25)→none;
    // trade(2,15)→quote(2,15)
    assert(got === Seq((1, 15L, 20L), (2, 15L, 15L)))
  }

  test("flipped operand orientation `q.ts <= t.ts` normalizes to >=") {
    mkViews()
    val got = chSql(
      """SELECT t.k, t.ts, q.ts AS qts
        |FROM asof_trades t ASOF JOIN asof_quotes q
        |  ON q.k = t.k AND q.ts <= t.ts
        |ORDER BY t.k, t.ts""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((1, 15L, 10L), (1, 25L, 20L), (2, 15L, 15L)))
  }

  test("subquery right side with alias") {
    mkViews()
    val got = chSql(
      """SELECT t.k, q.px FROM asof_trades t ASOF JOIN
        |  (SELECT k, ts, px * 10 AS px FROM asof_quotes) q
        |  ON t.k = q.k AND t.ts >= q.ts
        |ORDER BY t.k, t.ts""".stripMargin)
      .collect().map(_.getDouble(1)).toSeq
    assert(got === Seq(10.0, 20.0, 30.0))
  }

  test("rewritten plan is an equi-join — no nested loop, no cartesian") {
    mkViews()
    val plan = chSql(
      """SELECT t.k, t.ts, q.px
        |FROM asof_trades t ASOF JOIN asof_quotes q
        |  ON t.k = q.k AND t.ts >= q.ts""".stripMargin)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("unsupported shapes throw instead of silently mis-parsing") {
    mkViews()
    // USING form
    val e1 = intercept[IllegalArgumentException](ChSqlRewrite(
      "SELECT * FROM asof_trades t ASOF JOIN asof_quotes q USING (k, ts)"))
    assert(e1.getMessage.contains("ASOF JOIN"))
    // no inequality
    val e2 = intercept[IllegalArgumentException](ChSqlRewrite(
      "SELECT * FROM asof_trades t ASOF JOIN asof_quotes q ON t.k = q.k"))
    assert(e2.getMessage.contains("ASOF JOIN"))
    // OR in the ON clause
    val e3 = intercept[IllegalArgumentException](ChSqlRewrite(
      "SELECT * FROM asof_trades t ASOF JOIN asof_quotes q " +
        "ON t.k = q.k OR t.ts >= q.ts"))
    assert(e3.getMessage.contains("ASOF JOIN"))
  }

  test("ANY JOIN ON form: at most one right row per key") {
    import spark.implicits._
    Seq((1, "l1"), (2, "l2"), (3, "l3")).toDF("k", "lv")
      .createOrReplaceTempView("anyon_l")
    Seq((1, "r1a"), (1, "r1b"), (2, "r2")).toDF("k", "rv")
      .createOrReplaceTempView("anyon_r")
    val got = chSql(
      """SELECT l.k, r.rv FROM anyon_l l ANY LEFT JOIN anyon_r r
        |  ON l.k = r.k ORDER BY l.k""".stripMargin)
      .collect().map(r => (r.getInt(0), Option(r.getString(1)))).toSeq
    // exactly ONE row per left key; k=1 keeps SOME right value
    assert(got.map(_._1) === Seq(1, 2, 3))
    assert(got(0)._2.exists(v => v == "r1a" || v == "r1b"))
    assert(got(1)._2 === Some("r2") && got(2)._2 === None)
    // non-equality ON passes through untouched (fails loudly later)
    val s = "SELECT 1 FROM a ANY JOIN b ON a.k > b.k"
    assert(ChSqlRewrite(s) === s)
  }

  test("non-ASOF SQL is untouched (asof as a column name survives)") {
    val s = "SELECT asof, k FROM some_table WHERE asof > 3"
    assert(ChSqlRewrite(s) === s)
  }
}
