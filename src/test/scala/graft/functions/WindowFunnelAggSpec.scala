package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** windowFunnel(w)(ts, c1…cN) as a SQL aggregate: pinned golden cases
  * for the step-order/window contract (non-decreasing by default,
  * strictly-later under 'strict_increase' — ClickHouse's modes), and
  * equivalence with the relational [[graft.operators.Funnel]] operator
  * (gate r29) on a seeded random event table — two independent
  * implementations of the same semantics must agree user-for-user.
  */
class WindowFunnelAggSpec extends SparkTestBase {
  import spark.implicits._

  private def chSql(q: String) = {
    ChCompat.registerAll(spark)
    ChCompat.sql(spark, q)
  }

  test("golden cases: depth, step order, window cutoff, equal-ts modes") {
    Seq(
      // u1: full chain within window
      (1, "2024-01-01 00:00:00", "view"),
      (1, "2024-01-01 00:10:00", "click"),
      (1, "2024-01-01 00:20:00", "purchase"),
      // u2: click BEFORE view — chain can't use it (ordered)
      (2, "2024-01-01 00:10:00", "click"),
      (2, "2024-01-01 00:20:00", "view"),
      // u3: purchase outside the window of the view
      (3, "2024-01-01 00:00:00", "view"),
      (3, "2024-01-01 00:10:00", "click"),
      (3, "2024-01-01 02:00:00", "purchase"),
      // u4: same-timestamp click — chains by default (CH
      // non-decreasing), not under 'strict_increase'
      (4, "2024-01-01 00:00:00", "view"),
      (4, "2024-01-01 00:00:00", "click"),
      // u5: no step-1 event at all
      (5, "2024-01-01 00:00:00", "click"))
      .toDF("uid", "s", "et")
      .withColumn("ts", to_timestamp(col("s")))
      .createOrReplaceTempView("wf_events")
    val got = chSql("""
      SELECT uid, windowFunnel(3600)(ts, et = 'view', et = 'click',
        et = 'purchase') AS level
      FROM wf_events GROUP BY uid ORDER BY uid""")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(got === Seq((1, 3), (2, 1), (3, 2), (4, 2), (5, 0)))
    val strict = chSql("""
      SELECT uid, windowFunnel(3600, 'strict_increase')(ts, et = 'view',
        et = 'click', et = 'purchase') AS level
      FROM wf_events GROUP BY uid ORDER BY uid""")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(strict === Seq((1, 3), (2, 1), (3, 2), (4, 1), (5, 0)))
    // unimplemented CH modes refuse rather than silently mis-match
    intercept[Exception](chSql("""
      SELECT uid, windowFunnel(3600, 'strict_order')(ts, et = 'view',
        et = 'click') AS level FROM wf_events GROUP BY uid""").collect())
  }

  test("a LATER chain start can reach deeper than the first start") {
    // start at 00:00 has no click in window; start at 02:00 does
    Seq(
      (1, "2024-01-01 00:00:00", "view"),
      (1, "2024-01-01 02:00:00", "view"),
      (1, "2024-01-01 02:30:00", "click"))
      .toDF("uid", "s", "et")
      .withColumn("ts", to_timestamp(col("s")))
      .createOrReplaceTempView("wf_late")
    val got = chSql("""
      SELECT uid, windowFunnel(3600)(ts, et = 'view', et = 'click') AS level
      FROM wf_late GROUP BY uid""").head.getInt(1)
    assert(got === 2)
  }

  test("agrees with the relational Funnel operator on random events") {
    val rnd = new scala.util.Random(7)
    val types = Seq("view", "click", "purchase", "other")
    val rows = (1 to 2000).map { _ =>
      (rnd.nextInt(60), 1700000000L + rnd.nextInt(200000),
        types(rnd.nextInt(types.length)))
    }
    val df = rows.toDF("uid", "epoch", "et")
      .withColumn("ts", col("epoch").cast("timestamp")).cache()
    df.createOrReplaceTempView("wf_rand")
    val steps = Seq(col("et") === "view", col("et") === "click",
      col("et") === "purchase")
    val fromOp = graft.operators.Funnel
      .windowFunnel(df, "uid", "ts", steps, windowSec = 50000L)
      .collect().map(r => (r.getInt(0), r.getInt(1))).toMap
    val fromAgg = chSql("""
      SELECT uid, windowFunnel(50000)(ts, et = 'view', et = 'click',
        et = 'purchase') AS level
      FROM wf_rand GROUP BY uid""")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toMap
    assert(fromAgg === fromOp)
  }

  test("sequenceMatch: ordered chain, .* separators, ref reordering") {
    Seq(
      (1, 100L, "a"), (1, 200L, "b"), (1, 300L, "c"),
      (2, 100L, "b"), (2, 200L, "a"), // wrong order for (?1)(?2)
      (3, 100L, "a"))
      .toDF("uid", "epoch", "et")
      .withColumn("ts", col("epoch").cast("timestamp"))
      .createOrReplaceTempView("sm_events")
    val got = chSql("""
      SELECT uid,
        sequenceMatch('(?1)(?2)')(ts, et = 'a', et = 'b') AS ab,
        sequenceMatch('(?1).*(?2)')(ts, et = 'a', et = 'c') AS ac,
        sequenceMatch('(?2)(?1)')(ts, et = 'a', et = 'b') AS ba
      FROM sm_events GROUP BY uid ORDER BY uid""")
      .collect().map(r => (r.getInt(0), r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3))).toSeq
    assert(got === Seq((1, true, true, false), (2, false, false, true),
      (3, false, false, false)))
    // time-constrained and free-text patterns refuse
    intercept[Exception](chSql(
      "SELECT sequenceMatch('(?1)(?t<=10)(?2)')(ts, et='a', et='b') " +
        "FROM sm_events").collect())
    intercept[Exception](chSql(
      "SELECT sequenceMatch('xyz')(ts, et='a') FROM sm_events").collect())
  }

  test("sequenceCount: disjoint ordered chains") {
    Seq(
      (1, 100L, "a"), (1, 200L, "b"), (1, 300L, "a"), (1, 400L, "b"),
      (2, 100L, "a"), (2, 200L, "a"), (2, 300L, "b"),
      (3, 100L, "b"))
      .toDF("uid", "epoch", "et")
      .withColumn("ts", col("epoch").cast("timestamp"))
      .createOrReplaceTempView("sc_events")
    val got = chSql("""
      SELECT uid, sequenceCount('(?1)(?2)')(ts, et = 'a', et = 'b') AS n
      FROM sc_events GROUP BY uid ORDER BY uid""")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    // u1: two disjoint a→b chains; u2: one (second a can't reuse b);
    // u3: none
    assert(got === Seq((1, 2), (2, 1), (3, 0)))
  }

  test("-State/-Merge SQL spellings: two-phase equals one-phase") {
    val df = (1 to 500).map(i => (i % 7, i % 50, i.toDouble))
      .toDF("g", "u", "v")
    df.createOrReplaceTempView("st_events")
    // phase 1: per-(g, u%5) partials; phase 2: merge up to g
    val merged = chSql("""
      SELECT g, uniqMerge(us) AS uniq, sumMerge(sv) AS sv,
             countMerge(cn) AS cnt
      FROM (SELECT g, u % 5 AS shard, uniqState(u) AS us,
              sumState(v) AS sv, countState() AS cn
            FROM st_events GROUP BY g, u % 5)
      GROUP BY g ORDER BY g""")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).toSeq
    val flat = chSql("""
      SELECT g, count(DISTINCT u) AS uniq, sum(v) AS sv, count(*) AS cnt
      FROM st_events GROUP BY g ORDER BY g""")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).toSeq
    assert(merged === flat) // 50 distinct << HLL exact regime
    // sumCount: fused pair
    val sc = chSql(
      "SELECT sumCount(v) AS p FROM st_events").head.getStruct(0)
    assert(sc.getDouble(0) === (1 to 500).map(_.toDouble).sum)
    assert(sc.getLong(1) === 500L)
  }

  test("retention: unordered cohort flags") {
    Seq(
      (1, "2024-01-01", "signup"), (1, "2024-01-08", "active"),
      (2, "2024-01-01", "signup"),
      (3, "2024-01-08", "active"))
      .toDF("uid", "d", "et").createOrReplaceTempView("ret_events")
    val got = chSql("""
      SELECT uid, retention(et = 'signup', et = 'active') AS r
      FROM ret_events GROUP BY uid ORDER BY uid""")
      .collect().map(r => (r.getInt(0), r.getSeq[Int](1))).toSeq
    assert(got === Seq((1, Seq(1, 1)), (2, Seq(1, 0)), (3, Seq(0, 0))))
  }
}
