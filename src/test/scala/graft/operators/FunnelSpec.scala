package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** windowFunnel semantics: non-decreasing time between steps (CH
  * default) with strict_increase opt-in, window anchored at the
  * chain's first event, per-user max over chain starts, level-0
  * users, and agreement with an exhaustive reference on a randomized
  * corpus (the greedy-is-exact claim).
  */
class FunnelSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(min * 60000L)

  private def run(rows: Seq[(Long, Timestamp, String)], windowSec: Long,
      strict: Boolean = false) =
    Funnel.windowFunnel(rows.toDF("user_id", "ts", "event_type"),
        "user_id", "ts",
        Seq(col("event_type") === "a", col("event_type") === "b",
          col("event_type") === "c"), windowSec, strictIncrease = strict)
      .as[(Long, Int)].collect().toMap

  test("full chain within window reaches level 3; broken chains stop") {
    val rows = Seq(
      (1L, ts(0), "a"), (1L, ts(10), "b"), (1L, ts(20), "c"), // level 3
      (2L, ts(0), "a"), (2L, ts(10), "b"),                    // level 2
      (3L, ts(0), "a"),                                       // level 1
      (4L, ts(0), "b"), (4L, ts(10), "c"))                    // level 0
    assert(run(rows, 3600) === Map(1L -> 3, 2L -> 2, 3L -> 1, 4L -> 0))
  }

  test("window anchors at the chain start, not the previous step") {
    // a@0, b@50min, c@70min with 1h window: c is 70min after t1 -> out
    val rows = Seq((1L, ts(0), "a"), (1L, ts(50), "b"), (1L, ts(70), "c"))
    assert(run(rows, 3600) === Map(1L -> 2))
    // but a later chain start rescues it: a@30 -> b@50 -> c@70 all
    // within [30, 90]
    val rows2 = rows :+ ((1L, ts(30), "a"))
    assert(run(rows2, 3600) === Map(1L -> 3))
  }

  test("equal-timestamp next step: chains by default (CH), not under " +
      "strict_increase") {
    val rows = Seq((1L, ts(0), "a"), (1L, ts(0), "b"), (1L, ts(5), "c"))
    assert(run(rows, 3600) === Map(1L -> 3))
    assert(run(rows, 3600, strict = true) === Map(1L -> 1))
  }

  test("out-of-order steps do not count") {
    val rows = Seq((1L, ts(0), "b"), (1L, ts(5), "a"), (1L, ts(10), "c"))
    // a@5 then c@10 but no b after a -> level 1
    assert(run(rows, 3600) === Map(1L -> 1))
  }

  test("greedy matches exhaustive search on a randomized corpus") {
    val rnd = new scala.util.Random(42)
    val types = Array("a", "b", "c", "x")
    val rows = (1 to 40).flatMap { u =>
      (0 until 12).map(_ =>
        (u.toLong, ts(rnd.nextInt(200)), types(rnd.nextInt(4))))
    }
    val windowSec = 60L * 60 // 60 minutes
    // exhaustive reference: try every (t1, t2, t3) combination, once
    // per time-comparison mode
    val byUser = rows.groupBy(_._1)
    def want(after: (Long, Long) => Boolean) = byUser.map { case (u, evs) =>
      val a = evs.filter(_._3 == "a").map(_._2.getTime).sorted
      val b = evs.filter(_._3 == "b").map(_._2.getTime).sorted
      val c = evs.filter(_._3 == "c").map(_._2.getTime).sorted
      val w = windowSec * 1000
      val l3 = a.exists(t1 => b.exists(t2 => after(t2, t1) && t2 - t1 <= w &&
        c.exists(t3 => after(t3, t2) && t3 - t1 <= w)))
      val l2 = a.exists(t1 => b.exists(t2 => after(t2, t1) && t2 - t1 <= w))
      u -> (if (l3) 3 else if (l2) 2 else if (a.nonEmpty) 1 else 0)
    }
    assert(run(rows, windowSec) === want(_ >= _))
    assert(run(rows, windowSec, strict = true) === want(_ > _))
  }

  test("sequenceMatch: unbounded-window full-chain existence") {
    val rows = Seq(
      (1L, ts(0), "a"), (1L, ts(100000), "b"), (1L, ts(300000), "c"),
      (2L, ts(0), "a"), (2L, ts(1), "c"), (2L, ts(2), "b"),
      (3L, ts(0), "x")).toDF("user_id", "ts", "event_type")
    val got = Funnel.sequenceMatch(rows, "user_id", "ts",
        Seq(col("event_type") === "a", col("event_type") === "b",
          col("event_type") === "c"))
      .as[(Long, Boolean)].collect().toMap
    // user 1: chain months apart still matches (no window);
    // user 2: c before b -> no; user 3: no step at all
    assert(got === Map(1L -> true, 2L -> false, 3L -> false))
  }

  test("plan: no nested-loop join — each step is a keyed window") {
    val rows = Seq((1L, ts(0), "a"), (1L, ts(1), "b"), (1L, ts(2), "c"))
    val plan = Funnel.windowFunnel(rows.toDF("user_id", "ts", "event_type"),
        "user_id", "ts",
        Seq(col("event_type") === "a", col("event_type") === "b",
          col("event_type") === "c"), 3600)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }
}
