package graft

/** Plan contracts over EVERY gate query: the scale properties the
  * round-3 audit verified by hand, pinned as a regression gate. A new
  * or edited query that plans a nested-loop or cartesian join fails
  * here before it ever reaches the bench.
  */
class PlanContractSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  // s01 is the deliberate broadcast cross join (10 broadcast queries ×
  // one corpus scan) — the correct plan for brute-force ANN.
  private val allowedCross = Set("s01_ann_topk")

  test("no gate query plans BroadcastNestedLoopJoin or CartesianProduct") {
    SparkEntry.queries.foreach { case (name, fn) =>
      if (!allowedCross(name)) {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name plans a nested-loop join")
        assert(!plan.contains("CartesianProduct"),
          s"$name plans a cartesian product")
      }
    }
  }

  test("gate queries stay on DataFrame/SQL plans — no RDD scans") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      assert(!plan.contains("Scan ExistingRDD[obj"),
        s"$name drops out of the optimized columnar path")
    }
  }
}
