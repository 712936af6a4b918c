package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Mergeable HLL distinct-count sketches: exactness in the coupon
  * regime (what the r26 oracle relies on), the merge property (union
  * of disjoint partial sketches == one global sketch), the error bound
  * in the dense approximate regime, and the partial-aggregation plan
  * shape.
  */
class SketchesSpec extends SparkTestBase {
  import spark.implicits._

  test("coupon regime: estimate equals exact distinct per group") {
    val df = (0 until 5000)
      .map(i => (s"g${i % 4}", (i % 300).toLong))
      .toDF("grp", "v")
    val cube = Sketches.sketchCube(df, Seq("grp"), "v")
    val est = Sketches.rollupEstimate(cube, Seq("grp"), "v_sketch")
      .orderBy("grp").as[(String, Long)].collect().toSeq
    val exact = df.groupBy("grp").agg(countDistinct("v").as("d"))
      .orderBy("grp").as[(String, Long)].collect().toSeq
    assert(est === exact)
  }

  test("merge property: union of disjoint monthly sketches estimates " +
      "the same as one global sketch") {
    val df = (0 until 60000)
      .map(i => (s"m${i % 12}", (i * 2654435761L) % 17000))
      .toDF("month", "v")
    val fine = Sketches.sketchCube(df, Seq("month"), "v")
    val merged = fine
      .agg(hll_sketch_estimate(hll_union_agg(col("v_sketch"))))
      .head().getLong(0)
    val global = df
      .agg(hll_sketch_estimate(hll_sketch_agg(col("v"), lit(12))))
      .head().getLong(0)
    // sketch state is insertion-order insensitive; a union of partials
    // lands in the same state family as the global sketch — estimates
    // agree to well under the sketch's own error
    assert(math.abs(merged - global).toDouble / global < 0.01,
      s"merged=$merged global=$global")
  }

  test("dense regime: relative error within 5% at 50k distinct, lgK=12") {
    val n = 50000
    val df = (0 until n).map(i => i * 2654435761L).toDF("v")
    val est = df.agg(hll_sketch_estimate(hll_sketch_agg(col("v"), lit(12))))
      .head().getLong(0)
    assert(math.abs(est - n).toDouble / n < 0.05, s"est=$est exact=$n")
  }

  test("plan: sketch build is a partial aggregate (map-side combine), " +
      "rollup reads sketches not raw ids") {
    val df = (0 until 1000).map(i => (s"g${i % 3}", i.toLong)).toDF("grp", "v")
    val cube = Sketches.sketchCube(df, Seq("grp"), "v")
    val plan = Sketches.rollupEstimate(cube, Seq("grp"), "v_sketch")
      .queryExecution.executedPlan.toString
    // two-level aggregation: partial + final for BOTH the sketch build
    // and the union rollup — the shuffle carries sketch binaries
    assert("HashAggregate".r.findAllIn(plan).size >= 4, plan)
    assert(plan.contains("hll_sketch_agg") && plan.contains("hll_union_agg"))
  }
}
