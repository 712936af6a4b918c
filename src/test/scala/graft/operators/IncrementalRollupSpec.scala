package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Incremental pre-aggregate contract: merging per-batch partial
  * states then finalizing equals aggregating the union once — for any
  * split, any merge order, and repeated (associative) merges.
  */
class IncrementalRollupSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val data = {
    val rnd = new scala.util.Random(11)
    (1 to 3000).map { i =>
      (s"g${i % 5}", rnd.nextDouble() * 100, (rnd.nextInt(400)).toLong)
    }.toDF("grp", "v", "uid")
  }

  private def fin(df: org.apache.spark.sql.DataFrame) =
    IncrementalRollup.finalizeAggs(df)
      .select(col("grp"), col("n"), round(col("sum_v"), 6).as("sum_v"),
        round(col("min_v"), 6).as("min_v"), round(col("max_v"), 6).as("max_v"),
        round(col("avg_v"), 6).as("avg_v"), col("uniq"))
      .orderBy("grp")
      .as[(String, Long, Double, Double, Double, Double, Long)]
      .collect().toSeq

  test("merge of split partials == aggregate-once, for 3 different splits") {
    val whole = fin(IncrementalRollup.partials(
      data, Seq("grp"), "v", "uid"))
    for (mod <- Seq(2, 3, 7)) {
      val parts = (0 until mod).map(r =>
        IncrementalRollup.partials(
          data.filter(pmod(col("uid"), lit(mod)) === r),
          Seq("grp"), "v", "uid"))
      assert(fin(IncrementalRollup.merge(parts: _*)) === whole,
        s"split mod $mod")
    }
  }

  test("merge is associative: merge(merge(a,b),c) == merge(a,b,c)") {
    val Seq(a, b, c) = (0 until 3).map(r =>
      IncrementalRollup.partials(
        data.filter(pmod(col("uid"), lit(3)) === r), Seq("grp"), "v", "uid"))
    val nested = fin(IncrementalRollup.merge(
      IncrementalRollup.merge(a, b), c))
    val flat = fin(IncrementalRollup.merge(a, b, c))
    assert(nested === flat)
  }

  test("uniq is exact in the coupon regime") {
    val got = fin(IncrementalRollup.partials(data, Seq("grp"), "v", "uid"))
    val exact = data.groupBy("grp").agg(countDistinct("uid").as("u"))
      .orderBy("grp").as[(String, Long)].collect().toSeq
    assert(got.map(r => (r._1, r._7)) === exact)
  }
}
