package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** KLL quantile-state family: exact quantiles in the uncompacted
  * regime, the state/merge/finalize path across partitions and
  * tables, SQL registration, and bounded rank error at scale.
  */
class KllSketchSpec extends SparkTestBase {
  import spark.implicits._

  test("exact regime: sketch quantiles equal percentile_disc, any split") {
    PipelineFunctions.registerAll(spark)
    val df = (1 to 150).map(i => (s"g${i % 3}", i.toDouble))
      .toDF("grp", "v")
    df.createOrReplaceTempView("kll_src")
    val got = spark.sql(
      """SELECT grp, kll_quantiles(kll_sketch_agg(v), array(0.5, 0.9)) AS q
         FROM kll_src GROUP BY grp ORDER BY grp""")
      .as[(String, Seq[Double])].collect().toSeq
    val want = spark.sql(
      """SELECT grp, array(percentile_disc(0.5) WITHIN GROUP (ORDER BY v),
                           percentile_disc(0.9) WITHIN GROUP (ORDER BY v)) AS q
         FROM kll_src GROUP BY grp ORDER BY grp""")
      .as[(String, Seq[Double])].collect().toSeq
    assert(got === want)
  }

  test("state -> merge -> finalize across split tables == direct sketch") {
    PipelineFunctions.registerAll(spark)
    // 180 values < k=200: no compaction, both paths are EXACT
    val df = (1 to 180).map(i => ((i % 7).toLong, i.toDouble))
      .toDF("part", "v")
    df.createOrReplaceTempView("kll_all")
    // per-part states (the materialized sketch table), then merged
    val merged = spark.sql(
      """SELECT kll_quantiles(kll_merge_agg(st), array(0.25, 0.75)) AS q
         FROM (SELECT part, kll_sketch_agg(v) AS st
               FROM kll_all GROUP BY part)""")
      .as[Seq[Double]].head()
    val direct = spark.sql(
      """SELECT kll_quantiles(kll_sketch_agg(v), array(0.25, 0.75))
         FROM kll_all""").as[Seq[Double]].head()
    assert(merged === direct)
    assert(merged === Seq(45.0, 135.0))
    // past the compaction horizon the two paths agree within the
    // sketch's rank error (~1.7% of n at k=200; allow 3%)
    val big = (1 to 4000).map(i => ((i % 7).toLong, i.toDouble))
      .toDF("part", "v")
    big.createOrReplaceTempView("kll_all_big")
    val m2 = spark.sql(
      """SELECT kll_quantiles(kll_merge_agg(st), array(0.5)) AS q
         FROM (SELECT part, kll_sketch_agg(v) AS st
               FROM kll_all_big GROUP BY part)""")
      .as[Seq[Double]].head().head
    assert(math.abs(m2 - 2000.0) <= 120.0, s"p50=$m2")
  }

  test("rank error bounded at 100k values") {
    PipelineFunctions.registerAll(spark)
    val df = (1 to 100000).map(_.toDouble).toDF("v")
    df.createOrReplaceTempView("kll_big")
    val Seq(p50) = spark.sql(
      """SELECT kll_quantiles(kll_sketch_agg(v), array(0.5))
         FROM kll_big""").as[Seq[Double]].head().toList
    // k=200 → ~1.7% rank error (99% confidence); allow 3%
    assert(math.abs(p50 - 50000.0) < 3000.0, s"p50=$p50")
  }
}
