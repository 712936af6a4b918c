package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Bloom-prefiltered semi join: exactness (identical to the plain semi
  * join — no false negatives, false positives removed), the probe's
  * plan placement (a filter on the big side's scan, before the join
  * exchange), and the no-false-negatives property of the raw probe.
  */
class BloomPruneSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val big = (1L to 5000L).map(i => (i, s"v$i"))
    .toDF("k", "payload")
  private lazy val small = (1L to 5000L by 7).map(i => (i, "x"))
    .toDF("sk", "tag")

  test("semiJoin result equals the plain left-semi join") {
    val got = BloomPrune.semiJoin(big, "k", small, "sk",
        expectedItems = 1000L)
      .orderBy("k").as[(Long, String)].collect().toSeq
    val want = big.join(small.select(col("sk").as("k")).distinct(),
        Seq("k"), "left_semi")
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(got === want)
    assert(got.size === small.count())
  }

  test("probe has no false negatives") {
    val bloom = BloomPrune.buildBloom(small, "sk", expectedItems = 1000L)
    val missed = small.select(col("sk"))
      .filter(!BloomPrune.mightContain(bloom, col("sk")))
      .count()
    assert(missed === 0L)
  }

  test("plan: the bloom probe is a Filter on the big side, below the " +
      "join's shuffle/broadcast") {
    // file-backed big side: a LocalTableScan would let the optimizer
    // constant-fold the probe away (ConvertToLocalRelation), which is
    // not the 100-TB shape under test
    val dir = java.nio.file.Files.createTempDirectory("bloomspec").toString
    big.write.mode("overwrite").parquet(s"$dir/big")
    val bigF = spark.read.parquet(s"$dir/big")
    val df = BloomPrune.semiJoin(bigF, "k", small, "sk",
      expectedItems = 1000L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan)
    // the probe must sit under the join (scan stage), not above it:
    // parents print first in the top-down plan string
    val joinIdx = plan.indexOf("Join")
    val probeIdx = plan.indexOf("might_contain")
    assert(joinIdx >= 0 && probeIdx > joinIdx, plan)
  }
}
