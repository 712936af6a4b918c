package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Deterministic split/sample semantics and token-budget packing. */
class SamplingPackingSpec extends SparkTestBase {
  import spark.implicits._

  private val ids = (0L until 2000L).toDF("id")

  test("splitLabel: exhaustive, deterministic, ratios near weights") {
    val labeled = ids.withColumn("split",
      Sampling.splitLabel(col("id"), Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)))
    val counts = labeled.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(counts.values.sum == 2000)               // every row labeled
    assert(counts("train") > 1500 && counts("train") < 1700)
    assert(counts("val") > 120 && counts("val") < 280)
    // same ids → same labels on re-evaluation (no rand())
    val again = ids.withColumn("split",
      Sampling.splitLabel(col("id"), Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)))
    assert(labeled.except(again).count() == 0 && again.except(labeled).count() == 0)
  }

  test("splitLabel: unnormalized weights behave like normalized ones") {
    val a = ids.withColumn("s", Sampling.splitLabel(col("id"), Seq("x" -> 8.0, "y" -> 2.0)))
    val b = ids.withColumn("s", Sampling.splitLabel(col("id"), Seq("x" -> 0.8, "y" -> 0.2)))
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
  }

  test("sampleBy: fraction 1.0 keeps all, 0.25 keeps roughly a quarter, subset property") {
    assert(Sampling.sampleBy(ids, col("id"), 1.0).count() == 2000)
    val quarter = Sampling.sampleBy(ids, col("id"), 0.25)
    val n = quarter.count()
    assert(n > 400 && n < 600, s"got $n")
    // a smaller fraction selects a SUBSET of a larger one (nested thresholds)
    val tenth = Sampling.sampleBy(ids, col("id"), 0.1)
    assert(tenth.except(quarter).count() == 0)
  }

  test("stratifiedSample: per-stratum rates, 1.0 stratum keeps everything") {
    val df = ids.withColumn("src",
      concat(lit("src"), (col("id") % 4).cast("string")))
    val kept = Sampling.stratifiedSample(df, col("src"), col("id"),
      Map("src0" -> 1.0, "src1" -> 0.5), defaultFraction = 0.0)
    val by = kept.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(by("src0") == 500)                       // full stratum survives
    assert(by.getOrElse("src2", 0L) == 0 && by.getOrElse("src3", 0L) == 0)
    assert(by("src1") > 180 && by("src1") < 320)
  }

  test("packByTokenBudget: greedy fill, overflow doc starts next shard, oversized doc isolated") {
    val df = Seq(
      // lang a, budget 10: 4+5 fill shard 0 (cum 9), 3 overflows → its
      // first token (cum_before=9) is still in shard 0's budget window
      ("a", 1L, 4L), ("a", 2L, 5L), ("a", 3L, 3L),
      // cum_before for doc 4 = 12 → shard 1
      ("a", 4L, 6L),
      // lang b: a 25-token doc (over budget) + follower
      ("b", 1L, 25L), ("b", 2L, 2L))
      .toDF("lang", "doc_id", "n_tokens")
    val got = Packing.packByTokenBudget(df, "lang", "doc_id", "n_tokens", 10L)
      .select("lang", "doc_id", "shard_id").as[(String, Long, Long)]
      .collect().toSet
    assert(got == Set(
      ("a", 1L, 0L), ("a", 2L, 0L), ("a", 3L, 0L), ("a", 4L, 1L),
      ("b", 1L, 0L), ("b", 2L, 2L)))  // 25-token doc consumes shards 0-2's budget
  }

  test("packByTokenBudget: shards are contiguous runs and budgets hold pre-overflow") {
    val df = (1L to 200L).map(i => ("x", i, 1L + i % 7)).toDF("lang", "doc_id", "n_tokens")
    val rows = Packing.packByTokenBudget(df, "lang", "doc_id", "n_tokens", 50L)
      .orderBy("doc_id")
      .select("shard_id", "cum_tokens", "n_tokens").as[(Long, Long, Long)].collect()
    // shard ids are non-decreasing in pack order
    assert(rows.map(_._1).sliding(2).forall(p => p(0) <= p(1)))
    // every doc STARTS within its shard's budget window
    rows.foreach { case (shard, cum, n) =>
      val before = cum - n
      assert(before / 50L == shard)
    }
  }
}
