package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Salted join/agg must be RESULT-identical to the plain forms — the
  * rewrite only changes physical key distribution — and must actually
  * spread a hot key across salts.
  */
class SaltingSpec extends SparkTestBase {
  import spark.implicits._

  // 10k rows of hot key 1, a few of keys 2..5 — plus key 6 ONLY on the
  // left (exercises outer semantics) and key 7 only on the right
  private def left = (Seq.fill(10000)(1) ++ (2 to 5) ++ Seq(6))
    .zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "v")
  private def right = (1 to 5).map(k => (k, s"dim$k")) :+ ((7, "dim7")) match {
    case rows => rows.toDF("k", "name")
  }

  test("saltedJoin inner == plain inner join") {
    val plain = left.join(right, Seq("k")).select("k", "v", "name")
    val salted = Salting.saltedJoin(left, right, Seq("k"), salt = 8)
      .select("k", "v", "name")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("saltedJoin left_outer == plain left join (unmatched rows survive once)") {
    val plain = left.join(right, Seq("k"), "left").select("k", "v", "name")
    val salted = Salting.saltedJoin(left, right, Seq("k"), salt = 8, "left")
      .select("k", "v", "name")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    // the left-only key joined nothing but is present exactly once
    assert(salted.filter(col("k") === 6).count() === 1)
  }

  test("saltedJoin spreads the hot key across salts") {
    val salted = left.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(8L)).cast("int"))
    val spread = salted.filter(col("k") === 1)
      .groupBy("__salt").count().collect()
    assert(spread.length === 8, "hot key must occupy every salt bucket")
    // roughly uniform: no bucket holds more than 2x the mean
    assert(spread.map(_.getLong(1)).max < 2 * (10000 / 8))
  }

  test("saltedAgg == plain groupBy agg for sum/count/min/max") {
    val plain = left.groupBy("k").agg(
      sum("v").as("s"), count("v").as("c"), min("v").as("lo"), max("v").as("hi"))
    val salted = Salting.saltedAgg(left, Seq("k"), Map(
      "s" -> (col("v"), "sum"), "c" -> (col("v"), "count"),
      "lo" -> (col("v"), "min"), "hi" -> (col("v"), "max")), salt = 8)
      .select("k", "s", "c", "lo", "hi")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("saltedAgg plan: first shuffle keys on (key, __salt), and no stage " +
      "funnels into a single partition") {
    val agg = Salting.saltedAgg(left, Seq("k"),
      Map("s" -> (col("v"), "sum")), salt = 8)
    val plan = agg.queryExecution.executedPlan.toString
    // the partial aggregate's exchange carries the salt — the hot key
    // is spread over `salt` reducers, not owned by one
    assert(plan.contains("__salt"),
      s"expected a salted exchange in:\n$plan")
    // (plan strings print root-first, so the partial aggregate's
    // exchange is the LAST hashpartitioning line)
    val exchanges = plan.linesIterator
      .filter(_.contains("hashpartitioning")).toSeq
    assert(exchanges.exists(_.contains("__salt")),
      s"a hash exchange must include __salt, got:\n${exchanges.mkString("\n")}")
    // no exchange collapses to a single partition anywhere in the plan
    assert(!plan.contains("SinglePartition"),
      s"salted agg must not plan a single-partition stage:\n$plan")
  }

  test("non-algebraic aggregates are rejected") {
    val e = intercept[IllegalArgumentException] {
      Salting.saltedAgg(left, Seq("k"), Map("a" -> (col("v"), "avg")), 4)
        .collect()
    }
    assert(e.getMessage.contains("non-algebraic"))
  }
}
