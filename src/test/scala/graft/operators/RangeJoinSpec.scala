package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Bucketed range join equals the naive theta join, including
  * cell-boundary points, overlapping intervals, and empty intervals. */
class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("pointInInterval matches the theta-join ground truth") {
    val rnd = new scala.util.Random(11)
    val pts = Seq.fill(300)(rnd.nextInt(1000).toLong).zipWithIndex
      .map { case (p, i) => (i.toLong, p) }.toDF("pid", "p")
    val ivs = (Seq.fill(40)((rnd.nextInt(1000).toLong, rnd.nextInt(120).toLong))
      .map { case (lo, len) => (lo, lo + len) } ++
      Seq((5L, 5L), (900L, 850L)))                   // empty + inverted
      .zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
      .toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(pts, ivs, "p", "lo", "hi", bucketWidth = 64L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val truth = pts.join(ivs, col("lo") <= col("p") && col("p") < col("hi"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == truth)
    assert(truth.nonEmpty)
  }

  test("half-open boundaries: start included, end excluded, across cell edges") {
    val pts = Seq((1L, 64L), (2L, 128L), (3L, 127L)).toDF("pid", "p")
    val ivs = Seq((1L, 64L, 128L)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(pts, ivs, "p", "lo", "hi", 64L)
      .select("pid").as[Long].collect().toSet
    assert(got == Set(1L, 3L)) // 64 in, 128 (== end) out, 127 in
  }
}
