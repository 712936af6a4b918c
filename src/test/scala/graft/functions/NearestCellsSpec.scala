package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[NearestCells]] against the HOF spelling it replaced: identical
  * assignments (including ties), float and double inputs, nProbe > 1
  * ordering — the invariants every centroid-blocked oracle replays.
  */
class NearestCellsSpec extends SparkTestBase {

  private def viaHof(vec: org.apache.spark.sql.Column,
      centroids: Array[Array[Double]], n: Int) = {
    val centersLit = array(centroids.map(c =>
      array(c.map(v => lit(v)): _*)): _*)
    val idxSeq = sequence(lit(0), lit(centroids.length - 1))
    val dists = transform(centersLit, c =>
      aggregate(zip_with(c, vec, (a, b) => {
        val d = a - b.cast("double"); d * d
      }), lit(0.0), (acc, x) => acc + x))
    slice(transform(
      array_sort(zip_with(dists, idxSeq,
        (d, i) => struct(d.as("d"), i.as("i")))),
      s => s.getField("i")), 1, n)
  }

  private def viaExpr(vec: org.apache.spark.sql.Column,
      centroids: Array[Array[Double]], n: Int) =
    org.apache.spark.sql.graft.ColumnBridge.column(
      NearestCells(
        org.apache.spark.sql.graft.ColumnBridge.expression(vec),
        centroids, n))

  test("primitive-loop assignment == HOF assignment on random floats") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val centroids = Array.fill(9)(Array.fill(16)(rnd.nextDouble() * 2 - 1))
    val df = (0 until 500)
      .map(i => (i.toLong, Seq.fill(16)(rnd.nextFloat() * 2 - 1)))
      .toDF("id", "embedding")
    val rows = df.select(
      viaExpr(col("embedding"), centroids, 2).as("fast"),
      viaHof(col("embedding"), centroids, 2).as("hof")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Int](0) === r.getSeq[Int](1))
    }
  }

  test("exact-tie goes to the lower cluster id; nProbe order is (d, id)") {
    import spark.implicits._
    // centroids 0 and 1 are identical → any vector ties them exactly;
    // centroid 2 is distinct
    val centroids = Array(
      Array(1.0, 0.0), Array(1.0, 0.0), Array(0.0, 5.0))
    val df = Seq((1L, Seq(0.9f, 0.1f))).toDF("id", "embedding")
    val got = df.select(viaExpr(col("embedding"), centroids, 3)).head
      .getSeq[Int](0)
    assert(got === Seq(0, 1, 2))
  }

  test("double-typed input and dim guard (shorter vector) do not throw") {
    import spark.implicits._
    val centroids = Array(Array(1.0, 1.0, 1.0), Array(-1.0, -1.0, -1.0))
    val df = Seq((1L, Seq(0.5, 0.5))).toDF("id", "embedding")
    val got = df.select(viaExpr(col("embedding"), centroids, 1)).head
      .getSeq[Int](0)
    assert(got === Seq(0))
  }
}
