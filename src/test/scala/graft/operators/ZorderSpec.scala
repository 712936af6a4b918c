package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Z-order layout: the Morton key against a scalar reference, clamp
  * behavior, and the data-skipping property — z-ordered files carry
  * bounding boxes tight in BOTH dimensions where a value-sorted
  * layout is tight in one and full-range in the other.
  */
class ZorderSpec extends SparkTestBase {
  import spark.implicits._

  private def mortonRef(a: Long, b: Long, bits: Int): Long =
    (0 until bits).map(i =>
      (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1)))
      .reduce(_ | _)

  test("zkey2 matches the scalar reference on random values") {
    val rnd = new scala.util.Random(3)
    val rows = (1 to 500).map(_ =>
      (rnd.nextInt(1 << 16).toLong, rnd.nextInt(1 << 16).toLong))
    val got = rows.toDF("a", "b")
      .select(col("a"), col("b"), Zorder.zkey2(col("a"), col("b")).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) => assert(z === mortonRef(a, b, 16)) }
  }

  test("clamping: negatives floor to 0, oversized saturate") {
    val got = Seq((-5L, 70000L)).toDF("a", "b")
      .select(Zorder.zkey2(col("a"), col("b"), bits = 16))
      .as[Long].head()
    assert(got === mortonRef(0L, 65535L, 16))
  }

  test("z-ordered files have tight per-file ranges on BOTH dims; " +
      "value-sort is full-range on the second") {
    val rnd = new scala.util.Random(9)
    val df = (1 to 20000).map(_ =>
      (rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
      .toDF("x", "y")
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString

    Zorder.writeZOrdered(df, s"$dir/z", col("x"), col("y"),
      bits = 10, numFiles = 16)
    df.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(s"$dir/v")

    // per-file bounding boxes via input_file_name
    def spans(path: String): Seq[(Long, Long)] =
      spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
        .as[(String, Long, Long)].collect().toSeq.map(r => (r._2, r._3))

    val z = spans(s"$dir/z")
    val v = spans(s"$dir/v")
    val zAvgY = z.map(_._2).sum.toDouble / z.size
    val vAvgY = v.map(_._2).sum.toDouble / v.size
    // value-sort: y spans ~the full 1024 range per file; z-order:
    // materially tighter on y while still bounded on x
    assert(vAvgY > 900.0, s"vAvgY=$vAvgY")
    assert(zAvgY < 700.0, s"zAvgY=$zAvgY")
    val zAvgX = z.map(_._1).sum.toDouble / z.size
    assert(zAvgX < 700.0, s"zAvgX=$zAvgX")
  }
}
