package graft.multimodal

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The multimodal batch-shape plumbing: decode (column-level stub),
  * feature-extract (map), resize (binary→binary map), frame-sample
  * (one-to-many). The stubs are deterministic so results are pinned;
  * a production codec replaces the lambda, not the plumbing.
  */
class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Seq(
    (1L, "abcdef".getBytes("UTF-8")),
    (2L, Array.fill[Byte](3000)(7)),
    (3L, Array.empty[Byte]))
    .toDF("id", "payload")

  test("stubDecodeMeta: deterministic dims + format from the payload") {
    val m = docs.select(col("id"), Multimodal.stubDecodeMeta(col("payload")))
      .select("id", "meta.width", "meta.height", "meta.format")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(m(1L) === ((6L, 6L, "png")))
    assert(m(2L) === ((3000L % 640, 3000L % 480, "png")))
    assert(m(3L) === ((0L, 0L, "png")))
  }

  test("stubFeatures: per-partition batch map produces one feature row per payload") {
    val f = Multimodal.stubFeatures(docs, "id", "payload")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(f === Map(1L -> 6, 2L -> 3000, 3L -> 0))
  }

  test("stubResize: binary->binary map hits the byte budget and restamps meta") {
    val r = Multimodal.stubResize(docs, "id", "payload", w = 8, h = 4)
    val rows = r.select(col("id"), octet_length(col("payload")).as("n"),
      col("meta.width"), col("meta.format")).collect()
      .map(x => x.getLong(0) -> ((x.getInt(1), x.getLong(2), x.getString(3)))).toMap
    assert(rows(1L) === ((32, 8L, "raw")))
    assert(rows(2L) === ((32, 8L, "raw")))
    assert(rows(3L) === ((32, 8L, "raw"))) // empty input → zeroed buffer
    // content is cycled from the source bytes, not garbage
    val p1 = r.filter(col("id") === 1).select("payload").head.getAs[Array[Byte]](0)
    assert(new String(p1, "UTF-8") === ("abcdef" * 6).take(32))
  }

  test("stubFrameSample: one row per sampled frame, never all frames in one row") {
    val frames = Multimodal.stubFrameSample(docs, "id", "payload",
      everyNth = 2, frameBytes = 1000)
    val byId = frames.collect().groupBy(_.getLong(0))
    // id=2: 3000 bytes → frames 0,1,2 → sampled 0 and 2
    assert(byId(2L).map(_.getInt(1)).sorted.toSeq === Seq(0, 2))
    assert(byId(2L).forall(_.getAs[Array[Byte]](2).length == 1000))
    // id=1: one short frame (index 0)
    assert(byId(1L).map(_.getInt(1)).toSeq === Seq(0))
    // id=3: empty payload → no frames
    assert(!byId.contains(3L))
  }
}
