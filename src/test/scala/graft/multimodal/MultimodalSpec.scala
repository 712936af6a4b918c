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

  test("decodeImageMeta: REAL PNG/JPEG header decode via javax.imageio " +
      "in mapPartitions; non-image bytes fall back to nulls") {
    // generate genuine images in-memory — no fixtures, no new deps
    def img(w: Int, h: Int, fmt: String): Array[Byte] = {
      val bi = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      bi.setRGB(0, 0, 0xFF8040)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(bi, fmt, bos))
      bos.toByteArray
    }
    val rows = Seq(
      (1L, img(17, 9, "png")),
      (2L, img(32, 24, "jpg")),
      (3L, "definitely not an image".getBytes("UTF-8")),
      (4L, Array.empty[Byte]))
      .toDF("id", "payload")
      .repartition(2) // decode must work per-partition, not driver-side
    val got = Multimodal.decodeImageMeta(rows, "id", "payload")
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) -1 else r.getInt(1),
          if (r.isNullAt(2)) -1 else r.getInt(2),
          if (r.isNullAt(3)) "null" else r.getString(3))))
      .toMap
    assert(got(1L) === ((17, 9, "png")))
    assert(got(2L)._1 === 32 && got(2L)._2 === 24)
    assert(got(2L)._3 === "jpeg") // ImageIO reports "JPEG" for .jpg writers
    assert(got(3L) === ((-1, -1, "null")))
    assert(got(4L) === ((-1, -1, "null")))
  }

  test("decodeAudioMeta: REAL WAV header round-trip via javax.sound; " +
      "non-audio bytes fall back to nulls") {
    val rows = Seq(
      (1L, Multimodal.synthWav(frames = 4000, sampleRate = 8000f,
        channels = 1)),
      (2L, Multimodal.synthWav(frames = 441, sampleRate = 44100f,
        channels = 2)),
      (3L, "not audio at all".getBytes("UTF-8")),
      (4L, Array.empty[Byte]))
      .toDF("id", "payload")
      .repartition(2)
    val got = Multimodal.decodeAudioMeta(rows, "id", "payload")
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) -1f else r.getFloat(1),
          if (r.isNullAt(2)) -1 else r.getInt(2),
          if (r.isNullAt(3)) -1L else r.getLong(3),
          if (r.isNullAt(4)) "null" else r.getString(4))))
      .toMap
    assert(got(1L) === ((8000f, 1, 4000L, "wave")))
    assert(got(2L) === ((44100f, 2, 441L, "wave")))
    assert(got(3L) === ((-1f, -1, -1L, "null")))
    assert(got(4L) === ((-1f, -1, -1L, "null")))
  }

  test("decodeMp4Meta: ISO-BMFF box walk reads mvhd + trak count; " +
      "non-MP4 bytes fall back to nulls") {
    val rows = Seq(
      (1L, Multimodal.synthMp4(durationMs = 2000, timescale = 600,
        nTracks = 2)),
      (2L, Multimodal.synthMp4(durationMs = 90500, timescale = 1000,
        nTracks = 1)),
      (3L, "RIFFnope".getBytes("UTF-8")),
      (4L, Array.empty[Byte]))
      .toDF("id", "payload")
      .repartition(2)
    val got = Multimodal.decodeMp4Meta(rows, "id", "payload")
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) -1L else r.getLong(1),
          if (r.isNullAt(2)) -1 else r.getInt(2),
          if (r.isNullAt(3)) "null" else r.getString(3))))
      .toMap
    assert(got(1L) === ((2000L, 2, "isom")))
    assert(got(2L) === ((90500L, 1, "isom")))
    assert(got(3L) === ((-1L, -1, "null")))
    assert(got(4L) === ((-1L, -1, "null")))
    // truncated container: None, never a crash (the ftyp/moov headers
    // survive but mvhd is cut mid-duration-field)
    val whole = Multimodal.synthMp4(2000, 1000, 1)
    (16 to whole.length by 7).foreach { cut =>
      Multimodal.decodeMp4Header(whole.take(cut)) // must not throw
    }
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

  test("imagePixelSums: checkerboard PNG round-trip hits the closed form") {
    // w=6,h=4, colors (10,20,30)/(40,50,60): 12 pixels of each →
    // sum_r = 12*(10+40), etc.
    val png = Multimodal.synthCheckerPng(6, 4, (10 << 16) | (20 << 8) | 30,
      (40 << 16) | (50 << 8) | 60)
    assert(Multimodal.imagePixelSums(png) ===
      Some((6, 4, 12L * 50, 12L * 70, 12L * 90)))
    // garbage bytes → None, empty → None
    assert(Multimodal.imagePixelSums("not an image".getBytes) === None)
    assert(Multimodal.imagePixelSums(Array.emptyByteArray) === None)
  }

  test("decodeImagePixelStats: luma fixed-point and null row for bad bytes") {
    import spark.implicits._
    val png = Multimodal.synthCheckerPng(4, 2, 0xFFFFFF, 0x000000)
    val df = Seq((1L, png), (2L, "junk".getBytes)).toDF("id", "payload")
    val rows = Multimodal.decodeImagePixelStats(df, "id", "payload")
      .collect().map(r => r.getLong(0) -> r).toMap
    // 4 white + 4 black pixels: each channel sums 4*255
    assert(rows(1L).getLong(3) === 4L * 255)
    assert(rows(1L).getLong(6) === (299L + 587L + 114L) * 4 * 255)
    assert(rows(2L).isNullAt(1) && rows(2L).isNullAt(6))
  }

  test("y4mFrames: C420 round-trip, sampling, and torn-payload honesty") {
    val y4m = Multimodal.synthY4m(w = 8, h = 6, nFrames = 4, seed = 100)
    val frames = Multimodal.y4mFrames(y4m)
    assert(frames.map(_._3) ===
      List.tabulate(4)(k => 8L * 6 * ((100 + 17 * k) % 256)))
    assert(frames.forall(f => f._1 == 8 && f._2 == 6))
    // a torn last frame parses only the complete prefix
    assert(Multimodal.y4mFrames(y4m.dropRight(5)).length === 3)
    assert(Multimodal.y4mFrames("RIFF1234".getBytes) === Nil)
    // decodeY4mFrames everyNth=2 keeps frames 0 and 2
    import spark.implicits._
    val df = Seq((7L, y4m)).toDF("id", "payload")
    val sampled = Multimodal.decodeY4mFrames(df, "id", "payload", everyNth = 2)
      .collect().map(_.getInt(1)).sorted.toSeq
    assert(sampled === Seq(0, 2))
  }

  test("rasterHash: invariant under re-encode, sensitive to pixels/dims") {
    val png = Multimodal.synthCheckerPng(16, 8, 0xAA3311, 0x115599)
    // re-encode through a decode→write round trip: different PNG
    // bytes (encoder choices differ), SAME canonical raster
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(png))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(
      { val c = new java.awt.image.BufferedImage(16, 8,
          java.awt.image.BufferedImage.TYPE_INT_ARGB) // different color model
        val g = c.getGraphics; g.drawImage(img, 0, 0, null); g.dispose(); c },
      "png", out)
    val reenc = out.toByteArray
    assert(!java.util.Arrays.equals(png, reenc), "re-encode must differ in bytes")
    assert(Multimodal.rasterHash(png) === Multimodal.rasterHash(reenc))
    // one pixel's color flips the hash; so do swapped dims
    assert(Multimodal.rasterHash(png) !==
      Multimodal.rasterHash(Multimodal.synthCheckerPng(16, 8, 0xAA3312, 0x115599)))
    assert(Multimodal.rasterHash(Multimodal.synthCheckerPng(16, 8, 0, 0)).map(_._3) !==
      Multimodal.rasterHash(Multimodal.synthCheckerPng(8, 16, 0, 0)).map(_._3))
    // unreadable bytes → None
    assert(Multimodal.rasterHash("not an image".getBytes) === None)
  }

  test("audioWindows: WAV round-trip matches the closed form; honest Nil") {
    // 300 samples at seed 5 → windows of 256 and 44
    val wav = Multimodal.synthWavWave(frames = 300, sampleRate = 8000f, seed = 5)
    val ws = Multimodal.audioWindows(wav, 256)
    assert(ws.map(_._1) === List(256, 44))
    // recompute the closed form independently and compare every stat
    def sample(i: Int): Int = ((5L * 31 + 17L * i) % 4096 - 2048).toInt
    def stats(from: Int, until: Int): (Int, Long, Int, Int) = {
      val vs = (from until until).map(sample)
      val zc = vs.sliding(2).count { case Seq(a, b) => (a < 0) != (b < 0) }
      (vs.length, vs.map(v => v.toLong * v).sum, zc, vs.map(math.abs).max)
    }
    assert(ws === List(stats(0, 256), stats(256, 300)))
    // window independence: crossings at the window seam are NOT counted
    val whole = Multimodal.audioWindows(wav, 300).head
    assert(whole._2 === ws.map(_._2).sum) // energy is seam-free
    // non-audio bytes and unsupported shapes → Nil, not garbage
    assert(Multimodal.audioWindows("not audio".getBytes, 256) === Nil)
    assert(Multimodal.audioWindows(
      Multimodal.synthWav(10, 8000f, channels = 2), 256) === Nil)
  }

  test("silenceRuns: islands of |v|<T, >= minRun, match the closed form; " +
      "honest Nil") {
    val seed = 5L; val frames = 900
    val wav = Multimodal.synthWavWave(frames, 8000f, seed)
    def sample(i: Int): Int = ((seed * 31 + 17L * i) % 4096 - 2048).toInt
    // independent reference: gaps-and-islands over the closed form
    def ref(threshold: Int, minRun: Int): List[(Int, Int)] = {
      val silent = (0 until frames).map(i => math.abs(sample(i)) < threshold)
      val runs = scala.collection.mutable.ListBuffer.empty[(Int, Int)]
      var start = -1
      for (i <- 0 to frames) {
        val s = i < frames && silent(i)
        if (s && start < 0) start = i
        else if (!s && start >= 0) {
          if (i - start >= minRun) runs += ((start, i - start)); start = -1
        }
      }
      runs.toList
    }
    val got = Multimodal.silenceRuns(wav, threshold = 256, minRun = 4)
    assert(got === ref(256, 4) && got.nonEmpty)
    // run lengths: the sawtooth steps +17 per sample, so a silence
    // band of width 511 yields ~30-sample runs — all must qualify
    assert(got.forall(_._2 >= 4))
    // a run ending AT the payload end is still emitted (the i==n flush)
    val trunc = Multimodal.silenceRuns(wav, threshold = 4096, minRun = 4)
    assert(trunc === List((0, frames))) // everything silent → one run
    assert(Multimodal.silenceRuns("not audio".getBytes, 256, 4) === Nil)
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

  test("poolCells: stripe closed form, floor-split geometry, honest None") {
    // 8×4 stripe, grid 2: columns x=0..7 carry r=(5+7x)%256; cell
    // (cy,cx) sums rows 0..1 over its 4-column block
    val png = Multimodal.synthStripePng(8, 4, seed = 5L)
    val cells = Multimodal.poolCells(png, 2).get
    def r(x: Int) = (5 + 7 * x) % 256
    val left = (0 to 3).map(r).sum.toLong * 2   // bh = 2 rows
    val right = (4 to 7).map(r).sum.toLong * 2
    assert(cells.size === 4)
    val byCell = cells.map(c => (c._1, c._2) -> c).toMap
    assert(byCell((0, 0))._4 === left && byCell((0, 1))._4 === right)
    assert(byCell((1, 0))._4 === left && byCell((1, 1))._4 === right)
    assert(cells.forall(_._3 === 8L))           // px = 4×2 per cell
    // floor-split: 5×3 over grid 2 → x blocks [0,2),[2,5); y [0,1),[1,3)
    val odd = Multimodal.poolCells(Multimodal.synthStripePng(5, 3, 0L), 2).get
    assert(odd.map(c => ((c._1, c._2), c._3)).toMap ===
      Map((0, 0) -> 2L, (0, 1) -> 3L, (1, 0) -> 4L, (1, 1) -> 6L))
    // px covers the full raster exactly once
    assert(odd.map(_._3).sum === 15L)
    // undecodable / sub-grid images → None
    assert(Multimodal.poolCells("junk".getBytes, 2) === None)
    assert(Multimodal.poolCells(Multimodal.synthStripePng(1, 1, 0L), 2) === None)
  }

  test("imageAHash: bit-identical to the two-pass poolCells rule " +
      "(16·cl > Σcl per cell), brightness-invariant, honest None") {
    // the m12 gate computes this single-pass (optimization r18); pin
    // bit-equality to the reference two-pass computation over the
    // SAME poolCells output for a spread of shaded-stripe images
    def twoPass(bytes: Array[Byte], grid: Int): Option[Long] =
      Multimodal.poolCells(bytes, grid).map { cells =>
        val tot = cells.map(c => c._4 + c._5 + c._6).sum
        cells.foldLeft(0L) { case (h, (cy, cx, _, sr, sg, sb)) =>
          if (grid.toLong * grid * (sr + sg + sb) > tot)
            h | (1L << (cy * grid + cx)) else h
        }
      }
    for (k <- 0L until 20L; b <- Seq(0, 25, 55)) {
      val png = Multimodal.synthShadedStripePng(
        w = ((k % 12) * 4 + 16).toInt, h = ((k % 6) * 4 + 8).toInt,
        seed = k, brightness = b)
      assert(Multimodal.imageAHash(png, 4) === twoPass(png, 4),
        s"seed=$k brightness=$b")
    }
    // uniform brightness shift never changes the hash (the m12 input
    // family contract)
    val a = Multimodal.imageAHash(
      Multimodal.synthShadedStripePng(16, 8, 7L, brightness = 0), 4)
    val c = Multimodal.imageAHash(
      Multimodal.synthShadedStripePng(16, 8, 7L, brightness = 55), 4)
    assert(a === c && a.isDefined)
    // undecodable / sub-grid → None, same as poolCells
    assert(Multimodal.imageAHash("junk".getBytes, 4) === None)
    assert(Multimodal.imageAHash(Multimodal.synthStripePng(2, 2, 0L), 4) === None)
  }
}
