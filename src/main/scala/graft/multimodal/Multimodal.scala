package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column support: image/audio/video travel as opaque
  * `binary` columns with a typed metadata struct beside them.
  *
  * IMAGE decode is REAL: [[decodeImageMeta]] reads width/height/format
  * from actual PNG/JPEG/GIF/BMP headers via the JDK's `javax.imageio`
  * (no new dependencies). AUDIO/VIDEO decode remains STUBBED (the
  * container ships no av codecs): [[stubDecodeMeta]] derives
  * deterministic fake dimensions from the payload bytes. Everything
  * around the decoders — the binary column, the metadata schema, the
  * per-partition batch processing in [[mapBinaryBatches]] — is the
  * same plumbing either way; a production av codec plugs in exactly
  * where the image decoder does.
  *
  * Scale notes: binary payloads never shuffle in these operators; the
  * decode is a map-only pass, and metadata extraction prunes to the
  * struct column for downstream filters (Parquet keeps the payload
  * column unread when only `meta.*` is selected).
  */
object Multimodal {

  // ImageIO's ImageInputStream/ImageOutputStream default to a DISK
  // cache: every encode/decode of an in-memory payload creates (and
  // deletes) a temp file. For the million-tiny-image shape of the
  // m-family gates that is a file create+write+delete per image for
  // zero benefit — the payloads already sit in RAM. Memory cache is
  // semantically identical (same bytes, same decode). Process-global,
  // set once wherever a task first touches this object.
  javax.imageio.ImageIO.setUseCache(false)

  /** Deterministic fake decode: "dimensions" from payload length, a
    * format tag from the first byte. Column-level, so it composes with
    * the rest of a projection.
    */
  def stubDecodeMeta(payload: Column): Column =
    struct(
      (octet_length(payload) % 640).cast("long").as("width"),
      (octet_length(payload) % 480).cast("long").as("height"),
      when(octet_length(payload) % 2 === 0, lit("png"))
        .otherwise(lit("jpeg")).as("format")
    ).as("meta")

  /** The real-decoder extension point: batch-iterate binary payloads per
    * partition (the Scala analogue of `mapInPandas` batches). `fn` sees
    * (id, bytes) and returns feature rows; a production deployment swaps
    * the stub for an actual codec here without touching the plumbing.
    */
  def mapBinaryBatches[T: org.apache.spark.sql.Encoder](
      df: DataFrame, idCol: String, payloadCol: String)(
      fn: Iterator[(Long, Array[Byte])] => Iterator[T]): Dataset[T] = {
    val pruned = df.select(col(idCol).cast("long"), col(payloadCol))
    import pruned.sparkSession.implicits._
    pruned.as[(Long, Array[Byte])].mapPartitions(fn)
  }

  /** REAL image decode through the [[mapBinaryBatches]] extension
    * point: width/height/format read from the actual image header via
    * `javax.imageio` — in the JDK, zero new dependencies. The reader
    * is header-only (`getWidth(0)` never decodes pixel data), so this
    * is a cheap map-only pass even over multi-MB payloads. Bytes no
    * installed reader recognizes (i.e. not PNG/JPEG/GIF/BMP/…) yield
    * null dimensions and a null format — the honest fallback the stub
    * family documents for codecs the JVM lacks (video/audio).
    */
  def decodeImageMeta(df: DataFrame, idCol: String,
      payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    mapBinaryBatches(df, idCol, payloadCol) { it =>
      it.map { case (id, bytes) =>
        decodeImageHeader(bytes) match {
          case Some((w, h, fmt)) =>
            (id, Some(w), Some(h), Some(fmt))
          case None => (id, None: Option[Int], None: Option[Int],
            None: Option[String])
        }
      }
    }.toDF("id", "width", "height", "format")
  }

  /** Header-only decode of one payload: (width, height, format
    * name lowercased), or None when no installed ImageIO reader
    * recognizes the bytes or the header is corrupt.
    */
  def decodeImageHeader(bytes: Array[Byte]): Option[(Int, Int, String)] = {
    if (bytes == null || bytes.isEmpty) return None
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(iis)
          Some((r.getWidth(0), r.getHeight(0), r.getFormatName.toLowerCase))
        } finally r.dispose()
      }
    } catch { case scala.util.control.NonFatal(_) => None }
    finally iis.close()
  }

  /** Header-only AUDIO decode — the javax.sound.sampled analogue of
    * [[decodeImageMeta]], again zero new dependencies: the JDK ships
    * WAV/AIFF/AU readers. (sampleRate, channels, frameLength,
    * fileType lowercased), or None when no installed reader
    * recognizes the bytes.
    */
  def decodeAudioMeta(df: DataFrame, idCol: String,
      payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    mapBinaryBatches(df, idCol, payloadCol) { it =>
      it.map { case (id, bytes) =>
        decodeAudioHeader(bytes) match {
          case Some((rate, ch, frames, fmt)) =>
            (id, Some(rate), Some(ch), frames, Some(fmt))
          case None => (id, None: Option[Float], None: Option[Int],
            None: Option[Long], None: Option[String])
        }
      }
    }.toDF("id", "sample_rate", "channels", "frames", "format")
  }

  def decodeAudioHeader(bytes: Array[Byte])
      : Option[(Float, Int, Option[Long], String)] = {
    if (bytes == null || bytes.isEmpty) return None
    try {
      val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(bytes))
      val f = aff.getFormat
      // AudioSystem reports NOT_SPECIFIED (-1) when the reader cannot
      // determine frame length — that is a NULL, not a frame count
      // (a -1 passed through poisons duration arithmetic downstream)
      val frames = aff.getFrameLength.toLong
      Some((f.getSampleRate, f.getChannels,
        if (frames < 0) None else Some(frames),
        aff.getType.toString.toLowerCase))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Deterministic 16-bit PCM WAV payload (silence) — the test/gate
    * synthesizer: real RIFF headers written by the JDK's own encoder,
    * so [[decodeAudioHeader]] exercises a genuine round-trip.
    */
  def synthWav(frames: Int, sampleRate: Float, channels: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, channels,
      true, false)
    val pcm = new Array[Byte](frames * channels * 2)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Header-only VIDEO CONTAINER decode — MP4/ISO-BMFF is just
    * length-prefixed boxes (ISO 14496-12, a public format), so
    * duration and track count need no codec at all: walk the top
    * level to `moov`, read `mvhd` (timescale + duration) and count
    * `trak` children. (durationMs, nTracks, brand), or None for bytes
    * that aren't an MP4 container. Frame/pixel decode stays honestly
    * stubbed — THAT needs codecs the JVM lacks.
    */
  def decodeMp4Meta(df: DataFrame, idCol: String,
      payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    mapBinaryBatches(df, idCol, payloadCol) { it =>
      it.map { case (id, bytes) =>
        decodeMp4Header(bytes) match {
          case Some((ms, n, brand)) => (id, Some(ms), Some(n), Some(brand))
          case None =>
            (id, None: Option[Long], None: Option[Int], None: Option[String])
        }
      }
    }.toDF("id", "duration_ms", "n_tracks", "brand")
  }

  def decodeMp4Header(bytes: Array[Byte]): Option[(Long, Int, String)] =
    try decodeMp4Header0(bytes)
    catch {
      // truncated/garbled boxes must honor the None contract, never
      // crash an executor on malformed user data
      case scala.util.control.NonFatal(_) => None
    }

  private def decodeMp4Header0(bytes: Array[Byte])
      : Option[(Long, Int, String)] = {
    if (bytes == null || bytes.length < 16) return None
    def u32(o: Int): Long =
      ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
        ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
    def tag(o: Int): String =
      new String(bytes, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (tag(4) != "ftyp") return None
    val brand = tag(8)
    // walk top-level boxes to moov
    var o = 0L
    var moov = -1L; var moovEnd = -1L
    while (o + 8 <= bytes.length && moov < 0) {
      val size = u32(o.toInt)
      if (size < 8) return None
      if (tag(o.toInt + 4) == "moov") { moov = o + 8; moovEnd = o + size }
      o += size
    }
    if (moov < 0) return None
    // walk moov children: mvhd (v0: timescale@12 duration@16) + traks
    var p = moov
    var durMs = -1L; var tracks = 0
    while (p + 8 <= moovEnd && p + 8 <= bytes.length) {
      val size = u32(p.toInt)
      if (size < 8) return None
      tag(p.toInt + 4) match {
        case "mvhd" if p + 28 <= bytes.length =>
          val version = bytes(p.toInt + 8) & 0xff
          if (version == 0) {
            val timescale = u32(p.toInt + 20)
            val duration = u32(p.toInt + 24)
            if (timescale > 0)
              durMs = math.round(duration * 1000.0 / timescale)
          }
        case "trak" => tracks += 1
        case _ =>
      }
      p += size
    }
    if (durMs < 0) None else Some((durMs, tracks, brand))
  }

  /** Minimal well-formed MP4 container (ftyp + moov(mvhd, trak…)) —
    * the test/gate synthesizer for [[decodeMp4Header]]. Box layout
    * per ISO 14496-12; media data omitted (header-only contract).
    */
  def synthMp4(durationMs: Long, timescale: Long, nTracks: Int)
      : Array[Byte] = {
    def box(tag: String, payload: Array[Byte]): Array[Byte] = {
      val size = 8 + payload.length
      val bb = java.nio.ByteBuffer.allocate(size)
      bb.putInt(size).put(tag.getBytes("US-ASCII")).put(payload)
      bb.array()
    }
    val ftyp = box("ftyp",
      "isom".getBytes("US-ASCII") ++ Array[Byte](0, 0, 0, 1) ++
        "isom".getBytes("US-ASCII"))
    val mvhdPayload = {
      val bb = java.nio.ByteBuffer.allocate(100) // v0 mvhd body
      bb.putInt(0) // version+flags
      bb.putInt(0).putInt(0) // creation, modification
      bb.putInt(timescale.toInt)
      bb.putInt(math.round(durationMs * timescale / 1000.0).toInt)
      bb.array()
    }
    val traks = (0 until nTracks).map(_ => box("trak", Array[Byte]()))
    val moov = box("moov",
      box("mvhd", mvhdPayload) ++ traks.flatten)
    ftyp ++ moov
  }

  /** Stub feature extraction via [[mapBinaryBatches]]: length + a
    * rolling byte checksum standing in for decoded features.
    */
  /** REAL image PIXEL decode: full raster via `javax.imageio` (the
    * same JDK path as [[decodeImageMeta]], but `ImageIO.read` instead
    * of a header probe), emitting per-image integer channel SUMS —
    * (width, height, sum_r, sum_g, sum_b) — plus the Rec.601 luma sum
    * in fixed-point (×1000, rounded once at the end).
    *
    * Sums, not means, deliberately: PNG is lossless and the sums are
    * exact integers, so the m05 gate hash-compares against a DuckDB
    * closed form with no float tolerance anywhere. Map-only over the
    * payload partition — the raster lives only inside the task.
    */
  def decodeImagePixelStats(df: DataFrame, idCol: String,
      payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    mapBinaryBatches(df, idCol, payloadCol) { it =>
      it.map { case (id, bytes) =>
        imagePixelSums(bytes) match {
          case Some((w, h, sr, sg, sb)) =>
            // Rec.601 integer form: 299R + 587G + 114B (luma ×1000)
            (id, Some(w), Some(h), Some(sr), Some(sg), Some(sb),
              Some(299L * sr + 587L * sg + 114L * sb))
          case None => (id, None: Option[Int], None: Option[Int],
            None: Option[Long], None: Option[Long], None: Option[Long],
            None: Option[Long])
        }
      }
    }.toDF("id", "width", "height", "sum_r", "sum_g", "sum_b",
      "luma_sum_x1000")
  }

  /** Image CONTENT dedup key: decode the full raster and hash its
    * canonical form — (width, height, row-major RGB triplets) through
    * FNV-1a 64. Hashing the DECODED raster, not the file bytes, is
    * the point: two encodings of the same pixels (different PNG
    * filter/compression choices, stripped ancillary chunks, a
    * re-encode) collapse to one key, which raw-byte hashing misses.
    * Map-only; the shuffle downstream carries 8 bytes per image,
    * never the raster — the property that makes image dedup viable
    * over a 100-TB binary column (pair with d01's hash-groupBy).
    * Unreadable payloads yield a NULL hash: consumers must exclude
    * nulls before grouping (null means "could not decode", and
    * grouping nulls together would declare all undecodable images
    * duplicates of each other).
    */
  def rasterContentHash(df: DataFrame, idCol: String,
      payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    mapBinaryBatches(df, idCol, payloadCol) { it =>
      it.map { case (id, bytes) =>
        rasterHash(bytes) match {
          case Some((w, h, k)) => (id, Some(w), Some(h), Some(k))
          case None => (id, None: Option[Int], None: Option[Int],
            None: Option[Long])
        }
      }
    }.toDF("id", "width", "height", "raster_hash")
  }

  /** FNV-1a 64 over the canonical raster; None when unreadable. */
  def rasterHash(bytes: Array[Byte]): Option[(Int, Int, Long)] = {
    if (bytes == null || bytes.isEmpty) return None
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        var hash = 0xcbf29ce484222325L
        @inline def mix(v: Int): Unit = {
          hash ^= (v & 0xFFL); hash *= 0x100000001b3L
          hash ^= ((v >> 8) & 0xFFL); hash *= 0x100000001b3L
          hash ^= ((v >> 16) & 0xFFL); hash *= 0x100000001b3L
          hash ^= ((v >> 24) & 0xFFL); hash *= 0x100000001b3L
        }
        mix(w); mix(h)
        // bulk getRGB: one color-model conversion pass instead of a
        // per-pixel virtual call — same ARGB ints, same hash
        val px = img.getRGB(0, 0, w, h, null, 0, w)
        var i = 0
        val n = w * h
        while (i < n) { mix(px(i) & 0xFFFFFF); i += 1 }
        Some((w, h, hash))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Decode one payload's full raster and sum the RGB channels.
    * None when no installed reader recognizes the bytes.
    */
  def imagePixelSums(bytes: Array[Byte])
      : Option[(Int, Int, Long, Long, Long)] = {
    if (bytes == null || bytes.isEmpty) return None
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        var (sr, sg, sb) = (0L, 0L, 0L)
        val px = img.getRGB(0, 0, w, h, null, 0, w)
        var i = 0
        val n = w * h
        while (i < n) {
          val rgb = px(i)
          sr += (rgb >> 16) & 0xFF
          sg += (rgb >> 8) & 0xFF
          sb += rgb & 0xFF
          i += 1
        }
        Some((w, h, sr, sg, sb))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Deterministic checkerboard PNG — the m05 synthesizer: two colors
    * alternating per pixel with an EVEN width, so every row holds
    * exactly w/2 of each color and the channel sums have the closed
    * form w·h·(c0+c1)/2 — integer-exact, which is what lets the gate's
    * oracle be plain SQL arithmetic. PNG (lossless) keeps the decoded
    * raster bit-identical to what was drawn; a JPEG here would smear
    * the checkerboard and break the closed form.
    */
  def synthCheckerPng(w: Int, h: Int, c0: Int, c1: Int): Array[Byte] = {
    require(w % 2 == 0, "even width keeps the per-row color counts equal")
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val row = y * w
      var x = 0
      while (x < w) {
        px(row + x) = if (((x + y) & 1) == 0) c0 else c1
        x += 1
      }
      y += 1
    }
    img.setRGB(0, 0, w, h, px, 0, w)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** REAL image RESIZE (box-filter downsample): decode the full
    * raster and average-pool it onto a `grid`×`grid` thumbnail,
    * emitting one row per output cell with INTEGER channel sums and
    * the cell's pixel count — the caller divides for means, and
    * because PNG decode is lossless the sums are exact, so the m11
    * gate hash-compares against closed-form SQL with no float
    * tolerance (the m05 discipline applied to a one-to-many op).
    * Cell x-range is [cx·w/grid, (cx+1)·w/grid) in integer arithmetic
    * — exact equal blocks when grid | w, floor-split otherwise.
    * One-to-many inside mapPartitions: the raster lives only in the
    * task, grid² small rows leave it; downstream shuffles carry cell
    * stats, never pixels.
    */
  def decodeImagePool(df: DataFrame, idCol: String, payloadCol: String,
      grid: Int): DataFrame = {
    require(grid >= 1)
    val spark = df.sparkSession
    import spark.implicits._
    mapBinaryBatches(df, idCol, payloadCol) { it =>
      it.flatMap { case (id, bytes) =>
        poolCells(bytes, grid).iterator.flatten.map {
          case (cy, cx, px, sr, sg, sb) => (id, cy, cx, px, sr, sg, sb)
        }
      }
    }.toDF("id", "cy", "cx", "px", "sum_r", "sum_g", "sum_b")
  }

  /** Average-pool one payload's raster to grid×grid integer cell
    * sums; None when undecodable or smaller than the grid.
    */
  def poolCells(bytes: Array[Byte], grid: Int)
      : Option[List[(Int, Int, Long, Long, Long, Long)]] = {
    if (bytes == null || bytes.isEmpty) return None
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null || img.getWidth < grid || img.getHeight < grid) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        val px = img.getRGB(0, 0, w, h, null, 0, w)
        val out = List.newBuilder[(Int, Int, Long, Long, Long, Long)]
        var cy = 0
        while (cy < grid) {
          val y0 = cy * h / grid; val y1 = (cy + 1) * h / grid
          var cx = 0
          while (cx < grid) {
            val x0 = cx * w / grid; val x1 = (cx + 1) * w / grid
            var (sr, sg, sb) = (0L, 0L, 0L)
            var y = y0
            while (y < y1) {
              val row = y * w
              var x = x0
              while (x < x1) {
                val rgb = px(row + x)
                sr += (rgb >> 16) & 0xFF
                sg += (rgb >> 8) & 0xFF
                sb += rgb & 0xFF
                x += 1
              }
              y += 1
            }
            out += ((cy, cx, (x1 - x0).toLong * (y1 - y0), sr, sg, sb))
            cx += 1
          }
          cy += 1
        }
        Some(out.result())
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Perceptual average-hash (aHash) of one payload, computed from the
    * SAME [[poolCells]] pooling: cell luma proxy cl = sum_r+sum_g+sum_b,
    * bit (cy·grid+cx) set iff grid²·cl > Σcl — bit-identical to the
    * two-pass SQL form (join the pooled cells with their own per-image
    * total), but in ONE decode: the m12 gate's cells⋈total join made
    * the decode subtree a double-evaluated common subexpression (two
    * consumers of an opaque mapPartitions — Spark cannot CSE it), so
    * every PNG was synthesized and decoded twice. None when
    * undecodable or smaller than the grid, same as [[poolCells]].
    */
  def imageAHash(bytes: Array[Byte], grid: Int): Option[Long] =
    poolCells(bytes, grid).map { cells =>
      var tot = 0L
      cells.foreach { case (_, _, _, sr, sg, sb) => tot += sr + sg + sb }
      val g2 = grid.toLong * grid
      var h = 0L
      cells.foreach { case (cy, cx, _, sr, sg, sb) =>
        if (g2 * (sr + sg + sb) > tot) h |= 1L << (cy * grid + cx)
      }
      h
    }

  /** [[imageAHash]] over a binary column — (id, ahash) rows; decode
    * and pooling stay inside the scan partition (the m-family plan
    * contract) and the shuffle downstream carries 16 bytes per image.
    */
  def decodeImageAHashes(df: DataFrame, idCol: String, payloadCol: String,
      grid: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    mapBinaryBatches(df, idCol, payloadCol) { it =>
      it.flatMap { case (id, bytes) =>
        imageAHash(bytes, grid).map(h => (id, h))
      }
    }.toDF("id", "ahash")
  }

  /** Deterministic vertical-stripe PNG — the m11 synthesizer: column
    * x carries RGB ((seed+7x)%256, (seed·3+11x)%256, (seed·5+13x)%256)
    * constant down the column, so any pooled cell's channel sum has
    * the closed form bh·Σ_{x∈cell}(…%256) — integer-exact SQL, while
    * the Spark side does a REAL encode→decode→pool round trip.
    * (The m05 checkerboard is useless here: its per-cell means are all
    * identical; stripes give every cell a distinct, position-dependent
    * value, so the oracle actually pins the pooling geometry.)
    */
  /** [[synthStripePng]] variant with a UNIFORM brightness offset and a
    * wrap-free base range: channel = ((pattern) % 200) + brightness,
    * brightness ≤ 55, so the shift never wraps mod 256 and two images
    * with the same seed but different brightness are exact per-pixel
    * translations of each other — the input family m12's average-hash
    * must collapse (and an exact raster hash must NOT).
    */
  def synthShadedStripePng(w: Int, h: Int, seed: Long,
      brightness: Int): Array[Byte] = {
    require(brightness >= 0 && brightness <= 55,
      "brightness must be in [0, 55] to stay wrap-free")
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val px = new Array[Int](w * h)
    var x = 0
    while (x < w) {
      val r = ((seed + 7L * x) % 200).toInt + brightness
      val g = ((seed * 3 + 11L * x) % 200).toInt + brightness
      val b = ((seed * 5 + 13L * x) % 200).toInt + brightness
      val rgb = (r << 16) | (g << 8) | b
      var y = 0
      while (y < h) { px(y * w + x) = rgb; y += 1 }
      x += 1
    }
    img.setRGB(0, 0, w, h, px, 0, w)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  def synthStripePng(w: Int, h: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val px = new Array[Int](w * h)
    var x = 0
    while (x < w) {
      val r = ((seed + 7L * x) % 256).toInt
      val g = ((seed * 3 + 11L * x) % 256).toInt
      val b = ((seed * 5 + 13L * x) % 256).toInt
      val rgb = (r << 16) | (g << 8) | b
      var y = 0
      while (y < h) { px(y * w + x) = rgb; y += 1 }
      x += 1
    }
    img.setRGB(0, 0, w, h, px, 0, w)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** REAL uncompressed-video frame decode: Y4M (YUV4MPEG2) is a plain
    * ASCII header + `FRAME\n`-delimited raw YUV planes — a public
    * codec-free format, so actual frame PIXELS are readable with zero
    * av dependencies (the codec-bound formats stay honestly stubbed).
    * One output row per sampled frame carrying the frame's exact
    * integer luma-plane sum; the one-to-many explode happens inside
    * mapPartitions, so a long video never materializes all frames in
    * a single row (same shape as [[stubFrameSample]]).
    */
  def decodeY4mFrames(df: DataFrame, idCol: String, payloadCol: String,
      everyNth: Int = 1): DataFrame = {
    require(everyNth >= 1)
    val spark = df.sparkSession
    import spark.implicits._
    mapBinaryBatches(df, idCol, payloadCol) { it =>
      it.flatMap { case (id, bytes) =>
        y4mFrames(bytes).iterator.zipWithIndex.collect {
          case ((w, h, ySum), idx) if idx % everyNth == 0 =>
            (id, idx, w, h, ySum)
        }
      }
    }.toDF("id", "frame_idx", "width", "height", "y_sum")
  }

  /** Parse a Y4M payload: per frame (width, height, luma-plane sum).
    * Supports the C420 (default) and C444 colorspace tags; returns an
    * empty list for bytes that aren't YUV4MPEG2 or have a torn frame.
    */
  def y4mFrames(bytes: Array[Byte]): List[(Int, Int, Long)] = {
    val MAGIC = "YUV4MPEG2 "
    if (bytes == null || bytes.length < MAGIC.length) return Nil
    val hdrEnd = bytes.indexOf('\n'.toByte)
    if (hdrEnd < 0) return Nil
    val hdr = new String(bytes, 0, hdrEnd, "US-ASCII")
    if (!hdr.startsWith(MAGIC)) return Nil
    val params = hdr.substring(MAGIC.length).split(' ')
    def tag(c: Char): Option[String] =
      params.collectFirst { case p if p.nonEmpty && p.head == c => p.tail }
    val wh = for (w <- tag('W').map(_.toInt); h <- tag('H').map(_.toInt))
      yield (w, h)
    wh match {
      case None => Nil
      case Some((w, h)) =>
        val chroma = tag('C').getOrElse("420")
        // exact known tags only: C444alpha has a 4th (alpha) plane, so a
        // prefix match would size frames at 3·w·h and silently misalign
        // every frame after the first — reject it like 422/mono instead
        val frameLen = chroma match {
          case "444" => 3 * w * h
          case "420" | "420jpeg" | "420mpeg2" | "420paldv" =>
            w * h + 2 * ((w / 2) * (h / 2))
          case _ => return Nil // 444alpha/422/mono/etc: unsupported here
        }
        val frames = List.newBuilder[(Int, Int, Long)]
        var pos = hdrEnd + 1
        val F = "FRAME".getBytes("US-ASCII")
        while (pos < bytes.length) {
          // frame header is FRAME[ params]\n
          if (pos + F.length > bytes.length ||
              !F.indices.forall(i => bytes(pos + i) == F(i))) return frames.result()
          val nl = bytes.indexOf('\n'.toByte, pos)
          if (nl < 0 || nl + 1 + frameLen > bytes.length) return frames.result()
          var s = 0L
          var i = nl + 1
          val yEnd = nl + 1 + w * h
          while (i < yEnd) { s += bytes(i) & 0xFF; i += 1 }
          frames += ((w, h, s))
          pos = nl + 1 + frameLen
        }
        frames.result()
    }
  }

  /** Deterministic Y4M synthesizer (C420): frame k's luma plane is the
    * constant (seed + 17k) mod 256, chroma planes are flat 128 — so a
    * frame's luma sum has the closed form w·h·((seed+17k) mod 256).
    */
  def synthY4m(w: Int, h: Int, nFrames: Int, seed: Long): Array[Byte] = {
    require(w % 2 == 0 && h % 2 == 0, "C420 needs even dimensions")
    val out = new java.io.ByteArrayOutputStream()
    out.write(s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420\n".getBytes("US-ASCII"))
    val chroma = new Array[Byte]((w / 2) * (h / 2))
    java.util.Arrays.fill(chroma, 128.toByte)
    var k = 0
    while (k < nFrames) {
      out.write("FRAME\n".getBytes("US-ASCII"))
      val yPlane = new Array[Byte](w * h)
      java.util.Arrays.fill(yPlane, (((seed + 17L * k) % 256).toInt).toByte)
      out.write(yPlane)
      out.write(chroma)
      out.write(chroma)
      k += 1
    }
    out.toByteArray
  }

  /** REAL windowed audio feature extraction — the classic first step of
    * an audio-pipeline quality pass (energy/ZCR/peak per frame window),
    * run end-to-end with zero new dependencies: `AudioSystem` parses
    * the RIFF container and hands back PCM frames, we reconstruct the
    * signed 16-bit LE samples and reduce each fixed-size window to
    * exact integers (sum of squares = energy, sign-flip count = ZCR,
    * max |sample| = peak). Map-only through [[mapBinaryBatches]]:
    * payload bytes never shuffle, windows stream out of the partition
    * iterator — the shape that holds when payloads are hours of audio.
    */
  def decodeAudioWindows(df: DataFrame, idCol: String, payloadCol: String,
      window: Int): DataFrame = {
    require(window >= 2, "a window needs at least two samples")
    val spark = df.sparkSession
    import spark.implicits._
    mapBinaryBatches(df, idCol, payloadCol) { it =>
      it.flatMap { case (id, bytes) =>
        audioWindows(bytes, window).iterator.zipWithIndex.map {
          case ((n, sumSq, zc, peak), idx) => (id, idx, n, sumSq, zc, peak)
        }
      }
    }.toDF("id", "window_idx", "n_samples", "sum_sq", "zero_cross", "peak")
  }

  /** Silence-run segmentation (the VAD-style activity gate an audio
    * training pipeline runs before feature extraction): contiguous
    * runs of |sample| < threshold lasting ≥ minRun samples, as
    * (seg_idx, start_sample, n_samples) per payload. The scan is
    * sequential PER PAYLOAD inside the decode partition — runs are an
    * inherently serial property of one waveform, but payloads stay
    * embarrassingly parallel and nothing shuffles below the rollup.
    * Same decode contract as [[audioWindows]] (16-bit signed mono LE
    * PCM through the real RIFF parser; anything else → no rows).
    */
  def decodeSilenceRuns(df: DataFrame, idCol: String, payloadCol: String,
      threshold: Int, minRun: Int): DataFrame = {
    require(threshold > 0 && minRun >= 1)
    val spark = df.sparkSession
    import spark.implicits._
    mapBinaryBatches(df, idCol, payloadCol) { it =>
      it.flatMap { case (id, bytes) =>
        silenceRuns(bytes, threshold, minRun).iterator.zipWithIndex.map {
          case ((start, len), idx) => (id, idx, start, len)
        }
      }
    }.toDF("id", "seg_idx", "start_sample", "n_samples")
  }

  /** The ONE decode contract of the audio family, shared by
    * [[audioWindows]] and [[silenceRuns]] so the accepted-format guard
    * and the LE sample extraction can never diverge between gates:
    * a real RIFF parse accepting exactly 16-bit signed mono LE PCM;
    * anything else → null (the family's honest reject).
    */
  private def pcm16MonoSamples(bytes: Array[Byte]): Array[Int] = {
    if (bytes == null || bytes.isEmpty) return null
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val f = ais.getFormat
      if (f.getSampleSizeInBits != 16 || f.getChannels != 1 ||
          f.isBigEndian ||
          f.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
        return null
      val data = ais.readAllBytes()
      val out = new Array[Int](data.length / 2)
      var i = 0
      while (i < out.length) {
        out(i) = ((data(2 * i) & 0xFF) | (data(2 * i + 1) << 8)).toShort.toInt
        i += 1
      }
      out
    } catch { case scala.util.control.NonFatal(_) => null }
  }

  /** (start, length) of each qualifying silence run — see
    * [[decodeSilenceRuns]] for the contract.
    */
  def silenceRuns(bytes: Array[Byte], threshold: Int, minRun: Int)
      : List[(Int, Int)] = {
    val samples = pcm16MonoSamples(bytes)
    if (samples == null) return Nil
    val out = List.newBuilder[(Int, Int)]
    var i = 0
    var runStart = -1
    while (i <= samples.length) {
      val silent = i < samples.length && math.abs(samples(i)) < threshold
      if (silent && runStart < 0) runStart = i
      else if (!silent && runStart >= 0) {
        if (i - runStart >= minRun) out += ((runStart, i - runStart))
        runStart = -1
      }
      i += 1
    }
    out.result()
  }

  /** Decode a WAV payload to per-window (n, Σv², zero-crossings, peak).
    * Only the exact shape the pipeline synthesizes is accepted (16-bit
    * signed mono little-endian PCM) — anything else yields Nil, the
    * honest null of the decode family. Zero-crossings are counted
    * WITHIN a window ((prev<0) != (cur<0) over consecutive samples), so
    * windows are independently recomputable — the property the oracle
    * and any chunked re-decode rely on.
    */
  def audioWindows(bytes: Array[Byte], window: Int)
      : List[(Int, Long, Int, Int)] = {
    val samples = pcm16MonoSamples(bytes)
    if (samples == null) return Nil
    val nSamples = samples.length
    val out = List.newBuilder[(Int, Long, Int, Int)]
    var w0 = 0
    while (w0 < nSamples) {
      val w1 = math.min(w0 + window, nSamples)
      var i = w0
      var sumSq = 0L
      var zc = 0
      var peak = 0
      var prevNeg = false
      while (i < w1) {
        val v = samples(i)
        sumSq += v.toLong * v
        val a = math.abs(v)
        if (a > peak) peak = a
        val neg = v < 0
        if (i > w0 && neg != prevNeg) zc += 1
        prevNeg = neg
        i += 1
      }
      out += ((w1 - w0, sumSq, zc, peak))
      w0 = w1
    }
    out.result()
  }

  /** Deterministic 16-bit mono PCM WAV whose samples follow the closed
    * form `((seed*31 + 17*i) mod 4096) - 2048` — a sawtooth-ish signal
    * with exact integer windowed stats, written through the JDK's own
    * WAV encoder so [[audioWindows]] exercises a genuine container
    * round-trip (RIFF parse, not a trusting byte copy).
    */
  def synthWavWave(frames: Int, sampleRate: Float, seed: Long): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1,
      true, false)
    val pcm = new Array[Byte](frames * 2)
    var i = 0
    while (i < frames) {
      val v = ((seed * 31 + 17L * i) % 4096 - 2048).toInt
      pcm(2 * i) = (v & 0xFF).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xFF).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  def stubFeatures(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    case class Feat(id: Long, n_bytes: Int, checksum: Long)
    val spark = df.sparkSession
    import spark.implicits._
    mapBinaryBatches(df, idCol, payloadCol) { it =>
      it.map { case (id, bytes) =>
        var cs = 0L
        bytes.foreach(b => cs = cs * 31 + (b & 0xFF))
        (id, bytes.length, cs)
      }
    }.toDF("id", "n_bytes", "checksum")
  }

  /** Binary→binary transform shape (a real resize plugs in here): the
    * stub deterministically truncates-or-cycles the payload to the
    * target byte budget `w*h` and re-stamps the meta struct. Map-only:
    * payloads transform in place per partition, nothing shuffles.
    */
  def stubResize(df: DataFrame, idCol: String, payloadCol: String,
      w: Int, h: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val target = w * h
    mapBinaryBatches(df, idCol, payloadCol) { it =>
      it.map { case (id, bytes) =>
        val out = new Array[Byte](target)
        if (bytes.nonEmpty) {
          var i = 0
          while (i < target) { out(i) = bytes(i % bytes.length); i += 1 }
        }
        (id, out)
      }
    }.toDF("id", "payload")
      .withColumn("meta", struct(lit(w.toLong).as("width"),
        lit(h.toLong).as("height"), lit("raw").as("format")))
  }

  /** One-to-many batch shape (a real video frame-sampler plugs in
    * here): the stub treats the payload as fixed-size `frameBytes`
    * frames and emits every `everyNth` one as its own row — the
    * explode-in-mapPartitions form that keeps a 100 MB video from ever
    * materializing all its frames in one row.
    */
  def stubFrameSample(df: DataFrame, idCol: String, payloadCol: String,
      everyNth: Int, frameBytes: Int = 1024): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    mapBinaryBatches(df, idCol, payloadCol) { it =>
      it.flatMap { case (id, bytes) =>
        bytes.grouped(frameBytes).zipWithIndex.collect {
          case (frame, idx) if idx % everyNth == 0 => (id, idx, frame)
        }
      }
    }.toDF("id", "frame_idx", "frame")
  }
}
