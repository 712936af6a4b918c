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
