package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column support: image/audio/video travel as opaque
  * `binary` columns with a typed metadata struct beside them.
  *
  * The actual media decode is STUBBED (this container ships no
  * image/audio codecs): [[stubDecodeMeta]] derives deterministic fake
  * dimensions from the payload bytes. Everything around the stub — the
  * binary column, the metadata schema, the per-partition batch
  * processing in [[mapBinaryBatches]] — is the real plumbing a decode
  * UDF would plug into.
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
