package graft.data

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** A multimodal record: opaque media bytes + typed metadata. */
case class MediaDoc(doc_id: Long, media: Array[Byte], mime: String)

/** Decoded/extracted media features (stub decode — see [[Multimodal.decodeStub]]). */
case class MediaFeatures(
    doc_id: Long,
    byte_len: Int,
    header_hex: String,
    n_frames: Int,
    frames_hex: String,
    fingerprint: String
)

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata; decode/feature-extract/frame-sample over partitions.
  *
  * The actual codec layer is STUBBED (this container has no image/audio
  * libraries): [[decodeStub]] produces deterministic fake features from the
  * raw bytes. Everything Spark-side — schema, partition-iterator batch shape,
  * binary column handling, metadata extraction — is real and tested; swap the
  * body of `decodeOne` for a real decoder (JNI/FFmpeg/ImageIO) without
  * touching the plan.
  *
  * Scale: metadata extraction is pure column expressions fused with the scan;
  * decode runs `mapPartitions` so each task amortizes codec init across its
  * partition (the Scala analogue of `mapInPandas` batching). Binary columns
  * stay off the shuffle: partition on ids, never on media bytes.
  */
object Multimodal {

  /** Column-expression metadata over a binary media column: length, header
    * bytes, strided frame samples (4 frames of 4 bytes at a 32-byte stride),
    * content fingerprint. Zero shuffle.
    */
  def metadata(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val b = col(binCol)
    val frames = (0 until 4).map(i => lower(hex(substring(b, 1 + 32 * i, 4))))
    df.select(
      col(idCol),
      length(b).as("byte_len"),
      lower(hex(substring(b, 1, 16))).as("header_hex"),
      concat_ws("-", frames: _*).as("frames_hex"),
      md5(b).as("fingerprint")
    )
  }

  /** View a text/binary column as a MediaDoc dataset (fixture path: real
    * deployments read binary columns from parquet directly).
    */
  def asMedia(df: DataFrame, idCol: String, binCol: String, mime: String): Dataset[MediaDoc] = {
    import df.sparkSession.implicits._
    df.select(
      col(idCol).cast("long").as("doc_id"),
      col(binCol).cast("binary").as("media"),
      lit(mime).as("mime")
    ).as[MediaDoc]
  }

  /** Deterministic stand-in for a media decoder. Real impl would decode
    * image/audio frames here.
    */
  private[data] def decodeOne(d: MediaDoc, frameStride: Int): MediaFeatures = {
    val bytes = d.media
    def hexAt(off: Int, len: Int): String =
      bytes.slice(off, math.min(off + len, bytes.length)).map("%02x".format(_)).mkString
    val nFrames = math.max(0, (bytes.length - 1) / frameStride + 1)
    val frames = (0 until math.min(nFrames, 4)).map(i => hexAt(i * frameStride, 4))
    MediaFeatures(
      doc_id = d.doc_id,
      byte_len = bytes.length,
      header_hex = hexAt(0, 16),
      n_frames = nFrames,
      frames_hex = frames.mkString("-"),
      fingerprint = java.security.MessageDigest
        .getInstance("MD5")
        .digest(bytes)
        .map("%02x".format(_))
        .mkString
    )
  }

  /** Partition-batched decode: codec init once per partition, rows streamed
    * through (the `mapInPandas` batch shape, Scala-typed).
    */
  def decodeStub(ds: Dataset[MediaDoc], frameStride: Int = 32): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // real decoder would be initialized HERE, once per partition
      it.map(decodeOne(_, frameStride))
    }
  }
}
