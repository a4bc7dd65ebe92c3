package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: image/audio/
  * video payloads ride as opaque `BINARY` columns with typed metadata;
  * decode / feature-extraction runs as a partition-wise map over the
  * binary batches (the Spark-side schema, partitioning, and batch shape
  * are real; the codec itself is a clearly-marked deterministic stub —
  * this container ships no image/audio libraries).
  *
  * At 100 TB: binary payloads dominate row size, so every operator here
  * is a narrow map (no shuffle) and feature extraction drops the payload
  * column as early as possible (project-away before any wide stage).
  */
object Multimodal {

  /** Typed media row: the schema a real pipeline would carry. */
  case class MediaRecord(media_id: Long, kind: String, bytes: Array[Byte])

  /** Extracted features; `decoded_*` fields come from the stub codec. */
  case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long, checksum: Long,
      decoded_width: Int, decoded_height: Int, decoded_mean: Double)

  /** Attach a binary media column derived from a text column — the
    * stand-in for real payload ingestion (testdata has no binary table;
    * UTF-8 bytes give a deterministic, content-dependent payload).
    */
  def withMediaColumn(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      when(col(idCol) % 3 === 0, lit("image"))
        .when(col(idCol) % 3 === 1, lit("audio"))
        .otherwise(lit("video")).as("kind"),
      // null payloads normalize to empty: every downstream partition-wise
      // op (crc/decode/resize/frame loops) can deref bytes unconditionally
      coalesce(col(textCol).cast("binary"), lit(Array.emptyByteArray)).as("bytes"))

  /** STUB DECODER — deterministic fake standing in for a real image/audio
    * codec (none available in this environment). Derives plausible,
    * reproducible "decoded" properties purely from the payload bytes.
    * Replace the body with a real codec (e.g. javax.imageio / ffmpeg
    * bindings) without touching any calling plumbing.
    */
  def stubDecode(kind: String, bytes: Array[Byte]): (Int, Int, Double) = {
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += bytes(i) & 0xFF; i += 1 }
    val mean = if (bytes.length == 0) 0.0 else sum.toDouble / bytes.length
    val w = 16 + (math.abs(sum) % 64).toInt
    val h = kind match {
      case "image" => 16 + ((math.abs(sum) / 64) % 64).toInt
      case "audio" => 1 // 1-D signal
      case _       => 16 + ((math.abs(sum) / 64) % 32).toInt
    }
    (w, h, mean)
  }

  /** Partition-wise feature extraction over binary batches — the Scala
    * equivalent of a vectorized-batch UDF: one function call per
    * partition iterator, payload column consumed and dropped. Output is
    * a typed Dataset with a stable feature schema.
    */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    implicit val inEnc = Encoders.product[MediaRecord]
    media.select(col("media_id").cast("long"), col("kind"), col("bytes"))
      .as[MediaRecord]
      .mapPartitions { it =>
        it.map { r =>
          val crc = new java.util.zip.CRC32()
          crc.update(r.bytes)
          val (w, h, mean) = stubDecode(r.kind, r.bytes)
          MediaFeatures(r.media_id, r.kind, r.bytes.length.toLong, crc.getValue, w, h, mean)
        }
      }
  }

  /** Oracle-checkable slice of the media pipeline: byte length + md5 via
    * codegen'd built-ins (no stub involved), so DuckDB can verify the
    * binary-column plumbing end-to-end.
    */
  def byteStats(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      length(col(textCol).cast("binary")).cast("long").as("n_bytes"),
      md5(col(textCol).cast("binary")).as("digest"))

  /** Resized media row: payload re-sampled to a fixed target grid. */
  case class ResizedMedia(
      media_id: Long, kind: String, width: Int, height: Int, bytes: Array[Byte])

  /** STUB RESIZE — nearest-neighbor re-sample of the payload bytes onto a
    * `targetW x targetH` grid (a real codec would decode pixels first;
    * the byte-level nearest-neighbor keeps the op deterministic with no
    * media libraries). The Spark plumbing is the real thing: narrow
    * partition-wise map, output payload exactly targetW*targetH bytes,
    * old payload dropped — at 100 TB this is the shape a thumbnailing
    * pass must have (no shuffle, bytes never widen).
    */
  def resize(media: DataFrame, targetW: Int, targetH: Int): Dataset[ResizedMedia] = {
    implicit val enc = Encoders.product[ResizedMedia]
    implicit val inEnc = Encoders.product[MediaRecord]
    media.select(col("media_id").cast("long"), col("kind"), col("bytes"))
      .as[MediaRecord]
      .mapPartitions { it =>
        it.map { r =>
          val n = targetW * targetH
          val out = new Array[Byte](n)
          if (r.bytes.length > 0) {
            var i = 0
            while (i < n) {
              out(i) = r.bytes((i.toLong * r.bytes.length / n).toInt)
              i += 1
            }
          }
          ResizedMedia(r.media_id, r.kind, targetW, targetH, out)
        }
      }
  }

  /** One sampled frame of a media payload. */
  case class Frame(media_id: Long, frame_idx: Int, frame_len: Int)

  /** Frame sampling: split the payload into fixed-size frames and keep
    * every `stride`-th (the video keyframe-sampling shape). flatMap —
    * one row per SAMPLED frame only, so output volume is input/stride,
    * never the full frame explosion. Frame geometry is pure arithmetic
    * over the byte length, so the whole operator is oracle-checkable
    * without the codec.
    */
  def sampleFrames(media: DataFrame, frameSize: Int, stride: Int): Dataset[Frame] = {
    require(frameSize > 0 && stride > 0)
    implicit val enc = Encoders.product[Frame]
    implicit val inEnc = Encoders.product[MediaRecord]
    media.select(col("media_id").cast("long"), col("kind"), col("bytes"))
      .as[MediaRecord]
      .flatMap { r =>
        val nFrames = (r.bytes.length + frameSize - 1) / frameSize
        Iterator.range(0, nFrames, stride).map { idx =>
          Frame(r.media_id, idx,
            math.min(frameSize, r.bytes.length - idx * frameSize))
        }
      }
  }
}
