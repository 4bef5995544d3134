package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: media travels as an opaque `binary` column plus a typed
  * metadata struct; decode / feature-extract / frame-sample run as
  * partition-local transforms over the binary payloads.
  *
  * Decode is REAL for every format a bare JVM can parse — binary PPM,
  * JPEG/PNG/GIF/BMP (via `javax.imageio`), 16-bit PCM WAV audio
  * ([[ImageOps]]/[[AudioOps]]/[[MediaFeatureExtract]]), and Y4M video
  * ([[Y4m]]/[[Y4mDecoder]]: YUV4MPEG2 frame parsing + BT.601 → RGB, the
  * one true multi-frame format needing no native codec): parse,
  * nearest-neighbor resize, channel means, luminance histogram, RMS/peak,
  * frame sampling, with corrupt-media tolerance. Only COMPRESSED video
  * codecs (MP4/H.264/VP9) remain behind the [[MediaDecoder]] seam — they
  * require native libraries, so production swaps in a JNI/javacv-backed
  * decoder; [[StillImageDecoder]]/[[Y4mDecoder]] serve real media through
  * the same seam, and tests of the raw chunk plumbing use
  * [[FakeDecoder]], a deterministic stand-in. Everything around the seam
  * — schema, batch shape, partition-local execution, feature layout — is
  * real and tested either way.
  *
  * Scale notes: `mapPartitions` keeps per-partition decoder state (model/
  * codec init once per partition, not per row); binary payloads never pass
  * through a shuffle — decode early, project features, and only the small
  * feature vectors move.
  */
final case class MediaRecord(media_id: Long, kind: String, content: Array[Byte],
                             mime: String, width: Int, height: Int)

final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                               byte_mean: Double, histogram: Array[Long],
                               frames_sampled: Int)

/** Decoder seam: turn raw bytes into per-frame byte planes. */
trait MediaDecoder extends Serializable {
  /** Decode to frames; a still image is one frame, video/audio many. */
  def decodeFrames(content: Array[Byte], mime: String): Iterator[Array[Byte]]
}

/** Deterministic fake: "frames" are fixed-size chunks of the payload.
  * Stands in for a video codec (the one remaining fake seam) with stable,
  * testable output; still images decode for real via [[StillImageDecoder]]. */
final class FakeDecoder(frameSize: Int = 64) extends MediaDecoder {
  def decodeFrames(content: Array[Byte], mime: String): Iterator[Array[Byte]] =
    content.grouped(frameSize)
}

/** REAL decoder for single-frame media behind the same seam: PPM/JPEG/
  * PNG/GIF/BMP payloads decode to one packed-RGB frame via
  * [[ImageOps.decodeImage]]; corrupt payloads yield zero frames rather
  * than failing the task. */
final class StillImageDecoder extends MediaDecoder {
  def decodeFrames(content: Array[Byte], mime: String): Iterator[Array[Byte]] =
    scala.util.Try(ImageOps.decodeImage(content)).toOption.flatten
      .iterator.map(_.rgb)
}

object Multimodal {

  /** Attach media metadata columns from raw binary scans
    * (`spark.read.format("binaryFile")` output or any (id, bytes) frame). */
  def asMediaTable(bin: DataFrame, idCol: String, contentCol: String,
                   kind: String, mime: String): DataFrame =
    bin.select(
      col(idCol).cast("long").as("media_id"),
      lit(kind).as("kind"),
      col(contentCol).cast("binary").as("content"),
      lit(mime).as("mime"),
      lit(0).as("width"), lit(0).as("height"))

  /** Decode + feature-extract, sampling every `frameStride`-th frame.
    * Partition-local: decoder constructed once per partition. Output drops
    * the binary payload — only compact features shuffle downstream. */
  def extractFeatures(media: Dataset[MediaRecord], decoder: MediaDecoder,
                      frameStride: Int = 2): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { rec =>
        val frames = decoder.decodeFrames(rec.content, rec.mime)
          .grouped(frameStride).map(_.head).toArray
        val bytes = rec.content
        val hist = new Array[Long](16)
        var sum = 0L
        var i = 0
        while (i < bytes.length) {
          val b = bytes(i) & 0xff
          hist(b >> 4) += 1
          sum += b
          i += 1
        }
        MediaFeatures(rec.media_id, rec.kind, bytes.length,
          if (bytes.length > 0) sum.toDouble / bytes.length else 0.0,
          hist, frames.length)
      }
    }
  }

  /** Resize stub at the plumbing level: re-chunk payload to a target frame
    * count (the real implementation rescales pixel planes at the decoder
    * seam; the Spark-side signature and batching are what's exercised). */
  def sampleFrames(media: Dataset[MediaRecord], decoder: MediaDecoder,
                   maxFrames: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { rec =>
        decoder.decodeFrames(rec.content, rec.mime).take(maxFrames).zipWithIndex
          .map { case (frame, idx) => (rec.media_id, idx, frame.length) }
      }
    }.toDF("media_id", "frame_idx", "frame_bytes")
  }
}
