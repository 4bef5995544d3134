package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** REAL decoders for the media formats a JVM can parse with no native
  * libraries — binary PPM (P6) images, JPEG/PNG/GIF/BMP via
  * `javax.imageio`, and 16-bit PCM WAV audio — plus pixel/sample operators
  * (nearest-neighbor resize, channel means, luminance histogram,
  * RMS/peak). Only video codecs (MP4/...) remain behind the
  * [[MediaDecoder]] seam; every still-image and PCM-audio path decodes
  * real bytes end-to-end (the reference's rocket-launch pipeline feeds
  * real JPEGs — download_rocket_launches.py:33-40).
  *
  * All operators run partition-local over the binary column via
  * mapPartitions and emit only compact features — payload bytes never
  * cross a shuffle.
  */
object ImageOps {

  /** Decoded P6 image: packed RGB, row-major, 3 bytes/pixel. */
  final case class Rgb(width: Int, height: Int, rgb: Array[Byte])

  /** Parse a binary PPM (P6, maxval 255). Whitespace/comment tolerant per
    * the netpbm spec. Returns None on ANY malformed input — bad magic,
    * absurd dimensions, overflowing sizes, short payload — corrupt media
    * must not kill (or hang) a 100 TB scan. */
  def decodePpm(bytes: Array[Byte]): Option[Rgb] = {
    var i = 0
    def skipWs(): Unit = {
      var go = true
      while (go && i < bytes.length) {
        val c = bytes(i).toChar
        if (c == '#') { while (i < bytes.length && bytes(i).toChar != '\n') i += 1 }
        else if (c.isWhitespace) i += 1
        else go = false
      }
    }
    def int(): Option[Int] = {
      skipWs()
      val st = i
      while (i < bytes.length && bytes(i).toChar.isDigit) i += 1
      // > 9 digits can't be a sane dimension and would overflow toInt
      if (i == st || i - st > 9) None else Some(new String(bytes, st, i - st).toInt)
    }
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') return None
    i = 2
    for {
      w <- int()
      h <- int()
      maxv <- int()
      if maxv == 255 && w > 0 && h > 0
      // size math in Long: w*h*3 as Int silently overflows past the guard
      n = w.toLong * h * 3
      if n <= Int.MaxValue
      _ = { i += 1 } // single whitespace after maxval
      if bytes.length.toLong - i >= n
    } yield Rgb(w, h, java.util.Arrays.copyOfRange(bytes, i, i + n.toInt))
  }

  // ImageIO's default temp-file cache would write to executor-local disk
  // on every decode; disable once for the JVM before the first decode.
  private lazy val imageIoNoCache: Unit = javax.imageio.ImageIO.setUseCache(false)

  /** Decode a compressed still image (JPEG/PNG/GIF/BMP — whatever the JVM's
    * `javax.imageio` registry supports) into packed RGB. Pure-JVM, no native
    * libraries. Returns None for unrecognized or corrupt payloads — same
    * corrupt-media contract as [[decodePpm]]. */
  def decodeImageIo(bytes: Array[Byte]): Option[Rgb] = {
    imageIoNoCache
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    if (img == null) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      if (w <= 0 || h <= 0 || w.toLong * h * 3 > Int.MaxValue) None
      else {
        val out = new Array[Byte](w * h * 3)
        val row = new Array[Int](w)
        var y = 0
        while (y < h) {
          img.getRGB(0, y, w, 1, row, 0, w) // row-batched: one raster read per row
          var x = 0
          while (x < w) {
            val p = row(x)
            val d = (y * w + x) * 3
            out(d) = ((p >> 16) & 0xff).toByte
            out(d + 1) = ((p >> 8) & 0xff).toByte
            out(d + 2) = (p & 0xff).toByte
            x += 1
          }
          y += 1
        }
        Some(Rgb(w, h, out))
      }
    }
  }

  /** Format-sniffing decode: `P6` magic routes to the hand-rolled PPM
    * parser; everything else is offered to `javax.imageio` (JPEG/PNG/GIF/
    * BMP). None on anything unrecognized or corrupt — a hostile payload
    * degrades the row, never the task. */
  def decodeImage(bytes: Array[Byte]): Option[Rgb] =
    if (bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6') decodePpm(bytes)
    else scala.util.Try(decodeImageIo(bytes)).toOption.flatten

  /** Nearest-neighbor resize (the deterministic, seam-free baseline). */
  def resizeNearest(img: Rgb, tw: Int, th: Int): Rgb = {
    val out = new Array[Byte](tw * th * 3)
    var y = 0
    while (y < th) {
      val sy = y * img.height / th
      var x = 0
      while (x < tw) {
        val sx = x * img.width / tw
        val s = (sy * img.width + sx) * 3
        val d = (y * tw + x) * 3
        out(d) = img.rgb(s); out(d + 1) = img.rgb(s + 1); out(d + 2) = img.rgb(s + 2)
        x += 1
      }
      y += 1
    }
    Rgb(tw, th, out)
  }

  /** Per-channel means in [0,255]. */
  def channelMeans(img: Rgb): (Double, Double, Double) = {
    var r = 0L; var g = 0L; var b = 0L
    val n = img.width * img.height
    var i = 0
    while (i < n) {
      r += img.rgb(i * 3) & 0xff
      g += img.rgb(i * 3 + 1) & 0xff
      b += img.rgb(i * 3 + 2) & 0xff
      i += 1
    }
    (r.toDouble / n, g.toDouble / n, b.toDouble / n)
  }

  /** 16-bin luminance histogram (ITU-R 601 luma, integer arithmetic). */
  def lumaHistogram(img: Rgb): Array[Long] = {
    val hist = new Array[Long](16)
    val n = img.width * img.height
    var i = 0
    while (i < n) {
      val r = img.rgb(i * 3) & 0xff
      val g = img.rgb(i * 3 + 1) & 0xff
      val b = img.rgb(i * 3 + 2) & 0xff
      val luma = (299 * r + 587 * g + 114 * b) / 1000
      hist(luma >> 4) += 1
      i += 1
    }
    hist
  }
}

object AudioOps {

  /** Decoded PCM audio: interleaved 16-bit samples. */
  final case class Pcm(sampleRate: Int, channels: Int, samples: Array[Short])

  /** Parse a RIFF/WAVE file with 16-bit PCM data. Returns None on
    * malformed/unsupported input — a corrupt chunk length must neither
    * hang the walker (zero/negative advance) nor crash it. */
  def decodeWavPcm16(bytes: Array[Byte]): Option[Pcm] = {
    def le16(o: Int) = ((bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8))
    def le32(o: Int) = (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
      ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    def tag(o: Int) = new String(bytes, o, 4, "US-ASCII")
    if (bytes.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var o = 12
    var fmt: Option[(Int, Int)] = None // (channels, sampleRate)
    var data: Option[(Int, Int)] = None // (offset, len)
    while (o + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
      val id = tag(o)
      val len = le32(o + 4) // unsigned, as Long — never negative
      if (len > bytes.length.toLong) return None // corrupt length field
      if (id == "fmt " && o + 24 <= bytes.length) {
        val audioFormat = le16(o + 8)
        val channels = le16(o + 10)
        val rate = le32(o + 12).toInt
        val bits = le16(o + 22)
        if (audioFormat == 1 && bits == 16 && channels > 0 && rate > 0)
          fmt = Some((channels, rate))
      } else if (id == "data") {
        data = Some((o + 8, math.min(len, bytes.length.toLong - o - 8).toInt))
      }
      o += 8 + len.toInt + (len.toInt & 1) // chunks are word-aligned
    }
    for ((ch, rate) <- fmt; (off, len) <- data if len >= 0) yield {
      val n = len / 2
      val samples = new Array[Short](n)
      var i = 0
      while (i < n) {
        samples(i) = ((bytes(off + 2 * i) & 0xff) |
          ((bytes(off + 2 * i + 1) & 0xff) << 8)).toShort
        i += 1
      }
      Pcm(rate, ch, samples)
    }
  }

  def rms(p: Pcm): Double = {
    if (p.samples.isEmpty) return 0.0
    var acc = 0.0
    var i = 0
    while (i < p.samples.length) { acc += p.samples(i).toDouble * p.samples(i); i += 1 }
    math.sqrt(acc / p.samples.length)
  }

  def peak(p: Pcm): Int = {
    var m = 0
    var i = 0
    while (i < p.samples.length) { m = math.max(m, math.abs(p.samples(i).toInt)); i += 1 }
    m
  }
}

/** DataFrame-level transforms over binary media columns using the real
  * decoders. Rows that fail to decode yield null features rather than
  * failing the scan (corrupt-media tolerance at 100 TB). */
object MediaFeatureExtract {

  /** Still images (PPM via the hand-rolled parser; JPEG/PNG/GIF/BMP via
    * `javax.imageio`): decode → optional nearest-neighbor resize → channel
    * means + 16-bin luminance histogram. */
  def imageFeatures(df: DataFrame, idCol: String, contentCol: String,
                    resizeTo: Option[(Int, Int)] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(contentCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          // scala.util.Try: whatever a hostile payload does to the
          // parser, the row degrades to decoded=false, never a task kill
          scala.util.Try(ImageOps.decodeImage(bytes)).toOption.flatten match {
            case Some(img0) =>
              val img = resizeTo.map { case (w, h) =>
                ImageOps.resizeNearest(img0, w, h) }.getOrElse(img0)
              val (r, g, b) = ImageOps.channelMeans(img)
              (id, true, img.width, img.height, r, g, b, ImageOps.lumaHistogram(img))
            case None =>
              (id, false, 0, 0, 0.0, 0.0, 0.0, null.asInstanceOf[Array[Long]])
          }
        }
      }
      .toDF("media_id", "decoded", "width", "height",
        "mean_r", "mean_g", "mean_b", "luma_hist")
  }

  /** WAV audio: decode → duration / RMS / peak. */
  def audioFeatures(df: DataFrame, idCol: String, contentCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(contentCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          scala.util.Try(AudioOps.decodeWavPcm16(bytes)).toOption.flatten match {
            case Some(pcm) =>
              val secs = pcm.samples.length.toDouble / (pcm.sampleRate * pcm.channels)
              (id, true, pcm.sampleRate, pcm.channels, secs,
                AudioOps.rms(pcm), AudioOps.peak(pcm))
            case None => (id, false, 0, 0, 0.0, 0.0, 0)
          }
        }
      }
      .toDF("media_id", "decoded", "sample_rate", "channels",
        "duration_s", "rms", "peak")
  }
}
