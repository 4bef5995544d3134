package graft.multimodal

/** REAL video decode for YUV4MPEG2 (.y4m) — the uncompressed interchange
  * format every video toolchain (ffmpeg, x264, mjpegtools) reads and
  * writes, and the one true VIDEO format a bare JVM can parse with no
  * native codec. Closes the video side of the [[MediaDecoder]] seam:
  * multi-frame media now decodes real bytes end-to-end ([[Y4mDecoder]]),
  * leaving only compressed codecs (MP4/H.264/VP9), which require native
  * libraries, as the documented permanent seam.
  *
  * Format (public spec, mjpegtools yuv4mpeg(5)): an ASCII stream header
  * `YUV4MPEG2 W<w> H<h> F<n>:<d> [I? A? C<cs> X?]\n`, then per frame an
  * ASCII `FRAME[ params]\n` marker followed by raw planar YUV whose size
  * is fixed by the header (C420*: Y w·h + U,V (w/2)·(h/2); C422: U,V
  * (w/2)·h; C444: three full planes; Cmono: Y only).
  *
  * Frames convert to packed RGB via the ITU-R BT.601 limited-range
  * integer transform (the fixed-point form used across the open-source
  * video stack), with nearest-neighbor chroma upsampling for the
  * subsampled colourspaces. Corrupt-media contract matches
  * [[ImageOps.decodePpm]]: a malformed header yields zero frames and a
  * truncated/garbled frame ends the iterator — a hostile payload degrades
  * the row, never the task.
  */
object Y4m {

  final case class Header(width: Int, height: Int, colorspace: String,
                          dataStart: Int)

  private def clamp(v: Int): Byte =
    (if (v < 0) 0 else if (v > 255) 255 else v).toByte

  /** Bytes per frame payload for a supported colourspace; None rejects
    * unsupported spaces and odd dimensions where subsampling demands even. */
  private def frameBytes(w: Int, h: Int, cs: String): Option[Int] = {
    val wh = w.toLong * h
    val n: Option[Long] = cs match {
      case "C420" | "C420jpeg" | "C420mpeg2" | "C420paldv" =>
        if (w % 2 == 0 && h % 2 == 0) Some(wh + 2L * (w / 2) * (h / 2)) else None
      case "C422" => if (w % 2 == 0) Some(wh + 2L * (w / 2) * h) else None
      case "C444" => Some(3L * wh)
      case "Cmono" => Some(wh)
      case _ => None
    }
    n.filter(v => v > 0 && v <= Int.MaxValue).map(_.toInt)
  }

  /** Parse the stream header. None on anything malformed. */
  def header(bytes: Array[Byte]): Option[Header] = {
    val magic = "YUV4MPEG2"
    if (bytes.length < magic.length + 1) return None
    if (!magic.getBytes("US-ASCII").indices.forall(i => bytes(i) == magic.charAt(i))) return None
    val nl = bytes.indexOf('\n'.toByte)
    if (nl < 0 || nl > 512) return None // sane header bound
    val params = new String(bytes, magic.length, nl - magic.length, "US-ASCII")
      .trim.split("\\s+").filter(_.nonEmpty)
    def num(tag: Char): Option[Int] = params.find(_.startsWith(tag.toString))
      .map(_.drop(1)).filter(s => s.nonEmpty && s.length <= 5 && s.forall(_.isDigit))
      .map(_.toInt).filter(_ > 0)
    for {
      w <- num('W')
      h <- num('H')
      cs = params.find(_.startsWith("C")).getOrElse("C420")
      if frameBytes(w, h, cs).isDefined
      if w.toLong * h * 3 <= Int.MaxValue
    } yield Header(w, h, cs, nl + 1)
  }

  /** Decode all frames lazily. Zero frames for a malformed header; a
    * truncated or garbled frame ends the iterator early. */
  def decode(bytes: Array[Byte]): Iterator[ImageOps.Rgb] = header(bytes) match {
    case None => Iterator.empty
    case Some(hd) =>
      val fb = frameBytes(hd.width, hd.height, hd.colorspace).get
      val marker = "FRAME".getBytes("US-ASCII")
      new Iterator[ImageOps.Rgb] {
        private var pos = hd.dataStart
        private var nextFrame: ImageOps.Rgb = _
        private var done = false
        private def advance(): Unit = {
          nextFrame = null
          if (done) return
          // FRAME marker + optional params, '\n'-terminated
          if (pos + marker.length > bytes.length ||
              !marker.indices.forall(i => bytes(pos + i) == marker(i))) { done = true; return }
          var nl = pos + marker.length
          while (nl < bytes.length && bytes(nl) != '\n'.toByte &&
                 nl - pos < 512) nl += 1
          if (nl >= bytes.length || bytes(nl) != '\n'.toByte) { done = true; return }
          val start = nl + 1
          // subtraction form: `start + fb` can overflow Int on a ~2 GB
          // hostile payload and bypass the truncation check
          if (fb > bytes.length - start) { done = true; return }
          nextFrame = toRgb(bytes, start, hd)
          pos = start + fb
        }
        advance()
        def hasNext: Boolean = nextFrame != null
        def next(): ImageOps.Rgb = {
          if (!hasNext) throw new NoSuchElementException("y4m: no more frames")
          val f = nextFrame; advance(); f
        }
      }
  }

  /** Planar YUV → packed RGB, BT.601 limited-range fixed-point, nearest
    * chroma upsampling. */
  private def toRgb(bytes: Array[Byte], off: Int, hd: Header): ImageOps.Rgb = {
    val (w, h) = (hd.width, hd.height)
    val out = new Array[Byte](w * h * 3)
    val mono = hd.colorspace == "Cmono"
    val uOff = off + w * h
    val (cw, vOff) = hd.colorspace match {
      case "C444" => (w, uOff + w * h)
      case "C422" => (w / 2, uOff + (w / 2) * h)
      case _      => (w / 2, uOff + (w / 2) * (h / 2)) // C420*, Cmono unused
    }
    var y = 0
    while (y < h) {
      val cy = hd.colorspace match {
        case "C444" | "C422" => y
        case _               => y / 2
      }
      var x = 0
      while (x < w) {
        val yy = bytes(off + y * w + x) & 0xff
        val c = 298 * (yy - 16)
        val d3 = (y * w + x) * 3
        if (mono) {
          val g = clamp((c + 128) >> 8)
          out(d3) = g; out(d3 + 1) = g; out(d3 + 2) = g
        } else {
          val ci = cy * cw + (if (cw == w) x else x / 2)
          val d = (bytes(uOff + ci) & 0xff) - 128
          val e = (bytes(vOff + ci) & 0xff) - 128
          out(d3) = clamp((c + 409 * e + 128) >> 8)
          out(d3 + 1) = clamp((c - 100 * d - 208 * e + 128) >> 8)
          out(d3 + 2) = clamp((c + 516 * d + 128) >> 8)
        }
        x += 1
      }
      y += 1
    }
    ImageOps.Rgb(w, h, out)
  }
}

/** REAL multi-frame decoder behind the [[MediaDecoder]] seam: Y4M video
  * payloads decode frame-by-frame to packed RGB. Same corrupt-media
  * contract as [[StillImageDecoder]]. */
final class Y4mDecoder extends MediaDecoder {
  def decodeFrames(content: Array[Byte], mime: String): Iterator[Array[Byte]] =
    Y4m.decode(content).map(_.rgb)
}
