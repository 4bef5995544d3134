package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ml.RfPipeline
import graft.multimodal.{FakeDecoder, MediaRecord, Multimodal}
import graft.OracleMath._

class MultimodalMlSpec extends SparkSpec {
  import spark.implicits._

  test("quality classifier learns the rule gate and is run-to-run deterministic") {
    val docs = Tables.documents(spark, sf("sf0.01"))
    val (model, auc) = graft.ml.QualityClassifier.trainOnRules(docs, "doc_id", $"text")
    assert(auc > 0.65, s"held-out AUC $auc too low")
    val s1 = graft.ml.QualityClassifier.score(model, docs.limit(100), "doc_id", $"text")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    // second fit from scratch: content-addressed split + stateless
    // features + deterministic optimizer -> identical scores
    val (model2, _) = graft.ml.QualityClassifier.trainOnRules(docs, "doc_id", $"text")
    val s2 = graft.ml.QualityClassifier.score(model2, docs.limit(100), "doc_id", $"text")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(s1 == s2)
    assert(s1.values.forall(p => p >= 0.0 && p <= 1.0))
  }

  private def mediaFixture() = {
    // binary payloads derived from the documents table (opaque bytes)
    Tables.documents(spark, sf()).limit(20)
      .select($"doc_id", encode($"text", "UTF-8").as("content"))
  }

  test("binary media table schema and feature extraction") {
    val media = Multimodal.asMediaTable(mediaFixture(), "doc_id", "content",
      kind = "image", mime = "application/octet-stream")
    assert(media.schema.fieldNames.toSeq ==
      Seq("media_id", "kind", "content", "mime", "width", "height"))
    val feats = Multimodal.extractFeatures(media.as[MediaRecord], new FakeDecoder(64))
    val rows = feats.collect()
    assert(rows.length == 20)
    assert(rows.forall(_.histogram.length == 16))
    assert(rows.forall(r => r.histogram.sum == r.n_bytes))
    assert(rows.forall(r => r.byte_mean > 0 && r.byte_mean < 255))
    // frames = ceil(n_bytes/64) sampled with stride 2
    assert(rows.forall(r =>
      r.frames_sampled == (((r.n_bytes + 63) / 64) + 1) / 2))
  }

  test("frame sampling caps frames per media") {
    val media = Multimodal.asMediaTable(mediaFixture(), "doc_id", "content",
      "video", "application/octet-stream")
    val frames = Multimodal.sampleFrames(media.as[MediaRecord], new FakeDecoder(32), maxFrames = 3)
    val counts = frames.groupBy("media_id").count().select("count").as[Long].collect()
    assert(counts.forall(_ <= 3))
    assert(frames.filter($"frame_idx" >= 3).count() == 0)
  }

  test("real PPM decode, resize, channel means, luma histogram") {
    import graft.multimodal.{ImageOps, MediaFeatureExtract}
    // 4x2 image: left half red, right half blue, plus a header comment
    def ppm(w: Int, h: Int): Array[Byte] = {
      val header = s"P6\n# synthetic\n$w $h\n255\n".getBytes("US-ASCII")
      val px = Array.tabulate(w * h * 3) { i =>
        val pixel = i / 3
        val x = pixel % w
        (i % 3) match {
          case 0 => if (x < w / 2) 255.toByte else 0.toByte // R
          case 2 => if (x >= w / 2) 255.toByte else 0.toByte // B
          case _ => 0.toByte
        }
      }
      header ++ px
    }
    val img = ImageOps.decodePpm(ppm(4, 2)).get
    assert(img.width == 4 && img.height == 2)
    val (r, g, b) = ImageOps.channelMeans(img)
    assert(r == 127.5 && g == 0.0 && b == 127.5)
    val small = ImageOps.resizeNearest(img, 2, 1)
    assert(small.rgb.toSeq == Seq(255, 0, 0, 0, 0, 255).map(_.toByte))
    assert(ImageOps.lumaHistogram(img).sum == 8)

    val df = Seq((1L, ppm(8, 8)), (2L, "not an image".getBytes("US-ASCII")))
      .toDF("media_id", "content")
    val feats = MediaFeatureExtract.imageFeatures(df, "media_id", "content",
      resizeTo = Some((4, 4))).orderBy("media_id").collect()
    assert(feats(0).getBoolean(1) && feats(0).getInt(2) == 4)
    assert(!feats(1).getBoolean(1)) // corrupt media -> null features, no crash
  }

  private def resourceBytes(path: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(path)
    try in.readAllBytes() finally in.close()
  }

  test("real PNG decode via javax.imageio: pixel-exact features") {
    import graft.multimodal.ImageOps
    // checked-in 16x16 fixture: r = x*17, g = y*17, b = ((x+y)%2)*255
    val png = resourceBytes("/graft/gradient_16x16.png")
    val p = ImageOps.decodeImage(png).get
    assert(p.width == 16 && p.height == 16)
    // PNG is lossless: decode must reproduce the generative pattern exactly
    def px(x: Int, y: Int) = {
      val o = (y * p.width + x) * 3
      (p.rgb(o) & 0xff, p.rgb(o + 1) & 0xff, p.rgb(o + 2) & 0xff)
    }
    assert(px(0, 0) == ((0, 0, 0)))
    assert(px(15, 15) == ((255, 255, 0)))
    assert(px(3, 2) == ((51, 34, 255)))
    assert(ImageOps.channelMeans(p) == ((127.5, 127.5, 127.5)))
    assert(ImageOps.lumaHistogram(p).toSeq ==
      Seq[Long](3, 5, 10, 15, 22, 24, 25, 24, 24, 28, 25, 19, 14, 9, 7, 2))
  }

  test("real JPEG decode via javax.imageio: deterministic pinned features") {
    import graft.multimodal.ImageOps
    val jpg = resourceBytes("/graft/gradient_16x16.jpg")
    val j = ImageOps.decodeImage(jpg).get
    assert(j.width == 16 && j.height == 16)
    // JPEG is lossy but the JDK decoder is deterministic: constants pinned
    // from the decode of the checked-in fixture (close to the lossless
    // 127.5 means of the source pattern)
    val (jr, jg, jb) = ImageOps.channelMeans(j)
    assert(jr == 127.48828125 && jg == 127.4921875 && jb == 127.44921875)
    assert(ImageOps.lumaHistogram(j).toSeq ==
      Seq[Long](3, 6, 7, 16, 24, 22, 26, 25, 24, 30, 20, 18, 19, 8, 7, 1))
    assert(ImageOps.lumaHistogram(j).sum == 256)
  }

  test("imageFeatures handles PPM, PNG, JPEG and corrupt rows in one frame") {
    import graft.multimodal.MediaFeatureExtract
    val png = resourceBytes("/graft/gradient_16x16.png")
    val jpg = resourceBytes("/graft/gradient_16x16.jpg")
    val ppm = ("P6\n2 2\n255\n".getBytes("US-ASCII") ++
      Array.fill(12)(100.toByte))
    val truncatedJpg = jpg.take(24) // valid magic, corrupt body
    val df = Seq((1L, png), (2L, jpg), (3L, ppm), (4L, truncatedJpg))
      .toDF("media_id", "content")
    val feats = MediaFeatureExtract.imageFeatures(df, "media_id", "content")
      .orderBy("media_id").collect()
    assert(feats(0).getBoolean(1) && feats(0).getDouble(4) == 127.5)
    assert(feats(1).getBoolean(1) && feats(1).getDouble(4) == 127.48828125)
    assert(feats(2).getBoolean(1) && feats(2).getDouble(4) == 100.0)
    assert(!feats(3).getBoolean(1)) // truncated JPEG degrades, never crashes
    // resize path applies to compressed input too
    val resized = MediaFeatureExtract.imageFeatures(
      df.filter($"media_id" === 1L), "media_id", "content",
      resizeTo = Some((4, 4))).collect()
    assert(resized(0).getInt(2) == 4 && resized(0).getInt(3) == 4)
  }

  test("StillImageDecoder serves real frames through the MediaDecoder seam") {
    import graft.multimodal.StillImageDecoder
    val png = resourceBytes("/graft/gradient_16x16.png")
    val media = Seq(
      MediaRecord(1L, "image", png, "image/png", 0, 0),
      MediaRecord(2L, "image", "garbage".getBytes, "image/png", 0, 0)
    ).toDS()
    val frames = Multimodal.sampleFrames(media, new StillImageDecoder, maxFrames = 4)
      .orderBy("media_id").collect()
    // one real RGB frame (16*16*3 bytes) for the PNG, zero for garbage
    assert(frames.length == 1)
    assert(frames(0).getLong(0) == 1L && frames(0).getInt(2) == 16 * 16 * 3)
  }

  test("adversarial media bytes degrade to decoded=false, never crash or hang") {
    import graft.multimodal.{AudioOps, ImageOps, MediaFeatureExtract}
    // PPM with dimensions whose w*h*3 overflows Int past the size guard
    val overflowPpm = "P6\n50000 50000\n255\n".getBytes("US-ASCII") ++ Array.fill(64)(1.toByte)
    assert(ImageOps.decodePpm(overflowPpm).isEmpty)
    // dimension token too long for Int
    val hugeDim = "P6\n99999999999 2\n255\n".getBytes("US-ASCII") ++ Array.fill(64)(1.toByte)
    assert(ImageOps.decodePpm(hugeDim).isEmpty)
    // WAV with a 0xFFFFFFF8 chunk length (would loop forever if added raw)
    val evilWav = {
      val bb = java.nio.ByteBuffer.allocate(64).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes); bb.putInt(56); bb.put("WAVE".getBytes)
      bb.put("junk".getBytes); bb.putInt(0xFFFFFFF8)
      bb.array()
    }
    assert(AudioOps.decodeWavPcm16(evilWav).isEmpty)
    // and through the DataFrame surface: rows survive as decoded=false
    val df = Seq((1L, overflowPpm), (2L, evilWav)).toDF("media_id", "content")
    assert(MediaFeatureExtract.imageFeatures(df, "media_id", "content")
      .filter($"decoded").count() == 0)
    assert(MediaFeatureExtract.audioFeatures(df, "media_id", "content")
      .filter($"decoded").count() == 0)
  }

  test("real WAV PCM16 decode: duration, rms, peak") {
    import graft.multimodal.{AudioOps, MediaFeatureExtract}
    def wav(rate: Int, samples: Array[Short]): Array[Byte] = {
      val dataLen = samples.length * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes); bb.putInt(36 + dataLen); bb.put("WAVE".getBytes)
      bb.put("fmt ".getBytes); bb.putInt(16); bb.putShort(1); bb.putShort(1)
      bb.putInt(rate); bb.putInt(rate * 2); bb.putShort(2); bb.putShort(16)
      bb.put("data".getBytes); bb.putInt(dataLen)
      samples.foreach(bb.putShort)
      bb.array()
    }
    // 1-second 440 Hz sine at amplitude 10000
    val rate = 8000
    val sine = Array.tabulate(rate)(i =>
      (10000 * math.sin(2 * math.Pi * 440 * i / rate)).toShort)
    val pcm = AudioOps.decodeWavPcm16(wav(rate, sine)).get
    assert(pcm.sampleRate == rate && pcm.channels == 1)
    assert(math.abs(AudioOps.rms(pcm) - 10000 / math.sqrt(2)) < 100)
    assert(AudioOps.peak(pcm) <= 10000 && AudioOps.peak(pcm) > 9900)

    val df = Seq((1L, wav(rate, sine)), (2L, Array[Byte](1, 2, 3)))
      .toDF("media_id", "content")
    val feats = MediaFeatureExtract.audioFeatures(df, "media_id", "content")
      .orderBy("media_id").collect()
    assert(feats(0).getBoolean(1) &&
      math.abs(feats(0).getDouble(4) - 1.0) < 1e-9)
    assert(!feats(1).getBoolean(1))
  }

  test("RF pipeline: target windowing, train, persist, reload, re-score") {
    val daily = Tables.orders(spark, sf())
      .groupBy(to_date($"o_orderdate").as("date"))
      .agg(dsum($"o_totalprice", 4, 2).as("close"),
        count(lit(1)).cast("double").as("n_orders"))
    val training = RfPipeline.withTarget(daily, "close", "date")
      .select($"close", $"n_orders", $"label")
    val (model, acc) = RfPipeline.train(training, Seq("close", "n_orders"))
    assert(acc >= 0.0 && acc <= 1.0)
    val path = Files.createTempDirectory("rf-model").toString + "/model"
    RfPipeline.save(model, path)
    val (acc2, sample) = RfPipeline.evaluate(path,
      RfPipeline.withTarget(daily, "close", "date").select($"close", $"n_orders", $"label"))
    assert(sample.count() <= 10)
    assert(acc2 >= 0.0 && acc2 <= 1.0)
  }

  test("real Y4M video decode: frame-exact RGB from the checked-in fixture") {
    import graft.multimodal.Y4m
    // 2 frames, 4x2, C420jpeg: quadrant colors planted at canonical BT.601
    // YUV values (red 81/90/240, white 235/128/128, black 16/128/128,
    // blue 41/240/110) — the integer transform must recover the pure RGB
    // primaries EXACTLY
    val y4m = resourceBytes("/graft/colors_4x2_2f.y4m")
    val frames = Y4m.decode(y4m).toSeq
    assert(frames.length == 2)
    assert(frames.forall(f => f.width == 4 && f.height == 2))
    def px(f: graft.multimodal.ImageOps.Rgb, x: Int, y: Int) = {
      val o = (y * f.width + x) * 3
      (f.rgb(o) & 0xff, f.rgb(o + 1) & 0xff, f.rgb(o + 2) & 0xff)
    }
    // frame 1: left 2x2 block red, right white — all rows of each block
    for (y <- 0 until 2; x <- 0 until 2) {
      assert(px(frames(0), x, y) == ((255, 0, 0)), s"f0 ($x,$y)")
      assert(px(frames(0), x + 2, y) == ((255, 255, 255)), s"f0 ($x,$y)+2")
      assert(px(frames(1), x, y) == ((0, 0, 0)), s"f1 ($x,$y)")
      assert(px(frames(1), x + 2, y) == ((0, 0, 255)), s"f1 ($x,$y)+2")
    }
    // truncated mid-frame-2: one clean frame, no error
    assert(Y4m.decode(y4m.dropRight(5)).toSeq.length == 1)
    // garbage / header-only: zero frames, never a throw
    assert(Y4m.decode("not a video".getBytes).isEmpty)
    assert(Y4m.decode("YUV4MPEG2 W4 H2 C420\n".getBytes).isEmpty)
    assert(Y4m.decode("YUV4MPEG2 W4 H3 C420\n".getBytes).isEmpty) // odd h for 420
  }

  test("Y4M colourspaces: C444 full-res chroma and Cmono grayscale") {
    import graft.multimodal.Y4m
    // C444 1x1, two frames: red then blue — per-pixel chroma, no subsampling
    val c444 = "YUV4MPEG2 W1 H1 C444\n".getBytes("US-ASCII") ++
      "FRAME\n".getBytes ++ Array[Byte](81.toByte, 90.toByte, 240.toByte) ++
      "FRAME\n".getBytes ++ Array[Byte](41.toByte, 240.toByte, 110.toByte)
    val f444 = Y4m.decode(c444).toSeq
    assert(f444.map(_.rgb.toSeq) == Seq(
      Seq[Byte](255.toByte, 0, 0), Seq[Byte](0, 0, 255.toByte)))
    // Cmono 2x1: black | white
    val mono = "YUV4MPEG2 W2 H1 Cmono\n".getBytes("US-ASCII") ++
      "FRAME\n".getBytes ++ Array[Byte](16.toByte, 235.toByte)
    assert(Y4m.decode(mono).toSeq.head.rgb.toSeq ==
      Seq[Byte](0, 0, 0, 255.toByte, 255.toByte, 255.toByte))
  }

  test("Y4M C420 decode matches an independent per-pixel recompute (random frames)") {
    import graft.multimodal.Y4m
    // seeded generator: random even dims + random planes, validated
    // against a clean-room scalar BT.601 transform — catches plane
    // offset / chroma upsampling indexing errors the corner fixtures
    // can't (different W so the cw = w/2 stride actually varies)
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 5) {
      val w = 2 * (1 + rnd.nextInt(8))
      val h = 2 * (1 + rnd.nextInt(6))
      val frames = 1 + rnd.nextInt(3)
      val header = s"YUV4MPEG2 W$w H$h F25:1 C420\n".getBytes("US-ASCII")
      val planes = (1 to frames).map { _ =>
        val y = Array.fill((w * h))(rnd.nextInt(256).toByte)
        val u = Array.fill((w / 2) * (h / 2))(rnd.nextInt(256).toByte)
        val v = Array.fill((w / 2) * (h / 2))(rnd.nextInt(256).toByte)
        (y, u, v)
      }
      val bytes = header ++ planes.flatMap { case (y, u, v) =>
        "FRAME\n".getBytes("US-ASCII") ++ y ++ u ++ v
      }
      val decoded = Y4m.decode(bytes).toSeq
      assert(decoded.length == frames)
      def clamp(x: Int) = math.max(0, math.min(255, x))
      for (((yP, uP, vP), f) <- planes.zip(decoded); py <- 0 until h; px <- 0 until w) {
        val c = 298 * ((yP(py * w + px) & 0xff) - 16)
        val ci = (py / 2) * (w / 2) + px / 2
        val d = (uP(ci) & 0xff) - 128
        val e = (vP(ci) & 0xff) - 128
        val o = (py * w + px) * 3
        assert((f.rgb(o) & 0xff) == clamp((c + 409 * e + 128) >> 8), s"R ($w x $h) ($px,$py)")
        assert((f.rgb(o + 1) & 0xff) == clamp((c - 100 * d - 208 * e + 128) >> 8), s"G ($px,$py)")
        assert((f.rgb(o + 2) & 0xff) == clamp((c + 516 * d + 128) >> 8), s"B ($px,$py)")
      }
    }
  }

  test("Y4mDecoder closes the video seam: sampleFrames is real end-to-end") {
    import graft.multimodal.Y4mDecoder
    val y4m = resourceBytes("/graft/colors_4x2_2f.y4m")
    val media = Seq((1L, y4m), (2L, Array[Byte](9, 9, 9))) // one corrupt row
      .toDF("media_id", "content")
    val typed = Multimodal.asMediaTable(media, "media_id", "content",
      "video", "video/x-yuv4mpeg").as[MediaRecord]
    val frames = Multimodal.sampleFrames(typed, new Y4mDecoder, maxFrames = 8)
      .orderBy("media_id", "frame_idx")
      .as[(Long, Int, Int)].collect().toSeq
    // 2 real frames of 4x2 packed RGB (24 bytes); corrupt row contributes none
    assert(frames == Seq((1L, 0, 24), (1L, 1, 24)))
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
