package graft

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSuite {

  test("synth → extractFeatures: fixed schema, deterministic values, unit-L1 histogram") {
    val media = Multimodal.synth(spark, 30)
    val feats = Multimodal.extractFeatures(media)
    assert(feats.schema.fieldNames.toSeq ===
      Seq("media_id", "media_type", "n_bytes", "byte_entropy", "features"))
    val rows = feats.collect().sortBy(_.media_id)
    assert(rows.length === 30)
    rows.foreach { r =>
      assert(r.features.length === 16)
      assert(math.abs(r.features.sum - 1.0f) < 1e-4)
      assert(r.byte_entropy > 0.0 && r.byte_entropy <= 8.0)
    }
    // deterministic across runs
    val again = Multimodal.extractFeatures(Multimodal.synth(spark, 30))
      .collect().sortBy(_.media_id)
    assert(rows.map(_.features.toSeq).toSeq === again.map(_.features.toSeq).toSeq)
  }

  test("resize only touches image rows and updates metadata") {
    val media = Multimodal.synth(spark, 12)
    val out = Multimodal.resize(media, 32, 32).collect().sortBy(_.media_id)
    out.foreach { r =>
      if (r.media_type == "image") assert(r.width === 32 && r.height === 32)
      else assert(r.content.length === 256) // untouched
    }
  }

  test("REAL image path: PNG bytes decode to channel means + luminance histogram") {
    import graft.multimodal.MediaRow
    import spark.implicits._
    // an 8x4 pure-red PNG built with the same JDK codec users would feed
    def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val red = MediaRow(1L, "image", png(8, 4, 0xff0000), 8, 4, 0L)
    val feats = Multimodal.extractFeatures(Seq(red).toDS()).collect()(0)
    assert(feats.features.length === 19) // 3 channel means + 16 lum bins
    assert(math.abs(feats.features(0) - 1.0f) < 1e-3) // mean R
    assert(feats.features(1) === 0.0f && feats.features(2) === 0.0f)
    // luminance of pure red = 76 → bin 4 (index 3 + 1 + 4 - 1 = 7)
    assert(feats.features(3 + 4) === 1.0f)
    // direct decode agrees on dimensions
    assert(Multimodal.decodeImage(red.content).map(d => (d._1, d._2)) === Some((8, 4)))
  }

  test("REAL image path: resize re-encodes to the target dimensions") {
    import graft.multimodal.MediaRow
    import spark.implicits._
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until h).foreach(y => (0 until w).foreach(x =>
        img.setRGB(x, y, if ((x + y) % 2 == 0) 0xffffff else 0)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val in = Seq(MediaRow(1L, "image", png(16, 16), 16, 16, 0L)).toDS()
    val out = Multimodal.resize(in, 4, 8).collect()(0)
    assert(out.width === 4 && out.height === 8)
    // the resized CONTENT is a real PNG of the new size, not a stub slice
    assert(Multimodal.decodeImage(out.content).map(d => (d._1, d._2)) === Some((4, 8)))
  }

  test("frameSample emits one row per sampled frame of video assets only") {
    val media = Multimodal.synth(spark, 12) // ids ≡ 2 (mod 3) are video
    val frames = Multimodal.frameSample(media, everyMs = 500)
    val byId = frames.collect().groupBy(_.getLong(0))
    assert(byId.keySet.forall(_ % 3 == 2))
    val videos = media.collect().filter(_.media_type == "video")
    videos.foreach { v =>
      assert(byId(v.media_id).length === math.max(1L, v.duration_ms / 500).toInt)
    }
  }

  private def jpeg(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  test("REAL video path: MJPEG-AVI frames parse, decode, and drive features") {
    import graft.multimodal.MediaRow
    import spark.implicits._
    val avi = Multimodal.synthMjpegAvi(Seq(jpeg(16, 8, 0xff0000), jpeg(16, 8, 0x0000ff)))
    // the RIFF walk finds both JPEG payloads and the 25 fps cadence
    val Some((us, fs)) = Multimodal.parseAviMjpegFrames(avi)
    assert(us === 40000L && fs.length === 2)
    fs.foreach { f =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f))
      assert(img.getWidth === 16 && img.getHeight === 8)
    }
    val row = MediaRow(7L, "video", avi, 16, 8, 80L)
    // everyMs = frame cadence → every frame; 2x cadence → every other
    val all = Multimodal.frameSample(Seq(row).toDS(), everyMs = 40)
      .collect().map(r => (r.getLong(1), r.getAs[Array[Byte]](2)))
    assert(all.map(_._1).toSeq === Seq(0L, 1L))
    assert(all.forall { case (_, bytes) =>
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)) != null })
    assert(Multimodal.frameSample(Seq(row).toDS(), everyMs = 80)
      .collect().map(_.getLong(1)).toSeq === Seq(0L))
    // features: [nFrames, fps, w, h] ++ first-frame (red) image features
    val feats = Multimodal.extractFeatures(Seq(row).toDS()).collect()(0).features
    assert(feats.length === 4 + 19)
    assert(feats(0) === 2.0f && math.abs(feats(1) - 25.0f) < 1e-3)
    assert(feats(2) === 16.0f && feats(3) === 8.0f)
    assert(feats(4) > 0.9f && feats(6) < 0.1f) // meanR dominates meanB
    // a non-AVI video row still takes the stub path (unchanged schema)
    val stub = MediaRow(8L, "video", Array.tabulate(64)(_.toByte), 0, 0, 80L)
    assert(Multimodal.extractFeatures(Seq(stub).toDS()).collect()(0)
      .features.length === 16)
  }

  /** 16-bit signed little-endian mono PCM WAV: a sine at amplitude
    * `amp`, built with the same JDK codec (`AudioSystem.write`) users
    * would feed in.
    */
  private def sineWav(sampleRate: Float, seconds: Double, amp: Double,
                      freqHz: Double = 440.0): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val n = (sampleRate * seconds).toInt
    val pcm = new Array[Byte](n * 2)
    (0 until n).foreach { i =>
      val v = (amp * math.sin(2 * math.Pi * freqHz * i / sampleRate) * 32767).toInt
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(sampleRate, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("REAL audio path: PCM WAV decodes to rate/channels/duration and known RMS") {
    val wav = sineWav(16000f, 0.5, amp = 0.5)
    val (rate, channels, durMs, feats) =
      Multimodal.decodeAudio(wav).getOrElse(fail("WAV did not decode"))
    assert(rate === 16000f && channels === 1)
    assert(math.abs(durMs - 500L) <= 1L)
    // features = [durSec, rate, channels, rms, peak] ++ 16-bin amp hist
    assert(feats.length === 5 + 16)
    // sine RMS = amp/sqrt(2)
    assert(math.abs(feats(3) - 0.5 / math.sqrt(2)) < 1e-3, s"rms=${feats(3)}")
    assert(math.abs(feats(4) - 0.5) < 1e-3, s"peak=${feats(4)}")
    assert(math.abs(feats.drop(5).sum - 1.0f) < 1e-4) // unit-L1 histogram
    // amplitude never exceeds 0.5 → upper half of the histogram empty
    assert(feats.drop(5).drop(8).forall(_ === 0f))

    // garbage bytes degrade to None, not an exception
    assert(Multimodal.decodeAudio(Array.tabulate(64)(_.toByte)).isEmpty)

    // extractFeatures routes audio rows through the real decoder
    import graft.multimodal.MediaRow
    import spark.implicits._
    val media = spark.createDataset(Seq(
      MediaRow(1L, "audio", wav, 0, 0, 500L),
      MediaRow(2L, "audio", Array.tabulate(64)(_.toByte), 0, 0, 100L)))
    val out = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(out(0).features.length === 21) // real decode
    assert(math.abs(out(0).features(3) - 0.5 / math.sqrt(2)) < 1e-3)
    assert(out(1).features.length === 16) // stub fallback
  }

  test("parseVideoMeta walks MP4 boxes: duration, video-track resolution, codec, brand") {
    val mp4 = Multimodal.synthMp4(timescale = 1000, duration = 5400L, w = 640, h = 360,
      codec = "avc1")
    val meta = Multimodal.parseVideoMeta(mp4)
    assert(meta === Some(graft.multimodal.VideoMeta(5400L, 640, 360, "avc1", "isom")))
    // the audio trak (zero visual size, mp4a entry) must not win

    // 64-bit mvhd (version 1) parses too, with ms conversion
    val v1 = Multimodal.synthMp4(timescale = 90000, duration = 90000L * 7 + 45000L,
      w = 1920, h = 1080, codec = "hev1", mvhdV1 = true)
    assert(Multimodal.parseVideoMeta(v1) ===
      Some(graft.multimodal.VideoMeta(7500L, 1920, 1080, "hev1", "isom")))

    // non-BMFF bytes degrade to None, never throw
    assert(Multimodal.parseVideoMeta(Array.tabulate(256)(_.toByte)).isEmpty)
    assert(Multimodal.parseVideoMeta(Array.emptyByteArray).isEmpty)
    // truncated header: size field pointing past the buffer
    assert(Multimodal.parseVideoMeta(mp4.take(10)).isEmpty)
  }

  test("videoMetadata: parsed MP4 fields for real containers, declared fallback otherwise") {
    import graft.multimodal.MediaRow
    import spark.implicits._
    val mp4 = Multimodal.synthMp4(1000, 2500L, 320, 240, "avc1")
    val media = spark.createDataset(Seq(
      MediaRow(1L, "video", mp4, 0, 0, 0L),
      MediaRow(2L, "video", Array.tabulate(64)(_.toByte), 100, 50, 4000L),
      MediaRow(3L, "image", mp4, 10, 10, 0L))) // not a video row → excluded
    val out = Multimodal.videoMetadata(media).collect().sortBy(_.getLong(0))
    assert(out.length === 2)
    assert(out(0).toSeq === Seq(1L, 2500L, 320, 240, "avc1", "isom", true))
    assert(out(1).toSeq === Seq(2L, 4000L, 100, 50, "", "", false))

    // extractFeatures prefixes real [durSec, w, h] for parseable video
    val feats = Multimodal.extractFeatures(media.filter(_.media_type == "video"))
      .collect().sortBy(_.media_id)
    assert(feats(0).features.length === 19)
    assert(feats(0).features.take(3).toSeq === Seq(2.5f, 320f, 240f))
    assert(feats(1).features.length === 16) // junk bytes → stub only
  }

  test("synthBmp round-trips through ImageIO pixel-exact") {
    val bytes = Multimodal.synthBmp(8, 8, (x, y) => (x * 16 + y * 2) % 256)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img.getWidth === 8 && img.getHeight === 8)
    for (y <- 0 until 8; x <- 0 until 8) {
      val p = img.getRGB(x, y)
      val expected = (x * 16 + y * 2) % 256
      assert((p & 0xff) === expected, s"pixel ($x,$y)")
      assert(((p >> 8) & 0xff) === expected)
      assert(((p >> 16) & 0xff) === expected)
    }
  }

  test("averageHash64: hand-computed mask, 2x scale invariance, decode-failure None") {
    // top 4 rows black (0), bottom 4 rows white (255): mean 127.5,
    // bits set exactly on the bottom 32 cells (row-major packing)
    val half = Multimodal.synthBmp(8, 8, (_, y) => if (y < 4) 0 else 255)
    assert(Multimodal.averageHash64(half) === Some(0xFFFFFFFF00000000L))
    // the same pattern painted at 16x16 block-averages to identical
    // cells — the re-upload invariance the dedup key grades
    val half2x = Multimodal.synthBmp(16, 16, (_, y) => if (y < 8) 0 else 255)
    assert(Multimodal.averageHash64(half2x) === Some(0xFFFFFFFF00000000L))
    val cls = 7
    def base(x: Int, y: Int): Int = ((y * 8 + x) * (2 * cls + 3) + cls * 17) % 256
    assert(Multimodal.averageHash64(Multimodal.synthBmp(8, 8, base)) ===
      Multimodal.averageHash64(Multimodal.synthBmp(16, 16,
        (x, y) => base(x / 2, y / 2))))
    assert(Multimodal.averageHash64("not an image".getBytes) === None)
    assert(Multimodal.averageHash64(Multimodal.synthBmp(4, 4, (_, _) => 9))
      === None) // below the 8x8 grid floor
  }

  test("imageDedup: the 23 graded pattern classes hash distinctly and group exactly") {
    val hashes = (0 until 23).map { cls =>
      def base(x: Int, y: Int): Int = ((y * 8 + x) * (2 * cls + 3) + cls * 17) % 256
      Multimodal.averageHash64(Multimodal.synthBmp(8, 8, base)).get
    }
    assert(hashes.distinct.length === 23,
      "graded classes must not collide under aHash")
    import spark.implicits._
    val media = spark.createDataset((0L until 46L).map { id =>
      val cls = (id % 23).toInt
      def base(x: Int, y: Int): Int = ((y * 8 + x) * (2 * cls + 3) + cls * 17) % 256
      val px = if (id % 2 == 0) Multimodal.synthBmp(8, 8, base)
        else Multimodal.synthBmp(16, 16, (x, y) => base(x / 2, y / 2))
      graft.multimodal.MediaRow(id, "image", px, 0, 0, 0L)
    })
    val out = Multimodal.imageDedup(media).collect()
    assert(out.length === 23)
    assert(out.map(_.getLong(0)).toSeq === (0L until 23L))
    assert(out.forall(_.getLong(1) === 2L))
  }
}
