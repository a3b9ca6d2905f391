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
}
