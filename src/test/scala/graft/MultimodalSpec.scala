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
