package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One media asset: opaque bytes + typed metadata. */
case class MediaRow(media_id: Long, media_type: String, content: Array[Byte],
                    width: Int, height: Int, duration_ms: Long)

/** Decoded/derived features for one asset. */
case class MediaFeatures(media_id: Long, media_type: String,
                         n_bytes: Long, byte_entropy: Double,
                         features: Array[Float])

/** Multimodal columns for a training-data pipeline: image/audio/video
  * as opaque `binary` columns with typed metadata, processed in
  * batches per partition.
  *
  * The Spark-side plumbing is real and load-bearing at 100 TB:
  *  - assets travel as parquet `binary` columns, co-partitioned by id
  *    so downstream joins to text/embedding tables shuffle once;
  *  - per-row feature extraction runs via `Dataset.mapPartitions`
  *    (the Scala analog of `mapInPandas`: one batch of rows per task,
  *    codec state initialized once per partition, not per row);
  *  - output schema is fixed `(id, type, stats, array<float>)` so the
  *    result feeds Similarity/Dedup unchanged.
  *
  * STUB: a real deployment plugs an image/audio codec into
  * [[decodeStub]]. No codec library ships in this container, so
  * decode is a clearly-marked deterministic fake (byte histogram as
  * "pixels") — the schema, batching, and partition flow around it are
  * exactly what the real codec would see.
  */
object Multimodal {

  val schema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("media_type", StringType),
    StructField("content", BinaryType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  /** Deterministic synthetic assets (tests / local dev): content bytes
    * are a fixed function of (media_id, byte index).
    */
  def synth(spark: SparkSession, n: Int, bytesPerAsset: Int = 256): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n.toLong).map { i =>
      val id = i
      val content = Array.tabulate(bytesPerAsset)(j => ((id * 131 + j * 31 + 7) % 251).toByte)
      val mt = (id % 3) match { case 0 => "image"; case 1 => "audio"; case _ => "video" }
      MediaRow(id, mt, content, 64 + (id % 16).toInt, 64 + (id % 9).toInt,
        if (mt == "image") 0L else 1000L + id * 40L)
    }
  }

  /** STUB decode — stands in for the real codec call. Deterministic:
    * 16-bin byte histogram normalized to unit L1, so tests can pin
    * exact values. A real build replaces ONLY this function body with
    * e.g. an ImageIO/ffmpeg call producing the same
    * `Array[Float]` feature shape.
    */
  def decodeStub(content: Array[Byte]): Array[Float] = {
    val bins = new Array[Float](16)
    var i = 0
    while (i < content.length) {
      bins((content(i) & 0xff) >> 4) += 1f
      i += 1
    }
    val total = math.max(1, content.length).toFloat
    bins.map(_ / total)
  }

  /** Shannon entropy of the byte distribution — a content-opacity
    * metric (compressed/encrypted media ≈ 8 bits) that needs no codec.
    */
  private def byteEntropy(content: Array[Byte]): Double = {
    if (content.isEmpty) return 0.0
    val counts = new Array[Long](256)
    content.foreach(b => counts(b & 0xff) += 1)
    val n = content.length.toDouble
    counts.foldLeft(0.0) { (acc, c) =>
      if (c == 0) acc else acc - (c / n) * (math.log(c / n) / math.log(2))
    }
  }

  /** Batch feature extraction: one decode pass per partition (codec
    * init happens once per task here, before the row loop).
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real codecs initialize here (once per partition, not per row)
      rows.map { r =>
        MediaFeatures(r.media_id, r.media_type, r.content.length.toLong,
          byteEntropy(r.content), decodeStub(r.content))
      }
    }
  }

  /** "Resize" an image asset — STUB: real impl decodes, scales,
    * re-encodes; the fake keeps a deterministic byte slice so the
    * plumbing (binary in → binary out, metadata updated) is testable.
    */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { r =>
      if (r.media_type != "image") r
      else r.copy(content = r.content.take(math.max(1, w * h / 16)),
        width = w, height = h)
    }
  }

  /** Sample every `everyMs` frames from video assets — STUB decode;
    * real frame extraction replaces the inner loop. One output row per
    * sampled frame, schema (media_id, frame_no, frame binary).
    */
  def frameSample(media: Dataset[MediaRow], everyMs: Long): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.media_type == "video")
      .flatMap { r =>
        val n = math.max(1L, r.duration_ms / everyMs)
        (0L until n).map { f =>
          // stub frame bytes: deterministic slice keyed by frame number
          val off = ((f * 17) % math.max(1, r.content.length)).toInt
          (r.media_id, f, r.content.drop(off).take(32))
        }
      }
      .toDF("media_id", "frame_no", "frame")
  }
}
