package graft.examples

import graft.multimodal.Multimodal
import graft.streaming.{Event, EventStream}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.OutputMode

/** End-to-end demo of the streaming + multimodal modules, as a user
  * of the library would wire them: land event files into a directory,
  * run the continuous CDC pipeline over it (dedup → sessions, hourly
  * rollup), then batch-extract features from binary media columns.
  *
  * Run: `sbt "runMain graft.examples.StreamingDemo"`
  */
object StreamingDemo {
  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-streaming-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val src = java.nio.file.Files.createTempDirectory("demo-events").toString
    def land(name: String, events: Seq[Event]): Unit = {
      val staging = java.nio.file.Files.createTempDirectory("demo-stage").toString
      events.toDS().toDF().coalesce(1).write.mode("overwrite").parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(src, s"$name.parquet"))
    }

    // batch 1: user 42 browses, one duplicate delivery, then a gap
    land("b0", Seq(
      Event(1L, ts("2024-03-01 09:00:00"), 42L, "click", 1.0),
      Event(1L, ts("2024-03-01 09:00:00"), 42L, "click", 1.0), // dup delivery
      Event(2L, ts("2024-03-01 09:05:00"), 42L, "click", 1.0),
      Event(3L, ts("2024-03-01 10:30:00"), 42L, "purchase", 99.0)))

    val sessions = EventStream.sessions(
      EventStream.dedup(EventStream.read(spark, src), watermark = "1 hour"),
      gapSeconds = 1800, watermark = "30 minutes")
    val q = sessions.writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("demo-ckpt").toString)
      .start()
    q.processAllAvailable()

    // batch 2: a much later event advances the watermark → the open
    // session times out and is emitted
    land("b1", Seq(Event(9L, ts("2024-03-01 23:00:00"), 7L, "click", 1.0)))
    q.processAllAvailable()
    q.stop()

    println("=== sessions (user 42: 2 sessions; dup event_id=1 collapsed) ===")
    spark.table("sessions").orderBy("session_start").show(truncate = false)

    println("=== multimodal: features from binary media columns ===")
    val media = Multimodal.synth(spark, 6)
    Multimodal.extractFeatures(media)
      .select("media_id", "media_type", "n_bytes", "byte_entropy")
      .orderBy("media_id").show(truncate = false)
    Multimodal.frameSample(media, everyMs = 500)
      .groupBy("media_id").count().orderBy("media_id").show()

    spark.stop()
  }
}
