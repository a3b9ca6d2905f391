package graft

import graft.sources.Staging
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class StagingSpec extends SparkSuite {
  import spark.implicits._

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_staging").toString

  private def batchDf(ids: Range, ver: Long): DataFrame =
    ids.map(i => (i.toLong, ver, s"v$i-$ver")).toDF("k", "ver", "v")

  test("stage commits data + manifest with rows and tracking watermark") {
    val dir = tmpDir()
    val m = Staging.stage(batchDf(1 to 100, 3L), dir, "b1",
      trackingCol = Some("ver"))
    assert(m === Staging.readManifest(spark, dir, "b1"))
    assert(m.rows === 100L)
    assert(m.watermark === Some("3"))
    assert(Staging.isStaged(spark, dir, "b1"))
    assert(!Staging.isLoaded(spark, dir, "b1"))
    assert(Staging.readStaged(spark, dir, "b1").count() === 100)
  }

  test("a kill between extract and load resumes WITHOUT re-extracting") {
    val dir = tmpDir()
    Staging.stage(batchDf(1 to 50, 1L), dir, "b1")
    // --- simulated kill + restart: the source has moved on, but the
    // batch is manifest-committed, so the re-run must NOT re-extract
    val m2 = Staging.stage(batchDf(1 to 500, 9L), dir, "b1")
    assert(m2.rows === 50L) // the ORIGINAL manifest, not a re-extract
    assert(Staging.readStaged(spark, dir, "b1").count() === 50)
    assert(Staging.readStaged(spark, dir, "b1")
      .agg(max(col("ver"))).head().getLong(0) === 1L)
  }

  test("a kill MID-extract leaves no manifest; the re-run re-extracts over the leftovers") {
    val dir = tmpDir()
    // simulate: data files landed but the job died before the
    // manifest commit
    batchDf(1 to 30, 1L).write.parquet(s"$dir/b1/data")
    assert(!Staging.isStaged(spark, dir, "b1"))
    intercept[IllegalArgumentException] {
      Staging.readStaged(spark, dir, "b1") // half-extracted never loads
    }
    val m = Staging.stage(batchDf(1 to 80, 2L), dir, "b1")
    assert(m.rows === 80L) // fresh extract replaced the garbage
    assert(Staging.readStaged(spark, dir, "b1").count() === 80)
  }

  test("pending lists staged-not-loaded batches; loadStaged is idempotent") {
    val dir = tmpDir()
    Staging.stage(batchDf(1 to 10, 1L), dir, "b1")
    Staging.stage(batchDf(11 to 20, 1L), dir, "b2")
    assert(Staging.pending(spark, dir) === Seq("b1", "b2"))

    var loads = 0
    assert(Staging.loadStaged(spark, dir, "b1") { df =>
      loads += 1; assert(df.count() === 10)
    })
    assert(Staging.pending(spark, dir) === Seq("b2"))
    // replay after a crash-after-load: marker short-circuits
    assert(!Staging.loadStaged(spark, dir, "b1") { _ => loads += 1 })
    assert(loads === 1)
  }

  test("end-to-end restartable extract/load onto an upsert target") {
    val dir = tmpDir()
    val target = s"${tmpDir()}/target"
    def runPipeline(source: DataFrame, batchId: String): Unit = {
      Staging.stage(source, dir, batchId, trackingCol = Some("ver"))
      Staging.pending(spark, dir).foreach { b =>
        Staging.loadStaged(spark, dir, b) { df =>
          if (!new java.io.File(target).exists()) df.write.parquet(target)
          else graft.sources.Sink.upsert(spark, target, df, Seq("k"), "ver")
        }
      }
    }
    runPipeline(batchDf(1 to 100, 1L), "day1")
    assert(spark.read.parquet(target).count() === 100)
    // run 2 stages, "crashes" before loading, then the full pipeline
    // re-runs: day2 must not re-extract, must load exactly once
    Staging.stage(batchDf(50 to 150, 2L), dir, "day2")
    runPipeline(batchDf(50 to 150, 99L), "day2") // source moved on → ignored
    val t = spark.read.parquet(target)
    assert(t.count() === 150)
    // overlapping keys took the day2 extract's version, not the
    // moved-on source's
    assert(t.filter(col("k") === 70L).head().getLong(1) === 2L)
    assert(t.filter(col("k") === 10L).head().getLong(1) === 1L)
    // full replay of both days is a no-op
    runPipeline(batchDf(1 to 100, 77L), "day1")
    assert(spark.read.parquet(target).count() === 150)
  }
}
