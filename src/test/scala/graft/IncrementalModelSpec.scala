package graft

import graft.pipeline.IncrementalModel

class IncrementalModelSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("bootstrap, append only the delta, and no-op when nothing is new") {
    val target = tmpDir("incr") + "/t"
    val day1 = Seq((1L, ts("2024-01-01 00:00:00")), (2L, ts("2024-01-02 00:00:00")))
      .toDF("k", "updated_at")
    assert(IncrementalModel.run(spark, day1, target, "updated_at") === 2L)
    // source grew: one old row (already loaded) + two new ones
    val day2 = day1.unionByName(
      Seq((3L, ts("2024-01-03 00:00:00")), (4L, ts("2024-01-04 00:00:00")))
        .toDF("k", "updated_at"))
    assert(IncrementalModel.run(spark, day2, target, "updated_at") === 2L)
    // re-run with no new data: idempotent no-op
    assert(IncrementalModel.run(spark, day2, target, "updated_at") === 0L)
    val out = spark.read.parquet(target)
    assert(out.count() === 4)
    assert(out.select("k").as[Long].collect().sorted.toSeq === Seq(1L, 2L, 3L, 4L))
  }
}
