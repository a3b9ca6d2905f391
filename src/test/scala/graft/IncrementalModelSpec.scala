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

  test("delete+insert: updated keys are replaced wholesale, multi-row grains included") {
    val target = tmpDir("incr-di") + "/t"
    // grain: (k, line) — TWO rows per key, the shape keep-latest
    // upserts get wrong and delete+insert exists for
    val day1 = Seq(
      (1L, "a", 10.0, ts("2024-01-01 00:00:00")),
      (1L, "b", 11.0, ts("2024-01-01 00:00:00")),
      (2L, "a", 20.0, ts("2024-01-02 00:00:00")))
      .toDF("k", "line", "v", "updated_at")
    assert(IncrementalModel.runDeleteInsert(spark, day1, target,
      "updated_at", Seq("k")) === 3L)
    // day 2: key 1 fully re-stated (now THREE rows, new values) + a
    // brand-new key 3; key 2 untouched
    val day2 = day1.filter($"k" === 2L).unionByName(Seq(
        (1L, "a", 100.0, ts("2024-01-05 00:00:00")),
        (1L, "b", 110.0, ts("2024-01-05 00:00:00")),
        (1L, "c", 120.0, ts("2024-01-05 00:00:00")),
        (3L, "a", 30.0, ts("2024-01-06 00:00:00")))
      .toDF("k", "line", "v", "updated_at"))
    assert(IncrementalModel.runDeleteInsert(spark, day2, target,
      "updated_at", Seq("k")) === 4L)
    val got = spark.read.parquet(target)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got === Set(
      (1L, "a", 100.0), (1L, "b", 110.0), (1L, "c", 120.0), // replaced, 3 rows
      (2L, "a", 20.0),                                      // untouched
      (3L, "a", 30.0)))                                     // inserted
    // idempotent: nothing newer than the watermark → no-op
    assert(IncrementalModel.runDeleteInsert(spark, day2, target,
      "updated_at", Seq("k")) === 0L)
    assert(spark.read.parquet(target).count() === 5L)
  }
}
