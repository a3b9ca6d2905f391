package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("pointInInterval: exact containment, intervals spanning many buckets, no dup matches") {
    val points = Seq(
      ("k1", 1L, ts("2024-01-01 10:00:00")), // inside i1 (start boundary)
      ("k1", 2L, ts("2024-01-01 11:59:59")), // inside i1 (end boundary)
      ("k1", 3L, ts("2024-01-01 12:00:01")), // just outside i1
      ("k1", 4L, ts("2024-01-02 05:00:00")), // inside i2 (multi-bucket span)
      ("k2", 5L, ts("2024-01-01 10:30:00"))  // right time, wrong key
    ).toDF("k", "pt_id", "pt")
    val intervals = Seq(
      ("k1", 10L, ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00")),
      ("k1", 11L, ts("2024-01-02 00:00:00"), ts("2024-01-02 23:00:00")),
      ("k2", 12L, ts("2024-01-03 00:00:00"), ts("2024-01-03 01:00:00"))
    ).toDF("k", "iv_id", "start_ts", "end_ts")
    val out = RangeJoin.pointInInterval(points, intervals, Seq("k"),
        "pt", "start_ts", "end_ts", bucketSeconds = 1800L)
      .select(col("pt_id"), col("iv_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // each match appears exactly once even though i2 spans 46 buckets
    assert(out.sorted.toSeq === Seq((1L, 10L), (2L, 10L), (4L, 11L)))
  }

  test("pointInInterval result matches a naive range-predicate join") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("ts"))
    val sessions = graft.operators.Sessionize
      .byGap(Tables.events(spark, "/root/testdata/sf0.001"), "user_id", "ts", 1800L)
      .select(col("user_id"), col("session_seq"), col("session_start"), col("session_end"))
    val bucketed = RangeJoin.pointInInterval(ev, sessions, Seq("user_id"),
        "ts", "session_start", "session_end", 1800L)
      .groupBy(col("user_id"), col("session_seq")).count()
    val naive = ev.join(sessions, Seq("user_id"))
      .filter(col("ts") >= col("session_start") && col("ts") <= col("session_end"))
      .groupBy(col("user_id"), col("session_seq")).count()
    assert(bucketed.exceptAll(naive).isEmpty && naive.exceptAll(bucketed).isEmpty)
  }

  test("pointInInterval: inverted intervals emit NO buckets (no junk fan-out)") {
    val points = Seq(("k1", 1L, ts("2024-01-01 10:00:00"))).toDF("k", "pt_id", "pt")
    // end before start: matches nothing — and must not explode junk
    // buckets for the recheck to discard (sequence() DESCENDS on a>b)
    val inverted = Seq(
      ("k1", 10L, ts("2024-01-05 00:00:00"), ts("2024-01-01 00:00:00")))
      .toDF("k", "iv_id", "start_ts", "end_ts")
    val joined = RangeJoin.pointInInterval(points, inverted, Seq("k"),
      "pt", "start_ts", "end_ts", bucketSeconds = 1800L)
    assert(joined.count() === 0)
    // the exploded side generates zero rows, not 192 descending junk
    // buckets per interval
    val exploded = inverted.withColumn("__b", explode(
      when(floor(unix_timestamp(col("start_ts")) / 1800L)
             > floor(unix_timestamp(col("end_ts")) / 1800L),
           array().cast("array<long>"))
        .otherwise(sequence(
          floor(unix_timestamp(col("start_ts")) / 1800L).cast("long"),
          floor(unix_timestamp(col("end_ts")) / 1800L).cast("long")))))
    assert(exploded.count() === 0)
  }

  test("pointInInterval: a pathologically long interval raises instead of silently exploding") {
    val points = Seq(("k1", 1L, ts("2024-06-01 10:00:00"))).toDF("k", "pt_id", "pt")
    // a year-long interval at 1800 s buckets is ~17.5k rows of fan-out
    val yearLong = Seq(
      ("k1", 10L, ts("2024-01-01 00:00:00"), ts("2024-12-31 00:00:00")))
      .toDF("k", "iv_id", "start_ts", "end_ts")
    val e = intercept[Exception] {
      RangeJoin.pointInInterval(points, yearLong, Seq("k"),
        "pt", "start_ts", "end_ts", bucketSeconds = 1800L,
        maxBucketsPerInterval = 4096L).count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("maxBucketsPerInterval")), e.toString)
    // same interval with a wide-enough cap (or coarser buckets) is fine
    val ok = RangeJoin.pointInInterval(points, yearLong, Seq("k"),
      "pt", "start_ts", "end_ts", bucketSeconds = 1800L,
      maxBucketsPerInterval = 20000L)
    assert(ok.count() === 1)
  }

  test("bandJoin assigns each row its single band; out-of-band rows keep null") {
    val facts = Seq((1L, 5.0), (2L, 10.0), (3L, 25.0), (4L, -1.0)).toDF("id", "v")
    val bands = Seq(("low", 0.0, 10.0), ("high", 10.0, 30.0)).toDF("band", "lo", "hi")
    val out = RangeJoin.bandJoin(facts, bands, "v", "lo", "hi")
      .select(col("id"), col("band"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out === Map(1L -> Some("low"), 2L -> Some("high"),
      3L -> Some("high"), 4L -> None))
  }
}
