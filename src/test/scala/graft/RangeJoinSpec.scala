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

  test("intervalOverlap ≡ brute force; multi-bucket pairs emit exactly once") {
    def ts(m: Long) = new java.sql.Timestamp(m * 60000L)
    // minutes-scale intervals with 600s buckets: nested, touching at
    // an edge (inclusive), disjoint, inverted, and a LONG pair that
    // shares many buckets (the dedup-free trick's stress case)
    val ivs = Seq(
      (1L, ts(0), ts(30)),
      (2L, ts(10), ts(20)),    // nested in 1
      (3L, ts(30), ts(40)),    // touches 1 at minute 30 (inclusive)
      (4L, ts(50), ts(60)),    // disjoint from 1-3
      (5L, ts(45), ts(40)),    // inverted: matches nothing
      (6L, ts(0), ts(200)),    // long: shares ~20 buckets with 7
      (7L, ts(5), ts(190))
    ).toDF("id", "lo", "hi")
    val out = RangeJoin.intervalOverlap(ivs, ivs, Seq.empty, "lo", "hi",
        bucketSeconds = 600L)
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // no duplicates although pairs share many buckets
    assert(out.length === out.distinct.length, s"duplicate pairs: ${out.toSeq}")
    val raw = ivs.collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2)))
    val brute = (for {
      (ia, la, ha) <- raw; (ib, lb, hb) <- raw
      if ia < ib && !la.after(ha) && !lb.after(hb) // drop inverted
      if !la.after(hb) && !lb.after(ha)
    } yield (ia, ib)).toSet
    assert(out.toSet === brute)
    assert(brute.contains((1L, 3L)) && brute.contains((6L, 7L)))
    assert(!brute.exists(p => p._1 == 5L || p._2 == 5L))
    // keyed variant: overlaps only within the same key
    val keyed = ivs.withColumn("grp", (col("id") % 2).cast("long"))
    val kOut = RangeJoin.intervalOverlap(keyed, keyed, Seq("grp"), "lo", "hi",
        bucketSeconds = 600L)
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(kOut === brute.filter { case (x, y) => x % 2 == y % 2 })
    // the fan-out cap still raises
    val err = intercept[Throwable] {
      RangeJoin.intervalOverlap(ivs, ivs, Seq.empty, "lo", "hi",
        bucketSeconds = 600L, maxBucketsPerInterval = 4L).count()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(err).exists(_.contains("maxBucketsPerInterval")))
  }
}
