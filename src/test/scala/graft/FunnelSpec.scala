package graft

import graft.pipeline.Analytics
import org.apache.spark.sql.functions._

class FunnelSpec extends SparkSuite {
  import spark.implicits._

  private def ev(rows: (Long, String, Long)*) =
    rows.toSeq.toDF("user_id", "event_type", "sec")
      .select(col("user_id"), col("event_type"),
        timestamp_seconds(col("sec")).as("ts"))

  test("funnel: earliest strictly-increasing chain per user") {
    val events = ev(
      (1L, "view", 1L), (1L, "click", 2L), (1L, "purchase", 3L), // full
      (2L, "click", 1L), (2L, "view", 2L), (2L, "purchase", 3L), // click precedes its view
      (3L, "view", 5L), (3L, "purchase", 6L),                    // skips click
      (5L, "view", 7L), (5L, "click", 7L))                       // tie is NOT after
    val out = Analytics.funnel(events, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out === Map(1L -> 3, 2L -> 1, 3L -> 1, 5L -> 1))
  }

  test("funnelWindowed: a dead-ended early start loses to a later converting one") {
    val events = ev(
      // start@0 dead-ends (no click within 10s); start@12 converts
      (1L, "view", 0L), (1L, "view", 12L), (1L, "click", 15L),
      (1L, "purchase", 18L),
      // window cuts the chain after stage 2
      (2L, "view", 0L), (2L, "click", 5L), (2L, "purchase", 20L))
    val out = Analytics.funnelWindowed(events, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"), windowSeconds = 10L)
      .collect().map { r =>
        r.getLong(0) -> ((r.getInt(1), r.getTimestamp(2).getTime / 1000,
          r.getTimestamp(3).getTime / 1000))
      }.toMap
    assert(out(1L) === ((3, 12L, 18L)))
    assert(out(2L) === ((2, 0L, 5L)))
  }

  test("funnelWindowed with an unbounded window equals the plain funnel") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1),
        Option(r.getTimestamp(2)), Option(r.getTimestamp(3)))).toSet
    val plain = rows(Analytics.funnel(events, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase")))
    // greedy-from-earliest dominates when nothing expires (exchange
    // argument), so the per-start sweep collapses to the single chain
    val wide = rows(Analytics.funnelWindowed(events, "user_id", "event_type",
      "ts", Seq("view", "click", "purchase"), windowSeconds = 10L * 365 * 86400))
    assert(wide === plain)
  }

  test("funnel: chain timestamps are the recurrence minima; stage-0 users kept") {
    val events = ev(
      // two candidate chains; the EARLIEST strictly-increasing one wins:
      // t1 = 1 (not 4), t2 = min click > 1 = 5, t3 = min purchase > 5 = 9
      (1L, "view", 1L), (1L, "view", 4L), (1L, "click", 5L),
      (1L, "purchase", 2L), // purchase BEFORE the click — must not count
      (1L, "purchase", 9L),
      // user with funnel-relevant events but no step-1 completion
      (2L, "click", 3L), (2L, "purchase", 4L))
    val out = Analytics.funnel(events, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .collect().map { r =>
        r.getLong(0) -> ((r.getInt(1),
          Option(r.getTimestamp(2)).map(_.getTime / 1000),
          Option(r.getTimestamp(3)).map(_.getTime / 1000)))
      }.toMap
    assert(out(1L) === ((3, Some(1L), Some(9L))))
    assert(out(2L) === ((0, None, None)))
    // user with NO funnel-relevant events produces no row
    val withNoise = events.union(ev((9L, "error", 1L)))
    assert(!Analytics.funnel(withNoise, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase")).collect().exists(_.getLong(0) == 9L))
  }

  test("funnelLatency: gaps from the chain's first-qualifying events, exact interpolated p50, partial completers") {
    // u1: view→click 10 s, click→purchase 60 s; u2: view→click 30 s,
    // no purchase; u3: click only (never enters); u4: click BEFORE
    // its view (never a qualifying click); u5: sub-second µs gap
    val events = Seq(
      (1L, "view", 1000000L), (1L, "click", 11000000L),
      (1L, "purchase", 71000000L),
      (2L, "view", 1000000L), (2L, "click", 31000000L),
      (3L, "click", 5000000L),
      (4L, "click", 1000000L), (4L, "view", 2000000L),
      (5L, "view", 1000000L), (5L, "click", 2500000L)
    ).toDF("user_id", "event_type", "us")
      .select(col("user_id"), col("event_type"),
        timestamp_micros(col("us")).as("ts"))
    val out = Analytics.funnelLatency(events, "user_id", "event_type",
        "ts", Seq("view", "click", "purchase"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    // gaps {10, 30, 1.5} s: mean 41.5/3 = 13.833333, p50 = 10
    assert(out(("view", "click")) === ((3L, 13.833333, 10.0)))
    assert(out(("click", "purchase")) === ((1L, 60.0, 60.0)))
    // even-count p50 interpolates: drop u5 → gaps {10, 30} → 20
    val even = Analytics.funnelLatency(events.filter(col("user_id") =!= 5L),
        "user_id", "event_type", "ts", Seq("view", "click", "purchase"))
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(even("view") === 20.0)
  }
}
