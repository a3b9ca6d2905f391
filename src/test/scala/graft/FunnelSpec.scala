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
}
