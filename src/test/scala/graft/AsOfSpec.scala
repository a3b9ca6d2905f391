package graft

import graft.operators.AsOf
import org.apache.spark.sql.functions._

class AsOfSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  // left: observations; right: state changes per key
  private lazy val left = Seq(
    (1L, "u1", ts("2024-01-01 10:00:00")),
    (2L, "u1", ts("2024-01-01 12:00:00")),
    (3L, "u2", ts("2024-01-01 09:00:00")), // before ANY right row for u2
    (4L, "u3", ts("2024-01-01 10:00:00"))  // u3 has no right rows at all
  ).toDF("obs_id", "user", "ts")

  private lazy val right = Seq(
    (100L, "u1", ts("2024-01-01 09:30:00")),
    (101L, "u1", ts("2024-01-01 12:00:00")), // EXACTLY at obs 2's ts
    (102L, "u1", ts("2024-01-01 13:00:00")), // after everything
    (103L, "u2", ts("2024-01-01 11:00:00"))
  ).toDF("state_id", "user", "ts")

  test("backward: latest right at-or-before each left row; null when none") {
    val out = AsOf.backward(left, right, Seq("user"), "ts", "ts",
        Seq("state_id", "ts"), "st_")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(3)).map(_.asInstanceOf[Long]), Option(r.get(4)))).toMap
    assert(out(1L)._1 === Some(100L))
    assert(out(2L)._1 === Some(101L)) // ties (<=) match
    assert(out(3L)._1 === None)       // right exists but only later
    assert(out(4L)._1 === None)       // no right rows for key
  }

  test("forward: earliest right at-or-after each left row; null when none") {
    val out = AsOf.forward(left, right, Seq("user"), "ts", "ts",
        Seq("state_id"), "st_")
      .collect().map(r => r.getLong(0) ->
        Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    assert(out(1L) === Some(101L)) // next after 10:00 is 12:00
    assert(out(2L) === Some(101L)) // ties (>=) match
    assert(out(3L) === Some(103L))
    assert(out(4L) === None)
  }

  test("tolerance nulls matches older than the bound but keeps the left row") {
    // obs 1 at 10:00 matches state 100 at 09:30 (30 min gap);
    // a 10-minute tolerance rejects it, an hour accepts it
    val tight = AsOf.backward(left, right, Seq("user"), "ts", "ts",
        Seq("state_id"), "st_", toleranceSec = Some(600L))
      .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(tight(1L) === None)          // 30 min > 10 min tolerance
    assert(tight(2L) === Some(101L))    // exact-ts match, gap 0
    assert(tight.keySet === Set(1L, 2L, 3L, 4L)) // every left row kept
    val loose = AsOf.backward(left, right, Seq("user"), "ts", "ts",
        Seq("state_id"), "st_", toleranceSec = Some(3600L))
      .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(loose(1L) === Some(100L))
    // forward: obs 2 at 12:00 → state 101 at 12:00 (gap 0) within any
    // tolerance; obs 3 at 09:00 → state 103 at 11:00 (2 h) rejected at 1 h
    val fwd = AsOf.forward(left, right, Seq("user"), "ts", "ts",
        Seq("state_id"), "st_", toleranceSec = Some(3600L))
      .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(fwd(2L) === Some(101L) && fwd(3L) === None)
  }

  test("backward keeps every left row exactly once and all left columns") {
    val out = AsOf.backward(left, right, Seq("user"), "ts", "ts", Seq("state_id"))
    assert(out.count() === left.count())
    assert(out.columns.toSeq === Seq("obs_id", "user", "ts", "asof_state_id"))
  }

  test("backward agrees with a naive greatest-ts-at-or-before join on real events") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id"))
    val fast = AsOf.backward(purchases, views, Seq("user_id"), "ts", "ts",
        Seq("event_id"), "view_")
      .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    // naive: join all prior views, keep max ts, join back for its id
    val pv = purchases.select(col("event_id").as("p_id"),
        col("user_id"), col("ts").as("p_ts"))
      .join(views.select(col("user_id"), col("ts").as("v_ts"),
        col("event_id").as("v_id")), Seq("user_id"), "left")
    val best = pv.filter(col("v_ts") <= col("p_ts"))
      .groupBy(col("p_id")).agg(max(col("v_ts")).as("best_ts"))
    val naive = purchases.select(col("event_id").as("p_id"), col("user_id"),
        col("ts").as("p_ts"))
      .join(best, Seq("p_id"), "left")
      .join(views.select(col("user_id"), col("ts").as("best_ts"),
        col("event_id").as("v_id")), Seq("user_id", "best_ts"), "left")
      .select(col("p_id"), col("v_id"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(fast.keySet === naive.keySet)
    assert(fast === naive)
    assert(fast.values.exists(_.isDefined), "test premise: some purchase has a prior view")
  }

  test("plan is one shuffle on the key — no nested-loop or cartesian join") {
    val plan = AsOf.backward(left, right, Seq("user"), "ts", "ts", Seq("state_id"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"), plan)
  }
}
