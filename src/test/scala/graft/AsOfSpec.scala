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

  test("backward keeps every left row exactly once and all left columns") {
    val out = AsOf.backward(left, right, Seq("user"), "ts", "ts", Seq("state_id"))
    assert(out.count() === left.count())
    assert(out.columns.toSeq === Seq("obs_id", "user", "ts", "asof_state_id"))
  }

  test("plan is one shuffle on the key — no nested-loop or cartesian join") {
    val plan = AsOf.backward(left, right, Seq("user"), "ts", "ts", Seq("state_id"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"), plan)
  }
}
