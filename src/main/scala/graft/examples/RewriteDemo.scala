package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end proof that [[graft.plans.GraftExtensions]] wires
  * [[graft.plans.RangeJoinRewrite]] into a real session: a user
  * writes the naive containment join; the optimizer plans the
  * bucketed equi-join (no BroadcastNestedLoopJoin in the physical
  * plan) and returns the same rows. Run with
  * `sbt "runMain graft.examples.RewriteDemo"`.
  */
object RewriteDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-rewrite-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val points = Seq((1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-02 05:00:00")),
      (3L, ts("2024-03-01 00:00:00"))).toDF("p_id", "pt")
    val intervals = Seq((10L, ts("2024-01-01 09:00:00"), ts("2024-01-01 12:00:00")),
      (11L, ts("2024-01-02 00:00:00"), ts("2024-01-02 23:00:00"))).toDF("iv_id", "lo", "hi")

    // the NAIVE declarative form — no manual bucketing anywhere
    val joined = points.join(intervals, col("pt") >= col("lo") && col("pt") <= col("hi"))
    val plan = joined.queryExecution.executedPlan.toString
    val rewritten = !plan.contains("NestedLoop") && !plan.contains("Cartesian")
    println(s"[rewrite-demo] bucketed=${rewritten} rows=${joined.count()}")
    require(rewritten, s"extension did not rewrite the join:\n$plan")
    require(joined.count() == 2)
    spark.stop()
  }
}
