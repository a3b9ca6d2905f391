package graft.examples

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r15 probe #2: where do the ~8 CPU-seconds per pageRank round go?
  * One round, expression bisected. Dev tool, not graded.
  */
object ScratchR15b {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.scheduler._
    @volatile var cpuNs = 0L
    @volatile var runMs = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        cpuNs += s.stageInfo.taskMetrics.executorCpuTime
        runMs += s.stageInfo.taskMetrics.executorRunTime
      }
    })

    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_partkey") % 4 === 0)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val e = li.select(col("ok"), col("pk").as("pa"))
      .join(li.select(col("ok"), col("pk").as("pb")), Seq("ok"))
      .filter(col("pa") < col("pb"))
      .select(least(col("pa"), col("pb")).as("a"),
        greatest(col("pa"), col("pb")).as("b"))
      .filter(col("a") < col("b")).distinct()
    val directed = e.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(e.select(col("b").as("src"), col("a").as("dst")))
      .persist()
    val deg = directed.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val nodes = deg.select(col("src").as("node"), col("deg")).persist()
    val n = nodes.count()
    System.err.println(s"[scratch] nodes=$n directed=${directed.count()}")
    val ranks = nodes.select(col("node"), lit(1000000L).as("rank_fp")).persist()
    ranks.count()

    def run(tag: String)(df: DataFrame): Unit = {
      // warm
      df.queryExecution.toRdd.count()
      System.gc()
      cpuNs = 0L; runMs = 0L
      val t0 = System.nanoTime()
      df.queryExecution.toRdd.count()
      val wall = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[scratch] $tag%-44s wall=$wall%6.2f s cpu=${cpuNs / 1e9}%7.2f s run=${runMs / 1e3}%7.2f s")
    }

    // 1: join only, count rows
    run("join ranks only, count(*)") {
      directed.join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst").as("node")).agg(count(lit(1)).as("__c"))
    }
    // 2: + deg join
    run("join ranks + deg, count(*)") {
      directed.join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .join(nodes.select(col("node").as("src"), col("deg")), Seq("src"))
        .groupBy(col("dst").as("node")).agg(count(lit(1)).as("__c"))
    }
    // 3: + sum(rank div deg)
    run("join ranks + deg, sum(div)") {
      directed.join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .join(nodes.select(col("node").as("src"), col("deg")), Seq("src"))
        .groupBy(col("dst").as("node")).agg(sum(expr("rank_fp div deg")).as("__c"))
    }
    // 4: full round incl left join back
    run("full round") {
      val contrib = directed
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .join(nodes.select(col("node").as("src"), col("deg")), Seq("src"))
        .groupBy(col("dst").as("node")).agg(sum(expr("rank_fp div deg")).as("__c"))
      nodes.select(col("node")).join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(1L) + expr("(85 * coalesce(__c, CAST(0 AS BIGINT))) div 100")).as("rank_fp"))
    }
    // 5: scan directed only
    run("scan directed, count by dst") {
      directed.groupBy(col("dst").as("node")).agg(count(lit(1)).as("__c"))
    }
    spark.stop()
  }
}
