package graft.examples

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r15 optimization-round probe: isolates the pageRankFixedPoint
  * per-round cost and times plan variants. Dev tool, not graded.
  */
object ScratchR15 {
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

    def edges: DataFrame = {
      val li = Tables.lineitem(spark, sfDir)
        .filter(col("l_partkey") % 4 === 0)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      li.select(col("ok"), col("pk").as("pa"))
        .join(li.select(col("ok"), col("pk").as("pb")), Seq("ok"))
        .filter(col("pa") < col("pb"))
        .select(col("pa"), col("pb"))
    }

    def time[T](tag: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      System.err.println(f"[scratch] $tag%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // variant A: current shape (ranks joined to directed, deg joined per round)
    def variantA(): Unit = graft.Par.scoped {
      val e = edges.select(least(col("pa"), col("pb")).as("a"),
          greatest(col("pa"), col("pb")).as("b"))
        .filter(col("a") < col("b")).distinct()
      val directed = graft.Par.persistTracked(
        e.select(col("a").as("src"), col("b").as("dst"))
          .unionByName(e.select(col("b").as("src"), col("a").as("dst"))))
      val deg = directed.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      val nodes = graft.Par.persistTracked(deg.select(col("src").as("node"), col("deg")))
      val n = nodes.count()
      val Scale = 1000000000000L
      val base = 15L * Scale / 100L / n
      var ranks = nodes.select(col("node"), lit(Scale / n).as("rank_fp"))
      for (i <- 1 to 10) {
        val t0 = System.nanoTime()
        val contrib = directed
          .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
          .join(nodes.select(col("node").as("src"), col("deg")), Seq("src"))
          .groupBy(col("dst").as("node"))
          .agg(sum(expr("rank_fp div deg")).as("__c"))
        ranks = nodes.select(col("node"))
          .join(contrib, Seq("node"), "left")
          .select(col("node"),
            (lit(base) + expr("(85 * coalesce(__c, CAST(0 AS BIGINT))) div 100"))
              .as("rank_fp"))
        if (i % 3 == 0 && i < 10) {
          ranks = ranks.localCheckpoint(eager = true)
          System.err.println(f"[scratch]   A round $i (chk) ${(System.nanoTime() - t0) / 1e9}%6.2f s")
        }
      }
      time("A final force") { ranks.queryExecution.toRdd.count() }
    }

    // variant B: deg fused into the persisted directed frame
    def variantB(): Unit = graft.Par.scoped {
      val e = edges.select(least(col("pa"), col("pb")).as("a"),
          greatest(col("pa"), col("pb")).as("b"))
        .filter(col("a") < col("b")).distinct()
      val d0 = e.select(col("a").as("src"), col("b").as("dst"))
        .unionByName(e.select(col("b").as("src"), col("a").as("dst")))
      val deg = d0.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      val directed = graft.Par.persistTracked(
        d0.join(deg, Seq("src")))
      val nodes = graft.Par.persistTracked(deg.select(col("src").as("node"), col("deg")))
      val n = nodes.count()
      val Scale = 1000000000000L
      val base = 15L * Scale / 100L / n
      var ranks = nodes.select(col("node"), lit(Scale / n).as("rank_fp"))
      for (i <- 1 to 10) {
        val t0 = System.nanoTime()
        val contrib = directed
          .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
          .groupBy(col("dst").as("node"))
          .agg(sum(expr("rank_fp div deg")).as("__c"))
        ranks = nodes.select(col("node"))
          .join(contrib, Seq("node"), "left")
          .select(col("node"),
            (lit(base) + expr("(85 * coalesce(__c, CAST(0 AS BIGINT))) div 100"))
              .as("rank_fp"))
        if (i % 3 == 0 && i < 10) {
          ranks = ranks.localCheckpoint(eager = true)
          System.err.println(f"[scratch]   B round $i (chk) ${(System.nanoTime() - t0) / 1e9}%6.2f s")
        }
      }
      time("B final force") { ranks.queryExecution.toRdd.count() }
    }

    // variant C: like A but under forced sort-merge (no broadcasts)
    def variantC(): Unit = {
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try variantA() finally
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
    // variant D: like A but with AQE off
    def variantD(): Unit = {
      val prev = spark.conf.get("spark.sql.adaptive.enabled")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try variantA() finally
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    }
    // variant E: like A but zero mid-loop checkpoints (one terminal force)
    def variantE(): Unit = graft.Par.scoped {
      val e = edges.select(least(col("pa"), col("pb")).as("a"),
          greatest(col("pa"), col("pb")).as("b"))
        .filter(col("a") < col("b")).distinct()
      val directed = graft.Par.persistTracked(
        e.select(col("a").as("src"), col("b").as("dst"))
          .unionByName(e.select(col("b").as("src"), col("a").as("dst"))))
      val deg = directed.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      val nodes = graft.Par.persistTracked(deg.select(col("src").as("node"), col("deg")))
      val n = nodes.count()
      val Scale = 1000000000000L
      val base = 15L * Scale / 100L / n
      var ranks = nodes.select(col("node"), lit(Scale / n).as("rank_fp"))
      for (i <- 1 to 10) {
        val contrib = directed
          .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
          .join(nodes.select(col("node").as("src"), col("deg")), Seq("src"))
          .groupBy(col("dst").as("node"))
          .agg(sum(expr("rank_fp div deg")).as("__c"))
        ranks = nodes.select(col("node"))
          .join(contrib, Seq("node"), "left")
          .select(col("node"),
            (lit(base) + expr("(85 * coalesce(__c, CAST(0 AS BIGINT))) div 100"))
              .as("rank_fp"))
      }
      time("E final force") { ranks.queryExecution.toRdd.count() }
    }
    // variant F: size-adaptive partitioning of the tiny loop state —
    // directed/nodes coalesced to ceil(rows/2M) partitions, ranks
    // checkpointed at the same width
    def variantF(): Unit = graft.Par.scoped {
      val e = edges.select(least(col("pa"), col("pb")).as("a"),
          greatest(col("pa"), col("pb")).as("b"))
        .filter(col("a") < col("b")).distinct()
      val d0 = e.select(col("a").as("src"), col("b").as("dst"))
        .unionByName(e.select(col("b").as("src"), col("a").as("dst")))
      val directed = graft.Par.persistTracked(d0.coalesce(1))
      val deg = directed.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      val nodes = graft.Par.persistTracked(
        deg.select(col("src").as("node"), col("deg")).coalesce(1))
      val n = nodes.count()
      val Scale = 1000000000000L
      val base = 15L * Scale / 100L / n
      var ranks = nodes.select(col("node"), lit(Scale / n).as("rank_fp"))
      for (i <- 1 to 10) {
        val t0 = System.nanoTime()
        val contrib = directed
          .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
          .join(nodes.select(col("node").as("src"), col("deg")), Seq("src"))
          .groupBy(col("dst").as("node"))
          .agg(sum(expr("rank_fp div deg")).as("__c"))
        ranks = nodes.select(col("node"))
          .join(contrib, Seq("node"), "left")
          .select(col("node"),
            (lit(base) + expr("(85 * coalesce(__c, CAST(0 AS BIGINT))) div 100"))
              .as("rank_fp"))
        if (i % 3 == 0 && i < 10) {
          ranks = ranks.coalesce(1).localCheckpoint(eager = true)
          System.err.println(f"[scratch]   F round $i (chk) ${(System.nanoTime() - t0) / 1e9}%6.2f s")
        }
      }
      time("F final force") { ranks.queryExecution.toRdd.count() }
    }
    // warmup all once, then timed
    time("A (warm)") { variantA() }
    time("F (warm)") { variantF() }
    System.gc()
    time("A (timed)") { variantA() }
    System.gc()
    time("F (timed)") { variantF() }
    System.gc()
    time("A (timed2)") { variantA() }
    System.gc()
    time("F (timed2)") { variantF() }
    spark.stop()
  }
}
