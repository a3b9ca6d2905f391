package graft.examples

import graft.Tables
import graft.sources.Sink
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

/** End-to-end batch ELT as a user of the library would wire it —
  * the reference pipeline's daily run, Spark-first:
  * incremental extract → staged partitioned load (idempotent
  * re-runs) → keyed upsert → bucketed mart for exchange-free joins.
  *
  * Run: `sbt "runMain graft.examples.BatchPipelineDemo"`
  */
object BatchPipelineDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-batch-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = java.nio.file.Files.createTempDirectory("batch-demo").toString

    // 1. incremental extract (cutoff pushed to the scan) → daily dirs
    val delta = Tables.convertEventTs(
        Tables.eventsRaw(spark, sfDir).filter(col("ts") > lit(0L)))
      .withColumn("dt", to_date(col("ts")))
    Sink.partitioned(delta, s"$out/events", Seq("dt"))
    println(s"events partitions: " +
      new java.io.File(s"$out/events").listFiles().count(_.getName.startsWith("dt=")))

    // 2. idempotent re-load of one day (dynamic partition overwrite)
    val oneDay = delta.filter(col("dt") === lit("2024-01-05").cast("date"))
    Sink.overwritePartitions(oneDay, s"$out/events", Seq("dt"))
    println(s"after day re-load, total rows: " +
      spark.read.parquet(s"$out/events").count())

    // 3. keyed upsert into a current-state table
    val current = graft.operators.Cdc.dedupLatestPerKey(
      delta.select("user_id", "event_id", "ts", "event_type", "value"),
      Seq("user_id"), "ts", Seq("event_id"))
    Sink.fullOverwrite(current, s"$out/user_state")
    Sink.upsert(spark, s"$out/user_state",
      delta.filter(col("event_type") === "purchase")
        .select("user_id", "event_id", "ts", "event_type", "value"),
      Seq("user_id"), "ts", Seq("event_id"))
    println(s"user_state rows: ${spark.read.parquet(s"$out/user_state").count()}")

    // 4. bucketed marts → exchange-free join
    spark.sql("DROP TABLE IF EXISTS demo_orders_b")
    spark.sql("DROP TABLE IF EXISTS demo_lineitem_b")
    Sink.bucketedTable(Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey", "o_orderdate"),
      "demo_orders_b", "o_orderkey", 8, Some("o_orderkey"))
    Sink.bucketedTable(Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_extendedprice"),
      "demo_lineitem_b", "l_orderkey", 8, Some("l_orderkey"))
    val j = spark.table("demo_lineitem_b").join(spark.table("demo_orders_b"),
      col("l_orderkey") === col("o_orderkey"))
    val shuffles = j.queryExecution.executedPlan.collect { case s: ShuffleExchangeLike => s }
    println(s"bucketed join rows=${j.count()} shuffle_exchanges=${shuffles.size}")

    spark.stop()
  }
}
