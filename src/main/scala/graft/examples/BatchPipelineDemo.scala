package graft.examples

import graft.Tables
import graft.pipeline.{Dag, Models}
import graft.sources.Sink
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

/** End-to-end batch ELT as a user of the library would wire it —
  * the reference pipeline's scheduled run (reference:
  * dagster_code/nomba_pipeline/definitions.py — extract assets →
  * staging → marts on a 15-minute cron), Spark-first: the job graph
  * is declared as [[graft.pipeline.Dag]] nodes (raw → staging →
  * dim/fact marts, plus the current-state upsert), run in dependency
  * order with bounded retries; each node is an idempotent write.
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

    def delta = {
      val raw = Tables.eventsRaw(spark, sfDir)
      Tables.convertEventTs(
        raw.filter(col("ts") > Tables.eventCutoffNanos(raw, 0L)))
    }
      .withColumn("dt", to_date(col("ts")))

    // The daily job graph. Nodes only read what upstream nodes wrote,
    // so the declared deps ARE the data deps (Dagster asset graph
    // semantics); every write is an idempotent overwrite/upsert.
    val graph = Seq(
      // 1. incremental extract (cutoff pushed to the scan) → daily dirs
      Dag.Node("raw_events", Nil, () =>
        Sink.partitioned(delta, s"$out/events", Seq("dt"))),
      // 2. idempotent re-load of one day (dynamic partition overwrite)
      Dag.Node("raw_events_backfill", Seq("raw_events"), () =>
        Sink.overwritePartitions(
          delta.filter(col("dt") === lit("2024-01-05").cast("date")),
          s"$out/events", Seq("dt"))),
      // 3. keyed upsert into a current-state table
      Dag.Node("user_state_seed", Seq("raw_events_backfill"), () => {
        val landed = spark.read.parquet(s"$out/events")
        Sink.fullOverwrite(graft.operators.Cdc.dedupLatestPerKey(
          landed.select("user_id", "event_id", "ts", "event_type", "value"),
          Seq("user_id"), "ts", Seq("event_id")), s"$out/user_state")
      }),
      Dag.Node("user_state_upsert", Seq("user_state_seed"), () =>
        Sink.upsert(spark, s"$out/user_state",
          spark.read.parquet(s"$out/events")
            .filter(col("event_type") === "purchase")
            .select("user_id", "event_id", "ts", "event_type", "value"),
          Seq("user_id"), "ts", Seq("event_id"))),
      // 4. marts from the star schema (dims before facts)
      Dag.Node("dim_customer", Nil, () =>
        Sink.fullOverwrite(Models.dimCustomer(spark, sfDir), s"$out/dim_customer")),
      Dag.Node("fact_lineitem", Seq("dim_customer"), () =>
        Sink.fullOverwrite(Models.factLineitem(spark, sfDir), s"$out/fact_lineitem")),
      // 5. bucketed marts → exchange-free downstream joins
      Dag.Node("bucketed_marts", Nil, () => {
        Seq("demo_orders_b", "demo_lineitem_b").foreach { t =>
          spark.sql(s"DROP TABLE IF EXISTS $t")
          // a previously crashed run can leave the managed location
          // behind after the catalog entry is gone — clear it so the
          // node is idempotent like every other one
          val loc = new org.apache.hadoop.fs.Path(
            spark.conf.get("spark.sql.warehouse.dir") + s"/$t")
          loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
            .delete(loc, true)
        }
        Sink.bucketedTable(Tables.orders(spark, sfDir)
          .select("o_orderkey", "o_custkey", "o_orderdate"),
          "demo_orders_b", "o_orderkey", 8, Some("o_orderkey"))
        Sink.bucketedTable(Tables.lineitem(spark, sfDir)
          .select("l_orderkey", "l_extendedprice"),
          "demo_lineitem_b", "l_orderkey", 8, Some("l_orderkey"))
      }))

    val status = Dag.run(graph, maxRetries = 1)
    Dag.topoOrder(graph).foreach(n => println(s"  ${n.name}: ${status(n.name)}"))
    require(status.values.forall(_ == Dag.Succeeded), s"pipeline failed: $status")

    println(s"events partitions: " +
      new java.io.File(s"$out/events").listFiles().count(_.getName.startsWith("dt=")))
    println(s"after day re-load, total rows: ${spark.read.parquet(s"$out/events").count()}")
    println(s"user_state rows: ${spark.read.parquet(s"$out/user_state").count()}")
    println(s"fact rows: ${spark.read.parquet(s"$out/fact_lineitem").count()}")
    val j = spark.table("demo_lineitem_b").join(spark.table("demo_orders_b"),
      col("l_orderkey") === col("o_orderkey"))
    val shuffles = j.queryExecution.executedPlan.collect { case s: ShuffleExchangeLike => s }
    println(s"bucketed join rows=${j.count()} shuffle_exchanges=${shuffles.size}")

    spark.stop()
  }
}
