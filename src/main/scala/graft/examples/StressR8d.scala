package graft.examples

import graft.operators.{IncrementalAgg, SurrogateKey}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 wave-4 stress legs — the new operators at sizes where the
  * 100 TB claims are measurable (warm JVM, local[32]; each leg
  * asserts result equality before trusting the timing):
  *
  * Leg 12 — two-phase surrogate keys vs the naive global
  * `row_number()` window at 8M rows. The naive form funnels the
  * whole table through ONE task (a SinglePartition exchange); the
  * two-phase form keeps every reducer busy. Wall-clock ratio is the
  * headline; identical numbering asserted on a sample.
  *
  * Leg 13 — incremental aggregate maintenance vs full recompute:
  * 40M-row history + 80k delta. The fold touches the delta + the
  * group-cardinality state only; the recompute re-scans history.
  * Equal outputs asserted.
  *
  * Leg 14 — incremental COUNT(DISTINCT) fold vs full distinct
  * recompute at the same sizes (pair-set state).
  *
  * Run: `sbt "runMain graft.examples.StressR8d"`.
  */
object StressR8d {

  private def timed[A](label: String)(f: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val a = f
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[stress] $label%-48s $sec%8.2f s")
    (sec, a)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // --- Leg 12: surrogate keys, two-phase vs global window ---
    // parquet-backed, layout decorrelated from the sort key so the
    // range partitioner does real work
    val skDir = java.nio.file.Files.createTempDirectory("stress_sk").toString + "/t"
    spark.range(8000000L).select(
        (col("id") * 2654435761L % 1000000L).as("grp"), col("id").as("uid"),
        md5(col("id").cast("string")).as("payload"))
      .orderBy(xxhash64(col("id")))
      .write.parquet(skDir)
    val t = spark.read.parquet(skDir)
    val (naiveSec, naiveChk) = timed("surrogate: naive global window") {
      val df = t.withColumn("sk",
        row_number().over(Window.orderBy(col("grp"), col("uid"))).cast("long"))
      df.filter(col("sk") % 1000000L === 0).agg(sum(col("sk") * col("uid")))
        .head.getLong(0)
    }
    val (twoSec, twoChk) = timed("surrogate: two-phase") {
      val df = SurrogateKey.assign(t, Seq("grp", "uid"), "sk")
      val chk = df.filter(col("sk") % 1000000L === 0)
        .agg(sum(col("sk") * col("uid"))).head.getLong(0)
      graft.Par.release()
      chk
    }
    require(naiveChk == twoChk, s"numbering mismatch: $naiveChk vs $twoChk")
    println(f"[stress] leg12 speedup: ${naiveSec / twoSec}%.1fx")

    // --- Leg 13: incremental aggregate vs full recompute ---
    val aggDir = java.nio.file.Files.createTempDirectory("stress_ia").toString
    spark.range(40000000L).select(
        (col("id") % 50000L).as("k"),
        (col("id") % 997L).cast("double").as("v"))
      .write.parquet(aggDir + "/hist")
    spark.range(40000000L, 40080000L).select(
        (col("id") % 50000L).as("k"),
        (col("id") % 997L).cast("double").as("v"))
      .write.parquet(aggDir + "/delta")
    val hist = spark.read.parquet(aggDir + "/hist")
    val delta = spark.read.parquet(aggDir + "/delta")
    // state materialized once (it IS a stored table in production)
    IncrementalAgg.init(hist, Seq("k"), "v")
      .write.parquet(aggDir + "/state")
    val state = spark.read.parquet(aggDir + "/state")
    val (fullSec, fullRows) = timed("agg MV: full recompute (hist+delta)") {
      IncrementalAgg.init(hist.unionByName(delta), Seq("k"), "v")
        .agg(sum("n_rows"), sum(col("sum_value"))).head.toSeq.toString
    }
    val (foldSec, foldRows) = timed("agg MV: incremental fold") {
      IncrementalAgg.maintain(state, delta, Seq("k"), "v")
        .agg(sum("n_rows"), sum(col("sum_value"))).head.toSeq.toString
    }
    require(fullRows == foldRows, s"agg mismatch: $fullRows vs $foldRows")
    println(f"[stress] leg13 speedup: ${fullSec / foldSec}%.1fx")

    // --- Leg 14: incremental distinct vs full recompute ---
    // distinct-pair domain (50k keys × ≤20 values = 1M pairs) well
    // below history rows (40M) — the regime the pair-set state is FOR;
    // when pairs ≈ rows the fold buys nothing (and the HLL fallback
    // documented on the operator is the right tool)
    spark.range(40000000L).select(
        (col("id") % 50000L).as("k"),
        ((col("id") / 50000L) % 20L).as("v"))
      .write.parquet(aggDir + "/dhist")
    spark.range(40000000L, 40080000L).select(
        (col("id") % 50000L).as("k"),
        ((col("id") / 50000L) % 23L).as("v")) // some unseen values
      .write.parquet(aggDir + "/ddelta")
    val dhist = spark.read.parquet(aggDir + "/dhist")
    val ddelta = spark.read.parquet(aggDir + "/ddelta")
    IncrementalAgg.initDistinct(dhist, Seq("k"), "v")
      .write.parquet(aggDir + "/dstate")
    val dstate = spark.read.parquet(aggDir + "/dstate")
    val (dFullSec, dFull) = timed("distinct MV: full recompute") {
      dhist.unionByName(ddelta).groupBy("k")
        .agg(countDistinct(col("v")).as("n"))
        .agg(sum("n")).head.getLong(0)
    }
    val (dFoldSec, dFold) = timed("distinct MV: incremental fold") {
      IncrementalAgg.finalizeDistinct(
          IncrementalAgg.maintainDistinct(dstate, ddelta, Seq("k"), "v"),
          Seq("k"), "v")
        .agg(sum("n_distinct")).head.getLong(0)
    }
    require(dFull == dFold, s"distinct mismatch: $dFull vs $dFold")
    println(f"[stress] leg14 speedup: ${dFullSec / dFoldSec}%.1fx")

    spark.stop()
  }
}
