package graft.examples

import graft.{Tables, TempDirs}
import graft.EntryHelpers.withShufflePartitions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-13 stress legs — the streaming-gate scale law the r12
  * verdict asked for (ask #8): StressR12 measured the batch iterative
  * headliners; the ingest gates (`stream_neardup_gate`,
  * `stream_segdedup_gate`, `stream_decontam_gate`) had no measured
  * law. The claim under test is the one that matters at 100 TB:
  * **per-microbatch cost tracks BATCH size, not STATE size** — a
  * curation door whose daily cost grows with the months of corpus
  * behind it would be unusable; the design (batch-keyed probes into a
  * stored index, map-side candidate pruning, state appended not
  * rewritten) says the day-2 microbatch should cost ~the same against
  * a 10x corpus.
  *
  * Probe shape: a FIXED 500-doc day-2 batch is timed through each
  * gate twice — once against state bootstrapped from 1x docs (4,500),
  * once against 10x id-shifted copies (45,000). Only the day-2
  * `processAllAvailable()` is timed (bootstrap is untimed setup).
  * Exponent = ln(t_10x/t_1x)/ln(10) on the STATE factor — ~0 confirms
  * the claim, ~1 would mean the gate re-scans its corpus per batch.
  * min-of-2 with fresh stores per pass (checkpoint state is
  * single-use; the plan-cache discipline from the r11 lesson).
  *
  * Measured 2026-08-15, local[32] (shuffle.partitions 4 in-gate, the
  * graded keys' setting), sf0.1 documents, min-of-2:
  *
  *  | leg | gate                 | t @1x state | t @10x state | exponent | claim |
  *  |-----|----------------------|-------------|--------------|----------|-------|
  *  | 27  | stream_neardup_gate  | 4.83 s      | 3.96 s       | -0.09    | ~0    |
  *  | 28  | stream_segdedup_gate | 1.86 s      | 1.78 s       | -0.02    | ~0    |
  *  | 29  | stream_decontam_gate | 1.18 s      | 1.31 s       | 0.04     | ~0    |
  *
  * Reading: all three gates hold the law FLAT — a 10x state behind
  * the door moves the fixed batch's cost by at most a 0.04 exponent
  * (the two negative exponents are run-to-run noise: the day-2
  * microbatch is overhead-dominated at this batch size, and the 10x
  * runs benefit from a warmer JVM). The per-batch cost is the batch's
  * own signature/probe work plus the stored-index probe join, whose
  * scan term stays off the critical path at these sizes; at 100 TB
  * that term is what the bucketed-store layout bounds — the index is
  * bucketed on the band/gram key, so the probe reads only matching
  * buckets. No gate re-derives corpus-sized work per microbatch; the
  * decontam gate's check side (the eval-gram index) is FIXED by
  * design and only the corpus append grows.
  *
  * Run: `sbt "runMain graft.examples.StressR13"` (local[32]).
  */
object StressR13 {

  private def timed[A](label: String)(f: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val a = f
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[stress] $label%-52s $sec%8.2f s")
    (sec, a)
  }

  private def exponent(t1: Double, tN: Double, factor: Double): Double =
    math.log(tN / t1) / math.log(factor)

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.driver.memory", "24g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    val docs = Tables.documents(spark, d).select(col("doc_id"), col("text"))
    val stateBase = docs.filter(col("doc_id") < 4500)
    val batch = docs.filter(col("doc_id") >= 4500) // fixed 500-doc day 2
    val Off = 1000000000L
    def stateCopies(n: Int): DataFrame =
      (0 until n).map(i =>
        stateBase.withColumn("doc_id", col("doc_id") + lit(i * Off)))
        .reduce(_ unionByName _)

    /** Bootstrap `state` through `mkGate`'s stream untimed, then time
      * ONLY the fixed day-2 batch's microbatch. Fresh dirs per call.
      */
    def runGate(label: String, state: DataFrame,
                mkGate: (DataFrame, String, String) =>
                  org.apache.spark.sql.streaming.StreamingQuery): Double = {
      val base = TempDirs.create("graft_stress13_")
      val inDir = s"$base/in"; val root = s"$base/store"
      state.write.parquet(inDir)
      val sec = withShufflePartitions(spark, 4) {
        val stream = spark.readStream.schema(docs.schema).parquet(inDir)
        val q = mkGate(stream, root, s"$base/ckpt")
        try {
          q.processAllAvailable() // bootstrap: untimed state build
          batch.write.mode("append").parquet(inDir)
          timed(label)(q.processAllAvailable())._1
        } finally q.stop()
      }
      TempDirs.delete(base)
      sec
    }

    def minOf2(label: String, state: => DataFrame,
               mkGate: (DataFrame, String, String) =>
                 org.apache.spark.sql.streaming.StreamingQuery): Double =
      math.min(runGate(s"$label (pass 1)", state, mkGate),
        runGate(s"$label (pass 2)", state, mkGate))

    def leg(name: String,
            mkGate: (DataFrame, String, String) =>
              org.apache.spark.sql.streaming.StreamingQuery): Unit = {
      println(s"[stress] === $name: fixed 500-doc batch vs 1x/10x state ===")
      val t1 = minOf2(s"$name day2 @1x state", stateCopies(1), mkGate)
      val tN = minOf2(s"$name day2 @10x state", stateCopies(10), mkGate)
      println(f"[stress] $name%-24s exponent ${exponent(t1, tN, 10.0)}%5.2f " +
        f"(t1=$t1%.2f s, t10=$tN%.2f s, state factor 10)")
    }

    // ---- Leg 27: MinHash near-dup gate ----
    leg("leg27 neardup_gate", (stream, root, ckpt) =>
      graft.streaming.EventStream.nearDupGate(stream, root, ckpt,
        "doc_id", "text", n = 3, numHashes = 32, bands = 16,
        threshold = 0.5,
        shingleHash = graft.functions.Text.portableHash60))

    // ---- Leg 28: segment-dedup gate ----
    leg("leg28 segdedup_gate", (stream, root, ckpt) =>
      graft.streaming.EventStream.segmentDedupGate(stream, root, ckpt,
        "doc_id", "text", window = 20))

    // ---- Leg 29: decontamination gate (fixed eval-gram index) ----
    val evalIdx = graft.operators.Dedup.evalGramIndex(
      docs.filter(col("doc_id") % 10 === 0), "doc_id", "text", n = 3)
    leg("leg29 decontam_gate", (stream, root, ckpt) =>
      graft.streaming.EventStream.decontamGate(stream, evalIdx, root, ckpt,
        "doc_id", "text", n = 3, minCommon = 3))

    spark.stop()
  }
}
