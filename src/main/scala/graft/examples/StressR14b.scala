package graft.examples

import graft.{Tables, TempDirs}
import graft.EntryHelpers.withShufflePartitions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-14b stress leg — the STATE-GROWTH law for the URL-dedup
  * ingest gate (the StressR13 question asked of the wave-9 door):
  * per-microbatch cost must track BATCH size, not landed-state size.
  *
  * The gate's per-batch state work is two anti-joins against the
  * landed corpus frame (by id, by canonical URL) — a hash join whose
  * probe side is the 500-doc batch and whose build side streams from
  * the store's parquet. The urlGate leg uses HIGH-cardinality URLs
  * (full doc_id in the path) so the landed corpus genuinely grows
  * 10×: the graded key's small-mod synthesis saturates at ~420
  * canonical groups and would fake a flat law by capping the state.
  *
  * Measured (local[32], sf0.1 docs, fixed 500-doc day-2 batch,
  * min-of-2 with fresh stores per pass; exponent =
  * ln(t10/t1)/ln(10)):
  *
  *  | leg | gate               | t @1x state | t @10x state | exp   | claim |
  *  |-----|--------------------|-------------|--------------|-------|-------|
  *  | 37  | url_gate (4.5k→45k landed URLs) | 1.30 s | 0.87 s | −0.18 | ~0  |
  *
  * Reading: a 10× landed corpus does not move the fixed batch's
  * microbatch (the measured drift is JIT warmth, min-of-2 with fresh
  * stores) — the parquet scan floor of the anti-join build side, not
  * per-row probe work; nothing shuffles the state. At 100 TB the
  * same join is the standard stream-vs-big-table hash join: batch
  * broadcast-or-probe side, state scanned columnar, state appended
  * never rewritten.
  *
  * Run: `sbt "runMain graft.examples.StressR14b"` (local[32]).
  */
object StressR14b {

  private def timed(label: String)(f: => Unit): Double = {
    val t0 = System.nanoTime()
    f
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[stress] $label%-52s $sec%8.2f s")
    sec
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

    // high-cardinality raw URLs: every doc its own canonical page,
    // with strip-work (utm param, case noise) still on every row
    def urled(ids: DataFrame): DataFrame = ids.select(col("doc_id"),
      concat(lit("HTTPS://www.ex"), col("doc_id") % 20,
        lit(".example.com/Docs/"), col("doc_id"),
        lit("?utm_source=f&b=2&a=1")).as("url_raw"))

    val docs = Tables.documents(spark, d).select(col("doc_id"))
    val stateBase = docs.filter(col("doc_id") < 4500)
    val batch = urled(docs.filter(col("doc_id") >= 4500))
    val Off = 1000000000L
    def stateCopies(n: Int): DataFrame =
      urled((0 until n).map(i =>
          stateBase.withColumn("doc_id", col("doc_id") + lit(i * Off)))
        .reduce(_ unionByName _))

    def runGate(label: String, state: DataFrame): Double = {
      val base = TempDirs.create("graft_stress14b_")
      val inDir = s"$base/in"; val root = s"$base/store"
      state.write.parquet(inDir)
      val sec = withShufflePartitions(spark, 4) {
        val stream = spark.readStream.schema(batch.schema).parquet(inDir)
        val q = graft.streaming.EventStream.urlGate(stream, root,
          s"$base/ckpt", "doc_id", "url_raw")
        try {
          q.processAllAvailable() // bootstrap: untimed state build
          batch.write.mode("append").parquet(inDir)
          timed(label)(q.processAllAvailable())
        } finally q.stop()
      }
      TempDirs.delete(base)
      sec
    }

    def minOf2(label: String, state: => DataFrame): Double =
      math.min(runGate(s"$label (pass 1)", state),
        runGate(s"$label (pass 2)", state))

    println("[stress] === leg37 url_gate: fixed 500-doc batch vs 1x/10x landed state ===")
    val t1 = minOf2("leg37 url_gate day2 @1x state", stateCopies(1))
    val tN = minOf2("leg37 url_gate day2 @10x state", stateCopies(10))
    println(f"[stress] leg37 url_gate exponent ${exponent(t1, tN, 10.0)}%5.2f " +
      f"(t1=$t1%.2f s, t10=$tN%.2f s, state factor 10)")
    spark.stop()
  }
}
