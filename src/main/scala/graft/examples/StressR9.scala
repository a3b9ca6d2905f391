package graft.examples

import graft.functions.Bpe
import graft.operators.Dedup
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-9 stress legs — the new operators at the sizes where their
  * 100 TB claims are measurable:
  *
  * Leg 14 — segment-level dedup at 200k docs / 600k 20-word
  * segments, hash-keyed winner aggregation (shipped) vs a
  * string-keyed control, SHUFFLE BYTES metered: the winner agg is
  * the corpus-distinct-sized exchange, so its key width is the
  * at-scale cost driver (CCNet ships sha1 prefixes for the same
  * reason). Identical outputs asserted.
  *
  * Leg 15 — BPE merge learning over a 100k-word-type vocabulary
  * (the word-TYPE table of a web-scale corpus slice), 10 merges:
  * per-iteration wall must be flat vocab-sized work, and the
  * corpus-sized explode must happen ONCE — measured by comparing a
  * 1× vs 8× corpus replication at the SAME vocabulary (iterations
  * ride the word-type table, so only the one-time count build may
  * grow).
  *
  * Run: `sbt "runMain graft.examples.StressR9"` (local[32]).
  */
object StressR9 {

  private final class ShuffleMeter extends SparkListener {
    val bytes = new java.util.concurrent.atomic.AtomicLong
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
      if (t.taskMetrics != null)
        bytes.addAndGet(t.taskMetrics.shuffleWriteMetrics.bytesWritten)
  }

  private def timed[A](label: String)(f: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val a = f
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[stress] $label%-48s $sec%8.2f s")
    (sec, a)
  }

  private def metered[A](spark: SparkSession, label: String)(f: => A): (Double, Long, A) = {
    val m = new ShuffleMeter
    spark.sparkContext.addSparkListener(m)
    val (sec, a) =
      try timed(label)(f)
      finally {
        Thread.sleep(2000) // async listener bus; harness-grade
        spark.sparkContext.removeSparkListener(m)
      }
    println(f"[stress]   shuffle written: ${m.bytes.get / 1e6}%10.1f MB")
    (sec, m.bytes.get, a)
  }

  private def force(df: DataFrame): Long = df.queryExecution.toRdd.count()

  /** String-keyed control for leg 14: [[Dedup.segmentDedup]] with the
    * winner aggregation and marker join keyed on the SEGMENT TEXT —
    * the design the shipped operator rejects.
    */
  private def segmentDedupStringKeyed(docs: DataFrame, window: Int): DataFrame = {
    val segsCol = element_at(transform(
      array(split(graft.functions.Text.normalize(col("text")), " ")), ws =>
        transform(sequence(lit(0), ceil(size(ws).cast("double") / window).cast("int") - 1),
          i => concat_ws(" ", slice(ws, i * window + 1, lit(window))))), 1)
    val segs = graft.Par.persistTracked(
      graft.Par.widen(docs.select(col("doc_id"), col("text")), "doc_id")
        .select(col("doc_id"), posexplode(segsCol).as(Seq("seg_no", "seg"))))
    val winners = segs
      .groupBy(col("seg"))
      .agg(min(struct(col("doc_id"), col("seg_no"))).as("first"))
      .select(col("seg"), col("first.doc_id").as("w_doc"),
        col("first.seg_no").as("w_seg"))
    val marked = segs.join(winners, Seq("seg"))
      .withColumn("kept",
        col("doc_id") === col("w_doc") && col("seg_no") === col("w_seg"))
    marked.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_segments"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        array_sort(collect_list(when(col("kept"),
          struct(col("seg_no"), col("seg"))))).as("kept_segs"))
      .select(col("doc_id"),
        when(col("n_kept") === 0, lit(null).cast("string"))
          .otherwise(array_join(transform(col("kept_segs"), s => s("seg")), " "))
          .as("text_dedup"),
        col("n_segments"), col("n_kept"))
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

    // --- Leg 14: segment dedup, hash vs string winner keys ---
    // 200k docs × 3 segments; segment content drawn from a 400k-id
    // pool (≈1/3 of segments are cross-doc duplicates); 20 words of
    // ~6 chars each ≈ 130-byte segment strings. Through parquet so
    // scan/shuffle volumes are representative.
    val dir = java.nio.file.Files.createTempDirectory("stress_segdedup").toString
    val nDocs = 200000L
    spark.range(nDocs).select(col("id").as("doc_id"),
        concat_ws(" ", transform(sequence(lit(0), lit(2)), j => {
          val contentId = pmod(xxhash64(col("id") * 3 + j), lit(400000L))
          concat_ws(" ", transform(sequence(lit(0), lit(19)),
            t => concat(lit("w"), pmod(contentId * 31 + t * 7, lit(99991L)))))
        })).as("text"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dir/docs")
    val docs = spark.read.parquet(s"$dir/docs")

    // warmup both shapes untimed (scan cache + codegen), per the
    // Bench.scala min-of-passes discipline
    force(Dedup.segmentDedup(docs, "doc_id", "text", 20)); graft.Par.release()
    force(segmentDedupStringKeyed(docs, 20)); graft.Par.release()
    val (hSec, hBytes, hRows) = metered(spark, "segmentDedup hash-keyed (shipped)") {
      val n = force(Dedup.segmentDedup(docs, "doc_id", "text", 20))
      graft.Par.release(); n
    }
    val (sSec, sBytes, sRows) = metered(spark, "segmentDedup string-keyed (control)") {
      val n = force(segmentDedupStringKeyed(docs, 20))
      graft.Par.release(); n
    }
    require(hRows == sRows, s"row drift: $hRows vs $sRows")
    // identical outputs (hash collisions would surface here)
    val a = Dedup.segmentDedup(docs, "doc_id", "text", 20)
    val b = segmentDedupStringKeyed(docs, 20)
    val drift = a.join(b, Seq("doc_id"))
      .filter(a("text_dedup") =!= b("text_dedup") ||
        a("n_kept") =!= b("n_kept")).count()
    graft.Par.release()
    require(drift == 0, s"$drift docs differ between hash and string keying")
    println(f"[stress] leg14: hash ${hBytes / 1e6}%.1f MB vs string ${sBytes / 1e6}%.1f MB " +
      f"(${100.0 * hBytes / math.max(1L, sBytes)}%.1f%% of control), " +
      f"wall $hSec%.2f vs $sSec%.2f s, outputs identical")

    // --- Leg 15: BPE at a 100k-type vocabulary ---
    // corpus words drawn zipf-ish over 100k types built from base-26
    // letterings; 2M-word corpus (1×) vs 16M (8×) — same vocabulary
    def corpus(mult: Int): DataFrame =
      spark.range(2000000L * mult)
        .select((col("id") % (10000L * mult)).as("doc_id"),
          concat(lit("t"),
            pmod(xxhash64(col("id") % 337331L), lit(100000L)),
            lit("x"),
            pmod(xxhash64(col("id") % 337331L, lit(7)), lit(26L))).as("word"))
        .groupBy(col("doc_id"))
        .agg(concat_ws(" ", collect_list(col("word"))).as("text"))
    val c1 = corpus(1)
    val (t1, _) = timed("BPE 10 merges, 2M-word corpus") {
      force(Bpe.learnMerges(c1, "doc_id", "text", numMerges = 10))
      graft.Par.release()
    }
    val c8 = corpus(8)
    val (t8, _) = timed("BPE 10 merges, 16M-word corpus (same vocab)") {
      force(Bpe.learnMerges(c8, "doc_id", "text", numMerges = 10))
      graft.Par.release()
    }
    println(f"[stress] leg15: 8x corpus cost ratio ${t8 / t1}%.2f (iterations ride " +
      "the word-TYPE table; only the one-time count build may grow)")

    spark.stop()
  }
}
