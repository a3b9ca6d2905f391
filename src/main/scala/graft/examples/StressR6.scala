package graft.examples

import graft.{Par, Tables}
import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 10× scale-replication stress for the round-4 operators (SURVEY §5
  * methodology, same as the round-2/3 sweeps): replicate the sf
  * tables 10× with near-dup perturbation, run each operator at 1×
  * and 10× IN THE SAME WARM JVM (bench-noise methodology — cross-JVM
  * single runs are ±1.5 s noise), and report the scaling ratio. A
  * bucketed/linear design should scale at-or-below its OUTPUT
  * growth; anything super-linear in INPUT is a candidate blow-up.
  *
  * Run: `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
  *       sbt "runMain graft.examples.StressR6"`
  */
object StressR6 {

  private def force(df: DataFrame): Long = df.queryExecution.toRdd.count()

  private def timed(name: String)(df: => DataFrame): (Double, Long) = {
    val t0 = System.nanoTime()
    val n = force(df)
    val sec = (System.nanoTime() - t0) / 1e9
    Par.release()
    println(f"[stress] $name%-34s $sec%8.2f s  ($n rows)")
    (sec, n)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val K = 10
    // near-dup replication: replica k of a doc appends a k-tagged
    // suffix — a few changed shingles, so replicas stay ABOVE the 0.5
    // Jaccard threshold against their original (bigger dup families,
    // the adversarial direction for pair/cluster operators)
    val docs0 = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val reps = array((0 until K).map(lit): _*)
    val docs10 = docs0
      .withColumn("rep", explode(reps))
      .select((col("doc_id") + col("rep").cast("long") * lit(10000000L)).as("doc_id"),
        when(col("rep") === 0, col("text"))
          .otherwise(concat(col("text"), lit(" replica tag "),
            col("rep").cast("string"))).as("text"))

    // --- connected components over near-dup pairs ---
    // maxIter=8 doubles as the diameter-boundedness assertion: dup
    // families are dense, so min-label propagation must converge in a
    // handful of rounds even when every family is 10× bigger —
    // non-convergence throws instead of silently looping
    def pairs(d: DataFrame) =
      Dedup.ngramJaccard(d, "doc_id", "text", n = 3, threshold = 0.5,
        maxDocFreq = 1000)
    val (cc1, ccn1) = timed("dedup_components 1x") {
      Dedup.connectedComponents(pairs(docs0), maxIter = 8)
    }
    val (cc10, ccn10) = timed("dedup_components 10x") {
      Dedup.connectedComponents(pairs(docs10), maxIter = 8)
    }

    // --- tf-idf ---
    val (tf1, _) = timed("doc_tfidf 1x") {
      graft.functions.Text.tfIdf(docs0, "doc_id", "text", docs0.count())
    }
    val (tf10, _) = timed("doc_tfidf 10x") {
      graft.functions.Text.tfIdf(docs10, "doc_id", "text", docs10.count())
    }

    // --- winnowing fingerprints (exploded — forces the array) ---
    val (wn1, _) = timed("doc_winnow 1x") {
      docs0.select(col("doc_id"),
        explode(graft.functions.Text.winnow(col("text"))).as("fingerprint"))
    }
    val (wn10, _) = timed("doc_winnow 10x") {
      docs10.select(col("doc_id"),
        explode(graft.functions.Text.winnow(col("text"))).as("fingerprint"))
    }

    // --- winnow substring-run pairs (r6 op; pair output grows ~
    // family², the adversarial direction) ---
    val (sr1, srn1) = timed("doc_shared_runs 1x") {
      Dedup.sharedRuns(docs0, "doc_id", "text", k = 5, w = 4,
        minShared = 1, maxDocFreq = 1000)
    }
    val (sr10, srn10) = timed("doc_shared_runs 10x") {
      Dedup.sharedRuns(docs10, "doc_id", "text", k = 5, w = 4,
        minShared = 1, maxDocFreq = 1000)
    }

    // --- corpus-unigram surprisal (r6 op) ---
    val (su1, _) = timed("doc_surprisal 1x") {
      graft.functions.Text.unigramSurprisal(docs0, "doc_id", "text")
    }
    val (su10, _) = timed("doc_surprisal 10x") {
      graft.functions.Text.unigramSurprisal(docs10, "doc_id", "text")
    }

    // --- streaming CDC apply (applyUpserts on static input) ---
    // replicas shift BOTH event_id and user_id: 10× rows AND 10× keys,
    // so the keyed upsert state scales with the data instead of
    // collapsing onto the original keys
    val ev0 = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"), col("value"))
    def evRep(d: DataFrame) = d
      .withColumn("rep", explode(reps))
      .select((col("user_id") + col("rep").cast("long") * lit(1000000000L)).as("user_id"),
        (col("event_id") + col("rep").cast("long") * lit(1000000000L)).as("event_id"),
        col("ts"), col("event_type"), col("value"))
    def streamCdc(ev: DataFrame, tag: String): DataFrame = {
      val base = java.nio.file.Files.createTempDirectory(s"graft_stress_$tag").toString
      val inDir = s"$base/in"; val target = s"$base/target"; val ckpt = s"$base/ckpt"
      val cutoff = lit("2024-01-20 00:00:00").cast("timestamp")
      ev.filter(col("ts") <= cutoff).write.parquet(inDir)
      val q = graft.streaming.EventStream.applyUpserts(
        graft.streaming.EventStream.read(spark, inDir),
        target, ckpt, Seq("user_id"), "ts", Seq("event_id"))
      try {
        q.processAllAvailable()
        ev.filter(col("ts") > cutoff).write.mode("append").parquet(inDir)
        q.processAllAvailable()
      } finally q.stop()
      spark.read.parquet(target)
    }
    val (sc1, scn1) = timed("stream_cdc_apply 1x")(streamCdc(ev0, "cdc1"))
    val (sc10, scn10) = timed("stream_cdc_apply 10x")(streamCdc(evRep(ev0), "cdc10"))

    println(f"[stress] ratios: components ${cc10 / cc1}%.1fx (labels $ccn1 -> $ccn10), " +
      f"tfidf ${tf10 / tf1}%.1fx, winnow ${wn10 / wn1}%.1fx, " +
      f"shared_runs ${sr10 / sr1}%.1fx (pairs $srn1 -> $srn10), " +
      f"surprisal ${su10 / su1}%.1fx, " +
      f"stream_cdc ${sc10 / sc1}%.1fx (rows $scn1 -> $scn10)")
    spark.stop()
  }
}
