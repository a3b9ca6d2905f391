package graft.examples

import graft.{Par, Tables}
import graft.functions.Text
import graft.operators.{Dedup, Pack, Sampling}
import graft.pipeline.Analytics
import graft.sources.Sink
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 10× scale-replication stress for the round-6/7 WRITE and MIX paths
  * (SURVEY §5 methodology; same warm-JVM 1×-vs-10× protocol as
  * StressR6): incremental exact dedup, weighted corpus mixing, and
  * the staged JDBC upsert against a live Derby warehouse. A correct
  * design scales at-or-below its OUTPUT growth; anything super-linear
  * in INPUT is a candidate blow-up.
  *
  * Run: `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
  *       sbt "runMain graft.examples.StressR7"`
  */
object StressR7 {

  private def force(df: DataFrame): Long = df.queryExecution.toRdd.count()

  private def timed(name: String)(body: => Long): (Double, Long) = {
    val t0 = System.nanoTime()
    val n = body
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
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val K = 10
    val reps = array((0 until K).map(lit): _*)
    val docs0 = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    // replicas get DISTINCT content (k-tagged suffix) and distinct ids:
    // 10× rows AND ~10× distinct hashes — the index/batch both grow,
    // the adversarial direction for incremental dedup
    def docsRep(d: DataFrame) = d
      .withColumn("rep", explode(reps))
      .select((col("doc_id") + col("rep").cast("long") * lit(10000000L)).as("doc_id"),
        when(col("rep") === 0, col("text"))
          .otherwise(concat(col("text"), lit(" replica tag "),
            col("rep").cast("string"))).as("text"))
    val docs10 = docsRep(docs0)

    // --- incremental exact dedup: batch anti-joined against the
    // keeper index; every shuffle delta-sized ---
    def incr(d: DataFrame): Long = {
      val index = Dedup.exact(d.filter(col("doc_id") % lit(2L) === 0), "doc_id", "text")
      force(Dedup.exactIncremental(index,
        d.filter(col("doc_id") % lit(2L) =!= 0), "doc_id", "text"))
    }
    val (in1, inn1) = timed("dedup_exact_incremental 1x")(incr(docs0))
    val (in10, inn10) = timed("dedup_exact_incremental 10x")(incr(docs10))

    // --- weighted mix: N parallel filtered scans, zero shuffle; the
    // quota-count job is the only extra pass ---
    def mix(d: DataFrame, target: Long): Long = {
      def slice(r: Int) = d.filter(pmod(col("doc_id"), lit(3)) === r)
      force(Sampling.mixWeighted(Seq(
        ("web", slice(0), 0.6), ("code", slice(1), 0.3), ("books", slice(2), 0.1)),
        "doc_id", targetRows = target))
    }
    val (mx1, mxn1) = timed("sample_mix 1x")(mix(docs0, 300L))
    val (mx10, mxn10) = timed("sample_mix 10x")(mix(docs10, 3000L))

    // --- staged JDBC upsert into Derby: target pre-seeded identically,
    // delta 10× → wire + stage + merge should scale ~ delta ---
    val ev0 = Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
      .withColumn("ver", col("ts").cast("long"))
      .select(col("event_id"), col("ver"), col("event_type"), col("value"))
    def evRep(d: DataFrame) = d
      .withColumn("rep", explode(reps))
      .select((col("event_id") + col("rep").cast("long") * lit(1000000000L)).as("event_id"),
        col("ver"), col("event_type"), col("value"))
    def jdbcUp(delta: DataFrame, tag: String): Long = {
      val url = s"jdbc:derby:memory:stress$tag;create=true"
      // pre-seed the target with half the base delta so the merge does
      // real delete+insert work, not just a fresh load
      Sink.jdbcUpsert(ev0.filter(col("event_id") % 2 === 0), url, "wh",
        Seq("event_id"), "ver")
      Sink.jdbcUpsert(delta, url, "wh", Seq("event_id"), "ver")
    }
    val (up1, upn1) = timed("jdbc_upsert 1x")(jdbcUp(ev0, "a"))
    val (up10, upn10) = timed("jdbc_upsert 10x")(jdbcUp(evRep(ev0), "b"))

    // --- late-r7 batch operators: replicas carry DISTINCT users/ids
    // so per-user state and output both grow 10× ---
    val evRaw = Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
    def evRawRep(d: DataFrame) = d
      .withColumn("rep", explode(reps))
      .select((col("event_id") + col("rep").cast("long") * lit(1000000000L)).as("event_id"),
        col("ts"),
        (col("user_id") + col("rep").cast("long") * lit(10000000L)).as("user_id"),
        col("event_type"))
    val evRaw10 = evRawRep(evRaw)
    def fun(d: DataFrame) = Analytics.funnel(d, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"))
    def ret(d: DataFrame) = Analytics.retention(d, "user_id", "ts")
    val (fu1, fun1) = timed("events_funnel 1x")(force(fun(evRaw)))
    val (fu10, fun10) = timed("events_funnel 10x")(force(fun(evRaw10)))
    val (re1, ren1) = timed("events_retention 1x")(force(ret(evRaw)))
    val (re10, ren10) = timed("events_retention 10x")(force(ret(evRaw10)))
    val (ch1, chn1) = timed("doc_chunk 1x")(
      force(Pack.chunkTokens(docs0, "doc_id", "text", 32, 24)))
    val (ch10, chn10) = timed("doc_chunk 10x")(
      force(Pack.chunkTokens(docs10, "doc_id", "text", 32, 24)))
    val (ng1, ngn1) = timed("doc_ngram_repetition 1x")(
      force(Text.ngramRepetition(docs0, "doc_id", "text", 3)))
    val (ng10, ngn10) = timed("doc_ngram_repetition 10x")(
      force(Text.ngramRepetition(docs10, "doc_id", "text", 3)))
    val (tt1, ttn1) = timed("corpus_top_terms_approx 1x")(
      force(Text.topTermsApprox(docs0, "doc_id", "text", 20, 256)))
    val (tt10, ttn10) = timed("corpus_top_terms_approx 10x")(
      force(Text.topTermsApprox(docs10, "doc_id", "text", 20, 256)))
    def funW(d: DataFrame) = Analytics.funnelWindowed(d, "user_id",
      "event_type", "ts", Seq("view", "click", "purchase"), 3600L)
    val (fw1, fwn1) = timed("events_funnel_windowed 1x")(force(funW(evRaw)))
    val (fw10, fwn10) = timed("events_funnel_windowed 10x")(force(funW(evRaw10)))

    // --- incremental near-dup family: index = even docs, batch = odd
    // (both sides 10× in the replicated run) ---
    def mhInc(d: DataFrame): Long = {
      val (ish, ibd) = Dedup.minHashIndexFrames(
        d.filter(col("doc_id") % 2 === 0), "doc_id", "text", 3, 32, 16)
      force(Dedup.minHashLshIncremental(ish, ibd,
        d.filter(col("doc_id") % 2 =!= 0), "doc_id", "text", 3, 32, 16, 0.5))
    }
    def shInc(d: DataFrame): Long = {
      val idx = Dedup.simHashIndexFrame(
        d.filter(col("doc_id") % 2 === 0), "doc_id", "text", 3, 3)
      force(Dedup.simHashIncremental(idx,
        d.filter(col("doc_id") % 2 =!= 0), "doc_id", "text", 3, 3))
    }
    val (mi1, min1) = timed("minhash_incremental 1x")(mhInc(docs0))
    val (mi10, min10) = timed("minhash_incremental 10x")(mhInc(docs10))
    val (si1, sin1) = timed("simhash_incremental 1x")(shInc(docs0))
    val (si10, sin10) = timed("simhash_incremental 10x")(shInc(docs10))

    println(f"[stress] ratios: exact_incremental ${in10 / in1}%.1fx " +
      f"(survivors $inn1 -> $inn10), mix ${mx10 / mx1}%.1fx " +
      f"(rows $mxn1 -> $mxn10), jdbc_upsert ${up10 / up1}%.1fx " +
      f"(delta $upn1 -> $upn10), funnel ${fu10 / fu1}%.1fx " +
      f"(users $fun1 -> $fun10), retention ${re10 / re1}%.1fx " +
      f"(cells $ren1 -> $ren10), chunk ${ch10 / ch1}%.1fx " +
      f"(chunks $chn1 -> $chn10), ngram_rep ${ng10 / ng1}%.1fx, " +
      f"mg_topk ${tt10 / tt1}%.1fx, funnel_windowed ${fw10 / fw1}%.1fx " +
      f"(users $fwn1 -> $fwn10), minhash_inc ${mi10 / mi1}%.1fx " +
      f"(pairs $min1 -> $min10), simhash_inc ${si10 / si1}%.1fx " +
      f"(pairs $sin1 -> $sin10)")
    spark.stop()
  }
}
