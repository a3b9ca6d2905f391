package graft.examples

import graft.operators.Graph
import graft.pipeline.Analytics
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-9 continuation stress legs — the new operators priced at the
  * sizes where their scale claims are measurable:
  *
  * Leg 16 — k-core peeling form A/B on a 1M-edge power-law-ish
  * graph: the SHIPPED removal-peel (anti-join the just-removed
  * nodes, empty at the fixed point) vs the survivor-semi-join
  * control (the first cut: two edge×survivor semi-joins per round).
  * Identical cores asserted; the control re-shuffles the full edge
  * set against the full survivor set every round, the shipped form
  * only ever moves the shrinking removal frontier.
  *
  * Leg 17 — frequentSequences containment GROWTH LAW at 20k users:
  * the SHIPPED occurrence-statistics form (per-user work = |types|²
  * occurrence rows) vs the naive event-pair self-join control
  * (per-user work = |events|²) for the length-2 tier, measured at
  * 40 AND 160 events/user — 4× history multiplies the naive pair
  * volume 16× while the shipped form's work is type-bounded.
  * Identical frequent pairs asserted at both sizes.
  *
  * Leg 18 — theilSenTrend: cost follows the CAP, not the history —
  * 4× history at fixed maxPoints must hold the wall ~flat (pair
  * volume unchanged), 2× cap at fixed history pays the fan-out
  * (the structural O(cap²) bound the Scaladoc claims).
  *
  * Run: `sbt "runMain graft.examples.StressR9b"` (local[32]).
  */
object StressR9b {

  private def timed[A](label: String)(f: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val a = f
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[stress] $label%-52s $sec%8.2f s")
    (sec, a)
  }

  private def force(df: DataFrame): Long = df.queryExecution.toRdd.count()

  /** The survivor-semi-join k-core control (the replaced first cut). */
  private def kCoreSurvivor(edges: DataFrame, k: Int): DataFrame = {
    val e = graft.Par.persistTracked(
      edges.select(least(col("a"), col("b")).as("a"),
          greatest(col("a"), col("b")).as("b"))
        .filter(col("a") < col("b")).distinct())
    def degrees(es: DataFrame): DataFrame =
      es.select(col("a").as("n")).unionByName(es.select(col("b").as("n")))
        .groupBy(col("n")).agg(count(lit(1)).as("core_deg"))
    var nodes = graft.Par.persistTracked(
      e.select(col("a").as("n")).unionByName(e.select(col("b").as("n"))).distinct())
    var prev = -1L
    var cnt = nodes.count()
    while (cnt != prev && cnt > 0) {
      prev = cnt
      val ee = e
        .join(nodes.withColumnRenamed("n", "a"), Seq("a"), "left_semi")
        .join(nodes.withColumnRenamed("n", "b"), Seq("b"), "left_semi")
      nodes = graft.Par.persistTracked(
        degrees(ee).filter(col("core_deg") >= k).select(col("n")))
      cnt = nodes.count()
    }
    val core = e
      .join(nodes.withColumnRenamed("n", "a"), Seq("a"), "left_semi")
      .join(nodes.withColumnRenamed("n", "b"), Seq("b"), "left_semi")
    degrees(core).select(col("n").as("node"), col("core_deg"))
  }

  /** Naive length-2 sequential-pattern control: every ordered event
    * pair per user, then distinct (user, t1, t2) — the |events|²/user
    * join the occurrence-statistics form exists to avoid.
    */
  private def freq2Naive(events: DataFrame, minCount: Long): DataFrame = {
    val a = events.select(col("u"), col("t").as("p1"), col("p").as("__pa"))
    val b = events.select(col("u"), col("t").as("p2"), col("p").as("__pb"))
    a.join(b, Seq("u"))
      .filter(col("__pa") < col("__pb"))
      .select(col("u"), col("p1"), col("p2")).distinct()
      .groupBy(col("p1"), col("p2")).agg(count(lit(1)).as("support"))
      .filter(col("support") >= minCount)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.driver.memory", "8g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // ---- Leg 16: k-core removal-peel vs survivor-semi-join ----
    // 1.2M edges: a NEAR-CRITICAL random graph (200k nodes, avg
    // degree 10 < k=16 — peeling cascades over many rounds, small
    // frontier per round: the shape that punishes per-round
    // full-edge × full-survivor work) + a dense 3k-node slab that
    // survives as the core
    println("[stress] === Leg 16: k-core peel form (1.2M edges) ===")
    val nearCritical = spark.range(0, 1000000L)
      .select(pmod(xxhash64(col("id")), lit(200000L)).as("a"),
        pmod(xxhash64(col("id") + 1000000000L), lit(200000L)).as("b"))
      .filter(col("a") =!= col("b"))
    val slab = spark.range(0, 200000L)
      .select((pmod(xxhash64(col("id") + 5L), lit(3000L)) + 200000L).as("a"),
        (pmod(xxhash64(col("id") + 7000000000L), lit(3000L)) + 200000L).as("b"))
      .filter(col("a") =!= col("b"))
    val g = graft.Par.persistTracked(nearCritical.unionByName(slab))
    force(g)
    val (tShip, coreShip) = timed("kCore shipped (removal peel), k=16") {
      val r = Graph.kCore(g, "a", "b", k = 16, maxIterations = 60)
      val n = force(r); (n, r)
    }
    val (tCtrl, coreCtrl) = timed("kCore control (survivor semi-join), k=16") {
      val r = kCoreSurvivor(g, k = 16)
      val n = force(r); (n, r)
    }
    val shipRows = coreShip._2.orderBy("node").collect().toSeq
    val ctrlRows = coreCtrl._2.orderBy("node").collect().toSeq
    require(shipRows == ctrlRows, "k-core forms disagree")
    println(f"[stress] leg16: identical cores (${shipRows.size} nodes); " +
      f"control/shipped wall = ${tCtrl / tShip}%.2fx")
    graft.Par.release()

    // ---- Leg 17: frequentSequences occurrence stats vs event pairs ----
    // the claim under test is the GROWTH LAW, not a point ratio: the
    // naive event-pair form is |events|²/user, the shipped
    // occurrence-statistics form is |types|²/user — so scaling
    // history 40 → 160 events/user (4×) must grow the naive wall
    // ~16× in pair volume while the shipped wall stays type-bounded
    println("[stress] === Leg 17: sequence containment growth law (20k users) ===")
    def mkEvents(perUser: Long): DataFrame =
      graft.Par.persistTracked(spark.range(0, 20000L * perUser).select(
        (col("id") % 20000L).as("u"),
        concat(lit("t"), pmod(xxhash64(col("id")), lit(8L))).as("t"),
        (col("id") / 20000L).cast("long").as("p")))
    def freq2Occ(ev: DataFrame, minCount: Long): Set[(String, String, Long)] = {
      val occ = ev.groupBy(col("u"), col("t"))
        .agg(min(col("p")).as("minp"), max(col("p")).as("maxp"))
      occ.select(col("u"), col("t").as("p1"), col("minp").as("__m1"))
        .join(occ.select(col("u"), col("t").as("p2"), col("maxp").as("__m2")), Seq("u"))
        .filter(col("__m1") < col("__m2"))
        .groupBy(col("p1"), col("p2")).agg(count(lit(1)).as("support"))
        .filter(col("support") >= minCount)
        .collect().map(x => (x.getString(0), x.getString(1), x.getLong(2))).toSet
    }
    def minOf2[A](label: String)(f: => A): (Double, A) = {
      val (t1, a) = timed(s"$label (pass 1)")(f)
      val (t2, _) = timed(s"$label (pass 2)")(f)
      (math.min(t1, t2), a)
    }
    val walls17 = Seq(40L, 160L).map { perUser =>
      val ev = mkEvents(perUser)
      force(ev)
      val minCount = 10000L
      val (tOcc, occPairs) = minOf2(s"freq2 shipped, $perUser ev/user")(
        freq2Occ(ev, minCount))
      val (tNaive, naivePairs) = minOf2(s"freq2 control, $perUser ev/user")(
        freq2Naive(ev, minCount)
          .collect().map(x => (x.getString(0), x.getString(1), x.getLong(2))).toSet)
      require(occPairs == naivePairs, s"sequence forms disagree at $perUser")
      graft.Par.release()
      (perUser, tOcc, tNaive)
    }
    val (_, o40, n40) = walls17(0); val (_, o160, n160) = walls17(1)
    println(f"[stress] leg17: 4x history -> shipped ${o160 / o40}%.2fx wall, " +
      f"naive ${n160 / n40}%.2fx wall (pair volume 16x)")

    // ---- Leg 18: theilSenTrend — cost follows the CAP, not history ----
    println("[stress] === Leg 18: Theil-Sen cap-vs-history scaling (2k keys) ===")
    def mkSeries(perKey: Long): DataFrame =
      graft.Par.persistTracked(spark.range(0, 2000L * perKey).select(
        (col("id") % 2000L).as("user_id"),
        col("id").as("event_id"),
        (lit(1704067200L) + (col("id") / 2000L) * 60L).cast("timestamp").as("ts"),
        (pmod(xxhash64(col("id")), lit(1000L)).cast("double") / 10.0).as("value")))
    val s200 = mkSeries(200L); force(s200)
    val s800 = mkSeries(800L); force(s800)
    // warmup (codegen/JIT: observed 6.7 s cold vs 1.6 s warm on
    // identical plans)
    force(Analytics.theilSenTrend(s200, "user_id", "event_id", "ts", "value",
      maxPoints = 100))
    val (tH200, _) = minOf2("theilSen cap=100, history=200")(
      force(Analytics.theilSenTrend(s200, "user_id", "event_id", "ts", "value",
        maxPoints = 100)))
    val (tH800, _) = minOf2("theilSen cap=100, history=800")(
      force(Analytics.theilSenTrend(s800, "user_id", "event_id", "ts", "value",
        maxPoints = 100)))
    val (tC200, _) = minOf2("theilSen cap=200, history=800")(
      force(Analytics.theilSenTrend(s800, "user_id", "event_id", "ts", "value",
        maxPoints = 200)))
    println(f"[stress] leg18: 4x history at fixed cap = ${tH800 / tH200}%.2fx wall " +
      f"(pair volume flat); 2x cap at fixed history = ${tC200 / tH800}%.2fx wall " +
      f"(pair volume 4x)")
    graft.Par.release()
    spark.stop()
  }
}
