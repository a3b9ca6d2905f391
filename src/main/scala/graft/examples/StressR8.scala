package graft.examples

import graft.Par
import graft.pipeline.Analytics
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 stress legs (SURVEY §5 methodology, warm-JVM protocol).
  *
  * Leg 1 — HOT-USER windowed funnel A/B: the round-7 verdict flagged
  * `funnelWindowed`'s per-user (starts × events) nested fold; round 8
  * replaced it with the single-pass deadline-pruned walk
  * ([[graft.functions.FunnelWalk]]). The legacy fold is REPRODUCED
  * HERE (harness-only, not in the library) so the speedup is measured
  * against the real thing on the adversarial shape: users whose event
  * streams are long AND carry the full `maxStarts` complement of
  * candidate starts. Correctness: both implementations must agree
  * row-for-row on a smaller replica of the same shape.
  *
  * Run: `sbt "runMain graft.examples.StressR8"`
  */
object StressR8 {

  private def force(df: DataFrame): Long = df.queryExecution.toRdd.count()

  private def timed(name: String)(body: => Long): (Double, Long) = {
    val t0 = System.nanoTime()
    val n = body
    val sec = (System.nanoTime() - t0) / 1e9
    Par.release()
    println(f"[stress] $name%-34s $sec%8.2f s  ($n rows)")
    (sec, n)
  }

  /** The pre-r8 implementation, verbatim semantics: every candidate
    * start re-folds the whole sorted event array.
    */
  private def legacyFunnelWindowed(events: DataFrame, userCol: String,
                                   typeCol: String, tsCol: String,
                                   steps: Seq[String], windowSeconds: Long,
                                   maxStarts: Int = 64): DataFrame = {
    val tsType = events.schema(events.schema.fieldIndex(tsCol)).dataType
    val stepIdx = steps.zipWithIndex.foldLeft(lit(-1)) { case (acc, (s, i)) =>
      when(col(typeCol) === s, lit(i + 1)).otherwise(acc)
    }
    val ev = events
      .filter(col(typeCol).isin(steps: _*))
      .select(col(userCol),
        struct(col(tsCol).as("ts"), stepIdx.as("step")).as("e"))
    val deadline = expr(s"INTERVAL $windowSeconds SECONDS")
    val nullTs = lit(null).cast(tsType)
    val walked = {
      val evs = sort_array(collect_list(col("e")))
      val starts = slice(filter(evs, e => e.getField("step") === 1), 1, maxStarts)
      aggregate(starts,
        struct(lit(0).as("stage"), nullTs.as("t_first"), nullTs.as("t_last")),
        (best: Column, s0: Column) => {
          val chain = aggregate(evs,
            struct(lit(1).as("stage"), s0.getField("ts").as("t_last")),
            (acc: Column, e: Column) => {
              val advance = e.getField("step") === acc.getField("stage") + 1 &&
                e.getField("ts") > acc.getField("t_last") &&
                e.getField("ts") <= s0.getField("ts") + deadline
              when(advance, struct(
                (acc.getField("stage") + 1).as("stage"),
                e.getField("ts").as("t_last"))).otherwise(acc)
            })
          when(chain.getField("stage") > best.getField("stage"), struct(
            chain.getField("stage").as("stage"),
            s0.getField("ts").as("t_first"),
            chain.getField("t_last").as("t_last"))).otherwise(best)
        })
    }
    ev.groupBy(col(userCol))
      .agg(walked.as("__f"))
      .select(col(userCol), col("__f.stage").as("stage"),
        col("__f.t_first").as("t_first"), col("__f.t_last").as("t_last"))
  }

  /** `users` hot users, `n` events each: pseudo-random step types and
    * timestamps over ~40 days, so every user carries far more than
    * `maxStarts` step-1 events and chains at every depth.
    */
  private def hotUsers(spark: SparkSession, users: Int, n: Int): DataFrame =
    spark.range(users).select(col("id").as("user_id"))
      .withColumn("seq", explode(sequence(lit(0), lit(n - 1))))
      .select(col("user_id"),
        element_at(
          array(lit("view"), lit("click"), lit("purchase"), lit("noise")),
          (pmod(hash(col("user_id"), col("seq")), lit(4)) + 1).cast("int"))
          .as("event_type"),
        (to_timestamp(lit("2026-01-01 00:00:00")) +
          make_dt_interval(days = lit(0), hours = lit(0), mins = lit(0),
            secs = pmod(hash(col("seq"), col("user_id"), lit(7)),
              lit(86400 * 40)).cast("double"))).as("ts"))

  /** The pre-r8 connectedComponents loop, verbatim semantics: every
    * round re-joins ALL edges with ALL labels, re-aggregates the full
    * label table, and runs a separate label-sum job for convergence.
    * Harness-only — the A/B baseline for Leg 3.
    */
  private def legacyConnectedComponents(pairs: DataFrame,
                                        maxIter: Int): DataFrame = {
    val edges = Par.persistTracked(
      pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
        .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
        .distinct())
    def labelSum(df: DataFrame): BigDecimal = {
      val d = df.agg(sum(col("comp").cast("decimal(38,0)"))).head.getDecimal(0)
      if (d == null) BigDecimal(0) else BigDecimal(d)
    }
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id")).localCheckpoint(true)
    var lastSum = labelSum(labels)
    var it = 0
    var converged = false
    while (!converged && it < maxIter) {
      val fromNeighbors = edges
        .join(labels.select(col("id").as("dst"), col("comp")), "dst")
        .select(col("src").as("id"), col("comp"))
      labels = labels.unionByName(fromNeighbors)
        .groupBy(col("id")).agg(min(col("comp")).as("comp"))
        .localCheckpoint(true)
      val s = labelSum(labels)
      converged = s == lastSum
      lastSum = s
      it += 1
    }
    require(converged, "legacy CC did not converge")
    labels
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
    val steps = Seq("view", "click", "purchase")

    // --- correctness twin: both engines, row-for-row, smaller shape
    val small = hotUsers(spark, users = 8, n = 20000)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    small.count()
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getTimestamp(2), r.getTimestamp(3)))
      .toSet
    val newRows = rows(Analytics.funnelWindowed(small, "user_id",
      "event_type", "ts", steps, 3600L))
    val oldRows = rows(legacyFunnelWindowed(small, "user_id",
      "event_type", "ts", steps, 3600L))
    require(newRows == oldRows,
      s"funnel A/B mismatch: ${newRows.diff(oldRows)} vs ${oldRows.diff(newRows)}")
    println(s"[stress] funnel A/B agrees on ${newRows.size} hot users")
    small.unpersist()

    // --- timing: 32 users x 100k events, warm pass then timed pass
    val hot = hotUsers(spark, users = 32, n = 100000)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    hot.count()
    def runNew() = force(Analytics.funnelWindowed(hot, "user_id",
      "event_type", "ts", steps, 3600L))
    def runOld() = force(legacyFunnelWindowed(hot, "user_id",
      "event_type", "ts", steps, 3600L))
    runNew(); runOld() // warm both code paths (JIT, codegen cache)
    val (tNew, _) = timed("funnel_windowed hot NEW (walk)")(runNew())
    val (tOld, _) = timed("funnel_windowed hot OLD (fold)")(runOld())
    println(f"[stress] funnel hot-user speedup: ${tOld / tNew}%.1fx")
    hot.unpersist()

    // --- Leg 2: VersionedGroup daily maintenance at 1x vs 10x batch.
    // The group commit adds only O(frames) manifest work on top of the
    // frame writes, so maintenance time must scale with the BATCH
    // (the appended segments), never with the accumulated store.
    import graft.operators.Dedup
    import graft.sources.VersionedGroup
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs0 = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val reps10 = array((0 until 10).map(lit): _*)
    val docs10x = docs0.withColumn("rep", explode(reps10))
      .select((col("doc_id") + col("rep").cast("long") * lit(10000000L))
        .as("doc_id"),
        when(col("rep") === 0, col("text"))
          .otherwise(concat(col("text"), lit(" replica "),
            col("rep").cast("string"))).as("text"))
    def maintain(label: String, batch: org.apache.spark.sql.DataFrame): Double = {
      val root = java.nio.file.Files
        .createTempDirectory("graft_vgstress_").toString + "/mh"
      val (sh0, bd0) = Dedup.minHashIndexFrames(docs0, "doc_id", "text")
      VersionedGroup.commit(root, Map("sh" -> sh0, "bd" -> bd0), replace = true)
      val t0 = System.nanoTime()
      val (sh1, bd1) = Dedup.minHashIndexFrames(batch, "doc_id", "text")
      VersionedGroup.commit(root, Map("sh" -> sh1, "bd" -> bd1))
      val sec = (System.nanoTime() - t0) / 1e9
      Par.release()
      val n = VersionedGroup.read(spark, root, "bd").count()
      println(f"[stress] $label%-34s $sec%8.2f s  ($n banded rows)")
      sec
    }
    maintain("vg_maintenance warmup (untimed)",       // JIT/codegen warm
      docs10x.filter(col("doc_id") >= 10000000L && col("doc_id") < 20000000L))
    val m1 = maintain("vg_maintenance 1x batch",
      docs10x.filter(col("doc_id") >= 10000000L && col("doc_id") < 20000000L))
    val m10 = maintain("vg_maintenance 10x batch",
      docs10x.filter(col("doc_id") >= 10000000L))
    println(f"[stress] vg maintenance 10x/1x time ratio: ${m10 / m1}%.1fx (batch grew 9x)")

    // --- Leg 3: frontier connected components vs legacy full
    // re-propagation. Shape: 100k dense star clusters (converge in ~2
    // rounds) PLUS one buried 30-node chain that forces ~15 more
    // rounds. The legacy loop re-joins EVERY edge with every label
    // each round, so it pays the full graph ~17 times; the frontier
    // loop pays it twice and then touches only the chain's wave front.
    import spark.implicits._
    val dense = spark.range(100000L)
      .filter(col("id") % 10 =!= 0)
      .select(col("id").as("id_a"), (col("id") - col("id") % 10).as("id_b"))
    val chainIds = (0 until 30).map(i => 20000000L + i * 7L)
    val chain = chainIds.zip(chainIds.tail).toDF("id_a", "id_b")
    val graph = dense.unionByName(chain)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    graph.count()
    // correctness twin on a small replica
    val smallGraph = graph.filter(col("id_a") < 1000L || col("id_a") >= 20000000L)
    val newLabels = Dedup.connectedComponents(smallGraph, maxIter = 40)
    val oldLabels = legacyConnectedComponents(smallGraph, maxIter = 40)
    require(newLabels.except(oldLabels).isEmpty && oldLabels.except(newLabels).isEmpty,
      "CC A/B label mismatch")
    println("[stress] cc A/B agrees on the small replica")
    def runCcNew() = force(Dedup.connectedComponents(graph, maxIter = 40))
    def runCcOld() = force(legacyConnectedComponents(graph, maxIter = 40))
    runCcNew(); runCcOld() // warm
    val (tCcNew, _) = timed("cc frontier (dense + chain)")(runCcNew())
    val (tCcOld, _) = timed("cc legacy full re-propagation")(runCcOld())
    println(f"[stress] cc frontier speedup: ${tCcOld / tCcNew}%.1fx")
    graph.unpersist()

    // --- Leg 4: selectBudget bucketed scale path vs the naive global
    // running-sum window at 5M rows (the naive form funnels the whole
    // corpus through ONE reducer; the bucketed form pays a window only
    // inside the boundary bucket — 1/1000th of the rows here).
    import graft.operators.Sampling
    val corpus = spark.range(5000000L)
      .select(col("id"), (col("id") % 50 + 1).as("tok"),
        ((col("id") * 37) % 1000).cast("double").divide(1000.0).as("score"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    corpus.count()
    val budget = 60000000L // ~47% of ~127.5M total tokens → boundary bites
    def runSbNew() = force(
      Sampling.selectBudget(corpus, "id", "tok", "score", budget))
    def runSbOld() = force {
      import org.apache.spark.sql.expressions.Window
      val w = Window.orderBy(col("score").desc, col("id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      corpus.withColumn("cum", sum(col("tok")).over(w))
        .filter(col("cum") <= budget).drop("cum")
    }
    runSbNew(); runSbOld() // warm
    val (tSbNew, nSbNew) = timed("select_budget bucketed 5M")(runSbNew())
    val (tSbOld, nSbOld) = timed("select_budget naive window 5M")(runSbOld())
    require(nSbNew == nSbOld, s"selectBudget A/B row mismatch: $nSbNew vs $nSbOld")
    println(f"[stress] select_budget speedup: ${tSbOld / tSbNew}%.1fx")
    corpus.unpersist()

    // --- Leg 5: saltedJoin vs plain join on a 90%-hot key, 4M left
    // rows. Broadcast is disabled for the leg: saltedJoin's use case
    // is a right side too big to broadcast (with a broadcastable dim
    // there is no shuffle and nothing to salt — measured: the plain
    // broadcast join wins outright at 0.05 s). The plain sort-merge
    // join hands the hot key's 3.6M rows to ONE reducer; the salted
    // form spreads them over 16. Run with AQE on (its partition-byte
    // skew split may fire) and off (the documented use case).
    import graft.operators.Skew
    val hotLeft = spark.range(4000000L)
      .select(when(col("id") % 10 < 9, lit(0L)).otherwise(col("id") % 1000L)
        .as("k"), col("id").as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    hotLeft.count()
    val dim = spark.range(1000L).select(col("id").as("k"),
      concat(lit("tag"), col("id")).as("tag"))
    val prevBcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    def runJPlain() = force(hotLeft.join(dim, Seq("k")))
    def runJSalted() = force(Skew.saltedJoin(hotLeft, dim, Seq("k"),
      hotThreshold = 10000L, salts = 16))
    Seq("true", "false").foreach { aqe =>
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      runJPlain(); runJSalted() // warm
      val (tP, nP) = timed(s"hot-key join plain (aqe=$aqe)")(runJPlain())
      val (tS, nS) = timed(s"hot-key join salted (aqe=$aqe)")(runJSalted())
      require(nP == nS, s"saltedJoin A/B row mismatch: $nP vs $nS")
      println(f"[stress] salted-join speedup (aqe=$aqe): ${tP / tS}%.1fx")
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBcast)
    hotLeft.unpersist()
    spark.stop()
  }
}
