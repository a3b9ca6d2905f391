package graft

import graft.operators.{Dedup, IncrementalAgg, SurrogateKey}
import graft.pipeline.Analytics
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 wave-4 operators: surrogate keys, incremental aggregate
  * maintenance, MAD outliers, last-touch attribution, decayed
  * features, semantic dedup.
  */
class W4OpsSpec extends SparkSuite {
  import spark.implicits._

  // ---- SurrogateKey ----

  test("surrogate keys: two-phase numbering equals the global window, no single-partition exchange") {
    val conf = spark.conf
    val prevA = conf.get("spark.sql.adaptive.enabled")
    conf.set("spark.sql.adaptive.enabled", "false") // plan tree inspectable
    try {
      val df = spark.range(0, 10000).select(
        (col("id") * 2654435761L % 1000L).as("grp"), col("id").as("uid"))
      val got = SurrogateKey.assign(df, Seq("grp", "uid"), "sk")
      // definitional form: one global window (the thing we must NOT plan)
      val want = df.withColumn("sk",
        row_number().over(Window.orderBy(col("grp"), col("uid"))).cast("long"))
      assert(got.orderBy("sk").collect().toSeq ===
        want.orderBy("sk").collect().toSeq)
      // scale guard: the two-phase plan must have no SinglePartition
      // shuffle (the global-window form has exactly one)
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
      import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
      def singles(p: org.apache.spark.sql.execution.SparkPlan) = p.collect {
        case s: ShuffleExchangeLike if s.outputPartitioning == SinglePartition => s
      }
      assert(singles(got.queryExecution.executedPlan).isEmpty,
        "two-phase surrogate keys planned a SinglePartition exchange")
      assert(singles(want.queryExecution.executedPlan).nonEmpty)
    } finally {
      conf.set("spark.sql.adaptive.enabled", prevA)
      Par.release()
    }
  }

  test("surrogate keys: dense 1..N and stable under repartitioning") {
    val df = spark.range(0, 777).select(col("id").as("k"))
      .repartition(13)
    val got = SurrogateKey.assign(df, Seq("k"), "sk")
      .select("k", "sk").as[(Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._2).toSeq === (1L to 777L))
    assert(got.forall { case (k, sk) => sk === k + 1 })
  }

  // ---- IncrementalAgg ----

  test("incremental aggregate: fold of N deltas equals the full recompute") {
    val full = spark.range(0, 5000).select(
      (col("id") % 7).as("k"), (col("id") % 100).cast("double").as("v"))
    val parts = (0 until 4).map(i => full.filter(col("id") % 4 === i))
    val state0 = IncrementalAgg.init(parts.head, Seq("k"), "v")
    val folded = parts.tail.foldLeft(state0)(
      (st, d) => IncrementalAgg.maintain(st, d, Seq("k"), "v"))
    val want = IncrementalAgg.init(full, Seq("k"), "v")
    assert(IncrementalAgg.finalize(folded).orderBy("k").collect().toSeq ===
      IncrementalAgg.finalize(want).orderBy("k").collect().toSeq)
  }

  test("incremental aggregate: empty delta is a no-op; finalize derives avg") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 10.0)).toDF("k", "v")
    val st = IncrementalAgg.init(df, Seq("k"), "v")
    val same = IncrementalAgg.maintain(st, df.filter(lit(false)), Seq("k"), "v")
    assert(same.orderBy("k").collect().toSeq === st.orderBy("k").collect().toSeq)
    val fin = IncrementalAgg.finalize(st).filter(col("k") === "a").head()
    assert(fin.getAs[Double]("avg_value") === 1.5)
    assert(fin.getAs[Double]("sum_value") === 3.0)
  }

  test("incremental distinct: pair-state fold equals full COUNT(DISTINCT); nulls never counted") {
    val full = spark.range(0, 4000).select(
      (col("id") % 5).cast("string").as("k"),
      when(col("id") % 97 === 0, lit(null).cast("long"))
        .otherwise(col("id") % 40).as("v"),
      col("id"))
    val parts = (0 until 3).map(i => full.filter(col("id") % 3 === i))
    val st0 = IncrementalAgg.initDistinct(parts.head, Seq("k"), "v")
    val folded = parts.tail.foldLeft(st0)(
      (st, d) => IncrementalAgg.maintainDistinct(st, d, Seq("k"), "v"))
    val got = IncrementalAgg.finalizeDistinct(folded, Seq("k"), "v")
    val want = full.groupBy("k").agg(countDistinct(col("v")).as("n_distinct"))
    assert(got.orderBy("k").collect().toSeq === want.orderBy("k").collect().toSeq)
    // the state is pair-sized, not history-sized
    assert(folded.count() <= 5 * 40)
  }

  // ---- Versioned.changes (in W4 because it rides the new ops wave) ----

  test("versioned change feed: insert/delete/null-safe update, unchanged silent") {
    import graft.sources.Versioned
    val dir = tmpDir("vchg") + "/t"
    val v1 = Seq((1L, Option("x"), 10.0), (2L, Option("y"), 20.0),
      (3L, None: Option[String], 30.0), (4L, Option("z"), 40.0))
      .toDF("id", "name", "bal")
    // 1 unchanged; 2 deleted; 3 null→value update; 5 inserted;
    // 4 value→null update
    val v2 = Seq((1L, Option("x"), 10.0), (3L, Option("now"), 30.0),
      (4L, None: Option[String], 40.0), (5L, Option("new"), 50.0))
      .toDF("id", "name", "bal")
    Versioned.commit(v1, dir, replace = true)
    Versioned.commit(v2, dir, replace = true)
    val got = Versioned.changes(spark, dir, 1, 2, Seq("id"))
      .orderBy("id").collect()
    assert(got.map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((2L, "delete"), (3L, "update"), (4L, "update"), (5L, "insert")))
    // delete carries the BEFORE values, update/insert the AFTER values
    val byId = got.map(r => r.getLong(0) -> r).toMap
    assert(byId(2L).getString(2) === "y")
    assert(byId(3L).getString(2) === "now")
    assert(byId(4L).isNullAt(2))
    assert(byId(5L).getString(2) === "new")
  }

  // ---- Analytics: MAD outliers ----

  test("MAD outliers: robust to a heavy tail the z-score is dragged by") {
    // 99 values at 0..98 plus one at 10000: median/MAD barely move,
    // so the spike IS flagged (a 3σ z-score cut on the same data
    // would swallow σ and could miss moderate outliers)
    val df = ((0 until 99).map(i => ("t", i.toDouble)) :+ ("t", 10000.0))
      .toDF("event_type", "value")
    val r = Analytics.madOutliers(df, "event_type", "value", k = 3.0).head()
    assert(r.getAs[Double]("med") === 49.5)
    assert(r.getAs[Long]("n_outliers") === 1L)
    assert(r.getAs[Long]("n_rows") === 100L)
  }

  // ---- Analytics: last-touch attribution ----

  test("attribution: latest touch wins, same-ts touch counts, lookback cuts, no touch → null") {
    val ev = Seq(
      // u1: two touches then purchase → latest (id 12) wins
      ("u1", 10L, "2024-01-01 00:00:00", "click"),
      ("u1", 12L, "2024-01-01 02:00:00", "view"),
      ("u1", 20L, "2024-01-01 03:00:00", "purchase"),
      // u2: touch at the exact purchase ts counts (touch sorts first)
      ("u2", 30L, "2024-01-02 00:00:00", "click"),
      ("u2", 31L, "2024-01-02 00:00:00", "purchase"),
      // u3: touch outside the lookback → null attribution
      ("u3", 40L, "2024-01-01 00:00:00", "view"),
      ("u3", 41L, "2024-01-20 00:00:00", "purchase"),
      // u4: purchase with no touch at all
      ("u4", 50L, "2024-01-05 00:00:00", "purchase"),
      // u5: a LATER touch must not attribute backwards
      ("u5", 60L, "2024-01-03 00:00:00", "purchase"),
      ("u5", 61L, "2024-01-04 00:00:00", "click"))
      .toDF("user_id", "event_id", "ts", "event_type")
      .withColumn("ts", to_timestamp(col("ts")))
    val got = Analytics.attributionLastTouch(ev, Seq("click", "view"),
        "purchase", lookbackSec = 7L * 24 * 3600)
      .orderBy("conv_id").collect()
    val byConv = got.map(r => r.getAs[Long]("conv_id") ->
      Option(r.getAs[java.lang.Long]("touch_id")).map(_.toLong)).toMap
    assert(byConv === Map(20L -> Some(12L), 31L -> Some(30L),
      41L -> None, 50L -> None, 60L -> None))
  }

  test("attributionLinear: equal split, lookback cut, recency cap, no-touch drops") {
    val ev = Seq(
      // u1: three in-window touches → each gets 1/3
      ("u1", 10L, "2024-01-01 00:00:00", "click"),
      ("u1", 11L, "2024-01-01 01:00:00", "view"),
      ("u1", 12L, "2024-01-01 02:00:00", "click"),
      ("u1", 20L, "2024-01-01 03:00:00", "purchase"),
      // u2: one touch OUTSIDE the lookback is cut → the one inside
      // gets full credit
      ("u2", 30L, "2024-01-01 00:00:00", "view"),
      ("u2", 31L, "2024-01-09 00:00:00", "click"),
      ("u2", 32L, "2024-01-10 00:00:00", "purchase"),
      // u3: no touches → the conversion emits NO rows (unlike
      // last-touch's null row: linear credit has nobody to pay)
      ("u3", 40L, "2024-01-05 00:00:00", "purchase"))
      .toDF("user_id", "event_id", "ts", "event_type")
      .withColumn("ts", to_timestamp(col("ts")))
    val got = Analytics.attributionLinear(ev, Seq("click", "view"),
        "purchase", lookbackSec = 7L * 24 * 3600)
      .collect().map(r => (r.getAs[Long]("conv_id"), r.getAs[Long]("touch_id"))
        -> r.getAs[Double]("credit")).toMap
    assert(got === Map(
      (20L, 10L) -> 0.333333, (20L, 11L) -> 0.333333, (20L, 12L) -> 0.333333,
      (32L, 31L) -> 1.0))
    // recency cap: maxTouches=2 keeps the two most recent of u1's three
    val capped = Analytics.attributionLinear(ev, Seq("click", "view"),
        "purchase", lookbackSec = 7L * 24 * 3600, maxTouches = 2)
      .filter(col("conv_id") === 20L)
      .collect().map(r => r.getAs[Long]("touch_id") ->
        r.getAs[Double]("credit")).toMap
    assert(capped === Map(11L -> 0.5, 12L -> 0.5))
  }

  test("attributionPositionBased: 40/40 ends, middles split, degenerate 1/2-touch") {
    val ev = Seq(
      // u1: four touches → 0.4, 0.1, 0.1, 0.4 (time order 10,11,12,13)
      ("u1", 10L, "2024-01-01 00:00:00", "click"),
      ("u1", 11L, "2024-01-01 01:00:00", "view"),
      ("u1", 12L, "2024-01-01 02:00:00", "click"),
      ("u1", 13L, "2024-01-01 03:00:00", "view"),
      ("u1", 20L, "2024-01-01 04:00:00", "purchase"),
      // u2: two touches → 0.5 each
      ("u2", 30L, "2024-01-02 00:00:00", "click"),
      ("u2", 31L, "2024-01-02 01:00:00", "view"),
      ("u2", 32L, "2024-01-02 02:00:00", "purchase"),
      // u3: one touch → full credit
      ("u3", 40L, "2024-01-03 00:00:00", "click"),
      ("u3", 41L, "2024-01-03 01:00:00", "purchase"))
      .toDF("user_id", "event_id", "ts", "event_type")
      .withColumn("ts", to_timestamp(col("ts")))
    val got = Analytics.attributionPositionBased(ev, Seq("click", "view"),
        "purchase", lookbackSec = 7L * 24 * 3600)
      .collect().map(r => (r.getAs[Long]("conv_id"), r.getAs[Long]("touch_id"))
        -> r.getAs[Double]("credit")).toMap
    assert(got === Map(
      (20L, 10L) -> 0.4, (20L, 11L) -> 0.1, (20L, 12L) -> 0.1, (20L, 13L) -> 0.4,
      (32L, 30L) -> 0.5, (32L, 31L) -> 0.5,
      (41L, 40L) -> 1.0))
  }

  // ---- Analytics: decayed feature ----

  test("decayed feature: truncated geometric sum in (ts, id) order per user") {
    val ev = Seq(
      ("u", 1L, "2024-01-01 00:00:00", 8.0),
      ("u", 2L, "2024-01-01 01:00:00", 4.0),
      ("u", 3L, "2024-01-01 02:00:00", 2.0),
      ("v", 9L, "2024-01-01 00:00:00", 100.0))
      .toDF("user_id", "event_id", "ts", "value")
      .withColumn("ts", to_timestamp(col("ts")))
    val got = Analytics.decayedFeature(ev, alpha = 0.5, depth = 16)
      .select("event_id", "decayed_value").as[(Long, Double)]
      .collect().toMap
    assert(got(1L) === 8.0)
    assert(got(2L) === 4.0 + 0.5 * 8.0)
    assert(got(3L) === 2.0 + 0.5 * 4.0 + 0.25 * 8.0)
    assert(got(9L) === 100.0) // other user unaffected
  }

  test("decayed feature: depth truncates — an event depth+1 back contributes nothing") {
    val rows = (0 until 20).map(i => ("u", i.toLong,
      f"2024-01-01 ${i}%02d:00:00", if (i == 0) 1024.0 else 0.0))
    val ev = rows.toDF("user_id", "event_id", "ts", "value")
      .withColumn("ts", to_timestamp(col("ts")))
    val got = Analytics.decayedFeature(ev, alpha = 0.5, depth = 4)
      .select("event_id", "decayed_value").as[(Long, Double)]
      .collect().toMap
    assert(got(3L) === 1024.0 / 8) // depth 4: lags 0..3 reach it
    assert(got(4L) === 0.0)        // lag 4 is beyond the chain
  }

  test("atomic MV maintenance: agg + distinct state move as ONE VersionedGroup version") {
    import graft.sources.{Versioned, VersionedGroup}
    val root = tmpDir("mvg") + "/mv"
    val full = spark.range(0, 3000).select(
      (col("id") % 7).cast("string").as("k"),
      (col("id") % 13).cast("double").as("v"), col("id"))
    val day0 = full.filter(col("id") < 2000)
    val day1 = full.filter(col("id") >= 2000)
    VersionedGroup.commit(root, Map(
      "agg" -> IncrementalAgg.init(day0, Seq("k"), "v"),
      "dst" -> IncrementalAgg.initDistinct(day0, Seq("k"), "v")), replace = true)
    // day-1 maintenance: BOTH frames in one group commit
    VersionedGroup.commit(root, Map(
      "agg" -> IncrementalAgg.maintain(
        VersionedGroup.read(spark, root, "agg"), day1, Seq("k"), "v"),
      "dst" -> IncrementalAgg.maintainDistinct(
        VersionedGroup.read(spark, root, "dst"), day1, Seq("k"), "v")),
      replace = true)
    // the maintained store equals the full recompute, read via pins
    assert(IncrementalAgg.finalize(VersionedGroup.read(spark, root, "agg"))
      .orderBy("k").collect().toSeq ===
      IncrementalAgg.finalize(IncrementalAgg.init(full, Seq("k"), "v"))
        .orderBy("k").collect().toSeq)
    assert(IncrementalAgg.finalizeDistinct(
        VersionedGroup.read(spark, root, "dst"), Seq("k"), "v")
      .orderBy("k").collect().toSeq ===
      full.groupBy("k").agg(countDistinct(col("v")).as("n_distinct"))
        .orderBy("k").collect().toSeq)
    // a torn maintenance job (frame landed, group CAS never ran) is
    // INVISIBLE to group readers — the crash contract the composition
    // inherits from VersionedGroup
    val before = VersionedGroup.read(spark, root, "agg").collect().toSet
    Versioned.commit(IncrementalAgg.init(day1, Seq("k"), "v"),
      root + "/agg", replace = true) // orphan frame version, no group pin
    assert(VersionedGroup.read(spark, root, "agg").collect().toSet === before)
  }

  // ---- Quality.psiDrift ----

  test("PSI drift: identical distributions score ~0, a shift scores high, empty bins smooth") {
    import graft.operators.Quality
    val ref = spark.range(0, 10000).select((col("id") % 100).cast("double").as("v"))
    // same distribution → tiny PSI (only Laplace noise)
    val same = Quality.psiDrift(ref, ref, "v", bins = 10).head()
    assert(math.abs(same.getAs[Double]("psi")) < 1e-6)
    // hard shift: everything beyond the reference's range lands in the
    // LAST bin (empty-bin smoothing keeps every term finite)
    val far = spark.range(0, 5000).select(lit(1e9).as("v"))
    val drift = Quality.psiDrift(ref, far, "v", bins = 10)
    val rows = drift.orderBy("bin").collect()
    assert(rows.length === 10)
    assert(rows.last.getAs[Long]("n_cur") === 5000L)
    assert(rows.init.forall(_.getAs[Long]("n_cur") === 0L))
    assert(rows.head.getAs[Double]("psi") > 1.0, "a total shift must scream")
    // per-bin reference mass is ~equal-depth (equal-width value grid)
    assert(rows.forall(r => math.abs(r.getAs[Long]("n_ref") - 1000L) <= 100))
    Par.release()
  }

  test("KS drift: identical samples → 0, disjoint → 1, hand case exact") {
    import graft.operators.Quality
    val a = spark.range(0, 1000).select((col("id") % 10).cast("double").as("v"))
    val same = Quality.ksDrift(a, a, "v").head()
    assert(same.getAs[Double]("ks_d") === 0.0)
    val lo = spark.range(0, 500).select(col("id").cast("double").as("v"))
    val hi = spark.range(1000, 1600).select(col("id").cast("double").as("v"))
    val dis = Quality.ksDrift(lo, hi, "v").head()
    assert(dis.getAs[Double]("ks_d") === 1.0)
    assert(dis.getAs[Long]("n_ref") === 500L)
    assert(dis.getAs[Long]("n_cur") === 600L)
    // hand case: ref {1,2,3,4}, cur {3,4,5,6} → max gap at v=2: |0.5−0|
    val r = Seq(1.0, 2.0, 3.0, 4.0).toDF("v")
    val c = Seq(3.0, 4.0, 5.0, 6.0).toDF("v")
    assert(Quality.ksDrift(r, c, "v").head().getAs[Double]("ks_d") === 0.5)
    Par.release()
  }

  test("KS drift: the CDF cumsum plans NO SinglePartition exchange") {
    import graft.operators.Quality
    val conf = spark.conf
    val prevA = conf.get("spark.sql.adaptive.enabled")
    conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val a = spark.range(0, 50000).select((col("id") % 1000).cast("double").as("v"))
      val b = spark.range(0, 40000).select((col("id") % 900).cast("double").as("v"))
      val got = Quality.ksDrift(a, b, "v")
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
      import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
      val singles = got.queryExecution.executedPlan.collect {
        case s: ShuffleExchangeLike if s.outputPartitioning == SinglePartition => s
      }
      // the final 1-row agg legitimately gathers its tiny partials; the
      // guard is that the VALUE-DOMAIN cumsum window runs partitioned —
      // no SinglePartition exchange may feed a Window/Sort
      import org.apache.spark.sql.execution.window.WindowExec
      val windowsOnSingle = got.queryExecution.executedPlan.collect {
        case w: WindowExec if w.collectFirst {
          case s: ShuffleExchangeLike if s.outputPartitioning == SinglePartition => s
        }.isDefined => w
      }
      assert(windowsOnSingle.isEmpty,
        s"KS CDF window fed by a SinglePartition exchange (found ${singles.size} singles)")
    } finally {
      conf.set("spark.sql.adaptive.enabled", prevA)
      Par.release()
    }
  }

  test("BM25: rarity, tf saturation, and length normalization order as expected") {
    import graft.operators.Search
    val docs = Seq(
      (1L, "spark spark spark spark engine"),   // high tf, short
      (2L, "spark engine"),                      // tf 1, shortest
      (3L, "spark " + ("filler " * 50).trim),    // tf 1, long → penalized
      (4L, "rare gem engine"),                   // the only 'rare' doc
      (5L, "engine engine engine"))              // no query terms beyond engine
      .toDF("doc_id", "text")
    val r = Search.bm25(docs, "doc_id", "text", Seq("spark", "rare"), topK = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // 'rare' (df 1) outweighs 'spark' (df 3) for any tf at these lengths
    assert(r(4L) > r(1L), "rarity must dominate")
    // same tf=1: shorter doc scores higher than the 50-filler doc
    assert(r(2L) > r(3L), "length normalization must penalize the long doc")
    // higher tf wins at comparable length
    assert(r(1L) > r(2L), "tf must help")
    assert(!r.contains(5L), "docs without query terms don't score")
    Par.release()
  }

  test("PageRank: matches a driver-side reference iteration; mass and hub invariants") {
    import graft.operators.Graph
    val rnd = new scala.util.Random(11)
    val edges = (0 until 200).map(_ =>
      (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val got = Graph.pageRank(edges.toDF("a", "b"), "a", "b", iterations = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // reference: same damped power iteration, driver-side
    val adj = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val nodes = adj.keys.toSeq.sorted
    val n = nodes.size
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to 10) {
      val contrib = scala.collection.mutable.Map.empty[Long, Double]
        .withDefaultValue(0.0)
      for ((u, vs) <- adj; v <- vs) contrib(v) += r(u) / vs.size
      r = nodes.map(v => v -> (0.15 / n + 0.85 * contrib(v))).toMap
    }
    assert(got.keySet === r.keySet)
    got.foreach { case (v, g) => assert(math.abs(g - r(v)) < 1e-9, s"node $v") }
    // mass: damped iteration over a dangling-free graph conserves Σr = 1
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
    // hub dominance: a star's center outranks every leaf
    val star = (1L to 10L).map(i => (0L, i))
    val sr = Graph.pageRank(star.toDF("a", "b"), "a", "b")
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert((1L to 10L).forall(i => sr(0L) > sr(i)))
    assert((1L to 10L).map(sr).distinct.size === 1) // leaves symmetric
    Par.release()
  }

  test("PageRank reliable=true uses fault-tolerant checkpoints, identical ranks") {
    import graft.operators.Graph
    // the reliable flag swaps localCheckpoint for HDFS-backed
    // checkpoint() (the spot-node/dynamic-allocation mode) — the
    // truncation cadence and arithmetic are unchanged; ranks agree to
    // the same 1e-9 the driver-side reference uses (shuffle fetch
    // order makes per-node double sums run-order-dependent, so exact
    // bit equality across runs is not a contract even mode-to-mode)
    val rnd = new scala.util.Random(13)
    val edges = (0 until 150).map(_ =>
      (rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
      .filter { case (a, b) => a != b }.distinct.toDF("a", "b")
    val local = Graph.pageRank(edges, "a", "b", iterations = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val prev = spark.sparkContext.getCheckpointDir
    spark.sparkContext.setCheckpointDir(tmpDir("prckpt"))
    try {
      val rel = Graph.pageRank(edges, "a", "b", iterations = 10,
          reliable = true)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(rel.keySet === local.keySet)
      rel.foreach { case (v, x) =>
        assert(math.abs(x - local(v)) < 1e-9, s"node $v") }
    } finally prev.foreach(spark.sparkContext.setCheckpointDir)
    Par.release()
  }

  test("labelPropagation: bridged cliques split into two communities; CC cannot") {
    import graft.operators.{Dedup, Graph}
    val edges = (for {
      c <- Seq(Seq(1L, 2L, 3L, 4L), Seq(10L, 11L, 12L, 13L))
      a <- c; b <- c if a < b
    } yield (a, b)) :+ ((4L, 10L)) // one boilerplate bridge
    val df = edges.toDF("a", "b")
    val labels = Graph.labelPropagation(df, "a", "b", iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val communities = labels.groupBy(_._2).values.map(_.keySet).toSet
    assert(communities === Set(Set(1L, 2L, 3L, 4L), Set(10L, 11L, 12L, 13L)),
      s"got $communities")
    // connected components merges them — LPA is the finer cut
    val cc = Dedup.connectedComponents(df, "a", "b")
      .collect().map(_.getLong(1)).distinct
    assert(cc.length === 1)
    // reliable=true twin: identical labels through cluster checkpoints
    val prev = spark.sparkContext.getCheckpointDir
    spark.sparkContext.setCheckpointDir(tmpDir("lpackpt"))
    try {
      val rel = Graph.labelPropagation(df, "a", "b", iterations = 5,
          reliable = true)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(rel === labels)
    } finally prev.foreach(spark.sparkContext.setCheckpointDir)
    // deterministic under repartitioning
    val rep = Graph.labelPropagation(df.repartition(7), "a", "b", iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rep === labels)
    Par.release()
  }

  test("bfsDistance: path-graph hops, multi-source min, off-graph seeds ignored, unreached absent") {
    import graft.operators.Graph
    // path 1-2-3-4-5, separate edge 20-21, unreached component 30-31
    val df = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (20L, 21L),
      (30L, 31L)).toDF("a", "b")
    val seeds = Seq(1L, 20L, 99L).toDF("n") // 99 not a graph node
    val got = Graph.bfsDistance(df, "a", "b", seeds, "n", maxHops = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L,
      20L -> 0L, 21L -> 1L))
    // multi-source: nearest seed wins
    val two = Graph.bfsDistance(df, "a", "b", Seq(1L, 5L).toDF("n"), "n",
        maxHops = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(two === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 0L))
    // idempotent past convergence + deterministic under repartitioning
    val more = Graph.bfsDistance(df.repartition(7), "a", "b", seeds, "n",
        maxHops = 9)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(more === got)
    Par.release()
  }

  test("triangle stats: known graphs and equality to brute force on a random graph") {
    import graft.operators.Graph
    def stats(edges: Seq[(Long, Long)]) =
      Graph.triangleStats(edges.toDF("a", "b"), "a", "b").head()
    // K3: one triangle, coefficient 1; duplicate + reversed edges canonicalize
    val k3 = stats(Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 1L), (1L, 2L)))
    assert(k3.getAs[Long]("n_edges") === 3L)
    assert(k3.getAs[Long]("n_triangles") === 1L)
    assert(k3.getAs[Double]("clustering_coef") === 1.0)
    // 4-cycle: zero triangles
    assert(stats(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)))
      .getAs[Long]("n_triangles") === 0L)
    // K4: 4 triangles, coefficient 1
    val k4 = stats(Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
    assert(k4.getAs[Long]("n_triangles") === 4L)
    assert(k4.getAs[Double]("clustering_coef") === 1.0)
    // random graph vs brute-force triple enumeration
    val rnd = new scala.util.Random(7)
    val edges = (0 until 300).map(_ =>
      (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val es = edges.toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    var brute = 0L
    for (i <- nodes.indices; j <- i + 1 until nodes.length;
         k <- j + 1 until nodes.length) {
      val (a, b, c) = (nodes(i), nodes(j), nodes(k))
      if (es((a, b)) && es((b, c)) && es((a, c))) brute += 1
    }
    assert(stats(edges).getAs[Long]("n_triangles") === brute)
    Par.release()
  }

  // ---- Dedup.semanticDedup ----

  test("semantic dedup: equals exhaustive cosine restricted to shared-cell pairs") {
    val embs = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cents = embs.filter(col("vec_id") < 16)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Float](1).map(_.toDouble).toSeq))
      .sortBy(_._1).toSeq
    val t = 0.3
    val got = Dedup.semanticDedup(embs, "vec_id", "embedding", cents, t)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // oracle: exhaustive pairs ≥ t that share a nearest centroid
    val exhaustive = Dedup.embeddingCosine(embs, "vec_id", "embedding",
      threshold = t, exhaustive = true)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    import graft.functions.Vectors
    def nearest(): Map[Long, Int] = {
      val assigned = embs.select(col("vec_id"),
        Vectors.toDouble(col("embedding")).as("v")).collect().map { r =>
        val v = r.getSeq[Double](1)
        val cell = cents.minBy { case (c, cv) =>
          var d = 0.0; var i = 0
          while (i < v.length) { val t = v(i) - cv(i); d += t * t; i += 1 }
          (d, c)
        }._1
        r.getLong(0) -> cell
      }
      assigned.toMap
    }
    val cellOf = nearest()
    val want = exhaustive.filter { case (a, b) => cellOf(a) == cellOf(b) }
    assert(got === want)
    assert(got.nonEmpty, "spec data should produce at least one pair")
    Par.release()
  }
}
