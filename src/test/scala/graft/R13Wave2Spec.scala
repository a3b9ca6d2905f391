package graft

import graft.functions.{JaroWinklerImpl, StringSim, Text}
import graft.operators.{Linkage, Quality}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Round-13 wave-2 experimentation-stats operators: Kruskal–Wallis,
  * Brown–Forsythe, the A&S normal tail + Benjamini–Hochberg step-up,
  * closed-form power/MDE, and the ECE/Brier calibration scorecard.
  */
class R13Wave2Spec extends SparkSuite {
  import spark.implicits._

  private def near(a: Double, b: Double, eps: Double = 1e-6): Boolean =
    math.abs(a - b) <= eps

  // ---- Quality.kruskalWallis ----

  test("kruskalWallis: textbook H on a tie-free 3-group fixture; separated groups score high, interleaved near zero") {
    // groups (1,2,3) (4,5,6) (7,8,9): ranks 1..9, R = 6/15/24,
    // H = 12/90 * (36+225+576)/3 - 30 = 7.2 (no ties, corr = 1)
    val df = Seq(
      ("k", "a", 1.0), ("k", "a", 2.0), ("k", "a", 3.0),
      ("k", "b", 4.0), ("k", "b", 5.0), ("k", "b", 6.0),
      ("k", "c", 7.0), ("k", "c", 8.0), ("k", "c", 9.0))
      .toDF("key", "g", "v")
    val r = Quality.kruskalWallis(df, "key", "g", "v").collect()
    assert(r.length === 1)
    assert(r(0).getLong(1) === 9L && r(0).getLong(2) === 3L &&
      r(0).getLong(3) === 2L)
    assert(near(r(0).getDouble(4), 7.2))
    // perfectly interleaved groups: H near zero
    val inter = (1 to 30).map(i => ("k", (i % 3).toString, i.toDouble))
      .toDF("key", "g", "v")
    val h0 = Quality.kruskalWallis(inter, "key", "g", "v")
      .collect()(0).getDouble(4)
    assert(math.abs(h0) < 0.5) // far below the 5.99 critical value
  }

  test("kruskalWallis with two groups equals the Mann-Whitney z squared (textbook identity)") {
    // H(k=2) = z_MW^2 (both tie-corrected, MW without continuity
    // correction) — a cross-operator invariant tying the two rank
    // tests' integer-rank machinery together, ties included
    val df = Seq(
      ("k", "A", 1.0), ("k", "A", 4.0), ("k", "A", 4.0), ("k", "A", 9.0),
      ("k", "B", 2.0), ("k", "B", 4.0), ("k", "B", 7.0), ("k", "B", 12.0),
      ("k", "B", 15.0)).toDF("key", "g", "v")
    val h = Quality.kruskalWallis(df, "key", "g", "v")
      .collect()(0).getDouble(4)
    val z = Quality.mannWhitney(df, "key", "g", "v", "A", "B", roundTo = 9)
      .collect()(0).getDouble(4)
    assert(near(h, z * z, 1e-4))
  }

  test("kruskalWallis: all-tied key reports null h; single-group key excluded") {
    val df = Seq(("t", "a", 5.0), ("t", "a", 5.0), ("t", "b", 5.0),
      ("t", "b", 5.0), ("solo", "a", 1.0), ("solo", "a", 2.0))
      .toDF("key", "g", "v")
    val rows = Quality.kruskalWallis(df, "key", "g", "v").collect()
    assert(rows.map(_.getString(0)).toSet === Set("t"))
    assert(rows(0).isNullAt(4))
  }

  // ---- Quality.brownForsythe ----

  test("brownForsythe: hand-computed F on a two-group spread difference") {
    // g1 (0,10,20): med 10, z = (10,0,10); g2 (5,10,15): z = (5,0,5)
    // integer-unit terms: b = (133, 33), w = (67, 17)
    // between = 166 - 900/6 = 16; F = (16/1) / (84/4) = 0.761905
    val df = Seq(("k", "g1", 0.0), ("k", "g1", 10.0), ("k", "g1", 20.0),
      ("k", "g2", 5.0), ("k", "g2", 10.0), ("k", "g2", 15.0))
      .toDF("key", "g", "v")
    val r = Quality.brownForsythe(df, "key", "g", "v").collect()
    assert(r.length === 1)
    assert(r(0).getLong(1) === 6L && r(0).getLong(2) === 2L)
    assert(r(0).getLong(3) === 1L && r(0).getLong(4) === 4L)
    assert(near(r(0).getDouble(5), 16.0 / 21.0, 1e-5))
  }

  test("brownForsythe: zero within-deviation reports null f; keys need 2 groups") {
    val df = Seq(("z", "a", 5.0), ("z", "a", 5.0), ("z", "b", 9.0),
      ("z", "b", 9.0), ("one", "a", 1.0), ("one", "a", 7.0))
      .toDF("key", "g", "v")
    val rows = Quality.brownForsythe(df, "key", "g", "v").collect()
    assert(rows.map(_.getString(0)).toSet === Set("z"))
    assert(rows(0).isNullAt(5))
  }

  // ---- Quality.zToPTwoSided + bhCorrect ----

  test("zToPTwoSided: matches the normal tail at the standard quantiles") {
    val zs = Seq(0.0, 1.0, 1.959964, 3.0).toDF("z")
    val ps = zs.select(Quality.zToPTwoSided(col("z")).as("p"))
      .collect().map(_.getDouble(0))
    assert(near(ps(0), 1.0, 1e-7))             // A&S at z = 0
    assert(near(ps(1), 0.317311, 1e-4))        // 2·(1−Φ(1))
    assert(near(ps(2), 0.05, 1e-4))            // the 95% quantile
    assert(near(ps(3), 0.0027, 1e-4))          // 3σ
  }

  test("bhCorrect: step-up rejects BELOW the largest passing rank even through a local miss") {
    // p2 = 0.049 misses its own threshold 0.0333 but p3 = 0.05 passes
    // rank 3's — the step-up rejects all three
    val tests = Seq(("t1", 0.001), ("t2", 0.049), ("t3", 0.05))
      .toDF("test_id", "p")
    val r = Quality.bhCorrect(tests, "test_id", "p", alpha = 0.05)
      .orderBy(col("rank")).collect()
    assert(r.map(_.getBoolean(5)).toSeq === Seq(true, true, true))
    // adjusted q: p·m/i = (.003, .0735, .05) → reversed min
    assert(near(r(0).getDouble(4), 0.003))
    assert(near(r(1).getDouble(4), 0.05))
    assert(near(r(2).getDouble(4), 0.05))
  }

  test("bhCorrect: non-rejections past the cut, q clamped at 1, null p excluded") {
    val tests = Seq(("a", 0.01), ("b", 0.02), ("c", 0.8),
      ("d", 0.9), ("e", Double.NaN))
      .toDF("test_id", "p")
      .withColumn("p", when(isnan(col("p")), lit(null)).otherwise(col("p")))
    val r = Quality.bhCorrect(tests, "test_id", "p", alpha = 0.05)
      .orderBy(col("rank")).collect()
    assert(r.length === 4) // null p dropped
    assert(r.map(_.getBoolean(5)).toSeq === Seq(true, true, false, false))
    assert(r(3).getDouble(4) === 0.9) // q = min(1, 0.9·4/4)
  }

  test("bhCorrect structural invariants: q monotone in rank, rejections form a prefix, q >= p") {
    val ps = Seq(0.0001, 0.013, 0.014, 0.2, 0.04, 0.9, 0.35, 0.021)
    val tests = ps.zipWithIndex.map { case (p, i) => (s"t$i", p) }
      .toDF("test_id", "p")
    val r = Quality.bhCorrect(tests, "test_id", "p", alpha = 0.05)
      .orderBy(col("rank")).collect()
    val qs = r.map(_.getDouble(4))
    val rejects = r.map(_.getBoolean(5))
    // adjusted q is the reversed running min → non-decreasing in rank
    qs.sliding(2).foreach { case Array(a, b) => assert(a <= b) }
    // the step-up rejects a PREFIX of the ranking, never a gap
    assert(!rejects.dropWhile(identity).contains(true))
    // adjusted never below raw
    r.foreach(row => assert(row.getDouble(4) >= row.getDouble(2) - 1e-9))
  }

  // ---- Quality.powerMde ----

  test("powerMde: closed-form MDE and n/arm on a hand fixture") {
    val df = Seq(("k", "A", 1L), ("k", "A", 2L), ("k", "A", 3L),
      ("k", "B", 2L), ("k", "B", 4L), ("k", "B", 6L))
      .toDF("key", "g", "v")
    val r = Quality.powerMde(df, "key", "g", "v", "A", "B").collect()
    assert(r.length === 1)
    val zsum = 1.959964 + 0.841621
    // var_a = 1, var_b = 4, pooled mean = 3
    val mde = zsum * math.sqrt(1.0 / 3 + 4.0 / 3)
    assert(near(r(0).getDouble(3), 3.0))
    assert(near(r(0).getDouble(4), mde, 1e-5))
    assert(near(r(0).getDouble(5), mde / 3.0, 1e-5))
    val n = math.ceil(BigDecimal(zsum * zsum * 5.0 / (0.15 * 0.15))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r(0).getLong(6) === n.toLong)
  }

  test("powerMde: keys need 2 rows per group; zero mean gives null relative rows") {
    val df = Seq(("thin", "A", 1L), ("thin", "B", 2L), ("thin", "B", 3L),
      ("zero", "A", 1L), ("zero", "A", -1L),
      ("zero", "B", 2L), ("zero", "B", -2L))
      .toDF("key", "g", "v")
    val rows = Quality.powerMde(df, "key", "g", "v", "A", "B").collect()
    assert(rows.map(_.getString(0)).toSet === Set("zero"))
    assert(rows(0).isNullAt(5) && rows(0).isNullAt(6))
    assert(!rows(0).isNullAt(4)) // absolute MDE still reported
  }

  // ---- Quality.calibration ----

  test("calibration: perfectly calibrated bin scores ECE 0; miscalibration measured exactly") {
    // key 0: score .8, 8 of 10 convert → ece 0, brier .16
    // key 1: score .9, 5 of 10 convert → ece .4, brier .41
    val rows =
      (1 to 8).map(i => (0L, 0.8, 1L)) ++ (1 to 2).map(_ => (0L, 0.8, 0L)) ++
      (1 to 5).map(_ => (1L, 0.9, 1L)) ++ (1 to 5).map(_ => (1L, 0.9, 0L))
    val df = rows.toDF("cohort", "score", "label")
    val r = Quality.calibration(df, "cohort", "score", "label", bins = 10)
      .orderBy(col("cohort")).collect()
    assert(r(0).getLong(1) === 10L)
    assert(near(r(0).getDouble(2), 0.0))
    assert(near(r(0).getDouble(3), 0.16))
    assert(near(r(1).getDouble(2), 0.4))
    assert(near(r(1).getDouble(3), 0.41))
  }

  // ---- Analytics.twap ----

  test("twap: hand-computed time-weighted average; last sample holds nothing; zero span null") {
    import graft.pipeline.Analytics
    // key a: v=10 holds 30 s, v=40 holds 10 s, v=100 holds 0
    //   twa = (10*30 + 40*10) / 40 = 17.5  (plain mean would be 50)
    val df = Seq(
      ("a", "2024-01-01 00:00:00", 1L, 10.0),
      ("a", "2024-01-01 00:00:30", 2L, 40.0),
      ("a", "2024-01-01 00:00:40", 3L, 100.0),
      ("b", "2024-01-01 00:00:00", 4L, 7.0))
      .toDF("k", "ts", "id", "v")
      .withColumn("ts", col("ts").cast("timestamp"))
    val out = Analytics.twap(df, "k", "ts", "id", "v")
      .orderBy(col("k")).collect()
    assert(out(0).getLong(1) === 3L && out(0).getLong(2) === 40L)
    assert(near(out(0).getDouble(3), 17.5))
    assert(out(1).isNullAt(3)) // single sample: zero span
  }

  test("twap: same-timestamp samples tie-break on id and hold zero seconds") {
    import graft.pipeline.Analytics
    val df = Seq(
      ("a", "2024-01-01 00:00:00", 1L, 10.0),
      ("a", "2024-01-01 00:00:00", 2L, 999.0), // 0-second hold
      ("a", "2024-01-01 00:00:10", 3L, 20.0))
      .toDF("k", "ts", "id", "v")
      .withColumn("ts", col("ts").cast("timestamp"))
    val out = Analytics.twap(df, "k", "ts", "id", "v").collect()(0)
    // v=10 holds 0 s (next sample same second), v=999 holds 10 s
    assert(near(out.getDouble(3), 999.0))
  }

  // ---- Sampling.targetEncode ----

  test("targetEncode: LOO excludes the row's own label; singleton encodes to the prior") {
    import graft.operators.Sampling
    // cat x: 3 rows, 2 positive; cat y: singleton positive
    // prior = 3/4; m = 10
    // x row with y=1: (2-1 + 10*0.75)/(3-1+10) = 8.5/12
    // x row with y=0: (2-0 + 7.5)/12 = 9.5/12
    // y singleton:    (1-1 + 7.5)/(1-1+10) = 0.75 exactly the prior
    val df = Seq((1L, "x", 1L), (2L, "x", 1L), (3L, "x", 0L),
      (4L, "y", 1L)).toDF("id", "cat", "y")
    val out = Sampling.targetEncode(df, "id", "cat", "y")
      .orderBy(col("id")).collect()
    assert(near(out(0).getDouble(3), 8.5 / 12))
    assert(near(out(1).getDouble(3), 8.5 / 12))
    assert(near(out(2).getDouble(3), 9.5 / 12))
    assert(near(out(3).getDouble(3), 0.75))
  }

  // ---- Sampling.balancedSample ----

  test("balancedSample: every class lands at the minority count; membership is repartition-stable") {
    import graft.operators.Sampling
    val df = ((1 to 50).map(i => (i.toLong, "big")) ++
      (101 to 120).map(i => (i.toLong, "mid")) ++
      (201 to 207).map(i => (i.toLong, "small")))
      .toDF("id", "cls")
    val out = Sampling.balancedSample(df, "id", "cls")
    val sizes = out.groupBy(col("cls")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes === Map("big" -> 7L, "mid" -> 7L, "small" -> 7L))
    val a = out.select(col("id")).collect().map(_.getLong(0)).toSet
    val b = Sampling.balancedSample(df.repartition(7), "id", "cls")
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(a === b) // pure function of data + seed
  }

  // ---- Multimodal audio round-trip ----

  test("audioMetadata: synthesized WAV params recovered exactly; corrupt bytes degrade") {
    import graft.multimodal.{MediaRow, Multimodal}
    // amp = 256*4: rms = peak = 4/128 exactly -> x1e7 = 312500
    val wav = Multimodal.synthWav(8000, 1600, 256 * 4)
    val direct = Multimodal.decodeAudio(wav).get
    assert(direct._1 === 8000.0f && direct._2 === 1 && direct._3 === 200L)
    val media = Seq(
      MediaRow(1L, "audio", wav, 0, 0, 0L),
      MediaRow(2L, "audio", Array[Byte](1, 2, 3), 0, 0, 777L),
      MediaRow(3L, "video", wav, 0, 0, 0L)) // wrong type: excluded
      .toDS()
    val out = Multimodal.audioMetadata(media)
      .orderBy(col("media_id")).collect()
    assert(out.length === 2)
    assert(out(0).getDouble(1) === 8000.0 && out(0).getLong(2) === 1L)
    assert(out(0).getLong(3) === 200L)
    assert(out(0).getLong(4) === 312500L && out(0).getLong(5) === 312500L)
    assert(out(0).getBoolean(6))
    assert(!out(1).getBoolean(6) && out(1).getLong(3) === 777L)
  }

  // ---- Quality.medianCi ----

  test("medianCi: order-statistic ranks and values on a hand fixture; thin keys dropped") {
    // n = 25: r_lo = floor((25 - 1.959964*5)/2) = floor(7.60) = 7
    //         r_hi = ceil(1 + (25 + 9.79982)/2) = ceil(18.40) = 19
    val df = ((1 to 25).map(i => ("k", i.toLong, i.toDouble)) ++
      (1 to 5).map(i => ("thin", i.toLong, i.toDouble)))
      .toDF("key", "id", "v")
    val out = Quality.medianCi(df, "key", "id", "v").collect()
    assert(out.map(_.getString(0)).toSeq === Seq("k"))
    val r = out(0)
    assert(r.getLong(1) === 25L)
    assert(near(r.getDouble(2), 13.0)) // odd n: exact middle
    assert(r.getLong(3) === 7L && r.getLong(4) === 19L)
    assert(r.getDouble(5) === 7.0 && r.getDouble(6) === 19.0)
  }

  test("medianCi: interval brackets the median and widens with spread") {
    val tight = (1 to 100).map(i => ("t", i.toLong, 50.0 + (i % 3)))
    val wide = (1 to 100).map(i => ("w", i.toLong, (i * 7 % 100).toDouble))
    val out = Quality.medianCi((tight ++ wide).toDF("key", "id", "v"),
        "key", "id", "v")
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(5), r.getDouble(6))).toMap
    val (tm, tlo, thi) = out("t"); val (wm, wlo, whi) = out("w")
    assert(tlo <= tm && tm <= thi)
    assert(wlo <= wm && wm <= whi)
    assert(whi - wlo > thi - tlo) // wider spread, wider interval
  }

  // ---- Quality.sampleRatioMismatch ----

  test("sampleRatioMismatch: balanced split passes, gross imbalance fires, chi2 exact") {
    val units = ((1 to 500).map(i => ("bal", "A")) ++
      (1 to 500).map(_ => ("bal", "B")) ++
      (1 to 700).map(_ => ("broken", "A")) ++
      (1 to 300).map(_ => ("broken", "B")))
      .toDF("k", "g")
    val out = Quality.sampleRatioMismatch(units, "k", "g", "A", "B")
      .orderBy(col("k")).collect()
    assert(out(0).getDouble(3) === 0.0 && !out(0).getBoolean(5))
    // (700-500)^2/500 + (300-500)^2/500 = 160
    assert(near(out(1).getDouble(3), 160.0))
    assert(out(1).getBoolean(5))
    assert(out(1).getDouble(4) < 1e-4)
  }

  // ---- Analytics.olsMulti ----

  test("olsMulti: exact generating coefficients recovered, R2 = 1; singular design nulls") {
    import graft.pipeline.Analytics
    // y = 2 + 3t + 5w exactly; w varies
    val rows = (0L to 9L).map(t => ("fit", t, t % 3 match {
      case 0 => 1L; case _ => 0L }, 2L + 3L * t + 5L * (if (t % 3 == 0) 1L else 0L)))
    // singular: w constant zero
    val sing = (0L to 5L).map(t => ("sing", t, 0L, 10L + t))
    val df = (rows ++ sing).toDF("k", "t", "w", "y")
    val out = Analytics.olsMulti(df, "k", "t", "w", "y")
      .orderBy(col("k")).collect()
    assert(near(out(0).getDouble(2), 2.0))
    assert(near(out(0).getDouble(3), 3.0))
    assert(near(out(0).getDouble(4), 5.0))
    assert(near(out(0).getDouble(5), 1.0))
    assert(out(1).isNullAt(2) && out(1).isNullAt(3) && out(1).isNullAt(4))
  }

  test("olsMulti: the dummy decouples trend from weekend load") {
    import graft.pipeline.Analytics
    // flat weekday volume 100, weekends +50, NO true trend — but
    // weekends cluster late in the window, so single-var OLS on t
    // would see a fake positive slope; the joint fit must not
    val rows = (0L to 13L).map { t =>
      val w = if (t >= 10) 1L else 0L // "weekends" late in the window
      ("k", t, w, 100L + 50L * w)
    }
    val out = Analytics.olsMulti(rows.toDF("k", "t", "w", "y"),
      "k", "t", "w", "y").collect()(0)
    assert(near(out.getDouble(3), 0.0)) // beta_t: no fake trend
    assert(near(out.getDouble(4), 50.0))
  }

  // ---- Graph.localClustering ----

  test("localClustering: triangle corners score by the closed form, pendants null, cycles zero") {
    import graft.operators.Graph
    // triangle A-B-C, pendant D on A, and a separate 4-cycle
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L),
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 10L))
      .toDF("a", "b")
    val out = Graph.localClustering(edges, "a", "b")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), if (r.isNullAt(3)) None
         else Some(r.getDouble(3)))).toMap
    assert(out(1L) === ((3L, 1L, Some(1.0 / 3))) ||
      near(out(1L)._3.get, 1.0 / 3)) // deg 3, one triangle
    assert(out(2L)._3.get === 1.0 && out(3L)._3.get === 1.0)
    assert(out(4L) === ((1L, 0L, None))) // pendant: undefined
    Seq(10L, 11L, 12L, 13L).foreach { n =>
      assert(out(n) === ((2L, 0L, Some(0.0)))) // square: no triangles
    }
  }

  test("localClustering: duplicate and reversed edges collapse to one") {
    import graft.operators.Graph
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L))
      .toDF("a", "b")
    val out = Graph.localClustering(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  // ---- Analytics.safetyStock ----

  test("safetyStock: closed-form zero-month fill and hand-computed sigma") {
    import graft.pipeline.Analytics
    // part 1: jan 10, mar 20, feb ABSENT (zero demand) ->
    //   n = 3 (corpus span), mu = 10, sigma = sqrt((3*500-900)/6) = 10
    val li = Seq(
      (1L, "1995-01-10", 4L), (1L, "1995-01-20", 6L),
      (1L, "1995-03-05", 20L),
      (2L, "1995-01-01", 5L), (2L, "1995-03-01", 5L))
      .toDF("l_partkey", "l_shipdate", "l_quantity")
      .withColumn("l_shipdate", col("l_shipdate").cast("date"))
    val out = Analytics.safetyStock(li, lit(true))
      .orderBy(col("part")).collect()
    assert(out(0).getLong(1) === 3L)
    assert(near(out(0).getDouble(2), 10.0))
    assert(near(out(0).getDouble(3), 10.0))
    val safety = 1.644854 * 10.0 * math.sqrt(2.0)
    assert(near(out(0).getDouble(4), safety, 1e-5))
    assert(near(out(0).getDouble(5), 20.0 + safety, 1e-5))
    // part 2: 5, 0, 5 -> mu 10/3, sigma sqrt((3*50-100)/6)
    assert(near(out(1).getDouble(3), math.sqrt(50.0 / 6), 1e-5))
  }

  // ---- Quality.candidateKeysApprox ----

  test("candidateKeysApprox: estimates track exact within the sketch rsd; true keys never screened out") {
    val df = (1L to 5000L).map(i => (i, i % 7, i % 500))
      .toDF("pk", "seven", "fine")
    val combos = Seq(Seq("pk"), Seq("seven"), Seq("fine"),
      Seq("seven", "fine"))
    val exact = Quality.candidateKeys(df, combos).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val approx = Quality.candidateKeysApprox(df, combos).collect()
    approx.foreach { r =>
      val est = r.getLong(2).toDouble
      val ex = exact(r.getString(0)).toDouble
      assert(math.abs(est - ex) <= 0.05 * ex,
        s"${r.getString(0)}: est $est vs exact $ex")
    }
    val verdicts = approx.map(r => r.getString(0) -> r.getBoolean(4)).toMap
    assert(verdicts("pk"), "a true key must pass the triage screen")
    assert(!verdicts("seven") && !verdicts("fine"),
      "coarse columns must fail the screen")
  }

  // ---- EventStream.qualityGate ----

  test("qualityGate: rule failures drop at the door, replay no-op, split-invariant") {
    import graft.sources.VersionedGroup
    import graft.streaming.EventStream
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val src = tmpDir("qgate-src")
    val root = tmpDir("qgate-root") + "/idx"
    def land(name: String, rows: Seq[(Long, String)]): Unit = {
      val staging = tmpDir("qgate-stage")
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(src, s"$name.parquet"))
    }
    val good = (1 to 30).map(i => s"word$i").mkString(" ")
    land("b0", Seq(
      (1L, good),                     // passes every rule
      (2L, "too short"),              // < 5 words
      (3L, Seq.fill(30)("same").mkString(" ")))) // diversity fail
    val stream = spark.readStream.schema(StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType))))
      .parquet(src)
    val q = EventStream.qualityGate(stream, root, tmpDir("qgate-ckpt"),
      "doc_id", "text", minWords = 5L, maxWords = 100L,
      minDistinctRatio = 0.3, maxTopWordFrac = 0.5)
    q.processAllAvailable()
    def docIds = VersionedGroup.read(spark, root, "docs")
      .collect().map(_.getLong(0)).toSet
    assert(docIds === Set(1L))
    assert(VersionedGroup.currentVersion(spark, root) === 1)
    // day 2 + redelivery of day 1: survivors append once, failures
    // fail identically, replays commit nothing
    land("b1", Seq((4L, good + " and more"), (2L, "too short")))
    q.processAllAvailable()
    assert(docIds === Set(1L, 4L))
    land("b2", Seq((1L, good)))
    q.processAllAvailable()
    assert(docIds === Set(1L, 4L))
    q.stop()
    Par.release()
  }

  // ---- EventStream.srmMonitor ----

  test("srmMonitor: accumulated unit set equals the batch view; chatty users and replays count once") {
    import graft.sources.VersionedGroup
    import graft.streaming.EventStream
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val src = tmpDir("srm-src")
    val root = tmpDir("srm-root") + "/idx"
    def land(name: String, rows: Seq[(String, Long, Long)]): Unit = {
      val staging = tmpDir("srm-stage")
      rows.toDF("k", "user_id", "event_id").coalesce(1)
        .write.mode("overwrite").parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(src, s"$name.parquet"))
    }
    // user 1 emits 3 events in batch 1 and again in batch 2 —
    // must count ONCE
    land("b0", Seq(("x", 1L, 1L), ("x", 1L, 2L), ("x", 1L, 3L),
      ("x", 2L, 4L)))
    val stream = spark.readStream.schema(StructType(Seq(
        StructField("k", StringType), StructField("user_id", LongType),
        StructField("event_id", LongType))))
      .parquet(src)
    val q = EventStream.srmMonitor(stream, root, tmpDir("srm-ckpt"),
      "k", "user_id", pmod(col("user_id"), lit(2)).cast("string"))
    q.processAllAvailable()
    def units = VersionedGroup.read(spark, root, "units")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(units === Set(("x", 1L), ("x", 2L)))
    land("b1", Seq(("x", 1L, 9L), ("x", 3L, 10L), ("x", 4L, 11L)))
    q.processAllAvailable()
    assert(units === Set(("x", 1L), ("x", 2L), ("x", 3L), ("x", 4L)))
    q.stop()
    val srm = Quality.sampleRatioMismatch(
      VersionedGroup.read(spark, root, "units")
        .withColumnRenamed("k", "key"), "key", "g", "1", "0").collect()(0)
    assert(srm.getLong(1) === 2L && srm.getLong(2) === 2L) // 2 odd, 2 even
    Par.release()
  }

  // ---- JaroWinkler expression + Linkage.jaroWinklerPairs ----

  test("JaroWinkler: reference values pinned against the DuckDB/RapidFuzz formulation") {
    def jw(a: String, b: String): Double =
      JaroWinklerImpl.compute(UTF8String.fromString(a),
        UTF8String.fromString(b))
    // probed against duckdb jaro_winkler_similarity verbatim
    assert(jw("MARTHA", "MARHTA") === 0.9611111111111111)
    assert(jw("DIXON", "DICKSONX") === 0.8133333333333332)
    assert(jw("JELLYFISH", "SMELLYFISH") === 0.8962962962962964)
    assert(jw("abc", "abc") === 1.0)
    assert(jw("", "abc") === 0.0)
    assert(jw("", "") === 0.0)       // DuckDB: empty NEVER similar
    assert(jw("ab", "ba") === 0.0)   // window 0: no cross-position match
    // boost threshold: jaro 2/3 <= 0.7 gets NO prefix bonus
    assert(jw("abcd", "abzz") === 0.6666666666666666)
    // just above 0.7: bonus applies
    assert(jw("prefix_same", "prefiy_xxxx") === 0.8259740259740259)
  }

  test("JaroWinkler: codegen'd column path equals the direct impl; nulls propagate") {
    val pairs = Seq(("Customer#000000001", "Customer#000000010"),
      ("Customer#000000123", "Customer#000000321"),
      ("alpha beta", "alpha bate"), ("x", "y"))
    val df = pairs.toDF("a", "b")
    val got = df.select(StringSim.jaroWinkler(col("a"), col("b")))
      .collect().map(_.getDouble(0))
    val want = pairs.map { case (a, b) =>
      JaroWinklerImpl.compute(UTF8String.fromString(a),
        UTF8String.fromString(b)) }
    assert(got.toSeq === want)
    val n = Seq(("a", null: String)).toDF("a", "b")
      .select(StringSim.jaroWinkler(col("a"), col("b"))).collect()
    assert(n(0).isNullAt(0))
  }

  test("jaroWinklerPairs: equals brute force within blocks; length-ratio prune never drops a qualifying pair") {
    val rows = Seq((1L, "jonathan smith", "b1"), (2L, "jonathon smith", "b1"),
      (3L, "jon smith", "b1"), (4L, "entirely other", "b1"),
      (5L, "jonathan smith", "b2"), // same name, other block: no pair
      (6L, "zz", "b1")) // extreme length ratio: prune fodder
    val df = rows.toDF("id", "name", "blk")
    val minSim = 0.9
    val expected = (for {
      (ia, na, ba) <- rows; (ib, nb, bb) <- rows
      if ia < ib && ba == bb
      s = JaroWinklerImpl.compute(UTF8String.fromString(na),
        UTF8String.fromString(nb))
      s6 = BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if s6 >= minSim
    } yield (ia, ib, s6)).sorted
    val got = Linkage.jaroWinklerPairs(df, "id", "name", col("blk"), minSim)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq.sorted
    assert(got === expected)
    assert(got.map(p => (p._1, p._2)).contains((1L, 2L)))
    assert(!got.map(p => (p._1, p._2)).contains((1L, 5L)))
  }

  // ---- Text.mapMrrAtK ----

  test("mapMrrAtK: MRR and AP recomputed independently from the ranking; strict-AND relevance") {
    val docs = Seq(
      (1L, "spark hash join spark hash join filler words here"),
      (2L, "spark spark spark only this term repeated often"),
      (3L, "hash join hash join no first term present"),
      (4L, "spark hash join all three once padding padding"),
      (5L, "nothing relevant at all in this document"),
      (6L, "spark hash join spark hash join spark hash join"))
      .toDF("doc_id", "text")
    val k = 4 // force a relevant doc OUT of the cut
    val out = Text.mapMrrAtK(docs, "doc_id", "text",
      Seq("spark", "hash", "join"), k).collect()(0)
    // independent recomputation from the collected ranking
    val ranked = Text.bm25TopK(docs, "doc_id", "text",
        Seq("spark", "hash", "join"), k)
      .orderBy(col("rank")).collect()
      .map(r => r.getLong(0))
    val relevant = Set(1L, 4L, 6L) // contain all three terms
    val flags = ranked.map(relevant.contains)
    val firstRank = flags.indexOf(true) + 1
    var cum = 0
    var ap6 = 0L
    flags.zipWithIndex.foreach { case (f, i) =>
      if (f) { cum += 1
        ap6 += math.round(cum.toDouble / (i + 1).toDouble * 1e6) }
    }
    val ap = ap6 / 1e6 / math.min(relevant.size, k)
    assert(out.getLong(0) === ranked.length.toLong)
    assert(out.getLong(1) === 3L)
    assert(out.getLong(3) === firstRank.toLong)
    assert(near(out.getDouble(4),
      BigDecimal(1.0 / firstRank).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble))
    assert(near(out.getDouble(5), ap, 1e-6))
  }

  test("mapMrrAtK: no relevant docs gives null rank/mrr and zero ap denominator handled") {
    val docs = Seq((1L, "spark only"), (2L, "hash only"), (3L, "join only"))
      .toDF("doc_id", "text")
    val out = Text.mapMrrAtK(docs, "doc_id", "text",
      Seq("spark", "hash", "join"), 10).collect()(0)
    assert(out.getLong(1) === 0L) // nothing has all three
    assert(out.isNullAt(3) && out.isNullAt(4) && out.isNullAt(5))
  }

  test("calibration: score 1.0 lands in the top bin, mixed bins weight by count") {
    val df = Seq((0L, 1.0, 1L), (0L, 0.95, 1L), (0L, 0.95, 0L),
      (0L, 0.05, 0L)).toDF("cohort", "score", "label")
    val r = Quality.calibration(df, "cohort", "score", "label", bins = 10)
      .collect()
    assert(r.length === 1 && r(0).getLong(1) === 4L)
    // bins: {1.0, .95, .95} in bin 9 (conf .966667, acc 2/3),
    // {.05} in bin 0 (conf .05, acc 0)
    val ece = (3.0 * math.abs(2900000.0 / (3 * 1e6) - 2.0 / 3) +
      1.0 * 0.05) / 4.0
    assert(near(r(0).getDouble(2), ece, 1e-5))
  }
}
