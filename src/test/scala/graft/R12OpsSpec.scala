package graft

import graft.operators.{Dedup, Quality, Recurrence}
import org.apache.spark.sql.functions._

/** Round-12 wave operators: Croston/SBA intermittent-demand forecast,
  * deterministic bootstrap CI, tf-idf cosine retrieval, generalized
  * ESD outlier screen, pair-set evaluation scorecard.
  */
class R12OpsSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  // ---- Recurrence.crostonSba ----

  test("crostonSba: hand-computed fold — seeding, interval counting, SBA scaling") {
    // key 1: x = [0, 4, 0, 0, 6, 0, 2] on a monthly grid
    val months = (0 to 6).map(i => ts(f"2024-${i + 1}%02d-01 00:00:00"))
    val xs = Seq(0L, 4L, 0L, 0L, 6L, 0L, 2L)
    val grid = xs.zipWithIndex.map { case (x, i) => (1L, months(i), x) }
      .toDF("part", "month_start", "qty")
    val got = Recurrence.crostonSba(grid, "part", "month_start", "qty")
      .orderBy("month_start")
      .collect().map(r => (Option(r.get(3)), Option(r.get(4)),
        Option(r.get(5)), Option(r.get(6))))
    // t1: no demand yet → all null
    assert(got(0) === ((None, None, None, None)))
    // t2: first demand x=4 after q=2 periods → z=4, p=2, f=2, sba=1.5
    assert(got(1) === ((Some(4.0), Some(2.0), Some(2.0), Some(1.5))))
    // t3-t4 zero periods carry state
    assert(got(2) === got(1) && got(3) === got(1))
    // t5: x=6, q=3 → z=.5·6+.5·4=5, p=.5·3+.5·2=2.5 → f=2, sba=1.5
    assert(got(4) === ((Some(5.0), Some(2.5), Some(2.0), Some(1.5))))
    // t7: x=2, q=2 → z=.5·2+.5·5=3.5, p=.5·2+.5·2.5=2.25
    val f7 = 3.5 / 2.25
    assert(got(6) === ((Some(3.5), Some(2.25), Some(f7), Some(0.75 * f7))))
  }

  test("crostonSba: never-demanded key stays null; key reset; partition invariance") {
    val months = (0 to 5).map(i => ts(f"2024-${i + 1}%02d-01 00:00:00"))
    val rows = months.map(m => (1L, m, 0L)) ++
      months.zipWithIndex.map { case (m, i) =>
        (2L, m, if (i % 2 == 0) (i + 1).toLong else 0L) }
    val df = rows.toDF("part", "month_start", "qty")
    val a = Recurrence.crostonSba(df, "part", "month_start", "qty")
      .orderBy("part", "month_start").collect().toSeq
    // key 1: all-zero series never seeds
    a.filter(_.getLong(0) == 1L).foreach { r =>
      assert(r.isNullAt(3) && r.isNullAt(5) && r.isNullAt(6))
    }
    // key 2 seeds at its first month (x=1, q=1 → f=1)
    val k2 = a.filter(_.getLong(0) == 2L)
    assert(k2.head.getDouble(5) === 1.0)
    // partition-order invariance: bit-identical doubles
    val b = Recurrence.crostonSba(df.repartition(5), "part", "month_start", "qty")
      .orderBy("part", "month_start").collect().toSeq
    assert(a === b)
  }

  // ---- Quality.bootstrapMeanDiff ----

  test("bootstrapMeanDiff: deterministic, CI brackets a separated diff, constant groups collapse the CI") {
    val rows = (1 to 60).map(i =>
      ("a", i.toLong, 100.0 + (i % 7))) ++
      (1 to 50).map(i => ("b", 1000L + i, 50.0 + (i % 5)))
    val df = rows.toDF("g", "id", "v")
    val r1 = Quality.bootstrapMeanDiff(df, "g", "id", "v", "a", "b",
      resamples = 80).head()
    assert(r1.getLong(0) === 60L && r1.getLong(1) === 50L)
    val diff = r1.getDouble(4)
    assert(diff > 45 && diff < 55)
    // percentile CI must bracket the point estimate for a clean shift
    assert(r1.getDouble(5) < diff && diff < r1.getDouble(6))
    assert(r1.getDouble(5) > 40 && r1.getDouble(6) < 60)
    // bit-identical across partitioning (md5 draws, exact sums)
    val r2 = Quality.bootstrapMeanDiff(df.repartition(7), "g", "id", "v",
      "a", "b", resamples = 80).head()
    assert(r1.toSeq === r2.toSeq)
    // constant values per group: every resample mean equals the group
    // mean → the CI collapses onto the point diff (n=30 per group so
    // an all-zero Poisson replicate is impossible in practice)
    val const = ((1 to 30).map(i => ("a", i.toLong, 7.0)) ++
      (1 to 30).map(i => ("b", 100L + i, 3.0))).toDF("g", "id", "v")
    val rc = Quality.bootstrapMeanDiff(const, "g", "id", "v", "a", "b",
      resamples = 40).head()
    assert(rc.getDouble(4) === 4.0 &&
      rc.getDouble(5) === 4.0 && rc.getDouble(6) === 4.0)
  }

  test("bootstrapMeanDiff: a 1-row group (null replicates) still yields a CI, not an empty frame") {
    // a singleton group draws Poisson(1) weight 0 in ~1/e of
    // replicates → those replicate diffs are null-filtered; the r12
    // tail indexes assumed all `resamples` survive, so hiIdx
    // overshot the max rank and the crossJoin returned EMPTY. The
    // tails must index off the SURVIVING count.
    val df = ((1 to 25).map(i => ("a", i.toLong, 10.0 + (i % 3))) ++
      Seq(("b", 500L, 4.0))).toDF("g", "id", "v")
    val out = Quality.bootstrapMeanDiff(df, "g", "id", "v", "a", "b",
      resamples = 40).collect()
    assert(out.length === 1, "CI row must exist despite null replicates")
    val r = out.head
    assert(r.getLong(1) === 1L)
    assert(!r.isNullAt(5) && !r.isNullAt(6))
    assert(r.getDouble(5) <= r.getDouble(6))
  }

  // ---- Text.tfidfCosineTopK ----

  test("tfidfCosineTopK: exact-match doc scores cosine 1.0; non-matching docs absent; ties break low id") {
    val docs = Seq(
      (1L, "spark hash join"),            // exactly the query → cosine 1
      (2L, "spark hash join"),            // identical twin → tie, id order
      (3L, "spark spark spark filter"),   // partial, tf-weighted
      (4L, "sort merge filter scan"),     // no query term → absent
      (5L, "hash hash table probe build")
    ).toDF("doc_id", "text")
    val got = functions.Text.tfidfCosineTopK(docs, "doc_id", "text",
        Seq("spark", "hash", "join"), k = 10)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(got.length === 4)             // doc 4 never scored
    assert(got(0) === ((1, 1L, 1.0)))    // perfect match, lower id first
    assert(got(1) === ((2, 2L, 1.0)))
    assert(got.forall(_._3 <= 1.0))
    // k cut honors the rounded-score order
    val top2 = functions.Text.tfidfCosineTopK(docs, "doc_id", "text",
      Seq("spark", "hash", "join"), k = 2).collect()
    assert(top2.map(_.getLong(1)).toSeq === Seq(1L, 2L))
  }

  // ---- Quality.esdOutliers ----

  test("esdOutliers: unmasks the second outlier, exact argmax ties to the low slot, degenerate keys skipped") {
    // key 1: baseline 10s with outliers 100 (slot 3) and 60 (slot 7) —
    // the 100 inflates s enough that a one-shot 3σ screen misses 60
    val k1 = Seq(10L, 11L, 9L, 100L, 10L, 12L, 8L, 60L, 10L, 11L)
      .zipWithIndex.map { case (x, i) => (1L, i.toLong, x) }
    // key 2: constant → zero variance, never flagged
    val k2 = (0 to 5).map(i => (2L, i.toLong, 5L))
    // key 3: two points only → n < 3, never flagged
    val k3 = Seq((3L, 0L, 1L), (3L, 1L, 99L))
    val df = (k1 ++ k2 ++ k3).toDF("k", "slot", "x")
    val got = Quality.esdOutliers(df, "k", "slot", "x", rounds = 3)
      .orderBy("k", "esd_round").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(got.forall(_._1 == 1L), "only key 1 may flag")
    assert(got(0) === ((1L, 1, 3L, 100L)), "round 1 takes the big outlier")
    assert(got(1) === ((1L, 2, 7L, 60L)), "round 2 unmasks the second")
    // round 3 flags SOMETHING from the 8-12 remainder (ESD reports
    // candidates; the λ cut is the caller's) — tie on |n·x−S| goes to
    // the lowest slot
    assert(got.length === 3)
    val rStats = Quality.esdOutliers(df, "k", "slot", "x", rounds = 2)
      .orderBy("esd_round").collect().map(_.getDouble(4))
    assert(rStats(0) > 2.0, "planted outlier deviates hard")
  }

  // ---- Dedup.evalPairs ----

  test("evalPairs: confusion counts with orientation/dup normalization; empty sets null out ratios") {
    val pred = Seq((1L, 2L), (2L, 1L), (3L, 4L), (5L, 6L))
      .toDF("id_a", "id_b") // (1,2) duplicated in both orientations
    val truth = Seq((1L, 2L), (3L, 4L), (7L, 8L)).toDF("id_a", "id_b")
    val r = Dedup.evalPairs(pred, truth).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((2L, 1L, 1L)))
    assert(r.getDouble(3) === round6(2.0 / 3.0))
    assert(r.getDouble(4) === round6(2.0 / 3.0))
    assert(r.getDouble(5) === round6(4.0 / 6.0))
    // empty predicted set: precision null, recall 0
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val re = Dedup.evalPairs(empty, truth).head()
    assert(re.isNullAt(3) && re.getDouble(4) === 0.0)
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  // ---- KMeans.fit ----

  test("kmeans: two tight groups converge to their means; ties to the lower cluster; empty cluster keeps its seed") {
    import graft.operators.KMeans
    // group A hugs (1,1); group B hugs (9,9); point (5,5) is
    // equidistant from the converged centroids → cluster 0 by tie
    val rows = Seq(
      (1L, 1L, 1L), (2L, 1L, 2L), (3L, 2L, 1L),   // A
      (4L, 9L, 9L), (5L, 9L, 8L), (6L, 8L, 9L),   // B
      (7L, 5L, 5L)                                 // the tie point
    ).toDF("id", "x", "y")
    val (assigned, cents) = KMeans.fit(rows, "id", Seq("x", "y"),
      init = Seq(Seq(1.0, 1.0), Seq(9.0, 9.0)), rounds = 4)
    val got = assigned.orderBy("id").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(Seq(1L, 2L, 3L).forall(got(_) == 0))
    assert(Seq(4L, 5L, 6L).forall(got(_) == 1))
    // the tie point joined cluster 0 during iteration, pulling its
    // centroid toward it; it must stay in the LOWER cluster
    assert(got(7L) === 0)
    // centroids are the fixed-point means of their final members
    // (cluster 0 = {1,2,3,7}: mean x = 9/4 = 2.25, y = 2.25)
    assert(cents(0) === Seq(2250000L, 2250000L))
    assert(cents(1) === Seq(8666667L, 8666667L))
    // empty cluster: all-A data with a far unused seed keeps the seed
    val onlyA = rows.filter(col("id") <= 3)
    val (_, cents2) = KMeans.fit(onlyA, "id", Seq("x", "y"),
      init = Seq(Seq(1.0, 1.0), Seq(50.0, 50.0)), rounds = 3)
    assert(cents2(1) === Seq(50000000L, 50000000L))
  }

  // ---- Text.tfidfCosineTopKIndexed ----

  test("tf-idf index union answers exactly like the full re-scan") {
    val docs = Seq(
      (1L, "spark hash join build"), (2L, "hash probe table"),
      (3L, "spark filter scan"), (4L, "join sort merge spark"),
      (5L, "scan scan scan"), (6L, "spark hash join")
    ).toDF("doc_id", "text")
    val full = functions.Text.tfidfCosineTopK(docs, "doc_id", "text",
      Seq("spark", "join"), k = 10).collect().map(_.toSeq).toSeq
    val i1 = functions.Text.tfidfIndexFrame(
      docs.filter(col("doc_id") <= 3), "doc_id", "text")
    val i2 = functions.Text.tfidfIndexFrame(
      docs.filter(col("doc_id") > 3), "doc_id", "text")
    val incr = functions.Text.tfidfCosineTopKIndexed(i1.unionByName(i2),
      Seq("spark", "join"), k = 10).collect().map(_.toSeq).toSeq
    assert(incr === full)
  }

  // ---- Quality.sprtBernoulli ----

  test("sprtBernoulli: crossings at the exact boundary step, continue on thin data") {
    import graft.operators.Quality
    // p0=0.2 vs p1=0.8, α=β=0.05: per-success LLR += ln(4) ≈ 1.386,
    // per-failure += ln(0.25) ≈ −1.386; boundary ln(19) ≈ 2.944 →
    // three successes in a row cross H1 (2·1.386 < 2.944 < 3·1.386)
    val rows =
      (1 to 10).map(i => ("up", i.toLong, true)) ++       // H1 at n=3
      (1 to 10).map(i => ("dn", 100L + i, false)) ++      // H0 at n=3
      Seq(("thin", 200L, true), ("thin", 201L, false))    // no crossing
    val df = rows.toDF("g", "id", "conv")
    val got = Quality.sprtBernoulli(df, "g", "id", "conv",
        p0 = 0.2, p1 = 0.8)
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("up") === (("accept_h1", 3L, 3L)))
    assert(got("dn") === (("accept_h0", 3L, 0L)))
    assert(got("thin")._1 === "continue")
    assert(got("thin")._2 === 2L)
  }

  // ---- Text.cmsTermCounts ----

  test("cmsTermCounts: estimate is one-sided (est >= exact); wide sketch is exact; narrow sketch collides") {
    val docs = Seq(
      (1L, "alpha alpha alpha beta beta gamma"),
      (2L, "alpha beta delta delta epsilon zeta"),
      (3L, "alpha gamma gamma eta theta iota")
    ).toDF("doc_id", "text")
    val wide = functions.Text.cmsTermCounts(docs, "doc_id", "text",
      depth = 4, width = 4096, topK = 10).collect()
    assert(wide.forall(r => r.getLong(2) >= r.getLong(1)))
    // 9 distinct terms into 4×4096 cells: no collisions, est == exact
    assert(wide.forall(r => r.getLong(2) === r.getLong(1)))
    assert(wide.head.getString(0) === "alpha" && wide.head.getLong(1) === 5L)
    // 9 terms into width 2: pigeonhole forces overestimates
    val narrow = functions.Text.cmsTermCounts(docs, "doc_id", "text",
      depth = 2, width = 2, topK = 10).collect()
    assert(narrow.forall(r => r.getLong(2) >= r.getLong(1)))
    assert(narrow.exists(r => r.getLong(2) > r.getLong(1)))
  }

  // ---- Analytics.mannKendall ----

  test("mannKendall: strict ramp maxes S and flags increasing; ties null out; short keys absent") {
    import graft.pipeline.Analytics
    val rows =
      (1 to 10).map(i => (1L, i.toLong, i.toLong * 10)) ++  // strict ramp
      (1 to 8).map(i => (2L, i.toLong, 7L)) ++              // all tied
      Seq((3L, 1L, 5L), (3L, 2L, 9L))                        // n = 2
    val got = Analytics.mannKendall(rows.toDF("k", "p", "x"), "k", "p", "x")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(4)), r.getString(5)))).toMap
    // ramp: S = C(10,2) = 45; Var18 = 10·9·25 = 2250 → Var = 125,
    // z = 44/√125 ≈ 3.935479 → increasing
    val (n1, s1, z1, v1) = got(1L)
    assert(n1 === 10L && s1 === 45L)
    assert(math.abs(z1.get.asInstanceOf[Double] - 44.0 / math.sqrt(125.0)) < 1e-6)
    assert(v1 === "increasing")
    // all-tied: variance numerator 0 → z null, no_trend
    val (_, s2, z2, v2) = got(2L)
    assert(s2 === 0L && z2.isEmpty && v2 === "no_trend")
    // n = 2 dropped
    assert(!got.contains(3L))
  }

  // ---- Similarity.hardNegatives ----

  test("hardNegatives: same-label neighbors excluded, nearest different-label wins, self excluded") {
    import graft.operators.Similarity
    // query 1 (label 0) points along +x; vec 2 is nearly parallel but
    // SAME label (must be excluded); vec 3 slightly off with label 1
    // (the true hard negative); vec 4 orthogonal label 1
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f), 0),
      (2L, Seq(0.99f, 0.1f), 0),
      (3L, Seq(0.9f, 0.3f), 1),
      (4L, Seq(0.0f, 1.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(vecs,
        vecs.filter(col("vec_id") === 1), "vec_id", "embedding", "label",
        k = 2)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getInt(3)))
    assert(got.toSeq === Seq((3L, 1), (4L, 2)))
  }
}
