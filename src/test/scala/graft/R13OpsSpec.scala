package graft

import graft.operators.{Geo, Linkage, Quality}
import graft.pipeline.Analytics
import org.apache.spark.sql.functions._

class R13OpsSpec extends SparkSuite {
  import spark.implicits._

  // ---- Geo.radiusJoin ----

  test("radiusJoin: grid blocking equals brute force, boundary pairs kept, self-join canonicalized") {
    // deterministic scatter incl. exact-boundary and cross-cell pairs
    val pts = (1L to 60L).map(i =>
      (i, (i * 37L) % 500L, (i * 91L) % 500L)).toDF("id", "x", "y")
    val r = 40L
    val rows = pts.collect().map(p => (p.getLong(0), p.getLong(1), p.getLong(2)))
    val expected = (for {
      (ia, xa, ya) <- rows; (ib, xb, yb) <- rows
      if ia < ib
      d2 = (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)
      if d2 <= r * r
    } yield (ia, ib, d2)).sorted
    assert(expected.nonEmpty)
    // include at least one EXACT boundary pair in the fixture
    val exact = Seq((100L, 0L, 0L), (101L, 40L, 0L)).toDF("id", "x", "y")
    val onEdge = Geo.radiusJoin(exact, "id", exact, "id", "x", "y", r,
        selfJoin = true)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(onEdge.toSeq === Seq((100L, 101L, 1600L)))
    val got = Geo.radiusJoin(pts, "id", pts, "id", "x", "y", r,
        selfJoin = true)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
      .toSeq.sorted
    assert(got === expected) // multiset compare: no grid duplicates
  }

  test("radiusJoin two-table mode: every qualifying (left, right) combination, no canonicalization") {
    val stores = Seq((1L, 100L, 100L), (2L, 900L, 900L)).toDF("id", "x", "y")
    val custs = Seq((10L, 110L, 100L), (11L, 905L, 895L),
      (12L, 500L, 500L)).toDF("id", "x", "y")
    val got = Geo.radiusJoin(stores, "id", custs, "id", "x", "y", 50L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 10L), (2L, 11L)))
  }

  // ---- Quality.robustMean ----

  test("robustMean: hand-computed trim and winsorize on a key with one whale; tiny keys keep everything") {
    // key a: values 1..19 plus a 1000 whale (n=20, cut=1):
    //   mean = (190 + 1000)/20 = 59.5
    //   trimmed drops 1 and 1000 -> (190 - 1)/18 = 10.5
    //   winsorized clamps to 2 and 19 -> (189 + 2 + 19)/20 = 10.5
    // key b: 3 rows (cut = 0): all three estimates = mean
    val df = ((1 to 19).map(i => ("a", i.toLong, i.toDouble)) ++
      Seq(("a", 99L, 1000.0)) ++
      Seq(("b", 1L, 4.0), ("b", 2L, 8.0), ("b", 3L, 9.0)))
      .toDF("k", "id", "v")
    val out = Quality.robustMean(df, "k", "v", "id", trimFrac = 0.05)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(out("a") === ((20L, 59.5, 10.5, 10.5)))
    assert(out("b") === ((3L, 7.0, 7.0, 7.0)))
  }

  // ---- Analytics.rollingMedian ----

  test("rollingMedian: hand-computed window walk with even/odd frames and pinned ties") {
    def ts(i: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:00:$i%02d")
    // one user, values 5, 1, 1, 9, 3 at seconds 1..5, window 3:
    //   frames: [5]=5, [5,1]=3, [5,1,1]=1, [1,1,9]=1, [1,9,3]=3
    val df = Seq((7L, 1L, ts(1), 5.0), (7L, 2L, ts(2), 1.0),
      (7L, 3L, ts(3), 1.0), (7L, 4L, ts(4), 9.0), (7L, 5L, ts(5), 3.0))
      .toDF("user_id", "event_id", "ts", "value")
    val out = Analytics.rollingMedian(df, "user_id", "ts", "event_id",
        "value", window = 3)
      .orderBy(col("event_id"))
      .collect().map(_.getDouble(4)).toSeq
    assert(out === Seq(5.0, 3.0, 1.0, 1.0, 3.0))
    // equal timestamps: the event_id tie-break pins frame contents —
    // values 10, 20 at the SAME ts walk as [10], [10, 20]
    val tie = Seq((1L, 1L, ts(1), 10.0), (1L, 2L, ts(1), 20.0))
      .toDF("user_id", "event_id", "ts", "value")
    val tOut = Analytics.rollingMedian(tie, "user_id", "ts", "event_id",
        "value", window = 7)
      .orderBy(col("event_id"))
      .collect().map(_.getDouble(4)).toSeq
    assert(tOut === Seq(10.0, 15.0))
  }

  // ---- Quality.iqrOutliers ----

  test("iqrOutliers: hand-computed fences, whale flagged, boundary value not flagged, per-key isolation") {
    // key a: values 1..11 plus a 100 whale (n=12):
    //   sorted positions p25 = 1+0.25*11 = 3.75 -> q1 = 3.75
    //   p75 = 1+0.75*11 = 9.25 -> q3 = 9.25; iqr = 5.5
    //   fences = [3.75-8.25, 9.25+8.25] = [-4.5, 17.5] -> only 100 out
    // key b: constant values -> iqr 0, fences = value, nothing out
    val df = ((1 to 11).map(i => ("a", i.toLong, i.toDouble)) ++
      Seq(("a", 99L, 100.0)) ++
      (1 to 5).map(i => ("b", 100L + i, 7.0))).toDF("k", "id", "v")
    val out = Quality.iqrOutliers(df, "k", "id", "v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(out.toSeq === Seq(("a", 99L, 100.0, 3.75, 9.25, -4.5, 17.5)))
    // a value EXACTLY on the fence is not an outlier (strict compare)
    val edge = (Seq(("e", 1L, 0.0), ("e", 2L, 4.0), ("e", 3L, 8.0),
      ("e", 4L, 12.0), ("e", 5L, 24.0))).toDF("k", "id", "v")
    // q1 = 4, q3 = 12, fences = [-8, 24]: 24 sits ON the fence
    assert(Quality.iqrOutliers(edge, "k", "id", "v").count() === 0L)
    Par.release()
  }

  // ---- Quality.gTest ----

  test("gTest: hand-computed 2x2, independence gives 0, zero cells contribute nothing") {
    // 2x2 with counts 30/10 | 10/30: e = 20 everywhere,
    // G = 2*(30 ln 1.5 + 10 ln 0.5 + 10 ln 0.5 + 30 ln 1.5)
    val df = (Seq.fill(30)(("x", "u")) ++ Seq.fill(10)(("x", "v")) ++
      Seq.fill(10)(("y", "u")) ++ Seq.fill(30)(("y", "v"))).toDF("a", "b")
    val r = Quality.gTest(df, "a", "b").head()
    val exp = BigDecimal(
      2 * (30 * math.log(1.5) + 10 * math.log(0.5)
        + 10 * math.log(0.5) + 30 * math.log(1.5)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getLong(0) === 80L && r.getLong(3) === 1L)
    assert(math.abs(r.getDouble(4) - exp) < 2e-6) // r6-scaled cells
    // perfectly independent table: every o = e, G = 0
    val ind = (Seq.fill(20)(("x", "u")) ++ Seq.fill(20)(("x", "v")) ++
      Seq.fill(20)(("y", "u")) ++ Seq.fill(20)(("y", "v"))).toDF("a", "b")
    assert(Quality.gTest(ind, "a", "b").head().getDouble(4) === 0.0)
    // a never-observed combination changes nothing (no grid fill)
    val sparse = (Seq.fill(5)(("x", "u")) ++ Seq.fill(5)(("y", "v")))
      .toDF("a", "b")
    assert(Quality.gTest(sparse, "a", "b").head().getLong(3) === 1L)
    Par.release()
  }

  // ---- Quality.cohensKappa ----

  test("cohensKappa: hand-computed fixture, perfect agreement 1, marginal chance 0, degenerate null") {
    // classic 2-rater fixture: diag 20+15, off-diag 5+10, N = 50
    // p_o = 0.7, p_e = (25*30 + 25*20)/2500 = 0.5, kappa = 0.4
    val df = (Seq.fill(20)(("yes", "yes")) ++ Seq.fill(5)(("yes", "no")) ++
      Seq.fill(10)(("no", "yes")) ++ Seq.fill(15)(("no", "no")))
      .toDF("a", "b")
    val r = Quality.cohensKappa(df, "a", "b").head()
    assert(r.getLong(0) === 50L)
    assert(r.getDouble(1) === 0.7 && r.getDouble(2) === 0.5)
    assert(r.getDouble(3) === 0.4)
    // perfect agreement
    val perf = Seq(("a", "a"), ("b", "b"), ("a", "a")).toDF("a", "b")
    assert(Quality.cohensKappa(perf, "a", "b").head().getDouble(3) === 1.0)
    // both sides constant: p_e = 1 -> kappa null (0/0 guarded)
    val const = Seq(("a", "a"), ("a", "a")).toDF("a", "b")
    assert(Quality.cohensKappa(const, "a", "b").head().isNullAt(3))
    // categories present on only one side still count in p_e
    val skew = Seq(("a", "b"), ("b", "a"), ("a", "a")).toDF("a", "b")
    val k = Quality.cohensKappa(skew, "a", "b").head()
    // diag 1, N 3, sum r*c = 2*2 + 1*1 = 5 -> (3-5)/(9-5) = -0.5
    assert(k.getDouble(3) === -0.5)
    Par.release()
  }

  // ---- Text.sourceDivergence ----

  test("sourceDivergence: identical source scores ~0, disjoint vocabulary scores ln 2, coverage closed form") {
    import graft.functions.Text
    // s1 and s2 have the SAME distribution (so each sits near the
    // corpus mix with s3); s3 is vocabulary-DISJOINT
    val docs = Seq(
      (1L, "s1", "alpha beta alpha beta"),
      (2L, "s2", "alpha beta alpha beta"),
      (3L, "s3", "gamma delta gamma delta")
    ).toDF("doc_id", "source", "text")
    val out = Text.sourceDivergence(docs, "source", "text")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(out.keySet === Set("s1", "s2", "s3"))
    assert(out("s1") === out("s2"))
    // a fully disjoint source: JSD = ln 2 exactly (both sums collapse
    // to the absent-mass closed form on each side)
    // s3: present terms have q = ct/N = 2/12, p = 1/2;
    // identical-distribution check: the two clone sources agree
    assert(out("s1")._2 === out("s2")._2)
    assert(out("s3")._2 > out("s1")._2) // the atypical source ranks worst
    // single-source corpus: P = Q, JSD = 0 and coverage term vanishes
    val solo = Seq((1L, "only", "x y z x")).toDF("doc_id", "source", "text")
    val s = Text.sourceDivergence(solo, "source", "text").head()
    assert(s.getDouble(2) === 0.0)
    // two disjoint-vocabulary 50/50 sources vs their corpus MIXTURE:
    // per source, present terms have p = 1/2, q = 1/4, m = 3/8 and
    // coverage = 1/2, so JSD = 0.5·ln(4/3) + 0.25·ln(2/3) + 0.25·ln 2
    // = 1.5·ln 2 − 0.75·ln 3 ≈ 0.215762 (NOT ln 2 — that is the
    // source-vs-source bound; this operator scores source-vs-corpus)
    val dis = Seq((1L, "a", "p q"), (2L, "b", "r s")).toDF("doc_id", "source", "text")
    val dv = Text.sourceDivergence(dis, "source", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(dv("a") === dv("b"))
    val exp = 1.5 * math.log(2.0) - 0.75 * math.log(3.0)
    assert(math.abs(dv("a") - exp) < 3e-6)
    Par.release()
  }

  // ---- Text.heapsFit ----

  test("heapsFit: all-new-terms corpus fits beta=1 exactly; template corpus saturates to ~0") {
    import graft.functions.Text
    // every doc contributes 4 brand-new types and 4 tokens:
    // V(c) = N(c) at every checkpoint -> ln V = ln N, slope 1, r2 1
    val fresh = (1L to 16L).map(i =>
      (i, s"w${i}a w${i}b w${i}c w${i}d")).toDF("doc_id", "text")
    val f = Text.heapsFit(fresh, "doc_id", "text", points = 8).head()
    assert(f.getDouble(1) === 1.0 && f.getDouble(3) === 1.0)
    // the SAME text everywhere: types freeze after doc 1 while
    // tokens keep growing -> beta near 0
    val tmpl = (1L to 16L).map(i => (i, "spark sort join group"))
      .toDF("doc_id", "text")
    val t = Text.heapsFit(tmpl, "doc_id", "text", points = 8).head()
    assert(math.abs(t.getDouble(1)) < 0.05)
    // duplicate/zero checkpoints are deduped and guarded (2 docs,
    // 8 requested points -> few distinct checkpoints, no ln(0))
    val tiny = Seq((1L, "a b"), (2L, "c d")).toDF("doc_id", "text")
    assert(Text.heapsFit(tiny, "doc_id", "text", points = 8)
      .head().getLong(0) >= 2L)
    Par.release()
  }

  // ---- Linkage.fellegiSunter ----

  test("fellegiSunter: hand-computed integer weights, three decision bands, nulls disagree") {
    import Linkage.FsComparator._
    val recs = Seq(
      (1L, "B", "acme corp", "AUTO", Some(100.00)),
      (2L, "B", "acme corp.", "AUTO", Some(105.00)),  // all three agree
      (3L, "B", "zenith ltd", "AUTO", Some(500.00)),  // segment only
      (4L, "B", "acme corpse", "HOME", Option.empty[Double]), // name only (null bal)
      (5L, "C", "acme corp", "AUTO", Some(100.00))    // other block
    ).toDF("id", "blk", "name", "seg", "bal")
    val attrs = Seq[(Linkage.FsComparator, Double, Double)](
      (Edit("name", 2), 0.9, 0.001),
      (Exact("seg"), 0.95, 0.2),
      (Tolerance("bal", BigDecimal("10.00")), 0.8, 0.01))
    def w(m: Double, u: Double) =
      (math.round(math.log(m / u) * 1e6),
        math.round(math.log((1 - m) / (1 - u)) * 1e6))
    val (nA, nD) = w(0.9, 0.001); val (sA, sD) = w(0.95, 0.2)
    val (bA, bD) = w(0.8, 0.01)
    val out = Linkage.fellegiSunter(recs, "id", col("blk"), attrs,
        upper = 5.0, lower = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getInt(2), r.getDouble(3), r.getString(4)))).toMap
    // block C's singleton pairs with nothing; block B yields 3 pairs
    assert(out.keySet === Set((1L, 2L), (1L, 3L), (1L, 4L),
      (2L, 3L), (2L, 4L), (3L, 4L)))
    def sc(parts: Long*) = parts.sum.toDouble / 1e6
    // (1,2): lev 1, seg =, |100-105| <= 10 -> all agree -> link
    assert(out((1L, 2L)) === ((3, sc(nA, sA, bA), "link")))
    // (1,3): name far, seg =, |100-500| > 10 -> possible-or-lower
    val s13 = sc(nD, sA, bD)
    assert(out((1L, 3L)) === ((1, s13, if (s13 >= 5.0) "link"
      else if (s13 <= 0.0) "non_link" else "possible")))
    assert(out((1L, 3L))._3 === "non_link") // nD + bD dominate
    // (1,4): lev("acme corp","acme corpse") = 2 agrees; seg differs;
    // NULL balance disagrees deterministically
    assert(out((1L, 4L)) === ((1, sc(nA, sD, bD), "possible")))
    Par.release()
  }

  test("fellegiSunterIncremental ≡ full restricted to batch-touching pairs") {
    import Linkage.FsComparator._
    val recs = (1L to 40L).map { i =>
      (i, s"B${i % 3}", s"name${"x" * (i % 4).toInt}",
        if (i % 5 == 0) "AUTO" else "HOME", Some(100.0 + (i % 7)))
    }.toDF("id", "blk", "name", "seg", "bal")
    val attrs = Seq[(Linkage.FsComparator, Double, Double)](
      (Edit("name", 2), 0.9, 0.001),
      (Exact("seg"), 0.95, 0.2),
      (Tolerance("bal", BigDecimal("3.00")), 0.8, 0.01))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getDouble(3), r.getString(4))).toSeq.sorted
    val full = rows(Linkage.fellegiSunter(recs, "id", col("blk"),
      attrs, 5.0, 0.0))
    val stored = recs.filter(col("id") % 2 === 0)
    val batch = recs.filter(col("id") % 2 =!= 0)
    val incr = rows(Linkage.fellegiSunterIncremental(stored, batch,
      "id", col("blk"), attrs, 5.0, 0.0))
    val restricted = full.filter(p => p._1 % 2 == 1 || p._2 % 2 == 1)
    assert(incr === restricted)
    assert(incr.nonEmpty && incr.size < full.size)
    Par.release()
  }
}
