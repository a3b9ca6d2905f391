package graft

import graft.operators.{Dedup, Geo, Quality}
import org.apache.spark.sql.functions._

class R14OpsSpec extends SparkSuite {
  import spark.implicits._

  // ---- Geo.radiusJoin mega-cell pair-grid salt (r13 verdict ask #2) ----

  test("radiusJoin mega-cell salt: salted path equals plain path equals brute force (multiset)") {
    // one dense mega-cell (80 points inside a single radius-sized
    // cell) plus a sparse scatter crossing cell boundaries — the
    // urban-density shape the salt exists for
    val r = 100L
    val dense = (1L to 80L).map(i => (i, 10L + (i * 7L) % 90L, 10L + (i * 13L) % 90L))
    val sparse = (200L to 240L).map(i => (i, (i * 137L) % 1000L, (i * 241L) % 1000L))
    val pts = (dense ++ sparse).toDF("id", "x", "y")
    val rows = pts.collect().map(p => (p.getLong(0), p.getLong(1), p.getLong(2)))
    val brute = (for {
      (ia, xa, ya) <- rows; (ib, xb, yb) <- rows
      if ia < ib
      d2 = (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)
      if d2 <= r * r
    } yield (ia, ib, d2)).sorted.toSeq
    assert(brute.size > 100) // the mega-cell really is quadratic-dense
    def run(thresh: Long, salts: Int) =
      Geo.radiusJoin(pts, "id", pts, "id", "x", "y", r, selfJoin = true,
          hotCellThreshold = thresh, salts = salts)
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
        .toSeq.sorted
    val plain = run(thresh = 1000000L, salts = 8)  // salt never engages
    val salted = run(thresh = 10L, salts = 4)      // mega-cell splits 4x4
    val salted1 = run(thresh = 10L, salts = 1)     // degenerate grid
    assert(plain === brute)
    assert(salted === brute)  // salts distribute, never change the multiset
    assert(salted1 === brute)
  }

  test("radiusJoin mega-cell salt: two-table mode hot path keeps every (left, right) combination exactly once") {
    val r = 50L
    // all 60 stores and 70 customers inside ONE cell -> hot on both
    // sides; plus a far pair that only the 3x3 neighborhood catches
    val stores = ((1L to 60L).map(i => (i, (i * 3L) % 45L, (i * 5L) % 45L)) :+
      (99L, 500L, 500L)).toDF("id", "x", "y")
    val custs = ((101L to 170L).map(i => (i, (i * 7L) % 45L, (i * 11L) % 45L)) :+
      (199L, 451L, 500L)).toDF("id", "x", "y")
    val ss = stores.collect().map(p => (p.getLong(0), p.getLong(1), p.getLong(2)))
    val cs = custs.collect().map(p => (p.getLong(0), p.getLong(1), p.getLong(2)))
    val brute = (for {
      (ia, xa, ya) <- ss; (ib, xb, yb) <- cs
      d2 = (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)
      if d2 <= r * r
    } yield (ia, ib, d2)).sorted.toSeq
    val got = Geo.radiusJoin(stores, "id", custs, "id", "x", "y", r,
        hotCellThreshold = 20L, salts = 3)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
      .toSeq.sorted
    assert(got === brute)
    assert(got.contains((99L, 199L, 2401L))) // cross-cell boundary pair survives the salt
  }

  // ---- Dedup.crossSourceOverlap ----

  test("crossSourceOverlap: shared runs count once per source pair, overlap is containment-style") {
    // sources: a and b share one long run (>= k+w-1 = 8 words); c is disjoint.
    // mirror source m duplicates a's doc exactly -> overlap(a, m) = 1.0
    val run = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, s"$run lambda mu nu", "a"),
      (2L, s"prefix words here $run", "b"),
      (3L, "totally different content with nothing shared at all here", "c"),
      (4L, s"$run lambda mu nu", "m")
    ).toDF("doc_id", "text", "source")
    val out = Dedup.crossSourceOverlap(docs, "doc_id", "text", "source")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(5))).toMap
    // winnowing guarantee: a shared >=8-word run yields >=1 common fingerprint
    assert(out.contains(("a", "b")) && out(("a", "b"))._1 >= 1)
    // identical docs -> identical fingerprint sets -> overlap 1.0
    assert(out(("a", "m"))._2 === 1.0)
    assert(out(("b", "m"))._1 === out(("a", "b"))._1) // m mirrors a exactly
    // disjoint source never pairs
    assert(!out.keys.exists { case (x, y) => x == "c" || y == "c" })
    // canonical ordering: src_a < src_b always
    assert(out.keys.forall { case (x, y) => x < y })
  }

  test("crossSourceOverlapIncremental: stored-set fold equals the full recompute") {
    val run = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, s"$run lambda mu nu", "a"),
      (2L, s"prefix words here $run", "b"),
      (3L, s"$run lambda mu nu", "m"),
      (4L, s"another shared tail $run", "b"),
      (5L, "fresh disjoint content that matches nothing else at all", "a")
    ).toDF("doc_id", "text", "source")
    val full = Dedup.crossSourceOverlap(docs, "doc_id", "text", "source")
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val stored = Dedup.sourceFingerprintFrame(
      docs.filter(col("doc_id") <= 3), "doc_id", "text", "source")
    val inc = Dedup.crossSourceOverlapIncremental(stored,
        docs.filter(col("doc_id") > 3), "doc_id", "text", "source")
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    assert(inc === full)
    Par.release()
  }

  // ---- Quality.embeddingHealth ----

  test("embeddingHealth: nulls, ragged dims, NaN/Inf, zero vectors, and exact norm stats") {
    val rows: Seq[(Long, Option[Seq[Float]])] = Seq(
      (0L, Some(Seq(3f, 4f))),                     // norm 5
      (0L, Some(Seq(0f, 0f))),                     // zero vector
      (0L, Some(Seq(Float.NaN, 1f))),              // non-finite
      (0L, None),                                  // null
      (1L, Some(Seq(1f, 0f, 0f))),                 // dim 3, norm 1
      (1L, Some(Seq(Float.PositiveInfinity, 0f, 0f))) // non-finite
    )
    val df = rows.toDF("label", "embedding")
    val out = Quality.embeddingHealth(df, "label", "embedding")
      .orderBy(col("label")).collect()
    val g0 = out(0)
    assert(g0.getLong(1) === 4L)      // n_vecs
    assert(g0.getLong(2) === 1L)      // n_null
    assert(g0.getLong(3) === 2L && g0.getLong(4) === 2L) // dims
    assert(g0.getLong(5) === 1L)      // n_nonfinite
    assert(g0.getLong(6) === 1L)      // n_zero
    assert(g0.getDouble(7) === 0.0)   // norm_min (the zero vector)
    assert(g0.getDouble(8) === 5.0)   // norm_max
    assert(g0.getDouble(9) === 2.5)   // norm_avg over the 2 finite vecs
    val g1 = out(1)
    assert(g1.getLong(3) === 3L && g1.getLong(5) === 1L)
    assert(g1.getDouble(9) === 1.0)   // only the unit vector has a norm
  }

  // ---- Text.stripHtml ----

  test("stripHtml: blocks drop with content, tags become spaces, entities decode in safe order") {
    val cases = Seq(
      ("<p>a</p><p>b</p>", "a b"),                       // tags must not glue words
      ("<script>var a = '<p>x</p>';</script>keep", "keep"), // script content (with tags!) gone
      ("<style>p{}</style><STYLE>x</STYLE>ok", "ok"),    // case-insensitive
      ("<!-- <b>c</b> -->d", "d"),                       // comments with tags inside
      ("a &amp;lt; b", "a &lt; b"),                      // &amp; decodes LAST -> literal "&lt;"
      ("x&nbsp;y &quot;z&quot; &#39;w&#39;", "x y \"z\" 'w'"),
      ("  a \n\t b  ", "a b"))                           // whitespace collapse + trim
    cases.foreach { case (in, want) =>
      val got = Seq(in).toDF("h")
        .select(graft.functions.Text.stripHtml(col("h")))
        .collect()(0).getString(0)
      assert(got === want, s"input: $in")
    }
  }

  test("stripHtml round-trips an escaped body through the synthesis wrapper") {
    val body = "5 < 6 & \"seven\" > 4"
    val df = Seq(body).toDF("text")
    val esc = graft.functions.Text.htmlEscape(col("text"))
    val html = concat(lit("<html><body><p>"), esc, lit("</p></body></html>"))
    val got = df.select(graft.functions.Text.stripHtml(html))
      .collect()(0).getString(0)
    assert(got === body)
  }

  // ---- Text.mojibakeScan ----

  test("mojibakeScan: the shared damage sample counts its six smears; clean ASCII counts zero") {
    val n = Seq(graft.functions.Text.MojibakeSample).toDF("t")
      .select(graft.functions.Text.mojibakeScan(col("t")))
      .collect()(0).getLong(0)
    assert(n === 6L)
    val clean = Seq("plain ascii text, no damage at all.").toDF("t")
      .select(graft.functions.Text.mojibakeScan(col("t")))
      .collect()(0).getLong(0)
    assert(clean === 0L)
  }

  // ---- Text.langMix ----

  test("langMix: split-language doc flags mixed, monolingual doc does not, no-hit doc is null-ratio") {
    val docs = Seq(
      (1L, "the cat and the dog for the win"),          // en-only
      (2L, "the cat und der hund und die for to"),      // en + de interleaved
      (3L, "zzz qqq xxx")                               // no stopwords at all
    ).toDF("doc_id", "text")
    val out = graft.functions.Text.langMix(docs, "doc_id", "text")
      .orderBy(col("doc_id")).collect()
    assert(out(0).getBoolean(5) === false)     // en-only: second lang far below top
    assert(out(1).getBoolean(5) === true)      // split doc flags
    assert(out(1).getLong(3) >= 2L)            // at least two languages hit
    assert(out(2).getLong(1) === 0L && out(2).isNullAt(4)) // no hits -> null ratio
    assert(out(2).getBoolean(5) === false)
  }

  // ---- Text.rrfFusion ----

  test("rrfFusion: integer RRF terms, union of rankers, deterministic rank order") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val qts = Seq("spark", "hash", "join")
    val fused = graft.functions.Text.rrfFusion(docs, "doc_id", "text", qts, k = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val bm = graft.functions.Text.bm25TopK(docs, "doc_id", "text", qts, k = 20)
      .collect().map(r => r.getLong(0) -> r.getInt(2).toLong).toMap
    val tf = graft.functions.Text.tfidfCosineTopK(docs, "doc_id", "text", qts, k = 20)
      .collect().map(r => r.getLong(1) -> r.getInt(0).toLong).toMap
    assert(fused.map(_._2).toSet === (bm.keySet ++ tf.keySet))
    fused.foreach { case (_, id, rrf6) =>
      val want = bm.get(id).map(r => 1000000L / (60 + r)).getOrElse(0L) +
        tf.get(id).map(r => 1000000L / (60 + r)).getOrElse(0L)
      assert(rrf6 === want, s"doc $id")
    }
    // ranks are 1..n in fused-score order with doc_id tie-break
    val sorted = fused.sortBy { case (rank, _, _) => rank }
    assert(sorted.map(_._1).toSeq === (1L to fused.length).toSeq)
    sorted.sliding(2).foreach { case Array((_, idA, sA), (_, idB, sB)) =>
      assert(sA > sB || (sA == sB && idA < idB))
    }
  }

  // ---- Text.tokenFertility ----

  test("tokenFertility: hand-computed words/tokens/chars per source") {
    // "hello world" -> 2 words; BPE proxy: ceil(5/4)*2 = 4 tokens; 11 chars
    // "a b!" -> 2 words; tokens: 1 + 1 + punct 1 = 3; 4 chars
    val docs = Seq((1L, "hello world", "x"), (2L, "a b!", "y"))
      .toDF("doc_id", "text", "source")
    val out = graft.functions.Text.tokenFertility(docs, "source", "text")
      .orderBy(col("source")).collect()
    assert(out(0).getString(0) === "x" && out(0).getLong(2) === 2L &&
      out(0).getLong(3) === 4L && out(0).getLong(4) === 11L &&
      out(0).getDouble(5) === 2.0 && out(0).getDouble(6) === 2.75)
    assert(out(1).getLong(3) === 3L && out(1).getDouble(5) === 1.5)
  }
}
