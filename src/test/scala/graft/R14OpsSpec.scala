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
