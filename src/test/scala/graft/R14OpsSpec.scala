package graft

import graft.operators.Geo
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
}
