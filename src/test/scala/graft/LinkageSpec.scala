package graft

import graft.operators.{Dedup, Linkage}
import org.apache.spark.sql.functions._

class LinkageSpec extends SparkSuite {
  import spark.implicits._

  private val recs = Seq(
    (1L, "cold widget"),   // dist 1 to 2, dist 0 to 5
    (2L, "gold widget"),
    (3L, "blue bolt"),     // own block — never compared to widgets
    (4L, "glee bolt"),     // dist 2 to 3 (b→g, u→e)
    (5L, "cold widget"),   // exact duplicate of 1
    (6L, "enormous widget") // same block, far from everything (> 2)
  ).toDF("id", "name")
  private val blk = element_at(split(col("name"), " "), -1)

  test("blockedFuzzyPairs: within-block pairs under threshold, dist 0 kept, far/cross-block dropped") {
    val out = Linkage.blockedFuzzyPairs(recs, "id", "name", blk, maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(out === Set((1L, 2L, 1), (1L, 5L, 0), (2L, 5L, 1), (3L, 4L, 2)))
    // tighter threshold trims by distance, keeps the rest
    val t1 = Linkage.blockedFuzzyPairs(recs, "id", "name", blk, maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(t1 === Set((1L, 2L, 1), (1L, 5L, 0), (2L, 5L, 1)))
  }

  test("blockedFuzzyPairs: crafted mega-block through the hot-block splitter equals the unsplit pair set") {
    // driver-side brute-force levenshtein — the independent oracle
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    // one hot block H (64 rows: exact dupes, 1-2 edits, adjacent
    // length bands, same-length adversarial cluster) + one cold block
    val rows: Seq[(Long, String, String)] =
      (1L to 64L).map { i =>
        val stem = "entity" + ("x" * (i % 5).toInt) // lengths 6..10
        val name =
          if (i % 3 == 0) stem + "q"                // +1 edit / band hop
          else if (i % 7 == 0) stem.dropRight(1) + "zz" // +2 edits
          else stem
        (i, name, "H")
      } ++ Seq((101L, "acme corp", "C"), (102L, "acme corp.", "C"),
        (103L, "zenith", "C"))
    val df = rows.toDF("id", "name", "b")
    // MULTISET comparison (sorted Seq, not Set): the r12 symmetric
    // min/max grid emitted `salts` copies of every equal-salt hot
    // pair — a Set compare could never see the multiplicity bug
    val expected = (for {
      (ia, na, ba) <- rows; (ib, nb, bb) <- rows
      if ba == bb && ia < ib
      d = lev(na, nb) if d <= 2
    } yield (ia, ib, d)).sorted
    assert(expected.nonEmpty)
    def run(maxDist: Int, thr: Long = 100000L, salts: Int = 8) =
      Linkage.blockedFuzzyPairs(df, "id", "name", col("b"),
          maxDist = maxDist, hotBlockThreshold = thr, salts = salts)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .toSeq.sorted
    val plain = run(2) // default threshold: everything on the plain path
    // threshold 10 makes H hot (64 rows) while C (3 rows) stays cold
    val split = run(2, thr = 10L, salts = 3)
    assert(plain === expected)
    assert(split === expected)
    // degenerate grids still hold: one salt, and maxDist 0 (band = len)
    assert(run(2, thr = 10L, salts = 1) === expected)
    assert(run(0, thr = 10L, salts = 3) === expected.filter(_._3 == 0))
  }

  test("blockedFuzzyPairs feeds connectedComponents: entities cluster transitively") {
    val pairs = Linkage.blockedFuzzyPairs(recs, "id", "name", blk, maxDist = 2)
      .select(col("id_a"), col("id_b"))
    val labels = Dedup.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(labels(1L) === 1L && labels(2L) === 1L && labels(5L) === 1L)
    assert(labels(3L) === 3L && labels(4L) === 3L)
    Par.release()
  }

  test("goldenRecord: per-rule survivorship with deterministic tie-breaks, nulls never survive, singleton fallback") {
    import Linkage.Survivorship._
    val full = Seq(
      (1L, "cold widget", Some("B"), 5.0, 2, 10L, Some("new")),
      (2L, "gold widgetX", Some("A"), 3.0, 9, 20L, Some("old")),
      (5L, "abcd widgetX", Some("B"), 4.0, 7, 15L, Option.empty[String]),
      (3L, "blue bolt", Some("D"), 9.9, 1, 5L, Some("solo")),
      (4L, "glee bolt!", Some("C"), 1.1, 3, 6L, Option.empty[String]),
      (6L, "enormous widget", Option.empty[String], 2.2, 4, 1L,
        Option.empty[String])
    ).toDF("id", "name", "brand", "price", "size", "ts", "status")
    val clusters = Seq((1L, 1L), (2L, 1L), (5L, 1L), (3L, 3L), (4L, 3L))
      .toDF("id", "comp")
    val rules = Seq("name" -> (Longest: Linkage.Survivorship),
      "brand" -> MostFrequent, "price" -> Min, "size" -> Max,
      "status" -> MostRecent("ts"))
    val out = Linkage.goldenRecord(full, "id", clusters, rules)
      .collect().map(r => r.getLong(0) -> r).toMap
    val c1 = out(1L)
    assert(c1.getLong(1) === 3L)
    assert(c1.getString(2) === "abcd widgetX") // 12-char tie → smallest
    assert(c1.getString(3) === "B")            // modal 2-vs-1
    assert(c1.getDouble(4) === 3.0 && c1.getInt(5) === 9)
    assert(c1.getString(6) === "old")          // max ts among non-null
    val c3 = out(3L)
    assert(c3.getString(2) === "glee bolt!" && c3.getString(3) === "C") // count tie → smallest
    assert(c3.getDouble(4) === 1.1 && c3.getInt(5) === 3)
    assert(c3.getString(6) === "solo")
    val c6 = out(6L) // unpaired record: own-id singleton cluster
    assert(c6.getLong(1) === 1L && c6.getString(2) === "enormous widget")
    assert(c6.isNullAt(3) && c6.isNullAt(6)) // all-null attrs stay null
    // minMembers=2 drops the singleton
    val multi = Linkage.goldenRecord(full, "id", clusters, rules,
      minMembers = 2).collect().map(_.getLong(0)).toSet
    assert(multi === Set(1L, 3L))
  }

  test("blocking completeness: an edit in the block token is a MISSED true pair") {
    // the er_blocking_eval contract from the crafted side: the graded
    // fixture's edits never hit the last word (PC = 1.0 there); this
    // pins that the metric's truth/blocked-truth split DOES separate
    // when the block key itself absorbs the edit
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Seq(
      (1L, "shiny red widget"),   // pair (1,2): edit in a NON-block token
      (2L, "shiny rad widget"),
      (3L, "dull green gadget"),  // pair (3,4): edit IN the block token
      (4L, "dull green gidget"),
      (5L, "totally unrelated thing")
    ).toDF("id", "s").withColumn("bk", element_at(split(col("s"), " "), -1))
    val a = rows.select(col("id").as("id_a"), col("s").as("s_a"),
      col("bk").as("bk_a"), length(col("s")).as("l_a"))
    val b = rows.select(col("id").as("id_b"), col("s").as("s_b"),
      col("bk").as("bk_b"), length(col("s")).as("l_b"))
    val t = a.withColumn("lp",
        explode(array((-2 to 2).map(o => col("l_a") + o): _*)))
      .join(b, col("lp") === col("l_b") && col("id_a") < col("id_b"))
      .filter(levenshtein(col("s_a"), col("s_b")) <= 2)
      .agg(count(lit(1)).as("n_true"),
        sum(when(col("bk_a") === col("bk_b"), 1L).otherwise(0L))
          .as("n_blocked_true"))
      .collect()(0)
    assert(t.getLong(0) === 2L, "both true pairs found by the banded truth")
    assert(t.getLong(1) === 1L, "the block-token edit must be a blocking miss")
    // and blockedFuzzyPairs itself can only see the same-block pair
    val cand = Linkage.blockedFuzzyPairs(rows, "id", "s",
      blockCol = col("bk"), maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand === Set((1L, 2L)))
    Par.release()
  }
}
