package graft

import graft.functions.Bpe
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSuite {
  import spark.implicits._

  private def mergeOne(syms: Seq[String], l: String, r: String): Seq[String] =
    Seq(syms).toDF("s")
      .select(Bpe.applyMerge(col("s"), l, r).as("v"))
      .collect()(0).getSeq[String](0)

  test("applyMerge: greedy left-to-right, no re-merge of the new symbol") {
    assert(mergeOne(Seq("a", "a", "a"), "a", "a") === Seq("aa", "a"))
    assert(mergeOne(Seq("a", "a", "a", "a"), "a", "a") === Seq("aa", "aa"))
    assert(mergeOne(Seq("l", "o", "w"), "l", "o") === Seq("lo", "w"))
    assert(mergeOne(Seq("x", "y"), "a", "b") === Seq("x", "y"))
    assert(mergeOne(Seq("a"), "a", "a") === Seq("a"))
  }

  test("learnMerges reproduces the hand-computed Sennrich-style example") {
    // corpus word types: low×5, lowest×2, newer×6, wider×3
    val docs = Seq(
      (1, (Seq.fill(5)("low") ++ Seq.fill(2)("lowest")).mkString(" ")),
      (2, (Seq.fill(6)("newer") ++ Seq.fill(3)("wider")).mkString(" "))
    ).toDF("doc_id", "text")
    val merges = Bpe.learnMerges(docs, "doc_id", "text", numMerges = 4)
      .orderBy("merge_no")
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // hand-computed: (e,r)=9 beats (r,</w>)=9 on the pair tie-break;
    // then (er,</w>)=9; then (l,o)=7 beats (o,w)=7; then (lo,w)=7
    assert(merges.toSeq === Seq(
      (1, "e", "r", 9L),
      (2, "er", "</w>", 9L),
      (3, "l", "o", 7L),
      (4, "lo", "w", 7L)))
  }

  test("learnMerges stops early when the best pair is below minCount") {
    val docs = Seq((1, "ab cd")).toDF("doc_id", "text")
    // every adjacent pair occurs exactly once → no merge at minCount=2
    val merges = Bpe.learnMerges(docs, "doc_id", "text", numMerges = 10)
    assert(merges.count() === 0)
    assert(merges.columns.toSeq ===
      Seq("merge_no", "left", "right", "pair_count"))
  }

  test("learnMerges is deterministic under repartitioning") {
    val docs = Seq(
      (1, (Seq.fill(5)("low") ++ Seq.fill(2)("lowest")).mkString(" ")),
      (2, (Seq.fill(6)("newer") ++ Seq.fill(3)("wider")).mkString(" "))
    ).toDF("doc_id", "text")
    val a = Bpe.learnMerges(docs, "doc_id", "text", 4)
      .orderBy("merge_no").collect().toSeq
    val b = Bpe.learnMerges(docs.repartition(7), "doc_id", "text", 4)
      .orderBy("merge_no").collect().toSeq
    assert(a === b)
  }


  test("merge learning equals a from-scratch driver replay on a varied corpus") {
    // Black-box pin of the whole learning loop against an independent
    // driver-side BPE over the same normalization — full pair recount
    // + (count desc, l asc, r asc) argmax + greedy merge application
    // per round, on a corpus with repeated symbols, overlaps, and
    // ties. (r15: the loop reverted to full per-round recounts after
    // the incremental-delta attempt measured 3-4x slower; this test
    // pins OUTPUT equality regardless of the loop's internals.)
    val docs = Seq(
      (1, Seq.fill(7)("banana").mkString(" ")),
      (2, Seq.fill(4)("bandana").mkString(" ")),
      (3, Seq.fill(5)("abba").mkString(" ")),
      (4, Seq.fill(3)("aaaa").mkString(" ")),
      (5, Seq.fill(6)("nab").mkString(" "))
    ).toDF("doc_id", "text")
    val got = Bpe.learnMerges(docs, "doc_id", "text", numMerges = 10)
      .orderBy("merge_no").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    // independent replay: word-type table -> K rounds of full pair
    // recount + argmax with the (count desc, l asc, r asc) tie-break
    // + greedy left-to-right merge application
    var wordCounts: Map[Seq[String], Long] = Map(
      ("banana".split("").toSeq :+ "</w>") -> 7L,
      ("bandana".split("").toSeq :+ "</w>") -> 4L,
      ("abba".split("").toSeq :+ "</w>") -> 5L,
      ("aaaa".split("").toSeq :+ "</w>") -> 3L,
      ("nab".split("").toSeq :+ "</w>") -> 6L)
    def applyGreedy(syms: Seq[String], l: String, r: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.toSeq
    }
    val want = scala.collection.mutable.ListBuffer.empty[(Int, String, String, Long)]
    var stop = false
    (1 to 10).foreach { k =>
      if (!stop) {
        val pc = scala.collection.mutable.Map.empty[(String, String), Long]
        wordCounts.foreach { case (syms, n) =>
          syms.sliding(2).filter(_.size == 2).foreach { p =>
            pc((p(0), p(1))) = pc.getOrElse((p(0), p(1)), 0L) + n
          }
        }
        if (pc.isEmpty || pc.values.max < 2L) stop = true
        else {
          val ((l, r), n) = pc.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
          want += ((k, l, r, n))
          wordCounts = wordCounts.toSeq
            .map { case (syms, c) => (applyGreedy(syms, l, r), c) }
            .groupBy(_._1).map { case (s, xs) => (s, xs.map(_._2).sum) }
        }
      }
    }
    assert(got === want.toSeq)
  }

  test("encode applies the learned merges in order, per word") {
    val merges = Seq(("e", "r"), ("er", "</w>"), ("l", "o"), ("lo", "w"))
    val out = Seq("low newer").toDF("text")
      .select(Bpe.encode(col("text"), merges).as("v"))
      .collect()(0).getSeq[Seq[String]](0)
    assert(out === Seq(
      Seq("low", "</w>"),
      Seq("n", "e", "w", "er</w>")))
  }

  test("encodeCounts equals the per-occurrence encode fold (word-type path is a pure rewrite)") {
    // repeated words exercise the memoized-type path; multi-space and
    // trailing whitespace exercise the non-empty-word contract
    val merges = Seq(("e", "r"), ("er", "</w>"), ("l", "o"), ("lo", "w"))
    val docs = Seq(
      (1L, "low low newer  low"),
      (2L, "newer wider newer "),
      (3L, "er")
    ).toDF("doc_id", "text")
    val got = Bpe.encodeCounts(docs, "doc_id", "text", merges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq.sortBy(_._1)
    // reference: the per-occurrence fold, empty split tokens dropped
    // on the RAW word (a real word can legitimately merge down to one
    // symbol — "er" → [er</w>] — so encoded size can't stand in for
    // emptiness)
    val ref = docs
      .select(col("doc_id"),
        split(graft.functions.Text.normalize(col("text")), " ").as("ws"),
        Bpe.encode(col("text"), merges).as("t"))
      .select(col("doc_id"),
        size(filter(col("ws"), w => length(w) > 0)).cast("long").as("nw"),
        aggregate(zip_with(col("ws"), col("t"), (w, enc) =>
            when(length(w) > 0, size(enc)).otherwise(lit(0))),
          lit(0L), (acc, x) => acc + x).as("nt"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq.sortBy(_._1)
    assert(got === ref)
    // hand check: "low"→[low,</w>]=2, "newer"→[n,e,w,er</w>]=4,
    // "wider"→[w,i,d,er</w>]=4, "er"→[er</w>]... er then er</w>: 1
    assert(got === Seq((1L, 4L, 10L), (2L, 3L, 12L), (3L, 1L, 1L)))
  }
}
