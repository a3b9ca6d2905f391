package graft

import graft.operators.Dedup

class DedupSpec extends SparkSuite {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "The quick  brown fox jumps over the lazy dog"), // ws/case dup of 1
    (3L, "the quick brown fox jumps over the lazy cat"),  // near-dup of 1
    (4L, "completely different content about spark engines"),
    (5L, "completely different content about spark engines") // exact dup of 4
  ).toDF("doc_id", "text")

  test("exact dedup groups normalized-identical docs under the lowest keeper id") {
    val out = Dedup.exact(docs, "doc_id", "text").collect()
    assert(out.length === 3) // {1,2}, {3}, {4,5}
    val byKeeper = out.map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(byKeeper(1L) === 2L && byKeeper(3L) === 1L && byKeeper(4L) === 2L)
  }

  test("ngramJaccard finds the near-dup pair and not the unrelated one") {
    val pairs = Dedup.ngramJaccard(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((4L, 5L)))
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L))) // near-dup found
    assert(!pairs.exists(p => p._1 == 4L && p._2 != 5L))
  }

  test("minHashLsh candidates ⊇ high-jaccard pairs and scores match exact jaccard") {
    val exact = Dedup.ngramJaccard(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = Dedup.minHashLsh(docs, "doc_id", "text",
      n = 3, numHashes = 32, bands = 16, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // LSH output is verified by exact jaccard → must be a subset with equal scores
    lsh.foreach { case (pair, j) =>
      assert(exact.contains(pair) && math.abs(exact(pair) - j) < 1e-12)
    }
    // exact dups collide on every band → always found
    assert(lsh.contains((1L, 2L)) && lsh.contains((4L, 5L)))
  }

  test("simHash: identical docs at hamming 0; near-dups within budget; unrelated out") {
    val out = Dedup.simHash(docs, "doc_id", "text", n = 3, maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Number](2).longValue).toMap
    assert(out((1L, 2L)) === 0L)
    assert(out((4L, 5L)) === 0L)
    assert(!out.keySet.exists(p => Set(p._1, p._2).intersect(Set(1L, 2L, 3L)).nonEmpty
      && Set(p._1, p._2).intersect(Set(4L, 5L)).nonEmpty)) // unrelated clusters never pair
  }

  test("embeddingCosine LSH path is a subset of exhaustive with identical scores") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(0.99f, 0.1f, 0.0f, 0.0f)),  // near 1
      (3L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (4L, Array(0.0f, 0.98f, 0.15f, 0.0f)), // near 3
      (5L, Array(0.0f, 0.0f, 0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val ex = Dedup.embeddingCosine(vecs, "vec_id", "embedding",
      threshold = 0.95, exhaustive = true)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(ex.keySet === Set((1L, 2L), (3L, 4L)))
    val lsh = Dedup.embeddingCosine(vecs, "vec_id", "embedding",
      threshold = 0.95, exhaustive = false, planes = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    lsh.foreach { case (pair, c) =>
      assert(ex.contains(pair) && math.abs(ex(pair) - c) < 1e-12)
    }
  }
}
