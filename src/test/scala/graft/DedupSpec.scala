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

  test("embeddingCosine LSH recall vs exhaustive on real embeddings (graded settings)") {
    val embs = Tables.embeddings(spark, "/root/testdata/sf0.001")
    def pairs(exhaustive: Boolean) =
      Dedup.embeddingCosine(embs, "vec_id", "embedding",
        threshold = 0.45, exhaustive = exhaustive, planes = 4, tables = 12)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ex  = pairs(exhaustive = true)
    val lsh = pairs(exhaustive = false)
    assert(ex.nonEmpty, "exhaustive baseline found no pairs — test data changed?")
    assert(lsh.subsetOf(ex)) // LSH scores are exact cosines → never false positives
    val recall = lsh.size.toDouble / ex.size
    assert(recall >= 0.5, s"LSH recall $recall < 0.5 (found ${lsh.size}/${ex.size})")
  }

  test("minHashLshIncremental equals the full run's batch-touching pairs") {
    import org.apache.spark.sql.functions.col
    val corpus = Tables.documents(spark, "/root/testdata/sf0.001")
    val cut = 250L
    val (ish, ibd) = Dedup.minHashIndexFrames(
      corpus.filter(col("doc_id") < cut), "doc_id", "text",
      n = 3, numHashes = 32, bands = 16)
    val inc = Dedup.minHashLshIncremental(ish, ibd,
        corpus.filter(col("doc_id") >= cut), "doc_id", "text",
        n = 3, numHashes = 32, bands = 16, threshold = 0.5,
        includeIntraBatch = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Dedup.minHashLsh(corpus, "doc_id", "text",
        n = 3, numHashes = 32, bands = 16, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // same hashes + same banding ⇒ the delta path reproduces exactly
    // the full run's pairs that touch the batch (id_b ≥ cut; index-
    // internal pairs are yesterday's output and correctly absent)
    assert(inc === full.filter(_._2 >= cut))
    assert(inc.nonEmpty, "test corpus produced no cross/intra pairs")
  }

  test("simHashIncremental equals the full run's batch-touching pairs") {
    import org.apache.spark.sql.functions.col
    val corpus = Tables.documents(spark, "/root/testdata/sf0.001")
    val cut = 250L
    val idx = Dedup.simHashIndexFrame(corpus.filter(col("doc_id") < cut),
      "doc_id", "text", n = 3, maxHamming = 3)
    val inc = Dedup.simHashIncremental(idx,
        corpus.filter(col("doc_id") >= cut), "doc_id", "text",
        n = 3, maxHamming = 3, includeIntraBatch = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Dedup.simHash(corpus, "doc_id", "text", n = 3, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inc === full.filter(_._2 >= cut))
    assert(inc.nonEmpty, "test corpus produced no cross/intra pairs")
  }

  test("ngramJaccardIncremental: merged-df cap, crossing grams, new orphans ≡ full run") {
    // cap 3: content grams end at merged df 3 (still scored); the
    // boilerplate grams sit at df 1 in the index and CROSS to 4 when
    // three more boilerplate docs arrive — index doc 3 must become a
    // new orphan and be rescued against the batch's orphans
    val idx = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "please subscribe now today")).toDF("doc_id", "text")
    val bat = Seq(
      (15L, "alpha beta gamma delta epsilon zeta"),
      (13L, "please subscribe now today"),
      (14L, "please subscribe now today"),
      (16L, "please subscribe now today")).toDF("doc_id", "text")
    val frames = Dedup.ngramIndexFrames(idx, "doc_id", "text", n = 3, maxDocFreq = 3)
    val inc = Dedup.ngramJaccardIncremental(frames, bat, "doc_id", "text",
        n = 3, threshold = 0.5, maxDocFreq = 3, includeIntraBatch = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Dedup.ngramJaccard(idx.unionByName(bat), "doc_id", "text",
        n = 3, threshold = 0.5, maxDocFreq = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batchIds = Set(13L, 14L, 15L, 16L)
    assert(inc === full.filter(p => batchIds(p._1) || batchIds(p._2)))
    assert(inc.contains((3L, 13L)) && inc.contains((13L, 14L)),
      "crossing-gram orphans must be rescued")
    assert(inc.contains((1L, 15L)) && !inc.contains((1L, 2L)))
  }

  test("ngramJaccardIncremental equals the full run's batch-touching pairs (real corpus)") {
    import org.apache.spark.sql.functions.col
    val corpus = Tables.documents(spark, "/root/testdata/sf0.001")
    val cut = 250L
    val frames = Dedup.ngramIndexFrames(corpus.filter(col("doc_id") < cut),
      "doc_id", "text", n = 3, maxDocFreq = 1000)
    val inc = Dedup.ngramJaccardIncremental(frames,
        corpus.filter(col("doc_id") >= cut), "doc_id", "text",
        n = 3, threshold = 0.5, maxDocFreq = 1000, includeIntraBatch = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Dedup.ngramJaccard(corpus, "doc_id", "text",
        n = 3, threshold = 0.5, maxDocFreq = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inc === full.filter(_._2 >= cut))
    assert(inc.nonEmpty)
  }

  test("connectedComponents: empty pair set → empty labels; quiet delta passes through") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponents(empty).isEmpty)
    val labels = Dedup.connectedComponents(Seq((1L, 2L)).toDF("id_a", "id_b"))
    val out = Dedup.connectedComponentsIncremental(labels, empty)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L))
  }

  test("connectedComponentsIncremental equals full replay; bridges merge old clusters") {
    val day1 = Seq((1L, 5L), (5L, 9L), (20L, 21L)).toDF("id_a", "id_b")
    val labels1 = Dedup.connectedComponents(day1)
    // day 2 bridges the two old components and starts a new one
    val day2 = Seq((9L, 20L), (30L, 31L), (31L, 32L)).toDF("id_a", "id_b")
    val inc = Dedup.connectedComponentsIncremental(labels1, day2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = Dedup.connectedComponents(day1.unionByName(day2))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc === full)
    assert(inc(21L) === 1L, "bridged component must take the global min label")
    assert(inc(32L) === 30L)
    // a quiet old component keeps its labeling untouched
    val quiet = Dedup.connectedComponentsIncremental(labels1,
        Seq((30L, 31L)).toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(quiet(5L) === 1L && quiet(9L) === 1L && quiet(21L) === 20L)
  }

  test("embeddingCosineIncremental equals the full LSH run's batch-touching pairs") {
    import org.apache.spark.sql.functions.col
    val embs = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cut = 250L
    val (ivecs, ikeys) = Dedup.embeddingIndexFrames(
      embs.filter(col("vec_id") < cut), "vec_id", "embedding",
      planes = 4, tables = 12)
    val inc = Dedup.embeddingCosineIncremental(ivecs, ikeys,
        embs.filter(col("vec_id") >= cut), "vec_id", "embedding",
        threshold = 0.45, planes = 4, tables = 12, includeIntraBatch = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Dedup.embeddingCosine(embs, "vec_id", "embedding",
        threshold = 0.45, exhaustive = false, planes = 4, tables = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inc === full.filter(_._2 >= cut))
    assert(inc.nonEmpty, "test embeddings produced no cross/intra pairs")
  }

  test("exactIncremental: bucketed keeper index keeps the index side exchange-free") {
    // the 100 TB contract: the corpus-sized index must never shuffle
    // for a daily delta — bucketed storage satisfies the anti-join's
    // distribution, leaving ONLY the delta-side exchange
    val conf = spark.conf
    val prevB = conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevA = conf.get("spark.sql.adaptive.enabled")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the SMJ shape
    conf.set("spark.sql.adaptive.enabled", "false")        // plan tree inspectable
    try {
      // the in-memory catalog forgets tables across JVMs but their
      // warehouse dirs survive → clear or CTAS refuses the location
      spark.sql("DROP TABLE IF EXISTS keeper_idx_b")
      val whDir = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
        "keeper_idx_b")
      if (whDir.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(whDir)
      }
      val docs = (1L to 500L).map(i => (i, s"content item ${i % 300}"))
        .toDF("doc_id", "text")
      graft.sources.Sink.bucketedTable(Dedup.exact(docs, "doc_id", "text"),
        "keeper_idx_b", "content_hash", 8)
      val batch = (501L to 800L).map(i => (i, s"content item ${i % 450}"))
        .toDF("doc_id", "text")
      val bucketed = Dedup.exactIncremental(spark.table("keeper_idx_b"),
        batch, "doc_id", "text")
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
      val shuffles = bucketed.queryExecution.executedPlan.collect {
        case s: ShuffleExchangeLike => s
      }
      assert(shuffles.size === 1,
        s"expected ONLY the delta-side exchange, got ${shuffles.size}:\n" +
          bucketed.queryExecution.executedPlan)
      // identical answer to the plain-index path
      val plain = Dedup.exactIncremental(Dedup.exact(docs, "doc_id", "text"),
        batch, "doc_id", "text")
      assert(bucketed.orderBy("content_hash").collect().toSeq ===
        plain.orderBy("content_hash").collect().toSeq)
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      conf.set("spark.sql.adaptive.enabled", prevA)
    }
  }

  test("ngramJaccard df-cap drops boilerplate-only pairs, keeps content dups") {
    val capDocs = Seq(
      // 1,2: identical real content + the boilerplate tail
      (1L, "alpha beta gamma delta epsilon please subscribe to our newsletter"),
      (2L, "alpha beta gamma delta epsilon please subscribe to our newsletter"),
      // 3,4: unrelated content, overlap ONLY via the boilerplate tail
      (3L, "one two three four five six please subscribe to our newsletter"),
      (4L, "seven eight nine ten eleven twelve please subscribe to our newsletter")
    ).toDF("doc_id", "text")
    // threshold low enough that boilerplate-only overlap passes uncapped
    val uncapped = Dedup.ngramJaccard(capDocs, "doc_id", "text", n = 3,
      threshold = 0.05, maxDocFreq = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.contains((3L, 4L))) // boilerplate alone pairs them
    assert(uncapped.contains((1L, 2L)))
    // "please subscribe to", "subscribe to our", "to our newsletter"
    // have df=4 > cap=3 → out of the vocabulary: the boilerplate-only
    // pair disappears; the true dup keeps jaccard 1.0 over what's left
    val capped = Dedup.ngramJaccard(capDocs, "doc_id", "text", n = 3,
      threshold = 0.05, maxDocFreq = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(!capped.contains((3L, 4L)))
    assert(capped((1L, 2L)) === 1.0)
  }

  test("prefix-filtered candidates lose NO qualifying pair vs the naive all-grams join") {
    // random docs over a tiny vocabulary → heavy shingle sharing, so
    // the prefix filter actually prunes; the naive share-any-gram
    // reference must agree exactly (prefix-filter completeness is the
    // trickiest proof in the codebase — pin it empirically)
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    val randomDocs = (1L to 60L).map { i =>
      val len = 5 + rnd.nextInt(12)
      (i, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val threshold = 0.4
    val fast = Dedup.ngramJaccard(randomDocs, "doc_id", "text",
        n = 3, threshold = threshold)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // naive reference: every pair sharing >= 1 shingle, exact Jaccard
    import org.apache.spark.sql.functions._
    val sh = randomDocs.select(col("doc_id").as("id"),
      graft.functions.Text.shingles(col("text"), 3).as("sh"))
    val ex = sh.select(col("id"), explode(col("sh")).as("g"))
    val naive = ex.select(col("id").as("id_a"), col("g"))
      .join(ex.select(col("id").as("id_b"), col("g")), Seq("g"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(naive.nonEmpty, "test premise: random docs should produce pairs")
    assert(fast.keySet === naive.keySet,
      s"missing=${naive.keySet -- fast.keySet} extra=${fast.keySet -- naive.keySet}")
    fast.foreach { case (p, j) => assert(math.abs(j - naive(p)) < 1e-12) }
  }

  test("contamination flags eval docs overlapping train, reports the worst offender") {
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog every single day"),
      (3L, "completely unrelated training material here")).toDF("doc_id", "text")
    val eval_ = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"), // contaminated, worst=2 on ties? (doc 2 shares 7, doc 1 shares 7)
      (101L, "totally novel evaluation prompt nothing shared")).toDF("doc_id", "text")
    val out = Dedup.contamination(train, eval_, "doc_id", "text",
        n = 3, minCommon = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.keySet === Set(100L)) // only the overlapping eval doc
    // doc 100 shares all 7 of its shingles with BOTH 1 and 2 →
    // deterministic tie-break to the higher train id
    assert(out(100L) === (2L, 7L))
  }

  test("contaminationBatch: fixed eval index flags batch docs with the worst offender") {
    val eval_ = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "totally novel evaluation prompt nothing shared")).toDF("doc_id", "text")
    val batch = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog every single day"),
      (3L, "completely unrelated training material here")).toDF("doc_id", "text")
    val idx = Dedup.evalGramIndex(eval_, "doc_id", "text", n = 3)
    val out = Dedup.contaminationBatch(idx, batch, "doc_id", "text",
        n = 3, minCommon = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // docs 1 and 2 each share eval 100's 7 trigrams (doc 2 via its
    // 9-word prefix); doc 3 and eval 101 contribute nothing
    assert(out.keySet === Set(1L, 2L))
    assert(out(1L) === ((100L, 7L)))
    assert(out(2L) === ((100L, 7L)))
  }

  test("df-cap orphans (ALL shingles hot) still pair when bit-identical") {
    // every shingle of every doc has df=4 > cap=3, so all four docs
    // drop out of the capped vocabulary — the whole-doc rescue bucket
    // must still pair the identical ones at jaccard 1.0, and must NOT
    // pair docs whose shingle sets differ (5 has an extra sentence)
    val boiler = "please do subscribe to our newsletter"
    val docs5 = Seq(
      (1L, boiler), (2L, boiler), (3L, boiler), (4L, boiler),
      (5L, boiler + " and ring the bell"), (6L, boiler + " and ring the bell"),
      (7L, boiler + " and ring the bell"), (8L, boiler + " and ring the bell")
    ).toDF("doc_id", "text")
    val out = Dedup.ngramJaccard(docs5, "doc_id", "text", n = 3,
      threshold = 0.9, maxDocFreq = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val expected = (for {
      grp <- Seq(Seq(1L, 2L, 3L, 4L), Seq(5L, 6L, 7L, 8L))
      a <- grp; b <- grp if a < b
    } yield (a, b)).toSet
    assert(out.keySet === expected, s"got ${out.keySet}")
    assert(out.values.forall(_ === 1.0))
  }

  test("connectedComponents labels transitive clusters by their minimum id") {
    // component {1,5,3} via (1,5),(3,5): pair-drop would keep both 1
    // and 3; the component label keeps exactly one. Plus a chain
    // 10~11~12~13 (diameter 3) and an isolated pair (20,21).
    val pairs = Seq(
      (1L, 5L), (3L, 5L),
      (10L, 11L), (11L, 12L), (12L, 13L),
      (20L, 21L)).toDF("id_a", "id_b")
    val out = operators.Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(
      1L -> 1L, 3L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L,
      20L -> 20L, 21L -> 20L))
    Par.release()
  }

  test("exactIncremental admits only content unseen in the index, deduped within the batch") {
    val existing = Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("doc_id", "text")
    val index = operators.Dedup.exact(existing, "doc_id", "text")
    val batch = Seq(
      (10L, "Alpha  beta"),   // normalizes to an indexed hash → dropped
      (11L, "epsilon zeta"),  // new
      (12L, "epsilon zeta"),  // batch-internal dup of 11
      (13L, "eta theta")      // new
    ).toDF("doc_id", "text")
    val out = operators.Dedup.exactIncremental(index, batch, "doc_id", "text")
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(out === Map(11L -> 2L, 13L -> 1L))
  }

  test("rateReport: per-group doc/distinct/dup-rate over normalized content") {
    val docs = Seq(
      (1L, "alpha beta", "web"), (2L, "Alpha  BETA", "web"), // dups (normalized)
      (3L, "gamma", "web"),
      (4L, "delta", "books"), (5L, "epsilon", "books")       // no dups
    ).toDF("doc_id", "text", "source")
    val out = operators.Dedup.rateReport(docs, "text", "source")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out("web") === ((3L, 2L, 1L, 0.333333)))
    assert(out("books") === ((2L, 2L, 0L, 0.0)))
  }

  test("sharedRuns pairs docs sharing a long verbatim run; boilerplate fingerprints excluded") {
    // k=5, w=4 → any shared run of ≥ 8 words guarantees ≥1 common
    // fingerprint (the winnowing invariant); a 20-word verbatim run
    // shares several
    val run = (1 to 20).map(i => s"verbatim$i").mkString(" ")
    val filler = (1 to 25).map(i => s"boiler$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta gamma $run delta epsilon"),
      (2L, s"one two three four five six $run seven"),
      (3L, "totally unrelated content with nothing repeated here at all " +
        "more unique words beyond the window size for safety"),
      // docs 4,5 share ONLY the filler text, which docs 1-5 ALL
      // contain via doc 6/7 too — make filler appear in >maxDocFreq
      // docs so its fingerprints are dropped from pairing
      (4L, s"$filler distinct tail words for four"),
      (5L, s"$filler other ending entirely for five"),
      (6L, s"$filler yet another unique closing six"),
      (7L, s"$filler final variation of the ending seven")
    ).toDF("doc_id", "text")
    val pairs = operators.Dedup.sharedRuns(docs, "doc_id", "text",
        k = 5, w = 4, minShared = 1, maxDocFreq = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // the verbatim-run pair is found
    assert(pairs.contains((1L, 2L)), pairs.toString)
    assert(pairs((1L, 2L)) >= 1L)
    // unrelated doc pairs with nothing
    assert(!pairs.keySet.exists(p => p._1 == 3L || p._2 == 3L), pairs.toString)
    // filler appears in 4 docs > maxDocFreq=3 → its fingerprints are
    // boilerplate and generate no pairs among docs 4-7
    val fillerIds = Set(4L, 5L, 6L, 7L)
    assert(!pairs.keySet.exists(p => fillerIds(p._1) && fillerIds(p._2)),
      pairs.toString)
    Par.release()
  }

  test("sharedRuns equals brute-force fingerprint intersection on random docs") {
    // the distributed pair generation (explode → df-join → self-join →
    // count) must reproduce exactly what a driver-side pairwise
    // intersection of the SAME winnow sets computes — isolates the
    // join/agg logic from winnow itself (TextSpec pins winnow)
    val rnd = new scala.util.Random(7)
    val planted = (1 to 12).map(i => s"planted$i").mkString(" ")
    val docs = ((1 to 30).map { i =>
      val words = Seq.fill(25 + rnd.nextInt(30))("w" + rnd.nextInt(300))
      (i.toLong, words.mkString(" "))
    } ++ Seq(
      (41L, s"prefix words here $planted and a tail"),
      (42L, s"$planted with an entirely different ending zone")
    )).toDF("doc_id", "text")
    val out = operators.Dedup.sharedRuns(docs, "doc_id", "text",
        k = 5, w = 4, minShared = 1, maxDocFreq = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val fps = docs.select(org.apache.spark.sql.functions.col("doc_id"),
        graft.functions.Text.winnow(
          org.apache.spark.sql.functions.col("text"), 5, 4).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val ids = fps.keys.toSeq.sorted
    val expected = (for {
      a <- ids; b <- ids if a < b
      common = (fps(a) & fps(b)).size if common >= 1
    } yield (a, b) -> common.toLong).toMap
    assert(out === expected)
    assert(out.contains((41L, 42L))) // the planted 12-word run is found
    Par.release()
  }

  test("sharedRunsIncremental ≡ full run's batch-touching pairs, merged-df cap") {
    // the boilerplate run sits in 13 index docs (under the cap of 14
    // alone) and 2 batch docs — its fingerprints cross the cap ONLY
    // when index + batch counts MERGE, the df rule the incremental
    // form must reproduce; the planted 12-word run pairs across the
    // cut and stays under the cap
    val rnd = new scala.util.Random(11)
    val boiler = (1 to 10).map(i => s"boiler$i").mkString(" ")
    val planted = (1 to 12).map(i => s"planted$i").mkString(" ")
    val docs = ((1 to 40).map { i =>
      val words = Seq.fill(20 + rnd.nextInt(25))("w" + rnd.nextInt(200))
      val extra = if (i % 3 == 0) s" $boiler" else ""
      (i.toLong, words.mkString(" ") + extra)
    } ++ Seq(
      (41L, s"lead in $planted trailing words"),    // index side
      (46L, s"$planted with another different ending"), // batch: cross pair
      (47L, s"begin $boiler mid extra"),            // batch boiler
      (48L, s"$boiler tail piece")                  // batch boiler
    )).toDF("doc_id", "text")
    val cut = 45L
    val full = operators.Dedup.sharedRuns(docs, "doc_id", "text",
        k = 5, w = 4, minShared = 1, maxDocFreq = 14)
      .filter(org.apache.spark.sql.functions.col("id_b") >= cut)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val idx = operators.Dedup.sharedRunsIndexFrame(
      docs.filter(org.apache.spark.sql.functions.col("doc_id") < cut),
      "doc_id", "text", k = 5, w = 4)
    val inc = operators.Dedup.sharedRunsIncremental(idx,
        docs.filter(org.apache.spark.sql.functions.col("doc_id") >= cut),
        "doc_id", "text", k = 5, w = 4, minShared = 1, maxDocFreq = 14)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(inc === full)
    assert(inc.contains((41L, 46L))) // planted run pairs ACROSS the cut
    // merged-df bite: interior boiler fingerprints reach df 15 > 14
    // only with the batch counted, so boiler-only pairs must be absent
    assert(!inc.contains((47L, 48L)))
    assert(!inc.keySet.exists { case (a, b) =>
      a <= 40 && a % 3 == 0 && b >= 47L })
    Par.release()
  }

  test("connectedComponents reliable=true uses fault-tolerant checkpoints, same labels") {
    // on a real cluster localCheckpoint pins blocks to executors; the
    // reliable flag swaps in HDFS-backed checkpoint() — semantics must
    // be identical
    val prev = spark.sparkContext.getCheckpointDir
    spark.sparkContext.setCheckpointDir(tmpDir("ccckpt"))
    try {
      val pairs = Seq((1L, 5L), (3L, 5L), (10L, 11L), (11L, 12L))
        .toDF("id_a", "id_b")
      val out = operators.Dedup.connectedComponents(pairs, reliable = true)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out === Map(
        1L -> 1L, 3L -> 1L, 5L -> 1L,
        10L -> 10L, 11L -> 10L, 12L -> 10L))
    } finally prev.foreach(spark.sparkContext.setCheckpointDir)
    Par.release()
  }

  test("keepBestPerCluster: highest score survives, lowest id on ties, singletons kept") {
    val scored = Seq((1L, 3L), (5L, 7L), (9L, 7L), (7L, 1L))
      .toDF("doc_id", "n_words")
    val pairs = Seq((1L, 5L), (5L, 9L)).toDF("id_a", "id_b")
    val out = operators.Dedup.keepBestPerCluster(scored, "doc_id", pairs, "n_words")
      .collect().map(r => (r.getLong(2), r.getLong(0), r.getLong(1))).toSet
    // cluster {1,5,9} (comp 1): 5 and 9 tie at 7 words → 5 wins;
    // unclustered 7 survives as its own cluster
    assert(out === Set((1L, 5L, 7L), (7L, 7L, 1L)))
    Par.release()
  }

  test("keepBestPerClusterIncremental: merges fold algebraically, ties break low") {
    import operators.Dedup
    import org.apache.spark.sql.functions.col
    // day 0: clusters {1,5} (5 wins, 7>3) and {2,6} (2 wins on tie)
    val docs0 = Seq((1L, 3L), (5L, 7L), (2L, 4L), (6L, 4L), (8L, 9L))
      .toDF("doc_id", "n_words")
    val pairs0 = Seq((1L, 5L), (2L, 6L)).toDF("id_a", "id_b")
    val keepers0 = Dedup.keepBestPerCluster(docs0, "doc_id", pairs0, "n_words")
      .select(col("comp"), col("doc_id"), col("n_words"))
    val labels0 = Dedup.connectedComponents(pairs0)
    // day 1: doc 9 bridges the two clusters; new doc 10 ties keeper 5
    val docs1 = Seq((9L, 5L), (10L, 7L)).toDF("doc_id", "n_words")
    val pairs1 = Seq((5L, 9L), (9L, 2L), (9L, 10L)).toDF("id_a", "id_b")
    val (keepers1, labels1) = Dedup.keepBestPerClusterIncremental(
      keepers0, labels0, docs1, pairs1, "doc_id", "n_words")
    val got = keepers1.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // merged cluster {1,5,2,6,9,10} (comp 1): 5 and 10 tie at 7 → 5;
    // untouched singleton 8 carries through
    assert(got === Set((1L, 5L, 7L), (8L, 8L, 9L)))
    // equivalence with the full operator over the merged inputs
    val full = Dedup.keepBestPerCluster(docs0.unionByName(docs1), "doc_id",
        pairs0.unionByName(pairs1), "n_words")
      .select(col("comp"), col("doc_id"), col("n_words"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === full)
    // labels state matches a full replay too
    assert(labels1.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ===
      Dedup.connectedComponents(pairs0.unionByName(pairs1))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
    Par.release()
  }

  test("keepBestPerClusterIncremental equals the full run on the real corpus") {
    import org.apache.spark.sql.functions.col
    import operators.Dedup
    val corpus = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"),
        graft.functions.Text.tokenCountWs(col("text")).as("n_words"),
        col("text"))
    val cut = 250L
    val d0 = corpus.filter(col("doc_id") < cut)
    val d1 = corpus.filter(col("doc_id") >= cut)
    def pairsOf(df: org.apache.spark.sql.DataFrame) =
      Dedup.ngramJaccard(df, "doc_id", "text", n = 3, threshold = 0.5)
    val p0 = pairsOf(d0)
    // day-1 delta pairs: everything the merged graph adds over day 0
    val pAll = pairsOf(corpus)
    val p1 = pAll.exceptAll(p0.select(col("id_a"), col("id_b"),
      col("jaccard"))).select(col("id_a"), col("id_b"))
    val keepers0 = Dedup.keepBestPerCluster(
        d0.select(col("doc_id"), col("n_words")), "doc_id", p0, "n_words")
      .select(col("comp"), col("doc_id"), col("n_words"))
    val labels0 = Dedup.connectedComponents(p0)
    val (keepers1, _) = Dedup.keepBestPerClusterIncremental(
      keepers0, labels0, d1.select(col("doc_id"), col("n_words")), p1,
      "doc_id", "n_words")
    val full = Dedup.keepBestPerCluster(
        corpus.select(col("doc_id"), col("n_words")), "doc_id",
        pAll, "n_words")
      .select(col("comp"), col("doc_id"), col("n_words"))
    val a = keepers1.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = full.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a === b)
    assert(a.nonEmpty)
    Par.release()
  }

  // ---- bucketed-index no-shuffle proofs for the incremental family
  // (the 100 TB contract: a daily delta must never re-shuffle the
  // corpus-sized index frames; bucketed storage satisfies each join's
  // required distribution at the scan) ----

  /** Every scan of `table` must reach its first join with NO shuffle
    * in between — the index side re-shuffling before its probe/fetch
    * join is exactly the corpus-sized exchange the bucketing exists
    * to eliminate. (Exchanges ABOVE the join are the delta-driven
    * ones and stay legal.)
    */
  private def assertScanJoinsExchangeFree(
      plan: org.apache.spark.sql.execution.SparkPlan, table: String): Unit = {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def paths(p: SparkPlan): Seq[List[SparkPlan]] = p match {
      case f: FileSourceScanExec if f.tableIdentifier.exists(_.table == table) =>
        Seq(List(p))
      case _ => p.children.flatMap(paths).map(p :: _)
    }
    val found = paths(plan)
    assert(found.nonEmpty, s"no scan of $table in plan:\n$plan")
    found.foreach { rootToScan =>
      val ancestors = rootToScan.reverse.drop(1) // nearest-first
      val belowJoin = ancestors.takeWhile(n =>
        !n.nodeName.toLowerCase.contains("join"))
      assert(!belowJoin.exists(_.isInstanceOf[ShuffleExchangeLike]),
        s"$table re-shuffled before its join:\n" +
          rootToScan.map(_.nodeName).mkString(" -> "))
    }
  }

  private def resetTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val whDir = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), name)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    if (whDir.exists()) rm(whDir)
  }

  private def withInspectablePlans(body: => Unit): Unit = {
    val conf = spark.conf
    val prevB = conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevA = conf.get("spark.sql.adaptive.enabled")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.enabled", "false")
    try body finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      conf.set("spark.sql.adaptive.enabled", prevA)
    }
  }

  test("minHashLshIncremental: bucketed frames keep the index exchange-free") {
    withInspectablePlans {
      import org.apache.spark.sql.functions.col
      val corpus = Tables.documents(spark, "/root/testdata/sf0.001")
      val cut = 250L
      val (ish, ibanded) = Dedup.minHashIndexFrames(
        corpus.filter(col("doc_id") < cut), "doc_id", "text")
      Seq("mh_sh_b", "mh_band_b").foreach(resetTable)
      // each frame bucketed on ITS join's exact key set
      graft.sources.Sink.bucketedTableBy(ish, "mh_sh_b", Seq("id"), 8)
      graft.sources.Sink.bucketedTableBy(ibanded, "mh_band_b",
        Seq("band", "bucket"), 8)
      val batch = corpus.filter(col("doc_id") >= cut)
      val bucketed = Dedup.minHashLshIncremental(spark.table("mh_sh_b"),
        spark.table("mh_band_b"), batch, "doc_id", "text", threshold = 0.5)
      assertScanJoinsExchangeFree(bucketed.queryExecution.executedPlan, "mh_band_b")
      assertScanJoinsExchangeFree(bucketed.queryExecution.executedPlan, "mh_sh_b")
      // identical answer to the in-memory-frames path
      val plain = Dedup.minHashLshIncremental(ish, ibanded, batch,
        "doc_id", "text", threshold = 0.5)
      assert(bucketed.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
        plain.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
      Par.release()
    }
  }

  test("simHashIncremental: bucketed block frame keeps the index exchange-free") {
    withInspectablePlans {
      import org.apache.spark.sql.functions.col
      val corpus = Tables.documents(spark, "/root/testdata/sf0.001")
      val cut = 250L
      val iblocked = Dedup.simHashIndexFrame(
        corpus.filter(col("doc_id") < cut), "doc_id", "text")
      resetTable("sh_blk_b")
      graft.sources.Sink.bucketedTableBy(iblocked, "sh_blk_b",
        Seq("blk", "blkval"), 8)
      val batch = corpus.filter(col("doc_id") >= cut)
      val bucketed = Dedup.simHashIncremental(spark.table("sh_blk_b"),
        batch, "doc_id", "text", maxHamming = 3)
      assertScanJoinsExchangeFree(bucketed.queryExecution.executedPlan, "sh_blk_b")
      val plain = Dedup.simHashIncremental(iblocked, batch, "doc_id", "text",
        maxHamming = 3)
      assert(bucketed.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
        plain.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
      Par.release()
    }
  }

  test("sharedRunsIncremental: fp-bucketed index keeps its joins exchange-free") {
    withInspectablePlans {
      import org.apache.spark.sql.functions.col
      val corpus = Tables.documents(spark, "/root/testdata/sf0.001")
      val cut = 250L
      val idx = Dedup.sharedRunsIndexFrame(corpus.filter(col("doc_id") < cut),
        "doc_id", "text", k = 5, w = 4)
      resetTable("sr_fp")
      graft.sources.Sink.bucketedTableBy(idx, "sr_fp", Seq("fp"), 8)
      val batch = corpus.filter(col("doc_id") >= cut)
      val bucketed = Dedup.sharedRunsIncremental(spark.table("sr_fp"), batch,
        "doc_id", "text", k = 5, w = 4, minShared = 1, maxDocFreq = 200)
      assertScanJoinsExchangeFree(bucketed.queryExecution.executedPlan, "sr_fp")
      val plain = Dedup.sharedRunsIncremental(idx, batch,
        "doc_id", "text", k = 5, w = 4, minShared = 1, maxDocFreq = 200)
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(rows(bucketed) === rows(plain))
      Par.release()
    }
  }

  test("ngramJaccardIncremental: dual-bucketed postings keep the index exchange-free") {
    withInspectablePlans {
      import org.apache.spark.sql.functions.col
      val corpus = Tables.documents(spark, "/root/testdata/sf0.001")
      val cut = 250L
      val frames = Dedup.ngramIndexFrames(corpus.filter(col("doc_id") < cut),
        "doc_id", "text", n = 3, maxDocFreq = 1000)
      Seq("ng_occ_g", "ng_occ_id").foreach(resetTable)
      // the classic dual posting layout: one copy per access path
      graft.sources.Sink.bucketedTableBy(frames.occ, "ng_occ_g", Seq("gram"), 8)
      graft.sources.Sink.bucketedTableBy(frames.occ, "ng_occ_id", Seq("id"), 8)
      val stored = Dedup.NgramIndex(spark.table("ng_occ_g"), frames.dfs,
        frames.meta, Some(spark.table("ng_occ_id")))
      val batch = corpus.filter(col("doc_id") >= cut)
      val bucketed = Dedup.ngramJaccardIncremental(stored, batch,
        "doc_id", "text", n = 3, threshold = 0.5, maxDocFreq = 1000)
      assertScanJoinsExchangeFree(bucketed.queryExecution.executedPlan, "ng_occ_g")
      assertScanJoinsExchangeFree(bucketed.queryExecution.executedPlan, "ng_occ_id")
      val plain = Dedup.ngramJaccardIncremental(frames, batch,
        "doc_id", "text", n = 3, threshold = 0.5, maxDocFreq = 1000)
      assert(bucketed.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
        plain.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
      Par.release()
    }
  }

  test("editDistance: planted edits found, far pairs dropped, shorts handled") {
    val corpus = Seq(
      (1L, "warehouse"),
      (2L, "warehoues"),   // transposition = 2 edits from 1
      (3L, "warehouse"),   // exact dup of 1 (dist 0)
      (4L, "warhouse"),    // deletion, dist 1 from 1
      (5L, "dwarehouse"),  // insertion, dist 1 from 1
      (6L, "clickstream"), // unrelated
      (7L, "ab"),          // short (< maxDist+1 chars)
      (8L, "ac"),          // dist 1 from 7
      (9L, ""),            // empty: dist 2 from 7/8
      (10L, "abzz")        // dist 2 from 7
    ).toDF("doc_id", "text")
    val out = Dedup.editDistance(corpus, "doc_id", "text", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(out((1L, 3L)) === 0)
    assert(out((1L, 4L)) === 1 && out((1L, 5L)) === 1)
    assert(out((1L, 2L)) === 2)
    assert(out((7L, 8L)) === 1)
    assert(out((7L, 9L)) === 2 && out((8L, 9L)) === 2)
    assert(out((7L, 10L)) === 2)
    assert(!out.keySet.exists(p => p._1 == 6L || p._2 == 6L))
    Par.release()
  }

  test("editDistance ≡ brute-force levenshtein join on a mixed corpus") {
    // deterministic corpus: hex-ish strings with planted edits at
    // varied positions, plus same-length substitution chains
    val strs = (1L to 120L).map { i =>
      val b = f"${i * 2654435761L % 100000000L}%08d"
      val s = i % 5 match {
        case 0 => b.substring(1)                 // deletion
        case 1 => "x" + b                        // insertion
        case 2 => b.updated(3, 'z')              // substitution
        case 3 => b.updated(1, 'q').updated(6, 'q')
        case _ => b
      }
      (i, s)
    }
    val corpus = strs.toDF("doc_id", "text")
    for (d <- Seq(1, 2)) {
      val fast = Dedup.editDistance(corpus, "doc_id", "text", d)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
      val brute = strs.flatMap { case (ia, sa) =>
        strs.collect { case (ib, sb) if ia < ib => ((ia, ib), (sa, sb)) }
      }.map { case (p, (sa, sb)) => p -> lev(sa, sb) }
        .filter(_._2 <= d).toMap
      assert(fast === brute, s"maxDist=$d mismatch")
      Par.release()
    }
  }

  test("editDistanceIncremental ≡ full run restricted to batch-touching pairs") {
    // base strings + planted edits, split so edits cross the cut:
    // some typo'd twins land in the batch while their source is in
    // the index, plus batch-internal dup pairs and short strings
    val strs = (1L to 150L).map { i =>
      val b = f"${i * 2654435761L % 100000000L}%08d"
      val s = i % 5 match {
        case 0 => b.substring(1)
        case 1 => "x" + b
        case 2 => b.updated(3, 'z')
        case 3 => if (i % 2 == 0) "ab" else b   // shorts on both sides
        case _ => b
      }
      (i, s)
    }
    val cut = 100L
    val corpus = strs.toDF("doc_id", "text")
    val indexDocs = corpus.filter($"doc_id" < cut)
    val batch = corpus.filter($"doc_id" >= cut)
    for (d <- Seq(1, 2)) {
      val idx = Dedup.editIndexFrames(indexDocs, "doc_id", "text", d)
      val incr = Dedup.editDistanceIncremental(idx, batch, "doc_id", "text", d)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
      val full = Dedup.editDistance(corpus, "doc_id", "text", d)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
        .filter { case ((a, b), _) => a >= cut || b >= cut }
      assert(incr === full, s"maxDist=$d delta != full-run restriction")
      assert(incr.nonEmpty, s"maxDist=$d spec corpus produced no cross pairs")
      // index-only maintenance view: cross pairs alone
      val crossOnly = Dedup.editDistanceIncremental(idx, batch, "doc_id",
        "text", d, includeBatchPairs = false)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(crossOnly === full.keySet.filter { case (a, b) => a < cut && b >= cut })
      Par.release()
    }
  }

  test("editDistanceIncremental: bucketed frames keep the index exchange-free") {
    withInspectablePlans {
      import org.apache.spark.sql.functions.col
      val corpus = (1L to 200L).map(i =>
          (i, f"${i * 2654435761L % 100000000L}%08d"))
        .toDF("doc_id", "text")
      val cut = 150L
      val idx = Dedup.editIndexFrames(corpus.filter(col("doc_id") < cut),
        "doc_id", "text", 2)
      Seq("ed_segs_b", "ed_strs_b").foreach(resetTable)
      graft.sources.Sink.bucketedTableBy(idx.segs, "ed_segs_b",
        Seq("l", "i", "sub"), 8)
      graft.sources.Sink.bucketedTableBy(idx.strs, "ed_strs_b", Seq("id"), 8)
      val stored = Dedup.EditIndex(spark.table("ed_segs_b"),
        spark.table("ed_strs_b"))
      val batch = corpus.filter(col("doc_id") >= cut)
      val bucketed = Dedup.editDistanceIncremental(stored, batch,
        "doc_id", "text", 2, includeBatchPairs = false)
      assertScanJoinsExchangeFree(bucketed.queryExecution.executedPlan, "ed_segs_b")
      assertScanJoinsExchangeFree(bucketed.queryExecution.executedPlan, "ed_strs_b")
      val plain = Dedup.editDistanceIncremental(idx, batch,
        "doc_id", "text", 2, includeBatchPairs = false)
      assert(bucketed.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
        plain.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
      Par.release()
    }
  }

  test("segmentDedup: keep-first by (doc, position), rebuild in order") {
    val docs = Seq(
      (1L, "a b c d e f"),   // both segments first occurrences
      (2L, "a b c x y"),     // "a b c" dups doc1's; short tail kept
      (3L, "d e f"),         // whole doc is doc1's second segment
      (4L, "a b c d e f")    // fully boilerplate → NULL text
    ).toDF("doc_id", "text")
    val out = Dedup.segmentDedup(docs, "doc_id", "text", window = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      (1L, Some("a b c d e f"), 2L, 2L),
      (2L, Some("x y"), 2L, 1L),
      (3L, None, 1L, 0L),
      (4L, None, 2L, 0L)))
    Par.release()
  }

  test("segmentDedup: normalization unifies case/whitespace; window ≥ doc keeps whole text") {
    val docs = Seq(
      (1L, "Hello   World again"),
      (2L, "hello world AGAIN")   // same normalized content → dropped
    ).toDF("doc_id", "text")
    val out = Dedup.segmentDedup(docs, "doc_id", "text", window = 10)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      (1L, Some("hello world again"), 1L, 1L),
      (2L, None, 1L, 0L)))
    Par.release()
  }

  test("segmentDedupIncremental equals the full run restricted to batch docs") {
    val docs = (1L to 80L)
      .map(i => (i, (0 until 25).map(j => s"w${(i * 13 + j) % 9}").mkString(" ")))
      .toDF("doc_id", "text")
    val full = Dedup.segmentDedup(docs, "doc_id", "text", 5)
      .filter($"doc_id" >= 40L)
      .collect().map(r => (r.getLong(0), Option(r.getString(1)),
        r.getLong(2), r.getLong(3))).toSet
    val index = Dedup.segmentIndex(docs.filter($"doc_id" < 40L),
      "doc_id", "text", 5)
    val incr = Dedup.segmentDedupIncremental(index,
        docs.filter($"doc_id" >= 40L), "doc_id", "text", 5)
      .collect().map(r => (r.getLong(0), Option(r.getString(1)),
        r.getLong(2), r.getLong(3))).toSet
    assert(incr === full)
    Par.release()
  }

  test("segmentDedup is deterministic under repartitioning") {
    val docs = (1L to 80L)
      .map(i => (i, (0 until 25).map(j => s"w${(i * 13 + j) % 9}").mkString(" ")))
      .toDF("doc_id", "text")
    val a = Dedup.segmentDedup(docs, "doc_id", "text", 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val b = Dedup.segmentDedup(docs.repartition(7), "doc_id", "text", 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(a === b)
    Par.release()
  }

  test("editDistance is deterministic under repartitioning") {
    val corpus = (1L to 60L).map(i => (i, f"item${i % 20}%03d")).toDF("doc_id", "text")
    val a = Dedup.editDistance(corpus, "doc_id", "text", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val b = Dedup.editDistance(corpus.repartition(7), "doc_id", "text", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(a === b)
    Par.release()
  }

  /** Textbook Levenshtein for the brute-force oracle. */
  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }

  test("containmentSearch: quote-in-long-doc scores 1.0 where Jaccard ≈ 0; asymmetry, threshold, self-pair excluded") {
    val quote = "alpha beta gamma delta epsilon"  // 3 distinct 3-grams
    val docs = Seq(
      (1L, quote),
      // 2 embeds the quote in much longer text — containment(1→2)=1.0
      (2L, s"zero one two three four five $quote six seven eight nine ten"),
      // 3 shares exactly one of the 3 query grams (plus noise)
      (3L, "alpha beta gamma nope x y z"),
      (4L, "unrelated words only here")
    ).toDF("doc_id", "text")
    val out = Dedup.containmentSearch(docs, "doc_id", "text",
        queryIds = Seq(1L), threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(out === Set((1L, 2L, 3L, 1.0),
      (1L, 3L, 1L, BigDecimal(1.0 / 3).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)))
    // asymmetry: querying FROM the long doc, the quote covers only a
    // sliver of its shingles — below any useful threshold
    val rev = Dedup.containmentSearch(docs, "doc_id", "text",
        queryIds = Seq(2L), threshold = 0.3)
      .collect().map(_.getLong(1)).toSet
    assert(!rev.contains(1L))
    Par.release()
  }

  test("decontaminationRedact: span coverage, overlap dedup, short-doc fallback, clean identity") {
    import spark.implicits._
    val eval = Seq((100L, "benchmark question alpha")).toDF("doc_id", "text")
    val batch = Seq(
      // the eval 3-gram sits mid-doc: exactly its 3 words mask
      (1L, "intro words benchmark question alpha outro words"),
      // two OVERLAPPING matches ("benchmark question alpha" at 0 and
      // 1 via the doubled gram) must union, not double-count
      (2L, "benchmark question alpha benchmark question alpha"),
      // clean doc: untouched, n_masked 0
      (3L, "totally unrelated prose here"),
      // short doc (< 3 words) matching the eval WHOLE-text fallback
      // of a short eval doc — no match here (eval doc has 3 words)
      (4L, "benchmark question")
    ).toDF("doc_id", "text")
    val idx = Dedup.evalGramIndex(eval, "doc_id", "text", n = 3)
    val out = Dedup.decontaminationRedact(idx, batch, "doc_id", "text",
        n = 3).collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(2))).sortBy(_._1)
    assert(out(0) === ((1L,
      "intro words [MASKED] [MASKED] [MASKED] outro words", 3L)))
    // doc 2: grams at pos 0..3 all... only positions covered by the
    // exact shared gram mask; "alpha benchmark question" (pos 2) is
    // NOT an eval gram, so pos 2's span never fires on its own —
    // but pos 0 and pos 3 both match, covering 0-2 and 3-5: all six
    assert(out(1) === ((2L, ("[MASKED] " * 6).trim, 6L)))
    assert(out(2) === ((3L, "totally unrelated prose here", 0L)))
    assert(out(3) === ((4L, "benchmark question", 0L)))

    // short EVAL doc: its whole-text gram masks a short train doc
    // whole-text-equal to it, covering every word
    val idx2 = Dedup.evalGramIndex(
      Seq((200L, "two words")).toDF("doc_id", "text"), "doc_id", "text", n = 3)
    val out2 = Dedup.decontaminationRedact(idx2,
        Seq((5L, "two words")).toDF("doc_id", "text"), "doc_id", "text",
        n = 3).collect()(0)
    assert(out2.getString(1) === "[MASKED] [MASKED]")
    assert(out2.getLong(2) === 2L)
    Par.release()
  }
}
