package graft

import graft.operators.Search
import org.apache.spark.sql.functions._

class SearchSpec extends SparkSuite {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox"),
    (2L, "quick silver linings"),          // shares "quick" with 1
    (3L, "THE QUICK BROWN FOX"),           // case differs — must NOT match "quick"
    (4L, "slow red fox"),
    (5L, "qu"),                            // shorter than any trigram
    (6L, "abcabcabc"),                     // repeated trigrams
    (7L, "ends with qui"),                 // prefix of the pattern only
    (8L, "")
  ).toDF("doc_id", "text")

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.collect().map(_.getLong(0)).toSet

  test("substringSearch ≡ scan for hits, case sensitivity, and misses") {
    val idx = Search.trigramFrame(docs, "doc_id", "text")
    for (pat <- Seq("quick", "fox", "QUICK", "abcabc", "zzz", "ck s",
                    "the quick brown fox")) {
      val fast = ids(Search.substringSearch(idx, docs, "doc_id", "text", pat))
      val scan = ids(Search.substringScan(docs, "doc_id", "text", pat))
      assert(fast === scan, s"pattern '$pat'")
    }
    // sanity on the fixture: matches exist and case is respected
    assert(ids(Search.substringSearch(idx, docs, "doc_id", "text", "quick"))
      === Set(1L, 2L))
    assert(ids(Search.substringSearch(idx, docs, "doc_id", "text", "QUICK"))
      === Set(3L))
    Par.release()
  }

  test("sub-trigram patterns fall back to the scan; candidates are verified") {
    val idx = Search.trigramFrame(docs, "doc_id", "text")
    // 2-char pattern: trigram index can't serve it — scan fallback
    assert(ids(Search.substringSearch(idx, docs, "doc_id", "text", "qu"))
      === Set(1L, 2L, 5L, 7L))
    // doc 7 has all trigrams of "qui" but not of "quick" — shows the
    // all-grams intersection pruning; "quic" needs the "uic"+"qui"
    // grams and doc 7 has both ONLY for qui → pruned or verified away
    assert(!ids(Search.substringSearch(idx, docs, "doc_id", "text", "quick"))
      .contains(7L))
    // scattered grams: doc with "abc" grams must not match "cba"
    assert(ids(Search.substringSearch(idx, docs, "doc_id", "text", "cba"))
      === Set.empty[Long])
    Par.release()
  }

  test("multiSearch ≡ per-pattern scans in one index pass") {
    val idx = Search.trigramFrame(docs, "doc_id", "text")
    val pats = Seq("quick", "fox", "abcabc", "zzz", "BROWN")
    val out = Search.multiSearch(idx, docs, "doc_id", "text", pats)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val expected = pats.flatMap(p =>
      ids(Search.substringScan(docs, "doc_id", "text", p)).map(p -> _)).toSet
    assert(out === expected)
    assert(out.contains(("fox", 1L)) && out.contains(("BROWN", 3L)))
    assert(!out.exists(_._1 == "zzz"))
    intercept[IllegalArgumentException] {
      Search.multiSearch(idx, docs, "doc_id", "text", Seq("ab"))
    }
    Par.release()
  }

  test("bucketed posting frame keeps the probe exchange-free") {
    val conf = spark.conf
    val prevB = conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevA = conf.get("spark.sql.adaptive.enabled")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val corpus = Tables.documents(spark, "/root/testdata/sf0.001")
      val idx = Search.trigramFrame(corpus, "doc_id", "text")
      spark.sql("DROP TABLE IF EXISTS trgm_b")
      val whDir = new java.io.File(
        conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), "trgm_b")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      if (whDir.exists()) rm(whDir)
      graft.sources.Sink.bucketedTableBy(idx, "trgm_b", Seq("gram"), 8)
      val out = Search.substringSearch(spark.table("trgm_b"), corpus,
        "doc_id", "text", "data group")
      // the gram IN-list reaches the index scan as a pushed filter and
      // the aggregation rides the bucket partitioning — no exchange
      // between the index scan and the first aggregate
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
      def paths(p: SparkPlan): Seq[List[SparkPlan]] = p match {
        case f: FileSourceScanExec if f.tableIdentifier.exists(_.table == "trgm_b") =>
          Seq(List(p))
        case _ => p.children.flatMap(paths).map(p :: _)
      }
      val plan = out.queryExecution.executedPlan
      val found = paths(plan)
      assert(found.nonEmpty, s"no trgm_b scan in:\n$plan")
      found.foreach { rootToScan =>
        val below = rootToScan.reverse.drop(1)
          .takeWhile(n => !n.nodeName.toLowerCase.contains("aggregate"))
        assert(!below.exists(_.isInstanceOf[ShuffleExchangeLike]),
          "index re-shuffled before the posting intersection:\n" +
            rootToScan.map(_.nodeName).mkString(" -> "))
      }
      // and the result equals the scan
      assert(ids(out) === ids(Search.substringScan(corpus, "doc_id", "text",
        "data group")))
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      conf.set("spark.sql.adaptive.enabled", prevA)
    }
    Par.release()
  }

  test("phraseSearch: adjacency, overlap counting, case-fold, no scrambles") {
    val pdocs = Seq(
      (1L, "the quick brown fox"),
      (2L, "brown quick the fox"),         // same terms, scrambled — no match
      (3L, "a a a a"),                     // overlapping "a a": 3 anchors
      (4L, "THE QUICK brown"),             // normalize lowers — matches
      (5L, "the slow quick brown"),        // gap between phrase terms — no match
      (6L, "x the quick y the quick"),     // two disjoint matches
      (7L, "")
    ).toDF("doc_id", "text")
    val idx = Search.positionalFrame(pdocs, "doc_id", "text")
    def res(phrase: Seq[String]) = Search.phraseSearch(idx, phrase)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(res(Seq("the", "quick")) ===
      Set((1L, 1L, 1L), (4L, 1L, 1L), (6L, 2L, 2L)))
    assert(res(Seq("a", "a")) === Set((3L, 3L, 1L)))
    assert(res(Seq("a", "a", "a")) === Set((3L, 2L, 1L)))
    assert(res(Seq("quick", "brown", "fox")) === Set((1L, 1L, 2L)))
    assert(res(Seq("fox", "the")) === Set.empty)          // no wraparound
    assert(res(Seq("zzz", "quick")) === Set.empty)
    Par.release()
  }

  test("multiPhraseSearch ≡ per-phrase phraseSearch in one index pass; no-hit and shared-term phrases") {
    val pdocs = Seq(
      (1L, "the quick brown fox"),
      (2L, "a a a quick brown"),
      (3L, "x the quick y the quick"),
      (4L, "quick the brown")
    ).toDF("doc_id", "text")
    val idx = Search.positionalFrame(pdocs, "doc_id", "text")
    // phrases share terms ("the quick" / "quick brown") and include a
    // repeated-term and a no-hit phrase
    val phrases = Seq(Seq("the", "quick"), Seq("quick", "brown"),
      Seq("a", "a"), Seq("none", "here"))
    val batch = Search.multiPhraseSearch(idx, phrases)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val single = phrases.flatMap { p =>
      Search.phraseSearch(idx, p).collect()
        .map(r => (p.mkString(" "), r.getLong(0), r.getLong(1), r.getLong(2)))
    }.toSet
    assert(batch === single)
    assert(batch.map(_._1) === Set("the quick", "quick brown", "a a"))
    Par.release()
  }

  test("phraseSearch: unioned batch index frames answer exactly like a fresh build") {
    val pdocs = Seq(
      (1L, "the quick brown fox"),
      (2L, "a a a"),
      (3L, "x the quick y"),
      (4L, "the quick the quick")
    ).toDF("doc_id", "text")
    val full = Search.phraseSearch(
      Search.positionalFrame(pdocs, "doc_id", "text"), Seq("the", "quick"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val i1 = Search.positionalFrame(pdocs.filter(col("doc_id") <= 2), "doc_id", "text")
    val i2 = Search.positionalFrame(pdocs.filter(col("doc_id") > 2), "doc_id", "text")
    val incr = Search.phraseSearch(i1.unionByName(i2), Seq("the", "quick"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(incr === full)
    Par.release()
  }
}
