package graft

import graft.functions.Text
import org.apache.spark.sql.functions._

class TextSpec extends SparkSuite {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("text").select(c.as("v")).collect()(0).getAs[T]("v")

  test("textRankKeywords: hub word ranks first, tie-break alphabetical, graphless docs absent, repartition-stable") {
    val docs = Seq(
      (1L, "alpha beta alpha gamma alpha delta"), // star centered on alpha
      (2L, "x"),                                  // single token: no graph
      (3L, "y y y y")                             // self-adjacency only: no edges
    ).toDF("doc_id", "text")
    val out = Text.textRankKeywords(docs, "doc_id", "text",
      iterations = 6, topK = 3).collect()
    assert(out.map(_.getLong(0)).toSet === Set(1L))
    val top = out.filter(_.getLong(0) == 1L).sortBy(_.getLong(3))
    // hub first; the three spokes tie on rank → alphabetical
    assert(top.map(_.getString(1)).toSeq === Seq("alpha", "beta", "delta"))
    assert(top.head.getLong(2) > top(1).getLong(2))
    assert(top(1).getLong(2) === top(2).getLong(2))
    // deterministic under repartitioning (integer fixed-point)
    val rep = Text.textRankKeywords(docs.repartition(5), "doc_id", "text",
      iterations = 6, topK = 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rep.sortBy(_._4).toSeq ===
      top.map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq)
    Par.release()
  }

  test("readability: hand-computed counts, sentence floor, consonant-only tokens, wordless null") {
    val docs = Seq(
      (1L, "The cat sat. It ran!"),   // 5 words, 2 sentences, 5 syllable runs
      (2L, "hello world"),            // no terminator → sentence floor 1
      (3L, "Mr Smth tries."),         // consonant-only tokens: 3 words, 1 syllable run
      (4L, "123 456 --")              // wordless → null metrics
    ).toDF("doc_id", "text")
    val out = Text.readability(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L) ===
      ((5L, 2L, 5L, Some(r6(0.39 * 2.5 + 11.8 * 1.0 - 15.59)))))
    assert(out(2L)._2 === 1L)
    assert(out(3L) === ((3L, 1L, 1L,
      Some(r6(0.39 * 3.0 + 11.8 * (1.0 / 3.0) - 15.59)))))
    assert(out(4L) === ((0L, 1L, 0L, None)))
  }

  test("tokenCountWs: whitespace runs, empty string") {
    assert(one[Long](Text.tokenCountWs(col("text")), "a  b\tc\nd") === 4L)
    assert(one[Long](Text.tokenCountWs(col("text")), "") === 0L)
    assert(one[Long](Text.tokenCountWs(col("text")), "   ") === 0L)
  }

  test("tokenCountBpe: ~4 chars per word-token plus punctuation") {
    // "hello" → 2, "world" → 2, "," and "!" → 1 each
    assert(one[Long](Text.tokenCountBpe(col("text")), "hello, world!") === 6L)
    assert(one[Long](Text.tokenCountBpe(col("text")), "") === 0L)
  }

  test("langId picks the language with most stopword hits") {
    assert(one[String](Text.langId(col("text")),
      "the cat is in the house and it is warm") === "en")
    assert(one[String](Text.langId(col("text")),
      "le chat est dans la maison et la nuit") === "fr")
    assert(one[String](Text.langId(col("text")), "xyzzy qwerty") === "und")
  }

  test("fingerprint is invariant to case and whitespace, distinct for different text") {
    val f1 = one[Long](Text.fingerprint(col("text")), "Hello   World")
    val f2 = one[Long](Text.fingerprint(col("text")), "hello world")
    val f3 = one[Long](Text.fingerprint(col("text")), "hello worlds")
    assert(f1 === f2)
    assert(f1 !== f3)
  }

  test("portableHash60: pinned md5-slice value, sign-free range") {
    // 'hello world' → md5 5eb63bbbe01eeed0... → first 15 hex digits
    // 0x5eb63bbbe01eeed = 426544247714475757 (the value any engine
    // computing CAST('0x'||substr(md5(s),1,15) AS BIGINT) must agree on)
    assert(one[Long](Text.portableHash60(col("text")), "hello world")
      === 426544247714475757L)
    // non-ASCII goes through UTF-8 bytes identically everywhere
    val h = one[Long](Text.portableHash60(col("text")), "héllo wörld 中文")
    assert(h >= 0L && h < (1L << 60))
  }

  test("winnow with portableHash60 keeps the shared-run guarantee") {
    def fp(t: String) = one[collection.Seq[Long]](
      Text.winnow(col("text"), k = 3, w = 3, Text.portableHash60), t).toSeq
    val a = fp("the quick brown fox jumps over the lazy dog tonight")
    assert(a === a.sorted && a.distinct === a)
    val b = fp("completely different prefix quick brown fox jumps over and more")
    assert(a.toSet.intersect(b.toSet).nonEmpty)
  }

  test("shingles: n-grams distinct; short text collapses to whole-text shingle") {
    val sh = one[collection.Seq[String]](Text.shingles(col("text"), 3), "a b c d")
    assert(sh.toSet === Set("a b c", "b c d"))
    val short = one[collection.Seq[String]](Text.shingles(col("text"), 3), "a b")
    assert(short.toSeq === Seq("a b"))
  }

  test("winnow: sorted distinct selection; shared run of k+w-1 words ⇒ common hash") {
    def fp(t: String) =
      one[collection.Seq[Long]](Text.winnow(col("text"), k = 3, w = 3), t).toSeq
    val a = fp("the quick brown fox jumps over the lazy dog tonight")
    assert(a === a.sorted && a.distinct === a, "selection must be sorted distinct")
    // winnowing guarantee (Schleimer et al. §3): two docs sharing a
    // run of ≥ k+w-1 = 5 words select at least one common hash, no
    // matter what surrounds the run
    val shared = "quick brown fox jumps over"
    val b = fp(s"completely different prefix $shared and another ending here")
    assert(a.toSet.intersect(b.toSet).nonEmpty, "shared run must yield a common hash")
    // disjoint vocabularies share nothing
    val c = fp("uno dos tres cuatro cinco seis siete ocho nueve diez")
    assert(a.toSet.intersect(c.toSet).isEmpty)
    // short text (< k words) degrades to the whole-text shingle hash
    assert(fp("a b").length === 1)
  }

  test("redactPii scrubs emails, urls, ips; counts match; clean text untouched") {
    import graft.functions.Text
    val rows = Seq(
      (1L, "contact bob@example.com or visit https://example.com/a?x=1 now"),
      (2L, "server at 192.168.1.10 and 10.0.0.1 replied"),
      (3L, "nothing sensitive here at all")).toDF("id", "text")
    val out = rows.select(col("id"), Text.redactPii(col("text")).as("clean"),
        Text.piiCounts(col("text")).as("c"))
      .select(col("id"), col("clean"), col("c.n_emails"), col("c.n_urls"), col("c.n_ips"))
      .orderBy("id").collect()
    assert(out(0).getString(1) === "contact <EMAIL> or visit <URL> now")
    assert((out(0).getLong(2), out(0).getLong(3), out(0).getLong(4)) === ((1L, 1L, 0L)))
    assert(out(1).getString(1) === "server at <IP> and <IP> replied")
    assert((out(1).getLong(2), out(1).getLong(3), out(1).getLong(4)) === ((0L, 0L, 2L)))
    assert(out(2).getString(1) === "nothing sensitive here at all")
  }

  test("wordRepetition + qualityFilter: signals and first-failing-rule verdicts") {
    import graft.functions.Text
    val rows = Seq(
      (1L, Seq.fill(30)("spam").mkString(" ")),                       // repetitive + low diversity
      (2L, "short text"),                                             // too_short
      (3L, (1 to 30).map(i => s"w$i").mkString(" "))).toDF("id", "text") // clean
    val rep = Text.wordRepetition(rows, "id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(rep(1L) === ((30L, 1L, 1.0 / 30.0, 1.0)))
    assert(rep(3L) === ((30L, 30L, 1.0, 1.0 / 30.0)))
    val verdicts = Text.qualityFilter(rows, "id", "text",
        minWords = 5L, maxWords = 1000L, minDistinctRatio = 0.4, maxTopWordFrac = 0.2)
      .collect().map(r => r.getLong(0) -> ((r.getString(2), r.getBoolean(3)))).toMap
    assert(verdicts === Map(
      1L -> (("low_diversity", false)), // diversity rule fires before repetition
      2L -> (("too_short", false)),
      3L -> (("keep", true))))
  }

  test("unigramSurprisal: hand-computed corpus cross-entropy per doc") {
    // corpus counts: a=2, b=2, c=1, C=5
    // doc1 "a a b": (2·ln(2/5) + 1·ln(2/5)) / 3 = ln(0.4)
    // doc2 "b c":   (ln(2/5) + ln(1/5)) / 2
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("id", "text")
    val out = Text.unigramSurprisal(docs, "id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out(1L)._1 === 3L)
    assert(math.abs(out(1L)._2 - math.log(0.4)) < 1e-12)
    assert(out(2L)._1 === 2L)
    assert(math.abs(out(2L)._2 - (math.log(0.4) + math.log(0.2)) / 2) < 1e-12)
    // the gibberish doc scores strictly below the typical docs
    val mixed = Seq((1L, "the quick fox the lazy dog the end"),
      (2L, "the quick dog the lazy fox the start"),
      (3L, "zxqj vvkpt qqrmz lwwfy")).toDF("id", "text")
    val scores = Text.unigramSurprisal(mixed, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores(3L) < scores(1L) && scores(3L) < scores(2L))
  }

  test("topTermsApprox: heavy hitters present, bounds bracket the exact counts") {
    // skewed corpus: 'hot' ≈ 1334 occurrences over a ~1700-term vocab
    // far beyond capacity, long tail of near-singletons
    val docs = (1 to 2000).map { i =>
      val tail = s"t${i % 700} u${i % 311} v$i"
      (i.toLong, if (i % 3 == 0) s"hot hot $tail" else tail)
    }.toDF("id", "text")
    val approx = Text.topTermsApprox(docs, "id", "text", k = 5, capacity = 64)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val exact = Text.topTerms(docs, "id", "text", 5000).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // the true heavy hitter leads (its frequency dwarfs N/capacity),
    // and every reported [count_min, count_max] brackets the truth
    assert(approx.head._1 === "hot")
    approx.foreach { case (t, lo, hi) =>
      val truth = exact(t)
      assert(lo <= truth && truth <= hi, s"$t: [$lo,$hi] vs $truth")
    }
  }

  test("topTermsApprox: a partition whose table empties still feeds the error sum") {
    // partition 0: 'x' ×4 (table never fills). partition 1 with
    // capacity 2: 'a b' fill the table, 'c' triggers the decrement
    // round that kills BOTH entries — the partition ends with an
    // EMPTY table and, pre-fix, emitted nothing, so its round was
    // missing from err and count_max could undercut the truth
    val docs = spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(org.apache.spark.sql.Row(1L, "x x x x"),
            org.apache.spark.sql.Row(2L, "a b c")), 2),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
    val out = Text.topTermsApprox(docs, "id", "text", k = 1, capacity = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.length === 1 && out.head._1 === "x")
    // err must include partition 1's emptied-table round: max = 4 + 1
    assert(out.head._2 === 4L && out.head._3 === 5L)
  }

  test("ngramRepetition: looped text maxes out, all-distinct text zeroes dup") {
    val docs = Seq(
      (1L, "spam spam spam spam spam"),    // 3 identical trigrams
      (2L, "one two three four five six")  // 4 distinct trigrams
    ).toDF("id", "text")
    val out = Text.ngramRepetition(docs, "id", "text", 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(out(1L) === ((3L, 1.0, 1.0)))
    assert(out(2L)._1 === 4L && out(2L)._3 === 0.0)
    assert(math.abs(out(2L)._2 - 0.25) < 1e-12)
  }

  test("bigramSurprisal: hand-computed conditional logprobs; order sensitivity") {
    // corpus bigrams: d1 "a b a b" → (a,b),(b,a),(a,b); d2 "a b c" →
    // (a,b),(b,c). C(a,b)=3 C(b,a)=1 C(b,c)=1; C(a,·)=3 C(b,·)=2
    // d1: (2·ln(3/3) + 1·ln(1/2)) / 3;  d2: (ln(3/3) + ln(1/2)) / 2
    val docs = Seq((1L, "a b a b"), (2L, "a b c")).toDF("id", "text")
    val out = Text.bigramSurprisal(docs, "id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out(1L)._1 === 3L)
    assert(math.abs(out(1L)._2 - math.log(0.5) / 3) < 1e-12)
    assert(out(2L)._1 === 2L)
    assert(math.abs(out(2L)._2 - math.log(0.5) / 2) < 1e-12)
    // word ORDER matters: scrambled doc scores below its source even
    // though unigram surprisal cannot tell them apart
    val mixed = Seq(
      (1L, "the quick fox jumps over the lazy dog and the quick dog rests"),
      (2L, "the quick fox jumps over the lazy dog and the quick dog rests"),
      (3L, "dog the over quick rests fox the jumps lazy and dog the quick")
    ).toDF("id", "text")
    val s = Text.bigramSurprisal(mixed, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(s(3L) < s(1L))
    // docs with < 2 words produce no row
    assert(Text.bigramSurprisal(Seq((9L, "solo")).toDF("id", "text"),
      "id", "text").isEmpty)
  }

  test("ndcgAtK: ideal order scores 1, hand-computed inversion penalty, no-match empty corpus") {
    // ideal retrieved order (rel 2 first): dcg = idcg → ndcg 1
    val ideal = Seq((1L, "a b"), (2L, "a x")).toDF("doc_id", "text")
    val i = Text.ndcgAtK(ideal, "doc_id", "text", Seq("a", "b"), k = 5).head()
    assert(i.getLong(0) === 2L)
    // gains: 3/log₂2 + 1/log₂3 = 3.0 + 0.630930 over rounded terms
    assert(i.getDouble(1) === 3.63093 && i.getDouble(2) === 3.63093)
    assert(i.getDouble(3) === 1.0)
    // BM25 puts the tf-saturated single-term doc FIRST (b is rare,
    // idf 1.280934) though the two-term doc is more relevant → the
    // inversion nDCG exists to punish: rel by rank [1,2,1,1,1,1,1,1]
    val inv = (Seq(
      (1L, "b b b b b b"),
      (2L, "a b x x x x x x x x x x")) ++
      (3L to 8L).map(id => (id, "a y"))).toDF("doc_id", "text")
    val v = Text.ndcgAtK(inv, "doc_id", "text", Seq("a", "b"), k = 8).head()
    assert(v.getLong(0) === 8L)
    assert(v.getDouble(1) === 5.215324) // Σ rounded gains, retrieved order
    assert(v.getDouble(2) === 5.953465) // ideal reorder: rel-2 doc first
    assert(v.getDouble(3) === 0.876015) // 5215324/5953465
    // no doc matches any term: empty ranking, guarded null ndcg
    val none = Seq((1L, "x y z")).toDF("doc_id", "text")
    val n = Text.ndcgAtK(none, "doc_id", "text", Seq("a", "b"), k = 5).head()
    assert(n.getLong(0) === 0L && n.getDouble(1) === 0.0 && n.isNullAt(3))
  }

  test("bm25TopK: closed-form scores, rank order, non-matching docs excluded") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "apple cherry"),
      (3L, "cherry cherry banana"),
      (4L, "plum plum plum")).toDF("doc_id", "text")
    val out = Text.bm25TopK(docs, "doc_id", "text",
        queryTerms = Seq("apple", "banana"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    // the same formula evaluated directly: N=4, avgdl=(3+2+3+3)/4,
    // df(apple)=2, df(banana)=2
    val (k1, b) = (1.2, 0.75)
    val (nd, avgdl) = (4.0, 11.0 / 4.0)
    def idf(df: Double) = math.log((nd - df + 0.5) / (df + 0.5) + 1.0)
    def term(tf: Double, df: Double, len: Double) =
      if (tf == 0) 0.0
      else idf(df) * (tf * (k1 + 1.0)) /
        (tf + k1 * (1.0 - b + b * len / avgdl))
    def score(tfA: Double, tfB: Double, len: Double) = BigDecimal(
      term(tfA, 2.0, len) + term(tfB, 2.0, len))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = Seq(
      1L -> score(2, 1, 3), 2L -> score(1, 0, 2), 3L -> score(0, 1, 3))
      .sortBy { case (id, s) => (-s, id) }
      .zipWithIndex.map { case ((id, s), i) => (id, s, i + 1) }
    assert(out.toSeq === expect)
    assert(!out.exists(_._1 == 4L)) // no query term → excluded
    // doc 1 carries both terms, one twice → must outrank the others
    assert(out.head._1 === 1L)
    // guards
    intercept[IllegalArgumentException] {
      Text.bm25TopK(docs, "doc_id", "text", Seq.empty, k = 5) }
    intercept[IllegalArgumentException] {
      Text.bm25TopK(docs, "doc_id", "text", Seq("a", "a"), k = 5) }
    intercept[IllegalArgumentException] {
      Text.bm25TopK(docs, "doc_id", "text", Seq("a"), k = 0) }
  }

  test("bm25 maintained index: unioned batch frames answer exactly like a re-scan") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "apple cherry"),
      (3L, "cherry cherry banana"),
      (4L, "plum plum plum"),
      (5L, "banana plum apple banana")).toDF("doc_id", "text")
    def res(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSeq
    val full = res(Text.bm25TopK(docs, "doc_id", "text",
      Seq("apple", "banana"), k = 10))
    val (p1, l1) = Text.bm25IndexFrames(docs.filter(col("doc_id") <= 2), "doc_id", "text")
    val (p2, l2) = Text.bm25IndexFrames(docs.filter(col("doc_id") > 2), "doc_id", "text")
    val incr = res(Text.bm25TopKIndexed(p1.unionByName(p2),
      l1.unionByName(l2), Seq("apple", "banana"), k = 10))
    // the batch split changes df/avgdl inputs NOT AT ALL: per-doc
    // rows append, stats are integer adds — scores identical
    assert(incr === full)
    Par.release()
  }

  test("collocations: PMI hand-computed, minCount cuts sub-threshold pairs, ties order by pair") {
    val docs = Seq(
      (1L, "x y x y x y x y x y"),
      (2L, "p q p q p q p q p q")).toDF("doc_id", "text")
    val out = Text.collocations(docs, "doc_id", "text", minCount = 5L, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toList
    // N=20 tokens, M=18 bigrams; c(·)=5 each; "x y" and "p q" occur 5×
    // (the reversed pairs only 4× — cut by minCount)
    def pmi(cab: Long) = BigDecimal(math.log(
        (cab.toDouble * 20 * 20) / (18.0 * 5 * 5)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out === List(("p", "q", 5L, pmi(5)), ("x", "y", 5L, pmi(5)))
      .sortBy(t => (-t._4, t._1)))
    // lower minCount admits the reversed pairs at lower PMI
    val all = Text.collocations(docs, "doc_id", "text", minCount = 4L, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(all === Set(("x", "y"), ("p", "q"), ("y", "x"), ("q", "p")))
    Par.release()
  }

  test("pseudonymize: deterministic, salt-isolated, null-safe, join-true") {
    val left = Seq((1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("k", "v")
    val right = Seq((2L, "x"), (3L, "y"), (4L, "z")).toDF("k", "w")
    def tok(df: org.apache.spark.sql.DataFrame, salt: String) =
      df.withColumn("token", Text.pseudonymize(col("k"), salt))
    // join on tokens ≡ join on keys
    val joined = tok(left, "s1").join(tok(right, "s1"), Seq("token"))
      .select(col("v"), col("w")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(joined === Set(("b", "x"), ("c", "y")))
    // same salt → same token; different salt → different token
    val t1 = tok(left, "s1").select("k", "token").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val t1b = tok(left, "s1").select("k", "token").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val t2 = tok(left, "s2").select("k", "token").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(t1 === t1b)
    assert(t1.keySet.forall(k => t1(k) != t2(k)))
    // 16 lowercase hex chars; raw key never appears in the token
    assert(t1.values.forall(_.matches("[0-9a-f]{16}")))
    // null key → null token
    val n = Seq[(java.lang.Long, String)]((null, "n")).toDF("k", "v")
      .select(Text.pseudonymize(col("k"), "s1")).head
    assert(n.isNullAt(0))
    // no collisions over a realistic key range
    val many = spark.range(100000L)
      .select(Text.pseudonymize(col("id"), "s1").as("t"))
    assert(many.distinct().count() === 100000L)
  }

  test("zipfFit: a perfect tf ∝ 1/rank corpus fits slope −1, r² = 1") {
    // tf: a=6, b=3, c=2 → tf = 6/rank exactly → ln tf = ln 6 − ln rank
    val text = (Seq.fill(6)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c"))
      .mkString(" ")
    val r = Text.zipfFit(Seq((1, text)).toDF("doc_id", "text"),
      "doc_id", "text", k = 10).collect()(0)
    assert(r.getAs[Long]("n_terms") === 3L)
    assert(r.getAs[Double]("slope") === -1.0)
    assert(math.abs(r.getAs[Double]("intercept") - math.log(6.0)) < 1e-5)
    assert(r.getAs[Double]("r2") === 1.0)
  }

  test("zipfFit ranks deterministically on tf ties and honors k") {
    // four terms tf 4,4,2,1 — tie broken by term asc; k=3 drops 'd'
    val text = "b b b b a a a a c c d"
    val r = Text.zipfFit(Seq((1, text)).toDF("doc_id", "text"),
      "doc_id", "text", k = 3).collect()(0)
    assert(r.getAs[Long]("n_terms") === 3L)
    // ranks: a=1, b=2, c=3 → the fit of (0,ln4),(ln2,ln4),(ln3,ln2)
    val xs = Seq(0.0, math.log(2), math.log(3))
    val ys = Seq(math.log(4), math.log(4), math.log(2))
    val n = 3.0
    val (sx, sy) = (xs.sum, ys.sum)
    val sxx = xs.map(x => x * x).sum
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(r.getAs[Double]("slope") - slope) < 1e-5)
  }

  test("stripMarkdown: each rule hand-computed") {
    def strip(s: String): String =
      one[String](Text.stripMarkdown(col("text")), s)
    assert(strip("## Head\nbody") === "Head body")
    assert(strip("``` scala\nsecret code\n```\nkeep") === "keep")
    assert(strip("a `tick` b") === "a tick b")
    assert(strip("![alt text](http://x/i.png) and [anchor](http://y)")
      === "alt text and anchor")
    assert(strip("> quote **bold** _note_ still quote") ===
      "quote bold note still quote")
    assert(strip("- one\n- two\n* three") === "one two three")
    assert(strip("a\n---\nb") === "a b")
    // hyphenated words and in-sentence dashes survive the rule strip
    assert(strip("state-of-the-art stays") === "state-of-the-art stays")
    // plain prose is untouched
    assert(strip("plain words only") === "plain words only")
  }
}
