package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis primitives for an LLM training-data pipeline.
  * All pure per-row `org.apache.spark.sql.functions` expressions —
  * whole-stage-codegen'd, zero shuffle, so they stream through a
  * 100 TB corpus at scan speed.
  */
object Text {
  /** Lowercase, trim, collapse runs of whitespace — the normalizer
    * every dedup/fingerprint op shares.
    */
  def normalize(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Whitespace tokens (empty string → 0, not 1). */
  def tokenCountWs(text: Column): Column =
    when(length(trim(text)) === 0, lit(0L))
      .otherwise(size(split(trim(text), "\\s+")).cast("long"))

  /** BPE-ish token estimate: runs of alphanumerics count one per
    * ~4 chars (ceil), every other non-space char counts 1. A cheap,
    * deterministic proxy for subword tokenizers.
    */
  def tokenCountBpe(text: Column): Column = {
    val words = regexp_extract_all(text, lit("[A-Za-z0-9]+"), lit(0))
    val wordTokens = aggregate(words, lit(0L),
      (acc, w) => acc + ceil(length(w).cast("double") / 4.0).cast("long"))
    val punct = length(regexp_replace(text, "[A-Za-z0-9\\s]", "")).cast("long")
    wordTokens + punct
  }

  /** Word n-gram shingles (distinct), the unit for Jaccard/MinHash.
    * Built with array higher-order functions (codegen'd, no UDF).
    */
  def shingles(text: Column, n: Int): Column = {
    // bind the split-word array ONCE as a lambda variable — the
    // per-position lambda referencing `words` by Column would inline
    // (and re-run) the whole normalize+split tree for every shingle
    // position: O(len²) per doc (the Text.winnow lesson)
    val words = split(normalize(text), " ")
    element_at(transform(array(words), ws => {
      // short texts (< n words) collapse to a single whole-text shingle
      val grams = when(size(ws) < n, array(concat_ws(" ", ws)))
        .otherwise(transform(sequence(lit(0), size(ws) - n),
          i => concat_ws(" ", slice(ws, i + 1, lit(n)))))
      array_distinct(grams)
    }), 1)
  }

  /** Stopword-hit count for one language's list. */
  def stopwordHits(text: Column, stopwords: Seq[String]): Column = {
    val words = split(normalize(text), " ")
    size(filter(words, w => w.isin(stopwords.map(lit(_).cast("string")): _*))).cast("long")
  }

  // Tiny per-language stopword lists (public common-word lists).
  val StopwordsEn = Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")
  val StopwordsFr = Seq("le", "la", "de", "et", "les", "des", "un", "une", "que", "est")
  val StopwordsDe = Seq("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "zu", "den")
  val StopwordsEs = Seq("el", "la", "de", "que", "y", "los", "las", "un", "una", "es")
  val StopwordsZh = Seq("的", "是", "了", "在", "和", "有", "我", "他", "这", "不")

  /** Language-ID heuristic: argmax of stopword hits; "und"
    * (undetermined) when nothing matches. Deterministic tie-break by
    * fixed language order en > fr > de > es > zh.
    */
  def langId(text: Column): Column = {
    val langs = Seq("en" -> StopwordsEn, "fr" -> StopwordsFr,
      "de" -> StopwordsDe, "es" -> StopwordsEs, "zh" -> StopwordsZh)
    // two-level lambda binding: the word array is split once, the five
    // hit counts are computed once into an array, and the argmax chain
    // reads them by element_at — the naive greatest()+when chain
    // referenced each stopwordHits TREE ~3×, re-normalizing and
    // re-splitting the text ~15× per row
    val words = split(normalize(text), " ")
    element_at(transform(array(words), ws => {
      val hitsArr = array(langs.map { case (_, sw) =>
        size(filter(ws, w => w.isin(sw.map(lit(_).cast("string")): _*))).cast("long")
      }: _*)
      element_at(transform(array(hitsArr), hs => {
        val best = array_max(hs)
        langs.zipWithIndex.foldRight(lit("und")) { case (((lang, _), i), elseCol) =>
          val s = element_at(hs, lit(i + 1))
          when(s > 0 && s === best, lit(lang)).otherwise(elseCol)
        }
      }), 1)
    }), 1)
  }

  /** 64-bit content fingerprint: xxhash64 of the normalized text.
    * Spark-native (codegen'd); used for exact dedup at scale where
    * comparing 8-byte hashes beats comparing full texts.
    */
  def fingerprint(text: Column): Column = xxhash64(normalize(text))

  /** Engine-portable 60-bit string hash: the first 15 hex digits of
    * md5, parsed base-16 — `conv(substr(md5(s),1,15),16,10)` here,
    * `CAST('0x'||substr(md5(s),1,15) AS BIGINT)` in ANSI warehouses.
    * md5 over UTF-8 bytes is bit-identical everywhere, so any
    * operator parameterized on its string hash (winnow / minhash /
    * simhash) becomes replayable SQL-for-SQL in an external engine —
    * the cross-checkable twin of the xxhash64 production path (which
    * stays the default: one fused codegen'd hash vs md5's digest +
    * hex parse). Always in [0, 2^60): sign-free by construction.
    */
  def portableHash60(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** Portable-hash twin of [[fingerprint]]. */
  def fingerprintPortable(text: Column): Column =
    portableHash60(normalize(text))

  /** Deterministic salted pseudonym for a PII key — the GDPR-style
    * tokenization that [[redactPii]]'s destructive placeholders can't
    * provide: equal values map to equal tokens UNDER ONE SALT, so
    * joins, group-bys, and distinct-counts over pseudonymized tables
    * still line up (referential integrity survives tokenization),
    * while a different salt yields unlinkable tokens (per-tenant /
    * per-export isolation). The token is the first 16 hex chars of
    * md5(salt ‖ value) — one codegen'd expression, zero shuffle,
    * engine-portable (the md5-slice discipline of
    * [[portableHash60]]); 64 bits keep collisions negligible at
    * 100 TB key cardinalities. NULL stays NULL (a null key is absent,
    * not a secret). Irreversible without the salt; rotate the salt to
    * break linkage to past exports.
    */
  def pseudonymize(c: Column, salt: String): Column =
    when(c.isNull, lit(null).cast("string"))
      .otherwise(substring(md5(concat(lit(salt), c.cast("string"))
        .cast("binary")), 1, 16))

  /** Winnowing document fingerprint (Schleimer, Wilkerson, Aiken —
    * SIGMOD '03, the MOSS algorithm): hash every word k-gram, slide a
    * window of `w` hashes, keep each window's minimum — the selected
    * set is a position-robust fingerprint with the guarantee that any
    * shared run of ≥ k+w-1 words between two docs contributes at
    * least one COMMON selected hash. Pure array higher-order
    * functions over the shingle hashes (no explode, no shuffle);
    * output is the sorted distinct selection, ready for the same
    * overlap joins the dedup ops use.
    */
  def winnow(text: Column, k: Int = 5, w: Int = 4,
             hashFn: Column => Column = xxhash64(_)): Column = {
    val hashes = transform(shinglesWithDuplicates(text, k), g => hashFn(g))
    // Bind the hash array ONCE as a lambda variable: composing Columns
    // inlines expression TREES, so referencing `hashes` directly from
    // the sliding-window lambda would re-shingle and re-hash the WHOLE
    // document at every window position — O(n²·k) per doc (measured
    // ~5 ms/doc, 260 s for the sf0.1 corpus once a query actually
    // evaluated the column). Wrapped in a one-element array transform,
    // `hs` is evaluated once per row and every window reads it by
    // reference: O(n·w).
    element_at(transform(array(hashes), hs => {
      val n = size(hs)
      // per-window min as an unrolled least() over element_at — no
      // per-window slice allocation (w is a compile-time constant)
      val mins = when(n <= w, array(array_min(hs)))
        .otherwise(transform(sequence(lit(1), n - w + 1),
          i => least((0 until w).map(j => element_at(hs, i + lit(j))): _*)))
      sort_array(array_distinct(mins))
    }), 1)
  }

  /** Word n-gram shingles in POSITION ORDER, duplicates kept — the
    * sequence form winnowing needs (dedup ops use the distinct
    * [[shingles]]).
    */
  private def shinglesWithDuplicates(text: Column, n: Int): Column = {
    // same lambda-binding as [[shingles]]: evaluate the word array
    // once, not once per shingle position
    val words = split(normalize(text), " ")
    element_at(transform(array(words), ws =>
      when(size(ws) < n, array(concat_ws(" ", ws)))
        .otherwise(transform(sequence(lit(0), size(ws) - n),
          i => concat_ws(" ", slice(ws, i + 1, lit(n)))))), 1)
  }

  /** Corpus vocabulary statistics: the top-`k` normalized words by
    * total frequency, with document frequency — the raw counts behind
    * stopword lists, TF-IDF weights, and the df-caps the dedup ops
    * take. Term frequency and document frequency are computed as TWO
    * separate map-side-combined aggregations joined on the term —
    * `count(*)` beside `count(DISTINCT doc)` in ONE agg would plan an
    * Expand that doubles the exploded word stream before the shuffle.
    * The final top-k is a sort of the (tiny) per-term aggregate.
    */
  def topTerms(docs: DataFrame, idCol: String, textCol: String,
               k: Int): DataFrame = {
    val words = docs.select(col(idCol).as("__id"),
        explode(split(normalize(col(textCol)), " ")).as("term"))
      .filter(length(col("term")) > 0)
    val tf = words.groupBy(col("term")).agg(count(lit(1)).as("tf"))
    val docFreq = words.distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("doc_freq"))
    tf.join(docFreq, Seq("term"))
      .orderBy(col("tf").desc, col("term"))
      .limit(k)
  }

  /** Approximate top-k terms via per-partition Misra–Gries summaries
    * (Misra & Gries '82; mergeability per Agarwal et al. "Mergeable
    * Summaries"): each task keeps at most `capacity` counters over
    * its word stream — when a new word finds the table full, every
    * counter decrements once (one "round"; zeros evicted). Each round
    * destroys capacity+1 units of mass, so rounds ≤ nₚ/(capacity+1):
    * amortized O(1) per word, memory O(capacity) REGARDLESS of
    * vocabulary size. Partition summaries then merge with one tiny
    * (P×capacity-row) aggregation.
    *
    * Why it exists next to the exact [[topTerms]]: the exact path
    * shuffles one partial per DISTINCT term — at 100 TB a web corpus
    * carries billions of singleton terms (URLs, typos, hashes) and
    * that vocab-sized shuffle dominates. The sketch's shuffle is
    * P×capacity rows, independent of vocabulary.
    *
    * Guarantees (standard MG): `count_min ≤ true ≤ count_max`, and
    * every term with true frequency > N/(capacity+1) is PRESENT.
    * `count_max - count_min` = Σ per-partition rounds — the certified
    * error, reported per row. Output: top `k` by count_min
    * (deterministic term tie-break), columns (term, count_min,
    * count_max).
    */
  def topTermsApprox(docs: DataFrame, idCol: String, textCol: String,
                     k: Int, capacity: Int = 1024): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(capacity >= k, "capacity must be >= k")
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs
      .select(explode(split(normalize(col(textCol)), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .as[String]
    val partial = words.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      var rounds = 0L
      it.foreach { w =>
        val cur = counts.getOrElse(w, 0L)
        if (cur > 0L || counts.size < capacity) counts(w) = cur + 1L
        else {
          rounds += 1L
          val dead = List.newBuilder[String]
          counts.foreach { case (t, c) =>
            if (c == 1L) dead += t else counts(t) = c - 1L
          }
          dead.result().foreach(counts.remove)
        }
      }
      // the rounds count rides a null-term SENTINEL row, not the term
      // rows: a partition whose table empties on its final decrement
      // round has no term rows to carry it, and dropping it would
      // understate the error sum — breaking the `true <= count_max`
      // bracket (ADVICE r7)
      counts.iterator.map { case (t, c) => (pid, t, c, 0L) } ++
        Iterator.single((pid, null.asInstanceOf[String], 0L, rounds))
    }.toDF("pid", "term", "cnt", "rounds")
    // cache: read twice (per-term sums + the per-partition error sum);
    // P×capacity rows — trivially memory-safe
    val p = graft.Par.persistTracked(partial)
    val err = p.filter(col("term").isNull)
      .agg(coalesce(sum(col("rounds")), lit(0L)).as("err"))
    p.filter(col("term").isNotNull)
      .groupBy(col("term")).agg(sum(col("cnt")).as("count_min"))
      .orderBy(col("count_min").desc, col("term"))
      .limit(k)
      .crossJoin(broadcast(err)) // one row
      .select(col("term"), col("count_min"),
        (col("count_min") + col("err")).as("count_max"))
  }

  /** Per-document word-repetition quality signals — the word-level
    * repetition filters of large-corpus curation recipes (Rae et al.
    * "Gopher" appendix A1.1; C4's boilerplate rules): type-token
    * ratio (`distinct_ratio`) and the fraction of the document spent
    * on its single most-repeated word (`top_word_frac`). ONE explode
    * + two aggregations: (doc, word) counts shuffle on the
    * high-cardinality composite key, then roll up per doc — no
    * Expand, no per-doc window, scales like any word-count job.
    */
  def wordRepetition(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
        explode(split(normalize(col(textCol)), " ")).as("__w"))
      .filter(length(col("__w")) > 0)
      .groupBy(col(idCol), col("__w")).agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol)).agg(
        sum(col("__c")).as("n_words"),
        count(lit(1)).as("n_distinct_words"),
        max(col("__c")).as("__top"))
      .select(col(idCol),
        col("n_words").cast("long").as("n_words"),
        col("n_distinct_words"),
        (col("n_distinct_words").cast("double") / col("n_words").cast("double"))
          .as("distinct_ratio"),
        (col("__top").cast("double") / col("n_words").cast("double"))
          .as("top_word_frac"))

  /** TextRank keyword extraction (Mihalcea & Tarau '04) — PageRank
    * over each document's word-ADJACENCY graph picks the words most
    * central to the doc's own structure, the unsupervised upgrade of
    * [[tfIdf]]'s frequency ranking (a word mentioned once but
    * bridging every topic outranks a repeated filler). Graph per
    * doc: distinct undirected edges between adjacent normalized
    * tokens (window 2, self-loops dropped); then `iterations`
    * synchronous PageRank rounds in the engine's INTEGER fixed-point
    * discipline (scale 1e12, damping 85/100, per-DOC base mass
    * 15%·S div n_d) — every round order-free integer arithmetic, so
    * the iterative extraction hash-grades against the same rounds
    * unrolled as MATERIALIZED CTEs (the pageRankFixedPoint
    * portability argument, applied per document). Top-`topK` words
    * per doc by (rank desc, word asc) via a per-doc window.
    *
    * All rounds run over the UNION of every doc's graph keyed by
    * (doc, word) — one composite-key exchange per round, thousands
    * of docs in flight, per-doc skew bounded by doc length; docs
    * with fewer than two distinct adjacent tokens have no graph and
    * are absent.
    */
  def textRankKeywords(docs: DataFrame, idCol: String, textCol: String,
                       iterations: Int = 6, topK: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(iterations >= 1 && iterations <= 50, "iterations in [1, 50]")
    require(topK >= 1, "topK must be positive")
    val Scale = 1000000000000L
    val bi = docs
      .select(col(idCol).as("__id"),
        split(normalize(col(textCol)), " ").as("__ws"))
      .filter(size(col("__ws")) >= 2)
      .select(col("__id"), explode(expr(
        "transform(sequence(0, size(__ws) - 2), " +
          "i -> struct(__ws[i] AS a, __ws[i + 1] AS b))")).as("__bg"))
      .select(col("__id"), col("__bg.a").as("a"), col("__bg.b").as("b"))
      .filter(col("a") =!= col("b")
        && length(col("a")) > 0 && length(col("b")) > 0)
    val e = bi.select(col("__id"), least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .distinct()
    val dd = graft.Par.persistTracked(
      e.select(col("__id"), col("a").as("src"), col("b").as("dst"))
        .unionByName(
          e.select(col("__id"), col("b").as("src"), col("a").as("dst")))
        .repartition(col("__id"), col("src")))
    val nodes = graft.Par.persistTracked(
      dd.groupBy(col("__id"), col("src")).agg(count(lit(1)).as("deg")))
    val nn = nodes.groupBy(col("__id")).agg(count(lit(1)).as("n"))
    val withN = graft.Par.persistTracked(nodes.join(nn, "__id"))
    var ranks = withN.select(col("__id"), col("src").as("node"),
      expr(s"CAST($Scale AS BIGINT) div n").as("rank_fp"))
    // (r14 probe: fusing deg into the edge list to drop the per-round
    // nodes join measured 8.9 s vs 8.2 s isolated — the nodes join is
    // already exchange-free on the persisted (__id, src) partitioning
    // and the wider fused edge list costs more than the join saves,
    // so the 3-frame shape stays)
    for (i <- 1 to iterations) {
      val contrib = dd
        .join(ranks.withColumnRenamed("node", "src"), Seq("__id", "src"))
        .join(nodes, Seq("__id", "src"))
        .groupBy(col("__id"), col("dst").as("node"))
        .agg(sum(expr("rank_fp div deg")).as("__c"))
      ranks = withN.select(col("__id"), col("src").as("node"), col("n"))
        .join(contrib, Seq("__id", "node"), "left")
        .select(col("__id"), col("node"),
          (expr(s"CAST(150000000000 AS BIGINT) div n")
            + expr("(85 * coalesce(__c, CAST(0 AS BIGINT))) div 100"))
            .as("rank_fp"))
      if (i % 3 == 0 && i < iterations) ranks = ranks.localCheckpoint(true)
    }
    val byRank = Window.partitionBy(col("__id"))
      .orderBy(col("rank_fp").desc, col("node"))
    ranks
      .withColumn("rank", row_number().over(byRank).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("__id").as(idCol), col("node").as("word"),
        col("rank_fp"), col("rank"))
  }

  /** Flesch–Kincaid readability (Kincaid et al. '75 — the standard
    * "what grade level is this prose?" screen; a curation signal
    * orthogonal to [[wordRepetition]]'s diversity ratios: templated
    * legalese passes repetition filters but reads at grade 20+).
    * Counts are the portable regex heuristic, identical in any
    * POSIX-regex engine: words = `[A-Za-z]+` runs, sentences =
    * `[.!?]+` runs floored at 1, syllables = vowel runs
    * `[aeiouyAEIOUY]+` (consonant-only tokens count zero syllables
    * — documented approximation; no silent-e adjustment). Grade =
    * 0.39·(w/s) + 11.8·(syl/w) − 15.59; ease = 206.835 − 1.015·(w/s)
    * − 84.6·(syl/w) — fixed double trees on the three integer
    * counts, round 6. Wordless docs report null metrics.
    *
    * Pure per-row map over the scan — no shuffle, codegen'd
    * regexes; at 100 TB this is scan-bound by construction.
    */
  def readability(docs: DataFrame, idCol: String, textCol: String,
                  roundTo: Int = 6): DataFrame = {
    val t = col(textCol)
    val d = (c: Column) => c.cast("double")
    val w = regexp_count(t, lit("[A-Za-z]+")).cast("long")
    val s = greatest(regexp_count(t, lit("[.!?]+")).cast("long"), lit(1L))
    val syl = regexp_count(t, lit("[aeiouyAEIOUY]+")).cast("long")
    docs.select(col(idCol), w.as("n_words"), s.as("n_sentences"),
        syl.as("n_syllables"))
      .select(col(idCol), col("n_words"), col("n_sentences"),
        col("n_syllables"),
        round(when(col("n_words") > 0,
          lit(0.39) * (d(col("n_words")) / d(col("n_sentences")))
            + lit(11.8) * (d(col("n_syllables")) / d(col("n_words")))
            - lit(15.59)), roundTo).as("fk_grade"),
        round(when(col("n_words") > 0,
          lit(206.835)
            - lit(1.015) * (d(col("n_words")) / d(col("n_sentences")))
            - lit(84.6) * (d(col("n_syllables")) / d(col("n_words")))),
          roundTo).as("flesch_ease"))
  }

  /** Gopher-style n-gram repetition signals (Rae et al. '21 appendix
    * A1.1's duplicate/top n-gram filters, word-occurrence form):
    * over the doc's n-gram occurrences (position order, duplicates
    * kept), `top_ngram_frac` is the share taken by the single most
    * frequent n-gram and `dup_ngram_frac` the share of occurrences
    * whose n-gram appears more than once — the signals that catch
    * looped/templated text whose word-level ratios look normal.
    * Same one-explode shape as [[wordRepetition]], keyed by the
    * (doc, gram) composite — no window, no Expand, word-count-job
    * scaling.
    */
  def ngramRepetition(docs: DataFrame, idCol: String, textCol: String,
                      n: Int): DataFrame =
    docs.select(col(idCol),
        explode(shinglesWithDuplicates(col(textCol), n)).as("__g"))
      .groupBy(col(idCol), col("__g")).agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol)).agg(
        sum(col("__c")).as("n_ngrams"),
        max(col("__c")).as("__top"),
        sum(when(col("__c") >= 2, col("__c")).otherwise(lit(0L))).as("__dup"))
      .select(col(idCol),
        col("n_ngrams").cast("long").as("n_ngrams"),
        (col("__top").cast("double") / col("n_ngrams").cast("double"))
          .as("top_ngram_frac"),
        (col("__dup").cast("double") / col("n_ngrams").cast("double"))
          .as("dup_ngram_frac"))

  /** Gopher-style rule verdict composed from [[wordRepetition]]:
    * keep/drop plus the FIRST failing rule as a diagnostic (curation
    * pipelines report drop reasons, not just a boolean). Rule order:
    * length bounds, then vocabulary diversity, then repetition.
    */
  def qualityFilter(docs: DataFrame, idCol: String, textCol: String,
                    minWords: Long = 50L, maxWords: Long = 100000L,
                    minDistinctRatio: Double = 0.3,
                    maxTopWordFrac: Double = 0.2): DataFrame =
    wordRepetition(docs, idCol, textCol)
      .select(col(idCol), col("n_words"),
        when(col("n_words") < minWords, lit("too_short"))
          .when(col("n_words") > maxWords, lit("too_long"))
          .when(col("distinct_ratio") < minDistinctRatio, lit("low_diversity"))
          .when(col("top_word_frac") > maxTopWordFrac, lit("repetitive"))
          .otherwise(lit("keep")).as("reason"))
      .withColumn("keep", col("reason") === "keep")

  /** Per-(doc, term) TF-IDF over the corpus: textbook
    * `tf · ln(N / df)` (no smoothing — df ≥ 1 for every emitted
    * term). `nDocs` is passed in: on the raw parquet scan the count
    * is metadata-only, and callers scoring several queries against
    * one corpus version reuse it. Two aggregations joined on the
    * term (the [[topTerms]] shape — no Expand); the per-term df side
    * is vocabulary-sized, so the join broadcasts at any corpus scale.
    */
  def tfIdf(docs: DataFrame, idCol: String, textCol: String,
            nDocs: Long): DataFrame = {
    val words = docs.select(col(idCol).as("doc_id"),
        explode(split(normalize(col(textCol)), " ")).as("term"))
      .filter(length(col("term")) > 0)
    val tf = words.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val docFreq = words.distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("doc_freq"))
    tf.join(docFreq, Seq("term"))
      .select(col("doc_id"), col("term"), col("tf"), col("doc_freq"),
        (col("tf").cast("double") *
          log(lit(nDocs.toDouble) / col("doc_freq").cast("double"))).as("tfidf"))
  }

  /** Vector-space ranked retrieval — cosine similarity over [[tfIdf]]
    * vectors for a fixed query (Salton's VSM, the classical ranker
    * beside [[bm25TopK]]; BM25 saturates tf, cosine length-normalizes
    * — different docs win, so a retrieval stack wants both). Query
    * terms weigh tf=1 · idf; doc weights tf · idf with idf =
    * ln(N/df) over docs having ≥ 1 token.
    *
    * Portability discipline (the ndcg r6-scaling trick, made
    * load-bearing): per-(doc, term) weights are FIXED-POINT
    * `w6 = round(tfidf · 1e6)` longs, so the dot product and both
    * norms are ORDER-FREE exact integer sums (decimal(38,0) — w6²
    * needs ~60 bits at tf ≈ 200) and the cosine is one double tree
    * on exact integers. Ranking uses the ROUNDED cosine (ties to the
    * lower doc id) — cross-engine stable.
    *
    * Scale shape: one scan+explode → (doc, term) tf agg → the
    * vocabulary-sized df join (the [[tfIdf]] plan); N rides as a
    * broadcast 1-row aggregate. The weighted frame is persisted once
    * and serves both the per-doc norm aggregate and the query-term
    * dot (query side is a broadcast ≤|q|-row frame). Global top-k is
    * sort+limit → TakeOrderedAndProject, never a full sort. Only
    * docs sharing ≥ 1 query term are scored (inner dot join) — the
    * inverted-index pruning for free.
    */
  def tfidfCosineTopK(docs: DataFrame, idCol: String, textCol: String,
                      queryTerms: Seq[String], k: Int,
                      roundTo: Int = 6): DataFrame =
    tfidfCosineTopKIndexed(tfidfIndexFrame(docs, idCol, textCol),
      queryTerms, k, roundTo)

  /** The MAINTAINED half of [[tfidfCosineTopK]]: the per-(doc, term)
    * tf frame IS the index — tf rows are doc-local, so a daily
    * append's index frame simply UNIONS onto the standing one (doc
    * sets disjoint ⇒ no merge), and df/N re-derive from the union
    * inside the scorer (df per term = its tf row count; both exact
    * integer adds). Incremental-equals-full is structural, the
    * dedup_segments_incr discipline.
    */
  def tfidfIndexFrame(docs: DataFrame, idCol: String,
                      textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(split(normalize(col(textCol)), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** [[tfidfCosineTopK]]'s scoring tail over a prebuilt (unioned)
    * [[tfidfIndexFrame]]. */
  def tfidfCosineTopKIndexed(tfIndex: DataFrame, queryTerms: Seq[String],
                             k: Int, roundTo: Int = 6): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(k >= 1, "k must be positive")
    val d = (c: Column) => c.cast("double")
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val tf = tfIndex
    // tf is (doc, term)-unique ⇒ df(term) is its row count per term
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nd = tf.agg(countDistinct(col("doc_id")).as("n_docs"))
    val w = graft.Par.persistTracked(
      tf.join(df, Seq("term")).crossJoin(broadcast(nd))
        .select(col("doc_id"), col("term"),
          round(d(col("tf")) * log(d(col("n_docs")) / d(col("df")))
            * lit(1000000.0)).cast("long").as("w6")))
    val norm2 = w.groupBy(col("doc_id"))
      .agg(sum(dec(col("w6")) * dec(col("w6"))).as("norm2"))
    val qw = df.filter(col("term").isin(queryTerms: _*))
      .crossJoin(broadcast(nd))
      .select(col("term").as("qterm"),
        round(log(d(col("n_docs")) / d(col("df"))) * lit(1000000.0))
          .cast("long").as("qw6"))
    val qnorm2 = qw.agg(sum(dec(col("qw6")) * dec(col("qw6"))).as("qnorm2"))
    val dots = w.join(broadcast(qw), col("term") === col("qterm"))
      .groupBy(col("doc_id"))
      .agg(sum(dec(col("w6")) * dec(col("qw6"))).as("dot"))
    dots.join(norm2, Seq("doc_id")).crossJoin(broadcast(qnorm2))
      .select(col("doc_id"),
        round(d(col("dot"))
          / (sqrt(d(col("norm2"))) * sqrt(d(col("qnorm2")))), roundTo)
          .as("cosine"))
      .orderBy(col("cosine").desc, col("doc_id")).limit(k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("cosine").desc, col("doc_id"))))
      .select(col("rank"), col("doc_id"), col("cosine"))
  }

  /** COUNT-MIN sketch term-frequency estimation (Cormode &
    * Muthukrishnan '05) — the bounded-memory frequency structure
    * beside the Misra–Gries top-k ([[topTermsApprox]]): d×w integer
    * cells answer ANY term's count with est ≥ exact and
    * est ≤ exact + εN w.h.p., where MG answers only the heavy
    * hitters. Graded as (term, exact, estimate) over the exact
    * top-`topK` so the one-sided error is itself verified.
    *
    * Build: the vocabulary-sized term-count table explodes `depth`
    * ways and aggregates into d·w cells (sketch construction is ONE
    * pass, map-side combinable — at 100 TB the sketch is the thing
    * you CAN afford to keep per hour/partition and merge by cell
    * adds). Row hashes are md5₆₀("cms:j:term") mod `width` — the
    * graded hash discipline, exact integers end to end, so the whole
    * sketch replays in SQL. Estimates join the topK frame (tiny,
    * broadcast) to its d cells and take the min.
    */
  def cmsTermCounts(docs: DataFrame, idCol: String, textCol: String,
                    depth: Int = 4, width: Int = 1024,
                    topK: Int = 20): DataFrame = {
    require(depth >= 1 && depth <= 16, "depth in [1, 16]")
    require(width >= 2, "width >= 2")
    val counts = graft.Par.persistTracked(
      docs.select(explode(split(normalize(col(textCol)), " ")).as("term"))
        .filter(length(col("term")) > 0)
        .groupBy(col("term")).agg(count(lit(1)).as("n_exact")))
    def bucket(term: Column, j: Int): Column =
      pmod(portableHash60(concat(lit(s"cms:$j:"), term)), lit(width.toLong))
    val cells = counts
      .select(explode(array((0 until depth).map(j =>
          struct(lit(j).as("j"), bucket(col("term"), j).as("bucket"))): _*))
          .as("p"),
        col("n_exact"))
      .groupBy(col("p.j").as("j"), col("p.bucket").as("bucket"))
      .agg(sum(col("n_exact")).as("cell"))
    val top = counts.orderBy(col("n_exact").desc, col("term")).limit(topK)
    val probes = top
      .select(col("term"), col("n_exact"),
        explode(array((0 until depth).map(j =>
          struct(lit(j).as("j"), bucket(col("term"), j).as("bucket"))): _*))
          .as("p"))
      .select(col("term"), col("n_exact"),
        col("p.j").as("j"), col("p.bucket").as("bucket"))
    broadcast(probes).join(cells, Seq("j", "bucket"))
      .groupBy(col("term"))
      .agg(max(col("n_exact")).as("n_exact"), min(col("cell")).as("n_est"))
      .orderBy(col("n_exact").desc, col("term"))
  }

  /** Per-doc surprisal under the CORPUS unigram model — the
    * KenLM-style "does this read like the rest of the corpus" signal
    * without an external LM: avg_logprob = (1/n_d)·Σ ln(c_t / C) over
    * the doc's tokens, where c_t is the token's corpus count and C
    * the corpus token total. Typical text scores high (less
    * negative); rare-token-heavy gibberish, boilerplate code in a
    * prose corpus, and wrong-language docs score very negative — the
    * standard distribution-outlier curation cut.
    *
    * Fully distributed and oracle-portable (pure ln arithmetic, the
    * [[tfIdf]] discipline): one explode → per-(doc,term) counts →
    * join to the vocabulary-sized term-count side (broadcasts at any
    * corpus scale; C rides along as a window-free aggregate on that
    * tiny frame) → one per-doc average.
    */
  def unigramSurprisal(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // persisted: the per-doc tf and the corpus counts both fold this
    // exploded stream — one scan + explode instead of two
    val words = graft.Par.persistTracked(
      docs.select(col(idCol).as("doc_id"),
          explode(split(normalize(col(textCol)), " ")).as("term"))
        .filter(length(col("term")) > 0))
    val tf = words.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val W = org.apache.spark.sql.expressions.Window
    val wAll = W.partitionBy().rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    // corpus counts: vocabulary-sized; the total C is a window sum
    // over that same tiny frame (no extra scan, no 1-row cross join)
    val counts = words.groupBy(col("term")).agg(count(lit(1)).as("c_t"))
      .withColumn("c_total", sum(col("c_t")).over(wAll))
    tf.join(counts, Seq("term"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_words"),
        (sum(col("tf").cast("double") *
          log(col("c_t").cast("double") / col("c_total").cast("double"))) /
          sum(col("tf")).cast("double")).as("avg_logprob"))
  }

  /** Conditional (bigram) surprisal — the perplexity-filter
    * primitive (CCNet, Wenzek et al. '20, ranks corpora by LM
    * perplexity; an in-corpus bigram MLE is its self-contained
    * analog): per doc, the average of ln p(w_i | w_{i-1}) over the
    * doc's bigrams, with p(b|a) = C(a,b) / C(a,·) from the corpus's
    * own bigram-start counts (every scored bigram exists in the
    * corpus, so the MLE is never zero). Unusually low avg_logprob =
    * improbable word-to-word transitions = gibberish/boilerplate
    * candidates — [[unigramSurprisal]] made sensitive to word ORDER.
    *
    * Same scale shape as the unigram form: two bigram-vocab-sized
    * count frames, one join of per-doc bigram counts against them,
    * per-doc aggregation. Docs with < 2 words have no bigrams and
    * drop out (left-join the corpus if they must be kept).
    */
  def bigramSurprisal(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = split(normalize(col(textCol)), " ")
    // bind the word array once; sequence() needs the size>=2 guard
    // (sequence(0, -1) would count DOWN, not produce empty)
    val bigrams = element_at(transform(array(words), ws =>
      when(size(ws) < 2, array().cast("array<struct<a:string,b:string>>"))
        .otherwise(transform(sequence(lit(0), size(ws) - 2), i =>
          struct(element_at(ws, i + 1).as("a"), element_at(ws, i + 2).as("b"))))), 1)
    // persisted: tf, C(a,b) and C(a,·) all fold the SAME exploded
    // stream — without this the corpus is re-shingled three times
    // (Spark has no cross-branch CSE; the sharedRuns lesson)
    val bi = graft.Par.persistTracked(
      docs.select(col(idCol).as("doc_id"), explode(bigrams).as("bg"))
        .select(col("doc_id"), col("bg.a").as("a"), col("bg.b").as("b")))
    val tf = bi.groupBy(col("doc_id"), col("a"), col("b")).agg(count(lit(1)).as("tf"))
    val cab = bi.groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_ab"))
    val ca = bi.groupBy(col("a")).agg(count(lit(1)).as("c_a"))
    tf.join(cab, Seq("a", "b")).join(ca, Seq("a"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_bigrams"),
        (sum(col("tf").cast("double") *
            log(col("c_ab").cast("double") / col("c_a").cast("double"))) /
          sum(col("tf")).cast("double")).as("avg_logprob"))
  }

  /** BM25 top-k retrieval — the lexical-retrieval staple next to
    * [[tfIdf]] (used for RAG candidate pools, decontamination probes,
    * and "find training docs about X" curation queries). Lucene's
    * non-negative IDF variant: for each query term t,
    * `idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1)`, and the doc score
    * is `Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·|d|/avgdl))`
    * with N / avgdl over docs having ≥ 1 token.
    *
    * Scale shape (the query-term list is tiny and FIXED, which makes
    * this cheaper than a general inverted-index probe): ONE scan +
    * explode → ONE per-doc aggregation computing the doc length and
    * each query term's tf as conditional sums (no per-term join, no
    * pivot Expand) → a 1-row corpus-stats aggregate (N, avgdl, per-
    * term dfs) broadcast back as a cross join → a codegen'd scoring
    * projection → global top-k via sort+limit, which Spark executes
    * as TakeOrderedAndProject (per-partition heaps, driver merge of
    * k·partitions rows — never a global sort). Ranking uses the
    * ROUNDED score (ties to the lower doc id) so the order is stable
    * across engines and summation noise; the row_number window runs
    * AFTER the limit, over k rows.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75,
               roundTo: Int = 6): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val words = docs.select(col(idCol).as("doc_id"),
        explode(split(normalize(col(textCol)), " ")).as("term"))
      .filter(length(col("term")) > 0)
    val tfCols = queryTerms.indices.map(i =>
      sum(when(col("term") === queryTerms(i), lit(1L)).otherwise(lit(0L)))
        .as(s"tf_$i"))
    val perDoc = words.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("len"), tfCols: _*)
    bm25ScoreTopK(perDoc, queryTerms, k, k1, b, roundTo)
  }

  /** nDCG@k search-quality evaluation over the [[bm25TopK]] ranking
    * (Järvelin & Kekäläinen '02 — the graded-relevance harness that
    * turns "the ranker returned SOMETHING" into "the ranker put the
    * most relevant things FIRST"): graded relevance per retrieved
    * doc = number of DISTINCT query terms it contains (0..|q|,
    * integer, engine-replayable — no human labels in the sandbox),
    * DCG@k = Σ_i (2^rel_i − 1)/log₂(i+1) over the retrieved
    * ranking, IDCG from the ideal reordering of the SAME retrieved
    * set (rel desc, original rank as the deterministic tie-break —
    * the standard retrieved-set convention, documented), and
    * nDCG = DCG/IDCG ∈ (0, 1].
    *
    * Portability: each position's gain is a fixed double tree on
    * integer (rel, position) — rounded-6, 1e6-scaled, and summed as
    * order-free integers (the r6-scaling trick); nDCG is one
    * integer-ratio division. Everything after the [[bm25TopK]]
    * top-k cut is a ≤ k-row frame, so the unpartitioned ideal-rank
    * window is k-bounded by construction — never a global sort.
    */
  def ndcgAtK(docs: DataFrame, idCol: String, textCol: String,
              queryTerms: Seq[String], k: Int,
              roundTo: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = (c: Column) => c.cast("double")
    val ranked = bm25TopK(docs, idCol, textCol, queryTerms, k)
    val words = docs.select(col(idCol).as("doc_id"),
        explode(split(normalize(col(textCol)), " ")).as("term"))
      .filter(length(col("term")) > 0)
    val rel = words.filter(col("term").isin(queryTerms: _*))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("term")).as("rel"))
    def gain(r: Column, pos: Column): Column =
      (pow(lit(2.0), d(r)) - lit(1.0)) /
        (log(d(pos) + lit(1.0)) / log(lit(2.0)))
    def s6(t: Column): Column = round(t * lit(1000000.0)).cast("long")
    ranked.join(rel, Seq("doc_id")) // every ranked doc matched ≥ 1 term
      .withColumn("__irank", row_number().over(
        Window.orderBy(col("rel").desc, col("rank"))))
      .withColumn("__d6", s6(gain(col("rel"), col("rank"))))
      .withColumn("__i6", s6(gain(col("rel"), col("__irank"))))
      .agg(count(lit(1)).as("n_ranked"),
        coalesce(sum(col("__d6")), lit(0L)).as("__ds"),
        coalesce(sum(col("__i6")), lit(0L)).as("__is"))
      .select(col("n_ranked"),
        (d(col("__ds")) / lit(1000000.0)).as("dcg"),
        (d(col("__is")) / lit(1000000.0)).as("idcg"),
        round(when(col("__is") > 0, d(col("__ds")) / d(col("__is"))),
          roundTo).as("ndcg"))
  }

  /** MRR + AP@k search-quality evaluation over the [[bm25TopK]]
    * ranking — the BINARY-relevance companions of [[ndcgAtK]]'s
    * graded gain (the classic retrieval scorecard: MRR answers "how
    * far down is the FIRST right answer", AP "how front-loaded are
    * ALL of them"): relevance = the doc contains EVERY query term
    * (strict-AND, engine-replayable — no human labels in the
    * sandbox), RR = 1/rank of the first relevant hit, AP@k =
    * Σ_{rel positions i} P@i / min(R, k) with P@i the cumulative
    * relevant count over rank and R the CORPUS-wide relevant total
    * (the standard truncated-AP denominator, so an unretrieved
    * relevant doc costs score).
    *
    * Portability: P@i is an integer ratio per position, r6-scaled
    * and integer-summed (the [[ndcgAtK]] discipline); everything
    * after the top-k cut is a ≤ k-row frame, so the unpartitioned
    * cumulative window is k-bounded by construction. The corpus
    * relevant count rides the SAME single aggregate via a tagged
    * union (no scalar cross join — the plan sweep stays
    * nested-loop-free). Returns ONE row; evaluate a query set by
    * unioning calls (queries are bounded literals, one bounded
    * subplan each).
    */
  def mapMrrAtK(docs: DataFrame, idCol: String, textCol: String,
                queryTerms: Seq[String], k: Int,
                roundTo: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = (c: Column) => c.cast("double")
    val ranked = bm25TopK(docs, idCol, textCol, queryTerms, k)
    val words = docs.select(col(idCol).as("doc_id"),
        explode(split(normalize(col(textCol)), " ")).as("term"))
      .filter(length(col("term")) > 0)
    val rel = words.filter(col("term").isin(queryTerms: _*))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("term")).as("__nt"))
      .filter(col("__nt") === queryTerms.size)
      .select(col("doc_id"))
    val byRank = Window.orderBy(col("rank"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val flagged = ranked
      .join(rel.withColumn("__hit", lit(1L)), Seq("doc_id"), "left")
      .withColumn("__rel", coalesce(col("__hit"), lit(0L)))
      .withColumn("__cum", sum(col("__rel")).over(byRank))
      .select(lit(1).as("__t"), col("rank").cast("long").as("__rank"),
        col("__rel"), col("__cum"))
    val corpus = rel.select(lit(0).as("__t"),
      lit(null).cast("long").as("__rank"), lit(null).cast("long").as("__rel"),
      lit(null).cast("long").as("__cum"))
    flagged.unionByName(corpus)
      .agg(
        sum(when(col("__t") === 1, 1L).otherwise(0L)).as("n_ranked"),
        sum(when(col("__t") === 0, 1L).otherwise(0L)).as("n_relevant"),
        coalesce(sum(when(col("__t") === 1, col("__rel"))), lit(0L))
          .as("n_rel_retrieved"),
        min(when(col("__t") === 1 && col("__rel") === 1, col("__rank")))
          .as("first_rel_rank"),
        coalesce(sum(when(col("__t") === 1 && col("__rel") === 1,
          round(d(col("__cum")) / d(col("__rank")) * lit(1000000.0))
            .cast("long"))), lit(0L)).as("__ap6"))
      .select(col("n_ranked"), col("n_relevant"), col("n_rel_retrieved"),
        col("first_rel_rank"),
        round(when(col("first_rel_rank").isNotNull,
          lit(1.0) / d(col("first_rel_rank"))), roundTo).as("mrr"),
        round(when(least(col("n_relevant"), lit(k.toLong)) > 0,
          (d(col("__ap6")) / lit(1000000.0))
            / d(least(col("n_relevant"), lit(k.toLong)))), roundTo).as("ap"))
  }

  /** Collocation extraction by pointwise mutual information (Church
    * & Hanks '90 — the "strongly associated adjacent word pairs"
    * statistic behind phrase detection à la word2vec's bigram pass):
    * PMI(a,b) = ln( p(a,b) / (p(a)·p(b)) ) with p(a,b) = c_ab/M over
    * adjacent bigrams and p(a) = c_a/N over unigrams; pairs below
    * `minCount` are cut first (PMI's known pathology — hapax pairs
    * score highest), then top-k by (rounded PMI desc, pair).
    *
    * Plan shape: one explode; bigrams via `lead` over (doc, pos) —
    * the per-doc window rides ONE corpus shuffle on doc_id; unigram
    * and bigram count frames are vocabulary-sized, their totals ride
    * window sums over those tiny frames; the PMI expression is a
    * fixed multiply/divide tree on integer counts (deterministic
    * IEEE both engines).
    */
  def collocations(docs: DataFrame, idCol: String, textCol: String,
                   minCount: Long = 5L, k: Int = 50,
                   roundTo: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0, "k must be positive")
    val toks = graft.Par.persistTracked(
      docs.select(col(idCol).as("doc_id"),
          posexplode(split(normalize(col(textCol)), " ")))
        .filter(length(col("col")) > 0)
        .select(col("doc_id"), col("pos"), col("col").as("term")))
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val pairs = toks
      .withColumn("next", lead(col("term"), 1).over(byDoc))
      .filter(col("next").isNotNull)
    val wAll = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val uni = toks.groupBy(col("term")).agg(count(lit(1)).as("c"))
      .withColumn("n_tok", sum(col("c")).over(wAll))
    val bi = pairs.groupBy(col("term").as("term_a"), col("next").as("term_b"))
      .agg(count(lit(1)).as("n_pair"))
      .withColumn("n_big", sum(col("n_pair")).over(wAll))
      .filter(col("n_pair") >= minCount)
    bi.join(uni.select(col("term").as("term_a"), col("c").as("__ca"),
        col("n_tok")), Seq("term_a"))
      .join(uni.select(col("term").as("term_b"), col("c").as("__cb")),
        Seq("term_b"))
      .withColumn("pmi", round(log(
        (col("n_pair").cast("double") * col("n_tok").cast("double")
          * col("n_tok").cast("double"))
        / (col("n_big").cast("double") * col("__ca").cast("double")
          * col("__cb").cast("double"))), roundTo))
      .select(col("term_a"), col("term_b"), col("n_pair"), col("pmi"))
      .orderBy(col("pmi").desc, col("term_a"), col("term_b"))
      .limit(k)
  }

  /** Maintained BM25 inverted-index frames: `postings (doc_id, term,
    * tf)` and `lens (doc_id, len)` — PER-DOC rows, so a daily batch
    * appends exactly its own rows and nothing corpus-sized ever
    * recomputes (`frames(b1) ∪ frames(b2) ≡ frames(b1 ∪ b2)` row for
    * row when batches partition the docs). Store postings BUCKETED
    * on `term` so query-time tf/df lookups read exchange-free; lens
    * is the integer (doc, len) table corpus stats derive from by
    * exact adds.
    */
  def bm25IndexFrames(docs: DataFrame, idCol: String,
                      textCol: String): (DataFrame, DataFrame) = {
    val words = docs.select(col(idCol).as("doc_id"),
        explode(split(normalize(col(textCol)), " ")).as("term"))
      .filter(length(col("term")) > 0)
    val cached = graft.Par.persistTracked(words)
    (cached.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf")),
      cached.groupBy(col("doc_id")).agg(count(lit(1)).as("len")))
  }

  /** Query the maintained index of [[bm25IndexFrames]]: the per-doc
    * query-term tf vector comes from the TERM-KEYED postings (the
    * only rows touched are the query terms' — delta-sized at any
    * corpus size), lengths and corpus stats from `lens`, and the
    * scoring tail is [[bm25TopK]]'s own — identical arithmetic, so a
    * maintained index answers exactly like a full re-scan.
    */
  def bm25TopKIndexed(postings: DataFrame, lens: DataFrame,
                      queryTerms: Seq[String], k: Int,
                      k1: Double = 1.2, b: Double = 0.75,
                      roundTo: Int = 6): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val tfCols = queryTerms.indices.map(i =>
      sum(when(col("term") === queryTerms(i), col("tf")).otherwise(lit(0L)))
        .as(s"tf_$i"))
    val perDocQ = postings
      .filter(col("term").isin(queryTerms.map(lit): _*))
      .groupBy(col("doc_id")).agg(tfCols.head, tfCols.tail: _*)
    val perDoc = lens.join(perDocQ, Seq("doc_id"), "left")
      .select(col("doc_id") +: col("len") +:
        queryTerms.indices.map(i =>
          coalesce(col(s"tf_$i"), lit(0L)).as(s"tf_$i")): _*)
    bm25ScoreTopK(perDoc, queryTerms, k, k1, b, roundTo)
  }

  /** The shared BM25 scoring tail: corpus stats from the per-doc
    * frame (exact-integer sums, single correctly-rounded divisions —
    * bit-identical across engines), per-term contributions summed in
    * FIXED index order.
    */
  private def bm25ScoreTopK(perDoc: DataFrame, queryTerms: Seq[String],
                            k: Int, k1: Double, b: Double,
                            roundTo: Int): DataFrame = {
    require(queryTerms.distinct == queryTerms, "queryTerms must be distinct")
    require(k > 0, "k must be positive")
    val dfCols = queryTerms.indices.map(i =>
      sum(when(col(s"tf_$i") > 0, lit(1L)).otherwise(lit(0L))).as(s"df_$i"))
    val stats = perDoc.agg(
      (sum(col("len")).cast("double") / count(lit(1)).cast("double")).as("avgdl"),
      (count(lit(1)).cast("double").as("nd") +: dfCols): _*)
    // per-term contributions summed in FIXED index order (left fold)
    // so the double accumulation order matches the oracle exactly
    val contrib = queryTerms.indices.map { i =>
      val tf = col(s"tf_$i").cast("double")
      val idf = log((col("nd") - col(s"df_$i").cast("double") + lit(0.5)) /
        (col(s"df_$i").cast("double") + lit(0.5)) + lit(1.0))
      when(col(s"tf_$i") > 0,
        idf * (tf * lit(k1 + 1.0)) /
          (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("len").cast("double") / col("avgdl"))))
        .otherwise(lit(0.0))
    }
    val score = contrib.reduceLeft(_ + _)
    val matched = perDoc.crossJoin(broadcast(stats))
      .filter(queryTerms.indices.map(i => col(s"tf_$i") > 0).reduceLeft(_ || _))
      .select(col("doc_id"), round(score, roundTo).as("score"))
    val topK = matched.orderBy(col("score").desc, col("doc_id").asc).limit(k)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc, col("doc_id").asc)
    topK.withColumn("rank", row_number().over(w))
  }

  // PII patterns chosen to parse identically in Java regex and
  // RE2-class engines (simple character classes, no lookaround).
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlPattern   = "https?://[^\\s]+"
  val Ipv4Pattern  = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  /** Redact emails, URLs, then IPv4 literals to typed placeholder
    * tokens — the pre-training scrub pass. Email runs FIRST (a URL
    * userinfo part would otherwise swallow it), then whole URLs, then
    * bare IPs; heuristic by design — a deterministic, codegen'd
    * regexp_replace chain, zero shuffle.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        UrlPattern, "<URL>"),
      Ipv4Pattern, "<IP>")

  /** Per-row PII hit counts (pre-redaction), for scrub audits. */
  def piiCounts(text: Column): Column = struct(
    size(regexp_extract_all(text, lit(EmailPattern), lit(0))).cast("long").as("n_emails"),
    size(regexp_extract_all(text, lit(UrlPattern), lit(0))).cast("long").as("n_urls"),
    size(regexp_extract_all(text, lit(Ipv4Pattern), lit(0))).cast("long").as("n_ips"))

  /** Zipf's-law fit over the top-`k` vocabulary: OLS of
    * `ln(frequency)` on `ln(rank)` — the one-row corpus-health
    * screen behind "is this scrape natural language or boilerplate
    * spam?" (natural corpora sit near slope −1, Zipf '49; machine-
    * generated or template-heavy corpora flatten or step). Output:
    * one row (n_terms, slope, intercept, r2).
    *
    * Scale shape: the vocabulary aggregation is [[topTerms]]'s
    * map-side-combined count; the rank window runs over the BOUNDED
    * top-k result (a TakeOrderedAndProject of ≤ k rows), never the
    * corpus — the same bounded-scalar discipline as the q15 max. The
    * OLS is computed from explicit sums with the textbook closed
    * form, duplicated verbatim in the oracle SQL, so cross-engine
    * disagreement is limited to float summation order — absorbed by
    * round(6) (the doc_surprisal precedent).
    */
  def zipfFit(docs: DataFrame, idCol: String, textCol: String,
              k: Int): DataFrame = {
    require(k >= 2, "k must be >= 2 (a one-point fit has no slope)")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("tf").desc, col("term"))
    val ranked = topTerms(docs, idCol, textCol, k)
      .withColumn("rank", row_number().over(w))
      .select(log(col("rank").cast("double")).as("x"),
        log(col("tf").cast("double")).as("y"))
    val s = ranked.agg(
      count(lit(1)).cast("double").as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("y") * col("y")).as("syy"))
    val dxx = col("n") * col("sxx") - col("sx") * col("sx")
    val dxy = col("n") * col("sxy") - col("sx") * col("sy")
    val dyy = col("n") * col("syy") - col("sy") * col("sy")
    s.select(
      col("n").cast("long").as("n_terms"),
      round(dxy / dxx, 6).as("slope"),
      round((col("sy") - (dxy / dxx) * col("sx")) / col("n"), 6).as("intercept"),
      round((dxy * dxy) / (dxx * dyy), 6).as("r2"))
  }

  /** Heaps'-law fit (Heaps '78; [[zipfFit]]'s vocabulary-GROWTH
    * companion — Zipf reads the frequency curve, Heaps reads how fast
    * NEW types keep arriving: V(n) ≈ K·n^β, natural text β ≈ 0.4-0.6;
    * a template-generated corpus saturates, β → 0): log-log OLS of
    * distinct-types-so-far on tokens-so-far, evaluated at `points`
    * evenly-spaced doc-id checkpoints.
    *
    * Scale shape — NO cumulative window over the corpus: a term's
    * first-occurrence doc (one term-keyed aggregate) makes
    * "types ≤ c" a COUNT over the vocabulary frame per checkpoint,
    * and "tokens ≤ c" a count over per-doc totals — both folded as
    * `points` conditional sums in ONE aggregate each (checkpoints
    * are integer literals c_j = ⌊maxId·j/points⌋ from one bounded
    * max() scalar). The OLS runs over ≤ points rows with the
    * [[zipfFit]] closed form; float-sum order across ≤ points values
    * is absorbed by round(6) (the zipfFit contract).
    */
  def heapsFit(docs: DataFrame, idCol: String, textCol: String,
               points: Int = 32): DataFrame = {
    require(points >= 2 && points <= 1024, "points in [2, 1024]")
    val spark = docs.sparkSession
    import spark.implicits._
    val words = graft.Par.persistTracked(
      docs.select(col(idCol).cast("long").as("__id"),
          explode(split(normalize(col(textCol)), " ")).as("term"))
        .filter(length(col("term")) > 0))
    val firstDoc = words.groupBy(col("term")).agg(min(col("__id")).as("__fd"))
    val perDoc = words.groupBy(col("__id")).agg(count(lit(1)).as("__tok"))
    val maxId = perDoc.agg(max(col("__id"))).head().getLong(0) // bounded
    val cps = (1 to points).map(j => maxId * j / points).distinct
    val typeSums = cps.map(c =>
      sum(when(col("__fd") <= c, 1L).otherwise(0L)).as(s"v_$c"))
    val tokSums = cps.map(c =>
      sum(when(col("__id") <= c, col("__tok")).otherwise(lit(0L))).as(s"n_$c"))
    val vRow = firstDoc.agg(typeSums.head, typeSums.tail: _*).head()
    val nRow = perDoc.agg(tokSums.head, tokSums.tail: _*).head()
    val pts = cps.indices.map(i => (nRow.getLong(i), vRow.getLong(i)))
      .filter { case (n, v) => n > 0 && v > 0 }
      .toDF("__n", "__v")
    val ranked = pts.select(log(col("__n").cast("double")).as("x"),
      log(col("__v").cast("double")).as("y"))
    val s = ranked.agg(
      count(lit(1)).cast("double").as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("y") * col("y")).as("syy"))
    val dxx = col("n") * col("sxx") - col("sx") * col("sx")
    val dxy = col("n") * col("sxy") - col("sx") * col("sy")
    val dyy = col("n") * col("syy") - col("sy") * col("sy")
    // degenerate fits guarded (a saturated corpus can zero dyy, a
    // single surviving checkpoint zeros dxx) — null, never a
    // divide-by-zero under ANSI
    // + 0.0 normalizes negative zero — DuckDB round() emits -0.0
    // where Spark emits 0.0 (the events_theilsen hash lesson)
    s.select(
      col("n").cast("long").as("n_points"),
      when(dxx =!= 0.0, round(dxy / dxx, 6) + lit(0.0)).as("beta"),
      when(dxx =!= 0.0,
        round((col("sy") - (dxy / dxx) * col("sx")) / col("n"), 6)
          + lit(0.0)).as("intercept"),
      when(dxx =!= 0.0 && dyy =!= 0.0,
        round((dxy * dxy) / (dxx * dyy), 6) + lit(0.0)).as("r2"))
  }

  /** Per-source Jensen–Shannon divergence from the corpus unigram
    * distribution (Lin '91) — the data-mixing diagnostic ("which
    * source is most atypical?") a weighted-mixing pipeline reads
    * before setting [[graft.operators.Sampling.mixSources]] weights;
    * symmetric and bounded ≤ ln 2, which the one-sided KL of
    * [[graft.operators.Quality.psi]]-style drift screens is not.
    *
    * JSD(P_s ‖ Q) = ½Σ p·ln(p/m) + ½Σ q·ln(q/m), m = (p+q)/2, with
    * Q the whole-corpus term distribution. Terms ABSENT from the
    * source (p = 0) collapse in closed form: each contributes
    * ½·q·ln 2, so their total is ½·ln 2·(1 − coverage_s) where
    * coverage_s = Σ_{t∈s} q_t — NO (source × vocabulary) grid is
    * ever built; the plan touches only (source, term) PRESENT pairs
    * plus one scalar per source.
    *
    * Portability: p, q, m are single divisions on exact integer
    * counts; each present-term contribution (and the one
    * absent-mass term) is rounded to 6 decimals, 1e6-scaled and
    * integer-summed order-free (the [[graft.operators.Quality
    * .chiSquareIndependence]] r6-scaling discipline — dq_mutual_info
    * precedent for ln()). Scale: one exploded-token aggregate to
    * (source, term), term-keyed join against the term totals, a
    * per-source fold — the vocab-sized frames never broadcast.
    */
  def sourceDivergence(docs: DataFrame, groupCol: String,
                       textCol: String): DataFrame = {
    val d = (c: Column) => c.cast("double")
    val st = graft.Par.persistTracked(
      docs.select(col(groupCol).as("__g"),
          explode(split(normalize(col(textCol)), " ")).as("term"))
        .filter(length(col("term")) > 0)
        .groupBy(col("__g"), col("term"))
        .agg(count(lit(1)).as("__cst")))
    val t = st.groupBy(col("term")).agg(sum(col("__cst")).as("__ct"))
    val gTot = st.groupBy(col("__g")).agg(sum(col("__cst")).as("__ns"))
    val nTot = t.agg(sum(col("__ct")).as("__n"))
    val p = d(col("__cst")) / d(col("__ns"))
    val q = d(col("__ct")) / d(col("__n"))
    val m = (p + q) / lit(2.0)
    val contrib6 = round((lit(0.5) * p * log(p / m)
      + lit(0.5) * q * log(q / m)) * lit(1000000.0)).cast("long")
    val perG = st.join(t, Seq("term"))
      .join(gTot, Seq("__g"))
      .crossJoin(broadcast(nTot))
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("n_terms"),
        sum(contrib6).as("__c6"),
        sum(col("__ct")).as("__cov"),
        max(col("__n")).as("__nn"))
    perG
      .withColumn("__a6", round(lit(0.5 * math.log(2.0))
        * (lit(1.0) - d(col("__cov")) / d(col("__nn")))
        * lit(1000000.0)).cast("long"))
      .select(col("__g").as(groupCol), col("n_terms"),
        round(d(col("__c6") + col("__a6")) / lit(1000000.0), 6).as("jsd"))
  }

  /** N-gram diversity per source (r14 wave 4) — the templated-corpus
    * screen self-BLEU approximates: distinct/total n-gram ratios at
    * n = 1, 2, 3 per corpus slice. A crawler loop or a mail-merge
    * source repeats the same trigrams endlessly, so its trigram
    * diversity collapses while word-level ratios still look normal
    * (the corpus-level sibling of the per-doc
    * [[ngramRepetition]]). Sub-n-word docs contribute their single
    * whole-text shingle (the [[shingles]] convention, replayed
    * identically in the oracle).
    *
    * Shape: one explode per n over the scan, one grouped
    * count + count-distinct per (source, n). The distinct side
    * shuffles one partial per distinct (source, n-gram) — the exact
    * [[topTerms]] class; at 100 TB swap in a per-source HLL for the
    * distinct term (the dq_profile_approx discipline) if the
    * vocabulary shuffle dominates.
    */
  def ngramDiversity(docs: DataFrame, srcCol: String, textCol: String,
                     ns: Seq[Int] = Seq(1, 2, 3),
                     roundTo: Int = 6): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 1), "ns must be positive")
    val d = (c: Column) => c.cast("double")
    val perN = ns.map { n =>
      docs.select(col(srcCol).as("source"), lit(n).as("n"),
        explode(shinglesWithDuplicates(col(textCol), n)).as("__g"))
    }.reduce(_ unionByName _)
    perN.groupBy(col("source"), col("n"))
      .agg(count(lit(1)).as("total_ngrams"),
        countDistinct(col("__g")).as("distinct_ngrams"))
      .select(col("source"), col("n").cast("long").as("n"),
        col("total_ngrams"), col("distinct_ngrams"),
        round(d(col("distinct_ngrams")) / d(col("total_ngrams")), roundTo)
          .as("diversity"))
  }

  /** Minimal HTML escaping for round-trip synthesis: `&` first so
    * escaping never double-fires, then the angle brackets. */
  def htmlEscape(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(c,
      "&", "&amp;"), "<", "&lt;"), ">", "&gt;")

  /** HTML → text extraction (r14) — the FIRST step of every
    * web-corpus curation pipeline (trafilatura/jusText's core
    * mechanics, reduced to the deterministic engine-portable
    * subset): script/style/comment blocks dropped WITH their
    * content, every remaining tag replaced by a space (block
    * boundaries must not glue words), the five standard entities
    * decoded (`&amp;` last, so `&amp;lt;` correctly yields `&lt;`),
    * whitespace collapsed. A fixed chain of codegen'd
    * `regexp_replace` — pure per-row map, scan-speed at 100 TB, and
    * every pattern is shared Java-regex/RE2 syntax so the chain
    * replays verbatim in the oracle engine.
    */
  def stripHtml(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]+>", " ")
    val e1 = regexp_replace(noTags, "&nbsp;", " ")
    val e2 = regexp_replace(e1, "&lt;", "<")
    val e3 = regexp_replace(e2, "&gt;", ">")
    val e4 = regexp_replace(e3, "&quot;", "\"")
    val e5 = regexp_replace(e4, "&#39;", "'")
    val e6 = regexp_replace(e5, "&amp;", "&")
    trim(regexp_replace(e6, "\\s+", " "))
  }

  /** Markdown → text extraction (r14) — the [[stripHtml]] sibling
    * for the README/docs slice of a web corpus: fenced code blocks
    * drop WITH content (code is not prose), inline code keeps its
    * content, images and links keep their alt/anchor text, ATX
    * headers / blockquote markers / list bullets / horizontal rules
    * drop, emphasis markers strip, whitespace collapses. A fixed
    * chain of codegen'd regexp_replace — per-row map, scan-speed.
    * This is the deterministic engine-portable subset: CommonMark's
    * corner cases (indented code, setext headers, nested emphasis,
    * reference links) need a real parser; screen-grade extraction is
    * what curation runs at 100 TB.
    */
  def stripMarkdown(md: Column): Column = {
    val noFence = regexp_replace(md, "(?s)```.*?```", " ")
    val noInline = regexp_replace(noFence, "`([^`]*)`", "$1")
    val noImg = regexp_replace(noInline, "!\\[([^\\]]*)\\]\\([^)]*\\)", "$1")
    val noLink = regexp_replace(noImg, "\\[([^\\]]*)\\]\\([^)]*\\)", "$1")
    val noHead = regexp_replace(noLink, "(?m)^#{1,6}[ \\t]*", "")
    val noQuote = regexp_replace(noHead, "(?m)^>[ \\t]?", "")
    val noBullet = regexp_replace(noQuote, "(?m)^[ \\t]*[-*+][ \\t]+", "")
    val noRule = regexp_replace(noBullet, "(?m)^(-{3,}|\\*{3,})[ \\t]*$", " ")
    val noEmph = regexp_replace(noRule, "[*_]{1,3}", "")
    trim(regexp_replace(noEmph, "\\s+", " "))
  }

  /** Mojibake (encoding-damage) screen (r14) — the UTF-8-read-as-
    * Latin-1/cp1252 double-decode every web crawl carries (ftfy's
    * target class): per doc, the count of the classic damage
    * sequences ("Ã©"-family two-byte smears, "â€™"-family three-byte
    * punctuation smears, "Â " no-break-space smear, U+FFFD
    * replacement chars) and a boolean verdict. One codegen'd
    * `regexp_count` of a literal alternation — per-row map,
    * scan-speed, byte-identical in any regex engine.
    */
  def mojibakeScan(text: Column): Column =
    regexp_count(text, lit(MojibakePattern)).cast("long")

  /** The literal damage-sequence alternation, shared with the oracle
    * SQL so both engines count the same set. */
  val MojibakePattern: String =
    "Ã[-¿]|â€[™œ¦“]|" +
      "Â |�"

  /** Deterministic damage SAMPLE for round-trip synthesis (the
    * multimodal discipline): appended to selected docs by the graded
    * key and replayed verbatim in the oracle SQL. Built from code
    * points so the sample and the pattern can never drift apart in
    * an editor: one two-byte smear (\u00c3\u00a9), three
    * punctuation smears, one NBSP smear, one replacement char.
    */
  val MojibakeSample: String =
    " caf\u00C3\u00A9 don\u00E2\u20AC\u2122t \u00E2\u20AC\u201Csmear\u00E2\u20AC\u009D \u00C2\u00A0x \uFFFD"

  /** Code-switching / mixed-language screen (r14) — the curation
    * signal [[langId]]'s argmax hides: a doc whose stopword hits
    * split across two languages (interleaved translations, quoted
    * foreign passages, boilerplate in a second tongue) gets a
    * confident argmax but poisons monolingual training. Per doc:
    * hits per language (the [[langId]] lists), the top and
    * second-best hit counts, how many languages hit at all, the
    * round-6 second/top ratio, and a `mixed` verdict (second within
    * 3× of top). Pure per-row array expressions over one scan —
    * zero shuffle, integer counts, engine-portable.
    */
  def langMix(docs: DataFrame, idCol: String, textCol: String,
              roundTo: Int = 6): DataFrame = {
    val langs = Seq("en" -> StopwordsEn, "fr" -> StopwordsFr,
      "de" -> StopwordsDe, "es" -> StopwordsEs, "zh" -> StopwordsZh)
    val hitCols = langs.map { case (l, ws) =>
      stopwordHits(col(textCol), ws).as(s"hits_$l") }
    val arr = array(langs.map { case (l, _) => col(s"hits_$l") }: _*)
    val sorted = sort_array(arr, asc = false)
    docs.select((col(idCol) +: hitCols): _*)
      .select(col(idCol),
        element_at(sorted, 1).as("top_hits"),
        element_at(sorted, 2).as("second_hits"),
        size(filter(arr, h => h > 0)).cast("long").as("n_langs_hit"))
      .select(col(idCol), col("top_hits"), col("second_hits"),
        col("n_langs_hit"),
        round(when(col("top_hits") > 0,
          col("second_hits").cast("double")
            / col("top_hits").cast("double")), roundTo).as("mix_ratio"),
        (col("top_hits") > 0
          && col("second_hits") * 3 >= col("top_hits")).as("mixed"))
  }

  /** Reciprocal-rank fusion of the BM25 and tf-idf rankings (r14;
    * Cormack, Clarke & Buettcher SIGIR '09 — the standard
    * zero-training hybrid-retrieval combiner): fused score =
    * Σ_rankers 1/(kRrf + rank), here as EXACT integers
    * (1000000 div (kRrf + rank), two bounded terms per doc — no
    * float accumulation anywhere), re-ranked by (score desc,
    * doc_id). Everything after the two top-k cuts is a ≤2k-row
    * frame, so the fusion window is k-bounded by construction —
    * never a global sort; at 100 TB the cost is the two rankers,
    * which stream their own index probes.
    *
    * Output: (rank, doc_id, rrf6) — rrf6 the 1e6-scaled integer
    * fused score.
    */
  def rrfFusion(docs: DataFrame, idCol: String, textCol: String,
                queryTerms: Seq[String], k: Int,
                kRrf: Int = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bm = bm25TopK(docs, idCol, textCol, queryTerms, k)
      .select(col("doc_id"), col("rank").as("__rb"))
    val tf = tfidfCosineTopK(docs, idCol, textCol, queryTerms, k)
      .select(col("doc_id"), col("rank").as("__rt"))
    bm.join(tf, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        (coalesce(expr(s"1000000 div ($kRrf + __rb)"), lit(0L))
          + coalesce(expr(s"1000000 div ($kRrf + __rt)"), lit(0L)))
          .as("rrf6"))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("rrf6").desc, col("doc_id"))).cast("long"))
      .select(col("rank"), col("doc_id"), col("rrf6"))
  }

  /** Tokenizer-fertility report per source (r14) — the
    * tokens-per-word and chars-per-token ratios a tokenizer team
    * watches per corpus slice: fertility spikes flag sources the
    * subword vocabulary serves badly (wrong language, code, OCR
    * noise), which inflate training cost per effective word. Counts
    * use the deterministic BPE-proxy [[tokenCountBpe]] (exact and
    * engine-portable, so the key hash-grades; swap the learned-table
    * [[Bpe.encodeCounts]] in production for true fertility). All
    * sums are integer (order-free); two round-6 divisions at the
    * end. One partial-agged exchange on the source key — scan speed
    * at 100 TB.
    *
    * Output: (source, n_docs, n_words, n_tokens, n_chars,
    * fertility, chars_per_token).
    */
  def tokenFertility(docs: DataFrame, srcCol: String,
                     textCol: String, roundTo: Int = 6): DataFrame = {
    val d = (c: Column) => c.cast("double")
    docs.select(col(srcCol).as("source"),
        tokenCountWs(col(textCol)).as("__w"),
        tokenCountBpe(col(textCol)).as("__t"),
        length(col(textCol)).cast("long").as("__c"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__w")).as("n_words"),
        sum(col("__t")).as("n_tokens"), sum(col("__c")).as("n_chars"))
      .select(col("source"), col("n_docs"), col("n_words"),
        col("n_tokens"), col("n_chars"),
        round(when(col("n_words") > 0,
          d(col("n_tokens")) / d(col("n_words"))), roundTo).as("fertility"),
        round(when(col("n_tokens") > 0,
          d(col("n_chars")) / d(col("n_tokens"))), roundTo)
          .as("chars_per_token"))
  }
}
