package graft.operators

import graft.Par
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Substring search over a document corpus — the pg_trgm pattern
  * (PostgreSQL's trigram GIN index) re-expressed for a lakehouse:
  * `text LIKE '%pattern%'` without scanning text.
  *
  * A full scan answers a substring query by decompressing and
  * walking EVERY document — at 100 TB that is the whole corpus
  * through the CPUs for one lookup. The trigram index inverts it:
  * any occurrence of `pattern` inside a document contains every
  * 3-char substring of `pattern` verbatim, so documents missing even
  * one pattern trigram in their posting lists cannot match (no false
  * negatives, the pigeonhole of [[Dedup.editDistance]] in substring
  * form). The search touches only the pattern's ≤ |pattern|−2
  * posting lists, intersects them by document id, and verifies the
  * few survivors with one exact `contains` over their fetched text.
  *
  * Postings store 8-byte xxhash64 gram keys (the [[Dedup]] hashing
  * discipline — df counting and probes on longs, never 3-char
  * strings; a 64-bit collision can only add a false CANDIDATE, which
  * the verify removes). Store the posting frame bucketed on `gram`
  * and the probe join never shuffles the index; the text fetch joins
  * by id (bucket the corpus on id for the same property).
  */
object Search {

  /** Distinct (id, gram) char-trigram postings for a corpus. Case
    * and whitespace are preserved — search semantics are EXACT
    * substring containment, matching SQL `contains`/`LIKE '%p%'`.
    */
  def trigramFrame(docs: DataFrame, idCol: String,
                   textCol: String): DataFrame =
    Par.widen(docs.select(col(idCol), col(textCol)), idCol)
      .select(col(idCol).as("id"),
        explode(transform(
          sequence(lit(1), greatest(length(col(textCol)) - 2, lit(0))),
          i => col(textCol).substr(i, lit(3)))).as("g"))
      .select(col("id"), xxhash64(col("g")).as("gram"))
      .distinct()

  /** Scan baseline: one pass, exact containment. The oracle shape —
    * and the honest fallback for patterns shorter than 3 chars,
    * which have no trigram to look up.
    */
  def substringScan(docs: DataFrame, idCol: String, textCol: String,
                    pattern: String): DataFrame =
    docs.filter(col(textCol).contains(pattern)).select(col(idCol).as("id"))

  /** Index-accelerated substring search: candidates = ids whose
    * posting lists contain ALL of the pattern's distinct trigrams,
    * verified with exact `contains` on the candidates' text only.
    * ≡ [[substringScan]] row-for-row; patterns shorter than 3 chars
    * fall back to the scan (documented — nothing to index them by).
    */
  def substringSearch(index: DataFrame, docs: DataFrame,
                      idCol: String, textCol: String,
                      pattern: String): DataFrame = {
    if (pattern.length < 3) substringScan(docs, idCol, textCol, pattern)
    else {
      val spark = docs.sparkSession
      import spark.implicits._
      val grams = pattern.sliding(3).toSeq.distinct
      val k = grams.length
      // hash the pattern's grams with the ENGINE's own xxhash64 (a
      // k-row local job) so index keys and probe keys can never drift
      val hashes = grams.toDF("g").select(xxhash64(col("g")))
        .collect().map(_.getLong(0))
      // k tiny posting-list reads; the IN-list pushes into the
      // (bucketed) index scan as a pruning filter
      val cand = index
        .filter(col("gram").isin(hashes: _*))
        .groupBy(col("id"))
        .agg(count(lit(1)).as("__hits"))
        .filter(col("__hits") === k)
        .select(col("id"))
      // text fetched for candidates only
      docs.select(col(idCol).as("id"), col(textCol).as("__t"))
        .join(cand, Seq("id"))
        .filter(col("__t").contains(pattern))
        .select(col("id"))
    }
  }

  /** Batch multi-pattern search — the realistic shape ("flag every
    * document containing any of these N banned phrases"): ALL
    * patterns probe the posting index in ONE pass. The probe side is
    * the exploded (pattern, gram) set — N·|p| rows, broadcast-sized
    * by definition — so the index is read once however many patterns
    * there are, where N separate [[substringSearch]] calls would scan
    * it N times. Per-(pattern, doc) posting intersection, then one
    * exact `contains` verify per candidate pair. Patterns shorter
    * than 3 chars are rejected (no trigram to index them by — route
    * them through [[substringScan]]).
    *
    * @return (pattern, id) — every document containing each pattern
    */
  def multiSearch(index: DataFrame, docs: DataFrame,
                  idCol: String, textCol: String,
                  patterns: Seq[String]): DataFrame = {
    require(patterns.nonEmpty, "multiSearch needs at least one pattern")
    require(patterns.forall(_.length >= 3),
      "patterns must be at least 3 chars (use substringScan below that)")
    require(patterns.distinct == patterns, "patterns must be distinct")
    val spark = docs.sparkSession
    import spark.implicits._
    val probe = patterns.flatMap(p =>
        p.sliding(3).toSeq.distinct.map(g => (p, g)))
      .toDF("pat", "g")
      .select(col("pat"), xxhash64(col("g")).as("gram"))
    val need = probe.groupBy(col("pat")).agg(count(lit(1)).as("__k"))
    val cand = index.join(broadcast(probe), Seq("gram"))
      .groupBy(col("pat"), col("id"))
      .agg(count(lit(1)).as("__hits"))
      .join(broadcast(need), Seq("pat"))
      .filter(col("__hits") === col("__k"))
      .select(col("pat"), col("id"))
    docs.select(col(idCol).as("id"), col(textCol).as("__t"))
      .join(cand, Seq("id"))
      .filter(col("__t").contains(col("pat")))
      .select(col("pat").as("pattern"), col("id"))
  }

  /** Positional postings `(id, term, pos)` — the Lucene positional
    * index: 1-based token positions over [[graft.functions.Text
    * .normalize]]d whitespace tokens. PER-DOC rows, so a daily batch
    * appends exactly its own rows (`frame(b1) ∪ frame(b2) ≡
    * frame(b1 ∪ b2)` when batches partition the docs) and a
    * maintained index answers phrase queries exactly like a fresh
    * build. Store bucketed on `term` and the phrase probe's IN-filter
    * prunes to the phrase's posting lists without an exchange.
    */
  def positionalFrame(docs: DataFrame, idCol: String,
                      textCol: String): DataFrame =
    Par.widen(docs.select(col(idCol), col(textCol)), idCol)
      .select(col(idCol).as("id"),
        posexplode(split(graft.functions.Text.normalize(col(textCol)), " ")))
      .filter(length(col("col")) > 0)
      .select(col("id"), col("col").as("term"),
        (col("pos") + 1).cast("long").as("pos"))

  /** Phrase query over [[positionalFrame]] — the Lucene PhraseQuery
    * adjacency intersect: token i of the phrase must sit at
    * `anchor + i`, so each posting row votes for `anchor = pos − i`
    * and an anchor collecting all k votes is a match. Only the
    * phrase's ≤ k posting lists are read (the IN-list pushes into the
    * bucketed index scan); the vote count groups posting-sized rows,
    * never the corpus. `(id, anchor, i)` is unique by construction
    * ((id, pos) is unique per doc), so `count(*) = k` ⟺ every phrase
    * slot matched — repeated phrase terms and OVERLAPPING occurrences
    * ("table table table" matches "table table" twice) fall out
    * correctly.
    *
    * @return (id, n_matches, first_pos) per matching doc — first_pos
    *         is the 1-based token index of the earliest match
    */
  def phraseSearch(index: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phraseSearch needs at least one term")
    val spark = index.sparkSession
    import spark.implicits._
    val terms = phrase.map(_.toLowerCase)
    val k = terms.length
    val probe = terms.zipWithIndex.toDF("term", "i")
    index
      .filter(col("term").isin(terms.distinct.map(lit): _*))
      .join(broadcast(probe), Seq("term"))
      .select(col("id"), (col("pos") - col("i")).as("anchor"))
      .groupBy(col("id"), col("anchor"))
      .agg(count(lit(1)).as("__hits"))
      .filter(col("__hits") === k && col("anchor") >= 1)
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_matches"), min(col("anchor")).as("first_pos"))
  }

  /** Ordered PROXIMITY search over [[positionalFrame]] — "t1 before
    * t2 within `window` tokens" (the Lucene SpanNearQuery/slop idea,
    * restricted to the ordered two-term form; phrase adjacency is
    * the window=1 special case, graded separately). The naive form
    * joins the two posting lists per doc and filters — per-doc
    * quadratic in term frequency. This is the [[graft.operators
    * .RangeJoin]] bucket trick in 1-D token space: positions bucket
    * by `window`, the t1 side replicates to its own and the NEXT
    * bucket, and any qualifying pair (0 < p2 − p1 ≤ window) meets in
    * exactly ONE bucket (p2's own — floor(p2/w) ∈ {floor(p1/w),
    * floor(p1/w)+1}), so the join is a plain equi-join on
    * (id, bucket) with no duplicate pairs and candidate mass bounded
    * by per-bucket occupancy, never tf².
    *
    * @return (id, n_matches, first_pos) — pair count and the
    *         earliest qualifying t1 position, 1-based
    */
  def proximitySearch(index: DataFrame, t1: String, t2: String,
                      window: Long): DataFrame = {
    require(window >= 1, "window must be >= 1 token")
    val a = index.filter(col("term") === t1.toLowerCase)
      .select(col("id"), col("pos").as("p1"),
        explode(array(floor(col("pos") / window),
          floor(col("pos") / window) + 1)).as("__b"))
    val b = index.filter(col("term") === t2.toLowerCase)
      .select(col("id"), col("pos").as("p2"),
        floor(col("pos") / window).as("__b"))
    a.join(b, Seq("id", "__b"))
      .filter(col("p2") > col("p1") && col("p2") - col("p1") <= window)
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_matches"), min(col("p1")).as("first_pos"))
  }

  /** Batch multi-phrase search — the [[multiSearch]] shape at the
    * token level: ALL phrases probe the positional index in ONE pass
    * (the exploded (phrase, slot, term) probe is broadcast-sized by
    * definition, so the index is read once however many phrases the
    * ban list holds). Per-(phrase, id, anchor) votes need the
    * PHRASE's own slot count, joined from the tiny per-phrase-k
    * frame; `(phrase, id, anchor, slot)` stays unique by the
    * [[phraseSearch]] argument, so `count(*)` is the vote.
    *
    * @return (pattern, id, n_matches, first_pos) — pattern is the
    *         lowercased phrase joined by single spaces
    */
  def multiPhraseSearch(index: DataFrame,
                        phrases: Seq[Seq[String]]): DataFrame = {
    require(phrases.nonEmpty, "multiPhraseSearch needs at least one phrase")
    val spark = index.sparkSession
    import spark.implicits._
    val normed = phrases.map(_.map(_.toLowerCase))
    require(normed.map(_.mkString(" ")).distinct.size == normed.size,
      "phrases must be distinct")
    val probe = normed.flatMap { p =>
      val label = p.mkString(" ")
      p.zipWithIndex.map { case (t, i) => (label, i, t) }
    }.toDF("pattern", "i", "term")
    val need = normed.map(p => (p.mkString(" "), p.length))
      .toDF("pattern", "__k")
    val terms = normed.flatten.distinct
    index
      .filter(col("term").isin(terms.map(lit): _*))
      .join(broadcast(probe), Seq("term"))
      .select(col("pattern"), col("id"), (col("pos") - col("i")).as("anchor"))
      .groupBy(col("pattern"), col("id"), col("anchor"))
      .agg(count(lit(1)).as("__hits"))
      .join(broadcast(need), Seq("pattern"))
      .filter(col("__hits") === col("__k") && col("anchor") >= 1)
      .groupBy(col("pattern"), col("id"))
      .agg(count(lit(1)).as("n_matches"), min(col("anchor")).as("first_pos"))
  }

  /** BM25 ranked retrieval (r8-w4) — the substring family finds
    * documents that CONTAIN; this ranks documents that are ABOUT:
    * Okapi BM25 (Robertson & Walker '94, the Lucene/Elasticsearch
    * default) over whitespace terms,
    *
    *   score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·|d|/avg)),
    *   idf(t)   = ln( (N − df + 0.5)/(df + 0.5) + 1 )   (Lucene's
    *              shifted form — never negative for common terms).
    *
    * Plan shape: the query's terms FILTER the exploded token stream
    * BEFORE any aggregation (an IN over ≤ |query| literals, pushed to
    * the scan side of the shuffle), so tf/df frames are
    * posting-sized, not corpus-sized; doc lengths aggregate once from
    * the same stream pre-filter (one extra corpus-wide agg — the
    * length norm needs every doc's length, cacheable as a stored
    * stat at 100 TB); N and avg len ride a 1-row frame joined on a
    * constant key (broadcast hash join, never a nested loop). Top-k
    * by (score desc, id) via one final sort of the ≤ |candidates|
    * scored rows. Tokenization is the [[graft.functions.Text
    * .normalize]] discipline, so the whole score replays in SQL.
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           query: Seq[String], topK: Int = 10,
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(query.nonEmpty, "bm25 needs at least one query term")
    val terms = query.map(_.toLowerCase).distinct
    val base = Par.widen(docs.select(col(idCol), col(textCol)), idCol)
    // doc length = whitespace token count, a per-row regex — NOT an
    // explode+groupBy over every token (the first cut cached the full
    // token stream to derive lengths: a corpus-sized shuffle and
    // cache for what one scan expression computes). Docs with zero
    // tokens carry no terms and are excluded from N/avgdl, matching
    // the exploded definition.
    val lens = Par.persistTracked(
      base.select(col(idCol).as("id"),
          graft.functions.Text.tokenCountWs(col(textCol)).as("dl"))
        .filter(col("dl") > 0))
    // N and avg doc length to the driver as two scalars (a constant-
    // key 1-row join constant-folds into a nested loop — the psiDrift
    // lesson); at 100 TB these are stored corpus stats anyway
    val statsRow = lens.agg(count(lit(1)).as("n"),
      (sum(col("dl")).cast("double") / count(lit(1)).cast("double"))
        .as("avgdl")).head
    val n = statsRow.getLong(0)
    val avgdl = statsRow.getDouble(1)
    val hits = base
      .select(col(idCol).as("id"),
        explode(split(graft.functions.Text.normalize(col(textCol)), " "))
          .as("term"))
      .filter(col("term").isin(terms.map(lit): _*))
    val tf = hits.groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), Seq("term"))
      .join(lens, Seq("id"))
      .withColumn("__idf",
        log((lit(n.toDouble) - col("df").cast("double") + 0.5) /
          (col("df").cast("double") + 0.5) + 1))
      .withColumn("__contrib",
        col("__idf") * (col("tf").cast("double") * lit(k1 + 1)) /
          (col("tf").cast("double") +
            lit(k1) * (lit(1 - b) + lit(b) * col("dl").cast("double") / lit(avgdl))))
      .groupBy(col("id"))
      // round(4): the per-term contributions sum in engine order (the
      // doc_surprisal cross-engine double-sum discipline); ranking and
      // the top-k cut both use the ROUNDED score, ties to the lower id
      .agg(round(sum(col("__contrib")), 4).as("score"),
        count(lit(1)).as("n_terms"))
      .orderBy(col("score").desc, col("id"))
      .limit(topK)
  }
}
