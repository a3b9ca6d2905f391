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
}
