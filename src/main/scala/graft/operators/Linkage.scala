package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record linkage — the blocking + pairwise-scoring half of entity
  * resolution (Fellegi & Sunter '69 framing; the candidate-pair
  * generation every dedup-by-similarity system runs before
  * clustering).
  *
  * The naive form is an O(n²) cross join; BLOCKING makes it
  * tractable: only records sharing a cheap deterministic key (a name
  * token, a phonetic code, a zip prefix) are compared, turning the
  * cross join into an equi-join on the block key — per-block
  * quadratic, corpus-linear overall when blocks stay bounded. Recall
  * loss is explicit and by design: pairs whose block keys differ are
  * never compared (run several blocking passes with different keys
  * and union the candidates to tighten recall — each pass is this
  * same operator).
  *
  * At 100 TB the shuffle is one hash exchange on the block key; a
  * mega-block is the known failure mode (quadratic inside one
  * reducer) — cap it upstream by splitting hot blocks on a secondary
  * key. The edit-distance filter uses Spark's thresholded
  * `levenshtein(l, r, max)` which abandons a pair as soon as the
  * running distance exceeds `max` — O(max·len) per pair, not
  * O(len²).
  */
object Linkage {

  /** Candidate pairs within blocks: `(id_a, id_b, dist)` for every
    * unordered pair sharing `blockCol` with edit distance ≤
    * `maxDist` (exact duplicates — dist 0 — included; `id_a < id_b`
    * canonicalizes the pair). Feed the pairs to
    * [[Dedup.connectedComponents]] for entity clustering.
    */
  def blockedFuzzyPairs(df: DataFrame, idCol: String, nameCol: String,
                        blockCol: Column, maxDist: Int): DataFrame = {
    require(maxDist >= 0, "maxDist must be non-negative")
    val a = df.select(col(idCol).as("id_a"), col(nameCol).as("__na"),
      blockCol.as("__blk"))
    val b = df.select(col(idCol).as("id_b"), col(nameCol).as("__nb"),
      blockCol.as("__blk"))
    a.join(b, Seq("__blk"))
      .filter(col("id_a") < col("id_b"))
      // thresholded levenshtein: -1 the moment the bound is exceeded
      .withColumn("dist", levenshtein(col("__na"), col("__nb"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("dist"))
  }
}
