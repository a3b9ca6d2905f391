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
  * reducer) — [[blockedFuzzyPairs]] caps it structurally: blocks
  * above `hotBlockThreshold` split on length bands (a PRUNE — lev ≥
  * |Δlen| means non-adjacent bands never match) and a pair-grid salt
  * spreads each band's residual quadratic work across reducers (the
  * [[Skew.saltedJoin]] discipline applied to a self-join). The
  * edit-distance filter uses Spark's thresholded
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
    *
    * MEGA-BLOCK escape hatch (r11 verdict ask): blocks larger than
    * `hotBlockThreshold` rows are split on a SECONDARY key instead
    * of landing per-block-quadratic on one reducer:
    *
    *  - LENGTH BANDS of width maxDist+1: lev(a,b) ≥ |Δlen|, so a
    *    matching pair's bands differ by at most one — each left row
    *    joins only its own band against right-side replicas in
    *    band−1/band/band+1. Non-adjacent-band pairs (|Δlen| >
    *    maxDist, the length prefilter's prey) are never GENERATED,
    *    so a hot block's candidate space drops from m² to
    *    Σ_k m_k·(m_{k−1}+m_k+m_{k+1}).
    *  - A PAIR-GRID salt inside each band (the [[Skew.saltedJoin]]
    *    discipline applied to a self-join): each row draws a
    *    deterministic id-hash salt s ∈ [0, salts); a LEFT copy
    *    occupies grid row s ({(s,t) : t}), a RIGHT copy grid column
    *    s ({(t,s) : t}), so an ordered pairing meets in exactly ONE
    *    cell, (s_left, s_right) — equal salts included — and a
    *    same-length mega-block's residual quadratic work spreads
    *    over salts² reducers instead of one. Salting never changes
    *    the pair MULTISET — bands prune, salts distribute.
    *
    * Replication cost (HOT rows only — the hot-key frame is
    * heavy-hitter-small and broadcasts, as in saltedJoin): left
    * salts×, right 3·salts×. Cold blocks take the plain single
    * equi-join, byte-identical to the unsplit form. The output pair
    * SET is exactly the unsplit one on either path — LinkageSpec
    * drives a crafted mega-block through both and checks equality
    * against a driver-side brute force.
    */
  def blockedFuzzyPairs(df: DataFrame, idCol: String, nameCol: String,
                        blockCol: Column, maxDist: Int,
                        hotBlockThreshold: Long = 100000L,
                        salts: Int = 8): DataFrame = {
    require(maxDist >= 0, "maxDist must be non-negative")
    require(hotBlockThreshold >= 1, "hotBlockThreshold must be positive")
    require(salts >= 1, "salts must be positive")
    val w = maxDist + 1
    val base = df.select(col(idCol).as("__id"), col(nameCol).as("__n"),
      blockCol.as("__blk"))
    // heavy-hitter block keys: ≤ n/hotBlockThreshold of them by
    // definition → one partial-agged aggregate, broadcast to tag
    val hot = base.groupBy(col("__blk"))
      .agg(count(lit(1)).as("__bn"))
      .filter(col("__bn") > hotBlockThreshold)
      .select(col("__blk")).withColumn("__hot", lit(1))
    // widen (r15): a narrow scan otherwise pins the whole candidate
    // emission + comparator pass to one task (see [[jaroWinklerPairs]])
    val tagged = graft.Par.widen(
        base.join(broadcast(hot), Seq("__blk"), "left"), "__blk")
      .withColumn("__hot", coalesce(col("__hot"), lit(0)))
      .withColumn("__band",
        when(col("__hot") === 1,
          floor(length(col("__n")) / w).cast("long")).otherwise(lit(0L)))
      .withColumn("__salt",
        when(col("__hot") === 1,
          pmod(xxhash64(col("__id")), lit(salts.toLong))).otherwise(lit(0L)))
    // the S grid cells a salted row participates in — ASYMMETRIC by
    // side: a left row with salt s occupies row-s of the grid
    // {(s, t) : t}, a right row with salt s occupies column-s
    // {(t, s) : t}, so an (a, b) pairing meets in EXACTLY one cell,
    // (s_a, s_b) — including when s_a = s_b. (The earlier symmetric
    // min/max grid made equal-salt pairs meet in all `salts` cells
    // containing s → duplicated output rows; r12 ADVICE.) Cold rows
    // pin cell (0,0) on both sides so they meet exactly once (plain
    // path). Both row orientations of an unordered pair appear once
    // each; the id_a < id_b filter keeps exactly one.
    def cells(saltC: Column, hotC: Column, leftSide: Boolean): Column =
      when(hotC === 1,
        array((0 until salts).map { t =>
          val tC = lit(t.toLong)
          if (leftSide) struct(saltC.as("i"), tC.as("j"))
          else struct(tC.as("i"), saltC.as("j"))
        }: _*))
        .otherwise(array(struct(lit(0L).as("i"), lit(0L).as("j"))))
    val a = tagged
      .withColumn("__cell",
        explode(cells(col("__salt"), col("__hot"), leftSide = true)))
      .select(col("__id").as("id_a"), col("__n").as("__na"),
        col("__blk"), col("__band").as("__kb"), col("__cell"))
    val b = tagged
      .withColumn("__kb", explode(
        when(col("__hot") === 1,
          array(col("__band") - 1, col("__band"), col("__band") + 1))
          .otherwise(array(lit(0L)))))
      .withColumn("__cell",
        explode(cells(col("__salt"), col("__hot"), leftSide = false)))
      .select(col("__id").as("id_b"), col("__n").as("__nb"),
        col("__blk"), col("__kb"), col("__cell"))
    a.join(b, Seq("__blk", "__kb", "__cell"))
      .filter(col("id_a") < col("id_b"))
      // length prefilter: lev(a,b) ≥ |len(a)−len(b)|, so a pair whose
      // lengths differ by more than the bound can never match — a
      // pure prune (identical output) that skips the O(len·maxDist)
      // DP on most of the block's pair space (35 s → ~13 s at sf0.1);
      // on the hot path band adjacency already pruned |Δband| ≥ 2
      .filter(abs(length(col("__na")) - length(col("__nb"))) <= maxDist)
      // thresholded levenshtein: -1 the moment the bound is exceeded
      .withColumn("dist", levenshtein(col("__na"), col("__nb"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  /** Candidate pairs within blocks scored by JARO–WINKLER similarity
    * (`(id_a, id_b, sim)` for every unordered in-block pair with
    * round-6 similarity ≥ `minSim`) — the similarity-space companion
    * of [[blockedFuzzyPairs]]: edit distance counts ALL slips
    * equally, Jaro–Winkler weights agreement near the FRONT of the
    * string, which is where human-entered names disagree least (the
    * census-linkage comparator; Winkler '90). Same blocking contract:
    * only pairs sharing `blockCol` are compared, recall loss explicit.
    *
    * The comparator is the native codegen'd
    * [[graft.functions.JaroWinkler]] expression (pinned bit-for-bit
    * against the reference RapidFuzz/DuckDB formulation), so the
    * whole candidate scan stays inside one whole-stage-codegen'd
    * join stage — no UDF boxing on the quadratic hot path. The
    * graded similarity is ROUND-6 on both compare sides (the
    * iqrOutliers fence discipline): the keep decision can never
    * hinge on sub-µ drift.
    *
    * Scale: one hash exchange on the block key. For `minSim` > 0.8
    * a LENGTH-RATIO prune runs before the comparator: m ≤ min(|a|,|b|)
    * bounds jaro ≤ (2 + min/max)/3 and the ≤4-char prefix boost
    * lifts it at most to 0.8 + 0.2·min/max, so pairs with
    * min/max < 5·(minSim − 1e-4) − 4 can never reach the threshold
    * (the 1e-4 slack keeps the prune clear of the round-6 boundary)
    * — a pure prune, output identical. Mega-blocks: split on a
    * secondary key upstream or reuse the [[blockedFuzzyPairs]]
    * pair-grid salt; the length-BAND trick does not transfer (JW has
    * no |Δlen| lower bound).
    */
  def jaroWinklerPairs(df: DataFrame, idCol: String, nameCol: String,
                       blockCol: Column, minSim: Double): DataFrame = {
    require(minSim > 0 && minSim <= 1, "minSim in (0, 1]")
    val base = df.select(col(idCol).as("__id"), col(nameCol).as("__n"),
      blockCol.as("__blk"))
    // widen the streamed side (r15): a small block table scans as one
    // partition, the block join broadcasts the other side, and the
    // whole quadratic comparator pass lands in a single task —
    // profiled as one multi-second 1-task stage; the keyed widen
    // spreads it across the cluster (no-op when already wide)
    val a = graft.Par.widen(
      base.select(col("__id").as("id_a"), col("__n").as("__na"),
        col("__blk")), "__blk")
    val b = base.select(col("__id").as("id_b"), col("__n").as("__nb"),
      col("__blk"))
    val joined = a.join(b, Seq("__blk")).filter(col("id_a") < col("id_b"))
    val pruned =
      if (minSim > 0.8) {
        val ratio = lit(5.0 * (minSim - 1e-4) - 4.0)
        joined.filter(
          least(length(col("__na")), length(col("__nb"))).cast("double")
            >= ratio * greatest(length(col("__na")), length(col("__nb")))
              .cast("double"))
      } else joined
    pruned
      .withColumn("sim", round(
        graft.functions.StringSim.jaroWinkler(col("__na"), col("__nb")), 6))
      .filter(col("sim") >= lit(minSim))
      .select(col("id_a"), col("id_b"), col("sim"))
  }

  /** Per-attribute agreement comparator for [[fellegiSunter]]. */
  sealed trait FsComparator { def column: String }
  object FsComparator {
    /** Agree ⟺ values exactly equal (nulls never agree). */
    final case class Exact(column: String) extends FsComparator
    /** Agree ⟺ edit distance ≤ maxDist (thresholded levenshtein). */
    final case class Edit(column: String, maxDist: Int) extends FsComparator
    /** Agree ⟺ |a − b| ≤ tol, compared in exact decimal(12,2) (the
      * dec2 money discipline — tol must be a clean 2-decimal). */
    final case class Tolerance(column: String, tol: BigDecimal)
      extends FsComparator
  }

  /** Fellegi–Sunter probabilistic record matching (Fellegi & Sunter,
    * JASA '69 — the decision-theoretic half of entity resolution;
    * [[blockedFuzzyPairs]] is its candidate generator, this is the
    * SCORER): each attribute comparison contributes
    * log₂-style match evidence — `ln(m/u)` on agreement,
    * `ln((1−m)/(1−u))` on disagreement, where m = P(agree | match)
    * and u = P(agree | non-match) are the caller's error model — and
    * the pair's total score lands it in one of the three classical
    * bands: ≥ upper → `link`, ≤ lower → `non_link`, between →
    * `possible` (clerical review).
    *
    * Engine-exact by the [[graft.operators.Quality.sprtConstants6]]
    * discipline: the per-attribute weights are 1e6-scaled integer
    * LITERALS (rounded once, driver-side), agreement predicates are
    * exact (string equality, integer thresholded levenshtein,
    * decimal tolerance), so the pair score is an exact integer sum;
    * the exported double is one division by 1e6. Nulls never agree —
    * a missing attribute contributes disagreement evidence,
    * deterministically.
    *
    * Scale: candidates come from ONE block-key equi-join (the
    * blocking discipline — recall loss explicit, run multiple passes
    * and union); scoring is a codegen'd per-row expression chain. A
    * mega-block is [[blockedFuzzyPairs]]'s hot-block case — reuse
    * its splitter to generate candidates, then score the pair frame
    * with the same expression.
    */
  private def fsValidate(attrs: Seq[(FsComparator, Double, Double)],
                         upper: Double, lower: Double): Unit = {
    require(attrs.nonEmpty, "fellegiSunter needs at least one attribute")
    require(upper >= lower, "upper band must be >= lower band")
    attrs.foreach { case (_, m, u) =>
      require(m > 0 && m < 1 && u > 0 && u < 1 && m > u,
        s"need 0 < u < m < 1 per attribute, got (m=$m, u=$u)")
    }
  }

  private def fsSide(records: DataFrame, idCol: String, blockCol: Column,
                     cols: Seq[String], idAs: String,
                     pfx: String): DataFrame =
    records.select(
      (col(idCol).as(idAs) +: cols.map(c => col(c).as(pfx + c))) :+
        blockCol.as("__blk"): _*)

  /** Score a candidate frame carrying `__a_*`/`__b_*` attribute
    * pairs; ids are emitted CANONICALIZED (least, greatest) — every
    * agreement predicate is symmetric, so swapping sides never
    * changes the score.
    */
  private def fsScore(cand: DataFrame,
                      attrs: Seq[(FsComparator, Double, Double)],
                      upper: Double, lower: Double): DataFrame = {
    import FsComparator._
    def agreeExpr(cmp: FsComparator): Column = cmp match {
      case Exact(c) => col(s"__a_$c") === col(s"__b_$c")
      case Edit(c, dmax) =>
        levenshtein(col(s"__a_$c"), col(s"__b_$c"), dmax) >= 0
      case Tolerance(c, tol) =>
        abs(col(s"__a_$c").cast("decimal(12,2)")
          - col(s"__b_$c").cast("decimal(12,2)"))
          .leq(lit(tol.setScale(2).toString).cast("decimal(12,2)"))
    }
    val terms = attrs.map { case (cmp, m, u) =>
      val wAgree = math.round(math.log(m / u) * 1e6)
      val wDis = math.round(math.log((1 - m) / (1 - u)) * 1e6)
      (agreeExpr(cmp), wAgree, wDis)
    }
    val score6 = terms.map { case (agr, wA, wD) =>
      when(agr, lit(wA)).otherwise(lit(wD)) }.reduce(_ + _)
    val nAgree = terms.map { case (agr, _, _) =>
      when(agr, lit(1)).otherwise(lit(0)) }.reduce(_ + _)
    val u6 = math.round(upper * 1e6)
    val l6 = math.round(lower * 1e6)
    cand
      .withColumn("__s6", score6)
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"),
        nAgree.as("n_agree"),
        (col("__s6").cast("double") / lit(1e6)).as("score"),
        when(col("__s6") >= lit(u6), lit("link"))
          .when(col("__s6") <= lit(l6), lit("non_link"))
          .otherwise(lit("possible")).as("decision"))
  }

  def fellegiSunter(records: DataFrame, idCol: String, blockCol: Column,
                    attrs: Seq[(FsComparator, Double, Double)],
                    upper: Double, lower: Double): DataFrame = {
    fsValidate(attrs, upper, lower)
    val cols = attrs.map(_._1.column).distinct
    // widen the streamed side (r15): see [[jaroWinklerPairs]] — the
    // scoring pass otherwise runs in the narrow scan's single task
    val a = graft.Par.widen(
      fsSide(records, idCol, blockCol, cols, "id_a", "__a_"), "__blk")
    val b = fsSide(records, idCol, blockCol, cols, "id_b", "__b_")
    fsScore(a.join(b, Seq("__blk")).filter(col("id_a") < col("id_b")),
      attrs, upper, lower)
  }

  /** Incremental [[fellegiSunter]] — the daily scoring DOOR of the
    * dedup incremental family: only pairs TOUCHING the new batch are
    * scored (stored × batch within blocks, plus intra-batch), so a
    * day's cost is batch-proportional while the output equals the
    * full self-join restricted to batch-touching pairs (the
    * dedup_minhash_incr equivalence shape — identical blocking,
    * identical scoring expression, ids canonicalized). Caller
    * contract: `stored` and `batch` ids are disjoint (the replay-
    * with-dropDuplicates discipline if redelivery is possible).
    */
  def fellegiSunterIncremental(stored: DataFrame, batch: DataFrame,
                               idCol: String, blockCol: Column,
                               attrs: Seq[(FsComparator, Double, Double)],
                               upper: Double, lower: Double): DataFrame = {
    fsValidate(attrs, upper, lower)
    val cols = attrs.map(_._1.column).distinct
    // widen the streamed sides (r15): see [[jaroWinklerPairs]]
    val aStored = graft.Par.widen(
      fsSide(stored, idCol, blockCol, cols, "id_a", "__a_"), "__blk")
    val aBatch = graft.Par.widen(
      fsSide(batch, idCol, blockCol, cols, "id_a", "__a_"), "__blk")
    val bBatch = fsSide(batch, idCol, blockCol, cols, "id_b", "__b_")
    val cross = aStored.join(bBatch, Seq("__blk"))
    val intra = aBatch.join(bBatch, Seq("__blk"))
      .filter(col("id_a") < col("id_b"))
    fsScore(cross.unionByName(intra), attrs, upper, lower)
  }

  /** Per-attribute survivorship rule for [[goldenRecord]]. Every
    * rule is deterministic including its tie-break, so the golden
    * record is a pure function of the cluster's rows.
    */
  sealed trait Survivorship
  object Survivorship {
    /** Most frequent non-null value; ties to the SMALLEST value. */
    case object MostFrequent extends Survivorship
    /** Longest non-null string; ties to the smallest value. */
    case object Longest extends Survivorship
    /** Greatest non-null value. */
    case object Max extends Survivorship
    /** Smallest non-null value. */
    case object Min extends Survivorship
    /** Value of the row with the greatest `orderCol` (ties to the
      * greatest id — ids are unique, so this is total). */
    final case class MostRecent(orderCol: String) extends Survivorship
  }

  /** Golden-record survivorship — the MERGE half of entity
    * resolution ([[blockedFuzzyPairs]] finds the candidates,
    * [[Dedup.connectedComponents]] clusters them; this builds the
    * one record per entity downstream consumers join to): each
    * attribute survives independently under its declared rule
    * (longest name, most frequent category, cheapest price, most
    * recent status…), so the golden record is usually a COMPOSITE no
    * single source row equals — the standard MDM survivorship
    * semantics.
    *
    * `clusters` is the `(id, comp)` frame from connectedComponents;
    * unpaired records fall back to their own id (singleton
    * clusters). Nulls never survive over values (per-attribute
    * null-guarded structs, so min/max skip them); all-null
    * attributes stay null.
    *
    * Scale shape: simple rules (min/max/longest/most-recent) fold in
    * ONE cluster-keyed aggregation via the engine's min-struct
    * argmax discipline (`min(struct(-len, v))` = longest-then-
    * smallest — order-free, map-side combinable); each MostFrequent
    * attribute costs one extra (cluster, value)-count aggregation
    * joined back (value-domain-sized frames). No windows, no
    * per-cluster sorts — clusters of any size fold associatively.
    */
  def goldenRecord(records: DataFrame, idCol: String,
                   clusters: DataFrame,
                   rules: Seq[(String, Survivorship)],
                   minMembers: Int = 1): DataFrame = {
    import Survivorship._
    require(rules.nonEmpty, "goldenRecord needs at least one rule")
    val base = records.join(
        clusters.select(col("id").as(idCol), col("comp")), Seq(idCol), "left")
      .withColumn("comp", coalesce(col("comp"), col(idCol)))
    // one aggregation for every non-frequency rule
    val simpleAggs = rules.flatMap {
      case (c, Longest) => Some(
        min(when(col(c).isNotNull,
          struct((-length(col(c))).as("k"), col(c).as("v"))))("v").as(c))
      case (c, Max) => Some(max(col(c)).as(c))
      case (c, Min) => Some(min(col(c)).as(c))
      case (c, MostRecent(ts)) => Some(
        max(when(col(c).isNotNull,
          struct(col(ts).as("k"), col(idCol).as("i"), col(c).as("v"))))("v")
          .as(c))
      case (_, MostFrequent) => None
    }
    val aggs = count(lit(1)).as("n_members") +: simpleAggs
    val golden = base.groupBy(col("comp"))
      .agg(aggs.head, aggs.tail: _*)
      .filter(col("n_members") >= minMembers)
    // each frequency rule: (comp, value) counts → min-struct argmax
    val withFreq = rules.collect { case (c, MostFrequent) => c }
      .foldLeft(golden) { (acc, c) =>
        val freq = base.filter(col(c).isNotNull)
          .groupBy(col("comp"), col(c))
          .agg(count(lit(1)).as("__cnt"))
          .groupBy(col("comp"))
          .agg(min(struct((-col("__cnt")).as("k"), col(c).as("v")))("v")
            .as(c))
        acc.join(freq, Seq("comp"), "left")
      }
    val ordered = Seq(col("comp"), col("n_members")) ++
      rules.map { case (c, _) => col(c) }
    withFreq.select(ordered: _*)
  }
}
