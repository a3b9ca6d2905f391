package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic splitting / sampling for training-data pipelines.
  *
  * The training-pipeline requirement is STABILITY: the same row lands
  * in the same split tomorrow, on a different cluster, and after a
  * repartition — otherwise test data leaks into training over reruns.
  * Spark's `randomSplit`/`sample`/`stat.sampleBy` are seeded per
  * PARTITION, so their assignment changes with partitioning; these
  * operators hash a KEY instead (pure per-row codegen'd expressions,
  * zero shuffle, scan-speed at 100 TB).
  */
object Sampling {

  private val Buckets = 1000000L

  private def labelChain(bucket: Column, fractions: Seq[(String, Double)],
                         buckets: Long): Column = {
    require(fractions.nonEmpty, "at least one split required")
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      "fractions must sum to 1")
    val cuts = fractions.map(_._2).scanLeft(0.0)(_ + _).tail
    val chain = fractions.zip(cuts).init.foldLeft(Option.empty[Column]) {
      case (acc, ((label, _), cut)) =>
        val cond = bucket < lit(math.round(cut * buckets))
        Some(acc.fold(when(cond, lit(label)))(_.when(cond, lit(label))))
    }
    chain.fold(lit(fractions.head._1))(_.otherwise(lit(fractions.last._1)))
  }

  /** Assign every row a split label (e.g. train/val/test) from the
    * seeded hash of its key: stable across runs, partitioning, and
    * cluster size. Different seeds give independent splits (for
    * k-fold-style resampling).
    */
  def hashSplit(df: DataFrame, idCol: String,
                fractions: Seq[(String, Double)], seed: Long = 42L): DataFrame =
    df.withColumn("split",
      labelChain(pmod(xxhash64(col(idCol), lit(seed)), lit(Buckets)),
        fractions, Buckets))

  /** Modulo variant on a NUMERIC key — bit-portable to any SQL engine
    * (the correctness oracle for [[hashSplit]]'s assignment logic;
    * coarse `buckets` keep consecutive ids spread across splits).
    * Only as uniform as the key's residues; hashSplit is the default.
    */
  def modSplit(df: DataFrame, idCol: String,
               fractions: Seq[(String, Double)], buckets: Long = 100L): DataFrame =
    df.withColumn("split",
      labelChain(pmod(col(idCol).cast("long"), lit(buckets)), fractions, buckets))

  /** Leakage-safe split: near-dup CLUSTERS never straddle splits. A
    * per-document split after deduplication still leaks when near-dup
    * SURVIVOR pairs land on opposite sides of train/val (Lee et al.
    * '22 measure exactly this inflation), so the split key here is
    * the document's transitive-cluster label
    * ([[Dedup.connectedComponents]] over the supplied near-dup
    * pairs — min id of the cluster), falling back to the row's own id
    * for unclustered docs. Same modulo assignment chain as
    * [[modSplit]] (bit-portable); swap in the hash chain for
    * production skew-resistance. One left join + the components
    * rounds — nothing beyond the pair graph is shuffled.
    */
  def leakageSafeSplit(df: DataFrame, idCol: String, pairs: DataFrame,
                       fractions: Seq[(String, Double)],
                       idA: String = "id_a", idB: String = "id_b",
                       buckets: Long = 100L): DataFrame = {
    val comps = Dedup.connectedComponents(pairs, idA, idB)
      .select(col("id").as(idCol), col("comp"))
    val keyed = df.join(comps, Seq(idCol), "left")
      .withColumn("__gk", coalesce(col("comp"), col(idCol)))
    modSplit(keyed, "__gk", fractions, buckets).drop("__gk", "comp")
  }

  /** Deterministic per-stratum subsampling: keep each row iff its
    * key-hash bucket falls below its stratum's fraction. The
    * hash-threshold form keeps EXACTLY the same rows under any
    * partitioning (unlike `stat.sampleBy`), and a stratum missing
    * from `fractions` is dropped entirely — the downsample-the-
    * majority-class primitive.
    */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       fractions: Map[String, Double],
                       seed: Long = 42L): DataFrame = {
    val bucket = pmod(xxhash64(col(idCol), lit(seed)), lit(Buckets))
    val thresholds = fractions.foldLeft(lit(0L)) { case (acc, (stratum, f)) =>
      when(col(stratumCol) === stratum, lit(math.round(f * Buckets))).otherwise(acc)
    }
    df.filter(bucket < thresholds)
  }

  /** Weighted sample of exactly n rows, inclusion probability
    * approximately proportional to `weightCol` — sequential Poisson
    * sampling (Ohlsson, "Sequential Poisson sampling", J. Official
    * Statistics 1998): each row gets rank variable ξ = u/w with u a
    * deterministic uniform derived from `xxhash64(id, seed)`, and the
    * sample is the n SMALLEST ξ. The PPS primitive for curation
    * ("sample documents proportional to quality/length") with the
    * stability contract of every sampler here: ξ is a pure function
    * of (id, seed, weight), so membership survives repartitioning,
    * reruns, and cluster changes.
    *
    * Every arithmetic step is cross-engine exact: u = (h >>> 11) ·
    * 2⁻⁵³ (the 53-bit logical shift is `(h >> 11) & (2⁵³−1)` on
    * signed SQL integers; the scale is a power of two, so the
    * multiply is exact), and ξ = u/w is one correctly-rounded IEEE
    * division — so an external engine replays the full RANKING, not
    * just membership. Scale shape = [[stratifiedTopN]]: zero-shuffle
    * bounded-heap partition scan (≤ n candidates per partition), then
    * one ≤ n·P-row ranking, sampled ids broadcast back. Rows with
    * null or non-positive weight are never sampled.
    */
  def weightedSampleN(df: DataFrame, idCol: String, weightCol: String,
                      n: Int, seed: Long = 42L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n > 0, "n must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    implicit val ord: Ordering[(Double, Long)] = Ordering.Tuple2[Double, Long]
    val cand = df
      .filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .select(sPoissonXi(idCol, weightCol, seed).as("xi"),
        col(idCol).cast("long").as("id"))
      .as[(Double, Long)]
      .mapPartitions { it =>
        val heap = scala.collection.mutable.PriorityQueue.empty[(Double, Long)]
        it.foreach { t =>
          if (heap.size < n) heap.enqueue(t)
          else if (ord.lt(t, heap.head)) { heap.dequeue(); heap.enqueue(t) }
        }
        heap.iterator
      }
      .toDF("xi", "id")
    val ranked = cand
      .withColumn("rank", row_number().over(
        Window.partitionBy(lit(0)).orderBy(col("xi").asc, col("id").asc)))
      .filter(col("rank") <= n)
      .select(col("id").as("__sid"), col("rank"))
    df.join(broadcast(ranked), col(idCol).cast("long") === col("__sid"))
      .drop("__sid")
  }

  /** Incremental [[weightedSampleN]] — PPS sample maintenance at
    * delta cost: "the n smallest ξ" is an associative, idempotent
    * reduction and ξ recomputes from (id, weight) — both carried by
    * the sampled rows — so the updated sample is the n smallest over
    * (stored sample ∪ batch), with the batch pass the zero-shuffle
    * bounded-heap scan and the merge ranking ≤ 2n rows. The fold
    * equals the full run over the merged corpus (SamplingSpec),
    * giving a drifting corpus a standing PPS sample without rescans.
    * `sample` must carry the same columns as `batch` (a previous
    * fold's `rank` is ignored and recomputed).
    */
  def weightedSampleNIncremental(sample: DataFrame, batch: DataFrame,
                                 idCol: String, weightCol: String,
                                 n: Int, seed: Long = 42L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cand = weightedSampleN(batch, idCol, weightCol, n, seed).drop("rank")
    val prev = if (sample.columns.contains("rank")) sample.drop("rank") else sample
    // the merge input is ≤ 2n rows, so the final ranking is ONE plain
    // window — recursing into the full sampler here would compose
    // three same-shape sampler plans in one query, which trips
    // Spark's relation deduplication when the inputs constant-fold to
    // local relations (observed under AQE: batch rows duplicated);
    // localCheckpoint cuts the lineage so the ranking query contains
    // no sampler subplan at all, and stops re-running both samplers
    // on every downstream action besides
    // dropDuplicates on the id: a row present in BOTH the stored
    // sample and the batch (at-least-once redelivery, a replayed day)
    // must count once — rows with one id are identical by the sampler
    // contract, so any copy survives; this is what makes the fold
    // idempotent, not just associative
    val merged = prev.unionByName(cand).dropDuplicates(Seq(idCol))
      .localCheckpoint()
    merged
      .withColumn("rank", row_number().over(
        Window.partitionBy(lit(0)).orderBy(
          sPoissonXi(idCol, weightCol, seed).asc, col(idCol).cast("long").asc)))
      .filter(col("rank") <= n)
  }

  /** The sequential-Poisson rank variable ξ = u/w (see
    * [[weightedSampleN]] for the bit-portability argument).
    */
  private def sPoissonXi(idCol: String, weightCol: String,
                         seed: Long): Column =
    shiftrightunsigned(xxhash64(col(idCol), lit(seed)), 11)
      .cast("double") * lit(1.0 / 9007199254740992.0) /
      col(weightCol).cast("double")

  /** Per-stratum [[weightedSampleN]] — "the best-weighted n docs per
    * language, PPS": each stratum keeps its n smallest ξ = u/w,
    * completing the sampler matrix (exact-n × uniform/weighted ×
    * global/stratified). Same skew-safe shape as [[stratifiedTopN]]:
    * one zero-shuffle bounded-heap scan (≤ n candidates per
    * stratum × partition — a plain per-stratum window would put a
    * whole language on one reducer), a candidates-only ranking, the
    * sampled ids broadcast back. Same bit-portable ξ as the global
    * form, so an external engine replays the per-stratum ranking
    * exactly. Rows with null or non-positive weight are never
    * sampled.
    */
  def weightedSampleNPerStratum(df: DataFrame, idCol: String,
                                stratumCol: String, weightCol: String,
                                n: Int, seed: Long = 42L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n > 0, "n must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    implicit val ord: Ordering[(Double, Long)] = Ordering.Tuple2[Double, Long]
    val cand = df
      .filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .select(col(stratumCol).cast("string").as("s"),
        sPoissonXi(idCol, weightCol, seed).as("xi"),
        col(idCol).cast("long").as("id"))
      .as[(String, Double, Long)]
      .mapPartitions { it =>
        val heaps = scala.collection.mutable.Map
          .empty[String, scala.collection.mutable.PriorityQueue[(Double, Long)]]
        it.foreach { case (s, xi, id) =>
          val heap = heaps.getOrElseUpdate(s,
            scala.collection.mutable.PriorityQueue.empty[(Double, Long)])
          if (heap.size < n) heap.enqueue((xi, id))
          else if (ord.lt((xi, id), heap.head)) {
            heap.dequeue(); heap.enqueue((xi, id))
          }
        }
        heaps.iterator.flatMap { case (s, heap) =>
          heap.iterator.map { case (xi, id) => (s, xi, id) }
        }
      }
      .toDF("s", "xi", "id")
    val ranked = cand
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("s")).orderBy(col("xi").asc, col("id").asc)))
      .filter(col("rank") <= n)
      .select(col("id").as("__sid"), col("rank"))
    df.join(broadcast(ranked), col(idCol).cast("long") === col("__sid"))
      .drop("__sid")
  }

  /** EXACTLY min(n, |stratum|) rows per stratum, deterministically —
    * the fixed-BUDGET companion to [[stratifiedSample]]'s fractions
    * ("take 10k docs per language"): each stratum keeps its n
    * lowest-`xxhash64(id, seed)` rows, so the draw is uniform,
    * reproducible under reruns / repartitioning / cluster size, and
    * STABLE under corpus growth (a new row displaces at most the
    * stratum's current cutoff row).
    *
    * Skew-safe and shuffle-free where it counts: a single
    * `row_number` window per stratum would funnel a whole stratum
    * through ONE reducer (a 40-billion-row language on one task at
    * 100 TB). Phase 1 instead scans each input partition once with a
    * bounded max-heap per stratum (memory n·strata, the
    * [[graft.functions.Text.topTermsApprox]] pattern) — candidates
    * leaving the scan number ≤ n per (stratum × partition). Phase 2
    * ranks those candidates with the window — its input is
    * n·partitions rows per stratum, not the stratum. No qualifying
    * row is lost (a global top-n row is top-n in its own partition),
    * and a survivor's candidate rank equals its global rank (every
    * row ordered before it also survives) — proven against the naive
    * single-window form in SamplingSpec. The sampled ids then
    * broadcast back onto the input scan to recover all columns
    * (sample budgets are broadcast-sized by definition).
    *
    * `idCol` must be numeric (cast to long for the heap); ties on the
    * hash break by id, so the output is a function of the data alone.
    * Output: the input columns + `rank` (1-based within stratum).
    */
  def stratifiedTopN(df: DataFrame, idCol: String, stratumCol: String,
                     n: Int, seed: Long = 42L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n > 0, "n must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    implicit val ord: Ordering[(Long, Long)] = Ordering.Tuple2[Long, Long]
    val cand = df
      .select(col(stratumCol).cast("string").as("s"),
        xxhash64(col(idCol), lit(seed)).as("h"),
        col(idCol).cast("long").as("id"))
      .as[(String, Long, Long)]
      .mapPartitions { it =>
        val heaps = scala.collection.mutable.Map
          .empty[String, scala.collection.mutable.PriorityQueue[(Long, Long)]]
        it.foreach { case (s, h, id) =>
          val heap = heaps.getOrElseUpdate(s,
            scala.collection.mutable.PriorityQueue.empty[(Long, Long)])
          if (heap.size < n) heap.enqueue((h, id))
          else if (ord.lt((h, id), heap.head)) { heap.dequeue(); heap.enqueue((h, id)) }
        }
        heaps.iterator.flatMap { case (s, heap) =>
          heap.iterator.map { case (h, id) => (s, h, id) }
        }
      }
      .toDF("s", "h", "id")
    val ranked = cand
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("s")).orderBy(col("h").asc, col("id").asc)))
      .filter(col("rank") <= n)
      .select(col("id").as("__sid"), col("rank"))
    df.join(broadcast(ranked), col(idCol).cast("long") === col("__sid"))
      .drop("__sid")
  }

  /** Incremental [[stratifiedTopN]] — sample maintenance at delta
    * cost: fold a new batch into yesterday's per-stratum sample
    * WITHOUT rescanning the corpus. "The n lowest-hash rows" is an
    * associative, idempotent reduction, so the updated sample is
    * top-n over (stored sample ∪ batch top-n candidates); and because
    * the ranking hash is a function of the id, the state is just the
    * sampled ROWS — nothing extra to store or invalidate. Inputs are
    * the keeper state (≤ n rows per stratum) and the batch alone; the
    * batch pass is [[stratifiedTopN]]'s zero-shuffle scan, and the
    * merge window sees ≤ 2n rows per stratum. SamplingSpec proves the
    * two-day fold equals the full run over the merged corpus —
    * including displacement (a new low-hash row evicting yesterday's
    * cutoff row) and brand-new strata.
    *
    * `sample` must carry the same columns as `batch` (the `rank`
    * column from a previous fold is ignored and recomputed).
    */
  def stratifiedTopNIncremental(sample: DataFrame, batch: DataFrame,
                                idCol: String, stratumCol: String,
                                n: Int, seed: Long = 42L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cand = stratifiedTopN(batch, idCol, stratumCol, n, seed).drop("rank")
    val prev = if (sample.columns.contains("rank")) sample.drop("rank") else sample
    prev.unionByName(cand)
      .withColumn("__h", xxhash64(col(idCol), lit(seed)))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col(stratumCol))
          .orderBy(col("__h").asc, col(idCol).asc)))
      .filter(col("rank") <= n)
      .drop("__h")
  }

  /** Greedy token-BUDGET selection — the corpus-assembly primitive
    * ("fill 15T tokens with the best documents"): the selected set is
    * the maximal PREFIX of the (scoreCol desc, idCol asc)-ordered
    * corpus whose running `tokenCol` sum stays ≤ budget. Deterministic
    * (ties break by id) and monotone (tokens ≥ 0 ⟹ the prefix is
    * exactly the rows whose running total ≤ budget).
    *
    * Scale path: the naive form is a running-sum window over a GLOBAL
    * order — one reducer owning the corpus. Instead scores are
    * bucketed (`floor(score·10^scale)` — order-preserving), per-bucket
    * token totals aggregate map-side to one row per bucket, and a
    * driver-side prefix walk over that tiny table (≤ score-range·10^
    * scale rows) splits buckets into: fully-accepted (above the
    * boundary), fully-rejected (below), and THE boundary bucket —
    * only its rows (1/buckets of the corpus) pay the ordered cumsum
    * window, seeded with the accepted buckets' token total. Proven
    * equal to the naive global window in SamplingSpec; the graded
    * oracle replays the naive form over the full corpus.
    */
  def selectBudget(df: DataFrame, idCol: String, tokenCol: String,
                   scoreCol: String, budget: Long,
                   scale: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget >= 0, "budget must be non-negative")
    val withB = df.withColumn("__b",
      floor(col(scoreCol) * pow(lit(10.0), lit(scale))).cast("long"))
    val perBucket = withB.groupBy(col("__b"))
      .agg(sum(col(tokenCol).cast("long")).as("__t"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(-_._1)
    var cum = 0L
    var boundary = Option.empty[Long] // first bucket that doesn't fully fit
    perBucket.foreach { case (bv, t) =>
      if (boundary.isEmpty) {
        if (cum + t <= budget) cum += t else boundary = Some(bv)
      }
    }
    boundary match {
      case None => df // the whole corpus fits
      case Some(bb) =>
        val acceptedFull = withB.filter(col("__b") > bb)
        // only the boundary bucket pays the single-task ordered window
        val w = Window.orderBy(col(scoreCol).desc, col(idCol).asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val boundaryPart = withB.filter(col("__b") === bb)
          .withColumn("__cum", sum(col(tokenCol).cast("long")).over(w))
          .filter(col("__cum") + lit(cum) <= lit(budget))
          .drop("__cum")
        acceptedFull.unionByName(boundaryPart).drop("__b")
    }
  }

  /** Keep the TOP `frac` of each group by score — "the best 30% of
    * every domain": group quota k_g = ceil(frac·n_g), selected = the
    * k_g highest-(scoreCol, −idCol) rows of each group (ties break to
    * the lower id, so the cut is deterministic).
    *
    * Skew-safe the same way [[selectBudget]] is: a per-group rank
    * window puts a whole domain on one reducer, so scores are
    * bucketed order-preservingly (`floor(score·10^scale)`), per-
    * (group, bucket) counts aggregate map-side to a tiny table, a
    * driver walk finds each group's boundary bucket (buckets above it
    * are accepted wholesale), and only boundary-bucket rows — 1/
    * buckets of each group — pay the rank window. Proven equal to
    * the naive per-group window in SamplingSpec; the graded oracle
    * replays the naive form.
    */
  def topFracPerGroup(df: DataFrame, idCol: String, groupCol: String,
                      scoreCol: String, frac: Double,
                      scale: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(frac >= 0.0 && frac <= 1.0, "frac must be in [0, 1]")
    val withB = df.withColumn("__b",
      floor(col(scoreCol) * pow(lit(10.0), lit(scale))).cast("long"))
    // tiny: one row per (group, score bucket)
    val counts = withB.groupBy(col(groupCol).as("__g"), col("__b"))
      .agg(count(lit(1)).as("__c"))
      .collect().map(r => (r.get(0), r.getLong(1), r.getLong(2)))
    // per group: quota, the boundary bucket, and how many of its rows
    // the higher buckets already consumed
    val plans = counts.groupBy(_._1).map { case (g, rows) =>
      val quota = math.ceil(frac * rows.map(_._3).sum).toLong
      var cum = 0L
      var boundary = Option.empty[(Long, Long)] // (bucket, offsetBefore)
      rows.sortBy(-_._2).foreach { case (_, b, c) =>
        if (boundary.isEmpty && cum + c > quota) boundary = Some((b, cum))
        else if (boundary.isEmpty) cum += c
      }
      (g, boundary, quota)
    }.toSeq
    val spark = df.sparkSession
    import spark.implicits._
    // group keys travel as strings with a sentinel for NULL groups
    // (a null join key would silently drop the whole group)
    def gkey(g: Any): String = if (g == null) "" + Character.MIN_VALUE + "null" else g.toString
    // groups whose boundary exists: rows strictly above it are in;
    // groups without one (quota >= n_g) accept everything
    val fullMin = plans.map { case (g, b, _) =>
      (gkey(g), b.map(_._1).getOrElse(Long.MinValue)) }
      .toDF("__g", "__minb")
    val boundaries = plans.collect { case (g, Some((b, off)), quota) =>
      (gkey(g), b, quota - off) }.toDF("__g", "__bb", "__rem")
    val keyed = withB.withColumn("__g",
      coalesce(col(groupCol).cast("string"),
        lit("" + Character.MIN_VALUE + "null")))
    val acceptedFull = keyed
      .join(broadcast(fullMin), Seq("__g"))
      .filter(col("__b") > col("__minb"))
      .drop("__minb")
    // only boundary-bucket rows pay the rank window, per group
    val w = Window.partitionBy(col("__g"))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    val boundaryPart = keyed
      .join(broadcast(boundaries), Seq("__g"))
      .filter(col("__b") === col("__bb"))
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") <= col("__rem"))
      .drop("__bb", "__rem", "__r")
    acceptedFull.unionByName(boundaryPart).drop("__g", "__b")
  }

  /** Proportional low-discrepancy interleave — "shuffle the corpus so
    * the source mixture is LOCALLY uniform": training runs that stream
    * a corpus in order want every window of the stream to carry each
    * domain at its global proportion (a plain global hash-shuffle only
    * achieves this in expectation; a sorted-by-source corpus fails it
    * catastrophically). Each row gets the deterministic position key
    * `pos = (r_g − 0.5) / n_g` where `r_g` is the row's 1-based rank
    * within its group ordered by `(xxhash64(id, seed), id)` and `n_g`
    * the group size — the classic stride sequence: any prefix covering
    * `pos < x` contains `floor(x·n_g + 0.5)` rows of group g, i.e.
    * within ±0.5 rows of the exact proportional share, for EVERY
    * prefix. Within a group the hash order is a deterministic shuffle.
    * `pos` is one exact-integer subtraction and one correctly-rounded
    * IEEE division, so it is bit-identical in any engine — ties across
    * groups break by (group, id).
    *
    * Scale shape: the naive per-group rank window puts a whole domain
    * on ONE reducer. Instead the hash space is cut into 256 order-
    * preserving range buckets (`h >> 56`), per-(group, bucket) counts
    * aggregate map-side into a tiny frame (groups × ≤256 rows) whose
    * windows compute each bucket's rank offset and the group sizes,
    * and the rank window runs per (group, bucket) — 256-way parallel
    * per group, each slice ~1/256 of the group. The result is SORTED
    * by (pos, group, id) via Spark's range-partitioned sort (no global
    * row_number — consumers that need a dense global index add it at
    * write time per shard). SamplingSpec proves bucketed ≡ naive and
    * the ±1 prefix-proportionality bound.
    */
  def interleaveByGroup(df: DataFrame, idCol: String, groupCol: String,
                        seed: Long = 42L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nullKey = "" + Character.MIN_VALUE + "null"
    val keyed = df
      .withColumn("__g", coalesce(col(groupCol).cast("string"), lit(nullKey)))
      .withColumn("__h", xxhash64(col(idCol), lit(seed)))
      .withColumn("__b", shiftright(col("__h"), 56))
    val counts = keyed.groupBy(col("__g"), col("__b")).agg(count(lit(1)).as("__c"))
    val wOff = Window.partitionBy(col("__g")).orderBy(col("__b").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wN = Window.partitionBy(col("__g"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val plan = counts
      .withColumn("__off", coalesce(sum(col("__c")).over(wOff), lit(0L)))
      .withColumn("__n", sum(col("__c")).over(wN))
      .select(col("__g"), col("__b"), col("__off"), col("__n"))
    val wRank = Window.partitionBy(col("__g"), col("__b"))
      .orderBy(col("__h").asc, col(idCol).asc)
    keyed.join(broadcast(plan), Seq("__g", "__b"))
      .withColumn("__r", col("__off") + row_number().over(wRank).cast("long"))
      .withColumn("pos",
        (col("__r").cast("double") - lit(0.5)) / col("__n").cast("double"))
      .orderBy(col("pos").asc, col("__g").asc, col(idCol).asc)
      .drop("__h", "__b", "__off", "__r")
      .withColumnRenamed("__g", "group_key")
      .withColumnRenamed("__n", "group_size")
  }

  /** Domain-temperature resampling — the standard training-mix
    * primitive (multilingual / multi-source corpora): sampling
    * weights per group g are `w_g ∝ N_g^alpha`, so `alpha=1` keeps
    * natural proportions and `alpha=0` equalizes groups; a
    * materialized subset of ~`targetRows` total rows then needs
    * per-group keep probability `p_g = min(1, targetRows·w_g/Σw/N_g)`
    * (downsample-only — no row is duplicated).
    *
    * Fully distributed: group sizes come from ONE aggregate whose
    * cardinality is the number of DOMAINS (tiny — it broadcasts back
    * onto the scan), and the per-row keep decision is the same
    * deterministic hash-threshold primitive as [[stratifiedSample]] —
    * stable under repartitioning, rerun, and cluster size. The
    * threshold is `round(p_g·Buckets)` so a mod-bucket twin of the
    * assignment is portable to an oracle engine.
    */
  def temperatureSample(df: DataFrame, idCol: String, groupCol: String,
                        alpha: Double, targetRows: Long,
                        seed: Long = 42L): DataFrame =
    temperatureImpl(df, groupCol, alpha, targetRows, Buckets,
      pmod(xxhash64(col(idCol), lit(seed)), lit(Buckets)))

  /** Modulo-bucket twin of [[temperatureSample]] on a NUMERIC key —
    * bit-portable to any SQL engine (the correctness oracle for the
    * assignment logic, same role [[modSplit]] plays for
    * [[hashSplit]]). `buckets` must be ≪ the smallest group size or
    * the residues stop approximating a uniform draw.
    */
  def temperatureModSample(df: DataFrame, idCol: String, groupCol: String,
                           alpha: Double, targetRows: Long,
                           buckets: Long = 100L): DataFrame =
    temperatureImpl(df, groupCol, alpha, targetRows, buckets,
      pmod(col(idCol).cast("long"), lit(buckets)))

  /** Weighted mixing of SEPARATE corpora into one training set — the
    * cross-source companion to [[temperatureSample]]'s within-corpus
    * domains: each source `(df, weight)` contributes ~`targetRows·wᵢ/Σw`
    * rows, drawn by the same deterministic hash threshold
    * (downsample-only: a source smaller than its quota contributes
    * everything it has — the standard under-weighted-source caveat,
    * surfaced rather than silently re-normalized). Schemas are
    * reconciled additively ([[graft.sources.SchemaEvolution
    * .unionEvolved]]) and every row is tagged with its source name,
    * so mix proportions stay auditable downstream.
    *
    * Each source's keep-filter is planned on ITS OWN scan (no
    * union-then-group shuffle): at 100 TB the mix is N parallel
    * filtered scans concatenated — zero shuffle total.
    */
  def mixWeighted(sources: Seq[(String, DataFrame, Double)], idCol: String,
                  targetRows: Long, seed: Long = 42L,
                  tagCol: String = "mix_source"): DataFrame =
    mixImpl(sources, targetRows, Buckets, tagCol,
      pmod(xxhash64(col(idCol), lit(seed)), lit(Buckets)))

  /** Modulo-bucket twin of [[mixWeighted]] on a NUMERIC key — the
    * bit-portable correctness oracle for the quota arithmetic (the
    * role [[modSplit]] / [[temperatureModSample]] play for their hash
    * siblings). `buckets` must be ≪ the smallest source size or the
    * residues stop approximating a uniform draw.
    */
  def mixWeightedMod(sources: Seq[(String, DataFrame, Double)], idCol: String,
                     targetRows: Long, buckets: Long = 100L,
                     tagCol: String = "mix_source"): DataFrame =
    mixImpl(sources, targetRows, buckets, tagCol,
      pmod(col(idCol).cast("long"), lit(buckets)))

  private def mixImpl(sources: Seq[(String, DataFrame, Double)],
                      targetRows: Long, buckets: Long, tagCol: String,
                      bucket: Column): DataFrame = {
    require(sources.nonEmpty, "at least one source required")
    require(sources.forall(_._3 > 0), "weights must be positive")
    require(targetRows > 0, "targetRows must be positive")
    require(sources.map(_._1).distinct.size == sources.size,
      "source names must be unique")
    // the tag column is the audit trail — silently overwriting a
    // pre-existing one (e.g. re-mixing an already-mixed corpus) would
    // corrupt it; re-mixers must pick a fresh tag name
    sources.foreach { case (name, df, _) =>
      require(!df.columns.contains(tagCol),
        s"source '$name' already has a '$tagCol' column; pass a different tagCol")
    }
    val totalW = sources.map(_._3).sum
    // quota sizing needs every source's cardinality: ONE job counts
    // them all (a union of name-tagged empty projections → tiny
    // groupBy), so the sources are scanned concurrently instead of N
    // sequential df.count() actions. On a raw parquet scan each leg is
    // metadata-priced (empty read schema); on a filtered/derived view
    // it is necessarily a full pass — persist such inputs upstream if
    // they are also the mix inputs, or the filter runs twice.
    val counts: Map[String, Long] = sources
      .map { case (name, df, _) => df.select(lit(name).as("__src")) }
      .reduce(_ union _)
      .groupBy(col("__src")).agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = sources.map { case (name, df, weight) =>
      val n = counts.getOrElse(name, 0L)
      val quota = targetRows.toDouble * weight / totalW
      val thresh = math.round(math.min(1.0, if (n == 0) 0.0 else quota / n) * buckets)
      df.filter(bucket < lit(thresh)).withColumn(tagCol, lit(name))
    }
    graft.sources.SchemaEvolution.unionEvolved(sampled)
  }

  private def temperatureImpl(df: DataFrame, groupCol: String, alpha: Double,
                              targetRows: Long, buckets: Long,
                              bucket: Column): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, "alpha must be in [0, 1]")
    require(targetRows > 0, "targetRows must be positive")
    val sizes = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__w", pow(col("__n").cast("double"), lit(alpha)))
    // Σw via an unpartitioned window over the SIZES frame — the frame
    // is domain-cardinality (tiny), so the single-partition window is
    // bounded by construction and the plan stays free of the 1-row
    // cross join a separate total-aggregate would nested-loop in
    // (PlansSpec sweeps every graded query for NLJ/cartesian shapes)
    val W = org.apache.spark.sql.expressions.Window
    val w = W.partitionBy().rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    val probs = sizes
      .withColumn("__tw", sum(col("__w")).over(w))
      .select(col(groupCol).as("__grp"),
        round(least(lit(1.0),
          lit(targetRows.toDouble) * col("__w") / col("__tw") / col("__n"))
          * lit(buckets)).cast("long").as("__thresh"))
    // null-SAFE join: groupBy counts a NULL group like any other, so
    // the threshold lookup must match it too — a plain equi-join would
    // silently drop every null-group row from the sample even though
    // they contributed to the weight total (alpha=1 "natural
    // proportions" quietly excluding the null domain)
    df.join(broadcast(probs), col(groupCol) <=> col("__grp"))
      .filter(bucket < col("__thresh"))
      .drop("__grp", "__thresh")
  }

  /** DSIR data selection (Xie et al. '23, "Data Selection for
    * Language Models via Importance Resampling"): score every
    * CANDIDATE document by how much it reads like the TARGET corpus
    * under bag-of-hashed-unigram models,
    *
    *   log w(d) = Σ_b c_b(d) · (ln p̂_t[b] − ln p̂_r[b]),
    *   p̂[b]    = (count[b] + α) / (total + α·B)     (add-α smoothing)
    *
    * with tokens hashed into B buckets by [[graft.functions.Text
    * .portableHash60]] (md5-slice — the whole score replays SQL-for-
    * SQL in an external engine), and keep the top n by (rounded
    * score desc, id) — the deterministic top-k variant of the paper's
    * gumbel resampling, graded end-to-end.
    *
    * Plan shape at 100 TB: one explode → a per-(doc, bucket) count
    * (the only corpus-sized shuffle, pre-reduced to ≤ B rows per doc
    * map-side) and a B-row global stat frame (broadcast; a stored
    * stat per target refresh in production) → per-doc dot product.
    * No corpus-sized join anywhere; candidates never compare to
    * target docs pairwise.
    *
    * @param isTarget boolean Column over `docs`: rows defining the
    *                 target distribution. Non-target rows are the
    *                 candidate pool that gets scored and selected.
    * @return (doc_id, score, n_tokens, rank), rank 1..n by (score
    *         desc, doc_id) — ranked on the ROUNDED score, ties to
    *         the lower id (the bm25TopK discipline)
    */
  def dsirSelect(docs: DataFrame, idCol: String, textCol: String,
                 isTarget: Column, n: Int, buckets: Int = 64,
                 alpha: Double = 0.5, roundTo: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n > 0, "n must be positive")
    require(buckets > 0, "buckets must be positive")
    val toks = graft.Par.persistTracked(
      docs.select(col(idCol).as("doc_id"), isTarget.as("__tgt"),
          explode(split(graft.functions.Text.normalize(col(textCol)), " "))
            .as("term"))
        .filter(length(col("term")) > 0)
        .select(col("doc_id"), col("__tgt"),
          pmod(graft.functions.Text.portableHash60(col("term")),
            lit(buckets.toLong)).as("bucket")))
    val wAll = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // B-row stat frame; totals ride a window over it (the surprisal
    // discipline — no 1-row cross join, no extra scan)
    val deltas = toks.groupBy(col("bucket"))
      .agg(sum(when(col("__tgt"), lit(1L)).otherwise(lit(0L))).as("t_b"),
        sum(when(!col("__tgt"), lit(1L)).otherwise(lit(0L))).as("r_b"))
      .withColumn("t_tot", sum(col("t_b")).over(wAll))
      .withColumn("r_tot", sum(col("r_b")).over(wAll))
      .select(col("bucket"),
        (log((col("t_b") + lit(alpha)) / (col("t_tot") + lit(alpha * buckets)))
          - log((col("r_b") + lit(alpha)) / (col("r_tot") + lit(alpha * buckets))))
          .as("delta"))
    val cand = toks.filter(!col("__tgt"))
      .groupBy(col("doc_id"), col("bucket")).agg(count(lit(1)).as("c"))
    cand.join(broadcast(deltas), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("c").cast("double") * col("delta")), roundTo)
          .as("score"),
        sum(col("c")).as("n_tokens"))
      .withColumn("rank", row_number()
        .over(Window.orderBy(col("score").desc, col("doc_id"))))
      .filter(col("rank") <= n)
  }

  /** Balanced per-class downsample (the class-rebalancing staple
    * before training a classifier on skewed labels: every class
    * keeps exactly the MINORITY class's count, majority classes
    * downsample deterministically): per class, the n_min rows with
    * the smallest `xxhash64(id, seed)` (ties on id), n_min = the
    * smallest class count — so the output is a pure function of the
    * data + seed (survives repartitioning and reruns, the sampler
    * family's stability contract) and every class lands at exactly
    * the same size.
    *
    * Plan: one class-count aggregate with the minimum riding a
    * window over that class-cardinality-sized frame (no scalar cross
    * join), one per-class rank window on the hash (the standard
    * stratum exchange — for extreme-cardinality strata swap the
    * window for [[stratifiedTopN]]'s bounded-heap scan, same
    * output), one equi-join back. Output: input columns + `rank`.
    */
  def balancedSample(df: DataFrame, idCol: String, classCol: String,
                     seed: Long = 42L): DataFrame = {
    val wAll = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val counts = df.groupBy(col(classCol)).agg(count(lit(1)).as("__n"))
      .withColumn("__nmin", min(col("__n")).over(wAll))
      .select(col(classCol), col("__nmin"))
    val byHash = Window.partitionBy(col(classCol))
      .orderBy(xxhash64(col(idCol), lit(seed)).asc, col(idCol).asc)
    df.withColumn("rank", row_number().over(byHash))
      .join(counts, Seq(classCol))
      .filter(col("rank") <= col("__nmin"))
      .drop("__nmin")
  }

  /** Leakage-safe LEAVE-ONE-OUT target encoding with smoothing
    * (Micci-Barreca SIGKDD '01; the CatBoost-era categorical
    * encoder): replace a high-cardinality category with the target
    * mean of the OTHER rows in its category, shrunk toward the
    * global prior —
    *
    *   enc_i = (S_c − y_i + m·prior) / (n_c − 1 + m)
    *
    * Subtracting the row's own label is what makes the feature safe
    * to train on (naive category means leak the label and overfit
    * singleton categories, the classic silent failure); the
    * smoothing m interpolates toward the prior as categories thin —
    * a singleton encodes to exactly the prior.
    *
    * Exact integer sufficient statistics (category sums/counts via
    * ONE category aggregate, global prior via a window over the
    * category-sized frame — no scalar cross join), the encoding one
    * fixed double tree per row, rounded once. One category exchange
    * + one broadcastable join back to rows.
    */
  def targetEncode(df: DataFrame, idCol: String, catCol: String,
                   targetCol: String, smoothing: Double = 10.0,
                   roundTo: Int = 6): DataFrame = {
    require(smoothing > 0, "smoothing must be positive")
    val d = (c: Column) => c.cast("double")
    val wAll = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cats = df.groupBy(col(catCol).as("__c"))
      .agg(count(lit(1)).as("__nc"),
        sum(col(targetCol).cast("long")).as("__sc"))
      .withColumn("__ng", sum(col("__nc")).over(wAll))
      .withColumn("__sg", sum(col("__sc")).over(wAll))
    df.select(col(idCol), col(catCol),
        col(targetCol).cast("long").as("__y"))
      .join(cats, col(catCol) === col("__c"))
      .select(col(idCol), col(catCol), col("__y").as("y"),
        round((d(col("__sc")) - d(col("__y"))
            + lit(smoothing) * (d(col("__sg")) / d(col("__ng"))))
          / (d(col("__nc")) - lit(1.0) + lit(smoothing)), roundTo)
          .as("enc"))
  }
}
