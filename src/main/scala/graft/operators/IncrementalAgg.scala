package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental materialized-aggregate maintenance — keep a grouped
  * aggregate over an append-only fact CURRENT by folding in each
  * day's delta, never re-scanning history.
  *
  * The reference maintains its marts by re-running dbt models over
  * incrementally-loaded staging (models/marts + `is_incremental()`);
  * at 100 TB a daily full `groupBy` over the fact history is the
  * single most expensive recurring job a warehouse runs. The
  * standard fix is a PARTIAL-AGGREGATE STATE table: one row per group
  * holding the algebraic partials (count, sum, min, max), updated by
  *
  *  1. aggregating the delta alone (delta-sized shuffle — map-side
  *     partial combine makes the shuffle |delta groups|, not |delta|);
  *  2. unioning the old state with the delta partials and re-merging
  *     per key (shuffle sized |state groups| + |delta groups| — group
  *     cardinality, never history row count).
  *
  * Partials merge losslessly for algebraic aggregates: sum/count add,
  * min/max take extremes; avg derives as sum/count at READ time
  * ([[finalize]]) and is never stored (stored averages don't merge).
  * Inserts-only contract: min/max cannot retract deleted rows — pair
  * with [[Cdc]]'s soft-delete filter upstream if rows can vanish.
  * Sums ride decimal(18,6): exact merge arithmetic, no float drift
  * between the incremental and recomputed forms.
  *
  * `state` is plain columns, so it stores/retrieves through any sink —
  * a [[graft.sources.Versioned]] table makes the daily maintenance
  * atomic, and [[graft.sources.Sink.bucketedTable]] on the group keys
  * makes the state side of the merge exchange-free.
  */
object IncrementalAgg {

  /** Build the initial state: one row per group with partials. */
  def init(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame = {
    require(keys.nonEmpty, "need at least one group key")
    df.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("n_rows"),
      sum(col(valueCol).cast("decimal(18,6)")).as("sum_value"),
      min(col(valueCol)).as("min_value"),
      max(col(valueCol)).as("max_value"))
  }

  /** Fold one insert-only delta into `state`; same schema out. */
  def maintain(state: DataFrame, delta: DataFrame, keys: Seq[String],
               valueCol: String): DataFrame =
    state.unionByName(init(delta, keys, valueCol))
      .groupBy(keys.map(col): _*).agg(
        sum(col("n_rows")).as("n_rows"),
        sum(col("sum_value")).as("sum_value"),
        min(col("min_value")).as("min_value"),
        max(col("max_value")).as("max_value"))

  /** Read-time view: derived metrics on top of the stored partials. */
  def finalize(state: DataFrame): DataFrame =
    state
      .withColumn("avg_value",
        round(col("sum_value").cast("double") /
          col("n_rows").cast("double"), 6))
      .withColumn("sum_value", col("sum_value").cast("double"))

  // ---- incremental COUNT(DISTINCT) ----
  // Distinct counts are NOT algebraic — partials don't merge — so the
  // auxiliary state is the distinct (keys, value) PAIR SET itself:
  // pair-cardinality-sized (bounded by the value domain per key, not
  // by history rows), mergeable by set union, and exact. The fold
  // shuffles |state pairs| + |delta pairs|; store the state bucketed
  // on (keys, value) and the union-distinct re-shuffle disappears for
  // the state side. The 100 TB alternative when even the pair set is
  // too hot — an HLL sketch column per key — trades exactness for
  // O(1) state and is already covered by [[Quality.profileApprox]]'s
  // machinery; this is the exact path.

  /** Distinct-pair state: one row per distinct (keys, value). */
  def initDistinct(df: DataFrame, keys: Seq[String],
                   valueCol: String): DataFrame =
    df.select((keys :+ valueCol).map(col): _*)
      .filter(col(valueCol).isNotNull).distinct()

  /** Fold an insert-only delta's pairs into the state. */
  def maintainDistinct(state: DataFrame, delta: DataFrame, keys: Seq[String],
                       valueCol: String): DataFrame =
    state.unionByName(initDistinct(delta, keys, valueCol)).distinct()

  /** Read-time view: exact COUNT(DISTINCT valueCol) per key group. */
  def finalizeDistinct(state: DataFrame, keys: Seq[String],
                       valueCol: String): DataFrame =
    state.groupBy(keys.map(col): _*)
      .agg(count(col(valueCol)).as("n_distinct"))

  // ---- incremental COUNT(DISTINCT), HLL-sketch state ----
  // The stated 100 TB fallback for [[maintainDistinct]]: when even the
  // distinct pair set is too hot (high-cardinality values per key),
  // the state collapses to ONE fixed-size Datasketches HLL sketch per
  // key (2^lgK bytes, key-cardinality-sized total). Sketch union is
  // EXACT over sketches built at the same lgK — union(sk(A), sk(B)) ≡
  // sk(A ∪ B) — so the fold converges to precisely the sketch a full
  // recompute would build (the spec asserts estimate equality, not
  // tolerance), and only the final ESTIMATE carries the ~1.6%/√2^lgK
  // HLL error. Native codegen'd Spark aggregates (hll_sketch_agg /
  // hll_union_agg), no UDFs; the sketch binary stores through any
  // sink like the other state frames.

  /** Sketch state: one row per group, `hll_sketch` binary. */
  def initDistinctSketch(df: DataFrame, keys: Seq[String], valueCol: String,
                         lgK: Int = 12): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("hll_sketch"))

  /** Fold an insert-only delta into the sketch state (delta is
    * sketched alone — |delta|-sized scan, |delta groups| shuffle —
    * then unioned per key with the state). */
  def maintainDistinctSketch(state: DataFrame, delta: DataFrame,
                             keys: Seq[String], valueCol: String,
                             lgK: Int = 12): DataFrame =
    state.unionByName(initDistinctSketch(delta, keys, valueCol, lgK))
      .groupBy(keys.map(col): _*)
      .agg(hll_union_agg(col("hll_sketch"), lit(false)).as("hll_sketch"))

  /** Read-time view: approximate COUNT(DISTINCT) per key group. */
  def finalizeDistinctSketch(state: DataFrame, keys: Seq[String]): DataFrame =
    state.select(keys.map(col) :+
      hll_sketch_estimate(col("hll_sketch")).as("n_distinct_approx"): _*)

  /** EXACTLY-ONCE fold of one identified batch into a
    * [[graft.sources.Versioned]] state table — the idempotence seam
    * the streaming MV needs: a fold is NOT idempotent (replaying a
    * delta double-counts), so each batch commits as exactly one table
    * version and the version number IS the applied-batch watermark
    * (version v ⟺ batches 0..v−1 applied, single writer). A replayed
    * `batchId` finds `head > batchId` and returns false without
    * touching the table — the crashed-checkpoint redelivery case that
    * at-least-once `foreachBatch` must survive. Returns true when the
    * batch was applied.
    *
    * Empty batches still commit (an unchanged state version) so the
    * version↔batch correspondence never drifts.
    */
  def foldBatchVersioned(batch: DataFrame, root: String, batchId: Long,
                         keys: Seq[String], valueCol: String): Boolean = {
    import graft.sources.Versioned
    val spark = batch.sparkSession
    val head = Versioned.currentVersion(spark, root)
    if (head > batchId) false // already applied — replay is a no-op
    else {
      require(head == batchId,
        s"batch $batchId arrived at version $head — a batch was lost " +
          "(single-writer contract broken?)")
      val newState =
        if (head == 0) init(batch, keys, valueCol)
        else maintain(Versioned.read(spark, root), batch, keys, valueCol)
      Versioned.commit(newState, root, replace = true)
      true
    }
  }
}
