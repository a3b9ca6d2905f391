package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD Type 2 (slowly-changing dimension) — re-expressing dbt's
  * `check`-strategy snapshot (reference:
  * dbt_project/nomba_dbt/snapshots/users_snapshot.sql — unique_key +
  * check_cols, producing dbt_valid_from / dbt_valid_to) as Spark
  * joins and windows.
  */
object Scd2 {
  val ValidFrom = "valid_from"
  val ValidTo   = "valid_to"

  /** Portable row fingerprint for HASH-DIFF SCD2 (dbt's
    * `check_cols='all'` realized as one stored hash — the Kimball
    * hash-diff pattern): md5 over unit-separated (\\u0001),
    * null-sentineled (\\u0000) string casts. One comparison per row
    * regardless of attribute count, and the stored hash means the
    * next merge never re-reads old attribute values. md5 rather than
    * xxhash64 so any warehouse can recompute it (the portable-hash
    * argument from `Text.portableHash60`). Callers should cast
    * floating-point money to decimal FIRST — double→string
    * formatting is engine-specific, decimal→string is not.
    */
  def rowHash(cols: Seq[Column]): Column =
    md5(concat_ws("\u0001",
      cols.map(c => coalesce(c.cast("string"), lit("\u0000"))): _*))

  /** One snapshot-merge step: fold today's full extract into the
    * existing history. Matches dbt snapshot `check` strategy:
    *  - new key                  → insert (valid_to = null)
    *  - existing key, checkCols changed → close old row (valid_to =
    *    asOf), insert new current row
    *  - unchanged                → keep as-is
    *  - key missing from extract → row stays open (dbt default:
    *    invalidate_hard_deletes=false), or is CLOSED at asOf when
    *    `invalidateHardDeletes=true` (dbt's invalidate_hard_deletes
    *    config — the right setting for FULL-snapshot sources like the
    *    reference's Mongo users extract, where a vanished key IS a
    *    delete; reference users_snapshot.sql keeps the default).
    *
    * Plan: current rows ⟗ extract on the business key — one shuffle —
    * and then ONE pass over the join output: each joined row explodes
    * into its 0-2 result rows (kept/closed old version, (re)opened new
    * version), so neither the history scan nor the join is evaluated
    * twice. Referencing the join from two filter branches instead
    * would run it twice per merge AND double the logical plan per
    * [[mergeAll]] fold step (exponential plan growth — measured as
    * minutes of Catalyst/plan-stringification time on a 50-fold
    * backfill). The extract must be a FULL snapshot when
    * invalidateHardDeletes is on — an incremental extract would close
    * every unmentioned key.
    */
  def merge(history: DataFrame, extract: DataFrame, key: Seq[String],
            checkCols: Seq[String], asOf: Column,
            invalidateHardDeletes: Boolean = false): DataFrame =
    mergeBy(history, extract, key,
      checkCols.map(c => !(col(c) <=> col(s"__new_$c"))).reduce(_ || _),
      asOf, invalidateHardDeletes)

  /** dbt snapshot `timestamp` strategy (dbt's RECOMMENDED default —
    * `strategy='timestamp', updated_at=...`): a matched key is a new
    * version iff the extract's `updatedAt` is STRICTLY NEWER than the
    * stored one — so a replayed or late-arriving OLD extract row can
    * never close a current version (the idempotence `check` can't
    * give when attributes flap A→B→A), at the cost of trusting the
    * source to bump the column. NULL discipline: a null incoming
    * timestamp never versions; a null stored one (bootstrap rows)
    * accepts any non-null incoming. Same single full-outer-join plan
    * as [[merge]].
    */
  def mergeTimestamp(history: DataFrame, extract: DataFrame,
                     key: Seq[String], updatedAt: String, asOf: Column,
                     invalidateHardDeletes: Boolean = false): DataFrame =
    mergeBy(history, extract, key,
      col(s"__new_$updatedAt").isNotNull &&
        (col(updatedAt).isNull || col(s"__new_$updatedAt") > col(updatedAt)),
      asOf, invalidateHardDeletes)

  private def mergeBy(history: DataFrame, extract: DataFrame,
                      key: Seq[String], changedPred: Column, asOf: Column,
                      invalidateHardDeletes: Boolean): DataFrame = {
    val attrCols = extract.columns.filterNot(key.contains).toSeq
    val closed   = history.filter(col(ValidTo).isNotNull)
    val current  = history.filter(col(ValidTo).isNull)

    val ex = extract.select(
      key.map(col) ++ attrCols.map(c => col(c).as(s"__new_$c"))
        :+ lit(1).as("__in_extract"): _*)
    val cur = current.withColumn("__in_history", lit(1))
    val j = cur.join(ex, key, "full_outer")

    val changed: Column = changedPred
    val inExtract = col("__in_extract").isNotNull
    val inHistory = col("__in_history").isNotNull

    // previously-current rows are closed if the extract changed them —
    // or, with hard-delete invalidation, if their key vanished from
    // the (full) extract
    val closeIt =
      if (invalidateHardDeletes) (inExtract && changed) || !inExtract
      else inExtract && changed
    // the kept/closed old version of the row…
    val oldRow = struct(attrCols.map(col) :+
      col(ValidFrom).as(ValidFrom) :+
      when(closeIt, asOf).otherwise(col(ValidTo)).as(ValidTo): _*)
    // …and the (re)opened new version from the extract
    val newRow = struct(attrCols.map(c => col(s"__new_$c").as(c)) :+
      asOf.as(ValidFrom) :+ lit(null).cast("timestamp").as(ValidTo): _*)
    // slice-to-0-or-1 keeps the branch arrays type-identical so the
    // concat+explode emits exactly the rows each case calls for
    def maybe(row: Column, emit: Column): Column =
      slice(array(row), lit(1), when(emit, lit(1)).otherwise(lit(0)))
    val emitted = j
      .select(key.map(col) :+ explode(concat(
        maybe(oldRow, inHistory),
        maybe(newRow, inExtract && (!inHistory || changed)))).as("__r"): _*)
      .select(key.map(col) ++
        (attrCols :+ ValidFrom :+ ValidTo).map(c => col(s"__r.$c").as(c)): _*)

    closed.unionByName(emitted)
  }

  /** Fold a SEQUENCE of dated snapshots into one history — N
    * scheduled dbt-snapshot runs (the reference's daily job) replayed
    * as N [[merge]] steps. Each step is one full-outer join on the
    * key; the fold is driver-side control flow only (the data never
    * collects). For a backfill where EVERY change is known to be in a
    * log, prefer the single-pass [[historyFromLog]].
    *
    * Lineage defense: each merge step references the running history
    * TWICE (closed + current branches), so the un-truncated logical
    * plan DOUBLES per fold — a 50-snapshot backfill is a 2^50-node
    * plan that Catalyst analysis (and the per-job plan
    * stringification in Spark's execution listeners) chokes on long
    * before any data moves. Every `checkpointEvery` merges the fold
    * truncates lineage with an EAGER `localCheckpoint`: the partial
    * history materializes as one bounded job (≤ 2^checkpointEvery−1
    * joins, cached MEMORY_AND_DISK) and both the logical plan and the
    * RDD DAG restart from that leaf. Eager is deliberate — a lazy
    * checkpoint truncates only the logical plan and leaves the final
    * action to re-drive every chained adaptive subplan at once
    * (measured: minutes for a 50-fold chain that runs in seconds
    * eagerly). `localCheckpoint` pins blocks to their executors — on
    * a cluster with dynamic allocation / spot nodes, set a reliable
    * `sparkContext.setCheckpointDir` and `reliable=true` to use fault-
    * tolerant `checkpoint()` instead. `checkpointEvery <= 0` disables
    * truncation.
    */
  def mergeAll(initial: DataFrame, snapshots: Seq[(DataFrame, Column)],
               key: Seq[String], checkCols: Seq[String],
               checkpointEvery: Int = 4, reliable: Boolean = false): DataFrame =
    snapshots.zipWithIndex.foldLeft(initial) { case (hist, ((extract, asOf), i)) =>
      val merged = merge(hist, extract, key, checkCols, asOf)
      if (checkpointEvery > 0 && (i + 1) % checkpointEvery == 0 && i + 1 < snapshots.size) {
        if (reliable) merged.checkpoint(eager = true)
        else merged.localCheckpoint(eager = true)
      } else merged
    }

  /** Build the full SCD2 history from an update log in one pass:
    * valid_from = the update's timestamp, valid_to = the next update's
    * timestamp for the same key (null for the current row). This is
    * what N successive dbt-snapshot runs converge to when every
    * change is in the log. One window shuffle on the key.
    */
  def historyFromLog(log: DataFrame, key: Seq[String], tsCol: String,
                     tieBreak: Seq[String] = Nil): DataFrame = {
    val ordering = col(tsCol).asc +: tieBreak.map(col(_).asc)
    val w = Window.partitionBy(key.map(col): _*).orderBy(ordering: _*)
    log.withColumn(ValidFrom, col(tsCol))
      .withColumn(ValidTo, lead(col(tsCol), 1).over(w))
  }

  /** Current view of a history table — reference
    * dbt models/marts/dim_users.sql: `where dbt_valid_to is null`.
    */
  def currentRows(history: DataFrame): DataFrame =
    history.filter(col(ValidTo).isNull)

  /** Point-in-time view: the row version valid AT `t` per key —
    * `valid_from <= t < valid_to` (open rows have null valid_to).
    * The read path that makes SCD2 history useful for training-data
    * reproducibility ("the dimension as the model saw it"); pure
    * predicates, pushed to the scan.
    */
  def asOf(history: DataFrame, t: Column): DataFrame =
    history.filter(col(ValidFrom) <= t &&
      (col(ValidTo).isNull || col(ValidTo) > t))
}
