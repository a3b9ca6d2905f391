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

  /** One snapshot-merge step: fold today's full extract into the
    * existing history. Matches dbt snapshot `check` strategy:
    *  - new key                  → insert (valid_to = null)
    *  - existing key, checkCols changed → close old row (valid_to =
    *    asOf), insert new current row
    *  - unchanged                → keep as-is
    *  - key missing from extract → row stays open (dbt default:
    *    invalidate_hard_deletes=false)
    *
    * Plan: current rows ⟗ extract on the business key — one shuffle;
    * the closed/new/kept branches are unions of the join output, so
    * the big history table is scanned once.
    */
  def merge(history: DataFrame, extract: DataFrame, key: Seq[String],
            checkCols: Seq[String], asOf: Column): DataFrame = {
    val attrCols = extract.columns.filterNot(key.contains).toSeq
    val closed   = history.filter(col(ValidTo).isNotNull)
    val current  = history.filter(col(ValidTo).isNull)

    val ex = extract.select(
      key.map(col) ++ attrCols.map(c => col(c).as(s"__new_$c"))
        :+ lit(1).as("__in_extract"): _*)
    val cur = current.withColumn("__in_history", lit(1))
    val j = cur.join(ex, key, "full_outer")

    val changed: Column = checkCols
      .map(c => !(col(c) <=> col(s"__new_$c")))
      .reduce(_ || _)
    val inExtract = col("__in_extract").isNotNull
    val inHistory = col("__in_history").isNotNull

    // 1) previously-current rows: close them if the extract changed them
    val keptOrClosed = j.filter(inHistory)
      .select((key.map(col) ++ attrCols.map(col) :+
        col(ValidFrom) :+
        when(inExtract && changed, asOf).otherwise(col(ValidTo)).as(ValidTo)): _*)
    // 2) rows (re)opened by this extract: brand-new keys or changed keys
    val opened = j.filter(inExtract && (!inHistory || changed))
      .select((key.map(col) ++
        attrCols.map(c => col(s"__new_$c").as(c)) :+
        asOf.as(ValidFrom) :+ lit(null).cast("timestamp").as(ValidTo)): _*)

    closed.unionByName(keptOrClosed).unionByName(opened)
  }

  /** Fold a SEQUENCE of dated snapshots into one history — N
    * scheduled dbt-snapshot runs (the reference's daily job) replayed
    * as N [[merge]] steps. Each step is one full-outer join on the
    * key; the fold is driver-side control flow only (the data never
    * collects). For a backfill where EVERY change is known to be in a
    * log, prefer the single-pass [[historyFromLog]].
    */
  def mergeAll(initial: DataFrame, snapshots: Seq[(DataFrame, Column)],
               key: Seq[String], checkCols: Seq[String]): DataFrame =
    snapshots.foldLeft(initial) { case (hist, (extract, asOf)) =>
      merge(hist, extract, key, checkCols, asOf)
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
