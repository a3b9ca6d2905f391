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
}
