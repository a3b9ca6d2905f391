package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time ("as-of") join — the temporal lookup every feature /
  * training-data pipeline needs: attach to each left row the LATEST
  * right row whose timestamp is at-or-before the left row's, per key
  * (e.g. "the last view before this purchase", "the feature value
  * current at label time"). The reference's CDC layer keeps only the
  * latest row per key (base_loader.py post-insert dedup); this is the
  * generalization to "latest as of an arbitrary time".
  *
  * Scale design: NOT a range join (a naive `l.ts >= r.ts` join is a
  * per-key cross product that Catalyst can only nested-loop). Both
  * sides are tagged and UNIONED, then a single window over
  * (key, ts, side) carries the most recent right payload forward into
  * each left row: exactly ONE hash shuffle on the key and one
  * sort within partitions — the same cost as one groupBy, with no
  * pair blow-up at any key cardinality or skew. (Databricks' own
  * as-of recipes and Flink's temporal join use the same
  * union-and-carry-forward shape.)
  */
object AsOf {

  /** For every `left` row, attach `payload` columns of the latest
    * `right` row with `right.rightTs <= left.leftTs` and equal
    * `keyCols` (null-filled when no prior right row exists).
    * Attached columns are named `prefix + payloadName`.
    *
    * Ties: a right row AT the left row's timestamp matches (<=). Among
    * right rows sharing (key, ts), the one with the largest payload
    * struct wins — pass a unique column (e.g. an event id) first in
    * `payload` for a deterministic pick.
    */
  def backward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               leftTs: String, rightTs: String,
               payload: Seq[String], prefix: String = "asof_",
               toleranceSec: Option[Long] = None): DataFrame =
    pointInTime(left, right, keyCols, leftTs, rightTs, payload, prefix,
      lookForward = false, toleranceSec)

  /** Forward variant: EARLIEST right row with `rightTs >= leftTs`
    * (e.g. "the next error after this deploy"). Same single-shuffle
    * window shape, reversed scan direction; among right rows sharing
    * (key, ts) the smallest payload struct wins.
    */
  def forward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
              leftTs: String, rightTs: String,
              payload: Seq[String], prefix: String = "asof_",
              toleranceSec: Option[Long] = None): DataFrame =
    pointInTime(left, right, keyCols, leftTs, rightTs, payload, prefix,
      lookForward = true, toleranceSec)

  private def pointInTime(left: DataFrame, right: DataFrame,
                          keyCols: Seq[String], leftTs: String, rightTs: String,
                          payload: Seq[String], prefix: String,
                          lookForward: Boolean,
                          toleranceSec: Option[Long] = None): DataFrame = {
    require(payload.nonEmpty, "payload columns required")
    require(toleranceSec.forall(_ >= 0), "toleranceSec must be non-negative")
    // the carried struct leads with the right row's ts so a
    // tolerance can be checked against the MATCHED row after the
    // carry-forward; same-ts rows still tie-break on the payload
    // (the prepended ts is equal within a tie), so ordering semantics
    // are unchanged
    val pStruct = struct(col(rightTs).cast("timestamp").as("__mts") +:
      payload.map(col): _*)
    val pType = right.select(pStruct.as("__p")).schema("__p").dataType
    // left keeps ALL its columns; right contributes only key, ts and
    // the payload struct (unionByName null-fills the rest). Right rows
    // order BEFORE a left row at the same ts for backward (side 0 < 1)
    // and AFTER it for forward (side 2 > 1), so <= / >= ties match;
    // __p last in the ordering makes equal-ts right rows deterministic.
    val rightSide = if (lookForward) 2 else 0
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__p", lit(null).cast(pType))
    val r = right.select(
      keyCols.map(col) ++ Seq(col(rightTs).as("__ts"),
        lit(rightSide).as("__side"), pStruct.as("__p")): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__p").asc)
    val (frame, pick) =
      if (lookForward)
        (w.rowsBetween(Window.currentRow, Window.unboundedFollowing),
          first(col("__p"), ignoreNulls = true))
      else
        (w.rowsBetween(Window.unboundedPreceding, Window.currentRow),
          last(col("__p"), ignoreNulls = true))
    val carried = l.unionByName(r, allowMissingColumns = true)
      .withColumn("__match", pick.over(frame))
      .filter(col("__side") === 1)
    // bounded staleness: a match farther than the tolerance from the
    // left ts is nulled out (the row is KEPT, like a left join miss) —
    // merge_asof-style `tolerance` semantics
    val matched = toleranceSec match {
      case None => carried
      case Some(tol) =>
        val gap =
          if (lookForward)
            col("__match.__mts").cast("double") - col("__ts").cast("double")
          else col("__ts").cast("double") - col("__match.__mts").cast("double")
        carried.withColumn("__match",
          when(gap <= tol.toDouble, col("__match")))
    }
    val attached = payload.map(f => col(s"__match.$f").as(prefix + f))
    matched.select(left.columns.map(col) ++ attached: _*)
  }
}
