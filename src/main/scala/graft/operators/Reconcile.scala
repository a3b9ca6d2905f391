package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Source↔target reconciliation — the load-verification audit every
  * ELT pipeline runs after a merge (the reference's loads end with
  * count checks; this is the full keyed form): which keys are
  * missing on either side, and which matched keys DISAGREE on
  * checked columns. One full-outer join on the business key — a
  * single key shuffle, the same cost as the upsert being audited —
  * and per-row null-safe comparisons; no collect, no second scan.
  *
  * Row-level verdicts, not just counts, so the diff is actionable
  * (which keys, which side) AND aggregable (the summary is a groupBy
  * over the verdict column).
  */
object Reconcile {

  /** Per-key verdict frame: `match` / `mismatch` (key on both sides,
    * some checked column differs — null-safe) / `source_only` /
    * `target_only`. Columns: key cols + verdict + per-checked-column
    * `<c>_differs` flags (null for one-sided rows).
    */
  def diff(source: DataFrame, target: DataFrame, key: Seq[String],
           checkCols: Seq[String]): DataFrame = {
    require(key.nonEmpty, "reconcile needs a business key")
    require(checkCols.nonEmpty, "reconcile needs columns to check")
    val s = source.select(
      key.map(col) ++ checkCols.map(c => col(c).as(s"__s_$c"))
        :+ lit(1).as("__in_s"): _*)
    val t = target.select(
      key.map(col) ++ checkCols.map(c => col(c).as(s"__t_$c"))
        :+ lit(1).as("__in_t"): _*)
    val j = s.join(t, key, "full_outer")
    val anyDiff = checkCols
      .map(c => !(col(s"__s_$c") <=> col(s"__t_$c")))
      .reduce(_ || _)
    val verdict = when(col("__in_s").isNull, lit("target_only"))
      .when(col("__in_t").isNull, lit("source_only"))
      .when(anyDiff, lit("mismatch"))
      .otherwise(lit("match"))
    val flags = checkCols.map(c =>
      when(col("__in_s").isNull || col("__in_t").isNull,
        lit(null).cast("boolean"))
        .otherwise(!(col(s"__s_$c") <=> col(s"__t_$c")))
        .as(s"${c}_differs"))
    j.select(key.map(col) :+ verdict.as("verdict") :++ flags: _*)
  }

  /** The audit summary: row counts per verdict (plus per-column
    * differing-key counts for matched keys). The groupBy key is the
    * 4-value verdict domain — map-side collapsed.
    */
  def summary(source: DataFrame, target: DataFrame, key: Seq[String],
              checkCols: Seq[String]): DataFrame = {
    val d = diff(source, target, key, checkCols)
    val aggs = count(lit(1)).as("n_keys") +:
      checkCols.map(c => count(when(col(s"${c}_differs"), lit(1)))
        .as(s"n_${c}_differs"))
    d.groupBy(col("verdict")).agg(aggs.head, aggs.tail: _*)
  }
}
