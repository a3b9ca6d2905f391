package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** dbt-style data-quality tests (reference:
  * dbt_project/nomba_dbt/models/staging/schema.yml,
  * models/marts/schema.yml — unique / not_null / accepted_values,
  * plus referential integrity between fact and dim keys).
  *
  * dbt materializes one SELECT per test; here every per-table check
  * is folded into ONE aggregation pass over the table (a single scan
  * + partial aggregation — at 100 TB this is N checks for the price
  * of one). Referential checks are left-anti joins.
  */
object Quality {
  sealed trait Check { def name: String }
  final case class NotNull(column: String) extends Check { val name = s"not_null_$column" }
  final case class Unique(column: String) extends Check { val name = s"unique_$column" }
  final case class AcceptedValues(column: String, allowed: Seq[String]) extends Check {
    val name = s"accepted_values_$column"
  }

  /** All scalar checks for one table in a single pass.
    * Output: (check_name, violations).
    * not_null → count of nulls; accepted_values → count of rows
    * outside the set; unique → rows that are part of a duplicate
    * group (count - countDistinct counts the "extra" rows).
    */
  def runChecks(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val aggs: Seq[Column] = checks.map {
      case NotNull(c) =>
        sum(when(col(c).isNull, 1L).otherwise(0L))
      case Unique(c) =>
        count(when(col(c).isNotNull, col(c))) - countDistinct(col(c))
      case AcceptedValues(c, allowed) =>
        sum(when(col(c).isNotNull && !col(c).isin(allowed: _*), 1L).otherwise(0L))
    }
    val named = aggs.zip(checks).map { case (a, ch) => coalesce(a, lit(0L)).as(ch.name) }
    val wide  = df.agg(named.head, named.tail: _*)
    // unpivot to (check_name, violations) rows
    val stacked = checks.map(ch => s"'${ch.name}', ${ch.name}").mkString(", ")
    wide.selectExpr(s"stack(${checks.size}, $stacked) as (check_name, violations)")
  }

  /** One-pass table profile: per column null count, exact distinct
    * count, and min/max (as strings so heterogeneous column types fit
    * one output schema). All metrics for all columns come from a
    * SINGLE aggregation over the table — N columns for the price of
    * one scan, same principle as [[runChecks]].
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
        countDistinct(col(c)).as(s"__dist_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    } :+ count(lit(1)).as("__rows")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map { c =>
      s"'$c', __rows, __null_$c, __dist_$c, __min_$c, __max_$c"
    }.mkString(", ")
    wide.selectExpr(
      s"stack(${cols.size}, $stacked) as " +
        "(column_name, n_rows, n_null, n_distinct, min_value, max_value)")
  }

  /** dbt `relationships` test: child keys with no matching parent.
    * Single left-anti join (broadcast when the parent dim is small).
    */
  def relationshipViolations(child: DataFrame, childKey: String,
                             parent: DataFrame, parentKey: String): DataFrame =
    child.select(col(childKey))
      .filter(col(childKey).isNotNull)
      .distinct()
      .join(parent.select(col(parentKey).as(childKey)), Seq(childKey), "left_anti")
}
