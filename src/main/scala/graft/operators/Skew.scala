package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew handling for heavy-hitter group keys.
  *
  * At 100 TB a groupBy on a skewed key (one merchant = 30% of
  * transactions) leaves one reducer with the heavy key while the rest
  * idle. AQE splits skewed JOIN partitions but not skewed
  * AGGREGATIONS — `saltedAgg` is the standard two-stage fix:
  * aggregate on (key, salt) first (spreads the heavy key over
  * `saltBuckets` reducers), then combine the partials on the key.
  * Works for algebraic aggregates (sum/count/min/max), whose partials
  * merge losslessly.
  */
object Skew {
  sealed trait Agg { def col: String }
  final case class SumOf(col: String) extends Agg
  final case class CountAll() extends Agg { val col = "*" }
  final case class MinOf(col: String) extends Agg
  final case class MaxOf(col: String) extends Agg

  private def outName(a: Agg): String = a match {
    case SumOf(c)   => s"sum_$c"
    case CountAll() => "n_rows"
    case MinOf(c)   => s"min_$c"
    case MaxOf(c)   => s"max_$c"
  }

  /** Two-shuffle salted aggregation, equivalent to
    * `df.groupBy(keys).agg(...)` but with the first shuffle keyed on
    * (keys, salt) so no single reducer owns a heavy key.
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], aggs: Seq[Agg],
                saltBuckets: Int = 32): DataFrame = {
    require(aggs.nonEmpty, "at least one aggregate")
    // deterministic salt: hash of the whole row spreads a heavy key's
    // rows uniformly (monotonically_increasing_id would break retries)
    val salted = df.withColumn("__salt",
      pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(saltBuckets)))
    val partialCols: Seq[Column] = aggs.map {
      case SumOf(c)   => sum(col(c)).as(s"__p_sum_$c")
      case CountAll() => count(lit(1)).as("__p_cnt")
      case MinOf(c)   => min(col(c)).as(s"__p_min_$c")
      case MaxOf(c)   => max(col(c)).as(s"__p_max_$c")
    }
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partialCols.head, partialCols.tail: _*)
    val finalCols: Seq[Column] = aggs.map {
      case a @ SumOf(c)   => sum(col(s"__p_sum_$c")).as(outName(a))
      case a @ CountAll() => sum(col("__p_cnt")).as(outName(a))
      case a @ MinOf(c)   => min(col(s"__p_min_$c")).as(outName(a))
      case a @ MaxOf(c)   => max(col(s"__p_max_$c")).as(outName(a))
    }
    partial.groupBy(keys.map(col): _*).agg(finalCols.head, finalCols.tail: _*)
  }
}
