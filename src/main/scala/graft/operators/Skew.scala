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

  /** Salted INNER equi-join for heavy-hitter join keys — the join
    * companion to [[saltedAgg]]: hot keys (left-side count >
    * `hotThreshold`) take the replicate-right path — the hot LEFT row
    * gets a deterministic row-hash salt in [0, salts), the hot RIGHT
    * rows are replicated once per salt, and the join key becomes
    * (keys, salt), so a key that owns 30% of the fact table spreads
    * over `salts` reducers instead of one. Cold keys join on the
    * plain keys, untouched. Row-for-row equal to `left.join(right,
    * keys)` (SkewSpec): every (hot left row, matching right row) pair
    * meets on exactly one salt.
    *
    * Use when AQE's skew-join split can't see the skew (it acts on
    * PARTITION byte sizes post-shuffle — a single giant KEY inside an
    * otherwise-balanced partition, compressed hot rows, or a
    * non-sort-merge plan slip through) or when the job runs with AQE
    * off. The hot-key table is one partial-agged aggregate and is
    * heavy-hitter-small by definition (≤ |left| / hotThreshold keys)
    * — it broadcasts to tag both sides; the right side is NOT assumed
    * broadcastable, only its per-key row groups are replicated
    * `salts`×.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 hotThreshold: Long, salts: Int = 16): DataFrame = {
    require(salts > 0, "salts must be positive")
    val hot = left.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__n")).filter(col("__n") > hotThreshold)
      .select(keys.map(col): _*)
      .withColumn("__hot", lit(1))
    def tag(df: DataFrame): DataFrame =
      df.join(broadcast(hot), keys, "left")
        .withColumn("__hot", coalesce(col("__hot"), lit(0)))
    // deterministic salt from the whole row (retry-safe); cold rows
    // pin salt 0 on both sides so they meet exactly once
    val l = tag(left).withColumn("__salt",
      when(col("__hot") === 1,
        pmod(xxhash64(left.columns.map(col).toIndexedSeq: _*), lit(salts.toLong)))
        .otherwise(lit(0L)))
      .drop("__hot")
    val r = tag(right).withColumn("__salt",
      explode(when(col("__hot") === 1,
        array((0 until salts).map(s => lit(s.toLong)): _*))
        .otherwise(array(lit(0L)))))
      .drop("__hot")
    l.join(r, keys :+ "__salt").drop("__salt")
  }
}
