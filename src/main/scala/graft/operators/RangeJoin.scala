package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval / range joins that never nested-loop.
  *
  * Catalyst plans a raw `pt BETWEEN start AND end` join as a
  * BroadcastNestedLoopJoin (or a cartesian) — O(|L|·|R|) compares.
  * The scalable shape is BUCKETING: quantize time into fixed-width
  * buckets, explode each interval over the buckets it overlaps, tag
  * each point with its single bucket, equi-join on (keys…, bucket),
  * and re-check the exact predicate. Each (point, interval) match
  * meets in EXACTLY one bucket — the point's — so the join needs no
  * dedup afterward. Work is one hash shuffle on (keys…, bucket);
  * interval replication is bounded by ceil(len/width)+1 rows.
  * (Same design as the bucketed spatial/temporal joins in public
  * Spark range-join implementations.)
  */
object RangeJoin {

  /** Join each `points` row to every `intervals` row with the same
    * `keyCols` whose `[startCol, endCol]` (inclusive) contains
    * `ptCol`. `bucketSeconds` is the quantum: pick it near the TYPICAL
    * interval length so replication stays ~2 rows per interval while
    * buckets stay selective.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      keyCols: Seq[String], ptCol: String,
                      startCol: String, endCol: String,
                      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    def bucketOf(c: Column): Column =
      floor(unix_timestamp(c) / lit(bucketSeconds)).cast("long")
    val p = points.withColumn("__bucket", bucketOf(col(ptCol)))
    val i = intervals.withColumn("__bucket",
      explode(sequence(bucketOf(col(startCol)), bucketOf(col(endCol)))))
    p.join(i, keyCols :+ "__bucket")
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("__bucket")
  }

  /** Banded dimension join: attach to each fact row the single band
    * whose `[loCol, hiCol)` half-open value range contains `valueCol`
    * (e.g. price tiers, score buckets). Bands are a FIXED-cardinality
    * dim — the broadcast nested-loop this plans IS the right plan:
    * |bands| compares per row, streamed, no shuffle. For data-sized
    * range sides use [[pointInInterval]] instead.
    */
  def bandJoin(facts: DataFrame, bands: DataFrame, valueCol: String,
               loCol: String, hiCol: String): DataFrame =
    facts.join(broadcast(bands),
      col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol), "left")
}
