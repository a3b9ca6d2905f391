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
    *
    * Fan-out guards:
    *  - an INVERTED interval (start > end) matches nothing, so it
    *    emits NO buckets — without the guard Spark's `sequence(a, b)`
    *    DESCENDS for a > b and generates junk bucket rows that the
    *    recheck then has to discard (matches the explicit
    *    empty-array handling in plans.RangeJoinRewrite);
    *  - one pathological interval (a year at bucketSeconds=1800 is
    *    ~17.5k buckets) silently multiplies the exploded side; any
    *    interval spanning more than `maxBucketsPerInterval` buckets
    *    raises a clear error naming the knobs instead. Clamping is
    *    NOT an option: a clamped interval would silently lose its
    *    matches beyond the clamp.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      keyCols: Seq[String], ptCol: String,
                      startCol: String, endCol: String,
                      bucketSeconds: Long,
                      maxBucketsPerInterval: Long = 8192L): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    require(maxBucketsPerInterval > 0, "maxBucketsPerInterval must be positive")
    def bucketOf(c: Column): Column =
      floor(unix_timestamp(c) / lit(bucketSeconds)).cast("long")
    val p = points.withColumn("__bucket", bucketOf(col(ptCol)))
    val bLo = bucketOf(col(startCol))
    val bHi = bucketOf(col(endCol))
    val buckets = when(bLo > bHi, array().cast("array<long>"))
      .when(bHi - bLo < lit(maxBucketsPerInterval), sequence(bLo, bHi))
      .otherwise(raise_error(concat(
        lit(s"graft.RangeJoin: interval of "), (bHi - bLo + lit(1L)).cast("string"),
        lit(s" buckets exceeds maxBucketsPerInterval=$maxBucketsPerInterval at " +
          s"bucketSeconds=$bucketSeconds — widen bucketSeconds or raise the cap")))
        .cast("array<long>"))
    val i = intervals.withColumn("__bucket", explode(buckets))
    p.join(i, keyCols :+ "__bucket")
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("__bucket")
  }

  /** INTERVAL-overlap join: every (a, b) pair sharing `keyCols` whose
    * inclusive `[lo, hi]` windows intersect — concurrent sessions,
    * colliding validity windows, overlapping bookings. The missing
    * third range shape next to [[pointInInterval]] (point ∈ interval)
    * and [[bandJoin]] (fixed bands).
    *
    * Same bucketed discipline, plus the trick that keeps it dedup-free
    * although a pair can share MANY buckets: two intervals overlap iff
    * both cover `max(a.lo, b.lo)` — the overlap's left edge — so the
    * equi-join keys on the bucket and the recheck accepts a pair ONLY
    * in the bucket containing that edge. Each overlapping pair
    * survives in exactly one bucket; no distinct over the pair space
    * is ever materialized. Both sides explode by ceil(len/width)+1;
    * the join is one hash shuffle on (keys…, bucket). The same
    * inverted-interval and `maxBucketsPerInterval` guards as
    * [[pointInInterval]] apply to BOTH sides.
    *
    * Left columns come back prefixed `a_`, right `b_` (after
    * `keyCols`, which stay unprefixed).
    */
  def intervalOverlap(a: DataFrame, b: DataFrame,
                      keyCols: Seq[String],
                      loCol: String, hiCol: String,
                      bucketSeconds: Long,
                      maxBucketsPerInterval: Long = 8192L): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    require(maxBucketsPerInterval > 0, "maxBucketsPerInterval must be positive")
    def bucketOf(c: Column): Column =
      floor(unix_timestamp(c) / lit(bucketSeconds)).cast("long")
    def exploded(df: DataFrame, prefix: String): DataFrame = {
      val renamed = df.columns.filterNot(keyCols.contains)
        .foldLeft(df)((d, c) => d.withColumnRenamed(c, s"$prefix$c"))
      val bLo = bucketOf(col(s"$prefix$loCol"))
      val bHi = bucketOf(col(s"$prefix$hiCol"))
      val buckets = when(bLo > bHi, array().cast("array<long>"))
        .when(bHi - bLo < lit(maxBucketsPerInterval), sequence(bLo, bHi))
        .otherwise(raise_error(concat(
          lit(s"graft.RangeJoin: interval of "),
          (bHi - bLo + lit(1L)).cast("string"),
          lit(s" buckets exceeds maxBucketsPerInterval=$maxBucketsPerInterval" +
            s" at bucketSeconds=$bucketSeconds — widen bucketSeconds or" +
            " raise the cap"))).cast("array<long>"))
      renamed.withColumn("__bucket", explode(buckets))
    }
    val ea = exploded(a, "a_")
    val eb = exploded(b, "b_")
    ea.join(eb, keyCols :+ "__bucket")
      // exact overlap — including per-side validity: an inverted
      // interval that still lands in ONE bucket (lo and hi in the
      // same quantum) slips past the bucket-level guard, and the
      // overlap predicate alone would not reject it
      .filter(col(s"a_$loCol") <= col(s"a_$hiCol") &&
        col(s"b_$loCol") <= col(s"b_$hiCol") &&
        col(s"a_$loCol") <= col(s"b_$hiCol") &&
        col(s"b_$loCol") <= col(s"a_$hiCol"))
      // …accepted only in the overlap-left-edge bucket (pair-unique)
      .filter(col("__bucket") ===
        floor(unix_timestamp(greatest(col(s"a_$loCol"), col(s"b_$loCol"))) /
          lit(bucketSeconds)).cast("long"))
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
