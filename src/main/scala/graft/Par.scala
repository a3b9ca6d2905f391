package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Parallelism guard for compute-heavy per-row operators.
  *
  * A small parquet file scans as ONE partition, so an operator doing
  * expensive per-row work (shingling, hashing, vector math) after such
  * a scan runs on one core while the rest idle — observed as a single
  * 600 s straggler task at sf0.1. `widen` repartitions up to the
  * cluster's default parallelism ONLY when the input has fewer
  * partitions than that; at 100 TB inputs already have thousands of
  * partitions and this is a no-op (no extra shuffle).
  *
  * Pass the operator's downstream key columns when it has any: a
  * round-robin `repartition(n)` provides no distribution anything
  * requires, so AQE's local-shuffle-read rewrites it into a map-local
  * read and the pipeline collapses back to one task (measured: the
  * 4-6 s single-task stage returns). A hash repartition on the
  * grouping/join key is a distribution the planner must preserve —
  * and the downstream aggregation reuses it, saving its own shuffle.
  *
  * Cache lifecycle: every persist() issued by graft operators (here
  * and in Dedup/Similarity self-join intermediates) is TRACKED.
  * Long-running applications call [[release]] after consuming an
  * operator's result to drop exactly the blocks graft cached —
  * no unbounded cache growth, no need for the blunt
  * `spark.catalog.clearCache()` (which would evict the caller's own
  * caches too).
  */
object Par {
  private val tracked = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Persist `df` and register it for [[release]]. All graft-internal
    * caching goes through here so callers own the lifecycle.
    */
  def persistTracked(df: DataFrame): DataFrame = {
    val p = df.persist()
    tracked.add(p)
    p
  }

  /** Unpersist every DataFrame graft operators cached since the last
    * release (non-blocking). Call after the consuming action finishes.
    */
  def release(): Unit = {
    var d = tracked.poll()
    while (d != null) { d.unpersist(false); d = tracked.poll() }
  }

  def widen(df: DataFrame, keys: String*): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // toRdd (InternalRow RDD) probes the partition count without the
    // extra deserializer stage df.rdd would add; the physical planning
    // it forces is of THIS input only (typically a bare scan) and is
    // cached on the QueryExecution.
    if (df.queryExecution.toRdd.getNumPartitions >= target) df
    else {
      val r =
        if (keys.nonEmpty) df.repartition(target, keys.map(col): _*)
        else df.repartition(target)
      // persist() is the optimizer barrier that makes the widening
      // stick: without it Catalyst pushes downstream projections below
      // the exchange (to shrink shuffle payloads), so the expensive
      // per-row compute lands back in the single-partition map stage
      // (measured: 1-task, 3.6 s CPU). The cache only ever holds a
      // narrow input (widen fires only when the scan is narrow).
      persistTracked(r)
    }
  }
}
