package graft

import org.apache.spark.sql.DataFrame

/** Parallelism guard for compute-heavy per-row operators.
  *
  * A small parquet file scans as ONE partition, so an operator doing
  * expensive per-row work (shingling, hashing, vector math) after such
  * a scan runs on one core while the rest idle — observed as a single
  * 600 s straggler task at sf0.1. `widen` repartitions up to the
  * cluster's default parallelism ONLY when the input has fewer
  * partitions than that; at 100 TB inputs already have thousands of
  * partitions and this is a no-op (no extra shuffle).
  */
object Par {
  def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
