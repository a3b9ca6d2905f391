package graft.pipeline

import graft.operators.Cdc
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** dbt-style incremental materialization, end to end — the
  * reference's core loop as one callable (reference:
  * dbt models/staging/stg_savings_transaction.sql `is_incremental()`
  * + base_loader.py `get_last_loaded_value` → extract → append):
  *
  *  1. bootstrap: target missing → full write of the source;
  *  2. otherwise read max(trackingCol) FROM THE TARGET (the target is
  *     the source of truth for progress — a separate state store can
  *     drift), filter the source beyond it, append.
  *
  * The tracking filter is a pushed-down predicate, so at 100 TB an
  * incremental pass reads only row groups/partitions past the
  * watermark; the max() on the target is metadata-cheap on parquet.
  * Late rows AT the watermark are excluded (strict >) exactly like
  * the reference — use [[graft.streaming.EventStream.applyUpserts]]
  * when replays/updates of existing keys must converge instead.
  */
object IncrementalModel {

  /** Run one incremental pass; returns the number of rows appended
    * (or fully loaded on bootstrap).
    */
  def run(spark: SparkSession, source: DataFrame, targetPath: String,
          trackingCol: String): Long = {
    val fs = new org.apache.hadoop.fs.Path(targetPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(targetPath))) {
      val n = source.count()
      source.write.mode(SaveMode.ErrorIfExists).parquet(targetPath)
      n
    } else {
      val last = spark.read.parquet(targetPath)
        .agg(org.apache.spark.sql.functions.max(col(trackingCol))).head.get(0)
      if (last == null) { // empty bootstrap write: append everything
        val n = source.count()
        source.write.mode(SaveMode.Append).parquet(targetPath)
        n
      } else {
        val delta = Cdc.incrementalFilter(source, trackingCol,
          org.apache.spark.sql.functions.lit(last))
        val n = delta.count()
        if (n > 0) delta.write.mode(SaveMode.Append).parquet(targetPath)
        n
      }
    }
  }
}
