package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Batch sinks with the reference's idempotency semantics
  * (reference: base_loader.py `_perform_full_load` truncate+insert,
  * `_perform_incremental_load` delete+insert by key, and the
  * README's "Idempotency Strategy"), re-expressed as Spark write
  * modes that scale:
  *
  *  - full refresh        → `overwrite` of the whole path
  *  - daily/batch refresh → DYNAMIC partition overwrite (replaces
  *    only the partitions present in the batch — the delete+insert
  *    of exactly the affected date dirs, atomic per partition)
  *  - keyed upsert        → read-merge-write via Cdc.upsert
  *  - co-located joins    → bucketed tables (both sides bucketed on
  *    the join key → SortMergeJoin with NO exchange)
  */
object Sink {

  /** Truncate+insert full load (idempotent). */
  def fullOverwrite(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** Partitioned write: one directory per partition value —
    * downstream readers prune partitions from the path (the 100 TB
    * daily-delta read is a single-dir scan).
    */
  def partitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Idempotent batch append: overwrite ONLY the partitions present
    * in `df`, leave the rest of the table untouched. Re-running a
    * day's load replaces that day exactly once.
    */
  def overwritePartitions(df: DataFrame, path: String, partitionCols: Seq[String]): Unit = {
    val spark = df.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** Keyed upsert into a parquet target (delete+insert by key,
    * latest wins) — the reference's incremental load against a table
    * that isn't partition-aligned with the batch.
    */
  def upsert(spark: SparkSession, targetPath: String, updates: DataFrame,
             key: Seq[String], trackingCol: String, tieBreak: Seq[String] = Nil): Unit = {
    val target = spark.read.parquet(targetPath)
    val merged = graft.operators.Cdc.upsert(target, updates, key, trackingCol, tieBreak)
    // parquet has no transactional rewrite: stage, rename the live dir
    // ASIDE (not delete — a crash between steps must never lose the
    // table), swap staged into place, then drop the old copy. The
    // FileSystem is resolved FROM the target path so non-default
    // schemes (s3a://, hdfs://...) work.
    val dst = new Path(targetPath)
    val fs  = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(targetPath + "__staged")
    merged.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    swapInto(fs, tmp, dst)
  }

  /** Promote `tmp` into `dst` with the live copy staged aside. Hadoop
    * `FileSystem.rename` reports failure by returning FALSE (it only
    * throws for IO errors), so every rename is CHECKED: an unchecked
    * failed promote followed by the old-copy delete would silently
    * destroy the only remaining copy of the table. The old copy is
    * deleted only after `dst` is confirmed live; a failed promote
    * renames the old copy back into place before raising.
    */
  private[sources] def swapInto(fs: FileSystem, tmp: Path, dst: Path): Unit = {
    val old = new Path(dst.toString + "__old")
    fs.delete(old, true) // leftover from a previous crashed swap
    require(fs.rename(dst, old), s"rename $dst -> $old failed")
    if (!fs.rename(tmp, dst)) {
      val restored = fs.rename(old, dst)
      throw new IllegalStateException(
        s"rename $tmp -> $dst failed" + (
          if (restored) s"; previous table restored at $dst"
          else s"; RESTORE ALSO FAILED — live data is at $old"))
    }
    fs.delete(old, true) // only after the new copy is confirmed live
  }

  /** Small-file compaction — the maintenance pass every streaming /
    * upsert sink eventually needs: a file-source microbatch or a keyed
    * upsert leaves many small parquet files, and a small file scans as
    * ONE partition, serializing downstream compute (the straggler
    * documented on [[graft.Par.widen]]). Rewrites `path` into
    * ~`targetBytes` files via `coalesce` (narrow — no shuffle, each
    * output task just concatenates input splits) and swaps the
    * compacted copy in through the same checked-rename dance as
    * [[upsert]]. No-op when the layout is already at-or-below the
    * target file count. Returns the resulting data-file count.
    */
  def compact(spark: SparkSession, path: String,
              targetBytes: Long = 128L << 20): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    val dst = new Path(path)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // partitioned layout (dt=.../ dirs): compact each leaf partition
    // in place — a whole-table read would flatten the partition
    // columns into the data files and destroy pruning
    val partDirs = fs.listStatus(dst)
      .filter(e => e.isDirectory && e.getPath.getName.contains("="))
    if (partDirs.nonEmpty)
      return partDirs.map(d => compact(spark, d.getPath.toString, targetBytes)).sum
    def dataFiles(p: Path): Seq[org.apache.hadoop.fs.LocatedFileStatus] = {
      val it = fs.listFiles(p, true)
      val buf = Seq.newBuilder[org.apache.hadoop.fs.LocatedFileStatus]
      while (it.hasNext) {
        val f = it.next()
        val name = f.getPath.getName
        if (f.isFile && !name.startsWith("_") && !name.startsWith("."))
          buf += f
      }
      buf.result()
    }
    val before = dataFiles(dst)
    val nOut = math.max(1,
      math.ceil(before.map(_.getLen).sum.toDouble / targetBytes).toInt)
    if (before.size > nOut) {
      val tmp = new Path(path + "__staged")
      spark.read.parquet(path).coalesce(nOut)
        .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
      swapInto(fs, tmp, dst)
    }
    dataFiles(dst).size
  }

  /** Save as a bucketed table: both fact and dim bucketed on the join
    * key → joins between them are exchange-free (each bucket pair
    * joins locally). The bucketing survives restarts via the catalog.
    */
  def bucketedTable(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int, sortCol: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).format("parquet").saveAsTable(table)
  }
}
