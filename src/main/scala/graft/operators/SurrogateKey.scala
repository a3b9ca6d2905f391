package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dense surrogate-key assignment — `row_number() OVER (ORDER BY …)`
  * without the single-reducer global window.
  *
  * Every warehouse load that mints integer surrogate keys for a
  * dimension (the reference's dims carry synthetic keys the way any
  * star schema does) needs a GLOBAL dense numbering. The naive Spark
  * form — `row_number().over(Window.orderBy(...))` — plans a
  * SinglePartition exchange: at 100 TB one task sorts and numbers the
  * whole table. The standard distributed fix is two-phase:
  *
  *  1. range-partition + local sort on the order keys (Spark's normal
  *     distributed sort — partition p holds a contiguous key range,
  *     ranges ascending with p);
  *  2. count rows per partition (a numPartitions-sized driver array —
  *     bootstrap-scalar, like the IVF centroid pull), prefix-sum the
  *     counts into per-partition offsets;
  *  3. number rows within each partition independently and add the
  *     partition's offset.
  *
  * The within-partition numbering reuses `row_number` over a window
  * PARTITIONED by the physical partition id, so no window partition
  * exceeds one range partition — reducers stay parallel. Rows must be
  * totally ordered by `orderCols` (append a unique tiebreaker column;
  * ties would make the numbering nondeterministic — same contract as
  * SQL's row_number over a non-unique ORDER BY).
  *
  * Global order still holds across the pid-hash shuffle of step 3:
  * the window re-sorts each pid group on `orderCols`, and pid order
  * equals range order from step 1.
  */
object SurrogateKey {

  /** Assign 1..N dense keys ordered by `orderCols` into `outCol`. */
  def assign(df: DataFrame, orderCols: Seq[String],
             outCol: String = "sk"): DataFrame = {
    require(orderCols.nonEmpty, "need at least one ordering column")
    require(!df.columns.contains(outCol), s"column $outCol already exists")
    val spark = df.sparkSession
    val ranged = df
      .repartitionByRange(orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
      .withColumn("__pid", spark_partition_id())
    val tracked = graft.Par.persistTracked(ranged)
    // numPartitions rows to the driver: the documented bootstrap-sized
    // pull (same class as the IVF centroid fetch), NOT a data collect
    val counts = tracked.groupBy("__pid").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // offset(p) = rows in all partitions before p
    val offsetMap = {
      val pids = counts.keys.toSeq.sorted
      val cum = pids.scanLeft(0L)((acc, p) => acc + counts(p))
      pids.zip(cum).toMap
    }
    val offDf = spark.createDataFrame(
      offsetMap.toSeq.map { case (p, o) => (p, o) })
      .toDF("__pid", "__off")
    val w = Window.partitionBy("__pid")
      .orderBy(orderCols.map(col): _*)
    tracked
      .join(F.broadcast(offDf), Seq("__pid"))
      .withColumn(outCol, row_number().over(w).cast("long") + col("__off"))
      .drop("__pid", "__off")
  }
}
