package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic splitting / sampling for training-data pipelines.
  *
  * The training-pipeline requirement is STABILITY: the same row lands
  * in the same split tomorrow, on a different cluster, and after a
  * repartition — otherwise test data leaks into training over reruns.
  * Spark's `randomSplit`/`sample`/`stat.sampleBy` are seeded per
  * PARTITION, so their assignment changes with partitioning; these
  * operators hash a KEY instead (pure per-row codegen'd expressions,
  * zero shuffle, scan-speed at 100 TB).
  */
object Sampling {

  private val Buckets = 1000000L

  private def labelChain(bucket: Column, fractions: Seq[(String, Double)],
                         buckets: Long): Column = {
    require(fractions.nonEmpty, "at least one split required")
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      "fractions must sum to 1")
    val cuts = fractions.map(_._2).scanLeft(0.0)(_ + _).tail
    val chain = fractions.zip(cuts).init.foldLeft(Option.empty[Column]) {
      case (acc, ((label, _), cut)) =>
        val cond = bucket < lit(math.round(cut * buckets))
        Some(acc.fold(when(cond, lit(label)))(_.when(cond, lit(label))))
    }
    chain.fold(lit(fractions.head._1))(_.otherwise(lit(fractions.last._1)))
  }

  /** Assign every row a split label (e.g. train/val/test) from the
    * seeded hash of its key: stable across runs, partitioning, and
    * cluster size. Different seeds give independent splits (for
    * k-fold-style resampling).
    */
  def hashSplit(df: DataFrame, idCol: String,
                fractions: Seq[(String, Double)], seed: Long = 42L): DataFrame =
    df.withColumn("split",
      labelChain(pmod(xxhash64(col(idCol), lit(seed)), lit(Buckets)),
        fractions, Buckets))

  /** Modulo variant on a NUMERIC key — bit-portable to any SQL engine
    * (the correctness oracle for [[hashSplit]]'s assignment logic;
    * coarse `buckets` keep consecutive ids spread across splits).
    * Only as uniform as the key's residues; hashSplit is the default.
    */
  def modSplit(df: DataFrame, idCol: String,
               fractions: Seq[(String, Double)], buckets: Long = 100L): DataFrame =
    df.withColumn("split",
      labelChain(pmod(col(idCol).cast("long"), lit(buckets)), fractions, buckets))

  /** Deterministic per-stratum subsampling: keep each row iff its
    * key-hash bucket falls below its stratum's fraction. The
    * hash-threshold form keeps EXACTLY the same rows under any
    * partitioning (unlike `stat.sampleBy`), and a stratum missing
    * from `fractions` is dropped entirely — the downsample-the-
    * majority-class primitive.
    */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       fractions: Map[String, Double],
                       seed: Long = 42L): DataFrame = {
    val bucket = pmod(xxhash64(col(idCol), lit(seed)), lit(Buckets))
    val thresholds = fractions.foldLeft(lit(0L)) { case (acc, (stratum, f)) =>
      when(col(stratumCol) === stratum, lit(math.round(f * Buckets))).otherwise(acc)
    }
    df.filter(bucket < thresholds)
  }
}
