package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed k-means with DETERMINISTIC seeding and fixed-point
  * centroids — the clustering rung of the segmentation stack (RFM
  * scores → behavioral segments; embedding coarse-quantizers train
  * the same way — [[Similarity]]'s IVF consumes exactly such
  * centroids). Lloyd's algorithm, `rounds` fixed iterations:
  * assignment is argmin of the SQUARED distance, centroid update the
  * per-cluster mean.
  *
  * Engine-replayable by construction (the fixed-point discipline the
  * graph family uses): features are small integers (scores, bucketed
  * counts — the caller's contract), centroids ride as 1e6-scaled
  * LONGS re-ROUNDED after every update (`round(1e6·Σx/n)` — one
  * double division + round per cell per round), so every distance is
  * an EXACT integer `Σ_d (1e6·x_d − c6_d)²` and every argmin exact
  * with ties to the LOWER cluster id. Seeding is explicit: the
  * caller passes `init` centroids (unscaled feature-space doubles) —
  * deterministic by definition; k-means++'s randomness buys nothing
  * a fixed spread-corner seed doesn't here, and reproducibility
  * across engines/runs is the whole point.
  *
  * Scale shape (the IVF discipline): per round ONE k-bounded
  * driver pull (the k×dims centroid table — same bound the graded
  * IVF centroid collects document, SparkEntry.scala:3116's ≤16-row
  * precedent), then assignment is a pure CODEGEN'd expression over
  * literal centroids — zero joins, zero shuffles on the data path —
  * and the update one k-group aggregate. Data never moves; rounds
  * cost linearly. Empty clusters keep their previous centroid.
  */
object KMeans {

  /** @return (assignments DataFrame: idCol, cluster, per-feature
    *         columns, dist2 — the exact integer distance in 1e-12
    *         feature² units; centroids: Seq of (clusterId, dims as
    *         1e6-scaled longs)) */
  def fit(df: DataFrame, idCol: String, featureCols: Seq[String],
          init: Seq[Seq[Double]], rounds: Int): (DataFrame, Seq[Seq[Long]]) = {
    require(featureCols.nonEmpty, "featureCols must be non-empty")
    require(init.nonEmpty && init.forall(_.size == featureCols.size),
      "init centroids must match the feature dimensionality")
    require(rounds >= 1 && rounds <= 50, "rounds in [1, 50]")
    val k = init.size
    val dims = featureCols.size
    val base = graft.Par.persistTracked(
      df.select((col(idCol) +: featureCols.map(c => col(c).cast("long"))): _*))
    // ENFORCE the small-integer caller contract (r12 ADVICE): the
    // exact distance Σ_d (1e6·x − c6)² overflows Long once a per-dim
    // |x − c| nears 3e3, silently corrupting every argmin after the
    // wrap. Bound chosen so dims·(2·bound·1e6)² < Long.MaxValue:
    // one cheap max(abs) aggregate (scan + partial agg), paid once.
    val bound = math.floor(math.sqrt(Long.MaxValue.toDouble / dims) / 2e6).toLong
    require(init.flatten.forall(v => math.abs(v) <= bound.toDouble),
      s"init centroid magnitude exceeds the exact-integer bound ±$bound")
    val maxAbsCols = featureCols.map(c => max(abs(col(c))))
    val maxAbs = base.select(coalesce(
        (if (dims == 1) maxAbsCols.head else greatest(maxAbsCols: _*)),
        lit(0L)).as("m"))
      .head().getLong(0)
    require(maxAbs <= bound,
      s"feature magnitude $maxAbs exceeds the exact-integer k-means " +
        s"bound ±$bound for $dims dims — rescale/bucket features first")

    def dist2To(c6: Seq[Long]): Column =
      (0 until dims).map { d =>
        val diff = col(featureCols(d)) * lit(1000000L) - lit(c6(d))
        diff * diff
      }.reduce(_ + _)

    // sequential whens ⇒ ties go to the LOWER cluster id
    def assignExpr(cents: Seq[Seq[Long]]): Column = {
      val ds = cents.map(dist2To)
      (0 until k - 1).foldLeft(when(lit(false), -1)) { (acc, j) =>
        acc.when((j + 1 until k).map(l => ds(j) <= ds(l)).reduce(_ && _),
          lit(j))
      }.otherwise(lit(k - 1))
    }

    var cents: Seq[Seq[Long]] = init.map(_.map(v => math.round(v * 1e6)))
    (1 to rounds).foreach { _ =>
      val assigned = base.withColumn("__c", assignExpr(cents))
      // the ONE k-bounded driver pull per round (k·dims cells)
      val updated = assigned.groupBy(col("__c"))
        .agg(count(lit(1)).as("__n"),
          featureCols.map(c => sum(col(c)).as(s"__s_$c")): _*)
        .collect()
        .map { r =>
          val j = r.getInt(0)
          val n = r.getLong(1)
          j -> (0 until dims).map { d =>
            math.round(1e6 * r.getLong(2 + d).toDouble / n.toDouble)
          }
        }.toMap
      cents = cents.zipWithIndex.map { case (old, j) =>
        updated.getOrElse(j, old) // empty cluster keeps its centroid
      }
    }
    val out = base.withColumn("cluster", assignExpr(cents))
      .withColumn("dist2",
        (0 until k - 1).foldLeft(when(lit(false), lit(0L))) { (acc, j) =>
          acc.when(col("cluster") === j, dist2To(cents(j)))
        }.otherwise(dist2To(cents(k - 1))).cast("long"))
      .select((col(idCol) +: col("cluster") +:
        featureCols.map(col) :+ col("dist2")): _*)
    (out, cents)
  }
}
