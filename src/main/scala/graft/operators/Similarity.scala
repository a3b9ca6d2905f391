package graft.operators

import graft.functions.Vectors
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *  - `bruteForceTopK`: exact. Queries are broadcast (a query set is
  *    always small relative to the corpus); ONE streaming pass over
  *    the corpus computes all query×doc cosines, then a per-query
  *    top-k window. At 100 TB this is corpus-scan bound — the right
  *    baseline and the recall oracle.
  *  - `lshTopK`: random-hyperplane LSH (Charikar '02). Sign-bit
  *    signature buckets both sides; only same-bucket pairs are
  *    scored. Multiple hash tables (`tables`) trade compute for
  *    recall. The shuffle key is (table, bucket) so the join never
  *    leaves its bucket.
  */
object Similarity {

  /** Deterministic pseudo-random hyperplane for (table, plane):
    * components from the splitmix64 finalizer (public-domain PRNG
    * mixing function) folded into [-1, 1]. Generated driver-side and
    * shipped as array literals — the bucket computation is then a
    * flat chain of codegen'd [[graft.functions.DotProduct]] calls,
    * not a nested-lambda tree (which costs 10-30 s of Catalyst plan
    * time at 8 planes × 64 dims).
    */
  private[operators] def planeVec(table: Int, plane: Int, dims: Int): Seq[Double] =
    Seq.tabulate(dims) { d =>
      var z = table.toLong * 0x9E3779B97F4A7C15L +
        plane.toLong * 0xC2B2AE3D27D4EB4FL +
        d.toLong * 0x165667B19E3779F9L + 0x27D4EB2F165667C5L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z = z ^ (z >>> 31)
      z.toDouble / Long.MaxValue.toDouble
    }

  /** Sign-bit bucket id of `vec` under `planes` hyperplanes (table 0).
    * `dims` caps the plane length; DotProduct stops at the shorter
    * array, so vectors of any dimension ≤ dims bucket correctly.
    */
  def hyperplaneBucket(vec: Column, planes: Int, table: Int = 0,
                       dims: Int = 512): Column = {
    val v = Vectors.toDouble(vec)
    (0 until planes).map { p =>
      val plane = typedLit(planeVec(table, p, dims))
      when(Vectors.dot(v, plane) >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
  }

  /** Exact top-k neighbors for each query vector.
    * `queries`: (queryIdCol, vecCol) — broadcast. Output:
    * (query_id, neighbor_id, cosine, rank), rank 1..k, ties broken
    * by neighbor id for determinism.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, queryIdCol: String,
                     k: Int, excludeSelf: Boolean = true): DataFrame = {
    // norms computed once per side; the per-pair cost is one dot product
    val c = graft.Par.widen(corpus, idCol)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
      .withColumn("__cn", Vectors.norm(col("__cv")))
    val q = queries.select(col(queryIdCol).as("query_id"), col(vecCol).as("__qv"))
      .withColumn("__qn", Vectors.norm(col("__qv")))
    val scored = c.crossJoin(broadcast(q))
      .filter(if (excludeSelf) col("neighbor_id") =!= col("query_id") else lit(true))
      .select(col("query_id"), col("neighbor_id"),
        (Vectors.dot(col("__cv"), col("__qv")) / (col("__cn") * col("__qn"))).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** IVF (inverted-file) ANN: k-means coarse quantizer over the
    * corpus; each query probes only the `nprobe` nearest centroid
    * cells. The scale path for big corpora: candidate count is
    * ~corpus × nprobe/nlist instead of the full scan, and the
    * candidate join is an equi-join on the centroid id (hash shuffle,
    * cell-local scoring). Centroids are tiny (nlist × dim) and
    * broadcast. Deterministic via fixed seed.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, queryIdCol: String,
              k: Int, nlist: Int = 16, nprobe: Int = 4,
              excludeSelf: Boolean = true): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = corpus.sparkSession
    import spark.implicits._

    val c = graft.Par.widen(corpus, idCol)
      .select(col(idCol).as("neighbor_id"), Vectors.toDouble(col(vecCol)).as("__cv"))
      .withColumn("__cn", Vectors.norm(col("__cv")))
    val model = new KMeans().setK(nlist).setSeed(42L).setMaxIter(10)
      .setFeaturesCol("__feat").setPredictionCol("__cell")
      .fit(c.withColumn("__feat", array_to_vector(col("__cv"))))
    // corpus rows assigned to their cell
    val assigned = model.transform(c.withColumn("__feat", array_to_vector(col("__cv"))))
      .select(col("__cell"), col("neighbor_id"), col("__cv"), col("__cn"))
    // tiny centroid table, broadcast to rank cells per query
    val cents = model.clusterCenters.zipWithIndex
      .map { case (v, i) => (i, v.toArray) }.toSeq
      .toDF("__cell", "__centroid")
    val q = queries
      .select(col(queryIdCol).as("query_id"), Vectors.toDouble(col(vecCol)).as("__qv"))
      .withColumn("__qn", Vectors.norm(col("__qv")))
    val wCell = Window.partitionBy(col("query_id"))
      .orderBy(col("__cdist").asc, col("__cell").asc)
    val probes = q.crossJoin(broadcast(cents))
      // squared L2 to centroid: |q|² - 2q·c + |c|² ; monotone in q·c
      // relative ranking only, so the dot-based form is enough
      .withColumn("__cdist",
        -Vectors.dot(col("__qv"), col("__centroid")) * 2 +
          Vectors.dot(col("__centroid"), col("__centroid")))
      .withColumn("__cr", row_number().over(wCell))
      .filter(col("__cr") <= nprobe)
      .select(col("__cell"), col("query_id"), col("__qv"), col("__qn"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    assigned.join(probes, Seq("__cell"))
      .filter(if (excludeSelf) col("neighbor_id") =!= col("query_id") else lit(true))
      .select(col("query_id"), col("neighbor_id"),
        (Vectors.dot(col("__cv"), col("__qv")) / (col("__cn") * col("__qn"))).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** LSH-bucketed ANN: same output shape as bruteForceTopK but only
    * scores same-bucket candidates across `tables` hash tables.
    * Recall rises with tables and falls with planes (bucket width).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, queryIdCol: String,
              k: Int, planes: Int = 8, tables: Int = 4,
              excludeSelf: Boolean = true): DataFrame = {
    def bucketed(df: DataFrame, id: String, out: String, vecOut: String, nrmOut: String) = {
      val withTables = (0 until tables).map { t =>
        df.select(lit(t).as("table"),
          hyperplaneBucket(col(vecCol), planes, t).as("bucket"),
          col(id).as(out), col(vecCol).as(vecOut),
          Vectors.norm(col(vecCol)).as(nrmOut))
      }
      withTables.reduce(_ unionByName _)
    }
    val c = bucketed(graft.Par.widen(corpus, idCol), idCol, "neighbor_id", "__cv", "__cn")
    val q = bucketed(queries, queryIdCol, "query_id", "__qv", "__qn")
    val candidates = c.join(q, Seq("table", "bucket"))
      .filter(if (excludeSelf) col("neighbor_id") =!= col("query_id") else lit(true))
      .select(col("query_id"), col("neighbor_id"), col("__cv"), col("__qv"), col("__cn"), col("__qn"))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    candidates
      .select(col("query_id"), col("neighbor_id"),
        (Vectors.dot(col("__cv"), col("__qv")) / (col("__cn") * col("__qn"))).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
