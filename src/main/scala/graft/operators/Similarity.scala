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

  /** Deterministic pseudo-random hyperplane component for (table,
    * plane, dim): a hash folded into [-1, 1]. No RNG state to ship —
    * every executor regenerates the same planes from the literal
    * expression (fixed public formula, stable across runs).
    */
  private def planeComponent(table: Int, plane: Column, dim: Column): Column =
    (pmod(xxhash64(lit(table), plane, dim), lit(2000001L)) - 1000000L)
      .cast("double") / 1000000.0

  /** Sign-bit bucket id of `vec` under `planes` hyperplanes (table 0). */
  def hyperplaneBucket(vec: Column, planes: Int, table: Int = 0): Column = {
    val v = Vectors.toDouble(vec)
    val bits = transform(sequence(lit(0), lit(planes - 1)), p => {
      val dotp = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1),
          (x, d) => x * planeComponent(table, p, d)),
        lit(0.0), (acc, x) => acc + x)
      when(dotp >= 0, lit(1L)).otherwise(lit(0L))
    })
    aggregate(zip_with(bits, sequence(lit(0), lit(planes - 1)),
        (bit, p) => call_function("shiftleft", bit, p)),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
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
    val c = graft.Par.widen(corpus)
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
    val c = bucketed(graft.Par.widen(corpus), idCol, "neighbor_id", "__cv", "__cn")
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
