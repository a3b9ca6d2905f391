package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns via a native
  * Catalyst expression ([[DotProduct]]) with `doGenCode` — a tight
  * primitive loop inside whole-stage codegen, no UDF, no per-row
  * intermediate arrays.
  *
  * All arithmetic is done in double (arrays cast up front): summation
  * order is ascending index, so results are deterministic and
  * reproducible across engines.
  */
object Vectors {
  def toDouble(v: Column): Column = v.cast("array<double>")

  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(DotProduct(
      GraftSqlBridge.expression(toDouble(a)),
      GraftSqlBridge.expression(toDouble(b))))
  }

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Merge-walk |a ∩ b| over two SORTED duplicate-free `array<bigint>`
    * columns ([[SortedIntersectCount]]): allocation-free codegen'd
    * alternative to `size(array_intersect(...))` for the dedup
    * rescore hot path.
    */
  def sortedIntersectCount(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(SortedIntersectCount(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
  }
}
