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
}
