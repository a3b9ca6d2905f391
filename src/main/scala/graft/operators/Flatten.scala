package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Nested-document flattening — the reference ingests MongoDB
  * documents and normalizes nested fields into flat warehouse columns
  * (reference: dagster_code/clickhouse_load_tool/mongo_loader.py,
  * which walks each document and emits `parent_child` columns).
  *
  * Here the same normalization is schema-driven and fully
  * declarative: the struct tree is read from the DataFrame schema at
  * plan time and flattened into one `select` of `getField` chains —
  * pure per-row projections (codegen'd, zero shuffle, columns prune
  * into the parquet scan). Schema drift is handled by construction:
  * whatever struct fields arrive in this batch's schema are the ones
  * that get flattened, so a source adding a nested field needs no
  * code change.
  */
object Flatten {

  /** Flatten every (arbitrarily deep) struct column into top-level
    * columns named `parent<sep>child<sep>...`; non-struct columns
    * (including arrays and maps) pass through unchanged — exploding
    * arrays changes cardinality and stays a separate, caller-chosen
    * step.
    */
  def flatten(df: DataFrame, sep: String = "_"): DataFrame = {
    def walk(c: Column, dt: DataType, path: Seq[String]): Seq[Column] = dt match {
      case s: StructType =>
        s.fields.toSeq.flatMap(f => walk(c.getField(f.name), f.dataType, path :+ f.name))
      case _ => Seq(c.as(path.mkString(sep)))
    }
    val cols = df.schema.fields.toSeq.flatMap { f =>
      walk(df(s"`${f.name}`"), f.dataType, Seq(f.name))
    }
    df.select(cols: _*)
  }

  /** Parse a JSON string column with the given schema and flatten the
    * result in place of the original column — the one-step "Mongo
    * document arrives as JSON text" path (reference mongo_loader.py
    * normalizes exactly this shape).
    */
  def flattenJson(df: DataFrame, jsonCol: String, schema: String,
                  sep: String = "_"): DataFrame =
    flatten(df.withColumn(jsonCol,
      from_json(col(jsonCol), DataType.fromDDL(schema))), sep)
}
