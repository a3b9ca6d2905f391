package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Schema evolution between source batches and a warehouse target —
  * the #1 operational event in a CDC pipeline (a source adds a
  * field). The reference derives and reconciles target DDL from
  * incoming data (reference: base_loader.py:867
  * `_create_table_from_file`, base_loader.py:996
  * `_generate_create_table_ddl`, base_loader.py:124
  * `get_clickhouse_table_schema`); here the same reconciliation is
  * schema-level and declarative — pure projections, no data pass.
  */
object SchemaEvolution {

  /** The evolved target schema: every target field (unchanged, in
    * order), plus fields the incoming batch added (appended in batch
    * order). Additive-only — a field DISAPPEARING from the source
    * never drops a warehouse column (the reference's create-if-absent
    * DDL has the same property); type changes keep the target type
    * (align() casts the batch).
    */
  def evolve(target: StructType, incoming: StructType): StructType = {
    val known = target.fieldNames.toSet
    StructType(target.fields ++ incoming.fields.filterNot(f => known(f.name)))
  }

  /** Conform a batch to `target`: missing columns become typed nulls,
    * present columns cast to the target type, column order matches
    * the target. `keepExtra=true` appends batch-only columns after
    * the target columns (pair with [[evolve]] to widen the target
    * first when the warehouse should absorb them).
    */
  def align(df: DataFrame, target: StructType, keepExtra: Boolean = false): DataFrame = {
    val present = df.columns.toSet
    val conformed: Seq[Column] = target.fields.toSeq.map { f =>
      if (present(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }
    val extras: Seq[Column] =
      if (keepExtra) df.columns.toSeq.filterNot(target.fieldNames.contains).map(col)
      else Nil
    df.select(conformed ++ extras: _*)
  }

  /** Data-contract compatibility report — the schema gate a load
    * runs BEFORE any data movement (schema-only, no scan): classify
    * every column of the incoming batch against the registered
    * contract. `added` (new nullable column the warehouse can absorb
    * via [[evolve]]) and `widened` (the incoming type up-casts
    * LOSSLESSLY into the contract type — Catalyst's `canUpCast`
    * rule) are compatible; `removed`, `narrowed`/`changed` (lossy or
    * incompatible type drift) are breaking. One row per column,
    * `compatible` false = block the load and page the producer.
    */
  def compatReport(spark: org.apache.spark.sql.SparkSession,
                   contract: StructType, incoming: StructType): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.Cast
    val inMap = incoming.fields.map(f => f.name -> f).toMap
    val known = contract.fieldNames.toSet
    val rows: Seq[(String, String, String, String, Boolean)] =
      contract.fields.toSeq.map { f =>
        inMap.get(f.name) match {
          case None =>
            (f.name, f.dataType.simpleString, null, "removed", false)
          case Some(g) if g.dataType == f.dataType =>
            (f.name, f.dataType.simpleString, g.dataType.simpleString,
              "unchanged", true)
          case Some(g) if Cast.canUpCast(g.dataType, f.dataType) =>
            (f.name, f.dataType.simpleString, g.dataType.simpleString,
              "widened", true)
          case Some(g) =>
            (f.name, f.dataType.simpleString, g.dataType.simpleString,
              "changed", false)
        }
      } ++ incoming.fields.toSeq.filterNot(f => known(f.name)).map { g =>
        (g.name, null, g.dataType.simpleString, "added", true)
      }
    import spark.implicits._
    rows.toDF("column", "contract_type", "incoming_type", "change",
      "compatible")
  }

  /** Union batches whose schemas drifted: the combined schema is the
    * evolution of the first batch's schema by each later batch;
    * every batch is aligned (null-filled / cast) before the union.
    * This is the read-side twin of the reference's DDL reconcile.
    */
  def unionEvolved(batches: Seq[DataFrame]): DataFrame = {
    require(batches.nonEmpty, "unionEvolved needs at least one batch")
    val schema = batches.map(_.schema).reduce(evolve)
    batches.map(align(_, schema)).reduce(_ unionByName _)
  }
}
