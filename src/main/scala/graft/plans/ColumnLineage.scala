package graft.plans

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, ExprId, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.StringType

/** COLUMN-level lineage from the analyzed Catalyst plan — which
  * source-table columns feed each output column of a DataFrame.
  * `pipeline.Dag.lineage` answers "which MODELS feed this model"
  * (the dbt graph); this answers the auditor's finer question —
  * "does `revenue` depend on `l_discount`?" — without any manual
  * annotation, because the analyzed `LogicalPlan` already carries
  * exact attribute provenance: every `Alias` names the expression
  * tree it computes, every attribute has a stable `ExprId`, and leaf
  * relations know their files.
  *
  * The walk folds bottom-up over the plan, mapping each `ExprId` to
  * its set of (table, column) leaf sources:
  *  - file scans root the map (table = the path's basename);
  *  - `Project`/`Aggregate`/`Window` aliases take the union of their
  *    expression's references' sources (a computed column depends on
  *    everything in its tree — including aggregate inputs);
  *  - `Generate` (explode) maps generator outputs to the generator's
  *    references;
  *  - `Union` merges positionally (output column i descends from
  *    every child's column i);
  *  - joins/filters/sorts pass attributes through untouched (same
  *    ExprId), so they need no special case.
  *
  * Purely structural — nothing is executed, no data is read. Columns
  * whose provenance is synthetic (grouping ids, literals) report no
  * sources, which is itself the correct answer.
  */
object ColumnLineage {

  private type Src = (String, String)

  private def tableName(path: String): String = {
    val base = path.stripSuffix("/").split("/").last
    if (base.contains('.')) base.substring(0, base.lastIndexOf('.')) else base
  }

  private def resolveNamed(exprs: Seq[NamedExpression],
                           child: Map[ExprId, Set[Src]]): Map[ExprId, Set[Src]] =
    exprs.collect { case a @ Alias(c, _) =>
      a.exprId -> c.references.toSeq
        .flatMap(r => child.getOrElse(r.exprId, Set.empty[Src])).toSet
    }.toMap

  private def lineage(plan: LogicalPlan): Map[ExprId, Set[Src]] = plan match {
    case lr: LogicalRelation =>
      val name = lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.headOption
          .map(p => tableName(p.toString)).getOrElse("relation")
        case _ => "relation"
      }
      lr.output.map(a => a.exprId -> Set(name -> a.name)).toMap
    case lr: LocalRelation =>
      lr.output.map(a => a.exprId -> Set("local" -> a.name)).toMap
    case p: Project =>
      val child = lineage(p.child)
      child ++ resolveNamed(p.projectList, child)
    case a: Aggregate =>
      val child = lineage(a.child)
      child ++ resolveNamed(a.aggregateExpressions, child)
    case w: Window =>
      val child = lineage(w.child)
      child ++ resolveNamed(w.windowExpressions, child)
    case g: Generate =>
      val child = lineage(g.child)
      val srcs = g.generator.references.toSeq
        .flatMap(r => child.getOrElse(r.exprId, Set.empty[Src])).toSet
      child ++ g.generatorOutput.map(o => o.exprId -> srcs).toMap
    case u: Union =>
      val childMaps = u.children.map(lineage)
      val merged = childMaps.foldLeft(Map.empty[ExprId, Set[Src]]) {
        (acc, m) => acc ++ m
      }
      merged ++ u.output.zipWithIndex.map { case (o, i) =>
        o.exprId -> u.children.zip(childMaps).flatMap { case (c, m) =>
          m.getOrElse(c.output(i).exprId, Set.empty[Src])
        }.toSet
      }.toMap
    case other =>
      other.children.map(lineage)
        .foldLeft(Map.empty[ExprId, Set[Src]])(_ ++ _)
  }

  /** One row per (output column, source table, source column); output
    * columns with no traceable source (literals, synthetic ids) are
    * reported with NULL sources so the audit still lists them.
    */
  def of(df: DataFrame): DataFrame = {
    val spark: SparkSession = df.sparkSession
    val analyzed = df.queryExecution.analyzed
    val m = lineage(analyzed)
    val rows = analyzed.output.flatMap { a =>
      val srcs = m.getOrElse(a.exprId, Set.empty[Src]).toSeq.sorted
      if (srcs.isEmpty) Seq(Row(a.name, null, null))
      else srcs.map { case (t, c) => Row(a.name, t, c) }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("column", StringType, nullable = false),
        org.apache.spark.sql.types.StructField("source_table", StringType, nullable = true),
        org.apache.spark.sql.types.StructField("source_column", StringType, nullable = true))))
  }
}
