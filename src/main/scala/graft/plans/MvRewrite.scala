package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types._

/** Registry of maintained materialized aggregates for
  * [[MvRewrite]] — which fact paths have an
  * [[graft.operators.IncrementalAgg]] state table, and where.
  * Registration is explicit (the maintenance job owns the state's
  * freshness contract); `clear()` between tests/sessions.
  */
object MvCatalog {
  final case class MvDef(factPath: String, groupKeys: Seq[String],
                         valueCol: String, statePath: String)
  private val defs =
    java.util.Collections.synchronizedList(new java.util.ArrayList[MvDef]())
  def register(d: MvDef): Unit = defs.add(d)
  def clear(): Unit = defs.clear()
  def all: Seq[MvDef] = {
    import scala.jdk.CollectionConverters._
    defs.asScala.toSeq
  }
}

/** Catalyst optimizer rule: answer matching aggregate queries from
  * the maintained [[graft.operators.IncrementalAgg]] state instead of
  * the fact — the materialized-view QUERY-REWRITE half of MV
  * maintenance (the half warehouses like Snowflake/BigQuery/
  * Databricks run transparently). A daily-maintained state table is
  * group-cardinality-sized; the fact is history-sized — at 100 TB the
  * rewrite turns a full-fact scan-and-shuffle into a scan of a table
  * millions of times smaller, with NO query change.
  *
  * Matches a logical `Aggregate` over a registered fact's file
  * relation (optionally through attribute-only Projects and a Filter
  * on group-key columns) whose grouping keys are a SUBSET of the MV's
  * group keys and whose aggregates are exactly-answerable from the
  * algebraic partials:
  *
  *  - `count(1)` / `count(*)`         → sum(n_rows)
  *  - `sum(cast(value as decimal(18,6)))` → sum(sum_value) (exact:
  *     decimal addition is associative — the state's partial is the
  *     same number the fact pass would produce)
  *  - `min(value)` / `max(value)`     → min(min_value) / max(max_value)
  *
  * Subset grain re-aggregates the state on the coarser keys (the
  * state is one row per fine-grain group, so this is a shuffle of
  * group cardinality, not history). `sum(value)` over raw DOUBLES is
  * deliberately NOT matched: float addition isn't associative, so the
  * state's sum is not bit-identical to a fact recompute. Output
  * attribute ids/names/types are preserved exactly, so parent
  * operators never notice the swap.
  *
  * The rewrite changes WHERE the numbers come from, not what they
  * are — correct iff the state is CURRENT for the fact (the
  * registration contract; the maintenance job registers after its
  * fold commits, mirroring every warehouse's staleness contract).
  * Disable per session with `spark.graft.mvRewrite.enabled=false`.
  */
object MvRewrite extends Rule[LogicalPlan] {

  val EnabledConf = "spark.graft.mvRewrite.enabled"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString(EnabledConf, "true") != "true" ||
      MvCatalog.all.isEmpty) return plan
    plan.transform {
      case agg: Aggregate => tryRewrite(agg).getOrElse(agg)
    }
  }

  /** Peel attribute-only Projects and at most one group-key Filter off
    * the aggregate child; return (relation, filterCond). */
  private def peel(plan: LogicalPlan): Option[(LogicalRelation, Option[Expression])] =
    plan match {
      case r: LogicalRelation => Some((r, None))
      case Project(list, child) if list.forall(_.isInstanceOf[AttributeReference]) =>
        peel(child)
      case Filter(cond, child) =>
        peel(child).flatMap {
          case (r, None) => Some((r, Some(cond)))
          case _ => None // one filter only
        }
      case _ => None
    }

  private def relationRoots(rel: LogicalRelation): Seq[String] =
    rel.relation match {
      case fs: HadoopFsRelation =>
        fs.location.rootPaths.map(_.toUri.getPath)
      case _ => Seq.empty
    }

  private def tryRewrite(agg: Aggregate): Option[LogicalPlan] = {
    val (rel, filterCond) = peel(agg.child).getOrElse(return None)
    val roots = relationRoots(rel)
    if (roots.isEmpty) return None
    val mv = MvCatalog.all.find(d =>
      roots.exists(r => r == new org.apache.hadoop.fs.Path(d.factPath).toUri.getPath))
      .getOrElse(return None)

    // grouping keys: attribute refs, each one of the MV's group keys
    val groupAttrs = agg.groupingExpressions.map {
      case a: AttributeReference if mv.groupKeys.contains(a.name) => a
      case _ => return None
    }
    // a filter may only reference group-key columns (then it commutes
    // with the aggregation and applies to the state as-is)
    filterCond.foreach { c =>
      if (!c.references.forall(a => mv.groupKeys.contains(a.name))) return None
      if (!c.deterministic) return None
    }

    // the state relation (analyzed, not optimized — this rule must not
    // recurse into itself, and an analyzed read is pre-optimizer)
    val spark = SparkSession.active
    val stateRel = spark.read.parquet(mv.statePath).queryExecution.analyzed
    val stateByName: Map[String, AttributeReference] =
      stateRel.output.collect { case a: AttributeReference => a.name -> a }.toMap
    val needed = mv.groupKeys ++ Seq("n_rows", "sum_value", "min_value", "max_value")
    if (!needed.forall(stateByName.contains)) return None
    def stateAttr(name: String): AttributeReference = stateByName(name)

    val keyMap: Map[ExprId, AttributeReference] =
      groupAttrs.map(a => a.exprId -> stateAttr(a.name)).toMap

    def aggCall(fn: AggregateFunction): AggregateExpression =
      AggregateExpression(fn, Complete, isDistinct = false)

    // map each output: group-key passthroughs and the answerable aggs
    val mapped: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case a: AttributeReference if keyMap.contains(a.exprId) =>
        Alias(keyMap(a.exprId), a.name)(exprId = a.exprId)
      case al @ Alias(a: AttributeReference, name) if keyMap.contains(a.exprId) =>
        Alias(keyMap(a.exprId), name)(exprId = al.exprId)
      case al @ Alias(AggregateExpression(fn, Complete, false, None, _), name) =>
        val replaced: Expression = fn match {
          case Count(Seq(Literal(1, IntegerType))) =>
            aggCall(Sum(stateAttr("n_rows")))
          case Sum(Cast(v: AttributeReference, dt: DecimalType, _, _), _)
            if v.name == mv.valueCol && dt == DecimalType(18, 6) =>
            Cast(aggCall(Sum(stateAttr("sum_value"))), al.dataType)
          case Min(v: AttributeReference) if v.name == mv.valueCol =>
            aggCall(Min(stateAttr("min_value")))
          case Max(v: AttributeReference) if v.name == mv.valueCol =>
            aggCall(Max(stateAttr("max_value")))
          case _ => return None
        }
        // count(1) over long partials: Sum(LongType) = LongType already
        val typed: Expression =
          if (replaced.dataType == al.dataType) replaced
          else Cast(replaced, al.dataType)
        Alias(typed, name)(exprId = al.exprId)
      case _ => return None
    }

    val filtered = filterCond match {
      case Some(c) =>
        val mappedCond = c.transform {
          case a: AttributeReference if keyMap.contains(a.exprId) => keyMap(a.exprId)
          // filter attrs are group keys not in the grouping list
          case a: AttributeReference if mv.groupKeys.contains(a.name) => stateAttr(a.name)
        }
        Filter(mappedCond, stateRel)
      case None => stateRel
    }
    Some(Aggregate(groupAttrs.map(a => keyMap(a.exprId)), mapped, filtered))
  }
}
