package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generalized MERGE INTO — the SQL:2003 / Delta / Iceberg merge
  * statement as a batch operator: WHEN MATCHED [AND cond] THEN
  * UPDATE/DELETE, WHEN NOT MATCHED [AND cond] THEN INSERT, WHEN NOT
  * MATCHED BY SOURCE [AND cond] THEN UPDATE/DELETE. The reference's
  * load tool implements the special case "matched → replace, not
  * matched → insert" (base_loader.py:419 delete+insert upsert);
  * conditional clause chains are what a warehouse MERGE adds on top
  * (partial updates, conditional deletes, source-driven retirement).
  *
  * Plan: ONE full-outer equi-join on the key (each side shuffles
  * once on the key — with AQE a small source side broadcasts and the
  * target never moves); every clause compiles into a codegen'd
  * when()-chain over the joined row, evaluated in DECLARATION ORDER
  * (first matching clause wins, SQL MERGE semantics). No windows, no
  * second pass; output is target-schema.
  *
  * Clause conditions and update expressions reference the two sides
  * through the dataset aliases `t` (target) and `s` (source):
  * `col("s.price") > col("t.price")`. A source row that matches no
  * NOT-MATCHED clause is ignored; a target row that matches no
  * clause survives unchanged.
  *
  * Contract: source must be key-unique (dedup upstream with
  * [[Cdc.dedupLatestPerKey]] — multiple source matches per target
  * key would be the ambiguous-merge error every engine rejects);
  * NULL keys never match (SQL equality), so a null-keyed source row
  * is "not matched".
  */
object Merge {

  sealed trait MatchedClause
  /** Update target columns (absent columns keep target values). */
  final case class MatchedUpdate(set: Map[String, Column],
                                 cond: Option[Column] = None) extends MatchedClause
  final case class MatchedDelete(cond: Option[Column] = None) extends MatchedClause

  sealed trait NotMatchedClause
  /** Insert the source row; `set` overrides per-column (absent target
    * columns take the same-name source column, or NULL if the source
    * lacks it). */
  final case class NotMatchedInsert(set: Map[String, Column] = Map.empty,
                                    cond: Option[Column] = None) extends NotMatchedClause

  sealed trait NotMatchedBySourceClause
  final case class NotMatchedBySourceUpdate(set: Map[String, Column],
                                            cond: Option[Column] = None) extends NotMatchedBySourceClause
  final case class NotMatchedBySourceDelete(cond: Option[Column] = None) extends NotMatchedBySourceClause

  def mergeInto(target: DataFrame, source: DataFrame, keys: Seq[String],
                matched: Seq[MatchedClause] = Seq.empty,
                notMatched: Seq[NotMatchedClause] = Seq.empty,
                notMatchedBySource: Seq[NotMatchedBySourceClause] = Seq.empty): DataFrame = {
    require(keys.nonEmpty, "merge needs at least one key column")
    // explicit existence markers — presence must NOT be inferred from
    // key nullability, or a null-keyed source row (which matches
    // nothing under SQL equality and is therefore an INSERT candidate)
    // would read as "no side present" and vanish
    val t = target.withColumn("__t_exists", lit(true)).alias("t")
    val s = source.withColumn("__s_exists", lit(true)).alias("s")
    val joinCond = keys.map(k => col(s"t.$k") === col(s"s.$k")).reduce(_ && _)
    val j = t.join(s, joinCond, "full_outer")

    val tPresent = col("t.__t_exists").isNotNull
    val sPresent = col("s.__s_exists").isNotNull
    val isMatched = tPresent && sPresent
    val sOnly = !tPresent && sPresent
    val tOnly = tPresent && !sPresent

    val targetCols = target.columns.toSeq
    val sourceCols = source.columns.toSet

    def clauseGuard(base: Column, cond: Option[Column], priors: Seq[Option[Column]]): Column =
      priors.foldLeft(base && cond.getOrElse(lit(true))) { (acc, prior) =>
        acc && !coalesce(prior.getOrElse(lit(true)), lit(false))
      }

    // per-clause firing predicates, in declaration order (a clause
    // fires only when no earlier clause of its group fired)
    def firing[C](clauses: Seq[C], base: Column, cond: C => Option[Column]): Seq[Column] =
      clauses.zipWithIndex.map { case (c, i) =>
        clauseGuard(base, cond(c), clauses.take(i).map(cond))
      }

    val matchedFire = firing[MatchedClause](matched, isMatched, {
      case MatchedUpdate(_, c) => c
      case MatchedDelete(c) => c
    })
    val notMatchedFire = firing[NotMatchedClause](notMatched, sOnly, {
      case NotMatchedInsert(_, c) => c
    })
    val nmbsFire = firing[NotMatchedBySourceClause](notMatchedBySource, tOnly, {
      case NotMatchedBySourceUpdate(_, c) => c
      case NotMatchedBySourceDelete(c) => c
    })

    // survival: matched rows die on a firing MatchedDelete; source-only
    // rows live only on a firing insert; target-only rows die on a
    // firing NotMatchedBySourceDelete.
    val deleteMatched = matched.zip(matchedFire).collect {
      case (MatchedDelete(_), f) => f
    }.foldLeft(lit(false))(_ || _)
    val insertFires = notMatchedFire.foldLeft(lit(false))(_ || _)
    val deleteTOnly = notMatchedBySource.zip(nmbsFire).collect {
      case (NotMatchedBySourceDelete(_), f) => f
    }.foldLeft(lit(false))(_ || _)
    val keep = (isMatched && !deleteMatched) ||
      (sOnly && insertFires) || (tOnly && !deleteTOnly)

    // per-column value: walk the firing clauses of the row's group
    val outCols = targetCols.map { c =>
      val tc = col(s"t.$c")
      val insertDefault = if (sourceCols(c)) col(s"s.$c") else lit(null)
      val updateCases = matched.zip(matchedFire).collect {
        case (MatchedUpdate(set, _), f) if set.contains(c) => (f, set(c))
      }
      val insertCases = notMatched.zip(notMatchedFire).map {
        case (NotMatchedInsert(set, _), f) => (f, set.getOrElse(c, insertDefault))
      }
      val nmbsCases = notMatchedBySource.zip(nmbsFire).collect {
        case (NotMatchedBySourceUpdate(set, _), f) if set.contains(c) => (f, set(c))
      }
      val cases = updateCases ++ insertCases ++ nmbsCases
      cases.foldRight(tc) { case ((f, v), acc) => when(f, v).otherwise(acc) }
        .as(c)
    }
    j.filter(keep).select(outCols: _*)
  }
}
