package graft.plans

import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.sources.GraftSqlTable

/** The analyzer half of [[graft.sources.GraftCatalog]] — the
  * DeltaAnalysis pattern: a `DataSourceV2Relation` over a
  * [[GraftSqlTable]] is REPLACED by the format reader's own logical
  * plan, re-aliased onto the relation's output attributes (explicit
  * exprIds, so every downstream reference keeps resolving). After this
  * rule the V2 relation is gone from the plan: Catalyst optimizes
  * ordinary parquet scans (plus the reader's DV/MoR joins where the
  * table carries them), so pushdown, pruning and join planning behave
  * exactly as the path-API reads — the catalog adds a NAME, not an
  * execution layer.
  *
  * `reread()` builds a FRESH plan (fresh expression ids) per relation
  * occurrence: a self-join of one catalog table substitutes two
  * independent subtrees and can never alias attributes across sides.
  * Installed by [[GraftExtensions]] as a resolution rule (post-hoc
  * batch — the relation is resolved by then, its output fixed). */
object CatalogTableSubstitution extends Rule[LogicalPlan] {
  // TARGETS of write/DML commands stay V2 relations untouched. An
  // INSERT's AppendData holds its target as `table: NamedRelation`
  // (not a tree child — verified structurally on Spark 4.1.2), so the
  // traversal cannot reach it; but DELETE/UPDATE/MERGE commands hold
  // the target AS A CHILD, and rewriting it would leave the planner an
  // "unexpected table relation". Their READ sides still substitute: a
  // MERGE whose SOURCE is a catalog table reads it like any query. A
  // relation that dodges substitution entirely (a DML-condition
  // subquery, a session without the extensions) fails at EXECUTION
  // through the plan-only scan stub's toBatch refusal — loud, with the
  // remedy named, never a silent mis-plan.
  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case d: org.apache.spark.sql.catalyst.plans.logical.DeleteFromTable => d
    case u: org.apache.spark.sql.catalyst.plans.logical.UpdateTable => u
    case m: org.apache.spark.sql.catalyst.plans.logical.MergeIntoTable =>
      m.copy(sourceTable = substitute(m.sourceTable))
    case p => substitute(p)
  }

  private def substitute(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftSqlTable] =>
        val child = r.table.asInstanceOf[GraftSqlTable].reread()
          .queryExecution.analyzed
        // names AND types positionally equal — the pinned version makes
        // drift impossible in normal operation, so a mismatch here means
        // a reader bug; aliasing on length alone could mislabel a column
        val drift = r.output.zip(child.output).collect {
          case (out, in) if out.name != in.name || out.dataType != in.dataType =>
            s"${out.name}: ${out.dataType.simpleString} vs " +
              s"${in.name}: ${in.dataType.simpleString}"
        }
        require(child.output.length == r.output.length && drift.isEmpty,
          s"catalog table ${r.table.name()}: reader plan emits " +
            s"(${child.output.map(_.name).mkString(", ")}) but the " +
            s"relation expects (${r.output.map(_.name).mkString(", ")})" +
            (if (drift.nonEmpty) s" — drift: ${drift.mkString("; ")}" else "") +
            " — the table changed shape between load and analysis")
        Project(r.output.zip(child.output).map { case (out, in) =>
          Alias(in, out.name)(exprId = out.exprId)
        }, child)
    }
}
