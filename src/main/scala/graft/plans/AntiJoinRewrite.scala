package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, EqualNullSafe, EqualTo, Expression, IsNull, Literal}
import org.apache.spark.sql.catalyst.plans.{LeftAnti, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** `left_outer` join + `IS NULL` filter → `LEFT ANTI` join.
  *
  * The reference's flagship anomaly query is written as
  * `join(tiles, ['user','h3'], 'left_outer').filter('cluster IS NULL')`
  * (`02_geofraud_fraud.py:62-68`), and stock Catalyst does NOT rewrite that
  * to an anti join (SURVEY §4.2) — the plan materializes every matched
  * right-side row just to throw it away. This rule rewrites the pattern when
  * the null-tested attribute is non-nullable on the right side pre-join
  * (then `IS NULL` ⟺ unmatched, and all right columns are NULL in every
  * surviving row):
  *
  * {{{ Filter(IsNull(r.a), Join(L, R, LeftOuter, cond))
  *     ⇒ Project(L.* ++ nulls-as-R.*, Join(L, R, LeftAnti, cond)) }}}
  *
  * The anti join never buffers right-side payload columns and can broadcast
  * the right side — at 100 TB the difference between shuffling the matched
  * majority and shipping nothing.
  *
  * Registered by [[GraftExtensions]]; also usable via
  * `spark.experimental.extraOptimizations`.
  */
object AntiJoinRewrite extends Rule[LogicalPlan] {

  /** Attributes appearing on either side of a strict-equality conjunct of
    * the join condition: for a matched row those are necessarily non-null
    * (NULL = x never matches), so `IS NULL` on them ⟺ unmatched. */
  private def equiKeyIds(cond: Option[Expression]): Set[Long] = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(a, b) => conjuncts(a) ++ conjuncts(b)
      case other => Seq(other)
    }
    cond.toSeq.flatMap(conjuncts).collect {
      case EqualTo(x: Attribute, y: Attribute) => Seq(x.exprId.id, y.exprId.id)
      // NOT EqualNullSafe: NULL <=> NULL matches, so IS NULL ≠ unmatched
    }.flatten.toSet
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Filter(IsNull(a: Attribute), j @ Join(l, r, LeftOuter, cond, _))
        if r.output.exists(ra => ra.exprId == a.exprId &&
          (!ra.nullable || equiKeyIds(cond).contains(ra.exprId.id))) =>
      val nullsForRight = r.output.map { ra =>
        Alias(Literal(null, ra.dataType), ra.name)(exprId = ra.exprId)
      }
      Project(l.output ++ nullsForRight, j.copy(joinType = LeftAnti))
  }
}
