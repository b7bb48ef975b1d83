package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, NamedExpression, RowNumber, SortOrder, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, Sort, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Fold a decorrelated LATERAL's global sort into the window's own
  * orderSpec.
  *
  * Catalyst decorrelates `LATERAL (... ORDER BY o LIMIT 1)` (q118's
  * top-1-per-row) into `row_number() OVER (PARTITION BY k)` with an EMPTY
  * window orderSpec over a GLOBAL `Sort(o)` — the row pick rides on the
  * global sort's row order surviving the window's hash exchange, and the
  * physical plan pays a full range-sample + shuffle + sort of the inner
  * table before the window's own exchange re-clusters it (PLANS.md r6:
  * the one redundant exchange+sort pair in the SQL surface). At 100 TB
  * the global sort is a whole extra pass over the table; order-through-
  * shuffle is also the fragile half of the contract (it relies on map
  * outputs being concatenated in order).
  *
  * Rewrite: move the sort's ordering INTO the window spec —
  * {{{ Window([rn = row_number() OVER (PARTITION BY k)], k, Nil,
  *            Project(cols, Sort(o, global, child)))
  *     ⇒ Project(originalOutput,
  *         Window([rn OVER (PARTITION BY k ORDER BY o)], k, o,
  *                Project(cols ++ o's attrs, child))) }}}
  * — one hash exchange + one per-partition sort on (k, o), no global
  * sort, deterministic per-partition order by construction. Identical
  * results: within each k-partition the global-sort plan also presented
  * rows in `o` order, so row_number assigns the same ranks (ties are
  * nondeterministic in both spellings).
  *
  * SAFETY: fires only on the decorrelation artifact — every window
  * expression is `row_number()` and the node's orderSpec is empty. The
  * user-facing API and SQL both REJECT an un-ordered row_number
  * ("requires window to be ordered"), so an empty orderSpec can only come
  * from an internal rewrite whose semantics this rule preserves.
  * Registered by [[GraftExtensions]]. */
object LateralTopKRewrite extends Rule[LogicalPlan] {

  private def isRowNumber(ne: NamedExpression): Boolean = ne match {
    case Alias(WindowExpression(_: RowNumber, spec: WindowSpecDefinition), _) =>
      spec.orderSpec.isEmpty
    case _ => false
  }

  private def withOrder(order: Seq[SortOrder])(ne: NamedExpression): NamedExpression =
    ne match {
      case a @ Alias(we @ WindowExpression(_, spec: WindowSpecDefinition), name) =>
        Alias(we.copy(windowSpec = spec.copy(orderSpec = order)), name)(
          exprId = a.exprId, qualifier = a.qualifier,
          explicitMetadata = a.explicitMetadata)
      case other => other
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case w @ Window(wexprs, part, Seq(),
        Project(projList, Sort(order, true, child, _)), hint)
        if wexprs.nonEmpty && wexprs.forall(isRowNumber) &&
          projList.forall(_.isInstanceOf[Attribute]) &&
          order.forall(_.child.deterministic) &&
          order.flatMap(_.references.toSeq).forall(child.outputSet.contains) =>
      val projAttrs = projList.map(_.asInstanceOf[Attribute])
      val missing = order.flatMap(_.references.toSeq).distinct
        .filterNot(a => projAttrs.exists(_.exprId == a.exprId))
      val inner = Project(projAttrs ++ missing, child)
      val rewritten = Window(wexprs.map(withOrder(order)), part, order, inner, hint)
      // restore the node's original output (the widened inner projection
      // would otherwise leak the order columns to consumers upstream)
      Project(w.output, rewritten)

    case w @ Window(wexprs, part, Seq(), Sort(order, true, child, _), hint)
        if wexprs.nonEmpty && wexprs.forall(isRowNumber) &&
          order.forall(_.child.deterministic) &&
          order.flatMap(_.references.toSeq).forall(child.outputSet.contains) =>
      Window(wexprs.map(withOrder(order)), part, order, child, hint)
  }
}
