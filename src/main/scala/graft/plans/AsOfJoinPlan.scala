package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** The whole-operator extension surface (SURVEY §7.3 preference ladder
  * step (c)): a custom `LogicalPlan` node, a `SparkStrategy` planning it,
  * and a `SparkPlan` executing it — for LEFT AS-OF JOIN, which Spark's
  * built-in operators cannot express as a single pass (the composed
  * spelling in [[graft.operators.AsOfJoin.leftAsOf]] pays a union + a
  * carry-forward window over the merged rows; a naive non-equi join plans
  * as a nested-loop pair blowup).
  *
  * [[AsOfJoinExec]] instead declares the distribution/ordering it needs —
  * hash-clustered on the key, sorted by (key, time) — and lets
  * EnsureRequirements insert the exchanges, then streams BOTH sides in one
  * co-partitioned merge: for each left row, right rows are consumed while
  * their (key, time) sort position is ≤ the left row's; the last consumed
  * row IS the latest right row at-or-before the left timestamp whenever
  * its key matches (rows of the left key sort after every smaller key, so
  * a stale candidate from a previous key can never mask a real one). Cost:
  * one shuffle + sort per side and O(|L|+|R|) merge work per partition, no
  * union row blowup, no window state.
  *
  * Same contract as the composed operator: inclusive `<=`; right rows
  * carrying NULL time are filtered API-side (no timeline position); NULL
  * keys group together (the window spelling's partitionBy semantics);
  * ties on (key, time) resolve to the last row in sort order — callers
  * needing determinism under ties dedup first (q27's contract). */
case class AsOfJoinNode(left: LogicalPlan, right: LogicalPlan,
                        leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
                        leftTime: Attribute, rightTime: Attribute,
                        rightPayload: Seq[Attribute]) extends BinaryNode {
  require(leftKeys.nonEmpty && leftKeys.length == rightKeys.length)
  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] → [[AsOfJoinExec]]; injected via
  * [[GraftExtensions]] (`injectPlannerStrategy`). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, pay) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, pay) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
                        leftTime: Attribute, rightTime: Attribute,
                        rightPayload: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(true))

  // co-partition on the key, sort by (key, time) — the planner inserts
  // the exchanges/sorts; this operator never shuffles by hand
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))
  override def outputPartitioning = left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val pay = rightPayload
    val lk = leftKeys
    val rk = rightKeys
    val lt = leftTime
    val rt = rightTime
    val out = output
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val lSort = UnsafeProjection.create(lk :+ lt, lOut)
      val rSort = UnsafeProjection.create(rk :+ rt, rOut)
      val lKey = UnsafeProjection.create(lk, lOut)
      val rKey = UnsafeProjection.create(rk, rOut)
      val payProj = UnsafeProjection.create(pay, rOut)
      // bind against NULLABLE payload attrs: an unmatched left row feeds
      // nulls, and a non-nullable binding would read them as zeros
      val outProj = UnsafeProjection.create(out, lOut ++ pay.map(_.withNullability(true)))
      // interpreted (key, time) ordering over the projected sort rows —
      // same field types on both sides by construction
      val ord = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering((lk :+ lt).map(_.dataType))
      val joined = new JoinedRow
      val nullPay: InternalRow = new GenericInternalRow(pay.length)
      new Iterator[InternalRow] {
        private var rHead: InternalRow = _
        private var candKey: UnsafeRow = _
        private var candPay: UnsafeRow = _
        override def hasNext: Boolean = lIt.hasNext
        override def next(): InternalRow = {
          val l = lIt.next()
          val lsk = lSort(l).copy() // rSort below reuses no buffer of lSort, but compare after advancing
          var continue = true
          while (continue) {
            if (rHead == null && rIt.hasNext) rHead = rIt.next()
            if (rHead == null) continue = false
            else if (ord.compare(rSort(rHead), lsk) <= 0) {
              candKey = rKey(rHead).copy()
              candPay = payProj(rHead).copy()
              rHead = null
            } else continue = false
          }
          val matched = candKey != null && candKey == lKey(l)
          outProj(joined(l, if (matched) candPay else nullPay))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}
