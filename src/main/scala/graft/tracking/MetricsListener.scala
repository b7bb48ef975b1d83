package graft.tracking

import org.apache.spark.sql.execution.{QueryExecution, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.util.QueryExecutionListener

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** Engine observability: a [[QueryExecutionListener]] that records, per
  * completed action, the wall duration, output-row metric, and how many
  * file-scan leaves the physical plan touched. Register with
  * `spark.listenerManager.register(new MetricsListener)` and drain with
  * [[snapshot]] — the records pair naturally with [[Experiments]] runs
  * (log them as run metrics) so a pipeline's perf history lives next to
  * its parameter history.
  *
  * Listener callbacks fire on the driver off the hot path (Spark invokes
  * them asynchronously post-action) — recording must stay allocation-light
  * and lock-free, hence the concurrent queue. */
class MetricsListener extends QueryExecutionListener {

  final case class Record(funcName: String, durationNs: Long,
                          outputRows: Option[Long], nFileScans: Int)

  private val records = new ConcurrentLinkedQueue[Record]()

  // AQE hides scans behind LEAF wrapper nodes: AdaptiveSparkPlanExec wraps
  // the whole adaptive plan and each materialized stage is a QueryStageExec
  // leaf wrapping its stage plan — a plain collectLeaves() reports zero
  // file scans for every plan with an exchange. Recurse through them.
  private def countFileScans(p: SparkPlan): Int = p match {
    case a: AdaptiveSparkPlanExec => countFileScans(a.executedPlan)
    case q: QueryStageExec => countFileScans(q.plan)
    case r: ReusedExchangeExec => countFileScans(r.child)
    case l if l.children.isEmpty =>
      if (l.getClass.getSimpleName.startsWith("FileSourceScan")) 1 else 0
    case other => other.children.map(countFileScans).sum
  }

  // the metric-bearing node sits under metric-less single-child wrappers
  // (WholeStageCodegenExec has only pipelineTime; AQE/stage wrappers have
  // none) — descend to the first node that actually CARRIES numOutputRows
  // and report its value even when 0: a legitimately empty result must not
  // fall through to an upstream operator's nonzero count
  private def rootRows(p: SparkPlan): Option[Long] =
    p.metrics.get("numOutputRows").map(_.value).orElse(p match {
      case a: AdaptiveSparkPlanExec => rootRows(a.executedPlan)
      case q: QueryStageExec => rootRows(q.plan)
      case n if n.children.size == 1 => rootRows(n.children.head)
      case _ => None
    })

  override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
    records.add(Record(funcName, durationNs,
      rootRows(qe.executedPlan), countFileScans(qe.executedPlan)))

  override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
    records.add(Record(s"$funcName!failed", -1L, None, 0))

  /** Drain-free view of everything recorded so far. */
  def snapshot(): Seq[Record] = records.iterator().asScala.toSeq

  def clear(): Unit = records.clear()
}
