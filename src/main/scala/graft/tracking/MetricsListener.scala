package graft.tracking

import org.apache.spark.sql.execution.QueryExecution
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

  override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
    val plan = qe.executedPlan
    val outRows = plan.metrics.get("numOutputRows").map(_.value).filter(_ > 0)
    val scans = plan.collectLeaves().count(
      _.getClass.getSimpleName.startsWith("FileSourceScan"))
    records.add(Record(funcName, durationNs, outRows, scans))
  }

  override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
    records.add(Record(s"$funcName!failed", -1L, None, 0))

  /** Drain-free view of everything recorded so far. */
  def snapshot(): Seq[Record] = records.iterator().asScala.toSeq

  def clear(): Unit = records.clear()
}
