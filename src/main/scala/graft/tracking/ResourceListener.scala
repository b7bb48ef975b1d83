package graft.tracking

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

import java.util.concurrent.atomic.LongAdder

/** Cumulative task-level resource accounting — executor run time, executor
  * CPU time, and JVM GC time summed over every completed task. Bench
  * snapshots [[totals]] around each timed query and emits the deltas next
  * to the wall time, so a reader can tell noise from regression without
  * re-running: wall ≫ cpu means contention/scheduling, gc spikes mean
  * memory pressure, wall ≈ cpu means the query really does that much work.
  *
  * Task-end events post asynchronously on the listener bus; the adders are
  * contention-free and the per-query snapshot in Bench happens after its
  * quiescence wait, so attribution error is bounded by stragglers only. */
object ResourceListener {
  final case class Totals(runTimeMs: Long, cpuTimeMs: Long, gcTimeMs: Long)
}

class ResourceListener extends SparkListener {
  import ResourceListener.Totals

  private val run = new LongAdder
  private val cpu = new LongAdder
  private val gc = new LongAdder

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    val m = taskEnd.taskMetrics
    if (m != null) {
      run.add(m.executorRunTime)          // ms
      cpu.add(m.executorCpuTime / 1000000L) // ns → ms
      gc.add(m.jvmGCTime)                 // ms
    }
  }

  def totals(): Totals = Totals(run.sum(), cpu.sum(), gc.sum())
}
