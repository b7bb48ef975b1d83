package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** `transformWithState` processor — Spark 4's arbitrary-state API (the
  * successor to `flatMapGroupsWithState`, state-store-schema'd and
  * TTL-capable): a running per-user (count, micro-scaled sum) kept in a
  * `ValueState`, snapshot emitted once per key per batch. Values arrive
  * pre-scaled to integer micros so the state fold is exact and
  * order-independent — a double accumulator here would make the result
  * depend on row arrival order. The TTL hook ([[TTLConfig]]) is the same
  * eviction contract TileStore implements by hand over
  * `flatMapGroupsWithState` — here the store manages it. */
class UserTotalsProcessor extends StatefulProcessor[Long, (Long, Long), (Long, Long, Long)] {

  @transient private var totals: ValueState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    totals = getHandle.getValueState[(Long, Long)](
      "totals", Encoders.product[(Long, Long)], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
                               timerValues: TimerValues): Iterator[(Long, Long, Long)] = {
    var (n, sum) = if (totals.exists()) totals.get() else (0L, 0L)
    rows.foreach { case (_, vMicros) => n += 1; sum += vMicros }
    totals.update((n, sum))
    Iterator.single((key, n, sum))
  }
}
