package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-group top-k WITHOUT sorting the data: fold each partition into
  * per-key k-element heaps (map-side combine — memory is #keys × k,
  * independent of partition size) and shuffle only the k-row partials.
  * Same contract as the window spelling: rank by value DESC with id ASC
  * tie-break, exactly k rows per key (fewer when the key has fewer rows).
  *
  * Relation to `row_number() <= k`: Spark 4 already prunes that spelling
  * with partial WindowGroupLimit (audit-pinned on q45), so each map task
  * keeps k rows per key — but it still sort-shuffles those survivors and
  * re-sorts per partition. This operator replaces the sort exchange with
  * a hash exchange of k-row arrays: the win at 100 TB is when key
  * cardinality is high (the sort's survivors are #keys × k rows either
  * way, but heaps skip the O(n log n) per-partition sorts entirely).
  *
  * Same two-level shape as [[graft.sketch.Kmv]] — bottom-k of a hash
  * there, top-k of a value here. */
object TopK {

  private type Row3 = (Double, Long) // (value, id)

  /** worst-first ordering: the queue's dequeue() (its max) is the row to
    * evict — the SMALLEST value, ties broken by LARGEST id (id ASC wins
    * ranks), i.e. the max of (-value, id). */
  private val worstFirst: Ordering[Row3] =
    Ordering.by[Row3, (Double, Long)] { case (v, id) => (-v, id) }

  private def push(heap: scala.collection.mutable.PriorityQueue[Row3],
                   row: Row3, k: Int): Unit = {
    heap.enqueue(row)
    if (heap.size > k) heap.dequeue()
  }

  /** `(key, id, value, rank)` — the top `k` rows per key.
    * Key is compared as string, value as double, id as long (the caller
    * casts richer types down to this contract). NaN values are outside
    * the contract: JVM ordering treats every NaN comparison as false
    * while Spark's window sort orders NaN greatest — pre-filter NaNs if
    * the value column can carry them. */
  def topK(df: DataFrame, keyCol: String, valueCol: String, idCol: String,
           k: Int): DataFrame = {
    require(k >= 1, s"topK needs k >= 1, got $k")
    val s = df.sparkSession
    import s.implicits._
    df.select(col(keyCol).cast("string"), col(valueCol).cast("double"),
        col(idCol).cast("long"))
      .filter(col(valueCol).isNotNull && col(idCol).isNotNull)
      .as[(String, Double, Long)]
      .mapPartitions { it =>
        val acc = scala.collection.mutable.HashMap
          .empty[String, scala.collection.mutable.PriorityQueue[Row3]]
        it.foreach { case (key, v, id) =>
          val heap = acc.getOrElseUpdate(key,
            scala.collection.mutable.PriorityQueue.empty(worstFirst))
          push(heap, (v, id), k)
        }
        acc.iterator.map { case (key, heap) => (key, heap.toArray) }
      }
      .groupByKey(_._1)
      .mapGroups { (key, it) =>
        val heap = scala.collection.mutable.PriorityQueue.empty(worstFirst)
        it.foreach(_._2.foreach(push(heap, _, k)))
        // emit best-first: rank 1 = highest value, id ASC on ties
        val best = heap.toArray.sortBy { case (v, id) => (-v, id) }
        (key, best.zipWithIndex.map { case ((v, id), i) => (id, v, i + 1L) })
      }
      .flatMap { case (key, rows) => rows.map { case (id, v, r) => (key, id, v, r) } }
      .toDF(keyCol, idCol, valueCol, "rank")
  }
}
