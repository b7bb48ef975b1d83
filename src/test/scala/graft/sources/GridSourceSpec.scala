package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class GridSourceSpec extends SparkSpec {

  private def grid(rows: Long = 64, cols: Long = 64): DataFrame =
    spark.read.format("graft-grid")
      .option("rows", rows).option("cols", cols).load()

  test("full scan materializes the whole grid with the exact payload") {
    val df = grid(32, 16)
    assert(df.count() == 32 * 16)
    val row = df.where(col("i") === 3 && col("j") === 5).collect()
    assert(row.length == 1 && row.head.getLong(2) == (31L * 3 + 17L * 5) % 100)
  }

  test("i-bound filters prune partitions BEFORE scheduling") {
    val df = grid(256, 8) // 16 bands of 16 i-values each
    assert(df.count() == 256 * 8)
    assert(GridSource.lastPlannedPartitions.get() == 16)
    // a one-band i-range must plan exactly one partition
    assert(df.where(col("i") >= 32 && col("i") < 48).count() == 16 * 8)
    assert(GridSource.lastPlannedPartitions.get() == 1)
    // an empty range plans zero partitions
    assert(df.where(col("i") >= 1000).count() == 0)
    assert(GridSource.lastPlannedPartitions.get() == 0)
  }

  test("bound filters are absorbed, not residual — and stay correct") {
    val df = grid(64, 64)
    val filtered = df.where(col("i") >= 10 && col("i") <= 12 &&
      col("j") === 7)
    assert(filtered.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((10L, 7L), (11L, 7L), (12L, 7L)))
    // the pushed ranges surface in the scan description
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("graft-grid i=[10,13) j=[7,8)"), plan)
  }

  test("column pruning reaches the reader") {
    val df = grid(16, 16).select(col("v"))
    assert(df.queryExecution.executedPlan.toString.contains("cols=[v]"))
    assert(df.agg(sum(col("v"))).head.getLong(0) ==
      (for (i <- 0L until 16; j <- 0L until 16) yield (31 * i + 17 * j) % 100).sum)
  }

  test("micro-batch stream drains in chunked batches and totals exactly") {
    import org.apache.spark.sql.streaming.Trigger
    val agg = spark.readStream.format("graft-grid")
      .option("rows", 64).option("cols", 4).load()
      .groupBy().count()
    val q = agg.writeStream.outputMode("complete").format("memory")
      .queryName("grid_stream_t").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000))
    // chunk = rows/4: the AvailableNow drain must take several real
    // batches (the Offset protocol advancing), not one catch-all
    assert(q.recentProgress.count(_.numInputRows > 0) >= 2)
    assert(spark.table("grid_stream_t").head().getLong(0) == 64L * 4)
  }

  test("non-bound predicates stay residual and still filter correctly") {
    val df = grid(32, 32).where(col("v") % 10 === 3 && col("i") < 4)
    assert(GridSource.lastPlannedPartitions.get() >= 1)
    assert(df.collect().forall(r => r.getLong(2) % 10 == 3 && r.getLong(0) < 4))
  }
}
