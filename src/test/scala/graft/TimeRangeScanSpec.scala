package graft

import org.apache.spark.sql.functions._

/** `Tables.timeRangeScan` — the hidden-partitioning contract (q216). The
  * law: for ANY half-open ts range over a day(ts)-partitioned table, the
  * helper returns exactly the rows a plain ts filter returns — the derived
  * day bounds may only prune directories that contain no matching rows.
  * Boundary off-by-ones (range starting/ending exactly on a day edge, or
  * strictly inside one day) are the bug class this pins. */
class TimeRangeScanSpec extends SparkSpec {

  test("equals the plain ts filter across boundary-exact and partial ranges") {
    import spark.implicits._
    val D = Tables.NanosPerDay
    // rows scattered over days 100..104, including exact-midnight rows
    val rows = Seq(
      100L * D, 100L * D + 1, 100L * D + D / 2,
      101L * D, 101L * D + D - 1,
      102L * D + 7, 103L * D, 104L * D + D / 3)
      .zipWithIndex.map { case (ts, i) => (i.toLong, ts) }
    val dir = java.nio.file.Files.createTempDirectory("trs").toString + "/t"
    rows.toDF("id", "ts")
      .withColumn("day", expr(s"ts DIV ${D}L"))
      .write.partitionBy("day").parquet(dir)

    val plain = spark.read.parquet(dir)
    val ranges = Seq(
      (100L * D, 102L * D),          // day-edge to day-edge
      (100L * D + 1, 101L * D + D),  // starts 1ns into a day
      (101L * D + D - 1, 102L * D + 8), // straddles an edge by 1ns each side
      (102L * D + 1, 102L * D + 2),  // strictly inside one day (no rows)
      (103L * D, 103L * D + 1),      // exactly one midnight row
      (99L * D, 200L * D))           // superset of all data
    for ((a, b) <- ranges) {
      val got = Tables.timeRangeScan(spark, dir, a, b)
        .select($"id").collect().map(_.getLong(0)).toSet
      val want = plain.where($"ts" >= a && $"ts" < b)
        .select($"id").collect().map(_.getLong(0)).toSet
      assert(got == want, s"range [$a, $b): got $got want $want")
    }
  }

  test("refuses empty and pre-epoch ranges") {
    intercept[IllegalArgumentException] {
      Tables.timeRangeScan(spark, "/nonexistent", 5L, 5L)
    }
    intercept[IllegalArgumentException] {
      Tables.timeRangeScan(spark, "/nonexistent", -1L, 5L)
    }
  }
}
