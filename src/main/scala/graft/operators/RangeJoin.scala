package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join — points joined to the intervals containing them.
  * Spark plans the naive `p BETWEEN start AND end` condition as a
  * broadcast-nested-loop / cartesian; this is the bucketized scale
  * formulation (the 1-D cousin of the GEOSCAN cell trick, SURVEY §4):
  * every interval explodes to the fixed-width buckets it overlaps, every
  * point maps to its one bucket, and the join is a plain equi-join on
  * (keys, bucket) with the exact range as a cheap post-filter.
  *
  * Each (point, interval) pair can only meet in the point's single bucket,
  * so no dedup is needed. Fanout on the interval side is
  * `len/bucketWidth + 1` rows — pick `bucketWidth` near the typical
  * interval length (fanout ≈ 2). */
object RangeJoin {

  def pointInInterval(points: DataFrame, intervals: DataFrame, keyCols: Seq[String],
                      pointCol: String, startCol: String, endCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // degenerate intervals dropped up front: Spark's sequence(a, b) counts
    // DOWN when a > b, which would explode bogus bucket rows
    val ivals = intervals.where(col(endCol) >= col(startCol)).withColumn("__b",
      explode(sequence(
        expr(s"CAST($startCol AS BIGINT) DIV ${bucketWidth}L"),
        expr(s"CAST($endCol AS BIGINT) DIV ${bucketWidth}L"))))
    val pts = points.withColumn("__b", expr(s"CAST($pointCol AS BIGINT) DIV ${bucketWidth}L"))
    pts.join(ivals, keyCols :+ "__b")
      .where(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__b")
  }
}
