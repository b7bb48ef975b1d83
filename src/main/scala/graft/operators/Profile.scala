package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column-level data profiling — the first pass a pipeline runs over an
  * unfamiliar 100 TB drop: per column, row count, null count, and exact
  * distinct count, in long format (one row per column).
  *
  * Scale shape: ONE pass over the data. The multi-column count-distinct
  * lands in a single aggregate, which Catalyst plans as an Expand (one
  * duplicated stream per distinct-agg) feeding one shuffle — n columns
  * cost one scan, not n scans. The wide one-row result is unpivoted to
  * long format with `stack` at the end, driver-side cost zero. For
  * petabyte-scale profiling swap the exact distincts for
  * [[graft.sketch.Kmv]] sketches — same output contract, bounded state. */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = count(lit(1)).as("__n") +: cols.flatMap(c => Seq(
      count(when(col(c).isNull, 1)).as(s"__null_$c"),
      countDistinct(col(c)).as(s"__dist_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map(c => s"'$c', `__null_$c`, `__dist_$c`").mkString(", ")
    row.select(col("__n"), expr(s"stack(${cols.size}, $stacked)"))
      .toDF("n_rows", "col_name", "n_null", "n_distinct")
      .select("col_name", "n_rows", "n_null", "n_distinct")
  }
}
