package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** Count-Min sketch — frequency estimation in bounded space, the
  * complement of [[Kmv]]'s distinct counting: `d` salted hash rows of `w`
  * buckets each; a key's estimate is the MINIMUM of its `d` bucket counts,
  * always ≥ the true count (collisions only inflate). Like the rest of
  * the sketch family the hashes are md5-derived, so DuckDB replays build
  * and probe bit-for-bit — an auditable approximate aggregate.
  *
  * Scale shape: the build is one `d`-way explode + ONE hash aggregate
  * (map-side combined; state is d×w cells regardless of input size); the
  * probe is an equi-join on (row, bucket) + a min per key. Sketches merge
  * by adding cell-wise — tiered rollups reuse the same state. */
object CountMin {

  private def bucket(key: Column, i: Int, w: Int): Column =
    TextFunctions.md5Bucket16(key.cast("string"), s"cm$i|") % w

  /** The sketch cells: `(row_i, bucket, cnt)` — d×w rows at most. */
  def build(df: DataFrame, keyCol: String, w: Int, d: Int): DataFrame = {
    require(d >= 1 && w >= 2 && w <= 65536, s"need 1<=d, 2<=w<=65536; got d=$d w=$w")
    val rows = array((0 until d).map(i =>
      struct(lit(i).as("row_i"), bucket(col(keyCol), i, w).as("bucket"))): _*)
    df.filter(col(keyCol).isNotNull)
      .select(explode(rows).as("__c"))
      .groupBy(col("__c.row_i").as("row_i"), col("__c.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for `keys`: `(key, est)` with est = min over the d
    * rows (0 when a probed cell is empty). */
  def estimate(sketch: DataFrame, keys: DataFrame, keyCol: String,
               w: Int, d: Int): DataFrame = {
    val probes = keys.select(col(keyCol), explode(array((0 until d).map(i =>
      struct(lit(i).as("row_i"), bucket(col(keyCol), i, w).as("bucket"))): _*)).as("__p"))
      .select(col(keyCol), col("__p.row_i").as("row_i"), col("__p.bucket").as("bucket"))
    probes.join(sketch, Seq("row_i", "bucket"), "left_outer")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** DuckDB twin of one salted bucket hash over SQL expression `e`. */
  def bucketSql(e: String, i: Int, w: Int): String =
    s"(${TextFunctions.md5Bucket16Sql(s"CAST($e AS VARCHAR)", s"cm$i|")} % $w)"
}
