package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE / upsert — the table-maintenance primitive behind the reference's
  * per-fit tiles refresh (`01_geofraud_clustering.py:431` rewrites the tiles
  * Delta table; with partial refits the natural spelling is
  * `MERGE INTO tiles USING updates WHEN MATCHED THEN UPDATE SET *
  * WHEN NOT MATCHED THEN INSERT *`). Delta is not on the classpath, so the
  * merge SEMANTICS are provided engine-side over any DataFrame pair; writing
  * the result is the caller's sink choice (table/parquet overwrite).
  *
  * Scale shape: one key-partitioned anti-join (both sides exchange on the
  * merge keys — the minimal shuffle any MERGE performs) plus an
  * exchange-free union. No driver-side state; skew on the merge keys is the
  * ordinary equi-join case ([[SkewTools]]/AQE). */
object Merge {

  /** Upsert `updates` into `target` on `keys`: a target row whose key
    * appears in `updates` is replaced (WHEN MATCHED → UPDATE SET *), an
    * update row with a fresh key is inserted (WHEN NOT MATCHED → INSERT *),
    * all other target rows pass through. Requires the two frames to share a
    * schema; `updates` must carry at most one row per key (the SQL MERGE
    * multi-match error is the caller's contract to uphold — enforce with
    * [[requireUniqueKeys]] when the source is untrusted). */
  def upsert(target: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame =
    updates.unionByName(target.join(updates, keys, "left_anti"))

  /** Fail fast (first action) if `df` carries duplicate merge keys — the
    * condition under which SQL MERGE is defined to error. */
  def requireUniqueKeys(df: DataFrame, keys: Seq[String]): DataFrame = {
    val dups = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__n"))
      .where(col("__n") > 1)
    if (!dups.isEmpty)
      throw new IllegalArgumentException(
        s"Merge.upsert: duplicate keys in updates on (${keys.mkString(", ")})")
    df
  }
}
