package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** Bucketed table reconciliation — "which parts of these two 100 TB
  * snapshots differ?" without moving either: hash every row's canonical
  * representation to a 60-bit value, fold rows into `nBuckets` buckets,
  * and reduce each bucket to (count, xor-checksum, decimal sum). Two
  * snapshots then compare by their bucket summaries — bytes on the wire
  * are O(buckets), not O(rows) — and only mismatching buckets need a
  * row-level drill-down.
  *
  * The three signals are deliberately redundant: xor alone is blind to a
  * row duplicated an even number of times, the count alone to a
  * modified-in-place row; together with the overflow-free decimal sum a
  * differing bucket cannot cancel out. All three are order-independent
  * and exactly replayable in SQL ([[TextFunctions.md5Bucket60Sql]]). */
object TableDiff {

  /** Per-bucket summary of one snapshot. `rowRepr` must be a
    * deterministic string representation of the row (caller controls
    * which columns participate and how floats are canonicalized). */
  def bucketChecksums(df: DataFrame, rowRepr: Column, nBuckets: Int): DataFrame = {
    val h = TextFunctions.md5Bucket60(rowRepr)
    df.select((h % nBuckets).as("bucket"), h.as("h"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(h)").as("checksum"),
        // decimal(38,0) sum is overflow-free for 60-bit hashes; rendered
        // as a string so the summary survives engines/formats whose widest
        // integer is 64-bit (the value itself can exceed 2^63)
        sum(col("h").cast("decimal(38,0)")).cast("string").as("hash_sum"))
  }

  /** Buckets where the two snapshots disagree, with both sides' summaries
    * (nulls where a bucket exists on one side only). */
  def diff(a: DataFrame, b: DataFrame, rowReprA: Column, rowReprB: Column,
           nBuckets: Int = 1024): DataFrame = {
    val ca = bucketChecksums(a, rowReprA, nBuckets)
      .withColumnsRenamed(Map("n_rows" -> "n_rows_a", "checksum" -> "checksum_a", "hash_sum" -> "hash_sum_a"))
    val cb = bucketChecksums(b, rowReprB, nBuckets)
      .withColumnsRenamed(Map("n_rows" -> "n_rows_b", "checksum" -> "checksum_b", "hash_sum" -> "hash_sum_b"))
    ca.join(cb, Seq("bucket"), "full_outer")
      .where(!(col("n_rows_a") <=> col("n_rows_b") &&
        col("checksum_a") <=> col("checksum_b") &&
        col("hash_sum_a") <=> col("hash_sum_b")))
  }
}
