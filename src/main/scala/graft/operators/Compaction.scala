package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction — the non-ZORDER half of Delta `OPTIMIZE`: a
  * fragmented table (thousands of tiny part files from incremental
  * ingestion) is rewritten into ~`targetBytes` output files.
  *
  * Scale design: planning is a driver-side file listing (O(#files), the
  * same metadata pass every table format's OPTIMIZE runs); the rewrite is
  * ONE Spark job — a round-robin `repartition(numBins)` whose even
  * distribution guarantees output files within a rounding error of the
  * target size regardless of input skew. No driver loop over bins: at
  * 100 TB the plan is 100k bins and one shuffle, not 100k jobs. The
  * rewrite is an atomic `overwrite` of the destination — readers never
  * see a half-compacted directory. */
object Compaction {

  final case class Plan(nFiles: Int, totalBytes: Long, numBins: Int)

  /** List the table's part files and size the output: numBins =
    * ceil(totalBytes / targetBytes), min 1. */
  def plan(spark: SparkSession, path: String, targetBytes: Long): Plan = {
    require(targetBytes > 0, "targetBytes must be positive")
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val parts = fs.listStatus(p).filter { st =>
      st.isFile && st.getPath.getName.endsWith(".parquet")
    }
    // flat-table contract: a partitioned layout nests its files in
    // subdirectories and would silently plan zero bytes here — refuse
    // rather than emit a one-bin rewrite of a table we didn't measure
    require(parts.nonEmpty,
      s"Compaction.plan: no part files directly under $path " +
        "(empty table, or a partitioned layout — compact partitions individually)")
    val total = parts.map(_.getLen).sum
    Plan(parts.length, total,
      math.max(1L, (total + targetBytes - 1) / targetBytes).toInt)
  }

  /** Rewrite `inPath` into `numBins` evenly-sized files at `outPath`. */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              targetBytes: Long): Plan = {
    val pl = plan(spark, inPath, targetBytes)
    spark.read.parquet(inPath)
      .repartition(pl.numBins)
      .write.mode("overwrite").parquet(outPath)
    pl
  }
}
