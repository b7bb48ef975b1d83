package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** File-level min/max data skipping — the Delta/Iceberg stats-manifest
  * mechanism, built from plain parquet: a one-scan manifest records each
  * file's min/max per column, and a range lookup consults the manifest to
  * plan ONLY the overlapping files before any data is read.
  *
  * Scale design: the manifest is O(#files) rows (a 100 TB table at 1 GB
  * files is ~100k rows — driver-trivial), built once per write with one
  * column-pruned scan, and the planning step collects only the matching
  * file paths — exactly how Delta's `dataSkippingNumIndexedCols` stats are
  * consulted by the driver before task scheduling. Row-group pruning via
  * PushedFilters still applies WITHIN each surviving file, so the two
  * mechanisms compose (manifest skips whole files; row-group stats skip
  * pages inside the files that remain).
  *
  * Reference tie-in: the reference approximates this with Delta
  * `OPTIMIZE ZORDER` (01_geofraud_clustering.py:440, not on this
  * classpath); paired with the z-ordered staged write (q134) this closes
  * the remaining gap — clustered layout + file-level stats pruning. */
object DataSkipping {

  /** Per-file min/max manifest of `path`: one row per parquet file with
    * `<col>_min` / `<col>_max` for each requested column. One column-pruned
    * scan; partial aggregation bounds the shuffle at #files rows. */
  def manifest(spark: SparkSession, path: String, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "manifest: at least one stats column")
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max")))
    spark.read.parquet(path)
      .select(col("_metadata.file_path").as("file") +: cols.map(col): _*)
      .groupBy(col("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Files whose [min, max] envelope overlaps EVERY requested closed range
    * — the sound skip test: a file is dropped only when some column's
    * envelope is disjoint from its range, so no matching row can be lost.
    * A NULL envelope (min/max ignore nulls, so NULL means the file's column
    * is ALL null) makes the keep predicate NULL and drops the file — sound,
    * because no all-null row can satisfy a closed range on that column.
    * Driver-side by design: this IS the planning step, O(#files). */
  def prune(man: DataFrame, ranges: Map[String, (Double, Double)],
            maxFiles: Int = ManifestGuard.MaxPlannedFiles): Seq[String] = {
    require(ranges.nonEmpty, "prune: at least one range predicate")
    val keep = ranges.map { case (c, (lo, hi)) =>
      !(col(s"${c}_max") < lit(lo) || col(s"${c}_min") > lit(hi))
    }.reduce(_ && _)
    ManifestGuard.collectCapped(man.where(keep).select(col("file")),
        "DataSkipping.prune", cap = maxFiles)
      .map(_.getString(0)).toSeq.sorted
  }

  /** Read only the planned files (empty plan → empty frame with the full
    * schema). `basePath` keeps partition-discovery semantics identical to
    * reading the whole directory. */
  def readFiles(spark: SparkSession, basePath: String, files: Seq[String]): DataFrame =
    if (files.isEmpty) spark.read.parquet(basePath).limit(0)
    else spark.read.option("basePath", basePath).parquet(files: _*)
}
