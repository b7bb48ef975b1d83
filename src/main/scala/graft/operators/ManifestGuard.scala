package graft.operators

import org.apache.spark.sql.{DataFrame, Row}

/** Bounded driver-side manifest collection — the guard the three
  * file-planning collects share ([[SnapshotLog]], [[DataSkipping]],
  * [[BloomFileIndex]]).
  *
  * Driver-side planning over O(#files) manifests is the Delta shape and
  * is deliberate; the guard exists so that pointing one of these at a
  * pathological table (10M+ files) refuses loudly instead of silently
  * OOMing the driver — the [[graft.sim.Similarity.exactCosinePairs]]
  * pattern: a `require` that names the cap, the observed size, and what
  * to do instead. The check costs nothing extra: `limit(cap+1)` bounds
  * the collect itself, so the oversized case never materializes more
  * than one row past the cap. */
object ManifestGuard {

  /** Default cap on planned-file manifests. 1M files ≈ a 1 PB table at
    * 1 GB files — two orders past this repo's targets; a table genuinely
    * past it needs coarser files or partition-level pruning first. */
  val MaxPlannedFiles: Int = 1000000

  /** Collect at most `cap` rows of `df`; refuse (loudly, naming `what`)
    * if more exist. */
  def collectCapped(df: DataFrame, what: String,
                    cap: Int = MaxPlannedFiles): Array[Row] = {
    val rows = df.limit(cap + 1).collect()
    require(rows.length <= cap,
      s"$what: manifest lists more than $cap files — refusing the driver-side " +
        "collect (it would not fit planning memory). Compact the table to " +
        "coarser files or pre-filter with partition pruning before this step.")
    rows
  }
}
