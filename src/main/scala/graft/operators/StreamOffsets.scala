package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Crash-safe FILE-based offset checkpoint shared by the polling
  * micro-batch consumers (`SnapshotLog.streamVersions`,
  * `DeltaLogReader.streamChangeFeed`, `Iceberg.streamChangelog`): one
  * `<prefix><value>` file per committed offset, published by
  * write-temp → rename-to-NEW-name (the atomic primitive — there is no
  * delete-then-rename window), superseded offsets best-effort cleaned
  * afterwards so the maximum SURVIVING offset is always the truth. A
  * crash between batch and commit replays exactly that batch
  * (at-least-once into an idempotent sink); a crash between create and
  * cleanup leaves extra older offsets that the max rule ignores and
  * the next commit sweeps. `orderOf` maps an offset value to its
  * position (numeric for versions, log-index for snapshot ids, which
  * are NOT ordered). */
class StreamOffsets(spark: SparkSession, checkpointDir: String, prefix: String) {
  private val chk = new Path(checkpointDir)
  private val f = chk.getFileSystem(spark.sparkContext.hadoopConfiguration)
  private val OffName = (java.util.regex.Pattern.quote(prefix) + "(\\d+)").r

  /** The maximum committed offset under `orderOf`, None when fresh. */
  def readMax(orderOf: Long => Long): Option[Long] =
    if (!f.exists(chk)) None
    else f.listStatus(chk).map(_.getPath.getName)
      .collect { case OffName(n) => n.toLong }
      .maxByOption(orderOf)

  /** Commit `value` as the newest offset and sweep superseded ones. */
  def commit(value: Long, orderOf: Long => Long): Unit = {
    val tmp = new Path(checkpointDir, s".tmp_$prefix$value")
    val out = f.create(tmp, true)
    try out.write(value.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val dst = new Path(checkpointDir, s"$prefix$value")
    require(f.rename(tmp, dst), s"failed to commit stream offset $value")
    f.listStatus(chk).map(_.getPath).filter { p =>
      p.getName match {
        case OffName(n) => orderOf(n.toLong) < orderOf(value)
        case _ => false
      }
    }.foreach(p => f.delete(p, false))
  }
}
