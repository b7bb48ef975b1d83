package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Encoders, SaveMode, SparkSession}

/** Minimal snapshot log — the table-format mechanism (Delta/Iceberg) over
  * plain parquet: every commit writes NEW immutable data files plus a
  * versioned MANIFEST listing the table's complete active file set, and a
  * read pins one manifest. Appends list old ∪ new; overwrites list only
  * new — old files stay on disk, so every historical version remains
  * readable (time travel) until a retention job vacuums them.
  *
  * Scale + isolation design:
  *  - data files are immutable and commit-scoped (`data/c{N}/`) — writers
  *    never mutate files a concurrent reader may hold open;
  *  - the manifest is itself parquet, O(#files) rows, written to a temp
  *    dir and atomically RENAMED to `_log/v{N}` — readers see either the
  *    old latest version or the new one, never a torn manifest (rename is
  *    the same atomicity primitive Delta's `_delta_log` JSON commit uses);
  *  - version discovery is one `_log` listing, O(#versions), driver-side —
  *    exactly the planning metadata pass of a real table format. */
object SnapshotLog {

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  /** Committed versions, ascending (empty for a fresh path). */
  def versions(spark: SparkSession, path: String): Seq[Int] = {
    val log = new Path(path, "_log")
    val f = fs(spark, log)
    if (!f.exists(log)) Seq.empty
    else f.listStatus(log).map(_.getPath.getName)
      .collect { case n if n.startsWith("v") => n.drop(1).toInt }
      .sorted.toSeq
  }

  def latestVersion(spark: SparkSession, path: String): Int =
    versions(spark, path).lastOption.getOrElse(0)

  /** Commit `df` as the next version. `overwrite = false` appends (the new
    * manifest lists the previous active set plus this commit's files);
    * `overwrite = true` replaces (new files only). Returns the version. */
  def commit(spark: SparkSession, path: String, df: DataFrame,
             overwrite: Boolean): Int = {
    val v = latestVersion(spark, path) + 1
    val newFiles = writeDataFiles(spark, path, v, df)
    val active =
      if (overwrite || v == 1) newFiles
      else manifestFiles(spark, path, v - 1) ++ newFiles
    publishManifest(spark, path, v, active, df.schema.json)
    v
  }

  /** Write `df` into the commit-scoped data dir and return its part files. */
  private def writeDataFiles(spark: SparkSession, path: String, v: Int,
                             df: DataFrame): Seq[String] = {
    val dataDir = s"$path/data/c$v"
    df.write.mode(SaveMode.ErrorIfExists).parquet(dataDir)
    fs(spark, new Path(dataDir)).listStatus(new Path(dataDir))
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString).sorted.toSeq
  }

  /** Atomically publish version `v`'s manifest (+ schema sidecar). */
  private def publishManifest(spark: SparkSession, path: String, v: Int,
                              active: Seq[String], schemaJson: String): Unit = {
    import spark.implicits._
    val tmp = new Path(path, s"_log/.tmp_v$v")
    val dst = new Path(path, s"_log/v$v")
    active.toDF("file").coalesce(1).write.parquet(tmp.toString)
    val f = fs(spark, dst)
    // schema sidecar INSIDE the manifest dir (underscore-prefixed, so the
    // parquet reader ignores it; the atomic rename below publishes both
    // together): an empty commit/overwrite writes zero data part files,
    // and without the recorded schema its version could never be read
    // back — with it, readVersion returns an empty typed frame
    val schemaFile = new Path(tmp, "_schema.json")
    val out = f.create(schemaFile, true)
    try out.write(schemaJson.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    require(f.rename(tmp, dst), s"concurrent commit detected publishing v$v")
  }

  private[operators] def manifestFiles(spark: SparkSession, path: String, v: Int,
      maxFiles: Int = ManifestGuard.MaxPlannedFiles): Seq[String] = {
    val dst = new Path(path, s"_log/v$v")
    require(fs(spark, dst).exists(dst), s"version $v does not exist at $path")
    ManifestGuard.collectCapped(
        spark.read.parquet(dst.toString).select("file"),
        s"SnapshotLog v$v at $path", cap = maxFiles)
      .map(_.getString(0)).toSeq
  }

  /** The version's `_schema.json` sidecar content, if present (commits
    * since the sidecar was introduced always write one). */
  private def sidecarSchemaJson(spark: SparkSession, path: String,
                                v: Int): Option[String] = {
    val sf = new Path(path, s"_log/v$v/_schema.json")
    val f = fs(spark, sf)
    if (!f.exists(sf)) None
    else {
      val buf = new Array[Byte](f.getFileStatus(sf).getLen.toInt)
      val in = f.open(sf)
      try in.readFully(buf) finally in.close()
      Some(new String(buf, java.nio.charset.StandardCharsets.UTF_8))
    }
  }

  /** Read the table AS OF `v` — old versions stay readable across later
    * appends AND overwrites, because files are immutable and manifests
    * pin the exact set. */
  def readVersion(spark: SparkSession, path: String, v: Int): DataFrame = {
    val files = manifestFiles(spark, path, v)
    if (files.nonEmpty) spark.read.parquet(files: _*)
    else {
      // empty commit (e.g. an overwrite that deleted every row): the
      // manifest lists no files, so the schema comes from the sidecar
      val json = sidecarSchemaJson(spark, path, v).getOrElse(sys.error(
        s"version $v has an empty manifest and no schema sidecar (pre-sidecar commit?)"))
      val schema = org.apache.spark.sql.types.DataType.fromJson(json)
        .asInstanceOf[org.apache.spark.sql.types.StructType]
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }
  }

  /** Read the latest version. */
  def read(spark: SparkSession, path: String): DataFrame =
    readVersion(spark, path, latestVersion(spark, path))

  /** OPTIMIZE — Delta's compaction semantics ON the log: rewrite the
    * LATEST version's (possibly fragmented) active file set into
    * ~`targetBytes` files and publish the result as a NEW overwrite
    * version with identical rows. History is preserved: the pre-optimize
    * version stays readable (files are immutable; [[vacuum]]/
    * [[expireSnapshots]] reclaim it later), which is what separates a
    * table-format OPTIMIZE from [[Compaction]]'s in-place directory
    * rewrite. Planning is O(#files) driver metadata (manifest + sizes);
    * the rewrite is one round-robin shuffle job — or, with `clusterBy`,
    * a range-partition + in-partition sort on the given key expressions:
    * `OPTIMIZE ... ZORDER BY` (`01_geofraud_clustering.py:440`) when the
    * caller passes the Morton key (`z_order(i, j)` — q129/q134's write
    * pattern), plain clustering for single-column locality. Clustered
    * output files carry tight min/max stats on the key, so file-level
    * skipping and row-group pruning both engage on later reads.
    * Returns (newVersion, filesBefore, filesAfter). */
  def optimize(spark: SparkSession, path: String,
               targetBytes: Long = 128L * 1024 * 1024,
               clusterBy: Seq[org.apache.spark.sql.Column] = Nil): (Int, Int, Int) = {
    require(targetBytes > 0, "targetBytes must be positive")
    val v = latestVersion(spark, path)
    require(v > 0, s"no committed version to optimize at $path")
    val files = manifestFiles(spark, path, v)
    require(files.nonEmpty, s"version $v at $path is empty — nothing to optimize")
    val hconf = spark.sessionState.newHadoopConf()
    val total = files.map { f =>
      val p = new Path(f); p.getFileSystem(hconf).getFileStatus(p).getLen
    }.sum
    val bins = math.max(1L, (total + targetBytes - 1) / targetBytes).toInt
    val src = readVersion(spark, path, v)
    val reshaped =
      if (clusterBy.isEmpty) src.repartition(bins)
      else src.repartitionByRange(bins, clusterBy: _*)
        .sortWithinPartitions(clusterBy: _*)
    val nv = commit(spark, path, reshaped, overwrite = true)
    (nv, files.length, manifestFiles(spark, path, nv).length)
  }

  /** Row-level DELETE — the copy-on-write table-format semantics (Delta's
    * `DELETE FROM`): rewrite ONLY the files that contain matching rows
    * (minus those rows) and publish a new version whose manifest keeps
    * every untouched file as-is. History stays readable (the pre-delete
    * version pins the original files; [[vacuum]] reclaims them later).
    *
    * Two jobs, both bounded: (1) find touched files + the matched count in
    * ONE pass (`input_file_name` groupBy over the predicate's matches —
    * result is O(#touched files) rows, `ManifestGuard`-capped); (2) rewrite
    * the touched files' survivors. At 100 TB the win IS the touched-only
    * rewrite: a delete hitting 1% of files rewrites 1% of the table, and
    * untouched files move as manifest entries, zero data bytes.
    *
    * A no-match delete publishes NO new version (Delta's no-op semantics).
    * Returns (version, rowsDeleted, filesRewritten, filesKept) — version
    * is the pre-delete latest when nothing matched. */
  def deleteWhere(spark: SparkSession, path: String,
                  predicate: org.apache.spark.sql.Column): (Int, Long, Int, Int) = {
    import org.apache.spark.sql.functions.{count, input_file_name, lit}
    val v = latestVersion(spark, path)
    require(v > 0, s"no committed version to delete from at $path")
    val files = manifestFiles(spark, path, v)
    if (files.isEmpty) return (v, 0L, 0, 0)
    val src = spark.read.parquet(files: _*)
    val touchedRows = ManifestGuard.collectCapped(
      src.where(predicate).groupBy(input_file_name().as("file"))
        .agg(count(lit(1)).as("n")),
      s"DELETE touched-file scan at $path")
    if (touchedRows.isEmpty) return (v, 0L, 0, 0)
    // input_file_name returns URIs; manifests may store plain paths —
    // compare canonically both ways
    def canon(s: String) = new Path(s).toUri.getPath
    val touched = touchedRows.map(r => canon(r.getString(0))).toSet
    val deleted = touchedRows.map(_.getLong(1)).sum
    val (rewrite, keep) = files.partition(f => touched(canon(f)))
    require(rewrite.size == touched.size,
      s"DELETE planning at $path: ${touched.size} touched files but " +
        s"${rewrite.size} matched the manifest — path canonicalization drift")
    val nv = v + 1
    // survivors = rows where the predicate is NOT TRUE (false OR null —
    // SQL DELETE semantics: a null predicate row is not deleted; a bare
    // `!predicate` would silently drop it from the rewrite)
    val survivors = spark.read.parquet(rewrite: _*)
      .where(!org.apache.spark.sql.functions.coalesce(
        predicate, org.apache.spark.sql.functions.lit(false)))
    val newFiles = writeDataFiles(spark, path, nv, survivors)
    publishManifest(spark, path, nv, keep ++ newFiles, src.schema.json)
    (nv, deleted, rewrite.size, keep.size)
  }

  /** Row-level UPDATE — the copy-on-write companion of [[deleteWhere]]
    * (Delta's `UPDATE ... SET`): rewrite only the files containing rows
    * matching `predicate`, with `set`'s expressions applied to the matched
    * rows (non-matching rows in a touched file are rewritten verbatim),
    * and publish a new version keeping untouched files by reference.
    * SQL semantics: a null predicate row is NOT updated. Set expressions
    * are cast back to the column's original type, so the table schema
    * never drifts under an update. Returns
    * (version, rowsUpdated, filesRewritten, filesKept) — the pre-update
    * latest version and zero counts when nothing matched. */
  def updateWhere(spark: SparkSession, path: String,
                  predicate: org.apache.spark.sql.Column,
                  set: Map[String, org.apache.spark.sql.Column]): (Int, Long, Int, Int) = {
    import org.apache.spark.sql.functions.{coalesce, col, count, input_file_name, lit, when}
    val v = latestVersion(spark, path)
    require(v > 0, s"no committed version to update at $path")
    val files = manifestFiles(spark, path, v)
    if (files.isEmpty) return (v, 0L, 0, 0)
    val src = spark.read.parquet(files: _*)
    val bad = set.keySet -- src.columns.toSet
    require(bad.isEmpty, s"UPDATE at $path sets unknown column(s): ${bad.mkString(", ")}")
    val touchedRows = ManifestGuard.collectCapped(
      src.where(predicate).groupBy(input_file_name().as("file"))
        .agg(count(lit(1)).as("n")),
      s"UPDATE touched-file scan at $path")
    if (touchedRows.isEmpty) return (v, 0L, 0, 0)
    def canon(s: String) = new Path(s).toUri.getPath
    val touched = touchedRows.map(r => canon(r.getString(0))).toSet
    val updated = touchedRows.map(_.getLong(1)).sum
    val (rewrite, keep) = files.partition(f => touched(canon(f)))
    require(rewrite.size == touched.size,
      s"UPDATE planning at $path: ${touched.size} touched files but " +
        s"${rewrite.size} matched the manifest — path canonicalization drift")
    val nv = v + 1
    val hit = coalesce(predicate, lit(false))
    val rewritten = spark.read.parquet(rewrite: _*).select(
      src.schema.fields.toIndexedSeq.map { f =>
        set.get(f.name) match {
          case Some(expr) =>
            when(hit, expr.cast(f.dataType)).otherwise(col(f.name)).as(f.name)
          case None => col(f.name)
        }
      }: _*)
    val newFiles = writeDataFiles(spark, path, nv, rewritten)
    publishManifest(spark, path, nv, keep ++ newFiles, src.schema.json)
    (nv, updated, rewrite.size, keep.size)
  }

  /** MERGE INTO — the CDC-apply verb (Delta's `MERGE`): apply a change
    * batch to the table with upsert semantics — WHEN MATCHED (by `keys`)
    * the table row is replaced by the source row, WHEN NOT MATCHED the
    * source row is inserted. Copy-on-write like [[deleteWhere]]/
    * [[updateWhere]]: only files containing matched keys are rewritten
    * (matched rows dropped — their replacements arrive with the inserted
    * batch), untouched files move by manifest reference, and the whole
    * source lands as this commit's new data files. At 100 TB this is THE
    * merge shape: a change batch touching 1% of files moves 1% of the
    * table plus the batch itself.
    *
    * The source must be key-unique (an ambiguous merge refuses loudly,
    * Delta's own rule) and schema-compatible (same column names). Multiple
    * table rows sharing a matched key collapse to the single source row —
    * merge normalizes the table toward key-uniqueness, the upsert
    * contract. Returns (version, rowsReplaced, rowsInserted,
    * filesRewritten, filesKept). */
  def mergeInto(spark: SparkSession, path: String, source: DataFrame,
                keys: Seq[String]): (Int, Long, Long, Int, Int) = {
    import org.apache.spark.sql.functions.{count, input_file_name, lit, max}
    require(keys.nonEmpty, "merge needs at least one key column")
    val v = latestVersion(spark, path)
    require(v > 0, s"no committed version to merge into at $path")
    val files = manifestFiles(spark, path, v)
    require(files.nonEmpty, s"version $v at $path is empty — commit, don't merge")
    val src = spark.read.parquet(files: _*)
    require(src.columns.sorted.sameElements(source.columns.sorted),
      s"merge source columns ${source.columns.sorted.mkString(",")} != " +
        s"table columns ${src.columns.sorted.mkString(",")}")
    val batch = source.localCheckpoint(true) // consumed by 3 jobs below
    val worstDup = batch.groupBy(keys.map(org.apache.spark.sql.functions.col): _*)
      .agg(count(lit(1)).as("n")).agg(max("n")).head.getLong(0)
    require(worstDup <= 1,
      s"merge source has duplicate keys (${keys.mkString(",")}) — ambiguous merge refused")

    val keyFrame = batch.select(keys.map(org.apache.spark.sql.functions.col): _*)
    val matched = src.join(keyFrame, keys, "left_semi")
    val touchedRows = ManifestGuard.collectCapped(
      matched.groupBy(input_file_name().as("file")).agg(count(lit(1)).as("n")),
      s"MERGE touched-file scan at $path")
    def canon(s: String) = new Path(s).toUri.getPath
    val touched = touchedRows.map(r => canon(r.getString(0))).toSet
    val replaced = touchedRows.map(_.getLong(1)).sum
    val (rewrite, keep) = files.partition(f => touched(canon(f)))
    require(rewrite.size == touched.size,
      s"MERGE planning at $path: ${touched.size} touched files but " +
        s"${rewrite.size} matched the manifest — path canonicalization drift")
    val inserted = batch.count() -
      keyFrame.join(src.select(keys.map(org.apache.spark.sql.functions.col): _*)
        .distinct(), keys, "left_semi").count()

    val nv = v + 1
    // survivors of rewritten files (matched rows dropped) ++ the batch
    // itself (replacements + inserts) — aligned to the table column order
    val aligned = batch.select(src.columns.toIndexedSeq
      .map(org.apache.spark.sql.functions.col): _*)
    val newData =
      if (rewrite.isEmpty) aligned
      else spark.read.parquet(rewrite: _*).join(keyFrame, keys, "left_anti")
        .unionByName(aligned)
    val newFiles = writeDataFiles(spark, path, nv, newData)
    publishManifest(spark, path, nv, keep ++ newFiles, src.schema.json)
    (nv, replaced, inserted, rewrite.size, keep.size)
  }

  /** CHANGE DATA FEED — row-level changes between two versions (Delta's
    * `table_changes`): `_change_type` = 'insert' for rows present in
    * `v2` but not `v1`, 'delete' for the reverse; an update surfaces as
    * its delete + insert pair (this log records no update provenance —
    * the row-image diff is the contract).
    *
    * Computed from the MANIFEST diff, not a full-table diff: only files
    * added or removed between the versions are read, and `exceptAll`
    * (multiset, duplicate-correct) cancels the rows copy-on-write
    * rewrites carried over unchanged — so a DELETE touching 1% of files
    * feeds 1% of the table through the diff, and an append's CDF reads
    * just the appended files. Unchanged files never enter the plan. */
  def changesBetween(spark: SparkSession, path: String,
                     fromV: Int, toV: Int): DataFrame = {
    import org.apache.spark.sql.functions.lit
    require(fromV < toV, s"changesBetween needs fromV < toV, got $fromV..$toV")
    val before = manifestFiles(spark, path, fromV).toSet
    val after = manifestFiles(spark, path, toV).toSet
    val removed = (before -- after).toSeq.sorted
    val added = (after -- before).toSeq.sorted
    def rows(fs: Seq[String]) =
      if (fs.nonEmpty) spark.read.parquet(fs: _*)
      else readVersion(spark, path, toV).limit(0)
    val ins = rows(added).exceptAll(rows(removed))
      .withColumn("_change_type", lit("insert"))
    val del = rows(removed).exceptAll(rows(added))
      .withColumn("_change_type", lit("delete"))
    ins.unionByName(del)
  }

  /** RESTORE — roll the table back to an earlier version's content
    * (Delta's `RESTORE TABLE ... TO VERSION AS OF`): publish a NEW
    * version whose manifest is a verbatim copy of version `v`'s. Pure
    * metadata — zero data bytes move, the rolled-back-over versions stay
    * readable (history is append-only even for a rollback; [[vacuum]]
    * reclaims them later). Returns the new version. */
  def restore(spark: SparkSession, path: String, v: Int): Int = {
    val latest = latestVersion(spark, path)
    require(v >= 1 && v <= latest, s"cannot restore $path to v$v (latest is v$latest)")
    val files = manifestFiles(spark, path, v)
    val nv = latest + 1
    publishManifest(spark, path, nv, files, schemaJsonOf(spark, path, v))
    nv
  }

  /** SHALLOW CLONE — a new table at `destPath` whose v1 manifest points at
    * the SOURCE table's current data files (Delta's `CREATE TABLE ...
    * SHALLOW CLONE`): zero-copy, instant, and safe as long as the source
    * is not vacuumed past the clone's pin (the same caveat real shallow
    * clones carry — documented contract, not enforced across tables).
    * Subsequent commits to the clone write their own files; the clone's
    * copy-on-write DML rewrites source files INTO clone-owned files, so
    * the source is never mutated through the clone. Returns the clone's
    * version (always 1). */
  def shallowClone(spark: SparkSession, srcPath: String, destPath: String): Int = {
    val v = latestVersion(spark, srcPath)
    require(v > 0, s"nothing committed at $srcPath to clone")
    require(versions(spark, destPath).isEmpty,
      s"clone destination $destPath already has a log — refusing to overwrite")
    publishManifest(spark, destPath, 1, manifestFiles(spark, srcPath, v),
      schemaJsonOf(spark, srcPath, v))
    1
  }

  /** The schema recorded with version `v` (sidecar if present, else the
    * parquet footers of its active files). */
  private def schemaJsonOf(spark: SparkSession, path: String, v: Int): String =
    sidecarSchemaJson(spark, path, v)
      .getOrElse(readVersion(spark, path, v).schema.json)

  /** VACUUM: delete data files referenced by NO manifest among the latest
    * `retainVersions` — the retention pass that reclaims storage from
    * overwritten/compacted-away versions. Returns (liveFiles, deleted).
    * Manifests themselves are kept (history metadata stays queryable);
    * versions older than the horizon become unreadable BY DESIGN.
    * Driver-side set arithmetic over manifest listings — O(#files), the
    * same metadata pass as commit planning; the deletes are the only FS
    * mutation and removing an unreferenced file can never affect a reader
    * inside the retention horizon.
    *
    * Deletes NEVER reach outside the table root (the Delta VACUUM rule):
    * a [[shallowClone]]'s manifests pin files living under the SOURCE
    * table, and once a clone-side DML drops some of those entries a naive
    * dead-set delete would physically destroy source files the source's
    * own manifests still reference. Such outside-root files are simply
    * dropped from the clone's manifests; reclaiming them is the source
    * table's own vacuum's job. */
  def vacuum(spark: SparkSession, path: String, retainVersions: Int = 1): (Int, Int) = {
    require(retainVersions >= 1, "must retain at least the latest version")
    val vs = versions(spark, path)
    require(vs.nonEmpty, s"nothing committed at $path")
    val retained = vs.takeRight(retainVersions)
    val live = retained.flatMap(manifestFiles(spark, path, _)).toSet
    val referenced = vs.flatMap(manifestFiles(spark, path, _)).toSet
    val f = fs(spark, new Path(path))
    // fully-qualified comparison (scheme + authority + absolute path): a
    // relative `path` or a clone on another filesystem with the same
    // layout must not defeat the outside-root guard
    val rootPrefix = f.makeQualified(new Path(path)).toString.stripSuffix("/") + "/"
    val dead = (referenced -- live).toSeq.sorted
      .filter(d => f.makeQualified(new Path(d)).toString.startsWith(rootPrefix))
    dead.foreach(d => f.delete(new Path(d), false))
    (live.size, dead.size)
  }

  /** EXPIRE history (Iceberg's `expire_snapshots`): [[vacuum]] data files
    * outside the retention horizon, then delete the expired manifests
    * themselves. [[vacuum]] alone bounds STORAGE but lets `_log` grow
    * forever — and every metadata pass that walks history (the `versions`
    * listing, vacuum's referenced-set scan) is O(#versions): on a busy
    * 100 TB table committing thousands of times a day, the unbounded log
    * is the next scale-killer after dead data files. Expired versions
    * become unlistable as well as unreadable BY DESIGN. Returns
    * (expiredManifests, deletedDataFiles). */
  def expireSnapshots(spark: SparkSession, path: String,
                      retainVersions: Int = 1): (Int, Int) = {
    val (_, deleted) = vacuum(spark, path, retainVersions)
    val expired = versions(spark, path).dropRight(retainVersions)
    val f = fs(spark, new Path(path))
    expired.foreach(v => require(f.delete(new Path(path, s"_log/v$v"), true),
      s"failed to delete expired manifest v$v"))
    (expired.size, deleted)
  }

  /** STREAM the log — Delta's streaming-source contract on version
    * offsets (`readStream.format("delta")`): every committed version not
    * yet processed becomes one micro-batch holding the version's INSERT
    * delta (manifest diff vs the previous version, row-cancelled through
    * `exceptAll` exactly like [[changesBetween]]'s insert leg — an
    * overwrite streams its net-new rows, a copy-on-write rewrite streams
    * only genuinely new/changed rows, never the carried survivors twice),
    * delivered in version order. The checkpoint is a VERSION-NAMED
    * committed-offset file (`offset_v<N>`, written tmp + atomic rename to
    * a fresh name, older ones best-effort deleted after) published AFTER
    * the batch returns — any crash leaves the highest surviving name as
    * the truth, so a restart re-delivers at most the in-flight batch
    * (at-least-once; exactly-once composes with an idempotent per-batch
    * sink, the overwrite-by-batch-id convention). A checkpoint pointing
    * into EXPIRED history (the previous version's manifest is gone, so no
    * incremental delta is computable) refuses loudly instead of silently
    * re-delivering the full snapshot as a "delta" — the DeltaLogReader
    * truncated-history rule. At 100 TB the per-batch planning is the same
    * O(#files) manifest arithmetic as commit planning, and each batch
    * reads only the version's own added files. Returns the versions
    * processed this call. */
  def streamVersions(spark: SparkSession, path: String, checkpointDir: String)
                    (batch: (DataFrame, Int) => Unit): Seq[Int] = {
    val chk = new Path(checkpointDir)
    val f = fs(spark, chk)
    val OffName = "offset_v(\\d+)".r
    val last: Int =
      if (!f.exists(chk)) 0
      else f.listStatus(chk).map(_.getPath.getName)
        .collect { case OffName(n) => n.toInt }
        .maxOption.getOrElse(0)
    val todo = versions(spark, path).filter(_ > last)
    todo.foreach { v =>
      val prevManifest = new Path(path, s"_log/v${v - 1}")
      val delta =
        if (v == 1 || !f.exists(prevManifest)) {
          // no previous manifest: legitimate only as this checkpoint's
          // INITIAL snapshot — with consumed history behind it, the gap
          // means expired versions and an incomputable delta
          require(last == 0,
            s"stream checkpoint at $checkpointDir has consumed through v$last " +
              s"but version ${v - 1}'s manifest at $path is expired — the " +
              "incremental delta for v" + v + " is not computable. Restart " +
              "with a fresh checkpoint to take a new initial snapshot.")
          readVersion(spark, path, v)
        } else {
          val before = manifestFiles(spark, path, v - 1).toSet
          val after = manifestFiles(spark, path, v).toSet
          val added = (after -- before).toSeq.sorted
          val removed = (before -- after).toSeq.sorted
          def rows(fs0: Seq[String]) =
            if (fs0.nonEmpty) spark.read.parquet(fs0: _*)
            else readVersion(spark, path, v).limit(0)
          // pure append — the overwhelmingly common streaming commit — has
          // nothing to cancel: skip the exceptAll aggregation shuffle
          if (removed.isEmpty) rows(added)
          else rows(added).exceptAll(rows(removed))
        }
      batch(delta, v)
      // commit the offset as a NEW name (rename to a non-existent path is
      // the atomic primitive); a crash anywhere leaves the highest
      // surviving offset_v* as the truth — no delete-then-rename window
      val tmp = new Path(checkpointDir, s".tmp_offset_$v")
      val out = f.create(tmp, true)
      try out.write(v.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      val dst = new Path(checkpointDir, s"offset_v$v")
      require(f.rename(tmp, dst), s"failed to commit stream offset v$v")
      // best-effort cleanup of superseded offsets (crash-safe: max wins)
      f.listStatus(chk).map(_.getPath)
        .filter { p =>
          p.getName match {
            case OffName(n) => n.toInt < v
            case _ => false
          }
        }
        .foreach(p => f.delete(p, false))
    }
    todo
  }
}
