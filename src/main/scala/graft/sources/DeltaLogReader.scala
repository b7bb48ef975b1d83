package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.collection.mutable

/** Read-only interpreter for the PUBLIC Delta Lake transaction-log format
  * (the open `_delta_log` protocol: versioned JSON commits of add/remove
  * actions over immutable parquet parts, plus optional parquet checkpoints
  * advertised by `_last_checkpoint`).
  *
  * This closes the one storage-format gap a real user of the reference
  * could hand us: the reference persists its tiles as a Delta table and
  * `OPTIMIZE ZORDER`s it (`01_geofraud_clustering.py:431,440`); the repo's
  * own write path is [[graft.operators.SnapshotLog]] (capability twin —
  * Delta jars are not on this classpath), and THIS reader lets queries
  * consume a table someone else wrote with real Delta. Read-only by
  * design: interpreting commits is a spec-stable driver pass; writing the
  * protocol correctly (protocol versions, atomic JSON commits, invariants)
  * is Delta's job, not a reimplementation target.
  *
  * Protocol subset honored (all public, delta-io PROTOCOL.md):
  *  - `_delta_log/%020d.json`: one action per line; `add.path` activates a
  *    file, `remove.path` deactivates it; `commitInfo`/`txn` lines are
  *    skipped; `protocol` and `metaData` lines are INSPECTED and either
  *    honored — column mapping (name/id modes, [[readMapped]]) and
  *    deletion vectors ([[applyDeletionVectors]] + [[DeletionVectors]])
  *    are READ — or refused loudly when correct interpretation needs a
  *    feature this reader does not implement (v2 checkpoints, unknown
  *    reader features): silently ignoring one would serve deleted rows
  *    or physical column names — wrong answers, not missing features.
  *    Schema comes from the parquet footers except under column mapping;
  *  - `_delta_log/%020d.checkpoint.parquet` (single-part) holding the
  *    compacted state as `add`/`remove` structs;
  *  - `_delta_log/_last_checkpoint`: `{"version":N,...}` pointer — commits
  *    ≤ N may be truncated away, replay resumes from the checkpoint.
  *
  * Scale: the log replay is O(#actions) driver work on KB-size JSON — the
  * same planning-metadata pass every Delta reader performs — and the
  * resulting file list is bounded by [[graft.operators.ManifestGuard]]
  * before the scan is planned. */
object DeltaLogReader {

  private val mapper = new ObjectMapper()

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  private def logDir(path: String) = new Path(path, "_delta_log")

  /** Commit versions present as JSON files, ascending. */
  def versions(spark: SparkSession, path: String): Seq[Long] = {
    val log = logDir(path)
    val f = fs(spark, log)
    if (!f.exists(log)) Seq.empty
    else f.listStatus(log).map(_.getPath.getName)
      .collect { case n if n.endsWith(".json") && n.length == 25 =>
        n.stripSuffix(".json").toLong }
      .sorted.toSeq
  }

  /** Commit timestamps in version order, as Delta's own time travel
    * derives them: per commit, `commitInfo.inCommitTimestamp` when
    * present (the in-commit-timestamps feature's authoritative field —
    * tables without the feature never carry it), else the commit FILE's
    * modification time (the classic protocol rule; `commitInfo.timestamp`
    * is display metadata and deliberately not trusted). Then the
    * monotonicity adjustment Delta's history manager applies: a commit
    * whose raw timestamp does not exceed its predecessor's is served as
    * predecessor + 1 ms, so out-of-order file mtimes (clock skew, copies)
    * can never make AS-OF resolution non-monotonic. Only commits whose
    * JSON still EXISTS participate — a checkpoint-truncated history
    * cannot be timestamp-resolved below its earliest surviving commit. */
  def commitTimestamps(spark: SparkSession, path: String): Seq[(Long, Long)] = {
    val log = logDir(path)
    val f = fs(spark, log)
    val raw = versions(spark, path).map { v =>
      val p = new Path(log, f"$v%020d.json")
      val ict = readSmallFile(spark, p).linesIterator
        .filter(_.contains("commitInfo")).flatMap { line =>
          val node = mapper.readTree(line).path("commitInfo")
          val t = node.path("inCommitTimestamp")
          if (t.isNumber) Some(t.asLong) else None
        }.nextOption()
      (v, ict.getOrElse(f.getFileStatus(p).getModificationTime))
    }
    var prev = Long.MinValue
    raw.map { case (v, t) =>
      val adj = if (t <= prev) prev + 1L else t
      prev = adj
      (v, adj)
    }
  }

  /** Time travel by TIMESTAMP: read the table as of the latest commit
    * whose (adjusted) timestamp is <= `tsMillis` — the rule Delta's
    * `TIMESTAMP AS OF` resolves by, and the twin of the Iceberg
    * reader's readAsOf (q234). A timestamp before the first surviving
    * commit has no defined state and is refused with the valid range
    * named. */
  def readAsOfTimestamp(spark: SparkSession, path: String,
                        tsMillis: Long): DataFrame = {
    val ts = commitTimestamps(spark, path)
    require(ts.nonEmpty, s"Delta table at $path has no commits")
    val eligible = ts.filter(_._2 <= tsMillis)
    require(eligible.nonEmpty,
      s"no commit of $path at or before timestamp $tsMillis — the " +
        s"earliest surviving commit is v${ts.head._1} at ${ts.head._2}; " +
        "a timestamp before it has no defined table state")
    read(spark, path, asOf = Some(eligible.last._1))
  }

  private[sources] def readSmallFile(spark: SparkSession, p: Path): String = {
    val f = fs(spark, p)
    val buf = new Array[Byte](f.getFileStatus(p).getLen.toInt)
    val in = f.open(p)
    try in.readFully(buf) finally in.close()
    new String(buf, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Checkpoint versions present as parquet artifacts (single- or
    * multi-part spelling), ascending. */
  private def checkpointVersions(spark: SparkSession, path: String): Seq[Long] = {
    val log = logDir(path)
    val f = fs(spark, log)
    if (!f.exists(log)) Seq.empty
    else f.listStatus(log).map(_.getPath.getName)
      .collect {
        case n if n.length >= 20 && n.contains(".checkpoint.") &&
          n.endsWith(".parquet") && n.take(20).forall(_.isDigit) =>
          n.take(20).toLong
      }
      .distinct.sorted.toSeq
  }

  /** The newest usable checkpoint version (≤ `asOf` when a version is
    * pinned — time travel to v must replay from scratch if the only
    * checkpoint is newer). The `_last_checkpoint` pointer is consulted
    * first; a MISSING pointer falls back to listing the checkpoint
    * parquet files themselves (real readers do the same — the pointer's
    * republish is not atomic on every filesystem, and a table whose
    * early commits were pruned is unreadable without its checkpoint). */
  private[sources] def lastCheckpointVersion(spark: SparkSession,
                                             path: String): Option[Long] =
    lastCheckpoint(spark, path, None)

  private def lastCheckpoint(spark: SparkSession, path: String,
                             asOf: Option[Long]): Option[Long] = {
    val p = new Path(logDir(path), "_last_checkpoint")
    val pointed =
      if (!fs(spark, p).exists(p)) None
      else Some(mapper.readTree(readSmallFile(spark, p)).get("version").asLong())
    pointed.orElse(checkpointVersions(spark, path).lastOption)
      .filter(v => asOf.forall(v <= _))
      // a pointed-at version past asOf may still have an older usable
      // checkpoint on disk
      .orElse(checkpointVersions(spark, path).filter(v => asOf.forall(v <= _))
        .lastOption)
  }

  /** Reader features whose PRESENCE in the protocol is harmless because
    * their actual use is gated where it appears (columnMapping via the
    * metaData mode, deletionVectors per add action) or because they have
    * no read-path semantics beyond what parquet footers already carry
    * (timestampNtz) / none at all (vacuumProtocolCheck). Anything else —
    * v2Checkpoint, typeWidening, future features — changes how the log or
    * the data must be interpreted, so an unknown name is refused. */
  private val BenignReaderFeatures = Set(
    "columnMapping", "deletionVectors", "timestampNtz", "vacuumProtocolCheck")

  /** Refuse protocol versions/features this interpreter cannot read
    * CORRECTLY. Silently proceeding would not be "partial support" — a
    * v2Checkpoint table's `_last_checkpoint` points at a differently-named
    * artifact, and an unknown reader feature may redefine what an `add`
    * means; both produce wrong rows, not errors, downstream. */
  private def checkProtocol(node: JsonNode, where: String): Unit = {
    val mrv = Option(node.get("minReaderVersion")).map(_.asInt()).getOrElse(1)
    if (mrv >= 3) {
      val feats = Option(node.get("readerFeatures")).toSeq
        .flatMap(n => (0 until n.size()).map(i => n.get(i).asText()))
      val unsupported = feats.filterNot(BenignReaderFeatures)
      require(unsupported.isEmpty,
        s"Delta table ($where) requires reader features ${unsupported.mkString(", ")} " +
          "this interpreter does not implement — refusing a wrong-row-set read")
    } else require(mrv <= 2,
      s"Delta table ($where) requires minReaderVersion $mrv — unsupported")
  }

  /** Refuse metaData states whose correct reading this interpreter cannot
    * honor: an unknown column-mapping mode (only `none`, `name`, `id`
    * have defined read semantics — `name`/`id` ARE read, see
    * [[readMapped]]); a non-parquet format provider means the data files
    * are not parquet at all. */
  private def checkMetaData(node: JsonNode, where: String): Unit = {
    val mode = mappingMode(node)
    require(mode == "none" || mode == "name" || mode == "id",
      s"Delta table ($where) uses unknown column mapping mode '$mode' — " +
        "refusing a guess at how the footers map to the logical schema")
    val provider = Option(node.get("format"))
      .flatMap(f => Option(f.get("provider"))).map(_.asText())
    require(provider.forall(_.equalsIgnoreCase("parquet")),
      s"Delta table ($where) stores data as '${provider.get}', not parquet")
  }

  private[sources] def mappingMode(meta: JsonNode): String =
    Option(meta.get("configuration"))
      .flatMap(c => Option(c.get("delta.columnMapping.mode")))
      .map(_.asText()).getOrElse("none")

  /** Percent-decode a URI path component. NOT `URLDecoder.decode` alone:
    * that does form-decoding where '+' means space, but in a
    * percent-encoded URI path '+' is a literal plus — a real table whose
    * file names contain '+' would resolve to nonexistent paths. */
  private[sources] def percentDecode(s: String): String =
    java.net.URLDecoder.decode(s.replace("+", "%2B"), "UTF-8")

  /** Delta `path` fields are relative percent-encoded URIs. */
  private[sources] def decodePath(tableRoot: String, rel: String): String = {
    val dec = percentDecode(rel)
    if (dec.startsWith("/") || dec.contains("://")) dec
    else s"$tableRoot/$dec"
  }

  /** Latest log version — JSON commits OR the checkpoint pointer,
    * whichever is newer (after checkpoint-based log truncation the
    * commits alone under-report). None for a path with no log. */
  def latestVersion(spark: SparkSession, path: String): Option[Long] = {
    val vs = versions(spark, path)
    (vs.lastOption.toSeq ++ lastCheckpoint(spark, path, None).toSeq)
      .maxOption
  }

  /** CHANGE DATA FEED — row-level changes for commits
    * `fromVersion..toVersion` inclusive (the `table_changes` /
    * `readChangeFeed` surface). Per commit: when the commit carries
    * `cdc` actions, its change data IS those `_change_data/` files —
    * they fully describe the commit, and its add/remove actions are NOT
    * re-derived (PROTOCOL.md's Change Data Files rule). Otherwise the
    * changes DERIVE from the actions: `add(dataChange=true)` files'
    * rows serve as `insert`, `remove(dataChange=true)` files' rows as
    * `delete` (blind appends and overwrites never write change files —
    * delta-spark derives them the same way; the removed parquet must
    * still exist, i.e. not vacuumed). `dataChange=false` commits
    * (OPTIMIZE, metaData/property changes) contribute nothing. Two loud
    * refusals: a DV-carrying `add` in a commit WITHOUT cdc actions (the
    * change hides inside the bitmap; deriving it would need a pre-state
    * diff this reader does not guess), and a column-mapped table
    * (change files would need logical-name resolution).
    *
    * Output: the table's columns plus `_change_type` (insert / delete /
    * update_preimage / update_postimage), `_commit_version`, and
    * `_commit_timestamp` ([[commitTimestamps]]' adjusted clock — mtime-
    * derived on tables without in-commit timestamps, so stable ordering
    * but not stable values across copies). */
  def readChangeFeed(spark: SparkSession, path: String,
                     fromVersion: Long, toVersion: Long): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, timestamp_millis}
    require(fromVersion >= 0 && fromVersion <= toVersion,
      s"bad change-feed range [$fromVersion, $toVersion]")
    val (_, meta) = replayState(spark, path, Some(toVersion))
    val metaNode = meta.getOrElse(throw new IllegalArgumentException(
      s"Delta log at $path carries no metaData action"))
    require(mappingMode(metaNode) == "none",
      s"Delta table at $path uses column mapping — the change feed would " +
        "need logical-to-physical name resolution; refusing")
    require(DeltaLogWriter.cdfEnabled(metaNode),
      s"Delta table at $path does not set delta.enableChangeDataFeed — " +
        "no change-feed contract exists for its commits; diff snapshots " +
        "instead (SnapshotLog.changesBetween semantics)")
    val tableCols = org.apache.spark.sql.types.DataType
      .fromJson(metaNode.get("schemaString").asText())
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.toSeq
    val present = versions(spark, path).toSet
    val missing = (fromVersion to toVersion).filterNot(present)
    require(missing.isEmpty,
      s"change-feed range [$fromVersion, $toVersion] of $path names " +
        s"commit(s) ${missing.mkString(", ")} whose JSON no longer exists " +
        "(checkpoint-truncated history) — changes below the truncation " +
        "point are unrecoverable")
    val ts = commitTimestamps(spark, path).toMap
    val f = fs(spark, new Path(path))
    val perCommit: Seq[DataFrame] = (fromVersion to toVersion).flatMap { v =>
      val nodes = readSmallFile(spark, new Path(logDir(path), f"$v%020d.json"))
        .split("\n").filter(_.nonEmpty).map(mapper.readTree).toSeq
      val cdcPaths = nodes.flatMap(n => Option(n.get("cdc")))
        .map(c => decodePath(path, c.get("path").asText()))
      val changes: Option[DataFrame] =
        if (cdcPaths.nonEmpty)
          Some(spark.read.parquet(cdcPaths: _*)
            .select((tableCols :+ "_change_type").map(col): _*))
        else {
          val dvAdds = nodes.filter(n => Option(n.get("add"))
            .exists(a => a.path("dataChange").asBoolean(false) && a.has("deletionVector")))
          require(dvAdds.isEmpty,
            s"commit v$v of $path attaches deletion vectors but carries " +
              "no cdc actions — its row-level changes are not derivable " +
              "from the file actions; the writer that produced it did " +
              "not honor the table's change-feed contract")
          // the remove side has the mirror hazard: deriving 'delete'
          // rows by reading the removed parquet WHOLE counts its
          // DV-dead positions as deletes even though they were never
          // live. The descriptor on a remove is OPTIONAL in the
          // protocol, so checking the action alone is not enough — when
          // the commit removes anything, consult the PRE-commit replay
          // state (which records every active file's DV) and refuse if
          // any removed file carried one. Blind appends (no removes,
          // the streaming-common case) never pay the replay.
          val dvRemoves = nodes.filter(n => Option(n.get("remove"))
            .exists(r => r.path("dataChange").asBoolean(false) &&
              r.has("deletionVector") && !r.get("deletionVector").isNull))
          require(dvRemoves.isEmpty,
            s"commit v$v of $path removes deletion-vector-carrying " +
              "file(s) without cdc actions — the removed files' live row " +
              "sets are not the whole files, so the deletes are not " +
              "derivable from the actions; refusing an over-reported feed")
          val removedPaths = nodes.flatMap(n => Option(n.get("remove")))
            .filter(_.path("dataChange").asBoolean(false))
            .map(r => decodePath(path, r.get("path").asText()))
          if (removedPaths.nonEmpty && v > 0) {
            val preState =
              try replayState(spark, path, Some(v - 1))._1.toMap
              catch { case e: IllegalArgumentException =>
                throw new IllegalArgumentException(
                  s"commit v$v of $path removes files and carries no cdc " +
                    s"actions; its pre-commit state (v${v - 1}) is not " +
                    "replayable (truncated history), so whether the removed " +
                    "files carried deletion vectors cannot be verified — " +
                    "refusing a possibly over-reported feed", e)
              }
            val dvCarrying = removedPaths.filter(p =>
              preState.get(p).exists(_.isDefined))
            require(dvCarrying.isEmpty,
              s"commit v$v of $path removes deletion-vector-carrying " +
                s"file(s) (${dvCarrying.take(3).mkString(", ")}) without " +
                "cdc actions — the removed files' live row sets are not " +
                "the whole files, so the deletes are not derivable from " +
                "the actions; refusing an over-reported feed")
          }
          def filesOf(key: String): Seq[String] = nodes
            .flatMap(n => Option(n.get(key)))
            .filter(_.path("dataChange").asBoolean(false))
            .map(a => decodePath(path, a.get("path").asText()))
          val added = filesOf("add")
          val removed = filesOf("remove")
          // eager, for BOTH sides: a vacuumed file must refuse here by
          // name, not surface as a raw FileNotFound mid-action later
          (added ++ removed).foreach(p => require(f.exists(new Path(p)),
            s"commit v$v of $path references $p, which is gone from disk " +
              "(vacuumed) — its change rows are unrecoverable"))
          def tagged(files: Seq[String], tag: String): Option[DataFrame] =
            if (files.isEmpty) None
            else Some(spark.read.parquet(files: _*)
              .select(tableCols.map(col): _*)
              .withColumn("_change_type", lit(tag)))
          (tagged(added, "insert"), tagged(removed, "delete")) match {
            case (Some(a), Some(r)) => Some(a.unionByName(r))
            case (a, r) => a.orElse(r)
          }
        }
      changes.map(_
        .withColumn("_commit_version", lit(v))
        .withColumn("_commit_timestamp", timestamp_millis(lit(ts(v)))))
    }
    perCommit.reduceOption(_.unionByName(_)).getOrElse {
      // a changeless range is legal — serve the TYPED empty feed
      val st = org.apache.spark.sql.types.StructType(
        org.apache.spark.sql.types.DataType
          .fromJson(metaNode.get("schemaString").asText())
          .asInstanceOf[org.apache.spark.sql.types.StructType].fields ++ Seq(
          org.apache.spark.sql.types.StructField("_change_type",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("_commit_version",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("_commit_timestamp",
            org.apache.spark.sql.types.TimestampType)))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], st)
    }
  }

  /** STREAM the Change Data Feed — the incremental CDC consumption loop
    * over a real Delta table (`readStream.option("readChangeFeed")`'s
    * semantics, driven by the same polling micro-batch discipline as
    * `SnapshotLog.streamVersions`): every not-yet-consumed commit is
    * served as ONE micro-batch of [[readChangeFeed]](v, v) rows, then
    * its offset commits as a crash-safe file (rename-to-new-name is the
    * atomic primitive; max surviving `offset_v*` wins, so a crash
    * between batch and offset replays that batch — at-least-once into
    * an idempotent sink, exactly-once with the offset intact).
    * Changeless commits (metaData, OPTIMIZE) advance the offset without
    * invoking `batch`. A fresh checkpoint starts at `startVersion`
    * (serve from AFTER the CDF-enabling commit — versions before it
    * refuse through [[readChangeFeed]]'s own gate).
    * Returns the versions consumed THIS drain (empty = caught up). */
  def streamChangeFeed(spark: SparkSession, path: String,
                       checkpointDir: String, startVersion: Long = 0L)
                      (batch: (DataFrame, Long) => Unit): Seq[Long] = {
    val offsets = new graft.operators.StreamOffsets(spark, checkpointDir, "offset_v")
    val from = offsets.readMax(identity).map(_ + 1).getOrElse(startVersion)
    val todo = versions(spark, path).filter(_ >= from)
    todo.foreach { v =>
      // persisted across the emptiness probe and the batch itself so a
      // derived stratum's file reads run once, not twice
      val changes = readChangeFeed(spark, path, v, v).persist()
      try { if (!changes.isEmpty) batch(changes, v) }
      finally changes.unpersist()
      offsets.commit(v, identity)
    }
    todo
  }

  /** STREAM a plain (non-CDF) Delta table as per-version ADD-FILE
    * micro-batches — the real delta streaming source's default
    * semantics: each not-yet-consumed commit's `add(dataChange=true)`
    * files serve as ONE batch of plain table rows, then the version
    * commits as a crash-safe file offset (the [[streamChangeFeed]] /
    * `SnapshotLog.streamVersions` discipline — max surviving offset
    * wins; a crash between batch and offset replays that batch,
    * at-least-once into an idempotent sink). `dataChange=false`
    * commits (OPTIMIZE, metaData/property changes) advance the offset
    * silently. A commit that REMOVES data (`remove` or a DV re-add
    * with dataChange=true) is not a blind append and REFUSES loudly —
    * the delta source's own rule absent ignoreChanges: serving only
    * its adds would stream rows the table no longer holds and skip the
    * deletes entirely. Column-mapped tables resolve through the same
    * name/id machinery as [[read]].
    * Returns the versions consumed THIS drain (empty = caught up). */
  def streamAdds(spark: SparkSession, path: String,
                 checkpointDir: String, startVersion: Long = 0L)
                (batch: (DataFrame, Long) => Unit): Seq[Long] = {
    val offsets = new graft.operators.StreamOffsets(spark, checkpointDir, "offset_v")
    val from = offsets.readMax(identity).map(_ + 1).getOrElse(startVersion)
    val todo = versions(spark, path).filter(_ >= from)
    val f = fs(spark, new Path(path))
    // metaData tracked INCREMENTALLY across the drain (seeded once at
    // the first consumed version, then updated from each commit's own
    // metaData action — later wins): one replay per drain, not one per
    // version, so a thousand-commit catch-up stays O(commits)
    var lastMeta: Option[JsonNode] =
      todo.headOption.flatMap(v => replayState(spark, path, Some(v))._2)
    todo.foreach { v =>
      val nodes = readSmallFile(spark, new Path(logDir(path), f"$v%020d.json"))
        .split("\n").filter(_.nonEmpty).map(mapper.readTree).toSeq
      nodes.filter(_.has("metaData")).foreach(n => lastMeta = Some(n.get("metaData")))
      val removes = nodes.filter(n => Option(n.get("remove"))
        .exists(_.path("dataChange").asBoolean(false)))
      val dvAdds = nodes.filter(n => Option(n.get("add")).exists(a =>
        a.path("dataChange").asBoolean(false) &&
          a.has("deletionVector") && !a.get("deletionVector").isNull))
      require(removes.isEmpty && dvAdds.isEmpty,
        s"commit v$v of $path is not a blind append (it removes data " +
          "or attaches deletion vectors) — a plain add-file stream would " +
          "serve rows the table no longer holds; consume the Change Data " +
          "Feed instead (streamChangeFeed) or compact upstream")
      val added = nodes.flatMap(n => Option(n.get("add")))
        .filter(_.path("dataChange").asBoolean(false))
        .map(a => decodePath(path, a.get("path").asText()))
      if (added.nonEmpty) {
        added.foreach(p => require(f.exists(new Path(p)),
          s"commit v$v of $path adds $p, which is gone from disk " +
            "(vacuumed past this stream's position) — its rows are " +
            "unrecoverable; restart from a newer startVersion"))
        // metaData AS OF this commit, so a mapped table serves logical
        // names exactly as the batch's writer defined them
        val rows = lastMeta.map(mappingMode).filter(_ != "none") match {
          case Some(mode) => readMapped(spark, path, added, lastMeta.get, mode)
          case None => spark.read.option("basePath", path).parquet(added: _*)
        }
        val persisted = rows.persist()
        try { if (!persisted.isEmpty) batch(persisted, v) }
        finally persisted.unpersist()
      }
      offsets.commit(v, identity)
    }
    todo
  }

  /** The rows APPENDED by commits `fromV..toV` inclusive — the batch
    * behind one micro-batch of the by-name streaming source
    * ([[graft.plans.CatalogTableSubstitution]]'s `readStream.table`
    * seam) and a standalone incremental read: [[streamAdds]]'s
    * semantics over a version RANGE, as ONE frame. Blind appends only —
    * a commit that removes data or attaches deletion vectors refuses
    * loudly with the CDF remedy named (the delta source's own rule
    * absent ignoreChanges); `dataChange=false` commits contribute
    * nothing. metaData tracked incrementally across the range (one
    * replay seed), mapped tables serve logical names, and a changeless
    * range returns the TYPED empty frame of the range-end schema. */
  def addsBetween(spark: SparkSession, path: String,
                  fromV: Long, toV: Long): DataFrame = {
    import org.apache.spark.sql.functions.col
    require(fromV >= 0 && fromV <= toV,
      s"addsBetween wants 0 <= from <= to, got [$fromV, $toV]")
    val all = versions(spark, path)
    val known = all.filter(v => v >= fromV && v <= toV)
    // the whole range must still EXIST as commit JSONs: cleanLog (this
    // repo's own checkpoint-then-truncate maintenance) prunes
    // pre-checkpoint commits, and silently skipping a pruned version
    // would serve PARTIAL data — the same unrecoverable-position story
    // as the vacuumed-parquet guard below, refused the same way
    locally {
      val have = known.toSet
      val missing = (fromV to toV).filterNot(have)
      require(missing.isEmpty,
        s"commit JSON(s) v${missing.take(5).mkString(", v")}" +
          s"${if (missing.size > 5) ", …" else ""} of $path are gone — " +
          "the log was truncated (cleanLog) or never reached past this " +
          "stream's position; their adds cannot be replayed. Restart " +
          "from a newer startVersion (or a fresh full snapshot)")
    }
    val f = fs(spark, new Path(path))
    var lastMeta: Option[JsonNode] =
      known.headOption.flatMap(v => replayState(spark, path, Some(v))._2)
    val perVersion = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    known.foreach { v =>
      val nodes = readSmallFile(spark, new Path(logDir(path), f"$v%020d.json"))
        .split("\n").filter(_.nonEmpty).map(mapper.readTree).toSeq
      nodes.filter(_.has("metaData")).foreach(n => lastMeta = Some(n.get("metaData")))
      val removes = nodes.filter(n => Option(n.get("remove"))
        .exists(_.path("dataChange").asBoolean(false)))
      val dvAdds = nodes.filter(n => Option(n.get("add")).exists(a =>
        a.path("dataChange").asBoolean(false) &&
          a.has("deletionVector") && !a.get("deletionVector").isNull))
      require(removes.isEmpty && dvAdds.isEmpty,
        s"commit v$v of $path is not a blind append (it removes data " +
          "or attaches deletion vectors) — a plain add-file stream would " +
          "serve rows the table no longer holds; consume the Change Data " +
          "Feed instead (streamChangeFeed) or compact upstream")
      val added = nodes.flatMap(n => Option(n.get("add")))
        .filter(_.path("dataChange").asBoolean(false))
        .map(a => decodePath(path, a.get("path").asText()))
      if (added.nonEmpty) {
        added.foreach(p => require(f.exists(new Path(p)),
          s"commit v$v of $path adds $p, which is gone from disk " +
            "(vacuumed past this stream's position) — its rows are " +
            "unrecoverable; restart from a newer startVersion"))
        perVersion += (lastMeta.map(mappingMode).filter(_ != "none") match {
          case Some(mode) => readMapped(spark, path, added, lastMeta.get, mode)
          case None =>
            val declared = lastMeta.flatMap(m => scala.util.Try(
              org.apache.spark.sql.types.DataType
                .fromJson(m.path("schemaString").asText(""))
                .asInstanceOf[org.apache.spark.sql.types.StructType])
              .toOption.filter(_.fields.nonEmpty))
            val reader = spark.read.option("basePath", path)
            declared.fold(reader)(reader.schema).parquet(added: _*)
        })
      }
    }
    // the returned frame carries the schema AS OF THE RANGE END: an ADD
    // COLUMN mid-range means earlier versions' frames lack the new
    // column — they union with allowMissingColumns and the final select
    // null-fills/pins order, exactly what the declared-schema scan does
    // within one generation (a trailing addless metaData commit still
    // shapes the output)
    val declaredEnd = lastMeta
      .orElse(replayState(spark, path, known.lastOption)._2)
      .map(m => org.apache.spark.sql.types.DataType
        .fromJson(m.path("schemaString").asText())
        .asInstanceOf[org.apache.spark.sql.types.StructType])
      .getOrElse(throw new IllegalArgumentException(
        s"Delta log at $path carries no metaData — nothing to type the " +
          "adds frame from"))
    perVersion.reduceOption(_.unionByName(_, allowMissingColumns = true))
      .map { u =>
        val have = u.columns.toSet
        u.select(declaredEnd.fields.map { fd =>
          if (have(fd.name)) col(s"`${fd.name}`")
          else org.apache.spark.sql.functions.lit(null)
            .cast(fd.dataType).as(fd.name)
        }.toSeq: _*)
      }
      .getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], declaredEnd))
  }

  /** The table's active file set as of `asOf` (default: latest commit):
    * checkpoint base (when one applies) + ordered JSON replay. REFUSES a
    * table whose active files carry deletion vectors: the file list
    * alone under-describes such a table, and this entry point feeds the
    * WRITER (checkpoint compaction, appends) — a checkpoint built from
    * bare paths would drop the DVs and resurrect deleted rows. [[read]]
    * applies DVs instead. */
  def activeFiles(spark: SparkSession, path: String,
                  asOf: Option[Long] = None): Seq[String] = {
    val entries = replayState(spark, path, asOf)._1
    val dvd = entries.collect { case (f, Some(_)) => f }
    require(dvd.isEmpty,
      s"Delta table at $path carries deletion vectors on ${dvd.size} " +
        s"active file(s) (first: ${dvd.headOption.getOrElse("")}) — the " +
        "bare file list under-describes it and anything built from the " +
        "list alone would resurrect deleted rows; use read() (which " +
        "applies the DVs) or compact the table first")
    entries.map(_._1)
  }

  /** Active (file, deletion-vector descriptor JSON) pairs plus the LAST
    * `metaData` action seen in replay order (checkpoint state first,
    * then commits — later wins, the protocol's metadata-evolution rule),
    * which [[read]] needs to honor an active column-mapping mode. A
    * re-`add` of an already-active path REPLACES its entry — that is how
    * Delta attaches or rewrites a file's DV without rewriting the file. */
  private[sources] def replayState(spark: SparkSession, path: String,
                          asOf: Option[Long]): (Seq[(String, Option[String])], Option[JsonNode]) = {
    val vs = versions(spark, path)
    val ckpt = lastCheckpoint(spark, path, asOf)
    require(vs.nonEmpty || ckpt.nonEmpty,
      s"no Delta log found at $path/_delta_log (no commit JSONs, no checkpoint)")
    val latest = (vs.lastOption.toSeq ++ ckpt.toSeq).max
    val target = asOf.getOrElse(latest)
    require(asOf.forall(v => vs.contains(v) || ckpt.contains(v)),
      s"version $target does not exist at $path (commits: $vs, checkpoint: $ckpt)")

    // a log whose earliest commit is not 0 and that has no checkpoint has
    // lost history — replaying what remains would silently drop the
    // truncated commits' adds/removes
    require(ckpt.nonEmpty || vs.headOption.contains(0L),
      s"Delta log at $path starts at commit ${vs.head} with no usable " +
        "checkpoint — the truncated history cannot be replayed; refusing")

    // path -> deletion-vector descriptor JSON (None = whole file live);
    // insertion-ordered so the planned scan order stays the log's order
    val active = mutable.LinkedHashMap.empty[String, Option[String]]
    var lastMeta: Option[JsonNode] = None
    ckpt.foreach { cv =>
      // checkpoint at cv: single-part (%020d.checkpoint.parquet) or
      // multi-part (%020d.checkpoint.%010d.%010d.parquet) — the protocol's
      // two spellings; multi-part parts union into one compacted state
      val single = new Path(logDir(path), f"$cv%020d.checkpoint.parquet")
      val f = fs(spark, single)
      val parts: Seq[Path] =
        if (f.exists(single)) Seq(single)
        else f.globStatus(new Path(logDir(path),
            f"$cv%020d.checkpoint.??????????.??????????.parquet"))
          .map(_.getPath).sortBy(_.getName).toSeq
      require(parts.nonEmpty,
        s"_last_checkpoint points at v$cv but no checkpoint parquet exists at $path")
      val ckDf = spark.read.parquet(parts.map(_.toString): _*)
      val where = s"checkpoint v$cv at $path"
      // protocol/metaData are compacted INTO a checkpoint (the commits
      // that carried them may be truncated away) — gate them here exactly
      // like their JSON spellings
      val top = ckDf.schema.fieldNames.toSet
      if (top.contains("protocol"))
        ckDf.where(org.apache.spark.sql.functions.col("protocol").isNotNull)
          .select(org.apache.spark.sql.functions.to_json(
            org.apache.spark.sql.functions.col("protocol"))).collect()
          .foreach(r => checkProtocol(mapper.readTree(r.getString(0)), where))
      if (top.contains("metaData"))
        ckDf.where(org.apache.spark.sql.functions.col("metaData").isNotNull)
          .select(org.apache.spark.sql.functions.to_json(
            org.apache.spark.sql.functions.col("metaData"))).collect()
          .foreach { r =>
            val node = mapper.readTree(r.getString(0))
            checkMetaData(node, where)
            lastMeta = Some(node)
          }
      val addHasDv = top.contains("add") &&
        ckDf.schema("add").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
          .fieldNames.contains("deletionVector")
      val dvExpr =
        if (addHasDv) "to_json(add.deletionVector)" else "CAST(NULL AS STRING)"
      val removeExpr = if (top.contains("remove")) "remove.path" else "CAST(NULL AS STRING)"
      val rows = graft.operators.ManifestGuard.collectCapped(
        ckDf.selectExpr("add.path AS a", s"$removeExpr AS r", s"$dvExpr AS dv"),
        s"Delta $where")
      rows.foreach { row =>
        if (!row.isNullAt(0)) {
          val dv = if (row.isNullAt(2)) None else Some(row.getString(2))
          active(decodePath(path, row.getString(0))) = dv
        } else if (!row.isNullAt(1)) active -= decodePath(path, row.getString(1))
      }
    }
    // replay JSON commits after the checkpoint (or all of them without one)
    // — and require the sequence CONTIGUOUS: a missing middle commit would
    // otherwise silently skip its adds/removes and serve a wrong row set
    val replay = vs.filter(v => ckpt.forall(_ < v) && v <= target)
    replay.headOption.foreach { first =>
      val expectedFirst = ckpt.map(_ + 1).getOrElse(first)
      val expected = expectedFirst to replay.last
      require(replay == expected,
        s"Delta log at $path has version gaps: need commits $expected after " +
          s"checkpoint $ckpt but found $replay — refusing a wrong-row-set read")
    }
    replay.foreach { v =>
      val commit = new Path(logDir(path), f"$v%020d.json")
      readSmallFile(spark, commit).split("\n").filter(_.nonEmpty).foreach { line =>
        val node: JsonNode = mapper.readTree(line)
        if (node.has("add")) {
          val add = node.get("add")
          val dv =
            if (add.has("deletionVector") && !add.get("deletionVector").isNull)
              Some(add.get("deletionVector").toString)
            else None
          active(decodePath(path, add.get("path").asText())) = dv
        } else if (node.has("remove"))
          active -= decodePath(path, node.get("remove").get("path").asText())
        else if (node.has("protocol"))
          checkProtocol(node.get("protocol"), s"commit v$v at $path")
        else if (node.has("metaData")) {
          checkMetaData(node.get("metaData"), s"commit v$v at $path")
          lastMeta = Some(node.get("metaData"))
        }
        // commitInfo / txn: audit metadata with no read-path semantics
      }
    }
    val out = active.toSeq
    require(out.size <= graft.operators.ManifestGuard.MaxPlannedFiles,
      s"Delta table at $path resolves to ${out.size} active files — past the " +
        "planning cap; compact or partition-prune first")
    (out, lastMeta)
  }

  /** Read the table (optionally AS OF a pinned log version). Empty active
    * set → empty frame; schema then comes from any logged file's footer if
    * one exists, else this fails loudly (a table that never had data files
    * has no schema source without metaData interpretation). A table whose
    * metaData activates COLUMN MAPPING is read through [[readMapped]]:
    * logical names from the schemaString, resolved against the physical
    * footers by `delta.columnMapping.physicalName` (name mode) or
    * `delta.columnMapping.id` via parquet field ids (id mode). */
  def read(spark: SparkSession, path: String, asOf: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.functions.col
    val (entries, meta) = replayState(spark, path, asOf)
    if (entries.isEmpty) throw new EmptyTableException(
      s"Delta table at $path has no active files as of ${asOf.getOrElse("latest")}")
    val files = entries.map(_._1)
    val withDv = entries.collect { case (f, Some(dv)) => (f, dv) }
    val base = meta.map(mappingMode).filter(_ != "none") match {
      case Some(mode) =>
        readMapped(spark, path, files, meta.get, mode, withRowCoords = withDv.nonEmpty)
      case None =>
        // scan typed by the LOG's schemaString, not a sampled footer:
        // after ADD COLUMN the old generation's files lack the new
        // column, and a footer-sampled schema would either drop it or
        // fail depending on which file Spark sampled — the declared
        // schema null-fills per file, Delta's own read semantics. A
        // metaData without a parsable non-empty schemaString (minimal
        // hand-written logs in the wild) falls back to the footer scan.
        val declared = meta.flatMap(m => scala.util.Try(
          org.apache.spark.sql.types.DataType
            .fromJson(m.path("schemaString").asText(""))
            .asInstanceOf[org.apache.spark.sql.types.StructType])
          .toOption.filter(_.fields.nonEmpty))
        val reader = spark.read.option("basePath", path)
        val df = declared.fold(reader)(reader.schema).parquet(files: _*)
        if (withDv.isEmpty) df
        else {
          requireNoCoordClash(df.columns, path)
          df.select(col("*"),
            normPathCol(col("_metadata.file_path")).as(DvFp),
            col("_metadata.row_index").as(DvPos))
        }
    }
    if (withDv.isEmpty) base
    else applyDeletionVectors(spark, path, withDv, base).drop(DvFp, DvPos)
  }

  /** Internal column names the deletion-vector anti-join introduces on
    * the scan; a table column with either name would be ambiguous. */
  private[sources] val DvFp = "__dv_fp"
  private[sources] val DvPos = "__dv_pos"

  private def normPathCol(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.regexp_replace(c, "^[a-zA-Z][a-zA-Z0-9+.-]*:/+", "/")

  /** A table column named like a coord column would make the DV
    * anti-join ambiguous — refuse before attaching the coordinates. */
  private def requireNoCoordClash(cols: Array[String], path: String): Unit = {
    val clash = cols.filter(c => c == DvFp || c == DvPos)
    require(clash.isEmpty,
      s"Delta table at $path has column(s) ${clash.mkString(", ")} — they " +
        "collide with the deletion-vector join's internal names " +
        s"($DvFp, $DvPos); rename them or compact the DVs away first")
  }

  /** Deletion-vector budget for the planner's broadcast decision: the
    * descriptors DECLARE total cardinality before any bitmap is read, so
    * the cutover is measured metadata, not a guess (the q230 pattern).
    * ~40 B per (path-ish, pos) row. */
  private val DvBroadcastBudgetBytes = 10L << 20

  /** Apply the active files' deletion vectors: decode each descriptor's
    * bitmap into (file, position) rows and LEFT-ANTI-join them against
    * the scan's own `_metadata` row coordinates (`row_index` IS the
    * 0-based parquet row position the protocol addresses — the same
    * mechanism as [[Iceberg]] merge-on-read position deletes).
    *
    * Sidecar bitmaps ('u'/'p' storage) are decoded ON EXECUTORS: the
    * `binaryFile` source distributes the .bin files, and a broadcast of
    * the (bin-file -> descriptors) map — planning metadata, bounded by
    * the ManifestGuard file cap — routes each file's bytes to its
    * slices. Nothing data-shaped transits the driver. Inline ('i')
    * bitmaps are by construction small enough that the writer chose to
    * embed them in the log; they decode driver-side under an explicit
    * cardinality budget with a named refusal.
    *
    * The anti-join broadcasts the delete side only when the descriptors'
    * summed `cardinality` fits [[DvBroadcastBudgetBytes]]; above that
    * the join stays a shuffle join (positions at that scale are
    * data-shaped). */
  private def applyDeletionVectors(spark: SparkSession, tableRoot: String,
                                   withDv: Seq[(String, String)],
                                   base: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.broadcast
    val descs = withDv.map { case (f, dvJson) =>
      (DeletionVectors.normalizePath(f),
        DeletionVectors.parseDescriptor(mapper.readTree(dvJson)))
    }
    val (inline, stored) = descs.partition(_._2.storageType == "i")
    val inlineCard = inline.map(_._2.cardinality).sum
    require(inlineCard <= (1L << 20),
      s"Delta table at $tableRoot inlines deletion vectors totalling " +
        s"$inlineCard positions in its LOG — far past any real writer's " +
        "inline threshold and this reader's driver budget (2^20); " +
        "rewrite them as sidecar files")
    val inlineDf = inline.flatMap { case (f, d) =>
      // inline payloads are z85 zero-PADDED to a 4-byte block;
      // sizeInBytes trims the pad back off
      val decoded = DeletionVectors.z85Decode(d.pathOrInlineDv)
      require(decoded.length >= d.sizeInBytes &&
        decoded.length - d.sizeInBytes < 4,
        s"inline DV for $f: ${decoded.length} decoded bytes vs declared " +
          s"sizeInBytes ${d.sizeInBytes} — not a padded z85 payload; refusing")
      val bytes = java.util.Arrays.copyOf(decoded, d.sizeInBytes)
      DeletionVectors.positions(bytes, d, f).toSeq.map(p => (f, p))
    }.toDF(DvFp, DvPos)
    val deleted =
      if (stored.isEmpty) inlineDf
      else {
        val byBin: Map[String, Seq[(String, DeletionVectors.Descriptor)]] =
          stored.groupBy { case (_, d) =>
            DeletionVectors.normalizePath(
              DeletionVectors.resolveFile(tableRoot, d).toString)
          }
        val bc = spark.sparkContext.broadcast(byBin)
        val binPaths = byBin.keys.toSeq.sorted
        val storedDf = spark.read.format("binaryFile").load(binPaths: _*)
          .select($"path", $"content").as[(String, Array[Byte])]
          .flatMap { case (binPath, bytes) =>
            val key = DeletionVectors.normalizePath(binPath)
            // we only loaded paths from the map — a miss means the path
            // spellings diverged, which would SILENTLY resurrect rows
            val slices = bc.value.getOrElse(key, throw new IllegalStateException(
              s"DV file $key loaded but no descriptor routes to it — " +
                "path-normalization drift; refusing"))
            slices.iterator.flatMap { case (dataFile, d) =>
              DeletionVectors
                .positions(DeletionVectors.sliceBlob(bytes, d, dataFile), d, dataFile)
                .iterator.map(p => (dataFile, p))
            }
          }.toDF(DvFp, DvPos)
        inlineDf.unionAll(storedDf)
      }
    val totalCard = descs.map(_._2.cardinality).sum
    val delSide =
      if (totalCard * 40 <= DvBroadcastBudgetBytes) broadcast(deleted) else deleted
    base.join(delSide, Seq(DvFp, DvPos), "left_anti")
  }

  /** COLUMN-MAPPED read (delta.columnMapping.mode `name` or `id`): the
    * parquet footers hold PHYSICAL names (`col-<uuid>`); the logical
    * schema lives in metaData's `schemaString`, each field tagged with
    * `delta.columnMapping.physicalName` + `delta.columnMapping.id`.
    * Name mode reads under the physical names and projects back to the
    * logical ones; id mode reuses the Iceberg reader's mechanism —
    * Spark's `parquet.field.id` resolution with the delta field id.
    * Refused with the limitation named: a partitioned mapped table (its
    * partition values live in `add.partitionValues`, which this reader
    * does not reconstruct into columns), nested logical columns, a field
    * missing its mapping metadata, or an unparseable schemaString —
    * serving physical `col-<uuid>` names instead would be a wrong
    * answer, not a degraded one. */
  private[sources] def readMapped(spark: SparkSession, tableRoot: String,
                         files: Seq[String], meta: JsonNode,
                         mode: String, withRowCoords: Boolean = false): DataFrame = {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.functions.col
    require(Option(meta.get("partitionColumns")).forall(_.size() == 0),
      s"Delta table at $tableRoot combines column mapping with partition " +
        "columns — their values live in add.partitionValues, which this " +
        "interpreter does not reconstruct; refusing")
    val schemaStr = Option(meta.get("schemaString")).map(_.asText()).getOrElse(
      throw new IllegalArgumentException(
        s"Delta table at $tableRoot uses column mapping mode '$mode' but " +
          "its metaData carries no schemaString — nothing maps the " +
          "physical footers back to logical names; refusing"))
    val logical =
      try DataType.fromJson(schemaStr).asInstanceOf[StructType]
      catch { case e: Exception => throw new IllegalArgumentException(
        s"Delta table at $tableRoot: column mapping mode '$mode' needs the " +
          s"metaData schemaString, which failed to parse (${e.getMessage})", e) }
    logical.fields.foreach { f =>
      require(f.dataType match {
        case _: StructType | _: ArrayType | _: MapType => false
        case _ => true
      }, s"Delta table at $tableRoot: nested logical column '${f.name}' " +
        "under column mapping is not interpreted — refusing")
    }
    if (withRowCoords) requireNoCoordClash(logical.fieldNames, tableRoot)
    // the DV coord columns must come off the SCAN itself (metadata
    // columns do not reliably re-resolve through projections), so each
    // mode appends them inside its own scan-level select
    val coordCols =
      if (withRowCoords) Seq(normPathCol(col("_metadata.file_path")).as(DvFp),
        col("_metadata.row_index").as(DvPos))
      else Seq.empty
    mode match {
      case "name" =>
        val pairs = logical.fields.map { f =>
          require(f.metadata.contains("delta.columnMapping.physicalName"),
            s"Delta table at $tableRoot: column '${f.name}' lacks " +
              "delta.columnMapping.physicalName in name mode — refusing")
          (f.name, f.metadata.getString("delta.columnMapping.physicalName"), f.dataType)
        }
        spark.read
          .schema(StructType(pairs.map(p => StructField(p._2, p._3, nullable = true))))
          .parquet(files: _*)
          .select(pairs.map(p => col(s"`${p._2}`").as(p._1)) ++ coordCols: _*)
      case "id" =>
        val st = StructType(logical.fields.map { f =>
          require(f.metadata.contains("delta.columnMapping.id"),
            s"Delta table at $tableRoot: column '${f.name}' lacks " +
              "delta.columnMapping.id in id mode — refusing")
          StructField(f.name, f.dataType, nullable = true,
            new MetadataBuilder()
              .putLong("parquet.field.id", f.metadata.getLong("delta.columnMapping.id"))
              .build())
        })
        // same session-scoped switch as the Iceberg field-id path — only
        // schemas CARRYING parquet.field.id metadata change behavior
        spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
        val df = spark.read.schema(st).parquet(files: _*)
        if (withRowCoords) df.select(col("*") +: coordCols: _*) else df
    }
  }
}
