package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Minimal WRITER for the public Delta Lake transaction-log format — the
  * other half of [[DeltaLogReader]]'s interop story. The reference persists
  * its tiles as a Delta table (`01_geofraud_clustering.py:431`); with the
  * reader the repo can consume a table someone else wrote with real Delta,
  * and with this writer its own outputs become tables a real Delta reader
  * can consume. Protocol subset produced (all public, delta-io
  * PROTOCOL.md, reader/writer version 1/2 — no advanced table features):
  *
  *  - data as immutable parquet parts at the table root (Spark's own
  *    UUID part names — collision-free across commits);
  *  - `_delta_log/%020d.json`, one action per line: `protocol` +
  *    `metaData` on create, `add` per new file, `remove` per displaced
  *    file on overwrite;
  *  - optional `%020d.checkpoint.parquet` (single-part) + the
  *    `_last_checkpoint` pointer via [[checkpoint]].
  *
  * Commits are atomic on the log side: the JSON is staged to a hidden
  * temp name and RENAMEd into place (rename is atomic on HDFS-like
  * filesystems), so a reader never observes a half-written commit — data
  * files written before the rename are invisible until the commit names
  * them, exactly Delta's own visibility rule. Concurrent writers are out
  * of scope (no optimistic-conflict retry loop): this is a single-writer
  * pipeline sink, and [[write]] fails loudly if the expected next version
  * already exists rather than clobbering someone else's commit.
  *
  * Scale: the log work is O(#files touched) driver-side JSON — the same
  * planning metadata every Delta writer emits; data files are written by
  * ordinary distributed parquet jobs. */
object DeltaLogWriter {

  private val mapper = new ObjectMapper()

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  private def writeAtomic(spark: SparkSession, target: Path, content: String,
                          overwrite: Boolean = false): Unit = {
    val f = fs(spark, target)
    val tmp = new Path(target.getParent, s".${target.getName}.tmp")
    val out = f.create(tmp, true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    // rename-to-existing fails on no-overwrite filesystems (HDFS): for a
    // COMMIT that failure is the concurrency backstop and must stand; for
    // the _last_checkpoint pointer (republished per checkpoint) the old
    // target is deleted first — losing it in the crash window is benign
    // (readers fall back to full JSON replay)
    if (overwrite && f.exists(target)) f.delete(target, false)
    require(f.rename(tmp, target),
      s"Delta commit rename failed (concurrent writer?): $target")
  }

  private def jsonStr(s: String): String = mapper.writeValueAsString(s)

  /** A column reference that survives names CONTAINING backticks
    * (escaped by doubling — the quoted-identifier rule; a raw
    * interpolation would throw a ParseException on such names). */
  private def dfCol(df: DataFrame, name: String): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.col(s"`${name.replace("`", "``")}`")

  /** Obligations a BLIND APPEND must enforce, not merely avoid breaking
    * — refused when the table declares them, because committing rows
    * without honoring them violates the table's contract for every
    * real-engine reader: CHECK constraints (`delta.constraints.*`
    * configuration), column invariants / generated / identity columns
    * (schema-field metadata), and any table-features writer feature
    * outside the set a plain add-file commit is allowed to ignore. */
  private def requireBlindAppendable(spark: SparkSession, path: String,
      meta: com.fasterxml.jackson.databind.JsonNode): Unit = {
    val constraintKeys = {
      val it = meta.path("configuration").fields()
      val b = Seq.newBuilder[String]
      while (it.hasNext) { val e = it.next()
        if (e.getKey.startsWith("delta.constraints.")) b += e.getKey }
      b.result()
    }
    require(constraintKeys.isEmpty,
      s"Delta table at $path declares CHECK constraint(s) " +
        s"${constraintKeys.mkString(", ")} — this writer does not evaluate " +
        "them; appending unchecked rows would violate the table's " +
        "contract; refusing")
    val schema = try org.apache.spark.sql.types.DataType
      .fromJson(meta.path("schemaString").asText(""))
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    catch { case _: Exception => org.apache.spark.sql.types.StructType(Nil) }
    val bound = schema.fields.flatMap { fd =>
      Seq("delta.invariants", "delta.generationExpression",
        "delta.identity.start")
        .collectFirst { case k if fd.metadata.contains(k) => s"${fd.name} ($k)" }
    }
    require(bound.isEmpty,
      s"Delta table at $path binds column obligation(s) " +
        s"${bound.mkString(", ")} — this writer does not evaluate " +
        "invariants/generated/identity expressions; refusing")
    // table-features protocols: a blind add-file commit may ignore
    // exactly these (enforcement either gated above, read-side, or
    // nonexistent); an unknown writer feature may oblige every commit
    val ignorable = Set("appendOnly", "invariants", "checkConstraints",
      "changeDataFeed", "generatedColumns", "columnMapping",
      "identityColumns", "deletionVectors", "timestampNtz",
      "vacuumProtocolCheck", "inCommitTimestamp")
    latestProtocolNode(spark, path).foreach { p =>
      if (p.path("minWriterVersion").asInt(2) >= 7) {
        val wf = Option(p.get("writerFeatures")).toSeq
          .flatMap(a => (0 until a.size()).map(i => a.get(i).asText()))
        val unknown = wf.filterNot(ignorable)
        require(unknown.isEmpty,
          s"Delta table at $path requires writer feature(s) " +
            s"${unknown.mkString(", ")} this writer does not implement — " +
            "a commit ignoring them may violate the table's contract; " +
            "refusing")
      }
    }
  }

  /** Name-and-type schema equality; NULLABILITY widened (a SQL-planned
    * insert frame arrives nullable-wide) and column METADATA ignored (a
    * frame sourced from an Iceberg read carries `parquet.field.id` the
    * publish strips anyway) — so callers must gate column-mapped tables
    * SEPARATELY: their mapping lives in exactly the metadata this
    * compare discards. */
  private def sameShape(schemaString: String,
                        actual: org.apache.spark.sql.types.StructType): Boolean = {
    def widen(st: org.apache.spark.sql.types.StructType) =
      org.apache.spark.sql.types.StructType(st.fields.map(f =>
        org.apache.spark.sql.types.StructField(f.name, f.dataType,
          nullable = true)))
    try widen(org.apache.spark.sql.types.DataType.fromJson(schemaString)
      .asInstanceOf[org.apache.spark.sql.types.StructType]) == widen(actual)
    catch { case _: Exception => false }
  }

  /** Percent-encode a root-relative path for a `path` field (the
    * protocol's spelling). The URI constructor quotes everything a path
    * component may not carry raw — including '%', so decode∘encode is the
    * identity on any input path. */
  private def encodePath(rel: String): String =
    new java.net.URI(null, null, rel, null).getRawPath

  /** Write `df` into the Delta table at `path` and commit.
    *
    * `Overwrite` deactivates every previously-active file (remove actions)
    * and activates the new ones; `Append` only adds. Creating a new table
    * (no `_delta_log` yet) emits the `protocol` + `metaData` lines first.
    * @return the committed log version */
  def write(df: DataFrame, path: String, mode: SaveMode = SaveMode.Append,
            partitionBy: Seq[String] = Nil): Long = {
    require(mode == SaveMode.Append || mode == SaveMode.Overwrite,
      s"DeltaLogWriter supports Append and Overwrite, not $mode")
    val spark = df.sparkSession
    val root = new Path(path)
    val f = fs(spark, root)
    // next version from commits OR the checkpoint pointer — after
    // checkpoint-based truncation the JSON listing alone under-reports,
    // and re-using a pre-checkpoint version number would be silently
    // ignored by every reader
    val latest = DeltaLogReader.latestVersion(spark, path)
    val creating = latest.isEmpty
    val version = latest.map(_ + 1).getOrElse(0L)
    val prevActive: Seq[String] =
      if (creating || mode == SaveMode.Append) Seq.empty
      else DeltaLogReader.activeFiles(spark, path)

    // fail-fast on the obvious race before any data moves; the atomic
    // commit rename below remains the real backstop
    val commit = new Path(new Path(root, "_delta_log"), f"$version%020d.json")
    require(!f.exists(commit),
      s"Delta commit v$version already exists at $path — concurrent writer, refusing to clobber")

    // column-mapped tables: the parquet must carry PHYSICAL names (a
    // logical-named file would orphan after a rename) — project the
    // frame through the metaData's physicalName map before publishing.
    // Name mode only: id-mode appends would need field-id stamping this
    // writer does not do; refuse rather than write unresolvable files.
    val toWrite: DataFrame =
      if (creating) df
      else DeltaLogReader.replayState(spark, path, None)._2 match {
        case Some(m) if DeltaLogReader.mappingMode(m) != "none" =>
          val mode = DeltaLogReader.mappingMode(m)
          require(mode == "name",
            s"Delta table at $path uses columnMapping mode '$mode' — " +
              "this writer appends to name-mapped tables only")
          val schema = org.apache.spark.sql.types.DataType
            .fromJson(m.get("schemaString").asText())
            .asInstanceOf[org.apache.spark.sql.types.StructType]
          require(df.columns.toSeq == schema.fieldNames.toSeq,
            s"append schema ${df.columns.mkString("(", ", ", ")")} does " +
              s"not match $path's logical schema " +
              s"${schema.fieldNames.mkString("(", ", ", ")")}")
          df.toDF(schema.fields.map(fld =>
            fld.metadata.getString("delta.columnMapping.physicalName")): _*)
        case _ => df
      }
    val newFiles = publishParts(spark, root, toWrite, version, partitionBy)
    require(newFiles.nonEmpty || df.isEmpty,
      s"Delta write at $path produced no new parquet parts")

    val now = System.currentTimeMillis()
    val partCols = partitionBy.map(jsonStr).mkString("[", ",", "]")
    val header: Seq[String] =
      if (!creating) Seq.empty
      else Seq(
        """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
        s"""{"metaData":{"id":${jsonStr(java.util.UUID.nameUUIDFromBytes(
            path.getBytes("UTF-8")).toString)},""" +
          s""""format":{"provider":"parquet","options":{}},""" +
          s""""schemaString":${jsonStr(df.schema.json)},""" +
          s""""partitionColumns":$partCols,"configuration":{},"createdTime":$now}}""")
    // remove paths: re-relativize whatever the reader resolved (it returns
    // absolute paths; the protocol stores root-relative percent-encoded
    // ones — encodePath, so a '%' or '+' in a file name round-trips)
    val rootUri = root.toUri.getPath.stripSuffix("/")
    val removes = prevActive.map { abs =>
      val rel = new Path(abs).toUri.getPath.stripPrefix(rootUri).stripPrefix("/")
      s"""{"remove":{"path":${jsonStr(encodePath(rel))},"deletionTimestamp":$now,"dataChange":true}}"""
    }
    // partitionValues parsed back from the hive path segments (k=v dirs),
    // percent-decoded like every Delta writer records them (URI decoding,
    // not form decoding — '+' in a value is a literal plus)
    val adds = newFiles.map { rel =>
      val st = f.getFileStatus(new Path(root, rel))
      val pv = partitionValuesJson(rel)
      s"""{"add":{"path":${jsonStr(encodePath(rel))},"partitionValues":$pv,""" +
        s""""size":${st.getLen},"modificationTime":${st.getModificationTime},""" +
        s""""dataChange":true}}"""
    }
    // re-check right before publishing (local-FS rename overwrites, so the
    // existence require carries the no-clobber guarantee there; on HDFS
    // the rename itself is the backstop)
    require(!f.exists(commit),
      s"Delta commit v$version already exists at $path — concurrent writer, refusing to clobber")
    f.mkdirs(commit.getParent)
    writeAtomic(spark, commit, (header ++ removes ++ adds).mkString("", "\n", "\n"))
    version
  }

  /** Data files for one commit: the parquet job writes into a hidden
    * per-commit STAGING dir (readers skip dot-dirs), whose listing is
    * O(#files written); each part then moves (driver rename,
    * metadata-only) to its final root-relative place, hive k=v segments
    * preserved. The old spelling — list the whole table before and
    * after and diff — was two O(#table-files) walks per commit; Delta
    * itself never lists the table to commit. Paths are RELATIVE to the
    * table root. The staging name carries a unique attempt id: two
    * writers racing on the same next version must not share (or
    * recursively delete) each other's in-flight staging — the loser's
    * published-but-never-referenced parts are harmless orphans, exactly
    * Delta's own failed-commit debris, reclaimed by [[vacuum]]. */
  /** Test seam for the optimistic-commit specs: invoked once per
    * [[commitLoop]] attempt, BEFORE the attempt checks the target
    * version — a spec installs a "winning writer" here to force a
    * deterministic race without real thread interleaving. */
  private[sources] var beforeCommitHook: () => Unit = () => ()

  /** The OPTIMISTIC-CONCURRENCY commit loop — the conflict-detect-and-
    * retry protocol two uncoordinated writers need (Delta's commit
    * protocol: writers propose version N; the loser re-reads the
    * WINNING commits, checks them against its own assumptions, and
    * re-proposes at N+1). `conflict` inspects each winning commit's
    * parsed action lines and returns the refusal reason when the race
    * CANNOT be serialized (a true conflict — e.g. the winner rewrote a
    * file this commit also rewrites, or drifted the schema under a
    * staged append); `None` means the winner is disjoint and the
    * commit re-proposes unchanged. `lines(version, creating)`
    * re-derives the action lines per attempt so creation headers land
    * only when the table is still being created. The commit itself
    * stays the atomic-rename publish every other path uses — on HDFS
    * the rename IS the arbiter; on local filesystems the pre-check plus
    * rename backstop covers the serialized-thread testing this repo
    * runs (a real multi-process deployment wants a locking LogStore,
    * the same caveat Delta's own S3 single-driver story carries). */
  private[sources] def commitLoop(spark: SparkSession, path: String,
      observedVersion: Option[Long], maxRetries: Int,
      conflict: Seq[com.fasterxml.jackson.databind.JsonNode] => Option[String])
      (lines: (Long, Boolean) => Seq[String]): Long = {
    val f = fs(spark, new Path(path))
    var attempt = 0
    // winners scanned so far: everything ≤ observedVersion was part of
    // the state this commit derives from, so only LATER commits race it
    var checkedThrough = observedVersion
    while (attempt <= maxRetries) {
      beforeCommitHook()
      val latest = DeltaLogReader.latestVersion(spark, path)
      val from = checkedThrough.map(_ + 1).getOrElse(0L)
      (from to latest.getOrElse(-1L)).foreach { v =>
        val nodes = DeltaLogReader
          .readSmallFile(spark, new Path(logDir(spark, path), f"$v%020d.json"))
          .split("\n").filter(_.nonEmpty).map(mapper.readTree).toSeq
        conflict(nodes).foreach(reason =>
          throw new java.util.ConcurrentModificationException(
            s"concurrent Delta commit v$v at $path is a true conflict — " +
              s"$reason; re-derive against the new state instead of retrying"))
      }
      checkedThrough = latest
      val version = latest.map(_ + 1).getOrElse(0L)
      val commit = new Path(logDir(spark, path), f"$version%020d.json")
      if (!f.exists(commit)) {
        f.mkdirs(commit.getParent)
        try {
          writeAtomic(spark, commit,
            lines(version, latest.isEmpty).mkString("", "\n", "\n"))
          return version
        } catch {
          // the rename backstop fired: someone landed v$version between
          // our exists-check and the publish — scan them and re-propose
          case e: IllegalArgumentException
            if e.getMessage != null && e.getMessage.contains("rename") => ()
        }
      }
      attempt += 1
    }
    throw new java.util.ConcurrentModificationException(
      s"lost the Delta commit race $maxRetries times at $path — giving up " +
        "(a writer storm this dense needs a coordinating catalog)")
  }

  /** OPTIMISTIC APPEND — [[write]]'s Append mode under the
    * [[commitLoop]] protocol: data parts are staged ONCE, then the
    * commit re-proposes past any winners. A blind append serializes
    * after ANY data-only winner (WriteSerializable — concurrent adds,
    * removes and DV rewrites touch files this append never read), so
    * the only true conflicts are a `metaData` drift (schema or
    * partition columns changed under the staged parts — the parquet we
    * already wrote may no longer match the table) and a `protocol`
    * action (feature gates unknown at staging time). Both racing
    * creators landing is also legal: the loser keeps its parts and
    * appends them to the winner's table iff the schemas agree. */
  def appendOptimistic(df: DataFrame, path: String,
                       partitionBy: Seq[String] = Nil,
                       maxRetries: Int = 10): Long = {
    val spark = df.sparkSession
    val root = new Path(path)
    val f = fs(spark, root)
    val observed = DeltaLogReader.latestVersion(spark, path)
    // the conflict check below only sees commits that land DURING the
    // race — the EXISTING metaData must be validated here, or a
    // drifted append would commit silently whenever nobody races it
    var observedSchemaString: Option[String] = None
    var toStage: DataFrame = df
    observed.foreach { _ =>
      val meta = DeltaLogReader.replayState(spark, path, None)._2
        .getOrElse(throw new IllegalArgumentException(
          s"Delta log at $path carries no metaData action — cannot " +
            "validate the append schema; refusing"))
      // a FOREIGN table may declare obligations a blind append must
      // ENFORCE, not merely not-break — refuse what this writer cannot
      // honor rather than committing rows that violate the contract
      requireBlindAppendable(spark, path, meta)
      // mapped tables append through write() (the physical-name
      // projection); sameShape ignores metadata so it cannot catch this
      require(DeltaLogReader.mappingMode(meta) == "none",
        s"Delta table at $path uses column mapping — appendOptimistic " +
          "does not project physical names; append through write()")
      // names + types must match exactly; NULLABILITY compares widened —
      // a SQL-planned insert frame arrives nullable-wide even when its
      // rows can't be null (the runtime guard below covers actual
      // nulls), and refusing on the flag alone would block every
      // INSERT INTO while catching no real drift
      require(sameShape(meta.path("schemaString").asText(), df.schema),
        s"append schema drifts from $path's metaData schema — " +
          "schema evolution is a separate operation (table: " +
          s"${meta.path("schemaString").asText()}; batch: ${df.schema.json})")
      observedSchemaString = Some(meta.path("schemaString").asText())
      val tableParts = (0 until meta.path("partitionColumns").size())
        .map(meta.path("partitionColumns").get(_).asText())
      require(tableParts == partitionBy,
        s"partitionBy ${partitionBy.mkString("(", ", ", ")")} contradicts " +
          s"$path's partition columns ${tableParts.mkString("(", ", ", ")")}")
      // NOT-NULL enforcement lives HERE, next to the widened compare it
      // compensates: a declared non-nullable column fed from a
      // nullable-wide frame gets a per-row raise_error guard, so nulls
      // refuse at write time instead of landing under a schema that
      // promises they can't exist
      val declared = org.apache.spark.sql.types.DataType
        .fromJson(meta.path("schemaString").asText())
        .asInstanceOf[org.apache.spark.sql.types.StructType]
      val needGuard = declared.fields.exists(fd =>
        !fd.nullable && df.schema(fd.name).nullable)
      if (needGuard) {
        import org.apache.spark.sql.functions.{lit, raise_error, when}
        toStage = df.select(declared.fields.map { fd =>
          val c = dfCol(df, fd.name)
          (if (fd.nullable || !df.schema(fd.name).nullable) c
           else when(c.isNull, raise_error(lit(
             s"NOT NULL constraint violated: column ${fd.name} of $path")))
             .otherwise(c)).as(fd.name)
        }.toSeq: _*)
      }
    }
    val newFiles = publishParts(spark, root, toStage,
      observed.map(_ + 1).getOrElse(0L), partitionBy)
    require(newFiles.nonEmpty || df.isEmpty,
      s"Delta write at $path produced no new parquet parts")
    val now = System.currentTimeMillis()
    val schemaJson = df.schema.json
    val partCols = partitionBy.map(jsonStr).mkString("[", ",", "]")
    val adds = newFiles.map { rel =>
      val st = f.getFileStatus(new Path(root, rel))
      s"""{"add":{"path":${jsonStr(encodePath(rel))},"partitionValues":${partitionValuesJson(rel)},""" +
        s""""size":${st.getLen},"modificationTime":${st.getModificationTime},""" +
        s""""dataChange":true}}"""
    }
    val header = Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      s"""{"metaData":{"id":${jsonStr(java.util.UUID.nameUUIDFromBytes(
          path.getBytes("UTF-8")).toString)},""" +
        s""""format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":${jsonStr(schemaJson)},""" +
        s""""partitionColumns":$partCols,"configuration":{},"createdTime":$now}}""")
    commitLoop(spark, path, observed, maxRetries, nodes =>
      nodes.collectFirst {
        // ANY schema text change by a winner is a conflict against an
        // EXISTING table (conservative: even a nullability tightening
        // invalidates the staged parquet's guard assumptions); a racing
        // CREATOR is checked shape-wise against the staged frame
        case n if n.has("metaData") && observedSchemaString.exists(
            _ != n.get("metaData").path("schemaString").asText()) =>
          "metaData changed the schema under this staged append"
        case n if n.has("metaData") && observedSchemaString.isEmpty &&
            !sameShape(n.get("metaData").path("schemaString").asText(), df.schema) =>
          "metaData changed the schema under this staged append"
        case n if n.has("metaData") &&
            n.get("metaData").path("partitionColumns").toString !=
              partitionBy.map(jsonStr).mkString("[", ",", "]") =>
          "metaData changed the partition columns under this staged append"
        // the base protocol this writer itself emits is benign (a racing
        // CREATOR always carries it); anything stronger gates features
        // this append did not check at staging time
        case n if n.has("protocol") &&
            !(n.get("protocol").path("minReaderVersion").asInt(0) == 1 &&
              n.get("protocol").path("minWriterVersion").asInt(0) == 2 &&
              !n.get("protocol").has("readerFeatures")) =>
          "a protocol upgrade landed under this staged append"
      }) { (_, creating) =>
      (if (creating) header else Seq.empty) ++ adds
    }
  }

  private def publishParts(spark: SparkSession, root: Path, df0: DataFrame,
                           version: Long, partitionBy: Seq[String]): Seq[String] = {
    // a frame sourced from an Iceberg read carries `parquet.field.id`
    // column metadata; letting it stamp ids into THIS table's parquet
    // (under the session-wide fieldId.write switch) creates a mixed
    // id/id-less file set whose footer-schema reads then fail loudly.
    // The strip is UNCONDITIONAL with EXPLICIT empty metadata: the
    // analyzed schema can hide metadata an optimizer rewrite resurfaces
    // (SimplifyCasts collapses a no-op cast back onto the id-carrying
    // attribute), so detection on df0.schema is unreliable — only an
    // explicit Alias metadata survives every rewrite. Delta parquet
    // carries no foreign field ids, ever.
    val df = df0.select(df0.schema.fields.map(fld =>
      dfCol(df0, fld.name)
        .as(fld.name, org.apache.spark.sql.types.Metadata.empty)).toSeq: _*)
    val f = fs(spark, root)
    val staging = new Path(root,
      s".staging_v${version}_${java.util.UUID.randomUUID().toString.take(8)}")
    f.delete(staging, true)
    val writer = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
      .parquet(staging.toString)
    val staged = scala.collection.mutable.ArrayBuffer.empty[String]
    def walk(p: Path, rel: String): Unit = f.listStatus(p).foreach { st =>
      val n = st.getPath.getName
      val childRel = if (rel.isEmpty) n else s"$rel/$n"
      if (st.isDirectory) { if (!n.startsWith("_") && !n.startsWith(".")) walk(st.getPath, childRel) }
      else if (n.endsWith(".parquet")) staged += childRel
    }
    walk(staging, "")
    require(staged.size <= graft.operators.ManifestGuard.MaxPlannedFiles,
      s"Delta write at $root produced ${staged.size} parts in one commit — " +
        "past the planning cap; repartition coarser before writing")
    val newFiles = staged.sorted.map { rel =>
      val dst = new Path(root, rel)
      f.mkdirs(dst.getParent)
      // UUID part names never collide with prior commits' files
      require(f.rename(new Path(staging, rel), dst),
        s"failed to publish staged part $rel at $root")
      rel
    }.toSeq
    f.delete(staging, true)
    newFiles
  }

  /** OPTIMIZE — bin-packing compaction as a `dataChange=false` commit:
    * read the CURRENT logical state (deletion vectors applied), rewrite
    * it as files sized toward `targetFileBytes`, and commit remove
    * actions for every old active file plus add actions for the new
    * ones, all flagged `dataChange=false` — the protocol's signal that
    * the commit rearranged bytes without changing rows (streaming
    * sources skip it). DVs are PURGED: the rewrite materializes the
    * surviving rows, so the table afterwards passes the DV-blind
    * `activeFiles` gate again (checkpoints, appends). The superseded
    * files stay on disk for time travel until [[vacuum]]. Refuses
    * column-mapped tables (rewriting would sever the logical→physical
    * name mapping). Partitioned tables re-bin WITHIN partitions — the
    * rewrite shuffles on the partition columns and republishes through
    * the hive layout, so partition pruning survives (one file per
    * partition value when `numFiles` covers the value count — the
    * classic small-files compaction). With `clusterBy`, the rewrite range-partitions
    * and sorts on those columns (`OPTIMIZE ... ZORDER BY` when the
    * caller passes the Morton key, plain clustering otherwise — the
    * SnapshotLog.optimize pattern): clustered files carry tight
    * disjoint row-group stats on the key, so parquet predicate
    * pushdown skips whole files at scan time. `numFiles` pins the
    * output count when the caller needs it deterministic.
    *
    * `optimistic = true` commits under the [[commitLoop]] protocol: a
    * winner that only ADDED files is disjoint (its rows stay alongside
    * — this rewrite replaces exactly the files it read) and the commit
    * re-proposes at N+1; a winner that touched ANY file this rewrite
    * read (a remove, or a DV re-add) is a TRUE conflict — the staged
    * output folded rows the winner since killed or moved — and refuses
    * with ConcurrentModificationException so the caller re-derives. */
  def optimize(spark: SparkSession, path: String,
               targetFileBytes: Long = 128L << 20,
               clusterBy: Seq[org.apache.spark.sql.Column] = Nil,
               numFiles: Option[Int] = None,
               optimistic: Boolean = false,
               maxRetries: Int = 10,
               partitionFilter: Seq[graft.plans.ScopeTerm] = Nil): Long = {
    require(targetFileBytes > 0, s"targetFileBytes must be positive, got $targetFileBytes")
    val root = new Path(path)
    val f = fs(spark, root)
    val (allEntries, meta) = DeltaLogReader.replayState(spark, path, None)
    require(allEntries.nonEmpty, s"Delta table at $path has no active files — nothing to optimize")
    val metaNode = meta.getOrElse(throw new IllegalArgumentException(
      s"Delta log at $path carries no metaData action — cannot verify " +
        "partitioning or column mapping; refusing a blind rewrite"))
    require(DeltaLogReader.mappingMode(metaNode) == "none",
      s"Delta table at $path uses column mapping — rewriting its files " +
        "would sever the logical-to-physical name mapping; refusing")
    val partCols: Seq[String] = {
      val pc = metaNode.path("partitionColumns")
      (0 until pc.size()).map(pc.get(_).asText())
    }
    // partition-scoped rewrite (`OPTIMIZE t WHERE day = X`, `WHERE day >=
    // lo AND day < hi`): the rewrite set narrows to the files of the
    // MATCHED partitions — untouched partitions keep their files active
    // verbatim (the remove list below derives from `entries`). Only
    // comparisons on declared partition columns can scope a rewrite to
    // whole files, so anything else refused upstream at the parser.
    // Canonicalize each term's column to the table's own spelling
    // (case-insensitive, like ZORDER BY's resolution) and re-validate the
    // per-column shape THERE: `Day >= '1' AND day < '3'` is one column's
    // legal range, `Day = '1' AND day = '2'` a contradiction the parser's
    // case-sensitive check cannot see.
    val canonTerms: Seq[graft.plans.ScopeTerm] = partitionFilter.map { t =>
      val c = partCols.find(_.equalsIgnoreCase(t.col)).getOrElse(
        throw new IllegalArgumentException(
          s"OPTIMIZE WHERE names '${t.col}', not a partition column of " +
            s"$path " + partCols.mkString("(", ", ", ")")))
      t.copy(col = c)
    }
    graft.plans.ScopeTerm.validateShape(canonTerms, identity)
    // the scoped rewrite selects FILES by hive path value but rewrites
    // ROWS by a typed column predicate — those two selections must be
    // provably the same set. A null partition (the
    // __HIVE_DEFAULT_PARTITION__ path sentinel) breaks that: the path
    // could match while the column predicate selects no null rows,
    // silently dropping the partition — so a sentinel literal refuses
    // and sentinel path values never match a scope. And a file whose
    // path lacks the hive k=v segments (a foreign writer's layout)
    // inverts it: never file-selected, yet its rows pass the column
    // predicate and get duplicated into the rewrite — refuse that layout.
    val rootNorm = normRoot(f, root)
    // per-term comparison type from the table's OWN schema (string /
    // date / integer-family), and the typed literal it implies
    val typedTerms: Seq[(graft.plans.ScopeTerm, String, Any)] =
      canonTerms.map { t =>
        require(t.value != "__HIVE_DEFAULT_PARTITION__",
          s"OPTIMIZE WHERE ${t.col}: a null-partition scope is not " +
            "expressible as a column predicate — OPTIMIZE the full " +
            s"table at $path instead")
        val typ = scopeTyp(path, metaNode, t.col)
        (t, typ, graft.plans.ScopeTerm.typedValue(typ, t.col, t.value))
      }
    if (canonTerms.nonEmpty) {
      val nonHive = allEntries.map { case (abs, _) =>
        normAbs(f, abs).stripPrefix(rootNorm).stripPrefix("/")
      }.find(rel => !partCols.forall(partitionValuesOf(rel).contains))
      require(nonHive.isEmpty,
        s"Delta table at $path has an active file whose path does not " +
          s"carry hive segments for all partition columns " +
          partCols.mkString("(", ", ", ")") +
          s" (first: ${nonHive.getOrElse("")}) — a partition-scoped " +
          "OPTIMIZE selects files by path value, so a foreign layout " +
          "would duplicate that file's rows; OPTIMIZE the full table")
    }
    val entries =
      if (canonTerms.isEmpty) allEntries
      else allEntries.filter { case (abs, _) =>
        val rel = normAbs(f, abs).stripPrefix(rootNorm).stripPrefix("/")
        val pv = partitionValuesOf(rel)
        typedTerms.forall { case (t, typ, lit) =>
          pv.get(t.col).flatMap(parsePartValue(typ, _))
            .exists(graft.plans.ScopeTerm.satisfies(t.op, _, lit))
        }
      }
    require(entries.nonEmpty,
      s"OPTIMIZE at $path: no active files in the scoped partitions " +
        canonTerms.mkString("(", " AND ", ")"))

    val latest = DeltaLogReader.latestVersion(spark, path).get
    val version = latest + 1
    val commit = new Path(new Path(root, "_delta_log"), f"$version%020d.json")

    // the remove actions below re-relativize active paths against the
    // table root (rootNorm above); an add that lives OUTSIDE it
    // (shallow-clone layouts) would re-relativize to a WRONG path, leave
    // the old add active and permanently double the rows — refuse
    // instead. The comparison keeps scheme/authority as the leading path
    // segment (normalizePath, the dvAttachActions spelling): a same-path
    // file in a DIFFERENT bucket must count as outside, and a relative
    // table path must qualify to the same spelling the entries carry
    val outside = entries.map(_._1)
      .filterNot(abs => normAbs(f, abs).startsWith(rootNorm + "/"))
    require(outside.isEmpty,
      s"Delta table at $path references active files OUTSIDE the table " +
        s"root (first: ${outside.headOption.getOrElse("")}) — optimize " +
        "only rewrites self-contained tables; clone the data in first")

    numFiles.foreach(n => require(n > 0, s"numFiles must be positive, got $n"))
    val liveBytes = entries.map { case (abs, _) =>
      f.getFileStatus(new Path(abs)).getLen
    }.sum
    val numOut = numFiles.getOrElse(
      math.max(1L, (liveBytes + targetFileBytes - 1) / targetFileBytes).toInt)
    import org.apache.spark.sql.functions.{col => colOf}
    // the logical rows of exactly the files being rewritten: partition
    // comparisons select whole files, so this matches `entries`
    // row-for-row (typed predicate — same parse as the path-value match)
    val logical = typedTerms.foldLeft(DeltaLogReader.read(spark, path)) {
      case (df, (t, typ, lit)) => df.filter(scopePredicate(t, typ, lit))
    }
    // PARTITIONED tables re-bin WITHIN partitions: shuffle on the
    // partition columns (each value lands whole in one task — the
    // classic one-file-per-partition compaction), then the hive
    // partitionBy write keeps the layout so pruning survives; the
    // pre-sort on (partCols ++ clusterBy) satisfies the file writer's
    // required ordering, so no second sort destroys the clustering
    val reshaped =
      if (partCols.nonEmpty)
        logical.repartition(numOut, partCols.map(colOf): _*)
          .sortWithinPartitions((partCols.map(colOf) ++ clusterBy): _*)
      else if (clusterBy.isEmpty) logical.repartition(numOut)
      else logical.repartitionByRange(numOut, clusterBy: _*)
        .sortWithinPartitions(clusterBy: _*)
    val newFiles = publishParts(spark, root, reshaped, version, partCols)
    require(newFiles.nonEmpty,
      s"optimize at $path produced no parquet parts")

    val now = System.currentTimeMillis()
    val removes = entries.map { case (abs, _) =>
      val rel = normAbs(f, abs).stripPrefix(rootNorm).stripPrefix("/")
      s"""{"remove":{"path":${jsonStr(encodePath(rel))},"deletionTimestamp":$now,"dataChange":false}}"""
    }
    val adds = newFiles.map { rel =>
      val st = f.getFileStatus(new Path(root, rel))
      s"""{"add":{"path":${jsonStr(encodePath(rel))},"partitionValues":${partitionValuesJson(rel)},""" +
        s""""size":${st.getLen},"modificationTime":${st.getModificationTime},""" +
        s""""dataChange":false}}"""
    }
    if (optimistic) {
      // disjoint-file-set check over every winning commit: the rewrite
      // replaces exactly the files it READ, so any winner touching one
      // of them (remove, or add that re-publishes it with a DV) makes
      // the staged output stale — a true conflict; add-only winners
      // serialize cleanly after this commit's removes
      val readSet = entries.map { case (abs, _) => normAbs(f, abs) }.toSet
      commitLoop(spark, path, Some(latest), maxRetries, nodes =>
        nodes.flatMap { n =>
          // a metaData/protocol winner invalidates the staged rewrite
          // wholesale: the parquet was written under the OLD schema/
          // mapping/feature assumptions (the appendOptimistic rule)
          if (n.has("metaData") || n.has("protocol"))
            Some("it changed metaData/protocol under this staged rewrite")
          else {
            val touched = Seq("remove", "add").flatMap(k =>
              Option(n.get(k)).map(a => DeltaLogReader
                .decodePath(path, a.get("path").asText())))
            touched.collectFirst {
              case p if readSet(normAbs(f, p)) =>
                s"it rewrote/removed $p, a file this OPTIMIZE already read"
            }
          }
        }.headOption) { (_, _) => removes ++ adds }
    } else {
      // adjacent-to-write existence check; writeAtomic's rename is the
      // real backstop on no-overwrite filesystems
      require(!f.exists(commit),
        s"Delta commit v$version already exists at $path — concurrent writer, refusing to clobber")
      writeAtomic(spark, commit, (removes ++ adds).mkString("", "\n", "\n"))
      version
    }
  }

  /** VACUUM — physically delete files the CURRENT version no longer
    * references and whose tombstone (`remove.deletionTimestamp`, or the
    * file's own mtime for never-referenced orphans such as crashed
    * writers' staging debris) is older than `olderThanMs`. Keeps every
    * active file AND every deletion-vector sidecar an active add still
    * references; never touches `_delta_log` or other `_`-prefixed
    * paths. After a vacuum, time travel to versions that needed the
    * deleted files fails — that is vacuum's contract, the reason
    * retention exists; the current version is untouched. Driver-side
    * walk, [[graft.operators.ManifestGuard]]-capped. Returns the number
    * of files deleted. */
  def vacuum(spark: SparkSession, path: String, olderThanMs: Long): Int = {
    val root = new Path(path)
    val f = fs(spark, root)
    val (entries, _) = DeltaLogReader.replayState(spark, path, None)
    // qualify BEFORE normalizing: with a relative table path the sweep's
    // listStatus returns qualified paths while the log replay returns
    // table-rooted ones — unqualified keys would never match and vacuum
    // would eat every live file. Normalization is the repo-wide
    // AUTHORITY-PRESERVING spelling (DeletionVectors.normalizePath —
    // bucket/authority stays as the leading segment), so same-named
    // paths in different buckets can never alias between the keep set
    // and the sweep.
    def norm(p: Path): String =
      DeletionVectors.normalizePath(f.makeQualified(p).toString)
    val keep = scala.collection.mutable.Set.empty[String]
    entries.foreach { case (abs, dvOpt) =>
      keep += norm(new Path(abs))
      dvOpt.foreach { dvJson =>
        val d = DeletionVectors.parseDescriptor(mapper.readTree(dvJson))
        if (d.storageType != "i") // inline DVs live in the descriptor itself
          keep += norm(DeletionVectors.resolveFile(path, d))
      }
    }
    // tombstones from the surviving commit JSONs: path → last recorded
    // deletionTimestamp (a truncated commit's tombstones fall back to
    // file mtime below — sound either way, both are "when it died")
    val tombstones = scala.collection.mutable.Map.empty[String, Long]
    DeltaLogReader.versions(spark, path).foreach { v =>
      val commit = new Path(new Path(root, "_delta_log"), f"$v%020d.json")
      DeltaLogReader.readSmallFile(spark, commit).split("\n")
        .filter(_.nonEmpty).foreach { line =>
          val node = mapper.readTree(line)
          if (node.has("remove")) {
            val r = node.get("remove")
            val abs = DeltaLogReader.decodePath(path, r.get("path").asText())
            tombstones(norm(new Path(abs))) =
              r.path("deletionTimestamp").asLong(0L)
          }
        }
    }
    var deleted = 0
    var walked = 0
    def sweep(dir: Path): Unit = f.listStatus(dir).foreach { st =>
      val n = st.getPath.getName
      if (st.isDirectory) { if (!n.startsWith("_")) sweep(st.getPath) }
      else if (!n.startsWith("_")) {
        walked += 1
        require(walked <= graft.operators.ManifestGuard.MaxPlannedFiles,
          s"vacuum at $path would walk more than " +
            s"${graft.operators.ManifestGuard.MaxPlannedFiles} files on " +
            "the driver — compact to coarser files first")
        val key = norm(st.getPath)
        if (!keep.contains(key)) {
          val diedAt = tombstones.getOrElse(key, st.getModificationTime)
          if (diedAt < olderThanMs) {
            if (f.delete(st.getPath, false)) deleted += 1
          }
        }
      }
    }
    sweep(root)
    deleted
  }

  /** Comparison type of a partition column for an OPTIMIZE WHERE scope,
    * from the table's own metaData schemaString: `string`, `date`, or
    * `long` (integer family). Anything else refuses by name — the scope
    * must compare hive path values, column values and literals under ONE
    * typed order or file and row selection could disagree. */
  private def scopeTyp(path: String,
                       metaNode: com.fasterxml.jackson.databind.JsonNode,
                       c: String): String = {
    import org.apache.spark.sql.types._
    val schemaStr = Option(metaNode.get("schemaString")).map(_.asText())
      .getOrElse(throw new IllegalArgumentException(
        s"Delta table at $path carries no schemaString — cannot type the " +
          "OPTIMIZE WHERE scope"))
    val struct =
      try DataType.fromJson(schemaStr).asInstanceOf[StructType]
      catch { case e: Exception => throw new IllegalArgumentException(
        s"Delta table at $path: schemaString failed to parse " +
          s"(${e.getMessage})", e) }
    val field = struct.fields.find(_.name.equalsIgnoreCase(c)).getOrElse(
      throw new IllegalArgumentException(
        s"Delta table at $path: partition column '$c' is not in the " +
          "schemaString — corrupt metadata"))
    field.dataType match {
      case StringType => "string"
      case DateType => "date"
      case IntegerType | LongType | ShortType | ByteType => "long"
      case other => throw new IllegalArgumentException(
        s"OPTIMIZE WHERE on '$c': partition columns of type " +
          s"${other.simpleString} cannot scope a rewrite — supported: " +
          "string, date, integer types")
    }
  }

  /** Hive path partition value → typed comparison value, or None when it
    * cannot represent one (the null-partition sentinel, a malformed
    * number/date) — an unmatched partition is OUT OF SCOPE, not an
    * error. */
  private def parsePartValue(typ: String, raw: String): Option[Any] = {
    if (raw == "__HIVE_DEFAULT_PARTITION__") return None
    typ match {
      case "string" => Some(raw)
      case "long" => raw.toLongOption
      case "date" =>
        try Some(java.time.LocalDate.parse(raw).toEpochDay)
        catch { case _: java.time.format.DateTimeParseException => None }
    }
  }

  /** Typed row predicate for one scope term — the EXACT column-side twin
    * of the path-value match above (dates compare as DATE literals,
    * integers as longs, strings raw). */
  private def scopePredicate(t: graft.plans.ScopeTerm, typ: String,
                             lit: Any): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{col, lit => litOf}
    val rhs = (typ, lit) match {
      case ("date", d: Long) =>
        litOf(java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(d)))
      case (_, v) => litOf(v)
    }
    val lhs = col(t.col)
    t.op match {
      case "=" => lhs === rhs
      case ">" => lhs > rhs
      case ">=" => lhs >= rhs
      case "<" => lhs < rhs
      case "<=" => lhs <= rhs
      case other => throw new IllegalArgumentException(
        s"unknown scope operator '$other'")
    }
  }

  /** The table's current logical rows narrowed to an OPTIMIZE WHERE
    * scope — the frame a scoped maintenance rewrite reads (ZORDER
    * cluster-key stats run over exactly these rows, so a scoped rewrite
    * spends its ordinal range on the scoped values). Columns resolve and
    * type against the table's own metaData, like [[optimize]] itself. */
  def readScoped(spark: SparkSession, path: String,
                 scope: Seq[graft.plans.ScopeTerm]): DataFrame = {
    val base = DeltaLogReader.read(spark, path)
    if (scope.isEmpty) return base
    val (_, meta) = DeltaLogReader.replayState(spark, path, None)
    val metaNode = meta.getOrElse(throw new IllegalArgumentException(
      s"Delta log at $path carries no metaData action"))
    val pc = metaNode.path("partitionColumns")
    val partCols = (0 until pc.size()).map(pc.get(_).asText())
    scope.foldLeft(base) { case (df, t0) =>
      val c = partCols.find(_.equalsIgnoreCase(t0.col)).getOrElse(
        throw new IllegalArgumentException(
          s"OPTIMIZE WHERE names '${t0.col}', not a partition column of " +
            s"$path " + partCols.mkString("(", ", ", ")")))
      val t = t0.copy(col = c)
      val typ = scopeTyp(path, metaNode, c)
      df.filter(scopePredicate(t, typ,
        graft.plans.ScopeTerm.typedValue(typ, c, t.value)))
    }
  }

  /** Root-relative file path → partition values, parsed back from the
    * hive `k=v` segments (percent-decoded). */
  private def partitionValuesOf(rel: String): Map[String, String] =
    rel.split("/").dropRight(1).filter(_.contains("="))
      .map { seg =>
        val i = seg.indexOf('=')
        DeltaLogReader.percentDecode(seg.substring(0, i)) ->
          DeltaLogReader.percentDecode(seg.substring(i + 1))
      }.toMap

  /** Root-relative file path → `partitionValues` JSON object, parsed back
    * from the hive `k=v` segments (percent-decoded like every Delta
    * writer records them). */
  private def partitionValuesJson(rel: String): String =
    rel.split("/").dropRight(1).filter(_.contains("="))
      .map { seg =>
        val i = seg.indexOf('=')
        val k = DeltaLogReader.percentDecode(seg.substring(0, i))
        val v = DeltaLogReader.percentDecode(seg.substring(i + 1))
        s"${jsonStr(k)}:${jsonStr(v)}"
      }.mkString("{", ",", "}")

  /** The protocol's checkpoint-row schema subset this writer emits:
    * spec-complete `add` (path, partitionValues MAP, size,
    * modificationTime, dataChange=false) plus ONE `protocol` and ONE
    * `metaData` row — PROTOCOL.md requires both in every checkpoint,
    * because readers reconstruct state from the checkpoint plus only the
    * commits AFTER it (the carrying commits may be truncated away). */
  // the add struct carries the deletionVector descriptor and the
  // protocol struct its feature lists: a checkpoint is the ONLY log
  // state once cleanLog prunes the commits, so dropping either would
  // silently resurrect DV-deleted rows / un-gate table features on
  // cold replay (the r12 checkpoint-fidelity gap)
  private val CheckpointSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "add STRUCT<path: STRING, partitionValues: MAP<STRING, STRING>, " +
      "size: BIGINT, modificationTime: BIGINT, dataChange: BOOLEAN, " +
      "deletionVector STRUCT<storageType: STRING, pathOrInlineDv: STRING, " +
      "offset: INT, sizeInBytes: INT, cardinality: BIGINT>>, " +
      "protocol STRUCT<minReaderVersion: INT, minWriterVersion: INT, " +
      "readerFeatures: ARRAY<STRING>, writerFeatures: ARRAY<STRING>>, " +
      "metaData STRUCT<id: STRING, format: STRUCT<provider: STRING, " +
      "options: MAP<STRING, STRING>>, schemaString: STRING, " +
      "partitionColumns: ARRAY<STRING>, configuration: MAP<STRING, STRING>, " +
      "createdTime: BIGINT>, " +
      "txn STRUCT<appId: STRING, version: BIGINT, lastUpdated: BIGINT>")

  /** Latest `txn` action per appId — the protocol's idempotent-streaming
    * ledger: a prior checkpoint's txn rows (this writer carries them
    * forward, so cleanLog never forgets a writer's position) overlaid by
    * every SURVIVING commit JSON's txn actions, later wins. */
  private[sources] def latestTxns(spark: SparkSession, path: String)
      : Map[String, Long] = {
    val log = logDir(spark, path)
    val f = fs(spark, new Path(path))
    val acc = scala.collection.mutable.Map.empty[String, Long]
    // prior checkpoint's txn rows first (the base state) — and the JSON
    // walk below then starts AFTER it: a long-running streaming ingest
    // pays O(#commits-since-checkpoint) per batch, not O(#commits)
    // (Delta's own checkpoint-every-10-commits discipline is what keeps
    // this bounded; [[GraftDeltaStreamSink]] follows it)
    val vs = DeltaLogReader.versions(spark, path)
    val ckptV = DeltaLogReader.lastCheckpointVersion(spark, path)
    // floor for the JSON walk below: commits with v > floor are scanned.
    // A txn-carrying checkpoint raises it to the checkpoint version (the
    // rows above ARE the pre-checkpoint state); a txn-LESS checkpoint —
    // one written before this writer carried txn rows forward — keeps
    // the floor at the start iff every pre-checkpoint commit survives,
    // and REFUSES when cleanLog pruned them: a silent empty ledger would
    // let a replayed stream batch double-land.
    var walkFloor: Long = -1L
    ckptV.foreach { cv =>
      val single = new Path(log, f"$cv%020d.checkpoint.parquet")
      val partPaths: Seq[String] =
        if (f.exists(single)) Seq(single.toString)
        else f.globStatus(new Path(log,
            f"$cv%020d.checkpoint.??????????.??????????.parquet"))
          .map(_.getPath.toString).sorted.toSeq
      val seeded = partPaths.nonEmpty && {
        val ck = spark.read.parquet(partPaths: _*)
        ck.schema.fieldNames.contains("txn") && {
          ck.where(org.apache.spark.sql.functions.col("txn").isNotNull)
            .select("txn.appId", "txn.version").collect()
            .foreach(r => acc(r.getString(0)) = r.getLong(1))
          true
        }
      }
      if (seeded) walkFloor = cv
      else {
        val have = vs.toSet
        if (!(0L until cv).forall(have))
          throw new TxnLedgerLostException(
            s"Delta checkpoint v$cv at $path carries no txn rows and " +
              "cleanLog pruned pre-checkpoint commits — a streaming " +
              "writer's ledger position may be lost and a replayed batch " +
              "would double-land; acknowledge the loss explicitly with " +
              "checkpoint(resetTxnLedger = true) (or restart the stream " +
              "against a fresh sink) before appending stream batches")
      }
    }
    vs.filter(_ > walkFloor).foreach { cv =>
        DeltaLogReader.readSmallFile(spark, new Path(log, f"$cv%020d.json"))
          .split("\n").filter(_.nonEmpty).map(mapper.readTree)
          .filter(_.has("txn")).foreach { n =>
            val t = n.get("txn")
            acc(t.path("appId").asText("")) = t.path("version").asLong()
          }
      }
    acc.toMap
  }

  /** The last batch version a streaming writer `appId` committed, or
    * None for a writer the log has never seen. */
  def lastTxnVersion(spark: SparkSession, path: String,
                     appId: String): Option[Long] =
    latestTxns(spark, path).get(appId)

  /** EXACTLY-ONCE STREAMING APPEND — the delta streaming sink's own
    * idempotence protocol: the batch's adds commit together with a
    * `{"txn": {appId, version}}` action, and a batch whose version is
    * ≤ the appId's recorded position SKIPS (returns None) instead of
    * double-landing — so a foreachBatch/Sink retry after a crash
    * between the data commit and the engine's offset commit is a
    * no-op, turning the engine's at-least-once redelivery into
    * exactly-once table state. Checkpoints carry txn rows forward
    * ([[checkpoint]]), so cleanLog never forgets a writer's position.
    * Schema/partition validation and the NOT-NULL guard mirror
    * [[appendOptimistic]]; column-mapped tables refuse (stream through
    * foreachBatch + write()).
    *
    * The commit runs under the [[commitLoop]] protocol, so a racing
    * MAINTENANCE commit (a checkpoint-cycle OPTIMIZE, a vacuum's
    * bookkeeping, another writer's blind append) does NOT abort the
    * stream: data-only winners are disjoint from a blind append and the
    * batch re-proposes at N+1 with its parts already staged. True
    * conflicts stay loud — a schema/partition drift or protocol upgrade
    * under the staged parquet refuses with
    * ConcurrentModificationException — and the txn ledger is the
    * exactly-once backstop in BOTH lanes: a winning commit carrying this
    * appId at ≥ batchVersion means another instance of the same stream
    * landed the batch mid-race, and this attempt SKIPS (None) instead of
    * double-landing.
    * @return Some(committed version), or None when the batch was
    *   already applied */
  def appendStreamBatch(df: DataFrame, path: String,
                        appId: String, batchVersion: Long,
                        partitionBy: Seq[String] = Nil,
                        maxRetries: Int = 10): Option[Long] = {
    val spark = df.sparkSession
    require(appId.nonEmpty, "appendStreamBatch needs a stable appId")
    // ORDER MATTERS for exactly-once: capture the log position FIRST,
    // then read the ledger. The ledger read (walking the log at a time
    // ≥ this snapshot) covers every commit ≤ observed; commitLoop scans
    // every commit > observed. A duplicate instance of this stream that
    // commits during the validation window below therefore lands at a
    // version > observed and IS scanned — capturing observed after the
    // ledger read (the old order) left exactly that window's commits
    // covered by neither check.
    val observed = DeltaLogReader.latestVersion(spark, path)
    if (lastTxnVersion(spark, path, appId).exists(_ >= batchVersion))
      return None
    val root = new Path(path)
    val f = fs(spark, root)
    val meta = DeltaLogReader.replayState(spark, path, None)._2
      .getOrElse(throw new IllegalArgumentException(
        s"Delta log at $path carries no metaData action — create the " +
          "table with write() before streaming into it"))
    requireBlindAppendable(spark, path, meta)
    require(DeltaLogReader.mappingMode(meta) == "none",
      s"Delta table at $path uses column mapping — stream through " +
        "foreachBatch + write() instead")
    require(sameShape(meta.path("schemaString").asText(), df.schema),
      s"stream batch schema drifts from $path's metaData schema (table: " +
        s"${meta.path("schemaString").asText()}; batch: ${df.schema.json})")
    val tableParts = (0 until meta.path("partitionColumns").size())
      .map(meta.path("partitionColumns").get(_).asText())
    require(tableParts == partitionBy,
      s"partitionBy ${partitionBy.mkString("(", ", ", ")")} contradicts " +
        s"$path's partition columns ${tableParts.mkString("(", ", ", ")")}")
    val declared = org.apache.spark.sql.types.DataType
      .fromJson(meta.path("schemaString").asText())
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val toStage =
      if (!declared.fields.exists(fd => !fd.nullable && df.schema(fd.name).nullable)) df
      else {
        import org.apache.spark.sql.functions.{lit, raise_error, when}
        df.select(declared.fields.map { fd =>
          val c = dfCol(df, fd.name)
          (if (fd.nullable || !df.schema(fd.name).nullable) c
           else when(c.isNull, raise_error(lit(
             s"NOT NULL constraint violated: column ${fd.name} of $path")))
             .otherwise(c)).as(fd.name)
        }.toSeq: _*)
      }
    val newFiles = publishParts(spark, root, toStage,
      observed.get + 1, partitionBy)
    val now = System.currentTimeMillis()
    val adds = newFiles.map { rel =>
      val st = f.getFileStatus(new Path(root, rel))
      s"""{"add":{"path":${jsonStr(encodePath(rel))},"partitionValues":${partitionValuesJson(rel)},""" +
        s""""size":${st.getLen},"modificationTime":${st.getModificationTime},""" +
        s""""dataChange":true}}"""
    }
    val txnLine =
      s"""{"txn":{"appId":${jsonStr(appId)},"version":$batchVersion,"lastUpdated":$now}}"""
    val observedSchema = meta.path("schemaString").asText()
    try {
      Some(commitLoop(spark, path, observed, maxRetries, nodes =>
        nodes.collectFirst {
          // the ledger backstop: another instance of THIS stream landed
          // the batch mid-race — skip, never double-land (not a refusal)
          case n if n.has("txn") &&
              n.get("txn").path("appId").asText("") == appId &&
              n.get("txn").path("version").asLong(Long.MinValue) >= batchVersion =>
            throw BatchAlreadyLanded
          case n if n.has("metaData") &&
              n.get("metaData").path("schemaString").asText() != observedSchema =>
            "metaData changed the schema under this staged stream batch"
          case n if n.has("metaData") &&
              n.get("metaData").path("partitionColumns").toString !=
                partitionBy.map(jsonStr).mkString("[", ",", "]") =>
            "metaData changed the partition columns under this staged stream batch"
          case n if n.has("protocol") &&
              !(n.get("protocol").path("minReaderVersion").asInt(0) == 1 &&
                n.get("protocol").path("minWriterVersion").asInt(0) == 2 &&
                !n.get("protocol").has("readerFeatures")) =>
            "a protocol upgrade landed under this staged stream batch"
        }) { (_, _) => txnLine +: adds })
    } catch { case BatchAlreadyLanded => None }
  }

  /** Control-flow sentinel for [[appendStreamBatch]]'s mid-race ledger
    * hit — a commit-loop scan that finds this stream's own (appId,
    * version) already recorded unwinds to a clean skip. */
  private object BatchAlreadyLanded
      extends scala.util.control.ControlThrowable

  /** The streaming txn ledger is unrecoverable: a txn-less legacy
    * checkpoint plus pruned pre-checkpoint commits. A dedicated type —
    * not a message-substring contract — so [[checkpoint]]'s explicit
    * `resetTxnLedger` acknowledgment can catch exactly this and nothing
    * else. */
  private[sources] class TxnLedgerLostException(msg: String)
      extends IllegalArgumentException(msg)

  /** Compact the CURRENT active-file state into a
    * `%020d.checkpoint.parquet` (or, with `parts > 1`, the spec's
    * MULTI-PART `%020d.checkpoint.%010d.%010d.parquet` spelling — at
    * 100 TB a table's millions of add rows cannot serialize through one
    * driver-written part, and real readers list the parts in parallel)
    * + the `_last_checkpoint` pointer, so readers replay from the
    * checkpoint instead of the full commit history (and older commits
    * become prunable). The checkpoint carries
    * the table's latest `protocol` (feature lists included) and
    * `metaData` actions (replayed from the commit JSONs) alongside the
    * spec-complete `add` rows — each with its `deletionVector`
    * descriptor when one is attached, so a DV-carrying table's exact
    * row set survives cleanLog + cold replay (dropping either the
    * descriptor or a feature gate would silently resurrect rows /
    * un-gate features the moment the commits are pruned). */
  def checkpoint(spark: SparkSession, path: String, parts: Int = 1,
                 resetTxnLedger: Boolean = false): Long = {
    import spark.implicits._
    require(parts >= 1, s"checkpoint parts must be >= 1, got $parts")
    val latest = DeltaLogReader.latestVersion(spark, path)
    require(latest.nonEmpty, s"no Delta log at $path to checkpoint")
    val v = latest.get
    // replayState, not activeFiles: the bare file list under-describes a
    // DV-carrying table — each add row below re-emits its descriptor so
    // the checkpoint alone reconstructs the exact row set
    val entries = DeltaLogReader.replayState(spark, path, None)._1
    val log = new Path(path, "_delta_log")
    val f = fs(spark, log)
    // latest protocol/metaData: scan the surviving commit JSONs NEWEST
    // first and stop at the first commit carrying both (in practice
    // commit 0 — but a metaData update in a later commit must win, hence
    // newest-first); when the carrying commits were already pruned, fall
    // back to the PREVIOUS checkpoint parquet, which (by this writer's
    // own contract) carries both actions forward
    var protoLine: Option[String] = None
    var metaLine: Option[String] = None
    DeltaLogReader.versions(spark, path).reverse.iterator
      .takeWhile(_ => protoLine.isEmpty || metaLine.isEmpty) // lazy: stops scanning once both found
      .foreach { cv =>
        DeltaLogReader.readSmallFile(spark, new Path(log, f"$cv%020d.json"))
          .split("\n").filter(_.nonEmpty).foreach { line =>
            val node = mapper.readTree(line)
            if (node.has("protocol") && protoLine.isEmpty) protoLine = Some(line)
            else if (node.has("metaData") && metaLine.isEmpty) metaLine = Some(line)
          }
      }
    if (protoLine.isEmpty || metaLine.isEmpty) {
      // pruned history: replay the actions forward from the prior
      // checkpoint — single-part or multi-part, ONLY this writer's own
      // spellings (a foreign spelling like a v2 UUID checkpoint must
      // not be selected: its glob would match nothing and crash with
      // an unrelated schema error instead of the refusal below)
      val SinglePat = """(\d{20})\.checkpoint\.parquet""".r
      val MultiPat = """(\d{20})\.checkpoint\.\d{10}\.\d{10}\.parquet""".r
      val prior = f.listStatus(log).map(_.getPath.getName)
        .collect { case SinglePat(v0) => v0.toLong
                   case MultiPat(v0) => v0.toLong }
        .distinct.sorted.lastOption
      prior.foreach { pv =>
        val single = new Path(log, f"$pv%020d.checkpoint.parquet")
        val partPaths: Seq[String] =
          if (f.exists(single)) Seq(single.toString)
          else f.globStatus(new Path(log,
              f"$pv%020d.checkpoint.??????????.??????????.parquet"))
            .map(_.getPath.toString).sorted.toSeq
        require(partPaths.nonEmpty,
          s"checkpoint v$pv at $path matched neither the single- nor " +
            "multi-part spelling — corrupt or foreign checkpoint layout")
        val ck = spark.read.parquet(partPaths: _*)
        def jsonOf(colName: String): Option[String] = {
          if (!ck.schema.fieldNames.contains(colName)) None
          else ck.where(org.apache.spark.sql.functions.col(colName).isNotNull)
            .select(org.apache.spark.sql.functions.to_json(
              org.apache.spark.sql.functions.col(colName)))
            .collect().headOption
            .map(r => s"""{"$colName":${r.getString(0)}}""")
        }
        if (protoLine.isEmpty) protoLine = jsonOf("protocol")
        if (metaLine.isEmpty) metaLine = jsonOf("metaData")
      }
    }
    require(protoLine.nonEmpty && metaLine.nonEmpty,
      s"Delta log at $path has no surviving protocol/metaData action in its " +
        "commits or prior checkpoint — cannot write a spec-complete checkpoint")
    // the idempotent-streaming ledger rides every checkpoint: without it
    // cleanLog would forget a streaming writer's position and a replayed
    // batch would double-land (the protocol carries txn rows for exactly
    // this reason). A table whose PRIOR checkpoint is txn-less (written
    // before this carry) with its pre-checkpoint commits pruned refuses —
    // unless the caller explicitly acknowledges the ledger loss with
    // resetTxnLedger, which starts a fresh (empty) ledger.
    val txns =
      try latestTxns(spark, path)
      catch { case _: TxnLedgerLostException if resetTxnLedger =>
        Map.empty[String, Long] }
    val txnLines = txns.toSeq.sortBy(_._1).map {
      case (app, tv) =>
        s"""{"txn":{"appId":${jsonStr(app)},"version":$tv}}"""
    }
    val tmp = new Path(log, ".tmp_checkpoint")
    f.delete(tmp, true)
    // re-relativize against the table root (NOT getName — a partitioned
    // file's hive segments are part of its protocol path)
    val rootUri = new Path(path).toUri.getPath.stripSuffix("/")
    val root = new Path(path)
    val rootFs = fs(spark, root) // hoisted: one Configuration + FS lookup, not O(#files)
    val addLines = entries.map { case (abs, dvOpt) =>
      val rel = new Path(abs).toUri.getPath.stripPrefix(rootUri).stripPrefix("/")
      val st = rootFs.getFileStatus(new Path(root, rel))
      val dvField = dvOpt.map(d => s""","deletionVector":$d""").getOrElse("")
      s"""{"add":{"path":${jsonStr(encodePath(rel))},""" +
        s""""partitionValues":${partitionValuesJson(rel)},"size":${st.getLen},""" +
        s""""modificationTime":${st.getModificationTime},"dataChange":false$dvField}}"""
    }
    // part 1 carries protocol/metaData (the spec lets actions land in
    // any part; pinning them keeps the layout deterministic); add rows
    // chunk evenly across the parts. An empty chunk still writes its
    // part — every named part must exist for the pointer to be honest.
    val chunkSize = math.max(1, (addLines.size + parts - 1) / parts)
    val chunks = addLines.grouped(chunkSize).toSeq
      .padTo(parts, Seq.empty[String]).take(parts)
    def writePart(lines: Seq[String], target: Path): Unit = {
      f.delete(tmp, true)
      spark.read.schema(CheckpointSchema).json(lines.toDS())
        .coalesce(1).write.parquet(tmp.toString)
      val part = f.listStatus(tmp)
        .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
        .head.getPath
      f.delete(target, false)
      require(f.rename(part, target), s"checkpoint rename failed: $target")
      f.delete(tmp, true)
    }
    if (parts == 1)
      writePart(protoLine.toSeq ++ metaLine.toSeq ++ txnLines ++ addLines,
        new Path(log, f"$v%020d.checkpoint.parquet"))
    else chunks.zipWithIndex.foreach { case (chunk, i) =>
      val header =
        if (i == 0) protoLine.toSeq ++ metaLine.toSeq ++ txnLines else Seq.empty
      writePart(header ++ chunk,
        new Path(log, f"$v%020d.checkpoint.${i + 1}%010d.$parts%010d.parquet"))
    }
    val partsField = if (parts == 1) "" else s""","parts":$parts"""
    writeAtomic(spark, new Path(log, "_last_checkpoint"),
      s"""{"version":$v,"size":${entries.size + 2 + txnLines.size}$partsField}""" + "\n",
      overwrite = true)
    v
  }

  /** DELETE ... WHERE as a DELETION-VECTOR commit — the fast path real
    * Delta runs at warehouse scale: no parquet part is rewritten; each
    * file with matching rows gains (or replaces) a sidecar roaring
    * bitmap of its dead row positions, and readers (including
    * [[DeltaLogReader.read]]'s merge-on-read) subtract them at scan
    * time. On a 100 TB table this turns a point DELETE from a
    * rewrite-everything job into O(matching files) bitmap writes.
    *
    * Distribution: matching positions are gathered PER FILE on
    * executors (`collect_list` inside a file-keyed aggregate — state
    * bounded by rows-per-file, the same bound the bitmap itself
    * carries), each file's task UNIONS any existing DV (reading the old
    * sidecar right there), serializes the new bitmap, and writes the
    * sidecar directly from the executor (Hadoop conf rides a
    * broadcast); only (path, descriptor, cardinality) planning rows —
    * O(#touched files), [[graft.operators.ManifestGuard]]-bounded by
    * the replay — return to the driver for the commit. The commit
    * emits `remove`+re-`add` per touched file (the protocol's
    * attach-without-rewrite spelling) and upgrades the protocol to
    * reader 3 / writer 7 with the deletionVectors feature when the
    * table does not already declare it.
    *
    * Refused loudly: a column-mapped table (the predicate would need
    * logical→physical resolution this writer does not do) and
    * predicates touching the scan's internal coordinate columns.
    * @return (committed version, newly deleted row count) */
  def deleteWhere(spark: SparkSession, path: String,
                  predicate: org.apache.spark.sql.Column): (Long, Long) = {
    import org.apache.spark.sql.functions.lit
    val root = new Path(path)
    val (entries, meta) = DeltaLogReader.replayState(spark, path, None)
    if (entries.isEmpty) throw new EmptyTableException(
      s"Delta table at $path has no active files")
    // name-mode mapping is resolved (dvAttachActions projects the
    // physical footers back to logical names); id mode would need
    // field-id stamping this writer does not do
    require(meta.map(DeltaLogReader.mappingMode).forall(m => m == "none" || m == "name"),
      s"Delta table at $path uses id-mode column mapping — deleteWhere " +
        "resolves name mode only; refusing")
    require(!(meta.exists(m => DeltaLogReader.mappingMode(m) != "none") &&
        meta.exists(cdfEnabled)),
      s"Delta table at $path combines column mapping with Change Data " +
        "Feed — publishing change files under mapping (physical-named " +
        "change parquet) is not implemented; refusing")
    // mapping + partition columns: the mapped scan reads physical
    // footers and cannot reconstruct hive partition values — a predicate
    // naming a partition column would silently match nothing (or, worse,
    // isNull would match everything); refuse the combination up front,
    // the upsert gate's twin (readMapped backstops this inside the scan)
    require(!(meta.exists(m => DeltaLogReader.mappingMode(m) != "none") &&
        meta.exists(_.path("partitionColumns").elements().hasNext)),
      s"Delta table at $path combines column mapping with partition " +
        "columns — the mapped scan does not reconstruct partition values; " +
        "refusing")
    val version = DeltaLogReader.latestVersion(spark, path).get + 1
    val (protoLine, actions, nDeleted) =
      dvAttachActions(spark, path, entries, version, _.where(predicate), meta)
    if (actions.isEmpty) return (version - 1, 0L)
    // CDF: a DV rewrite is NOT derivable from add/remove actions (the
    // delta is inside the bitmap), so the commit must carry its change
    // data — the deleted rows are exactly the ACTIVE rows matching the
    // predicate, captured before the commit supersedes them. AFTER the
    // no-op return above: a predicate matching nothing must not scan
    // the table again or strand an orphan change file.
    val cdcLines =
      if (!meta.exists(cdfEnabled)) Seq.empty[String]
      else {
        val cols = org.apache.spark.sql.types.DataType
          .fromJson(meta.get.get("schemaString").asText())
          .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames
        require(!cols.contains("_change_type"),
          s"Delta table at $path has a _change_type column — colliding " +
            "with the Change Data Feed schema; rename it first")
        publishChangeData(spark, root, version,
          DeltaLogReader.read(spark, path).where(predicate)
            .withColumn("_change_type", lit("delete")))
      }
    val rootFs = fs(spark, root)
    val commit = new Path(logDir(spark, path), f"$version%020d.json")
    require(!rootFs.exists(commit),
      s"Delta commit v$version already exists at $path — concurrent writer, refusing to clobber")
    writeAtomic(spark, commit,
      (protoLine ++ actions ++ cdcLines).mkString("", "\n", "\n"))
    (version, nDeleted)
  }

  /** UPDATE ... SET ... WHERE as ONE commit — the row-level update the
    * reference's production loop runs through SQL on its metastore
    * table (`02_geofraud_fraud.py:283-304`): every ACTIVE row matching
    * `predicate` is deletion-vector-killed in place (no parquet part
    * rewritten — [[deleteWhere]]'s sidecar machinery) and re-appended
    * with `assignments` applied, both action sets in a single log
    * entry, so readers never observe the deleted-but-not-yet-rewritten
    * intermediate state a delete-then-append pair would expose.
    * Partitioned tables update too: the rewritten rows republish
    * through the hive layout, so an assignment to a partition column
    * MOVES the row to its new partition (the add action carries the new
    * partitionValues). CDF tables publish the pre/post images as
    * `update_preimage`/`update_postimage` change files in the same
    * commit. Previously-DV-killed rows that match the predicate stay
    * dead (the bitmap union is idempotent; only ACTIVE rows re-append).
    * Refused loudly: column mapping in any mode (the re-append would
    * need the physical-name projection — express the change through
    * write()), assignments naming non-columns, and assignments whose
    * value type does not cast to the column's declared type (ANSI cast
    * at write time raises rather than landing corrupt rows).
    * @param assignments (column name → new value), evaluated against
    *   the table's own columns (SQL `SET c = expr` semantics)
    * @return (committed version, rows updated) */
  def updateWhere(spark: SparkSession, path: String,
                  predicate: org.apache.spark.sql.Column,
                  assignments: Seq[(String, org.apache.spark.sql.Column)])
      : (Long, Long) = {
    import org.apache.spark.sql.functions.lit
    require(assignments.nonEmpty, "updateWhere needs at least one assignment")
    require(assignments.map(_._1).distinct.size == assignments.size,
      s"UPDATE assigns a column twice (${assignments.map(_._1).mkString(", ")}) " +
        "— refusing a silent last-wins")
    val root = new Path(path)
    val (entries, meta) = DeltaLogReader.replayState(spark, path, None)
    if (entries.isEmpty) throw new EmptyTableException(
      s"Delta table at $path has no active files")
    val metaNode = meta.getOrElse(throw new IllegalArgumentException(
      s"Delta log at $path carries no metaData action — cannot validate " +
        "the update schema; refusing"))
    // NAME-mode mapping is resolved end-to-end (the day-after-RENAME
    // UPDATE a real user types): the kill scan reads physical footers
    // under the metaData's physicalName map and serves LOGICAL names
    // (dvAttachActions' own readMapped path), and the rewritten rows
    // project BACK to physical names before publishing — the write()
    // discipline. Id mode refuses; mapping+partitions and mapping+CDF
    // refuse below (the deleteWhere gates).
    val mapMode = DeltaLogReader.mappingMode(metaNode)
    require(mapMode == "none" || mapMode == "name",
      s"Delta table at $path uses id-mode column mapping — updateWhere " +
        "resolves name mode only; refusing")
    require(mapMode == "none" ||
        !metaNode.path("partitionColumns").elements().hasNext,
      s"Delta table at $path combines column mapping with partition " +
        "columns — the mapped scan does not reconstruct partition values; " +
        "refusing")
    require(mapMode == "none" || !cdfEnabled(metaNode),
      s"Delta table at $path combines column mapping with Change Data " +
        "Feed — publishing change files under mapping is not implemented; " +
        "refusing")
    val tableSchema = org.apache.spark.sql.types.DataType
      .fromJson(metaNode.get("schemaString").asText())
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val badCols = assignments.map(_._1).filterNot(tableSchema.fieldNames.contains)
    require(badCols.isEmpty,
      s"UPDATE assigns to column(s) ${badCols.mkString(", ")} that are not " +
        s"columns of $path (${tableSchema.fieldNames.mkString(", ")})")
    val partCols: Seq[String] = {
      val pc = metaNode.path("partitionColumns")
      (0 until pc.size()).map(pc.get(_).asText())
    }
    val version = DeltaLogReader.latestVersion(spark, path).get + 1
    val (protoLine, killActions, nUpdated) =
      dvAttachActions(spark, path, entries, version, _.where(predicate), meta)
    if (killActions.isEmpty) return (version - 1, 0L)
    // the rewritten rows: ACTIVE rows matching the predicate (the MoR
    // read — previously-dead rows stay dead), each assignment applied
    // and cast to the column's DECLARED type so the committed parquet
    // stays footer-compatible with the table's own reads
    val byName = assignments.toMap
    val matched = DeltaLogReader.read(spark, path).where(predicate)
    val updated = matched.select(tableSchema.fields.map { fd =>
      byName.get(fd.name)
        .map(_.cast(fd.dataType))
        .getOrElse(dfCol(matched, fd.name))
        .as(fd.name)
    }.toSeq: _*)
    // a NAME-mapped table's parquet carries PHYSICAL names — project the
    // rewritten rows through the metaData's physicalName map (write()'s
    // own discipline; a logical-named file would orphan after a rename)
    val toPublish =
      if (mapMode == "none") updated
      else updated.toDF(tableSchema.fields.map(fd =>
        fd.metadata.getString("delta.columnMapping.physicalName")).toSeq: _*)
    val f = fs(spark, root)
    val newFiles = publishParts(spark, root, toPublish, version, partCols)
    val adds = newFiles.map { rel =>
      val st = f.getFileStatus(new Path(root, rel))
      s"""{"add":{"path":${jsonStr(encodePath(rel))},"partitionValues":${partitionValuesJson(rel)},""" +
        s""""size":${st.getLen},"modificationTime":${st.getModificationTime},""" +
        s""""dataChange":true}}"""
    }
    // CDF: a DV kill is not derivable from add/remove, so the commit
    // carries pre AND post images (the protocol's update_* change
    // types) — captured from the SAME matched frame the rewrite used
    val cdcLines =
      if (!meta.exists(cdfEnabled)) Seq.empty[String]
      else {
        require(!tableSchema.fieldNames.contains("_change_type"),
          s"Delta table at $path has a _change_type column — colliding " +
            "with the Change Data Feed schema; rename it first")
        publishChangeData(spark, root, version,
          matched.withColumn("_change_type", lit("update_preimage"))
            .unionAll(updated.withColumn("_change_type", lit("update_postimage"))))
      }
    val commit = new Path(logDir(spark, path), f"$version%020d.json")
    require(!f.exists(commit),
      s"Delta commit v$version already exists at $path — concurrent writer, refusing to clobber")
    writeAtomic(spark, commit,
      (protoLine ++ killActions ++ adds ++ cdcLines).mkString("", "\n", "\n"))
    (version, nUpdated)
  }

  /** `delta.enableChangeDataFeed` check on a metaData action. */
  private[sources] def cdfEnabled(meta: com.fasterxml.jackson.databind.JsonNode): Boolean =
    meta.path("configuration").path("delta.enableChangeDataFeed")
      .asText("false") == "true"

  /** Merge `props` into the table's metaData `configuration` and commit
    * the updated metaData as a new version (how
    * `ALTER TABLE ... SET TBLPROPERTIES` lands in the log — later-wins
    * replay serves the new configuration). Setting
    * `delta.enableChangeDataFeed=true` turns the CDF machinery on for
    * every LATER commit: [[deleteWhere]] and [[upsert]] start writing
    * `_change_data/` files + `cdc` actions, and
    * [[DeltaLogReader.readChangeFeed]] serves the feed. */
  def setTableProperties(spark: SparkSession, path: String,
                         props: Map[String, String]): Long = {
    require(props.nonEmpty, "setTableProperties needs at least one property")
    val (_, meta) = DeltaLogReader.replayState(spark, path, None)
    val metaNode = meta.getOrElse(throw new IllegalArgumentException(
      s"Delta log at $path carries no metaData action — nothing to set " +
        "properties on"))
    val updated = metaNode.deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]
    val conf = updated.path("configuration") match {
      case o: com.fasterxml.jackson.databind.node.ObjectNode => o
      case _ => updated.putObject("configuration")
    }
    props.foreach { case (k, v) => conf.put(k, v) }
    updated.set("configuration", conf)
    val version = DeltaLogReader.latestVersion(spark, path).get + 1
    val commit = new Path(logDir(spark, path), f"$version%020d.json")
    require(!fs(spark, new Path(path)).exists(commit),
      s"Delta commit v$version already exists at $path — concurrent writer, refusing to clobber")
    writeAtomic(spark, commit,
      s"""{"metaData":${mapper.writeValueAsString(updated)}}""" + "\n")
    version
  }

  /** Enable NAME-mode COLUMN MAPPING on an existing table — the upgrade
    * `ALTER TABLE ... SET ('delta.columnMapping.mode' = 'name')` runs:
    * every existing column gets `delta.columnMapping.id` (1..n) and
    * `delta.columnMapping.physicalName` = its CURRENT name (the name
    * the already-written parquet physically carries — that equality is
    * what makes the upgrade a pure metadata commit), the configuration
    * gains mode + maxColumnId, and the protocol upgrades to the
    * mapping-capable (2, 5) when below it. After this, [[renameColumn]]
    * serves every old file under new logical names with ZERO data
    * rewritten — the Delta twin of Iceberg's field-id rename. */
  def enableColumnMapping(spark: SparkSession, path: String): Long = {
    val (_, meta) = DeltaLogReader.replayState(spark, path, None)
    val metaNode = meta.getOrElse(throw new IllegalArgumentException(
      s"Delta log at $path carries no metaData action — nothing to upgrade"))
    require(DeltaLogReader.mappingMode(metaNode) == "none",
      s"Delta table at $path already sets columnMapping mode " +
        s"'${DeltaLogReader.mappingMode(metaNode)}'")
    val schema = org.apache.spark.sql.types.DataType
      .fromJson(metaNode.get("schemaString").asText())
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val mapped = org.apache.spark.sql.types.StructType(
      schema.fields.zipWithIndex.map { case (fld, i) =>
        fld.copy(metadata = new org.apache.spark.sql.types.MetadataBuilder()
          .withMetadata(fld.metadata)
          .putLong("delta.columnMapping.id", i + 1L)
          .putString("delta.columnMapping.physicalName", fld.name)
          .build())
      })
    val updated = metaNode.deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]
    updated.put("schemaString", mapped.json)
    val conf = updated.path("configuration") match {
      case o: com.fasterxml.jackson.databind.node.ObjectNode => o
      case _ => updated.putObject("configuration")
    }
    conf.put("delta.columnMapping.mode", "name")
    conf.put("delta.columnMapping.maxColumnId", schema.fields.length.toString)
    updated.set("configuration", conf)
    // protocol: legacy (2, 5) implies columnMapping; only upgrade, never
    // downgrade a table already past it. A TABLE-FEATURES protocol
    // (minWriterVersion 7 — e.g. after a DV deleteWhere upgraded it) is
    // different: PROTOCOL.md requires every feature such a table uses to
    // be LISTED, so skipping the action because the version numbers are
    // "high enough" would ship a mapped table real readers reject —
    // merge 'columnMapping' into the existing feature lists instead.
    val latestProto = latestProtocolNode(spark, path)
    val (curR, curW) = latestProto
      .map(p => (p.path("minReaderVersion").asInt(1), p.path("minWriterVersion").asInt(2)))
      .getOrElse((1, 2))
    def featList(k: String): Seq[String] = latestProto.toSeq.flatMap(p =>
      Option(p.get(k)).toSeq.flatMap(a => (0 until a.size()).map(i => a.get(i).asText())))
    val protoLine =
      if (curW >= 7) {
        val rf0 = featList("readerFeatures")
        val wf0 = featList("writerFeatures")
        // reader side: a (3,7) table lists reader features; a legacy
        // reader tier under a features writer (e.g. (1,7)) must at least
        // step to 2, the mapping-capable legacy reader
        val needR = if (curR >= 3) !rf0.contains("columnMapping") else curR < 2
        val needW = !wf0.contains("columnMapping")
        if (!needR && !needW) Seq.empty[String]
        else {
          val newR = if (curR >= 3) curR else math.max(curR, 2)
          val rfJson =
            if (curR >= 3)
              s""","readerFeatures":${(rf0 :+ "columnMapping").distinct
                .map(jsonStr).mkString("[", ",", "]")}"""
            else ""
          val wfJson = s""","writerFeatures":${(wf0 :+ "columnMapping").distinct
            .map(jsonStr).mkString("[", ",", "]")}"""
          Seq(s"""{"protocol":{"minReaderVersion":$newR,"minWriterVersion":$curW$rfJson$wfJson}}""")
        }
      }
      else if (curR >= 2 && curW >= 5) Seq.empty[String]
      else Seq(s"""{"protocol":{"minReaderVersion":${math.max(curR, 2)},""" +
        s""""minWriterVersion":${math.max(curW, 5)}}}""")
    val version = DeltaLogReader.latestVersion(spark, path).get + 1
    val commit = new Path(logDir(spark, path), f"$version%020d.json")
    require(!fs(spark, new Path(path)).exists(commit),
      s"Delta commit v$version already exists at $path — concurrent writer, refusing to clobber")
    writeAtomic(spark, commit,
      (protoLine :+ s"""{"metaData":${mapper.writeValueAsString(updated)}}""")
        .mkString("", "\n", "\n"))
    version
  }

  /** RENAME a column of a NAME-mapped table — a pure metadata commit:
    * the logical name changes in the schemaString; the physicalName
    * and mapping id stay, so every existing file keeps resolving. The
    * rename is AS-OF-consistent (later-wins metaData replay, the
    * reader's documented behavior). */
  def renameColumn(spark: SparkSession, path: String,
                   from: String, to: String): Long = {
    val (_, meta) = DeltaLogReader.replayState(spark, path, None)
    val metaNode = meta.getOrElse(throw new IllegalArgumentException(
      s"Delta log at $path carries no metaData action"))
    require(DeltaLogReader.mappingMode(metaNode) == "name",
      s"Delta table at $path does not use name-mode column mapping — " +
        "renames need it (enableColumnMapping first); without mapping a " +
        "rename would orphan every existing file's physical column")
    val schema = org.apache.spark.sql.types.DataType
      .fromJson(metaNode.get("schemaString").asText())
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    require(schema.fieldNames.contains(from),
      s"cannot rename '$from' in $path: not a column " +
        s"(${schema.fieldNames.mkString(", ")})")
    require(!schema.fieldNames.contains(to),
      s"cannot rename '$from' to '$to' in $path: '$to' already exists")
    val renamed = org.apache.spark.sql.types.StructType(
      schema.fields.map(f => if (f.name == from) f.copy(name = to) else f))
    val updated = metaNode.deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]
    updated.put("schemaString", renamed.json)
    val version = DeltaLogReader.latestVersion(spark, path).get + 1
    val commit = new Path(logDir(spark, path), f"$version%020d.json")
    require(!fs(spark, new Path(path)).exists(commit),
      s"Delta commit v$version already exists at $path — concurrent writer, refusing to clobber")
    writeAtomic(spark, commit,
      s"""{"metaData":${mapper.writeValueAsString(updated)}}""" + "\n")
    version
  }

  /** ADD COLUMN — a pure metadata commit (`ALTER TABLE ... ADD COLUMN`):
    * the schemaString gains one NULLABLE field at the end, no parquet is
    * touched, and every pre-existing file null-fills the new column at
    * scan time ([[DeltaLogReader.read]] types its scan by the log's
    * declared schema, so mixed-generation file sets read uniformly).
    * NAME-mapped tables stamp the new field with the next mapping id
    * and a physicalName equal to its current name — the same convention
    * [[enableColumnMapping]] uses, so a later rename of this column
    * works like any other. Id-mode mapping refuses. Non-nullable adds
    * refuse: existing rows have no value to satisfy the constraint. */
  def addColumn(spark: SparkSession, path: String, name: String,
                dataType: org.apache.spark.sql.types.DataType): Long = {
    val (_, meta) = DeltaLogReader.replayState(spark, path, None)
    val metaNode = meta.getOrElse(throw new IllegalArgumentException(
      s"Delta log at $path carries no metaData action"))
    val mapMode = DeltaLogReader.mappingMode(metaNode)
    require(mapMode == "none" || mapMode == "name",
      s"Delta table at $path uses id-mode column mapping — addColumn " +
        "resolves name mode only; refusing")
    val schema = org.apache.spark.sql.types.DataType
      .fromJson(metaNode.get("schemaString").asText())
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    require(!schema.fieldNames.contains(name),
      s"cannot add column '$name' to $path: the name is taken " +
        s"(${schema.fieldNames.mkString(", ")})")
    val updated = metaNode.deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]
    val newField =
      if (mapMode == "none")
        org.apache.spark.sql.types.StructField(name, dataType, nullable = true)
      else {
        val maxId = updated.path("configuration")
          .path("delta.columnMapping.maxColumnId").asText("0").toLong
        val conf = updated.path("configuration")
          .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
        conf.put("delta.columnMapping.maxColumnId", (maxId + 1).toString)
        org.apache.spark.sql.types.StructField(name, dataType, nullable = true,
          new org.apache.spark.sql.types.MetadataBuilder()
            .putLong("delta.columnMapping.id", maxId + 1)
            .putString("delta.columnMapping.physicalName", name).build())
      }
    updated.put("schemaString",
      org.apache.spark.sql.types.StructType(schema.fields :+ newField).json)
    val version = DeltaLogReader.latestVersion(spark, path).get + 1
    val commit = new Path(logDir(spark, path), f"$version%020d.json")
    require(!fs(spark, new Path(path)).exists(commit),
      s"Delta commit v$version already exists at $path — concurrent writer, refusing to clobber")
    writeAtomic(spark, commit,
      s"""{"metaData":${mapper.writeValueAsString(updated)}}""" + "\n")
    version
  }

  /** The newest protocol action in the surviving commit JSONs. */
  private def latestProtocolNode(spark: SparkSession, path: String)
      : Option[com.fasterxml.jackson.databind.JsonNode] =
    DeltaLogReader.versions(spark, path).reverse.iterator.flatMap { cv =>
      DeltaLogReader.readSmallFile(spark,
          new Path(logDir(spark, path), f"$cv%020d.json"))
        .split("\n").filter(_.nonEmpty)
        .map(mapper.readTree).find(_.has("protocol")).map(_.get("protocol"))
    }.take(1).toSeq.headOption

  /** Publish a `_change_data/` parquet for commit `version` and return
    * its `cdc` action lines (PROTOCOL.md "Add CDC File": change files
    * carry the table columns plus `_change_type`, and their actions are
    * `dataChange=false` — the feed is derived data, not table rows).
    * Zero change rows publish nothing. */
  private def publishChangeData(spark: SparkSession, root: Path,
                                version: Long, changes: DataFrame): Seq[String] = {
    val f = fs(spark, root)
    require(changes.columns.count(_ == "_change_type") == 1 &&
        changes.columns.last == "_change_type",
      "change frame must carry exactly one _change_type column, last")
    val staging = new Path(root,
      s".cdc_staging_v${version}_${java.util.UUID.randomUUID().toString.take(8)}")
    f.delete(staging, true)
    changes.coalesce(1).write.mode(SaveMode.Overwrite).parquet(staging.toString)
    val parts = f.listStatus(staging)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath).sortBy(_.getName)
    val dir = new Path(root, "_change_data")
    f.mkdirs(dir)
    val lines = parts.zipWithIndex.flatMap { case (p, i) =>
      val dst = new Path(dir, f"cdc-v$version%05d-$i%05d.parquet")
      if (f.exists(dst)) f.delete(dst, false) // re-staging a retried commit
      require(f.rename(p, dst), s"rename to $dst failed")
      val st = f.getFileStatus(dst)
      // an all-deleted/empty change set writes a parquet with 0 rows —
      // publish it anyway: the action's presence is what tells readers
      // NOT to derive changes from add/remove for this commit
      Seq(s"""{"cdc":{"path":${jsonStr(encodePath(s"_change_data/${dst.getName}"))},""" +
        s""""partitionValues":{},"size":${st.getLen},"dataChange":false}}""")
    }.toSeq
    f.delete(staging, true)
    lines
  }

  /** Features a LEGACY (pre-table-features) protocol version implies
    * without naming (delta-io PROTOCOL.md, "Table Features" upgrade
    * rule): writer v2 ⇒ appendOnly+invariants, v3 ⇒ +checkConstraints,
    * v4 ⇒ +changeDataFeed+generatedColumns, v5 ⇒ +columnMapping,
    * v6 ⇒ +identityColumns; reader v2 ⇒ columnMapping. An upgrade to
    * (3, 7) must list them explicitly, else external writers are free
    * to stop enforcing them. */
  private def legacyImpliedFeatures(minReader: Int, minWriter: Int)
      : (Seq[String], Seq[String]) = {
    val wf = Seq.newBuilder[String]
    if (minWriter >= 2) wf ++= Seq("appendOnly", "invariants")
    if (minWriter >= 3) wf += "checkConstraints"
    if (minWriter >= 4) wf ++= Seq("changeDataFeed", "generatedColumns")
    if (minWriter >= 5) wf += "columnMapping"
    if (minWriter >= 6) wf += "identityColumns"
    val rf = if (minReader >= 2) Seq("columnMapping") else Seq.empty[String]
    (rf, wf.result())
  }

  /** The DV-attach engine behind [[deleteWhere]] and [[upsert]]: scan
    * every live file WHOLE with its row coordinates (previously
    * DV-deleted rows may match again — the bitmap union keeps that
    * right), let `matcher` keep the rows to kill, fold per-file sorted
    * position arrays on the executors, write/replace each touched
    * file's sidecar bitmap there, and return (protocol-upgrade lines,
    * remove+re-add action lines, newly deleted row count). Empty
    * actions = nothing matched. A NAME-mapped table's scan reads the
    * physical footers under the metaData's physicalName map and serves
    * LOGICAL names to `matcher` — the same resolution [[DeltaLogReader
    * .readMapped]] does, so predicates and key joins speak the user's
    * schema while the positions stay physical-file coordinates. */
  private def dvAttachActions(spark: SparkSession, path: String,
                              entries: Seq[(String, Option[String])],
                              version: Long,
                              matcher: DataFrame => DataFrame,
                              meta: Option[com.fasterxml.jackson.databind.JsonNode] = None)
      : (Seq[String], Seq[String], Long) = {
    import org.apache.spark.sql.functions.{col, collect_list, regexp_replace, sort_array}
    import spark.implicits._
    val root = new Path(path)
    val rootFs = fs(spark, root)
    val qualifiedRoot = rootFs.makeQualified(root)

    val files = entries.map(_._1)
    val fp = "__del_fp"; val pos = "__del_pos"
    def coordCols(df: DataFrame) = Seq(
      regexp_replace(col("_metadata.file_path"),
        "^[a-zA-Z][a-zA-Z0-9+.-]*:/+", "/").as(fp),
      col("_metadata.row_index").as(pos))
    val mapped = meta.filter(m => DeltaLogReader.mappingMode(m) == "name")
    val scanWithCoords: DataFrame = mapped match {
      case Some(m) =>
        // the READER's own name-mode resolution (physical footers,
        // logical projection, coords attached on the scan itself) —
        // one implementation, so its guards (partition columns under
        // mapping, nested logical types, missing physicalName) hold on
        // the DML path too; only the coord names re-spell to this
        // scan's internals
        val logicalNames = org.apache.spark.sql.types.DataType
          .fromJson(m.get("schemaString").asText())
          .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames
        require(!logicalNames.contains(fp) && !logicalNames.contains(pos),
          s"Delta table at $path has a column named $fp/$pos — colliding " +
            "with the DV scan's internal coordinates; rename it first")
        DeltaLogReader.readMapped(spark, path, files, m, "name",
            withRowCoords = true)
          .withColumnRenamed(DeltaLogReader.DvFp, fp)
          .withColumnRenamed(DeltaLogReader.DvPos, pos)
      case None =>
        // same declared-schema typing as the reader: post-ADD-COLUMN
        // generations null-fill, and a predicate naming the new column
        // resolves over EVERY file regardless of footer sampling (same
        // minimal-metaData fallback too)
        val declared = meta.flatMap(m => scala.util.Try(
          org.apache.spark.sql.types.DataType
            .fromJson(m.path("schemaString").asText(""))
            .asInstanceOf[org.apache.spark.sql.types.StructType])
          .toOption.filter(_.fields.nonEmpty))
        val reader = spark.read.option("basePath", path)
        val scan = declared.fold(reader)(reader.schema).parquet(files: _*)
        require(!scan.columns.contains(fp) && !scan.columns.contains(pos),
          s"Delta table at $path has a column named $fp/$pos — colliding with " +
            "the DV scan's internal coordinates; rename it first")
        scan.select(col("*") +: coordCols(scan): _*)
    }
    val perFile = matcher(scanWithCoords)
      .groupBy(col(fp))
      .agg(sort_array(collect_list(col(pos))).as("positions"))

    // existing descriptors ride a broadcast keyed by normalized path so
    // each file's task can union its old bitmap in — QUALIFIED first:
    // the scan side's _metadata.file_path is always a full URI, and an
    // unqualified replay key (relative table path) would silently miss,
    // dropping the old bitmap and resurrecting its rows
    val oldDvByFile: Map[String, String] = entries.collect {
      case (f0, Some(dv)) => (DeletionVectors.normalizePath(
        rootFs.makeQualified(new Path(f0)).toString), dv)
    }.toMap
    val bcOld = spark.sparkContext.broadcast(oldDvByFile)
    val bcConf = spark.sparkContext.broadcast(
      new SerializableHadoopConf(spark.sessionState.newHadoopConf()))
    val tableRoot = qualifiedRoot.toString
    val touched: Seq[(String, String, Long, Long)] = perFile
      .as[(String, Seq[Long])]
      .map { case (file, newPos) =>
        val conf = bcConf.value.value
        val oldDesc = bcOld.value.get(file).map { dvJson =>
          DeletionVectors.parseDescriptor(
            new ObjectMapper().readTree(dvJson))
        }
        val oldPos: Array[Long] = oldDesc match {
          case None => Array.empty
          case Some(d) if d.storageType == "i" =>
            val dec = DeletionVectors.z85Decode(d.pathOrInlineDv)
            DeletionVectors.positions(
              java.util.Arrays.copyOf(dec, d.sizeInBytes), d, file)
          case Some(d) =>
            val p = DeletionVectors.resolveFile(tableRoot, d)
            val dfs = p.getFileSystem(conf)
            val bytes = new Array[Byte](dfs.getFileStatus(p).getLen.toInt)
            val in = dfs.open(p)
            try in.readFully(bytes) finally in.close()
            DeletionVectors.positions(
              DeletionVectors.sliceBlob(bytes, d, file), d, file)
        }
        val union = (oldPos ++ newPos).distinct.sorted
        val bm = DeletionVectors.serialize(union)
        // deterministic per (file, version): re-running a failed commit's
        // tasks rewrites the same sidecar instead of leaking orphans
        val uuid = java.util.UUID.nameUUIDFromBytes(
          s"$file#v$version".getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val dvPath = new Path(tableRoot, s"deletion_vector_$uuid.bin")
        val off = DeletionVectors.writeDvFile(
          dvPath.getFileSystem(conf), dvPath, Seq(bm)).head
        (file,
          DeletionVectors.uDescriptorJson(uuid, off, bm.length, union.length.toLong),
          union.length.toLong, oldPos.length.toLong)
      }
      .collect().toSeq // O(#touched files) planning rows — replay-bounded

    if (touched.isEmpty) return (Nil, Nil, 0L)

    // protocol upgrade when the table does not already declare the
    // feature — MERGING any features the newest protocol action lists,
    // so an upgrade never silently un-declares one
    val log = logDir(spark, path)
    def feats(p: com.fasterxml.jackson.databind.JsonNode, k: String): Seq[String] =
      Option(p.get(k)).toSeq.flatMap(a => (0 until a.size()).map(i => a.get(i).asText()))
    val latestProto = DeltaLogReader.versions(spark, path).reverse.iterator
      .flatMap { cv =>
        DeltaLogReader.readSmallFile(spark, new Path(log, f"$cv%020d.json"))
          .split("\n").filter(_.nonEmpty)
          .map(mapper.readTree).find(_.has("protocol")).map(_.get("protocol"))
      }.take(1).toSeq.headOption
    val protoLine =
      if (latestProto.exists(p => feats(p, "readerFeatures").contains("deletionVectors")))
        Seq.empty
      else {
        // upgrading a LEGACY protocol to table features must enumerate
        // the features the old minReader/minWriterVersion implied
        // (PROTOCOL.md's upgrade rule) — e.g. writer v2's
        // appendOnly/invariants: leaving them unlisted would let
        // external table-features writers stop enforcing them
        val oldMinR = latestProto.map(_.path("minReaderVersion").asInt(1)).getOrElse(1)
        val oldMinW = latestProto.map(_.path("minWriterVersion").asInt(2)).getOrElse(2)
        val (legacyRf, legacyWf) =
          if (oldMinW < 7) legacyImpliedFeatures(oldMinR, oldMinW)
          else (Seq.empty[String], Seq.empty[String])
        val rf = (latestProto.toSeq.flatMap(feats(_, "readerFeatures")) ++
          legacyRf :+ "deletionVectors")
          .distinct.map(jsonStr).mkString("[", ",", "]")
        val wf = (latestProto.toSeq.flatMap(feats(_, "writerFeatures")) ++
          legacyWf :+ "deletionVectors")
          .distinct.map(jsonStr).mkString("[", ",", "]")
        Seq(s"""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":$rf,"writerFeatures":$wf}}""")
      }

    val now = System.currentTimeMillis()
    // touched paths are scheme-NORMALIZED; relativize against the same
    // normalization of the qualified root so authority-bearing URIs
    // (s3://bucket/...) relativize correctly too
    val rootNorm = DeletionVectors.normalizePath(qualifiedRoot.toString).stripSuffix("/")
    val actions = touched.sortBy(_._1).flatMap { case (file, desc, _, _) =>
      require(file.startsWith(rootNorm + "/"),
        s"deleteWhere: scanned file $file is not under table root $rootNorm")
      val rel = file.stripPrefix(rootNorm).stripPrefix("/")
      val st = rootFs.getFileStatus(new Path(root, rel))
      Seq(
        s"""{"remove":{"path":${jsonStr(encodePath(rel))},"deletionTimestamp":$now,"dataChange":true}}""",
        s"""{"add":{"path":${jsonStr(encodePath(rel))},"partitionValues":${partitionValuesJson(rel)},""" +
          s""""size":${st.getLen},"modificationTime":${st.getModificationTime},""" +
          s""""dataChange":true,"deletionVector":$desc}}""")
    }
    (protoLine, actions, touched.map(t => t._3 - t._4).sum)
  }

  /** MoR UPSERT — the q247 Iceberg twin on the Delta log: ONE commit
    * that (a) deletion-vector-kills every existing row whose `keyCols`
    * match a batch key (null-safe, the MERGE semantics) and (b) appends
    * the batch's rows as new files — latest-write-wins per key with NO
    * data file rewritten and the existing table scanned once for the
    * key probe (the probe side is the BATCH: measured, broadcast only
    * under a 10 MB budget, else forced sort-merge — the q230 cutover).
    * Duplicate keys WITHIN the batch all land (the DVs only kill rows
    * from BEFORE this commit); dedupe first if the key is unique.
    *
    * PARTITIONED tables: the appended files land in their hive
    * partitions and the add actions carry the partitionValues; when
    * every partition column is an upsert KEY, the kill scan PRUNES to
    * the batch's partitions — exact, not merely sound: a row in any
    * other partition differs on a partition-sourced key column and
    * could never match (the Iceberg partitioned-upsert reasoning). With
    * a partition column outside the keys, the scan stays whole-table.
    * NAME-mapped tables: keys resolve through the metaData's
    * physicalName map (the scan serves logical names; the appended
    * parquet carries physical names, the write() projection).
    * Refused: id-mode mapping, mapping combined with CDF or with
    * partition columns, a batch whose schema drifts from the table's.
    * @return (committed version, rows superseded by DV) */
  def upsert(spark: SparkSession, path: String, df: DataFrame,
             keyCols: Seq[String]): (Long, Long) = {
    import org.apache.spark.sql.functions.{broadcast, col}
    require(keyCols.nonEmpty, "upsert needs at least one key column")
    val root = new Path(path)
    val (entries, meta) = DeltaLogReader.replayState(spark, path, None)
    if (entries.isEmpty) throw new EmptyTableException(
      s"Delta table at $path has no active files — create it with write() first")
    val metaNode = meta.getOrElse(throw new IllegalArgumentException(
      s"Delta log at $path carries no metaData action — cannot validate " +
        "the upsert schema; refusing"))
    val mapMode = DeltaLogReader.mappingMode(metaNode)
    require(mapMode == "none" || mapMode == "name",
      s"Delta table at $path uses id-mode column mapping — upsert " +
        "resolves name mode only; refusing")
    val partCols: Seq[String] = {
      val pc = metaNode.path("partitionColumns")
      (0 until pc.size()).map(pc.get(_).asText())
    }
    require(mapMode == "none" || partCols.isEmpty,
      s"Delta table at $path combines column mapping with partition " +
        "columns — the mapped scan does not reconstruct partition values; " +
        "refusing")
    require(mapMode == "none" || !cdfEnabled(metaNode),
      s"Delta table at $path combines column mapping with Change Data " +
        "Feed — publishing change files under mapping is not implemented; " +
        "refusing")
    val tableSchema = org.apache.spark.sql.types.DataType
      .fromJson(metaNode.get("schemaString").asText())
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    require(df.columns.toSeq == tableSchema.fieldNames.toSeq,
      s"upsert schema ${df.columns.mkString("(", ", ", ")")} does not match " +
        s"the table's ${tableSchema.fieldNames.mkString("(", ", ", ")")} — " +
        "schema evolution is a separate operation")
    // names are not enough: a type-drifted batch would COMMIT parquet
    // the table's own footer-typed reads can no longer open (poisoned
    // after success) — refuse pre-commit like the Iceberg twin
    val typeDrift = df.schema.fields.zip(tableSchema.fields).collect {
      case (a, b) if a.dataType != b.dataType =>
        s"${a.name}: ${a.dataType.simpleString} vs ${b.dataType.simpleString}"
    }
    require(typeDrift.isEmpty,
      s"upsert batch types drift from the table's: ${typeDrift.mkString("; ")}" +
        " — schema evolution is a separate operation")
    val missing = keyCols.filterNot(tableSchema.fieldNames.contains)
    require(missing.isEmpty,
      s"upsert key column(s) ${missing.mkString(", ")} are not columns of " +
        s"the table (${tableSchema.fieldNames.mkString(", ")})")

    val version = DeltaLogReader.latestVersion(spark, path).get + 1

    // the key probe: MEASURE the batch's distinct key set, broadcast
    // only under budget, else force sort-merge — the checkpointed leaf
    // keeps no stats, so without the hint Spark could still auto-
    // broadcast the frame the guard exists to bound
    val keys = df.select(keyCols.map(col): _*).distinct()
      .localCheckpoint(true).alias("__up_k")
    val nKeys = keys.count()
    // per-row estimate from the key schema's declared widths (strings
    // count their defaultSize) + row overhead — a 3-string-column key
    // must not sneak under a budget tuned for one long
    val keyRowBytes = keys.schema.map(_.dataType.defaultSize).sum + 16L
    val underBudget = nKeys * keyRowBytes <= 10L * 1024 * 1024
    val matcher: DataFrame => DataFrame = { scanned =>
      val t = scanned.alias("__up_t")
      val cond = keyCols.map(k =>
        col(s"__up_t.`$k`") <=> col(s"__up_k.`$k`")).reduce(_ && _)
      if (underBudget) t.join(broadcast(keys), cond, "left_semi")
      else t.join(keys.hint("merge"), cond, "left_semi")
    }
    // partition-pruned kill scan: when every partition column is an
    // upsert key, a row outside the batch's partitions differs on a
    // key column and can never match — skip its file entirely. Gated
    // on the same measured budget as the key broadcast (collecting the
    // batch's partition tuples is driver-side planning data) and on
    // string-faithful partition types (hive path values round-trip
    // exactly for atomic non-float types; anything else keeps the
    // whole-table scan, the sound direction).
    val prunableTypes: Set[org.apache.spark.sql.types.DataType] = {
      import org.apache.spark.sql.types._
      Set(StringType, LongType, IntegerType, ShortType, ByteType,
        BooleanType, DateType)
    }
    val scanEntries: Seq[(String, Option[String])] =
      if (partCols.isEmpty || !partCols.forall(keyCols.contains) ||
          !underBudget ||
          !partCols.forall(c => prunableTypes(tableSchema(c).dataType))) entries
      else {
        val batchParts: Set[Seq[String]] = df
          .select(partCols.map(c => col(c).cast("string")): _*)
          .distinct().collect()
          .map(r => partCols.indices.map(i =>
            if (r.isNullAt(i)) "__HIVE_DEFAULT_PARTITION__" else r.getString(i)))
          .toSet
        val rootNorm = normRoot(fs(spark, root), root)
        entries.filter { case (abs, _) =>
          val rel = normAbs(fs(spark, root), abs).stripPrefix(rootNorm).stripPrefix("/")
          val segs = rel.split("/").dropRight(1).filter(_.contains("=")).map { seg =>
            val i = seg.indexOf('=')
            (DeltaLogReader.percentDecode(seg.substring(0, i)),
              DeltaLogReader.percentDecode(seg.substring(i + 1)))
          }.toMap
          // a file whose path does not spell every partition column is
          // kept (scanned) rather than guessed about
          partCols.exists(!segs.contains(_)) ||
            batchParts.contains(partCols.map(segs))
        }
      }
    val (protoLine, dvActions, nDeleted) =
      if (scanEntries.isEmpty) (Seq.empty[String], Seq.empty[String], 0L)
      else dvAttachActions(spark, path, scanEntries, version, matcher, meta)

    // the appended rows — published before the commit names them,
    // invisible until it does (Delta's own visibility rule). A mapped
    // table's parquet must carry PHYSICAL names (the write() projection);
    // a partitioned table's parts land in their hive dirs and the adds
    // parse the partitionValues back off the path.
    val toAppend =
      if (mapMode == "name")
        df.toDF(tableSchema.fields.map(
          _.metadata.getString("delta.columnMapping.physicalName")): _*)
      else df
    val rootFs = fs(spark, root)
    val newFiles = publishParts(spark, root, toAppend, version, partCols)
    val adds = newFiles.map { rel =>
      val st = rootFs.getFileStatus(new Path(root, rel))
      s"""{"add":{"path":${jsonStr(encodePath(rel))},"partitionValues":${partitionValuesJson(rel)},""" +
        s""""size":${st.getLen},"modificationTime":${st.getModificationTime},""" +
        s""""dataChange":true}}"""
    }
    if (dvActions.isEmpty && adds.isEmpty) return (version - 1, 0L)
    // CDF: MERGE change rows are not derivable from actions (the new
    // files mix updates with inserts; the kills hide in DV bitmaps), so
    // publish them explicitly — matched old rows as update_preimage,
    // their batch replacements as update_postimage, unmatched batch
    // rows as insert (the delta-spark CDC classification)
    val cdcLines =
      if (!cdfEnabled(metaNode)) Seq.empty[String]
      else {
        import org.apache.spark.sql.functions.lit
        require(!tableSchema.fieldNames.contains("_change_type"),
          s"Delta table at $path has a _change_type column — colliding " +
            "with the Change Data Feed schema; rename it first")
        val pre = matcher(DeltaLogReader.read(spark, path))
        val matchedKeys = pre.select(keyCols.map(col): _*).distinct()
          .localCheckpoint(true).alias("__up_mk")
        def keyCond(side: DataFrame) = keyCols.map(k =>
          side(k) <=> col(s"__up_mk.`$k`")).reduce(_ && _)
        // same measured broadcast-or-merge cutover as the key probe —
        // matchedKeys is a subset of the batch keys the budget sized
        def probeJoin(b: DataFrame, typ: String) =
          if (underBudget) b.join(broadcast(matchedKeys), keyCond(b), typ)
          else b.join(matchedKeys.hint("merge"), keyCond(b), typ)
        val batch = df.alias("__up_b")
        val post = probeJoin(batch, "left_semi")
        val ins = probeJoin(batch, "left_anti")
        publishChangeData(spark, root, version,
          pre.withColumn("_change_type", lit("update_preimage"))
            .unionByName(post.withColumn("_change_type", lit("update_postimage")))
            .unionByName(ins.withColumn("_change_type", lit("insert"))))
      }
    val commit = new Path(logDir(spark, path), f"$version%020d.json")
    require(!rootFs.exists(commit),
      s"Delta commit v$version already exists at $path — concurrent writer, refusing to clobber")
    writeAtomic(spark, commit,
      (protoLine ++ dvActions ++ adds ++ cdcLines).mkString("", "\n", "\n"))
    (version, nDeleted)
  }

  /** RESTORE — Delta's `RESTORE TABLE ... TO VERSION` semantics: one
    * commit whose remove/add actions turn the CURRENT active file set
    * back into version `toVersion`'s, deletion-vector attachments
    * included (a restored file re-adds with the descriptor it carried
    * THEN). Pure file-set surgery at planning altitude — no data moves;
    * history stays intact, so the pre-restore state remains
    * time-travelable and the restore itself is a version. Refuses when
    * any target file is gone from disk (vacuumed past the restore
    * point — the add would commit a read-time corpse) or lives outside
    * the table root. Restoring to the current state is a no-op.
    * @return the committed version (current when nothing changed) */
  def restore(spark: SparkSession, path: String, toVersion: Long): Long = {
    val root = new Path(path)
    val f = fs(spark, root)
    val (curEntries, curMeta) = DeltaLogReader.replayState(spark, path, None)
    val (tgtEntries, tgtMeta) = DeltaLogReader.replayState(spark, path, Some(toVersion))
    // the file-set surgery below keeps the CURRENT metaData active
    // (later-wins replay) — if the metadata evolved after the restore
    // point, the restored files would be served through a mapping/
    // schema they never carried; refuse rather than serve wrong columns
    require(curMeta.map(_.toString) == tgtMeta.map(_.toString),
      s"cannot restore $path to v$toVersion: the table's metaData " +
        "changed after that version (schema/mapping evolution) — this " +
        "writer restores the FILE SET only and would serve the old " +
        "files through the new metadata; refusing")
    val latest = DeltaLogReader.latestVersion(spark, path).get
    val cur = curEntries.toMap
    val tgt = tgtEntries.toMap
    val removes = curEntries.collect {
      case (p0, _) if !tgt.contains(p0) => p0
    }
    // re-add what the target had and the current state lacks — or
    // carries with a DIFFERENT DV (a re-add replaces the entry, the
    // protocol's attach-without-rewrite spelling)
    val adds = tgtEntries.filter { case (p0, dv) =>
      cur.get(p0) match {
        case None => true
        case Some(curDv) => curDv != dv
      }
    }
    if (removes.isEmpty && adds.isEmpty) return latest

    def relOf(abs: String): String = relativizeUnderRoot(f, root, abs,
      s"restore at $path: file $abs is outside the table root — " +
        "only self-contained tables restore")
    // ONE status call per re-added file: it doubles as the gone-from-
    // disk refusal (vacuumed past the restore point) AND feeds the add
    // line's size/mtime — and the DV SIDECARS the re-attached
    // descriptors point at must exist too, or the committed version is
    // a read-time corpse
    val statuses = adds.map { case (abs, dv) =>
      val st = try f.getFileStatus(new Path(abs)) catch {
        case _: java.io.FileNotFoundException =>
          throw new IllegalArgumentException(
            s"cannot restore $path to v$toVersion: its file $abs is gone " +
              "from disk (vacuumed past the restore point) — the restored " +
              "version is unrecoverable")
      }
      dv.foreach { dvJson =>
        val d = DeletionVectors.parseDescriptor(mapper.readTree(dvJson))
        if (d.storageType != "i") {
          val bin = DeletionVectors.resolveFile(path, d)
          require(f.exists(bin),
            s"cannot restore $path to v$toVersion: its deletion-vector " +
              s"sidecar $bin is gone from disk (vacuumed past the restore " +
              "point) — the restored version is unrecoverable")
        }
      }
      (abs, dv, st)
    }
    val version = latest + 1
    // CDF: a restore's add/remove actions under-describe the LOGICAL
    // change (a re-added file may shed a DV — only some of its rows
    // "return"; a removed DV-carrying file's dead rows were never
    // alive), so the commit must carry its change data: the multiset
    // diff of the two logical states (exceptAll keeps duplicate
    // multiplicity). An empty side reads as the empty diff leg.
    val cdcLines =
      if (!curMeta.exists(cdfEnabled)) Seq.empty[String]
      else {
        import org.apache.spark.sql.functions.lit
        val cols = org.apache.spark.sql.types.DataType
          .fromJson(curMeta.get.get("schemaString").asText())
          .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames
        require(!cols.contains("_change_type"),
          s"Delta table at $path has a _change_type column — colliding " +
            "with the Change Data Feed schema; rename it first")
        val pre = if (curEntries.isEmpty) None
          else Some(DeltaLogReader.read(spark, path))
        val post = if (tgtEntries.isEmpty) None
          else Some(DeltaLogReader.read(spark, path, asOf = Some(toVersion)))
        val deleted = (pre, post) match {
          case (Some(a), Some(b)) => Some(a.exceptAll(b))
          case (a, None) => a
          case (None, _) => None
        }
        val inserted = (pre, post) match {
          case (Some(a), Some(b)) => Some(b.exceptAll(a))
          case (None, b) => b
          case (_, None) => None
        }
        val changes = (
          deleted.map(_.withColumn("_change_type", lit("delete"))).toSeq ++
          inserted.map(_.withColumn("_change_type", lit("insert"))).toSeq)
          .reduce(_.unionByName(_))
        publishChangeData(spark, root, version, changes)
      }
    val now = System.currentTimeMillis()
    val removeLines = removes.map { abs =>
      s"""{"remove":{"path":${jsonStr(encodePath(relOf(abs)))},"deletionTimestamp":$now,"dataChange":true}}"""
    }
    val addLines = statuses.map { case (abs, dv, st) =>
      val rel = relOf(abs)
      val dvPart = dv.map(d => s""","deletionVector":$d""").getOrElse("")
      s"""{"add":{"path":${jsonStr(encodePath(rel))},"partitionValues":${partitionValuesJson(rel)},""" +
        s""""size":${st.getLen},"modificationTime":${st.getModificationTime},""" +
        s""""dataChange":true$dvPart}}"""
    }
    val commit = new Path(logDir(spark, path), f"$version%020d.json")
    require(!f.exists(commit),
      s"Delta commit v$version already exists at $path — concurrent writer, refusing to clobber")
    writeAtomic(spark, commit,
      (removeLines ++ addLines ++ cdcLines).mkString("", "\n", "\n"))
    version
  }

  /** LOG TRUNCATION — the retention step [[checkpoint]] enables: delete
    * every commit JSON strictly BELOW the checkpointed version (state
    * replays from the checkpoint parquet + later commits; the reader
    * refuses gap-without-checkpoint logs, so this is the only safe
    * truncation point). Time travel to pruned versions fails afterwards
    * — the same contract as [[vacuum]]'s on data files. No checkpoint →
    * loud refusal, never a blind delete. Returns the number of commit
    * files pruned. */
  def cleanLog(spark: SparkSession, path: String): Int = {
    val log = logDir(spark, path)
    val f = fs(spark, log)
    val ptr = new Path(log, "_last_checkpoint")
    require(f.exists(ptr),
      s"Delta log at $path has no _last_checkpoint — truncating without " +
        "a checkpoint would leave an unreplayable log; checkpoint first")
    val ckpt = mapper.readTree(DeltaLogReader.readSmallFile(spark, ptr))
      .path("version").asLong(-1L)
    require(ckpt >= 0, s"_last_checkpoint at $path carries no version")
    // the one IRREVERSIBLE step must verify the parquet it strands the
    // log on actually exists — a stale pointer (crash between a
    // re-checkpoint's delete and rename) would otherwise turn
    // truncation into permanent loss of the pre-checkpoint state
    val single = new Path(log, f"$ckpt%020d.checkpoint.parquet")
    val hasCkpt = f.exists(single) || f.globStatus(new Path(log,
        f"$ckpt%020d.checkpoint.??????????.??????????.parquet")).nonEmpty
    require(hasCkpt,
      s"_last_checkpoint at $path points at v$ckpt but no checkpoint " +
        "parquet exists — truncating would permanently lose the log; " +
        "re-run checkpoint() first")
    val pruned = DeltaLogReader.versions(spark, path).filter(_ < ckpt)
      .count { v =>
        f.delete(new Path(log, f"$v%020d.json"), false)
      }
    pruned
  }

  /** Authority-preserving normalized spelling of the table root /
    * an absolute path (the dvAttachActions convention): scheme drops,
    * bucket/authority stays as the leading segment, so same-named
    * paths in different buckets never alias. */
  private def normRoot(f: org.apache.hadoop.fs.FileSystem, root: Path): String =
    DeletionVectors.normalizePath(f.makeQualified(root).toString).stripSuffix("/")

  private def normAbs(f: org.apache.hadoop.fs.FileSystem, abs: String): String =
    DeletionVectors.normalizePath(f.makeQualified(new Path(abs)).toString)

  /** Root-relative spelling of `abs`, refusing out-of-root paths with
    * the caller's message. */
  private def relativizeUnderRoot(f: org.apache.hadoop.fs.FileSystem,
                                  root: Path, abs: String, msg: => String): String = {
    val rootNorm = normRoot(f, root)
    val n = normAbs(f, abs)
    require(n.startsWith(rootNorm + "/"), msg)
    n.stripPrefix(rootNorm).stripPrefix("/")
  }

  private def logDir(spark: SparkSession, path: String): Path =
    new Path(path, "_delta_log")

  /** Hadoop `Configuration` is not `Serializable`; this minimal wrapper
    * ships it to the executors writing DV sidecars (the same
    * write/readFields trick Spark uses internally). */
  private class SerializableHadoopConf(
      @transient var value: org.apache.hadoop.conf.Configuration)
    extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      value.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      value = new org.apache.hadoop.conf.Configuration(false)
      value.readFields(in)
    }
  }
}
