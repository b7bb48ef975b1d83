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

  private def writeAtomic(spark: SparkSession, target: Path, content: String): Unit = {
    val f = fs(spark, target)
    val tmp = new Path(target.getParent, s".${target.getName}.tmp")
    val out = f.create(tmp, true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    require(f.rename(tmp, target),
      s"Delta commit rename failed (concurrent writer?): $target")
  }

  private def jsonStr(s: String): String = mapper.writeValueAsString(s)

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

    // data files: an ordinary distributed parquet append — Spark's UUID
    // part names never collide with prior commits, so the before/after
    // (recursive, for hive-partitioned layouts) listing diff identifies
    // exactly this write's files. Paths are RELATIVE to the table root,
    // the protocol's spelling.
    def dataFiles(): Set[String] = {
      if (!f.exists(root)) return Set.empty
      val rootUri = root.toUri.getPath.stripSuffix("/")
      val out = scala.collection.mutable.Set.empty[String]
      def walk(p: Path): Unit = f.listStatus(p).foreach { st =>
        val n = st.getPath.getName
        // skip the log plus hidden/temp dirs (_delta_log, _temporary, .tmp*)
        if (st.isDirectory) { if (!n.startsWith("_") && !n.startsWith(".")) walk(st.getPath) }
        else if (n.endsWith(".parquet"))
          out += st.getPath.toUri.getPath.stripPrefix(rootUri).stripPrefix("/")
      }
      walk(root)
      require(out.size <= graft.operators.ManifestGuard.MaxPlannedFiles,
        s"Delta write planning at $path listed ${out.size} data files — past " +
          "the planning cap; compact the table before writing through this writer")
      out.toSet
    }
    val before = dataFiles()
    val writer = df.write.mode(SaveMode.Append)
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
      .parquet(path)
    val newFiles = (dataFiles() -- before).toSeq.sorted
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
    // absolute paths; the protocol stores root-relative ones)
    val rootUri = root.toUri.getPath.stripSuffix("/")
    val removes = prevActive.map { abs =>
      val rel = new Path(abs).toUri.getPath.stripPrefix(rootUri).stripPrefix("/")
      s"""{"remove":{"path":${jsonStr(rel)},"deletionTimestamp":$now,"dataChange":true}}"""
    }
    // partitionValues parsed back from the hive path segments (k=v dirs),
    // percent-decoded like every Delta writer records them
    val adds = newFiles.map { rel =>
      val st = f.getFileStatus(new Path(root, rel))
      val pv = rel.split("/").dropRight(1).filter(_.contains("="))
        .map { seg =>
          val i = seg.indexOf('=')
          val k = java.net.URLDecoder.decode(seg.substring(0, i), "UTF-8")
          val v = java.net.URLDecoder.decode(seg.substring(i + 1), "UTF-8")
          s"${jsonStr(k)}:${jsonStr(v)}"
        }.mkString("{", ",", "}")
      s"""{"add":{"path":${jsonStr(rel)},"partitionValues":$pv,""" +
        s""""size":${st.getLen},"modificationTime":${st.getModificationTime},""" +
        s""""dataChange":true}}"""
    }
    val commit = new Path(new Path(root, "_delta_log"), f"$version%020d.json")
    require(!f.exists(commit),
      s"Delta commit v$version already exists at $path — concurrent writer, refusing to clobber")
    f.mkdirs(commit.getParent)
    writeAtomic(spark, commit, (header ++ removes ++ adds).mkString("", "\n", "\n"))
    version
  }

  /** Compact the CURRENT active-file state into a single-part
    * `%020d.checkpoint.parquet` + the `_last_checkpoint` pointer, so
    * readers replay from the checkpoint instead of the full commit
    * history (and older commits become prunable). */
  def checkpoint(spark: SparkSession, path: String): Long = {
    import spark.implicits._
    val latest = DeltaLogReader.latestVersion(spark, path)
    require(latest.nonEmpty, s"no Delta log at $path to checkpoint")
    val v = latest.get
    val active = DeltaLogReader.activeFiles(spark, path)
    val log = new Path(path, "_delta_log")
    val f = fs(spark, log)
    // single-part checkpoint: rows of add structs (the protocol's
    // compacted-state schema subset the reader honors)
    val tmp = new Path(log, ".tmp_checkpoint")
    f.delete(tmp, true)
    // re-relativize against the table root (NOT getName — a partitioned
    // file's hive segments are part of its protocol path)
    val rootUri = new Path(path).toUri.getPath.stripSuffix("/")
    active.map(abs => new Path(abs).toUri.getPath
        .stripPrefix(rootUri).stripPrefix("/")).toDF("p")
      .selectExpr("named_struct('path', p) AS add",
        "CAST(NULL AS STRUCT<path: STRING>) AS remove")
      .coalesce(1).write.parquet(tmp.toString)
    val part = f.listStatus(tmp)
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .head.getPath
    val target = new Path(log, f"$v%020d.checkpoint.parquet")
    f.delete(target, false)
    require(f.rename(part, target), s"checkpoint rename failed: $target")
    f.delete(tmp, true)
    writeAtomic(spark, new Path(log, "_last_checkpoint"),
      s"""{"version":$v,"size":${active.size}}""" + "\n")
    v
  }
}
