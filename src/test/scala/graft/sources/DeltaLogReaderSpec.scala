package graft.sources

import graft.SparkSpec
import graft.operators.SnapshotLog
import org.apache.spark.sql.functions._

/** The read-only `_delta_log` interpreter against hand-assembled tables
  * following the public protocol: add/remove replay, checkpoint resume
  * after log truncation, version pinning, and content equality with the
  * repo's own SnapshotLog over the same commit history. */
class DeltaLogReaderSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("delta").toString

  /** Write `df` as ONE parquet file named `name` at the table root. */
  private def dataFile(base: String, name: String,
                       df: org.apache.spark.sql.DataFrame): Unit = {
    val tmp = new java.io.File(base, s".tmp_$name").toString
    df.coalesce(1).write.parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).head
    assert(part.renameTo(new java.io.File(base, name)))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
  }

  private def writeCommit(base: String, v: Long, lines: Seq[String]): Unit = {
    val log = new java.io.File(base, "_delta_log")
    log.mkdirs()
    java.nio.file.Files.writeString(
      new java.io.File(log, f"$v%020d.json").toPath, lines.mkString("", "\n", "\n"))
  }

  private def add(f: String) =
    s"""{"add":{"path":"$f","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}"""
  private def remove(f: String) =
    s"""{"remove":{"path":"$f","deletionTimestamp":0,"dataChange":true}}"""

  private def idsOf(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").collect().map(_.getLong(0)).toSet

  test("add/remove replay resolves the active set; asOf pins a version") {
    val base = freshDir()
    dataFile(base, "a.parquet", Seq(1L, 2L).toDF("id"))
    dataFile(base, "b.parquet", Seq(3L, 4L).toDF("id"))
    dataFile(base, "c.parquet", Seq(5L).toDF("id"))
    writeCommit(base, 0L, Seq(add("a.parquet"), add("b.parquet")))
    writeCommit(base, 1L, Seq(add("c.parquet"), remove("a.parquet")))
    assert(idsOf(graft.Tables.deltaTable(spark, base)) == Set(3L, 4L, 5L))
    assert(idsOf(graft.Tables.deltaTable(spark, base, asOf = Some(0L))) ==
      Set(1L, 2L, 3L, 4L))
    intercept[IllegalArgumentException] {
      graft.Tables.deltaTable(spark, base, asOf = Some(7L))
    }
  }

  test("timestamp travel: mtime rule, monotonicity adjustment, ICT wins, refusal") {
    val base = freshDir()
    dataFile(base, "a.parquet", Seq(1L).toDF("id"))
    dataFile(base, "b.parquet", Seq(2L).toDF("id"))
    dataFile(base, "c.parquet", Seq(3L).toDF("id"))
    writeCommit(base, 0L, Seq(add("a.parquet")))
    writeCommit(base, 1L, Seq(add("b.parquet")))
    // v2 carries inCommitTimestamp — authoritative over any mtime
    writeCommit(base, 2L, Seq(
      """{"commitInfo":{"timestamp":1,"inCommitTimestamp":9000}}""",
      add("c.parquet")))
    def commitFile(v: Long) =
      new java.io.File(new java.io.File(base, "_delta_log"), f"$v%020d.json")
    // OUT-OF-ORDER mtimes: v0 @ 5000, v1 @ 4000 → v1 adjusts to 5001
    assert(commitFile(0L).setLastModified(5000L))
    assert(commitFile(1L).setLastModified(4000L))
    assert(commitFile(2L).setLastModified(1L)) // ignored: ICT wins
    assert(DeltaLogReader.commitTimestamps(spark, base) ==
      Seq((0L, 5000L), (1L, 5001L), (2L, 9000L)))
    def at(ts: Long): Set[Long] =
      idsOf(DeltaLogReader.readAsOfTimestamp(spark, base, ts))
    assert(at(5000L) == Set(1L))
    assert(at(5001L) == Set(1L, 2L))
    assert(at(8999L) == Set(1L, 2L))
    assert(at(9000L) == Set(1L, 2L, 3L))
    assert(at(Long.MaxValue) == Set(1L, 2L, 3L))
    val e = intercept[IllegalArgumentException](
      DeltaLogReader.readAsOfTimestamp(spark, base, 4999L))
    assert(e.getMessage.contains("5000"), e.getMessage)
  }

  test("checkpoint resume: pre-checkpoint commits may be truncated away") {
    val base = freshDir()
    dataFile(base, "a.parquet", Seq(1L).toDF("id"))
    dataFile(base, "b.parquet", Seq(2L).toDF("id"))
    dataFile(base, "c.parquet", Seq(3L).toDF("id"))
    writeCommit(base, 0L, Seq(add("a.parquet"), add("b.parquet")))
    writeCommit(base, 1L, Seq(remove("a.parquet")))
    // single-part checkpoint of v1's compacted state + the pointer
    val log = new java.io.File(base, "_delta_log")
    val ckTmp = new java.io.File(log, ".tmp_ck").toString
    Seq("b.parquet").toDF("p")
      .selectExpr("named_struct('path', p) AS add",
        "CAST(NULL AS STRUCT<path: STRING>) AS remove")
      .coalesce(1).write.parquet(ckTmp)
    val part = new java.io.File(ckTmp).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).head
    assert(part.renameTo(new java.io.File(log, f"${1L}%020d.checkpoint.parquet")))
    java.nio.file.Files.writeString(
      new java.io.File(log, "_last_checkpoint").toPath, """{"version":1,"size":1}""")
    writeCommit(base, 2L, Seq(add("c.parquet")))
    // the real-world shape: the retention job deleted the old JSON commits
    assert(new java.io.File(log, f"${0L}%020d.json").delete())
    assert(new java.io.File(log, f"${1L}%020d.json").delete())
    assert(idsOf(graft.Tables.deltaTable(spark, base)) == Set(2L, 3L))
  }

  test("cross-check: DeltaLogReader content equals SnapshotLog over the same history") {
    // the same commit sequence written both ways must read back identically
    val ev = (0L until 40L).map(i => (i, if (i % 2 == 0) "x" else "y"))
      .toDF("id", "k")
    val snap = freshDir() + "/t"
    SnapshotLog.commit(spark, snap, ev.where($"k" === "x"), overwrite = false)
    SnapshotLog.commit(spark, snap, ev.where($"k" === "y"), overwrite = false)
    val delta = freshDir()
    dataFile(delta, "x.parquet", ev.where($"k" === "x"))
    dataFile(delta, "y.parquet", ev.where($"k" === "y"))
    writeCommit(delta, 0L, Seq(add("x.parquet")))
    writeCommit(delta, 1L, Seq(add("y.parquet")))
    // latest vs latest, and each pinned version vs its snapshot twin
    val viaDelta = graft.Tables.deltaTable(spark, delta)
    val viaSnap = SnapshotLog.read(spark, snap)
    assert(viaDelta.exceptAll(viaSnap).count() == 0 &&
      viaSnap.exceptAll(viaDelta).count() == 0)
    val v1Delta = graft.Tables.deltaTable(spark, delta, asOf = Some(0L))
    val v1Snap = SnapshotLog.readVersion(spark, snap, 1)
    assert(v1Delta.exceptAll(v1Snap).count() == 0 &&
      v1Snap.exceptAll(v1Delta).count() == 0)
  }

  test("multi-part checkpoint parts union into one compacted state") {
    val base = freshDir()
    dataFile(base, "a.parquet", Seq(1L).toDF("id"))
    dataFile(base, "b.parquet", Seq(2L).toDF("id"))
    writeCommit(base, 0L, Seq(add("a.parquet"), add("b.parquet")))
    val log = new java.io.File(base, "_delta_log")
    // two parts, one add each — the %020d.checkpoint.%010d.%010d spelling
    Seq(("a.parquet", 1), ("b.parquet", 2)).foreach { case (file, part) =>
      val tmp = new java.io.File(log, s".tmp_ck$part").toString
      Seq(file).toDF("p")
        .selectExpr("named_struct('path', p) AS add",
          "CAST(NULL AS STRUCT<path: STRING>) AS remove")
        .coalesce(1).write.parquet(tmp)
      val pf = new java.io.File(tmp).listFiles()
        .filter(f => f.isFile && f.getName.endsWith(".parquet")).head
      assert(pf.renameTo(new java.io.File(log,
        f"${0L}%020d.checkpoint.$part%010d.${2}%010d.parquet")))
    }
    java.nio.file.Files.writeString(
      new java.io.File(log, "_last_checkpoint").toPath,
      """{"version":0,"size":2,"parts":2}""")
    assert(new java.io.File(log, f"${0L}%020d.json").delete())
    assert(idsOf(graft.Tables.deltaTable(spark, base)) == Set(1L, 2L))
  }

  test("hive-partitioned data paths read with partition columns intact") {
    // Delta add.path entries for a partitioned table point under k=.../;
    // basePath-rooted reads must surface the partition column
    val base = freshDir()
    new java.io.File(base, "k=x").mkdirs()
    new java.io.File(base, "k=y").mkdirs()
    dataFile(s"$base/k=x", "p1.parquet", Seq(1L, 2L).toDF("id"))
    dataFile(s"$base/k=y", "p2.parquet", Seq(3L).toDF("id"))
    writeCommit(base, 0L, Seq(add("k=x/p1.parquet"), add("k=y/p2.parquet")))
    writeCommit(base, 1L, Seq(remove("k=x/p1.parquet")))
    val latest = graft.Tables.deltaTable(spark, base)
    assert(latest.columns.toSet == Set("id", "k"))
    assert(latest.select("id", "k").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      == Set((3L, "y")))
    val v0 = graft.Tables.deltaTable(spark, base, asOf = Some(0L))
    assert(idsOf(v0) == Set(1L, 2L, 3L))
  }

  test("a version gap in the commit sequence refuses the read") {
    val base = freshDir()
    dataFile(base, "a.parquet", Seq(1L).toDF("id"))
    dataFile(base, "c.parquet", Seq(3L).toDF("id"))
    writeCommit(base, 0L, Seq(add("a.parquet")))
    writeCommit(base, 2L, Seq(add("c.parquet"))) // 1.json missing
    val e = intercept[IllegalArgumentException] {
      graft.Tables.deltaTable(spark, base)
    }
    assert(e.getMessage.contains("version gaps"))
  }

  test("a path with no _delta_log refuses loudly") {
    val e = intercept[IllegalArgumentException] {
      graft.Tables.deltaTable(spark, freshDir())
    }
    assert(e.getMessage.contains("_delta_log"))
  }

  // ---- feature gating: a minimal interpreter must refuse, loudly, any
  // table whose CORRECT reading needs protocol machinery it lacks —
  // proceeding would mean wrong rows (resurrected deletes, physical
  // column names), not an error somewhere downstream.

  // ---- deletion vectors: READ, not refused (the protocol's
  // merge-on-read) — the bitmap formats themselves are law-tested in
  // DeletionVectorsSpec; here the reader-level semantics.

  private val dvProtocol =
    """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"]}}"""

  private def addWithDv(f: String, dv: String) =
    s"""{"add":{"path":"$f","partitionValues":{},"size":1,"modificationTime":0,"dataChange":false,"deletionVector":$dv}}"""

  /** Write a sorted single-file table 0..9 and a sidecar DV deleting
    * the given positions; returns (tableRoot, descriptorJson). */
  private def dvFixture(positions: Array[Long], prefix: String = ""): (String, String) = {
    val base = freshDir()
    dataFile(base, "a.parquet",
      (0L until 10L).toDF("id").coalesce(1).sortWithinPartitions("id"))
    val bm = DeletionVectors.serialize(positions)
    val uuid = java.util.UUID.nameUUIDFromBytes("spec-dv".getBytes)
    val dir = new org.apache.hadoop.fs.Path(base, if (prefix.isEmpty) "." else prefix)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(dir)
    val off = DeletionVectors.writeDvFile(fs,
      new org.apache.hadoop.fs.Path(dir, s"deletion_vector_$uuid.bin"), Seq(bm)).head
    (base, DeletionVectors.uDescriptorJson(uuid, off, bm.length,
      positions.length.toLong, prefix))
  }

  test("a sidecar DV drops exactly its positions; re-add replaces; asOf predates it") {
    val (base, dv) = dvFixture(Array(0L, 3L, 7L))
    writeCommit(base, 0L, Seq(dvProtocol, add("a.parquet")))
    writeCommit(base, 1L, Seq(addWithDv("a.parquet", dv)))
    assert(idsOf(graft.Tables.deltaTable(spark, base)) ==
      Set(1L, 2L, 4L, 5L, 6L, 8L, 9L))
    // version 0 predates the DV attach — the whole file is live
    assert(idsOf(graft.Tables.deltaTable(spark, base, asOf = Some(0L))) ==
      (0L until 10L).toSet)
  }

  test("a DV in a prefix directory resolves through the packed path") {
    val (base, dv) = dvFixture(Array(5L), prefix = "ab/")
    writeCommit(base, 0L, Seq(dvProtocol, addWithDv("a.parquet", dv)))
    assert(idsOf(graft.Tables.deltaTable(spark, base)) ==
      (0L until 10L).toSet - 5L)
  }

  test("an inline ('i') DV decodes from the log line itself") {
    val base = freshDir()
    dataFile(base, "a.parquet",
      (0L until 10L).toDF("id").coalesce(1).sortWithinPartitions("id"))
    val bm = DeletionVectors.serialize(Array(2L, 9L))
    val dv = s"""{"storageType":"i","pathOrInlineDv":"${DeletionVectors.z85EncodePad(bm)}","sizeInBytes":${bm.length},"cardinality":2}"""
    writeCommit(base, 0L, Seq(dvProtocol, addWithDv("a.parquet", dv)))
    assert(idsOf(graft.Tables.deltaTable(spark, base)) ==
      (0L until 10L).toSet -- Set(2L, 9L))
  }

  test("a 'p' (absolute-path) DV resolves verbatim") {
    val base = freshDir()
    dataFile(base, "a.parquet",
      (0L until 10L).toDF("id").coalesce(1).sortWithinPartitions("id"))
    val bm = DeletionVectors.serialize(Array(1L))
    val ext = new org.apache.hadoop.fs.Path(freshDir(), "dv.bin")
    val fs = ext.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val off = DeletionVectors.writeDvFile(fs, ext, Seq(bm)).head
    val dv = s"""{"storageType":"p","pathOrInlineDv":"$ext","offset":$off,"sizeInBytes":${bm.length},"cardinality":1}"""
    writeCommit(base, 0L, Seq(dvProtocol, addWithDv("a.parquet", dv)))
    assert(idsOf(graft.Tables.deltaTable(spark, base)) ==
      (0L until 10L).toSet - 1L)
  }

  test("a corrupt or misdescribed DV fails loudly, never a partial read") {
    val (base, dv) = dvFixture(Array(0L, 3L, 7L))
    // descriptor cardinality disagreeing with the bitmap
    val lying = dv.replace("\"cardinality\":3", "\"cardinality\":4")
    writeCommit(base, 0L, Seq(dvProtocol, addWithDv("a.parquet", lying)))
    val e = intercept[Exception] {
      graft.Tables.deltaTable(spark, base).collect()
    }
    assert(e.getMessage != null)
    // malformed 'u' path (not z85-block-sized)
    val base2 = freshDir()
    dataFile(base2, "a.parquet", Seq(1L).toDF("id"))
    writeCommit(base2, 0L, Seq(dvProtocol, addWithDv("a.parquet",
      """{"storageType":"u","pathOrInlineDv":"x","offset":1,"sizeInBytes":4,"cardinality":1}""")))
    intercept[IllegalArgumentException] {
      graft.Tables.deltaTable(spark, base2).collect()
    }
  }

  test("activeFiles refuses a DV table — the writer path must not drop DVs") {
    val (base, dv) = dvFixture(Array(3L))
    writeCommit(base, 0L, Seq(dvProtocol, addWithDv("a.parquet", dv)))
    val e = intercept[IllegalArgumentException] {
      DeltaLogReader.activeFiles(spark, base)
    }
    assert(e.getMessage.contains("deletion vectors"))
  }

  test("deletionVectors ENABLED but unused reads fine; benign features pass") {
    val base = freshDir()
    dataFile(base, "a.parquet", Seq(1L, 2L).toDF("id"))
    writeCommit(base, 0L, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["deletionVectors","timestampNtz","vacuumProtocolCheck","columnMapping"]}}""",
      """{"metaData":{"id":"m","format":{"provider":"parquet","options":{}},""" +
        """"schemaString":"{}","partitionColumns":[],""" +
        """"configuration":{"delta.columnMapping.mode":"none"},"createdTime":0}}""",
      add("a.parquet")))
    assert(idsOf(graft.Tables.deltaTable(spark, base)) == Set(1L, 2L))
  }

  test("an unknown reader feature refuses the read") {
    val base = freshDir()
    dataFile(base, "a.parquet", Seq(1L).toDF("id"))
    writeCommit(base, 0L, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["v2Checkpoint"]}}""",
      add("a.parquet")))
    val e = intercept[IllegalArgumentException] {
      graft.Tables.deltaTable(spark, base)
    }
    assert(e.getMessage.contains("v2Checkpoint"))
  }

  test("column mapping with an unusable schemaString refuses the read") {
    // mapping is SUPPORTED (tests below) — but only through the metaData
    // schemaString; one that does not parse leaves the physical footers
    // unmappable, and serving col-<uuid> names would be a wrong answer
    val base = freshDir()
    dataFile(base, "a.parquet", Seq(1L).toDF("id"))
    writeCommit(base, 0L, Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      """{"metaData":{"id":"m","format":{"provider":"parquet","options":{}},""" +
        """"schemaString":"{}","partitionColumns":[],""" +
        """"configuration":{"delta.columnMapping.mode":"name"},"createdTime":0}}""",
      add("a.parquet")))
    val e = intercept[IllegalArgumentException] {
      graft.Tables.deltaTable(spark, base)
    }
    assert(e.getMessage.contains("column mapping"))
  }

  /** schemaString for two mapped long columns: logical names paired with
    * (physicalName, field id) — the spelling real Delta writers emit. */
  private def mappedSchemaString(cols: Seq[(String, String, Long)]): String = {
    import org.apache.spark.sql.types._
    StructType(cols.map { case (logical, phys, id) =>
      StructField(logical, LongType, nullable = true,
        new MetadataBuilder()
          .putString("delta.columnMapping.physicalName", phys)
          .putLong("delta.columnMapping.id", id).build())
    }).json
  }

  private def mappedMeta(mode: String, schemaString: String,
                         partitionCols: String = "[]"): String =
    s"""{"metaData":{"id":"m","format":{"provider":"parquet","options":{}},""" +
      s""""schemaString":${com.fasterxml.jackson.databind.json.JsonMapper.builder()
        .build().writeValueAsString(schemaString)},"partitionColumns":$partitionCols,""" +
      s""""configuration":{"delta.columnMapping.mode":"$mode"},"createdTime":0}}"""

  test("name-mode column mapping serves LOGICAL names over physical footers") {
    // footer columns are col-aa/col-bb; the logical schema CROSSES them
    // (amount -> col-bb, id -> col-aa): correct values under each logical
    // name prove the mapping is honored, not footer order or names
    val base = freshDir()
    dataFile(base, "a.parquet",
      Seq((1L, 10L), (2L, 20L)).toDF("col-aa", "col-bb"))
    writeCommit(base, 0L, Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      mappedMeta("name", mappedSchemaString(
        Seq(("amount", "col-bb", 2L), ("id", "col-aa", 1L)))),
      add("a.parquet")))
    val df = graft.Tables.deltaTable(spark, base)
    assert(df.columns.toSeq == Seq("amount", "id"))
    val got = df.orderBy("id").collect().map(r => (r.getLong(1), r.getLong(0))).toSeq
    assert(got == Seq((1L, 10L), (2L, 20L)), got.mkString(", "))
  }

  test("id-mode column mapping resolves by parquet FIELD ID") {
    import org.apache.spark.sql.types._
    val base = freshDir()
    // physical file: field-id-stamped columns (what a real id-mode writer
    // produces) under physical names unrelated to the logical ones
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    val st = StructType(Seq(
      StructField("col-x", LongType, nullable = true,
        new MetadataBuilder().putLong("parquet.field.id", 1L).build()),
      StructField("col-y", LongType, nullable = true,
        new MetadataBuilder().putLong("parquet.field.id", 2L).build())))
    dataFile(base, "a.parquet", spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(org.apache.spark.sql.Row(1L, 10L), org.apache.spark.sql.Row(2L, 20L)), 1), st))
    writeCommit(base, 0L, Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      mappedMeta("id", mappedSchemaString(
        Seq(("v", "col-y", 2L), ("id", "col-x", 1L)))),
      add("a.parquet")))
    val df = graft.Tables.deltaTable(spark, base)
    assert(df.columns.toSeq == Seq("v", "id"))
    assert(df.orderBy("id").collect().map(r => (r.getLong(1), r.getLong(0))).toSeq ==
      Seq((1L, 10L), (2L, 20L)))
  }

  test("a later commit's metaData wins: renames are served under the NEW name") {
    val base = freshDir()
    dataFile(base, "a.parquet", Seq((1L, 10L)).toDF("col-aa", "col-bb"))
    writeCommit(base, 0L, Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      mappedMeta("name", mappedSchemaString(
        Seq(("id", "col-aa", 1L), ("amount", "col-bb", 2L)))),
      add("a.parquet")))
    // v1 renames amount -> total (same physical column — the whole point
    // of column mapping: no data rewrite)
    writeCommit(base, 1L, Seq(
      mappedMeta("name", mappedSchemaString(
        Seq(("id", "col-aa", 1L), ("total", "col-bb", 2L))))))
    assert(graft.Tables.deltaTable(spark, base).columns.toSeq == Seq("id", "total"))
    // AS OF v0 still serves the old name
    assert(graft.Tables.deltaTable(spark, base, asOf = Some(0L))
      .columns.toSeq == Seq("id", "amount"))
  }

  test("column mapping plus partition columns refuses with the limitation named") {
    val base = freshDir()
    dataFile(base, "a.parquet", Seq((1L, 10L)).toDF("col-aa", "col-bb"))
    writeCommit(base, 0L, Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      mappedMeta("name", mappedSchemaString(
        Seq(("id", "col-aa", 1L), ("amount", "col-bb", 2L))),
        partitionCols = """["amount"]"""),
      add("a.parquet")))
    val e = intercept[IllegalArgumentException] {
      graft.Tables.deltaTable(spark, base)
    }
    assert(e.getMessage.contains("partitionValues"), e.getMessage)
  }

  test("protocol/metaData compacted into a checkpoint are gated too") {
    // log truncated to just a checkpoint that carries columnMapping=name:
    // no JSON line ever mentions the feature — only the checkpoint can
    val base = freshDir()
    dataFile(base, "a.parquet", Seq(1L).toDF("id"))
    val log = new java.io.File(base, "_delta_log")
    log.mkdirs()
    val ckTmp = new java.io.File(log, ".tmp_ck").toString
    Seq("a.parquet").toDF("p")
      .selectExpr("named_struct('path', p) AS add",
        "CAST(NULL AS STRUCT<path: STRING>) AS remove",
        "CAST(NULL AS STRUCT<minReaderVersion: INT, minWriterVersion: INT>) AS protocol",
        """CAST(NULL AS STRUCT<configuration: MAP<STRING, STRING>>) AS metaData""")
      .unionAll(Seq(1).toDF("x").selectExpr(
        "CAST(NULL AS STRUCT<path: STRING>) AS add",
        "CAST(NULL AS STRUCT<path: STRING>) AS remove",
        "named_struct('minReaderVersion', 2, 'minWriterVersion', 5) AS protocol",
        "named_struct('configuration', map('delta.columnMapping.mode', 'id')) AS metaData"))
      .coalesce(1).write.parquet(ckTmp)
    val part = new java.io.File(ckTmp).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).head
    assert(part.renameTo(new java.io.File(log, f"${0L}%020d.checkpoint.parquet")))
    java.nio.file.Files.writeString(
      new java.io.File(log, "_last_checkpoint").toPath, """{"version":0,"size":1}""")
    val e = intercept[IllegalArgumentException] {
      graft.Tables.deltaTable(spark, base)
    }
    assert(e.getMessage.contains("column mapping"))
  }

  test("a truncated log with no checkpoint refuses the read") {
    val base = freshDir()
    dataFile(base, "b.parquet", Seq(2L).toDF("id"))
    writeCommit(base, 3L, Seq(add("b.parquet"))) // history 0..2 lost
    val e = intercept[IllegalArgumentException] {
      graft.Tables.deltaTable(spark, base)
    }
    assert(e.getMessage.contains("truncated"))
  }

  test("streamAdds drains a plain table per-version; OPTIMIZE skips; removes refuse") {
    import org.apache.spark.sql.SaveMode
    val base = freshDir()
    val chk = java.nio.file.Files.createTempDirectory("sadd").toString + "/chk"
    DeltaLogWriter.write(Seq(1L, 2L).toDF("id").coalesce(1), base)            // v0
    DeltaLogWriter.write(Seq(3L).toDF("id").coalesce(1), base, SaveMode.Append) // v1
    val batches = scala.collection.mutable.ArrayBuffer.empty[(Long, Set[Long])]
    def drain(): Seq[Long] = DeltaLogReader.streamAdds(spark, base, chk) {
      (d, v) => batches += ((v, d.select("id").collect().map(_.getLong(0)).toSet))
    }
    assert(drain() == Seq(0L, 1L))
    assert(batches.toSeq == Seq((0L, Set(1L, 2L)), (1L, Set(3L))))
    // caught up: a second drain consumes nothing (exactly-once law)
    assert(drain().isEmpty)
    // OPTIMIZE (dataChange=false) advances the offset WITHOUT a batch;
    // the next append streams normally
    DeltaLogWriter.optimize(spark, base)                                      // v2
    DeltaLogWriter.write(Seq(4L).toDF("id").coalesce(1), base, SaveMode.Append) // v3
    assert(drain() == Seq(2L, 3L))
    assert(batches.size == 3 && batches.last == ((3L, Set(4L))))
    // crash window: superseded offsets were swept on commit, so losing
    // the only surviving one replays from the start — at-least-once
    // into an idempotent sink, batch contents identical
    assert(new java.io.File(new java.io.File(chk), "offset_v3").delete())
    assert(drain() == Seq(0L, 1L, 2L, 3L))
    assert(batches.size == 6 && batches.last == ((3L, Set(4L))))
    // a data-changing remove (overwrite) is NOT a blind append: refuse
    DeltaLogWriter.write(Seq(9L).toDF("id").coalesce(1), base, SaveMode.Overwrite) // v4
    val e = intercept[IllegalArgumentException](drain())
    assert(e.getMessage.contains("blind append"), e.getMessage)
    // ...and so is a DV delete on a fresh table
    val base2 = freshDir()
    val chk2 = java.nio.file.Files.createTempDirectory("sadd2").toString + "/chk"
    DeltaLogWriter.write(Seq(1L, 2L).toDF("id").coalesce(1), base2)
    DeltaLogWriter.deleteWhere(spark, base2, col("id") === 1L)
    val e2 = intercept[IllegalArgumentException](
      DeltaLogReader.streamAdds(spark, base2, chk2)((_, _) => ()))
    assert(e2.getMessage.contains("blind append"), e2.getMessage)
    // a MAPPED table streams LOGICAL names per the commit's metaData
    val base3 = freshDir()
    val chk3 = java.nio.file.Files.createTempDirectory("sadd3").toString + "/chk"
    DeltaLogWriter.write(Seq((1L, 10L)).toDF("id", "amount").coalesce(1), base3) // v0
    DeltaLogWriter.enableColumnMapping(spark, base3)                             // v1
    DeltaLogWriter.renameColumn(spark, base3, "amount", "total")                 // v2
    DeltaLogWriter.write(Seq((2L, 20L)).toDF("id", "total").coalesce(1), base3)  // v3
    val cols = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[String])]
    DeltaLogReader.streamAdds(spark, base3, chk3) {
      (d, v) => cols += ((v, d.columns.toSeq))
    }
    // v0 streamed pre-mapping (plain footer names); v3 under the rename
    assert(cols.toSeq == Seq((0L, Seq("id", "amount")), (3L, Seq("id", "total"))), cols)
  }
}
