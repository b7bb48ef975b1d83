package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** The Delta-log WRITER against its own reader (roundtrip + time travel),
  * against the protocol's file shapes (commit names, action lines,
  * checkpoint + pointer), and against clobber/concurrency edges. */
class DeltaLogWriterSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("deltaw").toString

  private def idsOf(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").collect().map(_.getLong(0)).toSet

  test("create + append + overwrite roundtrip through the reader, every version pinned") {
    val base = freshDir()
    assert(DeltaLogWriter.write(Seq(1L, 2L).toDF("id"), base, SaveMode.Overwrite) == 0L)
    assert(DeltaLogWriter.write(Seq(3L).toDF("id"), base, SaveMode.Append) == 1L)
    assert(DeltaLogWriter.write(Seq(9L, 10L).toDF("id"), base, SaveMode.Overwrite) == 2L)
    assert(idsOf(graft.Tables.deltaTable(spark, base)) == Set(9L, 10L))
    assert(idsOf(graft.Tables.deltaTable(spark, base, asOf = Some(0L))) == Set(1L, 2L))
    assert(idsOf(graft.Tables.deltaTable(spark, base, asOf = Some(1L))) == Set(1L, 2L, 3L))
  }

  test("commit 0 carries protocol + metaData with the table schema; actions are one-per-line JSON") {
    val base = freshDir()
    DeltaLogWriter.write(Seq((1L, "a")).toDF("id", "name"), base, SaveMode.Overwrite)
    val lines = java.nio.file.Files.readString(
      java.nio.file.Path.of(base, "_delta_log", "0" * 20 + ".json"))
      .split("\n").filter(_.nonEmpty)
    assert(lines.head.contains(""""protocol""""))
    assert(lines.head.contains(""""minReaderVersion":1"""))
    assert(lines(1).contains(""""metaData""""))
    assert(lines(1).contains("schemaString"))
    assert(lines(1).contains("\\\"name\\\"")) // escaped Spark schema JSON inside
    assert(lines.drop(2).forall(_.contains(""""add"""")))
    // every add names a real root-level parquet part with its true size
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    lines.drop(2).foreach { l =>
      val a = mapper.readTree(l).get("add")
      val f = new java.io.File(base, a.get("path").asText())
      assert(f.isFile && f.length() == a.get("size").asLong())
    }
  }

  test("checkpoint compacts state; reader resumes from it even with early commits truncated") {
    val base = freshDir()
    DeltaLogWriter.write(Seq(1L, 2L).toDF("id"), base, SaveMode.Overwrite)
    DeltaLogWriter.write(Seq(3L).toDF("id"), base, SaveMode.Overwrite)
    assert(DeltaLogWriter.checkpoint(spark, base) == 1L)
    DeltaLogWriter.write(Seq(4L).toDF("id"), base, SaveMode.Append)
    assert(idsOf(graft.Tables.deltaTable(spark, base)) == Set(3L, 4L))
    // protocol guarantee the checkpoint exists to provide: commits ≤ the
    // checkpoint version may be deleted and the table must still read
    (0L to 1L).foreach { v =>
      java.nio.file.Files.delete(
        java.nio.file.Path.of(base, "_delta_log", f"$v%020d.json"))
    }
    assert(idsOf(graft.Tables.deltaTable(spark, base)) == Set(3L, 4L))
  }

  test("overwrite removes exactly the previously-active files, not historical ones") {
    val base = freshDir()
    DeltaLogWriter.write(Seq(1L).toDF("id"), base, SaveMode.Overwrite)
    DeltaLogWriter.write(Seq(2L).toDF("id"), base, SaveMode.Overwrite)
    DeltaLogWriter.write(Seq(3L).toDF("id"), base, SaveMode.Overwrite)
    // v2's removes must target v1's files only — v0's were already gone;
    // a reader replaying the whole log lands on exactly {3}
    assert(idsOf(graft.Tables.deltaTable(spark, base)) == Set(3L))
    val v2 = java.nio.file.Files.readString(
      java.nio.file.Path.of(base, "_delta_log", f"${2L}%020d.json"))
    val nRemoves = v2.split("\n").count(_.contains(""""remove""""))
    assert(nRemoves == 1, s"expected 1 remove (v1's single part), got $nRemoves")
  }

  test("an externally-landed commit is never clobbered: the next write sequences after it") {
    val base = freshDir()
    DeltaLogWriter.write(Seq(1L).toDF("id"), base, SaveMode.Overwrite)
    // another writer lands v1 between our commits — our write must observe
    // it and take v2, leaving v1's bytes untouched (the in-flight race
    // inside one call is covered by the pre-rename existence require)
    val v1 = java.nio.file.Path.of(base, "_delta_log", f"${1L}%020d.json")
    val external =
      s"""{"add":{"path":"theirs.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}\n"""
    java.nio.file.Files.writeString(v1, external)
    assert(DeltaLogWriter.write(Seq(2L).toDF("id"), base, SaveMode.Append) == 2L)
    assert(java.nio.file.Files.readString(v1) == external)
  }

  test("partitionBy writes a hive layout with partitionValues; reader resolves it") {
    val base = freshDir()
    val df = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "k")
    DeltaLogWriter.write(df, base, SaveMode.Overwrite, partitionBy = Seq("k"))
    DeltaLogWriter.write(Seq((4L, "c")).toDF("id", "k"), base, SaveMode.Append,
      partitionBy = Seq("k"))
    val back = graft.Tables.deltaTable(spark, base)
    assert(back.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L, 4L))
    // the log's add actions carry RELATIVE hive paths + partitionValues
    val lines = java.nio.file.Files.readString(
        java.nio.file.Path.of(base, "_delta_log", "0" * 20 + ".json"))
      .split("\n").filter(_.contains(""""add""""))
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    assert(lines.nonEmpty)
    lines.foreach { l =>
      val a = mapper.readTree(l).get("add")
      val rel = a.get("path").asText()
      assert(rel.startsWith("k=") && !rel.startsWith("/"), rel)
      assert(a.get("partitionValues").get("k").asText() == rel.split("/")(0).drop(2))
    }
    // metaData records the partition columns
    val meta = java.nio.file.Files.readString(
      java.nio.file.Path.of(base, "_delta_log", "0" * 20 + ".json"))
    assert(meta.contains(""""partitionColumns":["k"]"""))
    // a checkpoint of the partitioned state keeps the hive segments in
    // its paths — reader resolves through it even with commits truncated
    DeltaLogWriter.checkpoint(spark, base)
    (0L to 1L).foreach { v =>
      java.nio.file.Files.delete(
        java.nio.file.Path.of(base, "_delta_log", f"$v%020d.json"))
    }
    assert(graft.Tables.deltaTable(spark, base)
      .select("id").collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L, 4L))
    // overwrite removes the partitioned files by their relative paths
    DeltaLogWriter.write(Seq((9L, "z")).toDF("id", "k"), base, SaveMode.Overwrite,
      partitionBy = Seq("k"))
    assert(graft.Tables.deltaTable(spark, base)
      .select("id").collect().map(_.getLong(0)).toSet == Set(9L))
  }

  test("partition values with '%' and '+' round-trip (URI encoding, not form encoding)") {
    val base = freshDir()
    // Spark hive-escapes '%' in the dir name; '+' stays literal — the old
    // URLDecoder form-decoding read it back as a space and resolved to a
    // nonexistent path
    val df = Seq((1L, "100%"), (2L, "a+b"), (3L, "plain")).toDF("id", "k")
    DeltaLogWriter.write(df, base, SaveMode.Overwrite, partitionBy = Seq("k"))
    val back = graft.Tables.deltaTable(spark, base)
    assert(back.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
    assert(back.select("k").collect().map(_.getString(0)).toSet ==
      Set("100%", "a+b", "plain"))
    // and the recorded partitionValues decode to the original values
    val v0 = java.nio.file.Files.readString(
      java.nio.file.Path.of(base, "_delta_log", "0" * 20 + ".json"))
    assert(v0.contains(""""k":"100%""""), v0)
    assert(v0.contains(""""k":"a+b""""), v0)
  }

  test("checkpoint carries protocol + metaData rows and spec-complete add fields") {
    val base = freshDir()
    DeltaLogWriter.write(Seq((1L, "a"), (2L, "b")).toDF("id", "k"), base,
      SaveMode.Overwrite, partitionBy = Seq("k"))
    val v = DeltaLogWriter.checkpoint(spark, base)
    val ck = spark.read.parquet(
      java.nio.file.Path.of(base, "_delta_log", f"$v%020d.checkpoint.parquet").toString)
    // PROTOCOL.md: every checkpoint holds exactly one protocol and one
    // metaData action — real readers reconstruct state from the checkpoint
    // plus only LATER commits, so without them a pruned table is unreadable
    assert(ck.where(col("protocol").isNotNull).count() == 1)
    assert(ck.where(col("metaData").isNotNull).count() == 1)
    val meta = ck.where(col("metaData").isNotNull).select("metaData.*").head
    assert(meta.getAs[String]("schemaString").contains("\"id\""))
    assert(meta.getSeq[String](meta.fieldIndex("partitionColumns")) == Seq("k"))
    // add rows carry the spec's required fields, dataChange=false
    val adds = ck.where(col("add").isNotNull).select("add.*")
    assert(adds.count() == 2)
    assert(adds.where(col("size") > 0 && !col("dataChange")).count() == 2)
    assert(adds.selectExpr("partitionValues['k']").collect()
      .map(_.getString(0)).toSet == Set("a", "b"))
  }

  test("re-checkpoint succeeds after pruning: protocol/metaData replay from the prior checkpoint") {
    val base = freshDir()
    DeltaLogWriter.write(Seq(1L, 2L).toDF("id"), base, SaveMode.Overwrite)
    val v0 = DeltaLogWriter.checkpoint(spark, base)
    // prune everything the first checkpoint covers — the documented use
    java.nio.file.Files.delete(
      java.nio.file.Path.of(base, "_delta_log", f"$v0%020d.json"))
    DeltaLogWriter.write(Seq(3L).toDF("id"), base, SaveMode.Append)
    // the carrying commits are gone; the new checkpoint must pull
    // protocol/metaData forward from the PRIOR checkpoint parquet
    val v1 = DeltaLogWriter.checkpoint(spark, base)
    val ck = spark.read.parquet(
      java.nio.file.Path.of(base, "_delta_log", f"$v1%020d.checkpoint.parquet").toString)
    assert(ck.where(col("protocol").isNotNull).count() == 1)
    assert(ck.where(col("metaData").isNotNull).count() == 1)
    // and with the post-checkpoint prune the table still reads
    java.nio.file.Files.delete(
      java.nio.file.Path.of(base, "_delta_log", f"$v1%020d.json"))
    assert(idsOf(graft.Tables.deltaTable(spark, base)) == Set(1L, 2L, 3L))
  }

  test("a missing _last_checkpoint pointer falls back to the checkpoint files on disk") {
    val base = freshDir()
    DeltaLogWriter.write(Seq(1L).toDF("id"), base, SaveMode.Overwrite)
    val v = DeltaLogWriter.checkpoint(spark, base)
    // prune the covered commit AND lose the pointer (the non-atomic
    // republish crash window) — the reader must list the checkpoint
    // parquet itself instead of refusing the whole table
    java.nio.file.Files.delete(
      java.nio.file.Path.of(base, "_delta_log", f"$v%020d.json"))
    java.nio.file.Files.delete(
      java.nio.file.Path.of(base, "_delta_log", "_last_checkpoint"))
    assert(idsOf(graft.Tables.deltaTable(spark, base)) == Set(1L))
  }

  test("writer output cross-checks against SnapshotLog over the same history") {
    val base = freshDir()
    val snap = freshDir()
    val a = Seq(1L, 2L, 3L).toDF("id")
    val b = Seq(4L, 5L).toDF("id")
    DeltaLogWriter.write(a, base, SaveMode.Overwrite)
    DeltaLogWriter.write(b, base, SaveMode.Append)
    graft.operators.SnapshotLog.commit(spark, snap, a, overwrite = true)
    graft.operators.SnapshotLog.commit(spark, snap, b, overwrite = false)
    assert(idsOf(graft.Tables.deltaTable(spark, base)) ==
      idsOf(graft.operators.SnapshotLog.read(spark, snap)))
  }

  // ---- deleteWhere: DELETE as a deletion-vector commit

  test("deleteWhere attaches DVs — no parquet rewritten, reader subtracts, asOf predates") {
    val base = freshDir()
    DeltaLogWriter.write((0L until 40L).toDF("id").repartition(3), base,
      SaveMode.Overwrite)
    val partsBefore = new java.io.File(base).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => (f.getName, f.lastModified, f.length)).toSet
    val (v, n) = DeltaLogWriter.deleteWhere(spark, base, col("id") % 5 === 0)
    assert(v == 1L && n == 8L)
    val partsAfter = new java.io.File(base).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => (f.getName, f.lastModified, f.length)).toSet
    assert(partsBefore == partsAfter) // the fast path: bitmaps, not rewrites
    assert(idsOf(graft.Tables.deltaTable(spark, base)) ==
      (0L until 40L).filterNot(_ % 5 == 0).toSet)
    assert(idsOf(graft.Tables.deltaTable(spark, base, asOf = Some(0L))) ==
      (0L until 40L).toSet)
    // the commit upgraded a v1 table's protocol to the DV feature
    val commit = java.nio.file.Files.readString(
      java.nio.file.Path.of(base, "_delta_log", "0" * 19 + "1.json"))
    assert(commit.contains(""""deletionVectors""""))
    assert(commit.contains(""""minReaderVersion":3"""))
  }

  test("a second deleteWhere UNIONS each file's existing DV; count is only the newly dead") {
    val base = freshDir()
    DeltaLogWriter.write((0L until 60L).toDF("id").repartition(2), base,
      SaveMode.Overwrite)
    val (_, n1) = DeltaLogWriter.deleteWhere(spark, base, col("id") % 3 === 0)
    assert(n1 == 20L)
    // % 6 rows are already dead (subset of % 3): only the odd multiples
    // of 3... none — %6==0 ⊂ %3==0, so a %6 delete kills NOTHING new
    val (v2, n2) = DeltaLogWriter.deleteWhere(spark, base, col("id") % 6 === 0)
    assert(n2 == 0L)
    val (v3, n3) = DeltaLogWriter.deleteWhere(spark, base, col("id") % 4 === 0)
    assert(n3 == 15L - 5L) // %4 multiples minus those already dead via %12
    assert(v3 > v2)
    assert(idsOf(graft.Tables.deltaTable(spark, base)) ==
      (0L until 60L).filterNot(i => i % 3 == 0 || i % 4 == 0).toSet)
  }

  test("deleteWhere matching nothing commits nothing") {
    val base = freshDir()
    DeltaLogWriter.write(Seq(1L, 2L).toDF("id"), base, SaveMode.Overwrite)
    val (v, n) = DeltaLogWriter.deleteWhere(spark, base, col("id") > 100L)
    assert(v == 0L && n == 0L)
    assert(DeltaLogReader.versions(spark, base) == Seq(0L))
  }

  test("deleteWhere resolves a foreign NAME-mapped table through physicalName") {
    val base = freshDir()
    // hand-write a name-mapped table (the q238 shape, minimal): the
    // footer column is `col-p`, the logical name is `logical` — a
    // predicate on the LOGICAL name must kill the right row
    val df = Seq(1L, 2L, 3L).toDF("col-p")
    df.coalesce(1).write.parquet(s"$base/.tmp")
    val part = new java.io.File(s"$base/.tmp").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val sz = part.length()
    assert(part.renameTo(new java.io.File(base, "f1.parquet")))
    val schemaString = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("logical", org.apache.spark.sql.types.LongType,
        nullable = true, new org.apache.spark.sql.types.MetadataBuilder()
          .putString("delta.columnMapping.physicalName", "col-p")
          .putLong("delta.columnMapping.id", 1L).build()))).json
    val esc = new com.fasterxml.jackson.databind.ObjectMapper().writeValueAsString(schemaString)
    val log = new java.io.File(base, "_delta_log"); log.mkdirs()
    java.nio.file.Files.writeString(new java.io.File(log, "0" * 20 + ".json").toPath,
      Seq(
        """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
        s"""{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},"schemaString":$esc,"partitionColumns":[],"configuration":{"delta.columnMapping.mode":"name"},"createdTime":0}}""",
        s"""{"add":{"path":"f1.parquet","partitionValues":{},"size":$sz,"modificationTime":0,"dataChange":true}}"""
      ).mkString("", "\n", "\n"))
    val (v, n) = DeltaLogWriter.deleteWhere(spark, base, col("logical") === 2L)
    assert(v == 1L && n == 1L, s"v=$v n=$n")
    assert(DeltaLogReader.read(spark, base).select("logical").collect()
      .map(_.getLong(0)).toSet == Set(1L, 3L))
  }

  test("enableColumnMapping + renameColumn: pure metadata lifecycle, appends go physical") {
    val base = freshDir()
    DeltaLogWriter.write(Seq((1L, 10L), (2L, 20L)).toDF("id", "amount")
      .coalesce(1), base)                                            // v0
    val dataFilesBefore = new java.io.File(base).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).map(_.getName).toSet
    assert(DeltaLogWriter.enableColumnMapping(spark, base) == 1L)    // v1
    assert(DeltaLogWriter.renameColumn(spark, base, "amount", "total") == 2L) // v2
    // zero data rewritten across BOTH metadata commits
    val dataFilesAfter = new java.io.File(base).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).map(_.getName).toSet
    assert(dataFilesAfter == dataFilesBefore)
    // protocol stepped to the mapping-capable (2, 5)
    val v1 = scala.io.Source.fromFile(new java.io.File(base,
      f"_delta_log/${1L}%020d.json")).getLines().toSeq
    assert(v1.exists(l => l.contains("\"minReaderVersion\":2") &&
      l.contains("\"minWriterVersion\":5")), v1.mkString("\n"))
    // old files serve under the NEW logical name
    val d = DeltaLogReader.read(spark, base)
    assert(d.columns.toSeq == Seq("id", "total"))
    assert(d.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 10L), (2L, 20L)))
    // an append under the new LOGICAL schema writes PHYSICAL parquet
    DeltaLogWriter.write(Seq((9L, 90L)).toDF("id", "total").coalesce(1), base) // v3
    assert(DeltaLogReader.read(spark, base).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 10L), (2L, 20L), (9L, 90L)))
    val newFile = new java.io.File(base).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(_.getName).toSet.diff(dataFilesAfter).head
    val footerCols = spark.read.parquet(s"$base/$newFile").columns.toSeq
    assert(footerCols == Seq("id", "amount"), // physicalName, not the rename
      footerCols.mkString(", "))
    // rename refusals: unmapped table, unknown source, collision
    val plain = freshDir()
    DeltaLogWriter.write(Seq(1L).toDF("id"), plain)
    val e1 = intercept[IllegalArgumentException](
      DeltaLogWriter.renameColumn(spark, plain, "id", "x"))
    assert(e1.getMessage.contains("enableColumnMapping"), e1.getMessage)
    intercept[IllegalArgumentException](
      DeltaLogWriter.renameColumn(spark, base, "nope", "x"))
    intercept[IllegalArgumentException](
      DeltaLogWriter.renameColumn(spark, base, "id", "total"))
    // a drifted append refuses against the logical schema
    val e2 = intercept[IllegalArgumentException](DeltaLogWriter.write(
      Seq((1L, 1L)).toDF("id", "amount"), base))
    assert(e2.getMessage.contains("logical schema"), e2.getMessage)
  }

  test("enableColumnMapping on a table-features protocol LISTS columnMapping, never skips") {
    // a DV deleteWhere first upgrades the table to (3,7) table features;
    // enabling mapping afterwards must MERGE 'columnMapping' into both
    // feature lists — PROTOCOL.md requires every feature a (3,7) table
    // uses to be listed, and "version numbers already high enough" is
    // exactly the wrong reason to skip the action
    val base = freshDir()
    DeltaLogWriter.write(Seq((1L, 10L), (2L, 20L), (3L, 30L))
      .toDF("id", "amount").coalesce(1), base)                         // v0
    DeltaLogWriter.deleteWhere(spark, base, col("id") === 3L)          // v1: (3,7)+DV
    val v = DeltaLogWriter.enableColumnMapping(spark, base)            // v2
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val protoLines = scala.io.Source.fromFile(new java.io.File(base,
        f"_delta_log/$v%020d.json")).getLines().toSeq
      .filter(_.contains("\"protocol\""))
    assert(protoLines.size == 1, protoLines.mkString("\n"))
    val p = mapper.readTree(protoLines.head).get("protocol")
    def feats(k: String): Set[String] = (0 until p.path(k).size())
      .map(p.path(k).get(_).asText()).toSet
    assert(p.get("minReaderVersion").asInt() == 3 &&
      p.get("minWriterVersion").asInt() == 7, p.toString)
    // merged, not replaced: the DV feature survives alongside mapping
    assert(feats("readerFeatures").contains("columnMapping") &&
      feats("readerFeatures").contains("deletionVectors"), p.toString)
    assert(feats("writerFeatures").contains("columnMapping") &&
      feats("writerFeatures").contains("deletionVectors"), p.toString)
    // the mapped + DV-carrying table still reads (and the rename works)
    DeltaLogWriter.renameColumn(spark, base, "amount", "total")
    val d = DeltaLogReader.read(spark, base)
    assert(d.columns.toSeq == Seq("id", "total"))
    assert(d.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 10L), (2L, 20L)))
  }
}
