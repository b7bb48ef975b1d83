package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** OPTIMIZE / VACUUM laws for the Delta interop writer: optimize is a
  * `dataChange=false` rewrite that serves the identical logical state,
  * purges deletion vectors and leaves history time-travelable; vacuum
  * deletes only unreferenced files past the horizon — tombstones by
  * their recorded deletionTimestamp, orphans by mtime — and never
  * touches active files or their DV sidecars. */
class DeltaMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    new java.io.File(java.nio.file.Files.createTempDirectory("deltam").toString,
      "tbl").toString

  private def df(ids: Seq[Long]) =
    ids.map(i => (i, s"name_$i", i * 1.5)).toDF("id", "name", "score")

  private def ids(d: org.apache.spark.sql.DataFrame): Set[Long] =
    d.select("id").collect().map(_.getLong(0)).toSet

  test("optimize bin-packs to one dataChange=false commit; history intact") {
    val base = freshDir()
    DeltaLogWriter.write(df(Seq(1L, 2L)).coalesce(1), base)
    DeltaLogWriter.write(df(Seq(3L)).coalesce(1), base)
    DeltaLogWriter.write(df(Seq(4L, 5L)).coalesce(1), base)
    assert(DeltaLogReader.activeFiles(spark, base).size == 3)
    val v = DeltaLogWriter.optimize(spark, base)
    assert(v == 3L)
    assert(ids(DeltaLogReader.read(spark, base)) == Set(1L, 2L, 3L, 4L, 5L))
    assert(DeltaLogReader.activeFiles(spark, base).size == 1)
    // the commit says dataChange=false on every action
    val commit = new java.io.File(new java.io.File(base, "_delta_log"),
      f"${3L}%020d.json")
    val lines = scala.io.Source.fromFile(commit).getLines().toSeq
    assert(lines.nonEmpty && lines.forall(_.contains("\"dataChange\":false")), lines)
    // superseded files stay on disk: time travel still serves v1
    assert(ids(DeltaLogReader.read(spark, base, asOf = Some(1L))) == Set(1L, 2L, 3L))
    // and the table keeps accepting writes
    DeltaLogWriter.write(df(Seq(6L)).coalesce(1), base)
    assert(ids(DeltaLogReader.read(spark, base)) == Set(1L, 2L, 3L, 4L, 5L, 6L))
  }

  test("optimize purges deletion vectors; the DV-blind gates open again") {
    val base = freshDir()
    DeltaLogWriter.write(df(1L to 10L).coalesce(1), base)
    DeltaLogWriter.deleteWhere(spark, base, col("id") % 2 === 0L)
    val survivors = (1L to 10L).filter(_ % 2 == 1).toSet
    assert(ids(DeltaLogReader.read(spark, base)) == survivors)
    // pre-optimize: the bare-file-list gate refuses
    intercept[IllegalArgumentException](DeltaLogReader.activeFiles(spark, base))
    DeltaLogWriter.optimize(spark, base)
    assert(ids(DeltaLogReader.read(spark, base)) == survivors)
    assert(DeltaLogReader.activeFiles(spark, base).size == 1) // gate passes
    DeltaLogWriter.checkpoint(spark, base)                    // so does this
    assert(ids(DeltaLogReader.read(spark, base)) == survivors)
  }

  test("clustered optimize writes range-disjoint files (skipping-ready)") {
    val base = freshDir()
    DeltaLogWriter.write(df(Seq(1L, 40L, 2L, 39L, 3L, 38L, 4L, 37L,
      5L, 36L, 6L, 35L, 7L, 34L, 8L, 33L)).coalesce(1), base)
    DeltaLogWriter.optimize(spark, base,
      clusterBy = Seq(col("id")), numFiles = Some(4))
    val active = DeltaLogReader.activeFiles(spark, base)
    assert(active.size == 4)
    // per-file id ranges must not overlap — that is what lets parquet
    // row-group stats (and any stats-based skipper) drop whole files
    val ranges = active.map { p =>
      val r = spark.read.parquet(p)
        .agg(org.apache.spark.sql.functions.min("id"),
          org.apache.spark.sql.functions.max("id")).collect().head
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo, _)) => assert(hi < lo, ranges.mkString(", "))
      case _ =>
    }
    assert(ids(DeltaLogReader.read(spark, base)).size == 16)
  }

  test("optimize re-bins WITHIN partitions; the hive layout and pruning survive") {
    val base = freshDir()
    val rows = Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0),
      (4L, "b", 4.0), (5L, "a", 5.0)).toDF("id", "name", "score")
    // three small commits per partition-value pair → a fragmented layout
    DeltaLogWriter.write(rows.where(col("id") <= 2L), base, partitionBy = Seq("name"))
    DeltaLogWriter.write(rows.where(col("id") === 3L), base,
      mode = org.apache.spark.sql.SaveMode.Append, partitionBy = Seq("name"))
    DeltaLogWriter.write(rows.where(col("id") >= 4L), base,
      mode = org.apache.spark.sql.SaveMode.Append, partitionBy = Seq("name"))
    val before = DeltaLogReader.activeFiles(spark, base)
    assert(before.size >= 4, before.mkString(", "))
    val v = DeltaLogWriter.optimize(spark, base, numFiles = Some(1))
    // one file per partition VALUE, each under its hive dir, adds
    // carrying the partitionValues — pruning metadata intact
    val after = DeltaLogReader.activeFiles(spark, base)
    assert(after.size == 2, after.mkString(", "))
    assert(after.forall(_.contains("name=")), after.mkString(", "))
    val lines = scala.io.Source.fromFile(new java.io.File(
      new java.io.File(base, "_delta_log"), f"$v%020d.json")).getLines().toSeq
    assert(lines.filter(_.contains("\"add\""))
      .forall(l => l.contains(""""partitionValues":{"name":""")), lines.mkString("\n"))
    assert(lines.forall(_.contains("\"dataChange\":false")))
    assert(ids(DeltaLogReader.read(spark, base)) == Set(1L, 2L, 3L, 4L, 5L))
    // time travel to the fragmented state survives
    assert(ids(DeltaLogReader.read(spark, base, asOf = Some(1L))) == Set(1L, 2L, 3L))
  }

  test("vacuum deletes tombstoned files and old orphans, keeps the rest") {
    import org.apache.spark.sql.SaveMode
    val base = freshDir()
    DeltaLogWriter.write(df(Seq(1L)).coalesce(1), base)
    val v0Files = DeltaLogReader.activeFiles(spark, base)
    DeltaLogWriter.write(df(Seq(2L)).coalesce(1), base, mode = SaveMode.Overwrite)
    // an orphan: crashed-writer debris never referenced by the log
    val orphan = new java.io.File(base, "orphan_part.parquet")
    java.nio.file.Files.write(orphan.toPath, Array[Byte](1, 2, 3))
    // horizon BEFORE everything: nothing qualifies
    assert(DeltaLogWriter.vacuum(spark, base, olderThanMs = 0L) == 0)
    assert(orphan.exists())
    // horizon past everything: tombstoned v0 file + orphan go
    val n = DeltaLogWriter.vacuum(spark, base,
      olderThanMs = System.currentTimeMillis() + 3600_000L)
    assert(n == 2, s"deleted $n")
    assert(!orphan.exists())
    v0Files.foreach(p => assert(!new java.io.File(
      new java.net.URI(p).getPath).exists(), s"expected $p deleted"))
    // the current version is untouched...
    assert(ids(DeltaLogReader.read(spark, base)) == Set(2L))
    // ...and time travel to the vacuumed version now fails on read
    intercept[Exception](
      DeltaLogReader.read(spark, base, asOf = Some(0L)).collect())
  }

  test("upsert is one latest-write-wins commit; history stays intact") {
    val base = freshDir()
    DeltaLogWriter.write(df(1L to 5L).coalesce(1), base)
    val (v, nDel) = DeltaLogWriter.upsert(spark,
      base, Seq((3L, "n3", 30.0), (4L, "n4", 40.0), (11L, "n11", 110.0))
        .toDF("id", "name", "score").coalesce(1), Seq("id"))
    assert(v == 1L && nDel == 2L, s"v=$v nDel=$nDel")
    def scores(d: org.apache.spark.sql.DataFrame): Map[Long, Double] =
      d.select("id", "score").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val s1 = scores(DeltaLogReader.read(spark, base))
    assert(s1.keySet == Set(1L, 2L, 3L, 4L, 5L, 11L))
    assert(s1(3L) == 30.0 && s1(4L) == 40.0 && s1(1L) == 1.5)
    // time travel to the pre-upsert version still serves the originals
    assert(scores(DeltaLogReader.read(spark, base, asOf = Some(0L)))(3L) == 4.5)
    // a second upsert stacks (DV union on the same base file)
    DeltaLogWriter.upsert(spark, base,
      Seq((4L, "n4b", 400.0), (12L, "n12", 120.0))
        .toDF("id", "name", "score").coalesce(1), Seq("id"))
    val s2 = scores(DeltaLogReader.read(spark, base))
    assert(s2(4L) == 400.0 && s2(3L) == 30.0 && s2(12L) == 120.0)
    // and optimize flattens the whole MoR stack
    DeltaLogWriter.optimize(spark, base)
    assert(scores(DeltaLogReader.read(spark, base)) == s2)
    assert(DeltaLogReader.activeFiles(spark, base).size == 1)
  }

  test("upsert appends duplicate batch keys as-is and gates its scope") {
    val base = freshDir()
    DeltaLogWriter.write(df(Seq(1L, 2L)).coalesce(1), base)
    DeltaLogWriter.upsert(spark, base,
      Seq((2L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "name", "score")
        .coalesce(1), Seq("id"))
    assert(DeltaLogReader.read(spark, base).count() == 3L)
    // unknown key column / schema drift
    val e1 = intercept[IllegalArgumentException](DeltaLogWriter.upsert(
      spark, base, df(Seq(9L)), Seq("nope")))
    assert(e1.getMessage.contains("nope"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](DeltaLogWriter.upsert(
      spark, base, Seq((1L, "x")).toDF("id", "name"), Seq("id")))
    assert(e2.getMessage.contains("does not match"), e2.getMessage)
  }

  test("partitioned upsert: adds carry partitionValues; a moved key dies in its OLD partition") {
    val base = freshDir()
    DeltaLogWriter.write(Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0))
      .toDF("id", "name", "score"), base, partitionBy = Seq("name"))
    // key = id only (partition col NOT a key): the kill scan stays
    // whole-table, so id 2's replacement under partition c kills the
    // old row in partition a — the moved-key hazard the pruned path
    // must never be allowed to create
    val (v, nDel) = DeltaLogWriter.upsert(spark, base,
      Seq((2L, "c", 20.0), (9L, "c", 9.0)).toDF("id", "name", "score")
        .coalesce(1), Seq("id"))
    assert(v == 1L && nDel == 1L, s"v=$v nDel=$nDel")
    val got = DeltaLogReader.read(spark, base).select("id", "name", "score")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == Set((1L, "a", 1.0), (2L, "c", 20.0), (3L, "b", 3.0),
      (9L, "c", 9.0)), got)
    // the upsert's adds landed in hive dirs with partitionValues recorded
    val lines = scala.io.Source.fromFile(new java.io.File(
      new java.io.File(base, "_delta_log"), f"$v%020d.json")).getLines().toSeq
    val addLines = lines.filter(l => l.contains("\"add\"") && !l.contains("deletionVector"))
    assert(addLines.nonEmpty &&
      addLines.forall(_.contains(""""partitionValues":{"name":"c"}""")),
      addLines.mkString("\n"))
    // partitioned deleteWhere composes: a predicate ON the partition
    // column resolves through the reconstructed hive columns, and the
    // DV re-add keeps the file's partitionValues
    val (v2, nDel2) = DeltaLogWriter.deleteWhere(spark, base, col("name") === "c")
    assert(v2 == 2L && nDel2 == 2L, s"v2=$v2 nDel2=$nDel2")
    assert(ids(DeltaLogReader.read(spark, base)) == Set(1L, 3L))
    val dvAdds = scala.io.Source.fromFile(new java.io.File(
        new java.io.File(base, "_delta_log"), f"$v2%020d.json")).getLines()
      .filter(l => l.contains("\"add\"") && l.contains("deletionVector")).toSeq
    assert(dvAdds.nonEmpty &&
      dvAdds.forall(_.contains(""""partitionValues":{"name":"c"}""")),
      dvAdds.mkString("\n"))
  }

  test("partitioned upsert with partition-sourced keys: pruned kill scan stays exact, nulls included") {
    val base = freshDir()
    val init = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, null.asInstanceOf[String], 3.0))
      .toDF("id", "name", "score")
    DeltaLogWriter.write(init, base, partitionBy = Seq("name"))
    // keys (id, name) cover the partition column → the kill scan prunes
    // to the batch's partitions (b and the null partition); correctness
    // must be identical to the whole-table scan, null keys matching
    // null-safely through __HIVE_DEFAULT_PARTITION__
    val batch = Seq((2L, "b", 20.0), (3L, null.asInstanceOf[String], 30.0))
      .toDF("id", "name", "score")
    val (v, nDel) = DeltaLogWriter.upsert(spark, base, batch.coalesce(1),
      Seq("id", "name"))
    assert(v == 1L && nDel == 2L, s"v=$v nDel=$nDel")
    val got = DeltaLogReader.read(spark, base).select("id", "score")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got == Set((1L, 1.0), (2L, 20.0), (3L, 30.0)), got)
    // partition a's file was never touched: no DV re-add names it
    val lines = scala.io.Source.fromFile(new java.io.File(
      new java.io.File(base, "_delta_log"), f"$v%020d.json")).getLines().toSeq
    assert(!lines.exists(l => l.contains("name=a") && l.contains("deletionVector")),
      lines.mkString("\n"))
  }

  test("mapped upsert resolves renamed keys; appended parquet carries PHYSICAL names") {
    val base = freshDir()
    DeltaLogWriter.write(Seq((1L, 10L), (2L, 20L)).toDF("id", "amount")
      .coalesce(1), base)                                             // v0
    DeltaLogWriter.enableColumnMapping(spark, base)                   // v1
    DeltaLogWriter.renameColumn(spark, base, "amount", "total")       // v2
    val preParts = new java.io.File(base).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).map(_.getName).toSet
    // upsert speaks the RENAMED logical schema; key resolution goes
    // through physicalName (the renamed column's footers say 'amount')
    val (v, nDel) = DeltaLogWriter.upsert(spark, base,
      Seq((2L, 222L), (9L, 90L)).toDF("id", "total").coalesce(1), Seq("id"))
    assert(v == 3L && nDel == 1L, s"v=$v nDel=$nDel")
    assert(DeltaLogReader.read(spark, base).select("id", "total").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 10L), (2L, 222L), (9L, 90L)))
    // the upsert's new part files are PHYSICAL-named — a real Delta
    // reader resolves them through the same mapping
    val newParts = new java.io.File(base).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(_.getName).toSet.diff(preParts)
    assert(newParts.nonEmpty)
    newParts.foreach { p =>
      assert(spark.read.parquet(s"$base/$p").columns.toSeq == Seq("id", "amount"),
        s"$p should carry physical names")
    }
    // mapped deleteWhere on the renamed column composes on top
    val (v2, nDel2) = DeltaLogWriter.deleteWhere(spark, base, col("total") > 100L)
    assert(v2 == 4L && nDel2 == 1L)
    assert(DeltaLogReader.read(spark, base).select("id").collect()
      .map(_.getLong(0)).toSet == Set(1L, 9L))
    // mapping + CDF stays refused loudly
    DeltaLogWriter.setTableProperties(spark, base,
      Map("delta.enableChangeDataFeed" -> "true"))
    val e = intercept[IllegalArgumentException](DeltaLogWriter.upsert(
      spark, base, Seq((1L, 11L)).toDF("id", "total"), Seq("id")))
    assert(e.getMessage.contains("Change Data"), e.getMessage)
  }

  test("restore reverts the file set, DV attachments included; history intact") {
    import org.apache.spark.sql.SaveMode
    val base = freshDir()
    val odds = (1L to 10L).filter(_ % 2 == 1).toSet
    DeltaLogWriter.write(df(1L to 10L).coalesce(1), base)        // v0
    DeltaLogWriter.deleteWhere(spark, base, col("id") % 2 === 0) // v1: DVs
    DeltaLogWriter.optimize(spark, base)                         // v2: purged
    assert(ids(DeltaLogReader.read(spark, base)) == odds)
    // restore to the DV-carrying version: same rows, but served through
    // the ORIGINAL file + its reattached deletion vector again
    val v = DeltaLogWriter.restore(spark, base, toVersion = 1L)
    assert(v == 3L)
    assert(ids(DeltaLogReader.read(spark, base)) == odds)
    intercept[IllegalArgumentException](                  // DVs are BACK
      DeltaLogReader.activeFiles(spark, base))
    // restore further back, to the pre-delete state: the evens revive
    assert(DeltaLogWriter.restore(spark, base, toVersion = 0L) == 4L)
    assert(ids(DeltaLogReader.read(spark, base)) == (1L to 10L).toSet)
    // the pre-restore states are still time-travelable
    assert(ids(DeltaLogReader.read(spark, base, asOf = Some(2L))) == odds)
    // restoring to the current state is a no-op
    assert(DeltaLogWriter.restore(spark, base, toVersion = 4L) == 4L)
    // a vacuumed-away restore point refuses instead of committing corpses
    DeltaLogWriter.vacuum(spark, base,
      olderThanMs = System.currentTimeMillis() + 3600_000L)
    val e = intercept[IllegalArgumentException](
      DeltaLogWriter.restore(spark, base, toVersion = 2L))
    assert(e.getMessage.contains("gone"), e.getMessage)
  }

  test("cleanLog prunes pre-checkpoint commits; replay survives, history doesn't") {
    import org.apache.spark.sql.SaveMode
    val base = freshDir()
    DeltaLogWriter.write(df(Seq(1L)).coalesce(1), base)
    DeltaLogWriter.write(df(Seq(2L)).coalesce(1), base)
    DeltaLogWriter.checkpoint(spark, base)            // at v1
    DeltaLogWriter.write(df(Seq(3L)).coalesce(1), base)
    assert(DeltaLogWriter.cleanLog(spark, base) == 1) // v0 pruned
    val log = new java.io.File(base, "_delta_log")
    assert(!new java.io.File(log, f"${0L}%020d.json").exists())
    assert(new java.io.File(log, f"${1L}%020d.json").exists())
    // current state replays from checkpoint + later commits
    assert(ids(DeltaLogReader.read(spark, base)) == Set(1L, 2L, 3L))
    // the next write sequences correctly after truncation
    DeltaLogWriter.write(df(Seq(4L)).coalesce(1), base, mode = SaveMode.Overwrite)
    assert(ids(DeltaLogReader.read(spark, base)) == Set(4L))
    // no checkpoint → loud refusal
    val bare = freshDir()
    DeltaLogWriter.write(df(Seq(9L)).coalesce(1), bare)
    val e = intercept[IllegalArgumentException](
      DeltaLogWriter.cleanLog(spark, bare))
    assert(e.getMessage.contains("checkpoint"), e.getMessage)
  }

  test("vacuum keeps active files and their DV sidecars") {
    val base = freshDir()
    DeltaLogWriter.write(df(1L to 6L).coalesce(1), base)
    DeltaLogWriter.deleteWhere(spark, base, col("id") > 4L)
    val survivors = Set(1L, 2L, 3L, 4L)
    assert(ids(DeltaLogReader.read(spark, base)) == survivors)
    // the sidecar .bin is not in any add path, but IS referenced by the
    // active add's DV descriptor — the sweep must keep it
    val n = DeltaLogWriter.vacuum(spark, base,
      olderThanMs = System.currentTimeMillis() + 3600_000L)
    assert(n == 0, s"deleted $n")
    assert(ids(DeltaLogReader.read(spark, base)) == survivors)
  }

  test("checkpoint fidelity: DV descriptors and feature gates survive cleanLog + cold replay") {
    val base = freshDir()
    DeltaLogWriter.write(df(Seq(1L, 2L, 3L)).coalesce(1), base)      // v0
    DeltaLogWriter.write(df(Seq(4L, 5L, 6L)).coalesce(1), base)      // v1
    val (v, n) = DeltaLogWriter.deleteWhere(spark, base, col("id") % 2 === 0) // v2: DVs
    assert(v == 2L && n == 3L)
    val (beforeEntries, beforeMeta) = DeltaLogReader.replayState(spark, base, None)
    assert(beforeEntries.exists(_._2.nonEmpty), "fixture must carry DVs")
    assert(DeltaLogWriter.checkpoint(spark, base) == 2L)
    DeltaLogWriter.cleanLog(spark, base)
    // FULL truncation: drop the checkpoint-version commit too, so the
    // replay below reconstructs from the checkpoint parquet ALONE
    val log = new java.io.File(base, "_delta_log")
    assert(new java.io.File(log, f"${2L}%020d.json").delete())
    assert(!log.listFiles().exists(_.getName.endsWith(".json")))
    val (afterEntries, afterMeta) = DeltaLogReader.replayState(spark, base, None)
    // identical state: same files in the same order, descriptors equal
    // as parsed JSON (field spelling may reorder through the parquet
    // struct round-trip; the VALUES must not drift)
    val m = new com.fasterxml.jackson.databind.ObjectMapper
    assert(afterEntries.map(_._1) == beforeEntries.map(_._1))
    assert(afterEntries.map(_._2.map(m.readTree)) ==
      beforeEntries.map(_._2.map(m.readTree)))
    assert(afterMeta.isDefined && afterMeta == beforeMeta.map(identity))
    // the row set the descriptors encode: odd ids only, cold
    assert(ids(DeltaLogReader.read(spark, base)) == Set(1L, 3L, 5L))
    // the checkpoint's protocol row kept the DV feature gates a real
    // reader refuses without
    val ck = spark.read.parquet(
      new java.io.File(log, f"${2L}%020d.checkpoint.parquet").toString)
    val proto = ck.where("protocol IS NOT NULL")
      .selectExpr("protocol.minReaderVersion", "protocol.readerFeatures",
        "protocol.writerFeatures").collect().head
    assert(proto.getInt(0) == 3)
    assert(proto.getSeq[String](1).contains("deletionVectors"))
    assert(proto.getSeq[String](2).contains("deletionVectors"))
    // and a DV re-checkpoint of the truncated table still round-trips
    assert(DeltaLogWriter.checkpoint(spark, base) == 2L)
    assert(ids(DeltaLogReader.read(spark, base)) == Set(1L, 3L, 5L))
  }

  test("multi-part checkpoint: the spec spelling round-trips DV state through cleanLog") {
    val base = freshDir()
    DeltaLogWriter.write(df(Seq(1L, 2L)).coalesce(1), base)          // v0
    DeltaLogWriter.write(df(Seq(3L, 4L)).coalesce(1), base)          // v1
    DeltaLogWriter.write(df(Seq(5L, 6L)).coalesce(1), base)          // v2
    DeltaLogWriter.deleteWhere(spark, base, col("id") % 2 === 0)     // v3: DVs
    val before = DeltaLogReader.replayState(spark, base, None)._1
    assert(DeltaLogWriter.checkpoint(spark, base, parts = 3) == 3L)
    // three parts under the %020d.checkpoint.%010d.%010d.parquet spelling
    val log = new java.io.File(base, "_delta_log")
    val partNames = log.listFiles().map(_.getName)
      .filter(n => n.contains(".checkpoint.") && n.endsWith(".parquet")).sorted
    assert(partNames.toSeq == Seq(
      f"${3L}%020d.checkpoint.${1}%010d.${3}%010d.parquet",
      f"${3L}%020d.checkpoint.${2}%010d.${3}%010d.parquet",
      f"${3L}%020d.checkpoint.${3}%010d.${3}%010d.parquet"), partNames.mkString(", "))
    val ptr = scala.io.Source.fromFile(new java.io.File(log, "_last_checkpoint"))
      .getLines().next()
    assert(ptr.contains("\"parts\":3"), ptr)
    DeltaLogWriter.cleanLog(spark, base)
    assert(new java.io.File(log, f"${3L}%020d.json").delete()) // full truncation
    val after = DeltaLogReader.replayState(spark, base, None)._1
    val m = new com.fasterxml.jackson.databind.ObjectMapper
    assert(after.map(_._1).toSet == before.map(_._1).toSet)
    assert(after.toMap.view.mapValues(_.map(m.readTree)).toMap ==
      before.toMap.view.mapValues(_.map(m.readTree)).toMap)
    assert(ids(DeltaLogReader.read(spark, base)) == Set(1L, 3L, 5L))
    // a later append + re-checkpoint (single-part) over the multi-part
    // base keeps working — protocol/metaData recovered from the parts
    DeltaLogWriter.write(df(Seq(9L)).coalesce(1), base)              // v4
    assert(DeltaLogWriter.checkpoint(spark, base) == 4L)
    assert(ids(DeltaLogReader.read(spark, base)) == Set(1L, 3L, 5L, 9L))
    // more parts than add files: the trailing part writes EMPTY but
    // must still exist (every named part is load-bearing for the
    // pointer) and the replay must stay exact
    val small = freshDir()
    DeltaLogWriter.write(df(Seq(1L)).coalesce(1), small)
    DeltaLogWriter.write(df(Seq(2L)).coalesce(1), small)
    assert(DeltaLogWriter.checkpoint(spark, small, parts = 3) == 1L)
    val smallParts = new java.io.File(small, "_delta_log").listFiles()
      .map(_.getName).count(n => n.contains(".checkpoint.") && n.endsWith(".parquet"))
    assert(smallParts == 3)
    DeltaLogWriter.cleanLog(spark, small)
    new java.io.File(small, "_delta_log").listFiles()
      .filter(_.getName.endsWith(".json")).foreach(f => assert(f.delete()))
    assert(ids(DeltaLogReader.read(spark, small)) == Set(1L, 2L))
  }

  test("checkpoint fidelity: column-mapping metaData survives cleanLog + cold replay") {
    val base = freshDir()
    // hand-written name-mode table (this repo's writers refuse to CREATE
    // mapped tables; the reader serves them — the checkpoint must too)
    val dataDir = new java.io.File(base); dataDir.mkdirs()
    Seq((1L, 10L), (2L, 20L)).toDF("col-aa", "col-bb")
      .coalesce(1).write.parquet(s"$base/.tmp_map")
    val part = new java.io.File(s"$base/.tmp_map").listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).head
    assert(part.renameTo(new java.io.File(base, "a.parquet")))
    val jm = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
    val schemaString = """{"type":"struct","fields":[""" +
      """{"name":"amount","type":"long","nullable":true,"metadata":{"delta.columnMapping.id":2,"delta.columnMapping.physicalName":"col-bb"}},""" +
      """{"name":"id","type":"long","nullable":true,"metadata":{"delta.columnMapping.id":1,"delta.columnMapping.physicalName":"col-aa"}}]}"""
    val logDir = new java.io.File(base, "_delta_log"); logDir.mkdirs()
    val size = new java.io.File(base, "a.parquet").length()
    val w = new java.io.PrintWriter(new java.io.File(logDir, f"${0L}%020d.json"))
    w.println("""{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""")
    w.println(s"""{"metaData":{"id":"m","format":{"provider":"parquet","options":{}},""" +
      s""""schemaString":${jm.writeValueAsString(schemaString)},"partitionColumns":[],""" +
      s""""configuration":{"delta.columnMapping.mode":"name"},"createdTime":0}}""")
    w.println(s"""{"add":{"path":"a.parquet","partitionValues":{},"size":$size,""" +
      s""""modificationTime":0,"dataChange":true}}""")
    w.close()
    val beforeMeta = DeltaLogReader.replayState(spark, base, None)._2
    assert(DeltaLogWriter.checkpoint(spark, base) == 0L)
    // full truncation: the checkpoint parquet is the only log state left
    assert(new java.io.File(logDir, f"${0L}%020d.json").delete())
    val afterMeta = DeltaLogReader.replayState(spark, base, None)._2
    assert(afterMeta.isDefined && afterMeta == beforeMeta,
      s"metaData drifted through the checkpoint:\n$beforeMeta\nvs\n$afterMeta")
    // the mapping still SERVES: logical names over physical footers, cold
    val d = DeltaLogReader.read(spark, base)
    assert(d.columns.toSeq == Seq("amount", "id"))
    assert(d.orderBy("id").collect().map(r => (r.getLong(1), r.getLong(0))).toSeq
      == Seq((1L, 10L), (2L, 20L)))
  }
}
