package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** The maintenance tier's laws — compact / upsert / expireSnapshots:
  * compaction serves exactly the MoR state it replaced and restores
  * appendability; upsert is latest-write-wins under the v2 strict
  * sequence rule (including the v1→v2 sequence-0 upgrade for existing
  * history); expiration keeps everything any retained snapshot reaches
  * and physically deletes the rest, never touching the current
  * snapshot. */
class IcebergMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    new java.io.File(java.nio.file.Files.createTempDirectory("icem").toString,
      "tbl").toString

  private def df(ids: Seq[Long]) =
    ids.map(i => (i, s"name_$i", i * 1.5)).toDF("id", "name", "score")

  private def ids(d: org.apache.spark.sql.DataFrame): Set[Long] =
    d.select("id").collect().map(_.getLong(0)).toSet

  private def scores(d: org.apache.spark.sql.DataFrame): Map[Long, Double] =
    d.select("id", "score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap

  // ---------------------------------------------------------------- compact

  test("compact rewrites the MoR state, drops delete files, restores appends") {
    val base = freshDir()
    IcebergWriter.commitAppend(spark, base, df(1L to 10L).coalesce(1), 101L, 1000L)
    IcebergWriter.deleteWhere(spark, base, col("id") % 3 === 0, 102L, 2000L)
    // pre-compact: appends are refused (delete manifests present)
    val e = intercept[IllegalArgumentException](IcebergWriter.commitAppend(
      spark, base, df(Seq(99L)), 103L, 3000L))
    assert(e.getMessage.contains("DELETE manifests"), e.getMessage)
    val survivors = (1L to 10L).filterNot(_ % 3 == 0).toSet

    val v = IcebergWriter.compact(spark, base, 103L, 3000L)
    assert(v == 3)
    assert(ids(Iceberg.read(spark, base)) == survivors)
    val planned = Iceberg.planFiles(spark, base)
    assert(planned.size == 1 && planned.head.contains("compact103"),
      planned.mkString(", "))
    // history intact: both prior snapshots still serve their state
    assert(ids(Iceberg.readSnapshot(spark, base, 101L)) == (1L to 10L).toSet)
    assert(ids(Iceberg.readSnapshot(spark, base, 102L)) == survivors)
    // the loop closes: append and row-level delete are legal again
    IcebergWriter.commitAppend(spark, base, df(Seq(11L)).coalesce(1), 104L, 4000L)
    assert(ids(Iceberg.read(spark, base)) == survivors + 11L)
    IcebergWriter.deleteWhere(spark, base, col("id") === 11L, 105L, 5000L)
    assert(ids(Iceberg.read(spark, base)) == survivors)
  }

  test("compact sizes output files from live bytes, not file count") {
    val base = freshDir()
    IcebergWriter.commitAppend(spark, base,
      df(1L to 40L).repartitionByRange(4, $"id"), 101L, 1000L)
    assert(Iceberg.planFiles(spark, base).size == 4)
    // a huge target bin-packs all four into one
    IcebergWriter.compact(spark, base, 102L, 2000L)
    assert(Iceberg.planFiles(spark, base).size == 1)
    assert(ids(Iceberg.read(spark, base)) == (1L to 40L).toSet)
    // a tiny target forces a multi-file rewrite that still round-trips
    IcebergWriter.compact(spark, base, 103L, 3000L, targetFileBytes = 1L)
    assert(Iceberg.planFiles(spark, base).size > 1)
    assert(ids(Iceberg.read(spark, base)) == (1L to 40L).toSet)
  }

  test("compacting a fully-deleted table yields a typed empty current state") {
    val base = freshDir()
    IcebergWriter.commitAppend(spark, base, df(Seq(1L)).coalesce(1), 101L, 1000L)
    IcebergWriter.deleteWhere(spark, base, col("id") > 0L, 102L, 2000L)
    // the data FILE is still live (the delete is merge-on-read), so the
    // compactor rewrites the 0 surviving rows rather than refusing
    IcebergWriter.compact(spark, base, 103L, 3000L)
    val empty = Iceberg.read(spark, base)
    assert(empty.count() == 0L)
    assert(empty.columns.toSeq == Seq("id", "name", "score"))
    // and the emptied table accepts appends again
    IcebergWriter.commitAppend(spark, base, df(Seq(7L)).coalesce(1), 104L, 4000L)
    assert(ids(Iceberg.read(spark, base)) == Set(7L))
  }

  test("clustered compact yields disjoint bounds: a point query plans 1 file") {
    val base = freshDir()
    // interleaved ids in one file: unsorted bounds would span everything
    IcebergWriter.commitAppend(spark, base,
      df(Seq(1L, 40L, 2L, 39L, 3L, 38L, 4L, 37L, 5L, 36L,
        6L, 35L, 7L, 34L, 8L, 33L)).coalesce(1), 101L, 1000L)
    IcebergWriter.compact(spark, base, 102L, 2000L,
      sortBy = Seq("id"), numFiles = Some(4))
    assert(Iceberg.planFiles(spark, base).size == 4)
    // every copy of a key lives in ONE range partition → exactly 1 file
    val hit = Iceberg.planFiles(spark, base, Seq(Iceberg.ColRange("id", 7L, 7L)))
    assert(hit.size == 1, hit.mkString(", "))
    assert(ids(Iceberg.read(spark, base)).size == 16)
    // an unknown sort column refuses
    val e = intercept[IllegalArgumentException](IcebergWriter.compact(
      spark, base, 103L, 3000L, sortBy = Seq("nope")))
    assert(e.getMessage.contains("nope"), e.getMessage)
  }

  test("partitioned compact: one file per partition, pruning + history survive, MoR purged") {
    val base = freshDir()
    def mk(r: Seq[Long]) = r.map(i => (i, i % 3, i * 1.5))
      .toDF("id", "day", "score")
    // two appends per partition → 6 small files across 3 day-partitions
    IcebergWriter.commitAppend(spark, base, mk(1L to 6L).coalesce(1),
      961L, 1000L, partitionBy = Seq("day"))
    IcebergWriter.commitAppend(spark, base, mk(7L to 12L).coalesce(1),
      962L, 2000L)
    // MoR state on top: upsert rewrites (2, day 2)'s score via equality
    // delete — compact must serve THIS state and purge the delete files
    IcebergWriter.upsert(spark, base,
      Seq((2L, 2L, 99.5)).toDF("id", "day", "score"),
      Seq("id", "day"), 963L, 3000L)
    val before = Iceberg.planFiles(spark, base)
    assert(before.size >= 6, before.mkString(", "))

    val v = IcebergWriter.compact(spark, base, 964L, 4000L)
    assert(v == 4)
    // exactly one rewritten file per partition value
    val planned = Iceberg.planFiles(spark, base)
    assert(planned.size == 3 && planned.forall(_.contains("compact964")),
      planned.mkString(", "))
    // content is the MoR state it replaced
    assert(ids(Iceberg.read(spark, base)) == (1L to 12L).toSet)
    assert(scores(Iceberg.read(spark, base))(2L) == 99.5)
    // partition pruning SURVIVES the rewrite: a day probe plans 1 file
    val hit = Iceberg.planFiles(spark, base, Seq(Iceberg.ColRange("day", 1L, 1L)))
    assert(hit.size == 1, hit.mkString(", "))
    assert(ids(Iceberg.readPruned(spark, base,
      Seq(Iceberg.ColRange("day", 1L, 1L))).where(col("day") === 1L)) ==
      (1L to 12L).filter(_ % 3 == 1).toSet)
    // history intact; the loop closes: append + upsert legal again
    assert(ids(Iceberg.readSnapshot(spark, base, 961L)) == (1L to 6L).toSet)
    assert(scores(Iceberg.readSnapshot(spark, base, 963L))(2L) == 99.5)
    IcebergWriter.commitAppend(spark, base, mk(Seq(13L)).coalesce(1), 965L, 5000L)
    assert(ids(Iceberg.read(spark, base)) == (1L to 13L).toSet)
    // sortBy orders rows inside each partition's single file
    IcebergWriter.compact(spark, base, 966L, 6000L, sortBy = Seq("id"))
    assert(Iceberg.planFiles(spark, base).size == 3)
    assert(ids(Iceberg.read(spark, base)) == (1L to 13L).toSet)
  }

  test("partitioned compact with a HIDDEN transform keeps transform pruning") {
    val base = freshDir()
    def mk(r: Seq[Long]) = r.map(i => (i, s"n_$i", i * 1.5))
      .toDF("id", "name", "score")
    IcebergWriter.commitAppend(spark, base, mk(1L to 8L).coalesce(1),
      971L, 1000L, partitionBy = Seq("bucket(4, id)"))
    IcebergWriter.commitAppend(spark, base, mk(9L to 16L).coalesce(1),
      972L, 2000L)
    IcebergWriter.compact(spark, base, 973L, 3000L)
    val planned = Iceberg.planFiles(spark, base)
    assert(planned.size <= 4 && planned.forall(_.contains("compact973")),
      planned.mkString(", "))
    assert(ids(Iceberg.read(spark, base)) == (1L to 16L).toSet)
    // a point-id probe maps through bucket(4, ·): fewer files than all
    val hit = Iceberg.planFiles(spark, base, Seq(Iceberg.ColRange("id", 7L, 7L)))
    assert(hit.size < planned.size, hit.mkString(", "))
  }

  test("scoped compact rewrites ONLY the named partition; carried files byte-identical") {
    val base = freshDir()
    def mk(r: Seq[Long]) = r.map(i => (i, i % 3, i * 1.5))
      .toDF("id", "day", "score")
    IcebergWriter.commitAppend(spark, base, mk(1L to 6L).coalesce(1),
      981L, 1000L, partitionBy = Seq("day"))
    IcebergWriter.commitAppend(spark, base, mk(7L to 12L).coalesce(1),
      982L, 2000L)
    // MoR on top of the SCOPED partition: the rewrite must fold it in
    IcebergWriter.upsert(spark, base,
      Seq((4L, 1L, 77.7)).toDF("id", "day", "score"),
      Seq("id", "day"), 983L, 3000L)
    val before = Iceberg.planFiles(spark, base)
    val untouchedBefore = before.filterNot(_.contains("day-rewrite")).toSet

    val v = IcebergWriter.compactScoped(spark, base, 984L, 4000L,
      Seq(graft.plans.ScopeTerm("day", "=", "1")))
    assert(v == 4)
    val after = Iceberg.planFiles(spark, base)
    // one fresh file for day=1; every OTHER file carried verbatim
    assert(after.count(_.contains("compact984")) == 1, after.mkString(", "))
    assert(after.filterNot(_.contains("compact984")).toSet ==
      untouchedBefore.filterNot(p =>
        ids(spark.read.parquet(p)).forall(_ % 3 == 1)),
      after.mkString(", "))
    // content is the MoR state — the scoped upsert survives the rewrite
    assert(ids(Iceberg.read(spark, base)) == (1L to 12L).toSet)
    assert(scores(Iceberg.read(spark, base))(4L) == 77.7)
    // partition pruning intact on BOTH lanes
    assert(Iceberg.planFiles(spark, base,
      Seq(Iceberg.ColRange("day", 1L, 1L))).size == 1)
    assert(ids(Iceberg.readPruned(spark, base,
      Seq(Iceberg.ColRange("day", 0L, 0L))).where(col("day") === 0L)) ==
      (1L to 12L).filter(_ % 3 == 0).toSet)
    // history: pre-compact snapshots still serve their state
    assert(ids(Iceberg.readSnapshot(spark, base, 982L)) == (1L to 12L).toSet)
    assert(scores(Iceberg.readSnapshot(spark, base, 983L))(4L) == 77.7)
    // a later MoR op still sequences ABOVE the rewrite (the tier holds)
    IcebergWriter.upsert(spark, base,
      Seq((4L, 1L, 88.8)).toDF("id", "day", "score"),
      Seq("id", "day"), 985L, 5000L)
    assert(scores(Iceberg.read(spark, base))(4L) == 88.8)
    // refusals: empty scope by value; non-partition column; unpartitioned
    val eEmpty = intercept[IllegalArgumentException](
      IcebergWriter.compactScoped(spark, base, 986L, 6000L, Seq(graft.plans.ScopeTerm("day", "=", "9"))))
    assert(eEmpty.getMessage.contains("no active files"), eEmpty.getMessage)
    val eCol = intercept[IllegalArgumentException](
      IcebergWriter.compactScoped(spark, base, 986L, 6000L, Seq(graft.plans.ScopeTerm("id", "=", "1"))))
    assert(eCol.getMessage.contains("not a partition field"), eCol.getMessage)
    val flat = freshDir()
    IcebergWriter.commitAppend(spark, flat, df(Seq(1L)), 991L, 1000L)
    val eFlat = intercept[IllegalArgumentException](
      IcebergWriter.compactScoped(spark, flat, 992L, 2000L, Seq(graft.plans.ScopeTerm("id", "=", "1"))))
    assert(eFlat.getMessage.contains("UNPARTITIONED"), eFlat.getMessage)
    // hidden-transform scope DISPATCHES through the transform: equality
    // on a bucket field compacts exactly that bucket's files; a RANGE on
    // a bucket refuses by name (hash order is meaningless)
    val bkt = freshDir()
    IcebergWriter.commitAppend(spark, bkt, df(Seq(1L, 2L)).coalesce(1),
      993L, 1000L, partitionBy = Seq("bucket(4, id)"))
    IcebergWriter.commitAppend(spark, bkt, df(Seq(1L, 2L)).coalesce(1),
      995L, 1500L, partitionBy = Seq("bucket(4, id)"))
    val b1 = IcebergTransforms.bucket(4, "long", 1L)
    val vB = IcebergWriter.compactScoped(spark, bkt, 994L, 2000L,
      Seq(graft.plans.ScopeTerm("id_bucket", "=", b1.toString)))
    assert(vB > 0)
    // the scoped bucket compacted to one file; content intact (id=1
    // twice, id=2 twice — append×2)
    val afterB = Iceberg.planFiles(spark, bkt)
    assert(afterB.count(_.contains("compact994")) == 1, afterB.mkString(", "))
    assert(Iceberg.read(spark, bkt).where(col("id") === 1L).count() == 2L)
    assert(Iceberg.read(spark, bkt).count() == 4L)
    val eBkt = intercept[IllegalArgumentException](
      IcebergWriter.compactScoped(spark, bkt, 996L, 3000L,
        Seq(graft.plans.ScopeTerm("id_bucket", ">=", "0"))))
    assert(eBkt.getMessage.contains("equality"), eBkt.getMessage)
  }

  // ----------------------------------------------------------------- upsert

  test("upsert is latest-write-wins per key; upserts stack; history intact") {
    val base = freshDir()
    IcebergWriter.commitAppend(spark, base, df(1L to 5L).coalesce(1), 101L, 1000L)
    // first upsert: replace 3 and 4, insert 11 (v1 history → sequence 0)
    val up1 = Seq((3L, "n3", 30.0), (4L, "n4", 40.0), (11L, "n11", 110.0))
      .toDF("id", "name", "score").coalesce(1)
    val v = IcebergWriter.upsert(spark, base, up1, Seq("id"), 102L, 2000L)
    assert(v == 2)
    val s1 = scores(Iceberg.read(spark, base))
    assert(s1.keySet == Set(1L, 2L, 3L, 4L, 5L, 11L))
    assert(s1(3L) == 30.0 && s1(4L) == 40.0 && s1(1L) == 1.5)
    // second upsert: 4 again (wins over upsert 1) and a fresh 12
    val up2 = Seq((4L, "n4b", 400.0), (12L, "n12", 120.0))
      .toDF("id", "name", "score").coalesce(1)
    IcebergWriter.upsert(spark, base, up2, Seq("id"), 103L, 3000L)
    val s2 = scores(Iceberg.read(spark, base))
    assert(s2(4L) == 400.0 && s2(3L) == 30.0 && s2(12L) == 120.0)
    assert(s2.keySet == Set(1L, 2L, 3L, 4L, 5L, 11L, 12L))
    // time travel: each snapshot serves its own state
    assert(scores(Iceberg.readSnapshot(spark, base, 101L))(3L) == 4.5)
    assert(scores(Iceberg.readSnapshot(spark, base, 102L))(4L) == 40.0)
  }

  test("upsert composes with position deletes and with compaction") {
    val base = freshDir()
    IcebergWriter.commitAppend(spark, base, df(1L to 10L).coalesce(1), 101L, 1000L)
    IcebergWriter.deleteWhere(spark, base, col("id") % 2 === 0, 102L, 2000L)
    // 3 exists (replaced), 4 was position-deleted (re-inserted)
    val up = Seq((3L, "n3", 30.0), (4L, "n4", 40.0))
      .toDF("id", "name", "score").coalesce(1)
    IcebergWriter.upsert(spark, base, up, Seq("id"), 103L, 3000L)
    val s = scores(Iceberg.read(spark, base))
    assert(s.keySet == Set(1L, 3L, 4L, 5L, 7L, 9L))
    assert(s(3L) == 30.0 && s(4L) == 40.0 && s(5L) == 7.5)
    // compaction flattens the whole MoR stack into plain files
    IcebergWriter.compact(spark, base, 104L, 4000L)
    assert(scores(Iceberg.read(spark, base)) == s)
    assert(Iceberg.planFiles(spark, base).size == 1)
  }

  test("upsert appends duplicate batch keys as-is and gates its scope") {
    val base = freshDir()
    IcebergWriter.commitAppend(spark, base, df(Seq(1L, 2L)).coalesce(1), 101L, 1000L)
    // duplicate key IN the batch: both rows land (delete only hits seq < N)
    val dup = Seq((2L, "a", 1.0), (2L, "b", 2.0))
      .toDF("id", "name", "score").coalesce(1)
    IcebergWriter.upsert(spark, base, dup, Seq("id"), 102L, 2000L)
    val rows = Iceberg.read(spark, base).collect()
    assert(rows.length == 3) // 1 survivor + both batch rows
    // unknown key column
    val e1 = intercept[IllegalArgumentException](IcebergWriter.upsert(
      spark, base, df(Seq(9L)), Seq("nope"), 103L, 3000L))
    assert(e1.getMessage.contains("nope"), e1.getMessage)
    // schema drift
    val e2 = intercept[IllegalArgumentException](IcebergWriter.upsert(
      spark, base, Seq((1L, "x")).toDF("id", "name"), Seq("id"), 103L, 3000L))
    assert(e2.getMessage.contains("does not"), e2.getMessage)
    // empty table: no current snapshot to delete against
    val e3 = intercept[IllegalArgumentException](IcebergWriter.upsert(
      spark, freshDir(), df(Seq(1L)), Seq("id"), 1L, 1L))
    assert(e3.getMessage.contains("metadata"), e3.getMessage)
  }

  test("rollbackTo restores an old state as a NEW snapshot; history linear") {
    val base = freshDir()
    IcebergWriter.commitAppend(spark, base, df(Seq(1L, 2L)).coalesce(1), 101L, 1000L)
    IcebergWriter.commitAppend(spark, base, df(Seq(3L)).coalesce(1), 102L, 2000L)
    val v = IcebergWriter.rollbackTo(spark, base, 101L, 103L, 3000L)
    assert(v == 3)
    assert(ids(Iceberg.read(spark, base)) == Set(1L, 2L))
    // the rolled-over snapshot stays time-travelable; history is linear
    assert(ids(Iceberg.readSnapshot(spark, base, 102L)) == Set(1L, 2L, 3L))
    assert(Iceberg.snapshots(spark, base).map(_._1) == Seq(101L, 102L, 103L))
    // linear history means every writer still works after a rollback
    IcebergWriter.commitAppend(spark, base, df(Seq(4L)).coalesce(1), 104L, 4000L)
    assert(ids(Iceberg.read(spark, base)) == Set(1L, 2L, 4L))
    // unknown target / id reuse refuse
    val e1 = intercept[IllegalArgumentException](
      IcebergWriter.rollbackTo(spark, base, 999L, 105L, 5000L))
    assert(e1.getMessage.contains("no such"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      IcebergWriter.rollbackTo(spark, base, 101L, 104L, 5000L))
    assert(e2.getMessage.contains("already exists"), e2.getMessage)
  }

  // -------------------------------------------------------- expireSnapshots

  test("expire drops old snapshots and physically deletes unreachable files") {
    val base = freshDir()
    IcebergWriter.commitAppend(spark, base, df(Seq(1L, 2L)).coalesce(1), 101L, 1000L)
    IcebergWriter.commitAppend(spark, base, df(Seq(3L)).coalesce(1), 102L, 2000L)
    val oldFiles = Iceberg.planFiles(spark, base)
    IcebergWriter.compact(spark, base, 103L, 3000L)
    val newFiles = Iceberg.planFiles(spark, base)

    val v = IcebergWriter.expireSnapshots(spark, base, olderThanMs = 2500L)
    assert(v == 4)
    assert(Iceberg.snapshots(spark, base).map(_._1) == Seq(103L))
    assert(ids(Iceberg.read(spark, base)) == Set(1L, 2L, 3L))
    // expired snapshots refuse time travel
    intercept[Exception](Iceberg.readSnapshot(spark, base, 101L).collect())
    // the pre-compaction data files are gone from DISK, the rewrite lives
    oldFiles.foreach(p => assert(!new java.io.File(
      new java.net.URI(p).getPath).exists(), s"expected $p deleted"))
    newFiles.foreach(p => assert(new java.io.File(
      new java.net.URI(p).getPath).exists(), s"expected $p kept"))
  }

  test("expire keeps files a retained snapshot still reaches (carried manifests)") {
    val base = freshDir()
    IcebergWriter.commitAppend(spark, base, df(Seq(1L, 2L)).coalesce(1), 101L, 1000L)
    IcebergWriter.commitAppend(spark, base, df(Seq(3L)).coalesce(1), 102L, 2000L)
    // snapshot 102's manifest list CARRIES 101's manifest — expiring 101
    // must not touch the files 102 serves
    IcebergWriter.expireSnapshots(spark, base, olderThanMs = 1500L)
    assert(Iceberg.snapshots(spark, base).map(_._1) == Seq(102L))
    assert(ids(Iceberg.read(spark, base)) == Set(1L, 2L, 3L))
  }

  // -------------------------------------------------------- metadata tables

  test("metadata tables surface real record/byte accounting and attribution") {
    val base = freshDir()
    IcebergWriter.commitAppend(spark, base, df(1L to 10L).coalesce(1), 101L, 1000L)
    IcebergWriter.deleteWhere(spark, base, col("id") % 2 === 0, 102L, 2000L)
    // snapshots: the full history
    val sn = Iceberg.snapshotsTable(spark, base)
      .select("snapshot_id", "timestamp_ms").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(sn == Seq((101L, 1000L), (102L, 2000L)))
    // manifests: carried data manifest keeps its ORIGINAL attribution
    val mn = Iceberg.manifestsTable(spark, base)
      .select("content", "added_snapshot_id").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(mn == Set((0, 101L), (1, 102L)))
    // files: real footer row counts and on-disk byte sizes
    val fl = Iceberg.filesTable(spark, base).collect().map(r =>
      (r.getAs[Int]("content"), r.getAs[Long]("record_count"),
        r.getAs[Long]("file_size_in_bytes"))).toSet
    assert(fl.map(t => (t._1, t._2)) == Set((0, 10L), (1, 5L)), fl)
    assert(fl.forall(_._3 > 0L), fl)
    // after compaction the live view is ONE data file of the survivors
    IcebergWriter.compact(spark, base, 103L, 3000L)
    val post = Iceberg.filesTable(spark, base).collect().map(r =>
      (r.getAs[Int]("content"), r.getAs[Long]("record_count"))).toSeq
    assert(post == Seq((0, 5L)), post.mkString(", "))
  }

  test("files table carries the upsert's sequence numbers and key deletes") {
    val base = freshDir()
    IcebergWriter.commitAppend(spark, base, df(Seq(1L, 2L)).coalesce(1), 101L, 1000L)
    IcebergWriter.upsert(spark, base,
      Seq((2L, "b", 9.0)).toDF("id", "name", "score").coalesce(1),
      Seq("id"), 102L, 2000L)
    val fl = Iceberg.filesTable(spark, base).collect().map(r =>
      (r.getAs[Int]("content"), r.getAs[Long]("record_count"),
        Option(r.getAs[java.lang.Long]("sequence_number")).map(_.longValue)))
    // v1 history at sequence 0, the upsert's data AND equality delete at 1
    assert(fl.toSet == Set((0, 2L, Some(0L)), (0, 1L, Some(1L)),
      (2, 1L, Some(1L))), fl.mkString(", "))
  }

  test("expire never removes the current snapshot; nothing-to-do is a no-op") {
    val base = freshDir()
    IcebergWriter.commitAppend(spark, base, df(Seq(1L)).coalesce(1), 101L, 1000L)
    IcebergWriter.commitAppend(spark, base, df(Seq(2L)).coalesce(1), 102L, 2000L)
    // a horizon past EVERYTHING: the current snapshot is retained anyway
    val v = IcebergWriter.expireSnapshots(spark, base, olderThanMs = 999999L)
    assert(v == 3)
    assert(Iceberg.snapshots(spark, base).map(_._1) == Seq(102L))
    assert(ids(Iceberg.read(spark, base)) == Set(1L, 2L))
    // nothing left to expire: version unchanged, no metadata rewrite
    assert(IcebergWriter.expireSnapshots(spark, base, olderThanMs = 999999L) == 3)
  }

  test("upsert into a hidden-partitioned table: partition-scoped equality deletes, pruning intact") {
    val base = freshDir()
    // bucket(4, id): the partition source IS the upsert key
    IcebergWriter.commitAppend(spark, base, df(Seq(1L, 2L, 3L, 4L)),
      931L, 1000L, partitionBy = Seq("bucket(4, id)"))
    // batch: ids 2 and 4 exist (latest-write-wins), id 9 is new
    val batch = Seq((2L, "NEW_2", 2.0), (4L, "NEW_4", 4.0), (9L, "NEW_9", 9.0))
      .toDF("id", "name", "score")
    val v = IcebergWriter.upsert(spark, base, batch, Seq("id"), 932L, 2000L)
    assert(v == 2)
    val got = Iceberg.read(spark, base).select("id", "name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "name_1"), (2L, "NEW_2"), (3L, "name_3"),
      (4L, "NEW_4"), (9L, "NEW_9")), got)
    // a point-id probe still maps through bucket(4, ·) and plans ONLY
    // that bucket's files — delete files carry partition structs too,
    // so pruning never resurrects a key from an unopened delete file
    val probe = Iceberg.readPruned(spark, base,
      Seq(Iceberg.ColRange("id", 2L, 2L)))
      .where(col("id") === 2L).select("name").collect().map(_.getString(0)).toSeq
    assert(probe == Seq("NEW_2"), probe)
    // soundness gate: a partition source OUTSIDE the keys refuses
    val base2 = freshDir()
    IcebergWriter.commitAppend(spark, base2, df(Seq(1L, 2L)),
      941L, 1000L, partitionBy = Seq("name"))
    val e = intercept[IllegalArgumentException](IcebergWriter.upsert(
      spark, base2, df(Seq(2L)), Seq("id"), 942L, 2000L))
    assert(e.getMessage.contains("not upsert keys"), e.getMessage)
  }

  test("changesBetween: cheap append attribution, exact MoR diffs, zero-row compaction, rollback inverse") {
    val base = freshDir()
    IcebergWriter.commitAppend(spark, base, df(Seq(1L, 2L, 3L)).coalesce(1), 951L, 1000L)
    IcebergWriter.commitAppend(spark, base, df(Seq(10L)).coalesce(1), 952L, 2000L)
    IcebergWriter.deleteWhere(spark, base, col("id") === 2L, 953L, 3000L)
    IcebergWriter.compact(spark, base, 954L, 4000L, numFiles = Some(1))
    IcebergWriter.rollbackTo(spark, base, 952L, 955L, 5000L)
    def strata(from: Long, to: Long): Seq[(Long, String, Long)] =
      Iceberg.changesBetween(spark, base, from, to)
        .select("id", "_change_type", "_change_snapshot_id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq.sorted
    // append stratum: only the added file's rows, attributed to 952
    assert(strata(951L, 952L) == Seq((10L, "insert", 952L)))
    // MoR delete stratum: exactly the killed row
    assert(strata(952L, 953L) == Seq((2L, "delete", 953L)))
    // compaction: ZERO change rows
    assert(strata(953L, 954L).isEmpty)
    // rollback to 952 resurrects the deleted row — the changelog
    // reports the INVERSE of the delete, nothing else
    assert(strata(954L, 955L) == Seq((2L, "insert", 955L)))
    // the whole range composes per stratum
    assert(strata(951L, 955L) == Seq(
      (2L, "delete", 953L), (2L, "insert", 955L), (10L, "insert", 952L)))
    // refusals: unknown ids, non-forward ranges, clashing columns
    intercept[IllegalArgumentException](Iceberg.changesBetween(spark, base, 999L, 952L))
    intercept[IllegalArgumentException](Iceberg.changesBetween(spark, base, 953L, 952L))
  }

  test("streamChangelog drains incrementally with crash-safe snapshot-id offsets") {
    val base = freshDir()
    val chk = freshDir() + "/chk"
    IcebergWriter.commitAppend(spark, base, df(Seq(1L, 2L)).coalesce(1), 961L, 1000L)
    IcebergWriter.commitAppend(spark, base, df(Seq(10L)).coalesce(1), 962L, 2000L)
    IcebergWriter.deleteWhere(spark, base, col("id") === 1L, 963L, 3000L)
    val batches = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[(Long, String)])]
    def drain(): Seq[Long] =
      Iceberg.streamChangelog(spark, base, chk, startAfterSnapshotId = 961L) {
        (d, snap) => batches += ((snap, d.select("id", "_change_type").collect()
          .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted))
      }
    assert(drain() == Seq(962L, 963L))
    assert(batches.toSeq == Seq(
      (962L, Seq((10L, "insert"))), (963L, Seq((1L, "delete")))))
    // caught up; new snapshots arrive on the next drain only
    assert(drain().isEmpty)
    // a compaction (changeless stratum) + an append: the drain consumes
    // BOTH snapshots but only the append invokes the batch callback
    IcebergWriter.compact(spark, base, 964L, 4000L, numFiles = Some(1))
    IcebergWriter.commitAppend(spark, base, df(Seq(20L)).coalesce(1), 965L, 5000L)
    assert(drain() == Seq(964L, 965L))
    assert(batches.size == 3 && batches.last == ((965L, Seq((20L, "insert")))))
    // crash window: the max surviving offset is the truth — losing the
    // only one replays from startAfter (at-least-once, batches identical)
    val chkF = new java.io.File(chk)
    assert(new java.io.File(chkF, "offset_s965").delete())
    assert(drain() == Seq(962L, 963L, 964L, 965L))
    assert(batches.size == 6)
    // refusals: a startAfter id that is not a snapshot names the ARGUMENT
    val e = intercept[IllegalArgumentException](
      Iceberg.streamChangelog(spark, base, freshDir() + "/c2", 777L)((_, _) => ()))
    assert(e.getMessage.contains("startAfterSnapshotId"), e.getMessage)
    // expired-history resume (offset id no longer in the log) refuses
    // with the fresh-checkpoint remedy
    val chk2 = freshDir() + "/c3"
    val f2 = new java.io.File(chk2); f2.mkdirs()
    val w = new java.io.PrintWriter(new java.io.File(f2, "offset_s55555"))
    w.print("55555"); w.close()
    val e2 = intercept[IllegalArgumentException](
      Iceberg.streamChangelog(spark, base, chk2, 961L)((_, _) => ()))
    assert(e2.getMessage.contains("no longer in"), e2.getMessage)
  }

  test("streamChangelog resumes after the START snapshot expired — only the offset must survive") {
    val base = freshDir()
    val chk = freshDir() + "/chk"
    IcebergWriter.commitAppend(spark, base, df(Seq(1L)).coalesce(1), 971L, 1000L)
    IcebergWriter.commitAppend(spark, base, df(Seq(2L)).coalesce(1), 972L, 2000L)
    IcebergWriter.commitAppend(spark, base, df(Seq(3L)).coalesce(1), 973L, 3000L)
    assert(Iceberg.streamChangelog(spark, base, chk,
      startAfterSnapshotId = 971L)((_, _) => ()) == Seq(972L, 973L))
    // the consumer's INITIAL snapshot (971) expires from the log; its
    // committed offset (973) is still there, so the drain must resume —
    // a long-running consumer cannot be forced to restart because
    // retention caught up with where it STARTED
    IcebergWriter.expireSnapshots(spark, base, olderThanMs = 2500L)
    assert(Iceberg.snapshots(spark, base).map(_._1) == Seq(973L))
    IcebergWriter.commitAppend(spark, base, df(Seq(4L)).coalesce(1), 974L, 4000L)
    val got = scala.collection.mutable.ArrayBuffer.empty[Long]
    assert(Iceberg.streamChangelog(spark, base, chk,
      startAfterSnapshotId = 971L)((d, _) => got ++= ids(d)) == Seq(974L))
    assert(got.toSet == Set(4L))
  }

  // ---------------------------------------------------- rewriteManifests

  /** Data-manifest rows of a table's CURRENT snapshot's manifest list. */
  private def dataManifestRows(base: String): Seq[org.apache.avro.generic.GenericRecord] = {
    val doc = Iceberg.metadata(spark, base)
    val cur = doc.path("current-snapshot-id").asLong(-1L)
    Iceberg.readAvro(spark,
        Iceberg.resolve(base, Iceberg.manifestListOf(doc, base, cur)))
      .filter(r => Option(r.get("content")).forall(_.toString == "0"))
  }

  test("rewriteManifests merges data manifests; attribution, travel, bounds pruning survive") {
    val base = freshDir()
    IcebergWriter.commitAppend(spark, base, df(Seq(1L, 2L)).coalesce(1), 901L, 1000L)
    IcebergWriter.commitAppend(spark, base, df(Seq(10L, 20L)).coalesce(1), 902L, 2000L)
    IcebergWriter.commitAppend(spark, base, df(Seq(100L, 200L)).coalesce(1), 903L, 3000L)
    assert(dataManifestRows(base).size == 3)
    val v = IcebergWriter.rewriteManifests(spark, base, 904L, 4000L)
    assert(v == 4)
    // one data manifest now, serving the identical row set
    assert(dataManifestRows(base).size == 1)
    assert(ids(Iceberg.read(spark, base)) == Set(1L, 2L, 10L, 20L, 100L, 200L))
    // time travel to a pre-rewrite snapshot is untouched
    assert(ids(Iceberg.readSnapshot(spark, base, 902L)) == Set(1L, 2L, 10L, 20L))
    // entry-level attribution survived the merge: the rewrite snapshot
    // ADDS nothing, and a pre-rewrite range still attributes exactly
    assert(ids(Iceberg.readIncremental(spark, base, 901L, 902L)) == Set(10L, 20L))
    assert(ids(Iceberg.readIncremental(spark, base, 903L, 904L)).isEmpty)
    // carried footer bounds still prune inside the merged manifest
    val byId = Iceberg.planFiles(spark, base, Seq(Iceberg.ColRange("id", 150L, 250L)))
    assert(byId.size == 1 && byId.head.contains("snap903"), byId.mkString(", "))
    // appends after the rewrite keep working and stack a NEW manifest
    IcebergWriter.commitAppend(spark, base, df(Seq(300L)).coalesce(1), 905L, 5000L)
    assert(dataManifestRows(base).size == 2)
    assert(ids(Iceberg.readIncremental(spark, base, 904L, 905L)) == Set(300L))
    // nothing to merge after a fresh rewrite: no-op, version unchanged
    val v2 = IcebergWriter.rewriteManifests(spark, base, 906L, 6000L)
    assert(IcebergWriter.rewriteManifests(spark, base, 907L, 7000L) == v2)
    assert(Iceberg.snapshots(spark, base).map(_._1) ==
      Seq(901L, 902L, 903L, 904L, 905L, 906L))
  }

  test("rewriteManifests keeps delete gating (MoR) and recomputes partition summaries") {
    // MoR: position deletes survive the data-manifest merge untouched
    val base = freshDir()
    IcebergWriter.commitAppend(spark, base, df(Seq(1L, 2L, 3L)).coalesce(1), 911L, 1000L)
    IcebergWriter.commitAppend(spark, base, df(Seq(4L, 5L)).coalesce(1), 912L, 2000L)
    IcebergWriter.deleteWhere(spark, base, col("id") % 2 === 0, 913L, 3000L)
    assert(ids(Iceberg.read(spark, base)) == Set(1L, 3L, 5L))
    IcebergWriter.rewriteManifests(spark, base, 914L, 4000L)
    assert(dataManifestRows(base).size == 1)
    assert(ids(Iceberg.read(spark, base)) == Set(1L, 3L, 5L))
    // partitioned: the merged manifest-list row carries RECOMPUTED
    // summaries, so summary pruning still skips it without opening
    val part = freshDir()
    val p1 = Seq((1L, "a"), (2L, "b")).toDF("id", "cat")
    val p2 = Seq((3L, "a"), (4L, "c")).toDF("id", "cat")
    IcebergWriter.commitAppend(spark, part, p1, 921L, 1000L, partitionBy = Seq("cat"))
    IcebergWriter.commitAppend(spark, part, p2, 922L, 2000L)
    IcebergWriter.rewriteManifests(spark, part, 923L, 3000L)
    assert(ids(Iceberg.read(spark, part)) == Set(1L, 2L, 3L, 4L))
    // a disjoint cat range prunes EVERYTHING off the merged summary
    assert(Iceberg.planFiles(spark, part,
      Seq(Iceberg.ColRange("cat", "x", "z"))).isEmpty)
    // a point cat hits exactly that partition's files (one per commit)
    assert(Iceberg.planFiles(spark, part,
      Seq(Iceberg.ColRange("cat", "a", "a"))).size == 2)
  }

  test("rewriteManifests carries the DELETE manifests' partition summaries, not empty ones") {
    // a partitioned MoR table: the upsert's delete manifest records
    // partition summaries; the manifest rewrite must CARRY them (the
    // upsert's carriedSummaries discipline) — emitting empty ones keeps
    // reads correct but costs every later plan the delete-manifest
    // pruning the op exists to preserve
    val base = freshDir()
    IcebergWriter.commitAppend(spark, base, df(Seq(1L, 2L, 3L, 4L)),
      981L, 1000L, partitionBy = Seq("bucket(4, id)"))
    IcebergWriter.upsert(spark, base,
      Seq((2L, "NEW_2", 2.0)).toDF("id", "name", "score"), Seq("id"), 982L, 2000L)
    def delPartitionSummaries(): Seq[Any] = {
      val doc = Iceberg.metadata(spark, base)
      val cur = doc.path("current-snapshot-id").asLong(-1L)
      Iceberg.readAvro(spark,
          Iceberg.resolve(base, Iceberg.manifestListOf(doc, base, cur)))
        .filter(r => Option(r.get("content")).exists(_.toString == "1"))
        .map(r => r.get("partitions"))
    }
    val before = delPartitionSummaries()
    assert(before.nonEmpty && before.forall(p =>
      p != null && p.asInstanceOf[java.util.Collection[_]].size() > 0),
      s"fixture: the upsert's delete manifest must carry summaries ($before)")
    IcebergWriter.rewriteManifests(spark, base, 983L, 3000L)
    val after = delPartitionSummaries()
    assert(after.nonEmpty && after.forall(p =>
      p != null && p.asInstanceOf[java.util.Collection[_]].size() > 0),
      s"rewrite dropped the delete manifests' summaries ($after)")
    // and the table still serves the upserted state
    assert(Iceberg.read(spark, base).where(col("id") === 2L)
      .select("name").collect().map(_.getString(0)).toSeq == Seq("NEW_2"))
  }
}
