package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SnapshotLogSpec extends SparkSpec {

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("snap").toString + "/tbl"

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] = {
    import spark.implicits._
    df.select($"id").as[Long].collect().toSet
  }

  test("append accumulates, overwrite replaces, every version stays readable") {
    import spark.implicits._
    val tbl = freshTable()
    val a = (0L until 10L).toDF("id")
    val b = (10L until 25L).toDF("id")
    val c = (100L until 103L).toDF("id")
    assert(SnapshotLog.commit(spark, tbl, a, overwrite = false) == 1)
    assert(SnapshotLog.commit(spark, tbl, b, overwrite = false) == 2)
    assert(SnapshotLog.commit(spark, tbl, c, overwrite = true) == 3)
    assert(SnapshotLog.versions(spark, tbl) == Seq(1, 2, 3))
    // time travel across the overwrite: old manifests pin the old files
    assert(ids(SnapshotLog.readVersion(spark, tbl, 1)) == (0L until 10L).toSet)
    assert(ids(SnapshotLog.readVersion(spark, tbl, 2)) == (0L until 25L).toSet)
    assert(ids(SnapshotLog.readVersion(spark, tbl, 3)) == (100L until 103L).toSet)
    assert(ids(SnapshotLog.read(spark, tbl)) == (100L until 103L).toSet)
  }

  test("fresh path starts at v1; missing version rejects") {
    import spark.implicits._
    val tbl = freshTable()
    assert(SnapshotLog.latestVersion(spark, tbl) == 0)
    SnapshotLog.commit(spark, tbl, Seq(1L).toDF("id"), overwrite = false)
    assert(SnapshotLog.latestVersion(spark, tbl) == 1)
    assert(intercept[IllegalArgumentException](
      SnapshotLog.readVersion(spark, tbl, 9)).getMessage.contains("does not exist"))
  }

  test("an empty overwrite publishes a readable zero-row version with the schema") {
    import spark.implicits._
    val tbl = freshTable()
    SnapshotLog.commit(spark, tbl, (0L until 10L).toDF("id"), overwrite = false)
    // DELETE-everything as an overwrite: zero data part files, schema
    // carried by the manifest sidecar
    val empty = (0L until 10L).toDF("id").where(lit(false))
    assert(SnapshotLog.commit(spark, tbl, empty, overwrite = true) == 2)
    val v2 = SnapshotLog.read(spark, tbl)
    assert(v2.count() == 0)
    assert(v2.schema.fieldNames.toSeq == Seq("id"))
    // history before the empty overwrite still time-travels
    assert(ids(SnapshotLog.readVersion(spark, tbl, 1)) == (0L until 10L).toSet)
    // and appending after it works
    SnapshotLog.commit(spark, tbl, Seq(7L).toDF("id"), overwrite = false)
    assert(ids(SnapshotLog.read(spark, tbl)) == Set(7L))
  }

  test("expireSnapshots bounds the log: old manifests and their dead data go away") {
    import spark.implicits._
    val tbl = freshTable()
    SnapshotLog.commit(spark, tbl, (0L until 10L).toDF("id").coalesce(1), overwrite = false)
    SnapshotLog.commit(spark, tbl, (10L until 20L).toDF("id").coalesce(1), overwrite = false)
    SnapshotLog.commit(spark, tbl, (50L until 53L).toDF("id").coalesce(1), overwrite = true)
    val (expired, deleted) = SnapshotLog.expireSnapshots(spark, tbl, retainVersions = 1)
    // v1+v2 manifests expired; their two single-file commits are dead
    // (v3's overwrite file is the only live one)
    assert(expired == 2 && deleted == 2)
    assert(SnapshotLog.versions(spark, tbl) == Seq(3))
    assert(ids(SnapshotLog.read(spark, tbl)) == (50L until 53L).toSet)
    // expired versions are unlistable AND unreadable by design
    assert(intercept[IllegalArgumentException](
      SnapshotLog.readVersion(spark, tbl, 1)).getMessage.contains("does not exist"))
    // the log keeps working: the next commit takes the next version number
    assert(SnapshotLog.commit(spark, tbl, Seq(99L).toDF("id"), overwrite = false) == 4)
    assert(ids(SnapshotLog.read(spark, tbl)) == Set(50L, 51L, 52L, 99L))
  }

  test("a manifest past the planning cap refuses the driver collect, loudly") {
    import spark.implicits._
    val tbl = freshTable()
    // 5 range-partitioned files in one commit — over a cap of 3, under the
    // default (repartitionByRange guarantees 5 non-empty writers here)
    SnapshotLog.commit(spark, tbl,
      (0L until 50L).toDF("id").repartitionByRange(5, col("id")), overwrite = false)
    val e = intercept[IllegalArgumentException] {
      SnapshotLog.manifestFiles(spark, tbl, 1, maxFiles = 3)
    }
    assert(e.getMessage.contains("SnapshotLog v1") &&
      e.getMessage.contains("more than 3 files"))
    assert(ids(SnapshotLog.readVersion(spark, tbl, 1)) == (0L until 50L).toSet)
  }

  test("optimize compacts the active set as a NEW version; history intact") {
    import spark.implicits._
    val tbl = freshTable()
    SnapshotLog.commit(spark, tbl,
      (0L until 30L).toDF("id").repartitionByRange(5, col("id")), overwrite = false)
    SnapshotLog.commit(spark, tbl,
      (30L until 50L).toDF("id").repartitionByRange(4, col("id")), overwrite = false)
    val (nv, before, after) = SnapshotLog.optimize(spark, tbl)
    assert(nv == 3 && before == 9 && after == 1, s"($nv, $before, $after)")
    // identical rows in the optimized version…
    assert(ids(SnapshotLog.read(spark, tbl)) == (0L until 50L).toSet)
    // …and every pre-optimize version still reads (files immutable)
    assert(ids(SnapshotLog.readVersion(spark, tbl, 2)) == (0L until 50L).toSet)
    assert(ids(SnapshotLog.readVersion(spark, tbl, 1)) == (0L until 30L).toSet)
    // vacuum after optimize reclaims the fragmented files
    val (live, deleted) = SnapshotLog.vacuum(spark, tbl, retainVersions = 1)
    assert(live == 1 && deleted == 9)
    assert(ids(SnapshotLog.read(spark, tbl)) == (0L until 50L).toSet)
  }

  test("optimize clusterBy produces a key-clustered layout (the ZORDER leg)") {
    import spark.implicits._
    val tbl = freshTable()
    // ids shuffled across 4 files; cluster on id into 2 files — each
    // output file must hold a contiguous id range (disjoint min/max
    // envelopes = the stats-pruning property ZORDER exists for)
    SnapshotLog.commit(spark, tbl,
      (0L until 100L).toDF("id").repartition(4), overwrite = false)
    // tiny target forces 2+ bins on real sizes; use an explicit big target
    // and check clustering via per-file envelopes instead of bin count
    val (nv, _, _) = SnapshotLog.optimize(spark, tbl,
      targetBytes = 2048L, clusterBy = Seq(col("id")))
    val envelopes = SnapshotLog.readVersion(spark, tbl, nv)
      .select(col("_metadata.file_path").as("f"), col("id"))
      .groupBy(col("f")).agg(min("id").as("lo"), max("id").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(envelopes.length > 1, "expected multiple clustered files")
    envelopes.sliding(2).foreach { case Array((_, hi), (lo2, _)) =>
      assert(hi < lo2, s"file envelopes overlap: ${envelopes.mkString(", ")}")
    }
    assert(ids(SnapshotLog.read(spark, tbl)) == (0L until 100L).toSet)
  }

  test("a published version's file set is immutable under later commits") {
    import spark.implicits._
    val tbl = freshTable()
    SnapshotLog.commit(spark, tbl, (0L until 5L).toDF("id"), overwrite = false)
    val before = spark.read.parquet(s"$tbl/_log/v1")
      .select(col("file")).collect().map(_.getString(0)).toSeq
    SnapshotLog.commit(spark, tbl, (5L until 9L).toDF("id"), overwrite = false)
    SnapshotLog.commit(spark, tbl, (9L until 12L).toDF("id"), overwrite = true)
    val after = spark.read.parquet(s"$tbl/_log/v1")
      .select(col("file")).collect().map(_.getString(0)).toSeq
    assert(before == after)
    // and the physical files behind v1 are all still present
    val fs = new org.apache.hadoop.fs.Path(tbl)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(before.forall(f => fs.exists(new org.apache.hadoop.fs.Path(f))))
  }

  test("deleteWhere rewrites ONLY touched files; untouched files move by reference") {
    import spark.implicits._
    val tbl = freshTable()
    // 4 files, ids partitioned by range so the predicate touches exactly 2
    SnapshotLog.commit(spark, tbl,
      (0L until 40L).toDF("id").repartitionByRange(4, $"id"), overwrite = false)
    val v1Files = spark.read.parquet(s"$tbl/_log/v1")
      .select(col("file")).collect().map(_.getString(0)).toSet
    assert(v1Files.size == 4)
    val (nv, deleted, rewritten, kept) =
      SnapshotLog.deleteWhere(spark, tbl, $"id" >= 20L && $"id" < 25L)
    assert(nv == 2 && deleted == 5L)
    assert(rewritten >= 1 && rewritten <= 2 && kept == 4 - rewritten)
    assert(ids(SnapshotLog.read(spark, tbl)) ==
      (0L until 40L).toSet -- (20L until 25L))
    // untouched files appear in BOTH manifests verbatim (zero data copied)
    val v2Files = spark.read.parquet(s"$tbl/_log/v2")
      .select(col("file")).collect().map(_.getString(0)).toSet
    assert((v1Files intersect v2Files).size == kept)
    // history intact: the pre-delete version still has every row
    assert(ids(SnapshotLog.readVersion(spark, tbl, 1)) == (0L until 40L).toSet)
  }

  test("deleteWhere with no matches publishes no new version; null predicate rows survive") {
    import spark.implicits._
    val tbl = freshTable()
    SnapshotLog.commit(spark, tbl,
      Seq((1L, Some(1)), (2L, None), (3L, Some(9))).toDF("id", "flag"),
      overwrite = false)
    val (v0, d0, r0, _) = SnapshotLog.deleteWhere(spark, tbl, $"id" > 100L)
    assert(v0 == 1 && d0 == 0L && r0 == 0)
    assert(SnapshotLog.versions(spark, tbl) == Seq(1))
    // flag > 5 is NULL for id=2 — SQL DELETE must keep that row
    val (v1, d1, _, _) = SnapshotLog.deleteWhere(spark, tbl, $"flag" > 5)
    assert(v1 == 2 && d1 == 1L)
    assert(ids(SnapshotLog.read(spark, tbl)) == Set(1L, 2L))
  }

  test("updateWhere rewrites matched rows in touched files only; schema and history stay put") {
    import spark.implicits._
    val tbl = freshTable()
    SnapshotLog.commit(spark, tbl,
      (0L until 40L).map(i => (i, i * 10)).toDF("id", "v")
        .repartitionByRange(4, $"id"), overwrite = false)
    val (nv, updated, rewritten, kept) = SnapshotLog.updateWhere(spark, tbl,
      $"id" >= 20L && $"id" < 25L, Map("v" -> lit(-1)))
    assert(nv == 2 && updated == 5L)
    assert(rewritten >= 1 && rewritten <= 2 && kept == 4 - rewritten)
    val cur = SnapshotLog.read(spark, tbl)
    // set expr was an INT literal; the column must stay LONG (cast-back)
    assert(cur.schema("v").dataType == org.apache.spark.sql.types.LongType)
    val m = cur.select($"id", $"v").as[(Long, Long)].collect().toMap
    (0L until 40L).foreach { i =>
      assert(m(i) == (if (i >= 20 && i < 25) -1L else i * 10), s"id $i")
    }
    // pre-update version unchanged; unknown set column refuses
    assert(SnapshotLog.readVersion(spark, tbl, 1)
      .where($"v" === -1).count() == 0)
    assert(intercept[IllegalArgumentException](
      SnapshotLog.updateWhere(spark, tbl, $"id" === 0L, Map("nope" -> lit(1))))
      .getMessage.contains("unknown column"))
    // no-match update publishes no version
    val (v2, u2, _, _) = SnapshotLog.updateWhere(spark, tbl, $"id" > 99L, Map("v" -> lit(0)))
    assert(v2 == 2 && u2 == 0L)
  }

  test("mergeInto upserts a change batch: matched replaced, unmatched inserted, untouched files kept") {
    import spark.implicits._
    val tbl = freshTable()
    SnapshotLog.commit(spark, tbl,
      (0L until 40L).map(i => (i, i * 10)).toDF("id", "v")
        .repartitionByRange(4, $"id"), overwrite = false)
    // batch: updates ids 20..24 (in one-two files), inserts 100..102
    val batch = ((20L until 25L).map(i => (i, -i)) ++
      (100L until 103L).map(i => (i, i))).toDF("id", "v")
    val (nv, replaced, inserted, rewritten, kept) =
      SnapshotLog.mergeInto(spark, tbl, batch, Seq("id"))
    assert(nv == 2 && replaced == 5L && inserted == 3L)
    assert(rewritten >= 1 && rewritten <= 2 && kept == 4 - rewritten)
    val m = SnapshotLog.read(spark, tbl)
      .select($"id", $"v").as[(Long, Long)].collect().toMap
    assert(m.size == 43)
    (0L until 40L).foreach(i => assert(m(i) == (if (i >= 20 && i < 25) -i else i * 10)))
    (100L until 103L).foreach(i => assert(m(i) == i))
    // history intact
    assert(SnapshotLog.readVersion(spark, tbl, 1).count() == 40)
    // ambiguous (dup-key) batch refuses
    assert(intercept[IllegalArgumentException](
      SnapshotLog.mergeInto(spark, tbl,
        Seq((1L, 1L), (1L, 2L)).toDF("id", "v"), Seq("id")))
      .getMessage.contains("duplicate keys"))
    // schema-mismatched batch refuses
    assert(intercept[IllegalArgumentException](
      SnapshotLog.mergeInto(spark, tbl, Seq(1L).toDF("id"), Seq("id")))
      .getMessage.contains("columns"))
  }

  test("changesBetween yields exactly the row-image diff; rewrite-carried rows cancel") {
    import spark.implicits._
    val tbl = freshTable()
    SnapshotLog.commit(spark, tbl,
      (0L until 40L).toDF("id").repartitionByRange(4, $"id"), overwrite = false)
    SnapshotLog.deleteWhere(spark, tbl, $"id" >= 20L && $"id" < 25L)   // v2
    SnapshotLog.commit(spark, tbl, (100L until 103L).toDF("id"), overwrite = false) // v3
    def ch(a: Int, b: Int): Map[String, Set[Long]] =
      SnapshotLog.changesBetween(spark, tbl, a, b)
        .select($"_change_type", $"id").as[(String, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // v1→v2: a copy-on-write delete — survivors carried into rewritten
    // files must cancel, leaving ONLY the 5 deleted rows
    assert(ch(1, 2) == Map("delete" -> (20L until 25L).toSet))
    // v2→v3: a pure append — inserts only
    assert(ch(2, 3) == Map("insert" -> (100L until 103L).toSet))
    // v1→v3: composition
    assert(ch(1, 3) == Map("delete" -> (20L until 25L).toSet,
      "insert" -> (100L until 103L).toSet))
    assert(intercept[IllegalArgumentException](
      SnapshotLog.changesBetween(spark, tbl, 3, 1)).getMessage.contains("fromV < toV"))
  }

  test("restore publishes an old version's content as new metadata; history append-only") {
    import spark.implicits._
    val tbl = freshTable()
    SnapshotLog.commit(spark, tbl, (0L until 10L).toDF("id"), overwrite = false)
    SnapshotLog.commit(spark, tbl, (100L until 105L).toDF("id"), overwrite = true)
    assert(SnapshotLog.restore(spark, tbl, 1) == 3)
    assert(ids(SnapshotLog.read(spark, tbl)) == (0L until 10L).toSet)
    // the rolled-back-over overwrite is still pinned
    assert(ids(SnapshotLog.readVersion(spark, tbl, 2)) == (100L until 105L).toSet)
    // zero data copied: v3's manifest lists exactly v1's files
    val mf = (v: Int) => spark.read.parquet(s"$tbl/_log/v$v")
      .select(col("file")).collect().map(_.getString(0)).toSet
    assert(mf(3) == mf(1))
    assert(intercept[IllegalArgumentException](
      SnapshotLog.restore(spark, tbl, 9)).getMessage.contains("cannot restore"))
  }

  test("shallowClone pins the source's files zero-copy; clone DML never mutates the source") {
    import spark.implicits._
    val src = freshTable()
    val dst = freshTable()
    SnapshotLog.commit(spark, src, (0L until 20L).toDF("id"), overwrite = false)
    assert(SnapshotLog.shallowClone(spark, src, dst) == 1)
    assert(ids(SnapshotLog.read(spark, dst)) == (0L until 20L).toSet)
    // copy-on-write delete on the CLONE rewrites into clone-owned files
    SnapshotLog.deleteWhere(spark, dst, $"id" < 5L)
    assert(ids(SnapshotLog.read(spark, dst)) == (5L until 20L).toSet)
    assert(ids(SnapshotLog.read(spark, src)) == (0L until 20L).toSet)
    // an existing destination refuses
    assert(intercept[IllegalArgumentException](
      SnapshotLog.shallowClone(spark, src, dst)).getMessage.contains("already has a log"))
  }

  test("streamVersions: version-offset batches, insert deltas, checkpoint resume") {
    import spark.implicits._
    val tbl = freshTable()
    val chk = java.nio.file.Files.createTempDirectory("snapchk").toString
    SnapshotLog.commit(spark, tbl, (0L until 10L).toDF("id"), overwrite = false)  // v1
    SnapshotLog.commit(spark, tbl, (10L until 15L).toDF("id"), overwrite = false) // v2
    SnapshotLog.deleteWhere(spark, tbl, col("id") >= 12)                               // v3 (CoW)
    var got = Map.empty[Int, Set[Long]]
    def drain(): Seq[Int] = SnapshotLog.streamVersions(spark, tbl, chk) {
      (delta, v) => got += v -> ids(delta)
    }
    assert(drain() == Seq(1, 2, 3))
    assert(got(1) == (0L until 10L).toSet)
    assert(got(2) == (10L until 15L).toSet)
    // the CoW rewrite's carried survivors cancel through exceptAll: a
    // delete inserts NOTHING (survivors 10,11 were already delivered in v2)
    assert(got(3) == Set.empty[Long])
    // resume: nothing new → no batches; a new commit → exactly that delta
    got = Map.empty
    assert(drain().isEmpty && got.isEmpty)
    SnapshotLog.commit(spark, tbl, (100L until 103L).toDF("id"), overwrite = true) // v4
    assert(drain() == Seq(4))
    // the overwrite streams only its net-new rows (old rows all removed,
    // none re-delivered)
    assert(got(4) == (100L until 103L).toSet)
  }

  test("vacuuming a shallow clone never deletes the source table's files") {
    import spark.implicits._
    val src = freshTable()
    val dst = freshTable()
    SnapshotLog.commit(spark, src, (0L until 10L).toDF("id").coalesce(1), overwrite = false)
    SnapshotLog.shallowClone(spark, src, dst)
    // clone-side DML drops some source-pinned entries from the clone's
    // manifests; a naive dead-set vacuum would then physically delete the
    // SOURCE file those dropped entries point at — corrupting the source
    SnapshotLog.deleteWhere(spark, dst, col("id") >= 0) // rewrite away everything
    val (_, deleted) = SnapshotLog.vacuum(spark, dst, retainVersions = 1)
    assert(deleted == 0, "clone vacuum must not reach outside its table root")
    assert(ids(SnapshotLog.read(spark, src)) == (0L until 10L).toSet)
    // the source's own vacuum still reclaims its own dead files later
    SnapshotLog.commit(spark, src, (50L until 52L).toDF("id").coalesce(1), overwrite = true)
    val (_, srcDeleted) = SnapshotLog.vacuum(spark, src, retainVersions = 1)
    assert(srcDeleted == 1)
  }

  test("streamVersions refuses a checkpoint that points into expired history") {
    import spark.implicits._
    val tbl = freshTable()
    val chk = java.nio.file.Files.createTempDirectory("snapchk").toString
    SnapshotLog.commit(spark, tbl, (0L until 5L).toDF("id"), overwrite = false)  // v1
    SnapshotLog.commit(spark, tbl, (5L until 9L).toDF("id"), overwrite = false)  // v2
    SnapshotLog.streamVersions(spark, tbl, chk) { (_, _) => () } // consume v1..v2
    SnapshotLog.commit(spark, tbl, (9L until 12L).toDF("id"), overwrite = false) // v3
    SnapshotLog.expireSnapshots(spark, tbl, retainVersions = 1)  // v1+v2 manifests gone
    // v2's manifest is expired → v3's delta is incomputable; a silent full
    // re-delivery would duplicate v1+v2's rows at the sink — refuse instead
    val e = intercept[IllegalArgumentException] {
      SnapshotLog.streamVersions(spark, tbl, chk) { (_, _) => () }
    }
    assert(e.getMessage.contains("expired"))
    // a FRESH checkpoint takes the surviving version as its initial snapshot
    val chk2 = java.nio.file.Files.createTempDirectory("snapchk").toString
    var snap = Set.empty[Long]
    assert(SnapshotLog.streamVersions(spark, tbl, chk2) {
      (d, _) => snap = ids(d)
    } == Seq(3))
    assert(snap == (0L until 12L).toSet)
  }
}
