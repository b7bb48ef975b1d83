package graft.sources

import graft.SparkSpec

/** The read-only Iceberg metadata interpreter against hand-assembled
  * tables in the public format: manifest replay (ADDED/EXISTING live,
  * DELETED dead) across multi-manifest snapshots, time travel,
  * version-hint fallback, and the feature gates — delete manifests,
  * delete data files, non-parquet data, format v3+ — which must REFUSE
  * loudly, never silently misread. */
class IcebergSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("iceberg").toString

  /** Write `df` as ONE parquet file under `base`/data, returning its
    * absolute path — the one staging dance every fixture file
    * (data, id-stamped data, position/equality deletes) goes through. */
  private def singleParquetFile(df: org.apache.spark.sql.DataFrame,
                                base: String, name: String): String = {
    val tmp = new java.io.File(base, s".tmp_$name").toString
    df.coalesce(1).write.parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).head
    val dst = new java.io.File(new java.io.File(base, "data"), name)
    dst.getParentFile.mkdirs()
    assert(part.renameTo(dst))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    dst.toString
  }

  /** Write ids as ONE parquet file, returning its absolute path. */
  private def dataFile(base: String, name: String, ids: Seq[Long]): String =
    singleParquetFile(ids.toDF("id"), base, name)

  private def idsOf(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").collect().map(_.getLong(0)).toSet

  /** Three-snapshot fixture: 1001 adds f1+f2; 1002 deletes f1, carries
    * f2, adds f3; 1003 = [manifest(1002), manifest adding f4]. */
  private def threeSnapshotTable(): String = {
    val base = freshDir()
    val f1 = dataFile(base, "f1.parquet", Seq(1L, 2L))
    val f2 = dataFile(base, "f2.parquet", Seq(3L, 4L))
    val f3 = dataFile(base, "f3.parquet", Seq(5L))
    val f4 = dataFile(base, "f4.parquet", Seq(6L, 7L))
    val m1 = Iceberg.writeManifest(spark, base, "m1.avro", 1001L,
      Seq(Iceberg.Entry(f1, 1), Iceberg.Entry(f2, 1)))
    val m2 = Iceberg.writeManifest(spark, base, "m2.avro", 1002L,
      Seq(Iceberg.Entry(f1, 2), Iceberg.Entry(f2, 0), Iceberg.Entry(f3, 1)))
    val m3 = Iceberg.writeManifest(spark, base, "m3.avro", 1003L,
      Seq(Iceberg.Entry(f4, 1)))
    val ml1 = Iceberg.writeManifestList(spark, base, "snap-1001.avro", 1001L, Seq(m1))
    val ml2 = Iceberg.writeManifestList(spark, base, "snap-1002.avro", 1002L, Seq(m2))
    val ml3 = Iceberg.writeManifestList(spark, base, "snap-1003.avro", 1003L, Seq(m2, m3))
    Iceberg.writeMetadata(spark, base, version = 3,
      Seq((1001L, 1000L, ml1), (1002L, 2000L, ml2), (1003L, 3000L, ml3)))
    base
  }

  test("current read resolves multi-manifest union and DELETED exclusion") {
    val base = threeSnapshotTable()
    // live = f2 (EXISTING through m2) + f3 (ADDED in m2) + f4 (m3) — a
    // reader skipping carried manifests loses 3/4/5, one ignoring the
    // DELETED status serves 1/2
    assert(idsOf(Iceberg.read(spark, base)) == Set(3L, 4L, 5L, 6L, 7L))
  }

  test("time travel reconstructs every historical snapshot") {
    val base = threeSnapshotTable()
    assert(idsOf(Iceberg.readSnapshot(spark, base, 1001L)) == Set(1L, 2L, 3L, 4L))
    assert(idsOf(Iceberg.readSnapshot(spark, base, 1002L)) == Set(3L, 4L, 5L))
    assert(idsOf(Iceberg.readSnapshot(spark, base, 1003L)) == Set(3L, 4L, 5L, 6L, 7L))
    assert(Iceberg.snapshots(spark, base) ==
      Seq((1001L, 1000L), (1002L, 2000L), (1003L, 3000L)))
    val e = intercept[IllegalArgumentException](
      Iceberg.readSnapshot(spark, base, 9999L))
    assert(e.getMessage.contains("9999") && e.getMessage.contains("1001"), e.getMessage)
  }

  test("a stale version-hint.text falls back to the listing") {
    // Iceberg's own hint writes are non-atomic and metadata cleanup can
    // expire the hinted version; HadoopTableOperations tolerates this by
    // listing — a raw FileNotFoundException here would read as corruption
    val base = threeSnapshotTable()
    // overwrite through the Hadoop FS (a raw java.nio write leaves the
    // LocalFileSystem's .crc sidecar stale → ChecksumException on read)
    val hfs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val out = hfs.create(new org.apache.hadoop.fs.Path(
      s"$base/metadata/version-hint.text"), true)
    try out.write("99".getBytes) finally out.close()
    assert(idsOf(Iceberg.read(spark, base)) == Set(3L, 4L, 5L, 6L, 7L))
  }

  test("without version-hint.text the highest metadata version wins") {
    val base = threeSnapshotTable()
    // stale lower version + deleted hint: the reader must pick v3
    val md = new java.io.File(base, "metadata")
    val f = dataFile(base, "only.parquet", Seq(9L))
    val m = Iceberg.writeManifest(spark, base, "mS.avro", 500L, Seq(Iceberg.Entry(f, 1)))
    val ml = Iceberg.writeManifestList(spark, base, "snap-500.avro", 500L, Seq(m))
    // hand-author v2 pointing at the stale snapshot, then remove the hint
    Iceberg.writeMetadata(spark, base, version = 2, Seq((500L, 1L, ml)))
    Iceberg.writeMetadata(spark, base, version = 3, {
      // re-write v3 (writeMetadata also rewrote the hint to 2 above)
      val ml3 = new java.io.File(md, "snap-1003.avro").toString
      val ml1 = new java.io.File(md, "snap-1001.avro").toString
      val ml2 = new java.io.File(md, "snap-1002.avro").toString
      Seq((1001L, 1000L, ml1), (1002L, 2000L, ml2), (1003L, 3000L, ml3))
    })
    assert(new java.io.File(md, "version-hint.text").delete())
    assert(idsOf(Iceberg.read(spark, base)) == Set(3L, 4L, 5L, 6L, 7L))
  }

  test("format v3 READS (a plain v3 table serves rows); v4+ is refused loudly") {
    // v3 read support landed in round 14 (deletion vectors et al.,
    // IcebergV3Spec) — a defaults-free v3 table reads like v2
    val base = freshDir()
    val f = dataFile(base, "f.parquet", Seq(1L))
    val m = Iceberg.writeManifest(spark, base, "m.avro", 1L, Seq(Iceberg.Entry(f, 1)))
    val ml = Iceberg.writeManifestList(spark, base, "snap.avro", 1L, Seq(m))
    Iceberg.writeMetadata(spark, base, 1, Seq((1L, 1L, ml)), formatVersion = 3)
    assert(idsOf(Iceberg.read(spark, base)) == Set(1L))
    val base2 = freshDir()
    val f2 = dataFile(base2, "f.parquet", Seq(1L))
    val m2 = Iceberg.writeManifest(spark, base2, "m.avro", 1L, Seq(Iceberg.Entry(f2, 1)))
    val ml2 = Iceberg.writeManifestList(spark, base2, "snap.avro", 1L, Seq(m2))
    Iceberg.writeMetadata(spark, base2, 1, Seq((1L, 1L, ml2)), formatVersion = 4)
    val e = intercept[IllegalArgumentException](Iceberg.read(spark, base2))
    assert(e.getMessage.contains("format-version"), e.getMessage)
  }

  test("id-less equality deletes and malformed delete placement are refused, not skipped") {
    val base = freshDir()
    val f = dataFile(base, "f.parquet", Seq(1L))
    val m = Iceberg.writeManifest(spark, base, "m.avro", 1L, Seq(Iceberg.Entry(f, 1)))
    // an equality delete file (content 2) naming NO equality_ids is
    // malformed — there is no predicate to apply; skipping it would
    // serve deleted rows, so it must refuse
    val dm = Iceberg.writeManifest(spark, base, "dm.avro", 2L,
      Seq(Iceberg.Entry(f, 1, content = 2)))
    val ml = Iceberg.writeManifestList(spark, base, "snap.avro", 1L, Seq(m))
    val mlDel = Iceberg.writeManifestList(spark, base, "snapD.avro", 2L,
      Seq(m, dm), contents = Seq(0, 1))
    Iceberg.writeMetadata(spark, base, 1, Seq((1L, 1L, ml), (2L, 2L, mlDel)))
    val e1 = intercept[IllegalArgumentException](Iceberg.read(spark, base))
    assert(e1.getMessage.contains("equality_ids"), e1.getMessage)
    // the pre-delete snapshot still reads
    assert(idsOf(Iceberg.readSnapshot(spark, base, 1L)) == Set(1L))
    // a delete-flagged file inside a DATA manifest is malformed metadata
    val base2 = freshDir()
    val g = dataFile(base2, "g.parquet", Seq(1L))
    val m2 = Iceberg.writeManifest(spark, base2, "m.avro", 1L,
      Seq(Iceberg.Entry(g, 1, content = 1)))
    val ml2 = Iceberg.writeManifestList(spark, base2, "snap.avro", 1L, Seq(m2))
    Iceberg.writeMetadata(spark, base2, 1, Seq((1L, 1L, ml2)))
    val e2 = intercept[IllegalArgumentException](Iceberg.read(spark, base2))
    assert(e2.getMessage.contains("delete file"), e2.getMessage)
    // a data-flagged file inside a DELETE manifest likewise
    val base3 = freshDir()
    val h = dataFile(base3, "h.parquet", Seq(1L))
    val m3a = Iceberg.writeManifest(spark, base3, "m.avro", 1L, Seq(Iceberg.Entry(h, 1)))
    val m3b = Iceberg.writeManifest(spark, base3, "dm.avro", 1L, Seq(Iceberg.Entry(h, 1)))
    val ml3 = Iceberg.writeManifestList(spark, base3, "snap.avro", 1L,
      Seq(m3a, m3b), contents = Seq(0, 1))
    Iceberg.writeMetadata(spark, base3, 1, Seq((1L, 1L, ml3)))
    val e3 = intercept[IllegalArgumentException](Iceberg.read(spark, base3))
    assert(e3.getMessage.contains("non-delete"), e3.getMessage)
  }

  /** Write a POSITION delete parquet (`file_path`, `pos`) as one file. */
  private def positionDeleteFile(base: String, name: String,
                                 rows: Seq[(String, Long)]): String =
    singleParquetFile(rows.toDF("file_path", "pos"), base, name)

  test("position deletes are APPLIED: per-file row coordinates, scheme-insensitive") {
    // data file f1 = rows [10,20,30,40,50] (positions 0..4), f2 = [10,20]
    // — deletes name (f1, pos 1) and (f1, pos 3) with a file:// -prefixed
    // path spelling, while the manifest plans the bare path: the read
    // must drop 20 and 40 from f1 ONLY (f2's identical values survive)
    val base = freshDir()
    val f1 = dataFile(base, "f1.parquet", Seq(10L, 20L, 30L, 40L, 50L))
    val f2 = dataFile(base, "f2.parquet", Seq(10L, 20L))
    val pd = positionDeleteFile(base, "pd.parquet",
      Seq((s"file://$f1", 1L), (s"file://$f1", 3L)))
    val m = Iceberg.writeManifest(spark, base, "m.avro", 1L,
      Seq(Iceberg.Entry(f1, 1), Iceberg.Entry(f2, 1)))
    val dm = Iceberg.writeManifest(spark, base, "dm.avro", 2L,
      Seq(Iceberg.Entry(pd, 1, content = 1)))
    val ml1 = Iceberg.writeManifestList(spark, base, "s1.avro", 1L, Seq(m))
    val ml2 = Iceberg.writeManifestList(spark, base, "s2.avro", 2L,
      Seq(m, dm), contents = Seq(0, 1))
    Iceberg.writeMetadata(spark, base, 1, Seq((1L, 1L, ml1), (2L, 2L, ml2)))
    val got = Iceberg.read(spark, base).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(10L, 10L, 20L, 30L, 50L), got.mkString(", "))
    // time travel to the pre-delete snapshot serves everything
    assert(Iceberg.readSnapshot(spark, base, 1L).count() == 7L)
    // MoR composes with pruning: predicate keeps both files, deletes
    // still applied on the kept set
    val base2 = freshDir()
    val g1 = dataFileWithIds(base2, "g1.parquet", Seq((1L, 10L), (2L, 20L), (3L, 30L)))
    val gpd = positionDeleteFile(base2, "gpd.parquet", Seq((g1, 0L)))
    val gm = Iceberg.writeManifest(spark, base2, "m.avro", 1L, Seq(
      Iceberg.Entry(g1, 1,
        lowerBounds = Seq(2 -> Iceberg.encodeLong(10L)),
        upperBounds = Seq(2 -> Iceberg.encodeLong(30L)))))
    val gdm = Iceberg.writeManifest(spark, base2, "dm.avro", 1L,
      Seq(Iceberg.Entry(gpd, 1, content = 1)))
    val gml = Iceberg.writeManifestList(spark, base2, "snap.avro", 1L,
      Seq(gm, gdm), contents = Seq(0, 1))
    Iceberg.writeMetadata(spark, base2, 1, Seq((1L, 1L, gml)),
      schemaFieldsJson = "[" + Iceberg.fieldJson(1, "id", "long") + "," +
        Iceberg.fieldJson(2, "v", "long") + "]")
    val pruned = Iceberg.readPruned(spark, base2,
        Seq(Iceberg.ColRange("v", 15L, 35L)))
      .select("id").collect().map(_.getLong(0)).toSet
    // position 0 (id 1) deleted; residual filter later trims v<15
    assert(pruned == Set(2L, 3L), pruned.mkString(", "))
    // time travel + pruning compose through the same path
    val snapPruned = Iceberg.readSnapshotPruned(spark, base2, 1L,
        Seq(Iceberg.ColRange("v", 15L, 35L)))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(snapPruned == pruned, snapPruned.mkString(", "))
  }

  test("non-parquet data files are refused") {
    val base = freshDir()
    val f = dataFile(base, "f.parquet", Seq(1L))
    val m = Iceberg.writeManifest(spark, base, "m.avro", 1L,
      Seq(Iceberg.Entry(f, 1, format = "ORC")))
    val ml = Iceberg.writeManifestList(spark, base, "snap.avro", 1L, Seq(m))
    Iceberg.writeMetadata(spark, base, 1, Seq((1L, 1L, ml)))
    val e = intercept[IllegalArgumentException](Iceberg.read(spark, base))
    assert(e.getMessage.contains("ORC"), e.getMessage)
  }

  /** Write (a, b) rows as ONE parquet file whose footer carries Iceberg
    * field ids 1/2 (Spark's own `parquet.field.id` mechanism — what a
    * real Iceberg writer stamps), under the STALE column names. */
  private def dataFileWithIds(base: String, name: String,
                              rows: Seq[(Long, Long)]): String = {
    import org.apache.spark.sql.types._
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    val st = StructType(Seq(
      StructField("old_a", LongType, nullable = true,
        new MetadataBuilder().putLong("parquet.field.id", 1L).build()),
      StructField("old_b", LongType, nullable = true,
        new MetadataBuilder().putLong("parquet.field.id", 2L).build())))
    singleParquetFile(spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map(r => org.apache.spark.sql.Row(r._1, r._2)), 1), st),
      base, name)
  }

  /** One-snapshot table over `file` with the given metadata schema. */
  private def oneSnapTable(base: String, file: String, schemaFieldsJson: String): Unit = {
    val m = Iceberg.writeManifest(spark, base, "m.avro", 1L, Seq(Iceberg.Entry(file, 1)))
    val ml = Iceberg.writeManifestList(spark, base, "snap.avro", 1L, Seq(m))
    Iceberg.writeMetadata(spark, base, 1, Seq((1L, 1L, ml)),
      schemaFieldsJson = schemaFieldsJson)
  }

  test("a renamed column resolves by FIELD ID when files carry parquet ids") {
    // the files were written under old_a/old_b; the current metadata
    // schema SWAPS the names across the two field ids — by-name
    // resolution would serve each column's values under the wrong name,
    // so correct values under the current names prove id resolution
    val base = freshDir()
    val f = dataFileWithIds(base, "f.parquet", Seq((1L, 10L), (2L, 20L)))
    oneSnapTable(base, f, "[" +
      Iceberg.fieldJson(1, "old_b", "long") + "," +
      Iceberg.fieldJson(2, "old_a", "long") + "]")
    val df = Iceberg.read(spark, base)
    assert(df.columns.toSeq == Seq("old_b", "old_a"))
    val got = df.orderBy("old_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // field id 1 (values 1, 2) is now named old_b; field id 2 (10, 20) old_a
    assert(got == Seq((1L, 10L), (2L, 20L)), got.mkString(", "))
  }

  test("a rename over id-less files is refused, never served stale") {
    // plain parquet (no field ids) + a metadata schema whose current name
    // does not exist in the footer: there is no sound resolution — the
    // r11 verdict's one silent gap, now a loud named refusal
    val base = freshDir()
    val f = dataFile(base, "f.parquet", Seq(1L, 2L))  // column `id`, no ids
    oneSnapTable(base, f, "[" + Iceberg.fieldJson(1, "renamed_id", "long") + "]")
    val e = intercept[IllegalArgumentException](Iceberg.read(spark, base))
    assert(e.getMessage.contains("renamed_id") &&
      e.getMessage.contains("field ids"), e.getMessage)
  }

  test("id-less files whose names match the metadata schema read by name") {
    val base = freshDir()
    val f = dataFile(base, "f.parquet", Seq(3L, 4L))
    oneSnapTable(base, f, "[" + Iceberg.fieldJson(1, "id", "long") + "]")
    val df = Iceberg.read(spark, base)
    assert(df.columns.toSeq == Seq("id"))
    assert(idsOf(df) == Set(3L, 4L))
  }

  test("nested and unsupported metadata types are refused by name") {
    val base = freshDir()
    val f = dataFile(base, "f.parquet", Seq(1L))
    oneSnapTable(base, f,
      """[{"id":1,"name":"id","required":false,
        |"type":{"type":"struct","fields":[]}}]""".stripMargin.replace("\n", ""))
    val e = intercept[IllegalArgumentException](Iceberg.read(spark, base))
    assert(e.getMessage.contains("nested"), e.getMessage)
    val e2 = intercept[IllegalArgumentException](Iceberg.sparkType("uuid"))
    assert(e2.getMessage.contains("uuid"), e2.getMessage)
    // decimal and the timestamp split ARE interpreted
    assert(Iceberg.sparkType("decimal(10, 2)") ==
      org.apache.spark.sql.types.DecimalType(10, 2))
    assert(Iceberg.sparkType("timestamptz") == org.apache.spark.sql.types.TimestampType)
    assert(Iceberg.sparkType("timestamp") == org.apache.spark.sql.types.TimestampNTZType)
  }

  test("an oversized metadata file is refused by name, not by array overflow") {
    // ADVICE r11: an unguarded getLen.toInt on a >2 GiB file wraps
    // negative → NegativeArraySizeException; the guard must refuse with
    // the budget named BEFORE allocating (pinned here with a tiny budget
    // override rather than a multi-GiB fixture)
    val base = threeSnapshotTable()
    val hint = new org.apache.hadoop.fs.Path(s"$base/metadata/version-hint.text")
    val e = intercept[IllegalArgumentException](
      Iceberg.readSmall(spark, hint, maxBytes = 0L))
    assert(e.getMessage.contains("metadata budget"), e.getMessage)
  }

  /** Two-manifest, four-file partitioned table for the pruning laws:
    * partitioned by identity(cat) (cat ∈ {a, b}, one manifest each,
    * summaries on the manifest list), files carrying long `v` stats
    * bounds for field id 2: a→[0,9],[10,19]; b→[100,109],[110,119].
    * Data files are id-stamped so the metadata schema resolves. */
  private def prunedTable(): (String, Map[String, String]) = {
    val base = freshDir()
    def f(name: String, lo: Long) =
      dataFileWithIds(base, name, (lo to lo + 9L).map(v => (v, v)))
    // dataFileWithIds writes (old_a, old_b) under ids 1/2; metadata names
    // them (id, v) — the rename path rides along for free
    val files = Map(
      "a_lo" -> f("a_lo.parquet", 0L), "a_hi" -> f("a_hi.parquet", 10L),
      "b_lo" -> f("b_lo.parquet", 100L), "b_hi" -> f("b_hi.parquet", 110L))
    def entry(k: String, cat: String, lo: Long) = Iceberg.Entry(files(k), 1,
      partition = Seq("cat" -> cat),
      lowerBounds = Seq(1 -> Iceberg.encodeLong(lo), 2 -> Iceberg.encodeLong(lo)),
      upperBounds = Seq(1 -> Iceberg.encodeLong(lo + 9L), 2 -> Iceberg.encodeLong(lo + 9L)))
    val ma = Iceberg.writeManifest(spark, base, "ma.avro", 1L,
      Seq(entry("a_lo", "a", 0L), entry("a_hi", "a", 10L)))
    val mb = Iceberg.writeManifest(spark, base, "mb.avro", 1L,
      Seq(entry("b_lo", "b", 100L), entry("b_hi", "b", 110L)))
    val ml = Iceberg.writeManifestList(spark, base, "snap.avro", 1L, Seq(ma, mb),
      summaries = Seq(
        Seq(Iceberg.Summary(Some(Iceberg.encodeString("a")), Some(Iceberg.encodeString("a")))),
        Seq(Iceberg.Summary(Some(Iceberg.encodeString("b")), Some(Iceberg.encodeString("b"))))))
    Iceberg.writeMetadata(spark, base, 1, Seq((1L, 1L, ml)),
      schemaFieldsJson = "[" + Iceberg.fieldJson(1, "id", "long") + "," +
        Iceberg.fieldJson(2, "v", "long") + "," +
        Iceberg.fieldJson(3, "cat", "string") + "]",
      partitionSpecJson = "[" + Iceberg.identityPartitionJson(3, "cat") + "]")
    (base, files)
  }

  test("entry stats bounds prune files; the pruned read is the filtered read") {
    val (base, files) = prunedTable()
    assert(Iceberg.planFiles(spark, base).size == 4)
    // v in [12, 15] overlaps only a_hi's [10, 19]
    val preds = Seq(Iceberg.ColRange("v", 12L, 15L))
    assert(Iceberg.planFiles(spark, base, preds) == Seq(files("a_hi")))
    // contract: readPruned is a SUPERSET; residual filter equalizes
    import org.apache.spark.sql.functions.col
    val pruned = Iceberg.readPruned(spark, base, preds)
      .where(col("v").between(12L, 15L)).collect().map(_.getLong(1)).toSet
    val full = Iceberg.read(spark, base)
      .where(col("v").between(12L, 15L)).collect().map(_.getLong(1)).toSet
    assert(pruned == full && full == Set(12L, 13L, 14L, 15L))
    // a range spanning both b-files plans exactly those two
    assert(Iceberg.planFiles(spark, base,
      Seq(Iceberg.ColRange("v", 105L, 115L))).toSet ==
      Set(files("b_lo"), files("b_hi")))
  }

  test("partition summaries prune whole manifests WITHOUT opening their Avro") {
    val (base, files) = prunedTable()
    // summary pruning on cat alone plans only manifest b's files
    assert(Iceberg.planFiles(spark, base,
      Seq(Iceberg.ColRange("cat", "b", "b"))).toSet ==
      Set(files("b_lo"), files("b_hi")))
    // the behavioral pin: a manifest-list row whose summary is disjoint
    // points at a DELETED manifest file — pruning must succeed without
    // ever opening it; an unpruned plan must fail trying
    assert(new java.io.File(base, "metadata/ma.avro").delete())
    assert(Iceberg.planFiles(spark, base,
      Seq(Iceberg.ColRange("cat", "b", "b"))).toSet ==
      Set(files("b_lo"), files("b_hi")))
    intercept[Exception](Iceberg.planFiles(spark, base))
  }

  test("identity partition values prune at entry level; everything-pruned is a typed empty frame") {
    val (base, files) = prunedTable()
    // cat = 'a' keeps manifest a via its summary, and inside a manifest
    // with NO summaries the per-entry partition struct would do the same
    assert(Iceberg.planFiles(spark, base,
      Seq(Iceberg.ColRange("cat", "a", "a"))).toSet ==
      Set(files("a_lo"), files("a_hi")))
    // v in [50, 60] overlaps nothing: empty plan, typed empty frame
    val preds = Seq(Iceberg.ColRange("v", 50L, 60L))
    assert(Iceberg.planFiles(spark, base, preds).isEmpty)
    val empty = Iceberg.readPruned(spark, base, preds)
    assert(empty.count() == 0L)
    assert(empty.columns.toSeq == Seq("id", "v", "cat"))
    // ISOLATED entry-level partition pruning: one manifest, NO summaries,
    // no bounds — only the per-entry partition struct can prune
    val base2 = freshDir()
    val fa = dataFileWithIds(base2, "fa.parquet", Seq((1L, 1L)))
    val fb = dataFileWithIds(base2, "fb.parquet", Seq((2L, 2L)))
    val m = Iceberg.writeManifest(spark, base2, "m.avro", 1L, Seq(
      Iceberg.Entry(fa, 1, partition = Seq("cat" -> "a")),
      Iceberg.Entry(fb, 1, partition = Seq("cat" -> "b"))))
    val ml = Iceberg.writeManifestList(spark, base2, "snap.avro", 1L, Seq(m))
    Iceberg.writeMetadata(spark, base2, 1, Seq((1L, 1L, ml)),
      schemaFieldsJson = "[" + Iceberg.fieldJson(1, "id", "long") + "," +
        Iceberg.fieldJson(2, "v", "long") + "," +
        Iceberg.fieldJson(3, "cat", "string") + "]",
      partitionSpecJson = "[" + Iceberg.identityPartitionJson(3, "cat") + "]")
    assert(Iceberg.planFiles(spark, base2,
      Seq(Iceberg.ColRange("cat", "b", "b"))) == Seq(fb))
  }

  test("missing stats and non-identity transforms keep files (soundness)") {
    val base = freshDir()
    val f1 = dataFileWithIds(base, "f1.parquet", Seq((1L, 1L)))
    // no bounds, no partition: nothing to prune on → must be planned
    val m = Iceberg.writeManifest(spark, base, "m.avro", 1L,
      Seq(Iceberg.Entry(f1, 1, partition = Seq("id_bucket" -> 0L))))
    val ml = Iceberg.writeManifestList(spark, base, "snap.avro", 1L, Seq(m))
    Iceberg.writeMetadata(spark, base, 1, Seq((1L, 1L, ml)),
      schemaFieldsJson = "[" + Iceberg.fieldJson(1, "id", "long") + "," +
        Iceberg.fieldJson(2, "v", "long") + "]",
      // bucket transform: partition value 0 is a BUCKET NUMBER — a
      // RANGE cannot map through the hash, so it must not prune …
      partitionSpecJson =
        """[{"name":"id_bucket","transform":"bucket[4]","source-id":1,"field-id":1000}]""")
    assert(Iceberg.planFiles(spark, base,
      Seq(Iceberg.ColRange("id", 5L, 9L))).size == 1)
    // … but a POINT does: ids hashing to bucket 0 keep the file, any
    // other bucket prunes it (spec-vector murmur3, not a guess)
    val keep = (0L to 50L).find(IcebergTransforms.bucket(4, "long", _) == 0).get
    val drop = (0L to 50L).find(IcebergTransforms.bucket(4, "long", _) == 3).get
    assert(Iceberg.planFiles(spark, base,
      Seq(Iceberg.ColRange("id", keep, keep))).size == 1)
    assert(Iceberg.planFiles(spark, base,
      Seq(Iceberg.ColRange("id", drop, drop))).isEmpty)
  }

  test("incremental append scan serves only in-range ADDED files, refuses deletes") {
    val base = threeSnapshotTable()
    // (1002, 1003]: snapshot 1003 added f4 only — f3 (EXISTING via m2,
    // stamped 1002) and the carried manifests must NOT leak in
    assert(idsOf(Iceberg.readIncremental(spark, base, 1002L, 1003L)) ==
      Set(6L, 7L))
    // a range crossing snapshot 1002 is not append-only: 1002 DELETED f1
    val e1 = intercept[IllegalArgumentException](
      Iceberg.readIncremental(spark, base, 1001L, 1003L))
    assert(e1.getMessage.contains("append-only"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      Iceberg.readIncremental(spark, base, 1001L, 1002L))
    assert(e2.getMessage.contains("append-only"), e2.getMessage)
    // range misuse: unknown ids, and from must strictly precede to
    assert(intercept[IllegalArgumentException](
      Iceberg.readIncremental(spark, base, 999L, 1003L))
      .getMessage.contains("999"))
    assert(intercept[IllegalArgumentException](
      Iceberg.readIncremental(spark, base, 1003L, 1001L))
      .getMessage.contains("precede"))
    assert(intercept[IllegalArgumentException](
      Iceberg.readIncremental(spark, base, 1002L, 1002L))
      .getMessage.contains("precede"))
  }

  test("incremental scan inherits null entry snapshot_id from the manifest list") {
    // the spec's inheritance spelling: entries omit snapshot_id, the
    // manifest-list row's added_snapshot_id attributes them. Snapshot 6
    // is an empty baseline; 7 adds f via an omitted-id entry.
    val base = freshDir()
    val f = dataFileWithIds(base, "f.parquet", Seq((1L, 10L), (2L, 20L)))
    val ml6 = Iceberg.writeManifestList(spark, base, "snap6.avro", 6L, Nil)
    val m = Iceberg.writeManifest(spark, base, "m7.avro", 7L,
      Seq(Iceberg.Entry(f, 1, omitSnapshotId = true)))
    val ml7 = Iceberg.writeManifestList(spark, base, "snap7.avro", 7L, Seq(m))
    Iceberg.writeMetadata(spark, base, 2, Seq((6L, 1L, ml6), (7L, 2L, ml7)),
      schemaFieldsJson = "[" + Iceberg.fieldJson(1, "id", "long") + "," +
        Iceberg.fieldJson(2, "v", "long") + "]")
    assert(idsOf(Iceberg.readIncremental(spark, base, 6L, 7L)) == Set(1L, 2L))
  }

  test("incremental scan: carried manifests keep their ORIGINAL attribution") {
    // snapshot 8 carries m7 forward; its list row preserves
    // added_snapshot_id = 7 (what real lists do). With omitted entry
    // ids, inheritance must attribute f to 7, NOT 8 — so (7, 8] is an
    // append-free range whose empty frame still types from the schema.
    val base = freshDir()
    val f = dataFileWithIds(base, "f.parquet", Seq((1L, 10L)))
    val m = Iceberg.writeManifest(spark, base, "m7.avro", 7L,
      Seq(Iceberg.Entry(f, 1, omitSnapshotId = true)))
    val ml6 = Iceberg.writeManifestList(spark, base, "snap6.avro", 6L, Nil)
    val ml7 = Iceberg.writeManifestList(spark, base, "snap7.avro", 7L, Seq(m))
    val ml8 = Iceberg.writeManifestList(spark, base, "snap8.avro", 8L, Seq(m),
      addedSnapshotIds = Seq(7L))
    Iceberg.writeMetadata(spark, base, 3,
      Seq((6L, 1L, ml6), (7L, 2L, ml7), (8L, 3L, ml8)),
      schemaFieldsJson = "[" + Iceberg.fieldJson(1, "id", "long") + "," +
        Iceberg.fieldJson(2, "v", "long") + "]")
    val empty = Iceberg.readIncremental(spark, base, 7L, 8L)
    assert(empty.count() == 0L)
    assert(empty.columns.toSeq == Seq("id", "v"))
    // and the wider range still finds the append exactly once
    assert(idsOf(Iceberg.readIncremental(spark, base, 6L, 8L)) == Set(1L))
  }

  test("bucket summaries prune whole manifests unopened; truncate carries ranges") {
    // four manifests, one per bucket[4](id) value, summary [b, b] each;
    // second spec field truncate[10](v) bounds per manifest
    val base = freshDir()
    val files = (0 to 3).map { b =>
      b -> dataFileWithIds(base, s"f$b.parquet", Seq((b.toLong, b.toLong)))
    }.toMap
    val ms = (0 to 3).map { b =>
      Iceberg.writeManifest(spark, base, s"m$b.avro", 1L, Seq(
        Iceberg.Entry(files(b), 1,
          partition = Seq("id_bucket" -> b.toLong, "v_trunc" -> (b * 10).toLong))))
    }
    val ml = Iceberg.writeManifestList(spark, base, "snap.avro", 1L, ms,
      summaries = (0 to 3).map(b => Seq(
        Iceberg.Summary(Some(Iceberg.encodeInt(b)), Some(Iceberg.encodeInt(b))),
        Iceberg.Summary(Some(Iceberg.encodeLong(b * 10L)), Some(Iceberg.encodeLong(b * 10L))))))
    Iceberg.writeMetadata(spark, base, 1, Seq((1L, 1L, ml)),
      schemaFieldsJson = "[" + Iceberg.fieldJson(1, "id", "long") + "," +
        Iceberg.fieldJson(2, "v", "long") + "]",
      partitionSpecJson =
        """[{"name":"id_bucket","transform":"bucket[4]","source-id":1,"field-id":1000},""" +
          """{"name":"v_trunc","transform":"truncate[10]","source-id":2,"field-id":1001}]""")
    val k = 42L
    val b = IcebergTransforms.bucket(4, "long", k)
    assert(Iceberg.planFiles(spark, base,
      Seq(Iceberg.ColRange("id", k, k))) == Seq(files(b)))
    // truncate range: v in [12, 25] → truncated [10, 20] → manifests 1,2
    assert(Iceberg.planFiles(spark, base,
      Seq(Iceberg.ColRange("v", 12L, 25L))).toSet ==
      Set(files(1), files(2)))
    // the never-opened pin: delete every manifest EXCEPT bucket b's; the
    // point plan still works (summaries pruned the others before open),
    // an unpruned plan must fail trying
    (0 to 3).filter(_ != b).foreach { i =>
      assert(new java.io.File(base, s"metadata/m$i.avro").delete())
    }
    assert(Iceberg.planFiles(spark, base,
      Seq(Iceberg.ColRange("id", k, k))) == Seq(files(b)))
    intercept[Exception](Iceberg.planFiles(spark, base))
  }

  test("temporal transforms prune day windows and month buckets of a timestamp") {
    // planning-only fixture: metadata types ts as 'timestamp' (micros);
    // spec day(ts) → date-typed partition values, month(ts) → int. The
    // files are never opened by planFiles, so plain placeholders serve.
    val base = freshDir()
    val jan = java.time.LocalDate.of(2024, 1, 15).toEpochDay  // 19737
    val feb = java.time.LocalDate.of(2024, 2, 15).toEpochDay
    val fJan = dataFileWithIds(base, "jan.parquet", Seq((1L, 1L)))
    val fFeb = dataFileWithIds(base, "feb.parquet", Seq((2L, 2L)))
    val m = Iceberg.writeManifest(spark, base, "m.avro", 1L, Seq(
      Iceberg.Entry(fJan, 1,
        partition = Seq("ts_day" -> jan, "ts_month" -> ((2024L - 1970) * 12))),
      Iceberg.Entry(fFeb, 1,
        partition = Seq("ts_day" -> feb, "ts_month" -> ((2024L - 1970) * 12 + 1)))))
    val ml = Iceberg.writeManifestList(spark, base, "snap.avro", 1L, Seq(m))
    Iceberg.writeMetadata(spark, base, 1, Seq((1L, 1L, ml)),
      schemaFieldsJson = "[" + Iceberg.fieldJson(1, "ts", "timestamp") + "]",
      partitionSpecJson =
        """[{"name":"ts_day","transform":"day","source-id":1,"field-id":1000},""" +
          """{"name":"ts_month","transform":"month","source-id":1,"field-id":1001}]""")
    def us(d: java.time.LocalDate): Long = d.toEpochDay * 86400000000L
    // a mid-January day window plans only the January file (day field)
    assert(Iceberg.planFiles(spark, base, Seq(Iceberg.ColRange("ts",
      us(java.time.LocalDate.of(2024, 1, 10)),
      us(java.time.LocalDate.of(2024, 1, 20)) - 1))) == Seq(fJan))
    // a February-spanning window keeps only February (month field agrees)
    assert(Iceberg.planFiles(spark, base, Seq(Iceberg.ColRange("ts",
      us(java.time.LocalDate.of(2024, 2, 1)),
      us(java.time.LocalDate.of(2024, 2, 28)) - 1))) == Seq(fFeb))
    // a window crossing the month boundary keeps both
    assert(Iceberg.planFiles(spark, base, Seq(Iceberg.ColRange("ts",
      us(java.time.LocalDate.of(2024, 1, 10)),
      us(java.time.LocalDate.of(2024, 2, 20)))))
      .toSet == Set(fJan, fFeb))
  }

  test("partition-spec evolution: summaries are read under each manifest's OWN spec") {
    // spec 0 = [identity(cat)]; spec 1 = [identity(reg), identity(cat)] —
    // cat sits at summary position 0 vs 1. A reader that ignores
    // partition_spec_id and tests cat against position 0 everywhere
    // would compare cat ranges against REG summaries on spec-1 manifests.
    val base = freshDir()
    val fa = dataFileWithIds(base, "fa.parquet", Seq((1L, 1L)))
    val fb = dataFileWithIds(base, "fb.parquet", Seq((2L, 2L)))
    val m0 = Iceberg.writeManifest(spark, base, "m0.avro", 1L,
      Seq(Iceberg.Entry(fa, 1, partition = Seq("cat" -> "a"))))
    val m1 = Iceberg.writeManifest(spark, base, "m1.avro", 1L,
      Seq(Iceberg.Entry(fb, 1, partition = Seq("reg" -> "x", "cat" -> "b"))))
    val ml = Iceberg.writeManifestList(spark, base, "snap.avro", 1L,
      Seq(m0, m1), specIds = Seq(0, 1),
      summaries = Seq(
        Seq(Iceberg.Summary(Some(Iceberg.encodeString("a")), Some(Iceberg.encodeString("a")))),
        Seq(Iceberg.Summary(Some(Iceberg.encodeString("x")), Some(Iceberg.encodeString("x"))),
          Iceberg.Summary(Some(Iceberg.encodeString("b")), Some(Iceberg.encodeString("b"))))))
    Iceberg.writeMetadata(spark, base, 1, Seq((1L, 1L, ml)),
      schemaFieldsJson = "[" + Iceberg.fieldJson(1, "id", "long") + "," +
        Iceberg.fieldJson(2, "v", "long") + "," +
        Iceberg.fieldJson(3, "cat", "string") + "," +
        Iceberg.fieldJson(4, "reg", "string") + "]",
      evolvedSpecsJson = Seq(
        0 -> ("[" + Iceberg.identityPartitionJson(3, "cat", 1000) + "]"),
        1 -> ("[" + Iceberg.identityPartitionJson(4, "reg", 1001) + "," +
          Iceberg.identityPartitionJson(3, "cat", 1002) + "]")))
    // cat='b': m0 pruned by its spec-0 summary; m1 kept via position 1
    assert(Iceberg.planFiles(spark, base,
      Seq(Iceberg.ColRange("cat", "b", "b"))) == Seq(fb))
    // cat='x' matches NOTHING — but a position-0-everywhere reader would
    // match m1's reg summary ("x") and open it. Delete m1's Avro: the
    // spec-aware prune must still succeed (never opens it), empty plan.
    assert(new java.io.File(base, "metadata/m1.avro").delete())
    assert(Iceberg.planFiles(spark, base,
      Seq(Iceberg.ColRange("cat", "x", "x"))).isEmpty)
  }

  test("readAsOf breaks same-millisecond ties toward the LATER snapshot") {
    // two commits in one millisecond are real on busy tables; Iceberg's
    // selection keeps the LAST history entry <= ts — serving the earlier
    // one would silently drop the second commit's rows
    val base = freshDir()
    val f1 = dataFile(base, "f1.parquet", Seq(1L))
    val f2 = dataFile(base, "f2.parquet", Seq(2L))
    val m1 = Iceberg.writeManifest(spark, base, "m1.avro", 1L, Seq(Iceberg.Entry(f1, 1)))
    val m2 = Iceberg.writeManifest(spark, base, "m2.avro", 2L,
      Seq(Iceberg.Entry(f1, 0), Iceberg.Entry(f2, 1)))
    val ml1 = Iceberg.writeManifestList(spark, base, "s1.avro", 1L, Seq(m1))
    val ml2 = Iceberg.writeManifestList(spark, base, "s2.avro", 2L, Seq(m2))
    Iceberg.writeMetadata(spark, base, 1, Seq((1L, 1000L, ml1), (2L, 1000L, ml2)))
    assert(idsOf(Iceberg.readAsOf(spark, base, 1000L)) == Set(1L, 2L))
  }

  test("a double column accepts promoted 4-byte float bounds") {
    // spec-legal float → double promotion: old files keep 4-byte bounds
    assert(Iceberg.decodeBound("double",
      java.nio.ByteBuffer.allocate(4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putFloat(2.5f).array()) == 2.5)
    assert(Iceberg.decodeBound("long", Iceberg.encodeInt(7)) == 7L)
  }

  test("a fully-deleted snapshot of a schema-carrying table types the empty frame") {
    val base = freshDir()
    val f = dataFileWithIds(base, "f.parquet", Seq((1L, 1L)))
    // snapshot 2 DELETES the only file: zero live files, schema present
    val m1 = Iceberg.writeManifest(spark, base, "m1.avro", 1L, Seq(Iceberg.Entry(f, 1)))
    val m2 = Iceberg.writeManifest(spark, base, "m2.avro", 2L, Seq(Iceberg.Entry(f, 2)))
    val ml1 = Iceberg.writeManifestList(spark, base, "s1.avro", 1L, Seq(m1))
    val ml2 = Iceberg.writeManifestList(spark, base, "s2.avro", 2L, Seq(m2))
    Iceberg.writeMetadata(spark, base, 1, Seq((1L, 1L, ml1), (2L, 2L, ml2)),
      schemaFieldsJson = "[" + Iceberg.fieldJson(1, "id", "long") + "," +
        Iceberg.fieldJson(2, "v", "long") + "]")
    val df = Iceberg.read(spark, base)
    assert(df.count() == 0L && df.columns.toSeq == Seq("id", "v"))
    // the SCHEMA-LESS twin still refuses with the limitation named
    val base2 = freshDir()
    val g = dataFile(base2, "g.parquet", Seq(1L))
    val n1 = Iceberg.writeManifest(spark, base2, "m1.avro", 1L, Seq(Iceberg.Entry(g, 2)))
    val nl1 = Iceberg.writeManifestList(spark, base2, "s1.avro", 1L, Seq(n1))
    Iceberg.writeMetadata(spark, base2, 1, Seq((1L, 1L, nl1)))
    val e = intercept[IllegalArgumentException](Iceberg.read(spark, base2))
    assert(e.getMessage.contains("no schema"), e.getMessage)
  }

  test("pruning misuse is refused: no schema, unknown column, mistyped endpoint") {
    val base = threeSnapshotTable() // empty metadata schema
    val e1 = intercept[IllegalArgumentException](
      Iceberg.planFiles(spark, base, Seq(Iceberg.ColRange("id", 1L, 2L))))
    assert(e1.getMessage.contains("metadata schema"), e1.getMessage)
    val (base2, _) = prunedTable()
    val e2 = intercept[IllegalArgumentException](
      Iceberg.planFiles(spark, base2, Seq(Iceberg.ColRange("nope", 1L, 2L))))
    assert(e2.getMessage.contains("nope"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException](
      Iceberg.planFiles(spark, base2, Seq(Iceberg.ColRange("v", "1", "2"))))
    assert(e3.getMessage.contains("endpoint"), e3.getMessage)
  }

  test("equality deletes apply null-safely to strictly-OLDER data only") {
    // data f1 @ seq 1 = ids [1,2,3]; data f2 @ seq 3 = ids [2,4];
    // equality delete @ seq 2 on field id 1 (current name `id`) listing
    // ids {2,3}: f1's 2 and 3 predate the delete and die; f2's 2 was
    // committed AFTER the delete and must survive — a reader ignoring
    // sequence numbers deletes it too
    val base = freshDir()
    val f1 = dataFileWithIds(base, "f1.parquet", Seq((1L, 10L), (2L, 20L), (3L, 30L)))
    val f2 = dataFileWithIds(base, "f2.parquet", Seq((2L, 21L), (4L, 40L)))
    val ed = singleParquetFile(Seq(2L, 3L).toDF("id"), base, "ed.parquet")
    val m1 = Iceberg.writeManifest(spark, base, "m1.avro", 1L, Seq(Iceberg.Entry(f1, 1)))
    val m2 = Iceberg.writeManifest(spark, base, "m2.avro", 3L, Seq(Iceberg.Entry(f2, 1)))
    val dm = Iceberg.writeManifest(spark, base, "dm.avro", 2L,
      Seq(Iceberg.Entry(ed, 1, content = 2, equalityIds = Seq(1))))
    val ml = Iceberg.writeManifestList(spark, base, "snap.avro", 3L,
      Seq(m1, m2, dm), contents = Seq(0, 0, 1), sequenceNumbers = Seq(1L, 3L, 2L))
    Iceberg.writeMetadata(spark, base, 1, Seq((3L, 1L, ml)),
      schemaFieldsJson = "[" + Iceberg.fieldJson(1, "id", "long") + "," +
        Iceberg.fieldJson(2, "v", "long") + "]")
    val got = Iceberg.read(spark, base).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (2L, 21L), (4L, 40L)), got.mkString(", "))
    // an ENTRY-level explicit sequence number overrides the inherited
    // one: re-list f2's manifest with a STALE list-row seq but entry seq
    // 3 — result must not change
    val m2b = Iceberg.writeManifest(spark, base, "m2b.avro", 3L,
      Seq(Iceberg.Entry(f2, 1, sequenceNumber = Some(3L))))
    val ml2 = Iceberg.writeManifestList(spark, base, "snap2.avro", 3L,
      Seq(m1, m2b, dm), contents = Seq(0, 0, 1), sequenceNumbers = Seq(1L, 0L, 2L))
    Iceberg.writeMetadata(spark, base, 2, Seq((3L, 1L, ml2)),
      schemaFieldsJson = "[" + Iceberg.fieldJson(1, "id", "long") + "," +
        Iceberg.fieldJson(2, "v", "long") + "]")
    val got2 = Iceberg.read(spark, base).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got2 == got, got2.mkString(", "))
  }

  test("equality delete files resolve by FIELD ID too — a rename never matches the wrong column") {
    // the delete file predates a rename: its footer says old_a (field id
    // 1), the current schema names field 1 `id`. A by-name delete read
    // would throw (no column `id` in the delete footer) — or, on a swap
    // rename, silently delete by the WRONG column's values
    import org.apache.spark.sql.types._
    val base = freshDir()
    val f1 = dataFileWithIds(base, "f1.parquet", Seq((1L, 10L), (2L, 20L)))
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    val edSt = StructType(Seq(StructField("old_a", LongType, nullable = true,
      new MetadataBuilder().putLong("parquet.field.id", 1L).build())))
    val ed = singleParquetFile(spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(2L)), 1), edSt),
      base, "ed.parquet")
    val m1 = Iceberg.writeManifest(spark, base, "m1.avro", 1L, Seq(Iceberg.Entry(f1, 1)))
    val dm = Iceberg.writeManifest(spark, base, "dm.avro", 2L,
      Seq(Iceberg.Entry(ed, 1, content = 2, equalityIds = Seq(1))))
    val ml = Iceberg.writeManifestList(spark, base, "snap.avro", 2L,
      Seq(m1, dm), contents = Seq(0, 1), sequenceNumbers = Seq(1L, 2L))
    Iceberg.writeMetadata(spark, base, 1, Seq((2L, 1L, ml)),
      schemaFieldsJson = "[" + Iceberg.fieldJson(1, "id", "long") + "," +
        Iceberg.fieldJson(2, "v", "long") + "]")
    assert(idsOf(Iceberg.read(spark, base)) == Set(1L))
  }

  test("position and equality deletes COMPOSE on one table") {
    // real v2 tables with row-level DML carry both kinds; the metadata
    // row coordinates are attached once on the scan, so the equality
    // join must still see them after the position anti-join's output
    val base = freshDir()
    val f1 = dataFileWithIds(base, "f1.parquet", Seq((1L, 10L), (2L, 20L), (3L, 30L)))
    val pd = positionDeleteFile(base, "pd.parquet", Seq((f1, 0L)))  // kills id 1
    val ed = singleParquetFile(Seq(2L).toDF("id"), base, "ed.parquet") // kills id 2
    val m1 = Iceberg.writeManifest(spark, base, "m1.avro", 1L, Seq(Iceberg.Entry(f1, 1)))
    val pm = Iceberg.writeManifest(spark, base, "pm.avro", 2L,
      Seq(Iceberg.Entry(pd, 1, content = 1)))
    val dm = Iceberg.writeManifest(spark, base, "dm.avro", 2L,
      Seq(Iceberg.Entry(ed, 1, content = 2, equalityIds = Seq(1))))
    val ml = Iceberg.writeManifestList(spark, base, "snap.avro", 2L,
      Seq(m1, pm, dm), contents = Seq(0, 1, 1), sequenceNumbers = Seq(1L, 2L, 2L))
    Iceberg.writeMetadata(spark, base, 1, Seq((2L, 1L, ml)),
      schemaFieldsJson = "[" + Iceberg.fieldJson(1, "id", "long") + "," +
        Iceberg.fieldJson(2, "v", "long") + "]")
    assert(idsOf(Iceberg.read(spark, base)) == Set(3L))
  }

  test("equality deletes without sequence numbers, schema, or known ids are refused") {
    def build(seq: Boolean, schema: Boolean, fieldId: Int): String = {
      val base = freshDir()
      val f1 = dataFileWithIds(base, "f1.parquet", Seq((1L, 10L)))
      val ed = singleParquetFile(Seq(1L).toDF("id"), base, "ed.parquet")
      val m1 = Iceberg.writeManifest(spark, base, "m1.avro", 1L, Seq(Iceberg.Entry(f1, 1)))
      val dm = Iceberg.writeManifest(spark, base, "dm.avro", 2L,
        Seq(Iceberg.Entry(ed, 1, content = 2, equalityIds = Seq(fieldId))))
      val ml = Iceberg.writeManifestList(spark, base, "snap.avro", 2L,
        Seq(m1, dm), contents = Seq(0, 1),
        sequenceNumbers = if (seq) Seq(1L, 2L) else Nil)
      Iceberg.writeMetadata(spark, base, 1, Seq((2L, 1L, ml)),
        schemaFieldsJson = if (schema)
          "[" + Iceberg.fieldJson(1, "id", "long") + "]" else "[]")
      base
    }
    val e1 = intercept[IllegalArgumentException](
      Iceberg.read(spark, build(seq = false, schema = true, fieldId = 1)))
    // the refusal is PER-FILE (names the sequence-less file), not a vague
    // table-level complaint
    assert(e1.getMessage.contains("no sequence number") &&
      e1.getMessage.contains("f1.parquet"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      Iceberg.read(spark, build(seq = true, schema = false, fieldId = 1)))
    assert(e2.getMessage.contains("no schema"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException](
      Iceberg.read(spark, build(seq = true, schema = true, fieldId = 9)))
    assert(e3.getMessage.contains("field id 9"), e3.getMessage)
  }

  test("a non-table directory is refused with a clear message") {
    val e = intercept[IllegalArgumentException](
      Iceberg.read(spark, freshDir()))
    assert(e.getMessage.contains("metadata"), e.getMessage)
  }
}
