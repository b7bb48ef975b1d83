package graft.sources

import graft.SparkSpec

/** The append writer's laws: round-trip through the repo's OWN reader
  * (full, time-travel, incremental), footer-derived stats bounds that
  * actually prune, original-attribution carry, and the loud scope
  * gates (schema drift, id/timestamp reuse, partitioned or
  * delete-carrying tables, corrupt-metadata non-overwrite). */
class IcebergWriterSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    new java.io.File(java.nio.file.Files.createTempDirectory("icew").toString,
      "tbl").toString

  private def df(ids: Seq[Long]) =
    ids.map(i => (i, s"name_$i", i * 1.5)).toDF("id", "name", "score")

  test("create + append round-trips through read, time travel and incremental") {
    val base = freshDir()
    val v1 = IcebergWriter.commitAppend(spark, base, df(Seq(1L, 2L, 3L)), 101L, 1000L)
    val v2 = IcebergWriter.commitAppend(spark, base, df(Seq(10L, 20L)), 102L, 2000L)
    assert(v1 == 1 && v2 == 2)
    def ids(d: org.apache.spark.sql.DataFrame): Set[Long] =
      d.select("id").collect().map(_.getLong(0)).toSet
    assert(ids(Iceberg.read(spark, base)) == Set(1L, 2L, 3L, 10L, 20L))
    assert(Iceberg.read(spark, base).columns.toSeq == Seq("id", "name", "score"))
    assert(ids(Iceberg.readSnapshot(spark, base, 101L)) == Set(1L, 2L, 3L))
    assert(ids(Iceberg.readIncremental(spark, base, 101L, 102L)) == Set(10L, 20L))
    assert(Iceberg.snapshots(spark, base) == Seq((101L, 1000L), (102L, 2000L)))
    // AS-OF timestamp rides the committed history
    assert(ids(Iceberg.readAsOf(spark, base, 1500L)) == Set(1L, 2L, 3L))
  }

  test("footer-derived bounds prune long AND string columns") {
    val base = freshDir()
    IcebergWriter.commitAppend(spark, base,
      df(Seq(1L, 2L, 3L)).coalesce(1), 101L, 1000L)
    IcebergWriter.commitAppend(spark, base,
      df(Seq(100L, 200L)).coalesce(1), 102L, 2000L)
    val all = Iceberg.planFiles(spark, base)
    assert(all.size == 2)
    // id in [150, 250] overlaps only the second commit's [100, 200]
    val byId = Iceberg.planFiles(spark, base,
      Seq(Iceberg.ColRange("id", 150L, 250L)))
    assert(byId.size == 1 && byId.head.contains("snap102"), byId.mkString(", "))
    // string bounds: names sort name_1..name_3 vs name_100/name_200
    val byName = Iceberg.planFiles(spark, base,
      Seq(Iceberg.ColRange("name", "name_3", "name_99")))
    assert(byName.size == 1 && byName.head.contains("snap101"), byName.mkString(", "))
    // double bounds: score = id * 1.5
    val byScore = Iceberg.planFiles(spark, base,
      Seq(Iceberg.ColRange("score", 100.0, 400.0)))
    assert(byScore.size == 1 && byScore.head.contains("snap102"), byScore.mkString(", "))
    // the pruned read still equals the filtered full read (soundness)
    import org.apache.spark.sql.functions.col
    val p = Iceberg.readPruned(spark, base, Seq(Iceberg.ColRange("id", 150L, 250L)))
      .where(col("id").between(150L, 250L)).collect().map(_.getLong(0)).toSet
    assert(p == Set(200L))
  }

  test("a multi-part append carries per-FILE bounds, not per-commit") {
    val base = freshDir()
    // range-partition into two parts with disjoint id ranges in ONE commit
    val two = df((1L to 40L)).repartitionByRange(2, $"id")
    IcebergWriter.commitAppend(spark, base, two, 101L, 1000L)
    val all = Iceberg.planFiles(spark, base)
    assert(all.size == 2)
    val hit = Iceberg.planFiles(spark, base, Seq(Iceberg.ColRange("id", 1L, 2L)))
    assert(hit.size == 1, hit.mkString(", "))
  }

  test("scope gates refuse loudly: drift, reuse, regression, partitioned, deletes") {
    val base = freshDir()
    IcebergWriter.commitAppend(spark, base, df(Seq(1L)), 101L, 1000L)
    // schema drift
    val e1 = intercept[IllegalArgumentException](IcebergWriter.commitAppend(
      spark, base, Seq((1L, "x")).toDF("id", "name"), 102L, 2000L))
    assert(e1.getMessage.contains("does not"), e1.getMessage)
    // snapshot id reuse
    val e2 = intercept[IllegalArgumentException](IcebergWriter.commitAppend(
      spark, base, df(Seq(2L)), 101L, 2000L))
    assert(e2.getMessage.contains("already exists"), e2.getMessage)
    // timestamp regression
    val e3 = intercept[IllegalArgumentException](IcebergWriter.commitAppend(
      spark, base, df(Seq(2L)), 102L, 999L))
    assert(e3.getMessage.contains("monotonic"), e3.getMessage)
    // UNKNOWN-transform partitioned table: deriving values under
    // guessed semantics would corrupt pruning — refuse (known
    // transforms like bucket[4] append fine since the hidden-partition
    // write tier; see the hidden-partition tests)
    val part = freshDir()
    val fp = {
      val tmp = new java.io.File(part, ".t").toString
      df(Seq(1L)).coalesce(1).write.parquet(tmp)
      val p = new java.io.File(tmp).listFiles()
        .filter(f => f.isFile && f.getName.endsWith(".parquet")).head
      p.getAbsolutePath
    }
    val m = Iceberg.writeManifest(spark, part, "m.avro", 1L,
      Seq(Iceberg.Entry(fp, 1, partition = Seq("cat" -> "a"))))
    val ml = Iceberg.writeManifestList(spark, part, "snap.avro", 1L, Seq(m))
    Iceberg.writeMetadata(spark, part, 1, Seq((1L, 1L, ml)),
      schemaFieldsJson = "[" + Iceberg.fieldJson(1, "id", "long") + "]",
      partitionSpecJson =
        """[{"name":"cat","transform":"zorder17","source-id":1,"field-id":1000}]""")
    val e4 = intercept[IllegalArgumentException](IcebergWriter.commitAppend(
      spark, part, Seq(2L).toDF("id"), 2L, 2000L))
    assert(e4.getMessage.contains("zorder17"), e4.getMessage)
    // delete-manifest-carrying table
    val mor = freshDir()
    val md = Iceberg.writeManifest(spark, mor, "m.avro", 1L,
      Seq(Iceberg.Entry(fp, 1)))
    val mld = Iceberg.writeManifestList(spark, mor, "snap.avro", 1L,
      Seq(md), contents = Seq(1))
    Iceberg.writeMetadata(spark, mor, 1, Seq((1L, 1L, mld)),
      schemaFieldsJson = "[" + Iceberg.fieldJson(1, "id", "long") + "]")
    val e5 = intercept[IllegalArgumentException](IcebergWriter.commitAppend(
      spark, mor, Seq(2L).toDF("id"), 2L, 2000L))
    assert(e5.getMessage.contains("DELETE manifests"), e5.getMessage)
  }

  test("identity-partitioned create + append: values, summaries, pruning") {
    val base = freshDir()
    val p1 = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "a", 3.0))
      .toDF("id", "cat", "score")
    IcebergWriter.commitAppend(spark, base, p1, 101L, 1000L,
      partitionBy = Seq("cat"))
    // append derives the spec from metadata — no partitionBy needed
    val p2 = Seq((4L, "b", 4.0), (5L, "c", 5.0)).toDF("id", "cat", "score")
    IcebergWriter.commitAppend(spark, base, p2, 102L, 2000L)
    def ids(d: org.apache.spark.sql.DataFrame): Set[Long] =
      d.select("id").collect().map(_.getLong(0)).toSet
    assert(ids(Iceberg.read(spark, base)) == (1L to 5L).toSet)
    // one file per value per commit: {a,b} + {b,c}
    assert(Iceberg.planFiles(spark, base).size == 4)
    assert(Iceberg.planFiles(spark, base,
      Seq(Iceberg.ColRange("cat", "a", "a"))).size == 1)
    assert(Iceberg.planFiles(spark, base,
      Seq(Iceberg.ColRange("cat", "b", "b"))).size == 2)
    assert(Iceberg.planFiles(spark, base,
      Seq(Iceberg.ColRange("cat", "z", "z"))).isEmpty)
    // data files KEEP the partition column — the pruned read serves it
    import org.apache.spark.sql.functions.col
    val a = Iceberg.readPruned(spark, base,
        Seq(Iceberg.ColRange("cat", "a", "a")))
      .where(col("cat") === "a")
    assert(ids(a) == Set(1L, 3L))
    // manifest-list SUMMARIES prune whole manifests UNOPENED: delete
    // commit 101's manifest from disk; a cat='c' plan must still work
    // (its summary [a..b] is disjoint) and serve commit 102's c file
    val md = new java.io.File(base, "metadata")
    assert(new java.io.File(md, "m-snap101.avro").delete())
    val c = Iceberg.planFiles(spark, base,
      Seq(Iceberg.ColRange("cat", "c", "c")))
    assert(c.size == 1 && c.head.contains("snap102"), c.mkString(", "))
  }

  test("partitioned append refusals: null values, contradicting partitionBy") {
    val base = freshDir()
    IcebergWriter.commitAppend(spark, base,
      Seq((1L, "a", 1.0)).toDF("id", "cat", "score"), 101L, 1000L,
      partitionBy = Seq("cat"))
    val e1 = intercept[IllegalArgumentException](IcebergWriter.commitAppend(
      spark, base, Seq((2L, null.asInstanceOf[String], 2.0))
        .toDF("id", "cat", "score"), 102L, 2000L))
    assert(e1.getMessage.contains("NULL partition"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](IcebergWriter.commitAppend(
      spark, base, Seq((2L, "b", 2.0)).toDF("id", "cat", "score"),
      102L, 2000L, partitionBy = Seq("score")))
    assert(e2.getMessage.contains("contradicts"), e2.getMessage)
    // long-typed identity partition prunes too
    val t2 = freshDir()
    IcebergWriter.commitAppend(spark, t2,
      Seq((1L, 10L), (2L, 20L)).toDF("id", "day"), 201L, 1000L,
      partitionBy = Seq("day"))
    assert(Iceberg.planFiles(spark, t2,
      Seq(Iceberg.ColRange("day", 15L, 25L))).size == 1)
  }

  test("schema evolution: rename serves old files, add null-fills, re-add never resurrects") {
    val base = freshDir()
    IcebergWriter.commitAppend(spark, base, df(Seq(1L, 2L)).coalesce(1), 101L, 1000L)
    // rename: old files serve the NEW name through their field ids
    IcebergWriter.renameColumn(spark, base, "score", "points")
    val r = Iceberg.read(spark, base)
    assert(r.columns.toSeq == Seq("id", "name", "points"))
    assert(r.select("points").collect().map(_.getDouble(0)).toSet == Set(1.5, 3.0))
    // add: pre-evolution files null-fill; post-evolution appends carry it
    IcebergWriter.addColumn(spark, base, "rank", "long")
    IcebergWriter.commitAppend(spark, base,
      Seq((3L, "n3", 4.5, 30L)).toDF("id", "name", "points", "rank")
        .coalesce(1), 102L, 2000L)
    def ranks(): Map[Long, Option[Long]] =
      Iceberg.read(spark, base).select("id", "rank").collect()
        .map(x => x.getLong(0) ->
          (if (x.isNullAt(1)) None else Some(x.getLong(1)))).toMap
    assert(ranks() == Map(1L -> None, 2L -> None, 3L -> Some(30L)))
    // drop, then re-add the SAME name: a FRESH field id — row 3's old
    // rank value stays dead (the spec's id-not-name core)
    IcebergWriter.dropColumn(spark, base, "rank")
    assert(Iceberg.read(spark, base).columns.toSeq == Seq("id", "name", "points"))
    IcebergWriter.addColumn(spark, base, "rank", "long")
    assert(ranks().values.forall(_.isEmpty), ranks())
  }

  test("schema evolution refusals: collisions, unknowns, partition sources") {
    val base = freshDir()
    IcebergWriter.commitAppend(spark, base, df(Seq(1L)).coalesce(1), 101L, 1000L)
    val e1 = intercept[IllegalArgumentException](
      IcebergWriter.addColumn(spark, base, "name", "string"))
    assert(e1.getMessage.contains("taken"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      IcebergWriter.addColumn(spark, base, "blob", "wibble"))
    assert(e2.getMessage.toLowerCase.contains("wibble"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException](
      IcebergWriter.renameColumn(spark, base, "nope", "x"))
    assert(e3.getMessage.contains("no such column"), e3.getMessage)
    val e4 = intercept[IllegalArgumentException](
      IcebergWriter.renameColumn(spark, base, "id", "name"))
    assert(e4.getMessage.contains("taken"), e4.getMessage)
    // a partition-spec source column cannot be dropped
    val part = freshDir()
    IcebergWriter.commitAppend(spark, part,
      Seq((1L, "a", 1.0)).toDF("id", "cat", "score"), 201L, 1000L,
      partitionBy = Seq("cat"))
    val e5 = intercept[IllegalArgumentException](
      IcebergWriter.dropColumn(spark, part, "cat"))
    assert(e5.getMessage.contains("partition"), e5.getMessage)
    // a column live EQUALITY deletes key on cannot be dropped — the
    // table would become unreadable and the re-add gets a fresh id
    val mor = freshDir()
    IcebergWriter.commitAppend(spark, mor, df(Seq(1L, 2L)).coalesce(1), 301L, 1000L)
    IcebergWriter.upsert(spark, mor,
      Seq((2L, "b", 9.0)).toDF("id", "name", "score").coalesce(1),
      Seq("id"), 302L, 2000L)
    val e6 = intercept[IllegalArgumentException](
      IcebergWriter.dropColumn(spark, mor, "id"))
    assert(e6.getMessage.contains("EQUALITY"), e6.getMessage)
    // after compaction the deletes are gone and the drop is legal
    IcebergWriter.compact(spark, mor, 303L, 3000L)
    IcebergWriter.dropColumn(spark, mor, "id")
    assert(Iceberg.read(spark, mor).columns.toSeq == Seq("name", "score"))
  }

  test("deleteWhere commits a position-delete snapshot; history stays intact") {
    import org.apache.spark.sql.functions.col
    val base = freshDir()
    IcebergWriter.commitAppend(spark, base, df((1L to 10L)).coalesce(1), 101L, 1000L)
    val v = IcebergWriter.deleteWhere(spark, base, col("id") % 3 === 0, 102L, 2000L)
    assert(v == 2)
    def ids(d: org.apache.spark.sql.DataFrame): Set[Long] =
      d.select("id").collect().map(_.getLong(0)).toSet
    // merge-on-read serves the survivors; the data file was NOT rewritten
    assert(ids(Iceberg.read(spark, base)) ==
      (1L to 10L).filterNot(_ % 3 == 0).toSet)
    assert(ids(Iceberg.readSnapshot(spark, base, 101L)) == (1L to 10L).toSet)
    assert(Iceberg.planFiles(spark, base).size == 1) // same single data file
    // a SECOND delete composes (prior delete manifest carried verbatim)
    val v2 = IcebergWriter.deleteWhere(spark, base, col("id") === 2L, 103L, 3000L)
    assert(v2 == 3)
    assert(ids(Iceberg.read(spark, base)) == Set(1L, 4L, 5L, 7L, 8L, 10L))
    assert(ids(Iceberg.readSnapshot(spark, base, 102L)) ==
      (1L to 10L).filterNot(_ % 3 == 0).toSet)
    // zero matches: no-op, version unchanged
    assert(IcebergWriter.deleteWhere(spark, base, col("id") > 99L, 104L, 4000L) == 3)
    assert(Iceberg.snapshots(spark, base).map(_._1) == Seq(101L, 102L, 103L))
    // deleting everything leaves a typed empty current snapshot
    IcebergWriter.deleteWhere(spark, base, col("id") > 0L, 105L, 5000L)
    val empty = Iceberg.read(spark, base)
    assert(empty.count() == 0L)
    assert(empty.columns.toSeq == Seq("id", "name", "score"))
  }

  test("a corrupt existing table refuses — it is never silently re-created") {
    val base = freshDir()
    val md = new java.io.File(base, "metadata")
    md.mkdirs()
    val w = new java.io.PrintWriter(new java.io.File(md, "version-hint.text"))
    w.print("1"); w.close()
    // hint names v1 but no v1.metadata.json exists → loud, no create
    intercept[Exception](IcebergWriter.commitAppend(
      spark, base, df(Seq(1L)), 101L, 1000L))
    assert(!new java.io.File(md, "v1.metadata.json").exists())
  }

  test("unsupported Spark column types are refused by name") {
    val base = freshDir()
    val e = intercept[IllegalArgumentException](IcebergWriter.commitAppend(
      spark, base, Seq((1L, Seq(1, 2))).toDF("id", "arr"), 101L, 1000L))
    assert(e.getMessage.contains("arr") || e.getMessage.contains("array"),
      e.getMessage)
  }

  /** Every entry's `data_file.partition` struct across the current
    * snapshot's manifests, as (fieldName → value) maps. */
  private def partitionStructs(base: String, snapshotId: Long): Seq[Map[String, Any]] = {
    val doc = Iceberg.metadata(spark, base)
    val ml = Iceberg.manifestListOf(doc, base, snapshotId)
    Iceberg.readAvro(spark, Iceberg.resolve(base, ml))
      .map(_.get("manifest_path").toString)
      .flatMap(mp => Iceberg.readAvro(spark, Iceberg.resolve(base, mp)))
      .map { e =>
        val d = e.get("data_file").asInstanceOf[org.apache.avro.generic.GenericRecord]
        val p = d.get("partition").asInstanceOf[org.apache.avro.generic.GenericRecord]
        p.getSchema.getFields.asInstanceOf[java.util.List[org.apache.avro.Schema.Field]]
          .toArray.map(_.asInstanceOf[org.apache.avro.Schema.Field].name)
          .map(n => n -> (p.get(n) match {
            case l: java.lang.Long => l.longValue
            case i: java.lang.Integer => i.longValue
            case s: CharSequence => s.toString
            case other => other
          })).toMap
      }
  }

  test("hidden-partition append: day+bucket values are spec-exact, one file per tuple, point probes plan it alone") {
    val base = freshDir()
    val usDay = 86400000000L
    val rows = Seq((1L, usDay * 100 + 123L), (2L, usDay * 100 + 456L),
      (3L, usDay * 101 + 789L))
    val d = rows.toDF("id", "us").selectExpr("id", "timestamp_micros(us) AS ets")
    IcebergWriter.commitAppend(spark, base, d, 501L, 1000L,
      partitionBy = Seq("day(ets)", "bucket(4, id)"))
    // the manifest's partition structs hold the TRANSFORMED values, one
    // live tuple per file, derived by the SAME functions the reader
    // prunes with — the write/read transform-consistency law
    val expected = rows.map { case (id, us) =>
      Map("ets_day" -> IcebergTransforms.dayFromMicros(us),
        "id_bucket" -> IcebergTransforms.bucket(4, "long", id).toLong)
    }.toSet
    assert(partitionStructs(base, 501L).toSet == expected.asInstanceOf[Set[Map[String, Any]]])
    // a one-day range + point id maps through the spec to (day, bucket)
    // and plans exactly the file that tuple landed in
    rows.foreach { case (id, us) =>
      val day = IcebergTransforms.dayFromMicros(us)
      val files = Iceberg.planFiles(spark, base,
        Seq(Iceberg.ColRange("ets", day * usDay, day * usDay + usDay - 1),
          Iceberg.ColRange("id", id, id)))
      assert(files.size == 1, s"id=$id planned ${files.size} files")
    }
    // a day no row lives in plans ZERO files off the summaries alone
    assert(Iceberg.planFiles(spark, base,
      Seq(Iceberg.ColRange("ets", 99 * usDay, 99 * usDay + usDay - 1))).isEmpty)
    // round-trip: the partitioned read serves every row
    assert(Iceberg.read(spark, base).count() == 3L)
  }

  test("truncate, bucket(string), month and hour partition values follow the spec functions") {
    val base = freshDir()
    val d = Seq((15L, "alpha"), (27L, "alpine"), (-3L, "beta"))
      .toDF("id", "name")
    IcebergWriter.commitAppend(spark, base, d, 502L, 1000L,
      partitionBy = Seq("truncate(10, id)", "bucket(8, name)"))
    val expected = Seq((15L, "alpha"), (27L, "alpine"), (-3L, "beta")).map {
      case (id, n) => Map(
        "id_trunc" -> IcebergTransforms.truncateLong(10L, id),
        "name_bucket" -> IcebergTransforms.bucket(8, "string", n).toLong)
    }.toSet
    assert(partitionStructs(base, 502L).toSet == expected.asInstanceOf[Set[Map[String, Any]]])
    // truncate[10](-3) floors to -10 (Python-style modulo), never 0
    assert(expected.exists(_("id_trunc") == -10L))
    // temporal buckets: one table, month + hour of the same timestamp
    val base2 = freshDir()
    val us = 86400000000L * 400 + 3600000000L * 5 + 42L
    val d2 = Seq((1L, us)).toDF("id", "us")
      .selectExpr("id", "timestamp_micros(us) AS ets")
    IcebergWriter.commitAppend(spark, base2, d2, 503L, 1000L,
      partitionBy = Seq("month(ets)", "hour(ets)"))
    assert(partitionStructs(base2, 503L) == Seq(Map(
      "ets_month" -> IcebergTransforms.monthFromMicros(us),
      "ets_hour" -> IcebergTransforms.hourFromMicros(us))))
  }

  test("hidden-partition gates: unknown spelling refuses, appends honor the stored spec") {
    val base = freshDir()
    val d = Seq((1L, 86400000000L)).toDF("id", "us")
      .selectExpr("id", "timestamp_micros(us) AS ets")
    intercept[IllegalArgumentException](IcebergWriter.commitAppend(
      spark, base, d, 504L, 1000L, partitionBy = Seq("cube(3, id)")))
    IcebergWriter.commitAppend(spark, base, d, 504L, 1000L,
      partitionBy = Seq("day(ets)"))
    // a matching partitionBy restatement is fine; a contradicting one refuses
    IcebergWriter.commitAppend(spark, base, d, 505L, 2000L,
      partitionBy = Seq("day(ets)"))
    val e = intercept[IllegalArgumentException](IcebergWriter.commitAppend(
      spark, base, d, 506L, 3000L, partitionBy = Seq("hour(ets)")))
    assert(e.getMessage.contains("contradicts"), e.getMessage)
    // an omitted partitionBy derives from the STORED spec: both commits'
    // files carry day values, so the day probe plans both
    assert(Iceberg.planFiles(spark, base,
      Seq(Iceberg.ColRange("ets", 86400000000L, 2 * 86400000000L - 1))).size == 2)
    assert(Iceberg.read(spark, base).count() == 2L)
  }
}
