package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SQL `OPTIMIZE <table> [ZORDER BY (cols)]` — the literal maintenance
  * statement the reference's notebooks run
  * (`01_geofraud_clustering.py:440`), parsed by the injected
  * GraftSqlParser and routed through GraftCatalog.optimizeZOrder to the
  * same writer passes as `CALL <cat>.system.optimize(...)`. The 1-of-N
  * pruned-read law for the clustered rewrite itself is pinned by q254
  * (Iceberg) and q134/q196 (Delta z-scan); this suite pins the statement
  * surface plus the 2-D clustering property of the Morton key. */
class SqlOptimizeSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("sqlopt").toString

  private def freshCatalog(): (String, FileRegistryCatalog) = {
    val name = "so" + java.util.UUID.randomUUID().toString.take(8)
    val reg = freshDir() + "/registry.json"
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.registry", reg)
    (name, new FileRegistryCatalog(spark, reg))
  }

  /** The reference's tiles shape: (user, h3) string columns. */
  private def tiles = (0 until 400).map { k =>
    (f"user${k % 20}%03d", f"8b2a10${k / 20}%02dfff", k.toLong)
  }.toDF("user", "h3", "hits")

  test("the reference's exact statement runs by name on a Delta table") {
    val (cat, reg) = freshCatalog()
    val d = freshDir() + "/tiles"
    DeltaLogWriter.write(tiles.repartition(4), d)                     // v0
    reg.register("geoscan.tiles", d)
    // 01_geofraud_clustering.py:440 verbatim, table name substituted
    val out = spark.sql(s"OPTIMIZE $cat.geoscan.tiles ZORDER BY (user, h3)")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("committed_version", 1L)), out.toSeq.toString)
    // content untouched, rewrite committed as maintenance
    assert(spark.sql(s"SELECT * FROM $cat.geoscan.tiles").count() == 400L)
    assert(spark.sql(s"SELECT sum(hits) FROM $cat.geoscan.tiles")
      .head.getLong(0) == (0L until 400L).sum)
  }

  test("bare table name resolves through the current catalog (USE)") {
    val (cat, reg) = freshCatalog()
    val d = freshDir() + "/tiles"
    DeltaLogWriter.write(tiles.coalesce(2), d)
    reg.register("geoscan.tiles", d)
    val prev = spark.catalog.currentCatalog()
    try {
      spark.catalog.setCurrentCatalog(cat)
      val out = spark.sql("OPTIMIZE geoscan.tiles ZORDER BY (user, h3)").collect()
      assert(out.head.getString(0) == "committed_version")
    } finally spark.catalog.setCurrentCatalog(prev)
  }

  test("the statement routes to Iceberg clustered compaction by name") {
    val (cat, reg) = freshCatalog()
    val i = freshDir() + "/tiles"
    IcebergWriter.commitAppend(spark, i, tiles.coalesce(2), 951L, 1000L)
    reg.register("geoscan.tiles", i)
    val out = spark.sql(s"OPTIMIZE $cat.geoscan.tiles ZORDER BY (user, h3)")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.length == 1 && out.head._1 == "metadata_version")
    assert(spark.sql(s"SELECT * FROM $cat.geoscan.tiles").count() == 400L)
  }

  test("plain OPTIMIZE (no ZORDER) bin-packs; malformed WHERE and non-graft catalog refuse") {
    val (cat, reg) = freshCatalog()
    val d = freshDir() + "/t"
    DeltaLogWriter.write((1L to 40L).toDF("id").repartition(4), d)
    reg.register("ns.t", d)
    val out = spark.sql(s"OPTIMIZE $cat.ns.t").collect()
    assert(out.head.getString(0) == "committed_version" && out.head.getLong(1) == 1L)
    assert(DeltaLogReader.activeFiles(spark, d).size == 1)
    // a non-comparison WHERE refuses with the supported grammar named
    val e = intercept[IllegalArgumentException](
      spark.sql(s"OPTIMIZE $cat.ns.t WHERE id LIKE 'x'"))
    assert(e.getMessage.contains("comparison"), e.getMessage)
    // a range term on a NON-partition column refuses at the writer
    val eRange = intercept[IllegalArgumentException](
      spark.sql(s"OPTIMIZE $cat.ns.t WHERE id > 3"))
    assert(eRange.getMessage.contains("not a partition column"), eRange.getMessage)
    // a REPEATED equality refuses (redundant or contradictory)
    val eDup = intercept[IllegalArgumentException](
      spark.sql(s"OPTIMIZE $cat.ns.t WHERE day = '1' AND day = '2'"))
    assert(eDup.getMessage.contains("repeated equality"), eDup.getMessage)
    // equality + range bound on one column refuses too
    val eMix = intercept[IllegalArgumentException](
      spark.sql(s"OPTIMIZE $cat.ns.t WHERE day = '1' AND day < '3'"))
    assert(eMix.getMessage.contains("mixes equality and range"), eMix.getMessage)
    // equality on a NON-partition column refuses by name
    val eNp = intercept[IllegalArgumentException](
      spark.sql(s"OPTIMIZE $cat.ns.t WHERE id = 3").collect())
    assert(eNp.getMessage.contains("not a partition column"), eNp.getMessage)
    val e2 = intercept[UnsupportedOperationException](
      spark.sql("OPTIMIZE spark_catalog.default.nope ZORDER BY (a)"))
    assert(e2.getMessage.contains("not a graft catalog"), e2.getMessage)
    // a leading SQL comment still reaches this front-end (not Spark's
    // opaque parser error) …
    val out2 = spark.sql(s"-- nightly maintenance\nOPTIMIZE $cat.ns.t").collect()
    assert(out2.head.getString(0) == "committed_version" &&
      out2.head.getLong(1) == 2L)
    val e3 = intercept[IllegalArgumentException](
      spark.sql(s"/* scheduled */ OPTIMIZE $cat.ns.t WHERE id LIKE 'x'"))
    assert(e3.getMessage.contains("comparison"), e3.getMessage)
    // … and a token merely PREFIXED with OPTIMIZE delegates to Spark's own
    // parser instead of this front-end's refusal
    val e4 = intercept[Exception](spark.sql("OPTIMIZER_HINTS FOR t"))
    assert(!e4.isInstanceOf[IllegalArgumentException] ||
      !e4.getMessage.contains("this front-end"), e4.getClass.getName)
  }

  test("OPTIMIZE WHERE scopes the rewrite on BOTH formats; unpartitioned Iceberg refuses") {
    val (cat, reg) = freshCatalog()
    val d = freshDir() + "/events"
    // 3 days × 4 files each, hive-partitioned on day
    val df = (0 until 240).map(k => (k % 3, k.toLong, f"u${k % 7}"))
      .toDF("day", "v", "u")
    DeltaLogWriter.write(df.repartition(4), d, partitionBy = Seq("day"))
    reg.register("ns.events", d)
    val before = DeltaLogReader.activeFiles(spark, d)
    val untouchedBefore = before.filterNot(_.contains("day=1")).toSet
    assert(before.count(_.contains("day=1")) >= 4, before.mkString(", "))
    val out = spark
      .sql(s"OPTIMIZE $cat.ns.events WHERE day = 1 ZORDER BY (u, v)")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("committed_version", 1L)), out.toSeq.toString)
    val after = DeltaLogReader.activeFiles(spark, d)
    // the named partition compacted to ONE file …
    assert(after.count(_.contains("day=1")) == 1, after.mkString(", "))
    // … and every file of the UNTOUCHED partitions survives verbatim
    assert(after.filterNot(_.contains("day=1")).toSet == untouchedBefore)
    // content invariant across the whole table
    assert(spark.sql(s"SELECT sum(v) FROM $cat.ns.events").head.getLong(0) ==
      (0L until 240L).sum)
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.events WHERE day = 1")
      .head.getLong(0) == 80L)
    // partition keys resolve case-insensitively, like ZORDER BY columns
    val out2 = spark.sql(s"OPTIMIZE $cat.ns.events WHERE DAY = 2").collect()
    assert(out2.head.getString(0) == "committed_version", out2.mkString(", "))
    assert(DeltaLogReader.activeFiles(spark, d).count(_.contains("day=2")) == 1)
    // empty scope refuses by the partitions named
    val eEmpty = intercept[IllegalArgumentException](
      spark.sql(s"OPTIMIZE $cat.ns.events WHERE day = 9").collect())
    assert(eEmpty.getMessage.contains("no active files"), eEmpty.getMessage)
    // Iceberg lane: the same statement scopes an identity-partitioned
    // compaction; unpartitioned tables refuse the scope by name
    val i = freshDir() + "/ice"
    import spark.implicits._
    val iceDf = (0 until 120).map(k => (k.toLong, (k % 3).toLong, f"u${k % 7}"))
      .toDF("v", "day", "u")
    IcebergWriter.commitAppend(spark, i, iceDf.coalesce(2), 952L, 1000L,
      partitionBy = Seq("day"))
    IcebergWriter.commitAppend(spark, i, iceDf.coalesce(2), 953L, 2000L)
    reg.register("ns.ice", i)
    val outIce = spark.sql(s"OPTIMIZE $cat.ns.ice WHERE day = 1").collect()
    assert(outIce.head.getString(0) == "metadata_version")
    val planned = Iceberg.planFiles(spark, i)
    assert(planned.count(_.contains("compact")) == 1, planned.mkString(", "))
    assert(spark.sql(s"SELECT sum(v) FROM $cat.ns.ice").head.getLong(0) ==
      2L * (0L until 120L).sum)
    // a ZORDER typo on the scoped lane refuses by name, up front
    val eSort = intercept[IllegalArgumentException](
      spark.sql(s"OPTIMIZE $cat.ns.ice WHERE day = 2 ZORDER BY (nope)").collect())
    assert(eSort.getMessage.contains("nope"), eSort.getMessage)
    // case-insensitive partition-field resolution on the Iceberg lane too
    val outIce2 = spark.sql(s"OPTIMIZE $cat.ns.ice WHERE DAY = 0").collect()
    assert(outIce2.head.getString(0) == "metadata_version")
    assert(spark.sql(s"SELECT sum(v) FROM $cat.ns.ice").head.getLong(0) ==
      2L * (0L until 120L).sum)
    val iFlat = freshDir() + "/iceflat"
    IcebergWriter.commitAppend(spark, iFlat, tiles.coalesce(2), 954L, 1000L)
    reg.register("ns.iceflat", iFlat)
    val eIce = intercept[IllegalArgumentException](
      spark.sql(s"OPTIMIZE $cat.ns.iceflat WHERE user = 'user001'").collect())
    assert(eIce.getMessage.contains("UNPARTITIONED"), eIce.getMessage)
  }

  test("scoped OPTIMIZE selection agreement: null partitions, cased duplicates, foreign layouts, date scopes") {
    val (cat, reg) = freshCatalog()
    // Delta: a table WITH a null partition — scoping ON the null
    // partition refuses (column equality cannot select null rows; the
    // path match would drop them), scoping a NON-null partition leaves
    // the null rows bit-intact
    val d = freshDir() + "/nulls"
    val df = Seq((Option(1), 10L), (None, 20L), (Option(1), 30L),
      (None, 40L), (Option(2), 50L)).toDF("day", "v")
    DeltaLogWriter.write(df.repartition(3), d, partitionBy = Seq("day"))
    reg.register("ns.nulls", d)
    val eNull = intercept[IllegalArgumentException](spark.sql(
      s"OPTIMIZE $cat.ns.nulls WHERE day = '__HIVE_DEFAULT_PARTITION__'")
      .collect())
    assert(eNull.getMessage.contains("null-partition"), eNull.getMessage)
    val out = spark.sql(s"OPTIMIZE $cat.ns.nulls WHERE day = 1").collect()
    assert(out.head.getString(0) == "committed_version")
    assert(spark.sql(s"SELECT sum(v) FROM $cat.ns.nulls").head.getLong(0) == 150L)
    assert(spark.sql(
      s"SELECT count(*) FROM $cat.ns.nulls WHERE day IS NULL")
      .head.getLong(0) == 2L)
    // two CASED spellings of one partition column refuse (the parser's
    // duplicate check is case-sensitive; resolution is not)
    val eDup = intercept[IllegalArgumentException](spark.sql(
      s"OPTIMIZE $cat.ns.nulls WHERE Day = '1' AND day = '2'").collect())
    assert(eDup.getMessage.contains("repeated equality"), eDup.getMessage)
    // FOREIGN layout: partition columns declared in metaData but files
    // NOT hive-laid-out — a scoped rewrite would duplicate their rows
    // (never file-selected, still row-selected), so it refuses by name
    val fdir = freshDir() + "/foreign"
    DeltaLogWriter.write(Seq((1, 10L), (2, 20L)).toDF("day", "v")
      .coalesce(1), fdir)
    val commit = java.nio.file.Paths.get(fdir, "_delta_log",
      "00000000000000000000.json")
    val doctored = new String(java.nio.file.Files.readAllBytes(commit), "UTF-8")
      .replace("\"partitionColumns\":[]", "\"partitionColumns\":[\"day\"]")
    java.nio.file.Files.write(commit, doctored.getBytes("UTF-8"))
    // the local FS wrote a checksum sidecar for the original bytes
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(fdir,
      "_delta_log", ".00000000000000000000.json.crc"))
    reg.register("ns.foreign", fdir)
    val eForeign = intercept[IllegalArgumentException](spark.sql(
      s"OPTIMIZE $cat.ns.foreign WHERE day = 1").collect())
    assert(eForeign.getMessage.contains("hive segments"), eForeign.getMessage)
    // Iceberg: a DATE-typed identity partition scopes by its ISO
    // spelling — the literal a SQL user types
    val iceD = freshDir() + "/icedate"
    val dfD = Seq(("2024-01-01", 1L), ("2024-01-02", 2L), ("2024-01-01", 3L),
      ("2024-01-02", 4L)).toDF("ds", "v")
      .select(to_date($"ds").as("day"), $"v")
    IcebergWriter.commitAppend(spark, iceD, dfD.repartition(2), 955L, 1000L,
      partitionBy = Seq("day"))
    IcebergWriter.commitAppend(spark, iceD, dfD.repartition(2), 956L, 2000L,
      partitionBy = Seq("day"))
    reg.register("ns.icedate", iceD)
    val outD = spark.sql(
      s"OPTIMIZE $cat.ns.icedate WHERE day = '2024-01-01'").collect()
    assert(outD.head.getString(0) == "metadata_version")
    assert(spark.sql(s"SELECT sum(v) FROM $cat.ns.icedate").head.getLong(0) == 20L)
    assert(spark.sql(
      s"SELECT sum(v) FROM $cat.ns.icedate WHERE day = DATE'2024-01-01'")
      .head.getLong(0) == 8L)
    // a garbage date literal refuses NAMING the accepted spellings
    val eDate = intercept[IllegalArgumentException](spark.sql(
      s"OPTIMIZE $cat.ns.icedate WHERE day = 'yesterday'").collect())
    assert(eDate.getMessage.contains("ISO date"), eDate.getMessage)
    // Iceberg full-compact sortBy resolves case-insensitively, like the
    // scoped lane and Spark itself
    val iFlat2 = freshDir() + "/icecase"
    IcebergWriter.commitAppend(spark, iFlat2, tiles.coalesce(2), 957L, 1000L)
    reg.register("ns.icecase", iFlat2)
    val outCase = spark.sql(
      s"OPTIMIZE $cat.ns.icecase ZORDER BY (USER, H3)").collect()
    assert(outCase.head.getString(0) == "metadata_version")
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.icecase")
      .head.getLong(0) == 400L)
  }

  test("OPTIMIZE WHERE ranges on both formats; hidden-transform scopes map through IcebergTransforms") {
    val (cat, reg) = freshCatalog()
    // Delta: a RANGE conjunction compacts days 1..2, leaves 0 and 3 with
    // every file byte-identical
    val d = freshDir() + "/ev"
    val df = (0 until 320).map(k => (k % 4, k.toLong, f"u${k % 7}"))
      .toDF("day", "v", "u")
    DeltaLogWriter.write(df.repartition(4), d, partitionBy = Seq("day"))
    reg.register("ns.ev", d)
    val before = DeltaLogReader.activeFiles(spark, d)
    def inRange(p: String) = p.contains("day=1") || p.contains("day=2")
    val untouched = before.filterNot(inRange).toSet
    assert(before.count(inRange) >= 8, before.mkString(", "))
    val out = spark.sql(
      s"OPTIMIZE $cat.ns.ev WHERE day >= 1 AND day < 3 ZORDER BY (u, v)")
      .collect()
    assert(out.head.getString(0) == "committed_version")
    val after = DeltaLogReader.activeFiles(spark, d)
    assert(after.count(_.contains("day=1")) == 1, after.mkString(", "))
    assert(after.count(_.contains("day=2")) == 1, after.mkString(", "))
    assert(after.filterNot(inRange).toSet == untouched)
    assert(spark.sql(s"SELECT sum(v) FROM $cat.ns.ev").head.getLong(0) ==
      (0L until 320L).sum)
    // Iceberg: identity range scope compacts days 1..2; day 0 carried
    val i = freshDir() + "/ice"
    val iceDf = (0 until 120).map(k => (k.toLong, (k % 3).toLong))
      .toDF("v", "day")
    IcebergWriter.commitAppend(spark, i, iceDf.coalesce(2), 971L, 1000L,
      partitionBy = Seq("day"))
    IcebergWriter.commitAppend(spark, i, iceDf.coalesce(2), 972L, 2000L)
    reg.register("ns.ice", i)
    val outIce = spark.sql(
      s"OPTIMIZE $cat.ns.ice WHERE day >= '1' AND day <= '2'").collect()
    assert(outIce.head.getString(0) == "metadata_version")
    assert(spark.sql(s"SELECT sum(v) FROM $cat.ns.ice").head.getLong(0) ==
      2L * (0L until 120L).sum)
    // day=0 still prunes to its ORIGINAL (carried) files
    val day0 = Iceberg.planFiles(spark, i, Seq(Iceberg.ColRange("day", 0L, 0L)))
    assert(day0.nonEmpty && day0.forall(!_.contains("compact")), day0.mkString(", "))
    val dayHit = Iceberg.planFiles(spark, i, Seq(Iceberg.ColRange("day", 1L, 1L)))
    assert(dayHit.exists(_.contains("compact")), dayHit.mkString(", "))
    // Iceberg: date-typed identity RANGE with ISO literals
    val iceD = freshDir() + "/icedr"
    val dfD = Seq(("2024-01-01", 1L), ("2024-01-02", 2L), ("2024-01-03", 4L))
      .toDF("ds", "v").select(to_date($"ds").as("day"), $"v")
    IcebergWriter.commitAppend(spark, iceD, dfD.repartition(2), 973L, 1000L,
      partitionBy = Seq("day"))
    IcebergWriter.commitAppend(spark, iceD, dfD.repartition(2), 974L, 2000L,
      partitionBy = Seq("day"))
    reg.register("ns.icedr", iceD)
    val outDr = spark.sql(s"OPTIMIZE $cat.ns.icedr WHERE " +
      "day >= '2024-01-01' AND day < '2024-01-03'").collect()
    assert(outDr.head.getString(0) == "metadata_version")
    assert(spark.sql(s"SELECT sum(v) FROM $cat.ns.icedr").head.getLong(0) == 14L)
    assert(spark.sql(s"SELECT sum(v) FROM $cat.ns.icedr " +
      "WHERE day = DATE'2024-01-02'").head.getLong(0) == 4L)
    // Iceberg: HIDDEN-TRANSFORM scope — `ets_day = <ISO>` on a day(ets)
    // table maps through the same transform the writer fanned files with
    val iceT = freshDir() + "/icet"
    val us0 = 86400000000L // 1970-01-02T00:00Z
    val dfT = Seq((1L, us0), (2L, us0 + 3600000000L), (3L, us0 + 2 * 86400000000L))
      .toDF("id", "us").selectExpr("id", "timestamp_micros(us) AS ets")
    IcebergWriter.commitAppend(spark, iceT, dfT.coalesce(1), 975L, 1000L,
      partitionBy = Seq("day(ets)"))
    IcebergWriter.commitAppend(spark, iceT, dfT.coalesce(1), 976L, 2000L,
      partitionBy = Seq("day(ets)"))
    reg.register("ns.icet", iceT)
    val outT = spark.sql(
      s"OPTIMIZE $cat.ns.icet WHERE ets_day = '1970-01-02'").collect()
    assert(outT.head.getString(0) == "metadata_version")
    // both days' rows intact; the scoped day compacted 2 files → 1
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.icet").head.getLong(0) == 6L)
    val planT = Iceberg.planFiles(spark, iceT)
    assert(planT.count(_.contains("compact")) == 1, planT.mkString(", "))
    assert(spark.sql(s"SELECT sum(id) FROM $cat.ns.icet " +
      "WHERE ets < TIMESTAMP'1970-01-03 00:00:00Z'").head.getLong(0) == 6L)
  }

  test("ZORDER BY with an unknown column refuses by name") {
    val (cat, reg) = freshCatalog()
    val d = freshDir() + "/t"
    DeltaLogWriter.write(tiles.coalesce(1), d)
    reg.register("ns.t", d)
    val e = intercept[IllegalArgumentException](
      spark.sql(s"OPTIMIZE $cat.ns.t ZORDER BY (user, nope)").collect())
    assert(e.getMessage.contains("'nope'"), e.getMessage)
  }

  test("rank ordinals: h3 point predicate prunes on common-prefix REAL H3 ids") {
    val (cat, reg) = freshCatalog()
    val d = freshDir() + "/tiles"
    // real H3 ids from geo_to_h3 over ONE bbox — every id shares the
    // metro-scale prefix (the exact workload shape of the reference's
    // OPTIMIZE tiles ZORDER BY (user, h3), 01_geofraud_clustering.py:440,
    // on which any fixed-width byte-prefix ordinal degenerates to a
    // constant and the h3 dimension of the Morton key carries zero bits)
    val pts = for { i <- 0 until 40; j <- 0 until 25 } yield
      (f"user${(i + j) % 20}%03d",
        graft.geo.H3.geoToH3String(37.70 + i * 0.002, -122.50 + j * 0.004, 9),
        (i * 25 + j).toLong)
    assert(pts.map(_._2).forall(_.startsWith("8928")), "one-bbox fixture")
    assert(pts.map(_._2).distinct.size > 400, "fixture must carry many ids")
    DeltaLogWriter.write(pts.toDF("user", "h3", "hits").repartition(4), d)
    reg.register("geoscan.tiles", d)
    val g = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[GraftCatalog]
    // small target → several output files, so per-file stats are testable
    g.optimizeZOrder(spark, "geoscan.tiles", Seq("user", "h3"),
      targetFileBytes = 2000)
    val files = DeltaLogReader.activeFiles(spark, d)
    assert(files.size >= 4, s"want >=4 files, got ${files.size}")
    def resolve(f: String): String =
      if (f.startsWith("/")) f else s"$d/$f"
    def ranges(c: String): Seq[(String, String)] = files.map { f =>
      val r = spark.read.parquet(resolve(f)).agg(min(col(c)), max(col(c))).head
      (r.getString(0), r.getString(1))
    }.toSeq
    def hit(rs: Seq[(String, String)], v: String) =
      rs.count { case (mn, mx) => mn <= v && v <= mx }
    // a POINT predicate on either dimension must rule out at least one
    // file — on h3 this is exactly what the byte-prefix ordinal could not
    val probeH3 = pts(pts.length / 2)._2
    assert(hit(ranges("h3"), probeH3) < files.size,
      s"h3 point predicate must prune (probe $probeH3)")
    assert(hit(ranges("user"), "user007") < files.size,
      "user point predicate must prune")
    // content invariant under the rewrite
    assert(spark.sql(s"SELECT sum(hits) FROM $cat.geoscan.tiles")
      .head.getLong(0) == pts.map(_._3).sum)
  }

  test("2-col Morton clustering prunes in BOTH dimensions (the z-order property)") {
    val (cat, reg) = freshCatalog()
    val d = freshDir() + "/grid"
    // 32x32 numeric grid, interleaved write order (worst case for stats)
    val grid = (0 until 1024).map(k => (k % 32, (k * 7) % 32, k.toLong))
      .toDF("i", "j", "v")
    DeltaLogWriter.write(grid.repartition(4), d)
    reg.register("ns.grid", d)
    val g = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[GraftCatalog]
    // small target → several output files, so per-file stats are testable
    val out = g.optimizeZOrder(spark, "ns.grid", Seq("i", "j"),
      targetFileBytes = 1500)
    assert(out.head._1 == "committed_version")
    val files = DeltaLogReader.activeFiles(spark, d)
    assert(files.size >= 4, s"want >=4 files, got ${files.size}")
    // per-file (min,max) on each dimension — a box predicate on EITHER
    // column alone must rule out at least one file (lexicographic sort on
    // i would leave j ranges spanning the full domain in every file)
    // log entries may carry table-relative or absolute paths
    def resolve(f: String): String =
      if (f.startsWith("/")) f else s"$d/$f"
    def ranges(c: String) = files.map { f =>
      val r = spark.read.parquet(resolve(f))
        .agg(min(col(c)), max(col(c))).head
      (r.getInt(0), r.getInt(1))
    }
    def hit(rs: Seq[(Int, Int)], lo: Int, hi: Int) =
      rs.count { case (mn, mx) => mx >= lo && mn <= hi }
    assert(hit(ranges("i"), 0, 7) < files.size, "i-box must prune")
    assert(hit(ranges("j"), 0, 7) < files.size, "j-box must prune")
  }

  test("3-col Morton clustering prunes in ALL THREE dimensions (trailing column included)") {
    val (cat, reg) = freshCatalog()
    val d = freshDir() + "/cube"
    // 16^3 cube, scrambled write order; under a lexicographic (i, j, k)
    // sort the TRAILING k would span the full domain in every file
    val cube = (0 until 4096).map { n =>
      val m = (n * 2654435761L % 4096).toInt
      (m % 16, (m / 16) % 16, m / 256, n.toLong)
    }.toDF("i", "j", "k", "v")
    DeltaLogWriter.write(cube.repartition(4), d)
    reg.register("ns.cube", d)
    val g = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[GraftCatalog]
    val out = g.optimizeZOrder(spark, "ns.cube", Seq("i", "j", "k"),
      targetFileBytes = 3000)
    assert(out.head._1 == "committed_version")
    val files = DeltaLogReader.activeFiles(spark, d)
    assert(files.size >= 8, s"want >=8 files, got ${files.size}")
    def resolve(f: String): String =
      if (f.startsWith("/")) f else s"$d/$f"
    def ranges(c: String) = files.map { f =>
      val r = spark.read.parquet(resolve(f))
        .agg(min(col(c)), max(col(c))).head
      (r.getInt(0), r.getInt(1))
    }
    def hit(rs: Seq[(Int, Int)], lo: Int, hi: Int) =
      rs.count { case (mn, mx) => mx >= lo && mn <= hi }
    assert(hit(ranges("i"), 0, 3) < files.size, "i-box must prune")
    assert(hit(ranges("j"), 0, 3) < files.size, "j-box must prune")
    assert(hit(ranges("k"), 0, 3) < files.size, "k-box (TRAILING) must prune")
    // content invariant
    assert(spark.sql(s"SELECT sum(v) FROM $cat.ns.cube").head.getLong(0) ==
      (0L until 4096L).sum)
    // the SQL statement spelling drives the same lane
    val out2 = spark.sql(s"OPTIMIZE $cat.ns.cube ZORDER BY (i, j, k)").collect()
    assert(out2.head.getString(0) == "committed_version")
  }
}
