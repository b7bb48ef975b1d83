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

  test("plain OPTIMIZE (no ZORDER) bin-packs; WHERE refuses; non-graft catalog refuses") {
    val (cat, reg) = freshCatalog()
    val d = freshDir() + "/t"
    DeltaLogWriter.write((1L to 40L).toDF("id").repartition(4), d)
    reg.register("ns.t", d)
    val out = spark.sql(s"OPTIMIZE $cat.ns.t").collect()
    assert(out.head.getString(0) == "committed_version" && out.head.getLong(1) == 1L)
    assert(DeltaLogReader.activeFiles(spark, d).size == 1)
    val e = intercept[IllegalArgumentException](
      spark.sql(s"OPTIMIZE $cat.ns.t WHERE id > 3"))
    assert(e.getMessage.contains("ZORDER BY"), e.getMessage)
    val e2 = intercept[UnsupportedOperationException](
      spark.sql("OPTIMIZE spark_catalog.default.nope ZORDER BY (a)"))
    assert(e2.getMessage.contains("not a graft catalog"), e2.getMessage)
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
}
