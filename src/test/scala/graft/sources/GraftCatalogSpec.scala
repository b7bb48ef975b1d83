package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** The Spark V2 catalog plugin: `spark.sql` / `spark.read.table` over
  * the repo's own Delta and Iceberg tables by NAME, row-identical to the
  * path reads, with pushdown intact, time travel through the SQL
  * `VERSION AS OF` syntax, and loud refusals for everything the read
  * seam does not do. Catalog names are per-test (the session caches a
  * catalog instance per name, so a name must never rebind options). */
class GraftCatalogSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("gcat").toString

  /** Register a fresh catalog name over a fresh registry document. */
  private def freshCatalog(): (String, FileRegistryCatalog) = {
    val name = "gc" + java.util.UUID.randomUUID().toString.take(8)
    val reg = freshDir() + "/registry.json"
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.registry", reg)
    (name, new FileRegistryCatalog(spark, reg))
  }

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").collect().map(_.getLong(0)).toSet

  test("spark.sql reads Delta AND Iceberg tables by name, row-identical to the path reads") {
    val (cat, reg) = freshCatalog()
    val delta = freshDir() + "/d"
    DeltaLogWriter.write(Seq((1L, "a"), (2L, "b")).toDF("id", "k").coalesce(1), delta)
    DeltaLogWriter.deleteWhere(spark, delta, col("id") === 2L) // a DV ride-along
    val ice = freshDir() + "/i"
    IcebergWriter.commitAppend(spark,
      ice, Seq((10L, "x"), (20L, "y")).toDF("id", "k").coalesce(1), 501L, 1000L)
    reg.register("ns.dtbl", delta)
    reg.register("ns.itbl", ice)
    assert(ids(spark.sql(s"SELECT id FROM $cat.ns.dtbl")) ==
      ids(DeltaLogReader.read(spark, delta)))
    assert(ids(spark.sql(s"SELECT id FROM $cat.ns.itbl")) ==
      ids(Iceberg.read(spark, ice)))
    // spark.read.table — the reference's own consumption spelling
    assert(ids(spark.read.table(s"$cat.ns.itbl")) == Set(10L, 20L))
    // a JOIN across the two formats through one catalog
    val joined = spark.sql(
      s"SELECT d.id AS did, i.id AS iid FROM $cat.ns.dtbl d " +
        s"JOIN $cat.ns.itbl i ON i.k = 'x'")
    assert(joined.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 10L)))
  }

  test("VERSION AS OF and TIMESTAMP AS OF pin versions through the SQL syntax") {
    val (cat, reg) = freshCatalog()
    val delta = freshDir() + "/d"
    DeltaLogWriter.write(Seq(1L).toDF("id").coalesce(1), delta)        // v0
    DeltaLogWriter.write(Seq(2L).toDF("id").coalesce(1), delta)        // v1
    reg.register("ns.d", delta)
    assert(ids(spark.sql(s"SELECT id FROM $cat.ns.d VERSION AS OF 0")) == Set(1L))
    assert(ids(spark.sql(s"SELECT id FROM $cat.ns.d")) == Set(1L, 2L))
    val ice = freshDir() + "/i"
    IcebergWriter.commitAppend(spark, ice, Seq(10L).toDF("id").coalesce(1), 601L, 1000L)
    IcebergWriter.commitAppend(spark, ice, Seq(20L).toDF("id").coalesce(1), 602L, 2000L)
    reg.register("ns.i", ice)
    assert(ids(spark.sql(s"SELECT id FROM $cat.ns.i VERSION AS OF 601")) == Set(10L))
    // Iceberg timestamp travel uses the snapshots' own commit clocks
    // (fixture timestamps 1000/2000 ms; session TZ is UTC)
    assert(ids(spark.sql(
      s"SELECT id FROM $cat.ns.i TIMESTAMP AS OF '1970-01-01 00:00:01.5'")) ==
      Set(10L))
  }

  test("pushdown survives the substitution: filters reach the parquet scan") {
    val (cat, reg) = freshCatalog()
    val delta = freshDir() + "/d"
    DeltaLogWriter.write((1L to 100L).toDF("id").coalesce(1), delta)
    reg.register("ns.big", delta)
    val q = spark.sql(s"SELECT id FROM $cat.ns.big WHERE id > 90")
    assert(ids(q) == (91L to 100L).toSet)
    val physical = q.queryExecution.executedPlan.toString()
    assert(physical.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,90)]"),
      physical)
    // and no DSv2 relation survived the substitution
    assert(!q.queryExecution.optimizedPlan.toString().contains("GraftSqlTable"))
  }

  test("a self-join of one catalog table never aliases attributes across sides") {
    val (cat, reg) = freshCatalog()
    val delta = freshDir() + "/d"
    DeltaLogWriter.write(Seq((1L, 2L), (2L, 3L)).toDF("id", "next").coalesce(1), delta)
    reg.register("ns.edges", delta)
    val hops = spark.sql(
      s"SELECT a.id AS src, b.next AS dst FROM $cat.ns.edges a " +
        s"JOIN $cat.ns.edges b ON a.next = b.id")
    assert(hops.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 3L)))
  }

  test("warehouse-convention catalog resolves ns/tbl directories") {
    val name = "gw" + java.util.UUID.randomUUID().toString.take(8)
    val wh = freshDir()
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    DeltaLogWriter.write(Seq(7L).toDF("id").coalesce(1), s"$wh/ns/t1")
    assert(ids(spark.sql(s"SELECT id FROM $name.ns.t1")) == Set(7L))
  }

  test("INSERT INTO appends through the format writers; targets stay intact under substitution") {
    val (cat, reg) = freshCatalog()
    val delta = freshDir() + "/d"
    DeltaLogWriter.write(Seq((1L, "a")).toDF("id", "k").coalesce(1), delta)
    val ice = freshDir() + "/i"
    IcebergWriter.commitAppend(spark, ice,
      Seq((10L, "x")).toDF("id", "k").coalesce(1), 701L, 1000L)
    reg.register("ns.d", delta)
    reg.register("ns.i", ice)
    // plain INSERT INTO both formats — values and a SELECT reading the
    // OTHER catalog table (the query side substitutes, the target not)
    spark.sql(s"INSERT INTO $cat.ns.d VALUES (2, 'b')")
    spark.sql(s"INSERT INTO $cat.ns.i SELECT id + 10, k FROM $cat.ns.d WHERE id = 2")
    assert(ids(spark.sql(s"SELECT id FROM $cat.ns.d")) == Set(1L, 2L))
    assert(ids(spark.sql(s"SELECT id FROM $cat.ns.i")) == Set(10L, 12L))
    // the POISON direction: an Iceberg-sourced frame carries
    // parquet.field.id metadata that an optimizer rewrite can resurface
    // past the analyzed schema — the Delta publish strips it
    // unconditionally, or this table becomes a mixed id/id-less file set
    // whose footer-schema reads fail under the session field-id switch
    spark.sql(s"INSERT INTO $cat.ns.d SELECT id, k FROM $cat.ns.i WHERE id = 10")
    assert(ids(spark.sql(s"SELECT id FROM $cat.ns.d")) == Set(1L, 2L, 10L))
    val newest = new java.io.File(delta).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .maxBy(_.lastModified())
    assert(spark.read.parquet(newest.getAbsolutePath).schema.fields
      .forall(!_.metadata.contains("parquet.field.id")),
      "Delta parquet must not carry foreign field ids")
    // the appends went through the real writers: one Delta commit per
    // insert, one new Iceberg snapshot
    assert(DeltaLogReader.versions(spark, delta) == Seq(0L, 1L, 2L))
    assert(Iceberg.snapshots(spark, ice).size == 2)
    // a PARTITIONED Delta table keeps its layout through SQL inserts
    val part = freshDir() + "/p"
    DeltaLogWriter.write(Seq((1L, "a")).toDF("id", "k"), part, partitionBy = Seq("k"))
    reg.register("ns.p", part)
    spark.sql(s"INSERT INTO $cat.ns.p VALUES (2, 'b')")
    assert(spark.sql(s"SELECT id, k FROM $cat.ns.p").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((1L, "a"), (2L, "b")))
    assert(DeltaLogReader.activeFiles(spark, part).exists(_.contains("k=b")))
    // INSERT OVERWRITE replaces the whole generation (one Overwrite
    // commit — SqlDdlEvolveSpec pins the full semantics)
    spark.sql(s"INSERT OVERWRITE $cat.ns.d VALUES (9, 'z')")
    assert(ids(spark.sql(s"SELECT id FROM $cat.ns.d")) == Set(9L))
  }

  test("DELETE FROM ... WHERE runs the format writers' row-level deletes; untranslatable predicates refuse") {
    val (cat, reg) = freshCatalog()
    val delta = freshDir() + "/d"
    DeltaLogWriter.write((1L to 10L).map(i => (i, s"n$i")).toDF("id", "k")
      .coalesce(1), delta)
    val ice = freshDir() + "/i"
    IcebergWriter.commitAppend(spark, ice,
      (1L to 10L).map(i => (i, s"m$i")).toDF("id", "k").coalesce(1), 801L, 1000L)
    reg.register("ns.d", delta)
    reg.register("ns.i", ice)
    // Delta: a DV commit, no parquet rewritten
    spark.sql(s"DELETE FROM $cat.ns.d WHERE id > 7")
    assert(ids(spark.sql(s"SELECT id FROM $cat.ns.d")) == (1L to 7L).toSet)
    val v1 = scala.io.Source.fromFile(new java.io.File(delta,
      f"_delta_log/${1L}%020d.json")).getLines().mkString
    assert(v1.contains("deletionVector"), v1)
    // Iceberg: a position-delete snapshot
    spark.sql(s"DELETE FROM $cat.ns.i WHERE id <= 2 OR k = 'm9'")
    assert(ids(spark.sql(s"SELECT id FROM $cat.ns.i")) ==
      Set(3L, 4L, 5L, 6L, 7L, 8L, 10L))
    assert(Iceberg.snapshots(spark, ice).size == 2)
    // an untranslatable predicate (modulo) refuses in ANALYSIS — the
    // canDeleteWhere gate; nothing half-deletes
    val e = intercept[org.apache.spark.sql.AnalysisException](
      spark.sql(s"DELETE FROM $cat.ns.d WHERE id % 2 = 0"))
    assert(e.getMessage.toLowerCase.contains("delete"), e.getMessage)
    assert(ids(spark.sql(s"SELECT id FROM $cat.ns.d")) == (1L to 7L).toSet)
    // unconditioned DELETE empties the table (AlwaysTrue translation)
    spark.sql(s"DELETE FROM $cat.ns.d")
    assert(spark.sql(s"SELECT id FROM $cat.ns.d").count() == 0L)
  }

  test("DELETE resolves nested fields and dotted names; empty tables read/delete as 0 rows") {
    val (cat, reg) = freshCatalog()
    // nested struct + a top-level column literally containing a dot:
    // the V1 filter attribute grammar (quoted multipart) must pass
    // through to col() verbatim, or both shapes mis-resolve
    val delta = freshDir() + "/d"
    DeltaLogWriter.write(spark.sql("SELECT * FROM VALUES " +
      "(1L, named_struct('level', 1L), 10L), " +
      "(2L, named_struct('level', 5L), 20L), " +
      "(3L, named_struct('level', 9L), 30L) AS t(id, meta, `a.b`)")
      .coalesce(1), delta)
    reg.register("ns.n", delta)
    spark.sql(s"DELETE FROM $cat.ns.n WHERE meta.level > 3 AND `a.b` >= 20")
    assert(ids(spark.sql(s"SELECT id FROM $cat.ns.n")) == Set(1L))
    // an EMPTY Delta table (metaData, zero add files): SELECT serves the
    // typed empty frame, DELETE is a 0-row no-op — SQL semantics, where
    // the path API's read()/deleteWhere deliberately refuse
    val empty = freshDir() + "/e"
    DeltaLogWriter.write(Seq.empty[(Long, String)].toDF("id", "k"), empty)
    reg.register("ns.e", empty)
    assert(spark.sql(s"SELECT id FROM $cat.ns.e").count() == 0L)
    spark.sql(s"DELETE FROM $cat.ns.e WHERE id > 5")
    assert(spark.sql(s"SELECT * FROM $cat.ns.e").columns.toSeq == Seq("id", "k"))
  }

  test("CREATE TABLE closes the SQL lifecycle: DDL → INSERT → SELECT → DELETE, both formats") {
    // warehouse catalog: the location derives from the ns/tbl convention
    val name = "gc" + java.util.UUID.randomUUID().toString.take(8)
    val wh = freshDir()
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    spark.sql(s"CREATE TABLE $name.ns.d (id BIGINT, k STRING) USING delta PARTITIONED BY (k)")
    // freshly created: SELECT serves the typed empty frame
    assert(spark.sql(s"SELECT * FROM $name.ns.d").count() == 0L)
    spark.sql(s"INSERT INTO $name.ns.d VALUES (1, 'a'), (2, 'b'), (3, 'a')")
    spark.sql(s"DELETE FROM $name.ns.d WHERE k = 'b'")
    assert(spark.sql(s"SELECT id FROM $name.ns.d").collect()
      .map(_.getLong(0)).toSet == Set(1L, 3L))
    // the hive layout landed (identity partitioning carried through DDL)
    assert(new java.io.File(s"$wh/ns/d/k=a").exists())
    // iceberg: created with ZERO snapshots, first INSERT commits snapshot 1
    spark.sql(s"CREATE TABLE $name.ns.i (id BIGINT, k STRING) USING iceberg")
    assert(spark.sql(s"SELECT * FROM $name.ns.i").count() == 0L)
    spark.sql(s"DELETE FROM $name.ns.i WHERE id > 0") // empty: 0-row no-op
    spark.sql(s"INSERT INTO $name.ns.i SELECT id, k FROM $name.ns.d")
    assert(spark.sql(s"SELECT id FROM $name.ns.i").collect()
      .map(_.getLong(0)).toSet == Set(1L, 3L))
    assert(Iceberg.snapshots(spark, s"$wh/ns/i").size == 1)
    // registry catalogs need LOCATION; duplicates and transform
    // partitioning refuse by name
    val (cat2, _) = freshCatalog()
    val e1 = intercept[Exception](
      spark.sql(s"CREATE TABLE $cat2.ns.x (id BIGINT) USING delta"))
    assert(e1.getMessage.contains("LOCATION"), e1.getMessage)
    val loc = freshDir() + "/x"
    spark.sql(s"CREATE TABLE $cat2.ns.x (id BIGINT) USING delta LOCATION '$loc'")
    assert(spark.sql(s"SELECT * FROM $cat2.ns.x").count() == 0L)
    intercept[Exception](
      spark.sql(s"CREATE TABLE $cat2.ns.x (id BIGINT) USING delta LOCATION '$loc'"))
  }

  test("the plan-only scan stub refuses EXECUTION with the extensions remedy named") {
    // the substitution rule removes every read relation in this session;
    // the stub is the failure mode of a session WITHOUT GraftExtensions —
    // pin that executing it (toBatch) names the remedy, so a future
    // change cannot silently make the unsubstituted path executable
    val (cat, reg) = freshCatalog()
    val delta = freshDir() + "/d"
    DeltaLogWriter.write(Seq(1L).toDF("id").coalesce(1), delta)
    reg.register("ns.t", delta)
    val catalog = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[GraftCatalog]
    val tbl = catalog.loadTable(
      org.apache.spark.sql.connector.catalog.Identifier.of(Array("ns"), "t"))
    val scan = tbl.asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsRead]
      .newScanBuilder(new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Collections.emptyMap())).build()
    assert(scan.readSchema().fieldNames.toSeq == Seq("id"))
    val e = intercept[IllegalStateException](scan.toBatch)
    assert(e.getMessage.contains("GraftExtensions"), e.getMessage)
  }

  test("refusals: unknown table, read-only DDL, missing options, SHOW TABLES works") {
    val (cat, reg) = freshCatalog()
    val delta = freshDir() + "/d"
    DeltaLogWriter.write(Seq(1L).toDF("id").coalesce(1), delta)
    reg.register("ns.known", delta)
    val e1 = intercept[org.apache.spark.sql.AnalysisException](
      spark.sql(s"SELECT * FROM $cat.ns.nope").collect())
    assert(e1.getMessage.contains("nope"), e1.getMessage)
    // registry-resolved CREATE without LOCATION refuses with the clause
    // named (creation itself is covered by the lifecycle law)
    val e2 = intercept[Exception](
      spark.sql(s"CREATE TABLE $cat.ns.t2 (id BIGINT)"))
    assert(e2.getMessage.contains("LOCATION"), e2.getMessage)
    // SHOW TABLES lists through the seam
    val shown = spark.sql(s"SHOW TABLES IN $cat.ns").select("tableName")
      .collect().map(_.getString(0)).toSet
    assert(shown == Set("known"), shown)
    // DROP TABLE drops the NAME binding, never the data
    spark.sql(s"DROP TABLE $cat.ns.known")
    assert(intercept[org.apache.spark.sql.AnalysisException](
      spark.sql(s"SELECT * FROM $cat.ns.known").collect())
      .getMessage.contains("known"))
    assert(DeltaLogReader.read(spark, delta).count() == 1L)
    // a catalog name with neither registry nor warehouse refuses
    val bad = "gb" + java.util.UUID.randomUUID().toString.take(8)
    spark.conf.set(s"spark.sql.catalog.$bad", classOf[GraftCatalog].getName)
    val e3 = intercept[Exception](spark.sql(s"SELECT * FROM $bad.ns.x"))
    assert(e3.getMessage.contains("registry") ||
      Option(e3.getCause).exists(_.getMessage.contains("registry")), e3.getMessage)
  }
}
