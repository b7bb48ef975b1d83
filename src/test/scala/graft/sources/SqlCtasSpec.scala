package graft.sources

import graft.SparkSpec

/** SQL statements that COMPOSE out of the existing catalog seams —
  * pinned with value checks so a regression in any seam (createTable,
  * the V1 write, the inspection surface) surfaces here by statement
  * name: CTAS (both formats), CREATE OR REPLACE, SHOW CREATE TABLE,
  * INSERT with a column list (missing nullable columns null-fill). */
class SqlCtasSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("ctas").toString

  private def freshCatalog(): (String, FileRegistryCatalog) = {
    val name = "ct" + java.util.UUID.randomUUID().toString.take(8)
    val reg = freshDir() + "/registry.json"
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.registry", reg)
    (name, new FileRegistryCatalog(spark, reg))
  }

  test("CTAS creates and fills both formats in one statement") {
    val (cat, _) = freshCatalog()
    val base = freshDir()
    spark.sql(s"CREATE TABLE $cat.ns.d USING delta LOCATION '$base/d' AS " +
      "SELECT * FROM VALUES (1L, 'a'), (2L, 'b') AS t(id, k)")
    assert(spark.sql(s"SELECT id, k FROM $cat.ns.d")
      .as[(Long, String)].collect().toSet == Set((1L, "a"), (2L, "b")))
    // the Delta table really exists at the location: the log created by
    // createTable (v0 empty) + the CTAS query's append (v1)
    assert(DeltaLogReader.versions(spark, s"$base/d") == Seq(0L, 1L))
    spark.sql(s"CREATE TABLE $cat.ns.i USING iceberg LOCATION '$base/i' AS " +
      "SELECT * FROM VALUES (10L) AS t(id)")
    assert(spark.sql(s"SELECT id FROM $cat.ns.i").as[Long].collect().toSeq == Seq(10L))
  }

  test("CREATE OR REPLACE rebinds the name to a fresh table; the old data stays for path readers") {
    val (cat, _) = freshCatalog()
    val base = freshDir()
    spark.sql(s"CREATE TABLE $cat.ns.t USING delta LOCATION '$base/v1' AS " +
      "SELECT 1L AS id")
    spark.sql(s"CREATE OR REPLACE TABLE $cat.ns.t USING delta " +
      s"LOCATION '$base/v2' AS SELECT 2L AS id")
    assert(spark.sql(s"SELECT id FROM $cat.ns.t").as[Long].collect().toSeq == Seq(2L))
    // the catalog drops NAMES, never data — the old generation still
    // reads by path (the dropTable contract)
    assert(DeltaLogReader.read(spark, s"$base/v1").count() == 1L)
  }

  test("SHOW CREATE TABLE renders the schema, partitioning and location") {
    val (cat, reg) = freshCatalog()
    val d = freshDir() + "/d"
    DeltaLogWriter.write(
      Seq((1L, "us", 1.0)).toDF("id", "region", "amount"), d,
      partitionBy = Seq("region"))
    reg.register("ns.t", d)
    val ddl = spark.sql(s"SHOW CREATE TABLE $cat.ns.t").collect().head.getString(0)
    assert(ddl.contains("id BIGINT") && ddl.contains("amount DOUBLE"), ddl)
    assert(ddl.contains("PARTITIONED BY (region)"), ddl)
    assert(ddl.contains(d), ddl)
  }

  test("INSERT INTO with a column list null-fills the omitted nullable columns") {
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.ns.t (id BIGINT, note STRING) USING delta " +
      s"LOCATION '${freshDir()}/t'")
    spark.sql(s"INSERT INTO $cat.ns.t (id) VALUES (7)")
    val rows = spark.sql(s"SELECT id, note FROM $cat.ns.t")
      .as[(Long, Option[String])].collect().toSeq
    assert(rows == Seq((7L, None)))
  }
}
