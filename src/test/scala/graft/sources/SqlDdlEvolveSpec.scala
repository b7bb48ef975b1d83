package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** SQL schema evolution + INSERT OVERWRITE through the V2 catalog:
  * `ALTER TABLE ADD/RENAME/DROP COLUMN`, `SET TBLPROPERTIES` (the Delta
  * column-mapping upgrade path), `ALTER TABLE ... RENAME TO` on a
  * mutable registry, and `INSERT OVERWRITE` landing as the formats' own
  * overwrite commits — old-generation files served under new names with
  * ZERO data rewritten. */
class SqlDdlEvolveSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("sqlddl").toString

  private def freshCatalog(): (String, FileRegistryCatalog) = {
    val name = "ddl" + java.util.UUID.randomUUID().toString.take(8)
    val reg = freshDir() + "/registry.json"
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.registry", reg)
    (name, new FileRegistryCatalog(spark, reg))
  }

  test("ALTER TABLE ADD COLUMN on Delta: old files null-fill, new inserts carry values") {
    val (cat, reg) = freshCatalog()
    val d = freshDir() + "/d"
    DeltaLogWriter.write(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "amount").coalesce(1), d)
    reg.register("ns.t", d)
    spark.sql(s"ALTER TABLE $cat.ns.t ADD COLUMN note STRING")
    val afterAdd = spark.sql(s"SELECT id, note FROM $cat.ns.t")
      .as[(Long, Option[String])].collect().toMap
    assert(afterAdd == Map(1L -> None, 2L -> None), "old generation null-fills")
    spark.sql(s"INSERT INTO $cat.ns.t VALUES (3, 30.0, 'fresh')")
    val all = spark.sql(s"SELECT id, note FROM $cat.ns.t")
      .as[(Long, Option[String])].collect().toMap
    assert(all == Map(1L -> None, 2L -> None, 3L -> Some("fresh")))
    // filters on the new column prune correctly across generations
    assert(spark.sql(s"SELECT id FROM $cat.ns.t WHERE note = 'fresh'")
      .as[Long].collect().toSeq == Seq(3L))
  }

  test("ALTER TABLE ADD + RENAME + DROP COLUMN on Iceberg: id-keyed, zero rewrite") {
    val (cat, reg) = freshCatalog()
    val i = freshDir() + "/i"
    IcebergWriter.commitAppend(spark, i,
      Seq((1L, 10.0), (2L, 20.0)).toDF("id", "amount").coalesce(1), 31L, 1000L)
    reg.register("ns.t", i)
    val filesBefore = new java.io.File(i, "data").listFiles().count(_.getName.endsWith(".parquet"))
    spark.sql(s"ALTER TABLE $cat.ns.t ADD COLUMN tag STRING")
    spark.sql(s"ALTER TABLE $cat.ns.t RENAME COLUMN amount TO value_usd")
    val out = spark.sql(s"SELECT id, value_usd, tag FROM $cat.ns.t")
      .as[(Long, Double, Option[String])].collect().toSet
    assert(out == Set((1L, 10.0, None), (2L, 20.0, None)),
      "old files serve under the NEW name, added column null-fills")
    spark.sql(s"ALTER TABLE $cat.ns.t DROP COLUMN tag")
    assert(spark.sql(s"SELECT * FROM $cat.ns.t").columns.toSeq ==
      Seq("id", "value_usd"))
    val filesAfter = new java.io.File(i, "data").listFiles().count(_.getName.endsWith(".parquet"))
    assert(filesAfter == filesBefore, "schema evolution rewrites NO data file")
  }

  test("Delta RENAME COLUMN via the SQL mapping upgrade: SET TBLPROPERTIES then RENAME") {
    val (cat, reg) = freshCatalog()
    val d = freshDir() + "/d"
    DeltaLogWriter.write(Seq((1L, "a")).toDF("id", "k").coalesce(1), d)
    reg.register("ns.t", d)
    // rename without mapping refuses with the remedy named (the writer's
    // IllegalArgumentException may arrive wrapped by Spark's alter path)
    val e = intercept[Exception](
      spark.sql(s"ALTER TABLE $cat.ns.t RENAME COLUMN k TO kind"))
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("enableColumnMapping")), messages(e))
    spark.sql(s"ALTER TABLE $cat.ns.t SET TBLPROPERTIES " +
      "('delta.columnMapping.mode' = 'name')")
    spark.sql(s"ALTER TABLE $cat.ns.t RENAME COLUMN k TO kind")
    assert(spark.sql(s"SELECT id, kind FROM $cat.ns.t")
      .as[(Long, String)].collect().toSeq == Seq((1L, "a")),
      "the old file serves under the new logical name")
    // the day-after-the-rename INSERT: rows land through write()'s
    // physical-name projection, both generations serve the new name
    spark.sql(s"INSERT INTO $cat.ns.t VALUES (2, 'b')")
    assert(spark.sql(s"SELECT id, kind FROM $cat.ns.t")
      .as[(Long, String)].collect().toSet == Set((1L, "a"), (2L, "b")))
  }

  test("SQL time travel reads a FORMAT-VERSION-3 table (VERSION and TIMESTAMP AS OF)") {
    val (cat, reg) = freshCatalog()
    val t = freshDir() + "/v3"
    IcebergWriter.createTableV3(spark, t, Seq((1L, 1.0)).toDF("id", "x").schema)
    IcebergWriter.commitAppendV3(spark, t,
      Seq((1L, 1.0), (2L, 2.0)).toDF("id", "x").coalesce(1), 901L, 1000L)
    IcebergWriter.deleteWhereV3(spark, t, col("id") === 1L, 902L, 2000L)
    reg.register("ns.v3", t)
    assert(spark.sql(s"SELECT id FROM $cat.ns.v3").as[Long].collect().toSet == Set(2L))
    assert(spark.sql(s"SELECT id FROM $cat.ns.v3 VERSION AS OF 901")
      .as[Long].collect().toSet == Set(1L, 2L), "pre-DV snapshot by id")
    assert(spark.sql(
      s"SELECT id FROM $cat.ns.v3 TIMESTAMP AS OF '1970-01-01 00:00:01.5'")
      .as[Long].collect().toSet == Set(1L, 2L), "pre-DV snapshot by timestamp")
  }

  test("INSERT OVERWRITE on Delta: one Overwrite commit, time travel keeps the old generation") {
    val (cat, reg) = freshCatalog()
    val d = freshDir() + "/d"
    DeltaLogWriter.write(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "amount").coalesce(1), d)
    reg.register("ns.t", d)
    val v0 = DeltaLogReader.latestVersion(spark, d).get
    spark.sql(s"INSERT OVERWRITE $cat.ns.t VALUES (9, 90.0)")
    assert(spark.sql(s"SELECT id, amount FROM $cat.ns.t")
      .as[(Long, Double)].collect().toSeq == Seq((9L, 90.0)))
    assert(DeltaLogReader.latestVersion(spark, d).get == v0 + 1,
      "INSERT OVERWRITE must land as ONE commit")
    assert(spark.sql(s"SELECT id FROM $cat.ns.t VERSION AS OF $v0")
      .as[Long].collect().toSet == Set(1L, 2L))
  }

  test("INSERT OVERWRITE on Iceberg: a REPLACE snapshot, prior snapshot travels") {
    val (cat, reg) = freshCatalog()
    val i = freshDir() + "/i"
    IcebergWriter.commitAppend(spark, i,
      Seq((1L, 10.0), (2L, 20.0)).toDF("id", "amount").coalesce(1), 41L, 1000L)
    reg.register("ns.t", i)
    spark.sql(s"INSERT OVERWRITE $cat.ns.t SELECT id * 10, amount FROM $cat.ns.t")
    assert(spark.sql(s"SELECT id FROM $cat.ns.t").as[Long].collect().toSet ==
      Set(10L, 20L))
    assert(Iceberg.metadata(spark, i).path("snapshots").size() == 2,
      "overwrite is ONE snapshot")
    assert(spark.sql(s"SELECT id FROM $cat.ns.t VERSION AS OF 41")
      .as[Long].collect().toSet == Set(1L, 2L))
    // a MoR table (upsert history) overwrites too — deletes drop with the
    // replaced generation
    IcebergWriter.upsert(spark, i,
      Seq((10L, 1.0), (77L, 7.0)).toDF("id", "amount").coalesce(1),
      Seq("id"), 42L, System.currentTimeMillis())
    spark.sql(s"INSERT OVERWRITE $cat.ns.t VALUES (5, 5.0)")
    assert(spark.sql(s"SELECT id, amount FROM $cat.ns.t")
      .as[(Long, Double)].collect().toSeq == Seq((5L, 5.0)))
  }

  test("ALTER TABLE ... RENAME TO rebinds the registry name; data never moves") {
    val (cat, reg) = freshCatalog()
    val d = freshDir() + "/d"
    DeltaLogWriter.write(Seq(7L).toDF("id").coalesce(1), d)
    reg.register("ns.old", d)
    spark.sql(s"ALTER TABLE $cat.ns.old RENAME TO ns.fresh")
    assert(spark.sql(s"SELECT id FROM $cat.ns.fresh").as[Long].collect().toSeq == Seq(7L))
    intercept[Exception](spark.sql(s"SELECT id FROM $cat.ns.old").collect())
  }

  test("refusals: nested/positioned/NOT NULL adds, Delta DROP COLUMN, unknown change kinds") {
    val (cat, reg) = freshCatalog()
    val d = freshDir() + "/d"
    DeltaLogWriter.write(Seq((1L, "a")).toDF("id", "k").coalesce(1), d)
    reg.register("ns.t", d)
    val e1 = intercept[UnsupportedOperationException](
      spark.sql(s"ALTER TABLE $cat.ns.t ADD COLUMN x STRING FIRST"))
    assert(e1.getMessage.contains("FIRST"), e1.getMessage)
    val e2 = intercept[UnsupportedOperationException](
      spark.sql(s"ALTER TABLE $cat.ns.t DROP COLUMN k"))
    assert(e2.getMessage.contains("Delta"), e2.getMessage)
  }
}
