package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** The `CALL`-style maintenance surface: OPTIMIZE / VACUUM /
  * EXPIRE_SNAPSHOTS / REWRITE_MANIFESTS by SQL name through the
  * ProcedureCatalog seam, each routed to the format writers' own
  * maintenance passes and answering with a (metric, value) row. */
class SqlCallSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("call").toString

  private def freshCatalog(): (String, FileRegistryCatalog) = {
    val name = "cp" + java.util.UUID.randomUUID().toString.take(8)
    val reg = freshDir() + "/registry.json"
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.registry", reg)
    (name, new FileRegistryCatalog(spark, reg))
  }

  test("CALL optimize bin-packs a Delta table and purges its DVs; result row carries the version") {
    val (cat, reg) = freshCatalog()
    val d = freshDir() + "/d"
    DeltaLogWriter.write((1L to 50L).toDF("id").repartition(4), d)   // v0, 4 parts
    DeltaLogWriter.deleteWhere(spark, d, col("id") <= 10L)           // v1, DVs
    reg.register("ns.t", d)
    val out = spark.sql(s"CALL $cat.system.optimize('ns.t')").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("committed_version", 2L)), out.toSeq.toString)
    assert(spark.sql(s"SELECT id FROM $cat.ns.t").count() == 40L)
    // DVs purged: active files carry no deletion vectors anymore
    assert(DeltaLogReader.activeFiles(spark, d).nonEmpty)
  }

  test("CALL optimize compacts an Iceberg MoR table (deletes folded away)") {
    val (cat, reg) = freshCatalog()
    val i = freshDir() + "/i"
    IcebergWriter.commitAppend(spark, i, (1L to 20L).toDF("id").coalesce(1), 821L, 1000L)
    IcebergWriter.deleteWhere(spark, i, col("id") <= 5L, 822L, System.currentTimeMillis())
    reg.register("ns.t", i)
    val out = spark.sql(s"CALL $cat.system.optimize('ns.t')").collect()
    assert(out.length == 1 && out.head.getString(0) == "metadata_version")
    assert(spark.sql(s"SELECT id FROM $cat.ns.t").count() == 15L)
    // compacted: no delete files left in the live view
    val (nDvs, _) = TableStreams.icebergLiveDvStats(spark, i)
    assert(nDvs == 0)
  }

  test("CALL vacuum GCs Delta; CALL expire_snapshots GCs Iceberg; cross-format calls refuse") {
    val (cat, reg) = freshCatalog()
    val d = freshDir() + "/d"
    DeltaLogWriter.write(Seq(1L).toDF("id").coalesce(1), d)
    DeltaLogWriter.write(Seq(2L).toDF("id").coalesce(1), d,
      mode = org.apache.spark.sql.SaveMode.Overwrite) // v1 strands v0's file
    reg.register("ns.d", d)
    val horizon = System.currentTimeMillis() + 60000L
    val removed = spark.sql(s"CALL $cat.system.vacuum('ns.d', $horizon)").collect()
    assert(removed.head.getString(0) == "files_removed" && removed.head.getLong(1) >= 1L)
    assert(spark.sql(s"SELECT id FROM $cat.ns.d").as[Long].collect().toSeq == Seq(2L))
    val i = freshDir() + "/i"
    IcebergWriter.commitAppend(spark, i, Seq(1L).toDF("id").coalesce(1), 831L, 1000L)
    IcebergWriter.commitAppend(spark, i, Seq(2L).toDF("id").coalesce(1), 832L, 2000L)
    reg.register("ns.i", i)
    spark.sql(s"CALL $cat.system.expire_snapshots('ns.i', 1500)").collect()
    assert(TableStreams.icebergSnapshotIds(spark, i) == Seq(832L))
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    val e1 = intercept[Exception](
      spark.sql(s"CALL $cat.system.vacuum('ns.i', 0)").collect())
    assert(messages(e1).exists(_.contains("expire_snapshots")), messages(e1))
    val e2 = intercept[Exception](
      spark.sql(s"CALL $cat.system.expire_snapshots('ns.d', 0)").collect())
    assert(messages(e2).exists(_.contains("vacuum")), messages(e2))
  }

  test("CALL rewrite_manifests merges Iceberg data manifests to one") {
    val (cat, reg) = freshCatalog()
    val i = freshDir() + "/i"
    IcebergWriter.commitAppend(spark, i, Seq(1L).toDF("id").coalesce(1), 841L, 1000L)
    IcebergWriter.commitAppend(spark, i, Seq(2L).toDF("id").coalesce(1), 842L, 2000L)
    IcebergWriter.commitAppend(spark, i, Seq(3L).toDF("id").coalesce(1), 843L, 3000L)
    reg.register("ns.i", i)
    spark.sql(s"CALL $cat.system.rewrite_manifests('ns.i')").collect()
    assert(spark.sql(s"SELECT id FROM $cat.ns.i").as[Long].collect().toSet ==
      Set(1L, 2L, 3L))
    val doc = Iceberg.metadata(spark, i)
    val cur = doc.path("current-snapshot-id").asLong()
    val nManifests = Iceberg.readAvro(spark,
      Iceberg.resolve(i, Iceberg.manifestListOf(doc, i, cur))).size
    assert(nManifests == 1, s"expected one merged manifest, got $nManifests")
  }

  test("an unknown procedure refuses with the served names listed") {
    val (cat, _) = freshCatalog()
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    val e = intercept[Exception](spark.sql(s"CALL $cat.system.nope('x')").collect())
    assert(messages(e).exists(_.contains("optimize")), messages(e))
  }
}
