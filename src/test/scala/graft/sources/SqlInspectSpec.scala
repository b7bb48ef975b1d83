package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** The SQL inspection statements every metastore user runs first:
  * DESCRIBE TABLE (schema + partitioning), DESCRIBE EXTENDED /
  * SHOW TBLPROPERTIES (location, provider, format configuration), and
  * SHOW PARTITIONS for identity-partitioned tables — all served from
  * the formats' own metadata through the V2 table surface. */
class SqlInspectSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("inspect").toString

  private def freshCatalog(): (String, FileRegistryCatalog) = {
    val name = "ins" + java.util.UUID.randomUUID().toString.take(8)
    val reg = freshDir() + "/registry.json"
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.registry", reg)
    (name, new FileRegistryCatalog(spark, reg))
  }

  test("DESCRIBE TABLE shows the schema AND the partition block; EXTENDED carries location") {
    val (cat, reg) = freshCatalog()
    val d = freshDir() + "/d"
    DeltaLogWriter.write(
      Seq((1L, "us", 1.0)).toDF("id", "region", "amount"), d,
      partitionBy = Seq("region"))
    reg.register("ns.t", d)
    val desc = spark.sql(s"DESCRIBE TABLE $cat.ns.t").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(desc.contains(("id", "bigint")) && desc.contains(("amount", "double")))
    assert(desc.map(_._1).contains("# Partition Information"), desc.toString)
    assert(desc.count(_._1 == "region") >= 2, "region listed as column AND partition")
    val ext = spark.sql(s"DESCRIBE TABLE EXTENDED $cat.ns.t").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(ext.exists { case (k, v) => k.toLowerCase.contains("location") || v.contains(d) },
      ext.mkString("; "))
  }

  test("SHOW TBLPROPERTIES serves location/provider and Delta configuration") {
    val (cat, reg) = freshCatalog()
    val d = freshDir() + "/d"
    DeltaLogWriter.write(Seq((1L, 1.0)).toDF("id", "x"), d)
    DeltaLogWriter.setTableProperties(spark, d,
      Map("delta.enableChangeDataFeed" -> "true"))
    reg.register("ns.t", d)
    // `provider`/`location` are RESERVED keys Spark's SHOW filters out
    // (they surface through DESCRIBE EXTENDED); the format's own
    // configuration shows here
    val props = spark.sql(s"SHOW TBLPROPERTIES $cat.ns.t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("delta.enableChangeDataFeed").contains("true"), props.toString)
    // Iceberg: format-version surfaces
    val i = freshDir() + "/i"
    IcebergWriter.commitAppend(spark, i, Seq((1L, 1.0)).toDF("id", "x").coalesce(1),
      801L, 1000L)
    reg.register("ns.i", i)
    val iprops = spark.sql(s"SHOW TBLPROPERTIES $cat.ns.i").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(iprops.get("format-version").contains("1"), iprops.toString)
    // the reserved keys surface through DESCRIBE EXTENDED instead
    val ext = spark.sql(s"DESCRIBE TABLE EXTENDED $cat.ns.i").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(ext.exists { case (k, v) =>
      k.toLowerCase.contains("provider") && v.contains("iceberg") },
      ext.mkString("; "))
  }

  test("SHOW PARTITIONS lists identity partitions on both formats; filters apply") {
    val (cat, reg) = freshCatalog()
    val d = freshDir() + "/d"
    DeltaLogWriter.write(
      Seq((1L, "us", 1.0), (2L, "eu", 2.0), (3L, "us", 3.0))
        .toDF("id", "region", "amount"), d, partitionBy = Seq("region"))
    reg.register("ns.t", d)
    val parts = spark.sql(s"SHOW PARTITIONS $cat.ns.t")
      .collect().map(_.getString(0)).toSet
    assert(parts == Set("region=us", "region=eu"), parts.toString)
    val filtered = spark.sql(s"SHOW PARTITIONS $cat.ns.t PARTITION (region = 'us')")
      .collect().map(_.getString(0)).toSet
    assert(filtered == Set("region=us"), filtered.toString)
    // Iceberg identity partitioning
    val i = freshDir() + "/i"
    IcebergWriter.createTable(spark, i,
      Seq((1L, "us")).toDF("id", "region").schema, Seq("region"))
    IcebergWriter.commitAppendOptimistic(spark, i,
      Seq((1L, "us"), (2L, "eu")).toDF("id", "region").coalesce(1), 811L, 1000L)
    reg.register("ns.i", i)
    assert(spark.sql(s"SHOW PARTITIONS $cat.ns.i")
      .collect().map(_.getString(0)).toSet == Set("region=us", "region=eu"))
  }

  test("SHOW PARTITIONS refuses hidden (transform) partitioning with the remedy named") {
    val (cat, reg) = freshCatalog()
    val i = freshDir() + "/i"
    IcebergWriter.createTable(spark, i,
      Seq((1L, java.sql.Date.valueOf("2024-01-15"))).toDF("id", "d").schema,
      Seq("day(d)"))
    reg.register("ns.i", i)
    val e = intercept[Exception](spark.sql(s"SHOW PARTITIONS $cat.ns.i").collect())
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("identity")), messages(e))
    // but DESCRIBE still shows the transform
    val desc = spark.sql(s"DESCRIBE TABLE $cat.ns.i").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(desc.exists(_._2.contains("day")), desc.mkString("; "))
  }
}
