package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** SQL UPDATE and MERGE INTO through the V2 catalog plugin — the last
  * DML a real metastore user types (the reference's production loop is
  * SQL upsert-maintenance of its tiles table,
  * `02_geofraud_fraud.py:283-304`). Both statements rewrite to the
  * format writers' own SINGLE-COMMIT machinery
  * ([[DeltaLogWriter.updateWhere]]/[[DeltaLogWriter.upsert]],
  * [[IcebergWriter.updateWhere]]/[[IcebergWriter.upsert]]) via
  * [[graft.plans.CatalogTableSubstitution]]'s DML rewrite; everything
  * non-canonical refuses loudly with the supported spelling named. */
class SqlDmlSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("sqldml").toString

  private def freshCatalog(): (String, FileRegistryCatalog) = {
    val name = "dml" + java.util.UUID.randomUUID().toString.take(8)
    val reg = freshDir() + "/registry.json"
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.registry", reg)
    (name, new FileRegistryCatalog(spark, reg))
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
    df.select("id", "amount").as[(Long, Double)].collect().toMap

  test("SQL UPDATE on a Delta table by name: one commit, time travel intact") {
    val (cat, reg) = freshCatalog()
    val d = freshDir() + "/d"
    DeltaLogWriter.write(
      Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "b", 30.0))
        .toDF("id", "k", "amount").coalesce(1), d)
    reg.register("ns.t", d)
    val v0 = DeltaLogReader.latestVersion(spark, d).get
    spark.sql(s"UPDATE $cat.ns.t SET amount = amount * 10 WHERE k = 'b'")
    assert(rows(spark.sql(s"SELECT id, amount FROM $cat.ns.t")) ==
      Map(1L -> 10.0, 2L -> 200.0, 3L -> 300.0))
    assert(DeltaLogReader.latestVersion(spark, d).get == v0 + 1,
      "SQL UPDATE must land as exactly one commit")
    assert(rows(spark.sql(s"SELECT id, amount FROM $cat.ns.t VERSION AS OF $v0")) ==
      Map(1L -> 10.0, 2L -> 20.0, 3L -> 30.0))
  }

  test("SQL UPDATE on an Iceberg table by name; no WHERE updates every row") {
    val (cat, reg) = freshCatalog()
    val i = freshDir() + "/i"
    IcebergWriter.commitAppend(spark, i,
      Seq((1L, 1.0), (2L, 2.0)).toDF("id", "amount").coalesce(1), 11L, 1000L)
    reg.register("ns.t", i)
    spark.sql(s"UPDATE $cat.ns.t SET amount = amount + 0.5 WHERE id = 2")
    assert(rows(spark.sql(s"SELECT id, amount FROM $cat.ns.t")) ==
      Map(1L -> 1.0, 2L -> 2.5))
    assert(Iceberg.metadata(spark, i).path("snapshots").size() == 2,
      "SQL UPDATE must land as exactly one snapshot")
    spark.sql(s"UPDATE $cat.ns.t SET amount = 0.0")
    assert(rows(spark.sql(s"SELECT id, amount FROM $cat.ns.t")) ==
      Map(1L -> 0.0, 2L -> 0.0))
  }

  test("SQL UPDATE matching nothing (and on an empty table) is a no-op") {
    val (cat, reg) = freshCatalog()
    val d = freshDir() + "/d"
    DeltaLogWriter.write(Seq((1L, 1.0)).toDF("id", "amount").coalesce(1), d)
    reg.register("ns.t", d)
    val v0 = DeltaLogReader.latestVersion(spark, d).get
    spark.sql(s"UPDATE $cat.ns.t SET amount = 9.0 WHERE id = 42")
    assert(DeltaLogReader.latestVersion(spark, d).get == v0)
    // a just-CREATEd (empty) table: UPDATE is 0 rows, not a refusal
    spark.sql(s"CREATE TABLE $cat.ns.empty (id BIGINT, amount DOUBLE) " +
      s"USING delta LOCATION '${freshDir()}/e'")
    spark.sql(s"UPDATE $cat.ns.empty SET amount = 1.0")
    assert(spark.sql(s"SELECT * FROM $cat.ns.empty").count() == 0)
  }

  test("MERGE INTO (UPDATE SET * + INSERT *) upserts a Delta table in one commit") {
    val (cat, reg) = freshCatalog()
    val d = freshDir() + "/d"
    DeltaLogWriter.write(
      Seq((1L, 10.0), (2L, 20.0)).toDF("id", "amount").coalesce(1), d)
    reg.register("ns.t", d)
    val v0 = DeltaLogReader.latestVersion(spark, d).get
    spark.sql(
      s"""MERGE INTO $cat.ns.t t
         |USING (SELECT * FROM VALUES (2L, 99.0), (3L, 30.0) AS s(id, amount)) s
         |ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(rows(spark.sql(s"SELECT id, amount FROM $cat.ns.t")) ==
      Map(1L -> 10.0, 2L -> 99.0, 3L -> 30.0))
    assert(DeltaLogReader.latestVersion(spark, d).get == v0 + 1,
      "MERGE must land as exactly one commit")
  }

  test("MERGE INTO upserts an Iceberg table; a catalog table as the source substitutes") {
    val (cat, reg) = freshCatalog()
    val i = freshDir() + "/i"
    IcebergWriter.commitAppend(spark, i,
      Seq((1L, 10.0), (2L, 20.0)).toDF("id", "amount").coalesce(1), 21L, 1000L)
    val src = freshDir() + "/src"
    DeltaLogWriter.write(
      Seq((2L, 99.0), (3L, 30.0)).toDF("id", "amount").coalesce(1), src)
    reg.register("ns.t", i)
    reg.register("ns.src", src)
    spark.sql(
      s"""MERGE INTO $cat.ns.t t USING $cat.ns.src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(rows(spark.sql(s"SELECT id, amount FROM $cat.ns.t")) ==
      Map(1L -> 10.0, 2L -> 99.0, 3L -> 30.0))
    assert(Iceberg.metadata(spark, i).path("snapshots").size() == 2,
      "MERGE must land as exactly one snapshot")
  }

  test("insert-only MERGE appends only absent keys; update-only MERGE touches only present keys") {
    val (cat, reg) = freshCatalog()
    val d = freshDir() + "/d"
    DeltaLogWriter.write(
      Seq((1L, 10.0), (2L, 20.0)).toDF("id", "amount").coalesce(1), d)
    reg.register("ns.t", d)
    spark.sql(
      s"""MERGE INTO $cat.ns.t t
         |USING (SELECT * FROM VALUES (2L, 999.0), (3L, 30.0) AS s(id, amount)) s
         |ON t.id = s.id
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(rows(spark.sql(s"SELECT id, amount FROM $cat.ns.t")) ==
      Map(1L -> 10.0, 2L -> 20.0, 3L -> 30.0),
      "insert-only: key 2 must keep its OLD value")
    spark.sql(
      s"""MERGE INTO $cat.ns.t t
         |USING (SELECT * FROM VALUES (3L, 333.0), (4L, 4.0) AS s(id, amount)) s
         |ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    assert(rows(spark.sql(s"SELECT id, amount FROM $cat.ns.t")) ==
      Map(1L -> 10.0, 2L -> 20.0, 3L -> 333.0),
      "update-only: key 4 must NOT insert")
  }

  test("MERGE INTO a just-CREATEd empty table bootstraps by appending the batch") {
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.ns.boot (id BIGINT, amount DOUBLE) " +
      s"USING delta LOCATION '${freshDir()}/b'")
    spark.sql(
      s"""MERGE INTO $cat.ns.boot t
         |USING (SELECT * FROM VALUES (1L, 1.0), (2L, 2.0) AS s(id, amount)) s
         |ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(rows(spark.sql(s"SELECT id, amount FROM $cat.ns.boot")) ==
      Map(1L -> 1.0, 2L -> 2.0))
  }

  test("non-canonical MERGE shapes refuse loudly with the supported spelling named") {
    val (cat, reg) = freshCatalog()
    val d = freshDir() + "/d"
    DeltaLogWriter.write(Seq((1L, 10.0)).toDF("id", "amount").coalesce(1), d)
    reg.register("ns.t", d)
    def merge(clauses: String): Unit = spark.sql(
      s"""MERGE INTO $cat.ns.t t
         |USING (SELECT * FROM VALUES (1L, 9.0) AS s(id, amount)) s
         |ON t.id = s.id
         |$clauses""".stripMargin)
    val e1 = intercept[UnsupportedOperationException](
      merge("WHEN MATCHED AND s.amount > 5 THEN UPDATE SET *"))
    assert(e1.getMessage.contains("conditional"), e1.getMessage)
    val e2 = intercept[UnsupportedOperationException](
      merge("WHEN MATCHED THEN UPDATE SET amount = s.amount + 1"))
    assert(e2.getMessage.contains("same-named source column"), e2.getMessage)
    val e3 = intercept[UnsupportedOperationException](
      merge("WHEN MATCHED THEN DELETE"))
    assert(e3.getMessage.contains("DELETE"), e3.getMessage)
    // ON across differently-named columns is not a keyed upsert
    val e4 = intercept[UnsupportedOperationException](spark.sql(
      s"""MERGE INTO $cat.ns.t t
         |USING (SELECT * FROM VALUES (1L, 9.0) AS s(id, amount)) s
         |ON t.id = s.amount
         |WHEN MATCHED THEN UPDATE SET *""".stripMargin))
    assert(e4.getMessage.contains("same-named"), e4.getMessage)
  }

  test("MERGE accepts the null-safe ON spelling (t.k <=> s.k)") {
    val (cat, reg) = freshCatalog()
    val d = freshDir() + "/d"
    DeltaLogWriter.write(Seq((1L, 10.0)).toDF("id", "amount").coalesce(1), d)
    reg.register("ns.t", d)
    spark.sql(
      s"""MERGE INTO $cat.ns.t t
         |USING (SELECT * FROM VALUES (1L, 99.0), (2L, 2.0) AS s(id, amount)) s
         |ON t.id <=> s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(rows(spark.sql(s"SELECT id, amount FROM $cat.ns.t")) ==
      Map(1L -> 99.0, 2L -> 2.0))
  }

  test("MERGE with an UPDATE clause refuses duplicate source keys (SQL cardinality)") {
    val (cat, reg) = freshCatalog()
    val d = freshDir() + "/d"
    DeltaLogWriter.write(Seq((1L, 10.0)).toDF("id", "amount").coalesce(1), d)
    reg.register("ns.t", d)
    val e = intercept[IllegalArgumentException](spark.sql(
      s"""MERGE INTO $cat.ns.t t
         |USING (SELECT * FROM VALUES (1L, 1.0), (1L, 2.0) AS s(id, amount)) s
         |ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin))
    assert(e.getMessage.contains("duplicate"), e.getMessage)
  }

  test("SQL UPDATE/DELETE on a fully-DELETED Iceberg table (snapshot, zero live files) is a 0-row no-op") {
    val (cat, reg) = freshCatalog()
    val i = freshDir() + "/i"
    IcebergWriter.commitAppend(spark,
      i, Seq((1L, 10.0)).toDF("id", "amount").coalesce(1), 7301L, 1000L)
    IcebergWriter.deleteWhere(spark, i, col("id") >= 0L, 7302L, 2000L)
    reg.register("ns.gone", i)
    assert(spark.sql(s"SELECT * FROM $cat.ns.gone").count() == 0L)
    // previously: 'has no live data files' escaped the catch and errored
    spark.sql(s"UPDATE $cat.ns.gone SET amount = 1.0")
    spark.sql(s"DELETE FROM $cat.ns.gone WHERE amount > 0")
    assert(spark.sql(s"SELECT * FROM $cat.ns.gone").count() == 0L)
  }

  test("MERGE with an UPDATE clause refuses duplicate TARGET keys (whole-row upsert would collapse them)") {
    val (cat, reg) = freshCatalog()
    val d = freshDir() + "/d"
    DeltaLogWriter.write(Seq((1L, 10.0), (1L, 11.0), (2L, 20.0))
      .toDF("id", "amount").coalesce(1), d)
    reg.register("ns.t", d)
    val e = intercept[IllegalArgumentException](spark.sql(
      s"""MERGE INTO $cat.ns.t t
         |USING (SELECT * FROM VALUES (1L, 99.0) AS s(id, amount)) s
         |ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin))
    assert(e.getMessage.contains("TARGET carries duplicate"), e.getMessage)
    // untouched: the refusal pre-checked, nothing committed
    assert(spark.sql(s"SELECT * FROM $cat.ns.t").count() == 3L)
    // insert-only MERGE is still fine on the duplicate-keyed target
    spark.sql(
      s"""MERGE INTO $cat.ns.t t
         |USING (SELECT * FROM VALUES (3L, 30.0) AS s(id, amount)) s
         |ON t.id = s.id
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(spark.sql(s"SELECT * FROM $cat.ns.t").count() == 4L)
  }

  test("MERGE ON spelled '=' keeps SQL null semantics; the ambiguous combined arm refuses") {
    val (cat, reg) = freshCatalog()
    val d = freshDir() + "/d"
    DeltaLogWriter.write(
      Seq((Some(1L), 10.0), (None, 5.0)).toDF("id", "amount").coalesce(1), d)
    reg.register("ns.t", d)
    // insert-only with '=': a NULL-keyed source row matches NOTHING in
    // SQL — it must INSERT, even though a NULL-keyed target row exists
    spark.sql(
      s"""MERGE INTO $cat.ns.t t
         |USING (SELECT * FROM VALUES (CAST(NULL AS BIGINT), 7.0),
         |       (1L, 10.0) AS s(id, amount)) s
         |ON t.id = s.id
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val amounts = spark.sql(s"SELECT amount FROM $cat.ns.t")
      .collect().map(_.getDouble(0)).sorted.toSeq
    assert(amounts == Seq(5.0, 7.0, 10.0), amounts.toString)
    // …where the <=> spelling would have treated them as MATCHED: the
    // update-only arm under '=' must NOT touch the null-keyed target row
    spark.sql(
      s"""MERGE INTO $cat.ns.t t
         |USING (SELECT * FROM VALUES (CAST(NULL AS BIGINT), 99.0) AS s(id, amount)) s
         |ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    assert(spark.sql(s"SELECT sum(amount) FROM $cat.ns.t")
      .head.getDouble(0) == 22.0)
    // the combined arm with '=' + NULL source keys is the one shape the
    // writers' null-safe matching cannot express — refuse with remedies
    val e = intercept[IllegalArgumentException](spark.sql(
      s"""MERGE INTO $cat.ns.t t
         |USING (SELECT * FROM VALUES (CAST(NULL AS BIGINT), 1.0) AS s(id, amount)) s
         |ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin))
    assert(e.getMessage.contains("<=>"), e.getMessage)
  }

  test("UPDATE with a subquery in WHERE refuses; UPDATE of an unknown column fails in analysis") {
    val (cat, reg) = freshCatalog()
    val d = freshDir() + "/d"
    DeltaLogWriter.write(Seq((1L, 10.0)).toDF("id", "amount").coalesce(1), d)
    reg.register("ns.t", d)
    val e = intercept[Exception](spark.sql(
      s"UPDATE $cat.ns.t SET amount = 0 WHERE id IN (SELECT id FROM $cat.ns.t)"))
    assert(e.getMessage.contains("subquer"), e.getMessage)
    intercept[Exception](spark.sql(s"UPDATE $cat.ns.t SET nope = 0"))
  }

  test("SQL UPDATE on a partitioned Delta table moves rows across partitions") {
    val (cat, reg) = freshCatalog()
    val d = freshDir() + "/d"
    DeltaLogWriter.write(
      Seq((1L, "us", 1.0), (2L, "eu", 2.0)).toDF("id", "region", "amount").coalesce(1),
      d, partitionBy = Seq("region"))
    reg.register("ns.t", d)
    spark.sql(s"UPDATE $cat.ns.t SET region = 'us' WHERE id = 2")
    val out = spark.sql(s"SELECT id, region FROM $cat.ns.t WHERE region = 'us'")
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "us", 2L -> "us"))
  }
}
