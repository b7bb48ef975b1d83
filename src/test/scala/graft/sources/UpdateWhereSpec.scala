package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, lit}

/** Row-level UPDATE as ONE commit on both table formats:
  * `DeltaLogWriter.updateWhere` (DV kill + re-append in a single log
  * entry) and `IcebergWriter.updateWhere` (position-delete + data
  * manifest in a single snapshot). These are the engines behind the SQL
  * `UPDATE <cat>.ns.t SET ... WHERE ...` seam (q276). */
class UpdateWhereSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("upd").toString

  // ------------------------------------------------------------- Delta

  test("Delta updateWhere: one commit, DV-killed old rows, rewritten rows readable") {
    val path = freshDir() + "/t"
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "k", "amount").coalesce(1)
      .pipe(df => DeltaLogWriter.write(df, path))
    val v0 = DeltaLogReader.latestVersion(spark, path).get
    val (v, n) = DeltaLogWriter.updateWhere(spark, path,
      col("id") >= 2L, Seq("amount" -> (col("amount") * 10)))
    assert(n == 2L)
    assert(v == v0 + 1, "UPDATE must land as exactly ONE commit")
    val rows = DeltaLogReader.read(spark, path)
      .select("id", "amount").as[(Long, Double)].collect().toMap
    assert(rows == Map(1L -> 10.0, 2L -> 200.0, 3L -> 300.0))
    // time travel still serves the pre-update state
    val before = DeltaLogReader.read(spark, path, Some(v0))
      .select("id", "amount").as[(Long, Double)].collect().toMap
    assert(before == Map(1L -> 10.0, 2L -> 20.0, 3L -> 30.0))
  }

  test("Delta updateWhere matching nothing commits nothing") {
    val path = freshDir() + "/t"
    DeltaLogWriter.write(Seq((1L, 5.0)).toDF("id", "x").coalesce(1), path)
    val v0 = DeltaLogReader.latestVersion(spark, path).get
    val (v, n) = DeltaLogWriter.updateWhere(spark, path,
      col("id") === 99L, Seq("x" -> lit(0.0)))
    assert(n == 0L && v == v0)
    assert(DeltaLogReader.latestVersion(spark, path).get == v0)
  }

  test("Delta updateWhere on a partitioned table MOVES a row assigned a new partition value") {
    val path = freshDir() + "/t"
    DeltaLogWriter.write(
      Seq((1L, "us", 1.0), (2L, "eu", 2.0)).toDF("id", "region", "x").coalesce(1),
      path, partitionBy = Seq("region"))
    val (_, n) = DeltaLogWriter.updateWhere(spark, path,
      col("id") === 2L, Seq("region" -> lit("us")))
    assert(n == 1L)
    val out = DeltaLogReader.read(spark, path)
      .select("id", "region").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "us", 2L -> "us"))
    // the moved row's new file lives under the NEW hive partition and
    // its add action carries the new partitionValues — a partition-
    // pruned read finds it there
    val pruned = DeltaLogReader.read(spark, path)
      .where(col("region") === "us").count()
    assert(pruned == 2L)
  }

  test("Delta updateWhere under CDF publishes update_preimage/update_postimage") {
    val path = freshDir() + "/t"
    DeltaLogWriter.write(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "x").coalesce(1), path)
    DeltaLogWriter.setTableProperties(spark, path,
      Map("delta.enableChangeDataFeed" -> "true"))
    val (v, _) = DeltaLogWriter.updateWhere(spark, path,
      col("id") === 2L, Seq("x" -> (col("x") + 1)))
    val feed = DeltaLogReader.readChangeFeed(spark, path, v, v)
      .select("id", "x", "_change_type").as[(Long, Double, String)]
      .collect().toSet
    assert(feed == Set((2L, 20.0, "update_preimage"), (2L, 21.0, "update_postimage")))
  }

  test("Delta updateWhere leaves previously-DV-deleted rows dead even when they match") {
    val path = freshDir() + "/t"
    DeltaLogWriter.write(Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)).toDF("id", "x").coalesce(1), path)
    DeltaLogWriter.deleteWhere(spark, path, col("id") === 1L)
    val (_, n) = DeltaLogWriter.updateWhere(spark, path,
      col("id") <= 2L, Seq("x" -> lit(0.0)))
    assert(n == 1L, "only the ACTIVE matching row updates")
    val out = DeltaLogReader.read(spark, path)
      .select("id", "x").as[(Long, Double)].collect().toMap
    assert(out == Map(2L -> 0.0, 3L -> 3.0))
  }

  test("Delta updateWhere refuses unknown columns and duplicate SET targets") {
    val path = freshDir() + "/t"
    DeltaLogWriter.write(Seq((1L, 1.0)).toDF("id", "x").coalesce(1), path)
    val e1 = intercept[IllegalArgumentException] {
      DeltaLogWriter.updateWhere(spark, path, lit(true), Seq("nope" -> lit(1)))
    }
    assert(e1.getMessage.contains("not"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      DeltaLogWriter.updateWhere(spark, path, lit(true),
        Seq("x" -> lit(0.0), "x" -> lit(1.0)))
    }
    assert(e2.getMessage.contains("twice"), e2.getMessage)
  }

  test("Delta updateWhere on a NAME-mapped table: the day-after-RENAME update") {
    val path = freshDir() + "/t"
    DeltaLogWriter.write(
      Seq((1L, 10.0), (2L, 20.0)).toDF("id", "amount").coalesce(1), path)
    DeltaLogWriter.enableColumnMapping(spark, path)
    DeltaLogWriter.renameColumn(spark, path, "amount", "value_usd")
    val (_, n) = DeltaLogWriter.updateWhere(spark, path,
      col("id") === 2L, Seq("value_usd" -> (col("value_usd") * 10)))
    assert(n == 1L)
    val out = DeltaLogReader.read(spark, path)
      .select("id", "value_usd").as[(Long, Double)].collect().toMap
    assert(out == Map(1L -> 10.0, 2L -> 200.0),
      "old generation under the new name + the physically-projected rewrite")
    // the rewritten parquet carries PHYSICAL names (the pre-rename ones)
    val newest = new java.io.File(path).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .maxBy(_.lastModified())
    assert(spark.read.parquet(newest.getAbsolutePath).columns.contains("amount"),
      "mapped rewrites must publish physical column names")
  }

  // ----------------------------------------------------------- Iceberg

  test("Iceberg updateWhere: one snapshot, position-deleted old rows, rewritten rows readable") {
    val t = freshDir() + "/i"
    IcebergWriter.commitAppend(spark, t,
      Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
        .toDF("id", "k", "amount").coalesce(1), 101L, 1000L)
    IcebergWriter.updateWhere(spark, t,
      col("id") >= 2L, Seq("amount" -> (col("amount") * 10)), 102L, 2000L)
    val doc = Iceberg.metadata(spark, t)
    assert(doc.path("snapshots").size() == 2, "UPDATE must land as ONE snapshot")
    val rows = Iceberg.read(spark, t)
      .select("id", "amount").as[(Long, Double)].collect().toMap
    assert(rows == Map(1L -> 10.0, 2L -> 200.0, 3L -> 300.0))
    // the prior snapshot still serves the pre-update state
    val before = Iceberg.readSnapshot(spark, t, 101L)
      .select("id", "amount").as[(Long, Double)].collect().toMap
    assert(before == Map(1L -> 10.0, 2L -> 20.0, 3L -> 30.0))
  }

  test("Iceberg updateWhere matching nothing commits nothing") {
    val t = freshDir() + "/i"
    IcebergWriter.commitAppend(spark, t, Seq((1L, 5.0)).toDF("id", "x").coalesce(1),
      201L, 1000L)
    val v = IcebergWriter.updateWhere(spark, t,
      col("id") === 99L, Seq("x" -> lit(0.0)), 202L, 2000L)
    assert(Iceberg.metadata(spark, t).path("snapshots").size() == 1)
    val v2 = IcebergWriter.updateWhere(spark, t,
      col("id") === 1L, Seq("x" -> lit(7.0)), 203L, 3000L)
    assert(v2 == v + 1)
    assert(Iceberg.read(spark, t).select("x").as[Double].collect().toSeq == Seq(7.0))
  }

  test("Iceberg updateWhere stacks: a second update sees the first's rows") {
    val t = freshDir() + "/i"
    IcebergWriter.commitAppend(spark, t,
      Seq((1L, 1.0), (2L, 2.0)).toDF("id", "x").coalesce(1), 301L, 1000L)
    IcebergWriter.updateWhere(spark, t,
      col("id") === 1L, Seq("x" -> lit(100.0)), 302L, 2000L)
    IcebergWriter.updateWhere(spark, t,
      col("x") === 100.0, Seq("x" -> lit(200.0)), 303L, 3000L)
    val out = Iceberg.read(spark, t)
      .select("id", "x").as[(Long, Double)].collect().toMap
    assert(out == Map(1L -> 200.0, 2L -> 2.0))
  }

  test("Iceberg updateWhere refuses partitioned tables and unknown columns") {
    val t = freshDir() + "/i"
    IcebergWriter.commitAppend(spark, t, Seq((1L, 1.0)).toDF("id", "x").coalesce(1),
      401L, 1000L)
    val e1 = intercept[IllegalArgumentException] {
      IcebergWriter.updateWhere(spark, t, lit(true), Seq("nope" -> lit(1)), 402L, 2000L)
    }
    assert(e1.getMessage.contains("not"), e1.getMessage)
    val tp = freshDir() + "/ip"
    IcebergWriter.createTable(spark, tp,
      Seq((1L, "us")).toDF("id", "region").schema, Seq("region"))
    IcebergWriter.commitAppendOptimistic(spark, tp,
      Seq((1L, "us")).toDF("id", "region").coalesce(1), 403L, 1000L)
    val e2 = intercept[IllegalArgumentException] {
      IcebergWriter.updateWhere(spark, tp, lit(true),
        Seq("id" -> lit(9L)), 404L, 2000L)
    }
    assert(e2.getMessage.contains("PARTITIONED"), e2.getMessage)
  }

  private implicit class Pipe[A](a: A) {
    def pipe[B](f: A => B): B = f(a)
  }
}
