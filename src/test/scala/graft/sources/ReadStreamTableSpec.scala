package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger

/** `spark.readStream.table("<cat>.ns.t")` — the by-name streaming read:
  * the substitution rule swaps the V2 streaming relation for a V1
  * Source over the format readers, so the engine's own offset log gives
  * exactly-once with resume. Plain appended rows per commit/snapshot;
  * non-append commits refuse with the CDF remedy named. */
class ReadStreamTableSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("rstbl").toString

  private def freshCatalog(): (String, FileRegistryCatalog) = {
    val name = "rs" + java.util.UUID.randomUUID().toString.take(8)
    val reg = freshDir() + "/registry.json"
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.registry", reg)
    (name, new FileRegistryCatalog(spark, reg))
  }

  /** One AvailableNow drain of `readStream.table(name)` into a buffer;
    * returns the (id, batchId) pairs this RUN delivered. */
  private def drain(name: String, checkpoint: String): Seq[(Long, Long)] = {
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val q = spark.readStream.table(name).writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, batchId: Long) =>
        df.select(col("id")).collect().foreach(r => got.add((r.getLong(0), batchId)))
        ()
      }
      .start()
    q.awaitTermination(120000L)
    import scala.jdk.CollectionConverters._
    got.asScala.toSeq
  }

  test("Delta by-name stream drains appends exactly-once and resumes across runs") {
    val (cat, reg) = freshCatalog()
    val d = freshDir() + "/d"
    DeltaLogWriter.write(Seq((1L, "a"), (2L, "b")).toDF("id", "k").coalesce(1), d) // v0
    reg.register("ns.t", d)
    val ckpt = freshDir() + "/ckpt"
    // run 1: the fresh stream replays the table from version 0
    assert(drain(s"$cat.ns.t", ckpt).map(_._1).toSet == Set(1L, 2L))
    // run 2: nothing new — the offset log holds, zero rows redelivered
    assert(drain(s"$cat.ns.t", ckpt).isEmpty)
    // two more commits, one drain: each version is its own batch
    DeltaLogWriter.appendOptimistic(Seq((3L, "c")).toDF("id", "k").coalesce(1), d) // v1
    DeltaLogWriter.appendOptimistic(Seq((4L, "d")).toDF("id", "k").coalesce(1), d) // v2
    val run3 = drain(s"$cat.ns.t", ckpt)
    assert(run3.map(_._1).toSet == Set(3L, 4L), run3.toString)
    // exactly-once overall: a final drain redelivers nothing
    assert(drain(s"$cat.ns.t", ckpt).isEmpty)
  }

  test("Iceberg by-name stream: first drain replays the table, later drains serve increments") {
    val (cat, reg) = freshCatalog()
    val i = freshDir() + "/i"
    IcebergWriter.commitAppend(spark, i,
      Seq((10L, "x")).toDF("id", "k").coalesce(1), 601L, 1000L)
    reg.register("ns.t", i)
    val ckpt = freshDir() + "/ckpt"
    assert(drain(s"$cat.ns.t", ckpt).map(_._1).toSet == Set(10L))
    IcebergWriter.commitAppendOptimistic(spark, i,
      Seq((20L, "y")).toDF("id", "k").coalesce(1), 602L, System.currentTimeMillis())
    assert(drain(s"$cat.ns.t", ckpt).map(_._1).toSet == Set(20L))
    assert(drain(s"$cat.ns.t", ckpt).isEmpty)
  }

  test("ADD COLUMN mid-history: a spanning batch null-fills the old generation; restart serves the new column") {
    val (cat, reg) = freshCatalog()
    val d = freshDir() + "/d"
    DeltaLogWriter.write(Seq((1L, "a")).toDF("id", "k").coalesce(1), d)      // v0
    reg.register("ns.t", d)
    val ckpt = freshDir() + "/ckpt"
    assert(drain(s"$cat.ns.t", ckpt).map(_._1).toSet == Set(1L))
    DeltaLogWriter.addColumn(spark, d, "note",                                // v1
      org.apache.spark.sql.types.StringType)
    DeltaLogWriter.appendOptimistic(                                          // v2
      Seq((2L, "b", "fresh")).toDF("id", "k", "note").coalesce(1), d)
    // restart on the SAME checkpoint: the re-created source carries the
    // CURRENT 3-column schema; only v1..v2 serve
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Option[String])]()
    val q = spark.readStream.table(s"$cat.ns.t").writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.select("id", "note").collect()
          .foreach(r => got.add((r.getLong(0), Option(r.getString(1)))))
        ()
      }.start()
    q.awaitTermination(120000L)
    import scala.jdk.CollectionConverters._
    assert(got.asScala.toSet == Set((2L, Some("fresh"))))
    // and a FRESH stream spans both generations in one batch: the old
    // row null-fills the added column (addsBetween's range-end schema)
    val mixed = DeltaLogReader.addsBetween(spark, d, 0L, 2L)
    assert(mixed.columns.toSeq == Seq("id", "k", "note"))
    assert(mixed.select("id", "note").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSet ==
      Set((1L, None), (2L, Some("fresh"))))
  }

  test("a log truncated (cleanLog) below the stream's position refuses — no partial replay") {
    val d = freshDir() + "/d"
    DeltaLogWriter.write(Seq((1L, "a")).toDF("id", "k").coalesce(1), d)       // v0
    DeltaLogWriter.appendOptimistic(
      Seq((2L, "b")).toDF("id", "k").coalesce(1), d)                          // v1
    DeltaLogWriter.checkpoint(spark, d)
    DeltaLogWriter.cleanLog(spark, d)                                          // prunes v0
    assert(DeltaLogReader.versions(spark, d).head > 0L)
    // a fresh replay from v0 (or any lagging position below the
    // checkpoint) must refuse loudly, not silently skip the pruned adds
    val e = intercept[IllegalArgumentException](
      DeltaLogReader.addsBetween(spark, d, 0L, 1L))
    assert(e.getMessage.contains("truncated") &&
      e.getMessage.contains("startVersion"), e.getMessage)
    // a range fully ABOVE the truncation still serves
    assert(DeltaLogReader.addsBetween(spark, d, 1L, 1L)
      .select("id").collect().map(_.getLong(0)).toSet == Set(2L))
  }

  test("a non-append Delta commit refuses mid-stream with the CDF remedy named") {
    val (cat, reg) = freshCatalog()
    val d = freshDir() + "/d"
    DeltaLogWriter.write(Seq((1L, "a"), (2L, "b")).toDF("id", "k").coalesce(1), d)
    reg.register("ns.t", d)
    val ckpt = freshDir() + "/ckpt"
    assert(drain(s"$cat.ns.t", ckpt).map(_._1).toSet == Set(1L, 2L))
    DeltaLogWriter.deleteWhere(spark, d, col("id") === 1L) // a DV commit
    val e = intercept[Exception](drain(s"$cat.ns.t", ckpt))
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("blind append")), messages(e))
  }

  test("time-traveled loads refuse to stream") {
    val (cat, reg) = freshCatalog()
    val d = freshDir() + "/d"
    DeltaLogWriter.write(Seq(1L).toDF("id").coalesce(1), d)
    reg.register("ns.t", d)
    // readStream has no AS OF syntax; drive the refusal through the rule
    // by loading the table pinned and streaming the same name is not
    // expressible — assert the seam directly instead
    val cat2 = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[GraftCatalog]
    val pinned = cat2.loadTable(
      org.apache.spark.sql.connector.catalog.Identifier.of(Array("ns"), "t"), "0")
      .asInstanceOf[GraftSqlTable]
    assert(pinned.isTravelled)
  }
}
