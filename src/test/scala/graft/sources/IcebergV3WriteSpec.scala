package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Iceberg FORMAT-VERSION 3 writes — the r14 "readable but not
  * maintainable" gap closed: appends maintain ROW LINEAGE (per-file
  * `first_row_id`, snapshot `first-row-id`, table `next-row-id`) and
  * deletes commit as puffin DELETION VECTORS (one blob per touched
  * file, one DV per file under the supersede rule), both read back
  * through the same q272 decode path. */
class IcebergV3WriteSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("icev3").toString

  private def meta(t: String) = Iceberg.metadata(spark, t)

  test("v3 append maintains row lineage: per-file first_row_id, snapshot first-row-id, next-row-id") {
    val t = freshDir() + "/t"
    IcebergWriter.createTableV3(spark, t,
      Seq((1L, "a")).toDF("id", "k").schema)
    assert(meta(t).path("format-version").asInt() == 3)
    assert(meta(t).path("next-row-id").asLong(-1L) == 0L)
    IcebergWriter.commitAppendV3(spark, t,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "k").coalesce(1), 701L, 1000L)
    IcebergWriter.commitAppendV3(spark, t,
      Seq((4L, "d"), (5L, "e")).toDF("id", "k").coalesce(1), 702L, 2000L)
    val d = meta(t)
    assert(d.path("next-row-id").asLong(-1L) == 5L,
      "next-row-id advances by exactly the appended row count")
    val frids = {
      val it = d.path("snapshots").elements()
      val m = scala.collection.mutable.Map.empty[Long, Long]
      while (it.hasNext) { val s = it.next()
        m(s.path("snapshot-id").asLong()) = s.path("first-row-id").asLong(-1L) }
      m.toMap
    }
    assert(frids == Map(701L -> 0L, 702L -> 3L))
    assert(Iceberg.read(spark, t).select("id").as[Long].collect().toSet ==
      Set(1L, 2L, 3L, 4L, 5L))
    // the per-file stamps: every live data file carries first_row_id,
    // ranges tile [0, next-row-id) exactly
    val mlPath = Iceberg.manifestListOf(d, t, 702L)
    val spans = Iceberg.readAvro(spark, Iceberg.resolve(t, mlPath)).flatMap { m =>
      Iceberg.readAvro(spark, Iceberg.resolve(t,
          m.get("manifest_path").toString)).map { e =>
        val df0 = e.get("data_file").asInstanceOf[org.apache.avro.generic.GenericRecord]
        (Iceberg.longField(df0, "first_row_id").getOrElse(-1L),
          Iceberg.longField(df0, "record_count").getOrElse(0L))
      }
    }.sortBy(_._1)
    assert(spans.forall(_._1 >= 0), s"unstamped file: $spans")
    assert(spans.foldLeft(0L) { case (cursor, (frid, n)) =>
      assert(frid == cursor, s"row-id ranges must tile: $spans"); cursor + n
    } == 5L)
  }

  test("v3 DV delete: puffin blob per file, survivors read back, lineage clock unchanged") {
    val t = freshDir() + "/t"
    IcebergWriter.createTableV3(spark, t, Seq((1L, 1.0)).toDF("id", "x").schema)
    IcebergWriter.commitAppendV3(spark, t,
      (1L to 10L).map(i => (i, i * 1.0)).toDF("id", "x").coalesce(1), 711L, 1000L)
    IcebergWriter.deleteWhereV3(spark, t, col("id") % 3 === 0L, 712L, 2000L)
    assert(Iceberg.read(spark, t).select("id").as[Long].collect().toSet ==
      (1L to 10L).filterNot(_ % 3 == 0).toSet)
    val d = meta(t)
    assert(d.path("next-row-id").asLong(-1L) == 10L,
      "a delete assigns no row ids")
    // snapshot 712's first-row-id is the zero-width current clock
    val s712 = {
      val it = d.path("snapshots").elements()
      var v = -1L
      while (it.hasNext) { val s = it.next()
        if (s.path("snapshot-id").asLong() == 712L) v = s.path("first-row-id").asLong(-1L) }
      v
    }
    assert(s712 == 10L)
    // time travel: the pre-delete snapshot still serves all ten
    assert(Iceberg.readSnapshot(spark, t, 711L).count() == 10L)
  }

  test("a second v3 delete UNIONS the file's DV and supersedes the old entry (one DV per file)") {
    val t = freshDir() + "/t"
    IcebergWriter.createTableV3(spark, t, Seq((1L, 1.0)).toDF("id", "x").schema)
    IcebergWriter.commitAppendV3(spark, t,
      (1L to 10L).map(i => (i, i * 1.0)).toDF("id", "x").coalesce(1), 721L, 1000L)
    IcebergWriter.deleteWhereV3(spark, t, col("id") === 2L, 722L, 2000L)
    IcebergWriter.deleteWhereV3(spark, t, col("id").isin(4L, 6L), 723L, 3000L)
    assert(Iceberg.read(spark, t).select("id").as[Long].collect().toSet ==
      Set(1L, 3L, 5L, 7L, 8L, 9L, 10L))
    // exactly ONE live DV for the one data file — the 722 entry superseded
    val d = meta(t)
    val planned = Iceberg.listLiveFiles(spark, t,
      Iceberg.manifestListOf(d, t, 723L), 723L)
    assert(planned.dvs.size == 1, planned.dvs.toString)
    assert(planned.dvs.head.cardinality == 3L, "union of 2 + {4,6}")
    // and the superseded snapshot still time-travels exactly
    assert(Iceberg.readSnapshot(spark, t, 722L)
      .select("id").as[Long].collect().toSet == ((1L to 10L).toSet - 2L))
  }

  test("append after a DV delete: carried delete manifests hold, ids continue, reads stitch") {
    val t = freshDir() + "/t"
    IcebergWriter.createTableV3(spark, t, Seq((1L, 1.0)).toDF("id", "x").schema)
    IcebergWriter.commitAppendV3(spark, t,
      (1L to 4L).map(i => (i, i * 1.0)).toDF("id", "x").coalesce(1), 731L, 1000L)
    IcebergWriter.deleteWhereV3(spark, t, col("id") === 1L, 732L, 2000L)
    IcebergWriter.commitAppendV3(spark, t,
      Seq((11L, 11.0)).toDF("id", "x").coalesce(1), 733L, 3000L)
    assert(Iceberg.read(spark, t).select("id").as[Long].collect().toSet ==
      Set(2L, 3L, 4L, 11L))
    assert(meta(t).path("next-row-id").asLong(-1L) == 5L)
  }

  test("the v2 writers still refuse v3; the v3 writers refuse v2 and partitioned tables") {
    val t = freshDir() + "/t"
    IcebergWriter.createTableV3(spark, t, Seq((1L, 1.0)).toDF("id", "x").schema)
    val e1 = intercept[IllegalArgumentException](
      IcebergWriter.commitAppend(spark, t, Seq((1L, 1.0)).toDF("id", "x"), 741L, 1000L))
    assert(e1.getMessage.contains("format-version 3"), e1.getMessage)
    val t2 = freshDir() + "/t2"
    IcebergWriter.commitAppend(spark, t2,
      Seq((1L, 1.0)).toDF("id", "x").coalesce(1), 742L, 1000L)
    val e2 = intercept[IllegalArgumentException](
      IcebergWriter.commitAppendV3(spark, t2, Seq((2L, 2.0)).toDF("id", "x"), 743L, 2000L))
    assert(e2.getMessage.contains("v3"), e2.getMessage)
  }

  test("row ids are STABLE: _row_id derives from first_row_id + position and survives deletes") {
    val t = freshDir() + "/t"
    IcebergWriter.createTableV3(spark, t, Seq((1L, 1.0)).toDF("id", "x").schema)
    IcebergWriter.commitAppendV3(spark, t,
      (1L to 5L).map(i => (i, i * 1.0)).toDF("id", "x").coalesce(1), 761L, 1000L)
    IcebergWriter.commitAppendV3(spark, t,
      (6L to 8L).map(i => (i, i * 1.0)).toDF("id", "x").coalesce(1), 762L, 2000L)
    val before = TableStreams.icebergReadWithRowIds(spark, t)
      .select("id", "_row_id").as[(Long, Long)].collect().toMap
    // the two appends tile the id space [0,5) and [5,8); within a file
    // ids follow row position — the coalesce(1) writes preserve order
    assert(before == (1L to 8L).map(i => i -> (i - 1L)).toMap, before.toString)
    IcebergWriter.deleteWhereV3(spark, t, col("id").isin(2L, 7L), 763L, 3000L)
    val after = TableStreams.icebergReadWithRowIds(spark, t)
      .select("id", "_row_id").as[(Long, Long)].collect().toMap
    assert(after == before - 2L - 7L,
      "survivors keep their EXACT pre-delete row ids — the lineage law")
  }

  test("v3 delete on a table with a FOREIGN (fixture-authored) DV unions through the q272 layout") {
    // the q272 shape: one data file, one pre-existing puffin DV killing %4 ids
    val t = freshDir() + "/t"
    IcebergWriter.createTableV3(spark, t, Seq((1L, 1.0)).toDF("id", "x").schema)
    IcebergWriter.commitAppendV3(spark, t,
      (1L to 8L).map(i => (i, i * 1.0)).toDF("id", "x").coalesce(1), 751L, 1000L)
    IcebergWriter.deleteWhereV3(spark, t, col("id").isin(4L, 8L), 752L, 2000L)
    IcebergWriter.deleteWhereV3(spark, t, col("id") === 1L, 753L, 3000L)
    assert(Iceberg.read(spark, t).select("id").as[Long].collect().toSet ==
      Set(2L, 3L, 5L, 6L, 7L))
  }
}
