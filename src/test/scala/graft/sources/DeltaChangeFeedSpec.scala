package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

/** Delta Change Data Feed interop laws: `delta.enableChangeDataFeed`
  * rides the metaData configuration, DV-writing commits publish
  * `_change_data/` files + `cdc` actions, derivable commits (blind
  * appends, overwrites) serve derived insert/delete rows, and the
  * refusals are loud (disabled table, DV commit without change files,
  * vacuumed remove). */
class DeltaChangeFeedSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    new java.io.File(java.nio.file.Files.createTempDirectory("cdf").toString,
      "tbl").toString

  private def df(ids: Seq[Long]) =
    ids.map(i => (i, i * 10L)).toDF("id", "amount")

  private def feed(path: String, from: Long, to: Long): Seq[(Long, Long, String, Long)] =
    DeltaLogReader.readChangeFeed(spark, path, from, to)
      .select("id", "amount", "_change_type", "_commit_version")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .toSeq.sorted

  test("deleteWhere under CDF publishes change files; the feed replays insert then delete") {
    val path = freshDir()
    DeltaLogWriter.write(df(Seq(1L, 2L, 3L)).coalesce(1), path)      // v0
    DeltaLogWriter.setTableProperties(spark, path,
      Map("delta.enableChangeDataFeed" -> "true"))                   // v1
    val (v, n) = DeltaLogWriter.deleteWhere(spark, path, col("id") === 2L) // v2
    assert(v == 2L && n == 1L)
    // the commit carries a cdc action and the file exists under _change_data/
    val commit = new java.io.File(path, "_delta_log/00000000000000000002.json")
    val lines = scala.io.Source.fromFile(commit).getLines().toSeq
    assert(lines.exists(_.contains("\"cdc\"")), lines.mkString("\n"))
    assert(new java.io.File(path, "_change_data").listFiles().nonEmpty)
    assert(feed(path, 0L, 2L) == Seq(
      (1L, 10L, "insert", 0L), (2L, 20L, "delete", 2L),
      (2L, 20L, "insert", 0L), (3L, 30L, "insert", 0L)))
    // the metaData commit contributes nothing; a sub-range works
    assert(feed(path, 1L, 1L).isEmpty)
    assert(feed(path, 2L, 2L) == Seq((2L, 20L, "delete", 2L)))
  }

  test("upsert under CDF classifies update_preimage/update_postimage/insert") {
    val path = freshDir()
    DeltaLogWriter.write(df(Seq(1L, 2L)).coalesce(1), path)          // v0
    DeltaLogWriter.setTableProperties(spark, path,
      Map("delta.enableChangeDataFeed" -> "true"))                   // v1
    // batch: id 2 exists (update), id 9 is new (insert)
    val batch = Seq((2L, 222L), (9L, 90L)).toDF("id", "amount")
    val (v, killed) = DeltaLogWriter.upsert(spark, path, batch, Seq("id")) // v2
    assert(v == 2L && killed == 1L)
    assert(feed(path, 2L, 2L) == Seq(
      (2L, 20L, "update_preimage", 2L), (2L, 222L, "update_postimage", 2L),
      (9L, 90L, "insert", 2L)))
    // the table itself reads the merged state
    assert(DeltaLogReader.read(spark, path).select("id", "amount")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 10L), (2L, 222L), (9L, 90L)))
  }

  test("an overwrite derives delete+insert without change files") {
    val path = freshDir()
    DeltaLogWriter.write(df(Seq(1L, 2L)).coalesce(1), path)          // v0
    DeltaLogWriter.setTableProperties(spark, path,
      Map("delta.enableChangeDataFeed" -> "true"))                   // v1
    DeltaLogWriter.write(df(Seq(7L)).coalesce(1), path, SaveMode.Overwrite) // v2
    assert(feed(path, 2L, 2L) == Seq(
      (1L, 10L, "delete", 2L), (2L, 20L, "delete", 2L),
      (7L, 70L, "insert", 2L)))
  }

  test("refusals: disabled table, DV commit without cdc, bad range") {
    val path = freshDir()
    DeltaLogWriter.write(df(Seq(1L, 2L)).coalesce(1), path)          // v0
    val e1 = intercept[IllegalArgumentException](
      DeltaLogReader.readChangeFeed(spark, path, 0L, 0L))
    assert(e1.getMessage.contains("enableChangeDataFeed"), e1.getMessage)
    // DV delete BEFORE the property flips on: that commit has no change
    // files, so a feed spanning it refuses rather than guessing
    DeltaLogWriter.deleteWhere(spark, path, col("id") === 1L)        // v1, no cdc
    DeltaLogWriter.setTableProperties(spark, path,
      Map("delta.enableChangeDataFeed" -> "true"))                   // v2
    val e2 = intercept[IllegalArgumentException](
      DeltaLogReader.readChangeFeed(spark, path, 0L, 2L))
    assert(e2.getMessage.contains("not derivable"), e2.getMessage)
    // but the range AFTER the gap serves fine (the metaData commit alone)
    assert(DeltaLogReader.readChangeFeed(spark, path, 2L, 2L).count() == 0L)
    val e3 = intercept[IllegalArgumentException](
      DeltaLogReader.readChangeFeed(spark, path, 3L, 1L))
    assert(e3.getMessage.contains("range"), e3.getMessage)
  }

  test("a cdc-less REMOVE naming a DV-carrying file refuses — its dead rows were never live") {
    val path = freshDir()
    DeltaLogWriter.write(df(Seq(1L, 2L)).coalesce(1), path)           // v0
    DeltaLogWriter.setTableProperties(spark, path,
      Map("delta.enableChangeDataFeed" -> "true"))                    // v1
    // a foreign writer's commit: remove the v0 file WITH a deletionVector
    // descriptor and no cdc action — deriving 'delete' rows by reading
    // the parquet whole would over-report the DV-dead positions
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val v0 = scala.io.Source.fromFile(new java.io.File(path,
      "_delta_log/00000000000000000000.json")).getLines().toSeq
    val addPath = mapper.readTree(v0.find(_.contains("\"add\"")).get)
      .get("add").get("path").asText()
    val dv = """{"storageType":"u","pathOrInlineDv":"x","offset":1,"sizeInBytes":4,"cardinality":1}"""
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(path, "_delta_log", f"${2L}%020d.json"),
      s"""{"remove":{"path":"$addPath","deletionTimestamp":0,"dataChange":true,"deletionVector":$dv}}\n""")
    val e = intercept[IllegalArgumentException](
      DeltaLogReader.readChangeFeed(spark, path, 2L, 2L))
    assert(e.getMessage.contains("deletion-vector-carrying"), e.getMessage)
    // the descriptor on a remove is OPTIONAL: a foreign writer removing
    // a DV-carrying file WITHOUT re-stating the descriptor must refuse
    // too — the gate consults the pre-commit replay state, not just the
    // action's own fields
    val path2 = freshDir()
    DeltaLogWriter.write(df(Seq(1L, 2L, 3L)).coalesce(1), path2)       // v0
    DeltaLogWriter.setTableProperties(spark, path2,
      Map("delta.enableChangeDataFeed" -> "true"))                     // v1
    DeltaLogWriter.deleteWhere(spark, path2, col("id") === 2L)         // v2: DV + cdc
    val v2lines = scala.io.Source.fromFile(new java.io.File(path2,
      "_delta_log/00000000000000000002.json")).getLines().toSeq
    val dvAddPath = mapper.readTree(v2lines.filter(_.contains("\"add\""))
      .find(_.contains("deletionVector")).get).get("add").get("path").asText()
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(path2, "_delta_log", f"${3L}%020d.json"),
      s"""{"remove":{"path":"$dvAddPath","deletionTimestamp":0,"dataChange":true}}\n""")
    val e2 = intercept[IllegalArgumentException](
      DeltaLogReader.readChangeFeed(spark, path2, 3L, 3L))
    assert(e2.getMessage.contains("deletion-vector-carrying"), e2.getMessage)
  }

  test("restore under CDF publishes the LOGICAL diff — DV survivors are not re-inserted") {
    val path = freshDir()
    DeltaLogWriter.write(df(Seq(1L, 2L, 3L, 4L, 5L, 6L)).coalesce(1), path) // v0
    DeltaLogWriter.setTableProperties(spark, path,
      Map("delta.enableChangeDataFeed" -> "true"))                          // v1
    DeltaLogWriter.deleteWhere(spark, path, col("id") % 2 === 0)            // v2: DV
    // restore to v1: the file re-adds WITHOUT its DV — logically only
    // rows 2/4/6 return; an action-derived feed would claim all six
    val v = DeltaLogWriter.restore(spark, path, toVersion = 1L)             // v3
    assert(v == 3L)
    assert(feed(path, 3L, 3L) == Seq(
      (2L, 20L, "insert", 3L), (4L, 40L, "insert", 3L),
      (6L, 60L, "insert", 3L)))
    // and the reverse direction: restoring back over live rows feeds deletes
    DeltaLogWriter.restore(spark, path, toVersion = 2L)                     // v4
    assert(feed(path, 4L, 4L) == Seq(
      (2L, 20L, "delete", 4L), (4L, 40L, "delete", 4L),
      (6L, 60L, "delete", 4L)))
    assert(DeltaLogReader.read(spark, path).count() == 3L)
  }

  test("streamChangeFeed drains incrementally with crash-safe offsets") {
    val path = freshDir()
    val chk = freshDir() + "/chk"
    DeltaLogWriter.write(df(Seq(1L, 2L)).coalesce(1), path)          // v0
    DeltaLogWriter.setTableProperties(spark, path,
      Map("delta.enableChangeDataFeed" -> "true"))                   // v1
    DeltaLogWriter.deleteWhere(spark, path, col("id") === 1L)        // v2
    val batches = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[(Long, String)])]
    def drain(): Seq[Long] =
      DeltaLogReader.streamChangeFeed(spark, path, chk, startVersion = 1L) {
        (d, v) => batches += ((v, d.select("id", "_change_type").collect()
          .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted))
      }
    // first drain: v1 advances silently (changeless), v2 serves deletes
    assert(drain() == Seq(1L, 2L))
    assert(batches.toSeq == Seq((2L, Seq((1L, "delete")))))
    // caught up: nothing re-served
    assert(drain().isEmpty)
    // new commits arrive as their own batches on the NEXT drain
    DeltaLogWriter.write(df(Seq(9L)).coalesce(1), path)              // v3
    assert(drain() == Seq(3L))
    assert(batches.last == ((3L, Seq((9L, "insert")))))
    // crash window: superseded offsets are cleaned (max wins), so
    // losing the ONLY offset file replays from startVersion — the
    // at-least-once contract into an idempotent sink, with every
    // replayed batch identical to its first serving
    val chkF = new java.io.File(chk)
    assert(chkF.listFiles().map(_.getName).filterNot(_.endsWith(".crc"))
      .toSeq == Seq("offset_v3"))
    assert(new java.io.File(chkF, "offset_v3").delete())
    assert(drain() == Seq(1L, 2L, 3L))
    assert(batches.size == 4 &&
      batches.drop(2).toSeq == Seq((2L, Seq((1L, "delete"))),
        (3L, Seq((9L, "insert")))))
  }

  test("CDF state survives checkpoint + cleanLog; a truncated range refuses by name") {
    val path = freshDir()
    DeltaLogWriter.write(df(Seq(1L)).coalesce(1), path)              // v0
    DeltaLogWriter.setTableProperties(spark, path,
      Map("delta.enableChangeDataFeed" -> "true"))                   // v1
    DeltaLogWriter.write(df(Seq(2L)).coalesce(1), path)              // v2
    DeltaLogWriter.checkpoint(spark, path)
    DeltaLogWriter.cleanLog(spark, path)
    // v0/v1 JSONs are gone: a range reaching below the checkpoint names them
    val e = intercept[IllegalArgumentException](
      DeltaLogReader.readChangeFeed(spark, path, 0L, 2L))
    assert(e.getMessage.contains("no longer exists"), e.getMessage)
    // the surviving range still serves, and the property survived replay
    DeltaLogWriter.deleteWhere(spark, path, col("id") === 1L)        // v3, cdc
    assert(feed(path, 3L, 3L) == Seq((1L, 10L, "delete", 3L)))
  }
}
