package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** The optimistic-concurrency commit protocol, raced DETERMINISTICALLY:
  * each spec installs a "winning writer" in the loser's pre-commit test
  * seam (`beforeCommitHook` / `beforeSwapHook`), so the winner lands
  * between the loser's state observation and its publish — the exact
  * interleaving two uncoordinated processes produce — without flaky
  * thread timing. Laws: racing appenders BOTH land with no lost update
  * (Delta and Iceberg), disjoint rewrites re-propose past data-only
  * winners, and only TRUE conflicts refuse (schema drift under a staged
  * append, a winner touching a file a staged rewrite read, snapshot-id
  * reuse). */
class OptimisticConcurrencySpec extends SparkSpec
    with org.scalatest.BeforeAndAfterEach {
  import spark.implicits._

  private def freshDir(prefix: String): String =
    new java.io.File(java.nio.file.Files.createTempDirectory(prefix).toString,
      "tbl").toString

  private def df(ids: Seq[Long]) = ids.map(i => (i, s"n_$i")).toDF("id", "name")

  private def deltaIds(path: String): Set[Long] =
    DeltaLogReader.read(spark, path).select("id").collect().map(_.getLong(0)).toSet

  override def afterEach(): Unit = {
    // a failing spec must not leak its winner into the next test
    DeltaLogWriter.beforeCommitHook = () => ()
    IcebergWriter.beforeSwapHook = () => ()
    super.afterEach()
  }

  test("Delta: two racing appenders both land — no lost update") {
    val path = freshDir("occ_delta")
    assert(DeltaLogWriter.appendOptimistic(df(Seq(1L, 2L)), path) == 0L)
    // the winner lands AFTER the loser observed v0 and staged its parts
    DeltaLogWriter.beforeCommitHook = () => {
      DeltaLogWriter.beforeCommitHook = () => ()
      DeltaLogWriter.write(df(Seq(10L)), path)
    }
    val v = DeltaLogWriter.appendOptimistic(df(Seq(20L)), path)
    assert(v == 2L, s"loser should re-propose at v2, landed v$v")
    assert(deltaIds(path) == Set(1L, 2L, 10L, 20L))
  }

  test("Delta: a creation race merges when schemas agree") {
    val path = freshDir("occ_delta_create")
    DeltaLogWriter.beforeCommitHook = () => {
      DeltaLogWriter.beforeCommitHook = () => ()
      DeltaLogWriter.write(df(Seq(1L)), path) // the winning CREATOR
    }
    val v = DeltaLogWriter.appendOptimistic(df(Seq(2L)), path)
    assert(v == 1L)
    assert(deltaIds(path) == Set(1L, 2L))
    // exactly one metaData action exists — the winner's
    val log = new java.io.File(path, "_delta_log").listFiles()
      .filter(_.getName.endsWith(".json")).sortBy(_.getName)
    val metaLines = log.flatMap(f =>
      scala.io.Source.fromFile(f).getLines().filter(_.contains("\"metaData\"")))
    assert(metaLines.length == 1)
  }

  test("Delta: appendOptimistic validates the EXISTING metaData even without a race") {
    val path = freshDir("occ_delta_pre")
    DeltaLogWriter.appendOptimistic(df(Seq(1L)), path)
    // nobody races — the pre-stage validation alone must refuse drift
    val e = intercept[IllegalArgumentException](DeltaLogWriter.appendOptimistic(
      Seq((1L, 1.5)).toDF("id", "score"), path))
    assert(e.getMessage.contains("drifts"), e.getMessage)
    val e2 = intercept[IllegalArgumentException](DeltaLogWriter.appendOptimistic(
      df(Seq(2L)), path, partitionBy = Seq("name")))
    assert(e2.getMessage.contains("contradicts"), e2.getMessage)
    assert(deltaIds(path) == Set(1L))
  }

  test("Delta: a stream batch re-proposes past a racing maintenance commit; sentinel intact") {
    val path = freshDir("occ_delta_stream")
    DeltaLogWriter.write(df(Seq(1L, 2L)).repartition(2), path)      // v0
    // the racing maintenance lands AFTER the stream batch observed v0
    // and staged its parts — OPTIMIZE is the checkpoint-cycle commit
    // that used to abort the stream at the v1-already-exists guard
    DeltaLogWriter.beforeCommitHook = () => {
      DeltaLogWriter.beforeCommitHook = () => ()
      DeltaLogWriter.optimize(spark, path)                           // v1
    }
    val v = DeltaLogWriter.appendStreamBatch(df(Seq(3L)), path, "appA", 0L)
    assert(v.contains(2L), s"stream batch should re-propose at v2, got $v")
    assert(deltaIds(path) == Set(1L, 2L, 3L))
    // exactly-once sentinel intact through the retry: the ledger holds
    // (appA, 0) and a replay of the same batch SKIPS
    assert(DeltaLogWriter.lastTxnVersion(spark, path, "appA").contains(0L))
    assert(DeltaLogWriter.appendStreamBatch(df(Seq(3L)), path, "appA", 0L).isEmpty)
    assert(deltaIds(path) == Set(1L, 2L, 3L))
  }

  test("Delta: a mid-race duplicate of the SAME stream batch skips, never double-lands") {
    val path = freshDir("occ_delta_streamdup")
    DeltaLogWriter.write(df(Seq(1L)), path)                          // v0
    // another instance of the SAME stream (same appId, same batch)
    // wins the race after this one staged its parts
    DeltaLogWriter.beforeCommitHook = () => {
      DeltaLogWriter.beforeCommitHook = () => ()
      assert(DeltaLogWriter.appendStreamBatch(
        df(Seq(5L)), path, "appB", 7L).contains(1L))
    }
    val v = DeltaLogWriter.appendStreamBatch(df(Seq(5L)), path, "appB", 7L)
    assert(v.isEmpty, s"duplicate batch must skip, got $v")
    assert(deltaIds(path) == Set(1L, 5L), "the batch landed exactly once")
    // a schema drift landing under the staged batch stays a TRUE conflict
    DeltaLogWriter.beforeCommitHook = () => {
      DeltaLogWriter.beforeCommitHook = () => ()
      DeltaLogWriter.enableColumnMapping(spark, path)  // rewrites schemaString
    }
    intercept[java.util.ConcurrentModificationException](
      DeltaLogWriter.appendStreamBatch(df(Seq(9L)), path, "appB", 8L))
  }

  test("Delta: schema drift under a staged append is a true conflict") {
    val path = freshDir("occ_delta_drift")
    DeltaLogWriter.appendOptimistic(df(Seq(1L)), path)
    DeltaLogWriter.beforeCommitHook = () => {
      DeltaLogWriter.beforeCommitHook = () => ()
      // the winner rewrites metaData with a DIFFERENT schema
      val drifted = Seq((1L, 1.5)).toDF("id", "score").schema.json
      val line =
        s"""{"metaData":{"id":"x","format":{"provider":"parquet","options":{}},""" +
          s""""schemaString":${com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
            .writeValueAsString(drifted)},"partitionColumns":[],"configuration":{},"createdTime":1}}"""
      val f = new java.io.File(path, "_delta_log/00000000000000000001.json")
      val w = new java.io.PrintWriter(f); w.println(line); w.close()
    }
    val e = intercept[java.util.ConcurrentModificationException](
      DeltaLogWriter.appendOptimistic(df(Seq(2L)), path))
    assert(e.getMessage.contains("schema"), e.getMessage)
  }

  test("Delta optimize: re-proposes past an add-only winner, refuses an overlapping rewrite") {
    val path = freshDir("occ_delta_opt")
    DeltaLogWriter.write(df(Seq(1L, 2L)).coalesce(1), path)
    DeltaLogWriter.write(df(Seq(3L, 4L)).coalesce(1), path)
    // disjoint: the winner only ADDS — the staged compaction re-proposes
    DeltaLogWriter.beforeCommitHook = () => {
      DeltaLogWriter.beforeCommitHook = () => ()
      DeltaLogWriter.write(df(Seq(10L)).coalesce(1), path)
    }
    val v = DeltaLogWriter.optimize(spark, path, numFiles = Some(1),
      optimistic = true)
    assert(v == 3L, s"expected re-proposal at v3, landed v$v")
    assert(deltaIds(path) == Set(1L, 2L, 3L, 4L, 10L))
    // overlapping: the winner DV-rewrites a file the compaction read
    DeltaLogWriter.beforeCommitHook = () => {
      DeltaLogWriter.beforeCommitHook = () => ()
      DeltaLogWriter.deleteWhere(spark, path, col("id") === 10L)
    }
    val e = intercept[java.util.ConcurrentModificationException](
      DeltaLogWriter.optimize(spark, path, numFiles = Some(1),
        optimistic = true))
    assert(e.getMessage.contains("true conflict"), e.getMessage)
    // the winner's delete survives; the refused rewrite changed nothing
    assert(deltaIds(path) == Set(1L, 2L, 3L, 4L))
  }

  test("Iceberg: two racing appenders both land — the retry carries the winner's manifests") {
    val base = freshDir("occ_ice")
    IcebergWriter.commitAppend(spark, base, df(Seq(1L, 2L)), 701L, 1000L)
    IcebergWriter.beforeSwapHook = () => {
      IcebergWriter.beforeSwapHook = () => ()
      IcebergWriter.commitAppend(spark, base, df(Seq(10L)), 702L, 2000L)
    }
    val v = IcebergWriter.commitAppendOptimistic(spark, base, df(Seq(20L)),
      703L, 3000L)
    assert(v == 3, s"loser should swap at v3, landed v$v")
    assert(Iceberg.read(spark, base).select("id").collect().map(_.getLong(0)).toSet
      == Set(1L, 2L, 10L, 20L))
    assert(Iceberg.snapshots(spark, base) ==
      Seq((701L, 1000L), (702L, 2000L), (703L, 3000L)))
    // incremental attribution survived the race: each snapshot owns its rows
    assert(Iceberg.readIncremental(spark, base, 702L, 703L)
      .select("id").collect().map(_.getLong(0)).toSet == Set(20L))
  }

  test("Iceberg: snapshot-id reuse and timestamp regression stay loud through the retry") {
    val base = freshDir("occ_ice_conflict")
    IcebergWriter.commitAppend(spark, base, df(Seq(1L)), 701L, 1000L)
    // the winner takes snapshot id 702 — the loser asked for the SAME id
    IcebergWriter.beforeSwapHook = () => {
      IcebergWriter.beforeSwapHook = () => ()
      IcebergWriter.commitAppend(spark, base, df(Seq(10L)), 702L, 2000L)
    }
    val e = intercept[IllegalArgumentException](
      IcebergWriter.commitAppendOptimistic(spark, base, df(Seq(20L)),
        702L, 3000L))
    assert(e.getMessage.contains("already exists"), e.getMessage)
    // the winner committed with ts 2000; a loser pinned EARLIER refuses
    IcebergWriter.beforeSwapHook = () => ()
    val e2 = intercept[IllegalArgumentException](
      IcebergWriter.commitAppendOptimistic(spark, base, df(Seq(20L)),
        703L, 1500L))
    assert(e2.getMessage.contains("monotonic"), e2.getMessage)
  }
}
