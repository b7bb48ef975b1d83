package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger

/** EXACTLY-ONCE streaming INTO Delta — the protocol's own `txn`-action
  * idempotence: every sink batch commits its adds together with
  * `{"txn": {appId, version}}`, a replayed batch skips, and checkpoints
  * carry the ledger forward so cleanLog never forgets a writer's
  * position. Closes the streaming matrix's by-name WRITE side
  * (read side = q278). */
class DeltaStreamSinkSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("dsink").toString

  private val provider =
    classOf[org.apache.spark.sql.graft.GraftTableStreamProvider].getName

  private def freshCatalog(): (String, FileRegistryCatalog) = {
    val name = "sk" + java.util.UUID.randomUUID().toString.take(8)
    val reg = freshDir() + "/registry.json"
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.registry", reg)
    (name, new FileRegistryCatalog(spark, reg))
  }

  test("table-to-table streaming: by-name source into the txn sink, exactly-once across drains") {
    val (cat, reg) = freshCatalog()
    val src = freshDir() + "/src"
    val dst = freshDir() + "/dst"
    DeltaLogWriter.write(Seq((1L, "a"), (2L, "b")).toDF("id", "k").coalesce(1), src)
    DeltaLogWriter.write(spark.emptyDataset[(Long, String)].toDF("id", "k"), dst)
    reg.register("ns.src", src)
    val ckpt = freshDir() + "/ckpt"
    def drainOnce(): Unit = {
      val q = spark.readStream.table(s"$cat.ns.src").writeStream
        .format(provider)
        .option("path", dst).option("format", "delta")
        .option("txnAppId", "sink-spec-app")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000L)
    }
    drainOnce()
    assert(DeltaLogReader.read(spark, dst).select("id").as[Long].collect().toSet ==
      Set(1L, 2L))
    drainOnce() // nothing new: no rows, no duplicate
    assert(DeltaLogReader.read(spark, dst).count() == 2L)
    DeltaLogWriter.appendOptimistic(Seq((3L, "c")).toDF("id", "k").coalesce(1), src)
    drainOnce()
    assert(DeltaLogReader.read(spark, dst).select("id").as[Long].collect().toSet ==
      Set(1L, 2L, 3L), "only the new commit lands")
  }

  test("a replayed batch (same appId + version) SKIPS — the txn ledger") {
    val dst = freshDir() + "/dst"
    DeltaLogWriter.write(Seq((0L, "seed")).toDF("id", "k").coalesce(1), dst)
    val b = Seq((1L, "x")).toDF("id", "k").coalesce(1)
    assert(DeltaLogWriter.appendStreamBatch(b, dst, "app1", 0L).isDefined)
    assert(DeltaLogWriter.appendStreamBatch(b, dst, "app1", 0L).isEmpty,
      "the replay must skip")
    assert(DeltaLogReader.read(spark, dst).count() == 2L)
    // an OLDER version also skips; a NEWER one lands; a DIFFERENT app lands
    assert(DeltaLogWriter.appendStreamBatch(b, dst, "app1", -1L).isEmpty)
    assert(DeltaLogWriter.appendStreamBatch(b, dst, "app1", 1L).isDefined)
    assert(DeltaLogWriter.appendStreamBatch(b, dst, "app2", 0L).isDefined)
    assert(DeltaLogReader.read(spark, dst).count() == 4L)
  }

  test("checkpoint + cleanLog carry the txn ledger — the writer's position survives pruning") {
    val dst = freshDir() + "/dst"
    DeltaLogWriter.write(Seq((0L, "seed")).toDF("id", "k").coalesce(1), dst)
    val b = Seq((1L, "x")).toDF("id", "k").coalesce(1)
    DeltaLogWriter.appendStreamBatch(b, dst, "appX", 7L)
    DeltaLogWriter.checkpoint(spark, dst)
    DeltaLogWriter.cleanLog(spark, dst)
    assert(DeltaLogReader.versions(spark, dst).isEmpty ||
      DeltaLogReader.versions(spark, dst).head > 0L,
      "cleanLog pruned the early commits")
    assert(DeltaLogWriter.lastTxnVersion(spark, dst, "appX").contains(7L),
      "the checkpoint carries the ledger")
    assert(DeltaLogWriter.appendStreamBatch(b, dst, "appX", 7L).isEmpty,
      "a replay after pruning still skips")
    assert(DeltaLogReader.read(spark, dst).count() == 2L)
  }

  test("a txn-less LEGACY checkpoint + pruned commits refuses the ledger; resetTxnLedger is the explicit way out") {
    val dst = freshDir() + "/dst"
    DeltaLogWriter.write(Seq((0L, "seed")).toDF("id", "k").coalesce(1), dst)
    DeltaLogWriter.appendStreamBatch(
      Seq((1L, "x")).toDF("id", "k").coalesce(1), dst, "appL", 3L)
    DeltaLogWriter.checkpoint(spark, dst)
    // forge the legacy state: rewrite the checkpoint parquet WITHOUT its
    // txn column (exactly what pre-carry checkpoints looked like)
    val ckptFile = new java.io.File(dst, "_delta_log/" + f"${1L}%020d.checkpoint.parquet")
    assert(ckptFile.exists(), "single-part checkpoint expected")
    val legacy = spark.read.parquet(ckptFile.toString).drop("txn")
    val tmp = freshDir() + "/legacy_ckpt"
    legacy.coalesce(1).write.parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath, ckptFile.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // the local-FS checksum sidecar still describes the ORIGINAL bytes
    new java.io.File(ckptFile.getParent, s".${ckptFile.getName}.crc").delete()
    DeltaLogWriter.cleanLog(spark, dst)
    assert(DeltaLogReader.versions(spark, dst).headOption.forall(_ > 0L))
    // the ledger is unrecoverable — every consumer refuses loudly
    val b2 = Seq((2L, "y")).toDF("id", "k").coalesce(1)
    val e = intercept[IllegalArgumentException](
      DeltaLogWriter.appendStreamBatch(b2, dst, "appL", 3L))
    assert(e.getMessage.contains("resetTxnLedger"), e.getMessage)
    intercept[IllegalArgumentException](
      DeltaLogWriter.lastTxnVersion(spark, dst, "appL"))
    intercept[IllegalArgumentException](DeltaLogWriter.checkpoint(spark, dst))
    // the explicit acknowledgment starts a fresh ledger and unblocks
    DeltaLogWriter.checkpoint(spark, dst, resetTxnLedger = true)
    assert(DeltaLogWriter.lastTxnVersion(spark, dst, "appL").isEmpty)
    assert(DeltaLogWriter.appendStreamBatch(b2, dst, "appL", 4L).nonEmpty)
    assert(DeltaLogReader.read(spark, dst).count() == 3L)
  }

  test("sink refusals: Iceberg format, missing appId, non-append modes") {
    val p = new org.apache.spark.sql.graft.GraftTableStreamProvider
    val sqlc = spark.sqlContext
    val e1 = intercept[IllegalArgumentException](p.createSink(sqlc,
      Map("path" -> "/tmp/x", "format" -> "iceberg"), Nil,
      org.apache.spark.sql.streaming.OutputMode.Append()))
    assert(e1.getMessage.contains("foreachBatch"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](p.createSink(sqlc,
      Map("path" -> "/tmp/x", "format" -> "delta"), Nil,
      org.apache.spark.sql.streaming.OutputMode.Append()))
    assert(e2.getMessage.contains("txnAppId"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException](p.createSink(sqlc,
      Map("path" -> "/tmp/x", "format" -> "delta", "txnAppId" -> "a"), Nil,
      org.apache.spark.sql.streaming.OutputMode.Complete()))
    assert(e3.getMessage.contains("append"), e3.getMessage)
  }
}
