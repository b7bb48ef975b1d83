package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming measurement harness (guide §1): runs the named stream queries
  * with a StreamingQueryListener attached and prints every micro-batch's
  * durationMs breakdown (triggerExecution / getBatch / addBatch / walCommit
  * / commitOffsets / queryPlanning) plus state-store metrics — the
  * attribution the bench's wall seconds can't give. Dev tool only. */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).getOrElse("q163_stream_left_join").split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
        println(s"[sprof] started ${e.name} at ${System.nanoTime() / 1000000} ms")
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val dur = p.durationMs
        println(s"[sprof] batch ${p.batchId} rows=${p.numInputRows} " +
          s"durations=$dur stateOps=${p.stateOperators.length}")
        p.stateOperators.foreach { so =>
          println(s"[sprof]   state op ${so.operatorName}: commitMs=${so.commitTimeMs} " +
            s"rowsTotal=${so.numRowsTotal} updated=${so.numRowsUpdated} " +
            s"memUsed=${so.memoryUsedBytes}")
        }
      }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        println(s"[sprof] terminated at ${System.nanoTime() / 1000000} ms")
    }
    spark.streams.addListener(listener)

    // pre-stage + warm the streaming engine once so the first measured
    // query isn't charged for JIT (mirrors the bench warm phase)
    graft.queries.StreamScaffold.stageTable(spark, sfDir, "events")
    graft.queries.StreamScaffold.stageTable(spark, sfDir, "documents")
    graft.queries.StreamScaffold.runFileStream(spark, "warm", sfDir,
      spark.range(100).selectExpr("id", "id * 1000000000 AS ts")) { mk =>
      mk().selectExpr("id", "timestamp_micros(ts DIV 1000) AS ets")
        .withWatermark("ets", "10 seconds").dropDuplicatesWithinWatermark("id")
    }.count()

    names.foreach { name =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[sprof] ===== $name total ${(System.nanoTime() - t0) / 1e9}%.3f s =====")
    }
    spark.stop()
  }
}
