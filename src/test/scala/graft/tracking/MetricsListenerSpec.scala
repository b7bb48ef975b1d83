package graft.tracking

import graft.SparkSpec

class MetricsListenerSpec extends SparkSpec {

  test("listener records duration, rows, and scan count for completed actions") {
    import spark.implicits._
    val ml = new MetricsListener
    spark.listenerManager.register(ml)
    try {
      val dir = java.nio.file.Files.createTempDirectory("mls").toString
      (1 to 100).toDF("x").write.mode("overwrite").parquet(dir)
      spark.read.parquet(dir).filter($"x" > 50).collect()
      // an aggregation forces an exchange, so AQE wraps the plan in
      // AdaptiveSparkPlanExec — the scan must still be counted through it
      spark.read.parquet(dir).groupBy($"x" % 10).count().count()
      // listener callbacks are async, and the SHARED session means other
      // suites' concurrent actions also land here — poll until OUR scans'
      // records (two file-scan actions) arrive, not merely until non-empty
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (ml.snapshot().count(_.nFileScans >= 1) < 2 && System.nanoTime() < deadline)
        Thread.sleep(50)
      val recs = ml.snapshot()
      assert(recs.count(_.nFileScans >= 1) >= 2, recs.mkString("; "))
      assert(recs.forall(r => r.durationNs > 0 || r.funcName.endsWith("!failed")))
    } finally spark.listenerManager.unregister(ml)
  }
}
