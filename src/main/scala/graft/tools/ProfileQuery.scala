package graft.tools

import org.apache.spark.sql.SparkSession

/** Parameterized dev profiler — the one harness that replaced the old
  * per-query ProfileQ118/ProfileQ135 one-offs: for each query name
  * passed as an argument (any `SparkEntry.queries` key), dump the
  * optimized logical + formatted physical plan and time N executed
  * laps. Env: `SPARK_GRAFT_SF_DIR` (default sf0.01),
  * `SPARK_GRAFT_CPUS` (default 8), `SPARK_GRAFT_PROFILE_REPS`
  * (default 2 — lap 1 is the JIT warm, read lap 2+).
  *
  * Usage: `sbt 'runMain graft.tools.ProfileQuery q118_lateral q16_tfidf'` */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "pass one or more SparkEntry.queries names, e.g. q118_lateral")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROFILE_REPS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect() // scheduler/JIT warm
    val unknown = args.filterNot(graft.SparkEntry.queries.contains)
    require(unknown.isEmpty,
      s"unknown query name(s): ${unknown.mkString(", ")}")
    args.foreach { name =>
      println(s"\n======== $name @ $sfDir ========")
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      println("=== optimized logical ===")
      println(df.queryExecution.optimizedPlan.treeString)
      println("=== formatted physical ===")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      (1 to reps).foreach { rep =>
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
        println(f"[prof] $name lap $rep: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
    }
    spark.stop()
  }
}
