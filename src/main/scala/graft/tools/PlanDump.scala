package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import java.nio.file.{Files, Paths}

/** Dumps `explain("formatted")` for a named list of queries, one file per
  * query — the optimization-round evidence artifact (`plans/r19/<q>_<suffix>.txt`).
  *
  * Args: <sfDir> <outDir> <suffix> <q1,q2,...>
  *
  * Unlike `graft.Explain` (one markdown for the headline set), this writes a
  * plan file PER query so a before/after diff is a plain file diff. Session
  * shape mirrors Bench (shuffle partitions = cpus, graft extensions) so the
  * dumped plan is the one the bench actually runs. NOTE: queries with
  * internal actions (persisted-leg writes) execute those while the frame is
  * built; the dump captures the RETURNED frame's plan.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = args(3).split(",").map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name'"))
      val df = fn(spark, sfDir)
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), plan)
      println(s"wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
