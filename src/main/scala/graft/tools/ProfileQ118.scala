package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only plan dump for q118's decorrelated LATERAL. */
object ProfileQ118 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.queries.ExtensionQueries.queries("q118_lateral")(spark, sfDir)
    println("=== optimized logical ===")
    println(df.queryExecution.optimizedPlan.treeString)
    println("=== formatted physical ===")
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
