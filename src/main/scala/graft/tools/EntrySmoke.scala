package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only replica of the driver's entry smoke check (rows > 0). */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"[smoke] entry rows = $n")
    require(n > 0, "entry returned no rows")
    spark.stop()
  }
}
