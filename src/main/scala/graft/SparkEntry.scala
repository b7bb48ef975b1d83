package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GeoFunctions

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query (SURVEY §3.3, `02_geofraud_fraud.py:62-68`): anomaly
    * extraction — points anti-joined against the known-tiles table — on
    * sf0.001-derived points. Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.001"
    val pts = Tables.points(spark, sfDir)
      .withColumn("cell", GeoFunctions.geoCell($"latitude", $"longitude", 10))
    // known tiles = cells each user visits more than once; anomalies = the rest
    val tiles = pts.groupBy($"user_id", $"cell").agg(count(lit(1)).as("visits"))
      .filter($"visits" > 1).select($"user_id", $"cell")
    pts.join(tiles, Seq("user_id", "cell"), "left_anti")
      .select($"user_id", $"latitude", $"longitude", $"amount")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.CoreQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.CoreQueries.oracle
}
