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
    val tx = Tables.points(spark, "/root/testdata/sf0.001")
      .withColumnRenamed("user_id", "user")
    graft.pipeline.GeoFraudPipeline.run(spark, tx,
      epsilon = 150, minPts = 3, tilePrecision = 10, tileLayers = 1).anomalies
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.CoreQueries.queries ++
      graft.queries.PipelineQueries.queries ++
      graft.queries.ExtensionQueries.queries ++
      graft.queries.IndexQueries.queries ++
      graft.queries.InteropQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.CoreQueries.oracle ++
      graft.queries.PipelineQueries.oracle ++
      graft.queries.ExtensionQueries.oracle ++
      graft.queries.IndexQueries.oracle ++
      graft.queries.InteropQueries.oracle
}
