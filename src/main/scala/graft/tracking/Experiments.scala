package graft.tracking

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MLflow-style experiment tracking as a Spark-native parquet store.
  *
  * The reference logs every fit to MLflow — params, metrics and the model
  * artifact per run (`01_geofraud_clustering.py:120-149`), then loads the
  * registered model back for serving (`02_geofraud_fraud.py:220-264`). The
  * tracking *server* is infrastructure outside an engine's scope, but the
  * tracking *data model* — named runs carrying params/metrics/tags, queryable
  * and comparable — is engine-expressible: one long-format parquet table.
  *
  * Layout: `{root}/runs` with columns
  * `(experiment, run_name, kind ∈ param|metric|tag, key, value_str,
  * value_num)` — params/tags carry `value_str`, metrics carry `value_num`.
  * Each `logRun` is one append-mode parquet write (runs are immutable facts;
  * re-logging a run name is a new fact, latest-wins is a reader policy).
  *
  * Scale: the store is a metadata dimension — thousands of runs of dozens of
  * entries, KBs next to the 100 TB fact tables. Plain scans with pushed
  * filters serve every query; no driver-side state anywhere. */
final class ExperimentStore(spark: SparkSession, root: String) {

  private def runsPath = s"$root/runs"

  /** Append one run's params + metrics (+ optional tags) to the store. */
  def logRun(experiment: String, runName: String,
             params: Map[String, String],
             metrics: Map[String, Double],
             tags: Map[String, String] = Map.empty): Unit = {
    import spark.implicits._
    val rows =
      params.toSeq.map { case (k, v) =>
        (experiment, runName, "param", k, Option(v), Option.empty[Double]) } ++
      metrics.toSeq.map { case (k, v) =>
        (experiment, runName, "metric", k, Option.empty[String], Option(v)) } ++
      tags.toSeq.map { case (k, v) =>
        (experiment, runName, "tag", k, Option(v), Option.empty[Double]) }
    rows.toDF("experiment", "run_name", "kind", "key", "value_str", "value_num")
      .coalesce(1).write.mode("append").parquet(runsPath)
  }

  /** All logged entries, long format. */
  def runs(): DataFrame = spark.read.parquet(runsPath)

  /** One row per run of `experiment`, with the requested params and metrics
    * pivoted to columns (the `mlflow.search_runs` shape). */
  def searchRuns(experiment: String, paramKeys: Seq[String],
                 metricKeys: Seq[String]): DataFrame = {
    require(paramKeys.nonEmpty || metricKeys.nonEmpty,
      "searchRuns needs at least one param or metric key to pivot")
    val aggs =
      paramKeys.map(k => max(when(col("kind") === "param" && col("key") === k,
        col("value_str"))).as(k)) ++
      metricKeys.map(k => max(when(col("kind") === "metric" && col("key") === k,
        col("value_num"))).as(k))
    runs().where(col("experiment") === experiment)
      .groupBy(col("run_name"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** The run of `experiment` with the extreme value of `metric`. */
  def bestRun(experiment: String, metric: String,
              maximize: Boolean = true): DataFrame = {
    val m = runs().where(col("experiment") === experiment &&
      col("kind") === "metric" && col("key") === metric)
    val best = if (maximize) max(col("value_num")) else min(col("value_num"))
    m.groupBy(col("experiment")).agg(best.as("best"))
      .join(m, Seq("experiment"))
      .where(col("value_num") === col("best"))
      .select(col("experiment"), col("run_name"), col("key"), col("value_num"))
  }

  /** Drop the store (fresh-start semantics for deterministic replays). */
  def reset(): Unit = {
    val p = new org.apache.hadoop.fs.Path(root)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }
}
