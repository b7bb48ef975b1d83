package graft.tracking

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Named, versioned model store + model-as-function loader — the engine's
  * answer to the reference's MLflow registry serving path
  * (`02_geofraud_fraud.py:248-264`: load a REGISTERED model by name, call
  * it as a function over a DataFrame). The reference's pyfunc wrapper is
  * Python infrastructure; the engine-expressible data model is: every
  * servable model here is a SMALL WEIGHT TABLE plus a kind/params sidecar,
  * and "calling the model" is the broadcast map-side transform the kind
  * prescribes. `QualityClassifier` (persisted logistic weights) and
  * `AnnIndexStore` (persisted centroids) are two prior instances of the
  * pattern; this unifies the save/load/apply contract under names and
  * immutable versions.
  *
  * Layout (the MLflow artifact-dir shape):
  * `{root}/{name}/v{N}/data` (weights table parquet)
  * and `{root}/{name}/v{N}/MLmodel` — `k=v` lines carrying `kind` plus
  * caller params. Versions are immutable facts: `register` publishes
  * `v{latest+1}` via write-to-temp + atomic rename (the SnapshotLog
  * pattern), so a concurrent publish loses the rename race cleanly and a
  * reader never observes a half-written version.
  *
  * Scale shape: weight tables are KB-scale dimension data next to 100 TB
  * facts. `applyModel` broadcasts them — the scoring pass is a pure
  * map-side projection inside whole-stage codegen, and it is the only
  * pass that touches every row. */
object ModelRegistry {

  /** The one kind wired so far: a linear model replayed as an explicit
    * left-to-right multiply-add over caller-provided feature columns
    * (bit-exact across engines — the `QualityClassifier.logit`
    * discipline). Sidecar params: `featmap` = ordered
    * `featureCol=weightCol` pairs, comma-separated. */
  val KindLinearLogit = "linear_logit"

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def modelDir(root: String, name: String) = new Path(root, name)

  /** Published versions of `name`, ascending (empty if never registered). */
  def versions(spark: SparkSession, root: String, name: String): Seq[Int] = {
    val dir = modelDir(root, name)
    val f = fs(spark, dir)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).map(_.getPath.getName)
      .collect { case n if n.matches("v\\d+") => n.drop(1).toInt }
      .sorted.toSeq
  }

  /** Publish `weights` as the next version of `name`. Returns the version. */
  def register(spark: SparkSession, root: String, name: String, kind: String,
               weights: DataFrame, params: Map[String, String] = Map.empty): Int = {
    require(!params.contains("kind"), "'kind' is the registry's key")
    require((params.keySet + kind).forall(s => !s.contains("\n") && !s.contains("=")) &&
      params.values.forall(!_.contains("\n")),
      "params must be newline-free and keys '='-free (k=v sidecar lines)")
    val v = versions(spark, root, name).lastOption.getOrElse(0) + 1
    // unique attempt id: two racing register() calls must not SHARE a
    // staging dir (one's delete/writes would interleave with the other's,
    // and the rename winner could publish mixed data + sidecar); with
    // distinct staging the loser's rename fails loudly instead
    val tmp = new Path(modelDir(root, name),
      s".tmp_v${v}_${java.util.UUID.randomUUID().toString.take(8)}")
    val dst = new Path(modelDir(root, name), s"v$v")
    val f = fs(spark, dst)
    f.delete(tmp, true)
    weights.coalesce(1).write.parquet(new Path(tmp, "data").toString)
    val lines = (Map("kind" -> kind) ++ params).toSeq.sortBy(_._1)
      .map { case (k, vv) => s"$k=$vv" }.mkString("", "\n", "\n")
    val out = f.create(new Path(tmp, "MLmodel"), true)
    try out.write(lines.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    require(f.rename(tmp, dst),
      s"concurrent register detected publishing $name v$v")
    v
  }

  /** Load `name` at `version` (default: latest):
    * (version, kind, params, weights). */
  def load(spark: SparkSession, root: String, name: String,
           version: Option[Int] = None): (Int, String, Map[String, String], DataFrame) = {
    val vs = versions(spark, root, name)
    require(vs.nonEmpty, s"model '$name' has no registered versions under $root")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v), s"model '$name' has no version $v (published: $vs)")
    val base = new Path(modelDir(root, name), s"v$v")
    val mf = new Path(base, "MLmodel")
    val f = fs(spark, mf)
    val buf = new Array[Byte](f.getFileStatus(mf).getLen.toInt)
    val in = f.open(mf)
    try in.readFully(buf) finally in.close()
    val kv = new String(buf, java.nio.charset.StandardCharsets.UTF_8)
      .split("\n").filter(_.nonEmpty)
      .map { line =>
        val i = line.indexOf('=')
        // a '='-less line would otherwise parse silently as key=rest-of-line
        // (indexOf = -1); fail in the registry's loud style instead
        require(i >= 0,
          s"model '$name' v$v: malformed MLmodel sidecar line '$line' at $mf " +
            "(expected key=value)")
        line.take(i) -> line.drop(i + 1)
      }.toMap
    require(kv.contains("kind"),
      s"model '$name' v$v: MLmodel sidecar at $mf lacks the required 'kind' " +
        s"line (found keys: ${kv.keys.toSeq.sorted.mkString(", ")})")
    val weights = spark.read.parquet(new Path(base, "data").toString)
    (v, kv("kind"), kv - "kind", weights)
  }

  /** The model AS A FUNCTION: load `name` (latest unless pinned) and apply
    * the transform its kind prescribes to `df`. For [[KindLinearLogit]]:
    * `df` carries `idCol` + the sidecar's feature columns; the result is
    * `(idCol, model_version, logit_key, keep)` with the µ-scaled integer
    * logit — weights ride a broadcast 1-row cross join, so the pass stays
    * map-side at any corpus size. */
  def applyModel(spark: SparkSession, root: String, name: String, df: DataFrame,
                 idCol: String, version: Option[Int] = None): DataFrame = {
    val (v, kind, params, weights) = load(spark, root, name, version)
    kind match {
      case KindLinearLogit =>
        val featMap = params.getOrElse("featmap",
            sys.error(s"$name v$v: linear_logit requires a 'featmap' param"))
          .split(",").toSeq.map { pair =>
            val Array(feat, w) = pair.split("="): @unchecked
            (feat, w)
          }
        val logit = graft.text.QualityClassifier.logit(col("intercept"),
          featMap.map { case (_, w) => col(w) },
          featMap.map { case (feat, _) => col(feat) })
        df.crossJoin(broadcast(weights))
          .withColumn("logit_key", round(logit * 1e6).cast("long"))
          .select(col(idCol), lit(v.toLong).as("model_version"),
            col("logit_key"),
            when(col("logit_key") > 0, 1L).otherwise(0L).as("keep"))
      case other =>
        throw new IllegalArgumentException(
          s"model '$name' v$v has unsupported kind '$other'")
    }
  }

  /** Convenience column set for [[KindLinearLogit]] registration from
    * [[graft.text.QualityClassifier]] weights: its feature names map to
    * `w_<suffix>` weight columns. */
  def qualityFeatmap: String =
    graft.text.QualityClassifier.FeatureNames
      .map(f => s"$f=w_${f.stripPrefix("f_")}").mkString(",")
}
