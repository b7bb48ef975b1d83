package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based document quality filtering — the fasttext-classifier stage
  * of a pretraining pipeline (score every document with a tiny linear
  * model, keep the high-scoring slice). Spark-first shape: the FIT is a
  * few distributed passes over assembled features (MLlib logistic
  * regression); SCORING is a pure map-side projection against the
  * persisted weights — at 100 TB only the scoring pass touches every row,
  * and it is four multiply-adds per document inside whole-stage codegen.
  *
  * Cross-engine exactness: the learned weights are persisted to parquet
  * and BOTH engines replay the same explicit left-to-right multiply-add
  * over integer-derived feature doubles — identical IEEE operation order,
  * so the µ-scaled logit key matches bit-for-bit (the q130/q39 float
  * discipline; no exp/sigmoid crosses the engine boundary). */
object QualityClassifier {

  /** Feature names, in model/replay order. */
  val FeatureNames: Seq[String] = Seq("f_chars", "f_toks", "f_stop", "f_digit")

  /** The four integer-derived features as (name, column): total chars,
    * whitespace tokens, English stopword hits, digit chars. Each is a
    * closed-form count — deterministic and mirrored 1:1 in DuckDB SQL. */
  def features(text: Column, nChars: Column): Seq[(String, Column)] = Seq(
    "f_chars" -> nChars.cast("double"),
    "f_toks" -> TextFunctions.tokenCount(text).cast("double"),
    "f_stop" -> TextFunctions.stopwordHits(
      TextFunctions.tokens(lower(text)), TextFunctions.EnStop).cast("double"),
    "f_digit" -> length(regexp_replace(text, "[^0-9]", "")).cast("double"))

  /** DuckDB spellings of [[features]], same order. */
  def featuresSql: Seq[(String, String)] = Seq(
    "f_chars" -> "CAST(n_chars AS DOUBLE)",
    "f_toks" -> "CAST(len(list_filter(string_split(text, ' '), t -> t != '')) AS DOUBLE)",
    "f_stop" -> ("CAST(len(list_filter(string_split(lower(text), ' '), t -> t IN (" +
      TextFunctions.EnStop.map(w => s"'$w'").mkString(", ") + "))) AS DOUBLE)"),
    "f_digit" -> "CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)")

  /** Fit a logistic model of quality on weak labels (`labelCol` ∈ {0, 1})
    * over the [[features]] columns. Returns one weights row as a DataFrame
    * — `(intercept, w_chars, w_toks, w_stop, w_digit)` — ready to persist
    * next to the scored output. */
  def fitWeights(docs: DataFrame, labelCol: Column): DataFrame = {
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.feature.VectorAssembler
    val spark = docs.sparkSession
    val fcols = features(col("text"), col("n_chars"))
    val train = docs.select(labelCol.cast("double").as("label") +:
      fcols.map { case (n, c) => c.as(n) }: _*)
    val assembled = new VectorAssembler()
      .setInputCols(FeatureNames.toArray).setOutputCol("features")
      .transform(train)
    val m = new LogisticRegression()
      .setMaxIter(25).setRegParam(0.01).setStandardization(true)
      .fit(assembled)
    val w = m.coefficients.toArray
    import spark.implicits._
    Seq((m.intercept, w(0), w(1), w(2), w(3)))
      .toDF("intercept", "w_chars", "w_toks", "w_stop", "w_digit")
  }

  /** The replayed linear score: intercept + Σ wᵢ·fᵢ, folded STRICTLY
    * left-to-right so the double-addition order is pinned — the oracle SQL
    * writes the same chain and lands on the same bits. */
  def logit(intercept: Column, weights: Seq[Column], feats: Seq[Column]): Column = {
    require(weights.length == feats.length, "logit: weight/feature arity mismatch")
    weights.zip(feats).foldLeft(intercept) { case (acc, (w, f)) => acc + w * f }
  }
}
