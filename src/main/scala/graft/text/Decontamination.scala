package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection — the decontamination pass every
  * serious pre-training pipeline runs before training: find training
  * documents that share n-token grams with a held-out evaluation set, so
  * eval leakage can be measured and the offending documents dropped
  * (the reference pipeline has no eval split; this is north-star breadth
  * alongside dedup/quality/mixture — GPT-3/PaLM-style n-gram overlap
  * decontamination).
  *
  * Semantics: a training document's contamination is the number of its
  * DISTINCT n-grams that appear anywhere in the eval set (per-doc
  * distinct, the [[graft.dedup.Dedup.capHotFingerprints]] row-count
  * convention). Documents shorter than n tokens carry no grams and are
  * absent from the output — they cannot be contaminated at this n.
  *
  * Scale shape: the eval side collapses to a DISTINCT 60-bit gram-hash
  * set and BROADCASTS — eval benchmarks are thousands of documents by
  * contract, so the set is MB-scale while the train side is the 100 TB
  * corpus; the train pass is ONE map-side HOF gram extraction (the
  * token array bound once as a lambda variable — the PLANS.md q188
  * rule) followed by a broadcast left join and a hash aggregate. No
  * shuffle ever carries the corpus gram stream to the eval side. */
object Decontamination {

  /** Distinct n-gram 60-bit hashes per row: input columns minus
    * `textCol`, plus one `gh` long per distinct gram (md5-derived — the
    * repo-wide hash every DuckDB oracle replays bit-for-bit). */
  def gramHashes(df: DataFrame, textCol: String, n: Int): DataFrame = {
    require(n >= 1, s"gram size must be >= 1, got $n")
    val grams = expr(
      s"""transform(array(filter(split(lower(`$textCol`), ' '), t -> t != '')), tkv ->
         |  CASE WHEN size(tkv) < $n THEN CAST(array() AS ARRAY<BIGINT>)
         |  ELSE array_distinct(transform(sequence(1, size(tkv) - ${n - 1}), i ->
         |    CAST(conv(substring(md5(CAST(concat_ws(' ', slice(tkv, i, $n)) AS BINARY)), 1, 15), 16, 10) AS BIGINT)))
         |  END)[0]""".stripMargin)
    df.withColumn("__ghs", grams).drop(textCol)
      .withColumn("gh", explode(col("__ghs"))).drop("__ghs")
  }

  /** Per-training-document contamination against `evalDocs`: the train
    * columns (minus `textCol`) plus `n_grams` (distinct n-grams in the
    * doc) and `n_contaminated` (how many of them appear in the eval
    * set). `evalDocs` needs only `textCol`; it must be the SMALL side —
    * its distinct gram set is broadcast. */
  def contamination(train: DataFrame, evalDocs: DataFrame,
                    textCol: String = "text", n: Int = 8): DataFrame = {
    val eg = gramHashes(evalDocs.select(col(textCol)), textCol, n)
      .select(col("gh")).distinct()
      .withColumn("__hit", lit(1))
    val keys = train.columns.filterNot(_ == textCol).map(col)
    require(keys.nonEmpty,
      "contamination needs at least one non-text key column on the train side")
    gramHashes(train, textCol, n)
      .join(broadcast(eg), Seq("gh"), "left_outer")
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__hit").isNotNull, 1L).otherwise(0L)).as("n_contaminated"))
  }
}
