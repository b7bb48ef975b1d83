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
  * set, which is MEASURED (materialized once with an eager
  * localCheckpoint, then counted) and then either BROADCAST — the fast
  * path when eval benchmarks are the contractual thousands of documents —
  * or met through an ordinary shuffled equi-join when the measured set
  * would blow the broadcast budget (the [[graft.score.Blooms.scoreAuto]]
  * measured-cutover convention: an oversized eval set must become a slow
  * shuffle, never a driver/executor OOM). The train pass is ONE map-side
  * HOF gram extraction (the token array bound once as a lambda variable —
  * the PLANS.md q188 rule) followed by the join and a hash aggregate;
  * the corpus gram stream never shuffles on the broadcast path. */
object Decontamination {

  /** Column names [[contamination]] materializes internally or in its
    * output — a train frame already carrying one would be silently
    * mis-grouped or ambiguous, so it is refused up front. */
  private val ReservedColumns = Seq("gh", "__ghs", "__hit", "n_grams", "n_contaminated")

  /** Default broadcast budget for the eval gram set — matches Spark's own
    * `autoBroadcastJoinThreshold` default (10 MB, the
    * [[graft.score.Blooms.DefaultBroadcastBudgetBytes]] convention): the
    * hashed gram set rides the same executor-memory path a broadcast
    * join's relation does. */
  val DefaultBroadcastBudgetBytes: Long = 10L * 1024 * 1024

  /** Conservative in-memory footprint of one distinct gram hash inside a
    * broadcast hashed relation (8-byte long key + row + table slot). */
  val BytesPerBroadcastGram: Long = 32L

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
    // select-spelling, not withColumn-then-drop: the text column is
    // excluded in the SAME projection that introduces `__ghs`, so a text
    // column itself named `__ghs` or `gh` cannot collide with the
    // internals (withColumn would have silently replaced it, then drop
    // would have deleted the gram array)
    df.select(df.columns.filterNot(_ == textCol).map(col) :+ grams.as("__ghs"): _*)
      .withColumn("gh", explode(col("__ghs"))).drop("__ghs")
  }

  /** The distinct n-gram hash set of `evalDocs` — one `gh` column — NOT
    * yet materialized: callers that score several corpora against the
    * same benchmark (q230 measurement + q233 removal) persist this frame
    * once (the session-cache convention) and pass it to the `FromGrams`
    * variants; [[contamination]] checkpoints it per call. */
  def evalGrams(evalDocs: DataFrame, textCol: String = "text", n: Int = 8): DataFrame =
    gramHashes(evalDocs.select(col(textCol)), textCol, n)
      .select(col("gh")).distinct()

  /** EAGER: runs Spark jobs at construction time (the eval side is
    * materialized with a localCheckpoint and counted before the returned
    * frame exists) — the price of the measured broadcast-vs-shuffle
    * cutover; callers wiring plans speculatively should build the pieces
    * themselves from [[evalGrams]] + [[contaminationFromGrams]].
    *
    * Per-training-document contamination against `evalDocs`: the train
    * columns (minus `textCol`) plus `n_grams` (distinct n-grams in the
    * doc) and `n_contaminated` (how many of them appear in the eval
    * set). `evalDocs` needs only `textCol`. The eval gram set is
    * materialized and counted first; it is broadcast only when
    * `count * BytesPerBroadcastGram <= broadcastBudgetBytes`, else the
    * join runs as a plain shuffled equi-join (slower, never an OOM).
    * The returned frame's lineage includes the checkpointed gram set —
    * fine for a planning-scale artifact that was measured to be finite
    * either way. */
  def contamination(train: DataFrame, evalDocs: DataFrame,
                    textCol: String = "text", n: Int = 8,
                    broadcastBudgetBytes: Long = DefaultBroadcastBudgetBytes): DataFrame =
    // the checkpoint materializes the distinct gram set once, so the
    // count and the join both read the materialized blocks (the q225
    // materialize-once pattern)
    contaminationFromGrams(train,
      evalGrams(evalDocs, textCol, n).localCheckpoint(true),
      textCol, n, broadcastBudgetBytes)

  /** The measured broadcast-vs-shuffle choice for a MATERIALIZED eval
    * gram frame, as a join side tagged `(gh, __hit = 1)`: counts the set
    * (cheap on a persisted/checkpointed frame) and broadcasts only under
    * the budget, else forces the sort-merge spelling — the materialized
    * leaf KEEPS the origin plan's stats, so without the hint Spark could
    * still auto-broadcast right up to the OOM this guard exists to
    * prevent. Shared by the batch joins below and the streaming
    * contamination monitor (q235), whose static side is exactly this. */
  def measuredEvalSide(evalGramSet: DataFrame,
                       broadcastBudgetBytes: Long = DefaultBroadcastBudgetBytes): DataFrame = {
    val eg = evalGramSet.select(col("gh")).withColumn("__hit", lit(1))
    val nEvalGrams = eg.count()
    if (nEvalGrams * BytesPerBroadcastGram <= broadcastBudgetBytes) broadcast(eg)
    else eg.hint("merge")
  }

  /** [[contamination]] against a caller-MATERIALIZED eval gram frame
    * (one `gh` column, distinct, persisted or checkpointed — the count
    * below re-reads it, so an unmaterialized frame pays its build twice).
    * This is the shared-benchmark path: one eval set, many corpora. */
  def contaminationFromGrams(train: DataFrame, evalGramSet: DataFrame,
                             textCol: String = "text", n: Int = 8,
                             broadcastBudgetBytes: Long = DefaultBroadcastBudgetBytes): DataFrame = {
    // the text column is excluded in the same projection that introduces
    // the internals (gramHashes' select-spelling), so only the SURVIVING
    // key columns can clash (ADVICE r11: a train frame whose text column
    // is itself named e.g. `gh` is legal)
    val clash = train.columns.filterNot(_ == textCol)
      .toSet.intersect(ReservedColumns.toSet)
    require(clash.isEmpty,
      s"contamination reserves column name(s) ${clash.toSeq.sorted.mkString(", ")} " +
        "for its internal gram join and its output — rename them on the " +
        s"train side (reserved: ${ReservedColumns.mkString(", ")})")
    val keys = train.columns.filterNot(_ == textCol).map(col)
    require(keys.nonEmpty,
      "contamination needs at least one non-text key column on the train side")
    val evalSide = measuredEvalSide(evalGramSet, broadcastBudgetBytes)
    gramHashes(train, textCol, n)
      .join(evalSide, Seq("gh"), "left_outer")
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__hit").isNotNull, 1L).otherwise(0L)).as("n_contaminated"))
  }

  /** Removal, not just measurement: drop every training document whose
    * contamination exceeds `maxContaminated` shared grams, returning the
    * cleaned corpus with `train`'s exact columns (text included).
    * Documents shorter than n tokens carry no grams and are always kept.
    * The contaminated key set is anti-joined back null-safely (`<=>`), so
    * a null-keyed contaminated document is still dropped. Cleaning to
    * `maxContaminated = 0` re-scores to zero contamination at the same n
    * (DecontaminationSpec law). */
  def decontaminate(train: DataFrame, evalDocs: DataFrame,
                    textCol: String = "text", n: Int = 8,
                    maxContaminated: Long = 0L,
                    broadcastBudgetBytes: Long = DefaultBroadcastBudgetBytes): DataFrame =
    decontaminateFromGrams(train,
      evalGrams(evalDocs, textCol, n).localCheckpoint(true),
      textCol, n, maxContaminated, broadcastBudgetBytes)

  /** [[decontaminate]] against a caller-MATERIALIZED eval gram frame —
    * the [[contaminationFromGrams]] contract; lets the measurement query
    * and the removal query share one staged benchmark gram set. */
  def decontaminateFromGrams(train: DataFrame, evalGramSet: DataFrame,
                             textCol: String = "text", n: Int = 8,
                             maxContaminated: Long = 0L,
                             broadcastBudgetBytes: Long = DefaultBroadcastBudgetBytes): DataFrame = {
    require(maxContaminated >= 0L,
      s"maxContaminated must be >= 0, got $maxContaminated")
    val keys = train.columns.filterNot(_ == textCol).toSeq
    val bad = contaminationFromGrams(train, evalGramSet, textCol, n, broadcastBudgetBytes)
      .where(col("n_contaminated") > maxContaminated)
      .select(keys.map(col): _*)
    // bad derives FROM train (shared attribute ids) — alias both sides so
    // the analyzer's relation dedup re-keys the right side and the
    // null-safe condition resolves unambiguously
    val cond = keys.map(k => col(s"__dc_t.`$k`") <=> col(s"__dc_b.`$k`")).reduce(_ && _)
    train.alias("__dc_t").join(bad.alias("__dc_b"), cond, "left_anti")
  }
}
