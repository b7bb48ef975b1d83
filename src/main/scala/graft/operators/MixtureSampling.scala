package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-mixture selection to per-source token budgets — the pretraining
  * corpus-composition step (the reference stops at per-user model curation,
  * `01_geofraud_clustering.py:299`; a training-data pipeline additionally
  * needs "take W_web : W_books : W_code worth of tokens from each source"
  * with a replayable doc-level selection).
  *
  * Semantics: each source s gets `budget_s = totalBudget · w_s DIV Σw`
  * (integer arithmetic — cross-engine exact). Docs within a source are
  * ranked by a content-independent md5 priority (salted doc id — the
  * [[graft.text.TextFunctions.md5Bucket16]] family's determinism argument:
  * seeded RNG sampling can't be replayed across engines, a hash rank can),
  * and a doc is selected iff the token sum of all higher-priority docs in
  * its source is still below the source budget — so every source fills to
  * its budget and overshoots by at most one document.
  *
  * Scale design: NOT `Window.partitionBy(source)` alone — 20 sources at
  * 100 TB means 20 partitions, each funnelling terabytes through one task.
  * The priority space is cut into 256 deterministic buckets (the md5's
  * first byte); per-(source, bucket) token totals — a ≤ |sources|·256-row
  * aggregate — prefix-sum into bucket offsets on a tiny frame, which
  * broadcast-joins back so the running sum inside each bucket is a
  * PARTITIONED window over (source, bucket): every bucket cumsums in
  * parallel, and the result depends only on the global per-source priority
  * order, never on physical partitioning (the [[Sharding]] two-level
  * pattern). */
object MixtureSampling {

  /** @param df corpus rows carrying `sourceCol`, `idCol`, `tokenCol`
    * @param weights small dim frame `(sourceCol, wt: long)` — sources
    *   absent from it are dropped (weight 0)
    * @param totalBudget global token budget split across sources by weight
    * @return the selected rows plus `wt`, `budget_toks`, `tok_before` */
  def byWeights(df: DataFrame, weights: DataFrame, totalBudget: Long,
                sourceCol: String = "source", tokenCol: String = "n_tokens",
                idCol: String = "doc_id", numBuckets: Int = 256): DataFrame = {
    require(totalBudget >= 0, "totalBudget must be non-negative")
    require(numBuckets > 0 && numBuckets <= 256,
      "numBuckets must be in [1, 256] (buckets are ranges of the md5's first byte)")
    val spark = df.sparkSession
    import spark.implicits._

    // Σw from the weights dim, with the one-row-per-source assumption
    // ENFORCED in the same job: a duplicate source row would silently fan
    // every doc of that source out through the broadcast join
    val wRow = weights.agg(coalesce(sum($"wt"), lit(0L)).cast("long"),
      count(lit(1)), countDistinct(col(sourceCol))).head
    val sumW = wRow.getLong(0)
    require(sumW > 0, "mixture weights must sum to a positive value")
    require(wRow.getLong(1) == wRow.getLong(2),
      s"weights must carry ONE row per source — got ${wRow.getLong(1)} rows " +
        s"over ${wRow.getLong(2)} distinct sources")
    // budget split in DECIMAL: totalBudget × wt in long arithmetic wraps
    // negative at pretraining scale (2e14 tokens × 1e5 weight > 2^63) and
    // would silently zero the heaviest source's budget
    val budgets = weights.select(col(sourceCol), $"wt".cast("long").as("wt"),
      expr(s"CAST(floor(CAST(${totalBudget} AS DECIMAL(38,0)) * CAST(wt AS DECIMAL(38,0)) " +
        s"/ CAST(${sumW} AS DECIMAL(38,0))) AS BIGINT)").as("budget_toks"))

    // deterministic priority + its leading byte as the parallelism bucket:
    // bucketing by a PREFIX of the sort key keeps bucket order == sort order
    val pri = md5(concat(lit("mx|"), col(idCol).cast("string")).cast("binary"))
    val tok = coalesce(col(tokenCol).cast("long"), lit(0L))
    // null ids have no stable priority (md5 of null is null → null bucket):
    // they would both inflate every real bucket's offset (the null bucket
    // sorts first in the prefix sum) AND drop out of the final join —
    // exclude them up front, with the rule stated here
    val withPri = df.where(col(idCol).isNotNull)
      .join(broadcast(budgets), sourceCol)
      .withColumn("__pri", pri)
      // RANGE map (DIV, not modulo): bucket order must equal priority-prefix
      // order, so the 0–255 byte space maps onto contiguous bucket ranges
      .withColumn("__bucket",
        (conv(substring($"__pri", 1, 2), 16, 10).cast("int") * numBuckets / 256).cast("int"))

    // per-(source, bucket) totals → exclusive offsets. The frame is
    // ≤ |sources|·numBuckets rows, so the prefix sum is itself a window
    // over a tiny aggregate — no driver collect, no skew.
    val perBucket = withPri.groupBy(col(sourceCol), $"__bucket")
      .agg(sum(tok).as("__btok"))
    val offW = Window.partitionBy(col(sourceCol)).orderBy($"__bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = perBucket
      .withColumn("__offset", coalesce(sum($"__btok").over(offW), lit(0L)))
      .drop("__btok")

    val inBucket = Window.partitionBy(col(sourceCol), $"__bucket")
      .orderBy($"__pri".asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withPri
      .join(broadcast(offsets), Seq(sourceCol, "__bucket"))
      .withColumn("tok_before", $"__offset" + sum(tok).over(inBucket) - tok)
      .where($"tok_before" < $"budget_toks")
      .drop("__pri", "__bucket", "__offset")
  }
}
