package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budgeted shard assignment — the pretraining write-side step that
  * packs an ordered corpus into shards of ≈`budget` tokens each (so every
  * output file feeds a trainer a comparable token count).
  *
  * Semantics: rows are taken in `orderCol` order; a row's shard is
  * `floor(tokens_before_it / budget)` where `tokens_before_it` is the
  * running token sum of all earlier rows — i.e. greedy sequential packing,
  * exactly `floor((sum(tok) OVER (ORDER BY ord) - tok) / budget)`.
  *
  * Scale design: NOT a global window (Spark would funnel the whole corpus
  * through one partition to sort it). The order key is cut into
  * `numBuckets` deterministic fixed-width ranges; per-bucket token totals
  * (a `numBuckets`-row aggregate) prefix-sum into bucket offsets that
  * broadcast-join back; the running sum inside each bucket is a PARTITIONED
  * window — every bucket cumsums in parallel. The result depends only on
  * the global order, never on sampling or physical partitioning. */
object Sharding {

  def byTokenBudget(df: DataFrame, budget: Long, tokenCol: String = "n_tokens",
                    orderCol: String = "doc_id", numBuckets: Int = 256): DataFrame = {
    require(budget > 0, "budget must be positive")
    withTokenOffsets(df, tokenCol, orderCol, numBuckets)
      .withColumn("shard", expr(s"tok_start DIV ${budget}L"))
      .drop("tok_start")
  }

  /** The running-offset half of [[byTokenBudget]], exposed: every row gains
    * `tok_start` = the exclusive running token sum of all earlier rows in
    * `orderCol` order — the document's global position in the concatenated
    * token stream. Shard assignment, fixed-block sequence packing, and
    * split-point planning are all projections over this one column. Same
    * scale design as byTokenBudget (bucketed parallel prefix-sum, no global
    * window). `orderCol` must be UNIQUE per row (a doc id): ties would
    * make per-row offsets depend on the physical tie order. */
  def withTokenOffsets(df: DataFrame, tokenCol: String = "n_tokens",
                       orderCol: String = "doc_id", numBuckets: Int = 256): DataFrame = {
    require(numBuckets > 0, "numBuckets must be positive")
    val spark = df.sparkSession
    import spark.implicits._

    // materialize the (usually expensive — tokenize etc.) input lineage
    // once: three passes follow (bounds, bucket sums, the output itself)
    val in = df.localCheckpoint(true)
    val bounds = in.agg(min(col(orderCol)).cast("long"), max(col(orderCol)).cast("long")).head()
    if (bounds.isNullAt(0)) return in.withColumn("tok_start", lit(0L)) // empty input
    val mn = bounds.getLong(0)
    val mx = bounds.getLong(1)
    // fixed-width buckets over the key range — deterministic, no sampling
    val width = math.max((mx - mn) / numBuckets + 1, 1L)
    val tok = coalesce(col(tokenCol).cast("long"), lit(0L))
    // DIV, not `/`: Spark's `/` on longs yields double (precision loss past
    // 2^53); both operands are non-negative here so DIV == floor division
    val withBucket = in.withColumn("__bucket",
      expr(s"(CAST($orderCol AS BIGINT) - ${mn}L) DIV ${width}L"))

    // per-bucket totals → exclusive prefix offsets (numBuckets rows: tiny)
    val sums = withBucket.groupBy($"__bucket").agg(sum(tok).as("__btok"))
      .orderBy($"__bucket").collect()
      .map { r =>
        require(!r.isNullAt(0),
          s"order column '$orderCol' has null or non-numeric values — rows have no packing position")
        (r.getLong(0), r.getLong(1))
      }
    val offsets = sums.map(_._1).zip(sums.map(_._2).scanLeft(0L)(_ + _))
    val offsetDf = spark.createDataFrame(offsets.toSeq).toDF("__bucket", "__offset")

    val inBucket = Window.partitionBy($"__bucket")
      .orderBy(col(orderCol)).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withBucket
      .join(broadcast(offsetDf), Seq("__bucket"))
      .withColumn("tok_start", $"__offset" + sum(tok).over(inBucket) - tok)
      .drop("__bucket", "__offset")
  }
}
