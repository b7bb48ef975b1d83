package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter join pruning — the sideways-information-passing pattern a
  * warehouse engine applies when a selective dim filters a huge fact join:
  * build a Bloom filter over the dim side's join keys, broadcast the
  * FILTER (not the data), and drop fact rows that cannot match before the
  * shuffle. `prune` keeps a superset of the matching rows (Bloom FPs), so
  * `prune ∘ join ≡ join` exactly — the exact join removes the FPs — while
  * the shuffle moves only ~selectivity of the fact table. At 100 TB this
  * is the difference between shuffling the whole fact table and shuffling
  * the few percent that survive the dim predicate; Spark's own runtime
  * row-group filters apply the same idea below the plan, this operator
  * makes it explicit and composable.
  *
  * Build is distributed (`stat.bloomFilter` runs a treeAggregate — partial
  * filters merge executor-side; only the merged bitset reaches the
  * driver). */
object BloomPrune {

  /** Bloom filter over `dim`'s `key` column values (as strings). */
  def build(dim: DataFrame, key: String, fpp: Double = 0.01): BloomFilter = {
    val n = math.max(dim.count(), 1L)
    dim.select(col(key).cast("string")).na.drop()
      .stat.bloomFilter(key, n, fpp)
  }

  /** Fact rows whose `factKey` might be in `bf` — a superset of the rows
    * an equi-join on the key would keep (null keys never join, so they are
    * dropped). */
  def prune(fact: DataFrame, factKey: String, bf: BloomFilter): DataFrame = {
    val bc = fact.sparkSession.sparkContext.broadcast(bf)
    val might = udf((k: String) => k != null && bc.value.mightContainString(k))
    fact.where(might(col(factKey).cast("string")))
  }

  /** Bloom-pruned exact equi-join: bit-identical to `fact.join(dim, keys)`
    * (BloomPruneSpec asserts it), cheaper on the wire. */
  def prunedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
                 dimKey: String, fpp: Double = 0.01): DataFrame = {
    val pruned = prune(fact, factKey, build(dim, dimKey, fpp))
    pruned.join(dim, pruned(factKey) === dim(dimKey))
  }
}
