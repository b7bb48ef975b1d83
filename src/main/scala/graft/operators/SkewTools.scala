package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for huge equi-joins (the 100 TB design brief: "salting
  * for skew"). AQE's skew-join split handles most cases free
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default); explicit salting
  * is for the residual pattern AQE can't fix — a *broadcast-ineligible*
  * dimension join where a handful of keys dominate the fact side.
  *
  * Mechanics: the fact side gets a deterministic salt in [0, factor) per
  * row; the dimension side is exploded `factor`× with every salt value;
  * the join key becomes (key, salt), spreading each hot key over `factor`
  * reducers. Dimension fanout costs `factor × |dim|` — use only when
  * |dim| ≪ |fact| and the key histogram is skewed. */
object SkewTools {

  /** Inner equi-join of `fact` and `dim` on `keys`, salted `factor` ways.
    * Result equals `fact.join(dim, keys)` row-for-row. The salt is a hash
    * of the fact row's key columns plus `spark_partition_id`-free
    * monotonic component, so it is deterministic for a fixed input. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
                 factor: Int): DataFrame = {
    require(factor >= 1, s"salt factor $factor")
    // reserved helper name (the AsOfJoin convention): silently overwriting
    // and then dropping a caller's __salt column would break the
    // row-for-row contract with no error
    require(!fact.columns.contains("__salt") && !dim.columns.contains("__salt"),
      "saltedJoin reserves the column name __salt — rename or drop the input's")
    // deterministic per-row salt: spread rows of the same key via a hash of
    // the whole row (falls back to uniform spreading of hot keys)
    val factCols = fact.columns.map(col)
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(factCols.toIndexedSeq: _*), lit(factor)).cast("int"))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(saltedDim, keys :+ "__salt").drop("__salt")
  }

  /** Key histogram of the top-n heaviest keys — the decision input for
    * choosing `factor` (and for whether salting is needed at all). */
  def keyHistogram(df: DataFrame, keys: Seq[String], topN: Int = 20): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt")).limit(topN)
}
