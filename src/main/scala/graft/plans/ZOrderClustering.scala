package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{NumericType, StructField}
import org.apache.spark.unsafe.types.UTF8String

/** Builds the clustering key for `OPTIMIZE ... ZORDER BY (cols)` from the
  * table's CURRENT logical state (SURVEY S10; the reference leans on
  * Delta's OPTIMIZE ZORDER, `01_geofraud_clustering.py:440`).
  *
  * Two columns — the reference's own `(user, h3)` shape — get the TRUE
  * Morton interleave: each column is mapped to an order-preserving 21-bit
  * ordinal and the ordinals feed the native codegen [[ZOrderExpression]].
  * Numeric: min/max-normalized (one agg pass over the state — the
  * sampling pass Delta's own ZORDER also pays). String: RANK among
  * sampled range boundaries of the state itself
  * ([[StringRankOrdinalExpression]] — the RangePartitioner-sampler
  * shape), NOT a byte prefix: real H3 ids share a metro-scale prefix
  * (every res-9 NYC cell starts `892A10…`), so a prefix ordinal
  * degenerates to a constant on exactly the reference's `(user, h3)`
  * workload and zeroes the h3 dimension of the key. Files
  * range-partitioned and sorted on the interleaved key carry tight
  * min/max stats in BOTH dimensions, so a point/box predicate on either
  * column prunes.
  *
  * Three columns interleave the same 21-bit ordinals into a 63-bit
  * 3-D Morton key ([[ZOrder3Expression]]) — Delta's own ZORDER handles
  * 3+, and with rank ordinals available for every type the trailing
  * column keeps real pruning power instead of dying under a
  * lexicographic sort. One column, or four+, falls back to
  * lexicographic multi-column clustering (`repartitionByRange` + sort
  * on the columns themselves): with one column that IS optimal; past
  * three the per-dimension ordinal budget dilutes below what the
  * leading-columns sort gives, and the honest fallback keeps the
  * leading columns' pruning exact. NULL ordinals cluster at 0 (front of
  * the curve). */
object ZOrderClustering {

  private val OrdinalBits = 21
  private val OrdinalMax = (1L << OrdinalBits) - 1 // 2097151

  /** Expected boundary-sample size (collected once on the driver; the
    * RangePartitioner default order of magnitude). */
  private val SampleTarget = 131072L

  /** Boundary-array cap: 4096 rank buckets spread across the 21-bit
    * ordinal range — orders of magnitude more buckets than a maintenance
    * rewrite has output files, at a broadcast-reference cost of a few
    * tens of KB. */
  private val MaxBoundaries = 4095

  private def field(state: DataFrame, name: String): StructField =
    state.schema.fields.find(_.name.equalsIgnoreCase(name)).getOrElse(
      throw new IllegalArgumentException(
        s"ZORDER BY column '$name' is not in the table schema " +
          state.schema.fieldNames.mkString("(", ", ", ")")))

  /** Min/max-normalized 21-bit ordinal for a numeric column; a
    * degenerate range (empty stats, constant column) collapses to 0. */
  private def numericOrdinal(c: Column, mn: Option[Double],
                             mx: Option[Double]): Column =
    (mn, mx) match {
      case (Some(lo), Some(hi)) if hi > lo =>
        least(lit(OrdinalMax), greatest(lit(0L),
          ((c.cast("double") - lit(lo)) * lit(OrdinalMax / (hi - lo)))
            .cast("long")))
      case _ => lit(0L)
    }

  /** Thin a sorted distinct sample down to at most `maxB` evenly-spaced
    * boundaries (the RangePartitioner determineBounds shape). */
  private def thin(sorted: Array[UTF8String], maxB: Int): Array[UTF8String] =
    if (sorted.length <= maxB) sorted
    else Array.tabulate(maxB) { i =>
      sorted((((i + 1).toLong * sorted.length) / (maxB + 1)).toInt)
    }.distinct

  /** Rank-ordinal column over sampled boundaries; NULL → 0. */
  private def rankOrdinal(c: Column, bounds: Array[UTF8String]): Column =
    coalesce(ColumnBridge.column(StringRankOrdinalExpression(
      ColumnBridge.expression(c.cast("string")), bounds, OrdinalMax)), lit(0L))

  /** The `clusterBy` columns for a ZORDER maintenance rewrite over
    * `state` (the table's current logical rows). Empty `cols` is the
    * caller's bug; unknown columns refuse by name. */
  def clusterKey(state: DataFrame, cols: Seq[String]): Seq[Column] = {
    require(cols.nonEmpty, "ZORDER BY needs at least one column")
    val fields = cols.map(field(state, _))
    // 1 column: a plain sort IS optimal. 4+: interleaving 21-bit
    // ordinals dilutes each dimension's stats below what the
    // leading-columns sort gives — honest lexicographic fallback.
    // 2 and 3 columns get the true Morton interleave (63 bits at 3).
    if (cols.length != 2 && cols.length != 3)
      return fields.map(f => col(f.name))

    val numericNames =
      fields.filter(_.dataType.isInstanceOf[NumericType]).map(_.name)
    val stringNames =
      fields.filterNot(_.dataType.isInstanceOf[NumericType]).map(_.name)
    // ONE stats pass: row count (drives the string-sample fraction) plus
    // min/max per numeric dimension
    val aggs = count(lit(1L)).as("__n") +: numericNames.flatMap(n => Seq(
      min(col(n).cast("double")), max(col(n).cast("double"))))
    val row = state.agg(aggs.head, aggs.tail: _*).head
    val total = row.getLong(0)
    val stats: Map[String, (Option[Double], Option[Double])] =
      numericNames.zipWithIndex.map { case (n, i) =>
        def d(j: Int): Option[Double] =
          if (row.isNullAt(j)) None else Some(row.getDouble(j))
        n -> (d(1 + 2 * i), d(2 + 2 * i))
      }.toMap
    // ONE sample pass shared by all (≤3) string dimensions; deterministic
    // seed so repeated OPTIMIZE runs cluster identically
    val bounds: Map[String, Array[UTF8String]] =
      if (stringNames.isEmpty || total == 0L) Map.empty
      else {
        val fraction = math.min(1.0, SampleTarget.toDouble / total.toDouble)
        val sampled = state
          .select(stringNames.map(n => col(n).cast("string")): _*)
          .sample(withReplacement = false, fraction, seed = 42L)
          .collect()
        stringNames.zipWithIndex.map { case (n, i) =>
          val vals = sampled.iterator.filterNot(_.isNullAt(i))
            .map(r => UTF8String.fromString(r.getString(i)))
            .toArray.distinct
          java.util.Arrays.sort(vals,
            (a: UTF8String, b: UTF8String) => a.compareTo(b))
          n -> thin(vals, MaxBoundaries)
        }.toMap
      }
    val ords = fields.map { f =>
      if (f.dataType.isInstanceOf[NumericType]) {
        val (mn, mx) = stats(f.name)
        numericOrdinal(col(f.name), mn, mx)
      } else rankOrdinal(col(f.name), bounds.getOrElse(f.name, Array.empty))
    }.map(ColumnBridge.expression)
    ords match {
      case Seq(a, b) =>
        Seq(ColumnBridge.column(ZOrderExpression(a, b)))
      case Seq(a, b, c) =>
        Seq(ColumnBridge.column(ZOrder3Expression(a, b, c)))
      case _ => throw new IllegalStateException(s"${ords.length} ordinals")
    }
  }
}
