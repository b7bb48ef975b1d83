package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{NumericType, StructField}

/** Builds the clustering key for `OPTIMIZE ... ZORDER BY (cols)` from the
  * table's CURRENT logical state (SURVEY S10; the reference leans on
  * Delta's OPTIMIZE ZORDER, `01_geofraud_clustering.py:440`).
  *
  * Two columns — the reference's own `(user, h3)` shape — get the TRUE
  * Morton interleave: each column is mapped to an order-preserving 21-bit
  * ordinal (numeric: min/max-normalized, one agg pass over the state —
  * the sampling pass Delta's own ZORDER also pays; string: big-endian
  * value of the first three UTF-8 bytes, a lexicographic-prefix ordinal)
  * and the ordinals feed the native codegen [[ZOrderExpression]]. Files
  * range-partitioned and sorted on that key carry tight min/max stats in
  * BOTH dimensions, so a point/box predicate on either column prunes.
  *
  * One column, or three+, falls back to lexicographic multi-column
  * clustering (`repartitionByRange` + sort on the columns themselves):
  * with one column that IS optimal; past two, interleaving 21-bit
  * ordinals dilutes each dimension's stats below what the leading-columns
  * sort gives, and the honest fallback keeps the leading columns' pruning
  * exact. NULL ordinals cluster at 0 (front of the curve). */
object ZOrderClustering {

  private val OrdinalBits = 21
  private val OrdinalMax = (1L << OrdinalBits) - 1 // 2097151

  private def field(state: DataFrame, name: String): StructField =
    state.schema.fields.find(_.name.equalsIgnoreCase(name)).getOrElse(
      throw new IllegalArgumentException(
        s"ZORDER BY column '$name' is not in the table schema " +
          state.schema.fieldNames.mkString("(", ", ", ")")))

  /** Order-preserving 21-bit ordinal for a string column: unsigned
    * big-endian of the first 3 UTF-8 bytes (24 bits), shifted down to 21.
    * Monotone in the lexicographic byte order of the prefix; NULL → 0. */
  private def stringOrdinal(c: Column): Column =
    shiftright(
      coalesce(conv(hex(substring(encode(c, "UTF-8"), 1, 3)), 16, 10)
        .cast("long"), lit(0L)), 24 - OrdinalBits)

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

  /** The `clusterBy` columns for a ZORDER maintenance rewrite over
    * `state` (the table's current logical rows). Empty `cols` is the
    * caller's bug; unknown columns refuse by name. */
  def clusterKey(state: DataFrame, cols: Seq[String]): Seq[Column] = {
    require(cols.nonEmpty, "ZORDER BY needs at least one column")
    val fields = cols.map(field(state, _))
    if (cols.length != 2) return fields.map(f => col(f.name))

    val numericNames =
      fields.filter(_.dataType.isInstanceOf[NumericType]).map(_.name)
    val stats: Map[String, (Option[Double], Option[Double])] =
      if (numericNames.isEmpty) Map.empty
      else {
        val aggs = numericNames.flatMap(n => Seq(
          min(col(n).cast("double")), max(col(n).cast("double"))))
        val row = state.agg(aggs.head, aggs.tail: _*).head
        numericNames.zipWithIndex.map { case (n, i) =>
          def d(j: Int): Option[Double] =
            if (row.isNullAt(j)) None else Some(row.getDouble(j))
          n -> (d(2 * i), d(2 * i + 1))
        }.toMap
      }
    val Seq(ordA, ordB) = fields.map { f =>
      if (f.dataType.isInstanceOf[NumericType]) {
        val (mn, mx) = stats(f.name)
        numericOrdinal(col(f.name), mn, mx)
      } else stringOrdinal(col(f.name).cast("string"))
    }
    Seq(ColumnBridge.column(ZOrderExpression(
      ColumnBridge.expression(ordA), ColumnBridge.expression(ordB))))
  }
}
