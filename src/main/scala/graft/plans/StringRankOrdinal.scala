package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Binary-search helper for [[StringRankOrdinalExpression]] — a top-level
  * object so whole-stage codegen can call it as a Java static. */
object RankOrdinal {

  /** Count of boundaries ≤ `v` (upper-bound binary search over the SORTED,
    * DISTINCT boundary array; UTF8String.compareTo is Spark's own binary
    * string order, so the rank is monotone in the column's sort order —
    * including strings shorter than any prefix width, the short-string
    * non-monotonicity of the retired first-3-bytes ordinal). */
  def rank(bounds: Array[UTF8String], v: UTF8String): Int = {
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bounds(mid).compareTo(v) <= 0) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** The 21-bit ordinal: rank scaled across [0, ordinalMax]. Empty
    * boundaries (degenerate sample: empty/all-NULL column) collapse to 0,
    * matching the numeric side's degenerate-range contract. */
  def ordinal(bounds: Array[UTF8String], v: UTF8String, ordinalMax: Long): Long =
    if (bounds.length == 0) 0L
    else rank(bounds, v).toLong * ordinalMax / bounds.length
}

/** Order-preserving RANK ordinal for a string ZORDER dimension: the value's
  * position among sampled range boundaries of the table state (the
  * RangePartitioner shape — Delta's own ZORDER uses range-partition ids for
  * the same reason), scaled to the Morton key's 21-bit ordinal range.
  *
  * Why rank and not a byte prefix: real H3 ids share a long metro-scale
  * prefix (every res-9 NYC cell starts `892A10…`), so any fixed-width
  * prefix ordinal is a CONSTANT on exactly the `OPTIMIZE tiles ZORDER BY
  * (user, h3)` workload the reference runs
  * (`01_geofraud_clustering.py:440`) — the Morton key would carry zero h3
  * bits and h3 predicates would prune nothing. The rank ordinal spends its
  * 21 bits on the values that EXIST, so common prefixes cost nothing.
  *
  * Codegen-native (one binary search over a broadcast-small boundary
  * array per row); NULL ranks 0 via the caller's coalesce, clustering
  * NULLs at the front of the curve like the numeric side. */
case class StringRankOrdinalExpression(child: Expression,
                                       boundaries: Array[UTF8String],
                                       ordinalMax: Long)
  extends UnaryExpression {

  override def prettyName: String = "string_rank_ordinal"
  override def dataType: DataType = LongType

  override protected def nullSafeEval(v: Any): Any =
    RankOrdinal.ordinal(boundaries, v.asInstanceOf[UTF8String], ordinalMax)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val boundsRef = ctx.addReferenceObj("rankBounds", boundaries,
      "org.apache.spark.unsafe.types.UTF8String[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.RankOrdinal.ordinal($boundsRef, $c, ${ordinalMax}L);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
