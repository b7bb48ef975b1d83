package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native codegen expression for `z_order(i, j)` — the Morton interleave
  * ([[graft.geo.Morton]]) as a first-class scalar so a ZORDER write
  * (`df.repartitionByRange(col).sortWithinPartitions(col)` on the z-value)
  * keeps its key computation inside WholeStageCodegen over the full table.
  * Mirrors the reference's reliance on Delta `OPTIMIZE ZORDER`
  * (`01_geofraud_clustering.py:440`) with an engine-native key. */
case class ZOrderExpression(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {

  override def prettyName: String = "z_order"
  override def dataType: DataType = LongType

  /** ImplicitCastInputTypes: INT grid indices (the natural SQL spelling)
    * coerce to BIGINT like they do for built-ins. */
  override def inputTypes: Seq[DataType] = Seq(LongType, LongType) // covariant override

  override protected def nullSafeEval(i: Any, j: Any): Any =
    graft.geo.Morton.interleave(i.asInstanceOf[Long], j.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (i, j) =>
      s"${ev.value} = graft.geo.Morton.interleave($i, $j);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `z_order3(i, j, k)` — the 3-D Morton interleave
  * ([[graft.geo.Morton.interleave3]], 21 bits per dimension → 63-bit
  * key): `OPTIMIZE … ZORDER BY (a, b, c)` clusters on it, so a point/box
  * predicate on ANY of the three columns prunes (the trailing column
  * would be statistically dead under a lexicographic sort). */
case class ZOrder3Expression(first: Expression, second: Expression,
                             third: Expression)
  extends TernaryExpression with ImplicitCastInputTypes {

  override def prettyName: String = "z_order3"
  override def dataType: DataType = LongType
  override def inputTypes: Seq[DataType] = Seq(LongType, LongType, LongType)

  override protected def nullSafeEval(i: Any, j: Any, k: Any): Any =
    graft.geo.Morton.interleave3(i.asInstanceOf[Long],
      j.asInstanceOf[Long], k.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (i, j, k) =>
      s"${ev.value} = graft.geo.Morton.interleave3($i, $j, $k);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}
