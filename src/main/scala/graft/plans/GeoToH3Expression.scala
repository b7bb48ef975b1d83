package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen expression for `geo_to_h3(lat, lng, res)` — REAL H3
  * ids ([[graft.geo.H3]], published-vector-verified) as the reference's
  * own `to_h3` UDF surface (`utils/spark_utils.py:6-9`: geo_to_h3 then
  * UPPER). Keeping the per-row trig + table lookups inside
  * WholeStageCodegen makes the id assignment a pure map pass over the
  * 100 TB fact side — the same discipline as [[GeoCellExpression]],
  * which remains the engine's oracle-replayable grid. */
case class GeoToH3Expression(first: Expression, second: Expression,
                             third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {

  override def prettyName: String = "geo_to_h3"
  override def dataType: DataType = StringType
  override def inputTypes: Seq[DataType] =
    Seq(DoubleType, DoubleType, IntegerType)

  override protected def nullSafeEval(lat: Any, lng: Any, res: Any): Any =
    UTF8String.fromString(graft.geo.H3.geoToH3String(
      lat.asInstanceOf[Double], lng.asInstanceOf[Double],
      res.asInstanceOf[Int]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lat, lng, res) =>
      s"${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.geo.H3.geoToH3String($lat, $lng, $res));")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}
