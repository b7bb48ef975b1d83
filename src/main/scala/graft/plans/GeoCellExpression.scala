package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.geo.GeoCell

/** Native Catalyst expression for `geo_cell(lat, lng, res)` — the system's
  * hottest scalar (the reference's `to_h3` Python UDF,
  * `utils/spark_utils.py:6-9`, paid a Python-worker round trip per row; a
  * Scala UDF still pays boxing + serialization of the closure; this is a
  * first-class expression with `doGenCode`, so it inlines into whole-stage
  * codegen like a built-in).
  *
  * Exactly equivalent to [[graft.functions.GeoFunctions.geoCell]] (same
  * `GeoCell.cellId` math); kept as the SQL-facing registration. */
case class GeoCellExpression(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {

  override def prettyName: String = "geo_cell"
  override def dataType: DataType = StringType
  override def nullable: Boolean = first.nullable || second.nullable || third.nullable

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = first.dataType == DoubleType && second.dataType == DoubleType &&
      third.dataType == IntegerType
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"geo_cell expects (double, double, int), got " +
        s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, ${third.dataType.simpleString})")
  }

  override protected def nullSafeEval(lat: Any, lng: Any, res: Any): Any =
    UTF8String.fromString(GeoCell.cellId(
      lat.asInstanceOf[Double], lng.asInstanceOf[Double], res.asInstanceOf[Int]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lat, lng, res) =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.geo.GeoCell.cellId($lat, $lng, $res));""".stripMargin)

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}
