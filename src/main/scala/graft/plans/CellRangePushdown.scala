package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualTo, Expression, GreaterThanOrEqual, IsNaN, LessThan, Literal, Or}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.geo.GeoCell

import scala.util.Try

/** `geo_cell(lat, lng, res) = '<cellId>'` → conjoin lat/lng RANGE
  * predicates derived from the cell's bounding box.
  *
  * A cell-equality filter is opaque to the parquet reader: the expression
  * computes per row and nothing reaches `PushedFilters`, so a lookup query
  * scans every row group of a 100 TB table. The cell id fully determines a
  * lat/lng box, and range predicates on the raw columns DO push down —
  * min/max row-group statistics then skip everything outside the box. The
  * original equality stays in the filter (the added ranges are a strict
  * superset), so this is semantics-preserving, including:
  *
  *  - pole clamping: index 0 / max extend to ±infinity (cellId clamps
  *    out-of-range latitudes into the edge cells), so those bounds are
  *    simply omitted;
  *  - longitude wrap: cellId maps any longitude by positive modulo, so the
  *    range applies only inside [-180, 180) and out-of-range longitudes
  *    are passed through with an escape disjunct;
  *  - FP slack: bounds widen by step×1e-9 so a value whose
  *    `(x+offset)/step` rounds across the floor boundary (the expression's
  *    own arithmetic decides membership) is never excluded;
  *  - nulls: a null lat/lng nulls the equality AND the ranges — both
  *    filter the row, unchanged;
  *  - NaN: `geo_cell(NaN, …)` lands in the i=0 / j=0 edge cells
  *    (floor(NaN).toLong == 0 after clamping). Under Spark's NaN-greatest
  *    ordering `x >= v` passes NaN — so the longitude side is already
  *    covered by the wrap escape — but `lat < hi` would drop NaN rows the
  *    retained equality keeps, so the i=0 cell's upper-lat bound carries an
  *    `isnan` escape disjunct (that one bound stays a post-scan filter;
  *    every other cell's bounds remain plain pushable ranges).
  *
  * Fires only when lat/lng are bare [[Attribute]]s (scan pruning is the
  * point) and the added conjunct is not already present (fixpoint-safe).
  * Registered by [[GraftExtensions]]. */
object CellRangePushdown extends Rule[LogicalPlan] {

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case other => Seq(other)
  }

  private def rangesFor(e: Expression): Seq[Expression] = e match {
    case EqualTo(GeoCellExpression(lat: Attribute, lng: Attribute, Literal(res: Int, IntegerType)),
                 Literal(cell: UTF8String, StringType)) =>
      boxPredicates(lat, lng, res, cell.toString)
    case EqualTo(Literal(cell: UTF8String, StringType),
                 GeoCellExpression(lat: Attribute, lng: Attribute, Literal(res: Int, IntegerType))) =>
      boxPredicates(lat, lng, res, cell.toString)
    case _ => Seq.empty
  }

  private def boxPredicates(lat: Attribute, lng: Attribute, res: Int,
                            cellId: String): Seq[Expression] = {
    val parsed = Try(GeoCell.parse(cellId)).toOption
    parsed match {
      case Some((r, i, j)) if r == res =>
        val rows = 1L << (res + 8)
        val cols = 1L << (res + 9)
        if (i < 0 || i >= rows || j < 0 || j >= cols) Seq.empty // impossible id: leave the always-false equality alone
        else {
          val step = GeoCell.stepDegrees(res)
          val eps = step * 1e-9
          val latLo = if (i == 0) None else Some(i * step - 90.0 - eps)
          val latHi = if (i == rows - 1) None else Some((i + 1) * step - 90.0 + eps)
          val latPreds: Seq[Expression] =
            latLo.map(v => GreaterThanOrEqual(lat, Literal(v, DoubleType))).toSeq ++
              latHi.map { v =>
                val lt: Expression = LessThan(lat, Literal(v, DoubleType))
                // NaN latitudes live in the i=0 cell and fail `lat < hi`
                // under NaN-greatest ordering; everywhere else the equality
                // rejects them too, so only this cell needs the escape
                if (i == 0) Or(IsNaN(lat), lt) else lt
              }.toSeq
          // in [-180, 180) the modulo is the identity; outside it the cell
          // can be reached by wrapping, so those rows pass through
          val lngInRange = And(
            GreaterThanOrEqual(lng, Literal(j * step - 180.0 - eps, DoubleType)),
            LessThan(lng, Literal((j + 1) * step - 180.0 + eps, DoubleType)))
          // the wrap escape's lower edge carries eps slack for the j=0
          // cell: a longitude JUST below 180 can FP-round (lng+180)/step
          // up to exactly `cols`, which the expression wraps to j=0 — so
          // the j=0 box is reachable from the 180⁻ neighborhood and a
          // bare `lng >= 180` escape would drop those rows (strict-
          // superset violation). Other cells are unreachable by rounding
          // across the wrap, so they keep the exact bound.
          val wrapLo = if (j == 0) 180.0 - eps else 180.0
          val lngPred = Or(
            Or(LessThan(lng, Literal(-180.0, DoubleType)),
              GreaterThanOrEqual(lng, Literal(wrapLo, DoubleType))),
            lngInRange)
          latPreds :+ lngPred
        }
      case _ => Seq.empty
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child) =>
      val existing = conjuncts(cond)
      val derived = existing.flatMap(rangesFor)
        .filterNot(d => existing.exists(_.semanticEquals(d)))
      if (derived.isEmpty) f
      else Filter((existing ++ derived).reduce(And), child)
  }
}
