package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session extensions wiring (SURVEY §4.2): install with
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`).
  *
  *  - [[AntiJoinRewrite]]: optimizer rule for the reference's
  *    left_outer + IS NULL anomaly spelling;
  *  - [[CellRangePushdown]]: optimizer rule deriving pushable lat/lng
  *    range predicates from `geo_cell(...) = '<cell>'` equality filters
  *    (row-group pruning for cell lookups);
  *  - `geo_cell`: native codegen expression replacing the UDF registration
  *    for SQL callers;
  *  - `vec_dot`: native codegen embedding dot product (cosine hot path);
  *  - `z_order`: native codegen Morton interleave (ZORDER write key);
  *  - `nfc_normalize`: native codegen Unicode NFC composition (the text
  *    normalization pass before tokenize/dedup);
  *  - `kmv_sketch`: native TypedImperativeAggregate KMV distinct sketch
  *    (bounded partial/merge state — the auditable approx-distinct for
  *    SQL callers, lockstep with `graft.sketch.Kmv`);
  *  - `hll_sketch`: native TypedImperativeAggregate HyperLogLog sketch
  *    (fixed 2^p-register state, elementwise-max merge — the
  *    deterministic, oracle-replayable alternative to
  *    `approx_count_distinct`). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectParser((_, delegate) => new GraftSqlParser(delegate))
    extensions.injectResolutionRule(_ => CatalogTableSubstitution)
    extensions.injectOptimizerRule(_ => AntiJoinRewrite)
    extensions.injectOptimizerRule(_ => CellRangePushdown)
    extensions.injectOptimizerRule(_ => LateralTopKRewrite)
    extensions.injectPlannerStrategy(_ => AsOfJoinStrategy)
    extensions.injectFunction((
      new FunctionIdentifier("geo_cell"),
      new ExpressionInfo(classOf[GeoCellExpression].getName, "geo_cell"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 3, "geo_cell(lat, lng, res)")
        GeoCellExpression(children(0), children(1), children(2))
      }))
    extensions.injectFunction((
      new FunctionIdentifier("geo_to_h3"),
      new ExpressionInfo(classOf[GeoToH3Expression].getName, "geo_to_h3"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 3, "geo_to_h3(lat, lng, res)")
        GeoToH3Expression(children(0), children(1), children(2))
      }))
    extensions.injectFunction((
      new FunctionIdentifier("h3_kring"),
      new ExpressionInfo(classOf[H3KRingExpression].getName, "h3_kring"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "h3_kring(h3, k)")
        H3KRingExpression(children(0), children(1))
      }))
    extensions.injectFunction((
      new FunctionIdentifier("h3_polyfill"),
      new ExpressionInfo(classOf[H3PolyfillExpression].getName, "h3_polyfill"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 3 || children.length == 4,
          "h3_polyfill(lats, lngs, res[, layers])")
        val layers =
          if (children.length == 4) children(3)
          else org.apache.spark.sql.catalyst.expressions.Literal(0)
        H3PolyfillExpression(children(0), children(1), children(2), layers)
      }))
    extensions.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDotExpression].getName, "vec_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "vec_dot(a, b)")
        VecDotExpression(children(0), children(1))
      }))
    extensions.injectFunction((
      new FunctionIdentifier("z_order"),
      new ExpressionInfo(classOf[ZOrderExpression].getName, "z_order"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "z_order(i, j)")
        ZOrderExpression(children(0), children(1))
      }))
    extensions.injectFunction((
      new FunctionIdentifier("z_order3"),
      new ExpressionInfo(classOf[ZOrder3Expression].getName, "z_order3"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 3, "z_order3(i, j, k)")
        ZOrder3Expression(children(0), children(1), children(2))
      }))
    extensions.injectFunction((
      new FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalizeExpression].getName, "nfc_normalize"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 1, "nfc_normalize(text)")
        NfcNormalizeExpression(children(0))
      }))
    extensions.injectFunction((
      new FunctionIdentifier("kmv_sketch"),
      new ExpressionInfo(classOf[KmvSketchAggregate].getName, "kmv_sketch"),
      KmvSketchAggregate.build))
    extensions.injectFunction((
      new FunctionIdentifier("hll_sketch"),
      new ExpressionInfo(classOf[HllSketchAggregate].getName, "hll_sketch"),
      HllSketchAggregate.build))
    extensions.injectFunction((
      new FunctionIdentifier("mg_topk"),
      new ExpressionInfo(classOf[MisraGriesAggregate].getName, "mg_topk"),
      MisraGriesAggregate.build))
  }
}
