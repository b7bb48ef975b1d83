package graft.plans

import graft.SparkSpec
import graft.geo.GeoCell

class CellRangePushdownSpec extends SparkSpec {

  private def lookupRows(rows: Seq[(Double, Double)], cell: String, res: Int): Set[(Double, Double)] = {
    import spark.implicits._
    rows.toDF("latitude", "longitude").createOrReplaceTempView("crp_pts")
    spark.sql(s"SELECT latitude, longitude FROM crp_pts " +
        s"WHERE geo_cell(latitude, longitude, $res) = '$cell'")
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet
  }

  test("rewritten filter keeps exactly the rows whose cell matches — wrap, poles, boundaries") {
    val res = 10
    val rng = new scala.util.Random(11)
    val adversarial = Seq(
      (40.73, -73.99), (40.73, -73.99 + 360.0), (40.73, -73.99 - 360.0), // wrap hits
      (91.0, -73.99), (-95.0, 12.0),                                     // pole clamps
      (-90.0, -180.0), (89.999999, 179.999999),                          // corners
      (40.73, 180.0), (40.73, -180.0),                                   // seam
      (40.73, Math.nextDown(180.0))  // FP-rounds across the wrap into j=0
    )
    val random = Seq.fill(300)((rng.nextDouble() * 200 - 100, rng.nextDouble() * 800 - 400))
    val rows = adversarial ++ random
    val cell = GeoCell.cellId(40.73, -73.99, res)
    val expect = rows.filter { case (la, ln) => GeoCell.cellId(la, ln, res) == cell }.toSet
    assert(lookupRows(rows, cell, res) == expect)
    assert(expect.exists { case (_, ln) => ln > 180.0 || ln < -180.0 }) // wrap rows really matched
    // a pole-clamped cell: bounds must extend past the clamp edge
    val poleCell = GeoCell.cellId(90.0, 0.0, res)
    val poleExpect = rows.filter { case (la, ln) => GeoCell.cellId(la, ln, res) == poleCell }.toSet
    assert(lookupRows(rows, poleCell, res) == poleExpect)
    // the j=0 column cell: reachable from the 180⁻ FP-rounding
    // neighborhood (nextDown(180) wraps into it — verified, it shares
    // -180's cell id), so the wrap escape must carry eps slack there
    val seamCell = GeoCell.cellId(40.73, -180.0, res)
    val seamExpect = rows.filter { case (la, ln) => GeoCell.cellId(la, ln, res) == seamCell }.toSet
    assert(seamExpect.exists(_._2 > 179.9), "the FP-wrap row must match this cell")
    assert(lookupRows(rows, seamCell, res) == seamExpect)
  }

  test("NaN coordinates survive the rewrite for the edge cell they map into") {
    import spark.implicits._
    val res = 10
    // floor(NaN).toLong == 0 after clamping → NaN lands in the i=0/j=0 cell
    val nanCell = GeoCell.cellId(Double.NaN, Double.NaN, res)
    val rows = Seq((Double.NaN, Double.NaN), (Double.NaN, 0.7), (40.73, Double.NaN),
      (-89.9999, -179.9999), (40.73, -73.99))
    // count-based compare: NaN breaks Set equality on tuples
    rows.toDF("latitude", "longitude").createOrReplaceTempView("crp_nan")
    val n = spark.sql(s"SELECT count(*) AS n FROM crp_nan " +
        s"WHERE geo_cell(latitude, longitude, $res) = '$nanCell'")
      .collect().head.getLong(0)
    val expect = rows.count { case (la, ln) => GeoCell.cellId(la, ln, res) == nanCell }
    assert(expect >= 2, s"fixture should hit the edge cell: $expect") // NaN row + real corner row
    assert(n == expect)
  }

  test("the rule injects pushable lat ranges under the filter") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("crp").toString
    Seq((40.73, -73.99, 1.0), (41.9, -73.1, 2.0)).toDF("latitude", "longitude", "amount")
      .write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("crp_tbl")
    val cell = GeoCell.cellId(40.73, -73.99, 10)
    val df = spark.sql(s"SELECT count(*) AS n FROM crp_tbl " +
      s"WHERE geo_cell(latitude, longitude, 10) = '$cell'")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["), plan)
    assert(plan.contains("GreaterThanOrEqual(latitude"), plan)
    assert(df.collect().head.getLong(0) == 1L)
  }
}
