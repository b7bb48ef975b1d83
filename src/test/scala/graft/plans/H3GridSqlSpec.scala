package graft.plans

import graft.SparkSpec

/** `h3_kring` / `h3_polyfill` as REGISTERED SQL functions (the q283-style
  * tiling surface for SQL callers with no fitted model): published-vector
  * results, sorted-array determinism, null propagation, loud refusals. */
class H3GridSqlSpec extends SparkSpec {

  test("h3_kring: published ring, sorted output, k=0 identity, null propagation") {
    val ring = spark.sql(
      "SELECT h3_kring('8928308280fffff', 1) AS r").head.getSeq[String](0)
    assert(ring == ring.sorted, "output must be sorted")
    assert(ring.toSet == Set("89283082803FFFF", "89283082807FFFF",
      "8928308280BFFFF", "8928308280FFFFF", "8928308283BFFFF",
      "89283082873FFFF", "89283082877FFFF"))
    // k=0 is the cell itself, uppercased
    assert(spark.sql("SELECT h3_kring('8928308280fffff', 0)")
      .head.getSeq[String](0) == Seq("8928308280FFFFF"))
    assert(spark.sql("SELECT h3_kring(CAST(NULL AS STRING), 1)").head.isNullAt(0))
    // refusals: malformed id, k out of range
    val e = intercept[Exception](
      spark.sql("SELECT h3_kring('nonsense!', 1)").collect())
    assert(e.getMessage.contains("hex H3"), e.getMessage)
    val e2 = intercept[Exception](
      spark.sql("SELECT h3_kring('8928308280fffff', 100000)").collect())
    assert(e2.getMessage.contains("out of"), e2.getMessage)
  }

  test("h3_polyfill: vertex guarantee, 3-arg default, layer monotonicity, refusals") {
    // a small triangle near the SF vector point
    val call3 = "h3_polyfill(array(37.775, 37.776, 37.7755), " +
      "array(-122.419, -122.418, -122.417), 9)"
    val cover = spark.sql(s"SELECT $call3 AS c").head.getSeq[String](0)
    assert(cover.nonEmpty && cover == cover.sorted)
    // every vertex's own cell is in the cover (the getTiles guarantee)
    val verts = Seq((37.775, -122.419), (37.776, -122.418), (37.7755, -122.417))
      .map { case (la, lo) => graft.geo.H3.geoToH3String(la, lo, 9) }
    assert(verts.forall(cover.contains), s"cover $cover missing a vertex cell")
    // 3-arg form is layers=0; layers=1 is a superset
    val layered = spark.sql(s"SELECT h3_polyfill(array(37.775, 37.776, " +
      "37.7755), array(-122.419, -122.418, -122.417), 9, 1) AS c")
      .head.getSeq[String](0)
    assert(cover.toSet.subsetOf(layered.toSet))
    assert(layered.size > cover.size)
    // mismatched coordinate arrays refuse by count
    val e = intercept[Exception](spark.sql(
      "SELECT h3_polyfill(array(1.0, 2.0), array(3.0), 9)").collect())
    assert(e.getMessage.contains("latitudes"), e.getMessage)
    // null polygon → null, not a crash
    assert(spark.sql("SELECT h3_polyfill(CAST(NULL AS ARRAY<DOUBLE>), " +
      "array(1.0), 9)").head.isNullAt(0))
  }

  test("h3_polyfill: null ARRAY ELEMENTS refuse by name; layers is bounded") {
    // a null vertex inside the array must refuse loudly — toDoubleArray
    // would otherwise silently read 0.0 for the slot (a bogus (0,0)
    // vertex) or NPE opaquely depending on the ArrayData impl
    val e = intercept[Exception](spark.sql(
      "SELECT h3_polyfill(array(37.775, CAST(NULL AS DOUBLE), 37.7755), " +
        "array(-122.419, -122.418, -122.417), 9)").collect())
    assert(e.getMessage.contains("latitudes[1] is null"), e.getMessage)
    val e2 = intercept[Exception](spark.sql(
      "SELECT h3_polyfill(array(37.775, 37.776), " +
        "array(-122.419, CAST(NULL AS DOUBLE)), 9)").collect())
    assert(e2.getMessage.contains("longitudes[1] is null"), e2.getMessage)
    // layers carries the same MaxK-style bound as h3_kring's k — each
    // relaxation layer kRings every cover cell
    val e3 = intercept[Exception](spark.sql(
      "SELECT h3_polyfill(array(37.775, 37.776, 37.7755), " +
        "array(-122.419, -122.418, -122.417), 9, 100000)").collect())
    assert(e3.getMessage.contains("layers=100000 out of"), e3.getMessage)
  }
}
