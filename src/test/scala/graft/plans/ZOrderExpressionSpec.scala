package graft.plans

import graft.SparkSpec
import graft.geo.Morton

class ZOrderExpressionSpec extends SparkSpec {

  test("z_order SQL registration evaluates Morton.interleave, nulls propagate") {
    val row = spark.sql(
      "SELECT z_order(CAST(3 AS BIGINT), CAST(5 AS BIGINT)) AS z, " +
        "z_order(CAST(NULL AS BIGINT), CAST(5 AS BIGINT)) AS zn").collect().head
    assert(row.getLong(0) == Morton.interleave(3L, 5L))
    assert(row.isNullAt(1))
  }

  test("columnar path agrees with the Scala core over a range") {
    import spark.implicits._
    val got = spark.range(0, 1000)
      .selectExpr("id", "z_order(id, id * 7 % 1024) AS z")
      .as[(Long, Long)].collect()
    got.foreach { case (id, z) =>
      assert(z == Morton.interleave(id, id * 7 % 1024), s"id=$id")
    }
  }

  test("z-sorted write clusters a 2-D box into few row groups' worth of files") {
    import spark.implicits._
    // 64x64 grid written range-partitioned+sorted by z; a 8x8 aligned box
    // lands in a narrow z range — the ZORDER write pattern S10 approximates
    val cells = (0 until 64).flatMap(i => (0 until 64).map(j => (i.toLong, j.toLong)))
      .toDF("i", "j").selectExpr("i", "j", "z_order(i, j) AS z")
    val boxZs = cells.where($"i" < 8 && $"j" < 8).select($"z").as[Long].collect()
    assert(boxZs.max < 64L * 64 / 64) // the aligned 8x8 block is one contiguous z run: [0, 64)
  }
}
