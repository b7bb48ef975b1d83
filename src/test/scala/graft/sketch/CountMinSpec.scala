package graft.sketch

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkSpec {

  test("estimates never undercount and are exact without collisions") {
    import spark.implicits._
    val df = (1 to 500).map(i => s"k${i % 20}").toDF("k") // 20 keys, 25 each
    val cms = CountMin.build(df, "k", w = 1024, d = 4)
    val keys = df.distinct()
    val est = CountMin.estimate(cms, keys, "k", w = 1024, d = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 20 keys in 1024 buckets x 4 rows: expect exact everywhere
    assert(est.size == 20 && est.values.forall(_ == 25L))
  }

  test("under heavy collision pressure estimates stay >= truth") {
    import spark.implicits._
    val rng = new scala.util.Random(3)
    val rows = (1 to 2000).map(_ => s"u${rng.nextInt(300)}")
    val df = rows.toDF("k")
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cms = CountMin.build(df, "k", w = 16, d = 3) // tiny sketch: collisions guaranteed
    val est = CountMin.estimate(cms, df.distinct(), "k", w = 16, d = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    truth.foreach { case (k, n) => assert(est(k) >= n, s"$k: est ${est(k)} < $n") }
    // total mass per row is conserved: sum of all cells in one row = input size
    val rowSums = cms.groupBy($"row_i").agg(sum($"cnt").as("s"))
      .collect().map(_.getLong(1))
    assert(rowSums.forall(_ == 2000L))
  }
}
