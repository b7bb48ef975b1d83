package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewToolsSpec extends SparkSpec {

  test("salted join equals plain join on skewed data") {
    import spark.implicits._
    // hot key: 10k rows of key=1, trickle on others
    val fact = (Seq.fill(10000)(1) ++ (2 to 500)).zipWithIndex
      .map { case (k, i) => (k, i.toLong) }.toDF("k", "payload")
    val dim = (1 to 500).map(k => (k, s"dim_$k")).toDF("k", "name")

    val plain = fact.join(dim, Seq("k")).select($"k", $"payload", $"name")
    val salted = SkewTools.saltedJoin(fact, dim, Seq("k"), factor = 8)
      .select($"k", $"payload", $"name")
    assert(salted.exceptAll(plain).count() == 0 && plain.exceptAll(salted).count() == 0)
    assert(salted.count() == 10499)
  }

  test("salt spreads the hot key across partitions") {
    import spark.implicits._
    val fact = Seq.fill(5000)((1, "x")).toDF("k", "v")
    val salts = fact.withColumn("__salt",
      pmod(xxhash64(col("k"), col("v")), lit(8)).cast("int"))
      .select("__salt").distinct().count()
    // identical rows hash identically — spreading needs row variety; with a
    // varying payload all 8 salts appear
    val fact2 = (1 to 5000).map(i => (1, s"x$i")).toDF("k", "v")
    val salts2 = fact2.withColumn("__salt",
      pmod(xxhash64(col("k"), col("v")), lit(8)).cast("int"))
      .select("__salt").distinct().count()
    assert(salts2 == 8, s"got $salts2 salt values")
    assert(salts >= 1)
  }

  test("keyHistogram surfaces the heavy hitter") {
    import spark.implicits._
    val fact = (Seq.fill(1000)(7) ++ (1 to 100)).map(k => (k, "p")).toDF("k", "p")
    val top = SkewTools.keyHistogram(fact, Seq("k"), topN = 1).head
    assert(top.getInt(0) == 7 && top.getLong(1) == 1001L)
  }
}
