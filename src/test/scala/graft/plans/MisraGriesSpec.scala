package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native `mg_topk` Misra–Gries aggregate. Counter values are
  * merge-order-dependent by construction, so the tests pin the invariants
  * callers may rely on: the candidate set is bounded by k, and EVERY item
  * with true frequency > n/(k+1) appears in it whatever Spark's
  * partial/merge order did (the mergeable-summaries bound q212 builds
  * its deterministic exact-recount spelling on). */
class MisraGriesSpec extends SparkSpec {

  private def candidates(rows: Seq[String], k: Int, parts: Int): Set[String] = {
    import spark.implicits._
    rows.toDF("item").repartition(parts) // force partial + serialize + merge
      .createOrReplaceTempView("mg_in")
    spark.sql(s"SELECT mg_topk(item, $k) AS c FROM mg_in")
      .select(explode(col("c")).as("item")).collect().map(_.getString(0)).toSet
  }

  test("guarantee: every item above n/(k+1) survives any merge order") {
    // 500 distinct tail items (1 occurrence each) + 3 heavy items far above
    // the n/(k+1) threshold, shuffled deterministically; k=32 << 503
    // distinct so the summary is under constant eviction pressure.
    val tail = (0 until 500).map(i => s"t$i")
    val heavy = Seq.fill(120)("h0") ++ Seq.fill(90)("h1") ++ Seq.fill(60)("h2")
    val rows = new scala.util.Random(7).shuffle(tail ++ heavy)
    val n = rows.size // 770; threshold n/(k+1) = 770/33 ≈ 23.3
    for (parts <- Seq(1, 4, 16)) {
      val c = candidates(rows, k = 32, parts = parts)
      assert(c.size <= 32, s"parts=$parts: ${c.size} candidates > k")
      for (h <- Seq("h0", "h1", "h2"))
        assert(c.contains(h), s"parts=$parts: heavy item $h evicted (n=$n)")
    }
  }

  test("under-capacity input is kept exactly") {
    val rows = Seq("a", "a", "b", "c", "c", "c")
    assert(candidates(rows, k = 16, parts = 3) == Set("a", "b", "c"))
  }

  test("nulls drop; empty input yields an empty array") {
    import spark.implicits._
    Seq(Some("x"), None, Some("x"), None).toDF("item")
      .createOrReplaceTempView("mg_in")
    val arr = spark.sql("SELECT mg_topk(item, 4) AS c FROM mg_in")
      .head.getSeq[String](0)
    assert(arr == Seq("x"))
    spark.emptyDataset[String].toDF("item").createOrReplaceTempView("mg_in")
    assert(spark.sql("SELECT mg_topk(item, 4) AS c FROM mg_in")
      .head.getSeq[String](0).isEmpty)
  }

  test("k must be a literal int; item must be string") {
    import spark.implicits._
    Seq("a").toDF("item").createOrReplaceTempView("mg_in")
    intercept[Exception] {
      spark.sql("SELECT mg_topk(item, item) FROM mg_in").collect()
    }
    intercept[Exception] {
      spark.sql("SELECT mg_topk(CAST(1 AS INT), 4) FROM mg_in").collect()
    }
  }
}
