package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpec {

  test("bounded-heap top-k equals the window row_number spelling") {
    import spark.implicits._
    // adversarial: heavy ties, negative values, uneven group sizes
    val df = (1L to 3000L).map { i =>
      (s"g${i % 7}", ((i * 37) % 23).toDouble - 11.0, i)
    }.toDF("k", "v", "id").repartition(13)
    val got = TopK.topK(df, "k", "v", "id", k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val w = Window.partitionBy($"k").orderBy($"v".desc, $"id")
    val want = df.withColumn("rank", row_number().over(w).cast("long"))
      .where($"rank" <= 5)
      .select($"k", $"id", $"v", $"rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(got == want)
  }

  test("equality with the window holds across random data and partitionings (property)") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    (1 to 3).foreach { round =>
      val n = 500 + rng.nextInt(1500)
      val rows = (1 to n).map { i =>
        (s"g${rng.nextInt(5)}", rng.nextInt(40).toDouble - 20.0, i.toLong)
      }
      val df = rows.toDF("k", "v", "id").repartition(1 + rng.nextInt(20))
      val k = 1 + rng.nextInt(7)
      val got = TopK.topK(df, "k", "v", "id", k)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
      val want = rows.groupBy(_._1).toSeq.flatMap { case (key, grp) =>
        grp.sortBy { case (_, v, id) => (-v, id) }.take(k)
          .zipWithIndex.map { case ((_, _, id), i) => (key, id, i + 1L) }
      }.toSet
      assert(got == want, s"round $round (k=$k, n=$n)")
    }
  }

  test("groups smaller than k emit all their rows, ranked") {
    import spark.implicits._
    val df = Seq(("a", 1.0, 1L), ("a", 2.0, 2L)).toDF("k", "v", "id")
    val got = TopK.topK(df, "k", "v", "id", k = 10)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getLong(3)))
    assert(got.toSeq == Seq((2L, 1L), (1L, 2L))) // v desc
  }

  test("ties rank by id ascending") {
    import spark.implicits._
    val df = Seq(("a", 5.0, 30L), ("a", 5.0, 10L), ("a", 5.0, 20L)).toDF("k", "v", "id")
    val got = TopK.topK(df, "k", "v", "id", k = 2)
      .orderBy("rank").collect().map(_.getLong(1))
    assert(got.toSeq == Seq(10L, 20L))
  }
}
