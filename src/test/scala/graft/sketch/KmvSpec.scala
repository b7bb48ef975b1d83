package graft.sketch

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KmvSpec extends SparkSpec {

  test("below capacity the sketch is exact") {
    import spark.implicits._
    val df = (1 to 40).map(i => ("g", s"v$i")).toDF("k", "v")
      .union(Seq(("g", "v1"), ("g", "v2")).toDF("k", "v")) // dups collapse
    val st = Kmv.sketchState(df, "k", "v", k = 64)
      .withColumn("est", Kmv.estimate(col("n_kept"), col("kth_hash"), 64))
      .collect().head
    assert(st.getAs[Long]("n_kept") == 40L)
    assert(st.getAs[Double]("est") == 40.0)
  }

  test("above capacity the estimate lands near the truth") {
    import spark.implicits._
    val n = 2000
    val df = (1 to n).map(i => ("g", s"value-$i")).toDF("k", "v")
    val st = Kmv.sketchState(df, "k", "v", k = 64)
      .withColumn("est", Kmv.estimate(col("n_kept"), col("kth_hash"), 64))
      .collect().head
    assert(st.getAs[Long]("n_kept") == 64L)
    val est = st.getAs[Double]("est")
    // stderr ~ 1/sqrt(k-2) ~ 12.7%; allow 4 sigma on this fixed dataset
    assert(math.abs(est - n) / n < 0.5, s"estimate $est too far from $n")
  }

  test("nulls are dropped like count(DISTINCT) and groups stay separate") {
    import spark.implicits._
    val df = Seq(("a", "x"), ("a", "y"), ("a", null), ("b", "x")).toDF("k", "v")
    val out = Kmv.sketchState(df, "k", "v", k = 8).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 2L, "b" -> 1L))
  }

  test("sketchKeptHashed drops null hashes instead of dying in the encoder") {
    import spark.implicits._
    // a null hv row used to hit the primitive-Long Dataset encoder and
    // fail with an opaque NPE; the contract is sketchState's
    // count-DISTINCT-of-values semantics — nulls are simply not values
    val df = Seq(("a", Some(5L)), ("a", None), ("b", Some(9L)))
      .toDF("k", "hv")
    val out = Kmv.sketchKeptHashed(df, "k", "hv", k = 8).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1).toList).toMap
    assert(out == Map("a" -> List(5L), "b" -> List(9L)))
    // numeric strings cast cleanly; a NON-numeric string hv fails with
    // ANSI's own descriptive cast error (junk input is a caller bug, not
    // a null to silently drop) — never the opaque encoder NPE
    val strDf = Seq(("a", "5"), ("b", "9")).toDF("k", "hv")
    val out2 = Kmv.sketchKeptHashed(strDf, "k", "hv", k = 8).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1).toList).toMap
    assert(out2 == Map("a" -> List(5L), "b" -> List(9L)))
    val junk = Seq(("a", "5"), ("a", "not-a-number")).toDF("k", "hv")
    val e = intercept[Exception](
      Kmv.sketchKeptHashed(junk, "k", "hv", k = 8).collect())
    assert(e.getMessage.contains("CAST") || e.getMessage.contains("cast"),
      s"expected a descriptive cast error, got: ${e.getMessage}")
  }

  test("merge is order- and split-independent on random partials (property)") {
    val rng = new scala.util.Random(42)
    import scala.jdk.CollectionConverters._
    (1 to 100).foreach { _ =>
      val k = 1 + rng.nextInt(16)
      val all = Array.fill(5 + rng.nextInt(200))(rng.nextLong(1L << 60))
      val expect = all.distinct.sorted.take(k).toSeq
      // random split into partials, each pre-trimmed like a map task would
      val partials = all.grouped(1 + rng.nextInt(all.length)).map { chunk =>
        val s = new java.util.TreeSet[java.lang.Long]()
        Kmv.mergeKept(s, chunk, k)
        s.iterator.asScala.map(_.longValue).toArray
      }.toSeq
      val merged = new java.util.TreeSet[java.lang.Long]()
      rng.shuffle(partials).foreach(Kmv.mergeKept(merged, _, k))
      assert(merged.iterator.asScala.map(_.longValue).toSeq == expect)
    }
  }

  test("merge of bottom-k partials equals bottom-k of the union") {
    val k = 5
    val a = Array(10L, 20L, 30L, 40L, 50L)
    val b = Array(5L, 15L, 20L, 60L, 70L)
    val set = new java.util.TreeSet[java.lang.Long]()
    Kmv.mergeKept(set, a, k)
    Kmv.mergeKept(set, b, k)
    val merged = {
      import scala.jdk.CollectionConverters._
      set.iterator.asScala.map(_.longValue).toSeq
    }
    val expect = (a ++ b).distinct.sorted.take(k).toSeq
    assert(merged == expect)
  }

  test("sketchKept: ascending, bounded by k, consistent with sketchState") {
    import spark.implicits._
    val df = (1 to 300).map(i => (s"g${i % 3}", s"value-$i")).toDF("k", "v")
    val kept = Kmv.sketchKept(df, "k", "v", k = 32).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val state = Kmv.sketchState(df, "k", "v", k = 32).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(kept.keySet == state.keySet && kept.size == 3)
    kept.foreach { case (g, arr) =>
      assert(arr.length <= 32 && arr == arr.sorted, s"$g not ascending-bounded")
      assert(arr.length.toLong == state(g)._1, s"$g n_kept drift")
      assert(arr.last == state(g)._2, s"$g kth_hash drift")
    }
  }

  test("sketchKept of identical value sets is identical (set-op ground truth)") {
    import spark.implicits._
    // two keys over the SAME value set → byte-identical sketches, so the
    // q219 pair algebra would report full overlap (n_common == |union-k|)
    val vals = (1 to 500).map(i => s"shingle-$i")
    val df = (vals.map(("a", _)) ++ vals.map(("b", _))).toDF("k", "v")
    val kept = Kmv.sketchKept(df, "k", "v", k = 64).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(kept("a") == kept("b"))
    assert(kept("a").length == 64)
  }
}
