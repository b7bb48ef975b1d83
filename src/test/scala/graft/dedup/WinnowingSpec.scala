package graft.dedup

import graft.SparkSpec

class WinnowingSpec extends SparkSpec {

  private def fps(rows: Seq[(Long, String)], k: Int = 4, w: Int = 5): Map[Long, Set[Long]] = {
    import spark.implicits._
    Dedup.winnowingFingerprints(rows.toDF("doc_id", "text"), "text", k, w)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (id, xs) => id -> xs.map(_._2).toSet }
  }

  test("the winnowing guarantee: a shared k+w-1 token run shares a fingerprint") {
    // docs share the run "g1..g8" (k+w-1 = 8 tokens) at DIFFERENT positions
    // inside otherwise-disjoint text — position independence is the point
    val shared = (1 to 8).map(i => s"g$i").mkString(" ")
    val rng = new scala.util.Random(11)
    (1 to 20).foreach { trial =>
      def noise(n: Int, tag: String) =
        Seq.fill(n)(s"$tag${rng.nextInt(1000)}").mkString(" ")
      val a = noise(rng.nextInt(30), "a") + " " + shared + " " + noise(rng.nextInt(30), "x")
      val b = noise(rng.nextInt(30), "b") + " " + shared + " " + noise(rng.nextInt(30), "y")
      val m = fps(Seq((1L, a.trim), (2L, b.trim)))
      assert(m(1L).intersect(m(2L)).nonEmpty,
        s"trial $trial: no shared fingerprint despite a shared 8-token run")
    }
  }

  test("fingerprint sets are sparse relative to full shingling") {
    val text = (1 to 400).map(i => s"tok${i % 97}").mkString(" ")
    val m = fps(Seq((1L, text)))
    val nGrams = 400 - 3
    // expected density ~2/(w+1) = 1/3 of grams; allow generous slack but
    // require real sparsification (and dedup of repeated selections)
    assert(m(1L).size < nGrams / 2, s"${m(1L).size} fingerprints for $nGrams grams")
    assert(m(1L).nonEmpty)
  }

  test("short documents emit no fingerprints; k,w validated") {
    val m = fps(Seq((1L, "only seven tokens are in this doc"), (2L, "")))
    assert(m.isEmpty, s"short docs fingerprinted: $m")
    intercept[IllegalArgumentException](
      Dedup.winnowingFingerprints(null, "text", 0, 5))
  }

  test("deterministic across runs") {
    val text = (1 to 100).map(i => s"w${(i * 7) % 31}").mkString(" ")
    assert(fps(Seq((1L, text))) == fps(Seq((1L, text))))
  }

  test("capHotFingerprints drops exactly the above-cap keys, within the blocking key") {
    import spark.implicits._
    // fp 100 shared by 5 docs in s0 (hot at cap 3); fp 200 by 2 (kept);
    // fp 100 in s1 by 1 — df is counted per (source, fp), so s1's copy
    // survives even though the fp value is globally common
    val df = ((1L to 5L).map(d => ("s0", d, 100L)) ++
      Seq(("s0", 1L, 200L), ("s0", 2L, 200L), ("s1", 9L, 100L)))
      .toDF("source", "doc_id", "fp")
    val capped = Dedup.capHotFingerprints(df, maxDf = 3, Seq("source", "fp"))
    val kept = capped.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(kept == Set(("s0", 1L, 200L), ("s0", 2L, 200L), ("s1", 9L, 100L)), kept)
    // the law the cap exists for: post-cap df ≤ maxDf everywhere, so a
    // pairing self-join fans out at most C(maxDf, 2) rows per key
    val maxLeft = capped.groupBy("source", "fp").count()
      .agg(org.apache.spark.sql.functions.max("count")).head.getLong(0)
    assert(maxLeft <= 3, s"post-cap df $maxLeft exceeds the cap")
  }

  test("capHotFingerprints above the corpus max df is the identity") {
    import spark.implicits._
    val df = ((1L to 5L).map(d => ("s0", d, 100L)) :+ ("s1", 9L, 300L))
      .toDF("source", "doc_id", "fp")
    assert(Dedup.capHotFingerprints(df, maxDf = 5, Seq("source", "fp")).count() == 6L)
    intercept[IllegalArgumentException](Dedup.capHotFingerprints(df, 0, Seq("fp")))
    intercept[IllegalArgumentException](Dedup.capHotFingerprints(df, 3, Nil))
  }
}
