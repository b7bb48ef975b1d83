package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    Seq(
      (1L, base),
      (2L, base),                                          // exact dup of 1
      (3L, base.replace("lazy", "sleepy")),                // near dup of 1
      (4L, "completely different words about spark sql engines and columnar formats"),
      (5L, "another unrelated text mentioning streaming watermarks and state stores")
    ).toDF("doc_id", "text")
  }

  test("exact dedup groups identical content under the min id") {
    val out = Dedup.exact(docs).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSet // (keep_id, n_dups)
    assert(out.contains((1L, 2L))) // docs 1+2 collapse
    assert(out.count(_._2 == 1L) == 3)
  }

  test("spanDupStats: identical docs fully covered; near-dup, distinct and short docs not") {
    val out = Dedup.spanDupStats(docs, w = 10).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // docs 1+2 are identical 14-token texts: 5 windows, all shared
    assert(out(1L) == (5L, 5L) && out(2L) == (5L, 5L))
    // doc 3 differs at token 8, which every 10-token window covers
    assert(out(3L) == (5L, 0L))
    // doc 4 has exactly 10 tokens -> one window, unshared
    assert(out(4L) == (1L, 0L))
    // doc 5 has 9 tokens -> no window -> no row
    assert(!out.contains(5L))
  }

  test("minhash LSH finds exact and near dups, not unrelated pairs") {
    val pairs = Dedup.minhashCandidates(docs, numHashes = 8, rowsPerBand = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "exact dup must collide in every band")
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L)),
      "near dup should collide in some band")
    assert(!pairs.contains((4L, 5L)), "unrelated docs should not collide")
  }

  test("dedupGroups: transitive near-dup group under min id, singletons kept") {
    val out = Dedup.dedupGroups(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // docs 1+2 (exact) and likely 3 (near) share group 1; 4 and 5 are singletons
    assert(out(1L)._1 >= 2, s"group 1 should hold the dup pair: $out")
    assert(out(1L)._2 == 1L, "keep id is the min doc id")
    assert(out(4L) == (1L, 4L) && out(5L) == (1L, 5L), "unrelated docs stay singletons")
    assert(out.values.map(_._1).sum == 5, "groups partition the corpus")
  }

  test("bandsPerRow (streaming spelling) equals the batch signature+band path") {
    import spark.implicits._
    // include a zero-shingle doc: both paths must emit no bands for it
    val in = docs.unionAll(Seq((6L, "ab")).toDF("doc_id", "text"))
    val batch = Dedup.lshBands(Dedup.minhashSignatures(in))
      .select($"band_idx", $"band_val", $"doc_id")
    val perRow = Dedup.bandsPerRow(in)
    assert(batch.exceptAll(perRow).count() == 0 &&
      perRow.exceptAll(batch).count() == 0)
    assert(perRow.where($"doc_id" === 6L).isEmpty)
    // and it runs on an actual STREAMING frame (the property the per-row
    // spelling exists for — no aggregation before the probe join)
    val streamed = Dedup.bandsPerRow(
      spark.readStream.schema(in.schema)
        .parquet(java.nio.file.Files.createTempDirectory("bpr").toString))
    assert(streamed.isStreaming)
  }

  test("ngram jaccard ranks near-dup above unrelated") {
    import spark.implicits._
    val blocked = docs.withColumn("source", lit("s"))
    val out = Dedup.ngramJaccardPairs(blocked, Seq("source"), threshold = 0.0)
      .select($"id_a", $"id_b", $"jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out((1L, 2L)) == 1.0)
    assert(out((1L, 3L)) > 0.5)
    // contract since the explode-join rewrite: a zero-intersection pair is
    // ABSENT (Jaccard 0 pairs are never emitted, even at threshold <= 0)
    assert(!out.contains((4L, 5L)))
  }

  test("hot-shingle cap: boilerplate-only pairs drop, genuine pairs keep their jaccard") {
    import spark.implicits._
    // docs 1-5 share exactly ONE shingle ("the quick fox" — boilerplate,
    // df 5); docs 6/7 are genuine near-dups sharing three non-hot shingles
    val corpus = (Seq(
      (1L, "the quick fox alpha1 beta1"), (2L, "the quick fox alpha2 beta2"),
      (3L, "the quick fox alpha3 beta3"), (4L, "the quick fox alpha4 beta4"),
      (5L, "the quick fox alpha5 beta5"),
      (6L, "alpha beta gamma delta epsilon"),
      (7L, "alpha beta gamma delta zeta"))
    ).toDF("doc_id", "text").withColumn("source", lit("s"))
    def pairs(maxDf: Int) =
      Dedup.ngramJaccardPairs(corpus, Seq("source"), threshold = 0.0,
        maxShingleDf = maxDf)
        .select($"id_a", $"id_b", $"jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val uncapped = pairs(100)   // above corpus max df → identity
    val capped = pairs(4)       // boilerplate shingle (df 5) dropped
    // uncapped: every 1-5 pair shares the boilerplate shingle
    assert(uncapped.keySet.count { case (a, b) => a <= 5 && b <= 5 } == 10)
    // drop accounting: capping removes EXACTLY the boilerplate-only pairs —
    // nothing else appears or disappears
    assert(capped.keySet == uncapped.keySet.filter { case (a, b) => a >= 6 || b >= 6 })
    // genuine near-dup pair survives with its jaccard UNCHANGED (no shared
    // shingle is hot), and every surviving pair obeys the lower-bound law
    assert(capped((6L, 7L)) == uncapped((6L, 7L)))
    assert(capped.forall { case (k, j) => j <= uncapped(k) })
    // containment carries the identical cap (same exploded stream)
    val cm = Dedup.containmentPairs(corpus, Seq("source"), thresholdMicro = 0L,
      maxShingleDf = 4)
      .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cm == capped.keySet)
  }

  test("containment: a doc quoted inside a longer one scores 1.0 where jaccard stays low") {
    import spark.implicits._
    val short = "alpha beta gamma delta epsilon zeta"
    val long = short + " plus many extra tokens about spark shuffles joins " +
      "aggregates windows state stores watermarks checkpoints manifests files"
    val blocked = Seq((1L, short), (2L, long),
      (3L, "entirely unrelated content about parquet row groups and footers"))
      .toDF("doc_id", "text").withColumn("source", lit("s"))
    val cm = Dedup.containmentPairs(blocked, Seq("source"), thresholdMicro = 0L)
      .select($"id_a", $"id_b", $"containment_micro").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // every shingle of the short doc appears in the long one → exactly 1.0
    assert(cm((1L, 2L)) == 1000000L)
    // …where symmetric Jaccard sees only |A|/|B|
    val j = Dedup.ngramJaccardPairs(blocked, Seq("source"), threshold = 0.0)
      .where($"id_a" === 1L && $"id_b" === 2L).select($"jaccard").head.getDouble(0)
    assert(j < 0.3, s"jaccard $j")
    // zero-intersection pairs are absent (explode-join contract, like q36)
    assert(!cm.contains((1L, 3L)) && !cm.contains((2L, 3L)))
    // law: containment >= jaccard for every emitted pair (min-denominator)
    assert(cm((1L, 2L)) >= math.round(j * 1000000))
  }

  test("simhash16: identical content collides, near dup stays close") {
    import spark.implicits._
    val sh = docs.select($"doc_id", Dedup.simhash16($"text").as("s"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    def ham(a: Int, b: Int) = Integer.bitCount(a ^ b)
    assert(ham(sh(1L), sh(2L)) == 0)
    assert(ham(sh(1L), sh(3L)) <= 4)
    // 16 bits is the oracle-tractable width; separation power for unrelated
    // text is weak at this width by construction — covered by simhash64 below
  }

  test("simhashNearDups: exact dup paired at hamming 0, unrelated absent") {
    val pairs = Dedup.simhashNearDups(docs, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs((1L, 2L)) == 0L, s"exact dup must pair at hamming 0: $pairs")
    assert(!pairs.contains((4L, 5L)), "unrelated docs must not pair")
    // every emitted pair respects the cap, and the band join found it
    assert(pairs.values.forall(_ <= 3L))
  }

  test("simhashSigs60: empty-shingle doc takes the all-ones signature; cap enforced") {
    import spark.implicits._
    val tiny = Seq((1L, "only two")).toDF("doc_id", "text") // < 3 tokens → no shingles
    val sig = Dedup.simhashSigs60(tiny).collect().head.getLong(1)
    assert(sig == (1L << 60) - 1L)
    val e = intercept[IllegalArgumentException] {
      Dedup.simhashNearDups(docs, maxHamming = 4)
    }
    assert(e.getMessage.contains("hamming"))
  }

  test("simhashNearDups excludes zero-shingle docs from pairing") {
    import spark.implicits._
    // two short docs would share the empty-input signature — pairing them
    // (and every other short doc, quadratically) would be semantic garbage
    val withTiny = docs.unionAll(
      Seq((6L, "too short"), (7L, "also short")).toDF("doc_id", "text"))
    val pairs = Dedup.simhashNearDups(withTiny)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!pairs.exists(p => p._1 >= 6L || p._2 >= 6L), s"short docs paired: $pairs")
    assert(pairs.contains((1L, 2L)), "real dups still found")
  }

  test("simhash64 separates near dups from unrelated text") {
    def toks(s: String) = s.split(" ").toSeq
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val near = base.replace("lazy", "sleepy")
    val far = "completely different words about spark sql engines and columnar formats everywhere"
    val (a, b, c) = (Dedup.simhash64(toks(base)), Dedup.simhash64(toks(near)),
      Dedup.simhash64(toks(far)))
    assert(Dedup.hamming64(a, Dedup.simhash64(toks(base))) == 0)
    assert(Dedup.hamming64(a, b) < Dedup.hamming64(a, c))
    assert(Dedup.hamming64(a, c) > 10) // unrelated ≈ 32 expected at 64 bits
  }
}
