package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

class SimilaritySpec extends SparkSpec {

  /** Clustered synthetic vectors: 8 centroids, 30 points each + jitter. */
  private lazy val vecs = {
    import spark.implicits._
    val r = new Random(9)
    val dims = 16
    val centroids = Array.fill(8)(Array.fill(dims)(r.nextGaussian()))
    (0 until 240).map { i =>
      val c = centroids(i % 8)
      (i.toLong, c.map(x => (x + r.nextGaussian() * 0.15).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("centroids: exact per-label per-dim means with integer keys") {
    import spark.implicits._
    val df = Seq(
      ("a", Seq(1f, 2f)), ("a", Seq(3f, 4f)),
      ("b", Seq(-1f, 0.5f))).toDF("label", "embedding")
    val out = Similarity.centroids(df).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out(("a", 0L)) == (2L, 2000000L)) // mean(1,3)=2
    assert(out(("a", 1L)) == (2L, 3000000L)) // mean(2,4)=3
    assert(out(("b", 0L)) == (1L, -1000000L))
    assert(out(("b", 1L)) == (1L, 500000L))
  }

  test("cosine of identical vectors is 1, orthogonal is 0") {
    import spark.implicits._
    val df = Seq(
      (Seq(1f, 0f), Seq(1f, 0f)),
      (Seq(1f, 0f), Seq(0f, 1f)),
      (Seq(1f, 1f), Seq(-1f, -1f))).toDF("a", "b")
    val cos = df.select(round(Similarity.cosine($"a", $"b"), 6)).collect().map(_.getDouble(0))
    assert(cos.toSeq == Seq(1.0, 0.0, -1.0))
  }

  test("brute-force top-k returns same-centroid vectors first") {
    import spark.implicits._
    val out = Similarity.bruteForceTopK(vecs.filter($"vec_id" < 3), vecs, k = 5)
    val byQuery = out.collect().groupBy(_.getLong(0))
    (0L until 3L).foreach { q =>
      val neighbors = byQuery(q).map(_.getLong(1))
      // same centroid ⇔ id ≡ q (mod 8)
      assert(neighbors.count(n => n % 8 == q % 8) >= 4, s"query $q: ${neighbors.toSeq}")
    }
  }

  test("LSH top-k recall ≥ 0.6 vs brute force at 16 bits / 4 bands") {
    import spark.implicits._
    val queries = vecs.filter($"vec_id" < 20)
    val brute = Similarity.bruteForceTopK(queries, vecs, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshTopK(queries, vecs, k = 5, dims = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & lsh).size.toDouble / brute.size.toDouble
    assert(recall >= 0.6, s"recall $recall")
  }

  test("LSH candidate volume ≪ brute-force pair volume (the scale point)") {
    import spark.implicits._
    val sig = Similarity.srpSignature($"embedding", dims = 16)
    val banded = (0 until 4).map { b =>
      vecs.select($"vec_id", lit(b).as("band_idx"),
        shiftright(sig, b * 4).bitwiseAND(lit(15)).as("band_val"))
    }.reduce(_ unionAll _)
    val a = banded.toDF("id_a", "band_idx", "band_val")
    val b = banded.toDF("id_b", "band_idx", "band_val")
    val candidates = a.join(b, Seq("band_idx", "band_val"))
      .where($"id_a" < $"id_b").select("id_a", "id_b").distinct().count()
    val brutePairs = 240L * 239L / 2L
    assert(candidates < brutePairs / 2, s"candidates $candidates vs $brutePairs")
  }

  test("IVF top-k recall ≥ 0.6 vs brute force at nlist=16/nprobe=4") {
    import spark.implicits._
    val queries = vecs.filter($"vec_id" < 20)
    val brute = Similarity.bruteForceTopK(queries, vecs, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(queries, vecs, k = 5, nlist = 16, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size.toDouble
    assert(recall >= 0.6, s"recall $recall")
    // clustered data: same-centroid neighbors live in the probed lists
    assert(ivf.nonEmpty && ivf.size <= brute.size)
  }

  test("exactCosinePairs matches the unguarded all-pairs spelling") {
    import spark.implicits._
    val labeled = vecs.withColumn("label", ($"vec_id" % 4).cast("string"))
    val guarded = Similarity.exactCosinePairs(labeled, "label", minCosX1e4 = 9000L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val a = labeled.select($"label", $"vec_id".as("id_a"), $"embedding".as("v_a"))
    val b = labeled.select($"label", $"vec_id".as("id_b"), $"embedding".as("v_b"))
    val naive = a.join(b, Seq("label")).where($"id_a" < $"id_b")
      .withColumn("k", Similarity.cosineKey($"v_a", $"v_b"))
      .where($"k" >= 9000L)
      .select($"label", $"id_a", $"id_b", $"k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(guarded == naive && guarded.nonEmpty)
  }

  test("exactCosinePairs refuses blocks above the O(block²) cap") {
    val oneBlock = vecs.withColumn("label", lit("hot"))
    val e = intercept[IllegalArgumentException] {
      Similarity.exactCosinePairs(oneBlock, "label", minCosX1e4 = 0L, maxBlockRows = 100L)
    }
    assert(e.getMessage.contains("cosineNearDups"))
  }

  test("quantizeInt8: codes bounded, reconstruction error within scale/2") {
    import spark.implicits._
    val out = Similarity.quantizeInt8(vecs).as[(Long, Long, Seq[Int])].collect()
    val orig = vecs.as[(Long, Seq[Float])].collect().toMap
    assert(out.nonEmpty)
    out.foreach { case (id, scaleKey, codes) =>
      val mx = scaleKey.toDouble / 1e6
      val scale = mx / 127.0
      assert(codes.forall(c => c >= -127 && c <= 127), s"vec $id codes out of range")
      codes.zip(orig(id)).foreach { case (c, v) =>
        assert(math.abs(c * scale - v) <= scale / 2 + 1e-6,
          s"vec $id: code $c reconstructs ${c * scale}, original $v, scale $scale")
      }
    }
  }

  test("cosine near-dups finds the planted duplicates") {
    import spark.implicits._
    val withDup = vecs.unionAll(
      vecs.filter($"vec_id" === 7L).select(($"vec_id" + 1000L).as("vec_id"), $"embedding"))
    val pairs = Similarity.cosineNearDups(withDup, dims = 16, threshold = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((7L, 1007L)))
  }

  test("lloyd: deterministic, k centroids, ties and empty clusters stable") {
    val pts = Array.tabulate(50)(i => Array((i % 5).toDouble, (i / 5).toDouble))
    val a = Similarity.lloyd(pts, k = 4, iters = 10, seed = 7L)
    val b = Similarity.lloyd(pts, k = 4, iters = 10, seed = 7L)
    assert(a.length == 4)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq) // bit-identical rerun
    // degenerate corpus (fewer distinct points than k) still yields k
    val dup = Array.fill(10)(Array(1.0, 2.0))
    assert(Similarity.lloyd(dup, k = 3, iters = 5, seed = 1L).length == 3)
  }

  test("pqEncode: m codes per vector, all within [0, k)") {
    import spark.implicits._
    val books = Similarity.pqCodebooks(vecs, m = 4, k = 8, dims = 16, seed = 5L)
    assert(books.length == 4 && books.forall(_.length == 8))
    val codes = Similarity.pqEncode(vecs, books).as[(Long, Seq[Int])].collect()
    assert(codes.length == 240)
    codes.foreach { case (_, cs) =>
      assert(cs.length == 4 && cs.forall(c => c >= 0 && c < 8))
    }
  }

  test("pqTopK ADC sums match a direct per-subspace computation") {
    import spark.implicits._
    val books = Similarity.pqCodebooks(vecs, m = 4, k = 8, dims = 16, seed = 5L)
    val queries = vecs.filter($"vec_id" < 3)
    val codes = Similarity.pqEncode(vecs, books)
    val got = Similarity.pqTopK(codes, Similarity.pqLut(queries, books), k = 240)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // recompute one query's ADC keys by hand from the same books
    val qv = vecs.filter($"vec_id" === 1L).as[(Long, Seq[Float])].head()._2
    val lut = Array.tabulate(4, 8) { (mi, c) =>
      var s = 0.0
      (0 until 4).foreach { d =>
        val x = qv(mi * 4 + d) - books(mi)(c)(d); s += x * x
      }
      math.round(s * 1e6)
    }
    codes.as[(Long, Seq[Int])].collect().filter(_._1 != 1L).foreach { case (cid, cs) =>
      val expected = cs.zipWithIndex.map { case (c, mi) => lut(mi)(c) }.sum
      assert(got((1L, cid)) == expected, s"ADC mismatch for corpus $cid")
    }
  }

  test("PQ ADC self-distance is the per-query minimum; clustered recall holds") {
    import spark.implicits._
    val books = Similarity.pqCodebooks(vecs, m = 4, k = 8, dims = 16, seed = 5L)
    val queries = vecs.filter($"vec_id" < 8)
    val codes = Similarity.pqEncode(vecs, books)
    val lut = Similarity.pqLut(queries, books)
    // encode picks the per-subspace argmin centroid, so a query's ADC
    // distance to its OWN codes is the smallest achievable sum
    val all = Similarity.pqTopK(codes.where($"vec_id" =!= -1L), lut, k = 240)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val selfKey = Similarity.pqLut(queries, books)
      .join(codes.select($"vec_id".as("query_id"),
        posexplode($"codes").as(Seq("sub", "code"))), Seq("query_id", "sub", "code"))
      .groupBy($"query_id").agg(sum($"dist_key").as("self_key"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    all.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._3).min >= selfKey(q), s"query $q: some ADC key beats self")
    }
    // candidate-restricted ADC over ALL pairs must equal the full scan
    val allPairs = vecs.select($"vec_id".as("query_id"))
      .filter($"query_id" < 8)
      .crossJoin(vecs.select($"vec_id".as("corpus_id")))
      .where($"query_id" =!= $"corpus_id")
    val within = Similarity.pqTopKWithin(allPairs, codes, lut, k = 240)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val full = Similarity.pqTopK(codes, lut, k = 240)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(within == full)
    // Quantization collapses same-cluster vectors to (near-)identical
    // codes, so WITHIN-cluster fine ordering is unrecoverable by design —
    // the right retrieval property for a coarse quantizer is CLUSTER
    // membership: nearly all of each query's PQ top-10 must be its own
    // cluster's members (id ≡ q mod 8). Exact re-ranking of ADC survivors
    // (the standard PQ follow-up) is rankCandidates, already spec-covered.
    val pq10 = Similarity.pqTopK(codes, lut, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    pq10.groupBy(_._1).foreach { case (q, rows) =>
      val sameCluster = rows.count { case (_, cid) => cid % 8 == q % 8 }
      assert(sameCluster >= 8, s"query $q: only $sameCluster/10 same-cluster")
    }
  }
}
