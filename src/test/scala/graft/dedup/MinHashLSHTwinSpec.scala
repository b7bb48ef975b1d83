package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The MLlib MinHashLSH path (q161) is an INDEPENDENT implementation of
  * minhash candidate generation — same contract as [[Dedup]]'s banded
  * pipeline, none of the code. Both must recover planted near-dups. */
class MinHashLSHTwinSpec extends SparkSpec {

  private lazy val corpus = {
    import spark.implicits._
    // base docs must be mutually DISSIMILAR — every token carries the doc
    // index, so cross-doc shingle overlap is zero
    val base = (0 until 40).map { i =>
      (i.toLong, (0 until 12).map(t => s"w${i}_$t").mkString(" "))
    }
    // plant two near-duplicate pairs: (100, 101) and (200, 201)
    val dups = Seq(
      (100L, "the quick brown fox jumps over the lazy dog again and again today"),
      (101L, "the quick brown fox jumps over the lazy dog again and again tonight"),
      (200L, "large scale data processing with spark is efficient and reliable work"),
      (201L, "large scale data processing with spark is efficient and reliable effort"))
    (base ++ dups).toDF("doc_id", "text")
  }

  private def mllibPairs(threshold: Double): Set[(Long, Long)] = {
    import org.apache.spark.ml.feature.MinHashLSH
    import org.apache.spark.ml.linalg.Vectors
    val space = 1 << 20
    val toSparse = udf { (sh: Seq[String]) =>
      val idx = sh.map(x => math.floorMod(x.hashCode, space)).distinct.sorted.toArray
      Vectors.sparse(space, idx, Array.fill(idx.length)(1.0))
    }
    val feat = corpus.select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
      .where(size(col("sh")) > 0)
      .select(col("doc_id"), toSparse(col("sh")).as("features"))
    val model = new MinHashLSH().setNumHashTables(8).setSeed(42L)
      .setInputCol("features").setOutputCol("hashes").fit(feat)
    model.approxSimilarityJoin(feat, feat, threshold, "dist")
      .select(col("datasetA.doc_id").as("id_a"), col("datasetB.doc_id").as("id_b"))
      .where(col("id_a") < col("id_b")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("MLlib twin and the banded pipeline both recover the planted pairs") {
    val mllib = mllibPairs(0.9)
    assert(mllib.contains((100L, 101L)) && mllib.contains((200L, 201L)),
      s"MLlib candidates missed a planted pair: $mllib")
    val banded = Dedup.minhashCandidates(corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded.contains((100L, 101L)) && banded.contains((200L, 201L)),
      s"banded candidates missed a planted pair: $banded")
  }

  test("exact-Jaccard rescore keeps the planted pairs, drops weak ones") {
    import spark.implicits._
    val sh = corpus.select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
      .where(size(col("sh")) > 0)
    val cands = mllibPairs(0.9).toSeq.toDF("id_a", "id_b")
    val a = sh.select($"doc_id".as("id_a"), $"sh".as("sh_a"))
    val b = sh.select($"doc_id".as("id_b"), $"sh".as("sh_b"))
    val kept = cands.join(a, "id_a").join(b, "id_b")
      .withColumn("jaccard", Dedup.jaccard($"sh_a", $"sh_b"))
      .where($"jaccard" >= 0.5)
      .select($"id_a", $"id_b") // using-column joins reorder — never positional
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(kept == Set((100L, 101L), (200L, 201L)), s"rescore kept $kept")
  }
}
