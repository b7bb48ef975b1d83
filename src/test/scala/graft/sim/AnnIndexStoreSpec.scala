package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnnIndexStoreSpec extends SparkSpec {

  private def corpus() = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (0L until 200L).map { id =>
      (id, Array.fill(16)(rnd.nextFloat() * 2f - 1f).toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("save → load → probe equals the fresh-fit candidate set") {
    val base = java.nio.file.Files.createTempDirectory("annidx").toString + "/ivf"
    val c = corpus().cache()
    AnnIndexStore.save(spark, base, c, nlist = 4, seed = 42L)
    val queries = c.where(col("vec_id") < 3)
    val persisted = AnnIndexStore.probe(spark, base, queries, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fresh = Similarity.ivfCandidates(queries, c, nlist = 4, nprobe = 2, seed = 42L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(persisted == fresh, "loaded-index probe diverged from fresh fit")
    assert(persisted.nonEmpty)
    // and the ranked search over both candidate sets agrees
    import spark.implicits._
    val rp = Similarity.rankCandidates(persisted.toSeq.toDF("query_id", "corpus_id"),
      queries, c, k = 5).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val rf = Similarity.rankCandidates(fresh.toSeq.toDF("query_id", "corpus_id"),
      queries, c, k = 5).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rp == rf)
  }

  test("params sidecar round-trips and assignments cover the corpus") {
    val base = java.nio.file.Files.createTempDirectory("annidx2").toString + "/ivf"
    val c = corpus()
    AnnIndexStore.save(spark, base, c, nlist = 4, seed = 42L)
    val p = AnnIndexStore.params(spark, base)
    assert(p("nlist") == 4L && p("dims") == 16L && p("seed") == 42L)
    val asg = spark.read.parquet(s"$base/assignments")
    assert(asg.count() == 200L)
    assert(asg.select("list_id").distinct().count() <= 4L)
    assert(asg.groupBy("corpus_id").count().where(col("count") > 1).count() == 0L,
      "a corpus vector must sit in exactly one inverted list")
  }
}
