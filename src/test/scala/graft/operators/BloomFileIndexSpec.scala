package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomFileIndexSpec extends SparkSpec {

  private def stage(path: String): Unit = {
    import spark.implicits._
    // 1000 distinct ids range-clustered into 10 files: each id lives in
    // exactly one file, so a point probe SHOULD prune most of them
    (0L until 1000L).toDF("id")
      .withColumn("payload", col("id") * 7)
      .repartitionByRange(10, col("id"))
      .write.mode("overwrite").parquet(path)
  }

  test("point probes prune files; pruned read never loses rows") {
    val path = java.nio.file.Files.createTempDirectory("bloomidx").toString
    stage(path)
    val man = BloomFileIndex.manifest(spark, path, "id",
      expectedPerFile = 200L, fpp = 0.01).cache()
    val all = man.count()
    assert(all == 10L, s"expected 10 files, got $all")
    // single-key probe: the true file plus at most a false positive or two
    val hit = BloomFileIndex.prune(man, Seq("437"))
    assert(hit.nonEmpty && hit.size <= 3, s"expected <=3 files, got ${hit.size}")
    // soundness on a spread of probes: pruned-read + filter == full filter
    val probes = Seq(0L, 99L, 250L, 437L, 618L, 999L)
    val files = BloomFileIndex.prune(man, probes.map(_.toString))
    val pruned = DataSkipping.readFiles(spark, path, files)
      .where(col("id").isin(probes: _*))
      .select("id", "payload").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = spark.read.parquet(path)
      .where(col("id").isin(probes: _*))
      .select("id", "payload").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pruned == full)
    assert(pruned.size == probes.size)
  }

  test("prune refuses a bloom manifest past the planning cap, loudly") {
    val path = java.nio.file.Files.createTempDirectory("bloomcap").toString + "/t"
    stage(path)
    val man = BloomFileIndex.manifest(spark, path, "id")
    val e = intercept[IllegalArgumentException] {
      BloomFileIndex.prune(man, Seq("1"), maxFiles = 3)
    }
    assert(e.getMessage.contains("BloomFileIndex.prune") &&
      e.getMessage.contains("more than 3 files"))
  }

  test("per-partition partial filters merge per file (split-file scan)") {
    val path = java.nio.file.Files.createTempDirectory("bloomidx2").toString
    stage(path)
    // force each parquet file to span multiple scan partitions so the
    // two-phase build exercises mergeInPlace, then check membership is
    // still complete: every id must hit its own file
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "1024")
      val man = BloomFileIndex.manifest(spark, path, "id",
        expectedPerFile = 200L, fpp = 0.01)
      val misses = (0L until 1000L by 37L).filter { id =>
        BloomFileIndex.prune(man, Seq(id.toString)).isEmpty
      }
      assert(misses.isEmpty, s"false drops for ids: $misses")
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }
}
