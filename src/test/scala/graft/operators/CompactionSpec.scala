package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CompactionSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("plan sizes bins from the listing; compact merges files losslessly") {
    import spark.implicits._
    val in = s"${tmp("cmp")}/frag"
    val out = s"${tmp("cmp")}/compact"
    (0 until 10000).map(i => (i.toLong, s"payload_$i"))
      .toDF("id", "s").repartition(32).write.parquet(in)
    val before = Compaction.plan(spark, in, 1L)
    assert(before.nFiles == 32)
    val pl = Compaction.compact(spark, in, out, targetBytes = before.totalBytes / 4)
    assert(pl.numBins >= 4 && pl.numBins <= 5) // ceil of a 32-file listing
    val files = spark.read.parquet(out)
      .select(col("_metadata.file_path")).distinct().count()
    assert(files == pl.numBins, s"expected ${pl.numBins} output files, got $files")
    assert(files < before.nFiles)
    val a = spark.read.parquet(in).select($"id").as[Long].collect().sorted.toSeq
    val b = spark.read.parquet(out).select($"id").as[Long].collect().sorted.toSeq
    assert(a == b)
  }

  test("tiny table compacts to a single file") {
    import spark.implicits._
    val in = s"${tmp("cmp1")}/frag"
    val out = s"${tmp("cmp1")}/compact"
    (0 until 50).map(i => (i.toLong, i.toString)).toDF("id", "s")
      .repartition(8).write.parquet(in)
    val pl = Compaction.compact(spark, in, out, targetBytes = Long.MaxValue)
    assert(pl.numBins == 1)
    assert(spark.read.parquet(out).count() == 50)
  }
}
