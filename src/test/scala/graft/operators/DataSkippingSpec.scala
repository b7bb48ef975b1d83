package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DataSkippingSpec extends SparkSpec {

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** 4 range-partitioned files over x ∈ [0, 4000) — each file holds one
    * contiguous x quartile, so a narrow x range must plan exactly 1 file. */
  private def stage(dir: String): String = {
    import spark.implicits._
    val path = s"$dir/skip_pts"
    (0 until 4000).map(i => (i.toLong, i.toDouble, (i % 7).toDouble))
      .toDF("id", "x", "y")
      .repartitionByRange(4, $"x")
      .sortWithinPartitions($"x")
      .write.mode("overwrite").parquet(path)
    path
  }

  test("manifest: one row per file, envelopes cover the data") {
    val path = stage(tmpDir("skip1"))
    val man = DataSkipping.manifest(spark, path, Seq("x", "y")).collect()
    val nFiles = spark.read.parquet(path)
      .select(col("_metadata.file_path")).distinct().count()
    assert(man.length == nFiles && man.length > 1)
    val globalMin = man.map(_.getAs[Double]("x_min")).min
    val globalMax = man.map(_.getAs[Double]("x_max")).max
    assert(globalMin == 0.0 && globalMax == 3999.0)
  }

  test("prune plans only overlapping files; read+filter loses nothing") {
    import spark.implicits._
    val path = stage(tmpDir("skip2"))
    val man = DataSkipping.manifest(spark, path, Seq("x"))
    val total = man.count()
    val files = DataSkipping.prune(man, Map("x" -> (100.0, 200.0)))
    assert(files.nonEmpty && files.length < total,
      s"expected real skipping: ${files.length} of $total files planned")
    val pruned = DataSkipping.readFiles(spark, path, files)
      .where($"x".between(100.0, 200.0)).select($"id").as[Long].collect().toSet
    val full = spark.read.parquet(path)
      .where($"x".between(100.0, 200.0)).select($"id").as[Long].collect().toSet
    assert(pruned == full && full.size == 101)
  }

  test("prune refuses a manifest past the planning cap, loudly") {
    val path = stage(tmpDir("skipcap"))
    val man = DataSkipping.manifest(spark, path, Seq("x"))
    // 4 files match an all-covering range; cap 2 must refuse with the
    // manifest-guard message, and the default cap must pass untouched
    val e = intercept[IllegalArgumentException] {
      DataSkipping.prune(man, Map("x" -> (0.0, 4000.0)), maxFiles = 2)
    }
    assert(e.getMessage.contains("DataSkipping.prune") &&
      e.getMessage.contains("more than 2 files"))
    assert(DataSkipping.prune(man, Map("x" -> (0.0, 4000.0))).length == 4)
  }

  test("multi-column ranges intersect; disjoint range plans zero files") {
    val path = stage(tmpDir("skip3"))
    val man = DataSkipping.manifest(spark, path, Seq("x", "y"))
    // y spans [0, 6] in every file — the y range never prunes, x still does
    val both = DataSkipping.prune(man, Map("x" -> (0.0, 10.0), "y" -> (0.0, 100.0)))
    assert(both.length == 1)
    // disjoint x: nothing planned, empty read keeps the schema
    val none = DataSkipping.prune(man, Map("x" -> (99999.0, 100000.0)))
    assert(none.isEmpty)
    val empty = DataSkipping.readFiles(spark, path, none)
    assert(empty.count() == 0 &&
      empty.columns.toSeq == spark.read.parquet(path).columns.toSeq)
  }

  test("all-null stats column: file skipped soundly (no row can match)") {
    import spark.implicits._
    val dir = tmpDir("skip4")
    val path = s"$dir/null_pts"
    val withVals = (0 until 100).map(i => (i.toLong, Some(i.toDouble))).toDF("id", "x")
    val allNull = (100 until 200).map(i => (i.toLong, Option.empty[Double])).toDF("id", "x")
    withVals.coalesce(1).write.parquet(path)
    allNull.coalesce(1).write.mode("append").parquet(path)
    val man = DataSkipping.manifest(spark, path, Seq("x"))
    val files = DataSkipping.prune(man, Map("x" -> (10.0, 20.0)))
    assert(files.length == 1, s"all-null file must be skipped: $files")
    val rows = DataSkipping.readFiles(spark, path, files)
      .where($"x".between(10.0, 20.0)).count()
    assert(rows == 11)
  }
}
