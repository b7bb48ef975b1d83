package graft

import org.apache.spark.sql.functions._

/** The write-once staging + source-signature machinery behind q122/q134 and
  * the session frame cache: a second call with unchanged sources must NOT
  * rewrite, and a source refresh (length or mtime change) MUST. */
class StageOnceSpec extends SparkSpec {

  test("stageOnce writes once per signature and re-stages on source change") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("so_src").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$src/tbl.parquet")

    val out = new java.io.File(
      java.nio.file.Files.createTempDirectory("so_out").toFile, "staged").toString
    var writes = 0
    def stage(): Unit = {
      val sig = Tables.sourceSig(spark, src, "tbl")
      Tables.stageOnce(spark, out, sig) {
        writes += 1
        spark.read.parquet(s"$src/tbl.parquet")
          .write.mode("overwrite").parquet(out)
      }
    }

    stage()
    stage()
    assert(writes == 1, "unchanged source must not rewrite")
    assert(spark.read.parquet(out).count() == 2)

    // refresh the source: signature (length and/or mtime) changes
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$src/tbl.parquet")
    stage()
    assert(writes == 2, "refreshed source must re-stage")
    assert(spark.read.parquet(out).count() == 3)
  }

  test("sourceSig covers every named table and is order-stable") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("ss_src").toString
    Seq(1).toDF("x").write.parquet(s"$src/a.parquet")
    Seq(2).toDF("x").write.parquet(s"$src/b.parquet")
    val s1 = Tables.sourceSig(spark, src, "a", "b")
    assert(s1.contains("a=") && s1.contains("b="))
    assert(s1 == Tables.sourceSig(spark, src, "a", "b"))
    intercept[Exception](Tables.sourceSig(spark, src, "missing"))
  }
}
