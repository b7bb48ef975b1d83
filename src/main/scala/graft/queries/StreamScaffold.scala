package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

import graft.Tables

/** Shared scaffold for the driver-visible file-stream queries (q61/q63/q64,
  * and Bench's streaming warmup): stage a batch frame as the stream source
  * directory, run one transform through Spark's parquet file sink with a
  * fresh checkpoint under `Trigger.AvailableNow`, and read the sink back.
  *
  * `build` receives a STREAM-MAKER (each call opens a fresh readStream over
  * the staged source) so stream-stream joins can open the source twice.
  * Paths are sf-tagged so concurrent runs over different scale dirs never
  * clobber each other's checkpoints. */
private[graft] object StreamScaffold {

  def runFileStream(s: SparkSession, name: String, sfDir: String,
                    src: DataFrame)(build: (() => DataFrame) => DataFrame): DataFrame = {
    val tmp = System.getProperty("java.io.tmpdir")
    val tag = Tables.sfTag(sfDir)
    def p(kind: String) = new java.io.File(tmp, s"graft_${name}_${kind}_$tag").toString
    val (srcDir, out, chk) = (p("src"), p("out"), p("chk"))
    val fs = new org.apache.hadoop.fs.Path(tmp)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    // fresh sink + checkpoint: the file sink's exactly-once bookkeeping
    // would otherwise double-count across runs
    Seq(srcDir, out, chk).foreach(x =>
      fs.delete(new org.apache.hadoop.fs.Path(x), true))
    src.write.mode("overwrite").parquet(srcDir)
    val schema = s.read.parquet(srcDir).schema
    val q = build(() => s.readStream.schema(schema).parquet(srcDir))
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", chk)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.read.parquet(out)
  }
}
