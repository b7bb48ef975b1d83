package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only scale-proof data generator (VERDICT r7 task 3): upscale the
  * sf0.1 fact tables Nx by unioning key-offset copies — key spaces stay
  * disjoint (ids offset by copy × (max+1)), dimensions stay fixed (the
  * TPC-H scaling shape: fact volume grows, dimension cardinality holds),
  * and embeddings are scaled by a copy-specific factor (cosine-invariant,
  * so similarity structure is preserved while vec_ids stay unique).
  * Output keeps every table contract (events ts stays long nanos).
  * Usage: runMain graft.tools.ScaleUp [copies] [outDir] */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(5)
    val out = args.lift(1).getOrElse(s"/tmp/graft_scale_x$copies")
    val src = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def raw(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")

    // dimensions: verbatim copies
    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      raw(t).write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[scale] $t copied")
    }

    /** Union `copies` copies of `df`, offsetting each column in `keys` by
      * copy × (max+1) so downstream joins on those keys stay consistent
      * across the copies they belong to. */
    def scaled(df: DataFrame, keys: Seq[String])(extra: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame = {
      val offsets = keys.map { k =>
        k -> (df.agg(max(col(k))).head.getLong(0) + 1L)
      }.toMap
      (0 until copies).map { i =>
        val shifted = offsets.foldLeft(df) { case (d, (k, off)) =>
          d.withColumn(k, col(k) + lit(i * off))
        }
        extra(shifted, i)
      }.reduce(_ unionAll _)
    }

    // orders/lineitem share the orderkey offset so the join key stays
    // aligned within each copy; custkey/partkey/suppkey stay in the fixed
    // dimension ranges (more facts per dimension row — the TPC-H shape)
    val orders = raw("orders")
    val orderOff = orders.agg(max(col("o_orderkey"))).head.getLong(0) + 1L
    (0 until copies).map(i =>
        orders.withColumn("o_orderkey", col("o_orderkey") + lit(i * orderOff)))
      .reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$out/orders.parquet")
    println("[scale] orders scaled")
    val li = raw("lineitem")
    (0 until copies).map(i =>
        li.withColumn("l_orderkey", col("l_orderkey") + lit(i * orderOff)))
      .reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    println("[scale] lineitem scaled")

    scaled(raw("documents"), Seq("doc_id"))()
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    println("[scale] documents scaled")

    // per-copy scalar factor: cosine-invariant perturbation — similarity
    // structure (and so dedup/ANN semantics) is identical across copies
    scaled(raw("embeddings"), Seq("vec_id")) { (d, i) =>
      d.withColumn("embedding",
        transform(col("embedding"), x => x * lit(1.0f + i * 1e-5f)))
    }.write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    println("[scale] embeddings scaled")

    // events: read through Tables.table (normalizes ts to long nanos) and
    // write the normalized form — the long-nanos leg of the ts contract
    scaled(graft.Tables.table(spark, src, "events"), Seq("event_id"))()
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    println("[scale] events scaled")
    spark.stop()
  }
}
