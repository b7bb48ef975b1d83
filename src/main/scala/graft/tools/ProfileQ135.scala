package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only profiler for q135's stages — not part of the query surface. */
object ProfileQ135 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import org.apache.spark.sql.functions._

    def time[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime(); val r = body
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    // warm
    spark.range(1000000L).selectExpr("sum(id)").collect()
    graft.queries.ExtensionQueries.stageQ135Assignments(spark, sfDir)

    for (rep <- 1 to 2) {
      println(s"--- rep $rep ---")
      val e = graft.Tables.table(spark, sfDir, "embeddings")
      val asg = time("read assignments")(
        spark.read.parquet(
          graft.Tables.scratch(graft.Tables.scratchPat("q135_asg"), sfDir)))
      val clustered = time("join+checkpoint")(
        e.join(asg, "vec_id").localCheckpoint(true))
      val pairs = time("exactCosinePairs(lazy+guard)")(
        graft.sim.Similarity.exactCosinePairs(clustered, "cluster", minCosX1e4 = 3000L))
      val p2 = time("pairs checkpoint")(pairs.localCheckpoint(true))
      println(s"[prof] n_pairs=${p2.count()}")
      val cc = time("cc.run")(
        graft.cluster.ConnectedComponents.run(
          p2.select(col("id_a").as("src"), col("id_b").as("dst"))).localCheckpoint(true))
      val out = time("groups+count")(
        graft.dedup.Dedup.dedupGroupsFromComponents(e, cc, idCol = "vec_id")
          .orderBy($"group_id").count())
      println(s"[prof] groups=$out")
    }
    spark.stop()
  }
}
