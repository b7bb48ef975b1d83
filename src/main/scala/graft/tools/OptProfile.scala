package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Optimization-round measurement harness (guide §1): times individual LEGS
  * of the bench's heaviest queries against the noop sink so the expensive
  * stage inside a multi-action query is attributable. Dev tool only — never
  * invoked by the driver; results land in OPTIMIZATION_r19.md. */
object OptProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(body: => Unit): Unit = {
      spark.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime()
      body
      println(f"[prof] $label%-45s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      spark.sparkContext.setJobDescription(null)
    }

    // shared input: the tx frame exactly as PipelineQueries caches it
    val tx = graft.Tables.points(spark, sfDir).withColumnRenamed("user_id", "user")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("tx materialize (persist+count)") { tx.count() }
    println(s"[prof] tx partitions = ${tx.rdd.getNumPartitions}")

    // warm JIT on the heavy paths once (bench does the same)
    time("warm: personalized fit on 2k slice") {
      new graft.cluster.GeoscanPersonalized()
        .setGroupedCol("user").setEpsilon(150).setMinPts(3)
        .fit(tx.limit(2000)).getTiles(10, 0).count()
    }

    // ---- q25 legs -------------------------------------------------------
    var model: graft.cluster.GeoscanPersonalizedModel = null
    time("q25a fit (150m/3)") {
      model = new graft.cluster.GeoscanPersonalized()
        .setGroupedCol("user").setEpsilon(150).setMinPts(3).fit(tx)
    }
    model.setTilePrecision(10).setTileLayers(1)
    val raw = model.getTiles(10, 1)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("q25b getTiles(10,1) materialize") { raw.count() }
    val pointsH3 = tx.select(col("user"),
      graft.functions.GeoFunctions.geoCell(col("latitude"), col("longitude"), 10).as("h3"))
    var tiles: DataFrame = null
    time("q25c tfidfTiles") {
      tiles = graft.pipeline.GeoFraudPipeline.tfidfTiles(raw, pointsH3)
      noop(tiles)
    }
    val tmp = java.nio.file.Files.createTempDirectory("prof_tiles").toString
    time("q25d zorder write (repartitionByRange+sort)") {
      tiles.repartitionByRange(col("user"), col("h3"))
        .sortWithinPartitions("user", "h3")
        .write.mode("overwrite").parquet(tmp)
    }
    val tilesBack = spark.read.parquet(tmp)
    time("q25e anti-join anomalies") {
      noop(graft.score.Anomalies.extract(tx, tilesBack, 10))
    }

    // ---- q24 legs -------------------------------------------------------
    time("q24a blooms train+toMap") {
      val bmap = graft.score.Blooms.toMap(graft.score.Blooms.train(tilesBack, 0.01))
      println(s"[prof] blooms users = ${bmap.size}")
    }
    val bmap = graft.score.Blooms.toMap(graft.score.Blooms.train(tilesBack, 0.01))
    val pairs = tx.select(col("user"),
      graft.functions.GeoFunctions.geoCell(col("latitude"), col("longitude"), 10).as("h3"))
    time("q24b pairs.distinct + scoreCells") {
      noop(graft.score.Blooms.scoreCells(pairs.distinct(), bmap))
    }
    time("q24c final join verdicts + groupBy") {
      val verdicts = graft.score.Blooms.scoreCells(pairs.distinct(), bmap)
      noop(pairs.join(verdicts, Seq("user", "h3")).groupBy("anomaly").count())
    }
    time("q66 scoreByJoin") {
      val trained = graft.score.Blooms.train(tilesBack, 0.01)
      noop(graft.score.Blooms.scoreByJoin(tx, trained, 10))
    }

    // ---- q290 legs (batch halves only — stream measured via bench) ------
    val (t290, _) = graft.queries.PipelineQueries.stageQ290Inputs(spark, sfDir)
    val tiles290 = spark.read.parquet(t290)
    time("q290a batch extract grid=h3") {
      noop(graft.score.Anomalies.extract(tx, tiles290, 10, grid = "h3"))
    }
    val batchOut = graft.score.Anomalies.extract(tx, tiles290, 10, grid = "h3")
      .select($"user", $"latitude", $"longitude", $"amount")
    time("q290b localCheckpoint(batchOut)") { batchOut.localCheckpoint(true) }
    val b = batchOut.localCheckpoint(true)
    time("q290c grouped full-outer self-compare") {
      val keys = Seq("user", "latitude", "longitude", "amount")
      noop(b.groupBy(keys.map(col): _*).agg(count(lit(1)).as("sc"))
        .join(b.groupBy(keys.map(col): _*).agg(count(lit(1)).as("bc")), keys, "full_outer")
        .agg(sum($"sc"), sum($"bc")))
    }
    time("q290d geoToH3 over batchOut + semi-join tiles") {
      noop(b.withColumn("h3", graft.functions.GeoFunctions
          .geoToH3($"latitude", $"longitude", 10))
        .join(tiles290.select($"user", $"h3"), Seq("user", "h3"), "left_semi"))
    }

    // ---- documents compute paths ---------------------------------------
    val docs = graft.Tables.table(spark, sfDir, "documents")
    println(s"[prof] documents partitions = ${docs.rdd.getNumPartitions}")
    time("q139 shingle df-agg (serial scan)") {
      val sh = docs.select($"source", $"doc_id",
        explode(graft.dedup.Dedup.shingles($"text")).as("sh"))
      noop(sh.groupBy($"sh").agg(count(lit(1)).as("df")))
    }
    time("q139 shingle df-agg (fanned out 32)") {
      val sh = docs.repartition(32).select($"source", $"doc_id",
        explode(graft.dedup.Dedup.shingles($"text")).as("sh"))
      noop(sh.groupBy($"sh").agg(count(lit(1)).as("df")))
    }
    spark.stop()
  }
}
