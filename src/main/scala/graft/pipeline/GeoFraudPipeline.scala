package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.cluster.{GeoscanPersonalized, GeoscanPersonalizedModel}
import graft.functions.GeoFunctions
import graft.score.{Anomalies, Blooms}

/** End-to-end wiring of the two reference notebooks (SURVEY §7.1 module 5):
  * `01_geofraud_clustering` (fit → tiles → TF-IDF → tiles table) and
  * `02_geofraud_fraud` (anti-join anomalies → per-user blooms → scoring). */
object GeoFraudPipeline {

  /** Transaction schema (`data/transactions.csv:1`, casts at
    * `01_geofraud_clustering.py:59-61`) — explicit, no inference. */
  val transactionSchema: StructType = StructType.fromDDL(
    "latitude DOUBLE, longitude DOUBLE, amount DOUBLE, user STRING")

  /** CSV ingestion (S1) without the reference's pandas hop. */
  def readTransactions(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(transactionSchema).option("header", "true").csv(path)

  case class Result(
      model: GeoscanPersonalizedModel,
      tiles: DataFrame,     // user, cluster, h3, tf_idf  (FIXTURES A2)
      anomalies: DataFrame) // transactions with no known tile

  /** The TF-IDF personalization scoring over tiles
    * (`01_geofraud_clustering.py:386-418`): df = distinct visitors per tile,
    * tf = a user's visits to their own tile, tf_idf = tf·ln(N/df). */
  def tfidfTiles(tiles: DataFrame, pointsH3: DataFrame): DataFrame = {
    // distinct BEFORE the join: the reference joins the full multi-row tile
    // frame (`01_geofraud_clustering.py:389-392`) and distincts after — same
    // result, but per-cell fanout tiles×points blows up at scale (measured
    // ~130M intermediate rows on 600k points); one row per cell keeps the
    // join linear in the points
    // persisted: docFreq has TWO eager consumers — the scalar-N count
    // action below and the tf join — and un-cached the whole
    // cells⋈points + two-distincts subtree ran twice per pipeline run
    // (guide §5 persist-when-reused; bounded: one row per distinct cell)
    val docFreq = tiles.select(col("h3")).distinct()
      .join(pointsH3, Seq("h3"))
      .select("user", "h3").distinct()
      .groupBy("h3").agg(sum(lit(1)).as("df"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val termFreq = tiles
      .join(pointsH3, Seq("h3", "user"))
      .groupBy("user", "h3", "cluster").agg(sum(lit(1)).as("tf"))
    // broadcast scalar N (01_geofraud_clustering.py:409) as a driver count
    // action (it also materializes the docFreq cache). Deliberately NOT
    // the in-plan broadcast-1-row-cross-join spelling (q16 uses that): the
    // tiles table goes through a repartitionByRange write downstream,
    // whose range sampling re-executes the child — measured 7s slower at
    // sf0.1 with the fused spelling here.
    val n = docFreq.count()
    termFreq.join(docFreq, Seq("h3"))
      .withColumn("tf_idf", col("tf") * log(lit(n.toDouble) / col("df")))
      .select("user", "cluster", "h3", "tf_idf")
  }

  /** Serving leg of notebook 02 (`02_geofraud_fraud.py:109-196`): train one
    * Bloom filter per user over the known tile cover, then score `points`
    * (adds `anomaly` 0/1). Path selection is AUTOMATIC: the broadcast-map
    * probe (the reference's pyfunc shape — zero shuffle) when the trained
    * filters fit the broadcast budget, the distributed sort-merge
    * [[Blooms.scoreByJoin]] when they don't — at millions of users the
    * unconditional driver collect is the OOM a caller shouldn't have to
    * know about. Both paths score bit-identically. */
  def scoreTransactions(points: DataFrame, tiles: DataFrame,
                        precision: Int = 10, fpp: Double = 0.01,
                        broadcastBudgetBytes: Long = Blooms.DefaultBroadcastBudgetBytes,
                        grid: String = "geocell"): DataFrame = {
    val trained = Blooms.train(tiles.select(col("user"), col("h3")), fpp)
    Blooms.scoreAuto(points, trained, precision,
      broadcastBudgetBytes = broadcastBudgetBytes, grid = grid)
  }

  /** Full 01+02 run. `zorderWrite` approximates the reference's
    * `OPTIMIZE ZORDER BY (user, h3)` (`01_geofraud_clustering.py:440`) with
    * range-partition + in-partition sort so parquet row-group min/max stats
    * prune point lookups (S10). */
  def run(spark: SparkSession, transactions: DataFrame,
          epsilon: Double = 100.0, minPts: Int = 3,
          tilePrecision: Int = 10, tileLayers: Int = 5,
          tilesOut: Option[String] = None,
          grid: String = "geocell"): Result = {

    val model = new GeoscanPersonalized()
      .setGroupedCol("user").setEpsilon(epsilon).setMinPts(minPts)
      .fit(transactions)
    model.setTilePrecision(tilePrecision).setTileLayers(tileLayers)

    // tile-id space for the WHOLE run — the cover, the TF-IDF visit
    // counts and the anomaly join must agree on one grid ("h3" = the
    // reference's own ids, the golden-replay spelling)
    val gridN = grid.toLowerCase(java.util.Locale.ROOT) match {
      case "geocell" | "engine" => "geocell"
      case "h3" => "h3"
      case other => throw new IllegalArgumentException(
        s"unknown grid '$other' — supported: 'geocell' (engine, default), 'h3'")
    }
    val cellOf =
      if (gridN == "h3")
        GeoFunctions.geoToH3(col("latitude"), col("longitude"), tilePrecision)
      else
        GeoFunctions.geoCell(col("latitude"), col("longitude"), tilePrecision)
    val pointsH3 = transactions.select(col("user"), cellOf.as("h3"))

    tilesOut match {
      case Some(path) =>
        // scoped persist: TF-IDF reads the tile cover three times (docFreq,
        // termFreq, N) and the Z-order write's range sampling adds a fourth
        // pass; released as soon as the table is written
        val rawTiles = model.getTiles(tilePrecision, tileLayers, gridN)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val tiles = tfidfTiles(rawTiles, pointsH3)
        tiles.repartitionByRange(col("user"), col("h3"))
          .sortWithinPartitions("user", "h3")
          .write.mode("overwrite").parquet(path)
        rawTiles.unpersist()
        // production shape: the anomaly job reads the persisted tiles table
        // (`02_geofraud_fraud.py:18`), not the fit lineage
        val tilesBack = spark.read.parquet(path)
        Result(model, tilesBack,
          Anomalies.extract(transactions, tilesBack, tilePrecision, grid = gridN))
      case None =>
        val tiles = tfidfTiles(model.getTiles(tilePrecision, tileLayers, gridN), pointsH3)
        Result(model, tiles,
          Anomalies.extract(transactions, tiles, tilePrecision, grid = gridN))
    }
  }
}
