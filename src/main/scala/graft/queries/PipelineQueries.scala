package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.cluster.{Geoscan, GeoscanPersonalized}
import graft.pipeline.GeoFraudPipeline
import graft.score.Blooms

/** ML-surface operators (SURVEY §2.9, §2.4 A7-A10) as driver queries.
  * Connected components, convex hulls, and Bloom membership are not
  * SQL-expressible, so q21-q24 have no oracleSql entry — the driver records
  * the weaker rows-only check; the strong checks live in
  * GeoscanSpec/PipelineSpec (brute-force DBSCAN oracle, FN=0 law, golden
  * replay of the reference CSV). q25 IS oracle-exact: the fitted tile table
  * is persisted to parquet inside the query and DuckDB replays the anomaly
  * anti-join over that same file. */
object PipelineQueries {

  private def tx(s: SparkSession, dir: String): DataFrame =
    Tables.points(s, dir).withColumnRenamed("user_id", "user")

  /** Scratch parquet shared between the q25 Spark run and its DuckDB oracle
    * (both sides resolve the same absolute path). */
  private val tilesScratch: String =
    new java.io.File(System.getProperty("java.io.tmpdir"), "graft_q25_tiles").toString

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // M3/M4 + A7-A9: per-user GEOSCAN fit → tile cover
    "q21_geoscan_tiles" -> ((s, dir) => {
      val model = new GeoscanPersonalized()
        .setGroupedCol("user").setEpsilon(150).setMinPts(3)
        .fit(tx(s, dir))
      model.getTiles(10, 1)
    }),

    // M1/M2: distributed GEOSCAN fit → transform (nullable cluster label)
    "q22_geoscan_transform" -> ((s, dir) => {
      val pts = tx(s, dir).limit(20000)
      val model = new Geoscan().setEpsilon(25).setMinPts(3)
        .setSampleMaxPerCell(8).fit(pts)
      model.setTilePrecision(11).setTileLayers(1).transform(pts)
    }),

    // S7: GeoJSON export surface
    "q23_geoscan_geojson" -> ((s, dir) => {
      val model = new GeoscanPersonalized()
        .setGroupedCol("user").setEpsilon(150).setMinPts(3)
        .fit(tx(s, dir))
      model.toGeoJson()
    }),

    // A10/U4: per-user bloom build + O(1) membership scoring
    "q24_bloom_score" -> ((s, dir) => {
      val points = tx(s, dir)
      val model = new GeoscanPersonalized()
        .setGroupedCol("user").setEpsilon(150).setMinPts(3).fit(points)
      val tiles = model.getTiles(10, 1)
      val blooms = Blooms.toMap(Blooms.train(tiles, 0.01))
      Blooms.score(points, blooms, 10).groupBy("anomaly").count()
    }),

    // §3.3 flagship end-to-end: full 01+02 pipeline. The tile table is
    // persisted to parquet (the reference's Delta tiles table,
    // 01_geofraud_clustering.py:431) and the anomaly anti-join replayed
    // from that file — which is exactly what the DuckDB oracle does too,
    // making the join leg hash-exact (02_geofraud_fraud.py:62-68 is pure
    // SQL once tiles are materialized).
    "q25_pipeline_anomalies" -> ((s, dir) => {
      import s.implicits._
      GeoFraudPipeline.run(s, tx(s, dir),
        epsilon = 150, minPts = 3, tilePrecision = 10, tileLayers = 1,
        tilesOut = Some(tilesScratch))
      graft.score.Anomalies.extract(tx(s, dir), s.read.parquet(tilesScratch), 10)
        .select($"user", $"latitude", $"longitude", $"amount")
        .orderBy($"user", $"latitude", $"longitude", $"amount")
    })
  )

  val oracle: Map[String, String] = Map(
    "q25_pipeline_anomalies" ->
      s"""WITH ${Tables.pointsSql}
         |SELECT user_id AS "user", latitude, longitude, amount FROM points p
         |WHERE NOT EXISTS (SELECT 1 FROM read_parquet('$tilesScratch/*.parquet') t
         |  WHERE t."user" = p.user_id AND t.h3 = ${Tables.cellSql("p.latitude", "p.longitude", 10)})""".stripMargin
  )
}
