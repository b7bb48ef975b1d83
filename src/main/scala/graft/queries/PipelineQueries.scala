package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.cluster.{Geoscan, GeoscanPersonalized}
import graft.pipeline.GeoFraudPipeline
import graft.score.Blooms

/** ML-surface operators (SURVEY §2.9, §2.4 A7-A10) as driver queries.
  * Connected components, convex hulls, and Bloom membership are not
  * SQL-expressible, so these have no oracleSql entry — the driver records
  * the weaker rows-only check; the strong checks live in
  * GeoscanSpec/PipelineSpec (brute-force DBSCAN oracle, FN=0 law, golden
  * replay of the reference CSV). */
object PipelineQueries {

  private def tx(s: SparkSession, dir: String): DataFrame =
    Tables.points(s, dir).withColumnRenamed("user_id", "user")

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

    // §3.3 flagship end-to-end: full 01+02 pipeline, anomaly frame
    "q25_pipeline_anomalies" -> ((s, dir) => {
      GeoFraudPipeline.run(s, tx(s, dir),
        epsilon = 150, minPts = 3, tilePrecision = 10, tileLayers = 1).anomalies
    })
  )
}
