package graft.pipeline

import graft.SparkSpec
import graft.score.Blooms
import org.apache.spark.sql.functions._

/** Golden-file replay of the full 01→02 reference pipeline on the
  * reference's own dataset (SURVEY §5.4): invariants carry over even though
  * absolute cell ids differ from Uber H3 (SURVEY §7.3). */
class PipelineSpec extends SparkSpec {

  private val csv = "/root/reference/data/transactions.csv"

  private lazy val tx = {
    val df = GeoFraudPipeline.readTransactions(spark, csv)
    df.persist(); df.count(); df
  }

  private lazy val result = GeoFraudPipeline.run(
    spark, tx, epsilon = 100.0, minPts = 3, tilePrecision = 10, tileLayers = 3)

  test("golden: reference CSV loads with the declared schema (S1)") {
    assert(tx.count() == 10068) // data/transactions.csv measured size
    assert(tx.select("user").distinct().count() == 5)
    assert(tx.schema.fieldNames.toSeq == Seq("latitude", "longitude", "amount", "user"))
  }

  test("golden: tiles table has the reference schema and plausible volume (FIXTURES A2)") {
    val tiles = result.tiles
    assert(tiles.columns.toSeq == Seq("user", "cluster", "h3", "tf_idf"))
    assert(tiles.count() > 0)
    // every user with clusters has tiles
    assert(tiles.select("user").distinct().count() == 5)
    // tf_idf is finite and non-negative-ish (tf>=1, ln(N/df)>=0 since df<=N)
    assert(tiles.filter(col("tf_idf") < 0 || col("tf_idf").isNull).count() == 0)
  }

  test("golden: anomaly extraction finds a small but non-empty set (02_geofraud_fraud.py:75)") {
    val n = result.anomalies.count()
    assert(n > 0, "no anomalies at all")
    assert(n < 10068 * 0.25, s"$n anomalies — tiles cover too little")
    // join-key columns lead after a USING join (PySpark reference behaves
    // identically on `join(tiles, ['user','h3'], 'left_outer')`)
    assert(result.anomalies.columns.toSeq == Seq("user", "latitude", "longitude", "amount"))
  }

  test("golden: left_outer+IS NULL spelling ≡ left_anti spelling (SURVEY §5.3d)") {
    val a = graft.score.Anomalies.extract(tx, result.tiles, 10)
      .select("latitude", "longitude", "amount", "user")
    val b = graft.score.Anomalies.extractLeftOuter(tx, result.tiles, 10)
      .select("latitude", "longitude", "amount", "user")
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("golden: bloom FN = 0 — every known tile matches (02_geofraud_fraud.py:141-147)") {
    val trained = Blooms.train(result.tiles, fpp = 0.01)
    val blooms = Blooms.toMap(trained)
    val misses = result.tiles.select("user", "h3").collect().count { r =>
      !blooms(r.getString(0)).mightContainString(r.getString(1))
    }
    assert(misses == 0)
  }

  test("golden: bloom anomalies ⊆ join anomalies, recovery ≥ 90% (02_geofraud_fraud.py:258)") {
    val blooms = Blooms.toMap(Blooms.train(result.tiles, fpp = 0.01))
    val scored = Blooms.score(tx, blooms, precision = 10)
    val bloomAnoms = scored.filter(col("anomaly") === 1)
      .select("latitude", "longitude", "amount", "user")
    val joinAnoms = result.anomalies.select("latitude", "longitude", "amount", "user")
    // FN=0 ⇒ bloom can only under-flag (false positives absorb anomalies)
    assert(bloomAnoms.exceptAll(joinAnoms).count() == 0, "bloom flagged a known tile")
    val recovery = bloomAnoms.count().toDouble / joinAnoms.count().toDouble
    assert(recovery >= 0.90, s"recovery $recovery") // reference: 78/81 at fpp=0.1
  }

  test("scoreByJoin ≡ broadcast score — bit-identical anomaly flags, no driver collect") {
    val trained = Blooms.train(result.tiles, fpp = 0.01)
    val viaMap = Blooms.score(tx, Blooms.toMap(trained), precision = 10)
      .select("latitude", "longitude", "amount", "user", "anomaly")
    val viaJoin = Blooms.scoreByJoin(tx, trained, precision = 10)
      .select("latitude", "longitude", "amount", "user", "anomaly")
    assert(viaJoin.schema.fieldNames.toSeq == tx.schema.fieldNames.toSeq :+ "anomaly")
    // same filters, same probe ⇒ strictly equal output (not just FN=0)
    assert(viaMap.exceptAll(viaJoin).count() == 0 && viaJoin.exceptAll(viaMap).count() == 0)
  }

  test("scoreByJoin flags unknown/null users and null coords anomalous like the broadcast path") {
    import spark.implicits._
    val trained = Blooms.train(result.tiles, fpp = 0.01)
    val knownUser = result.tiles.select("user").head.getString(0)
    val probe = Seq(
      ("stranger", Some(40.72), Some(-73.98)),
      (null, Some(40.72), Some(-73.98)),
      (knownUser, Option.empty[Double], Some(-73.98))) // null coords, known user
      .toDF("user", "latitude", "longitude")
    val joinOut = Blooms.scoreByJoin(probe, trained).select("anomaly").collect()
    assert(joinOut.forall(_.getInt(0) == 1))
    val mapOut = Blooms.score(probe, Blooms.toMap(trained)).select("anomaly").collect()
    assert(mapOut.forall(_.getInt(0) == 1))
  }

  test("scoreAuto cuts over from broadcast to join at the budget, both paths equal") {
    val trained = Blooms.train(result.tiles, fpp = 0.01)
    val totalBytes = trained
      .agg(sum(length(col("bloom")))).head.getLong(0)
    assert(totalBytes > 0)
    // selection: fits a budget just above its size, not one just below
    assert(Blooms.fitsBroadcast(trained, budgetBytes = totalBytes))
    assert(!Blooms.fitsBroadcast(trained, budgetBytes = totalBytes - 1))
    // both forced paths score bit-identically through the auto entry point
    val cols = Seq("latitude", "longitude", "amount", "user", "anomaly").map(col)
    val viaBroadcast = Blooms.scoreAuto(tx, trained,
      broadcastBudgetBytes = totalBytes).select(cols: _*)
    val viaJoin = Blooms.scoreAuto(tx, trained,
      broadcastBudgetBytes = totalBytes - 1).select(cols: _*)
    assert(viaBroadcast.exceptAll(viaJoin).count() == 0 &&
      viaJoin.exceptAll(viaBroadcast).count() == 0)
    // and the pipeline serving leg runs end-to-end on the auto path
    val served = GeoFraudPipeline.scoreTransactions(tx, result.tiles)
    assert(served.columns.toSeq == tx.columns.toSeq :+ "anomaly")
    assert(served.filter(col("anomaly") === 1).count() > 0)
  }

  test("h3-grid bloom scoring: all paths agree, and the grid mismatch hazard is real") {
    import spark.implicits._
    // blooms trained on REAL-H3 tiles of every point's own cell
    val tiles = tx.select(col("user"), graft.functions.GeoFunctions
      .geoToH3(col("latitude"), col("longitude"), 10).as("h3"))
    val trained = Blooms.train(tiles, fpp = 0.01)
    val cols = Seq("latitude", "longitude", "amount", "user", "anomaly").map(col)
    val viaMap = Blooms.score(tx, Blooms.toMap(trained), 10, grid = "h3")
      .select(cols: _*)
    val viaJoin = Blooms.scoreByJoin(tx, trained, 10, grid = "h3")
      .select(cols: _*)
    assert(viaMap.exceptAll(viaJoin).count() == 0 &&
      viaJoin.exceptAll(viaMap).count() == 0)
    // FN=0: every point's own tile is trained, so nothing is anomalous
    assert(viaMap.filter($"anomaly" === 1).count() == 0)
    // scoreAuto forwards the grid on BOTH budget paths
    val totalBytes = trained.agg(sum(length(col("bloom")))).head.getLong(0)
    val autoB = Blooms.scoreAuto(tx, trained, 10,
      broadcastBudgetBytes = totalBytes, grid = "h3").select(cols: _*)
    val autoJ = Blooms.scoreAuto(tx, trained, 10,
      broadcastBudgetBytes = totalBytes - 1, grid = "h3").select(cols: _*)
    assert(autoB.exceptAll(viaMap).count() == 0 &&
      autoJ.exceptAll(viaMap).count() == 0)
    // the serving entry point carries the grid through
    val served = GeoFraudPipeline.scoreTransactions(tx, tiles, grid = "h3")
    assert(served.filter(col("anomaly") === 1).count() == 0)
    // and the hazard the param closes is REAL: probing h3-trained blooms
    // with ENGINE cells flags (almost) everything anomalous
    val wrong = Blooms.score(tx, Blooms.toMap(trained), 10)
    val wrongFrac = wrong.filter(col("anomaly") === 1).count().toDouble /
      tx.count().toDouble
    assert(wrongFrac > 0.95, s"mismatched grid only flagged $wrongFrac")
    // unknown grid names refuse eagerly
    val e = intercept[IllegalArgumentException](
      Blooms.score(tx, Blooms.toMap(trained), 10, grid = "s2"))
    assert(e.getMessage.contains("s2"), e.getMessage)
  }

  test("bloom training skips null tiles instead of NPE-ing") {
    import spark.implicits._
    val tiles = Seq(("u", Some("CELL1")), ("u", None), (null, Some("CELL2")))
      .toDF("user", "h3")
    val blooms = Blooms.toMap(Blooms.train(tiles))
    assert(blooms.keySet == Set("u"))
    assert(blooms("u").mightContainString("CELL1"))
  }

  test("golden: unknown user is fully anomalous at serve time") {
    import spark.implicits._
    val blooms = Blooms.toMap(Blooms.train(result.tiles))
    val probe = Seq(("stranger", 40.72, -73.98)).toDF("user", "latitude", "longitude")
    assert(Blooms.score(probe, blooms).select("anomaly").head.getInt(0) == 1)
  }
}
