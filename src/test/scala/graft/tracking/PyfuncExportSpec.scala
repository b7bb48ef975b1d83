package graft.tracking

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The MLflow pyfunc model-directory export (the reference's serving
  * interop, `02_geofraud_fraud.py:220-264`): layout pinned against the
  * public MLmodel schema, and — when a python3 with pandas is on PATH —
  * the shipped loader module executed for bit-parity of `predict`
  * against the JVM scorer. */
class PyfuncExportSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("pyfunc").toString

  private def model(dst: String) = {
    val pts = graft.Tables.points(spark, "/root/testdata/sf0.001").limit(200)
      .withColumnRenamed("user_id", "user")
      .select($"user".cast("string"), $"latitude", $"longitude")
    val tiles = pts.limit(150).select($"user",
      graft.functions.GeoFunctions.geoCell($"latitude", $"longitude", 10).as("h3"))
    val trained = graft.score.Blooms.train(tiles)
    PyfuncExport.exportBloomScorer(spark, trained, dst, precision = 10)
    (pts, trained)
  }

  test("export writes the public MLmodel pyfunc layout") {
    val dst = freshDir() + "/m"
    model(dst)
    def read(rel: String): String = {
      val p = java.nio.file.Paths.get(dst, rel)
      assert(java.nio.file.Files.exists(p), s"missing $rel")
      new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    }
    val mlmodel = read("MLmodel")
    // the keys a real mlflow.pyfunc client resolves the model through
    assert(mlmodel.contains("flavors:"))
    assert(mlmodel.contains("python_function:"))
    assert(mlmodel.contains("loader_module: graft_bloom_scorer"))
    assert(mlmodel.contains("code: code") && mlmodel.contains("data: data"))
    assert(mlmodel.contains("conda: conda.yaml") &&
      mlmodel.contains("virtualenv: python_env.yaml"))
    assert(mlmodel.contains("model_uuid:") && mlmodel.contains("utc_time_created:"))
    // env files + the loader module's pyfunc contract
    assert(read("conda.yaml").contains("dependencies:"))
    assert(read("python_env.yaml").contains("python:"))
    assert(read("requirements.txt").contains("pandas"))
    val module = read("code/graft_bloom_scorer.py")
    assert(module.contains("def _load_pyfunc(data_path)"))
    assert(module.contains("def predict(self, df)"))
    assert(read("data/params.txt").trim == "precision=10")
    assert(new java.io.File(s"$dst/data/blooms.parquet").listFiles()
      .exists(_.getName.endsWith(".parquet")))
  }

  test("a forced multi-shard export stays loadable (byte-budget sharding)") {
    val dst = freshDir() + "/m"
    val pts = graft.Tables.points(spark, "/root/testdata/sf0.001").limit(200)
      .withColumnRenamed("user_id", "user")
      .select($"user".cast("string"), $"latitude", $"longitude")
    val tiles = pts.select($"user",
      graft.functions.GeoFunctions.geoCell($"latitude", $"longitude", 10).as("h3"))
    val trained = graft.score.Blooms.train(tiles)
    // a 1 KB budget forces > 1 part file for any real bloom frame
    PyfuncExport.exportBloomScorer(spark, trained, dst, precision = 10,
      maxShardBytes = 1024L)
    val parts = new java.io.File(s"$dst/data/blooms.parquet").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(parts > 1, s"1 KB budget must shard, got $parts part file(s)")
    // every (user, bloom) row survives sharding
    val back = spark.read.parquet(s"$dst/data/blooms.parquet")
    assert(back.count() == trained.count())
    assert(back.select("user").as[String].collect().sorted.toSeq ==
      trained.select("user").as[String].collect().sorted.toSeq)
  }

  test("geoscan scorer export: layout, engine-grid guard, real-H3 refusal") {
    val dst = freshDir() + "/g"
    val pts = graft.Tables.points(spark, "/root/testdata/sf0.001").limit(300)
      .select($"latitude", $"longitude")
    val model = new graft.cluster.Geoscan().setEpsilon(150).setMinPts(3).fit(pts)
    val tiles = model.getTiles(10, 1)
    PyfuncExport.exportGeoscanScorer(spark, tiles, dst, precision = 10)
    assert(new java.io.File(s"$dst/data/tiles.parquet").listFiles()
      .exists(_.getName.endsWith(".parquet")))
    val mlmodel = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dst, "MLmodel")), "UTF-8")
    assert(mlmodel.contains("loader_module: graft_geoscan_transform"))
    val params = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dst, "data/params.txt")), "UTF-8")
    assert(params.contains("precision=10") && params.contains("personalized=false"))
    // a real-H3 tiles table refuses by name — the twin replays GeoCell only
    val h3Tiles = model.getTiles(10, 0, "h3")
    val e = intercept[IllegalArgumentException](
      PyfuncExport.exportGeoscanScorer(spark, h3Tiles, freshDir() + "/x", 10))
    assert(e.getMessage.contains("ENGINE grid"), e.getMessage)
    // wrong-precision engine ids refuse too
    val e2 = intercept[IllegalArgumentException](
      PyfuncExport.exportGeoscanScorer(spark, tiles, freshDir() + "/y", 11))
    assert(e2.getMessage.contains("ENGINE grid"), e2.getMessage)
  }

  test("the geoscan python twin transforms bit-identically (global + personalized)") {
    val py = Seq("python3", "-c", "import pandas, pyarrow")
    val pyOk = try new ProcessBuilder(py: _*).start().waitFor() == 0
      catch { case _: java.io.IOException => false }
    assume(pyOk, "python3 with pandas+pyarrow not on PATH — parity leg skipped")
    val base = freshDir()
    val trainPts = graft.Tables.points(spark, "/root/testdata/sf0.001").limit(400)
      .withColumnRenamed("user_id", "user")
      .select($"user".cast("string").as("user"), $"latitude", $"longitude")
    // score a superset: shifted copies guarantee MISS rows (null cluster),
    // so the parity check exercises both lookup outcomes
    val pts = trainPts.unionAll(trainPts.limit(40)
      .select($"user", ($"latitude" + 1.0).as("latitude"), $"longitude"))

    // GLOBAL: transform vs python twin over the SAME tile cover
    val g = new graft.cluster.Geoscan().setEpsilon(150).setMinPts(3)
      .fit(trainPts.select($"latitude", $"longitude"))
    g.setTilePrecision(10).setTileLayers(1)
    PyfuncExport.exportGeoscanScorer(spark, g.getTiles(10, 1), s"$base/g", 10)
    val expectedG = g.transform(pts)
      .select($"user", $"latitude", $"longitude", $"cluster")
    expectedG.coalesce(1).write.parquet(s"$base/expected_g")
    assert(expectedG.where($"cluster".isNotNull).count() > 0, "need labeled rows")
    assert(expectedG.where($"cluster".isNull).count() > 0, "need noise rows")

    // PERSONALIZED: per-user transform vs the user-keyed twin
    val p = new graft.cluster.GeoscanPersonalized()
      .setGroupedCol("user").setEpsilon(150).setMinPts(3).fit(trainPts)
    p.setTilePrecision(10).setTileLayers(1)
    PyfuncExport.exportGeoscanScorer(spark, p.getTiles(10, 1), s"$base/p", 10)
    val expectedP = p.transform(pts)
      .select($"user", $"latitude", $"longitude", $"cluster")
    expectedP.coalesce(1).write.parquet(s"$base/expected_p")

    val script =
      s"""import sys, glob
         |import pandas as pd
         |bad = 0
         |for tag in ('g', 'p'):
         |    sys.path.insert(0, '$base/%s/code' % tag)
         |    import importlib
         |    import graft_geoscan_transform as gt
         |    importlib.reload(gt)
         |    m = gt._load_pyfunc('$base/%s/data' % tag)
         |    exp = pd.read_parquet(glob.glob('$base/expected_%s/*.parquet' % tag)[0])
         |    pred = m.predict(exp[['user', 'latitude', 'longitude']])
         |    a = pred['cluster']
         |    b = exp['cluster'].astype('Int64')
         |    bad += int(((a.isna() != b.isna()) | (a.fillna(-1) != b.fillna(-1))).sum())
         |sys.exit(1 if bad else 0)
         |""".stripMargin
    val sf = java.nio.file.Paths.get(base, "parity_geoscan.py")
    java.nio.file.Files.write(sf, script.getBytes("UTF-8"))
    val proc = new ProcessBuilder("python3", sf.toString)
      .redirectErrorStream(true).start()
    val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    assert(proc.waitFor() == 0, s"geoscan python twin disagreed:\n$out")
  }

  test("the shipped python twin predicts bit-identically to Blooms.score (multi-shard)") {
    val py = Seq("python3", "-c", "import pandas, pyarrow")
    val pyOk = try new ProcessBuilder(py: _*).start().waitFor() == 0
      catch { case _: java.io.IOException => false }
    assume(pyOk, "python3 with pandas+pyarrow not on PATH — parity leg skipped")
    val base = freshDir()
    val dst = s"$base/m"
    val (pts, trained) = model(dst)
    // re-export SHARDED over the same blooms: the python loader reads the
    // parquet directory, so the byte-budget shard count must be invisible
    PyfuncExport.exportBloomScorer(spark, trained, dst, precision = 10,
      maxShardBytes = 1024L)
    val expected = graft.score.Blooms
      .score(pts, graft.score.Blooms.toMap(trained), 10)
      .select($"user", $"latitude", $"longitude", $"anomaly")
    expected.coalesce(1).write.parquet(s"$base/expected")
    assert(expected.where($"anomaly" === 1).count() > 0,
      "fixture must contain anomalies or the parity check proves nothing")
    assert(expected.where($"anomaly" === 0).count() > 0,
      "fixture must contain known tiles or the parity check proves nothing")
    val script =
      s"""import sys, glob
         |import pandas as pd
         |sys.path.insert(0, '$dst/code')
         |import graft_bloom_scorer as g
         |m = g._load_pyfunc('$dst/data')
         |exp = pd.read_parquet(glob.glob('$base/expected/*.parquet')[0])
         |pred = m.predict(exp[['user', 'latitude', 'longitude']])
         |bad = int((pred['anomaly'].values != exp['anomaly'].values).sum())
         |sys.exit(1 if bad else 0)
         |""".stripMargin
    val sf = java.nio.file.Paths.get(base, "parity.py")
    java.nio.file.Files.write(sf, script.getBytes("UTF-8"))
    val proc = new ProcessBuilder("python3", sf.toString)
      .redirectErrorStream(true).start()
    val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    assert(proc.waitFor() == 0, s"python twin disagreed with the JVM scorer:\n$out")
  }
}
