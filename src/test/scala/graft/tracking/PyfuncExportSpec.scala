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
    assert(read("data/params.txt").trim == "precision=10\ngrid=engine")
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
    // a real-H3 tiles table now DISPATCHES (grid=h3 in params) — but an
    // explicit grid="engine" claim over it still refuses by name
    val h3Tiles = model.getTiles(10, 0, "h3")
    val hdst = freshDir() + "/x"
    PyfuncExport.exportGeoscanScorer(spark, h3Tiles, hdst, 10)
    val hparams = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(hdst, "data/params.txt")), "UTF-8")
    assert(hparams.contains("grid=h3"), hparams)
    val e = intercept[IllegalArgumentException](
      PyfuncExport.exportGeoscanScorer(spark, h3Tiles, freshDir() + "/xe", 10,
        grid = "engine"))
    assert(e.getMessage.contains("ENGINE grid"), e.getMessage)
    // wrong-precision engine ids refuse on both lanes (auto falls
    // through to the h3 check, which they also fail)
    val e2 = intercept[IllegalArgumentException](
      PyfuncExport.exportGeoscanScorer(spark, tiles, freshDir() + "/y", 11))
    assert(e2.getMessage.contains("grid"), e2.getMessage)
    val e2e = intercept[IllegalArgumentException](
      PyfuncExport.exportGeoscanScorer(spark, tiles, freshDir() + "/ye", 11,
        grid = "engine"))
    assert(e2e.getMessage.contains("ENGINE grid"), e2e.getMessage)
    // a NULL tile id refuses eagerly on every lane (it would serve as a
    // bogus 'None' key in the python twin)
    val withNull = tiles.select($"cluster",
      when($"h3" === tiles.select("h3").head.getString(0), null)
        .otherwise($"h3").as("h3"))
    val e3 = intercept[IllegalArgumentException](
      PyfuncExport.exportGeoscanScorer(spark, withNull, freshDir() + "/z", 10))
    assert(e3.getMessage.contains("NULL tile id"), e3.getMessage)
    // unknown grid names refuse with the supported set
    val e4 = intercept[IllegalArgumentException](
      PyfuncExport.exportGeoscanScorer(spark, tiles, freshDir() + "/w", 10,
        grid = "s2"))
    assert(e4.getMessage.contains("supported"), e4.getMessage)
    // a FOREIGN lowercase-h3 cover (the h3 library's own print form)
    // dispatches to the h3 grid too — the loader case-normalizes keys
    val lowerTiles = h3Tiles.select($"cluster", lower($"h3").as("h3"))
    val ldst = freshDir() + "/lc"
    PyfuncExport.exportGeoscanScorer(spark, lowerTiles, ldst, 10)
    val lparams = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(ldst, "data/params.txt")), "UTF-8")
    assert(lparams.contains("grid=h3"), lparams)
    // a NULL cluster refuses too (the loader would crash on int(None))
    val nullCluster = tiles.select(
      when($"h3" === tiles.select("h3").head.getString(0), null)
        .otherwise($"cluster").as("cluster"), $"h3")
    val e5 = intercept[IllegalArgumentException](
      PyfuncExport.exportGeoscanScorer(spark, nullCluster, freshDir() + "/v", 10))
    assert(e5.getMessage.contains("NULL cluster"), e5.getMessage)
  }

  test("generated python geo_to_h3 is bit-identical to H3.geoToH3 (published vectors + sphere sweep)") {
    val pyOk = try new ProcessBuilder("python3", "--version")
      .start().waitFor() == 0 catch { case _: java.io.IOException => false }
    assume(pyOk, "python3 not on PATH — parity leg skipped")
    val base = freshDir()
    // the snippet is pure stdlib — only `import math` precedes it
    java.nio.file.Files.write(java.nio.file.Paths.get(base, "h3twin.py"),
      ("import math\n" + PyfuncExport.h3PySnippet).getBytes("UTF-8"))
    // published doc vectors (H3Spec's q282 set) + a Fibonacci-lattice
    // sphere sweep across every resolution parity, poles included
    val published = Seq(
      (37.3615593, -122.0553238, 5),
      (37.3615593, -122.0553238, 7),
      (37.7752702151959257, -122.418307270836230, 9),
      (40.689167, -74.044444, 10))
    val ga = math.Pi * (3.0 - math.sqrt(5.0))
    val sweep = for {
      res <- Seq(0, 1, 5, 9, 10, 15)
      i <- 0 until 800
    } yield {
      val n = 800
      val z = 1.0 - (2.0 * i + 1.0) / n
      val lat = math.toDegrees(math.asin(z))
      val lng = math.toDegrees(((i * ga) % (2 * math.Pi)) - math.Pi)
      (lat, lng, res)
    }
    // targeted pentagon-region vectors: jittered grids around each of
    // the 12 pentagon base-cell centers, so the rotatePent60Ccw /
    // CwOffsetPent code paths (which a uniform sweep barely samples)
    // are parity-pinned too
    val pentagonTargeted = for {
      bc <- graft.geo.H3.Pentagons.toSeq.sorted
      res <- Seq(1, 7, 9, 10)
      d <- 0 until 9
    } yield {
      val p0 = (1L << 59) | (bc.toLong << 45) | ((1L << 45) - 1)
      val (cla, clo) = graft.geo.H3.h3ToGeo(p0)
      (cla + (d / 3 - 1) * 1.7, clo + (d % 3 - 1) * 1.7, res)
    }
    val vectors = published ++ sweep ++ pentagonTargeted
    val in = vectors.map { case (la, lo, r) => s"$la\t$lo\t$r" }
      .mkString("", "\n", "\n")
    java.nio.file.Files.write(java.nio.file.Paths.get(base, "in.tsv"),
      in.getBytes("UTF-8"))
    val script =
      s"""import sys
         |sys.path.insert(0, '$base')
         |import h3twin
         |with open('$base/in.tsv') as fh:
         |    for line in fh:
         |        la, lo, r = line.split('\\t')
         |        print('%x' % h3twin._geo_to_h3(float(la), float(lo), int(r)))
         |""".stripMargin
    val sf = java.nio.file.Paths.get(base, "drive.py")
    java.nio.file.Files.write(sf, script.getBytes("UTF-8"))
    val proc = new ProcessBuilder("python3", sf.toString)
      .redirectErrorStream(true).start()
    val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    assert(proc.waitFor() == 0, s"python twin crashed:\n$out")
    val got = out.trim.split("\n").toSeq
    assert(got.size == vectors.size, s"${got.size} != ${vectors.size}")
    val bad = vectors.zip(got).filter { case ((la, lo, r), py) =>
      graft.geo.H3.toH3String(graft.geo.H3.geoToH3(la, lo, r)) != py
    }
    assert(bad.isEmpty,
      s"${bad.size}/${vectors.size} disagreed; first: ${bad.take(3)}")
    // the four published vectors in particular came back EXACT
    assert(got.take(4) == Seq("85283473fffffff", "87283472bffffff",
      "8928308280fffff", "8a2a1072b59ffff"))
  }

  test("the geoscan python twin serves a fitted REAL-H3 model bit-identically (hit + miss)") {
    val py = Seq("python3", "-c", "import pandas, pyarrow")
    val pyOk = try new ProcessBuilder(py: _*).start().waitFor() == 0
      catch { case _: java.io.IOException => false }
    assume(pyOk, "python3 with pandas+pyarrow not on PATH — parity leg skipped")
    val base = freshDir()
    val trainPts = graft.Tables.points(spark, "/root/testdata/sf0.001").limit(400)
      .withColumnRenamed("user_id", "user")
      .select($"user".cast("string").as("user"), $"latitude", $"longitude")
    val pts = trainPts.unionAll(trainPts.limit(40)
      .select($"user", ($"latitude" + 1.0).as("latitude"), $"longitude"))
    val g = new graft.cluster.Geoscan().setEpsilon(150).setMinPts(3)
      .fit(trainPts.select($"latitude", $"longitude"))
    val tiles = g.getTiles(9, 1, "h3")
    PyfuncExport.exportGeoscanScorer(spark, tiles, s"$base/g", 9)
    val params = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$base/g", "data/params.txt")), "UTF-8")
    assert(params.contains("grid=h3"), params)
    // the JVM real-H3 serving shape (q283): tiling join on geo_to_h3
    val expected = pts.join(tiles,
      graft.functions.GeoFunctions.geoToH3($"latitude", $"longitude", 9) ===
        tiles("h3"), "left_outer")
      .select($"user", $"latitude", $"longitude", $"cluster")
    expected.coalesce(1).write.parquet(s"$base/expected")
    assert(expected.where($"cluster".isNotNull).count() > 0, "need hit rows")
    assert(expected.where($"cluster".isNull).count() > 0, "need miss rows")
    val script =
      s"""import sys, glob
         |import pandas as pd
         |sys.path.insert(0, '$base/g/code')
         |import graft_geoscan_transform as gt
         |m = gt._load_pyfunc('$base/g/data')
         |exp = pd.read_parquet(glob.glob('$base/expected/*.parquet')[0])
         |pred = m.predict(exp[['user', 'latitude', 'longitude']])
         |a = pred['cluster']
         |b = exp['cluster'].astype('Int64')
         |bad = int(((a.isna() != b.isna()) | (a.fillna(-1) != b.fillna(-1))).sum())
         |sys.exit(1 if bad else 0)
         |""".stripMargin
    val sf = java.nio.file.Paths.get(base, "parity_h3.py")
    java.nio.file.Files.write(sf, script.getBytes("UTF-8"))
    val proc = new ProcessBuilder("python3", sf.toString)
      .redirectErrorStream(true).start()
    val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    assert(proc.waitFor() == 0, s"real-H3 geoscan twin disagreed:\n$out")
  }

  test("the bloom python twin scores a REAL-H3-trained model bit-identically") {
    val py = Seq("python3", "-c", "import pandas, pyarrow")
    val pyOk = try new ProcessBuilder(py: _*).start().waitFor() == 0
      catch { case _: java.io.IOException => false }
    assume(pyOk, "python3 with pandas+pyarrow not on PATH — parity leg skipped")
    val base = freshDir()
    val dst = s"$base/m"
    val pts = graft.Tables.points(spark, "/root/testdata/sf0.001").limit(200)
      .withColumnRenamed("user_id", "user")
      .select($"user".cast("string"), $"latitude", $"longitude")
    // train on REAL H3 ids (the reference's own bloom id space,
    // utils/bloom_utils.py:29-31) — serve through the generated twin
    val tiles = pts.limit(150).select($"user",
      graft.functions.GeoFunctions.geoToH3($"latitude", $"longitude", 10).as("h3"))
    val trained = graft.score.Blooms.train(tiles)
    PyfuncExport.exportBloomScorer(spark, trained, dst, precision = 10,
      grid = "h3")
    val params = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dst, "data/params.txt")), "UTF-8")
    assert(params.contains("grid=h3"), params)
    val pairs = pts.withColumn("h3",
      graft.functions.GeoFunctions.geoToH3($"latitude", $"longitude", 10))
    val expected = graft.score.Blooms
      .scoreCells(pairs, graft.score.Blooms.toMap(trained))
      .select($"user", $"latitude", $"longitude", $"anomaly")
    expected.coalesce(1).write.parquet(s"$base/expected")
    assert(expected.where($"anomaly" === 1).count() > 0, "need anomalies")
    assert(expected.where($"anomaly" === 0).count() > 0, "need known tiles")
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
    val sf = java.nio.file.Paths.get(base, "parity_h3bloom.py")
    java.nio.file.Files.write(sf, script.getBytes("UTF-8"))
    val proc = new ProcessBuilder("python3", sf.toString)
      .redirectErrorStream(true).start()
    val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    assert(proc.waitFor() == 0, s"real-H3 bloom twin disagreed:\n$out")
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
