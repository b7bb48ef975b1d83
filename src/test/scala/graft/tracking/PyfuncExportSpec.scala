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
