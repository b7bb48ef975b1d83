package graft

import org.apache.spark.sql.functions._

/** S9 (DDL) + S3/S4 (catalog table scan/sink) coverage — the reference's
  * `configure_notebook` surface (`config/configure_notebook.py:18-27,44-48`:
  * CREATE DATABASE IF NOT EXISTS … LOCATION, USE, DROP … CASCADE) and the
  * Delta `saveAsTable`/`spark.read.table` pair
  * (`01_geofraud_clustering.py:431,449`). */
class DdlSpec extends SparkSpec {

  test("database lifecycle + saveAsTable + table scan round-trip") {
    import spark.implicits._
    val loc = java.nio.file.Files.createTempDirectory("graft_db").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_test LOCATION '$loc'")
    spark.sql("USE graft_test")
    try {
      val tiles = Seq(("u1", 0L, "A00FF", 1.5), ("u2", 1L, "A0100", 0.7))
        .toDF("user", "cluster", "h3", "tf_idf")
      tiles.write.mode("overwrite").saveAsTable("tiles")

      // S3: table scan by name
      val back = spark.read.table("tiles")
      assert(back.count() == 2)
      assert(back.schema.fieldNames.toSeq == Seq("user", "cluster", "h3", "tf_idf"))
      assert(spark.table("graft_test.tiles")
        .filter($"user" === "u1").select($"tf_idf").head.getDouble(0) == 1.5)

      // overwrite semantics (the reference's mode('overwrite'))
      tiles.filter($"user" === "u1").write.mode("overwrite").saveAsTable("tiles")
      assert(spark.read.table("tiles").count() == 1)
    } finally {
      spark.sql("USE default")
      spark.sql("DROP DATABASE IF EXISTS graft_test CASCADE")
    }
    assert(!spark.catalog.databaseExists("graft_test"))
  }

  test("model save writes params.json sidecar + parquet state (M5/S6 layout)") {
    import spark.implicits._
    val pts = Seq.tabulate(30)(i => (40.70 + (i % 5) * 1e-4, -74.00 + (i / 5) * 1e-4))
      .toDF("latitude", "longitude")
    val model = new graft.cluster.Geoscan().setEpsilon(150).setMinPts(2).fit(pts)
    val path = java.nio.file.Files.createTempDirectory("geoscan_sidecar").toString
    model.write.overwrite().save(path)
    val json = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$path/params.json")))
    assert(json.contains("\"epsilon\": \"150.0\""))
    assert(json.contains("graft.cluster.GeoscanModel"))
    assert(new java.io.File(s"$path/data").exists())
  }
}
