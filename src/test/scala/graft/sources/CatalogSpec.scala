package graft.sources

import graft.SparkSpec

/** The catalog seam's laws: name→location resolution through both
  * implementations serves the same rows as the path read, unknown
  * names refuse (no typo-created tables), and the registry document
  * survives mutation round-trips. */
class CatalogSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def df(ids: Seq[Long]) = ids.map(i => (i, s"n_$i")).toDF("id", "name")

  test("HadoopWarehouseCatalog resolves warehouse/ns/tbl for Iceberg AND Delta; lists namespaces") {
    val wh = freshDir("cat_wh")
    IcebergWriter.commitAppend(spark,
      new java.io.File(s"$wh/sales", "orders").toString,
      df(Seq(1L, 2L)), 801L, 1000L)
    DeltaLogWriter.write(df(Seq(10L)).coalesce(1),
      new java.io.File(s"$wh/sales", "events").toString)
    new java.io.File(s"$wh/sales/not_a_table").mkdirs() // no metadata: invisible
    val cat = new HadoopWarehouseCatalog(spark, wh)
    assert(cat.tables("sales") == Seq("events", "orders"))
    assert(TableCatalog.readIceberg(spark, cat, "sales.orders")
      .select("id").collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    assert(TableCatalog.readDelta(spark, cat, "sales.events")
      .select("id").collect().map(_.getLong(0)).toSet == Set(10L))
    val e = intercept[IllegalArgumentException](cat.locate("sales.nope"))
    assert(e.getMessage.contains("no table"), e.getMessage)
    val e2 = intercept[IllegalArgumentException](cat.locate("undotted"))
    assert(e2.getMessage.contains("namespace.table"), e2.getMessage)
    assert(cat.tables("empty_ns").isEmpty)
  }

  test("FileRegistryCatalog: register/resolve/list/drop round-trips through the swapped document") {
    val dir = freshDir("cat_reg")
    val tblLoc = new java.io.File(dir, "t1").toString
    IcebergWriter.commitAppend(spark, tblLoc, df(Seq(7L)), 802L, 1000L)
    val cat = new FileRegistryCatalog(spark, s"$dir/registry.json")
    // empty registry: lookups refuse, listings are empty
    intercept[IllegalArgumentException](cat.locate("db.t1"))
    assert(cat.tables("db").isEmpty)
    cat.register("db.t1", tblLoc)
    cat.register("db.t2", s"$dir/elsewhere")
    cat.register("other.t9", s"$dir/nine")
    assert(cat.tables("db") == Seq("t1", "t2"))
    assert(cat.locate("db.t1") == tblLoc)
    assert(TableCatalog.readIceberg(spark, cat, "db.t1")
      .select("id").collect().map(_.getLong(0)).toSet == Set(7L))
    // a SECOND instance over the same document sees the same state —
    // the registry, not the instance, is the source of truth
    val cat2 = new FileRegistryCatalog(spark, s"$dir/registry.json")
    assert(cat2.tables("db") == Seq("t1", "t2"))
    cat2.drop("db.t2")
    assert(cat.tables("db") == Seq("t1"))
    intercept[IllegalArgumentException](cat.drop("db.t2"))
  }
}
