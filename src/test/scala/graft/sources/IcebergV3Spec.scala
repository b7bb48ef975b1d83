package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Iceberg FORMAT-VERSION 3 read support — deletion vectors: position
  * deletes stored as puffin blobs whose framing is byte-identical to
  * Delta's DV sidecars (the v3 spec adopted it). The reader decodes
  * them on executors and anti-joins (file, position); writes on v3
  * tables refuse (row-lineage maintenance is not implemented). */
class IcebergV3Spec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("icev3").toString

  /** Stage `df` as one canonical parquet file at the table root. */
  private def dataFile(base: String, name: String,
                       df: org.apache.spark.sql.DataFrame): String = {
    val tmp = new java.io.File(base, s".tmp_$name").toString
    df.coalesce(1).write.parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).head
    val dst = new java.io.File(base, name)
    assert(part.renameTo(dst))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    dst.getAbsolutePath
  }

  private val fieldsJson =
    """[{"id":1,"name":"id","required":false,"type":"long"},
      |{"id":2,"name":"name","required":false,"type":"string"}]"""
      .stripMargin.replace("\n", "")

  /** Hand-assemble a v3 table: one data file (ids 1..8 in order), one
    * puffin DV killing the given 0-based positions. Returns the base. */
  private def v3Table(kills: Array[Long],
                      cardinalityOverride: Option[Long] = None,
                      corruptCrc: Boolean = false): String = {
    val base = freshDir()
    val f1 = dataFile(base, "f1.parquet",
      (1L to 8L).map(i => (i, s"n$i")).toDF("id", "name"))
    val blob0 = Iceberg.dvBlob(kills)
    val blob = if (!corruptCrc) blob0 else {
      val b = blob0.clone(); b(6) = (b(6) ^ 0x7f).toByte; b // flip a bitmap byte
    }
    val (puffin, spans) = Iceberg.writePuffin(spark, base, "dv1.puffin",
      Seq((blob, f1)), snapshotId = 3002L, sequenceNumber = 2L)
    val (m1, l1) = Iceberg.writeManifest(spark, base, "m1.avro", 3001L,
      Seq(Iceberg.Entry(f1, status = 1, sequenceNumber = Some(1L),
        recordCount = 8L)))
    val (m2, l2) = Iceberg.writeManifest(spark, base, "m2.avro", 3002L,
      Seq(Iceberg.Entry(puffin, status = 1, content = 1, format = "PUFFIN",
        sequenceNumber = Some(2L),
        recordCount = cardinalityOverride.getOrElse(kills.length.toLong),
        referencedDataFile = Some(f1),
        contentOffset = Some(spans.head._1),
        contentSizeInBytes = Some(spans.head._2))))
    val ml = Iceberg.writeManifestList(spark, base, "snap3002.avro", 3002L,
      Seq((m1, l1), (m2, l2)), contents = Seq(0, 1),
      sequenceNumbers = Seq(1L, 2L), addedSnapshotIds = Seq(3001L, 3002L))
    Iceberg.writeMetadata(spark, base, 1, Seq((3002L, 2000L, ml)),
      formatVersion = 3, schemaFieldsJson = fieldsJson, lastColumnId = 2)
    base
  }

  test("a v3 deletion vector drops exactly its positions") {
    val base = v3Table(Array(1L, 3L, 6L)) // kills ids 2, 4, 7 (0-based rows)
    val got = Iceberg.read(spark, base).select("id").collect()
      .map(_.getLong(0)).toSet
    assert(got == Set(1L, 3L, 5L, 6L, 8L), got)
    // and the kill survives a projection + filter (pushdown intact)
    assert(Iceberg.read(spark, base).where(col("id") <= 4L).count() == 2L)
  }

  test("DV corruption and cardinality drift refuse loudly, never a partial read") {
    val e1 = intercept[Exception](
      Iceberg.read(spark, v3Table(Array(1L, 3L), corruptCrc = true)).collect())
    assert(e1.getMessage != null && e1.getMessage.contains("checksum"),
      e1.getMessage)
    val e2 = intercept[Exception](
      Iceberg.read(spark, v3Table(Array(1L, 3L),
        cardinalityOverride = Some(5L))).collect())
    assert(e2.getMessage != null && e2.getMessage.contains("record_count"),
      e2.getMessage)
  }

  test("two live DVs referencing one data file refuse — v3 allows at most one") {
    val base = freshDir()
    val f1 = dataFile(base, "f1.parquet", Seq((1L, "a")).toDF("id", "name"))
    val (puffin, spans) = Iceberg.writePuffin(spark, base, "dv.puffin",
      Seq((Iceberg.dvBlob(Array(0L)), f1), (Iceberg.dvBlob(Array(0L)), f1)),
      3102L, 2L)
    def dvEntry(span: (Long, Long)) = Iceberg.Entry(puffin, status = 1,
      content = 1, format = "PUFFIN", sequenceNumber = Some(2L),
      recordCount = 1L, referencedDataFile = Some(f1),
      contentOffset = Some(span._1), contentSizeInBytes = Some(span._2))
    val (m1, l1) = Iceberg.writeManifest(spark, base, "m1.avro", 3101L,
      Seq(Iceberg.Entry(f1, status = 1, sequenceNumber = Some(1L))))
    val (m2, l2) = Iceberg.writeManifest(spark, base, "m2.avro", 3102L,
      spans.map(dvEntry))
    val ml = Iceberg.writeManifestList(spark, base, "snap3102.avro", 3102L,
      Seq((m1, l1), (m2, l2)), contents = Seq(0, 1),
      sequenceNumbers = Seq(1L, 2L), addedSnapshotIds = Seq(3101L, 3102L))
    Iceberg.writeMetadata(spark, base, 1, Seq((3102L, 2000L, ml)),
      formatVersion = 3, schemaFieldsJson = fieldsJson, lastColumnId = 2)
    val e = intercept[IllegalArgumentException](Iceberg.read(spark, base))
    assert(e.getMessage.contains("at most one DV"), e.getMessage)
  }

  test("v3 writes refuse with the read-only contract named; v3 defaults refuse reads") {
    val base = v3Table(Array(1L))
    val e = intercept[IllegalArgumentException](IcebergWriter.commitAppend(
      spark, base, Seq((9L, "x")).toDF("id", "name"), 3003L, 3000L))
    assert(e.getMessage.contains("format-version 3"), e.getMessage)
    intercept[IllegalArgumentException](
      IcebergWriter.deleteWhere(spark, base, col("id") === 1L, 3003L, 3000L))
    intercept[IllegalArgumentException](
      IcebergWriter.compact(spark, base, 3003L, 3000L))
    // a v3 schema declaring a column DEFAULT refuses the read: this
    // reader would null-fill where the default applies
    val base2 = freshDir()
    val f1 = dataFile(base2, "f1.parquet", Seq((1L, "a")).toDF("id", "name"))
    val (m1, l1) = Iceberg.writeManifest(spark, base2, "m1.avro", 3201L,
      Seq(Iceberg.Entry(f1, status = 1, sequenceNumber = Some(1L))))
    val ml = Iceberg.writeManifestList(spark, base2, "snap3201.avro", 3201L,
      Seq((m1, l1)), sequenceNumbers = Seq(1L), addedSnapshotIds = Seq(3201L))
    Iceberg.writeMetadata(spark, base2, 1, Seq((3201L, 1000L, ml)),
      formatVersion = 3, lastColumnId = 3, schemaFieldsJson =
        """[{"id":1,"name":"id","required":false,"type":"long"},
          |{"id":2,"name":"name","required":false,"type":"string"},
          |{"id":3,"name":"bonus","required":false,"type":"long","initial-default":7}]"""
          .stripMargin.replace("\n", ""))
    val e2 = intercept[IllegalArgumentException](Iceberg.read(spark, base2))
    assert(e2.getMessage.contains("default"), e2.getMessage)
  }

  test("v4+ still refuses at the metadata gate") {
    val base = v3Table(Array(0L))
    val mdPath = java.nio.file.Path.of(base, "metadata", "v1.metadata.json")
    val doc = java.nio.file.Files.readString(mdPath)
    java.nio.file.Files.writeString(mdPath,
      doc.replace("\"format-version\":3", "\"format-version\":4"))
    // the nio rewrite bypassed Hadoop's local-FS checksum sidecar
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Path.of(base, "metadata", ".v1.metadata.json.crc"))
    val e = intercept[IllegalArgumentException](Iceberg.read(spark, base))
    assert(e.getMessage.contains("format-version"), e.getMessage)
  }

  test("a changelog over a DV-attaching snapshot pays the exact diff: deletes surface") {
    // two snapshots on one v3 table: 3301 adds the data file, 3302 adds
    // ONLY the DV manifest (the data manifest carries). The DV's
    // presence must force the exact-diff stratum — a cheap adds-only
    // attribution would report ZERO changes and silently swallow the
    // deletes the DV made
    val base = freshDir()
    val f1 = dataFile(base, "f1.parquet",
      (1L to 6L).map(i => (i, s"n$i")).toDF("id", "name"))
    val (m1, l1) = Iceberg.writeManifest(spark, base, "m1.avro", 3301L,
      Seq(Iceberg.Entry(f1, status = 1, sequenceNumber = Some(1L))))
    val ml1 = Iceberg.writeManifestList(spark, base, "snap3301.avro", 3301L,
      Seq((m1, l1)), sequenceNumbers = Seq(1L), addedSnapshotIds = Seq(3301L))
    val kills = Array(0L, 4L) // ids 1 and 5
    val (puffin, spans) = Iceberg.writePuffin(spark, base, "dv.puffin",
      Seq((Iceberg.dvBlob(kills), f1)), 3302L, 2L)
    val (m2, l2) = Iceberg.writeManifest(spark, base, "m2.avro", 3302L,
      Seq(Iceberg.Entry(puffin, status = 1, content = 1, format = "PUFFIN",
        sequenceNumber = Some(2L), recordCount = 2L,
        referencedDataFile = Some(f1),
        contentOffset = Some(spans.head._1),
        contentSizeInBytes = Some(spans.head._2))))
    val ml2 = Iceberg.writeManifestList(spark, base, "snap3302.avro", 3302L,
      Seq((m1, l1), (m2, l2)), contents = Seq(0, 1),
      sequenceNumbers = Seq(1L, 2L), addedSnapshotIds = Seq(3301L, 3302L))
    Iceberg.writeMetadata(spark, base, 1,
      Seq((3301L, 1000L, ml1), (3302L, 2000L, ml2)),
      formatVersion = 3, schemaFieldsJson = fieldsJson, lastColumnId = 2)
    val changes = Iceberg.changesBetween(spark, base, 3301L, 3302L)
      .select("id", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(changes == Set((1L, "delete"), (5L, "delete")), changes)
  }
}
