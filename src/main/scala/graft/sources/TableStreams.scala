package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{StructField, StructType}

/** Public metadata surface for the by-name streaming source
  * ([[org.apache.spark.sql.graft.GraftTableStreamProvider]] lives in the
  * `org.apache.spark.sql` tree for the V1 `Source` API and cannot see
  * this package's `private[sources]` internals). */
object TableStreams {

  /** The table's CURRENT logical schema — what every appended streaming
    * batch must union into. */
  def schemaOf(spark: SparkSession, path: String, isDelta: Boolean): StructType =
    if (isDelta) {
      val meta = DeltaLogReader.replayState(spark, path, None)._2.getOrElse(
        throw new IllegalArgumentException(
          s"Delta log at $path carries no metaData — nothing to type the stream from"))
      org.apache.spark.sql.types.DataType
        .fromJson(meta.path("schemaString").asText())
        .asInstanceOf[StructType]
    } else {
      val fields = Iceberg.currentSchemaFields(Iceberg.metadata(spark, path))
        .getOrElse(throw new IllegalArgumentException(
          s"Iceberg table at $path has no schema — nothing to type the stream from"))
      StructType(fields.map(f =>
        StructField(f.name, Iceberg.sparkType(f.typ), nullable = true)))
    }

  /** Snapshot ids in LOG ORDER (append-only — the streaming offset
    * domain; ids themselves are random longs). */
  def icebergSnapshotIds(spark: SparkSession, table: String): Seq[Long] = {
    val it = Iceberg.metadata(spark, table).path("snapshots").elements()
    val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
    while (it.hasNext) ids += it.next().path("snapshot-id").asLong()
    ids.toSeq
  }

  /** v3 ROW-LINEAGE inspection: the table's `next-row-id` plus each
    * snapshot's `first-row-id` (absent snapshots omitted) — the fields
    * [[IcebergWriter.commitAppendV3]] maintains, surfaced for audits
    * and oracle checks. */
  def icebergLineage(spark: SparkSession, table: String)
      : (Long, Map[Long, Long]) = {
    val doc = Iceberg.metadata(spark, table)
    val it = doc.path("snapshots").elements()
    val m = scala.collection.mutable.Map.empty[Long, Long]
    while (it.hasNext) {
      val s = it.next()
      if (s.has("first-row-id"))
        m(s.path("snapshot-id").asLong()) = s.path("first-row-id").asLong()
    }
    (doc.path("next-row-id").asLong(-1L), m.toMap)
  }

  /** Live DELETION-VECTOR stats of the current snapshot: (number of DV
    * entries, total declared cardinality) — one entry per referenced
    * data file when the v3 supersede rule holds. */
  def icebergLiveDvStats(spark: SparkSession, table: String): (Int, Long) = {
    val doc = Iceberg.metadata(spark, table)
    val cur = doc.path("current-snapshot-id").asLong(-1L)
    require(cur > 0, s"Iceberg table $table has no current snapshot")
    val planned = Iceberg.listLiveFiles(spark, table,
      Iceberg.manifestListOf(doc, table, cur), cur)
    (planned.dvs.size, planned.dvs.map(_.cardinality).sum)
  }
}
