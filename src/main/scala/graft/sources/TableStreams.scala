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

  /** The Delta table's declared partition columns (empty when none) —
    * what a streaming sink must partition its batch publishes by. */
  def deltaPartitionColumns(spark: SparkSession, path: String): Seq[String] =
    DeltaLogReader.replayState(spark, path, None)._2
      .map(_.path("partitionColumns")).toSeq
      .flatMap(n => (0 until n.size()).map(n.get(_).asText()))

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

  /** v3 ROW-LINEAGE read: the table's current rows WITH their derived
    * `_row_id` column — `first_row_id + position` per the spec's
    * inheritance rule (no materialized column needed), which makes row
    * ids STABLE across deletes: a surviving row keeps its id forever,
    * the property CDC/audit consumers key on. Requires every live data
    * file to carry a `first_row_id` stamp (this repo's
    * [[IcebergWriter.commitAppendV3]] always stamps; pre-v3 files are
    * unassigned and refuse by name). Deletion vectors apply; the blobs
    * decode DRIVER-side here (KB-scale roaring bitmaps, the same 5M
    * total-cardinality bound the v3 delete writer enforces) — the
    * plain read's executor-side decode stays the scan path. */
  def icebergReadWithRowIds(spark: SparkSession, table: String)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col}
    val doc = Iceberg.metadata(spark, table)
    require(doc.path("format-version").asInt(1) == 3,
      s"Iceberg table $table is not format-version 3 — row lineage is a v3 feature")
    val fields = Iceberg.currentSchemaFields(doc).getOrElse(
      throw new IllegalArgumentException(
        s"Iceberg table $table has no schema — nothing to type the read from"))
    val cur = doc.path("current-snapshot-id").asLong(-1L)
    require(cur > 0, s"Iceberg table $table has no current snapshot")
    val mlPath = Iceberg.manifestListOf(doc, table, cur)
    val planned = Iceberg.listLiveFiles(spark, table, mlPath, cur)
    require(planned.deletes.isEmpty && planned.eqDeletes.isEmpty,
      s"Iceberg table $table carries v2 position/equality deletes — the " +
        "row-id read serves v3 DV tables only")
    require(planned.data.nonEmpty, s"Iceberg table $table has no live data files")
    // per-file first_row_id from the manifests (entry-level stamps; a
    // live file without one is pre-v3 / unassigned — refuse by name)
    import scala.jdk.CollectionConverters._
    val frids = scala.collection.mutable.Map.empty[String, Long]
    Iceberg.readAvro(spark, Iceberg.resolve(table, mlPath)).foreach { m =>
      if (Option(m.get("content")).forall(_.toString == "0")) {
        val mPath = m.get("manifest_path").toString
        Iceberg.readAvro(spark, Iceberg.resolve(table, mPath)).foreach { e =>
          val st = Iceberg.longField(e, "status").getOrElse(0L)
          if (st != 2L) {
            val dfr = e.get("data_file").asInstanceOf[org.apache.avro.generic.GenericRecord]
            val fp = Iceberg.normPathDriver(
              Iceberg.resolve(table, dfr.get("file_path").toString).toString)
            Iceberg.longField(dfr, "first_row_id") match {
              case Some(v) => frids(fp) = v
              case None => throw new IllegalArgumentException(
                s"data file ${dfr.get("file_path")} of $table carries no " +
                  "first_row_id — its rows are unassigned (pre-v3 " +
                  "generation); compact/rewrite before reading row ids")
            }
          }
        }
      }
    }
    val fridDf = spark.createDataFrame(frids.toSeq).toDF("__rl_fp", "__rl_frid")
    val reserved = Seq("__rl_fp", "__rl_frid", "__rl_pos", "_row_id")
    require(!fields.exists(f => reserved.contains(f.name)),
      s"a column of $table collides with the row-id read's internals " +
        s"(${reserved.mkString(", ")}); rename it first")
    val base = Iceberg
      .readWithMetadataSchema(spark, fields, planned.data.map(_._1))
      .select(col("*"),
        Iceberg.normPath(col("_metadata.file_path")).as("__rl_fp"),
        col("_metadata.row_index").as("__rl_pos"))
      .join(broadcast(fridDf), Seq("__rl_fp"))
      .withColumn("_row_id", col("__rl_frid") + col("__rl_pos"))
    // apply the live DVs: driver-decoded dead (file, pos) pairs under
    // the same 5M bound the v3 delete writer enforces
    val deadTotal = planned.dvs.map(_.cardinality).sum
    require(deadTotal <= 5000000L,
      s"Iceberg table $table carries $deadTotal DV positions — past the " +
        "row-id read's 5M driver bound; use the plain read (executor-side " +
        "decode) or compact first")
    val conf = spark.sessionState.newHadoopConf()
    val dead: Seq[(String, Long)] = planned.dvs.flatMap { d =>
      val p = new org.apache.hadoop.fs.Path(d.puffin)
      val dfs = p.getFileSystem(conf)
      val bytes = new Array[Byte](dfs.getFileStatus(p).getLen.toInt)
      val in = dfs.open(p)
      try in.readFully(bytes) finally in.close()
      Iceberg.icebergDvPositions(bytes, d).map(pos =>
        (Iceberg.normPathDriver(
          Iceberg.resolve(table, d.referencedDataFile).toString), pos))
    }
    val out =
      if (dead.isEmpty) base
      else base.join(
        broadcast(spark.createDataFrame(dead).toDF("__rl_fp", "__rl_pos")),
        Seq("__rl_fp", "__rl_pos"), "left_anti")
    out.drop("__rl_fp", "__rl_pos", "__rl_frid")
  }
}
