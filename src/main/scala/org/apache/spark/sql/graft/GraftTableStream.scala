package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset, StreamingRelation}
import org.apache.spark.sql.sources.StreamSourceProvider
import org.apache.spark.sql.types.StructType

import graft.sources.{DeltaLogReader, DeltaLogWriter, Iceberg, TableStreams}

/** `spark.readStream.table("<cat>.ns.t")` — the by-name streaming read
  * over the repo's Delta/Iceberg interpreters, spelled as a V1
  * structured-streaming `Source`: `getBatch` returns a DATAFRAME, so
  * each micro-batch delegates straight to the format readers
  * ([[DeltaLogReader.addsBetween]] / [[Iceberg.readIncremental]]) and
  * the engine's own offset log provides exactly-once with resume — the
  * same seam Delta's production source uses, and the reason this file
  * lives in the `org.apache.spark.sql` package tree (the V1 Source API
  * is `private[sql]`).
  *
  * Semantics: PLAIN APPENDED ROWS per commit/snapshot (the delta
  * source's default). A Delta commit that removes data or attaches
  * deletion vectors, and an Iceberg snapshot that adds delete files or
  * removes data files, REFUSE loudly — a plain add stream would serve
  * rows the table no longer holds (consume the CDF/changelog APIs for
  * CDC). Offsets: the Delta log version / the COUNT of Iceberg
  * snapshots consumed (the snapshot list is append-only; ids are not
  * ordered). A fresh stream over an existing table replays it from the
  * beginning — version 0 / a full read of the first unconsumed
  * snapshot range — unless `startVersion` says otherwise (Delta only).
  *
  * Wiring: [[graft.plans.CatalogTableSubstitution]] replaces the
  * analyzer's `StreamingRelationV2` over a
  * [[graft.sources.GraftSqlTable]] with a V1 `StreamingRelation` over
  * [[GraftTableStreamProvider]], output re-aliased — the same
  * substitution discipline as the batch path. */
class GraftTableStreamProvider extends StreamSourceProvider
    with org.apache.spark.sql.sources.StreamSinkProvider {

  private def need(params: Map[String, String], k: String): String =
    params.getOrElse(k, throw new IllegalArgumentException(
      s"GraftTableStreamProvider needs option '$k'"))

  /** The STREAMING SINK half — `df.writeStream.format(<this class>)
    * .option("path", loc).option("format", "delta")` — EXACTLY-ONCE
    * into Delta through the protocol's own `txn` actions
    * ([[graft.sources.DeltaLogWriter.appendStreamBatch]]): every batch
    * commits its adds together with `{"txn": {appId, version}}`, and a
    * replayed batch (crash between the data commit and the engine's
    * offset commit — the V1 sink's at-least-once window) SKIPS instead
    * of double-landing. `appId` = option `txnAppId`, defaulting to the
    * checkpointLocation (stable across restarts by construction).
    * Append mode only; Iceberg sinks refuse naming the
    * foreachBatch + commitAppendOptimistic pattern (Iceberg's snapshot
    * summaries, not txn actions, would carry the ledger — q252). */
  override def createSink(sqlContext: SQLContext,
                          parameters: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    require(outputMode == org.apache.spark.sql.streaming.OutputMode.Append(),
      s"the graft table sink appends — output mode $outputMode would need " +
        "keyed upserts; use foreachBatch + the writers' upsert")
    val path = need(parameters, "path")
    require(need(parameters, "format") == "delta",
      "the graft table sink streams into DELTA (txn-action idempotence); " +
        "Iceberg ingest is foreachBatch + commitAppendOptimistic (q252)")
    val appId = parameters.get("txnAppId")
      .orElse(parameters.get("checkpointLocation"))
      .getOrElse(throw new IllegalArgumentException(
        "the graft table sink needs option 'txnAppId' (or a " +
          "checkpointLocation to derive it from) — the exactly-once " +
          "ledger is per-writer"))
    new GraftDeltaStreamSink(sqlContext.sparkSession, path, appId,
      partitionColumns)
  }

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): (String, StructType) = {
    val spark = sqlContext.sparkSession
    val path = need(parameters, "path")
    val st = schema.getOrElse(
      GraftTableStreamProvider.tableSchema(spark, path,
        need(parameters, "format") == "delta"))
    (s"graft-table[$path]", st)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source = {
    val spark = sqlContext.sparkSession
    val path = need(parameters, "path")
    val isDelta = need(parameters, "format") == "delta"
    val st = schema.getOrElse(
      GraftTableStreamProvider.tableSchema(spark, path, isDelta))
    if (isDelta)
      new GraftDeltaAddsSource(spark, path, st,
        parameters.get("startVersion").map(_.toLong).getOrElse(0L))
    else
      new GraftIcebergAppendsSource(spark, path, st)
  }
}

private[graft] object GraftTableStreamProvider {
  /** The table's CURRENT logical schema — what every appended batch must
    * union into. */
  def tableSchema(spark: SparkSession, path: String, isDelta: Boolean): StructType =
    TableStreams.schemaOf(spark, path, isDelta)

  /** V1 sources receive RAW serialized offsets on restart — the classic
    * recovery path hands `SerializedOffset(json)`, not the typed class. */
  def toLong(o: V1Offset): Long = o match {
    case LongOffset(v) => v
    case SerializedOffset(json) => json.trim.toLong
    case other => throw new IllegalArgumentException(
      s"unexpected offset ${other.getClass.getName}: $other")
  }
}

/** Delta per-commit append stream: offset = log version, batch (s, e] =
  * [[DeltaLogReader.addsBetween]](s+1, e). */
private[graft] class GraftDeltaAddsSource(spark: SparkSession, path: String,
                                          st: StructType, startVersion: Long)
    extends Source {
  import GraftTableStreamProvider.toLong
  override def schema: StructType = st
  override def getOffset: Option[V1Offset] =
    DeltaLogReader.latestVersion(spark, path).map(LongOffset(_))
  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val fromV = start.map(toLong(_) + 1).getOrElse(startVersion)
    val toV = toLong(end)
    val df =
      if (fromV > toV) // recovery can replay an empty range — serve typed-empty
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], st)
      else DeltaLogReader.addsBetween(spark, path, fromV, toV)
    StreamBridge.conform(df, st)
  }
  override def commit(end: V1Offset): Unit = ()
  override def stop(): Unit = ()
  override def toString: String = s"GraftDeltaAddsSource[$path]"
}

/** Iceberg per-snapshot append stream: offset = COUNT of snapshots
  * consumed (the snapshot list is append-only — ids are random longs,
  * timestamps only non-decreasing); batch (s, e] =
  * [[Iceberg.readIncremental]] between snapshots[s-1] and
  * snapshots[e-1], or a full [[Iceberg.readSnapshot]] of
  * snapshots[e-1] when s = 0 (a fresh stream replays the table). A
  * history rewritten under the stream (expired/rolled back past the
  * offset) refuses through the readers' own guards. */
private[graft] class GraftIcebergAppendsSource(spark: SparkSession,
                                               path: String, st: StructType)
    extends Source {
  import GraftTableStreamProvider.toLong
  private def snapshotIds(): Seq[Long] = TableStreams.icebergSnapshotIds(spark, path)
  override def schema: StructType = st
  override def getOffset: Option[V1Offset] = {
    val n = snapshotIds().size
    if (n == 0) None else Some(LongOffset(n.toLong))
  }
  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val fromN = start.map(toLong).getOrElse(0L)
    val toN = toLong(end)
    val ids = snapshotIds()
    require(toN <= ids.size,
      s"stream offset $toN is past $path's ${ids.size}-snapshot history — " +
        "the history was rewritten under the stream (expire/rollback); " +
        "restart the stream from a fresh checkpoint")
    val df =
      if (fromN >= toN) // recovery can replay an empty range
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], st)
      else if (fromN == 0L) Iceberg.readSnapshot(spark, path, ids((toN - 1).toInt))
      else Iceberg.readIncremental(spark, path,
        ids((fromN - 1).toInt), ids((toN - 1).toInt))
    StreamBridge.conform(df, st)
  }
  override def commit(end: V1Offset): Unit = ()
  override def stop(): Unit = ()
  override def toString: String = s"GraftIcebergAppendsSource[$path]"
}

/** The Delta streaming sink: one txn-stamped append commit per
  * micro-batch. The engine hands `addBatch` an INCREMENTAL-execution
  * frame — re-wrap it as a batch frame off the materialized RDD (the
  * V1 sink discipline every real sink follows) before the writer plans
  * its own jobs over it. */
private[graft] class GraftDeltaStreamSink(spark: SparkSession, path: String,
                                          appId: String,
                                          partitionColumns: Seq[String])
    extends org.apache.spark.sql.execution.streaming.Sink {
  override def addBatch(batchId: Long,
                        data: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row]): Unit = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val batchDf = cs.internalCreateDataFrame(
      data.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
        .queryExecution.toRdd,
      data.schema, isStreaming = false)
    val partCols =
      if (partitionColumns.nonEmpty) partitionColumns
      else TableStreams.deltaPartitionColumns(spark, path)
    DeltaLogWriter.appendStreamBatch(batchDf, path, appId, batchId, partCols)
      match {
        case Some(v) =>
          // Delta's own checkpoint-every-10-commits discipline: bounds
          // the per-batch txn-ledger walk (and every reader's replay) to
          // O(commits-since-checkpoint). No cleanLog here — downstream
          // by-name streams of THIS table keep their commit history.
          if (v % 10 == 0)
            try DeltaLogWriter.checkpoint(spark, path)
            catch { case e: Throwable =>
              // checkpointing is maintenance, never batch-fatal
              org.slf4j.LoggerFactory.getLogger(getClass).warn(
                s"checkpoint at v$v of $path failed (stream continues): ${e.getMessage}")
            }
        case None => // replayed batch — the txn ledger already holds it
      }
  }
  override def name(): String = s"graft-delta-sink[$path]"
  override def toString: String = name()
}

/** Constructor bridge for the `private[sql]` V1 streaming plan pieces. */
object StreamBridge {
  /** Conform a range read to the SOURCE's declared schema and mark it
    * streaming: pins column order, and NULL-FILLS columns the range's
    * generation predates — on recovery the engine replays the last
    * logged batch through a source created with the CURRENT schema, so
    * an ADD COLUMN between the original run and the replay must serve
    * nulls (the declared-schema scan rule), never an unresolved-column
    * error. */
  def conform(df: DataFrame, st: StructType): DataFrame = {
    val have = df.columns.toSet
    asStreaming(df.select(st.fields.map { f =>
      if (have(f.name)) df(s"`${f.name}`")
      else org.apache.spark.sql.functions.lit(null).cast(f.dataType).as(f.name)
    }.toIndexedSeq: _*))
  }

  /** Re-wrap a batch frame as a STREAMING one (`isStreaming = true`) —
    * what every V1 `Source.getBatch` must return; the engine asserts it.
    * Lazy: the underlying RDD computes when the sink's batch runs. */
  def asStreaming(df: DataFrame): DataFrame = {
    val cs = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    cs.internalCreateDataFrame(
      df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
        .queryExecution.toRdd,
      df.schema, isStreaming = true)
  }

  def v1StreamingRelation(spark: SparkSession, providerClassName: String,
                          options: Map[String, String],
                          schema: StructType)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    val ds = org.apache.spark.sql.execution.datasources.DataSource(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      className = providerClassName,
      userSpecifiedSchema = Some(schema),
      options = options)
    StreamingRelation(ds)
  }
}
