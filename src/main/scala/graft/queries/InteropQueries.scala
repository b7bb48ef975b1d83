package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.Tables.{scratch, scratchPat}
import graft.operators.SnapshotLog
import graft.queries.IndexQueries.stageSingleFile

/** Table-format INTEROP tier (SURVEY §2.2 S3/S4 + §2.10) as driver
  * queries — the q2xx Delta/Iceberg read/write/stream/SQL-catalog
  * surface, split out of [[IndexQueries]] for maintainability (VERDICT
  * r18 task 7): snapshot DML, Delta log write/read interop (OPTIMIZE /
  * VACUUM / RESTORE / CDF / DVs / column mapping / streaming sinks),
  * Iceberg v1/v2/v3 write/read (compaction, upserts, hidden
  * partitioning, changelogs, metadata tables), and the SQL catalog
  * statements (INSERT/DELETE/MERGE/DDL/OPTIMIZE ZORDER). Query map and
  * oracles are UNCHANGED — same keys, same bodies, same staging — only
  * the file moved. */
object InteropQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.table(s, dir, n)

  private val q228TablePat = scratchPat("q228_iceberg")
  private val q232TablePat = scratchPat("q232_iceberg_part")
  private val q241TablePat = scratchPat("q241_iceberg_hidden")
  private val q243TablePat = scratchPat("q243_iceberg_w")
  private val q244TablePat = scratchPat("q244_delta_asof")
  private val q245TablePat = scratchPat("q245_iceberg_del")
  private val q246TablePat = scratchPat("q246_iceberg_compact")
  private val q247TablePat = scratchPat("q247_iceberg_upsert")
  private val q248TablePat = scratchPat("q248_iceberg_expire")
  private val q249TablePat = scratchPat("q249_iceberg_meta")
  private val q250TablePat = scratchPat("q250_delta_optimize")
  private val q251TablePat = scratchPat("q251_delta_retention")
  private val q252TablePat = scratchPat("q252_iceberg_cdc")
  private val q253TablePat = scratchPat("q253_delta_upsert")
  private val q254TablePat = scratchPat("q254_iceberg_clustered")
  private val q255TablePat = scratchPat("q255_iceberg_partwrite")
  private val q256TablePat = scratchPat("q256_iceberg_evolve")
  private val q257TablePat = scratchPat("q257_delta_restore")
  private val q258TablePat = scratchPat("q258_iceberg_rollback")
  private val q259TablePat = scratchPat("q259_iceberg_hiddenpart")
  private val q260TablePat = scratchPat("q260_delta_cdf")
  private val q261TablePat = scratchPat("q261_iceberg_rewriteman")
  private val q262RegPat = scratchPat("q262_catalog_registry")
  private val q264TablePat = scratchPat("q264_delta_mapwrite")
  private val q265TablePat = scratchPat("q265_iceberg_changelog")
  private val q267RegPat = scratchPat("q267_sql_catalog_registry")
  private val q268TablePat = scratchPat("q268_delta_partdml")
  private val q269TablePat = scratchPat("q269_delta_mapdml")
  private val q270TablePat = scratchPat("q270_delta_stream")
  private val q271TablePat = scratchPat("q271_delta_cdc_in")
  private val q272TablePat = scratchPat("q272_iceberg_v3dv")
  private val q273TablePat = scratchPat("q273_sql_insert")
  private val q274TablePat = scratchPat("q274_sql_delete")
  private val q275TablePat = scratchPat("q275_sql_lifecycle")
  private val q276TablePat = scratchPat("q276_sql_dml")
  private val q277TablePat = scratchPat("q277_sql_evolve")
  private val q278TablePat = scratchPat("q278_stream_table")
  private val q279TablePat = scratchPat("q279_iceberg_v3w")
  private val q281TablePat = scratchPat("q281_sql_zorder")
  private val q286TablePat = scratchPat("q286_sql_optwhere")
  private val q236TablePat = scratchPat("q236_iceberg_mor")
  private val q237TablePat = scratchPat("q237_iceberg_eqdel")
  private val q238TablePat = scratchPat("q238_delta_mapped")
  private val q239TablePat = scratchPat("q239_delta_dv")
  private val q240TablePat = scratchPat("q240_delta_dvdel")
  private val q201TablePat = scratchPat("q201_table")
  private val q202TablePat = scratchPat("q202_table")
  private val q203TablePat = scratchPat("q203_table")
  private val q205TablePat = scratchPat("q205_table")
  private val q206TablePat = scratchPat("q206_table")
  private val q206ClonePat = scratchPat("q206_clone")
  /** q228/q229's fixture: a minimal but REAL Apache Iceberg table
    * hand-assembled from the same deterministic `events` slices as q193's
    * Delta twin — `metadata/vN.metadata.json` + `version-hint.text`,
    * per-snapshot manifest-list Avro, manifest Avro entries with
    * ADDED/EXISTING/DELETED statuses — so [[graft.sources.Iceberg]] is
    * exercised against the public format's own layout. Snapshot history:
    *   1001: manifest m1 [f1 ADDED, f2 ADDED]            (all purchases)
    *   1002: manifest m2 [f1 DELETED, f2 EXISTING, f3 ADDED]
    *   1003: manifest list [m2, m3], m3 [f4 ADDED]  ← multi-manifest union
    *         PLUS carried DELETED/EXISTING resolution through m2
    * Active set = f2 ∪ f3 ∪ f4, the exact slices q193's oracle replays. */
  private[graft] def stageQ228IcebergTable(s: SparkSession, dir: String): Unit = {
    val base = scratch(q228TablePat, dir)
    Tables.stageOnce(s, base, Tables.sourceSig(s, dir, "events")) {
      import s.implicits._
      import graft.sources.Iceberg
      val hconf = s.sparkContext.hadoopConfiguration
      val bp = new org.apache.hadoop.fs.Path(base)
      val fs = bp.getFileSystem(hconf)
      fs.delete(bp, true)
      val dataDir = new org.apache.hadoop.fs.Path(bp, "data")
      fs.mkdirs(dataDir)
      val ev = t(s, dir, "events").select($"event_id", $"event_type",
        round($"value" * 1e6).cast("long").as("value_micros"))
      def writeFile(df: DataFrame, name: String): String =
        stageSingleFile(fs, bp, df, name, dataDir)
      val f1 = writeFile(ev.where($"event_type" === "purchase" && $"event_id" % 2 === 0), "f1.parquet")
      val f2 = writeFile(ev.where($"event_type" === "purchase" && $"event_id" % 2 =!= 0), "f2.parquet")
      val f3 = writeFile(ev.where($"event_type" === "click"), "f3.parquet")
      val f4 = writeFile(ev.where($"event_type" === "view" && $"value_micros" > 100000000L), "f4.parquet")
      val m1 = Iceberg.writeManifest(s, base, "m1.avro", 1001L,
        Seq(Iceberg.Entry(f1, 1), Iceberg.Entry(f2, 1)))
      val m2 = Iceberg.writeManifest(s, base, "m2.avro", 1002L,
        Seq(Iceberg.Entry(f1, 2), Iceberg.Entry(f2, 0), Iceberg.Entry(f3, 1)))
      val m3 = Iceberg.writeManifest(s, base, "m3.avro", 1003L,
        Seq(Iceberg.Entry(f4, 1)))
      val ml1 = Iceberg.writeManifestList(s, base, "snap-1001.avro", 1001L, Seq(m1))
      val ml2 = Iceberg.writeManifestList(s, base, "snap-1002.avro", 1002L, Seq(m2))
      val ml3 = Iceberg.writeManifestList(s, base, "snap-1003.avro", 1003L, Seq(m2, m3))
      Iceberg.writeMetadata(s, base, version = 3,
        Seq((1001L, 1000L, ml1), (1002L, 2000L, ml2), (1003L, 3000L, ml3)))
    }
  }
  /** q232/q234's fixture: a PARTITIONED Iceberg table with REAL planning
    * stats — the manifest fields the q228 minimal fixture omits. Layout
    * (snapshot 2001 at ts 1000 lists the first three types' manifests;
    * 2002 at ts 5000, the current snapshot, lists all five — two
    * genuinely different active sets for the AS-OF-timestamp query):
    *  - identity partition on `event_type` → one manifest per type (5),
    *    each named in the manifest-list `partitions` summary, so a
    *    type-selective query prunes four manifests WITHOUT opening them;
    *  - two files per type split at value_micros 50_000_000, each entry
    *    carrying exact `lower_bounds`/`upper_bounds` for event_id (1) and
    *    value_micros (3) plus its identity `partition` value, so a value
    *    range prunes the other half;
    *  - metadata carries the schema (field ids 1–3) and the identity
    *    partition spec; data files are parquet-field-id-stamped like a
    *    real Iceberg writer's, so the field-id read path serves them.
    * 10 files total; q232's point-ish query must plan exactly 1
    * (Round12QueriesSpec pins the counts). */
  private[graft] def stageQ232IcebergTable(s: SparkSession, dir: String): String = {
    val base = scratch(q232TablePat, dir)
    // layout tag: per-snapshot manifest attribution (q242) restages
    // fixtures written by the earlier all-2001 spelling
    Tables.stageOnce(s, base, Tables.sourceSig(s, dir, "events") + "|snapattr") {
      import s.implicits._
      import graft.sources.Iceberg
      import org.apache.spark.sql.types._
      val bp = new org.apache.hadoop.fs.Path(base)
      val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(bp, true)
      val dataDir = new org.apache.hadoop.fs.Path(bp, "data")
      fs.mkdirs(dataDir)
      def idMeta(id: Long) =
        new MetadataBuilder().putLong("parquet.field.id", id).build()
      val st = StructType(Seq(
        StructField("event_id", LongType, nullable = true, idMeta(1)),
        StructField("event_type", StringType, nullable = true, idMeta(2)),
        StructField("value_micros", LongType, nullable = true, idMeta(3))))
      s.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
      val ev = s.createDataFrame(
        t(s, dir, "events").select($"event_id", $"event_type",
          round($"value" * 1e6).cast("long").as("value_micros")).rdd, st)
        .persist()
      val Split = 50000000L
      // exact per-(type, half) stats in ONE aggregation — the truthful
      // bounds a real writer records while writing each file
      val stats = ev.groupBy($"event_type",
          ($"value_micros" >= Split).as("hi"))
        .agg(min($"event_id").as("lo_id"), max($"event_id").as("hi_id"),
          min($"value_micros").as("lo_v"), max($"value_micros").as("hi_v"))
        .collect()
        .map(r => (r.getString(0), r.getBoolean(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
      val types = stats.keySet.map(_._1).toSeq.sorted
      val manifests = types.zipWithIndex.map { case (et, i) =>
        // entries carry the snapshot that ADDED them: the first three
        // types' manifests belong to snapshot 2001, the remaining two to
        // 2002 — the attribution the incremental append scan (q242)
        // reads; full-snapshot replay ignores it
        val addedBy = if (i < 3) 2001L else 2002L
        val entries = Seq(false, true).flatMap { hi =>
          stats.get((et, hi)).map { case (loId, hiId, loV, hiV) =>
            val slice = ev.where($"event_type" === et &&
              (if (hi) $"value_micros" >= Split else $"value_micros" < Split))
            val f = stageSingleFile(fs, bp, slice,
              s"${et}_${if (hi) "hi" else "lo"}.parquet", dataDir)
            Iceberg.Entry(f, 1,
              partition = Seq("event_type" -> et),
              lowerBounds = Seq(1 -> Iceberg.encodeLong(loId),
                3 -> Iceberg.encodeLong(loV)),
              upperBounds = Seq(1 -> Iceberg.encodeLong(hiId),
                3 -> Iceberg.encodeLong(hiV)))
          }
        }
        (Iceberg.writeManifest(s, base, s"m_$et.avro", addedBy, entries),
          Seq(Iceberg.Summary(Some(Iceberg.encodeString(et)),
            Some(Iceberg.encodeString(et)))))
      }
      ev.unpersist()
      val schemaJson = "[" + Iceberg.fieldJson(1, "event_id", "long") + "," +
        Iceberg.fieldJson(2, "event_type", "string") + "," +
        Iceberg.fieldJson(3, "value_micros", "long") + "]"
      val specJson = "[" + Iceberg.identityPartitionJson(2, "event_type") + "]"
      // snapshot 2001 lists only the first three types' manifests;
      // 2002 (current) lists all five — so the AS-OF-timestamp query
      // (q234) reads two genuinely different active sets
      val ml1 = Iceberg.writeManifestList(s, base, "snap-2001.avro", 2001L,
        manifests.take(3).map(_._1), summaries = manifests.take(3).map(_._2))
      val ml2 = Iceberg.writeManifestList(s, base, "snap-2002.avro", 2002L,
        manifests.map(_._1), summaries = manifests.map(_._2))
      Iceberg.writeMetadata(s, base, version = 2,
        Seq((2001L, 1000L, ml1), (2002L, 5000L, ml2)),
        schemaFieldsJson = schemaJson, partitionSpecJson = specJson)
    }
    base
  }
  /** q241's fixture: an Iceberg table with HIDDEN partitioning — the
    * transform tier q232's identity fixture cannot exercise. Spec:
    * `bucket[4](user_id)` × `truncate[86400000000](ts_us)` (daily
    * truncation of an epoch-micros long — "hidden daily partitioning"
    * spelled through truncate so the source column stays a plain long).
    * One data file per live (bucket, day) combo — 4 buckets × the
    * generator's 30 days at every sf — written in ONE partitionBy job
    * and renamed flat; one manifest per bucket whose manifest-list
    * summary bounds BOTH partition fields, so a point-user + day-window
    * query prunes 3 of 4 manifests UNOPENED and plans only the window's
    * files inside the fourth. Files are parquet-field-id-stamped and
    * carry NO partition columns (the hidden-partitioning contract:
    * planning happens in the transformed domain, the read serves source
    * columns only). */
  private[graft] def stageQ241IcebergHiddenPart(s: SparkSession, dir: String): String = {
    val base = scratch(q241TablePat, dir)
    Tables.stageOnce(s, base, Tables.sourceSig(s, dir, "events")) {
      import s.implicits._
      import graft.sources.{Iceberg, IcebergTransforms}
      import org.apache.spark.sql.types._
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val bp = new org.apache.hadoop.fs.Path(base)
      val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(bp, true)
      val dataDir = new org.apache.hadoop.fs.Path(bp, "data")
      def idMeta(id: Long) =
        new MetadataBuilder().putLong("parquet.field.id", id).build()
      val st = StructType(Seq(
        StructField("event_id", LongType, nullable = true, idMeta(1)),
        StructField("user_id", LongType, nullable = true, idMeta(2)),
        StructField("ts_us", LongType, nullable = true, idMeta(3))))
      s.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
      val ev = s.createDataFrame(
        t(s, dir, "events").select($"event_id", $"user_id",
          expr("ts DIV 1000").as("ts_us")).rdd, st)
      val DayUs = 86400000000L
      // the writer-side transforms, evaluated with the SAME spec math the
      // planner prunes with (staging-scope UDF: one pass over events)
      val bucketOf = udf((u: Long) => IcebergTransforms.bucket(4, "long", u))
      ev.withColumn("_b", bucketOf($"user_id"))
        .withColumn("_d", expr(s"ts_us DIV $DayUs") * DayUs)
        .repartition($"_b", $"_d") // one task per combo → one part per dir
        .write.partitionBy("_b", "_d").mode("overwrite").parquet(dataDir.toString)
      // flatten the hive tree into stable per-combo file names; the
      // partition values live ONLY in manifest metadata from here on
      val combos = fs.listStatus(dataDir).filter(_.isDirectory).flatMap { bDir =>
        val b = bDir.getPath.getName.stripPrefix("_b=").toInt
        fs.listStatus(bDir.getPath).filter(_.isDirectory).map { dDir =>
          val d = dDir.getPath.getName.stripPrefix("_d=").toLong
          val parts = fs.listStatus(dDir.getPath)
            .filter(p => p.isFile && p.getPath.getName.endsWith(".parquet"))
          require(parts.length == 1,
            s"expected one part in ${dDir.getPath}, got ${parts.length}")
          val dst = new org.apache.hadoop.fs.Path(dataDir, s"b${b}_d$d.parquet")
          require(fs.rename(parts.head.getPath, dst), s"rename to $dst failed")
          (b, d, dst.toString)
        }
      }.toSeq
      fs.listStatus(dataDir).filter(_.isDirectory)
        .foreach(dd => fs.delete(dd.getPath, true))
      val manifests = combos.groupBy(_._1).toSeq.sortBy(_._1).map { case (b, fl) =>
        val entries = fl.sortBy(_._2).map { case (_, d, p) =>
          Iceberg.Entry(p, 1,
            partition = Seq("user_bucket" -> b.toLong, "ts_day" -> d))
        }
        (Iceberg.writeManifest(s, base, s"m_b$b.avro", 4001L, entries),
          Seq(
            Iceberg.Summary(Some(Iceberg.encodeInt(b)), Some(Iceberg.encodeInt(b))),
            Iceberg.Summary(Some(Iceberg.encodeLong(fl.map(_._2).min)),
              Some(Iceberg.encodeLong(fl.map(_._2).max)))))
      }
      val ml = Iceberg.writeManifestList(s, base, "snap-4001.avro", 4001L,
        manifests.map(_._1), summaries = manifests.map(_._2))
      val schemaJson = "[" + Iceberg.fieldJson(1, "event_id", "long") + "," +
        Iceberg.fieldJson(2, "user_id", "long") + "," +
        Iceberg.fieldJson(3, "ts_us", "long") + "]"
      val specJson =
        """[{"name":"user_bucket","transform":"bucket[4]","source-id":2,"field-id":1000},""" +
          """{"name":"ts_day","transform":"truncate[86400000000]","source-id":3,"field-id":1001}]"""
      Iceberg.writeMetadata(s, base, version = 1, Seq((4001L, 1000L, ml)),
        schemaFieldsJson = schemaJson, partitionSpecJson = specJson)
    }
    base
  }
  /** q243's fixture: an Iceberg table COMMITTED BY THE REPO'S OWN WRITER
    * — two `IcebergWriter.commitAppend` snapshots over deterministic
    * event slices (`event_id % 3` = 0 then 1). The writer derives the
    * schema + field ids from the frame, stamps parquet ids, records
    * footer-derived column bounds per file, and carries snapshot 6001's
    * manifest into 6002's list with its original attribution — so the
    * read-back exercises full replay, time travel, incremental
    * attribution AND stats pruning against metadata this repo WROTE,
    * not hand-assembled fixtures. */
  private[graft] def stageQ243IcebergWritten(s: SparkSession, dir: String): String = {
    val base = scratch(q243TablePat, dir)
    Tables.stageOnce(s, base, Tables.sourceSig(s, dir, "events")) {
      import s.implicits._
      val bp = new org.apache.hadoop.fs.Path(base)
      val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(bp, true)
      def slice(m: Int) = t(s, dir, "events").where($"event_id" % 3 === m)
        .select($"event_id", $"event_type",
          round($"value" * 1e6).cast("long").as("value_micros"))
        .coalesce(1)
      graft.sources.IcebergWriter.commitAppend(s, base, slice(0), 6001L, 1000L)
      graft.sources.IcebergWriter.commitAppend(s, base, slice(1), 6002L, 2000L)
    }
    base
  }
  /** q244's fixture: a Delta table written by the repo's writer in three
    * commits (purchase, +click, +error slices), whose commit-file
    * MODIFICATION TIMES are then pinned to 1000/5000/9000 ms — the
    * classic protocol rule timestamp travel resolves by (commitInfo's
    * display timestamp is deliberately not trusted; a fixture that
    * relied on wall-clock mtimes would make the oracle
    * non-deterministic). */
  private[graft] def stageQ244DeltaAsOf(s: SparkSession, dir: String): String = {
    val base = scratch(q244TablePat, dir)
    Tables.stageOnce(s, base, Tables.sourceSig(s, dir, "events")) {
      import s.implicits._
      val bp = new org.apache.hadoop.fs.Path(base)
      val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(bp, true)
      def slice(et: String) = t(s, dir, "events").where($"event_type" === et)
        .select($"event_id", $"event_type",
          round($"value" * 1e6).cast("long").as("value_micros"))
        .coalesce(1)
      graft.sources.DeltaLogWriter.write(slice("purchase"), base)
      graft.sources.DeltaLogWriter.write(slice("click"), base)
      graft.sources.DeltaLogWriter.write(slice("error"), base)
      Seq(0L -> 1000L, 1L -> 5000L, 2L -> 9000L).foreach { case (v, ts) =>
        val c = new org.apache.hadoop.fs.Path(
          new org.apache.hadoop.fs.Path(base, "_delta_log"), f"$v%020d.json")
        fs.setTimes(c, ts, -1)
      }
    }
    base
  }
  /** q245's fixture: an Iceberg table the repo's writer APPENDED and
    * then row-level DELETED from — `commitAppend` of the purchase+click
    * slice, then `deleteWhere(event_id % 5 = 0)` committing a v2
    * POSITION-delete snapshot (no data file rewritten; metadata steps
    * to format-version 2). The reader's merge-on-read machinery then
    * serves metadata this repo wrote end-to-end. */
  private[graft] def stageQ245IcebergDeleted(s: SparkSession, dir: String): String = {
    val base = scratch(q245TablePat, dir)
    Tables.stageOnce(s, base, Tables.sourceSig(s, dir, "events")) {
      import s.implicits._
      val bp = new org.apache.hadoop.fs.Path(base)
      val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(bp, true)
      val slice = t(s, dir, "events")
        .where($"event_type".isin("purchase", "click"))
        .select($"event_id", $"event_type",
          round($"value" * 1e6).cast("long").as("value_micros"))
        .coalesce(1)
      graft.sources.IcebergWriter.commitAppend(s, base, slice, 6101L, 1000L)
      graft.sources.IcebergWriter.deleteWhere(s, base,
        $"event_id" % 5 === 0, 6102L, 2000L)
    }
    base
  }
  /** q246's fixture: the COMPACTION lifecycle end-to-end — append the
    * purchase+click slice in two files, row-level delete (v2 position
    * deletes), `compact` (the rewrite that serves the MoR state as plain
    * files and drops the delete manifests from the live view), then an
    * append that the pre-compaction table would have REFUSED — the
    * "compact first" loop closed on metadata this repo wrote. */
  private[graft] def stageQ246IcebergCompacted(s: SparkSession, dir: String): String = {
    val base = scratch(q246TablePat, dir)
    Tables.stageOnce(s, base, Tables.sourceSig(s, dir, "events")) {
      import s.implicits._
      val bp = new org.apache.hadoop.fs.Path(base)
      val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(bp, true)
      def slice(types: String*) = t(s, dir, "events")
        .where($"event_type".isin(types: _*))
        .select($"event_id", $"event_type",
          round($"value" * 1e6).cast("long").as("value_micros"))
      graft.sources.IcebergWriter.commitAppend(s, base,
        slice("purchase", "click").repartition(2), 6201L, 1000L)
      graft.sources.IcebergWriter.deleteWhere(s, base,
        $"event_id" % 7 === 0, 6202L, 2000L)
      graft.sources.IcebergWriter.compact(s, base, 6203L, 3000L)
      graft.sources.IcebergWriter.commitAppend(s, base,
        slice("error").coalesce(1), 6204L, 4000L)
    }
    base
  }
  /** q247's fixture: the MoR UPSERT lifecycle — append the purchase
    * slice, then two stacked `upsert` commits keyed on event_id
    * (corrections at 2× then 3× the value), each an equality-delete +
    * append snapshot at its own data sequence. The read must apply the
    * strict `data.seq < delete.seq` rule: v1 history at sequence 0,
    * upsert 1's rows surviving upsert 1's delete but not upsert 2's. */
  private[graft] def stageQ247IcebergUpserted(s: SparkSession, dir: String): String = {
    val base = scratch(q247TablePat, dir)
    Tables.stageOnce(s, base, Tables.sourceSig(s, dir, "events")) {
      import s.implicits._
      val bp = new org.apache.hadoop.fs.Path(base)
      val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(bp, true)
      val p = t(s, dir, "events").where($"event_type" === "purchase")
        .select($"event_id", $"event_type",
          round($"value" * 1e6).cast("long").as("value_micros"))
      graft.sources.IcebergWriter.commitAppend(s, base,
        p.coalesce(1), 6301L, 1000L)
      graft.sources.IcebergWriter.upsert(s, base,
        p.where($"event_id" % 3 === 0)
          .withColumn("value_micros", $"value_micros" * 2).coalesce(1),
        Seq("event_id"), 6302L, 2000L)
      graft.sources.IcebergWriter.upsert(s, base,
        p.where($"event_id" % 6 === 0)
          .withColumn("value_micros", $"value_micros" * 3).coalesce(1),
        Seq("event_id"), 6303L, 3000L)
    }
    base
  }
  /** q248's fixture: the EXPIRATION lifecycle — two appends, a
    * compaction that supersedes their files, then `expireSnapshots`
    * dropping everything older than the compaction: the rewritten bytes
    * are physically reclaimed (the spec pins the disk state), the
    * snapshot list shrinks to the current commit, and the current read
    * is byte-identical to pre-expiration. */
  private[graft] def stageQ248IcebergExpired(s: SparkSession, dir: String): String = {
    val base = scratch(q248TablePat, dir)
    Tables.stageOnce(s, base, Tables.sourceSig(s, dir, "events")) {
      import s.implicits._
      val bp = new org.apache.hadoop.fs.Path(base)
      val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(bp, true)
      def slice(et: String) = t(s, dir, "events")
        .where($"event_type" === et)
        .select($"event_id", $"event_type",
          round($"value" * 1e6).cast("long").as("value_micros"))
        .coalesce(1)
      graft.sources.IcebergWriter.commitAppend(s, base, slice("click"), 6401L, 1000L)
      graft.sources.IcebergWriter.commitAppend(s, base, slice("error"), 6402L, 2000L)
      graft.sources.IcebergWriter.compact(s, base, 6403L, 3000L)
      graft.sources.IcebergWriter.expireSnapshots(s, base, olderThanMs = 2500L)
    }
    base
  }
  /** q249's fixture: a three-commit table (two appends + a row-level
    * delete) whose manifests carry the REAL `record_count` /
    * `file_size_in_bytes` accounting — what the metadata tables
    * (`snapshots`/`manifests`/`files`) surface and the oracle replays
    * from the source slices. */
  private[graft] def stageQ249IcebergMeta(s: SparkSession, dir: String): String = {
    val base = scratch(q249TablePat, dir)
    Tables.stageOnce(s, base, Tables.sourceSig(s, dir, "events")) {
      import s.implicits._
      val bp = new org.apache.hadoop.fs.Path(base)
      val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(bp, true)
      def slice(et: String) = t(s, dir, "events")
        .where($"event_type" === et)
        .select($"event_id", $"event_type",
          round($"value" * 1e6).cast("long").as("value_micros"))
        .coalesce(1)
      graft.sources.IcebergWriter.commitAppend(s, base, slice("purchase"), 6501L, 1000L)
      graft.sources.IcebergWriter.commitAppend(s, base, slice("click"), 6502L, 2000L)
      graft.sources.IcebergWriter.deleteWhere(s, base,
        $"event_id" % 11 === 0, 6503L, 3000L)
    }
    base
  }
  /** q250's fixture: the Delta OPTIMIZE lifecycle — two appends, a
    * deletion-vector delete (merge-on-read state), then `optimize`: the
    * dataChange=false rewrite that bin-packs the logical state into one
    * file and PURGES the DVs, on the repo's own `_delta_log`. */
  private[graft] def stageQ250DeltaOptimized(s: SparkSession, dir: String): String = {
    val base = scratch(q250TablePat, dir)
    Tables.stageOnce(s, base, Tables.sourceSig(s, dir, "events")) {
      import s.implicits._
      val bp = new org.apache.hadoop.fs.Path(base)
      val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(bp, true)
      def slice(et: String) = t(s, dir, "events")
        .where($"event_type" === et)
        .select($"event_id", $"event_type",
          round($"value" * 1e6).cast("long").as("value_micros"))
        .coalesce(1)
      graft.sources.DeltaLogWriter.write(slice("purchase"), base)
      graft.sources.DeltaLogWriter.write(slice("click"), base)
      graft.sources.DeltaLogWriter.deleteWhere(s, base, $"event_id" % 9 === 0)
      graft.sources.DeltaLogWriter.optimize(s, base)
    }
    base
  }
  /** q251's fixture: the full Delta RETENTION lifecycle — an overwrite
    * leaves v0's file tombstoned; `checkpoint` compacts state at v1;
    * `vacuum` past the horizon physically deletes the tombstoned file;
    * `cleanLog` then prunes the pre-checkpoint commit JSON. The current
    * version must replay from checkpoint + surviving commits alone. */
  private[graft] def stageQ251DeltaVacuumed(s: SparkSession, dir: String): String = {
    val base = scratch(q251TablePat, dir)
    Tables.stageOnce(s, base, Tables.sourceSig(s, dir, "events")) {
      import s.implicits._
      import org.apache.spark.sql.SaveMode
      val bp = new org.apache.hadoop.fs.Path(base)
      val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(bp, true)
      def slice(et: String) = t(s, dir, "events")
        .where($"event_type" === et)
        .select($"event_id", $"event_type",
          round($"value" * 1e6).cast("long").as("value_micros"))
        .coalesce(1)
      graft.sources.DeltaLogWriter.write(slice("purchase"), base)
      graft.sources.DeltaLogWriter.write(slice("click"), base,
        mode = SaveMode.Overwrite)
      graft.sources.DeltaLogWriter.checkpoint(s, base)
      graft.sources.DeltaLogWriter.vacuum(s, base, olderThanMs = Long.MaxValue)
      graft.sources.DeltaLogWriter.cleanLog(s, base)
    }
    base
  }
  /** q252's fixture: STREAMING CDC upsert into Iceberg — the Flink-
    * style ingest loop: a base append, then an ordered file stream
    * (`maxFilesPerTrigger=1`, mtimes pinned so batch order is a fact,
    * not a race) whose `foreachBatch` commits one `IcebergWriter.upsert`
    * snapshot per micro-batch with batch-derived ids/timestamps. Batch 0
    * corrects the %3 keys at 2×, batch 1 the %6 keys at 3× — the final
    * table must hold three stacked sequence tiers committed by the
    * MICRO-BATCH engine, replayed declaratively by the oracle. */
  private[graft] def stageQ252IcebergCdc(s: SparkSession, dir: String): String = {
    val base = scratch(q252TablePat, dir)
    Tables.stageOnce(s, base, Tables.sourceSig(s, dir, "events")) {
      import s.implicits._
      val bp = new org.apache.hadoop.fs.Path(base)
      val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(bp, true)
      val p = t(s, dir, "events").where($"event_type" === "purchase")
        .select($"event_id", $"event_type",
          round($"value" * 1e6).cast("long").as("value_micros"))
      graft.sources.IcebergWriter.commitAppend(s, base, p.coalesce(1), 6601L, 1000L)

      // ordered two-file CDC source: one parquet per micro-batch, mtimes
      // pinned (FileStreamSource orders by modification time)
      val srcDir = new org.apache.hadoop.fs.Path(bp, ".cdc_src")
      val chkDir = new org.apache.hadoop.fs.Path(bp, ".cdc_chk")
      def stageBatch(df: DataFrame, name: String, mtime: Long): Unit = {
        val tmp = new org.apache.hadoop.fs.Path(bp, s".tmp_$name")
        df.coalesce(1).write.parquet(tmp.toString)
        val part = fs.listStatus(tmp)
          .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
          .head.getPath
        fs.mkdirs(srcDir)
        val dst = new org.apache.hadoop.fs.Path(srcDir, s"$name.parquet")
        require(fs.rename(part, dst), s"staging rename to $dst failed")
        fs.delete(tmp, true)
        fs.setTimes(dst, mtime, -1)
      }
      stageBatch(p.where($"event_id" % 3 === 0)
        .withColumn("value_micros", $"value_micros" * 2), "b0", 1000L)
      stageBatch(p.where($"event_id" % 6 === 0)
        .withColumn("value_micros", $"value_micros" * 3), "b1", 2000L)

      val schema = s.read.parquet(srcDir.toString).schema
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir.toString)
        .writeStream
        .foreachBatch { (b: DataFrame, id: Long) =>
          graft.sources.IcebergWriter.upsert(s, base,
            b.select($"event_id", $"event_type", $"value_micros").coalesce(1),
            Seq("event_id"), 6602L + id, 2000L + id * 1000L)
          ()
        }
        .option("checkpointLocation", chkDir.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      if (!q.awaitTermination(StreamScaffold.AwaitTimeoutMs)) {
        q.stop()
        sys.error("q252 CDC stream did not terminate in time")
      }
      // one upsert snapshot per source file, in mtime order — a rate
      // limit that merged the batches would break the oracle's tiers
      val snaps = graft.sources.Iceberg.snapshots(s, base).map(_._1)
      require(snaps == Seq(6601L, 6602L, 6603L),
        s"q252 expected one upsert snapshot per micro-batch, got $snaps")
    }
    base
  }
  /** q271's fixture: STREAMING CDC upsert into DELTA — the q252 twin
    * on the Delta log, completing the 4-cell CDC matrix (q252 INTO
    * Iceberg, q263 OUT of Delta, q266 OUT of Iceberg, this INTO
    * Delta): a base write, then the same ordered two-file stream
    * (`maxFilesPerTrigger=1`, pinned mtimes) whose `foreachBatch`
    * commits one `DeltaLogWriter.upsert` (DV kill + append) per
    * micro-batch. Batch 0 corrects the %3 keys at 2×, batch 1 the %6
    * keys at 3× — three stacked DV tiers committed by the micro-batch
    * engine. */
  private[graft] def stageQ271DeltaCdcIn(s: SparkSession, dir: String): String = {
    val base = scratch(q271TablePat, dir)
    Tables.stageOnce(s, base, Tables.sourceSig(s, dir, "events")) {
      import s.implicits._
      val bp = new org.apache.hadoop.fs.Path(base)
      val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(bp, true)
      val p = t(s, dir, "events").where($"event_type" === "purchase")
        .select($"event_id", $"event_type",
          round($"value" * 1e6).cast("long").as("value_micros"))
      graft.sources.DeltaLogWriter.write(p.coalesce(1), base)          // v0
      val srcDir = new org.apache.hadoop.fs.Path(bp, ".cdc_src")
      val chkDir = new org.apache.hadoop.fs.Path(bp, ".cdc_chk")
      def stageBatch(df: DataFrame, name: String, mtime: Long): Unit = {
        val tmp = new org.apache.hadoop.fs.Path(bp, s".tmp_$name")
        df.coalesce(1).write.parquet(tmp.toString)
        val part = fs.listStatus(tmp)
          .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
          .head.getPath
        fs.mkdirs(srcDir)
        val dst = new org.apache.hadoop.fs.Path(srcDir, s"$name.parquet")
        require(fs.rename(part, dst), s"staging rename to $dst failed")
        fs.delete(tmp, true)
        fs.setTimes(dst, mtime, -1)
      }
      stageBatch(p.where($"event_id" % 3 === 0)
        .withColumn("value_micros", $"value_micros" * 2), "b0", 1000L)
      stageBatch(p.where($"event_id" % 6 === 0)
        .withColumn("value_micros", $"value_micros" * 3), "b1", 2000L)
      val schema = s.read.parquet(srcDir.toString).schema
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir.toString)
        .writeStream
        .foreachBatch { (b: DataFrame, _: Long) =>
          graft.sources.DeltaLogWriter.upsert(s, base,
            b.select($"event_id", $"event_type", $"value_micros").coalesce(1),
            Seq("event_id"))
          ()
        }
        .option("checkpointLocation", chkDir.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      if (!q.awaitTermination(StreamScaffold.AwaitTimeoutMs)) {
        q.stop()
        sys.error("q271 CDC stream did not terminate in time")
      }
      // one upsert commit per source file, in mtime order
      val vs = graft.sources.DeltaLogReader.versions(s, base)
      require(vs == Seq(0L, 1L, 2L),
        s"q271 expected one upsert commit per micro-batch, got $vs")
    }
    base
  }
  /** q272's fixture: a hand-assembled Iceberg FORMAT-VERSION 3 table —
    * one purchase-slice data file (event_id order pinned by a sort +
    * coalesce(1)) plus a REAL puffin file holding a `deletion-vector-v1`
    * blob that kills every `event_id % 4 == 0` row BY POSITION (the
    * positions read back from the staged file's own
    * `_metadata.row_index`, so the fixture states facts about the file
    * it actually wrote). The v3 spec's DV framing is byte-identical to
    * Delta's sidecars — one codec serves both formats. */
  private[graft] def stageQ272IcebergV3Dv(s: SparkSession, dir: String): String = {
    val base = scratch(q272TablePat, dir)
    Tables.stageOnce(s, base, Tables.sourceSig(s, dir, "events")) {
      import s.implicits._
      val bp = new org.apache.hadoop.fs.Path(base)
      val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(bp, true)
      val p = t(s, dir, "events").where($"event_type" === "purchase")
        .select($"event_id", $"event_type",
          round($"value" * 1e6).cast("long").as("value_micros"))
        .orderBy($"event_id")
      val f1 = stageSingleFile(fs, bp, p, "f1.parquet", bp)
      val kills = s.read.parquet(f1)
        .select(col("_metadata.row_index").as("pos"), $"event_id")
        .where($"event_id" % 4 === 0)
        .select($"pos").collect().map(_.getLong(0)).sorted
      val nRows = s.read.parquet(f1).count()
      val I = graft.sources.Iceberg
      val (puffin, spans) = I.writePuffin(s, base, "dv1.puffin",
        Seq((I.dvBlob(kills), f1)), snapshotId = 9102L, sequenceNumber = 2L)
      val (m1, l1) = I.writeManifest(s, base, "m1.avro", 9101L,
        Seq(I.Entry(f1, status = 1, sequenceNumber = Some(1L),
          recordCount = nRows)))
      val (m2, l2) = I.writeManifest(s, base, "m2.avro", 9102L,
        Seq(I.Entry(puffin, status = 1, content = 1, format = "PUFFIN",
          sequenceNumber = Some(2L), recordCount = kills.length.toLong,
          referencedDataFile = Some(f1),
          contentOffset = Some(spans.head._1),
          contentSizeInBytes = Some(spans.head._2))))
      val ml = I.writeManifestList(s, base, "snap9102.avro", 9102L,
        Seq((m1, l1), (m2, l2)), contents = Seq(0, 1),
        sequenceNumbers = Seq(1L, 2L), addedSnapshotIds = Seq(9101L, 9102L))
      I.writeMetadata(s, base, 1, Seq((9102L, 2000L, ml)),
        formatVersion = 3, lastColumnId = 3, schemaFieldsJson =
          """[{"id":1,"name":"event_id","required":false,"type":"long"},""" +
          """{"id":2,"name":"event_type","required":false,"type":"string"},""" +
          """{"id":3,"name":"value_micros","required":false,"type":"long"}]""")
    }
    base
  }
  /** Catalog name + registry shared by q267/q273 — one catalog instance
    * per (session, sf dir): instances cache by NAME, so the name hashes
    * the dir and the registry path is its one fixed document. */
  private[graft] def sqlCatalog(s: SparkSession, dir: String)
      : (String, graft.sources.FileRegistryCatalog) = {
    val reg = scratch(q267RegPat, dir)
    val cat = "graft_" + Integer.toHexString(dir.hashCode).takeRight(8)
    s.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.registry", reg)
    (cat, new graft.sources.FileRegistryCatalog(s, reg))
  }
  /** q273's fixture: SQL `INSERT INTO` through the catalog — a Delta
    * table (purchases) and an Iceberg table (clicks), then two
    * CROSS-FORMAT insert-selects driven entirely by SQL text: even-id
    * clicks into the Delta table, then `%7` rows of the (now-grown)
    * Delta table at 3× into the Iceberg table. The query side
    * substitutes through the read rule while the TARGET stays a V2
    * relation the V1Write fallback appends through — both directions
    * exercised in one staging. */
  private[graft] def stageQ273SqlInsert(s: SparkSession, dir: String): String = {
    val base = scratch(q273TablePat, dir)
    Tables.stageOnce(s, base, Tables.sourceSig(s, dir, "events")) {
      import s.implicits._
      val bp = new org.apache.hadoop.fs.Path(base)
      val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(bp, true)
      def slice(et: String) = t(s, dir, "events").where($"event_type" === et)
        .select($"event_id", $"event_type",
          round($"value" * 1e6).cast("long").as("value_micros")).coalesce(1)
      graft.sources.DeltaLogWriter.write(slice("purchase"), s"$base/d")
      graft.sources.IcebergWriter.commitAppend(s, s"$base/i",
        slice("click"), 9201L, 1000L)
      val (cat, rc) = sqlCatalog(s, dir)
      rc.register("graft.sqlins_delta", s"$base/d")
      rc.register("graft.sqlins_ice", s"$base/i")
      s.sql(s"INSERT INTO $cat.graft.sqlins_delta " +
        s"SELECT event_id, event_type, value_micros " +
        s"FROM $cat.graft.sqlins_ice WHERE event_id % 2 = 0")
      s.sql(s"INSERT INTO $cat.graft.sqlins_ice " +
        s"SELECT event_id, event_type, value_micros * 3 " +
        s"FROM $cat.graft.sqlins_delta WHERE event_id % 7 = 0")
    }
    base
  }
  /** q281's fixture: the reference's own maintenance statement —
    * `OPTIMIZE tbl ZORDER BY (cols)` (`01_geofraud_clustering.py:440`)
    * — run as SQL TEXT by table name on BOTH formats through the
    * injected parser: the Delta side takes the Morton-clustered
    * bin-pack rewrite (two numeric columns → true z-interleave,
    * `ZOrderClustering`), the Iceberg side the clustered compaction
    * (`compact(sortBy=...)` — the q254 machinery, whose 1-of-N
    * pruned-read law q254 pins). Multi-file writes first so the
    * rewrite actually re-bins. */
  private[graft] def stageQ281SqlOptimize(s: SparkSession, dir: String): String = {
    val base = scratch(q281TablePat, dir)
    Tables.stageOnce(s, base, Tables.sourceSig(s, dir, "events")) {
      import s.implicits._
      val bp = new org.apache.hadoop.fs.Path(base)
      val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(bp, true)
      def slice(et: String) = t(s, dir, "events").where($"event_type" === et)
        .select($"event_id", $"user_id",
          round($"value" * 1e6).cast("long").as("value_micros"))
        .repartition(4)
      graft.sources.DeltaLogWriter.write(slice("purchase"), s"$base/d")
      graft.sources.IcebergWriter.commitAppend(s, s"$base/i",
        slice("click"), 9501L, 1000L)
      val (cat, rc) = sqlCatalog(s, dir)
      rc.register("graft.zopt_delta", s"$base/d")
      rc.register("graft.zopt_ice", s"$base/i")
      s.sql(s"OPTIMIZE $cat.graft.zopt_delta ZORDER BY (user_id, value_micros)")
      s.sql(s"OPTIMIZE $cat.graft.zopt_ice ZORDER BY (user_id, value_micros)")
    }
    base
  }
  /** q286's fixture: `OPTIMIZE tbl WHERE <partition = v> ZORDER BY
    * (cols)` — Delta's partition-scoped maintenance statement, run as
    * SQL TEXT on BOTH formats: the Delta side rewrites only the named
    * hive partition's files (`DeltaLogWriter.optimize(partitionFilter)`),
    * the Iceberg side only the named identity partition
    * (`IcebergWriter.compactScoped` — untouched files re-emitted
    * EXISTING with original attribution). Both tables are
    * event_type-partitioned with TWO files per partition, so the scoped
    * rewrite provably re-bins its partition to one file while the other
    * partition keeps its two. */
  private[graft] def stageQ286SqlOptimizeWhere(s: SparkSession, dir: String): String = {
    val base = scratch(q286TablePat, dir)
    Tables.stageOnce(s, base, Tables.sourceSig(s, dir, "events")) {
      import s.implicits._
      val bp = new org.apache.hadoop.fs.Path(base)
      val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(bp, true)
      def slice(even: Boolean) = t(s, dir, "events")
        .where($"event_type".isin("purchase", "click") &&
          ($"event_id" % 2 === (if (even) 0 else 1)))
        .select($"event_id", $"user_id",
          round($"value" * 1e6).cast("long").as("value_micros"),
          $"event_type").coalesce(1)
      // two appends → two files per partition value on each format
      graft.sources.DeltaLogWriter.write(slice(even = true), s"$base/d",
        partitionBy = Seq("event_type"))
      graft.sources.DeltaLogWriter.write(slice(even = false), s"$base/d",
        partitionBy = Seq("event_type"))
      graft.sources.IcebergWriter.commitAppend(s, s"$base/i",
        slice(even = true), 9601L, 1000L, partitionBy = Seq("event_type"))
      graft.sources.IcebergWriter.commitAppend(s, s"$base/i",
        slice(even = false), 9602L, 2000L)
      val (cat, rc) = sqlCatalog(s, dir)
      rc.register("graft.zw_delta", s"$base/d")
      rc.register("graft.zw_ice", s"$base/i")
      s.sql(s"OPTIMIZE $cat.graft.zw_delta WHERE event_type = 'purchase' " +
        "ZORDER BY (user_id, value_micros)")
      s.sql(s"OPTIMIZE $cat.graft.zw_ice WHERE event_type = 'click' " +
        "ZORDER BY (user_id, value_micros)")
    }
    base
  }
  /** q274's fixture: SQL `DELETE FROM ... WHERE` through the catalog —
    * a Delta table (purchases) and an Iceberg table (clicks), each
    * row-level-deleted by SQL TEXT alone with filter-translatable
    * predicates: the Delta delete commits DELETION VECTORS, the Iceberg
    * delete a POSITION-DELETE snapshot (SupportsDelete → the format
    * writers' own deleteWhere). Value thresholds, not id modulos —
    * Spark only plans this path when the WHERE translates entirely to
    * source filters. */
  private[graft] def stageQ274SqlDelete(s: SparkSession, dir: String): String = {
    val base = scratch(q274TablePat, dir)
    Tables.stageOnce(s, base, Tables.sourceSig(s, dir, "events")) {
      import s.implicits._
      val bp = new org.apache.hadoop.fs.Path(base)
      val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(bp, true)
      def slice(et: String) = t(s, dir, "events").where($"event_type" === et)
        .select($"event_id", $"event_type",
          round($"value" * 1e6).cast("long").as("value_micros")).coalesce(1)
      graft.sources.DeltaLogWriter.write(slice("purchase"), s"$base/d")
      graft.sources.IcebergWriter.commitAppend(s, s"$base/i",
        slice("click"), 9301L, 1000L)
      val (cat, rc) = sqlCatalog(s, dir)
      rc.register("graft.sqldel_delta", s"$base/d")
      rc.register("graft.sqldel_ice", s"$base/i")
      s.sql(s"DELETE FROM $cat.graft.sqldel_delta WHERE value_micros < 250000000")
      s.sql(s"DELETE FROM $cat.graft.sqldel_ice WHERE value_micros >= 500000000")
    }
    base
  }
  /** q275's fixture: the FULL SQL LIFECYCLE by SQL text alone — the
    * reference's own DDL pattern (`configure_notebook.py:18-27`
    * CREATEs its production table before anything queries it): CREATE
    * a partitioned Delta table, INSERT INTO it from a registered
    * source, DELETE a stratum, CREATE an Iceberg table (zero
    * snapshots) and INSERT a filtered projection of the Delta table
    * into it. Every statement is spark.sql; every commit lands through
    * the format writers. */
  private[graft] def stageQ275SqlLifecycle(s: SparkSession, dir: String): String = {
    val base = scratch(q275TablePat, dir)
    Tables.stageOnce(s, base, Tables.sourceSig(s, dir, "events")) {
      import s.implicits._
      val bp = new org.apache.hadoop.fs.Path(base)
      val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(bp, true)
      val src = t(s, dir, "events")
        .where($"event_type".isin("purchase", "click"))
        .select($"event_id", $"event_type",
          round($"value" * 1e6).cast("long").as("value_micros")).coalesce(1)
      graft.sources.DeltaLogWriter.write(src, s"$base/src")
      val (cat, rc) = sqlCatalog(s, dir)
      rc.register("graft.lifecycle_src", s"$base/src")
      s.sql(s"CREATE TABLE $cat.graft.lifecycle_d " +
        s"(event_id BIGINT, event_type STRING, value_micros BIGINT) " +
        s"USING delta PARTITIONED BY (event_type) LOCATION '$base/d'")
      s.sql(s"INSERT INTO $cat.graft.lifecycle_d " +
        s"SELECT event_id, event_type, value_micros FROM $cat.graft.lifecycle_src")
      s.sql(s"DELETE FROM $cat.graft.lifecycle_d " +
        s"WHERE event_type = 'click' AND value_micros < 300000000")
      s.sql(s"CREATE TABLE $cat.graft.lifecycle_i " +
        s"(event_id BIGINT, value_micros BIGINT) " +
        s"USING iceberg LOCATION '$base/i'")
      s.sql(s"INSERT INTO $cat.graft.lifecycle_i " +
        s"SELECT event_id, value_micros FROM $cat.graft.lifecycle_d " +
        s"WHERE event_type = 'purchase' AND value_micros >= 500000000")
    }
    base
  }
  /** q276's fixture: SQL UPDATE + MERGE INTO by SQL TEXT alone over a
    * Delta table (purchases) AND an Iceberg table (clicks) — the last
    * DML a metastore user types, and the reference's own production
    * loop (`02_geofraud_fraud.py:283-304` keyed upsert maintenance).
    * Four sequential statements, each ONE merge-on-read commit through
    * the format writers: (1) Delta UPDATE doubles small purchases (DV
    * kill + re-append); (2) Delta MERGE upserts a union of 3×'d `%4`
    * purchases (matched arm) and `%6` clicks (insert arm); (3) Iceberg
    * UPDATE bumps `%3` clicks by 7 (position-delete + data manifest,
    * one snapshot); (4) Iceberg MERGE upserts 5×'d `%8` clicks
    * (matched) plus the Delta table's `%10` purchases (insert). MERGE
    * sources read the CURRENT state of the named tables, so statement
    * order is part of the oracle's declarative replay. */
  private[graft] def stageQ276SqlDml(s: SparkSession, dir: String): String = {
    val base = scratch(q276TablePat, dir)
    Tables.stageOnce(s, base, Tables.sourceSig(s, dir, "events")) {
      import s.implicits._
      val bp = new org.apache.hadoop.fs.Path(base)
      val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(bp, true)
      def slice(et: String) = t(s, dir, "events").where($"event_type" === et)
        .select($"event_id", $"event_type",
          round($"value" * 1e6).cast("long").as("value_micros")).coalesce(1)
      graft.sources.DeltaLogWriter.write(slice("purchase"), s"$base/d")
      graft.sources.IcebergWriter.commitAppend(s, s"$base/i",
        slice("click"), 9401L, 1000L)
      val (cat, rc) = sqlCatalog(s, dir)
      rc.register("graft.dml_delta", s"$base/d")
      rc.register("graft.dml_ice", s"$base/i")
      s.sql(s"UPDATE $cat.graft.dml_delta SET value_micros = value_micros * 2 " +
        "WHERE value_micros < 250000000")
      s.sql(
        s"""MERGE INTO $cat.graft.dml_delta t
           |USING (
           |  SELECT event_id, event_type, value_micros * 3 AS value_micros
           |  FROM $cat.graft.dml_delta WHERE event_id % 4 = 0
           |  UNION ALL
           |  SELECT event_id, event_type, value_micros
           |  FROM $cat.graft.dml_ice WHERE event_id % 6 = 0
           |) s
           |ON t.event_id = s.event_id
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      s.sql(s"UPDATE $cat.graft.dml_ice SET value_micros = value_micros + 7 " +
        "WHERE event_id % 3 = 0")
      s.sql(
        s"""MERGE INTO $cat.graft.dml_ice t
           |USING (
           |  SELECT event_id, event_type, value_micros * 5 AS value_micros
           |  FROM $cat.graft.dml_ice WHERE event_id % 8 = 0
           |  UNION ALL
           |  SELECT event_id, event_type, value_micros
           |  FROM $cat.graft.dml_delta
           |  WHERE event_type = 'purchase' AND event_id % 10 = 0
           |) s
           |ON t.event_id = s.event_id
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    base
  }
  /** q277's fixture: SQL SCHEMA EVOLUTION + INSERT OVERWRITE by SQL
    * text alone — the ALTER surface a metastore user types. Delta leg:
    * ADD COLUMN (old generation null-fills under the declared-schema
    * scan), an INSERT INTO carrying values for the new column, the
    * SET TBLPROPERTIES column-mapping upgrade, then RENAME COLUMN —
    * every old file served under the new logical name with zero data
    * rewritten. Iceberg leg: ADD COLUMN (fresh field id), INSERT
    * OVERWRITE (a REPLACE snapshot recomputing the table from itself),
    * then RENAME COLUMN (id-keyed swap). */
  private[graft] def stageQ277SqlEvolve(s: SparkSession, dir: String): String = {
    val base = scratch(q277TablePat, dir)
    Tables.stageOnce(s, base, Tables.sourceSig(s, dir, "events")) {
      import s.implicits._
      val bp = new org.apache.hadoop.fs.Path(base)
      val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(bp, true)
      def slice(et: String) = t(s, dir, "events").where($"event_type" === et)
        .select($"event_id", $"event_type",
          round($"value" * 1e6).cast("long").as("value_micros")).coalesce(1)
      graft.sources.DeltaLogWriter.write(slice("purchase"), s"$base/d")
      graft.sources.IcebergWriter.commitAppend(s, s"$base/i",
        slice("click"), 9501L, 1000L)
      val (cat, rc) = sqlCatalog(s, dir)
      rc.register("graft.evolve_delta", s"$base/d")
      rc.register("graft.evolve_ice", s"$base/i")
      // Delta: add → insert (values for the new column) → map → rename
      s.sql(s"ALTER TABLE $cat.graft.evolve_delta ADD COLUMN value_cents BIGINT")
      s.sql(s"INSERT INTO $cat.graft.evolve_delta " +
        s"SELECT event_id + 1000000, event_type, value_micros, " +
        s"value_micros DIV 1000 FROM $cat.graft.evolve_delta " +
        "WHERE event_id % 5 = 0")
      s.sql(s"ALTER TABLE $cat.graft.evolve_delta SET TBLPROPERTIES " +
        "('delta.columnMapping.mode' = 'name')")
      s.sql(s"ALTER TABLE $cat.graft.evolve_delta RENAME COLUMN value_micros TO vm")
      // Iceberg: add → overwrite (REPLACE snapshot from its own read) → rename
      s.sql(s"ALTER TABLE $cat.graft.evolve_ice ADD COLUMN bonus BIGINT")
      s.sql(s"INSERT OVERWRITE $cat.graft.evolve_ice " +
        s"SELECT event_id, event_type, value_micros, value_micros % 1000 " +
        s"FROM $cat.graft.evolve_ice WHERE value_micros >= 100000000")
      s.sql(s"ALTER TABLE $cat.graft.evolve_ice RENAME COLUMN value_micros TO vm")
    }
    base
  }
  /** q278's fixture: the ICEBERG side of the by-name streaming read —
    * two append snapshots (clicks, then errors) so a drain spans a
    * multi-snapshot history. The Delta side reuses q270's staged
    * append-only table (same events strata, same blind-append law). */
  private[graft] def stageQ278StreamTable(s: SparkSession, dir: String): String = {
    val base = scratch(q278TablePat, dir)
    Tables.stageOnce(s, base, Tables.sourceSig(s, dir, "events")) {
      import s.implicits._
      val bp = new org.apache.hadoop.fs.Path(base)
      val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(bp, true)
      def slice(et: String) = t(s, dir, "events").where($"event_type" === et)
        .select($"event_id", $"event_type",
          round($"value" * 1e6).cast("long").as("value_micros")).coalesce(1)
      graft.sources.IcebergWriter.commitAppend(s, s"$base/i",
        slice("click"), 9601L, 1000L)
      graft.sources.IcebergWriter.commitAppend(s, s"$base/i",
        slice("error"), 9602L, 2000L)
    }
    base
  }
  /** q279's fixture: the format-version-3 WRITE lifecycle — createTableV3
    * (lineage clock at 0) → two row-id-stamped appends (purchases at
    * [0, p), clicks at [p, p+c)) → two DELETION-VECTOR deletes (cheap
    * clicks, then the `%4` ids — the second UNIONS the click file's DV
    * under the one-DV-per-file supersede rule). Closes the r14 "readable
    * but not maintainable" v3 gap: every artifact this stages is decoded
    * back through the q272 read path. */
  private[graft] def stageQ279IcebergV3Write(s: SparkSession, dir: String): String = {
    val base = scratch(q279TablePat, dir)
    Tables.stageOnce(s, base, Tables.sourceSig(s, dir, "events")) {
      import s.implicits._
      val bp = new org.apache.hadoop.fs.Path(base)
      val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(bp, true)
      def slice(et: String) = t(s, dir, "events").where($"event_type" === et)
        .select($"event_id", $"event_type",
          round($"value" * 1e6).cast("long").as("value_micros")).coalesce(1)
      val W = graft.sources.IcebergWriter
      W.createTableV3(s, base, slice("purchase").schema)
      W.commitAppendV3(s, base, slice("purchase"), 9701L, 1000L)
      W.commitAppendV3(s, base, slice("click"), 9702L, 2000L)
      W.deleteWhereV3(s, base,
        col("event_type") === "click" && col("value_micros") < 300000000L,
        9703L, 3000L)
      W.deleteWhereV3(s, base, col("event_id") % 4 === 0L, 9704L, 4000L)
    }
    base
  }
  /** q253's fixture: the Delta MoR UPSERT lifecycle — write the
    * purchase slice, then two stacked `DeltaLogWriter.upsert` commits
    * keyed on event_id (2× then 3× corrections), each one deletion-
    * vector kill + append commit. The q247 Iceberg twin on the Delta
    * log: same oracle tiers, entirely different MoR machinery
    * (roaring-bitmap sidecars vs equality-delete sequences). */
  private[graft] def stageQ253DeltaUpserted(s: SparkSession, dir: String): String = {
    val base = scratch(q253TablePat, dir)
    Tables.stageOnce(s, base, Tables.sourceSig(s, dir, "events")) {
      import s.implicits._
      val bp = new org.apache.hadoop.fs.Path(base)
      val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(bp, true)
      val p = t(s, dir, "events").where($"event_type" === "purchase")
        .select($"event_id", $"event_type",
          round($"value" * 1e6).cast("long").as("value_micros"))
      graft.sources.DeltaLogWriter.write(p.coalesce(1), base)
      graft.sources.DeltaLogWriter.upsert(s, base,
        p.where($"event_id" % 3 === 0)
          .withColumn("value_micros", $"value_micros" * 2).coalesce(1),
        Seq("event_id"))
      graft.sources.DeltaLogWriter.upsert(s, base,
        p.where($"event_id" % 6 === 0)
          .withColumn("value_micros", $"value_micros" * 3).coalesce(1),
        Seq("event_id"))
    }
    base
  }
  /** q254's fixture: CLUSTERING maintenance — an append in natural
    * (user-interleaved) order, then `compact(sortBy = user_id,
    * numFiles = 8)`: the range-partitioned, in-partition-sorted rewrite
    * whose footer-derived bounds become tight and DISJOINT on the sort
    * key, so a point query plans exactly one file. */
  private[graft] def stageQ254IcebergClustered(s: SparkSession, dir: String): String = {
    val base = scratch(q254TablePat, dir)
    Tables.stageOnce(s, base, Tables.sourceSig(s, dir, "events")) {
      import s.implicits._
      val bp = new org.apache.hadoop.fs.Path(base)
      val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(bp, true)
      val ev = t(s, dir, "events")
        .select($"event_id", $"user_id",
          round($"value" * 1e6).cast("long").as("value_micros"))
        .coalesce(1)
      graft.sources.IcebergWriter.commitAppend(s, base, ev, 6701L, 1000L)
      graft.sources.IcebergWriter.compact(s, base, 6702L, 2000L,
        sortBy = Seq("user_id"), numFiles = Some(8))
    }
    base
  }
  /** q255's fixture: an identity-PARTITIONED Iceberg table the repo's
    * own writer created and appended to — `commitAppend(partitionBy =
    * event_type)` in two commits (event_id parity slices), each writing
    * one file per partition VALUE with the value in the entry's
    * partition struct and per-field min/max summaries on the
    * manifest-list row. The read side's q232/q241 pruning machinery
    * then runs against metadata this repo WROTE. */
  private[graft] def stageQ255IcebergPartitioned(s: SparkSession, dir: String): String = {
    val base = scratch(q255TablePat, dir)
    Tables.stageOnce(s, base, Tables.sourceSig(s, dir, "events")) {
      import s.implicits._
      val bp = new org.apache.hadoop.fs.Path(base)
      val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(bp, true)
      def slice(m: Int) = t(s, dir, "events").where($"event_id" % 2 === m)
        .select($"event_id", $"event_type",
          round($"value" * 1e6).cast("long").as("value_micros"))
      graft.sources.IcebergWriter.commitAppend(s, base, slice(0), 6801L, 1000L,
        partitionBy = Seq("event_type"))
      graft.sources.IcebergWriter.commitAppend(s, base, slice(1), 6802L, 2000L)
    }
    base
  }
  /** q259's fixture: a HIDDEN-partitioned Iceberg table — the spec
    * `day(ets), bucket(4, user_id)` — written in ONE commit by the
    * repo's own writer: one file per distinct (day, bucket) tuple,
    * partition values derived in the TRANSFORMED domain by the same
    * [[graft.sources.IcebergTransforms]] functions the reader's pruning
    * maps predicate ranges through, transformed-domain min/max
    * summaries on the manifest-list row. Single commit keeps the
    * b_files law exact: any live (day, bucket) tuple is exactly ONE
    * file. */
  private[graft] def stageQ259IcebergHiddenPart(s: SparkSession, dir: String): String = {
    val base = scratch(q259TablePat, dir)
    Tables.stageOnce(s, base, Tables.sourceSig(s, dir, "events")) {
      import s.implicits._
      val bp = new org.apache.hadoop.fs.Path(base)
      val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(bp, true)
      val df = t(s, dir, "events").select($"event_id",
        timestamp_micros(expr("ts DIV 1000")).as("ets"),
        $"user_id", $"event_type",
        round($"value" * 1e6).cast("long").as("value_micros"))
      graft.sources.IcebergWriter.commitAppend(s, base, df, 6951L, 1000L,
        partitionBy = Seq("day(ets)", "bucket(4, user_id)"))
    }
    base
  }
  /** q261's fixture: MANIFEST REWRITE — three appends (purchase /
    * click / error slices ⇒ three data manifests), then
    * `rewriteManifests` merges them into ONE manifest whose entries
    * stay EXISTING under their original snapshot ids and sequence
    * numbers. Scan planning afterwards opens one manifest instead of
    * three — the metadata twin of file compaction, and what bounds a
    * thousand-append table's planning walk at 100 TB. */
  private[graft] def stageQ261IcebergRewritten(s: SparkSession, dir: String): String = {
    val base = scratch(q261TablePat, dir)
    Tables.stageOnce(s, base, Tables.sourceSig(s, dir, "events")) {
      import s.implicits._
      val bp = new org.apache.hadoop.fs.Path(base)
      val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(bp, true)
      def slice(et: String) = t(s, dir, "events").where($"event_type" === et)
        .select($"event_id", $"event_type",
          round($"value" * 1e6).cast("long").as("value_micros")).coalesce(1)
      graft.sources.IcebergWriter.commitAppend(s, base, slice("purchase"), 7001L, 1000L)
      graft.sources.IcebergWriter.commitAppend(s, base, slice("click"), 7002L, 2000L)
      graft.sources.IcebergWriter.commitAppend(s, base, slice("error"), 7003L, 3000L)
      graft.sources.IcebergWriter.rewriteManifests(s, base, 7004L, 4000L)
    }
    base
  }
  /** q265's fixture: the Iceberg CHANGELOG's five commit shapes on one
    * table — append purchases (8101), append clicks (8102, the cheap
    * attribution path), MoR upsert doubling-plus-one every
    * `event_id % 3 == 0` purchase (8103: equality delete + append —
    * the exact-diff path; vm*2+1 so every upserted row provably
    * CHANGES), compact (8104: a rewrite that must net ZERO change
    * rows), then a position delete of `event_id % 5 == 0` (8105). */
  private[graft] def stageQ265IcebergChangelog(s: SparkSession, dir: String): String = {
    val base = scratch(q265TablePat, dir)
    Tables.stageOnce(s, base, Tables.sourceSig(s, dir, "events")) {
      import s.implicits._
      val bp = new org.apache.hadoop.fs.Path(base)
      val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(bp, true)
      def slice(et: String) = t(s, dir, "events").where($"event_type" === et)
        .select($"event_id", $"event_type",
          round($"value" * 1e6).cast("long").as("value_micros")).coalesce(1)
      val W = graft.sources.IcebergWriter
      W.commitAppend(s, base, slice("purchase"), 8101L, 1000L)
      W.commitAppend(s, base, slice("click"), 8102L, 2000L)
      W.upsert(s, base, slice("purchase").where($"event_id" % 3 === 0)
        .withColumn("value_micros", $"value_micros" * 2 + 1),
        Seq("event_id"), 8103L, 3000L)
      W.compact(s, base, 8104L, 4000L, numFiles = Some(2))
      W.deleteWhere(s, base, $"event_id" % 5 === 0, 8105L, 5000L)
    }
    base
  }
  /** q264's fixture: Delta COLUMN-MAPPING WRITE lifecycle — write
    * purchases (v0, plain logical-named parquet), `enableColumnMapping`
    * (v1: every column gains mapping id + physicalName = its current
    * name, protocol steps to (2,5) — a pure metadata upgrade), RENAME
    * value_micros→amount_micros (v2: logical name only; zero data
    * moved), then append the clicks under the NEW logical schema (v3 —
    * the writer projects them to PHYSICAL names, so both file
    * generations resolve). The Delta twin of q256's Iceberg field-id
    * evolution. */
  private[graft] def stageQ264DeltaMapped(s: SparkSession, dir: String): String = {
    val base = scratch(q264TablePat, dir)
    Tables.stageOnce(s, base, Tables.sourceSig(s, dir, "events")) {
      import s.implicits._
      val bp = new org.apache.hadoop.fs.Path(base)
      val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(bp, true)
      def slice(et: String, vmName: String) = t(s, dir, "events")
        .where($"event_type" === et)
        .select($"event_id", $"event_type",
          round($"value" * 1e6).cast("long").as(vmName))
      graft.sources.DeltaLogWriter.write(
        slice("purchase", "value_micros").coalesce(1), base)           // v0
      graft.sources.DeltaLogWriter.enableColumnMapping(s, base)        // v1
      graft.sources.DeltaLogWriter.renameColumn(s, base,
        "value_micros", "amount_micros")                               // v2
      graft.sources.DeltaLogWriter.write(
        slice("click", "amount_micros").coalesce(1), base)             // v3
    }
    base
  }
  /** q260's fixture: Delta CHANGE DATA FEED on the repo's own table —
    * write purchases (v0), flip `delta.enableChangeDataFeed` on (v1, a
    * metaData configuration commit), MERGE a batch that doubles every
    * `event_id % 3 == 0` purchase and inserts the clicks (v2 — the
    * upsert publishes `_change_data/` files classifying
    * update_preimage / update_postimage / insert), then delete
    * `event_id % 5 == 0` (v3 — a DV commit whose change file carries
    * the delete rows). The feed replays all four commit shapes. */
  private[graft] def stageQ260DeltaCdf(s: SparkSession, dir: String): String = {
    val base = scratch(q260TablePat, dir)
    Tables.stageOnce(s, base, Tables.sourceSig(s, dir, "events")) {
      import s.implicits._
      val bp = new org.apache.hadoop.fs.Path(base)
      val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(bp, true)
      def slice(et: String) = t(s, dir, "events").where($"event_type" === et)
        .select($"event_id", $"event_type",
          round($"value" * 1e6).cast("long").as("value_micros"))
      graft.sources.DeltaLogWriter.write(slice("purchase").coalesce(1), base) // v0
      graft.sources.DeltaLogWriter.setTableProperties(s, base,
        Map("delta.enableChangeDataFeed" -> "true"))                          // v1
      val batch = slice("purchase").where($"event_id" % 3 === 0)
        .withColumn("value_micros", $"value_micros" * 2)
        .unionByName(slice("click"))
      graft.sources.DeltaLogWriter.upsert(s, base, batch, Seq("event_id"))    // v2
      graft.sources.DeltaLogWriter.deleteWhere(s, base, $"event_id" % 5 === 0) // v3
    }
    base
  }
  /** q268's fixture: PARTITIONED Delta DML — the full tier over a
    * `partitionBy(event_type)` table (the reference's production-table
    * shape, `01_geofraud_clustering.py:431`): create with purchases +
    * clicks (v0), upsert with PARTITION-SOURCED keys (v1 — the kill
    * scan prunes to the batch's partitions, exactly), upsert keyed on
    * event_id alone MOVING `%5` purchases into a NEW `view` partition
    * at 3× (v2 — the moved-key shape: the old row dies in its old
    * partition because the scan stays whole-table when keys don't
    * cover the partition columns), a partition-predicate DV delete
    * (v3), and a within-partition OPTIMIZE re-bin (v4 — dataChange=
    * false, DVs purged, hive layout intact). */
  private[graft] def stageQ268DeltaPartDml(s: SparkSession, dir: String): String = {
    val base = scratch(q268TablePat, dir)
    Tables.stageOnce(s, base, Tables.sourceSig(s, dir, "events")) {
      import s.implicits._
      val bp = new org.apache.hadoop.fs.Path(base)
      val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(bp, true)
      def slice(et: String) = t(s, dir, "events").where($"event_type" === et)
        .select($"event_id", $"event_type",
          round($"value" * 1e6).cast("long").as("value_micros"))
      val W = graft.sources.DeltaLogWriter
      W.write(slice("purchase").unionByName(slice("click")), base,
        partitionBy = Seq("event_type"))                                 // v0
      W.upsert(s, base, slice("purchase").where($"event_id" % 3 === 0)
        .withColumn("value_micros", $"value_micros" * 2).coalesce(1),
        Seq("event_id", "event_type"))                                   // v1
      W.upsert(s, base, slice("purchase").where($"event_id" % 5 === 0)
        .withColumn("event_type", lit("view"))
        .withColumn("value_micros", $"value_micros" * 3).coalesce(1),
        Seq("event_id"))                                                 // v2
      W.deleteWhere(s, base,
        $"event_type" === "click" && $"event_id" % 7 === 0)              // v3
      W.optimize(s, base, numFiles = Some(1))                            // v4
    }
    base
  }
  /** q269's fixture: COLUMN-MAPPED Delta DML — DML over the q264
    * lifecycle's table shape: write purchases (v0), enable name-mode
    * mapping (v1), rename value_micros→amount_micros (v2), then UPSERT
    * ON THE RENAMED SCHEMA (v3 — keys resolve through physicalName;
    * the appended parquet carries physical names) and a DV delete
    * through the mapped scan (v4). The writes q264 proved are now
    * mutable in place — the asymmetry the round-13 verdict flagged. */
  private[graft] def stageQ269DeltaMapDml(s: SparkSession, dir: String): String = {
    val base = scratch(q269TablePat, dir)
    Tables.stageOnce(s, base, Tables.sourceSig(s, dir, "events")) {
      import s.implicits._
      val bp = new org.apache.hadoop.fs.Path(base)
      val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(bp, true)
      def slice(et: String, vmName: String) = t(s, dir, "events")
        .where($"event_type" === et)
        .select($"event_id", $"event_type",
          round($"value" * 1e6).cast("long").as(vmName))
      val W = graft.sources.DeltaLogWriter
      W.write(slice("purchase", "value_micros").coalesce(1), base)       // v0
      W.enableColumnMapping(s, base)                                     // v1
      W.renameColumn(s, base, "value_micros", "amount_micros")           // v2
      val batch = slice("purchase", "amount_micros")
        .where($"event_id" % 3 === 0)
        .withColumn("amount_micros", $"amount_micros" * 2 + 1)
        .unionByName(slice("click", "amount_micros"))
      W.upsert(s, base, batch.coalesce(1), Seq("event_id"))              // v3
      W.deleteWhere(s, base, $"event_id" % 5 === 0)                      // v4
    }
    base
  }
  /** q270's fixture: a PLAIN (no Change Data Feed) Delta table whose
    * commit history is the add-file stream's three shapes — two blind
    * appends (v0 purchases, v1 clicks), a `dataChange=false` OPTIMIZE
    * the stream must advance past WITHOUT serving (v2), and a third
    * append (v3). */
  private[graft] def stageQ270DeltaStream(s: SparkSession, dir: String): String = {
    val base = scratch(q270TablePat, dir)
    Tables.stageOnce(s, base, Tables.sourceSig(s, dir, "events")) {
      import s.implicits._
      val bp = new org.apache.hadoop.fs.Path(base)
      val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(bp, true)
      def slice(et: String) = t(s, dir, "events").where($"event_type" === et)
        .select($"event_id", $"event_type",
          round($"value" * 1e6).cast("long").as("value_micros")).coalesce(1)
      val W = graft.sources.DeltaLogWriter
      W.write(slice("purchase"), base)                                   // v0
      W.write(slice("click"), base)                                      // v1
      W.optimize(s, base, numFiles = Some(1))                            // v2
      W.write(slice("error"), base)                                      // v3
    }
    base
  }
  /** q256's fixture: SCHEMA EVOLUTION on the repo's own table — append
    * purchases, RENAME value_micros→amount_micros (pure metadata swap;
    * old files serve the new name by field id), ADD bonus_micros (a
    * fresh id past the high-water mark), then append clicks carrying
    * the full evolved schema. The read must stitch both file
    * generations: renamed values from pre-evolution files, nulls for
    * their bonus, real bonuses from the post-evolution commit. */
  private[graft] def stageQ256IcebergEvolved(s: SparkSession, dir: String): String = {
    val base = scratch(q256TablePat, dir)
    Tables.stageOnce(s, base, Tables.sourceSig(s, dir, "events")) {
      import s.implicits._
      val bp = new org.apache.hadoop.fs.Path(base)
      val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(bp, true)
      def slice(et: String) = t(s, dir, "events")
        .where($"event_type" === et)
        .select($"event_id", $"event_type",
          round($"value" * 1e6).cast("long").as("value_micros"))
      graft.sources.IcebergWriter.commitAppend(s, base,
        slice("purchase").coalesce(1), 6901L, 1000L)
      graft.sources.IcebergWriter.renameColumn(s, base,
        "value_micros", "amount_micros")
      graft.sources.IcebergWriter.addColumn(s, base, "bonus_micros", "long")
      graft.sources.IcebergWriter.commitAppend(s, base,
        slice("click")
          .withColumnRenamed("value_micros", "amount_micros")
          .withColumn("bonus_micros", $"amount_micros" % 1000)
          .coalesce(1), 6902L, 2000L)
    }
    base
  }
  /** q257's fixture: Delta RESTORE — write purchases (v0), append the
    * error slice (v1), then `restore(toVersion = 0)` as commit v2: one
    * remove per file v0 lacked, no data moved, history intact. */
  private[graft] def stageQ257DeltaRestored(s: SparkSession, dir: String): String = {
    val base = scratch(q257TablePat, dir)
    Tables.stageOnce(s, base, Tables.sourceSig(s, dir, "events")) {
      import s.implicits._
      val bp = new org.apache.hadoop.fs.Path(base)
      val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(bp, true)
      def slice(et: String) = t(s, dir, "events")
        .where($"event_type" === et)
        .select($"event_id", $"event_type",
          round($"value" * 1e6).cast("long").as("value_micros"))
        .coalesce(1)
      graft.sources.DeltaLogWriter.write(slice("purchase"), base)
      graft.sources.DeltaLogWriter.write(slice("error"), base)
      graft.sources.DeltaLogWriter.restore(s, base, toVersion = 0L)
    }
    base
  }
  /** q258's fixture: Iceberg ROLLBACK — two appends, then
    * `rollbackTo(first)` committed as a NEW snapshot reusing the
    * target's manifest list: current serves the old state, the
    * rolled-over snapshot stays readable, history stays linear. */
  private[graft] def stageQ258IcebergRolledBack(s: SparkSession, dir: String): String = {
    val base = scratch(q258TablePat, dir)
    Tables.stageOnce(s, base, Tables.sourceSig(s, dir, "events")) {
      import s.implicits._
      val bp = new org.apache.hadoop.fs.Path(base)
      val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(bp, true)
      def slice(et: String) = t(s, dir, "events")
        .where($"event_type" === et)
        .select($"event_id", $"event_type",
          round($"value" * 1e6).cast("long").as("value_micros"))
        .coalesce(1)
      graft.sources.IcebergWriter.commitAppend(s, base, slice("purchase"), 7001L, 1000L)
      graft.sources.IcebergWriter.commitAppend(s, base, slice("click"), 7002L, 2000L)
      graft.sources.IcebergWriter.rollbackTo(s, base, 7001L, 7003L, 3000L)
    }
    base
  }
  /** q236's fixture: an Iceberg v2 MERGE-ON-READ table — data files plus
    * a committed POSITION delete file, the layout every real v2 table
    * with row-level DML has. Purchases split by event_id parity into two
    * SORTED single files (sort order fixes the row positions the deletes
    * address); snapshot 3001 is data-only, 3002 adds a delete manifest
    * whose parquet names (f1, pos) for every f1 row with
    * event_id % 3 = 0 — i.e. exactly the event_id % 6 = 0 purchases,
    * which is what the DuckDB oracle re-derives declaratively. f2 keeps
    * value-identical rows to pin per-file scoping. */
  private[graft] def stageQ236IcebergMorTable(s: SparkSession, dir: String): String = {
    val base = scratch(q236TablePat, dir)
    Tables.stageOnce(s, base, Tables.sourceSig(s, dir, "events")) {
      import s.implicits._
      import graft.sources.Iceberg
      val bp = new org.apache.hadoop.fs.Path(base)
      val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(bp, true)
      val dataDir = new org.apache.hadoop.fs.Path(bp, "data")
      fs.mkdirs(dataDir)
      val p = t(s, dir, "events").where($"event_type" === "purchase")
        .select($"event_id", round($"value" * 1e6).cast("long").as("value_micros"))
      def sortedFile(df: DataFrame, name: String): String =
        stageSingleFile(fs, bp,
          df.repartition(1).sortWithinPartitions("event_id"), name, dataDir)
      val f1 = sortedFile(p.where($"event_id" % 2 === 0), "f1.parquet")
      val f2 = sortedFile(p.where($"event_id" % 2 =!= 0), "f2.parquet")
      // position coordinates: the files are event_id-sorted, so pos =
      // 0-based rank by event_id within the slice (single-partition
      // window — staging-only, on the small purchase slice)
      import org.apache.spark.sql.expressions.Window
      val delRows = p.where($"event_id" % 2 === 0)
        .withColumn("pos",
          row_number().over(Window.orderBy($"event_id")).cast("long") - 1L)
        .where($"event_id" % 3 === 0)
        .select(lit(f1).as("file_path"), $"pos")
      val pd = stageSingleFile(fs, bp, delRows, "pd.parquet", dataDir)
      val m = Iceberg.writeManifest(s, base, "m_data.avro", 3001L,
        Seq(Iceberg.Entry(f1, 1), Iceberg.Entry(f2, 1)))
      val dm = Iceberg.writeManifest(s, base, "m_del.avro", 3002L,
        Seq(Iceberg.Entry(pd, 1, content = 1)))
      val ml1 = Iceberg.writeManifestList(s, base, "snap-3001.avro", 3001L, Seq(m))
      val ml2 = Iceberg.writeManifestList(s, base, "snap-3002.avro", 3002L,
        Seq(m, dm), contents = Seq(0, 1))
      Iceberg.writeMetadata(s, base, version = 2,
        Seq((3001L, 1000L, ml1), (3002L, 2000L, ml2)), formatVersion = 2)
    }
    base
  }
  /** q237's fixture: an Iceberg v2 table with a committed EQUALITY
    * delete and real SEQUENCE-NUMBER gating. Clicks split by parity —
    * f1 (even ids) at data sequence 1, f2 (odd ids) at sequence 3; the
    * equality delete at sequence 2 lists EVERY click id with
    * event_id % 5 = 0, both parities. Correct v2 semantics delete only
    * the STRICTLY-OLDER even rows (net: event_id % 10 = 0 gone); the odd
    * % 5 rows postdate the delete and must survive — a reader ignoring
    * sequence numbers kills them too, one ignoring the delete serves
    * everything. Field-id-stamped parquet, metadata schema, list-row
    * sequence numbers inherited by the entries. */
  private[graft] def stageQ237IcebergEqDelTable(s: SparkSession, dir: String): String = {
    val base = scratch(q237TablePat, dir)
    Tables.stageOnce(s, base, Tables.sourceSig(s, dir, "events")) {
      import s.implicits._
      import graft.sources.Iceberg
      import org.apache.spark.sql.types._
      val bp = new org.apache.hadoop.fs.Path(base)
      val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(bp, true)
      val dataDir = new org.apache.hadoop.fs.Path(bp, "data")
      fs.mkdirs(dataDir)
      def idMeta(id: Long) =
        new MetadataBuilder().putLong("parquet.field.id", id).build()
      s.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
      val st = StructType(Seq(
        StructField("event_id", LongType, nullable = true, idMeta(1)),
        StructField("value_micros", LongType, nullable = true, idMeta(2))))
      val c = s.createDataFrame(
        t(s, dir, "events").where($"event_type" === "click")
          .select($"event_id", round($"value" * 1e6).cast("long").as("value_micros")).rdd, st)
      def writeF(df: DataFrame, name: String): String =
        stageSingleFile(fs, bp, df, name, dataDir)
      val f1 = writeF(c.where($"event_id" % 2 === 0), "f1.parquet")
      val f2 = writeF(c.where($"event_id" % 2 =!= 0), "f2.parquet")
      // the equality delete column must carry the schema name (and id —
      // same conf) so the reader's by-name select resolves it
      val edDf = s.createDataFrame(
        c.where($"event_id" % 5 === 0).select($"event_id").rdd,
        StructType(Seq(StructField("event_id", LongType, nullable = true, idMeta(1)))))
      val ed = writeF(edDf, "ed.parquet")
      val m1 = Iceberg.writeManifest(s, base, "m1.avro", 4001L, Seq(Iceberg.Entry(f1, 1)))
      val m2 = Iceberg.writeManifest(s, base, "m2.avro", 4001L, Seq(Iceberg.Entry(f2, 1)))
      val dm = Iceberg.writeManifest(s, base, "dm.avro", 4001L,
        Seq(Iceberg.Entry(ed, 1, content = 2, equalityIds = Seq(1))))
      val ml = Iceberg.writeManifestList(s, base, "snap-4001.avro", 4001L,
        Seq(m1, m2, dm), contents = Seq(0, 0, 1), sequenceNumbers = Seq(1L, 3L, 2L))
      Iceberg.writeMetadata(s, base, version = 1, Seq((4001L, 1000L, ml)),
        formatVersion = 2,
        schemaFieldsJson = "[" + Iceberg.fieldJson(1, "event_id", "long") + "," +
          Iceberg.fieldJson(2, "value_micros", "long") + "]")
    }
    base
  }
  /** q238's fixture: a COLUMN-MAPPED Delta table (mode `name`) — the
    * layout every ALTER TABLE RENAME COLUMN on modern Delta produces:
    * parquet footers hold physical `col-<tag>` names, the logical
    * schema + per-field `delta.columnMapping.physicalName`/`id` live in
    * the metaData's schemaString. Two physical files of signup events;
    * the logical order CROSSES the physical one (value_micros first), so
    * a footer-order reader or one serving physical names breaks the
    * checksums or the column set. */
  private[graft] def stageQ238DeltaMappedTable(s: SparkSession, dir: String): String = {
    val base = scratch(q238TablePat, dir)
    Tables.stageOnce(s, base, Tables.sourceSig(s, dir, "events")) {
      import s.implicits._
      import org.apache.spark.sql.types._
      val bp = new org.apache.hadoop.fs.Path(base)
      val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(bp, true)
      val su = t(s, dir, "events").where($"event_type" === "signup")
        .select($"event_id".as("col-eid"),
          round($"value" * 1e6).cast("long").as("col-vm"))
      def writeF(df: DataFrame, name: String): String =
        stageSingleFile(fs, bp, df, name, bp)
      val f1 = writeF(su.where($"col-eid" % 2 === 0), "f1.parquet")
      val f2 = writeF(su.where($"col-eid" % 2 =!= 0), "f2.parquet")
      val schemaString = StructType(Seq(
        StructField("value_micros", LongType, nullable = true,
          new MetadataBuilder()
            .putString("delta.columnMapping.physicalName", "col-vm")
            .putLong("delta.columnMapping.id", 2L).build()),
        StructField("event_id", LongType, nullable = true,
          new MetadataBuilder()
            .putString("delta.columnMapping.physicalName", "col-eid")
            .putLong("delta.columnMapping.id", 1L).build()))).json
      val esc = new com.fasterxml.jackson.databind.ObjectMapper()
        .writeValueAsString(schemaString)
      def addLine(p: String) =
        s"""{"add":{"path":"${new org.apache.hadoop.fs.Path(p).getName}","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}"""
      val log = new org.apache.hadoop.fs.Path(bp, "_delta_log")
      fs.mkdirs(log)
      val out = fs.create(new org.apache.hadoop.fs.Path(log, f"${0L}%020d.json"), true)
      try out.write((Seq(
        """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
        s"""{"metaData":{"id":"q238","format":{"provider":"parquet","options":{}},"schemaString":$esc,"partitionColumns":[],"configuration":{"delta.columnMapping.mode":"name"},"createdTime":0}}""",
        addLine(f1), addLine(f2)).mkString("", "\n", "\n"))
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
    base
  }
  /** q239's fixture: a REAL Delta table whose latest state attaches
    * DELETION VECTORS to both data files — f1 (even purchase ids,
    * event_id-sorted) via a sidecar 'u'-storage DV (z85-packed uuid
    * filename, [size|bitmap|crc32] framing, roaring-portable payload),
    * f2 (odd ids) via an 'i' INLINE descriptor (z85-padded bitmap in the
    * log line itself). Commit 0 adds both files whole; commits 1-2
    * RE-ADD each file with its DV — the protocol's
    * attach-without-rewrite spelling, so the reader's last-add-wins
    * entry replacement is exactly what's under test. Deleted rows:
    * event_id % 3 = 0 within each file (evens' multiples of 6 + odd
    * multiples of 3 = every purchase multiple of 3). */
  private[graft] def stageQ239DeltaDvTable(s: SparkSession, dir: String): String = {
    val base = scratch(q239TablePat, dir)
    Tables.stageOnce(s, base, Tables.sourceSig(s, dir, "events")) {
      import s.implicits._
      import graft.sources.DeletionVectors
      val bp = new org.apache.hadoop.fs.Path(base)
      val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(bp, true)
      fs.mkdirs(bp)
      val p = t(s, dir, "events").where($"event_type" === "purchase")
        .select($"event_id", round($"value" * 1e6).cast("long").as("value_micros"))
      def slice(even: Boolean): DataFrame =
        if (even) p.where($"event_id" % 2 === 0) else p.where($"event_id" % 2 =!= 0)
      def sortedFile(df: DataFrame, name: String): String =
        stageSingleFile(fs, bp,
          df.repartition(1).sortWithinPartitions("event_id"), name, bp)
      val f1 = sortedFile(slice(even = true), "f1.parquet")
      val f2 = sortedFile(slice(even = false), "f2.parquet")
      import org.apache.spark.sql.expressions.Window
      // file-local 0-based positions of the % 3 rows (the files are
      // event_id-sorted, so pos = rank by event_id within the slice;
      // staging-only single-partition window + collect on the small
      // purchase slice — the bitmap bytes are driver-written by nature)
      def delPositions(even: Boolean): Array[Long] =
        slice(even)
          .withColumn("pos",
            row_number().over(Window.orderBy($"event_id")).cast("long") - 1L)
          .where($"event_id" % 3 === 0)
          .select($"pos").as[Long].collect().sorted
      val pos1 = delPositions(even = true)
      val pos2 = delPositions(even = false)
      val bm1 = DeletionVectors.serialize(pos1)
      val bm2 = DeletionVectors.serialize(pos2)
      val uuid = java.util.UUID.nameUUIDFromBytes(
        "q239-f1".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val off1 = DeletionVectors.writeDvFile(fs,
        new org.apache.hadoop.fs.Path(bp, s"deletion_vector_$uuid.bin"),
        Seq(bm1)).head
      val dv1 = DeletionVectors.uDescriptorJson(uuid, off1, bm1.length, pos1.length.toLong)
      val dv2 =
        s"""{"storageType":"i","pathOrInlineDv":"${DeletionVectors.z85EncodePad(bm2)}",""" +
          s""""sizeInBytes":${bm2.length},"cardinality":${pos2.length}}"""
      val schemaString = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("value_micros",
          org.apache.spark.sql.types.LongType))).json
      val esc = new com.fasterxml.jackson.databind.ObjectMapper()
        .writeValueAsString(schemaString)
      def name(pth: String) = new org.apache.hadoop.fs.Path(pth).getName
      def addBare(pth: String) =
        s"""{"add":{"path":"${name(pth)}","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}"""
      def addDv(pth: String, dv: String) =
        s"""{"add":{"path":"${name(pth)}","partitionValues":{},"size":1,"modificationTime":0,"dataChange":false,"deletionVector":$dv}}"""
      val log = new org.apache.hadoop.fs.Path(bp, "_delta_log")
      fs.mkdirs(log)
      def commit(v: Long, lines: Seq[String]): Unit = {
        val out = fs.create(new org.apache.hadoop.fs.Path(log, f"$v%020d.json"), true)
        try out.write(lines.mkString("", "\n", "\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
      }
      commit(0L, Seq(
        """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}""",
        s"""{"metaData":{"id":"q239","format":{"provider":"parquet","options":{}},"schemaString":$esc,"partitionColumns":[],"configuration":{},"createdTime":0}}""",
        addBare(f1), addBare(f2)))
      commit(1L, Seq(addDv(f1, dv1)))
      commit(2L, Seq(addDv(f2, dv2)))
    }
    base
  }
  /** q240's fixture: a Delta table the repo's own writer creates from
    * the click slice (4 hash parts), then DELETEs twice via
    * [[graft.sources.DeltaLogWriter.deleteWhere]] — the deletion-vector
    * fast path: no parquet rewritten, each touched file gains a sidecar
    * bitmap, the second delete UNIONING into the first's. The read-back
    * goes through the reader's merge-on-read. */
  private[graft] def stageQ240DeltaDeleteTable(s: SparkSession, dir: String): String = {
    val base = scratch(q240TablePat, dir)
    Tables.stageOnce(s, base, Tables.sourceSig(s, dir, "events")) {
      import s.implicits._
      val bp = new org.apache.hadoop.fs.Path(base)
      val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(bp, true)
      val clicks = t(s, dir, "events").where($"event_type" === "click")
        .select($"event_id", round($"value" * 1e6).cast("long").as("value_micros"))
        .repartition(4, $"event_id")
      graft.sources.DeltaLogWriter.write(clicks, base,
        org.apache.spark.sql.SaveMode.Overwrite)
      graft.sources.DeltaLogWriter.deleteWhere(s, base, col("event_id") % 7 === 0)
      graft.sources.DeltaLogWriter.deleteWhere(s, base, col("event_id") % 11 === 0)
    }
    base
  }
  /** Write-once staging for the interop tier — called from
    * [[IndexQueries.stageIndexLegs]] (the single Bench warm entry point)
    * so timed runs measure query semantics, not one-off table builds. */
  private[graft] def stageInteropLegs(s: SparkSession, dir: String): Unit = {
    stageQ228IcebergTable(s, dir)
    stageQ232IcebergTable(s, dir)
    stageQ241IcebergHiddenPart(s, dir)
    stageQ243IcebergWritten(s, dir)
    stageQ244DeltaAsOf(s, dir)
    stageQ245IcebergDeleted(s, dir)
    stageQ246IcebergCompacted(s, dir)
    stageQ247IcebergUpserted(s, dir)
    stageQ248IcebergExpired(s, dir)
    stageQ249IcebergMeta(s, dir)
    stageQ250DeltaOptimized(s, dir)
    stageQ251DeltaVacuumed(s, dir)
    stageQ252IcebergCdc(s, dir)
    stageQ253DeltaUpserted(s, dir)
    stageQ254IcebergClustered(s, dir)
    stageQ255IcebergPartitioned(s, dir)
    stageQ256IcebergEvolved(s, dir)
    stageQ257DeltaRestored(s, dir)
    stageQ258IcebergRolledBack(s, dir)
    stageQ259IcebergHiddenPart(s, dir)
    stageQ260DeltaCdf(s, dir)
    stageQ261IcebergRewritten(s, dir)
    stageQ264DeltaMapped(s, dir)
    stageQ265IcebergChangelog(s, dir)
    stageQ268DeltaPartDml(s, dir)
    stageQ269DeltaMapDml(s, dir)
    stageQ270DeltaStream(s, dir)
    stageQ271DeltaCdcIn(s, dir)
    stageQ272IcebergV3Dv(s, dir)
    stageQ273SqlInsert(s, dir)
    stageQ274SqlDelete(s, dir)
    stageQ275SqlLifecycle(s, dir)
    stageQ276SqlDml(s, dir)
    stageQ277SqlEvolve(s, dir)
    stageQ278StreamTable(s, dir)
    stageQ279IcebergV3Write(s, dir)
    stageQ281SqlOptimize(s, dir)
    stageQ286SqlOptimizeWhere(s, dir)
    stageQ236IcebergMorTable(s, dir)
    stageQ237IcebergEqDelTable(s, dir)
    stageQ238DeltaMappedTable(s, dir)
    stageQ239DeltaDvTable(s, dir)
    stageQ240DeltaDeleteTable(s, dir)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // STORAGE-FORMAT INTEROP #2: read a table someone else wrote with
    // Apache Iceberg — metadata.json → manifest-list Avro → manifest
    // entries, with ADDED/EXISTING live and DELETED dead. The current
    // snapshot's manifest list spans TWO manifests (m2 carrying a DELETED
    // f1 + EXISTING f2 + ADDED f3, m3 adding f4), so a reader that skips
    // carried manifests loses f2/f3, one that ignores entry status serves
    // f1's deleted rows — either breaks the checksums. Slices are
    // declarative over `events`: the oracle recomputes them directly.
    "q228_iceberg_read" -> ((s, dir) => {
      import s.implicits._
      stageQ228IcebergTable(s, dir)
      graft.sources.Iceberg.read(s, scratch(q228TablePat, dir))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), sum($"event_id").as("id_checksum"),
          sum($"value_micros").as("value_checksum"))
        .orderBy($"event_type")
    }),

    // Iceberg TIME TRAVEL: pin every snapshot id from the metadata's own
    // snapshot log and prove the reader reconstructs each historical
    // active set — 1001 pre-delete (f1 must be BACK), 1002 exercises
    // DELETED-resolution, 1003 is current. A reader that always serves
    // the current snapshot breaks 1001's row set.
    "q229_iceberg_time_travel" -> ((s, dir) => {
      import s.implicits._
      stageQ228IcebergTable(s, dir)
      val base = scratch(q228TablePat, dir)
      graft.sources.Iceberg.snapshots(s, base).map { case (id, _) =>
        graft.sources.Iceberg.readSnapshot(s, base, id)
          .agg(count(lit(1)).as("n_rows"), sum($"event_id").as("id_checksum"))
          .select(lit(id).as("snapshot_id"), $"n_rows", $"id_checksum")
      }.reduce(_ unionAll _).orderBy($"snapshot_id")
    }),

    // Iceberg MANIFEST-LEVEL PRUNING — the r11 task-1 reserved slot: a
    // partitioned table (one manifest per event_type, manifest-list
    // partition summaries, exact per-file event_id/value_micros bounds)
    // where a type+value point-ish query plans exactly ONE of the 10
    // files — partition summaries drop four manifests UNOPENED, the
    // value bound drops the purchase_hi file — all BEFORE the
    // ManifestGuard cap (Round12QueriesSpec pins the planned-file
    // counts). The DuckDB oracle scans ALL events rows with the same
    // predicate (the q158 pattern): any over-pruning breaks the
    // checksums; the residual filter re-applied after the pruned read
    // keeps the superset contract honest.
    "q232_iceberg_pruned_scan" -> ((s, dir) => {
      import s.implicits._
      import graft.sources.Iceberg
      val base = stageQ232IcebergTable(s, dir)
      val hi = 49999999L
      Iceberg.readPruned(s, base, Seq(
          Iceberg.ColRange("event_type", "purchase", "purchase"),
          Iceberg.ColRange("value_micros", 0L, hi)))
        .where($"event_type" === "purchase" && $"value_micros".between(0L, hi))
        .agg(count(lit(1)).as("n"), sum($"event_id").as("id_checksum"),
          sum($"value_micros").as("value_checksum"))
    }),

    // Iceberg time travel BY TIMESTAMP (the Delta q194 twin): the
    // snapshot-selection rule is latest timestamp-ms <= ts. ts probes
    // straddle the fixture's two commits (1000: three types; 5000: all
    // five) — at-commit, between-commits and after-last each resolve to
    // a different-or-same snapshot whose checksums the oracle replays
    // from the declarative slices.
    "q234_iceberg_as_of" -> ((s, dir) => {
      import s.implicits._
      val base = stageQ232IcebergTable(s, dir)
      Seq(1000L, 4999L, 5000L, 999999L).map { ts =>
        graft.sources.Iceberg.readAsOf(s, base, ts)
          .agg(count(lit(1)).as("n_rows"), sum($"event_id").as("id_checksum"))
          .select(lit(ts).as("as_of_ms"), $"n_rows", $"id_checksum")
      }.reduce(_ unionAll _).orderBy($"as_of_ms")
    }),

    // Iceberg v2 MERGE-ON-READ — committed POSITION deletes applied at
    // read time: the delete parquet's (file_path, pos) rows anti-join
    // the data read on Spark's _metadata row coordinates. Snapshot 3001
    // (pre-delete) must serve EVERY purchase; 3002 must drop exactly the
    // event_id % 6 = 0 rows the delete file addresses by position in the
    // sorted even-id file — a reader that ignores the delete manifest
    // serves deleted rows (breaks 3002), one that misapplies positions
    // or ignores the file scoping breaks either checksum.
    "q236_iceberg_mor_read" -> ((s, dir) => {
      import s.implicits._
      val base = stageQ236IcebergMorTable(s, dir)
      graft.sources.Iceberg.snapshots(s, base).map { case (id, _) =>
        graft.sources.Iceberg.readSnapshot(s, base, id)
          .agg(count(lit(1)).as("n_rows"), sum($"event_id").as("id_checksum"),
            sum($"value_micros").as("value_checksum"))
          .select(lit(id).as("snapshot_id"), $"n_rows", $"id_checksum",
            $"value_checksum")
      }.reduce(_ unionAll _).orderBy($"snapshot_id")
    }),

    // Iceberg v2 EQUALITY deletes with SEQUENCE-NUMBER gating: the
    // delete (seq 2) lists every click id with event_id % 5 = 0, but
    // only the even file (seq 1) predates it — the odd file (seq 3)
    // postdates the delete and its % 5 rows must survive. Net effect:
    // exactly the % 10 = 0 clicks disappear. A reader ignoring sequence
    // numbers over-deletes the odd rows; one ignoring the delete
    // manifest serves everything; one matching by position instead of
    // equality breaks the checksums.
    "q237_iceberg_equality_deletes" -> ((s, dir) => {
      import s.implicits._
      val base = stageQ237IcebergEqDelTable(s, dir)
      graft.sources.Iceberg.read(s, base)
        .agg(count(lit(1)).as("n_rows"), sum($"event_id").as("id_checksum"),
          sum($"value_micros").as("value_checksum"))
    }),

    // Delta COLUMN MAPPING (mode name) — the ALTER TABLE RENAME COLUMN
    // layout: physical col-<tag> footers served under the metaData
    // schemaString's LOGICAL names via delta.columnMapping.physicalName.
    // The logical order crosses the physical one, so footer-order or
    // physical-name reads break; the oracle replays the slices straight
    // from events under the logical names.
    "q238_delta_column_mapping" -> ((s, dir) => {
      import s.implicits._
      val base = stageQ238DeltaMappedTable(s, dir)
      graft.sources.DeltaLogReader.read(s, base)
        .agg(count(lit(1)).as("n_rows"), sum($"event_id").as("id_checksum"),
          sum($"value_micros").as("value_checksum"))
    }),

    // Delta DELETION VECTORS read — merge-on-read for Delta: the latest
    // adds attach a sidecar ('u', z85 uuid + crc framing) and an inline
    // ('i', z85-padded) roaring bitmap of deleted row positions, which
    // the reader decodes (sidecars on EXECUTORS via binaryFile) and
    // anti-joins against _metadata row coordinates. The oracle serves
    // the survivor slice straight from events — a reader that ignores
    // the DVs resurrects the % 3 rows, one that misapplies positions or
    // the last-add-wins replacement breaks the checksums.
    "q239_delta_deletion_vectors" -> ((s, dir) => {
      import s.implicits._
      val base = stageQ239DeltaDvTable(s, dir)
      graft.sources.DeltaLogReader.read(s, base)
        .agg(count(lit(1)).as("n_rows"), sum($"event_id").as("id_checksum"),
          sum($"value_micros").as("value_checksum"))
    }),

    // Delta DELETE via DELETION VECTORS — write-side round trip: the
    // repo's writer creates the table, two deleteWhere commits attach
    // (then union-replace) per-file sidecar bitmaps WITHOUT rewriting a
    // parquet part, and the reader's merge-on-read serves the
    // survivors. The oracle replays the surviving predicate straight
    // from events — a writer that drops the first delete's positions on
    // the second commit, or mis-relativizes paths, breaks the checksums.
    "q240_delta_dv_delete" -> ((s, dir) => {
      import s.implicits._
      val base = stageQ240DeltaDeleteTable(s, dir)
      graft.sources.DeltaLogReader.read(s, base)
        .agg(count(lit(1)).as("n_rows"), sum($"event_id").as("id_checksum"),
          sum($"value_micros").as("value_checksum"))
    }),

    // Iceberg INCREMENTAL APPEND read — the CDC-shaped scan: rows of
    // data files added by snapshots in (2001, 2002], attributed by the
    // entry-level snapshot_id (falling back to the manifest-list row's
    // added_snapshot_id, the spec's inheritance rule). Plans only the
    // NEW snapshot's manifests — each poll of a 100 TB table costs
    // O(new files), never a full-table replay. The oracle re-derives
    // the two event types snapshot 2002 introduced; a scan that
    // attributes by manifest order, or replays full snapshots and
    // diffs rows, breaks on the carried-forward 2001 manifests.
    "q242_iceberg_incremental_read" -> ((s, dir) => {
      import s.implicits._
      val base = stageQ232IcebergTable(s, dir)
      graft.sources.Iceberg.readIncremental(s, base, 2001L, 2002L)
        .agg(count(lit(1)).as("n_rows"), sum($"event_id").as("id_checksum"),
          sum($"value_micros").as("value_checksum"))
    }),

    // Delta time travel BY TIMESTAMP — the q234 Iceberg twin on the
    // Delta log: commit timestamps come from the commit FILES'
    // modification times (pinned by the fixture; inCommitTimestamp
    // would win if present) with the history manager's monotonicity
    // adjustment, and AS-OF resolves latest commit <= ts. Probes
    // straddle the three commits: at-commit, between, after-last. The
    // oracle replays the cumulative event-type slices per probe.
    "q244_delta_timestamp_travel" -> ((s, dir) => {
      import s.implicits._
      val base = stageQ244DeltaAsOf(s, dir)
      Seq(1000L, 4999L, 5000L, 999999L).map { ts =>
        graft.sources.DeltaLogReader.readAsOfTimestamp(s, base, ts)
          .agg(count(lit(1)).as("n_rows"), sum($"event_id").as("id_checksum"))
          .select(lit(ts).as("as_of_ms"), $"n_rows", $"id_checksum")
      }.reduce(_ unionAll _).orderBy($"as_of_ms")
    }),

    // Iceberg DELETE round-trip — the repo's writer committed a v2
    // POSITION-delete snapshot over its own appended table (q240's
    // Delta-DV twin on the Iceberg log): the pre-delete snapshot must
    // serve every purchase/click row, the current one exactly the
    // survivors, through the reader's merge-on-read anti-join — all
    // against self-written metadata. The oracle replays both slices; a
    // writer that mis-addresses positions, drops the carried data
    // manifest, or a reader that ignores the delete manifest breaks a
    // leg's checksums.
    "q245_iceberg_delete_roundtrip" -> ((s, dir) => {
      import s.implicits._
      import graft.sources.Iceberg
      val base = stageQ245IcebergDeleted(s, dir)
      def leg(name: String, df: DataFrame): DataFrame =
        df.agg(count(lit(1)).as("n_rows"), sum($"event_id").as("id_checksum"),
            sum($"value_micros").as("value_checksum"))
          .select(lit(name).as("leg"), $"n_rows", $"id_checksum", $"value_checksum")
      leg("pre_delete", Iceberg.readSnapshot(s, base, 6101L))
        .unionAll(leg("post_delete", Iceberg.read(s, base)))
        .orderBy($"leg")
    }),

    // Iceberg COMPACTION round-trip — append → row-level delete →
    // `compact` (rewrite the MoR state as plain files, REPLACE snapshot)
    // → append again (legal ONLY because compaction dropped the delete
    // manifests). Pre- and post-compaction snapshots must serve
    // IDENTICAL data — the compaction law — and the final read layers
    // the new append on the rewrite. A compactor that loses MoR rows,
    // resurrects deleted ones, or breaks the replace leaves a leg's
    // checksums wrong.
    "q246_iceberg_compaction" -> ((s, dir) => {
      import s.implicits._
      import graft.sources.Iceberg
      val base = stageQ246IcebergCompacted(s, dir)
      def leg(name: String, df: DataFrame): DataFrame =
        df.agg(count(lit(1)).as("n_rows"), sum($"event_id").as("id_checksum"),
            sum($"value_micros").as("value_checksum"))
          .select(lit(name).as("leg"), $"n_rows", $"id_checksum", $"value_checksum")
      leg("a_pre_compact", Iceberg.readSnapshot(s, base, 6202L))
        .unionAll(leg("b_post_compact", Iceberg.readSnapshot(s, base, 6203L)))
        .unionAll(leg("c_final", Iceberg.read(s, base)))
        .orderBy($"leg")
    }),

    // Iceberg MoR UPSERT — two stacked equality-delete+append commits
    // keyed on event_id over v1 history. The read must hold the spec's
    // STRICT sequence rule three ways at once: original rows (sequence
    // 0) die to both deletes, upsert 1's rows (sequence 1) survive
    // their own delete but die to upsert 2's (sequence 2), and upsert
    // 2's rows survive everything. Row counts stay constant (1:1
    // replacement); only the value checksum moves — by exactly the
    // corrected multiples the oracle replays.
    "q247_iceberg_upsert" -> ((s, dir) => {
      import s.implicits._
      import graft.sources.Iceberg
      val base = stageQ247IcebergUpserted(s, dir)
      def leg(name: String, df: DataFrame): DataFrame =
        df.agg(count(lit(1)).as("n_rows"), sum($"event_id").as("id_checksum"),
            sum($"value_micros").as("value_checksum"))
          .select(lit(name).as("leg"), $"n_rows", $"id_checksum", $"value_checksum")
      leg("after_upsert1", Iceberg.readSnapshot(s, base, 6302L))
        .unionAll(leg("after_upsert2", Iceberg.read(s, base)))
        .orderBy($"leg")
    }),

    // Iceberg SNAPSHOT EXPIRATION — after a compaction superseded the
    // first two appends, `expireSnapshots` dropped them from metadata
    // and physically reclaimed their files (the spec pins the disk
    // state; the never-delete-reachable law rides the carried-manifest
    // spec test). The query pins the READ-side contract: the current
    // snapshot is byte-identical to pre-expiration, and the history leg
    // shows exactly ONE surviving snapshot — the compaction commit.
    "q248_iceberg_expire" -> ((s, dir) => {
      import s.implicits._
      import graft.sources.Iceberg
      val base = stageQ248IcebergExpired(s, dir)
      val snaps = Iceberg.snapshots(s, base)
      val history = Seq((snaps.size.toLong, snaps.map(_._1).sum,
        snaps.map(_._2).sum)).toDF("n_rows", "id_checksum", "value_checksum")
        .select(lit("history").as("leg"), $"n_rows", $"id_checksum", $"value_checksum")
      Iceberg.read(s, base)
        .agg(count(lit(1)).as("n_rows"), sum($"event_id").as("id_checksum"),
          sum($"value_micros").as("value_checksum"))
        .select(lit("current").as("leg"), $"n_rows", $"id_checksum", $"value_checksum")
        .unionAll(history)
        .orderBy($"leg")
    }),

    // Delta OPTIMIZE — the dataChange=false bin-packing rewrite over
    // the repo's own _delta_log: after two appends and a deletion-
    // vector delete, `optimize` must serve the IDENTICAL logical state
    // (a_pre = the pre-optimize version via time travel, b_post = the
    // rewrite) from ONE file with the DVs purged (c_files rides the
    // DV-blind activeFiles gate — it REFUSES unless the purge really
    // happened). An optimize that resurrects DV'd rows, loses a file,
    // or flips dataChange breaks a leg.
    "q250_delta_optimize" -> ((s, dir) => {
      import s.implicits._
      import graft.sources.{DeltaLogReader, DeltaLogWriter}
      val base = stageQ250DeltaOptimized(s, dir)
      def leg(name: String, df: DataFrame): DataFrame =
        df.agg(count(lit(1)).as("n_rows"), sum($"event_id").as("id_checksum"),
            sum($"value_micros").as("value_checksum"))
          .select(lit(name).as("leg"), $"n_rows", $"id_checksum", $"value_checksum")
      val files = DeltaLogReader.activeFiles(s, base) // refuses if DVs remain
      val filesLeg = Seq((files.size.toLong, 0L, 0L))
        .toDF("n_rows", "id_checksum", "value_checksum")
        .select(lit("c_files").as("leg"), $"n_rows", $"id_checksum", $"value_checksum")
      leg("a_pre", DeltaLogReader.read(s, base, asOf = Some(2L)))
        .unionAll(leg("b_post", DeltaLogReader.read(s, base)))
        .unionAll(filesLeg)
        .orderBy($"leg")
    }),

    // Delta RETENTION lifecycle — checkpoint → vacuum → cleanLog on
    // the repo's own log: the b_disk leg counts the parquet files left
    // under the table root (exactly the current version's one file — a
    // vacuum that missed the tombstone or ate the live file both break
    // it), the c_log leg counts the surviving commit JSONs (exactly
    // one — cleanLog pruned everything below the checkpoint), and the
    // a_current leg pins that the state still replays byte-identically
    // from checkpoint + surviving commits alone.
    "q251_delta_vacuum" -> ((s, dir) => {
      import s.implicits._
      import graft.sources.DeltaLogReader
      val base = stageQ251DeltaVacuumed(s, dir)
      val bp = new org.apache.hadoop.fs.Path(base)
      val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
      def countParquet(p: org.apache.hadoop.fs.Path): Long =
        fs.listStatus(p).map { st =>
          if (st.isDirectory)
            { if (st.getPath.getName.startsWith("_")) 0L else countParquet(st.getPath) }
          else if (st.getPath.getName.endsWith(".parquet")) 1L else 0L
        }.sum
      val diskLeg = Seq((countParquet(bp), 0L, 0L))
        .toDF("n_rows", "id_checksum", "value_checksum")
        .select(lit("b_disk").as("leg"), $"n_rows", $"id_checksum", $"value_checksum")
      val nCommits = fs.listStatus(new org.apache.hadoop.fs.Path(bp, "_delta_log"))
        .count(st => st.isFile && st.getPath.getName.endsWith(".json")).toLong
      val logLeg = Seq((nCommits, 0L, 0L))
        .toDF("n_rows", "id_checksum", "value_checksum")
        .select(lit("c_log").as("leg"), $"n_rows", $"id_checksum", $"value_checksum")
      DeltaLogReader.read(s, base)
        .agg(count(lit(1)).as("n_rows"), sum($"event_id").as("id_checksum"),
          sum($"value_micros").as("value_checksum"))
        .select(lit("a_current").as("leg"), $"n_rows", $"id_checksum", $"value_checksum")
        .unionAll(diskLeg).unionAll(logLeg)
        .orderBy($"leg")
    }),

    // STREAMING CDC UPSERT into Iceberg — the micro-batch engine drives
    // IcebergWriter.upsert through foreachBatch, one equality-delete+
    // append snapshot per ordered batch (the Flink ingest loop). The
    // legs pin the stream==batch law against q247's semantics: after
    // batch 0 the %3 keys read 2×, after batch 1 the %6 keys read 3×
    // on top — three sequence tiers committed by a STREAM, replayed
    // declaratively by the oracle; the history leg pins one snapshot
    // per micro-batch in mtime order.
    "q252_stream_iceberg_upsert" -> ((s, dir) => {
      import s.implicits._
      import graft.sources.Iceberg
      val base = stageQ252IcebergCdc(s, dir)
      def leg(name: String, df: DataFrame): DataFrame =
        df.agg(count(lit(1)).as("n_rows"), sum($"event_id").as("id_checksum"),
            sum($"value_micros").as("value_checksum"))
          .select(lit(name).as("leg"), $"n_rows", $"id_checksum", $"value_checksum")
      val snaps = Iceberg.snapshots(s, base)
      val history = Seq((snaps.size.toLong, snaps.map(_._1).sum,
        snaps.map(_._2).sum)).toDF("n_rows", "id_checksum", "value_checksum")
        .select(lit("c_history").as("leg"), $"n_rows", $"id_checksum", $"value_checksum")
      leg("a_after_b0", Iceberg.readSnapshot(s, base, 6602L))
        .unionAll(leg("b_final", Iceberg.read(s, base)))
        .unionAll(history)
        .orderBy($"leg")
    }),

    // SQL INSERT INTO through the catalog — the V1Write seam: two
    // cross-format insert-selects committed by SQL TEXT alone (clicks
    // into the Delta table, the grown Delta table's %7 rows at 3× into
    // the Iceberg table), then both tables read back by name. The
    // write targets stay V2 relations (the substitution rule rewrites
    // only the query side) and the rows land through the format
    // writers' own append paths — real commits, real snapshots.
    "q273_sql_catalog_insert" -> ((s, dir) => {
      import s.implicits._
      val base = stageQ273SqlInsert(s, dir)
      val (cat, rc) = sqlCatalog(s, dir)
      rc.register("graft.sqlins_delta", s"$base/d")
      rc.register("graft.sqlins_ice", s"$base/i")
      s.sql(
        s"""SELECT 'a_delta' AS leg, count(*) AS n_rows,
           |  sum(event_id) AS id_checksum, sum(value_micros) AS value_checksum
           |FROM $cat.graft.sqlins_delta
           |UNION ALL
           |SELECT 'b_iceberg', count(*), sum(event_id), sum(value_micros)
           |FROM $cat.graft.sqlins_ice
           |ORDER BY leg""".stripMargin)
    }),

    // The FULL SQL LIFECYCLE — CREATE (both formats, one partitioned) →
    // INSERT INTO … SELECT → DELETE FROM → SELECT, every statement SQL
    // text through the catalog: the complete surface the reference's
    // notebooks type against their metastore (configure_notebook.py's
    // DDL included). The legs pin both tables' final states against
    // the oracle's declarative replay.
    "q275_sql_catalog_lifecycle" -> ((s, dir) => {
      import s.implicits._
      val base = stageQ275SqlLifecycle(s, dir)
      val (cat, rc) = sqlCatalog(s, dir)
      rc.register("graft.lifecycle_d", s"$base/d")
      rc.register("graft.lifecycle_i", s"$base/i")
      s.sql(
        s"""SELECT 'a_delta' AS leg, count(*) AS n_rows,
           |  sum(event_id) AS id_checksum, sum(value_micros) AS value_checksum
           |FROM $cat.graft.lifecycle_d
           |UNION ALL
           |SELECT 'b_iceberg', count(*), sum(event_id), sum(value_micros)
           |FROM $cat.graft.lifecycle_i
           |ORDER BY leg""".stripMargin)
    }),

    // SQL UPDATE + MERGE INTO through the catalog — the DML rewrite in
    // CatalogTableSubstitution routes both statements to the writers'
    // single-commit machinery (Delta DV-kill+re-append / upsert;
    // Iceberg position-delete+data-manifest / equality-delete upsert).
    // Four statements over BOTH formats, cross-format MERGE sources,
    // read back by name. With q267/q273/q274/q275 the catalog now runs
    // every DML statement the reference's notebooks type.
    "q276_sql_catalog_merge_update" -> ((s, dir) => {
      import s.implicits._
      val base = stageQ276SqlDml(s, dir)
      val (cat, rc) = sqlCatalog(s, dir)
      rc.register("graft.dml_delta", s"$base/d")
      rc.register("graft.dml_ice", s"$base/i")
      s.sql(
        s"""SELECT 'a_delta' AS leg, count(*) AS n_rows,
           |  sum(event_id) AS id_checksum, sum(value_micros) AS value_checksum
           |FROM $cat.graft.dml_delta
           |UNION ALL
           |SELECT 'b_iceberg', count(*), sum(event_id), sum(value_micros)
           |FROM $cat.graft.dml_ice
           |ORDER BY leg""".stripMargin)
    }),

    // Iceberg FORMAT-VERSION 3 WRITES — the v3 lifecycle this engine now
    // maintains (r14 item 5): row-id-stamped appends, puffin DELETION-
    // VECTOR deletes with the one-DV-per-file union/supersede rule, all
    // read back through the q272 decode path. Leg a pins the surviving
    // rows, leg b the lineage clock (next-row-id + snapshot
    // first-row-ids), leg c the live DV census (entries + cardinality).
    "q279_iceberg_v3_writes" -> ((s, dir) => {
      import s.implicits._
      val base = stageQ279IcebergV3Write(s, dir)
      val (nextRowId, frids) = graft.sources.TableStreams.icebergLineage(s, base)
      val (nDvs, dvCard) = graft.sources.TableStreams.icebergLiveDvStats(s, base)
      val rows = graft.sources.Iceberg.read(s, base)
        .agg(count(lit(1)).as("n"), sum($"event_id").as("idc"),
          sum($"value_micros").as("vmc"))
        .as[(Long, Long, Long)].collect().head
      Seq(
        ("a_rows", rows._1, rows._2, rows._3),
        ("b_lineage", nextRowId, frids(9702L),
          frids(9703L) + frids(9704L)),
        ("c_dvs", nDvs.toLong, dvCard, 0L))
        .toDF("leg", "n_rows", "id_checksum", "value_checksum")
        .orderBy($"leg")
    }),

    // `spark.readStream.table` BY NAME over both formats — the V2
    // streaming relation substitutes to a V1 Source over the format
    // readers (addsBetween / readIncremental), so the ENGINE's offset
    // log provides exactly-once with resume: one AvailableNow drain
    // delivers every stratum, a second drain over the same checkpoint
    // delivers ZERO rows (the z_* sentinels — q270's law through the
    // real structured-streaming engine instead of the drain API).
    "q278_readstream_table" -> ((s, dir) => {
      import s.implicits._
      val deltaBase = stageQ270DeltaStream(s, dir)
      val iceBase = stageQ278StreamTable(s, dir) + "/i"
      val (cat, rc) = sqlCatalog(s, dir)
      rc.register("graft.stream_delta", deltaBase)
      rc.register("graft.stream_ice", iceBase)
      val acc = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long, Long)]
      def drain(leg: String, table: String, chk: String): Long = {
        val got = new java.util.concurrent.ConcurrentLinkedQueue[
          (String, Long, Long, Long)]()
        val q = s.readStream.table(table).writeStream
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .option("checkpointLocation", chk)
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
            df.groupBy("event_type")
              .agg(count(lit(1)).as("n"), sum($"event_id").as("idc"),
                sum($"value_micros").as("vmc"))
              .collect().foreach(r =>
                got.add((leg + r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))))
            ()
          }.start()
        q.awaitTermination(180000L)
        import scala.jdk.CollectionConverters._
        val rows = got.asScala.toSeq
        rows.foreach(acc += _)
        rows.map(_._2).sum
      }
      val tmp = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft_q278_chk_${java.util.UUID.randomUUID().toString.take(8)}")
      try {
        drain("a_delta_", s"$cat.graft.stream_delta", s"$tmp/d")
        drain("b_ice_", s"$cat.graft.stream_ice", s"$tmp/i")
        // resume law: the SAME checkpoints deliver nothing on a re-run
        val again = drain("zz_", s"$cat.graft.stream_delta", s"$tmp/d") +
          drain("zz_", s"$cat.graft.stream_ice", s"$tmp/i")
        acc += (("z_second_drain", again, 0L, 0L))
      } finally {
        val p = new org.apache.hadoop.fs.Path(tmp.toString)
        p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      }
      // one row per (leg, event_type) — summed ACROSS batches so the
      // engine's batch boundaries (one catch-up batch vs per-commit)
      // never change the output
      acc.toSeq.toDF("leg", "n_rows", "id_checksum", "value_checksum")
        .groupBy($"leg")
        .agg(sum($"n_rows").as("n_rows"), sum($"id_checksum").as("id_checksum"),
          sum($"value_checksum").as("value_checksum"))
        .orderBy($"leg")
    }),

    // EXACTLY-ONCE streaming INTO Delta — the txn-action ledger: the
    // q270 source table streams by NAME into a Delta sink through the
    // V1 sink seam, every batch committing adds + {"txn":{appId,
    // version}} in ONE log entry. The z_ sentinels pin the law from
    // both directions: a RE-DRAIN over the same checkpoint delivers
    // nothing, and a FORCED REPLAY of an already-committed batch id
    // skips at the writer (the crash-between-commit-and-offset window
    // closed). Completes the streaming matrix's by-name WRITE side
    // (q278 = the read side).
    "q280_stream_sink_txn" -> ((s, dir) => {
      import s.implicits._
      val srcBase = stageQ270DeltaStream(s, dir)
      val tmp = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft_q280_${java.util.UUID.randomUUID().toString.take(8)}")
      val dst = s"$tmp/dst"; val ckpt = s"$tmp/ckpt"
      val (cat, rc) = sqlCatalog(s, dir)
      rc.register("graft.sink_src", srcBase)
      val acc = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long, Long)]
      try {
        graft.sources.DeltaLogWriter.write(
          s.emptyDataset[(Long, String, Long)]
            .toDF("event_id", "event_type", "value_micros"), dst)
        def drain(): Long = {
          val before = graft.sources.DeltaLogReader.read(s, dst).count()
          val q = s.readStream.table(s"$cat.graft.sink_src").writeStream
            .format(classOf[org.apache.spark.sql.graft.GraftTableStreamProvider].getName)
            .option("path", dst).option("format", "delta")
            .option("txnAppId", "q280")
            .option("checkpointLocation", ckpt)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination(180000L)
          graft.sources.DeltaLogReader.read(s, dst).count() - before
        }
        drain()
        val again = drain()
        // forced replay: batch 0 is committed in the ledger — a direct
        // re-submit with the same (appId, version) must SKIP
        val replay = graft.sources.DeltaLogWriter.appendStreamBatch(
          graft.sources.DeltaLogReader.read(s, dst).limit(1),
          dst, "q280", 0L)
        graft.sources.DeltaLogReader.read(s, dst)
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n"), sum($"event_id").as("idc"),
            sum($"value_micros").as("vmc"))
          .collect().foreach(r => acc +=
            (("a_" + r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))))
        acc += (("z_redrain", again, 0L, 0L))
        acc += (("z_replay", if (replay.isDefined) 1L else 0L, 0L, 0L))
      } finally {
        val p = new org.apache.hadoop.fs.Path(tmp.toString)
        p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      }
      acc.toSeq.toDF("leg", "n_rows", "id_checksum", "value_checksum")
        .orderBy($"leg")
    }),

    // SQL `OPTIMIZE tbl ZORDER BY (cols)` — the reference's literal
    // maintenance statement (01_geofraud_clustering.py:440) parsed by
    // the injected GraftSqlParser and routed to the CALL machinery on
    // both formats. Laws: content invariant under the rewrite (a/b
    // checksums replay from the source slices), the Delta side
    // bin-packed its 4-file write to ONE clustered file in ONE new
    // commit, the Iceberg side's compaction purged nothing (c_meta).
    "q281_sql_optimize_zorder" -> ((s, dir) => {
      import s.implicits._
      import graft.sources.{DeltaLogReader, Iceberg}
      val base = stageQ281SqlOptimize(s, dir)
      def leg(name: String, df: DataFrame): DataFrame =
        df.agg(count(lit(1)).as("n_rows"), sum($"event_id").as("id_checksum"),
            sum($"value_micros").as("value_checksum"))
          .select(lit(name).as("leg"), $"n_rows", $"id_checksum", $"value_checksum")
      val metaLeg = Seq((
        DeltaLogReader.versions(s, s"$base/d").max,          // write=0, OPTIMIZE=1
        DeltaLogReader.activeFiles(s, s"$base/d").size.toLong, // bin-packed to 1
        0L)).toDF("n_rows", "id_checksum", "value_checksum")
        .select(lit("c_meta").as("leg"), $"n_rows", $"id_checksum", $"value_checksum")
      leg("a_delta", DeltaLogReader.read(s, s"$base/d"))
        .unionAll(leg("b_iceberg", Iceberg.read(s, s"$base/i")))
        .unionAll(metaLeg)
        .orderBy($"leg")
    }),

    // `OPTIMIZE tbl WHERE <partition> ZORDER BY (cols)` — the
    // partition-scoped maintenance statement on BOTH formats. Laws:
    // content invariant under the scoped rewrite (a/b checksums replay
    // from the source slices), the named partition re-binned to ONE
    // file while the untouched partition keeps its TWO (c/d meta legs —
    // Delta by hive path, Iceberg by rewrite tag), Delta's statement is
    // exactly one commit past the two writes.
    "q286_sql_optimize_where" -> ((s, dir) => {
      import s.implicits._
      import graft.sources.{DeltaLogReader, Iceberg}
      val base = stageQ286SqlOptimizeWhere(s, dir)
      def leg(name: String, df: DataFrame): DataFrame =
        df.agg(count(lit(1)).as("n_rows"), sum($"event_id").as("id_checksum"),
            sum($"value_micros").as("value_checksum"))
          .select(lit(name).as("leg"), $"n_rows", $"id_checksum", $"value_checksum")
      val dFiles = DeltaLogReader.activeFiles(s, s"$base/d")
      val iFiles = Iceberg.planFiles(s, s"$base/i")
      val metaLegs = Seq(
        ("c_meta_delta",
          DeltaLogReader.versions(s, s"$base/d").max, // w0, w1, OPTIMIZE=2
          dFiles.count(_.contains("event_type=purchase")).toLong, // 1
          dFiles.count(_.contains("event_type=click")).toLong), // 2 untouched
        ("d_meta_ice",
          iFiles.size.toLong, // 2 carried + 1 rewritten
          iFiles.count(_.contains("compact")).toLong, // the scoped file
          iFiles.count(f => !f.contains("compact")).toLong)) // carried
        .toDF("leg", "n_rows", "id_checksum", "value_checksum")
      leg("a_delta", DeltaLogReader.read(s, s"$base/d"))
        .unionAll(leg("b_iceberg", Iceberg.read(s, s"$base/i")))
        .unionAll(metaLegs)
        .orderBy($"leg")
    }),

    // SQL SCHEMA EVOLUTION + INSERT OVERWRITE through the catalog —
    // ALTER TABLE ADD/RENAME COLUMN on both formats (Delta through the
    // SET TBLPROPERTIES mapping upgrade; Iceberg id-keyed), INSERT
    // OVERWRITE as a REPLACE snapshot: old-generation files served
    // under NEW names with zero data rewritten, null-filled new columns
    // distinguishable from valued ones in the checksums.
    "q277_sql_catalog_evolution" -> ((s, dir) => {
      import s.implicits._
      val base = stageQ277SqlEvolve(s, dir)
      val (cat, rc) = sqlCatalog(s, dir)
      rc.register("graft.evolve_delta", s"$base/d")
      rc.register("graft.evolve_ice", s"$base/i")
      s.sql(
        s"""SELECT 'a_delta' AS leg, count(*) AS n_rows,
           |  sum(event_id) AS id_checksum, sum(vm) AS value_checksum,
           |  count(value_cents) AS n_valued, sum(value_cents) AS cents_checksum
           |FROM $cat.graft.evolve_delta
           |UNION ALL
           |SELECT 'b_iceberg', count(*), sum(event_id), sum(vm),
           |  count(bonus), sum(bonus)
           |FROM $cat.graft.evolve_ice
           |ORDER BY leg""".stripMargin)
    }),

    // SQL DELETE FROM through the catalog — SupportsDelete: two
    // row-level deletes committed by SQL text alone (the Delta one a
    // deletion-vector commit, the Iceberg one a position-delete
    // snapshot), then both tables read back by name. With q267 (SQL
    // read + time travel), q273 (SQL insert) this completes the SQL
    // surface a reference user actually types against the metastore.
    "q274_sql_catalog_delete" -> ((s, dir) => {
      import s.implicits._
      val base = stageQ274SqlDelete(s, dir)
      val (cat, rc) = sqlCatalog(s, dir)
      rc.register("graft.sqldel_delta", s"$base/d")
      rc.register("graft.sqldel_ice", s"$base/i")
      s.sql(
        s"""SELECT 'a_delta' AS leg, count(*) AS n_rows,
           |  sum(event_id) AS id_checksum, sum(value_micros) AS value_checksum
           |FROM $cat.graft.sqldel_delta
           |UNION ALL
           |SELECT 'b_iceberg', count(*), sum(event_id), sum(value_micros)
           |FROM $cat.graft.sqldel_ice
           |ORDER BY leg""".stripMargin)
    }),

    // Iceberg FORMAT-VERSION 3 deletion vectors — a v3 table whose
    // position deletes live as a puffin `deletion-vector-v1` blob
    // (framing byte-identical to Delta's DV sidecars, per the v3 spec):
    // the read decodes the blob ON EXECUTORS, anti-joins (file,
    // position), and must serve exactly the non-%4 purchases. Closes
    // the v3 refusal the r13 verdict flagged as aging — v3 tables are
    // now readable; writes still refuse (row lineage).
    "q272_iceberg_v3_deletion_vectors" -> ((s, dir) => {
      import s.implicits._
      val base = stageQ272IcebergV3Dv(s, dir)
      graft.sources.Iceberg.read(s, base)
        .agg(count(lit(1)).as("n_rows"), sum($"event_id").as("id_checksum"),
          sum($"value_micros").as("value_checksum"))
    }),

    // STREAMING CDC UPSERT into Delta — the q252 twin on the Delta
    // log, the CDC matrix's last cell: foreachBatch drives
    // DeltaLogWriter.upsert (DV kill + append) once per ordered
    // micro-batch. after_b0 = version 1 via time travel (%3 keys at
    // 2×), final = the current read (%6 keys at 3× on top), the
    // c_versions leg pins one commit per micro-batch. Same oracle
    // tiers as q252/q253 by construction — stream==batch, and the two
    // formats' ingest loops converge on identical rows.
    "q271_stream_delta_upsert" -> ((s, dir) => {
      import s.implicits._
      import graft.sources.DeltaLogReader
      val base = stageQ271DeltaCdcIn(s, dir)
      def leg(name: String, df: DataFrame): DataFrame =
        df.agg(count(lit(1)).as("n_rows"), sum($"event_id").as("id_checksum"),
            sum($"value_micros").as("value_checksum"))
          .select(lit(name).as("leg"), $"n_rows", $"id_checksum", $"value_checksum")
      val versionsLeg = Seq((DeltaLogReader.versions(s, base).size.toLong, 0L, 0L))
        .toDF("n_rows", "id_checksum", "value_checksum")
        .select(lit("c_versions").as("leg"), $"n_rows", $"id_checksum",
          $"value_checksum")
      leg("a_after_b0", DeltaLogReader.read(s, base, asOf = Some(1L)))
        .unionAll(leg("b_final", DeltaLogReader.read(s, base)))
        .unionAll(versionsLeg)
        .orderBy($"leg")
    }),

    // Delta MoR UPSERT — q247's Iceberg tiers replayed on the Delta
    // log: two stacked DeletionVector-kill+append commits keyed on
    // event_id. after_upsert1 = version 1 via time travel (%3 keys at
    // 2×), after_upsert2 = the current read (%6 keys at 3× on top).
    // Identical oracle to q247 by construction — the two table formats'
    // MoR machineries (roaring sidecars vs equality-delete sequences)
    // must converge on the same rows.
    "q253_delta_upsert" -> ((s, dir) => {
      import s.implicits._
      import graft.sources.DeltaLogReader
      val base = stageQ253DeltaUpserted(s, dir)
      def leg(name: String, df: DataFrame): DataFrame =
        df.agg(count(lit(1)).as("n_rows"), sum($"event_id").as("id_checksum"),
            sum($"value_micros").as("value_checksum"))
          .select(lit(name).as("leg"), $"n_rows", $"id_checksum", $"value_checksum")
      leg("after_upsert1", DeltaLogReader.read(s, base, asOf = Some(1L)))
        .unionAll(leg("after_upsert2", DeltaLogReader.read(s, base)))
        .orderBy($"leg")
    }),

    // Delta RESTORE — `RESTORE TABLE ... TO VERSION 0` as one planning-
    // altitude commit: the appended error file is removed (no data
    // moved), current serves exactly v0, and the pre-restore state
    // stays time-travelable as v1. A restore that leaks the removed
    // file doubles the a_current leg; one that damages history breaks
    // b_pre_restore.
    "q257_delta_restore" -> ((s, dir) => {
      import s.implicits._
      import graft.sources.DeltaLogReader
      val base = stageQ257DeltaRestored(s, dir)
      def leg(name: String, df: DataFrame): DataFrame =
        df.agg(count(lit(1)).as("n_rows"), sum($"event_id").as("id_checksum"),
            sum($"value_micros").as("value_checksum"))
          .select(lit(name).as("leg"), $"n_rows", $"id_checksum", $"value_checksum")
      leg("a_current", DeltaLogReader.read(s, base))
        .unionAll(leg("b_pre_restore", DeltaLogReader.read(s, base, asOf = Some(1L))))
        .orderBy($"leg")
    }),

    // Iceberg ROLLBACK — rollback_to_snapshot spelled linearly: a new
    // snapshot REUSES the target's manifest list, so current serves the
    // purchase-only state while the rolled-over click snapshot stays
    // time-travelable and the snapshot list keeps all three commits
    // (the history leg) — the invariant that keeps every other writer
    // (append/upsert/expire) legal after a rollback.
    "q258_iceberg_rollback" -> ((s, dir) => {
      import s.implicits._
      import graft.sources.Iceberg
      val base = stageQ258IcebergRolledBack(s, dir)
      def leg(name: String, df: DataFrame): DataFrame =
        df.agg(count(lit(1)).as("n_rows"), sum($"event_id").as("id_checksum"),
            sum($"value_micros").as("value_checksum"))
          .select(lit(name).as("leg"), $"n_rows", $"id_checksum", $"value_checksum")
      val snaps = Iceberg.snapshots(s, base)
      val history = Seq((snaps.size.toLong, snaps.map(_._1).sum,
        snaps.map(_._2).sum)).toDF("n_rows", "id_checksum", "value_checksum")
        .select(lit("c_history").as("leg"), $"n_rows", $"id_checksum", $"value_checksum")
      leg("a_current", Iceberg.read(s, base))
        .unionAll(leg("b_rolled_over", Iceberg.readSnapshot(s, base, 7002L)))
        .unionAll(history)
        .orderBy($"leg")
    }),

    // Iceberg SCHEMA EVOLUTION — rename + add committed by the repo's
    // own metadata swaps, read back across BOTH file generations: the
    // amount checksum sums the renamed column over pre- AND post-
    // evolution files (field-id indirection — a name-resolved read
    // would lose the purchase generation), the bonus checksum sums a
    // column the first generation predates (null-filled there, real on
    // clicks). The oracle replays both slices declaratively.
    "q256_iceberg_schema_evolution" -> ((s, dir) => {
      import s.implicits._
      import graft.sources.Iceberg
      val base = stageQ256IcebergEvolved(s, dir)
      Iceberg.read(s, base)
        .agg(count(lit(1)).as("n_rows"), sum($"event_id").as("id_checksum"),
          sum($"amount_micros").as("amount_checksum"),
          sum($"bonus_micros").as("bonus_checksum"))
    }),

    // CATALOG-RESOLVED READ — table access by NAME through the catalog
    // seam instead of a path: the registry document (the REST-catalog
    // stand-in; swap-on-write, reader-complete) maps
    // graft.events_iceberg to the q261 table, and the read runs through
    // TableCatalog.readIceberg. Same aggregation as q261's a_rows, so
    // the oracle pins that name resolution changed NOTHING about the
    // rows served — the catalog is a seam, not a data path.
    "q262_catalog_read" -> ((s, dir) => {
      import s.implicits._
      import graft.sources.{FileRegistryCatalog, TableCatalog}
      val base = stageQ261IcebergRewritten(s, dir)
      val cat = new FileRegistryCatalog(s, scratch(q262RegPat, dir))
      cat.register("graft.events_iceberg", base)
      TableCatalog.readIceberg(s, cat, "graft.events_iceberg")
        .agg(count(lit(1)).as("n_rows"), sum($"event_id").as("id_checksum"),
          sum($"value_micros").as("value_checksum"))
    }),

    // SQL-REACHABLE tables — the Spark V2 CatalogPlugin: ONE SQL text
    // querying a Delta table (current AND `VERSION AS OF 1`) and an
    // Iceberg table by NAME through `graft_<dir>.graft.<tbl>`, exactly
    // the reference's consumption pattern (spark.read.table /
    // spark.sql over a metastore name). Resolution goes through the
    // registry seam; the analyzer substitution serves the repo's own
    // readers, so the legs replay q253's upsert states and q261's
    // rewritten table — name resolution changes NOTHING about rows.
    "q267_sql_catalog_read" -> ((s, dir) => {
      val delta = stageQ253DeltaUpserted(s, dir)
      val ice = stageQ261IcebergRewritten(s, dir)
      // catalog instances cache per NAME on the session — the shared
      // helper hashes the sf dir into the name so a session never
      // rebinds a name's options
      val (cat, rc) = sqlCatalog(s, dir)
      rc.register("graft.events_delta", delta)
      rc.register("graft.events_iceberg", ice)
      s.sql(
        s"""SELECT 'a_delta_current' AS leg, count(*) AS n_rows,
           |  sum(event_id) AS id_checksum, sum(value_micros) AS value_checksum
           |FROM $cat.graft.events_delta
           |UNION ALL
           |SELECT 'b_delta_v1', count(*), sum(event_id), sum(value_micros)
           |FROM $cat.graft.events_delta VERSION AS OF 1
           |UNION ALL
           |SELECT 'c_iceberg', count(*), sum(event_id), sum(value_micros)
           |FROM $cat.graft.events_iceberg
           |ORDER BY leg""".stripMargin)
    }),

    // PARTITIONED Delta DML — upsert (partition-sourced keys AND the
    // moved-key shape into a NEW partition), a partition-predicate DV
    // delete, and a within-partition OPTIMIZE, all on one
    // partitionBy(event_type) table: the a_final leg pins the whole
    // composition against the oracle's declarative replay; the b_mid
    // leg pins time travel THROUGH the optimize to the pre-delete
    // state. The reference's production table is partitioned Delta —
    // this is the DML tier it actually needs.
    "q268_delta_partitioned_dml" -> ((s, dir) => {
      import s.implicits._
      import graft.sources.DeltaLogReader
      val base = stageQ268DeltaPartDml(s, dir)
      def leg(name: String, df: DataFrame): DataFrame =
        df.agg(count(lit(1)).as("n_rows"), sum($"event_id").as("id_checksum"),
            sum($"value_micros").as("value_checksum"))
          .select(lit(name).as("leg"), $"n_rows", $"id_checksum", $"value_checksum")
      leg("a_final", DeltaLogReader.read(s, base))
        .unionAll(leg("b_mid", DeltaLogReader.read(s, base, asOf = Some(2L))))
        .orderBy($"leg")
    }),

    // COLUMN-MAPPED Delta DML — upsert and deleteWhere over the
    // enable→rename lifecycle: the upsert's keys resolve through
    // physicalName (its batch speaks the RENAMED logical schema), its
    // appended parquet carries physical names, and the DV delete's
    // predicate runs through the mapped scan. Closes the q264
    // asymmetry: the repo could create a mapped table its own DML
    // refused to touch.
    "q269_delta_mapped_dml" -> ((s, dir) => {
      import s.implicits._
      val base = stageQ269DeltaMapDml(s, dir)
      graft.sources.DeltaLogReader.read(s, base)
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_rows"), sum($"event_id").as("id_checksum"),
          sum($"amount_micros").as("amount_checksum"))
        .orderBy($"event_type")
    }),

    // PLAIN-ROW Delta streaming — streamAdds drains a NON-CDF table as
    // per-version add-file micro-batches (the real delta source's
    // default semantics): two appends each arrive as one batch, the
    // dataChange=false OPTIMIZE advances the offset WITHOUT serving
    // its rewritten files (a stream that re-served them would double
    // every row), the third append arrives on a later drain, and a
    // second drain over the same checkpoint consumes nothing — the
    // exactly-once sentinel.
    "q270_stream_delta_adds" -> ((s, dir) => {
      import s.implicits._
      val base = stageQ270DeltaStream(s, dir)
      val chk = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft_q270_chk_${java.util.UUID.randomUUID().toString.take(8)}").toString
      val acc = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
      try {
        graft.sources.DeltaLogReader.streamAdds(s, base, chk) { (df, v) =>
          val r = df.agg(count(lit(1)), sum($"event_id"), sum($"value_micros"))
            .collect().head
          acc += ((v, r.getLong(0), r.getLong(1), r.getLong(2)))
        }
        val second = graft.sources.DeltaLogReader.streamAdds(
          s, base, chk)((_, _) => ())
        acc += ((99L, second.size.toLong, 0L, 0L))
      } finally {
        val p = new org.apache.hadoop.fs.Path(chk)
        p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      }
      acc.toSeq.toDF("commit_version", "n_rows", "id_checksum", "value_checksum")
        .orderBy($"commit_version")
    }),

    // STREAMING Iceberg changelog consumption — streamChangelog drains
    // the q265 table one snapshot per micro-batch over a crash-safe
    // snapshot-id offset checkpoint: the compaction snapshot advances
    // the offset with ZERO rows (changeless), the upsert and delete
    // snapshots each arrive as one batch of classified change rows,
    // and a second drain consumes nothing — the exactly-once law as
    // the z_second_drain sentinel. Completes the CDC matrix: q252
    // streams INTO Iceberg, q263 OUT of Delta, this OUT of Iceberg.
    "q266_stream_iceberg_changelog" -> ((s, dir) => {
      import s.implicits._
      val base = stageQ265IcebergChangelog(s, dir)
      val chk = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft_q266_chk_${java.util.UUID.randomUUID().toString.take(8)}").toString
      val acc = scala.collection.mutable.ArrayBuffer
        .empty[(String, Long, Long, Long, Long)]
      try {
        graft.sources.Iceberg.streamChangelog(s, base, chk,
          startAfterSnapshotId = 8101L) { (df, snap) =>
          df.groupBy($"_change_type")
            .agg(count(lit(1)).as("n"), sum($"event_id").as("idc"),
              sum($"value_micros").as("vmc"))
            .collect().foreach(r => acc +=
              ((r.getString(0), snap, r.getLong(1), r.getLong(2), r.getLong(3))))
        }
        val second = graft.sources.Iceberg.streamChangelog(
          s, base, chk, startAfterSnapshotId = 8101L)((_, _) => ())
        acc += (("z_second_drain", 9999L, second.size.toLong, 0L, 0L))
      } finally {
        val p = new org.apache.hadoop.fs.Path(chk)
        p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      }
      acc.toSeq.toDF("change_type", "change_snapshot_id", "n_rows",
        "id_checksum", "value_checksum")
        .orderBy($"change_snapshot_id", $"change_type")
    }),

    // Iceberg CHANGELOG scan — changesBetween over all five commit
    // shapes: an append attributes its rows cheaply (no existing data
    // re-read), the MoR upsert surfaces as delete+insert pairs through
    // the exact multiset diff, the COMPACTION nets ZERO change rows
    // (the law that separates a changelog from a file diff), and the
    // position delete surfaces its killed rows. The Iceberg twin of
    // q260's Delta feed — both formats' CDC surfaces converge on
    // oracle-replayed strata.
    "q265_iceberg_changelog" -> ((s, dir) => {
      import s.implicits._
      val base = stageQ265IcebergChangelog(s, dir)
      graft.sources.Iceberg.changesBetween(s, base, 8101L, 8105L)
        .groupBy($"_change_type", $"_change_snapshot_id")
        .agg(count(lit(1)).as("n_rows"), sum($"event_id").as("id_checksum"),
          sum($"value_micros").as("value_checksum"))
        .select($"_change_type".as("change_type"),
          $"_change_snapshot_id".as("change_snapshot_id"),
          $"n_rows", $"id_checksum", $"value_checksum")
        .orderBy($"change_snapshot_id", $"change_type")
    }),

    // Delta COLUMN-MAPPING WRITE — the enable→rename→append lifecycle
    // on the repo's own log: after the pure-metadata upgrade and
    // rename, BOTH file generations (pre-upgrade logical-named parquet
    // and post-rename physical-named appends) serve under the new
    // logical name through the reader's name-mode resolution. Renames
    // on Delta without rewriting a byte — the q256 Iceberg twin.
    "q264_delta_mapped_write" -> ((s, dir) => {
      import s.implicits._
      val base = stageQ264DeltaMapped(s, dir)
      graft.sources.DeltaLogReader.read(s, base)
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_rows"), sum($"event_id").as("id_checksum"),
          sum($"amount_micros").as("amount_checksum"))
        .orderBy($"event_type")
    }),

    // STREAMING Delta CDF consumption — streamChangeFeed drains the
    // q260 table's feed one commit per micro-batch over a crash-safe
    // file-offset checkpoint (the SnapshotLog.streamVersions
    // discipline on the REAL format): the metaData commit advances the
    // offset silently, the MERGE and DV-delete commits each arrive as
    // one batch of classified change rows, and a SECOND drain over the
    // same checkpoint consumes nothing — the exactly-once law, pinned
    // as the z_second_drain sentinel row.
    "q263_stream_delta_cdf" -> ((s, dir) => {
      import s.implicits._
      val base = stageQ260DeltaCdf(s, dir)
      // fresh checkpoint per invocation: the query's OUTPUT must be
      // deterministic; the second-drain law inside one invocation is
      // what pins resume semantics
      val chk = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft_q263_chk_${java.util.UUID.randomUUID().toString.take(8)}").toString
      val acc = scala.collection.mutable.ArrayBuffer
        .empty[(String, Long, Long, Long, Long)]
      try {
        graft.sources.DeltaLogReader.streamChangeFeed(s, base, chk,
          startVersion = 1L) { (df, v) =>
          df.groupBy($"_change_type")
            .agg(count(lit(1)).as("n"), sum($"event_id").as("idc"),
              sum($"value_micros").as("vmc"))
            .collect().foreach(r => acc +=
              ((r.getString(0), v, r.getLong(1), r.getLong(2), r.getLong(3))))
        }
        val second = graft.sources.DeltaLogReader.streamChangeFeed(
          s, base, chk)((_, _) => ())
        acc += (("z_second_drain", 99L, second.size.toLong, 0L, 0L))
      } finally {
        val p = new org.apache.hadoop.fs.Path(chk)
        p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      }
      acc.toSeq.toDF("change_type", "commit_version", "n_rows",
        "id_checksum", "value_checksum")
        .orderBy($"commit_version", $"change_type")
    }),

    // Iceberg MANIFEST REWRITE — rewrite_manifests merges three
    // appends' data manifests into ONE (the b leg pins it via the
    // manifests metadata table) while every entry stays EXISTING under
    // its original snapshot id and sequence number: the a leg pins the
    // merged read against the oracle's full scan, the c leg pins time
    // travel to a PRE-rewrite snapshot. Planning now opens one manifest
    // instead of three — the metadata twin of q246's file compaction.
    "q261_iceberg_rewrite_manifests" -> ((s, dir) => {
      import s.implicits._
      import graft.sources.Iceberg
      val base = stageQ261IcebergRewritten(s, dir)
      val manifestsLeg = Iceberg.manifestsTable(s, base)
        .where($"content" === 0)
        .agg(count(lit(1)).as("n_rows"))
        .select(lit("b_data_manifests").as("leg"), $"n_rows",
          lit(0L).as("id_checksum"), lit(0L).as("value_checksum"))
      val travelLeg = Iceberg.readSnapshot(s, base, 7002L)
        .agg(count(lit(1)).as("n_rows"), sum($"event_id").as("id_checksum"),
          sum($"value_micros").as("value_checksum"))
        .select(lit("c_travel").as("leg"), $"n_rows", $"id_checksum",
          $"value_checksum")
      Iceberg.read(s, base)
        .agg(count(lit(1)).as("n_rows"), sum($"event_id").as("id_checksum"),
          sum($"value_micros").as("value_checksum"))
        .select(lit("a_rows").as("leg"), $"n_rows", $"id_checksum",
          $"value_checksum")
        .unionAll(manifestsLeg).unionAll(travelLeg)
        .orderBy($"leg")
    }),

    // Delta CHANGE DATA FEED — readChangeFeed over a table this repo's
    // own writer produced: v0's inserts DERIVE from its add actions
    // (blind appends write no change files, delta-spark's rule), v2's
    // MERGE and v3's DV delete serve the _change_data/ parquet their
    // commits published (a DV commit's changes hide in the bitmap and
    // are NOT derivable — the cdc action is the contract). The oracle
    // recomputes every (change_type, commit_version) stratum from the
    // events table.
    "q260_delta_change_feed" -> ((s, dir) => {
      import s.implicits._
      val base = stageQ260DeltaCdf(s, dir)
      graft.sources.DeltaLogReader.readChangeFeed(s, base, 0L, 3L)
        .groupBy($"_change_type", $"_commit_version")
        .agg(count(lit(1)).as("n_rows"), sum($"event_id").as("id_checksum"),
          sum($"value_micros").as("value_checksum"))
        .select($"_change_type".as("change_type"),
          $"_commit_version".as("commit_version"),
          $"n_rows", $"id_checksum", $"value_checksum")
        .orderBy($"commit_version", $"change_type")
    }),

    // Iceberg HIDDEN-PARTITION WRITE — commitAppend derives day(ets)
    // and bucket(4, user_id) partition values itself (spec-pinned
    // murmur3 / floorDiv via IcebergTransforms), and the reader's
    // transform-aware pruning plans against that SELF-WRITTEN metadata:
    // a one-day ets range + a point user_id predicate map through the
    // spec to (day=d, bucket=b) and plan EXACTLY the one file that
    // tuple landed in (single commit ⇒ one file per live tuple). The
    // a_rows leg pins the pruned read's data against the oracle's full
    // scan — a writer that mis-derives a bucket or a day either loses
    // rows here or plans extra files in the b_files law.
    "q259_iceberg_hidden_partition_write" -> ((s, dir) => {
      import s.implicits._
      import graft.sources.Iceberg
      val base = stageQ259IcebergHiddenPart(s, dir)
      // probe DERIVED from the data: the min user's first event day —
      // guaranteed live at any sf, so the 1-file law never gaps
      val p = t(s, dir, "events").orderBy($"user_id", $"ts")
        .select($"user_id", expr("ts DIV 1000").as("us")).head
      val (u, us) = (p.getLong(0), p.getLong(1))
      val dayLo = Math.floorDiv(us, 86400000000L) * 86400000000L
      val dayHi = dayLo + 86400000000L - 1
      val range = Seq(Iceberg.ColRange("ets", dayLo, dayHi),
        Iceberg.ColRange("user_id", u, u))
      val filesLeg = Seq((Iceberg.planFiles(s, base, range).size.toLong, 0L, 0L))
        .toDF("n_rows", "id_checksum", "value_checksum")
        .select(lit("b_files").as("leg"), $"n_rows", $"id_checksum", $"value_checksum")
      Iceberg.readPruned(s, base, range)
        .where($"user_id" === u && $"ets" >= timestamp_micros(lit(dayLo)) &&
          $"ets" <= timestamp_micros(lit(dayHi)))
        .agg(count(lit(1)).as("n_rows"), sum($"event_id").as("id_checksum"),
          sum($"value_micros").as("value_checksum"))
        .select(lit("a_rows").as("leg"), $"n_rows", $"id_checksum", $"value_checksum")
        .unionAll(filesLeg)
        .orderBy($"leg")
    }),

    // Iceberg PARTITIONED WRITE — the writer derives identity partition
    // values and manifest-list summaries itself (one file per value per
    // commit), and the reader's partition pruning runs against that
    // SELF-WRITTEN metadata: a point event_type predicate plans exactly
    // 2 of 10 files (one purchase file per commit — deterministic by
    // construction, not by sampler luck). The a_rows leg pins the
    // pruned read's data against the oracle's full scan; a writer that
    // mis-records a value or a summary either loses rows here or fails
    // the never-opened law in IcebergWriterSpec.
    "q255_iceberg_partitioned_write" -> ((s, dir) => {
      import s.implicits._
      import graft.sources.Iceberg
      val base = stageQ255IcebergPartitioned(s, dir)
      val range = Seq(Iceberg.ColRange("event_type", "purchase", "purchase"))
      val filesLeg = Seq((Iceberg.planFiles(s, base, range).size.toLong, 0L, 0L))
        .toDF("n_rows", "id_checksum", "value_checksum")
        .select(lit("b_files").as("leg"), $"n_rows", $"id_checksum", $"value_checksum")
      Iceberg.readPruned(s, base, range)
        .where($"event_type" === "purchase")
        .agg(count(lit(1)).as("n_rows"), sum($"event_id").as("id_checksum"),
          sum($"value_micros").as("value_checksum"))
        .select(lit("a_rows").as("leg"), $"n_rows", $"id_checksum", $"value_checksum")
        .unionAll(filesLeg)
        .orderBy($"leg")
    }),

    // Iceberg CLUSTERED COMPACTION — maintenance meets the pruning
    // tier: after `compact(sortBy = user_id, numFiles = 8)` the eight
    // rewritten files carry tight DISJOINT user_id bounds, so the
    // b_files leg pins that a point query plans EXACTLY ONE of them
    // (range partitioning puts every copy of a key in one partition —
    // deterministic whatever boundaries the sampler picked), while the
    // a_rows leg pins the pruned read's data against the oracle's full
    // scan. An unsorted rewrite would plan all eight.
    "q254_iceberg_clustered_compact" -> ((s, dir) => {
      import s.implicits._
      import graft.sources.Iceberg
      val base = stageQ254IcebergClustered(s, dir)
      // probe key DERIVED from the data (min user_id — guaranteed to
      // exist at any sf) so the 1-file law never fails on a data gap
      val probe = t(s, dir, "events").agg(min($"user_id")).head.getLong(0)
      val range = Seq(Iceberg.ColRange("user_id", probe, probe))
      val filesLeg = Seq((Iceberg.planFiles(s, base, range).size.toLong, 0L, 0L))
        .toDF("n_rows", "id_checksum", "value_checksum")
        .select(lit("b_files").as("leg"), $"n_rows", $"id_checksum", $"value_checksum")
      Iceberg.readPruned(s, base, range)
        .where($"user_id" === probe)
        .agg(count(lit(1)).as("n_rows"), sum($"event_id").as("id_checksum"),
          sum($"value_micros").as("value_checksum"))
        .select(lit("a_rows").as("leg"), $"n_rows", $"id_checksum", $"value_checksum")
        .unionAll(filesLeg)
        .orderBy($"leg")
    }),

    // Iceberg METADATA TABLES — the `SELECT * FROM tbl.snapshots /
    // .manifests / .files` inspection surface over a three-commit table
    // (two appends + a row-level delete). The files leg pins the REAL
    // record_count accounting the writers now stamp (per-file row
    // counts from the parquet footers; the delete file's count = the
    // matched coordinates), the manifests leg pins content flags and
    // original attribution through the delete commit's carry, the
    // snapshots leg pins the history. The oracle replays every number
    // from the source slices.
    "q249_iceberg_metadata_tables" -> ((s, dir) => {
      import s.implicits._
      import graft.sources.Iceberg
      val base = stageQ249IcebergMeta(s, dir)
      val files = Iceberg.filesTable(s, base)
        .select(lit("file").as("leg"), $"content".cast("long").as("k1"),
          $"snapshot_id".as("k2"), $"record_count".as("n"))
      val snaps = Iceberg.snapshotsTable(s, base)
        .select(lit("snap").as("leg"), $"snapshot_id".as("k1"),
          $"timestamp_ms".as("k2"), lit(1L).as("n"))
      val mans = Iceberg.manifestsTable(s, base)
        .select(lit("manifest").as("leg"), $"content".cast("long").as("k1"),
          $"added_snapshot_id".as("k2"), lit(1L).as("n"))
      files.unionAll(snaps).unionAll(mans).orderBy($"leg", $"k1", $"k2")
    }),

    // Iceberg WRITE round-trip — the repo's own commitAppend produced
    // the table (schema + field ids derived from the frame, per-file
    // footer-derived bounds, carried manifests with original
    // attribution); the read-back legs exercise full replay, AS-OF
    // snapshot and the incremental scan against SELF-WRITTEN metadata.
    // The oracle replays the % 3 slices declaratively — a writer that
    // mis-attributes the carried manifest double-counts the incremental
    // leg; one that loses a part or a column breaks the full leg.
    "q243_iceberg_write_roundtrip" -> ((s, dir) => {
      import s.implicits._
      import graft.sources.Iceberg
      val base = stageQ243IcebergWritten(s, dir)
      def leg(name: String, df: DataFrame): DataFrame =
        df.agg(count(lit(1)).as("n_rows"), sum($"event_id").as("id_checksum"),
            sum($"value_micros").as("value_checksum"))
          .select(lit(name).as("leg"), $"n_rows", $"id_checksum", $"value_checksum")
      leg("full", Iceberg.read(s, base))
        .unionAll(leg("snap1", Iceberg.readSnapshot(s, base, 6001L)))
        .unionAll(leg("incr", Iceberg.readIncremental(s, base, 6001L, 6002L)))
        .orderBy($"leg")
    }),

    // Iceberg HIDDEN PARTITIONING — transform-aware pruning (q232's
    // identity twin): the table partitions by bucket[4](user_id) ×
    // daily-truncate(ts_us), derived values the data files don't even
    // carry. A user-point + day-window predicate must map through BOTH
    // transforms (the spec's murmur3 bucket for the point; the
    // order-preserving truncate for the range) to prune 3 of 4 manifests
    // UNOPENED and plan only the window's files inside the fourth —
    // Round12QueriesSpec pins the planned-file counts per predicate
    // tier. The DuckDB oracle scans ALL events rows with the same raw
    // predicate; a wrong bucket hash or a mis-floored truncation prunes
    // live files and breaks the checksums.
    "q241_iceberg_hidden_partitioning" -> ((s, dir) => {
      import s.implicits._
      import graft.sources.Iceberg
      val base = stageQ241IcebergHiddenPart(s, dir)
      val DayUs = 86400000000L
      val lo = 19728L * DayUs          // 2024-01-06
      val hi = 19731L * DayUs - 1      // ..through 2024-01-08
      Iceberg.readPruned(s, base, Seq(
          Iceberg.ColRange("user_id", 7L, 7L),
          Iceberg.ColRange("ts_us", lo, hi)))
        .where($"user_id" === 7L && $"ts_us".between(lo, hi))
        .agg(count(lit(1)).as("n_rows"), sum($"event_id").as("id_checksum"),
          sum($"ts_us").as("ts_checksum"))
    }),

    // Row-level DELETE on the snapshot log — the copy-on-write table verb
    // (Delta's DELETE FROM): commit events hash-clustered by type into 4
    // files, delete one type, and pin BOTH sides of the contract in one
    // row — the post-delete state (matched rows gone, survivors intact)
    // and the pre-delete version still fully readable (history is
    // immutable; the rewrite touched only files containing matches —
    // file-level invariants are spec'd in SnapshotLogSpec, row-level
    // semantics are oracle-checked here). A leaked survivor, a deleted
    // null-predicate row, or broken time travel all break the hash.
    "q201_snapshot_delete" -> ((s, dir) => {
      import s.implicits._
      val base = scratch(q201TablePat, dir)
      val bp = new org.apache.hadoop.fs.Path(base)
      bp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(bp, true)
      val ev = t(s, dir, "events").select($"event_id", $"event_type",
        round($"value" * 1e6).cast("long").as("value_micros"))
      SnapshotLog.commit(s, base, ev.repartition(4, $"event_type"), overwrite = false)
      val (nv, del, _, _) =
        SnapshotLog.deleteWhere(s, base, $"event_type" === "click")
      val after = SnapshotLog.read(s, base)
        .agg(count(lit(1)).as("n_after"), sum($"event_id").as("id_checksum_after"))
      val v1 = SnapshotLog.readVersion(s, base, 1)
        .agg(count(lit(1)).as("n_v1"), sum($"event_id").as("id_checksum_v1"))
      after.crossJoin(v1).select(lit(nv.toLong).as("version"),
        lit(del).as("n_deleted"), $"n_after", $"id_checksum_after",
        $"n_v1", $"id_checksum_v1")
    }),

    // Row-level UPDATE on the snapshot log — q201's copy-on-write
    // companion (Delta's UPDATE ... SET): bump the matched rows' value in
    // place, leave every other row — including the non-matching rows
    // inside rewritten files — byte-identical, keep the pre-update
    // version readable. The oracle recomputes both versions' checksums
    // from `events`; an update leaking onto unmatched rows, a dropped
    // survivor, or mutated history all break the hash.
    "q202_snapshot_update" -> ((s, dir) => {
      import s.implicits._
      val base = scratch(q202TablePat, dir)
      val bp = new org.apache.hadoop.fs.Path(base)
      bp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(bp, true)
      val ev = t(s, dir, "events").select($"event_id", $"event_type",
        round($"value" * 1e6).cast("long").as("value_micros"))
      SnapshotLog.commit(s, base, ev.repartition(4, $"event_type"), overwrite = false)
      val (nv, upd, _, _) = SnapshotLog.updateWhere(s, base,
        $"event_type" === "click",
        Map("value_micros" -> ($"value_micros" + lit(1000000L))))
      val after = SnapshotLog.read(s, base)
        .agg(count(lit(1)).as("n_rows"), sum($"value_micros").as("value_checksum_after"))
      val v1 = SnapshotLog.readVersion(s, base, 1)
        .agg(sum($"value_micros").as("value_checksum_v1"))
      after.crossJoin(v1).select(lit(nv.toLong).as("version"),
        lit(upd).as("n_updated"), $"n_rows", $"value_checksum_after",
        $"value_checksum_v1")
    }),

    // MERGE INTO on the snapshot log — the CDC-apply verb completing the
    // DML trio (q201 DELETE, q202 UPDATE): the table starts without the
    // id%5==0 slice, the change batch carries updates (id%10==3, value
    // bumped) AND the missing slice as inserts, and one merge applies
    // both. Copy-on-write: only matched-key files rewrite, the batch
    // lands as this commit's files, v1 stays readable. The oracle
    // recomputes the post-merge state declaratively — a lost insert, a
    // double-applied update, or a survivor dropped from a rewritten file
    // all break the hash.
    "q203_snapshot_merge" -> ((s, dir) => {
      import s.implicits._
      val base = scratch(q203TablePat, dir)
      val bp = new org.apache.hadoop.fs.Path(base)
      bp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(bp, true)
      val ev = t(s, dir, "events").select($"event_id", $"event_type",
        round($"value" * 1e6).cast("long").as("value_micros"))
      SnapshotLog.commit(s, base,
        ev.where($"event_id" % 5 =!= 0).repartition(4, $"event_type"),
        overwrite = false)
      val batch = ev.where($"event_id" % 5 =!= 0 && $"event_id" % 10 === 3)
        .withColumn("value_micros", $"value_micros" + lit(5000000L))
        .unionByName(ev.where($"event_id" % 5 === 0))
      val (nv, replaced, inserted, _, _) =
        SnapshotLog.mergeInto(s, base, batch, Seq("event_id"))
      val after = SnapshotLog.read(s, base)
        .agg(count(lit(1)).as("n_rows"), sum($"value_micros").as("value_checksum"),
          sum($"event_id").as("id_checksum"))
      val v1 = SnapshotLog.readVersion(s, base, 1)
        .agg(count(lit(1)).as("n_v1"))
      after.crossJoin(v1).select(lit(nv.toLong).as("version"),
        lit(replaced).as("n_replaced"), lit(inserted).as("n_inserted"),
        $"n_rows", $"value_checksum", $"id_checksum", $"n_v1")
    }),

    // STREAMING CDC-apply: micro-batches merged into the snapshot log via
    // foreachBatch (the streaming-upsert sink every CDC pipeline ends in
    // — Delta's streaming MERGE pattern). Two deliveries drained by
    // separate AvailableNow runs over ONE checkpoint (the q189
    // exactly-once contract): batch 1 updates the id%6==0 slice, batch 2
    // inserts the id%3==1 slice; each micro-batch is one log version.
    // The oracle recomputes the final upserted state — a re-applied
    // batch (double bump), a lost merge, or survivors dropped in the
    // copy-on-write rewrite all break the hash.
    "q204_stream_merge" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.streaming.Trigger
      val tag = Tables.sfTag(dir)
      val tmp = System.getProperty("java.io.tmpdir")
      def p(n: String) = new java.io.File(tmp, s"graft_q204_${n}_$tag").toString
      val (srcDir, chk, updDir, insDir, tbl) =
        (p("src"), p("chk"), p("upd"), p("ins"), p("tbl"))
      val hconf = s.sparkContext.hadoopConfiguration
      val fs = new org.apache.hadoop.fs.Path(tmp).getFileSystem(hconf)
      Seq(srcDir, chk, updDir, insDir, tbl)
        .foreach(x => fs.delete(new org.apache.hadoop.fs.Path(x), true))
      val ev = t(s, dir, "events").select($"event_id", $"event_type",
        round($"value" * 1e6).cast("long").as("value_micros"))
      SnapshotLog.commit(s, tbl,
        ev.where($"event_id" % 3 === 0).repartition(4, $"event_type"),
        overwrite = false)
      ev.where($"event_id" % 6 === 0)
        .withColumn("value_micros", $"value_micros" + lit(7000000L))
        .coalesce(1).write.parquet(updDir)
      ev.where($"event_id" % 3 === 1).coalesce(1).write.parquet(insDir)
      val schema = s.read.parquet(updDir).schema
      fs.mkdirs(new org.apache.hadoop.fs.Path(srcDir))
      def deliver(from: String, prefix: String): Unit = {
        val src = new org.apache.hadoop.fs.Path(from)
        val f = src.getFileSystem(hconf)
        f.listStatus(src).filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
          .zipWithIndex.foreach { case (st, i) =>
            org.apache.hadoop.fs.FileUtil.copy(f, st.getPath, fs,
              new org.apache.hadoop.fs.Path(srcDir, s"$prefix$i.parquet"), false, hconf)
          }
      }
      def drain(): Unit = {
        val q = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", Int.MaxValue.toString).parquet(srcDir)
          .writeStream
          .foreachBatch { (b: DataFrame, _: Long) =>
            if (!b.isEmpty) SnapshotLog.mergeInto(s, tbl, b, Seq("event_id")); ()
          }
          .option("checkpointLocation", chk)
          .trigger(Trigger.AvailableNow()).start()
        if (!q.awaitTermination(StreamScaffold.AwaitTimeoutMs))
          { q.stop(); sys.error("q204 merge stream did not terminate in time") }
      }
      deliver(updDir, "a"); drain()
      deliver(insDir, "b"); drain() // same checkpoint: only the new file
      SnapshotLog.read(s, tbl)
        .agg(count(lit(1)).as("n_rows"), sum($"value_micros").as("value_checksum"),
          sum($"event_id").as("id_checksum"))
        .select(lit(SnapshotLog.latestVersion(s, tbl).toLong).as("version"),
          $"n_rows", $"value_checksum", $"id_checksum")
    }),

    // CHANGE DATA FEED across a version range (Delta's table_changes):
    // v1 commits the id%4!=0 slice, v2 copy-on-write-deletes the clicks,
    // v3 appends the id%4==0 slice — the CDF over v1..v3 must surface
    // EXACTLY the deleted clicks and the appended rows, with the
    // survivors the delete's rewrite carried into new files cancelled by
    // the manifest-diff + exceptAll shape (only changed files are read).
    // A leaked carried row, a missed delete, or reading unchanged files
    // as inserts all break the hash.
    "q205_change_feed" -> ((s, dir) => {
      import s.implicits._
      val base = scratch(q205TablePat, dir)
      val bp = new org.apache.hadoop.fs.Path(base)
      bp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(bp, true)
      val ev = t(s, dir, "events").select($"event_id", $"event_type",
        round($"value" * 1e6).cast("long").as("value_micros"))
      SnapshotLog.commit(s, base,
        ev.where($"event_id" % 4 =!= 0).repartition(4, $"event_type"),
        overwrite = false)
      SnapshotLog.deleteWhere(s, base, $"event_type" === "click")
      SnapshotLog.commit(s, base, ev.where($"event_id" % 4 === 0),
        overwrite = false)
      SnapshotLog.changesBetween(s, base, 1, 3)
        .groupBy($"_change_type")
        .agg(count(lit(1)).as("n"), sum($"event_id").as("id_checksum"),
          sum($"value_micros").as("value_checksum"))
        .orderBy($"_change_type")
    }),

    // RESTORE + SHALLOW CLONE — the two zero-copy metadata verbs: an
    // overwrite buries the purchase slice, RESTORE rolls it back as pure
    // manifest metadata (v3 = v1's files, nothing copied), and a shallow
    // clone pins the restored state at a second path where a
    // copy-on-write delete rewrites into CLONE-owned files — the source
    // must come through untouched. One row pins all four states; a
    // restore that re-copied or mutated data, or a clone delete leaking
    // into the source, breaks the hash.
    "q206_restore_clone" -> ((s, dir) => {
      import s.implicits._
      val base = scratch(q206TablePat, dir)
      val clone = scratch(q206ClonePat, dir)
      val hfs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      Seq(base, clone).foreach(x =>
        hfs.delete(new org.apache.hadoop.fs.Path(x), true))
      val ev = t(s, dir, "events").select($"event_id", $"event_type",
        round($"value" * 1e6).cast("long").as("value_micros"))
      SnapshotLog.commit(s, base, ev.where($"event_type" === "purchase"),
        overwrite = false)
      SnapshotLog.commit(s, base, ev.where($"event_type" === "view"),
        overwrite = true)
      val rv = SnapshotLog.restore(s, base, 1)
      SnapshotLog.shallowClone(s, base, clone)
      SnapshotLog.deleteWhere(s, clone, $"event_id" % 2 === 0)
      val restored = SnapshotLog.read(s, base)
        .agg(count(lit(1)).as("n_restored"), sum($"event_id").as("restored_checksum"))
      val cloned = SnapshotLog.read(s, clone)
        .agg(count(lit(1)).as("n_clone"), sum($"event_id").as("clone_checksum"))
      restored.crossJoin(cloned).select(lit(rv.toLong).as("restored_version"),
        $"n_restored", $"restored_checksum", $"n_clone", $"clone_checksum")
    }),
  )

  val oracle: Map[String, String] = Map(
    "q228_iceberg_read" ->
      """WITH active AS (
        |  SELECT event_id, event_type, CAST(round(value * 1e6) AS BIGINT) AS value_micros
        |  FROM events
        |  WHERE (event_type = 'purchase' AND event_id % 2 <> 0)
        |     OR event_type = 'click'
        |     OR (event_type = 'view' AND CAST(round(value * 1e6) AS BIGINT) > 100000000))
        |SELECT event_type, count(*) AS n,
        |  CAST(sum(event_id) AS BIGINT) AS id_checksum,
        |  CAST(sum(value_micros) AS BIGINT) AS value_checksum
        |FROM active GROUP BY 1 ORDER BY event_type""".stripMargin,
    "q229_iceberg_time_travel" ->
      """WITH s1 AS (SELECT event_id FROM events WHERE event_type = 'purchase'),
        |s2 AS (SELECT event_id FROM events
        |       WHERE (event_type = 'purchase' AND event_id % 2 <> 0)
        |          OR event_type = 'click'),
        |s3 AS (SELECT event_id FROM s2
        |       UNION ALL
        |       SELECT event_id FROM events
        |       WHERE event_type = 'view' AND CAST(round(value * 1e6) AS BIGINT) > 100000000)
        |SELECT CAST(1001 AS BIGINT) AS snapshot_id, count(*) AS n_rows,
        |  CAST(sum(event_id) AS BIGINT) AS id_checksum FROM s1
        |UNION ALL
        |SELECT CAST(1002 AS BIGINT), count(*), CAST(sum(event_id) AS BIGINT) FROM s2
        |UNION ALL
        |SELECT CAST(1003 AS BIGINT), count(*), CAST(sum(event_id) AS BIGINT) FROM s3
        |ORDER BY snapshot_id""".stripMargin,
    "q232_iceberg_pruned_scan" ->
      """SELECT count(*) AS n,
        |  CAST(sum(event_id) AS BIGINT) AS id_checksum,
        |  CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) AS value_checksum
        |FROM events
        |WHERE event_type = 'purchase'
        |  AND CAST(round(value * 1e6) AS BIGINT) BETWEEN 0 AND 49999999""".stripMargin,
    "q234_iceberg_as_of" ->
      """WITH s1 AS (SELECT event_id FROM events
        |            WHERE event_type IN ('click', 'error', 'purchase')),
        |s2 AS (SELECT event_id FROM events)
        |SELECT CAST(1000 AS BIGINT) AS as_of_ms, count(*) AS n_rows,
        |  CAST(sum(event_id) AS BIGINT) AS id_checksum FROM s1
        |UNION ALL
        |SELECT CAST(4999 AS BIGINT), count(*), CAST(sum(event_id) AS BIGINT) FROM s1
        |UNION ALL
        |SELECT CAST(5000 AS BIGINT), count(*), CAST(sum(event_id) AS BIGINT) FROM s2
        |UNION ALL
        |SELECT CAST(999999 AS BIGINT), count(*), CAST(sum(event_id) AS BIGINT) FROM s2
        |ORDER BY as_of_ms""".stripMargin,
    "q236_iceberg_mor_read" ->
      """WITH p AS (SELECT event_id, CAST(round(value * 1e6) AS BIGINT) AS value_micros
        |           FROM events WHERE event_type = 'purchase')
        |SELECT CAST(3001 AS BIGINT) AS snapshot_id, count(*) AS n_rows,
        |  CAST(sum(event_id) AS BIGINT) AS id_checksum,
        |  CAST(sum(value_micros) AS BIGINT) AS value_checksum
        |FROM p
        |UNION ALL
        |SELECT CAST(3002 AS BIGINT), count(*),
        |  CAST(sum(event_id) AS BIGINT), CAST(sum(value_micros) AS BIGINT)
        |FROM p WHERE event_id % 6 <> 0
        |ORDER BY snapshot_id""".stripMargin,
    "q237_iceberg_equality_deletes" ->
      """SELECT count(*) AS n_rows,
        |  CAST(sum(event_id) AS BIGINT) AS id_checksum,
        |  CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) AS value_checksum
        |FROM events
        |WHERE event_type = 'click' AND event_id % 10 <> 0""".stripMargin,
    "q238_delta_column_mapping" ->
      """SELECT count(*) AS n_rows,
        |  CAST(sum(event_id) AS BIGINT) AS id_checksum,
        |  CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) AS value_checksum
        |FROM events
        |WHERE event_type = 'signup'""".stripMargin,
    "q239_delta_deletion_vectors" ->
      """SELECT count(*) AS n_rows,
        |  CAST(sum(event_id) AS BIGINT) AS id_checksum,
        |  CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) AS value_checksum
        |FROM events
        |WHERE event_type = 'purchase' AND event_id % 3 <> 0""".stripMargin,
    "q240_delta_dv_delete" ->
      """SELECT count(*) AS n_rows,
        |  CAST(sum(event_id) AS BIGINT) AS id_checksum,
        |  CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) AS value_checksum
        |FROM events
        |WHERE event_type = 'click' AND event_id % 7 <> 0 AND event_id % 11 <> 0""".stripMargin,
    "q245_iceberg_delete_roundtrip" ->
      """WITH pc AS (SELECT event_id, CAST(round(value * 1e6) AS BIGINT) AS vm
        |            FROM events WHERE event_type IN ('purchase', 'click'))
        |SELECT * FROM (
        |  SELECT 'pre_delete' AS leg, count(*) AS n_rows,
        |    CAST(sum(event_id) AS BIGINT) AS id_checksum,
        |    CAST(sum(vm) AS BIGINT) AS value_checksum
        |  FROM pc
        |  UNION ALL
        |  SELECT 'post_delete', count(*),
        |    CAST(sum(event_id) AS BIGINT), CAST(sum(vm) AS BIGINT)
        |  FROM pc WHERE event_id % 5 <> 0
        |) ORDER BY leg""".stripMargin,
    "q257_delta_restore" ->
      """SELECT * FROM (
        |  SELECT 'a_current' AS leg, count(*) AS n_rows,
        |    CAST(sum(event_id) AS BIGINT) AS id_checksum,
        |    CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) AS value_checksum
        |  FROM events WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT 'b_pre_restore', count(*),
        |    CAST(sum(event_id) AS BIGINT),
        |    CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT)
        |  FROM events WHERE event_type IN ('purchase', 'error')
        |) ORDER BY leg""".stripMargin,
    "q258_iceberg_rollback" ->
      """SELECT * FROM (
        |  SELECT 'a_current' AS leg, count(*) AS n_rows,
        |    CAST(sum(event_id) AS BIGINT) AS id_checksum,
        |    CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) AS value_checksum
        |  FROM events WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT 'b_rolled_over', count(*),
        |    CAST(sum(event_id) AS BIGINT),
        |    CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT)
        |  FROM events WHERE event_type IN ('purchase', 'click')
        |  UNION ALL
        |  SELECT 'c_history', CAST(3 AS BIGINT),
        |    CAST(21006 AS BIGINT), CAST(6000 AS BIGINT)
        |) ORDER BY leg""".stripMargin,
    "q256_iceberg_schema_evolution" ->
      """SELECT count(*) AS n_rows,
        |  CAST(sum(event_id) AS BIGINT) AS id_checksum,
        |  CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) AS amount_checksum,
        |  CAST(sum(CASE WHEN event_type = 'click'
        |                THEN CAST(round(value * 1e6) AS BIGINT) % 1000
        |           END) AS BIGINT) AS bonus_checksum
        |FROM events WHERE event_type IN ('purchase', 'click')""".stripMargin,
    "q275_sql_catalog_lifecycle" ->
      """WITH vm AS MATERIALIZED (
        |  SELECT event_id, event_type,
        |    CAST(round(value * 1e6) AS BIGINT) AS vm
        |  FROM events WHERE event_type IN ('purchase', 'click')),
        |d AS MATERIALIZED (
        |  SELECT event_id, event_type, vm FROM vm
        |  WHERE NOT (event_type = 'click' AND vm < 300000000))
        |SELECT * FROM (
        |  SELECT 'a_delta' AS leg, count(*) AS n_rows,
        |    CAST(sum(event_id) AS BIGINT) AS id_checksum,
        |    CAST(sum(vm) AS BIGINT) AS value_checksum
        |  FROM d
        |  UNION ALL
        |  SELECT 'b_iceberg', count(*), CAST(sum(event_id) AS BIGINT),
        |    CAST(sum(vm) AS BIGINT)
        |  FROM d WHERE event_type = 'purchase' AND vm >= 500000000
        |) ORDER BY leg""".stripMargin,
    "q286_sql_optimize_where" ->
      """WITH vm AS MATERIALIZED (
        |  SELECT event_id, CAST(round(value * 1e6) AS BIGINT) AS vm
        |  FROM events WHERE event_type IN ('purchase', 'click'))
        |SELECT * FROM (
        |  SELECT 'a_delta' AS leg, count(*) AS n_rows,
        |    CAST(sum(event_id) AS BIGINT) AS id_checksum,
        |    CAST(sum(vm) AS BIGINT) AS value_checksum
        |  FROM vm
        |  UNION ALL
        |  SELECT 'b_iceberg', count(*), CAST(sum(event_id) AS BIGINT),
        |    CAST(sum(vm) AS BIGINT)
        |  FROM vm
        |  UNION ALL
        |  SELECT 'c_meta_delta', CAST(2 AS BIGINT), CAST(1 AS BIGINT),
        |    CAST(2 AS BIGINT)
        |  UNION ALL
        |  SELECT 'd_meta_ice', CAST(3 AS BIGINT), CAST(1 AS BIGINT),
        |    CAST(2 AS BIGINT)
        |) ORDER BY leg""".stripMargin,
    "q281_sql_optimize_zorder" ->
      """WITH vm AS MATERIALIZED (
        |  SELECT event_type, event_id, user_id,
        |    CAST(round(value * 1e6) AS BIGINT) AS vm
        |  FROM events WHERE event_type IN ('purchase', 'click'))
        |SELECT * FROM (
        |  SELECT 'a_delta' AS leg, count(*) AS n_rows,
        |    CAST(sum(event_id) AS BIGINT) AS id_checksum,
        |    CAST(sum(vm) AS BIGINT) AS value_checksum
        |  FROM vm WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT 'b_iceberg', count(*), CAST(sum(event_id) AS BIGINT),
        |    CAST(sum(vm) AS BIGINT)
        |  FROM vm WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT 'c_meta', CAST(1 AS BIGINT), CAST(1 AS BIGINT),
        |    CAST(0 AS BIGINT)
        |) ORDER BY leg""".stripMargin,
    "q280_stream_sink_txn" ->
      """WITH vm AS MATERIALIZED (
        |  SELECT event_type, event_id,
        |    CAST(round(value * 1e6) AS BIGINT) AS vm
        |  FROM events WHERE event_type IN ('purchase', 'click', 'error'))
        |SELECT * FROM (
        |  SELECT 'a_' || event_type AS leg, count(*) AS n_rows,
        |    CAST(sum(event_id) AS BIGINT) AS id_checksum,
        |    CAST(sum(vm) AS BIGINT) AS value_checksum
        |  FROM vm GROUP BY event_type
        |  UNION ALL
        |  SELECT 'z_redrain', CAST(0 AS BIGINT), CAST(0 AS BIGINT),
        |    CAST(0 AS BIGINT)
        |  UNION ALL
        |  SELECT 'z_replay', CAST(0 AS BIGINT), CAST(0 AS BIGINT),
        |    CAST(0 AS BIGINT)
        |) ORDER BY leg""".stripMargin,
    "q279_iceberg_v3_writes" ->
      """WITH p AS MATERIALIZED (
        |  SELECT event_id, CAST(round(value * 1e6) AS BIGINT) AS vm
        |  FROM events WHERE event_type = 'purchase'),
        |c AS MATERIALIZED (
        |  SELECT event_id, CAST(round(value * 1e6) AS BIGINT) AS vm
        |  FROM events WHERE event_type = 'click'),
        |survivors AS (
        |  SELECT event_id, vm FROM p WHERE event_id % 4 <> 0
        |  UNION ALL
        |  SELECT event_id, vm FROM c
        |  WHERE vm >= 300000000 AND event_id % 4 <> 0),
        |kills AS (
        |  SELECT (SELECT count(*) FROM p WHERE event_id % 4 = 0) AS pk,
        |    (SELECT count(*) FROM c
        |     WHERE vm < 300000000 OR event_id % 4 = 0) AS ck)
        |SELECT * FROM (
        |  SELECT 'a_rows' AS leg, count(*) AS n_rows,
        |    CAST(sum(event_id) AS BIGINT) AS id_checksum,
        |    CAST(sum(vm) AS BIGINT) AS value_checksum
        |  FROM survivors
        |  UNION ALL
        |  SELECT 'b_lineage',
        |    (SELECT count(*) FROM p) + (SELECT count(*) FROM c),
        |    (SELECT count(*) FROM p),
        |    2 * ((SELECT count(*) FROM p) + (SELECT count(*) FROM c))
        |  UNION ALL
        |  SELECT 'c_dvs',
        |    (SELECT CASE WHEN pk > 0 THEN 1 ELSE 0 END
        |       + CASE WHEN ck > 0 THEN 1 ELSE 0 END FROM kills),
        |    (SELECT pk + ck FROM kills),
        |    CAST(0 AS BIGINT)
        |) ORDER BY leg""".stripMargin,
    "q278_readstream_table" ->
      """WITH vm AS MATERIALIZED (
        |  SELECT event_type, event_id,
        |    CAST(round(value * 1e6) AS BIGINT) AS vm
        |  FROM events WHERE event_type IN ('purchase', 'click', 'error')),
        |strata AS (
        |  SELECT event_type, count(*) AS n_rows,
        |    CAST(sum(event_id) AS BIGINT) AS id_checksum,
        |    CAST(sum(vm) AS BIGINT) AS value_checksum
        |  FROM vm GROUP BY event_type)
        |SELECT * FROM (
        |  SELECT 'a_delta_' || event_type AS leg, n_rows, id_checksum,
        |    value_checksum FROM strata
        |  UNION ALL
        |  SELECT 'b_ice_' || event_type, n_rows, id_checksum, value_checksum
        |  FROM strata WHERE event_type IN ('click', 'error')
        |  UNION ALL
        |  SELECT 'z_second_drain', CAST(0 AS BIGINT), CAST(0 AS BIGINT),
        |    CAST(0 AS BIGINT)
        |) ORDER BY leg""".stripMargin,
    "q277_sql_catalog_evolution" ->
      """WITH p AS MATERIALIZED (
        |  SELECT event_id, CAST(round(value * 1e6) AS BIGINT) AS vm
        |  FROM events WHERE event_type = 'purchase'),
        |d AS MATERIALIZED (
        |  SELECT event_id, vm, CAST(NULL AS BIGINT) AS value_cents FROM p
        |  UNION ALL
        |  SELECT event_id + 1000000, vm, vm // 1000
        |  FROM p WHERE event_id % 5 = 0),
        |i AS MATERIALIZED (
        |  SELECT event_id, CAST(round(value * 1e6) AS BIGINT) AS vm,
        |    CAST(round(value * 1e6) AS BIGINT) % 1000 AS bonus
        |  FROM events WHERE event_type = 'click'
        |    AND CAST(round(value * 1e6) AS BIGINT) >= 100000000)
        |SELECT * FROM (
        |  SELECT 'a_delta' AS leg, count(*) AS n_rows,
        |    CAST(sum(event_id) AS BIGINT) AS id_checksum,
        |    CAST(sum(vm) AS BIGINT) AS value_checksum,
        |    count(value_cents) AS n_valued,
        |    CAST(sum(value_cents) AS BIGINT) AS cents_checksum
        |  FROM d
        |  UNION ALL
        |  SELECT 'b_iceberg', count(*), CAST(sum(event_id) AS BIGINT),
        |    CAST(sum(vm) AS BIGINT), count(bonus), CAST(sum(bonus) AS BIGINT)
        |  FROM i
        |) ORDER BY leg""".stripMargin,
    "q276_sql_catalog_merge_update" ->
      """WITH vm AS MATERIALIZED (
        |  SELECT event_id, event_type, CAST(round(value * 1e6) AS BIGINT) AS vm
        |  FROM events WHERE event_type IN ('purchase', 'click')),
        |p0 AS (SELECT event_id, event_type, vm FROM vm WHERE event_type = 'purchase'),
        |c0 AS (SELECT event_id, event_type, vm FROM vm WHERE event_type = 'click'),
        |d1 AS MATERIALIZED (
        |  SELECT event_id, event_type,
        |    CASE WHEN vm < 250000000 THEN vm * 2 ELSE vm END AS vm FROM p0),
        |s2 AS MATERIALIZED (
        |  SELECT event_id, event_type, vm * 3 AS vm FROM d1 WHERE event_id % 4 = 0
        |  UNION ALL
        |  SELECT event_id, event_type, vm FROM c0 WHERE event_id % 6 = 0),
        |d2 AS MATERIALIZED (
        |  SELECT event_id, event_type, vm FROM d1
        |  WHERE event_id NOT IN (SELECT event_id FROM s2)
        |  UNION ALL SELECT event_id, event_type, vm FROM s2),
        |i1 AS MATERIALIZED (
        |  SELECT event_id, event_type,
        |    CASE WHEN event_id % 3 = 0 THEN vm + 7 ELSE vm END AS vm FROM c0),
        |s4 AS MATERIALIZED (
        |  SELECT event_id, event_type, vm * 5 AS vm FROM i1 WHERE event_id % 8 = 0
        |  UNION ALL
        |  SELECT event_id, event_type, vm FROM d2
        |  WHERE event_type = 'purchase' AND event_id % 10 = 0),
        |i2 AS MATERIALIZED (
        |  SELECT event_id, event_type, vm FROM i1
        |  WHERE event_id NOT IN (SELECT event_id FROM s4)
        |  UNION ALL SELECT event_id, event_type, vm FROM s4)
        |SELECT * FROM (
        |  SELECT 'a_delta' AS leg, count(*) AS n_rows,
        |    CAST(sum(event_id) AS BIGINT) AS id_checksum,
        |    CAST(sum(vm) AS BIGINT) AS value_checksum
        |  FROM d2
        |  UNION ALL
        |  SELECT 'b_iceberg', count(*), CAST(sum(event_id) AS BIGINT),
        |    CAST(sum(vm) AS BIGINT)
        |  FROM i2
        |) ORDER BY leg""".stripMargin,
    "q274_sql_catalog_delete" ->
      """SELECT * FROM (
        |  SELECT 'a_delta' AS leg, count(*) AS n_rows,
        |    CAST(sum(event_id) AS BIGINT) AS id_checksum,
        |    CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) AS value_checksum
        |  FROM events
        |  WHERE event_type = 'purchase'
        |    AND CAST(round(value * 1e6) AS BIGINT) >= 250000000
        |  UNION ALL
        |  SELECT 'b_iceberg', count(*), CAST(sum(event_id) AS BIGINT),
        |    CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT)
        |  FROM events
        |  WHERE event_type = 'click'
        |    AND CAST(round(value * 1e6) AS BIGINT) < 500000000
        |) ORDER BY leg""".stripMargin,
    "q273_sql_catalog_insert" ->
      """WITH p AS MATERIALIZED (
        |  SELECT event_id, CAST(round(value * 1e6) AS BIGINT) AS vm
        |  FROM events WHERE event_type = 'purchase'),
        |c AS MATERIALIZED (
        |  SELECT event_id, CAST(round(value * 1e6) AS BIGINT) AS vm
        |  FROM events WHERE event_type = 'click'),
        |d AS MATERIALIZED (
        |  SELECT event_id, vm FROM p
        |  UNION ALL SELECT event_id, vm FROM c WHERE event_id % 2 = 0),
        |i AS MATERIALIZED (
        |  SELECT event_id, vm FROM c
        |  UNION ALL SELECT event_id, vm * 3 FROM d WHERE event_id % 7 = 0)
        |SELECT * FROM (
        |  SELECT 'a_delta' AS leg, count(*) AS n_rows,
        |    CAST(sum(event_id) AS BIGINT) AS id_checksum,
        |    CAST(sum(vm) AS BIGINT) AS value_checksum
        |  FROM d
        |  UNION ALL
        |  SELECT 'b_iceberg', count(*), CAST(sum(event_id) AS BIGINT),
        |    CAST(sum(vm) AS BIGINT)
        |  FROM i
        |) ORDER BY leg""".stripMargin,
    "q272_iceberg_v3_deletion_vectors" ->
      """SELECT count(*) AS n_rows,
        |  CAST(sum(event_id) AS BIGINT) AS id_checksum,
        |  CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) AS value_checksum
        |FROM events
        |WHERE event_type = 'purchase' AND event_id % 4 <> 0""".stripMargin,
    "q271_stream_delta_upsert" ->
      """WITH p AS MATERIALIZED (
        |  SELECT event_id, CAST(round(value * 1e6) AS BIGINT) AS vm
        |  FROM events WHERE event_type = 'purchase')
        |SELECT * FROM (
        |  SELECT 'a_after_b0' AS leg, count(*) AS n_rows,
        |    CAST(sum(event_id) AS BIGINT) AS id_checksum,
        |    CAST(sum(CASE WHEN event_id % 3 = 0 THEN vm * 2 ELSE vm END)
        |      AS BIGINT) AS value_checksum
        |  FROM p
        |  UNION ALL
        |  SELECT 'b_final', count(*),
        |    CAST(sum(event_id) AS BIGINT),
        |    CAST(sum(CASE WHEN event_id % 6 = 0 THEN vm * 3
        |                  WHEN event_id % 3 = 0 THEN vm * 2
        |                  ELSE vm END) AS BIGINT)
        |  FROM p
        |  UNION ALL
        |  SELECT 'c_versions', CAST(3 AS BIGINT), CAST(0 AS BIGINT),
        |    CAST(0 AS BIGINT)
        |) ORDER BY leg""".stripMargin,
    "q267_sql_catalog_read" ->
      """WITH p AS MATERIALIZED (
        |  SELECT event_id, CAST(round(value * 1e6) AS BIGINT) AS vm
        |  FROM events WHERE event_type = 'purchase')
        |SELECT * FROM (
        |  SELECT 'a_delta_current' AS leg, count(*) AS n_rows,
        |    CAST(sum(event_id) AS BIGINT) AS id_checksum,
        |    CAST(sum(CASE WHEN event_id % 6 = 0 THEN vm * 3
        |                  WHEN event_id % 3 = 0 THEN vm * 2
        |                  ELSE vm END) AS BIGINT) AS value_checksum
        |  FROM p
        |  UNION ALL
        |  SELECT 'b_delta_v1', count(*), CAST(sum(event_id) AS BIGINT),
        |    CAST(sum(CASE WHEN event_id % 3 = 0 THEN vm * 2 ELSE vm END) AS BIGINT)
        |  FROM p
        |  UNION ALL
        |  SELECT 'c_iceberg', count(*), CAST(sum(event_id) AS BIGINT),
        |    CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT)
        |  FROM events WHERE event_type IN ('purchase', 'click', 'error')
        |) ORDER BY leg""".stripMargin,
    "q268_delta_partitioned_dml" ->
      """WITH p AS MATERIALIZED (
        |  SELECT event_id, CAST(round(value * 1e6) AS BIGINT) AS vm
        |  FROM events WHERE event_type = 'purchase'),
        |c AS MATERIALIZED (
        |  SELECT event_id, CAST(round(value * 1e6) AS BIGINT) AS vm
        |  FROM events WHERE event_type = 'click'),
        |mid AS MATERIALIZED (
        |  SELECT event_id,
        |    CASE WHEN event_id % 5 = 0 THEN vm * 3
        |         WHEN event_id % 3 = 0 THEN vm * 2
        |         ELSE vm END AS vm,
        |    CASE WHEN event_id % 5 = 0 THEN 'view' ELSE 'purchase' END AS et
        |  FROM p
        |  UNION ALL SELECT event_id, vm, 'click' FROM c)
        |SELECT * FROM (
        |  SELECT 'a_final' AS leg, count(*) AS n_rows,
        |    CAST(sum(event_id) AS BIGINT) AS id_checksum,
        |    CAST(sum(vm) AS BIGINT) AS value_checksum
        |  FROM mid WHERE NOT (et = 'click' AND event_id % 7 = 0)
        |  UNION ALL
        |  SELECT 'b_mid', count(*), CAST(sum(event_id) AS BIGINT),
        |    CAST(sum(vm) AS BIGINT)
        |  FROM mid
        |) ORDER BY leg""".stripMargin,
    "q269_delta_mapped_dml" ->
      """WITH p AS MATERIALIZED (
        |  SELECT event_id, CAST(round(value * 1e6) AS BIGINT) AS vm
        |  FROM events WHERE event_type = 'purchase'),
        |c AS MATERIALIZED (
        |  SELECT event_id, CAST(round(value * 1e6) AS BIGINT) AS vm
        |  FROM events WHERE event_type = 'click'),
        |merged AS MATERIALIZED (
        |  SELECT event_id,
        |    CASE WHEN event_id % 3 = 0 THEN vm * 2 + 1 ELSE vm END AS vm,
        |    'purchase' AS et FROM p
        |  UNION ALL SELECT event_id, vm, 'click' FROM c)
        |SELECT et AS event_type, count(*) AS n_rows,
        |  CAST(sum(event_id) AS BIGINT) AS id_checksum,
        |  CAST(sum(vm) AS BIGINT) AS amount_checksum
        |FROM merged WHERE event_id % 5 <> 0
        |GROUP BY et ORDER BY et""".stripMargin,
    "q270_stream_delta_adds" ->
      """SELECT * FROM (
        |  SELECT CAST(0 AS BIGINT) AS commit_version, count(*) AS n_rows,
        |    CAST(sum(event_id) AS BIGINT) AS id_checksum,
        |    CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) AS value_checksum
        |  FROM events WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT CAST(1 AS BIGINT), count(*), CAST(sum(event_id) AS BIGINT),
        |    CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT)
        |  FROM events WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT CAST(3 AS BIGINT), count(*), CAST(sum(event_id) AS BIGINT),
        |    CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT)
        |  FROM events WHERE event_type = 'error'
        |  UNION ALL
        |  SELECT CAST(99 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
        |    CAST(0 AS BIGINT)
        |) ORDER BY commit_version""".stripMargin,
    "q266_stream_iceberg_changelog" ->
      """WITH p AS MATERIALIZED (
        |  SELECT event_id, CAST(round(value * 1e6) AS BIGINT) AS vm
        |  FROM events WHERE event_type = 'purchase'),
        |c AS MATERIALIZED (
        |  SELECT event_id, CAST(round(value * 1e6) AS BIGINT) AS vm
        |  FROM events WHERE event_type = 'click'),
        |merged AS MATERIALIZED (
        |  SELECT event_id, CASE WHEN event_id % 3 = 0 THEN vm * 2 + 1 ELSE vm END AS vm FROM p
        |  UNION ALL SELECT event_id, vm FROM c)
        |SELECT * FROM (
        |  SELECT 'insert' AS change_type, CAST(8102 AS BIGINT) AS change_snapshot_id,
        |    count(*) AS n_rows, CAST(sum(event_id) AS BIGINT) AS id_checksum,
        |    CAST(sum(vm) AS BIGINT) AS value_checksum FROM c
        |  UNION ALL
        |  SELECT 'delete', CAST(8103 AS BIGINT), count(*),
        |    CAST(sum(event_id) AS BIGINT), CAST(sum(vm) AS BIGINT)
        |  FROM p WHERE event_id % 3 = 0
        |  UNION ALL
        |  SELECT 'insert', CAST(8103 AS BIGINT), count(*),
        |    CAST(sum(event_id) AS BIGINT), CAST(sum(vm * 2 + 1) AS BIGINT)
        |  FROM p WHERE event_id % 3 = 0
        |  UNION ALL
        |  SELECT 'delete', CAST(8105 AS BIGINT), count(*),
        |    CAST(sum(event_id) AS BIGINT), CAST(sum(vm) AS BIGINT)
        |  FROM merged WHERE event_id % 5 = 0
        |  UNION ALL
        |  SELECT 'z_second_drain', CAST(9999 AS BIGINT), CAST(0 AS BIGINT),
        |    CAST(0 AS BIGINT), CAST(0 AS BIGINT)
        |) ORDER BY change_snapshot_id, change_type""".stripMargin,
    "q265_iceberg_changelog" ->
      """WITH p AS MATERIALIZED (
        |  SELECT event_id, CAST(round(value * 1e6) AS BIGINT) AS vm
        |  FROM events WHERE event_type = 'purchase'),
        |c AS MATERIALIZED (
        |  SELECT event_id, CAST(round(value * 1e6) AS BIGINT) AS vm
        |  FROM events WHERE event_type = 'click'),
        |merged AS MATERIALIZED (
        |  SELECT event_id, CASE WHEN event_id % 3 = 0 THEN vm * 2 + 1 ELSE vm END AS vm FROM p
        |  UNION ALL SELECT event_id, vm FROM c)
        |SELECT * FROM (
        |  SELECT 'insert' AS change_type, CAST(8102 AS BIGINT) AS change_snapshot_id,
        |    count(*) AS n_rows, CAST(sum(event_id) AS BIGINT) AS id_checksum,
        |    CAST(sum(vm) AS BIGINT) AS value_checksum FROM c
        |  UNION ALL
        |  SELECT 'delete', CAST(8103 AS BIGINT), count(*),
        |    CAST(sum(event_id) AS BIGINT), CAST(sum(vm) AS BIGINT)
        |  FROM p WHERE event_id % 3 = 0
        |  UNION ALL
        |  SELECT 'insert', CAST(8103 AS BIGINT), count(*),
        |    CAST(sum(event_id) AS BIGINT), CAST(sum(vm * 2 + 1) AS BIGINT)
        |  FROM p WHERE event_id % 3 = 0
        |  UNION ALL
        |  SELECT 'delete', CAST(8105 AS BIGINT), count(*),
        |    CAST(sum(event_id) AS BIGINT), CAST(sum(vm) AS BIGINT)
        |  FROM merged WHERE event_id % 5 = 0
        |) ORDER BY change_snapshot_id, change_type""".stripMargin,
    "q264_delta_mapped_write" ->
      """SELECT event_type, count(*) AS n_rows,
        |  CAST(sum(event_id) AS BIGINT) AS id_checksum,
        |  CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) AS amount_checksum
        |FROM events WHERE event_type IN ('purchase', 'click')
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q263_stream_delta_cdf" ->
      """WITH p AS MATERIALIZED (
        |  SELECT event_id, CAST(round(value * 1e6) AS BIGINT) AS vm
        |  FROM events WHERE event_type = 'purchase'),
        |c AS MATERIALIZED (
        |  SELECT event_id, CAST(round(value * 1e6) AS BIGINT) AS vm
        |  FROM events WHERE event_type = 'click'),
        |merged AS MATERIALIZED (
        |  SELECT event_id, CASE WHEN event_id % 3 = 0 THEN vm * 2 ELSE vm END AS vm FROM p
        |  UNION ALL SELECT event_id, vm FROM c)
        |SELECT * FROM (
        |  SELECT 'insert' AS change_type, CAST(2 AS BIGINT) AS commit_version,
        |    count(*) AS n_rows, CAST(sum(event_id) AS BIGINT) AS id_checksum,
        |    CAST(sum(vm) AS BIGINT) AS value_checksum FROM c
        |  UNION ALL
        |  SELECT 'update_postimage', CAST(2 AS BIGINT), count(*),
        |    CAST(sum(event_id) AS BIGINT), CAST(sum(vm * 2) AS BIGINT)
        |  FROM p WHERE event_id % 3 = 0
        |  UNION ALL
        |  SELECT 'update_preimage', CAST(2 AS BIGINT), count(*),
        |    CAST(sum(event_id) AS BIGINT), CAST(sum(vm) AS BIGINT)
        |  FROM p WHERE event_id % 3 = 0
        |  UNION ALL
        |  SELECT 'delete', CAST(3 AS BIGINT), count(*),
        |    CAST(sum(event_id) AS BIGINT), CAST(sum(vm) AS BIGINT)
        |  FROM merged WHERE event_id % 5 = 0
        |  UNION ALL
        |  SELECT 'z_second_drain', CAST(99 AS BIGINT), CAST(0 AS BIGINT),
        |    CAST(0 AS BIGINT), CAST(0 AS BIGINT)
        |) ORDER BY commit_version, change_type""".stripMargin,
    "q262_catalog_read" ->
      """SELECT count(*) AS n_rows,
        |  CAST(sum(event_id) AS BIGINT) AS id_checksum,
        |  CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) AS value_checksum
        |FROM events WHERE event_type IN ('purchase', 'click', 'error')""".stripMargin,
    "q261_iceberg_rewrite_manifests" ->
      """SELECT * FROM (
        |  SELECT 'a_rows' AS leg, count(*) AS n_rows,
        |    CAST(sum(event_id) AS BIGINT) AS id_checksum,
        |    CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) AS value_checksum
        |  FROM events WHERE event_type IN ('purchase', 'click', 'error')
        |  UNION ALL
        |  SELECT 'b_data_manifests', CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
        |  UNION ALL
        |  SELECT 'c_travel', count(*), CAST(sum(event_id) AS BIGINT),
        |    CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT)
        |  FROM events WHERE event_type IN ('purchase', 'click')
        |) ORDER BY leg""".stripMargin,
    "q260_delta_change_feed" ->
      """WITH p AS MATERIALIZED (
        |  SELECT event_id, CAST(round(value * 1e6) AS BIGINT) AS vm
        |  FROM events WHERE event_type = 'purchase'),
        |c AS MATERIALIZED (
        |  SELECT event_id, CAST(round(value * 1e6) AS BIGINT) AS vm
        |  FROM events WHERE event_type = 'click'),
        |merged AS MATERIALIZED (
        |  SELECT event_id, CASE WHEN event_id % 3 = 0 THEN vm * 2 ELSE vm END AS vm FROM p
        |  UNION ALL SELECT event_id, vm FROM c)
        |SELECT * FROM (
        |  SELECT 'insert' AS change_type, CAST(0 AS BIGINT) AS commit_version,
        |    count(*) AS n_rows, CAST(sum(event_id) AS BIGINT) AS id_checksum,
        |    CAST(sum(vm) AS BIGINT) AS value_checksum FROM p
        |  UNION ALL
        |  SELECT 'insert', CAST(2 AS BIGINT), count(*),
        |    CAST(sum(event_id) AS BIGINT), CAST(sum(vm) AS BIGINT) FROM c
        |  UNION ALL
        |  SELECT 'update_postimage', CAST(2 AS BIGINT), count(*),
        |    CAST(sum(event_id) AS BIGINT), CAST(sum(vm * 2) AS BIGINT)
        |  FROM p WHERE event_id % 3 = 0
        |  UNION ALL
        |  SELECT 'update_preimage', CAST(2 AS BIGINT), count(*),
        |    CAST(sum(event_id) AS BIGINT), CAST(sum(vm) AS BIGINT)
        |  FROM p WHERE event_id % 3 = 0
        |  UNION ALL
        |  SELECT 'delete', CAST(3 AS BIGINT), count(*),
        |    CAST(sum(event_id) AS BIGINT), CAST(sum(vm) AS BIGINT)
        |  FROM merged WHERE event_id % 5 = 0
        |) ORDER BY commit_version, change_type""".stripMargin,
    "q259_iceberg_hidden_partition_write" ->
      """WITH probe AS MATERIALIZED (
        |  SELECT user_id AS u, epoch_us(ts) // 86400000000 AS d
        |  FROM events ORDER BY user_id, ts LIMIT 1)
        |SELECT * FROM (
        |  SELECT 'a_rows' AS leg, count(*) AS n_rows,
        |    CAST(sum(event_id) AS BIGINT) AS id_checksum,
        |    CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) AS value_checksum
        |  FROM events, probe
        |  WHERE user_id = probe.u AND epoch_us(ts) // 86400000000 = probe.d
        |  UNION ALL
        |  SELECT 'b_files', CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
        |) ORDER BY leg""".stripMargin,
    "q255_iceberg_partitioned_write" ->
      """SELECT * FROM (
        |  SELECT 'a_rows' AS leg, count(*) AS n_rows,
        |    CAST(sum(event_id) AS BIGINT) AS id_checksum,
        |    CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) AS value_checksum
        |  FROM events WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT 'b_files', CAST(2 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
        |) ORDER BY leg""".stripMargin,
    "q254_iceberg_clustered_compact" ->
      """SELECT * FROM (
        |  SELECT 'a_rows' AS leg, count(*) AS n_rows,
        |    CAST(sum(event_id) AS BIGINT) AS id_checksum,
        |    CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) AS value_checksum
        |  FROM events WHERE user_id = (SELECT min(user_id) FROM events)
        |  UNION ALL
        |  SELECT 'b_files', CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
        |) ORDER BY leg""".stripMargin,
    "q253_delta_upsert" ->
      """WITH p AS MATERIALIZED (
        |  SELECT event_id, CAST(round(value * 1e6) AS BIGINT) AS vm
        |  FROM events WHERE event_type = 'purchase')
        |SELECT * FROM (
        |  SELECT 'after_upsert1' AS leg, count(*) AS n_rows,
        |    CAST(sum(event_id) AS BIGINT) AS id_checksum,
        |    CAST(sum(CASE WHEN event_id % 3 = 0 THEN vm * 2 ELSE vm END)
        |      AS BIGINT) AS value_checksum
        |  FROM p
        |  UNION ALL
        |  SELECT 'after_upsert2', count(*),
        |    CAST(sum(event_id) AS BIGINT),
        |    CAST(sum(CASE WHEN event_id % 6 = 0 THEN vm * 3
        |                  WHEN event_id % 3 = 0 THEN vm * 2
        |                  ELSE vm END) AS BIGINT)
        |  FROM p
        |) ORDER BY leg""".stripMargin,
    "q252_stream_iceberg_upsert" ->
      """WITH p AS MATERIALIZED (
        |  SELECT event_id, CAST(round(value * 1e6) AS BIGINT) AS vm
        |  FROM events WHERE event_type = 'purchase')
        |SELECT * FROM (
        |  SELECT 'a_after_b0' AS leg, count(*) AS n_rows,
        |    CAST(sum(event_id) AS BIGINT) AS id_checksum,
        |    CAST(sum(CASE WHEN event_id % 3 = 0 THEN vm * 2 ELSE vm END)
        |      AS BIGINT) AS value_checksum
        |  FROM p
        |  UNION ALL
        |  SELECT 'b_final', count(*),
        |    CAST(sum(event_id) AS BIGINT),
        |    CAST(sum(CASE WHEN event_id % 6 = 0 THEN vm * 3
        |                  WHEN event_id % 3 = 0 THEN vm * 2
        |                  ELSE vm END) AS BIGINT)
        |  FROM p
        |  UNION ALL
        |  SELECT 'c_history', CAST(3 AS BIGINT),
        |    CAST(19806 AS BIGINT), CAST(6000 AS BIGINT)
        |) ORDER BY leg""".stripMargin,
    "q250_delta_optimize" ->
      """WITH pc AS MATERIALIZED (
        |  SELECT event_id, CAST(round(value * 1e6) AS BIGINT) AS vm
        |  FROM events
        |  WHERE event_type IN ('purchase', 'click') AND event_id % 9 <> 0)
        |SELECT * FROM (
        |  SELECT 'a_pre' AS leg, count(*) AS n_rows,
        |    CAST(sum(event_id) AS BIGINT) AS id_checksum,
        |    CAST(sum(vm) AS BIGINT) AS value_checksum
        |  FROM pc
        |  UNION ALL
        |  SELECT 'b_post', count(*),
        |    CAST(sum(event_id) AS BIGINT), CAST(sum(vm) AS BIGINT)
        |  FROM pc
        |  UNION ALL
        |  SELECT 'c_files', CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
        |) ORDER BY leg""".stripMargin,
    "q251_delta_vacuum" ->
      """SELECT * FROM (
        |  SELECT 'a_current' AS leg, count(*) AS n_rows,
        |    CAST(sum(event_id) AS BIGINT) AS id_checksum,
        |    CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) AS value_checksum
        |  FROM events WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT 'b_disk', CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
        |  UNION ALL
        |  SELECT 'c_log', CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
        |) ORDER BY leg""".stripMargin,
    "q249_iceberg_metadata_tables" ->
      """WITH pc AS MATERIALIZED (
        |  SELECT event_id, event_type FROM events
        |  WHERE event_type IN ('purchase', 'click'))
        |SELECT * FROM (
        |  SELECT 'file' AS leg, CAST(0 AS BIGINT) AS k1,
        |    CAST(6501 AS BIGINT) AS k2, count(*) AS n
        |  FROM pc WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT 'file', 0, 6502, count(*) FROM pc WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT 'file', 1, 6503, count(*) FROM pc WHERE event_id % 11 = 0
        |  UNION ALL SELECT 'snap', 6501, 1000, 1
        |  UNION ALL SELECT 'snap', 6502, 2000, 1
        |  UNION ALL SELECT 'snap', 6503, 3000, 1
        |  UNION ALL SELECT 'manifest', 0, 6501, 1
        |  UNION ALL SELECT 'manifest', 0, 6502, 1
        |  UNION ALL SELECT 'manifest', 1, 6503, 1
        |) ORDER BY leg, k1, k2""".stripMargin,
    "q246_iceberg_compaction" ->
      """WITH surv AS MATERIALIZED (
        |  SELECT event_id, CAST(round(value * 1e6) AS BIGINT) AS vm
        |  FROM events
        |  WHERE event_type IN ('purchase', 'click') AND event_id % 7 <> 0)
        |SELECT * FROM (
        |  SELECT 'a_pre_compact' AS leg, count(*) AS n_rows,
        |    CAST(sum(event_id) AS BIGINT) AS id_checksum,
        |    CAST(sum(vm) AS BIGINT) AS value_checksum
        |  FROM surv
        |  UNION ALL
        |  SELECT 'b_post_compact', count(*),
        |    CAST(sum(event_id) AS BIGINT), CAST(sum(vm) AS BIGINT)
        |  FROM surv
        |  UNION ALL
        |  SELECT 'c_final', count(*),
        |    CAST(sum(event_id) AS BIGINT), CAST(sum(vm) AS BIGINT)
        |  FROM (SELECT * FROM surv
        |        UNION ALL
        |        SELECT event_id, CAST(round(value * 1e6) AS BIGINT)
        |        FROM events WHERE event_type = 'error')
        |) ORDER BY leg""".stripMargin,
    "q247_iceberg_upsert" ->
      """WITH p AS MATERIALIZED (
        |  SELECT event_id, CAST(round(value * 1e6) AS BIGINT) AS vm
        |  FROM events WHERE event_type = 'purchase')
        |SELECT * FROM (
        |  SELECT 'after_upsert1' AS leg, count(*) AS n_rows,
        |    CAST(sum(event_id) AS BIGINT) AS id_checksum,
        |    CAST(sum(CASE WHEN event_id % 3 = 0 THEN vm * 2 ELSE vm END)
        |      AS BIGINT) AS value_checksum
        |  FROM p
        |  UNION ALL
        |  SELECT 'after_upsert2', count(*),
        |    CAST(sum(event_id) AS BIGINT),
        |    CAST(sum(CASE WHEN event_id % 6 = 0 THEN vm * 3
        |                  WHEN event_id % 3 = 0 THEN vm * 2
        |                  ELSE vm END) AS BIGINT)
        |  FROM p
        |) ORDER BY leg""".stripMargin,
    "q248_iceberg_expire" ->
      """SELECT * FROM (
        |  SELECT 'current' AS leg, count(*) AS n_rows,
        |    CAST(sum(event_id) AS BIGINT) AS id_checksum,
        |    CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) AS value_checksum
        |  FROM events WHERE event_type IN ('click', 'error')
        |  UNION ALL
        |  SELECT 'history', CAST(1 AS BIGINT),
        |    CAST(6403 AS BIGINT), CAST(3000 AS BIGINT)
        |) ORDER BY leg""".stripMargin,
    "q244_delta_timestamp_travel" ->
      """WITH p AS (SELECT event_id FROM events WHERE event_type = 'purchase'),
        |pc AS (SELECT event_id FROM events
        |       WHERE event_type IN ('purchase', 'click')),
        |pce AS (SELECT event_id FROM events
        |        WHERE event_type IN ('purchase', 'click', 'error'))
        |SELECT CAST(1000 AS BIGINT) AS as_of_ms, count(*) AS n_rows,
        |  CAST(sum(event_id) AS BIGINT) AS id_checksum FROM p
        |UNION ALL
        |SELECT CAST(4999 AS BIGINT), count(*),
        |  CAST(sum(event_id) AS BIGINT) FROM p
        |UNION ALL
        |SELECT CAST(5000 AS BIGINT), count(*),
        |  CAST(sum(event_id) AS BIGINT) FROM pc
        |UNION ALL
        |SELECT CAST(999999 AS BIGINT), count(*),
        |  CAST(sum(event_id) AS BIGINT) FROM pce
        |ORDER BY as_of_ms""".stripMargin,
    "q243_iceberg_write_roundtrip" ->
      """WITH legs AS (
        |  SELECT 'full' AS leg, count(*) AS n_rows,
        |    CAST(sum(event_id) AS BIGINT) AS id_checksum,
        |    CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) AS value_checksum
        |  FROM events WHERE event_id % 3 IN (0, 1)
        |  UNION ALL
        |  SELECT 'snap1', count(*),
        |    CAST(sum(event_id) AS BIGINT),
        |    CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT)
        |  FROM events WHERE event_id % 3 = 0
        |  UNION ALL
        |  SELECT 'incr', count(*),
        |    CAST(sum(event_id) AS BIGINT),
        |    CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT)
        |  FROM events WHERE event_id % 3 = 1
        |) SELECT * FROM legs ORDER BY leg""".stripMargin,
    "q242_iceberg_incremental_read" ->
      """SELECT count(*) AS n_rows,
        |  CAST(sum(event_id) AS BIGINT) AS id_checksum,
        |  CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) AS value_checksum
        |FROM events
        |WHERE event_type IN ('signup', 'view')""".stripMargin,
    "q241_iceberg_hidden_partitioning" ->
      """SELECT count(*) AS n_rows,
        |  CAST(sum(event_id) AS BIGINT) AS id_checksum,
        |  CAST(sum(epoch_us(ts)) AS BIGINT) AS ts_checksum
        |FROM events
        |WHERE user_id = 7
        |  AND epoch_us(ts) BETWEEN 19728 * 86400000000
        |                       AND 19731 * 86400000000 - 1""".stripMargin,
    "q201_snapshot_delete" ->
      """SELECT CAST(2 AS BIGINT) AS version,
        |  (SELECT count(*) FROM events WHERE event_type = 'click') AS n_deleted,
        |  (SELECT count(*) FROM events WHERE event_type <> 'click') AS n_after,
        |  (SELECT CAST(sum(event_id) AS BIGINT) FROM events WHERE event_type <> 'click') AS id_checksum_after,
        |  (SELECT count(*) FROM events) AS n_v1,
        |  (SELECT CAST(sum(event_id) AS BIGINT) FROM events) AS id_checksum_v1""".stripMargin,
    "q202_snapshot_update" ->
      """WITH m AS (SELECT event_type, CAST(round(value * 1e6) AS BIGINT) AS vm FROM events)
        |SELECT CAST(2 AS BIGINT) AS version,
        |  (SELECT count(*) FROM m WHERE event_type = 'click') AS n_updated,
        |  (SELECT count(*) FROM m) AS n_rows,
        |  (SELECT CAST(sum(vm + CASE WHEN event_type = 'click' THEN 1000000 ELSE 0 END) AS BIGINT) FROM m) AS value_checksum_after,
        |  (SELECT CAST(sum(vm) AS BIGINT) FROM m) AS value_checksum_v1""".stripMargin,
    "q203_snapshot_merge" ->
      """WITH m AS (SELECT event_id, CAST(round(value * 1e6) AS BIGINT) AS vm FROM events),
        |fin AS (SELECT event_id,
        |  vm + CASE WHEN event_id % 5 <> 0 AND event_id % 10 = 3 THEN 5000000 ELSE 0 END AS vm
        |FROM m)
        |SELECT CAST(2 AS BIGINT) AS version,
        |  (SELECT count(*) FROM m WHERE event_id % 5 <> 0 AND event_id % 10 = 3) AS n_replaced,
        |  (SELECT count(*) FROM m WHERE event_id % 5 = 0) AS n_inserted,
        |  (SELECT count(*) FROM fin) AS n_rows,
        |  (SELECT CAST(sum(vm) AS BIGINT) FROM fin) AS value_checksum,
        |  (SELECT CAST(sum(event_id) AS BIGINT) FROM fin) AS id_checksum,
        |  (SELECT count(*) FROM m WHERE event_id % 5 <> 0) AS n_v1""".stripMargin,
    "q204_stream_merge" ->
      """WITH m AS (SELECT event_id, CAST(round(value * 1e6) AS BIGINT) AS vm FROM events),
        |fin AS (
        |  SELECT event_id,
        |    vm + CASE WHEN event_id % 6 = 0 THEN 7000000 ELSE 0 END AS vm
        |  FROM m WHERE event_id % 3 = 0
        |  UNION ALL
        |  SELECT event_id, vm FROM m WHERE event_id % 3 = 1)
        |SELECT CAST(3 AS BIGINT) AS version,
        |  (SELECT count(*) FROM fin) AS n_rows,
        |  (SELECT CAST(sum(vm) AS BIGINT) FROM fin) AS value_checksum,
        |  (SELECT CAST(sum(event_id) AS BIGINT) FROM fin) AS id_checksum""".stripMargin,
    "q205_change_feed" ->
      """WITH m AS (SELECT event_id, event_type, CAST(round(value * 1e6) AS BIGINT) AS vm FROM events),
        |ch AS (
        |  SELECT 'delete' AS _change_type, event_id, vm FROM m
        |  WHERE event_id % 4 <> 0 AND event_type = 'click'
        |  UNION ALL
        |  SELECT 'insert', event_id, vm FROM m WHERE event_id % 4 = 0)
        |SELECT _change_type, count(*) AS n,
        |  CAST(sum(event_id) AS BIGINT) AS id_checksum,
        |  CAST(sum(vm) AS BIGINT) AS value_checksum
        |FROM ch GROUP BY 1 ORDER BY _change_type""".stripMargin,
    "q206_restore_clone" ->
      """WITH p AS (SELECT event_id FROM events WHERE event_type = 'purchase')
        |SELECT CAST(3 AS BIGINT) AS restored_version,
        |  (SELECT count(*) FROM p) AS n_restored,
        |  (SELECT CAST(sum(event_id) AS BIGINT) FROM p) AS restored_checksum,
        |  (SELECT count(*) FROM p WHERE event_id % 2 <> 0) AS n_clone,
        |  (SELECT CAST(sum(event_id) AS BIGINT) FROM p WHERE event_id % 2 <> 0) AS clone_checksum""".stripMargin,
  )
}
