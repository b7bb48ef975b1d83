package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{MetadataBuilder, StructField, StructType}

/** Iceberg APPEND writer — the commit half of the interop story (the
  * Delta tier has DeltaLogWriter; this closes the asymmetry for
  * Iceberg). One call = one snapshot: id-stamped parquet data files, a
  * manifest whose entries carry REAL per-column `lower_bounds` /
  * `upper_bounds` (merged from the parquet footers the write just
  * produced — no data re-read), a manifest list that carries the
  * previous snapshot's manifests forward with their ORIGINAL
  * `added_snapshot_id`, and a new `v{N}.metadata.json` + version-hint.
  * The result is readable by [[Iceberg.read]]/[[Iceberg.readPruned]]
  * (the stats bounds prune) and by [[Iceberg.readIncremental]] (the
  * attribution is per-snapshot), and by any spec-conforming reader.
  *
  * Scope gates, all loud: single-writer only (the metadata swap is a
  * plain overwrite, not a CAS — concurrent committers need a catalog),
  * appends to delete-carrying tables refuse (compact first — carrying
  * delete manifests without their sequence semantics would corrupt
  * merge-on-read), schema must match the table's exactly (evolution is
  * a separate operation, not an append side-effect). Partitioned
  * appends support identity AND the hidden-partitioning transforms
  * (day/hour/month/year, bucket[N], truncate[W]) — values derived by
  * the same [[IcebergTransforms]] functions the reader prunes with. */
object IcebergWriter {

  /** Supported primitive mapping for table CREATION from a Spark
    * schema. Kept to the types [[Iceberg.sparkType]] round-trips. */
  private[sources] def iceType(dt: org.apache.spark.sql.types.DataType): String = dt match {
    case org.apache.spark.sql.types.BooleanType => "boolean"
    case org.apache.spark.sql.types.IntegerType => "int"
    case org.apache.spark.sql.types.LongType => "long"
    case org.apache.spark.sql.types.FloatType => "float"
    case org.apache.spark.sql.types.DoubleType => "double"
    case org.apache.spark.sql.types.StringType => "string"
    case org.apache.spark.sql.types.DateType => "date"
    case org.apache.spark.sql.types.TimestampType => "timestamptz"
    case org.apache.spark.sql.types.TimestampNTZType => "timestamp"
    case other => throw new IllegalArgumentException(
      s"cannot write Iceberg column of Spark type ${other.simpleString} — " +
        "supported: boolean/int/long/float/double/string/date/timestamp")
  }

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Writer-side metadata load: every mutation on a FORMAT-VERSION 3
    * table refuses — a v3 commit must maintain row lineage
    * (`next-row-id` / per-snapshot `first-row-id`) and the
    * deletion-vector invariants (one DV per file, DV supersedes older
    * deletes), none of which this writer implements; committing anyway
    * would produce metadata real v3 readers misread. The READ side
    * interprets v3 (deletion vectors included) — see
    * [[Iceberg.metadata]]'s gate. */
  private def writableDoc(spark: SparkSession,
                          table: String): com.fasterxml.jackson.databind.JsonNode = {
    val doc = Iceberg.metadata(spark, table)
    require(doc.path("format-version").asInt(1) <= 2,
      s"Iceberg table $table declares format-version 3 — this writer " +
        "maintains v1/v2 tables only (v3 commits must maintain row " +
        "lineage and deletion-vector invariants it does not implement); " +
        "the table stays readable, not writable")
    doc
  }

  /** The metadata document's snapshot list: (id, timestampMs, manifestList). */
  private def snapsOf(doc: com.fasterxml.jackson.databind.JsonNode): Seq[(Long, Long, String)] =
    doc.path("snapshots").elements().asScala.map { s =>
      (s.path("snapshot-id").asLong(), s.path("timestamp-ms").asLong(),
        s.path("manifest-list").asText(""))
    }.toSeq

  /** Current vN.metadata.json version number — the hint every commit
    * here steps by one. */
  private def hintVersionOf(spark: SparkSession, table: String): Int = {
    val vName = Iceberg.currentMetadataPath(spark, table).getName
      .stripSuffix(".metadata.json").stripPrefix("v")
    val digits = vName.takeWhile(_.isDigit)
    require(digits.nonEmpty,
      s"cannot derive the next metadata version from '$vName' — " +
        "this writer versions as vN.metadata.json")
    digits.toInt
  }

  /** ROLLBACK — Iceberg's `rollback_to_snapshot`, spelled the way that
    * keeps history LINEAR (the invariant every writer here relies on):
    * a NEW snapshot whose manifest list IS the target snapshot's, so
    * current serves the old state while the rolled-back-over snapshots
    * stay time-travelable. Pure metadata commit: no file is touched,
    * sequence numbers ride the reused list unchanged. The current
    * schema applies to the restored data (the reader's documented
    * swap-rename behavior — field ids make that correct). */
  def rollbackTo(spark: SparkSession, table: String, snapshotId: Long,
                 newSnapshotId: Long, timestampMs: Long): Int = {
    val doc = writableDoc(spark, table)
    require(Iceberg.partitionSpecs(doc).size <= 1,
      s"cannot roll back $table: it carries multiple partition specs " +
        "(spec evolution) — this writer re-emits only the default spec " +
        "and would misalign old manifests' spec-id resolution; refusing")
    val snaps = snapsOf(doc)
    require(snaps.exists(_._1 == snapshotId),
      s"cannot roll $table back to snapshot $snapshotId: no such " +
        s"snapshot (${snaps.map(_._1).mkString(", ")})")
    require(!snaps.exists(_._1 == newSnapshotId),
      s"snapshot id $newSnapshotId already exists in $table")
    require(snaps.forall(_._2 <= timestampMs),
      s"rollback at timestamp $timestampMs would commit BEFORE an " +
        "existing snapshot — history must be monotonic")
    val ml = Iceberg.manifestListOf(doc, table, snapshotId)
    val fields = Iceberg.currentSchemaFields(doc)
    val version = hintVersionOf(spark, table) + 1
    Iceberg.writeMetadata(spark, table, version,
      snaps :+ ((newSnapshotId, timestampMs, ml)),
      formatVersion = doc.path("format-version").asInt(1),
      schemaFieldsJson = fields.map(_.map(fd =>
        Iceberg.fieldJson(fd.id, fd.name, fd.typ)).mkString("[", ",", "]"))
        .getOrElse("[]"),
      partitionSpecJson = rawDefaultSpecFieldsJson(doc),
      lastColumnId = columnHwm(doc, fields.getOrElse(Nil)),
      failIfExists = true)
    version
  }

  /** The column-id HIGH-WATER MARK: the spec's `last-column-id`, never
    * below any id the current schema uses — what keeps a re-added name
    * from recycling a dropped column's id (and resurrecting its data). */
  private def columnHwm(doc: com.fasterxml.jackson.databind.JsonNode,
                        fields: Seq[Iceberg.IceField]): Int =
    math.max(doc.path("last-column-id").asInt(0),
      fields.map(_.id).maxOption.getOrElse(0))

  /** One carried manifest-list row, unpacked once: path/length verbatim,
    * content flag, ORIGINAL attribution (throws when absent — carrying
    * without it breaks entry-id inheritance), and the effective data
    * sequence number — its own where the prior list recorded one, else
    * 0, the spec's v1→v2 upgrade rule (pre-upgrade files sort below
    * every new delete). Every commit that carries manifests goes
    * through this ONE unpacking so the formats' sequence tiers cannot
    * diverge between writers. */
  private case class Carried(path: String, length: Long, content: Int,
                             addedSnapshotId: Long, seq: Long)

  private def carriedOf(table: String,
                        prior: Seq[org.apache.avro.generic.GenericRecord]): Seq[Carried] =
    prior.map { r =>
      Carried(
        Option(r.get("manifest_path")).map(_.toString).getOrElse(
          throw new IllegalArgumentException(
            s"manifest-list row of $table lacks manifest_path")),
        Iceberg.longField(r, "manifest_length").getOrElse(0L),
        Option(r.get("content")).map(_.toString.toInt).getOrElse(0),
        Iceberg.longField(r, "added_snapshot_id").getOrElse(
          throw new IllegalArgumentException(
            s"manifest-list row of $table lacks added_snapshot_id")),
        Iceberg.longField(r, "sequence_number").getOrElse(0L))
    }

  /** The next data sequence number: one above every carried tier. */
  private def nextSeq(carried: Seq[Carried]): Long =
    (carried.map(_.seq) :+ 0L).max + 1

  /** Append `df` as snapshot `snapshotId` at `timestampMs` (both
    * caller-supplied: commits are deterministic, replayable facts, not
    * wall-clock reads). Creates the table — metadata v1, field ids
    * 1..n from `df`'s schema — when `table` has no current metadata;
    * `partitionBy` on creation installs the named partition spec —
    * identity (`"col"`) or HIDDEN-partitioning transforms in Iceberg's
    * DDL spelling: `day(ts)`, `hour(ts)`, `month(ts)`, `year(ts)`,
    * `bucket(16, id)`, `truncate(4, s)`.
    *
    * Partitioned tables: each commit writes one file per partition
    * VALUE in the TRANSFORMED domain (a driver loop over the batch's
    * distinct transformed values, capped at
    * [[MaxPartitionValuesPerCommit]] — the per-day/per-bucket
    * cardinality hidden partitioning is for; split oversized batches by
    * committing in slices), records the transformed value in each
    * entry's `partition` struct and per-field min/max SUMMARIES on the
    * manifest-list row — exactly what [[Iceberg.readPruned]] prunes
    * manifests and files on, through [[IcebergTransforms]] on BOTH
    * sides so write and read share one spec-pinned definition of every
    * transform. Data files keep the source columns (no hive-style
    * column dropping), so reads need no partition-value
    * reconstitution. NULL partition values, unknown transforms,
    * evolved (multi-)specs and a `partitionBy` that contradicts the
    * existing spec all refuse loudly.
    * Returns the new metadata version. */
  /** CREATE an EMPTY Iceberg table: metadata v1 with the schema's field
    * ids 1..n, the named partition spec (the same DDL transform
    * spellings [[commitAppend]] accepts), and ZERO snapshots — the
    * state `CREATE TABLE` leaves behind, which the first append then
    * commits snapshot 1 into. Refuses an existing metadata directory
    * (never "re-creates" over a table). Returns the metadata version. */
  def createTable(spark: SparkSession, table: String,
                  schema: org.apache.spark.sql.types.StructType,
                  partitionBy: Seq[String] = Nil): Int = {
    val md = new Path(table, "metadata")
    require(!fs(spark, md).exists(md),
      s"Iceberg table $table already exists — refusing to re-create")
    val fields = schema.fields.zipWithIndex.map { case (sf, i) =>
      Iceberg.IceField(i + 1, sf.name, iceType(sf.dataType))
    }.toSeq
    val asked = partitionBy.map(parsePartitionBy)
    val missing = asked.map(_.sourceCol).filterNot(c => fields.exists(_.name == c))
    require(missing.isEmpty,
      s"partitionBy column(s) ${missing.mkString(", ")} are not columns " +
        s"of the schema (${fields.map(_.name).mkString(", ")})")
    val specJson = asked.zipWithIndex.map { case (a, i) =>
      Iceberg.partitionFieldJson(
        fields.find(_.name == a.sourceCol).get.id, a.fieldName,
        a.transformSpelling, fieldId = 1000 + i)
    }.mkString("[", ",", "]")
    Iceberg.writeMetadata(spark, table, 1, Seq.empty,
      formatVersion = 1,
      schemaFieldsJson = fields.map(fd =>
        Iceberg.fieldJson(fd.id, fd.name, fd.typ)).mkString("[", ",", "]"),
      partitionSpecJson = specJson,
      lastColumnId = fields.size,
      failIfExists = true)
    1
  }

  def commitAppend(spark: SparkSession, table: String, df: DataFrame,
                   snapshotId: Long, timestampMs: Long,
                   partitionBy: Seq[String] = Nil): Int = {
    // presence is decided by the metadata DIRECTORY, not by whether the
    // parse succeeds — a corrupt existing table must refuse loudly, not
    // be silently "re-created" over
    val existing: Option[com.fasterxml.jackson.databind.JsonNode] =
      if (fs(spark, new Path(table, "metadata"))
          .exists(new Path(table, "metadata")))
        Some(writableDoc(spark, table))
      else None
    val (fields, version, priorSnaps, specParts, partSpecJson) = existing match {
      case Some(doc) =>
        val f = Iceberg.currentSchemaFields(doc).getOrElse(
          throw new IllegalArgumentException(
            s"cannot append to $table: its metadata carries no schema to " +
              "validate the append against"))
        val specsAll = Iceberg.partitionSpecs(doc)
        require(specsAll.size <= 1,
          s"cannot append to $table: it carries ${specsAll.size} partition " +
            "specs (spec evolution) — this writer re-emits only the " +
            "default spec and would silently drop the others; refusing")
        val sf0 = specsAll.values.headOption.getOrElse(Nil)
        val snaps = snapsOf(doc)
        require(!snaps.exists(_._1 == snapshotId),
          s"snapshot id $snapshotId already exists in $table")
        require(snaps.forall(_._2 <= timestampMs),
          s"append at timestamp $timestampMs would commit BEFORE an " +
            s"existing snapshot (latest: ${snaps.map(_._2).maxOption.getOrElse(0L)}) " +
            "— history must be monotonic for AS-OF reads to stay sane")
        // the carried manifest list below is snaps.last's — on foreign
        // metadata with a non-linear history (current repointed by a
        // rollback that TRUNCATED nothing) that would base the append on
        // the wrong snapshot; the same linearity gate evolveSchema keeps
        val curId = doc.path("current-snapshot-id").asLong(-1L)
        require(snaps.isEmpty || snaps.last._1 == curId,
          s"cannot append to $table: current snapshot $curId is not the " +
            "latest in its history — the append would carry the wrong " +
            "manifest list; refusing non-linear histories")
        // spec field → (name, SOURCE column, parsed transform, source
        // type): the mapping is by source-id, the robust spelling; the
        // transform parses through the same table the reader's pruning
        // uses, so an unknown spelling refuses here instead of writing
        // values under semantics no reader shares
        val parts = sf0.map { sf =>
          val src = f.find(_.id == sf.sourceId).getOrElse(
            throw new IllegalArgumentException(
              s"partition spec of $table names source-id ${sf.sourceId}, " +
                "absent from the schema — corrupt metadata"))
          val t = IcebergTransforms.parse(sf.transform)
          require(t != IcebergTransforms.Opaque,
            s"cannot append to $table: partition transform " +
              s"'${sf.transform}' is unknown to this writer — deriving " +
              "values under guessed semantics would corrupt pruning")
          WritePart(sf.name, src.name, t, src.typ)
        }
        // a passed partitionBy must AGREE with the stored spec: compare
        // parsed (source column, transform), not raw spellings — the
        // stored form may use historical plurals (`days`)
        if (partitionBy.nonEmpty) {
          val asked = partitionBy.map(parsePartitionBy)
          require(asked.map(p => (p.sourceCol, p.transform)) ==
              parts.map(p => (p.sourceCol, p.transform)),
            s"partitionBy ${partitionBy.mkString("(", ", ", ")")} " +
              s"contradicts $table's spec " +
              s"${parts.map(p => s"${p.transform}(${p.sourceCol})").mkString("(", ", ", ")")} " +
              "— omit it on appends or match the spec")
        }
        (f, hintVersionOf(spark, table) + 1, snaps, parts,
          rawDefaultSpecFieldsJson(doc))
      case None =>
        val f = df.schema.fields.zipWithIndex.map { case (sf, i) =>
          Iceberg.IceField(i + 1, sf.name, iceType(sf.dataType))
        }.toSeq
        val asked = partitionBy.map(parsePartitionBy)
        val missing = asked.map(_.sourceCol).filterNot(c => f.exists(_.name == c))
        require(missing.isEmpty,
          s"partitionBy column(s) ${missing.mkString(", ")} are not " +
            s"columns of the frame (${f.map(_.name).mkString(", ")})")
        val parts = asked.map { a =>
          val src = f.find(_.name == a.sourceCol).get
          WritePart(a.fieldName, a.sourceCol, a.transform, src.typ)
        }
        val specJson = asked.zipWithIndex.map { case (a, i) =>
          Iceberg.partitionFieldJson(
            f.find(_.name == a.sourceCol).get.id, a.fieldName,
            a.transformSpelling, fieldId = 1000 + i)
        }.mkString("[", ",", "]")
        (f, 1, Seq.empty[(Long, Long, String)], parts, specJson)
    }
    require(df.columns.toSeq == fields.map(_.name),
      s"append schema ${df.columns.mkString("(", ", ", ")")} does not " +
        s"match $table's ${fields.map(_.name).mkString("(", ", ", ")")} — " +
        "schema evolution is a separate operation, not an append side-effect")

    // ---- data files: id-stamped parquet under data/ -----------------
    val typById = fields.map(fd => fd.id -> fd.typ).toMap
    val nameToId = fields.map(fd => fd.name -> fd.id).toMap
    val (entries, newSummaries) =
      if (specParts.isEmpty) {
        val files = writeIdStampedFiles(spark, table, df, fields, s"snap$snapshotId")
        (files.map(file => boundedEntry(spark, table, file, nameToId, typById)),
          Seq.empty[Iceberg.Summary])
      } else
        writePartitionedFiles(spark, table, df, fields, specParts,
          nameToId, typById, snapshotId)
    val manifest = Iceberg.writeManifest(spark, table,
      s"m-snap$snapshotId.avro", snapshotId, entries)

    // ---- manifest list: carry prior manifests with ORIGINAL ids ------
    val priorRows: Seq[org.apache.avro.generic.GenericRecord] =
      priorSnaps.lastOption match {
        case None => Nil
        case Some((_, _, mlPath)) =>
          val rows = Iceberg.readAvro(spark, Iceberg.resolve(table, mlPath))
          val bad = rows.filter(r => Option(r.get("content")).exists(_.toString != "0"))
          require(bad.isEmpty,
            s"cannot append to $table: its current snapshot lists DELETE " +
              "manifests — carrying them without their sequence semantics " +
              "would corrupt merge-on-read; compact first")
          rows
      }
    val fmtVersion = existing.map(_.path("format-version").asInt(1)).getOrElse(1)
    // a v2 list must carry sequence numbers for EVERY row (real readers
    // require them): carried rows keep their effective number, the new
    // manifest commits above them all — appending to a compacted v2
    // table must not reset its sequence tier
    val carried = carriedOf(table, priorRows)
    val allSummaries = carriedSummaries(priorRows) :+ newSummaries
    val ml = Iceberg.writeManifestList(spark, table,
      s"snap-$snapshotId.avro", snapshotId,
      carried.map(c => (c.path, c.length)) :+ manifest,
      summaries = if (allSummaries.exists(_.nonEmpty)) allSummaries else Nil,
      sequenceNumbers =
        if (fmtVersion == 2) carried.map(_.seq) :+ nextSeq(carried) else Nil,
      addedSnapshotIds = carried.map(_.addedSnapshotId) :+ snapshotId)

    // ---- metadata swap: version-file creation is the arbiter — a
    // concurrent writer landing this version first surfaces as the
    // typed conflict commitAppendOptimistic retries on ----------------
    val schemaJson = fields.map(fd =>
      Iceberg.fieldJson(fd.id, fd.name, fd.typ)).mkString("[", ",", "]")
    beforeSwapHook()
    Iceberg.writeMetadata(spark, table, version,
      priorSnaps :+ ((snapshotId, timestampMs, ml)),
      // never DOWNGRADE the format: appending to a (compacted) v2 table
      // keeps it v2 even though this commit itself uses no v2 feature
      formatVersion = fmtVersion,
      schemaFieldsJson = schemaJson,
      partitionSpecJson = partSpecJson,
      lastColumnId = existing.map(columnHwm(_, fields))
        .getOrElse(fields.map(_.id).max),
      failIfExists = true)
    version
  }

  /** Test seam for the optimistic-commit spec: invoked inside
    * [[commitAppend]] immediately before the metadata swap — a spec
    * installs a "winning writer" here to force a deterministic version
    * collision without real thread interleaving. */
  private[sources] var beforeSwapHook: () => Unit = () => ()

  /** OPTIMISTIC APPEND — Iceberg's catalog commit protocol scaled to
    * this writer's file arbiter: attempt [[commitAppend]]; when another
    * writer wins the metadata-version swap
    * (ConcurrentModificationException from the version-file check),
    * RE-RESOLVE the table — the retry re-reads current metadata, so it
    * carries the winner's manifests forward and re-validates every
    * invariant (unique snapshot id, monotonic timestamp, schema match)
    * against the MERGED state — and swap again at the next version.
    * Appends merge with any data-only winner; a winner that makes the
    * retry's validation fail (snapshot-id reuse, a LATER timestamp than
    * ours, schema drift) refuses through that validation's own loud
    * error — a true conflict, not a retry case. Data files are
    * id-stamped per `snapshotId`, so a retry overwrites its OWN
    * staging, never the winner's. */
  def commitAppendOptimistic(spark: SparkSession, table: String, df: DataFrame,
                             snapshotId: Long, timestampMs: Long,
                             partitionBy: Seq[String] = Nil,
                             maxRetries: Int = 10): Int = {
    var attempt = 0
    while (true) {
      try return commitAppend(spark, table, df, snapshotId, timestampMs, partitionBy)
      catch {
        case e: java.util.ConcurrentModificationException =>
          attempt += 1
          if (attempt > maxRetries) throw new java.util.ConcurrentModificationException(
            s"lost the Iceberg commit race $maxRetries times at $table — " +
              s"giving up (last: ${e.getMessage})")
      }
    }
    -1 // unreachable
  }

  /** INSERT OVERWRITE as a REPLACE snapshot — [[compact]]'s manifest-
    * list shape (ONLY the new manifest; prior data AND delete manifests
    * drop out of the live view, staying reachable through prior
    * snapshots for time travel) with [[commitAppend]]'s data-file
    * machinery (id-stamped, bounds-carrying, hidden-partition fan-out
    * under the stored spec). A v2 table's new list still commits ABOVE
    * the prior sequence tier — the clock a later upsert resumes from
    * must not reset. Refuses an EMPTY table (create with commitAppend)
    * and every gate commitAppend keeps (spec evolution, non-linear
    * history, schema drift, unique id, monotonic timestamp). */
  def commitOverwrite(spark: SparkSession, table: String, df: DataFrame,
                      snapshotId: Long, timestampMs: Long): Int = {
    val doc = writableDoc(spark, table)
    val fields = Iceberg.currentSchemaFields(doc).getOrElse(
      throw new IllegalArgumentException(
        s"cannot overwrite $table: its metadata carries no schema"))
    val specsAll = Iceberg.partitionSpecs(doc)
    require(specsAll.size <= 1,
      s"cannot overwrite $table: it carries ${specsAll.size} partition " +
        "specs (spec evolution) — this writer re-emits only the default spec")
    val specParts = specsAll.values.headOption.getOrElse(Nil).map { sf =>
      val src = fields.find(_.id == sf.sourceId).getOrElse(
        throw new IllegalArgumentException(
          s"partition spec of $table names source-id ${sf.sourceId}, " +
            "absent from the schema — corrupt metadata"))
      val t = IcebergTransforms.parse(sf.transform)
      require(t != IcebergTransforms.Opaque,
        s"cannot overwrite $table: partition transform '${sf.transform}' " +
          "is unknown to this writer")
      WritePart(sf.name, src.name, t, src.typ)
    }
    require(df.columns.toSeq == fields.map(_.name),
      s"overwrite schema ${df.columns.mkString("(", ", ", ")")} does not " +
        s"match $table's ${fields.map(_.name).mkString("(", ", ", ")")} — " +
        "schema evolution is a separate operation")
    val snaps = snapsOf(doc)
    require(!snaps.exists(_._1 == snapshotId),
      s"snapshot id $snapshotId already exists in $table")
    require(snaps.forall(_._2 <= timestampMs),
      s"overwrite at timestamp $timestampMs would commit BEFORE an " +
        "existing snapshot — history must be monotonic")
    val cur = doc.path("current-snapshot-id").asLong(-1L)
    require(snaps.isEmpty || snaps.last._1 == cur,
      s"cannot overwrite $table: current snapshot $cur is not the latest " +
        "in its history — refusing non-linear histories")

    val typById = fields.map(fd => fd.id -> fd.typ).toMap
    val nameToId = fields.map(fd => fd.name -> fd.id).toMap
    val (entries, newSummaries) =
      if (specParts.isEmpty) {
        val files = writeIdStampedFiles(spark, table, df, fields,
          s"overwrite$snapshotId")
        (files.map(file => boundedEntry(spark, table, file, nameToId, typById)),
          Seq.empty[Iceberg.Summary])
      } else
        writePartitionedFiles(spark, table, df, fields, specParts,
          nameToId, typById, snapshotId, tagPrefix = "overwrite",
          what = "overwrite")
    val manifest = Iceberg.writeManifest(spark, table,
      s"m-overwrite$snapshotId.avro", snapshotId, entries)
    val fmtVersion = doc.path("format-version").asInt(1)
    val seqNums =
      if (fmtVersion != 2) Nil
      else {
        // the sequence tier continues from the PRIOR list even though it
        // is dropped — the compact precedent
        val priorSeq = (cur > 0, snaps.lastOption) match {
          case (true, Some((_, _, mlPath))) => nextSeq(carriedOf(table,
            Iceberg.readAvro(spark, Iceberg.resolve(table, mlPath))))
          case _ => 1L
        }
        Seq(priorSeq)
      }
    val ml = Iceberg.writeManifestList(spark, table,
      s"snap-$snapshotId.avro", snapshotId, Seq(manifest),
      summaries = if (newSummaries.nonEmpty) Seq(newSummaries) else Nil,
      sequenceNumbers = seqNums)
    val hintVersion = hintVersionOf(spark, table)
    val schemaJson = fields.map(fd =>
      Iceberg.fieldJson(fd.id, fd.name, fd.typ)).mkString("[", ",", "]")
    Iceberg.writeMetadata(spark, table, hintVersion + 1,
      snaps :+ ((snapshotId, timestampMs, ml)),
      formatVersion = fmtVersion,
      schemaFieldsJson = schemaJson,
      partitionSpecJson = rawDefaultSpecFieldsJson(doc),
      lastColumnId = columnHwm(doc, fields),
      failIfExists = true)
    hintVersion + 1
  }

  // ------------------------------------------------- format-version 3

  /** The v3 gate's inverse: current metadata REQUIRED to be v3 (the
    * row-lineage + deletion-vector tier). */
  private def v3Doc(spark: SparkSession,
                    table: String): com.fasterxml.jackson.databind.JsonNode = {
    val doc = Iceberg.metadata(spark, table)
    require(doc.path("format-version").asInt(1) == 3,
      s"Iceberg table $table declares format-version " +
        s"${doc.path("format-version").asInt(1)} — the v3 commit paths " +
        "maintain v3 tables only (v1/v2 go through commitAppend/deleteWhere)")
    doc
  }

  /** Prior snapshots' `first-row-id` values — a v3 re-emit must carry
    * them verbatim (row-lineage history is immutable). */
  private def priorFirstRowIds(doc: com.fasterxml.jackson.databind.JsonNode)
      : Map[Long, Long] = {
    import scala.jdk.CollectionConverters._
    doc.path("snapshots").elements().asScala.flatMap { s =>
      if (s.has("first-row-id"))
        Some(s.path("snapshot-id").asLong() -> s.path("first-row-id").asLong())
      else None
    }.toMap
  }

  /** CREATE an EMPTY format-version-3 table: zero snapshots, the
    * lineage clock initialized (`next-row-id` = 0) — the state
    * [[commitAppendV3]] grows from. Unpartitioned (the v3 paths'
    * shared scope). */
  def createTableV3(spark: SparkSession, table: String,
                    schema: org.apache.spark.sql.types.StructType): Int = {
    val md = new Path(table, "metadata")
    require(!fs(spark, md).exists(md),
      s"Iceberg table $table already exists — refusing to re-create")
    val fields = schema.fields.zipWithIndex.map { case (sf, i) =>
      Iceberg.IceField(i + 1, sf.name, iceType(sf.dataType))
    }.toSeq
    Iceberg.writeMetadata(spark, table, 1, Seq.empty,
      formatVersion = 3,
      schemaFieldsJson = fields.map(fd =>
        Iceberg.fieldJson(fd.id, fd.name, fd.typ)).mkString("[", ",", "]"),
      lastColumnId = fields.size,
      failIfExists = true,
      nextRowId = Some(0L))
    1
  }

  /** v3 APPEND maintaining ROW LINEAGE — every new data file is stamped
    * with its `first_row_id` (files span
    * `[first_row_id, first_row_id + record_count)`), the snapshot
    * records its `first-row-id`, and the table's `next-row-id` advances
    * by exactly the appended row count — the spec's lineage invariants,
    * so a conformant reader derives `_row_id` = first_row_id + position
    * without any materialized column. A table UPGRADED from v2 (no
    * next-row-id yet) starts the id space at 0: its pre-v3 files carry
    * no ids (null = unassigned, the spec's upgrade posture) so the
    * ranges cannot collide. Carried manifests keep their entries' own
    * stamps; a FOREIGN list row that relied on LIST-level id
    * inheritance refuses (re-emitting it without the field would
    * silently re-number those rows). Unpartitioned v3 tables only. */
  def commitAppendV3(spark: SparkSession, table: String, df: DataFrame,
                     snapshotId: Long, timestampMs: Long): Int = {
    val doc = v3Doc(spark, table)
    val fields = Iceberg.currentSchemaFields(doc).getOrElse(
      throw new IllegalArgumentException(
        s"cannot append to $table: its metadata carries no schema"))
    require(Iceberg.partitionSpecs(doc).values.forall(_.isEmpty),
      s"cannot v3-append to $table: it is PARTITIONED and this writer's " +
        "v3 path does not derive partition metadata")
    require(df.columns.toSeq == fields.map(_.name),
      s"append schema ${df.columns.mkString("(", ", ", ")")} does not " +
        s"match $table's ${fields.map(_.name).mkString("(", ", ", ")")}")
    val snaps = snapsOf(doc)
    require(!snaps.exists(_._1 == snapshotId),
      s"snapshot id $snapshotId already exists in $table")
    require(snaps.forall(_._2 <= timestampMs),
      s"append at timestamp $timestampMs would commit BEFORE an existing " +
        "snapshot — history must be monotonic")
    val cur = doc.path("current-snapshot-id").asLong(-1L)
    require(snaps.isEmpty || snaps.last._1 == cur,
      s"cannot v3-append to $table: current snapshot $cur is not the " +
        "latest in its history — refusing non-linear histories")

    val typById = fields.map(fd => fd.id -> fd.typ).toMap
    val nameToId = fields.map(fd => fd.name -> fd.id).toMap
    val files = writeIdStampedFiles(spark, table, df, fields, s"snap$snapshotId")
    // ROW-ID assignment: a cursor from the table's next-row-id, advanced
    // file by file in publish order
    val firstRow = doc.path("next-row-id").asLong(0L)
    var cursor = firstRow
    val entries = files.map { file =>
      val e = boundedEntry(spark, table, file, nameToId, typById)
      val stamped = e.copy(firstRowId = Some(cursor))
      cursor += e.recordCount
      stamped
    }
    val manifest = Iceberg.writeManifest(spark, table,
      s"m-snap$snapshotId.avro", snapshotId, entries)
    val priorRows = snaps.lastOption.map { case (_, _, mlPath) =>
      Iceberg.readAvro(spark, Iceberg.resolve(table, mlPath))
    }.getOrElse(Nil)
    // carried list rows keep their LIST-level first_row_id VERBATIM —
    // whether this writer's own (informative; per-file stamps win) or a
    // foreign row relying on list-level inheritance
    val carriedFrid: Seq[Option[Long]] = priorRows.map(r =>
      if (r.getSchema.getField("first_row_id") == null) None
      else Option(r.get("first_row_id")).map(_.toString.toLong))
    val carried = carriedOf(table, priorRows)
    val newSeq = nextSeq(carried)
    val ml = Iceberg.writeManifestList(spark, table,
      s"snap-$snapshotId.avro", snapshotId,
      carried.map(c => (c.path, c.length)) :+ manifest,
      contents = carried.map(_.content) :+ 0,
      sequenceNumbers = carried.map(_.seq) :+ newSeq,
      addedSnapshotIds = carried.map(_.addedSnapshotId) :+ snapshotId,
      firstRowIds = carriedFrid :+ Some(firstRow))
    val hintVersion = hintVersionOf(spark, table)
    val schemaJson = fields.map(fd =>
      Iceberg.fieldJson(fd.id, fd.name, fd.typ)).mkString("[", ",", "]")
    Iceberg.writeMetadata(spark, table, hintVersion + 1,
      snaps :+ ((snapshotId, timestampMs, ml)),
      formatVersion = 3, schemaFieldsJson = schemaJson,
      partitionSpecJson = rawDefaultSpecFieldsJson(doc),
      lastColumnId = columnHwm(doc, fields),
      failIfExists = true,
      nextRowId = Some(cursor),
      snapFirstRowIds = priorFirstRowIds(doc) + (snapshotId -> firstRow))
    hintVersion + 1
  }

  /** v3 DELETE as a DELETION VECTOR — the spec's v3 posture (position-
    * delete PARQUET is v2-only): matching ACTIVE rows' positions land as
    * `deletion-vector-v1` blobs in ONE puffin file, one blob per touched
    * data file, addressed by a content-1 manifest whose entries carry
    * `referenced_data_file` + `content_offset`/`content_size_in_bytes` —
    * exactly the layout the q272 READ path decodes. The spec's
    * one-DV-per-file invariant holds: a file that already carries a DV
    * gets a UNION blob (old ∪ new positions) and the superseded entry is
    * dropped from the carried delete manifest (re-emitted as EXISTING
    * without it; an emptied manifest drops from the list). Row lineage
    * rides through unchanged: a delete assigns no ids, so the snapshot's
    * first-row-id equals the table's next-row-id (a zero-width range).
    *
    * Scale note: per-file position arrays fold on EXECUTORS
    * (collect_list under a file-keyed aggregate), but the roaring-bitmap
    * blobs return to the DRIVER to be framed into one puffin — bounded
    * by a loud 5M-matched-positions cap; a larger purge wants compact()
    * or the v2 parquet path. Zero matches commit nothing. */
  def deleteWhereV3(spark: SparkSession, table: String,
                    predicate: org.apache.spark.sql.Column,
                    snapshotId: Long, timestampMs: Long): Int = {
    import org.apache.spark.sql.functions.{broadcast, col, collect_list, concat_ws, lit, raise_error, sort_array, when}
    val doc = v3Doc(spark, table)
    val fields = Iceberg.currentSchemaFields(doc).getOrElse(
      throw new IllegalArgumentException(
        s"cannot delete from $table: its metadata carries no schema"))
    require(Iceberg.partitionSpecs(doc).values.forall(_.isEmpty),
      s"cannot v3-delete from $table: it is PARTITIONED and this writer " +
        "does not derive partition metadata for delete manifests")
    val reservedDel = Set("file_path", "pos", "__ice_norm_fp", "__ice_manifest_fp")
    require(!fields.exists(f => reservedDel(f.name)),
      s"cannot v3-delete from $table: a table column collides with the " +
        "DV spelling-join internals; rename it first")
    val cur = doc.path("current-snapshot-id").asLong(-1L)
    if (cur <= 0) throw new EmptyTableException(
      s"Iceberg table $table has no current snapshot")
    val snaps = snapsOf(doc)
    require(!snaps.exists(_._1 == snapshotId),
      s"snapshot id $snapshotId already exists in $table")
    require(snaps.forall(_._2 <= timestampMs),
      s"delete at timestamp $timestampMs would commit BEFORE an existing " +
        "snapshot — history must be monotonic")
    require(snaps.isEmpty || snaps.last._1 == cur,
      s"cannot v3-delete from $table: current snapshot $cur is not the " +
        "latest in its history — refusing non-linear histories")
    val mlPath = Iceberg.manifestListOf(doc, table, cur)
    val planned = Iceberg.listLiveFiles(spark, table, mlPath, cur)
    require(planned.eqDeletes.isEmpty,
      s"cannot v3-delete from $table: it carries EQUALITY delete files — " +
        "compact them away first")
    require(planned.deletes.isEmpty,
      s"cannot v3-delete from $table: it carries v2 position-delete " +
        "PARQUET — compact to a clean v3 state first")
    if (planned.data.isEmpty) throw new EmptyTableException(
      s"Iceberg table $table has no live data files")

    // matching ACTIVE rows (the MoR read subtracts existing DVs), as
    // (manifest-spelled file_path, position) — the deleteWhere spelling
    val spellRows = planned.data.map { case (p, _) =>
      (Iceberg.normPathDriver(p), planned.spelledAs.getOrElse(p, p))
    }.distinct
    val spellDf = spark.createDataFrame(spellRows)
      .toDF("__ice_norm_fp", "__ice_manifest_fp")
    // the RAW coordinate scan ([[deleteWhere]]'s spelling — `_metadata`
    // does not survive read()'s MoR joins): previously-DV-killed rows
    // may match again, and the union blob keeps them dead (idempotent)
    val matches = Iceberg
      .readWithMetadataSchema(spark, fields, planned.data.map(_._1))
      .select(col("*"),
        Iceberg.normPath(col("_metadata.file_path")).as("__ice_norm_fp"),
        col("_metadata.row_index").as("pos"))
      .where(predicate)
      .join(broadcast(spellDf), Seq("__ice_norm_fp"), "left")
      .select(
        when(col("__ice_manifest_fp").isNull,
          raise_error(concat_ws("", lit("DV path mapping miss: no planned " +
            "data file spells "), col("__ice_norm_fp"))))
          .otherwise(col("__ice_manifest_fp")).as("file_path"),
        col("pos"))
      .persist()
    try {
      val n = matches.count()
      val hintVersion = hintVersionOf(spark, table)
      if (n == 0) return hintVersion
      require(n <= 5000000L,
        s"v3 DV delete on $table matches $n rows — past the 5M-position " +
          "driver bound this path frames puffin blobs under; compact the " +
          "table (rewriting survivors) instead of DV-killing that much")
      // per-file sorted positions fold on executors; only the per-file
      // arrays return (O(#touched files) rows)
      import spark.implicits._
      val newByFile: Map[String, Array[Long]] = matches
        .groupBy(col("file_path"))
        .agg(sort_array(collect_list(col("pos"))).as("positions"))
        .as[(String, Array[Long])].collect().toMap
      // union with EXISTING DVs (the one-DV-per-file supersede rule);
      // old blobs decode through the same codec the reader uses
      val oldByFile: Map[String, Array[Long]] = {
        val conf = spark.sessionState.newHadoopConf()
        planned.dvs.filter(d => newByFile.contains(d.referencedDataFile))
          .map { d =>
            val p = new Path(d.puffin)
            val dfs = p.getFileSystem(conf)
            val bytes = new Array[Byte](dfs.getFileStatus(p).getLen.toInt)
            val in = dfs.open(p)
            try in.readFully(bytes) finally in.close()
            d.referencedDataFile -> Iceberg.icebergDvPositions(bytes, d)
          }.toMap
      }
      val touched = newByFile.keys.toSeq.sorted
      val blobs = touched.map { file =>
        val union = (newByFile(file) ++ oldByFile.getOrElse(file, Array.empty))
          .distinct.sorted
        (Iceberg.dvBlob(union), file, union.length.toLong)
      }
      val priorRows = Iceberg.readAvro(spark, Iceberg.resolve(table, mlPath))
      val carried0 = carriedOf(table, priorRows)
      // list-level first_row_id carried VERBATIM (the commitAppendV3 rule)
      val frid0: Seq[Option[Long]] = priorRows.map(r =>
        if (r.getSchema.getField("first_row_id") == null) None
        else Option(r.get("first_row_id")).map(_.toString.toLong))
      val newSeq = nextSeq(carried0)
      val (puffin, spans) = Iceberg.writePuffin(spark, table,
        s"dv-snap$snapshotId.puffin",
        blobs.map { case (b, file, _) => (b, file) }, snapshotId, newSeq)
      val dvManifest = Iceberg.writeManifest(spark, table,
        s"m-dv$snapshotId.avro", snapshotId,
        blobs.zip(spans).map { case ((_, file, card), (off, len)) =>
          Iceberg.Entry(puffin, status = 1, content = 1, format = "PUFFIN",
            sequenceNumber = Some(newSeq), recordCount = card,
            fileSizeBytes = fs(spark, new Path(puffin))
              .getFileStatus(new Path(puffin)).getLen,
            referencedDataFile = Some(file),
            contentOffset = Some(off), contentSizeInBytes = Some(len))
        })
      // carried manifests: data rows verbatim; DELETE rows shed entries
      // superseded by this commit's union blobs (one DV per file)
      val touchedSet = touched.toSet
      val keptRows = scala.collection.mutable.ArrayBuffer
        .empty[(String, Long, Int, Long, Long, Option[Long])]
      carried0.zipWithIndex.foreach { case (c, i) =>
        if (c.content == 0)
          keptRows += ((c.path, c.length, 0, c.addedSnapshotId, c.seq, frid0(i)))
        else {
          val es = Iceberg.readAvro(spark, Iceberg.resolve(table, c.path))
          val (dropped, kept) = es.partition { e =>
            val df0 = e.get("data_file").asInstanceOf[org.apache.avro.generic.GenericRecord]
            df0 != null && df0.getSchema.getField("referenced_data_file") != null &&
              Option(df0.get("referenced_data_file")).map(_.toString)
                .exists(touchedSet.contains)
          }
          if (dropped.isEmpty)
            keptRows += ((c.path, c.length, 1, c.addedSnapshotId, c.seq, frid0(i)))
          else if (kept.nonEmpty) {
            // re-emit the survivors as EXISTING under their original
            // attribution (the rewriteManifests discipline)
            val survivors = kept.map { e =>
              val df0 = e.get("data_file").asInstanceOf[org.apache.avro.generic.GenericRecord]
              def ol(k: String): Option[Long] = Iceberg.longField(df0, k)
              Iceberg.Entry(
                Option(df0.get("file_path")).map(_.toString).getOrElse(
                  throw new IllegalArgumentException(
                    s"delete manifest ${c.path}: entry lacks file_path")),
                status = 0, content = 1,
                format = Option(df0.get("file_format")).map(_.toString).getOrElse("PUFFIN"),
                sequenceNumber = Iceberg.longField(e, "sequence_number")
                  .orElse(Some(c.seq)),
                recordCount = ol("record_count").getOrElse(0L),
                fileSizeBytes = ol("file_size_in_bytes").getOrElse(0L),
                snapshotIdOverride = Iceberg.longField(e, "snapshot_id")
                  .orElse(Some(c.addedSnapshotId)),
                referencedDataFile = Option(df0.get("referenced_data_file")).map(_.toString),
                contentOffset = ol("content_offset"),
                contentSizeInBytes = ol("content_size_in_bytes"))
            }
            val (rp, rl) = Iceberg.writeManifest(spark, table,
              s"m-dvkeep$snapshotId-$i.avro", snapshotId, survivors)
            keptRows += ((rp, rl, 1, c.addedSnapshotId, c.seq, None))
          } // kept empty: the whole manifest superseded — drop the row
        }
      }
      val ml = Iceberg.writeManifestList(spark, table,
        s"snap-$snapshotId.avro", snapshotId,
        keptRows.toSeq.map(r => (r._1, r._2)) :+ dvManifest,
        contents = keptRows.toSeq.map(_._3) :+ 1,
        sequenceNumbers = keptRows.toSeq.map(_._5) :+ newSeq,
        addedSnapshotIds = keptRows.toSeq.map(_._4) :+ snapshotId,
        firstRowIds = keptRows.toSeq.map(_._6) :+ None)
      val schemaJson = fields.map(fd =>
        Iceberg.fieldJson(fd.id, fd.name, fd.typ)).mkString("[", ",", "]")
      val nextRow = doc.path("next-row-id").asLong(0L)
      Iceberg.writeMetadata(spark, table, hintVersion + 1,
        snaps :+ ((snapshotId, timestampMs, ml)),
        formatVersion = 3, schemaFieldsJson = schemaJson,
        partitionSpecJson = rawDefaultSpecFieldsJson(doc),
        lastColumnId = columnHwm(doc, fields),
        failIfExists = true,
        nextRowId = Some(nextRow),
        snapFirstRowIds = priorFirstRowIds(doc) + (snapshotId -> nextRow))
      hintVersion + 1
    } finally matches.unpersist()
  }

  /** SCHEMA EVOLUTION — pure metadata swaps (no snapshot, no data
    * touched): the schema is a list of (id, name, type) and every read
    * resolves columns by FIELD ID, so renames serve old files under new
    * names, added columns null-fill files that predate them, and a
    * re-added name gets a FRESH id — dropped data never resurrects
    * under a recycled name (the spec's id-not-name core). Time travel
    * note, inherited from the reader: the CURRENT schema applies to
    * every snapshot (per-snapshot schema-ids are not tracked — the
    * documented swap-rename behavior). */
  def addColumn(spark: SparkSession, table: String,
                name: String, typ: String): Int = {
    Iceberg.sparkType(typ) // validates the type name, loudly
    evolveSchema(spark, table, s"add column $name") { (fields, hwm, _) =>
      require(!fields.exists(_.name == name),
        s"cannot add column '$name' to $table: the name is taken " +
          s"(${fields.map(_.name).mkString(", ")})")
      // hwm + 1, NOT max(current)+1: a dropped column's id must never
      // be recycled or its dead data resurrects under the new name
      fields :+ Iceberg.IceField(hwm + 1, name, typ)
    }
  }

  def renameColumn(spark: SparkSession, table: String,
                   from: String, to: String): Int =
    evolveSchema(spark, table, s"rename $from to $to") { (fields, _, _) =>
      require(fields.exists(_.name == from),
        s"cannot rename '$from' in $table: no such column " +
          s"(${fields.map(_.name).mkString(", ")})")
      require(!fields.exists(_.name == to),
        s"cannot rename '$from' to '$to' in $table: the target name is taken")
      fields.map(f => if (f.name == from) f.copy(name = to) else f)
    }

  def dropColumn(spark: SparkSession, table: String, name: String): Int =
    evolveSchema(spark, table, s"drop column $name") { (fields, _, doc) =>
      val f = fields.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"cannot drop '$name' from $table: no such column " +
            s"(${fields.map(_.name).mkString(", ")})"))
      val specSources = Iceberg.partitionSpecs(doc).values.flatten
        .map(_.sourceId).toSet
      require(!specSources.contains(f.id),
        s"cannot drop '$name' from $table: it is a partition-spec " +
          "source column — pruning metadata would dangle")
      // live EQUALITY deletes name their key columns by field id; a
      // dropped id is unresolvable (and the re-add gets a FRESH id by
      // design), so every later read of the table would throw — brick
      val cur = doc.path("current-snapshot-id").asLong(-1L)
      if (cur > 0) {
        val eqIds = Iceberg.listLiveFiles(spark, table,
          Iceberg.manifestListOf(doc, table, cur), cur)
          .eqDeletes.flatMap(_._3).toSet
        require(!eqIds.contains(f.id),
          s"cannot drop '$name' from $table: live EQUALITY delete files " +
            "reference its field id — the table would become unreadable; " +
            "compact first")
      }
      require(fields.size > 1,
        s"cannot drop '$name' from $table: it is the only column")
      fields.filterNot(_.id == f.id)
    }

  /** Shared metadata swap for the three evolution ops: same snapshots,
    * spec and format version, new schema, next metadata version. */
  private def evolveSchema(spark: SparkSession, table: String, what: String)
                          (evolve: (Seq[Iceberg.IceField], Int,
                            com.fasterxml.jackson.databind.JsonNode) => Seq[Iceberg.IceField]): Int = {
    val doc = writableDoc(spark, table)
    val fields = Iceberg.currentSchemaFields(doc).getOrElse(
      throw new IllegalArgumentException(
        s"cannot $what in $table: its metadata carries no schema"))
    // same rewrite-scope gates as commitAppend's metadata path: a
    // multi-spec table would lose its non-default specs (and renumber
    // the default, mis-aligning positional summary pruning), and a
    // rolled-back current pointer would be silently repointed to last
    require(Iceberg.partitionSpecs(doc).size <= 1,
      s"cannot $what in $table: it carries multiple partition specs " +
        "(spec evolution) — this writer re-emits only the default spec " +
        "and would silently drop the others; refusing")
    val snaps = snapsOf(doc)
    val cur = doc.path("current-snapshot-id").asLong(-1L)
    require(snaps.isEmpty || snaps.last._1 == cur,
      s"cannot $what in $table: current snapshot $cur is not the latest " +
        "in its history — the metadata rewrite would repoint current; " +
        "refusing non-linear histories")
    val hwm = columnHwm(doc, fields)
    val next = evolve(fields, hwm, doc)
    val version = hintVersionOf(spark, table) + 1
    Iceberg.writeMetadata(spark, table, version, snaps,
      formatVersion = doc.path("format-version").asInt(1),
      schemaFieldsJson = next.map(fd =>
        Iceberg.fieldJson(fd.id, fd.name, fd.typ)).mkString("[", ",", "]"),
      partitionSpecJson = rawDefaultSpecFieldsJson(doc),
      lastColumnId = math.max(hwm, next.map(_.id).maxOption.getOrElse(0)),
      failIfExists = true)
    version
  }

  /** Identity-partition cardinality a single commit will fan out to —
    * one driver-coordinated filtered write per VALUE (per-day /
    * per-category scale); past this, the partitioning itself is the
    * design error, not the cap. */
  val MaxPartitionValuesPerCommit = 256

  /** One partition-spec field the WRITE path derives values for: the
    * spec field name, the source column, the parsed transform, and the
    * source column's iceberg type. */
  private case class WritePart(name: String, sourceCol: String,
                               transform: IcebergTransforms.Transform,
                               sourceTyp: String)

  /** A parsed `partitionBy` element. */
  private case class AskedPart(sourceCol: String,
                               transform: IcebergTransforms.Transform,
                               transformSpelling: String, fieldName: String)

  private val TemporalFnPat = """(day|hour|month|year)\s*\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*\)""".r
  private val WidthFnPat = """(bucket|truncate)\s*\(\s*(\d+)\s*,\s*([A-Za-z_][A-Za-z0-9_]*)\s*\)""".r

  /** `partitionBy` spellings — the SQL-ish transform forms Iceberg DDL
    * uses: `col` (identity), `day(col)` / `hour(col)` / `month(col)` /
    * `year(col)`, `bucket(N, col)`, `truncate(W, col)`. Spec field names
    * follow Iceberg's defaults (`col_day`, `col_bucket`, `col_trunc`). */
  private def parsePartitionBy(s: String): AskedPart = s.trim match {
    case TemporalFnPat(fn, c) =>
      AskedPart(c, IcebergTransforms.parse(fn), fn, s"${c}_$fn")
    case WidthFnPat(fn, n, c) =>
      val spelling = s"$fn[$n]"
      val suffix = if (fn == "bucket") "bucket" else "trunc"
      AskedPart(c, IcebergTransforms.parse(spelling), spelling, s"${c}_$suffix")
    case c if c.matches("[A-Za-z_][A-Za-z0-9_]*") =>
      AskedPart(c, IcebergTransforms.Identity, "identity", c)
    case other => throw new IllegalArgumentException(
      s"cannot parse partitionBy element '$other' — expected a column " +
        "name, day(col)/hour(col)/month(col)/year(col), bucket(N, col) " +
        "or truncate(W, col)")
  }

  /** The TRANSFORMED-domain iceberg type a partition field's values and
    * summary bounds decode under — mirrors the reader's
    * [[IcebergTransforms.transformedRange]] result types so pruning on
    * self-written metadata round-trips exactly. */
  private def resultTyp(t: IcebergTransforms.Transform, sourceTyp: String): String =
    t match {
      case IcebergTransforms.Identity => sourceTyp
      case IcebergTransforms.Day => "date"
      case IcebergTransforms.Hour | IcebergTransforms.Month |
           IcebergTransforms.Year => "int"
      case IcebergTransforms.Bucket(_) => "int"
      case IcebergTransforms.Truncate(_) => sourceTyp
      case other => throw new IllegalArgumentException(
        s"no write-side result type for transform $other")
    }

  /** Spark column computing a spec field's partition VALUE for every
    * row — spec-exact by construction: every non-identity value is
    * produced by the same [[IcebergTransforms]] functions the reader's
    * pruning maps predicate ranges through (murmur3 bucket, floorDiv
    * temporal buckets, codepoint truncate), wrapped in a UDF. A UDF is
    * the right tool here: the projection runs once per appended row
    * inside a write job (map-side, no shuffle), and bit-identical
    * write/read transform semantics matter more than codegen on this
    * path. The source column is first normalized into the transform's
    * comparison domain with BUILT-INS (unix_micros/unix_date), so the
    * UDF only ever sees Long or String. */
  private def transformedCol(p: WritePart): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{col, udf, unix_date, unix_micros}
    val longFamily = Set("int", "long", "date", "timestamptz")
    def normalized: org.apache.spark.sql.Column = p.sourceTyp match {
      case "int" => col(p.sourceCol).cast("long")
      case "long" => col(p.sourceCol)
      case "date" => unix_date(col(p.sourceCol)).cast("long")
      case "timestamptz" => unix_micros(col(p.sourceCol))
      case "string" => col(p.sourceCol)
      case other => throw new IllegalArgumentException(
        s"partition source column '${p.sourceCol}' has iceberg type " +
          s"$other — this writer derives partition values from " +
          "int/long/date/timestamptz/string sources only (timestamp " +
          "without zone has no unambiguous micros spelling here)")
    }
    def requireMicros(what: String): Unit = require(p.sourceTyp == "timestamptz",
      s"$what needs a timestamptz source, got ${p.sourceTyp} " +
        s"(column '${p.sourceCol}')")
    p.transform match {
      case IcebergTransforms.Identity =>
        // date rides the Day-transform encoding exactly (epoch-day longs
        // in the transformed domain; the manifest typing keys off
        // resultTyp, which is "date" for both)
        require(Set("long", "string", "date")(p.sourceTyp),
          s"identity partition column '${p.sourceCol}' has type " +
            s"${p.sourceTyp} — this writer derives long/string/date " +
            "identity values only (an int column would need the spec's " +
            "4-byte struct/bounds typing; cast to long first)")
        normalized
      case IcebergTransforms.Day => p.sourceTyp match {
        case "date" => normalized // already day-granular
        case _ =>
          requireMicros("day()")
          udf((us: Long) => IcebergTransforms.dayFromMicros(us)).apply(normalized)
      }
      case IcebergTransforms.Hour =>
        requireMicros("hour()")
        udf((us: Long) => IcebergTransforms.hourFromMicros(us)).apply(normalized)
      case IcebergTransforms.Month => p.sourceTyp match {
        case "date" =>
          udf((d: Long) => IcebergTransforms.monthFromDays(d)).apply(normalized)
        case _ =>
          requireMicros("month()")
          udf((us: Long) => IcebergTransforms.monthFromMicros(us)).apply(normalized)
      }
      case IcebergTransforms.Year => p.sourceTyp match {
        case "date" =>
          udf((d: Long) => IcebergTransforms.yearFromDays(d)).apply(normalized)
        case _ =>
          requireMicros("year()")
          udf((us: Long) => IcebergTransforms.yearFromMicros(us)).apply(normalized)
      }
      case IcebergTransforms.Bucket(n) =>
        val typ = p.sourceTyp
        if (typ == "string")
          udf((s: String) => IcebergTransforms.bucket(n, "string", s)).apply(normalized)
        else {
          require(longFamily(typ),
            s"bucket[$n] over iceberg type $typ is not defined " +
              s"(column '${p.sourceCol}')")
          udf((v: Long) => IcebergTransforms.bucket(n, typ, v)).apply(normalized)
        }
      case IcebergTransforms.Truncate(w) =>
        if (p.sourceTyp == "string") {
          require(w <= Int.MaxValue, s"truncate[$w] on a string column")
          udf((s: String) => IcebergTransforms.truncateString(w.toInt, s)).apply(normalized)
        } else {
          require(Set("int", "long")(p.sourceTyp),
            s"truncate[$w] over iceberg type ${p.sourceTyp} is not " +
              s"defined (column '${p.sourceCol}')")
          udf((v: Long) => IcebergTransforms.truncateLong(w, v)).apply(normalized)
        }
      case other => throw new IllegalArgumentException(
        s"partition transform $other is not derivable by this writer " +
          s"(column '${p.sourceCol}') — supported: identity, day, hour, " +
          "month, year, bucket[N], truncate[W]")
    }
  }

  /** Per-value filtered writes for a (hidden-)partitioned append:
    * derives each spec field's TRANSFORMED value per row, fans one
    * filtered write out per distinct transformed tuple, and returns the
    * bounds-carrying entries (each stamped with its `partition` struct
    * in the transformed domain) plus the per-spec-field min/max
    * [[Iceberg.Summary]] row for the manifest list — exactly what the
    * reader's three-tier pruning consumes. */
  private def writePartitionedFiles(spark: SparkSession, table: String,
      df: DataFrame, fields: Seq[Iceberg.IceField],
      parts: Seq[WritePart],
      nameToId: Map[String, Int], typById: Map[Int, String],
      snapshotId: Long,
      // equality-delete fan-out (partitioned upsert) reuses this whole
      // path with a delete tag/content — the entries become
      // partition-scoped v2 equality deletes instead of data files
      tagPrefix: String = "snap", content: Int = 0,
      equalityIds: Seq[Int] = Nil,
      // `what` names the caller's OPERATION in refusals; `precomputed`
      // skips the distinct+collect when the caller already derived the
      // tuple set (upsert's two fan-outs share one — sources ⊆ keys)
      what: String = "append to",
      precomputed: Option[Seq[Seq[Any]]] = None,
      // partitioned compaction sorts each partition's single output file
      // on these columns (row-group-level pruning inside the file; the
      // file-level bounds are per-partition either way)
      sortWithin: Seq[String] = Nil)
      : (Seq[Iceberg.Entry], Seq[Iceberg.Summary]) = {
    import org.apache.spark.sql.functions.lit
    val tCols = parts.map(transformedCol)
    // limit BEFORE collect: the cap must fire without materializing a
    // high-cardinality mistake on the driver
    val distinctVals: Seq[Seq[Any]] = precomputed.getOrElse(df
      .select(tCols.zip(parts).map { case (c, p) => c.as(p.name) }: _*)
      .distinct()
      .limit(MaxPartitionValuesPerCommit + 1)
      .collect().map(_.toSeq).toSeq)
    require(distinctVals.size <= MaxPartitionValuesPerCommit,
      s"$what $table spans more than $MaxPartitionValuesPerCommit " +
        "distinct partition values — past the per-commit cap (one " +
        "driver-coordinated write per value); commit in slices or " +
        "partition coarser")
    // an empty batch commits an empty snapshot, like the unpartitioned
    // path — no values, no files, no summaries (absent = unknown = sound)
    if (distinctVals.isEmpty)
      return (Seq.empty[Iceberg.Entry], Seq.empty[Iceberg.Summary])
    require(!distinctVals.exists(_.exists(_ == null)),
      s"$what $table has NULL partition value(s) in " +
        s"${parts.map(_.sourceCol).mkString("(", ", ", ")")} — the " +
        "summary/pruning semantics of null partitions are not " +
        "implemented; filter or default them first")
    def norm(v: Any): Any = v match {
      case i: java.lang.Integer => i.longValue
      case l: java.lang.Long => l.longValue
      case s: String => s
      case other => throw new IllegalStateException(
        s"unexpected partition value class ${other.getClass.getName}")
    }
    val entries = distinctVals
      .sortBy(_.map(String.valueOf).mkString("\u0000")).zipWithIndex
      .flatMap { case (vals, pi) =>
        // filter on the RECOMPUTED transformed column so the written
        // frame keeps exactly the table schema (no helper column to drop)
        val pred = tCols.zip(vals)
          .map { case (c, v) => c === lit(v) }.reduce(_ && _)
        val slice0 = df.where(pred).coalesce(1)
        val slice =
          if (sortWithin.isEmpty) slice0
          else slice0.sortWithinPartitions(
            sortWithin.map(org.apache.spark.sql.functions.col): _*)
        val files = writeIdStampedFiles(spark, table,
          slice, fields, s"$tagPrefix$snapshotId-p$pi")
        val pvals: Seq[(String, Any)] =
          parts.map(_.name).zip(vals.map(norm))
        files.map(f => boundedEntry(spark, table, f, nameToId, typById,
            content = content, equalityIds = equalityIds)
          .copy(partition = pvals))
      }
    def encodeVal(t: String, v: Any): Array[Byte] = t match {
      case "string" => Iceberg.encodeString(v.toString)
      // 8-byte bounds under int-typed partition fields ride the
      // reader's documented int→long promotion (decodeBound takes both)
      case _ => Iceberg.encodeLong(v.asInstanceOf[Long])
    }
    val summaries = parts.zipWithIndex.map { case (p, i) =>
      val t = resultTyp(p.transform, p.sourceTyp)
      val vs = distinctVals.map(r => norm(r(i)))
      val (lo, hi) = t match {
        case "string" =>
          val ss = vs.map(_.toString); (ss.min: Any, ss.max: Any)
        case _ =>
          val ls = vs.map(_.asInstanceOf[Long]); (ls.min: Any, ls.max: Any)
      }
      Iceberg.Summary(Some(encodeVal(t, lo)), Some(encodeVal(t, hi)))
    }
    (entries, summaries)
  }

  /** The default partition spec's raw `fields` JSON, verbatim from the
    * metadata document — re-emitted on append so the spec (including
    * its field-ids) survives the metadata rewrite byte-faithfully. */
  private def rawDefaultSpecFieldsJson(
      doc: com.fasterxml.jackson.databind.JsonNode): String = {
    val v2 = doc.path("partition-specs")
    if (v2.isArray && v2.size() > 0) {
      val defId = doc.path("default-spec-id").asInt(0)
      v2.elements().asScala.find(_.path("spec-id").asInt(0) == defId)
        .map(_.path("fields").toString).getOrElse(
          throw new IllegalArgumentException(
            s"metadata names default-spec-id $defId but partition-specs " +
              "carries no such spec — corrupt metadata; refusing to " +
              "re-emit a spec-less document over a partitioned table"))
    } else {
      val v1 = doc.path("partition-spec")
      if (v1.isArray) v1.toString else "[]"
    }
  }

  /** Carried manifest-list rows' partition summaries, re-packed for the
    * new list (a carry must not silently drop the pruning metadata the
    * prior commit recorded). Rows without the field carry none. */
  private def carriedSummaries(
      prior: Seq[org.apache.avro.generic.GenericRecord]): Seq[Seq[Iceberg.Summary]] =
    prior.map { r =>
      if (r.getSchema.getField("partitions") == null) Nil
      else r.get("partitions") match {
        case a: java.util.Collection[_] => a.asScala.toSeq.map { x =>
          val sr = x.asInstanceOf[org.apache.avro.generic.GenericRecord]
          Iceberg.Summary(Iceberg.avroBytes(sr.get("lower_bound")),
            Iceberg.avroBytes(sr.get("upper_bound")),
            Option(sr.get("contains_null")).exists(_.toString.toBoolean))
        }
        case _ => Nil
      }
    }

  /** Row-level DELETE committed as a v2 POSITION-delete snapshot — the
    * Iceberg twin of `DeltaLogWriter.deleteWhere` (q240): no data file
    * is rewritten; one delete parquet names the matching rows' spec
    * coordinates (`file_path`, `pos` — `_metadata.file_path` /
    * `row_index` ARE those coordinates), a delete manifest (content 1)
    * carries it, and the new manifest list keeps every prior manifest
    * with its original attribution and content. The metadata steps to
    * format-version 2 (position deletes are a v2 feature). Zero matches
    * commit nothing and return the current version — the Delta twin's
    * no-op contract. Scope gates mirror commitAppend's: unpartitioned,
    * no equality deletes already present (their sequence gating is read
    * machinery this writer does not produce), schema from metadata. */
  def deleteWhere(spark: SparkSession, table: String,
                  predicate: org.apache.spark.sql.Column,
                  snapshotId: Long, timestampMs: Long): Int = {
    import org.apache.spark.sql.functions.col
    val doc = writableDoc(spark, table)
    val fields = Iceberg.currentSchemaFields(doc).getOrElse(
      throw new IllegalArgumentException(
        s"cannot delete from $table: its metadata carries no schema"))
    require(Iceberg.partitionSpecs(doc).values.forall(_.isEmpty),
      s"cannot delete from $table: it is PARTITIONED and this writer " +
        "does not derive partition metadata for delete files")
    val reservedDel = Set("file_path", "pos", "__ice_norm_fp", "__ice_manifest_fp")
    require(!fields.exists(f => reservedDel(f.name)),
      s"cannot delete from $table: a table column is named one of " +
        s"${reservedDel.toSeq.sorted.mkString(", ")} — colliding with the " +
        "position-delete schema / spelling-join internals; rename it first")
    val cur = doc.path("current-snapshot-id").asLong(-1L)
    if (cur <= 0) throw new EmptyTableException(
      s"Iceberg table $table has no current snapshot")
    val snaps = snapsOf(doc)
    require(!snaps.exists(_._1 == snapshotId),
      s"snapshot id $snapshotId already exists in $table")
    require(snaps.forall(_._2 <= timestampMs),
      s"delete at timestamp $timestampMs would commit BEFORE an existing " +
        "snapshot — history must be monotonic")
    val mlPath = Iceberg.manifestListOf(doc, table, cur)
    val planned = Iceberg.listLiveFiles(spark, table, mlPath, cur)
    require(planned.eqDeletes.isEmpty,
      s"cannot delete from $table: it carries EQUALITY delete files, " +
        "whose sequence-number gating this writer does not produce — " +
        "compact them away first")
    if (planned.data.isEmpty) throw new EmptyTableException(
      s"Iceberg table $table has no live data files")

    // matching rows' spec coordinates; previously position-deleted rows
    // may match again — duplicate (file, pos) pairs are idempotent under
    // the reader's anti-join. The recorded file_path must be the EXACT
    // spelling the data manifest entries carry (spec-conforming readers
    // match it verbatim — Spark's file:/ URI would make external readers
    // silently ignore the delete and resurrect rows), so map
    // _metadata.file_path back through the planned file list on the
    // reader's own normalized-path comparison domain, raising loudly on
    // a miss rather than emitting a path no manifest entry spells.
    import org.apache.spark.sql.functions.{broadcast, raise_error, when, concat_ws, lit}
    val spellRows = planned.data.map { case (p, _) =>
      (Iceberg.normPathDriver(p), planned.spelledAs.getOrElse(p, p))
    }.distinct
    val spellDf = spark.createDataFrame(spellRows)
      .toDF("__ice_norm_fp", "__ice_manifest_fp")
    val matches = Iceberg
      .readWithMetadataSchema(spark, fields, planned.data.map(_._1))
      .select(col("*"),
        Iceberg.normPath(col("_metadata.file_path")).as("__ice_norm_fp"),
        col("_metadata.row_index").as("pos"))
      .where(predicate)
      .join(broadcast(spellDf), Seq("__ice_norm_fp"), "left")
      .select(
        when(col("__ice_manifest_fp").isNull,
          raise_error(concat_ws("", lit("position-delete path mapping " +
            "miss: no planned data file spells "), col("__ice_norm_fp"))))
          .otherwise(col("__ice_manifest_fp")).as("file_path"),
        col("pos"))
    val n = matches.count()
    val hintVersion = hintVersionOf(spark, table)
    if (n == 0) return hintVersion

    // the delete parquet: one file under data/, spec column names, rows
    // sorted by (file_path, pos) — the ordering the spec asks delete
    // files to keep so readers can stream-merge them against data files
    val basePath = new Path(table)
    val f = fs(spark, basePath)
    val tmp = new Path(basePath, s".tmp_delete_$snapshotId")
    f.delete(tmp, true)
    matches.repartition(1).sortWithinPartitions("file_path", "pos")
      .write.parquet(tmp.toString)
    val part = f.listStatus(tmp)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath).minBy(_.getName)
    val delFile = new Path(new Path(basePath, "data"),
      s"delete-snap$snapshotId.parquet")
    require(f.rename(part, delFile), s"rename to $delFile failed")
    f.delete(tmp, true)

    val dm = Iceberg.writeManifest(spark, table,
      s"m-del$snapshotId.avro", snapshotId,
      Seq(Iceberg.Entry(delFile.toString, 1, content = 1, recordCount = n,
        fileSizeBytes = f.getFileStatus(delFile).getLen)))

    // carry EVERY prior manifest verbatim: path, length, content,
    // original attribution — and since the output IS a v2 table, give
    // every row its effective sequence number (position deletes apply
    // to data at or below theirs; carried history sits at 0/original)
    val carried = carriedOf(table,
      Iceberg.readAvro(spark, Iceberg.resolve(table, mlPath)))
    val ml = Iceberg.writeManifestList(spark, table,
      s"snap-$snapshotId.avro", snapshotId,
      carried.map(c => (c.path, c.length)) :+ dm,
      contents = carried.map(_.content) :+ 1,
      sequenceNumbers = carried.map(_.seq) :+ nextSeq(carried),
      addedSnapshotIds = carried.map(_.addedSnapshotId) :+ snapshotId)

    val schemaJson = fields.map(fd =>
      Iceberg.fieldJson(fd.id, fd.name, fd.typ)).mkString("[", ",", "]")
    Iceberg.writeMetadata(spark, table, hintVersion + 1,
      snaps :+ ((snapshotId, timestampMs, ml)),
      formatVersion = 2, schemaFieldsJson = schemaJson,
      partitionSpecJson = rawDefaultSpecFieldsJson(doc),
      lastColumnId = columnHwm(doc, fields),
      failIfExists = true)
    hintVersion + 1
  }

  /** UPDATE ... SET ... WHERE as ONE v2 snapshot — [[deleteWhere]]'s
    * position-delete kill and a data-file append committed together, so
    * readers never observe the deleted-but-not-yet-rewritten state a
    * two-snapshot delete+append pair would expose. The delete parquet
    * names every matching ACTIVE row's (file_path, pos); the new data
    * files carry the SAME rows with `assignments` applied, id-stamped
    * and bounds-carrying like every append. Both manifests land at the
    * same data sequence number N: the position delete names only OLD
    * file paths, so the spec's seq-≤ application rule can never erase
    * the rows appended alongside it. Zero matches commit nothing.
    * Scope gates mirror [[deleteWhere]]'s: unpartitioned, no equality
    * deletes present, schema from metadata.
    * @param assignments (column name → new value), evaluated against
    *   the table's own columns (SQL `SET c = expr` semantics)
    * @return the new metadata version (current version when no row matched) */
  def updateWhere(spark: SparkSession, table: String,
                  predicate: org.apache.spark.sql.Column,
                  assignments: Seq[(String, org.apache.spark.sql.Column)],
                  snapshotId: Long, timestampMs: Long): Int = {
    import org.apache.spark.sql.functions.col
    require(assignments.nonEmpty, "updateWhere needs at least one assignment")
    require(assignments.map(_._1).distinct.size == assignments.size,
      s"UPDATE assigns a column twice (${assignments.map(_._1).mkString(", ")}) " +
        "— refusing a silent last-wins")
    val doc = writableDoc(spark, table)
    val fields = Iceberg.currentSchemaFields(doc).getOrElse(
      throw new IllegalArgumentException(
        s"cannot update $table: its metadata carries no schema"))
    require(Iceberg.partitionSpecs(doc).values.forall(_.isEmpty),
      s"cannot update $table: it is PARTITIONED and this writer does not " +
        "derive partition metadata for delete files")
    val reservedDel = Set("file_path", "pos", "__ice_norm_fp", "__ice_manifest_fp")
    require(!fields.exists(f => reservedDel(f.name)),
      s"cannot update $table: a table column is named one of " +
        s"${reservedDel.toSeq.sorted.mkString(", ")} — colliding with the " +
        "position-delete schema / spelling-join internals; rename it first")
    val badCols = assignments.map(_._1).filterNot(c => fields.exists(_.name == c))
    require(badCols.isEmpty,
      s"UPDATE assigns to column(s) ${badCols.mkString(", ")} that are not " +
        s"columns of $table (${fields.map(_.name).mkString(", ")})")
    val cur = doc.path("current-snapshot-id").asLong(-1L)
    if (cur <= 0) throw new EmptyTableException(
      s"Iceberg table $table has no current snapshot")
    val snaps = snapsOf(doc)
    require(!snaps.exists(_._1 == snapshotId),
      s"snapshot id $snapshotId already exists in $table")
    require(snaps.forall(_._2 <= timestampMs),
      s"update at timestamp $timestampMs would commit BEFORE an existing " +
        "snapshot — history must be monotonic")
    val mlPath = Iceberg.manifestListOf(doc, table, cur)
    val planned = Iceberg.listLiveFiles(spark, table, mlPath, cur)
    require(planned.eqDeletes.isEmpty,
      s"cannot update $table: it carries EQUALITY delete files, whose " +
        "sequence-number gating this writer does not produce — compact " +
        "them away first")
    if (planned.data.isEmpty) throw new EmptyTableException(
      s"Iceberg table $table has no live data files")

    // matching ACTIVE rows' spec coordinates — the deleteWhere spelling:
    // file_path recorded in the EXACT spelling the data manifests carry
    import org.apache.spark.sql.functions.{broadcast, raise_error, when, concat_ws, lit}
    val spellRows = planned.data.map { case (p, _) =>
      (Iceberg.normPathDriver(p), planned.spelledAs.getOrElse(p, p))
    }.distinct
    val spellDf = spark.createDataFrame(spellRows)
      .toDF("__ice_norm_fp", "__ice_manifest_fp")
    val matches = Iceberg
      .readWithMetadataSchema(spark, fields, planned.data.map(_._1))
      .select(col("*"),
        Iceberg.normPath(col("_metadata.file_path")).as("__ice_norm_fp"),
        col("_metadata.row_index").as("pos"))
      .where(predicate)
      .join(broadcast(spellDf), Seq("__ice_norm_fp"), "left")
      .select(
        when(col("__ice_manifest_fp").isNull,
          raise_error(concat_ws("", lit("position-delete path mapping " +
            "miss: no planned data file spells "), col("__ice_norm_fp"))))
          .otherwise(col("__ice_manifest_fp")).as("file_path"),
        col("pos"))
    val n = matches.count()
    val hintVersion = hintVersionOf(spark, table)
    if (n == 0) return hintVersion

    // (a) the position-delete parquet + its content-1 manifest
    val basePath = new Path(table)
    val f = fs(spark, basePath)
    val tmp = new Path(basePath, s".tmp_delete_$snapshotId")
    f.delete(tmp, true)
    matches.repartition(1).sortWithinPartitions("file_path", "pos")
      .write.parquet(tmp.toString)
    val part = f.listStatus(tmp)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath).minBy(_.getName)
    val delFile = new Path(new Path(basePath, "data"),
      s"delete-snap$snapshotId.parquet")
    require(f.rename(part, delFile), s"rename to $delFile failed")
    f.delete(tmp, true)
    val dm = Iceberg.writeManifest(spark, table,
      s"m-del$snapshotId.avro", snapshotId,
      Seq(Iceberg.Entry(delFile.toString, 1, content = 1, recordCount = n,
        fileSizeBytes = f.getFileStatus(delFile).getLen)))

    // (b) the rewritten rows: the SAME active matching rows (the MoR
    // read — position-deleted rows stay dead), assignments applied and
    // cast to the field's declared type, id-stamped with footer bounds
    val byName = assignments.toMap
    val updated = Iceberg.read(spark, table).where(predicate)
      .select(fields.map { fd =>
        byName.get(fd.name)
          .map(_.cast(Iceberg.sparkType(fd.typ)))
          .getOrElse(col(s"`${fd.name}`"))
          .as(fd.name)
      }: _*)
    val nameToId = fields.map(fd => fd.name -> fd.id).toMap
    val typById = fields.map(fd => fd.id -> fd.typ).toMap
    val files = writeIdStampedFiles(spark, table, updated, fields,
      s"update$snapshotId")
    val dataManifest = Iceberg.writeManifest(spark, table,
      s"m-update$snapshotId.avro", snapshotId,
      files.map(file => boundedEntry(spark, table, file, nameToId, typById)))

    // one manifest list: carried history + the data manifest + the
    // delete manifest, data and delete both at sequence N
    val carried = carriedOf(table,
      Iceberg.readAvro(spark, Iceberg.resolve(table, mlPath)))
    val newSeq = nextSeq(carried)
    val ml = Iceberg.writeManifestList(spark, table,
      s"snap-$snapshotId.avro", snapshotId,
      carried.map(c => (c.path, c.length)) :+ dataManifest :+ dm,
      contents = carried.map(_.content) :+ 0 :+ 1,
      sequenceNumbers = carried.map(_.seq) :+ newSeq :+ newSeq,
      addedSnapshotIds = carried.map(_.addedSnapshotId) :+
        snapshotId :+ snapshotId)
    val schemaJson = fields.map(fd =>
      Iceberg.fieldJson(fd.id, fd.name, fd.typ)).mkString("[", ",", "]")
    Iceberg.writeMetadata(spark, table, hintVersion + 1,
      snaps :+ ((snapshotId, timestampMs, ml)),
      formatVersion = 2, schemaFieldsJson = schemaJson,
      partitionSpecJson = rawDefaultSpecFieldsJson(doc),
      lastColumnId = columnHwm(doc, fields),
      failIfExists = true)
    hintVersion + 1
  }

  /** COMPACTION — the `rewriteDataFiles` maintenance pass: read the
    * current snapshot THROUGH merge-on-read (position and equality
    * deletes applied), rewrite the surviving rows as freshly id-stamped,
    * bounds-carrying data files sized toward `targetFileBytes`, and
    * commit a REPLACE snapshot whose manifest list holds ONLY the new
    * manifest. This is the operation [[commitAppend]]'s and
    * [[deleteWhere]]'s "compact first" refusals point at: after it the
    * table carries no delete files, so appends, row-level deletes and
    * upserts are all legal again — while every PRIOR snapshot stays
    * byte-identical for time travel until [[expireSnapshots]] collects
    * it. Output file count = ceil(live-input-bytes / targetFileBytes)
    * from driver-side file sizes (planning altitude, O(#files)) unless
    * `numFiles` pins it; the rewrite itself is one distributed
    * repartition — the unavoidable shuffle of exactly the bytes being
    * rewritten, nothing else. With `sortBy`, the rewrite range-
    * partitions and sorts on those columns instead (`OPTIMIZE ...
    * ZORDER`-style clustering maintenance): each output file then
    * carries TIGHT disjoint footer bounds on the sort key, so
    * [[Iceberg.readPruned]]'s stats pruning plans a point query at
    * O(1) files instead of all of them.
    *
    * PARTITIONED tables compact too (closing the small-files problem
    * where it actually bites — per-partition file counts): the rewrite
    * rides the append path's partition-valued fan-out, one output file
    * per partition value per commit (partition boundaries ARE the bins,
    * so `targetFileBytes`/`numFiles` don't subdivide within a commit),
    * entries carrying the partition struct + field bounds and the list
    * carrying partition summaries — pruning survives verbatim. `sortBy`
    * there orders rows INSIDE each partition's file (row-group-level
    * skipping; file-level bounds are per-partition either way). */
  def compact(spark: SparkSession, table: String,
              snapshotId: Long, timestampMs: Long,
              targetFileBytes: Long = 128L << 20,
              sortBy: Seq[String] = Nil,
              numFiles: Option[Int] = None): Int = {
    import org.apache.spark.sql.functions.col
    val doc = writableDoc(spark, table)
    val fields = Iceberg.currentSchemaFields(doc).getOrElse(
      throw new IllegalArgumentException(
        s"cannot compact $table: its metadata carries no schema to type " +
          "the rewrite with"))
    val specsAll = Iceberg.partitionSpecs(doc)
    require(specsAll.size <= 1,
      s"cannot compact $table: it carries ${specsAll.size} partition " +
        "specs (spec evolution) — this writer re-emits only the default " +
        "spec and would silently drop the others; refusing")
    val specFields = specsAll.values.headOption.getOrElse(Nil)
    require(targetFileBytes > 0, s"targetFileBytes must be positive, got $targetFileBytes")
    val cur = doc.path("current-snapshot-id").asLong(-1L)
    if (cur <= 0) throw new EmptyTableException(
      s"Iceberg table $table has no current snapshot")
    val snaps = snapsOf(doc)
    require(!snaps.exists(_._1 == snapshotId),
      s"snapshot id $snapshotId already exists in $table")
    require(snaps.forall(_._2 <= timestampMs),
      s"compaction at timestamp $timestampMs would commit BEFORE an " +
        "existing snapshot — history must be monotonic")
    val mlPath = Iceberg.manifestListOf(doc, table, cur)
    val planned = Iceberg.listLiveFiles(spark, table, mlPath, cur)
    require(planned.data.nonEmpty,
      s"Iceberg table $table has no live data files — nothing to compact")

    val f = fs(spark, new Path(table))
    // case-INSENSITIVE like compactScoped's check and Spark's own column
    // resolution at write time — `ZORDER BY (USER_ID)` must behave the
    // same on both maintenance lanes
    val missingSort = sortBy.filterNot(c =>
      fields.exists(_.name.equalsIgnoreCase(c)))
    require(missingSort.isEmpty,
      s"compact sortBy column(s) ${missingSort.mkString(", ")} are not " +
        s"columns of $table (${fields.map(_.name).mkString(", ")})")
    numFiles.foreach(n => require(n > 0, s"numFiles must be positive, got $n"))
    val liveBytes = planned.data.map { case (p, _) =>
      f.getFileStatus(new Path(p)).getLen
    }.sum
    val numOut = numFiles.getOrElse(
      math.max(1L, (liveBytes + targetFileBytes - 1) / targetFileBytes).toInt)

    // the MoR read IS the compaction semantics: whatever the current
    // snapshot serves is what the rewrite must serve (select pins the
    // column order to the schema the id-stamped write assumes)
    val ordered = Iceberg.read(spark, table)
      .select(fields.map(fd => col(fd.name)): _*)
    val typById = fields.map(fd => fd.id -> fd.typ).toMap
    val nameToId = fields.map(fd => fd.name -> fd.id).toMap
    val (entries, newSummaries) =
      if (specFields.isEmpty) {
        val live =
          if (sortBy.isEmpty) ordered.repartition(numOut)
          else ordered.repartitionByRange(numOut, sortBy.map(col): _*)
            .sortWithinPartitions(sortBy.map(col): _*)
        val files = writeIdStampedFiles(
          spark, table, live, fields, s"compact$snapshotId")
        (files.map(file => boundedEntry(spark, table, file, nameToId, typById)),
          Seq.empty[Iceberg.Summary])
      } else {
        // PARTITIONED compaction: the append path's partition-valued
        // fan-out — one rewritten file per partition value per commit
        // (the classic small-files bin; partition boundaries ARE the
        // bins, so targetFileBytes is moot within a commit), entries
        // carrying the partition struct + bounds so pruning survives
        // verbatim. Transform parsing mirrors appendCommit's gate:
        // unknown spellings refuse rather than write guessed values.
        val parts = specFields.map { sf =>
          val src = fields.find(_.id == sf.sourceId).getOrElse(
            throw new IllegalArgumentException(
              s"partition spec of $table names source-id ${sf.sourceId}, " +
                "absent from the schema — corrupt metadata"))
          val t = IcebergTransforms.parse(sf.transform)
          require(t != IcebergTransforms.Opaque,
            s"cannot compact $table: partition transform " +
              s"'${sf.transform}' is unknown to this writer — deriving " +
              "values under guessed semantics would corrupt pruning")
          WritePart(sf.name, src.name, t, src.typ)
        }
        writePartitionedFiles(spark, table, ordered, fields, parts,
          nameToId, typById, snapshotId,
          tagPrefix = "compact", what = "compact", sortWithin = sortBy)
      }
    val manifest = Iceberg.writeManifest(spark, table,
      s"m-compact$snapshotId.avro", snapshotId, entries)
    // REPLACE: only the new manifest — prior data and delete manifests
    // drop out of the live view (and stay reachable via prior snapshots).
    // A v2 table's new list still carries a sequence number ABOVE the
    // prior tier: compaction must not reset the sequence clock a later
    // upsert resumes from (and real v2 readers require the field).
    // (The manifest list is re-parsed here after listLiveFiles already
    // opened it — KB-scale planning metadata, and listLiveFiles's
    // signature deliberately does not leak raw rows.)
    val fmtVersion = doc.path("format-version").asInt(1)
    val seqNums =
      if (fmtVersion != 2) Nil
      else Seq(nextSeq(carriedOf(table,
        Iceberg.readAvro(spark, Iceberg.resolve(table, mlPath)))))
    val ml = Iceberg.writeManifestList(spark, table,
      s"snap-$snapshotId.avro", snapshotId, Seq(manifest),
      summaries = if (newSummaries.nonEmpty) Seq(newSummaries) else Nil,
      sequenceNumbers = seqNums)
    val hintVersion = hintVersionOf(spark, table)
    val schemaJson = fields.map(fd =>
      Iceberg.fieldJson(fd.id, fd.name, fd.typ)).mkString("[", ",", "]")
    Iceberg.writeMetadata(spark, table, hintVersion + 1,
      snaps :+ ((snapshotId, timestampMs, ml)),
      formatVersion = fmtVersion,
      schemaFieldsJson = schemaJson,
      partitionSpecJson = rawDefaultSpecFieldsJson(doc),
      lastColumnId = columnHwm(doc, fields),
      failIfExists = true)
    hintVersion + 1
  }

  /** PARTITION-SCOPED compaction — the Iceberg lane of
    * `OPTIMIZE t WHERE day = X [ZORDER BY (…)]`: rewrite ONLY the named
    * IDENTITY partitions' files (merge-on-read applied, one fresh file
    * per partition value at the TOP sequence number) while every
    * untouched file carries forward VERBATIM — re-emitted EXISTING with
    * its original snapshot attribution and sequence number (the
    * [[rewriteManifests]] carry loop), so time travel, incremental
    * attribution and MoR gating survive. Delete manifests carry
    * unchanged: position deletes naming the dropped files are inert,
    * and equality deletes never reach the rewritten rows (their
    * sequence tops the tier — the same spec rule [[upsert]] rides).
    * Consequently a table with delete files KEEPS refusing blind
    * appends after a scoped pass — only a FULL [[compact]] purges the
    * delete tier; the refusal says so.
    *
    * Scope grammar mirrors the Delta lane: equality on identity
    * partition fields (by source column or field name) plus
    * HIDDEN-TRANSFORM fields by field name — `ts_day = '2024-01-01'`
    * scopes a `day(ts)` table, the value living in the transformed
    * domain, with file AND row selection mapped through the same
    * [[IcebergTransforms]] function the writer fans files out with.
    * Range conjunctions (`day >= lo AND day < hi`) compare in that
    * domain; bucket fields take equality only. Values arrive as strings
    * from SQL and type through the field's RESULT type. */
  def compactScoped(spark: SparkSession, table: String,
                    snapshotId: Long, timestampMs: Long,
                    partitionFilter: Seq[graft.plans.ScopeTerm],
                    sortBy: Seq[String] = Nil): Int = {
    import org.apache.spark.sql.functions.{col, lit}
    require(partitionFilter.nonEmpty,
      "compactScoped needs a partition scope — use compact() for the full table")
    val doc = writableDoc(spark, table)
    val fields = Iceberg.currentSchemaFields(doc).getOrElse(
      throw new IllegalArgumentException(
        s"cannot compact $table: its metadata carries no schema to type " +
          "the rewrite with"))
    val specsAll = Iceberg.partitionSpecs(doc)
    require(specsAll.size <= 1,
      s"cannot compact $table: it carries ${specsAll.size} partition " +
        "specs (spec evolution) — refusing")
    val specFields = specsAll.values.headOption.getOrElse(Nil)
    require(specFields.nonEmpty,
      s"cannot scope a compaction of $table: it is UNPARTITIONED — " +
        "drop the WHERE clause")
    val parts = specFields.map { sf =>
      val src = fields.find(_.id == sf.sourceId).getOrElse(
        throw new IllegalArgumentException(
          s"partition spec of $table names source-id ${sf.sourceId}, " +
            "absent from the schema — corrupt metadata"))
      val t = IcebergTransforms.parse(sf.transform)
      require(t != IcebergTransforms.Opaque,
        s"cannot compact $table: partition transform '${sf.transform}' " +
          "is unknown to this writer")
      WritePart(sf.name, src.name, t, src.typ)
    }
    // sortBy validated UP FRONT like compact's — a ZORDER typo on the
    // scoped lane must refuse by name, not die inside the write loop
    val missingSort = sortBy.filterNot(c =>
      fields.exists(_.name.equalsIgnoreCase(c)))
    require(missingSort.isEmpty,
      s"compact sortBy column(s) ${missingSort.mkString(", ")} are not " +
        s"columns of $table (${fields.map(_.name).mkString(", ")})")
    // each term resolves to a spec field — identity fields by source
    // column OR field name, hidden-transform fields by FIELD name
    // (`ts_day = '2024-01-01'` scopes a day(ts) table): the value lives
    // in the TRANSFORMED domain and both file and row selection map
    // through the SAME IcebergTransforms function the writer fanned
    // files out with, so the two selections are symmetric by
    // construction. Ranges are ordered comparisons in that domain;
    // bucket fields refuse ranges by name (hash order is meaningless).
    val resolved: Seq[(graft.plans.ScopeTerm, WritePart, Any)] =
      partitionFilter.map { t =>
        val p = parts.find(p => p.name.equalsIgnoreCase(t.col) ||
            (p.transform == IcebergTransforms.Identity &&
              p.sourceCol.equalsIgnoreCase(t.col))).getOrElse(
          throw new IllegalArgumentException(
            s"OPTIMIZE WHERE names '${t.col}', not a partition field of " +
              s"$table " + parts.map(_.name).mkString("(", ", ", ")")))
        require(t.isEq || !p.transform.isInstanceOf[IcebergTransforms.Bucket],
          s"OPTIMIZE WHERE ${t.col} ${t.op} …: a bucket partition's hash " +
            "order is meaningless — scope bucket fields by equality")
        val typ = resultTyp(p.transform, p.sourceTyp)
        (t.copy(col = p.name), p,
          graft.plans.ScopeTerm.typedValue(typ, t.col, t.value))
      }
    // shape re-validated on the RESOLVED field names: two spellings of
    // one field (source col + field name, case variants) must not
    // smuggle a contradictory pair past the parser's check
    graft.plans.ScopeTerm.validateShape(resolved.map(_._1), identity)
    val cur = doc.path("current-snapshot-id").asLong(-1L)
    if (cur <= 0) throw new EmptyTableException(
      s"Iceberg table $table has no current snapshot")
    val snaps = snapsOf(doc)
    require(snaps.isEmpty || snaps.last._1 == cur,
      s"cannot compact $table: current snapshot $cur is not the latest " +
        "in its history — refusing non-linear histories")
    require(!snaps.exists(_._1 == snapshotId),
      s"snapshot id $snapshotId already exists in $table")
    require(snaps.forall(_._2 <= timestampMs),
      s"compaction at timestamp $timestampMs would commit BEFORE an " +
        "existing snapshot — history must be monotonic")
    val fmtVersion = doc.path("format-version").asInt(1)
    val mlPath = Iceberg.manifestListOf(doc, table, cur)
    val rows = Iceberg.readAvro(spark, Iceberg.resolve(table, mlPath))
    val carried = carriedOf(table, rows)
    val (delManifests, dataManifests) = carried.partition(_.content == 1)
    val delRows = rows.zip(carried).collect { case (r, c) if c.content == 1 => r }

    val live = liveEntriesAsExisting(spark, table, dataManifests, fmtVersion)
    def inScope(e: Iceberg.Entry): Boolean = {
      val pv = e.partition.toMap
      resolved.forall { case (t, p, litV) =>
        pv.get(p.name).exists(graft.plans.ScopeTerm.satisfies(t.op, _, litV))
      }
    }
    val (scopedOld, carriedData) = live.partition(inScope)
    require(scopedOld.nonEmpty,
      s"OPTIMIZE at $table: no active files in the scoped partitions " +
        resolved.map(_._1).mkString("(", " AND ", ")"))

    // the scoped rows, served MoR (identity scope: partition value ==
    // source column value, so the filter is exact row selection)
    val typById = fields.map(fd => fd.id -> fd.typ).toMap
    val nameToId = fields.map(fd => fd.name -> fd.id).toMap
    val scopedRows = resolved.foldLeft(
      Iceberg.read(spark, table).select(fields.map(fd => col(fd.name)): _*)) {
      case (df, (t, p, litV)) =>
        // row side = transformedCol(p), the EXACT function that stamped
        // every file's partition value at write time (identity dates
        // become epoch-day longs, day(ts) maps through dayFromMicros, …)
        // — so {rows matching} ≡ {rows of the files inScope selected}
        val lhs = transformedCol(p)
        val rhs = lit(litV)
        df.where(t.op match {
          case "=" => lhs === rhs
          case ">" => lhs > rhs
          case ">=" => lhs >= rhs
          case "<" => lhs < rhs
          case "<=" => lhs <= rhs
          case other => throw new IllegalArgumentException(
            s"unknown scope operator '$other'")
        })
    }
    val (newEntries, _) = writePartitionedFiles(spark, table, scopedRows,
      fields, parts, nameToId, typById, snapshotId,
      tagPrefix = "compact", what = "compact", sortWithin = sortBy)

    val carryManifest =
      if (carriedData.isEmpty) None
      else Some(Iceberg.writeManifest(spark, table,
        s"m-carry$snapshotId.avro", snapshotId, carriedData))
    // a scoped partition whose rows were ALL MoR-deleted rewrites to
    // NOTHING — the correct live state is "that partition is empty",
    // expressed by just dropping its old files (no empty manifest)
    val newManifest =
      if (newEntries.isEmpty) None
      else Some(Iceberg.writeManifest(spark, table,
        s"m-compact$snapshotId.avro", snapshotId, newEntries))
    val n = specFields.size
    val manifests = delManifests.map(c => (c.path, c.length)) ++
      carryManifest.toSeq ++ newManifest.toSeq
    val contents = delManifests.map(_.content) ++
      carryManifest.map(_ => 0).toSeq ++ newManifest.map(_ => 0).toSeq
    val allSummaries = carriedSummaries(delRows) ++
      carryManifest.map(_ => partitionSummariesOf(n, carriedData)).toSeq ++
      newManifest.map(_ => partitionSummariesOf(n, newEntries)).toSeq
    val seqNums =
      if (fmtVersion != 2) Nil
      else delManifests.map(_.seq) ++
        carryManifest.map(_ =>
          carriedData.flatMap(_.sequenceNumber).maxOption.getOrElse(0L)).toSeq ++
        newManifest.map(_ => nextSeq(carried)).toSeq
    val addedIds = delManifests.map(_.addedSnapshotId) ++
      carryManifest.map(_ => snapshotId).toSeq ++
      newManifest.map(_ => snapshotId).toSeq
    val ml = Iceberg.writeManifestList(spark, table,
      s"snap-$snapshotId.avro", snapshotId, manifests,
      contents = contents,
      summaries = if (allSummaries.exists(_.nonEmpty)) allSummaries else Nil,
      sequenceNumbers = seqNums,
      addedSnapshotIds = addedIds)
    val hintVersion = hintVersionOf(spark, table)
    val schemaJson = fields.map(fd =>
      Iceberg.fieldJson(fd.id, fd.name, fd.typ)).mkString("[", ",", "]")
    Iceberg.writeMetadata(spark, table, hintVersion + 1,
      snaps :+ ((snapshotId, timestampMs, ml)),
      formatVersion = fmtVersion,
      schemaFieldsJson = schemaJson,
      partitionSpecJson = rawDefaultSpecFieldsJson(doc),
      lastColumnId = columnHwm(doc, fields),
      failIfExists = true)
    hintVersion + 1
  }

  /** MoR UPSERT — one v2 snapshot that (a) appends `df`'s rows and (b)
    * commits an EQUALITY-delete file over `df`'s distinct `keyCols`
    * values, both at data sequence number N = max(existing) + 1. Under
    * the spec's strict `data.seq < delete.seq` rule the delete erases
    * every OLDER row sharing a key while the rows appended alongside it
    * survive — latest-write-wins per key, with NO data file rewritten
    * and no read of the existing data at commit time (the streaming-CDC
    * ingest pattern; a copy-on-write merge would re-shuffle the whole
    * table per batch). Existing sequence-less metadata (v1 history)
    * inherits sequence 0, the spec's v1→v2 upgrade rule, via the
    * manifest-list row numbers this commit writes for every carried
    * manifest. Upserts stack: each commit's sequence tops the last.
    * Duplicate keys WITHIN `df` are appended as-is (the delete only
    * erases rows from sequences strictly below) — dedupe the batch
    * first if the key is meant to be unique.
    *
    * Hidden-partitioned tables upsert too (the day-partitioned CDC
    * ingest shape), under one soundness gate: every partition SOURCE
    * column must be an upsert key, so a key's old row provably shares
    * its partition with the PARTITION-SCOPED equality-delete file this
    * commit fans out per transformed tuple — data files and delete
    * files both carry partition structs and summaries, so pruning
    * skips them together. */
  def upsert(spark: SparkSession, table: String, df: DataFrame,
             keyCols: Seq[String], snapshotId: Long, timestampMs: Long): Int = {
    import org.apache.spark.sql.functions.col
    require(keyCols.nonEmpty, "upsert needs at least one key column")
    val doc = writableDoc(spark, table)
    val fields = Iceberg.currentSchemaFields(doc).getOrElse(
      throw new IllegalArgumentException(
        s"cannot upsert into $table: its metadata carries no schema — " +
          "equality-delete columns are named by FIELD ID"))
    // hidden-partitioning aware, under the CDC-ingest soundness rule:
    // every partition SOURCE column must be an upsert KEY, so a key's
    // old row provably lives in the same partition as its
    // partition-scoped equality delete (a non-key source could move a
    // key between partitions and the delete would miss the old row)
    val specsAll = Iceberg.partitionSpecs(doc)
    require(specsAll.size <= 1,
      s"cannot upsert into $table: it carries ${specsAll.size} partition " +
        "specs (spec evolution) — this writer re-emits only the default " +
        "spec; refusing")
    val specParts = specsAll.values.headOption.getOrElse(Nil).map { sf =>
      val src = fields.find(_.id == sf.sourceId).getOrElse(
        throw new IllegalArgumentException(
          s"partition spec of $table names source-id ${sf.sourceId}, " +
            "absent from the schema — corrupt metadata"))
      val t = IcebergTransforms.parse(sf.transform)
      require(t != IcebergTransforms.Opaque,
        s"cannot upsert into $table: partition transform " +
          s"'${sf.transform}' is unknown to this writer")
      WritePart(sf.name, src.name, t, src.typ)
    }
    val nonKeySources = specParts.map(_.sourceCol).filterNot(keyCols.contains)
    require(nonKeySources.isEmpty,
      s"cannot upsert into $table: partition source column(s) " +
        s"${nonKeySources.mkString(", ")} are not upsert keys — a key's " +
        "old row could live in a different partition than its " +
        "partition-scoped equality delete; include them in keyCols, or " +
        "express the change as deleteWhere + commitAppend instead")
    require(df.columns.toSeq == fields.map(_.name),
      s"upsert schema ${df.columns.mkString("(", ", ", ")")} does not " +
        s"match $table's ${fields.map(_.name).mkString("(", ", ", ")")} — " +
        "schema evolution is a separate operation")
    val keyFields = keyCols.map(k => fields.find(_.name == k).getOrElse(
      throw new IllegalArgumentException(
        s"upsert key column '$k' is not a column of $table " +
          s"(${fields.map(_.name).mkString(", ")})")))
    val cur = doc.path("current-snapshot-id").asLong(-1L)
    if (cur <= 0) throw new EmptyTableException(
      s"Iceberg table $table has no current snapshot — create it with " +
        "commitAppend first; upsert commits deletes against existing data")
    val snaps = snapsOf(doc)
    require(!snaps.exists(_._1 == snapshotId),
      s"snapshot id $snapshotId already exists in $table")
    require(snaps.forall(_._2 <= timestampMs),
      s"upsert at timestamp $timestampMs would commit BEFORE an existing " +
        "snapshot — history must be monotonic")

    // carried manifests keep their path/length/content/attribution AND
    // get an explicit sequence number: their own where the prior list
    // carried one, else 0 — the spec's v1→v2 upgrade rule (pre-upgrade
    // data sorts below every new delete). ADDED entries inside them
    // inherit this row number; this repo's manifests are single-snapshot
    // so the per-row number is exact, and foreign per-manifest numbers
    // carry through unchanged.
    val mlPath = Iceberg.manifestListOf(doc, table, cur)
    val priorRows = Iceberg.readAvro(spark, Iceberg.resolve(table, mlPath))
    val carried = carriedOf(table, priorRows)
    val newSeq = nextSeq(carried)
    val typById = fields.map(fd => fd.id -> fd.typ).toMap
    val nameToId = fields.map(fd => fd.name -> fd.id).toMap
    val keyNameToId = keyFields.map(fd => fd.name -> fd.id).toMap
    val keyTypById = keyFields.map(fd => fd.id -> fd.typ).toMap

    // the transformed-tuple set, derived ONCE from the (smaller) key
    // frame — valid for BOTH fan-outs below because partition sources
    // ⊆ keys (gated above), so df and keysDf span identical tuples;
    // halves the per-batch planning jobs on the CDC ingest hot path
    val keysDf = df.select(keyCols.map(col): _*).distinct()
    val tupleSet: Option[Seq[Seq[Any]]] =
      if (specParts.isEmpty) None
      else Some(keysDf
        .select(specParts.map(p => transformedCol(p).as(p.name)): _*)
        .distinct().limit(MaxPartitionValuesPerCommit + 1)
        .collect().map(_.toSeq).toSeq)

    // (a) the appended rows — full schema, id-stamped, footer bounds;
    // hidden-partitioned tables fan out per transformed tuple and stamp
    // partition structs + summaries exactly like commitAppend
    val (dataEntries, dataSummaries) =
      if (specParts.isEmpty) {
        val files = writeIdStampedFiles(spark, table, df, fields, s"snap$snapshotId")
        (files.map(file => boundedEntry(spark, table, file, nameToId, typById)),
          Seq.empty[Iceberg.Summary])
      } else
        writePartitionedFiles(spark, table, df, fields, specParts,
          nameToId, typById, snapshotId,
          what = "upsert into", precomputed = tupleSet)
    val dataManifest = Iceberg.writeManifest(spark, table,
      s"m-snap$snapshotId.avro", snapshotId, dataEntries)

    // (b) the equality-delete file(s): the batch's distinct keys,
    // id-stamped so a later rename still matches by field id. Size is
    // bounded by the BATCH, not the table. Partitioned tables write one
    // PARTITION-SCOPED delete file per transformed tuple (sound because
    // partition sources ⊆ keys — gated above), each stamped with its
    // partition struct so the reader's pruning skips delete files too.
    val (delEntries, delSummaries) =
      if (specParts.isEmpty) {
        val delFiles = writeIdStampedFiles(spark, table,
          keysDf.coalesce(1), keyFields, s"eqdel$snapshotId")
        (delFiles.map(p => boundedEntry(spark, table, p, keyNameToId,
          keyTypById, content = 2, equalityIds = keyFields.map(_.id))),
          Seq.empty[Iceberg.Summary])
      } else
        writePartitionedFiles(spark, table, keysDf, keyFields, specParts,
          keyNameToId, keyTypById, snapshotId,
          tagPrefix = "eqdel", content = 2,
          equalityIds = keyFields.map(_.id),
          what = "upsert into", precomputed = tupleSet)
    val delManifest = Iceberg.writeManifest(spark, table,
      s"m-eqdel$snapshotId.avro", snapshotId, delEntries)

    val allSummaries =
      carriedSummaries(priorRows) :+ dataSummaries :+ delSummaries
    val ml = Iceberg.writeManifestList(spark, table,
      s"snap-$snapshotId.avro", snapshotId,
      carried.map(c => (c.path, c.length)) :+ dataManifest :+ delManifest,
      contents = carried.map(_.content) :+ 0 :+ 1,
      summaries = if (allSummaries.exists(_.nonEmpty)) allSummaries else Nil,
      sequenceNumbers = carried.map(_.seq) :+ newSeq :+ newSeq,
      addedSnapshotIds = carried.map(_.addedSnapshotId) :+
        snapshotId :+ snapshotId)

    val hintVersion = hintVersionOf(spark, table)
    val schemaJson = fields.map(fd =>
      Iceberg.fieldJson(fd.id, fd.name, fd.typ)).mkString("[", ",", "]")
    Iceberg.writeMetadata(spark, table, hintVersion + 1,
      snaps :+ ((snapshotId, timestampMs, ml)),
      formatVersion = 2, schemaFieldsJson = schemaJson,
      partitionSpecJson = rawDefaultSpecFieldsJson(doc),
      lastColumnId = columnHwm(doc, fields),
      failIfExists = true)
    hintVersion + 1
  }

  /** The LIVE (non-DELETED) entries of `manifests`, re-spelled as
    * EXISTING (status 0) with their ORIGINAL snapshot attribution and
    * effective sequence number — the carry loop [[rewriteManifests]] and
    * the partition-scoped [[compactScoped]] share: time travel,
    * incremental attribution and MoR sequence gating all survive a
    * re-emit built this way. v2 entries whose sequence cannot be
    * resolved refuse (rewriting them would guess delete ordering). */
  private def liveEntriesAsExisting(spark: SparkSession, table: String,
      manifests: Seq[Carried], fmtVersion: Int): Seq[Iceberg.Entry] = {
    val merged = scala.collection.mutable.ArrayBuffer.empty[Iceberg.Entry]
    manifests.foreach { c =>
      Iceberg.readAvro(spark, Iceberg.resolve(table, c.path)).foreach { e =>
        val status = Iceberg.longField(e, "status").getOrElse(
          throw new IllegalArgumentException(
            s"manifest ${c.path}: entry lacks status")).toInt
        if (status != 2) {
          val df = e.get("data_file").asInstanceOf[org.apache.avro.generic.GenericRecord]
          require(df != null, s"manifest ${c.path}: entry lacks data_file")
          val eSeq = Iceberg.longField(e, "sequence_number")
            .orElse(if (status == 1) Some(c.seq) else None)
          require(fmtVersion < 2 || eSeq.isDefined,
            s"manifest ${c.path}: a v2 entry has no resolvable sequence " +
              "number — rewriting it would guess delete ordering; refusing")
          val pvals: Seq[(String, Any)] = (if (df.getSchema.getField("partition") == null) null
            else df.get("partition")) match {
            case p: org.apache.avro.generic.GenericRecord =>
              p.getSchema.getFields.asScala.toSeq.map { fld =>
                fld.name -> (p.get(fld.name) match {
                  case i: java.lang.Integer => i.longValue
                  case l: java.lang.Long => l.longValue
                  case s: CharSequence => s.toString
                  case other => throw new IllegalArgumentException(
                    s"manifest ${c.path}: partition value class " +
                      s"${if (other == null) "null" else other.getClass.getName} " +
                      "is not re-emittable; refusing")
                })
              }
            case _ => Nil
          }
          def bounds(key: String): Seq[(Int, Array[Byte])] =
            if (df.getSchema.getField(key) == null) Nil
            else df.get(key) match {
              case null => Nil
              case a: java.util.Collection[_] => a.asScala.toSeq.map { kv =>
                val r = kv.asInstanceOf[org.apache.avro.generic.GenericRecord]
                (Iceberg.longField(r, "key").get.toInt,
                  Iceberg.avroBytes(r.get("value")).getOrElse(Array.emptyByteArray))
              }
              case other => throw new IllegalArgumentException(
                s"manifest ${c.path}: $key has unexpected class ${other.getClass.getName}")
            }
          merged += Iceberg.Entry(
            path = df.get("file_path").toString,
            status = 0, // EXISTING: carried forward, not added here
            content = Iceberg.longField(df, "content").map(_.toInt).getOrElse(0),
            format = (if (df.getSchema.getField("file_format") == null) None
              else Option(df.get("file_format"))).map(_.toString).getOrElse("PARQUET"),
            partition = pvals,
            lowerBounds = bounds("lower_bounds"),
            upperBounds = bounds("upper_bounds"),
            sequenceNumber = eSeq,
            recordCount = Iceberg.longField(df, "record_count").getOrElse(0L),
            fileSizeBytes = Iceberg.longField(df, "file_size_in_bytes").getOrElse(0L),
            snapshotIdOverride = Some(Iceberg.longField(e, "snapshot_id")
              .getOrElse(c.addedSnapshotId)))
          require(merged.size <= graft.operators.ManifestGuard.MaxPlannedFiles,
            s"rewrite of $table would merge more than " +
              s"${graft.operators.ManifestGuard.MaxPlannedFiles} entries on " +
              "the driver — compact data files first")
        }
      }
    }
    merged.toSeq
  }

  /** Manifest-list partition summaries recomputed from entries' own
    * partition tuples — per field POSITION, typed by the value class
    * (the transformed domain writePartitionedFiles encodes). Empty when
    * the table is unpartitioned or any entry lacks the full tuple
    * (absent = unknown = sound). */
  private def partitionSummariesOf(nSpecFields: Int,
      entries: Seq[Iceberg.Entry]): Seq[Iceberg.Summary] =
    if (nSpecFields == 0 || entries.isEmpty ||
        entries.exists(_.partition.size != nSpecFields)) Nil
    else (0 until nSpecFields).map { i =>
      val vs = entries.map(_.partition(i)._2)
      vs.head match {
        case _: String =>
          val ss = vs.map(_.toString)
          Iceberg.Summary(Some(Iceberg.encodeString(ss.min)),
            Some(Iceberg.encodeString(ss.max)))
        case _ =>
          val ls = vs.map(_.asInstanceOf[Long])
          Iceberg.Summary(Some(Iceberg.encodeLong(ls.min)),
            Some(Iceberg.encodeLong(ls.max)))
      }
    }

  /** MANIFEST REWRITE — Iceberg's `rewrite_manifests` maintenance pass,
    * the METADATA twin of [[compact]]: merge the current snapshot's
    * DATA manifests into ONE while touching no data file. Every live
    * entry re-emits as EXISTING (status 0) under its ORIGINAL snapshot
    * id and its explicit data sequence number, so time travel,
    * [[Iceberg.readIncremental]]'s entry-level attribution and
    * merge-on-read sequence gating all survive; delete manifests carry
    * unchanged. Partition-value summaries are RECOMPUTED from the
    * merged entries' transformed-domain values, so manifest-list
    * pruning keeps working. Why it matters at 100 TB: scan planning
    * walks the manifest LIST per query — a thousand-append table pays a
    * thousand manifest opens per plan until this pass bounds the walk
    * to one. No-op (≤1 data manifest) returns the current version.
    * Refusals mirror the other maintenance ops: non-linear history,
    * multi-spec tables, a v2 entry whose sequence number cannot be
    * resolved (rewriting it would guess ordering). */
  def rewriteManifests(spark: SparkSession, table: String,
                       snapshotId: Long, timestampMs: Long): Int = {
    val doc = writableDoc(spark, table)
    val cur = doc.path("current-snapshot-id").asLong(-1L)
    if (cur <= 0) throw new EmptyTableException(
      s"Iceberg table $table has no current snapshot")
    val snaps = snapsOf(doc)
    require(snaps.isEmpty || snaps.last._1 == cur,
      s"cannot rewrite manifests of $table: current snapshot $cur is not " +
        "the latest in its history — refusing non-linear histories")
    require(!snaps.exists(_._1 == snapshotId),
      s"snapshot id $snapshotId already exists in $table")
    require(snaps.forall(_._2 <= timestampMs),
      s"rewrite at timestamp $timestampMs would commit BEFORE an existing " +
        "snapshot — history must be monotonic")
    require(Iceberg.partitionSpecs(doc).size <= 1,
      s"cannot rewrite manifests of $table: it carries multiple partition " +
        "specs — merged entries would need per-entry spec ids this writer " +
        "does not emit; refusing")
    val fields = Iceberg.currentSchemaFields(doc).getOrElse(
      throw new IllegalArgumentException(
        s"cannot rewrite manifests of $table: its metadata carries no schema"))
    val fmtVersion = doc.path("format-version").asInt(1)
    val mlPath = Iceberg.manifestListOf(doc, table, cur)
    val rows = Iceberg.readAvro(spark, Iceberg.resolve(table, mlPath))
    val carried = carriedOf(table, rows)
    val (delManifests, dataManifests) = carried.partition(_.content == 1)
    // the prior manifest-list rows of the CARRIED delete manifests, in
    // the same order delManifests keeps them (carriedOf is 1:1 with
    // rows) — their partition summaries must ride through the rewrite,
    // or a partitioned MoR table loses delete-manifest pruning from the
    // very op whose purpose is bounding planning work
    val delRows = rows.zip(carried).collect { case (r, c) if c.content == 1 => r }
    val hintVersion = hintVersionOf(spark, table)
    if (dataManifests.size <= 1) return hintVersion // nothing to merge

    // every data manifest's LIVE entries, re-spelled as EXISTING with
    // their original attribution and effective sequence number
    val merged = liveEntriesAsExisting(spark, table, dataManifests, fmtVersion)
    val manifest = Iceberg.writeManifest(spark, table,
      s"m-rewrite$snapshotId.avro", snapshotId, merged)
    // summaries recomputed from the merged entries' partition values —
    // per field POSITION, typed by the value class (the transformed
    // domain writePartitionedFiles already encodes)
    val specFields = Iceberg.partitionSpecs(doc).values.headOption.getOrElse(Nil)
    val summaries = partitionSummariesOf(specFields.size, merged)
    val mergedSeq = merged.flatMap(_.sequenceNumber).maxOption.getOrElse(0L)
    val allSummaries = carriedSummaries(delRows) :+ summaries
    val ml = Iceberg.writeManifestList(spark, table,
      s"snap-$snapshotId.avro", snapshotId,
      delManifests.map(c => (c.path, c.length)) :+ manifest,
      contents = delManifests.map(_.content) :+ 0,
      summaries = if (allSummaries.exists(_.nonEmpty)) allSummaries else Nil,
      sequenceNumbers =
        if (fmtVersion == 2) delManifests.map(_.seq) :+ mergedSeq else Nil,
      addedSnapshotIds = delManifests.map(_.addedSnapshotId) :+ snapshotId)
    val schemaJson = fields.map(fd =>
      Iceberg.fieldJson(fd.id, fd.name, fd.typ)).mkString("[", ",", "]")
    Iceberg.writeMetadata(spark, table, hintVersion + 1,
      snaps :+ ((snapshotId, timestampMs, ml)),
      formatVersion = fmtVersion,
      schemaFieldsJson = schemaJson,
      partitionSpecJson = rawDefaultSpecFieldsJson(doc),
      lastColumnId = columnHwm(doc, fields),
      failIfExists = true)
    hintVersion + 1
  }

  /** SNAPSHOT EXPIRATION — drop every snapshot strictly older than
    * `olderThanMs` (the CURRENT snapshot is always retained, whatever
    * its age — the invariant real `expireSnapshots` keeps) from the
    * metadata, then physically delete the files ONLY the expired
    * snapshots reference: their manifest lists, manifests and
    * data/delete files minus everything any retained snapshot still
    * reaches. The reachability walk is pure driver-side metadata
    * (O(#manifest entries), the same altitude as scan planning). After
    * [[compact]], this is what actually reclaims the rewritten bytes —
    * compaction alone keeps old files alive for time travel. A GC
    * candidate OUTSIDE the table location refuses the whole pass
    * loudly: shared-file layouts need a smarter collector, and a
    * half-applied expiration is worse than none. No-op (nothing old
    * enough) returns the current metadata version unchanged. */
  def expireSnapshots(spark: SparkSession, table: String,
                      olderThanMs: Long): Int = {
    val doc = writableDoc(spark, table)
    require(Iceberg.partitionSpecs(doc).values.forall(_.isEmpty),
      s"cannot expire snapshots of $table: it is PARTITIONED and this " +
        "writer's metadata rewrite does not carry partition specs through")
    val cur = doc.path("current-snapshot-id").asLong(-1L)
    if (cur <= 0) throw new EmptyTableException(
      s"Iceberg table $table has no current snapshot")
    val snaps = snapsOf(doc)
    require(snaps.exists(_._1 == cur),
      s"metadata of $table names current snapshot $cur but the snapshot " +
        "list lacks it — corrupt metadata; refusing")
    val (retained, expired) = snaps.partition(s =>
      s._2 >= olderThanMs || s._1 == cur)
    require(retained.last._1 == cur,
      s"current snapshot $cur of $table is not its latest retained " +
        "snapshot — this writer's metadata rewrite would repoint " +
        "current; refusing non-linear histories")
    val hintVersion = hintVersionOf(spark, table)
    if (expired.isEmpty) return hintVersion

    // reachability: every path a snapshot's metadata mentions, live or
    // not (a status-2 DELETED entry still names a file an OLDER retained
    // snapshot may serve — conservative keep is the sound direction).
    // Shared carried manifests parse ONCE (memoized — a linear carried
    // history would otherwise re-read the same Avro quadratically), and
    // the ManifestGuard cap fires DURING the walk, before the driver
    // materializes an unbounded reference set.
    case class Refs(mls: Set[String], manifests: Set[String], files: Set[String])
    var walked = 0
    val manifestFiles = scala.collection.mutable.Map.empty[String, Seq[String]]
    def filesOf(mpAbs: String): Seq[String] =
      manifestFiles.getOrElseUpdate(mpAbs,
        Iceberg.readAvro(spark, new Path(mpAbs)).map { e =>
          walked += 1
          require(walked <= graft.operators.ManifestGuard.MaxPlannedFiles,
            s"expiring snapshots of $table would walk more than " +
              s"${graft.operators.ManifestGuard.MaxPlannedFiles} file " +
              "references on the driver — compact to coarser files first")
          val dfRec = e.get("data_file")
            .asInstanceOf[org.apache.avro.generic.GenericRecord]
          require(dfRec != null, s"manifest $mpAbs: entry lacks data_file")
          Iceberg.resolve(table, dfRec.get("file_path").toString).toString
        })
    def refsOf(mlRel: String): Refs = {
      val mlAbs = Iceberg.resolve(table, mlRel).toString
      val manifests = Iceberg.readAvro(spark, Iceberg.resolve(table, mlRel))
        .map(r => Option(r.get("manifest_path"))
          .map(mp => Iceberg.resolve(table, mp.toString).toString)
          .getOrElse(throw new IllegalArgumentException(
            s"manifest-list $mlRel row lacks manifest_path")))
      Refs(Set(mlAbs), manifests.toSet, manifests.flatMap(filesOf).toSet)
    }
    def union(rs: Seq[Refs]): Refs =
      rs.foldLeft(Refs(Set.empty, Set.empty, Set.empty))((a, b) =>
        Refs(a.mls ++ b.mls, a.manifests ++ b.manifests, a.files ++ b.files))
    val keep = union(retained.map(s => refsOf(s._3)))
    val drop = union(expired.map(s => refsOf(s._3)))
    val doomed = (drop.mls -- keep.mls) ++ (drop.manifests -- keep.manifests) ++
      (drop.files -- keep.files)

    val f = fs(spark, new Path(table))
    val root = f.makeQualified(new Path(table)).toString.stripSuffix("/") + "/"
    val outside = doomed.filterNot(p =>
      f.makeQualified(new Path(p)).toString.startsWith(root))
    require(outside.isEmpty,
      s"expiring snapshots of $table would delete files OUTSIDE the " +
        s"table location (${outside.take(3).mkString(", ")}…) — shared-" +
        "file layouts need a catalog-aware collector; refusing the pass")

    // metadata first: once the new version is current, a crash between
    // deletes leaves only orphans (harmless), never a live table with
    // missing files
    val fields = Iceberg.currentSchemaFields(doc)
    val schemaJson = fields.map(_.map(fd =>
      Iceberg.fieldJson(fd.id, fd.name, fd.typ)).mkString("[", ",", "]"))
      .getOrElse("[]")
    Iceberg.writeMetadata(spark, table, hintVersion + 1, retained,
      formatVersion = doc.path("format-version").asInt(1),
      schemaFieldsJson = schemaJson,
      partitionSpecJson = rawDefaultSpecFieldsJson(doc),
      lastColumnId = columnHwm(doc, fields.getOrElse(Nil)),
      failIfExists = true)
    doomed.foreach(p => f.delete(new Path(p), false))
    hintVersion + 1
  }

  /** Write `df` under `table`/data as parquet files whose columns carry
    * the table's Iceberg FIELD IDS (`parquet.field.id` — the indirection
    * every spec reader, including this repo's, resolves renames through).
    * Files land as `{tag}-NNNNN.parquet` via a tmp-dir + rename pass so a
    * failed write never leaves half-named files inside data/. Returns the
    * final absolute paths in part order. */
  private def writeIdStampedFiles(spark: SparkSession, table: String,
                                  df: DataFrame, fields: Seq[Iceberg.IceField],
                                  tag: String): Seq[String] = {
    val basePath = new Path(table)
    val f = fs(spark, basePath)
    val dataDir = new Path(basePath, "data")
    val tmp = new Path(basePath, s".tmp_$tag")
    f.delete(tmp, true)
    def idMeta(id: Long) =
      new MetadataBuilder().putLong("parquet.field.id", id).build()
    val st = StructType(fields.map(fd => StructField(fd.name,
      Iceberg.sparkType(fd.typ), nullable = true, idMeta(fd.id.toLong))))
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    spark.createDataFrame(df.rdd, st).write.parquet(tmp.toString)
    f.mkdirs(dataDir)
    val parts = f.listStatus(tmp)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath).sortBy(_.getName)
    require(parts.nonEmpty, s"write to $table produced no parquet parts")
    val files = parts.zipWithIndex.map { case (p, i) =>
      val dst = new Path(dataDir, f"$tag%s-$i%05d.parquet")
      // an existing dst under this tag can only be an earlier attempt of
      // the SAME commit (tags are snapshot-id-derived and ids are unique
      // in the history): a retried optimistic commit replaces its own
      // staging, never another writer's files
      if (f.exists(dst)) f.delete(dst, false)
      require(f.rename(p, dst), s"rename to $dst failed")
      dst.toString
    }.toSeq
    f.delete(tmp, true)
    files
  }

  /** Merge per-row-group parquet footer statistics of ONE just-written
    * file into Iceberg single-value-serialized bounds, keyed by field
    * id. A column missing statistics in ANY row group gets no bounds
    * (absent = "unknown" = the reader keeps the file: sound). Driver-
    * side footer read — planning-altitude metadata, no data re-read. */
  /** Entry for a just-written file: footer-derived bounds AND the real
    * `record_count`/`file_size_in_bytes` accounting real manifests carry
    * (what [[Iceberg.filesTable]] surfaces and what a planner sizes
    * compactions from). One driver-side footer probe per file. */
  private def boundedEntry(spark: SparkSession, table: String, file: String,
                           nameToId: Map[String, Int], typById: Map[Int, String],
                           content: Int = 0, equalityIds: Seq[Int] = Nil)
      : Iceberg.Entry = {
    val (lo, hi, rc) = fileBounds(spark, file, nameToId, typById)
    val len = fs(spark, new Path(file)).getFileStatus(new Path(file)).getLen
    Iceberg.Entry(file, 1, content = content, equalityIds = equalityIds,
      lowerBounds = lo, upperBounds = hi, recordCount = rc, fileSizeBytes = len)
  }

  private def fileBounds(spark: SparkSession, file: String,
                         nameToId: Map[String, Int], typById: Map[Int, String])
      : (Seq[(Int, Array[Byte])], Seq[(Int, Array[Byte])], Long) = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile
      .fromPath(new Path(file), spark.sessionState.newHadoopConf())
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val blocks = r.getFooter.getBlocks.asScala
      // columnPath → merged (min, max) across row groups, or dropped
      val merged = scala.collection.mutable.Map.empty[String, (Any, Any)]
      val dead = scala.collection.mutable.Set.empty[String]
      for (b <- blocks; c <- b.getColumns.asScala) {
        val name = c.getPath.toDotString
        if (!dead(name)) {
          val s = c.getStatistics
          if (s == null || s.isEmpty || !s.hasNonNullValue) {
            dead += name; merged.remove(name)
          } else {
            val (mn, mx) = (s.genericGetMin, s.genericGetMax)
            merged.get(name) match {
              case None => merged(name) = (mn, mx)
              case Some((pmn, pmx)) =>
                merged(name) = (minOf(pmn, mn), maxOf(pmx, mx))
            }
          }
        }
      }
      def encode(id: Int, v: Any): Option[Array[Byte]] = typById(id) match {
        case "int" => Some(Iceberg.encodeInt(v.asInstanceOf[Number].intValue))
        case "long" => Some(Iceberg.encodeLong(v.asInstanceOf[Number].longValue))
        case "float" => Some(java.nio.ByteBuffer.allocate(4)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          .putFloat(v.asInstanceOf[Number].floatValue).array())
        case "double" => Some(Iceberg.encodeDouble(v.asInstanceOf[Number].doubleValue))
        case "string" => v match {
          case b: org.apache.parquet.io.api.Binary =>
            Some(Iceberg.encodeString(b.toStringUsingUTF8))
          case _ => None
        }
        case _ => None // temporal/other: no bounds (sound), files still read
      }
      val lo = scala.collection.mutable.ArrayBuffer.empty[(Int, Array[Byte])]
      val hi = scala.collection.mutable.ArrayBuffer.empty[(Int, Array[Byte])]
      for ((name, (mn, mx)) <- merged; id <- nameToId.get(name)) {
        for (b <- encode(id, mn)) lo += ((id, b))
        for (b <- encode(id, mx)) hi += ((id, b))
      }
      (lo.toSeq.sortBy(_._1), hi.toSeq.sortBy(_._1),
        blocks.map(_.getRowCount).sum)
    } finally r.close()
  }

  private def minOf(a: Any, b: Any): Any = if (cmp(a, b) <= 0) a else b
  private def maxOf(a: Any, b: Any): Any = if (cmp(a, b) >= 0) a else b

  private def cmp(a: Any, b: Any): Int = (a, b) match {
    case (x: java.lang.Integer, y: java.lang.Integer) => x.compareTo(y)
    case (x: java.lang.Long, y: java.lang.Long) => x.compareTo(y)
    case (x: java.lang.Float, y: java.lang.Float) => x.compareTo(y)
    case (x: java.lang.Double, y: java.lang.Double) => x.compareTo(y)
    case (x: org.apache.parquet.io.api.Binary, y: org.apache.parquet.io.api.Binary) =>
      // parquet string stats order = unsigned lexicographic on UTF-8
      // bytes; String.compareTo (UTF-16 code-unit order) DISAGREES for
      // supplementary-plane codepoints, so compare via the shared UTF-8
      // byte comparator — the same order the reader's `lt` and the row
      // engine's UTF8String use
      graft.plans.ScopeTerm.utf8Compare(
        x.toStringUsingUTF8, y.toStringUsingUTF8)
    case _ => throw new IllegalStateException(
      s"incomparable footer statistics classes: ${a.getClass} vs ${b.getClass}")
  }
}
