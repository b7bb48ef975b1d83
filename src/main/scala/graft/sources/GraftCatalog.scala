package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, SupportsRead, Table, TableCapability, TableChange, TableCatalog => V2TableCatalog}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import scala.jdk.CollectionConverters._

/** Spark V2 `CatalogPlugin` — the SQL-reachability seam: registers the
  * repo's table formats under a catalog NAME so `spark.sql("SELECT …
  * FROM <cat>.ns.tbl")` and `spark.read.table` work exactly the way the
  * reference consumes its production table through the metastore
  * (`02_geofraud_fraud.py:18` `spark.read.table(tiles)`;
  * `config/configure_notebook.py:18-27` DDL). Install with
  *
  * {{{
  *   spark.sql.catalog.<cat>          = graft.sources.GraftCatalog
  *   spark.sql.catalog.<cat>.registry = /path/to/registry.json   // or
  *   spark.sql.catalog.<cat>.warehouse = /path/to/warehouse
  * }}}
  *
  * Name resolution goes through the SAME [[TableCatalog]] seam the
  * library API uses ([[FileRegistryCatalog]] / [[HadoopWarehouseCatalog]]
  * — one document / one listing, a real REST client swaps in untouched);
  * the FORMAT is sniffed from the location (`_delta_log` ⇒ Delta, else
  * Iceberg metadata), and the rows are served by the repo's own
  * interpreters — [[DeltaLogReader.read]] / [[Iceberg.read]], deletion
  * vectors, column mapping and MoR deletes included.
  *
  * Execution path: `loadTable` returns a [[GraftSqlTable]] carrying the
  * reader closure; the ANALYZER rule
  * [[graft.plans.CatalogTableSubstitution]] (installed by
  * `GraftExtensions`) replaces its `DataSourceV2Relation` with the
  * reader's own logical plan, re-aliased onto the relation's output
  * attributes — the DeltaAnalysis pattern: after substitution Catalyst
  * sees ordinary parquet relations, so filter pushdown, column pruning
  * and partition pruning all work unchanged (PlanAuditSpec pins
  * PushedFilters through the catalog path). Time travel rides the SQL
  * `VERSION AS OF` / `TIMESTAMP AS OF` syntax via the `loadTable`
  * overloads (a Delta version / an Iceberg snapshot id; timestamps in
  * either format).
  *
  * SQL DML rides the formats' OWN commit paths: `INSERT INTO` through
  * the V1Write fallback (Delta optimistic append / Iceberg
  * commitAppend — see [[GraftSqlTable.newWriteBuilder]]) and
  * `DELETE FROM ... WHERE` through SupportsDelete (Delta deletion
  * vectors / Iceberg position deletes) when the predicate translates
  * entirely to source filters. Everything else refuses with the writer
  * entry point named: `createTable`/`alterTable`/`renameTable`/
  * INSERT OVERWRITE, and any DML on a time-traveled load. `dropTable`
  * delegates to a mutable registry (drops the NAME binding only —
  * never data). */
class GraftCatalog extends V2TableCatalog with SupportsNamespaces
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog {

  private var catName: String = _
  private var seam: TableCatalog = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catName = name
    val spark = SparkSession.active
    seam =
      if (options.containsKey("registry"))
        new FileRegistryCatalog(spark, options.get("registry"))
      else if (options.containsKey("warehouse"))
        new HadoopWarehouseCatalog(spark, options.get("warehouse"))
      else throw new IllegalArgumentException(
        s"catalog '$name' needs spark.sql.catalog.$name.registry (a " +
          "FileRegistryCatalog document) or .warehouse (a Hadoop " +
          "warehouse root) to resolve table names")
  }

  override def name(): String = catName

  private def seamName(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).mkString(".")

  private def locate(ident: Identifier): String =
    try seam.locate(seamName(ident))
    catch { case _: IllegalArgumentException => throw new NoSuchTableException(ident) }

  /** The reader closure for (location, travel pin) — format sniffed
    * once per load: a `_delta_log` dir means Delta, Iceberg `metadata`
    * otherwise; a location with neither refuses by name. A load with NO
    * travel pin PINS the version/snapshot current at resolution time, so
    * every expansion of this table object — a self-join's two sides, the
    * substitution re-running — serves ONE consistent state even when a
    * concurrent writer commits mid-analysis (the snapshot-isolation
    * contract spark.read.table users expect). */
  private def readerFor(spark: SparkSession, ident: Identifier, loc: String,
                        isDelta: Boolean,
                        version: Option[String], tsMicros: Option[Long])
      : () => DataFrame = {
    val pinnedVersion = version.map { v =>
      try v.toLong catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"VERSION AS OF '$v' on ${seamName(ident)}: this catalog pins " +
            "numeric versions (a Delta log version / an Iceberg snapshot id)")
      }
    }
    if (isDelta) {
      // TIMESTAMP AS OF resolves to a version HERE, at load — not inside
      // the reread closure — so every expansion of one relation (a
      // self-join's two sides) serves ONE version even when a concurrent
      // commit lands an eligible timestamp mid-analysis (Delta commit
      // timestamps are not guaranteed monotonic; the snapshot-pin
      // contract the version/latest cases already keep)
      val pin: Option[Long] = pinnedVersion.orElse(tsMicros match {
        case Some(us) =>
          val tsMillis = Math.floorDiv(us, 1000L)
          DeltaLogReader.commitTimestamps(spark, loc)
            .filter(_._2 <= tsMillis).lastOption.map(_._1)
          // before-first-commit stays None: the closure routes it to the
          // reader's own refusal with the as-of diagnostics
        case None => Some(DeltaLogReader.latestVersion(spark, loc).getOrElse(
          throw new IllegalArgumentException(
            s"catalog '$catName': no Delta commits at $loc to read")))
      })
      () => (pin, tsMicros) match {
        case (Some(v), _) => deltaReadOrEmpty(spark, loc, Some(v))
        case (_, Some(us)) => // no eligible version: the reader's own refusal
          DeltaLogReader.readAsOfTimestamp(spark, loc, Math.floorDiv(us, 1000L))
        case _ => deltaReadOrEmpty(spark, loc, None)
      }
    } else {
      val curAtLoad =
        if (pinnedVersion.isDefined || tsMicros.isDefined) 1L // unused
        else Iceberg.metadata(spark, loc).path("current-snapshot-id").asLong(-1L)
      if (pinnedVersion.isEmpty && tsMicros.isEmpty && curAtLoad <= 0) {
        // a freshly CREATEd (zero-snapshot) table: the SQL state at load
        // time is EMPTY — serve the typed empty frame from the metadata
        // schema, consistently across every expansion (the pin contract)
        () => icebergEmptyFrame(spark, loc)
      } else {
        val pin: Option[Long] = pinnedVersion.orElse(
          if (tsMicros.isDefined) None else Some(curAtLoad))
        () => (pin, tsMicros) match {
          case (Some(v), _) => Iceberg.readSnapshot(spark, loc, v)
          case (_, Some(us)) => Iceberg.readAsOf(spark, loc, Math.floorDiv(us, 1000L))
          case _ => Iceberg.read(spark, loc)
        }
      }
    }
  }

  /** The typed empty frame for a ZERO-SNAPSHOT Iceberg table (the state
    * `CREATE TABLE` leaves): schema from the metadata document. */
  private def icebergEmptyFrame(spark: SparkSession, loc: String): DataFrame = {
    val fields = Iceberg.currentSchemaFields(Iceberg.metadata(spark, loc))
      .getOrElse(throw new IllegalArgumentException(
        s"Iceberg table at $loc has no snapshots and no schema — nothing " +
          "to type the empty frame from"))
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(fields.map(f => org.apache.spark.sql.types.StructField(
        f.name, Iceberg.sparkType(f.typ), nullable = true))))
  }

  /** SQL read semantics over a ZERO-ADD-FILE Delta table: a typed empty
    * frame from the metaData schemaString (the library API's
    * `read()` refuses instead — a deliberate contract for path callers;
    * SQL SELECT/DELETE over an empty table must be 0 rows, not an
    * error). Mapping metadata is stripped — the empty frame serves
    * LOGICAL names. */
  private def deltaReadOrEmpty(spark: SparkSession, loc: String,
                               asOf: Option[Long]): DataFrame =
    try DeltaLogReader.read(spark, loc, asOf)
    catch { case e: EmptyTableException =>
      // the EMPTY case pays a second replay for the schema; the common
      // non-empty path above pays exactly one (read's own) — and there
      // is no probe-to-read TOCTOU window
      DeltaLogReader.replayState(spark, loc, asOf)._2 match {
        case Some(m) =>
        val declared = org.apache.spark.sql.types.DataType
          .fromJson(m.path("schemaString").asText())
          .asInstanceOf[StructType]
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(declared.fields.map(f =>
            org.apache.spark.sql.types.StructField(f.name, f.dataType, f.nullable))))
        case None => throw e // no metaData to type an empty frame from
      }
    }

  /** The DELETE closure for `DELETE FROM ... WHERE` (the SupportsDelete
    * seam): the translated predicate runs through the format writers'
    * own row-level deletes — Delta's deletion-vector commit, Iceberg's
    * position-delete snapshot. Spark only plans this path when the WHERE
    * translates entirely to source filters; anything else errors in
    * analysis (the canDeleteWhere gate). */
  private def deleterFor(spark: SparkSession, loc: String,
                         isDelta: Boolean): org.apache.spark.sql.Column => Unit =
    if (isDelta) { cond =>
      // SQL semantics: DELETE on an empty table is a 0-row no-op, not
      // the library API's has-no-active-files refusal — caught here
      // rather than pre-probed, so the common path replays the log once
      try { DeltaLogWriter.deleteWhere(spark, loc, cond); () }
      catch { case _: EmptyTableException => () }
    }
    else { cond =>
      // same 0-row no-op semantics for a zero-snapshot (just-CREATEd)
      // Iceberg table
      try {
        IcebergWriter.deleteWhere(spark, loc, cond,
          GraftCatalog.freshSnapshotId(), System.currentTimeMillis())
        ()
      } catch { case _: EmptyTableException => () }
    }

  /** The APPEND closure for `INSERT INTO` (the V1Write seam): rows land
    * through the format writers' own append paths — Delta's optimistic
    * append (schema + partition layout validated against metaData, the
    * commit race retried) with the table's partition columns carried
    * through, Iceberg's commitAppend (stored-spec partitioned writes
    * included) under a fresh snapshot id. Time-traveled loads get None:
    * inserting into a pinned historical read is meaningless. */
  private def appenderFor(spark: SparkSession, loc: String,
                          isDelta: Boolean): DataFrame => Unit =
    if (isDelta) { df =>
      // Spark's output resolver already cast/aligned the frame to the
      // table schema; appendOptimistic enforces the rest (shape drift,
      // blind-append obligations, the NOT-NULL runtime guard). A
      // NAME-mapped table (the state SQL RENAME COLUMN leaves) appends
      // through write()'s physical-name projection instead — the
      // optimistic retry is the trade for keeping the mapped INSERT
      // working the day after the rename
      val meta = DeltaLogReader.replayState(spark, loc, None)._2
      val partCols = meta.map(_.path("partitionColumns")).toSeq
        .flatMap(n => (0 until n.size()).map(n.get(_).asText()))
      if (meta.exists(m => DeltaLogReader.mappingMode(m) == "name"))
        DeltaLogWriter.write(df, loc,
          mode = org.apache.spark.sql.SaveMode.Append, partitionBy = partCols)
      else
        DeltaLogWriter.appendOptimistic(df, loc, partitionBy = partCols)
      ()
    } else { df =>
      // a foreign schema's REQUIRED fields are a contract this writer's
      // all-optional field model would silently weaken (commitAppend
      // re-emits the schema with required=false) — refuse up front. The
      // CURRENT schema only, resolved exactly the way currentSchemaFields
      // does (schemas[current-schema-id] with the v1 top-level `schema`
      // fallback): a legacy layout must not bypass the guard, and a
      // field required only in a SUPERSEDED schema must not refuse
      val requiredFields = Iceberg.currentSchemaNode(Iceberg.metadata(spark, loc))
        .toSeq.flatMap(_.path("fields").elements().asScala)
        .filter(_.path("required").asBoolean(false))
        .map(_.path("name").asText("")).distinct
      require(requiredFields.isEmpty,
        s"Iceberg table at $loc declares REQUIRED field(s) " +
          s"${requiredFields.mkString(", ")} — this writer models all " +
          "columns optional and would re-emit them as such, weakening " +
          "the table's contract; refusing SQL inserts")
      IcebergWriter.commitAppendOptimistic(spark, loc, df,
        GraftCatalog.freshSnapshotId(), System.currentTimeMillis())
      ()
    }

  /** The UPDATE closure for `UPDATE ... SET ... WHERE` (the
    * [[graft.plans.CatalogTableSubstitution]] DML rewrite): assignments
    * + predicate run through the format writers' single-commit updates —
    * Delta's DV-kill + re-append, Iceberg's position-delete + data
    * manifest — so a reader never observes a half-updated table. SQL
    * semantics on an empty/just-created table: a 0-row no-op, not the
    * library API's refusal. */
  private def updaterFor(spark: SparkSession, loc: String, isDelta: Boolean)
      : (Seq[(String, org.apache.spark.sql.Column)], org.apache.spark.sql.Column) => Unit =
    if (isDelta) { (assignments, cond) =>
      try { DeltaLogWriter.updateWhere(spark, loc, cond, assignments); () }
      catch { case _: EmptyTableException => () }
    }
    else { (assignments, cond) =>
      try {
        IcebergWriter.updateWhere(spark, loc, cond, assignments,
          GraftCatalog.freshSnapshotId(), System.currentTimeMillis())
        ()
      } catch { case _: EmptyTableException => () }
    }

  /** The MERGE closure for the canonical upsert-shaped `MERGE INTO`
    * (`WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *`):
    * one keyed-upsert commit through the writers' MoR machinery — Delta
    * DV-kills matching keys and appends the batch; Iceberg commits an
    * equality delete + append at one sequence number. */
  private def upserterFor(spark: SparkSession, loc: String, isDelta: Boolean)
      : (DataFrame, Seq[String]) => Unit =
    if (isDelta) { (df, keys) =>
      // MERGE into an EMPTY (just-CREATEd) table is the SQL bootstrap
      // pattern: every row is new, so the batch appends — the same
      // closure INSERT INTO commits through
      try { DeltaLogWriter.upsert(spark, loc, df, keys); () }
      catch { case _: EmptyTableException =>
        appenderFor(spark, loc, isDelta = true)(df) }
    }
    else { (df, keys) =>
      try {
        IcebergWriter.upsert(spark, loc, df, keys,
          GraftCatalog.freshSnapshotId(), System.currentTimeMillis())
        ()
      } catch { case _: EmptyTableException =>
        appenderFor(spark, loc, isDelta = false)(df) }
    }

  /** The OVERWRITE closure for `INSERT OVERWRITE` (the V1Write seam with
    * `overwrite = true`): Delta's Overwrite commit (remove every active
    * file + add the new generation, ONE log entry) / Iceberg's REPLACE
    * snapshot ([[IcebergWriter.commitOverwrite]] — only the new manifest
    * in the list, prior snapshots intact for time travel). */
  private def overwriterFor(spark: SparkSession, loc: String,
                            isDelta: Boolean): DataFrame => Unit =
    if (isDelta) { df =>
      val partCols = DeltaLogReader.replayState(spark, loc, None)._2
        .map(_.path("partitionColumns")).toSeq
        .flatMap(n => (0 until n.size()).map(n.get(_).asText()))
      DeltaLogWriter.write(df, loc,
        mode = org.apache.spark.sql.SaveMode.Overwrite, partitionBy = partCols)
      ()
    } else { df =>
      IcebergWriter.commitOverwrite(spark, loc, df,
        GraftCatalog.freshSnapshotId(), System.currentTimeMillis())
      ()
    }

  private def load(ident: Identifier, version: Option[String],
                   tsMicros: Option[Long]): Table = {
    val spark = SparkSession.active
    val loc = locate(ident)
    // ONE format sniff per load, shared by the reader and the appender
    val f = new Path(loc).getFileSystem(spark.sessionState.newHadoopConf())
    val isDelta = f.exists(new Path(loc, "_delta_log"))
    val isIceberg = !isDelta && f.exists(new Path(loc, "metadata"))
    if (!isDelta && !isIceberg) throw new IllegalArgumentException(
      s"catalog '$catName' resolves '${seamName(ident)}' to $loc, which " +
        "holds neither a Delta log nor Iceberg metadata — refusing a " +
        "format guess")
    val reread = readerFor(spark, ident, loc, isDelta, version, tsMicros)
    // ONE replay for the common single-reference query: the plan built
    // here for the schema is the same one the substitution rule serves
    // on its first expansion; later expansions rebuild fresh
    val first = reread()
    // inspection surface (DESCRIBE / SHOW TBLPROPERTIES / SHOW
    // PARTITIONS): partition layout + table properties from the
    // format's own metadata — one extra planning-scale metadata read
    val (identParts, transformParts, tableProps) = inspectionInfo(spark, loc, isDelta)
    val travelled = version.isDefined || tsMicros.isDefined
    val appender = if (travelled) None else Some(appenderFor(spark, loc, isDelta))
    val deleter = if (travelled) None else Some(deleterFor(spark, loc, isDelta))
    val updater = if (travelled) None else Some(updaterFor(spark, loc, isDelta))
    val upserter = if (travelled) None else Some(upserterFor(spark, loc, isDelta))
    val overwriter = if (travelled) None else Some(overwriterFor(spark, loc, isDelta))
    new GraftSqlTable(s"$catName.${seamName(ident)}", first.schema, reread,
      first, appender, deleter, updater, upserter, overwriter,
      loc = loc, isDelta = isDelta, travelled = travelled,
      identParts = identParts, transformParts = transformParts,
      tableProps = tableProps)
  }

  /** DESCRIBE/SHOW metadata from the format's own documents: IDENTITY
    * partition columns with their types (the SHOW PARTITIONS domain),
    * every partition transform with its source column (DESCRIBE's
    * "# Partitioning" block), and table properties (location + provider
    * + the format's own configuration). */
  private def inspectionInfo(spark: SparkSession, loc: String, isDelta: Boolean)
      : (Seq[(String, org.apache.spark.sql.types.DataType)],
         Seq[(String, String)], Map[String, String]) = {
    import org.apache.spark.sql.types.{DataType, StringType, StructType}
    if (isDelta) {
      DeltaLogReader.replayState(spark, loc, None)._2 match {
        case Some(m) =>
          val schema = scala.util.Try(DataType
            .fromJson(m.path("schemaString").asText(""))
            .asInstanceOf[StructType]).toOption
          val pc = m.path("partitionColumns")
          val names = (0 until pc.size()).map(pc.get(_).asText())
          val typed = names.map(n => n -> schema
            .flatMap(s => s.fields.find(_.name == n)).map(_.dataType)
            .getOrElse(StringType))
          val conf = scala.collection.mutable.Map.empty[String, String]
          val it = m.path("configuration").fields()
          while (it.hasNext) { val e = it.next(); conf(e.getKey) = e.getValue.asText("") }
          (typed, names.map(n => ("identity", n)),
            Map("provider" -> "delta", "location" -> loc) ++ conf)
        case None =>
          (Nil, Nil, Map("provider" -> "delta", "location" -> loc))
      }
    } else {
      val doc = Iceberg.metadata(spark, loc)
      val fields = Iceberg.currentSchemaFields(doc).getOrElse(Nil)
      val specs = Iceberg.partitionSpecs(doc)
      val defaultId = doc.path("default-spec-id").asInt(0)
      val sf = specs.getOrElse(defaultId, specs.values.headOption.getOrElse(Nil))
      val transforms = sf.map(f => (f.transform,
        fields.find(_.id == f.sourceId).map(_.name).getOrElse(f.name)))
      val identCols =
        if (sf.nonEmpty && sf.forall(_.transform == "identity"))
          sf.flatMap(f => fields.find(_.id == f.sourceId)
            .map(src => src.name -> Iceberg.sparkType(src.typ)))
        else Nil
      (identCols, transforms,
        Map("provider" -> "iceberg", "location" -> loc,
          "format-version" -> doc.path("format-version").asInt(1).toString))
    }
  }

  override def loadTable(ident: Identifier): Table = load(ident, None, None)

  /** `VERSION AS OF` — a Delta log version / an Iceberg snapshot id. */
  override def loadTable(ident: Identifier, version: String): Table =
    load(ident, Some(version), None)

  /** `TIMESTAMP AS OF` — Spark hands MICROseconds since the epoch. */
  override def loadTable(ident: Identifier, timestamp: Long): Table =
    load(ident, None, Some(timestamp))

  override def tableExists(ident: Identifier): Boolean =
    try { locate(ident); true } catch { case _: NoSuchTableException => false }

  override def listTables(namespace: Array[String]): Array[Identifier] =
    seam.tables(namespace.mkString("."))
      .map(t => Identifier.of(namespace, t)).toArray

  override def dropTable(ident: Identifier): Boolean = seam match {
    case m: MutableTableCatalog =>
      try { m.drop(seamName(ident)); true }
      catch { case _: IllegalArgumentException => false }
    case _ => throw new UnsupportedOperationException(
      s"catalog '$catName' resolves through an immutable catalog — drop " +
        "the table where it is registered")
  }

  /** `CREATE TABLE <cat>.ns.t (...) USING delta|iceberg [PARTITIONED BY
    * (cols…)] [LOCATION '…']` — the reference's own DDL pattern
    * (`config/configure_notebook.py:18-27`). The table is created EMPTY
    * through the format writers (a metaData-only Delta commit 0 / a
    * zero-snapshot Iceberg metadata v1), at the LOCATION property, the
    * warehouse convention path (registry catalogs REQUIRE the explicit
    * LOCATION); a mutable registry gets the name binding. IDENTITY
    * partitioning only: SQL `PARTITIONED BY (day(ts))` arrives as a
    * non-identity Transform and refuses by name — transform-partitioned
    * Iceberg tables come from `IcebergWriter.createTable`. */
  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: java.util.Map[String, String]): Table = {
    val spark = SparkSession.active
    if (tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(ident)
    val provider = Option(properties.get("provider"))
      .map(_.toLowerCase(java.util.Locale.ROOT)).getOrElse("delta")
    require(provider == "delta" || provider == "iceberg",
      s"catalog '$catName' creates delta or iceberg tables; USING $provider " +
        "is not a format this engine writes")
    val partCols = partitions.toSeq.map { t =>
      val refs = t.references()
      if (t.name() == "identity" && refs.length == 1 &&
          refs.head.fieldNames().length == 1) refs.head.fieldNames().head
      else throw new UnsupportedOperationException(
        s"PARTITIONED BY transform '$t' — this catalog creates " +
          "identity-partitioned tables; transform-partitioned Iceberg " +
          "tables come from IcebergWriter.createTable")
    }
    val loc = seam match {
      case w: HadoopWarehouseCatalog =>
        // a warehouse seam binds names by CONVENTION PATH only (it is
        // not a MutableTableCatalog) — an explicit LOCATION elsewhere
        // would write the data and then never resolve the name, failing
        // AFTER side effects with an orphaned table; refuse up front,
        // before any data lands
        val conv = w.locationFor(seamName(ident))
        Option(properties.get("location")).foreach { l =>
          require(new Path(l).toUri.getPath.stripSuffix("/") ==
              new Path(conv).toUri.getPath.stripSuffix("/"),
            s"catalog '$catName' resolves names by warehouse convention — " +
              s"LOCATION '$l' would create a table the name " +
              s"'${seamName(ident)}' can never resolve (convention path: " +
              s"$conv); omit LOCATION, or register through a mutable " +
              "registry catalog instead")
        }
        conv
      case _: MutableTableCatalog => Option(properties.get("location"))
        .getOrElse(throw new IllegalArgumentException(
          s"catalog '$catName' resolves through a registry — CREATE TABLE " +
            "needs an explicit LOCATION '…' clause"))
      case _ => throw new UnsupportedOperationException(
        s"catalog '$catName' resolves through an immutable catalog with " +
          "no convention path — CREATE TABLE cannot bind the name; " +
          "register the table where the catalog is maintained")
    }
    val emptyDf = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(schema.fields.map(f =>
        org.apache.spark.sql.types.StructField(f.name, f.dataType, f.nullable))))
    if (provider == "delta")
      DeltaLogWriter.write(emptyDf, loc, partitionBy = partCols)
    else
      IcebergWriter.createTable(spark, loc, emptyDf.schema, partCols)
    seam match {
      case m: MutableTableCatalog => m.register(seamName(ident), loc)
      case _ => ()
    }
    loadTable(ident)
  }

  /** `ALTER TABLE` — schema evolution and table properties routed to the
    * format writers' own metadata commits: ADD COLUMN (Delta: a new
    * nullable field in the schemaString, old files null-fill under the
    * declared-schema scan; Iceberg: a fresh-field-id append, the spec's
    * id-not-name core), RENAME COLUMN (Delta: name-mode mapping
    * required, the writer's own precondition; Iceberg: a pure id-keyed
    * swap), DROP COLUMN (Iceberg only), and SET TBLPROPERTIES (Delta —
    * setting `delta.columnMapping.mode=name` routes to the full
    * enableColumnMapping upgrade so the ids/physicalNames land with it).
    * Everything else refuses by change kind. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val spark = SparkSession.active
    val loc = locate(ident)
    val f = new Path(loc).getFileSystem(spark.sessionState.newHadoopConf())
    val isDelta = f.exists(new Path(loc, "_delta_log"))
    def one(names: Array[String], what: String): String = {
      if (names.length != 1) throw new UnsupportedOperationException(
        s"ALTER TABLE ${seamName(ident)}: $what of nested field " +
          s"'${names.mkString(".")}' — this catalog evolves top-level columns only")
      names.head
    }
    changes.foreach {
      case add: TableChange.AddColumn =>
        val name = one(add.fieldNames(), "ADD COLUMN")
        if (!add.isNullable) throw new UnsupportedOperationException(
          s"ALTER TABLE ${seamName(ident)} ADD COLUMN $name NOT NULL — " +
            "existing rows have no value to satisfy the constraint; add it nullable")
        if (add.position() != null) throw new UnsupportedOperationException(
          s"ALTER TABLE ${seamName(ident)} ADD COLUMN $name FIRST/AFTER — " +
            "this catalog appends columns at the end only")
        if (isDelta) DeltaLogWriter.addColumn(spark, loc, name, add.dataType())
        else IcebergWriter.addColumn(spark, loc, name,
          IcebergWriter.iceType(add.dataType()))
      case rn: TableChange.RenameColumn =>
        val from = one(rn.fieldNames(), "RENAME COLUMN")
        if (isDelta) DeltaLogWriter.renameColumn(spark, loc, from, rn.newName())
        else IcebergWriter.renameColumn(spark, loc, from, rn.newName())
      case dc: TableChange.DeleteColumn =>
        val name = one(dc.fieldNames(), "DROP COLUMN")
        if (isDelta) throw new UnsupportedOperationException(
          s"ALTER TABLE ${seamName(ident)} DROP COLUMN $name — dropping a " +
            "Delta column is a data-rewriting operation this catalog does " +
            "not run; Iceberg tables drop by field id")
        else IcebergWriter.dropColumn(spark, loc, name)
      case sp: TableChange.SetProperty =>
        if (!isDelta) throw new UnsupportedOperationException(
          s"ALTER TABLE ${seamName(ident)} SET TBLPROPERTIES — this " +
            "writer keeps no Iceberg table-property surface")
        else if (sp.property() == "delta.columnMapping.mode" && sp.value() == "name")
          DeltaLogWriter.enableColumnMapping(spark, loc)
        else DeltaLogWriter.setTableProperties(spark, loc,
          Map(sp.property() -> sp.value()))
      case other => throw new UnsupportedOperationException(
        s"ALTER TABLE ${seamName(ident)}: change ${other.getClass.getSimpleName} " +
          "is not supported — ADD/RENAME/DROP COLUMN and SET TBLPROPERTIES only")
    }
    loadTable(ident)
  }

  /** `ALTER TABLE ... RENAME TO` — a pure NAME-binding move on a mutable
    * registry (the data never moves); warehouse/immutable seams refuse
    * (their binding IS the path). */
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    seam match {
      case m: MutableTableCatalog =>
        val loc = locate(oldIdent)
        if (tableExists(newIdent))
          throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(newIdent)
        m.register(seamName(newIdent), loc)
        m.drop(seamName(oldIdent))
      case _ => throw new UnsupportedOperationException(
        s"catalog '$catName' resolves names by convention path — RENAME " +
          "cannot rebind them; register through a mutable registry catalog")
    }

  // ---------------------------------------------------- ProcedureCatalog

  /** (location, isDelta) for a maintenance target — format sniffed by
    * the `_delta_log` marker, unknown names refuse with the catalog
    * named. Shared by the CALL procedures and the SQL OPTIMIZE
    * statement. */
  private[graft] def locateAndSniff(tableName: String): (String, Boolean) = {
    val spark = SparkSession.active
    val loc = try seam.locate(tableName)
      catch { case _: IllegalArgumentException =>
        throw new IllegalArgumentException(
          s"CALL on catalog '$catName': unknown table '$tableName'") }
    val f = new Path(loc).getFileSystem(spark.sessionState.newHadoopConf())
    (loc, f.exists(new Path(loc, "_delta_log")))
  }

  /** `OPTIMIZE <table> [WHERE <partition equality>] [ZORDER BY (cols)]`
    * — the SQL maintenance statement ([[graft.plans.GraftSqlParser]]
    * parses it; the reference's own notebooks type it,
    * `01_geofraud_clustering.py:440`). A `where` scope narrows the
    * rewrite to the named partitions' files on BOTH formats: Delta via
    * [[DeltaLogWriter.optimize]]'s partitionFilter, Iceberg via
    * [[IcebergWriter.compactScoped]] (untouched files re-emitted
    * EXISTING with original attribution); identity/hive partitions
    * only, everything else refuses by name. Routed to
    * the SAME writer passes as `CALL <cat>.system.optimize(...)`:
    * Delta's bin-pack/clustered rewrite or Iceberg's clustered
    * compaction. With ZORDER columns, Delta clusters on the
    * [[graft.plans.ZOrderClustering]] key (true Morton interleave for
    * two columns, the reference's `(user, h3)` shape); Iceberg routes
    * the columns through `compact(sortBy = ...)` — its lexicographic
    * clustered rewrite, whose pruned-scan law q254 pins. */
  def optimizeZOrder(spark: SparkSession, tableName: String,
                     zorderBy: Seq[String],
                     targetFileBytes: Long = 128L << 20,
                     where: Seq[graft.plans.ScopeTerm] = Nil)
      : Seq[(String, Long)] = {
    val (loc, isDelta) = locateAndSniff(tableName)
    if (isDelta) {
      val cluster =
        if (zorderBy.isEmpty) Nil
        else {
          // cluster-key stats (numeric min/max, string rank boundaries)
          // over the rows actually being REWRITTEN: a partition-scoped
          // OPTIMIZE spends its ordinal range on the scoped values
          val state = DeltaLogWriter.readScoped(spark, loc, where)
          graft.plans.ZOrderClustering.clusterKey(state, zorderBy)
        }
      Seq("committed_version" -> DeltaLogWriter.optimize(
        spark, loc, targetFileBytes, clusterBy = cluster,
        partitionFilter = where))
    } else if (where.isEmpty)
      Seq("metadata_version" -> IcebergWriter.compact(
        spark, loc, GraftCatalog.freshSnapshotId(),
        System.currentTimeMillis(), targetFileBytes,
        sortBy = zorderBy).toLong)
    else
      Seq("metadata_version" -> IcebergWriter.compactScoped(
        spark, loc, GraftCatalog.freshSnapshotId(),
        System.currentTimeMillis(), where, sortBy = zorderBy).toLong)
  }

  /** The `CALL`-style MAINTENANCE surface (`CALL <cat>.system.optimize
    * ('ns.t')` …) — the operational statements a warehouse user runs on
    * a schedule, routed to the format writers' own maintenance passes:
    *
    *   - `optimize(table, target_file_bytes?)` — Delta bin-packing
    *     rewrite / Iceberg compaction (both purge MoR deletes);
    *   - `vacuum(table, older_than_ms)` — Delta unreferenced-file GC
    *     (Iceberg refuses by name: its GC is expire_snapshots);
    *   - `expire_snapshots(table, older_than_ms)` — Iceberg history
    *     GC (Delta refuses by name: vacuum);
    *   - `rewrite_manifests(table)` — Iceberg metadata compaction.
    *
    * Each returns one (metric, value) result row through a LocalScan —
    * committed version / files removed — so the CALL's outcome is
    * SQL-visible. */
  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure = {
    import org.apache.spark.sql.types.{LongType, StringType}
    val ns = ident.namespace()
    require(ns.isEmpty || ns.sameElements(Array("system")),
      s"catalog '$catName' keeps its procedures under the 'system' " +
        s"namespace — CALL $catName.system.${ident.name()}(...)")
    def p(n: String, t: org.apache.spark.sql.types.DataType) =
      org.apache.spark.sql.connector.catalog.procedures.ProcedureParameter
        .in(n, t).build()
    def pd(n: String, t: org.apache.spark.sql.types.DataType, default: String) =
      org.apache.spark.sql.connector.catalog.procedures.ProcedureParameter
        .in(n, t).defaultValue(default).build()
    def sniff(tableName: String): (String, Boolean) =
      locateAndSniff(tableName)
    ident.name().toLowerCase(java.util.Locale.ROOT) match {
      case "optimize" => new GraftProcedure("optimize",
        Array(p("table", StringType),
          pd("target_file_bytes", LongType, (128L << 20).toString)),
        row => {
          val (loc, isDelta) = sniff(row.getUTF8String(0).toString)
          val target = row.getLong(1)
          val spark = SparkSession.active
          if (isDelta)
            Seq(("committed_version",
              DeltaLogWriter.optimize(spark, loc, targetFileBytes = target)))
          else
            Seq(("metadata_version", IcebergWriter.compact(spark, loc,
              GraftCatalog.freshSnapshotId(), System.currentTimeMillis(),
              targetFileBytes = target).toLong))
        })
      case "vacuum" => new GraftProcedure("vacuum",
        Array(p("table", StringType), p("older_than_ms", LongType)),
        row => {
          val (loc, isDelta) = sniff(row.getUTF8String(0).toString)
          require(isDelta,
            s"vacuum runs on Delta tables — Iceberg history GC is " +
              s"CALL $catName.system.expire_snapshots(...)")
          Seq(("files_removed", DeltaLogWriter.vacuum(
            SparkSession.active, loc, row.getLong(1)).toLong))
        })
      case "expire_snapshots" => new GraftProcedure("expire_snapshots",
        Array(p("table", StringType), p("older_than_ms", LongType)),
        row => {
          val (loc, isDelta) = sniff(row.getUTF8String(0).toString)
          require(!isDelta,
            s"expire_snapshots runs on Iceberg tables — Delta GC is " +
              s"CALL $catName.system.vacuum(...)")
          Seq(("metadata_version", IcebergWriter.expireSnapshots(
            SparkSession.active, loc, row.getLong(1)).toLong))
        })
      case "rewrite_manifests" => new GraftProcedure("rewrite_manifests",
        Array(p("table", StringType)),
        row => {
          val (loc, isDelta) = sniff(row.getUTF8String(0).toString)
          require(!isDelta,
            "rewrite_manifests is Iceberg metadata compaction — Delta " +
              s"log maintenance is checkpointing (cleanLog), not a CALL")
          Seq(("metadata_version", IcebergWriter.rewriteManifests(
            SparkSession.active, loc,
            GraftCatalog.freshSnapshotId(), System.currentTimeMillis()).toLong))
        })
      case other => throw new UnsupportedOperationException(
        s"catalog '$catName' has no procedure '$other' — it serves " +
          "optimize, vacuum, expire_snapshots, rewrite_manifests")
    }
  }

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.sameElements(Array("system")))
      Array("optimize", "vacuum", "expire_snapshots", "rewrite_manifests")
        .map(Identifier.of(Array("system"), _))
    else Array.empty

  // ------------------------------------------------- SupportsNamespaces

  override def listNamespaces(): Array[Array[String]] = seam match {
    case r: FileRegistryCatalog => r.namespaces().map(_.split('.')).toArray
    case _ => Array.empty
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException(namespace)

  override def namespaceExists(namespace: Array[String]): Boolean =
    seam.tables(namespace.mkString(".")).nonEmpty

  override def loadNamespaceMetadata(namespace: Array[String])
      : java.util.Map[String, String] =
    if (namespaceExists(namespace)) java.util.Collections.emptyMap()
    else throw new NoSuchNamespaceException(namespace)

  override def createNamespace(namespace: Array[String],
                               metadata: java.util.Map[String, String]): Unit =
    throw new UnsupportedOperationException(
      s"catalog '$catName' derives namespaces from registered tables — " +
        "register a table to create one")

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      s"catalog '$catName' keeps no namespace metadata")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean =
    throw new UnsupportedOperationException(
      s"catalog '$catName' derives namespaces from registered tables — " +
        "drop the tables instead")
}

/** The DSv2 `Table` a [[GraftCatalog]] load returns: a carrier for the
  * reader closure the [[graft.plans.CatalogTableSubstitution]] analyzer
  * rule expands — `reread()` yields a FRESH plan (fresh expression ids)
  * per relation, so self-joins of one catalog table never alias; the
  * FIRST expansion reuses the plan [[GraftCatalog.load]] already built
  * for the schema (one metadata replay per single-reference query), and
  * the pinned version makes every rebuild content-identical. The
  * `newScanBuilder` refusal is the loud failure mode for a session
  * missing `GraftExtensions`: the table must never execute through a
  * scan this class does not implement. */
private[graft] class GraftSqlTable(tableName: String,
                                   tableSchema: StructType,
                                   rereadFresh: () => DataFrame,
                                   first: DataFrame,
                                   appender: Option[DataFrame => Unit] = None,
                                   deleter: Option[org.apache.spark.sql.Column => Unit] = None,
                                   updater: Option[(Seq[(String, org.apache.spark.sql.Column)], org.apache.spark.sql.Column) => Unit] = None,
                                   upserter: Option[(DataFrame, Seq[String]) => Unit] = None,
                                   overwriter: Option[DataFrame => Unit] = None,
                                   loc: String = "",
                                   isDelta: Boolean = true,
                                   travelled: Boolean = false,
                                   identParts: Seq[(String, org.apache.spark.sql.types.DataType)] = Nil,
                                   transformParts: Seq[(String, String)] = Nil,
                                   tableProps: Map[String, String] = Map.empty)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsDelete
    with org.apache.spark.sql.connector.catalog.SupportsPartitionManagement {
  private val servedFirst = new java.util.concurrent.atomic.AtomicBoolean(false)
  def reread(): DataFrame =
    if (servedFirst.compareAndSet(false, true)) first else rereadFresh()
  /** UPDATE seam for [[graft.plans.CatalogTableSubstitution]]'s DML
    * rewrite — None when the table was loaded time-traveled. */
  private[graft] def update
      : Option[(Seq[(String, org.apache.spark.sql.Column)], org.apache.spark.sql.Column) => Unit] =
    updater
  /** Keyed-upsert seam for the canonical MERGE INTO rewrite — None when
    * the table was loaded time-traveled. */
  private[graft] def merge: Option[(DataFrame, Seq[String]) => Unit] = upserter
  /** Append seam for the insert-only MERGE shape — same closure the
    * V1Write INSERT INTO path commits through. */
  private[graft] def append: Option[DataFrame => Unit] = appender
  /** Location + format for the by-name STREAMING read
    * ([[graft.plans.CatalogTableSubstitution]] builds the V1 streaming
    * relation from these); a time-traveled load refuses to stream. */
  private[graft] def location: String = loc
  private[graft] def isDeltaTable: Boolean = isDelta
  private[graft] def isTravelled: Boolean = travelled
  override def name(): String = tableName
  override def schema(): StructType = tableSchema

  /** DESCRIBE's "# Partitioning" block — every partition transform from
    * the format's own metadata (identity columns, Iceberg's hidden
    * transforms by name). */
  override def partitioning(): Array[Transform] = {
    import org.apache.spark.sql.connector.expressions.Expressions
    transformParts.map {
      case ("identity", c) => Expressions.identity(c)
      case (t, c) if Set("day", "days")(t) => Expressions.days(c)
      case (t, c) if Set("month", "months")(t) => Expressions.months(c)
      case (t, c) if Set("year", "years")(t) => Expressions.years(c)
      case (t, c) if Set("hour", "hours")(t) => Expressions.hours(c)
      case (t, c) if t.startsWith("bucket[") =>
        Expressions.bucket(t.stripPrefix("bucket[").stripSuffix("]").toInt, c)
      case (t, c) if t.startsWith("truncate[") =>
        Expressions.apply("truncate",
          Expressions.literal(Int.box(
            t.stripPrefix("truncate[").stripSuffix("]").toInt)),
          Expressions.column(c))
      case (t, c) => Expressions.apply(t, Expressions.column(c))
    }.toArray
  }

  /** SHOW TBLPROPERTIES / DESCRIBE EXTENDED surface: location +
    * provider + the format's own configuration. */
  override def properties(): java.util.Map[String, String] = {
    val m = new java.util.HashMap[String, String]()
    tableProps.foreach { case (k, v) => m.put(k, v) }
    m
  }

  // ------------------------------------ SupportsPartitionManagement
  // (the SHOW PARTITIONS read surface only — partition DDL refuses:
  // both formats derive partitions from data, never from DDL)

  /** SHOW PARTITIONS' domain: IDENTITY partition columns with their
    * table types. Hidden (transformed) partitioning refuses — its
    * partition values are derived, not column values. */
  override def partitionSchema(): StructType = {
    if (identParts.isEmpty && transformParts.nonEmpty)
      throw new UnsupportedOperationException(
        s"table $tableName is partitioned by transforms " +
          s"(${transformParts.map { case (t, c) => s"$t($c)" }.mkString(", ")}) — " +
          "SHOW PARTITIONS serves identity partitioning only; inspect the " +
          "metadata tables instead")
    StructType(identParts.map { case (n, t) =>
      org.apache.spark.sql.types.StructField(n, t, nullable = true) })
  }

  /** Distinct live partition tuples — a partition-column-only distinct
    * over the table's own read (metadata-only for hive-laid-out Delta
    * under OptimizeMetadataOnlyQuery; a column-pruned scan otherwise),
    * optionally filtered by the `PARTITION (k = v, ...)` prefix Spark
    * hands through. */
  override def listPartitionIdentifiers(
      names: Array[String],
      ident: org.apache.spark.sql.catalyst.InternalRow)
      : Array[org.apache.spark.sql.catalyst.InternalRow] = {
    val ps = partitionSchema()
    if (ps.isEmpty) return Array.empty
    require(names.forall(n => ps.fieldNames.contains(n)),
      s"SHOW PARTITIONS filter names ${names.mkString(", ")} are not " +
        s"partition columns of $tableName (${ps.fieldNames.mkString(", ")})")
    import org.apache.spark.sql.functions.col
    var df = reread().select(ps.fieldNames.map(n => col(s"`$n`")).toIndexedSeq: _*)
      .distinct()
    names.zipWithIndex.foreach { case (n, i) =>
      val v = ident.get(i, ps(ps.fieldIndex(n)).dataType)
      val lit = org.apache.spark.sql.functions.lit(
        org.apache.spark.sql.catalyst.CatalystTypeConverters
          .convertToScala(v, ps(ps.fieldIndex(n)).dataType))
      df = df.where(col(s"`$n`") <=> lit)
    }
    val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters
      .createToCatalystConverter(ps)
    df.collect().map(r =>
      conv(r).asInstanceOf[org.apache.spark.sql.catalyst.InternalRow])
  }

  override def createPartition(ident: org.apache.spark.sql.catalyst.InternalRow,
                               properties: java.util.Map[String, String]): Unit =
    throw new UnsupportedOperationException(
      s"table $tableName derives partitions from DATA — write rows " +
        "instead of creating partitions")

  override def dropPartition(ident: org.apache.spark.sql.catalyst.InternalRow): Boolean =
    throw new UnsupportedOperationException(
      s"table $tableName derives partitions from DATA — DELETE the rows instead")

  override def replacePartitionMetadata(
      ident: org.apache.spark.sql.catalyst.InternalRow,
      properties: java.util.Map[String, String]): Unit =
    throw new UnsupportedOperationException(
      s"table $tableName keeps no per-partition metadata")

  override def loadPartitionMetadata(ident: org.apache.spark.sql.catalyst.InternalRow)
      : java.util.Map[String, String] =
    java.util.Collections.emptyMap()
  override def capabilities(): java.util.Set[TableCapability] =
    // TRUNCATE makes `INSERT OVERWRITE` plan (Spark spells a static
    // overwrite as OverwriteByExpression(true) and gates on it); the
    // V1 write below receives overwrite=true and routes to the formats'
    // own overwrite commits
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)
  /** A PLAN-ONLY scan stub: `DELETE FROM` planning runs the target
    * relation through V2 scan pushdown even though the delete itself is
    * metadata-only (DataSourceV2Strategy expects a ScanRelation), so the
    * builder must succeed at PLANNING time. Actually executing it —
    * which can only happen when a read relation survived analysis, i.e.
    * the substitution rule is not installed — fails loudly with the
    * remedy named. */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): org.apache.spark.sql.connector.read.Scan =
        new org.apache.spark.sql.connector.read.Scan {
          override def readSchema(): StructType = tableSchema
          override def description(): String = tableName
          override def toBatch: org.apache.spark.sql.connector.read.Batch =
            throw new IllegalStateException(
              s"table $tableName resolved through GraftCatalog but the " +
                "substitution rule did not fire — install " +
                "graft.plans.GraftExtensions on this session " +
                "(spark.sql.extensions=graft.plans.GraftExtensions)")
        }
    }

  /** `DELETE FROM ... WHERE` — Spark plans this path only when the
    * predicate translates ENTIRELY to source filters ([[canDeleteWhere]]
    * gates; an untranslatable WHERE errors in analysis rather than
    * half-deleting); the translated condition runs through the format
    * writers' row-level deletes (Delta DVs / Iceberg position deletes). */
  override def canDeleteWhere(filters: Array[org.apache.spark.sql.sources.Filter]): Boolean =
    deleter.isDefined &&
      filters.forall(f => GraftSqlTable.filterToColumn(f).isDefined)

  override def deleteWhere(filters: Array[org.apache.spark.sql.sources.Filter]): Unit = {
    val del = deleter.getOrElse(throw new UnsupportedOperationException(
      s"table $tableName was loaded time-traveled — a pinned historical " +
        "read cannot be deleted from"))
    val cond = filters.map(f => GraftSqlTable.filterToColumn(f).getOrElse(
        throw new UnsupportedOperationException(
          s"DELETE predicate $f on $tableName does not translate to a " +
            "source filter")))
      .reduceOption(_ && _)
      .getOrElse(org.apache.spark.sql.functions.lit(true))
    del(cond)
  }

  /** `INSERT INTO` / `INSERT OVERWRITE` — the V1Write fallback: Spark
    * hands the aligned DataFrame to
    * [[org.apache.spark.sql.sources.InsertableRelation]] with the
    * overwrite flag, and the format writers' own commits land it —
    * append (Delta optimistic append / Iceberg commitAppend) or
    * overwrite (Delta Overwrite commit / Iceberg REPLACE snapshot). */
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    val append = appender.getOrElse(throw new UnsupportedOperationException(
      s"table $tableName was loaded time-traveled (VERSION/TIMESTAMP AS " +
        "OF) — a pinned historical read cannot be inserted into"))
    new org.apache.spark.sql.connector.write.WriteBuilder
        with org.apache.spark.sql.connector.write.SupportsTruncate {
      // Spark spells a STATIC `INSERT OVERWRITE` as truncate-then-write
      // (V2Writes rewrites OverwriteByExpression(true) through this
      // seam); the V1 relation then receives overwrite = true
      private var truncating = false
      override def truncate(): org.apache.spark.sql.connector.write.WriteBuilder = {
        truncating = true
        this
      }
      override def build(): org.apache.spark.sql.connector.write.Write =
        new org.apache.spark.sql.connector.write.V1Write {
          override def toInsertableRelation
              : org.apache.spark.sql.sources.InsertableRelation =
            (data: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
             overwrite: Boolean) => {
              if (overwrite || truncating)
                overwriter.getOrElse(throw new UnsupportedOperationException(
                  s"table $tableName was loaded time-traveled — a pinned " +
                    "historical read cannot be overwritten")).apply(data)
              else append(data)
            }
        }
    }
  }
}

/** One maintenance procedure: `bind` is identity (the parameters are
  * fixed), `call` runs the writer pass and serves its (metric, value)
  * summary as a one-row LocalScan — SQL-visible outcomes. */
private[graft] class GraftProcedure(
    procName: String,
    params: Array[org.apache.spark.sql.connector.catalog.procedures.ProcedureParameter],
    run: org.apache.spark.sql.catalyst.InternalRow => Seq[(String, Long)])
    extends org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure
    with org.apache.spark.sql.connector.catalog.procedures.BoundProcedure {
  override def name(): String = procName
  override def description(): String = s"graft maintenance: $procName"
  override def bind(inputType: StructType)
      : org.apache.spark.sql.connector.catalog.procedures.BoundProcedure = this
  override def parameters()
      : Array[org.apache.spark.sql.connector.catalog.procedures.ProcedureParameter] =
    params
  override def isDeterministic: Boolean = false
  override def call(input: org.apache.spark.sql.catalyst.InternalRow)
      : java.util.Iterator[org.apache.spark.sql.connector.read.Scan] = {
    val out = run(input)
    val schema = StructType(Seq(
      org.apache.spark.sql.types.StructField("metric",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.LongType, nullable = false)))
    val scan: org.apache.spark.sql.connector.read.Scan =
      new org.apache.spark.sql.connector.read.LocalScan {
        override def rows(): Array[org.apache.spark.sql.catalyst.InternalRow] =
          out.toArray.map { case (m, v) =>
            org.apache.spark.sql.catalyst.InternalRow(
              org.apache.spark.unsafe.types.UTF8String.fromString(m), v)
          }
        override def readSchema(): StructType = schema
        override def description(): String = s"graft $procName result"
      }
    java.util.Collections.singletonList(scan).iterator()
  }
}

private[graft] object GraftCatalog {
  /** A fresh POSITIVE Iceberg snapshot id for SQL-originated commits
    * (unique per table with 2^-63 collision odds; the mask keeps even
    * Long.MinValue positive, the | 1 keeps zero out). */
  private[sources] def freshSnapshotId(): Long =
    (java.util.UUID.randomUUID().getLeastSignificantBits & Long.MaxValue) | 1L
}

private[graft] object GraftSqlTable {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{col, lit}
  import org.apache.spark.sql.sources._

  /** V1 filter attribute strings arrive in `col()`'s own
    * quoted-multipart grammar (`meta.level` = a nested field;
    * `` `a.b` `` = a top-level column literally containing a dot) —
    * pass them through VERBATIM; re-wrapping would mis-resolve both. */
  private def q(attr: String): Column = col(attr)

  /** V1 `Filter` → `Column`, the DELETE predicate bridge. None = a
    * filter kind with no defined translation here — [[GraftSqlTable
    * .canDeleteWhere]] then refuses the whole DELETE in analysis, so a
    * partial translation can never half-delete. */
  private[sources] def filterToColumn(f: Filter): Option[Column] = f match {
    case EqualTo(a, v) => Some(q(a) === lit(v))
    case EqualNullSafe(a, v) => Some(q(a) <=> lit(v))
    case GreaterThan(a, v) => Some(q(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(q(a) >= lit(v))
    case LessThan(a, v) => Some(q(a) < lit(v))
    case LessThanOrEqual(a, v) => Some(q(a) <= lit(v))
    case In(a, vs) => Some(q(a).isin(vs.toIndexedSeq: _*))
    case IsNull(a) => Some(q(a).isNull)
    case IsNotNull(a) => Some(q(a).isNotNull)
    case And(l, r) =>
      for { lc <- filterToColumn(l); rc <- filterToColumn(r) } yield lc && rc
    case Or(l, r) =>
      for { lc <- filterToColumn(l); rc <- filterToColumn(r) } yield lc || rc
    case Not(c) => filterToColumn(c).map(!_)
    case StringStartsWith(a, v) => Some(q(a).startsWith(v))
    case StringEndsWith(a, v) => Some(q(a).endsWith(v))
    case StringContains(a, v) => Some(q(a).contains(v))
    case _: AlwaysTrue => Some(lit(true))
    case _: AlwaysFalse => Some(lit(false))
    case _ => None
  }
}
