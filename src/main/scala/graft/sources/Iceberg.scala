package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, regexp_replace}
import org.apache.spark.sql.types._

import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** Read-only interpreter for the PUBLIC Apache Iceberg table format
  * (the open spec at iceberg.apache.org/spec: versioned
  * `metadata/vN.metadata.json` documents, snapshot manifest-list Avro
  * files, manifest Avro files of data-file entries over immutable
  * parquet parts).
  *
  * Why it exists: after Delta (`sources/DeltaLogReader.scala`, q193/q194)
  * this is the second real table format a user could hand the engine —
  * the VERDICT r9 "optional breadth" item. Same design stance as the
  * Delta reader: READ-only (interpreting committed metadata is a
  * spec-stable planning pass; writing the format correctly — commit
  * atomicity, sequence numbers, spec evolution — is Iceberg's job), and
  * the same loud feature gating: a table whose correct interpretation
  * needs features this reader does not implement (format v3+, malformed
  * delete metadata, sequence-less equality deletes) is REFUSED, never
  * silently misread — skipping a delete manifest would serve deleted
  * rows. Both v2 merge-on-read delete spellings ARE applied: POSITION
  * deletes' `(file_path, pos)` rows anti-join the data read on Spark's
  * own `_metadata.file_path`/`_metadata.row_index` (correct independent
  * of commit sequence numbers — a position delete names its target file
  * explicitly and Iceberg never reuses data-file paths); EQUALITY
  * deletes anti-join null-safely on their `equality_ids` columns, gated
  * on the v2 sequence-number rule (data sequence STRICTLY below the
  * delete's — inherited from the manifest-list row when entries carry
  * none).
  *
  * Format subset honored (all public, spec v1/v2):
  *  - `metadata/version-hint.text` → `metadata/vN.metadata.json` (the
  *    HadoopCatalog convention), falling back to the highest-numbered
  *    `v*.metadata.json` present;
  *  - metadata.json: `format-version` (1 or 2 only), `snapshots[]` with
  *    `snapshot-id` / `timestamp-ms` / `manifest-list`,
  *    `current-snapshot-id`;
  *  - manifest list (Avro): `manifest_path` / `partition_spec_id` /
  *    `sequence_number` per row; v2 `content` 1 rows are DELETE
  *    manifests, replayed into the merge-on-read joins;
  *  - manifest (Avro): `status` (1 ADDED / 0 EXISTING live, 2 DELETED
  *    dead), entry `sequence_number` (ADDED-only list-row inheritance)
  *    + `data_file.{file_path, file_format, content, equality_ids}`;
  *    only PARQUET files.
  *  A snapshot whose manifests net to ZERO live files (a fully-deleted
  *  table, legal in Iceberg) types its empty frame from the metadata
  *  schema, and is refused only when the metadata carries none (the
  *  schema would have to come from a parquet footer that doesn't exist).
  *  Avro fields are looked up by NAME, so real Iceberg manifests — which
  *  carry many more fields than this reader consumes — read fine; the
  *  consumed planning hints are the fields above plus (when pruning, see
  *  [[readPruned]]) the `partition` struct, `lower_bounds`/
  *  `upper_bounds` stats, and the manifest-list `partitions` summaries.
  *
  * Schema: when metadata.json carries a non-empty current schema (the
  * `schemas[]`/`current-schema-id` v2 spelling or the v1 `schema`), the
  * DATA is read under the metadata's CURRENT column names, resolved
  * against the parquet files by Iceberg FIELD ID (Spark's own
  * `spark.sql.parquet.fieldId.read.enabled` + `parquet.field.id`
  * StructField metadata — the public column-mapping mechanism), so a
  * renamed column is served under its current name, not the stale one
  * baked into old files. Files WITHOUT parquet field ids fall back to
  * by-name resolution only when every current name exists in the
  * footer; a rename over id-less files is REFUSED loudly (serving the
  * stale name was r11's one silent gap). Nested/unsupported metadata
  * types are refused by name. A metadata document with an EMPTY/absent
  * schema (this repo's minimal fixtures) keeps the footer-schema path.
  *
  * Scale: metadata resolution is O(#manifests + #files) driver work on
  * KB–MB Avro/JSON planning artifacts — the pass every Iceberg reader
  * performs — with the file list capped by the
  * [[graft.operators.ManifestGuard]] limit before a scan is planned;
  * the data read itself is an ordinary distributed parquet scan. */
object Iceberg {

  private val mapper = new ObjectMapper()

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  /** Ceiling for any driver-side metadata read: real Iceberg planning
    * artifacts (metadata.json, manifest lists, manifests) are KB–MB; a
    * file beyond this is either not metadata or a table this single-JVM
    * planning pass should not buffer. Also keeps the `Int` allocation
    * below sound — an unguarded `getLen.toInt` on a >2 GiB file wraps
    * negative and throws `NegativeArraySizeException` instead of a
    * contractual named refusal (ADVICE r11 item 3). */
  val MaxMetadataFileBytes: Long = 256L * 1024 * 1024

  private[sources] def readSmall(spark: SparkSession, p: Path,
                                 maxBytes: Long = MaxMetadataFileBytes): Array[Byte] = {
    val f = fs(spark, p)
    val len = f.getFileStatus(p).getLen
    require(len <= maxBytes,
      s"Iceberg metadata file $p is $len bytes — larger than the " +
        s"$maxBytes-byte driver-side metadata budget; this reader buffers " +
        "planning artifacts (metadata.json, manifest lists, manifests) " +
        "whole on the driver and refuses anything metadata-shaped only in " +
        "name")
    val buf = new Array[Byte](len.toInt)
    val in = f.open(p)
    try in.readFully(buf) finally in.close()
    buf
  }

  /** Resolve the current metadata document: version-hint.text if present
    * AND its target exists (the HadoopCatalog pointer), else the highest
    * `v*.metadata.json`. The hint write is non-atomic in Iceberg itself
    * and metadata cleanup can expire the version it names — Iceberg's own
    * HadoopTableOperations tolerates a stale hint by listing, so a hint
    * pointing at a deleted file falls back rather than surfacing a raw
    * FileNotFoundException from deep inside the reader. */
  private[sources] def currentMetadataPath(spark: SparkSession, table: String): Path = {
    val md = new Path(table, "metadata")
    val f = fs(spark, md)
    require(f.exists(md), s"not an Iceberg table: no metadata/ directory under $table")
    val hint = new Path(md, "version-hint.text")
    val hinted =
      if (!f.exists(hint)) None
      else {
        val v = new String(readSmall(spark, hint),
          java.nio.charset.StandardCharsets.UTF_8).trim
        Some(new Path(md, s"v$v.metadata.json")).filter(f.exists)
      }
    hinted.getOrElse {
      val vs = f.listStatus(md).map(_.getPath.getName)
        .collect { case n if n.startsWith("v") && n.endsWith(".metadata.json") &&
          n.stripPrefix("v").stripSuffix(".metadata.json").forall(_.isDigit) =>
          n.stripPrefix("v").stripSuffix(".metadata.json").toLong }
      require(vs.nonEmpty, s"no v*.metadata.json under $md")
      new Path(md, s"v${vs.max}.metadata.json")
    }
  }

  private[sources] def metadata(spark: SparkSession, table: String): JsonNode = {
    val doc = mapper.readTree(readSmall(spark, currentMetadataPath(spark, table)))
    val fv = doc.path("format-version").asInt(-1)
    require(fv >= 1 && fv <= 3,
      s"Iceberg reader supports format-version 1/2/3; table declares $fv — " +
        "refusing (a later version adds semantics this reader does not " +
        "interpret; reading anyway could be wrong, not just incomplete)")
    if (fv == 3) {
      // v3 READ support: deletion vectors decode ([[listLiveFiles]] +
      // the puffin DV join), row-lineage fields are additive metadata a
      // plain read may ignore, and unknown TYPES refuse in the schema
      // parser. The one v3 feature whose silent omission serves WRONG
      // rows is column DEFAULTS — a file written before an add-column
      // must serve the column's initial-default, not null — so a schema
      // carrying one refuses here. Writes stay refused everywhere
      // ([[IcebergWriter]] gates fv <= 2: v3 writers must maintain
      // next-row-id / first-row-id lineage this repo does not).
      // CURRENT schema only: a default on a since-dropped column (a
      // stale historical schema) cannot affect what this read serves
      val curId = doc.path("current-schema-id").asInt(-1)
      val curSchema = doc.path("schemas").elements().asScala
        .find(_.path("schema-id").asInt(-2) == curId)
        .orElse(Option(doc.path("schema")).filter(_.isObject))
      val defaulted = curSchema.toSeq
        .flatMap(_.path("fields").elements().asScala)
        .filter(f => f.has("initial-default") || f.has("write-default"))
        .map(_.path("name").asText("")).distinct
      require(defaulted.isEmpty,
        s"Iceberg v3 table $table declares column default(s) on " +
          s"${defaulted.mkString(", ")} — this reader would null-fill " +
          "where the default applies; refusing a wrong-row read")
    }
    doc
  }

  // ------------------------------------------------------------------
  // Metadata schema (field ids, current names, primitive types)
  // ------------------------------------------------------------------

  /** One top-level field of the table's current metadata schema. `typ` is
    * the spec's primitive type string (`long`, `string`, `timestamptz`,
    * `decimal(p, s)`, …). */
  private[sources] case class IceField(id: Int, name: String, typ: String)

  /** The current schema's fields, or None when metadata carries no usable
    * schema (absent / empty `fields` — this repo's minimal fixtures):
    * `schemas[]` + `current-schema-id` (the v2 spelling, preferred; v1
    * writers since Iceberg 0.12 emit it too) falling back to the single
    * v1 `schema`. A nested field type (struct/list/map — a JSON object,
    * not a string) is refused by name: silently flattening or skipping it
    * could serve wrong columns. */
  /** The CURRENT schema's raw JSON node — `schemas[current-schema-id]`
    * (the v2 spelling) with the v1 top-level `schema` fallback; the one
    * resolution both [[currentSchemaFields]] and every per-field guard
    * (e.g. the SQL-insert required-field check) must share, so a legacy
    * layout can never bypass a check the v2 layout enforces. */
  private[sources] def currentSchemaNode(doc: JsonNode): Option[JsonNode] = {
    val schemasNode = doc.path("schemas")
    if (schemasNode.isArray && schemasNode.size() > 0) {
      val cur = doc.path("current-schema-id").asInt(-1)
      val hit = schemasNode.elements().asScala
        .find(_.path("schema-id").asInt(-2) == cur)
      require(hit.isDefined,
        s"metadata declares current-schema-id $cur but carries no schema " +
          "with that id — refusing a guess among " +
          schemasNode.elements().asScala.map(_.path("schema-id").asInt(-2)).mkString(", "))
      hit
    } else Option(doc.path("schema")).filter(s => s.isObject && !s.isMissingNode)
  }

  private[sources] def currentSchemaFields(doc: JsonNode): Option[Seq[IceField]] = {
    val node: Option[JsonNode] = currentSchemaNode(doc)
    node.map(_.path("fields")).filter(f => f.isArray && f.size() > 0).map { fields =>
      fields.elements().asScala.map { f =>
        val name = f.path("name").asText("")
        val tn = f.path("type")
        require(tn.isTextual,
          s"schema field '$name' has a nested/non-primitive type " +
            s"(${tn.toString.take(80)}) — this reader serves flat analytic " +
            "schemas only and refuses rather than flattening silently")
        require(f.path("id").isInt || f.path("id").isLong,
          s"schema field '$name' lacks a field id — not a valid Iceberg schema")
        IceField(f.path("id").asInt(), name, tn.asText())
      }.toSeq
    }
  }

  /** Spec primitive → Spark type. `timestamp` (no zone) maps to
    * TimestampNTZ, `timestamptz` (UTC-adjusted) to Timestamp — the same
    * split Spark itself makes. Unsupported primitives (uuid, fixed,
    * time) are refused by name. */
  private[sources] def sparkType(t: String): DataType = t match {
    case "boolean" => BooleanType
    case "int" => IntegerType
    case "long" => LongType
    case "float" => FloatType
    case "double" => DoubleType
    case "date" => DateType
    case "string" => StringType
    case "binary" => BinaryType
    case "timestamptz" => TimestampType
    case "timestamp" => TimestampNTZType
    case dec if dec.startsWith("decimal(") && dec.endsWith(")") =>
      val Array(p, s) = dec.stripPrefix("decimal(").stripSuffix(")")
        .split(",").map(_.trim.toInt)
      DecimalType(p, s)
    case other => throw new IllegalArgumentException(
      s"Iceberg type '$other' is not interpreted by this reader " +
        "(supported: boolean/int/long/float/double/date/string/binary/" +
        "timestamp/timestamptz/decimal) — refusing rather than guessing a " +
        "Spark type")
  }

  /** Top-level parquet footer fields of ONE data file: (name, field id if
    * the writer recorded one). Iceberg writers always stamp ids; plain
    * parquet writers usually don't — that difference picks the
    * resolution mode. Driver-side footer read, planning altitude. */
  private def footerFields(spark: SparkSession, file: String): Seq[(String, Option[Int])] = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile
      .fromPath(new Path(file), spark.sessionState.newHadoopConf())
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try r.getFooter.getFileMetaData.getSchema.getFields.asScala.toSeq
      .map(t => (t.getName, Option(t.getId).map(_.intValue)))
    finally r.close()
  }

  /** Read `files` under the metadata schema: by FIELD ID when the files
    * carry parquet field ids (renames resolve to the current names), by
    * NAME when they don't and every current name is present; a rename
    * over id-less files has no sound resolution and is refused. The
    * mode probe reads ONE footer (lexicographic min for determinism) —
    * files of one snapshot share a writer lineage; on the ID path a
    * mixed table where OTHER files lack ids fails loudly downstream
    * (`fieldId.read.ignoreMissing` stays false), and on the NAME path
    * every file's footer is verified to carry every current name before
    * the read (by-name resolution null-fills silently, so the check
    * cannot be left to execution). */
  private[sources] def readWithMetadataSchema(spark: SparkSession, fields: Seq[IceField],
                                     files: Seq[String]): DataFrame = {
    val probe = footerFields(spark, files.min)
    val idsPresent = probe.nonEmpty && probe.forall(_._2.isDefined)
    if (idsPresent) {
      // session-scoped switch, deliberately NOT restored: the returned
      // frame is lazy, so the conf must still be on whenever it executes.
      // The switch only changes resolution for read schemas that CARRY
      // parquet.field.id metadata — in this repo exactly the schemas
      // built here; a caller constructing its own id-tagged schema over
      // id-less files after this read would fail loudly
      // (fieldId.read.ignoreMissing stays false), not resolve wrong.
      // ADD-COLUMN null-fill needs no flag: a file that HAS ids but
      // lacks one simply clips to null — the spec's evolution
      // semantics, pinned by the IcebergWriterSpec evolution laws
      spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
      val st = StructType(fields.map(f =>
        StructField(f.name, sparkType(f.typ), nullable = true,
          new MetadataBuilder().putLong("parquet.field.id", f.id.toLong).build())))
      spark.read.schema(st).parquet(files: _*)
    } else {
      // the by-name read NULL-FILLS silently on a name miss (unlike the
      // id path's loud fieldId.read.ignoreMissing=false), so EVERY
      // file's footer must carry every current name — a single probe
      // would let a mixed lineage (some files still spelling a
      // pre-rename name) serve nulls for the renamed column. Driver-side
      // footer reads at planning altitude; the file set is
      // ManifestGuard-capped, and this is the id-less FALLBACK path
      // (foreign plain-parquet tables), not the Iceberg-written common
      // case.
      val wanted = fields.map(_.name)
      files.foreach { file =>
        val names =
          (if (file == files.min) probe else footerFields(spark, file))
            .map(_._1).toSet
        val missing = wanted.filterNot(names)
        require(missing.isEmpty,
          s"metadata schema names column(s) ${missing.mkString(", ")} that " +
            s"the parquet footer of $file does not carry, and the file has " +
            "no parquet field ids to resolve a rename through — refusing to " +
            "serve stale column names; rewrite the data files (Iceberg " +
            "writers stamp field ids) or query an un-renamed snapshot")
      }
      val st = StructType(fields.map(f =>
        StructField(f.name, sparkType(f.typ), nullable = true)))
      spark.read.schema(st).parquet(files: _*)
    }
  }

  // ------------------------------------------------------------------
  // Planning-time pruning (partition summaries + column stats)
  // ------------------------------------------------------------------

  /** Closed-range planning predicate on a top-level column (equality =
    * `lo == hi`). Pruning is SOUND, not exact: a manifest/file is dropped
    * only when its recorded envelope is provably disjoint from the range,
    * so [[readPruned]] returns a SUPERSET of the matching rows and the
    * caller re-applies the predicate as a residual filter — exactly the
    * planning/execution split of the q158 DataSkipping tier. Endpoint
    * Scala types must match the column's metadata type: Int/Long for
    * int/long/date/timestamp columns, Double for float/double, String
    * for string. */
  case class ColRange(column: String, lo: Any, hi: Any)

  /** One partition-spec field: `transform(sourceId) AS name`. Pruning
    * maps each predicate range through the field's transform
    * ([[IcebergTransforms.transformedRange]]): identity passes through,
    * truncate/day/month/year/hour carry ranges (order-preserving),
    * bucket carries equality points only, and an unknown transform
    * carries nothing (kept — sound). */
  private[sources] case class SpecField(name: String, transform: String, sourceId: Int)

  /** specId → ordered spec fields: `partition-specs`/`default-spec-id`
    * (v2) falling back to the single v1 `partition-spec` as spec 0. */
  private[sources] def partitionSpecs(doc: JsonNode): Map[Int, Seq[SpecField]] = {
    def parse(fields: JsonNode): Seq[SpecField] =
      fields.elements().asScala.map(f => SpecField(
        f.path("name").asText(""), f.path("transform").asText(""),
        f.path("source-id").asInt(-1))).toSeq
    val v2 = doc.path("partition-specs")
    if (v2.isArray && v2.size() > 0)
      v2.elements().asScala
        .map(s => s.path("spec-id").asInt(0) -> parse(s.path("fields"))).toMap
    else {
      val v1 = doc.path("partition-spec")
      Map(0 -> (if (v1.isArray) parse(v1) else Nil))
    }
  }

  /** A [[ColRange]] resolved against the metadata schema: the field id
    * the bounds maps are keyed by, the type that decodes them, and the
    * endpoints normalized to the comparison domain (Long / Double /
    * String). */
  private[sources] case class ResolvedRange(column: String, fieldId: Int, typ: String,
                                   lo: Any, hi: Any)

  private[sources] case class PruneCtx(ranges: Seq[ResolvedRange],
                              specs: Map[Int, Seq[SpecField]])

  /** Normalize a predicate endpoint into the type's comparison domain;
    * a mistyped endpoint is refused (silently comparing e.g. a String
    * against long bounds would prune garbage). */
  private def toComparable(typ: String, v: Any, column: String): Any = (typ, v) match {
    case ("int" | "long" | "date" | "timestamp" | "timestamptz", n: Number) => n.longValue
    case ("float" | "double", n: Number) => n.doubleValue
    case ("string", s: String) => s
    case _ => throw new IllegalArgumentException(
      s"range endpoint for column '$column' (iceberg type $typ) has " +
        s"unusable class ${v.getClass.getName} — pass Int/Long for integer " +
        "and temporal columns, Double for floating, String for string")
  }

  /** Decode one stats bound (the spec's single-value little-endian
    * serialization) into the comparison domain. Integer-family bounds
    * accept 4 or 8 bytes (writers serialize int as 4, long as 8).
    * Unsupported types never reach here — [[toComparable]] refused the
    * predicate first. */
  private[sources] def decodeBound(typ: String, bytes: Array[Byte]): Any = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    typ match {
      case "int" | "long" | "date" | "timestamp" | "timestamptz" =>
        // 4-byte bounds under a long-typed column are the spec-legal
        // int → long promotion (old files keep their old serialization)
        require(bytes.length == 4 || bytes.length == 8,
          s"$typ bound must be 4 or 8 bytes, got ${bytes.length}")
        if (bytes.length == 4) bb.getInt.toLong else bb.getLong
      case "float" =>
        require(bytes.length == 4, s"float bound must be 4 bytes, got ${bytes.length}")
        bb.getFloat.toDouble
      case "double" =>
        // 4-byte bounds = the float → double promotion twin
        require(bytes.length == 4 || bytes.length == 8,
          s"double bound must be 4 or 8 bytes, got ${bytes.length}")
        if (bytes.length == 4) bb.getFloat.toDouble else bb.getDouble
      case "string" => new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      case other => throw new IllegalArgumentException(
        s"no bound decoding for iceberg type $other")
    }
  }

  /** a < b within one comparison domain. String bounds may be TRUNCATED
    * by the writer (lower: a prefix ≤ the true min; upper: truncated and
    * incremented ≥ the true max) — both remain valid envelope endpoints,
    * so the disjointness test below stays sound with them. */
  private def lt(a: Any, b: Any): Boolean = (a, b) match {
    case (x: java.lang.Long, y: java.lang.Long) => x < y
    case (x: java.lang.Double, y: java.lang.Double) => x < y
    // unsigned UTF-8 byte order — the same total order Spark's row-level
    // UTF8String comparisons and parquet's string stats use; Scala's
    // `<` (UTF-16 code-unit order) disagrees for supplementary-plane
    // codepoints and would prune files whose rows the filter matches
    case (x: String, y: String) => graft.plans.ScopeTerm.utf8Compare(x, y) < 0
    case _ => throw new IllegalStateException(s"incomparable bound classes: $a vs $b")
  }

  /** Disjointness of a recorded [lower, upper] envelope (either side may
    * be unknown → cannot prune) against the predicate range. */
  private def disjoint(lower: Option[Any], upper: Option[Any],
                       r: ResolvedRange): Boolean =
    disjointBounds(lower, upper, r.lo, r.hi)

  /** [[disjoint]] against an explicit closed range — the spelling the
    * transform-mapped partition checks use (their endpoints live in the
    * TRANSFORMED domain, not the ResolvedRange's raw one). */
  private def disjointBounds(lower: Option[Any], upper: Option[Any],
                             lo: Any, hi: Any): Boolean =
    upper.exists(u => lt(u, lo)) || lower.exists(l => lt(hi, l))

  private def resolvePruning(doc: JsonNode, ranges: Seq[ColRange]): Option[PruneCtx] =
    if (ranges.isEmpty) None
    else {
      val fields = currentSchemaFields(doc).getOrElse(
        throw new IllegalArgumentException(
          "pruning needs the table's metadata schema: manifest stats are " +
            "keyed by FIELD ID, and this table's metadata.json carries no " +
            "schema to resolve column names through — read unpruned instead"))
      val resolved = ranges.map { r =>
        val f = fields.find(_.name == r.column).getOrElse(
          throw new IllegalArgumentException(
            s"cannot prune on '${r.column}': not a column of the current " +
              s"metadata schema (${fields.map(_.name).mkString(", ")})"))
        ResolvedRange(r.column, f.id, f.typ,
          toComparable(f.typ, r.lo, r.column), toComparable(f.typ, r.hi, r.column))
      }
      Some(PruneCtx(resolved, partitionSpecs(doc)))
    }

  /** Avro `bytes` values surface as ByteBuffer (sometimes byte[]). */
  private[sources] def avroBytes(v: AnyRef): Option[Array[Byte]] = v match {
    case null => None
    case bb: java.nio.ByteBuffer =>
      val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); Some(a)
    case a: Array[Byte] => Some(a)
    case other => throw new IllegalArgumentException(
      s"expected Avro bytes, got ${other.getClass.getName}")
  }

  /** Manifest-LIST-level test: can `m`'s whole manifest be skipped on its
    * per-partition-field summaries? The `partitions` array is ordered by
    * the manifest's spec fields; a predicate participates through any
    * spec field whose transform can carry its range (identity and the
    * order-preserving transforms carry ranges; bucket carries equality
    * points; unknown transforms carry nothing — kept, sound). Summary
    * bounds are stored in the TRANSFORMED domain and decode under the
    * partition field's result type. Missing summaries (the field is
    * optional) → keep. A skipped manifest's Avro is NEVER OPENED — on a
    * 100 TB table this is what turns a point query from "replay every
    * manifest" into O(matching partitions) driver work. */
  private def manifestPruned(m: GenericRecord, ctx: PruneCtx): Boolean = {
    if (m.getSchema.getField("partitions") == null) return false
    val summaries = m.get("partitions") match {
      case null => return false
      case a: java.util.Collection[_] =>
        a.asScala.toSeq.map(_.asInstanceOf[GenericRecord])
      case other => throw new IllegalArgumentException(
        s"manifest-list partitions field has unexpected class ${other.getClass.getName}")
    }
    val specId = intField(m, "partition_spec_id").getOrElse(0)
    val spec = ctx.specs.getOrElse(specId, Nil)
    ctx.ranges.exists { r =>
      spec.zipWithIndex.exists { case (sf, i) =>
        sf.sourceId == r.fieldId && i < summaries.size &&
          IcebergTransforms.transformedRange(
              IcebergTransforms.parse(sf.transform), r.typ, r.lo, r.hi)
            .exists { case (tLo, tHi, dTyp) =>
              val s = summaries(i)
              disjointBounds(
                avroBytes(s.get("lower_bound")).map(decodeBound(dTyp, _)),
                avroBytes(s.get("upper_bound")).map(decodeBound(dTyp, _)),
                tLo, tHi)
            }
      }
    }
  }

  /** Entry-level test: can this data file be skipped on its per-column
    * `lower_bounds`/`upper_bounds` stats (keyed by field id) or its
    * identity-partition values? Missing stats → keep (sound). */
  private def filePruned(df: GenericRecord, specId: Int, ctx: PruneCtx): Boolean = {
    def boundsMap(field: String): Map[Int, Array[Byte]] =
      if (df.getSchema.getField(field) == null) Map.empty
      else df.get(field) match {
        case null => Map.empty
        case a: java.util.Collection[_] => a.asScala.map { e =>
          val r = e.asInstanceOf[GenericRecord]
          val k = intField(r, "key").getOrElse(throw new IllegalArgumentException(
            s"$field entry lacks key"))
          k -> avroBytes(r.get("value")).getOrElse(Array.emptyByteArray)
        }.toMap
        case m: java.util.Map[_, _] => m.asScala.map { case (k, v) =>
          k.toString.toInt -> avroBytes(v.asInstanceOf[AnyRef]).getOrElse(Array.emptyByteArray)
        }.toMap
        case other => throw new IllegalArgumentException(
          s"$field has unexpected class ${other.getClass.getName}")
      }
    val lo = boundsMap("lower_bounds")
    val hi = boundsMap("upper_bounds")
    val statsPruned = ctx.ranges.exists { r =>
      disjoint(lo.get(r.fieldId).filter(_.nonEmpty).map(decodeBound(r.typ, _)),
        hi.get(r.fieldId).filter(_.nonEmpty).map(decodeBound(r.typ, _)), r)
    }
    if (statsPruned) return true
    // partition values: the partition struct's field names are the spec
    // field names; values are typed Avro scalars (in the TRANSFORMED
    // domain), not bytes — compare against the transform-mapped range
    if (df.getSchema.getField("partition") == null) return false
    df.get("partition") match {
      case p: GenericRecord =>
        val spec = ctx.specs.getOrElse(specId, Nil)
        ctx.ranges.exists { r =>
          spec.exists { sf =>
            sf.sourceId == r.fieldId &&
              p.getSchema.getField(sf.name) != null &&
              IcebergTransforms.transformedRange(
                  IcebergTransforms.parse(sf.transform), r.typ, r.lo, r.hi)
                .exists { case (tLo, tHi, _) =>
                  val v = p.get(sf.name) match {
                    case null => None
                    case i: java.lang.Integer => Some(i.longValue: Any)
                    case l: java.lang.Long => Some(l.longValue: Any)
                    case f: java.lang.Float => Some(f.doubleValue: Any)
                    case d: java.lang.Double => Some(d.doubleValue: Any)
                    case s: CharSequence => Some(s.toString: Any)
                    case _ => None // unknown spelling: keep, stay sound
                  }
                  v.exists(x => lt(x, tLo) || lt(tHi, x))
                }
          }
        }
      case _ => false
    }
  }

  /** `(snapshotId, timestampMs)` of every snapshot, commit order. */
  def snapshots(spark: SparkSession, table: String): Seq[(Long, Long)] =
    metadata(spark, table).path("snapshots").elements().asScala
      .map(s => (s.path("snapshot-id").asLong(), s.path("timestamp-ms").asLong()))
      .toSeq

  /** Read the CURRENT snapshot as a DataFrame. */
  def read(spark: SparkSession, table: String): DataFrame = {
    val doc = metadata(spark, table)
    val cur = doc.path("current-snapshot-id").asLong(-1L)
    require(cur > 0, s"Iceberg table $table has no current snapshot")
    readSnapshotDoc(spark, table, doc, cur)
  }

  /** Read the CURRENT snapshot planning only the files whose manifest
    * stats can match EVERY range: manifest-list partition summaries drop
    * whole manifests (their Avro is never opened), then per-entry
    * `lower_bounds`/`upper_bounds` + identity partition values drop
    * files — all BEFORE the ManifestGuard cap, so a selective query on a
    * huge table plans O(matching files) instead of refusing. Returns a
    * SUPERSET of matching rows (stats may be absent or coarse); callers
    * re-apply the predicate as a residual filter. An all-pruned plan
    * returns the typed EMPTY frame (pruning implies a metadata schema,
    * so the frame can be typed without a footer). */
  def readPruned(spark: SparkSession, table: String, ranges: Seq[ColRange]): DataFrame = {
    val doc = metadata(spark, table)
    val cur = doc.path("current-snapshot-id").asLong(-1L)
    require(cur > 0, s"Iceberg table $table has no current snapshot")
    readSnapshotDoc(spark, table, doc, cur, ranges)
  }

  /** The pruned live-file plan of the current snapshot — the planning
    * half of [[readPruned]], exposed so specs and capacity checks can
    * pin HOW MANY files a predicate plans without reading any data. */
  def planFiles(spark: SparkSession, table: String,
                ranges: Seq[ColRange] = Nil): Seq[String] = {
    val doc = metadata(spark, table)
    val cur = doc.path("current-snapshot-id").asLong(-1L)
    require(cur > 0, s"Iceberg table $table has no current snapshot")
    listLiveFiles(spark, table, manifestListOf(doc, table, cur), cur,
      resolvePruning(doc, ranges)).data.map(_._1)
  }

  /** Time travel: read the table AS OF `snapshotId`. */
  def readSnapshot(spark: SparkSession, table: String, snapshotId: Long): DataFrame =
    readSnapshotDoc(spark, table, metadata(spark, table), snapshotId)

  /** [[readSnapshot]] with [[readPruned]]'s planning-time pruning — time
    * travel and pruning compose (the snapshot picks WHICH manifest list
    * replays; the predicates prune WITHIN it). */
  def readSnapshotPruned(spark: SparkSession, table: String, snapshotId: Long,
                         ranges: Seq[ColRange]): DataFrame =
    readSnapshotDoc(spark, table, metadata(spark, table), snapshotId, ranges)

  /** Time travel by TIMESTAMP: read the latest snapshot whose
    * `timestamp-ms` is <= `tsMillis` — Iceberg's own `FOR SYSTEM_TIME AS
    * OF` selection rule, the twin of the Delta reader's AS-OF (q194). A
    * timestamp before the first snapshot has no defined table state and
    * is refused with the valid range named. */
  def readAsOf(spark: SparkSession, table: String, tsMillis: Long): DataFrame = {
    val doc = metadata(spark, table)
    val snaps = doc.path("snapshots").elements().asScala
      .map(s => (s.path("snapshot-id").asLong(), s.path("timestamp-ms").asLong()))
      .toSeq
    require(snaps.nonEmpty, s"Iceberg table $table has no snapshots")
    val eligible = snaps.zipWithIndex.filter(_._1._2 <= tsMillis)
    require(eligible.nonEmpty,
      s"no snapshot of $table at or before timestamp $tsMillis — the " +
        s"earliest is ${snaps.minBy(_._2)._2}; a timestamp before the " +
        "first commit has no defined table state")
    // ties broken toward the LATEST snapshot in log order — two commits
    // in the same millisecond are real on busy tables, and Iceberg's own
    // selection keeps the last history entry <= ts, not the first
    readSnapshotDoc(spark, table, doc,
      eligible.maxBy { case ((_, ts), i) => (ts, i) }._1._1)
  }

  /** Incremental APPEND scan: the rows of data files ADDED by snapshots
    * in `(fromSnapshotId, toSnapshotId]` — Iceberg's incremental-read
    * contract (from EXCLUSIVE, to INCLUSIVE; both must exist and from
    * must precede to in the log). File-to-snapshot attribution uses the
    * entry-level `snapshot_id`, falling back to the manifest-list row's
    * `added_snapshot_id` (the spec's inheritance rule for null entry
    * ids); an ADDED entry with neither is refused — guessing would
    * silently drop or duplicate appends. A range snapshot that DELETES
    * data (a status-2 entry stamped with its id, or a delete manifest
    * whose delete files it added) has no append-only story: refused
    * loudly, the same contract as Iceberg's own IncrementalAppendScan.
    * At 100 TB altitude this is the CDC-shaped read: each poll plans
    * only the manifests of the new snapshots, never the whole table. */
  def readIncremental(spark: SparkSession, table: String,
                      fromSnapshotId: Long, toSnapshotId: Long): DataFrame = {
    val doc = metadata(spark, table)
    val ids = doc.path("snapshots").elements().asScala
      .map(_.path("snapshot-id").asLong()).toSeq
    val fi = ids.indexOf(fromSnapshotId)
    val ti = ids.indexOf(toSnapshotId)
    require(fi >= 0, s"from-snapshot $fromSnapshotId not in $table's log " +
      s"(known: ${ids.mkString(", ")})")
    require(ti >= 0, s"to-snapshot $toSnapshotId not in $table's log " +
      s"(known: ${ids.mkString(", ")})")
    require(fi < ti, s"incremental range is (from, to] in log order; " +
      s"$fromSnapshotId does not precede $toSnapshotId")
    val manifestCache = mutable.Map.empty[String, Seq[GenericRecord]]
    val files = mutable.LinkedHashSet.empty[String]
    for (snap <- ids.slice(fi + 1, ti + 1)) {
      readAvro(spark, resolve(table, manifestListOf(doc, table, snap))).foreach { m =>
        val mContent = intField(m, "content").getOrElse(0)
        val mPath = Option(m.get("manifest_path")).map(_.toString)
          .getOrElse(throw new IllegalArgumentException(
            "manifest-list row lacks manifest_path"))
        val inherited = longField(m, "added_snapshot_id")
        manifestCache.getOrElseUpdate(mPath,
          readAvro(spark, resolve(table, mPath))).foreach { e =>
          val status = intField(e, "status").getOrElse(
            throw new IllegalArgumentException(s"manifest $mPath: entry lacks status"))
          val eSnap = longField(e, "snapshot_id").orElse(inherited)
          if (eSnap.contains(snap)) {
            if (mContent == 1 && status != 2)
              throw new IllegalArgumentException(
                s"snapshot $snap of $table adds DELETE files " +
                  s"(manifest $mPath) — the range is not append-only; " +
                  "read full snapshots across it instead")
            if (status == 2)
              throw new IllegalArgumentException(
                s"snapshot $snap of $table DELETES data files " +
                  s"(manifest $mPath) — the range is not append-only; " +
                  "read full snapshots across it instead")
            if (mContent == 0 && status == 1) {
              val df = e.get("data_file").asInstanceOf[GenericRecord]
              require(df != null, s"manifest $mPath: entry lacks data_file")
              val fmt = Option(df.get("file_format"))
                .map(_.toString.toUpperCase).getOrElse("")
              require(fmt == "PARQUET",
                s"file ${df.get("file_path")} is $fmt; only PARQUET is read")
              files += resolve(table, df.get("file_path").toString).toString
              require(files.size <= graft.operators.ManifestGuard.MaxPlannedFiles,
                s"incremental range ($fromSnapshotId, $toSnapshotId] adds " +
                  s"more than ${graft.operators.ManifestGuard.MaxPlannedFiles} " +
                  "files — refusing the driver-side planning collect; " +
                  "read in smaller snapshot steps")
            }
          } else if (status == 1 && eSnap.isEmpty)
            throw new IllegalArgumentException(
              s"manifest $mPath: an ADDED entry carries no snapshot_id and " +
                "the manifest-list row no added_snapshot_id — cannot " +
                "attribute the append to a snapshot; refusing a guess")
        }
      }
    }
    val schemaFields = currentSchemaFields(doc)
    if (files.isEmpty) {
      require(schemaFields.isDefined,
        s"incremental range ($fromSnapshotId, $toSnapshotId] of $table " +
          "adds no files and the metadata carries no schema — nothing to " +
          "type the empty frame from")
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(schemaFields.get.map(f =>
          StructField(f.name, sparkType(f.typ), nullable = true))))
    }
    schemaFields match {
      case Some(fields) => readWithMetadataSchema(spark, fields, files.toSeq)
      case None => spark.read.parquet(files.toSeq: _*)
    }
  }

  /** CHANGELOG scan — Iceberg's `create_changelog_view` surface:
    * row-level changes between two snapshots, one stratum per snapshot
    * in log order over `(from, to]`. Each step classifies itself:
    *
    *  - APPEND-ONLY (no data file removed, delete-file set unchanged):
    *    the inserts are exactly the rows of the files the snapshot
    *    added — the cheap attribution path; no existing data is
    *    re-read, and the rows are provably alive (older position
    *    deletes name older files; older equality deletes lose the
    *    sequence gate against newer data).
    *  - anything else (MoR deletes, upserts, compactions, rollbacks):
    *    the EXACT logical multiset diff of the two snapshot states
    *    (`exceptAll` both directions, duplicate multiplicity kept) —
    *    so a compaction or a rewrite nets ZERO change rows, as a
    *    changelog must report it.
    *
    * Output: the table's columns + `_change_type` (insert / delete) +
    * `_change_snapshot_id`. Updates surface as delete+insert pairs —
    * the changelog contract without a row-lineage field to pair them
    * by. The Delta twin is [[DeltaLogReader.readChangeFeed]]. */
  def changesBetween(spark: SparkSession, table: String,
                     fromSnapshotId: Long, toSnapshotId: Long): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val doc = metadata(spark, table)
    val ids = doc.path("snapshots").elements().asScala
      .map(_.path("snapshot-id").asLong()).toSeq
    val fi = ids.indexOf(fromSnapshotId)
    val ti = ids.indexOf(toSnapshotId)
    require(fi >= 0, s"from-snapshot $fromSnapshotId not in $table's log " +
      s"(known: ${ids.mkString(", ")})")
    require(ti >= 0, s"to-snapshot $toSnapshotId not in $table's log " +
      s"(known: ${ids.mkString(", ")})")
    require(fi < ti, s"changelog range is (from, to] in log order; " +
      s"$fromSnapshotId does not precede $toSnapshotId")
    val schemaFields = currentSchemaFields(doc)
    require(schemaFields.isDefined,
      s"changelog of $table needs the metadata schema to type its frame")
    val clash = schemaFields.get.map(_.name)
      .filter(n => n == "_change_type" || n == "_change_snapshot_id")
    require(clash.isEmpty,
      s"table column(s) ${clash.mkString(", ")} collide with the " +
        "changelog's output columns; rename them first")
    val snapDf = changelogSnapCache(spark, table, doc)
    val steps = (fi until ti).flatMap(i =>
      changelogStep(spark, table, doc, schemaFields.get, ids(i), ids(i + 1), snapDf))
    steps.reduceOption(_.unionByName(_))
      .getOrElse(emptyChangelogFrame(spark, schemaFields.get))
  }

  /** Drain-scoped snapshot cache for the changelog machinery: an
    * INTERIOR snapshot sits in two consecutive diffs (as `cur` of one
    * step and `prev` of the next), and a streaming drain revisits it
    * across batches — an EAGER localCheckpoint pins each snapshot's scan
    * to materialize ONCE, shared by every consumer (the repo-wide
    * double-referenced-frame discipline; persist() would not stop the
    * logical-plan doubling). Eager, not lazy: a pending lazy mark that a
    * later diff-join's broadcast-exchange thread materializes can
    * deadlock against the DAG event loop (the KCore round-16 jstack
    * finding — RDDCheckpointData$ vs RDD partitions lock inversion);
    * materializing at cache-fill does the same work on the driver
    * thread where no lock is held. */
  private def changelogSnapCache(spark: SparkSession, table: String,
                                 doc: JsonNode): Long => DataFrame = {
    val cache = mutable.Map.empty[Long, DataFrame]
    id => cache.getOrElseUpdate(id,
      readSnapshotDoc(spark, table, doc, id).localCheckpoint(true))
  }

  private def emptyChangelogFrame(spark: SparkSession,
                                  fields: Seq[IceField]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(fields.map(f =>
        StructField(f.name, sparkType(f.typ), nullable = true)) ++ Seq(
        StructField("_change_type", StringType),
        StructField("_change_snapshot_id", LongType))))

  /** One changelog stratum (prev → cur). The CHEAP attribution path —
    * inserts read straight from the files `cur` added — is taken only
    * when it is provably exact: no data file removed, the delete-file
    * set unchanged, NO position deletes live (a position delete names a
    * file PATH, and a re-added old path — a rollback-shaped history, a
    * foreign writer — would be silently over-reported; their presence
    * forces the exact diff), and every added entry's data sequence
    * number defined and ABOVE every live equality delete's (the spec's
    * gate that makes new rows untouchable by old deletes). Everything
    * else pays the exact multiset diff. */
  private def changelogStep(spark: SparkSession, table: String, doc: JsonNode,
                            fields: Seq[IceField], prev: Long, cur: Long,
                            snapDf: Long => DataFrame): Option[DataFrame] = {
    import org.apache.spark.sql.functions.lit
    val prevPlan = listLiveFiles(spark, table,
      manifestListOf(doc, table, prev), prev)
    val curPlan = listLiveFiles(spark, table,
      manifestListOf(doc, table, cur), cur)
    val prevData = prevPlan.data.map(_._1).toSet
    val removedData = prevData -- curPlan.data.map(_._1).toSet
    val deleteSetChanged =
      prevPlan.deletes.toSet != curPlan.deletes.toSet ||
        prevPlan.eqDeletes.map(_._1).toSet != curPlan.eqDeletes.map(_._1).toSet ||
        prevPlan.dvs.toSet != curPlan.dvs.toSet
    val added = curPlan.data.filterNot(e => prevData(e._1))
    val maxEqSeq = curPlan.eqDeletes.flatMap(_._2).maxOption
    // an equality-delete entry with an UNRESOLVABLE sequence number
    // (None — e.g. an EXISTING row from a foreign manifest rewrite) is
    // unbounded: it may gate ABOVE the added rows, so the cheap path's
    // "older deletes lose the sequence race" reasoning does not hold —
    // force the exact diff rather than over-report inserts. Live v3
    // DELETION VECTORS carry the same re-added-path hazard as position
    // deletes (they name file coordinates) — their presence forces the
    // exact diff too.
    val cheapSafe = removedData.isEmpty && !deleteSetChanged &&
      curPlan.deletes.isEmpty && curPlan.dvs.isEmpty &&
      (curPlan.eqDeletes.isEmpty ||
        (curPlan.eqDeletes.forall(_._2.isDefined) &&
          added.forall(_._2.exists(s => maxEqSeq.forall(_ < s)))))
    val change: Option[DataFrame] =
      if (cheapSafe) {
        if (added.isEmpty) None
        else Some(readWithMetadataSchema(spark, fields, added.map(_._1))
          .withColumn("_change_type", lit("insert")))
      } else if (removedData.isEmpty && !deleteSetChanged && added.isEmpty)
        None // metadata-only snapshot: nothing changed, nothing to diff
      else {
        val a = snapDf(prev)
        val b = snapDf(cur)
        Some(a.exceptAll(b).withColumn("_change_type", lit("delete"))
          .unionByName(b.exceptAll(a).withColumn("_change_type", lit("insert"))))
      }
    change.map(_.withColumn("_change_snapshot_id", lit(cur)))
  }

  /** STREAM the changelog — the incremental CDC consumption loop over
    * an Iceberg table (the [[DeltaLogReader.streamChangeFeed]] twin):
    * every not-yet-consumed snapshot serves as ONE micro-batch of
    * [[changesBetween]](prev, cur) rows under a crash-safe file-offset
    * checkpoint (offsets record the last consumed snapshot ID;
    * rename-to-new-name commit, max-index surviving offset wins).
    * Changeless snapshots (compactions, manifest rewrites) advance the
    * offset without invoking `batch`. A fresh checkpoint starts AFTER
    * `startAfterSnapshotId` (that snapshot is the initial state, not a
    * served batch). Returns the snapshot ids consumed this drain. */
  def streamChangelog(spark: SparkSession, table: String,
                      checkpointDir: String, startAfterSnapshotId: Long)
                     (batch: (DataFrame, Long) => Unit): Seq[Long] = {
    val doc = metadata(spark, table)
    val ids = doc.path("snapshots").elements().asScala
      .map(_.path("snapshot-id").asLong()).toSeq
    val offsets = new graft.operators.StreamOffsets(spark, checkpointDir, "offset_s")
    // offsets store snapshot IDS; ordering is the LOG's, so resume
    // resolves the id back to its log position (ids are not ordered).
    // startAfterSnapshotId only matters on a FRESH checkpoint — a
    // resuming consumer whose initial snapshot was since expired must
    // not refuse here: its committed offset is the thing that has to
    // still be in the log (the fromIdx gate below), not the start
    val resumed = offsets.readMax(id => ids.indexOf(id))
    if (resumed.isEmpty)
      require(ids.contains(startAfterSnapshotId),
        s"startAfterSnapshotId $startAfterSnapshotId is not a snapshot of " +
          s"$table (known: ${ids.mkString(", ")})")
    val consumedThrough: Long = resumed.getOrElse(startAfterSnapshotId)
    val fromIdx = ids.indexOf(consumedThrough)
    require(fromIdx >= 0,
      s"stream checkpoint at $checkpointDir consumed through snapshot " +
        s"$consumedThrough, which is no longer in $table's log " +
        s"(known: ${ids.mkString(", ")}) — expired history; restart with " +
        "a fresh checkpoint to take a new initial snapshot")
    val schemaFields = currentSchemaFields(doc)
    require(schemaFields.isDefined,
      s"changelog of $table needs the metadata schema to type its frames")
    // ONE snapshot cache for the whole drain: an interior snapshot of
    // two consecutive diff strata materializes once, not once per batch
    val snapDf = changelogSnapCache(spark, table, doc)
    val todo = ids.drop(fromIdx + 1)
    todo.foreach { cur =>
      val prev = ids(ids.indexOf(cur) - 1)
      changelogStep(spark, table, doc, schemaFields.get, prev, cur, snapDf)
        .foreach { changes =>
          // persist across the emptiness probe and the batch callback —
          // a diff stratum must not recompute per consumption
          val c = changes.persist()
          try { if (!c.isEmpty) batch(c, cur) }
          finally c.unpersist()
        }
      offsets.commit(cur, id => ids.indexOf(id))
    }
    todo
  }

  private[sources] def manifestListOf(doc: JsonNode, table: String, snapshotId: Long): String = {
    val snap = doc.path("snapshots").elements().asScala
      .find(_.path("snapshot-id").asLong() == snapshotId)
      .getOrElse(throw new IllegalArgumentException(
        s"snapshot $snapshotId not found in $table — known: " +
          doc.path("snapshots").elements().asScala
            .map(_.path("snapshot-id").asLong()).mkString(", ")))
    val mlPath = snap.path("manifest-list").asText("")
    require(mlPath.nonEmpty,
      s"snapshot $snapshotId carries no manifest-list (the v1 inline " +
        "'manifests' spelling is not interpreted — rewrite the snapshot " +
        "with a manifest list, the format's primary path)")
    mlPath
  }

  /** Internal columns the merge-on-read joins introduce; a table column
    * with one of these names would be ambiguous in the joins, so a MoR
    * read refuses it. */
  private val MorJoinColumns = Seq("__ice_fp", "__ice_pos", "__ice_seq", "__ice_dseq")

  /** Scheme-normalize a file path column for the position-delete match:
    * delete files record the path as the WRITER spelled it (often a bare
    * absolute path) while Spark's `_metadata.file_path` is always a full
    * URI (`file:///…`). Dropping `scheme:/+` from both sides makes them
    * comparable; a bucket/authority stays as the leading path segment,
    * so same-named keys in different buckets do NOT collide. */
  private[sources] def normPath(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(c, "^[a-zA-Z][a-zA-Z0-9+.-]*:/+", "/")

  /** Driver-side twin of [[normPath]] for planned paths. */
  private[sources] def normPathDriver(p: String): String =
    p.replaceFirst("^[a-zA-Z][a-zA-Z0-9+.-]*:/+", "/")

  private def readSnapshotDoc(spark: SparkSession, table: String,
                              doc: JsonNode, snapshotId: Long,
                              ranges: Seq[ColRange] = Nil): DataFrame = {
    val mlPath = manifestListOf(doc, table, snapshotId)
    val pruning = resolvePruning(doc, ranges)
    val planned = listLiveFiles(spark, table, mlPath, snapshotId, pruning)
    val files = planned.data.map(_._1)
    val schemaFields = currentSchemaFields(doc)
    if (files.isEmpty && schemaFields.isDefined)
      // a predicate can legally prune EVERYTHING, and a fully-deleted
      // snapshot is a legal Iceberg state: whenever metadata carries a
      // schema, the empty frame is typed without needing a footer
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(schemaFields.get.map(f =>
          StructField(f.name, sparkType(f.typ), nullable = true))))
    // a zero-live-file snapshot of a SCHEMA-LESS metadata document (this
    // reader's minimal-fixture path) cannot be typed: the schema would
    // have to come from a parquet footer and there is none — refuse with
    // the limitation named rather than a corruption-shaped error
    require(files.nonEmpty,
      s"snapshot $snapshotId of $table has zero live data files and its " +
        "metadata carries no schema — nothing to type the empty frame " +
        "from; read an earlier snapshot or construct the empty frame from " +
        "a known schema instead")
    val base = schemaFields match {
      case Some(fields) => readWithMetadataSchema(spark, fields, files)
      case None => spark.read.parquet(files: _*)
    }
    if (planned.deletes.isEmpty && planned.eqDeletes.isEmpty &&
      planned.dvs.isEmpty) return base
    val clash = base.columns.toSet.intersect(MorJoinColumns.toSet)
    require(clash.isEmpty,
      s"table column(s) ${clash.toSeq.sorted.mkString(", ")} collide " +
        "with the merge-on-read join's internal names " +
        s"(${MorJoinColumns.mkString(", ")}) — rename them or compact " +
        "the deletes away first")
    // attach the row coordinates ONCE on the scan itself — metadata
    // columns do not reliably re-resolve through join/project outputs,
    // so every downstream delete join reads these plain columns instead
    var out = base
      .withColumn("__ice_fp", normPath(col("_metadata.file_path")))
      .withColumn("__ice_pos", col("_metadata.row_index"))
    if (planned.deletes.nonEmpty) {
      // POSITION deletes: anti-join the (file, position) pairs the
      // delete files name. Spark's _metadata.row_index IS the 0-based
      // row position within the parquet file — the exact coordinate the
      // spec defines. One distributed join keyed on (path, pos); the
      // planner broadcasts the delete side when small, the common case
      val del = spark.read.parquet(planned.deletes: _*)
        .select(normPath(col("file_path")).as("__ice_fp"),
          col("pos").cast("long").as("__ice_pos"))
      out = out.join(del, Seq("__ice_fp", "__ice_pos"), "left_anti")
    }
    if (planned.dvs.nonEmpty)
      out = applyDeletionVectors(spark, out, planned.dvs, table)
    if (planned.eqDeletes.nonEmpty)
      out = applyEqualityDeletes(spark, out, planned, schemaFields, table)
    out.drop("__ice_fp", "__ice_pos")
  }

  /** v3 DELETION VECTORS — puffin-stored position-delete bitmaps, the
    * spec's replacement for position-delete files: each blob kills row
    * positions in exactly ONE referenced data file. Decoded ON
    * EXECUTORS: the `binaryFile` source distributes the puffin bytes
    * and a broadcast of (puffin → its DV refs) — planning metadata,
    * ManifestGuard-bounded — routes each file's bytes to its blob
    * slices (the [[DeltaLogReader]] sidecar discipline; nothing
    * data-shaped transits the driver). The blob framing is the SAME
    * layout Delta's DV sidecars carry — [len:i32 BE][portable roaring
    * bitmap (magic D1 D3 39 64)][crc32:i32 BE] — deliberately, per the
    * v3 spec, so [[DeletionVectors]] decodes it; a union of the
    * blob-level checks (declared vs stored size, CRC, decoded vs
    * declared cardinality) refuses corruption loudly. Applied as the
    * same (file, position) anti-join as position-delete files — a data
    * file carrying BOTH (legal mid-upgrade: the DV must supersede, i.e.
    * contain, the older deletes) anti-joins against their union, which
    * equals the DV's set. */
  private def applyDeletionVectors(spark: SparkSession, base: DataFrame,
                                   dvs: Seq[DvRef], table: String): DataFrame = {
    import spark.implicits._
    val byPuffin: Map[String, Seq[DvRef]] =
      dvs.groupBy(d => DeletionVectors.normalizePath(d.puffin))
    val bc = spark.sparkContext.broadcast(byPuffin)
    val dvDf = spark.read.format("binaryFile")
      .load(dvs.map(_.puffin).distinct.sorted: _*)
      .select(col("path"), col("content")).as[(String, Array[Byte])]
      .flatMap { case (binPath, bytes) =>
        val key = DeletionVectors.normalizePath(binPath)
        val refs = bc.value.getOrElse(key, throw new IllegalStateException(
          s"puffin $key loaded but no deletion vector routes to it — " +
            "path-normalization drift; refusing"))
        refs.iterator.flatMap { d =>
          icebergDvPositions(bytes, d).iterator
            .map(pos => (normPathDriver(d.referencedDataFile), pos))
        }
      }.toDF("__ice_fp", "__ice_pos")
    base.join(dvDf, Seq("__ice_fp", "__ice_pos"), "left_anti")
  }

  /** Decode one v3 DV blob out of a puffin file's bytes. The manifest's
    * `content_size_in_bytes` spans the WHOLE blob (length word + magic +
    * vector + crc), the leading length word declares magic + vector —
    * so the two must agree at size - 8; then the CRC and the declared
    * cardinality (the entry's record_count) each get their own refusal. */
  private[sources] def icebergDvPositions(fileBytes: Array[Byte],
                                          d: DvRef): Array[Long] = {
    val where = s"DV for ${d.referencedDataFile} in ${d.puffin}"
    require(d.offset >= 0 && d.size >= 12 &&
        d.offset + d.size <= fileBytes.length,
      s"$where: blob [offset=${d.offset} size=${d.size}] does not fit in " +
        s"${fileBytes.length} bytes — refusing")
    val bb = java.nio.ByteBuffer.wrap(fileBytes) // framing words big-endian
    val storedSize = bb.getInt(d.offset.toInt)
    require(storedSize.toLong == d.size - 8,
      s"$where: stored length $storedSize != content_size_in_bytes - 8 = " +
        s"${d.size - 8} — refusing")
    val data = java.util.Arrays.copyOfRange(fileBytes,
      d.offset.toInt + 4, d.offset.toInt + 4 + storedSize)
    val crc = new java.util.zip.CRC32
    crc.update(data)
    val storedCrc = bb.getInt(d.offset.toInt + 4 + storedSize)
    require(storedCrc == crc.getValue.toInt,
      s"$where: checksum mismatch (stored $storedCrc, computed " +
        s"${crc.getValue.toInt}) — refusing a corrupt deletion vector")
    val positions = DeletionVectors.deserialize(data)
    require(d.cardinality <= 0 || positions.length.toLong == d.cardinality,
      s"$where: decoded ${positions.length} positions but the manifest " +
        s"declares record_count ${d.cardinality} — refusing")
    positions
  }

  /** EQUALITY deletes (v2): a delete row removes every data row whose
    * listed fields are all equal (null matches null — the spec's
    * semantics, spelled `<=>`) AND whose data sequence number is
    * STRICTLY LESS than the delete file's — rows committed with or
    * after the delete survive. One anti-join per distinct equality-id
    * set (delete files sharing a set are unioned, each tagged with its
    * own sequence number); delete columns resolve through the SAME
    * field-id schema path as data files, so a rename never matches the
    * wrong column. The per-file data sequence rides in on a broadcast
    * (path, seq) frame keyed by the FileSystem-qualified path — the
    * exact spelling Spark's `_metadata.file_path` reports — LEFT-joined
    * with an executor-side `raise_error` on a miss, so a path-mapping
    * drift fails loudly instead of silently dropping a file's rows.
    * Refusals: no metadata schema (delete columns are named by field
    * id), an unknown field id, or ANY participating file without a
    * defined sequence number (ordering would be a guess). */
  private def applyEqualityDeletes(spark: SparkSession, base: DataFrame,
                                   planned: PlannedFiles,
                                   schemaFields: Option[Seq[IceField]],
                                   table: String): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, lit, raise_error, when}
    val fields = schemaFields.getOrElse(throw new IllegalArgumentException(
      s"table $table carries equality deletes but its metadata has no " +
        "schema — the delete columns are named by FIELD ID and cannot be " +
        "resolved; refusing"))
    def definedSeq(p: String, s: Option[Long]): Long = s.getOrElse(
      throw new IllegalArgumentException(
        s"table $table carries equality deletes, but $p has no sequence " +
          "number (entry or inherited) — whether the delete predates it " +
          "is undefined; refusing rather than guessing an order"))
    val conf = spark.sessionState.newHadoopConf()
    val seqRows = planned.data.map { case (p, s) =>
      val hp = new Path(p)
      org.apache.spark.sql.Row(
        normPathDriver(hp.getFileSystem(conf).makeQualified(hp).toString),
        definedSeq(p, s))
    }
    val seqDf = spark.createDataFrame(
      spark.sparkContext.parallelize(seqRows, 1),
      StructType(Seq(StructField("__ice_fp", StringType, nullable = false),
        StructField("__ice_seq", LongType, nullable = false))))
    var out = base
      .join(broadcast(seqDf), Seq("__ice_fp"), "left_outer")
      .withColumn("__ice_seq", when(col("__ice_seq").isNotNull, col("__ice_seq"))
        .otherwise(raise_error(org.apache.spark.sql.functions.concat(
          lit("iceberg equality-delete read: data row's file "),
          col("__ice_fp"),
          lit(" is missing from the planned sequence map — path-mapping " +
            "drift; refusing to serve rows whose delete ordering is unknown")))))
    planned.eqDeletes.groupBy(_._3.sorted).foreach { case (ids, group) =>
      val delFields = ids.map(id => fields.find(_.id == id).getOrElse(
        throw new IllegalArgumentException(
          s"equality delete references field id $id, absent from the " +
            s"metadata schema (${fields.map(f => s"${f.id}:${f.name}").mkString(", ")})")))
      val delCols = delFields.map(_.name)
      val del = group.map { case (p, seq, _) =>
        // same field-id resolution as the data read: an old delete file
        // carrying pre-rename column names still matches by id
        readWithMetadataSchema(spark, delFields, Seq(p))
          .withColumn("__ice_dseq", lit(definedSeq(p, seq)))
      }.reduce(_ unionAll _).alias("__ice_d")
      val aliased = out.alias("__ice_t")
      val cond = delCols.map(c =>
          col(s"__ice_t.`$c`") <=> col(s"__ice_d.`$c`")).reduce(_ && _) &&
        col("__ice_t.__ice_seq") < col("__ice_d.__ice_dseq")
      out = aliased.join(del, cond, "left_anti")
    }
    out.drop("__ice_seq")
  }

  /** One snapshot's pruned live plan: data files (with their data
    * sequence numbers — None where the metadata carries none, i.e. v1
    * tables and EXISTING entries without an explicit number), POSITION
    * delete files, and EQUALITY delete files (path, sequence number,
    * equality field ids). Sequence numbers follow the v2 inheritance
    * rule: a null entry-level `sequence_number` inherits the
    * manifest-list row's for ADDED (status 1) entries ONLY — an
    * EXISTING entry was carried forward by a rewrite, and inheriting
    * the rewrite manifest's newer number would let its rows wrongly
    * outlive older deletes. */
  /** A v3 DELETION VECTOR reference (a position-delete blob in a Puffin
    * file): the manifest entry's `referenced_data_file` names the ONE
    * data file it kills positions in, `content_offset`/
    * `content_size_in_bytes` address the blob inside the puffin. */
  private[sources] case class DvRef(puffin: String, referencedDataFile: String,
                                    offset: Long, size: Long, cardinality: Long)

  private[sources] case class PlannedFiles(
      data: Seq[(String, Option[Long])], deletes: Seq[String],
      eqDeletes: Seq[(String, Option[Long], Seq[Int])],
      // resolved path → the EXACT file_path spelling the data manifest
      // entry records. Spec-conforming readers match position-delete
      // file_path against that spelling verbatim, so a delete WRITER
      // must reproduce it — not Spark's file:/ URI (the r12 advisor
      // finding on IcebergWriter.deleteWhere)
      spelledAs: Map[String, String] = Map.empty,
      dvs: Seq[DvRef] = Nil)

  /** Replay one snapshot's manifest list → live file paths, with
    * optional planning-time pruning (summaries first, then per-entry
    * stats). Manifest-list rows with `content` 1 are DELETE manifests:
    * their live entries are POSITION delete files (`data_file.content`
    * 1) or EQUALITY delete files (2) — both applied by the read (the
    * readSnapshotDoc merge-on-read joins). Summary/partition pruning
    * applies to delete manifests too — sound, because a delete whose
    * partition is disjoint from the predicate can only affect rows the
    * residual filter drops anyway. The ManifestGuard cap counts PRUNED
    * survivors (data + delete files together). */
  /** Long-typed Avro field (sequence numbers, attribution, accounting). */
  private[sources] def longField(r: GenericRecord, name: String): Option[Long] =
    if (r.getSchema.getField(name) == null) None
    else Option(r.get(name)).map {
      case l: java.lang.Long => l.longValue
      case i: java.lang.Integer => i.longValue
      case other => other.toString.toLong
    }

  private[sources] def listLiveFiles(spark: SparkSession, table: String,
                            mlPath: String, snapshotId: Long,
                            pruning: Option[PruneCtx] = None): PlannedFiles = {
    val data = mutable.ArrayBuffer.empty[(String, Option[Long])]
    val dels = mutable.ArrayBuffer.empty[String]
    val eqDels = mutable.ArrayBuffer.empty[(String, Option[Long], Seq[Int])]
    val dvs = mutable.ArrayBuffer.empty[DvRef]
    val spelledAs = mutable.Map.empty[String, String]
    readAvro(spark, resolve(table, mlPath)).foreach { m =>
      val mContent = intField(m, "content").getOrElse(0)
      require(mContent == 0 || mContent == 1,
        s"snapshot $snapshotId manifest-list row has unknown content " +
          s"$mContent (${m.get("manifest_path")}) — refusing a guess")
      val path = Option(m.get("manifest_path"))
        .map(_.toString)
        .getOrElse(throw new IllegalArgumentException(
          "manifest-list row lacks manifest_path"))
      val specId = intField(m, "partition_spec_id").getOrElse(0)
      val mSeq = longField(m, "sequence_number")
      // manifest-list-level prune: a disjoint partition summary skips the
      // manifest WITHOUT opening its Avro
      if (!pruning.exists(manifestPruned(m, _))) {
        readAvro(spark, resolve(table, path)).foreach { e =>
          val status = intField(e, "status").getOrElse(
            throw new IllegalArgumentException(s"manifest $path: entry lacks status"))
          require(status >= 0 && status <= 2,
            s"manifest $path: unknown entry status $status")
          val df = e.get("data_file").asInstanceOf[GenericRecord]
          require(df != null, s"manifest $path: entry lacks data_file")
          val fContent = intField(df, "content").getOrElse(0)
          if (mContent == 0)
            require(fContent == 0,
              s"data manifest $path holds a delete file " +
                s"(${df.get("file_path")}) — malformed metadata (delete " +
                "files belong in delete manifests); refusing")
          else
            require(fContent == 1 || fContent == 2,
              s"delete manifest $path holds a non-delete file " +
                s"(${df.get("file_path")}, content $fContent) — malformed " +
                "metadata; refusing")
          val fmt = Option(df.get("file_format")).map(_.toString.toUpperCase).getOrElse("")
          // PUFFIN is legal in exactly one place: a position-delete
          // entry (a v3 DELETION VECTOR). Everything else stays parquet.
          val isDv = mContent == 1 && fContent == 1 && fmt == "PUFFIN"
          require(fmt == "PARQUET" || isDv,
            s"file ${df.get("file_path")} is $fmt; only PARQUET (and " +
              "PUFFIN deletion vectors in delete manifests) is read")
          if (status != 2 && isDv && !pruning.exists(filePruned(df, specId, _))) {
            // the three DV-addressing fields are all REQUIRED — a blob
            // without them cannot be located or attributed
            def reqLong(k: String): Long = longField(df, k).getOrElse(
              throw new IllegalArgumentException(
                s"deletion-vector entry ${df.get("file_path")} in $path " +
                  s"lacks $k — malformed v3 metadata; refusing"))
            val ref = Option(
                if (df.getSchema.getField("referenced_data_file") == null) null
                else df.get("referenced_data_file"))
              .map(_.toString).getOrElse(throw new IllegalArgumentException(
                s"deletion-vector entry ${df.get("file_path")} in $path " +
                  "lacks referenced_data_file — malformed v3 metadata; refusing"))
            val refResolved = resolve(table, ref).toString
            require(!dvs.exists(_.referencedDataFile == refResolved),
              s"two live deletion vectors reference $ref — v3 allows at " +
                "most one DV per data file; refusing a double-kill guess")
            dvs += DvRef(resolve(table, df.get("file_path").toString).toString,
              refResolved, reqLong("content_offset"),
              reqLong("content_size_in_bytes"),
              longField(df, "record_count").getOrElse(0L))
            require(data.size + dels.size + eqDels.size + dvs.size <=
                graft.operators.ManifestGuard.MaxPlannedFiles,
              s"snapshot $snapshotId lists more than " +
                s"${graft.operators.ManifestGuard.MaxPlannedFiles} files — " +
                "refusing the driver-side planning collect; prune by " +
                "partition or compact to coarser files first")
          } else if (status != 2 && !pruning.exists(filePruned(df, specId, _))) {
            val p = resolve(table, df.get("file_path").toString).toString
            // v2 sequence inheritance: ADDED (status 1) entries with a
            // null sequence_number inherit the manifest-list row's;
            // EXISTING entries must carry their own (a rewrite's newer
            // list-row number would be WRONG for carried-forward files).
            // None (v1, or an EXISTING entry without one) stays None —
            // harmless for data-only tables, a loud per-file refusal if
            // equality deletes need to order against it
            val seq = longField(e, "sequence_number")
              .orElse(if (status == 1) mSeq else None)
            if (mContent == 0) { data += ((p, seq)); spelledAs(p) = df.get("file_path").toString }
            else if (fContent == 1) dels += p
            else {
              val idsRaw =
                if (df.getSchema.getField("equality_ids") == null) null
                else df.get("equality_ids")
              val ids = idsRaw match {
                case null => Seq.empty[Int]
                case a: java.util.Collection[_] => a.asScala.toSeq.map {
                  case i: java.lang.Integer => i.intValue
                  case l: java.lang.Long => l.intValue
                  case other => other.toString.toInt
                }
                case other => throw new IllegalArgumentException(
                  s"equality_ids has unexpected class ${other.getClass.getName}")
              }
              require(ids.nonEmpty,
                s"equality delete file ${df.get("file_path")} names no " +
                  "equality_ids — malformed metadata; refusing")
              eqDels += ((p, seq, ids))
            }
            require(data.size + dels.size + eqDels.size + dvs.size <=
                graft.operators.ManifestGuard.MaxPlannedFiles,
              s"snapshot $snapshotId lists more than " +
                s"${graft.operators.ManifestGuard.MaxPlannedFiles} files — " +
                "refusing the driver-side planning collect; prune by " +
                "partition or compact to coarser files first")
          }
        }
      }
    }
    PlannedFiles(data.toSeq, dels.toSeq, eqDels.toSeq, spelledAs.toMap, dvs.toSeq)
  }

  /** Iceberg metadata stores absolute URIs; tolerate table-relative paths
    * (this repo's fixtures, some rewritten tables). */
  private[sources] def resolve(table: String, p: String): Path =
    if (p.contains(":/") || p.startsWith("/")) new Path(p)
    else new Path(table, p)

  /** Avro ints may surface as Integer or Long depending on writer schema;
    * missing fields (older spec versions) read as None. */
  private def intField(r: GenericRecord, name: String): Option[Int] =
    if (r.getSchema.getField(name) == null) None
    else Option(r.get(name)).map {
      case i: java.lang.Integer => i.intValue
      case l: java.lang.Long => l.intValue
      case other => other.toString.toInt
    }

  /** Driver-side Avro container read — manifests are KB–MB planning
    * metadata, the same altitude as the Delta log's JSON replay. */
  private[sources] def readAvro(spark: SparkSession, p: Path): Seq[GenericRecord] = {
    val in = fs(spark, p).open(p)
    val out = mutable.ArrayBuffer.empty[GenericRecord]
    try {
      val reader = new DataFileStream[GenericRecord](in,
        new GenericDatumReader[GenericRecord]())
      try { while (reader.hasNext) out += reader.next() }
      finally reader.close()
    } finally in.close()
    out.toSeq
  }

  // ------------------------------------------------------------------
  // Metadata tables — the `SELECT * FROM tbl.snapshots / .manifests /
  // .files` inspection surface. Pure driver-side metadata walks (the
  // same planning altitude as the scan), surfaced as small DataFrames
  // so they compose with ordinary queries.
  // ------------------------------------------------------------------

  /** The `snapshots` metadata table: one row per snapshot in the
    * current metadata document (expired snapshots are gone from here —
    * that IS expiration's contract). */
  def snapshotsTable(spark: SparkSession, table: String): DataFrame = {
    val doc = metadata(spark, table)
    val rows = doc.path("snapshots").elements().asScala.map { s =>
      org.apache.spark.sql.Row(s.path("snapshot-id").asLong(),
        s.path("timestamp-ms").asLong(), s.path("manifest-list").asText(""))
    }.toSeq
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), StructType(Seq(
      StructField("snapshot_id", LongType, nullable = false),
      StructField("timestamp_ms", LongType, nullable = false),
      StructField("manifest_list", StringType, nullable = false))))
  }

  /** The `manifests` metadata table: the CURRENT snapshot's manifest
    * list, one row per manifest — content (0 data / 1 deletes), the
    * snapshot that originally added it (carried manifests keep theirs),
    * and the data sequence number when the list carries one (null for
    * v1 lists — absence is information, not 0). */
  def manifestsTable(spark: SparkSession, table: String): DataFrame = {
    val doc = metadata(spark, table)
    val cur = doc.path("current-snapshot-id").asLong(-1L)
    require(cur > 0, s"Iceberg table $table has no current snapshot")
    val rows = readAvro(spark, resolve(table, manifestListOf(doc, table, cur)))
      .map { m =>
        org.apache.spark.sql.Row(
          Option(m.get("manifest_path")).map(_.toString).getOrElse(
            throw new IllegalArgumentException(
              s"manifest-list row of $table lacks manifest_path")),
          longField(m, "manifest_length").getOrElse(0L),
          intField(m, "content").getOrElse(0),
          intField(m, "partition_spec_id").getOrElse(0),
          longField(m, "added_snapshot_id").map(Long.box).orNull,
          longField(m, "sequence_number").map(Long.box).orNull)
      }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), StructType(Seq(
      StructField("manifest_path", StringType, nullable = false),
      StructField("manifest_length", LongType, nullable = false),
      StructField("content", IntegerType, nullable = false),
      StructField("partition_spec_id", IntegerType, nullable = false),
      StructField("added_snapshot_id", LongType, nullable = true),
      StructField("sequence_number", LongType, nullable = true))))
  }

  /** The `files` metadata table: every LIVE entry (status ≠ 2) of the
    * current snapshot — data files AND delete files, distinguished by
    * `content` (0 data / 1 position deletes / 2 equality deletes), with
    * the entry's snapshot attribution, the v2-inherited data sequence
    * number, and the manifest's record/byte accounting. The walk is
    * driver-side and [[graft.operators.ManifestGuard]]-capped like scan
    * planning — at 100 TB this table is how a user audits file sizing
    * BEFORE a compaction, so it must not itself blow the driver. */
  def filesTable(spark: SparkSession, table: String): DataFrame = {
    val doc = metadata(spark, table)
    val cur = doc.path("current-snapshot-id").asLong(-1L)
    require(cur > 0, s"Iceberg table $table has no current snapshot")
    val rows = mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
    readAvro(spark, resolve(table, manifestListOf(doc, table, cur))).foreach { m =>
      val mPath = Option(m.get("manifest_path")).map(_.toString).getOrElse(
        throw new IllegalArgumentException(
          s"manifest-list row of $table lacks manifest_path"))
      val mSeq = longField(m, "sequence_number")
      val mAdded = longField(m, "added_snapshot_id")
      readAvro(spark, resolve(table, mPath)).foreach { e =>
        val status = intField(e, "status").getOrElse(
          throw new IllegalArgumentException(s"manifest $mPath: entry lacks status"))
        if (status != 2) {
          val dfr = e.get("data_file").asInstanceOf[GenericRecord]
          require(dfr != null, s"manifest $mPath: entry lacks data_file")
          rows += org.apache.spark.sql.Row(
            intField(dfr, "content").getOrElse(0),
            resolve(table, dfr.get("file_path").toString).toString,
            Option(dfr.get("file_format")).map(_.toString).getOrElse(""),
            // null entry snapshot_id INHERITS the list row's attribution
            // (the spec rule readIncremental already implements)
            longField(e, "snapshot_id").orElse(mAdded).map(Long.box).orNull,
            longField(e, "sequence_number")
              .orElse(if (status == 1) mSeq else None).map(Long.box).orNull,
            longField(dfr, "record_count").getOrElse(0L),
            longField(dfr, "file_size_in_bytes").getOrElse(0L))
          require(rows.size <= graft.operators.ManifestGuard.MaxPlannedFiles,
            s"files table of $table exceeds " +
              s"${graft.operators.ManifestGuard.MaxPlannedFiles} entries — " +
              "the driver-side walk refuses; inspect per-partition instead")
        }
      }
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, 1), StructType(Seq(
      StructField("content", IntegerType, nullable = false),
      StructField("file_path", StringType, nullable = false),
      StructField("file_format", StringType, nullable = false),
      StructField("snapshot_id", LongType, nullable = true),
      StructField("sequence_number", LongType, nullable = true),
      StructField("record_count", LongType, nullable = false),
      StructField("file_size_in_bytes", LongType, nullable = false))))
  }

  // ------------------------------------------------------------------
  // Fixture authoring — hand-assembles the PUBLIC format so the reader
  // is exercised against Iceberg's layout, not a private twin (the q193
  // `_delta_log` staging pattern). Test/staging use; NOT a table writer.
  // ------------------------------------------------------------------

  /** One data file inside a snapshot: (absolute parquet path, status)
    * with status 1 ADDED / 0 EXISTING / 2 DELETED-in-this-snapshot.
    * `content`/`format` default to a v1 data file; non-defaults exist so
    * specs can author the refusal cases (delete files, non-parquet).
    * `partition` holds identity partition values (String or Long — the
    * fixture scope), `lowerBounds`/`upperBounds` the per-field-id column
    * stats in the spec's single-value serialization ([[encodeLong]] /
    * [[encodeString]] / [[encodeDouble]]). */
  case class Entry(path: String, status: Int,
                   content: Int = 0, format: String = "PARQUET",
                   partition: Seq[(String, Any)] = Nil,
                   lowerBounds: Seq[(Int, Array[Byte])] = Nil,
                   upperBounds: Seq[(Int, Array[Byte])] = Nil,
                   sequenceNumber: Option[Long] = None,
                   equalityIds: Seq[Int] = Nil,
                   omitSnapshotId: Boolean = false,
                   recordCount: Long = 0L,
                   fileSizeBytes: Long = 0L,
                   // a manifest REWRITE re-emits carried entries under their
                   // ORIGINAL snapshot id (status EXISTING) — the commit's own
                   // id applies only when no override is set
                   snapshotIdOverride: Option[Long] = None,
                   // v3 DELETION-VECTOR addressing (puffin blobs): the one
                   // data file the DV kills positions in + the blob's
                   // [offset, size) inside the puffin file
                   referencedDataFile: Option[String] = None,
                   contentOffset: Option[Long] = None,
                   contentSizeInBytes: Option[Long] = None,
                   // v3 ROW LINEAGE: the first row id assigned to this
                   // data file's rows — the file spans
                   // [first_row_id, first_row_id + record_count)
                   firstRowId: Option[Long] = None)

  /** Single-value serialization of the spec: little-endian fixed-width
    * numerics, raw UTF-8 strings — what real manifests store in
    * `lower_bounds`/`upper_bounds` values. */
  def encodeLong(v: Long): Array[Byte] =
    java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putLong(v).array()
  def encodeInt(v: Int): Array[Byte] =
    java.nio.ByteBuffer.allocate(4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(v).array()
  def encodeDouble(v: Double): Array[Byte] =
    java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putDouble(v).array()
  def encodeString(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  private def nullableBytes = Schema.createUnion(
    Schema.create(Schema.Type.NULL), Schema.create(Schema.Type.BYTES))

  /** array<{key:int, value:bytes}> — the spec's k/v spelling of the
    * bounds maps (Avro maps key by string; Iceberg keys by field id). */
  private def boundsArraySchema(recName: String): Schema =
    Schema.createArray(SchemaBuilder.record(recName).fields()
      .requiredInt("key").requiredBytes("value").endRecord())

  /** The fixture entry schema, extended with a `partition` struct and
    * bounds arrays only when the entries carry them — so the minimal
    * fixtures keep authoring the minimal records. Partition field types
    * derive from the first value seen per name (string/long, fixture
    * scope). */
  private def entrySchemaFor(entries: Seq[Entry]): Schema = {
    val partFields: Seq[(String, Schema.Type)] = {
      val seen = mutable.LinkedHashMap.empty[String, Schema.Type]
      entries.flatMap(_.partition).foreach { case (n, v) =>
        val t = v match {
          case _: String => Schema.Type.STRING
          case _: Long | _: Int => Schema.Type.LONG
          case other => throw new IllegalArgumentException(
            s"fixture partition value for '$n' must be String or Long, " +
              s"got ${other.getClass.getName}")
        }
        seen.get(n).foreach(p => require(p == t,
          s"fixture partition field '$n' used with two types"))
        seen.getOrElseUpdate(n, t)
      }
      seen.toSeq
    }
    val hasBounds = entries.exists(e => e.lowerBounds.nonEmpty || e.upperBounds.nonEmpty)
    var df = SchemaBuilder.record("r2").fields()
      .name("content").`type`().intType().intDefault(0)
      .requiredString("file_path")
      .requiredString("file_format")
    if (partFields.nonEmpty) {
      val p = SchemaBuilder.record("r102").fields()
      val pb = partFields.foldLeft(p) { case (b, (n, t)) =>
        b.name(n).`type`(Schema.createUnion(
          Schema.create(Schema.Type.NULL), Schema.create(t))).withDefault(null)
      }
      df = df.name("partition").`type`(pb.endRecord()).noDefault()
    }
    df = df.requiredLong("record_count").requiredLong("file_size_in_bytes")
    if (hasBounds) {
      df = df.name("lower_bounds").`type`(Schema.createUnion(
          Schema.create(Schema.Type.NULL), boundsArraySchema("k126_v127")))
        .withDefault(null)
      df = df.name("upper_bounds").`type`(Schema.createUnion(
          Schema.create(Schema.Type.NULL), boundsArraySchema("k129_v130")))
        .withDefault(null)
    }
    if (entries.exists(_.equalityIds.nonEmpty))
      df = df.name("equality_ids").`type`(Schema.createUnion(
          Schema.create(Schema.Type.NULL),
          Schema.createArray(Schema.create(Schema.Type.INT))))
        .withDefault(null)
    if (entries.exists(_.referencedDataFile.isDefined)) {
      df = df.name("referenced_data_file").`type`(Schema.createUnion(
          Schema.create(Schema.Type.NULL), Schema.create(Schema.Type.STRING)))
        .withDefault(null)
      df = df.name("content_offset").`type`(Schema.createUnion(
          Schema.create(Schema.Type.NULL), Schema.create(Schema.Type.LONG)))
        .withDefault(null)
      df = df.name("content_size_in_bytes").`type`(Schema.createUnion(
          Schema.create(Schema.Type.NULL), Schema.create(Schema.Type.LONG)))
        .withDefault(null)
    }
    if (entries.exists(_.firstRowId.isDefined))
      df = df.name("first_row_id").`type`(Schema.createUnion(
          Schema.create(Schema.Type.NULL), Schema.create(Schema.Type.LONG)))
        .withDefault(null)
    var eb = SchemaBuilder.record("manifest_entry").fields()
      .requiredInt("status")
    // entries may OMIT snapshot_id (the spec's null-inherits-from-list
    // spelling real writers use) — nullable only when a fixture asks
    eb = if (entries.exists(_.omitSnapshotId))
      eb.name("snapshot_id").`type`(Schema.createUnion(
          Schema.create(Schema.Type.NULL), Schema.create(Schema.Type.LONG)))
        .withDefault(null)
    else eb.name("snapshot_id").`type`().longType().noDefault()
    if (entries.exists(_.sequenceNumber.isDefined))
      eb = eb.name("sequence_number").`type`(Schema.createUnion(
          Schema.create(Schema.Type.NULL), Schema.create(Schema.Type.LONG)))
        .withDefault(null)
    eb.name("data_file").`type`(df.endRecord()).noDefault()
      .endRecord()
  }

  /** Per-partition-field summary on a manifest-list row: (lower, upper)
    * in the same single-value serialization as entry bounds; None =
    * unknown (the reader must keep the manifest). */
  case class Summary(lower: Option[Array[Byte]], upper: Option[Array[Byte]],
                     containsNull: Boolean = false)

  private val summarySchema: Schema =
    SchemaBuilder.record("r508").fields()
      .requiredBoolean("contains_null")
      .name("lower_bound").`type`(nullableBytes).withDefault(null)
      .name("upper_bound").`type`(nullableBytes).withDefault(null)
      .endRecord()

  private def manifestFileSchemaFor(withSummaries: Boolean,
                                    withSeq: Boolean = false,
                                    withFirstRowId: Boolean = false): Schema = {
    var b = SchemaBuilder.record("manifest_file").fields()
      .requiredString("manifest_path")
      .requiredLong("manifest_length")
      .name("partition_spec_id").`type`().intType().intDefault(0)
      .name("content").`type`().intType().intDefault(0)
      .requiredLong("added_snapshot_id")
    if (withSeq)
      b = b.name("sequence_number").`type`().longType().longDefault(0L)
    if (withFirstRowId)
      b = b.name("first_row_id").`type`(Schema.createUnion(
          Schema.create(Schema.Type.NULL), Schema.create(Schema.Type.LONG)))
        .withDefault(null)
    if (withSummaries)
      b = b.name("partitions").`type`(Schema.createUnion(
          Schema.create(Schema.Type.NULL), Schema.createArray(summarySchema)))
        .withDefault(null)
    b.endRecord()
  }

  private def writeAvro(spark: SparkSession, p: Path, schema: Schema,
                        rows: Seq[GenericRecord]): Long = {
    val f = fs(spark, p)
    val out = f.create(p, true)
    try {
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      w.create(schema, out)
      try { rows.foreach(w.append); w.flush() } finally w.close() // closes out
    } finally {
      // if DataFileWriter construction or create() threw, the inner
      // finally never ran and the stream would leak; double-close after
      // the normal path is a harmless no-op
      try out.close() catch { case _: java.io.IOException => () }
    }
    f.getFileStatus(p).getLen
  }

  /** Author a snapshot's manifest Avro at `metadata/m-<id>.avro`. */
  def writeManifest(spark: SparkSession, table: String, name: String,
                    snapshotId: Long, entries: Seq[Entry]): (String, Long) = {
    val p = new Path(new Path(table, "metadata"), name)
    val entrySchema = entrySchemaFor(entries)
    val dfSchema = entrySchema.getField("data_file").schema()
    val rows = entries.map { e =>
      val df = new GenericData.Record(dfSchema)
      df.put("content", e.content)
      df.put("file_path", e.path)
      df.put("file_format", e.format)
      df.put("record_count", e.recordCount)
      df.put("file_size_in_bytes", e.fileSizeBytes)
      if (e.partition.nonEmpty) {
        val ps = dfSchema.getField("partition").schema()
        val pr = new GenericData.Record(ps)
        e.partition.foreach { case (n, v) =>
          pr.put(n, v match { case i: Int => i.toLong; case other => other })
        }
        df.put("partition", pr)
      }
      def boundsArr(arrField: String, bs: Seq[(Int, Array[Byte])]): Unit =
        if (bs.nonEmpty) {
          val arrSchema = dfSchema.getField(arrField).schema()
            .getTypes.asScala.find(_.getType == Schema.Type.ARRAY).get
          val arr = new GenericData.Array[GenericRecord](bs.size, arrSchema)
          bs.foreach { case (k, v) =>
            val kv = new GenericData.Record(arrSchema.getElementType)
            kv.put("key", k)
            kv.put("value", java.nio.ByteBuffer.wrap(v))
            arr.add(kv)
          }
          df.put(arrField, arr)
        }
      boundsArr("lower_bounds", e.lowerBounds)
      boundsArr("upper_bounds", e.upperBounds)
      if (e.equalityIds.nonEmpty) {
        val arrSchema = dfSchema.getField("equality_ids").schema()
          .getTypes.asScala.find(_.getType == Schema.Type.ARRAY).get
        val arr = new GenericData.Array[Integer](e.equalityIds.size, arrSchema)
        e.equalityIds.foreach(i => arr.add(Int.box(i)))
        df.put("equality_ids", arr)
      }
      e.referencedDataFile.foreach(r => df.put("referenced_data_file", r))
      e.contentOffset.foreach(o => df.put("content_offset", Long.box(o)))
      e.contentSizeInBytes.foreach(s0 => df.put("content_size_in_bytes", Long.box(s0)))
      e.firstRowId.foreach(v => df.put("first_row_id", Long.box(v)))
      val r = new GenericData.Record(entrySchema)
      r.put("status", e.status)
      if (!e.omitSnapshotId)
        r.put("snapshot_id", e.snapshotIdOverride.getOrElse(snapshotId))
      e.sequenceNumber.foreach(sq =>
        if (entrySchema.getField("sequence_number") != null)
          r.put("sequence_number", Long.box(sq)))
      r.put("data_file", df)
      r
    }
    (p.toString, writeAvro(spark, p, entrySchema, rows))
  }

  /** Author a snapshot's manifest-list Avro pointing at `manifests`
    * ((path, length) pairs). `summaries`, when non-empty, runs parallel
    * to `manifests`: per-manifest partition-field [[Summary]] rows in
    * spec-field order (the `partitions` field real manifest lists carry —
    * what [[readPruned]] prunes whole manifests on). */
  /** Serialize a `deletion-vector-v1` puffin BLOB: `[len:i32 BE]`
    * `[portable roaring bitmap (magic D1 D3 39 64)][crc32:i32 BE]` —
    * the v3 spec's layout, deliberately byte-identical to a Delta DV
    * sidecar's per-DV framing ([[DeletionVectors.writeDvFile]]). */
  def dvBlob(positions: Array[Long]): Array[Byte] = {
    val bitmap = DeletionVectors.serialize(positions)
    val crc = new java.util.zip.CRC32
    crc.update(bitmap)
    val bb = java.nio.ByteBuffer.allocate(8 + bitmap.length) // BE framing
    bb.putInt(bitmap.length)
    bb.put(bitmap)
    bb.putInt(crc.getValue.toInt)
    bb.array()
  }

  /** Author a REAL Puffin file holding deletion-vector blobs — the spec
    * layout end to end: leading "PFA1" magic, the blobs, then the
    * footer (magic, uncompressed JSON payload listing each blob's
    * type/offset/length + referenced-data-file, payload size LE, zero
    * flags, trailing magic). Returns the path and each blob's
    * (offset, length) for the manifest entry's `content_offset` /
    * `content_size_in_bytes`. Fixture/test authoring, like
    * [[writeManifest]] — the READ side never needs the footer (the
    * manifest addresses blobs directly), but a real puffin reader can
    * open what this writes. */
  def writePuffin(spark: SparkSession, table: String, name: String,
                  blobs: Seq[(Array[Byte], String)],
                  snapshotId: Long, sequenceNumber: Long): (String, Seq[(Long, Long)]) = {
    val p = new Path(new Path(table, "metadata"), name)
    val magic = Array[Byte](0x50, 0x46, 0x41, 0x31) // "PFA1"
    var off = magic.length.toLong
    val spans = blobs.map { case (b, _) =>
      val s = (off, b.length.toLong); off += b.length; s
    }
    val blobsJson = blobs.zip(spans).map { case ((_, refFile), (o, l)) =>
      s"""{"type":"deletion-vector-v1","fields":[],""" +
        s""""snapshot-id":$snapshotId,"sequence-number":$sequenceNumber,""" +
        s""""offset":$o,"length":$l,""" +
        s""""properties":{"referenced-data-file":${mapper.writeValueAsString(refFile)}}}"""
    }.mkString("[", ",", "]")
    val payload = s"""{"blobs":$blobsJson,"properties":{}}"""
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sizeLe = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(payload.length).array()
    val out = fs(spark, p).create(p, true)
    try {
      out.write(magic)
      blobs.foreach { case (b, _) => out.write(b) }
      out.write(magic)                      // footer opens with magic
      out.write(payload)                    // uncompressed JSON
      out.write(sizeLe)                     // payload size, LE
      out.write(Array[Byte](0, 0, 0, 0))    // flags: not compressed
      out.write(magic)                      // trailing magic
    } finally out.close()
    (p.toString, spans)
  }

  def writeManifestList(spark: SparkSession, table: String, name: String,
                        snapshotId: Long, manifests: Seq[(String, Long)],
                        content: Int = 0,
                        summaries: Seq[Seq[Summary]] = Nil,
                        specIds: Seq[Int] = Nil,
                        contents: Seq[Int] = Nil,
                        sequenceNumbers: Seq[Long] = Nil,
                        addedSnapshotIds: Seq[Long] = Nil,
                        firstRowIds: Seq[Option[Long]] = Nil): String = {
    require(summaries.isEmpty || summaries.size == manifests.size,
      s"summaries (${summaries.size}) must run parallel to manifests (${manifests.size})")
    require(specIds.isEmpty || specIds.size == manifests.size,
      s"specIds (${specIds.size}) must run parallel to manifests (${manifests.size})")
    require(contents.isEmpty || contents.size == manifests.size,
      s"contents (${contents.size}) must run parallel to manifests (${manifests.size})")
    require(sequenceNumbers.isEmpty || sequenceNumbers.size == manifests.size,
      s"sequenceNumbers (${sequenceNumbers.size}) must run parallel to manifests (${manifests.size})")
    require(addedSnapshotIds.isEmpty || addedSnapshotIds.size == manifests.size,
      s"addedSnapshotIds (${addedSnapshotIds.size}) must run parallel to manifests (${manifests.size})")
    require(firstRowIds.isEmpty || firstRowIds.size == manifests.size,
      s"firstRowIds (${firstRowIds.size}) must run parallel to manifests (${manifests.size})")
    val p = new Path(new Path(table, "metadata"), name)
    val schema = manifestFileSchemaFor(summaries.nonEmpty, sequenceNumbers.nonEmpty,
      withFirstRowId = firstRowIds.exists(_.isDefined))
    val rows = manifests.zipWithIndex.map { case ((mp, len), i) =>
      val r = new GenericData.Record(schema)
      r.put("manifest_path", mp)
      r.put("manifest_length", len)
      r.put("partition_spec_id", if (specIds.isEmpty) 0 else specIds(i))
      // per-row `contents` (a real snapshot lists data AND delete
      // manifests together) wins over the uniform `content` default
      r.put("content", if (contents.isEmpty) content else contents(i))
      if (sequenceNumbers.nonEmpty)
        r.put("sequence_number", Long.box(sequenceNumbers(i)))
      // v3 ROW LINEAGE: the first row id a manifest's added files
      // inherit when they do not stamp their own (null = no inheritance
      // — this repo's v3 manifests stamp PER-FILE ids)
      if (firstRowIds.exists(_.isDefined))
        r.put("first_row_id", firstRowIds(i).map(Long.box).orNull)
      // a carried-forward manifest keeps the snapshot that ORIGINALLY
      // added it (real lists preserve this; entry-id inheritance relies
      // on it) — per-row override for fixtures that model carrying
      r.put("added_snapshot_id",
        if (addedSnapshotIds.isEmpty) snapshotId else addedSnapshotIds(i))
      if (summaries.nonEmpty) {
        val arrSchema = schema.getField("partitions").schema()
          .getTypes.asScala.find(_.getType == Schema.Type.ARRAY).get
        val arr = new GenericData.Array[GenericRecord](summaries(i).size, arrSchema)
        summaries(i).foreach { s =>
          val sr = new GenericData.Record(summarySchema)
          sr.put("contains_null", s.containsNull)
          sr.put("lower_bound", s.lower.map(java.nio.ByteBuffer.wrap).orNull)
          sr.put("upper_bound", s.upper.map(java.nio.ByteBuffer.wrap).orNull)
          arr.add(sr)
        }
        r.put("partitions", arr)
      }
      r
    }
    writeAvro(spark, p, schema, rows)
    p.toString
  }

  /** One primitive schema field for [[writeMetadata]]'s
    * `schemaFieldsJson` (the spec's field spelling). */
  def fieldJson(id: Int, name: String, typ: String, required: Boolean = false): String =
    s"""{"id":$id,"name":"$name","required":$required,"type":"$typ"}"""

  /** One partition field for [[writeMetadata]]'s `partitionSpecJson`:
    * partition-field ids live in the 1000+ range by spec convention.
    * `transform` is the spec spelling (`identity`, `day`, `bucket[16]`,
    * `truncate[4]`, …). */
  def partitionFieldJson(sourceId: Int, name: String, transform: String,
                         fieldId: Int = 1000): String =
    s"""{"name":"$name","transform":"$transform","source-id":$sourceId,"field-id":$fieldId}"""

  /** [[partitionFieldJson]] fixed to identity — the pre-hidden-partition
    * spelling fixtures and callers use. */
  def identityPartitionJson(sourceId: Int, name: String, fieldId: Int = 1000): String =
    partitionFieldJson(sourceId, name, "identity", fieldId)

  /** Author `metadata/vN.metadata.json` + `version-hint.text` for
    * `snaps` = (snapshotId, timestampMs, manifestListPath), current =
    * last. Minimal v1 document: exactly the fields the spec requires a
    * reader to honor for scan planning. `schemaFieldsJson` (a JSON array
    * of [[fieldJson]] entries) is emitted BOTH as the v1 `schema` and the
    * v2 `schemas[0]`/`current-schema-id` spelling — real v1 writers since
    * Iceberg 0.12 emit both too; `[]` keeps the schema-less minimal
    * document the schema-path fixtures predate. `partitionSpecJson`
    * likewise fills `partition-spec` + `partition-specs`/`default-spec-id`.
    * `evolvedSpecsJson` ((specId, fieldsJson) pairs), when non-empty,
    * REPLACES the `partition-specs` array — the spec-EVOLUTION spelling: a
    * table whose partitioning changed mid-history carries every spec it
    * ever wrote under, and each manifest names its spec by id. */
  def writeMetadata(spark: SparkSession, table: String, version: Int,
                    snaps: Seq[(Long, Long, String)],
                    formatVersion: Int = 1,
                    schemaFieldsJson: String = "[]",
                    partitionSpecJson: String = "[]",
                    evolvedSpecsJson: Seq[(Int, String)] = Nil,
                    lastColumnId: Int = 0,
                    failIfExists: Boolean = false,
                    nextRowId: Option[Long] = None,
                    snapFirstRowIds: Map[Long, Long] = Map.empty): Unit = {
    val md = new Path(table, "metadata")
    val f = fs(spark, md)
    f.mkdirs(md)
    // the writer tier's concurrency arbiter: a commit path proposes a
    // version it computed from the CURRENT hint, so the version file
    // already existing means another writer swapped first — surface it
    // as the typed conflict IcebergWriter.commitAppendOptimistic retries
    // on, never overwrite (fixtures that deliberately rewrite a version
    // keep the default)
    if (failIfExists && f.exists(new Path(md, s"v$version.metadata.json")))
      throw new java.util.ConcurrentModificationException(
        s"metadata version v$version already exists at $table — " +
          "concurrent writer won the swap")
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    val snapJson = snaps.map { case (id, ts, ml) =>
      // v3 ROW LINEAGE: a snapshot's first-row-id is the start of the
      // id range its commit assigned (preserved verbatim on re-emits)
      val frid = snapFirstRowIds.get(id)
        .map(v => s""","first-row-id":$v""").getOrElse("")
      s"""{"snapshot-id":$id,"timestamp-ms":$ts,"manifest-list":"${esc(ml)}"$frid}"""
    }.mkString("[", ",", "]")
    val doc =
      s"""{"format-version":$formatVersion,"table-uuid":"00000000-0000-0000-0000-000000000000",
         |"location":"${esc(table)}","last-updated-ms":${snaps.lastOption.map(_._2).getOrElse(0L)},
         |"last-column-id":$lastColumnId,"schema":{"type":"struct","schema-id":0,"fields":$schemaFieldsJson},
         |"schemas":[{"type":"struct","schema-id":0,"fields":$schemaFieldsJson}],
         |"current-schema-id":0,
         |"partition-spec":$partitionSpecJson,
         |"partition-specs":${
           if (evolvedSpecsJson.isEmpty)
             s"""[{"spec-id":0,"fields":$partitionSpecJson}]"""
           else evolvedSpecsJson.map { case (id, fj) =>
             s"""{"spec-id":$id,"fields":$fj}"""
           }.mkString("[", ",", "]")},
         |"default-spec-id":${evolvedSpecsJson.lastOption.map(_._1).getOrElse(0)},"properties":{},
         |"current-snapshot-id":${snaps.lastOption.map(_._1).getOrElse(-1L)},${
           nextRowId.map(v => s""""next-row-id":$v,""").getOrElse("")}
         |"snapshots":$snapJson}""".stripMargin
    def writeText(p: Path, content: String): Unit = {
      val out = f.create(p, true)
      try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
    writeText(new Path(md, s"v$version.metadata.json"), doc)
    writeText(new Path(md, "version-hint.text"), version.toString)
  }
}
