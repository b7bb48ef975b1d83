package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Testdata access + the deterministic geo derivation shared by Spark
  * queries and their DuckDB oracles (FIXTURES.md §B): lat/lng are derived
  * from lineitem keys into the reference's NYC bbox
  * (`data/transactions.csv`: lat 40.70–40.76, lng −74.02…−73.94). */
object Tables {

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.ts is timestamp parquet; the legacy conf covers the
    // TIMESTAMP(NANOS) encoding (reads as long), set HERE so no events
    // consumer depends on a conf-setting query having run before it
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") {
      val norm = normalizeEventsTs(df)
      requireEventsContract(norm)
      requireEventsTsUnit(norm, s"$sfDir/events.parquet")
      norm
    } else df
  }

  /** Repo-wide events contract: `ts` is BIGINT nanoseconds since epoch
    * (downstream does `ts DIV 1000` → the µs the oracle's `epoch_us(ts)`
    * computes). Testdata has shipped `ts` under three parquet encodings —
    * TIMESTAMP(NANOS) (long under the legacy conf), TIMESTAMP_MICROS
    * without timezone (TIMESTAMP_NTZ), and could ship tz-adjusted micros
    * (TIMESTAMP). This accepts all three and always yields long nanos with
    * NO session-timezone dependence: the NTZ leg is wall-clock arithmetic
    * against an NTZ epoch literal (`timestampdiff` on two NTZ operands
    * never consults a timezone), and `unix_micros` on TIMESTAMP reads the
    * internal UTC micros directly. */
  def normalizeEventsTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(TimestampNTZType) =>
        df.withColumn("ts", expr(
          "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) * 1000"))
      case Some(TimestampType) =>
        df.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
      case _ => df
    }
  }

  /** Loud single-point schema gate for the events table: a testdata
    * regeneration that drifts outside the encodings [[normalizeEventsTs]]
    * handles fails HERE with one message, not as 24 scattered analysis
    * errors in downstream `ts` arithmetic. */
  def requireEventsContract(df: DataFrame): Unit = {
    val got = df.schema.fields.map(f => f.name -> f.dataType.simpleString).toSeq
    val want = Seq("event_id" -> "bigint", "ts" -> "bigint", "user_id" -> "bigint",
      "event_type" -> "string", "value" -> "double", "props" -> "string")
    require(got == want,
      s"events contract violated: expected $want but the normalized read has $got — " +
        "the testdata's events encoding drifted; extend Tables.normalizeEventsTs")
  }

  /** VALUE half of the events gate: the schema check cannot tell long-nanos
    * from another long unit (a regeneration shipping plain INT64
    * epoch-millis or -micros has the same bigint type, and scaled millis
    * even keep `ts % 1000 == 0`), so every downstream `ts DIV 1000` would
    * silently compute wrong microseconds and only the oracle hash would
    * catch it later. Sample one non-null ts and require it inside the
    * plausible nanosecond epoch range: ≥1e17 ns ≈ 1973 — any µs (or ms)
    * value stays below 1e17 until year ~5138, so unit drift fails HERE
    * with one message. Memoized per (path, len:mtime signature) so the
    * probe action runs once per SOURCE STATE — a testdata regeneration at
    * the same path changes the signature and re-arms the gate (a
    * session-keyed memo would skip it in exactly the drift scenario the
    * gate exists to catch). */
  private val eventsTsUnitChecked =
    scala.collection.concurrent.TrieMap.empty[String, Unit]
  def requireEventsTsUnit(df: DataFrame, path: String): Unit = {
    val key = try {
      val p = new org.apache.hadoop.fs.Path(path)
      val st = p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
        .getFileStatus(p)
      s"$path|${st.getLen}:${st.getModificationTime}"
    } catch {
      // a synthetic frame with no backing file (spec fixtures) has no
      // staleness to track — memoize on the bare path
      case _: java.io.FileNotFoundException => path
    }
    eventsTsUnitChecked.getOrElseUpdate(key, {
      df.select(col("ts")).where(col("ts").isNotNull).limit(1)
        .collect().headOption.foreach { r =>
          val ts = r.getLong(0)
          require(ts >= 100000000000000000L && ts <= 9000000000000000000L,
            s"events contract violated: sampled ts=$ts from $path is outside the " +
              "plausible nanosecond epoch range [1e17, 9e18] — the testdata's ts " +
              "unit drifted (epoch millis/micros shipped as bigint?); fix " +
              "Tables.normalizeEventsTs, do NOT patch downstream DIV 1000 sites")
        }
    })
  }

  /** A table someone else wrote with REAL Delta Lake: interpret its public
    * `_delta_log` (add/remove JSON commits + `_last_checkpoint`) read-only
    * — the storage-format interop leg; the repo's own write path stays
    * [[graft.operators.SnapshotLog]]. `asOf` pins a log version. */
  def deltaTable(spark: SparkSession, path: String,
                 asOf: Option[Long] = None): DataFrame =
    graft.sources.DeltaLogReader.read(spark, path, asOf)

  /** Nanoseconds per day — the day(ts) partition transform's modulus. */
  val NanosPerDay: Long = 86400L * 1000000000L

  /** Time-range scan over a `day(ts)`-partitioned table — Iceberg's
    * HIDDEN-partitioning contract: the caller names only the `ts` range
    * (long nanos, half-open `[fromNs, untilNs)`); this helper owns the
    * ts→day transform and derives the partition predicate from it, so the
    * scan prunes whole day directories at PLANNING time and still pushes
    * the residual ts range into row groups. Without the derived predicate
    * a time-range query reads every partition however narrow the range —
    * the user should never have to (and here cannot forget to) spell the
    * partition column. Expects the layout written by partitionBy("day")
    * with `day = ts DIV $NanosPerDay` (equivalently
    * `ts DIV 1000 DIV 86400000000`). */
  def timeRangeScan(spark: SparkSession, path: String,
                    fromNs: Long, untilNs: Long): DataFrame = {
    require(fromNs < untilNs, s"empty time range [$fromNs, $untilNs)")
    // pre-epoch bounds would need floor (not truncating) division to keep
    // the derived day bounds sound; the events contract pins ts ≥ 1e17 ns,
    // so refuse instead of silently widening
    require(fromNs >= 0, s"timeRangeScan expects non-negative ns, got $fromNs")
    import org.apache.spark.sql.functions.col
    spark.read.parquet(path)
      .where(col("ts") >= fromNs && col("ts") < untilNs &&
        col("day") >= fromNs / NanosPerDay &&
        col("day") <= (untilNs - 1) / NanosPerDay)
  }

  /** Filesystem-safe tag for a scale dir — keys per-sf scratch paths so
    * runs over different sf dirs never clobber each other's artifacts.
    * Oracle SQL embeds the literal `__SFTAG__` token in scratch paths;
    * Verify substitutes this tag when dumping oracle_sql.json. */
  /** Injective path→identifier encoding: ASCII alphanumerics pass through,
    * every other char becomes a fixed-width `_XXXX` hex escape — two
    * distinct sf dirs can NEVER alias to one scratch/checkpoint namespace
    * (the old collapse-runs-to-_ mapping sent e.g. `sf0.1` and `sf0_1` to
    * the same tag, silently sharing exactly-once sink logs and staged
    * markers between scales). Output stays a valid SQL identifier tail. */
  def sfTag(sfDir: String): String = sfDir.flatMap {
    case c if (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
      (c >= '0' && c <= '9') => c.toString
    case c => f"_${c.toInt}%04x"
  }
  val SfTagToken = "__SFTAG__"

  /** Scratch parquet shared between a Spark query run and its DuckDB
    * oracle, keyed by the sf dir so runs over different scale factors never
    * clobber each other. Oracle SQL embeds the [[SfTagToken]] pattern
    * ([[scratchPat]]); the query substitutes the concrete tag at run time
    * ([[scratch]]) and Verify does the same when dumping oracle_sql.json. */
  def scratchPat(name: String): String =
    new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_${name}_$SfTagToken").toString
  def scratch(pattern: String, sfDir: String): String =
    pattern.replace(SfTagToken, sfTag(sfDir))

  /** length:mtime signature of source parquet files — the staleness key
    * shared by session-cached derived artifacts (StreamScaffold.stageTable's
    * marker pattern): a refreshed testdata dir changes the signature and
    * forces re-materialization instead of silently serving stale data. */
  def sourceSig(spark: SparkSession, sfDir: String, tables: String*): String = {
    val hconf = spark.sparkContext.hadoopConfiguration
    tables.map { t =>
      val p = new org.apache.hadoop.fs.Path(s"$sfDir/$t.parquet")
      val st = p.getFileSystem(hconf).getFileStatus(p)
      s"$t=${st.getLen}:${st.getModificationTime}"
    }.mkString(";")
  }

  /** One [[stageOnce]] invocation: where, under what source signature,
    * whether the write branch actually ran, and when (nanoTime). Bench
    * reads this log to (a) re-verify every staging survived the warm
    * phase before the timed loop and (b) attribute any in-lap restage to
    * the query that triggered it instead of silently booking staging
    * seconds into a query's headline (the r12 q122 finding). */
  final case class StageEvent(path: String, sig: String, wrote: Boolean, atNanos: Long)
  private val stageLog = new java.util.concurrent.ConcurrentLinkedQueue[StageEvent]()
  def stageEvents: Seq[StageEvent] = {
    val b = Seq.newBuilder[StageEvent]
    stageLog.forEach(e => b += e)
    b.result()
  }

  /** Freshness check shared by [[stageOnce]] and Bench's post-warm audit:
    * the `_staged` marker must exist, carry exactly `sig`, AND at least one
    * non-underscore data entry must still sit next to it — scratch lives in
    * a tmp dir, and an age-based sweeper can reap the part files while the
    * recently-rewritten marker stays. */
  def stageIsFresh(spark: SparkSession, path: String, sig: String): Boolean = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val dst = new org.apache.hadoop.fs.Path(path)
    val fs = dst.getFileSystem(hconf)
    val marker = new org.apache.hadoop.fs.Path(dst, "_staged")
    fs.exists(marker) && {
      val buf = new Array[Byte](fs.getFileStatus(marker).getLen.toInt)
      val in = fs.open(marker)
      try in.readFully(buf) finally in.close()
      new String(buf, java.nio.charset.StandardCharsets.UTF_8) == sig
    } && fs.listStatus(dst).exists { f =>
      !f.getPath.getName.startsWith("_") &&
        (f.isDirectory || f.getLen > 0)
    }
  }

  /** Write-once scratch materialization: runs `write` only when `path`
    * lacks a `_staged` marker recording `sig`. Queries that need a real
    * parquet table for their oracle replay (q122) stage it here once per
    * (sf dir, source state) instead of rewriting it every invocation. */
  def stageOnce(spark: SparkSession, path: String, sig: String)(write: => Unit): Unit = {
    val fresh = stageIsFresh(spark, path, sig)
    if (!fresh) {
      write
      val hconf = spark.sparkContext.hadoopConfiguration
      val dst = new org.apache.hadoop.fs.Path(path)
      val fs = dst.getFileSystem(hconf)
      val marker = new org.apache.hadoop.fs.Path(dst, "_staged")
      val out = fs.create(marker, true)
      try out.write(sig.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
    stageLog.add(StageEvent(path, sig, wrote = !fresh, atNanos = System.nanoTime()))
  }

  /** Scale-adaptive compute fan-out (optimization guide §2.5, "input skew:
    * one huge unsplittable file ... repartition immediately after the
    * read"): the shipped testdata tables are SINGLE parquet files with ONE
    * row group each, so a scan plans 1 partition however many cores the
    * session has — byte-range splits cannot help (every split except the
    * one holding the row-group midpoint yields 0 rows) — and per-row heavy
    * derivations (tokenize→shingle→md5, cell ids) serialize on one core of
    * 32 (measured: q139's shingle df-aggregate 3.98 s serial → 0.67 s
    * fanned at sf0.1). Repartitions to the session's default parallelism
    * ONLY when the frame's current partitioning is materially below it: on
    * a real cluster over many files/row groups the scan already carries ≥
    * parallelism partitions and this is a no-op — nothing here is tuned to
    * local mode, and the target derives from the runtime, not a constant.
    *
    * Call it on SCAN-ROOTED frames only (scan + narrow transforms): the
    * partition-count probe plans the frame's RDD, which is free for
    * exchange-less plans but would materialize shuffle stages under AQE.
    * Streaming frames pass through untouched (a repartition there would
    * add a per-micro-batch shuffle). Round-robin repartition is
    * retry-deterministic (sortBeforeRepartition, on by default) and no
    * caller below depends on input row ORDER, only row sets. */
  def fanOut(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    val cur = df.rdd.getNumPartitions
    if (cur * 2 <= target) df.repartition(target) else df
  }

  /** Data-derived partition count for ITERATIVE small-frame consumers
    * (guide §2.2 — size partitions to the data, not a session constant):
    * a frame re-joined every round of an iterative algorithm (pagerank,
    * label propagation, Pregel CC) makes every round inherit its layout,
    * and 32 partitions of a ~20k-row frame cost hundreds of near-empty
    * tasks per query. ~`rowsPerPartition` rows each (default 500k ≈ a few
    * MB of narrow rows), clamped to [2, 4 × parallelism]; at scale the
    * quotient governs and grows with the data. */
  def adaptiveParts(spark: SparkSession, rows: Long,
                    rowsPerPartition: Long = 500000L): Int =
    math.max(2L, math.min(rows / rowsPerPartition + 1L,
      4L * spark.sparkContext.defaultParallelism)).toInt

  /** Synthetic transaction points: one row per lineitem, joined to orders
    * for the user key. Columns: latitude, longitude, amount, user_id.
    * Every arithmetic step is IEEE-double and reproduced verbatim in
    * `pointsSql` so cell ids hash-match the oracle. */
  def points(spark: SparkSession, sfDir: String): DataFrame =
    points(spark, sfDir, fan = true)

  /** `fan = false` opts a consumer out of the fact-side fan-out below —
    * for queries whose only work above the join is cheap codegen index
    * math straight into an aggregate (q15, q129), where the round-robin
    * exchange costs more than the serial map-side pass it parallelizes
    * (measured +0.4–0.6 s each at sf0.1). */
  def points(spark: SparkSession, sfDir: String, fan: Boolean): DataFrame = {
    // fanOut on the fact side: lineitem ships as ONE single-row-group file,
    // so the scan (and every per-row cell/haversine derivation above this
    // join — orders broadcasts) otherwise runs on one core (guide §2.5);
    // no-op when the scan already carries ≥ parallelism partitions
    val liRaw = table(spark, sfDir, "lineitem")
    val li = if (fan) fanOut(liRaw) else liRaw
    val o = table(spark, sfDir, "orders")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .select(
        (lit(40.70) + (col("l_partkey") % 1000) * lit(6e-5)).as("latitude"),
        (lit(-74.02) + (col("l_suppkey") % 1000) * lit(8e-5)).as("longitude"),
        col("l_extendedprice").as("amount"),
        col("o_custkey").cast("string").as("user_id"))
  }

  /** DuckDB CTE matching `points` bit-for-bit. */
  val pointsSql: String =
    """points AS (
      |  SELECT CAST(40.70 AS DOUBLE) + (l_partkey % 1000) * 6e-5 AS latitude,
      |         CAST(-74.02 AS DOUBLE) + (l_suppkey % 1000) * 8e-5 AS longitude,
      |         l_extendedprice AS amount,
      |         CAST(o_custkey AS VARCHAR) AS user_id
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |)""".stripMargin

  /** DuckDB expression for `GeoFunctions.geoCell(lat, lng, res)` —
    * same step constant (exact binary double 180/2^(res+8)), same floor,
    * and the same latitude clamp / longitude positive-modulo, so the SQL
    * matches on ALL inputs (lat = ±90, lng outside [-180, 180)), not just
    * in-bbox derived points. */
  // 180/2^(res+8) is an exact binary double; CAST avoids DuckDB decimal
  // arithmetic so both engines divide by the identical double. These three
  // are the single DuckDB spelling of GeoCell.stepDegrees/latIndex/lngIndex —
  // cellSql and the q21 tiling-replay oracle both build on them.
  def stepSql(res: Int): String = s"(CAST(180 AS DOUBLE)/${1L << (res + 8)})"
  def latIdxSql(latExpr: String, res: Int): String = {
    val rows = (1L << (res + 8)).toString
    s"least(greatest(CAST(floor((($latExpr) + 90.0) / ${stepSql(res)}) AS BIGINT), 0), $rows - 1)"
  }
  def lngIdxSql(lngExpr: String, res: Int): String = {
    val cols = (1L << (res + 9)).toString
    s"(((CAST(floor((($lngExpr) + 180.0) / ${stepSql(res)}) AS BIGINT) % $cols) + $cols) % $cols)"
  }

  def cellSql(latExpr: String, lngExpr: String, res: Int): String =
    s"printf('%X%07X%07X', $res, ${latIdxSql(latExpr, res)}, ${lngIdxSql(lngExpr, res)})"

  /** DuckDB expression for `Morton.interleave(i, j)` — same magic-mask
    * spread, 64-bit integer throughout. Pass simple column references: each
    * spread stage references its input twice, so the expansion is 32 copies
    * of the input expression. */
  def mortonSql(iExpr: String, jExpr: String): String = {
    def spread(e: String): String = {
      val masked = s"(($e) & 2147483647)"
      Seq((16, 281470681808895L), (8, 71777214294589695L), (4, 1085102592571150095L),
        (2, 3689348814741910323L), (1, 6148914691236517205L))
        .foldLeft(masked) { case (acc, (sh, mask)) => s"(($acc | ($acc << $sh)) & $mask)" }
    }
    s"(${spread(iExpr)} | (${spread(jExpr)} << 1))"
  }

  /** DuckDB expression for `GeoFunctions.haversineMeters`. */
  def haversineSql(lat1: String, lng1: String, lat2: String, lng2: String): String =
    s"2.0 * CAST(6371008.8 AS DOUBLE) * asin(least(1.0, sqrt(" +
      s"sin(radians(($lat2) - ($lat1)) / 2) * sin(radians(($lat2) - ($lat1)) / 2) + " +
      s"cos(radians($lat1)) * cos(radians($lat2)) * " +
      s"sin(radians(($lng2) - ($lng1)) / 2) * sin(radians(($lng2) - ($lng1)) / 2))))"
}
