package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

import scala.jdk.CollectionConverters._

/** K-minimum-values (bottom-k) distinct-count sketch — the classic
  * Bar-Yossef et al. estimator: hash every value uniformly into [0, 2^60),
  * keep the k smallest DISTINCT hashes per group, and estimate
  * |distinct| ≈ (k-1) · 2^60 / h_(k) (exact count when fewer than k
  * distinct hashes were seen). The reference's stack answers this with
  * engine-native approx sketches; here the sketch is built from the same
  * cross-engine-stable md5 hash as the rest of the repo
  * ([[TextFunctions.md5Bucket60]]), so DuckDB replays the estimate
  * bit-for-bit — an *auditable* approximate aggregate.
  *
  * Scale shape: two-level bounded aggregation. A partition-local pass folds
  * rows into one bounded TreeSet per group (map-side partial — memory is
  * #groups × k longs, independent of partition row count), then ONE shuffle
  * on the group key merges k-element arrays. No full sort, no unbounded
  * collect_list, no window over the raw data — at 100 TB the exchange
  * carries ≤ k·8 bytes per group per map partition. Sketches are mergeable
  * (union = merge-and-trim, [[mergeKept]]), so tiered rollups (hour→day)
  * reuse the same state.
  */
object Kmv {

  /** Size of the hash space: md5Bucket60 yields 60-bit non-negative longs.
    * 63·2^60 is exactly representable as a Double, so the estimate
    * arithmetic below is IEEE-identical across engines. */
  val HashSpace: Double = 1152921504606846976.0 // 2^60

  /** Merge bottom-k sets: union, keep the k smallest distinct. */
  private[sketch] def mergeKept(into: java.util.TreeSet[java.lang.Long],
                                from: Array[Long], k: Int): Unit = {
    var i = 0
    while (i < from.length) {
      into.add(from(i))
      if (into.size > k) into.pollLast()
      i += 1
    }
  }

  /** Per-group KMV sketch state: `(key, n_kept, kth_hash)` where `kth_hash`
    * is the largest kept hash (the k-th minimum when the sketch is full).
    * Null values are dropped (they hash to no value, matching
    * `count(DISTINCT ...)` semantics).
    *
    * CONTRACT: the returned `key` column is the STRING form of `keyCol`
    * (the grouping is defined on string keys so the sketch replays in any
    * engine) — joining it back to a non-string source key needs an
    * explicit cast on the caller's side. */
  def sketchState(df: DataFrame, keyCol: String, valueCol: String, k: Int): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    val s = df.sparkSession
    import s.implicits._
    df.filter(col(valueCol).isNotNull)
      .select(col(keyCol).cast("string").as("key"),
        TextFunctions.md5Bucket60(col(valueCol).cast("string")).as("hv"))
      .as[(String, Long)]
      .mapPartitions { it =>
        // bounded partial state per group — the map-side combine
        val acc = scala.collection.mutable.HashMap
          .empty[String, java.util.TreeSet[java.lang.Long]]
        it.foreach { case (key, hv) =>
          val set = acc.getOrElseUpdate(key, new java.util.TreeSet[java.lang.Long]())
          set.add(hv)
          if (set.size > k) set.pollLast()
        }
        acc.iterator.map { case (key, set) =>
          // iterator, not .asScala.map: mapping the Set wrapper rehashes
          // into an unordered Set and loses the ascending order
          (key, set.iterator.asScala.map(_.longValue).toArray)
        }
      }
      .groupByKey(_._1)
      .mapGroups { (key, it) =>
        val set = new java.util.TreeSet[java.lang.Long]()
        it.foreach(p => mergeKept(set, p._2, k))
        (key, set.size.toLong, set.last.longValue)
      }
      .toDF(keyCol, "n_kept", "kth_hash")
  }

  /** Full bottom-k sketch per group — `(key, kept)` with `kept` the
    * ascending array of the k smallest distinct 60-bit hashes. Same
    * bounded two-level aggregation as [[sketchState]], but the whole
    * sketch survives, so SET ALGEBRA over groups (union / intersection /
    * Jaccard between sketches) runs on ≤ k longs per group — the
    * theta-sketch trick: after this one corpus-scale pass, cross-group
    * overlap math is independent of the data volume. */
  def sketchKept(df: DataFrame, keyCol: String, valueCol: String, k: Int): DataFrame =
    sketchKeptHashed(
      df.filter(col(valueCol).isNotNull)
        .select(col(keyCol),
          TextFunctions.md5Bucket60(col(valueCol).cast("string")).as("__hv")),
      keyCol, "__hv", k)

  /** [[sketchKept]] over PRE-HASHED values — for callers that already
    * carry the 60-bit hash (e.g. a cached md5-shingle frame, where the
    * hash is `conv(substring(bh, 1, 15), 16, 10)` of the stored hex):
    * skips the re-tokenize + re-md5 pass entirely. */
  def sketchKeptHashed(df: DataFrame, keyCol: String, hvCol: String, k: Int): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    val s = df.sparkSession
    import s.implicits._
    // null hashes are dropped, matching sketchState/sketchKept's
    // count-DISTINCT-of-values semantics — without this a null hvCol row
    // hits the primitive-Long encoder and dies with an opaque NPE. The
    // filter runs on the CAST value: a non-numeric string hv would pass a
    // plain isNotNull and still cast to null downstream
    df.filter(col(hvCol).cast("long").isNotNull)
      .select(col(keyCol).cast("string").as("key"), col(hvCol).cast("long").as("hv"))
      .as[(String, Long)]
      .mapPartitions { it =>
        val acc = scala.collection.mutable.HashMap
          .empty[String, java.util.TreeSet[java.lang.Long]]
        it.foreach { case (key, hv) =>
          val set = acc.getOrElseUpdate(key, new java.util.TreeSet[java.lang.Long]())
          set.add(hv)
          if (set.size > k) set.pollLast()
        }
        acc.iterator.map { case (key, set) =>
          (key, set.iterator.asScala.map(_.longValue).toArray)
        }
      }
      .groupByKey(_._1)
      .mapGroups { (key, it) =>
        val set = new java.util.TreeSet[java.lang.Long]()
        it.foreach(p => mergeKept(set, p._2, k))
        (key, set.iterator.asScala.map(_.longValue).toArray)
      }
      .toDF(keyCol, "kept")
  }

  /** The estimate column for a sketch-state frame: exact `n_kept` below
    * capacity, else (k-1)·2^60 / kth_hash. The arithmetic is spelled
    * operand-for-operand like its DuckDB twin ([[estimateSql]]) so both
    * engines produce the same IEEE double. */
  def estimate(nKept: Column, kthHash: Column, k: Int): Column =
    round(estimateRaw(nKept, kthHash, k), 6)

  /** [[estimate]] WITHOUT the display rounding — for derived quantities
    * (e.g. intersection = union_est × jaccard) that must round once, at
    * the end, identically in both engines. */
  def estimateRaw(nKept: Column, kthHash: Column, k: Int): Column =
    when(nKept < k, nKept.cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(HashSpace) / kthHash.cast("double"))

  /** DuckDB twin of the full sketch over `valueSql` grouped by `keySql` —
    * distinct hashes ranked per key, bottom-k aggregated, same estimate
    * arithmetic. */
  def sketchSql(table: String, keySql: String, valueSql: String, k: Int): String =
    s"""WITH h AS (SELECT DISTINCT $keySql AS key,
       |  ${TextFunctions.md5Bucket60Sql(s"CAST($valueSql AS VARCHAR)")} AS hv
       |  FROM $table WHERE $valueSql IS NOT NULL),
       |r AS (SELECT key, hv, row_number() OVER (PARTITION BY key ORDER BY hv) AS rn FROM h),
       |kk AS (SELECT key, CAST(count(*) AS BIGINT) AS n_kept, max(hv) AS kth_hash
       |       FROM r WHERE rn <= $k GROUP BY key)""".stripMargin

  /** DuckDB twin of [[estimate]]. */
  def estimateSql(k: Int): String =
    s"round(${estimateRawSql(k)}, 6)"

  /** DuckDB twin of [[estimateRaw]] (expects `n_kept` / `kth_hash`
    * columns in scope; override the names via the parameters). */
  def estimateRawSql(k: Int, nKept: String = "n_kept", kthHash: String = "kth_hash"): String =
    s"CASE WHEN $nKept < $k THEN CAST($nKept AS DOUBLE) " +
      s"ELSE CAST(${(k - 1).toDouble} AS DOUBLE) * CAST($HashSpace AS DOUBLE) / CAST($kthHash AS DOUBLE) END"
}
