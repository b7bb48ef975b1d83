package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The reference's online tile store, made Spark-native (SURVEY §2.10).
  *
  * In the reference this is a MongoDB collection of (user, tile, createdAt)
  * with a TTL index — `expireAfterSeconds: 604800` — giving tiles a sliding
  * 7-day validity while models retrain daily
  * (`02_geofraud_fraud.py:281-304`). Here the same capability is:
  *
  *  - batch: a `createdAt >= asOf - ttl` filter + per-user collect
  *    ([[current]]) — the oracle-checkable twin;
  *  - streaming: event-time watermark + `flatMapGroupsWithState` with a
  *    per-(user) state of tile→lastSeen, pruned against the watermark
  *    ([[sliding]]). State is O(active tiles per user); keys expire via
  *    EventTimeTimeout so abandoned users cost nothing.
  */
object TileStore {

  val DefaultTtlSeconds: Long = 604800L // 02_geofraud_fraud.py:286

  case class TileEvent(user: String, h3: String, createdAt: java.sql.Timestamp)
  case class UserTiles(user: String, tiles: Seq[String], asOfMillis: Long)

  /** Batch twin: tiles valid in the `ttlSeconds` window ending at `asOf`,
    * one row per user with the sorted valid tile set. */
  def current(tiles: DataFrame, asOf: java.sql.Timestamp,
              ttlSeconds: Long = DefaultTtlSeconds): DataFrame = {
    val cutoff = new java.sql.Timestamp(asOf.getTime - ttlSeconds * 1000L)
    tiles
      .filter(col("createdAt") > cutoff && col("createdAt") <= asOf)
      .groupBy(col("user"))
      .agg(sort_array(collect_set(col("h3"))).as("tiles"))
  }

  /** Batch twin anchored at the data's own max timestamp, computed in-plan
    * (no driver round-trip, no ms-truncation of the cutoff). */
  def currentAsOfMax(tiles: DataFrame, ttlSeconds: Long = DefaultTtlSeconds): DataFrame = {
    val mx = tiles.agg(max(col("createdAt")).as("__mt"))
    tiles.crossJoin(mx)
      .filter(col("createdAt") > col("__mt") - expr(s"INTERVAL $ttlSeconds SECONDS") &&
        col("createdAt") <= col("__mt"))
      .groupBy(col("user"))
      .agg(sort_array(collect_set(col("h3"))).as("tiles"))
  }

  /** Streaming: emits the updated valid-tile snapshot for a user whenever
    * its tiles change or expire. Input must carry event-time `createdAt`. */
  def sliding(tiles: Dataset[TileEvent], ttlSeconds: Long = DefaultTtlSeconds,
              watermarkDelay: String = "10 seconds"): Dataset[UserTiles] = {
    import tiles.sparkSession.implicits._
    tiles
      .withWatermark("createdAt", watermarkDelay)
      .groupByKey(_.user)
      .flatMapGroupsWithState[Map[String, Long], UserTiles](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user, events, state: GroupState[Map[String, Long]]) =>
          val ttlMs = ttlSeconds * 1000L
          val watermark = state.getCurrentWatermarkMs()
          val prev = state.getOption.getOrElse(Map.empty)
          val updated = events.foldLeft(prev) { (m, e) =>
            val t = e.createdAt.getTime
            if (m.getOrElse(e.h3, Long.MinValue) >= t) m else m.updated(e.h3, t)
          }
          val live = updated.filter { case (_, seen) => seen + ttlMs > watermark }
          if (live.isEmpty) {
            state.remove()
            Iterator.single(UserTiles(user, Seq.empty, watermark))
          } else {
            state.update(live)
            // wake again when the oldest live tile expires
            state.setTimeoutTimestamp(live.values.min + ttlMs)
            Iterator.single(UserTiles(user, live.keys.toSeq.sorted, watermark))
          }
      }
  }
}
