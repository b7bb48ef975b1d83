package graft.streaming

import graft.SparkSpec
import graft.score.Blooms
import graft.streaming.TileStore.{TileEvent, UserTiles}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Structured-streaming capabilities of SURVEY §2.10: stream scoring against
  * broadcast blooms, and the sliding 7-day tile validity. */
class StreamingSpec extends SparkSpec {

  // offset from a realistic epoch: event-time 0 sits exactly on the initial
  // watermark and is dropped as late data
  private def ts(minutes: Long): Timestamp = new Timestamp(1700000000000L + minutes * 60000L)

  test("bloom scoring works unchanged on a transaction stream (stateless)") {
    import spark.implicits._
    // train on one known location for user a
    val tiles = Seq(("a", graft.geo.GeoCell.cellId(40.70, -74.00, 10))).toDF("user", "h3")
    val blooms = Blooms.toMap(Blooms.train(tiles))

    implicit val sc = spark.sqlContext
    val stream = MemoryStream[(String, Double, Double)]
    val scored = Blooms.score(
      stream.toDF().toDF("user", "latitude", "longitude"), blooms, 10)

    val q = scored.writeStream.format("memory").queryName("scored_tx")
      .outputMode("append").start()
    try {
      stream.addData(("a", 40.70, -74.00), ("a", 40.76, -73.90), ("b", 40.70, -74.00))
      q.processAllAvailable()
      val rows = spark.table("scored_tx")
        .select($"user", $"latitude", $"anomaly").collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getInt(2))).toSet
      assert(rows == Set(("a", 40.70, 0), ("a", 40.76, 1), ("b", 40.70, 1)))
    } finally q.stop()
  }

  test("complete-mode snapshot converges to the batch answer across MANY batches") {
    // the q49/q86 pattern: foreachBatch overwrites one parquet snapshot per
    // batch, so the LAST batch's full state must equal the batch aggregate
    // even when the source arrives in several micro-batches (the gate runs
    // single-batch; production does not)
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[(Long, Long)]
    val out = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_spec_complete_out").toString
    val agg = stream.toDF().toDF("k", "v")
      .groupBy($"k").agg(count(lit(1)).as("n"), sum($"v").as("s"))
    val q = agg.writeStream.outputMode("complete")
      .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.write.mode("overwrite").parquet(out))
      .start()
    try {
      stream.addData((1L, 10L), (2L, 20L)); q.processAllAvailable()
      stream.addData((1L, 5L)); q.processAllAvailable()
      stream.addData((3L, 7L), (2L, 1L)); q.processAllAvailable()
      val got = spark.read.parquet(out).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == Set((1L, 2L, 15L), (2L, 2L, 21L), (3L, 1L, 7L)))
    } finally q.stop()
  }

  test("transformWithState keeps per-key state across batches") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[(Long, Long)]
    val counted = stream.toDS()
      .groupByKey(_._1)
      .transformWithState(new UserTotalsProcessor, TimeMode.None(), OutputMode.Append())
    val q = counted.toDF("user_id", "n", "s")
      .writeStream.format("memory").queryName("tws_totals")
      .outputMode("append").start()
    try {
      stream.addData((1L, 100L), (1L, 50L)); q.processAllAvailable()
      stream.addData((1L, 25L), (2L, 9L)); q.processAllAvailable()
      // append sink keeps every per-batch snapshot; the LAST row per key
      // carries the accumulated state
      val last = spark.table("tws_totals").groupBy($"user_id")
        .agg(max(struct($"n", $"s")).as("f"))
        .select($"user_id", $"f.n", $"f.s").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(last == Set((1L, 3L, 175L), (2L, 1L, 9L)))
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set(providerKey, p)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("sliding tile store expires tiles after the TTL window (7-day capability)") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val ttlSec = 3600L // 1h for the test; 604800 in production
    val stream = MemoryStream[TileEvent]
    val out = TileStore.sliding(stream.toDS(), ttlSec, watermarkDelay = "0 seconds")

    val q = out.writeStream.format("memory").queryName("tile_snapshots")
      .outputMode("append").start()
    try {
      stream.addData(TileEvent("u", "CELL1", ts(0)), TileEvent("u", "CELL2", ts(10)))
      q.processAllAvailable()
      // advance watermark far past CELL1+CELL2 expiry (>60min after)
      stream.addData(TileEvent("u", "CELL3", ts(120)))
      q.processAllAvailable()
      stream.addData(TileEvent("u", "CELL4", ts(130)))
      q.processAllAvailable()

      val snaps = spark.table("tile_snapshots").as[UserTiles].collect()
      // first snapshot: both tiles live
      assert(snaps.exists(s => s.tiles == Seq("CELL1", "CELL2")))
      // after watermark passed expiry: old tiles gone, new ones live
      val last = snaps.maxBy(_.asOfMillis)
      assert(!last.tiles.contains("CELL1") && !last.tiles.contains("CELL2"))
      assert(last.tiles.contains("CELL3"))
    } finally q.stop()
  }

  test("streaming dedup: suppresses in-window duplicates, re-emits after state expiry") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[(String, Timestamp)]
    val out = stream.toDF().toDF("key", "ts")
      .withWatermark("ts", "5 minutes")
      .dropDuplicatesWithinWatermark("key")
    val q = out.writeStream.format("memory").queryName("dedup_keys")
      .outputMode("append").start()
    try {
      stream.addData(("a", ts(1)), ("a", ts(2)), ("b", ts(1)))
      q.processAllAvailable()
      // duplicate of a within the watermark window → suppressed
      stream.addData(("a", ts(3)))
      q.processAllAvailable()
      assert(spark.table("dedup_keys").where($"key" === "a").count() == 1)
      // advance the watermark far past a's state expiry, then replay a:
      // dropDuplicatesWithinWatermark only guarantees dedup WITHIN the
      // window — the expired key re-emits (why q63's oracle equality
      // needs the single-AvailableNow-batch run where watermark stays 0)
      stream.addData(("c", ts(120)))
      q.processAllAvailable()
      stream.addData(("a", ts(119)))
      q.processAllAvailable()
      assert(spark.table("dedup_keys").where($"key" === "a").count() == 2)
    } finally q.stop()
  }

  test("stream-stream interval join emits exactly the batch join's pairs") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val left = MemoryStream[(Long, String, Timestamp)]
    val right = MemoryStream[(Long, String, Timestamp)]
    val ev = left.toDF().toDF("id", "user", "ts").withWatermark("ts", "1 minute")
    val pur = right.toDF().toDF("p_id", "p_user", "pts").withWatermark("pts", "1 minute")
    val joined = ev.join(pur, expr(
      "user = p_user AND ts >= pts AND ts <= pts + interval 1 hour"))
      .select($"p_id", $"id")
    val q = joined.writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()
    try {
      right.addData((100L, "u", ts(0)))
      left.addData((1L, "u", ts(10)), (2L, "u", ts(70)), (3L, "v", ts(10)))
      q.processAllAvailable()
      val got = spark.table("ss_join").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // only u's event inside [purchase, +1h] joins: not the one at +70min,
      // not the other user's
      assert(got == Set((100L, 1L)))
    } finally q.stop()
  }

  test("batch twin: current() applies the same TTL window") {
    import spark.implicits._
    val tiles = Seq(
      ("u", "OLD", ts(0)), ("u", "LIVE1", ts(100)), ("v", "LIVE2", ts(110))
    ).toDF("user", "h3", "createdAt")
    val out = TileStore.current(tiles, asOf = ts(120), ttlSeconds = 3600)
      .as[(String, Seq[String])].collect().toMap
    assert(out("u") == Seq("LIVE1") && out("v") == Seq("LIVE2"))
  }
}
