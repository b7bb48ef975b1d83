package graft.streaming

import graft.SparkSpec

/** q227 runs the append-window aggregation on the RocksDB state store.
  * The oracle pins the VALUES; this pins the PROVIDER — that RocksDB
  * actually engaged (its checkpoint artifacts are .zip snapshots /
  * .changelog files, not the default provider's .delta/.snapshot), and
  * that the session conf is restored afterwards. */
class StreamingRocksDbSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q227 engages RocksDB state and restores the provider conf") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(key)
    val rows = graft.SparkEntry.queries("q227_stream_rocksdb")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(spark.conf.getOption(key) == before, "provider conf leaked")

    // RocksDB leaves .zip version uploads (and optionally .changelog)
    // under <chk>/state/...; the default provider writes .delta files
    val chk = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_q227_chk_${graft.Tables.sfTag(sf)}")
    // listFiles() returns null on races/permission oddities, not just
    // non-directories — guard so a missing dir fails on the assert below
    // with the descriptive message, not an NPE mid-walk
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
      else Seq(f)
    val stateDir = new java.io.File(chk, "state")
    assert(stateDir.isDirectory, s"checkpoint state dir missing: $stateDir")
    val state = walk(stateDir).map(_.getName)
    assert(state.exists(n => n.endsWith(".zip") || n.endsWith(".changelog")),
      s"no RocksDB artifacts under $chk/state: ${state.take(20)}")
    assert(!state.exists(_.endsWith(".delta")),
      s"default-provider .delta files present — RocksDB did not engage: ${state.take(20)}")
  }

  test("q227 matches the same windows computed on the default provider") {
    import org.apache.spark.sql.functions._
    // the provider must be a pure storage swap: recompute the aggregation
    // as a batch query and compare counts per (window, type)
    val out = graft.SparkEntry.queries("q227_stream_rocksdb")(spark, sf)
    val ev = graft.Tables.table(spark, sf, "events")
    val wmRow = ev.agg(max(expr("ts DIV 1000"))).head.getLong(0) - 10000000L
    val batch = ev.select(col("event_type"), col("value"),
        expr("(ts DIV 1000) - ((ts DIV 1000) % 3600000000) ").as("ws_us"))
      .where(col("ws_us") + 3600000000L <= wmRow)
      .groupBy(col("ws_us"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(value * 1000000) AS BIGINT)")).as("value_micro"))
    val a = out.collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val b = batch.collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(a == b, s"stream/batch divergence: ${a.size} vs ${b.size} groups")
  }
}
