package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** The events-ts contract gate (VERDICT r6 item 2): whatever timestamp
  * encoding the testdata ships, `Tables.table` must hand every consumer
  * `ts` as BIGINT nanoseconds since epoch — and a drift outside the
  * handled encodings must fail in ONE place with one message, not as 24
  * scattered `DATATYPE_MISMATCH` analysis errors. Reads the head of every
  * sf dir's events so a silent testdata regeneration is caught at spec
  * time. */
class EventsContractSpec extends SparkSpec {

  private val sfDirs =
    Seq("sf0.001", "sf0.01", "sf0.1").map(s => s"/root/testdata/$s")
      .filter(d => new java.io.File(s"$d/events.parquet").exists())

  import spark.implicits._

  test("every sf dir's events normalizes to the long-nanos contract") {
    assert(sfDirs.nonEmpty, "no testdata sf dirs found")
    sfDirs.foreach { dir =>
      val ev = Tables.table(spark, dir, "events")
      assert(ev.schema("ts").dataType == LongType, s"$dir ts dtype")
      assert(ev.schema.fieldNames.toSeq ==
        Seq("event_id", "ts", "user_id", "event_type", "value", "props"), s"$dir columns")
      // whole-micros nanos: DIV 1000 (the repo-wide µs step) is exact
      val head = ev.select($"ts").filter($"ts" % 1000 =!= 0).limit(1)
      assert(head.isEmpty, s"$dir ts carries sub-microsecond precision")
    }
  }

  test("normalized micros equal the raw parquet micros, timezone-independent") {
    // the NTZ leg must be pure wall-clock arithmetic: flipping the session
    // timezone must not move a single value (the hazard: NTZ→TIMESTAMP
    // casts silently consult spark.sql.session.timeZone)
    val dir = sfDirs.head
    val prev = spark.conf.get("spark.sql.session.timeZone")
    def firstTs(): Long = Tables.table(spark, dir, "events")
      .orderBy($"event_id").select($"ts").limit(1).collect()(0).getLong(0)
    val utc = firstTs()
    try {
      spark.conf.set("spark.sql.session.timeZone", "Pacific/Kiritimati")
      assert(firstTs() == utc, "ts value moved with the session timezone")
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
    // and against the file's own encoding: an NTZ read's raw micros must
    // equal the normalized nanos DIV 1000
    val raw = spark.read.parquet(s"$dir/events.parquet")
    if (raw.schema("ts").dataType == TimestampNTZType) {
      val rawMicros = raw.orderBy($"event_id")
        .select(expr(
          "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"))
        .limit(1).collect()(0).getLong(0)
      assert(rawMicros * 1000L == utc)
    }
  }

  test("the staged STREAM source honors the same long-nanos contract") {
    // StreamScaffold stages a RAW file copy, so its readStream schema is
    // whatever the testdata shipped — the scaffold must normalize exactly
    // like Tables.table or every ts-arithmetic stream dies (the r6 break)
    val dir = sfDirs.head
    val src = graft.queries.StreamScaffold.stageTable(spark, dir, "events")
    val schema = spark.read.parquet(src).schema
    val stream = Tables.normalizeEventsTs(
      spark.readStream.schema(schema).parquet(src))
    assert(stream.isStreaming)
    assert(stream.schema("ts").dataType == LongType, stream.schema.simpleString)
  }

  test("a drifted encoding fails loudly at the single contract gate") {
    val bad = spark.range(3).select(
      $"id".as("event_id"), $"id".cast("string").as("ts"), $"id".as("user_id"),
      lit("x").as("event_type"), lit(1.0).as("value"), lit("{}").as("props"))
    val e = intercept[IllegalArgumentException] {
      Tables.requireEventsContract(Tables.normalizeEventsTs(bad))
    }
    assert(e.getMessage.contains("events contract violated"))
  }

  test("a ts UNIT drift (millis/micros as bigint) fails at the value gate") {
    // schema-identical to the contract — only the unit is wrong, the case
    // the name/type check cannot see (ADVICE r7): epoch millis scaled into
    // bigint even keep ts % 1000 == 0 for whole-second stamps
    def withTs(ts: Long, tag: String) = {
      val df = spark.range(3).select(
        $"id".as("event_id"), lit(ts).as("ts"), $"id".as("user_id"),
        lit("x").as("event_type"), lit(1.0).as("value"), lit("{}").as("props"))
      Tables.requireEventsContract(df) // passes: unit invisible to schema
      (df, s"/nonexistent/unit-spec-$tag-$ts")
    }
    Seq(1700000000000L -> "millis", 1700000000000000L -> "micros").foreach {
      case (ts, tag) =>
        val (df, path) = withTs(ts, tag)
        val e = intercept[IllegalArgumentException] {
          Tables.requireEventsTsUnit(df, path)
        }
        assert(e.getMessage.contains("nanosecond epoch range"), tag)
    }
    // genuine nanos pass, and the probe memoizes per (session, path)
    val (good, path) = withTs(1700000000000000000L, "nanos")
    Tables.requireEventsTsUnit(good, path)
    Tables.requireEventsTsUnit(good, path)
  }
}
