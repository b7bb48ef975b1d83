package graft.queries

import graft.SparkSpec
import graft.sources.Iceberg

/** Law-level checks for the round-12 Iceberg additions over sf0.001: the
  * DuckDB oracle pins q232/q234's exact values; these pin WHY the numbers
  * are cheap — how many files the predicate actually planned — and the
  * AS-OF snapshot-selection boundaries. */
class Round12QueriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private lazy val base = InteropQueries.stageQ232IcebergTable(spark, sf)

  test("q232's predicate plans exactly ONE of the fixture's 10 files") {
    assert(Iceberg.planFiles(spark, base).size == 10)
    // partition summary alone: 4 manifests pruned unopened → 2 files
    val byType = Iceberg.planFiles(spark, base,
      Seq(Iceberg.ColRange("event_type", "purchase", "purchase")))
    assert(byType.size == 2, byType.mkString(", "))
    assert(byType.forall(_.contains("purchase")), byType.mkString(", "))
    // + the value bound: the purchase_hi file is dropped on its stats
    val point = Iceberg.planFiles(spark, base,
      Seq(Iceberg.ColRange("event_type", "purchase", "purchase"),
        Iceberg.ColRange("value_micros", 0L, 49999999L)))
    assert(point.size == 1 && point.head.contains("purchase_lo"),
      point.mkString(", "))
  }

  test("readPruned + residual filter equals the unpruned filtered read") {
    import org.apache.spark.sql.functions._
    def checksum(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.where(col("event_type") === "purchase" &&
          col("value_micros").between(0L, 49999999L))
        .agg(count(lit(1)), sum(col("event_id"))).head
      (r.getLong(0), r.getLong(1))
    }
    val pruned = checksum(Iceberg.readPruned(spark, base, Seq(
      Iceberg.ColRange("event_type", "purchase", "purchase"),
      Iceberg.ColRange("value_micros", 0L, 49999999L))))
    val full = checksum(Iceberg.read(spark, base))
    assert(pruned == full && pruned._1 > 0L, s"$pruned vs $full")
  }

  test("readAsOf selects latest snapshot <= ts and refuses pre-history") {
    // fixture commits: 2001 @ ts 1000 (3 types), 2002 @ ts 5000 (5 types)
    def n(ts: Long): Long = Iceberg.readAsOf(spark, base, ts).count()
    val atFirst = n(1000L)
    assert(n(4999L) == atFirst, "between commits must serve the EARLIER one")
    val atSecond = n(5000L)
    assert(atSecond > atFirst, "the 5-type snapshot must be strictly larger")
    assert(n(999999L) == atSecond, "after the last commit = current")
    val e = intercept[IllegalArgumentException](Iceberg.readAsOf(spark, base, 999L))
    assert(e.getMessage.contains("before"), e.getMessage)
  }

  test("q241's transforms prune: one bucket's manifest, then only its window files") {
    import graft.sources.IcebergTransforms
    val hidden = InteropQueries.stageQ241IcebergHiddenPart(spark, sf)
    val DayUs = 86400000000L
    val all = Iceberg.planFiles(spark, hidden)
    assert(all.nonEmpty)
    val b = IcebergTransforms.bucket(4, "long", 7L)
    // user point → exactly bucket b's files (3 manifests pruned unopened;
    // every planned file name carries the writer's bucket tag)
    val byUser = Iceberg.planFiles(spark, hidden,
      Seq(Iceberg.ColRange("user_id", 7L, 7L)))
    assert(byUser.nonEmpty && byUser.forall(_.contains(s"b${b}_d")),
      byUser.take(5).mkString(", "))
    assert(byUser.size == all.count(_.contains(s"b${b}_d")))
    // + the day window: at most 3 daily files survive
    val window = Iceberg.planFiles(spark, hidden, Seq(
      Iceberg.ColRange("user_id", 7L, 7L),
      Iceberg.ColRange("ts_us", 19728L * DayUs, 19731L * DayUs - 1)))
    assert(window.nonEmpty && window.size <= 3, window.mkString(", "))
    val days = Set(19728L, 19729L, 19730L).map(d => s"_d${d * DayUs}.parquet")
    assert(window.forall(f => f.contains(s"b${b}_d") && days.exists(f.endsWith)),
      window.mkString(", "))
    // pruned read + residual == unpruned read + residual (soundness)
    import org.apache.spark.sql.functions._
    def agg(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.where(col("user_id") === 7L &&
          col("ts_us").between(19728L * DayUs, 19731L * DayUs - 1))
        .agg(count(lit(1)), sum(col("event_id"))).head
      (r.getLong(0), r.getLong(1))
    }
    val pruned = agg(Iceberg.readPruned(spark, hidden, Seq(
      Iceberg.ColRange("user_id", 7L, 7L),
      Iceberg.ColRange("ts_us", 19728L * DayUs, 19731L * DayUs - 1))))
    assert(pruned == agg(Iceberg.read(spark, hidden)) && pruned._1 > 0L)
  }

  test("q235's streaming rollup equals q230's batch report at source grain") {
    // same gram math, same eval split, different engines (micro-batch
    // stream-static vs batch): the per-source gram totals must agree
    def rows(name: String, cols: Seq[String]) =
      graft.SparkEntry.queries(name)(spark, sf)
        .selectExpr(cols: _*).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val stream = rows("q235_stream_decontamination",
      Seq("source", "n_grams", "n_contaminated_grams"))
    val batch = rows("q230_contamination",
      Seq("source", "n_grams", "n_contaminated_grams"))
    assert(stream == batch, s"stream $stream vs batch $batch")
    assert(stream.nonEmpty)
  }

  test("the fixture's data files carry parquet field ids (writer fidelity)") {
    // the pruned table must exercise the field-id read path end-to-end:
    // a schema served from metadata (not footers) with correct values
    val df = Iceberg.read(spark, base)
    assert(df.columns.toSeq == Seq("event_id", "event_type", "value_micros"))
    assert(df.schema.fields.forall(_.dataType != org.apache.spark.sql.types.NullType))
  }
}
