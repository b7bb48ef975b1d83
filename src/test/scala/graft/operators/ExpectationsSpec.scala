package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExpectationsSpec extends SparkSpec {

  private lazy val rows = {
    import spark.implicits._
    Seq(
      (1L, Some(5.0), Some("click")),   // clean
      (2L, Some(-1.0), Some("view")),   // negative value
      (3L, None, Some("click")),        // null value → NULL predicate → violation
      (4L, Some(2.0), None),            // null type
      (5L, Some(-3.0), Some("weird"))   // two violations
    ).toDF("id", "value", "event_type")
  }

  private val rules = Seq(
    Expectations.Rule("non_negative", col("value") >= 0.0),
    Expectations.Rule("known_type", col("event_type").isin("click", "view")))

  test("NULL predicates count as violations (ternary CHECK semantics)") {
    import spark.implicits._
    val ann = Expectations.annotate(rows, rules)
      .select($"id", $"violations")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    assert(ann(1L) == Set.empty[String])
    assert(ann(2L) == Set("non_negative"))
    assert(ann(3L) == Set("non_negative")) // null value fails the check
    assert(ann(4L) == Set("known_type"))
    assert(ann(5L) == Set("non_negative", "known_type"))
  }

  test("split partitions the input exactly; quarantine keeps the reasons") {
    import spark.implicits._
    val (valid, quarantined) = Expectations.split(rows, rules)
    assert(valid.select($"id").as[Long].collect().toSet == Set(1L))
    assert(quarantined.count() == 4)
    assert(valid.count() + quarantined.count() == rows.count())
    assert(quarantined.columns.contains("violations"))
  }

  test("stats: per-rule counts + totals, one aggregate pass") {
    val st = Expectations.stats(rows, rules)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(st("valid_rows") == 1L)
    assert(st("quarantined_rows") == 4L)
    assert(st("viol_non_negative") == 3L)
    assert(st("viol_known_type") == 2L)
  }

  test("rule names with quotes/spaces/dots are data, never parsed as SQL") {
    val hostile = Seq(
      Expectations.Rule("has ' quote — and.dots", col("value") >= 0.0),
      Expectations.Rule("select * from x; --", col("event_type").isNotNull))
    val st = Expectations.stats(rows, hostile)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(st("viol_has ' quote — and.dots") == 3L)
    assert(st("viol_select * from x; --") == 1L)
    assert(st("valid_rows") == 1L)
  }

  test("annotate rejects an input that already has a violations column") {
    val pre = Expectations.annotate(rows, rules)
    val e = intercept[IllegalArgumentException](Expectations.annotate(pre, rules))
    assert(e.getMessage.contains("violations"))
  }
}
