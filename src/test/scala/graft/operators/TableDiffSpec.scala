package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TableDiffSpec extends SparkSpec {

  private def repr(d: org.apache.spark.sql.DataFrame) =
    concat_ws("|", d("id").cast("string"), d("v").cast("string"))

  test("identical snapshots diff to zero buckets") {
    import spark.implicits._
    val a = (1L to 200L).map(i => (i, s"v$i")).toDF("id", "v")
    val b = (1L to 200L).map(i => (i, s"v$i")).toDF("id", "v")
    assert(TableDiff.diff(a, b, repr(a), repr(b), 16).count() == 0)
  }

  test("a modified, an added, and a removed row each surface their bucket") {
    import spark.implicits._
    val a = (1L to 200L).map(i => (i, s"v$i")).toDF("id", "v")
    val b = (1L to 201L).filter(_ != 50L) // 201 added, 50 removed
      .map(i => (i, if (i == 7L) "CHANGED" else s"v$i")).toDF("id", "v")
    val d = TableDiff.diff(a, b, repr(a), repr(b), 16).collect()
    assert(d.nonEmpty && d.length <= 6) // ≤ 2 buckets per divergent row
    // counts disagree in at least one surfaced bucket (add/remove visible)
    assert(d.exists(r => r.getLong(r.fieldIndex("n_rows_a")) != r.getLong(r.fieldIndex("n_rows_b"))))
  }

  test("profile: one pass yields per-column null and distinct counts") {
    import spark.implicits._
    val df = Seq((1L, Some("a")), (2L, Some("a")), (3L, None), (4L, Some("b")))
      .toDF("id", "tag")
    val p = Profile.profile(df, Seq("id", "tag")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(p("id") == (4L, 0L, 4L))
    assert(p("tag") == (4L, 1L, 2L)) // null dropped from distinct
  }
}
