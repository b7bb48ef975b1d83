package graft.operators

import graft.SparkSpec

class MergeSpec extends SparkSpec {

  test("upsert replaces matched keys, inserts fresh keys, keeps the rest") {
    import spark.implicits._
    val target = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val updates = Seq((2L, "B"), (4L, "D")).toDF("k", "v")
    val out = Merge.upsert(target, updates, Seq("k")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set((1L, "a"), (2L, "B"), (3L, "c"), (4L, "D")))
  }

  test("requireUniqueKeys passes unique updates through and rejects dups") {
    import spark.implicits._
    val ok = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    assert(Merge.requireUniqueKeys(ok, Seq("k")).count() == 2)
    val dup = Seq((1L, "a"), (1L, "b")).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      Merge.requireUniqueKeys(dup, Seq("k"))
    }
    assert(e.getMessage.contains("duplicate keys"))
  }
}
