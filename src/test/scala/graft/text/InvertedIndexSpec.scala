package graft.text

import graft.SparkSpec

class InvertedIndexSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (1L, "spark spark shuffles data"),
      (2L, "Spark reads data fast"),
      (3L, "data data data")
    ).toDF("doc_id", "text")
  }

  test("df counts documents (not occurrences) and is case-folded") {
    val out = InvertedIndex.build(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out("spark") == (2L, "1,2"))   // doc 1 repeats it; df still 2
    assert(out("data") == (3L, "1,2,3"))
    assert(out("fast") == (1L, "2"))
  }

  test("posting cap bounds the list but not the df") {
    val out = InvertedIndex.build(docs, postingCap = 2).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out("data") == (3L, "1,2")) // full df, first-2 postings
  }
}
