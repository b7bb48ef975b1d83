package graft.text

import graft.SparkSpec

class Bm25Spec extends SparkSpec {

  private def corpus() = {
    import spark.implicits._
    Seq(
      (1L, "cat dog cat"),       // tf(cat)=2, dl=3
      (2L, "cat fish"),          // tf(cat)=1, dl=2
      (3L, "dog dog dog dog"),   // no cat
      (4L, "bird")               // no query term
    ).toDF("doc_id", "text")
  }

  test("scores match a hand replay of the pinned arithmetic") {
    val out = Bm25.topK(corpus(), Seq("cat"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // N=4, avgdl=(3+2+4+1)/4=2.5, df(cat)=2 → idf = ln(1 + 2.5/2.5) = ln 2
    val idf = math.log(1.0 + (4.0 - 2.0 + 0.5) / (2.0 + 0.5))
    def score(tf: Double, dl: Double): Long =
      math.round(idf * ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / 2.5)))) * 1e6)
    assert(out.toSeq == Seq(
      (1L, 1L, score(2.0, 3.0), 1L),
      (2L, 1L, score(1.0, 2.0), 2L)))
  }

  test("multi-term: n_terms_hit counts matched terms; ranks are dense from 1") {
    val out = Bm25.topK(corpus(), Seq("cat", "dog", "fish"), k = 10).collect()
    val byDoc = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDoc(1L) == 2L && byDoc(2L) == 2L && byDoc(3L) == 1L)
    assert(!byDoc.contains(4L)) // no query term → excluded
    assert(out.map(_.getLong(3)).toSeq == (1L to out.length).toSeq)
  }

  test("k caps the result") {
    assert(Bm25.topK(corpus(), Seq("cat", "dog"), k = 1).count() == 1L)
  }
}
