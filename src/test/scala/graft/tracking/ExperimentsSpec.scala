package graft.tracking

import graft.SparkSpec

class ExperimentsSpec extends SparkSpec {

  private def freshStore(name: String): ExperimentStore = {
    val root = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_expstore_$name").toString
    val st = new ExperimentStore(spark, root)
    st.reset()
    st
  }

  test("logRun round-trips params and metrics through the store") {
    val st = freshStore("roundtrip")
    st.logRun("exp", "a", Map("epsilon" -> "150"), Map("score" -> 10.0),
      tags = Map("owner" -> "ci"))
    val rows = st.runs().collect()
    assert(rows.length == 3)
    val byKind = rows.groupBy(_.getString(2))
    assert(byKind("param").head.getString(4) == "150")
    assert(byKind("metric").head.getDouble(5) == 10.0)
    assert(byKind("tag").head.getString(4) == "ci")
  }

  test("searchRuns pivots one row per run; bestRun picks the extreme") {
    val st = freshStore("search")
    st.logRun("exp", "a", Map("epsilon" -> "100"), Map("score" -> 10.0))
    st.logRun("exp", "b", Map("epsilon" -> "200"), Map("score" -> 30.0))
    st.logRun("other", "c", Map("epsilon" -> "1"), Map("score" -> 99.0))
    val out = st.searchRuns("exp", Seq("epsilon"), Seq("score")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(out == Set(("a", "100", 10.0), ("b", "200", 30.0)))
    val best = st.bestRun("exp", "score").collect()
    assert(best.length == 1 && best.head.getString(1) == "b")
    val worst = st.bestRun("exp", "score", maximize = false).collect()
    assert(worst.length == 1 && worst.head.getString(1) == "a")
  }
}
