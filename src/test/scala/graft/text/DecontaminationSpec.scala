package graft.text

import graft.SparkSpec

class DecontaminationSpec extends SparkSpec {
  import spark.implicits._

  private def report(train: Seq[(Long, String)], ev: Seq[String],
                     n: Int): Map[Long, (Long, Long)] =
    Decontamination.contamination(
        train.toDF("doc_id", "text"), ev.toDF("text"), n = n)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("a verbatim eval run is flagged with the exact shared-gram count") {
    // train doc 1 embeds an 8-token eval run at an arbitrary position: at
    // n=8 that run contributes exactly ONE 8-gram, shared with the eval
    // doc; doc 2 is disjoint vocabulary — zero contamination
    val run = (1 to 8).map(i => s"e$i").mkString(" ")
    val m = report(
      Seq((1L, s"a1 a2 a3 $run a4 a5"), (2L, (1 to 12).map(i => s"b$i").mkString(" "))),
      Seq(s"x1 x2 $run x3"), n = 8)
    assert(m(1L)._2 == 1L, s"doc 1: $m")
    assert(m(2L)._2 == 0L, s"doc 2: $m")
    // n_grams = tokens - n + 1 distinct grams (all distinct here)
    assert(m(1L)._1 == 13 - 8 + 1)
  }

  test("per-doc distinct: a repeated contaminated gram counts once") {
    val run = "p q r s"
    val m = report(Seq((1L, s"$run zz $run")), Seq(s"head $run tail"), n = 4)
    // the doc's gram multiset repeats "p q r s" twice; distinct → once
    assert(m(1L)._2 == 1L, m)
  }

  test("documents shorter than n tokens are absent (cannot be contaminated)") {
    val m = report(Seq((1L, "just three tokens"), (2L, "one two three four")),
      Seq("one two three four"), n = 4)
    assert(!m.contains(1L), m)
    assert(m(2L) == (1L, 1L), m)
  }

  test("n must be positive; a keyless train frame is rejected") {
    intercept[IllegalArgumentException](
      Decontamination.gramHashes(Seq("x").toDF("text"), "text", 0))
    intercept[IllegalArgumentException](
      Decontamination.contamination(Seq("x").toDF("text"), Seq("y").toDF("text")))
  }

  test("the eval gram set meets the corpus through a broadcast join") {
    // the 100 TB contract: the corpus-side plan must carry a
    // BroadcastHashJoin against the eval gram set, never a shuffle of
    // the corpus gram stream toward the eval side
    val df = Decontamination.contamination(
      Seq((1L, "a b c d e")).toDF("doc_id", "text"),
      Seq("a b c d").toDF("text"), n = 4)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }
}
