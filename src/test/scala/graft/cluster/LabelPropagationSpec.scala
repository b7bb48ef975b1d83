package graft.cluster

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class LabelPropagationSpec extends SparkSpec {

  /** Symmetrize an undirected edge list for [[LabelPropagation.run]]. */
  private def sym(edges: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    val e = edges.toDF("a", "b")
    e.unionAll(e.select($"b".as("a"), $"a".as("b")))
  }

  private def labels(adj: DataFrame, iters: Int): Map[Long, Long] =
    LabelPropagation.run(adj, iters).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two cliques joined by one bridge resolve to two communities") {
    // cliques {1,2,3,4} and {10,11,12,13}, bridge 4–10: plurality votes
    // keep each clique on its own min label; the bridge can't flip a side
    val cliqueA = for (x <- 1L to 4L; y <- 1L to 4L if x < y) yield (x, y)
    val cliqueB = for (x <- 10L to 13L; y <- 10L to 13L if x < y) yield (x, y)
    val lab = labels(sym(cliqueA ++ cliqueB :+ (4L, 10L)), iters = 3)
    val commA = (1L to 4L).map(lab).toSet
    val commB = (10L to 13L).map(lab).toSet
    assert(commA.size == 1, s"clique A split: $lab")
    assert(commB.size == 1, s"clique B split: $lab")
    assert(commA != commB, s"cliques merged: $lab")
  }

  test("deterministic: same input twice gives identical labels") {
    val edges = {
      val rng = new scala.util.Random(7)
      Seq.fill(60)((rng.nextInt(20).toLong, rng.nextInt(20).toLong))
        .filter { case (a, b) => a != b }
    }
    assert(labels(sym(edges), 3) == labels(sym(edges), 3))
  }

  test("a single vote round adopts the minimum neighbor label on a star") {
    // star center 5, leaves 1..4: after 1 round the center holds the
    // plurality... all leaf labels tie at count 1 → min label 1; each
    // leaf sees only the center → label 5
    val lab = labels(sym(Seq((5L, 1L), (5L, 2L), (5L, 3L), (5L, 4L))), 1)
    assert(lab(5L) == 1L)
    assert((1L to 4L).forall(lab(_) == 5L), s"leaves: $lab")
  }

  test("iters must be positive") {
    intercept[IllegalArgumentException](LabelPropagation.run(sym(Seq((1L, 2L))), 0))
  }

  test("directed (asymmetric) input is rejected by the symmetry guard") {
    import spark.implicits._
    // the contract is load-bearing: votes flow a→b only, so a directed
    // edge list would yield plausible-but-wrong communities and silently
    // drop nodes appearing only in column b — it must fail loudly instead
    val directed = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val e = intercept[IllegalArgumentException](LabelPropagation.run(directed, 1))
    assert(e.getMessage.contains("SYMMETRIC"), e.getMessage)
    // the same edges symmetrized pass the (default-on) guard
    assert(labels(sym(Seq((1L, 2L), (2L, 3L))), 1).keySet == Set(1L, 2L, 3L))
    // and checkSymmetry = false skips the guard (caller-vouched input)
    LabelPropagation.run(directed, 1, checkSymmetry = false).collect()
  }
}
