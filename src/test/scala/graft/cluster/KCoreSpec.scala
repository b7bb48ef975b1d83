package graft.cluster

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

class KCoreSpec extends SparkSpec {
  import spark.implicits._

  private def sym(edges: Seq[(Long, Long)]): DataFrame = {
    val e = edges.toDF("a", "b")
    e.unionAll(e.select($"b".as("a"), $"a".as("b")))
  }

  private def core(edges: Seq[(Long, Long)], k: Int,
                   rounds: Int = 12): Map[Long, Long] =
    KCore.run(sym(edges), k, rounds).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Sequential-peel oracle: the textbook k-core (remove ANY node with
    * degree < k until none remain — the result is order-independent). */
  private def bruteCore(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] = {
    val und = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
    var nodes = und.map(_._1).toSet
    var changed = true
    while (changed) {
      val deg = und.filter(e => nodes(e._1) && nodes(e._2))
        .groupBy(_._1).map { case (n, es) => n -> es.size }
      val keep = nodes.filter(n => deg.getOrElse(n, 0) >= k)
      changed = keep != nodes
      nodes = keep
    }
    und.filter(e => nodes(e._1) && nodes(e._2))
      .groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
  }

  test("matches the sequential-peel oracle on random graphs (property)") {
    val rng = new scala.util.Random(17)
    (1 to 8).foreach { trial =>
      val n = 12 + rng.nextInt(10)
      // normalize to one row per undirected edge — the adjacency contract
      // is DISTINCT pairs (a multi-edge would double-count degrees)
      val edges = Seq.fill(30)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      val k = 2 + rng.nextInt(2)
      assert(core(edges, k) == bruteCore(edges, k),
        s"trial $trial (n=$n, k=$k) diverged from the peel oracle")
    }
  }

  test("a triangle with a pendant chain: 2-core is exactly the triangle") {
    // 1-2-3 triangle, chain 3-4-5: peeling 5 then 4 leaves the triangle;
    // synchronous peeling needs TWO rounds (5 first, then 4) — a
    // one-round horizon is non-converged and must now REFUSE, not
    // silently keep 4 (the VERDICT r10 watch item)
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    assert(core(edges, 2) == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    val e = intercept[IllegalArgumentException](core(edges, 2, rounds = 1))
    assert(e.getMessage.contains("fixpoint"), e.getMessage)
    // the documented opt-out returns the fixed-horizon superset
    val superset = KCore.run(sym(edges), 2, rounds = 1, checkConverged = false)
      .collect().map(_.getLong(0)).toSet
    assert(superset == Set(1L, 2L, 3L, 4L), superset)
  }

  test("a long pendant chain past the horizon refuses instead of under-peeling") {
    // triangle 1-2-3 with a 20-node chain hanging off node 3: the 2-core
    // is the triangle, but synchronous peeling eats the chain one tail
    // node per round — a 4-round horizon is far from the fixpoint and
    // would silently report chain nodes as 2-core members
    val chain = (3L until 23L).map(i => (i, i + 1))
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L)) ++ chain
    val e = intercept[IllegalArgumentException](core(edges, 2, rounds = 4))
    assert(e.getMessage.contains("SUPERSET"), e.getMessage)
    // with enough rounds the same graph converges to exactly the triangle
    assert(core(edges, 2, rounds = 25) == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("k above the max degree empties the core; validation fires") {
    assert(core(Seq((1L, 2L), (2L, 3L)), 3).isEmpty)
    intercept[IllegalArgumentException](KCore.run(sym(Seq((1L, 2L))), 0))
    intercept[IllegalArgumentException](KCore.run(sym(Seq((1L, 2L))), 2, rounds = 0))
  }

  test("directed input is rejected by the symmetry guard") {
    val directed = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val e = intercept[IllegalArgumentException](KCore.run(directed, 2))
    assert(e.getMessage.contains("SYMMETRIC"), e.getMessage)
  }
}
