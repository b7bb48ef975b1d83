package graft.cluster

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — GEOSCAN step 2's
  * clustering primitive (`01_geofraud_clustering.py:16,28,106`).
  *
  * Deliberately NOT GraphX `connectedComponents`: Pregel label propagation
  * needs O(graph diameter) supersteps, and epsilon-graphs over geography are
  * grid-like with huge diameters (a city street network is thousands of
  * cells long) — measured here, 20k points already ran hundreds of rounds
  * and overflowed the task-serialization stack on lineage. This is a
  * Shiloach-Vishkin-style hook + pointer-jump in pure DataFrame ops:
  *
  *   - state: parent pointer per vertex, initialized to min(self, neighbors)
  *   - hook:  parent(u) ← min(parent(u), min over edges of parent(v))
  *   - jump:  parent(u) ← parent(parent(u))   (pointer doubling)
  *
  * Pointer doubling halves tree depth per round → O(log n) rounds regardless
  * of diameter. Each round is two shuffles on the (id, parent) state;
  * `localCheckpoint(eager)` truncates lineage so plans stay O(1) deep. The
  * fixpoint label of every component is its minimum vertex id —
  * deterministic, matching the in-memory `Dbscan` convention. */
object ConnectedComponents {

  /** @param edges two long columns `src`, `dst` (any orientation, dupes ok)
    * @return (id, component) for every vertex appearing in an edge */
  def run(edges: DataFrame, maxIter: Int = 64): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._

    // symmetric neighbor view, self-loops dropped
    val nbrs = edges.select($"src".cast("long"), $"dst".cast("long"))
      .where($"src" =!= $"dst")
      .unionAll(edges.select($"dst".cast("long").as("src"), $"src".cast("long").as("dst")))
      .distinct()
      .localCheckpoint(true)

    // init: parent = min(self, neighbors)
    var state = nbrs.groupBy($"src")
      .agg(min($"dst").as("mn"))
      .select($"src".as("id"), least($"mn", $"src").as("p"))
      .localCheckpoint(true)

    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // hook: pull the smallest parent visible across each edge
      val nbrMin = nbrs
        .join(state.withColumnRenamed("id", "dst").withColumnRenamed("p", "np"), "dst")
        .groupBy($"src".as("id")).agg(min($"np").as("nbrP"))
      val hooked = state.join(nbrMin, Seq("id"), "left_outer")
        .select($"id", least($"p", coalesce($"nbrP", $"p")).as("p"))
      // jump: parent ← parent(parent)
      val parents = hooked.select($"p".as("id2"), $"id".as("child"))
      val jumped = parents
        .join(hooked.select($"id".as("id2"), $"p".as("gp")), "id2")
        .select($"child".as("id"), $"gp".as("p"))
        .localCheckpoint(true)

      val changed = jumped.join(state.withColumnRenamed("p", "oldP"), "id")
        .where($"p" =!= $"oldP").limit(1).count()
      state = jumped
      converged = changed == 0
      iter += 1
    }
    state.toDF("id", "component")
  }
}
