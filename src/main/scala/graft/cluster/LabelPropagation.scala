package graft.cluster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label propagation (Raghavan et al., "Near linear time
  * algorithm to detect community structures in large-scale networks") over
  * a SYMMETRIC edge list — the community-detection complement to
  * [[ConnectedComponents]] (which answers reachability, not density:
  * the reference's fraud stack groups tiles by connectivity,
  * `01_geofraud_clustering.py:16,28,106`; LPA splits a connected
  * component into its dense sub-communities).
  *
  * Made DETERMINISTIC (vanilla LPA is famously run-order dependent) so the
  * result replays bit-for-bit in any engine:
  *   - synchronous updates (iteration t+1 reads only iteration t's labels,
  *     never a mix — no update-order dependence);
  *   - initial label = the node's own id;
  *   - vote = plurality of NEIGHBOR labels (self excluded), ties broken by
  *     the MINIMUM label (argmax count, then min — a total order);
  *   - a FIXED iteration count instead of a convergence test (synchronous
  *     LPA can 2-cycle on bipartite-ish graphs; a fixed horizon keeps the
  *     output well-defined and the oracle replayable as finitely many
  *     chained joins).
  *
  * Scale shape: each iteration is ONE equi-join of the (cached,
  * pre-partitioned) adjacency against the current label frame on the
  * adjacency's partitioning key, followed by two hash aggregations —
  * `(node, lab) → cnt` then the per-node argmax as a `min(struct(-cnt,
  * lab))` shuffle aggregate (map-side combinable; no window over the vote
  * stream, which would sort). Because the adjacency is symmetric, the
  * label frame joins on the SAME side/key every round, so a
  * `repartition(a)`-cached edge list is never reshuffled — only the small
  * label frame moves (the q133 pagerank pattern).
  */
object LabelPropagation {

  /** @param adj   symmetric adjacency with two long columns `a`, `b`
    *              ((a,b) present iff (b,a) present; no self-loops needed)
    * @param iters fixed synchronous rounds (≥ 1)
    * @param checkSymmetry verify the symmetric-adjacency contract up front
    *              (one anti-join of the mirrored edges against `adj`,
    *              short-circuited at the first violation). The contract is
    *              LOAD-BEARING — nodes are read from column `a` and votes
    *              flow a→b only, so a directed edge list would silently
    *              produce plausible-but-wrong communities and drop b-only
    *              nodes. Default on; pass false only when the adjacency
    *              comes from a symmetrizing constructor in the same
    *              pipeline (e.g. the cached co-purchase frame) and the
    *              extra pass per call is not worth re-proving it.
    * @return      one row per node that has at least one edge:
    *              `(node, lab)` — `lab` is the community label */
  def run(adj: DataFrame, iters: Int, checkSymmetry: Boolean = true): DataFrame = {
    require(iters >= 1, s"label propagation needs iters >= 1, got $iters")
    if (checkSymmetry) {
      val missing = adj.select(col("b").as("a"), col("a").as("b"))
        .join(adj, Seq("a", "b"), "left_anti").limit(1).count()
      require(missing == 0L,
        "LabelPropagation.run requires a SYMMETRIC adjacency ((a,b) " +
          "present iff (b,a) present) — found a directed edge with no " +
          "mirror. Symmetrize first (union the swapped frame and " +
          "distinct), or pass checkSymmetry = false only for input a " +
          "symmetrizing constructor already guarantees.")
    }
    val nodes = adj.select(col("a")).distinct()
    var lab = nodes.select(col("a").as("node"), col("a").as("lab"))
    for (_ <- 1 to iters) {
      // symmetric adjacency: votes FOR b BY label(a) ≡ votes for each node
      // by its neighbors' labels, and the join key stays `a` every round
      val votes = adj.join(lab.withColumnRenamed("node", "a"), "a")
        .select(col("b").as("node"), col("lab"))
      val counts = votes.groupBy(col("node"), col("lab"))
        .agg(count(lit(1)).as("cnt"))
      lab = counts.groupBy(col("node"))
        .agg(min(struct((-col("cnt")).as("nc"), col("lab").as("lb"))).as("m"))
        .select(col("node"), col("m.lb").as("lab"))
    }
    lab
  }
}
