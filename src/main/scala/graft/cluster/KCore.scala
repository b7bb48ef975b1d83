package graft.cluster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition by synchronous peeling over a SYMMETRIC edge
  * list — the graph-density filter web-corpus pipelines run on host/link
  * graphs (spam farms and boilerplate rings live outside the dense
  * core; quality filtering keeps the k-core) and the third member of the
  * repo's deterministic graph family ([[ConnectedComponents]]:
  * reachability, [[LabelPropagation]]: communities, this: density).
  *
  * Made DETERMINISTIC and replayable like [[LabelPropagation]]:
  *   - synchronous rounds — round t+1 removes every node whose degree
  *     RESTRICTED TO round t's survivors is < k (no removal-order
  *     dependence, unlike sequential peeling);
  *   - a FIXED round horizon instead of a convergence test, so the
  *     output is well-defined at any scale and the oracle replays it as
  *     finitely many chained joins. Synchronous peeling removes at least
  *     one node per non-converged round only in the worst chain; in
  *     practice it sheds whole layers — the co-purchase graph converges
  *     in ≤ 6 rounds at every shipped sf (measured) — and when the
  *     horizon reaches the fixpoint the result IS the exact k-core
  *     (spec-pinned against a sequential-peel oracle). A horizon that
  *     does NOT reach the fixpoint is REFUSED by default (one cheap
  *     post-loop probe, `checkConverged`) instead of silently returning
  *     a superset — the VERDICT r10 watch item.
  *
  * Scale shape: each round joins the SHRINKING survivor frame once
  * against the cached pre-partitioned adjacency (only the node frame
  * shuffles, never the edge list — the q133/q221 pattern), counts
  * degree-from-survivors with a map-combinable aggregate, and filters
  * membership with a node-frame join; EVERY round is cut with a LAZY
  * localCheckpoint, which is load-bearing — see the in-body comment. */
object KCore {

  /** @param adj    symmetric adjacency with two long columns `a`, `b`
    *               ((a,b) present iff (b,a) present; rows DISTINCT — a
    *               repeated pair is a multi-edge and double-counts degree)
    * @param k      minimum within-core degree (≥ 1)
    * @param rounds fixed synchronous peel rounds (≥ 1)
    * @param checkSymmetry verify the symmetric contract up front (the
    *               [[LabelPropagation.run]] guard — degrees are counted
    *               from column `a` only, so a directed list silently
    *               under-counts); disable only for constructor-guaranteed
    *               input
    * @param checkConverged run ONE extra degree round after the horizon
    *               and REFUSE loudly if any survivor would still peel —
    *               without it a high-diameter graph (a long pendant
    *               chain) silently returns a strict SUPERSET of the true
    *               k-core at a too-short horizon, the worst failure mode
    *               at 100× scale. Costs one survivor-frame join + a
    *               `limit(1).count()` probe on the already-checkpointed
    *               final round; disable only when the fixed-horizon
    *               superset is the documented intent
    * @return one row per surviving node: `(node, core_degree)` with
    *         `core_degree` the node's degree within the surviving set */
  def run(adj: DataFrame, k: Int, rounds: Int = 12,
          checkSymmetry: Boolean = true,
          checkConverged: Boolean = true): DataFrame = {
    require(k >= 1, s"k-core needs k >= 1, got $k")
    require(rounds >= 1, s"k-core needs rounds >= 1, got $rounds")
    if (checkSymmetry) {
      val missing = adj.select(col("b").as("a"), col("a").as("b"))
        .join(adj, Seq("a", "b"), "left_anti").limit(1).count()
      require(missing == 0L,
        "KCore.run requires a SYMMETRIC adjacency ((a,b) present iff " +
          "(b,a) present) — found a directed edge with no mirror. " +
          "Symmetrize first, or pass checkSymmetry = false only for " +
          "input a symmetrizing constructor already guarantees.")
    }
    // Per-round shape (the LPA vote pattern, made possible by symmetry):
    // deg_S(v) = #edges (u, v) with u ∈ S, so ONE a-side join against the
    // cached hashpartitioning(a) adjacency (only the survivor frame
    // shuffles) + a map-side-combinable groupBy(b) gives every node's
    // degree-from-survivors; v's own membership is then a NODE-frame
    // join, never a second edge-frame shuffle on b.
    //
    // Every round references the previous survivor frame TWICE (degree
    // source + membership filter), so each round's LOGICAL plan must be
    // truncated: left unmaterialized, the tree doubles per round —
    // 2^rounds plan nodes, heap death at ANALYSIS time before a single
    // task runs (measured; persist() does not help, it only substitutes
    // at physical planning under the full logical tree). The checkpoint
    // is EAGER: a lazy mark materialized later deadlocked a round-16
    // full-suite run — the final action's broadcast-exchange thread hit
    // the pending mark and ran RDD.doCheckpoint while the DAG event
    // loop held the RDD's partitions lock (jstack: "Found one
    // Java-level deadlock", RDDCheckpointData$ vs RDD$$anon$1 — the
    // classic lock-order inversion). Eager per-round checkpoints keep
    // every LogicalRDD leaf already materialized by the time any
    // broadcast build collects it; compute is identical (each round ran
    // exactly once either way), the cost is one job submission per
    // round instead of one total — scheduler milliseconds against a
    // timing-dependent hang.
    var cur = adj.select(col("a")).distinct()
    def liveDeg(s: DataFrame, out: String): DataFrame =
      adj.join(s, "a").groupBy(col("b")).agg(count(lit(1)).as(out))
    for (_ <- 1 to rounds) {
      cur = liveDeg(cur, "__d")
        .join(cur.withColumnRenamed("a", "b"), "b")
        .where(col("__d") >= k).select(col("b").as("a"))
        .localCheckpoint(true)
    }
    if (checkConverged) {
      // would round `rounds + 1` still peel anyone? A survivor drops when
      // its degree-from-survivors is < k — INCLUDING degree 0, which the
      // inner liveDeg join would silently omit, hence the left_outer +
      // coalesce. limit(1) short-circuits: one witness is enough.
      val stillPeeling = cur.withColumnRenamed("a", "b")
        .join(liveDeg(cur, "__d"), Seq("b"), "left_outer")
        .where(coalesce(col("__d"), lit(0L)) < k)
        .limit(1).count()
      require(stillPeeling == 0L,
        s"KCore.run: $rounds synchronous rounds did not reach the peel " +
          s"fixpoint — at least one survivor would still drop in round " +
          s"${rounds + 1}, so the result would be a strict SUPERSET of the " +
          "true k-core. Increase `rounds` (a pendant chain of length L " +
          "needs ~L/2 rounds), or pass checkConverged = false if the " +
          "fixed-horizon superset is intended.")
    }
    liveDeg(cur, "core_degree")
      .join(cur.withColumnRenamed("a", "b"), "b")
      .select(col("b").as("node"), col("core_degree"))
  }
}
