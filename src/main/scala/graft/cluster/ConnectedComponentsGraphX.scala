package graft.cluster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** GraphX twin of [[ConnectedComponents.run]] — the literal
  * `org.apache.spark.graphx.Graph.connectedComponents()` API the reference
  * stack uses for GEOSCAN step 2 (`01_geofraud_clustering.py:16`; GraphX
  * labels every vertex with the MINIMUM vertex id of its component, the
  * same contract as the star-contraction implementation).
  *
  * WHEN TO USE WHICH: GraphX CC is Pregel label propagation — O(diameter)
  * supersteps — and did not finish on the grid-like epsilon graph at sf0.1
  * (see [[ConnectedComponents]]' scaladoc); it stays the right tool for
  * SMALL or low-diameter graphs (the minhash candidate graph here is a
  * few hundred edges of short chains). The star-contraction operator is
  * the 100 TB path; this twin exists for API parity and as an independent
  * cross-check (spec-pinned equal on random graphs). */
object ConnectedComponentsGraphX {

  /** @param edges two long columns `src`, `dst` (any orientation, dupes ok)
    * @return (id, component) for every vertex appearing in an edge */
  def run(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val tuples = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .as[(Long, Long)].rdd
    org.apache.spark.graphx.Graph.fromEdgeTuples(tuples, defaultValue = 0)
      .connectedComponents()
      .vertices
      .map { case (id, comp) => (id, comp.toLong) }
      .toDF("id", "component")
  }
}
