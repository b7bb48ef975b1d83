package graft.cluster

import graft.geo.{GeoCell, Haversine}

/** In-memory GEOSCAN clustering for one group of points — the per-key worker
  * of the personalized path (`01_geofraud_clustering.py:275-283`: one model
  * per user, "pseudo-distributed"), also the brute-force oracle for the
  * distributed variant's property tests.
  *
  * Semantics follow the reference's algorithm exactly
  * (`01_geofraud_clustering.py:16-32`):
  *   - edge between two points iff haversine ≤ epsilon meters;
  *   - drop vertices with degree < minPts ("we remove vertices with fewer
  *     than minPts connections");
  *   - clusters = connected components of the remaining (core) vertices.
  * Non-core points are noise (cluster = None — the reference's nullable
  * `cluster`, `01_geofraud_clustering.py:233`).
  *
  * Neighbor search is grid-bucketed (same trick as the distributed path) so
  * a group of n points costs O(n·k), not O(n²).
  */
object Dbscan {

  /** @return cluster label per input index: Some(label) for core points,
    *         None for noise. Labels are the minimum member index of the
    *         component — deterministic for a fixed input order. */
  def cluster(
      points: IndexedSeq[(Double, Double)],
      epsilonMeters: Double,
      minPts: Int): IndexedSeq[Option[Int]] = {
    val n = points.length
    if (n == 0) return IndexedSeq.empty

    val res = GeoCell.resolutionForEpsilon(epsilonMeters)
    // bucket points by cell; candidate neighbors come from the 1-ring
    val byCell = scala.collection.mutable.HashMap.empty[String, scala.collection.mutable.ArrayBuffer[Int]]
    points.zipWithIndex.foreach { case ((lat, lng), idx) =>
      byCell.getOrElseUpdate(GeoCell.cellId(lat, lng, res), scala.collection.mutable.ArrayBuffer.empty) += idx
    }

    val neighbors = Array.fill(n)(scala.collection.mutable.ArrayBuffer.empty[Int])
    points.zipWithIndex.foreach { case ((lat, lng), idx) =>
      val seen = scala.collection.mutable.HashSet.empty[Int]
      GeoCell.coverDisc(lat, lng, epsilonMeters, res).foreach { c =>
        byCell.get(c).foreach(_.foreach { other =>
          if (other != idx && seen.add(other)) {
            val (la, ln) = points(other)
            if (Haversine.meters(lat, lng, la, ln) <= epsilonMeters) neighbors(idx) += other
          }
        })
      }
    }

    // core = degree >= minPts (degree counts epsilon-neighbors, i.e. graph
    // edges, reference `01_geofraud_clustering.py:28`)
    val core = Array.tabulate(n)(i => neighbors(i).length >= minPts)

    // connected components over core vertices only
    val label = Array.fill(n)(-1)
    var i = 0
    while (i < n) {
      if (core(i) && label(i) < 0) {
        // BFS; component label = min index = first discovered from ascending scan
        val queue = scala.collection.mutable.Queue(i)
        label(i) = i
        while (queue.nonEmpty) {
          val u = queue.dequeue()
          neighbors(u).foreach { v =>
            if (core(v) && label(v) < 0) { label(v) = i; queue += v }
          }
        }
      }
      i += 1
    }
    IndexedSeq.tabulate(n)(k => if (label(k) >= 0) Some(label(k)) else None)
  }
}
