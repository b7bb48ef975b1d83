package graft.geo

/** Convex hull of cluster core points — GEOSCAN step 3
  * (`01_geofraud_clustering.py:32`: "convex hull … in memory for each
  * cluster"). Andrew's monotone chain, O(n log n), on (lng, lat) = (x, y). */
object ConvexHull {

  /** Hull vertices in counter-clockwise order, first vertex NOT repeated.
    * Degenerate inputs (n < 3 or collinear) return the distinct points
    * sorted — callers (GeoJson) handle ring closure / buffering. */
  def hull(points: Seq[(Double, Double)]): Seq[(Double, Double)] = {
    val pts = points.distinct.sortBy { case (lat, lng) => (lng, lat) }
    if (pts.length <= 2) return pts

    // cross product of (o→a) × (o→b) in (x=lng, y=lat) plane
    def cross(o: (Double, Double), a: (Double, Double), b: (Double, Double)): Double =
      (a._2 - o._2) * (b._1 - o._1) - (a._1 - o._1) * (b._2 - o._2)

    val lower = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    for (p <- pts) {
      while (lower.length >= 2 && cross(lower(lower.length - 2), lower.last, p) <= 0)
        lower.remove(lower.length - 1)
      lower += p
    }
    val upper = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    for (p <- pts.reverse) {
      while (upper.length >= 2 && cross(upper(upper.length - 2), upper.last, p) <= 0)
        upper.remove(upper.length - 1)
      upper += p
    }
    val h = (lower.dropRight(1) ++ upper.dropRight(1)).toSeq
    if (h.length >= 3) h else pts
  }

  /** Cross product of (a→b) × (a→p) in the (x=lng, y=lat) plane — zero
    * iff p is collinear with a–b (same formula as hull's local cross). */
  private def cross3(a: (Double, Double), b: (Double, Double),
                     p: (Double, Double)): Double =
    (b._2 - a._2) * (p._1 - a._1) - (b._1 - a._1) * (p._2 - a._2)

  /** True if p lies ON the closed segment a–b (exact planar test:
    * collinear AND within the bounding box). */
  private def onSegment(a: (Double, Double), b: (Double, Double),
                        lat: Double, lng: Double): Boolean =
    cross3(a, b, (lat, lng)) == 0.0 &&
      lat >= math.min(a._1, b._1) && lat <= math.max(a._1, b._1) &&
      lng >= math.min(a._2, b._2) && lng <= math.max(a._2, b._2)

  /** True if (lat, lng) is inside or on the hull (planar test). Degenerate
    * hulls (2 points, or ≥3 collinear points — `hull` returns the sorted
    * point set then) are SEGMENTS: "on the hull" means on any consecutive
    * segment, not only at a vertex. */
  def contains(hullPts: Seq[(Double, Double)], lat: Double, lng: Double): Boolean = {
    if (hullPts.isEmpty) return false
    if (hullPts.length == 1)
      return hullPts.head == ((lat, lng))
    val closed = hullPts :+ hullPts.head
    val onBoundary = closed.sliding(2).exists {
      case Seq(a, b) => onSegment(a, b, lat, lng)
      case _ => false
    }
    onBoundary ||
      (hullPts.length >= 3 && GeoCell.pointInPolygon(lat, lng, hullPts))
  }
}
