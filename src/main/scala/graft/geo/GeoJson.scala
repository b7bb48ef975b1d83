package graft.geo

/** Hand-rolled RFC 7946 GeoJSON writer for cluster hulls — the reference
  * model's `toGeoJson()` surface (`01_geofraud_clustering.py:32,139-149`):
  * a FeatureCollection of Polygon features, one per cluster. */
object GeoJson {

  private def num(d: Double): String =
    if (d == d.toLong.toDouble) d.toLong.toString else d.toString

  /** GeoJSON positions are [lng, lat]. */
  private def position(lat: Double, lng: Double): String =
    s"[${num(lng)},${num(lat)}]"

  /** Closed Polygon ring from hull vertices ((lat,lng), open). Degenerate
    * hulls (<3 points) are buffered to a tiny square so the output is always
    * a valid Polygon. */
  def polygon(hull: Seq[(Double, Double)]): String = {
    val ring: Seq[(Double, Double)] =
      if (hull.length >= 3) hull :+ hull.head
      else {
        val eps = 1e-7
        val (lat, lng) = hull.headOption.getOrElse((0.0, 0.0))
        val (lat2, lng2) = if (hull.length == 2) hull(1) else (lat, lng)
        val (lo, hi) = (math.min(lat, lat2) - eps, math.max(lat, lat2) + eps)
        val (lo2, hi2) = (math.min(lng, lng2) - eps, math.max(lng, lng2) + eps)
        Seq((lo, lo2), (lo, hi2), (hi, hi2), (hi, lo2), (lo, lo2))
      }
    val coords = ring.map { case (la, ln) => position(la, ln) }.mkString(",")
    s"""{"type":"Polygon","coordinates":[[$coords]]}"""
  }

  /** One Feature per cluster, `cluster` label in properties. */
  def feature(cluster: String, hull: Seq[(Double, Double)]): String =
    s"""{"type":"Feature","properties":{"cluster":"${escape(cluster)}"},"geometry":${polygon(hull)}}"""

  /** FeatureCollection over (clusterLabel, hull) pairs — the model's
    * serialized geometry (`01_geofraud_clustering.py:139`). */
  def featureCollection(clusters: Seq[(String, Seq[(Double, Double)])]): String = {
    val fs = clusters.map { case (c, h) => feature(c, h) }.mkString(",")
    s"""{"type":"FeatureCollection","features":[$fs]}"""
  }

  private def escape(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }
}
