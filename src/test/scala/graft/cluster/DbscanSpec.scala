package graft.cluster

import graft.geo.Haversine
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** GEOSCAN-semantics DBSCAN vs an O(n²) brute-force oracle (SURVEY §5.3a). */
class DbscanSpec extends AnyFunSuite {

  /** Brute-force reference: same semantics, no spatial index. */
  private def brute(points: IndexedSeq[(Double, Double)], eps: Double, minPts: Int)
      : IndexedSeq[Option[Int]] = {
    val n = points.length
    val adj = Array.tabulate(n) { i =>
      (0 until n).filter(j => j != i &&
        Haversine.meters(points(i)._1, points(i)._2, points(j)._1, points(j)._2) <= eps)
    }
    val core = Array.tabulate(n)(i => adj(i).length >= minPts)
    val label = Array.fill(n)(-1)
    for (i <- 0 until n if core(i) && label(i) < 0) {
      val q = scala.collection.mutable.Queue(i); label(i) = i
      while (q.nonEmpty) {
        val u = q.dequeue()
        adj(u).foreach(v => if (core(v) && label(v) < 0) { label(v) = i; q += v })
      }
    }
    IndexedSeq.tabulate(n)(k => if (label(k) >= 0) Some(label(k)) else None)
  }

  /** Compare partitions modulo label names. */
  private def samePartition(a: IndexedSeq[Option[Int]], b: IndexedSeq[Option[Int]]): Boolean = {
    if (a.length != b.length) return false
    val mapAB = scala.collection.mutable.HashMap.empty[Int, Int]
    a.indices.forall { i =>
      (a(i), b(i)) match {
        case (None, None) => true
        case (Some(x), Some(y)) => mapAB.getOrElseUpdate(x, y) == y
        case _ => false
      }
    } && {
      // bijectivity: distinct labels map to distinct labels
      mapAB.values.toSeq.distinct.length == mapAB.size
    }
  }

  test("two dense blobs + noise → two clusters, noise unlabeled") {
    val r = new Random(7)
    def blob(lat: Double, lng: Double, n: Int) = IndexedSeq.fill(n)(
      (lat + r.nextGaussian() * 2e-4, lng + r.nextGaussian() * 2e-4))
    val pts = blob(40.70, -74.00, 30) ++ blob(40.75, -73.95, 30) ++
      IndexedSeq((40.72, -73.97), (40.73, -73.99)) // isolated noise
    val labels = Dbscan.cluster(pts, epsilonMeters = 100, minPts = 3)
    val clusters = labels.flatten.distinct
    assert(clusters.length == 2)
    assert(labels(60).isEmpty && labels(61).isEmpty)
  }

  test("matches brute-force DBSCAN on random sets (property, SURVEY §5.3a)") {
    val r = new Random(42)
    (1 to 25).foreach { trial =>
      val n = 20 + r.nextInt(120)
      val pts = IndexedSeq.fill(n)(
        (40.70 + r.nextDouble() * 0.01, -74.00 + r.nextDouble() * 0.01))
      val eps = 30.0 + r.nextDouble() * 120.0
      val minPts = 1 + r.nextInt(5)
      val fast = Dbscan.cluster(pts, eps, minPts)
      val slow = brute(pts, eps, minPts)
      assert(samePartition(fast, slow), s"trial $trial: eps=$eps minPts=$minPts n=$n")
    }
  }

  test("empty and singleton inputs") {
    assert(Dbscan.cluster(IndexedSeq.empty, 100, 3).isEmpty)
    assert(Dbscan.cluster(IndexedSeq((40.7, -74.0)), 100, 3) == IndexedSeq(None))
  }

  test("minPts=0 makes every point core") {
    val pts = IndexedSeq((40.7, -74.0), (41.7, -73.0)) // far apart
    val labels = Dbscan.cluster(pts, 100, 0)
    assert(labels.forall(_.isDefined))
    assert(labels.flatten.distinct.length == 2)
  }
}
