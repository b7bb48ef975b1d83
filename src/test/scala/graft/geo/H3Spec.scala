package graft.geo

import org.scalatest.funsuite.AnyFunSuite

/** Real H3 point→cell: published test vectors reproduced EXACTLY, plus
  * the global structural laws only a correct icosahedral table set can
  * satisfy. No network, no h3 library — the vectors below are the
  * public documentation examples of the h3 project (v3 `geo_to_h3`). */
class H3Spec extends AnyFunSuite {

  test("published vectors reproduce exactly (two icosahedron faces, res 5-10)") {
    // h3 quickstart: Bay Area point at res 5 and 7
    assert(H3.toH3String(H3.geoToH3(37.3615593, -122.0553238, 5)) ==
      "85283473fffffff")
    assert(H3.toH3String(H3.geoToH3(37.3615593, -122.0553238, 7)) ==
      "87283472bffffff")
    // h3-py docs: San Francisco at res 9
    assert(H3.toH3String(H3.geoToH3(37.7752702151959257, -122.418307270836230, 9)) ==
      "8928308280fffff")
    // h3 index-inspection docs: Statue of Liberty at res 10
    assert(H3.toH3String(H3.geoToH3(40.689167, -74.044444, 10)) ==
      "8a2a1072b59ffff")
  }

  test("the reference's to_h3 surface: uppercase ids, string round-trip") {
    val s = H3.geoToH3String(37.7752702151959257, -122.418307270836230, 9)
    assert(s == "8928308280FFFFF")
    assert(H3.fromString(s) == H3.geoToH3(37.7752702151959257, -122.418307270836230, 9))
  }

  /** Deterministic quasi-even sphere sweep (Fibonacci lattice). */
  private def sweep(n: Int): Iterator[(Double, Double)] = {
    val ga = math.Pi * (3.0 - math.sqrt(5.0))
    (0 until n).iterator.map { i =>
      val z = 1.0 - (2.0 * i + 1.0) / n
      val lat = math.toDegrees(math.asin(z))
      val lng = math.toDegrees(((i * ga) % (2 * math.Pi)) - math.Pi)
      (lat, lng)
    }
  }

  test("global law: a sphere sweep reaches ALL 122 base cells, no more") {
    val seen = sweep(60000).map { case (la, lo) =>
      H3.baseCell(H3.geoToH3(la, lo, 0)) }.toSet
    assert(seen == (0 until 122).toSet,
      s"missing: ${(0 until 122).toSet -- seen}; extra: ${seen -- (0 until 122).toSet}")
  }

  test("global law: exactly 842 distinct res-1 cells (110*7 + 12*6)") {
    val cells = sweep(400000).map { case (la, lo) =>
      H3.geoToH3(la, lo, 1) }.toSet
    assert(cells.size == 842, s"got ${cells.size}")
    // every id carries res 1, a valid base cell, and no digit 7 in use
    assert(cells.forall(h => H3.resolution(h) == 1 &&
      H3.baseCell(h) < 122 && H3.digit(h, 1) != 7))
    // pentagon children: center digit only under the deleted-K rule —
    // exactly 12 pentagons at res 1 (digit 0 in a pentagon base cell)
    assert(cells.count(H3.isPentagon) == 12)
  }

  test("global law: no pentagon-cell index ever leads with the deleted K digit") {
    val bad = sweep(50000).map { case (la, lo) => H3.geoToH3(la, lo, 9) }
      .filter(h => H3.Pentagons.contains(H3.baseCell(h)))
      .filter { h =>
        (1 to 9).find(r => H3.digit(h, r) != 0).exists(r => H3.digit(h, r) == 1)
      }.toSeq
    assert(bad.isEmpty, s"${bad.size} K-leading pentagon indexes")
  }

  test("resolution monotonicity: finer cells refine, parent truncation is stable") {
    // the aperture-7 grid does not nest geometrically, but digit
    // truncation is the exact parent rule — parent(geo res 9 -> 7)
    // agrees with the direct res-7 assignment for interior points
    val pts = Seq((37.7752702151959257, -122.418307270836230),
      (40.689167, -74.044444), (51.5007, -0.1246), (-33.8568, 151.2153))
    pts.foreach { case (la, lo) =>
      val h9 = H3.geoToH3(la, lo, 9)
      val h7 = H3.geoToH3(la, lo, 7)
      assert(H3.parent(h9, 7) == h7, s"($la, $lo)")
      assert(H3.resolution(H3.parent(h9, 7)) == 7)
    }
  }

  test("round-trip law: geoToH3(h3ToGeo(h)) == h — every parity, overage and pentagon subsequence") {
    // deterministic sweep (Fibonacci lattice) across resolutions; the
    // inverse walks every code path the forward does: home charts,
    // face overage, the pentagon leading-4 wedge and leading-5 rotate
    var n = 0
    for (res <- Seq(0, 1, 2, 3, 4, 5, 9, 10); (la, lo) <- sweep(4000)) {
      val h = H3.geoToH3(la, lo, res)
      val (cla, clo) = H3.h3ToGeo(h)
      assert(H3.geoToH3(cla, clo, res) == h,
        s"round trip broke at ($la, $lo) res $res: ${H3.toH3String(h)}")
      n += 1
    }
    assert(n == 32000)
  }

  test("h3ToGeo centers of the published-vector cells re-index to themselves") {
    for (s <- Seq("85283473fffffff", "87283472bffffff", "8928308280fffff",
                  "8a2a1072b59ffff")) {
      val h = H3.fromString(s)
      val (la, lo) = H3.h3ToGeo(h)
      assert(H3.geoToH3(la, lo, H3.resolution(h)) == h, s)
    }
  }

  test("published polyfill vector: the h3 test-suite SF polygon holds 1253 res-9 cells") {
    // upstream h3's own test fixture (test suite sfGeoPolygon, radians)
    // and its pinned result: polyfill(sfGeoPolygon, 9) == 1253 cells
    // under v3 center containment. Our polygonCells additionally FORCES
    // the vertex cells into the cover (the tile-cover guarantee q285
    // leg a pins), so the published set is exactly the center-contained
    // subset of our layer-0 output.
    val sfVertsRad = Seq(
      (0.659966917655, -2.1364398519396),
      (0.6595011102219, -2.1359434279405),
      (0.6583348114025, -2.1354884206045),
      (0.6581220034068, -2.1382437718946),
      (0.6594479998527, -2.1384597563896),
      (0.6599990002976, -2.1376771158464))
    val verts = sfVertsRad.map { case (la, lo) =>
      (math.toDegrees(la), math.toDegrees(lo)) }
    val cover = H3.polygonCells(verts, 9, 0).map(H3.fromString)
    val centerIn = cover.filter { h =>
      val (cla, clo) = H3.h3ToGeo(h)
      GeoCell.pointInPolygon(cla, clo, verts)
    }
    assert(centerIn.size == 1253, s"center-contained: ${centerIn.size}")
    // the forced-vertex remainder is small (≤ one cell per vertex) and
    // every one of them is a vertex's own cell
    val extra = cover.toSet -- centerIn.toSet
    val vertCells = verts.map { case (la, lo) => H3.geoToH3(la, lo, 9) }.toSet
    assert(extra.subsetOf(vertCells), s"unexpected extras: $extra")
    // the published SF point's cell is in the cover
    assert(cover.contains(H3.fromString("8928308280fffff")))
  }

  test("published kRing vector: the h3-py docs ring around 8928308280fffff") {
    val got = H3.kRing(H3.fromString("8928308280fffff"), 1)
      .map(H3.toH3String)
    val published = Set("8928308280fffff", "8928308280bffff",
      "89283082807ffff", "89283082877ffff", "8928308283bffff",
      "89283082873ffff", "89283082803ffff")
    assert(got == published, s"got $got")
  }

  /** Base cells touching a pentagon — the documented distortion seam. */
  private lazy val seamBcs: Set[Int] = H3.Pentagons.flatMap { p =>
    val pentRes0 = (1L << 59) | (p.toLong << 45) | ((1L << 45) - 1)
    H3.neighbors(pentRes0).map(H3.baseCell) + p
  }

  test("neighbors: count law (6 per hexagon, 5 per pentagon), symmetry off-seam") {
    var hexCount = 0
    for ((la, lo) <- sweep(3000)) {
      val h = H3.geoToH3(la, lo, 4)
      val nbs = H3.neighbors(h)
      if (H3.isPentagon(h)) assert(nbs.size == 5, H3.toH3String(h))
      else assert(nbs.size == 6, H3.toH3String(h))
      // symmetry away from the pentagon seams (the caveat documented on
      // neighbors(): chart gluing there is chart-relative)
      if (!seamBcs.contains(H3.baseCell(h)) &&
          nbs.forall(n => !seamBcs.contains(H3.baseCell(n)))) {
        nbs.foreach(n => assert(H3.neighbors(n).contains(h)))
        hexCount += 1
      }
    }
    assert(hexCount > 1000)
  }

  test("neighbors match geometric adjacency away from pentagon seams") {
    // geometric ground truth from the verified forward projection: a
    // dense local grid around the cell; adjacent grid samples in
    // different cells witness a shared edge
    def geomNeighbors(h: Long, lat0: Double, lng0: Double, res: Int): Set[Long] = {
      val edge = 22.6 / 111.0 // res-4 edge, degrees
      val n = 70
      val step = 2.6 * edge / n
      val cos = math.max(0.2, math.cos(math.toRadians(lat0)))
      val grid = Array.tabulate(2 * n + 1, 2 * n + 1) { (a, b) =>
        H3.geoToH3(lat0 + (a - n) * step,
          ((lng0 + (b - n) * step / cos + 180) % 360 + 360) % 360 - 180, res)
      }
      val out = scala.collection.mutable.Set.empty[Long]
      for (a <- 0 until 2 * n; b <- 0 until 2 * n if grid(a)(b) == h) {
        if (grid(a + 1)(b) != h) out += grid(a + 1)(b)
        if (grid(a)(b + 1) != h) out += grid(a)(b + 1)
        if (a > 0 && grid(a - 1)(b) != h) out += grid(a - 1)(b)
        if (b > 0 && grid(a)(b - 1) != h) out += grid(a)(b - 1)
      }
      out.toSet
    }
    var checked = 0
    for ((la, lo) <- sweep(60).filter { case (l, _) => math.abs(l) < 70 }) {
      val h = H3.geoToH3(la, lo, 4)
      val nbs = H3.neighbors(h)
      if (!seamBcs.contains(H3.baseCell(h)) &&
          nbs.forall(n => !seamBcs.contains(H3.baseCell(n)))) {
        assert(geomNeighbors(h, la, lo, 4) == nbs, H3.toH3String(h))
        checked += 1
      }
    }
    assert(checked > 25)
  }

  test("kRing: sizes follow 1 + 3k(k+1) off-pentagon; ring-1 of the SF vector cell") {
    val h = H3.geoToH3(37.7752702151959257, -122.418307270836230, 9)
    assert(H3.kRing(h, 0) == Set(h))
    val k1 = H3.kRing(h, 1)
    assert(k1.size == 7 && k1.contains(h))
    assert(H3.kRing(h, 2).size == 19)
    assert(H3.kRing(h, 3).size == 37)
    // every ring-1 member is mutual
    (k1 - h).foreach(n => assert(H3.neighbors(n).contains(h)))
  }

  test("distinct-count sanity at the reference's resolutions (9-11)") {
    // res-10 hexes average ~0.0150 km²; the 0.02°×0.02° box at 37.8°N is
    // ~3.9 km² → ~260 cells by the area law. Require the right decade.
    val ids = (for { i <- 0 until 40; j <- 0 until 40 } yield
      H3.geoToH3(37.77 + i * 5e-4, -122.41 + j * 5e-4, 10)).toSet
    assert(ids.size > 200 && ids.size < 330, s"got ${ids.size}")
    assert(ids.forall(h => H3.resolution(h) == 10))
  }

  // -------------------------------------------------------------------
  // Boundary (h3ToGeoBoundary) and polygon fill (polygonCells)
  // -------------------------------------------------------------------

  /** Planar ray-cast is only valid when the ring doesn't wrap — skip the
    * handful of sweep cells straddling the antimeridian or near a pole. */
  private def planarOk(b: Seq[(Double, Double)]): Boolean =
    b.forall(v => math.abs(v._1) < 80) &&
      (b.map(_._2).max - b.map(_._2).min) < 180

  test("boundary law: 6 verts per hex (5 per pentagon), center inside, both parities") {
    for (res <- Seq(3, 4); (la, lo) <- sweep(500)) {
      val h = H3.geoToH3(la, lo, res)
      val b = H3.h3ToGeoBoundary(h)
      assert(b.size == (if (H3.isPentagon(h)) 5 else 6), H3.toH3String(h))
      assert(b.distinct.size == b.size, s"degenerate verts ${H3.toH3String(h)}")
      if (planarOk(b)) {
        val c = H3.h3ToGeo(h)
        assert(GeoCell.pointInPolygon(c._1, c._2, b),
          s"center outside own boundary ${H3.toH3String(h)}")
      }
    }
  }

  test("boundary law: every neighbor shares EXACTLY two vertices (off-seam)") {
    def close(a: (Double, Double), d: (Double, Double)) =
      math.abs(a._1 - d._1) < 1e-7 &&
        (math.abs(a._2 - d._2) < 1e-7 || math.abs(a._2 - d._2) > 359.9)
    var checked = 0
    for (res <- Seq(3, 4); (la, lo) <- sweep(300)) {
      val h = H3.geoToH3(la, lo, res)
      val nbs = H3.neighbors(h)
      if (!seamBcs.contains(H3.baseCell(h)) &&
          nbs.forall(n => !seamBcs.contains(H3.baseCell(n)))) {
        val b = H3.h3ToGeoBoundary(h)
        nbs.foreach { n =>
          val bn = H3.h3ToGeoBoundary(n)
          val shared = b.count(v => bn.exists(close(v, _)))
          assert(shared == 2,
            s"${H3.toH3String(h)} nbr ${H3.toH3String(n)}: $shared shared verts")
        }
        checked += 1
      }
    }
    assert(checked > 150)
  }

  test("boundary law: all 12 res-0 pentagons have 5 distinct verts ringing the center") {
    for (bc <- H3.Pentagons) {
      val p = (1L << 59) | (bc.toLong << 45) | ((1L << 45) - 1)
      val b = H3.h3ToGeoBoundary(p)
      assert(b.size == 5 && b.distinct.size == 5, s"base cell $bc")
      // every vertex sits within one res-0 circumradius (~1300 km) of the
      // center — no vertex escaped to a wrong chart
      val c = H3.h3ToGeo(p)
      b.foreach { v =>
        val d = Haversine.meters(c._1, c._2, v._1, v._2)
        assert(d > 100000 && d < 1600000, s"base cell $bc vert at $d m")
      }
    }
  }

  test("boundary sanity: res-9 edge lengths sit in the published band") {
    val b = H3.h3ToGeoBoundary(
      H3.geoToH3(37.7752702151959257, -122.418307270836230, 9))
    val edges = (b :+ b.head).sliding(2).map { s =>
      Haversine.meters(s(0)._1, s(0)._2, s(1)._1, s(1)._2) }.toSeq
    // res-9 average edge ≈ 200 m (hex area 0.1053 km²); distortion band
    edges.foreach(e => assert(e > 150 && e < 260, s"edge $e m"))
  }

  test("polyfill law: center-inside ⇒ in fill; fill ⊆ center-inside ∪ vertex cells") {
    val poly = Seq((37.77, -122.43), (37.79, -122.43),
      (37.79, -122.40), (37.77, -122.40))
    val fill = H3.polygonCells(poly, 9, 0).toSet
    // candidate cells: a fine lattice over the bbox reaches every cell
    val cand = (for { i <- 0 until 300; j <- 0 until 300 } yield
      H3.geoToH3(37.765 + 0.03 * i / 299.0, -122.435 + 0.04 * j / 299.0, 9)).toSet
    val centerIn = cand.filter { h =>
      val c = H3.h3ToGeo(h); GeoCell.pointInPolygon(c._1, c._2, poly) }
      .map(h => H3.toH3String(h).toUpperCase(java.util.Locale.ROOT))
    assert((centerIn -- fill).isEmpty, s"missing ${(centerIn -- fill).size}")
    val vertexCells = poly.map(p => H3.geoToH3String(p._1, p._2, 9)).toSet
    assert((fill -- centerIn -- vertexCells).isEmpty,
      s"extras ${(fill -- centerIn -- vertexCells).size}")
    assert(vertexCells.subsetOf(fill), "fill must cover the polygon's own vertices")
  }

  test("polyfill law: a wide-latitude-span polygon is fully covered") {
    // cells at 65°N are ~2.4× wider in degrees-lng than at the equator —
    // the bbox margin must be measured at the WIDEST (highest-|lat|)
    // vertex cell or the BFS under-covers exactly this shape
    val poly = Seq((0.0, 10.0), (65.0, 10.0), (65.0, 18.0), (0.0, 18.0))
    val fill = H3.polygonCells(poly, 3, 0).toSet
    val cand = (for { i <- 0 until 700; j <- 0 until 120 } yield
      H3.geoToH3(-1.0 + 67.0 * i / 699.0, 9.0 + 10.0 * j / 119.0, 3)).toSet
    val centerIn = cand.filter { h =>
      val c = H3.h3ToGeo(h); GeoCell.pointInPolygon(c._1, c._2, poly) }
      .map(h => H3.toH3String(h).toUpperCase(java.util.Locale.ROOT))
    assert((centerIn -- fill).isEmpty,
      s"under-covered: ${(centerIn -- fill).size} of ${centerIn.size}")
    val vertexCells = poly.map(p => H3.geoToH3String(p._1, p._2, 3)).toSet
    assert((fill -- centerIn -- vertexCells).isEmpty)
  }

  test("polyfill law: layer monotonicity and the kRing growth bound") {
    val poly = Seq((37.77, -122.43), (37.79, -122.43),
      (37.79, -122.40), (37.77, -122.40))
    val f0 = H3.polygonCells(poly, 9, 0).toSet
    val f1 = H3.polygonCells(poly, 9, 1).toSet
    val f2 = H3.polygonCells(poly, 9, 2).toSet
    assert(f0.subsetOf(f1) && f1.subsetOf(f2))
    assert(f0.size < f1.size && f1.size < f2.size)
    // layer 1 is exactly the union of 1-rings of layer 0
    val ring1 = f0.flatMap(s => H3.kRing(H3.fromString(s), 1))
      .map(h => H3.toH3String(h).toUpperCase(java.util.Locale.ROOT))
    assert(f1 == ring1)
  }

  test("pentagon-seam neighbors: symmetric, counted, geometrically witnessed") {
    def close(a: (Double, Double), d: (Double, Double)) =
      math.abs(a._1 - d._1) < 1e-7 &&
        (math.abs(a._2 - d._2) < 1e-7 || math.abs(a._2 - d._2) > 359.9)
    for (res <- Seq(1, 2, 3, 6); bc <- H3.Pentagons) {
      // the pentagon cell at `res` under base cell `bc` (all digits 0)
      var pent = (1L << 59) | (res.toLong << 52) | (bc.toLong << 45) |
        ((1L << 45) - 1)
      for (r <- 1 to res) pent &= ~(7L << ((15 - r) * 3))
      assert(H3.isPentagon(pent))
      // the pentagon AND its entire 1-ring: exact counts, symmetry, and
      // a shared-edge witness (≥2 shared boundary vertices) per neighbor
      for (h <- H3.kRing(pent, 1)) {
        val nbs = H3.neighbors(h)
        assert(nbs.size == (if (H3.isPentagon(h)) 5 else 6),
          s"res $res bc $bc cell ${H3.toH3String(h)}: ${nbs.size}")
        val b = H3.h3ToGeoBoundary(h)
        nbs.foreach { n =>
          assert(H3.neighbors(n).contains(h),
            s"asymmetric: ${H3.toH3String(h)} -> ${H3.toH3String(n)}")
          val bn = H3.h3ToGeoBoundary(n)
          assert(b.count(v => bn.exists(close(v, _))) >= 2,
            s"no shared edge: ${H3.toH3String(h)} ~ ${H3.toH3String(n)}")
        }
      }
    }
  }

  test("pentagon rings at res 9/10: hierarchical consistency with the EXACT res-6 rings") {
    // No published res-9/10 pentagon-ring vector exists (the r18 search
    // came up honestly empty), so pin those rings WITHOUT inventing data:
    // truncation to res 6 — where boundary-derived adjacency is proven
    // EXACT (the seam law above runs res ≤ 6 with a shared-edge witness)
    // — must map every deep ring member into the res-6 ring's closure.
    // A wrong neighbor at res 9/10 would either break the 5k pentagon
    // ring-count law, the mutual-symmetry law, or escape the proven
    // res-6 1-ring under truncation.
    def pentAt(bc: Int, res: Int): Long = {
      var pent = (1L << 59) | (res.toLong << 52) | (bc.toLong << 45) |
        ((1L << 45) - 1)
      for (r <- 1 to res) pent &= ~(7L << ((15 - r) * 3))
      pent
    }
    def leadDigit(h: Long): Int =
      (1 to H3.resolution(h)).map(H3.digit(h, _)).find(_ != 0).getOrElse(0)
    for (res <- Seq(9, 10); bc <- H3.Pentagons) {
      val p = pentAt(bc, res)
      assert(H3.isPentagon(p), s"res $res bc $bc: center chain not a pentagon")
      // pentagon ring sizes are 5k (5 neighbors, not 6):
      // |kRing(p, k)| = 1 + 5·k(k+1)/2 → 6 at k=1, 16 at k=2
      val k1 = H3.kRing(p, 1)
      val k2 = H3.kRing(p, 2)
      assert(k1.size == 6, s"res $res bc $bc: |kRing1| = ${k1.size}")
      assert(k2.size == 16, s"res $res bc $bc: |kRing2| = ${k2.size}")
      // mutual symmetry + hexagon counts on the ring; deleted-K law for
      // members that stay in the pentagon base cell
      for (h <- k1 - p) {
        assert(!H3.isPentagon(h), "two pentagons in one base cell / res")
        assert(H3.neighbors(h).size == 6, s"${H3.toH3String(h)} not 6-regular")
        assert(H3.neighbors(h).contains(p),
          s"asymmetric: ${H3.toH3String(p)} -> ${H3.toH3String(h)}")
      }
      for (h <- k2 if H3.baseCell(h) == bc)
        assert(leadDigit(h) != 1,
          s"deleted-K digit leads ${H3.toH3String(h)}")
      // hierarchical law: the deep pentagon is the center-child chain of
      // the res-6 pentagon, so its 2-disc truncates INTO the res-6
      // pentagon's own 1-ring closure (exact adjacency territory)
      val p6 = H3.parent(p, 6)
      assert(p6 == pentAt(bc, 6), "center chain must truncate to the res-6 pentagon")
      val ring6 = H3.kRing(p6, 1)
      val anc = k2.map(H3.parent(_, 6))
      assert(anc.subsetOf(ring6),
        s"res $res bc $bc: ancestors ${anc.map(H3.toH3String)} escape the " +
          s"res-6 ring ${ring6.map(H3.toH3String)}")
      assert(anc.contains(p6))
    }
  }

  test("polyfill: degenerate sub-cell polygon still maps to its vertex cells") {
    val tiny = Seq((37.7701, -122.4101), (37.7702, -122.4101), (37.7702, -122.4102))
    val fill = H3.polygonCells(tiny, 9, 0)
    assert(fill.nonEmpty)
    assert(tiny.map(p => H3.geoToH3String(p._1, p._2, 9)).toSet.subsetOf(fill.toSet))
    assert(H3.polygonCells(Nil, 9, 0).isEmpty)
  }
}
