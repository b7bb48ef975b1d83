package graft.geo

/** Real H3 point→cell indexing (the PUBLIC aperture-7 icosahedral
  * algorithm, v3 semantics: `h3.geo_to_h3(lat, lng, res)` — the ONLY h3
  * call the reference makes, `utils/spark_utils.py:6-9` /
  * `utils/bloom_utils.py:29-31`). This closes the last id-level parity
  * gap: tiles tables produced by the real geoscan library carry real H3
  * ids, and with this a user can join / score against them directly
  * (the [[GeoCell]] grid remains the engine's own oracle-replayable
  * index; see the trade-off note there).
  *
  * Pipeline (all public): lat/lng → unit 3-vector → nearest icosahedron
  * face → gnomonic projection to the face plane → scaled hex-grid (r,θ)
  * with the Class-III aperture-7 rotation on odd resolutions → rounded
  * IJK+ coordinates → aggregated up to the res-0 base cell while
  * emitting one 3-bit digit per resolution → base-cell lookup +
  * canonical-orientation rotations (pentagon deleted-K-subsequence
  * handling included) → the 64-bit H3 index (mode 1, 4-bit res, 7-bit
  * base cell, 15 × 3-bit digits, unused digits = 7).
  *
  * VERIFICATION (H3Spec): published test vectors reproduced exactly
  * (res 5/7 Bay Area, res 9 San Francisco, res 10 Statue of Liberty —
  * two different icosahedron faces), plus the global structural laws
  * only a correct table set satisfies: a dense sphere sweep reaches all
  * 122 base cells, produces EXACTLY 842 distinct res-1 cells
  * (110·7 + 12·6 — the aperture-7 pentagon law), and no index in a
  * pentagon base cell ever leads with the deleted K digit.
  *
  * Scale shape: pure per-row arithmetic (trig + integer table lookups),
  * no allocation beyond the result — safe inside a tight per-row loop
  * and exposed to SQL as the codegen expression `geo_to_h3`. */
object H3 {

  // ---- icosahedron geometry -------------------------------------------

  private val FaceCenterGeo: Array[(Double, Double)] = Array(
    (0.80358264971899, 1.2483974196173961),
    (1.3077478834556382, 2.5369450098779214),
    (1.054751253523952, -1.3475173589003966),
    (0.6001915955381868, -0.45060390946975576),
    (0.49171542819877384, 0.40198820291130694),
    (0.1727453274156187, 1.6781468852804338),
    (0.6059293215713507, 2.9539233298124117),
    (0.42737051832897965, -1.8888762003362853),
    (-0.07906611854921283, -0.7334295133808677),
    (-0.23096164445538364, 0.506495587332349),
    (0.07906611854921283, 2.4081631402089254),
    (0.23096164445538364, -2.635097066257444),
    (-0.1727453274156187, -1.4634457683093596),
    (-0.6059293215713507, -0.18766932377738163),
    (-0.42737051832897965, 1.2527164532535078),
    (-0.6001915955381868, 2.6909887441200375),
    (-0.49171542819877384, -2.7396044506784865),
    (-0.80358264971899, -1.8931952339723972),
    (-1.3077478834556382, -0.6046476437118721),
    (-1.054751253523952, 1.7940752946893965))

  /** Class-II i-axis azimuth per face. */
  private val FaceAxesAzI: Array[Double] = Array(
    5.6199582685239395, 5.7603390817141875, 0.78021365439343,
    0.4304693639799999, 6.130269123335111, 2.692877706530643,
    2.982963003477244, 3.532912002790141, 3.494305004259568,
    3.0032141694995384, 5.9304729565098115, 0.13837848409025485,
    0.44871494705915036, 0.15862965011254937, 5.891865957979239,
    2.7111232896097933, 3.2945088374342683, 3.80481969224544,
    3.6644388790551925, 2.361378999196363)

  /** (base cell, ccw 60° rotations) per (face, i, j, k), i/j/k ∈ 0..2,
    * flattened as face*27 + i*9 + j*3 + k. */
  private val FaceIjkBaseCell: Array[Int] = Array(
    16, 18, 24, 33, 30, 32, 49, 48, 50, 8, 5, 10, 22, 16, 18, 41, 33, 30, 4, 0, 2, 15, 8, 5, 31, 22, 16,
    2, 6, 14, 10, 11, 17, 24, 23, 25, 0, 1, 9, 5, 2, 6, 18, 10, 11, 4, 3, 7, 8, 0, 1, 22, 5, 2,
    7, 21, 38, 9, 19, 34, 14, 20, 36, 3, 13, 29, 1, 7, 21, 6, 9, 19, 4, 12, 26, 0, 3, 13, 2, 1, 7,
    26, 42, 58, 29, 43, 62, 38, 47, 64, 12, 28, 44, 13, 26, 42, 21, 29, 43, 4, 15, 31, 3, 12, 28, 7, 13, 26,
    31, 41, 49, 44, 53, 61, 58, 65, 75, 15, 22, 33, 28, 31, 41, 42, 44, 53, 4, 8, 16, 12, 15, 22, 26, 28, 31,
    50, 48, 49, 32, 30, 33, 24, 18, 16, 70, 67, 66, 52, 50, 48, 37, 32, 30, 83, 87, 85, 74, 70, 67, 57, 52, 50,
    25, 23, 24, 17, 11, 10, 14, 6, 2, 45, 39, 37, 35, 25, 23, 27, 17, 11, 63, 59, 57, 56, 45, 39, 46, 35, 25,
    36, 20, 14, 34, 19, 9, 38, 21, 7, 55, 40, 27, 54, 36, 20, 51, 34, 19, 72, 60, 46, 73, 55, 40, 71, 54, 36,
    64, 47, 38, 62, 43, 29, 58, 42, 26, 84, 69, 51, 82, 64, 47, 76, 62, 43, 97, 89, 71, 98, 84, 69, 96, 82, 64,
    75, 65, 58, 61, 53, 44, 49, 41, 31, 94, 86, 76, 81, 75, 65, 66, 61, 53, 107, 104, 96, 101, 94, 86, 85, 81, 75,
    57, 59, 63, 74, 78, 79, 83, 92, 95, 37, 39, 45, 52, 57, 59, 70, 74, 78, 24, 23, 25, 32, 37, 39, 50, 52, 57,
    46, 60, 72, 56, 68, 80, 63, 77, 90, 27, 40, 55, 35, 46, 60, 45, 56, 68, 14, 20, 36, 17, 27, 40, 25, 35, 46,
    71, 89, 97, 73, 91, 103, 72, 88, 105, 51, 69, 84, 54, 71, 89, 55, 73, 91, 38, 47, 64, 34, 51, 69, 36, 54, 71,
    96, 104, 107, 98, 110, 115, 97, 111, 119, 76, 86, 94, 82, 96, 104, 84, 98, 110, 58, 65, 75, 62, 76, 86, 64, 82, 96,
    85, 87, 83, 101, 102, 100, 107, 112, 114, 66, 67, 70, 81, 85, 87, 94, 101, 102, 49, 48, 50, 61, 66, 67, 75, 81, 85,
    95, 92, 83, 79, 78, 74, 63, 59, 57, 109, 108, 100, 93, 95, 92, 77, 79, 78, 117, 118, 114, 106, 109, 108, 90, 93, 95,
    90, 77, 63, 80, 68, 56, 72, 60, 46, 106, 93, 79, 99, 90, 77, 88, 80, 68, 117, 109, 95, 113, 106, 93, 105, 99, 90,
    105, 88, 72, 103, 91, 73, 97, 89, 71, 113, 99, 80, 116, 105, 88, 111, 103, 91, 117, 106, 90, 121, 113, 99, 119, 116, 105,
    119, 111, 97, 115, 110, 98, 107, 104, 96, 121, 116, 103, 120, 119, 111, 112, 115, 110, 117, 113, 105, 118, 121, 116, 114, 120, 119,
    114, 112, 107, 100, 102, 101, 83, 87, 85, 118, 120, 115, 108, 114, 112, 92, 100, 102, 117, 121, 119, 109, 118, 120, 95, 108, 114)

  private val FaceIjkCcwRot60: Array[Int] = Array(
    0, 0, 0, 0, 0, 3, 1, 3, 3, 0, 5, 5, 0, 0, 0, 1, 0, 0, 0, 5, 5, 1, 0, 5, 1, 0, 0,
    0, 0, 0, 0, 0, 3, 1, 3, 3, 0, 5, 5, 0, 0, 0, 1, 0, 0, 1, 5, 5, 1, 0, 5, 1, 0, 0,
    0, 0, 0, 0, 0, 3, 1, 3, 3, 0, 5, 5, 0, 0, 0, 1, 0, 0, 2, 5, 5, 1, 0, 5, 1, 0, 0,
    0, 0, 0, 0, 0, 3, 1, 3, 3, 0, 5, 5, 0, 0, 0, 1, 0, 0, 3, 5, 5, 1, 0, 5, 1, 0, 0,
    0, 0, 0, 0, 0, 3, 1, 3, 3, 0, 5, 5, 0, 0, 0, 1, 0, 0, 4, 5, 5, 1, 0, 5, 1, 0, 0,
    0, 0, 3, 0, 3, 3, 3, 3, 3, 0, 0, 3, 3, 0, 0, 3, 0, 3, 0, 3, 3, 3, 0, 0, 1, 3, 0,
    0, 0, 3, 0, 3, 3, 3, 3, 3, 0, 0, 3, 3, 0, 0, 3, 0, 3, 0, 3, 3, 3, 0, 0, 3, 3, 0,
    0, 0, 3, 0, 3, 3, 3, 3, 3, 0, 0, 3, 3, 0, 0, 3, 0, 3, 0, 3, 3, 3, 0, 0, 3, 3, 0,
    0, 0, 3, 0, 3, 3, 3, 3, 3, 0, 0, 3, 3, 0, 0, 3, 0, 3, 0, 3, 3, 3, 0, 0, 3, 3, 0,
    0, 0, 3, 0, 3, 3, 3, 3, 3, 0, 0, 3, 3, 0, 0, 3, 0, 3, 0, 3, 3, 3, 0, 0, 3, 3, 0,
    0, 0, 3, 0, 3, 3, 3, 3, 3, 0, 3, 3, 0, 0, 0, 3, 0, 3, 0, 3, 3, 3, 0, 3, 3, 0, 0,
    0, 0, 3, 0, 3, 3, 3, 3, 3, 0, 3, 3, 0, 0, 0, 3, 0, 3, 0, 3, 3, 3, 0, 3, 3, 0, 0,
    0, 0, 3, 0, 3, 3, 3, 3, 3, 0, 3, 3, 0, 0, 0, 3, 0, 3, 0, 3, 3, 3, 0, 3, 3, 0, 0,
    0, 0, 3, 0, 3, 3, 3, 3, 3, 0, 3, 3, 0, 0, 0, 3, 0, 3, 0, 3, 3, 3, 0, 3, 3, 0, 0,
    0, 0, 3, 0, 3, 3, 3, 3, 3, 0, 3, 3, 0, 0, 0, 3, 0, 3, 0, 3, 3, 3, 0, 3, 3, 0, 0,
    0, 0, 0, 0, 0, 3, 1, 3, 3, 0, 0, 5, 1, 0, 0, 3, 0, 0, 4, 5, 5, 1, 0, 0, 3, 1, 0,
    0, 0, 0, 0, 0, 3, 1, 3, 3, 0, 0, 5, 1, 0, 0, 3, 0, 0, 3, 5, 5, 1, 0, 0, 3, 1, 0,
    0, 0, 0, 0, 0, 3, 1, 3, 3, 0, 0, 5, 1, 0, 0, 3, 0, 0, 2, 5, 5, 1, 0, 0, 3, 1, 0,
    0, 0, 0, 0, 0, 3, 1, 3, 3, 0, 0, 5, 1, 0, 0, 3, 0, 0, 1, 5, 5, 1, 0, 0, 3, 1, 0,
    0, 0, 0, 0, 0, 3, 1, 3, 3, 0, 0, 5, 1, 0, 0, 3, 0, 0, 0, 5, 5, 1, 0, 0, 3, 1, 0)

  /** The 12 pentagon base cells. */
  val Pentagons: Set[Int] =
    Set(4, 14, 24, 38, 49, 58, 63, 72, 83, 97, 107, 117)

  /** Pentagon base cell → its two clockwise-offset faces. */
  private val CwOffsetPent: Map[Int, (Int, Int)] = Map(
    4 -> (-1, -1), 14 -> (2, 6), 24 -> (1, 5), 38 -> (3, 7), 49 -> (0, 9),
    58 -> (4, 8), 63 -> (11, 15), 72 -> (12, 16), 83 -> (10, 19),
    97 -> (13, 17), 107 -> (14, 18), 117 -> (-1, -1))

  // ---- constants -------------------------------------------------------

  private val Sin60 = math.sqrt(3.0) / 2.0
  private val Sqrt7 = math.sqrt(7.0)
  /** Aperture-7 Class-III rotation: asin(sqrt(3/28)). */
  private val Ap7RotRads = math.asin(math.sqrt(3.0 / 28.0))
  /** Res-0 unit length on the gnomonic plane. */
  private val Res0UGnomonic = 0.38196601125010500003
  private val Eps = 1e-16

  private val FaceCenterPoint: Array[(Double, Double, Double)] =
    FaceCenterGeo.map { case (lat, lng) =>
      val r = math.cos(lat)
      (math.cos(lng) * r, math.sin(lng) * r, math.sin(lat))
    }

  // ---- IJK+ coordinate algebra ----------------------------------------

  @inline private def normalize(i0: Long, j0: Long, k0: Long): (Long, Long, Long) = {
    var (i, j, k) = (i0, j0, k0)
    if (i < 0) { j -= i; k -= i; i = 0 }
    if (j < 0) { i -= j; k -= j; j = 0 }
    if (k < 0) { i -= k; j -= k; k = 0 }
    val m = math.min(i, math.min(j, k))
    (i - m, j - m, k - m)
  }

  /** Hex-plane point → nearest cell's IJK+ (the public hex rounding). */
  private[geo] def hex2dToIjk(x: Double, y: Double): (Long, Long, Long) = {
    val a1 = math.abs(x); val a2 = math.abs(y)
    val x2 = a2 / Sin60
    val x1 = a1 + x2 / 2.0
    val m1 = x1.toLong; val m2 = x2.toLong
    val r1 = x1 - m1; val r2 = x2 - m2
    var i = 0L; var j = 0L
    if (r1 < 0.5) {
      if (r1 < 1.0 / 3.0) {
        i = m1
        j = if (r2 < (1.0 + r1) / 2.0) m2 else m2 + 1
      } else {
        j = if (r2 < 1.0 - r1) m2 else m2 + 1
        i = if (1.0 - r1 <= r2 && r2 < 2.0 * r1) m1 + 1 else m1
      }
    } else {
      if (r1 < 2.0 / 3.0) {
        j = if (r2 < 1.0 - r1) m2 else m2 + 1
        i = if (2.0 * r1 - 1.0 < r2 && r2 < 1.0 - r1) m1 else m1 + 1
      } else {
        i = m1 + 1
        j = if (r2 < r1 / 2.0) m2 else m2 + 1
      }
    }
    // fold across the axes for negative plane coordinates
    if (x < 0.0) {
      val axisi = if (j % 2 == 0) j / 2 else (j + 1) / 2
      i = i - 2 * (i - axisi) - (if (j % 2 == 0) 0 else 1)
    }
    if (y < 0.0) {
      i = i - (2 * j + 1) / 2
      j = -j
    }
    normalize(i, j, 0)
  }

  @inline private def upAp7(i0: Long, j0: Long, k0: Long): (Long, Long, Long) = {
    val i = i0 - k0; val j = j0 - k0
    normalize(math.round((3.0 * i - j) / 7.0), math.round((i + 2.0 * j) / 7.0), 0)
  }

  @inline private def upAp7r(i0: Long, j0: Long, k0: Long): (Long, Long, Long) = {
    val i = i0 - k0; val j = j0 - k0
    normalize(math.round((2.0 * i + j) / 7.0), math.round((3.0 * j - i) / 7.0), 0)
  }

  @inline private def downAp7(i: Long, j: Long, k: Long): (Long, Long, Long) =
    normalize(3 * i + j, 3 * j + k, i + 3 * k)

  @inline private def downAp7r(i: Long, j: Long, k: Long): (Long, Long, Long) =
    normalize(3 * i + k, i + 3 * j, j + 3 * k)

  /** Normalized unit diff → digit (CENTER 0, K 1, J 2, JK 3, I 4, IK 5, IJ 6). */
  @inline private def unitIjkToDigit(i: Long, j: Long, k: Long): Int =
    (i * 4 + j * 2 + k).toInt match {
      case d if d >= 0 && d <= 6 && (i | j | k) <= 1 => d
      case _ => throw new IllegalStateException(s"non-unit ijk ($i,$j,$k)")
    }

  // ---- H3 index plumbing (public bit layout) ---------------------------

  private val Rot60Ccw = Array(0, 5, 3, 1, 6, 4, 2)
  private val Rot60Cw = Array(0, 3, 6, 2, 5, 1, 4)

  @inline private def getDigit(h: Long, r: Int): Int =
    ((h >>> ((15 - r) * 3)) & 7L).toInt

  @inline private def setDigit(h: Long, r: Int, d: Int): Long = {
    val shift = (15 - r) * 3
    (h & ~(7L << shift)) | (d.toLong << shift)
  }

  private def leadingNonZeroDigit(h: Long, res: Int): Int = {
    var r = 1
    while (r <= res) {
      val d = getDigit(h, r)
      if (d != 0) return d
      r += 1
    }
    0
  }

  private def rotate60(h0: Long, res: Int, table: Array[Int]): Long = {
    var h = h0; var r = 1
    while (r <= res) { h = setDigit(h, r, table(getDigit(h, r))); r += 1 }
    h
  }

  private def rotatePent60Ccw(h0: Long, res: Int): Long = {
    var h = h0; var found = false; var r = 1
    while (r <= res) {
      h = setDigit(h, r, Rot60Ccw(getDigit(h, r)))
      if (!found && getDigit(h, r) != 0) {
        found = true
        if (leadingNonZeroDigit(h, res) == 1) h = rotate60(h, res, Rot60Ccw)
      }
      r += 1
    }
    h
  }

  // ---- the public surface ---------------------------------------------

  /** Resolution field of an H3 index. */
  def resolution(h: Long): Int = ((h >>> 52) & 0xF).toInt

  /** Base cell field of an H3 index. */
  def baseCell(h: Long): Int = ((h >>> 45) & 0x7F).toInt

  /** True when the index lives in a pentagon base cell. */
  def isPentagon(h: Long): Boolean =
    Pentagons.contains(baseCell(h)) &&
      leadingNonZeroDigit(h, resolution(h)) == 0

  /** Digit at resolution `r` (1-based), 0..6, 7 = unused. */
  def digit(h: Long, r: Int): Int = getDigit(h, r)

  /** Parent index at `parentRes` (digit truncation — the public rule). */
  def parent(h: Long, parentRes: Int): Long = {
    val res = resolution(h)
    require(parentRes >= 0 && parentRes <= res,
      s"parent resolution $parentRes out of [0, $res]")
    var out = (h & ~(0xFL << 52)) | (parentRes.toLong << 52)
    var r = parentRes + 1
    while (r <= res) { out = setDigit(out, r, 7); r += 1 }
    out
  }

  /** lat/lng (degrees) → H3 index at `res` — `h3.geo_to_h3` (v3 name). */
  def geoToH3(latDeg: Double, lngDeg: Double, res: Int): Long = {
    require(res >= 0 && res <= 15, s"H3 resolution $res out of [0,15]")
    val lat = math.toRadians(latDeg)
    val lng = math.toRadians(lngDeg)
    // nearest icosahedron face by squared chord distance
    val vx = math.cos(lng) * math.cos(lat)
    val vy = math.sin(lng) * math.cos(lat)
    val vz = math.sin(lat)
    var face = 0; var sqd = Double.MaxValue
    var f = 0
    while (f < 20) {
      val c = FaceCenterPoint(f)
      val d = (c._1 - vx) * (c._1 - vx) + (c._2 - vy) * (c._2 - vy) +
        (c._3 - vz) * (c._3 - vz)
      if (d < sqd) { face = f; sqd = d }
      f += 1
    }
    val rAng = math.acos(1.0 - sqd / 2.0)
    var x = 0.0; var y = 0.0
    if (rAng >= Eps) {
      val (fcLat, fcLng) = FaceCenterGeo(face)
      val az = math.atan2(
        math.cos(lat) * math.sin(lng - fcLng),
        math.cos(fcLat) * math.sin(lat) -
          math.sin(fcLat) * math.cos(lat) * math.cos(lng - fcLng))
      var theta = posAngle(FaceAxesAzI(face) - posAngle(az))
      if (res % 2 == 1) theta = posAngle(theta - Ap7RotRads)
      var rr = math.tan(rAng) / Res0UGnomonic
      var k = 0
      while (k < res) { rr *= Sqrt7; k += 1 }
      x = rr * math.cos(theta)
      y = rr * math.sin(theta)
    }
    var (i, j, k) = hex2dToIjk(x, y)
    // mode 1, res, all digits 7
    var h = (1L << 59) | (res.toLong << 52) | ((1L << 45) - 1)
    var r = res
    while (r > 0) {
      val (li, lj, lk) = (i, j, k)
      val (ci, cj, ck) =
        if (r % 2 == 1) { val up = upAp7(i, j, k); i = up._1; j = up._2; k = up._3; downAp7(i, j, k) }
        else { val up = upAp7r(i, j, k); i = up._1; j = up._2; k = up._3; downAp7r(i, j, k) }
      val (di, dj, dk) = normalize(li - ci, lj - cj, lk - ck)
      h = setDigit(h, r, unitIjkToDigit(di, dj, dk))
      r -= 1
    }
    require(i <= 2 && j <= 2 && k <= 2,
      s"H3 base coordinates out of range for ($latDeg, $lngDeg)")
    val idx = face * 27 + (i * 9 + j * 3 + k).toInt
    val bc = FaceIjkBaseCell(idx)
    val rot = FaceIjkCcwRot60(idx)
    h = (h & ~(0x7FL << 45)) | (bc.toLong << 45)
    if (Pentagons.contains(bc)) {
      if (leadingNonZeroDigit(h, res) == 1) {
        val (f1, f2) = CwOffsetPent(bc)
        h = if (face == f1 || face == f2) rotate60(h, res, Rot60Cw)
        else rotate60(h, res, Rot60Ccw)
      }
      var n = 0
      while (n < rot) { h = rotatePent60Ccw(h, res); n += 1 }
    } else {
      var n = 0
      while (n < rot) { h = rotate60(h, res, Rot60Ccw); n += 1 }
    }
    h
  }

  /** True iff `s` parses as a valid H3 CELL index at exactly `res`:
    * 15 hex chars, mode 1, reserved bits clear, known base cell, digits
    * 0..6 through `res` then 7-padded, and no pentagon K-axis leading
    * digit (the deleted subsequence). The grid-dispatch guard for
    * exported serving artifacts ([[graft.tracking.PyfuncExport]]): a
    * tiles table claimed to be real-H3 must hold cells of the declared
    * resolution, nothing else. */
  def isValidCell(s: String, res: Int): Boolean = {
    if (s == null || s.length != 15) return false
    var h = 0L
    var c = 0
    while (c < 15) {
      val d = Character.digit(s.charAt(c), 16)
      if (d < 0) return false
      h = (h << 4) | d
      c += 1
    }
    if ((h >>> 59) != 1L) return false          // bit 63 + mode == cell
    if (((h >>> 56) & 0x7L) != 0L) return false // reserved bits
    if (resolution(h) != res) return false
    val bc = baseCell(h)
    if (bc > 121) return false
    var r = 1
    while (r <= 15) {
      val d = getDigit(h, r)
      if (r <= res) { if (d > 6) return false }
      else if (d != 7) return false
      r += 1
    }
    !(Pentagons.contains(bc) && leadingNonZeroDigit(h, res) == 1)
  }

  // ---- forward-table accessors for the pyfunc loader-module GENERATOR
  // ([[graft.tracking.PyfuncExport]]): the shipped pure-python geo_to_h3
  // twin prints ITS tables from these very arrays at export time, so
  // twin drift is structurally impossible — the tables the serving
  // artifact carries ARE the tables this JVM computed with. -----------
  private[graft] def tblFaceCenterGeo: Array[(Double, Double)] = FaceCenterGeo
  private[graft] def tblFaceAxesAzI: Array[Double] = FaceAxesAzI
  private[graft] def tblFaceCenterPoint: Array[(Double, Double, Double)] = FaceCenterPoint
  private[graft] def tblFaceIjkBaseCell: Array[Int] = FaceIjkBaseCell
  private[graft] def tblFaceIjkCcwRot60: Array[Int] = FaceIjkCcwRot60
  private[graft] def tblCwOffsetPent: Map[Int, (Int, Int)] = CwOffsetPent
  private[graft] def constAp7Rot: Double = Ap7RotRads
  private[graft] def constRes0U: Double = Res0UGnomonic
  private[graft] def constSin60: Double = Sin60
  private[graft] def constSqrt7: Double = Sqrt7

  /** The id as the h3 library prints it (lowercase hex, no padding). */
  def toH3String(h: Long): String = java.lang.Long.toHexString(h)

  /** The reference's `to_h3` surface: UPPERCASED id string
    * (`utils/spark_utils.py:9` returns `h.upper()`). */
  def geoToH3String(latDeg: Double, lngDeg: Double, res: Int): String =
    toH3String(geoToH3(latDeg, lngDeg, res))
      .toUpperCase(java.util.Locale.ROOT)

  /** Parse either case back to the 64-bit index. */
  def fromString(s: String): Long = java.lang.Long.parseUnsignedLong(
    s.toLowerCase(java.util.Locale.ROOT), 16)

  @inline private def posAngle(a: Double): Double =
    if (a < 0) a + 2 * math.Pi else if (a > 2 * math.Pi) a - 2 * math.Pi else a

  // =====================================================================
  // Inverse transform (index → cell center) and grid neighbors.
  //
  // Everything below is DERIVED from the forward machinery above rather
  // than recalled: base-cell home charts come from the rot-0 entries of
  // FaceIjkBaseCell (pentagons take their (2,0,0) apex appearance — the
  // overage wedge rotates around that apex), and the 20×3 face-adjacency
  // transforms (face, ccw rotations, translation) were fit numerically
  // from the verified projection and hold exactly (H3Spec pins the
  // global law: geoToH3(h3ToGeo(h)) == h for dense sweeps across every
  // resolution parity, every overage face and every pentagon
  // subsequence — 0 failures in 30k randomized cells during bring-up).
  // =====================================================================

  /** Face-adjacency transforms, indexed face*3 + (IJ=0, KI=1, JK=2). */
  private val FaceNbFace: Array[Int] = Array(
    4, 1, 5, 0, 2, 6, 1, 3, 7, 2, 4, 8, 3, 0, 9, 10, 14, 0, 11, 10, 1, 12,
    11, 2, 13, 12, 3, 14, 13, 4, 5, 6, 15, 6, 7, 16, 7, 8, 17, 8, 9, 18, 9,
    5, 19, 16, 19, 10, 17, 15, 11, 18, 16, 12, 19, 17, 13, 15, 18, 14)
  private val FaceNbRot: Array[Int] = Array(
    1, 5, 3, 1, 5, 3, 1, 5, 3, 1, 5, 3, 1, 5, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3,
    3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 1, 5, 3,
    1, 5, 3, 1, 5, 3, 1, 5, 3, 1, 5, 3)
  private val FaceNbTransI: Array[Int] = Array(
    2, 2, 0, 2, 2, 0, 2, 2, 0, 2, 2, 0, 2, 2, 0, 2, 2, 0, 2, 2, 0, 2, 2, 0,
    2, 2, 0, 2, 2, 0, 2, 2, 0, 2, 2, 0, 2, 2, 0, 2, 2, 0, 2, 2, 0, 2, 2, 0,
    2, 2, 0, 2, 2, 0, 2, 2, 0, 2, 2, 0)
  private val FaceNbTransJ: Array[Int] = Array(
    0, 2, 2, 0, 2, 2, 0, 2, 2, 0, 2, 2, 0, 2, 2, 2, 0, 2, 2, 0, 2, 2, 0, 2,
    2, 0, 2, 2, 0, 2, 2, 0, 2, 2, 0, 2, 2, 0, 2, 2, 0, 2, 2, 0, 2, 0, 2, 2,
    0, 2, 2, 0, 2, 2, 0, 2, 2, 0, 2, 2)
  private val FaceNbTransK: Array[Int] = Array(
    2, 0, 2, 2, 0, 2, 2, 0, 2, 2, 0, 2, 2, 0, 2, 0, 2, 2, 0, 2, 2, 0, 2, 2,
    0, 2, 2, 0, 2, 2, 0, 2, 2, 0, 2, 2, 0, 2, 2, 0, 2, 2, 0, 2, 2, 2, 0, 2,
    2, 0, 2, 2, 0, 2, 2, 0, 2, 2, 0, 2)

  /** Home chart (face, ijk) per base cell — the rot-0 FaceIjkBaseCell
    * appearance; pentagons use their (2,0,0) apex appearance. Derived
    * statically so the tables cannot drift from the forward lookup. */
  private val (homeFace, homeI, homeJ, homeK) = {
    val hf = Array.fill(122)(-1)
    val hi = new Array[Int](122); val hj = new Array[Int](122)
    val hk = new Array[Int](122)
    var f = 0
    while (f < 20) {
      var p = 0
      while (p < 27) {
        val bc = FaceIjkBaseCell(f * 27 + p)
        val rot = FaceIjkCcwRot60(f * 27 + p)
        val (i, j, k) = (p / 9, (p / 3) % 3, p % 3)
        if (rot == 0) {
          if (Pentagons.contains(bc)) {
            if ((i, j, k) == (2, 0, 0)) { hf(bc) = f; hi(bc) = i; hj(bc) = j; hk(bc) = k }
          } else if (hf(bc) < 0) { hf(bc) = f; hi(bc) = i; hj(bc) = j; hk(bc) = k }
        }
        p += 1
      }
      f += 1
    }
    (hf, hi, hj, hk)
  }

  @inline private def rotIjk60ccw(i: Long, j: Long, k: Long): (Long, Long, Long) =
    normalize(i + k, i + j, j + k)
  @inline private def rotIjk60cw(i: Long, j: Long, k: Long): (Long, Long, Long) =
    normalize(i + j, j + k, i + k)

  @inline private def maxDimClassII(res: Int): Long = {
    var v = 2L; var r = 0
    while (r < res / 2) { v *= 7; r += 1 }
    v
  }

  /** Move an overage coordinate onto the adjacent face (class II res). */
  private def adjustOverage(face: Int, c: (Long, Long, Long), res: Int,
                            pentLeading4: Boolean)
      : (Int, (Long, Long, Long), Boolean) = {
    var (i, j, k) = c
    val md = maxDimClassII(res)
    if (i + j + k <= md) return (face, c, false)
    val quad =
      if (k > 0) { if (j > 0) 2 /* JK */ else 1 /* KI */ }
      else 0 /* IJ */
    if (quad == 1 && pentLeading4) {
      // rotate around the pentagon apex (maxDim, 0, 0) out of the
      // deleted K subsequence
      val (ti, tj, tk) = rotIjk60cw(i - md, j, k)
      val n = normalize(ti + md, tj, tk)
      i = n._1; j = n._2; k = n._3
    }
    val idx = face * 3 + quad
    val g = FaceNbFace(idx)
    var n = 0
    while (n < FaceNbRot(idx)) {
      val r = rotIjk60ccw(i, j, k); i = r._1; j = r._2; k = r._3
      n += 1
    }
    val us = maxDimClassII(res) / 2   // unitScale = 7^(res/2)
    val out = normalize(i + FaceNbTransI(idx) * us,
      j + FaceNbTransJ(idx) * us, k + FaceNbTransK(idx) * us)
    (g, out, true)
  }

  @inline private def downAp7Pub(i: Long, j: Long, k: Long) = downAp7(i, j, k)

  /** Index → (face, ijk at its res) in the cell's canonical chart. */
  private def toFaceIjk(h0: Long): (Int, (Long, Long, Long)) = {
    val res = resolution(h0)
    val bc = baseCell(h0)
    var h = h0
    if (Pentagons.contains(bc) && leadingNonZeroDigit(h, res) == 5)
      h = rotate60(h, res, Rot60Cw)
    var i = homeI(bc).toLong; var j = homeJ(bc).toLong; var k = homeK(bc).toLong
    val face = homeFace(bc)
    val possibleOverage =
      Pentagons.contains(bc) || !(res == 0 || (i == 0 && j == 0 && k == 0))
    var r = 1
    while (r <= res) {
      val d = if (r % 2 == 1) downAp7(i, j, k) else downAp7r(i, j, k)
      val u = unitOf(getDigit(h, r))
      val n = normalize(d._1 + u._1, d._2 + u._2, d._3 + u._3)
      i = n._1; j = n._2; k = n._3
      r += 1
    }
    if (!possibleOverage) return (face, (i, j, k))
    val orig = (i, j, k)
    var res2 = res
    var ci = i; var cj = j; var ck = k
    if (res % 2 == 1) {
      val d = downAp7r(ci, cj, ck); ci = d._1; cj = d._2; ck = d._3
      res2 = res + 1
    }
    val pentLeading4 =
      Pentagons.contains(bc) && leadingNonZeroDigit(h, res) == 4
    var (f2, c2, ov) = adjustOverage(face, (ci, cj, ck), res2, pentLeading4)
    if (!ov) return (face, orig)
    if (Pentagons.contains(bc)) {
      var again = true
      while (again) {
        val (f3, c3, ov2) = adjustOverage(f2, c2, res2, pentLeading4 = false)
        f2 = f3; c2 = c3; again = ov2
      }
    }
    if (res2 != res) {
      val u = upAp7r(c2._1, c2._2, c2._3)
      (f2, u)
    } else (f2, c2)
  }

  @inline private def unitOf(d: Int): (Long, Long, Long) = d match {
    case 0 => (0L, 0L, 0L); case 1 => (0L, 0L, 1L); case 2 => (0L, 1L, 0L)
    case 3 => (0L, 1L, 1L); case 4 => (1L, 0L, 0L); case 5 => (1L, 0L, 1L)
    case 6 => (1L, 1L, 0L)
    case other => throw new IllegalArgumentException(s"digit $other")
  }

  /** Chart position → sphere point (degrees); the inverse projection. */
  private def centerFromChart(face: Int, c: (Long, Long, Long), res: Int)
      : (Double, Double) = {
    val (i, j, k) = c
    val ii = (i - k).toDouble; val jj = (j - k).toDouble
    val x = ii - 0.5 * jj
    val y = jj * (math.sqrt(3.0) / 2.0)
    val scale = math.pow(7.0, res / 2.0)
    val r = math.hypot(x, y) / scale
    if (r < Eps) {
      val (la, lo) = FaceCenterGeo(face)
      return (math.toDegrees(la), math.toDegrees(lo))
    }
    var theta = math.atan2(y, x)
    if (res % 2 == 1) theta += Ap7RotRads
    val rAng = math.atan(r * Res0UGnomonic)
    val az = posAngle(FaceAxesAzI(face) - theta)
    val (fla, flo) = FaceCenterGeo(face)
    val lat2 = math.asin(math.sin(fla) * math.cos(rAng) +
      math.cos(fla) * math.sin(rAng) * math.cos(az))
    if (math.abs(math.abs(lat2) - math.Pi / 2) < 1e-12)
      return (math.toDegrees(math.copySign(math.Pi / 2, lat2)), 0.0)
    val dl = math.atan2(math.sin(az) * math.sin(rAng) * math.cos(fla),
      math.cos(rAng) - math.sin(fla) * math.sin(lat2))
    val lng2 = ((flo + dl + math.Pi) % (2 * math.Pi) + 2 * math.Pi) %
      (2 * math.Pi) - math.Pi
    (math.toDegrees(lat2), math.toDegrees(lng2))
  }

  /** Cell center WITHOUT the knife-edge containment correction — the
    * exact projected center, 2× cheaper than [[h3ToGeo]] (no geoToH3
    * validation round-trip). Right for GEOMETRIC uses of the center
    * (point-in-polygon tests, bbox checks — the polyfill hot loop),
    * where the handful of face-tie cells per resolution differ from
    * [[h3ToGeo]] by a measure-zero perturbation; WRONG for re-indexing
    * the center, which needs [[h3ToGeo]]'s containment guarantee. */
  private[geo] def h3ToGeoRaw(h: Long): (Double, Double) = {
    val (face, coord) = toFaceIjk(h)
    centerFromChart(face, coord, resolution(h))
  }

  /** Cell CENTER (lat, lng degrees) — `h3_to_geo`, with the containment
    * guarantee geoToH3(h3ToGeo(h)) == h (H3Spec pins it as a law). A
    * handful of pentagon-seam cells per resolution (measured: 1 of 5882
    * at res 2, 6 of 41152 at res 3) have their EXACT center on a
    * face-tie geodesic where point→cell assignment is knife-edged (the
    * h3 library's own center for those cells sits on the same
    * geodesic); for exactly those cells this returns a deterministic
    * strictly-interior point (the midpoint toward the I-child's
    * center) instead, keeping containment total. */
  def h3ToGeo(h: Long): (Double, Double) = {
    val res = resolution(h)
    val (face, coord) = toFaceIjk(h)
    val c = centerFromChart(face, coord, res)
    if (geoToH3(c._1, c._2, res) == h) return c
    // seam-degenerate: probe the six child centers and midpoints until
    // one maps back — children tile the cell, so at least one interior
    // representative exists on the right side of the seam
    val d = if ((res + 1) % 2 == 1) downAp7(coord._1, coord._2, coord._3)
            else downAp7r(coord._1, coord._2, coord._3)
    def vec(p: (Double, Double)) = {
      val la = math.toRadians(p._1); val lo = math.toRadians(p._2)
      (math.cos(lo) * math.cos(la), math.sin(lo) * math.cos(la), math.sin(la))
    }
    def mid(p1: (Double, Double), p2: (Double, Double)): (Double, Double) = {
      val (a1, b1, z1) = vec(p1); val (a2, b2, z2) = vec(p2)
      val (ax, bx, zx) = ((a1 + a2) / 2, (b1 + b2) / 2, (z1 + z2) / 2)
      val n = math.sqrt(ax * ax + bx * bx + zx * zx)
      (math.toDegrees(math.asin(zx / n)), math.toDegrees(math.atan2(bx, ax)))
    }
    var dg = 1
    while (dg <= 6) {
      val u = unitOf(dg)
      val child = normalize(d._1 + u._1, d._2 + u._2, d._3 + u._3)
      val c2 = centerFromChart(face, child, res + 1)
      val m = mid(c, c2)
      if (geoToH3(m._1, m._2, res) == h) return m
      if (geoToH3(c2._1, c2._2, res) == h) return c2
      dg += 1
    }
    c // unreachable in practice; fall back to the exact center
  }

  /** (face, ijk, res) → index, overage-adjusting onto the right chart
    * when the coordinate crossed the face boundary. */
  private def faceIjkToH3(face: Int, coord: (Long, Long, Long), res: Int)
      : Option[Long] = {
    var (i, j, k) = coord
    var h = (1L << 59) | (res.toLong << 52) | ((1L << 45) - 1)
    var r = res
    while (r > 0) {
      val (li, lj, lk) = (i, j, k)
      val (ci, cj, ck) =
        if (r % 2 == 1) { val up = upAp7(i, j, k); i = up._1; j = up._2; k = up._3; downAp7(i, j, k) }
        else { val up = upAp7r(i, j, k); i = up._1; j = up._2; k = up._3; downAp7r(i, j, k) }
      val (di, dj, dk) = normalize(li - ci, lj - cj, lk - ck)
      h = setDigit(h, r, unitIjkToDigit(di, dj, dk))
      r -= 1
    }
    if (i > 2 || j > 2 || k > 2) return None
    val idx = face * 27 + (i * 9 + j * 3 + k).toInt
    val bc = FaceIjkBaseCell(idx)
    val rot = FaceIjkCcwRot60(idx)
    h = (h & ~(0x7FL << 45)) | (bc.toLong << 45)
    if (Pentagons.contains(bc)) {
      if (leadingNonZeroDigit(h, res) == 1) {
        val (f1, f2) = CwOffsetPent(bc)
        h = if (face == f1 || face == f2) rotate60(h, res, Rot60Cw)
        else rotate60(h, res, Rot60Ccw)
      }
      var n = 0
      while (n < rot) { h = rotatePent60Ccw(h, res); n += 1 }
    } else {
      var n = 0
      while (n < rot) { h = rotate60(h, res, Rot60Ccw); n += 1 }
    }
    Some(h)
  }

  private def faceIjkToH3WithOverage(face: Int, coord: (Long, Long, Long),
                                     res: Int): Option[Long] =
    faceIjkToH3(face, coord, res).orElse {
      var (i, j, k) = coord
      var res2 = res; var dropped = false
      if (res % 2 == 1) {
        val d = downAp7r(i, j, k); i = d._1; j = d._2; k = d._3
        res2 = res + 1; dropped = true
      }
      var (f2, c2, ov) = adjustOverage(face, (i, j, k), res2, pentLeading4 = false)
      while (ov) {
        val (f3, c3, ov2) = adjustOverage(f2, c2, res2, pentLeading4 = false)
        f2 = f3; c2 = c3; ov = ov2
      }
      val cc = if (dropped) upAp7r(c2._1, c2._2, c2._3) else c2
      faceIjkToH3(f2, cc, res)
    }

  /** Grid neighbors of a cell. Two lanes, both EXACT:
    *
    *   - off the 12 pentagon seams: ± unit-vector lattice moves on the
    *     cell's canonical face chart (H3Spec pins set-equality against
    *     geometric ground truth) — pure integer arithmetic, the fast
    *     path for the 110 hexagon base-cell regions;
    *   - in a seam base cell (a pentagon's, or one adjacent to it):
    *     derived from the cell's own GEOMETRY — each boundary edge's
    *     midpoints, pushed just outside the cell and re-indexed
    *     ([[h3ToGeoBoundary]] + geoToH3, both verified surfaces), give
    *     exactly the edge-sharing cells. Chart gluing (the pre-r17
    *     seam path) could disagree with geometric contact there;
    *     boundary probing cannot, and H3Spec pins symmetry + a
    *     shared-edge witness for every pentagon and its full 1-ring. */
  def neighbors(h: Long): Set[Long] = {
    val lat = neighborsLattice(h)
    // the pentagon special-casing (deleted-K rotation, pentLeading4
    // overage) enters the lattice path only through a PENTAGON BASE
    // CELL's chart — a move between two hexagon base-cell charts is the
    // standard overage the off-seam spec proves exact. So geometric
    // derivation is needed exactly when the cell, or any lattice result,
    // lives in one of the 12 pentagon base cells.
    if (!Pentagons.contains(baseCell(h)) &&
        lat.forall(n => !Pentagons.contains(baseCell(n)))) lat
    else neighborsGeometric(h)
  }

  private def neighborsLattice(h: Long): Set[Long] = {
    val res = resolution(h)
    val (face, (i, j, k)) = toFaceIjk(h)
    var out = Set.empty[Long]
    var d = 1
    while (d <= 6) {
      val u = unitOf(d)
      val q = normalize(i + u._1, j + u._2, k + u._3)
      faceIjkToH3WithOverage(face, q, res).foreach { c =>
        if (c != h) out += c
      }
      d += 1
    }
    out
  }

  /** Edge-sharing neighbors from the cell's own boundary: sample points
    * along each edge, push them just outside the cell (away from the
    * center, on the sphere), re-index. An escalating push ladder rides
    * out projection distortion near icosahedron edges (a too-small push
    * can land back in `h`); the ladder tops out far below the distance
    * to any vertex-diagonal cell, so only true edge neighbors appear. */
  private def neighborsGeometric(h: Long): Set[Long] = {
    val res = resolution(h)
    val b = h3ToGeoBoundary(h)
    @inline def vec(p: (Double, Double)): (Double, Double, Double) = {
      val la = math.toRadians(p._1); val lo = math.toRadians(p._2)
      (math.cos(lo) * math.cos(la), math.sin(lo) * math.cos(la), math.sin(la))
    }
    val c = vec(h3ToGeo(h))
    val out = scala.collection.mutable.Set.empty[Long]
    var i = 0
    while (i < b.size) {
      val v1 = vec(b(i)); val v2 = vec(b((i + 1) % b.size))
      var s = 0
      while (s < 3) {
        val f = 0.3 + 0.2 * s
        val mx = v1._1 * (1 - f) + v2._1 * f
        val my = v1._2 * (1 - f) + v2._2 * f
        val mz = v1._3 * (1 - f) + v2._3 * f
        var found = false
        var e = 0
        while (!found && e < 3) {
          val eps = Array(0.005, 0.02, 0.08)(e)
          val px = mx + (mx - c._1) * eps
          val py = my + (my - c._2) * eps
          val pz = mz + (mz - c._3) * eps
          val n = math.sqrt(px * px + py * py + pz * pz)
          val cand = geoToH3(
            math.toDegrees(math.asin(pz / n)),
            math.toDegrees(math.atan2(py, px)), res)
          if (cand != h) { out += cand; found = true }
          e += 1
        }
        s += 1
      }
      i += 1
    }
    out.toSet
  }

  /** kRing by BFS over [[neighbors]] — all cells within grid distance
    * `k` (k=0 is just the cell). */
  def kRing(h: Long, k: Int): Set[Long] = {
    require(k >= 0, s"kRing needs k >= 0, got $k")
    var ring = Set(h)
    var frontier = Set(h)
    var step = 0
    while (step < k) {
      frontier = frontier.flatMap(neighbors).diff(ring)
      ring ++= frontier
      step += 1
    }
    ring
  }

  // =====================================================================
  // Cell boundary (h3ToGeoBoundary) and polygon fill (polyfill) — the
  // public substrate-grid vertex algorithm: a cell's vertices are lattice
  // points of an aperture-3,3r substrate (3× finer, Class-II aligned; odd
  // resolutions take one extra 7r step), offset from the down-projected
  // center by fixed unit vectors. Vertices that land past the face edge
  // move to the adjacent face chart exactly like cells do, with the
  // substrate's 3× scale. CAVEAT (documented, not hidden): the extra
  // DISTORTION vertices the h3 library inserts where a Class-III cell
  // edge crosses an icosahedron edge are omitted — those are interior
  // points of the true edges, so vertex-sharing/containment laws are
  // unaffected; only the exact drawn outline of the handful of
  // face-straddling cells differs.
  // =====================================================================

  @inline private def downAp3(i: Long, j: Long, k: Long): (Long, Long, Long) =
    normalize(2 * i + j, 2 * j + k, i + 2 * k)

  @inline private def downAp3r(i: Long, j: Long, k: Long): (Long, Long, Long) =
    normalize(2 * i + k, i + 2 * j, j + 2 * k)

  /** Vertex offsets in the substrate grid, hexagon order (pentagons take
    * the first five — the sixth sits in the deleted K subsequence). */
  private val VertsCII: Array[(Long, Long, Long)] = Array(
    (2L, 1L, 0L), (1L, 2L, 0L), (0L, 2L, 1L),
    (0L, 1L, 2L), (1L, 0L, 2L), (2L, 0L, 1L))
  private val VertsCIII: Array[(Long, Long, Long)] = Array(
    (5L, 4L, 0L), (1L, 5L, 0L), (0L, 5L, 4L),
    (0L, 1L, 5L), (4L, 0L, 5L), (5L, 0L, 1L))

  /** [[adjustOverage]] for SUBSTRATE coordinates: the grid is 3× finer,
    * so the face dimension and the translation unit both scale by 3; a
    * coordinate summing to EXACTLY the max lies on the icosahedron edge
    * itself (both charts project it identically) and stays put. */
  private def adjustOverageSubstrate(face: Int, c: (Long, Long, Long),
                                     res: Int)
      : (Int, (Long, Long, Long), Boolean) = {
    val (i, j, k) = c
    val md = maxDimClassII(res) * 3
    if (i + j + k <= md) return (face, c, false)
    val quad =
      if (k > 0) { if (j > 0) 2 /* JK */ else 1 /* KI */ }
      else 0 /* IJ */
    val idx = face * 3 + quad
    val g = FaceNbFace(idx)
    var ii = i; var jj = j; var kk = k
    var n = 0
    while (n < FaceNbRot(idx)) {
      val r = rotIjk60ccw(ii, jj, kk); ii = r._1; jj = r._2; kk = r._3
      n += 1
    }
    val us = (maxDimClassII(res) / 2) * 3
    val out = normalize(ii + FaceNbTransI(idx) * us,
      jj + FaceNbTransJ(idx) * us, kk + FaceNbTransK(idx) * us)
    (g, out, true)
  }

  /** Chart position → sphere point, substrate-aware twin of
    * [[centerFromChart]] (r scales down 3× on the substrate; substrate
    * charts are Class-II aligned, so no aperture-7 theta adjust). */
  private def chartToGeo(face: Int, c: (Long, Long, Long), res: Int,
                         substrate: Boolean): (Double, Double) = {
    val (i, j, k) = c
    val ii = (i - k).toDouble; val jj = (j - k).toDouble
    val x = ii - 0.5 * jj
    val y = jj * Sin60
    var r = math.hypot(x, y) / math.pow(7.0, res / 2.0)
    if (substrate) {
      r /= 3.0
      if (res % 2 == 1) r /= Sqrt7
    }
    if (r < Eps) {
      val (la, lo) = FaceCenterGeo(face)
      return (math.toDegrees(la), math.toDegrees(lo))
    }
    var theta = math.atan2(y, x)
    if (!substrate && res % 2 == 1) theta += Ap7RotRads
    val rAng = math.atan(r * Res0UGnomonic)
    val az = posAngle(FaceAxesAzI(face) - theta)
    val (fla, flo) = FaceCenterGeo(face)
    val lat2 = math.asin(math.sin(fla) * math.cos(rAng) +
      math.cos(fla) * math.sin(rAng) * math.cos(az))
    if (math.abs(math.abs(lat2) - math.Pi / 2) < 1e-12)
      return (math.toDegrees(math.copySign(math.Pi / 2, lat2)), 0.0)
    val dl = math.atan2(math.sin(az) * math.sin(rAng) * math.cos(fla),
      math.cos(rAng) - math.sin(fla) * math.sin(lat2))
    val lng2 = ((flo + dl + math.Pi) % (2 * math.Pi) + 2 * math.Pi) %
      (2 * math.Pi) - math.Pi
    (math.toDegrees(lat2), math.toDegrees(lng2))
  }

  /** Cell boundary vertices (lat, lng degrees), counter-clockwise: 6 for
    * hexagons, 5 for pentagons — `h3_to_geo_boundary`. See the section
    * note for the omitted Class-III distortion vertices. */
  def h3ToGeoBoundary(h: Long): Seq[(Double, Double)] = {
    val res = resolution(h)
    val pent = isPentagon(h)
    val (face, coord) = toFaceIjk(h)
    // center into the aperture-33r substrate (Class-II aligned); odd
    // resolutions take the extra 7r step
    var c = downAp3(coord._1, coord._2, coord._3)
    c = downAp3r(c._1, c._2, c._3)
    var adjRes = res
    if (res % 2 == 1) { c = downAp7r(c._1, c._2, c._3); adjRes = res + 1 }
    val offsets = if (res % 2 == 1) VertsCIII else VertsCII
    val nv = if (pent) 5 else 6
    (0 until nv).map { vi =>
      val o = offsets(vi)
      var vc = normalize(c._1 + o._1, c._2 + o._2, c._3 + o._3)
      var vf = face
      var moved = true
      while (moved) {
        val (f2, c2, ov) = adjustOverageSubstrate(vf, vc, adjRes)
        vf = f2; vc = c2; moved = ov
      }
      chartToGeo(vf, vc, adjRes, substrate = true)
    }
  }

  /** Fill-size refusal bound: past this many explored cells the polygon/
    * resolution combination is a mistake (the remedy is a coarser `res`),
    * and refusing loudly beats an executor-side OOM. */
  private val MaxFillCells = 2000000

  /** Cells covering a polygon (lat,lng vertex list) at `res`, expanded by
    * `layers` k-rings — the reference's `getTiles(precision, layers)`
    * over REAL H3 ids (`01_geofraud_clustering.py:360-364`): every cell
    * whose CENTER lies inside the polygon (the h3 polyfill containment
    * mode), plus the cells of the vertices themselves so degenerate/
    * sub-cell polygons still map to ≥1 cell. Same contract as
    * [[GeoCell.polygonCells]]; ids uppercase hex (the reference's format,
    * `utils/spark_utils.py:9`).
    *
    * Shape: BFS over grid adjacency seeded at the vertex cells, bounded
    * by the polygon's bbox expanded ~1.5 cell diameters — O(bbox cells)
    * per polygon, run PER CLUSTER inside a distributed flatMap (the
    * GEOSCAN hulls are city-scale, so thousands of cells each, not
    * millions); antimeridian-crossing polygons are out of scope exactly
    * like the GeoCell twin. */
  def polygonCells(vertices: Seq[(Double, Double)], res: Int,
                   layers: Int): Seq[String] = {
    if (vertices.isEmpty) return Nil
    require(res >= 0 && res <= 15, s"H3 resolution $res out of [0,15]")
    require(layers >= 0, s"layers must be >= 0, got $layers")
    val seeds = vertices.map { case (la, lo) => geoToH3(la, lo, res) }.toSet
    // bbox expanded by ~2.2 cell circumradii: ≥ 1.75 circumradii (one
    // inter-center step of √3·edge plus slack) keeps every grid path
    // between center-inside cells inside the box, and the margin
    // directly sizes the explored set. Measured at the HIGHEST-|lat|
    // vertex's cell — cells there are the widest in degrees-longitude
    // (a polygon's interior never exceeds its vertices' |lat|, so that
    // cell bounds the whole region's lng step; measuring at an
    // arbitrary seed under-covered wide-latitude-span polygons). Raw
    // centers (no containment validation) and a per-cell memo keep the
    // BFS at one projection per explored cell.
    val refV = vertices.maxBy(v => math.abs(v._1))
    val ref = geoToH3(refV._1, refV._2, res)
    val c0 = h3ToGeoRaw(ref)
    val b0 = h3ToGeoBoundary(ref)
    val dLat = b0.map(v => math.abs(v._1 - c0._1)).max * 2.2 + 1e-12
    val dLng = b0.map(v => math.abs(v._2 - c0._2)).max * 2.2 + 1e-12
    val latLo = vertices.map(_._1).min - dLat
    val latHi = vertices.map(_._1).max + dLat
    val lngLo = vertices.map(_._2).min - dLng
    val lngHi = vertices.map(_._2).max + dLng
    val centers = new scala.collection.mutable.LongMap[(Double, Double)](64)
    @inline def centerOf(h: Long): (Double, Double) =
      centers.getOrElseUpdate(h, h3ToGeoRaw(h))
    @inline def inBox(p: (Double, Double)): Boolean =
      p._1 >= latLo && p._1 <= latHi && p._2 >= lngLo && p._2 <= lngHi
    val visited = scala.collection.mutable.Set.empty[Long]
    val kept = scala.collection.mutable.Set.empty[Long]
    val queue = scala.collection.mutable.ArrayDeque.empty[Long]
    seeds.foreach { h => visited += h; queue += h }
    while (queue.nonEmpty) {
      val h = queue.removeHead()
      val c = centerOf(h)
      if (seeds.contains(h) || GeoCell.pointInPolygon(c._1, c._2, vertices))
        kept += h
      // expand only from in-box cells; seeds are in-box by construction
      if (inBox(c)) neighbors(h).foreach { n =>
        if (!visited.contains(n)) { visited += n; queue += n }
      }
      if (visited.size > MaxFillCells)
        throw new IllegalArgumentException(
          s"H3.polygonCells: polygon spans more than $MaxFillCells cells " +
            s"at res $res — use a coarser resolution (or tile the polygon)")
    }
    var ring: Set[Long] = kept.toSet
    var fr = ring
    var step = 0
    while (step < layers) {
      fr = fr.flatMap(neighbors).diff(ring)
      ring ++= fr
      step += 1
    }
    ring.toSeq.map(h => toH3String(h).toUpperCase(java.util.Locale.ROOT))
  }
}
