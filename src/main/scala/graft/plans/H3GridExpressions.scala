package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.geo.H3

/** SQL surface for REAL-H3 grid traversal/fill — `h3_kring(h3, k)` and
  * `h3_polyfill(lats, lngs, res[, layers])` — so a SQL caller can build
  * a q283-style tiling WITHOUT a fitted model (the reference's own tiles
  * tables are exactly such covers). Both return SORTED uppercase id
  * arrays: deterministic output order makes the results directly
  * comparable/hashable (the driver's oracle gate) and stable across
  * partitionings. [[CodegenFallback]] is the honest choice here — the
  * kernels are set-BFS graph walks, not arithmetic; they run once per
  * ROW over inputs a caller keeps small (a cell, a hull), not once per
  * point in a hot scan loop (that path is `geo_to_h3`, codegen). */
object H3Grid {
  /** Guard against quadratic-cost accidents: kRing(k) touches ~3k²+3k+1
    * cells; 256 rings ≈ 200k cells per row is already a misuse. */
  val MaxK = 256

  private[plans] def parseCell(s: UTF8String, caller: String): Long = {
    val id = s.toString
    val h =
      try java.lang.Long.parseUnsignedLong(
        id.toLowerCase(java.util.Locale.ROOT), 16)
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"$caller: '$id' is not a hex H3 cell id") }
    // hex alone is not a cell — a malformed id must refuse here, not
    // feed garbage into the neighbor walk
    require(H3.isValidCell(id, H3.resolution(h)),
      s"$caller: '$id' is not a valid H3 cell index")
    h
  }

  private[plans] def sortedIds(cells: Iterable[Long]): ArrayData = {
    val arr = cells.toArray
      .map(h => H3.toH3String(h).toUpperCase(java.util.Locale.ROOT))
    java.util.Arrays.sort(arr, java.util.Comparator.naturalOrder[String]())
    new GenericArrayData(arr.map(UTF8String.fromString(_)).asInstanceOf[Array[Any]])
  }
}

/** `h3_kring(h3 STRING, k INT) -> ARRAY<STRING>` — the filled disc of
  * radius `k` around a cell ([[graft.geo.H3.kRing]]; k=0 is the cell
  * itself), ids sorted uppercase. */
case class H3KRingExpression(left: Expression, right: Expression)
    extends Expression with ImplicitCastInputTypes with CodegenFallback {

  override def children: Seq[Expression] = Seq(left, right)
  override def inputTypes: Seq[DataType] =
    Seq(StringType, IntegerType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "h3_kring"

  override def eval(input: InternalRow): Any = {
    val id = left.eval(input)
    val k = right.eval(input)
    if (id == null || k == null) return null
    val kk = k.asInstanceOf[Int]
    require(kk >= 0 && kk <= H3Grid.MaxK,
      s"h3_kring: k=$kk out of [0, ${H3Grid.MaxK}]")
    H3Grid.sortedIds(
      H3.kRing(H3Grid.parseCell(id.asInstanceOf[UTF8String], prettyName), kk))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(left = newChildren(0), right = newChildren(1))
}

/** `h3_polyfill(lats ARRAY<DOUBLE>, lngs ARRAY<DOUBLE>, res INT[, layers
  * INT]) -> ARRAY<STRING>` — center-containment polygon fill with the
  * vertex-cell guarantee, relaxed by `layers` kRings
  * ([[graft.geo.H3.polygonCells]] — the `getTiles` kernel). The two
  * coordinate arrays mirror the reference's own grouped schema
  * (`01_geofraud_clustering.py:185-189`: latitudes/longitudes arrays). */
case class H3PolyfillExpression(lats: Expression, lngs: Expression,
                                res: Expression, layers: Expression)
    extends Expression with ImplicitCastInputTypes with CodegenFallback {

  override def children: Seq[Expression] = Seq(lats, lngs, res, layers)
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType), IntegerType, IntegerType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "h3_polyfill"

  override def eval(input: InternalRow): Any = {
    val la = lats.eval(input)
    val lo = lngs.eval(input)
    val r = res.eval(input)
    val l = layers.eval(input)
    if (la == null || lo == null || r == null || l == null) return null
    val laData = la.asInstanceOf[ArrayData]
    val loData = lo.asInstanceOf[ArrayData]
    // ArrayData.toDoubleArray silently reads 0.0 for UnsafeArrayData null
    // slots (injecting a bogus (0,0) vertex) — refuse null elements by
    // name, consistent with the expression's other guards
    var i = 0
    while (i < laData.numElements()) {
      require(!laData.isNullAt(i),
        s"h3_polyfill: latitudes[$i] is null — polygon vertices must be non-null")
      i += 1
    }
    i = 0
    while (i < loData.numElements()) {
      require(!loData.isNullAt(i),
        s"h3_polyfill: longitudes[$i] is null — polygon vertices must be non-null")
      i += 1
    }
    val laArr = laData.toDoubleArray()
    val loArr = loData.toDoubleArray()
    require(laArr.length == loArr.length,
      s"h3_polyfill: ${laArr.length} latitudes vs ${loArr.length} longitudes")
    val ll = l.asInstanceOf[Int]
    // same guard class as h3_kring's MaxK: each relaxation layer kRings
    // every cover cell, so an unbounded `layers` is a quadratic accident
    require(ll >= 0 && ll <= H3Grid.MaxK,
      s"h3_polyfill: layers=$ll out of [0, ${H3Grid.MaxK}]")
    val verts = laArr.zip(loArr).toSeq
    H3Grid.sortedIds(
      H3.polygonCells(verts, r.asInstanceOf[Int], ll)
        .map(H3.fromString))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(lats = newChildren(0), lngs = newChildren(1),
      res = newChildren(2), layers = newChildren(3))
}
