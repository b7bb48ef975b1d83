package graft.cluster

import org.apache.spark.ml.param.{IntParam, Params, ParamValidators}
import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Tiling knobs shared by both fitted models — the reference's
  * `getTiles(precision, layers)` surface (`01_geofraud_clustering.py:360-364`). */
private[cluster] trait TileParams extends Params {
  final val tilePrecision = new IntParam(this, "tilePrecision",
    "cell resolution used by transform", ParamValidators.inRange(0, 15))
  final val tileLayers = new IntParam(this, "tileLayers",
    "extra cell rings around clusters at transform", ParamValidators.gtEq(0))
  /** Tile-id grid `transform` scores on: the engine's `geocell`
    * (default, oracle-replayable) or real `h3` — a model fitted for the
    * reference's own id space then serves IN-SPARK through the same
    * `transform` call, no manual q283-style join. */
  final val tileGrid = new org.apache.spark.ml.param.Param[String](this,
    "tileGrid", "tile id grid used by transform (geocell | h3)",
    (v: String) => v == TileGrid.GeoCell || v == TileGrid.H3)
  setDefault(tilePrecision -> 10, tileLayers -> 0,
    tileGrid -> TileGrid.GeoCell)
  def setTilePrecision(v: Int): this.type = set(tilePrecision, v)
  def setTileLayers(v: Int): this.type = set(tileLayers, v)
  /** Normalizes case and refuses unknown grids eagerly. */
  def setTileGrid(v: String): this.type = set(tileGrid, TileGrid.validate(v))

  /** Point → tile-id column on the configured grid. */
  protected def tileCellCol(lat: org.apache.spark.sql.Column,
                            lng: org.apache.spark.sql.Column,
                            precision: Int): org.apache.spark.sql.Column =
    if ($(tileGrid) == TileGrid.H3)
      graft.functions.GeoFunctions.geoToH3(lat, lng, precision)
    else graft.functions.GeoFunctions.geoCell(lat, lng, precision)
}

/** Tile GRID dispatch for `getTiles(precision, layers, grid)`: the
  * engine's own [[graft.geo.GeoCell]] (oracle-replayable, the default) or
  * REAL H3 ([[graft.geo.H3.polygonCells]]) — the id space the reference's
  * own tiles tables carry (`01_geofraud_clustering.py:360-364`), so a
  * fitted model can PRODUCE a table downstream reference consumers join
  * against directly (q283's shape). */
private[cluster] object TileGrid {
  val GeoCell = "geocell"
  val H3 = "h3"

  /** Normalized grid name; unknown grids refuse EAGERLY (at plan-build
    * time, not in a task) with both supported names. */
  def validate(grid: String): String =
    grid.toLowerCase(java.util.Locale.ROOT) match {
      case g @ (GeoCell | H3) => g
      case other => throw new IllegalArgumentException(
        s"unknown tile grid '$other' — supported: '$GeoCell' (engine " +
          s"grid, default), '$H3' (real H3 ids)")
    }

  /** (hull, precision, layers) → cell ids on the (validated) grid. */
  def cells(grid: String)(hull: Seq[(Double, Double)], precision: Int,
                          layers: Int): Seq[String] =
    validate(grid) match {
      case GeoCell => graft.geo.GeoCell.polygonCells(hull, precision, layers)
      case _ => graft.geo.H3.polygonCells(hull, precision, layers)
    }
}

/** Memoized materialized tile cover per (precision, layers): repeated
  * transform calls (batch loops, per-microbatch scoring) must not rebuild
  * and reshuffle the tile table every time. Also measures the actual tile
  * count — the broadcast decision input (cluster count is the wrong proxy:
  * a handful of clusters can tile to millions of cells at fine precision). */
private[cluster] final class TileCache(build: (Int, Int, String) => DataFrame)
    extends Serializable {
  @transient private var cached: Option[(Int, Int, String, DataFrame, Long)] = None

  def apply(prec: Int, layers: Int, grid: String): (DataFrame, Long) = synchronized {
    cached match {
      case Some((p, l, g, df, n)) if p == prec && l == layers && g == grid =>
        (df, n)
      case _ =>
        cached.foreach(_._4.unpersist())
        val df = build(prec, layers, grid).persist(StorageLevel.MEMORY_AND_DISK)
        val n = df.count()
        cached = Some((prec, layers, grid, df, n))
        (df, n)
    }
  }
}

private[cluster] object TileCache {
  /** Tile tables at or below this row count broadcast at transform. */
  val BroadcastMaxRows: Long = 1000000L
}
