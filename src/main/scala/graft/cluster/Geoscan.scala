package graft.cluster

import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.{MLReadable, MLReader, MLWritable, MLWriter}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructType}
import org.apache.spark.storage.StorageLevel

import graft.geo.{ConvexHull, GeoCell, GeoJson}
import graft.functions.GeoFunctions

/** Shared parameter surface of the GEOSCAN estimators — exact API parity
  * with the reference library wrapper (`01_geofraud_clustering.py:122-132`:
  * `setLatitudeCol / setLongitudeCol / setPredictionCol / setEpsilon /
  * setMinPts`; `:270-287` adds `setGroupedCol`). */
trait GeoscanParams extends Params {
  final val latitudeCol = new Param[String](this, "latitudeCol", "latitude column name")
  final val longitudeCol = new Param[String](this, "longitudeCol", "longitude column name")
  final val predictionCol = new Param[String](this, "predictionCol", "output cluster-label column (NULL = noise)")
  final val epsilon = new DoubleParam(this, "epsilon", "neighborhood radius in meters", ParamValidators.gt(0))
  final val minPts = new IntParam(this, "minPts", "minimum epsilon-neighbors for a core point", ParamValidators.gtEq(0))
  /** The reference's skew-mitigation sampling (`01_geofraud_clustering.py:170-203`:
    * cap points per ~30 m cell, "dropped our skew by 80%") baked in as a
    * param; 0 disables. */
  final val sampleMaxPerCell = new IntParam(this, "sampleMaxPerCell", "cap input points per res-11 cell before clustering (0 = off)", ParamValidators.gtEq(0))

  setDefault(latitudeCol -> "latitude", longitudeCol -> "longitude",
    predictionCol -> "cluster", epsilon -> 50.0, minPts -> 3, sampleMaxPerCell -> 0)

  def getLatitudeCol: String = $(latitudeCol)
  def getLongitudeCol: String = $(longitudeCol)
  def getPredictionCol: String = $(predictionCol)
  def getEpsilon: Double = $(epsilon)
  def getMinPts: Int = $(minPts)

  def setLatitudeCol(v: String): this.type = set(latitudeCol, v)
  def setLongitudeCol(v: String): this.type = set(longitudeCol, v)
  def setPredictionCol(v: String): this.type = set(predictionCol, v)
  def setEpsilon(v: Double): this.type = set(epsilon, v)
  def setMinPts(v: Int): this.type = set(minPts, v)
  def setSampleMaxPerCell(v: Int): this.type = set(sampleMaxPerCell, v)

  protected def validateInput(schema: StructType): StructType = {
    require(schema.fieldNames.contains($(latitudeCol)), s"missing ${$(latitudeCol)}")
    require(schema.fieldNames.contains($(longitudeCol)), s"missing ${$(longitudeCol)}")
    // transform (re)defines the prediction column, dropping a pre-existing
    // one — the reported schema must match that, not a duplicate field
    StructType(schema.fields.filterNot(_.name == $(predictionCol)))
      .add($(predictionCol), LongType, nullable = true)
  }
}

private[cluster] object GeoscanIO {
  /** Model persistence layout contract (`02_geofraud_fraud.py:24-30`): state
    * is plain Parquet under `{path}/data`, readable without the library;
    * params go to `{path}/params` as a 1-row Parquet. */
  def saveParams(spark: SparkSession, path: String, params: Map[String, String]): Unit = {
    import spark.implicits._
    params.toSeq.toDF("param", "value").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/params")
    // JSON sidecar for humans/tools (the reference logs params to MLflow,
    // 01_geofraud_clustering.py:120-149 — M5; out of engine scope, kept as
    // a plain file)
    // backslash FIRST, then quote: escaping quotes alone turns a value
    // containing '\' into invalid (or silently re-interpreted) JSON
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    val json = params.toSeq.sortBy(_._1).map { case (k, v) =>
      s""""${esc(k)}": "${esc(v)}""""
    }.mkString("{", ", ", "}")
    val sidecar = new org.apache.hadoop.fs.Path(s"$path/params.json")
    val fs = sidecar.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(sidecar, true)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }
  def loadParams(spark: SparkSession, path: String): Map[String, String] = {
    spark.read.parquet(s"$path/params").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
  }
}

/** Density-based geospatial clustering, distributed variant — GEOSCAN
  * steps 1-3 (`01_geofraud_clustering.py:16-32`):
  *
  *  1. '''Grouping''' — each point is exploded to the grid cells covering its
  *     epsilon-disc (resolution chosen so the disc spans ≤1 ring); points
  *     sharing a cell are candidate pairs; haversine ≤ epsilon keeps true
  *     edges. The cell equi-join is the only shuffle, hash-partitioned by
  *     cell id — the "ignore 99.99% of the dataset" trick.
  *  2. '''Clustering''' — vertices with degree < minPts dropped; clusters =
  *     distributed connected components over the core subgraph
  *     ([[ConnectedComponents]]: hook + pointer-jump, O(log n) rounds —
  *     labels are the min vertex id per component, deterministic).
  *  3. '''Hulls''' — per-component convex hull (monotone chain) of core
  *     points; model state = (cluster, hull polygon).
  *
  * Scale notes: input is never collected; the candidate-pair join carries a
  * ~9× cell fanout on the build side only; AQE skew handling + optional
  * `sampleMaxPerCell` guard dense cells; CC runs O(log n) bounded rounds
  * over the (much smaller) core-edge set regardless of graph diameter.
  */
class Geoscan(override val uid: String) extends Estimator[GeoscanModel] with GeoscanParams {
  def this() = this(org.apache.spark.ml.util.Identifiable.randomUID("geoscan"))

  override def copy(extra: ParamMap): Geoscan = defaultCopy(extra)
  override def transformSchema(schema: StructType): StructType = validateInput(schema)

  override def fit(dataset: Dataset[_]): GeoscanModel = {
    val spark = dataset.sparkSession
    import spark.implicits._
    val eps = $(epsilon)

    val raw = dataset.select(
      col($(latitudeCol)).cast(DoubleType).as("lat"),
      col($(longitudeCol)).cast(DoubleType).as("lng"))

    val sampled =
      if ($(sampleMaxPerCell) > 0) Geoscan.capPerCell(raw, $(sampleMaxPerCell))
      else raw

    // localCheckpoint (not persist): pid assignment must be frozen. A cached
    // partition lost and recomputed could reshuffle row order and hand
    // different pids to branches that already consumed the old ones —
    // silent cross-wiring of edges. Checkpointing materializes the ids;
    // losing a checkpoint partition fails loudly instead.
    val pts = sampled.withColumn("pid", monotonically_increasing_id())
      .localCheckpoint(true)

    // pick the finest resolution whose 1-ring still covers epsilon at the
    // data's actual max |lat| — a fixed conservative latitude would coarsen
    // cells ~2× and quadruple candidate pairs (SURVEY §3.1 shuffle note).
    // Computed over the checkpointed points (no second input scan; the
    // per-cell cap moves max |lat| by < one ~30 m cell, irrelevant to the
    // resolution pick). Empty / all-null input → empty model.
    val maxAbsLatOpt = pts.agg(max(abs($"lat"))).as[Option[Double]].head()
    if (maxAbsLatOpt.isEmpty) {
      pts.unpersist() // the eager checkpoint is already pinned on this path
      val empty = spark.emptyDataset[(Long, Seq[(Double, Double)])]
        .toDF("cluster", "hull")
      return copyValues(new GeoscanModel(uid, empty)).setParent(this)
    }
    val res = GeoCell.resolutionForEpsilon(eps, math.min(maxAbsLatOpt.get, 89.0))

    // step 1: epsilon-disc cover explode (build side only) + cell equi-join.
    // No distinct needed: the probe side carries each point's OWN cell
    // (exactly one row per point), so a pair (l, r) joins at most once —
    // via the one build row where l's cover includes r's cell. The cover
    // guarantee (GeoCoreSpec "epsilon-neighbors share a cell") makes that
    // row exist whenever haversine ≤ eps. Saves a full edge-set shuffle.
    val probe = pts.select($"pid".as("pid_r"), $"lat".as("lat_r"), $"lng".as("lng_r"),
      GeoFunctions.geoCell($"lat", $"lng", res).as("cell"))
    val build = pts.select($"pid".as("pid_l"), $"lat".as("lat_l"), $"lng".as("lng_l"),
      explode(GeoFunctions.coverDisc($"lat", $"lng", eps, res)).as("cell"))
    val edges = build.join(probe, "cell")
      .where($"pid_l" < $"pid_r" &&
        GeoFunctions.haversineMeters($"lat_l", $"lng_l", $"lat_r", $"lng_r") <= eps)
      .select($"pid_l", $"pid_r")
      .persist(StorageLevel.MEMORY_AND_DISK)

    // step 2: degree filter (01_geofraud_clustering.py:28) + connected
    // components. minPts = 0 means every point is core — including isolated
    // points that appear in no edge (Dbscan/personalized parity).
    val degrees = edges.select($"pid_l".as("pid")).unionAll(edges.select($"pid_r".as("pid")))
      .groupBy($"pid").agg(count(lit(1)).as("deg"))
    val core =
      if ($(minPts) == 0) pts.select($"pid")
      else degrees.filter($"deg" >= $(minPts)).select($"pid")
    val coreEdges = edges
      .join(core.withColumnRenamed("pid", "pid_l"), "pid_l")
      .join(core.withColumnRenamed("pid", "pid_r"), "pid_r")

    val connected = ConnectedComponents.run(
      coreEdges.select($"pid_l".as("src"), $"pid_r".as("dst")))
      .toDF("pid", "component")
    // a core point whose neighbors are all non-core keeps no core edge:
    // it is its own single-point cluster (reference drops only the
    // low-degree vertices, 01_geofraud_clustering.py:28)
    val components = connected.unionAll(
      core.join(connected, Seq("pid"), "left_anti").select($"pid", $"pid".as("component")))

    // step 3: hulls per component over core points — two-level so a giant
    // component never collects all its points into one task:
    // hull(A ∪ B) = hull(hull(A) ∪ hull(B)), and a hull of n points has
    // ~O(log n) vertices, so the final per-component merge sees only
    // #partitions × O(log n) vertices regardless of component size
    val corePts = pts.join(components, "pid")
    val partialHulls = corePts.select($"component", $"lat", $"lng")
      .as[(Long, Double, Double)]
      .mapPartitions { it =>
        // incremental fold, NOT it.toSeq.groupBy: memory is bounded by
        // #components × (buffer cap + O(hull)), never the partition size.
        // Collapsing the buffer to its hull is lossless —
        // hull(A ∪ B) = hull(hull(A) ∪ B).
        val acc = scala.collection.mutable.HashMap
          .empty[Long, scala.collection.mutable.ArrayBuffer[(Double, Double)]]
        it.foreach { case (c, lat, lng) =>
          val buf = acc.getOrElseUpdate(c, scala.collection.mutable.ArrayBuffer.empty)
          buf += ((lat, lng))
          if (buf.length >= 256) {
            val h = ConvexHull.hull(buf.toSeq)
            buf.clear()
            buf ++= h
          }
        }
        acc.iterator.map { case (c, buf) => (c, ConvexHull.hull(buf.toSeq)) }
      }
    val state = partialHulls
      .groupByKey(_._1)
      .mapGroups { (c, it) => (c, ConvexHull.hull(it.flatMap(_._2).toSeq)) }
      .toDF("cluster", "hull")
      .persist(StorageLevel.MEMORY_AND_DISK)
    state.count() // materialize before unpersisting inputs
    pts.unpersist(); edges.unpersist()

    val model = new GeoscanModel(uid, state)
    copyValues(model).setParent(this)
  }
}

object Geoscan {
  /** Deterministic per-cell cap: rank points inside each ~30 m (res 11) cell
    * by a stable key and keep the first `max` — the reference's sampling UDF
    * (`01_geofraud_clustering.py:178-191`) without the nondeterminism. */
  private[cluster] def capPerCell(df: DataFrame, max: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cell = GeoFunctions.geoCell(col("lat"), col("lng"), 11)
    val w = Window.partitionBy(cell).orderBy(col("lat"), col("lng"))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= max).drop("__rn")
  }
}

/** Fitted distributed model — surface parity with the reference `GeoscanModel`
  * (`01_geofraud_clustering.py:216-222,143,254-260,360-364`): `transform`
  * adds a nullable cluster label, `toGeoJson` emits RFC 7946,
  * `getTiles(precision, layers)` emits the cell cover, `save/load` round-trip.
  *
  * Inference is the reference's tiling join — no point-in-polygon: clusters
  * are tiled at `tilePrecision` (+`tileLayers` ring slack) and the input is
  * equi-joined on the cell id (`01_geofraud_clustering.py:210,360-364`). */
class GeoscanModel private[cluster] (
    override val uid: String,
    private[cluster] val state: DataFrame)
  extends Model[GeoscanModel] with GeoscanParams with TileParams with MLWritable {

  override def copy(extra: ParamMap): GeoscanModel =
    copyValues(new GeoscanModel(uid, state), extra).setParent(parent)

  override def transformSchema(schema: StructType): StructType = validateInput(schema)

  /** Cluster cover as (cluster, h3) — `getTiles(precision, layers)`
    * (`01_geofraud_clustering.py:360-364`). The column keeps the reference's
    * `h3` name for drop-in parity (ids are this engine's grid cells,
    * SURVEY §7.3). One label per cell (min cluster id) so downstream joins
    * never fan out. */
  def getTiles(precision: Int, layers: Int): DataFrame =
    getTiles(precision, layers, TileGrid.GeoCell)

  /** [[getTiles]] on an explicit grid: `"geocell"` (engine grid, default)
    * or `"h3"` — REAL H3 ids ([[graft.geo.H3.polygonCells]]), closing the
    * produce side of reference interop: the reference's own tiles tables
    * carry H3 ids, and a model fitted here can now emit one they join. */
  def getTiles(precision: Int, layers: Int, grid: String): DataFrame = {
    val spark = state.sparkSession
    import spark.implicits._
    // validate eagerly (refusals at plan build, not in a task); capture
    // the string, not the model, in the task closure
    val g = TileGrid.validate(grid)
    state.as[(Long, Seq[(Double, Double)])]
      .flatMap { case (c, hull) =>
        TileGrid.cells(g)(hull, precision, layers).map((c, _)) }
      .toDF("cluster", "h3")
      .groupBy("h3").agg(min("cluster").as("cluster"))
      .select("cluster", "h3")
  }

  @transient private lazy val tileCache =
    new TileCache((p, l, g) => getTiles(p, l, g))

  /** Memoized, persisted tile cover — the frame [[transform]] joins against.
    * Use this instead of [[getTiles]] when the cover is also needed outside
    * transform (e.g. persisted to a table): the tiling pipeline then runs
    * once, not once per consumer. Grid follows the `tileGrid` param. */
  def cachedTiles(precision: Int, layers: Int): DataFrame =
    tileCache(precision, layers, $(tileGrid))._1

  override def transform(dataset: Dataset[_]): DataFrame = {
    val prec = $(tilePrecision)
    val (tilesRaw, nTiles) = tileCache(prec, $(tileLayers), $(tileGrid))
    val in = dataset.toDF()
    // UNIQUE helper names (uid-suffixed): the caller may legitimately own
    // an `h3` — or a `__cell`/`__tile_cluster` — column, and a fixed
    // helper name would silently destroy it through the drop below (the
    // same collision class the h3 rename has always guarded)
    val cellCol = s"__cell_$uid"
    val tileClusterCol = s"__tile_cluster_$uid"
    val tileH3Col = s"__tile_h3_$uid"
    val tiles = tilesRaw.select(col("cluster").as(tileClusterCol), col("h3").as(tileH3Col))
    val tilesSide = if (nTiles <= TileCache.BroadcastMaxRows) broadcast(tiles) else tiles
    // the reference's transform (re)defines the prediction column — drop a
    // pre-existing one instead of producing an ambiguous duplicate
    val base = if (in.columns.contains($(predictionCol))) in.drop($(predictionCol)) else in
    base
      .withColumn(cellCol, tileCellCol(
        col($(latitudeCol)).cast(DoubleType), col($(longitudeCol)).cast(DoubleType), prec))
      .join(tilesSide, col(cellCol) === tilesSide(tileH3Col), "left_outer")
      .drop(tileH3Col, cellCol)
      .withColumnRenamed(tileClusterCol, $(predictionCol))
  }

  /** RFC 7946 FeatureCollection of cluster hulls (`01_geofraud_clustering.py:143`). */
  def toGeoJson(): String = {
    val spark = state.sparkSession
    import spark.implicits._
    val clusters = state.as[(Long, Seq[(Double, Double)])]
      .collect().sortBy(_._1)
      .map { case (c, hull) => (c.toString, hull) }
    GeoJson.featureCollection(clusters.toSeq)
  }

  override def write: MLWriter = new MLWriter {
    override protected def saveImpl(path: String): Unit = {
      val spark = state.sparkSession
      GeoscanIO.saveParams(spark, path, Map(
        "class" -> "graft.cluster.GeoscanModel", "uid" -> uid,
        "latitudeCol" -> $(latitudeCol), "longitudeCol" -> $(longitudeCol),
        "predictionCol" -> $(predictionCol), "epsilon" -> $(epsilon).toString,
        "minPts" -> $(minPts).toString, "tilePrecision" -> $(tilePrecision).toString,
        "tileLayers" -> $(tileLayers).toString, "tileGrid" -> $(tileGrid)))
      state.write.mode("overwrite").parquet(s"$path/data")
    }
  }
}

object GeoscanModel extends MLReadable[GeoscanModel] {
  override def read: MLReader[GeoscanModel] = new MLReader[GeoscanModel] {
    override def load(path: String): GeoscanModel = {
      val spark = SparkSession.active
      val p = GeoscanIO.loadParams(spark, path)
      val state = spark.read.parquet(s"$path/data")
      val m = new GeoscanModel(p("uid"), state)
      m.setLatitudeCol(p("latitudeCol")).setLongitudeCol(p("longitudeCol"))
        .setPredictionCol(p("predictionCol")).setEpsilon(p("epsilon").toDouble)
        .setMinPts(p("minPts").toInt)
        .setTilePrecision(p("tilePrecision").toInt).setTileLayers(p("tileLayers").toInt)
        .setTileGrid(p.getOrElse("tileGrid", TileGrid.GeoCell)) // pre-r18 sidecars lack it
    }
  }
}
