package graft.tracking

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MLflow **pyfunc model directory** export for the bloom scorer — the
  * interop the reference ships its serving model through
  * (`02_geofraud_fraud.py:220-264`: `mlflow.pyfunc.log_model` + a
  * third-party `mlflow.pyfunc.load_model`). The exported directory
  * follows the PUBLIC MLmodel schema for the `python_function` flavor in
  * its `loader_module` form:
  *
  * {{{
  * dst/
  *   MLmodel                    # YAML: flavors.python_function{...}
  *   conda.yaml  python_env.yaml  requirements.txt
  *   code/graft_bloom_scorer.py # loader module (_load_pyfunc contract)
  *   data/blooms.parquet        # per-user Spark BloomFilter bytes
  *   data/params.txt            # precision=<res>
  * }}}
  *
  * A real mlflow client resolves `loader_module: graft_bloom_scorer`
  * from `code/` (added to sys.path), calls `_load_pyfunc(data_path)`,
  * and gets a `predict(pandas_df[user, latitude, longitude])` that
  * appends the reference's 0/1 `anomaly` column. No pickle is shipped —
  * the loader-module form is the public pyfunc contract for exactly
  * this "model is code + data" case, and it keeps the artifact
  * language-neutral and auditable.
  *
  * The Python side is a PURE-STDLIB twin of the JVM scorer: it parses
  * Spark's public BloomFilter serialization (V1: int version, int
  * numHashFunctions, int numWords, big-endian longs) and replays
  * Murmur3_x86_32 membership plus [[graft.geo.GeoCell]]'s cell id —
  * PyfuncExportSpec pins bit-parity of `predict` against
  * [[graft.score.Blooms.score]] by running the module under python3
  * when one is on PATH. */
object PyfuncExport {

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeText(spark: SparkSession, p: Path, text: String): Unit = {
    val f = fs(spark, p)
    val out = f.create(p, true)
    try out.write(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Default shard budget for `data/blooms.parquet` — a serving artifact
    * at reference scale (5–200 users) stays single-part; past the budget
    * the write shards so a millions-of-users bloom frame never funnels
    * through one task (the measured-cutover idiom, [[graft.score.Blooms]]). */
  val DefaultShardBytes: Long = 64L << 20

  /** Export `trained` ([[graft.score.Blooms.train]] output: user string,
    * bloom binary) as a loadable pyfunc model directory at `dst`. The
    * Python loader reads the parquet DIRECTORY (pyarrow ignores the
    * `_`-prefixed marker files), so shard count is invisible to it. */
  def exportBloomScorer(spark: SparkSession, trained: DataFrame, dst: String,
                        precision: Int = 10, userCol: String = "user",
                        maxShardBytes: Long = DefaultShardBytes): Unit = {
    require(precision >= 0 && precision <= 15, s"precision $precision out of [0,15]")
    require(maxShardBytes > 0, s"maxShardBytes must be positive, got $maxShardBytes")
    val root = new Path(dst)
    val f = fs(spark, root)
    f.delete(root, true)
    f.mkdirs(root)
    // EAGER checkpoint: the size agg and the write would otherwise each
    // replay the (potentially expensive) training lineage
    val blooms = trained
      .select(col(userCol).cast("string").as("user"), col("bloom"))
      .localCheckpoint(true)
    // measure, don't guess: one agg pass sizes the shard count
    val sized = blooms.agg(coalesce(sum(length(col("bloom"))), lit(0L))).head
    val parts = math.max(1L,
      (sized.getLong(0) + maxShardBytes - 1) / maxShardBytes).toInt
    blooms.repartition(parts)
      .write.parquet(new Path(root, "data/blooms.parquet").toString)
    writeText(spark, new Path(root, "data/params.txt"), s"precision=$precision\n")
    writeText(spark, new Path(root, "code/graft_bloom_scorer.py"), loaderModule)
    writeText(spark, new Path(root, "conda.yaml"),
      """channels:
        |- conda-forge
        |dependencies:
        |- python=3.10
        |- pip
        |- pip:
        |  - pandas
        |  - pyarrow
        |name: graft_bloom_env
        |""".stripMargin)
    writeText(spark, new Path(root, "python_env.yaml"),
      """python: 3.10.12
        |build_dependencies:
        |- pip
        |dependencies:
        |- -r requirements.txt
        |""".stripMargin)
    writeText(spark, new Path(root, "requirements.txt"), "pandas\npyarrow\n")
    val created = java.time.format.DateTimeFormatter.ISO_INSTANT
      .format(java.time.Instant.now())
    writeText(spark, new Path(root, "MLmodel"),
      s"""artifact_path: pipeline
         |flavors:
         |  python_function:
         |    code: code
         |    data: data
         |    env:
         |      conda: conda.yaml
         |      virtualenv: python_env.yaml
         |    loader_module: graft_bloom_scorer
         |    python_version: 3.10.12
         |model_uuid: ${java.util.UUID.randomUUID()}
         |utc_time_created: '$created'
         |""".stripMargin)
  }

  /** Export a fitted GEOSCAN model's TILE COVER as a loadable pyfunc
    * model directory — the clustering-model serving interop
    * (`01_geofraud_clustering.py:133-149` logs the fitted model;
    * third-party consumers load and `transform`). The artifact IS the
    * reference's own serving shape: `transform` is a tiling join on the
    * cell id (`01_geofraud_clustering.py:210`), so the model's entire
    * inference surface is (tiles table, precision) — no JVM, no pickle.
    *
    * `tiles` is `getTiles(precision, layers)` output on the ENGINE grid:
    * global `(cluster, h3)` or personalized `(user, cluster, h3)` —
    * sniffed by the `user` column. The Python twin replays
    * [[graft.geo.GeoCell]]'s cell id (the same `_cell_id` the bloom twin
    * ships) and appends the reference's nullable `cluster` via dict
    * lookup; PyfuncExportSpec pins bit-parity of `predict` against
    * `GeoscanModel.transform` / the personalized twin under python3.
    * Real-H3 tile tables refuse by name: the serving twin is pure-stdlib
    * and replays the engine grid only — join h3-grid tiles in Spark. */
  def exportGeoscanScorer(spark: SparkSession, tiles: DataFrame, dst: String,
                          precision: Int,
                          maxShardBytes: Long = DefaultShardBytes): Unit = {
    require(precision >= 0 && precision <= 15, s"precision $precision out of [0,15]")
    require(maxShardBytes > 0, s"maxShardBytes must be positive, got $maxShardBytes")
    val personalized = tiles.columns.contains("user")
    require(tiles.columns.contains("cluster") && tiles.columns.contains("h3"),
      s"tiles frame must carry (cluster, h3) [+ user] — got " +
        tiles.columns.mkString("(", ", ", ")"))
    val root = new Path(dst)
    val f = fs(spark, root)
    f.delete(root, true)
    f.mkdirs(root)
    val cols =
      (if (personalized) Seq(col("user").cast("string").as("user")) else Nil) ++
        Seq(col("cluster").cast("long").as("cluster"),
          col("h3").cast("string").as("h3"))
    // EAGER checkpoint: a getTiles lineage is a per-hull polyfill — the
    // off-grid guard, the size agg and the write must not replay it 3×
    val frame = tiles.select(cols: _*).localCheckpoint(true)
    // refuse REAL-H3 (or any foreign) ids eagerly: an engine cell id is
    // the precision nibble + 7-hex latIndex < 2^(res+8) + 7-hex
    // lngIndex < 2^(res+9) — decode and range-check, not just shape-match
    // (an H3 res-8 id shares the '8' lead with engine precision 8)
    val rows = 1L << (precision + 8)
    val colsMax = 1L << (precision + 9)
    val offGrid = frame.where(
      !col("h3").rlike(f"^$precision%X[0-9A-F]{14}$$") ||
        expr("CAST(conv(substring(h3, 2, 7), 16, 10) AS BIGINT)") >= rows ||
        expr("CAST(conv(substring(h3, 9, 7), 16, 10) AS BIGINT)") >= colsMax)
      .limit(1).select("h3").collect()
    require(offGrid.isEmpty,
      s"exportGeoscanScorer serves the ENGINE grid at precision " +
        s"$precision — tile id '${offGrid.headOption.map(_.getString(0))
          .getOrElse("")}' is not an engine cell at that precision " +
        "(real-H3 tile tables stay in Spark; the pure-stdlib twin " +
        "replays GeoCell only)")
    val sized = frame.agg(coalesce(sum(length(col("h3")) + 16L), lit(0L))).head
    val parts = math.max(1L,
      (sized.getLong(0) + maxShardBytes - 1) / maxShardBytes).toInt
    frame.repartition(parts)
      .write.parquet(new Path(root, "data/tiles.parquet").toString)
    writeText(spark, new Path(root, "data/params.txt"),
      s"precision=$precision\npersonalized=$personalized\n")
    writeText(spark, new Path(root, "code/graft_geoscan_transform.py"),
      geoscanLoaderModule)
    writeText(spark, new Path(root, "conda.yaml"),
      """channels:
        |- conda-forge
        |dependencies:
        |- python=3.10
        |- pip
        |- pip:
        |  - pandas
        |  - pyarrow
        |name: graft_geoscan_env
        |""".stripMargin)
    writeText(spark, new Path(root, "python_env.yaml"),
      """python: 3.10.12
        |build_dependencies:
        |- pip
        |dependencies:
        |- -r requirements.txt
        |""".stripMargin)
    writeText(spark, new Path(root, "requirements.txt"), "pandas\npyarrow\n")
    val created = java.time.format.DateTimeFormatter.ISO_INSTANT
      .format(java.time.Instant.now())
    writeText(spark, new Path(root, "MLmodel"),
      s"""artifact_path: pipeline
         |flavors:
         |  python_function:
         |    code: code
         |    data: data
         |    env:
         |      conda: conda.yaml
         |      virtualenv: python_env.yaml
         |    loader_module: graft_geoscan_transform
         |    python_version: 3.10.12
         |model_uuid: ${java.util.UUID.randomUUID()}
         |utc_time_created: '$created'
         |""".stripMargin)
  }

  /** The geoscan-transform loader module — the pure-stdlib twin of the
    * tiling-join `transform` (nullable cluster label). */
  private[tracking] val geoscanLoaderModule: String =
    """# graft_geoscan_transform: mlflow.pyfunc loader module for the graft
      |# GEOSCAN tile scorer. Pure-stdlib twin of GeoscanModel.transform /
      |# GeoscanPersonalizedModel.transform: the reference's tiling join —
      |# cell id at `precision`, dict lookup into the model's tile cover,
      |# nullable `cluster` appended (pandas Int64, <NA> for misses).
      |# Contract: _load_pyfunc(data_path) -> model; model.predict(pdf)
      |# with columns (latitude, longitude [, user]) appends cluster.
      |import math
      |import os
      |
      |
      |def _cell_id(lat, lng, res):
      |    # graft.geo.GeoCell.cellId: 180/2^(res+8) degree squares,
      |    # "%X%07X%07X" % (res, latIndex, lngIndex)
      |    if lat is None or lng is None or math.isnan(lat) or math.isnan(lng):
      |        return None
      |    step = 180.0 / float(1 << (res + 8))
      |    rows = 1 << (res + 8)
      |    cols = 1 << (res + 9)
      |    i = int(math.floor((lat + 90.0) / step))
      |    i = min(max(i, 0), rows - 1)
      |    j = int(math.floor((lng + 180.0) / step)) % cols
      |    return '%X%07X%07X' % (res, i, j)
      |
      |
      |class GraftGeoscanScorer:
      |    def __init__(self, tiles, precision, personalized):
      |        self._tiles = tiles
      |        self._precision = precision
      |        self._personalized = personalized
      |
      |    def predict(self, df):
      |        import pandas as pd
      |
      |        def row_cluster(row):
      |            cell = _cell_id(row['latitude'], row['longitude'],
      |                            self._precision)
      |            if cell is None:
      |                return None
      |            key = (str(row['user']), cell) if self._personalized else cell
      |            return self._tiles.get(key)
      |        out = df.copy()
      |        out['cluster'] = pd.array(
      |            [row_cluster(r) for _, r in df.iterrows()], dtype='Int64')
      |        return out
      |
      |
      |def _load_pyfunc(data_path):
      |    import pandas as pd
      |    pdf = pd.read_parquet(os.path.join(data_path, 'tiles.parquet'))
      |    precision, personalized = 10, False
      |    with open(os.path.join(data_path, 'params.txt')) as fh:
      |        for line in fh:
      |            k, _, v = line.strip().partition('=')
      |            if k == 'precision':
      |                precision = int(v)
      |            elif k == 'personalized':
      |                personalized = v == 'true'
      |    if personalized:
      |        tiles = {(str(u), str(h)): int(c) for u, c, h in
      |                 zip(pdf['user'], pdf['cluster'], pdf['h3'])}
      |    else:
      |        tiles = {str(h): int(c) for c, h in
      |                 zip(pdf['cluster'], pdf['h3'])}
      |    return GraftGeoscanScorer(tiles, precision, personalized)
      |""".stripMargin

  /** The shipped loader module — kept here (not a resource file) so the
    * Scala scorer and its Python twin live one screen apart and drift is
    * a code-review diff, not an artifact surprise. */
  private[tracking] val loaderModule: String =
    """# graft_bloom_scorer: mlflow.pyfunc loader module for the graft bloom
      |# anomaly scorer. Pure-stdlib twin of graft.score.Blooms.score:
      |#  - Spark BloomFilter V1 wire format (big-endian: int version, int
      |#    numHashFunctions, int numWords, long[numWords])
      |#  - Murmur3_x86_32 membership (h1 + i*h2 double hashing, 32-bit
      |#    signed arithmetic, sign-extended tail bytes)
      |#  - graft.geo.GeoCell cell ids (aperture-4 grid, uppercase hex)
      |# Contract: _load_pyfunc(data_path) -> model; model.predict(pdf) with
      |# columns (user, latitude, longitude) appends anomaly 0/1.
      |import math
      |import os
      |import struct
      |
      |_M = 0xFFFFFFFF
      |
      |
      |def _mix_h1(h1, k1):
      |    k1 = (k1 * 0xCC9E2D51) & _M
      |    k1 = ((k1 << 15) | (k1 >> 17)) & _M
      |    k1 = (k1 * 0x1B873593) & _M
      |    h1 ^= k1
      |    h1 = ((h1 << 13) | (h1 >> 19)) & _M
      |    return (h1 * 5 + 0xE6546B64) & _M
      |
      |
      |def _murmur3_32(data, seed):
      |    # Spark Murmur3_x86_32.hashUnsafeBytes: 4-byte little-endian
      |    # words, then tail bytes one at a time SIGN-EXTENDED (Java byte)
      |    h1 = seed & _M
      |    n = len(data) - len(data) % 4
      |    for i in range(0, n, 4):
      |        h1 = _mix_h1(h1, int.from_bytes(data[i:i + 4], 'little'))
      |    for i in range(n, len(data)):
      |        b = data[i] - 256 if data[i] > 127 else data[i]
      |        h1 = _mix_h1(h1, b & _M)
      |    h1 ^= len(data)
      |    h1 ^= h1 >> 16
      |    h1 = (h1 * 0x85EBCA6B) & _M
      |    h1 ^= h1 >> 13
      |    h1 = (h1 * 0xC2B2AE35) & _M
      |    h1 ^= h1 >> 16
      |    return h1
      |
      |
      |def _signed32(x):
      |    return x - 0x100000000 if x >= 0x80000000 else x
      |
      |
      |class _Bloom:
      |    # Spark BloomFilter wire formats:
      |    #  V1: int version, int k,            int numWords, long[numWords]
      |    #  V2: int version, int k, int seed,  int numWords, long[numWords]
      |    def __init__(self, raw):
      |        self.version, self.k = struct.unpack_from('>ii', raw, 0)
      |        if self.version == 1:
      |            self.seed, off = 0, 8
      |        elif self.version == 2:
      |            (self.seed,), off = struct.unpack_from('>i', raw, 8), 12
      |        else:
      |            raise ValueError(
      |                'unsupported Spark BloomFilter version %d' % self.version)
      |        (num_words,) = struct.unpack_from('>i', raw, off)
      |        self.words = struct.unpack_from('>%dq' % num_words, raw, off + 4)
      |        self.bit_size = num_words * 64
      |
      |    def _get(self, idx):
      |        return (self.words[idx >> 6] >> (idx & 63)) & 1
      |
      |    def might_contain(self, s):
      |        data = s.encode('utf-8')
      |        h1 = _murmur3_32(data, self.seed)
      |        h2 = _murmur3_32(data, h1)
      |        if self.version == 1:
      |            # int arithmetic: combined = h1 + i*h2, ~ when negative
      |            for i in range(1, self.k + 1):
      |                ch = (h1 + i * h2) & _M
      |                if ch >= 0x80000000:
      |                    ch = (~(ch - 0x100000000)) & _M
      |                if not self._get(ch % self.bit_size):
      |                    return False
      |            return True
      |        # V2: LONG arithmetic — combined starts hi * Integer.MAX_VALUE
      |        # and accumulates lo per probe (no 64-bit overflow possible)
      |        combined = _signed32(h1) * 2147483647
      |        lo = _signed32(h2)
      |        for _ in range(self.k):
      |            combined += lo
      |            idx = (~combined if combined < 0 else combined) % self.bit_size
      |            if not self._get(idx):
      |                return False
      |        return True
      |
      |
      |def _cell_id(lat, lng, res):
      |    # graft.geo.GeoCell.cellId: 180/2^(res+8) degree squares,
      |    # "%X%07X%07X" % (res, latIndex, lngIndex)
      |    if lat is None or lng is None or math.isnan(lat) or math.isnan(lng):
      |        return None
      |    step = 180.0 / float(1 << (res + 8))
      |    rows = 1 << (res + 8)
      |    cols = 1 << (res + 9)
      |    i = int(math.floor((lat + 90.0) / step))
      |    i = min(max(i, 0), rows - 1)
      |    j = int(math.floor((lng + 180.0) / step)) % cols
      |    return '%X%07X%07X' % (res, i, j)
      |
      |
      |class GraftBloomScorer:
      |    def __init__(self, blooms, precision):
      |        self._blooms = blooms
      |        self._precision = precision
      |
      |    def predict(self, df):
      |        def row_anomaly(row):
      |            cell = _cell_id(row['latitude'], row['longitude'], self._precision)
      |            if cell is None:
      |                return 1
      |            bf = self._blooms.get(str(row['user']))
      |            if bf is None:
      |                return 1
      |            return 0 if bf.might_contain(cell) else 1
      |        out = df.copy()
      |        out['anomaly'] = df.apply(row_anomaly, axis=1)
      |        return out
      |
      |
      |def _load_pyfunc(data_path):
      |    import pandas as pd
      |    blooms_dir = os.path.join(data_path, 'blooms.parquet')
      |    pdf = pd.read_parquet(blooms_dir)
      |    blooms = {str(u): _Bloom(bytes(b))
      |              for u, b in zip(pdf['user'], pdf['bloom'])}
      |    precision = 10
      |    with open(os.path.join(data_path, 'params.txt')) as fh:
      |        for line in fh:
      |            k, _, v = line.strip().partition('=')
      |            if k == 'precision':
      |                precision = int(v)
      |    return GraftBloomScorer(blooms, precision)
      |""".stripMargin
}
