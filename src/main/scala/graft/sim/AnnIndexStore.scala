package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted-IVF index lifecycle — the faiss `write_index`/`read_index`
  * contract for the Spark-side ANN family: an index DIRECTORY holding the
  * coarse quantizer (centroids), the inverted-list assignments, and a
  * params sidecar, so a search session probes a PREBUILT index instead of
  * refitting k-means per query batch (the S6 model save/load convention,
  * `cluster/Geoscan.scala:298-325`, applied to the retrieval tier).
  *
  * Layout under `base`:
  *  - `centroids/`   parquet (list_id INT, centroid ARRAY<DOUBLE>)
  *  - `assignments/` parquet (corpus_id, list_id) — one row per corpus
  *    vector, lists disjoint by construction
  *  - `params.json`  {nlist, nprobe_default, dims, seed} — the sidecar
  *    makes the directory self-describing, like ML writer params
  *
  * Scale shape: `save` is one k-means fit (sample-bounded upstream if the
  * caller passes a sample) plus ONE map-side assignment pass over the
  * corpus; `probe` collects only the nlist centroid rows to the driver
  * (driver-trivial planning state, like [[graft.operators.DataSkipping]]
  * manifests), broadcasts them, and the candidate join exchanges ids
  * only. Searches across sessions reuse the index with zero fit cost. */
object AnnIndexStore {

  private def dist2(v: Seq[Float], c: Seq[Double]): Double = {
    var s = 0.0; var i = 0
    val n = math.min(v.length, c.length)
    while (i < n) { val d = v(i) - c(i); s += d * d; i += 1 }
    s
  }

  /** Fit nlist centroids over `corpus` (seeded MLlib KMeans — same fit as
    * `Similarity.ivfCandidates`) and persist the full index directory. */
  def save(spark: SparkSession, base: String, corpus: DataFrame, nlist: Int,
           seed: Long = 42L, idCol: String = "vec_id",
           vecCol: String = "embedding"): Unit = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.linalg.Vectors
    import spark.implicits._
    val toVec = udf((a: Seq[Float]) => Vectors.dense(a.map(_.toDouble).toArray))
    val km = new KMeans().setK(nlist).setSeed(seed).setMaxIter(10)
      .fit(corpus.select(toVec(col(vecCol)).as("features")))
    val centroids = km.clusterCenters.map(_.toArray)
    val dims = centroids.headOption.map(_.length).getOrElse(0)
    centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("list_id", "centroid")
      .repartition(1) // nlist rows — one file keeps the load path a single read
      .write.mode("overwrite").parquet(s"$base/centroids")
    val bc = spark.sparkContext.broadcast(centroids)
    val assignUdf = udf { (v: Seq[Float]) =>
      bc.value.indices.minBy(i => dist2(v, bc.value(i).toSeq))
    }
    corpus.select(col(idCol).as("corpus_id"), assignUdf(col(vecCol)).as("list_id"))
      .write.mode("overwrite").parquet(s"$base/assignments")
    val params = s"""{"nlist":$nlist,"dims":$dims,"seed":$seed}"""
    val p = new org.apache.hadoop.fs.Path(s"$base/params.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(params.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** The persisted params sidecar, parsed. */
  def params(spark: SparkSession, base: String): Map[String, Long] = {
    val p = new org.apache.hadoop.fs.Path(s"$base/params.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val buf = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
    val in = fs.open(p)
    try in.readFully(buf) finally in.close()
    val s = new String(buf, java.nio.charset.StandardCharsets.UTF_8)
    "\"(\\w+)\":(\\d+)".r.findAllMatchIn(s)
      .map(m => m.group(1) -> m.group(2).toLong).toMap
  }

  /** Candidate pairs for `queries` against the PERSISTED index: probe the
    * `nprobe` nearest inverted lists per query (centroids read back from
    * the index, never refit) and join ids against the persisted
    * assignments. Same (query_id, corpus_id) contract as
    * `Similarity.ivfCandidates`, so `Similarity.rankCandidates` ranks the
    * output unchanged. */
  def probe(spark: SparkSession, base: String, queries: DataFrame, nprobe: Int,
            idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val centroids = spark.read.parquet(s"$base/centroids")
      .select(col("list_id"), col("centroid"))
      .collect()
      .sortBy(_.getInt(0))
      .map(_.getSeq[Double](1))
    require(centroids.nonEmpty, s"probe: no centroids under $base")
    val bc = spark.sparkContext.broadcast(centroids)
    val probeUdf = udf { (v: Seq[Float]) =>
      bc.value.indices.sortBy(i => dist2(v, bc.value(i))).take(nprobe)
    }
    val q = queries.select(col(idCol).as("query_id"),
      explode(probeUdf(col(vecCol))).as("list_id"))
    q.join(spark.read.parquet(s"$base/assignments"), Seq("list_id"))
      .where(col("query_id") =!= col("corpus_id"))
      .select("query_id", "corpus_id")
  }
}
