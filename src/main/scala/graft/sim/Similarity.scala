package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`) — BASELINE.json
  * north-star: brute-force cosine top-k as the exactness baseline, and a
  * random-hyperplane LSH bucketed variant as the 100 TB scale path.
  *
  * Scale design: brute force is a partitioned crossJoin (each corpus
  * partition streams past broadcast queries — no shuffle of the corpus);
  * LSH replaces the crossJoin with an equi-join on signature buckets, so
  * cost drops from O(|Q|·|C|) to O(|Q|·bucket). */
object Similarity {

  /** Embedding dot product in double, left-to-right — a native codegen
    * expression ([[graft.plans.VecDotExpression]]); the composed
    * `aggregate(zip_with(...))` HOF spelling is interpreted per row and was
    * ~10× slower on the all-pairs joins at sf0.1. */
  def vecDot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.plans.VecDotExpression(
        org.apache.spark.sql.graft.ColumnBridge.expression(a),
        org.apache.spark.sql.graft.ColumnBridge.expression(b)))

  /** Euclidean norm ‖a‖ = sqrt(a·a). Precompute this per ROW before a
    * pairwise join: the norm is a function of one vector, so computing it
    * inside the pair predicate wastes 2/3 of the per-pair work. */
  def vecNorm(a: Column): Column = sqrt(vecDot(a, a))

  /** Cosine similarity of two float-array columns, computed in double,
    * left-to-right — matches DuckDB's list_cosine_similarity numerics. */
  def cosine(a: Column, b: Column): Column =
    vecDot(a, b) / (vecNorm(a) * vecNorm(b))

  /** Cosine scaled to an integer key (×10^4 by default): float-equality-free
    * ranking and cross-engine comparison (two engines' `round(double, n)`
    * can emit different bit patterns for the same printed value). */
  def cosineKey(a: Column, b: Column, scale: Int = 10000): Column =
    round(cosine(a, b) * scale).cast("long")

  /** [[cosineKey]] with the per-side norms already materialized (same
    * bits: `sqrt(a·a) * sqrt(b·b)` is computed from the same doubles either
    * way — only the place it's computed moves off the per-pair hot path). */
  def cosineKeyWithNorms(a: Column, b: Column, na: Column, nb: Column,
                         scale: Int = 10000): Column =
    round(vecDot(a, b) / (na * nb) * scale).cast("long")

  /** Exact top-k nearest corpus vectors per query by cosine. Ranking key is
    * (integer-scaled cosine desc, corpus id asc) so results are
    * deterministic even under floating-point ties. Queries are broadcast
    * (assumed ≪ corpus).
    *
    * ID-SPACE CONTRACT (every ANN entry point here: brute/LSH/IVF/PQ):
    * queries and corpus draw ids from ONE namespace, and `query_id ==
    * corpus_id` means "the same vector" — self-pairs are excluded so a
    * query searched against a corpus containing it doesn't return itself.
    * Two unrelated tables with coincidentally overlapping ids would have
    * true neighbors silently excluded: re-key one side first. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      vecNorm(col(vecCol)).as("qn"))
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"),
      vecNorm(col(vecCol)).as("cn"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("corpus_id"))
      .withColumn("cos_x1e4",
        cosineKeyWithNorms(col("qv"), col("cv"), col("qn"), col("cn")))
    val w = Window.partitionBy("query_id").orderBy(col("cos_x1e4").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "corpus_id", "cos_x1e4", "rank")
  }

  /** Deterministic random hyperplane for (seed, bit, dim): uniform in
    * [-1, 1) from a splitmix64-scrambled index — no RNG state, executors
    * regenerate identical planes. */
  private def hyperplane(seed: Long, bit: Int, dims: Int): Array[Double] = {
    Array.tabulate(dims) { d =>
      var z = seed + 0x9e3779b97f4a7c15L * (bit.toLong * 1048573L + d + 1L)
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^= z >>> 31
      (z >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
    }
  }

  /** Sign-random-projection signature (`numBits`-bit int) for LSH
    * bucketing: sign pattern of the vector against fixed hyperplanes.
    * Similar vectors (small angle) agree on most signs. */
  def srpSignature(vec: Column, dims: Int, numBits: Int = 16, seed: Long = 42L): Column = {
    val planes = (0 until numBits).map(b => hyperplane(seed, b, dims))
    val sigUdf = udf { (v: Seq[Float]) =>
      var sig = 0
      var b = 0
      while (b < numBits) {
        val p = planes(b)
        var dot = 0.0
        var d = 0
        val n = math.min(v.length, dims)
        while (d < n) { dot += v(d) * p(d); d += 1 }
        if (dot >= 0) sig |= (1 << b)
        b += 1
      }
      sig
    }
    sigUdf(vec)
  }

  /** Exact cosine ranking of an explicit candidate-pair set
    * (query_id, corpus_id): top-k per query with a deterministic tie-break
    * (cosine key desc, corpus id asc). Shared scoring tail of
    * [[lshTopK]]/[[ivfTopK]], and the replay path for a PERSISTED candidate
    * set (the driver oracle re-ranks the same parquet in DuckDB).
    *
    * Scale: the candidate table is 2 narrow id columns — queries broadcast,
    * and the corpus's wide embedding column is shuffled once, against the
    * candidate ids, instead of `numBands`× through the band-bucket
    * exchange. */
  def rankCandidates(cands: DataFrame, queries: DataFrame, corpus: DataFrame,
                     k: Int, idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      vecNorm(col(vecCol)).as("qn"))
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"),
      vecNorm(col(vecCol)).as("cn"))
    val scored = cands.join(broadcast(q), "query_id").join(c, "corpus_id")
      .withColumn("cos_x1e4",
        cosineKeyWithNorms(col("qv"), col("cv"), col("qn"), col("cn")))
    val w = Window.partitionBy("query_id").orderBy(col("cos_x1e4").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "corpus_id", "cos_x1e4", "rank")
  }

  /** LSH candidate pairs: (query_id, corpus_id) sharing at least one band
    * of the SRP signature (multi-probe via `numBands` disjoint bit-bands).
    * Ids only — the band-bucket exchange never carries the embedding. */
  def lshCandidates(queries: DataFrame, corpus: DataFrame, dims: Int,
                    numBits: Int = 16, numBands: Int = 4, seed: Long = 42L,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // a non-divisible split would silently never consult the high
    // numBits % numBands bits (recall quietly differs from the configured
    // signature); ≥ 31 bits would overflow the int signature's sign bit
    require(numBits >= 1 && numBits <= 30, s"numBits must be in [1, 30], got $numBits")
    require(numBands >= 1 && numBits % numBands == 0,
      s"numBits ($numBits) must divide evenly into numBands ($numBands) — " +
        "a remainder would silently drop the high signature bits")
    val bandBits = numBits / numBands
    val mask = (1 << bandBits) - 1
    // all band keys from ONE signature evaluation per side (posexplode) —
    // a per-band union re-runs the scan + signature UDF once per band
    def bands(df: DataFrame, side: String): DataFrame =
      df.select(col(idCol).as(side),
          srpSignature(col(vecCol), dims, numBits, seed).as("sig"))
        .select(col(side), posexplode(array((0 until numBands).map(b =>
          shiftright(col("sig"), b * bandBits).bitwiseAND(lit(mask))): _*))
          .as(Seq("band_idx", "band_val")))
    bands(queries, "query_id").join(bands(corpus, "corpus_id"), Seq("band_idx", "band_val"))
      .where(col("query_id") =!= col("corpus_id"))
      .select("query_id", "corpus_id").distinct()
  }

  /** LSH-bucketed approximate top-k: [[lshCandidates]] then exact cosine
    * ranking within candidates ([[rankCandidates]]). Recall < 1 by
    * construction; measured in SimilaritySpec against [[bruteForceTopK]]. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, dims: Int,
              numBits: Int = 16, numBands: Int = 4, seed: Long = 42L,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    rankCandidates(
      lshCandidates(queries, corpus, dims, numBits, numBands, seed, idCol, vecCol),
      queries, corpus, k, idCol, vecCol)

  /** IVF (inverted-file) approximate top-k — the other classic ANN scale
    * path: a k-means coarse quantizer partitions the corpus into `nlist`
    * inverted lists; each query probes its `nprobe` nearest centroids and
    * ranks by exact cosine only within those lists. Cost drops from
    * O(|Q|·|C|) to ≈ O(|Q|·|C|·nprobe/nlist); centroids are tiny and
    * broadcast. Uses MLlib KMeans (itself a Spark-native Lloyd's). */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nlist: Int = 16, nprobe: Int = 4, seed: Long = 42L,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    rankCandidates(
      ivfCandidates(queries, corpus, nlist, nprobe, seed, idCol, vecCol),
      queries, corpus, k, idCol, vecCol)

  /** IVF candidate pairs: the corpus vector's inverted list is among the
    * query's `nprobe` probed lists. Ids only; lists are disjoint (each
    * corpus vector sits in exactly one), so the pairs are distinct by
    * construction — no dedup shuffle needed. */
  def ivfCandidates(queries: DataFrame, corpus: DataFrame,
                    nlist: Int = 16, nprobe: Int = 4, seed: Long = 42L,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.linalg.Vectors
    val spark = corpus.sparkSession

    val toVec = udf((a: Seq[Float]) => Vectors.dense(a.map(_.toDouble).toArray))
    val train = corpus.select(toVec(col(vecCol)).as("features"))
    val km = new KMeans().setK(nlist).setSeed(seed).setMaxIter(10).fit(train)
    val centroids = km.clusterCenters.map(_.toArray)
    val bc = spark.sparkContext.broadcast(centroids)

    def dist2(v: Seq[Float], c: Array[Double]): Double = {
      var s = 0.0; var i = 0
      val n = math.min(v.length, c.length)
      while (i < n) { val d = v(i) - c(i); s += d * d; i += 1 }
      s
    }
    val assignUdf = udf { (v: Seq[Float]) =>
      bc.value.indices.minBy(i => dist2(v, bc.value(i)))
    }
    val probeUdf = udf { (v: Seq[Float]) =>
      bc.value.indices.sortBy(i => dist2(v, bc.value(i))).take(nprobe)
    }

    val c = corpus.select(col(idCol).as("corpus_id"), assignUdf(col(vecCol)).as("list_id"))
    val q = queries.select(col(idCol).as("query_id"),
      explode(probeUdf(col(vecCol))).as("list_id"))
    q.join(c, Seq("list_id"))
      .where(col("query_id") =!= col("corpus_id"))
      .select("query_id", "corpus_id")
  }

  /** K-means cluster assignment of every vector — the SemDeDup partition
    * step: fit `nlist` centroids on a BOUNDED md5-priority sample
    * (driver-side deterministic Lloyd, the [[pqCodebooks]] pattern — the
    * partitioning is a blocking heuristic, its quality doesn't need a
    * full-corpus fit), then assign each embedding to its nearest via one
    * broadcast. Only the assignment pass touches every row — one map-side
    * projection, no iterative full-corpus jobs, the shape that holds at
    * 100 TB. Returns (idCol, cluster). */
  def kmeansAssign(df: DataFrame, nlist: Int = 16, seed: Long = 42L,
                   idCol: String = "vec_id", vecCol: String = "embedding",
                   sampleCap: Int = 2048): DataFrame = {
    val spark = df.sparkSession
    val sample = df
      .withColumn("pri", graft.text.TextFunctions.md5Bucket60(
        concat(lit("km|"), col(idCol).cast("string"))))
      .orderBy(col("pri"), col(idCol)).limit(sampleCap)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val bc = spark.sparkContext.broadcast(
      lloyd(sample, nlist, iters = 10, seed = seed))
    def dist2(v: Seq[Float], c: Array[Double]): Double = {
      var s = 0.0; var i = 0
      val n = math.min(v.length, c.length)
      while (i < n) { val d = v(i) - c(i); s += d * d; i += 1 }
      s
    }
    val assignUdf = udf { (v: Seq[Float]) =>
      bc.value.indices.minBy(i => dist2(v, bc.value(i)))
    }
    df.select(col(idCol), assignUdf(col(vecCol)).as("cluster"))
  }

  /** Int8 max-abs quantization of an embedding column — the storage
    * compression step of an embedding pipeline (4× smaller than float32,
    * reconstruction error ≤ scale/2 per dimension): per-vector
    * scale = max|v|/127, code = round(v / max|v| · 127) ∈ [−127, 127].
    * Map-side only — a pure projection, no shuffle at any scale. Both
    * engines round half-away-from-zero, so codes replay exactly;
    * `scale_key` is the µ-scaled integer spelling of max|v|. */
  def quantizeInt8(df: DataFrame, idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame = {
    val mx = greatest(array_max(transform(col(vecCol), v => abs(v.cast("double")))), lit(1e-12))
    df.select(col(idCol),
      round(mx * 1e6).cast("long").as("scale_key"),
      transform(col(vecCol), v => round(v.cast("double") / mx * 127).cast("int")).as("codes"))
  }

  /** Per-label embedding centroid, one row per (label, dim):
    * `centroid_key` = the mean×10^6 as an integer (cross-engine-comparable).
    *
    * The per-dimension sum runs in DECIMAL — exact and associative, so the
    * result is independent of partition/merge order (a double sum's value
    * would drift with the physical plan) and replayable in any engine.
    * Scale: posexplode fans rows ×dims, but partial (map-side) aggregation
    * bounds the shuffle at |labels|×dims rows. */
  def centroids(df: DataFrame, labelCol: String = "label",
                vecCol: String = "embedding"): DataFrame =
    df.select(col(labelCol).as("label"), posexplode(col(vecCol)).as(Seq("dim", "v")))
      .groupBy(col("label"), col("dim"))
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast("double").cast("decimal(27,9)")).as("s"))
      .select(col("label"), col("dim").cast("long").as("dim"), col("n"),
        round(col("s").cast("double") / col("n") * 1e6).cast("long").as("centroid_key"))

  /** EXACT within-block cosine near-dup pairs — the verification twin of
    * [[cosineNearDups]]. O(block²) BY CONSTRUCTION: the block equi-join
    * materializes every in-block pair, so one hot block dominates the whole
    * job at scale. GUARDED: refuses to run when any block exceeds
    * `maxBlockRows` (the extra guard pass is one count-per-block agg) —
    * corpora past the cap go through [[cosineNearDups]], whose band-bucket
    * join never goes all-pairs. */
  def exactCosinePairs(df: DataFrame, blockCol: String, minCosX1e4: Long,
                       maxBlockRows: Long = 10000L,
                       idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val worst = df.groupBy(col(blockCol)).count()
      .agg(coalesce(max("count"), lit(0L)).as("m")).head.getLong(0)
    require(worst <= maxBlockRows,
      s"exactCosinePairs: largest '$blockCol' block has $worst rows (cap $maxBlockRows); " +
        "the exact all-pairs spelling is O(block²) — use Similarity.cosineNearDups (LSH) at this scale")
    val a = df.select(col(blockCol), col(idCol).as("id_a"), col(vecCol).as("v_a"),
      vecNorm(col(vecCol)).as("n_a"))
    val b = df.select(col(blockCol), col(idCol).as("id_b"), col(vecCol).as("v_b"),
      vecNorm(col(vecCol)).as("n_b"))
    a.join(b, Seq(blockCol))
      .where(col("id_a") < col("id_b"))
      .withColumn("cos_x1e4",
        cosineKeyWithNorms(col("v_a"), col("v_b"), col("n_a"), col("n_b")))
      .where(col("cos_x1e4") >= minCosX1e4)
      .select(col(blockCol), col("id_a"), col("id_b"), col("cos_x1e4"))
  }

  // ---- Product quantization (PQ) + asymmetric distance computation ----
  //
  // The third classic ANN scale path (after SRP-LSH and IVF): compress each
  // vector to `m` one-byte codes (one per contiguous subspace) against per-
  // subspace codebooks, then answer queries by table lookup — the query
  // builds an m×k lookup table of exact subspace distances ONCE, and every
  // corpus vector's approximate distance is just m additions. At 100 TB the
  // wins compound: the corpus shrinks ~32× (64 float dims → 8 bytes), the
  // scan never touches a float, and the LUT join broadcasts (|Q|·m·k rows).

  /** Deterministic driver-side Lloyd iterations: seeded scrambled init,
    * ties break to the lowest centroid index, empty clusters keep their
    * previous centroid — same inputs, same codebook, every run. */
  private[graft] def lloyd(pts: Array[Array[Double]], k: Int, iters: Int,
                           seed: Long): Array[Array[Double]] = {
    require(pts.nonEmpty, "lloyd: empty training sample")
    val dims = pts(0).length
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < dims) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    // init: first k distinct points in splitmix64-scrambled index order
    val order = pts.indices.sortBy { i =>
      var z = seed + 0x9e3779b97f4a7c15L * (i + 1L)
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val init = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    val seen = scala.collection.mutable.HashSet.empty[Seq[Double]]
    order.iterator.map(pts).foreach { p =>
      if (init.size < k && seen.add(p.toSeq)) init += p
    }
    while (init.size < k) init += init(init.size % math.max(init.size, 1)) // degenerate corpora: duplicate
    var cents = init.toArray.map(_.clone())
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k)(new Array[Double](dims))
      val counts = new Array[Long](k)
      pts.foreach { p =>
        var best = 0; var bestD = d2(p, cents(0)); var c = 1
        while (c < k) {
          val d = d2(p, cents(c))
          if (d < bestD) { bestD = d; best = c } // strict: ties keep lowest
          c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < dims) { sums(best)(i) += p(i); i += 1 }
      }
      cents = Array.tabulate(k) { c =>
        if (counts(c) == 0) cents(c)
        else Array.tabulate(dims)(i => sums(c)(i) / counts(c))
      }
      it += 1
    }
    cents
  }

  /** Per-subspace PQ codebooks — `books(sub)(code)(dim)` — fit driver-side
    * on a bounded md5-priority sample (replayable; the faiss pattern:
    * codebook training reads a sample, only encode/ADC touch every row). */
  def pqCodebooks(corpus: DataFrame, m: Int, k: Int, dims: Int,
                  seed: Long = 42L, sampleCap: Int = 2048,
                  idCol: String = "vec_id", vecCol: String = "embedding"): Array[Array[Array[Double]]] = {
    require(dims % m == 0, s"pqCodebooks: dims=$dims not divisible by m=$m")
    val sub = dims / m
    val sample = corpus
      .withColumn("pri", graft.text.TextFunctions.md5Bucket60(
        concat(lit("pq|"), col(idCol).cast("string"))))
      .orderBy(col("pri"), col(idCol)).limit(sampleCap)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).toArray)
    Array.tabulate(m) { mi =>
      val slice = sample.map(v => Array.tabulate(sub)(d => v(mi * sub + d).toDouble))
      lloyd(slice, k, iters = 10, seed = seed + mi)
    }
  }

  /** PQ encode: `(idCol, codes ARRAY<INT>)` — per subspace, the index of
    * the nearest codebook centroid (ties to the lowest code). A pure
    * projection against broadcast codebooks: map-side, no shuffle. */
  def pqEncode(df: DataFrame, books: Array[Array[Array[Double]]],
               idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(books)
    val m = books.length
    val sub = books(0)(0).length
    val encodeUdf = udf { (v: Seq[Float]) =>
      // short-vector guard (schema drift / truncated ingest): missing
      // dims read as 0 — the same tolerance srpSignature and kmeansAssign
      // apply — instead of an IndexOutOfBounds that aborts the job
      def at(i: Int): Double = if (i < v.length) v(i).toDouble else 0.0
      Array.tabulate(m) { mi =>
        val cents = bc.value(mi)
        var best = 0; var bestD = Double.MaxValue; var c = 0
        while (c < cents.length) {
          var s = 0.0; var d = 0
          while (d < sub) { val x = at(mi * sub + d) - cents(c)(d); s += x * x; d += 1 }
          if (s < bestD) { bestD = s; best = c }
          c += 1
        }
        best
      }
    }
    df.select(col(idCol), encodeUdf(col(vecCol)).as("codes"))
  }

  /** Per-query ADC lookup table: `(query_id, sub, code, dist_key)` — the
    * EXACT squared distance from the query's subvector to every codebook
    * centroid, as a µ-scaled integer (deterministic, associative sums).
    * |Q|·m·k rows — tiny, broadcast into the ADC join. */
  def pqLut(queries: DataFrame, books: Array[Array[Array[Double]]],
            idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = queries.sparkSession
    val bc = spark.sparkContext.broadcast(books)
    val m = books.length
    val sub = books(0)(0).length
    val lutUdf = udf { (v: Seq[Float]) =>
      // same short-vector tolerance as pqEncode: missing dims read as 0
      def at(i: Int): Double = if (i < v.length) v(i).toDouble else 0.0
      for { mi <- 0 until m; c <- bc.value(mi).indices } yield {
        var s = 0.0; var d = 0
        while (d < sub) { val x = at(mi * sub + d) - bc.value(mi)(c)(d); s += x * x; d += 1 }
        (mi, c, math.round(s * 1e6))
      }
    }
    queries.select(col(idCol).as("query_id"), explode(lutUdf(col(vecCol))).as("e"))
      .select(col("query_id"), col("e._1").as("sub"), col("e._2").as("code"),
        col("e._3").as("dist_key"))
  }

  /** ADC top-k: explode codes positionally, equi-join the broadcast LUT on
    * (sub, code), sum the m integer partials per (query, corpus) pair, rank
    * ascending. The corpus side ships only ids + byte codes; Spark 4's
    * WindowGroupLimit prunes rank ≤ k map-side. */
  def pqTopK(codes: DataFrame, lut: DataFrame, k: Int): DataFrame = {
    val ex = codes.select(col("vec_id").as("corpus_id"),
      posexplode(col("codes")).as(Seq("sub", "code")))
    val scored = ex.join(broadcast(lut), Seq("sub", "code"))
      .where(col("query_id") =!= col("corpus_id"))
      .groupBy(col("query_id"), col("corpus_id"))
      .agg(sum(col("dist_key")).as("adc_key"))
    rankAdc(scored, k)
  }

  /** ADC top-k restricted to an explicit candidate-pair set — the IVFPQ
    * composition (coarse quantizer supplies `cands`, PQ codes supply the
    * distance): only candidate corpus rows' codes are exploded and joined,
    * so the scan cost is O(|cands|·m) instead of O(|C|·m·|Q|). At 100 TB
    * this is THE ANN shape: nprobe/nlist of the corpus touched, nothing
    * but ids, codes, and integer partials in the shuffle. */
  def pqTopKWithin(cands: DataFrame, codes: DataFrame, lut: DataFrame, k: Int): DataFrame = {
    val ex = codes.select(col("vec_id").as("corpus_id"),
      posexplode(col("codes")).as(Seq("sub", "code")))
    val scored = cands.join(ex, Seq("corpus_id"))
      .join(broadcast(lut), Seq("query_id", "sub", "code"))
      .groupBy(col("query_id"), col("corpus_id"))
      .agg(sum(col("dist_key")).as("adc_key"))
    rankAdc(scored, k)
  }

  private def rankAdc(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id").orderBy(col("adc_key").asc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("query_id", "corpus_id", "adc_key", "rank")
  }

  /** Embedding-cosine near-duplicate pairs (vec_id_a < vec_id_b) above
    * `threshold`, via LSH candidate generation + exact verify.
    *
    * Shuffle shape (the [[lshCandidates]] design): the band-bucket
    * exchange and the candidate distinct carry IDS ONLY — the wide
    * embedding column joins back once against the distinct pairs. The
    * earlier spelling hauled both full vectors through the ×numBands band
    * fan-out AND keyed the distinct on the arrays themselves (~KBs per
    * row at 100 TB vs two longs). */
  def cosineNearDups(df: DataFrame, dims: Int, threshold: Double,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     numBits: Int = 16, numBands: Int = 4): DataFrame = {
    val bandBits = numBits / numBands
    val mask = (1 << bandBits) - 1
    // one scan + one signature evaluation, band keys posexploded, ids only
    val banded = df.select(col(idCol).as("id"),
        srpSignature(col(vecCol), dims, numBits).as("sig"))
      .select(col("id"),
        posexplode(array((0 until numBands).map(b =>
          shiftright(col("sig"), b * bandBits).bitwiseAND(lit(mask))): _*))
          .as(Seq("band_idx", "band_val")))
    val cands = banded.toDF("id_a", "band_idx", "band_val")
      .join(banded.toDF("id_b", "band_idx", "band_val"), Seq("band_idx", "band_val"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val sides = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      vecNorm(col(vecCol)).as("nrm"))
    cands
      .join(sides.toDF("id_a", "v_a", "n_a"), "id_a")
      .join(sides.toDF("id_b", "v_b", "n_b"), "id_b")
      .withColumn("cos_x1e4",
        cosineKeyWithNorms(col("v_a"), col("v_b"), col("n_a"), col("n_b")))
      .where(col("cos_x1e4") >= math.round(threshold * 10000))
      .select("id_a", "id_b", "cos_x1e4")
  }
}
