package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.Dedup
import graft.multimodal.Multimodal
import graft.sim.Similarity
import graft.streaming.TileStore
import graft.text.TextFunctions

/** LLM-training-data-pipeline operators (BASELINE.json north-star) as
  * driver-checkable queries over `documents` / `embeddings` / `events`:
  * text analysis, dedup family, similarity search, multimodal plumbing,
  * TTL windows. Hashes are md5-based so DuckDB replays them exactly. */
object ExtensionQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.table(s, dir, n)

  import Tables.{scratch, scratchPat}
  private val q40CandPat = scratchPat("q40_cands")
  private val q43CandPat = scratchPat("q43_cands")
  private val q111OrcPat = scratchPat("q111_orc")
  private val q122PtsPat = scratchPat("q122_pts")
  private val q134ZPat = scratchPat("q134_zpts")
  private val q135AsgPat = scratchPat("q135_asg")
  private val q67PngPat = scratchPat("q67_png")
  private val q140HashPat = scratchPat("q140_ahash")
  private val q148V1Pat = scratchPat("q148_v1")
  private val q148V2Pat = scratchPat("q148_v2")

  /** The q122 lookup cell: a fixed in-bbox point's cell at res 10 —
    * deterministic, shared by the query and its oracle literal. */
  private val Q122Cell: String = graft.geo.GeoCell.cellId(40.73, -73.99, 10)

  /** MinHash candidate pairs at the default (8 hashes, 2-row bands,
    * 3-shingles) parameters, persisted once per (session, sf dir) — q35
    * emits them and q57 builds components over them; recomputing the
    * shingle→minhash→band pass per query measured ~3.5 s of pure repeat
    * work at sf0.1 (txCache precedent in PipelineQueries). */
  /** Session-scoped persisted-frame cache (the q35/q57 minhash pattern,
    * generalized): keyed by (frame name, session, sf dir), revalidated
    * against the source parquets' length+mtime signature so a refreshed
    * testdata dir can't serve stale results within a live session, and the
    * evicted frame is unpersisted so long sessions don't accumulate
    * MEMORY_AND_DISK blocks. */
  private val frameCache =
    scala.collection.concurrent.TrieMap.empty[String, (String, DataFrame)]
  private[queries] def cachedFrame(name: String, s: SparkSession, dir: String,
                          sources: Seq[String])(build: => DataFrame): DataFrame =
    // coarse lock: suites run concurrently against the shared session, and
    // an unsynchronized get-then-put would double-build and orphan one
    // persisted frame (builds are rare; serializing them is the cheap side)
    frameCache.synchronized {
      val key = name + "|" + System.identityHashCode(s).toHexString + "|" + dir
      val sig = Tables.sourceSig(s, dir, sources: _*)
      frameCache.get(key) match {
        case Some((oldSig, df))
            if oldSig == sig && !df.sparkSession.sparkContext.isStopped => df
        case evicted =>
          evicted.foreach { case (_, df) =>
            if (!df.sparkSession.sparkContext.isStopped) df.unpersist(false)
          }
          val df = build.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          df.count()
          frameCache.put(key, (sig, df))
          df
      }
    }

  /** The ONE tokenize→shingle→md5 pass — `(doc_id, bh)` — that minhash
    * signatures (q35/q57/q145), the 60-bit SimHash (q68) and the band
    * candidates all derive from; each was re-running the same explode+md5
    * over the corpus (~3 s apiece at sf0.1). `cachedFrame`'s monitor is
    * reentrant, so the nested builds below are safe. */
  private def shingleMd5(s: SparkSession, dir: String): DataFrame =
    cachedFrame("shingle_md5", s, dir, Seq("documents")) {
      Dedup.shingleMd5Frame(t(s, dir, "documents"))
    }

  /** q135's k-means block assignments, staged write-once per embeddings
    * state (sampled driver Lloyd + one broadcast-assign pass — deterministic
    * given the table, so the oracle replays over the persisted leg and the
    * timed run measures the dedup semantics, not the index build). Bench
    * pre-warms this alongside the other staged index legs. */
  private[graft] def stageQ135Assignments(s: SparkSession, dir: String): Unit =
    Tables.stageOnce(s, scratch(q135AsgPat, dir),
        Tables.sourceSig(s, dir, "embeddings")) {
      Similarity.kmeansAssign(t(s, dir, "embeddings"), nlist = 8)
        .write.mode("overwrite").parquet(scratch(q135AsgPat, dir))
    }

  /** The 8-hash MinHash signature frame, cached separately from the
    * candidates so the estimator-calibration query (q145) reuses the same
    * signature pass the candidate join consumed — recomputing it measured
    * ~4 s of pure repeat work at sf0.1. */
  private def minhashSigs(s: SparkSession, dir: String): DataFrame =
    cachedFrame("minhash_sigs", s, dir, Seq("documents")) {
      Dedup.minhashSignaturesFromHashes(shingleMd5(s, dir), numHashes = 8)
    }

  private def minhashCands(s: SparkSession, dir: String): DataFrame =
    cachedFrame("minhash_cands", s, dir, Seq("documents")) {
      // same composition as Dedup.minhashCandidates, off the shared sigs
      val bands = Dedup.lshBands(minhashSigs(s, dir), numHashes = 8, rowsPerBand = 2)
      val a = bands.toDF("band_idx", "band_val", "id_a")
      val b = bands.toDF("band_idx", "band_val", "id_b")
      a.join(b, Seq("band_idx", "band_val"))
        .where(col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct()
    }

  /** Per-cell ring densities at res 9 — (cell, n, ring_n) — shared by q108
    * (raw densities) and q109 (z-scored hotspots): the counts + ring
    * explode + equi-join pass was duplicated across both (~7 s of repeat
    * work at sf0.1, r4 plan audit). */
  private def ringDensity(s: SparkSession, dir: String): DataFrame =
    cachedFrame("ring_density", s, dir, Seq("lineitem", "orders")) {
      import s.implicits._
      val counts = Tables.points(s, dir)
        .select(graft.functions.GeoFunctions
          .geoCell($"latitude", $"longitude", 9).as("cell"))
        .groupBy($"cell").agg(count(lit(1)).as("n"))
      val ring = counts.select($"cell", $"n",
        explode(graft.functions.GeoFunctions.cellRing($"cell", 1)).as("nb"))
      ring.join(counts.select($"cell".as("nb"), $"n".as("nb_n")), Seq("nb"))
        .groupBy($"cell", $"n").agg(sum($"nb_n").as("ring_n"))
    }

  /** Weight-filtered co-purchase edge set (u < v, ≥ 2 co-occurring orders),
    * shared by q101/q127/q128 — the po⋈po self-join + HAVING dominated each
    * of the three (~8 s of repeat work at sf0.1, r4 plan audit); degrees
    * and orientation derive cheaply from this persisted frame. */
  private def copurchaseEdges(s: SparkSession, dir: String): DataFrame =
    cachedFrame("copurchase_edges", s, dir, Seq("lineitem")) {
      import s.implicits._
      val po = t(s, dir, "lineitem")
        .select($"l_orderkey".as("o"), $"l_partkey".as("p")).distinct()
      po.as("x").join(po.as("y"), "o")
        .where($"x.p" < $"y.p")
        .groupBy($"x.p".as("u"), $"y.p".as("v"))
        .agg(count(lit(1)).as("w")).where($"w" >= 2)
        .select($"u", $"v")
    }

  /** Exact-Jaccard rescore of the shared minhash candidate pairs —
    * (id_a, id_b, inter, uni, jac_micro) — shared by q145 (estimator
    * calibration: joins the signatures back on) and q224 (contrastive
    * positives: filters jac_micro): the per-doc shingle-array build and
    * the double candidate join were the dominant repeat work of both. */
  private def candJaccard(s: SparkSession, dir: String): DataFrame =
    cachedFrame("cand_jaccard", s, dir, Seq("documents")) {
      import s.implicits._
      val sh = t(s, dir, "documents")
        .select($"doc_id", Dedup.shingles($"text").as("sh"))
      minhashCands(s, dir)
        .join(sh.select($"doc_id".as("id_a"), $"sh".as("sh_a")), "id_a")
        .join(sh.select($"doc_id".as("id_b"), $"sh".as("sh_b")), "id_b")
        .withColumn("inter", size(array_intersect($"sh_a", $"sh_b")).cast("long"))
        .withColumn("uni", (size($"sh_a") + size($"sh_b")).cast("long") - $"inter")
        .selectExpr("id_a", "id_b", "inter", "uni",
          "(1000000 * inter) DIV uni AS jac_micro")
    }

  /** Symmetric co-purchase adjacency cached PRE-PARTITIONED on the join
    * key `a`, shared by q133 (pagerank) and q221 (label propagation): the
    * cached scan reports hashpartitioning(a), so each iteration's join
    * shuffles only the (small) per-node frame, never the edge list. */
  private def copurchaseAdj(s: SparkSession, dir: String): DataFrame =
    cachedFrame("copurchase_adj", s, dir, Seq("lineitem")) {
      import s.implicits._
      val raw = copurchaseEdges(s, dir)
      // partition count sized to the DATA, not the session constant
      // (guide §2.2): the iterative consumers (pagerank / label-prop /
      // k-core) re-join this frame every round, and each round's stages
      // inherit ITS partitioning — 32 partitions of a ~20k-row adjacency
      // cost hundreds of near-empty tasks per query. ~1M edge rows per
      // partition locally ≈ a few MB; the count is one cheap action on
      // the already-persisted edge cache, and at scale the quotient
      // (not the floor) governs, growing with the data.
      val parts = Tables.adaptiveParts(s, 2L * raw.count())
      raw.select($"u".as("a"), $"v".as("b"))
        .unionAll(raw.select($"v".as("a"), $"u".as("b")))
        .repartition(parts, $"a")
    }

  /** Per-doc bigram counts — (doc_id, w1, w2, k) — shared by q126 (the
    * corpus bigram LM derives from it by summing out doc_id) and q132 (the
    * per-doc LM scoring): the documents explode + split + first groupBy is
    * the dominant cost of both. */
  private def docBigramCounts(s: SparkSession, dir: String): DataFrame =
    cachedFrame("doc_bigram_counts", s, dir, Seq("documents")) {
      import s.implicits._
      // direct (w1, w2) struct pairs — same values as TextFunctions.bigrams
      // (tokens can't contain the split character) without the per-bigram
      // concat + re-split string round-trip
      t(s, dir, "documents")
        .select($"doc_id", TextFunctions.tokens(lower($"text")).as("tk"))
        .where(size($"tk") >= 2)
        .select($"doc_id", explode(expr(
          "transform(sequence(1, size(tk) - 1), i -> struct(tk[i - 1] AS w1, tk[i] AS w2))")).as("bg"))
        .select($"doc_id", $"bg.w1".as("w1"), $"bg.w2".as("w2"))
        .groupBy($"doc_id", $"w1", $"w2").agg(count(lit(1)).as("k"))
    }

  /** The q230/q233 benchmark 4-gram hash set — distinct `gh` over the
    * deterministic eval split (doc_id % 41 = 0) — shared by q230
    * (contamination measurement) and q233 (removal): both score the SAME
    * benchmark, and the eval-side extract+distinct was the one staging
    * pass q233 re-ran seconds after q230 built it (r11 plan audit). The
    * persisted frame doubles as the materialization the measured
    * broadcast-cutover in `contaminationFromGrams` counts against. */
  private def decontamEvalGrams(s: SparkSession, dir: String): DataFrame =
    cachedFrame("decontam_eval_grams", s, dir, Seq("documents")) {
      import s.implicits._
      graft.text.Decontamination.evalGrams(
        t(s, dir, "documents").where($"doc_id" % 41 === 0).select($"text"),
        textCol = "text", n = 4)
    }

  /** Degree-ordered orientation of [[copurchaseEdges]] — (a, b, db) with
    * every edge pointing from its lower-(degree, id) endpoint — shared by
    * q101 (triangles) and q127 (clustering coefficient): both wedge-join
    * off this exact frame, and the deg groupBy + two joins are worth one
    * computation, not two. */
  private def copurchaseOriented(s: SparkSession, dir: String): DataFrame =
    cachedFrame("copurchase_oriented", s, dir, Seq("lineitem")) {
      import s.implicits._
      val raw = copurchaseEdges(s, dir)
      val deg = raw.select($"u".as("n")).unionAll(raw.select($"v".as("n")))
        .groupBy($"n").agg(count(lit(1)).as("d"))
      val withDeg = raw
        .join(deg.withColumnsRenamed(Map("n" -> "u", "d" -> "du")), "u")
        .join(deg.withColumnsRenamed(Map("n" -> "v", "d" -> "dv")), "v")
      withDeg.select(
        when($"du" < $"dv" || ($"du" === $"dv" && $"u" < $"v"), $"u").otherwise($"v").as("a"),
        when($"du" < $"dv" || ($"du" === $"dv" && $"u" < $"v"), $"v").otherwise($"u").as("b"),
        when($"du" < $"dv" || ($"du" === $"dv" && $"u" < $"v"), $"dv").otherwise($"du").as("db"))
    }

  /** Bench warmup hook: materializes every shared session cache BEFORE the
    * timed loop (the q122/q134 staged-lookup precedent), so each cache
    * consumer reports its MARGINAL cost instead of the lexicographically-
    * first consumer paying the whole build (r5: q145 carried 3 cache
    * builds it merely happened to run first for). Build order follows the
    * derivation chain so nothing is built twice. */
  def prewarmSharedCaches(s: SparkSession, dir: String): Unit = {
    shingleMd5(s, dir)
    minhashSigs(s, dir)
    minhashCands(s, dir)
    candJaccard(s, dir)
    ringDensity(s, dir)
    copurchaseEdges(s, dir)
    copurchaseAdj(s, dir)
    copurchaseOriented(s, dir)
    docBigramCounts(s, dir)
    decontamEvalGrams(s, dir)
    IndexQueries.q161Shingles(s, dir)
  }

  /** q67's PNG fixture table, staged write-once: encode is a deterministic
    * function of the doc_id set, so repeat runs (and the oracle replay)
    * read the same parquet. Returns the staged path. Named so the bench
    * warmup can pre-stage it with the other index legs. */
  private[graft] def stageQ67Png(s: SparkSession, dir: String): String = {
    import s.implicits._
    val p = Tables.scratch(q67PngPat, dir)
    Tables.stageOnce(s, p, Tables.sourceSig(s, dir, "documents")) {
      t(s, dir, "documents").select($"doc_id").as[Long]
        .mapPartitions { it =>
          it.map { id =>
            (id, Multimodal.pngBytes((16 + id % 32).toInt, (16 + id % 24).toInt,
              (id * 0x9E3779B9L).toInt))
          }
        }.toDF("media_id", "content")
        .write.mode("overwrite").parquet(p)
    }
    p
  }

  /** q140's per-image aHash table, staged write-once: the PNG
    * encode+decode+hash cycle is a deterministic function of the doc_id
    * set, so repeat runs (and the oracle replay) read the same parquet.
    * Named so the bench warmup can pre-stage it with the other legs. */
  private[graft] def stageQ140Hashes(s: SparkSession, dir: String): String = {
    import s.implicits._
    val p = scratch(q140HashPat, dir)
    Tables.stageOnce(s, p, Tables.sourceSig(s, dir, "documents")) {
      t(s, dir, "documents").select($"doc_id").as[Long]
        .mapPartitions { it =>
          it.map { id =>
            val png = Multimodal.pngPattern(
              (8 * (1 + id % 6)).toInt, (8 * (1 + id % 4)).toInt, id % 12)
            (id, Multimodal.aHash(png).getOrElse(-1L))
          }
        }.toDF("media_id", "ahash")
        .write.mode("overwrite").parquet(p)
    }
    p
  }

  /** q122's real parquet lookup table, staged once per (sf dir, source
    * state) — rewriting the full points table inside every invocation was
    * ~8 s of the r4 driver bench at sf0.1. Also pre-staged by the bench
    * warmup so the timed run measures the lookup, not harness staging. */
  private[graft] def stagePointsLookup(s: SparkSession, dir: String): String = {
    val p = scratch(q122PtsPat, dir)
    Tables.stageOnce(s, p, Tables.sourceSig(s, dir, "lineitem", "orders")) {
      Tables.points(s, dir).write.mode("overwrite").parquet(p)
    }
    p
  }

  /** The ZORDER write pattern S10 approximates, end-to-end: points range-
    * partitioned + sorted by the native `z_order` Morton key at res 12, so
    * every file covers one contiguous z run and a 2-D box predicate prunes
    * whole files/row groups via min/max stats in BOTH dimensions (the Delta
    * `OPTIMIZE ZORDER` effect, `01_geofraud_clustering.py:440`, without
    * Delta). Staged write-once like q122. */
  private[graft] def stageZOrderedPoints(s: SparkSession, dir: String): String = {
    val p = scratch(q134ZPat, dir)
    Tables.stageOnce(s, p, Tables.sourceSig(s, dir, "lineitem", "orders")) {
      import s.implicits._
      Tables.points(s, dir)
        .withColumn("i", graft.functions.GeoFunctions.latIndexCol($"latitude", 12))
        .withColumn("j", graft.functions.GeoFunctions.lngIndexCol($"longitude", 12))
        .selectExpr("latitude", "longitude", "amount", "user_id", "z_order(i, j) AS z")
        .repartitionByRange(8, $"z")
        .sortWithinPartitions($"z")
        .write.mode("overwrite").parquet(p)
    }
    p
  }

  // ---- shared DuckDB SQL fragments (mirror the Scala column functions) ----

  /** lowercased whitespace tokens, empties dropped */
  private val toksSql = "list_filter(string_split(lower(text), ' '), t -> t != '')"
  private def stopHitsSql(toks: String, words: Seq[String]): String =
    s"len(list_filter($toks, t -> t IN (${words.map(w => s"'$w'").mkString(",")})))"
  /** distinct word n-gram shingles over `tk` */
  private def shinglesSqlN(n: Int): String =
    s"list_distinct(list_transform(generate_series(1, greatest(len(tk)-${n - 1}, 0)), " +
      s"i -> array_to_string(list_slice(tk, i, i+${n - 1}), ' ')))"
  private val shinglesSql = shinglesSqlN(3)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Z-order clustering key (the mechanism behind Delta OPTIMIZE ZORDER,
    // approximated in S10): grid cells → native codegen z_order(i, j)
    // Morton interleave → coarse z-range buckets. A table range-partitioned
    // and sorted by this key co-locates 2-D-near rows into the same row
    // groups, so box lookups prune in both dimensions at 100 TB.
    "q129_zorder_cluster" -> ((s, dir) => {
      import s.implicits._
      val res = 9
      // fan = false: the per-row work is codegen index math straight into
      // a partial aggregate — the exchange costs more than it saves
      val cells = Tables.points(s, dir, fan = false).select(
          graft.functions.GeoFunctions.latIndexCol($"latitude", res).as("i"),
          graft.functions.GeoFunctions.lngIndexCol($"longitude", res).as("j"))
        .groupBy($"i", $"j").agg(count(lit(1)).as("n"))
      cells.selectExpr("z_order(i, j) AS z", "n")
        .groupBy(shiftright($"z", 14).as("bucket"))
        .agg(count(lit(1)).as("n_cells"), sum($"n").as("n_points"),
          min($"z").as("z_min"), max($"z").as("z_max"))
        .orderBy($"bucket")
    }),

    // deterministic weighted sampling (A-Res-flavored): priority =
    // uniform-hash / weight, smallest-k wins — heavier docs are
    // proportionally likelier to make the sample, and the draw is exactly
    // replayable (no RNG state): one top-k, no shuffle beyond it
    "q130_weighted_sample" -> ((s, dir) => {
      import s.implicits._
      // u = (h+1)/2^60 ∈ (0,1]: the 2^60 divisor is a power of two (exact
      // exponent shift) and the /weight division is IEEE-exact-rounded, so
      // priority is bit-identical across engines — emitted RAW (round(,6)
      // at this magnitude diverges: DuckDB's multiply-based round loses
      // low bits that Spark's BigDecimal path keeps)
      t(s, dir, "documents")
        .withColumn("h0",
          TextFunctions.md5Bucket60(concat(lit("ws|"), $"doc_id".cast("string"))))
        .withColumn("priority",
          ($"h0" + lit(1L)).cast("double") / lit(1152921504606846976.0) /
            greatest($"n_chars", lit(1L)).cast("double"))
        .select($"doc_id", $"n_chars", $"priority")
        .orderBy($"priority".asc, $"doc_id")
        .limit(20)
    }),

    // out-of-vocabulary rate per source against the corpus top-500
    // vocabulary — the tokenizer-coverage diagnostic run before committing
    // a vocab; the 500-token vocab broadcasts, so the scan side never
    // shuffles for the join
    "q131_oov_rate" -> ((s, dir) => {
      import s.implicits._
      // ONE tokenize pass: a compact (source, doc_id, token, cnt)
      // aggregate feeds both the vocab and the per-doc OOV legs (the q16
      // checkpointed-termFreq pattern). Two un-materialized consumers of
      // the explode subtree re-ran scan+split+explode twice — 8.8 s at
      // sf0.1, the #2 bench query. The checkpoint is the distinct
      // doc-token frame, far smaller than the exploded occurrences.
      val tokCnt = Tables.fanOut(t(s, dir, "documents")).select($"source", $"doc_id",
          explode(TextFunctions.tokens(lower($"text"))).as("token"))
        .groupBy($"source", $"doc_id", $"token")
        .agg(count(lit(1)).as("cnt"))
        .localCheckpoint(true)
      val vocab = tokCnt.groupBy($"token").agg(sum($"cnt").as("cnt"))
        .orderBy($"cnt".desc, $"token".asc).limit(500)
        .select($"token", lit(1).as("iv"))
      val perDoc = tokCnt.join(broadcast(vocab), Seq("token"), "left_outer")
        .groupBy($"source", $"doc_id")
        .agg(sum($"cnt").as("n_toks"),
          sum(when($"iv".isNull, $"cnt").otherwise(0L)).as("n_oov"))
      perDoc.groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          round(sum(round($"n_oov".cast("double") / $"n_toks".cast("double"), 6)
              .cast("decimal(18,6)")).cast("double") / count(lit(1)).cast("double"), 6)
            .as("avg_oov_rate"))
        .orderBy($"source")
    }),

    // per-document LM plausibility score: mean conditional bigram
    // probability under the corpus bigram LM (q126's model applied back to
    // each document) in micro-units — ALL-integer arithmetic (floor
    // divisions), so an iterative float-flavored score gets a hash-exact
    // oracle with no rounding-boundary hazard at all
    "q132_lm_score" -> ((s, dir) => {
      import s.implicits._
      // per-doc bigram counts (shared with q126): the LM tables derive
      // from this compact frame (c1 from c12, not from a second pass over
      // the explode) and the join fans out over distinct doc-bigrams, not
      // every occurrence — one explode shuffle instead of three
      val dbg = docBigramCounts(s, dir)
      val c12 = dbg.groupBy($"w1", $"w2").agg(sum($"k").as("c12"))
      val c1 = c12.groupBy($"w1").agg(sum($"c12").as("c1"))
      dbg.join(c12, Seq("w1", "w2")).join(c1, Seq("w1"))
        .selectExpr("doc_id", "k", "(1000000 * c12) DIV c1 AS p_micro")
        .groupBy($"doc_id")
        .agg(sum($"k").as("n_bigrams"), sum($"k" * $"p_micro").as("sum_p"))
        .selectExpr("doc_id", "n_bigrams", "sum_p DIV n_bigrams AS lm_score_micro")
        .orderBy($"doc_id")
    }),

    // PageRank (3 iterations, damping 0.85) over the shared co-purchase
    // graph in EXACT micro-unit integer arithmetic — floor divisions and
    // integer sums replay bit-for-bit in SQL, so an iterative float
    // algorithm gets a hash-exact oracle; each iteration is one equi-join
    // shuffle on the edge list (the scalable shape)
    "q133_pagerank" -> ((s, dir) => {
      import s.implicits._
      val adj = copurchaseAdj(s, dir)
      val deg = cachedFrame("copurchase_deg", s, dir, Seq("lineitem")) {
        adj.groupBy($"a").agg(count(lit(1)).as("d"))
      }
      var pr = deg.select($"a", lit(1000000L).as("pr"))
      for (_ <- 1 to 3) {
        val contrib = adj.join(pr, "a").join(deg, "a")
          .selectExpr("b", "pr DIV d AS c")
        val sums = contrib.groupBy($"b").agg(sum($"c").as("s"))
        pr = deg.select($"a")
          .join(sums.withColumnRenamed("b", "a"), Seq("a"), "left_outer")
          .selectExpr("a", "150000 + (85 * coalesce(s, CAST(0 AS BIGINT))) DIV 100 AS pr")
      }
      pr.orderBy($"pr".desc, $"a").limit(20)
        .select($"a".as("node"), $"pr".as("pagerank_micro"))
    }),

    // bbox scan over the z-ordered staged table (write pattern in
    // stageZOrderedPoints): both lat and lng predicates reach PushedFilters
    // and the z-clustered layout makes the min/max stats selective in both
    // dimensions — the read half of the ZORDER story
    "q134_zorder_scan" -> ((s, dir) => {
      import s.implicits._
      val p = stageZOrderedPoints(s, dir)
      s.read.parquet(p)
        .where($"latitude" >= 40.72 && $"latitude" < 40.73 &&
          $"longitude" >= -74.0 && $"longitude" < -73.99)
        .agg(count(lit(1)).as("n"),
          sum($"amount".cast("decimal(18,2)")).cast("double").as("total"))
    }),

    // SemDeDup-style semantic dedup: k-means partitions the embedding
    // space (persisted leg — the oracle replays over the exact
    // assignments), exact cosine pairs within each cluster (guarded
    // all-pairs; the LSH twin covers corpora past the cap), connected
    // components pick one canonical vector per near-dup group. Scale
    // shape: centroids broadcast, pairs come from cluster-local joins —
    // never a global all-pairs.
    "q135_semantic_dedup" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      stageQ135Assignments(s, dir)
      // three consumers read this (the block-size guard and both sides of
      // the within-cluster self-join) — materialize the bounded frame once
      val clustered = e.join(s.read.parquet(scratch(q135AsgPat, dir)), "vec_id")
        .localCheckpoint(true)
      val pairs = Similarity.exactCosinePairs(clustered, "cluster", minCosX1e4 = 3000L)
      Dedup.dedupGroupsFromPairs(e, pairs, idCol = "vec_id")
        .withColumnsRenamed(Map("n_docs" -> "n_vecs"))
        .orderBy($"group_id")
    }),

    // incremental-ingestion dedup: a NEW batch (20% of docs by id modulus)
    // probed against the EXISTING corpus' minhash band buckets — band join
    // only between batch and corpus sides (never corpus×corpus, the whole
    // point at 100 TB: the stored corpus bands are an index, the probe
    // shuffle is batch-sized), candidates confirmed by exact shingle
    // Jaccard
    "q136_incremental_dedup" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      // per-doc signatures are subset-invariant (each doc's signature is a
      // function of its own shingles), so both sides derive from the ONE
      // shared shingle-hash frame instead of re-tokenizing the corpus twice
      val ex = shingleMd5(s, dir)
      val cb = Dedup.lshBands(
          Dedup.minhashSignaturesFromHashes(ex.where($"doc_id" % 5 =!= 0)))
        .toDF("band_idx", "band_val", "corpus_id")
      val bb = Dedup.lshBands(
          Dedup.minhashSignaturesFromHashes(ex.where($"doc_id" % 5 === 0)))
        .toDF("band_idx", "band_val", "batch_id")
      val cands = bb.join(cb, Seq("band_idx", "band_val"))
        .select($"batch_id", $"corpus_id").distinct()
        .localCheckpoint(true) // candidate pairs are few — compute once, reuse thrice
      // exact-confirm tokenizes ONLY candidate docs: semi-join the candidate
      // ids before the shingle explode instead of re-tokenizing the whole
      // corpus on both join sides (2 wasted corpus passes at 100 TB)
      val sa = docs.join(cands.select($"batch_id".as("doc_id")), Seq("doc_id"), "left_semi")
        .select($"doc_id".as("batch_id"), Dedup.shingles($"text").as("sh_a"))
      val sb = docs.join(cands.select($"corpus_id".as("doc_id")), Seq("doc_id"), "left_semi")
        .select($"doc_id".as("corpus_id"), Dedup.shingles($"text").as("sh_b"))
      cands.join(sa, "batch_id").join(sb, "corpus_id")
        .withColumn("jac", Dedup.jaccard($"sh_a", $"sh_b"))
        .groupBy($"batch_id")
        .agg(count(lit(1)).as("n_candidates"),
          sum(when($"jac" >= 0.5, 1L).otherwise(0L)).as("n_dups"),
          min(when($"jac" >= 0.5, $"corpus_id")).as("first_dup_id"))
        .orderBy($"batch_id")
    }),

    // Count-Min sketch maintained AS STREAMING STATE: the cells (row_i,
    // bucket, cnt) are a bounded d×w streaming aggregation — the sketch
    // shape that lets a 100 TB stream keep frequency state in constant
    // space; complete-mode snapshot equals the batch-built sketch exactly
    "q137_stream_countmin" -> ((s, dir) => {
      import s.implicits._
      val srcDir = StreamScaffold.stageTable(s, dir, "events")
      StreamScaffold.runCompleteStream(s, "q137", dir, srcDir) { src =>
        graft.sketch.CountMin.build(src.select($"user_id"), "user_id", w = 64, d = 4)
      }.orderBy($"row_i", $"bucket")
    }),

    // STREAMING incremental-ingestion dedup — q136's batch×corpus band
    // probe run THROUGH the engine's ingest path: new documents arrive as
    // a file stream, each micro-batch derives its minhash bands PER ROW
    // (Dedup.bandsPerRow — the aggregation-free spelling, so the probe is
    // a stateless map+explode on the stream) and stream-static joins the
    // stored corpus band index; a complete-mode aggregate counts candidate
    // partners per new doc. At 100 TB the corpus index is the big static
    // side (pre-bucketed, never rebuilt per batch) and the stream shuffles
    // only batch-sized band rows — the ingest-time shape of q136's
    // contract, with the same band math (oracle replays it exactly).
    "q195_stream_incremental_dedup" -> ((s, dir) => {
      import s.implicits._
      val srcDir = StreamScaffold.stageTable(s, dir, "documents")
      // corpus side from the session-cached signature frame: signatures
      // are per-doc, so filtering after the cache equals q136's
      // filter-before-aggregate derivation
      val cb = Dedup.lshBands(minhashSigs(s, dir).where($"doc_id" % 5 =!= 0))
        .toDF("band_idx", "band_val", "corpus_id")
      StreamScaffold.runCompleteStream(s, "q195", dir, srcDir) { src =>
        Dedup.bandsPerRow(src.where($"doc_id" % 5 === 0))
          .withColumnRenamed("doc_id", "batch_id")
          .join(cb, Seq("band_idx", "band_val"))
          .groupBy($"batch_id")
          .agg(collect_set($"corpus_id").as("cs"))
          .select($"batch_id", size($"cs").cast("long").as("n_cand_docs"),
            array_min($"cs").as("first_cand_id"))
      }.orderBy($"batch_id")
    }),

    // DSIR-style data selection (Xie et al. 2023, "Data Selection for
    // Language Models via Importance Resampling", public): hashed n-gram
    // features, per-doc importance weight = token-weighted mean of
    // per-feature target/source probability ratios — spelled ALL-INTEGER
    // (micro-unit probabilities, floor divisions) so the float-flavored
    // method gets a hash-exact oracle. Target domain = source 'src0'.
    // Scale shape: the feature table is ≤ 1024 rows however big the
    // corpus (hashing is the whole point of DSIR — the model size is
    // fixed), so it BROADCASTS; the corpus sees one tokenize pass
    // (checkpointed, the q131 pattern) and one per-doc hash aggregate.
    "q207_importance_weights" -> ((s, dir) => {
      import s.implicits._
      // hashed feature id per token occurrence: md5-bucket the token into
      // 1024 bins (collisions are part of the method's contract)
      val toks = Tables.fanOut(t(s, dir, "documents"))
        .select($"source", $"doc_id",
          explode(TextFunctions.tokens(lower($"text"))).as("token"))
        .select($"source", $"doc_id",
          pmod(TextFunctions.md5Bucket60($"token"), lit(1024L)).as("f"))
        .groupBy($"source", $"doc_id", $"f").agg(count(lit(1)).as("k"))
        .localCheckpoint(true) // feeds the feature model AND the scoring
      val isTgt = $"source" === "src0"
      val feat = toks.groupBy($"f")
        .agg(sum(when(isTgt, $"k").otherwise(0L)).as("ct"),
          sum(when(isTgt, 0L).otherwise($"k")).as("cs"))
      val tot = feat.agg(sum($"ct").as("tt"), sum($"cs").as("ss"))
      // add-1 smoothed probabilities in micro-units; the ratio guard
      // (greatest 1) keeps a huge source corpus from flooring p_s to 0
      val w = feat.crossJoin(broadcast(tot))
        .selectExpr("f",
          "((ct + 1) * 1000000) DIV (tt + 1024) AS pt_micro",
          "greatest(((cs + 1) * 1000000) DIV (ss + 1024), 1) AS ps_micro")
        .selectExpr("f", "(pt_micro * 1000000) DIV ps_micro AS r_micro")
      toks.join(broadcast(w), "f")
        .groupBy($"source", $"doc_id")
        .agg(sum($"k").as("n_toks"), sum($"k" * $"r_micro").as("sum_r"))
        .selectExpr("source", "doc_id", "n_toks",
          "sum_r DIV n_toks AS iw_micro")
        .orderBy($"iw_micro".desc, $"doc_id").limit(50)
    }),

    // streaming ANN serving: query vectors arrive as a stream and probe
    // the STATIC IVF partition of the corpus (the staged q135 k-means
    // assignments reused as inverted lists). Each micro-batch looks up
    // its own list (stream-static equi-join on vec_id), pulls only that
    // list's corpus vectors (stream-static equi-join on cluster — never
    // a crossJoin), scores exact cosine, and keeps per-query top-1 via
    // an order-preserving integer key (streaming aggregates allow no
    // window functions; max of (cos+20000)·10^10 − id ranks by cosine
    // desc then id asc exactly). At 100 TB the corpus index is the big
    // static side, partitioned by list and built once — a batch shuffles
    // only its own rows.
    "q208_stream_ann" -> ((s, dir) => {
      import s.implicits._
      stageQ135Assignments(s, dir)
      val asg = s.read.parquet(scratch(q135AsgPat, dir))
      val e = t(s, dir, "embeddings")
      val corpus = e.join(asg, "vec_id").where($"vec_id" % 50 =!= 0)
        .select($"cluster", $"vec_id".as("corpus_id"), $"embedding".as("cv"),
          Similarity.vecNorm($"embedding").as("cn"))
        .localCheckpoint(true)
      val srcDir = StreamScaffold.stageTable(s, dir, "embeddings")
      StreamScaffold.runCompleteStream(s, "q208", dir, srcDir) { src =>
        src.where($"vec_id" % 50 === 0)
          .select($"vec_id".as("query_id"), $"embedding".as("qv"),
            Similarity.vecNorm($"embedding").as("qn"))
          .join(asg.withColumnRenamed("vec_id", "query_id"), "query_id")
          .join(corpus, "cluster")
          .where($"query_id" =!= $"corpus_id")
          .withColumn("cos_x1e4",
            Similarity.cosineKeyWithNorms($"qv", $"cv", $"qn", $"cn"))
          .groupBy($"query_id")
          .agg(count(lit(1)).as("n_cand"),
            max(($"cos_x1e4" + 20000L) * 10000000000L - $"corpus_id").as("bk"))
      } // decode the key: bk = (cos+20000)·10^10 − id with 1 ≤ id < 10^10,
        // so floor(bk/10^10) = cos+19999 and the id falls back out exactly
        .selectExpr("query_id", "n_cand",
          "bk DIV 10000000000 - 19999 AS best_cos_x1e4",
          "(bk DIV 10000000000 + 1) * 10000000000 - bk AS best_corpus_id")
        .orderBy($"query_id")
    }),

    // Johnson–Lindenstrauss random projection (Achlioptas ±1 signs,
    // public): 64-dim embeddings down to 16 via a DETERMINISTIC
    // md5-derived sign matrix — the dim-reduction step before ANN or
    // clustering at 100 TB (4× fewer bytes per vector, pairwise
    // distances preserved within (1±ε) whp). The 1024-entry sign matrix
    // BROADCASTS however big the corpus; the corpus pass is posexplode +
    // equi-join + exact DECIMAL re-aggregation (associative, so the
    // result is partition-order-proof — a double sum would drift with
    // the physical plan), emitted in micro-units (the q58 centroid
    // pattern).
    "q209_random_projection" -> ((s, dir) => {
      import s.implicits._
      val signs = s.range(64).toDF("dim").crossJoin(s.range(16).toDF("j"))
        .withColumn("sgn", when(pmod(TextFunctions.md5Bucket60(
            concat(lit("rp|"), $"dim".cast("string"), lit("|"), $"j".cast("string"))),
          lit(2L)) === 0, 1L).otherwise(-1L))
      t(s, dir, "embeddings")
        .select($"vec_id", posexplode($"embedding").as(Seq("dim", "v")))
        .join(broadcast(signs), "dim")
        .groupBy($"vec_id", $"j")
        .agg(sum(($"v".cast("double") * $"sgn").cast("decimal(27,9)")).as("acc"))
        .select($"vec_id", $"j",
          round($"acc".cast("double") * 1e6).cast("long").as("proj_micro"))
        .orderBy($"vec_id", $"j")
    }),

    // vocabulary coverage curve: what fraction of corpus token
    // OCCURRENCES a K-entry vocab covers, at K ∈ {5, 10, 20} — the
    // truncation diagnostic run before fixing a tokenizer's vocab size.
    // Scale shape: the corpus collapses to per-token counts in ONE hash
    // agg (checkpointed — the total and the top-K legs would otherwise
    // each re-run the corpus explode); the top-K cut is
    // TakeOrderedAndProject (distributed top-k, never a global sort) and
    // the rank/cumsum window runs over that ≤20-row frame only.
    "q213_vocab_coverage" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val counts = t(s, dir, "documents")
        .select(explode(TextFunctions.tokens(lower($"text"))).as("token"))
        .groupBy($"token").agg(count(lit(1)).as("cnt"))
        .localCheckpoint(true)
      val tot = counts.agg(sum($"cnt").as("n"))
      val w = Window.orderBy($"cnt".desc, $"token".asc)
      counts.orderBy($"cnt".desc, $"token".asc).limit(20)
        .withColumn("rank", row_number().over(w))
        .withColumn("covered", sum($"cnt").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .where($"rank".isin(5, 10, 20))
        .crossJoin(broadcast(tot))
        .selectExpr("rank AS vocab_size", "covered", "n AS total_tokens",
          "(1000000 * covered) DIV n AS coverage_micro")
        .orderBy($"vocab_size")
    }),

    // dedup survivorship by source: per-source retention rate after
    // near-dup group dedup (keep = the group's min doc_id — q57's
    // convention, and the CC label IS the component minimum, so "kept"
    // is the one equality doc_id = group_id; no second aggregation over
    // groups needed). The governance number a corpus report leads with:
    // "how much of each source survives dedup".
    "q214_dedup_survivorship" -> ((s, dir) => {
      import s.implicits._
      val cc = graft.cluster.ConnectedComponents.run(
        minhashCands(s, dir).select($"id_a".as("src"), $"id_b".as("dst")))
      t(s, dir, "documents").select($"doc_id", $"source")
        .join(cc.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left_outer")
        .select($"source", $"doc_id",
          coalesce($"component", $"doc_id").as("group_id"))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when($"doc_id" === $"group_id", 1L).otherwise(0L)).as("n_kept"))
        .selectExpr("source", "n_docs", "n_kept",
          "(1000000 * n_kept) DIV n_docs AS retention_micro")
        .orderBy($"source")
    }),

    // frequent-token extraction via the NATIVE Misra–Gries aggregate
    // (`mg_topk`, plans/MisraGriesAggregate — the third native
    // TypedImperativeAggregate after kmv/hll): pass 1 folds the corpus
    // into one ≤128-counter summary (plus the total, same job — the 1-row
    // result is checkpointed so its two consumers don't re-run the scan);
    // pass 2 exactly re-counts ONLY the ≤128 candidates (broadcast semi
    // join) and keeps those at ≥ 1/64 of all occurrences. Deterministic
    // despite MG's merge-order-dependent counters: the mergeable-summaries
    // bound guarantees every token above n/129 survives ANY merge order,
    // and the output is the exact re-count thresholded strictly above
    // that. At 100 TB this never shuffles the full token-frequency table —
    // the exchange carries ≤128 counters map-side and ≤128 keys back.
    "q212_heavy_hitters" -> ((s, dir) => {
      import s.implicits._
      val toks = t(s, dir, "documents")
        .select(explode(TextFunctions.tokens(lower($"text"))).as("token"))
      val sk = toks.agg(expr("mg_topk(token, 128)").as("cand"),
        count(lit(1)).as("n")).localCheckpoint(true)
      val cand = sk.select(explode($"cand").as("token"))
      toks.join(broadcast(cand), "token")
        .groupBy($"token").agg(count(lit(1)).as("cnt"))
        .crossJoin(broadcast(sk.select($"n")))
        .where($"cnt" * 64L >= $"n")
        .selectExpr("token", "cnt", "n AS total_tokens",
          "(1000000 * cnt) DIV n AS freq_micro")
        .orderBy($"cnt".desc, $"token")
    }),

    // cross-source duplication leakage matrix: the MinHash candidate
    // pairs bucketed by (source, source) — the governance diagnostic run
    // before mixing corpora ("how much of src2 is already in src0?").
    // Reuses the session-cached q35 candidate pairs (banded bucket join,
    // never all-pairs); the two doc_id→source lookups are plain equi-joins
    // and both aggregates run over the (tiny) candidate-pair frame. The
    // distinct-doc leg re-aggregates instead of collect_set-ing pair ids
    // into one row — no per-group unbounded buffer at scale.
    "q211_crossdup_matrix" -> ((s, dir) => {
      import s.implicits._
      val src = t(s, dir, "documents").select($"doc_id", $"source")
      // checkpointed: np and nd both consume sp — un-materialized, the two
      // doc_id→source joins (and the documents scan under them) run twice
      val sp = minhashCands(s, dir)
        .join(src.toDF("id_a", "sa"), "id_a")
        .join(src.toDF("id_b", "sb"), "id_b")
        .select(least($"sa", $"sb").as("source_a"),
          greatest($"sa", $"sb").as("source_b"), $"id_a", $"id_b")
        .localCheckpoint(true)
      val np = sp.groupBy($"source_a", $"source_b")
        .agg(count(lit(1)).as("n_pairs"))
      val nd = sp.select($"source_a", $"source_b",
          explode(array($"id_a", $"id_b")).as("d"))
        .groupBy($"source_a", $"source_b")
        .agg(countDistinct($"d").as("n_docs"))
      np.join(nd, Seq("source_a", "source_b"))
        .orderBy($"source_a", $"source_b")
    }),

    // fixed-block sequence packing report: the trainer-side packing step
    // (concatenate the corpus in doc_id order, cut every 2048 tokens)
    // analyzed per context window — how many documents each block touches
    // (attention-mask fragmentation), how many start in it, and the token
    // fill. Built on Sharding.withTokenOffsets (bucketed parallel
    // prefix-sum — no global window), then ONE block-range explode whose
    // fan-out per doc is ceil(n_tokens/B)+1 ≤ 2 for any doc shorter than a
    // block: the explode is O(corpus tokens / B + n_docs) rows however big
    // the corpus, and the per-block aggregate is an equi-key hash agg.
    "q210_sequence_pack" -> ((s, dir) => {
      import s.implicits._
      val B = 2048L
      val docs = t(s, dir, "documents").select($"doc_id",
          TextFunctions.tokenCount($"text").cast("long").as("n_tokens"))
        .where($"n_tokens" > 0)
      graft.operators.Sharding.withTokenOffsets(docs)
        .selectExpr("doc_id", "n_tokens", "tok_start",
          s"tok_start DIV $B AS first_block",
          s"(tok_start + n_tokens - 1) DIV $B AS last_block")
        .select($"doc_id", $"n_tokens", $"tok_start", $"first_block",
          explode(sequence($"first_block", $"last_block")).as("block"))
        .groupBy($"block")
        .agg(count(lit(1)).as("n_docs"),
          sum(when($"first_block" === $"block", 1L).otherwise(0L)).as("n_starts"),
          sum(least(($"block" + 1L) * B, $"tok_start" + $"n_tokens") -
            greatest($"block" * B, $"tok_start")).as("block_tokens"))
        .orderBy($"block")
    }),

    // context-window chunking: overlapping 64-token windows at stride 48
    // (the pre-packing step before Sharding's token-budget packing), each
    // chunk carrying an md5 fingerprint of its exact token span — chunk
    // identity survives recomputation anywhere; pure per-row explode, no
    // shuffle at all until the output sort
    "q138_chunking" -> ((s, dir) => {
      import s.implicits._
      val W = 64
      val S = 48
      t(s, dir, "documents")
        .select($"doc_id", TextFunctions.tokens(lower($"text")).as("tk"))
        .withColumn("n", size($"tk"))
        .where($"n" > 0)
        .select($"doc_id", $"tk", $"n",
          explode(sequence(lit(0L), expr(s"(n - 1) DIV $S"))).as("chunk_idx"))
        .select($"doc_id", $"chunk_idx",
          ($"chunk_idx" * S).as("start_tok"),
          least(lit(W), $"n" - $"chunk_idx" * S).cast("long").as("n_chunk_toks"),
          md5(concat_ws(" ", slice($"tk", ($"chunk_idx" * S + 1).cast("int"), lit(W)))
            .cast("binary")).as("chunk_md5"))
        .orderBy($"doc_id", $"chunk_idx")
    }),

    // boilerplate-span detection (the CCNet-style pre-training cleanup):
    // 3-shingles appearing in ≥ 5 distinct docs are boilerplate; per-source
    // contamination = boilerplate shingle share in micro-units (all-integer
    // DIV — no rounding boundary). Scale shape: the common-shingle set is
    // the df-filtered tail of one hash agg (small by construction relative
    // to the corpus), the probe side re-joins on the shingle hash — AQE
    // picks broadcast when the set fits, and nothing is ever all-pairs.
    "q139_boilerplate" -> ((s, dir) => {
      import s.implicits._
      // fanOut: the single-row-group documents file scans as ONE partition
      // and this query's whole shingle explode ran serial (guide §2.5;
      // measured 3.98 s → 0.67 s for the df-aggregate at sf0.1/32 cores)
      val sh = Tables.fanOut(t(s, dir, "documents"))
        .select($"source", $"doc_id", explode(Dedup.shingles($"text")).as("sh"))
      // shingles are per-doc distinct, so count(*) per shingle = doc freq
      val common = sh.groupBy($"sh").agg(count(lit(1)).as("df"))
        .where($"df" >= 5).select($"sh", lit(1).as("bp"))
      sh.join(common, Seq("sh"), "left_outer")
        .groupBy($"source", $"doc_id")
        .agg(count(lit(1)).as("n_sh"),
          sum(when($"bp".isNotNull, 1L).otherwise(0L)).as("n_bp"))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_sh").as("n_shingles"), sum($"n_bp").as("n_boiler"))
        .selectExpr("source", "n_docs", "n_shingles", "n_boiler",
          "(1000000 * n_boiler) DIV n_shingles AS boiler_ratio_micro")
        .orderBy($"source")
    }),

    // perceptual-hash image dedup over REAL decoded pixels: deterministic
    // pattern PNGs (12 distinct 8×8 masks at varying sizes) → full ImageIO
    // decode → 64-bit average-hash → exact groupBy on the hash. The aHash
    // leg is codec work (not SQL-expressible), so it persists to scratch
    // parquet and the oracle replays the grouping — the q40/q135 pattern;
    // scale-invariance and mask-recovery laws live in MultimodalSpec.
    // Scale shape: decode is partition-local, the dedup is ONE hash agg.
    "q140_image_ahash" -> ((s, dir) => {
      import s.implicits._
      // the encode+decode+hash leg is a deterministic function of the
      // doc_id set — staged write-once (and pre-staged by bench warmup),
      // so the timed query measures the dedup grouping, not ~N PNG codec
      // round-trips per run (4.6 s of the r6 local bench at sf0.1)
      s.read.parquet(stageQ140Hashes(s, dir))
        .groupBy($"ahash")
        .agg(count(lit(1)).as("n_images"), min($"media_id").as("canonical_id"))
        .orderBy($"ahash")
    }),

    // BPE-style merge discovery: the top-20 adjacent character pairs by
    // corpus frequency — the first iteration of byte-pair-encoding vocab
    // induction. One explode + one hash agg + a bounded top-k; pair counts
    // partial-aggregate map-side, so the shuffle carries |alphabet|²-ish
    // rows, not the corpus.
    "q141_bpe_merges" -> ((s, dir) => {
      import s.implicits._
      Tables.fanOut(t(s, dir, "documents"))
        .select(explode(TextFunctions.tokens(lower($"text"))).as("tok"))
        .where(length($"tok") >= 2)
        .select(explode(expr(
          "transform(sequence(1, length(tok) - 1), i -> substring(tok, i, 2))")).as("pair"))
        .groupBy($"pair").agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"pair")
        .limit(20)
    }),

    // int8-quantization retrieval quality: recall@10 of the quantized
    // index against full-precision brute-force ground truth, per query —
    // the eval run before committing a compressed ANN index. Both
    // rankings are integer-keyed (cos ×10⁴, corpus-id tiebreak), so the
    // overlap count is hash-exact; queries broadcast against the corpus.
    "q142_quant_recall" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val exact = Similarity.bruteForceTopK(e.where($"vec_id" < 5), e, k = 10)
        .select($"query_id", $"corpus_id")
      val codes = Similarity.quantizeInt8(e)
        .select($"vec_id", transform($"codes", c => c.cast("double")).as("embedding"))
      val quant = Similarity.bruteForceTopK(
          codes.where($"vec_id" < 5), codes, k = 10)
        .select($"query_id", $"corpus_id")
      val overlap = exact.join(quant, Seq("query_id", "corpus_id"))
        .groupBy($"query_id").agg(count(lit(1)).as("recall10"))
      e.where($"vec_id" < 5).select($"vec_id".as("query_id"))
        .join(overlap, Seq("query_id"), "left_outer")
        .select($"query_id", coalesce($"recall10", lit(0L)).as("recall10"))
        .orderBy($"query_id")
    }),

    // per-group deterministic sample: bottom-5 by salted md5 priority
    // within each source — the replayable uniform per-stratum draw (q54's
    // stratified RATE sample keeps a fraction; this keeps a fixed COUNT
    // per group). One window over the group partitioning, no global sort;
    // scale-safe because Spark 4's partial WindowGroupLimit prunes
    // rank<=k map-side (each task ships ≤5 rows per source — the same
    // pruning PlanAuditSpec pins on q45), so a billion-row source never
    // funnels through one window task.
    "q143_group_sample" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"source").orderBy($"pri", $"doc_id")
      t(s, dir, "documents")
        .withColumn("pri",
          TextFunctions.md5Bucket60(concat(lit("gs|"), $"doc_id".cast("string"))))
        .withColumn("rk", row_number().over(w))
        .where($"rk" <= 5)
        .select($"source", $"rk".cast("long").as("rk"), $"doc_id", $"n_chars")
        .orderBy($"source", $"rk")
    }),

    // per-user inactivity gaps (the engagement / data-freshness audit):
    // distinct active days per user, then the longest day gap via one lag
    // window — no calendar explode, so the shuffle carries active days
    // only, not the full span
    "q144_gap_detect" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val days = t(s, dir, "events")
        .select($"user_id", expr("ts DIV 1000 DIV 86400000000").as("d")).distinct()
      val w = Window.partitionBy($"user_id").orderBy($"d")
      days.withColumn("gap", $"d" - lag($"d", 1).over(w) - 1)
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_active_days"),
          (max($"d") - min($"d") + 1).as("span_days"),
          coalesce(max($"gap"), lit(0L)).as("max_gap_days"))
        .orderBy($"user_id")
    }),

    // MinHash estimator calibration: for every q35/q57 LSH candidate pair,
    // the 8-hash matching-fraction estimate vs the exact shingle Jaccard,
    // both in micro-units (all-integer — hash-exact across engines). The
    // eval that tells you whether the signature width is adequate before
    // trusting the dedup at corpus scale; candidates come from the shared
    // session-cached band join, never all pairs.
    "q145_minhash_est" -> ((s, dir) => {
      import s.implicits._
      val sigs = minhashSigs(s, dir)
      val sa = sigs.toDF("id_a" +: (0 until 8).map(k => s"a$k"): _*)
      val sb = sigs.toDF("id_b" +: (0 until 8).map(k => s"b$k"): _*)
      // exact-Jaccard leg comes from the shared rescored-candidate cache
      candJaccard(s, dir)
        .join(sa, "id_a").join(sb, "id_b")
        .withColumn("matches",
          (0 until 8).map(k => when(col(s"a$k") === col(s"b$k"), 1L).otherwise(0L))
            .reduce(_ + _))
        .selectExpr("id_a", "id_b",
          "(1000000 * matches) DIV 8 AS est_micro", "jac_micro")
        .withColumn("abs_err_micro", abs($"est_micro" - $"jac_micro"))
        .orderBy($"id_a", $"id_b")
    }),

    // incremental view maintenance: the per-user aggregate is kept as
    // base ⊕ delta (events split at the temporal midpoint, partials merged
    // by a full-outer coalesce-add) — and must equal the full recompute,
    // which IS the oracle. The cut day is a broadcast scalar (J6 pattern);
    // at 100 TB only the delta is re-aggregated, the base partial is a
    // stored table.
    "q146_view_maintain" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events").select($"user_id",
        expr("ts DIV 1000 DIV 86400000000").as("d"),
        expr("CAST(round(value * 1000000) AS BIGINT)").as("micros"))
      val cut = ev.agg((min($"d") + max($"d")).as("mm"))
        .selectExpr("mm DIV 2 AS cut")
      val withCut = ev.crossJoin(broadcast(cut))
      def part(p: DataFrame) = p.groupBy($"user_id")
        .agg(count(lit(1)).as("n"), sum($"micros").as("sm"))
      val base = part(withCut.where($"d" < $"cut"))
      val delta = part(withCut.where($"d" >= $"cut"))
      base.as("b").join(delta.as("dl"), Seq("user_id"), "full_outer")
        .select($"user_id",
          (coalesce($"b.n", lit(0L)) + coalesce($"dl.n", lit(0L))).as("n_events"),
          (coalesce($"b.sm", lit(0L)) + coalesce($"dl.sm", lit(0L))).as("sum_micros"))
        .orderBy($"user_id")
    }),

    // per-document keyword extraction: top-3 terms by (tf desc, rarity
    // asc, term) — integer-exact ranking (no float idf, so no rounding
    // boundary); the document-frequency side is a tiny agg the optimizer
    // broadcasts
    "q147_keywords" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      // checkpointed: tf feeds TWO unmaterialized consumers (the df
      // aggregate and the join back) — the tokenize explode otherwise ran
      // twice (the q131 tokCnt rule); compact frame, never the text
      val tf = Tables.fanOut(t(s, dir, "documents"))
        .select($"doc_id", explode(TextFunctions.tokens(lower($"text"))).as("term"))
        .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
        .localCheckpoint(true)
      val dfreq = tf.groupBy($"term").agg(count(lit(1)).as("df"))
      val w = Window.partitionBy($"doc_id").orderBy($"tf".desc, $"df".asc, $"term")
      tf.join(dfreq, "term")
        .withColumn("rk", row_number().over(w))
        .where($"rk" <= 3)
        .select($"doc_id", $"rk".cast("long").as("rk"), $"term", $"tf", $"df")
        .orderBy($"doc_id", $"rk")
    }),

    // schema evolution at ingest: a v1 batch (doc_id, n_chars) and a v2
    // batch with an added `quality` column land in separate parquet drops;
    // a mergeSchema read unions them (v1 rows surface quality as NULL) —
    // the long-lived-dataset shape where batch schemas drift across months.
    // Per-batch null accounting proves which rows came through which
    // schema.
    "q148_schema_evolution" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      docs.where($"doc_id" % 2 === 0).select($"doc_id", $"n_chars")
        .write.mode("overwrite").parquet(scratch(q148V1Pat, dir))
      docs.where($"doc_id" % 2 === 1)
        .select($"doc_id", $"n_chars", ($"n_chars" * 7 % 100).as("quality"))
        .write.mode("overwrite").parquet(scratch(q148V2Pat, dir))
      s.read.option("mergeSchema", "true")
        .parquet(scratch(q148V1Pat, dir), scratch(q148V2Pat, dir))
        .groupBy(($"doc_id" % 2).as("batch"))
        .agg(count(lit(1)).as("n_rows"),
          count($"quality").as("n_with_quality"),
          sum($"n_chars").as("sum_chars"),
          coalesce(sum($"quality"), lit(0L)).as("sum_quality"))
        .orderBy($"batch")
    }),

    // dataset distribution drift (the pre-release data-quality monitor):
    // md5-hash the corpus into two halves, compare per-language composition
    // in micro-units, report each language's share delta — all-integer
    // (share = 1e6·n DIV total), so the drift metric replays hash-exact
    "q149_drift" -> ((s, dir) => {
      import s.implicits._
      val side = t(s, dir, "documents").withColumn("side",
        TextFunctions.md5Bucket16(concat(lit("ab|"), $"doc_id".cast("string"))) % 2)
      val tot = side.groupBy($"side").agg(count(lit(1)).as("tot"))
      side.groupBy($"lang", $"side").agg(count(lit(1)).as("n"))
        .join(tot, "side")
        .selectExpr("lang", "side", "(1000000 * n) DIV tot AS share_micro")
        .groupBy($"lang")
        .agg(sum(when($"side" === 0, $"share_micro").otherwise(0L)).as("share_a"),
          sum(when($"side" === 1, $"share_micro").otherwise(0L)).as("share_b"))
        .withColumn("drift_micro", abs($"share_a" - $"share_b"))
        .orderBy($"lang")
    }),

    // Unicode NFC normalization (the canonicalization pass before
    // tokenize/dedup — "e"+combining-acute must hash like "é"):
    // deterministic decomposed suffixes are appended, then normalized
    // through the native codegen `nfc_normalize` via the SQL surface; the
    // md5 of the normalized text pins content equality cross-engine, the
    // length drop pins that composition actually happened
    "q150_unicode_normalize" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select($"doc_id", concat($"text", lit(" cafe\u0301"),
          when($"doc_id" % 3 === 0, lit(" a\u030A")).otherwise(lit(""))).as("raw"))
        .createOrReplaceTempView("graft_nfc_t")
      s.sql("""SELECT doc_id, CAST(length(raw) AS BIGINT) AS len_raw,
              |  CAST(length(nfc_normalize(raw)) AS BIGINT) AS len_nfc,
              |  md5(CAST(nfc_normalize(raw) AS BINARY)) AS nfc_md5
              |FROM graft_nfc_t ORDER BY doc_id""".stripMargin)
    }),

    // custom DataSource V2 read (the source-extension surface beyond file
    // formats): the graft-grid TableProvider absorbs the box predicate
    // into its generation bounds (pushFilters), prunes i-band partitions
    // before scheduling, and emits only projected columns — behaviors
    // spec-pinned in GridSourceSpec; here the whole path is driver-visible
    // with an exact generate_series oracle
    "q152_custom_source" -> ((s, dir) => {
      import s.implicits._
      s.read.format("graft-grid")
        .option("rows", 512).option("cols", 512).load()
        .where($"i" >= 100 && $"i" < 164 && $"j" >= 200 && $"j" < 264)
        .groupBy(($"i" % 8).as("ib"))
        .agg(count(lit(1)).as("n"), sum($"v").as("sum_v"))
        .orderBy($"ib")
    }),

    // tokenizer encoding (text → id arrays, the step that feeds training):
    // vocab = top-500 corpus tokens ranked (id 1..500, 0 = UNK), every doc
    // re-encoded as its id sequence with position order preserved through
    // the join (sort_array over (pos, id) structs — collect_list alone has
    // no order guarantee after a shuffle). The sequence md5 pins the exact
    // ids cross-engine; the vocab side broadcasts.
    // Scale shape (the q213 pattern): the top-500 cut is orderBy+limit —
    // TakeOrderedAndProject, a distributed per-partition top-k with a
    // bounded driver merge — and the id-assigning window runs over that
    // ≤500-row frame only. Ranking the FULL distinct-token frame through
    // an unpartitioned window would funnel the whole corpus vocabulary
    // (10⁸–10⁹ rows at web scale) through one partition.
    "q153_vocab_encode" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val toks = t(s, dir, "documents").select($"doc_id",
        posexplode(TextFunctions.tokens(lower($"text"))).as(Seq("pos", "tok")))
      val vocab = toks.groupBy($"tok").agg(count(lit(1)).as("cnt"))
        .orderBy($"cnt".desc, $"tok").limit(500)
        .withColumn("id",
          row_number().over(Window.orderBy($"cnt".desc, $"tok")).cast("long"))
        .select($"tok", $"id")
      toks.join(broadcast(vocab), Seq("tok"), "left_outer")
        .withColumn("id", coalesce($"id", lit(0L)))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          sum(when($"id" === 0L, 1L).otherwise(0L)).as("n_unk"),
          md5(array_join(expr("transform(sort_array(collect_list(struct(pos, id))), x -> x.id)"), ",")
            .cast("binary")).as("ids_md5"))
        .orderBy($"doc_id")
    }),

    // CUSTOM STREAMING SOURCE: the graft-grid MicroBatchStream drains the
    // (pushdown-bounded) grid across ~4 offset-chunked micro-batches under
    // AvailableNow; the complete-mode aggregate's final snapshot must
    // equal the batch answer — chunking changes how rows are sliced, never
    // what is emitted. Exercises the Offset protocol +
    // SupportsTriggerAvailableNow end-to-end.
    "q154_stream_custom_source" -> ((s, dir) => {
      import s.implicits._
      val agg = s.readStream.format("graft-grid")
        .option("rows", 256).option("cols", 8).load()
        .where($"i" < 192)
        .groupBy(($"i" % 4).as("ib"))
        .agg(count(lit(1)).as("n"), sum($"v").as("sum_v"))
      StreamScaffold.runCompleteStreamOn(s, "q154", dir, agg)
        .orderBy($"ib")
    }),

    // CUSTOM SINK (DSv2 write + two-phase commit): documents' ids write
    // through the graft-audit connector — per-task partials become
    // WriterCommitMessages, the driver-side commit aggregates them into
    // ONE atomically-published (count, xor) audit record — and the oracle
    // recomputes the same reconciliation pair straight off the table. The
    // xor is order/partitioning-independent, so the check is insensitive
    // to how tasks sliced the write.
    "q155_custom_sink" -> ((s, dir) => {
      import s.implicits._
      val tag = s"q155_${Tables.sfTag(dir)}"
      t(s, dir, "documents").select($"doc_id")
        .write.format("graft-audit").option("tag", tag).mode("append").save()
      val (nRows, xorIds) = graft.sources.AuditSink.committed(tag)
        .getOrElse(sys.error(s"graft-audit never committed tag $tag"))
      Seq((nRows, xorIds)).toDF("n_rows", "xor_ids")
    }),

    // NATIVE whole-operator as-of join: q27's exact query through the
    // custom LogicalPlan → SparkStrategy → SparkPlan path (AsOfJoinExec:
    // one co-partitioned sort-merge pass — EnsureRequirements inserts the
    // exchanges from the operator's declared distribution/ordering, no
    // union blowup, no window state). Same oracle as q27; operator
    // equality with the composed spelling is spec-pinned on random data.
    "q156_asof_native" -> ((s, dir) => {
      import s.implicits._
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val ev = t(s, dir, "events")
      val base = ev.select($"user_id", $"event_id",
        expr("timestamp_micros(ts DIV 1000)").as("ts"))
      val purchases = ev.filter($"event_type" === "purchase")
        .groupBy($"user_id", expr("timestamp_micros(ts DIV 1000)").as("pts"))
        .agg(max($"value").as("last_purchase"))
      graft.operators.AsOfJoin.leftAsOfNative(base, purchases,
          keyCols = Seq("user_id"), leftTsCol = "ts", rightTsCol = "pts")
        .select($"user_id", $"event_id", $"last_purchase")
        .orderBy($"user_id", $"event_id")
    }),

    // token counting (whitespace + BPE-ish estimate)
    "q30_text_tokens" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents").select($"doc_id",
        TextFunctions.tokenCount($"text").cast("long").as("n_tokens"),
        TextFunctions.subwordCountEstimate($"text").as("n_subwords"),
        length($"text").cast("long").as("n_chars_m"))
        .orderBy($"doc_id")
    }),

    // quality scoring (length/punct/stopword ratios)
    "q31_text_quality" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents").select($"doc_id",
        TextFunctions.punctRatio($"text").as("punct_ratio"),
        TextFunctions.avgWordLen($"text").as("avg_word_len"),
        TextFunctions.stopwordRatio($"text").as("stop_ratio"),
        TextFunctions.qualityScore($"text").as("quality"))
        .orderBy($"doc_id")
    }),

    // language ID (n-gram/stopword heuristic)
    "q32_lang_id" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents").select($"doc_id",
        TextFunctions.langId($"text").as("pred_lang"), $"lang")
        .orderBy($"doc_id")
    }),

    // document fingerprinting
    "q33_fingerprint" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents").select($"doc_id",
        TextFunctions.fingerprintMd5($"text").as("fp"))
        .orderBy($"doc_id")
    }),

    // exact dedup (hash-groupBy)
    "q34_dedup_exact" -> ((s, dir) => {
      Dedup.exact(t(s, dir, "documents")).orderBy("fp")
    }),

    // MinHash + LSH near-dup candidates (shingle→minhash→band→bucket-join)
    "q35_dedup_minhash" -> ((s, dir) => {
      minhashCands(s, dir).orderBy("id_a", "id_b")
    }),

    // n-gram Jaccard within same-source blocks
    "q36_dedup_jaccard" -> ((s, dir) => {
      import s.implicits._
      Dedup.ngramJaccardPairs(
        t(s, dir, "documents").filter($"source".isin("src0", "src1")),
        blockCols = Seq("source"), threshold = 0.10)
        .orderBy("source", "id_a", "id_b")
    }),

    // exact substring-span duplication (ExactSubstr family): per-doc count
    // of positional 10-token windows whose hash recurs in another doc
    "q73_span_dup" -> ((s, dir) => {
      Dedup.spanDupStats(t(s, dir, "documents"), w = 10).orderBy("doc_id")
    }),

    // train/test contamination check: test-split docs sharing any word
    // 5-gram with a train-split doc (the benchmark-decontamination pass a
    // pretraining pipeline runs before eval). Split = the q55 hash split;
    // same explode→equi-join shape as dedup, so it scales the same way.
    // Hot-n-gram cap: an n-gram in a train docs × b test docs fans out to
    // a×b join rows; capping each side's df at 64 via capHotFingerprints
    // bounds per-n-gram fanout at 64² (boilerplate that common is not
    // contamination signal). Fixture max df is 5, so oracles are unchanged.
    "q56_contamination" -> ((s, dir) => {
      import s.implicits._
      // fanOut before the two explode legs: single-row-group scan = one
      // partition = serial 5-gram hashing on both sides (guide §2.5)
      val tagged = Tables.fanOut(t(s, dir, "documents")).withColumn("bk",
        TextFunctions.md5Bucket16($"doc_id".cast("string"), "split|") % 100)
      val train = Dedup.capHotFingerprints(tagged.where($"bk" < 80)
        .select($"doc_id".as("train_id"), explode(Dedup.shingles($"text", 5)).as("ng")),
        maxDf = 64, Seq("ng"))
      val test = Dedup.capHotFingerprints(tagged.where($"bk" >= 90)
        .select($"doc_id".as("test_id"), explode(Dedup.shingles($"text", 5)).as("ng")),
        maxDf = 64, Seq("ng"))
      test.join(train, Seq("ng"))
        .groupBy($"test_id")
        .agg(countDistinct($"train_id").as("n_train_docs"), count(lit(1)).as("n_hits"))
        .orderBy($"test_id")
    }),

    // sub-document CONTAINMENT (asymmetric Jaccard |A∩B|/min(|A|,|B|)):
    // the inclusion detector symmetric q36 misses — a short doc quoted
    // inside a long one scores ≈1 here with tiny Jaccard. Same blocked
    // shingle equi-join; integer micro output
    "q218_containment" -> ((s, dir) => {
      import s.implicits._
      Dedup.containmentPairs(
        t(s, dir, "documents").filter($"source".isin("src0", "src1")),
        blockCols = Seq("source"), thresholdMicro = 50000L)
        .orderBy("source", "id_a", "id_b")
    }),

    // KMV sketch SET ALGEBRA — cross-source corpus overlap (the
    // theta-sketch pattern): ONE bounded bottom-k pass over the corpus
    // builds a ≤k-long sketch per source, then union / intersection /
    // Jaccard between every source pair is computed purely on the
    // sketches (≤2k rows per pair, independent of corpus size). Jaccard
    // estimator: merge the two sketches, keep the union's bottom-k U,
    // J ≈ |{h ∈ U : h ∈ A ∧ h ∈ B}| / |U|; intersection ≈ J × est(|A∪B|).
    // md5-hashed, so DuckDB replays every estimate bit-for-bit.
    "q219_kmv_set_ops" -> ((s, dir) => {
      import s.implicits._
      val k = 256
      // distinct 3-shingles per source (enough value diversity for a real
      // estimate — distinct TOKENS in the synthetic corpus ≈ the vocab),
      // hashed off the SHARED md5-shingle cache: the stored hex IS the md5
      // that md5Bucket60 slices, so the sketch input needs no re-tokenize
      // and no re-hash — just conv(substring(bh, 1, 15)) plus a broadcast
      // doc_id→source map join
      val hashed = shingleMd5(s, dir)
        .join(broadcast(t(s, dir, "documents").select($"doc_id", $"source")), "doc_id")
        .select($"source",
          expr("CAST(conv(substring(bh, 1, 15), 16, 10) AS BIGINT)").as("hv"))
      // checkpointed: the union-of-two-equi-joins below references hs
      // TWICE — without materialization each branch would re-run the whole
      // corpus-scale sketch pass. The frame is ≤ k rows per source.
      val hs = graft.sketch.Kmv.sketchKeptHashed(hashed, "source", "hv", k)
        .select($"source", explode($"kept").as("hv"))
        .localCheckpoint(true)
      val srcs = t(s, dir, "documents").select($"source").distinct()
        .localCheckpoint(true)
      // pairwise algebra materializes C(S,2) pairs × ≤2k sketch rows —
      // fine at tens/hundreds of sources, wrong past that; fail loudly
      // with the scalable alternative named (the exactCosinePairs
      // convention) instead of silently exploding
      val nSrc = srcs.count()
      require(nSrc <= 512,
        s"q219 pairwise KMV set algebra fans each sketch row to O(S) pairs " +
          s"(C(S,2) pair rows total); got S=$nSrc sources (cap 512) — " +
          "bucket sources into coarser groups and sketch per group first")
      // the pair-list build is the one inequality join (S×S on the tiny
      // checkpointed source list); materialized so neither union branch
      // re-plans it and the executed plan carries no nested-loop join
      val pairs = srcs.as("x").join(srcs.as("y"), $"x.source" < $"y.source")
        .select($"x.source".as("a"), $"y.source".as("b"))
        .localCheckpoint(true)
      // per-pair union of two bounded sketches. Each sketch row meets the
      // pair list TWICE through equi-joins (source = a ∪ source = b) so
      // the physical shape stays BroadcastHASHJoin — the single OR-join
      // spelling (source === a || source === b) is semantically identical
      // but degrades to BroadcastNestedLoopJoin: O(S²) predicate evals
      // per sketch row instead of two O(1) hash probes. Plan-pinned in
      // PlanAuditSpec.
      val u0 = hs.join(broadcast(pairs), $"source" === $"a")
        .select($"a", $"b", $"hv", lit(1).as("ma"), lit(0).as("mb"))
        .unionByName(hs.join(broadcast(pairs), $"source" === $"b")
          .select($"a", $"b", $"hv", lit(0).as("ma"), lit(1).as("mb")))
        .groupBy($"a", $"b", $"hv")
        .agg(max($"ma").as("ina"), max($"mb").as("inb"))
      // bottom-k of the union — the window sorts ≤2k rows per pair, a
      // sketch-bounded frame, never corpus-scale data
      import org.apache.spark.sql.expressions.Window
      val uk = u0.withColumn("rn", row_number().over(
          Window.partitionBy($"a", $"b").orderBy($"hv")))
        .where($"rn" <= k)
      val agg = uk.groupBy($"a", $"b").agg(
        count(lit(1)).as("n_union_kept"),
        max($"hv").as("theta"),
        sum($"ina" * $"inb").as("n_common"),
        sum($"ina" * (lit(1) - $"inb")).as("n_only_a"),
        sum((lit(1) - $"ina") * $"inb").as("n_only_b"))
      val unionRaw = graft.sketch.Kmv.estimateRaw($"n_union_kept", $"theta", k)
      agg.select($"a".as("source_a"), $"b".as("source_b"),
          $"n_union_kept", $"n_common", $"n_only_a", $"n_only_b",
          round(unionRaw, 6).as("union_est"),
          expr("(1000000 * n_common) DIV n_union_kept").as("jaccard_micro"),
          round(unionRaw * $"n_common".cast("double")
            / $"n_union_kept".cast("double"), 6).as("inter_est"))
        .orderBy($"source_a", $"source_b")
    }),

    // corpus-wide LINE-level dedup (the CCNet paragraph-dedup pass): docs
    // split into consecutive 10-token pseudo-lines, every occurrence of a
    // line after its global first (min (doc_id, idx)) is dropped — exact
    // keep-first dedup at sub-document granularity. Scale shape: one
    // tokenize+explode pass, one hash agg on the line hash (min-struct is
    // map-side combinable), one equi-join back — never all-pairs, no
    // window over the occurrence stream.
    "q220_line_dedup" -> ((s, dir) => {
      import s.implicits._
      val L = 10
      // the house HOF rule (PLANS.md q188): bind the token array ONCE as a
      // lambda variable — referencing an outer column inside a lambda can
      // re-run its whole expression tree per element
      val occ = t(s, dir, "documents")
        .select($"source", $"doc_id",
          TextFunctions.tokens(lower($"text")).as("tk"))
        .select($"source", $"doc_id", explode(expr(
          s"""transform(array(tk), tkv ->
             |  CASE WHEN size(tkv) = 0 THEN
             |    CAST(array() AS ARRAY<STRUCT<idx: INT, line: STRING, n_tok: INT>>)
             |  ELSE
             |    transform(sequence(1, CAST(ceil(size(tkv) / ${L}.0) AS INT)), i ->
             |      struct(i AS idx,
             |        concat_ws(' ', slice(tkv, (i - 1) * $L + 1, $L)) AS line,
             |        size(slice(tkv, (i - 1) * $L + 1, $L)) AS n_tok))
             |  END)[0]""".stripMargin)).as("ln"))
        .select($"source", $"doc_id", $"ln.idx".as("idx"),
          TextFunctions.md5Bucket60($"ln.line").as("hv"), $"ln.n_tok".as("n_tok"))
      val first = occ.groupBy($"hv")
        .agg(min(struct($"doc_id", $"idx")).as("f"))
      occ.join(first, "hv")
        .withColumn("kept",
          ($"doc_id" === $"f.doc_id" && $"idx" === $"f.idx").cast("int"))
        .groupBy($"source").agg(
          countDistinct($"doc_id").as("n_docs"),
          count(lit(1)).as("n_lines"),
          sum($"kept").as("n_kept"),
          sum($"n_tok").as("n_tokens"),
          sum((lit(1) - $"kept") * $"n_tok").as("tokens_removed"))
        .selectExpr("source", "n_docs", "n_lines", "n_kept",
          "n_lines - n_kept AS n_removed", "n_tokens", "tokens_removed",
          "(1000000 * tokens_removed) DIV n_tokens AS removed_ratio_micro")
        .orderBy($"source")
    }),

    // community detection: deterministic synchronous label propagation
    // (3 rounds, plurality-of-neighbors vote, min-label ties) over the
    // shared co-purchase graph — splits q133's connectivity into dense
    // communities; every iteration joins the label frame against the
    // cached hashpartitioning(a) adjacency, so only labels shuffle
    "q221_label_propagation" -> ((s, dir) => {
      import s.implicits._
      // checkSymmetry off: copurchaseAdj symmetrizes by construction
      // (union of both orientations), so the per-call anti-join guard
      // would just re-prove the constructor's own invariant
      graft.cluster.LabelPropagation.run(copurchaseAdj(s, dir), iters = 3,
          checkSymmetry = false)
        .groupBy($"lab".as("community"))
        .agg(count(lit(1)).as("n_members"), min($"node").as("rep_node"))
        .orderBy($"n_members".desc, $"community")
        .limit(20)
    }),

    // k-CORE decomposition (graph-density quality filter — spam rings and
    // boilerplate hosts live OUTSIDE the dense core of a web/link graph):
    // 8 synchronous peel rounds at k=2 over the shared co-purchase
    // adjacency — the fixed horizon reaches the peel fixpoint at every
    // shipped sf (measured ≤ 6 rounds), so the output IS the exact 2-core
    // with per-node in-core degree. Every round shuffles only the
    // shrinking survivor frame against the cached adjacency (the
    // q133/q221 iteration pattern); the oracle replays the same 8 rounds
    // as chained joins. KCore.run's default convergence probe stays ON:
    // at any sf where 8 rounds did NOT reach the fixpoint the engine
    // REFUSES loudly (r11's checkConverged) rather than serving the
    // 8-round superset the oracle would compute — a refusal surfaces as
    // a driver `err`, never as a silent engine/oracle agreement on a
    // non-core answer.
    "q231_kcore" -> ((s, dir) => {
      import s.implicits._
      graft.cluster.KCore.run(copurchaseAdj(s, dir), k = 2, rounds = 8,
          checkSymmetry = false)
        .orderBy($"node")
    }),

    // CCNet-style perplexity bucketing: per-source LM-score terciles
    // (head = most in-distribution third, tail = least) — the quality
    // stratification step a pre-training mixture samples from. Scores are
    // q132's integer micro-unit bigram-LM chain off the shared per-doc
    // bigram counts; the ntile window orders a per-source SCORE frame
    // (one row per doc), not the corpus explode.
    "q222_perplexity_buckets" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val dbg = docBigramCounts(s, dir)
      val c12 = dbg.groupBy($"w1", $"w2").agg(sum($"k").as("c12"))
      val c1 = c12.groupBy($"w1").agg(sum($"c12").as("c1"))
      val score = dbg.join(c12, Seq("w1", "w2")).join(c1, Seq("w1"))
        .selectExpr("doc_id", "k", "(1000000 * c12) DIV c1 AS p_micro")
        .groupBy($"doc_id")
        .agg(sum($"k").as("n_bigrams"), sum($"k" * $"p_micro").as("sum_p"))
        .selectExpr("doc_id", "sum_p DIV n_bigrams AS lm_score_micro")
      val bucketed = score
        .join(t(s, dir, "documents").select($"doc_id", $"source"), "doc_id")
        .withColumn("ppl_bucket", ntile(3).over(
          Window.partitionBy($"source")
            .orderBy($"lm_score_micro".desc, $"doc_id")).cast("long"))
      bucketed.groupBy($"source", $"ppl_bucket").agg(
          count(lit(1)).as("n_docs"),
          expr("sum(lm_score_micro) DIV count(1)").as("avg_score_micro"),
          min($"lm_score_micro").as("min_score_micro"),
          max($"lm_score_micro").as("max_score_micro"))
        .orderBy($"source", $"ppl_bucket")
    }),

    // LEAKAGE-SAFE train/val/test split: the split key is the near-dup
    // GROUP id (CC component min over the shared minhash candidate graph),
    // not the doc id — so two near-duplicate documents can never land in
    // different splits (the eval-contamination failure mode of naive
    // per-doc hashing). 80/10/10 by salted md5 of the group id; one CC
    // pass + one hash agg, all shared frames cached.
    "q223_group_split" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val cc = graft.cluster.ConnectedComponents.run(
        minhashCands(s, dir).select($"id_a".as("src"), $"id_b".as("dst")))
      val g = docs.select($"doc_id", $"source",
          TextFunctions.tokenCount($"text").cast("long").as("n_tokens"))
        .join(cc.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left_outer")
        .select($"doc_id", $"source", $"n_tokens",
          coalesce($"component", $"doc_id").as("group_id"))
      val bk = TextFunctions.md5Bucket16($"group_id".cast("string"), "split223|") % 100
      g.withColumn("split",
          when(bk < 80, "train").when(bk < 90, "val").otherwise("test"))
        .groupBy($"split", $"source").agg(
          count(lit(1)).as("n_docs"),
          countDistinct($"group_id").as("n_groups"),
          sum($"n_tokens").as("n_tokens"))
        .orderBy($"split", $"source")
    }),

    // contrastive training-pair mining: (anchor, positive) from the minhash
    // candidate graph rescored by exact Jaccard (≥ 0.2), negative drawn
    // deterministically per anchor — salted md5 of the anchor picks a
    // global doc RANK, ranks come from the bucketed prefix-sum
    // (Sharding.withTokenOffsets with weight 1), NOT a single-partition
    // row_number window; self/positive collisions are dropped. Everything
    // is md5-derived, so the oracle replays the sampling exactly.
    "q224_contrastive_pairs" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      // positives off the shared rescored-candidate cache (the q145 frame)
      val pos = candJaccard(s, dir)
        .selectExpr("id_a AS anchor", "id_b AS positive",
          "jac_micro AS pos_jaccard_micro")
        .where($"pos_jaccard_micro" >= 200000L)
      // global doc ranks WITHOUT a global window: exclusive running count
      // of earlier doc_ids via the bucketed parallel prefix-sum
      val ranks = graft.operators.Sharding.withTokenOffsets(
          docs.select($"doc_id").withColumn("one", lit(1L)), "one", "doc_id")
        .select($"doc_id".as("negative"), ($"tok_start" + 1L).as("neg_rk"))
      val n = broadcast(docs.agg(count(lit(1)).as("n")))
      pos.crossJoin(n)
        .withColumn("neg_rk",
          (TextFunctions.md5Bucket60(
            concat(lit("neg|"), $"anchor".cast("string"))) % $"n") + 1L)
        .join(ranks, "neg_rk")
        .where($"negative" =!= $"anchor" && $"negative" =!= $"positive")
        .select($"anchor", $"positive", $"negative", $"pos_jaccard_micro")
        .orderBy($"anchor", $"positive")
    }),

    // WINNOWING overlap detection (the MOSS fingerprinting scheme):
    // window-min selection over k-gram hashes guarantees any shared run of
    // ≥ k+w-1 tokens yields a shared fingerprint, at ~2/(w+1) the density
    // of full shingling. Pairing is a source-blocked equi-join on the
    // fingerprint hash (the q36/q218 blocking pattern) — never all-pairs —
    // with hot fingerprints (df > 32 within the (source, fp) blocking key)
    // dropped first: a boilerplate fingerprint shared by k docs would
    // otherwise fan out C(k,2) pair rows, quadratic in family size. The
    // cap sits far above this corpus's max per-source df (6 at sf0.1), so
    // the output is byte-identical to the uncapped spelling here while the
    // per-fingerprint fan-out is bounded at C(32,2) at ANY scale.
    "q225_winnowing" -> ((s, dir) => {
      import s.implicits._
      // k=3 matches the house 3-shingle grain; w=5 → guarantee on runs ≥ 7.
      // The extraction pass is materialized ONCE (the shingleMd5-cache
      // pattern): the df-cap agg, the anti-join, and both self-join sides
      // all read the checkpointed ~2/(w+1)-density fingerprint frame —
      // without this the HOF extraction re-runs once per consumer (3×).
      val raw = Dedup.winnowingFingerprints(
          t(s, dir, "documents").select($"source", $"doc_id", $"text"),
          k = 3, w = 5)
        .localCheckpoint(true)
      val fps = Dedup.capHotFingerprints(raw,
        maxDf = 32, keyCols = Seq("source", "fp"))
      val a = fps.toDF("source", "id_a", "fp")
      val b = fps.toDF("source", "id_b", "fp")
      a.join(b, Seq("source", "fp")).where($"id_a" < $"id_b")
        .groupBy($"source", $"id_a", $"id_b")
        // fp is distinct per doc, so count(*) = #shared distinct fingerprints
        .agg(count(lit(1)).as("n_shared_fp"))
        .orderBy($"source", $"id_a", $"id_b")
    }),

    // BENCHMARK-CONTAMINATION report (the GPT-3/PaLM-style n-gram-overlap
    // decontamination pass): deterministic eval split (doc_id % 41 = 0),
    // per-train-doc count of distinct n-grams shared with ANY eval doc,
    // rolled up per source. n=4 because the synthetic corpus's longest
    // cross-doc shared runs are 4 tokens (measured: 10 contaminated docs
    // at sf0.01, 0 at n >= 5) — production runs use n=8..13, the same
    // plan shape. Scale shape: the eval gram-hash set broadcasts (eval
    // benchmarks are small by contract); the corpus side is ONE map-side
    // HOF extraction + broadcast left join + hash agg — the corpus gram
    // stream never shuffles to the eval side.
    "q230_contamination" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.fanOut(t(s, dir, "documents")).select($"source", $"doc_id", $"text")
      val train = docs.where($"doc_id" % 41 =!= 0)
      // eval gram set off the shared session cache (built once, persisted)
      // — q233 removes against the SAME benchmark, so the eval-side
      // extract+distinct is one pass, not one per query (r11 advice 6)
      graft.text.Decontamination.contaminationFromGrams(
          train, decontamEvalGrams(s, dir), n = 4)
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when($"n_contaminated" > 0L, 1L).otherwise(0L)).as("n_contaminated_docs"),
          sum($"n_grams").as("n_grams"),
          sum($"n_contaminated").as("n_contaminated_grams"))
        .selectExpr("source", "n_docs", "n_contaminated_docs", "n_grams",
          "n_contaminated_grams",
          "(1000000 * n_contaminated_grams) DIV n_grams AS contam_micro")
        .orderBy($"source")
    }),

    // BENCHMARK DECONTAMINATION — removal, not just measurement (the
    // r10 task-5 ask): drop every training document sharing ANY 4-gram
    // with the eval split (maxContaminated = 0), then checksum the
    // CLEANED corpus per source. Same eval split and gram grain as q230,
    // so the two queries cross-check: q233's kept docs are exactly
    // q230's n_contaminated = 0 docs plus the sub-4-token ones. Scale
    // shape: q230's measured-broadcast join + an anti-join of the small
    // flagged-key set back against the corpus (the q139/q225 shapes).
    "q233_decontaminate" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.fanOut(t(s, dir, "documents")).select($"source", $"doc_id", $"text")
      val train = docs.where($"doc_id" % 41 =!= 0)
      graft.text.Decontamination.decontaminateFromGrams(
          train, decontamEvalGrams(s, dir), n = 4, maxContaminated = 0L)
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          sum($"doc_id").as("id_checksum"),
          sum(length($"text").cast("long")).as("len_checksum"))
        .orderBy($"source")
    }),

    // STREAMING contamination monitor — q230's measured join as a
    // stream-static probe (the q195 ingest shape, r11 optional breadth):
    // training documents arrive as a file stream, each micro-batch
    // extracts its per-doc-distinct 4-grams STATELESSLY (map-side HOF +
    // explode — no stream-side aggregation before the join) and
    // stream-static joins the session-cached eval gram set through the
    // SAME measured broadcast-vs-shuffle cutover as the batch path; the
    // only streaming state is the per-SOURCE complete-mode rollup (one
    // row per source — 20 here — bounded however big the stream). The
    // oracle replays q230's gram math summed straight to source grain.
    "q235_stream_decontamination" -> ((s, dir) => {
      import s.implicits._
      val srcDir = StreamScaffold.stageTable(s, dir, "documents")
      val evalSide = graft.text.Decontamination.measuredEvalSide(
        decontamEvalGrams(s, dir))
      StreamScaffold.runCompleteStream(s, "q235", dir, srcDir) { src =>
        graft.text.Decontamination.gramHashes(
            src.where($"doc_id" % 41 =!= 0).select($"source", $"doc_id", $"text"),
            "text", n = 4)
          .join(evalSide, Seq("gh"), "left_outer")
          .groupBy($"source")
          .agg(count(lit(1)).as("n_grams"),
            sum(when($"__hit".isNotNull, 1L).otherwise(0L)).as("n_contaminated_grams"))
      }.selectExpr("source", "n_grams", "n_contaminated_grams",
          "(1000000 * n_contaminated_grams) DIV n_grams AS contam_micro")
        .orderBy($"source")
    }),

    // near-dup GROUP extraction: connected components over the minhash
    // candidate graph → canonical keep-doc per group (the step after
    // pairwise candidates in a real dedup pipeline)
    "q57_dedup_groups" -> ((s, dir) => {
      Dedup.dedupGroupsFromPairs(t(s, dir, "documents"), minhashCands(s, dir))
        .orderBy("group_id")
    }),

    // the LITERAL GraphX connectedComponents() API over the same shared
    // candidate graph — q57's star-contraction twin (GraphX is O(diameter)
    // Pregel: right for this small short-chain graph, wrong for the
    // epsilon graph — see ConnectedComponentsGraphX scaladoc); identical
    // output, identical oracle, independent cross-check of the CC operator
    "q151_dedup_groups_graphx" -> ((s, dir) => {
      import s.implicits._
      // GraphX CC is Pregel — supersteps × partitions tasks — and the
      // candidate graph is a few hundred edges: shrink the edge layout to
      // a data-derived partition count (the copurchaseAdj rule) so each
      // superstep runs 2 tasks, not 32 (task-time 51s -> ~2s at sf0.1)
      val cands = minhashCands(s, dir)
      val cc = graft.cluster.ConnectedComponentsGraphX.run(
        cands.select($"id_a".as("src"), $"id_b".as("dst"))
          .repartition(Tables.adaptiveParts(s, cands.count())))
      Dedup.dedupGroupsFromComponents(t(s, dir, "documents"), cc)
        .orderBy("group_id")
    }),

    // int8 max-abs embedding quantization — the storage-compression step;
    // map-side only. Codes stringified: the driver's pandas compare can't
    // sort array cells (q42 precedent).
    "q70_embed_quantize" -> ((s, dir) => {
      import s.implicits._
      Similarity.quantizeInt8(t(s, dir, "embeddings"))
        .withColumn("codes", array_join(transform($"codes", c => c.cast("string")), ","))
        .orderBy($"vec_id")
    }),

    // k-ring neighborhood density (spatial smoothing / hotspot pre-pass):
    // per-cell counts, then each occupied cell's (2k+1)² Chebyshev block
    // total via ring-explode + equi-join on cell id — never a spatial
    // cross join; the oracle replays the ring arithmetic (lat clips,
    // lng wraps) from the cell indices
    "q108_ring_density" -> ((s, dir) => {
      import s.implicits._
      ringDensity(s, dir).orderBy($"cell")
    }),

    // feature hashing (the hashing trick): categorical (event_type, k)
    // pairs land in a fixed 32-bucket feature space, collisions summed —
    // bounded-width featurization with no vocabulary pass
    "q125_feature_hash" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events").select($"user_id",
        concat($"event_type", lit(":"),
          get_json_object($"props", "$.k").cast("long") % 10).as("feat"),
        $"value")
      ev.select($"user_id",
          (TextFunctions.md5Bucket16($"feat", "fh|") % 32).as("feature_idx"),
          $"value")
        .groupBy($"user_id", $"feature_idx")
        .agg(sum($"value".cast("decimal(18,6)")).cast("double").as("feature_val"))
        .orderBy($"user_id", $"feature_idx")
    }),

    // bigram language-model estimation: conditional probabilities from
    // integer counts (the n-gram LM the repetition/contamination family
    // builds toward); top continuation per head word via window
    "q126_bigram_lm" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      // corpus LM off the shared per-doc counts: sum out doc_id for c12,
      // sum out w2 for c1 — no second pass over the documents explode
      val c12 = docBigramCounts(s, dir)
        .groupBy($"w1", $"w2").agg(sum($"k").as("c12"))
      val c1 = c12.groupBy($"w1").agg(sum($"c12").as("c1"))
      val ranked = c12.join(c1, "w1")
        .withColumn("p", round($"c12".cast("double") / $"c1".cast("double"), 6))
        .withColumn("rn", row_number().over(
          Window.partitionBy($"w1").orderBy($"c12".desc, $"w2")))
      ranked.where($"rn" === 1)
        .select($"w1", $"w2".as("top_w2"), $"c1", $"c12", $"p")
        .orderBy($"w1")
    }),

    // Count-Min sketch: frequency estimation in d×w bounded space (the
    // complement of q76's KMV distinct sketch) — estimates for the 10
    // hottest users joined against their exact counts; est >= exact
    // always, collisions only inflate
    "q124_countmin" -> ((s, dir) => {
      import s.implicits._
      // explicit null filter so Spark and the oracle see the same key
      // domain even if events ever carries null user_ids (CountMin.build
      // drops nulls internally; `exact` would not)
      val ev = t(s, dir, "events").select($"user_id").where($"user_id".isNotNull)
      val cms = graft.sketch.CountMin.build(ev, "user_id", w = 64, d = 4)
      val exact = ev.groupBy($"user_id").agg(count(lit(1)).as("exact_n"))
      val top = exact.orderBy($"exact_n".desc, $"user_id").limit(10)
      graft.sketch.CountMin.estimate(cms, top, "user_id", w = 64, d = 4)
        .join(top, Seq("user_id"))
        .orderBy($"user_id")
    }),

    // rolling 7-day distinct actives (DAU/WAU): the distinct-day intervals
    // go through the bucketized RangeJoin — never a nested-loop BETWEEN —
    // and day arithmetic stays integer (epoch days) on both engines
    "q123_rolling_dau" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events").select($"user_id",
        expr("ts DIV 1000 DIV 86400000000").as("d"))
      val daily = ev.groupBy($"d").agg(countDistinct($"user_id").as("dau"))
      val ivals = ev.select($"d").distinct()
        .select($"d".as("day"), ($"d" - 6).as("w_start"), $"d".as("w_end"))
      graft.operators.RangeJoin.pointInInterval(
          ev.select($"user_id", $"d"), ivals, keyCols = Seq.empty,
          pointCol = "d", startCol = "w_start", endCol = "w_end", bucketWidth = 7L)
        .groupBy($"day").agg(countDistinct($"user_id").as("wau"))
        .join(daily, $"day" === daily("d")).drop("d")
        .select($"day", $"dau", $"wau")
        .orderBy($"day")
    }),

    // cell-equality point lookup over a REAL parquet table: the
    // CellRangePushdown rule turns the opaque geo_cell equality into
    // lat/lng ranges that reach PushedFilters — row-group pruning for a
    // 100 TB lookup (plan audit pins the pushed ranges)
    "q122_cell_lookup" -> ((s, dir) => {
      import s.implicits._
      val p = stagePointsLookup(s, dir)
      s.read.parquet(p).createOrReplaceTempView("graft_points_t")
      s.sql(s"""SELECT count(*) AS n,
               |  CAST(sum(CAST(amount AS DECIMAL(18,2))) AS DOUBLE) AS total
               |FROM graft_points_t
               |WHERE geo_cell(latitude, longitude, 10) = '${Q122Cell}'""".stripMargin)
    }),

    // multiset set operations (INTERSECT ALL / EXCEPT ALL — min/diff of
    // multiplicities, the semantics q44's distinct variants don't cover)
    "q119_set_ops_all" -> ((s, dir) => {
      import s.implicits._
      val orders = t(s, dir, "orders")
      val a = orders.filter($"o_totalprice" > 150000.0).select($"o_custkey")
      val b = orders.filter($"o_orderpriority".isin("1-URGENT", "2-HIGH"))
        .select($"o_custkey")
      val i = a.intersectAll(b).select(lit("intersect_all").as("op"), $"o_custkey")
      val e = a.exceptAll(b).select(lit("except_all").as("op"), $"o_custkey")
      i.unionAll(e).groupBy($"op", $"o_custkey").agg(count(lit(1)).as("n"))
        .orderBy($"op", $"o_custkey")
    }),

    // UNPIVOT (wide → long, the inverse of q62's pivot) through the SQL
    // surface
    "q120_unpivot" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("graft_orders")
      s.sql("""SELECT o_orderpriority, status, cnt FROM (
              |  SELECT o_orderpriority,
              |    count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS f,
              |    count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS o,
              |    count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS p
              |  FROM graft_orders GROUP BY 1)
              |UNPIVOT (cnt FOR status IN (f, o, p))
              |ORDER BY o_orderpriority, status""".stripMargin)
    }),

    // ANSI null semantics pinned: NOT IN against a set containing NULL is
    // empty; NOT EXISTS is the null-safe spelling — the classic silent-
    // wrong-answer trap, asserted identical across engines
    "q121_not_in_nulls" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("graft_customer")
      t(s, dir, "orders").createOrReplaceTempView("graft_orders")
      s.sql("""WITH probe AS (SELECT o_custkey FROM graft_orders WHERE o_orderstatus = 'P'
              |               UNION ALL SELECT CAST(NULL AS BIGINT))
              |SELECT
              |  (SELECT count(*) FROM graft_customer
              |   WHERE c_custkey NOT IN (SELECT o_custkey FROM probe)) AS n_not_in,
              |  (SELECT count(*) FROM graft_customer c
              |   WHERE NOT EXISTS (SELECT 1 FROM probe p
              |                     WHERE p.o_custkey = c.c_custkey)) AS n_not_exists""".stripMargin)
    }),

    // VARIANT semi-structured type (new in Spark 4): parse once, typed
    // extraction downstream — the open-schema path next to q106's
    // string-at-a-time get_json_object
    "q117_variant" -> ((s, dir) => {
      t(s, dir, "events").createOrReplaceTempView("graft_events")
      s.sql("""WITH v AS (SELECT event_type,
              |  variant_get(parse_json(props), '$.k', 'long') AS k FROM graft_events)
              |SELECT event_type, count(k) AS n,
              |  sum(CASE WHEN k % 2 = 0 THEN k END) AS sum_even_k, max(k) AS max_k
              |FROM v GROUP BY 1 ORDER BY 1""".stripMargin)
    }),

    // correlated LATERAL subquery (top-1-per-row without a window): each
    // customer's latest order
    "q118_lateral" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("graft_customer")
      t(s, dir, "orders").createOrReplaceTempView("graft_orders")
      s.sql("""SELECT c.c_custkey, l.o_orderkey, l.o_totalprice
              |FROM graft_customer c,
              |LATERAL (SELECT o_orderkey, o_totalprice FROM graft_orders o
              |         WHERE o.o_custkey = c.c_custkey
              |         ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1) AS l
              |ORDER BY c.c_custkey""".stripMargin)
    }),

    // recursive CTE through the SQL surface (new in Spark 4): ancestor
    // walk over a deterministic binary hierarchy on part keys — the same
    // recursion DuckDB runs for q57's closure oracle, now engine-side
    "q116_recursive_cte" -> ((s, dir) => {
      t(s, dir, "part").createOrReplaceTempView("graft_part")
      s.sql("""WITH RECURSIVE anc(p, a, depth) AS (
              |  SELECT p_partkey, p_partkey, 0 FROM graft_part WHERE p_partkey < 128
              |  UNION ALL
              |  SELECT p, a DIV 2, depth + 1 FROM anc WHERE a > 1
              |)
              |SELECT p AS part_id, CAST(max(depth) AS BIGINT) AS depth_to_root
              |FROM anc GROUP BY p ORDER BY p""".stripMargin)
    }),

    // explicit GROUPING SETS with grouping markers (the general form
    // behind q29's ROLLUP and q85's CUBE)
    "q115_grouping_sets" -> ((s, dir) => {
      t(s, dir, "documents").createOrReplaceTempView("graft_documents")
      s.sql("""SELECT lang, source, grouping(lang) AS g_lang,
              |  grouping(source) AS g_source,
              |  count(*) AS n_docs, sum(n_chars) AS sum_chars
              |FROM graft_documents
              |GROUP BY GROUPING SETS ((lang), (source), ())
              |ORDER BY g_lang, g_source, lang NULLS FIRST, source NULLS FIRST""".stripMargin)
    }),

    // fuzzy string matching (entity resolution): probes with an injected
    // typo rejoined to the master list. EXACT pigeonhole blocking: with
    // equal lengths, levenshtein ≤ 1 means ≤ 1 substitution, so one of
    // the two string halves matches exactly — candidates come from two
    // (length, half) equi-joins instead of length-block × levenshtein
    // over every pair (7.9 s → sub-second at sf0.1; no false negatives)
    "q114_fuzzy_match" -> ((s, dir) => {
      import s.implicits._
      def keyed(d: org.apache.spark.sql.DataFrame, nameCol: String) = d
        .withColumn("__len", length(col(nameCol)))
        .withColumn("__h1", substring(col(nameCol), 1, 9))
        .withColumn("__h2", expr(s"substring($nameCol, 10)"))
      val cust = keyed(t(s, dir, "customer").select($"c_custkey", $"c_name"), "c_name")
      val probes = keyed(
        t(s, dir, "customer").where($"c_custkey" % 97 === 0)
          .select($"c_custkey".as("probe_id"),
            concat(substring($"c_name", 1, 5), lit("X"),
              substring($"c_name", 7, 10000)).as("probe_name")),
        "probe_name")
      val p = probes.select($"probe_id", $"probe_name",
        $"__len".as("pl"), $"__h1".as("p1"), $"__h2".as("p2"))
      val cands = p.join(cust, $"pl" === $"__len" && $"p1" === $"__h1")
        .unionByName(p.join(cust, $"pl" === $"__len" && $"p2" === $"__h2"))
        .select($"probe_id", $"probe_name", $"c_custkey", $"c_name").distinct()
      cands.where(levenshtein($"probe_name", $"c_name") <= 1)
        .select($"probe_id", $"c_custkey",
          levenshtein($"probe_name", $"c_name").cast("long").as("dist"))
        .orderBy($"probe_id", $"c_custkey")
    }),

    // ORC source/sink round-trip (completes the format matrix with q20
    // CSV and q46 JSONL): engine-side format fidelity — the oracle reads
    // the same rows from the parquet original
    "q111_orc_roundtrip" -> ((s, dir) => {
      import s.implicits._
      val path = scratch(q111OrcPat, dir)
      t(s, dir, "orders").where($"o_orderstatus" === "F")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice", $"o_orderpriority")
        .write.mode("overwrite").orc(path)
      s.read.orc(path)
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum($"o_totalprice".cast("decimal(18,2)")).cast("double").as("total"))
        .orderBy($"o_orderpriority")
    }),

    // sentence segmentation stats (regex split, empties dropped on both
    // engines explicitly — trailing-empty semantics differ by default)
    "q112_sentence_stats" -> ((s, dir) => {
      import s.implicits._
      val sent = filter(split($"text", "[.!?] "), x => x =!= lit(""))
      t(s, dir, "documents").select($"doc_id",
          size(sent).cast("long").as("n_sentences"),
          round(coalesce(
            aggregate(sent, lit(0L), (acc, x) => acc + length(x)).cast("double") /
              nullif(size(sent), lit(0)).cast("double"), lit(0.0)), 6)
            .as("avg_sentence_chars"))
        .orderBy($"doc_id")
    }),

    // ranking-function matrix: dense_rank / percent_rank / cume_dist over
    // a total per-group order (all deterministic integer-ratio arithmetic)
    "q113_rank_functions" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"event_type").orderBy($"value", $"event_id")
      t(s, dir, "events").select($"event_type", $"event_id", $"value")
        .select($"event_type", $"event_id",
          dense_rank().over(w).cast("long").as("drank"),
          round(percent_rank().over(w), 6).as("prank"),
          round(cume_dist().over(w), 6).as("cdist"))
        .orderBy($"event_type", $"event_id")
    }),

    // hotspot detection (Getis-Ord-flavored): ring densities z-scored
    // against the global ring-density distribution — exact integer moments,
    // float division spelled like the oracle (q103 pattern)
    "q109_hotspots" -> ((s, dir) => {
      import s.implicits._
      val dens = ringDensity(s, dir).select($"cell", $"ring_n")
      val stats = dens.agg(count(lit(1)).as("cnt"),
        sum($"ring_n").cast("double").as("s"),
        sum($"ring_n" * $"ring_n").cast("double").as("ss"))
      dens.join(broadcast(stats))
        .select($"cell", $"ring_n",
          round(($"ring_n" - $"s" / $"cnt") /
            sqrt(($"ss" - $"s" * $"s" / $"cnt") / $"cnt"), 6).as("z"))
        .where($"z" >= 2.0)
        .orderBy($"cell")
    }),

    // per-entity trajectory length: haversine between consecutive points
    // in event order, step-rounded then decimal-summed so the float total
    // is plan-order independent
    "q110_trajectory" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val pts = li.join(o, li("l_orderkey") === o("o_orderkey")).select(
        o("o_custkey").as("u"),
        (lit(40.70) + (li("l_partkey") % 1000) * lit(6e-5)).as("lat"),
        (lit(-74.02) + (li("l_suppkey") % 1000) * lit(8e-5)).as("lng"),
        o("o_orderdate").as("d"), li("l_orderkey").as("ok"), li("l_linenumber").as("ln"))
      // (d, ok, ln) is NOT total in this data (duplicate line numbers);
      // lat/lng complete the order — rows still tied are identical points,
      // so any pairing yields the same step distances
      val w = Window.partitionBy($"u").orderBy($"d", $"ok", $"ln", $"lat", $"lng")
      val steps = pts
        .withColumn("plat", lag($"lat", 1).over(w))
        .withColumn("plng", lag($"lng", 1).over(w))
      steps.groupBy($"u")
        .agg(count($"plat").as("n_steps"),
          coalesce(sum(round(graft.functions.GeoFunctions
              .haversineMeters($"plat", $"plng", $"lat", $"lng"), 3)
            .cast("decimal(18,3)")).cast("double"), lit(0.0)).as("total_m"))
        .orderBy($"u")
    }),

    // semi-structured column processing: JSON field extraction + typed
    // aggregation over the events props payload
    "q106_json_extract" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .select($"event_type",
          get_json_object($"props", "$.k").cast("long").as("k"))
        .groupBy($"event_type")
        .agg(count($"k").as("n"), min($"k").as("min_k"),
          max($"k").as("max_k"), sum($"k").as("sum_k"))
        .orderBy($"event_type")
    }),

    // ordered string aggregation (sorted-distinct concat per group)
    "q107_string_agg" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders").groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n"),
          array_join(array_sort(collect_set($"o_orderpriority")), "|")
            .as("priorities"))
        .orderBy($"o_orderstatus")
    }),

    // deterministic domain mixing — the pretraining data-mix step: each
    // source keeps a hash-Bernoulli fraction (replayable: same doc set on
    // every run/engine); per-source counts plus an xor checksum of the
    // kept ids pin the exact membership, not just the rate
    "q105_domain_mix" -> ((s, dir) => {
      import s.implicits._
      val thr = when($"source" === "src0", 10000)
        .when($"source" === "src1", 5000)
        .when($"source" === "src2", 2500)
        .otherwise(1000)
      t(s, dir, "documents")
        .withColumn("keep",
          (TextFunctions.md5Bucket16($"doc_id".cast("string"), "mix|") % 10000 < thr)
            .cast("int"))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_total"),
          sum($"keep").cast("long").as("n_kept"),
          expr("bit_xor(CASE WHEN keep = 1 THEN doc_id END)").as("kept_xor"))
        .orderBy($"source")
    }),

    // Spark 4's transformWithState (the arbitrary-state successor to
    // flatMapGroupsWithState): running per-user totals in a ValueState
    // under the RocksDB store, snapshot per key per batch; values arrive
    // as integer micros so the state fold is exact and order-independent
    "q104_transform_with_state" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
      val srcDir = StreamScaffold.stageTable(s, dir, "events")
      val providerKey = "spark.sql.streaming.stateStore.providerClass"
      val prev = s.conf.getOption(providerKey)
      s.conf.set(providerKey,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        StreamScaffold.runStagedStream(s, "q104", dir, srcDir) { mk =>
          mk().select($"user_id",
              expr("CAST(round(value * 1000000) AS BIGINT)").as("v_micros"))
            .as[(Long, Long)]
            .groupByKey(_._1)
            .transformWithState(new graft.streaming.UserTotalsProcessor,
              TimeMode.None(), OutputMode.Append())
            .toDF("user_id", "n_events", "sum_micros")
        }.orderBy($"user_id")
      } finally {
        prev match {
          case Some(p) => s.conf.set(providerKey, p)
          case None => s.conf.unset(providerKey)
        }
      }
    }),

    // triangle counting over the co-purchase graph (parts sharing ≥ 2
    // orders — the single-co-occurrence noise floor a co-purchase analysis
    // applies anyway): compact-forward wedge join with DEGREE-ORDERED
    // orientation — every edge points from its lower-(degree, id) endpoint
    // to the higher, so each triangle materializes exactly once at its
    // lowest-degree corner and the hottest vertex's wedge fanout is
    // O(m^1.5) total instead of O(maxdeg²) (a hub vertex never fans out)
    // degree distribution of the co-purchase graph (the skew diagnostic
    // read before choosing the q101 orientation strategy)
    "q128_degree_hist" -> ((s, dir) => {
      import s.implicits._
      val raw = copurchaseEdges(s, dir)
      raw.select($"u".as("n")).unionAll(raw.select($"v".as("n")))
        .groupBy($"n").agg(count(lit(1)).as("d"))
        .groupBy($"d").agg(count(lit(1)).as("n_vertices"))
        .orderBy($"d")
    }),

    // global clustering coefficient: 3·triangles / wedges over the same
    // weight-filtered co-purchase graph as q101 — wedges counted from the
    // degree table (deg·(deg−1)/2 per vertex), never enumerated
    "q127_clustering_coeff" -> ((s, dir) => {
      import s.implicits._
      val raw = copurchaseEdges(s, dir)
      val deg = raw.select($"u".as("n")).unionAll(raw.select($"v".as("n")))
        .groupBy($"n").agg(count(lit(1)).as("d"))
      val edges = copurchaseOriented(s, dir)
      val wedgePairs = edges.as("ab").join(edges.as("ac"), col("ab.a") === col("ac.a"))
        .where(col("ab.db") < col("ac.db") ||
          (col("ab.db") === col("ac.db") && col("ab.b") < col("ac.b")))
      val tri = wedgePairs.join(edges.as("bc"),
        col("bc.a") === col("ab.b") && col("bc.b") === col("ac.b"))
      val wedges = deg.agg(sum(expr("d * (d - 1) DIV 2")).as("n_wedges"))
      wedges.crossJoin(tri.agg(count(lit(1)).as("n_triangles")))
        .select($"n_wedges", $"n_triangles",
          round($"n_triangles" * 3.0 / $"n_wedges", 6).as("clustering_coeff"))
    }),

    "q101_triangles" -> ((s, dir) => {
      import s.implicits._
      val edges = copurchaseOriented(s, dir)
      val wedges = edges.as("ab").join(edges.as("ac"), col("ab.a") === col("ac.a"))
        .where(col("ab.db") < col("ac.db") ||
          (col("ab.db") === col("ac.db") && col("ab.b") < col("ac.b")))
      val tri = wedges.join(edges.as("bc"),
        col("bc.a") === col("ab.b") && col("bc.b") === col("ac.b"))
      edges.agg(count(lit(1)).as("n_edges"),
          countDistinct($"a").as("n_left_nodes"))
        .crossJoin(tri.agg(count(lit(1)).as("n_triangles")))
    }),

    // SCD Type-2 history build: compress per-user event-type runs into
    // validity intervals (valid_from, valid_to; open interval = current)
    "q102_scd2" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      val base = t(s, dir, "events").select($"user_id",
        $"event_type".as("state"), expr("ts DIV 1000").as("ts_us"), $"event_id")
      val changes = base
        .withColumn("prev_state", lag($"state", 1).over(w))
        .where($"prev_state".isNull || $"prev_state" =!= $"state")
      changes
        .withColumn("valid_to", lead($"ts_us", 1).over(w))
        .select($"user_id", $"state", $"ts_us".as("valid_from"), $"valid_to")
        .orderBy($"user_id", $"valid_from")
    }),

    // per-group z-score normalization from EXACT decimal moments (sum,
    // sum-of-squares) — the float division spelled operand-for-operand
    // like the oracle so both engines produce the same IEEE doubles
    "q103_zscore" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
      val dec = $"value".cast("decimal(18,6)")
      val stats = ev.groupBy($"event_type").agg(
        count(lit(1)).as("n"),
        sum(dec).cast("double").as("s"),
        sum(dec * dec).cast("double").as("ss"))
      ev.join(broadcast(stats), Seq("event_type"))
        .select($"event_id", $"event_type",
          round(($"value" - $"s" / $"n") /
            sqrt(($"ss" - $"s" * $"s" / $"n") / $"n"), 6).as("z"))
        .orderBy($"event_id")
    }),

    // LOCF imputation (last observation carried forward): gap-fill nulls
    // from the most recent non-null per entity — the time-series feature
    // repair pass; nulls injected deterministically so the fill provably
    // fires
    "q96_locf_impute" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val ev = t(s, dir, "events").select($"user_id", $"event_id", $"ts",
        when($"event_id" % 13 === 0, lit(null).cast("double"))
          .otherwise($"value").as("v"))
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.select($"user_id", $"event_id", $"v",
          last($"v", ignoreNulls = true).over(w).as("v_filled"))
        .orderBy($"user_id", $"event_id")
    }),

    // event-type transition counts (first-order Markov edges) per the
    // session order — the behavioral-sequence feature
    "q97_event_transitions" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      t(s, dir, "events").select($"user_id", $"ts", $"event_id", $"event_type")
        .withColumn("prev", lag($"event_type", 1).over(w))
        .where($"prev".isNotNull)
        .groupBy($"prev", $"event_type")
        .agg(count(lit(1)).as("n"))
        .orderBy($"prev", $"event_type")
    }),

    // cohort retention: users bucketed by first-activity month, distinct
    // actives per (cohort, months-since) — integer month arithmetic so
    // both engines agree exactly
    "q98_cohort_retention" -> ((s, dir) => {
      import s.implicits._
      val act = t(s, dir, "events").select($"user_id",
          date_trunc("month", expr("timestamp_micros(ts DIV 1000)"))
            .cast("date").as("m")).distinct()
      val cohort = act.groupBy($"user_id").agg(min($"m").as("c"))
      act.join(cohort, Seq("user_id"))
        .select($"c".as("cohort"),
          (year($"m") * 12 + month($"m") - year($"c") * 12 - month($"c"))
            .cast("long").as("months_since"), $"user_id")
        .groupBy($"cohort", $"months_since")
        .agg(countDistinct($"user_id").as("n_users"))
        .orderBy($"cohort", $"months_since")
    }),

    // ordered funnel: view → click → purchase with strictly increasing
    // first-touch times, counted in one aggregate pass
    "q99_funnel" -> ((s, dir) => {
      import s.implicits._
      val f = t(s, dir, "events").groupBy($"user_id").agg(
        min(when($"event_type" === "view", $"ts")).as("t_view"),
        min(when($"event_type" === "click", $"ts")).as("t_click"),
        min(when($"event_type" === "purchase", $"ts")).as("t_buy"))
      f.agg(
        count(when($"t_view".isNotNull, 1)).as("n_view"),
        count(when($"t_view" < $"t_click", 1)).as("n_view_click"),
        count(when($"t_view" < $"t_click" && $"t_click" < $"t_buy", 1))
          .as("n_full_funnel"))
    }),

    // key-skew report: hottest keys with share-of-total — the diagnostic
    // a pipeline runs before choosing a salting strategy. The total is a
    // broadcast scalar (agg + crossJoin(broadcast)), NOT a
    // Window.partitionBy() global window: the per-user frame is O(#users)
    // and funnelling it through one partition just to divide by the total
    // is the exact single-partition collapse this query diagnoses.
    "q100_skew_report" -> ((s, dir) => {
      import s.implicits._
      val counts = t(s, dir, "events")
        .groupBy($"user_id").agg(count(lit(1)).as("n"))
        .localCheckpoint(true)
      val tot = counts.agg(sum($"n").as("tot"))
      counts.crossJoin(broadcast(tot))
        .withColumn("pct", round($"n" * 100.0 / $"tot", 6))
        .drop("tot")
        .orderBy($"n".desc, $"user_id").limit(10)
    }),

    // per-group top-k via bounded heaps — the map-side-combine answer the
    // window row_number spelling can't give at scale (it sorts every row);
    // contract-equal to the window, which the oracle replays
    "q91_topk_agg" -> ((s, dir) => {
      import s.implicits._
      graft.operators.TopK.topK(t(s, dir, "events"),
          keyCol = "event_type", valueCol = "value", idCol = "event_id", k = 3)
        .orderBy($"event_type", $"rank")
    }),

    // left-semi join (the IN-subquery physical shape)
    "q92_semi_join" -> ((s, dir) => {
      import s.implicits._
      val cust = t(s, dir, "customer")
      val big = t(s, dir, "orders").where($"o_totalprice" > 200000)
      cust.join(big, cust("c_custkey") === big("o_custkey"), "left_semi")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    }),

    // correlated EXISTS + scalar subquery through the SQL surface (the
    // threshold is max*0.5 — exact double arithmetic, engine-identical)
    "q93_sql_subqueries" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("graft_customer")
      t(s, dir, "orders").createOrReplaceTempView("graft_orders")
      s.sql("""SELECT c_mktsegment, count(*) AS n_cust,
              |  CAST(sum(CASE WHEN EXISTS (
              |    SELECT 1 FROM graft_orders o
              |    WHERE o.o_custkey = c.c_custkey
              |      AND o.o_totalprice > (SELECT max(o_totalprice) * 0.5 FROM graft_orders)
              |  ) THEN 1 ELSE 0 END) AS BIGINT) AS n_big
              |FROM graft_customer c GROUP BY 1 ORDER BY 1""".stripMargin)
    }),

    // null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    // match each other exactly once per NULL dim row
    "q94_nullsafe_join" -> ((s, dir) => {
      import s.implicits._
      val a = t(s, dir, "orders").select(
        when($"o_orderkey" % 100 === 0, lit(null).cast("long"))
          .otherwise($"o_orderkey" % 50).as("k"))
      val b = s.range(50).select($"id".as("k"))
        .unionByName(s.range(1).select(lit(null).cast("long").as("k")))
      a.join(b, a("k") <=> b("k"))
        .select(coalesce(a("k"), lit(-1L)).as("k_group"))
        .groupBy($"k_group").agg(count(lit(1)).as("n"))
        .orderBy($"k_group")
    }),

    // calendar rollup: month truncation + decimal revenue
    "q95_monthly_rollup" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .groupBy(date_trunc("month", $"o_orderdate").cast("date").as("month"))
        .agg(count(lit(1)).as("n_orders"),
          sum($"o_totalprice".cast("decimal(18,2)")).cast("double").as("revenue"))
        .orderBy($"month")
    }),

    // streaming session windows: the q82 aggregate through a REAL stream
    // (complete mode + foreachBatch snapshot, the q49 pattern); the
    // AvailableNow single-batch run's final state is the batch answer
    "q86_stream_session" -> ((s, dir) => {
      import s.implicits._
      val srcDir = StreamScaffold.stageTable(s, dir, "events")
      StreamScaffold.runCompleteStream(s, "q86", dir, srcDir) { src =>
        src.select($"user_id", expr("timestamp_micros(ts DIV 1000)").as("ts"))
          .withWatermark("ts", "1 hour")
          .groupBy($"user_id", session_window($"ts", "30 minutes").as("w"))
          .agg(count(lit(1)).as("n_events"))
          .select($"user_id", unix_micros($"w.start").as("session_start_us"),
            unix_micros($"w.end").as("session_end_us"), $"n_events")
      }.orderBy($"user_id", $"session_start_us")
    }),

    // streaming CDC apply: per-batch keep-latest compaction MERGEd into a
    // seeded target table via foreachBatch — the stream-to-warehouse
    // upsert pattern (Delta's MERGE sink spelled over parquet)
    "q87_stream_upsert" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val srcDir = StreamScaffold.stageTable(s, dir, "events")
      val tag = Tables.sfTag(dir)
      val target = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft_q87_tgt_$tag").toString
      // seeded rows no update touches — they must survive every merge
      s.range(5).select(($"id" + 1000000L).as("user_id"), lit(-1L).as("event_id"),
          lit(0L).as("ts_us"), lit(0.0).as("value"))
        .write.mode("overwrite").parquet(target)
      val schema = s.read.parquet(srcDir).schema
      val chk = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft_q87_chk_$tag").toString
      val fs = new org.apache.hadoop.fs.Path(chk)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(chk), true)
      val applyBatch: (DataFrame, Long) => Unit = (batch, _) => {
        val byKey = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us").desc, col("event_id").desc)
        val latest = batch
          .select(col("user_id"), col("event_id"),
            expr("ts DIV 1000").as("ts_us"), col("value"))
          .withColumn("__rn", row_number().over(byKey))
          .where(col("__rn") === 1).drop("__rn")
        val merged = graft.operators.Merge
          .upsert(batch.sparkSession.read.parquet(target), latest, Seq("user_id"))
          .localCheckpoint(true) // sever lineage before overwriting the input
        merged.write.mode("overwrite").parquet(target)
      }
      val q = Tables.normalizeEventsTs(s.readStream.schema(schema)
          .option("maxFilesPerTrigger", Int.MaxValue.toString).parquet(srcDir))
        .writeStream.option("checkpointLocation", chk)
        .foreachBatch(applyBatch)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      if (!q.awaitTermination(StreamScaffold.AwaitTimeoutMs))
        { q.stop(); sys.error("q87 stream did not terminate in time") }
      s.read.parquet(target).orderBy($"user_id")
    }),

    // URL/domain extraction and per-domain reference counts — the link
    // analysis pass of a web-corpus pipeline; URLs injected
    // deterministically (q79 PII pattern) so the extractor provably fires
    "q88_url_extract" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents").select($"doc_id",
        concat($"text", lit(" see https://site"), ($"doc_id" % 7).cast("string"),
          lit(".example.org/p/"), $"doc_id".cast("string"),
          lit(" and http://mirror"), ($"doc_id" % 3).cast("string"),
          lit(".example.net")).as("text"))
      docs.select($"doc_id",
          explode(regexp_extract_all($"text",
            lit("https?://[A-Za-z0-9.-]+"), lit(0))).as("url"))
        .withColumn("domain", regexp_replace($"url", "^https?://", ""))
        .groupBy($"domain")
        .agg(count(lit(1)).as("n_refs"),
          countDistinct($"doc_id").as("n_docs"))
        .orderBy($"domain")
    }),

    // equi-depth (ntile) histogram per group — the auditable-exact
    // replacement for an approx-quantile sketch: deterministic given the
    // (value, event_id) total order, identical ntile semantics cross-engine
    "q89_equidepth_hist" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"event_type").orderBy($"value", $"event_id")
      t(s, dir, "events").select($"event_type", $"value", $"event_id")
        .withColumn("bucket", ntile(10).over(w).cast("long"))
        .groupBy($"event_type", $"bucket")
        .agg(count(lit(1)).as("n"), min($"value").as("lo"), max($"value").as("hi"))
        .orderBy($"event_type", $"bucket")
    }),

    // RANGE-frame window: trailing 1-hour per-user sums over the event-time
    // axis (peers at equal timestamps share the frame — time semantics, not
    // row counting); decimal accumulation keeps floats replayable
    "q90_range_frame" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val ev = t(s, dir, "events").select($"user_id", $"event_id",
        expr("ts DIV 1000").as("ts_us"), $"value")
      val w = Window.partitionBy($"user_id").orderBy($"ts_us")
        .rangeBetween(-3600L * 1000000L, 0L)
      ev.withColumn("trail_1h_sum",
          sum($"value".cast("decimal(18,6)")).over(w).cast("double"))
        .withColumn("trail_1h_n", count(lit(1)).over(w))
        .orderBy($"user_id", $"ts_us", $"event_id")
    }),

    // column-level data profiling: one Expand pass → long-format stats
    "q81_profile" -> ((s, dir) => {
      graft.operators.Profile.profile(t(s, dir, "events"),
        Seq("user_id", "event_type", "value", "props"))
        .orderBy("col_name")
    }),

    // built-in session windows (the session_window twin of q48's manual
    // islands): merge at gap <= 30 min, end = last event + gap —
    // SessionWindowSpec pins the boundary contract the oracle replays
    "q82_session_window" -> ((s, dir) => {
      import s.implicits._
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val ev = t(s, dir, "events").select($"user_id",
        expr("timestamp_micros(ts DIV 1000)").as("ts"))
      ev.groupBy($"user_id", session_window($"ts", "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select($"user_id", unix_micros($"w.start").as("session_start_us"),
          unix_micros($"w.end").as("session_end_us"), $"n_events")
        .orderBy($"user_id", $"session_start_us")
    }),

    // exact per-group percentiles (p50/p95 with linear interpolation)
    "q83_group_percentiles" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events").groupBy($"event_type")
        .agg(round(expr("percentile(value, 0.5)"), 6).as("p50"),
          round(expr("percentile(value, 0.95)"), 6).as("p95"),
          count(lit(1)).as("n"))
        .orderBy($"event_type")
    }),

    // bucketed snapshot reconciliation: lineitem vs a deterministically
    // drifted replica — only the buckets holding drifted rows surface
    "q84_table_diff" -> ((s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem")
      val drifted = li.withColumn("l_quantity",
        when($"l_orderkey" % 9973 === 0, $"l_quantity" + 1.0).otherwise($"l_quantity"))
      def repr(d: org.apache.spark.sql.DataFrame) = concat_ws("|",
        d("l_orderkey").cast("string"), d("l_linenumber").cast("string"),
        round(d("l_quantity") * 100).cast("long").cast("string"))
      graft.operators.TableDiff.diff(li, drifted, repr(li), repr(drifted), nBuckets = 64)
        .orderBy($"bucket")
    }),

    // CUBE over (lang, source) — all four grouping sets in one pass.
    // Grouping markers participate in the sort so subtotal rows stay
    // distinguishable from genuine-NULL key rows if the fixture ever
    // gains NULL lang/source values.
    "q85_cube" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents").cube($"lang", $"source")
        .agg(grouping($"lang").as("g_lang"), grouping($"source").as("g_source"),
          count(lit(1)).as("n_docs"), sum($"n_chars").as("sum_chars"))
        .orderBy($"g_lang", $"g_source", $"lang".asc_nulls_first, $"source".asc_nulls_first)
    }),

    // PIVOT — long→wide reshape (q85's cube sibling; the last uncovered
    // relational surface): per-language doc counts pivoted across an
    // EXPLICIT source-value list. The explicit list matters at scale: it
    // skips the extra distinct-values collection job an unlisted pivot
    // runs, and pins the output schema so a new source value cannot
    // silently widen the frame. Plans as one regular two-level aggregate —
    // pivot_first partials combine map-side like any agg.
    "q192_pivot" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .groupBy($"lang")
        .pivot("source", Seq("src0", "src1", "src2", "src3"))
        .agg(count(lit(1)))
        .select($"lang", coalesce($"src0", lit(0L)).as("src0"),
          coalesce($"src1", lit(0L)).as("src1"),
          coalesce($"src2", lit(0L)).as("src2"),
          coalesce($"src3", lit(0L)).as("src3"))
        .orderBy($"lang")
    }),

    // term → capped posting-list index: df + first-k postings from ONE
    // window exchange; per-term agg state bounded at the cap
    "q77_inverted_index" -> ((s, dir) => {
      graft.text.InvertedIndex.build(t(s, dir, "documents"), postingCap = 20)
        .orderBy("term")
    }),

    // per-entity rolling features (lag / moving avg / running sum) — the
    // feature-engineering window pass; decimal accumulation keeps the
    // float results plan-order independent
    "q78_rolling_features" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      // events.ts is ns-precision parquet; the long view orders identically
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val ord = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val m3 = ord.rowsBetween(-2, 0)
      val cum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events").select($"user_id", $"event_id", $"ts", $"value")
        .select($"user_id", $"event_id",
          row_number().over(ord).cast("long").as("seq"),
          lag($"value", 1).over(ord).as("prev_value"),
          round(sum($"value".cast("decimal(18,6)")).over(m3).cast("double") /
            count(lit(1)).over(m3), 6).as("mavg3"),
          sum($"value".cast("decimal(18,6)")).over(cum).cast("double").as("cumsum"))
        .orderBy($"user_id", $"seq")
    }),

    // PII scrub before training: email + long-digit-run redaction with
    // deterministic injected PII (the synthetic corpus has none of its own,
    // so the pass provably fires on every row)
    "q79_pii_redact" -> ((s, dir) => {
      import s.implicits._
      val withPii = t(s, dir, "documents").select($"doc_id",
        concat($"text", lit(" contact user"), $"doc_id".cast("string"),
          lit("@example.com ref "),
          lpad(($"doc_id" * 37 % 10000000).cast("string"), 8, "9")).as("text"))
      withPii.select($"doc_id",
          TextFunctions.redactPii($"text").as("clean"),
          TextFunctions.countEmails($"text").cast("long").as("n_emails"))
        .orderBy($"doc_id")
    }),

    // Bloom-pruned fact-dim join: the filter (not the data) broadcasts,
    // fact rows that cannot match are dropped before the shuffle, and the
    // exact join removes the Bloom false positives — ≡ the plain join
    "q80_bloom_prune_join" -> ((s, dir) => {
      import s.implicits._
      val dim = t(s, dir, "part").where($"p_size" === 1)
        .select($"p_partkey", $"p_brand")
      val fact = t(s, dir, "lineitem")
        .select($"l_partkey", $"l_quantity")
      graft.operators.BloomPrune.prunedJoin(fact, dim, "l_partkey", "p_partkey")
        .groupBy($"p_brand")
        .agg(count(lit(1)).as("n_lines"),
          sum($"l_quantity".cast("decimal(18,2)")).cast("double").as("sum_qty"))
        .orderBy($"p_brand")
    }),

    // KMV (bottom-k) distinct-count sketch: auditable approximate
    // count-distinct per group — bounded two-level agg, mergeable state,
    // DuckDB replays the estimate bit-for-bit (md5-derived hashes). Exact
    // distinct joined alongside so the estimate quality is visible.
    "q76_kmv_distinct" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
      val st = graft.sketch.Kmv.sketchState(ev, "event_type", "user_id", k = 64)
      val exact = ev.where($"user_id".isNotNull)
        .groupBy($"event_type").agg(countDistinct($"user_id").as("exact_distinct"))
      st.withColumn("est_distinct", graft.sketch.Kmv.estimate($"n_kept", $"kth_hash", 64))
        .join(exact, Seq("event_type"))
        .orderBy($"event_type")
    }),

    // per-label embedding centroids (exact decimal sums — plan-order
    // independent, so replayable cross-engine)
    "q58_embed_centroid" -> ((s, dir) => {
      Similarity.centroids(t(s, dir, "embeddings")).orderBy("label", "dim")
    }),

    // repetition quality signal: top-bigram share per doc (Gopher-style
    // repetitive-text filter)
    "q59_repetition" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      // per-doc bigram multiplicities = the shared docBigramCounts frame
      // (a (w1, w2) group is exactly a bigram group)
      val per = docBigramCounts(s, dir)
        .select($"doc_id", $"k".as("c"))
      val agg = per.groupBy($"doc_id")
        .agg(max($"c").as("top_cnt"), sum($"c").as("n_bigrams"))
      docs.select($"doc_id").join(agg, Seq("doc_id"), "left_outer")
        .select($"doc_id", coalesce($"top_cnt", lit(0L)).as("top_cnt"),
          coalesce($"n_bigrams", lit(0L)).as("n_bigrams"),
          round(coalesce($"top_cnt".cast("double") / $"n_bigrams".cast("double"), lit(0.0)), 6)
            .as("rep_ratio"))
        .orderBy($"doc_id")
    }),

    // SimHash near-dup PAIRS at production width: 60-bit shingle simhash,
    // 4×15-bit pigeonhole bands (exact for hamming ≤ 3), bit_count verify
    // on candidates only — completes the SimHash dedup path beyond q37's
    // signature computation
    "q68_simhash_neardups" -> ((s, dir) => {
      // signatures off the shared shingle-hash frame — md5Bucket60 of a
      // shingle is exactly the first 15 hex chars of its cached md5
      Dedup.simhashNearDupsFromSigs(
          Dedup.simhashSigs60FromHashes(shingleMd5(s, dir)), maxHamming = 3)
        .orderBy("id_a", "id_b")
    }),

    // 16-bit SimHash signatures
    "q37_dedup_simhash" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents").select($"doc_id",
        Dedup.simhash16($"text").as("simhash"))
        .orderBy($"doc_id")
    }),

    // embedding-cosine near-dup within label blocks — the EXACT variant,
    // guarded against all-pairs blowup (blocks past the cap must go through
    // Similarity.cosineNearDups, the LSH scale path)
    "q38_dedup_embedding" -> ((s, dir) => {
      import s.implicits._
      Similarity.exactCosinePairs(t(s, dir, "embeddings"), "label", minCosX1e4 = 3000L)
        .orderBy($"label", $"id_a", $"id_b")
    }),

    // brute-force cosine top-k (exact ANN baseline)
    "q39_knn_brute" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(e.filter($"vec_id" < 5), e, k = 5)
        .withColumn("rank", $"rank".cast("long"))
        .orderBy($"query_id", $"rank")
    }),

    // LSH-bucketed ANN (scale path; recall measured vs brute in tests).
    // Oracle-exact via the q25 pattern: the Spark-computed candidate set is
    // persisted to parquet inside the query and DuckDB re-ranks the SAME
    // candidates (exact cosine + deterministic tie-break are pure SQL).
    "q40_knn_lsh" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val q = e.filter($"vec_id" < 5)
      Similarity.lshCandidates(q, e, dims = 64)
        .write.mode("overwrite").parquet(scratch(q40CandPat, dir))
      Similarity.rankCandidates(s.read.parquet(scratch(q40CandPat, dir)), q, e, k = 5)
        .withColumn("rank", $"rank".cast("long"))
        .orderBy($"query_id", $"rank")
    }),

    // multimodal plumbing: pack → partition-local decode → typed metadata.
    // The decoder is PINNED to the stub: payloads here are document text,
    // and the oracle replays the stub's byte-length arithmetic — a text
    // that happens to start with an ASCII image magic ("GIF89a…") must not
    // be claimed by the codec sniff (q67 covers the real-codec path).
    "q41_multimodal_meta" -> ((s, dir) => {
      import s.implicits._
      Multimodal.decode(Multimodal.pack(t(s, dir, "documents")), Multimodal.decodeStub)
        .select($"media_id", $"meta.format".as("format"),
          $"meta.width".as("width"), $"meta.height".as("height"),
          $"meta.nBytes".as("n_bytes"), $"meta.frames".as("frames"))
        .orderBy($"media_id")
    }),

    // multimodal REAL-codec decode: deterministic real PNG fixtures are
    // encoded partition-locally by the JDK writer, then decoded back
    // through the javax.imageio header-parse path (pixels never decoded).
    // The oracle replays the dimension arithmetic, so a broken encoder OR
    // a broken header reader breaks the hash — this is the codec-backed
    // twin of q41's stub-plumbing check.
    "q67_multimodal_decode" -> ((s, dir) => {
      import s.implicits._
      // fixture ENCODE is a deterministic function of the doc_id set —
      // staged once per source signature (also pre-staged by the bench
      // warmup) so the timed query measures the decode path (the
      // semantics under test), not repeat fixture generation (r5 bench:
      // encode+decode doubled the query)
      val media = s.read.parquet(stageQ67Png(s, dir))
      Multimodal.decode(media)
        .select($"media_id", $"meta.format".as("format"),
          $"meta.width".as("width"), $"meta.height".as("height"),
          $"meta.frames".as("frames"))
        .orderBy($"media_id")
    }),

    // multimodal frame-sampling plumbing: decode → one row per sampled
    // frame (the explode shape a video frame extractor produces), stride 2.
    // Stub chunk arithmetic is deterministic, so the oracle replays it:
    // frames = 1 + n%7, chunk = max(n/frames, 1), frame f covers
    // [f·chunk, min(f·chunk + chunk, n)).
    "q69_multimodal_frames" -> ((s, dir) => {
      import s.implicits._
      val decoded = Multimodal.decode(
        Multimodal.pack(t(s, dir, "documents")), Multimodal.decodeStub)
      Multimodal.sampleFrames(decoded, stride = 2)
        .select($"media_id", $"frame_idx".cast("long").as("frame_idx"),
          length($"frame_bytes").cast("long").as("frame_len"))
        .orderBy($"media_id", $"frame_idx")
    }),

    // IVF ANN (k-means inverted lists; recall measured vs brute in tests).
    // Oracle-exact like q40: candidates (the non-SQL KMeans leg) persist to
    // parquet, DuckDB replays the exact-cosine ranking over them.
    "q43_knn_ivf" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val q = e.filter($"vec_id" < 5)
      Similarity.ivfCandidates(q, e, nlist = 8, nprobe = 3)
        .write.mode("overwrite").parquet(scratch(q43CandPat, dir))
      Similarity.rankCandidates(s.read.parquet(scratch(q43CandPat, dir)), q, e, k = 5)
        .withColumn("rank", $"rank".cast("long"))
        .orderBy($"query_id", $"rank")
    }),

    // set operations: union / intersect / except (SURVEY §2.6)
    "q44_set_ops" -> ((s, dir) => {
      import s.implicits._
      val big = t(s, dir, "orders").filter($"o_totalprice" > 200000.0).select($"o_custkey")
      val urgent = t(s, dir, "orders").filter($"o_orderpriority" === "1-URGENT").select($"o_custkey")
      val f = t(s, dir, "orders").filter($"o_orderstatus" === "F").select($"o_custkey")
      big.intersect(urgent).except(f).union(big.limit(0))
        .orderBy($"o_custkey")
    }),

    // skew-salted equi-join made driver-visible: saltedJoin must equal the
    // plain join row-for-row (the oracle IS the plain join), so the salting
    // shuffle-spread is pure mechanics. factor=8 spreads each suppkey over
    // 8 reducers; quantities are integral doubles, so sums replay exactly.
    "q71_salted_join" -> ((s, dir) => {
      import s.implicits._
      val fact = t(s, dir, "lineitem")
        .select($"l_suppkey".as("suppkey"), $"l_quantity")
      val dim = t(s, dir, "supplier")
        .select($"s_suppkey".as("suppkey"), $"s_nationkey")
      graft.operators.SkewTools.saltedJoin(fact, dim, Seq("suppkey"), factor = 8)
        .groupBy($"s_nationkey")
        .agg(count(lit(1)).as("n_items"), sum($"l_quantity").as("sum_qty"))
        .orderBy($"s_nationkey")
    }),

    // MERGE / upsert semantics (Delta-MERGE stand-in): BUILDING customers
    // updated in place, 25 nation-derived rows inserted at fresh keys,
    // everyone else passes through — one anti-join + union, then verified
    // row-for-row against the SQL MERGE expansion
    "q75_merge_upsert" -> ((s, dir) => {
      import s.implicits._
      val target = t(s, dir, "customer")
        .select($"c_custkey", $"c_name", $"c_mktsegment")
      val upd = target.where($"c_mktsegment" === "BUILDING")
        .select($"c_custkey", concat($"c_name", lit("*")).as("c_name"), $"c_mktsegment")
      val ins = t(s, dir, "nation").select(
        ($"n_nationkey" + 1000000L).as("c_custkey"),
        $"n_name".as("c_name"), lit("NEW").as("c_mktsegment"))
      graft.operators.Merge.upsert(target,
          graft.operators.Merge.requireUniqueKeys(upd.unionByName(ins), Seq("c_custkey")),
          Seq("c_custkey"))
        .orderBy($"c_custkey")
    }),

    // window functions: per-group ranking (keep-first shape used by dedup)
    "q45_window_rank" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      t(s, dir, "orders")
        .withColumn("rnk", row_number().over(w).cast("long"))
        .where($"rnk" <= 2)
        .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rnk")
        .orderBy($"o_custkey", $"rnk", $"o_orderkey")
    }),

    // end-to-end corpus cleaning — the composed training-data pipeline:
    // quality gate + exact-dedup keep-first + language filter + length gate
    "q47_corpus_clean" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.fanOut(t(s, dir, "documents"))
      val scored = docs.select($"doc_id", $"lang", $"n_chars",
        TextFunctions.tokenCount($"text").cast("long").as("n_tokens"),
        TextFunctions.qualityScore($"text").as("quality"),
        TextFunctions.fingerprintMd5($"text").as("fp"))
      val keepers = scored.groupBy($"fp").agg(min($"doc_id").as("keep_id"))
      scored.join(keepers, Seq("fp"))
        .where($"doc_id" === $"keep_id" &&       // exact-dedup keep-first
          $"quality" >= 0.3 &&                    // quality gate
          $"lang".isin("en", "de", "fr", "es") && // latin-script languages
          $"n_tokens".between(20, 10000))         // length gate
        .select($"doc_id", $"lang", $"n_tokens", $"quality")
        .orderBy($"doc_id")
    }),

    // the FULL corpus-preparation chain, composed end-to-end (the LLM
    // analog of q25's fraud pipeline): q47's clean/dedup/quality gates →
    // mixture selection to per-source token budgets (MixtureSampling's
    // bucketed windows) → token-budget shard packing (Sharding's two-level
    // prefix sums) → per-shard summary. Every stage is the library
    // operator, not a re-spelling — the query pins that the operators
    // COMPOSE (schemas line up, determinism survives chaining). The
    // oracle replays all three stages declaratively; a drift in any one
    // (dedup keep-rule, budget split, pack boundary) breaks the hash.
    "q200_corpus_pipeline" -> ((s, dir) => {
      import s.implicits._
      // the tokenize+quality+md5 pass feeds two consumers (the keep-first
      // aggregate and the join back) — materialize the compact frame once
      // (the q16/q131 rule; 6 narrow columns, never the text)
      val scored = t(s, dir, "documents").select($"source", $"doc_id", $"lang",
        TextFunctions.tokenCount($"text").cast("long").as("n_tokens"),
        TextFunctions.qualityScore($"text").as("quality"),
        TextFunctions.fingerprintMd5($"text").as("fp"))
        .localCheckpoint(true)
      val keepers = scored.groupBy($"fp").agg(min($"doc_id").as("keep_id"))
      val cleaned = scored.join(keepers, Seq("fp"))
        .where($"doc_id" === $"keep_id" && $"quality" >= 0.3 &&
          $"lang".isin("en", "de", "fr", "es") && $"n_tokens".between(20, 10000))
        .select($"source", $"doc_id", $"n_tokens")
      val w = cleaned.select($"source").distinct()
        .withColumn("wt", (substring($"source", 4, 10).cast("int") % 4 + 1).cast("long"))
      val selected = graft.operators.MixtureSampling
        .byWeights(cleaned, w, totalBudget = 60000L)
        .select($"source", $"doc_id", $"n_tokens")
      graft.operators.Sharding.byTokenBudget(selected, budget = 5000L)
        .groupBy($"shard")
        .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("shard_tokens"),
          sum($"doc_id").as("id_checksum"),
          countDistinct($"source").as("n_sources"))
        .orderBy($"shard")
    }),

    // event sessionization: 30-minute-gap sessions per user (window lag +
    // running sum), then per-session aggregates
    "q48_sessionize" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val ev = t(s, dir, "events").select($"user_id", $"event_id", $"value",
        expr("timestamp_micros(ts DIV 1000)").as("ts"))
      val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      // microsecond integers on both engines (unix_timestamp would truncate
      // to seconds while DuckDB's epoch keeps fractions)
      val gapped = ev.withColumn("new_session",
        when(unix_micros($"ts") - unix_micros(lag($"ts", 1).over(byUser)) > 1800L * 1000000L, 1)
          .otherwise(0))
      val sessions = gapped.withColumn("session_idx",
        sum($"new_session").over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      sessions.groupBy($"user_id", $"session_idx")
        .agg(count(lit(1)).as("n_events"),
          sum($"value".cast("decimal(18,6)")).cast("double").as("session_value"))
        .orderBy($"user_id", $"session_idx")
    }),

    // JSONL source/sink round-trip with explicit schema (the training-data
    // interchange format; no schema inference nondeterminism)
    "q46_jsonl_roundtrip" -> ((s, dir) => {
      import s.implicits._
      // fixed sf-tagged path + overwrite: repeated runs reuse one directory
      // instead of leaking a fresh createTempDirectory each invocation, and
      // concurrent runs over different sf dirs never clobber each other
      // (testdata dir is read-only, so scratch lives under java.io.tmpdir)
      val tmp = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft_q46_jsonl_${Tables.sfTag(dir)}").toString
      t(s, dir, "documents").select($"doc_id", $"lang", $"n_chars")
        .write.mode("overwrite").json(tmp)
      s.read.schema("doc_id LONG, lang STRING, n_chars LONG").json(tmp)
        .orderBy($"doc_id")
    }),

    // as-of join: for every event, the user's latest purchase value at or
    // before it — tagged-union + per-key window (no non-equi join / BNLJ);
    // DuckDB replays it with its native ASOF JOIN
    "q27_asof_join" -> ((s, dir) => {
      import s.implicits._
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val ev = t(s, dir, "events")
      val base = ev.select($"user_id", $"event_id",
        expr("timestamp_micros(ts DIV 1000)").as("ts"))
      // dedup to one purchase per (user, µs): both engines truncate to
      // microseconds here, and a µs tie between two purchases would
      // otherwise resolve nondeterministically on each side
      val purchases = ev.filter($"event_type" === "purchase")
        .groupBy($"user_id", expr("timestamp_micros(ts DIV 1000)").as("pts"))
        .agg(max($"value").as("last_purchase"))
      graft.operators.AsOfJoin.leftAsOf(base, purchases,
          keyCols = Seq("user_id"), leftTsCol = "ts", rightTsCol = "pts")
        .select($"user_id", $"event_id", $"last_purchase")
        .orderBy($"user_id", $"event_id")
    }),

    // range join: events falling in the hour after each purchase —
    // interval bucketization + equi-join (never a cartesian); the oracle is
    // the plain BETWEEN join
    "q28_range_join" -> ((s, dir) => {
      import s.implicits._
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val hourUs = 3600L * 1000000L
      val ev = t(s, dir, "events")
      val pts = ev.select($"user_id", $"event_id", expr("ts DIV 1000").as("us"))
      val ivals = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"event_id".as("p_id"), expr("ts DIV 1000").as("start_us"))
        .withColumn("end_us", $"start_us" + hourUs)
      graft.operators.RangeJoin.pointInInterval(pts, ivals,
          keyCols = Seq("user_id"), pointCol = "us",
          startCol = "start_us", endCol = "end_us", bucketWidth = hourUs)
        .groupBy($"p_id").agg(count(lit(1)).as("n_in_window"))
        .orderBy($"p_id")
    }),

    // rollup (grouping sets): subtotal rows per status, priority, and grand
    // total — SURVEY §2.4 notes the reference has none; the engine surface
    // still carries it
    "q29_rollup" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .rollup($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("cnt"), max($"o_totalprice").as("max_price"))
        .orderBy($"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
    }),

    // token-budgeted shard packing — the pretraining write-side operator:
    // greedy sequential packing into ~5000-token shards, computed with
    // bucketed parallel windows (never a global single-partition sort)
    "q51_token_shards" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents").select($"doc_id",
        TextFunctions.tokenCount($"text").cast("long").as("n_tokens"))
      graft.operators.Sharding.byTokenBudget(docs, budget = 5000L)
        .select($"doc_id", $"n_tokens", $"shard")
        .orderBy($"doc_id")
    }),

    // deterministic stratified sampling: first 20 docs per source by a
    // content-independent hash rank — reproducible downsampling per stratum
    // (a seeded sampleBy can't be replayed cross-engine; the hash rank can)
    "q54_stratified_sample" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"source").orderBy(md5(concat(lit("s|"),
        $"doc_id".cast("string")).cast("binary")).asc, $"doc_id".asc)
      t(s, dir, "documents")
        .withColumn("rnk", row_number().over(w).cast("long"))
        .where($"rnk" <= 20)
        .select($"source", $"doc_id", $"rnk")
        .orderBy($"source", $"rnk")
    }),

    // deterministic train/validation/test split: stable hash of the doc id
    // buckets 80/10/10 — membership reproducible across runs and engines
    "q55_hash_split" -> ((s, dir) => {
      import s.implicits._
      val bucket = TextFunctions.md5Bucket16($"doc_id".cast("string"), "split|") % 100
      t(s, dir, "documents")
        .withColumn("split", when(bucket < 80, "train")
          .when(bucket < 90, "validation").otherwise("test"))
        .groupBy($"split").agg(count(lit(1)).as("n"), min($"doc_id").as("min_id"))
        .orderBy($"split")
    }),

    // vocabulary building: corpus-wide token frequencies, top 100 — the
    // tokenizer/BPE prep step (deterministic tie-break on the token)
    "q52_vocab" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select(explode(TextFunctions.tokens(lower($"text"))).as("token"))
        .groupBy($"token").agg(count(lit(1)).as("cnt"))
        .orderBy($"cnt".desc, $"token".asc)
        .limit(100)
    }),

    // context-window packing: documents packed into their token-budget
    // shard (q51's assignment), concatenated in doc order — the step that
    // turns a cleaned corpus into fixed-budget training sequences. The
    // packed text is fingerprinted so the compare stays scalar.
    "q53_pack_shards" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents").select($"doc_id", $"text",
        TextFunctions.tokenCount($"text").cast("long").as("n_tokens"))
      graft.operators.Sharding.byTokenBudget(docs, budget = 5000L)
        .groupBy($"shard")
        .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("shard_tokens"),
          md5(array_join(transform(
            array_sort(collect_list(struct($"doc_id", $"text"))), x => x("text")),
            "\n\n").cast("binary")).as("packed_md5"))
        .orderBy($"shard")
    }),

    // §2.10 driver-visible Structured Streaming: a REAL readStream over the
    // events parquet → event-time watermark + tumbling 1h window aggregate →
    // foreachBatch parquet sink (the reference's "real-time serving"
    // architecture, 02_geofraud_fraud.py:109-116, as an actual stream).
    // Oracle = the equivalent batch SQL; complete mode makes them equal.
    "q49_stream_window" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.streaming.Trigger
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      val tmp = System.getProperty("java.io.tmpdir")
      val tag = Tables.sfTag(dir) // per-sf scratch: runs never clobber each other
      val out = new java.io.File(tmp, s"graft_q49_out_$tag").toString
      val chk = new java.io.File(tmp, s"graft_q49_chk_$tag").toString
      val srcDir = new java.io.File(tmp, s"graft_q49_src_$tag").toString
      val hconf = s.sparkContext.hadoopConfiguration
      val fs = new org.apache.hadoop.fs.Path(tmp).getFileSystem(hconf)
      // fresh checkpoint each run (the source changes across sf dirs) and a
      // staged source DIRECTORY — the file stream source models files
      // arriving in a directory and rejects a bare file path
      fs.delete(new org.apache.hadoop.fs.Path(chk), true)
      fs.delete(new org.apache.hadoop.fs.Path(srcDir), true)
      fs.mkdirs(new org.apache.hadoop.fs.Path(srcDir))
      org.apache.hadoop.fs.FileUtil.copy(
        fs, new org.apache.hadoop.fs.Path(s"$dir/events.parquet"),
        fs, new org.apache.hadoop.fs.Path(s"$srcDir/events.parquet"),
        false, hconf)
      val agg = Tables.normalizeEventsTs(s.readStream.schema(schema).parquet(srcDir))
        .select($"user_id", expr("timestamp_micros(ts DIV 1000)").as("ts"))
        .withWatermark("ts", "1 hour")
        .groupBy($"user_id", window($"ts", "1 hour").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select($"user_id", unix_micros($"w.start").as("hour_us"), $"n_events")
      val writeBatch: (DataFrame, Long) => Unit =
        (b, _) => b.write.mode("overwrite").parquet(out)
      val q = agg.writeStream.outputMode("complete")
        .option("checkpointLocation", chk)
        .foreachBatch(writeBatch)
        .trigger(Trigger.AvailableNow())
        .start()
      if (!q.awaitTermination(StreamScaffold.AwaitTimeoutMs))
        { q.stop(); sys.error("q49 stream did not terminate in time") }
      s.read.parquet(out).orderBy($"user_id", $"hour_us")
    }),

    // §2.10 custom streaming STATE, driver-visible: a real readStream
    // through TileStore.sliding — flatMapGroupsWithState with per-user
    // tile→lastSeen state and EventTimeTimeout — emitting one snapshot per
    // user. The TTL exceeds the data's span so the single AvailableNow
    // batch (watermark 0 during batch 1) is deterministic and equals the
    // per-user distinct tile set; the TTL-pruning/timeout law itself is
    // StreamingSpec territory (multi-batch watermark timing isn't
    // replayable in SQL).
    "q61_stream_state" -> ((s, dir) => {
      import s.implicits._
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      // raw staged events (one file copy, shared with q63/q64); the tile
      // projection runs on the STREAM — at scale that's the shape anyway
      // (project before the stateful exchange, not a pre-staged copy)
      val src = StreamScaffold.stageTable(s, dir, "events")
      StreamScaffold.runStagedStream(s, "q61", dir, src) { mk =>
        val tiles = mk().select(
          $"user_id".cast("string").as("user"),
          concat(lit("T"), ($"event_id" % 50).cast("string")).as("h3"),
          expr("timestamp_micros(ts DIV 1000)").as("createdAt"))
        TileStore.sliding(tiles.as[TileStore.TileEvent], ttlSeconds = 3650L * 86400L)
          .select($"user", array_join($"tiles", ",").as("tiles"))
      }.orderBy($"user")
    }),

    // §2.10 streaming DEDUP: dropDuplicatesWithinWatermark on a real file
    // stream — the in-flight dedup a training-data ingest runs before
    // anything else touches the events. Output is projected to the dedup
    // KEY columns, so which physical row survives is irrelevant and the
    // single AvailableNow batch equals batch DISTINCT exactly (state-expiry
    // re-emission needs multi-batch watermark movement — spec territory).
    "q63_stream_dedup" -> ((s, dir) => {
      import s.implicits._
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val src = StreamScaffold.stageTable(s, dir, "events")
      StreamScaffold.runStagedStream(s, "q63", dir, src) { mk =>
        mk().select($"user_id", ($"event_id" % 97).as("bucket"),
            expr("timestamp_micros(ts DIV 1000)").as("ts"))
          .withWatermark("ts", "10 seconds")
          .dropDuplicatesWithinWatermark("user_id", "bucket")
          .select($"user_id", $"bucket")
      }.orderBy($"user_id", $"bucket")
    }),

    // §2.10 STREAM-STREAM interval join: events joined to the purchase
    // stream on user within [purchase, purchase + 1h] — both sides real
    // file streams with watermarks (the flagship Structured Streaming
    // capability q28 covers in batch). Inner joins emit eagerly on match,
    // so the result set is content-defined and equals the batch BETWEEN
    // join regardless of batching.
    // CHAINED stateful operators in ONE streaming query (the Spark 3.4+
    // multi-stateful-operator capability): the q64 stream-stream interval
    // join feeds a windowed aggregation downstream — two state stores,
    // one watermark chain, append output flushed by no-data batches. The
    // batch twin replays join + epoch-hour floor.
    "q226_stream_multi_stateful" -> ((s, dir) => {
      import s.implicits._
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val src = StreamScaffold.stageTable(s, dir, "events")
      StreamScaffold.runStagedStream(s, "q226", dir, src, noDataBatches = true) { mk =>
        val ev = mk().select($"user_id", $"event_id", $"event_type",
            expr("timestamp_micros(ts DIV 1000)").as("ts"))
          .withWatermark("ts", "10 seconds")
        val pur = mk().where($"event_type" === "purchase")
          .select($"user_id".as("p_user"), $"event_id".as("p_id"),
            expr("timestamp_micros(ts DIV 1000)").as("pts"))
          .withWatermark("pts", "10 seconds")
        ev.join(pur, expr(
            "user_id = p_user AND ts >= pts AND ts <= pts + interval 1 hour"))
          .groupBy(window($"pts", "1 hour"), $"event_type")
          .agg(count(lit(1)).as("n"))
          .select(unix_micros(col("window.start")).as("ws_us"), $"event_type", $"n")
      }.orderBy($"ws_us", $"event_type")
    }),

    // the SAME append-window semantics on the RocksDB state store — the
    // state backend that actually scales (the default HDFS-backed provider
    // keeps every key in executor heap; RocksDB spills to local SSD with
    // changelog/snapshot uploads, the 100 TB posture). Results must be
    // byte-identical to the default provider's; StreamingRocksDbSpec pins
    // that RocksDB artifacts (not .delta files) landed in the checkpoint.
    "q227_stream_rocksdb" -> ((s, dir) => {
      import s.implicits._
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val src = StreamScaffold.stageTable(s, dir, "events")
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prev = s.conf.getOption(key)
      s.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        StreamScaffold.runStagedStream(s, "q227", dir, src, noDataBatches = true) { mk =>
          mk().select($"event_type", $"value",
              expr("timestamp_micros(ts DIV 1000)").as("ts"))
            .withWatermark("ts", "10 seconds")
            .groupBy(window($"ts", "1 hour"), $"event_type")
            .agg(count(lit(1)).as("n"),
              sum(expr("CAST(round(value * 1000000) AS BIGINT)")).as("value_micro"))
            .select(unix_micros(col("window.start")).as("ws_us"),
              $"event_type", $"n", $"value_micro")
        }.orderBy($"ws_us", $"event_type")
      } finally {
        prev match {
          case Some(v) => s.conf.set(key, v)
          case None => s.conf.unset(key)
        }
      }
    }),

    "q64_stream_join" -> ((s, dir) => {
      import s.implicits._
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val src = StreamScaffold.stageTable(s, dir, "events")
      StreamScaffold.runStagedStream(s, "q64", dir, src) { mk =>
        val ev = mk().select($"user_id", $"event_id",
            expr("timestamp_micros(ts DIV 1000)").as("ts"))
          .withWatermark("ts", "10 seconds")
        val pur = mk().where($"event_type" === "purchase")
          .select($"user_id".as("p_user"), $"event_id".as("p_id"),
            expr("timestamp_micros(ts DIV 1000)").as("pts"))
          .withWatermark("pts", "10 seconds")
        ev.join(pur, expr(
            "user_id = p_user AND ts >= pts AND ts <= pts + interval 1 hour"))
          .select($"p_id", $"event_id")
      }.orderBy($"p_id", $"event_id")
    }),

    // stream-static enrichment join — the canonical serving-side pattern
    // (stream joined to a broadcast dimension; at scale the dim re-broadcasts
    // per micro-batch, no stream-side state at all, so it is watermark-free)
    "q72_stream_static" -> ((s, dir) => {
      import s.implicits._
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val src = StreamScaffold.stageTable(s, dir, "events")
      val dim = t(s, dir, "customer")
        .select($"c_custkey".as("user_id"), $"c_mktsegment")
      StreamScaffold.runStagedStream(s, "q72", dir, src) { mk =>
        mk().where($"event_type" === "purchase")
          .select($"user_id", $"event_id")
          .join(broadcast(dim), Seq("user_id"))
      }.orderBy($"event_id")
    }),

    // sliding TTL validity window (batch twin of the streaming tile store)
    "q42_ttl_window" -> ((s, dir) => {
      import s.implicits._
      // Tables.table normalizes ts to long nanos whatever the parquet
      // encoding; DIV 1000 truncates to micros (events are whole micros,
      // so exact)
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val tiles = t(s, dir, "events").select(
        $"user_id".cast("string").as("user"),
        concat(lit("T"), ($"event_id" % 50).cast("string")).as("h3"),
        expr("timestamp_micros(ts DIV 1000)").as("createdAt"))
      // tiles joined to a scalar string: the driver's pandas compare cannot
      // sort array cells (collect_set is still the operator under test)
      TileStore.currentAsOfMax(tiles, ttlSeconds = 7 * 86400)
        .withColumn("tiles", array_join($"tiles", ","))
        .orderBy($"user")
    })
  )

  private def simhashOracle: String = {
    val bitTerms = (0 until 16).map { b =>
      s"""(CASE WHEN coalesce(list_sum(list_transform(tk, t ->
         |CASE WHEN (${TextFunctions.md5Bucket16Sql("t")} >> $b) & 1 = 1 THEN 1 ELSE -1 END)), 0) >= 0
         |THEN ${1 << b} ELSE 0 END)""".stripMargin.replace("\n", " ")
    }.mkString(" + ")
    s"""WITH toks AS (SELECT doc_id, $toksSql AS tk FROM documents)
       |SELECT doc_id, CAST($bitTerms AS INTEGER) AS simhash FROM toks ORDER BY doc_id""".stripMargin
  }

  /** Mirror of Dedup.simhashSigs60 + simhashNearDups: 60 majority-vote bit
    * terms over the shingle list, zero-shingle docs excluded from pairing,
    * 4×15-bit bands, bit_count verify. */
  private def simhashNearDupsOracle: String = {
    val bitTerms = (0 until 60).map { b =>
      s"""(CASE WHEN coalesce(list_sum(list_transform(u, t ->
         |CASE WHEN (${TextFunctions.md5Bucket60Sql("t")} >> $b) & 1 = 1 THEN 1 ELSE -1 END)), 0) >= 0
         |THEN CAST(${1L << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END)""".stripMargin.replace("\n", " ")
    }.mkString(" + ")
    s"""WITH toks AS (SELECT doc_id, $toksSql AS tk FROM documents),
       |sh AS (SELECT doc_id, $shinglesSql AS u FROM toks),
       |s AS (SELECT doc_id, CAST($bitTerms AS BIGINT) AS simhash FROM sh WHERE len(u) > 0),
       |bands AS (SELECT doc_id, simhash, band_idx, (simhash >> (band_idx*15)) & 32767 AS band_val
       |          FROM s, unnest([0,1,2,3]) AS t(band_idx)),
       |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.simhash AS sa, b.simhash AS sb
       |         FROM bands a JOIN bands b ON a.band_idx = b.band_idx AND a.band_val = b.band_val AND a.doc_id < b.doc_id)
       |SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
       |FROM cand WHERE bit_count(xor(sa, sb)) <= 3 ORDER BY id_a, id_b""".stripMargin
  }

  /** CTE chain ending in `cand` = the MinHash+LSH candidate pairs — the
    * mirror of Dedup.minhashSignatures (base = md5(shingle) once, then
    * h_k = min md5(k|base)) + lshBands. Shared by the q35 oracle and q57's
    * recursive-closure oracle. */
  private def minhashCandCtes: String = {
    val hs = (0 until 8).map(k => s"list_min(list_transform(sh, x -> md5('$k|' || md5(x)))) AS h$k").mkString(", ")
    val bands = (0 until 4).map(b =>
      s"SELECT doc_id, $b AS band_idx, md5(h${2 * b} || h${2 * b + 1}) AS band_val FROM sigs")
      .mkString(" UNION ALL ")
    s"""toks AS (SELECT doc_id, $toksSql AS tk FROM documents),
       |shg AS (SELECT doc_id, $shinglesSql AS sh FROM toks),
       |sigs AS (SELECT doc_id, $hs FROM shg),
       |bands AS ($bands),
       |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bands a JOIN bands b ON a.band_idx = b.band_idx AND a.band_val = b.band_val AND a.doc_id < b.doc_id)""".stripMargin
  }

  private def minhashOracle: String =
    s"WITH $minhashCandCtes\nSELECT id_a, id_b FROM cand ORDER BY id_a, id_b"

  /** DuckDB's native ASOF LEFT JOIN — shared by q27 (composed operator)
    * and q156 (the custom-LogicalPlan native operator). */
  private def asofOracle: String =
    """WITH b AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
      |p AS (SELECT user_id, epoch_us(ts) AS pus, max(value) AS last_purchase
      |      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
      |SELECT b.user_id, b.event_id, p.last_purchase
      |FROM b ASOF LEFT JOIN p ON b.user_id = p.user_id AND b.us >= p.pus
      |ORDER BY b.user_id, b.event_id""".stripMargin

  /** Connected components of the candidate graph as a transitive-closure
    * recursive CTE (min reachable id = the component label — the same
    * definition ConnectedComponents.run converges to), then per-group
    * aggregation over ALL documents (absent docs are singletons). */
  /** CTE chain ending in `comp` = (id, component-min-label) over the
    * MinHash candidate graph — shared by the q57/q151 group oracles and
    * q214's survivorship oracle. */
  private def componentsCtes: String =
    s"""$minhashCandCtes,
       |edges AS (SELECT id_a AS a, id_b AS b FROM cand UNION ALL SELECT id_b, id_a FROM cand),
       |reach(id, r) AS (
       |  SELECT DISTINCT a, a FROM edges
       |  UNION
       |  SELECT e.a, r.r FROM edges e JOIN reach r ON e.b = r.id),
       |comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id)""".stripMargin

  private def dedupGroupsOracle: String =
    s"""WITH RECURSIVE $componentsCtes
       |SELECT coalesce(c.component, d.doc_id) AS group_id, count(*) AS n_docs, min(d.doc_id) AS keep_id
       |FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** ANN replay oracle: re-rank a persisted (query_id, corpus_id) candidate
    * parquet with exact cosine — shared by q40 (LSH) and q43 (IVF). */
  private[queries] def knnReplayOracle(candPat: String, k: Int): String =
    s"""WITH cand AS (SELECT query_id, corpus_id FROM read_parquet('$candPat/*.parquet')),
       |s AS (SELECT cand.query_id, cand.corpus_id,
       |        CAST(round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) * 10000) AS BIGINT) AS cos_x1e4
       |      FROM cand JOIN embeddings q ON q.vec_id = cand.query_id
       |                JOIN embeddings c ON c.vec_id = cand.corpus_id),
       |r AS (SELECT query_id, corpus_id, cos_x1e4,
       |        row_number() OVER (PARTITION BY query_id ORDER BY cos_x1e4 DESC, corpus_id) AS rank FROM s)
       |SELECT query_id, corpus_id, cos_x1e4, rank FROM r WHERE rank <= $k ORDER BY query_id, rank""".stripMargin

  val oracle: Map[String, String] = Map(
    "q40_knn_lsh" -> knnReplayOracle(q40CandPat, 5),
    "q43_knn_ivf" -> knnReplayOracle(q43CandPat, 5),
    "q129_zorder_cluster" ->
      s"""WITH ${Tables.pointsSql},
         |cells AS (SELECT ${Tables.latIdxSql("latitude", 9)} AS i,
         |            ${Tables.lngIdxSql("longitude", 9)} AS j, count(*) AS n
         |          FROM points GROUP BY 1, 2),
         |z AS (SELECT ${Tables.mortonSql("i", "j")} AS z, n FROM cells)
         |SELECT z >> 14 AS bucket, count(*) AS n_cells,
         |  CAST(sum(n) AS BIGINT) AS n_points, min(z) AS z_min, max(z) AS z_max
         |FROM z GROUP BY 1 ORDER BY 1""".stripMargin,
    "q130_weighted_sample" ->
      s"""WITH k AS (SELECT doc_id, n_chars,
         |  CAST(${TextFunctions.md5Bucket60Sql("concat('ws|', CAST(doc_id AS VARCHAR))")} + 1 AS DOUBLE)
         |    / 1152921504606846976.0
         |    / CAST(greatest(n_chars, 1) AS DOUBLE) AS priority FROM documents)
         |SELECT doc_id, n_chars, priority
         |FROM k ORDER BY priority, doc_id LIMIT 20""".stripMargin,
    "q131_oov_rate" ->
      s"""WITH tk AS (SELECT source, doc_id, unnest($toksSql) AS token FROM documents),
         |vc AS (SELECT token, count(*) AS cnt FROM tk GROUP BY 1
         |       ORDER BY cnt DESC, token LIMIT 500),
         |pd AS (SELECT t.source, t.doc_id, count(*) AS n_toks,
         |         CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
         |       FROM tk t LEFT JOIN vc v USING (token) GROUP BY 1, 2)
         |SELECT source, count(*) AS n_docs,
         |  round(CAST(sum(CAST(round(CAST(n_oov AS DOUBLE) / CAST(n_toks AS DOUBLE), 6)
         |    AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS avg_oov_rate
         |FROM pd GROUP BY 1 ORDER BY 1""".stripMargin,
    "q132_lm_score" ->
      s"""WITH c AS (SELECT doc_id, $toksSql AS tk FROM documents),
         |bg0 AS (SELECT doc_id, unnest(list_transform(generate_series(1, greatest(len(tk)-1, 0)),
         |          i -> array_to_string(list_slice(tk, i, i+1), ' '))) AS bg FROM c),
         |w AS (SELECT doc_id, string_split(bg, ' ')[1] AS w1, string_split(bg, ' ')[2] AS w2 FROM bg0),
         |c12 AS (SELECT w1, w2, count(*) AS c12 FROM w GROUP BY 1, 2),
         |c1 AS (SELECT w1, count(*) AS c1 FROM w GROUP BY 1),
         |j AS (SELECT w.doc_id, (1000000 * c12.c12) // c1.c1 AS p_micro
         |      FROM w JOIN c12 USING (w1, w2) JOIN c1 USING (w1))
         |SELECT doc_id, count(*) AS n_bigrams,
         |  CAST(sum(p_micro) AS BIGINT) // count(*) AS lm_score_micro
         |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    "q133_pagerank" -> {
      val iters = (1 to 3).map { k =>
        val prev = if (k == 1) "pr0" else s"pr${k - 1}"
        s"""s$k AS (SELECT adj.b AS a, CAST(sum($prev.pr // deg.d) AS BIGINT) AS s
           |       FROM adj JOIN $prev ON adj.a = $prev.a JOIN deg ON adj.a = deg.a GROUP BY 1),
           |pr$k AS (SELECT deg.a, CAST(150000 + (85 * coalesce(s$k.s, 0)) // 100 AS BIGINT) AS pr
           |        FROM deg LEFT JOIN s$k ON deg.a = s$k.a)""".stripMargin
      }.mkString(",\n")
      s"""WITH po AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
         |raw AS (SELECT x.p AS u, y.p AS v FROM po x JOIN po y USING (o) WHERE x.p < y.p
         |        GROUP BY 1, 2 HAVING count(*) >= 2),
         |adj AS (SELECT u AS a, v AS b FROM raw UNION ALL SELECT v, u FROM raw),
         |deg AS (SELECT a, count(*) AS d FROM adj GROUP BY 1),
         |pr0 AS (SELECT a, CAST(1000000 AS BIGINT) AS pr FROM deg),
         |$iters
         |SELECT a AS node, pr AS pagerank_micro FROM pr3 ORDER BY pr DESC, a LIMIT 20""".stripMargin
    },
    "q30_text_tokens" ->
      s"""SELECT doc_id,
         |  len($toksSql) AS n_tokens,
         |  CAST(coalesce(list_sum(list_transform(list_filter(string_split(text, ' '), t -> t != ''),
         |       t -> greatest(CAST(ceil(length(t) / 4.0) AS BIGINT), 1))), 0) AS BIGINT) AS n_subwords,
         |  length(text) AS n_chars_m
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q31_text_quality" ->
      s"""WITH c AS (SELECT doc_id, text, $toksSql AS tk FROM documents),
         |q AS (SELECT doc_id,
         |  round(CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS DOUBLE) / CAST(greatest(length(text), 1) AS DOUBLE), 6) AS punct_ratio,
         |  round(CAST(coalesce(list_sum(list_transform(list_filter(string_split(text, ' '), t -> t != ''), t -> length(t))), 0) AS DOUBLE) / CAST(greatest(len(tk), 1) AS DOUBLE), 6) AS avg_word_len,
         |  round(CAST(${stopHitsSql("tk", TextFunctions.EnStop)} AS DOUBLE) / CAST(greatest(len(tk), 1) AS DOUBLE), 6) AS stop_ratio
         |FROM c)
         |SELECT doc_id, punct_ratio, avg_word_len, stop_ratio,
         |  round(CAST(0.4 AS DOUBLE) * stop_ratio + CAST(0.3 AS DOUBLE) * (CAST(1.0 AS DOUBLE) - punct_ratio) + CAST(0.3 AS DOUBLE) * least(avg_word_len / CAST(8.0 AS DOUBLE), CAST(1.0 AS DOUBLE)), 6) AS quality
         |FROM q ORDER BY doc_id""".stripMargin,
    "q32_lang_id" ->
      s"""WITH c AS (SELECT doc_id, lang, $toksSql AS tk FROM documents),
         |v AS (SELECT doc_id, lang,
         |  ${stopHitsSql("tk", TextFunctions.EnStop)} AS en, ${stopHitsSql("tk", TextFunctions.DeStop)} AS de,
         |  ${stopHitsSql("tk", TextFunctions.FrStop)} AS fr, ${stopHitsSql("tk", TextFunctions.EsStop)} AS es
         |FROM c)
         |SELECT doc_id,
         |  CASE WHEN en >= de AND en >= fr AND en >= es THEN 'en'
         |       WHEN de >= fr AND de >= es THEN 'de'
         |       WHEN fr >= es THEN 'fr' ELSE 'es' END AS pred_lang, lang
         |FROM v ORDER BY doc_id""".stripMargin,
    "q33_fingerprint" ->
      "SELECT doc_id, md5(lower(text)) AS fp FROM documents ORDER BY doc_id",
    "q34_dedup_exact" ->
      "SELECT md5(lower(text)) AS fp, min(doc_id) AS keep_id, count(*) AS n_dups FROM documents GROUP BY 1 ORDER BY 1",
    "q35_dedup_minhash" -> minhashOracle,
    "q56_contamination" ->
      s"""WITH b AS (SELECT doc_id, text,
         |  ${TextFunctions.md5Bucket16Sql("CAST(doc_id AS VARCHAR)", "split|")} % 100 AS bk FROM documents),
         |c AS (SELECT doc_id, bk, $toksSql AS tk FROM b),
         |sh AS (SELECT doc_id, bk, ${shinglesSqlN(5)} AS sh FROM c),
         |tr AS (SELECT doc_id AS train_id, unnest(sh) AS ng FROM sh WHERE bk < 80),
         |te AS (SELECT doc_id AS test_id, unnest(sh) AS ng FROM sh WHERE bk >= 90)
         |SELECT test_id, count(DISTINCT train_id) AS n_train_docs, count(*) AS n_hits
         |FROM te JOIN tr USING (ng) GROUP BY test_id ORDER BY test_id""".stripMargin,
    "q57_dedup_groups" -> dedupGroupsOracle,
    // the GraphX twin computes the same groups from the same candidates
    "q151_dedup_groups_graphx" -> dedupGroupsOracle,
    "q73_span_dup" ->
      s"""WITH c AS (SELECT doc_id, $toksSql AS tk FROM documents),
         |w AS (SELECT doc_id, unnest(list_transform(generate_series(1, greatest(len(tk)-9, 0)),
         |        i -> md5(array_to_string(list_slice(tk, i, i+9), ' ')))) AS h FROM c),
         |d AS (SELECT h, 1 AS isdup FROM w GROUP BY h HAVING count(DISTINCT doc_id) >= 2)
         |SELECT doc_id, count(*) AS n_windows,
         |  CAST(sum(CASE WHEN isdup IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_windows
         |FROM w LEFT JOIN d USING (h)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q70_embed_quantize" ->
      """WITH x AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |m AS (SELECT vec_id, e, greatest(list_max(list_transform(e, v -> abs(v))), 1e-12) AS mx FROM x)
        |SELECT vec_id, CAST(round(mx * 1000000) AS BIGINT) AS scale_key,
        |  array_to_string(list_transform(e, v -> CAST(CAST(round(v / mx * 127) AS INTEGER) AS VARCHAR)), ',') AS codes
        |FROM m ORDER BY vec_id""".stripMargin,
    "q125_feature_hash" ->
      s"""WITH f AS (SELECT user_id,
         |  event_type || ':' || CAST(CAST(json_extract_string(props, '$$.k') AS BIGINT) % 10 AS VARCHAR) AS feat,
         |  value FROM events)
         |SELECT user_id,
         |  ${TextFunctions.md5Bucket16Sql("feat", "fh|")} % 32 AS feature_idx,
         |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS feature_val
         |FROM f GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q126_bigram_lm" ->
      s"""WITH c AS (SELECT doc_id, $toksSql AS tk FROM documents),
         |bg AS (SELECT unnest(list_transform(generate_series(1, greatest(len(tk)-1, 0)),
         |         i -> array_to_string(list_slice(tk, i, i+1), ' '))) AS bg FROM c),
         |w AS (SELECT string_split(bg, ' ')[1] AS w1, string_split(bg, ' ')[2] AS w2 FROM bg),
         |c12 AS (SELECT w1, w2, count(*) AS c12 FROM w GROUP BY 1, 2),
         |c1 AS (SELECT w1, count(*) AS c1 FROM w GROUP BY 1),
         |r AS (SELECT c12.w1, c12.w2, c1.c1, c12.c12,
         |        round(CAST(c12.c12 AS DOUBLE) / CAST(c1.c1 AS DOUBLE), 6) AS p,
         |        row_number() OVER (PARTITION BY c12.w1 ORDER BY c12.c12 DESC, c12.w2) AS rn
         |      FROM c12 JOIN c1 USING (w1))
         |SELECT w1, w2 AS top_w2, c1, c12, p FROM r WHERE rn = 1 ORDER BY w1""".stripMargin,
    "q124_countmin" -> {
      import graft.sketch.CountMin.bucketSql
      val cells = (0 until 4).map(i =>
        s"SELECT $i AS row_i, ${bucketSql("user_id", i, 64)} AS bucket FROM e")
        .mkString(" UNION ALL ")
      val probes = (0 until 4).map(i =>
        s"SELECT user_id, $i AS row_i, ${bucketSql("user_id", i, 64)} AS bucket FROM top")
        .mkString(" UNION ALL ")
      s"""WITH e AS (SELECT user_id FROM events WHERE user_id IS NOT NULL),
         |cells AS ($cells),
         |cms AS (SELECT row_i, bucket, count(*) AS cnt FROM cells GROUP BY 1, 2),
         |exact AS (SELECT user_id, count(*) AS exact_n FROM e GROUP BY 1),
         |top AS (SELECT user_id, exact_n FROM exact ORDER BY exact_n DESC, user_id LIMIT 10),
         |probes AS ($probes),
         |est AS (SELECT p.user_id, min(coalesce(c.cnt, 0)) AS est
         |        FROM probes p LEFT JOIN cms c ON c.row_i = p.row_i AND c.bucket = p.bucket
         |        GROUP BY 1)
         |SELECT est.user_id, est, exact_n FROM est JOIN top USING (user_id)
         |ORDER BY user_id""".stripMargin
    },
    "q123_rolling_dau" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS d FROM events),
        |daily AS (SELECT d, CAST(count(DISTINCT user_id) AS BIGINT) AS dau FROM e GROUP BY 1),
        |days AS (SELECT DISTINCT d FROM e),
        |wau AS (SELECT days.d AS day, CAST(count(DISTINCT e.user_id) AS BIGINT) AS wau
        |        FROM days JOIN e ON e.d BETWEEN days.d - 6 AND days.d GROUP BY 1)
        |SELECT day, dau, wau FROM wau JOIN daily ON daily.d = day
        |ORDER BY day""".stripMargin,
    "q122_cell_lookup" ->
      s"""SELECT count(*) AS n,
         |  CAST(sum(CAST(amount AS DECIMAL(18,2))) AS DOUBLE) AS total
         |FROM read_parquet('$q122PtsPat/*.parquet')
         |WHERE ${Tables.cellSql("latitude", "longitude", 10)} = '${Q122Cell}'""".stripMargin,
    "q134_zorder_scan" ->
      s"""SELECT count(*) AS n,
         |  CAST(sum(CAST(amount AS DECIMAL(18,2))) AS DOUBLE) AS total
         |FROM read_parquet('$q134ZPat/*.parquet')
         |WHERE latitude >= 40.72 AND latitude < 40.73
         |  AND longitude >= -74.0 AND longitude < -73.99""".stripMargin,
    "q138_chunking" ->
      s"""WITH tk0 AS (SELECT doc_id, $toksSql AS tk FROM documents),
         |c AS (SELECT doc_id, tk, len(tk) AS n FROM tk0 WHERE len(tk) > 0),
         |idx AS (SELECT doc_id, tk, n,
         |          unnest(generate_series(0, (n - 1) // 48)) AS chunk_idx FROM c)
         |SELECT doc_id, chunk_idx, chunk_idx * 48 AS start_tok,
         |  CAST(least(64, n - chunk_idx * 48) AS BIGINT) AS n_chunk_toks,
         |  md5(array_to_string(list_slice(tk, chunk_idx * 48 + 1, chunk_idx * 48 + 64), ' ')) AS chunk_md5
         |FROM idx ORDER BY doc_id, chunk_idx""".stripMargin,
    "q155_custom_sink" ->
      """SELECT count(*) AS n_rows, bit_xor(doc_id) AS xor_ids FROM documents""",
    "q154_stream_custom_source" ->
      """WITH g AS (SELECT ii.i AS i, jj.j AS j, (31 * ii.i + 17 * jj.j) % 100 AS v
        |  FROM generate_series(0, 191) AS ii(i), generate_series(0, 7) AS jj(j))
        |SELECT i % 4 AS ib, count(*) AS n, CAST(sum(v) AS BIGINT) AS sum_v
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,
    "q153_vocab_encode" ->
      s"""WITH c AS (SELECT doc_id, $toksSql AS tk FROM documents),
         |tokp AS (SELECT doc_id, unnest(generate_series(1, len(tk))) - 1 AS pos,
         |                unnest(tk) AS tok
         |         FROM c),
         |vc AS (SELECT tok, count(*) AS cnt FROM tokp GROUP BY 1),
         |vocab AS (SELECT tok, id FROM (
         |    SELECT tok, CAST(row_number() OVER (ORDER BY cnt DESC, tok) AS BIGINT) AS id
         |    FROM vc) WHERE id <= 500),
         |enc AS (SELECT t.doc_id, t.pos, coalesce(v.id, 0) AS id
         |        FROM tokp t LEFT JOIN vocab v USING (tok))
         |SELECT doc_id, count(*) AS n_tokens,
         |  CAST(sum(CASE WHEN id = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_unk,
         |  md5(array_to_string(list(id ORDER BY pos), ',')) AS ids_md5
         |FROM enc GROUP BY 1 ORDER BY 1""".stripMargin,
    "q152_custom_source" ->
      """WITH g AS (SELECT ii.i AS i, jj.j AS j, (31 * ii.i + 17 * jj.j) % 100 AS v
        |  FROM generate_series(100, 163) AS ii(i), generate_series(200, 263) AS jj(j))
        |SELECT i % 8 AS ib, count(*) AS n, CAST(sum(v) AS BIGINT) AS sum_v
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,
    "q150_unicode_normalize" ->
      """WITH r AS (SELECT doc_id,
        |  text || ' cafe' || chr(769) ||
        |    (CASE WHEN doc_id % 3 = 0 THEN ' a' || chr(778) ELSE '' END) AS raw
        |  FROM documents)
        |SELECT doc_id, CAST(length(raw) AS BIGINT) AS len_raw,
        |  CAST(length(nfc_normalize(raw)) AS BIGINT) AS len_nfc,
        |  md5(nfc_normalize(raw)) AS nfc_md5
        |FROM r ORDER BY doc_id""".stripMargin,
    "q149_drift" ->
      s"""WITH s AS (SELECT lang,
         |  ${TextFunctions.md5Bucket16Sql("CAST(doc_id AS VARCHAR)", "ab|")} % 2 AS side
         |  FROM documents),
         |tot AS (SELECT side, count(*) AS tot FROM s GROUP BY 1),
         |shr AS (SELECT lang, s.side, (1000000 * count(*)) // min(tot) AS share_micro
         |        FROM s JOIN tot ON tot.side = s.side GROUP BY 1, 2),
         |p AS (SELECT lang,
         |        CAST(sum(CASE WHEN side = 0 THEN share_micro ELSE 0 END) AS BIGINT) AS share_a,
         |        CAST(sum(CASE WHEN side = 1 THEN share_micro ELSE 0 END) AS BIGINT) AS share_b
         |      FROM shr GROUP BY 1)
         |SELECT lang, share_a, share_b, abs(share_a - share_b) AS drift_micro
         |FROM p ORDER BY lang""".stripMargin,
    "q148_schema_evolution" ->
      s"""SELECT doc_id % 2 AS batch, count(*) AS n_rows,
         |  count(quality) AS n_with_quality,
         |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
         |  coalesce(CAST(sum(quality) AS BIGINT), 0) AS sum_quality
         |FROM read_parquet(['$q148V1Pat/*.parquet', '$q148V2Pat/*.parquet'],
         |                  union_by_name=true)
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q147_keywords" ->
      s"""WITH tf AS (SELECT doc_id, unnest($toksSql) AS term FROM documents),
         |tfx AS (SELECT doc_id, term, count(*) AS tf FROM tf GROUP BY 1, 2),
         |dfx AS (SELECT term, count(*) AS df FROM tfx GROUP BY 1),
         |r AS (SELECT doc_id, term, tf, df,
         |        row_number() OVER (PARTITION BY doc_id ORDER BY tf DESC, df ASC, term) AS rk
         |      FROM tfx JOIN dfx USING (term))
         |SELECT doc_id, CAST(rk AS BIGINT) AS rk, term, tf, df
         |FROM r WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,
    "q146_view_maintain" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS d,
        |  CAST(round(value * 1000000) AS BIGINT) AS micros FROM events),
        |cut AS (SELECT (min(d) + max(d)) // 2 AS cut FROM e),
        |base AS (SELECT user_id, count(*) AS n, CAST(sum(micros) AS BIGINT) AS sm
        |         FROM e, cut WHERE d < cut GROUP BY 1),
        |delta AS (SELECT user_id, count(*) AS n, CAST(sum(micros) AS BIGINT) AS sm
        |          FROM e, cut WHERE d >= cut GROUP BY 1)
        |SELECT coalesce(b.user_id, dl.user_id) AS user_id,
        |  coalesce(b.n, 0) + coalesce(dl.n, 0) AS n_events,
        |  coalesce(b.sm, 0) + coalesce(dl.sm, 0) AS sum_micros
        |FROM base b FULL OUTER JOIN delta dl ON b.user_id = dl.user_id
        |ORDER BY user_id""".stripMargin,
    "q145_minhash_est" -> {
      val matchSum = (0 until 8)
        .map(k => s"CASE WHEN x.h$k = y.h$k THEN 1 ELSE 0 END").mkString(" + ")
      s"""WITH $minhashCandCtes,
         |j AS (SELECT c.id_a, c.id_b,
         |        ($matchSum) AS matches,
         |        len(list_intersect(sa.sh, sb.sh)) AS inter,
         |        len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)) AS uni
         |      FROM cand c
         |      JOIN sigs x ON x.doc_id = c.id_a
         |      JOIN sigs y ON y.doc_id = c.id_b
         |      JOIN shg sa ON sa.doc_id = c.id_a
         |      JOIN shg sb ON sb.doc_id = c.id_b)
         |SELECT id_a, id_b,
         |  (1000000 * matches) // 8 AS est_micro,
         |  (1000000 * inter) // uni AS jac_micro,
         |  abs((1000000 * matches) // 8 - (1000000 * inter) // uni) AS abs_err_micro
         |FROM j ORDER BY id_a, id_b""".stripMargin
    },
    "q144_gap_detect" ->
      """WITH e AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS d FROM events),
        |g AS (SELECT user_id, d,
        |        d - lag(d) OVER (PARTITION BY user_id ORDER BY d) - 1 AS gap
        |      FROM e)
        |SELECT user_id, count(*) AS n_active_days,
        |  max(d) - min(d) + 1 AS span_days,
        |  coalesce(max(gap), 0) AS max_gap_days
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,
    "q143_group_sample" ->
      s"""WITH p AS (SELECT source, doc_id, n_chars,
         |  ${TextFunctions.md5Bucket60Sql("'gs|' || CAST(doc_id AS VARCHAR)")} AS pri
         |  FROM documents),
         |r AS (SELECT source, doc_id, n_chars,
         |        row_number() OVER (PARTITION BY source ORDER BY pri, doc_id) AS rk
         |      FROM p)
         |SELECT source, CAST(rk AS BIGINT) AS rk, doc_id, n_chars
         |FROM r WHERE rk <= 5 ORDER BY source, rk""".stripMargin,
    "q142_quant_recall" ->
      """WITH x AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |q AS (SELECT vec_id AS query_id, e AS qv FROM x WHERE vec_id < 5),
        |ex AS (SELECT q.query_id, c.vec_id AS corpus_id,
        |         row_number() OVER (PARTITION BY q.query_id ORDER BY
        |           CAST(round(list_cosine_similarity(q.qv, c.e) * 10000) AS BIGINT) DESC,
        |           c.vec_id) AS rank
        |       FROM q CROSS JOIN x c WHERE c.vec_id != q.query_id),
        |m AS (SELECT vec_id, e, greatest(list_max(list_transform(e, v -> abs(v))), 1e-12) AS mx FROM x),
        |cod AS (SELECT vec_id,
        |          list_transform(e, v -> CAST(CAST(round(v / mx * 127) AS INTEGER) AS DOUBLE)) AS cv
        |        FROM m),
        |qz AS (SELECT vec_id AS query_id, cv AS qv FROM cod WHERE vec_id < 5),
        |qx AS (SELECT qz.query_id, c.vec_id AS corpus_id,
        |         row_number() OVER (PARTITION BY qz.query_id ORDER BY
        |           CAST(round(list_cosine_similarity(qz.qv, c.cv) * 10000) AS BIGINT) DESC,
        |           c.vec_id) AS rank
        |       FROM qz CROSS JOIN cod c WHERE c.vec_id != qz.query_id),
        |ov AS (SELECT e.query_id, count(*) AS n
        |       FROM (SELECT query_id, corpus_id FROM ex WHERE rank <= 10) e
        |       JOIN (SELECT query_id, corpus_id FROM qx WHERE rank <= 10) z
        |         USING (query_id, corpus_id)
        |       GROUP BY 1)
        |SELECT q.query_id, coalesce(ov.n, 0) AS recall10
        |FROM (SELECT DISTINCT query_id FROM q) q LEFT JOIN ov USING (query_id)
        |ORDER BY query_id""".stripMargin,
    "q141_bpe_merges" ->
      s"""WITH tk AS (SELECT $toksSql AS tk FROM documents),
         |tok AS (SELECT unnest(tk) AS tok FROM tk),
         |pairs AS (SELECT unnest(list_transform(generate_series(1, length(tok) - 1),
         |            i -> substr(tok, i, 2))) AS pair
         |          FROM tok WHERE length(tok) >= 2)
         |SELECT pair, count(*) AS n FROM pairs
         |GROUP BY 1 ORDER BY n DESC, pair LIMIT 20""".stripMargin,
    "q140_image_ahash" ->
      s"""SELECT ahash, count(*) AS n_images, min(media_id) AS canonical_id
         |FROM read_parquet('$q140HashPat/*.parquet')
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q139_boilerplate" ->
      s"""WITH tk AS (SELECT source, doc_id, $toksSql AS tk FROM documents),
         |sh AS (SELECT source, doc_id, unnest($shinglesSql) AS sh FROM tk),
         |common AS (SELECT sh FROM (SELECT sh, count(*) AS df FROM sh GROUP BY 1)
         |           WHERE df >= 5),
         |per AS (SELECT source, doc_id, count(*) AS n_sh,
         |          CAST(sum(CASE WHEN sh IN (SELECT sh FROM common) THEN 1 ELSE 0 END) AS BIGINT) AS n_bp
         |        FROM sh GROUP BY 1, 2),
         |agg AS (SELECT source, count(*) AS n_docs,
         |          CAST(sum(n_sh) AS BIGINT) AS n_shingles,
         |          CAST(sum(n_bp) AS BIGINT) AS n_boiler
         |        FROM per GROUP BY 1)
         |SELECT source, n_docs, n_shingles, n_boiler,
         |  (1000000 * n_boiler) // n_shingles AS boiler_ratio_micro
         |FROM agg ORDER BY source""".stripMargin,
    "q137_stream_countmin" -> {
      import graft.sketch.CountMin.bucketSql
      val cells = (0 until 4).map(i =>
        s"SELECT $i AS row_i, ${bucketSql("user_id", i, 64)} AS bucket FROM e")
        .mkString(" UNION ALL ")
      s"""WITH e AS (SELECT user_id FROM events WHERE user_id IS NOT NULL),
         |cells AS ($cells)
         |SELECT row_i, bucket, count(*) AS cnt FROM cells
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },
    "q136_incremental_dedup" -> {
      val hs = (0 until 8).map(k =>
        s"list_min(list_transform(sh, x -> md5('$k|' || md5(x)))) AS h$k").mkString(", ")
      val bands = (0 until 4).map(b =>
        s"SELECT doc_id, $b AS band_idx, md5(h${2 * b} || h${2 * b + 1}) AS band_val FROM sigs")
        .mkString(" UNION ALL ")
      s"""WITH toks AS (SELECT doc_id, $toksSql AS tk FROM documents),
         |shg AS (SELECT doc_id, $shinglesSql AS sh FROM toks),
         |sigs AS (SELECT doc_id, $hs FROM shg),
         |bands AS ($bands),
         |cands AS (SELECT DISTINCT b.doc_id AS batch_id, c.doc_id AS corpus_id
         |  FROM bands b JOIN bands c
         |    ON b.band_idx = c.band_idx AND b.band_val = c.band_val
         |  WHERE b.doc_id % 5 = 0 AND c.doc_id % 5 != 0),
         |j AS (SELECT cands.batch_id, cands.corpus_id,
         |        round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
         |          (len(a.sh) + len(b.sh) - CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)), 6) AS jac
         |      FROM cands JOIN shg a ON a.doc_id = cands.batch_id
         |                 JOIN shg b ON b.doc_id = cands.corpus_id)
         |SELECT batch_id, count(*) AS n_candidates,
         |  CAST(sum(CASE WHEN jac >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_dups,
         |  min(CASE WHEN jac >= 0.5 THEN corpus_id END) AS first_dup_id
         |FROM j GROUP BY 1 ORDER BY 1""".stripMargin
    },
    "q195_stream_incremental_dedup" -> {
      val hs = (0 until 8).map(k =>
        s"list_min(list_transform(sh, x -> md5('$k|' || md5(x)))) AS h$k").mkString(", ")
      val bands = (0 until 4).map(b =>
        s"SELECT doc_id, $b AS band_idx, md5(h${2 * b} || h${2 * b + 1}) AS band_val FROM sigs")
        .mkString(" UNION ALL ")
      s"""WITH toks AS (SELECT doc_id, $toksSql AS tk FROM documents),
         |shg AS (SELECT doc_id, $shinglesSql AS sh FROM toks),
         |sigs AS (SELECT doc_id, $hs FROM shg),
         |bands AS ($bands),
         |cands AS (SELECT DISTINCT b.doc_id AS batch_id, c.doc_id AS corpus_id
         |  FROM bands b JOIN bands c
         |    ON b.band_idx = c.band_idx AND b.band_val = c.band_val
         |  WHERE b.doc_id % 5 = 0 AND c.doc_id % 5 != 0)
         |SELECT batch_id, CAST(count(DISTINCT corpus_id) AS BIGINT) AS n_cand_docs,
         |  min(corpus_id) AS first_cand_id
         |FROM cands GROUP BY 1 ORDER BY 1""".stripMargin
    },
    "q207_importance_weights" ->
      s"""WITH tk0 AS (SELECT source, doc_id, unnest($toksSql) AS token FROM documents),
         |tk AS (SELECT source, doc_id,
         |         ${TextFunctions.md5Bucket60Sql("token")} % 1024 AS f, count(*) AS k
         |       FROM tk0 GROUP BY 1, 2, 3),
         |feat AS (SELECT f,
         |           CAST(sum(CASE WHEN source = 'src0' THEN k ELSE 0 END) AS BIGINT) AS ct,
         |           CAST(sum(CASE WHEN source = 'src0' THEN 0 ELSE k END) AS BIGINT) AS cs
         |         FROM tk GROUP BY 1),
         |tot AS (SELECT CAST(sum(ct) AS BIGINT) AS tt, CAST(sum(cs) AS BIGINT) AS ss FROM feat),
         |w AS (SELECT f, ((ct + 1) * 1000000) // (tt + 1024) AS pt_micro,
         |        greatest(((cs + 1) * 1000000) // (ss + 1024), 1) AS ps_micro
         |      FROM feat, tot),
         |r AS (SELECT f, (pt_micro * 1000000) // ps_micro AS r_micro FROM w),
         |d AS (SELECT source, doc_id, CAST(sum(k) AS BIGINT) AS n_toks,
         |        CAST(sum(k * r_micro) AS BIGINT) AS sum_r
         |      FROM tk JOIN r USING (f) GROUP BY 1, 2)
         |SELECT source, doc_id, n_toks, sum_r // n_toks AS iw_micro
         |FROM d ORDER BY iw_micro DESC, doc_id LIMIT 50""".stripMargin,
    "q208_stream_ann" ->
      s"""WITH asg AS (SELECT * FROM read_parquet('$q135AsgPat/*.parquet')),
         |c AS (SELECT a.cluster, e.vec_id AS corpus_id, CAST(e.embedding AS DOUBLE[]) AS cv
         |      FROM embeddings e JOIN asg a USING (vec_id) WHERE e.vec_id % 50 != 0),
         |q AS (SELECT a.cluster, e.vec_id AS query_id, CAST(e.embedding AS DOUBLE[]) AS qv
         |      FROM embeddings e JOIN asg a USING (vec_id) WHERE e.vec_id % 50 = 0),
         |sc AS (SELECT q.query_id, c.corpus_id,
         |         CAST(round(list_cosine_similarity(q.qv, c.cv) * 10000) AS BIGINT) AS cos
         |       FROM q JOIN c USING (cluster) WHERE q.query_id != c.corpus_id),
         |ag AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_cand,
         |         CAST(max((cos + 20000) * 10000000000 - corpus_id) AS BIGINT) AS bk
         |       FROM sc GROUP BY 1)
         |SELECT query_id, n_cand,
         |  bk // 10000000000 - 19999 AS best_cos_x1e4,
         |  (bk // 10000000000 + 1) * 10000000000 - bk AS best_corpus_id
         |FROM ag ORDER BY query_id""".stripMargin,
    "q209_random_projection" ->
      s"""WITH signs AS (
         |  SELECT d.dim, jj.j,
         |    CASE WHEN ${TextFunctions.md5Bucket60Sql(
             "'rp|' || CAST(d.dim AS VARCHAR) || '|' || CAST(jj.j AS VARCHAR)")} % 2 = 0
         |      THEN 1 ELSE -1 END AS sgn
         |  FROM (SELECT unnest(range(64)) AS dim) d, (SELECT unnest(range(16)) AS j) jj),
         |x AS (SELECT vec_id, unnest(range(len(embedding))) AS dim, unnest(embedding) AS v
         |      FROM embeddings)
         |SELECT x.vec_id, s.j,
         |  CAST(round(CAST(sum(CAST(CAST(x.v AS DOUBLE) * s.sgn AS DECIMAL(27,9))) AS DOUBLE)
         |    * 1000000) AS BIGINT) AS proj_micro
         |FROM x JOIN signs s USING (dim)
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q210_sequence_pack" ->
      s"""WITH d AS (SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS n_tokens FROM documents),
         |p AS (SELECT doc_id, n_tokens,
         |        CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_start
         |      FROM d WHERE n_tokens > 0),
         |b AS (SELECT doc_id, n_tokens, tok_start, tok_start // 2048 AS first_block,
         |        (tok_start + n_tokens - 1) // 2048 AS last_block FROM p),
         |e AS (SELECT doc_id, n_tokens, tok_start, first_block,
         |        unnest(generate_series(first_block, last_block)) AS block FROM b)
         |SELECT block, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN first_block = block THEN 1 ELSE 0 END) AS BIGINT) AS n_starts,
         |  CAST(sum(least((block + 1) * 2048, tok_start + n_tokens)
         |    - greatest(block * 2048, tok_start)) AS BIGINT) AS block_tokens
         |FROM e GROUP BY block ORDER BY block""".stripMargin,
    "q211_crossdup_matrix" ->
      s"""WITH $minhashCandCtes,
         |sp AS (SELECT least(da.source, db.source) AS source_a,
         |         greatest(da.source, db.source) AS source_b, c.id_a, c.id_b
         |       FROM cand c JOIN documents da ON da.doc_id = c.id_a
         |                   JOIN documents db ON db.doc_id = c.id_b),
         |np AS (SELECT source_a, source_b, count(*) AS n_pairs FROM sp GROUP BY 1, 2),
         |nd AS (SELECT source_a, source_b, count(DISTINCT d) AS n_docs
         |       FROM (SELECT source_a, source_b, unnest([id_a, id_b]) AS d FROM sp)
         |       GROUP BY 1, 2)
         |SELECT np.source_a, np.source_b, np.n_pairs, nd.n_docs
         |FROM np JOIN nd USING (source_a, source_b) ORDER BY 1, 2""".stripMargin,
    "q213_vocab_coverage" ->
      s"""WITH toks AS (SELECT unnest($toksSql) AS token FROM documents),
         |c AS (SELECT token, count(*) AS cnt FROM toks GROUP BY 1),
         |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM c),
         |r AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, token) AS rank,
         |        CAST(sum(cnt) OVER (ORDER BY cnt DESC, token
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS covered
         |      FROM c QUALIFY rank <= 20)
         |SELECT rank AS vocab_size, covered, n AS total_tokens,
         |  (1000000 * covered) // n AS coverage_micro
         |FROM r, tot WHERE rank IN (5, 10, 20) ORDER BY vocab_size""".stripMargin,
    "q214_dedup_survivorship" ->
      s"""WITH RECURSIVE $componentsCtes
         |SELECT d.source, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN coalesce(c.component, d.doc_id) = d.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  (1000000 * CAST(sum(CASE WHEN coalesce(c.component, d.doc_id) = d.doc_id THEN 1 ELSE 0 END) AS BIGINT)) // count(*) AS retention_micro
         |FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q212_heavy_hitters" ->
      s"""WITH toks AS (SELECT unnest($toksSql) AS token FROM documents),
         |tot AS (SELECT count(*) AS n FROM toks),
         |c AS (SELECT token, count(*) AS cnt FROM toks GROUP BY 1)
         |SELECT token, cnt, n AS total_tokens, (1000000 * cnt) // n AS freq_micro
         |FROM c, tot WHERE cnt * 64 >= n ORDER BY cnt DESC, token""".stripMargin,
    "q135_semantic_dedup" ->
      s"""WITH RECURSIVE asg AS (SELECT * FROM read_parquet('$q135AsgPat/*.parquet')),
         |ce AS (SELECT emb.vec_id, asg.cluster, CAST(emb.embedding AS DOUBLE[]) AS v
         |       FROM embeddings emb JOIN asg ON emb.vec_id = asg.vec_id),
         |cand AS (SELECT x.vec_id AS id_a, y.vec_id AS id_b
         |         FROM ce x JOIN ce y ON x.cluster = y.cluster AND x.vec_id < y.vec_id
         |         WHERE CAST(round(list_cosine_similarity(x.v, y.v) * 10000) AS BIGINT) >= 3000),
         |edges AS (SELECT id_a AS a, id_b AS b FROM cand UNION ALL SELECT id_b, id_a FROM cand),
         |reach(id, r) AS (
         |  SELECT DISTINCT a, a FROM edges
         |  UNION
         |  SELECT e2.a, r.r FROM edges e2 JOIN reach r ON e2.b = r.id),
         |comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id)
         |SELECT coalesce(c.component, emb.vec_id) AS group_id, count(*) AS n_vecs,
         |  min(emb.vec_id) AS keep_id
         |FROM embeddings emb LEFT JOIN comp c ON emb.vec_id = c.id
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q119_set_ops_all" ->
      """WITH a AS (SELECT o_custkey FROM orders WHERE o_totalprice > 150000.0),
        |b AS (SELECT o_custkey FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')),
        |i AS (SELECT 'intersect_all' AS op, o_custkey FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b)),
        |e AS (SELECT 'except_all' AS op, o_custkey FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b))
        |SELECT op, o_custkey, count(*) AS n
        |FROM (SELECT * FROM i UNION ALL SELECT * FROM e)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q120_unpivot" ->
      """SELECT o_orderpriority, status, cnt FROM (
        |  SELECT o_orderpriority,
        |    count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS f,
        |    count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS o,
        |    count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS p
        |  FROM orders GROUP BY 1)
        |UNPIVOT (cnt FOR status IN (f, o, p))
        |ORDER BY o_orderpriority, status""".stripMargin,
    "q121_not_in_nulls" ->
      """WITH probe AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
        |               UNION ALL SELECT CAST(NULL AS BIGINT))
        |SELECT
        |  (SELECT count(*) FROM customer
        |   WHERE c_custkey NOT IN (SELECT o_custkey FROM probe)) AS n_not_in,
        |  (SELECT count(*) FROM customer c
        |   WHERE NOT EXISTS (SELECT 1 FROM probe p
        |                     WHERE p.o_custkey = c.c_custkey)) AS n_not_exists""".stripMargin,
    "q117_variant" ->
      """WITH v AS (SELECT event_type,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
        |SELECT event_type, count(k) AS n,
        |  CAST(sum(CASE WHEN k % 2 = 0 THEN k END) AS BIGINT) AS sum_even_k, max(k) AS max_k
        |FROM v GROUP BY 1 ORDER BY 1""".stripMargin,
    "q118_lateral" ->
      """SELECT c.c_custkey, l.o_orderkey, l.o_totalprice
        |FROM customer c,
        |LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
        |         WHERE o.o_custkey = c.c_custkey
        |         ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1) AS l
        |ORDER BY c.c_custkey""".stripMargin,
    "q116_recursive_cte" ->
      """WITH RECURSIVE anc(p, a, depth) AS (
        |  SELECT p_partkey, p_partkey, 0 FROM part WHERE p_partkey < 128
        |  UNION ALL
        |  SELECT p, a // 2, depth + 1 FROM anc WHERE a > 1
        |)
        |SELECT p AS part_id, CAST(max(depth) AS BIGINT) AS depth_to_root
        |FROM anc GROUP BY p ORDER BY p""".stripMargin,
    "q115_grouping_sets" ->
      """SELECT lang, source, CAST(grouping(lang) AS TINYINT) AS g_lang,
        |  CAST(grouping(source) AS TINYINT) AS g_source,
        |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents
        |GROUP BY GROUPING SETS ((lang), (source), ())
        |ORDER BY g_lang, g_source, lang NULLS FIRST, source NULLS FIRST""".stripMargin,
    "q114_fuzzy_match" ->
      """WITH p AS (SELECT c_custkey AS probe_id,
        |  substr(c_name, 1, 5) || 'X' || substr(c_name, 7) AS probe_name
        |  FROM customer WHERE c_custkey % 97 = 0)
        |SELECT probe_id, c_custkey, CAST(levenshtein(probe_name, c_name) AS BIGINT) AS dist
        |FROM p JOIN customer ON length(probe_name) = length(c_name)
        |  AND levenshtein(probe_name, c_name) <= 1
        |ORDER BY 1, 2""".stripMargin,
    "q111_orc_roundtrip" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders WHERE o_orderstatus = 'F'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q112_sentence_stats" ->
      """WITH c AS (SELECT doc_id,
        |  list_filter(string_split_regex(text, '[.!?] '), x -> x != '') AS sent
        |  FROM documents)
        |SELECT doc_id, CAST(len(sent) AS BIGINT) AS n_sentences,
        |  round(coalesce(CAST(list_sum(list_transform(sent, x -> length(x))) AS DOUBLE) /
        |    CAST(nullif(len(sent), 0) AS DOUBLE), 0.0), 6) AS avg_sentence_chars
        |FROM c ORDER BY doc_id""".stripMargin,
    "q113_rank_functions" ->
      """SELECT event_type, event_id,
        |  CAST(dense_rank() OVER w AS BIGINT) AS drank,
        |  round(percent_rank() OVER w, 6) AS prank,
        |  round(cume_dist() OVER w, 6) AS cdist
        |FROM events
        |WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
        |ORDER BY event_type, event_id""".stripMargin,
    "q109_hotspots" -> {
      val res = 9
      val rows = 1L << (res + 8)
      val cols = 1L << (res + 9)
      s"""WITH ${Tables.pointsSql},
         |c AS (SELECT ${Tables.cellSql("latitude", "longitude", res)} AS cell,
         |        ${Tables.latIdxSql("latitude", res)} AS i,
         |        ${Tables.lngIdxSql("longitude", res)} AS j,
         |        count(*) AS n
         |      FROM points GROUP BY 1, 2, 3),
         |nb AS (SELECT a.cell, b.n AS nb_n
         |       FROM c a, unnest([-1, 0, 1]) AS tdi(di), unnest([-1, 0, 1]) AS tdj(dj)
         |       JOIN c b ON b.i = a.i + tdi.di
         |                AND b.j = (((a.j + tdj.dj) % $cols) + $cols) % $cols
         |       WHERE a.i + tdi.di BETWEEN 0 AND ${rows - 1}),
         |dens AS (SELECT cell, CAST(sum(nb_n) AS BIGINT) AS ring_n FROM nb GROUP BY 1),
         |st AS (SELECT count(*) AS cnt, CAST(sum(ring_n) AS DOUBLE) AS s,
         |         CAST(sum(ring_n * ring_n) AS DOUBLE) AS ss FROM dens)
         |SELECT cell, ring_n,
         |  round((ring_n - st.s / st.cnt) / sqrt((st.ss - st.s * st.s / st.cnt) / st.cnt), 6) AS z
         |FROM dens, st
         |WHERE round((ring_n - st.s / st.cnt) / sqrt((st.ss - st.s * st.s / st.cnt) / st.cnt), 6) >= 2.0
         |ORDER BY cell""".stripMargin
    },
    "q110_trajectory" -> {
      val hav = Tables.haversineSql("plat", "plng", "lat", "lng")
      s"""WITH p AS (SELECT o_custkey AS u,
         |  CAST(40.70 AS DOUBLE) + (l_partkey % 1000) * 6e-5 AS lat,
         |  CAST(-74.02 AS DOUBLE) + (l_suppkey % 1000) * 8e-5 AS lng,
         |  o_orderdate AS d, l_orderkey AS ok, l_linenumber AS ln
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |l AS (SELECT u, lat, lng,
         |  lag(lat) OVER (PARTITION BY u ORDER BY d, ok, ln, lat, lng) AS plat,
         |  lag(lng) OVER (PARTITION BY u ORDER BY d, ok, ln, lat, lng) AS plng
         |  FROM p)
         |SELECT u, count(plat) AS n_steps,
         |  coalesce(CAST(sum(CAST(round($hav, 3) AS DECIMAL(18,3))) AS DOUBLE), 0.0) AS total_m
         |FROM l GROUP BY 1 ORDER BY 1""".stripMargin
    },
    "q108_ring_density" -> {
      val res = 9
      val rows = 1L << (res + 8)
      val cols = 1L << (res + 9)
      s"""WITH ${Tables.pointsSql},
         |c AS (SELECT ${Tables.cellSql("latitude", "longitude", res)} AS cell,
         |        ${Tables.latIdxSql("latitude", res)} AS i,
         |        ${Tables.lngIdxSql("longitude", res)} AS j,
         |        count(*) AS n
         |      FROM points GROUP BY 1, 2, 3),
         |nb AS (SELECT a.cell, a.n, b.n AS nb_n
         |       FROM c a, unnest([-1, 0, 1]) AS tdi(di), unnest([-1, 0, 1]) AS tdj(dj)
         |       JOIN c b ON b.i = a.i + tdi.di
         |                AND b.j = (((a.j + tdj.dj) % $cols) + $cols) % $cols
         |       WHERE a.i + tdi.di BETWEEN 0 AND ${rows - 1})
         |SELECT cell, n, CAST(sum(nb_n) AS BIGINT) AS ring_n FROM nb GROUP BY 1, 2 ORDER BY 1""".stripMargin
    },
    "q106_json_extract" ->
      """WITH j AS (SELECT event_type,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
        |SELECT event_type, count(k) AS n, min(k) AS min_k, max(k) AS max_k,
        |  CAST(sum(k) AS BIGINT) AS sum_k
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    "q107_string_agg" ->
      """SELECT o_orderstatus, count(*) AS n,
        |  array_to_string(list_sort(list(DISTINCT o_orderpriority)), '|') AS priorities
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q105_domain_mix" ->
      s"""WITH k AS (SELECT source, doc_id,
         |  CASE WHEN ${TextFunctions.md5Bucket16Sql("CAST(doc_id AS VARCHAR)", "mix|")} % 10000 <
         |    (CASE WHEN source = 'src0' THEN 10000 WHEN source = 'src1' THEN 5000
         |          WHEN source = 'src2' THEN 2500 ELSE 1000 END)
         |  THEN 1 ELSE 0 END AS keep FROM documents)
         |SELECT source, count(*) AS n_total,
         |  CAST(sum(keep) AS BIGINT) AS n_kept,
         |  bit_xor(CASE WHEN keep = 1 THEN doc_id END) AS kept_xor
         |FROM k GROUP BY 1 ORDER BY 1""".stripMargin,
    "q104_transform_with_state" ->
      """SELECT user_id, count(*) AS n_events,
        |  CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS sum_micros
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q128_degree_hist" ->
      """WITH po AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |raw AS (SELECT x.p AS u, y.p AS v FROM po x JOIN po y USING (o) WHERE x.p < y.p
        |        GROUP BY 1, 2 HAVING count(*) >= 2),
        |deg AS (SELECT n, count(*) AS d FROM (SELECT u AS n FROM raw UNION ALL SELECT v FROM raw) GROUP BY 1)
        |SELECT d, count(*) AS n_vertices FROM deg GROUP BY 1 ORDER BY 1""".stripMargin,
    "q127_clustering_coeff" ->
      """WITH po AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |raw AS (SELECT x.p AS u, y.p AS v FROM po x JOIN po y USING (o) WHERE x.p < y.p
        |        GROUP BY 1, 2 HAVING count(*) >= 2),
        |deg AS (SELECT n, count(*) AS d FROM (SELECT u AS n FROM raw UNION ALL SELECT v FROM raw) GROUP BY 1),
        |ed AS (SELECT
        |  CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v) THEN u ELSE v END AS a,
        |  CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v) THEN v ELSE u END AS b,
        |  CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v) THEN dv.d ELSE du.d END AS db
        |  FROM raw JOIN deg du ON du.n = u JOIN deg dv ON dv.n = v),
        |tri AS (SELECT count(*) AS n_triangles
        |  FROM ed ab JOIN ed ac ON ab.a = ac.a AND (ab.db < ac.db OR (ab.db = ac.db AND ab.b < ac.b))
        |             JOIN ed bc ON bc.a = ab.b AND bc.b = ac.b),
        |wg AS (SELECT CAST(sum(d * (d - 1) // 2) AS BIGINT) AS n_wedges FROM deg)
        |SELECT n_wedges, n_triangles,
        |  round(n_triangles * 3.0 / n_wedges, 6) AS clustering_coeff
        |FROM wg, tri""".stripMargin,
    "q101_triangles" ->
      """WITH po AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |raw AS (SELECT x.p AS u, y.p AS v FROM po x JOIN po y USING (o) WHERE x.p < y.p
        |        GROUP BY 1, 2 HAVING count(*) >= 2),
        |deg AS (SELECT n, count(*) AS d FROM (SELECT u AS n FROM raw UNION ALL SELECT v FROM raw) GROUP BY 1),
        |ed AS (SELECT
        |  CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v) THEN u ELSE v END AS a,
        |  CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v) THEN v ELSE u END AS b,
        |  CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v) THEN dv.d ELSE du.d END AS db
        |  FROM raw JOIN deg du ON du.n = u JOIN deg dv ON dv.n = v),
        |tri AS (SELECT count(*) AS n_triangles
        |  FROM ed ab JOIN ed ac ON ab.a = ac.a AND (ab.db < ac.db OR (ab.db = ac.db AND ab.b < ac.b))
        |             JOIN ed bc ON bc.a = ab.b AND bc.b = ac.b),
        |es AS (SELECT count(*) AS n_edges, CAST(count(DISTINCT a) AS BIGINT) AS n_left_nodes FROM ed)
        |SELECT n_edges, n_left_nodes, n_triangles FROM es, tri""".stripMargin,
    "q102_scd2" ->
      """WITH base AS (SELECT user_id, event_type AS state, epoch_us(ts) AS ts_us, event_id FROM events),
        |changes AS (SELECT user_id, state, ts_us, event_id,
        |  lag(state) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_state
        |  FROM base)
        |SELECT user_id, state, ts_us AS valid_from,
        |  lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS valid_to
        |FROM changes WHERE prev_state IS NULL OR prev_state != state
        |ORDER BY user_id, valid_from""".stripMargin,
    "q103_zscore" ->
      """WITH st AS (SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s,
        |  CAST(sum(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS ss
        |  FROM events GROUP BY 1)
        |SELECT e.event_id, e.event_type,
        |  round((e.value - st.s / st.n) / sqrt((st.ss - st.s * st.s / st.n) / st.n), 6) AS z
        |FROM events e JOIN st USING (event_type) ORDER BY e.event_id""".stripMargin,
    "q96_locf_impute" ->
      """WITH e AS (SELECT user_id, event_id, ts,
        |  CASE WHEN event_id % 13 = 0 THEN NULL ELSE value END AS v FROM events)
        |SELECT user_id, event_id, v,
        |  last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS v_filled
        |FROM e ORDER BY user_id, event_id""".stripMargin,
    "q97_event_transitions" ->
      """WITH g AS (SELECT user_id, event_type,
        |  lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events)
        |SELECT prev, event_type, count(*) AS n FROM g
        |WHERE prev IS NOT NULL GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q98_cohort_retention" ->
      """WITH act AS (SELECT DISTINCT user_id, CAST(date_trunc('month', ts) AS DATE) AS m FROM events),
        |cohort AS (SELECT user_id, min(m) AS c FROM act GROUP BY 1)
        |SELECT c AS cohort,
        |  CAST(year(m) * 12 + month(m) - year(c) * 12 - month(c) AS BIGINT) AS months_since,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM act JOIN cohort USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q99_funnel" ->
      """WITH f AS (SELECT user_id,
        |  min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
        |  min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
        |  min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy
        |  FROM events GROUP BY 1)
        |SELECT count(CASE WHEN t_view IS NOT NULL THEN 1 END) AS n_view,
        |  count(CASE WHEN t_view < t_click THEN 1 END) AS n_view_click,
        |  count(CASE WHEN t_view < t_click AND t_click < t_buy THEN 1 END) AS n_full_funnel
        |FROM f""".stripMargin,
    "q100_skew_report" ->
      """WITH c AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1),
        |p AS (SELECT user_id, n, round(n * 100.0 / sum(n) OVER (), 6) AS pct FROM c)
        |SELECT user_id, n, pct FROM p ORDER BY n DESC, user_id LIMIT 10""".stripMargin,
    "q91_topk_agg" ->
      """WITH r AS (SELECT event_type, event_id, value,
        |  row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rank
        |  FROM events WHERE value IS NOT NULL)
        |SELECT event_type, event_id, value, CAST(rank AS BIGINT) AS rank
        |FROM r WHERE rank <= 3 ORDER BY event_type, rank""".stripMargin,
    "q92_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 200000)
        |ORDER BY 1""".stripMargin,
    "q93_sql_subqueries" ->
      """SELECT c_mktsegment, count(*) AS n_cust,
        |  CAST(sum(CASE WHEN EXISTS (
        |    SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c.c_custkey
        |      AND o.o_totalprice > (SELECT max(o_totalprice) * 0.5 FROM orders)
        |  ) THEN 1 ELSE 0 END) AS BIGINT) AS n_big
        |FROM customer c GROUP BY 1 ORDER BY 1""".stripMargin,
    "q94_nullsafe_join" ->
      """WITH a AS (SELECT CASE WHEN o_orderkey % 100 = 0 THEN NULL
        |                       ELSE o_orderkey % 50 END AS k FROM orders),
        |b AS (SELECT CAST(i AS BIGINT) AS k FROM generate_series(0, 49) t(i)
        |      UNION ALL SELECT NULL)
        |SELECT coalesce(a.k, -1) AS k_group, count(*) AS n
        |FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q95_monthly_rollup" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q86_stream_session" ->
      """WITH g AS (SELECT user_id, ts,
        |  CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000 THEN 1 ELSE 0 END AS ns
        |  FROM events),
        |s AS (SELECT user_id, ts,
        |  sum(ns) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM g)
        |SELECT user_id, min(epoch_us(ts)) AS session_start_us,
        |  max(epoch_us(ts)) + 1800000000 AS session_end_us, count(*) AS n_events
        |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start_us""".stripMargin,
    "q87_stream_upsert" ->
      """WITH latest AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, value,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, event_id, ts_us, value FROM latest WHERE rn = 1
        |UNION ALL
        |SELECT 1000000 + i AS user_id, CAST(-1 AS BIGINT) AS event_id,
        |  CAST(0 AS BIGINT) AS ts_us, CAST(0.0 AS DOUBLE) AS value
        |FROM generate_series(0, 4) t(i)
        |ORDER BY user_id""".stripMargin,
    "q88_url_extract" ->
      """WITH p AS (SELECT doc_id,
        |  text || ' see https://site' || CAST(doc_id % 7 AS VARCHAR) || '.example.org/p/' ||
        |  CAST(doc_id AS VARCHAR) || ' and http://mirror' || CAST(doc_id % 3 AS VARCHAR) ||
        |  '.example.net' AS text FROM documents),
        |u AS (SELECT doc_id, unnest(regexp_extract_all(text, 'https?://[A-Za-z0-9.-]+')) AS url FROM p)
        |SELECT regexp_replace(url, '^https?://', '') AS domain,
        |  count(*) AS n_refs, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        |FROM u GROUP BY 1 ORDER BY 1""".stripMargin,
    "q89_equidepth_hist" ->
      """WITH w AS (SELECT event_type, value,
        |  CAST(ntile(10) OVER (PARTITION BY event_type ORDER BY value, event_id) AS BIGINT) AS bucket
        |  FROM events)
        |SELECT event_type, bucket, count(*) AS n, min(value) AS lo, max(value) AS hi
        |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q90_range_frame" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us, value,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) OVER
        |    (PARTITION BY user_id ORDER BY epoch_us(ts)
        |     RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trail_1h_sum,
        |  count(*) OVER
        |    (PARTITION BY user_id ORDER BY epoch_us(ts)
        |     RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS trail_1h_n
        |FROM events ORDER BY user_id, ts_us, event_id""".stripMargin,
    "q81_profile" -> {
      val cols = Seq("user_id", "event_type", "value", "props")
      cols.map { c =>
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
           |  count(CASE WHEN $c IS NULL THEN 1 END) AS n_null,
           |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct FROM events""".stripMargin
      }.mkString("", " UNION ALL ", " ORDER BY col_name")
    },
    "q82_session_window" ->
      """WITH g AS (SELECT user_id, ts,
        |  CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000 THEN 1 ELSE 0 END AS ns
        |  FROM events),
        |s AS (SELECT user_id, ts,
        |  sum(ns) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM g)
        |SELECT user_id, min(epoch_us(ts)) AS session_start_us,
        |  max(epoch_us(ts)) + 1800000000 AS session_end_us, count(*) AS n_events
        |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start_us""".stripMargin,
    "q83_group_percentiles" ->
      """SELECT event_type, round(quantile_cont(value, 0.5), 6) AS p50,
        |  round(quantile_cont(value, 0.95), 6) AS p95, count(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q84_table_diff" -> {
      def side(drift: Boolean) = {
        val qty = if (drift)
          "CASE WHEN l_orderkey % 9973 = 0 THEN l_quantity + 1.0 ELSE l_quantity END"
        else "l_quantity"
        val repr = s"concat_ws('|', CAST(l_orderkey AS VARCHAR), CAST(l_linenumber AS VARCHAR), " +
          s"CAST(CAST(round(($qty) * 100) AS BIGINT) AS VARCHAR))"
        val h = TextFunctions.md5Bucket60Sql(repr)
        s"""SELECT $h % 64 AS bucket, count(*) AS n_rows, bit_xor($h) AS checksum,
           |  CAST(CAST(sum($h) AS DECIMAL(38,0)) AS VARCHAR) AS hash_sum FROM lineitem GROUP BY 1""".stripMargin
      }
      s"""WITH a AS (${side(false)}), b AS (${side(true)})
         |SELECT coalesce(a.bucket, b.bucket) AS bucket,
         |  a.n_rows AS n_rows_a, a.checksum AS checksum_a, a.hash_sum AS hash_sum_a,
         |  b.n_rows AS n_rows_b, b.checksum AS checksum_b, b.hash_sum AS hash_sum_b
         |FROM a FULL OUTER JOIN b ON a.bucket = b.bucket
         |WHERE NOT (a.n_rows IS NOT DISTINCT FROM b.n_rows
         |  AND a.checksum IS NOT DISTINCT FROM b.checksum
         |  AND a.hash_sum IS NOT DISTINCT FROM b.hash_sum)
         |ORDER BY bucket""".stripMargin
    },
    "q85_cube" ->
      """SELECT lang, source, CAST(grouping(lang) AS TINYINT) AS g_lang,
        |  CAST(grouping(source) AS TINYINT) AS g_source,
        |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY CUBE (lang, source)
        |ORDER BY g_lang, g_source, lang NULLS FIRST, source NULLS FIRST""".stripMargin,
    "q192_pivot" ->
      """SELECT lang,
        |  CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS src0,
        |  CAST(sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT) AS src1,
        |  CAST(sum(CASE WHEN source = 'src2' THEN 1 ELSE 0 END) AS BIGINT) AS src2,
        |  CAST(sum(CASE WHEN source = 'src3' THEN 1 ELSE 0 END) AS BIGINT) AS src3
        |FROM documents GROUP BY 1 ORDER BY lang""".stripMargin,
    "q77_inverted_index" ->
      s"""WITH toks AS (SELECT doc_id, list_distinct($toksSql) AS tk FROM documents),
         |ex AS (SELECT doc_id, unnest(tk) AS term FROM toks),
         |w AS (SELECT term, doc_id,
         |        row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn,
         |        count(*) OVER (PARTITION BY term) AS df
         |      FROM ex)
         |SELECT term, CAST(max(df) AS BIGINT) AS df,
         |  array_to_string(list(doc_id ORDER BY doc_id), ',') AS postings
         |FROM w WHERE rn <= 20 GROUP BY term ORDER BY term""".stripMargin,
    "q78_rolling_features" ->
      """SELECT user_id, event_id,
        |  CAST(row_number() OVER ord AS BIGINT) AS seq,
        |  lag(value) OVER ord AS prev_value,
        |  round(CAST(sum(CAST(value AS DECIMAL(18,6))) OVER m3 AS DOUBLE) / count(*) OVER m3, 6) AS mavg3,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) OVER cum AS DOUBLE) AS cumsum
        |FROM events
        |WINDOW ord AS (PARTITION BY user_id ORDER BY ts, event_id),
        |  m3 AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
        |  cum AS (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
        |ORDER BY user_id, seq""".stripMargin,
    "q79_pii_redact" ->
      s"""WITH p AS (SELECT doc_id,
         |  text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com ref ' ||
         |    lpad(CAST(doc_id * 37 % 10000000 AS VARCHAR), 8, '9') AS text
         |  FROM documents)
         |SELECT doc_id,
         |  regexp_replace(regexp_replace(text, '${TextFunctions.EmailPattern}', '<EMAIL>', 'g'),
         |    '${TextFunctions.LongNumberPattern}', '<NUM>', 'g') AS clean,
         |  CAST(len(regexp_extract_all(text, '${TextFunctions.EmailPattern}')) AS BIGINT) AS n_emails
         |FROM p ORDER BY doc_id""".stripMargin,
    "q80_bloom_prune_join" ->
      """SELECT p_brand, count(*) AS n_lines,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_size = 1 GROUP BY 1 ORDER BY 1""".stripMargin,
    "q76_kmv_distinct" ->
      s"""${graft.sketch.Kmv.sketchSql("events", "event_type", "user_id", 64)},
         |ex AS (SELECT event_type AS key, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
         |       FROM events WHERE user_id IS NOT NULL GROUP BY 1)
         |SELECT kk.key AS event_type, n_kept, kth_hash, ${graft.sketch.Kmv.estimateSql(64)} AS est_distinct, exact_distinct
         |FROM kk JOIN ex USING (key) ORDER BY 1""".stripMargin,
    "q58_embed_centroid" ->
      """WITH x AS (SELECT label, unnest(range(len(embedding))) AS dim, unnest(embedding) AS v FROM embeddings)
        |SELECT label, dim, count(*) AS n,
        |  CAST(round(CAST(sum(CAST(CAST(v AS DOUBLE) AS DECIMAL(27,9))) AS DOUBLE) / count(*) * 1000000) AS BIGINT) AS centroid_key
        |FROM x GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q59_repetition" ->
      s"""WITH c AS (SELECT doc_id, $toksSql AS tk FROM documents),
         |bg AS (SELECT doc_id, unnest(list_transform(generate_series(1, greatest(len(tk)-1, 0)),
         |         i -> array_to_string(list_slice(tk, i, i+1), ' '))) AS bg FROM c),
         |per AS (SELECT doc_id, bg, count(*) AS cnt FROM bg GROUP BY 1, 2),
         |agg AS (SELECT doc_id, max(cnt) AS top_cnt, CAST(sum(cnt) AS BIGINT) AS n_bigrams FROM per GROUP BY 1)
         |SELECT d.doc_id, coalesce(top_cnt, 0) AS top_cnt, coalesce(n_bigrams, 0) AS n_bigrams,
         |  round(coalesce(CAST(top_cnt AS DOUBLE) / CAST(n_bigrams AS DOUBLE), CAST(0.0 AS DOUBLE)), 6) AS rep_ratio
         |FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id ORDER BY d.doc_id""".stripMargin,
    "q36_dedup_jaccard" ->
      s"""WITH c AS (SELECT source, doc_id, $toksSql AS tk FROM documents WHERE source IN ('src0','src1')),
         |shg AS (SELECT source, doc_id, $shinglesSql AS sh FROM c),
         |p AS (SELECT a.source, a.doc_id AS id_a, b.doc_id AS id_b,
         |  round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
         |        CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE), 6) AS jaccard
         |FROM shg a JOIN shg b ON a.source = b.source AND a.doc_id < b.doc_id)
         |SELECT source, id_a, id_b, jaccard FROM p WHERE jaccard >= 0.10
         |ORDER BY source, id_a, id_b""".stripMargin,
    "q218_containment" ->
      s"""WITH c AS (SELECT source, doc_id, $toksSql AS tk FROM documents WHERE source IN ('src0','src1')),
         |shg AS (SELECT source, doc_id, $shinglesSql AS sh FROM c),
         |p AS (SELECT a.source, a.doc_id AS id_a, b.doc_id AS id_b,
         |  (1000000 * CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT))
         |    // CAST(least(len(a.sh), len(b.sh)) AS BIGINT) AS containment_micro
         |FROM shg a JOIN shg b ON a.source = b.source AND a.doc_id < b.doc_id
         |WHERE len(list_intersect(a.sh, b.sh)) > 0 AND len(a.sh) > 0 AND len(b.sh) > 0)
         |SELECT source, id_a, id_b, containment_micro FROM p
         |WHERE containment_micro >= 50000 ORDER BY source, id_a, id_b""".stripMargin,
    "q219_kmv_set_ops" -> {
      val estRaw = graft.sketch.Kmv.estimateRawSql(256, "n_union_kept", "theta")
      s"""WITH c AS (SELECT source, doc_id, $toksSql AS tk FROM documents),
         |sh0 AS (SELECT source, unnest($shinglesSql) AS sh FROM c),
         |h0 AS (SELECT DISTINCT source, ${TextFunctions.md5Bucket60Sql("sh")} AS hv FROM sh0),
         |r AS (SELECT source, hv, row_number() OVER (PARTITION BY source ORDER BY hv) AS rn FROM h0),
         |ks AS (SELECT source, hv FROM r WHERE rn <= 256),
         |s0 AS (SELECT DISTINCT source FROM documents),
         |pr AS (SELECT x.source AS a, y.source AS b FROM s0 x JOIN s0 y ON x.source < y.source),
         |u0 AS (SELECT pr.a, pr.b, ks.hv,
         |         max(CASE WHEN ks.source = pr.a THEN 1 ELSE 0 END) AS ina,
         |         max(CASE WHEN ks.source = pr.b THEN 1 ELSE 0 END) AS inb
         |       FROM pr JOIN ks ON ks.source = pr.a OR ks.source = pr.b
         |       GROUP BY 1, 2, 3),
         |ru AS (SELECT a, b, hv, ina, inb,
         |         row_number() OVER (PARTITION BY a, b ORDER BY hv) AS rn FROM u0),
         |uk AS (SELECT a, b, hv, ina, inb FROM ru WHERE rn <= 256),
         |ag AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n_union_kept, max(hv) AS theta,
         |         CAST(sum(ina * inb) AS BIGINT) AS n_common,
         |         CAST(sum(ina * (1 - inb)) AS BIGINT) AS n_only_a,
         |         CAST(sum((1 - ina) * inb) AS BIGINT) AS n_only_b
         |       FROM uk GROUP BY 1, 2)
         |SELECT a AS source_a, b AS source_b, n_union_kept, n_common, n_only_a, n_only_b,
         |  round($estRaw, 6) AS union_est,
         |  (1000000 * n_common) // n_union_kept AS jaccard_micro,
         |  round(($estRaw) * CAST(n_common AS DOUBLE) / CAST(n_union_kept AS DOUBLE), 6) AS inter_est
         |FROM ag ORDER BY source_a, source_b""".stripMargin
    },
    "q220_line_dedup" ->
      s"""WITH c AS (SELECT source, doc_id, $toksSql AS tk FROM documents),
         |l0 AS (SELECT source, doc_id,
         |        unnest(list_transform(generate_series(1, CAST(ceil(len(tk) / 10.0) AS BIGINT)),
         |          i -> struct_pack(idx := i,
         |                 line := array_to_string(list_slice(tk, (i - 1) * 10 + 1, i * 10), ' '),
         |                 n_tok := len(list_slice(tk, (i - 1) * 10 + 1, i * 10))))) AS ln
         |       FROM c),
         |l AS (SELECT source, doc_id, ln.idx AS idx,
         |        ${TextFunctions.md5Bucket60Sql("ln.line")} AS hv, ln.n_tok AS n_tok FROM l0),
         |r AS (SELECT source, doc_id, n_tok,
         |        row_number() OVER (PARTITION BY hv ORDER BY doc_id, idx) AS rn FROM l)
         |SELECT source, count(DISTINCT doc_id) AS n_docs, count(*) AS n_lines,
         |  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  count(*) - CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
         |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
         |  CAST(sum(CASE WHEN rn = 1 THEN 0 ELSE n_tok END) AS BIGINT) AS tokens_removed,
         |  (1000000 * CAST(sum(CASE WHEN rn = 1 THEN 0 ELSE n_tok END) AS BIGINT))
         |    // CAST(sum(n_tok) AS BIGINT) AS removed_ratio_micro
         |FROM r GROUP BY source ORDER BY source""".stripMargin,
    "q221_label_propagation" -> {
      val iters = (1 to 3).map { k =>
        val prev = if (k == 1) "lab0" else s"lab${k - 1}"
        s"""v$k AS (SELECT adj.b AS node, $prev.lab AS lab FROM adj JOIN $prev ON adj.a = $prev.node),
           |c$k AS (SELECT node, lab, count(*) AS cnt FROM v$k GROUP BY 1, 2),
           |lab$k AS (SELECT node, lab FROM (SELECT node, lab,
           |          row_number() OVER (PARTITION BY node ORDER BY cnt DESC, lab) AS rn FROM c$k)
           |        WHERE rn = 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH po AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
         |raw AS (SELECT x.p AS u, y.p AS v FROM po x JOIN po y USING (o) WHERE x.p < y.p
         |        GROUP BY 1, 2 HAVING count(*) >= 2),
         |adj AS (SELECT u AS a, v AS b FROM raw UNION ALL SELECT v, u FROM raw),
         |lab0 AS (SELECT DISTINCT a AS node, a AS lab FROM adj),
         |$iters
         |SELECT lab AS community, CAST(count(*) AS BIGINT) AS n_members, min(node) AS rep_node
         |FROM lab3 GROUP BY 1 ORDER BY n_members DESC, community LIMIT 20""".stripMargin
    },
    "q231_kcore" -> {
      // every c_r is referenced TWICE by round r+1 (and adj twice per
      // round): DuckDB inlines plain CTEs, so without AS MATERIALIZED the
      // plan blows up 2^8 scans of lineitem and dies on file handles
      val rounds = (1 to 8).map { r =>
        val prev = if (r == 1) "c0" else s"c${r - 1}"
        s"""c$r AS MATERIALIZED (SELECT a FROM (
           |  SELECT adj.a, count(*) AS d FROM adj
           |  JOIN $prev pa ON adj.a = pa.a JOIN $prev pb ON adj.b = pb.a
           |  GROUP BY 1) WHERE d >= 2)""".stripMargin
      }.mkString(",\n")
      s"""WITH po AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
         |raw AS MATERIALIZED (SELECT x.p AS u, y.p AS v FROM po x JOIN po y USING (o) WHERE x.p < y.p
         |        GROUP BY 1, 2 HAVING count(*) >= 2),
         |adj AS MATERIALIZED (SELECT u AS a, v AS b FROM raw UNION ALL SELECT v, u FROM raw),
         |c0 AS MATERIALIZED (SELECT DISTINCT a FROM adj),
         |$rounds
         |SELECT adj.a AS node, count(*) AS core_degree
         |FROM adj JOIN c8 xa ON adj.a = xa.a JOIN c8 xb ON adj.b = xb.a
         |GROUP BY 1 ORDER BY node""".stripMargin
    },
    "q223_group_split" ->
      s"""WITH RECURSIVE $componentsCtes,
         |g AS (SELECT d.doc_id, d.source, len($toksSql) AS n_tokens,
         |        coalesce(c.component, d.doc_id) AS group_id
         |      FROM documents d LEFT JOIN comp c ON d.doc_id = c.id),
         |b AS (SELECT source, group_id, n_tokens,
         |        ${TextFunctions.md5Bucket16Sql("CAST(group_id AS VARCHAR)", "split223|")} % 100 AS bk
         |      FROM g)
         |SELECT CASE WHEN bk < 80 THEN 'train' WHEN bk < 90 THEN 'val' ELSE 'test' END AS split,
         |  source, count(*) AS n_docs, count(DISTINCT group_id) AS n_groups,
         |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens
         |FROM b GROUP BY 1, 2 ORDER BY split, source""".stripMargin,
    "q224_contrastive_pairs" ->
      s"""WITH $minhashCandCtes,
         |pos AS (SELECT c.id_a AS anchor, c.id_b AS positive,
         |          (1000000 * len(list_intersect(sa.sh, sb.sh)))
         |            // (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) AS pos_jaccard_micro
         |        FROM cand c
         |        JOIN shg sa ON sa.doc_id = c.id_a
         |        JOIN shg sb ON sb.doc_id = c.id_b),
         |posf AS (SELECT * FROM pos WHERE pos_jaccard_micro >= 200000),
         |r AS (SELECT doc_id AS negative, row_number() OVER (ORDER BY doc_id) AS neg_rk FROM documents),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
         |w AS (SELECT posf.anchor, posf.positive, posf.pos_jaccard_micro,
         |        (${TextFunctions.md5Bucket60Sql("'neg|' || CAST(posf.anchor AS VARCHAR)")} % n.n) + 1 AS neg_rk
         |      FROM posf, n)
         |SELECT w.anchor, w.positive, r.negative, w.pos_jaccard_micro
         |FROM w JOIN r USING (neg_rk)
         |WHERE r.negative != w.anchor AND r.negative != w.positive
         |ORDER BY anchor, positive""".stripMargin,
    "q225_winnowing" ->
      s"""WITH c AS (SELECT source, doc_id, $toksSql AS tk FROM documents),
         |hs AS (SELECT source, doc_id,
         |        list_transform(generate_series(1, greatest(len(tk) - 2, 0)),
         |          i -> ${TextFunctions.md5Bucket60Sql("array_to_string(list_slice(tk, i, i + 2), ' ')")}) AS hsv
         |       FROM c),
         |fp0 AS (SELECT source, doc_id,
         |         CASE WHEN len(hsv) < 5 THEN CAST([] AS BIGINT[]) ELSE list_distinct(
         |           list_transform(generate_series(1, len(hsv) - 4),
         |             j -> list_min(list_slice(hsv, j, j + 4)))) END AS fps
         |        FROM hs),
         |fAll AS (SELECT source, doc_id, unnest(fps) AS fp FROM fp0),
         |f AS (SELECT source, doc_id, fp FROM fAll
         |      QUALIFY count(*) OVER (PARTITION BY source, fp) <= 32)
         |SELECT a.source AS source, a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared_fp
         |FROM f a JOIN f b ON a.source = b.source AND a.fp = b.fp AND a.doc_id < b.doc_id
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q230_contamination" ->
      s"""WITH c AS (SELECT source, doc_id, $toksSql AS tk FROM documents),
         |g0 AS (SELECT source, doc_id,
         |        CASE WHEN len(tk) < 4 THEN CAST([] AS BIGINT[]) ELSE list_distinct(
         |          list_transform(generate_series(1, len(tk) - 3),
         |            i -> ${TextFunctions.md5Bucket60Sql("array_to_string(list_slice(tk, i, i + 3), ' ')")})) END AS ghs
         |       FROM c),
         |g AS MATERIALIZED (SELECT source, doc_id, unnest(ghs) AS gh FROM g0),
         |ev AS (SELECT DISTINCT gh FROM g WHERE doc_id % 41 = 0),
         |d AS (SELECT tr.source, tr.doc_id, count(*) AS n_grams,
         |        CAST(sum(CASE WHEN ev.gh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contam
         |      FROM (SELECT * FROM g WHERE doc_id % 41 <> 0) tr
         |      LEFT JOIN ev ON tr.gh = ev.gh GROUP BY 1, 2)
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN n_contam > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated_docs,
         |  CAST(sum(n_grams) AS BIGINT) AS n_grams,
         |  CAST(sum(n_contam) AS BIGINT) AS n_contaminated_grams,
         |  (1000000 * CAST(sum(n_contam) AS BIGINT)) // CAST(sum(n_grams) AS BIGINT) AS contam_micro
         |FROM d GROUP BY 1 ORDER BY source""".stripMargin,
    "q233_decontaminate" ->
      s"""WITH c AS (SELECT source, doc_id, $toksSql AS tk FROM documents),
         |g0 AS (SELECT source, doc_id,
         |        CASE WHEN len(tk) < 4 THEN CAST([] AS BIGINT[]) ELSE list_distinct(
         |          list_transform(generate_series(1, len(tk) - 3),
         |            i -> ${TextFunctions.md5Bucket60Sql("array_to_string(list_slice(tk, i, i + 3), ' ')")})) END AS ghs
         |       FROM c),
         |g AS MATERIALIZED (SELECT source, doc_id, unnest(ghs) AS gh FROM g0),
         |ev AS (SELECT DISTINCT gh FROM g WHERE doc_id % 41 = 0),
         |bad AS (SELECT DISTINCT tr.source, tr.doc_id
         |        FROM (SELECT * FROM g WHERE doc_id % 41 <> 0) tr
         |        JOIN ev ON tr.gh = ev.gh),
         |kept AS (SELECT d.source, d.doc_id, d.text
         |         FROM documents d
         |         WHERE d.doc_id % 41 <> 0 AND NOT EXISTS (
         |           SELECT 1 FROM bad b
         |           WHERE d.source IS NOT DISTINCT FROM b.source
         |             AND d.doc_id IS NOT DISTINCT FROM b.doc_id))
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(doc_id) AS BIGINT) AS id_checksum,
         |  CAST(sum(length(text)) AS BIGINT) AS len_checksum
         |FROM kept GROUP BY 1 ORDER BY source""".stripMargin,
    "q235_stream_decontamination" ->
      s"""WITH c AS (SELECT source, doc_id, $toksSql AS tk FROM documents),
         |g0 AS (SELECT source, doc_id,
         |        CASE WHEN len(tk) < 4 THEN CAST([] AS BIGINT[]) ELSE list_distinct(
         |          list_transform(generate_series(1, len(tk) - 3),
         |            i -> ${TextFunctions.md5Bucket60Sql("array_to_string(list_slice(tk, i, i + 3), ' ')")})) END AS ghs
         |       FROM c),
         |g AS MATERIALIZED (SELECT source, doc_id, unnest(ghs) AS gh FROM g0),
         |ev AS (SELECT DISTINCT gh FROM g WHERE doc_id % 41 = 0),
         |tr AS (SELECT source, gh FROM g WHERE doc_id % 41 <> 0)
         |SELECT tr.source, count(*) AS n_grams,
         |  CAST(sum(CASE WHEN ev.gh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated_grams,
         |  (1000000 * CAST(sum(CASE WHEN ev.gh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)) // count(*) AS contam_micro
         |FROM tr LEFT JOIN ev ON tr.gh = ev.gh
         |GROUP BY 1 ORDER BY tr.source""".stripMargin,
    "q222_perplexity_buckets" ->
      s"""WITH c AS (SELECT doc_id, $toksSql AS tk FROM documents),
         |bg0 AS (SELECT doc_id, unnest(list_transform(generate_series(1, greatest(len(tk)-1, 0)),
         |          i -> array_to_string(list_slice(tk, i, i+1), ' '))) AS bg FROM c),
         |w AS (SELECT doc_id, string_split(bg, ' ')[1] AS w1, string_split(bg, ' ')[2] AS w2 FROM bg0),
         |c12 AS (SELECT w1, w2, count(*) AS c12 FROM w GROUP BY 1, 2),
         |c1 AS (SELECT w1, count(*) AS c1 FROM w GROUP BY 1),
         |j AS (SELECT w.doc_id, (1000000 * c12.c12) // c1.c1 AS p_micro
         |      FROM w JOIN c12 USING (w1, w2) JOIN c1 USING (w1)),
         |sc AS (SELECT doc_id, CAST(sum(p_micro) AS BIGINT) // count(*) AS lm_score_micro
         |       FROM j GROUP BY 1),
         |b AS (SELECT d.source, sc.doc_id, sc.lm_score_micro,
         |        CAST(ntile(3) OVER (PARTITION BY d.source
         |          ORDER BY sc.lm_score_micro DESC, sc.doc_id) AS BIGINT) AS ppl_bucket
         |      FROM sc JOIN documents d USING (doc_id))
         |SELECT source, ppl_bucket, count(*) AS n_docs,
         |  CAST(sum(lm_score_micro) AS BIGINT) // count(*) AS avg_score_micro,
         |  min(lm_score_micro) AS min_score_micro, max(lm_score_micro) AS max_score_micro
         |FROM b GROUP BY 1, 2 ORDER BY source, ppl_bucket""".stripMargin,
    "q37_dedup_simhash" -> simhashOracle,
    "q68_simhash_neardups" -> simhashNearDupsOracle,
    "q38_dedup_embedding" ->
      """SELECT a.label, a.vec_id AS id_a, b.vec_id AS id_b,
        |  CAST(round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) * 10000) AS BIGINT) AS cos_x1e4
        |FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE CAST(round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) * 10000) AS BIGINT) >= 3000
        |ORDER BY a.label, id_a, id_b""".stripMargin,
    "q39_knn_brute" ->
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 5),
        |s AS (SELECT q.query_id, c.vec_id AS corpus_id,
        |        CAST(round(list_cosine_similarity(q.qv, CAST(c.embedding AS DOUBLE[])) * 10000) AS BIGINT) AS cos_x1e4
        |      FROM q CROSS JOIN embeddings c WHERE c.vec_id != q.query_id),
        |r AS (SELECT query_id, corpus_id, cos_x1e4,
        |        row_number() OVER (PARTITION BY query_id ORDER BY cos_x1e4 DESC, corpus_id) AS rank FROM s)
        |SELECT query_id, corpus_id, cos_x1e4, rank FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "q41_multimodal_meta" ->
      """WITH m AS (SELECT doc_id AS media_id, octet_length(encode(text)) AS n FROM documents)
        |SELECT media_id,
        |  CASE WHEN n % 3 = 0 THEN 'png' WHEN n % 3 = 1 THEN 'jpg' ELSE 'webp' END AS format,
        |  CAST(64 + n % 640 AS INTEGER) AS width, CAST(64 + n % 480 AS INTEGER) AS height,
        |  CAST(n AS BIGINT) AS n_bytes, CAST(1 + n % 7 AS INTEGER) AS frames
        |FROM m ORDER BY media_id""".stripMargin,
    "q67_multimodal_decode" ->
      """SELECT doc_id AS media_id, 'png' AS format,
        |  CAST(16 + doc_id % 32 AS INTEGER) AS width,
        |  CAST(16 + doc_id % 24 AS INTEGER) AS height,
        |  CAST(1 AS INTEGER) AS frames
        |FROM documents ORDER BY media_id""".stripMargin,
    "q69_multimodal_frames" ->
      """WITH m AS (SELECT doc_id AS media_id, octet_length(encode(text)) AS L FROM documents),
        |f AS (SELECT media_id, L, greatest(L // (1 + L % 7), 1) AS chunk, 1 + L % 7 AS n FROM m),
        |fr AS (SELECT media_id, L, chunk, unnest(range(0, n, 2)) AS frame_idx FROM f)
        |SELECT media_id, CAST(frame_idx AS BIGINT) AS frame_idx,
        |  CAST(greatest(least(frame_idx * chunk + chunk, L) - frame_idx * chunk, 0) AS BIGINT) AS frame_len
        |FROM fr ORDER BY media_id, frame_idx""".stripMargin,
    "q47_corpus_clean" ->
      s"""WITH c AS (SELECT doc_id, lang, n_chars, text, $toksSql AS tk FROM documents),
         |q AS (SELECT doc_id, lang,
         |  CAST(len(tk) AS BIGINT) AS n_tokens,
         |  round(CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS DOUBLE) / CAST(greatest(length(text), 1) AS DOUBLE), 6) AS punct_ratio,
         |  round(CAST(coalesce(list_sum(list_transform(list_filter(string_split(text, ' '), t -> t != ''), t -> length(t))), 0) AS DOUBLE) / CAST(greatest(len(tk), 1) AS DOUBLE), 6) AS avg_word_len,
         |  round(CAST(${stopHitsSql("tk", TextFunctions.EnStop)} AS DOUBLE) / CAST(greatest(len(tk), 1) AS DOUBLE), 6) AS stop_ratio,
         |  md5(lower(text)) AS fp
         |FROM c),
         |w AS (SELECT doc_id, lang, n_tokens,
         |  round(CAST(0.4 AS DOUBLE) * stop_ratio + CAST(0.3 AS DOUBLE) * (CAST(1.0 AS DOUBLE) - punct_ratio) + CAST(0.3 AS DOUBLE) * least(avg_word_len / CAST(8.0 AS DOUBLE), CAST(1.0 AS DOUBLE)), 6) AS quality,
         |  min(doc_id) OVER (PARTITION BY fp) AS keep_id
         |FROM q)
         |SELECT doc_id, lang, n_tokens, quality FROM w
         |WHERE doc_id = keep_id AND quality >= 0.3
         |  AND lang IN ('en','de','fr','es') AND n_tokens BETWEEN 20 AND 10000
         |ORDER BY doc_id""".stripMargin,
    "q200_corpus_pipeline" ->
      s"""WITH c AS (SELECT source, doc_id, lang, text, $toksSql AS tk FROM documents),
         |q AS (SELECT source, doc_id, lang,
         |  CAST(len(tk) AS BIGINT) AS n_tokens,
         |  round(CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS DOUBLE) / CAST(greatest(length(text), 1) AS DOUBLE), 6) AS punct_ratio,
         |  round(CAST(coalesce(list_sum(list_transform(list_filter(string_split(text, ' '), t -> t != ''), t -> length(t))), 0) AS DOUBLE) / CAST(greatest(len(tk), 1) AS DOUBLE), 6) AS avg_word_len,
         |  round(CAST(${stopHitsSql("tk", TextFunctions.EnStop)} AS DOUBLE) / CAST(greatest(len(tk), 1) AS DOUBLE), 6) AS stop_ratio,
         |  md5(lower(text)) AS fp
         |FROM c),
         |g AS (SELECT source, doc_id, lang, n_tokens,
         |  round(CAST(0.4 AS DOUBLE) * stop_ratio + CAST(0.3 AS DOUBLE) * (CAST(1.0 AS DOUBLE) - punct_ratio) + CAST(0.3 AS DOUBLE) * least(avg_word_len / CAST(8.0 AS DOUBLE), CAST(1.0 AS DOUBLE)), 6) AS quality,
         |  min(doc_id) OVER (PARTITION BY fp) AS keep_id
         |FROM q),
         |cl AS (SELECT source, doc_id, n_tokens FROM g
         |  WHERE doc_id = keep_id AND quality >= 0.3
         |    AND lang IN ('en','de','fr','es') AND n_tokens BETWEEN 20 AND 10000),
         |wt AS (SELECT DISTINCT source,
         |  CAST(CAST(substr(source, 4) AS INT) % 4 + 1 AS BIGINT) AS wt FROM cl),
         |b AS (SELECT source, wt,
         |  CAST(60000 * wt // (SELECT CAST(sum(wt) AS BIGINT) FROM wt) AS BIGINT) AS budget_toks FROM wt),
         |r AS (SELECT source, doc_id, n_tokens,
         |  CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source
         |    ORDER BY md5('mx|' || CAST(doc_id AS VARCHAR)), doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_before
         |FROM cl),
         |sel AS (SELECT r.source, doc_id, n_tokens FROM r JOIN b ON r.source = b.source
         |        WHERE tok_before < budget_toks),
         |p AS (SELECT source, doc_id, n_tokens,
         |  CAST((sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tokens) // 5000 AS BIGINT) AS shard
         |FROM sel)
         |SELECT shard, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
         |  CAST(sum(doc_id) AS BIGINT) AS id_checksum,
         |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources
         |FROM p GROUP BY 1 ORDER BY shard""".stripMargin,
    "q48_sessionize" ->
      """WITH g AS (SELECT user_id, event_id, value, ts,
        |  CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000 THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |s AS (SELECT user_id, value,
        |  sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_idx FROM g)
        |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS session_value
        |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q46_jsonl_roundtrip" ->
      "SELECT doc_id, lang, n_chars FROM documents ORDER BY doc_id",
    "q75_merge_upsert" ->
      """WITH u AS (
        |  SELECT c_custkey, c_name || '*' AS c_name, c_mktsegment
        |  FROM customer WHERE c_mktsegment = 'BUILDING'
        |  UNION ALL
        |  SELECT 1000000 + n_nationkey, n_name, 'NEW' FROM nation)
        |SELECT * FROM u
        |UNION ALL
        |SELECT c_custkey, c_name, c_mktsegment FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM u WHERE u.c_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q71_salted_join" ->
      """SELECT s_nationkey, count(*) AS n_items, sum(l_quantity) AS sum_qty
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    "q44_set_ops" ->
      """SELECT o_custkey FROM (
        |  SELECT o_custkey FROM orders WHERE o_totalprice > 200000.0
        |  INTERSECT
        |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_custkey""".stripMargin,
    "q45_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders)
        |WHERE rnk <= 2 ORDER BY o_custkey, rnk, o_orderkey""".stripMargin,
    "q49_stream_window" ->
      """SELECT user_id, CAST(epoch_us(ts) // 3600000000 * 3600000000 AS BIGINT) AS hour_us, count(*) AS n_events
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q54_stratified_sample" ->
      """WITH r AS (SELECT source, doc_id,
        |  CAST(row_number() OVER (PARTITION BY source ORDER BY md5('s|' || CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rnk
        |FROM documents)
        |SELECT source, doc_id, rnk FROM r WHERE rnk <= 20 ORDER BY source, rnk""".stripMargin,
    "q55_hash_split" ->
      s"""WITH b AS (SELECT doc_id,
         |  ${TextFunctions.md5Bucket16Sql("CAST(doc_id AS VARCHAR)", "split|")} % 100 AS bk
         |FROM documents)
        |SELECT CASE WHEN bk < 80 THEN 'train' WHEN bk < 90 THEN 'validation' ELSE 'test' END AS split,
        |  count(*) AS n, min(doc_id) AS min_id
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,
    "q52_vocab" ->
      s"""WITH tk AS (SELECT unnest($toksSql) AS token FROM documents)
         |SELECT token, count(*) AS cnt FROM tk GROUP BY token
         |ORDER BY cnt DESC, token ASC LIMIT 100""".stripMargin,
    "q53_pack_shards" ->
      s"""WITH c AS (SELECT doc_id, text, CAST(len($toksSql) AS BIGINT) AS n_tokens FROM documents),
         |sh AS (SELECT doc_id, text, n_tokens,
         |  CAST((sum(coalesce(n_tokens, 0)) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - coalesce(n_tokens, 0)) // 5000 AS BIGINT) AS shard
         |FROM c)
         |SELECT shard, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
         |  md5(string_agg(text, e'\\n\\n' ORDER BY doc_id)) AS packed_md5
         |FROM sh GROUP BY shard ORDER BY shard""".stripMargin,
    "q27_asof_join" -> asofOracle,
    // the native-operator path computes the identical result
    "q156_asof_native" -> asofOracle,
    "q28_range_join" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        |p AS (SELECT user_id, event_id AS p_id, epoch_us(ts) AS p_us FROM events WHERE event_type = 'purchase')
        |SELECT p_id, count(*) AS n_in_window
        |FROM p JOIN e ON p.user_id = e.user_id AND e.us BETWEEN p.p_us AND p.p_us + 3600000000
        |GROUP BY p_id ORDER BY p_id""".stripMargin,
    "q29_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS cnt, max(o_totalprice) AS max_price
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q51_token_shards" ->
      s"""WITH c AS (SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS n_tokens FROM documents)
         |SELECT doc_id, n_tokens,
         |  CAST((sum(coalesce(n_tokens, 0)) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - coalesce(n_tokens, 0)) // 5000 AS BIGINT) AS shard
         |FROM c ORDER BY doc_id""".stripMargin,
    "q61_stream_state" ->
      """WITH tl AS (SELECT CAST(user_id AS VARCHAR) AS "user", 'T' || CAST(event_id % 50 AS VARCHAR) AS h3 FROM events)
        |SELECT "user", array_to_string(list_sort(list(DISTINCT h3)), ',') AS tiles
        |FROM tl GROUP BY 1 ORDER BY 1""".stripMargin,
    "q63_stream_dedup" ->
      """SELECT DISTINCT user_id, event_id % 97 AS bucket FROM events ORDER BY 1, 2""",
    // the window filter replays Spark's PER-OPERATOR watermark propagation
    // (the 3.4+ multi-stateful rule): the aggregate sits downstream of a
    // time-interval join whose condition admits matches up to 1 h behind
    // the global watermark, so its effective watermark is
    // (global wm) − 1 h interval bound — windows ending after that stay
    // in state (verified row-exact against the engine). The GLOBAL
    // watermark under the default multipleWatermarkPolicy=min is the MIN
    // over both input streams of (max event-time − 10 s delay) — i.e.
    // driven by the purchase side, since purchases ⊆ events means
    // max(p_us) ≤ max(us). Spelling it least(max(us), max(p_us)) rather
    // than max(us) keeps the oracle honest for ANY dataset whose last
    // event is a non-purchase, not just ones where the two maxima agree.
    "q226_stream_multi_stateful" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
        |p AS (SELECT user_id, event_id AS p_id, epoch_us(ts) AS p_us FROM events WHERE event_type = 'purchase'),
        |wm AS (SELECT least(max(us), (SELECT max(p_us) FROM p)) - 10000000 - 3600000000 AS w FROM e),
        |j AS (SELECT e.event_type, p.p_us
        |      FROM p JOIN e ON p.user_id = e.user_id AND e.us >= p.p_us AND e.us <= p.p_us + 3600000000)
        |SELECT (p_us // 3600000000) * 3600000000 AS ws_us, event_type, CAST(count(*) AS BIGINT) AS n
        |FROM j, wm WHERE (p_us // 3600000000) * 3600000000 + 3600000000 <= wm.w
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q227_stream_rocksdb" ->
      """WITH e AS (SELECT event_type, value, epoch_us(ts) AS us FROM events),
        |wm AS (SELECT max(us) - 10000000 AS w FROM e),
        |b AS (SELECT event_type, value, us - (us % 3600000000) AS ws_us FROM e)
        |SELECT ws_us, event_type, count(*) AS n,
        |  CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS value_micro
        |FROM b, wm WHERE ws_us + 3600000000 <= wm.w
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q64_stream_join" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        |p AS (SELECT user_id, event_id AS p_id, epoch_us(ts) AS p_us FROM events WHERE event_type = 'purchase')
        |SELECT p_id, e.event_id AS event_id
        |FROM p JOIN e ON p.user_id = e.user_id AND e.us >= p.p_us AND e.us <= p.p_us + 3600000000
        |ORDER BY p_id, event_id""".stripMargin,
    "q72_stream_static" ->
      """SELECT e.user_id, e.event_id, c.c_mktsegment
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |WHERE e.event_type = 'purchase'
        |ORDER BY e.event_id""".stripMargin,
    "q42_ttl_window" ->
      """WITH mx AS (SELECT max(ts) AS mt FROM events),
        |tl AS (SELECT CAST(user_id AS VARCHAR) AS "user", 'T' || CAST(event_id % 50 AS VARCHAR) AS h3, ts FROM events)
        |SELECT "user", array_to_string(list_sort(list(DISTINCT h3)), ',') AS tiles FROM tl, mx
        |WHERE ts > mt - INTERVAL 7 DAY AND ts <= mt GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
