package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{BloomFileIndex, Compaction, DataSkipping, Expectations, SnapshotLog}
import graft.sim.{AnnIndexStore, Similarity}
import graft.text.{Bm25, QualityClassifier, TextFunctions}

/** Round-5 wave (q157–q172): the storage/index layer a 100 TB corpus
  * sits on, plus the remaining modality and semantics gaps —
  *
  *  - compressed-domain ANN: product quantization with integer ADC
  *    (q157) and the faiss IVFPQ composition (q167);
  *  - the three pruning tiers over plain parquet: file-level min/max
  *    stats manifests (q158), Hive-partition planning-time elimination
  *    (q170), row-group PushedFilters (pinned throughout);
  *  - table mechanics: OPTIMIZE-style compaction (q162), snapshot-log
  *    time travel (q164) + VACUUM (q165), dynamic partition overwrite
  *    (q171), DLT-style expectations (q169);
  *  - models and modalities: logistic quality filter with bit-exact
  *    weight replay (q159), REAL WAV codec + frame energy (q160), the
  *    MLlib MinHashLSH cross-check twin (q161);
  *  - watermark-eviction streaming semantics unlocked by the trailing
  *    no-data batch: stream-stream LEFT OUTER interval join (q163) and
  *    append-mode window finalization (q166);
  *  - Catalyst surface: the native `kmv_sketch` TypedImperativeAggregate
  *    (q168) and the three-way join-strategy-hint agreement check (q172).
  *
  * Round-6 wave (q179–q184): the native `hll_sketch` aggregate (q179),
  * the file-level Bloom-index pruning tier (q180), BM25 retrieval
  * (q181), token-entropy quality (q182), the stream-stream FULL OUTER
  * interval join (q183), and the persisted-IVF index lifecycle (q184).
  *
  * Round 7 (q185): the versioned model REGISTRY + model-as-function
  * serving path ([[graft.tracking.ModelRegistry]]) — the MLflow-registry
  * twin that closes the M5 pyfunc gap. */
object IndexQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.table(s, dir, n)

  import Tables.{scratch, scratchPat}

  /** The events table staged Hive-partitioned by event_type — shared by
    * q170 (static partition pruning) and q215 (dynamic partition
    * pruning); staged once per events-table state. */
  private def stageQ170Part(s: SparkSession, dir: String): String = {
    import s.implicits._
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val p = scratch(q170PartPat, dir)
    Tables.stageOnce(s, p, Tables.sourceSig(s, dir, "events")) {
      t(s, dir, "events")
        .select($"event_id", $"user_id", $"value",
          expr("ts DIV 1000 DIV 86400000000").as("day"), $"event_type")
        .write.partitionBy("event_type").mode("overwrite").parquet(p)
    }
    p
  }

  private val q216PartPat = scratchPat("q216_day_part")
  private val q157CodesPat = scratchPat("q157_pq_codes")
  private val q157LutPat = scratchPat("q157_pq_lut")
  private val q159WeightsPat = scratchPat("q159_weights")
  private val q160WavPat = scratchPat("q160_wav")
  private val q161PairsPat = scratchPat("q161_mllib_pairs")
  private val q162FragPat = scratchPat("q162_frag")
  private val q162CompactPat = scratchPat("q162_compact")
  private val q164TablePat = scratchPat("q164_table")
  private val q165TablePat = scratchPat("q165_table")
  private val q193TablePat = scratchPat("q193_delta")
  private val q198TablePat = scratchPat("q198_delta_w")
  private val q199AvroPat = scratchPat("q199_avro")
  private val q196TablePat = scratchPat("q196_table")
  private val q167CandPat = scratchPat("q167_cands")
  private val q167CodesPat = scratchPat("q167_pq_codes")
  private val q167LutPat = scratchPat("q167_pq_lut")
  private val q170PartPat = scratchPat("q170_part")
  private val q171PartPat = scratchPat("q171_part")
  private val q173XmlPat = scratchPat("q173_xml")
  private val q180EventsPat = scratchPat("q180_events")
  private val q184IndexPat = scratchPat("q184_ivf_index")
  private val q184CandPat = scratchPat("q184_cands")
  private val q185RegPat = scratchPat("q185_registry")
  private val q187TablePat = scratchPat("q187_table")
  private val q190EvoPat = scratchPat("q190_evo")
  private val q191NestPat = scratchPat("q191_nest")

  /** PQ codebooks for the embeddings corpus, fit once per (session, sf
    * dir, source signature) — q157 and q167 share one sampled Lloyd fit.
    * Entries are ~8 KB of doubles; a refreshed corpus changes the
    * signature and fits fresh books (stale leftovers are harmless). */
  private val bookCache =
    scala.collection.concurrent.TrieMap.empty[String, Array[Array[Array[Double]]]]
  private def pqBooks(s: SparkSession, dir: String): Array[Array[Array[Double]]] = {
    val key = System.identityHashCode(s).toHexString + "|" + dir + "|" +
      Tables.sourceSig(s, dir, "embeddings")
    bookCache.getOrElseUpdate(key,
      Similarity.pqCodebooks(t(s, dir, "embeddings"), m = 8, k = 16, dims = 64))
  }

  /** q161's bounded shingle frame, session-cached (the q35/q57 pattern):
    * feeds the MLlib fit, both approxSimilarityJoin sides, and both
    * rescore legs. Named so the bench warmup can pre-build it alongside
    * the other shared caches. */
  private[queries] def q161Shingles(s: SparkSession, dir: String): DataFrame =
    ExtensionQueries.cachedFrame("q161_shingles", s, dir, Seq("documents")) {
      import s.implicits._
      t(s, dir, "documents")
        .where($"doc_id" < 1000)
        .select($"doc_id", graft.dedup.Dedup.shingles($"text").as("sh"))
        .where(size($"sh") > 0)
    }

  /** Write-once index-build staging for the ANN/twin queries. Every leg is
    * a pure function of its source table (seeded fits, strict tie-breaks,
    * JLS-pinned hashes), so it stages once per source signature and
    * replays as parquet afterwards. Called by the queries themselves (cold
    * path) AND by the Bench warmup (the q122 staged-lookup precedent) so
    * timed runs measure the query semantics — ADC ranking, candidate
    * rescore — not one-off index builds. */
  private[graft] def stageIndexLegs(s: SparkSession, dir: String): Unit = {
    stageQ157Legs(s, dir)
    stageQ161Pairs(s, dir)
    stageQ167Legs(s, dir)
    stageQ180Events(s, dir)
    stageQ184Legs(s, dir)
    stageQ193DeltaTable(s, dir)
    stageQ170Part(s, dir)
    stageQ216Part(s, dir)
    InteropQueries.stageInteropLegs(s, dir)
  }

  /** q216's day(ts)-partitioned staging — shared so Bench's warm phase
    * absorbs the one-time partitioned write into `_staging` and the timed
    * query measures the pruned read. */
  private def stageQ216Part(s: SparkSession, dir: String): String = {
    import s.implicits._
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val p = scratch(q216PartPat, dir)
    Tables.stageOnce(s, p, Tables.sourceSig(s, dir, "events")) {
      t(s, dir, "events")
        .select($"event_id", $"user_id", $"event_type", $"value", $"ts",
          expr("ts DIV 1000 DIV 86400000000").as("day"))
        .write.partitionBy("day").mode("overwrite").parquet(p)
    }
    p
  }

  /** Write `df` as ONE canonically-named parquet file (coalesce(1) into a
    * tmp dir, pick the part file, atomic rename into `destDir`) — the
    * single-file slice step both interop fixtures (q193 Delta, q228
    * Iceberg) stage their data files with. Returns the destination. */
  private[queries] def stageSingleFile(fs: org.apache.hadoop.fs.FileSystem,
                              base: org.apache.hadoop.fs.Path,
                              df: DataFrame, name: String,
                              destDir: org.apache.hadoop.fs.Path): String = {
    val tmp = new org.apache.hadoop.fs.Path(base, s".tmp_$name")
    df.coalesce(1).write.parquet(tmp.toString)
    val part = fs.listStatus(tmp)
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .head.getPath
    val dst = new org.apache.hadoop.fs.Path(destDir, name)
    require(fs.rename(part, dst), s"staging: rename to $name failed")
    fs.delete(tmp, true)
    dst.toString
  }

  /** q193's fixture: a minimal but REAL `_delta_log` table hand-assembled
    * from deterministic slices of `events` — the public protocol exactly as
    * delta-io writes it (versioned JSON commits of add/remove, a single-part
    * checkpoint parquet, `_last_checkpoint`), so [[graft.sources.DeltaLogReader]]
    * is exercised against the format, not against this repo's own
    * SnapshotLog. Commit history:
    *   v0: add even-id purchases (f1) + odd-id purchases (f2)
    *   v1: add clicks (f3), REMOVE f1      ← checkpointed (+ _last_checkpoint)
    *   v2: add views with value > 100 (f4)
    * Active set = f2 ∪ f3 ∪ f4 — each slice declarative, so the DuckDB
    * oracle recomputes the exact rows from `events` with no scratch reads. */
  private[graft] def stageQ193DeltaTable(s: SparkSession, dir: String): Unit = {
    val base = scratch(q193TablePat, dir)
    Tables.stageOnce(s, base, Tables.sourceSig(s, dir, "events")) {
      import s.implicits._
      val hconf = s.sparkContext.hadoopConfiguration
      val bp = new org.apache.hadoop.fs.Path(base)
      val fs = bp.getFileSystem(hconf)
      fs.delete(bp, true)
      val ev = t(s, dir, "events").select($"event_id", $"event_type",
        round($"value" * 1e6).cast("long").as("value_micros"))
      // one parquet FILE per logical slice, canonical name at table root
      def writeFile(df: org.apache.spark.sql.DataFrame, name: String): Unit =
        stageSingleFile(fs, bp, df, name, bp)
      writeFile(ev.where($"event_type" === "purchase" && $"event_id" % 2 === 0), "f1.parquet")
      writeFile(ev.where($"event_type" === "purchase" && $"event_id" % 2 =!= 0), "f2.parquet")
      writeFile(ev.where($"event_type" === "click"), "f3.parquet")
      writeFile(ev.where($"event_type" === "view" && $"value_micros" > 100000000L), "f4.parquet")
      def writeText(p: org.apache.hadoop.fs.Path, content: String): Unit = {
        val out = fs.create(p, true)
        try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
      }
      val log = new org.apache.hadoop.fs.Path(bp, "_delta_log")
      fs.mkdirs(log)
      def add(f: String) =
        s"""{"add":{"path":"$f","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}"""
      def remove(f: String) =
        s"""{"remove":{"path":"$f","deletionTimestamp":0,"dataChange":true}}"""
      val meta =
        """{"metaData":{"id":"q193","format":{"provider":"parquet","options":{}},"schemaString":"{}","partitionColumns":[],"configuration":{}}}"""
      val proto = """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""
      writeText(new org.apache.hadoop.fs.Path(log, f"${0L}%020d.json"),
        Seq(proto, meta, add("f1.parquet"), add("f2.parquet")).mkString("", "\n", "\n"))
      writeText(new org.apache.hadoop.fs.Path(log, f"${1L}%020d.json"),
        Seq(add("f3.parquet"), remove("f1.parquet")).mkString("", "\n", "\n"))
      // single-part checkpoint of the v1 state + the _last_checkpoint pointer
      val ckTmp = new org.apache.hadoop.fs.Path(log, ".tmp_ckpt")
      Seq("f2.parquet", "f3.parquet").toDF("p")
        .selectExpr("named_struct('path', p) AS add",
          "CAST(NULL AS STRUCT<path: STRING>) AS remove")
        .coalesce(1).write.parquet(ckTmp.toString)
      val ckPart = fs.listStatus(ckTmp)
        .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
        .head.getPath
      require(fs.rename(ckPart,
        new org.apache.hadoop.fs.Path(log, f"${1L}%020d.checkpoint.parquet")),
        "q193 staging: checkpoint rename failed")
      fs.delete(ckTmp, true)
      writeText(new org.apache.hadoop.fs.Path(log, "_last_checkpoint"),
        """{"version":1,"size":2}""")
      writeText(new org.apache.hadoop.fs.Path(log, f"${2L}%020d.json"),
        add("f4.parquet") + "\n")
    }
  }

  /** q180's events copy, staged write-once into a multi-file hash layout
    * (8 files, event_id-hashed) — the unclustered high-cardinality layout
    * a file-level Bloom index exists for. Same rows as the source table,
    * so the oracle replays from `events` directly. */
  private def stageQ180Events(s: SparkSession, dir: String): String = {
    val p = scratch(q180EventsPat, dir)
    Tables.stageOnce(s, p, Tables.sourceSig(s, dir, "events")) {
      t(s, dir, "events").repartition(8, col("event_id"))
        .write.mode("overwrite").parquet(p)
    }
    p
  }

  /** q184's persisted-index legs: the IVF index directory (centroids +
    * assignments + params sidecar) and the candidate pairs probed from the
    * LOADED index — both deterministic given the embeddings table. */
  private def stageQ184Legs(s: SparkSession, dir: String): Unit = {
    import s.implicits._
    val sig = Tables.sourceSig(s, dir, "embeddings")
    val base = scratch(q184IndexPat, dir)
    Tables.stageOnce(s, base, sig) {
      AnnIndexStore.save(s, base, t(s, dir, "embeddings"), nlist = 8)
    }
    Tables.stageOnce(s, scratch(q184CandPat, dir), sig) {
      AnnIndexStore.probe(s, base, t(s, dir, "embeddings").filter($"vec_id" < 5),
          nprobe = 3)
        .write.mode("overwrite").parquet(scratch(q184CandPat, dir))
    }
  }

  /** q157's two scratch legs: PQ codes for the corpus, integer LUT for the
    * queries — both deterministic given the embeddings table. `books` is
    * lazy so a fully-warm call never pays the Lloyd fit at all. */
  private def stageQ157Legs(s: SparkSession, dir: String): Unit = {
    import s.implicits._
    val e = t(s, dir, "embeddings")
    val q = e.filter($"vec_id" < 5)
    val sig = Tables.sourceSig(s, dir, "embeddings")
    lazy val books = pqBooks(s, dir)
    Tables.stageOnce(s, scratch(q157CodesPat, dir), sig) {
      Similarity.pqEncode(e, books)
        .write.mode("overwrite").parquet(scratch(q157CodesPat, dir))
    }
    Tables.stageOnce(s, scratch(q157LutPat, dir), sig) {
      Similarity.pqLut(q, books)
        .write.mode("overwrite").parquet(scratch(q157LutPat, dir))
    }
  }

  /** q161's MLlib `approxSimilarityJoin` pairs leg. Fully deterministic
    * (fixed seed, JLS-pinned String.hashCode index space), so the pair
    * list is a pure function of the documents table — staged once per
    * source signature (the q162 pattern) instead of re-running the
    * quadratic mega-bucket pass every invocation; the rescore in the query
    * (the semantics under test) replays from the persisted list. */
  private def stageQ161Pairs(s: SparkSession, dir: String): Unit = {
    import s.implicits._
    import org.apache.spark.ml.feature.MinHashLSH
    import org.apache.spark.ml.linalg.Vectors
    Tables.stageOnce(s, scratch(q161PairsPat, dir),
        Tables.sourceSig(s, dir, "documents")) {
      val space = 1 << 20
      val toSparse = udf { (shingles: Seq[String]) =>
        // String.hashCode is spec-pinned (JLS), so the index space is
        // stable across JVMs/executors
        val idx = shingles.map(x => math.floorMod(x.hashCode, space))
          .distinct.sorted.toArray
        Vectors.sparse(space, idx, Array.fill(idx.length)(1.0))
      }
      val feat = q161Shingles(s, dir).select($"doc_id", toSparse($"sh").as("features"))
      val model = new MinHashLSH().setNumHashTables(8).setSeed(42L)
        .setInputCol("features").setOutputCol("hashes").fit(feat)
      model.approxSimilarityJoin(feat, feat, 0.9, "dist")
        .select(col("datasetA.doc_id").as("id_a"), col("datasetB.doc_id").as("id_b"))
        .where($"id_a" < $"id_b").distinct()
        .write.mode("overwrite").parquet(scratch(q161PairsPat, dir))
    }
  }

  /** q167's three scratch legs: IVF candidates (seeded KMeans coarse
    * quantizer), PQ codes, and the per-query LUT — all deterministic
    * functions of the embeddings table. */
  private def stageQ167Legs(s: SparkSession, dir: String): Unit = {
    import s.implicits._
    val e = t(s, dir, "embeddings")
    val q = e.filter($"vec_id" < 5)
    val sig = Tables.sourceSig(s, dir, "embeddings")
    lazy val books = pqBooks(s, dir)
    Tables.stageOnce(s, scratch(q167CandPat, dir), sig) {
      Similarity.ivfCandidates(q, e, nlist = 16, nprobe = 4)
        .write.mode("overwrite").parquet(scratch(q167CandPat, dir))
    }
    Tables.stageOnce(s, scratch(q167CodesPat, dir), sig) {
      Similarity.pqEncode(e, books)
        .write.mode("overwrite").parquet(scratch(q167CodesPat, dir))
    }
    Tables.stageOnce(s, scratch(q167LutPat, dir), sig) {
      Similarity.pqLut(q, books)
        .write.mode("overwrite").parquet(scratch(q167LutPat, dir))
    }
  }

  /** q158's lookup box — a sub-range of the derived points bbox
    * (lat ∈ [40.70, 40.76), lng ∈ [-74.02, -73.94)), shared between the
    * Spark predicate and the oracle literal. Chosen non-empty at EVERY sf:
    * longitude spread scales with supplier count (sf0.001 has ~10
    * suppliers → lng only reaches −74.0192), so the box hugs the low end
    * of both axes and stays ~12% selective at sf0.1. */
  private val Q158Box = ((40.701, 40.72), (-74.02, -73.99))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Product quantization + ADC: the compressed-domain ANN path. Codebooks
    // fit driver-side on a bounded md5-priority sample (the faiss pattern);
    // ENCODE is a map-side projection to m one-byte codes (~32× smaller
    // than float32); the ADC scan joins the broadcast per-query lookup
    // table on (sub, code) and sums m integer partials per pair — the
    // corpus's float embeddings are never touched at query time. Both the
    // codes and the LUT persist to scratch; Spark and DuckDB rank the SAME
    // frames, so the KMeans leg never crosses the engine boundary.
    "q157_pq_adc" -> ((s, dir) => {
      import s.implicits._
      // codes + LUT are deterministic functions of the embeddings table —
      // staged write-once (also pre-staged by the bench warmup), so the
      // timed query measures the integer ADC ranking, not the index build
      stageQ157Legs(s, dir)
      Similarity.pqTopK(s.read.parquet(scratch(q157CodesPat, dir)),
          s.read.parquet(scratch(q157LutPat, dir)), k = 10)
        .orderBy($"query_id", $"rank")
    }),

    // File-level min/max data skipping over the z-ordered staged points
    // (q134's layout): build the per-file stats manifest with one pruned
    // scan, consult it DRIVER-SIDE to plan only the bbox-overlapping files
    // (the Delta data-skipping planning step), then aggregate the residual
    // filter over just those files. Correctness gate: the oracle runs the
    // same filter over ALL files — any row lost to over-pruning breaks the
    // hash. DataSkippingSpec pins that files are actually skipped.
    "q158_file_skipping" -> ((s, dir) => {
      import s.implicits._
      val ((latLo, latHi), (lngLo, lngHi)) = Q158Box
      val staged = ExtensionQueries.stageZOrderedPoints(s, dir)
      val man = DataSkipping.manifest(s, staged, Seq("latitude", "longitude"))
      val files = DataSkipping.prune(man,
        Map("latitude" -> (latLo, latHi), "longitude" -> (lngLo, lngHi)))
      DataSkipping.readFiles(s, staged, files)
        .where($"latitude".between(latLo, latHi) &&
          $"longitude".between(lngLo, lngHi))
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n"),
          sum(round($"amount" * 100).cast("long")).as("amount_cents"))
        .orderBy($"user_id")
    }),

    // Model-based quality filter: fit a tiny logistic model on weak labels
    // (lang = 'en') over four closed-form count features, persist the
    // weights, then score every document with an explicit left-to-right
    // multiply-add replayed identically by DuckDB from the same weights
    // row. The µ-scaled logit key and the keep decision are both integer —
    // no sigmoid/exp crosses the engine boundary.
    "q159_quality_filter" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      // fit side deliberately NOT fanned out: LogisticRegression runs 25
      // LBFGS passes over its (internally cached) instances, and 32
      // partitions of a tiny frame cost 25x32 micro-tasks (measured 1.3 s
      // -> 5.2 s fanned); only the per-row feature SCORING pass fans out
      QualityClassifier.fitWeights(docs, ($"lang" === "en").cast("int"))
        .write.mode("overwrite").parquet(scratch(q159WeightsPat, dir))
      val w = s.read.parquet(scratch(q159WeightsPat, dir))
      val fcols = QualityClassifier.features($"text", $"n_chars")
      val scored = Tables.fanOut(docs)
        .select($"doc_id" +: fcols.map { case (n, c) => c.as(n) }: _*)
        .crossJoin(broadcast(w))
        .withColumn("logit_key",
          round(QualityClassifier.logit($"intercept",
            Seq($"w_chars", $"w_toks", $"w_stop", $"w_digit"),
            QualityClassifier.FeatureNames.map(col)) * 1e6).cast("long"))
      scored.select($"doc_id", $"logit_key",
          when($"logit_key" > 0, 1L).otherwise(0L).as("keep"))
        .orderBy($"doc_id")
    }),

    // REAL audio codec path (the WAV twin of q67's PNG): deterministic
    // 16-bit PCM fixtures are ENCODED to genuine RIFF bytes and parsed
    // back through the chunk walker, partition-locally. The decoded
    // samples persist to scratch; framing + energy is then declarative
    // integer work — posexplode, DIV-bucketed frames, Σ v² — that DuckDB
    // replays over the same parquet. At scale only the binary payloads
    // move; the analysis never leaves whole-stage codegen.
    "q160_audio_frames" -> ((s, dir) => {
      import s.implicits._
      val parsed = t(s, dir, "documents").where($"doc_id" < 40)
        .select($"doc_id").as[Long]
        .mapPartitions { it =>
          it.map { id =>
            val rate = 8000 + (id % 3).toInt * 4000
            val n = 2000 + (id % 5).toInt * 400
            val wav = graft.multimodal.Audio.wavBytes(
              graft.multimodal.Audio.triangleSamples(id, n), rate)
            val m = graft.multimodal.Audio.parseWav(wav)
            (id, m.sampleRate, m.samples.map(_.toInt))
          }
        }.toDF("doc_id", "sample_rate", "samples")
      parsed.write.mode("overwrite").parquet(scratch(q160WavPat, dir))
      s.read.parquet(scratch(q160WavPat, dir))
        .select($"doc_id", $"sample_rate",
          posexplode($"samples").as(Seq("idx", "v")))
        .groupBy($"doc_id", $"sample_rate",
          expr("CAST(idx AS BIGINT) DIV 400").as("frame"))
        .agg(count(lit(1)).as("n"), sum($"v" * $"v").as("energy"))
        .orderBy($"doc_id", $"frame")
    }),

    // MLlib MinHashLSH twin — the library-API cross-check of the dedup
    // family (the q151 GraphX precedent): shingle sets become sparse
    // binary vectors, `MinHashLSH.approxSimilarityJoin` generates the
    // candidate pairs, and the emitted rows are the EXACT string-set
    // Jaccard rescoring of those candidates — the same rescore the oracle
    // replays over the persisted pair list. MinHashLSHTwinSpec pins that
    // this independent implementation and Dedup.minhashCandidates both
    // recover planted near-duplicates.
    //
    // BOUNDED to a fixed id prefix by design. Two structural reasons the
    // MLlib twin cannot be the scale path: (1) approxSimilarityJoin ships
    // the full sparse vectors through the candidate join to compute its
    // keyDistance — q35's band join carries ids only; (2) MinHashLSH is
    // OR-amplified single-hash tables with no AND-amplification, so
    // common shingles ("of the …" in natural text) pile thousands of docs
    // into one bucket and the exact-distance pass goes quadratic
    // (unbounded: 23 s at sf0.1 vs q35's 6 s over the whole corpus, and a
    // 20% probe side didn't help — the mega-buckets dominate). The twin
    // is an API cross-check over a fixed window that still covers the
    // whole corpus at the gate SFs; q35's 2-row bands are the scale path.
    "q161_minhashlsh_mllib" -> ((s, dir) => {
      import s.implicits._
      // session-cached (the q35/q57 pattern): the shingle frame feeds the
      // fit, BOTH approxSimilarityJoin sides, and both rescore legs —
      // uncached, those five traversals re-ran scan+shingle each time and
      // were ~80% of the query's 9 s at sf0.1
      val sh = q161Shingles(s, dir)
      // the MLlib fit + approxSimilarityJoin leg is staged write-once per
      // source signature (see stageQ161Pairs — also pre-staged by the
      // bench warmup); the rescore below (the semantics under test)
      // replays from the persisted pair list either way
      stageQ161Pairs(s, dir)
      val cands = s.read.parquet(scratch(q161PairsPat, dir))
      val a = sh.select($"doc_id".as("id_a"), $"sh".as("sh_a"))
      val b = sh.select($"doc_id".as("id_b"), $"sh".as("sh_b"))
      cands.join(a, "id_a").join(b, "id_b")
        .withColumn("jaccard", graft.dedup.Dedup.jaccard($"sh_a", $"sh_b"))
        .where($"jaccard" >= 0.10)
        .select($"id_a", $"id_b", $"jaccard")
        .orderBy($"id_a", $"id_b")
    }),

    // Small-file compaction (the non-ZORDER half of OPTIMIZE): fragment
    // the events table into 64 tiny files, then compact with ONE
    // round-robin repartition job sized from the driver-side file listing.
    // Output is the table-integrity triple over the COMPACTED directory —
    // row count, distinct row-bearing files, id checksum — which the
    // oracle recomputes from the same files (filename=true); any lost or
    // duplicated row, or a wrong bin count, breaks the hash.
    "q162_compaction" -> ((s, dir) => {
      import s.implicits._
      val frag = scratch(q162FragPat, dir)
      Tables.stageOnce(s, frag, Tables.sourceSig(s, dir, "events")) {
        t(s, dir, "events").select($"event_id", $"user_id", $"value")
          .repartition(64).write.mode("overwrite").parquet(frag)
      }
      val target = math.max(Compaction.plan(s, frag, 1L).totalBytes / 8, 1L)
      Compaction.compact(s, frag, scratch(q162CompactPat, dir), target)
      s.read.parquet(scratch(q162CompactPat, dir))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("_metadata.file_path")).as("n_files"),
          sum($"event_id").as("id_checksum"))
    }),

    // Stream-stream LEFT OUTER interval join — the semantics q64's inner
    // join cannot express: a purchase with NO click inside its 1-hour
    // window must still emit (null-matched) once the watermark proves no
    // match can arrive. The null rows are produced by state EVICTION in
    // the trailing no-data batch (noDataBatches = true); the oracle
    // replays the eviction cutoff exactly — an unmatched purchase appears
    // iff p_ts + 1h < watermark, where the global watermark is the MIN of
    // the two sides' (filtered) max event times − 10 s, exactly Spark's
    // multi-watermark policy. Unmatched ids surface as −1 (nullable BIGINTs read back
    // as float in both engines' pandas paths; −1 keeps the column exact).
    "q163_stream_left_join" -> ((s, dir) => {
      import s.implicits._
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val src = StreamScaffold.stageTable(s, dir, "events")
      StreamScaffold.runStagedStream(s, "q163", dir, src, noDataBatches = true) { mk =>
        // each watermark observes ITS side's filtered rows (Catalyst pushes
        // a pre-watermark filter below the node anyway, so this explicit
        // order is also the honest one): the global watermark is
        // min(max click ts, max purchase ts) − 10 s — mirrored by the
        // oracle's least() cutoff
        val pur = mk().select($"event_id".as("p_id"), $"user_id".as("p_user"),
            expr("timestamp_micros(ts DIV 1000)").as("pts"))
          .where($"p_id" % 10 === 0) // sparse left side: most stay unmatched
          .withWatermark("pts", "10 seconds")
        val clk = mk().select($"event_id".as("c_id"), $"user_id".as("c_user"),
            $"event_type", expr("timestamp_micros(ts DIV 1000)").as("cts"))
          .where($"event_type" === "click")
          .withWatermark("cts", "10 seconds")
        pur.join(clk, expr(
            "p_user = c_user AND cts >= pts AND cts <= pts + interval 1 hour"),
            "left_outer")
          .select($"p_id", $"c_id")
      }.select($"p_id", coalesce($"c_id", lit(-1L)).as("c_id"))
        .orderBy($"p_id", $"c_id")
    }),

    // Snapshot-log time travel (the Delta/Iceberg commit mechanism over
    // plain parquet): three commits — purchase rows, click append, then a
    // value-filter OVERWRITE — and every version read back THROUGH its
    // pinned manifest. Reading v1/v2 correctly after v3's overwrite is the
    // point: files are immutable, manifests pin exact sets, the overwrite
    // deleted nothing. The oracle recomputes each version's integrity pair
    // from the declarative definition of its contents.
    "q164_time_travel" -> ((s, dir) => {
      import s.implicits._
      val base = scratch(q164TablePat, dir)
      val p = new org.apache.hadoop.fs.Path(base)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val ev = t(s, dir, "events").select($"event_id", $"user_id", $"event_type", $"value")
      SnapshotLog.commit(s, base, ev.where($"event_type" === "purchase"), overwrite = false)
      SnapshotLog.commit(s, base, ev.where($"event_type" === "click"), overwrite = false)
      SnapshotLog.commit(s, base, ev.where($"value" > 100.0), overwrite = true)
      (1 to 3).map { v =>
        SnapshotLog.readVersion(s, base, v)
          .agg(count(lit(1)).as("n_rows"), sum($"event_id").as("id_checksum"))
          .select(lit(v).as("version"), $"n_rows", $"id_checksum")
      }.reduce(_ unionAll _).orderBy($"version")
    }),

    // VACUUM / retention over the snapshot log: after an overwrite, the
    // files only v1/v2 reference are dead weight — vacuum deletes exactly
    // those and nothing the retained manifest lists. Output: live/vacuumed
    // counts (the oracle recomputes both from the manifests — parquet, so
    // read_parquet sees the same planning metadata) plus the integrity
    // pair of the still-readable latest version.
    "q165_vacuum" -> ((s, dir) => {
      import s.implicits._
      val base = scratch(q165TablePat, dir)
      val p = new org.apache.hadoop.fs.Path(base)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val ev = t(s, dir, "events").select($"event_id", $"event_type", $"value")
      SnapshotLog.commit(s, base, ev.where($"event_type" === "purchase"), overwrite = false)
      SnapshotLog.commit(s, base, ev.where($"event_type" === "click"), overwrite = false)
      SnapshotLog.commit(s, base, ev.where($"value" > 100.0), overwrite = true)
      val (live, vacuumed) = SnapshotLog.vacuum(s, base, retainVersions = 1)
      SnapshotLog.read(s, base)
        .agg(count(lit(1)).as("n_rows"), sum($"event_id").as("id_checksum"))
        .select(lit(live.toLong).as("n_live_files"), lit(vacuumed.toLong).as("n_vacuumed"),
          $"n_rows", $"id_checksum")
    }),

    // APPEND-mode streaming windowed aggregation — the semantics q49 had
    // to route through complete mode ("append would withhold windows until
    // a later watermark advance"): with the trailing no-data batch enabled
    // the watermark DOES advance after the data batch, and exactly the
    // FINALIZED windows (end ≤ max ts − 10 s) emit — open windows are
    // withheld. The oracle replays the same cutoff; a wrong finalization
    // boundary changes the row set, not just values.
    "q166_stream_append_windows" -> ((s, dir) => {
      import s.implicits._
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val src = StreamScaffold.stageTable(s, dir, "events")
      StreamScaffold.runStagedStream(s, "q166", dir, src, noDataBatches = true) { mk =>
        mk().select($"event_type", expr("timestamp_micros(ts DIV 1000)").as("ts"))
          .withWatermark("ts", "10 seconds")
          .groupBy(window($"ts", "1 hour"), $"event_type")
          .agg(count(lit(1)).as("n"))
          .select(unix_micros(col("window.start")).as("ws_us"), $"event_type", $"n")
      }.orderBy($"ws_us", $"event_type")
    }),

    // IVFPQ — the two quantizers composed exactly as faiss composes them:
    // the coarse (IVF) quantizer probes nprobe of nlist inverted lists to
    // produce candidates, and the product quantizer's ADC ranks ONLY those
    // candidates. All three legs (candidates, codes, LUT) persist, so the
    // oracle replays the candidate-restricted ADC ranking bit-for-bit.
    "q167_ivf_pq" -> ((s, dir) => {
      import s.implicits._
      // all three scratch legs (candidates, codes, LUT) are deterministic
      // functions of the embeddings table — staged write-once (also
      // pre-staged by the bench warmup), so the timed query measures the
      // candidate-restricted ADC ranking, not repeat index-build work
      stageQ167Legs(s, dir)
      Similarity.pqTopKWithin(s.read.parquet(scratch(q167CandPat, dir)),
          s.read.parquet(scratch(q167CodesPat, dir)),
          s.read.parquet(scratch(q167LutPat, dir)), k = 10)
        .orderBy($"query_id", $"rank")
    }),

    // NATIVE Catalyst aggregate (TypedImperativeAggregate): the KMV
    // distinct sketch as a registered SQL function — plain SQL callers
    // get the same auditable bounded-state sketch the DataFrame spelling
    // (q76) hand-builds; Spark's partial aggregation supplies the
    // map-side combine and the exchange carries ≤ k longs per group.
    // KmvNativeSpec pins bit-equality with Kmv.sketchState; the oracle is
    // the same bottom-k SQL replay as q76's.
    "q168_kmv_native" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events").createOrReplaceTempView("q168_events")
      s.sql("""SELECT event_type, kmv_sketch(CAST(user_id AS STRING), 64) AS sk
               FROM q168_events WHERE user_id IS NOT NULL GROUP BY event_type""")
        .select($"event_type", $"sk.n_kept".as("n_kept"), $"sk.kth_hash".as("kth_hash"))
        .withColumn("est_distinct", graft.sketch.Kmv.estimate($"n_kept", $"kth_hash", 64))
        .orderBy($"event_type")
    }),

    // Data-quality expectations (the DLT EXPECT / Delta CHECK pattern):
    // declarative predicates annotate rows with their violation list
    // map-side (NULL = violation, ternary CHECK semantics), split into
    // valid/quarantine, and the dashboard row set is one stack() unpivot
    // off a single aggregate pass. The 'known_type' rule deliberately
    // excludes 'signup' so the quarantine path is exercised on real rows.
    "q169_expectations" -> ((s, dir) => {
      import s.implicits._
      val rules = Seq(
        Expectations.Rule("value_non_negative", $"value" >= 0.0),
        Expectations.Rule("user_present", $"user_id".isNotNull),
        Expectations.Rule("known_type",
          $"event_type".isin("click", "view", "purchase")))
      Expectations.stats(
          t(s, dir, "events").select($"event_id", $"user_id", $"event_type", $"value"),
          rules)
        .orderBy($"metric")
    }),

    // Hive-style partitioned layout + PARTITION pruning — the third
    // pruning tier alongside file-level stats (q158) and row-group
    // PushedFilters: `partitionBy(event_type)` encodes the predicate
    // column into directories, and the filter eliminates whole partitions
    // at PLANNING time (PartitionFilters in the scan — audit-pinned), so
    // non-matching data costs zero I/O at any scale. Oracle replays from
    // the source table: a partition wrongly pruned loses rows.
    "q170_partitioned_scan" -> ((s, dir) => {
      import s.implicits._
      val p = stageQ170Part(s, dir)
      s.read.parquet(p).where($"event_type" === "purchase")
        .groupBy($"day")
        .agg(count(lit(1)).as("n"),
          sum(round($"value" * 1e6).cast("long")).as("value_micros"))
        .orderBy($"day")
    }),

    // Dynamic partition overwrite — INSERT OVERWRITE of ONLY the
    // partitions present in the incoming frame (partitionOverwriteMode =
    // dynamic): the 'purchase' partition is replaced by its value-filtered
    // rewrite while every other partition's files are untouched. The
    // oracle recomputes the per-type expectation from the source table;
    // a static-mode regression (whole-table truncate) would zero the
    // untouched partitions and break the hash. Idempotent by
    // construction, so re-runs against the staged table are safe.
    "q171_dynamic_overwrite" -> ((s, dir) => {
      import s.implicits._
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val p = scratch(q171PartPat, dir)
      val ev = t(s, dir, "events")
        .select($"event_id", $"user_id", $"value", $"event_type")
      Tables.stageOnce(s, p, Tables.sourceSig(s, dir, "events")) {
        ev.write.partitionBy("event_type").mode("overwrite").parquet(p)
      }
      val prev = s.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
      s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try {
        ev.where($"event_type" === "purchase" && $"value" > 50.0)
          .write.partitionBy("event_type").mode("overwrite").parquet(p)
      } finally s.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
      s.read.parquet(p).groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          sum(round($"value" * 1e6).cast("long")).as("value_micros"))
        .orderBy($"event_type")
    }),

    // DYNAMIC partition pruning — the pruning tier where the predicate is
    // unknowable at plan time: the dim side is itself a query (event
    // types whose mean value exceeds 50, in exact integer micro
    // arithmetic so both engines agree), so Catalyst injects a
    // DynamicPruningExpression subquery into the partitioned fact scan's
    // PartitionFilters and the run reads ONLY the partitions the filtered
    // dim actually contains, discovered from the reused broadcast. At
    // 100 TB this is the partition-pruning win q170 gets statically, kept
    // when the filter moves into a join (audit-pinned in PlanAuditSpec).
    "q215_dynamic_pruning" -> ((s, dir) => {
      import s.implicits._
      val p = stageQ170Part(s, dir)
      val dim = t(s, dir, "events").groupBy($"event_type")
        .agg(sum(round($"value" * 1e6).cast("long")).as("sv"),
          count(lit(1)).as("c"))
        .where(expr("sv DIV c > 50000000"))
        .select($"event_type")
      s.read.parquet(p).join(broadcast(dim), "event_type")
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          sum(round($"value" * 1e6).cast("long")).as("value_micros"))
        .orderBy($"event_type")
    }),

    // HIDDEN partitioning (Iceberg partition-transform semantics): the
    // table is partitioned by a DERIVED day(ts) the query author never
    // mentions — `Tables.timeRangeScan` owns the ts→day transform, so a
    // plain ts range prunes whole day directories at planning time
    // (PartitionFilters on day, audit-pinned) AND pushes the residual ts
    // range into row groups. The failure mode this guards against at
    // 100 TB: a time-range query that forgets the partition column and
    // reads all 3650 day directories for a one-week window.
    "q216_hidden_partitioning" -> ((s, dir) => {
      import s.implicits._
      val p = stageQ216Part(s, dir)
      val fromNs = 19727L * Tables.NanosPerDay  // 2024-01-05T00:00Z
      val untilNs = 19734L * Tables.NanosPerDay // 2024-01-12T00:00Z
      Tables.timeRangeScan(s, p, fromNs, untilNs)
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          sum(round($"value" * 1e6).cast("long")).as("value_micros"))
        .orderBy($"event_type")
    }),

    // Join-strategy surface: the same equi-join executed under all three
    // physical strategies (BROADCAST / MERGE / SHUFFLE_HASH hints) must
    // produce identical aggregates — the optimizer's strategy choice is
    // an execution detail, never a semantics change. The audit pins that
    // all three operators actually appear in the one union plan, so a
    // silently ignored hint fails the spec, not just the eye.
    "q172_join_hints" -> ((s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem").select($"l_orderkey", $"l_quantity")
      val o = t(s, dir, "orders").select($"o_orderkey", $"o_orderstatus")
      def leg(hint: String) =
        li.join(o.hint(hint), li("l_orderkey") === o("o_orderkey"))
          .agg(count(lit(1)).as("n"),
            sum($"l_quantity".cast("long")).as("qty_sum"))
          .select(lit(hint).as("strategy"), $"n", $"qty_sum")
      Seq("broadcast", "merge", "shuffle_hash").map(leg).reduce(_ unionAll _)
        .orderBy($"strategy")
    }),

    // XML source round-trip (Spark 4 built-in `xml` format — the q111 ORC
    // pattern for the remaining first-class file format): write a filtered
    // projection as XML rows, read it back through the XML parser, and
    // aggregate — the oracle recomputes from the source table, so any
    // value corrupted by the serialize→parse cycle breaks the hash.
    "q173_xml_roundtrip" -> ((s, dir) => {
      import s.implicits._
      val path = scratch(q173XmlPat, dir)
      Tables.fanOut(t(s, dir, "orders").where($"o_orderstatus" === "O"))
        .select($"o_orderkey", $"o_custkey", $"o_totalprice", $"o_orderpriority")
        .write.mode("overwrite").format("xml").option("rowTag", "order").save(path)
      s.read.format("xml").option("rowTag", "order").load(path)
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum($"o_totalprice".cast("decimal(18,2)")).cast("double").as("total"))
        .orderBy($"o_orderpriority")
    }),

    // Runtime metrics WITHOUT a second scan — `Dataset.observe`: the
    // aggregates ride along the main query's single pass (an accumulator
    // surface, the engine-native answer to "count the rows you filtered
    // while you filter them"). The observed map becomes the result frame,
    // so the oracle directly checks the accumulator math.
    "q174_observe" -> ((s, dir) => {
      import s.implicits._
      val obs = new org.apache.spark.sql.Observation()
      val filtered = t(s, dir, "events")
        .observe(obs, count(lit(1)).as("n_in"),
          sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("n_purchase"))
        .where($"event_type" =!= "signup")
      val nOut = filtered.count() // materializes the pass; obs.get blocks until then
      val m = obs.get
      Seq((m("n_in").asInstanceOf[Long], m("n_purchase").asInstanceOf[Long], nOut))
        .toDF("n_in", "n_purchase", "n_out")
    }),

    // Higher-order array functions (transform / filter / aggregate /
    // exists — the lambda surface, all codegen-free but vectorized):
    // per-doc token-length analytics without a single explode. DuckDB's
    // list lambdas mirror each step; empty-token docs pin the
    // fold-initial-value vs NULL-sum divergence (coalesce on the SQL
    // side, zero seed on the Spark side).
    "q175_hof_sweep" -> ((s, dir) => {
      import s.implicits._
      val tk = graft.text.TextFunctions.tokens(lower($"text"))
      t(s, dir, "documents")
        .select($"doc_id", tk.as("tk"))
        .withColumn("lens", transform($"tk", x => length(x).cast("long")))
        .select($"doc_id",
          size($"tk").cast("long").as("n_toks"),
          size(filter($"lens", l => l >= 5L)).cast("long").as("n_long"),
          aggregate($"lens", lit(0L), (acc, l) => acc + l).as("total_chars"),
          // sequence(1, 0) counts DOWN (the Dedup.shingles guard) — an
          // empty token list must short-circuit to the fold's zero
          when(size($"tk") === 0, 0L).otherwise(
            aggregate(zip_with($"lens",
                sequence(lit(1L), size($"tk").cast("long")), (l, i) => l * i),
              lit(0L), (acc, x) => acc + x)).as("weighted_key"),
          when(array_contains($"tk", "the"), 1L).otherwise(0L).as("has_the"))
        .orderBy($"doc_id")
    }),

    // Datetime arithmetic sweep (trunc / add_months / last_day /
    // weekday), all reduced to EPOCH-DAY INTEGER keys so no date/
    // timestamp rendering ever crosses the engine boundary: per-month
    // activity envelope over events.
    "q176_datetime_sweep" -> ((s, dir) => {
      import s.implicits._
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      // timestamp→date would cross the SESSION timezone (and pinning the
      // session conf here would leak UTC into every later query on the
      // shared bench session — the lazy frame executes after any restore
      // could run); build the UTC date with pure integer epoch-day math
      // instead, matching DuckDB's tz-naive CAST(ts AS DATE) with zero
      // session state touched. Calendar ops on DATE (trunc / add_months /
      // last_day / weekday) are tz-independent from there.
      val epoch = lit("1970-01-01")
      val d = expr("date_from_unix_date(CAST(ts DIV 1000 DIV 86400000000 AS INT))")
      t(s, dir, "events")
        .select(datediff(trunc(d, "MM"), epoch).cast("long").as("month_key"),
          datediff(d, epoch).cast("long").as("day_key"),
          datediff(last_day(d), epoch).cast("long").as("last_day_key"),
          datediff(add_months(trunc(d, "MM"), 1), epoch).cast("long").as("next_month_key"),
          weekday(d).cast("long").as("wd")) // Monday = 0
        .groupBy($"month_key", $"last_day_key", $"next_month_key")
        .agg(count(lit(1)).as("n"),
          min($"day_key").as("first_day"), max($"day_key").as("last_seen"),
          countDistinct($"day_key").as("n_days"),
          sum(when($"wd" === 0L, 1L).otherwise(0L)).as("n_monday_events"))
        .orderBy($"month_key")
    }),

    // MapType surface — the one column family the engine hadn't exercised:
    // per-type daily counts built INTO a map (map_from_entries over a
    // sorted entry list), thinned with a map_filter lambda, sized via
    // map_keys, and exploded back to rows. The map is the intermediate;
    // the oracle checks the end-to-end relational semantics, so a wrong
    // entry, lost key, or bad filter shows up as a row diff.
    "q177_map_type" -> ((s, dir) => {
      import s.implicits._
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val daily = t(s, dir, "events")
        .groupBy($"event_type", expr("ts DIV 1000 DIV 86400000000").as("day"))
        .agg(count(lit(1)).as("cnt"))
      daily.groupBy($"event_type")
        .agg(map_from_entries(sort_array(collect_list(struct($"day", $"cnt")))).as("m"))
        .select($"event_type",
          size(map_keys($"m")).cast("long").as("n_days_total"),
          explode(map_filter($"m", (_, v) => v >= 2L)).as(Seq("day", "cnt")))
        .select($"event_type", $"day", $"cnt", $"n_days_total")
        .orderBy($"event_type", $"day")
    }),

    // ANALYZE TABLE + catalog statistics — the CBO's input surface: save a
    // managed table (q26's leftover-location hygiene), compute table and
    // column statistics, and read row count and NDV back from the CATALOG
    // (not the data). The oracle recomputes both relationally; Spark's
    // NDV estimator is HLL++-based but exact at this cardinality (3
    // statuses), so the catalog must agree with the exact count.
    "q178_analyze_stats" -> ((s, dir) => {
      import s.implicits._
      val tbl = s"t_orders_stats_${Tables.sfTag(dir)}"
      s.sql("CREATE DATABASE IF NOT EXISTS graft_bench")
      s.sql(s"DROP TABLE IF EXISTS graft_bench.$tbl")
      val loc = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir") + s"/graft_bench.db/$tbl")
      loc.getFileSystem(s.sparkContext.hadoopConfiguration).delete(loc, true)
      t(s, dir, "orders").select($"o_orderkey", $"o_orderstatus")
        .write.mode("overwrite").format("parquet")
        .saveAsTable(s"graft_bench.$tbl")
      s.sql(s"ANALYZE TABLE graft_bench.$tbl COMPUTE STATISTICS FOR COLUMNS o_orderstatus")
      val meta = s.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(tbl, Some("graft_bench")))
      val st = meta.stats.getOrElse(sys.error("ANALYZE left no catalog stats"))
      val rowCount = st.rowCount.map(_.toLong).getOrElse(-1L)
      val ndv = st.colStats.get("o_orderstatus")
        .flatMap(_.distinctCount).map(_.toLong).getOrElse(-1L)
      Seq((rowCount, ndv)).toDF("row_count", "status_ndv")
    }),

    // NATIVE Catalyst aggregate #2 (TypedImperativeAggregate): the
    // HyperLogLog distinct sketch as a registered SQL function — the
    // deterministic, oracle-replayable alternative to
    // approx_count_distinct (whose xxHash64/HLL++ internals no external
    // engine can re-derive). p=6 → a fixed 64-int register array per
    // group: partial aggregation folds rows map-side and the exchange
    // carries 64 ints per group no matter how many rows fed it. The
    // estimate rides as integer micro-units; registers are the full
    // sketch state, so the oracle replays BOTH from raw rows.
    "q179_hll_native" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events").createOrReplaceTempView("q179_events")
      s.sql("""SELECT event_type, hll_sketch(CAST(user_id AS STRING), 6) AS sk
               FROM q179_events WHERE user_id IS NOT NULL GROUP BY event_type""")
        .select($"event_type", $"sk.registers".as("registers"),
          round($"sk.estimate" * lit(1e6)).cast("long").as("est_micros"))
        .orderBy($"event_type")
    }),

    // File-level Bloom-filter index — the membership pruning tier beside
    // min/max skipping (q158) and partition elimination (q170): point
    // lookups on a high-cardinality column consult per-file Blooms at
    // planning time, reading only the files that might contain the keys.
    // Correctness gate: the oracle runs the same IN filter over the FULL
    // source table — a false drop (the one failure a Bloom cannot have)
    // loses rows and breaks the hash. BloomFileIndexSpec pins that files
    // ARE pruned; here only soundness is on trial.
    "q180_bloom_file_index" -> ((s, dir) => {
      import s.implicits._
      val staged = stageQ180Events(s, dir)
      val man = BloomFileIndex.manifest(s, staged, "event_id",
        expectedPerFile = 16384L, fpp = 0.01)
      val files = BloomFileIndex.prune(man, Q180Ids.map(_.toString))
      DataSkipping.readFiles(s, staged, files)
        .where($"event_id".isin(Q180Ids: _*))
        .select($"event_id", $"user_id", $"event_type",
          round($"value" * lit(1e6)).cast("long").as("value_micros"))
        .orderBy($"event_id")
    }),

    // BM25 ranked retrieval over the corpus — the scoring complement of
    // the inverted index (q77): Okapi BM25 (k1=1.2, b=0.75, Lucene
    // always-positive idf) for a fixed term set, top-15. Per-term scores
    // round to integer micro-units and the per-doc total is an INTEGER
    // sum, so aggregation order cannot diverge between engines; top-k
    // plans as TakeOrderedAndProject (per-partition heaps, no global
    // sort) before the bounded rank window.
    "q181_bm25" -> ((s, dir) =>
      Bm25.topK(t(s, dir, "documents"), Q181Terms, k = 15)),

    // Token-entropy quality signal (the Gopher/C4 repetition class):
    // Shannon entropy of each doc's token distribution from one
    // (doc, token) count aggregate — H = ln(n) − (Σ c·ln c)/n. The
    // Σ c·ln c sum rides as per-token integer micro-units (order-
    // independent), so the only cross-engine doubles are ln calls on
    // identical integers with pinned op order. Low entropy = repetitive
    // boilerplate; the signal feeds the quality-filter family (q31/q159).
    "q182_token_entropy" -> ((s, dir) => {
      import s.implicits._
      val counts = t(s, dir, "documents")
        .select($"doc_id", explode(TextFunctions.tokens(lower($"text"))).as("tok"))
        .groupBy($"doc_id", $"tok").agg(count(lit(1)).as("c"))
      counts.groupBy($"doc_id")
        .agg(sum($"c").as("n_tokens"),
          count(lit(1)).as("n_unique"),
          sum(round($"c".cast("double") * log($"c".cast("double")) * lit(1e6))
            .cast("long")).as("clnc_key"))
        .withColumn("entropy_micros",
          round((log($"n_tokens".cast("double"))
            - ($"clnc_key".cast("double") / lit(1e6)) / $"n_tokens".cast("double"))
            * lit(1e6)).cast("long"))
        .select($"doc_id", $"n_tokens", $"n_unique", $"clnc_key", $"entropy_micros")
        .orderBy($"doc_id")
    }),

    // Stream-stream FULL OUTER interval join — the last outer variant
    // beside q163's left outer: matched pairs emit as inner results;
    // each side's never-matched rows emit null-extended when the global
    // watermark passes their side's state bound (left: pts + 1h < wm —
    // the join window has closed; right: cts < wm — no future left can
    // reach back). The oracle replays both eviction cutoffs from the
    // batch data; unmatched ids surface as −1 (q163's convention).
    "q183_stream_full_outer" -> ((s, dir) => {
      import s.implicits._
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val src = StreamScaffold.stageTable(s, dir, "events")
      StreamScaffold.runStagedStream(s, "q183", dir, src, noDataBatches = true) { mk =>
        val pur = mk().select($"event_id".as("p_id"), $"user_id".as("p_user"),
            expr("timestamp_micros(ts DIV 1000)").as("pts"))
          .where($"p_id" % 10 === 0) // sparse left side: most stay unmatched
          .withWatermark("pts", "10 seconds")
        val clk = mk().select($"event_id".as("c_id"), $"user_id".as("c_user"),
            $"event_type", expr("timestamp_micros(ts DIV 1000)").as("cts"))
          .where($"event_type" === "click")
          .withWatermark("cts", "10 seconds")
        pur.join(clk, expr(
            "p_user = c_user AND cts >= pts AND cts <= pts + interval 1 hour"),
            "full_outer")
          .select($"p_id", $"c_id")
      }.select(coalesce($"p_id", lit(-1L)).as("p_id"),
          coalesce($"c_id", lit(-1L)).as("c_id"))
        .orderBy($"p_id", $"c_id")
    }),

    // Persisted-IVF index lifecycle (faiss write_index/read_index): the
    // index directory — centroids, assignments, params sidecar — is built
    // and SAVED once, and the search path probes the LOADED index (no
    // refit). Candidates persist so the oracle replays the exact-cosine
    // ranking over them; AnnIndexStoreSpec pins save→load→search equals
    // the fresh-fit search.
    "q184_ann_index_persist" -> ((s, dir) => {
      import s.implicits._
      stageQ184Legs(s, dir)
      Similarity.rankCandidates(s.read.parquet(scratch(q184CandPat, dir)),
          t(s, dir, "embeddings").filter($"vec_id" < 5),
          t(s, dir, "embeddings"), k = 5)
        .withColumn("rank", $"rank".cast("long"))
        .orderBy($"query_id", $"rank")
    }),

    // Model-REGISTRY serving (closes the M5 pyfunc gap): two immutable
    // versions of a linear quality model are REGISTERED under one name —
    // v1 fit on the full corpus' weak labels, v2 REFIT on the long-doc
    // slice — and the serving path loads the LATEST by name and applies
    // it as a function (kind-dispatched broadcast multiply-add). The
    // oracle replays the scoring bit-exactly from the v2 weights parquet
    // the registry published, so a wrong version resolution, a corrupted
    // sidecar featmap, or a drifted weight row all break the hash.
    "q185_model_registry" -> ((s, dir) => {
      import s.implicits._
      stageQ185Registry(s, dir)
      val fcols = QualityClassifier.features($"text", $"n_chars")
      val feats = t(s, dir, "documents")
        .select($"doc_id" +: fcols.map { case (n, c) => c.as(n) }: _*)
      graft.tracking.ModelRegistry.applyModel(s, scratch(q185RegPat, dir),
          "quality", feats, idCol = "doc_id")
        .orderBy($"doc_id")
    }),

    // HYBRID retrieval with reciprocal-rank fusion — the standard
    // two-tower serving pattern of a RAG/training-data search stack: the
    // lexical leg (BM25 over the query terms) and the semantic leg (exact
    // cosine kNN of the query embedding) rank independently, and RRF
    // fuses by rank alone: score = Σ round(1e6 / (60 + rank)) in integer
    // micro-units (rank-only fusion needs no cross-leg score calibration
    // — the classic TREC result). Scale shape: each leg top-k's BEFORE
    // fusion (TakeOrderedAndProject / windowed top-k), so the full-outer
    // fusion join merges two ≤k-row frames regardless of corpus size.
    "q186_hybrid_rrf" -> ((s, dir) => {
      import s.implicits._
      val lex = Bm25.topK(t(s, dir, "documents"), Q181Terms, k = 20)
        .select($"doc_id", $"rank".as("lex_rank"))
      val e = t(s, dir, "embeddings")
      val sem = Similarity.bruteForceTopK(e.where($"vec_id" === 0L), e, k = 20)
        .select($"corpus_id".as("doc_id"), $"rank".cast("long").as("sem_rank"))
      def leg(rank: org.apache.spark.sql.Column) = coalesce(
        round(lit(1e6) / (lit(60.0) + rank.cast("double"))).cast("long"), lit(0L))
      lex.join(sem, Seq("doc_id"), "full_outer")
        .withColumn("rrf_micros", leg($"lex_rank") + leg($"sem_rank"))
        .select($"doc_id", coalesce($"lex_rank", lit(-1L)).as("lex_rank"),
          coalesce($"sem_rank", lit(-1L)).as("sem_rank"), $"rrf_micros")
        .orderBy($"rrf_micros".desc, $"doc_id").limit(10)
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy($"rrf_micros".desc, $"doc_id")).cast("long"))
        .orderBy($"rank")
    }),

    // EXPIRE history (Iceberg expire_snapshots; completes the storage-tier
    // lifecycle after q164 time travel + q165 VACUUM): four single-file
    // commits, then expire to the last two — the expired manifests are
    // DELETED (not just their data vacuumed), so the log listing itself
    // stays bounded. Every count is pinned: coalesce(1) makes each commit
    // exactly one data file, so live/deleted/expired are closed-form, and
    // the surviving v4 read must equal overwrite(value>100) ⊎ append(view)
    // recomputed from the source table. The oracle ALSO checks the
    // on-disk aftermath — v4's manifest lists exactly 2 files.
    "q187_expire_history" -> ((s, dir) => {
      import s.implicits._
      val base = scratch(q187TablePat, dir)
      val p = new org.apache.hadoop.fs.Path(base)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val ev = t(s, dir, "events").select($"event_id", $"event_type", $"value")
      SnapshotLog.commit(s, base, ev.where($"event_type" === "purchase").coalesce(1), overwrite = false)
      SnapshotLog.commit(s, base, ev.where($"event_type" === "click").coalesce(1), overwrite = false)
      SnapshotLog.commit(s, base, ev.where($"value" > 100.0).coalesce(1), overwrite = true)
      SnapshotLog.commit(s, base, ev.where($"event_type" === "view").coalesce(1), overwrite = false)
      val (expired, deleted) = SnapshotLog.expireSnapshots(s, base, retainVersions = 2)
      val vs = SnapshotLog.versions(s, base)
      val nLive = s.read.parquet(s"$base/_log/v${vs.last}").count()
      SnapshotLog.read(s, base)
        .agg(count(lit(1)).as("n_rows"), sum($"event_id").as("id_checksum"))
        .select(lit(vs.length.toLong).as("n_versions"),
          lit(vs.head.toLong).as("oldest_version"),
          lit(expired.toLong).as("n_expired"), lit(deleted.toLong).as("n_deleted"),
          $"n_rows", $"id_checksum", lit(nLive).as("n_live_files"))
    }),

    // Intra-document REPETITION quality signal (the Gopher repetition
    // rules: fraction of a doc's n-grams that are repeats of an earlier
    // occurrence — the filter that catches boilerplate-padded and
    // looping-generation text). Scale shape: pure map-side — the trigram
    // list, its distinct count and the µ-scaled fraction are all
    // higher-order array ops WITHIN the row, no explode, no shuffle; the
    // only exchange is the final order for the gate.
    //
    // Expression-evaluation discipline (measured, sf0.1): the naive
    // `transform(sequence(...), i -> concat(tk[i], ...))` spelling cost
    // 5.3 s — a lambda body's reference to an OUTER column re-evaluates
    // that column's whole (collapse-inlined) expression tree per ELEMENT,
    // so the regex tokenization ran ~3× per trigram. Two fixes compound
    // here: trigrams come from zip_with over three shifted slices
    // (zip_with lambdas touch only their own arguments), and each
    // intermediate (token list, trigram list) is BOUND ONCE as a
    // single-element `transform(array(e), x -> ...)` lambda variable —
    // variable lookups are free, so tokenize and trigram-build run once
    // per row no matter how many times the body references them.
    "q188_repetition" -> ((s, dir) => {
      import s.implicits._
      val tk = TextFunctions.tokens(lower($"text"))
      t(s, dir, "documents")
        .select($"doc_id", tk.as("tk"))
        .select($"doc_id", expr(
          """element_at(transform(array(tk), t ->
            |  element_at(transform(array(CASE WHEN size(t) >= 3
            |      THEN zip_with(slice(t, 1, size(t) - 2),
            |                    zip_with(slice(t, 2, size(t) - 2), slice(t, 3, size(t) - 2),
            |                             (y, z) -> concat(y, ' ', z)),
            |                    (x, yz) -> concat(x, ' ', yz))
            |      ELSE CAST(array() AS ARRAY<STRING>) END), a ->
            |    named_struct('n', CAST(size(a) AS BIGINT),
            |                 'd', CAST(size(array_distinct(a)) AS BIGINT))), 1)), 1)""".stripMargin)
          .as("st"))
        .where($"st.n" > 0)
        .select($"doc_id", $"st.n".as("n_trigrams"),
          ($"st.n" - $"st.d").as("n_repeats"))
        .withColumn("rep_micros",
          round(lit(1e6) * $"n_repeats".cast("double") / $"n_trigrams".cast("double")).cast("long"))
        .orderBy($"doc_id")
    }),

    // INCREMENTAL ingestion with checkpoint resume — the exactly-once
    // contract that makes Structured Streaming the 100 TB ingest layer:
    // the source receives two file deliveries drained by two SEPARATE
    // AvailableNow runs over the SAME checkpoint. The second run must
    // process ONLY the new file (the checkpoint's file log already holds
    // the first), and the accumulated sink must equal the one-shot batch
    // aggregate: a reprocessed file doubles the checksums, a missed file
    // halves them — either breaks the hash. Fresh checkpoint per
    // invocation; the reuse under test is BETWEEN the two increments.
    // STREAMING reads FROM the transactional log — the streaming-source
    // leg that completes the snapshot-log story (batch read + time travel
    // q164, OPTIMIZE q196, DML q201–q203, streaming-IN q204, CDF q205,
    // RESTORE q206): SnapshotLog.streamVersions delivers each committed
    // version's INSERT delta as one micro-batch on version offsets with a
    // checkpointed committed offset. The table is REBUILT each run
    // (upfront delete — the q189 idempotence pattern): drain 1 processes
    // v1 (purchases) + v2 (append clicks) + v3 (overwrite to views; the
    // delta is the net-new rows, not the whole table), then v4 (signups)
    // commits and drain 2 must deliver ONLY v4 through the SAME
    // checkpoint. Slices are declarative event_type cuts, so the oracle
    // recomputes every batch exactly.
    "q217_stream_log_source" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.SnapshotLog
      val tag = Tables.sfTag(dir)
      val tmp = System.getProperty("java.io.tmpdir")
      def p(n: String) = new java.io.File(tmp, s"graft_q217_${n}_$tag").toString
      val (tbl, chk) = (p("table"), p("chk"))
      val hconf = s.sparkContext.hadoopConfiguration
      val fs = new org.apache.hadoop.fs.Path(tmp).getFileSystem(hconf)
      Seq(tbl, chk).foreach(x => fs.delete(new org.apache.hadoop.fs.Path(x), true))
      val ev = t(s, dir, "events").select($"event_id", $"event_type",
        round($"value" * 1e6).cast("long").as("value_micros"))
      // one file per commit: a 20k-row slice across 32 shuffle partitions
      // would publish 32 near-empty files per version (the small-file
      // problem OPTIMIZE exists to undo) and widen the manifest-diff and
      // read planning each drain pays
      def slice(et: String) =
        ev.where($"event_type" === et).drop("event_type").coalesce(1)
      SnapshotLog.commit(s, tbl, slice("purchase"), overwrite = false) // v1
      SnapshotLog.commit(s, tbl, slice("click"), overwrite = false)    // v2
      SnapshotLog.commit(s, tbl, slice("view"), overwrite = true)      // v3
      val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Long)]
      def drain(run: Long): Unit =
        SnapshotLog.streamVersions(s, tbl, chk) { (delta, v) =>
          val r = delta.agg(count(lit(1)), sum($"event_id"), sum($"value_micros")).head
          got += ((v.toLong, run, r.getLong(0),
            if (r.isNullAt(1)) 0L else r.getLong(1),
            if (r.isNullAt(2)) 0L else r.getLong(2)))
        }
      drain(1L)
      SnapshotLog.commit(s, tbl, slice("signup"), overwrite = false)   // v4
      drain(2L)
      got.toSeq.toDF("version", "run", "n", "id_checksum", "value_checksum")
        .orderBy($"version")
    }),

    "q189_stream_incremental" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.streaming.Trigger
      val tag = Tables.sfTag(dir)
      val tmp = System.getProperty("java.io.tmpdir")
      def p(n: String) = new java.io.File(tmp, s"graft_q189_${n}_$tag").toString
      val (srcDir, out, chk, half1, half2) = (p("src"), p("out"), p("chk"), p("h1"), p("h2"))
      val hconf = s.sparkContext.hadoopConfiguration
      val fs = new org.apache.hadoop.fs.Path(tmp).getFileSystem(hconf)
      // half1/half2 in the delete list too: mode("overwrite") keeps them
      // correct across invocations but never reclaims them — they'd
      // accumulate one orphan pair per sf tag in java.io.tmpdir
      Seq(srcDir, out, chk, half1, half2)
        .foreach(x => fs.delete(new org.apache.hadoop.fs.Path(x), true))
      val ev = t(s, dir, "events").select($"event_id", $"user_id", $"event_type",
        round($"value" * 1e6).cast("long").as("value_micros"))
      ev.where($"event_id" % 2 === 0).coalesce(1).write.mode("overwrite").parquet(half1)
      ev.where($"event_id" % 2 =!= 0).coalesce(1).write.mode("overwrite").parquet(half2)
      val schema = s.read.parquet(half1).schema
      fs.mkdirs(new org.apache.hadoop.fs.Path(srcDir))
      def deliver(from: String, prefix: String): Unit = {
        val src = new org.apache.hadoop.fs.Path(from)
        val f = src.getFileSystem(hconf)
        f.listStatus(src).filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
          .zipWithIndex.foreach { case (st, i) =>
            org.apache.hadoop.fs.FileUtil.copy(f, st.getPath, fs,
              new org.apache.hadoop.fs.Path(srcDir, s"$prefix$i.parquet"), false, hconf)
          }
      }
      def drain(): Unit = {
        val q = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", Int.MaxValue.toString).parquet(srcDir)
          .where($"event_type" === "purchase")
          .writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", chk)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        if (!q.awaitTermination(StreamScaffold.AwaitTimeoutMs))
          { q.stop(); sys.error("q189 increment did not terminate in time") }
      }
      deliver(half1, "a"); drain()
      deliver(half2, "b"); drain() // same checkpoint: only the new file
      s.read.parquet(out)
        .agg(count(lit(1)).as("n"), sum($"event_id").as("id_checksum"),
          sum($"value_micros").as("value_checksum"))
    }),

    // SCHEMA EVOLUTION across a table's file generations: an old file
    // generation lacks a column a later generation added; a mergeSchema
    // read unions by name (old rows surface NULL for the new column) —
    // the capability every long-lived 100 TB table needs, since columns
    // arrive without rewriting history. The oracle recomputes from the
    // source table with the generation rule inlined, so a dropped
    // generation, a misaligned union, or default-filled (non-NULL)
    // old rows all break the hash.
    "q190_schema_evolution" -> ((s, dir) => {
      import s.implicits._
      val base = scratch(q190EvoPat, dir)
      Tables.stageOnce(s, base, Tables.sourceSig(s, dir, "events")) {
        val ev = t(s, dir, "events")
          .select($"event_id", $"event_type", round($"value" * 1e6).cast("long").as("value_micros"))
        // generation 1: written BEFORE event_type existed
        ev.where($"event_id" % 2 === 0).select($"event_id", $"value_micros")
          .write.mode("overwrite").parquet(s"$base/gen1")
        ev.where($"event_id" % 2 =!= 0)
          .write.mode("overwrite").parquet(s"$base/gen2")
      }
      s.read.option("mergeSchema", "true")
        .parquet(s"$base/gen1", s"$base/gen2")
        .groupBy(coalesce($"event_type", lit("pre_schema")).as("event_type"))
        .agg(count(lit(1)).as("n"), sum($"value_micros").as("value_checksum"))
        .orderBy($"event_type")
    }),

    // NESTED column pruning: payload packed as a struct (the shape every
    // log/telemetry table ships), query touches ONE leaf — the scan must
    // read only `payload.user_id`, not the sibling leaves
    // (spark.sql.optimizer.nestedSchemaPruning, on by default; the
    // PlanAuditSpec pin reads the scan's ReadSchema). At 100 TB the
    // difference is reading one narrow column chunk vs decoding the whole
    // struct per row.
    "q191_nested_pruning" -> ((s, dir) => {
      import s.implicits._
      val base = scratch(q191NestPat, dir)
      Tables.stageOnce(s, base, Tables.sourceSig(s, dir, "events")) {
        t(s, dir, "events")
          .select($"event_id", struct($"user_id", $"event_type",
            round($"value" * 1e6).cast("long").as("value_micros")).as("payload"))
          .write.mode("overwrite").parquet(base)
      }
      s.read.parquet(base)
        .groupBy($"payload.user_id".as("user_id"))
        .agg(count(lit(1)).as("n"))
        .where($"n" >= 2)
        .orderBy($"user_id")
    }),

    // OPTIMIZE on the snapshot log — the table-format compaction
    // semantics (vs q162's directory-level Compaction): two fragmented
    // appends (6 files each), then optimize rewrites the 12-file active
    // set into one ~target-sized file and publishes it as a NEW overwrite
    // version with IDENTICAL rows — and the pre-optimize version stays
    // readable (checked in the same output row: pre_rows/pre_checksum
    // must equal the post-optimize pair). The oracle recomputes the rows
    // declaratively and reads both versions' manifests for the file
    // counts — a compaction that dropped or duplicated a row, or broke
    // history, breaks the hash.
    "q196_snapshot_optimize" -> ((s, dir) => {
      import s.implicits._
      val base = scratch(q196TablePat, dir)
      val p = new org.apache.hadoop.fs.Path(base)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val ev = t(s, dir, "events").select($"event_id", $"event_type")
      SnapshotLog.commit(s, base,
        ev.where($"event_type" === "purchase").repartition(6), overwrite = false)
      SnapshotLog.commit(s, base,
        ev.where($"event_type" === "click").repartition(6), overwrite = false)
      val (nv, before, after) = SnapshotLog.optimize(s, base)
      val pre = SnapshotLog.readVersion(s, base, nv - 1)
        .agg(count(lit(1)).as("pre_rows"), sum($"event_id").as("pre_checksum"))
      SnapshotLog.read(s, base)
        .agg(count(lit(1)).as("n_rows"), sum($"event_id").as("id_checksum"))
        .crossJoin(pre)
        .select(lit(before.toLong).as("files_before"),
          lit(after.toLong).as("files_after"),
          $"n_rows", $"id_checksum", $"pre_rows", $"pre_checksum")
    }),

    // STORAGE-FORMAT INTEROP: read a table someone else wrote with real
    // Delta Lake — the hand-assembled fixture follows the public
    // `_delta_log` protocol verbatim (add/remove JSON commits, a
    // single-part checkpoint, `_last_checkpoint`), and the read must
    // resolve adds minus removes across the checkpoint boundary. Every
    // slice is declarative over `events`, so the oracle recomputes the
    // exact active rows with no scratch reads: a missed remove (f1
    // leaking) doubles even-purchase checksums; a dropped post-checkpoint
    // commit (f4) loses the view rows — either breaks the hash.
    "q193_delta_log_read" -> ((s, dir) => {
      import s.implicits._
      stageQ193DeltaTable(s, dir)
      Tables.deltaTable(s, scratch(q193TablePat, dir))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), sum($"event_id").as("id_checksum"),
          sum($"value_micros").as("value_checksum"))
        .orderBy($"event_type")
    }),

    // Delta TIME TRAVEL through the same log: pin each commit version and
    // prove the reader reconstructs every historical active set — v0 is
    // BEFORE the checkpoint (replayed from JSON alone, the checkpoint must
    // NOT apply to an older pin), v1 exercises remove-resolution at the
    // checkpoint boundary, v2 is latest. A reader that always trusts
    // _last_checkpoint regardless of the pinned version breaks v0's row
    // set (f1's removed rows would be missing); one that drops the
    // post-checkpoint commit breaks v2.
    "q194_delta_time_travel" -> ((s, dir) => {
      import s.implicits._
      stageQ193DeltaTable(s, dir)
      val base = scratch(q193TablePat, dir)
      (0L to 2L).map { v =>
        Tables.deltaTable(s, base, asOf = Some(v))
          .agg(count(lit(1)).as("n_rows"), sum($"event_id").as("id_checksum"))
          .select(lit(v).as("version"), $"n_rows", $"id_checksum")
      }.reduce(_ unionAll _).orderBy($"version")
    }),

    // REAL H3 ids (graft.geo.H3 — the published aperture-7 icosahedral
    // algorithm; the reference's only h3 call is geo_to_h3,
    // utils/spark_utils.py:6-9). DuckDB has no H3, so the oracle is the
    // only one H3 itself has: the PUBLISHED documentation vectors,
    // exact — plus two global structural laws with data-independent
    // constants (842 res-1 cells = 110*7 + 12*6; 12 pentagons), swept
    // over a deterministic Fibonacci lattice built from spark.range.
    "q282_h3_vectors" -> ((s, dir) => {
      import s.implicits._
      val vectors = Seq(
        ("a_bay_r5", 37.3615593, -122.0553238, 5),
        ("b_bay_r7", 37.3615593, -122.0553238, 7),
        ("c_sf_r9", 37.7752702151959257, -122.418307270836230, 9),
        ("d_liberty_r10", 40.689167, -74.044444, 10))
        .toDF("leg", "lat", "lng", "res")
        .select($"leg", expr("geo_to_h3(lat, lng, res)").as("value"))
      val n = 150000
      val ga = math.Pi * (3.0 - math.sqrt(5.0))
      // distinct res-1 cells over the lattice, with the 60-bit id parsed
      // back to its numeric fields IN SQL (base cell = bits 45..51,
      // res-1 digit = bits 42..44) so the pentagon law leg is pure SQL
      // over the expression's output, not a Scala-side recount
      val sweep = s.range(n).select(
        degrees(asin(lit(1.0) - (lit(2.0) * $"id" + 1.0) / lit(n.toDouble))).as("lat"),
        degrees(pmod($"id" * lit(ga), lit(2 * math.Pi)) - lit(math.Pi)).as("lng"))
        .select(expr("geo_to_h3(lat, lng, 1)").as("h3")).distinct()
        .select(expr("CAST(conv(h3, 16, 10) AS BIGINT)").as("v"))
      val pentSet = graft.geo.H3.Pentagons.toSeq.sorted.mkString("(", ", ", ")")
      val lawLegs = sweep.agg(
        count(lit(1)).as("n_cells"),
        sum(when(expr(s"(v DIV 35184372088832) % 128 IN $pentSet" +
          " AND (v DIV 4398046511104) % 8 = 0"), 1L).otherwise(0L)).as("n_pent"))
        .select(explode(array(
          struct(lit("e_res1_cells").as("leg"), $"n_cells".cast("string").as("value")),
          struct(lit("f_pentagons_r1").as("leg"), $"n_pent".cast("string").as("value")))))
        .select($"col.leg", $"col.value")
      vectors.unionAll(lawLegs).orderBy($"leg")
    }),

    // the q22 TILING JOIN replayed over REAL H3 ids: per-user tile sets
    // from geo_to_h3 at the reference's res 9, probed by the same
    // points — every leg is a LAW with a data-independent constant
    // (self-membership holds exactly, every user keeps tiles, every id
    // is a 15-hex-char mode-1 cell), so the oracle is exact without a
    // DuckDB H3.
    "q283_h3_tiling_join" -> ((s, dir) => {
      import s.implicits._
      // one H3-assignment pass, shared by all three legs (the per-row
      // trig would otherwise re-run once per leg aggregate); EAGER
      // checkpoint per the round-16 lazy-mark deadlock rule
      val pts = Tables.points(s, dir).withColumnRenamed("user_id", "user")
        .select($"user", graft.functions.GeoFunctions
          .geoToH3($"latitude", $"longitude", 9).as("h3"))
        .localCheckpoint(true)
      val tiles = pts.distinct()
      val selfMiss = pts.join(tiles, Seq("user", "h3"), "left_anti")
        .agg(count(lit(1)).as("n"))
        .select(lit("a_self_miss").as("leg"), $"n".cast("string").as("value"))
      val userDiff = pts.agg((countDistinct($"user") -
          lit(0L)).as("pu")).crossJoin(
          tiles.agg(countDistinct($"user").as("tu")))
        .select(lit("b_user_diff").as("leg"),
          ($"pu" - $"tu").cast("string").as("value"))
      val badIds = pts.where(length($"h3") =!= 15 ||
          !$"h3".rlike("^[0-9A-F]{15}$"))
        .agg(count(lit(1)).as("n"))
        .select(lit("c_bad_ids").as("leg"), $"n".cast("string").as("value"))
      selfMiss.unionAll(userDiff).unionAll(badIds).orderBy($"leg")
    }),

    // H3 GRID TRAVERSAL laws as driver constants: ring sizes follow
    // 1 + 3k(k+1) around the published SF vector cell, a pentagon's
    // ring-1 is 6 (5 neighbors + itself), and neighbor symmetry holds
    // over a deterministic off-seam sample — every leg a constant, so
    // the oracle is exact without an external H3.
    "q284_h3_kring" -> ((s, dir) => {
      import s.implicits._
      import graft.geo.H3
      val sf = H3.geoToH3(37.7752702151959257, -122.418307270836230, 9)
      val pent = H3.geoToH3(H3.h3ToGeo(
        (1L << 59) | (4L << 45) | ((1L << 45) - 1))._1,
        H3.h3ToGeo((1L << 59) | (4L << 45) | ((1L << 45) - 1))._2, 0)
      val seam: Set[Int] = H3.Pentagons.flatMap { p =>
        val p0 = (1L << 59) | (p.toLong << 45) | ((1L << 45) - 1)
        H3.neighbors(p0).map(H3.baseCell) + p
      }
      val ga = math.Pi * (3.0 - math.sqrt(5.0))
      val asym = (0 until 500).map { i =>
        val z = 1.0 - (2.0 * i + 1.0) / 500
        val la = math.toDegrees(math.asin(z))
        val lo = math.toDegrees(((i * ga) % (2 * math.Pi)) - math.Pi)
        H3.geoToH3(la, lo, 3)
      }.filter(h => !seam.contains(H3.baseCell(h)))
        .filter(h => H3.neighbors(h).forall(n => !seam.contains(H3.baseCell(n))))
        .count(h => H3.neighbors(h).exists(n => !H3.neighbors(n).contains(h)))
      Seq(
        ("a_ring1", H3.kRing(sf, 1).size.toLong),
        ("b_ring2", H3.kRing(sf, 2).size.toLong),
        ("c_ring3", H3.kRing(sf, 3).size.toLong),
        ("d_pentagon_ring1", H3.kRing(pent, 1).size.toLong),
        ("e_asym_offseam", asym.toLong))
        .toDF("leg", "value").orderBy($"leg")
    }),

    // PUBLISHED H3 traversal/fill vectors as driver constants (the q282
    // pattern, extended to the r17 polyfill/boundary machinery): the
    // upstream h3 test suite's SF polygon polyfills to EXACTLY 1253
    // res-9 cells under v3 center containment, and the h3-py docs pin
    // the 1-ring around 8928308280fffff — both reproduced here, so the
    // whole geometry stack (projection, boundary, neighbors, BFS fill)
    // is vector-pinned, not just law-consistent.
    "q288_h3_published_fill" -> ((s, dir) => {
      import s.implicits._
      import graft.geo.{GeoCell, H3}
      val verts = Seq(
        (0.659966917655, -2.1364398519396),
        (0.6595011102219, -2.1359434279405),
        (0.6583348114025, -2.1354884206045),
        (0.6581220034068, -2.1382437718946),
        (0.6594479998527, -2.1384597563896),
        (0.6599990002976, -2.1376771158464))
        .map { case (la, lo) => (math.toDegrees(la), math.toDegrees(lo)) }
      val cover = H3.polygonCells(verts, 9, 0).map(H3.fromString)
      val centerIn = cover.filter { h =>
        val (cla, clo) = H3.h3ToGeo(h)
        GeoCell.pointInPolygon(cla, clo, verts)
      }
      // our cover = published polyfill ∪ forced vertex cells (the tile
      // vertex guarantee) — extras beyond the vertex cells would be a bug
      val vertCells = verts.map { case (la, lo) =>
        H3.geoToH3(la, lo, 9) }.toSet
      val extraNonVertex = (cover.toSet -- centerIn.toSet -- vertCells).size
      val published = Set("8928308280fffff", "8928308280bffff",
        "89283082807ffff", "89283082877ffff", "8928308283bffff",
        "89283082873ffff", "89283082803ffff")
      val got = H3.kRing(H3.fromString("8928308280fffff"), 1)
        .map(H3.toH3String)
      Seq(
        ("a_sf_polyfill_cells", centerIn.size.toLong),
        ("b_extra_nonvertex", extraNonVertex.toLong),
        ("c_kring_sym_diff",
          ((got -- published) ++ (published -- got)).size.toLong),
        ("d_sf_point_in_cover",
          if (cover.contains(H3.fromString("8928308280fffff"))) 1L else 0L))
        .toDF("leg", "value").orderBy($"leg")
    }),

    // the same traversal/fill surface as REGISTERED SQL FUNCTIONS —
    // `h3_kring(h3, k)` and `h3_polyfill(lats, lngs, res[, layers])`
    // (sorted uppercase id arrays), so a SQL caller builds a q283-style
    // tile cover with no fitted model and no Scala. Legs pin the
    // published kRing ring VERBATIM (sorted join), polyfill counts and
    // membership, and kRing/layers monotonicity — all data-independent.
    "q289_h3_sql_traversal" -> ((s, dir) => {
      val verts = Seq(
        (0.659966917655, -2.1364398519396),
        (0.6595011102219, -2.1359434279405),
        (0.6583348114025, -2.1354884206045),
        (0.6581220034068, -2.1382437718946),
        (0.6594479998527, -2.1384597563896),
        (0.6599990002976, -2.1376771158464))
        .map { case (la, lo) => (math.toDegrees(la), math.toDegrees(lo)) }
      val lats = verts.map(_._1).mkString("array(", ", ", ")")
      val lngs = verts.map(_._2).mkString("array(", ", ", ")")
      s.sql(
        s"""SELECT 'a_kring_ring1' AS leg,
           |       array_join(h3_kring('8928308280fffff', 1), ',') AS value
           |UNION ALL SELECT 'b_kring_k2_size',
           |       CAST(size(h3_kring('8928308280FFFFF', 2)) AS STRING)
           |UNION ALL SELECT 'c_polyfill_cover_size',
           |       CAST(size(h3_polyfill($lats, $lngs, 9)) AS STRING)
           |UNION ALL SELECT 'd_polyfill_has_sf_cell',
           |       CAST(array_contains(h3_polyfill($lats, $lngs, 9, 0),
           |                           '8928308280FFFFF') AS STRING)
           |UNION ALL SELECT 'e_layered_minus_base',
           |       CAST(size(h3_polyfill($lats, $lngs, 9, 1)) -
           |            size(h3_polyfill($lats, $lngs, 9)) >= 0 AS STRING)
           |ORDER BY leg""".stripMargin)
    }),

    // DATA-MIXTURE sampling — the corpus-composition step: per-source
    // mixture weights (here derived from the source name so the oracle
    // needs no side table) split a global token budget, and each source
    // fills its budget in deterministic md5-priority order
    // (MixtureSampling: two-level bucketed windows, never one partition
    // per source). The oracle replays the ranking, the exclusive prefix
    // sum and the integer budget split — a wrong tie-break, an inclusive
    // prefix, or float budget arithmetic all break the hash.
    "q197_mixture_sample" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents").select($"source", $"doc_id",
        TextFunctions.tokenCount($"text").cast("long").as("n_tokens"))
      val w = docs.select($"source").distinct()
        .withColumn("wt", (substring($"source", 4, 10).cast("int") % 4 + 1).cast("long"))
      graft.operators.MixtureSampling.byWeights(docs, w, totalBudget = 100000L)
        .groupBy($"source", $"wt", $"budget_toks")
        .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("sel_tokens"),
          sum($"doc_id").as("id_checksum"))
        .orderBy($"source")
    }),

    // Delta WRITE roundtrip — the writer half of the interop story, timed
    // end-to-end like q173's XML sink (the write IS the semantics): create
    // (protocol + metaData + adds), OVERWRITE (removes + adds), checkpoint
    // at v1, append at v2, then pin every version back through the READER.
    // v0 predates the checkpoint (must replay from JSON alone), v1 reads
    // through the compacted state, v2 layers a post-checkpoint commit on
    // it. The oracle recomputes each version's rows from `orders` — a
    // leaked overwrite (v0 files surviving into v1), a checkpoint that
    // baked in too much, or a dropped append all break the hash.
    "q198_delta_write" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.SaveMode
      val base = scratch(q198TablePat, dir)
      val bp = new org.apache.hadoop.fs.Path(base)
      bp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(bp, true)
      val o = t(s, dir, "orders").select($"o_orderkey", $"o_custkey",
        round($"o_totalprice" * 100).cast("long").as("price_cents"))
      def slice(k: Int) = o.where($"o_orderkey" % 7 === k)
      graft.sources.DeltaLogWriter.write(slice(0), base, SaveMode.Overwrite)
      graft.sources.DeltaLogWriter.write(slice(1), base, SaveMode.Overwrite)
      graft.sources.DeltaLogWriter.checkpoint(s, base)
      graft.sources.DeltaLogWriter.write(slice(2), base, SaveMode.Append)
      (0L to 2L).map { v =>
        Tables.deltaTable(s, base, asOf = Some(v))
          .agg(count(lit(1)).as("n_rows"), sum($"o_orderkey").as("id_checksum"),
            sum($"price_cents").as("price_checksum"))
          .select(lit(v).as("version"), $"n_rows", $"id_checksum", $"price_checksum")
      }.reduce(_ unionAll _).orderBy($"version")
    }),

    // AVRO container roundtrip — the third interchange format a pipeline
    // gets handed (Kafka archives, Hive exports), written and read back
    // inside the timed window like q173's XML (the codec IS the
    // semantics; no spark-avro module on this classpath — sources.Avro
    // drives the public avro-mapred Hadoop formats distributed, one file
    // per partition, splittable on read). Nullable column included so the
    // ["null", T] union spelling is exercised; the oracle recomputes from
    // `events`, so a dropped row, a null mangled to 0, or a lossy double
    // all break the hash.
    "q199_avro_roundtrip" -> ((s, dir) => {
      import s.implicits._
      val base = scratch(q199AvroPat, dir)
      val bp = new org.apache.hadoop.fs.Path(base)
      bp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(bp, true)
      val ev = t(s, dir, "events").select($"event_id", $"event_type",
        round($"value" * 1e6).cast("long").as("value_micros"),
        when($"event_id" % 5 === 0, $"user_id").as("sampled_user"))
      graft.sources.Avro.write(ev, base)
      graft.sources.Avro.read(s, base, ev.schema)
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), sum($"value_micros").as("value_checksum"),
          count($"sampled_user").as("n_sampled"),
          sum($"sampled_user").as("user_checksum"))
        .orderBy($"event_type")
    }),
  )


  /** q185's registry, staged write-once per documents state: reset the
    * model dir (a refreshed corpus must republish v1/v2, never append
    * v3/v4) and register both fits — deterministic given the table, so
    * the oracle reads `.../quality/v2/data` directly. */
  private def stageQ185Registry(s: SparkSession, dir: String): Unit = {
    import s.implicits._
    val root = scratch(q185RegPat, dir)
    Tables.stageOnce(s, root, Tables.sourceSig(s, dir, "documents")) {
      val m = new org.apache.hadoop.fs.Path(root, "quality")
      m.getFileSystem(s.sparkContext.hadoopConfiguration).delete(m, true)
      val docs = t(s, dir, "documents")
      val featmap = graft.tracking.ModelRegistry.qualityFeatmap
      graft.tracking.ModelRegistry.register(s, root, "quality",
        graft.tracking.ModelRegistry.KindLinearLogit,
        QualityClassifier.fitWeights(docs, ($"lang" === "en").cast("int")),
        Map("featmap" -> featmap, "labels" -> "lang_en"))
      graft.tracking.ModelRegistry.register(s, root, "quality",
        graft.tracking.ModelRegistry.KindLinearLogit,
        QualityClassifier.fitWeights(docs.where($"n_chars" >= 100),
          ($"lang" === "en").cast("int")),
        Map("featmap" -> featmap, "labels" -> "lang_en_long"))
    }
  }

  /** q180's probe keys — exist at every sf (event_id 0..999 at sf0.001). */
  private val Q180Ids = Seq(3L, 41L, 107L, 499L, 877L)

  /** q181's query terms — mid-frequency tokens of the synthetic corpus. */
  private val Q181Terms = Seq("spark", "vector", "scan")

  val oracle: Map[String, String] = Map(
    "q157_pq_adc" ->
      s"""WITH ex AS (SELECT vec_id AS corpus_id,
         |              generate_subscripts(codes, 1) - 1 AS sub, unnest(codes) AS code
         |            FROM read_parquet('$q157CodesPat/*.parquet')),
         |j AS (SELECT l.query_id, ex.corpus_id, l.dist_key
         |      FROM ex JOIN read_parquet('$q157LutPat/*.parquet') l USING (sub, code)
         |      WHERE l.query_id <> ex.corpus_id),
         |s AS (SELECT query_id, corpus_id, CAST(sum(dist_key) AS BIGINT) AS adc_key
         |      FROM j GROUP BY 1, 2),
         |r AS (SELECT query_id, corpus_id, adc_key,
         |        row_number() OVER (PARTITION BY query_id ORDER BY adc_key, corpus_id) AS rank
         |      FROM s)
         |SELECT query_id, corpus_id, adc_key, rank FROM r WHERE rank <= 10
         |ORDER BY query_id, rank""".stripMargin,
    "q158_file_skipping" -> {
      val ((latLo, latHi), (lngLo, lngHi)) = Q158Box
      s"""SELECT user_id, count(*) AS n,
         |  CAST(sum(CAST(round(amount * 100) AS BIGINT)) AS BIGINT) AS amount_cents
         |FROM read_parquet('${scratchPat("q134_zpts")}/*.parquet')
         |WHERE latitude BETWEEN $latLo AND $latHi
         |  AND longitude BETWEEN $lngLo AND $lngHi
         |GROUP BY 1 ORDER BY 1""".stripMargin
    },
    "q159_quality_filter" -> {
      val feats = QualityClassifier.featuresSql
        .map { case (n, sql) => s"        $sql AS $n" }.mkString(",\n")
      s"""WITH w AS (SELECT * FROM read_parquet('$q159WeightsPat/*.parquet')),
         |f AS (SELECT doc_id,
         |$feats
         |      FROM documents),
         |s AS (SELECT doc_id,
         |        CAST(round((w.intercept + w.w_chars * f_chars + w.w_toks * f_toks
         |          + w.w_stop * f_stop + w.w_digit * f_digit) * 1e6) AS BIGINT) AS logit_key
         |      FROM f, w)
         |SELECT doc_id, logit_key,
         |  CAST(CASE WHEN logit_key > 0 THEN 1 ELSE 0 END AS BIGINT) AS keep
         |FROM s ORDER BY doc_id""".stripMargin
    },
    "q160_audio_frames" ->
      s"""WITH w AS (SELECT doc_id, sample_rate, samples
         |           FROM read_parquet('$q160WavPat/*.parquet')),
         |ex AS (SELECT doc_id, sample_rate,
         |         generate_subscripts(samples, 1) - 1 AS idx, unnest(samples) AS v
         |       FROM w)
         |SELECT doc_id, sample_rate, idx // 400 AS frame, count(*) AS n,
         |  CAST(sum(CAST(v AS BIGINT) * v) AS BIGINT) AS energy
         |FROM ex GROUP BY 1, 2, 3 ORDER BY doc_id, frame""".stripMargin,
    "q161_minhashlsh_mllib" ->
      s"""WITH cand AS (SELECT id_a, id_b FROM read_parquet('$q161PairsPat/*.parquet')),
         |c AS (SELECT doc_id,
         |        list_filter(string_split(lower(text), ' '), t -> t != '') AS tk
         |      FROM documents),
         |shg AS (SELECT doc_id,
         |          list_distinct(list_transform(generate_series(1, greatest(len(tk)-2, 0)),
         |            i -> array_to_string(list_slice(tk, i, i+2), ' '))) AS sh
         |        FROM c WHERE len(tk) >= 3),
         |p AS (SELECT cand.id_a, cand.id_b,
         |        round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
         |          CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE), 6) AS jaccard
         |      FROM cand JOIN shg a ON a.doc_id = cand.id_a
         |                JOIN shg b ON b.doc_id = cand.id_b)
         |SELECT id_a, id_b, jaccard FROM p WHERE jaccard >= 0.10
         |ORDER BY id_a, id_b""".stripMargin,
    "q162_compaction" ->
      s"""SELECT count(*) AS n_rows, count(DISTINCT filename) AS n_files,
         |  CAST(sum(event_id) AS BIGINT) AS id_checksum
         |FROM read_parquet('$q162CompactPat/*.parquet', filename=true)""".stripMargin,
    "q163_stream_left_join" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us, event_type FROM events),
        |p AS (SELECT event_id AS p_id, user_id AS p_user, us AS p_us FROM e WHERE event_id % 10 = 0),
        |c AS (SELECT event_id AS c_id, user_id AS c_user, us AS c_us FROM e WHERE event_type = 'click'),
        |m AS (SELECT p.p_id, c.c_id FROM p JOIN c
        |      ON p_user = c_user AND c_us >= p_us AND c_us <= p_us + 3600000000),
        |wm AS (SELECT least((SELECT max(c_us) FROM c), (SELECT max(p_us) FROM p))
        |         - 10000000 AS w)
        |SELECT p_id, c_id FROM m
        |UNION ALL
        |SELECT p.p_id, CAST(-1 AS BIGINT) AS c_id FROM p, wm
        |WHERE p.p_us + 3600000000 < wm.w
        |  AND NOT EXISTS (SELECT 1 FROM m WHERE m.p_id = p.p_id)
        |ORDER BY p_id, c_id""".stripMargin,
    "q164_time_travel" ->
      """SELECT 1 AS version, count(*) AS n_rows, CAST(sum(event_id) AS BIGINT) AS id_checksum
        |FROM events WHERE event_type = 'purchase'
        |UNION ALL
        |SELECT 2, count(*), CAST(sum(event_id) AS BIGINT)
        |FROM events WHERE event_type IN ('purchase', 'click')
        |UNION ALL
        |SELECT 3, count(*), CAST(sum(event_id) AS BIGINT)
        |FROM events WHERE value > 100.0
        |ORDER BY version""".stripMargin,
    "q165_vacuum" ->
      s"""WITH live AS (SELECT file FROM read_parquet('$q165TablePat/_log/v3/*.parquet')),
         |refd AS (SELECT file FROM read_parquet('$q165TablePat/_log/v1/*.parquet')
         |         UNION SELECT file FROM read_parquet('$q165TablePat/_log/v2/*.parquet')
         |         UNION SELECT file FROM read_parquet('$q165TablePat/_log/v3/*.parquet'))
         |SELECT (SELECT count(*) FROM live) AS n_live_files,
         |  (SELECT count(*) FROM refd) - (SELECT count(*) FROM live) AS n_vacuumed,
         |  (SELECT count(*) FROM events WHERE value > 100.0) AS n_rows,
         |  (SELECT CAST(sum(event_id) AS BIGINT) FROM events WHERE value > 100.0) AS id_checksum""".stripMargin,
    "q166_stream_append_windows" ->
      """WITH e AS (SELECT event_type, epoch_us(ts) AS us FROM events),
        |wm AS (SELECT max(us) - 10000000 AS w FROM e),
        |b AS (SELECT event_type, us - (us % 3600000000) AS ws_us FROM e)
        |SELECT ws_us, event_type, count(*) AS n FROM b, wm
        |WHERE ws_us + 3600000000 <= wm.w
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q167_ivf_pq" ->
      s"""WITH cand AS (SELECT query_id, corpus_id FROM read_parquet('$q167CandPat/*.parquet')),
         |ex AS (SELECT vec_id AS corpus_id,
         |         generate_subscripts(codes, 1) - 1 AS sub, unnest(codes) AS code
         |       FROM read_parquet('$q167CodesPat/*.parquet')),
         |j AS (SELECT cand.query_id, cand.corpus_id, l.dist_key
         |      FROM cand JOIN ex ON ex.corpus_id = cand.corpus_id
         |      JOIN read_parquet('$q167LutPat/*.parquet') l
         |        ON l.query_id = cand.query_id AND l.sub = ex.sub AND l.code = ex.code),
         |s AS (SELECT query_id, corpus_id, CAST(sum(dist_key) AS BIGINT) AS adc_key
         |      FROM j GROUP BY 1, 2),
         |r AS (SELECT query_id, corpus_id, adc_key,
         |        row_number() OVER (PARTITION BY query_id ORDER BY adc_key, corpus_id) AS rank
         |      FROM s)
         |SELECT query_id, corpus_id, adc_key, rank FROM r WHERE rank <= 10
         |ORDER BY query_id, rank""".stripMargin,
    "q168_kmv_native" ->
      s"""${graft.sketch.Kmv.sketchSql("events", "event_type", "user_id", 64)}
         |SELECT key AS event_type, n_kept, kth_hash,
         |  ${graft.sketch.Kmv.estimateSql(64)} AS est_distinct
         |FROM kk ORDER BY 1""".stripMargin,
    "q169_expectations" ->
      """WITH v AS (SELECT
        |  CASE WHEN NOT coalesce(value >= 0.0, false) THEN 1 ELSE 0 END AS v_val,
        |  CASE WHEN NOT coalesce(user_id IS NOT NULL, false) THEN 1 ELSE 0 END AS v_user,
        |  CASE WHEN NOT coalesce(event_type IN ('click', 'view', 'purchase'), false) THEN 1 ELSE 0 END AS v_type
        |  FROM events)
        |SELECT 'quarantined_rows' AS metric,
        |  CAST(sum(CASE WHEN v_val + v_user + v_type > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n FROM v
        |UNION ALL SELECT 'valid_rows',
        |  CAST(sum(CASE WHEN v_val + v_user + v_type = 0 THEN 1 ELSE 0 END) AS BIGINT) FROM v
        |UNION ALL SELECT 'viol_known_type', CAST(sum(v_type) AS BIGINT) FROM v
        |UNION ALL SELECT 'viol_user_present', CAST(sum(v_user) AS BIGINT) FROM v
        |UNION ALL SELECT 'viol_value_non_negative', CAST(sum(v_val) AS BIGINT) FROM v
        |ORDER BY metric""".stripMargin,
    "q170_partitioned_scan" ->
      """WITH e AS (SELECT epoch_us(ts) // 86400000000 AS day, value
        |           FROM events WHERE event_type = 'purchase')
        |SELECT day, count(*) AS n,
        |  CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) AS value_micros
        |FROM e GROUP BY 1 ORDER BY 1""".stripMargin,
    "q215_dynamic_pruning" ->
      """WITH d AS (SELECT event_type FROM events GROUP BY 1
        |           HAVING (CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) // count(*)) > 50000000)
        |SELECT e.event_type, count(*) AS n,
        |  CAST(sum(CAST(round(e.value * 1e6) AS BIGINT)) AS BIGINT) AS value_micros
        |FROM events e JOIN d USING (event_type)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q216_hidden_partitioning" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) AS value_micros
        |FROM events
        |WHERE epoch_us(ts) >= 1704412800000000 AND epoch_us(ts) < 1705017600000000
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q171_dynamic_overwrite" ->
      """WITH x AS (SELECT event_type, value FROM events WHERE event_type <> 'purchase'
        |           UNION ALL
        |           SELECT event_type, value FROM events
        |           WHERE event_type = 'purchase' AND value > 50.0)
        |SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) AS value_micros
        |FROM x GROUP BY 1 ORDER BY 1""".stripMargin,
    "q172_join_hints" ->
      """WITH a AS (SELECT count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |SELECT 'broadcast' AS strategy, n, qty_sum FROM a
        |UNION ALL SELECT 'merge', n, qty_sum FROM a
        |UNION ALL SELECT 'shuffle_hash', n, qty_sum FROM a
        |ORDER BY strategy""".stripMargin,
    "q173_xml_roundtrip" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders WHERE o_orderstatus = 'O'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q174_observe" ->
      """SELECT count(*) AS n_in,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
        |  CAST(sum(CASE WHEN event_type <> 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_out
        |FROM events""".stripMargin,
    "q175_hof_sweep" ->
      """WITH c AS (SELECT doc_id,
        |  list_filter(string_split(lower(text), ' '), t -> t != '') AS tk FROM documents),
        |l AS (SELECT doc_id, tk, list_transform(tk, x -> CAST(length(x) AS BIGINT)) AS lens FROM c)
        |SELECT doc_id,
        |  CAST(len(tk) AS BIGINT) AS n_toks,
        |  CAST(len(list_filter(lens, x -> x >= 5)) AS BIGINT) AS n_long,
        |  CAST(coalesce(list_sum(lens), 0) AS BIGINT) AS total_chars,
        |  CAST(coalesce(list_sum(list_transform(generate_series(1, len(tk)),
        |    i -> lens[i] * i)), 0) AS BIGINT) AS weighted_key,
        |  CAST(CASE WHEN list_contains(tk, 'the') THEN 1 ELSE 0 END AS BIGINT) AS has_the
        |FROM l ORDER BY doc_id""".stripMargin,
    "q176_datetime_sweep" ->
      """WITH e AS (SELECT CAST(ts AS DATE) AS d FROM events),
        |k AS (SELECT
        |  date_trunc('month', d) - DATE '1970-01-01' AS month_key,
        |  d - DATE '1970-01-01' AS day_key,
        |  last_day(d) - DATE '1970-01-01' AS last_day_key,
        |  (date_trunc('month', d) + INTERVAL 1 MONTH)::DATE - DATE '1970-01-01' AS next_month_key,
        |  isodow(d) - 1 AS wd
        |FROM e)
        |SELECT month_key, last_day_key, next_month_key, count(*) AS n,
        |  min(day_key) AS first_day, max(day_key) AS last_seen,
        |  CAST(count(DISTINCT day_key) AS BIGINT) AS n_days,
        |  CAST(sum(CASE WHEN wd = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_monday_events
        |FROM k GROUP BY 1, 2, 3 ORDER BY month_key""".stripMargin,
    "q177_map_type" ->
      """WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day, count(*) AS cnt
        |               FROM events GROUP BY 1, 2),
        |tot AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days_total
        |        FROM daily GROUP BY 1)
        |SELECT d.event_type, d.day, d.cnt, t.n_days_total
        |FROM daily d JOIN tot t USING (event_type)
        |WHERE d.cnt >= 2 ORDER BY 1, 2""".stripMargin,
    "q178_analyze_stats" ->
      """SELECT count(*) AS row_count,
        |  CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS status_ndv
        |FROM orders""".stripMargin,
    // HLL replay: bucket = top 6 of the 60-bit md5 slice, rho = leading
    // zeros within the 54-bit suffix + 1 (all-zero suffix → 55); the
    // estimator rebuilds the EXACT integer harmonic key sum(2^(55-rho))
    // and applies the same two pinned IEEE roundings as the native
    // aggregate's eval (alpha_64 = 0.709; small-range branch at
    // raw <= 2.5*m with zero registers present).
    "q179_hll_native" ->
      s"""WITH h AS (SELECT event_type,
         |  ${graft.text.TextFunctions.md5Bucket60Sql("CAST(user_id AS VARCHAR)")} AS hv
         |  FROM events WHERE user_id IS NOT NULL),
         |b AS (SELECT event_type, CAST(hv >> 54 AS INT) AS bucket,
         |        hv & ((CAST(1 AS BIGINT) << 54) - 1) AS suffix FROM h),
         |r AS (SELECT event_type, bucket,
         |        max(CASE WHEN suffix = 0 THEN 55
         |                 ELSE 54 - length(bin(suffix)) + 1 END) AS rho
         |      FROM b GROUP BY 1, 2),
         |g AS (SELECT DISTINCT event_type FROM events WHERE user_id IS NOT NULL),
         |f AS (SELECT g.event_type, gs.bucket, coalesce(r.rho, 0) AS rho
         |      FROM g CROSS JOIN generate_series(0, 63) AS gs(bucket)
         |      LEFT JOIN r ON r.event_type = g.event_type AND r.bucket = gs.bucket),
         |a AS (SELECT event_type,
         |        string_agg(CAST(rho AS VARCHAR), ',' ORDER BY bucket) AS registers,
         |        CAST(sum(CAST(1 AS BIGINT) << (55 - rho)) AS BIGINT) AS harm_key,
         |        CAST(sum(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS BIGINT) AS zeros
         |      FROM f GROUP BY 1),
         |e AS (SELECT event_type, registers, zeros,
         |        0.709 * (64.0 * 64.0) * power(2.0, 55) / CAST(harm_key AS DOUBLE) AS raw
         |      FROM a)
         |SELECT event_type, registers,
         |  CAST(round((CASE WHEN raw <= 160.0 AND zeros > 0
         |    THEN 64.0 * ln(64.0 / CAST(zeros AS DOUBLE)) ELSE raw END) * 1e6) AS BIGINT) AS est_micros
         |FROM e ORDER BY event_type""".stripMargin,
    // soundness gate: the pruned read must equal the same filter over the
    // FULL table (a Bloom can over-read, never drop)
    "q180_bloom_file_index" ->
      s"""SELECT event_id, user_id, event_type,
         |  CAST(round(value * 1e6) AS BIGINT) AS value_micros
         |FROM events WHERE event_id IN (${Q180Ids.mkString(", ")})
         |ORDER BY event_id""".stripMargin,
    "q181_bm25" -> Bm25.scoreSql("documents", Q181Terms, 15),
    "q182_token_entropy" ->
      """WITH tok AS (SELECT doc_id,
        |    unnest(list_filter(string_split(lower(text), ' '), t -> t != '')) AS tok
        |  FROM documents),
        |c AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2),
        |a AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |    CAST(count(*) AS BIGINT) AS n_unique,
        |    CAST(sum(CAST(round(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)) * 1e6) AS BIGINT)) AS BIGINT) AS clnc_key
        |  FROM c GROUP BY 1)
        |SELECT doc_id, n_tokens, n_unique, clnc_key,
        |  CAST(round((ln(CAST(n_tokens AS DOUBLE))
        |    - (CAST(clnc_key AS DOUBLE) / 1e6) / CAST(n_tokens AS DOUBLE)) * 1e6) AS BIGINT) AS entropy_micros
        |FROM a ORDER BY doc_id""".stripMargin,
    // both watermark-eviction cutoffs replayed from the batch data: a
    // left (purchase) row null-extends when its 1h join window closed
    // before the final watermark; a right (click) row when its event time
    // itself passed the watermark (no future left can reach back)
    "q183_stream_full_outer" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us, event_type FROM events),
        |p AS (SELECT event_id AS p_id, user_id AS p_user, us AS p_us FROM e WHERE event_id % 10 = 0),
        |c AS (SELECT event_id AS c_id, user_id AS c_user, us AS c_us FROM e WHERE event_type = 'click'),
        |m AS (SELECT p.p_id, c.c_id FROM p JOIN c
        |      ON p_user = c_user AND c_us >= p_us AND c_us <= p_us + 3600000000),
        |wm AS (SELECT least((SELECT max(c_us) FROM c), (SELECT max(p_us) FROM p))
        |         - 10000000 AS w)
        |SELECT p_id, c_id FROM m
        |UNION ALL
        |SELECT p.p_id, CAST(-1 AS BIGINT) AS c_id FROM p, wm
        |WHERE p.p_us + 3600000000 < wm.w
        |  AND NOT EXISTS (SELECT 1 FROM m WHERE m.p_id = p.p_id)
        |UNION ALL
        |SELECT CAST(-1 AS BIGINT) AS p_id, c.c_id FROM c, wm
        |WHERE c.c_us < wm.w
        |  AND NOT EXISTS (SELECT 1 FROM m WHERE m.c_id = c.c_id)
        |ORDER BY p_id, c_id""".stripMargin,
    "q184_ann_index_persist" -> ExtensionQueries.knnReplayOracle(q184CandPat, 5),
    "q185_model_registry" -> {
      val feats = QualityClassifier.featuresSql
        .map { case (n, sql) => s"        $sql AS $n" }.mkString(",\n")
      s"""WITH w AS (SELECT * FROM read_parquet('$q185RegPat/quality/v2/data/*.parquet')),
         |f AS (SELECT doc_id,
         |$feats
         |      FROM documents),
         |s AS (SELECT doc_id,
         |        CAST(round((w.intercept + w.w_chars * f_chars + w.w_toks * f_toks
         |          + w.w_stop * f_stop + w.w_digit * f_digit) * 1e6) AS BIGINT) AS logit_key
         |      FROM f, w)
         |SELECT doc_id, CAST(2 AS BIGINT) AS model_version, logit_key,
         |  CAST(CASE WHEN logit_key > 0 THEN 1 ELSE 0 END AS BIGINT) AS keep
         |FROM s ORDER BY doc_id""".stripMargin
    },
    "q186_hybrid_rrf" ->
      s"""WITH lex AS (SELECT doc_id, rank AS lex_rank
         |  FROM (${Bm25.scoreSql("documents", Q181Terms, 20)}) t),
         |q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
         |sc AS (SELECT c.vec_id AS doc_id,
         |    CAST(round(list_cosine_similarity(q.qv, CAST(c.embedding AS DOUBLE[])) * 10000) AS BIGINT) AS cos_x1e4
         |  FROM q CROSS JOIN embeddings c WHERE c.vec_id != 0),
         |sem AS (SELECT doc_id, sem_rank FROM (
         |    SELECT doc_id, row_number() OVER (ORDER BY cos_x1e4 DESC, doc_id) AS sem_rank
         |    FROM sc) t WHERE sem_rank <= 20),
         |fused AS (SELECT coalesce(lex.doc_id, sem.doc_id) AS doc_id,
         |    coalesce(lex.lex_rank, -1) AS lex_rank,
         |    coalesce(sem.sem_rank, -1) AS sem_rank,
         |    coalesce(CAST(round(1e6 / (60.0 + lex.lex_rank)) AS BIGINT), 0)
         |      + coalesce(CAST(round(1e6 / (60.0 + sem.sem_rank)) AS BIGINT), 0) AS rrf_micros
         |  FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id),
         |top AS (SELECT * FROM fused ORDER BY rrf_micros DESC, doc_id LIMIT 10)
         |SELECT doc_id, lex_rank, sem_rank, rrf_micros,
         |  row_number() OVER (ORDER BY rrf_micros DESC, doc_id) AS rank
         |FROM top ORDER BY rank""".stripMargin,
    "q187_expire_history" ->
      s"""WITH latest AS (SELECT * FROM events WHERE value > 100.0
         |               UNION ALL SELECT * FROM events WHERE event_type = 'view')
         |SELECT CAST(2 AS BIGINT) AS n_versions,
         |  CAST(3 AS BIGINT) AS oldest_version,
         |  CAST(2 AS BIGINT) AS n_expired,
         |  -- v1/v2's single-file commits are referenced by no retained
         |  -- manifest; v3's file lives on inside v4's active set
         |  CAST(2 AS BIGINT) AS n_deleted,
         |  (SELECT count(*) FROM latest) AS n_rows,
         |  (SELECT CAST(sum(event_id) AS BIGINT) FROM latest) AS id_checksum,
         |  -- the on-disk aftermath: the surviving head manifest lists
         |  -- exactly the overwrite file + the v4 append file
         |  (SELECT count(*) FROM read_parquet('$q187TablePat/_log/v4/*.parquet')) AS n_live_files""".stripMargin,
    "q188_repetition" ->
      """WITH tk AS (SELECT doc_id,
        |    list_filter(string_split(lower(text), ' '), t -> t != '') AS tk
        |  FROM documents),
        |tri AS (SELECT doc_id,
        |    CASE WHEN len(tk) >= 3
        |      THEN list_transform(generate_series(1, len(tk) - 2),
        |             i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))
        |      ELSE [] END AS tri
        |  FROM tk)
        |SELECT doc_id, CAST(len(tri) AS BIGINT) AS n_trigrams,
        |  CAST(len(tri) - len(list_distinct(tri)) AS BIGINT) AS n_repeats,
        |  CAST(round(1e6 * CAST(len(tri) - len(list_distinct(tri)) AS DOUBLE)
        |    / CAST(len(tri) AS DOUBLE)) AS BIGINT) AS rep_micros
        |FROM tri WHERE len(tri) > 0 ORDER BY doc_id""".stripMargin,
    "q217_stream_log_source" -> {
      def leg(v: Int, run: Int, et: String) =
        s"""SELECT CAST($v AS BIGINT) AS version, CAST($run AS BIGINT) AS run,
           |  CAST(count(*) AS BIGINT) AS n, CAST(sum(event_id) AS BIGINT) AS id_checksum,
           |  CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) AS value_checksum
           |FROM events WHERE event_type = '$et'""".stripMargin
      s"""SELECT * FROM (${leg(1, 1, "purchase")}
         |UNION ALL ${leg(2, 1, "click")}
         |UNION ALL ${leg(3, 1, "view")}
         |UNION ALL ${leg(4, 2, "signup")})
         |ORDER BY version""".stripMargin
    },
    "q189_stream_incremental" ->
      """SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(event_id) AS BIGINT) AS id_checksum,
        |  CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) AS value_checksum
        |FROM events WHERE event_type = 'purchase'""".stripMargin,
    "q190_schema_evolution" ->
      """SELECT CASE WHEN event_id % 2 = 0 THEN 'pre_schema' ELSE event_type END AS event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) AS value_checksum
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,
    "q191_nested_pruning" ->
      """SELECT user_id, count(*) AS n FROM events
        |GROUP BY 1 HAVING count(*) >= 2 ORDER BY user_id""".stripMargin,
    "q193_delta_log_read" ->
      """WITH active AS (
        |  SELECT event_id, event_type, CAST(round(value * 1e6) AS BIGINT) AS value_micros
        |  FROM events
        |  WHERE (event_type = 'purchase' AND event_id % 2 <> 0)
        |     OR event_type = 'click'
        |     OR (event_type = 'view' AND CAST(round(value * 1e6) AS BIGINT) > 100000000))
        |SELECT event_type, count(*) AS n,
        |  CAST(sum(event_id) AS BIGINT) AS id_checksum,
        |  CAST(sum(value_micros) AS BIGINT) AS value_checksum
        |FROM active GROUP BY 1 ORDER BY event_type""".stripMargin,
    "q282_h3_vectors" ->
      """SELECT * FROM (VALUES
        |  ('a_bay_r5', '85283473FFFFFFF'),
        |  ('b_bay_r7', '87283472BFFFFFF'),
        |  ('c_sf_r9', '8928308280FFFFF'),
        |  ('d_liberty_r10', '8A2A1072B59FFFF'),
        |  ('e_res1_cells', '842'),
        |  ('f_pentagons_r1', '12')) AS t(leg, value)
        |ORDER BY leg""".stripMargin,
    "q284_h3_kring" ->
      """SELECT * FROM (VALUES
        |  ('a_ring1', CAST(7 AS BIGINT)),
        |  ('b_ring2', CAST(19 AS BIGINT)),
        |  ('c_ring3', CAST(37 AS BIGINT)),
        |  ('d_pentagon_ring1', CAST(6 AS BIGINT)),
        |  ('e_asym_offseam', CAST(0 AS BIGINT))) AS t(leg, value)
        |ORDER BY leg""".stripMargin,
    // the ring is the h3-py docs' published set sorted; 1259 = upstream
    // h3's pinned polyfill(sfGeoPolygon, 9) count (1253) + the 6 forced
    // vertex cells whose centers fall outside (the tile-cover guarantee)
    "q289_h3_sql_traversal" ->
      """SELECT * FROM (VALUES
        |  ('a_kring_ring1',
        |   '89283082803FFFF,89283082807FFFF,8928308280BFFFF,8928308280FFFFF,8928308283BFFFF,89283082873FFFF,89283082877FFFF'),
        |  ('b_kring_k2_size', '19'),
        |  ('c_polyfill_cover_size', '1259'),
        |  ('d_polyfill_has_sf_cell', 'true'),
        |  ('e_layered_minus_base', 'true')) AS t(leg, value)
        |ORDER BY leg""".stripMargin,
    // 1253 is upstream h3's own pinned polyfill(sfGeoPolygon, 9) result;
    // the other legs are exact-zero laws over the published kRing set
    "q288_h3_published_fill" ->
      """SELECT * FROM (VALUES
        |  ('a_sf_polyfill_cells', CAST(1253 AS BIGINT)),
        |  ('b_extra_nonvertex', CAST(0 AS BIGINT)),
        |  ('c_kring_sym_diff', CAST(0 AS BIGINT)),
        |  ('d_sf_point_in_cover', CAST(1 AS BIGINT))) AS t(leg, value)
        |ORDER BY leg""".stripMargin,
    "q283_h3_tiling_join" ->
      """SELECT * FROM (VALUES
        |  ('a_self_miss', '0'),
        |  ('b_user_diff', '0'),
        |  ('c_bad_ids', '0')) AS t(leg, value)
        |ORDER BY leg""".stripMargin,
    "q196_snapshot_optimize" ->
      s"""WITH act AS (SELECT event_id FROM events
         |            WHERE event_type IN ('purchase', 'click'))
         |SELECT
         |  (SELECT count(*) FROM read_parquet('$q196TablePat/_log/v2/*.parquet')) AS files_before,
         |  (SELECT count(*) FROM read_parquet('$q196TablePat/_log/v3/*.parquet')) AS files_after,
         |  (SELECT count(*) FROM act) AS n_rows,
         |  (SELECT CAST(sum(event_id) AS BIGINT) FROM act) AS id_checksum,
         |  (SELECT count(*) FROM act) AS pre_rows,
         |  (SELECT CAST(sum(event_id) AS BIGINT) FROM act) AS pre_checksum""".stripMargin,
    "q194_delta_time_travel" ->
      """WITH v0 AS (SELECT event_id FROM events WHERE event_type = 'purchase'),
        |v1 AS (SELECT event_id FROM events
        |       WHERE (event_type = 'purchase' AND event_id % 2 <> 0)
        |          OR event_type = 'click'),
        |v2 AS (SELECT event_id FROM v1
        |       UNION ALL
        |       SELECT event_id FROM events
        |       WHERE event_type = 'view' AND CAST(round(value * 1e6) AS BIGINT) > 100000000)
        |SELECT CAST(0 AS BIGINT) AS version, count(*) AS n_rows,
        |  CAST(sum(event_id) AS BIGINT) AS id_checksum FROM v0
        |UNION ALL
        |SELECT CAST(1 AS BIGINT), count(*), CAST(sum(event_id) AS BIGINT) FROM v1
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), count(*), CAST(sum(event_id) AS BIGINT) FROM v2
        |ORDER BY version""".stripMargin,
    "q197_mixture_sample" ->
      """WITH d AS (SELECT source, doc_id,
        |  CAST(len(list_filter(string_split(lower(text), ' '), t -> t != '')) AS BIGINT) AS n_tokens
        |FROM documents),
        |w AS (SELECT DISTINCT source,
        |  CAST(CAST(substr(source, 4) AS INT) % 4 + 1 AS BIGINT) AS wt FROM documents),
        |b AS (SELECT source, wt,
        |  CAST(100000 * wt // (SELECT CAST(sum(wt) AS BIGINT) FROM w) AS BIGINT) AS budget_toks FROM w),
        |r AS (SELECT source, doc_id, n_tokens,
        |  CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source
        |    ORDER BY md5('mx|' || CAST(doc_id AS VARCHAR)), doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_before
        |FROM d)
        |SELECT r.source, wt, budget_toks, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS sel_tokens,
        |  CAST(sum(doc_id) AS BIGINT) AS id_checksum
        |FROM r JOIN b ON r.source = b.source
        |WHERE tok_before < budget_toks
        |GROUP BY 1, 2, 3 ORDER BY r.source""".stripMargin,
    "q198_delta_write" ->
      """WITH o AS (SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
        |           FROM orders)
        |SELECT CAST(0 AS BIGINT) AS version, count(*) AS n_rows,
        |  CAST(sum(o_orderkey) AS BIGINT) AS id_checksum,
        |  CAST(sum(price_cents) AS BIGINT) AS price_checksum
        |FROM o WHERE o_orderkey % 7 = 0
        |UNION ALL
        |SELECT CAST(1 AS BIGINT), count(*), CAST(sum(o_orderkey) AS BIGINT),
        |  CAST(sum(price_cents) AS BIGINT)
        |FROM o WHERE o_orderkey % 7 = 1
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), count(*), CAST(sum(o_orderkey) AS BIGINT),
        |  CAST(sum(price_cents) AS BIGINT)
        |FROM o WHERE o_orderkey % 7 IN (1, 2)
        |ORDER BY version""".stripMargin,
    "q199_avro_roundtrip" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) AS value_checksum,
        |  count(CASE WHEN event_id % 5 = 0 THEN user_id END) AS n_sampled,
        |  CAST(sum(CASE WHEN event_id % 5 = 0 THEN user_id END) AS BIGINT) AS user_checksum
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,
  )
}
