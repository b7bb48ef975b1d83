package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** Deduplication operators for 100 TB training-data pipelines (BASELINE.json
  * north-star): exact, MinHash+LSH, SimHash, n-gram Jaccard, and
  * embedding-cosine near-dup (the latter in [[graft.sim.Similarity]]).
  *
  * Design for scale: every variant is shuffle-bounded —
  *  - exact: one hash aggregate on the fingerprint;
  *  - MinHash/LSH: signatures are per-row map-side work; the only shuffle is
  *    the band-bucket self-join (shingle→minhash→band→bucket-join), whose
  *    fanout is bands×rows, and candidate pairs are verified without ever
  *    comparing all O(n²) pairs;
  *  - SimHash: per-row map-side signature; near-dup = bucket join on
  *    signature (or rotated prefixes);
  *  - n-gram Jaccard: only within explicit candidate blocks.
  *
  * Hashes are md5-derived so every step has an exact DuckDB oracle. */
object Dedup {

  /** Word n-gram shingles of lowercased text, de-duplicated. */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = TextFunctions.tokens(lower(text))
    val cnt = size(toks) - (n - 1)
    // Spark's sequence(1, 0) counts DOWN — guard short docs explicitly
    when(cnt >= 1,
      array_distinct(transform(sequence(lit(1), cnt),
        i => concat_ws(" ", slice(toks, i, lit(n))))))
      .otherwise(array().cast("array<string>"))
  }

  /** Exact substring-span duplication stats — the positional-window member
    * of the dedup family (Lee et al., "Deduplicating Training Data Makes
    * Language Models Better", ACL 2022, §3.1 ExactSubstr): every window of
    * `w` consecutive tokens is hashed at its position (NON-distinct, unlike
    * [[shingles]] — coverage needs multiplicity), and a window counts as
    * duplicated when its hash occurs in ≥ 2 distinct docs. Returns one row
    * per doc with ≥ 1 window: (id, n_windows, n_dup_windows); the
    * trim/drop policy over the coverage ratio is the caller's.
    *
    * Scale shape: one explode (len−w+1 rows per doc), one hash aggregate
    * over window hashes, one equi-join back — the same shuffle pattern as
    * the shingle family, never all-pairs, never a suffix array. */
  def spanDupStats(df: DataFrame, w: Int = 10, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    val toks = TextFunctions.tokens(lower(col(textCol)))
    val cnt = size(toks) - (w - 1)
    // checkpointed: the dup aggregate AND the join side both consume wins
    // — un-materialized, the tokenize+slice+md5 explode over the whole
    // corpus ran twice (the shingleMd5Frame share-the-scan convention,
    // applied within the function). Narrow frame: (id, 32-char hash).
    val wins = graft.Tables.fanOut(df).select(col(idCol),
        explode(when(cnt >= 1, transform(sequence(lit(1), cnt),
            i => md5(concat_ws(" ", slice(toks, i, lit(w))).cast("binary"))))
          .otherwise(array().cast("array<string>"))).as("h"))
      .localCheckpoint(true)
    val dup = wins.groupBy(col("h"))
      .agg(countDistinct(col(idCol)).as("nd"))
      .where(col("nd") >= 2).select(col("h"), lit(1L).as("isdup"))
    wins.join(dup, Seq("h"), "left_outer")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_windows"),
        sum(coalesce(col("isdup"), lit(0L))).as("n_dup_windows"))
  }

  /** Exact dedup via content fingerprint: one row per distinct content with
    * the canonical (minimum) id and the duplicate count. */
  def exact(df: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    // no fanOut here: the per-row work is ONE md5 of the text — lighter
    // than the round-robin exchange it would ride behind (measured 0.25 s
    // serial vs 0.74 s fanned at sf0.1); the groupBy shuffle already
    // parallelizes everything downstream of the partial aggregate
    df.groupBy(TextFunctions.fingerprintMd5(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** MinHash value for seed `k`: lexicographic min of md5(k|md5(shingle)) —
    * a valid min-wise hash family, string-comparable in any engine; same
    * family as [[minhashSignatures]] (shingle digested once, per-seed hash
    * over the fixed-width base digest). */
  def minhash(sh: Column, k: Int): Column =
    array_min(transform(sh,
      x => md5(concat(lit(k.toString), lit("|"), md5(x.cast("binary"))).cast("binary"))))

  /** Per-doc MinHash signature columns h0..h{numHashes-1}.
    *
    * Plan shape: explode shingles once, hash each shingle ONCE
    * (`base = md5(shingle)`), then compute all per-seed minima
    * (`h_k = min md5(k|base)`) in a single partial+final hash aggregate —
    * one pass over the shingle stream, and the variable-length shingle
    * string is digested once instead of once per seed (the k-derived
    * hashes run over a fixed 34-byte input).
    * (The naive spelling — numHashes array-transform columns —
    * re-evaluates the tokenize→shingle tree per hash: measured 8× slower
    * at sf0.1.) Docs with no shingles (< n tokens) have NULL/no signature
    * either way and can never produce candidates. */
  def minhashSignatures(df: DataFrame, textCol: String = "text",
                        idCol: String = "doc_id", numHashes: Int = 8,
                        shingleN: Int = 3): DataFrame =
    minhashSignaturesFromHashes(
      shingleMd5Frame(df, textCol, idCol, shingleN), idCol, numHashes)

  /** The exploded per-doc shingle hash frame — `(id, bh)` with one row per
    * distinct doc shingle, `bh` = md5 hex of the shingle. This is the ONE
    * tokenize→shingle→md5 pass that minhash signatures, the 60-bit SimHash
    * and the estimator calibration all derive from; callers that run more
    * than one of them should compute (and cache) it once. */
  def shingleMd5Frame(df: DataFrame, textCol: String = "text",
                      idCol: String = "doc_id", shingleN: Int = 3): DataFrame =
    graft.Tables.fanOut(df)
      .select(col(idCol), explode(shingles(col(textCol), shingleN)).as("__sh"))
      .select(col(idCol), md5(col("__sh").cast("binary")).as("bh"))

  /** [[minhashSignatures]] over a precomputed [[shingleMd5Frame]]. */
  def minhashSignaturesFromHashes(ex: DataFrame, idCol: String = "doc_id",
                                  numHashes: Int = 8): DataFrame = {
    val aggs = (0 until numHashes).map { k =>
      min(md5(concat(lit(s"$k|"), col("bh")).cast("binary"))).as(s"h$k")
    }
    ex.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding: `numHashes/rowsPerBand` bands, band value = md5 of the
    * concatenated row hashes. Output: (band_idx, band_val, id). All bands
    * come from ONE evaluation of `sigs` (posexplode of the band array) —
    * a per-band union would re-run the signature explode+aggregate job
    * once per band per consumer. */
  def lshBands(sigs: DataFrame, idCol: String = "doc_id",
               numHashes: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    require(rowsPerBand >= 1 && numHashes % rowsPerBand == 0,
      s"numHashes ($numHashes) must divide evenly into rowsPerBand " +
        s"($rowsPerBand) — a remainder would silently ignore the last hashes")
    val numBands = numHashes / rowsPerBand
    val bandVals = (0 until numBands).map { b =>
      val cols = (0 until rowsPerBand).map(r => col(s"h${b * rowsPerBand + r}"))
      md5(concat(cols: _*).cast("binary"))
    }
    sigs.select(col(idCol), posexplode(array(bandVals: _*)).as(Seq("band_idx", "band_val")))
      .select(col("band_idx"), col("band_val"), col(idCol))
  }

  /** Per-ROW minhash band derivation — the STREAMING-friendly spelling of
    * [[minhashSignatures]] + [[lshBands]]: the k-th signature value is an
    * `array_min` over the row's own (distinct) shingle hashes, which is
    * the same number the groupBy-min computes (both minimize the same
    * per-doc set), so it needs NO aggregation and runs on a streaming
    * DataFrame — the ingest-time dedup probe. Emits
    * (idCol, band_idx, band_val) rows exactly like [[lshBands]]; docs
    * with zero shingles emit no rows (matching the exploded batch path).
    *
    * Evaluation discipline (the PLANS.md q188 rule): the shingle-hash
    * array is bound ONCE as a lambda variable — 8 signature mins + 4 band
    * md5s all read the bound array, so tokenize→shingle→md5 runs once per
    * row, not once per hash. */
  def bandsPerRow(df: DataFrame, textCol: String = "text", idCol: String = "doc_id",
                  numHashes: Int = 8, rowsPerBand: Int = 2,
                  shingleN: Int = 3): DataFrame = {
    require(rowsPerBand >= 1 && numHashes % rowsPerBand == 0,
      s"numHashes ($numHashes) must divide evenly into rowsPerBand " +
        s"($rowsPerBand) — a remainder would silently ignore the last hashes")
    val numBands = numHashes / rowsPerBand
    val bhArr = transform(shingles(col(textCol), shingleN), x => md5(x.cast("binary")))
    val bandArr = element_at(transform(array(bhArr), { a =>
      val hs = (0 until numHashes).map { k =>
        array_min(transform(a, bh => md5(concat(lit(s"$k|"), bh).cast("binary"))))
      }
      array((0 until numBands).map { b =>
        val cols = (0 until rowsPerBand).map(r => hs(b * rowsPerBand + r))
        md5(concat(cols: _*).cast("binary"))
      }: _*)
    }), 1)
    df.select(col(idCol), posexplode(bandArr).as(Seq("band_idx", "band_val")))
      .where(col("band_val").isNotNull)
      .select(col("band_idx"), col("band_val"), col(idCol))
  }

  /** Candidate near-dup pairs: ids sharing any LSH band bucket (id_a < id_b,
    * distinct). The O(n²) pair space never materializes — only per-bucket
    * blocks join. */
  def minhashCandidates(df: DataFrame, textCol: String = "text",
                        idCol: String = "doc_id", numHashes: Int = 8,
                        rowsPerBand: Int = 2, shingleN: Int = 3): DataFrame = {
    val bands = lshBands(
      minhashSignatures(df, textCol, idCol, numHashes, shingleN),
      idCol, numHashes, rowsPerBand)
    val a = bands.toDF("band_idx", "band_val", "id_a")
    val b = bands.toDF("band_idx", "band_val", "id_b")
    a.join(b, Seq("band_idx", "band_val"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Near-duplicate GROUPS: connected components over the MinHash+LSH
    * candidate graph ([[minhashCandidates]]), one row per group with its
    * size and canonical keep id (min doc id — deterministic). Documents in
    * no candidate pair are their own singleton group.
    *
    * Scale: candidates are the banded bucket join (never all pairs); the
    * component contraction is [[graft.cluster.ConnectedComponents]] —
    * O(log² n) rounds independent of chain length, so a 10M-doc near-dup
    * chain doesn't degrade to 10M rounds the way label propagation would. */
  def dedupGroups(df: DataFrame, textCol: String = "text", idCol: String = "doc_id",
                  numHashes: Int = 8, rowsPerBand: Int = 2, shingleN: Int = 3): DataFrame =
    dedupGroupsFromPairs(df,
      minhashCandidates(df, textCol, idCol, numHashes, rowsPerBand, shingleN), idCol)

  /** [[dedupGroups]] over an already-computed candidate-pair frame —
    * callers that have the q35 candidates in hand (or persisted) skip the
    * shingle/minhash pass entirely. */
  def dedupGroupsFromPairs(df: DataFrame, pairs: DataFrame,
                           idCol: String = "doc_id"): DataFrame =
    dedupGroupsFromComponents(df,
      graft.cluster.ConnectedComponents.run(
        pairs.select(col("id_a").as("src"), col("id_b").as("dst"))), idCol)

  /** [[dedupGroupsFromPairs]] with a caller-supplied `(id, component)`
    * frame — both CC implementations (star-contraction and the GraphX
    * twin) drive the same per-group aggregation. */
  def dedupGroupsFromComponents(df: DataFrame, cc: DataFrame,
                                idCol: String = "doc_id"): DataFrame =
    df.select(col(idCol))
      .join(cc.withColumnRenamed("id", idCol), Seq(idCol), "left_outer")
      .select(col(idCol), coalesce(col("component"), col(idCol)).as("group_id"))
      .groupBy(col("group_id"))
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("keep_id"))

  /** Exact Jaccard similarity of two shingle-set columns. */
  def jaccard(shA: Column, shB: Column): Column = {
    val inter = size(array_intersect(shA, shB)).cast("double")
    round(inter / (size(shA) + size(shB) - inter).cast("double"), 6)
  }

  /** N-gram Jaccard near-dup within explicit candidate blocks (`blockCols`),
    * e.g. same source: only in-block pairs are compared.
    *
    * Plan shape: explode the (distinct) shingles and equi-join on
    * (block, shingle), so |A∩B| is a `count` per pair and only pairs sharing
    * ≥1 shingle ever materialize. The naive spelling — join full shingle
    * ARRAYS through the block join, then `array_intersect` per pair — hauls
    * every document's whole shingle set through the shuffle O(block) times
    * and runs an O(|A|+|B|) set intersection per pair; at 100 TB the block
    * join's fanout makes that the dominant cost (measured 20× slower on the
    * driver's sf0.1 bench). CONTRACT CHANGES vs the array-intersect
    * spelling: (1) pairs with an empty intersection (Jaccard 0) are never
    * emitted — even at `threshold <= 0` the output holds only pairs sharing
    * ≥1 shingle (DedupSpec pins this: absent pair ⇒ Jaccard 0); (2) the
    * threshold applies to the ROUNDED (6 dp) jaccard — a pair whose true
    * jaccard sits within 5e-7 below the threshold rounds up and is kept
    * (keeps the emitted value and the cut consistent with each other and
    * with the oracle, at the price of the old exact-boundary behavior).
    *
    * HOT-SHINGLE CAP (`maxShingleDf`): a shingle present in k in-block docs
    * fans out to C(k,2) pair rows in the equi-join — the one quadratic this
    * shape can't otherwise bound (the q139 boilerplate-df / q77 posting-cap
    * precedent). Shingles with df > `maxShingleDf` over the full blocking
    * key are dropped via [[capHotFingerprints]] BEFORE pairing, bounding
    * per-shingle fanout at C(maxShingleDf, 2) regardless of corpus size; a
    * shingle that common is boilerplate by definition and carries no
    * near-dup signal. Contract: sizes (`sz_a`/`sz_b`) stay the FULL distinct
    * shingle counts while the intersection counts only surviving shingles,
    * so the reported jaccard is a LOWER BOUND of the true jaccard — equal
    * whenever no shared shingle is hot (DedupSpec pins both directions), and
    * pairs whose entire overlap is hot boilerplate drop out rather than
    * pairing on it. The cap adds one hash-agg over the exploded stream plus
    * a broadcast-sized anti-join (the hot set is the df-filtered tail — tiny
    * by construction); the main stream is never shuffled an extra time.
    * The cap is never silent: when it fires, [[capHotFingerprints]] warns
    * with the hot-key count AND the number of pair-intersection
    * contributions removed, so a corpus whose near-dups pair on templated
    * text is visible in the log. Callers that need the EXACT uncapped
    * semantics (and accept the C(df,2) fanout) pass
    * `maxShingleDf = Int.MaxValue` — the cap pass is then skipped
    * entirely. */
  def ngramJaccardPairs(df: DataFrame, blockCols: Seq[String],
                        threshold: Double, textCol: String = "text",
                        idCol: String = "doc_id", shingleN: Int = 3,
                        maxShingleDf: Int = 64): DataFrame = {
    val sized = graft.Tables.fanOut(df)
      .select((blockCols.map(col) :+ col(idCol) :+
        shingles(col(textCol), shingleN).as("__sh")): _*)
      .withColumn("__sz", size(col("__sh")))
    val ex = capHotFingerprints(
      sized.select((blockCols.map(col) :+ col(idCol) :+ col("__sz") :+
        explode(col("__sh")).as("__s")): _*),
      maxShingleDf, blockCols :+ "__s")
    val a = ex.toDF(blockCols ++ Seq("id_a", "sz_a", "__s"): _*)
    val b = ex.toDF(blockCols ++ Seq("id_b", "sz_b", "__s"): _*)
    a.join(b, blockCols :+ "__s")
      .where(col("id_a") < col("id_b"))
      .groupBy((blockCols.map(col) :+ col("id_a") :+ col("sz_a") :+
        col("id_b") :+ col("sz_b")): _*)
      .agg(count(lit(1)).cast("double").as("__inter"))
      .withColumn("jaccard",
        round(col("__inter") / (col("sz_a") + col("sz_b") - col("__inter")), 6))
      .where(col("jaccard") >= threshold)
      .select((blockCols.map(col) :+ col("id_a") :+ col("id_b") :+ col("jaccard")): _*)
  }

  /** Asymmetric CONTAINMENT `|A∩B| / min(|A|,|B|)` per candidate pair —
    * the inclusion detector symmetric Jaccard misses: a short document
    * quoted wholesale inside a long one has Jaccard ≈ |A|/|B| (tiny) but
    * containment ≈ 1. Same blocked shingle-equi-join shape as
    * [[ngramJaccardPairs]] (only pairs sharing ≥1 shingle ever
    * materialize — never all-pairs); µ-scaled integer output so the
    * oracle replays hash-exact. Carries the same `maxShingleDf` hot-shingle
    * cap (and the same lower-bound contract: full-size denominator,
    * surviving-shingle numerator) — see [[ngramJaccardPairs]]. */
  def containmentPairs(df: DataFrame, blockCols: Seq[String],
                       thresholdMicro: Long, textCol: String = "text",
                       idCol: String = "doc_id", shingleN: Int = 3,
                       maxShingleDf: Int = 64): DataFrame = {
    val sized = graft.Tables.fanOut(df)
      .select((blockCols.map(col) :+ col(idCol) :+
        shingles(col(textCol), shingleN).as("__sh")): _*)
      .withColumn("__sz", size(col("__sh")))
    val ex = capHotFingerprints(
      sized.select((blockCols.map(col) :+ col(idCol) :+ col("__sz") :+
        explode(col("__sh")).as("__s")): _*),
      maxShingleDf, blockCols :+ "__s")
    val a = ex.toDF(blockCols ++ Seq("id_a", "sz_a", "__s"): _*)
    val b = ex.toDF(blockCols ++ Seq("id_b", "sz_b", "__s"): _*)
    a.join(b, blockCols :+ "__s")
      .where(col("id_a") < col("id_b"))
      .groupBy((blockCols.map(col) :+ col("id_a") :+ col("sz_a") :+
        col("id_b") :+ col("sz_b")): _*)
      .agg(count(lit(1)).as("__inter"))
      .withColumn("containment_micro",
        expr("(1000000 * __inter) DIV least(sz_a, sz_b)"))
      .where(col("containment_micro") >= thresholdMicro)
      .select((blockCols.map(col) :+ col("id_a") :+ col("id_b") :+
        col("containment_micro")): _*)
  }

  /** 16-bit SimHash from md5-derived token hashes: bit b is set iff the
    * majority of tokens have bit b set. Small width keeps the oracle SQL
    * tractable; the pure-Scala [[simhash64]] is the production-width twin. */
  def simhash16(text: Column): Column = {
    val toks = TextFunctions.tokens(lower(text))
    val tokHash = (t: Column) => TextFunctions.md5Bucket16(t).cast("int")
    (0 until 16).map { b =>
      val bitSum = aggregate(toks, lit(0),
        (acc, t) => acc + when(shiftright(tokHash(t), b).bitwiseAND(lit(1)) === 1, 1).otherwise(-1))
      when(bitSum >= 0, lit(1 << b)).otherwise(lit(0))
    }.reduce(_ + _)
  }

  /** 60-bit SimHash signatures over distinct n-gram shingles — the
    * production-width signature behind [[simhashNearDups]]. 60 bits = 15
    * hex chars of md5, the widest slice that stays inside a signed 64-bit
    * integer in every engine (no unsigned-cast divergence). Width matters:
    * the 16-bit [[simhash16]] collapses template-similar corpora (at sf0.1
    * it puts 1.7M doc pairs within hamming 3; this width: 135).
    *
    * Plan shape: explode shingles once, hash each shingle ONCE, fold all
    * 60 per-bit sums in a single partial+final hash aggregate — one pass,
    * map-side combined (60 HOF traversals per doc would re-hash every
    * shingle 60×). Docs with < n tokens have no shingles and take the
    * empty-input signature (every majority vote ties ≥ 0 → all bits set). */
  /** Signatures for the docs that HAVE shingles — the aggregation output
    * itself (docs with < shingleN tokens never enter the exploded stream,
    * so their absence needs no filter pass). [[simhashSigs60]] adds the
    * empty-input default back; [[simhashNearDups]] wants exactly this
    * frame. */
  private def simhashSigsPresent(df: DataFrame, idCol: String,
                                 textCol: String, shingleN: Int): DataFrame =
    simhashSigs60FromHashes(shingleMd5Frame(df, textCol, idCol, shingleN), idCol)

  /** 60-bit SimHash signatures over a precomputed [[shingleMd5Frame]] —
    * `md5Bucket60(shingle)` is exactly the first 15 hex chars of `bh`, so
    * the shared hash pass feeds this too. Present-only: docs absent from
    * `ex` (no shingles) have no row. */
  def simhashSigs60FromHashes(ex: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val hashed = ex.withColumn("__h",
      conv(substring(col("bh"), 1, 15), 16, 10).cast("long"))
    val bitSums = (0 until 60).map { b =>
      sum(when(shiftright(col("__h"), b).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"__b$b")
    }
    hashed.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
      .select(col(idCol),
        (0 until 60).map(b =>
          when(col(s"__b$b") >= 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  def simhashSigs60(df: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text", shingleN: Int = 3): DataFrame =
    df.select(col(idCol))
      .join(simhashSigsPresent(df, idCol, textCol, shingleN), Seq(idCol), "left_outer")
      // empty shingle list: every majority vote ties ≥ 0 → all bits set
      .select(col(idCol), coalesce(col("simhash"), lit((1L << 60) - 1L)).as("simhash"))

  /** SimHash near-duplicate pairs within `maxHamming` bit flips — the
    * pairing step the signature computation feeds. The 60-bit signature
    * splits into 4×15-bit bands; by pigeonhole, ≤ 3 differing bits leave at
    * least one band intact, so the band equi-join finds EVERY qualifying
    * pair (exact, not approximate) and `bit_count` verifies candidates.
    * Docs with NO shingles (< shingleN tokens) are EXCLUDED from pairing:
    * they all share the empty-input signature, so a corpus with k short
    * docs would otherwise emit all C(k,2) of them as hamming-0 "dups" and
    * pile into one band bucket quadratically.
    * Scale: the bucket exchange carries (id, sig) only — two longs — and
    * never goes all-pairs; band-bucket skew is data skew (identical
    * signatures), which is exactly the near-dup mass being sought. */
  def simhashNearDups(df: DataFrame, maxHamming: Int = 3, idCol: String = "doc_id",
                      textCol: String = "text", shingleN: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"the 4-band split is exact only for hamming <= 3, got $maxHamming")
    // present-only signatures: zero-shingle docs are excluded by
    // construction (no filter pass, no default-signature join)
    simhashNearDupsFromSigs(
      simhashSigsPresent(df, idCol, textCol, shingleN), maxHamming, idCol)
  }

  /** [[simhashNearDups]] over precomputed present-only `(id, simhash)`
    * signatures — callers holding the shared hash frame skip the
    * signature pass entirely. */
  def simhashNearDupsFromSigs(sigs: DataFrame, maxHamming: Int = 3,
                              idCol: String = "doc_id"): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"the 4-band split is exact only for hamming <= 3, got $maxHamming")
    // all 4 band keys from the computed signature in ONE pass (posexplode
    // of the band array) — a per-band union would re-run the whole
    // explode+aggregate signature job once per band per join side
    val banded = sigs.select(col(idCol), col("simhash"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("simhash"), b * 15).bitwiseAND(lit(0x7fffL))): _*))
        .as(Seq("band_idx", "band_val")))
    val a = banded.toDF("id_a", "sig_a", "band_idx", "band_val")
    val bb = banded.toDF("id_b", "sig_b", "band_idx", "band_val")
    a.join(bb, Seq("band_idx", "band_val"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sig_a", "sig_b").distinct()
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("long"))
      .where(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** 64-bit SimHash over token murmur hashes — pure Scala (for UDF use and
    * unit-level verification; not oracle-mirrored). */
  def simhash64(tokens: Seq[String]): Long = {
    val counts = new Array[Int](64)
    tokens.foreach { t =>
      val h = scala.util.hashing.MurmurHash3.stringHash(t).toLong << 32 |
        (scala.util.hashing.MurmurHash3.stringHash(t.reverse).toLong & 0xffffffffL)
      var b = 0
      while (b < 64) { counts(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1); b += 1 }
    }
    counts.zipWithIndex.foldLeft(0L) { case (acc, (c, b)) =>
      if (c >= 0) acc | (1L << b) else acc
    }
  }

  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    * local-fingerprinting scheme): hash every k-token gram, slide a window
    * of `w` consecutive gram hashes, select each window's minimum, emit
    * the distinct selected hashes as the document's fingerprint set.
    *
    * THE guarantee (what plain "sample every w-th shingle" lacks): any
    * shared token run of length ≥ k + w − 1 between two documents yields
    * at least one SHARED fingerprint — detection is position-independent
    * and deterministic, with expected density ~2/(w+1) of the grams.
    *
    * Scale shape: fingerprint extraction is a pure map-side HOF pass (the
    * token/gram-hash arrays are bound ONCE as lambda variables — the
    * PLANS.md q188 rule), so the corpus scan emits ~2/(w+1) of its grams;
    * overlap detection downstream is an equi-join on the fingerprint
    * hash, never all-pairs.
    *
    * Output: input columns minus `textCol`, plus one `fp` long per
    * distinct selected hash (docs shorter than k+w−1 tokens emit none). */
  def winnowingFingerprints(df: DataFrame, textCol: String = "text",
                            k: Int = 4, w: Int = 5): DataFrame = {
    require(k >= 1 && w >= 1, s"winnowing needs k,w >= 1, got k=$k w=$w")
    val minTok = k + w - 1
    // md5Bucket60 spelled as SQL so it lives inside the lambda: the same
    // 60-bit hash every oracle replays
    val fpArr = expr(
      s"""transform(array(filter(split(lower(`$textCol`), ' '), t -> t != '')), tkv ->
         |  CASE WHEN size(tkv) < $minTok THEN CAST(array() AS ARRAY<BIGINT>)
         |  ELSE array_distinct(
         |    transform(array(transform(sequence(1, size(tkv) - ${k - 1}), i ->
         |        CAST(conv(substring(md5(CAST(concat_ws(' ', slice(tkv, i, $k)) AS BINARY)), 1, 15), 16, 10) AS BIGINT))), hsv ->
         |      transform(sequence(1, size(hsv) - ${w - 1}), j -> array_min(slice(hsv, j, $w))))[0])
         |  END)[0]""".stripMargin)
    graft.Tables.fanOut(df).withColumn("__fps", fpArr).drop(textCol)
      .withColumn("fp", explode(col("__fps"))).drop("__fps")
  }

  /** Drop hot fingerprints — those shared by more than `maxDf` documents
    * within a blocking key — BEFORE any fingerprint self-join.
    *
    * Why: a boilerplate fingerprint shared by k documents materializes
    * C(k,2) pair rows in the pairing equi-join — quadratic in family
    * size. Capping document frequency bounds the per-fingerprint fan-out
    * at C(maxDf,2) regardless of corpus size (the q139 boilerplate-df /
    * q77 posting-cap precedent). A fingerprint that common carries no
    * near-dup signal anyway: it IS boilerplate by definition.
    *
    * Scale shape: the hot set is the df-filtered TAIL of one hash agg —
    * small by construction (only keys above the cap survive the filter) —
    * so the anti-join's build side stays broadcast-sized and the corpus
    * frame is never shuffled twice. The hot frame is eagerly
    * checkpointed, so the drop count logged below costs no extra pass.
    *
    * `keyCols` must name the pairing join's full blocking key (e.g.
    * Seq("source", "fp") when pairs are blocked per source): df counted
    * on a coarser key than the join would over-drop.
    *
    * PRECONDITION: `fps` carries at most ONE row per (document, key) —
    * df is the ROW count per key, which equals document frequency only
    * under that contract. [[winnowingFingerprints]] honors it
    * (array_distinct per doc); a caller with repeated (doc, key) rows
    * must dropDuplicates first or the repeats inflate df and over-drop.
    */
  def capHotFingerprints(fps: DataFrame, maxDf: Int,
                         keyCols: Seq[String] = Seq("fp")): DataFrame = {
    require(maxDf >= 1, s"capHotFingerprints needs maxDf >= 1, got $maxDf")
    require(keyCols.nonEmpty, "capHotFingerprints needs at least one key column")
    // uncapped by explicit request: no key can exceed Int.MaxValue rows,
    // so skip the df agg pass entirely (the exact-semantics opt-out of
    // ngramJaccardPairs/containmentPairs)
    if (maxDf == Int.MaxValue) return fps
    val keys = keyCols.map(col)
    val hot = fps.groupBy(keys: _*).agg(count(lit(1)).as("__df"))
      .where(col("__df") > maxDf)
      .localCheckpoint(true)
    val nHot = hot.count()
    if (nHot > 0) {
      // make the silently-lowered similarity VISIBLE to callers: how many
      // candidate-pair memberships the cap removes (sum of C(df,2) over
      // the hot keys — the exact in-block pair rows that no longer count
      // toward intersections). Free: the hot frame is already
      // checkpointed and tiny by construction.
      val dropped = hot.agg(
        sum(col("__df") * (col("__df") - 1) / 2).cast("long")).head.getLong(0)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"capHotFingerprints: dropping $nHot hot fingerprint keys " +
          s"(df > $maxDf) over (${keyCols.mkString(", ")}) before pairing — " +
          s"~$dropped pair-intersection contributions removed; similarity " +
          "on pairs sharing those keys is reported as a LOWER BOUND " +
          "(pass maxDf = Int.MaxValue for exact uncapped semantics)")
    }
    // using-column joins move the keys to the front; restore the caller's
    // column order so positional consumers (toDF renames) stay correct
    fps.join(hot.select(keys: _*), keyCols, "left_anti")
      .select(fps.columns.map(col): _*)
  }
}
