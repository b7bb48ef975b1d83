package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines
  * (BASELINE.json north-star): language ID, quality scoring, token counting,
  * fingerprinting. All built from codegen'd built-ins (no UDFs) and kept
  * deliberately SQL-mirrorable so every operator has an exact DuckDB oracle.
  *
  * The TF-IDF shape reuses the reference's scoring chain verbatim
  * (`01_geofraud_clustering.py:386-418`) — see `GeoFraudPipeline.tfidfTiles`.
  */
object TextFunctions {

  /** Whitespace tokens, empty strings dropped (split on single space —
    * deterministic across engines, unlike locale-aware \\s classes). */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= lit(""))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Word bigrams of the lowercased text, NON-distinct (unlike
    * [[graft.dedup.Dedup.shingles]]) — repetition scoring needs the
    * multiplicity of each bigram, not the set. */
  def bigrams(text: Column): Column = {
    val toks = tokens(lower(text))
    val cnt = size(toks) - 1
    when(cnt >= 1,
      transform(sequence(lit(1), cnt), i => concat_ws(" ", slice(toks, i, lit(2)))))
      .otherwise(array().cast("array<string>"))
  }

  /** BPE-ish subword count estimate: whitespace tokens + extra units for
    * long words (a word of n chars ≈ ceil(n/4) subwords) — the cheap
    * pre-tokenization cost model used when budgeting LLM training data. */
  def subwordCountEstimate(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => acc + greatest(ceil(length(t).cast("double") / 4.0).cast("long"), lit(1L)))

  /** Fraction of non-alphanumeric, non-space characters. */
  def punctRatio(text: Column): Column =
    round(length(regexp_replace(text, "[a-zA-Z0-9 ]", "")).cast("double") /
      greatest(length(text), lit(1)).cast("double"), 6)

  /** Mean token length in characters. */
  def avgWordLen(text: Column): Column = {
    val toks = tokens(text)
    round(aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
      greatest(size(toks), lit(1)).cast("double"), 6)
  }

  def stopwordHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => words.map(w => t === lit(w)).reduce(_ || _)))

  val EnStop = Seq("the", "and", "of", "to", "is")
  val DeStop = Seq("der", "die", "und", "das", "ist")
  val FrStop = Seq("le", "et", "les", "des", "une")
  val EsStop = Seq("el", "y", "los", "que", "una")

  /** Fraction of tokens that are (English) stopwords. */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(lower(text))
    round(stopwordHits(toks, EnStop).cast("double") /
      greatest(size(toks), lit(1)).cast("double"), 6)
  }

  /** N-gram-heuristic language ID over {en,de,fr,es}: most stopword votes
    * wins, ties broken in that fixed order. (A 'zh'-style CJK check would
    * key on script range — out of the latin testdata's scope.) */
  def langId(text: Column): Column = {
    val toks = tokens(lower(text))
    val en = stopwordHits(toks, EnStop)
    val de = stopwordHits(toks, DeStop)
    val fr = stopwordHits(toks, FrStop)
    val es = stopwordHits(toks, EsStop)
    when(en >= de && en >= fr && en >= es, "en")
      .when(de >= fr && de >= es, "de")
      .when(fr >= es, "fr")
      .otherwise("es")
  }

  /** Composite quality score in [0,1]: stopword signal + low punctuation +
    * reasonable word lengths. Deterministic arithmetic, oracle-mirrorable. */
  def qualityScore(text: Column): Column =
    round(lit(0.4) * stopwordRatio(text) +
      lit(0.3) * (lit(1.0) - punctRatio(text)) +
      lit(0.3) * least(avgWordLen(text) / lit(8.0), lit(1.0)), 6)

  /** Content fingerprint: md5 of lowercased text (the exact-dedup key). */
  def fingerprintMd5(text: Column): Column = md5(lower(text).cast("binary"))

  /** First 16 bits of md5(salt||s) as a long — the cross-engine stable
    * bucket hash behind hash-splitting and SimHash bit extraction. Keep in
    * lockstep with [[md5Bucket16Sql]]: the two must stay bit-identical or
    * every oracle built on them diverges. */
  def md5Bucket16(c: Column, salt: String = ""): Column =
    conv(substring(md5(concat(lit(salt), c).cast("binary")), 1, 4), 16, 10).cast("long")

  /** DuckDB twin of [[md5Bucket16]] over SQL expression `e`. */
  def md5Bucket16Sql(e: String, salt: String = ""): String =
    if (salt.isEmpty) s"CAST(('0x' || substr(md5($e), 1, 4)) AS INTEGER)"
    else s"CAST(('0x' || substr(md5('$salt' || $e), 1, 4)) AS INTEGER)"

  /** [[md5Bucket16]] at signature width: first 60 bits (15 hex chars) of
    * md5 — the widest md5 slice that stays inside a SIGNED 64-bit integer
    * in every engine (no unsigned-cast divergence). Lockstep with
    * [[md5Bucket60Sql]]. */
  def md5Bucket60(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** DuckDB twin of [[md5Bucket60]] over SQL expression `e`. */
  def md5Bucket60Sql(e: String): String =
    s"(CAST(('0x' || substr(md5($e), 1, 15)) AS BIGINT))"

  /** PII patterns, spelled with explicit character classes only (no \d, \w,
    * or anchors) so the Java-regex and RE2 (DuckDB) engines match the exact
    * same spans — keep in lockstep with the SQL twins in the q79 oracle. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
  val LongNumberPattern = "[0-9]{7,}" // phone/account/SSN-shaped digit runs

  /** Scrub emails then long digit runs — the pre-training PII pass. Order
    * matters: the email pass removes '@'-adjacent digits first so a digits
    * run inside an address is redacted as part of the email, not as a
    * number. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailPattern, "<EMAIL>"),
      LongNumberPattern, "<NUM>")

  def countEmails(text: Column): Column =
    size(regexp_extract_all(text, lit(EmailPattern), lit(0)))

  /** Polynomial rolling hash (Rabin-Karp style, mod 2^61-1) — the
    * streaming-friendly fingerprint; pure Scala, order-sensitive. */
  def rollingHash(s: String): Long = {
    val Mod = (1L << 61) - 1
    val Base = 1000003L
    var h = 0L
    var i = 0
    while (i < s.length) {
      // multiply mod 2^61-1 without overflow via Math.multiplyHigh
      val lo = h * Base
      val hi = Math.multiplyHigh(h, Base)
      h = ((lo & Mod) + ((hi << 3) | (lo >>> 61)) + s.charAt(i).toLong) % Mod
      i += 1
    }
    h
  }

  val rollingHashUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((s: String) => rollingHash(if (s == null) "" else s))
}
