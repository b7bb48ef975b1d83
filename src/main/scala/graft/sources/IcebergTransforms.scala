package graft.sources

/** Iceberg partition-TRANSFORM evaluation — the value-domain half of
  * hidden partitioning (Iceberg spec "Partition Transforms" + Appendix B
  * "32-bit Hash Requirements"; geoscan-fraud reference has no table
  * tier, this is north-star scope like `sources/Iceberg.scala` itself).
  *
  * A partition spec field is `transform(sourceColumn) AS name`; data
  * files record the TRANSFORMED value. To prune on a raw-column
  * predicate the planner must evaluate the same transform the writer
  * did, bit-for-bit:
  *
  *  - `bucket[N]`: `(murmur3_x86_32(serialize(v)) & Int.MaxValue) % N`
  *    over the spec's single-value serialization (Appendix B pins test
  *    vectors, mirrored in IcebergTransformsSpec). NOT order-preserving:
  *    only an equality predicate can prune through it.
  *  - `truncate[W]`: floor-to-width for integers, codepoint-prefix for
  *    strings. Order-preserving, so range predicates prune.
  *  - `year`/`month`/`day`/`hour`: calendar buckets of a timestamp
  *    (micros) or date (days), counted from 1970. Order-preserving.
  *
  * Everything here is pure value math — driver-side planning altitude,
  * no Spark types. */
object IcebergTransforms {

  /** Reference murmur3_x86_32 (Austin Appleby's public-domain MurmurHash3,
    * the exact function the Iceberg spec requires for `bucket`). Seed 0
    * per spec. Implemented from the published algorithm rather than
    * borrowed from a JVM library so tail handling and finalization are
    * pinned by OUR spec vectors, not a library's versioned quirks. */
  def murmur3x86_32(bytes: Array[Byte], seed: Int = 0): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    var h = seed
    val n4 = (bytes.length / 4) * 4
    var i = 0
    while (i < n4) {
      var k = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8) |
        ((bytes(i + 2) & 0xff) << 16) | ((bytes(i + 3) & 0xff) << 24)
      k *= c1; k = Integer.rotateLeft(k, 15); k *= c2
      h ^= k; h = Integer.rotateLeft(h, 13); h = h * 5 + 0xe6546b64
      i += 4
    }
    var k = 0
    (bytes.length & 3) match {
      case 3 =>
        k = (bytes(n4 + 2) & 0xff) << 16
        k |= (bytes(n4 + 1) & 0xff) << 8
        k |= bytes(n4) & 0xff
      case 2 =>
        k = (bytes(n4 + 1) & 0xff) << 8
        k |= bytes(n4) & 0xff
      case 1 =>
        k = bytes(n4) & 0xff
      case _ => ()
    }
    if ((bytes.length & 3) != 0) {
      k *= c1; k = Integer.rotateLeft(k, 15); k *= c2
      h ^= k
    }
    h ^= bytes.length
    h ^= h >>> 16
    h *= 0x85ebca6b
    h ^= h >>> 13
    h *= 0xc2b2ae35
    h ^= h >>> 16
    h
  }

  /** Appendix-B single-value serialization feeding the bucket hash:
    * every integer-family value (int, long, date-days, time/timestamp
    * micros) hashes as its LONG's 8 little-endian bytes — the spec's
    * int→long widening is what makes `bucket[N](id)` stable across an
    * int→long column promotion. Strings hash raw UTF-8. float/double
    * are NOT legal bucket sources (spec) — loud refusal, because a
    * silent wrong hash would prune live files. */
  def bucketHash(typ: String, v: Any): Int = (typ, v) match {
    case ("int" | "long" | "date" | "time" | "timestamp" | "timestamptz", n: Number) =>
      val l = n.longValue
      val b = java.nio.ByteBuffer.allocate(8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(l).array()
      murmur3x86_32(b)
    case ("string", s: String) =>
      murmur3x86_32(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    case ("binary" | "fixed", b: Array[Byte]) => murmur3x86_32(b)
    case _ => throw new IllegalArgumentException(
      s"bucket transform has no defined hash for iceberg type '$typ' / " +
        s"value class ${v.getClass.getName} (float/double are not legal " +
        "bucket sources; pass Int/Long for integer and temporal columns, " +
        "String for string)")
  }

  /** `bucket[n]` partition value: non-negative remainder of the hash. */
  def bucket(n: Int, typ: String, v: Any): Int = {
    require(n > 0, s"bucket[$n]: width must be positive")
    (bucketHash(typ, v) & Integer.MAX_VALUE) % n
  }

  /** `truncate[w]` for the integer family: floor to the width (the spec's
    * `v - (v % w)` with Python-style modulo — floorDiv keeps negatives
    * on the correct side: truncate[10](-1) = -10, not 0). */
  def truncateLong(w: Long, v: Long): Long = {
    require(w > 0, s"truncate[$w]: width must be positive")
    Math.floorDiv(v, w) * w
  }

  /** `truncate[w]` for strings: the first `w` Unicode CODEPOINTS (spec
    * wording), not chars — a surrogate pair counts once. */
  def truncateString(w: Int, s: String): String = {
    require(w > 0, s"truncate[$w]: width must be positive")
    val cps = s.codePointCount(0, s.length)
    if (cps <= w) s else s.substring(0, s.offsetByCodePoints(0, w))
  }

  private val MicrosPerDay = 86400000000L
  private val MicrosPerHour = 3600000000L

  /** `day(timestamp-micros)` → days from 1970-01-01 (the partition field
    * is date-typed). floorDiv: pre-epoch timestamps land on the day they
    * belong to, not the one after. */
  def dayFromMicros(us: Long): Long = Math.floorDiv(us, MicrosPerDay)

  /** `hour(timestamp-micros)` → hours from 1970-01-01T00:00. */
  def hourFromMicros(us: Long): Long = Math.floorDiv(us, MicrosPerHour)

  /** `month(date-days)` → months from 1970-01 (java.time calendar math —
    * month lengths are not arithmetic). */
  def monthFromDays(days: Long): Long = {
    val d = java.time.LocalDate.ofEpochDay(days)
    (d.getYear - 1970).toLong * 12 + (d.getMonthValue - 1)
  }

  def monthFromMicros(us: Long): Long = monthFromDays(dayFromMicros(us))

  /** `year(date-days)` → years from 1970. */
  def yearFromDays(days: Long): Long =
    (java.time.LocalDate.ofEpochDay(days).getYear - 1970).toLong

  def yearFromMicros(us: Long): Long = yearFromDays(dayFromMicros(us))

  // ------------------------------------------------------------------
  // Parsed transform + range mapping (what the pruner consumes)
  // ------------------------------------------------------------------

  sealed trait Transform
  case object Identity extends Transform
  final case class Bucket(n: Int) extends Transform
  final case class Truncate(w: Long) extends Transform
  case object Year extends Transform
  case object Month extends Transform
  case object Day extends Transform
  case object Hour extends Transform
  /** `void`, or a transform this planner does not know — pruning through
    * it is impossible, so the caller must KEEP (sound). */
  case object Opaque extends Transform

  private val BucketPat = """bucket\[(\d+)\]""".r
  private val TruncatePat = """truncate\[(\d+)\]""".r

  /** Spec spellings plus the historical plural forms some writers
    * emitted (`days` for `day`, …). Unknown names parse as [[Opaque]] —
    * a reader must tolerate future transforms by not pruning through
    * them, never by failing the whole scan. */
  def parse(t: String): Transform = t match {
    case "identity" => Identity
    case BucketPat(n) => Bucket(n.toInt)
    case TruncatePat(w) => Truncate(w.toLong)
    case "year" | "years" => Year
    case "month" | "months" => Month
    case "day" | "days" => Day
    case "hour" | "hours" => Hour
    case _ => Opaque
  }

  /** Map a raw-column closed range `[lo, hi]` (comparison domain: Long /
    * Double / String, endpoints already type-checked by the caller)
    * through `transform` of a `typ`-typed source column. Returns the
    * transformed closed range plus the iceberg type that DECODES the
    * partition field's stored bounds, or None when the transform cannot
    * carry this predicate (bucket over a non-point range, opaque, a
    * type the transform is not defined on) — None means "cannot prune
    * here", which is always sound.
    *
    * Soundness per case: truncate and the temporal buckets are
    * order-preserving, so `v ∈ [lo, hi] ⇒ t(v) ∈ [t(lo), t(hi)]`;
    * bucket is not, so only `lo == hi` maps (to the point bucket). */
  def transformedRange(transform: Transform, typ: String, lo: Any, hi: Any)
      : Option[(Any, Any, String)] = transform match {
    case Identity => Some((lo, hi, typ))
    case Bucket(n) =>
      if (lo == hi) {
        val b = bucket(n, typ, lo).toLong
        Some((b, b, "int"))
      } else None
    case Truncate(w) => (typ, lo, hi) match {
      case ("int" | "long", l: java.lang.Long, h: java.lang.Long) =>
        Some((truncateLong(w, l), truncateLong(w, h), typ))
      case ("string", l: String, h: String) =>
        require(w <= Int.MaxValue, s"truncate[$w] on a string column")
        Some((truncateString(w.toInt, l), truncateString(w.toInt, h), "string"))
      case _ => None
    }
    case Day => typ match {
      case "timestamp" | "timestamptz" =>
        (lo, hi) match {
          case (l: java.lang.Long, h: java.lang.Long) =>
            Some((dayFromMicros(l), dayFromMicros(h), "date"))
          case _ => None
        }
      case "date" => Some((lo, hi, "date")) // already day-granular
      case _ => None
    }
    case Hour => typ match {
      case "timestamp" | "timestamptz" =>
        (lo, hi) match {
          case (l: java.lang.Long, h: java.lang.Long) =>
            Some((hourFromMicros(l), hourFromMicros(h), "int"))
          case _ => None
        }
      case _ => None
    }
    case Month => (typ, lo, hi) match {
      case ("timestamp" | "timestamptz", l: java.lang.Long, h: java.lang.Long) =>
        Some((monthFromMicros(l), monthFromMicros(h), "int"))
      case ("date", l: java.lang.Long, h: java.lang.Long) =>
        Some((monthFromDays(l), monthFromDays(h), "int"))
      case _ => None
    }
    case Year => (typ, lo, hi) match {
      case ("timestamp" | "timestamptz", l: java.lang.Long, h: java.lang.Long) =>
        Some((yearFromMicros(l), yearFromMicros(h), "int"))
      case ("date", l: java.lang.Long, h: java.lang.Long) =>
        Some((yearFromDays(l), yearFromDays(h), "int"))
      case _ => None
    }
    case Opaque => None
  }
}
