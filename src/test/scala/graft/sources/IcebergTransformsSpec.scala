package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.IcebergTransforms._

/** Value laws for the partition transforms. The bucket-hash vectors are
  * the Iceberg spec's own (Appendix B table) — matching them bit-for-bit
  * is what makes pruning against REAL tables' partition values sound. */
class IcebergTransformsSpec extends AnyFunSuite {

  test("bucket hash matches every Iceberg spec Appendix B vector") {
    assert(bucketHash("int", 34) === 2017239379)
    assert(bucketHash("long", 34L) === 2017239379) // int→long widening invariant
    assert(bucketHash("date",
      java.time.LocalDate.of(2017, 11, 16).toEpochDay) === -653330422)
    assert(bucketHash("time",
      (22L * 3600 + 31 * 60 + 8) * 1000000L) === -662762989)
    assert(bucketHash("timestamp",
      java.time.LocalDateTime.of(2017, 11, 16, 22, 31, 8)
        .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L) === -2047944441)
    assert(bucketHash("string", "iceberg") === 1210000089)
    assert(bucketHash("binary", Array[Byte](0, 1, 2, 3)) === -188683207)
  }

  test("bucket value is the non-negative remainder, stable across widths") {
    // spec: (hash & Int.MaxValue) % N — never negative, even for
    // negative hashes (string 'iceberg' hashes positive; date negative)
    val d = java.time.LocalDate.of(2017, 11, 16).toEpochDay
    assert(bucket(16, "date", d) === ((-653330422 & Int.MaxValue) % 16))
    assert(bucket(16, "date", d) >= 0)
    assert(bucket(1, "string", "anything") === 0)
    assertThrows[IllegalArgumentException](bucket(0, "int", 1))
  }

  test("bucket refuses float/double sources loudly") {
    // silent wrong hashes would prune LIVE files; spec forbids the types
    assertThrows[IllegalArgumentException](bucketHash("float", 1.0))
    assertThrows[IllegalArgumentException](bucketHash("double", 1.0))
  }

  test("truncate floors integers toward negative infinity") {
    assert(truncateLong(10, 37) === 30)
    assert(truncateLong(10, -1) === -10) // NOT 0 — the spec's floor modulo
    assert(truncateLong(10, -10) === -10)
    assert(truncateLong(86400000000L, 123456789012345L) ===
      (123456789012345L / 86400000000L) * 86400000000L)
  }

  test("truncate takes string prefixes by codepoint, not char") {
    assert(truncateString(3, "iceberg") === "ice")
    assert(truncateString(10, "ice") === "ice")
    // a surrogate pair (U+1F600) counts as ONE codepoint
    val s = "a😀b"
    assert(truncateString(2, s) === "a😀")
  }

  test("temporal buckets count from 1970 with calendar month math") {
    val us = java.time.LocalDateTime.of(2017, 11, 16, 22, 31, 8)
      .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
    assert(dayFromMicros(us) ===
      java.time.LocalDate.of(2017, 11, 16).toEpochDay)
    assert(hourFromMicros(us) === us / 3600000000L)
    assert(monthFromMicros(us) === (2017 - 1970) * 12 + 10)
    assert(yearFromMicros(us) === 47)
    // pre-epoch: floor, not round-toward-zero
    assert(dayFromMicros(-1L) === -1L)
    assert(monthFromDays(-1L) === -1L) // 1969-12-31 → month -1
    assert(yearFromDays(-1L) === -1L)
  }

  test("parse accepts spec spellings, plural history, and falls to Opaque") {
    assert(parse("identity") === Identity)
    assert(parse("bucket[16]") === Bucket(16))
    assert(parse("truncate[4]") === Truncate(4))
    assert(parse("day") === Day)
    assert(parse("days") === Day)
    assert(parse("hours") === Hour)
    assert(parse("void") === Opaque)
    assert(parse("zorder[2]") === Opaque) // future transform: keep, don't fail
  }

  test("transformedRange: identity passes through, opaque carries nothing") {
    assert(transformedRange(Identity, "long", 3L, 9L) ===
      Some((3L, 9L, "long")))
    assert(transformedRange(Opaque, "long", 3L, 9L) === None)
  }

  test("transformedRange: bucket carries equality points only") {
    val b = bucket(8, "long", 42L).toLong
    assert(transformedRange(Bucket(8), "long", 42L, 42L) ===
      Some((b, b, "int")))
    // a RANGE through a hash is meaningless — must refuse to prune
    assert(transformedRange(Bucket(8), "long", 1L, 2L) === None)
  }

  test("transformedRange: order-preserving transforms carry ranges") {
    assert(transformedRange(Truncate(10), "long", 37L, 55L) ===
      Some((30L, 50L, "long")))
    assert(transformedRange(Truncate(2), "string", "iceberg", "zebra") ===
      Some(("ic", "ze", "string")))
    val lo = java.time.LocalDateTime.of(2024, 1, 3, 5, 0)
      .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
    val hi = java.time.LocalDateTime.of(2024, 1, 7, 23, 0)
      .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
    assert(transformedRange(Day, "timestamp", lo, hi) ===
      Some((java.time.LocalDate.of(2024, 1, 3).toEpochDay,
        java.time.LocalDate.of(2024, 1, 7).toEpochDay, "date")))
    assert(transformedRange(Month, "timestamp", lo, hi) ===
      Some(((2024L - 1970) * 12, (2024L - 1970) * 12, "int")))
    assert(transformedRange(Year, "date", 19723L, 19752L) ===
      Some((54L, 54L, "int")))
    // day over a date column is already day-granular
    assert(transformedRange(Day, "date", 19723L, 19752L) ===
      Some((19723L, 19752L, "date")))
  }

  test("transformedRange soundness law: v in [lo,hi] implies t(v) in [t(lo),t(hi)]") {
    // the property pruning leans on, probed across the integer domain
    val rnd = new scala.util.Random(41)
    for (_ <- 1 to 2000) {
      val lo = rnd.nextLong() % 1000000L
      val hi = lo + math.abs(rnd.nextLong() % 1000000L)
      val v = lo + (math.abs(rnd.nextLong()) % (hi - lo + 1))
      for (t <- Seq(Truncate(7), Truncate(86400L))) {
        val Some((tLo: Long, tHi: Long, _)) = transformedRange(t, "long", lo, hi)
        val w = t.asInstanceOf[Truncate].w
        val tv = truncateLong(w, v)
        assert(tLo <= tv && tv <= tHi, s"$t $lo..$hi v=$v")
      }
      val Some((dLo: Long, dHi: Long, _)) =
        transformedRange(Day, "timestamp", lo, hi)
      val dv = dayFromMicros(v)
      assert(dLo <= dv && dv <= dHi)
    }
  }
}
