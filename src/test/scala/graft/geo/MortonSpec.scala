package graft.geo

import org.scalatest.funsuite.AnyFunSuite

class MortonSpec extends AnyFunSuite {

  /** Reference implementation: one bit at a time. */
  private def naive(i: Long, j: Long): Long = {
    var r = 0L
    var b = 0
    while (b < 31) {
      r |= ((i >> b) & 1L) << (2 * b)
      r |= ((j >> b) & 1L) << (2 * b + 1)
      b += 1
    }
    r
  }

  test("magic-mask interleave matches the naive bit loop on edges and randoms") {
    val edges = Seq(0L, 1L, 2L, 3L, 12345L, (1L << 16) - 1, 1L << 16, (1L << 31) - 1)
    for (i <- edges; j <- edges)
      assert(Morton.interleave(i, j) == naive(i, j), s"($i, $j)")
    val rng = new scala.util.Random(7)
    for (_ <- 1 to 2000) {
      val i = rng.nextLong() & 0x7FFFFFFFL
      val j = rng.nextLong() & 0x7FFFFFFFL
      assert(Morton.interleave(i, j) == naive(i, j), s"($i, $j)")
    }
  }

  test("inputs above 31 bits are masked, result never negative") {
    assert(Morton.interleave(-1L, -1L) == Morton.interleave((1L << 31) - 1, (1L << 31) - 1))
    assert(Morton.interleave((1L << 31) - 1, (1L << 31) - 1) >= 0L)
  }

  test("locality: an aligned 2^k x 2^k block occupies one contiguous z range") {
    // all cells with i, j < 2^15 sort before any cell outside that block
    assert(Morton.interleave((1L << 15) - 1, (1L << 15) - 1) < (1L << 30))
    assert(Morton.interleave(1L << 15, 0L) >= (1L << 30))
    assert(Morton.interleave(0L, 1L << 15) >= (1L << 30))
  }

  /** Naive 3-D reference interleave. */
  private def naive3(i: Long, j: Long, k: Long): Long = {
    var r = 0L
    var b = 0
    while (b < 21) {
      r |= ((i >> b) & 1L) << (3 * b)
      r |= ((j >> b) & 1L) << (3 * b + 1)
      r |= ((k >> b) & 1L) << (3 * b + 2)
      b += 1
    }
    r
  }

  test("3-D magic-mask interleave matches the naive bit loop; unit vectors exact") {
    assert(Morton.interleave3(1, 0, 0) == 1L)
    assert(Morton.interleave3(0, 1, 0) == 2L)
    assert(Morton.interleave3(0, 0, 1) == 4L)
    assert(Morton.spread3((1L << 21) - 1) == 0x1249249249249249L)
    val edges = Seq(0L, 1L, 2L, 3L, 12345L, (1L << 10) - 1, 1L << 10, (1L << 21) - 1)
    for (i <- edges; j <- edges; k <- edges)
      assert(Morton.interleave3(i, j, k) == naive3(i, j, k), s"($i, $j, $k)")
    val rng = new scala.util.Random(11)
    for (_ <- 1 to 2000) {
      val i = rng.nextLong() & 0x1FFFFFL
      val j = rng.nextLong() & 0x1FFFFFL
      val k = rng.nextLong() & 0x1FFFFFL
      assert(Morton.interleave3(i, j, k) == naive3(i, j, k), s"($i, $j, $k)")
    }
    // 21-bit masking; never negative (63-bit result)
    assert(Morton.interleave3(-1L, -1L, -1L) ==
      Morton.interleave3((1L << 21) - 1, (1L << 21) - 1, (1L << 21) - 1))
    assert(Morton.interleave3((1L << 21) - 1, (1L << 21) - 1, (1L << 21) - 1) >= 0L)
  }
}
