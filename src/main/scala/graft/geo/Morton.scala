package graft.geo

/** Z-order (Morton) curve: bit-interleave two grid indices into one long
  * whose integer order follows the space-filling curve. This is the real
  * mechanism behind ZORDER clustering (the reference relies on Delta's
  * `OPTIMIZE ... ZORDER BY`, `01_geofraud_clustering.py:440`): sort/range-
  * partition a table by the interleaved key and rows near each other in 2-D
  * land in the same file/row group, so a 2-D box lookup touches few row
  * groups in either dimension.
  *
  * The magic-mask spread is the standard O(log w) bit trick; every step is
  * 64-bit integer and replayed verbatim in DuckDB SQL (`Tables.mortonSql`),
  * so z-values hash-match the oracle exactly. */
object Morton {

  /** Low 31 bits of `x` spread to the even bit positions (0, 2, 4, …, 60). */
  def spread(x: Long): Long = {
    var v = x & 0x7FFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** Morton code of non-negative indices (i, j), i on even bits, j on odd —
    * 62-bit result, never negative for 31-bit inputs. Inputs are masked to
    * 31 bits (the contract is grid indices, which are far smaller). */
  def interleave(i: Long, j: Long): Long = spread(i) | (spread(j) << 1)

  /** Low 21 bits of `x` spread to every THIRD bit position (0, 3, …, 60)
    * — the standard 3-D magic-mask sequence. */
  def spread3(x: Long): Long = {
    var v = x & 0x1FFFFFL
    v = (v | (v << 32)) & 0x001F00000000FFFFL
    v = (v | (v << 16)) & 0x001F0000FF0000FFL
    v = (v | (v << 8)) & 0x100F00F00F00F00FL
    v = (v | (v << 4)) & 0x10C30C30C30C30C3L
    v = (v | (v << 2)) & 0x1249249249249249L
    v
  }

  /** 3-D Morton code of non-negative indices (i, j, k) — i on bits
    * 0,3,6…, j on 1,4,7…, k on 2,5,8… — a 63-bit result, never negative
    * for 21-bit inputs (the ZORDER ordinal width). */
  def interleave3(i: Long, j: Long, k: Long): Long =
    spread3(i) | (spread3(j) << 1) | (spread3(k) << 2)
}
