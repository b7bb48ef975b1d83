package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** NATIVE Catalyst aggregate — `hll_sketch(value_string, p)` — the
  * HyperLogLog distinct sketch as a `TypedImperativeAggregate`, the
  * second member of the native sketch family beside
  * [[KmvSketchAggregate]]. Registered via [[GraftExtensions]].
  *
  * Fully DETERMINISTIC and engine-replayable, unlike
  * `approx_count_distinct` (whose xxHash64/HLL++ internals no oracle can
  * re-derive): the hash is the project-wide md5Bucket60 convention
  * (first 60 bits of md5 of the UTF-8 string — lockstep with
  * `TextFunctions.md5Bucket60` and the KMV aggregate), the top `p` bits
  * pick a register, and the register keeps the max over
  * `rho(suffix)` = position of the highest set bit counted from the MSB
  * of the remaining `60-p` bits (all-zero suffix → `60-p+1`). An oracle
  * replays register construction with integer/string ops only
  * (`max(w - length(bin(suffix)) + 1)`) and the estimator from the
  * EXACT integer harmonic key `sum(2^(w+1-r))` (see `eval`) with two
  * pinned IEEE roundings, plus one `ln` in the small-range branch.
  *
  * Result: struct(`registers` STRING — comma-joined register values in
  * bucket order, `estimate` DOUBLE — bias-corrected harmonic-mean
  * estimate with the Flajolet small-range (linear counting) branch).
  *
  * Scale shape: the buffer is a FIXED 2^p-int array per group — partial
  * aggregation folds rows map-side, `merge` is an elementwise max, and
  * the exchange carries 2^p ints per group no matter how many rows fed
  * it — the textbook mergeable-sketch contract. */
case class HllSketchAggregate(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]]
  with BinaryLike[Expression] {

  private lazy val p: Int = right.eval(null) match {
    case i: Int => i
    case other => throw new IllegalArgumentException(
      s"hll_sketch: p must be an integer literal, got $other")
  }
  private def m: Int = 1 << p
  private def w: Int = 60 - p // suffix bit width under the 60-bit hash

  override def checkInputDataTypes(): TypeCheckResult = {
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"hll_sketch: value must be STRING (cast explicitly — the hash is " +
          s"defined on the string form), got ${left.dataType.catalogString}")
    else if (right.dataType != IntegerType || !right.foldable)
      TypeCheckResult.TypeCheckFailure("hll_sketch: p must be an INT literal")
    else if (p < 4 || p > 12)
      TypeCheckResult.TypeCheckFailure(s"hll_sketch: p must be in [4, 12], got $p")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = StructType(Seq(
    StructField("registers", StringType, nullable = false),
    StructField("estimate", DoubleType, nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "hll_sketch"

  /** Per-thread md5: MessageDigest is stateful and Expression instances
    * can be shared across concurrently running tasks. */
  @transient private lazy val digest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** First 60 bits of md5 — byte-for-byte `TextFunctions.md5Bucket60`. */
  private def md5Bucket60(bytes: Array[Byte]): Long = {
    val d = digest.get()
    d.reset()
    val h = d.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    (v << 4) | ((h(7) & 0xf0L) >> 4)
  }

  override def createAggregationBuffer(): Array[Int] = new Array[Int](m)

  override def update(buffer: Array[Int], input: InternalRow): Array[Int] = {
    val v = left.eval(input)
    if (v != null) {
      val h = md5Bucket60(v.asInstanceOf[UTF8String].getBytes)
      val bucket = (h >>> w).toInt
      val suffix = h & ((1L << w) - 1)
      // rho = leading-zero count WITHIN the w-bit suffix, plus one;
      // an all-zero suffix has no set bit → w + 1 (the HLL convention)
      val rho =
        if (suffix == 0L) w + 1
        else w - (64 - java.lang.Long.numberOfLeadingZeros(suffix)) + 1
      if (rho > buffer(bucket)) buffer(bucket) = rho
    }
    buffer
  }

  override def merge(buffer: Array[Int], other: Array[Int]): Array[Int] = {
    var i = 0
    while (i < m) {
      if (other(i) > buffer(i)) buffer(i) = other(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: Array[Int]): Any = {
    // alpha_m per Flajolet et al.; m >= 16 always (p >= 4)
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    // Harmonic sum as an EXACT integer: sum of 2^(w+1-r) over registers.
    // Every register r is in [0, w+1], so each term is a non-negative
    // power of two and the total is at most m * 2^(w+1) = 2^61 — inside
    // a signed long. Exact means order-independent, so an oracle replays
    // it with a plain integer SUM regardless of its aggregation order.
    var harmKey = 0L
    var zeros = 0
    var i = 0
    while (i < m) {
      harmKey += 1L << (w + 1 - buffer(i))
      if (buffer(i) == 0) zeros += 1
      i += 1
    }
    // raw = alpha*m^2/harm with harm = harmKey/2^(w+1). Pinned order:
    // ((alpha * m*m) * 2^(w+1)) / harmKey — the power-of-two multiply is
    // exact, leaving TWO IEEE roundings total, so any engine that
    // evaluates the same left-associated expression reproduces the bits.
    val raw = alpha * (m.toDouble * m.toDouble) *
      (1L << (w + 1)).toDouble / harmKey.toDouble
    val est =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else raw
    val regs = UTF8String.fromString(buffer.mkString(","))
    InternalRow(regs, est)
  }

  override def serialize(buffer: Array[Int]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 + m * 4)
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.length)
    var i = 0
    while (i < buffer.length) { out.writeInt(buffer(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val arr = new Array[Int](n)
    var i = 0
    while (i < n) { arr(i) = in.readInt(); i += 1 }
    arr
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketchAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketchAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HllSketchAggregate =
    copy(left = newLeft, right = newRight)
}

object HllSketchAggregate {
  /** Builder used by the [[GraftExtensions]] function registration. */
  def build(children: Seq[Expression]): Expression = {
    require(children.length == 2, "hll_sketch(value_string, p)")
    require(children(1).isInstanceOf[Literal], "hll_sketch: p must be a literal")
    HllSketchAggregate(children(0), children(1)).toAggregateExpression()
  }
}
