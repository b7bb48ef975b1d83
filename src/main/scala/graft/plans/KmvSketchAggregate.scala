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

/** NATIVE Catalyst aggregate — `kmv_sketch(value_string, k)` — the
  * K-minimum-values distinct sketch as a `TypedImperativeAggregate`,
  * completing the extension ladder at the AGGREGATE level (scalar
  * expressions: geo_cell/vec_dot/z_order/nfc_normalize; whole operators:
  * the native as-of join; now a native aggregate with partial/merge
  * state). Registered via [[GraftExtensions]], so plain SQL callers get
  * the same auditable sketch as [[graft.sketch.Kmv]]:
  *
  *   SELECT event_type, kmv_sketch(CAST(user_id AS STRING), 64) AS sk ...
  *
  * Contract (lockstep with `Kmv.sketchState` and `Kmv.sketchSql`, pinned
  * by KmvNativeSpec): hash = first 60 bits of md5 of the UTF-8 string
  * (exactly `TextFunctions.md5Bucket60`), buffer = bounded TreeSet of the
  * k smallest DISTINCT hashes, result = (n_kept, kth_hash). NULLs drop.
  *
  * Scale shape: this IS the two-level bounded aggregation the DataFrame
  * spelling hand-builds — Spark's partial aggregation folds rows into the
  * ≤ k-long buffer map-side, `serialize`/`merge` carry ≤ k·8 bytes per
  * group through the exchange, and the estimate stays a closed-form
  * projection over (n_kept, kth_hash). */
case class KmvSketchAggregate(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with BinaryLike[Expression] {

  private lazy val k: Int = right.eval(null) match {
    case i: Int => i
    case other => throw new IllegalArgumentException(
      s"kmv_sketch: k must be an integer literal, got $other")
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"kmv_sketch: value must be STRING (cast explicitly — the hash is " +
          s"defined on the string form), got ${left.dataType.catalogString}")
    else if (right.dataType != IntegerType || !right.foldable)
      TypeCheckResult.TypeCheckFailure("kmv_sketch: k must be an INT literal")
    else if (k < 2)
      TypeCheckResult.TypeCheckFailure(s"kmv_sketch: k must be >= 2, got $k")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_kept", LongType, nullable = false),
    StructField("kth_hash", LongType, nullable = true)))
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_sketch"

  /** Per-thread md5: MessageDigest is stateful and Expression instances
    * can be shared across concurrently running tasks. */
  @transient private lazy val digest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** First 60 bits of md5 — byte-for-byte `TextFunctions.md5Bucket60`:
    * lowercase-hex digest, first 15 chars, parsed base 16. */
  private def md5Bucket60(bytes: Array[Byte]): Long = {
    val d = digest.get()
    d.reset()
    val h = d.digest(bytes)
    // first 15 hex chars = 7.5 bytes: 7 full bytes + the high nibble of
    // the 8th — identical to parsing substr(hex, 1, 15)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    (v << 4) | ((h(7) & 0xf0L) >> 4)
  }

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buffer: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = left.eval(input)
    if (v != null) {
      buffer.add(md5Bucket60(v.asInstanceOf[UTF8String].getBytes))
      if (buffer.size > k) buffer.pollLast()
    }
    buffer
  }

  override def merge(buffer: java.util.TreeSet[java.lang.Long],
                     other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) {
      buffer.add(it.next())
      if (buffer.size > k) buffer.pollLast()
    }
    buffer
  }

  override def eval(buffer: java.util.TreeSet[java.lang.Long]): Any =
    if (buffer.isEmpty) InternalRow(0L, null)
    else InternalRow(buffer.size.toLong, buffer.last.longValue)

  override def serialize(buffer: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 + buffer.size * 8)
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    val it = buffer.iterator()
    while (it.hasNext) out.writeLong(it.next().longValue)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val set = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { set.add(in.readLong()); i += 1 }
    set
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvSketchAggregate =
    copy(left = newLeft, right = newRight)
}

object KmvSketchAggregate {
  /** Builder used by the [[GraftExtensions]] function registration. */
  def build(children: Seq[Expression]): Expression = {
    require(children.length == 2, "kmv_sketch(value_string, k)")
    require(children(1).isInstanceOf[Literal], "kmv_sketch: k must be a literal")
    KmvSketchAggregate(children(0), children(1)).toAggregateExpression()
  }
}
