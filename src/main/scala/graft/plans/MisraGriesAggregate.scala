package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** NATIVE Catalyst aggregate — `mg_topk(item_string, k)` — the
  * Misra–Gries frequent-items summary as a `TypedImperativeAggregate`,
  * the third member of the native-aggregate family (kmv_sketch,
  * hll_sketch). Registered via [[GraftExtensions]]:
  *
  *   SELECT mg_topk(token, 128) FROM toks
  *
  * Returns the candidate item set (lexicographically sorted
  * ARRAY&lt;STRING&gt;). The summary keeps at most `k` counters; update is
  * the classic decrement-on-overflow, merge is the Agarwal et al.
  * ("Mergeable Summaries", PODS 2012) combine: sum counters, subtract the
  * (k+1)-th largest count, drop non-positives. The merged summary keeps
  * the MG error bound whatever the merge order, so the one law callers
  * may rely on — '''every item with true frequency &gt; n/(k+1) is in the
  * candidate set''' — holds under Spark's nondeterministic partial-merge
  * order. Counter VALUES (and low-frequency stragglers) are
  * order-dependent, which is why this evaluates to the candidate set
  * only: the deterministic spelling is candidates → exact re-count join →
  * threshold filter (q212), where the sketch bounds the re-count join to
  * ≤ k keys however big the corpus.
  *
  * Scale shape: partial aggregation folds rows into the ≤ k-counter map
  * map-side; `serialize`/`merge` carry ≤ k (string, long) pairs per group
  * through the exchange. NULL items drop. */
case class MisraGriesAggregate(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Long]]
  with BinaryLike[Expression] {

  private lazy val k: Int = right.eval(null) match {
    case i: Int => i
    case other => throw new IllegalArgumentException(
      s"mg_topk: k must be an integer literal, got $other")
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"mg_topk: item must be STRING (cast explicitly), got ${left.dataType.catalogString}")
    else if (right.dataType != IntegerType || !right.foldable)
      TypeCheckResult.TypeCheckFailure("mg_topk: k must be an INT literal")
    else if (k < 1)
      TypeCheckResult.TypeCheckFailure(s"mg_topk: k must be >= 1, got $k")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "mg_topk"

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  override def update(buffer: java.util.HashMap[String, Long],
                      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = left.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      val cur = buffer.get(item)
      if (cur != 0L || buffer.containsKey(item)) buffer.put(item, cur + 1L)
      else if (buffer.size < k) buffer.put(item, 1L)
      else {
        // decrement-all: amortized O(1) per update (each decrement pays
        // back an earlier increment), O(k) worst-case per call
        val it = buffer.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    buffer
  }

  override def merge(buffer: java.util.HashMap[String, Long],
                     other: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = buffer.get(e.getKey)
      buffer.put(e.getKey, cur + e.getValue)
    }
    if (buffer.size > k) {
      // subtract the (k+1)-th largest count, drop non-positives — leaves
      // ≤ k survivors and preserves the summed error bound
      val counts = new Array[Long](buffer.size)
      var i = 0
      val vs = buffer.values().iterator()
      while (vs.hasNext) { counts(i) = vs.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val sub = counts(counts.length - (k + 1)) // (k+1)-th largest
      val es = buffer.entrySet().iterator()
      while (es.hasNext) {
        val e = es.next()
        if (e.getValue <= sub) es.remove() else e.setValue(e.getValue - sub)
      }
    }
    buffer
  }

  override def eval(buffer: java.util.HashMap[String, Long]): Any = {
    val items = new Array[AnyRef](buffer.size)
    var i = 0
    val ks = buffer.keySet().iterator()
    while (ks.hasNext) { items(i) = UTF8String.fromString(ks.next()); i += 1 }
    java.util.Arrays.sort(items, (a: AnyRef, b: AnyRef) =>
      a.asInstanceOf[UTF8String].compareTo(b.asInstanceOf[UTF8String]))
    new GenericArrayData(items)
  }

  override def serialize(buffer: java.util.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    val it = buffer.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      // length-prefixed UTF-8, not writeUTF: modified-UTF-8 caps one
      // string at 64 KiB and a general SQL caller can aggregate arbitrary
      // strings (an unbroken base64 blob as a "token" must not kill the
      // shuffle)
      val kb = e.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(kb.length)
      out.write(kb)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = new java.util.HashMap[String, Long](n * 2)
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      m.put(new String(kb, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MisraGriesAggregate =
    copy(left = newLeft, right = newRight)
}

object MisraGriesAggregate {
  /** Builder used by the [[GraftExtensions]] function registration. */
  def build(children: Seq[Expression]): Expression = {
    require(children.length == 2, "mg_topk(item_string, k)")
    require(children(1).isInstanceOf[Literal], "mg_topk: k must be a literal")
    MisraGriesAggregate(children(0), children(1)).toAggregateExpression()
  }
}
