package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization helper — kept in a standalone object (no
  * companion class) so generated code can call it as a plain static. */
object NfcNormalize {
  private val NFC = java.text.Normalizer.Form.NFC

  /** NFC-normalize; already-normalized inputs (the overwhelmingly common
    * case in a clean corpus) return the SAME UTF8String — no copy. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, NFC)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, NFC))
  }
}

/** Native codegen expression for `nfc_normalize(text)` — canonical Unicode
  * composition (NFC), the text-pipeline normalization pass run before
  * tokenization/dedup so that visually-identical strings ("é" vs "e"+U+0301)
  * hash and compare equal. A first-class scalar keeps the pass inside
  * WholeStageCodegen over the full corpus scan (a UDF would break the
  * codegen span and add serde per row); the `isNormalized` fast path makes
  * the already-clean common case allocation-free.
  *
  * Cross-engine: DuckDB's `nfc_normalize` implements the same Unicode
  * canonical composition, so results are oracle-exact. */
case class NfcNormalizeExpression(child: Expression) extends UnaryExpression {

  override def prettyName: String = "nfc_normalize"
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects string, got ${other.simpleString}")
  }

  override protected def nullSafeEval(s: Any): Any =
    NfcNormalize.normalize(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.NfcNormalize.normalize($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
