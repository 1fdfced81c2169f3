package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen expression — canonical
  * composition ("e" + U+0301 → "é") so that byte-level operators downstream
  * (md5 dedup A9, shingling, tokenization) treat canonically-equal text as
  * equal. The reference normalizes whitespace only (ingestion_utils.py:31);
  * a multi-source 100 TB corpus also needs codepoint-level canonicalization
  * before hash-based dedup, or visually identical documents hash apart.
  *
  * Evaluation fast-path: `Normalizer.isNormalized` is a scan without
  * allocation, and real-world text is overwhelmingly already NFC — the
  * common case costs one pass and returns the input UTF8String unchanged
  * (no copy); only denormalized strings pay the compose-and-re-encode.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nfc_normalize expects string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"graft.expressions.NfcNormalize$$.MODULE$$.nfc($s)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "nfc_normalize"
}

object NfcNormalize {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
