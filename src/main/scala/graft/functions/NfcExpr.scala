package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization — the canonical-composition pass a
  * multilingual dedup key needs: "é" (U+00E9) and "e"+U+0301 are the same
  * text to a reader but different bytes to every hash in the dedup tier,
  * so un-normalized corpora leak visually-identical duplicates straight
  * through exact, MinHash, and CDC dedup alike. Spark ships no normalizer
  * builtin; this is a native codegen expression over the JDK's
  * `java.text.Normalizer` (Unicode 15 canonical composition — the same
  * standard DuckDB's `nfc_normalize` implements, which is what makes the
  * operator oracle-checkable across engines).
  *
  * The ASCII fast path matters at scale: `Normalizer.isNormalized` is a
  * cheap scan that avoids the String round-trip entirely for the vast
  * majority of web text, so the expression adds ~nothing to an
  * already-NFC corpus.
  */
object NfcKernel {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Native expression for [[NfcKernel.nfc]]. Input: string. Output: string. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nfc_normalize expects string, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    NfcKernel.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcKernel.nfc($c)")

  override def prettyName: String = "nfc_normalize"

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Column-API wrapper. */
  def apply(text: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(text)))
}
