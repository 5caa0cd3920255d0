package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Row-local tail of duplicate-span REMOVAL (ExactSubstr's delete step,
  * Lee et al. 2022): given a document and the 1-based token positions of
  * its removable l-gram starts, rebuild the cleaned text in ONE pass.
  *
  * This replaces a three-shuffle Column composition (covered-position
  * explode + distinct, full corpus token posexplode + anti-join, per-doc
  * collect_list reassembly) with a single dup-bounded shuffle (the
  * removal-start set per doc) and a native kernel: at corpus scale the
  * old tail shuffled EVERY TOKEN of EVERY document twice to delete a few
  * spans, and carried a per-doc token-struct list through the reassembly
  * aggregate. The kernel's inputs are the doc's own text plus its
  * removal starts (≤ one int per gram position, strictly smaller state
  * than the token list it replaces), and its cost is O(tokens + l·starts)
  * per row — no cross-row state at all.
  *
  * Tokenization MUST match the Column form bit-for-bit: the kernel calls
  * UTF8String.split (the engine's own split implementation) with the
  * same "\\s+" pattern and limit -1, so leading/trailing empty tokens
  * and unicode-whitespace behavior are identical by construction
  * (SpanRemoveSpec pins kernel ≡ Column composition on real docs and on
  * the empty/whitespace edge cases). Output struct mirrors the public
  * spanRemoval columns: (n_tokens, n_kept, clean_text).
  */
object SpanRemoveKernel {
  private val WS = UTF8String.fromString("\\s+")

  def remove(text: UTF8String, starts: ArrayData, l: Int): InternalRow = {
    val toks = text.split(WS, -1)
    val n = toks.length
    val covered = new Array[Boolean](n)
    var i = 0
    while (i < starts.numElements()) {
      // skip null elements defensively: getInt on a null slot reads 0,
      // which would silently cover tokens 1..l (collect_set never emits
      // nulls, but the expression is public surface)
      if (!starts.isNullAt(i)) {
        val r = starts.getInt(i) // 1-based gram start position
        var t = if (r < 1) 1 else r
        val end = math.min(r + l - 1, n)
        while (t <= end) { covered(t - 1) = true; t += 1 }
      }
      i += 1
    }
    val sb = new java.lang.StringBuilder
    var kept = 0L
    var j = 0
    while (j < n) {
      if (!covered(j)) {
        if (kept > 0L) sb.append(' ')
        sb.append(toks(j).toString)
        kept += 1L
      }
      j += 1
    }
    new GenericInternalRow(Array[Any](n.toLong, kept, UTF8String.fromString(sb.toString)))
  }
}

/** Native expression for [[SpanRemoveKernel.remove]].
  * Inputs: text string, removal starts array<int> (1-based gram
  * positions). Output: struct(n_tokens long, n_kept long, clean_text
  * string). Null text or null starts → null struct (callers coalesce the
  * starts to an empty array on the left-join miss path). */
case class SpanRemove(left: Expression, right: Expression, l: Int)
    extends BinaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_kept", LongType, nullable = false),
    StructField("clean_text", StringType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(IntegerType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"span_remove expects (string, array<int>), got $other")
    }

  override protected def nullSafeEval(text: Any, starts: Any): Any =
    SpanRemoveKernel.remove(text.asInstanceOf[UTF8String],
      starts.asInstanceOf[ArrayData], l)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, a) =>
      s"graft.functions.SpanRemoveKernel.remove($t, $a, $l)")

  override def prettyName: String = "span_remove"

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SpanRemove = copy(left = newLeft, right = newRight)
}

object SpanRemove {
  def apply(text: Column, starts: Column, l: Int): Column =
    ColumnBridge.column(SpanRemove(
      ColumnBridge.expression(text), ColumnBridge.expression(starts), l))
}
