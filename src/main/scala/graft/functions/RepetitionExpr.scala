package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Runtime kernel for the Gopher repetition signals. The equivalent
  * Column composition (split → transform/slice/concat_ws grams →
  * array_distinct + sorted-run aggregate) is correct but entirely
  * interpreted — higher-order functions are CodegenFallback — and
  * measured ~1.4 ms/doc on 54-token docs. One JVM pass over the token
  * array is the same shape the fused MinHash kernels use.
  */
object RepetitionKernel {

  private val WS = UTF8String.fromString("\\s+")
  private val SPACE = UTF8String.fromString(" ")

  /** (n_grams, dup_gram_ratio, top_word_ratio) — bit-equal to the Column
    * composition: tokens = split(lower(text), "\\s+") with Spark's
    * limit -1 semantics; grams = space-joined n-windows (clamped at the
    * tail, min one gram); ratios as double divisions. */
  def stats(text: UTF8String, n: Int): InternalRow = {
    val toks = text.toLowerCase.split(WS, -1)
    val nToks = toks.length
    val nGrams = math.max(nToks - n + 1, 1)
    val distinct = new java.util.HashSet[UTF8String](nGrams * 2)
    var i = 0
    while (i < nGrams) {
      val upper = math.min(i + n, nToks)
      val parts = new Array[UTF8String](upper - i)
      var j = i
      while (j < upper) { parts(j - i) = toks(j); j += 1 }
      distinct.add(UTF8String.concatWs(SPACE, parts: _*))
      i += 1
    }
    val counts = new java.util.HashMap[UTF8String, Int](nToks * 2)
    var top = 0
    i = 0
    while (i < nToks) {
      val c = counts.merge(toks(i), 1, (a, b) => a + b)
      if (c > top) top = c
      i += 1
    }
    new GenericInternalRow(Array[Any](
      nGrams,
      (nGrams - distinct.size).toDouble / nGrams,
      top.toDouble / nToks))
  }
}

/** Native repetition-signals expression: string → struct(n_grams int,
  * dup_gram_ratio double, top_word_ratio double). Pinned bit-equal to the
  * Column composition in ScalarsSpec. */
case class RepetitionStats(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", IntegerType, nullable = false),
    StructField("dup_gram_ratio", DoubleType, nullable = false),
    StructField("top_word_ratio", DoubleType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"repetition_stats expects string, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    RepetitionKernel.stats(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RepetitionKernel.stats($c, $n)")

  override def prettyName: String = "repetition_stats"

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object RepetitionStats {
  /** Column-API wrapper. */
  def apply(text: Column, n: Int): Column =
    ColumnBridge.column(RepetitionStats(ColumnBridge.expression(text), n))
}
