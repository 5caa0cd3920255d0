package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Runtime kernel for the embedding dot product: one tight loop, each
  * element cast to double THEN multiplied, accumulated left-to-right —
  * the IDENTICAL IEEE operation sequence of the Column algebra it
  * replaces,
  * `aggregate(zip_with(a, b, (p, q) => p.cast(double) * q.cast(double)),
  *  0.0, _ + _)`,
  * so every hash-green oracle replaying that fold as a canonical-order
  * SQL sum stays bit-identical. The algebra's higher-order lambdas never
  * codegen (CodegenFallback), which made each pair verify allocate a
  * zipped array and interpret two lambda trees per element; this is a
  * static call with zero allocation — the ANN verify loops (sim1-sim6,
  * dd10/dd12, PCA projections) sit on it.
  *
  * Null semantics mirror the algebra exactly: mismatched lengths
  * null-pad a zip_with slot and any null element nulls the running sum,
  * so both cases return SQL NULL. Empty arrays return 0.0 (the fold's
  * init). */
object DotKernel {
  def dotFF(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  def dotDD(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  def dotFD(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getFloat(i).toDouble * b.getDouble(i)
      i += 1
    }
    acc
  }

  def dotDF(a: ArrayData, b: ArrayData): java.lang.Double = dotFD(b, a)

  /** Integer-array variants — the ADC inner loop of the SQ8/PQ tiers:
    * quantization CODES score directly against a double weight vector,
    * so the scan never materializes a per-row dequantized array. Each
    * int is cast to double THEN multiplied, accumulated left-to-right —
    * the identical IEEE sequence of `c[i]::DOUBLE * w[i]` in any SQL
    * replay (a swapped-operand call is bit-identical too: IEEE-754
    * multiplication is commutative). */
  def dotID(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getInt(i).toDouble * b.getDouble(i)
      i += 1
    }
    acc
  }

  def dotDI(a: ArrayData, b: ArrayData): java.lang.Double = dotID(b, a)

  def dotIF(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getInt(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  def dotFI(a: ArrayData, b: ArrayData): java.lang.Double = dotIF(b, a)

  def dotII(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getInt(i).toDouble * b.getInt(i).toDouble
      i += 1
    }
    acc
  }

  /** Squared L2 distance — the Lloyd-assignment / ADC inner loop:
    * acc += (x − c)·(x − c) left-to-right, the identical op sequence of
    * `aggregate(zip_with(a, b, (x, c) => (x-c)*(x-c)), 0.0, _ + _)` over
    * double arrays. Same null contract as the dot. */
  def sqDistDD(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getDouble(i) - b.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  /** MinHash signature agreement: the number of positions where two
    * long arrays hold equal non-null values — exactly
    * `aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
    *  0, _ + _)` (a null or padded slot compares to null → otherwise-0,
    * so the fold never returns null and slots beyond the shorter array
    * contribute nothing). Integer-exact, order-free. */
  def agreeLL(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var cnt = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i)) cnt += 1
      i += 1
    }
    cnt
  }

  /** Left-to-right sum of a double array: the canonical-order fold
    * `aggregate(arr, 0.0, _ + _)` (callers pre-sort when they need the
    * order-canonical sum). Null element → null, like the algebra. */
  def foldSumD(a: ArrayData): java.lang.Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      acc += a.getDouble(i)
      i += 1
    }
    acc
  }
}

/** array<float/double/int> × array<float/double/int> → double dot product
  * (see [[DotKernel]] for the exact-parity contract with the zip_with
  * fold; the int variants are the ADC inner loop over quantization codes). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // non-null inputs can still yield NULL (length mismatch / null element)
  override def nullable: Boolean = true

  private def elemTag(e: Expression): Char = e.dataType match {
    case ArrayType(FloatType, _)                          => 'F'
    case ArrayType(org.apache.spark.sql.types.IntegerType, _) => 'I'
    case _                                                => 'D'
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType | org.apache.spark.sql.types.IntegerType, _),
            ArrayType(FloatType | DoubleType | org.apache.spark.sql.types.IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"dot_product expects array<float|double|int> on both sides, got $other")
    }

  private def kernel: String = s"dot${elemTag(left)}${elemTag(right)}"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val r = kernel match {
      case "dotFF" => DotKernel.dotFF(x, y)
      case "dotDD" => DotKernel.dotDD(x, y)
      case "dotFD" => DotKernel.dotFD(x, y)
      case "dotDF" => DotKernel.dotDF(x, y)
      case "dotID" => DotKernel.dotID(x, y)
      case "dotDI" => DotKernel.dotDI(x, y)
      case "dotIF" => DotKernel.dotIF(x, y)
      case "dotFI" => DotKernel.dotFI(x, y)
      case _       => DotKernel.dotII(x, y)
    }
    if (r == null) null else r.doubleValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("dot")
      s"""
         |java.lang.Double $r = graft.functions.DotKernel.$kernel($a, $b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })

  override def prettyName: String = "dot_product"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column-API wrapper. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** array<double> × array<double> → double squared L2 distance (see
  * [[DotKernel.sqDistDD]] for the exact-parity contract). */
case class SqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"sq_dist expects array<double> on both sides, got $other")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val r = DotKernel.sqDistDD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (r == null) null else r.doubleValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("d2")
      s"""
         |java.lang.Double $r = graft.functions.DotKernel.sqDistDD($a, $b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })

  override def prettyName: String = "sq_dist"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDist =
    copy(left = newLeft, right = newRight)
}

object SqDist {
  /** Column-API wrapper. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(SqDist(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** array<double> → double left-to-right sum (see [[DotKernel.foldSumD]]). */
case class FoldSum(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"fold_sum expects array<double>, got $other")
    }

  override protected def nullSafeEval(a: Any): Any = {
    val r = DotKernel.foldSumD(a.asInstanceOf[ArrayData])
    if (r == null) null else r.doubleValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("fs")
      s"""
         |java.lang.Double $r = graft.functions.DotKernel.foldSumD($a);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })

  override def prettyName: String = "fold_sum"

  override protected def withNewChildInternal(newChild: Expression): FoldSum =
    copy(child = newChild)
}

object FoldSum {
  /** Column-API wrapper. */
  def apply(a: Column): Column =
    ColumnBridge.column(FoldSum(ColumnBridge.expression(a)))
}

/** array<bigint> × array<bigint> → int signature-agreement count (see
  * [[DotKernel.agreeLL]]). */
case class AgreeCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(org.apache.spark.sql.types.LongType, _),
            ArrayType(org.apache.spark.sql.types.LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"agree_count expects array<bigint> on both sides, got $other")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotKernel.agreeLL(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DotKernel.agreeLL($a, $b)")

  override def prettyName: String = "agree_count"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AgreeCount =
    copy(left = newLeft, right = newRight)
}

object AgreeCount {
  /** Column-API wrapper. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(AgreeCount(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
