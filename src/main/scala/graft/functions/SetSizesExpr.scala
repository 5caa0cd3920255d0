package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Intersection and union CARDINALITIES of two arrays in one hash-set
  * pass — `struct(inter, union)` with
  * `inter == size(array_intersect(a, b))` and
  * `union == size(array_union(a, b))` for every input, duplicates and
  * nulls included (SetSizesSpec pins the equality).
  *
  * The Jaccard/containment verify stages only ever take the SIZE of the
  * intersection/union; the builtin pair materializes both result arrays
  * (string copies for word grams) per candidate pair just to count and
  * discard them. This kernel counts without building either array.
  */
object SetSizesKernel {
  def sizes(a: ArrayData, b: ArrayData, isString: Boolean): InternalRow = {
    val setA = new java.util.HashSet[Any]()
    var i = 0
    val na = a.numElements()
    while (i < na) {
      setA.add(if (a.isNullAt(i)) null
               else if (isString) a.getUTF8String(i) else a.getLong(i))
      i += 1
    }
    val seenB = new java.util.HashSet[Any]()
    var inter = 0
    var db = 0
    i = 0
    val nb = b.numElements()
    while (i < nb) {
      val v = if (b.isNullAt(i)) null
              else if (isString) b.getUTF8String(i) else b.getLong(i)
      if (seenB.add(v)) {
        db += 1
        if (setA.contains(v)) inter += 1
      }
      i += 1
    }
    InternalRow(inter, setA.size() + db - inter)
  }
}

/** Native expression: (array, array) → struct<inter: int, union: int>.
  * Accepts array<long> or array<string> (the gram/shingle-hash types). */
case class SetSizes(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("inter", IntegerType, nullable = false),
    StructField("union", IntegerType, nullable = false)))

  private def elemType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(lt, _), ArrayType(rt, _))
        if lt == rt && (lt == LongType || lt == StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"set_sizes expects two array<long> or array<string>, got $other")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SetSizesKernel.sizes(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      elemType == StringType)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val isString = elemType == StringType
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SetSizesKernel.sizes($a, $b, $isString)")
  }

  override def prettyName: String = "set_sizes"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SetSizes =
    copy(left = newLeft, right = newRight)
}

object SetSizes {
  /** Column-API wrapper. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(SetSizes(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
