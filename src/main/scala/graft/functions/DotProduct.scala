package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Dot product of two float/double vectors as ONE sequential double loop
  * `acc ← acc + a[i]·b[i]` — bit-identical to the
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` HOF formulation it
  * replaces (same IEEE summation order) and to a left-to-right `+` chain
  * in ANSI SQL, which is what keeps the sign-LSH bucketing oracle
  * engine-stable. One deliberate deviation: a null ELEMENT fails fast
  * (the HOF propagated NULL; `ArrayData.getDouble` on a null slot would
  * silently read garbage). The HOF form is CodegenFallback: it allocates the
  * zipped products array and interprets both lambdas per element, and
  * drops the projection out of whole-stage codegen; this expression
  * emits one static call on the unpacked ArrayData.
  *
  * North-star extension operator (the reference has no vector ops);
  * companion to [[CosineSimilarity]] / [[SquaredDistance]].
  */
object DotProduct {
  def compute(a: ArrayData, b: ArrayData, isFloatA: Boolean, isFloatB: Boolean): Double = {
    val n = a.numElements()
    // fail fast (the SquaredDistance rule): a silent min-length prefix
    // would return a plausible but wrong product for mismatched vectors
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"dot_product: dimension mismatch ($n vs ${b.numElements()})")
    var dot = 0.0
    var i = 0
    while (i < n) {
      // ArrayData.getDouble on a null slot returns garbage, not NULL —
      // where the HOF formulation propagated NULL. Fail loudly instead
      // of silently scoring a corrupt vector (the dimension-mismatch
      // rule applied to elements).
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(
          s"dot_product: null element at index $i")
      val x = if (isFloatA) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (isFloatB) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      i += 1
    }
    dot
  }
}

case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_product requires two array<float|double> arguments, " +
          s"got ${l.simpleString} and ${r.simpleString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.DotProduct.compute($a, $b, ${isFloat(left)}, ${isFloat(right)})")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

object DotProductExpr {
  def apply(a: Column, b: Column): Column =
    ExpressionUtils.column(
      DotProductExpr(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
