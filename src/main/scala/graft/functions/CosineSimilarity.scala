package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Cosine similarity between two float/double vectors, computed in double
  * precision with a single sequential loop (deterministic summation order —
  * required for oracle parity and stable top-k ordering).
  *
  * North-star extension operator (BASELINE.json: "similarity search"); the
  * reference has no vector ops. Codegen emits a static call on the unpacked
  * ArrayData, so the hot inner loop of brute-force top-k stays inside
  * whole-stage codegen; no boxing per element.
  */
object CosineSimilarity {
  def compute(a: ArrayData, b: ArrayData, isFloatA: Boolean, isFloatB: Boolean): Double = {
    val n = a.numElements()
    // fail fast: a silent min-length prefix would return a plausible but
    // wrong similarity for mismatched-dimension vectors (the
    // SquaredDistance rule) — in dedup/retrieval that is data corruption,
    // not a similarity
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"cosine_similarity: dimension mismatch ($n vs ${b.numElements()})")
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      // getFloat/getDouble on a null slot read garbage — fail loudly
      // (the dimension-mismatch rule applied to elements)
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(
          s"cosine_similarity: null element at index $i")
      val x = if (isFloatA) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (isFloatB) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

case class CosineSimilarityExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSimilarity.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.CosineSimilarity.compute($a, $b, ${isFloat(left)}, ${isFloat(right)})")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarityExpr =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarityExpr {
  def apply(a: Column, b: Column): Column =
    ExpressionUtils.column(
      CosineSimilarityExpr(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
