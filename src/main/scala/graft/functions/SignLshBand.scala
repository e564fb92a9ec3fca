package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Sign-LSH band key of a float/double vector: `bits` hyperplane signs
  * packed into the low bits, the band id in the high bits, so one value
  * is a complete equi-join key (`(band << 16) | signature`).
  *
  * Unlike q34c's literal ±1 planes (fixed dimension, baked into the
  * query), the hyperplanes here are DERIVED from (band, bit, component)
  * by a 31-bit LCG, so the expression works at any vector dimensionality
  * — required by [[graft.plans.LshJoinRewrite]], which rewrites joins
  * over vectors whose width is unknown at plan time. The LCG keeps every
  * intermediate below 2^63 (no silent wrap), which makes the arithmetic
  * portable to an oracle SQL mirror — the same reason the q63/q67 LCG
  * split uses this shape.
  *
  * Scale note: evaluation is O(dims × bits) per row per band, map-side,
  * inside whole-stage codegen; the band key is the only thing shuffled.
  */
object SignLshBand {
  /** ±1 hyperplane component for (band, bit j, dim i): a 31-bit LCG over
    * a small linear index mix; bit 16 is the sign. All intermediates fit
    * in a Long for any realistic (i, j, band). */
  def planeSign(i: Int, j: Int, band: Int): Int = {
    val seed = i.toLong * 131071L + j.toLong * 8191L + band.toLong * 524287L + 12345L
    val h = (seed * 1103515245L + 12345L) % 2147483648L
    if (((h >> 16) & 1L) == 1L) 1 else -1
  }

  def compute(v: ArrayData, band: Int, bits: Int, isFloat: Boolean): Long = {
    val n = v.numElements()
    var sig = 0L
    var j = 0
    while (j < bits) {
      var s = 0.0
      var i = 0
      while (i < n) {
        if (v.isNullAt(i))
          throw new IllegalArgumentException(
            s"sign_lsh_band: null element at index $i")
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        s += x * planeSign(i, j, band)
        i += 1
      }
      if (s >= 0.0) sig |= (1L << j)
      j += 1
    }
    (band.toLong << 16) | sig
  }
}

case class SignLshBandExpr(child: Expression, band: Int, bits: Int)
    extends UnaryExpression {
  require(bits >= 1 && bits <= 16, s"bits must be in [1,16], got $bits")
  require(band >= 0, s"band must be >= 0, got $band")

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def nullIntolerant: Boolean = true

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sign_lsh_band expects array<float>/array<double>, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    SignLshBand.compute(v.asInstanceOf[ArrayData], band, bits, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.SignLshBand.compute($v, $band, $bits, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression): SignLshBandExpr =
    copy(child = newChild)
}

object SignLshBandExpr {
  def apply(v: Column, band: Int, bits: Int): Column =
    ExpressionUtils.column(
      SignLshBandExpr(ExpressionUtils.expression(v), band, bits))
}
