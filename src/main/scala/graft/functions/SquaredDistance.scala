package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Squared L2 distance between two quantized (long) vectors, computed
  * entirely in integer arithmetic — no floating point, so the result is
  * bit-identical regardless of summation order or engine, which is what
  * lets k-means assignment be DuckDB-oracled under the strict hash
  * compare (SURVEY §7.4).
  *
  * North-star extension operator (the reference has no vector ops);
  * companion to [[CosineSimilarity]]. Codegen emits a static call on the
  * unpacked ArrayData so the k-way argmin in the assignment projection
  * stays inside whole-stage codegen.
  *
  * Overflow headroom: components quantized at 1e4 scale stay within
  * ±~1e4, so per-dim diff² ≤ 4e8 and a 128-dim sum ≤ ~5e10 — 20+ bits of
  * long headroom even at much coarser quantization.
  */
object SquaredDistance {
  def compute(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    // fail fast: a silent min-length prefix would return a plausible but
    // wrong distance for mismatched-dimension vectors — in a dedup or
    // clustering pipeline that's a data-corruption bug, not a distance
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"squared_distance: dimension mismatch ($n vs ${b.numElements()})")
    var s = 0L
    var i = 0
    while (i < n) {
      // getLong on a null slot bit-reads garbage — fail loudly (the
      // dimension-mismatch rule applied to elements)
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(
          s"squared_distance: null element at index $i")
      val d = a.getLong(i) - b.getLong(i)
      s += d * d
      i += 1
    }
    s
  }
}

case class SquaredDistanceExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  // getLong on a float/double/int ArrayData would bit-reinterpret, not
  // convert — reject anything that is not array<bigint> at analysis time
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"squared_distance requires two array<bigint> arguments, " +
          s"got ${l.simpleString} and ${r.simpleString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    SquaredDistance.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SquaredDistance.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SquaredDistanceExpr =
    copy(left = newLeft, right = newRight)
}

object SquaredDistanceExpr {
  def apply(a: Column, b: Column): Column =
    ExpressionUtils.column(
      SquaredDistanceExpr(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** SQL-registration front: casts integer-element arrays up to
    * array<bigint>; float/double arrays still fail the type check rather
    * than silently truncating a quantization the caller didn't choose. */
  def forSql(a: Expression, b: Expression): SquaredDistanceExpr = {
    def widen(e: Expression): Expression = e.dataType match {
      case ArrayType(LongType, _) => e
      case ArrayType(t, n) if Cast.canUpCast(t, LongType) =>
        Cast(e, ArrayType(LongType, n))
      case _ => e // let checkInputDataTypes report it
    }
    SquaredDistanceExpr(widen(a), widen(b))
  }
}
