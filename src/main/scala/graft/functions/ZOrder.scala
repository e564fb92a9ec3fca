package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-order (Morton) curve key: interleaves the low 32 bits of two
  * non-negative dimension values, x in the even bit positions and y in
  * the odd ones. Sorting (or range-partitioning) a table by this key
  * co-locates rows that are close in BOTH dimensions, so min/max
  * row-group statistics on either source column stay tight and a
  * predicate on either dimension prunes file/row-group ranges — the
  * multi-dimensional clustering behind `OPTIMIZE ZORDER BY` in lakehouse
  * table formats, here as a plain codegen'd expression usable with
  * `orderBy(zorder_key(a, b))` + any writer (e.g.
  * [[graft.operators.ShardWriter]]).
  *
  * Interleave via the standard parallel bit-spread (magic-mask shifts),
  * not a 32-step loop: 10 shift/mask ops per dimension, branch-free,
  * whole-stage-codegen friendly.
  *
  * LAYOUT CONSTRAINT — bucket dimensions to ≤31 bits (e.g.
  * `pmod(hash(col), 1024)` or a range bucketizer): y's bit 31 would land
  * in the long's SIGN bit, so a ≥2^31 y-value produces a negative key
  * and a signed `orderBy(zkey)` would put the upper half of that
  * dimension's range FIRST, destroying the clustering. The key VALUE is
  * a correct 64-bit Morton code for full 32-bit inputs (round-trips via
  * [[deinterleave]]); only signed ORDERING needs the 31-bit bound.
  */
object ZOrder {
  /** Spread the low 32 bits of x so bit i lands at position 2i. */
  def spread(x: Long): Long = {
    var v = x & 0xFFFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  def interleave(x: Long, y: Long): Long =
    spread(x) | (spread(y) << 1)

  /** Inverse of [[spread]]: collect bits from even positions. */
  def unspread(z: Long): Long = {
    var v = z & 0x5555555555555555L
    v = (v | (v >> 1)) & 0x3333333333333333L
    v = (v | (v >> 2)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v >> 4)) & 0x00FF00FF00FF00FFL
    v = (v | (v >> 8)) & 0x0000FFFF0000FFFFL
    v = (v | (v >> 16)) & 0x00000000FFFFFFFFL
    v
  }

  def deinterleave(z: Long): (Long, Long) = (unspread(z), unspread(z >> 1))
}

case class ZOrderKeyExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable
  override def nullIntolerant: Boolean = true

  // reject non-long children at ANALYSIS time: an INT input would work
  // under codegen (java widening) but ClassCastException in interpreted
  // eval — e.g. ConstantFolding of zorder_key(3, 1). Both construction
  // fronts (the Column builder, the SQL registration) insert Casts, so
  // users never see this; it guards direct Expression construction.
  // (ExpectsInputTypes would give implicit casts, but AbstractDataType
  // is private[sql] in Spark 4.)
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zorder_key expects (bigint, bigint), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql}) — cast inputs to long")

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrder.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ZOrder.interleave($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderKeyExpr =
    copy(left = newLeft, right = newRight)
}

object ZOrderKeyExpr {
  def apply(a: Column, b: Column): Column =
    ExpressionUtils.column(ZOrderKeyExpr(
      Cast(ExpressionUtils.expression(a), LongType),
      Cast(ExpressionUtils.expression(b), LongType)))

  /** SQL-registration front: casts narrower integer args to long. */
  def forSql(a: Expression, b: Expression): ZOrderKeyExpr =
    ZOrderKeyExpr(Cast(a, LongType), Cast(b, LongType))
}
