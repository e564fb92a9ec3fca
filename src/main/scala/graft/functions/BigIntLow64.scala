package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Decimal-string → long with arbitrary-precision wrap-around semantics:
  * the low 64 bits of the (possibly >64-bit) integer, matching
  * `new BigInteger(s).longValue()` as used by the reference for vehicle ids
  * (CsvLoader.java:145-146). A plain `cast(LongType)` nulls out-of-range
  * values instead of wrapping, so this needs a custom expression.
  * Returns null for non-integer strings — NOTE this is our permissive
  * choice, not the reference's: its BigInteger parse sits outside the
  * per-record try/catch, so a bad id aborts the reference's whole load.
  */
object BigIntLow64 {
  def low64(s: UTF8String): java.lang.Long = {
    if (s == null) return null
    try java.lang.Long.valueOf(new java.math.BigInteger(s.toString.trim).longValue())
    catch { case _: NumberFormatException => null }
  }
}

case class BigIntLow64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    BigIntLow64.low64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |java.lang.Long ${ev.value}Tmp = graft.functions.BigIntLow64.low64($c);
         |if (${ev.value}Tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}Tmp.longValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BigIntLow64Expr =
    copy(child = newChild)
}

object BigIntLow64Expr {
  def apply(c: Column): Column =
    ExpressionUtils.column(BigIntLow64Expr(ExpressionUtils.expression(c)))
}
