package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Char-polynomial rolling hash `acc ← (acc·base + char) mod m` over a
  * string — the portable digest the near-dup family keys on (shingle
  * minhashes, simhash token signatures, q37 fingerprints). Semantically
  * identical to the `aggregate(split(s, ""), 0L, (a, c) => (a·base +
  * ascii(c)) % m)` higher-order-function formulation (and to DuckDB's
  * `list_reduce` mirror in the oracles — the equivalence the oracle gate
  * verifies end-to-end), but Spark's array HOFs are CodegenFallback:
  * each evaluation allocates the split array and interprets the lambda
  * per element, and it drops the surrounding projection out of
  * whole-stage codegen. This expression IS the fold — one codegen'd
  * static call folding the string's code points (zero-allocation byte
  * fast path for pure-ASCII input), no intermediate array — so the map-side hot loop of shingle hashing stays inside
  * WholeStageCodegen at 100 TB.
  *
  * North-star extension operator (the reference has no text-hash ops);
  * the interpreted-HOF equivalence is property-tested in
  * ExpressionsSpec across printable ASCII plus supplementary-plane
  * (surrogate-pair) inputs.
  */
object PolyHash {
  /** Folds CODE POINTS, matching both `split(s, "")` (Java's split never
    * separates a surrogate pair) + `ascii` (codePointAt) and DuckDB's
    * `string_split(s, '') + ascii` — a UTF-16-unit fold would diverge on
    * any supplementary-plane character. ASCII-only strings (the corpus
    * and oracle universe) take a zero-allocation byte fast path; any
    * high byte falls back to a code-point walk over the decoded string. */
  def compute(s: UTF8String, base: Long, mod: Long): Long = {
    val n = s.numBytes()
    var acc = 0L
    var i = 0
    var ascii = true
    while (ascii && i < n) {
      val b = s.getByte(i)
      if (b < 0) ascii = false
      else { acc = (acc * base + b) % mod; i += 1 }
    }
    if (ascii) return acc
    val js = s.toString
    acc = 0L
    i = 0
    while (i < js.length) {
      val cp = js.codePointAt(i)
      acc = (acc * base + cp) % mod
      i += Character.charCount(cp)
    }
    acc
  }
}

case class PolyHashExpr(child: Expression, base: Long, mod: Long)
    extends UnaryExpression {
  require(mod > 0 && base > 0 && mod <= (1L << 31) && base <= mod,
    s"poly_hash: need 0 < base <= mod <= 2^31 (got base=$base mod=$mod) " +
      "so acc*base + char stays within long range")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"poly_hash requires a string argument, got ${t.simpleString}")
  }

  override def nullSafeEval(s: Any): Any =
    PolyHash.compute(s.asInstanceOf[UTF8String], base, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PolyHash.compute($c, ${base}L, ${mod}L)")

  override protected def withNewChildInternal(newChild: Expression): PolyHashExpr =
    copy(child = newChild)
}

object PolyHashExpr {
  def apply(c: Column, base: Long, mod: Long): Column =
    ExpressionUtils.column(
      PolyHashExpr(ExpressionUtils.expression(c), base, mod))
}
