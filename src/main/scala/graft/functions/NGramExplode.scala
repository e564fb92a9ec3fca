package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Generator (UDTF surface, SURVEY.md §2.9 U3): explodes a whitespace-
  * tokenized text column into its word n-grams, one output row per n-gram,
  * with the 0-based n-gram position.
  *
  * Output schema: `(pos int, ngram string)`. Rows with null text generate
  * nothing (like `explode` on null). Used by near-dup shingling (q35) and
  * the n-gram stats query (q33).
  *
  * Tokenization note: splits on `\s+` (robust for production text), while
  * the DuckDB oracles mirror with `string_split(text, ' ')` — equivalent
  * ONLY for single-space-separated text, which the read-only fixtures
  * guarantee (verified: no multi-space/tab/newline at any SF). A corpus
  * with irregular whitespace needs the oracle side regenerated with a
  * regexp splitter.
  */
case class NGramExplode(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {
  require(n >= 1, s"n-gram size must be >= 1, got $n")

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("ngram", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Nil
    val toks = v.asInstanceOf[UTF8String].toString
      .split("\\s+").filter(_.nonEmpty)
    if (toks.length < n) return Nil
    (0 to toks.length - n).map { i =>
      InternalRow(i, UTF8String.fromString(toks.slice(i, i + n).mkString(" ")))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): NGramExplode =
    copy(child = newChild)
}

object NGramExplode {
  /** Use with `df.select($"doc_id", ngrams_of($"text", 3))` — Spark plans a
    * GenerateExec for the Generator expression. */
  def apply(c: Column, n: Int): Column =
    ExpressionUtils.column(NGramExplode(ExpressionUtils.expression(c), n))
}
