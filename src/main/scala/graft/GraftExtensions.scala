package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{BigIntLow64Expr, CosineSimilarityExpr, NGramExplode, ParseFlexTimestamp}
import graft.ingest.CsvFieldsExpr

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions as SQL functions, so `spark.sql` users get the
  * same surface as the Column API. Activate with:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)           // programmatic
  * // or: .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  *
  * Registered: `flex_timestamp_ms(s)`, `cosine_similarity(a, b)`,
  * `bigint_low64(s)`, `ngram_explode(text, n)`, `csv_fields(line)`,
  * `squared_distance(a, b)`, `zorder_key(x, y)`, `poly_hash(s, base,
  * mod)`, `dot_product(a, b)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "java_udf")

  /** Evaluate a foldable integer-literal argument (the ngram_explode
    * discipline: SQL-frontend scalars that parameterize codegen must be
    * literals, not runtime columns). */
  private def longLit(e: Expression, fn: String, arg: String): Long = e match {
    case f if f.foldable => f.eval() match {
      case i: java.lang.Integer => i.longValue()
      case l: java.lang.Long    => l.longValue()
      case s: java.lang.Short   => s.longValue()
      case b: java.lang.Byte    => b.longValue()
      case other => throw new IllegalArgumentException(
        s"$fn: $arg must be an integer literal, got $other")
    }
    case _ => throw new IllegalArgumentException(
      s"$fn: $arg must be a foldable integer literal")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("flex_timestamp_ms"),
      info("flex_timestamp_ms",
        "flex_timestamp_ms(str) - multi-format timestamp parse to epoch millis (null on garbage)"),
      (args: Seq[Expression]) => ParseFlexTimestamp(args.head)))
    ext.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      info("cosine_similarity",
        "cosine_similarity(vec1, vec2) - cosine similarity of two float/double arrays"),
      (args: Seq[Expression]) => CosineSimilarityExpr(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("bigint_low64"),
      info("bigint_low64",
        "bigint_low64(str) - decimal string to long with BigInteger low-64-bit wrap"),
      (args: Seq[Expression]) => BigIntLow64Expr(args.head)))
    ext.injectFunction((
      FunctionIdentifier("ngram_explode"),
      info("ngram_explode",
        "ngram_explode(text, n) - generator: (pos, ngram) rows of word n-grams"),
      (args: Seq[Expression]) => {
        val n = longLit(args(1), "ngram_explode", "n")
        if (n < 1 || n > Int.MaxValue)
          throw new IllegalArgumentException(
            s"ngram_explode: n must be in [1, ${Int.MaxValue}], got $n")
        NGramExplode(args(0), n.toInt)
      }))
    ext.injectFunction((
      FunctionIdentifier("csv_fields"),
      info("csv_fields",
        "csv_fields(line) - split one RFC-4180 CSV line into a string array"),
      (args: Seq[Expression]) => CsvFieldsExpr(args.head)))
    ext.injectFunction((
      FunctionIdentifier("squared_distance"),
      info("squared_distance",
        "squared_distance(vec1, vec2) - integer squared L2 distance of two long arrays"),
      (args: Seq[Expression]) => graft.functions.SquaredDistanceExpr.forSql(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("zorder_key"),
      info("zorder_key",
        "zorder_key(x, y) - Morton curve key: interleaves the low 32 bits of two longs"),
      (args: Seq[Expression]) => graft.functions.ZOrderKeyExpr.forSql(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("poly_hash"),
      info("poly_hash",
        "poly_hash(str, base, mod) - char-polynomial rolling hash (acc*base + char) % mod"),
      (args: Seq[Expression]) => graft.functions.PolyHashExpr(args(0),
        longLit(args(1), "poly_hash", "base"), longLit(args(2), "poly_hash", "mod"))))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      info("dot_product",
        "dot_product(vec1, vec2) - sequential-order dot product of two float/double arrays"),
      (args: Seq[Expression]) => graft.functions.DotProductExpr(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("sign_lsh_band"),
      info("sign_lsh_band",
        "sign_lsh_band(vec, band, bits) - sign-LSH band key: bits hyperplane signs + band id packed into one long"),
      (args: Seq[Expression]) => {
        val band = longLit(args(1), "sign_lsh_band", "band")
        val bits = longLit(args(2), "sign_lsh_band", "bits")
        graft.functions.SignLshBandExpr(args(0), band.toInt, bits.toInt)
      }))
    // SURVEY §7.3's deferred "LSH rewrite": opt-in (conf-gated, default
    // off) optimizer rule replacing cartesian cosine-threshold joins
    // with banded equi-joins + exact post-filter
    ext.injectOptimizerRule(_ => graft.plans.LshJoinRewrite)
    // the whole-operator extension triple: AsofJoin logical node →
    // AsofJoinStrategy → AsofJoinExec (plans/AsofJoin.scala)
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
  }
}
