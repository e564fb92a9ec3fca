package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQL-surface registration via SparkSessionExtensions + LSH ANN recall
  * against the brute-force baseline. The shared test session is built with
  * `withExtensions(new GraftExtensions)` (TestSpark), so registration-at-
  * session-build is what's under test here. */
class GraftExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = TestSpark.spark

  test("flex_timestamp_ms / bigint_low64 / cosine_similarity / csv_fields in SQL") {
    val r = spark.sql(
      """SELECT
        |  flex_timestamp_ms('2015-02-14 23:51:40+05') AS ms,
        |  bigint_low64('18446744073709551617') AS low,
        |  round(cosine_similarity(array(1.0D, 0.0D), array(1.0D, 0.0D)), 9) AS sim,
        |  csv_fields('a,"b,c",d') AS f,
        |  zorder_key(3L, 1L) AS z,
        |  squared_distance(array(3L, 0L), array(0L, 4L)) AS d2
        |""".stripMargin).collect()(0)
    assert(r.getLong(0) == 1423939900000L)
    assert(r.getLong(1) == 1L)
    assert(r.getDouble(2) == 1.0)
    assert(r.getSeq[String](3) == Seq("a", "b,c", "d"))
    assert(r.getLong(4) == 7L) // x=0b11 even bits + y=0b1 odd bit -> 0b111
    assert(r.getLong(5) == 25L)
  }

  test("squared_distance: int arrays upcast, float/double arrays rejected") {
    // narrower integers widen losslessly
    assert(spark.sql("SELECT squared_distance(array(1, 2), array(3, 4)) AS d")
      .collect()(0).getLong(0) == 8L)
    // doubles would bit-reinterpret under getLong — must fail analysis,
    // not return garbage
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT squared_distance(array(1.0D), array(2.0D))").collect()
    }
    assert(e.getMessage.contains("array<bigint>"))
  }

  test("squared_distance: dimension mismatch fails instead of silent prefix") {
    // a min-length prefix would return a plausible but wrong distance —
    // in a dedup/clustering pipeline that's silent data corruption
    val e = intercept[Exception] {
      spark.sql("SELECT squared_distance(array(1L, 2L, 3L), array(1L, 2L))")
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("dimension mismatch")),
      s"expected a dimension-mismatch error, got: $e")
  }

  test("cosine_similarity: dimension mismatch fails instead of silent prefix") {
    // same rule as squared_distance: the old min-length prefix returned a
    // plausible but wrong similarity for mismatched vectors
    val e = intercept[Exception] {
      spark.sql("SELECT cosine_similarity(array(1.0D, 2.0D, 3.0D), array(1.0D, 2.0D))")
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("dimension mismatch")),
      s"expected a dimension-mismatch error, got: $e")
  }

  test("vector ops: null ELEMENT fails loudly instead of reading garbage") {
    // ArrayData.getDouble/getLong on a null slot bit-read garbage; the
    // HOFs these expressions replaced propagated NULL — silent either
    // way. The expressions fail fast instead (the dimension-mismatch rule)
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    for (sql <- Seq(
        "SELECT dot_product(array(1.0D, CAST(NULL AS DOUBLE)), array(1.0D, 2.0D))",
        "SELECT cosine_similarity(array(1.0D, CAST(NULL AS DOUBLE)), array(1.0D, 2.0D))",
        "SELECT squared_distance(array(1L, CAST(NULL AS BIGINT)), array(1L, 2L))")) {
      val e = intercept[Exception] { spark.sql(sql).collect() }
      assert(messages(e).exists(_.contains("null element")),
        s"expected null-element error for $sql, got: $e")
    }
  }

  test("poly_hash / dot_product in SQL") {
    val r = spark.sql(
      """SELECT
        |  poly_hash('abc', 31, 1000000007) AS ph,
        |  poly_hash('', 31, 1000000007) AS ph0,
        |  dot_product(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS dp
        |""".stripMargin).collect()(0)
    // ((0*31+97)*31+98)*31+99 = 96354 for 'abc' under mod >> value
    assert(r.getLong(0) == (('a'.toInt * 31 + 'b') * 31 + 'c').toLong)
    assert(r.getLong(1) == 0L)
    assert(r.getDouble(2) == 32.0)
    // base/mod must be literals, not columns
    val e = intercept[Exception] {
      spark.sql("SELECT poly_hash('x', id, 7) FROM range(1)").collect()
    }
    assert(e.getMessage.contains("foldable"))
  }

  test("ngram_explode works as a SQL generator in LATERAL VIEW position") {
    val rows = spark.sql(
      """SELECT pos, ngram
        |FROM VALUES ('w x y z') AS t(text)
        |LATERAL VIEW ngram_explode(text, 2) AS pos, ngram
        |""".stripMargin).collect()
    assert(rows.map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((0, "w x"), (1, "x y"), (2, "y z")))
  }

  test("LSH ANN (q34c) finds a usable fraction of brute-force top-3 (recall)") {
    import graft.queries.LlmOps
    val d = "/root/testdata/sf0.001"
    val exact = LlmOps.q34(TestSpark.spark, d).filter(col("rn") <= 3)
      .select("pid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = LlmOps.q34c(TestSpark.spark, d)
      .select("pid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ann.nonEmpty, "LSH buckets produced no candidates at all")
    // 8-bit signatures over 500 synthetic vectors: recall is modest by
    // design; assert the mechanism works, not magic numbers
    val recall = exact.intersect(ann).size.toDouble / exact.size
    assert(recall > 0.0, s"zero recall: ann=$ann")
  }
}
