package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One registered operator query: name → DataFrame builder (+ optional
  * DuckDB oracle SQL over the same parquet tables). */
case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {

  /** Order-independent, bit-exact double aggregation: quantize to 1e-4
    * units, sum as integers (exact, associative), divide back. Guarantees
    * hash-identical results between Spark and DuckDB no matter the
    * partitioning / summation order — plain double sums differ in the last
    * bits between engines. Safe while |sum*10000| < 2^53.
    */
  def exactSum(c: Column): Column =
    sum(round(c * lit(10000), 0).cast("long")) / lit(10000.0)

  /** DuckDB-side mirror of [[exactSum]]. */
  def exactSumSql(x: String): String =
    s"sum(CAST(round(($x)*10000) AS BIGINT))/10000.0"

  /** exactSum / count — deterministic average. */
  def exactAvg(c: Column): Column = exactSum(c) / count(lit(1))
  def exactAvgSql(x: String): String = s"(${exactSumSql(x)})/count(*)"
}
