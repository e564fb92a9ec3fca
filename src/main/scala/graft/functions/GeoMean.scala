package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Geometric mean as a typed `Aggregator` (UDAF surface, SURVEY.md §2.9 U2).
  *
  * Aggregates in log space (`exp(avg(ln(x)))`) so partial aggregation is a
  * simple commutative sum — map-side combine works and no overflow at scale.
  * Non-positive inputs and nulls are ignored (ln undefined).
  */
object GeoMean extends Aggregator[java.lang.Double, (Double, Long), Double] {
  override def zero: (Double, Long) = (0.0, 0L)

  override def reduce(b: (Double, Long), x: java.lang.Double): (Double, Long) =
    if (x == null || x.doubleValue() <= 0.0) b
    else (b._1 + math.log(x.doubleValue()), b._2 + 1L)

  override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
    (a._1 + b._1, a._2 + b._2)

  override def finish(b: (Double, Long)): Double =
    if (b._2 == 0L) Double.NaN else math.exp(b._1 / b._2)

  override def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** Column form: `GeoMean.agg($"l_extendedprice")`. */
  def agg(c: Column): Column = udaf(GeoMean).apply(c)
}
