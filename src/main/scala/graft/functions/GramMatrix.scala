package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Distributed Gram matrix (Xᵀ X) over quantized (long) embedding
  * vectors as a typed `Aggregator` — the bounded-state shape for
  * embedding-space covariance/PCA at corpus scale: each task folds its
  * rows into ONE upper-triangle buffer of dims·(dims+1)/2 longs
  * (64-dim → 2080 entries, 16 KB), partial buffers merge
  * associatively, and the shuffle carries O(partitions) buffers —
  * never rows. Contrast with the explode-join formulation, which
  * multiplies the corpus by dims² before aggregating.
  *
  * Integer arithmetic end to end (inputs quantized like
  * [[SquaredDistance]]), so partial sums are exact and
  * partitioning-independent — what lets a distributed linear-algebra
  * op be DuckDB-oracled under the strict hash gate. Overflow headroom:
  * |v| ≤ 1e4 ⇒ |v·v| ≤ 1e8 per row pair-entry; 9e18 / 1e8 ≈ 9e10 rows
  * per entry before a long could wrap.
  */
final class GramMatrix(dims: Int)
    extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
  require(dims > 0, s"dims must be positive, got $dims")
  private val len = dims * (dims + 1) / 2

  override def zero: Array[Long] = new Array[Long](len)

  override def reduce(buf: Array[Long], x: Seq[Long]): Array[Long] = {
    if (x == null) return buf
    require(x.length == dims,
      s"gram_matrix: expected $dims-dim vector, got ${x.length}")
    val a = x.toArray
    var k = 0
    var i = 0
    while (i < dims) {
      val ai = a(i)
      var j = i
      while (j < dims) {
        buf(k) += ai * a(j)
        k += 1
        j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var k = 0
    while (k < len) { a(k) += b(k); k += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()

  /** Column form over an `array<bigint>` column: one row out, the
    * upper triangle in row-major (i ≤ j) order. */
  def agg(c: Column): Column = udaf(this, ExpressionEncoder[Seq[Long]]()).apply(c)
}

object GramMatrix {
  /** Row-major upper-triangle offset of (i, j), i ≤ j. */
  def upperIndex(dims: Int, i: Int, j: Int): Int =
    i * dims - i * (i - 1) / 2 + (j - i)
}
