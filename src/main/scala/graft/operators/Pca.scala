package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Driver-side principal-component analysis over the distributed Gram
  * matrix ([[graft.functions.GramMatrix]]) — the classic two-phase
  * shape for corpus-scale PCA: the cluster reduces 100 TB of vectors to
  * one d·(d+1)/2 integer buffer; the driver does O(d²)-state
  * eigen-analysis on it; the resulting component re-enters the plan as
  * a literal for a map-side projection. Driver state is O(d²)
  * (the [[KMeans]] bounded-driver-state discipline), and the
  * projection is codegen'd builtin HOFs — no per-row driver work, no
  * second pass over the corpus for the transform.
  *
  * Determinism: the Gram entries are exact integers; covariance,
  * power iteration (fixed start = the max-variance axis, fixed
  * iteration count, no convergence-dependent early exit) and the sign
  * convention (largest-|component| made positive) are all
  * deterministic double arithmetic on them.
  */
object Pca {

  /** Dense covariance from upper-triangle Gram rows of QUANTIZED
    * vectors: C(i,j) = G(i,j)/(scale²·n) − μ(i)·μ(j), with `mean` in
    * ORIGINAL (unquantized) units and `scale` the quantization factor
    * (e.g. 1e4). */
  def covariance(gram: Seq[(Int, Int, Long)], mean: Array[Double], n: Long,
      scale: Double): Array[Array[Double]] = {
    require(n > 0, "covariance needs n > 0")
    val d = mean.length
    val c = Array.ofDim[Double](d, d)
    gram.foreach { case (i, j, g) =>
      val v = g.toDouble / (scale * scale * n) - mean(i) * mean(j)
      c(i)(j) = v
      c(j)(i) = v
    }
    c
  }

  /** Top eigenpair of a symmetric matrix by `iters` power iterations.
    * Start vector is the axis of the largest diagonal entry (lowest
    * index on ties); sign fixed so the largest-|component| (lowest
    * index on ties) is positive. Fixed iteration count — deterministic
    * output for deterministic input, convergence gated by the caller's
    * residual check, not a data-dependent early exit. */
  def topComponent(c: Array[Array[Double]], iters: Int = 300): (Array[Double], Double) = {
    val d = c.length
    var v = new Array[Double](d)
    v((0 until d).maxBy(i => (c(i)(i), -i))) = 1.0
    def matVec(x: Array[Double]): Array[Double] = {
      val y = new Array[Double](d)
      var i = 0
      while (i < d) {
        var s = 0.0
        var j = 0
        while (j < d) { s += c(i)(j) * x(j); j += 1 }
        y(i) = s
        i += 1
      }
      y
    }
    def norm(x: Array[Double]): Double = math.sqrt(x.map(e => e * e).sum)
    var it = 0
    while (it < iters) {
      val y = matVec(v)
      val ny = norm(y)
      // a zero matrix (or eigenvalue 0) leaves the start vector in place
      if (ny > 0) v = y.map(_ / ny)
      it += 1
    }
    val lambda = {
      val y = matVec(v)
      v.zip(y).map { case (a, b) => a * b }.sum // Rayleigh quotient, ‖v‖=1
    }
    val flip = v((0 until d).maxBy(i => (math.abs(v(i)), -i))) < 0
    (if (flip) v.map(-_) else v, lambda)
  }

  /** Map-side projection of an `array<float|double>` column onto a
    * driver-held component (mean-centered dot product): stays inside
    * whole-stage codegen via `zip_with` + `aggregate`. */
  def project(vecCol: Column, comp: Array[Double], mean: Array[Double]): Column = {
    val centered = zip_with(vecCol, typedlit(mean.toSeq),
      (x, m) => x.cast("double") - m)
    aggregate(zip_with(centered, typedlit(comp.toSeq), (x, w) => x * w),
      lit(0.0), (acc, x) => acc + x)
  }
}
