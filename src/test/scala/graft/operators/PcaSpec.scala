package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.queries.LlmOps

/** Semantics of the distributed Gram matrix (q100) and the driver-side
  * PCA built on it. Hash parity vs DuckDB is the oracle's job; these pin
  * what the oracle can't see: matrix algebra invariants, eigen
  * convergence, the projection identity, and the bounded-state plan. */
class PcaSpec extends SparkSpec {

  private val dims = 64
  private val scale = 1e4

  private def gramRows(d: String): Seq[(Int, Int, Long)] =
    LlmOps.q100(spark, d).collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1).toInt, r.getLong(2))).toSeq

  private def embs(d: String): Array[Array[Double]] =
    Tables.embeddings(spark, d).select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)

  test("q100: distributed gram equals the locally computed one exactly") {
    val rows = gramRows(sf0001)
    assert(rows.length == dims * (dims + 1) / 2)
    val q = embs(sf0001).map(_.map(v => math.round(v * scale)))
    val expect = rows.map { case (i, j, _) =>
      (i, j, q.map(v => v(i) * v(j)).sum)
    }
    assert(rows == expect, "gram entries differ from the local integer computation")
  }

  test("q100: gram is a valid second-moment matrix (diag ≥ 0, Cauchy-Schwarz)") {
    val rows = gramRows(sf0001)
    val g = Array.ofDim[Long](dims, dims)
    rows.foreach { case (i, j, v) => g(i)(j) = v; g(j)(i) = v }
    (0 until dims).foreach(i => assert(g(i)(i) >= 0))
    for (i <- 0 until dims; j <- i + 1 until dims)
      assert(g(i)(j).toDouble * g(i)(j) <= g(i)(i).toDouble * g(j)(j) * (1 + 1e-12),
        s"Cauchy-Schwarz violated at ($i,$j)")
  }

  test("power iteration: top eigenpair converges, dominates the diagonal, deterministic") {
    val e = embs(sf0001)
    val n = e.length.toLong
    val mean = Array.tabulate(dims)(i => e.map(_(i)).sum / n)
    val c = Pca.covariance(gramRows(sf0001), mean, n, scale)
    val (v, lambda) = Pca.topComponent(c)
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-9, "component not unit-norm")
    // residual ‖Cv − λv‖ relative to λ — eigengap-dependent; the
    // labeled synthetic corpus has enough structure for 100 iterations
    val res = (0 until dims).map { i =>
      val cv = (0 until dims).map(j => c(i)(j) * v(j)).sum
      val r = cv - lambda * v(i)
      r * r
    }.sum
    assert(math.sqrt(res) <= 1e-4 * lambda,
      s"power iteration residual ${math.sqrt(res)} vs lambda $lambda")
    // the Rayleigh quotient starts at max-diag and never decreases
    val maxDiag = (0 until dims).map(i => c(i)(i)).max
    assert(lambda >= maxDiag - 1e-9, s"lambda $lambda below max diagonal $maxDiag")
    // sign convention + fixed iterations = bit-identical reruns
    val (v2, l2) = Pca.topComponent(c)
    assert(v.toSeq == v2.toSeq && lambda == l2, "topComponent not deterministic")
  }

  test("projection: variance along the component equals the Rayleigh quotient") {
    val e = embs(sf0001)
    val n = e.length.toLong
    val mean = Array.tabulate(dims)(i => e.map(_(i)).sum / n)
    val c = Pca.covariance(gramRows(sf0001), mean, n, scale)
    val (v, lambda) = Pca.topComponent(c)
    val proj = Tables.embeddings(spark, sf0001)
      .select(Pca.project(col("embedding"), v, mean).as("p"))
      .collect().map(_.getDouble(0))
    val m = proj.sum / proj.length
    val varP = proj.map(p => (p - m) * (p - m)).sum / proj.length
    // vᵀCv = λ by construction; quantization + float-vs-double drift only
    assert(math.abs(varP - lambda) <= 1e-2 * math.max(lambda, 1e-12),
      s"projection variance $varP vs lambda $lambda")
    // and the projection is genuinely the max-variance direction at the
    // per-axis level: it beats every coordinate axis
    assert(lambda >= (0 until dims).map(i => c(i)(i)).max - 1e-9)
  }

  test("q100 plan: one partial+final aggregation, buffers shuffle — not rows") {
    val plan = LlmOps.q100(spark, sf0001).queryExecution.executedPlan.toString
    // typed-Aggregator over arrays plans as ObjectHashAggregate with a
    // map-side partial: both phases present means each task pre-reduced
    // its rows into one buffer before the exchange
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2,
      s"expected partial+final ObjectHashAggregate:\n$plan")
    assert(!plan.contains("posexplode(embedding"),
      "corpus rows must not be exploded before aggregation")
  }
}
