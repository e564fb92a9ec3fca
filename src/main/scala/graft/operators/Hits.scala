package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.{ColumnBridge => CB}

/** Integer-quantized HITS (Kleinberg's hubs & authorities) — the
  * second link-analysis operator next to [[PageRank]]. Where PageRank
  * yields one authority score, HITS separates "pages that point at good
  * content" (hubs) from "content good pages point at" (authorities) —
  * in a curation pipeline: source feeds that aggregate high-value
  * documents vs the documents themselves.
  *
  * Semantics (synchronous mutual reinforcement over WEIGHTED edges,
  * scores in milli-units, 1.0 == [[Scale]]):
  *
  *   a'(v) = norm( Σ_{u→v} w(u,v)·h(u) )   then   h'(v) = norm( Σ_{v→x} w(v,x)·a'(x) )
  *
  * where norm(x) = (x · Scale) div max(x) — the integer stand-in for
  * the usual per-round normalization (any positive per-round scalar
  * preserves the ranking; dividing by the round max keeps every score
  * in [0, Scale] so magnitudes never grow and a fixed iteration count
  * never overflows, unlike the unnormalized integer variant whose
  * values multiply by the max weighted degree each half-round). All
  * arithmetic is non-negative integer math ([[IntegralDivide]], exact
  * associative long sums) — bit-reproducible under any partitioning, so
  * a fixed iteration count is DuckDB-oracle-able as an unrolled CTE
  * chain (the [[PageRank]] / q96 pattern).
  *
  * Execution regime: CHECKPOINTED-ONLY (the [[ConnectedComponents]] /
  * [[PageRank.ranksCheckpointedPath]] discipline). A declarative unroll
  * is the wrong shape for HITS specifically: each norm step references
  * its raw relation twice (the values and their max), so an unrolled
  * logical plan DOUBLES per half-round — 2 rounds already inline the
  * edge derivation ~32× (runtime exchange reuse collapses some copies,
  * but plan size, optimizer time and the failure surface still grow
  * exponentially). Landing each half-round to scratch parquet keeps the
  * plan CONSTANT per round: every step reads two small landed relations
  * (edges, previous scores), and the raw/max double-reference costs one
  * extra scan of a tiny parquet instead of a duplicated subtree.
  *
  * Scale posture: each half-round is one join of the O(nodes) score
  * relation onto the landed edge partitioning plus one aggregation
  * keyed by the opposite endpoint (the Pregel shape); the round max is
  * a 1-row aggregate broadcast back — never a shuffle of the graph.
  */
object Hits {

  /** score 1.0 in integer milli-units. */
  val Scale = 1000L

  private def ldiv(a: Column, b: Column): Column =
    CB.column(new IntegralDivide(CB.expression(a), CB.expression(b)))

  /** `iters` full (authority + hub) rounds over weighted `edges0`:
    * (src: long, dst: long, w: long, w ≥ 1 — `lit(1)` for an unweighted
    * graph; a parallel-edge multiset pre-aggregates to its
    * multiplicity). Runs eagerly (edge landing + two scratch writes per
    * round) and returns the scratch DIR of the final (node, hubq,
    * authq) relation — the caller reads it and calls [[Scratch.release]]
    * when done (or memoizes it per dataset, the q61/q73 pattern).
    * Edges must be non-empty (the round max is a divisor). Overflow
    * bound: scores stay ≤ [[Scale]], so each raw sum is ≤ Scale·Σw and
    * the normalize multiply needs Scale²·Σw < 2⁶³ — Σw up to ~9·10¹²
    * (one unit per 100 TB fact row) is safe. */
  def scoresPath(edges0: DataFrame, iters: Int): String = {
    require(iters >= 1, s"iters=$iters must be >= 1")
    val spark = edges0.sparkSession
    val edgesPath = Scratch.materializePath(edges0, "hits-edges")
    try {
      val edges = graft.Tables.parquet(spark, edgesPath)
      val nodes = edges.select(col("src").as("node"))
        .union(edges.select(col("dst").as("node")))
        .distinct()
      var hPath =
        Scratch.materializePath(nodes.withColumn("hubq", lit(Scale)), "hits-h")
      var aPath: String = null

      def halfRound(scores: DataFrame, scoreCol: String, joinEnd: String,
          groupEnd: String, outCol: String): DataFrame = {
        val raw = edges.join(scores, edges(joinEnd) === scores("node"))
          .groupBy(col(groupEnd)).agg(sum(col("w") * col(scoreCol)).as("raw"))
        val mx = raw.agg(max(col("raw")).as("mx"))
        nodes.join(raw, col("node") === col(groupEnd), "left")
          .crossJoin(broadcast(mx))
          .select(col("node"),
            ldiv(coalesce(col("raw"), lit(0L)) * Scale, col("mx")).as(outCol))
      }

      for (_ <- 1 to iters) {
        val h = graft.Tables.parquet(spark, hPath)
        val a = halfRound(h, "hubq", "src", "dst", "authq")
        val newAPath = Scratch.materializePath(a, "hits-a")
        if (aPath != null) Scratch.release(aPath)
        aPath = newAPath
        val aLanded = graft.Tables.parquet(spark, aPath)
        val hNext = halfRound(aLanded, "authq", "dst", "src", "hubq")
        val newHPath = Scratch.materializePath(hNext, "hits-h")
        Scratch.release(hPath)
        hPath = newHPath
      }
      val result = graft.Tables.parquet(spark, hPath)
        .join(graft.Tables.parquet(spark, aPath), "node")
        .select(col("node"), col("hubq"), col("authq"))
      val resultPath = Scratch.materializePath(result, "hits-scores")
      Scratch.release(hPath)
      Scratch.release(aPath)
      resultPath
    } finally Scratch.release(edgesPath)
  }

  /** Convenience: [[scoresPath]] read back as a DataFrame. The backing
    * scratch dir lives until JVM exit (or until the caller releases the
    * path obtained via [[scoresPath]] directly) — repeated calls
    * re-run the build; memoize per dataset when calling from a
    * registered query. */
  def scores(edges: DataFrame, iters: Int): DataFrame = {
    val spark = edges.sparkSession
    graft.Tables.parquet(spark, scoresPath(edges, iters))
  }
}
