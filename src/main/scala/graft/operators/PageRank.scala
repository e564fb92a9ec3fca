package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.{ColumnBridge => CB}

/** Integer-quantized PageRank — authority propagation over a directed
  * graph, the crawl-curation signal (domain/source authority) and the
  * third iterative operator next to [[ConnectedComponents]] (label
  * propagation) and [[KMeans]] (Lloyd).
  *
  * Semantics (synchronous, damping d = 0.85, simplified sink handling —
  * sink mass is not redistributed, the common formulation for authority
  * scoring where only relative order matters): with ranks held in
  * micro-units (1.0 == [[Scale]]),
  *
  *   rank'(v) = Scale*15/100  +  (85 * Σ_{u→v} rank(u) div outdeg(u)) div 100
  *
  * ALL arithmetic is non-negative integer math (`div` =
  * [[IntegralDivide]], exact associative long sums), so the result is
  * bit-reproducible under any partitioning / summation order and a fixed
  * iteration count is DuckDB-oracle-able as an unrolled CTE chain (the
  * q96 k-means pattern; DuckDB's `//` on non-negative BIGINTs computes
  * the identical quotient).
  *
  * Scale posture: each iteration is one shuffle of the rank relation
  * (O(nodes) rows) onto the edge partitioning plus one aggregation keyed
  * by dst — the canonical Pregel shape. The edge scan/exchange subtree is
  * IDENTICAL across iterations, so Catalyst plans it once and reuses the
  * exchange ([[ranks]] unrolls declaratively — no driver-side state, no
  * action at construction). For iteration counts beyond the unroll bound
  * use [[ranksCheckpointed]], which cuts lineage through scratch parquet
  * every round (the ConnectedComponents discipline) so plan size stays
  * constant per round; PageRankSpec proves the two regimes emit
  * identical ranks.
  */
object PageRank {

  /** rank 1.0 in integer micro-units. */
  val Scale = 1000000L
  private val Base = Scale * 15 / 100

  private def ldiv(a: Column, b: Column): Column =
    CB.column(new IntegralDivide(CB.expression(a), CB.expression(b)))

  private def nodesOf(edges: DataFrame): DataFrame =
    edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct()

  /** One synchronous iteration. `ranks`: (node, rankq). */
  private def step(edges: DataFrame, outdeg: DataFrame, nodes: DataFrame,
      ranks: DataFrame): DataFrame = {
    val contribs = edges
      .join(ranks, edges("src") === ranks("node"))
      .join(outdeg, Seq("src"))
      .select(col("dst"), ldiv(col("rankq"), col("outdeg")).as("c"))
      .groupBy(col("dst")).agg(sum(col("c")).as("csum"))
    nodes.alias("n")
      .join(contribs, col("n.node") === contribs("dst"), "left")
      .select(col("n.node").as("node"),
        (lit(Base) + ldiv(lit(85L) * coalesce(col("csum"), lit(0L)), lit(100L)))
          .as("rankq"))
  }

  /** `iters` iterations, fully declarative (lazy — no jobs until the
    * caller acts). `edges`: (src: long, dst: long), duplicate edges count
    * double (pre-`distinct` if unwanted). Capped at 16 unrolled
    * iterations — past that the nested-join plan outgrows the optimizer;
    * use [[ranksCheckpointed]]. */
  def ranks(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 16,
      s"iters=$iters out of the unroll bound [1,16]; use ranksCheckpointed")
    val nodes = nodesOf(edges)
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    var r = nodes.withColumn("rankq", lit(Scale))
    for (_ <- 1 to iters) r = step(edges, outdeg, nodes, r)
    r
  }

  /** Same ranks, arbitrary depth: materializes the rank relation to
    * scratch parquet each iteration and releases the previous one, so
    * plan size and driver memory are constant per round (the
    * ConnectedComponents discipline). Runs jobs eagerly (one write per
    * iteration) and returns the scratch DIR of the final (node, rankq)
    * relation — the caller reads it and calls [[Scratch.release]] when
    * done, exactly like `ConnectedComponents.labelsPath`. */
  def ranksCheckpointedPath(edges0: DataFrame, iters: Int): String = {
    require(iters >= 1, s"iters=$iters must be >= 1")
    val spark = edges0.sparkSession
    // materialize the edge relation once: every iteration re-reads it,
    // and for a derived edge set recomputation would multiply its cost
    val edgesPath = Scratch.materializePath(
      edges0.select(col("src"), col("dst")), "pagerank-edges")
    try {
      val edges = graft.Tables.parquet(spark, edgesPath)
      val nodes = nodesOf(edges)
      val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      var path = Scratch.materializePath(
        nodes.withColumn("rankq", lit(Scale)), "pagerank-ranks")
      try {
        for (_ <- 1 to iters) {
          val next = step(edges, outdeg, nodes, graft.Tables.parquet(spark, path))
          val nextPath = Scratch.materializePath(next, "pagerank-ranks")
          Scratch.release(path)
          path = nextPath
        }
        path
      } catch { case t: Throwable => Scratch.release(path); throw t }
    } finally Scratch.release(edgesPath)
  }
}
