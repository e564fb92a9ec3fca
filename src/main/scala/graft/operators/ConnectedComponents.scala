package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation — the Pregel
  * pattern: each propagation step is one equi-join + groupBy on the node
  * set, and each ROUND batches two steps before its convergence check, so
  * components converge in O(diameter / 2) rounds ≈ O(log n) for near-dup
  * families with half the job-submission overhead. Labels only ever
  * decrease, so Σlbl strictly decreases iff any label changed —
  * convergence is a one-row aggregate per round, never a join-based diff;
  * the driver holds a single Long, never the graph.
  *
  * Lifecycle (the round-2 lesson): each round caches its final labels
  * (only — the intermediate step is deliberately uncached, see the loop
  * comment) and unpersists the previous round's, so lineage stays flat
  * and at most one cached round is ever resident; the converged result is
  * materialized to scratch parquet and the last cache dropped, leaving
  * zero persisted state for whoever consumes the returned relation.
  */
object ConnectedComponents {

  /** @param pairs undirected edges (da, db). MUST be cheap to rescan —
    *   each round references the edge relation three times (two
    *   propagation steps + the outer join's left side), i.e. up to six
    *   pairs scans when exchange reuse does not dedup them; run it
    *   through [[Scratch.materialize]] first if it is derived.
    * @param maxIters round budget; each round is TWO propagation steps,
    *   so components up to diameter 2×maxIters converge.
    * @param onRound test hook invoked with each round's label relation
    *   before its action (plan assertions).
    * @return (doc_id, lbl) with lbl = min node id of the component,
    *   scratch-materialized — no cache survives this call. */
  def minLabelPropagation(
      pairs: DataFrame,
      maxIters: Int = 20,
      onRound: DataFrame => Unit = _ => ()): DataFrame = {
    val edges = pairs.select(col("da").as("a"), col("db").as("b"))
      .union(pairs.select(col("db").as("a"), col("da").as("b")))
    val nodes = edges.select(col("a").as("doc_id")).distinct()
    var labels = nodes.withColumn("lbl", col("doc_id")).cache()
    var lblSum = sumOfLabels(labels)
    var converged = false
    var iter = 0

    // one propagation step: each node takes min(own label, neighbors')
    def step(l: DataFrame): DataFrame = {
      val nbrMin = edges.join(l, edges("b") === l("doc_id"))
        .groupBy(edges("a")).agg(min(col("lbl")).as("nlbl"))
      l.alias("l")
        .join(nbrMin, col("l.doc_id") === nbrMin("a"), "left")
        .select(col("l.doc_id").as("doc_id"),
          least(col("l.lbl"), coalesce(col("nlbl"), col("l.lbl"))).as("lbl"))
    }

    // each ROUND applies two propagation steps before the convergence
    // action — halves the per-job overhead that dominates on small node
    // sets (the convergence sum is a one-row driver flag either way).
    // maxIters budgets rounds (so up to 2×maxIters step diameter);
    // detecting the fixpoint costs one extra no-change round, hence +1 —
    // a graph settling exactly on round maxIters must confirm, not throw
    while (!converged && iter < maxIters + 1) {
      // the intermediate step is deliberately NOT cached: the outer step
      // references it on both join sides, but measurement shows exchange
      // reuse covers that (caching the mid DOUBLED q61/q73 — columnar
      // materialization costs more than the worst-case recompute here)
      val next = step(step(labels)).cache()
      onRound(next)
      val nextSum = sumOfLabels(next)
      labels.unpersist()
      labels = next
      converged = nextSum == lblSum
      lblSum = nextSum
      iter += 1
    }
    if (!converged) {
      // a silent partial closure would emit split clusters that LOOK valid
      // — fail loudly instead (component diameter exceeded maxIters)
      labels.unpersist()
      throw new IllegalStateException(
        s"label propagation did not converge after $iter rounds " +
          s"(${2 * iter} propagation steps; maxIters=$maxIters allows " +
          s"$iter rounds incl. the confirm round) — component diameter " +
          "exceeds the budget; raise maxIters for this graph")
    }
    val out = Scratch.materialize(labels, "cc-labels")
    labels.unpersist()
    out
  }

  private def sumOfLabels(labels: DataFrame): Long =
    labels.agg(coalesce(sum(col("lbl")), lit(0L))).collect()(0).getLong(0)
}
