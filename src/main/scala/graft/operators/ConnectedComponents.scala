package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}

/** Connected components by iterative min-label propagation — the Pregel
  * pattern: each propagation step is one equi-join + groupBy on the node
  * set, and each ROUND batches two steps before its convergence check, so
  * components converge in O(diameter / 2) rounds ≈ O(log n) for near-dup
  * families with half the job-submission overhead. Labels only ever
  * decrease, so any change alters the (doc_id, lbl) pair set —
  * convergence is a one-row fingerprint aggregate per round
  * ([[labelFingerprint]]), never a join-based diff; the driver holds two
  * Longs, never the graph.
  *
  * Lifecycle (the round-2 lesson, hardened in round 5): each round
  * scratch-materializes its labels to parquet and releases the previous
  * round's dir, so at most one round is ever on disk and — critically —
  * the LOGICAL plan is cut to a flat parquet scan every round. A
  * cache()-based loop truncates recomputation but NOT the analyzed plan:
  * `step(step(labels))` references `labels` four times, so plan size
  * grows ~4^rounds and a graph needing ~10 rounds (diameter ~20 — normal
  * for a giant near-dup component at corpus scale) spends unbounded time
  * in analysis/plan-stringification before any task runs (measured: a
  * 10k-edge random graph with a giant component hung >14 min in
  * generateTreeString under the cached variant; it converges in seconds
  * materialized). Same cure as GraphX/GraphFrames' checkpoint interval,
  * with interval 1; no cached state survives the call.
  */
object ConnectedComponents {

  /** Edge-count threshold below which the closure is solved by a
    * single-task union-find instead of the iterative join loop. The loop
    * costs ~10 tiny shuffle stages PER ROUND regardless of data size —
    * on a few hundred edges that is seconds of pure scheduling for work
    * one core does in microseconds (measured at sf0.1: 4.2s for 2 rounds
    * over 256 edges). Calibrated from the [[graft.tools.CcCrossover]]
    * sweep (random small-component graphs — the near-dup edge shape, and
    * the distributed loop's BEST case since it converges in few rounds;
    * local[32], shared-VM load): local / distributed seconds were
    * 0.6/9 at 10k edges, 0.5/11 at 100k, 1.2/177 at 1M, 12/209 at 4M,
    * 20/456 at 16M — the local solve never stops winning on wall time in
    * the measurable range, so the cap is set by single-task MEMORY, not
    * speed: 4M edges bounds the union-find parent map at ≤8M nodes
    * (~400 MB of HashMap state), inside a default executor task budget,
    * while 16M+ would gamble on multi-GB single-task heap. Graphs above
    * the cap take the distributed loop. This is the standard two-regime
    * CC design: distributed propagation while the graph is large, a
    * local solve once (or when) it is small. The count that drives the
    * dispatch is metadata-cheap on the scratch parquet the caller is
    * required to pass. */
  val LocalMaxEdges: Long = 1L << 22

  /** @param pairs undirected edges (da, db). MUST be cheap to rescan —
    *   each round references the edge relation three times (two
    *   propagation steps + the outer join's left side), i.e. up to six
    *   pairs scans when exchange reuse does not dedup them; run it
    *   through [[Scratch.materialize]] first if it is derived.
    * @param maxIters round budget; each round is TWO propagation steps,
    *   so components up to diameter 2×maxIters converge.
    * @param onRound test hook invoked with each round's label relation
    *   before its action (plan assertions). Distributed loop only — the
    *   single-task regime has no rounds.
    * @param localMaxEdges override of [[LocalMaxEdges]]; pass -1 to pin
    *   the distributed loop (plan tests), Long.MaxValue to pin local.
    * @return (doc_id, lbl) with lbl = min node id of the component,
    *   scratch-materialized — no cache survives this call. The labels
    *   dir lives until JVM exit (the relation reads it lazily); a caller
    *   that loops should use [[minLabelPropagationPath]] and own the
    *   dir's release/memoization. */
  def minLabelPropagation(
      pairs: DataFrame,
      maxIters: Int = 20,
      onRound: DataFrame => Unit = _ => (),
      localMaxEdges: Long = LocalMaxEdges): DataFrame =
    graft.Tables.parquet(pairs.sparkSession,
      minLabelPropagationPath(pairs, maxIters, onRound, localMaxEdges))

  /** [[minLabelPropagation]] returning the scratch-parquet PATH of the
    * labels relation, so the caller controls its lifecycle (memoize per
    * dataset, or [[Scratch.release]] after the last consumer) instead of
    * orphaning one labels dir per invocation. */
  def minLabelPropagationPath(
      pairs: DataFrame,
      maxIters: Int = 20,
      onRound: DataFrame => Unit = _ => (),
      localMaxEdges: Long = LocalMaxEdges): String = {
    val idType = pairs.schema("da").dataType
    val localCapable = idType match {
      case LongType | IntegerType | StringType => true
      case _ => false
    }
    // localMaxEdges < 0 pins the distributed loop — short-circuit BEFORE
    // the count() action, which would otherwise scan (or for derived
    // inputs recompute) the edge relation without affecting the dispatch
    if (localCapable && localMaxEdges >= 0 && pairs.count() <= localMaxEdges)
      return localUnionFind(pairs)
    val spark = pairs.sparkSession
    val edges = pairs.select(col("da").as("a"), col("db").as("b"))
      .union(pairs.select(col("db").as("a"), col("da").as("b")))
    val nodes = edges.select(col("a").as("doc_id")).distinct()
    var labelsPath = Scratch.materializePath(
      nodes.withColumn("lbl", col("doc_id")), "cc-labels")
    var labels = graft.Tables.parquet(spark, labelsPath)
    var lblFp = labelFingerprint(labels)
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

    // each ROUND applies two propagation steps, materializes the result
    // to scratch parquet (the round's one job), and reads it back — the
    // lineage cut that keeps plan size CONSTANT per round (see class
    // doc; the mid-step stays unmaterialized: exchange reuse covers its
    // double reference, measured cheaper than a second write).
    // maxIters budgets rounds (so up to 2×maxIters step diameter);
    // detecting the fixpoint costs one extra no-change round, hence +1 —
    // a graph settling exactly on round maxIters must confirm, not throw
    // failure path releases the live round dir(s): a driver that catches
    // a transient job failure and retries must not accumulate one
    // orphaned cc-labels dir per attempt (release is idempotent, so the
    // non-convergence branch below releasing first is fine)
    try {
      while (!converged && iter < maxIters + 1) {
        val computed = step(step(labels))
        onRound(computed)
        val nextPath = Scratch.materializePath(computed, "cc-labels")
        val next = graft.Tables.parquet(spark, nextPath)
        val nextFp =
          try labelFingerprint(next)
          catch { case t: Throwable => Scratch.release(nextPath); throw t }
        Scratch.release(labelsPath)
        labelsPath = nextPath
        labels = next
        converged = nextFp == lblFp
        lblFp = nextFp
        iter += 1
      }
      if (!converged) {
        // a silent partial closure would emit split clusters that LOOK
        // valid — fail loudly (component diameter exceeded maxIters)
        throw new IllegalStateException(
          s"label propagation did not converge after $iter rounds " +
            s"(${2 * iter} propagation steps; maxIters=$maxIters allows " +
            s"$iter rounds incl. the confirm round) — component diameter " +
            "exceeds the budget; raise maxIters for this graph")
      }
    } catch {
      case t: Throwable => Scratch.release(labelsPath); throw t
    }
    labelsPath
  }

  /** Order-independent fingerprint of the label relation: XOR of two
    * independently-seeded xxhash64 row hashes (one row in the driver).
    * Labels only ever decrease, so any propagation change alters the
    * (doc_id, lbl) pair set and — up to a ~2^-128 double-collision —
    * the fingerprint; convergence is fingerprint equality across
    * consecutive rounds. XOR rather than the previous SUM(lbl): a sum
    * type-coerces (and crashes) for the StringType ids the local regime
    * explicitly supports, and overflows for full-range long ids (e.g.
    * xxhash64-derived node ids) under ANSI arithmetic. */
  private def labelFingerprint(labels: DataFrame): (Long, Long) = {
    // salt FIRST: Spark's xxhash64 chains its args column-by-column from
    // a fixed seed, so a trailing salt would give two finalizations of
    // the SAME chain state (one 2^-64 state collision defeats both); a
    // leading salt diverges the chains from step one, making the two
    // row-hash families independent (~2^-128 joint collision)
    val r = labels.agg(
      coalesce(bit_xor(xxhash64(lit(1), col("doc_id"), col("lbl"))), lit(0L)),
      coalesce(bit_xor(xxhash64(lit(2), col("doc_id"), col("lbl"))), lit(0L)))
      .collect()(0)
    (r.getLong(0), r.getLong(1))
  }

  /** Small-graph regime: ship every edge to ONE task and run union-find
    * with union-by-min-root — the root of each set is always its minimum
    * id (a root only ever cedes to a smaller root), so labels match the
    * propagation loop's min-label fixpoint exactly. One job, no rounds,
    * no cached state; output goes through the same scratch
    * materialization as the distributed path. */
  private def localUnionFind(pairs: DataFrame): String = {
    val idType = pairs.schema("da").dataType
    val lt: (Any, Any) => Boolean = idType match {
      case LongType    => (a, b) => a.asInstanceOf[Long] < b.asInstanceOf[Long]
      case IntegerType => (a, b) => a.asInstanceOf[Int] < b.asInstanceOf[Int]
      // UTF8String byte order, NOT Java String order: the distributed
      // loop's min() compares UTF-8 bytes, and the two orders disagree on
      // supplementary characters (surrogates sort low in UTF-16, high in
      // UTF-8) — the regimes must pick identical component labels
      case StringType  => (a, b) =>
        org.apache.spark.unsafe.types.UTF8String.fromString(a.asInstanceOf[String])
          .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b.asInstanceOf[String])) < 0
      case t => throw new IllegalArgumentException(s"unsupported id type $t")
    }
    val outSchema = StructType(Seq(
      StructField("doc_id", idType, nullable = false),
      StructField("lbl", idType, nullable = false)))
    implicit val enc: Encoder[Row] = Encoders.row(outSchema)
    val labeled = pairs.select(col("da"), col("db")).coalesce(1)
      .mapPartitions { it =>
        val parent = new java.util.HashMap[Any, Any]()
        def find(x: Any): Any = {
          var r = x
          while (parent.get(r) != r) r = parent.get(r)
          // path compression: second pass points the chain at the root
          var c = x
          while (parent.get(c) != r) { val n = parent.get(c); parent.put(c, r); c = n }
          r
        }
        it.foreach { row =>
          val a = row.get(0); val b = row.get(1)
          parent.putIfAbsent(a, a); parent.putIfAbsent(b, b)
          val ra = find(a); val rb = find(b)
          if (ra != rb) {
            if (lt(rb, ra)) parent.put(ra, rb) else parent.put(rb, ra)
          }
        }
        import scala.jdk.CollectionConverters._
        parent.keySet().asScala.iterator.map(n => Row(n, find(n)))
      }
    Scratch.materializePath(labeled, "cc-labels")
  }
}
