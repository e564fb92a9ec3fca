package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed suffix-array construction by PREFIX DOUBLING
  * (Manber–Myers) — the real index behind exact-substring dedup (Lee et
  * al. 2022 build one over the whole training corpus to find every
  * repeated ≥50-token run; q116's gram-gate is the streaming
  * approximation, this is the exact artifact). log₂(n) rounds; after
  * round k every suffix is ranked by its first 2^k tokens, and round
  * k+1 ranks by the pair (rank[pos], rank[pos+2^k]) — a sort on two
  * integers, never a string comparison past round 0.
  *
  * Round shape (all standard relational ops):
  *   1. pair join: rank relation joined to itself shifted by the gap —
  *      a PURE EQUI-join on pos (the shift is precomputed map-side);
  *      suffixes running past the end take rank 0, which sorts before
  *      every real rank ≥ 1 (shorter suffix first — the suffix-order
  *      tiebreak).
  *   2. re-rank: [[GlobalOrder]] row_number over (r1, r2, pos) — the
  *      range-partitioned parallel rank, no single-partition window —
  *      then min-row_number per (r1, r2) group restores
  *      EQUALITY-PRESERVATION (equal 2^(k+1)-prefixes ⇒ equal rank),
  *      which plain row_number would break.
  *   3. convergence: all ranks distinct ⟺ the round's key-group count
  *      equals n (counted on the bounded group-min relation, one number
  *      to the driver per round; max(rank)==n would NOT do — it only
  *      proves the LAST group is a singleton). Suffixes are pairwise
  *      distinct, so convergence always arrives by gap ≥ n.
  *
  * Execution regime: CHECKPOINTED-ONLY, like [[Hits]] — each round
  * lands its rank relation to scratch parquet ([[ConnectedComponents]]
  * discipline), so plan size and lineage are constant per round and a
  * 100 TB corpus pays log₂(n) bounded passes (each: one equi-join
  * shuffle + one range-partitioned rank + one bounded group-min join).
  * Driver state is one Long per round.
  */
object SuffixArray {

  /** Token-wise lexicographic suffix ranks over `toks0`: (pos: Long —
    * 0-based, CONTIGUOUS 0..n-1 — and tok: String). Runs eagerly;
    * returns the scratch DIR of the final (pos, rank) relation (rank is
    * the 1-based position of suffix `pos` in sorted suffix order — the
    * inverse suffix array; sort by rank to read the SA itself). The
    * caller reads it and [[Scratch.release]]s when done, or memoizes
    * per dataset (the q61/q117 pattern). */
  def ranksPath(toks0: DataFrame): String = {
    val (levels, _) = hierarchyPaths(toks0)
    levels.init.foreach { case (_, p) => Scratch.release(p) }
    levels.last._2
  }

  /** The full doubling-rank HIERARCHY: every round's landed (pos, rank)
    * relation tagged with its prefix length (1, 2, 4, …) — round k's
    * ranks order suffixes by their first 2^k tokens, and rank EQUALITY
    * at level p means "first p tokens equal", which is the primitive
    * [[lcpPath]] composes LCPs from. The last level is the final
    * (all-distinct) ranking. Caller releases every path (or the init
    * via [[ranksPath]]). `onRound` is a measurement hook (prefixLen,
    * distinct groups, wall secs) fired after every landed round — the
    * scale harness records per-round cost through it; the default is
    * free. @return (levels ordered by prefixLen asc, n) */
  def hierarchyPaths(toks0: DataFrame,
      onRound: (Long, Long, Double) => Unit = (_, _, _) => ())
      : (Seq[(Long, String)], Long) = {
    val spark = toks0.sparkSession
    var t0 = System.nanoTime()
    def lap(): Double = {
      val t1 = System.nanoTime(); val s = (t1 - t0) / 1e9; t0 = t1; s
    }
    // round 0: rank by the single leading token (the only string sort)
    val (p0, n) = GlobalOrder.rowNumberPath(
      toks0.select(col("pos"), col("tok")), "rn", col("tok"), col("pos"))
    var (rPath, groups) = groupMinPath(spark.read.parquet(p0), Seq("tok"))
    Scratch.release(p0)
    val levels = scala.collection.mutable.ArrayBuffer((1L, rPath))
    onRound(1L, groups, lap())

    var gap = 1L
    while (groups < n && gap < n) {
      val r = spark.read.parquet(rPath)
      val shifted = r.select((col("pos") - gap).as("pos"),
        col("rank").as("r2"))
      val pairs = r.select(col("pos"), col("rank").as("r1"))
        .join(shifted, Seq("pos"), "left")
        .select(col("pos"), col("r1"), coalesce(col("r2"), lit(0L)).as("r2"))
      val (pp, _) = GlobalOrder.rowNumberPath(pairs, "rn",
        col("r1"), col("r2"), col("pos"))
      val (newPath, newGroups) = groupMinPath(spark.read.parquet(pp),
        Seq("r1", "r2"))
      Scratch.release(pp)
      rPath = newPath
      groups = newGroups
      gap *= 2
      levels += ((gap, rPath))
      onRound(gap, groups, lap())
    }
    (levels.toSeq, n)
  }

  /** Adjacent-suffix LCP array from the rank hierarchy — the companion
    * structure that makes the SA answer ExactSubstr questions (a
    * repeated run of length L exists ⟺ some adjacent LCP ≥ L; the
    * repeated extent is the SA interval around it). Token-wise LCP of
    * each SA-adjacent pair, computed WITHOUT comparing tokens: descend
    * the hierarchy's prefix lengths and greedily add level p whenever
    * ranks at (a+done, b+done) are equal at level p — binary
    * decomposition, so log₂(n) rounds each a pair of equi-joins against
    * that level's landed ranks (positions past the end left-join to
    * null = mismatch). All levels released before return. Output
    * scratch DIR: (rank, a_pos, b_pos, lcp) for rank 1..n-1 (pair =
    * SA[rank], SA[rank+1]). */
  def lcpPath(toks0: DataFrame): String = {
    val spark = toks0.sparkSession
    val (levels, _) = hierarchyPaths(toks0)
    try {
      val fin = spark.read.parquet(levels.last._2)
      val a = fin.select(col("rank"), col("pos").as("a_pos"))
      val b = fin.select((col("rank") - 1).as("rank"), col("pos").as("b_pos"))
      var statePath = Scratch.materializePath(
        a.join(b, Seq("rank")).withColumn("lcp", lit(0L)), "sa-lcp")
      for ((p, path) <- levels.reverse) {
        val rp = spark.read.parquet(path)
        val state = spark.read.parquet(statePath)
        val withA = state
          .join(rp.select(col("pos").as("__ap"), col("rank").as("__ar")),
            col("__ap") === col("a_pos") + col("lcp"), "left")
        val next = withA
          .join(rp.select(col("pos").as("__bp"), col("rank").as("__br")),
            col("__bp") === col("b_pos") + col("lcp"), "left")
          .withColumn("lcp",
            when(col("__ar").isNotNull && col("__br").isNotNull &&
              col("__ar") === col("__br"), col("lcp") + p)
              .otherwise(col("lcp")))
          .select(col("rank"), col("a_pos"), col("b_pos"), col("lcp"))
        val newState = Scratch.materializePath(next, "sa-lcp")
        Scratch.release(statePath)
        statePath = newState
      }
      statePath
    } finally levels.foreach { case (_, p) => Scratch.release(p) }
  }

  /** Equality-preserving rank from a total-order row_number: every row
    * takes the MINIMUM row_number of its key group (broadcast-friendly
    * group side: ≤ one row per distinct key). Lands to scratch.
    * @return (path, distinct key-group count — the convergence signal) */
  private def groupMinPath(
      ranked: DataFrame, keys: Seq[String]): (String, Long) = {
    val keyCols = keys.map(col)
    val keyMin = ranked.groupBy(keyCols: _*).agg(min(col("rn")).as("rank"))
    val keyPath = Scratch.materializePath(keyMin, "suffix-keymin")
    val landedKeys = ranked.sparkSession.read.parquet(keyPath)
    val out = ranked.join(landedKeys, keys)
      .select(col("pos"), col("rank"))
    val outPath = Scratch.materializePath(out, "suffix-ranks")
    val groups = landedKeys.count()
    Scratch.release(keyPath)
    (outPath, groups)
  }
}
