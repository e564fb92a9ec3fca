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
    val spark = toks0.sparkSession

    // round 0: rank by the single leading token (the only string sort)
    val (p0, n) = GlobalOrder.rowNumberPath(
      toks0.select(col("pos"), col("tok")), "rn", col("tok"), col("pos"))
    var (rPath, groups) = groupMinPath(spark.read.parquet(p0), Seq("tok"))
    Scratch.release(p0)

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
      Scratch.release(rPath)
      rPath = newPath
      groups = newGroups
      gap *= 2
    }
    rPath
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
