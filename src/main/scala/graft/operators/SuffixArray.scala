package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

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
  *   2. re-rank: [[rankByKeyPath]] — a FUSED equality-preserving rank
  *      (every row takes the minimum global row_number of its key
  *      group). One range-partition shuffle, a per-partition stats pass
  *      (32 tiny rows to the driver), and one emit pass that lands the
  *      round's only materialization; the distinct-group count falls
  *      out of the stats for free. This replaces the r10 chain
  *      (GlobalOrder snapshot + rank land + group-min land + join land
  *      + count job — ~6 jobs, 4 scratch writes per round) whose FIXED
  *      job-scheduling cost dominated the build at every measured SF
  *      (BASELINE.md: 2.3–6.2 s/round regardless of data volume).
  *   3. convergence: all ranks distinct ⟺ the round's key-group count
  *      equals n (a byproduct of the stats pass; max(rank)==n would NOT
  *      do — it only proves the LAST group is a singleton). Suffixes
  *      are pairwise distinct, so convergence always arrives by gap ≥ n.
  *
  * Execution regime: CHECKPOINTED-ONLY, like [[Hits]] — each round
  * lands its rank relation to scratch parquet ([[ConnectedComponents]]
  * discipline), so plan size and lineage are constant per round and a
  * 100 TB corpus pays log₂(n) bounded passes (each: one equi-join
  * shuffle + one range-partitioned two-pass rank). Driver state is one
  * stats row per range partition per round, never data.
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
    * [[lcpFromLevels]] composes LCPs from. The last level is the final
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
    var (rPath, groups, n) =
      rankByKeyPath(toks0.select(col("tok"), col("pos")), Seq("tok"))
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
      val (newPath, newGroups, _) = rankByKeyPath(pairs, Seq("r1", "r2"))
      rPath = newPath
      groups = newGroups
      gap *= 2
      levels += ((gap, rPath))
      onRound(gap, groups, lap())
    }
    (levels.toSeq, n)
  }

  /** Adjacent-suffix LCP array over `toks0` — builds the hierarchy
    * internally and releases it. Callers that already hold a hierarchy
    * (or need it for something else too) use [[lcpFromLevels]] and pay
    * the doubling build ONCE. Output scratch DIR:
    * (rank, a_pos, b_pos, lcp) for rank 1..n-1 (pair = SA[rank],
    * SA[rank+1]). */
  def lcpPath(toks0: DataFrame): String = {
    val (levels, _) = hierarchyPaths(toks0)
    try lcpFromLevels(toks0.sparkSession, levels)
    finally levels.foreach { case (_, p) => Scratch.release(p) }
  }

  /** How many descent levels chain in ONE landed plan: each level is a
    * pair of equi-joins, so 4 levels = 8 chained joins — comfortably
    * inside Catalyst's depth while cutting the per-level scratch land
    * (the descent's fixed cost) 4×. */
  private val LcpLandEvery = 4

  /** The LCP descent from a PREBUILT doubling hierarchy (the companion
    * structure that makes the SA answer ExactSubstr questions: a
    * repeated run of length L exists ⟺ some adjacent LCP ≥ L; the
    * repeated extent is the SA interval around it). Token-wise LCP of
    * each SA-adjacent pair, computed WITHOUT comparing tokens: descend
    * the hierarchy's prefix lengths and greedily add level p whenever
    * ranks at (a+done, b+done) are equal at level p — binary
    * decomposition, log₂(n) rounds each a pair of equi-joins against
    * that level's landed ranks (positions past the end left-join to
    * null = mismatch), landed every [[LcpLandEvery]] rounds. Caller
    * owns `levels` (NOT released here). */
  def lcpFromLevels(spark: SparkSession, levels: Seq[(Long, String)]): String = {
    val fin = spark.read.parquet(levels.last._2)
    val a = fin.select(col("rank"), col("pos").as("a_pos"))
    val b = fin.select((col("rank") - 1).as("rank"), col("pos").as("b_pos"))
    var statePath = Scratch.materializePath(
      a.join(b, Seq("rank")).withColumn("lcp", lit(0L)), "sa-lcp")
    var state = spark.read.parquet(statePath)
    var sinceLand = 0
    val rev = levels.reverse
    for (((p, path), idx) <- rev.zipWithIndex) {
      val rp = spark.read.parquet(path)
      state = state
        .join(rp.select(col("pos").as("__ap"), col("rank").as("__ar")),
          col("__ap") === col("a_pos") + col("lcp"), "left")
        .join(rp.select(col("pos").as("__bp"), col("rank").as("__br")),
          col("__bp") === col("b_pos") + col("lcp"), "left")
        .withColumn("lcp",
          when(col("__ar").isNotNull && col("__br").isNotNull &&
            col("__ar") === col("__br"), col("lcp") + p)
            .otherwise(col("lcp")))
        .select(col("rank"), col("a_pos"), col("b_pos"), col("lcp"))
      sinceLand += 1
      if (sinceLand == LcpLandEvery || idx == rev.size - 1) {
        val newState = Scratch.materializePath(state, "sa-lcp")
        Scratch.release(statePath)
        statePath = newState
        state = spark.read.parquet(statePath)
        sinceLand = 0
      }
    }
    statePath
  }

  /** FUSED equality-preserving parallel rank: over the total order
    * (keys…, pos), every row takes the MINIMUM 1-based global
    * row_number of its key group — equal keys ⇒ equal rank, so rank
    * equality certifies key equality (the property every doubling round
    * depends on). No single-partition window and no group-min join:
    *
    *   1. range-partition + in-partition sort by (keys…, pos), persisted
    *      (MEMORY_AND_DISK_SER) so both passes see ONE layout — the
    *      range boundaries live in the fixed shuffle dependency, so even
    *      a lost-partition recompute reuses them;
    *   2. stats pass: per partition, one driver row (count, first/last
    *      key, distinct keys, local start of the last key group) —
    *      numPartitions rows total, never data;
    *   3. driver stitch: per-partition rank offsets plus the carry rank
    *      for key groups that straddle a partition boundary (a group
    *      spanning k partitions merges k−1 boundary pairs — the same
    *      arithmetic dedupes the global distinct-group count);
    *   4. emit pass: (pos, rank) with a per-partition linear scan,
    *      landed to scratch — the ONLY materialization.
    *
    * @return (scratch path of (pos, rank), distinct key groups, n) */
  private[operators] def rankByKeyPath(
      df: DataFrame, keys: Seq[String]): (String, Long, Long) = {
    val spark = df.sparkSession
    import spark.implicits._
    // the conf may hold a non-numeric value (e.g. "auto" under some AQE
    // setups) — fall back rather than throw
    val parts = scala.util.Try(
      spark.conf.get("spark.sql.shuffle.partitions", "32").toInt)
      .getOrElse(32)
    val sortCols = keys.map(col) :+ col("pos")
    val rows = df
      .repartitionByRange(parts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .select(struct(keys.map(col): _*).as("k"), col("pos").cast("long"))
      .rdd
      .persist(StorageLevel.MEMORY_AND_DISK_SER)
    try {
      // pass 1 — per-partition stats (tiny: one row per partition)
      val stats = rows.mapPartitionsWithIndex { (i, it) =>
        var count = 0L; var distinct = 0L; var lastStart = 0L
        var first: Row = null; var cur: Row = null
        while (it.hasNext) {
          val k = it.next().getStruct(0)
          if (count == 0L) first = k
          if (cur == null || k != cur) {
            distinct += 1; cur = k; lastStart = count
          }
          count += 1
        }
        Iterator.single((i, count, first, cur, distinct, lastStart))
      }.collect().sortBy(_._1)

      // driver stitch: offsets, boundary merges, head-group carry ranks
      val counts = stats.map(_._2)
      val offsets = counts.scanLeft(0L)(_ + _)
      val n = offsets.last
      val carry = Array.fill(stats.length)(-1L) // -1 ⇒ head starts a new group
      var groupCount = 0L
      var prevKey: Row = null
      var curStart = 0L // 1-based global rn where the open group started
      for (s <- stats; if s._2 > 0) {
        val (i, _, first, last, distinct, lastStart) = s
        val merged = prevKey != null && first == prevKey
        if (merged) carry(i) = curStart
        groupCount += distinct - (if (merged) 1 else 0)
        if (!(merged && distinct == 1L))
          curStart = offsets(i) + lastStart + 1
        prevKey = last
      }

      // pass 2 — emit (pos, rank); rank = group's first global rn
      val bc = spark.sparkContext.broadcast((offsets, carry))
      val ranked = rows.mapPartitionsWithIndex { (i, it) =>
        val (offs, carries) = bc.value
        val off = offs(i); val headCarry = carries(i)
        var cur: Row = null; var curRank = 0L; var localIdx = -1L
        it.map { r =>
          localIdx += 1
          val k = r.getStruct(0)
          if (cur == null) {
            cur = k
            curRank = if (headCarry >= 0L) headCarry else off + 1L
          } else if (k != cur) {
            cur = k
            curRank = off + localIdx + 1L
          }
          (r.getLong(1), curRank)
        }
      }
      val outPath =
        Scratch.materializePath(ranked.toDF("pos", "rank"), "suffix-ranks")
      (outPath, groupCount, n)
    } finally rows.unpersist(blocking = false)
  }
}
