package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** SuffixArray (prefix doubling): reference-implementation equality on
  * random token sequences, permutation validity, prefix-tiebreak
  * semantics. */
class SuffixArraySpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side brute force: rank = 1-based position in token-wise
    * lexicographically sorted suffix order. */
  private def reference(toks: Seq[String]): Map[Long, Long] = {
    def less(a: Int, b: Int): Boolean = {
      val sa = toks.drop(a); val sb = toks.drop(b)
      sa.zip(sb).collectFirst {
        case (x, y) if x != y => x < y
      }.getOrElse(sa.length < sb.length)
    }
    toks.indices.sortWith(less).zipWithIndex
      .map { case (pos, r) => pos.toLong -> (r + 1).toLong }.toMap
  }

  private def sparkRanks(toks: Seq[String]): Map[Long, Long] = {
    val df = toks.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("pos", "tok")
    val path = SuffixArray.ranksPath(df)
    try spark.read.parquet(path).select("pos", "rank")
      .as[(Long, Long)].collect().toMap
    finally Scratch.release(path)
  }

  test("matches the brute-force suffix sort on random token sequences (property)") {
    // tiny alphabet with a prefix pair ("a" vs "ab") so the doubling's
    // shorter-suffix-first tiebreak and equal-prefix groups both fire
    val genSeq = for {
      n <- Gen.choose(1, 40)
      ts <- Gen.listOfN(n, Gen.oneOf("a", "b", "ab"))
    } yield ts
    val cases = (0 until 6).flatMap { i =>
      genSeq(Gen.Parameters.default, Seed(11L + i))
    }.filter(_.nonEmpty)
    assert(cases.size >= 4, "generator starved — property vacuous")
    for (ts <- cases) {
      assert(sparkRanks(ts) == reference(ts), s"divergence on $ts")
    }
  }

  test("LCP from the rank hierarchy matches brute-force adjacent LCP (property)") {
    def bruteLcp(toks: Seq[String]): Map[Long, (Long, Long, Long)] = {
      val ranks = reference(toks) // pos -> rank
      val byRank = ranks.toSeq.map(_.swap).toMap // rank -> pos
      (1L until toks.length.toLong).map { r =>
        val a = byRank(r).toInt; val b = byRank(r + 1).toInt
        val sa = toks.drop(a); val sb = toks.drop(b)
        val l = sa.zip(sb).takeWhile { case (x, y) => x == y }.length
        r -> (a.toLong, b.toLong, l.toLong)
      }.toMap
    }
    def sparkLcp(toks: Seq[String]): Map[Long, (Long, Long, Long)] = {
      val df = toks.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("pos", "tok")
      val path = SuffixArray.lcpPath(df)
      try spark.read.parquet(path).as[(Long, Long, Long, Long)].collect()
        .map { case (r, a, b, l) => r -> (a, b, l) }.toMap
      finally Scratch.release(path)
    }
    val genSeq = for {
      n <- Gen.choose(2, 30)
      ts <- Gen.listOfN(n, Gen.oneOf("a", "b", "ab"))
    } yield ts
    val cases = (0 until 4).flatMap { i =>
      genSeq(Gen.Parameters.default, Seed(29L + i))
    }.filter(_.size >= 2) :+ (Seq.fill(8)(Seq("x", "y")).flatten :+ "z")
    for (ts <- cases)
      assert(sparkLcp(ts) == bruteLcp(ts), s"LCP divergence on $ts")
  }

  /** Force the pure-GLOBAL regime (maxLocalGroup = 0 ⇒ the active-set
    * switch never fires) — the skew-safe path a 100 TB opener round
    * takes. */
  private def sparkRanksGlobalOnly(toks: Seq[String]): Map[Long, Long] = {
    val df = toks.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("pos", "tok")
    val h = SuffixArray.hierarchy(df, maxLocalGroup = 0L)
    try {
      assert(h.finalsPath.isEmpty, "global-only build must never switch")
      assert(h.levels.forall(_.full))
      h.finalRanksDf(spark).as[(Long, Long)].collect().toMap
    } finally h.release()
  }

  test("global-only and active-set regimes agree with the reference (property)") {
    val genSeq = for {
      n <- Gen.choose(4, 40)
      ts <- Gen.listOfN(n, Gen.oneOf("a", "b", "ab"))
    } yield ts
    val cases = (0 until 5).flatMap { i =>
      genSeq(Gen.Parameters.default, Seed(43L + i))
    }.filter(_.nonEmpty)
    assert(cases.size >= 3, "generator starved — property vacuous")
    for (ts <- cases) {
      val ref = reference(ts)
      assert(sparkRanksGlobalOnly(ts) == ref, s"global-only diverged on $ts")
      assert(sparkRanks(ts) == ref, s"active-set diverged on $ts")
    }
  }

  test("seeded and unseeded hierarchies agree with the reference; the " +
      "seed jumps the ladder to prefix 8 (property)") {
    val genSeq = for {
      n <- Gen.choose(4, 40)
      ts <- Gen.listOfN(n, Gen.oneOf("a", "b", "ab"))
    } yield ts
    val cases = (0 until 4).flatMap { i =>
      genSeq(Gen.Parameters.default, Seed(71L + i))
    }.filter(_.nonEmpty) :+ (Seq.fill(16)(Seq("x", "y")).flatten :+ "z")
    for (ts <- cases) {
      val ref = reference(ts)
      val df = ts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("pos", "tok")
      // unseeded (the default: binary ladder)
      val h1 = SuffixArray.hierarchy(df)
      try {
        assert(h1.levels.map(_.prefixLen) ==
          h1.levels.indices.map(i => 1L << i),
          s"unseeded ladder must be binary: ${h1.levels.map(_.prefixLen)}")
        assert(h1.finalRanksDf(spark).as[(Long, Long)].collect().toMap == ref,
          s"unseeded diverged on $ts")
      } finally h1.release()
      // seeded (experimental, measured-and-rejected default — the
      // property coverage keeps the operator correct): 1 -> 8 -> 16 ...
      val h8 = SuffixArray.hierarchy(df,
        seedWidth = SuffixArray.ExperimentalSeedWidth)
      try {
        val ps = h8.levels.map(_.prefixLen)
        assert(ps.head == 1L && ps.tail.headOption.forall(_ == 8L) &&
          ps.zip(ps.tail).drop(1).forall { case (a, b) => b == 2 * a },
          s"seeded ladder shape wrong: $ps")
        assert(h8.finalRanksDf(spark).as[(Long, Long)].collect().toMap == ref,
          s"seeded diverged on $ts")
        // the LCP descent stays exact across the 8 -> 1 level hole
        val lcpP = SuffixArray.lcpFromLevels(spark, h8)
        val got =
          try spark.read.parquet(lcpP).as[(Long, Long, Long, Long)].collect()
            .map { case (r, a, b, l) => r -> (a, b, l) }.toMap
          finally Scratch.release(lcpP)
        val byRank = ref.toSeq.map(_.swap).toMap
        val want = (1L until ts.length.toLong).map { r =>
          val a = byRank(r).toInt; val b = byRank(r + 1).toInt
          val l = ts.drop(a).zip(ts.drop(b))
            .takeWhile { case (x, y) => x == y }.length
          r -> (a.toLong, b.toLong, l.toLong)
        }.toMap
        assert(got == want, s"seeded LCP diverged on $ts")
        // the composite lookup descent crosses the 8 -> 1 hole by
        // replaying level 1 as the bound decrements — must stay exact
        val lcpC = SuffixArray.lcpFromLevelsComposite(spark, h8)
        val gotC =
          try spark.read.parquet(lcpC).as[(Long, Long, Long, Long)].collect()
            .map { case (r, a, b, l) => r -> (a, b, l) }.toMap
          finally Scratch.release(lcpC)
        assert(gotC == want, s"seeded composite LCP diverged on $ts")
      } finally h8.release()
    }
  }

  test("active-set build lands finals deltas and mixed full/active levels") {
    // highly repetitive ⇒ many rounds; default threshold switches after
    // round 0 on tiny data, so all later rounds are active-set
    val ts = Seq.fill(16)(Seq("x", "y")).flatten :+ "z"
    val df = ts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("pos", "tok")
    val h = SuffixArray.hierarchy(df)
    try {
      assert(h.finalsPath.isDefined, "repetitive input must switch regimes")
      assert(h.levels.head.full && !h.levels.last.full)
      // finals dir accumulates exactly n rows, a 1..n rank permutation
      val fin = spark.read.parquet(h.finalsPath.get)
      assert(fin.count() == ts.length.toLong)
      val ranks = fin.select("pos", "rank").as[(Long, Long)].collect().toMap
      assert(ranks == reference(ts))
      // resolution levels are recorded and monotone within bounds
      val lvls = fin.select("lvl").as[Long].collect()
      assert(lvls.forall(l => l >= 1 && l <= h.levels.last.prefixLen))
      // every level is reconstructable as a full n-row relation whose
      // rank equality certifies prefix-p equality (spot-check: ranks at
      // each level form groups that refine the next level's)
      for (i <- h.levels.indices)
        assert(h.levelDf(spark, i).count() == ts.length.toLong,
          s"level $i not full-size")
    } finally h.release()
  }

  test("LCP matches brute force in the forced-global regime too") {
    val ts = Seq("a", "b", "a", "b", "ab", "a", "b")
    val df = ts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("pos", "tok")
    val h = SuffixArray.hierarchy(df, maxLocalGroup = 0L)
    val path =
      try SuffixArray.lcpFromLevels(spark, h)
      finally h.release()
    val got =
      try spark.read.parquet(path).as[(Long, Long, Long, Long)].collect()
        .map { case (r, a, b, l) => r -> (a, b, l) }.toMap
      finally Scratch.release(path)
    val ranks = reference(ts)
    val byRank = ranks.toSeq.map(_.swap).toMap
    val want = (1L until ts.length.toLong).map { r =>
      val a = byRank(r).toInt; val b = byRank(r + 1).toInt
      val l = ts.drop(a).zip(ts.drop(b))
        .takeWhile { case (x, y) => x == y }.length
      r -> (a.toLong, b.toLong, l.toLong)
    }.toMap
    assert(got == want)
  }

  test("LCP bracket-up/refine-down (measured-and-rejected alternative — " +
      "kept correct) matches brute force in BOTH refine regimes " +
      "(broadcast and shuffle), including long repeats (property)") {
    def brute(ts: Seq[String]): Map[Long, (Long, Long, Long)] = {
      val ranks = reference(ts)
      val byRank = ranks.toSeq.map(_.swap).toMap
      (1L until ts.length.toLong).map { r =>
        val a = byRank(r).toInt; val b = byRank(r + 1).toInt
        val l = ts.drop(a).zip(ts.drop(b))
          .takeWhile { case (x, y) => x == y }.length
        r -> (a.toLong, b.toLong, l.toLong)
      }.toMap
    }
    def sparkLcpVia(ts: Seq[String], bm: Long,
        impl: (org.apache.spark.sql.SparkSession, SuffixArray.SaHierarchy,
          Long) => String): Map[Long, (Long, Long, Long)] = {
      val df = ts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("pos", "tok")
      val h = SuffixArray.hierarchy(df)
      val path =
        try impl(spark, h, bm)
        finally h.release()
      try spark.read.parquet(path).as[(Long, Long, Long, Long)].collect()
        .map { case (r, a, b, l) => r -> (a, b, l) }.toMap
      finally Scratch.release(path)
    }
    def sparkLcp(ts: Seq[String], bm: Long): Map[Long, (Long, Long, Long)] =
      sparkLcpVia(ts, bm,
        (s, h, b) => SuffixArray.lcpFromLevelsBracket(s, h, broadcastMax = b))
    def sparkLcpComposite(ts: Seq[String], bm: Long)
        : Map[Long, (Long, Long, Long)] =
      sparkLcpVia(ts, bm,
        (s, h, b) => SuffixArray.lcpFromLevelsComposite(s, h, broadcastMax = b))
    val genSeq = for {
      n <- Gen.choose(6, 36)
      ts <- Gen.listOfN(n, Gen.oneOf("a", "b", "ab"))
    } yield ts
    val cases = (0 until 3).flatMap { i =>
      genSeq(Gen.Parameters.default, Seed(97L + i))
    }.filter(_.size >= 2) ++ Seq(
      // long repeats: deep brackets, several injection classes
      Seq.fill(10)(Seq("x", "y")).flatten :+ "z",
      Seq.fill(20)(Seq("x", "y")).flatten :+ "z",
      // all-distinct tokens: every bracket is [0,1) — the resolved-
      // direct path with an EMPTY refine loop
      (0 until 9).map(i => s"t$i"),
      // single token: no pairs at all — the output dir must still read
      Seq("solo"))
    for (ts <- cases) {
      val want = brute(ts)
      assert(sparkLcp(ts, Long.MaxValue) == want,
        s"bracket broadcast-regime LCP diverged on $ts")
      assert(sparkLcp(ts, 0L) == want,
        s"bracket shuffle-regime LCP diverged on $ts")
      assert(sparkLcpComposite(ts, Long.MaxValue) == want,
        s"composite broadcast-regime LCP diverged on $ts")
      assert(sparkLcpComposite(ts, 0L) == want,
        s"composite bucket-join regime LCP diverged on $ts")
    }
  }

  test("Scratch alloc/append accumulates deltas and refuses escapes") {
    val p = Scratch.allocPath("spec-acc")
    Scratch.appendPath(Seq((1L, "a")).toDF("k", "v"), p)
    Scratch.appendPath(Seq((2L, "b"), (3L, "c")).toDF("k", "v"), p)
    assert(spark.read.parquet(p).count() == 3L)
    Scratch.release(p)
    intercept[IllegalArgumentException] {
      Scratch.appendPath(Seq((1L, "x")).toDF("k", "v"), "/tmp/not-scratch")
    }
    // the scratch ROOT itself is refused (part files there would mix
    // with scratch dirs), as are path-escaping names
    val root = new java.io.File(Scratch.allocPath("probe")).getParent
    intercept[IllegalArgumentException] {
      Scratch.appendPath(Seq((1L, "x")).toDF("k", "v"), root)
    }
    intercept[IllegalArgumentException] { Scratch.allocPath("a/b") }
    intercept[IllegalArgumentException] { Scratch.allocPath("..") }
  }

  test("ranks are a 1..n permutation and repeated runs converge past round 0") {
    // a highly repetitive sequence forces many doubling rounds (equal
    // prefixes persist until the gap spans the period)
    val ts = Seq.fill(16)(Seq("x", "y")).flatten :+ "z"
    val ranks = sparkRanks(ts)
    assert(ranks.values.toSeq.sorted == (1L to ts.length).toSeq)
    assert(ranks == reference(ts))
  }
}
