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
    try spark.read.parquet(path).as[(Long, Long)].collect().toMap
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

  test("ranks are a 1..n permutation and repeated runs converge past round 0") {
    // a highly repetitive sequence forces many doubling rounds (equal
    // prefixes persist until the gap spans the period)
    val ts = Seq.fill(16)(Seq("x", "y")).flatten :+ "z"
    val ranks = sparkRanks(ts)
    assert(ranks.values.toSeq.sorted == (1L to ts.length).toSeq)
    assert(ranks == reference(ts))
  }
}
