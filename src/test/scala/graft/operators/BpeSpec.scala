package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** [[Bpe]] — distributed BPE merge training. Example tests pin the
  * hand-computed merge sequence; the property test proves the Spark
  * implementation equal to a sequential reference BPE trainer on random
  * corpora (the KMeans/CC regime-equality pattern), covering argmax
  * ties, overlapping pairs, and early exhaustion. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def train(words: Seq[(String, Long)], n: Int) = {
    val (merges, syms) = Bpe.train(words.toDF("word", "cnt"), "word", "cnt", n)
    val toks = syms.select("word", "s").as[(String, String)].collect()
      .map { case (w, s) => w -> s.trim.split(" ").toSeq }.toMap
    (merges, toks)
  }

  /** Sequential reference BPE trainer: count adjacent pairs weighted by
    * word count, merge the (count desc, pair asc) argmax left-to-right
    * non-overlapping, repeat. */
  private def refTrain(words: Seq[(String, Long)], n: Int)
      : (Seq[(Long, String, String, Long)], Map[String, Seq[String]]) = {
    var syms: Seq[(Seq[String], Long)] =
      words.map { case (w, c) => (w.map(_.toString), c) }
    val merges = Seq.newBuilder[(Long, String, String, Long)]
    var rank = 1L
    var done = false
    while (rank <= n && !done) {
      val counts = collection.mutable.Map.empty[(String, String), Long]
      for ((s, c) <- syms; p <- s.zip(s.tail))
        counts(p) = counts.getOrElse(p, 0L) + c
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        merges += ((rank, l, r, c))
        syms = syms.map { case (s, cnt) =>
          val out = Seq.newBuilder[String]
          var i = 0
          while (i < s.length) {
            if (i < s.length - 1 && s(i) == l && s(i + 1) == r) {
              out += l + r; i += 2
            } else { out += s(i); i += 1 }
          }
          (out.result(), cnt)
        }
        rank += 1
      }
    }
    (merges.result(),
      words.map(_._1).zip(syms.map(_._1)).toMap)
  }

  test("hand-computed merges on a tiny weighted corpus") {
    // pairs: (a,b) = 2*3 + 1*2 = 8, (b,a) = 1*3 = 3 → merge (a,b)
    // then (ab,ab) = 3 → merge; round 3 has pairs (ab,?) none... b alone
    val corpus = Seq(("abab", 3L), ("ab", 2L), ("b", 1L))
    val (merges, toks) = train(corpus, 5)
    assert(merges.map(m => (m.rank, m.lhs, m.rhs, m.count)) ==
      Seq((1L, "a", "b", 8L), (2L, "ab", "ab", 3L)))
    assert(toks == Map("abab" -> Seq("abab"), "ab" -> Seq("ab"), "b" -> Seq("b")))
  }

  test("overlapping pair merges left-to-right non-overlapping") {
    // " a a a " with pair (a,a): the first replace consumes its trailing
    // delimiter, so the second occurrence (overlapping) can't match —
    // "aaa" becomes [aa, a], the standard BPE scan result
    val (merges, toks) = train(Seq(("aaa", 1L)), 1)
    assert(merges.map(m => (m.lhs, m.rhs, m.count)) == Seq(("a", "a", 2L)))
    assert(toks("aaa") == Seq("aa", "a"))
  }

  test("exhaustion stops early and single-char words never merge") {
    val (merges, toks) = train(Seq(("ab", 5L), ("c", 9L)), 10)
    assert(merges.map(m => (m.lhs, m.rhs, m.count)) == Seq(("a", "b", 5L)))
    assert(toks == Map("ab" -> Seq("ab"), "c" -> Seq("c")))
  }

  test("property: distributed trainer equals the sequential reference on random corpora") {
    // 2-letter alphabet + small counts force heavy ties (lexicographic
    // tie-break), overlapping runs ("aaaa"), and exhaustion
    val corpusGen = for {
      n <- Gen.chooseNum(1, 8)
      ws <- Gen.listOfN(n, for {
        len <- Gen.chooseNum(1, 6)
        cs <- Gen.listOfN(len, Gen.oneOf("a", "b"))
        c <- Gen.chooseNum(1L, 3L)
      } yield (cs.mkString, c))
    } yield ws.toMap.toSeq // distinct words (it is a word-count table)
    (0 until 12).foreach { i =>
      val words = corpusGen.apply(Gen.Parameters.default, Seed(7700L + i))
        .getOrElse(fail(s"gen failed at seed $i"))
      val rounds = i % 5
      val (expM, expT) = refTrain(words, rounds)
      val (gotM, gotT) = train(words, rounds)
      assert(gotM.map(m => (m.rank, m.lhs, m.rhs, m.count)) == expM,
        s"seed=$i rounds=$rounds words=$words")
      assert(gotT == expT, s"seed=$i rounds=$rounds words=$words")
    }
  }

  test("q105/q106 registry shape: lazy after first build, memoized dirs stable") {
    val before = Scratch.liveDirCount
    val m1 = graft.SparkEntry.queries("q105_bpe_train")(spark, sf0001).collect()
    val dirsAfterFirst = Scratch.liveDirCount
    assert(m1.nonEmpty && m1.length <= 20)
    val e1 = graft.SparkEntry.queries("q106_bpe_encode")(spark, sf0001).collect()
    assert(e1.length > 0)
    assert(Scratch.liveDirCount == dirsAfterFirst,
      "q106 must reuse q105's memoized vocab, not build new scratch")
    // merged column is lhs||rhs; counts strictly positive and non-increasing
    val counts = m1.map(r => r.getLong(r.fieldIndex("pair_count")))
    assert(counts.forall(_ > 0) &&
      counts.sliding(2).forall { case Array(a, b) => a >= b; case _ => true },
      "merge pair_counts must be positive and non-increasing with rank")
    assert(before <= dirsAfterFirst, "build must not release foreign dirs")
  }
}
