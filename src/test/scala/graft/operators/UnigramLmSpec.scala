package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** UnigramLm: the Viterbi fold must equal an independent reference DP
  * (same model, same tiebreak) on randomized vocabularies, and the
  * corpus-level queries must reconstruct their words. */
class UnigramLmSpec extends SparkSpec {

  /** Reference Viterbi: classic O(L·4) arrays, longest-piece tiebreak —
    * deliberately imperative, shares no code with the Spark fold. */
  private def refSegment(word: String, lq: Map[String, Long]): (String, Long) = {
    val L = word.length
    val best = Array.fill(L + 1)(Long.MinValue)
    val bp = Array.fill(L + 1)(0)
    best(0) = 0L
    for (j <- 1 to L; k <- 1 to math.min(4, j)) {
      val s = best(j - k) + lq(word.substring(j - k, j))
      if (s > best(j) || (s == best(j) && k > bp(j))) {
        best(j) = s; bp(j) = k
      }
    }
    val cuts = scala.collection.mutable.ArrayBuffer(L)
    var pos = L
    while (pos > 0) { pos -= bp(pos); cuts.prepend(pos) }
    val pieces = cuts.toSeq.sliding(2).map {
      case Seq(a, b) => word.substring(a, b)
    }.toSeq
    (pieces.mkString("|"), best(L))
  }

  test("segment equals the reference Viterbi on a randomized vocabulary") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcde"
    val wordsList = (Seq("aaaa", "ababab", "x") ++ // degenerate repeats
      Seq.fill(60)((0 until (1 + rnd.nextInt(9)))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)).distinct
    import spark.implicits._
    val words = wordsList.toDF("word")
      .withColumn("freq", (length(col("word")) % 5 + 1).cast("long"))
    val pc = UnigramLm.pieceCounts(words)
    val md = UnigramLm.model(pc, pc)
    val out = UnigramLm.segment(UnigramLm.withPieceMap(words, md))
      .select("word", "seg", "scoreq").collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap
    val lq = md.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    wordsList.foreach { w =>
      val (refSeg, refScore) = refSegment(w, lq)
      assert(out(w) == ((refSeg, refScore)),
        s"word '$w': spark=${out(w)} ref=($refSeg, $refScore)")
    }
  }

  test("segmentation always reconstructs the word and scores add up") {
    val docs = graft.Tables.documents(spark, sf0001)
    val words = docs.select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
    val pc = UnigramLm.pieceCounts(words)
    val md = UnigramLm.model(pc, pc)
    val out = UnigramLm.segment(UnigramLm.withPieceMap(words, md)).cache()
    assert(out.count() > 0)
    assert(out.filter(
      regexp_replace(col("seg"), "\\|", "") =!= col("word")).count() == 0,
      "concatenated pieces must reconstruct the word")
    // n_pieces bounds: 1 ≤ n ≤ len, and every piece ≤ MaxPiece chars
    assert(out.filter(col("n_pieces") < 1 ||
      col("n_pieces") > length(col("word"))).count() == 0)
    val maxPiece = out
      .select(explode(split(col("seg"), "\\|")).as("p"))
      .agg(max(length(col("p")))).collect()(0).getInt(0)
    assert(maxPiece <= UnigramLm.MaxPiece)
    out.unpersist()
  }

  test("zero-length words (irregular whitespace) are dropped, never minting ''-pieces") {
    // Spark's sequence(0, -1) is a DESCENDING [0,-1], not empty — an
    // empty word (from double/leading spaces) would mint garbage
    // ''-pieces and a broken DP row without the operator-level guard
    import spark.implicits._
    val words = Seq(("", 5L), ("ab", 2L)).toDF("word", "freq")
    val pc = UnigramLm.pieceCounts(words)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pc == Map("a" -> 2L, "b" -> 2L, "ab" -> 2L),
      s"empty word must contribute no pieces: $pc")
    val pcDf = UnigramLm.pieceCounts(words)
    val seg = UnigramLm.segment(
      UnigramLm.withPieceMap(words, UnigramLm.model(pcDf, pcDf))).collect()
    assert(seg.map(_.getString(0)).toSeq == Seq("ab"),
      "the empty word must never reach the DP")
  }
}
