package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding merge training — the tokenizer-building
  * stage of an LLM data pipeline (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units").
  *
  * Scale shape (the reason this survives 100 TB):
  *   - Training never iterates over the corpus. The corpus collapses ONCE
  *     into a (word, count) relation — vocabulary-sized, orders of
  *     magnitude smaller than the text — and every merge round runs over
  *     that table. This is the standard trick every production BPE
  *     trainer uses; here the word table is distributed, so vocabularies
  *     that exceed driver memory (web-scale multilingual corpora) still
  *     train.
  *   - Each round's pair count is a map-side-combined groupBy over the
  *     word table: the shuffle carries O(partitions × distinct pairs)
  *     partial sums, and the argmax lands on the driver as EXACTLY ONE
  *     row per round (orderBy+limit(1) plans as TakeOrderedAndProject).
  *   - Driver state is the merge list itself — O(numMerges) rows, the
  *     artifact being trained.
  *   - Merge application is a map-side `replace` on a space-delimited
  *     symbol string: plans stay whole-stage-codegen projections, and
  *     CollapseProject folds consecutive rounds into one projection.
  *
  * Determinism / oracle parity: pair counts are exact integer sums;
  * argmax ties break to the lexicographically smallest (lhs, rhs); merge
  * application is the canonical left-to-right greedy scan, implemented as
  * a fold (`aggregate` HOF here, `list_reduce` in the oracle) with a
  * space-joined string accumulator: merge when the accumulator's LAST
  * token is lhs and the incoming symbol is rhs. A naive string
  * `replace(s, " l r ", " lr ")` is NOT equivalent — abutting matches
  * share a delimiter char, so the scan skips every other occurrence
  * ("abab" needs two passes; odd runs of an identical pair merge the
  * wrong occurrence). The fold is exact: the merged token lhs+rhs is
  * strictly longer than lhs, so it can never spuriously re-match as the
  * left element of the same pair. Every round is reproducible in ANSI
  * SQL, which is what lets an ITERATIVE operator be DuckDB-oracled under
  * the strict hash compare (the q96 k-means precedent, SURVEY §7.4).
  */
object Bpe {

  /** One learned merge: 1-based rank, the winning adjacent pair, and the
    * corpus-weighted count that won the argmax. */
  final case class Merge(rank: Long, lhs: String, rhs: String, count: Long)

  /** Space-joined symbolization of a word: "abc" → "a b c". Symbols
    * never contain spaces (words are whitespace-split), so the encoding
    * is unambiguous and `split(s, " ")` recovers the symbol sequence. */
  def symbolize(word: Column): Column =
    trim(regexp_replace(word, "(.)", "$1 "))

  /** Train `numMerges` BPE merges over a (word, count) relation.
    *
    * Returns the learned merge list and the final per-word symbolization
    * (columns `word`, `cnt`, `s` — the word's token sequence in
    * [[symbolize]] encoding). Stops early if no adjacent pair remains
    * (every word fully merged to one symbol).
    *
    * The input should already be scratch-materialized / small (it is the
    * vocabulary table, not the corpus); each round replays the plan from
    * it with one more map-side fold layer (CollapseProject keeps the
    * whole chain a single codegen'd projection).
    */
  def train(words: DataFrame, wordCol: String, cntCol: String,
      numMerges: Int): (Seq[Merge], DataFrame) = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    var syms = words.select(col(wordCol).as("word"),
      col(cntCol).cast("long").as("cnt"), symbolize(col(wordCol)).as("s"))
    val merges = ArrayBuffer.empty[Merge]
    var rank = 1L
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      // adjacent-pair counts, weighted by word frequency: posexplode the
      // symbol array and pair each element with its right neighbour
      val best = syms
        .select(col("cnt"), split(col("s"), " ").as("t"))
        .select(col("cnt"), col("t"), posexplode(col("t")).as(Seq("i", "l")))
        .filter(col("i") < size(col("t")) - 1)
        .select(col("cnt"), col("l"),
          element_at(col("t"), col("i") + lit(2)).as("r"))
        .groupBy(col("l"), col("r"))
        .agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(1)
        .collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, c) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += Merge(rank, l, r, c)
        // canonical left-to-right merge scan as a fold: the accumulator
        // is the space-joined output; merge when its last token is
        // exactly `l` (the char before must be the delimiter — or the
        // accumulator IS `l`) and the incoming symbol is `r`
        syms = syms.withColumn("s", aggregate(
          split(col("s"), " "), lit(""),
          (acc, x) => when(acc === "", x)
            .when((acc === lit(l) || acc.endsWith(s" $l")) && x === lit(r),
              concat(acc.substr(lit(1), length(acc) - lit(l.length)), lit(l + r)))
            .otherwise(concat(acc, lit(" "), x))))
        rank += 1
      }
    }
    (merges.toSeq, syms)
  }
}
