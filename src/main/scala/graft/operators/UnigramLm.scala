package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM subword segmentation — the SentencePiece family (Kudo 2018,
  * "Subword Regularization"): segment each word into the piece sequence
  * maximizing Σ log P(piece) under a unigram piece model, via Viterbi
  * dynamic programming. One EM round on top (E-step: Viterbi counts;
  * M-step: re-estimate piece probabilities) is the core of the
  * SentencePiece trainer loop.
  *
  * Scale shape (the BPE discipline, operators/Bpe.scala):
  *   - The corpus collapses ONCE into a (word, freq) relation — the DP
  *     runs over the VOCABULARY, never the text. Web-scale corpora train
  *     over a table orders of magnitude smaller than the data.
  *   - The piece model is substring-bounded (O(V · maxlen · 4) rows),
  *     broadcast to the word table; the per-word piece lookup collapses
  *     to ONE map column, so the whole Viterbi pass is a map-side
  *     codegen'd `aggregate` fold — O(len · 4) work per word, constant
  *     expression size (no unrolled plan growth; the lesson from the
  *     q117 normalization-doubling trap is moot because the fold is one
  *     expression).
  *   - EM rounds re-aggregate piece counts from the segmentation output
  *     (vocab-bounded shuffle) and rebuild the broadcast model — the
  *     corpus is never touched again.
  *
  * Determinism / oracle parity: piece log-probs are quantized to the
  * 1e-4 grid as BIGINT at model build (O(pieces) `ln` calls), so the DP
  * itself is pure integer arithmetic — exact under any partitioning and
  * mirrored verbatim by DuckDB `list_reduce` folds. Ties prefer the
  * LONGER piece (then, transitively, the earlier candidate order), the
  * same rule on both engines.
  */
object UnigramLm {

  /** Max piece length considered by the model and the DP. */
  val MaxPiece = 4

  /** All (piece, weighted count) substrings of length 1..MaxPiece over a
    * (word, freq) relation — every occurrence position counts, weighted
    * by the word's corpus frequency. This is the seed model universe;
    * every substring of every word is present, so the DP never needs an
    * out-of-vocabulary fallback. Zero-length words are dropped: Spark's
    * `sequence(0, -1)` is a DESCENDING [0,-1] rather than empty, which
    * would otherwise mint garbage ''-pieces (irregular-whitespace
    * corpora produce such words). */
  def pieceCounts(words: DataFrame): DataFrame =
    words
      .filter(length(col("word")) > 0)
      .select(col("word"), col("freq"),
        explode(sequence(lit(0), length(col("word")) - 1)).as("i"))
      .select(col("word"), col("freq"), col("i"),
        explode(sequence(lit(1),
          least(lit(MaxPiece), length(col("word")) - col("i")))).as("k"))
      .select(col("freq"),
        col("word").substr(col("i") + 1, col("k")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))

  /** (piece, lq) unigram model: add-1-smoothed log-prob on the 1e-4
    * integer grid. Smoothing keeps every piece scoreable across EM
    * rounds (a piece absent from all best paths still has a defined
    * log-prob next round — standard EM practice in SentencePiece's
    * pruning loop). `universe` is the full piece relation (for the
    * smoothing denominator); `counts` carries this round's counts. */
  def model(counts: DataFrame, universe: DataFrame): DataFrame = {
    val uni = universe.select(col("piece")).distinct()
    // np = UNIVERSE size: add-1 mass is granted to every scoreable
    // piece, so the denominator must count all of them or the smoothed
    // "probabilities" sum past 1 (for round 1 counts == universe and
    // the two coincide)
    val totals = counts.agg(sum(col("cnt")).as("total"))
      .crossJoin(uni.agg(count(lit(1)).as("np")))
    uni
      .join(counts, Seq("piece"), "left")
      .crossJoin(broadcast(totals))
      .select(col("piece"),
        round(log((coalesce(col("cnt"), lit(0L)) + 1).cast("double") /
          (col("total") + col("np"))) * 10000, 0).cast("long").as("lq"))
  }

  /** Attach to each word a map (i*8+k) → lq over all its substrings
    * (i = 0-based start, k = length ≤ MaxPiece). One vocab-bounded
    * shuffle; the model side is broadcast. Zero-length words dropped
    * (same descending-`sequence` hazard as [[pieceCounts]]). */
  def withPieceMap(words: DataFrame, model: DataFrame): DataFrame = {
    val sub = words
      .filter(length(col("word")) > 0)
      .select(col("word"), col("freq"),
        explode(sequence(lit(0), length(col("word")) - 1)).as("i"))
      .select(col("word"), col("freq"), col("i"),
        explode(sequence(lit(1),
          least(lit(MaxPiece), length(col("word")) - col("i")))).as("k"))
      .select(col("word"), col("freq"), col("i"), col("k"),
        col("word").substr(col("i") + 1, col("k")).as("piece"))
    sub.join(broadcast(model), "piece")
      .groupBy(col("word"), col("freq"))
      .agg(map_from_entries(collect_list(
        struct((col("i") * 8 + col("k")).cast("long").as("key"),
          col("lq").as("value")))).as("m"))
  }

  /** Viterbi segmentation of every word under the piece map: returns
    * (word, freq, n_pieces, seg, scoreq) where `seg` is the best piece
    * sequence joined by '|' and `scoreq` the exact integer path score.
    * The DP and the backtrack are each ONE codegen'd `aggregate` fold —
    * no unrolled plan, no UDF. */
  def segment(wordsWithMap: DataFrame): DataFrame = {
    val len = length(col("word"))
    // DP state: j = positions filled, bests(p+1) = best score to p,
    // bps(p+1) = winning piece length at p. Candidate argmax prefers
    // the higher score, then the LONGER piece.
    val zero = struct(array(lit(0L)).as("bests"), array(lit(0L)).as("bps"))
    val noCand = struct(lit(Long.MinValue).as("s"), lit(0L).as("k"))
    val st = aggregate(
      sequence(lit(1), len), zero,
      (acc, j) => {
        val cands = transform(
          sequence(lit(1), least(lit(MaxPiece.toLong), j.cast("long"))),
          k => struct(
            (element_at(acc.getField("bests"), (j - k + 1).cast("int")) +
              element_at(col("m"), ((j - k) * 8 + k).cast("long"))).as("s"),
            k.as("k")))
        val best = aggregate(cands, noCand,
          (p, q) => when(
            q.getField("s") > p.getField("s") ||
              (q.getField("s") === p.getField("s") &&
                q.getField("k") > p.getField("k")), q).otherwise(p))
        struct(
          concat(acc.getField("bests"), array(best.getField("s")))
            .as("bests"),
          concat(acc.getField("bps"), array(best.getField("k"))).as("bps"))
      })
    val withSt = wordsWithMap.withColumn("st", st)
      .select(col("word"), col("freq"),
        col("st").getField("bests").as("bests"),
        col("st").getField("bps").as("bps"))
    // Backtrack: walk bps from len down to 0, collecting cut positions.
    val bt = aggregate(
      sequence(lit(1), len),
      struct(len.cast("long").as("pos"),
        array(len.cast("long")).as("cuts")),
      (acc, _) => {
        val pos = acc.getField("pos")
        val step = element_at(col("bps"), (pos + 1).cast("int"))
        when(pos > 0,
          struct((pos - step).as("pos"),
            concat(array(pos - step), acc.getField("cuts")).as("cuts")))
          .otherwise(acc)
      })
    withSt.withColumn("cuts", bt.getField("cuts"))
      .select(col("word"), col("freq"),
        (size(col("cuts")) - 1).cast("long").as("n_pieces"),
        array_join(
          transform(sequence(lit(1), size(col("cuts")) - 1),
            i => col("word").substr(
              (element_at(col("cuts"), i) + 1).cast("int"),
              (element_at(col("cuts"), i + 1) -
                element_at(col("cuts"), i)).cast("int"))),
          "|").as("seg"),
        element_at(col("bests"), (length(col("word")) + 1).cast("int"))
          .as("scoreq"))
  }

  /** Piece counts implied by a segmentation output (the E-step): every
    * best-path piece weighted by word frequency. */
  def segmentCounts(seg: DataFrame): DataFrame =
    seg.select(col("freq"), explode(split(col("seg"), "\\|")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
}
