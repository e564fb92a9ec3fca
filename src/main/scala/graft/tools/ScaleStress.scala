package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{SparkEnv, SparkEntry, Tables}

/** Dev-only scale-stress harness: materializes a key-shifted FACTOR×
  * copy of the fact tables under /tmp and times the heavy queries on
  * both the source and the scaled dir, reporting the observed runtime
  * ratio per query. The point is measured would-it-scale evidence: a
  * ratio near FACTOR (modulo fixed per-query overhead) means the plan
  * is linear in the data; a ratio near FACTOR² means a pairwise blowup
  * escaped its blocking.
  *
  * Scaling is SEMANTIC, not verbatim duplication:
  *   - lineitem/orders: order keys shift by copy × 10M — more orders,
  *     same dims (TPC-H-style fact growth; join fan-outs stay linear).
  *   - events: user_id and event_id shift — more users, same per-user
  *     activity, so the q09 bucketed range join's per-bucket occupancy
  *     (its blowup bound) is unchanged.
  *   - documents: doc_id shifts; copy i's text is rotated by i words —
  *     cross-copy trigram overlap stays high, so every original doc
  *     gains ~FACTOR near-dup siblings. That makes the dedup family a
  *     DELIBERATE super-linear stress: pair counts grow ~FACTOR× per
  *     doc (clusters of siblings), which is exactly the workload shape
  *     corpus dedup exists for — blocked candidate generation must
  *     absorb it without an n² scan.
  *   - embeddings: vec_id shifts; copy i jitters each component
  *     deterministically so k-means/SemDeDup see denser, not
  *     degenerate-duplicate, clusters.
  *
  * Usage: runMain graft.tools.ScaleStress [factor] [srcDir] [outDir]
  *        [query ...]
  * Prints one JSON line:
  *   {"metric":"scale_stress","factor":F,
  *    "queries":{name:{"src":s,"scaled":s,"ratio":r},...}}
  */
object ScaleStress {

  private val DefaultQueries = Seq(
    "q01_pricing_summary", "q04_join_sortmerge", "q09_range_join",
    "q18_window_rank", "q94_zorder_layout",
    "q96_kmeans_clusters", "q99_semdedup",
    "q35_near_dup", "q35d_lsh_neardup", "q71_simhash_neardup",
    "q61_dedup_clusters", "q76_span_dedup",
    "q92_incremental_neardup", "q72_pipeline_e2e",
    "q105_bpe_train", "q106_bpe_encode", "q107_cooccurrence",
    "q108_cdc_chunks",
    // r9 additions: the new dedup/retrieval family members. The rotated
    // sibling copies make q112/q116 deliberate super-linear stresses
    // (duplicated lines/spans multiply), like q35/q76 above.
    "q112_line_dedup", "q113_dsir_select", "q114_phrase_search",
    "q116_dup_spans", "q117_hits", "q118_prefix_search",
    "q122_containment",
    // r9 second half: the statistical-model/graph/simjoin family. The
    // rotated siblings make q137 a deliberate super-linear stress (its
    // high-Jaccard pair count multiplies); q134/q135 must stay ~FLAT
    // (vocab-bounded — the corpus collapse is the whole point); q130
    // scales its cell count as sqrt(n/8), balancing assign vs
    // within-cell cost at the single-level IVF optimum n^1.5
    // (BASELINE.md).
    "q125_nb_classifier", "q126_kneser_ney", "q130_knn_graph",
    "q134_unigram_segment", "q136_triangles", "q137_simjoin_prefix",
    "q139_prf_expand", "q140_skyline",
    // r10: trained hierarchical IVF — must hold at-or-below q130's ratio
    "q149_ivf2_ann",
    // r10: the model-gated pipeline — must stay near q72's e2e ratio
    "q150_pipeline_v2",
    // r10 second half: cell-blocked bench screening, map-side SFT prep,
    // and the snapshot-diff full-outer join
    "q151_semantic_decontam", "q152_sft_mask_pack", "q153_snapshot_diff",
    // r10: the index-lifecycle legs and the split-leakage report
    "q154_ivf2_append", "q155_segment_bm25", "q156_split_leakage",
    // r11: corpus-scale ExactSubstr — the SA build + LCP descent over the
    // full token stream; cold is the honest build cost, warm reads the
    // memoized remove-all accounting
    "q159_exactsubstr_corpus",
    // r11: the delete + compaction lifecycle legs and cell-blocked
    // bitext mining
    "q160_ivf2_delete", "q161_segment_compaction", "q164_bitext_mine",
    // r11 second half: governance + soft-dedup weights
    "q163_pii_redact", "q165_soft_dedup",
    // r13: the NN-Descent refinement (candidate-bounded — must hold at
    // or below q130's ratio) and the probe-2 recall report
    "q166_nn_descent", "q167_ivf2_recall",
    // r13: IVF2-seeded build (recall per cost) and the iterated pure
    // NN-Descent build (the candidate-bounded linear path)
    "q168_knn_graph_hier", "q169_nn_descent_full",
    // r13: graph lifecycle - append/delete must track the batch/delete
    // fraction, never the corpus (the landed-graph read is linear)
    "q171_knn_graph_append", "q172_knn_graph_delete",
    // r13: graph serve - cost must track probes x beam x degree, the
    // corpus enters only through the landed graph and id-equi fetches
    "q173_graph_serve",
    // r13: graph semdedup - CC on the thresholded landed edges; the
    // corpus joins the bounded label relation once, never pairwise
    "q174_graph_semdedup",
    // r13: epoch reshuffle - a range-partitioned sort on the seeded
    // key; must scale as one shuffle-write, no single-task window
    "q175_epoch_shuffle",
    // r16: the any-frame video near-dup (n_frames x the fingerprint
    // rows — the price of trim robustness) and the cross-modality
    // closure (CC over the unioned radius-filtered pair relations)
    "q183_video_neardup", "q184_fingerprint_dedup",
    // r16: the oracle-armed fingerprint chain (synthetic hashes — no
    // codec volume, so these isolate the JOIN+CC scale behavior)
    "q185_hamming_join", "q186_fingerprint_closure",
    // r19: hierarchical serve over LANDED layers — warm ratio must track
    // probes x beam x degree (the q173 contract); the layer-1 build cost
    // lives in the cold pass (landing), never the serve
    "q187_hnsw_serve")

  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val src = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val out = if (args.length > 2) args(2) else s"/tmp/graft-scaled-x$factor"
    val queries = if (args.length > 3) args.drop(3).toSeq else DefaultQueries
    val unknown = queries.toSet -- SparkEntry.queries.keySet
    require(unknown.isEmpty, s"unknown query names: ${unknown.mkString(", ")}")

    val spark = SparkEnv.local("scale-stress")
    try {
      writeScaled(spark, src, out, factor)
      def timeOnce(name: String, dir: String): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      // (cold, warm): pass 1 includes any memoized index/artifact build
      // (q92 verdicts, q105 BPE training); min-of-2 is the steady-state
      // read. Reporting BOTH keeps the scale evidence honest for
      // memoized queries — their warm ratio alone hides the build cost.
      def twoPass(name: String, dir: String): (Double, Double) = {
        val t1 = timeOnce(name, dir); val t2 = timeOnce(name, dir)
        (t1, math.min(t1, t2))
      }
      val rows = queries.map { name =>
        val (sc, s) = twoPass(name, src)
        val (xc, x) = twoPass(name, out)
        (name, s, x, x / s, sc, xc)
      }
      val qs = rows.map { case (n, s, x, r, sc, xc) =>
        f"""\"$n\":{\"src\":$s%.3f,\"scaled\":$x%.3f,\"ratio\":$r%.2f,""" +
          f"""\"srcCold\":$sc%.3f,\"scaledCold\":$xc%.3f,\"coldRatio\":${xc / sc}%.2f}"""
      }.mkString("{", ",", "}")
      println(s"""{"metric":"scale_stress","factor":$factor,"src":"$src","queries":$qs}""")
    } finally spark.stop()
  }

  /** Union of `factor` key-shifted copies of each fact table (dims copied
    * verbatim), written as parquet under `out`. */
  private def writeScaled(spark: SparkSession, src: String, out: String,
      factor: Int): Unit = {
    val copies = (0 until factor).toSeq

    def scaled(base: DataFrame, shift: Int => DataFrame => DataFrame): DataFrame =
      copies.map(i => shift(i)(base)).reduce(_ unionAll _)

    val orderSpan = 10L * 1000 * 1000
    val idSpan = 1L * 1000 * 1000

    def save(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")

    save(scaled(Tables.lineitem(spark, src), i => df =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(i * orderSpan))), "lineitem")
    save(scaled(Tables.orders(spark, src), i => df =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(i * orderSpan))), "orders")
    save(scaled(Tables.events(spark, src), i => df =>
      df.withColumn("event_id", col("event_id") + lit(i * idSpan))
        .withColumn("user_id", col("user_id") + lit(i * idSpan))), "events")
    save(scaled(Tables.documents(spark, src), i => df => {
      val words = split(col("text"), " ")
      val n = size(words)
      // rotate by i words: high trigram overlap with the original —
      // deliberate near-dup siblings (see scaladoc)
      val rotated =
        if (i == 0) col("text")
        else concat_ws(" ",
          concat(slice(words, lit(i + 1), greatest(n - i, lit(0))),
            slice(words, lit(1), least(lit(i), n))))
      df.withColumn("doc_id", col("doc_id") + lit(i * idSpan))
        .withColumn("text", rotated)
    }), "documents")
    save(scaled(Tables.embeddings(spark, src), i => df => {
      // deterministic per-copy jitter: denser clusters, not exact dups
      val jittered =
        if (i == 0) col("embedding")
        else transform(col("embedding"), (x, idx) =>
          (x + (pmod(col("vec_id") * 31 + lit(i * 17) + idx, lit(7)) - lit(3))
            .cast("float") * lit(0.001f)).cast("float"))
      df.withColumn("vec_id", col("vec_id") + lit(i * idSpan))
        .withColumn("embedding", jittered)
    }), "embeddings")
    for (dim <- Seq("region", "nation", "customer", "supplier", "part"))
      save(spark.read.parquet(s"$src/$dim.parquet"), dim)
  }
}
