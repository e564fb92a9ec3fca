package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming NEAR-dup admission — the production incremental-crawl
  * shape: each micro-batch of incoming documents runs the q92 blocked
  * near-dup operator against the corpus snapshot, and only docs that are
  * NOT near-duplicates (best Jaccard < 0.8 over shared rare trigrams)
  * land in the admitted store.
  *
  * Scale shape, per batch:
  *   - The corpus's HOT-shingle index is memoized per corpus dir
  *     ([[graft.queries.LlmOps]]'s hot-shingle cache), so the detection
  *     job over the full corpus runs ONCE for the stream's lifetime —
  *     batch 2..n reuse the index with zero corpus-wide jobs (the
  *     StreamingSpec case asserts the job-count drop).
  *   - The batch is small: its shingle relation BROADCASTS into the
  *     block join, the corpus rare-shingle stream stays map-side, and
  *     exact-Jaccard verification touches candidate docs only — work is
  *     Σ_shingle (batch_freq × corpus_freq), never batch × corpus.
  *   - Per-batch scratch (the verdict parquet) is released in the batch,
  *     so a long-running stream holds disk only for the memoized index.
  *   - Admitted-store state lives in storage (parquet), not executor
  *     memory — it survives restarts and scales with the store, like the
  *     exact-hash admission pipeline (q87's streaming form).
  *
  * Within-stream duplicate policy: exact — in-batch content dups keep
  * the min-doc_id survivor, and an anti-join against the admitted store
  * rejects cross-batch exact dups. Near-dup blocking targets the (large,
  * indexed) corpus snapshot; admitted-vs-admitted NEAR-dup requires
  * folding admitted docs into the shingle index, which production does
  * on an index-refresh cadence, not per batch — that cadence is
  * [[refreshCorpus]].
  *
  * Single-writer assumption: one admission stream per admitted store.
  * `admitBatch` reads the store (the anti-join) and then appends to it;
  * two concurrent streams on the same store could both pass the
  * anti-join before either append lands. foreachBatch serializes
  * batches WITHIN a stream, so the contract holds there by
  * construction.
  */
object NearDupAdmission {

  /** foreachBatch body: admit `batch` (`doc_id`, `text`) against the
    * corpus at `corpusDir`, appending survivors to `admittedPath`. */
  def admitBatch(batch: DataFrame, corpusDir: String, admittedPath: String): Unit = {
    val s = batch.sparkSession
    val incoming = batch.select(col("doc_id").as("new_id"), col("text"))
    val verdictPath = graft.queries.LlmOps.nearDupVerdictPath(s, corpusDir, incoming)
    try {
      val fresh = batch.join(
        s.read.parquet(verdictPath).filter(!col("is_dup"))
          .select(col("new_id").as("doc_id")),
        Seq("doc_id"), "left_semi")
      // in-batch exact dedup: deterministic min-id survivor per text
      val w = Window.partitionBy(col("text")).orderBy(col("doc_id"))
      val survivors = fresh.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
      val admitted =
        if (Files.exists(Paths.get(admittedPath)))
          survivors.join(s.read.parquet(admittedPath).select(col("text")),
            Seq("text"), "left_anti")
        else survivors
      admitted.select(col("doc_id"), col("text"))
        .write.mode("append").parquet(admittedPath)
    } finally graft.operators.Scratch.release(verdictPath)
  }

  /** The index-refresh cadence: fold the admitted store into the corpus
    * (full documents schema, stream-sourced rows marked `source =
    * 'stream'`) and invalidate every memoized relation derived from the
    * corpus dir — the next batch's blocking join sees the folded docs,
    * so admitted-vs-admitted near-dups are rejected from then on.
    * Requires a WRITABLE corpus dir (production corpora are; the
    * read-only driver testdata is not — tests copy it to scratch).
    * Run between batches (or from a maintenance job while the stream is
    * paused): the corpus-dir immutability assumption behind the memo
    * ([[graft.operators.DatasetCache]]) means the fold and the
    * invalidation must not race an in-flight batch's index build. */
  def refreshCorpus(spark: org.apache.spark.sql.SparkSession, corpusDir: String,
      admittedPath: String): Unit = {
    spark.read.parquet(admittedPath)
      .select(col("doc_id"), col("text"), lit("und").as("lang"),
        lit("stream").as("source"), length(col("text")).cast("long").as("n_chars"))
      .write.mode("append").parquet(s"$corpusDir/documents.parquet")
    graft.operators.DatasetCache.invalidate(corpusDir)
  }
}
