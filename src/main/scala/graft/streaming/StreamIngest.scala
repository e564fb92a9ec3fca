package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

import graft.ingest.CsvVehicleReader

/** Structured Streaming ingest (SURVEY.md §2.8): the reference's whole
  * pipeline — CSV stream → project/cast/filter → micro-batch → HTTP sink
  * (CsvLoader.java:72-194) — re-expressed as `readStream` → the same
  * declarative transform used in batch → `foreachBatch(HttpSink)`.
  * Micro-batching is the engine's trigger, not a hand-rolled buffer; the
  * 10k-row chunking inside the sink preserves the reference's envelope
  * sizing (CsvLoader.java:160).
  */
object StreamIngest {

  /** Streaming variant of [[CsvVehicleReader.read]]: text file stream
    * (plain/.gz) through the identical record pipeline. `maxFilesPerTrigger`
    * bounds micro-batch size at the source. */
  def readStream(spark: SparkSession, dir: String, maxFilesPerTrigger: Int = 10): DataFrame =
    CsvVehicleReader.fromLines(
      spark.readStream
        .option("maxFilesPerTrigger", maxFilesPerTrigger)
        .text(dir)
        .select(col("value")))

  /** Wire pings into the HTTP sink; caller starts/stops the query. */
  def toHttpSink(pings: DataFrame, sink: HttpSink): DataStreamWriter[Row] =
    pings.writeStream
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink.write(VehicleMessages.fromPings(batch))
      }

  /** Effectively-once variant: Structured Streaming replays a micro-batch
    * after a crash between sink write and checkpoint commit; recording the
    * committed batchId in a durable ledger and skipping replays upgrades
    * the sink from at-least-once (the reference's contract) to
    * effectively-once — PROVIDED (a) the ledger shares the checkpoint's
    * lifecycle (see [[BatchLedger]]: a reset checkpoint with a stale
    * ledger would silently skip new data under recycled batch ids), and
    * (b) ledger-write and delivery are atomic enough for the receiver
    * (ledger after delivery ⇒ a crash between the two still re-delivers;
    * true exactly-once needs a transactional receiver). */
  def toHttpSinkIdempotent(
      pings: DataFrame, sink: HttpSink, ledger: BatchLedger): DataStreamWriter[Row] =
    pings.writeStream
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!ledger.committed(batchId)) {
          sink.write(VehicleMessages.fromPings(batch))
          ledger.commit(batchId)
        }
      }

  /** Wire pings into a Kinesis-shaped record sink: per micro-batch, each
    * partition groups its pings into per-vehicle messages and sends them
    * as vehicleId-keyed records (per-shard ordering). The producer runs
    * INSIDE the executors via foreachPartition — the driver never sees
    * message data, and each partition's batch chunks at the PutRecords
    * limit in [[KinesisSink.putAll]]. */
  def toKinesisSink(
      pings: DataFrame, sink: KinesisSink, sourceId: Long): DataStreamWriter[Row] =
    pings.writeStream
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val msgs = VehicleMessages.fromPings(batch)
        val chunk = sink.maxBatch // bound per-call memory at the sink's own knob
        msgs.foreachPartition { (it: Iterator[VehicleMessage]) =>
          it.grouped(chunk).foreach(c => sink.sendMessages(sourceId, c))
        }
      }

  /** ST6/ST7 — watermarked streaming dedup on event id with BOUNDED state:
    * `dropDuplicatesWithinWatermark` lets the watermark evict per-id state
    * (plain `dropDuplicates("event_id")` would keep every id forever —
    * the event-time column isn't in the key set, so no eviction predicate
    * is generated, recreating the reference's unbounded-HashSet failure). */
  def dedupStream(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** ST3 — streaming tumbling-window count per event type (same expression
    * as the oracled batch analog q30). */
  def tumblingCounts(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"))

  /** ST5 — streaming session window (30-min inactivity gap) per user; the
    * oracled batch analog is q32. */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("ss"),
        col("session_window.end").as("se"), col("user_id"), col("n_events"))

  /** ST8 — stateful running exact-distinct per key: the streaming version
    * of the reference's HashSet distinct (CsvLoader.java:105-106, 147-148),
    * with state partitioned per key across executors instead of one
    * unbounded driver-side set. Emits (key, runningDistinct) per batch.
    * At 100 TB the exact set becomes an HLL sketch — same shape, bounded
    * state (SURVEY.md §4.3). */
  def runningDistinct(
      spark: SparkSession,
      pings: Dataset[(String, Long)]): Dataset[(String, Long)] = {
    import spark.implicits._
    pings.groupByKey(_._1)
      .mapGroupsWithState[Set[Long], (String, Long)](
        GroupStateTimeout.NoTimeout()) {
        case (key, values, state: GroupState[Set[Long]]) =>
          val seen = state.getOption.getOrElse(Set.empty[Long]) ++ values.map(_._2)
          state.update(seen)
          (key, seen.size.toLong)
      }
  }

  /** Convenience: run an AvailableNow foreachBatch query to completion. */
  def runToCompletion(q: StreamingQuery): Unit = {
    q.awaitTermination()
  }

  /** ST8 on the Spark 4 `transformWithState` API: running distinct per key
    * with `MapState` (per-element state-store keys — unlike the
    * mapGroupsWithState `Set` blob, adding one element doesn't rewrite the
    * whole set, and TTLConfig can bound state lifetime at 100 TB). */
  class RunningDistinctProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[String, (String, Long), (String, Long)] {
    import org.apache.spark.sql.streaming.{MapState, OutputMode => OM, TimeMode, TimerValues, TTLConfig}
    import org.apache.spark.sql.Encoders

    @transient private var seen: MapState[Long, Boolean] = _

    override def init(outputMode: OM, timeMode: TimeMode): Unit =
      seen = getHandle.getMapState[Long, Boolean](
        "seen", Encoders.scalaLong, Encoders.scalaBoolean, TTLConfig.NONE)

    override def handleInputRows(
        key: String,
        rows: Iterator[(String, Long)],
        timerValues: TimerValues): Iterator[(String, Long)] = {
      rows.foreach { case (_, v) => seen.updateValue(v, true) }
      var n = 0L
      val it = seen.keys()
      while (it.hasNext) { it.next(); n += 1 }
      Iterator.single((key, n))
    }
  }

  /** Streaming running-distinct via [[RunningDistinctProcessor]]. */
  def runningDistinctTws(
      spark: SparkSession,
      pings: Dataset[(String, Long)]): Dataset[(String, Long)] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    pings.groupByKey(_._1)
      .transformWithState(new RunningDistinctProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** Streaming URL-canonical admission (the q115 rule on the crawl
    * frontier): incoming (doc_id, url, ts) docs are keyed by the
    * CANONICAL url ([[graft.functions.TextRules.canonicalUrl]] — the
    * exact batch expression), and a resubmission whose surface form
    * differs but canonicalizes the same is dropped across micro-batches.
    * `dropDuplicatesWithinWatermark` keeps the per-canon-url state
    * TTL-BOUNDED (the ST7b contract): state is evicted once the
    * watermark passes, so a crawl frontier's dedup memory is the delay
    * window, not the stream's lifetime — re-crawls past the window
    * re-admit by design (production re-crawl cadence). */
  def urlDedupStream(docs: DataFrame, watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("canon_url",
        graft.functions.TextRules.canonicalUrl(col("url")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("canon_url")

  /** Streaming line-level boilerplate rule (the q112 line rule on the
    * admission path): incoming (doc_id, text, ts) docs split into
    * [[LineLen]]-token lines MAP-SIDE (the q112 chunking, declarative so
    * the event-time watermark column survives to the stateful operator),
    * keyed by the raw line (at 100 TB: its 128-bit digest). Per-line
    * state is (first_doc, flagged): a line arriving from a SECOND
    * distinct doc flags — and stays flagged — so later occurrences are
    * marked boilerplate on arrival; the admission layer drops or trims
    * flagged lines. State is TTL-BOUNDED via EVENT-TIME timeout (the
    * ST7b contract, data-driven — no busy re-trigger loop): a line key
    * whose last occurrence falls `ttlMs` behind the watermark is
    * REMOVED, so state size tracks the recently-seen line set, not the
    * stream's lifetime; a recurrence after eviction re-admits as fresh.
    * The batch q112 remains the exact retroactive rule — it also removes
    * the FIRST occurrence, which a stream cannot retract. Output:
    * (doc_id, line, is_boiler). */
  def lineDedupStream(
      spark: SparkSession,
      docs: DataFrame, // (doc_id, text, ts)
      ttlMs: Long): Dataset[(Long, String, Boolean)] = {
    import spark.implicits._
    val toks = split(col("text"), " ")
    val ng = ceil(size(toks) / lit(LineLen.toDouble)).cast("int")
    val lines = docs
      .select(col("doc_id"), col("ts"),
        explode(transform(sequence(lit(0), ng - 1),
          i => concat_ws(" ", slice(toks, i * LineLen + 1, lit(LineLen)))))
          .as("line"))
      .withWatermark("ts", s"$ttlMs milliseconds")
      .select(col("doc_id"), col("line"), col("ts"))
      .as[(Long, String, java.sql.Timestamp)]
    lines.groupByKey(_._2)
      .flatMapGroupsWithState[(Long, Boolean), (Long, String, Boolean)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (line, rows, state: GroupState[(Long, Boolean)]) =>
          if (state.hasTimedOut) {
            state.remove() // TTL eviction — bounded state
            Iterator.empty
          } else {
            val out = scala.collection.mutable.ArrayBuffer[(Long, String, Boolean)]()
            var maxTs = Long.MinValue
            // the group iterator's order after the shuffle is unspecified:
            // sort by (ts, doc_id) so WHICH occurrence counts as "first"
            // (and therefore which later rows flag) is deterministic when
            // several docs share a line within one micro-batch
            rows.toSeq.sortBy { case (doc, _, ts) => (ts.getTime, doc) }
              .foreach { case (doc, _, ts) =>
              maxTs = math.max(maxTs, ts.getTime)
              state.getOption match {
                case None =>
                  state.update((doc, false))
                  out += ((doc, line, false))
                case Some((first, flagged)) =>
                  val boiler = flagged || doc != first
                  if (boiler && !flagged) state.update((first, true))
                  out += ((doc, line, boiler))
              }
            }
            // evict once the watermark passes lastSeen + TTL (must stay
            // ahead of the current watermark — late rows clamp forward)
            state.setTimeoutTimestamp(
              math.max(maxTs + ttlMs, state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
  }

  /** q112's line width, shared with [[lineDedupStream]]. */
  private val LineLen = 5

  /** Streaming SEMANTIC near-dup admission — the embedding-path member
    * of the admission family (urlDedupStream canon keys, lineDedupStream
    * boilerplate lines, [[NearDupAdmission]] shingle blocking; this one
    * is cosine over embeddings). Incoming (vec_id, embedding, ts)
    * vectors route to their IVF2 cell MAP-SIDE using the landed
    * quantizer's bounded serve state
    * ([[graft.queries.LlmOps.ivf2ServeState]] — 4 + 4·k₂ centroid rows
    * collected once, never the corpus), and within each cell a
    * TTL-bounded state of recently ADMITTED embeddings rejects any
    * arrival whose cosine against one of them is ≥ `threshold`,
    * across micro-batches. Cell blocking is the SemDeDup argument on
    * the admission path: an arrival compares against its own cell's
    * recent admissions only, so per-arrival work is the cell's TTL-window
    * admission count, never the stream's. State is evicted by
    * EVENT-TIME timeout and per-entry pruning (the ST7b contract): a
    * near-dup arriving past the TTL re-admits by design — the batch
    * q99/q151 semantic dedup remains the exact retroactive rule.
    * Output: (vec_id, cell, admitted). */
  def semanticDedupStream(
      spark: SparkSession,
      vecs: DataFrame, // (vec_id, embedding: array<float>, ts)
      corpusDir: String,
      threshold: Double,
      ttlMs: Long): Dataset[(Long, Long, Boolean)] = {
    import spark.implicits._
    val serveState = graft.queries.LlmOps.ivf2ServeState(spark, corpusDir)
    val routed = graft.queries.LlmOps.ivf2AssignCells(
        vecs.withColumn("vq", transform(col("embedding"),
          v => round(v.cast("double") * 10000, 0).cast("long"))), serveState)
      .withWatermark("ts", s"$ttlMs milliseconds")
      .select(col("cell"), col("vec_id"), col("embedding"), col("ts"))
      .as[(Long, Long, Array[Float], java.sql.Timestamp)]
    routed.groupByKey(_._1)
      .flatMapGroupsWithState[List[(Long, Array[Float], Long)],
        (Long, Long, Boolean)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (cell, rows, st: GroupState[List[(Long, Array[Float], Long)]]) =>
          if (st.hasTimedOut) {
            st.remove() // TTL eviction — bounded state
            Iterator.empty
          } else {
            def cosine(a: Array[Float], b: Array[Float]): Double = {
              var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
              while (i < a.length) {
                dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
                nb += b(i).toDouble * b(i); i += 1
              }
              if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
            }
            // prune entries whose lastSeen fell TTL behind the watermark —
            // state tracks the recent-admission window even while the cell
            // key itself stays hot
            var recent = st.getOption.getOrElse(Nil)
              .filter(_._3 >= st.getCurrentWatermarkMs() - ttlMs)
            val out =
              scala.collection.mutable.ArrayBuffer[(Long, Long, Boolean)]()
            var maxTs = Long.MinValue
            // group-iterator order after the shuffle is unspecified: sort
            // by (ts, vec_id) so in-batch admission order is deterministic
            rows.toSeq.sortBy { case (_, id, _, ts) => (ts.getTime, id) }
              .foreach { case (_, id, emb, ts) =>
                maxTs = math.max(maxTs, ts.getTime)
                val dup = recent.exists {
                  case (_, e, _) => cosine(e, emb) >= threshold
                }
                if (!dup) recent = (id, emb, ts.getTime) :: recent
                out += ((id, cell, !dup))
              }
            st.update(recent)
            st.setTimeoutTimestamp(
              math.max(maxTs + ttlMs, st.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
  }
}
