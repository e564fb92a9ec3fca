package graft.streaming

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.internal.Logging
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener.{QueryIdleEvent, QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}

/** Progress/metrics emission (SURVEY.md §2.1 S9): the reference logs a
  * line per ~10k-record flush — records loaded, unique vehicles, unique
  * ids (CsvLoader.java:161-165). The Structured-Streaming-native analog is
  * a `StreamingQueryListener` on micro-batch progress: per-batch input
  * rows, cumulative total, and processing rate, without any driver-side
  * per-record state (the distinct counts live in the stateful operators —
  * see StreamIngest.runningDistinctTws — not in a driver HashSet that OOMs at
  * 100 TB).
  *
  * Attach with `spark.streams.addListener(new ProgressLog)`.
  */
class ProgressLog extends StreamingQueryListener with Logging {
  private val total = new AtomicLong(0)

  /** Cumulative input rows across batches (test-observable). */
  def totalRows: Long = total.get()

  override def onQueryStarted(event: QueryStartedEvent): Unit =
    logInfo(s"[ingest] query ${event.id} started")

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    val cum = total.addAndGet(p.numInputRows)
    logInfo(f"[ingest] batch ${p.batchId}: ${p.numInputRows} records " +
      f"(total $cum; ${p.processedRowsPerSecond}%.0f rec/s)")
  }

  override def onQueryIdle(event: QueryIdleEvent): Unit = ()

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit =
    logInfo(s"[ingest] query ${event.id} terminated (total ${total.get()})")
}
