package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardOpenOption}

/** Durable record of committed sink batch ids, keyed per query — the
  * de-duplication half of an effectively-once `foreachBatch` sink (see
  * [[StreamIngest.toHttpSinkIdempotent]]). The file implementation is a
  * driver-side append-only log (one id per line), adequate for a
  * single-driver query; at scale the ledger lives in the receiver's
  * store (transactional insert keyed by (queryId, batchId)). */
trait BatchLedger extends Serializable {
  def committed(batchId: Long): Boolean
  def commit(batchId: Long): Unit
}

class FileBatchLedger(dir: String) extends BatchLedger {
  private def file: Path = {
    val d = Paths.get(dir)
    Files.createDirectories(d)
    d.resolve("committed_batches")
  }

  override def committed(batchId: Long): Boolean =
    Files.exists(file) &&
      Files.readAllLines(file).contains(batchId.toString)

  override def commit(batchId: Long): Unit =
    Files.write(file, (batchId.toString + "\n").getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
}
