package graft.sources

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

import graft.ingest.IngestFiles

/** Streaming side of [[VehicleCsvSource]] (MICRO_BATCH_READ): the same
  * per-file partitions, the same parse/drop semantics, the same
  * decompression dispatch (plain/.gz/.zip-first-entry, case-insensitive)
  * as the batch scan — so `spark.readStream.format("graft-vehicle-csv")`
  * is the ONE streaming ingest path and the `spark.readStream.text`
  * detour (which could not serve `.zip` archives — zip is not a Hadoop
  * line-reader codec) is gone.
  *
  * Offsets are indices into a durable, append-only FILE LOG under the
  * source's checkpoint location: offset N means "the first N files
  * admitted to the log". Discovery lists the input path, appends unseen
  * files in deterministic (lexicographic) order, and persists the
  * appended segment BEFORE the offset is returned to the engine — so any
  * offset the engine ever records is covered by the durable log, and a
  * restart replans the exact same files for an uncommitted batch. The
  * log is segment-per-append (`<startIndex>` named, write-tmp-then-
  * rename), the same crash-safe shape as Spark's own file-source
  * metadata log; processed files are never re-read after restart because
  * the committed offset already covers them.
  *
  * Admission control: `maxFilesPerTrigger` bounds each micro-batch
  * ([[ReadMaxFiles]]); Trigger.AvailableNow pins the end bound at
  * prepare time ([[SupportsTriggerAvailableNow]]) so the run drains
  * exactly the files present at start and terminates even while new
  * files keep landing.
  *
  * Scale shape: driver state is the file log (paths only — the same
  * O(#files) the engine's own FileStreamSource keeps); per micro-batch
  * work is one list call plus the per-file readers, which stream
  * line-by-line exactly like the batch scan. */
private[sources] class VehicleCsvMicroBatchStream(
    path: String,
    required: StructType,
    pushed: Array[Filter],
    checkpointLocation: String,
    maxFilesPerTrigger: Option[Int],
    conf: Configuration,
    confProps: Seq[(String, String)])
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  private val log =
    new VehicleCsvFileLog(new HPath(checkpointLocation, "graft-file-log"), conf)

  /** Trigger.AvailableNow end bound: files admitted at prepare time. */
  @volatile private var availableNowBound: Option[Long] = None

  /** List the input path and admit unseen files to the durable log.
    * A missing/empty directory is "no data yet" for a stream, not the
    * batch scan's FileNotFoundException. */
  private def discover(): Unit = {
    val listed =
      try IngestFiles.listInputFiles(path, conf)
      catch { case _: java.io.FileNotFoundException => Seq.empty[String] }
    val fresh = listed.filterNot(log.contains).sorted
    if (fresh.nonEmpty) log.append(fresh)
  }

  override def prepareForTriggerAvailableNow(): Unit = {
    discover()
    availableNowBound = Some(log.size)
  }

  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerTrigger.map(ReadLimit.maxFiles).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    // under AvailableNow the bound is already admitted — do not grow it
    if (availableNowBound.isEmpty) discover()
    val upper = availableNowBound.getOrElse(log.size)
    val from = start.asInstanceOf[VehicleCsvOffset].index
    val end = limit match {
      case m: ReadMaxFiles => math.min(upper, from + m.maxFiles)
      case _               => upper
    }
    VehicleCsvOffset(math.max(from, end))
  }

  override def latestOffset(): Offset = throw new UnsupportedOperationException(
    "latestOffset(Offset, ReadLimit) is used (SupportsAdmissionControl)")

  override def reportLatestOffset(): Offset = VehicleCsvOffset(log.size)

  override def initialOffset(): Offset = VehicleCsvOffset(0L)

  override def deserializeOffset(json: String): Offset =
    VehicleCsvOffset(json.trim.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    log.slice(start.asInstanceOf[VehicleCsvOffset].index,
        end.asInstanceOf[VehicleCsvOffset].index)
      .map(f => VehicleCsvPartition(f): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    VehicleCsvReaderFactory(required, pushed, confProps)

  override def commit(end: Offset): Unit = () // offsets durable at latestOffset time

  override def stop(): Unit = ()
}

/** Offset = number of files admitted to the durable file log. */
private[sources] case class VehicleCsvOffset(index: Long) extends Offset {
  override def json(): String = index.toString
}

/** Durable append-only file log under the source checkpoint: one
  * immutable segment file per append, named by the log index its first
  * entry occupies, one file path per line. Loading replays segments in
  * index order and requires contiguity — a gap means a foreign or
  * corrupt checkpoint, which must fail loudly rather than re-read or
  * skip data.
  *
  * COMPACTION (100 TB posture): a long-running stream appends one
  * segment per discovery round that found files; unbounded, that is a
  * small-files problem on the checkpoint store. Every
  * [[VehicleCsvFileLog.CompactInterval]] appends the whole log rewrites
  * into a single `<until>.compact` file (covering entries `[0, until)`)
  * and the superseded segments are deleted — the same shape as Spark's
  * own CompactibleFileStreamLog. Crash-safety: the compact lands via
  * tmp+rename BEFORE any delete, and the loader takes the largest
  * compact then replays only plain segments from its end — a stale
  * overlap (crash mid-delete) is ignored, never double-counted. */
private[sources] final class VehicleCsvFileLog(dir: HPath, conf: Configuration) {
  private val fs = dir.getFileSystem(conf)
  private val entries = scala.collection.mutable.ArrayBuffer.empty[String]
  private val known = scala.collection.mutable.HashSet.empty[String]
  private var plainSegments = 0 // plain (non-compact) segments on disk

  locally {
    if (fs.exists(dir)) {
      val all = fs.listStatus(dir).toSeq.filter(_.isFile)
      val compacts = all.flatMap { st =>
        val n = st.getPath.getName
        if (n.endsWith(".compact"))
          scala.util.Try(n.stripSuffix(".compact").toLong).toOption
            .map(_ -> st.getPath)
        else None
      }
      val base = compacts.sortBy(_._1).lastOption
      base.foreach { case (until, p) =>
        readSegment(p)
        require(entries.size.toLong == until,
          s"vehicle-csv file log: compact $until holds ${entries.size} entries")
      }
      val segments = all
        .flatMap(st => scala.util.Try(st.getPath.getName.toLong).toOption
          .map(_ -> st.getPath))
        .filter(_._1 >= entries.size.toLong) // pre-compact leftovers: stale
        .sortBy(_._1)
      segments.foreach { case (from, p) =>
        require(from == entries.size.toLong,
          s"vehicle-csv file log gap: segment $from after ${entries.size} entries")
        readSegment(p)
        plainSegments += 1
      }
    } else fs.mkdirs(dir)
  }

  private def readSegment(p: HPath): Unit = {
    val in = new BufferedReader(
      new InputStreamReader(fs.open(p), StandardCharsets.UTF_8))
    try {
      var line = in.readLine()
      while (line != null) {
        if (line.nonEmpty) { entries += line; known += line }
        line = in.readLine()
      }
    } finally in.close()
  }

  private def writeAtomic(name: String, lines: Seq[String]): HPath = {
    val dst = new HPath(dir, name)
    val tmp = new HPath(dir, s".$name.tmp")
    val out = fs.create(tmp, true)
    try out.write(lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (!fs.rename(tmp, dst)) {
      fs.delete(tmp, false)
      throw new IllegalStateException(
        s"vehicle-csv file log: could not commit $dst")
    }
    dst
  }

  def size: Long = entries.size.toLong

  def contains(file: String): Boolean = known.contains(file)

  def slice(from: Long, until: Long): Seq[String] = {
    require(until <= entries.size.toLong,
      s"offset $until beyond durable file log (${entries.size} entries)")
    entries.slice(from.toInt, until.toInt).toSeq
  }

  /** Durably append: write a tmp file, rename to `<startIndex>`. The
    * rename completes before the caller exposes the new offset, so every
    * engine-recorded offset is backed by landed bytes. */
  def append(files: Seq[String]): Unit = {
    if (files.isEmpty) return
    writeAtomic(entries.size.toString, files)
    entries ++= files
    known ++= files
    plainSegments += 1
    if (plainSegments >= VehicleCsvFileLog.CompactInterval) compact()
  }

  /** Rewrite the whole log as one `<size>.compact`, then delete the
    * superseded plain segments and older compacts (delete AFTER the
    * compact is durable — a crash in between leaves a recoverable,
    * merely redundant, state). */
  private def compact(): Unit = {
    val landed = writeAtomic(s"${entries.size}.compact", entries.toSeq)
    // compare by NAME: listStatus returns scheme-qualified paths while
    // `landed` inherits dir's form — an object-identity compare here
    // would delete the just-landed compact itself
    fs.listStatus(dir).toSeq.filter(_.isFile).foreach { st =>
      if (st.getPath.getName != landed.getName)
        fs.delete(st.getPath, false)
    }
    plainSegments = 0
  }
}

private[sources] object VehicleCsvFileLog {
  /** Plain segments accumulated before the log rewrites itself into one
    * compact file (Spark's CompactibleFileStreamLog defaults to 10). */
  val CompactInterval = 10
}
