package graft.sources

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}

import org.apache.spark.internal.Logging
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
  * DRIVER STATE IS BOUNDED for an eternal stream (100 TB posture):
  * `maxFileAge` (default 7d, the engine file source's own default
  * semantics) makes discovery ignore files older than `max-seen-modTime
  * − age` and EVICTS the dedup map below that watermark — safe because
  * eviction only forgets files the age filter already excludes, so a
  * processed-then-aged-out file can never re-admit. The in-memory log
  * also trims its committed prefix at every `commit` (those indices are
  * never re-planned; the durable log keeps them for restart/audit). Net:
  * driver memory is O(in-flight window + age window), not O(stream
  * lifetime) — set `maxFileAge=off` to disable for bounded directories. */
private[sources] class VehicleCsvMicroBatchStream(
    path: String,
    required: StructType,
    pushed: Array[Filter],
    checkpointLocation: String,
    maxFilesPerTrigger: Option[Int],
    maxFileAgeMs: Option[Long],
    conf: Configuration,
    confProps: Seq[(String, String)])
    extends MicroBatchStream with SupportsTriggerAvailableNow with Logging {

  private val fileLog =
    new VehicleCsvFileLog(new HPath(checkpointLocation, "graft-file-log"), conf)

  /** Trigger.AvailableNow end bound: files admitted at prepare time. */
  @volatile private var availableNowBound: Option[Long] = None

  /** Monotonic max modification time across every listing — the age
    * cutoff's anchor (monotonic ⇒ the eviction cutoff never moves
    * backwards, the invariant eviction safety rests on). */
  private var modTimeWatermark = Long.MinValue

  /** List the input path and admit unseen, in-age files to the durable
    * log. A missing/empty directory is "no data yet" for a stream, not
    * the batch scan's FileNotFoundException. */
  private def discover(): Unit = {
    val listed =
      try IngestFiles.listInputFileStatuses(path, conf)
      catch { case _: java.io.FileNotFoundException => Seq.empty[(String, Long)] }
    if (listed.nonEmpty)
      modTimeWatermark = math.max(modTimeWatermark, listed.map(_._2).max)
    val cutoff = maxFileAgeMs match {
      case Some(age) if modTimeWatermark != Long.MinValue =>
        modTimeWatermark - age
      case _ => Long.MinValue
    }
    val (inAge, aged) = listed.partition(_._2 >= cutoff)
    if (aged.nonEmpty)
      logWarning(s"graft-vehicle-csv stream: ignoring ${aged.size} files " +
        s"older than maxFileAge (modTime < $cutoff)")
    val fresh = inAge.filterNot(f => fileLog.contains(f._1)).sortBy(_._1)
    if (fresh.nonEmpty) fileLog.append(fresh)
    fileLog.evictKnownBelow(cutoff) // forgets only what the age filter excludes
  }

  override def prepareForTriggerAvailableNow(): Unit = {
    discover()
    availableNowBound = Some(fileLog.size)
  }

  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerTrigger.map(ReadLimit.maxFiles).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    // under AvailableNow the bound is already admitted — do not grow it
    if (availableNowBound.isEmpty) discover()
    val upper = availableNowBound.getOrElse(fileLog.size)
    val from = start.asInstanceOf[VehicleCsvOffset].index
    val end = limit match {
      case m: ReadMaxFiles => math.min(upper, from + m.maxFiles)
      case _               => upper
    }
    VehicleCsvOffset(math.max(from, end))
  }

  override def latestOffset(): Offset = throw new UnsupportedOperationException(
    "latestOffset(Offset, ReadLimit) is used (SupportsAdmissionControl)")

  override def reportLatestOffset(): Offset = VehicleCsvOffset(fileLog.size)

  override def initialOffset(): Offset = VehicleCsvOffset(0L)

  override def deserializeOffset(json: String): Offset =
    VehicleCsvOffset(json.trim.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    fileLog.slice(start.asInstanceOf[VehicleCsvOffset].index,
        end.asInstanceOf[VehicleCsvOffset].index)
      .map(f => VehicleCsvPartition(f): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    VehicleCsvReaderFactory(required, pushed, confProps)

  /** Offsets are already durable (landed at latestOffset time); commit
    * trims the in-memory log prefix — indices below a committed offset
    * are never re-planned in this run, and a restart reloads them from
    * the durable log. */
  override def commit(end: Offset): Unit =
    fileLog.trimCommitted(end.asInstanceOf[VehicleCsvOffset].index)

  override def stop(): Unit = ()
}

/** Offset = number of files admitted to the durable file log. */
private[sources] case class VehicleCsvOffset(index: Long) extends Offset {
  override def json(): String = index.toString
}

/** Durable append-only file log under the source checkpoint: one
  * immutable segment file per append, named by the log index its first
  * entry occupies, one `<modTime>\t<path>` line per file. Loading
  * replays segments in index order and requires contiguity — a gap
  * means a foreign or corrupt checkpoint, which must fail loudly rather
  * than re-read or skip data.
  *
  * COMPACTION (100 TB posture): a long-running stream appends one
  * segment per discovery round that found files; unbounded, that is a
  * small-files problem on the checkpoint store. Every
  * [[VehicleCsvFileLog.CompactInterval]] appends the whole retained log
  * rewrites into a single `<until>.compact` file and the superseded
  * segments are deleted — the same shape as Spark's own
  * CompactibleFileStreamLog. Crash-safety: the compact lands via
  * tmp+rename BEFORE any delete, and the loader takes the largest
  * compact then replays only plain segments from its end — a stale
  * overlap (crash mid-delete) is ignored, never double-counted.
  *
  * MEMORY: the in-memory entry buffer drops its committed prefix
  * ([[trimCommitted]] — `base` records how much) and the dedup map
  * evicts below the caller's age cutoff ([[evictKnownBelow]]); the
  * durable files keep everything for restart/audit. */
private[sources] final class VehicleCsvFileLog(dir: HPath, conf: Configuration) {
  private val fs = dir.getFileSystem(conf)
  /** entries(i) holds log index `base + i`; the committed prefix
    * [0, base) is trimmed from memory, never from disk. */
  private var base = 0L
  private val entries = scala.collection.mutable.ArrayBuffer.empty[String]
  /** path → modTime of every non-evicted admitted file (the discovery
    * dedup set). */
  private val known = scala.collection.mutable.HashMap.empty[String, Long]
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
      val baseCompact = compacts.sortBy(_._1).lastOption
      baseCompact.foreach { case (until, p) =>
        readSegment(p)
        require(size == until,
          s"vehicle-csv file log: compact $until holds $size entries")
      }
      val segments = all
        .flatMap(st => scala.util.Try(st.getPath.getName.toLong).toOption
          .map(_ -> st.getPath))
        .filter(_._1 >= size) // pre-compact leftovers: stale
        .sortBy(_._1)
      segments.foreach { case (from, p) =>
        require(from == size,
          s"vehicle-csv file log gap: segment $from after $size entries")
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
        if (line.nonEmpty) {
          val tab = line.indexOf('\t')
          val (mtime, file) =
            if (tab < 0) (0L, line) else (line.substring(0, tab).toLong,
              line.substring(tab + 1))
          entries += file
          known(file) = mtime
        }
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

  def size: Long = base + entries.size

  def contains(file: String): Boolean = known.contains(file)

  /** Test/diagnostic hook: current dedup-map cardinality. */
  def knownSize: Int = known.size

  def slice(from: Long, until: Long): Seq[String] = {
    require(from >= base,
      s"offset $from below the trimmed in-memory log (base $base) — " +
        "the engine never re-plans committed batches in-run")
    require(until <= size,
      s"offset $until beyond durable file log ($size entries)")
    entries.slice((from - base).toInt, (until - base).toInt).toSeq
  }

  /** Durably append `(path, modTime)` files: write a tmp file, rename to
    * `<startIndex>`. The rename completes before the caller exposes the
    * new offset, so every engine-recorded offset is backed by landed
    * bytes. */
  def append(files: Seq[(String, Long)]): Unit = {
    if (files.isEmpty) return
    writeAtomic(size.toString, files.map(f => s"${f._2}\t${f._1}"))
    entries ++= files.map(_._1)
    known ++= files
    plainSegments += 1
    if (plainSegments >= VehicleCsvFileLog.CompactInterval) compact()
  }

  /** Drop the in-memory prefix below a committed offset. Disk is
    * untouched — restart reloads everything. */
  def trimCommitted(upTo: Long): Unit = {
    val drop = math.min(math.max(0L, upTo - base), entries.size.toLong).toInt
    if (drop > 0) {
      entries.remove(0, drop)
      base += drop
    }
  }

  /** Evict dedup-map entries whose modTime is below the caller's age
    * cutoff. Safe ONLY because the caller filters its listings by the
    * same (monotonic) cutoff before consulting [[contains]]. */
  def evictKnownBelow(cutoffModTime: Long): Unit =
    if (cutoffModTime > Long.MinValue)
      known.filterInPlace { case (_, m) => m >= cutoffModTime }

  /** Rewrite the RETAINED in-memory log as one `<size>.compact`, then
    * delete the superseded plain segments and older compacts (delete
    * AFTER the compact is durable — a crash in between leaves a
    * recoverable, merely redundant, state). Entries already trimmed by
    * [[trimCommitted]] are only dropped from the compact when no disk
    * segment still covers them — i.e. never silently: the compact must
    * cover [0, size) for the loader's contiguity check, so compaction
    * re-reads trimmed entries from the existing disk files. */
  private def compact(): Unit = {
    // the compact must span [0, size): re-read the trimmed prefix from
    // the current disk state (cheap: happens once per CompactInterval)
    val full =
      if (base == 0L) entries.map(f => s"${known.getOrElse(f, 0L)}\t$f").toSeq
      else {
        val reload = new VehicleCsvFileLog(dir, conf)
        reload.entries.map(f => s"${reload.known.getOrElse(f, 0L)}\t$f").toSeq
      }
    val landed = writeAtomic(s"$size.compact", full)
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
