package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.streaming.{KinesisConsumerTransport, ProtoEnvelope}

/** Kinesis CONSUMER as a DSv2 streaming source (r17 verdict stretch #7)
  * — `spark.readStream.format("graft-kinesis-source").option("stream",
  * …).option("transport", …)` — the read-side symmetry of
  * [[KinesisSinkSource]]: the reference only DECLARES Kinesis delivery
  * (README.md:2, unused aws-java-sdk dep), so both halves are
  * north-star surface built on the same [[graft.streaming.KinesisSink]]
  * transport seam and envelope codec.
  *
  * Offsets are per-shard sequence positions (`{"shard":nextSeq,…}`) —
  * exactly how a sequence-number-checkpointed Kinesis reader resumes
  * (GetShardIterator AT_SEQUENCE_NUMBER). A micro-batch reads each
  * shard's [from, until) slice, one partition per shard with work (the
  * service's parallelism unit), decoding every envelope's messages to
  * ping rows tagged with (shard, seq, source_id). Offsets are derived
  * from the transport's per-shard tips at plan time, so a replayed
  * epoch re-reads the exact slice — effectively-once into an idempotent
  * downstream, at-least-once otherwise (the checkpointed-consumer
  * contract).
  *
  * `startingPosition` = `trim_horizon` (default: read the stream from
  * its retained start) | `latest` (only records arriving after the
  * query starts). `maxRecordsPerTrigger` caps a micro-batch's total
  * admitted records, split evenly across shards (per-shard cap
  * ⌈max/shards⌉ — Kinesis throttles per shard, so an even split is the
  * service-shaped bound).
  *
  * RESHARDING (r19 — was out of scope in r18): the consumer follows
  * splits and merges with the KCL's parent-before-child discipline —
  * a child shard admits NOTHING until every parent is drained to its
  * SHARD_END, which preserves per-key order across the handoff (a
  * key's post-split records live only in the child that inherited its
  * hash range). Offsets mark drained-closed shards FINAL (`"12!"`) so
  * the proof survives the transport expiring closed shards from its
  * listings. Each record is still read exactly once: closed shards
  * never grow, and the per-shard [from, until) slices are disjoint
  * across batches as before. */
class KinesisSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-kinesis-source"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KinesisSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new KinesisSourceTable(properties)
}

object KinesisSource {
  /** Decoded ping rows plus their stream coordinates — the consumer
    * inverse of the sink's envelope encoding. */
  val Schema: StructType = StructType(Seq(
    StructField("shard", IntegerType, nullable = false),
    StructField("seq", LongType, nullable = false),
    StructField("source_id", LongType, nullable = false),
    StructField("vehicle_id", LongType, nullable = false),
    StructField("lat", DoubleType, nullable = false),
    StructField("lon", DoubleType, nullable = false),
    StructField("ts_ms", LongType, nullable = false)))
}

private[sources] class KinesisSourceTable(
    properties: java.util.Map[String, String]) extends Table
    with SupportsRead {
  override def name(): String = "graft-kinesis-source"
  override def schema(): StructType = KinesisSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val opts = HttpSinkSource.mergedOptions(properties, options)
    val stream = opts.get("stream")
    require(stream != null, "graft-kinesis-source requires option 'stream'")
    val transport = opts.get("transport")
    require(transport != null,
      "graft-kinesis-source requires option 'transport' (a KinesisTransports name)")
    // resolve at PLAN time (loud if unregistered); the CONSTRUCTED
    // transport must implement the consumer half
    val factory = KinesisTransports.factory(transport)
    require(factory().isInstanceOf[KinesisConsumerTransport],
      s"transport '$transport' is not a KinesisConsumerTransport — " +
        "the source needs the consumer half (shardIds/tip/read)")
    val startLatest = Option(opts.get("startingPosition"))
      .map(_.toLowerCase(java.util.Locale.ROOT)).getOrElse("trim_horizon")
      match {
        case "latest"       => true
        case "trim_horizon" => false
        case bad => throw new IllegalArgumentException(
          s"startingPosition must be trim_horizon|latest, got '$bad'")
      }
    val maxPerTrigger = Option(opts.get("maxRecordsPerTrigger")).map { v =>
      val n = v.toLong
      require(n > 0, s"maxRecordsPerTrigger must be positive, got $n")
      n
    }
    () => new Scan {
      override def readSchema(): StructType = KinesisSource.Schema
      override def description(): String =
        s"graft-kinesis-source $stream via $transport"
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new KinesisMicroBatchStream(stream, factory, startLatest, maxPerTrigger)
    }
  }
}

/** Offset = per-shard next-sequence positions, JSON `{"0":12,"1":7}`
  * (shard-sorted — offset equality is string equality in the engine's
  * offset log). A shard drained to its SHARD_END serializes as a
  * quoted `"12!"` (r19): the offset itself carries closed-shard
  * FINALITY, so a restart can prove a parent fully drained — and gate
  * its children open — even against a transport that has since expired
  * the closed shard from its listings (real Kinesis forgets closed
  * shards past retention). Plain-number values (pre-r19 checkpoints)
  * parse as non-final. */
private[sources] case class KinesisSourceOffset(positions: Map[Int, Long],
    finals: Set[Int] = Set.empty) extends Offset {
  override def json(): String = positions.toSeq.sortBy(_._1)
    .map { case (s, p) =>
      if (finals.contains(s)) s""""$s":"$p!"""" else s""""$s":$p"""
    }.mkString("{", ",", "}")
}

private[sources] object KinesisSourceOffset {
  def parse(json: String): KinesisSourceOffset = {
    val body = json.trim.stripPrefix("{").stripSuffix("}").trim
    if (body.isEmpty) KinesisSourceOffset(Map.empty)
    else {
      val entries = body.split(",").map { kv =>
        val Array(k, v) = kv.split(":")
        val shard = k.trim.stripPrefix("\"").stripSuffix("\"").toInt
        val raw = v.trim
        val (num, fin) =
          if (raw.startsWith("\""))
            (raw.stripPrefix("\"").stripSuffix("\"").stripSuffix("!"), true)
          else (raw, false)
        (shard, num.toLong, fin)
      }
      KinesisSourceOffset(entries.map(e => e._1 -> e._2).toMap,
        entries.collect { case (s, _, true) => s }.toSet)
    }
  }
}

private[sources] class KinesisMicroBatchStream(
    stream: String,
    factory: () => graft.streaming.KinesisTransport,
    startLatest: Boolean,
    maxRecordsPerTrigger: Option[Long])
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  // driver-side consumer instance (plan-time tips); executors construct
  // their own from the serializable factory
  private val consumer =
    factory().asInstanceOf[KinesisConsumerTransport]

  private def tips(): Map[Int, Long] =
    consumer.shardIds(stream).map(s => s -> consumer.tip(stream, s)).toMap

  @volatile private var availableNowBound: Option[Map[Int, Long]] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowBound = Some(tips())

  override def initialOffset(): Offset =
    if (startLatest) {
      // closed shards start AT their SHARD_END — already final
      val t = tips()
      KinesisSourceOffset(t, t.keySet.filter(s =>
        consumer.shardEnd(stream, s).exists(t(s) >= _)))
    } else
      KinesisSourceOffset(consumer.shardIds(stream).map(_ -> 0L).toMap)

  override def getDefaultReadLimit: ReadLimit =
    maxRecordsPerTrigger.map(ReadLimit.maxRows)
      .getOrElse(ReadLimit.allAvailable())

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val bound = availableNowBound.getOrElse(tips())
    val startOff = start.asInstanceOf[KinesisSourceOffset]
    val from = startOff.positions
    val perShard = limit match {
      case m: ReadMaxRows =>
        // Kinesis throttles per shard — split the row budget evenly
        Some(math.max(1L,
          (m.maxRows() + bound.size - 1) / math.max(1, bound.size)))
      case _ => None
    }
    // KCL resharding discipline: a split/merge CHILD admits nothing
    // until every parent is fully drained to SHARD_END as of the START
    // offset — parent records for a key strictly precede the child's,
    // so this is what preserves per-key order across the handoff. The
    // offset's own finality flag proves a drain even if the transport
    // has expired the closed parent from its listings.
    def drained(p: Int): Boolean =
      startOff.finals.contains(p) ||
        consumer.shardEnd(stream, p).exists(from.getOrElse(p, 0L) >= _) || {
          // r19 ADVICE fix: a parent absent from the current listing with
          // no known SHARD_END and no finality marker in the offset is past
          // retention — its records are unreadable by ANY consumer, so
          // gating the child forever would turn the documented
          // at-least-read-once into silent loss by livelock. Admit the
          // child and say so loudly.
          val expired = !bound.contains(p) &&
            consumer.shardEnd(stream, p).isEmpty
          if (expired)
            System.err.println(s"[kinesis-source] WARN stream=$stream: " +
              s"parent shard $p expired from listings with no SHARD_END " +
              "and no finality marker — treating as drained (its data is " +
              "past retention); per-key order across the handoff cannot " +
              "be proven for keys it carried")
          expired
        }
    // union with the start offset's shards: a closed shard the
    // transport has expired must stay in the offset at its final
    // position (its finality gates descendants forever)
    val positions = (bound.keySet ++ from.keySet).map { shard =>
      val f = from.getOrElse(shard, 0L)
      shard -> (bound.get(shard) match {
        case Some(tip) =>
          val parents = consumer.parents(stream, shard)
          val gated = parents.exists(p => !drained(p))
          math.max(f,
            if (gated) f
            else perShard.fold(tip)(cap => math.min(tip, f + cap)))
        case None => f
      })
    }.toMap
    KinesisSourceOffset(positions, positions.keySet.filter(s =>
      startOff.finals.contains(s) ||
        consumer.shardEnd(stream, s).exists(positions(s) >= _)))
  }

  override def latestOffset(): Offset = throw new UnsupportedOperationException(
    "latestOffset(Offset, ReadLimit) is used (SupportsAdmissionControl)")

  override def reportLatestOffset(): Offset = KinesisSourceOffset(tips())

  override def deserializeOffset(json: String): Offset =
    KinesisSourceOffset.parse(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val f = start.asInstanceOf[KinesisSourceOffset].positions
    val u = end.asInstanceOf[KinesisSourceOffset].positions
    u.toSeq.sortBy(_._1).flatMap { case (shard, until) =>
      val from = f.getOrElse(shard, 0L)
      if (until > from)
        Some(KinesisSourcePartition(shard, from, until): InputPartition)
      else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    KinesisSourceReaderFactory(stream, factory)

  override def commit(end: Offset): Unit = () // no consumer-side trim
  override def stop(): Unit = ()
}

private[sources] case class KinesisSourcePartition(
    shard: Int, from: Long, until: Long) extends InputPartition

/** Ships the serializable transport factory (never the driver instance)
  * — the same cluster contract as the sink's writer factory. */
private[sources] case class KinesisSourceReaderFactory(
    stream: String, factory: () => graft.streaming.KinesisTransport)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val kp = p.asInstanceOf[KinesisSourcePartition]
    new KinesisPartitionReader(stream,
      factory().asInstanceOf[KinesisConsumerTransport], kp)
  }
}

/** One shard's [from, until) slice: decode each record's envelope to
  * (shard, seq, source_id, vehicle_id, lat, lon, ts_ms) rows. Envelopes
  * may hold several messages/locations (the HTTP sink's chunking);
  * every location becomes one row under its record's seq. */
private[sources] class KinesisPartitionReader(
    stream: String, consumer: KinesisConsumerTransport,
    p: KinesisSourcePartition) extends PartitionReader[InternalRow] {

  private val records = consumer.read(stream, p.shard, p.from, p.until)
  private var recIdx = 0
  private var rows: Iterator[InternalRow] = Iterator.empty

  override def next(): Boolean = {
    while (!rows.hasNext && recIdx < records.size) {
      val seq = p.from + recIdx
      val (sourceId, msgs) =
        ProtoEnvelope.decodeEnvelope(records(recIdx).data)
      recIdx += 1
      rows = msgs.iterator.flatMap(m => m.locations.iterator.map { loc =>
        new GenericInternalRow(Array[Any](p.shard, seq, sourceId,
          m.vehicleId, loc.lat, loc.lon, loc.timestamp)): InternalRow
      })
    }
    rows.hasNext
  }

  override def get(): InternalRow = rows.next()
  override def close(): Unit = ()
}
