package graft.streaming

/** Record-batch sink abstraction: the reference *declares* a Kinesis path
  * (README.md:2 "via HTTP or Kinesis"; unused aws-java-sdk dep,
  * pom.xml:100-104) but never implements it. We keep the seam real — the
  * streaming pipeline writes through this trait — and ship an in-memory
  * stub in place of a cloud client (zero-egress environment; a real
  * implementation would PutRecords per ≤500-record chunk with partition
  * key = vehicleId for per-vehicle ordering).
  */
trait EnvelopeSink extends Serializable {
  /** Deliver one encoded envelope; at-least-once contract. */
  def send(envelope: Array[Byte]): Unit
}

/** Stub standing in for a Kinesis producer: collects envelopes in a
  * process-local buffer keyed by stream name (test-observable). */
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
