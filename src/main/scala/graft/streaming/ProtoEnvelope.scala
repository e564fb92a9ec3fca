package graft.streaming

import java.io.ByteArrayOutputStream

/** Hand-rolled protobuf wire-format encoder for the two-message envelope
  * (shape from opentraffic/csv-loader CsvLoader.java:150-156, 206-211; the
  * reference delegates to a generated `ExchangeFormat` class — we mirror
  * the schema clean-room with our own field numbering, documented here):
  *
  * ```proto
  * message VehicleLocation { double lat = 1; double lon = 2; int64 timestamp = 3; }
  * message VehicleMessage  { int64 vehicleId = 1; repeated VehicleLocation locations = 2; }
  * message VehicleMessageEnvelope { int64 sourceId = 1; repeated VehicleMessage messages = 2; }
  * ```
  *
  * Zero dependencies (the container has no protobuf-java / spark-protobuf
  * descriptor tooling); the wire format of varint + fixed64 + length-
  * delimited fields is public protobuf spec. Encoding runs inside
  * `foreachBatch` on executors — one byte array per ≤10k-message batch.
  */
object ProtoEnvelope {

  private def writeVarint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  private def writeTag(out: ByteArrayOutputStream, field: Int, wireType: Int): Unit =
    writeVarint(out, (field.toLong << 3) | wireType)

  private def writeDouble(out: ByteArrayOutputStream, field: Int, d: Double): Unit = {
    writeTag(out, field, 1) // fixed64
    val bits = java.lang.Double.doubleToLongBits(d)
    var i = 0
    while (i < 8) { out.write(((bits >>> (8 * i)) & 0xff).toInt); i += 1 }
  }

  private def writeInt64(out: ByteArrayOutputStream, field: Int, v: Long): Unit = {
    writeTag(out, field, 0) // varint
    writeVarint(out, v)
  }

  private def writeBytes(out: ByteArrayOutputStream, field: Int, b: Array[Byte]): Unit = {
    writeTag(out, field, 2) // length-delimited
    writeVarint(out, b.length.toLong)
    out.write(b, 0, b.length)
  }

  def encodeLocation(l: VehicleLocation): Array[Byte] = {
    val out = new ByteArrayOutputStream(32)
    writeDouble(out, 1, l.lat)
    writeDouble(out, 2, l.lon)
    writeInt64(out, 3, l.timestamp)
    out.toByteArray
  }

  def encodeMessage(m: VehicleMessage): Array[Byte] = {
    val out = new ByteArrayOutputStream(64)
    writeInt64(out, 1, m.vehicleId)
    m.locations.foreach(l => writeBytes(out, 2, encodeLocation(l)))
    out.toByteArray
  }

  /** `VehicleMessageEnvelope{sourceId, messages}` → wire bytes. */
  def encodeEnvelope(sourceId: Long, messages: Seq[VehicleMessage]): Array[Byte] = {
    val out = new ByteArrayOutputStream(64 * (messages.size + 1))
    writeInt64(out, 1, sourceId)
    messages.foreach(m => writeBytes(out, 2, encodeMessage(m)))
    out.toByteArray
  }

  // ---- minimal decoder (tests + receiver stubs) ----

  final case class Reader(buf: Array[Byte], var pos: Int = 0) {
    def hasMore: Boolean = pos < buf.length
    def readVarint(): Long = {
      var shift = 0; var result = 0L
      var b = 0
      do {
        b = buf(pos) & 0xff; pos += 1
        result |= (b & 0x7fL) << shift
        shift += 7
      } while ((b & 0x80) != 0)
      result
    }
    def readDouble(): Double = {
      var bits = 0L
      var i = 0
      while (i < 8) { bits |= (buf(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += 8
      java.lang.Double.longBitsToDouble(bits)
    }
    def readBytes(): Array[Byte] = {
      val len = readVarint().toInt
      val b = java.util.Arrays.copyOfRange(buf, pos, pos + len)
      pos += len
      b
    }
  }

  def decodeEnvelope(bytes: Array[Byte]): (Long, Seq[VehicleMessage]) = {
    val r = Reader(bytes)
    var sourceId = 0L
    val msgs = Seq.newBuilder[VehicleMessage]
    while (r.hasMore) {
      val tag = r.readVarint()
      (tag >> 3).toInt match {
        case 1 => sourceId = r.readVarint()
        case 2 => msgs += decodeMessage(r.readBytes())
        case _ => throw new IllegalArgumentException(s"unknown field ${tag >> 3}")
      }
    }
    (sourceId, msgs.result())
  }

  private def decodeMessage(bytes: Array[Byte]): VehicleMessage = {
    val r = Reader(bytes)
    var vid = 0L
    val locs = Seq.newBuilder[VehicleLocation]
    while (r.hasMore) {
      val tag = r.readVarint()
      (tag >> 3).toInt match {
        case 1 => vid = r.readVarint()
        case 2 => locs += decodeLocation(r.readBytes())
        case _ => throw new IllegalArgumentException(s"unknown field ${tag >> 3}")
      }
    }
    VehicleMessage(vid, locs.result())
  }

  private def decodeLocation(bytes: Array[Byte]): VehicleLocation = {
    val r = Reader(bytes)
    var lat = 0.0; var lon = 0.0; var ts = 0L
    while (r.hasMore) {
      val tag = r.readVarint()
      (tag >> 3).toInt match {
        case 1 => lat = r.readDouble()
        case 2 => lon = r.readDouble()
        case 3 => ts = r.readVarint()
        case _ => throw new IllegalArgumentException(s"unknown field ${tag >> 3}")
      }
    }
    VehicleLocation(lat, lon, ts)
  }
}
