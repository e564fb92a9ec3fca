package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** REAL audio codec on `javax.sound.sampled` — in the JDK, so no new
  * dependency (r13 verdict ask #5, correcting the earlier claim that the
  * JDK ships no audio codec: it does, for WAV/AIFF/AU containers of raw
  * PCM): WAV encode for fixture/payload generation and WAV/PCM decode to
  * 16-bit samples, plus deterministic integer feature math (mean |amp|,
  * RMS, zero crossings). Multi-frame GIF video decodes through
  * [[VideoCodec]]; only general video codecs (H.264 …) remain stubbed
  * — the JDK genuinely ships none.
  *
  * Determinism notes (the properties MultimodalSpec pins):
  *   - WAV/PCM is lossless: encode(samples) → decode = samples exactly,
  *     on any JVM (RIFF stores the raw little-endian PCM words).
  *   - Feature math is integer/long accumulation over exact samples —
  *     no floating summation order dependence until the final divide.
  *
  * Threading: AudioSystem.getAudioInputStream/write are stateless per
  * call, so the per-partition batch loop needs no locking — same
  * contract as [[ImageCodec]]. */
object AudioCodec {

  /** Mono 16-bit signed little-endian PCM — the canonical WAV payload
    * format for fixtures and the decode target for conversion. */
  private def pcm16(sampleRate: Int): AudioFormat =
    new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, sampleRate.toFloat,
      16, 1, 2, sampleRate.toFloat, false)

  /** Encode mono 16-bit samples as WAV bytes (lossless round-trip:
    * decode(encodeWav(sr, s)) == (sr, s) exactly). */
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val bytes = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      bytes(2 * i) = (samples(i) & 0xff).toByte
      bytes(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val in = new AudioInputStream(new ByteArrayInputStream(bytes),
      pcm16(sampleRate), samples.length.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(in, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Decode audio bytes → (sample_rate, mono 16-bit samples); None when
    * the payload is not decodable audio (corrupt members route, never
    * crash — the [[ImageCodec.decode]] contract). Non-16-bit or
    * multi-channel PCM is converted through the JDK's format-conversion
    * chain to mono 16-bit first; sources the chain can't convert (or
    * non-audio bytes) yield None. */
  def decode(payload: Array[Byte]): Option[(Int, Array[Short])] = {
    try {
      val src = AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(payload))
      try {
        val rate = math.round(src.getFormat.getSampleRate)
        val target = pcm16(rate)
        val pcm =
          if (src.getFormat.matches(target)) src
          else AudioSystem.getAudioInputStream(target, src)
        val raw = pcm.readAllBytes()
        val n = raw.length / 2
        val out = new Array[Short](n)
        var i = 0
        while (i < n) {
          out(i) =
            (((raw(2 * i + 1) & 0xff) << 8) | (raw(2 * i) & 0xff)).toShort
          i += 1
        }
        Some((rate, out))
      } finally src.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Fast-path WAV/PCM16 encode: the canonical 44-byte RIFF header +
    * little-endian samples, BYTE-IDENTICAL to [[encodeWav]]'s
    * `AudioSystem.write` output (MultimodalSpec pins the equality), so
    * fixture generators can skip the per-call provider machinery the
    * same way [[decodePcm]] does on the read side. */
  def encodeWavFast(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    def putAscii(o: Int, s: String): Unit = {
      var i = 0
      while (i < s.length) { out(o + i) = s.charAt(i).toByte; i += 1 }
    }
    def put32(o: Int, v: Long): Unit = {
      out(o) = (v & 0xff).toByte
      out(o + 1) = ((v >> 8) & 0xff).toByte
      out(o + 2) = ((v >> 16) & 0xff).toByte
      out(o + 3) = ((v >> 24) & 0xff).toByte
    }
    def put16(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte
      out(o + 1) = ((v >> 8) & 0xff).toByte
    }
    putAscii(0, "RIFF"); put32(4, 36L + dataLen); putAscii(8, "WAVE")
    putAscii(12, "fmt "); put32(16, 16L); put16(20, 1); put16(22, 1)
    put32(24, sampleRate.toLong); put32(28, sampleRate.toLong * 2)
    put16(32, 2); put16(34, 16)
    putAscii(36, "data"); put32(40, dataLen.toLong)
    var i = 0
    while (i < samples.length) {
      out(44 + 2 * i) = (samples(i) & 0xff).toByte
      out(44 + 2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  /** Fast-path WAV/PCM16 decode: a direct RIFF chunk walk (fmt + data,
    * PCM_SIGNED 16-bit little-endian, MONO only — multi-channel audio
    * routes through [[decode]]'s downmix chain so the two paths always
    * agree). Exists because [[decode]]'s
    * `AudioSystem.getAudioInputStream` pays per-call provider probing
    * (~0.3 ms/clip measured at 16 threads — it dominated q180's
    * fingerprint pass and scaled with row count), while a production
    * fingerprinter parses PCM frames directly. NOT a second source of
    * truth: MultimodalSpec pins `decodePcm == decode` on every
    * round-trip fixture, so the JDK codec remains the semantics and
    * this is its measured-equivalent hot path. Returns None for
    * anything that is not a plain PCM16 WAV (those route through
    * [[decode]]'s conversion chain instead). */
  def decodePcm(payload: Array[Byte]): Option[(Int, Array[Short])] = {
    if (payload.length < 44 ||
      payload(0) != 'R' || payload(1) != 'I' || payload(2) != 'F' ||
      payload(3) != 'F' || payload(8) != 'W' || payload(9) != 'A' ||
      payload(10) != 'V' || payload(11) != 'E') return None
    def u16(o: Int) = (payload(o) & 0xff) | ((payload(o + 1) & 0xff) << 8)
    def u32(o: Int) = (payload(o) & 0xff).toLong |
      ((payload(o + 1) & 0xff).toLong << 8) |
      ((payload(o + 2) & 0xff).toLong << 16) |
      ((payload(o + 3) & 0xff).toLong << 24)
    var off = 12L
    var rate = -1
    var dataOff = -1
    var dataLen = -1L
    while (off + 8 <= payload.length && (rate < 0 || dataOff < 0)) {
      val o = off.toInt
      val id = new String(payload, o, 4, "US-ASCII")
      // chunk lengths are UNSIGNED 32-bit and corruption-controlled:
      // walk with Long offsets and reject non-advancing/overflowing
      // chunks instead of trusting len.toInt (a 0xFFFFFFF8 length would
      // otherwise advance by zero and spin forever — review finding)
      val len = u32(o + 4)
      if (id == "fmt ") {
        if (len < 16 || o + 24 > payload.length) return None
        val fmtTag = u16(o + 8)
        val channels = u16(o + 10)
        val bits = u16(o + 22)
        // only plain MONO PCM16 takes the fast path: anything else
        // (incl. multi-channel, which decode() downmixes) must route
        // through the JDK conversion chain so the two paths agree
        if (fmtTag != 1 || bits != 16 || channels != 1) return None
        rate = u32(o + 12).toInt
      } else if (id == "data") {
        dataOff = o + 8
        dataLen = len
      }
      off += 8L + len + (len & 1L) // chunks are word-aligned
    }
    if (rate <= 0 || dataOff < 0) return None
    val n = math.min(dataLen, (payload.length - dataOff).toLong).toInt / 2
    val out = new Array[Short](n)
    var i = 0
    while (i < n) {
      out(i) = ((payload(dataOff + 2 * i) & 0xff) |
        ((payload(dataOff + 2 * i + 1) & 0xff) << 8)).toShort
      i += 1
    }
    Some((rate, out))
  }

  /** Zero-crossing count: sign changes between consecutive samples
    * (zero counts as non-negative) — integer-exact. */
  def zeroCrossings(samples: Array[Short]): Long = {
    var z = 0L
    var i = 1
    while (i < samples.length) {
      if ((samples(i - 1) < 0) != (samples(i) < 0)) z += 1
      i += 1
    }
    z
  }

  /** Mean absolute amplitude — long accumulation, one final divide. */
  def meanAbs(samples: Array[Short]): Double =
    if (samples.isEmpty) 0.0
    else {
      var s = 0L
      samples.foreach(v => s += math.abs(v.toLong))
      s.toDouble / samples.length
    }

  /** Root-mean-square amplitude — long accumulation of squares (a
    * 16-bit sample squares to < 2^30; 2^33 samples before overflow),
    * one final divide + sqrt. */
  def rms(samples: Array[Short]): Double =
    if (samples.isEmpty) 0.0
    else {
      var s = 0L
      samples.foreach(v => s += v.toLong * v.toLong)
      math.sqrt(s.toDouble / samples.length)
    }

  /** 128-bit acoustic fingerprint (the energy-delta form of q178's
    * image dHash — the Haitsma-Kalker family's simplest member): split
    * the clip into 129 equal frames (integer boundaries i·n/129),
    * per-frame energy = Σ|sample| (long-exact), and bit i is set when
    * frame i+1's energy strictly exceeds frame i's — 128 comparisons as
    * (hi, lo) longs (comparison i < 64 → `lo` bit i; else `hi` bit
    * i−64). A near-duplicate clip flips only the bits whose comparisons
    * touch perturbed frames — each changed frame moves at most 2 bits.
    * 128 bits so the q180 bands are 16 wide (see
    * [[ImageCodec.dHash128]]'s scale note). Deterministic integer math
    * throughout. */
  def eHash128(samples: Array[Short]): (Long, Long) = {
    val n = samples.length
    val e = new Array[Long](129)
    var f = 0
    while (f < 129) {
      val lo = (f.toLong * n / 129).toInt
      val hi = ((f + 1).toLong * n / 129).toInt
      var s = 0L
      var i = lo
      while (i < hi) { s += math.abs(samples(i).toLong); i += 1 }
      e(f) = s
      f += 1
    }
    var lo = 0L
    var hi = 0L
    var i = 0
    while (i < 128) {
      if (e(i + 1) > e(i)) {
        if (i < 64) lo |= 1L << i else hi |= 1L << (i - 64)
      }
      i += 1
    }
    (hi, lo)
  }

  /** The sample range [lo, hi) that [[eHash128]]'s frame f covers for
    * an n-sample clip — exposed so fixtures can perturb KNOWN frames
    * (flipping a bounded number of hash bits). */
  def eHashFrameRange(n: Int, f: Int): (Int, Int) =
    ((f.toLong * n / 129).toInt, ((f + 1).toLong * n / 129).toInt)
}
