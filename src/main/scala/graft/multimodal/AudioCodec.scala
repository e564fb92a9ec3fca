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

  /** 64-bit acoustic fingerprint (the energy-delta form of q178's image
    * dHash — the Haitsma-Kalker family's simplest member): split the
    * clip into 65 equal frames (integer boundaries i·n/65), per-frame
    * energy = Σ|sample| (long-exact), and bit i is set when frame i+1's
    * energy strictly exceeds frame i's. A near-duplicate clip (same
    * content, a few frames perturbed) flips only the bits whose
    * comparisons touch perturbed frames — each changed frame moves at
    * most 2 bits. Deterministic integer math throughout. */
  def eHash64(samples: Array[Short]): Long = {
    val n = samples.length
    val e = new Array[Long](65)
    var f = 0
    while (f < 65) {
      val lo = (f.toLong * n / 65).toInt
      val hi = ((f + 1).toLong * n / 65).toInt
      var s = 0L
      var i = lo
      while (i < hi) { s += math.abs(samples(i).toLong); i += 1 }
      e(f) = s
      f += 1
    }
    var bits = 0L
    var i = 0
    while (i < 64) {
      if (e(i + 1) > e(i)) bits |= 1L << i
      i += 1
    }
    bits
  }

  /** The sample range [lo, hi) that [[eHash64]]'s frame f covers for an
    * n-sample clip — exposed so fixtures can perturb KNOWN frames
    * (flipping a bounded number of hash bits). */
  def eHashFrameRange(n: Int, f: Int): (Int, Int) =
    ((f.toLong * n / 65).toInt, ((f + 1).toLong * n / 65).toInt)
}
