package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

/** REAL image codec (r12 verdict ask #5) on `javax.imageio` — in the JDK,
  * so no new dependency: PNG/JPEG/BMP/GIF decode to raw pixels, PNG
  * encode for fixture/payload generation, and a deterministic
  * nearest-neighbor resize. This replaces [[StubCodec]] for image-kind
  * payloads. Audio has its own JDK decoder ([[AudioCodec]], on
  * `javax.sound.sampled` — WAV/PCM) and multi-frame GIF video decodes
  * through [[VideoCodec]]; only general video codecs (H.264 …) remain
  * stubbed — the JDK genuinely ships none.
  *
  * Determinism notes (the properties MultimodalSpec pins):
  *   - PNG round-trip is exact on the RGB channels: [[encodePng]]
  *     writes an opaque TYPE_INT_RGB image (the alpha byte of the input
  *     ints is DROPPED), and [[decode]] returns ARGB with alpha forced
  *     to 0xff — so decode(encode(px)) == px on the low 24 bits, on any
  *     JVM. Callers comparing full ints mask with & 0xffffff (the
  *     engine's pixel pipeline is RGB-only: [[luma]] and the feature
  *     extractors never read alpha).
  *   - Resize is explicit integer source-index arithmetic, NOT
  *     Graphics2D (rendering pipelines may differ across JVMs/platforms;
  *     `(y*h)/oh` floor arithmetic cannot).
  *   - JPEG decode is deterministic per decoder build but not
  *     bit-portable across decoders — consumers needing cross-engine
  *     hashes (the oracle gate) stick to dimension/row checks for JPEG.
  *
  * Threading: ImageIO.read/write are stateless per call (no shared
  * codec instance), so the per-partition batch loop needs no locking;
  * the static registry scan happens once per JVM. */
object ImageCodec {

  // ImageIO defaults to a DISK-backed stream cache: every read/write
  // round-trips a temp file (plus the file-creation lock), which at 32
  // concurrent decode tasks showed up as runTime ≈ 3× cpuTime on the
  // codec stages (r20 profile). Heap-backed streams produce the exact
  // same bytes/pixels — this is an I/O-path switch, not a codec change.
  ImageIO.setUseCache(false)

  /** Decode image bytes → (width, height, ARGB row-major pixels); None
    * when the payload is not a decodable image (a real lake always has
    * corrupt members — callers must route, not crash). */
  def decode(payload: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    val img =
      try ImageIO.read(new ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      Some((w, h, img.getRGB(0, 0, w, h, null, 0, w)))
    }
  }

  /** Deterministic nearest-neighbor resize of ARGB pixels: source index
    * = floor(out_index × src_extent / out_extent) per axis. */
  def resizeNearest(w: Int, h: Int, px: Array[Int],
      ow: Int, oh: Int): Array[Int] = {
    require(w > 0 && h > 0 && ow > 0 && oh > 0 && px.length == w * h,
      s"bad resize geometry: ${w}x$h (${px.length} px) -> ${ow}x$oh")
    val out = new Array[Int](ow * oh)
    var y = 0
    while (y < oh) {
      val sy = (y.toLong * h / oh).toInt
      var x = 0
      while (x < ow) {
        out(y * ow + x) = px(sy * w + (x.toLong * w / ow).toInt)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Encode pixels as PNG bytes — RGB-only contract: the top (alpha)
    * byte of each input int is dropped, and the round-trip
    * decode(encodePng(px)) equals px on the low 24 bits exactly. */
  def encodePng(w: Int, h: Int, px: Array[Int]): Array[Byte] = {
    require(px.length == w * h, s"${px.length} px for ${w}x$h")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, w, h, px, 0, w)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Encode ARGB pixels as JPEG bytes (lossy — spec round-trips
    * dimensions, not pixels). */
  def encodeJpeg(w: Int, h: Int, px: Array[Int]): Array[Byte] = {
    require(px.length == w * h, s"${px.length} px for ${w}x$h")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, w, h, px, 0, w)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** ITU-R BT.601 integer luma of one ARGB pixel (the fixed-point form:
    * (77R + 150G + 29B) >> 8 — integer-exact, engine-portable). */
  def luma(argb: Int): Int = {
    val r = (argb >> 16) & 0xff
    val g = (argb >> 8) & 0xff
    val b = argb & 0xff
    (77 * r + 150 * g + 29 * b) >> 8
  }

  /** 128-bit difference hash (dHash — the classic perceptual image
    * fingerprint, widened): resize to a 17×8 luma grid
    * ([[resizeNearest]], fully deterministic integer math) and emit one
    * bit per horizontally adjacent pair, set when luma strictly
    * increases left→right — 16 comparisons × 8 rows = 128 bits as
    * (hi, lo) longs (comparison i < 64 → `lo` bit i; else `hi` bit
    * i−64). Near-duplicate images land within a small Hamming radius;
    * the banded join in q178 recovers them without a pairwise pass.
    * 128 bits (not 64) so the q178 bands are 16 bits wide — 65 536
    * buckets per band keeps band-bucket occupancy ~n/2^16 and the
    * candidate join linear-ish at corpus scale, where 8-bit bands'
    * n²/256 bucket pairs would blow up. */
  def dHash128(w: Int, h: Int, px: Array[Int]): (Long, Long) = {
    val g = resizeNearest(w, h, px, 17, 8)
    var lo = 0L
    var hi = 0L
    var i = 0
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 16) {
        if (luma(g(y * 17 + x)) > luma(g(y * 17 + x + 1))) {
          if (i < 64) lo |= 1L << i else hi |= 1L << (i - 64)
        }
        i += 1
        x += 1
      }
      y += 1
    }
    (hi, lo)
  }

  /** The source pixel index that the 17×8 dHash grid samples at grid
    * position (gx, gy) for a w×h image — [[resizeNearest]]'s exact
    * index math, exposed so fixtures can perturb KNOWN sample points
    * (flipping a bounded number of hash bits) and specs can recompute
    * them. */
  def dHashSampleIndex(w: Int, h: Int, gx: Int, gy: Int): Int =
    (gy.toLong * h / 8).toInt * w + (gx.toLong * w / 17).toInt
}
