package graft.multimodal

import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO
import javax.imageio.stream.{MemoryCacheImageInputStream, MemoryCacheImageOutputStream}

/** REAL multi-frame decode on `javax.imageio`'s GIF support — the JDK
  * ships no general video codec (H.264 etc. stay stubbed, honestly),
  * but it DOES read and write multi-frame GIF streams, which is enough
  * to make the video-shaped plumbing real end to end: frame count,
  * per-frame pixel access, frame sampling, and a deterministic
  * procedural fixture generator. A real production decoder (JNI ffmpeg)
  * would replace [[decodeFrames]] wholesale; every Spark-side shape —
  * batched mapPartitions, explode-per-frame, metadata — is exercised
  * for real here.
  *
  * Determinism: GIF is palette-based and LOSSLESS for images that use
  * ≤ 256 distinct colors — the procedural fixtures keep ≤ 64 distinct
  * RGB values per frame, so encode → decode round-trips pixels exactly
  * (MultimodalSpec pins a planted frame pixel). Threading: stateless
  * per call, same contract as [[ImageCodec]]/[[AudioCodec]]. */
object VideoCodec {

  // same I/O-path switch as [[ImageCodec]] (r20): heap-backed ImageIO
  // streams, identical bytes — set here too so the flag holds no matter
  // which codec object loads first
  ImageIO.setUseCache(false)

  /** Decode a multi-frame image stream (GIF) → per-frame (width,
    * height, ARGB pixels); None when the payload has no frames or is
    * not a decodable multi-frame container (corrupt members route,
    * never crash). */
  def decodeFrames(payload: Array[Byte]): Option[Seq[(Int, Int, Array[Int])]] = {
    try {
      val iis = new MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val reader = readers.next()
        reader.setInput(iis)
        try {
          val n = reader.getNumImages(true)
          if (n <= 0) None
          else Some((0 until n).map { i =>
            val img = reader.read(i)
            val w = img.getWidth
            val h = img.getHeight
            (w, h, img.getRGB(0, 0, w, h, null, 0, w))
          })
        } finally reader.dispose()
      } finally iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Decode ONLY the first frame of a multi-frame stream — the
    * keyframe-hash hot path (q183): `reader.read(0)` parses one frame
    * instead of [[decodeFrames]]' full getNumImages + per-frame walk
    * (measured ~2.8× warm at 10× data when every frame was decoded for
    * a frame-0 hash). Same routing contract: None on anything
    * undecodable. */
  def decodeFirstFrame(payload: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    try {
      val iis = new MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val reader = readers.next()
        reader.setInput(iis)
        try {
          val img = reader.read(0)
          val w = img.getWidth
          val h = img.getHeight
          Some((w, h, img.getRGB(0, 0, w, h, null, 0, w)))
        } finally reader.dispose()
      } finally iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Encode frames (equal dims, ARGB ints, ≤ 256 distinct colors per
    * frame for losslessness) as one multi-frame GIF stream. Each frame
    * is written TYPE_BYTE_INDEXED with an IndexColorModel holding
    * exactly the frame's distinct colors — the JDK GIF writer adopts
    * that palette verbatim, so the round-trip is exact (writing
    * TYPE_INT_RGB instead would re-quantize through the writer's
    * default palette and crush channels). */
  def encodeGif(w: Int, h: Int, frames: Seq[Array[Int]]): Array[Byte] = {
    require(frames.nonEmpty && frames.forall(_.length == w * h),
      s"bad frame geometry for ${w}x$h")
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new ByteArrayOutputStream()
    val ios = new MemoryCacheImageOutputStream(bos)
    // Interlace must be off: the JDK writer's default is progressive
    // (interlaced row order) and its interlaced output does not survive
    // its own reader on short images (rows land shifted) — observed
    // here, matching long-standing GIFImageWriter interlace bugs.
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(writer.getDefaultStreamMetadata(param))
      frames.foreach { px =>
        val palette = px.map(_ & 0xffffff).distinct.sorted
        require(palette.length <= 256,
          s"frame has ${palette.length} distinct colors; GIF caps at 256")
        val icm = new java.awt.image.IndexColorModel(8, palette.length,
          palette.map(c => ((c >> 16) & 0xff).toByte),
          palette.map(c => ((c >> 8) & 0xff).toByte),
          palette.map(c => (c & 0xff).toByte))
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
        // write raster INDICES directly: setRGB on an indexed image
        // runs a per-pixel color-model search (measured dominating the
        // q52c fixture pass at ~12 s/sweep); an explicit color→index
        // map is O(1) per pixel and exact by construction
        val idx = new java.util.HashMap[Integer, Integer](palette.length * 2)
        var pi = 0
        while (pi < palette.length) { idx.put(palette(pi), pi); pi += 1 }
        val raster = img.getRaster
        var p = 0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            raster.setSample(x, y, 0, idx.get(px(p) & 0xffffff).intValue())
            x += 1
            p += 1
          }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null),
          param)
      }
      writer.endWriteSequence()
      ios.flush()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }
}
