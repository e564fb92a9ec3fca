package graft.multimodal

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Multimodal plumbing: binary payload + typed metadata schema, batched
  * stub decode, resize/frame-sample shapes (north_star "multimodal
  * columns"). */
class MultimodalSpec extends SparkSpec {

  private lazy val media =
    Multimodal.mediaFromDocuments(Tables.documents(spark, sf0001)).cache()

  test("media table has binary payload + typed metadata struct") {
    val schema = media.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "struct")
    assert(media.count() == 500)
    val kinds = media.select(countDistinct(col("kind"))).collect()(0).getLong(0)
    assert(kinds == 3)
  }

  test("stub decode: deterministic fixed-dim features, one per row") {
    val feats = Multimodal.decodeFeatures(media, dim = 8)
    assert(feats.count() == 500)
    val row = feats.orderBy(col("media_id")).first()
    val v = row.getSeq[Float](1)
    assert(v.length == 8)
    // deterministic: re-running decode yields identical features
    val again = Multimodal.decodeFeatures(media, dim = 8)
      .orderBy(col("media_id")).first().getSeq[Float](1)
    assert(v == again)
    // mean byte of lowercase text is within sane ascii range
    assert(v.head > 32f && v.head < 127f)
  }

  test("PNG round-trip is pixel-exact and recovers a planted pixel") {
    // 3x2 image with distinct planted pixels
    val px = Array(0xff0000, 0x00ff00, 0x0000ff, 0x123456, 0xabcdef, 0x000000)
    val bytes = ImageCodec.encodePng(3, 2, px)
    val Some((w, h, got)) = ImageCodec.decode(bytes)
    assert(w == 3 && h == 2)
    assert(got.map(_ & 0xffffff).toSeq == px.toSeq,
      "PNG decode must be lossless")
    // planted pixel (x=1, y=1) = 0xabcdef survives encode->decode
    assert((got(1 * 3 + 1) & 0xffffff) == 0xabcdef)
    // JPEG: lossy — dimensions survive, pixels need not
    val Some((jw, jh, _)) = ImageCodec.decode(ImageCodec.encodeJpeg(3, 2, px))
    assert(jw == 3 && jh == 2)
    // corrupt payload routes to None, never throws
    assert(ImageCodec.decode("not an image".getBytes).isEmpty)
  }

  test("nearest-neighbor resize: exact index math on a planted grid") {
    // 4x4 grid of distinct values resized to 2x2 must pick pixels at
    // source indices (0,0), (2,0), (0,2), (2,2) — floor(out*src/dst)
    val px = (0 until 16).toArray
    val out = ImageCodec.resizeNearest(4, 4, px, 2, 2)
    assert(out.toSeq == Seq(0, 2, 8, 10))
    // upscale 2x2 -> 4x4 replicates each source pixel into a 2x2 block
    val up = ImageCodec.resizeNearest(2, 2, Array(1, 2, 3, 4), 4, 4)
    assert(up.toSeq == Seq(1, 1, 2, 2, 1, 1, 2, 2, 3, 3, 4, 4, 3, 3, 4, 4))
  }

  test("real image decode over generated PNG payloads: dims + planted pixel + determinism") {
    val m = Multimodal.mediaWithImagePayloads(Tables.documents(spark, sf0001))
      .filter(col("kind") === "image")
    val dec = Multimodal.decodeImages(m, 8, 8)
    val rows = dec.orderBy(col("media_id")).collect()
    assert(rows.nonEmpty)
    // every payload decoded (no -1 rows) at its meta dimensions
    val metas = m.select(col("media_id"), col("meta.width"), col("meta.height"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    rows.foreach { r =>
      val (w, h) = metas(r.getLong(0))
      assert(r.getInt(1) == w && r.getInt(2) == h,
        s"decoded dims ${r.getInt(1)}x${r.getInt(2)} != meta ${w}x$h")
      assert(r.getInt(3) == 8 && r.getInt(4) == 8)
    }
    // corner_luma equals the luma of the procedural pixel at (0, 0):
    // nearest-neighbor maps out (0,0) -> src (0,0), and PNG is lossless
    rows.foreach { r =>
      val id = r.getLong(0)
      val want = ImageCodec.luma(
        Multimodal.proceduralPixels(id, metas(id)._1, metas(id)._2)(0))
      assert(r.getDouble(6) == want.toDouble,
        s"corner luma drifted for media $id")
    }
    // determinism: a second decode pass is identical
    val again = Multimodal.decodeImages(m, 8, 8).orderBy(col("media_id")).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("WAV round-trip is sample-exact and recovers a planted sample") {
    val samples = Array[Short](0, 1000, -1000, 32767, -32768, 12345, -1)
    val bytes = AudioCodec.encodeWav(16000, samples)
    val Some((sr, got)) = AudioCodec.decode(bytes)
    assert(sr == 16000)
    assert(got.toSeq == samples.toSeq, "WAV/PCM decode must be lossless")
    // planted extrema survive encode->decode exactly
    assert(got(3) == 32767 && got(4) == -32768)
    // feature math is integer-exact on the known signal
    assert(AudioCodec.zeroCrossings(Array[Short](1, -1, 2, 3, -4)) == 3L)
    assert(AudioCodec.meanAbs(Array[Short](3, -5)) == 4.0)
    assert(AudioCodec.rms(Array[Short](3, -4)) == math.sqrt(12.5))
    // corrupt payload routes to None, never throws
    assert(AudioCodec.decode("not audio".getBytes).isEmpty)
    assert(AudioCodec.decode(Array.emptyByteArray).isEmpty)
  }

  test("real audio decode over generated WAV payloads: rate + planted samples + determinism") {
    val m = Multimodal.mediaWithAudioPayloads(media)
      .filter(col("kind") === "audio")
    val dec = Multimodal.decodeAudio(m)
    val rows = dec.orderBy(col("media_id")).collect()
    assert(rows.nonEmpty)
    val metas = m.select(col("media_id"), col("meta.sample_rate"),
      col("meta.n_frames")).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    rows.foreach { r =>
      val id = r.getLong(0)
      val (sr, nf) = metas(id)
      assert(r.getInt(1) == sr, s"sample rate drifted for media $id")
      assert(r.getLong(2) == nf.toLong * 64, s"sample count for media $id")
      // decoded features equal the features of the recomputed test-tone
      // (WAV/PCM is lossless, so this pins the whole decode chain)
      val want = Multimodal.proceduralSamples(id, nf * 64)
      assert(r.getLong(5) == AudioCodec.zeroCrossings(want),
        s"zero crossings drifted for media $id")
      assert(r.getDouble(4) == AudioCodec.rms(want),
        s"rms drifted for media $id")
    }
    // determinism: a second decode pass is identical
    val again = Multimodal.decodeAudio(m).orderBy(col("media_id")).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("GIF multi-frame round-trip is pixel-exact on quantized frames " +
      "and recovers a planted frame pixel") {
    // 3 frames of 64-color-quantized pixels round-trip losslessly
    val frames = Multimodal.proceduralFrames(42L, 4, 3, 3)
    val bytes = VideoCodec.encodeGif(4, 3, frames)
    val Some(got) = VideoCodec.decodeFrames(bytes)
    assert(got.length == 3)
    got.zip(frames).zipWithIndex.foreach { case (((w, h, px), want), i) =>
      assert(w == 4 && h == 3, s"frame $i dims")
      assert(px.map(_ & 0xffffff).toSeq == want.toSeq,
        s"frame $i not lossless")
    }
    // planted pixel: frame 2, (x=1, y=1) equals the recomputed fixture
    assert((got(2)._3(1 * 4 + 1) & 0xffffff) ==
      Multimodal.proceduralFrames(42L, 4, 3, 3)(2)(1 * 4 + 1))
    // the keyframe fast path equals the full decode's first frame
    val Some((fw, fh, fpx)) = VideoCodec.decodeFirstFrame(bytes)
    assert((fw, fh) == (got.head._1, got.head._2))
    assert(fpx.toSeq == got.head._3.toSeq,
      "decodeFirstFrame diverged from decodeFrames.head")
    // corrupt payload routes to None, never throws
    assert(VideoCodec.decodeFrames("not a gif".getBytes).isEmpty)
    assert(VideoCodec.decodeFrames(Array.emptyByteArray).isEmpty)
    assert(VideoCodec.decodeFirstFrame("not a gif".getBytes).isEmpty)
  }

  test("real video frame decode over generated GIF payloads: sampled " +
      "frames + dims + determinism") {
    val m = Multimodal.mediaWithVideoPayloads(media)
      .filter(col("kind") === "video")
    val dec = Multimodal.decodeVideoFrames(m, everyK = 4)
    val rows = dec.orderBy(col("media_id"), col("frame_idx")).collect()
    assert(rows.nonEmpty)
    val metas = m.select(col("media_id"), col("meta.width"),
      col("meta.height"), col("meta.n_frames")).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    val byId = rows.groupBy(_.getLong(0))
    assert(byId.keySet == metas.keySet, "every video row decoded")
    byId.foreach { case (id, rs) =>
      val (w, h, nf) = metas(id)
      val cap = math.min(nf, 16)
      assert(rs.length == (cap + 3) / 4, s"media $id sampled-frame count")
      rs.foreach { r =>
        assert(r.getInt(2) == w && r.getInt(3) == h, s"media $id frame dims")
        assert(r.getInt(1) % 4 == 0, s"media $id frame stride")
      }
    }
    val again = Multimodal.decodeVideoFrames(m, everyK = 4)
      .orderBy(col("media_id"), col("frame_idx")).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  private def ham128(a: (Long, Long), b: (Long, Long)): Int =
    java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)

  test("dHash: deterministic, perturbation flips at most 2 bits per " +
      "painted sample cell, distinct seeds are independent") {
    val (w, h) = (40, 30)
    val base = Multimodal.noisePixels(7L, w, h)
    val hBase = ImageCodec.dHash128(w, h, base)
    assert(hBase == ImageCodec.dHash128(w, h, base.clone()))
    // paint the sample cell the member-1 fixture paints: <= 2 bits move
    val p1 = base.clone()
    p1(ImageCodec.dHashSampleIndex(w, h, 2, 3)) = 0xffffff
    val h1 = ImageCodec.dHash128(w, h, p1)
    assert(ham128(hBase, h1) <= 2)
    // two members' paints differ in <= 2 cells -> <= 4 bits apart
    val p2 = base.clone()
    p2(ImageCodec.dHashSampleIndex(w, h, 4, 3)) = 0xffffff
    val h2 = ImageCodec.dHash128(w, h, p2)
    assert(ham128(h1, h2) <= 4)
    // independent seeds: hashes far apart (noise field, not gradients)
    val other = ImageCodec.dHash128(w, h, Multimodal.noisePixels(8L, w, h))
    assert(ham128(hBase, other) > 7)
    // hash survives the PNG round-trip (what dHashes() actually sees)
    val Some((dw, dh, dpx)) = ImageCodec.decode(ImageCodec.encodePng(w, h, p1))
    assert(ImageCodec.dHash128(dw, dh, dpx) == h1)
  }

  test("q178 shape: banded dHash join recovers exactly the planted " +
      "near-dup groups") {
    val pairs = graft.queries.LlmOps.q178(spark, sf0001).collect()
    assert(pairs.nonEmpty)
    // every reported pair is a genuine radius-7 near-dup...
    pairs.foreach { r =>
      assert(r.getInt(2) <= 7, s"pair out of radius: $r")
    }
    // ...and every same-group image pair is recovered (the fixture
    // guarantees Hamming <= 4 within a group; 8 bands make radius-7
    // recall exact, so none may be missed)
    val media = Multimodal.mediaWithNearDupImagePayloads(
      Tables.documents(spark, sf0001))
    val imgIds = media.filter(col("kind") === "image")
      .select(col("media_id")).collect().map(_.getLong(0)).sorted
    val wanted = for {
      a <- imgIds; b <- imgIds
      if a < b && a / 4 == b / 4
    } yield (a, b)
    val got = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    wanted.foreach { p =>
      assert(got.contains(p), s"planted same-group pair missed: $p")
    }
    // determinism
    val again = graft.queries.LlmOps.q178(spark, sf0001).collect()
    assert(pairs.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("eHash: deterministic, silencing one frame flips at most 2 bits, " +
      "distinct seeds are independent, survives the WAV round-trip") {
    val n = 65 * 10
    val base = Multimodal.noiseSamples(5L, n)
    val hBase = AudioCodec.eHash128(base)
    assert(hBase == AudioCodec.eHash128(base.clone()))
    // silence the frame the member-1 fixture silences: <= 2 bits move
    val p1 = base.clone()
    val (lo1, hi1) = AudioCodec.eHashFrameRange(n, 2)
    java.util.Arrays.fill(p1, lo1, hi1, 0.toShort)
    val h1 = AudioCodec.eHash128(p1)
    assert(ham128(hBase, h1) <= 2)
    // two members' silenced frames differ in <= 2 frames -> <= 4 bits
    val p2 = base.clone()
    val (lo2, hi2) = AudioCodec.eHashFrameRange(n, 4)
    java.util.Arrays.fill(p2, lo2, hi2, 0.toShort)
    assert(ham128(h1, AudioCodec.eHash128(p2)) <= 4)
    // independent seeds: fingerprints far apart
    val other = AudioCodec.eHash128(Multimodal.noiseSamples(6L, n))
    assert(ham128(hBase, other) > 7)
    // fingerprint survives the WAV round-trip (what eHashes() sees)
    val Some((_, dec)) = AudioCodec.decode(AudioCodec.encodeWav(16000, p1))
    assert(AudioCodec.eHash128(dec) == h1)
  }

  test("decodePcm equals the javax.sound decode on round-trip fixtures " +
      "and routes non-PCM16 payloads to None") {
    // equivalence across rates, lengths and seeds (incl. odd lengths)
    for (seed <- 0L until 20L) {
      val n = 64 + seed.toInt * 37
      val sr = 8000 + seed.toInt * 1000
      val wav = AudioCodec.encodeWav(sr, Multimodal.noiseSamples(seed, n))
      val fast = AudioCodec.decodePcm(wav)
      assert(fast.isDefined, s"seed $seed: fast path refused a PCM16 WAV")
      assert(fast.map { case (r, s) => (r, s.toSeq) } ==
        AudioCodec.decode(wav).map { case (r, s) => (r, s.toSeq) },
        s"seed $seed: fast path diverged from the JDK codec")
    }
    // fast encode is byte-identical to the JDK writer's output
    for (seed <- 0L until 5L) {
      val s = Multimodal.noiseSamples(seed, 64 + seed.toInt * 33)
      assert(AudioCodec.encodeWavFast(16000, s).toSeq ==
        AudioCodec.encodeWav(16000, s).toSeq,
        s"seed $seed: fast WAV encode diverged from AudioSystem.write")
    }
    // corrupt / non-WAV payloads: None, never a throw
    assert(AudioCodec.decodePcm("not audio at all".getBytes).isEmpty)
    assert(AudioCodec.decodePcm(Array.emptyByteArray).isEmpty)
    // a WAV header claiming a non-PCM16 format routes to None too
    val wav = AudioCodec.encodeWav(16000, Multimodal.noiseSamples(1L, 64))
    wav(20) = 3 // fmt tag -> IEEE float
    assert(AudioCodec.decodePcm(wav).isEmpty)
    // adversarial chunk lengths: 0xFFFFFFF8 (would advance by zero if
    // truncated to Int) and 0x80000000 must terminate, not hang/throw
    for (evil <- Seq(Array(0xf8, 0xff, 0xff, 0xff), Array(0, 0, 0, 0x80))) {
      val bad = AudioCodec.encodeWav(16000, Multimodal.noiseSamples(2L, 64))
      var i = 0
      while (i < 4) { bad(16 + i) = evil(i).toByte; i += 1 } // fmt len
      // the poisoned length skips past the data chunk: must terminate
      // and return None (truncating it to Int would spin forever)
      assert(AudioCodec.decodePcm(bad).isEmpty)
    }
    // stereo PCM16 routes to None (decode()'s downmix is the semantics)
    val stereo = AudioCodec.encodeWav(16000, Multimodal.noiseSamples(3L, 64))
    stereo(22) = 2 // channel count
    assert(AudioCodec.decodePcm(stereo).isEmpty,
      "multi-channel must route through the JDK conversion chain")
  }

  test("q180 shape: banded eHash join recovers exactly the planted " +
      "audio near-dup groups") {
    val pairs = graft.queries.LlmOps.q180(spark, sf0001).collect()
    assert(pairs.nonEmpty)
    pairs.foreach(r => assert(r.getInt(2) <= 7, s"pair out of radius: $r"))
    val m = Multimodal.mediaWithNearDupAudioPayloads(
      Tables.documents(spark, sf0001))
    val audIds = m.filter(col("kind") === "audio")
      .select(col("media_id")).collect().map(_.getLong(0)).sorted
    val wanted = for {
      a <- audIds; b <- audIds
      if a < b && a / 4 == b / 4
    } yield (a, b)
    val got = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    wanted.foreach { p =>
      assert(got.contains(p), s"planted same-group pair missed: $p")
    }
    val again = graft.queries.LlmOps.q180(spark, sf0001).collect()
    assert(pairs.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("q183 shape: frame-granularity banded dHash join recovers the " +
      "planted video near-dup groups INCLUDING the trimmed clips a " +
      "keyframe-only hash misses") {
    val pairs = graft.queries.LlmOps.q183(spark, sf0001).collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(r.getInt(2) <= 7, s"pair out of radius: $r")
      assert(r.getLong(3) >= 1L, s"pair with no matched frames: $r")
    }
    val m = Multimodal.mediaWithNearDupVideoPayloads(
      Tables.documents(spark, sf0001))
    val vidIds = m.filter(col("kind") === "video")
      .select(col("media_id")).collect().map(_.getLong(0)).sorted
    val wanted = for {
      a <- vidIds; b <- vidIds
      if a < b && a / 4 == b / 4
    } yield (a, b)
    val got = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    wanted.foreach { p =>
      assert(got.contains(p), s"planted same-group pair missed: $p")
    }
    // trimmed members (media_id % 4 == 3: the group clip minus its
    // keyframe) are recovered ONLY by cross-frame matching — prove the
    // frame-0 screen alone misses them: the trimmed keyframe (the
    // group's frame 1, an independent noise field) is far outside the
    // band-join radius of its partner's keyframe
    val trimmed = vidIds.filter(_ % 4 == 3)
    assert(trimmed.nonEmpty, "fixture must plant trimmed clips")
    trimmed.foreach { t =>
      assert(got.exists(p => p._1 == t || p._2 == t),
        s"trimmed clip $t missed by the any-frame join")
    }
    val kf = Multimodal.keyframeHashes(m.filter(col("kind") === "video"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    trimmed.foreach { t =>
      vidIds.find(p => p / 4 == t / 4 && p != t).foreach { partner =>
        val (ah, al) = kf(t); val (bh, bl) = kf(partner)
        val ham = java.lang.Long.bitCount(ah ^ bh) +
          java.lang.Long.bitCount(al ^ bl)
        assert(ham > 7,
          s"trimmed keyframe of $t unexpectedly within radius of $partner: $ham")
      }
    }
    val again = graft.queries.LlmOps.q183(spark, sf0001).collect()
    assert(pairs.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("frameHashes row budget: a long clip keeps ~budget CONTENT-" +
      "anchored frames, and a trimmed copy still shares kept frames at " +
      "the derived stride (trim-invariant selection)") {
    import spark.implicits._
    val (w, h) = (24, 20)
    // 120 noise frames; trimmed copy drops the first 5 — an offset an
    // INDEX stride k=8 would only survive when 8 | 5 (never)
    val frames = (0 until 120).map(f =>
      Multimodal.noisePixels(9876L * 131 + f, w, h).map(_ & 0xc0c0c0).toArray)
    val media = Seq(
      (500L, "video", VideoCodec.encodeGif(w, h, frames)),
      (501L, "video", VideoCodec.encodeGif(w, h, frames.drop(5))))
      .toDF("media_id", "kind", "payload")
    val budget = 16
    val kept = Multimodal.frameHashes(media, rowBudget = budget)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    val bySrc = kept.groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSet)
    // bounded: ~budget rows per clip, never the full 120
    assert(bySrc(500L).size <= 2 * budget && bySrc(500L).nonEmpty,
      s"budget must bind: ${bySrc(500L).size}")
    assert(bySrc(501L).size <= 2 * budget)
    // trim-invariant: the clips share kept frame hashes, so the
    // hamming-0 band join recovers the pair at the derived stride
    val shared = bySrc(500L).intersect(bySrc(501L))
    assert(shared.nonEmpty,
      "content-anchored selection must survive the trim offset")
    // determinism of the selection
    val again = Multimodal.frameHashes(media, rowBudget = budget)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(kept.sorted.toSeq == again.sorted.toSeq)
    // and the gate fixtures (8 frames/clip) sit under the default
    // budget: q183's output is byte-unchanged by the calibration
    val fixture = Multimodal.mediaWithNearDupVideoPayloads(
      Tables.documents(spark, sf0001)).filter(col("kind") === "video")
    assert(Multimodal.frameHashes(fixture).count() ==
      Multimodal.frameHashes(fixture, rowBudget = Int.MaxValue).count())
  }

  test("q184: cross-modality fingerprint closure keeps exactly one " +
      "min-id survivor per planted group and audits every media row") {
    val rows = graft.queries.LlmOps.q184(spark, sf0001).collect()
    val ids = Multimodal.mediaFromDocuments(Tables.documents(spark, sf0001))
      .select(col("media_id")).collect().map(_.getLong(0)).toSet
    assert(rows.map(_.getLong(0)).toSet == ids, "audit must cover the corpus")
    assert(rows.length == ids.size, "one audit row per media row")
    // planted structure: within block {4g..4g+3} exactly ids 4g and
    // 4g+3 share a kind (3 ≡ 0 mod 3) and near-dup payloads, so the
    // expected component is {4g, 4g+3} with survivor 4g; 4g+1/4g+2 are
    // singleton survivors of their kinds
    val byId = rows.map(r => r.getLong(0) ->
      (r.getString(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    for (id <- ids) {
      val partner = (id % 4) match {
        case 0 => Some(id + 3)
        case 3 => Some(id - 3)
        case _ => None
      }
      partner.filter(ids.contains) match {
        case Some(p) =>
          val lo = math.min(id, p)
          assert(byId(id)._2 == lo, s"$id cluster_id != $lo: ${byId(id)}")
          assert(byId(id)._3 == 2L, s"$id cluster_size != 2: ${byId(id)}")
          assert(byId(id)._4 == (id != lo), s"$id pruned flag: ${byId(id)}")
        case None =>
          assert(byId(id)._2 == id && byId(id)._3 == 1L && !byId(id)._4,
            s"singleton $id drifted: ${byId(id)}")
      }
    }
    // closure invariant: exactly one survivor per component
    rows.groupBy(_.getLong(2)).foreach { case (cid, members) =>
      assert(members.count(!_.getBoolean(4)) == 1,
        s"cluster $cid has != 1 survivor")
    }
  }

  test("resize rewrites metadata, preserves payload") {
    val resized = Multimodal.resize(media, 224, 224)
    val r = resized.select(col("meta.width"), col("meta.height")).distinct().collect()
    assert(r.length == 1 && r(0).getInt(0) == 224 && r(0).getInt(1) == 224)
    assert(resized.agg(sum(length(col("payload")))).collect()(0).getLong(0) ==
      media.agg(sum(length(col("payload")))).collect()(0).getLong(0))
  }

  test("frame sampling explodes every k-th frame for videos only") {
    val frames = Multimodal.sampleFrames(media, everyK = 10)
    val kinds = frames.join(media, "media_id").select(col("kind")).distinct().collect()
    assert(kinds.map(_.getString(0)).toSeq == Seq("video"))
    // a video with n_frames=N yields ceil(N/10) sampled frames
    val one = media.filter(col("kind") === "video")
      .select(col("media_id"), col("meta.n_frames")).first()
    val n = frames.filter(col("media_id") === one.getLong(0)).count()
    assert(n == (one.getInt(1) + 9) / 10)
  }
}
