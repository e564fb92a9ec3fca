package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The r17 fingerprint band-join scale guards (r16 verdict ask #2):
  * identical-hash consolidation (the exact fallback for a planted
  * identical-media flood), the derived bucket-occupancy cap with its
  * documented drop semantics, the spanning-edge closure equivalence,
  * and the frame-variant arithmetic matched-frame count. All inputs are
  * constructed hash relations — no codec in the loop — so each property
  * pins the JOIN machinery itself. */
class FingerprintGuardSpec extends SparkSpec {

  import spark.implicits._

  /** Pairwise-distant 128-bit hashes: golden-ratio mixing puts any two
    * ids ~64 bits apart, far beyond radius 7. */
  private def farHash(i: Long): (Long, Long) = {
    val m = i * 0x9E3779B97F4A7C15L
    // keep sign bits clear like the production hashes (DuckDB parity
    // convention; irrelevant here but keeps fixtures comparable)
    (m & 0x7FFFFFFFFFFFFFFFL, java.lang.Long.reverse(m) & 0x7FFFFFFFFFFFFFFFL)
  }

  private def hashDf(rows: Seq[(Long, Long, Long)]): DataFrame =
    rows.toDF("media_id", "h_hi", "h_lo")

  test("identical-hash flood consolidates: the band join runs over " +
      "distinct hashes only; the expanded output is the exact pair set") {
    val floodK = 60
    val flood = (0L until floodK).map(i => (i, 0x1234567812345678L & 0x7F7F7F7F7F7F7F7FL, 0x0102030405060708L))
    val background = (100L until 140L).map { i =>
      val (hi, lo) = farHash(i); (i, hi, lo)
    }
    val hashes = hashDf(flood ++ background)

    // the join-side relation is one row per DISTINCT hash
    val mem = LlmOps.withFpRep(hashes)
    val reps = mem.filter(col("media_id") === col("rep"))
    assert(reps.count() == 1 + background.size,
      "flood must collapse to one rep before the band join")
    // and the distinct-hash pair join yields NO pairs here (background
    // hashes are pairwise-far; the flood is a single group)
    assert(LlmOps.repPairs(
      reps.select(col("rep"), col("h_hi"), col("h_lo"))).count() == 0)

    // the full expansion is exactly the flood's within-group pair set
    val pairs = LlmOps.hammingBandPairs(hashes).collect()
    assert(pairs.length == floodK * (floodK - 1) / 2)
    assert(pairs.forall(r => r.getAs[Int]("hamming") == 0))
    assert(pairs.forall(r => r.getAs[Long]("ma") < r.getAs[Long]("mb")))
  }

  test("cross-group expansion: near-dup groups of identical hashes pair " +
      "every member across groups at the group Hamming distance") {
    // two hash groups one bit apart, 3 members each
    val a = (0L until 3L).map(i => (i, 0x1111111111111111L, 0x2222222222222222L))
    val b = (10L until 13L).map(i => (i, 0x1111111111111111L, 0x2222222222222223L))
    val pairs = LlmOps.hammingBandPairs(hashDf(a ++ b)).collect()
    // 3 within A + 3 within B at hamming 0, 9 cross at hamming 1
    assert(pairs.length == 15)
    assert(pairs.count(_.getAs[Int]("hamming") == 0) == 6)
    assert(pairs.count(_.getAs[Int]("hamming") == 1) == 9)
    // interleaved ids still order ma < mb
    assert(pairs.forall(r => r.getAs[Long]("ma") < r.getAs[Long]("mb")))
  }

  test("occupancy guard: a distinct-hash flood on one 16-bit chunk drops " +
      "that bucket from candidate generation; other buckets are intact") {
    // 400 DISTINCT hashes sharing band-0 chunk 0x00AB (h_lo low 16 bits)
    // but pairwise-far elsewhere, plus uniform background that keeps the
    // occupancy p99 at the floor (cap = 16 × 16 = 256 < 400)
    val hot = (0L until 400L).map { i =>
      val (hi, lo) = farHash(i + 1000)
      (i, hi, (lo & ~0xFFFFL) | 0x00ABL)
    }
    val background = (2000L until 4000L).map { i =>
      val (hi, lo) = farHash(i); (i, hi, lo)
    }
    val reps = hashDf(hot ++ background)
      .select(col("media_id").as("rep"), col("h_hi"), col("h_lo"))
    val buckets = LlmOps.guardedBandBuckets(reps, Seq("rep", "h_hi", "h_lo"))
    val hotBucket = buckets
      .filter(col("band") === 0 && col("chunk") === 0x00ABL)
    assert(hotBucket.count() == 0, "the over-cap bucket must drop")
    // every row not in the hot bucket survives: 8 bands × 2400 − 400
    // (minus any background rows that landed in the same bucket — none,
    // asserted by construction below)
    assert(buckets.count() == 8L * 2400 - 400)
  }

  test("occupancy guard drop semantics (documented): a radius-7 pair " +
      "whose ONLY matching band is a capped bucket is lost — and found " +
      "again when the corpus does not flood that bucket") {
    // two hashes matching ONLY at band-0 chunk 0x00AB, Hamming 7 (one
    // flipped bit in each of the other 7 bands)
    val base = 0x0203040506070809L
    val hiA = 0x0A0B0C0D0E0F1011L
    def flip(word: Long, bands: Seq[Int]): Long =
      bands.foldLeft(word)((w, b) => w ^ (1L << (b * 16)))
    val pairRows = Seq(
      (9000L, hiA, (base & ~0xFFFFL) | 0x00ABL),
      (9001L, flip(hiA, Seq(0, 1, 2, 3)), (flip(base, Seq(1, 2, 3)) & ~0xFFFFL) | 0x00ABL))
    // sanity: the pair really is Hamming 7 and matches only at band 0
    val h = java.lang.Long.bitCount(pairRows(0)._2 ^ pairRows(1)._2) +
      java.lang.Long.bitCount(pairRows(0)._3 ^ pairRows(1)._3)
    assert(h == 7)

    val hot = (0L until 400L).map { i =>
      val (hi, lo) = farHash(i + 5000)
      (i, hi, (lo & ~0xFFFFL) | 0x00ABL)
    }
    val background = (2000L until 4000L).map { i =>
      val (hi, lo) = farHash(i); (i, hi, lo)
    }
    val withFlood = LlmOps.hammingBandPairs(
      hashDf(hot ++ background ++ pairRows)).collect()
    assert(!withFlood.exists(r => r.getAs[Long]("ma") == 9000L &&
      r.getAs[Long]("mb") == 9001L),
      "pair reachable only through the capped bucket is dropped (documented)")

    val noFlood = LlmOps.hammingBandPairs(
      hashDf(background ++ pairRows)).collect()
    assert(noFlood.exists(r => r.getAs[Long]("ma") == 9000L &&
      r.getAs[Long]("mb") == 9001L && r.getAs[Int]("hamming") == 7),
      "without the flood the same pair is recovered exactly")
  }

  test("spanning edges close to the same components as the full pair " +
      "relation (flood + chained near-dup groups)") {
    val flood = (0L until 30L).map(i => (i, 0x1111111111111111L, 0x2222222222222222L))
    // a chain of groups: g0 ~ g1 ~ g2 (1 bit apart each), members 2 each
    def grp(ids: Seq[Long], lo: Long) = ids.map(i => (i, 0x0505050505050505L, lo))
    val chain = grp(Seq(100L, 101L), 0x40L) ++ grp(Seq(110L, 111L), 0x41L) ++
      grp(Seq(120L, 121L), 0x43L)
    val isolated = (200L until 210L).map { i =>
      val (hi, lo) = farHash(i); (i, hi, lo)
    }
    val hashes = hashDf(flood ++ chain ++ isolated)

    def components(edges: Seq[(Long, Long)], nodes: Seq[Long]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
      def find(x: Long): Long =
        if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      nodes.map(n => n -> find(n)).toMap
    }
    val nodes = hashes.select("media_id").as[Long].collect().toSeq
    val full = components(LlmOpsTestAccess.pairs(hashes), nodes)
    val span = components(LlmOpsTestAccess.spanning(hashes), nodes)
    assert(full == span, "spanning edges must close to identical components")
    // and the spanning relation is linear in the flood, not quadratic
    assert(LlmOps.hammingBandSpanningEdges(hashes).count() ==
      (30 - 1) + (2 - 1) * 3 + /* chain group links */ 3)
  }

  test("frame variant: identical-frame flood counts matched frames " +
      "arithmetically — no frame-pair materialization, exact counts") {
    // 10 clips × 5 frames, all the same hash
    val rows = for (c <- 0L until 10L; f <- 0 until 5)
      yield (c, f, 0x0F0F0F0F0F0F0F0FL, 0x3333333333333333L)
    val out = LlmOps.hammingBandFramePairs(
      rows.toDF("media_id", "frame_idx", "h_hi", "h_lo")).collect()
    assert(out.length == 45, "all clip pairs")
    assert(out.forall(r => r.getAs[Int]("hamming") == 0 &&
      r.getAs[Long]("matched_frames") == 25L))

    // a trimmed-copy shape: clip B carries 3 of A's 6 frame hashes
    val a = (0 until 6).map(f => (0L, f, 0x0101010101010101L, 0x0202020202020200L + f))
    val b = (0 until 3).map(f => (1L, f, 0x0101010101010101L, 0x0202020202020203L + f))
    val out2 = LlmOps.hammingBandFramePairs(
      (a ++ b).toDF("media_id", "frame_idx", "h_hi", "h_lo")).collect()
    assert(out2.length == 1)
    assert(out2.head.getAs[Int]("hamming") == 0)
    // shared hashes ..03/..04/..05 match 1:1; near (≤7) pairs add more —
    // count exactly what the definition says: frame pairs within radius
    val expect = (for (x <- a; y <- b) yield
      java.lang.Long.bitCount(x._4 ^ y._4)).count(_ <= 7)
    assert(out2.head.getAs[Long]("matched_frames") == expect.toLong)
  }
}

/** Package-private accessors returning driver-side edge lists for the
  * CC-equivalence property. */
private object LlmOpsTestAccess {
  def pairs(hashes: DataFrame): Seq[(Long, Long)] =
    LlmOps.hammingBandPairs(hashes).collect()
      .map(r => (r.getAs[Long]("ma"), r.getAs[Long]("mb"))).toSeq
  def spanning(hashes: DataFrame): Seq[(Long, Long)] =
    LlmOps.hammingBandSpanningEdges(hashes).collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db"))).toSeq
}
