package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantics of the non-oracled LLM-pipeline ops: LSH banding recall vs
  * the exact shingle-Jaccard pipeline, dedup idempotence, hash stability. */
class LlmOpsSpec extends SparkSpec {

  test("probe-2 recovers a planted cross-cell neighbor that probe-1 misses") {
    import spark.implicits._
    // hand-built serve state: 2 coarse cells at x=0 / x=100, one
    // sub-cell each (k2 = 1 ⇒ cell id == coarse id). A probe at x=49
    // lands in cell 0; its TRUE nearest neighbor sits at x=52 — just
    // across the Voronoi face, in cell 1. Single-cell serving can never
    // see it; the second probe cell must be 1.
    val state = (
      Array(Array(0L, 0L), Array(100L, 0L)),
      Vector(Vector(Array(0L, 0L)), Vector(Array(100L, 0L))),
      1L)
    val probe = Seq((9000L, Seq(49L, 0L))).toDF("pid", "vq")
    val got = LlmOps.ivf2SecondProbeCell(probe, state)
      .select("pid", "cell2").as[(Long, Option[Long])].collect().toMap
    assert(got(9000L).contains(1L),
      s"second probe cell must be the runner-up coarse cell, got $got")
    // empty runner-up book ⇒ null cell2 (the empty-cell skip contract)
    val stateEmpty = (
      Array(Array(0L, 0L), Array(100L, 0L)),
      Vector(Vector(Array(0L, 0L)), Vector.empty[Array[Long]]),
      1L)
    val gotE = LlmOps.ivf2SecondProbeCell(probe, stateEmpty)
      .select("pid", "cell2").as[(Long, Option[Long])].collect().toMap
    assert(gotE(9000L).isEmpty, "empty runner-up book must yield null cell2")
    // end-to-end on the gate corpus: the widened serve's hit set per
    // probe CONTAINS probe-1's (candidate-set monotonicity) and the
    // recall report is row-wise monotone with a strict global gain
    val rep = LlmOps.q167(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rep.forall { case (_, r1, r2) => r2 >= r1 },
      s"recall@3 must be row-wise monotone: ${rep.mkString(", ")}")
    assert(rep.map(_._3).sum > rep.map(_._2).sum,
      "probe-2 found no cross-cell ground-truth neighbor at sf0.01 — " +
        "widening vacuous on the gate corpus")
  }

  test("decontam gate audit: broadcast/shuffle modes agree; a corpus-hot " +
      "gram still gates (no df cap)") {
    import spark.implicits._
    // mode equivalence: the derived broadcast decision is a PLAN choice,
    // never a result change — same semi-join rows either side of the
    // probed ceiling
    val bench = (1 to 5).map(i => s"g$i").toDF("ngram")
    val corpus = (1 to 100).map(i => (i.toLong, s"g${i % 10}"))
      .toDF("doc_id", "ngram")
    def run(benchRows: Long) = corpus
      .join(LlmOps.benchGate(bench, benchRows), Seq("ngram"), "left_semi")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val viaBroadcast = run(benchRows = 5L)
    val viaShuffle = run(benchRows = LlmOps.BenchBroadcastMaxRows + 1)
    assert(viaBroadcast == viaShuffle && viaBroadcast.nonEmpty)
    // no frequency cap: an 8-gram planted into EVERY corpus doc (df =
    // corpus size — a blocked path's df ceiling would drop it) must
    // still contaminate all of them through the exact q65 chain shape
    val hot = "h0 h1 h2 h3 h4 h5 h6 h7"
    val benchDocs = Seq((0L, s"bench preamble $hot trailing words here"))
      .toDF("doc_id", "text")
    val corpusDocs = (1L to 50L).map(i => (i, s"u$i v$i w$i $hot x$i"))
      .toDF("doc_id", "text")
    val bg = benchDocs.select(graft.functions.NGramExplode(col("text"), 8)
      .as(Seq("pos", "ngram"))).select("ngram").distinct()
    val hits = corpusDocs
      .select(col("doc_id"), graft.functions.NGramExplode(col("text"), 8)
        .as(Seq("pos", "ngram")))
      .select("doc_id", "ngram")
      .join(LlmOps.benchGate(bg, bg.count()), Seq("ngram"), "left_semi")
      .select("doc_id").distinct().count()
    assert(hits == 50L, s"hot-gram contamination must flag all 50 docs, got $hits")
  }

  test("q166 NN-Descent ranking dominates the q130 seed graph") {
    def byRank(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> r.getDouble(2)).toMap
    val seed = byRank(LlmOps.q130(spark, sf001))
    val ref = byRank(LlmOps.q166(spark, sf001))
    // the candidate set contains every seed edge, so for every (node,
    // rank) present in both the refined similarity can only rise
    val shared = seed.keySet.intersect(ref.keySet)
    assert(shared.nonEmpty)
    assert(shared.forall(k => ref(k) >= seed(k)),
      "NN-Descent must dominate the seed per (node, rank)")
    // and the round must actually recover cross-cell edges on the gate
    // corpus (strict gain somewhere), or the refinement is vacuous
    assert(shared.exists(k => ref(k) > seed(k)),
      "no (node, rank) improved at sf0.01 — NN-Descent round vacuous")
  }

  test("q168 hierarchical kNN build beats both the flat build (q130) and " +
      "its refinement (q166) on recall@3 vs the exact graph") {
    import org.apache.spark.sql.expressions.Window
    def edges(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("va", "vb").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val e = graft.Tables.embeddings(spark, sf001)
      .select(col("vec_id"), col("embedding"))
    val w = Window.partitionBy(col("va")).orderBy(col("sim").desc, col("vb"))
    val exact = e.select(col("vec_id").as("va"), col("embedding").as("ea"))
      .crossJoin(e.select(col("vec_id").as("vb"), col("embedding").as("eb")))
      .filter(col("va") =!= col("vb"))
      .select(col("va"), col("vb"),
        round(graft.functions.CosineSimilarityExpr(col("ea"), col("eb")), 4)
          .as("sim"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
    val truth = edges(exact)
    val r130 = edges(LlmOps.q130(spark, sf001)).intersect(truth).size
    val r166 = edges(LlmOps.q166(spark, sf001)).intersect(truth).size
    val r168 = edges(LlmOps.q168(spark, sf001)).intersect(truth).size
    val r169 = edges(LlmOps.q169(spark, sf001)).intersect(truth).size
    // measured at sf0.01 (of 1500 true edges): 393 (flat seed) < 506
    // (flat + descent) < 810 (IVF2 probe-2 seed + descent) < 1282
    // (iterated pure NN-Descent, K=10) — each build-path step must not
    // lose what the previous had; the ladder is the recall argument
    assert(r168 > r130,
      s"IVF2-seeded build recall $r168 must beat flat q130's $r130")
    assert(r168 > r166,
      s"IVF2-seeded build recall $r168 must beat refined-flat q166's $r166")
    assert(r169 > r168,
      s"iterated NN-Descent recall $r169 must beat the blocked builds' $r168")
    // r18: the ρ-sampled LANDING config (4 rounds, ρ=0.7) must hold
    // recall parity with the unsampled q169 it replaces past the
    // crossover — the NnTune-calibrated claim (1288 vs 1282), pinned
    // here as a deterministic fact of the gate data
    val rLanding = edges(LlmOps.nnDescentLandingBuild(spark, sf001))
      .intersect(truth).size
    assert(rLanding >= r169,
      s"ρ-sampled landing build recall $rLanding fell below the " +
        s"unsampled q169's $r169 — re-calibrate with graft.tools.NnTune")
    // shape: top-3 per node, ranks dense from 1
    val byNode = LlmOps.q168(spark, sf001).collect()
      .groupBy(_.getLong(0)).values
    assert(byNode.forall(rs =>
      rs.map(_.getInt(3)).sorted.sameElements(1 to rs.length)))
    assert(byNode.forall(_.length <= 3))
  }

  test("q176 filtered serve: in-filter recall dominates post-filter row " +
      "by row on real data, and recovers a planted same-label neighbor " +
      "that the unfiltered-then-filter arm provably loses") {
    // real data: the provable domination, non-vacuously strict
    val rows = LlmOps.q176(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (pid, pre, post) =>
      assert(pre >= post,
        s"probe $pid: in-filter recall $pre fell below post-filter $post")
    }
    assert(rows.exists { case (_, pre, post) => pre > post },
      "in-filter never beat post-filter at sf0.01 - the report is vacuous")

    // planted: probe 16 (label 1) shares cell 0 with three near-copies
    // of itself labelled 0 and ONE same-label neighbor at cosine .9939.
    // Unfiltered top-3 is the three label-0 near-copies, so post-filter
    // returns nothing; the in-filter arm must find the planted neighbor.
    import spark.implicits._
    val layout = Seq(
      (16L, Seq(1f, 0f), 0L, Option.empty[Long], 1),
      (1L, Seq(1f, 0.001f), 0L, Option.empty[Long], 0),
      (2L, Seq(1f, 0.002f), 0L, Option.empty[Long], 0),
      (3L, Seq(1f, 0.003f), 0L, Option.empty[Long], 0),
      (4L, Seq(0.9f, 0.1f), 0L, Option.empty[Long], 1)
    ).toDF("vec_id", "embedding", "cell", "cell2", "label")
    val planted = LlmOps.filteredServeReport(layout).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(planted(16L) == (1L, 0L),
      s"planted same-label neighbor: expected in-filter 1 / post-filter 0, " +
        s"got ${planted(16L)}")
  }

  test("q177 entry sensitivity: quantizer probe-2 entry beats the fixed " +
      "global entry in aggregate and never falls below probe-1; the " +
      "hierarchical entry (r19 arm) beats fixed at O(1) entry rows") {
    val rows = LlmOps.q177(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.length == 10)
    val (fx, p1, p2, hh) = (rows.map(_._2).sum, rows.map(_._3).sum,
      rows.map(_._4).sum, rows.map(_._5).sum)
    assert(p2 > fx,
      s"probe-2 entry aggregate recall $p2 must beat fixed entries' $fx - " +
        "the quantizer routing is the serve story")
    assert(p2 >= p1, s"probe-2 aggregate $p2 fell below probe-1's $p1")
    assert(p2 > 0, "probe-2 arm recalled nothing - report vacuous")
    // the hierarchical routing pays O(1) scored entry rows per probe
    // (vs probe-2's √(8n) cell join) and must still beat the 8
    // fixed-entry strawman AT THE SAME walk budget (measured 6 vs 4 at
    // sf0.01; deterministic data ⇒ pinned fact). It is allowed to trail
    // probe-2 — that gap is exactly what the report measures.
    assert(hh > fx,
      s"hierarchical entry aggregate $hh must beat fixed entries' $fx")
    assert(hh > 0, "hierarchical arm recalled nothing - report vacuous")
  }

  test("q179 filtered graph serve: the full-graph walk with an answer " +
      "filter beats constrained expansion in aggregate") {
    val rows = LlmOps.q179(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(rows.length == 10)
    assert(rows.forall { case (_, w, x) => w <= 3 && x <= 3 })
    val (walk, expand) = (rows.map(_._2).sum, rows.map(_._3).sum)
    assert(walk >= expand,
      s"answer-filter aggregate recall $walk fell below constrained " +
        s"expansion's $expand - off-label routing is the filtered-serve " +
        "story")
    assert(walk > 0, "answer-filter arm recalled nothing - report vacuous")
  }

  test("q181 multiprobe LSH: candidate superset and row-by-row recall " +
      "domination over the single-probe bucket") {
    val rows = LlmOps.q181(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.length == 10)
    rows.foreach { case (pid, cs, cm, rs, rm) =>
      assert(cm >= cs, s"probe $pid: multiprobe candidates $cm < single $cs")
      assert(rm >= rs,
        s"probe $pid: multiprobe recall $rm fell below single-probe $rs - " +
          "the superset domination theorem broke")
    }
    assert(rows.exists { case (_, _, _, rs, rm) => rm > rs },
      "multiprobe never improved recall at sf0.01 - the report is vacuous")
  }

  test("q171 append splices the derived batch into the landed graph " +
      "both ways and leaves untouched adjacency verbatim") {
    val g = LlmOps.q168(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val out = LlmOps.q171(spark, sf001).collect()
    val rows = out.map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    // new nodes: every batch id appears, <=3 edges, dense ranks from 1
    val sources = graft.Tables.embeddings(spark, sf001)
      .filter(col("vec_id") % 13 === 2).select("vec_id").collect()
      .map(_.getLong(0)).toSet
    val newByNode = rows.filter(_._1 < 0).groupBy(_._1)
    assert(newByNode.keySet == sources.map(v => -v - 1),
      "every routed batch vector must land in the appended graph")
    assert(newByNode.values.forall(es =>
      es.map(_._4).sorted.sameElements(1 to es.length) && es.length <= 3))
    // each derived near-copy finds its source as rank-1 (cos ~ 0.9999)
    val rank1 = rows.filter(r => r._1 < 0 && r._4 == 1)
      .map(r => (r._1, r._2)).toSet
    val expected = sources.map(v => (-v - 1, v))
    assert(expected.subsetOf(rank1),
      s"sources missing as rank-1: ${(expected -- rank1).take(5)}")
    // reverse splice: old nodes admit the newcomer (non-vacuous), and
    // every surviving old-old edge comes verbatim from the landed graph
    val oldRows = rows.filter(_._1 >= 0)
    assert(oldRows.exists(_._2 < 0),
      "no old node admitted a reverse edge - splice vacuous at sf0.01")
    assert(oldRows.filter(_._2 >= 0).forall(r => g((r._1, r._2, r._3))),
      "append invented or rescored an old-old edge")
    // merge only re-ranks: per old node, edges stay top-3 and dense
    assert(oldRows.groupBy(_._1).values.forall(es =>
      es.map(_._4).sorted.sameElements(1 to es.length) && es.length <= 3))
  }

  test("q172 delete retires tombstoned nodes, repairs only affected " +
      "adjacency, and passes every untouched row through verbatim") {
    val gRows = LlmOps.q168(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val tomb = graft.Tables.embeddings(spark, sf001)
      .filter(col("vec_id") % 31 === 0).select("vec_id").collect()
      .map(_.getLong(0)).toSet
    assert(tomb.nonEmpty)
    val out = LlmOps.q172(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    // no tombstone survives on either side of any edge
    assert(out.forall(r => !tomb(r._1) && !tomb(r._2)))
    // untouched nodes (live, no tombstoned neighbor) pass through verbatim
    val affected = gRows.filter(r => !tomb(r._1) && tomb(r._2))
      .map(_._1).toSet
    assert(affected.nonEmpty, "tombstones touched no adjacency - vacuous")
    val untouchedIn = gRows.filter(r => !tomb(r._1) && !affected(r._1)).toSet
    val untouchedOut = out.filter(r => !affected(r._1) && r._1 >= 0).toSet
    assert(untouchedIn == untouchedOut,
      "delete must not disturb unaffected adjacency")
    // affected nodes: dense ranks, and at least one backfilled edge the
    // landed graph never had (the repair is real, not just a filter)
    val gEdges = gRows.map(r => (r._1, r._2)).toSet
    val repaired = out.filter(r => affected(r._1))
    assert(repaired.groupBy(_._1).values.forall(es =>
      es.map(_._4).sorted.sameElements(1 to es.length)))
    assert(repaired.exists(r => !gEdges((r._1, r._2))),
      "no affected node backfilled a fresh neighbor at sf0.01")
  }

  test("q173 graph serve dominates the q149 cell serve it enters " +
      "through and walks to exact neighbors the cells cannot see") {
    val out = LlmOps.q173(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    // every probe answers with <=3 dense-ranked neighbors
    val byProbe = out.groupBy(_._1)
    assert(byProbe.keySet == (16L until 26L).toSet)
    assert(byProbe.values.forall(es =>
      es.map(_._4).sorted.sameElements(1 to es.length) && es.length <= 3))
    // ground truth: exact brute-force cosine top-3 per probe (the
    // round-4 grid and (sim desc, vid) tiebreak shared with the query)
    val e = graft.Tables.embeddings(spark, sf001)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i); i += 1 }
      math.rint(d / math.sqrt(na * nb) * 1e4) / 1e4
    }
    val emap = e.toMap
    val exact = (16L until 26L).flatMap { p =>
      e.filter(_._1 != p).map { case (v, ve) => (p, v, cos(emap(p), ve)) }
        .sortBy(t => (-t._3, t._2)).take(3).map(t => (t._1, t._2))
    }.toSet
    val served = out.map(r => (r._1, r._2)).toSet
    // round 0 IS q149's candidate set, so per-probe recall dominates it
    val base = LlmOps.q149(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def hitsBy(pairs: Set[(Long, Long)]) =
      pairs.intersect(exact).groupBy(_._1).view.mapValues(_.size).toMap
    val sH = hitsBy(served); val bH = hitsBy(base)
    (16L until 26L).foreach { p =>
      assert(sH.getOrElse(p, 0) >= bH.getOrElse(p, 0),
        s"probe $p: serve recall ${sH.getOrElse(p, 0)} fell below " +
          s"q149's ${bH.getOrElse(p, 0)}")
    }
    val servedHits = served.intersect(exact).size
    val baseHits = base.intersect(exact).size
    assert(servedHits > baseHits,
      s"walk recalled $servedHits vs q149 baseline $baseHits - " +
        "the graph rounds added nothing beyond the probe cells")
  }

  test("q187 hierarchical entry serve answers every probe with dense " +
      "top-<=3 ranks and real recall while scoring only O(beam·deg) " +
      "entry rows — no cell join anywhere in the path") {
    val out = LlmOps.q187(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val byProbe = out.groupBy(_._1)
    assert(byProbe.keySet == (16L until 26L).toSet)
    assert(byProbe.values.forall(es =>
      es.map(_._4).sorted.sameElements(1 to es.length) && es.length <= 3))
    // recall vs exact top-3 (shared grid + tiebreaks): the 2-layer
    // descent must find real neighbors, not just layer-1 members —
    // non-vacuous floor: at least a third of the exact edges at sf0.01
    val e = graft.Tables.embeddings(spark, sf001)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i); i += 1 }
      math.rint(d / math.sqrt(na * nb) * 1e4) / 1e4
    }
    val emap = e.toMap
    val exact = (16L until 26L).flatMap { p =>
      e.filter(_._1 != p).map { case (v, ve) => (p, v, cos(emap(p), ve)) }
        .sortBy(t => (-t._3, t._2)).take(3).map(t => (t._1, t._2))
    }.toSet
    val served = out.map(r => (r._1, r._2)).toSet
    val hits = served.intersect(exact).size
    info(s"q187 hierarchical-entry recall: $hits/${exact.size}")
    // the absolute bar is set by the deliberately sparse degree-3
    // landed graph, not the routing: on the same graph + walk budget
    // the q177 arms measure fixed-entries 4/30, IVF-probe-1 3/30,
    // IVF-probe-2 10/30, hierarchical-at-3-rounds 6/30 (q177's r19
    // recall_hier column). q187's extra layer-0 round lifts the
    // hierarchical entries to 8/30 at O(1) scored entry rows — DOUBLE
    // the fixed arm, 80% of the probe-2 arm with no IVF layout in the
    // path. Deterministic data ⇒ pinned fact.
    assert(hits >= 8,
      s"hierarchical entries recalled only $hits/${exact.size} — " +
        "below the measured 8/30 (fixed-entry arm: 4/30); the layer-1 " +
        "routing regressed")
    // answers are honest: every reported sim matches the exact cosine
    out.foreach { case (p, v, sim, _) =>
      assert(math.abs(cos(emap(p), emap(v)) - sim) < 1e-9,
        s"probe $p reported a wrong similarity for $v")
    }
  }

  test("q174 graph semdedup keeps exactly one lowest-id survivor per " +
      "component and its clusters are edge-connected at the threshold") {
    val out = LlmOps.q174(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val all = graft.Tables.embeddings(spark, sf001)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(out.map(_._1).toSet == all, "every vector gets a verdict")
    // pruned <=> not the component's min id
    assert(out.forall(r => r._4 == (r._2 != r._1)))
    // each cluster: one survivor (its min id), size consistent
    val byCluster = out.groupBy(_._2)
    byCluster.foreach { case (cid, rows) =>
      assert(rows.count(!_._4) == 1, s"cluster $cid survivor count")
      assert(rows.map(_._1).min == cid, s"cluster $cid label is not min id")
      assert(rows.forall(_._3 == rows.length), s"cluster $cid size column")
    }
    assert(out.exists(_._3 > 1), "no multi-member cluster at sf0.01 - vacuous")
    // clusters really are components of the thresholded landed graph:
    // every pruned member must reach its label through >=1 graph edge
    val edges = LlmOps.q168(spark, sf001).collect()
      .filter(_.getDouble(2) >= LlmOps.CosineNearDupThreshold)
      .map(r => Set(r.getLong(0), r.getLong(1)))
    val touched = edges.flatten.toSet
    assert(out.filter(_._4).forall(r => touched(r._1)),
      "a pruned vector has no thresholded edge at all")
  }

  test("MinHash-LSH near-dup (q35d) recalls the high-Jaccard exact pairs") {
    val exact = LlmOps.q35(spark, sf0001)
      .filter(col("jaccard") >= 0.5) // 4 bands × 4 rows → ~s^4 band match
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = LlmOps.q35d(spark, sf0001)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    if (exact.nonEmpty) {
      val recall = exact.intersect(lsh).size.toDouble / exact.size
      assert(recall >= 0.8,
        s"LSH recall $recall too low: exact=${exact.size} lsh=${lsh.size}")
    }
    // LSH candidates carry exact Jaccard — verify stage worked
    val withJ = LlmOps.q35d(spark, sf0001).collect()
    assert(withJ.forall(r => r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0))
  }

  test("q35d recall gate at sf0.01: LSH finds the dedup-grade (j>=0.8) pairs") {
    // the scale-path guarantee that matters: if MinHash-LSH replaced the
    // exact shingle join at 100 TB, which near-dup pairs would it keep?
    // Gate at the q61 clustering threshold (jaccard >= 0.8) on the
    // driver-gate scale factor, with a fixed floor.
    val RecallFloor = 0.9
    val exact = LlmOps.q35(spark, sf001)
      .filter(col("jaccard") >= 0.8)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "sf0.01 corpus has no dedup-grade pairs — gate is vacuous")
    val lsh = LlmOps.q35d(spark, sf001)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(lsh).size.toDouble / exact.size
    info(f"q35d recall vs exact j>=0.8 pairs at sf0.01: $recall%.3f " +
      f"(${exact.intersect(lsh).size}/${exact.size}, floor $RecallFloor)")
    assert(recall >= RecallFloor,
      f"LSH recall $recall%.3f below $RecallFloor: exact=${exact.size} lsh=${lsh.size}")
  }

  test("simhash-banded near-dup (q71): blocking is LOSSLESS at radius 3") {
    import spark.implicits._
    // Manku pigeonhole: 4 bands, radius 3 ⇒ every in-radius pair shares an
    // intact band, so the banded equi-join must find EXACTLY the pairs a
    // brute-force all-pairs Hamming scan finds — compare against one
    // (500-doc corpus → trivially brute-forceable in the test)
    val out = LlmOps.q71(spark, sf0001)
      .select("da", "db", "hamming").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    val sims = LlmOps.q35c(spark, sf0001)
      .as[(Long, Long)].collect()
    val brute = (for {
      (ida, ha) <- sims.iterator
      (idb, hb) <- sims.iterator
      if ida < idb
      h = java.lang.Long.bitCount(ha ^ hb)
      if h <= 3
    } yield (ida, idb) -> h).toMap
    assert(brute.nonEmpty, "corpus has no hamming<=3 simhash pairs — vacuous")
    assert(out == brute,
      s"banded join diverges from brute force: missing=${brute.keySet -- out.keySet} " +
        s"extra=${out.keySet -- brute.keySet}")
  }

  test("q110 IVF-PQ recalls a usable fraction of the exact top-3 (q34)") {
    // the composed-index sanity gate: quantization (PQ) + cell pruning
    // (IVF, nprobe=1) lose recall BY DESIGN, but the index must still
    // surface true neighbors. q34's probes are vec_id < 10; q110's are
    // 16..26 — compare against a brute-force recompute on q110's probes
    import graft.functions.CosineSimilarityExpr
    val d = sf0001
    val e = graft.Tables.embeddings(spark, d).select(col("vec_id"), col("embedding"))
    val probes = e.filter(col("vec_id") >= 16 && col("vec_id") < 26)
      .select(col("vec_id").as("pid"), col("embedding").as("pe"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("pid")).orderBy(col("sim").desc, col("cid"))
    val exact = e.crossJoin(broadcast(probes))
      .filter(col("pid") =!= col("vec_id"))
      .select(col("pid"), col("vec_id").as("cid"),
        round(CosineSimilarityExpr(col("pe"), col("embedding")), 4).as("sim"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("pid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = LlmOps.q110(spark, d)
      .select("pid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ann.nonEmpty, "IVF-PQ produced no candidates")
    val recall = exact.intersect(ann).size.toDouble / exact.size
    info(f"q110 recall@3 vs exact cosine at sf0.001: $recall%.3f")
    assert(recall > 0.0, s"zero recall: ann=$ann")
  }

  test("exact dedup (q23) is idempotent") {
    val once = LlmOps.q23(spark, sf0001)
    // dedup of an already-deduped relation is itself: doc_id sets equal
    val ids1 = once.select("doc_id").collect().map(_.getLong(0)).toSet
    // simulate re-dedup: q23 keys on text which was dropped, so re-run on
    // the base table filtered to survivors
    val again = LlmOps.q23(spark, sf0001)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == again)
  }

  test("minhash signatures and simhash are deterministic across runs") {
    val s1 = LlmOps.q35b(spark, sf0001).collect().map(_.toSeq).toSeq
    val s2 = LlmOps.q35b(spark, sf0001).collect().map(_.toSeq).toSeq
    assert(s1 == s2)
    val h1 = LlmOps.q35c(spark, sf0001).collect().map(_.toSeq).toSeq
    val h2 = LlmOps.q35c(spark, sf0001).collect().map(_.toSeq).toSeq
    assert(h1 == h2)
  }

  test("q114: the positional index finds exactly the docs containing the phrase") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sf0001)
    // independently derive the query phrase (most frequent trigram, ties lex)
    val phrase = docs
      .select(graft.functions.NGramExplode(col("text"), 3).as(Seq("p", "g")))
      .groupBy("g").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("g")).limit(1)
      .collect()(0).getString(0)
    val out = LlmOps.q114(spark, sf0001).collect()
    assert(out.nonEmpty, "phrase search found nothing — vacuous")
    val found = out.map(_.getLong(0)).toSet
    // a string-contains scan must agree with the index join: padded text
    // so boundary-anchored occurrences match whole tokens only
    val expected = docs
      .filter(concat(lit(" "), col("text"), lit(" "))
        .contains(s" $phrase "))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(found == expected,
      s"index=$found scan=$expected for phrase '$phrase'")
    // n_matches >= 1 everywhere, first_pos in bounds
    assert(out.forall(_.getLong(1) >= 1))
    assert(out.forall(_.getLong(2) >= 0))
  }

  test("q118: completions extend their prefix; ranks are contiguous per prefix") {
    import org.apache.spark.sql.functions._
    val out = LlmOps.q118(spark, sf0001).cache()
    try {
      assert(out.count() > 0)
      assert(out.filter(!col("term").startsWith(col("p"))).count() == 0,
        "a completion does not extend its prefix")
      assert(out.filter(col("rnk") < 1 || col("rnk") > 3).count() == 0)
      // ranks contiguous: per prefix, max(rnk) == count(rnk)
      val bad = out.groupBy("p")
        .agg(max(col("rnk")).as("mx"), count(lit(1)).as("n"))
        .filter(col("mx") =!= col("n")).count()
      assert(bad == 0, "rank holes within a prefix")
      // the index does real top-k work: some prefix has >= 3 completions
      assert(out.filter(col("rnk") === 3).count() > 0, "top-3 vacuous")
      // doc frequency can never exceed occurrence frequency
      assert(out.filter(col("n_docs") > col("freq")).count() == 0)
    } finally out.unpersist()
  }

  test("q119: truncation fidelity is bounded and degrades toward shorter prefixes") {
    import org.apache.spark.sql.functions._
    val out = LlmOps.q119(spark, sf0001).cache()
    try {
      assert(out.count() == 30, "10 probes x 3 truncation widths")
      assert(out.filter(col("n_overlap") > 5 ||
        col("n_rank_agree") > col("n_overlap")).count() == 0,
        "agreement must be within overlap within top-5")
      val byDims = out.groupBy("dims").agg(sum(col("n_overlap")).as("o"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(byDims(48) > byDims(16),
        s"recall must degrade from 48 to 16 prefix dims: $byDims")
    } finally out.unpersist()
  }

  test("q120: hard negatives really are cross-label and some outrank every positive") {
    import org.apache.spark.sql.functions._
    val out = LlmOps.q120(spark, sf0001).cache()
    try {
      assert(out.count() == 30, "10 probes x top-3 hard negatives")
      // cross-label check against the raw table
      val labels = graft.Tables.embeddings(spark, sf0001)
        .select(col("vec_id"), col("label"))
      val sameLabel = out
        .join(labels.withColumnRenamed("vec_id", "pid")
          .withColumnRenamed("label", "pl"), "pid")
        .join(labels.withColumnRenamed("vec_id", "cid")
          .withColumnRenamed("label", "cl"), "cid")
        .filter(col("pl") === col("cl")).count()
      assert(sameLabel == 0, "a mined negative shares the probe's label")
      // margins are consistent and the miner finds genuinely hard ones
      assert(out.filter(col("margin") =!=
        round(col("best_pos") - col("sim"), 4)).count() == 0)
      assert(out.filter(col("margin") < 0).count() > 0,
        "no negative outranks the positives — mining vacuous here")
    } finally out.unpersist()
  }

  test("q122: every planted fragment is flagged contained AND asymmetric") {
    import org.apache.spark.sql.functions._
    val out = LlmOps.q122(spark, sf0001).cache()
    try {
      val planted = graft.Tables.documents(spark, sf0001)
        .filter(col("doc_id") % 25 === 0).count()
      assert(planted > 0, "no fragment bases at this SF — vacuous")
      // each fragment (base_id + 1000000) must pair with its base
      val fragPairs = out.filter(col("b_id") === col("a_id") + 1000000L)
      assert(fragPairs.count() == planted,
        s"expected $planted fragment pairs, got ${fragPairs.count()}")
      assert(fragPairs.filter(!col("asymmetric")).count() == 0,
        "a fragment pair was not asymmetric — Jaccard should be low")
      // containment/Jaccard bounds: common <= min(na, nb), cont >= jacc
      assert(out.filter(col("common") > least(col("na"), col("nb"))).count() == 0)
      assert(out.filter(col("cont10k") < col("jacc10k")).count() == 0)
      // a symmetric (high-Jaccard) duplicate family also fires at this SF
      assert(out.filter(!col("asymmetric")).count() > 0,
        "no symmetric containment pairs — both branches should fire")
    } finally out.unpersist()
  }

  test("q124: terciles are balanced and ordered by interpolated LM score") {
    import org.apache.spark.sql.functions._
    val out = LlmOps.q124(spark, sf0001).cache()
    try {
      val sizes = out.groupBy("bucket").count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(sizes.keySet == Set(1, 2, 3), s"expected 3 buckets: $sizes")
      assert(sizes.values.max - sizes.values.min <= 1,
        s"ntile buckets must balance within 1: $sizes")
      val means = out.groupBy("bucket").agg(avg(col("interp_logp")).as("m"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      assert(means(1) > means(3),
        s"head bucket must outscore tail: $means")
      // every doc with >= 2 tokens is scored exactly once
      val expected = graft.Tables.documents(spark, sf0001)
        .filter(size(split(col("text"), " ")) >= 2).count()
      assert(out.count() == expected)
    } finally out.unpersist()
  }

  test("q151: bench members never appear; contamination fires and respects " +
      "the threshold; cell-blocked sims are genuine cosines") {
    val out = LlmOps.q151(spark, sf0001).cache()
    try {
      assert(out.filter(col("vec_id") % 59 === 0).count() == 0,
        "bench vectors must not be screened against themselves")
      val n = out.count()
      val contaminated = out.filter(col("contaminated")).count()
      assert(contaminated > 0 && contaminated < n,
        s"threshold must discriminate: $contaminated of $n flagged")
      // flag ⟺ max_sim_bench ≥ threshold (audit-relation consistency)
      assert(out.filter(col("contaminated") =!=
        (coalesce(col("max_sim_bench"), lit(-2.0)) >= 0.35)).count() == 0)
      assert(out.filter(col("max_sim_bench") > 1.0001 ||
        col("max_sim_bench") < -1.0001).count() == 0)
    } finally out.unpersist()
  }

  test("q157 repairs every q156 leak: no near-dup pair straddles the " +
      "repaired split boundary") {
    val repair = LlmOps.q157(spark, sf0001)
      .select(col("doc_id"), col("repaired_split"))
    val leaks = LlmOps.q156(spark, sf0001)
    // the theorem: both endpoints of every >=0.8 pair share a cluster,
    // hence the repaired split — zero cross-split pairs remain
    val remaining = leaks
      .join(repair.withColumnRenamed("doc_id", "da")
        .withColumnRenamed("repaired_split", "ra"), Seq("da"))
      .join(repair.withColumnRenamed("doc_id", "db")
        .withColumnRenamed("repaired_split", "rb"), Seq("db"))
      .filter(col("ra") =!= col("rb")).count()
    assert(remaining == 0, s"$remaining pairs still leak after repair")
    // and the repair is non-vacuous on this corpus: q156 found leaks,
    // and the repair moved at least one doc
    assert(leaks.count() > 0, "no leaks at this SF — vacuous theorem")
    assert(LlmOps.q157(spark, sf0001).filter(col("moved")).count() > 0)
  }

  test("q160: the tombstoned index serves no deleted vector, and every " +
      "probe that lost a neighbor got the next survivor promoted") {
    val before = LlmOps.q149(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val after = LlmOps.q160(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // no tombstoned id (vec_id % 31 == 0, the q153 removed class) serves
    assert(after.forall { case (_, cid) => cid % 31 != 0 },
      "a deleted vector appeared in served results")
    // ranks stay dense 1..k per probe (promotion, not a hole)
    val byPid = LlmOps.q160(spark, sf0001)
      .collect().groupBy(_.getLong(0))
    for ((pid, rows) <- byPid)
      assert(rows.map(_.getInt(3).toLong).sorted.toSeq ==
        (1L to rows.length).toSeq, s"probe $pid has a rank hole")
    // survivors' relative order is preserved: dropping tombstoned rows
    // from the BEFORE list must give a prefix of the AFTER list per probe
    val beforeSurvivors = before.filter(_._2 % 31 != 0).groupBy(_._1)
    val afterByPid = after.groupBy(_._1)
    for ((pid, rows) <- beforeSurvivors) {
      val kept = rows.map(_._2)
      val now = afterByPid.getOrElse(pid, Seq.empty).map(_._2)
      assert(now.take(kept.length) == kept,
        s"probe $pid: surviving order changed ($kept -> $now)")
    }
  }

  test("q161: compact-then-serve equals merge-on-read row for row " +
      "(the compaction loses nothing)") {
    val onRead = LlmOps.q155(spark, sf0001).collect().map(_.toSeq).toSeq
    val compacted = LlmOps.q161(spark, sf0001).collect().map(_.toSeq).toSeq
    assert(onRead.nonEmpty, "BM25 returned nothing at this SF — vacuous")
    assert(compacted == onRead,
      "compacted-segment scores diverge from merge-on-read")
  }

  test("blocking caps derive from the corpus df distribution: the r10 " +
      "constants are the gate-SF fixed point, and the cap scales on a " +
      "densified corpus") {
    import spark.implicits._
    // exact p99 arithmetic on synthetic df histograms
    assert(LlmOps.deriveRareCap(
      (Seq.fill(99)(1L) ++ Seq(5L)).toDF("df")) == 16L,
      "floor must bind when p99 df is small")
    assert(LlmOps.deriveRareCap(
      (Seq.fill(90)(1L) ++ Seq.fill(10)(100L)).toDF("df")) == 100L,
      "p99 must be the smallest df covering 99% of keys")
    // the gate-SF fixed point: the derived cap must equal the r10
    // hardcoded 16 (so every oracle value is unchanged at the gates)
    assert(LlmOps.rareShingleCap(spark, sf0001) == 16L,
      "gate-SF derived cap drifted from the r10 fixed point")
    // densified fixture: 40 rotations of one text share ~all trigrams,
    // so trigram df ~ 40 and the derived cap must scale past the floor
    val words = (0 until 30).map(i => s"w$i")
    val docs = (0 until 40).map { r =>
      (r.toLong, (words.drop(r % 30) ++ words.take(r % 30)).mkString(" "))
    }.toDF("doc_id", "text")
    val dense = java.nio.file.Files
      .createTempDirectory("graft-dense-fixture").toString
    docs.write.mode("overwrite").parquet(s"$dense/documents.parquet")
    val cap = LlmOps.rareShingleCap(spark, dense)
    assert(cap > 16L && cap <= 40L,
      s"densified corpus must raise the derived cap past the floor: $cap")
  }

  test("q164: bitext mining is non-vacuous at the gate SF and its " +
      "verdict columns satisfy the mutual-margin invariants") {
    val rows = LlmOps.q164(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4), r.getBoolean(5)))
    assert(rows.nonEmpty, "no en doc found an in-cell es neighbor — vacuous")
    val langs = graft.Tables.documents(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    for ((en, es, cos, margin, mutual, mined) <- rows) {
      assert(langs(en) == "en" && langs(es) == "es",
        s"pair ($en,$es) crosses the wrong language sides")
      assert(cos > 0 && margin > 0, s"non-positive score for ($en,$es)")
      assert(mined == (margin >= 10500L && mutual),
        s"mined flag inconsistent for ($en,$es)")
    }
    assert(rows.exists(_._6), "nothing mined at the gate SF — vacuous")
    assert(rows.exists(r => !r._6), "everything mined — threshold vacuous")
    // forward-NN uniqueness: one verdict per English doc
    assert(rows.map(_._1).distinct.length == rows.length)
  }
}
