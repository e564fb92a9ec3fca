package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The landed-graph BUILD-OF-RECORD dispatch (r13 verdict ask #1):
  * `knnGraphPath` picks between the q168 IVF2-seeded cell build and the
  * q169 iterated NN-Descent build, size-calibrated at
  * [[LlmOps.KnnBuildCrossover]] — BASELINE.md's own 100× measurement
  * (cell ≈ 357 s vs descent 188 s cold, recall 810 vs 1282) says the
  * lifecycle must consume the descent build past the crossover. Guards:
  * the pure regime decision (unit facts, incl. the 100× point), and the
  * full lifecycle (q168 read, q171 append, q172 delete, q173 serve,
  * q174 semdedup) in the FORCED NN-Descent regime — the SuffixArraySpec
  * force-each-regime discipline. The default (auto → cell-blocked at
  * gate SFs) regime is what every other spec and the driver oracle gate
  * already exercise. With the oracle gate PINNED to cellblocked
  * (Verify.scala — gate determinism), this suite plus LlmOpsSpec's
  * recall ladder (q169 must beat the blocked builds) are the descent
  * regime's dedicated correctness signal — the r16-advice counterweight
  * that keeps the pinned gate from being the only coverage. */
class KnnGraphDispatchSpec extends SparkSpec {

  test("auto regime decision: gate SFs build cell-blocked, the 100x " +
      "point builds NN-Descent") {
    // sf0.01 ~ 5.5k vectors; its 10x/30x/100x ScaleStress siblings
    assert(LlmOps.knnGraphRegimeFor(5500L) == "cellblocked")
    assert(LlmOps.knnGraphRegimeFor(55000L) == "cellblocked")
    assert(LlmOps.knnGraphRegimeFor(165000L) == "nndescent")
    assert(LlmOps.knnGraphRegimeFor(550000L) == "nndescent",
      "the dispatch must pick the q169 build at the measured 100x point")
    assert(LlmOps.knnGraphRegimeFor(LlmOps.KnnBuildCrossover) == "nndescent")
    assert(LlmOps.knnGraphRegimeFor(LlmOps.KnnBuildCrossover - 1) ==
      "cellblocked")
  }

  private def withRegime[T](regime: String)(body: => T): T = {
    spark.conf.set(LlmOps.KnnBuildKey, regime)
    LlmOps.invalidateKnnGraph()
    try body finally {
      spark.conf.unset(LlmOps.KnnBuildKey)
      LlmOps.invalidateKnnGraph() // later suites rebuild in default auto
    }
  }

  test("forced cellblocked equals the auto build at the gate SF") {
    val auto = LlmOps.q168(spark, sf001).collect().map(_.toSeq).toSeq
    val forced = withRegime("cellblocked") {
      LlmOps.q168(spark, sf001).collect().map(_.toSeq).toSeq
    }
    assert(auto == forced)
  }

  test("an unknown regime value fails loudly, not silently") {
    withRegime("cellblocked") {
      spark.conf.set(LlmOps.KnnBuildKey, "hnsw")
      LlmOps.invalidateKnnGraph()
      val e = intercept[Exception](LlmOps.q168(spark, sf001).collect())
      assert(e.getMessage.contains("hnsw"))
    }
  }

  test("forced nndescent: the landed graph IS the ρ-sampled landing " +
      "build and the whole lifecycle (append/delete/serve/semdedup) " +
      "holds on it") {
    withRegime("nndescent") {
      // landed graph == the landing-config relation (r18: 4 ρ-sampled
      // rounds — q169 keeps the unsampled paper shape its oracle
      // mirrors; both deterministic, so exact set equality still pins
      // the landing)
      val landed = LlmOps.q168(spark, sf001).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      val direct = LlmOps.nnDescentLandingBuild(spark, sf001).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      assert(landed.toSet == direct.toSet,
        "forced-nndescent landed graph must equal the landing build")
      val g = landed.map(r => (r._1, r._2, r._3)).toSet
      val gEdges = landed.map(r => (r._1, r._2)).toSet

      // q171 append: new nodes routed with dense ranks, rank-1 = source,
      // old-old survivors verbatim from THIS landed graph
      val a = LlmOps.q171(spark, sf001).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      val sources = graft.Tables.embeddings(spark, sf001)
        .filter(col("vec_id") % 13 === 2).select("vec_id").collect()
        .map(_.getLong(0)).toSet
      val newByNode = a.filter(_._1 < 0).groupBy(_._1)
      assert(newByNode.keySet == sources.map(v => -v - 1))
      assert(newByNode.values.forall(es =>
        es.map(_._4).sorted.sameElements(1 to es.length) && es.length <= 3))
      val rank1 = a.filter(r => r._1 < 0 && r._4 == 1)
        .map(r => (r._1, r._2)).toSet
      assert(sources.map(v => (-v - 1, v)).subsetOf(rank1))
      val oldRows = a.filter(_._1 >= 0)
      assert(oldRows.filter(_._2 >= 0).forall(r => g((r._1, r._2, r._3))),
        "append invented or rescored an old-old edge in the descent regime")

      // q172 delete: tombstones gone, untouched adjacency verbatim
      val tomb = graft.Tables.embeddings(spark, sf001)
        .filter(col("vec_id") % 31 === 0).select("vec_id").collect()
        .map(_.getLong(0)).toSet
      val del = LlmOps.q172(spark, sf001).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      assert(del.forall(r => !tomb(r._1) && !tomb(r._2)))
      val affected = landed.filter(r => !tomb(r._1) && tomb(r._2))
        .map(_._1).toSet
      val untouchedIn = landed
        .filter(r => !tomb(r._1) && !affected(r._1)).toSet
      val untouchedOut = del.filter(r => !affected(r._1) && r._1 >= 0).toSet
      assert(untouchedIn == untouchedOut,
        "delete disturbed unaffected adjacency in the descent regime")

      // q173 serve: every probe answers dense top-<=3, and walk recall
      // over the (higher-recall) descent graph still dominates the
      // q149 cell serve it enters through
      val served = LlmOps.q173(spark, sf001).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
      val byProbe = served.groupBy(_._1)
      assert(byProbe.keySet == (16L until 26L).toSet)
      assert(byProbe.values.forall(es =>
        es.map(_._3).sorted.sameElements(1 to es.length) && es.length <= 3))

      // q174 semdedup: complete verdicts, one min-id survivor per
      // cluster, pruned members have a thresholded edge in THIS graph
      val dd = LlmOps.q174(spark, sf001).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      val all = graft.Tables.embeddings(spark, sf001)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(dd.map(_._1).toSet == all)
      assert(dd.forall(r => r._4 == (r._2 != r._1)))
      dd.groupBy(_._2).foreach { case (cid, rows) =>
        assert(rows.count(!_._4) == 1, s"cluster $cid survivor count")
        assert(rows.map(_._1).min == cid)
      }
      val touched = landed
        .filter(_._3 >= LlmOps.CosineNearDupThreshold)
        .flatMap(r => Seq(r._1, r._2)).toSet
      assert(dd.filter(_._4).forall(r => touched(r._1)),
        "a pruned vector has no thresholded edge in the descent graph")
    }
  }

  // driver-side exact top-3 over the layer-1 members (n/8 ≈ 690 at
  // sf0.01 — bounded), the reference for both landing arms
  private def exactLayer1(members: Map[Long, Array[Double]]): Set[(Long, Long)] = {
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      math.rint(d / math.sqrt(na * nb) * 1e4) / 1e4
    }
    members.keySet.flatMap { va =>
      members.keysIterator.filter(_ != va).toSeq
        .map(vb => (vb, cos(members(va), members(vb))))
        .sortBy(t => (-t._2, t._1)).take(3).map(t => (va, t._1))
    }
  }

  private def layer1Members(): Map[Long, Array[Double]] =
    graft.Tables.embeddings(spark, sf001)
      .filter(col("vec_id") % 8 === 0)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap

  test("layer-1 landing (default exact arm): the landed adjacency IS the " +
      "exact top-3 over the %8 subsample, and the persisted entry state " +
      "is the min member id + its embedding") {
    LlmOps.invalidateKnnGraph() // a prior forced-regime suite run must not leak
    val (path, entry, emb) = LlmOps.knnLayer1State(spark, sf001)
    val rows = spark.read.parquet(path).collect()
      .map(r => (r.getAs[Long]("va"), r.getAs[Long]("vb"),
        r.getAs[Double]("sim"), r.getAs[Int]("rn")))
    val members = layer1Members()
    assert(rows.forall(r => members.contains(r._1) &&
      members.contains(r._2) && r._1 != r._2))
    val byVa = rows.groupBy(_._1)
    assert(byVa.keySet == members.keySet,
      "every layer-1 member must own ranked edges (the min(va) entry " +
        "derivation depends on it)")
    assert(byVa.values.forall(es =>
      es.map(_._4).sorted.sameElements(1 to es.length) && es.length <= 3))
    assert(entry == members.keySet.min)
    val expected = graft.Tables.embeddings(spark, sf001)
      .filter(col("vec_id") === entry).select("embedding")
      .head.getSeq[Float](0)
    assert(emb == expected)
    // exact arm == driver-computed exact top-3 (same round-4 grid and
    // (sim desc, vb) tiebreak)
    assert(rows.map(r => (r._1, r._2)).toSet == exactLayer1(members),
      "default layer-1 landing must be the exact subsample top-3")
  }

  test("q188 layer-1 append: HNSW-insert routing gives every new layer-1 " +
      "member dense top-<=3 edges, touched members adopt reverse edges, " +
      "untouched members pass through verbatim") {
    LlmOps.invalidateKnnGraph()
    val (l1Path, _, _) = LlmOps.knnLayer1State(spark, sf001)
    val landed = spark.read.parquet(l1Path).collect()
      .map(r => (r.getAs[Long]("va"), r.getAs[Long]("vb"),
        r.getAs[Double]("sim"), r.getAs[Int]("rn")))
    val out = LlmOps.q188(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val members = layer1Members()
    // the derived batch's layer-1 members: nid = -v-1 with nid%8==0
    val newIds = graft.Tables.embeddings(spark, sf001)
      .filter(col("vec_id") % 13 === 2).select("vec_id").collect()
      .map(r => -r.getLong(0) - 1).filter(_ % 8 == 0).toSet
    assert(newIds.nonEmpty, "no layer-1 member in the batch — vacuous")
    val newRows = out.filter(_._1 < 0)
    assert(newRows.groupBy(_._1).keySet == newIds)
    assert(newRows.groupBy(_._1).values.forall(es =>
      es.map(_._4).sorted.sameElements(1 to es.length) && es.length <= 3))
    // every new edge targets a landed member (routing never leaves the layer)
    assert(newRows.forall(r => members.contains(r._2)))
    // two-sided splice is non-vacuous: some member adopted a reverse edge
    val adopted = out.filter(r => r._1 >= 0 && r._2 < 0)
    assert(adopted.nonEmpty, "no member adopted a reverse edge")
    assert(adopted.forall(r => newIds.contains(r._2)))
    // untouched members: rows verbatim from the landed layer
    val touched = out.filter(r => r._1 >= 0 && r._2 < 0).map(_._1).toSet
    val oldOnly = out.filter(r => r._1 >= 0).filter(r => !touched(r._1)).toSet
    val landedByVa = landed.groupBy(_._1)
    oldOnly.groupBy(_._1).foreach { case (va, rows) =>
      if (!touched(va))
        assert(rows == landedByVa(va).toSet ||
          rows.forall(landedByVa(va).toSet.contains),
          s"untouched member $va mutated")
    }
  }

  test("q189 layer-1 delete + q190 spliced hierarchical serve: tombstones " +
      "(incl. the GLOBAL ENTRY, vec_id 0) leave both layers, the entry " +
      "re-elects to the min surviving member, and the serve answers every " +
      "probe from the spliced index without ever visiting a deleted node") {
    LlmOps.invalidateKnnGraph()
    val members = layer1Members()
    val tomb = graft.Tables.embeddings(spark, sf001)
      .filter(col("vec_id") % 31 === 0).select("vec_id").collect()
      .map(_.getLong(0)).toSet
    assert(tomb.contains(0L) && members.contains(0L),
      "vec_id 0 must be both the global entry and a tombstone — vacuous " +
        "entry re-election otherwise")
    val del = LlmOps.q189(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(del.forall(r => !tomb(r._1) && !tomb(r._2)),
      "a tombstone survived the layer-1 splice")
    val liveMembers = members.keySet -- tomb
    assert(del.map(_._1).toSet == liveMembers,
      "every surviving member must still own ranked edges")
    // entry re-election: the spliced index serves from min surviving member
    val (_, _, entry, emb) = LlmOps.splicedIndexState(spark, sf001)
    assert(entry == liveMembers.min,
      s"entry re-elected to $entry, expected ${liveMembers.min}")
    assert(emb == graft.Tables.embeddings(spark, sf001)
      .filter(col("vec_id") === entry).select("embedding")
      .head.getSeq[Float](0))
    // the spliced serve: dense answers, never a deleted vector
    val out = LlmOps.q190(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    val byProbe = out.groupBy(_._1)
    assert(byProbe.keySet == (16L until 26L).toSet)
    assert(byProbe.values.forall(es =>
      es.map(_._3).sorted.sameElements(1 to es.length) && es.length <= 3))
    assert(out.forall(r => !tomb(r._2)),
      "the spliced serve answered a deleted vector")
  }

  test("q189 repair dispatch (r20): forced nndescent repairs affected " +
      "members through the surviving-layer beam walk — tombstones gone, " +
      "unaffected adjacency verbatim, every survivor owns dense top-<=3 " +
      "live edges, and the q190 spliced serve still answers every probe") {
    withRegime("nndescent") {
      val (l1Path, _, _) = LlmOps.knnLayer1State(spark, sf001)
      val landed = spark.read.parquet(l1Path).collect()
        .map(r => (r.getAs[Long]("va"), r.getAs[Long]("vb"),
          r.getAs[Double]("sim"), r.getAs[Int]("rn")))
      val members = layer1Members()
      val tomb = graft.Tables.embeddings(spark, sf001)
        .filter(col("vec_id") % 31 === 0).select("vec_id").collect()
        .map(_.getLong(0)).toSet
      val live = members.keySet -- tomb
      val del = LlmOps.q189(spark, sf001).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      assert(del.forall(r => !tomb(r._1) && !tomb(r._2)),
        "a tombstone survived the walk-repaired layer-1 splice")
      assert(del.forall(r => live(r._1) && live(r._2)),
        "a repaired edge left the live membership")
      val byVa = del.groupBy(_._1)
      assert(byVa.keySet == live,
        "every surviving member must still own ranked edges")
      assert(byVa.values.forall(es =>
        es.map(_._4).sorted.sameElements(1 to es.length) && es.length <= 3))
      // unaffected members (no tombstone in their landed top-3): verbatim
      val affected = landed.filter(r => !tomb(r._1) && tomb(r._2))
        .map(_._1).toSet
      assert(affected.nonEmpty, "no affected member — the repair is vacuous")
      val untouchedIn = landed
        .filter(r => !tomb(r._1) && !affected(r._1)).toSet
      val untouchedOut = del.filter(r => !affected(r._1)).toSet
      assert(untouchedIn == untouchedOut,
        "the walk repair disturbed unaffected adjacency")
      // each affected member's surviving landed edges stay candidates:
      // the repair may only IMPROVE a slot, never lose a surviving edge
      // to a worse one (visited ∪ own edges ⊇ own edges)
      val repairedByVa = del.filter(r => affected(r._1))
        .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSet).toMap
      landed.filter(r => affected(r._1) && !tomb(r._2)).foreach { r =>
        val kept = repairedByVa(r._1)
        val worst = kept.map(_._2).min
        assert(kept.contains((r._2, r._3)) || kept.size == 3 &&
          (worst > r._3 || worst == r._3),
          s"repair of ${r._1} dropped surviving edge ${r._2} (sim ${r._3}) " +
            s"for a worse candidate set $kept")
      }
      // the spliced hierarchical serve holds on the walk-repaired layer
      val out = LlmOps.q190(spark, sf001).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
      val byProbe = out.groupBy(_._1)
      assert(byProbe.keySet == (16L until 26L).toSet)
      assert(byProbe.values.forall(es =>
        es.map(_._3).sorted.sameElements(1 to es.length) && es.length <= 3))
      assert(out.forall(r => !tomb(r._2)),
        "the spliced serve answered a deleted vector")
    }
  }

  test("layer-1 landing recurses the dispatch: forced nndescent builds " +
      "the layer by ρ-sampled descent on the ×8 id grid — same adjacency " +
      "contract, real recall, and q187 still serves every probe densely") {
    withRegime("nndescent") {
      val (path, entry, _) = LlmOps.knnLayer1State(spark, sf001)
      val rows = spark.read.parquet(path).collect()
        .map(r => (r.getAs[Long]("va"), r.getAs[Long]("vb"),
          r.getAs[Double]("sim"), r.getAs[Int]("rn")))
      val members = layer1Members()
      assert(rows.forall(r => members.contains(r._1) &&
        members.contains(r._2) && r._1 != r._2),
        "descent bridge seeds must land on the ×8 member grid")
      val byVa = rows.groupBy(_._1)
      assert(byVa.keySet == members.keySet)
      assert(byVa.values.forall(es =>
        es.map(_._4).sorted.sameElements(1 to es.length) && es.length <= 3))
      assert(entry == members.keySet.min)
      val exact = exactLayer1(members)
      val hits = rows.map(r => (r._1, r._2)).toSet.intersect(exact).size
      info(s"layer-1 descent recall@3: $hits/${exact.size}")
      assert(hits >= exact.size / 2,
        s"layer-1 descent recalled only $hits/${exact.size} exact edges")
      // the hierarchical serve holds on the descent-built layers
      val out = LlmOps.q187(spark, sf001).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
      val byProbe = out.groupBy(_._1)
      assert(byProbe.keySet == (16L until 26L).toSet)
      assert(byProbe.values.forall(es =>
        es.map(_._3).sorted.sameElements(1 to es.length) && es.length <= 3))
    }
  }
}
