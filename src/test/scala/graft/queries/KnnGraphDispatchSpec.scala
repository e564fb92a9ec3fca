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
}
