package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants of the round-5 additions: RRF hybrid fusion
  * (q89), exact + approximate percentiles (q90), and the per-source
  * dataset card (q91). Hash parity vs DuckDB is the oracle's job; these
  * pin the semantics the oracle can't see (approx-sketch error, fusion
  * bounds, conservation). */
class RetrievalStatsSpec extends SparkSpec {

  test("q89: RRF scores are bounded, ranks come from the per-system top lists") {
    val out = LlmOps.q89(spark, sf001).collect()
    assert(out.nonEmpty && out.length <= 20)
    out.foreach { r =>
      val lex = Option(r.getAs[Integer]("lex_rank")).map(_.toInt)
      val dense = Option(r.getAs[Integer]("dense_rank")).map(_.toInt)
      assert(lex.nonEmpty || dense.nonEmpty, s"fused doc retrieved by neither system: $r")
      (lex ++ dense).foreach(rk => assert(rk >= 1 && rk <= 100))
      val expected = lex.map(rk => 1.0 / (60 + rk)).getOrElse(0.0) +
        dense.map(rk => 1.0 / (60 + rk)).getOrElse(0.0)
      assert(math.abs(r.getAs[Double]("rrf") - expected) < 1e-6)
    }
    // the fused list is sorted by score desc — a doc both systems rank
    // high must beat a doc only one system retrieved at similar rank
    val scores = out.map(_.getAs[Double]("rrf")).toSeq
    assert(scores == scores.sorted.reverse, "fusion output not ordered by rrf")
  }

  test("q90: approx_percentile tracks the exact percentile within sketch accuracy") {
    // the 100 TB path for wide groups is the mergeable sketch; pin its
    // error against the exact sort-based aggregate the oracle verifies
    val exact = Relational.q90(spark, sf001).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("p90")).toMap
    val approx = graft.Tables.lineitem(spark, sf001)
      .groupBy(col("l_returnflag"))
      .agg(expr("approx_percentile(l_extendedprice, 0.9, 1000)").as("ap90"))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("ap90")).toMap
    exact.foreach { case (flag, e) =>
      val a = approx(flag)
      assert(math.abs(a - e) / e < 0.05,
        s"approx p90 for $flag drifted: exact=$e approx=$a")
    }
  }

  test("q90: percentiles are monotone per group and bracket the data range") {
    val li = graft.Tables.lineitem(spark, sf001)
      .agg(min(col("l_extendedprice")), max(col("l_extendedprice"))).collect()(0)
    val (lo, hi) = (li.getDouble(0), li.getDouble(1))
    Relational.q90(spark, sf001).collect().foreach { r =>
      val ps = Seq("p25", "p50", "p90", "p99").map(r.getAs[Double])
      assert(ps == ps.sorted, s"percentiles not monotone: $r")
      ps.foreach(p => assert(p >= lo && p <= hi))
      // discrete median is an actual data value at the cont median's side
      assert(r.getAs[Double]("p50_disc") <= r.getAs[Double]("p50") + 1e-9)
    }
  }

  test("q92: suffixed docs match their originals; reversed docs come back unmatched") {
    val out = LlmOps.q92(spark, sf001).collect()
    val docs = graft.Tables.documents(spark, sf001)
    val nInc = docs.filter(col("doc_id") % 11 === 5).count() +
      docs.filter(col("doc_id") % 13 === 7).count()
    assert(out.length == nInc, "every incoming doc gets a verdict row")
    val (suffixed, reversed) = out.partition(_.getLong(0) % 10 == 3)
    // a 3-token suffix keeps the trigram sets nearly identical — the best
    // match must be the original doc at dedup-grade jaccard
    val selfMatched = suffixed.count(r => !r.isNullAt(1) &&
      r.getLong(1) == (r.getLong(0) - 3) / 10 && r.getBoolean(3))
    assert(selfMatched >= suffixed.length * 9 / 10,
      s"only $selfMatched/${suffixed.length} suffixed docs dedup to their original")
    // token reversal destroys trigrams — no candidate survives inter>=2
    // at dedup strength
    assert(reversed.forall(r => !r.getBoolean(3)),
      "a reversed doc came back is_dup=true")
  }

  test("q93: bottom decile per label is flagged; sims bounded") {
    val out = LlmOps.q93(spark, sf001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val sim = r.getAs[Double]("centroid_sim")
      assert(sim >= -1.0 && sim <= 1.0)
    }
    out.groupBy(_.getAs[Int]("label")).foreach { case (label, rows) =>
      val flagged = rows.count(_.getAs[Boolean]("is_outlier"))
      assert(flagged == rows.length / 10,
        s"label $label flagged $flagged of ${rows.length} (want floor(n/10))")
      // flagged rows are exactly the lowest-sim tail (ties broken by id)
      val worst = rows.sortBy(r => (r.getAs[Double]("centroid_sim"),
        r.getAs[Long]("vec_id"))).take(flagged).map(_.getAs[Long]("vec_id")).toSet
      assert(rows.filter(_.getAs[Boolean]("is_outlier"))
        .map(_.getAs[Long]("vec_id")).toSet == worst)
    }
  }

  test("q97: approx quantiles land within rank tolerance of the exact order statistic") {
    // the sketch promise is a RANK guarantee (±n/accuracy), not a value
    // guarantee — gate on the rank of each reported value per group
    val byFlag = graft.Tables.lineitem(spark, sf001)
      .select(col("l_returnflag"), col("l_extendedprice").cast("double").as("v"))
      .collect().groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).sorted)
    val out = Relational.q97(spark, sf001).collect()
    assert(out.map(_.getString(0)).toSet == byFlag.keySet.toSet)
    out.foreach { r =>
      val vs = byFlag(r.getString(0))
      val n = vs.length
      assert(r.getAs[Long]("n") == n)
      Seq("p25" -> 0.25, "p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99).foreach {
        case (cname, q) =>
          val a = r.getAs[Double](cname)
          // GK summaries return actual data values
          assert(vs.contains(a), s"$cname=$a is not a data value")
          // the documented guarantee (approx_percentile at accuracy A,
          // err = 1/A): the returned value's rank lies in
          // [floor((q-err)·n), ceil((q+err)·n)] — asserted exactly, no
          // ad-hoc slack. `a` is a data value, possibly duplicated: ANY
          // rank in its duplicate run [count(< a)+1, count(≤ a)] is
          // "its" rank, so the run must intersect the guaranteed band.
          val err = 1.0 / 10000
          val bandLo = math.floor((q - err) * n)
          val bandHi = math.ceil((q + err) * n)
          val runLo = vs.count(_ < a) + 1
          val runHi = vs.count(_ <= a)
          assert(runHi >= bandLo && runLo <= bandHi,
            s"$cname rank out of the documented band: run=[$runLo,$runHi] " +
              s"band=[$bandLo,$bandHi] of $n")
      }
    }
  }

  test("q98: CMS estimates dominate truth and respect the eps*N error bound") {
    val out = LlmOps.q98(spark, sf001).collect()
    assert(out.length == 20)
    val totalToks = graft.Tables.documents(spark, sf001)
      .select(sum(size(split(col("text"), " ")))).collect()(0).getLong(0)
    out.foreach { r =>
      val (exact, est) = (r.getAs[Long]("exact_freq"), r.getAs[Long]("cms_est"))
      assert(est >= exact, s"CMS underestimated ${r.getString(0)}: $est < $exact")
      assert(est - exact <= (0.001 * totalToks).toLong + 1,
        s"CMS overshot eps*N for ${r.getString(0)}: est=$est exact=$exact N=$totalToks")
    }
    // the report really is the top of the distribution, in order
    val freqs = out.map(_.getAs[Long]("exact_freq")).toSeq
    assert(freqs == freqs.sorted.reverse)
    // lazy contract (r5 advice): q98 returns a real scan over the
    // memoized report — composable into larger plans — not a
    // driver-local LocalRelation snapshot rebuilt on every call
    val plan = LlmOps.q98(spark, sf001).queryExecution.optimizedPlan.toString
    assert(!plan.contains("LocalRelation"), s"q98 is not lazy:\n$plan")
    assert(plan.contains("Relation"), s"expected a parquet relation:\n$plan")
  }

  test("q99: SemDeDup prunes exactly the dominated vectors; cluster-lowest ids survive") {
    val out = LlmOps.q99(spark, sf001).collect()
    val clusters = LlmOps.q96(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.length == clusters.size, "one verdict row per vector")
    out.foreach { r =>
      val (id, c) = (r.getLong(0), r.getLong(1))
      // blocking key is exactly the q96 assignment
      assert(c == clusters(id), s"vec $id cluster drifted from q96")
      val best = Option(r.getAs[java.lang.Double]("max_sim_lower")).map(_.toDouble)
      // pruned iff the best lower-id cluster-mate crosses the gate
      assert(r.getBoolean(3) == best.exists(_ >= 0.35), s"gate mismatch: $r")
      best.foreach(s => assert(s >= -1.0 && s <= 1.0))
    }
    // the lowest id of each cluster has no lower-id mate: never pruned
    val lowest = out.groupBy(_.getLong(1)).values.map(_.map(_.getLong(0)).min).toSet
    out.filter(r => lowest(r.getLong(0))).foreach { r =>
      assert(r.isNullAt(2) && !r.getBoolean(3),
        s"cluster-lowest vec ${r.getLong(0)} was pruned")
    }
    // the gate actually fires on this corpus (τ calibrated to it)
    assert(out.exists(_.getBoolean(3)), "no vector pruned — τ miscalibrated")
  }

  test("q91: dataset card conserves corpus totals across sources") {
    val card = Curation.q91(spark, sf001).collect()
    val docs = graft.Tables.documents(spark, sf001)
    assert(card.map(_.getAs[Long]("n_docs")).sum == docs.count())
    assert(card.map(_.getAs[Long]("total_chars")).sum ==
      docs.agg(sum("n_chars")).collect()(0).getLong(0))
    card.foreach { r =>
      assert(r.getAs[Long]("n_langs") >= 1 && r.getAs[Long]("n_langs") <= 5)
      assert(r.getAs[Long]("dup_docs") >= 0)
      assert(r.getAs[Double]("mean_tokens") > 0)
    }
  }
}
