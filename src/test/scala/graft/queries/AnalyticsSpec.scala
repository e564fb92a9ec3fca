package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants of the round-2 analytics/training-pipeline
  * operators: gap-fill density, funnel monotonicity, cohort conservation,
  * cluster-closure validity, TF-IDF ranking, IVF cell blocking. */
class AnalyticsSpec extends SparkSpec {

  test("gap-fill (q58) emits a dense user × day grid with LOCF values") {
    val out = Analytics.q58(spark, sf0001).cache()
    val users = out.select("user_id").distinct().count()
    val days = out.select("day").distinct().count()
    assert(out.count() == users * days, "grid must be dense (users × days)")
    // zero-filled days exist, and carried values repeat the prior observation
    assert(out.filter(col("n") === 0).count() > 0)
    val perUser = out.filter(col("n") === 0 && col("v_filled") =!= 0.0).count()
    assert(perUser > 0, "expected at least one non-zero carried-forward value")
    out.unpersist()
  }

  test("funnel (q59) stages are monotone and convert times positive") {
    val rows = Analytics.q59(spark, sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => Set(1, 2, 3).contains(r.getInt(1))))
    // us_to_convert only for stage 3, and strictly positive (ts strictly increases)
    rows.foreach { r =>
      if (r.getInt(1) == 3) assert(!r.isNullAt(2) && r.getLong(2) > 0)
      else assert(r.isNullAt(2))
    }
  }

  test("cohort (q60) conserves events and never grows a cohort") {
    val out = Analytics.q60(spark, sf0001).cache()
    val totalEvents = out.agg(sum("n_events")).collect()(0).getLong(0)
    val rawEvents = graft.Tables.events(spark, sf0001).count()
    assert(totalEvents == rawEvents, "every event lands in exactly one cohort cell")
    // retention at offset k never exceeds the cohort's week-0 size
    val w0 = out.filter(col("week_offset") === 0)
      .select(col("cohort_day"), col("n_users").as("w0"))
    val bad = out.join(w0, "cohort_day").filter(col("n_users") > col("w0")).count()
    assert(bad == 0)
    out.unpersist()
  }

  test("dedup clusters (q61) form a valid partition of the pair graph") {
    val out = LlmOps.q61(spark, sf0001).cache()
    val rows = out.collect()
    if (rows.nonEmpty) {
      val label = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
      // cluster id is the component minimum → every cluster contains its id
      assert(label.values.toSet.subsetOf(label.keySet))
      assert(label.values.forall(c => label(c) == c))
      // both endpoints of every strong pair share a label (edges respected)
      val pairs = LlmOps.q35(spark, sf0001).filter(col("jaccard") >= 0.8)
        .select("da", "db").collect()
      pairs.foreach(p => assert(label(p.getLong(0)) == label(p.getLong(1))))
      // sizes consistent
      val sizes = rows.groupBy(_.getLong(1)).view.mapValues(_.length).toMap
      rows.foreach(r => assert(r.getLong(2) == sizes(r.getLong(1))))
    }
  }

  test("TF-IDF (q62) ranks at most 3 terms per doc, rare terms above stopwords") {
    val out = LlmOps.q62(spark, sf0001).cache()
    val perDoc = out.groupBy("doc_id").count()
      .agg(max("count")).collect()(0).getLong(0)
    assert(perDoc <= 3)
    // a term present in every document scores below a same-tf rarer term
    assert(out.filter(col("rn") === 1).count() ==
      out.select("doc_id").distinct().count())
    out.unpersist()
  }

  test("IVF ANN (q34d) searches only the probe's cell and stays sane vs exact") {
    val ivf = LlmOps.q34d(spark, sf0001).collect()
    assert(ivf.nonEmpty)
    assert(ivf.forall(r => r.getInt(3) >= 1 && r.getInt(3) <= 3))
    assert(ivf.forall(r => r.getDouble(2) >= -1.0001 && r.getDouble(2) <= 1.0001))
    // per-probe results are distinct candidates
    val dup = ivf.groupBy(r => (r.getLong(0), r.getLong(1))).exists(_._2.length > 1)
    assert(!dup)
  }

  test("hierarchical IVF (q149) serves every probe from one sub-cell and " +
      "its ranking is internally consistent") {
    val out = LlmOps.q149(spark, sf0001).collect()
    assert(out.nonEmpty)
    val byProbe = out.groupBy(_.getLong(0))
    // probes 16..25 that share a sub-cell with >=1 other vector all appear
    assert(byProbe.keySet.subsetOf((16L until 26L).toSet))
    byProbe.values.foreach { g =>
      val ranks = g.map(_.getInt(3)).sorted
      assert(ranks.toSeq == (1 to g.length).toSeq, "ranks must be 1..k dense")
      val sims = g.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b },
        "similarity non-increasing in rank")
      assert(g.length <= 3)
    }
    // the finer blocking must not OUTRANK the single-level IVF: every
    // (probe, candidate) pair q149 emits that q34d also emits must carry
    // the identical rounded cosine (both read the same embeddings)
    val flat = LlmOps.q34d(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    out.foreach { r =>
      flat.get((r.getLong(0), r.getLong(1))).foreach { s =>
        assert(s == r.getDouble(2), "same pair, different cosine")
      }
    }
  }
}
