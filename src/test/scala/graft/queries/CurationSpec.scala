package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the round-4 curation operators (q76-q83) —
  * properties the DuckDB hash gate can't express: reassembly fidelity,
  * policy monotonicity, flag/conjunction consistency, ntile balance. */
class CurationSpec extends SparkSpec {

  test("q116 gate audit: a corpus-wide-hot gram is fully covered (no df cap)") {
    import spark.implicits._
    // one 8-gram planted into EVERY doc (df = corpus size). A blocked
    // path's frequency ceiling would drop it; the exact dup-span gate
    // must cover all 8 tokens in all 50 docs — corpus-independence of
    // the count >= 2 gate (the r12 ask-#7 audit property).
    val hot = "h0 h1 h2 h3 h4 h5 h6 h7"
    val docs = (1L to 50L).map(i => (i, s"u$i v$i w$i $hot z$i"))
      .toDF("doc_id", "text")
    val spans = Curation.dupSpans(docs).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))) // (doc, start, end)
    assert(spans.length == 50, s"one span per doc expected, got ${spans.length}")
    // the hot gram sits at token positions 3..10 in every doc, and the
    // unique u/v/w/z tokens around it must NOT be absorbed
    assert(spans.forall { case (_, s0, e0) => s0 == 3L && e0 == 10L },
      s"span extents drifted: ${spans.take(5).mkString(", ")}")
  }

  test("q76: docs losing no span reassemble to their original text; kept <= chunks") {
    val docs = graft.Tables.documents(spark, sf001)
      .select(col("doc_id"), col("text"))
    val out = Curation.q76(spark, sf001)
    val joined = out.join(docs, "doc_id").cache()
    try {
      val bad = joined.filter(col("n_kept") > col("n_chunks")).count()
      assert(bad == 0, s"$bad docs kept more spans than they have")
      val intact = joined.filter(col("n_kept") === col("n_chunks"))
      val mismatched = intact.filter(col("clean_text") =!= col("text")).count()
      assert(mismatched == 0,
        s"$mismatched intact docs did not reassemble to the original text")
      // the operator does real work at this SF: some doc loses a span
      assert(joined.filter(col("n_kept") < col("n_chunks")).count() > 0)
    } finally joined.unpersist()
  }

  test("q77: the normalizer restores every enriched doc") {
    val out = Curation.q77(spark, sf001)
    assert(out.filter(!col("restored")).count() == 0)
    // and it had something to normalize (dirty != clean lengths)
    assert(out.filter(col("dirty_chars") === col("clean_chars")).count() == 0)
  }

  test("q78: blocked domains are gone, unblocked docs all survive") {
    val out = Curation.q78(spark, sf001).cache()
    try {
      val blockedLeft = out.filter(col("domain").isin(
        "src3.example-en.com", "src7.example-de.com", "src7.example-zh.com")).count()
      assert(blockedLeft == 0, s"$blockedLeft blocked-domain docs survived")
      val total = graft.Tables.documents(spark, sf001).count()
      val kept = out.count()
      assert(kept < total, "blocklist removed nothing — gate is vacuous")
      val blockedDocs = graft.Tables.documents(spark, sf001)
        .filter((col("source") === "src3" && col("lang") === "en") ||
          (col("source") === "src7" && col("lang").isin("de", "zh"))).count()
      assert(kept == total - blockedDocs, "gate dropped an unblocked doc")
    } finally out.unpersist()
  }

  test("q79: pass is exactly the conjunction of the five flags; all flags discriminate") {
    val out = Curation.q79(spark, sf001).cache()
    try {
      val inconsistent = out.filter(col("pass") =!=
        (col("f_nwords") && col("f_meanlen") && col("f_stop") &&
          col("f_maxword") && col("f_distinct"))).count()
      assert(inconsistent == 0)
      for (f <- Seq("f_nwords", "f_meanlen", "f_stop", "f_maxword", "f_distinct")) {
        val kinds = out.select(col(f)).distinct().count()
        assert(kinds == 2, s"$f never fires at sf0.01 — rule verifies nothing")
      }
      assert(out.filter(col("pass")).count() > 0, "no doc passes — bundle vacuous")
    } finally out.unpersist()
  }

  test("q80: fertility > 1 per language (the enriched text tokenizes finer than whitespace)") {
    val rows = Curation.q80(spark, sf001).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Double]("fertility") > 1.0, s"${r.getString(0)} fertility <= 1")
    }
  }

  test("q81: four balanced curriculum phases; phase 1 outranks phase 4") {
    val out = Curation.q81(spark, sf001).cache()
    try {
      val sizes = out.groupBy(col("phase")).count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(sizes.keySet == Set(1, 2, 3, 4))
      assert(sizes.values.max - sizes.values.min <= 1, s"ntile unbalanced: $sizes")
      val p1min = out.filter(col("phase") === 1).agg(min(col("quality")))
        .collect()(0).getDouble(0)
      val p4max = out.filter(col("phase") === 4).agg(max(col("quality")))
        .collect()(0).getDouble(0)
      assert(p1min >= p4max, "curriculum order inverted")
    } finally out.unpersist()
  }

  test("q82: shares sum to ~1 and weight moves each lang toward its target") {
    val rows = Curation.q82(spark, sf001).collect()
    assert(rows.length == 5)
    val shareSum = rows.map(_.getAs[Double]("actual_share")).sum
    assert(math.abs(shareSum - 1.0) < 0.01)
    rows.foreach { r =>
      val w = r.getAs[Double]("weight")
      assert(w > 0)
      // weight * actual ≈ target (the defining identity, up to 4dp rounding)
      assert(math.abs(w * r.getAs[Double]("actual_share") -
        r.getAs[Double]("target_share")) < 0.001, s"weight identity broken: $r")
    }
  }

  test("q84: one survivor per q61 cluster, and quality actually decides some of them") {
    val out = Curation.q84(spark, sf001).cache()
    try {
      val clusters = LlmOps.q61(spark, sf001)
        .select(col("cluster_id")).distinct().count()
      assert(out.count() == clusters, "not exactly one survivor per cluster")
      // if quality never overrode the min-id default the ranking is dead
      assert(out.filter(col("survivor_id") =!= col("cluster_id")).count() > 0,
        "every survivor is the min-id doc — quality ranking verifies nothing")
      assert(out.filter(col("n_dropped") < 1).count() == 0,
        "a 1-doc cluster appeared (q61 emits only real clusters)")
    } finally out.unpersist()
  }

  test("q85: FIM parts partition the token stream exactly") {
    val out = Curation.q85(spark, sf001)
    val bad = out.filter(
      col("n_prefix") + col("n_middle") + col("n_suffix") =!= col("n_tokens"))
      .count()
    assert(bad == 0, s"$bad docs lost tokens in the PSM split")
    // all three parts non-empty on this corpus (docs are 9+ words)
    assert(out.filter(col("n_middle") === 0).count() == 0)
  }

  test("q86: exactly k best per source, ranked consistently") {
    val out = Curation.q86(spark, sf001).cache()
    try {
      val sizes = out.groupBy(col("source")).count()
        .select(max(col("count"))).collect()(0).getLong(0)
      assert(sizes <= 3)
      // rank 1 quality >= rank 3 quality within every source
      val inverted = out.alias("a").join(out.alias("b"),
        col("a.source") === col("b.source") && col("a.rank") < col("b.rank") &&
          col("a.quality") < col("b.quality")).count()
      assert(inverted == 0, "rank order does not follow quality")
    } finally out.unpersist()
  }

  test("q87: resubmitted docs dedup away, revised docs survive") {
    val out = Curation.q87(spark, sf001).cache()
    try {
      assert(out.filter(col("new_id") % 10 === 1).count() == 0,
        "an unchanged resubmission survived the content-hash gate")
      val survivors = out.filter(col("new_id") % 10 === 2).count()
      val revisions = graft.Tables.documents(spark, sf001)
        .filter(col("doc_id") % 7 === 3).count()
      assert(survivors == revisions, "a genuine revision was dropped")
    } finally out.unpersist()
  }

  test("q88: per-shard fill ratio is in (0,1] and sequence math is consistent") {
    val rows = Curation.q88(spark, sf001).collect()
    assert(rows.length == 8)
    rows.foreach { r =>
      val fill = r.getAs[Double]("fill_ratio")
      assert(fill > 0 && fill <= 1.0, s"fill ratio out of range: $r")
      assert(r.getAs[Long]("n_seqs") * 2048 >= r.getAs[Long]("total_tokens"))
    }
  }

  test("q102: merge applies all three ops — updates replace, deletes leave, inserts arrive") {
    val docs = graft.Tables.documents(spark, sf001)
    val nDocs = docs.count()
    val nDel = docs.filter(col("doc_id") % 10 === 7).count()
    val nIns = docs.filter(col("doc_id") % 10 === 5).count()
    val out = Curation.q102(spark, sf001).cache()
    try {
      assert(nDel > 0 && nIns > 0, "delta branches empty — test is vacuous")
      assert(out.count() == nDocs - nDel + nIns,
        "merged cardinality must be corpus - deletes + inserts")
      assert(out.filter(col("doc_id") % 10 === 7 && col("doc_id") >= 0).count() == 0,
        "tombstoned keys survived the merge")
      assert(out.filter(col("doc_id") < 0).count() == nIns,
        "inserted keys (disjoint negative namespace) missing")
      // an updated row carries the revised payload: +3 chars (" v2")
      val origLen = docs.filter(col("doc_id") % 10 === 3)
        .select(col("doc_id"), length(col("text")).cast("long").as("l0"))
      val joined = out.join(origLen, "doc_id")
        .filter(col("n_chars") =!= col("l0") + 3).count()
      assert(joined == 0, "an update landed without its revision")
    } finally out.unpersist()
  }

  test("q83: the first doc is fully novel; repeated content scores below 1") {
    val out = Curation.q83(spark, sf001).cache()
    try {
      val first = out.orderBy(col("doc_id")).limit(1).collect()(0)
      assert(first.getAs[Double]("novelty") == 1.0, "doc 0 must be all-novel")
      assert(out.filter(col("novelty") < 1.0).count() > 0, "nothing repeats — vacuous")
      val bad = out.filter(col("n_novel") > col("n_grams")).count()
      assert(bad == 0)
    } finally out.unpersist()
  }

  test("q112: removed+kept are consistent; boilerplate hits docs but not all; " +
      "fully-boilerplate docs come out empty") {
    val out = Curation.q112(spark, sf001).cache()
    try {
      // kept-line count reconstructed from clean_text must complement n_removed
      val kept = when(col("clean_text") === "", 0L)
        .otherwise(size(split(col("clean_text"), " ")).cast("long"))
      // every kept line is LineLen=5 tokens except possibly the doc's last
      // chunk, so kept-token count is within [4*(n-r), 5*(n-r)] — exact
      // consistency: n_removed <= n_lines and (n_lines==n_removed) == empty
      assert(out.filter(col("n_removed") > col("n_lines")).count() == 0)
      val emptyMismatch = out.filter(
        (col("n_lines") === col("n_removed")) =!= (col("clean_text") === ""))
        .count()
      assert(emptyMismatch == 0, "empty output iff every line removed")
      assert(out.filter(col("n_removed") > 0).count() > 0, "no boilerplate — vacuous")
      assert(out.filter(col("n_removed") === 0).count() > 0, "everything boilerplate")
      assert(out.filter(col("clean_text") === "").count() > 0,
        "expected some fully-boilerplate doc at this SF")
      val tokBound = out.filter(kept > lit(5L) * (col("n_lines") - col("n_removed")))
        .count()
      assert(tokBound == 0, "clean_text longer than kept lines allow")
    } finally out.unpersist()
  }

  test("q112: a cross-doc duplicated line never survives, a unique line always does") {
    // independent recomputation of the boilerplate rule on the raw corpus
    val docs = graft.Tables.documents(spark, sf001)
    val toks = split(col("text"), " ")
    val ng = ceil(size(toks) / lit(5.0)).cast("int")
    val lines = docs.select(col("doc_id"),
      explode(transform(sequence(lit(0), ng - 1),
        i => concat_ws(" ", slice(toks, i * 5 + 1, lit(5))))).as("line"))
    val df = lines.groupBy("line").agg(countDistinct(col("doc_id")).as("dfc"))
    val out = Curation.q112(spark, sf001)
    // a boiler line may still APPEAR inside clean_text when removal shifts
    // chunk boundaries, so assert on the aligned form: re-chunk clean_text
    // and check no re-chunked line of an UNTOUCHED doc (n_removed=0,
    // boundaries unshifted) is boilerplate
    val cleanToks = split(col("clean_text"), " ")
    val cng = ceil(size(cleanToks) / lit(5.0)).cast("int")
    val keptAligned = out.filter(col("n_removed") === 0)
      .select(col("doc_id"), explode(transform(sequence(lit(0), cng - 1),
        i => concat_ws(" ", slice(cleanToks, i * 5 + 1, lit(5))))).as("line"))
    val leaked = keptAligned.join(df.filter(col("dfc") >= 2), "line").count()
    assert(leaked == 0, s"$leaked boilerplate lines survived in untouched docs")
  }

  test("q113: DSIR admits >=100 docs and enriches the target domain") {
    val out = Curation.q113(spark, sf001)
      .join(graft.Tables.documents(spark, sf001).select("doc_id", "lang"), "doc_id")
      .cache()
    try {
      val n = out.count().toDouble
      val sampled = out.filter(col("sampled")).count().toDouble
      assert(sampled >= 100, s"top-100 threshold admitted only $sampled")
      val enFrac = out.filter(col("lang") === "en").count() / n
      val enSampled =
        out.filter(col("sampled") && col("lang") === "en").count() / sampled
      assert(enSampled > enFrac,
        f"no target enrichment: sampled en-frac $enSampled%.2f <= corpus $enFrac%.2f")
    } finally out.unpersist()
  }

  test("q115: every canonical group converges to one survivor; each decoration rule fires") {
    val out = Curation.q115(spark, sf001).cache()
    try {
      // exactly one non-dup per canonical URL, and it is the min doc_id
      val badSurvivor = out.filter(!col("is_dup"))
        .filter(col("doc_id") =!= col("survivor_id")).count()
      assert(badSurvivor == 0)
      val groups = out.select("canon_url").distinct().count()
      val survivors = out.filter(!col("is_dup")).count()
      assert(groups == survivors, "survivor count != canonical group count")
      // all four decorations of a full group collapse: dup rate = 3/4
      val n = out.count()
      val dups = out.filter(col("is_dup")).count()
      assert(dups == n - groups)
      assert(groups == n / 4, s"expected N/4 canonical groups, got $groups for $n")
      // the synthesized URLs really were decorated (not already canonical)
      assert(out.filter(col("url") =!= col("canon_url")).count() == n / 4 * 3)
    } finally out.unpersist()
  }

  test("mergeSpans: overlapping and adjacent hits coalesce; gaps split islands") {
    import spark.implicits._
    // doc 1 (width 8): hits at 0,3 overlap -> [0,10]; 20,21 -> [20,28]
    // (gap 11..19 splits); 40 isolated -> [40,47]. doc 2: single hit.
    val hits = Seq((1L, 0L), (1L, 3L), (1L, 20L), (1L, 21L), (1L, 40L),
      (2L, 5L)).toDF("doc_id", "pos")
    val out = Curation.mergeSpans(hits, 8)
      .orderBy(col("doc_id"), col("span_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, 1L, 0L, 10L, 11L), (1L, 2L, 20L, 28L, 9L), (1L, 3L, 40L, 47L, 8L),
      (2L, 1L, 5L, 12L, 8L)), s"bad merge: ${out.toSeq}")
  }

  test("q116: spans are maximal, disjoint, and anchored on genuinely duplicated grams") {
    val out = Curation.q116(spark, sf001).cache()
    try {
      assert(out.count() > 0, "no duplicated spans at this SF — vacuous")
      // spans within a doc are disjoint with a real gap between them
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("doc_id")).orderBy(col("span_id"))
      val overlapping = out
        .withColumn("prev_end", lag(col("end_tok"), 1).over(w))
        .filter(col("prev_end").isNotNull &&
          col("start_tok") <= col("prev_end") + 1).count()
      assert(overlapping == 0, "adjacent/overlapping spans were not merged")
      // every span is at least one gram wide and length-consistent
      assert(out.filter(col("n_tokens") < 8).count() == 0)
      assert(out.filter(
        col("n_tokens") =!= col("end_tok") - col("start_tok") + 1).count() == 0)
      // boundary anchors: the 8-gram starting at start_tok occurs >= 2
      // times in the corpus (independent recomputation)
      val grams = graft.Tables.documents(spark, sf001)
        .select(col("doc_id"),
          graft.functions.NGramExplode(col("text"), 8).as(Seq("pos", "ng")))
      val counts = grams.groupBy("ng").agg(count(lit(1)).as("c"))
      val anchors = out.select(col("doc_id"),
          col("start_tok").cast("int").as("pos"))
        .join(grams, Seq("doc_id", "pos"))
        .join(counts, "ng")
      val weak = anchors.filter(col("c") < 2).count()
      assert(weak == 0, s"$weak spans anchored on a non-duplicated gram")
      assert(anchors.count() == out.count(), "anchor lookup lost spans")
    } finally out.unpersist()
  }

  test("q117: weighted HITS discriminates on the complete trade graph") {
    val out = Analytics.q117(spark, sf001).cache()
    try {
      assert(out.count() == 25)
      // volume weighting must break the complete-graph symmetry
      assert(out.select("hubq").distinct().count() > 10,
        "hub scores degenerate — weighting lost")
      assert(out.select("authq").distinct().count() > 10,
        "authority scores degenerate — weighting lost")
      import org.apache.spark.sql.Row
      val Row(hmax: Long, amax: Long) =
        out.agg(max(col("hubq")), max(col("authq"))).collect()(0)
      assert(hmax == 1000L && amax == 1000L, "round max must normalize to Scale")
    } finally out.unpersist()
  }

  test("q148: the SA/LCP path cuts the planted cross-doc repeat from BOTH " +
      "occurrences, conserves tokens, and agrees with the q116 gram-gate " +
      "on the planted region") {
    val docs = graft.Tables.documents(spark, sf0001)
      .filter(col("doc_id") < 8)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val planted = docs(0L).take(12)
    val len7 = docs(7L).length

    val out = Curation.q148(spark, sf0001)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(out.size == 8)
    // remove-all semantics (the released ExactSubstr tool): BOTH
    // occurrences of the planted 12-token run are cut
    val (n0, rem0, spans0, clean0) = out(0L)
    val (n7, rem7, spans7, clean7) = out(7L)
    assert(n0 == docs(0L).length && n7 == len7 + 12,
      "n_tokens must reflect the modified corpus")
    assert(rem0 >= 12 && spans0 >= 1,
      s"doc 0's head occurrence must be cut (removed $rem0)")
    assert(rem7 >= 12 && spans7 >= 1,
      s"doc 7's appended occurrence must be cut (removed $rem7)")
    assert(!clean0.startsWith(planted.mkString(" ")),
      "doc 0 still starts with the duplicated run")
    assert(!clean7.contains(planted.mkString(" ")),
      "doc 7 still contains the duplicated run")
    // conservation on every doc: kept tokens = n_tokens - n_removed
    for ((id, (n, rem, _, clean)) <- out) {
      val kept = if (clean.isEmpty) 0 else clean.split(" ").length
      assert(kept == n - rem, s"doc $id: kept $kept != $n - $rem")
    }
    // untouched docs reassemble verbatim
    for ((id, (_, rem, nspans, clean)) <- out if rem == 0) {
      assert(nspans == 0)
      assert(clean == docs(id).mkString(" "), s"doc $id changed with 0 removed")
    }
    // the q116 gram-gate run over the SAME modified corpus marks the
    // same planted regions — the exact index and the streaming
    // approximation agree where both can see the repeat (12 >= both
    // thresholds)
    import spark.implicits._
    val modified = docs.toSeq.map { case (id, toks) =>
      val t = if (id == 7L) toks ++ planted else toks
      (id, t.mkString(" "))
    }.toDF("doc_id", "text")
    val occ = modified.select(col("doc_id"),
      graft.functions.NGramExplode(col("text"), 8).as(Seq("pos", "ng")))
    val dup = occ.groupBy(col("ng")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2).select(col("ng"))
    val gramSpans = Curation.mergeSpans(
        occ.join(dup, "ng").select(col("doc_id"), col("pos").cast("long").as("pos")), 8)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(gramSpans.exists { case (id, s, e) => id == 0L && s <= 0 && e >= 11 },
      "gram-gate missed the planted run's doc-0 occurrence")
    assert(gramSpans.exists { case (id, s, e) =>
        id == 7L && s <= len7 && e >= len7 + 11 },
      "gram-gate missed the planted run's doc-7 occurrence")
  }

  test("q159: corpus-scale ExactSubstr cuts the planted cross-doc repeat, " +
      "conserves tokens, and leaks no sentinel into the output") {
    val docs = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val maxId = docs.keys.max
    val planted = docs(0L).take(12)

    val out = Curation.q159(spark, sf0001)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(out.size == docs.size, "one output row per document")
    // remove-all: BOTH occurrences of the planted 12-token run are cut
    val (n0, rem0, spans0, clean0) = out(0L)
    val (nM, remM, spansM, cleanM) = out(maxId)
    assert(n0 == docs(0L).length && nM == docs(maxId).length + 12,
      "n_tokens must count real tokens only (no sentinel, planted +12)")
    assert(rem0 >= 12 && spans0 >= 1,
      s"doc 0's head occurrence must be cut (removed $rem0)")
    assert(remM >= 12 && spansM >= 1,
      s"doc $maxId's appended occurrence must be cut (removed $remM)")
    assert(!clean0.startsWith(planted.mkString(" ")))
    assert(!cleanM.contains(planted.mkString(" ")))
    // conservation + sentinel hygiene on every doc
    for ((id, (n, rem, _, clean)) <- out) {
      val kept = if (clean.isEmpty) 0 else clean.split(" ").length
      assert(kept == n - rem, s"doc $id: kept $kept != $n - $rem")
      assert(!clean.contains("\u0001"), s"doc $id leaked a sentinel token")
    }
    // untouched docs reassemble verbatim
    for ((id, (_, rem, nspans, clean)) <- out if rem == 0 && id != maxId) {
      assert(nspans == 0)
      assert(clean == docs(id).mkString(" "), s"doc $id changed with 0 removed")
    }
  }

  test("q163: every planted PII class is counted and masked, and no raw " +
      "PII survives redaction") {
    val out = Curation.q163(spark, sf0001)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(6))).toMap
    assert(out.nonEmpty)
    for ((id, (ne, np, ni, red)) <- out) {
      assert((ne >= 1) == (id % 7 == 1), s"doc $id email count $ne")
      assert((np >= 1) == (id % 9 == 2), s"doc $id phone count $np")
      assert((ni >= 1) == (id % 11 == 3), s"doc $id ip count $ni")
      if (id % 7 == 1) assert(red.contains("<EMAIL>") && !red.contains("@"),
        s"doc $id email not fully masked")
      if (id % 9 == 2) assert(red.contains("<PHONE>") && !red.contains("555-123-"),
        s"doc $id phone not fully masked")
      if (id % 11 == 3) assert(red.contains("<IP>") && !red.contains("10.0."),
        s"doc $id ip not fully masked")
    }
  }

  test("q175 epoch reshuffle: each epoch is a complete permutation, the " +
      "two epoch orders differ, and re-invocation is bit-identical") {
    val rows = Curation.q175(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val docs = graft.Tables.documents(spark, sf0001)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    for (e <- 1 to 2) {
      val ep = rows.filter(_._1 == e)
      assert(ep.map(_._3).toSet == docs, s"epoch $e must permute every doc")
      assert(ep.map(_._2).sorted.sameElements(1L to docs.size),
        s"epoch $e positions must be dense 1..N")
    }
    val o1 = rows.filter(_._1 == 1).sortBy(_._2).map(_._3).toSeq
    val o2 = rows.filter(_._1 == 2).sortBy(_._2).map(_._3).toSeq
    assert(o1 != o2, "epoch orders must differ (the reshuffle is real)")
    assert(o1 != o1.sorted || o2 != o2.sorted,
      "at least one epoch order must not be the identity")
    val again = Curation.q175(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == again.toSeq, "reshuffle must be deterministic")
  }
}
