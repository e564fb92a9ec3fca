package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Scale-posture mechanisms: salted skew joins keep results identical to
  * plain joins while spreading hot keys; bucketed tables co-locate join
  * sides so the join runs with zero Exchange (the pre-shuffled layout a
  * 100 TB fact table would be stored in). */
class ScaleSpec extends SparkSpec {

  test("salted join == plain join results; hot key spread over salts") {
    val li = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_quantity"))
    val o = Tables.orders(spark, sf0001)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val plain = li.join(o, "l_orderkey")
      .groupBy(col("o_orderpriority")).agg(sum(col("l_quantity")).as("q"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    val salted = SkewJoin.saltedEquiJoin(li, o, "l_orderkey", saltBuckets = 8)
      .groupBy(col("o_orderpriority")).agg(sum(col("l_quantity")).as("q"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(plain == salted)
    // the salt really fans out: the hottest key's rows land on >1 salt
    // (if the salt degenerated to a constant per key, skew mitigation
    // would silently stop working)
    val hotKey = li.groupBy(col("l_orderkey")).count()
      .orderBy(col("count").desc, col("l_orderkey")).first().getLong(0)
    val salts = li.filter(col("l_orderkey") === hotKey)
      .withColumn("s", pmod(hash(li.columns.toSeq.map(col): _*), lit(8)))
      .select(countDistinct(col("s"))).collect()(0).getLong(0)
    assert(salts > 1, s"hot key $hotKey rows all hashed to one salt")
  }

  test("targeted salting salts only hot keys and matches the plain join") {
    // one hot key (7) with ~90% of left rows, the rest unique
    val left = spark.range(2000)
      .select(when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id")).as("k"),
        col("id").as("v"))
    val right = spark.range(200).select(col("id").as("k"), (col("id") * 3).as("w"))
    def summarize(df: org.apache.spark.sql.DataFrame) =
      df.agg(count(lit(1)), sum(col("v") + col("w"))).collect()(0)
    val plain = summarize(left.join(right, "k"))
    // hot path: key 7 crosses the threshold and gets spread over 8 salts
    val salted = summarize(SkewJoin.targetedSaltedJoin(
      left, right, "k", saltBuckets = 8, hotKeyThreshold = 100))
    assert(plain == salted)
    // degenerate path: nothing hot → still the plain join's exact result
    val unsalted = summarize(SkewJoin.targetedSaltedJoin(
      left, right, "k", saltBuckets = 8, hotKeyThreshold = Long.MaxValue))
    assert(plain == unsalted)
    // the hot key really fans out: its left rows hash to >1 salt bucket
    val saltsUsed = left.filter(col("k") === 7)
      .withColumn("s", pmod(hash(col("k"), col("v")), lit(8)))
      .select(countDistinct(col("s"))).collect()(0).getLong(0)
    assert(saltsUsed > 1, "hot-key rows all landed on one salt")
  }

  test("AQE splits skewed join partitions (skew=true in the final plan)") {
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // shrink thresholds so test-scale skew triggers the optimization
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    import s.implicits._
    // one hot key holding ~90% of the left side
    val left = s.range(200000)
      .select(when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id")).as("k"),
        col("id").as("v"))
    val right = s.range(1000).select(col("id").as("k"), (col("id") * 2).as("w"))
    val joined = left.join(right, "k").select(sum(col("v") + col("w")))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"), s"AQE did not mark the skew join:\n$plan")
  }

  test("bucketed tables join without any Exchange (co-located join)") {
    val wh = Files.createTempDirectory("graft-warehouse")
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-BHJ
    Tables.lineitem(s, sf0001).write
      .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/li_b").saveAsTable("li_b")
    Tables.orders(s, sf0001).write
      .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/o_b").saveAsTable("o_b")
    val joined = s.table("li_b")
      .join(s.table("o_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).count()
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    // bucket layout satisfies the join's distribution: no shuffle before it
    assert(!plan.split("SortMergeJoin")(1).contains("Exchange") ||
      !plan.contains("Exchange hashpartitioning(l_orderkey"),
      s"bucketed join still shuffles:\n$plan")
  }

  test("hive-partitioned layout: static filter prunes partitions at planning") {
    val dir = Files.createTempDirectory("graft-part").toString
    val ev = Tables.events(spark, sf0001)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    ev.write.partitionBy("day").mode("overwrite").parquet(dir)
    val nDays = ev.select("day").distinct().count()
    val q = spark.read.parquet(dir).filter(col("day") === "2024-01-03")
      .groupBy(col("event_type")).count()
    q.collect()
    // the scan must read ONE partition directory, not scan-then-filter
    val scan = q.queryExecution.executedPlan.collectLeaves().head
    val meta = scan.toString
    assert(meta.contains("PartitionFilters") && meta.contains("day"),
      s"no partition filter in scan:\n$meta")
    val read = q.queryExecution.executedPlan.collectLeaves().head
      .metrics.get("numPartitions").map(_.value)
    read.foreach(n => assert(n == 1, s"read $n of $nDays partitions"))
  }

  test("runtime bloom filter: selective dim filter prunes the fact scan rows") {
    val s = spark.newSession()
    // force the shuffle-join path (bloom filters aren't injected for BHJ —
    // broadcast already gives exact pruning) and drop the size gates that
    // disable the rewrite at test scale
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    val li = Tables.lineitem(s, sf0001).select(col("l_orderkey"), col("l_quantity"))
    val o = Tables.orders(s, sf0001)
      .filter(col("o_orderpriority") === "1-URGENT") // selective creation side
      .select(col("o_orderkey"), col("o_orderpriority"))
    val q = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).count()
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_filter") || plan.contains("BloomFilter") ||
      plan.contains("might_contain"),
      s"no runtime bloom filter injected:\n$plan")
  }

  test("dynamic partition pruning: dim filter prunes fact partitions at runtime") {
    val dir = Files.createTempDirectory("graft-dpp").toString
    val s = spark.newSession()
    s.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    // test-scale data defeats the cost model — force the benefit estimate
    s.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    s.conf.set("spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio", "10")
    // keep the partition column a string so the join key needs no cast
    s.conf.set("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
    // fact partitioned by day; the day predicate arrives via a DIM filter,
    // so static pruning can't apply — DPP injects a runtime subquery filter
    Tables.events(s, sf0001)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .write.partitionBy("day").mode("overwrite").parquet(dir)
    import s.implicits._
    // dim must be a real source scan (a LocalRelation's filter constant-
    // folds away, and DPP requires a selective predicate on the dim side)
    val dimDir = Files.createTempDirectory("graft-dpp-dim").toString
    Seq(("2024-01-03", "target"), ("2024-01-04", "other"))
      .toDF("day", "tag").write.mode("overwrite").parquet(dimDir)
    val q = s.read.parquet(dir)
      .join(s.read.parquet(dimDir).filter(col("tag") === "target"), "day")
      .groupBy(col("event_type")).count()
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning") || plan.contains("DynamicPruning"),
      s"no dynamic partition pruning in plan:\n$plan")
  }

  test("GlobalOrder: parallel range rank == single-window rank, ntile split identical") {
    import org.apache.spark.sql.expressions.Window
    val df = Tables.documents(spark, sf001).select(col("doc_id"), col("n_chars"))
    val (ranked, total) = GlobalOrder.withRowNumber(
      df, "rn", col("n_chars").desc, col("doc_id"))
    assert(total == df.count())
    val w = Window.orderBy(col("n_chars").desc, col("doc_id"))
    val expected = df
      .withColumn("rn2", row_number().over(w))
      .withColumn("ph2", ntile(4).over(w))
    val cmp = ranked
      .withColumn("ph", GlobalOrder.ntileFromRank(col("rn"), total, 4))
      .join(expected, "doc_id").cache()
    try {
      assert(cmp.filter(col("rn") =!= col("rn2")).count() == 0,
        "range-partitioned global rank diverges from the single-window rank")
      assert(cmp.filter(col("ph") =!= col("ph2")).count() == 0,
        "ntileFromRank diverges from window ntile")
    } finally cmp.unpersist()
  }

  test("GlobalOrder at 1000 range partitions: correct, broadcast offsets, codegen intact") {
    // the 100×-scale config: a cluster run would range-partition a global
    // order over ~1000 ranges. The offsets must arrive via a broadcast
    // join (O(1) plan depth) — a nested-CASE chain of depth 1000 would
    // blow codegen method-size limits and silently deoptimize.
    import org.apache.spark.sql.expressions.Window
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "1000")
      val df = Tables.documents(spark, sf001).select(col("doc_id"), col("n_chars"))
      val (ranked, total) = GlobalOrder.withRowNumber(
        df, "rn", col("n_chars").desc, col("doc_id"))
      assert(total == df.count())
      ranked.collect() // materialize AQE stages before reading the plan
      val plan = ranked.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"range offsets not broadcast-joined:\n$plan")
      val cg = org.apache.spark.sql.execution.debug.codegenString(
        ranked.queryExecution.executedPlan)
      val stages = "Found (\\d+) WholeStageCodegen".r.findFirstMatchIn(cg)
        .map(_.group(1).toInt).getOrElse(0)
      assert(stages >= 1, s"rank+offset pipeline fell out of codegen:\n$cg")
      val w = Window.orderBy(col("n_chars").desc, col("doc_id"))
      val expected = df.withColumn("rn2", row_number().over(w))
      assert(ranked.join(expected, "doc_id")
        .filter(col("rn") =!= col("rn2")).count() == 0,
        "1000-range rank diverges from the single-window rank")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("GlobalOrder.ntileFromRank: exact at 2^53-scale totals (no double rounding)") {
    // double division floors the wrong bucket once quotients sit within
    // 1 ulp of an integer — ranks near 2^53 are exactly that regime, and
    // exactly the regime a 100 TB corpus rank lives in. Probe every
    // bucket's first/last rank, where an off-by-one-ulp flips the bucket.
    import spark.implicits._
    val total = (1L << 53) + 12345L
    val n = 7
    val q = total / n
    val r = total % n
    def refNtile(rn: Long): Int =
      if (rn <= r * (q + 1)) ((rn - 1) / (q + 1)).toInt + 1
      else (r + (rn - r * (q + 1) - 1) / q).toInt + 1
    val probes = (1 to n).flatMap { k =>
      val first =
        if (k <= r) (k - 1) * (q + 1) + 1
        else r * (q + 1) + (k - 1 - r) * q + 1
      val size = if (k <= r) q + 1 else q
      Seq(first, first + size - 1)
    } :+ total :+ 1L
    val got = probes.toDF("rn")
      .withColumn("ph", GlobalOrder.ntileFromRank(col("rn"), total, n))
      .collect().map(row => row.getLong(0) -> row.getInt(1)).toMap
    probes.foreach { rn =>
      assert(got(rn) == refNtile(rn),
        s"rn=$rn of $total: got ${got(rn)}, want ${refNtile(rn)}")
    }
  }

  test("GlobalOrder.ntileFromRank: property — matches SQL ntile semantics for random sizes") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    // reference ntile: first (total%n) buckets get total/n+1 rows
    def refNtile(rn: Long, total: Long, n: Int): Int = {
      val q = total / n; val r = total % n
      if (rn <= r * (q + 1)) ((rn - 1) / (q + 1)).toInt + 1
      else (r + (rn - r * (q + 1) - 1) / q).toInt + 1
    }
    val gen = for {
      total <- Gen.chooseNum(1L, 5000L)
      n <- Gen.chooseNum(1, 16)
    } yield (total, n)
    (0 until 25).foreach { i =>
      val (total, n) = gen.apply(Gen.Parameters.default, Seed(4200L + i)).get
      val ranks = spark.range(1, total + 1).toDF("rn")
      val got = ranks
        .withColumn("ph", GlobalOrder.ntileFromRank(col("rn"), total, n))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      (1L to total).foreach { rn =>
        assert(got(rn) == refNtile(rn, total, n),
          s"total=$total n=$n rn=$rn: got ${got(rn)}, want ${refNtile(rn, total, n)}")
      }
    }
  }

  test("KMeans at 500 shuffle partitions: same clustering, assignment stays shuffle-free") {
    // cluster-scale config: only the recenter aggregations see the
    // partition count (O(partitions × k × dims) partial rows); the
    // assignment projection must stay exchange-free and in codegen at
    // any setting, and the result must be config-independent
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    def run() = KMeans.lloyd(
      Tables.embeddings(spark, sf0001).select(col("vec_id"),
        transform(col("embedding"),
          v => round(v.cast("double") * 10000, 0).cast("long")).as("vq")),
      "vec_id", "vq", k = 4, iters = 2)
      .select("vec_id", "cluster", "dist2").orderBy("vec_id").collect()
    try {
      val base = run()
      spark.conf.set("spark.sql.shuffle.partitions", "500")
      val scaled = run()
      assert(base.sameElements(scaled),
        "clustering depends on the shuffle-partition count")
      val finalAssign = KMeans.lloyd(
        Tables.embeddings(spark, sf0001).select(col("vec_id"),
          transform(col("embedding"),
            v => round(v.cast("double") * 10000, 0).cast("long")).as("vq")),
        "vec_id", "vq", k = 4, iters = 1)
      val plan = finalAssign.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"assignment shuffled at 500 partitions:\n$plan")
      val cg = org.apache.spark.sql.execution.debug.codegenString(
        finalAssign.queryExecution.executedPlan)
      val stages = "Found (\\d+) WholeStageCodegen".r.findFirstMatchIn(cg)
        .map(_.group(1).toInt).getOrElse(0)
      assert(stages >= 1, s"argmin projection fell out of codegen:\n$cg")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("CC regimes: property — regimes agree on random graphs") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    val edgeGen = Gen.listOfN(40,
      for { a <- Gen.chooseNum(0L, 30L); b <- Gen.chooseNum(0L, 30L) if a != b }
        yield (a, b))
    (0 until 5).foreach { i =>
      val edges = edgeGen.apply(Gen.Parameters.default, Seed(7700L + i)).get
      val pairs = Scratch.materialize(edges.toDF("da", "db"), s"cc-prop-$i")
      def toMap(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val local = toMap(ConnectedComponents.minLabelPropagation(
        pairs, localMaxEdges = Long.MaxValue))
      val dist = toMap(ConnectedComponents.minLabelPropagation(
        pairs, localMaxEdges = -1))
      assert(local == dist, s"seed ${7700 + i}: regimes diverge")
    }
  }

  test("CC distributed loop at 200 shuffle partitions: converges, constant round plans") {
    // a cluster-scale config: each propagation round's joins/aggs shuffle
    // over many partitions. The loop must converge identically and each
    // round's logical plan must stay CONSTANT-size (the per-round scratch
    // lineage cut) regardless of the partition count — the two properties
    // that keep round cost flat when the config scales 100×.
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "200")
      // chain of diameter 8 forces several rounds
      val edges = (1L until 9L).map(i => (i, i + 1)) ++ Seq((20L, 21L))
      val pairs = Scratch.materialize(edges.toDF("da", "db"), "cc-200p")
      var planSizes = List.empty[Int]
      val labels = ConnectedComponents.minLabelPropagation(
        pairs, localMaxEdges = -1,
        onRound = next => planSizes ::= next.queryExecution.optimizedPlan
          .collect { case n => n }.size)
      val m = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(m == ((1L to 9L).map(_ -> 1L) ++ Seq(20L -> 20L, 21L -> 20L)).toMap,
        s"wrong closure at 200 partitions: $m")
      assert(planSizes.length >= 3, "diameter-8 chain should take >= 3 rounds")
      assert(planSizes.distinct.size == 1,
        s"round plan size must stay constant: $planSizes")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("CC regimes agree on STRING ids — incl. the distributed loop (regression)") {
    import spark.implicits._
    // the distributed regime previously crashed on string ids: the old
    // convergence check summed the label column (type-coerced to double,
    // .getLong ClassCastException), so the UTF8String-order parity the
    // local comparator guarantees was unreachable above the size cap.
    // The fingerprint check is type-agnostic — both regimes must run and
    // agree, including a component where UTF-8 and UTF-16 orders truly
    // DISAGREE on the minimum: '😀' begins with surrogate 0xD83D, so
    // UTF-16 ranks it below U+E000 ('…', private use) while UTF-8
    // compares bytes F0 9F… vs EE 80… and ranks it above — a Java-String-
    // order comparator would pick the emoji as the component label and
    // fail this test, the UTF8String order must pick the U+E000 string
    val edges = Seq(
      ("alpha", "beta"), ("beta", "gamma"),
      ("pua", "😀emoji"),
      ("solo-a", "solo-b"))
    val pairs = Scratch.materialize(edges.toDF("da", "db"), "cc-str")
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val local = toMap(
      ConnectedComponents.minLabelPropagation(pairs, localMaxEdges = Long.MaxValue))
    val dist = toMap(
      ConnectedComponents.minLabelPropagation(pairs, localMaxEdges = -1))
    assert(local == dist, s"string regimes diverge:\nlocal=$local\ndist=$dist")
    // the two orders must actually disagree here, or this test is vacuous
    assert("😀emoji".compareTo("pua") < 0,
      "fixture lost its UTF-16-vs-UTF-8 disagreement")
    assert(local("gamma") == "alpha" && local("😀emoji") == "pua",
      s"unexpected labels (Java-String-order min leaked in?): $local")
  }

  test("CC regimes agree: single-task union-find == distributed propagation") {
    import spark.implicits._
    // chain (diameter 5), two cliques sharing a bridge, a 2-cycle, and
    // self-contained pairs — shapes that exercise path compression,
    // union-by-min ordering, and multi-round propagation alike
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (10L, 11L), (11L, 12L), (10L, 12L), (12L, 13L), (13L, 14L), (14L, 13L),
      (20L, 21L),
      (31L, 30L)) // reversed order: min is on the right
    val pairs = Scratch.materialize(edges.toDF("da", "db"), "cc-regimes")
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val local = toMap(
      ConnectedComponents.minLabelPropagation(pairs, localMaxEdges = Long.MaxValue))
    val dist = toMap(
      ConnectedComponents.minLabelPropagation(pairs, localMaxEdges = -1))
    assert(local == dist, s"regimes diverge:\nlocal=$local\ndist=$dist")
    assert(local(6L) == 1L && local(14L) == 10L && local(21L) == 20L
      && local(31L) == 30L && local(30L) == 30L)
    // and the dispatcher itself picks the local path for a graph this
    // small (no rounds observed) while still matching
    var rounds = 0
    val dispatched = toMap(ConnectedComponents.minLabelPropagation(
      pairs, onRound = _ => rounds += 1))
    assert(dispatched == local && rounds == 0)
  }
}
