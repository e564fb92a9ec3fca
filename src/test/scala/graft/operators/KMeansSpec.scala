package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.{SparkSpec, Tables}

/** Lloyd k-means: convergence, determinism, empty-cluster handling, and
  * the no-shuffle-for-assignment scale guarantee. */
class KMeansSpec extends SparkSpec {
  import spark.implicits._

  private def quantized = Tables.embeddings(spark, sf0001).select(
    col("vec_id"),
    transform(col("embedding"),
      v => round(v.cast("double") * 10000, 0).cast("long")).as("vq"))

  test("objective (sum of dist2) is non-increasing across Lloyd rounds") {
    val vq = quantized.cache()
    try {
      val n = vq.count()
      val dims = vq.select(size(col("vq"))).as[Int].head()
      val objectives = (0 to 3).map { iters =>
        KMeans.lloyd(vq, "vec_id", "vq", k = 4, iters = iters)
          .agg(sum(col("dist2"))).as[Long].head()
      }
      // floor(mean) recentering (not the exact mean) can cost up to 1 per
      // point per dim vs true Lloyd, so monotonicity holds to that slack
      val floorSlack = n * dims
      objectives.sliding(2).foreach { case Seq(prev, next) =>
        assert(next <= prev + floorSlack,
          s"objective rose beyond floor-recenter slack: $objectives")
      }
      // and the rounds strictly improve on real data
      assert(objectives.last < objectives.head)
    } finally vq.unpersist()
  }

  test("deterministic: identical output across runs") {
    val a = KMeans.lloyd(quantized, "vec_id", "vq", k = 4, iters = 2)
      .select("vec_id", "cluster", "dist2").orderBy("vec_id").collect()
    val b = KMeans.lloyd(quantized, "vec_id", "vq", k = 4, iters = 2)
      .select("vec_id", "cluster", "dist2").orderBy("vec_id").collect()
    assert(a.sameElements(b))
  }

  test("empty clusters keep their previous centroid; every point assigned") {
    // two tight groups, k=3: the third (lowest-id-init) centroid loses
    // all points after round 1 and must survive via the keep-previous rule
    val vecs = Seq(
      (0L, Array(0L, 0L)), (1L, Array(1L, 0L)), (2L, Array(0L, 1L)),
      (10L, Array(100L, 100L)), (11L, Array(101L, 100L)), (12L, Array(100L, 101L))
    ).toDF("vec_id", "vq")
    val out = KMeans.lloyd(vecs, "vec_id", "vq", k = 3, iters = 3)
      .select("vec_id", "cluster").as[(Long, Long)].collect().toMap
    assert(out.size == 6)
    assert(out.values.forall(c => c >= 0 && c < 3))
    // the two tight groups end up internally co-clustered
    assert(Set(out(10L), out(11L), out(12L)).size == 1)
    assert(Set(out(0L), out(1L), out(2L)).size == 1)
  }

  test("each centroid distance is evaluated once per row (k, not 2k)") {
    // the r5 shape inlined the distance array into both array_min and
    // array_position, doubling the dominant cost of assignment; the
    // struct-argmin shape must keep exactly k SquaredDistanceExpr in the
    // optimized plan (CollapseProject must not re-inline the array into
    // its two field extractions)
    val k = 4
    val plan = KMeans.lloyd(quantized, "vec_id", "vq", k = k, iters = 1)
      .queryExecution.optimizedPlan
    val evals = plan.map(p => p.expressions.map(e =>
      e.collect { case _: graft.functions.SquaredDistanceExpr => 1 }.sum).sum).sum
    assert(evals == k, s"expected $k distance evals in the plan, got $evals")
  }

  test("null vector among init rows fails fast with a clear error") {
    val vecs = Seq(
      (0L, Option(Array(0L, 0L))), (1L, Option.empty[Array[Long]]),
      (2L, Option(Array(1L, 1L))), (3L, Option(Array(2L, 2L)))
    ).toDF("vec_id", "vq")
    val e = intercept[IllegalArgumentException] {
      KMeans.lloyd(vecs, "vec_id", "vq", k = 3, iters = 1)
    }
    assert(e.getMessage.contains("null vectors"))
  }

  test("null / ragged vector beyond the init rows fails at execution, not as an opaque NPE") {
    def run(vecs: org.apache.spark.sql.DataFrame): Throwable = intercept[Exception] {
      KMeans.lloyd(vecs, "vec_id", "vq", k = 2, iters = 1).count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    val ragged = Seq(
      (0L, Array(0L, 0L)), (1L, Array(5L, 5L)), (2L, Array(1L, 2L, 3L))
    ).toDF("vec_id", "vq")
    assert(messages(run(ragged)).exists(_.contains("must be a non-null array<long> of length 2")))
    val withNull = Seq(
      (0L, Option(Array(0L, 0L))), (1L, Option(Array(5L, 5L))), (9L, Option.empty[Array[Long]])
    ).toDF("vec_id", "vq")
    assert(messages(run(withNull)).exists(_.contains("must be a non-null array<long> of length 2")))
  }

  test("input columns named dist2/cluster are rejected, not silently replaced") {
    val vecs = Seq((0L, Array(0L, 0L), 7L), (1L, Array(1L, 1L), 7L))
      .toDF("vec_id", "vq", "cluster")
    val e = intercept[IllegalArgumentException] {
      KMeans.lloyd(vecs, "vec_id", "vq", k = 2, iters = 1)
    }
    assert(e.getMessage.contains("cluster"))
  }

  // plain-Scala reference implementation of the documented semantics:
  // k-lowest-id init, integer squared-L2 argmin with lowest-cid ties,
  // floor(sum/n) recentering in double, empty clusters keep their
  // previous centroid — the CC regime-equality pattern: the distributed
  // operator must equal an independently-written sequential one
  private def localLloyd(pts: Seq[(Long, Array[Long])], k: Int,
      iters: Int): (Map[Long, (Long, Long)], Boolean) = {
    def d2(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    var cents: Array[Array[Long]] = pts.sortBy(_._1).take(k).map(_._2.clone()).toArray
    var sawEmpty = false
    def assign(): Map[Long, (Long, Long)] = pts.map { case (id, v) =>
      val ds = cents.map(c => d2(v, c))
      val cid = ds.indices.minBy(i => (ds(i), i))
      id -> (cid.toLong, ds(cid))
    }.toMap
    (0 until iters).foreach { _ =>
      val byCluster = pts.groupBy(p => assign()(p._1)._1)
      cents = Array.tabulate(k) { cid =>
        byCluster.get(cid.toLong) match {
          case Some(ps) => Array.tabulate(ps.head._2.length) { d =>
            math.floor(ps.map(_._2(d)).sum.toDouble / ps.length).toLong
          }
          case None => sawEmpty = true; cents(cid)
        }
      }
    }
    (assign(), sawEmpty)
  }

  test("property: distributed Lloyd equals the sequential reference on random corpora") {
    val corpusGen = for {
      dims <- Gen.chooseNum(1, 4)
      n <- Gen.chooseNum(2, 24)
      k <- Gen.chooseNum(1, math.min(n, 5))
      // a tiny value range forces duplicate points, distance ties, and
      // clusters that empty out mid-run — the regime edges
      vals <- Gen.listOfN(n, Gen.listOfN(dims, Gen.chooseNum(-2L, 2L)))
    } yield (k, vals.map(_.toArray))
    var emptyClusterCases = 0
    (0 until 14).foreach { i =>
      val (k, vals) = corpusGen.apply(Gen.Parameters.default, Seed(4200L + i))
        .getOrElse(fail(s"gen failed at seed $i"))
      val pts = vals.zipWithIndex.map { case (v, id) => (id.toLong, v) }
      val iters = i % 4
      val (expected, sawEmpty) = localLloyd(pts, k, iters)
      if (sawEmpty) emptyClusterCases += 1
      val df = pts.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "vq")
      val got = KMeans.lloyd(df, "vec_id", "vq", k, iters)
        .select("vec_id", "cluster", "dist2").as[(Long, Long, Long)]
        .collect().map { case (id, c, d) => id -> (c, d) }.toMap
      assert(got == expected,
        s"seed=$i k=$k iters=$iters n=${pts.size}: spark=$got local=$expected")
      // objective non-increase (to floor-recenter slack), cheap on the
      // reference impl — equality above transfers it to the operator
      val dims = vals.head.length
      val objs = (0 to 3).map(it => localLloyd(pts, k, it)._1.values.map(_._2).sum)
      objs.sliding(2).foreach { case Seq(a, b) =>
        assert(b <= a + pts.size.toLong * dims, s"seed=$i objective rose: $objs")
      }
    }
    // the generator must actually exercise the empty-cluster branch
    assert(emptyClusterCases > 0, "no random case emptied a cluster — weaken the value range")
  }

  test("assignment is map-side: final plan has no Exchange") {
    val plan = KMeans.lloyd(quantized, "vec_id", "vq", k = 4, iters = 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"k-means assignment must not shuffle the corpus:\n$plan")
  }

  test("lloydPartitioned equals an independent lloyd per partition, bit-for-bit") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // 3 partitions with uneven sizes, incl. one smaller than k
    val rows = (0 until 60).map { i =>
      val p = if (i < 30) 0L else if (i < 58) 1L else 2L
      (p, i.toLong, Seq.fill(4)(rnd.nextInt(2000).toLong - 1000))
    }
    val df = rows.toDF("part", "vec_id", "vq")
    for ((k, iters) <- Seq((4, 2), (3, 1), (5, 2))) {
      val combined = KMeans
        .lloydPartitioned(df, "part", "vec_id", "vq", parts = 3, k = k, iters = iters)
        .select("part", "vec_id", "cluster").as[(Long, Long, Long)]
        .collect().map(r => (r._1, r._2) -> r._3).toMap
      val perPart = (0 until 3).flatMap { p =>
        val sub = df.filter(col("part") === p.toLong)
        val kc = math.min(k.toLong, sub.count()).toInt
        KMeans.lloyd(sub, "vec_id", "vq", kc, iters)
          .select("part", "vec_id", "cluster").as[(Long, Long, Long)]
          .collect().map(r => (r._1, r._2) -> r._3)
      }.toMap
      assert(combined == perPart,
        s"k=$k iters=$iters: combined != per-partition lloyd")
    }
  }
}
