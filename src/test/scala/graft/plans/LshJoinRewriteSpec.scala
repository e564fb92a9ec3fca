package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.CosineSimilarityExpr

/** The SURVEY §7.3 LSH join rewrite: conf-gated plan transformation
  * from cartesian cosine-threshold join to banded equi-join. Guards
  * both directions: default-off leaves the nested loop (and exactness)
  * untouched; on, the plan must lose its cartesian and the result must
  * be an exact-verified SUBSET with high recall on near-identical
  * pairs. */
class LshJoinRewriteSpec extends SparkSpec {

  private def corpus: DataFrame = {
    import spark.implicits._
    // 60 base vectors (deterministic LCG components) + a near-copy of
    // each (one component nudged) => 60 planted pairs at cosine ~0.999
    val dims = 16
    def vec(id: Long): Seq[Float] =
      (0 until dims).map { i =>
        val h = (id * 131071L + i * 8191L + 7L) * 1103515245L % 2147483648L
        (h % 1000L).toFloat / 500f - 1f
      }
    val base = (0L until 60L).map(i => (i, vec(i)))
    val near = base.map { case (i, v) =>
      (i + 1000L, v.updated(0, v.head + 0.01f))
    }
    (base ++ near).toDF("id", "vec")
  }

  private def thresholdJoin(df: DataFrame): DataFrame = {
    val l = df.select(col("id").as("ida"), col("vec").as("va"))
    val r = df.select(col("id").as("idb"), col("vec").as("vb"))
    l.join(r, CosineSimilarityExpr(col("va"), col("vb")) >= lit(0.98) &&
        col("ida") < col("idb"))
      .select(col("ida"), col("idb"))
  }

  private def planOf(df: DataFrame): String = {
    df.collect() // force AQE final plan
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p                        => p.toString
    }
  }

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def withRewrite[T](body: => T): T = {
    spark.conf.set(LshJoinRewrite.EnabledKey, "true")
    try body finally spark.conf.unset(LshJoinRewrite.EnabledKey)
  }

  test("default off: threshold join plans as nested loop and is exact") {
    val df = thresholdJoin(corpus)
    val p = planOf(df)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("CartesianProduct"),
      s"expected a cartesian-shape join when the rule is off:\n$p")
    assert(pairs(df).size >= 60, "planted near-pairs must qualify exactly")
  }

  test("enabled: plan joins on the band key (no cartesian) and recalls " +
      "the planted near-identical pairs") {
    val exact = pairs(thresholdJoin(corpus))
    val planted = (0L until 60L).map(i => (i, i + 1000L)).toSet
    assert(planted.subsetOf(exact))
    withRewrite {
      val df = thresholdJoin(corpus)
      val p = planOf(df)
      assert(!p.contains("BroadcastNestedLoopJoin") &&
        !p.contains("CartesianProduct"),
        s"rewrite did not remove the cartesian:\n$p")
      assert(p.contains("sign_lsh_band") || p.contains("SignLshBand") ||
        p.contains("__lsh_band"), s"banded keys missing from plan:\n$p")
      val got = pairs(df)
      assert(got.subsetOf(exact),
        s"LSH join emitted non-qualifying pairs: ${(got -- exact).take(5)}")
      // deterministic planes + deterministic data => a fixed recall; the
      // planted pairs sit at cosine ~0.999 where 8x6 banding recall is
      // ~1 - (1 - 0.94^6)^8 ~= 0.995 per pair
      val recalled = planted.intersect(got).size
      assert(recalled >= 55,
        s"recall too low on planted near-pairs: $recalled/60")
    }
  }

  test("a join that already has an equi-key is left alone") {
    withRewrite {
      val df = corpus
      val l = df.select(col("id").as("ida"), col("vec").as("va"),
        (col("id") % 7).as("ka"))
      val r = df.select(col("id").as("idb"), col("vec").as("vb"),
        (col("id") % 7).as("kb"))
      val j = l.join(r, col("ka") === col("kb") &&
          CosineSimilarityExpr(col("va"), col("vb")) >= lit(0.98) &&
          col("ida") < col("idb"))
        .select(col("ida"), col("idb"))
      val p = planOf(j)
      assert(!p.contains("__lsh_band"),
        s"rule must not fire on an equi-keyed join:\n$p")
    }
  }

  test("q170 runs the registered threshold join through the rewrite: " +
      "banded plan, result identical to the exact nested-loop arm") {
    val df = graft.queries.LlmOps.q170(spark, sf001)
    val got = pairs(df.select(col("pid"), col("vec_id")))
    val p = planOf(df)
    assert(p.contains("__lsh_band"), s"q170 did not go through the rewrite:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), s"cartesian survived in q170:\n$p")
    // the rule must stay scoped to q170's child session
    assert(spark.conf.getOption(LshJoinRewrite.EnabledKey).isEmpty ||
      spark.conf.get(LshJoinRewrite.EnabledKey) == "false")
    // exact arm on the parent session (rule off): every 7th vector's
    // jittered probe matches exactly its source and nothing else
    val sourceIds = (0L until 500L by 7L).toSet
    assert(got == sourceIds.map(i => (-i - 1, i)),
      s"probe-source pairing broken: ${got.take(5)} (${got.size} pairs)")
  }

  test("duplicate input rows keep their pair multiplicity; null vectors " +
      "are filtered, not matched") {
    import spark.implicits._
    val v = Seq(1f, 2f, 3f, 4f)
    // left: the same row TWICE (identical across all columns) + a null
    // vector; right: one matching row
    val l = Seq((10L, Option(v)), (10L, Option(v)), (99L, Option.empty[Seq[Float]]))
      .toDF("ida", "va")
    val r = Seq((20L, v)).toDF("idb", "vb")
    def joined: DataFrame = l.join(r,
      graft.functions.CosineSimilarityExpr(col("va"), col("vb")) >= lit(0.9))
      .select(col("ida"), col("idb"))
    val exact = joined.collect().map(_.toSeq).toSeq
    assert(exact.count(_ == Seq(10L, 20L)) == 2, "exact arm: dup row joins twice")
    withRewrite {
      val got = joined
      val p = planOf(got)
      assert(p.contains("__lsh_band"), s"rewrite did not fire:\n$p")
      val rows = got.collect().map(_.toSeq).toSeq
      assert(rows.count(_ == Seq(10L, 20L)) == 2,
        s"band-collision dedup must preserve input-row multiplicity: $rows")
      assert(!rows.exists(_.head == 99L), "null vector must not match")
    }
  }

  test("banding is a correct blocking: band keys collide for identical " +
      "vectors and the sql function matches the expression") {
    import spark.implicits._
    val df = Seq((1L, Seq(1f, 2f, 3f, 4f)), (2L, Seq(1f, 2f, 3f, 4f)))
      .toDF("id", "vec")
    df.createOrReplaceTempView("lsh_probe")
    val viaSql = spark.sql(
      "SELECT id, sign_lsh_band(vec, 3, 6) AS b FROM lsh_probe")
      .collect().map(r => r.getLong(1)).toSeq
    assert(viaSql.distinct.size == 1, "identical vectors must share bands")
    val viaExpr = df.select(
      graft.functions.SignLshBandExpr(col("vec"), 3, 6)).collect()
      .map(_.getLong(0)).toSeq
    assert(viaSql == viaExpr)
    // band id rides in the high bits: distinct bands never collide
    val allBands = (0 until 8).map(k => df.limit(1).select(
      graft.functions.SignLshBandExpr(col("vec"), k, 6)).collect()(0).getLong(0))
    assert(allBands.distinct.size == 8)
  }
}
