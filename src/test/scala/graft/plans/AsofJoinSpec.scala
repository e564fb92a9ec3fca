package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Relational

/** The whole-operator as-of join: plan shape (custom physical node, one
  * co-partitioning exchange per side, no window), equality with q10's
  * compositional form, and a brute-force property over random keyed
  * series including no-match and tied-time rows. */
class AsofJoinSpec extends SparkSpec {

  test("q182 plans as AsofJoinExec: two exchanges, no WindowExec") {
    val plan = Relational.q182(spark, sf0001).queryExecution.executedPlan
    val s = plan.toString
    // SparkPlan tree output strips the Exec suffix: the physical node
    // prints as `AsofJoin [keys]...` above the two Sort+Exchange legs
    assert(s.contains("AsofJoin ["), s"custom node missing:\n$s")
    assert(!s.contains("WindowExec"),
      s"as-of exec must not fall back to the window form:\n$s")
    val exchanges = s.split('\n').count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 2,
      s"expected exactly one co-partitioning exchange per side, got " +
        s"$exchanges:\n$s")
  }

  test("q182 equals q10's compositional as-of row for row") {
    val a = Relational.q182(spark, sf0001).collect().map(_.toSeq).toSeq
    val b = Relational.q10(spark, sf0001).collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("property: merge join equals the brute-force as-of on random " +
      "series with no-match and tied-time rows") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // left: 400 probes over 20 keys; right: 300 quotes over 25 keys
    // (keys 20-24 never match; some left keys have no quotes at all)
    val lrows = (0 until 400).map { i =>
      (i.toLong, rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong)
    }
    val rrows = (0 until 300).map { i =>
      (rnd.nextInt(25).toLong, rnd.nextInt(1000).toLong)
    } ++ Seq((3L, 500L), (3L, 500L)) // tied right times on one key
    val left = lrows.toDF("pid", "k", "t")
    val right = rrows.toDF("rk", "rt")
    val got = AsofJoin.asof(left, right, Seq("k" -> "rk"), "t", "rt")
      .select(col("pid"), col("rt"))
      .collect().map(r =>
        r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val byKey = rrows.groupBy(_._1)
    lrows.foreach { case (pid, k, t) =>
      val want = byKey.get(k)
        .map(_.map(_._2).filter(_ <= t))
        .filter(_.nonEmpty).map(_.max).getOrElse(-1L)
      assert(got(pid) == want,
        s"pid $pid (k=$k, t=$t): got ${got(pid)}, want $want")
    }
  }

  test("NULL keys and NULL times never match, on either side (the SQL " +
      "oracle's equi-join + <= semantics)") {
    import spark.implicits._
    val left = Seq(
      (1L, Option(1L), Option(10L)),  // normal: matches rt=5
      (2L, Option(1L), None),         // null left time: no match
      (3L, None, Option(10L)),        // null left key: no match
      (4L, Option(2L), Option(10L))   // key whose only quote has null rt
    ).toDF("pid", "k", "t")
    val right = Seq(
      (Option(1L), Option(5L)),
      (Option(1L), None),             // null right time: never a match
      (None, Option(1L)),             // null right key: never a match
      (Option(2L), None)
    ).toDF("rk", "rt")
    val got = AsofJoin.asof(left, right, Seq("k" -> "rk"), "t", "rt")
      .select(col("pid"), col("rt"))
      .collect().map(r =>
        r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got == Map(1L -> 5L, 2L -> -1L, 3L -> -1L, 4L -> -1L), s"$got")
  }

  test("asof rejects unknown columns loudly") {
    import spark.implicits._
    val l = Seq((1L, 2L)).toDF("a", "t")
    val r = Seq((1L, 2L)).toDF("b", "rt")
    val e = intercept[IllegalArgumentException] {
      AsofJoin.asof(l, r, Seq("nope" -> "b"), "t", "rt")
    }
    assert(e.getMessage.contains("nope"))
  }
}
