package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** HITS: reference-implementation equality on random weighted digraphs
  * (the PageRankSpec pattern), endpoint-role semantics, normalization
  * range. */
class HitsSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference of the exact integer semantics. */
  private def reference(
      edges: Seq[(Long, Long, Long)], iters: Int): Map[Long, (Long, Long)] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    var h = nodes.map(_ -> Hits.Scale).toMap
    var a = Map.empty[Long, Long]
    for (_ <- 1 to iters) {
      val araw = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _, w) => w * h(s) }.sum
      }
      val amax = araw.values.max
      a = nodes.map(n =>
        n -> araw.getOrElse(n, 0L) * Hits.Scale / amax).toMap
      val hraw = edges.groupBy(_._1).map { case (s, es) =>
        s -> es.map { case (_, d, w) => w * a(d) }.sum
      }
      val hmax = hraw.values.max
      h = nodes.map(n =>
        n -> hraw.getOrElse(n, 0L) * Hits.Scale / hmax).toMap
    }
    nodes.map(n => n -> (h(n), a(n))).toMap
  }

  private def sparkScores(
      edges: Seq[(Long, Long, Long)], iters: Int): Map[Long, (Long, Long)] =
    Hits.scores(edges.toDF("src", "dst", "w"), iters)
      .as[(Long, Long, Long)].collect()
      .map { case (n, hq, aq) => n -> (hq, aq) }.toMap

  test("matches the reference implementation on random weighted graphs (property)") {
    val genGraph = for {
      n <- Gen.choose(2, 10)
      m <- Gen.choose(1, 25)
      es <- Gen.listOfN(m, Gen.zip(Gen.choose(0L, n - 1L),
        Gen.choose(0L, n - 1L), Gen.choose(1L, 9L)))
    } yield es.filter { case (a, b, _) => a != b }
      .groupBy(e => (e._1, e._2)).map { case ((s, d), ws) =>
        (s, d, ws.map(_._3).sum) }.toSeq
    val cases = (0 until 6).flatMap { i =>
      genGraph(Gen.Parameters.default, Seed(7L + i))
    }.filter(_.nonEmpty)
    assert(cases.size >= 4, "generator starved — property vacuous")
    for (es <- cases; iters <- Seq(1, 2)) {
      assert(sparkScores(es, iters) == reference(es, iters),
        s"divergence on edges=$es iters=$iters")
    }
  }

  test("a pure source has no authority, a pure sink no hub score; the round max normalizes to Scale") {
    // 1 -> 2 -> 3 (unit weights): 1 is a pure source, 3 a pure sink
    val out = sparkScores(Seq((1L, 2L, 1L), (2L, 3L, 1L)), iters = 2)
    assert(out(1L)._2 == 0L, "pure source must have authq=0")
    assert(out(3L)._1 == 0L, "pure sink must have hubq=0")
    val (hubs, auths) = (out.values.map(_._1), out.values.map(_._2))
    assert(hubs.max == Hits.Scale && auths.max == Hits.Scale,
      s"per-round max must normalize to Scale: $out")
    assert(hubs.min >= 0L && auths.min >= 0L)
  }

  test("weights matter: shifting weight shifts the authority ranking") {
    // two importers fed by one hub; only the edge weight differs
    val light = sparkScores(Seq((1L, 2L, 1L), (1L, 3L, 2L)), iters = 1)
    assert(light(3L)._2 > light(2L)._2,
      s"heavier in-edge must yield higher authority: $light")
  }
}
