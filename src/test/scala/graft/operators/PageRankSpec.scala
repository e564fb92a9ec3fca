package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** PageRank: reference-implementation equality (random graphs), unrolled
  * vs checkpointed regime equality, sink/source semantics, scratch
  * hygiene. */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference implementation of the exact operator
    * semantics — independent integer arithmetic to diff the distributed
    * plan against (the ConnectedComponents regime-equality pattern). */
  private def reference(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val base = PageRank.Scale * 15 / 100
    var ranks = nodes.map(_ -> PageRank.Scale).toMap
    for (_ <- 1 to iters) {
      val contribs = edges
        .map { case (s, t) => t -> ranks(s) / outdeg(s) }
        .groupBy(_._1).map { case (t, cs) => t -> cs.map(_._2).sum }
      ranks = nodes.map(n => n -> (base + 85L * contribs.getOrElse(n, 0L) / 100L)).toMap
    }
    ranks
  }

  private def sparkRanks(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    PageRank.ranks(edges.toDF("src", "dst"), iters)
      .as[(Long, Long)].collect().toMap

  test("matches the reference implementation on random graphs (property)") {
    val genGraph = for {
      n <- Gen.choose(2, 12)
      m <- Gen.choose(1, 30)
      es <- Gen.listOfN(m, Gen.zip(Gen.choose(0L, n - 1L), Gen.choose(0L, n - 1L)))
    } yield es.filter { case (a, b) => a != b }.distinct
    val cases = (0 until 6).flatMap { i =>
      genGraph(Gen.Parameters.default, Seed(42L + i))
    }.filter(_.nonEmpty)
    assert(cases.size >= 4, "generator starved — property vacuous")
    for (es <- cases; iters <- Seq(1, 3)) {
      assert(sparkRanks(es, iters) == reference(es, iters),
        s"divergence on edges=$es iters=$iters")
    }
  }

  test("unrolled and checkpointed regimes emit identical ranks") {
    val es = Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L), (3L, 0L), (4L, 0L))
    val live0 = Scratch.liveDirCount
    val path = PageRank.ranksCheckpointedPath(es.toDF("src", "dst"), 5)
    try {
      val ckpt = spark.read.parquet(path).as[(Long, Long)].collect().toMap
      // 5 > the unroll demo depth used elsewhere; both regimes must agree
      assert(ckpt == sparkRanks(es, 5))
      assert(ckpt == reference(es, 5))
    } finally Scratch.release(path)
    assert(Scratch.liveDirCount == live0,
      "checkpointed run leaked scratch dirs")
  }

  test("sources settle at the base rank; a pure sink accumulates authority") {
    // star: 0,1,2 all point at 3; 3 points nowhere (sink, keeps mass)
    val es = Seq((0L, 3L), (1L, 3L), (2L, 3L))
    val r = sparkRanks(es, 3)
    val base = PageRank.Scale * 15 / 100
    for (src <- Seq(0L, 1L, 2L)) assert(r(src) == base, s"source $src: ${r(src)}")
    // by round >= 2 the fixpoint: hub = base + 85% of the three sources'
    // settled base ranks (sink mass is not redistributed by design)
    assert(r(3L) == base + 85L * (3 * base) / 100, s"hub: ${r(3L)}")
    assert(r(3L) > r(0L), "the hub must outrank its sources")
  }
}
