package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.{ConnectedComponents, Scratch}

/** Dev-only calibration probe for [[ConnectedComponents.LocalMaxEdges]]:
  * times the single-task union-find regime against the distributed
  * min-label loop on the SAME materialized edge relation across a sweep
  * of edge counts, and prints one line per (size, regime).
  *
  * Graph shape mirrors the near-dup workload the operator serves: many
  * small components (random pairs over a node universe of ~edges/2 ids),
  * so the distributed loop converges in few rounds — the regime where it
  * looks BEST. The crossover read off this sweep is therefore
  * conservative: high-diameter graphs only widen the local regime's win.
  */
object CcCrossover {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkEnv.local("cc-crossover")
    import spark.implicits._
    val sizes: Seq[Long] =
      if (args.nonEmpty) args.map(_.toLong).toSeq
      else Seq(1000L, 10000L, 100000L, 1000000L, 4000000L, 16000000L)

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // warm the JVM: scan + shuffle + codegen paths, both regimes
    val warm = spark.range(10000)
      .select((rand(1) * 5000).cast("long").as("da"),
        (rand(2) * 5000).cast("long").as("db"))
      .filter($"da" =!= $"db")
    // the looping-caller contract: use the *Path variant and release each
    // labels dir — minLabelPropagation orphans one dir per call. The
    // release happens in the caller AFTER the timer stops, so CROSSOVER
    // numbers time only the solve (comparable with the recorded series).
    def solve(edges: org.apache.spark.sql.DataFrame, lme: Long): String =
      ConnectedComponents.minLabelPropagationPath(edges, localMaxEdges = lme)

    val warmPath = Scratch.materializePath(warm, "cc-x-warm")
    val warmEdges = spark.read.parquet(warmPath)
    Scratch.release(solve(warmEdges, Long.MaxValue))
    Scratch.release(solve(warmEdges, -1L))
    Scratch.release(warmPath)

    for (n <- sizes) {
      // random pairs over a universe of n/2 ids — small components, the
      // shape q61/q73 feed this operator
      val pairs = spark.range(n)
        .select((rand(10) * (n / 2)).cast("long").as("da"),
          (rand(20) * (n / 2)).cast("long").as("db"))
        .filter($"da" =!= $"db")
      val path = Scratch.materializePath(pairs, s"cc-x-$n")
      val edges = spark.read.parquet(path)
      edges.count() // touch parquet footer/readahead outside the timers
      var out: String = null
      val tLocal = time { out = solve(edges, Long.MaxValue) }
      Scratch.release(out)
      val tDist = time { out = solve(edges, -1L) }
      Scratch.release(out)
      println(f"""CROSSOVER {"edges":$n,"local_s":$tLocal%.2f,"dist_s":$tDist%.2f}""")
      Scratch.release(path)
    }
    spark.stop()
  }
}
