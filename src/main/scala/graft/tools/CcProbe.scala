package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only scratch main: phase timing for the CC-based queries (q61/q73)
  * — pair generation vs the propagation loop — to target optimization. */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.SparkEnv.local("ccprobe")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm the JVM/IO
    t("warmup-q01")(graft.SparkEntry.queries("q01_pricing_summary")(spark, sfDir).collect())

    val q61pairs = t("q61-pairs-materialize") {
      graft.operators.Scratch.materializePath(
        graft.SparkEntry.queries("q35_near_dup")(spark, sfDir)
          .filter(col("jaccard") >= 0.8).select(col("da"), col("db")),
        "probe-q61-pairs")
    }
    println("q61 pair count: " + spark.read.parquet(q61pairs).count())
    var rounds = 0
    val labels = t("q61-cc-loop") {
      graft.operators.ConnectedComponents.minLabelPropagation(
        spark.read.parquet(q61pairs), onRound = _ => rounds += 1)
    }
    println(s"q61 rounds=$rounds labelRows=${labels.count()}")
    t("q61-full")(graft.SparkEntry.queries("q61_dedup_clusters")(spark, sfDir).collect())

    val q73pairs = t("q73-pairs-materialize") {
      graft.operators.Scratch.materializePath(
        graft.queries.LlmOps.q34b(spark, sfDir)
          .select(col("va").as("da"), col("vb").as("db")),
        "probe-q73-pairs")
    }
    println("q73 pair count: " + spark.read.parquet(q73pairs).count())
    rounds = 0
    val labels73 = t("q73-cc-loop") {
      graft.operators.ConnectedComponents.minLabelPropagation(
        spark.read.parquet(q73pairs), onRound = _ => rounds += 1)
    }
    println(s"q73 rounds=$rounds labelRows=${labels73.count()}")
    t("q73-full")(graft.SparkEntry.queries("q73_embed_clusters")(spark, sfDir).collect())
    t("q35-full")(graft.SparkEntry.queries("q35_near_dup")(spark, sfDir).collect())
    spark.stop()
  }
}
