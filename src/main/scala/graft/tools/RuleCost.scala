package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only Catalyst cost attribution (optimization guide §7.3): plan the
  * named queries (construction + executedPlan, no execution) and dump the
  * per-rule time the RuleExecutor accumulated — the direct answer to
  * "which analyzer/optimizer rules eat a planning-bound query's wall".
  *
  * Usage: runMain graft.tools.RuleCost <sfDir> <q1> [q2 ...]
  */
object RuleCost {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup planning once so JIT/classloading is out of the numbers
    names.foreach { n =>
      graft.SparkEntry.queries(n)(spark, sfDir).queryExecution.executedPlan
    }
    org.apache.spark.sql.catalyst.rules.RuleExecutor.resetMetrics()
    names.foreach { n =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, sfDir).queryExecution.executedPlan
      println(f"planned $n in ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    println(org.apache.spark.sql.catalyst.rules.RuleExecutor.dumpTimeSpent())
    spark.stop()
  }
}
