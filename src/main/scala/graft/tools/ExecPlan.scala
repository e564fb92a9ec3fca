package graft.tools

/** Dev-only: execute a query, then print the FINAL adaptive plan (the
  * post-execution `AdaptiveSparkPlan isFinalPlan=true` tree) — the only
  * place AQE's actual stage reuse / join strategy decisions are visible
  * (guide §7.2: `explain` before execution shows the initial plan). */
object ExecPlan {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkEnv.local("exec-plan")
    try {
      val df = graft.SparkEntry.queries(args(0))(spark,
        if (args.length > 1) args(1) else "/root/testdata/sf0.001")
      df.count()
      // simpleString AFTER execution reflects the final adaptive plan
      println(df.queryExecution.executedPlan.toString())
    } finally spark.stop()
  }
}
