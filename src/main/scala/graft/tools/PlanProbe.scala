package graft.tools

/** Dev-only: print a query's formatted physical plan (scratch scan
  * locations included) for plan-guard authoring. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkEnv.local("plan-probe")
    try {
      val df = graft.SparkEntry.queries(args(0))(spark,
        if (args.length > 1) args(1) else "/root/testdata/sf0.001")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    } finally spark.stop()
  }
}
