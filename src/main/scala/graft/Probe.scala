package graft

import org.apache.spark.sql.SparkSession

/** Dev-only scratch main: prints schemas of all testdata tables. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkEnv.local("probe")
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents", "embeddings")) {
      println(s"=== $t ===")
      try {
        val df = Tables.table(spark, sfDir, t)
        println(df.schema.treeString)
        df.show(3, truncate = 60)
      } catch { case e: Throwable => println(s"FAILED: ${e}") }
    }
    spark.stop()
  }
}
