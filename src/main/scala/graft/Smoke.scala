package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: replicates the driver's t1 smoke gate — SparkEntry.entry on
  * sf0.001 must return >0 rows. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkEnv.local("smoke")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(10, truncate = false)
    println(s"SMOKE rows=$n ${if (n > 0) "PASS" else "FAIL"}")
    spark.stop()
  }
}
