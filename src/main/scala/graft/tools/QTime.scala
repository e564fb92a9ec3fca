package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only repeat-timer: run one registered query N times in one JVM to
  * split per-dataset landing cost (first invocation) from steady serve
  * cost (later invocations). Usage:
  *   runMain graft.tools.QTime <sfDir> <queryName> [reps=3]
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).collect()
      (System.nanoTime() - t0) / 1e9
    }
    println(s"""{"metric":"qtime","query":"$name","times":[${
      times.map(t => f"$t%.3f").mkString(",")}]}""")
    spark.stop()
  }
}
