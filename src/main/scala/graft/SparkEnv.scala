package graft

import org.apache.spark.sql.SparkSession

/** One place for the local SparkSession the dev/CLI mains build (the
  * driver-contract mains Verify/Bench keep their own inline copies — those
  * files are part of the harness contract and stay self-contained). */
object SparkEnv {
  def local(appName: String = "graft"): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val s = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
