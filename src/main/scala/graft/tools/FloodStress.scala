package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only adversarial-corpus receipt for the fingerprint band-join
  * guards (r16 verdict ask #2's "Done" criterion): plant an
  * identical-media FLOOD — k media sharing one exact 128-bit
  * fingerprint — on top of an n-media background and measure what the
  * guards promise:
  *
  *  - the distinct-hash band join ([[graft.queries.LlmOps.repPairs]]
  *    via the spanning-edge entry) sees the flood as ONE row, so its
  *    wall and edge volume stay flat as k grows;
  *  - the closure's spanning edges are LINEAR in k (one star edge per
  *    flood member), never the k(k−1)/2 the full pair relation would
  *    hold.
  *
  * Usage: runMain graft.tools.FloodStress [n] [k1,k2,...]
  * Prints one JSON line:
  *   {"metric":"fp_flood","n":N,
  *    "floods":{k:{"edges":E,"sec":S},...}}
  */
object FloodStress {

  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(50000)
    val ks = args.lift(1).map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(0, 2000, 20000))

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // pseudo-random background fingerprints (xxhash64 — deterministic,
    // well-spread across every 16-bit band, no ANSI overflow)
    def background(s: SparkSession): DataFrame = s.range(n.toLong)
      .select(col("id").as("media_id"),
        xxhash64(col("id")).as("h_hi"),
        xxhash64(col("id"), lit(1)).as("h_lo"))

    def flooded(s: SparkSession, k: Int): DataFrame = {
      val flood = s.range(n.toLong, n.toLong + k)
        .select(col("id").as("media_id"),
          lit(0x0123456789abcdefL).as("h_hi"), lit(0x5a5a5a5aa5a5a5a5L).as("h_lo"))
      background(s).unionByName(flood)
    }

    val results = ks.map { k =>
      // warm once (scratch/codegen), then time
      val edges = graft.queries.LlmOps.floodProbeSpanningEdges(flooded(spark, k))
      edges.count()
      val t0 = System.nanoTime()
      val cnt = edges.count()
      val sec = (System.nanoTime() - t0) / 1e9
      k -> (cnt, sec)
    }

    val body = results.map { case (k, (e, s)) =>
      s""""$k":{"edges":$e,"sec":$s}""" }.mkString(",")
    println(s"""{"metric":"fp_flood","n":$n,"floods":{$body}}""")
    spark.stop()
  }
}
