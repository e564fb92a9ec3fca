package graft

import org.apache.spark.sql.SparkSession

import graft.ingest.CsvVehicleReader
import graft.streaming.{HttpSink, VehicleMessages}

/** The reference's CLI surface (behavior of opentraffic/csv-loader
  * CsvLoader.java:31-70 `main`): `-f <csv>` (required) and `-u <url>`
  * (default `http://localhost:4567/locationUpdate`), load the file, POST
  * protobuf envelopes. A reference user can run the same command against
  * this engine:
  *
  * {{{
  * sbt "runMain graft.CsvLoaderCli -f pings.csv.gz -u http://host/locationUpdate"
  * }}}
  *
  * Differences from the reference, all deliberate: the load parallelizes
  * across cores/executors (the reference is a single-threaded loop); a bad
  * vehicle id drops the row instead of aborting the load; the run summary
  * reports the dual distinct counts from a distributed aggregate, not
  * driver-side HashSets. The random per-run sourceId (CsvLoader.java:63)
  * is minted here at the process boundary — never inside query logic, so
  * all registered queries stay deterministic. */
object CsvLoaderCli {

  def main(args: Array[String]): Unit = {
    var file: Option[String] = None
    var url = "http://localhost:4567/locationUpdate"
    var i = 0
    def usageExit(msg: String): Nothing = {
      System.err.println(msg)
      System.err.println("usage: CsvLoaderCli -f <csv[.gz|.zip]> [-u <url>]")
      sys.exit(2)
    }
    while (i < args.length) {
      args(i) match {
        case "-f" if i + 1 < args.length => file = Some(args(i + 1)); i += 2
        case "-u" if i + 1 < args.length => url = args(i + 1); i += 2
        case flag @ ("-f" | "-u") => usageExit(s"missing value for $flag")
        case other                => usageExit(s"unknown argument: $other")
      }
    }
    val csv = file.getOrElse(usageExit("option -f <csv> is required"))
    if (!new java.io.File(csv).exists()) {
      System.err.println(s"file not found: $csv")
      sys.exit(1)
    }

    val spark = SparkEnv.local("csv-loader")
    try {
      // per-run lineage tag, minted at the process boundary only
      // (CsvLoader.java:63 semantics)
      val sourceId = java.util.UUID.randomUUID().getLeastSignificantBits

      // cached: the sink pass and the summary aggregate share one read
      // (gz/zip decompress is single-task and would otherwise run twice)
      val pings = CsvVehicleReader.read(spark, csv).persist()
      try {
        new HttpSink(url, sourceId).write(VehicleMessages.fromPings(pings))

        // run summary — reference's progress line (CsvLoader.java:161-165)
        import org.apache.spark.sql.functions._
        val row = pings.agg(
          count(lit(1)).as("n"),
          countDistinct(col("vehicle_id_str")).as("uniq_str"),
          countDistinct(col("vehicle_id")).as("uniq_id")).collect()(0)
        println(s"Loaded ${row.getLong(0)} records " +
          s"(${row.getLong(1)} unique vehicles, ${row.getLong(2)} unique ids) " +
          s"sourceId=$sourceId -> $url")
      } finally pings.unpersist()
    } finally spark.stop()
  }
}
