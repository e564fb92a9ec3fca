package graft.tools
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import graft.ingest.CsvVehicleReader
import graft.streaming.{HttpSink, ProtoEnvelope, StreamIngest}

/** Scratch e2e drive: CSV dir → streaming ingest → HTTP sink, decoded at a live server. */
object DriveIngest {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = Files.createTempDirectory("drive")
    Files.write(dir.resolve("a.csv"),
      ("2015-02-14 23:51:40+05,42,23.7689,90.3886\n" +
       "2015-02-14T18:51:42.123Z,7,23.7701,90.3901\n" +
       "bad,row\n" +
       "2015-02-14 23:51:43,18446744073709551617,23.77,90.39\n").getBytes(StandardCharsets.UTF_8))

    println("=== batch read ===")
    CsvVehicleReader.read(spark, dir.toString + "/a.csv").show(false)

    val received = new java.util.concurrent.ConcurrentLinkedQueue[Array[Byte]]()
    val server = com.sun.net.httpserver.HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/locationUpdate", (ex: com.sun.net.httpserver.HttpExchange) => {
      received.add(ex.getRequestBody.readAllBytes()); ex.sendResponseHeaders(200, -1); ex.close()
    })
    server.start()
    val url = s"http://127.0.0.1:${server.getAddress.getPort}/locationUpdate"
    val q = StreamIngest.toHttpSink(StreamIngest.readStream(spark, dir.toString),
      new HttpSink(url, sourceId = 1234L)).start()
    q.awaitTermination()
    server.stop(0)
    println("=== envelopes received ===")
    received.forEach { b =>
      val (sid, msgs) = ProtoEnvelope.decodeEnvelope(b)
      println(s"sourceId=$sid messages=${msgs.map(m => (m.vehicleId, m.locations.head)).mkString("; ")}")
    }
    spark.stop()
  }
}
