package graft.tools

import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** Dev-only scale receipt for the MICRO_BATCH_READ ingest path
  * ([[graft.sources.VehicleCsvMicroBatchStream]]): generates a many-file
  * gz drop, then times the SAME files through (a) the batch DSv2 scan,
  * (b) one AvailableNow drain in a single micro-batch, and (c) an
  * AvailableNow drain forced through 8 micro-batches — so the streaming
  * path's overhead vs batch (offset log, per-batch planning/commit) is a
  * measured number, not a hope. Counts are asserted equal across all
  * three (the parity contract the spec pins at fixture scale, held at
  * volume).
  *
  * Usage: runMain graft.tools.StreamScale [files] [rowsPerFile] [dir]
  * Prints one JSON line:
  *   {"metric":"stream_scale","files":F,"rows":N,
  *    "batch_sec":…,"stream_1batch_sec":…,"stream_8batch_sec":…}
  */
object StreamScale {

  def main(args: Array[String]): Unit = {
    val files = args.lift(0).map(_.toInt).getOrElse(64)
    val rowsPerFile = args.lift(1).map(_.toInt).getOrElse(50000)
    val dir = args.lift(2).getOrElse("/tmp/graft-streamscale")

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    generate(dir, files, rowsPerFile)
    val expected = files.toLong * rowsPerFile

    def time(body: => Long): Double = {
      val t0 = System.nanoTime()
      val n = body
      require(n == expected, s"row-count divergence: $n != $expected")
      (System.nanoTime() - t0) / 1e9
    }

    val batchSec = time {
      spark.read.format("graft-vehicle-csv").load(dir).count()
    }

    def drain(maxFilesPerTrigger: Int): Long = {
      val counter = new java.util.concurrent.atomic.AtomicLong
      val q = spark.readStream.format("graft-vehicle-csv")
        .option("maxFilesPerTrigger", maxFilesPerTrigger)
        .load(dir)
        .writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation",
          Files.createTempDirectory("graft-streamscale-ckpt").toString)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          counter.addAndGet(b.count())
          ()
        }.start()
      q.awaitTermination()
      counter.get()
    }

    val stream1Sec = time(drain(files))
    val stream8Sec = time(drain(math.max(1, files / 8)))

    println(s"""{"metric":"stream_scale","files":$files,""" +
      s""""rows":$expected,"batch_sec":$batchSec,""" +
      s""""stream_1batch_sec":$stream1Sec,"stream_8batch_sec":$stream8Sec}""")
    spark.stop()
  }

  /** Deterministic gz CSV drop: narrow rows, distinct vehicles/timestamps
    * per file so drops never fire and counts are exact. */
  private def generate(dir: String, files: Int, rowsPerFile: Int): Unit = {
    val root = Paths.get(dir)
    if (Files.exists(root.resolve(f"part-${files - 1}%04d.csv.gz"))) return
    Files.createDirectories(root)
    for (f <- 0 until files) {
      val out = new java.io.BufferedOutputStream(new GZIPOutputStream(
        Files.newOutputStream(root.resolve(f"part-$f%04d.csv.gz"))), 1 << 16)
      val sb = new java.lang.StringBuilder
      for (r <- 0 until rowsPerFile) {
        val sec = r % 60
        val min = (r / 60) % 60
        val hr = (r / 3600) % 24
        sb.setLength(0)
        sb.append("2015-02-1").append(1 + (r / 86400) % 9).append(' ')
          .append(f"$hr%02d:$min%02d:$sec%02d+05,")
          .append(f.toLong * rowsPerFile + r).append(',')
          .append(23.7 + (r % 1000) * 1e-4).append(',')
          .append(90.3 + (r % 1000) * 1e-4).append('\n')
        out.write(sb.toString.getBytes("UTF-8"))
      }
      out.close()
    }
  }
}
