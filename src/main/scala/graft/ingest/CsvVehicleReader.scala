package graft.ingest

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.util.zip.ZipInputStream

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{BigIntLow64Expr, ParseFlexTimestamp}

/** Vehicle-ping CSV ingest with the reference's semantics (behavior of
  * opentraffic/csv-loader CsvLoader.java:84-148):
  *
  *  - transparent decompression: plain / `.gz` (Hadoop codec, splittable
  *    pipeline otherwise) / `.zip` (FIRST entry only, CsvLoader.java:86-88);
  *  - headerless positional columns, schema variant dispatched PER RECORD
  *    by arity (CsvLoader.java:120-127): narrow `(ts,vid,lat,lon)` = cols
  *    0,1,2,3; wide (>9 cols, taxi files) keeps ts/vid at 0,1 but reads
  *    lat,lon from cols 9,10;
  *  - permissive drops: bad arity, unparseable lat/lon double, unparseable
  *    timestamp (CsvLoader.java:131-143). DELIBERATE DIVERGENCE: a
  *    non-integer vehicle id also drops just the row here, whereas the
  *    reference's id parse sits OUTSIDE its per-record try/catch
  *    (CsvLoader.java:145-146) so one bad id aborts the whole load and
  *    discards the unsent buffer — a crash bug at scale we do not copy;
  *  - vehicle id parsed with BigInteger-low-64-bits wrap semantics
  *    (CsvLoader.java:145-146) — kept alongside the raw id string so the
  *    reference's dual distinct counts (CsvLoader.java:105-106) are
  *    computable downstream.
  *
  * Everything after line-reading is declarative Column logic (one custom
  * field-split expression + two scalar expressions), so the scan → project
  * → cast → filter pipeline stays in whole-stage codegen and parallelizes
  * per file split. No per-record driver logic anywhere.
  */
object CsvVehicleReader {

  /** Output schema: vehicle_id_str, vehicle_id (low-64 wrap), lat, lon,
    * ts_ms (epoch millis). */
  def read(spark: SparkSession, path: String): DataFrame = {
    // CASE-INSENSITIVE extension test, like IngestFiles.openDecompressed
    // (the reference lowercases the name first, CsvLoader.java:84 — a
    // `DATA.ZIP` must open as an archive, not parse as plain bytes)
    val lines =
      if (path.toLowerCase(java.util.Locale.ROOT).endsWith(".zip"))
        zipFirstEntryLines(spark, path)
      else spark.read.text(path).select(col("value")) // .gz handled by codec
    fromLines(lines)
  }

  /** Core record pipeline over a one-string-column DataFrame of CSV lines. */
  def fromLines(lines: DataFrame): DataFrame = {
    val n = size(col("f"))
    // 0-based like the reference; `get` (not ANSI-throwing element_at)
    // yields null out-of-bounds = the reference's catch-and-drop at
    // CsvLoader.java:131-135 (e.g. a 10-col row has no col 10 → dropped).
    def fld(i: Int): Column = get(col("f"), lit(i))
    val latStr = when(n > 9, fld(9)).otherwise(fld(2))
    val lonStr = when(n > 9, fld(10)).otherwise(fld(3))
    lines
      .withColumn("f", CsvFieldsExpr(col("value")))
      .filter(n >= 4)
      .select(
        fld(1).as("vehicle_id_str"),
        BigIntLow64Expr(fld(1)).as("vehicle_id"),
        latStr.cast("string").as("lat_str"),
        lonStr.cast("string").as("lon_str"),
        ParseFlexTimestamp(fld(0)).as("ts_ms"))
      .withColumn("lat", expr("try_cast(lat_str AS DOUBLE)"))
      .withColumn("lon", expr("try_cast(lon_str AS DOUBLE)"))
      .filter(col("lat").isNotNull && col("lon").isNotNull &&
        col("ts_ms").isNotNull && col("vehicle_id").isNotNull)
      .select(col("vehicle_id_str"), col("vehicle_id"),
        col("lat"), col("lon"), col("ts_ms"))
  }

  /** Lines of the FIRST zip entry only (CsvLoader.java:86-88: the reference
    * opens the first `ZipEntry` and ignores the rest). Zip has no Hadoop
    * codec and is not splittable, so archives parallelize across files,
    * not within one (at scale prefer .gz or plain). Each task STREAMS its
    * archive through ZipInputStream over the Hadoop filesystem — no
    * whole-archive buffering, so >2 GB archives work (the binaryFile
    * source would refuse them and buffer smaller ones on-heap).
    */
  private def zipFirstEntryLines(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    import org.apache.hadoop.fs.{FileSystem, Path => HPath}
    val conf = spark.sparkContext.hadoopConfiguration
    // glob/directory expansion + conf shipping shared with the DSv2
    // source (IngestFiles) so the two ingest paths cannot drift
    val files = IngestFiles.listInputFiles(path, conf)
    val confProps = IngestFiles.confProps(conf)
    spark.createDataset(files)
      .repartition(math.max(1, files.size)) // one archive per task
      .mapPartitions { paths =>
        val taskConf = IngestFiles.taskConf(confProps)
        paths.flatMap { p =>
          val taskFs = FileSystem.get(new java.net.URI(p), taskConf)
          val zis = new ZipInputStream(taskFs.open(new org.apache.hadoop.fs.Path(p)))
          // close on task end even if the consumer stops early (limit/
          // failure) — otherwise executors leak file handles per archive
          Option(org.apache.spark.TaskContext.get()).foreach(
            _.addTaskCompletionListener[Unit](_ => zis.close()))
          val entry = zis.getNextEntry
          if (entry == null) { zis.close(); Iterator.empty }
          else {
            val br = new BufferedReader(
              new InputStreamReader(zis, StandardCharsets.UTF_8))
            // read only the first entry; close eagerly when exhausted
            new Iterator[String] {
              private var nextLine = br.readLine()
              override def hasNext: Boolean = {
                if (nextLine == null) br.close()
                nextLine != null
              }
              override def next(): String = {
                val l = nextLine; nextLine = br.readLine(); l
              }
            }
          }
        }
      }
      .toDF("value")
  }
}
