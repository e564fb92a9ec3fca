package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import java.util.zip.{GZIPOutputStream, ZipEntry, ZipOutputStream}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ingest.CsvVehicleReader

/** The DataSourceV2 vehicle-CSV source: row-for-row equality with the
  * Column-pipeline reader on every fixture class (the two share the
  * exact parsing functions, so divergence means the DSv2 plumbing broke
  * semantics), column-pruning pushdown, and catalog/SQL usability. */
class VehicleCsvSourceSpec extends SparkSpec {

  private val narrowCsv =
    """2015-02-14 23:51:40+05,42,23.7689,90.3886
      |2015-02-14 23:51:41,42,23.7690,90.3890
      |2015-02-14T18:51:42.123Z,7,23.7701,90.3901
      |2015-02-14 23:51:43.500+05,99,23.7712,90.3912""".stripMargin

  private val wideCsv =
    """2015-02-14 23:51:40+05,42,x,x,x,x,x,x,x,23.7689,90.3886,extra
      |2015-02-14 23:51:41+05,43,x,x,x,x,x,x,x,23.7690,90.3890""".stripMargin

  private val malformedCsv =
    """2015-02-14 23:51:40+05,42,23.7689,90.3886
      |short,row
      |2015-02-14 23:51:41,42,not_a_number,90.3890
      |garbage-timestamp,42,23.7689,90.3886
      |2015-02-14 23:51:42,00042,23.7689,90.3886
      |2015-02-14 23:51:43,18446744073709551617,23.7689,90.3886""".stripMargin

  private def tmpDir: Path = Files.createTempDirectory("graft-dsv2")

  private def writeFile(dir: Path, name: String, content: String): String = {
    val p = dir.resolve(name)
    Files.write(p, content.getBytes(StandardCharsets.UTF_8))
    p.toString
  }

  private def viaDsv2(path: String): DataFrame =
    spark.read.format("graft-vehicle-csv").load(path)

  private def sortedRows(df: DataFrame): Seq[Seq[Any]] =
    df.orderBy(col("vehicle_id_str"), col("ts_ms"), col("lat"))
      .collect().map(_.toSeq).toSeq

  test("DSv2 source equals the Column-pipeline reader on narrow, wide, " +
      "and malformed fixtures") {
    val dir = tmpDir
    for ((name, content) <- Seq(("narrow.csv", narrowCsv),
        ("wide.csv", wideCsv), ("malformed.csv", malformedCsv))) {
      val path = writeFile(dir, name, content)
      val d = viaDsv2(path)
      assert(d.schema == CsvVehicleReader.read(spark, path).schema,
        s"$name: schema diverged")
      assert(sortedRows(d) == sortedRows(CsvVehicleReader.read(spark, path)),
        s"$name: rows diverged from CsvVehicleReader")
    }
  }

  test("DSv2 source reads .gz transparently and .zip FIRST entry only") {
    val dir = tmpDir
    val gz = dir.resolve("narrow.csv.gz")
    val out = new GZIPOutputStream(Files.newOutputStream(gz))
    out.write(narrowCsv.getBytes(StandardCharsets.UTF_8)); out.close()
    assert(sortedRows(viaDsv2(gz.toString)) ==
      sortedRows(CsvVehicleReader.read(spark, gz.toString)))

    val zip = dir.resolve("narrow.zip")
    val zos = new ZipOutputStream(Files.newOutputStream(zip))
    zos.putNextEntry(new ZipEntry("first.csv"))
    zos.write(narrowCsv.getBytes(StandardCharsets.UTF_8))
    zos.closeEntry()
    zos.putNextEntry(new ZipEntry("poison.csv"))
    zos.write("2015-02-14 23:51:40+05,666,1.0,1.0"
      .getBytes(StandardCharsets.UTF_8))
    zos.closeEntry(); zos.close()
    val z = viaDsv2(zip.toString)
    assert(z.count() == 4)
    assert(!z.select(col("vehicle_id_str")).collect()
      .exists(_.getString(0) == "666"), "second zip entry leaked")
  }

  test("column pruning reaches the scan, and rows are identical under " +
      "any projection") {
    val path = writeFile(tmpDir, "narrow.csv", narrowCsv)
    val pruned = viaDsv2(path).select(col("vehicle_id"), col("ts_ms"))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("vehicle_id") && !plan.contains("lat_str"),
      s"unexpected plan:\n$plan")
    // the scan's readSchema is the pruned struct, not all 5 columns
    val scans = pruned.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => s
    }
    assert(scans.nonEmpty, s"no BatchScanExec in:\n$plan")
    assert(scans.head.scan.readSchema().fieldNames.toSeq ==
      Seq("vehicle_id", "ts_ms"),
      s"pruning did not reach the scan: ${scans.head.scan.readSchema()}")
    // drop semantics survive pruning: row COUNT must match the full scan
    // (rows are defined by the full-record parse, not the projection)
    val full = viaDsv2(writeFile(tmpDir, "malformed.csv", malformedCsv))
    assert(full.select(col("vehicle_id")).count() == full.count())
    // and values match the unpruned read
    assert(pruned.orderBy(col("ts_ms")).collect().map(_.toSeq).toSeq ==
      viaDsv2(path).select(col("vehicle_id"), col("ts_ms"))
        .orderBy(col("ts_ms")).collect().map(_.toSeq).toSeq)
  }

  test("filter pushdown reaches the scan, results are identical to the " +
      "residual-filter plan, and unsupported filters stay residual") {
    val path = writeFile(tmpDir, "narrow.csv", narrowCsv)
    val filtered = viaDsv2(path)
      .filter(col("vehicle_id") === 42L && col("lat") > 23.7689)
    val scans = filtered.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => s
    }
    assert(scans.nonEmpty)
    val desc = scans.head.scan.description()
    assert(desc.contains("PushedFilters") && desc.contains("42") &&
      desc.contains("lat"), s"filters did not reach the scan: $desc")
    // semantics: identical to evaluating the predicate above the scan
    val want = viaDsv2(path).collect()
      .filter(r => r.getLong(1) == 42L && r.getDouble(2) > 23.7689)
      .map(_.toSeq).toSeq
    assert(filtered.collect().map(_.toSeq).toSeq.sortBy(_.toString) ==
      want.sortBy(_.toString))
    // three-valued edges evaluated exactly: IsNull never matches an
    // emitted row, IsNotNull always does, In and Not compose
    assert(viaDsv2(path).filter(col("lat").isNull).count() == 0)
    assert(viaDsv2(path).filter(col("lat").isNotNull).count() == 4)
    assert(viaDsv2(path)
      .filter(col("vehicle_id").isin(7L, 99L)).count() == 2)
    assert(viaDsv2(path)
      .filter(!col("vehicle_id_str").startsWith("4") ||
        col("ts_ms") > 0L).count() == 4)
    // an expression the source cannot evaluate exactly stays residual
    // and still computes correctly
    assert(viaDsv2(path)
      .filter(abs(col("lat") - 23.7690) < 1e-9).count() == 1)
  }

  test("pushed double equality matches Spark's -0.0 = 0.0 semantics") {
    // a field parsing to -0.0 must pass a pushed `lat = 0.0` exactly like
    // the residual plan would (Spark normalizes -0.0; Double.compare
    // alone would order -0.0 < 0.0 and silently drop the row)
    val path = writeFile(tmpDir, "negzero.csv",
      "2015-02-14 23:51:40+05,42,-0.0,90.3886\n" +
        "2015-02-14 23:51:41+05,43,0.0,90.3886\n" +
        "2015-02-14 23:51:42+05,44,1.5,90.3886")
    val pushedEq = viaDsv2(path).filter(col("lat") === 0.0)
    val scans = pushedEq.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => s
    }
    assert(scans.head.scan.description().contains("lat"),
      "lat = 0.0 did not push")
    assert(pushedEq.count() == 2, "-0.0 row must match a pushed lat = 0.0")
    assert(viaDsv2(path).filter(col("lat").isin(0.0, 1.5)).count() == 3)
    // ordering comparisons also see -0.0 as equal to 0.0, not below it
    assert(viaDsv2(path).filter(col("lat") < 0.0).count() == 0)
    assert(viaDsv2(path).filter(col("lat") >= 0.0).count() == 3)
  }

  test("reported statistics feed the optimizer: sizeInBytes equals the " +
      "summed file length (compression-factor scaled for .gz)") {
    val dir = tmpDir
    val plain = writeFile(dir, "narrow.csv", narrowCsv)
    val plainLen = Files.size(java.nio.file.Paths.get(plain))
    val rel = viaDsv2(plain)
    val stats = rel.queryExecution.optimizedPlan.stats
    assert(stats.sizeInBytes == BigInt(plainLen),
      s"stats ${stats.sizeInBytes} != file $plainLen")

    val gz = dir.resolve("narrow.csv.gz")
    val out = new GZIPOutputStream(Files.newOutputStream(gz))
    out.write(narrowCsv.getBytes(StandardCharsets.UTF_8)); out.close()
    val gzLen = Files.size(gz)
    spark.conf.set("spark.sql.sources.fileCompressionFactor", "4.0")
    try {
      val gstats = viaDsv2(gz.toString).queryExecution.optimizedPlan.stats
      assert(gstats.sizeInBytes == BigInt(gzLen * 4),
        s"gz stats ${gstats.sizeInBytes} != ${gzLen * 4}")
    } finally spark.conf.unset("spark.sql.sources.fileCompressionFactor")
  }

  test("directory paths expand to their files through BOTH ingest " +
      "paths, and an empty zip yields zero rows, not a failure") {
    val dir = tmpDir
    writeFile(dir, "a.csv", narrowCsv)
    writeFile(dir, "b.csv", wideCsv)
    writeFile(dir, "_hidden.csv", narrowCsv) // skipped like spark.read
    val viaDir = viaDsv2(dir.toString)
    assert(viaDir.count() == 6, "4 narrow + 2 wide rows via the directory")
    assert(sortedRows(viaDir) ==
      sortedRows(CsvVehicleReader.read(spark, dir.toString + "/[ab]*")))

    val emptyZip = dir.resolve("empty.zip")
    new ZipOutputStream(Files.newOutputStream(emptyZip)).close()
    assert(viaDsv2(emptyZip.toString).count() == 0)
    assert(CsvVehicleReader.read(spark, emptyZip.toString).count() == 0)
  }

  test("usable from SQL as a catalog table (CREATE TABLE ... USING)") {
    val path = writeFile(tmpDir, "narrow.csv", narrowCsv)
    spark.sql("DROP TABLE IF EXISTS vehicle_pings_dsv2")
    try {
      spark.sql(s"""CREATE TABLE vehicle_pings_dsv2
        |USING `graft-vehicle-csv` OPTIONS (path '$path')""".stripMargin)
      val got = spark.sql(
        """SELECT vehicle_id, count(*) AS n FROM vehicle_pings_dsv2
          |GROUP BY vehicle_id ORDER BY vehicle_id""".stripMargin).collect()
      assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
        Seq((7L, 1L), (42L, 2L), (99L, 1L)))
    } finally spark.sql("DROP TABLE IF EXISTS vehicle_pings_dsv2")
  }
}
