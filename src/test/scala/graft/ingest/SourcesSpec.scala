package graft.ingest

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Source/sink format coverage beyond parquet+CSV-ingest: ORC and
  * headered-CSV round-trips, and parquet schema evolution (mergeSchema) —
  * the format surface a lake at scale actually migrates across. */
class SourcesSpec extends SparkSpec {

  private lazy val nation = Tables.nation(spark, sf0001)

  test("ORC round-trip preserves rows and schema") {
    val dir = Files.createTempDirectory("graft-orc").toString
    nation.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema == nation.schema)
    assert(back.orderBy("n_nationkey").collect().map(_.toSeq).toSeq ==
      nation.orderBy("n_nationkey").collect().map(_.toSeq).toSeq)
  }

  test("headered CSV round-trip with explicit schema") {
    val dir = Files.createTempDirectory("graft-csvh").toString
    nation.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").schema(nation.schema).csv(dir)
    assert(back.orderBy("n_nationkey").collect().map(_.toSeq).toSeq ==
      nation.orderBy("n_nationkey").collect().map(_.toSeq).toSeq)
  }

  test("parquet schema evolution: mergeSchema unions old and new columns") {
    val dir = Files.createTempDirectory("graft-evolve").toString
    nation.select("n_nationkey", "n_name")
      .write.mode("overwrite").parquet(dir + "/v=1")
    nation.select(col("n_nationkey"), col("n_name"), col("n_regionkey"),
        lit("eu-west").as("dc"))
      .write.mode("overwrite").parquet(dir + "/v=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet ==
      Set("n_nationkey", "n_name", "n_regionkey", "dc", "v"))
    assert(merged.count() == 50) // both generations readable
    // old-generation rows surface the new columns as nulls
    assert(merged.filter(col("v") === 1 && col("dc").isNull).count() == 25)
  }
}
