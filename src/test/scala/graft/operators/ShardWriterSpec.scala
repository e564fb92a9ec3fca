package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** The training-shard materialization contract: hive-partitioned by
  * shard, one data file per shard, rows in consumption order within each
  * file, and a lossless round-trip of the packed relation. */
class ShardWriterSpec extends SparkSpec {

  test("packed sequences land as per-shard sorted single-file partitions") {
    val dir = Files.createTempDirectory("graft-shards").toString
    val packed = SparkEntry.queries("q69_seq_pack")(spark, sf0001)
    ShardWriter.write(packed, dir)

    // hive layout: one directory per shard value, one data file inside
    val shardDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("shard=")).sortBy(_.getName)
    assert(shardDirs.length == 8, s"expected 8 shard dirs, got ${shardDirs.length}")
    shardDirs.foreach { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${d.getName} has ${files.length} data files")
    }

    // partition pruning: a shard-scoped read touches one partition only
    val one = spark.read.parquet(dir).filter(col("shard") === 3)
    one.collect()
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(shard"),
      s"shard filter did not prune partitions:\n$plan")

    // within-file order is consumption order (seq_id, offset)
    import spark.implicits._
    for (sh <- 0 until 8) {
      val rows = spark.read.parquet(s"$dir/shard=$sh")
        .select($"seq_id", $"offset").as[(Long, Long)].collect().toSeq
      assert(rows == rows.sortBy(r => (r._1, r._2)),
        s"shard $sh rows not in (seq_id, offset) order")
    }

    // lossless round-trip of the packed relation
    val back = spark.read.parquet(dir)
      .select("doc_id", "shard", "n_tokens", "seq_id", "offset")
      .collect().map(_.toSeq).toSet
    val orig = packed
      .select(col("doc_id"), col("shard"), col("n_tokens"), col("seq_id"), col("offset"))
      .collect().map(_.toSeq).toSet
    assert(back == orig)
  }
}
