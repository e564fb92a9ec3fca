package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Materializes packed training sequences (the q69/q72 output shape) as
  * the on-disk shard layout a training job actually reads:
  *
  *  - hive-partitioned by `shard` → each trainer rank reads only its
  *    directory, and partition pruning serves any shard-scoped query;
  *  - ONE file per shard (`repartition(shard)` then `partitionBy`), so a
  *    rank's input is a single sequential stream, not a file-listing;
  *  - rows sorted by (seq_id, offset) WITHIN each shard file — the order
  *    sequences are consumed in, so training reads are pure streaming
  *    scans with no shuffle or sort at read time.
  *
  * At 100 TB this is the same plan with more shards (the packing layer
  * already keys by shard), plus `maxRecordsPerFile` if a single shard
  * outgrows one object-store part.
  */
object ShardWriter {

  def write(packed: DataFrame, dir: String): Unit =
    packed
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("seq_id"), col("offset"))
      .write
      .partitionBy("shard")
      .mode("overwrite")
      .parquet(dir)
}
