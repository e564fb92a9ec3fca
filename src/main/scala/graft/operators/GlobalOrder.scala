package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.{ColumnBridge => CB}

/** Exact global row_number over a total order WITHOUT the single-partition
  * window Spark plans for `row_number() OVER (ORDER BY ...)` — that plan
  * moves every row to one task and is the OOM/straggler cliff at scale.
  *
  * Shape: range-partition by the sort key, snapshot the partitioned
  * layout to scratch parquet, rank each range in parallel with a
  * range-local window, and add per-range offsets. The snapshot is load-
  * bearing for correctness, not a cache: range boundaries come from a
  * per-execution SAMPLE, so the counts job and the ranking job would see
  * different partitionings if each re-evaluated the plan — the snapshot
  * pins one layout for both. Driver state is one row count per range
  * (numPartitions values), never data.
  */
object GlobalOrder {

  /** @return (relation with `rnCol` = 1-based global rank, total rows).
    *   Sort keys must be a total order (include a unique tiebreaker) or
    *   ranks within ties are partition-dependent. The internal snapshot
    *   dir lives until JVM exit (the returned relation reads it lazily);
    *   callers that loop should use [[rowNumberPath]], which releases it. */
  def withRowNumber(df: DataFrame, rnCol: String, sortCols: Column*): (DataFrame, Long) = {
    val (ranked, total, _) = rank(df, rnCol, sortCols)
    (ranked, total)
  }

  /** [[withRowNumber]] materialized: writes the ranked relation to its own
    * scratch dir and releases the intermediate snapshot (whose only
    * consumer was that write). For callers that memoize or loop — leaves
    * ONE dir per call instead of a lazily-pinned intermediate.
    * @return (parquet path of the ranked relation, total rows) */
  def rowNumberPath(df: DataFrame, rnCol: String, sortCols: Column*): (String, Long) = {
    val (ranked, total, snapPath) = rank(df, rnCol, sortCols)
    val out = Scratch.materializePath(ranked, "global-rank-out")
    Scratch.release(snapPath)
    (out, total)
  }

  private def rank(df: DataFrame, rnCol: String, sortCols: Seq[Column]): (DataFrame, Long, String) = {
    val spark = df.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val snapPath = Scratch.materializePath(
      df.repartitionByRange(parts, sortCols: _*)
        .withColumn("__range_id", spark_partition_id()),
      "global-rank")
    val snap = graft.Tables.parquet(spark, snapPath)
    val counts = snap.groupBy(col("__range_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val total = counts.map(_._2).sum
    val offsets = counts.map(_._1).zip(counts.map(_._2).scanLeft(0L)(_ + _)).toMap
    // per-range offsets come in as a broadcast-joined side relation, NOT
    // a CASE chain: a foldLeft of when/otherwise has nesting depth =
    // partition count, which at cluster-scale configs (1000+ range
    // partitions) exceeds codegen method-size limits and deoptimizes —
    // a BroadcastHashJoin on numPartitions rows is O(1) plan depth at
    // any partition count and stays in whole-stage codegen
    import spark.implicits._
    val offDf = counts.map { case (pid, _) => (pid, offsets(pid)) }.toSeq
      .toDF("__range_id", "__range_off")
    val ranked = snap
      .withColumn("__range_rn",
        row_number().over(
          Window.partitionBy(col("__range_id")).orderBy(sortCols: _*)))
      .join(broadcast(offDf), Seq("__range_id"))
      .withColumn(rnCol, col("__range_rn") + col("__range_off"))
      .drop("__range_id", "__range_rn", "__range_off")
    (ranked, total, snapPath)
  }

  /** Exact floor-division of a non-negative long column by a positive
    * long constant — `a div b`, never a double `Divide`: floating-point
    * quotients within 1 ulp of an integer floor to the wrong bucket once
    * ranks pass 2^52, which is exactly the regime a 100 TB global order
    * lives in. */
  private def ldiv(a: Column, b: Long): Column =
    CB.column(new IntegralDivide(CB.expression(a), CB.expression(lit(b))))

  /** Exact `ntile(n)` bucket from a global rank: the first `total % n`
    * buckets get `total/n + 1` rows, the rest `total/n` — the same split
    * every SQL engine's ntile produces over the same total order. */
  def ntileFromRank(rn: Column, total: Long, n: Int): Column = {
    val q = total / n
    val r = total % n
    val smallDiv = math.max(q, 1L) // unused when q=0 (every rank <= r*(q+1))
    val rnL = rn.cast("long")
    (when(rnL <= lit(r * (q + 1)), ldiv(rnL - 1, q + 1))
      .otherwise(lit(r) + ldiv(rnL - lit(r * (q + 1)) - 1, smallDiv))
      + 1).cast("int")
  }
}
