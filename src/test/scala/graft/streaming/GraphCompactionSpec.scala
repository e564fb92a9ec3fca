package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Graph-delta compaction (r13 verdict ask #2): folding
  * [[StreamIngest.toGraphDeltaSink]]'s landed `batch_id=*` deltas into
  * the landed adjacency must reproduce q171's one-shot merge-on-read
  * splice ROW FOR ROW (the q155/q161 compaction-equality discipline) —
  * including after a crash-replay restart, where the sink's
  * overwrite-per-batch idempotence feeds the fold identical rows. */
class GraphCompactionSpec extends SparkSpec {

  import spark.implicits._
  private implicit def sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  private def rows4(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))

  test("compact-then-serve == q171 merge-on-read splice, row for row, " +
      "across a micro-batch split AND a crash-replay restart; " +
      "compaction is idempotent") {
    val batchRows = graft.queries.LlmOps.derivedGraphBatch(spark, sf0001)
      .collect().map(r => (r.getLong(0),
        r.getSeq[Double](1).toArray, r.getSeq[Long](2).toArray))
    assert(batchRows.length >= 2, "derived batch too small for a 2-way split")
    val (b1, b2) = batchRows.splitAt(batchRows.length / 2)
    val out = Files.createTempDirectory("graph-compact-out").toString
    val ckpt = Files.createTempDirectory("graph-compact-ckpt").toString
    val input = MemoryStream[(Long, Array[Double], Array[Long])]
    def runIncrement(rows: Seq[(Long, Array[Double], Array[Long])]): Unit = {
      input.addData(rows: _*)
      val q = StreamIngest.toGraphDeltaSink(spark,
          input.toDF().toDF("nid", "ne", "vq"), sf0001, out)
        .option("checkpointLocation", ckpt)
        .start()
      q.awaitTermination()
    }
    runIncrement(b1.toSeq)
    // crash simulation: the sink landed batch 0 but the engine died
    // before writing the checkpoint commit marker — exactly the window
    // Structured Streaming replays. The restart must overwrite
    // batch_id=0 with identical rows (idempotent sink), then process b2.
    val commit0 = Paths.get(ckpt, "commits", "0")
    assert(Files.exists(commit0), "expected a commit marker for batch 0")
    Files.delete(commit0)
    // the local checksum FS keeps a .crc sidecar; a real HDFS/S3 crash
    // loses both, so drop it too or the replay's rename-over fails
    Files.deleteIfExists(Paths.get(ckpt, "commits", ".0.crc"))
    runIncrement(b2.toSeq)
    assert(Files.exists(commit0), "restart should have re-committed batch 0")

    // the landed graph (build of record) and the one-shot splice
    val g = graft.queries.LlmOps.q168(spark, sf0001)
    val oneShot = rows4(graft.queries.LlmOps.q171(spark, sf0001)).toSet

    val compacted = rows4(
      StreamIngest.compactGraphDeltas(spark, g, out)).toSet
    assert(compacted == oneShot,
      s"compaction diverges from the one-shot splice: " +
        s"missing=${(oneShot -- compacted).take(3)} " +
        s"extra=${(compacted -- oneShot).take(3)}")
    // non-vacuous: new nodes present and at least one old node re-ranked
    assert(compacted.exists(_._1 < 0), "no new-node edges after compaction")
    val gRows = rows4(g).toSet
    assert(compacted.exists(r => r._1 >= 0 && !gRows(r)),
      "no old node re-ranked - the reverse-merge leg is vacuous here")
    // idempotent: compaction is a pure function of (graph, deltas)
    val again = rows4(
      StreamIngest.compactGraphDeltas(spark, g, out)).toSet
    assert(again == compacted)

    // LAYER 1 (r19): the same stream run landed kind="new1"/"rev1"
    // deltas for the batch's layer-1 members; folding them into the
    // LANDED layer-1 adjacency must equal the one-shot q188 splice —
    // the whole hierarchical index is maintained on the admission path
    val (l1Path, _, _) = graft.queries.LlmOps.knnLayer1State(spark, sf0001)
    val l1g = spark.read.parquet(l1Path)
    val oneShot1 = rows4(graft.queries.LlmOps.q188(spark, sf0001)).toSet
    val compacted1 = rows4(
      StreamIngest.compactLayer1Deltas(spark, l1g, out)).toSet
    assert(compacted1 == oneShot1,
      s"layer-1 compaction diverges from the one-shot q188 splice: " +
        s"missing=${(oneShot1 -- compacted1).take(3)} " +
        s"extra=${(compacted1 -- oneShot1).take(3)}")
    assert(compacted1.exists(_._1 < 0),
      "no new layer-1 node edges after compaction — vacuous " +
        "(the derived batch must contain a nid % 8 == 0 member)")
    val again1 = rows4(
      StreamIngest.compactLayer1Deltas(spark, l1g, out)).toSet
    assert(again1 == compacted1)
  }
}
