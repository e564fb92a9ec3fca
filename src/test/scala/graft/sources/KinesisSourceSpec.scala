package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.streaming.{InMemoryKinesis, KinesisRecord, KinesisSink, ProtoEnvelope, VehicleLocation, VehicleMessage}

/** The DSv2 Kinesis SOURCE (`readStream.format("graft-kinesis-source")`):
  * shard-offset checkpointed consumption of the same streams the sink
  * produces — decode parity, per-shard sequence resume across restarts
  * (the stretch-#7 "Done" criterion), admission control, starting
  * positions, and loud plan-time validation. */
class KinesisSourceSpec extends SparkSpec {

  private def put(kin: InMemoryKinesis, sourceId: Long,
      msgs: (Long, Long)*): Unit =
    new KinesisSink("vehicles", kin).sendMessages(sourceId,
      msgs.map { case (vid, ts) =>
        VehicleMessage(vid, Seq(VehicleLocation(1.5, 2.5, ts)))
      })

  private def drain(name: String, ckpt: String,
      extra: (String, String)*): Seq[(Int, Long, Long, Long, Long)] = {
    val rows = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Long, Long, Long, Long)]
    val r = spark.readStream.format("graft-kinesis-source")
      .option("stream", "vehicles").option("transport", name)
    val q = extra.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }
      .load()
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: DataFrame, _: Long) =>
        val got = b.collect().map(x => (x.getInt(0), x.getLong(1),
          x.getLong(2), x.getLong(3), x.getLong(6)))
        rows.synchronized { rows ++= got }
        ()
      }.start()
    q.awaitTermination()
    rows.toSeq
  }

  test("e2e + resume: sink-produced records decode back to pings; a " +
      "second drain from the same checkpoint reads ONLY what arrived " +
      "in between (per-shard sequence resume)") {
    val name = "t-kinesis-src"
    InMemoryKinesis.reset(name)
    val kin = new InMemoryKinesis(numShards = 4, name = name)
    KinesisTransports.register(name, () => new InMemoryKinesis(4, name))
    put(kin, sourceId = 7L, (42L, 1000L), (43L, 1001L), (44L, 1002L))

    val ckpt = Files.createTempDirectory("graft-kinsrc-ckpt").toString
    val first = drain(name, ckpt)
    assert(first.map(r => (r._4, r._5)).sorted ==
      Seq((42L, 1000L), (43L, 1001L), (44L, 1002L)).sorted)
    assert(first.forall(_._3 == 7L), "source_id lost in decode")
    // rows carry the transport's real shard routing
    assert(first.forall(r => kin.shardOf(r._4.toString) == r._1),
      "row shard diverges from the transport's routing")

    // append more records, drain the SAME checkpoint: only the delta
    put(kin, sourceId = 7L, (42L, 2000L), (45L, 2001L))
    val second = drain(name, ckpt)
    assert(second.map(r => (r._4, r._5)).sorted ==
      Seq((42L, 2000L), (45L, 2001L)).sorted,
      s"resume re-read or skipped: $second")

    // a third drain with nothing new reads nothing
    assert(drain(name, ckpt).isEmpty)
  }

  test("maxRecordsPerTrigger bounds each micro-batch; all records still " +
      "arrive across batches in per-shard order") {
    val name = "t-kinesis-src-adm"
    InMemoryKinesis.reset(name)
    val kin = new InMemoryKinesis(numShards = 2, name = name)
    KinesisTransports.register(name, () => new InMemoryKinesis(2, name))
    put(kin, sourceId = 3L, (0 until 20).map(i => (i.toLong, 100L + i)): _*)

    val batches = scala.collection.mutable.ArrayBuffer.empty[Int]
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
    val q = spark.readStream.format("graft-kinesis-source")
      .option("stream", "vehicles").option("transport", name)
      .option("maxRecordsPerTrigger", "6")
      .load()
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        Files.createTempDirectory("graft-kinsrc-adm").toString)
      .foreachBatch { (b: DataFrame, _: Long) =>
        val got = b.collect().map(x => (x.getInt(0), x.getLong(1), x.getLong(3)))
        rows.synchronized { rows ++= got; batches += got.length }
        ()
      }.start()
    q.awaitTermination()
    assert(rows.map(_._3).sorted == (0L until 20L),
      s"lost/duplicated records across batches: ${rows.size}")
    assert(batches.forall(_ <= 6), s"admission exceeded: $batches")
    assert(batches.size >= 4, s"expected several micro-batches: $batches")
    // per-shard seq strictly increasing in arrival order
    rows.groupBy(_._1).values.foreach { rs =>
      assert(rs.map(_._2) == rs.map(_._2).sorted)
    }
  }

  test("startingPosition=latest skips the backlog and reads only " +
      "post-start arrivals") {
    val name = "t-kinesis-src-latest"
    InMemoryKinesis.reset(name)
    val kin = new InMemoryKinesis(numShards = 2, name = name)
    KinesisTransports.register(name, () => new InMemoryKinesis(2, name))
    put(kin, sourceId = 5L, (1L, 10L), (2L, 11L)) // backlog

    val ckpt = Files.createTempDirectory("graft-kinsrc-latest").toString
    assert(drain(name, ckpt, "startingPosition" -> "latest").isEmpty,
      "latest must skip the pre-start backlog")
    put(kin, sourceId = 5L, (3L, 12L))
    val next = drain(name, ckpt, "startingPosition" -> "latest")
    assert(next.map(_._4) == Seq(3L))
  }

  test("start-time validation: unregistered transport, producer-only " +
      "transport, and a bad startingPosition all fail loudly at query " +
      "start (scan-builder time), never per-task") {
    // streaming load() only creates the table; the scan builder — where
    // every option is validated — runs at query start
    def failsAtStart(transport: String, msgPart: String,
        extra: (String, String)*): Unit = {
      val r = spark.readStream.format("graft-kinesis-source")
        .option("stream", "vehicles").option("transport", transport)
      val df = extra.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }
        .load()
      val e = intercept[Exception] {
        val q = df.writeStream
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation",
            Files.createTempDirectory("graft-kinsrc-bad").toString)
          .foreachBatch { (_: DataFrame, _: Long) => () }
          .start()
        q.awaitTermination()
      }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(_.contains(msgPart)),
        s"no message names '$msgPart': ${messages(e).mkString(" | ")}")
    }

    failsAtStart("never-registered", "never-registered")

    KinesisTransports.register("producer-only",
      () => new graft.streaming.KinesisTransport {
        override def putRecords(stream: String,
            records: Seq[KinesisRecord]): Seq[Boolean] = records.map(_ => true)
      })
    failsAtStart("producer-only", "KinesisConsumerTransport")

    KinesisTransports.register("ok-consumer", () => new InMemoryKinesis(1, "ok-c"))
    failsAtStart("ok-consumer", "startingPosition",
      "startingPosition" -> "yesterday")
  }

  test("multi-location envelopes (the HTTP chunking shape) expand to one " +
      "row per location under the record's seq") {
    val name = "t-kinesis-src-multi"
    InMemoryKinesis.reset(name)
    val kin = new InMemoryKinesis(numShards = 1, name = name)
    KinesisTransports.register(name, () => new InMemoryKinesis(1, name))
    val envelope = ProtoEnvelope.encodeEnvelope(9L, Seq(
      VehicleMessage(70L, Seq(VehicleLocation(1.0, 2.0, 500L),
        VehicleLocation(1.1, 2.1, 501L))),
      VehicleMessage(71L, Seq(VehicleLocation(3.0, 4.0, 502L)))))
    kin.putRecords("vehicles", Seq(KinesisRecord("70", envelope)))

    val got = drain(name,
      Files.createTempDirectory("graft-kinsrc-multi").toString)
    assert(got.map(r => (r._4, r._5)).sorted ==
      Seq((70L, 500L), (70L, 501L), (71L, 502L)))
    assert(got.map(_._2).distinct == Seq(0L), "one record ⇒ one seq")
  }
}
