package graft.multimodal

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Multimodal plumbing: binary payload + typed metadata schema, batched
  * stub decode, resize/frame-sample shapes (north_star "multimodal
  * columns"). */
class MultimodalSpec extends SparkSpec {

  private lazy val media =
    Multimodal.mediaFromDocuments(Tables.documents(spark, sf0001)).cache()

  test("media table has binary payload + typed metadata struct") {
    val schema = media.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "struct")
    assert(media.count() == 500)
    val kinds = media.select(countDistinct(col("kind"))).collect()(0).getLong(0)
    assert(kinds == 3)
  }

  test("stub decode: deterministic fixed-dim features, one per row") {
    val feats = Multimodal.decodeFeatures(media, dim = 8)
    assert(feats.count() == 500)
    val row = feats.orderBy(col("media_id")).first()
    val v = row.getSeq[Float](1)
    assert(v.length == 8)
    // deterministic: re-running decode yields identical features
    val again = Multimodal.decodeFeatures(media, dim = 8)
      .orderBy(col("media_id")).first().getSeq[Float](1)
    assert(v == again)
    // mean byte of lowercase text is within sane ascii range
    assert(v.head > 32f && v.head < 127f)
  }

  test("resize rewrites metadata, preserves payload") {
    val resized = Multimodal.resize(media, 224, 224)
    val r = resized.select(col("meta.width"), col("meta.height")).distinct().collect()
    assert(r.length == 1 && r(0).getInt(0) == 224 && r(0).getInt(1) == 224)
    assert(resized.agg(sum(length(col("payload")))).collect()(0).getLong(0) ==
      media.agg(sum(length(col("payload")))).collect()(0).getLong(0))
  }

  test("frame sampling explodes every k-th frame for videos only") {
    val frames = Multimodal.sampleFrames(media, everyK = 10)
    val kinds = frames.join(media, "media_id").select(col("kind")).distinct().collect()
    assert(kinds.map(_.getString(0)).toSeq == Seq("video"))
    // a video with n_frames=N yields ceil(N/10) sampled frames
    val one = media.filter(col("kind") === "video")
      .select(col("media_id"), col("meta.n_frames")).first()
    val n = frames.filter(col("media_id") === one.getLong(0)).count()
    assert(n == (one.getInt(1) + 9) / 10)
  }
}
