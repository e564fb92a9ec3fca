package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support (BASELINE.json north_star): image/audio/video
  * travel as opaque `binary` columns with a typed metadata struct, exactly
  * like a 100 TB training-data lake stores them. The Spark-side plumbing —
  * schema, batched per-partition decode, feature/resize/frame-sample
  * signatures — is real and tested; the codec itself is STUBBED with a
  * deterministic byte-level fake because this container ships no
  * image/audio libraries (prompt directive). Swapping [[StubCodec]] for a
  * real JNI/library decoder changes no query code.
  *
  * Execution shape: decode runs via `mapPartitions` over Arrow-sized row
  * groups, i.e. one codec instance per partition, no per-row JNI setup —
  * the Scala analog of Python's `mapInPandas` batch contract.
  */
object Multimodal {

  /** media(id, kind, payload binary, meta{width,height,sample_rate,n_frames}) */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("n_frames", IntegerType))))))

  /** Deterministic synthetic media table derived from `documents` — each
    * doc's text bytes become the opaque payload (stand-in for real codec
    * output), metadata derived arithmetically. Lets every downstream op be
    * exercised and oracled without real media files. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        (pmod(col("doc_id"), lit(64)) + 16).cast("int").as("width"),
        (pmod(col("doc_id"), lit(48)) + 16).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        (pmod(col("n_chars"), lit(100)) + 1).cast("int").as("n_frames")).as("meta"))

  /** STUB decode: a real implementation hands `payload` to an image/audio
    * codec here. The fake is deterministic — fixed-length feature vector of
    * byte-histogram moments — so tests and oracles can pin outputs. The
    * `mapPartitions` batch shape (iterator-in/iterator-out, one codec per
    * partition) is the real contract a JNI decoder needs.
    */
  def decodeFeatures(media: DataFrame, dim: Int = 8): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val enc = org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaLong,
      org.apache.spark.sql.Encoders.BINARY)
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])](enc)
      .mapPartitions { rows =>
        // one "codec" per partition (where a real decoder would init)
        rows.map { case (id, payload) =>
          val feats = StubCodec.decode(payload, dim)
          (id, feats)
        }
      }
      .toDF("media_id", "features")
  }

  /** Resize stub: declarative metadata rewrite + payload passthrough (a
    * real resize transforms payload bytes; shape/partitioning identical). */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("meta",
      struct(lit(w).as("width"), lit(h).as("height"),
        col("meta.sample_rate").as("sample_rate"),
        col("meta.n_frames").as("n_frames")))

  /** Frame-sample stub: every k-th frame index per video row, exploded —
    * the array-explode shape real frame extraction produces. */
  def sampleFrames(media: DataFrame, everyK: Int): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0), col("meta.n_frames") - 1, lit(everyK)))
          .as("frame_idx"))
}

/** Deterministic stand-in for a media codec (see [[Multimodal]] scaladoc).
  * Real decode would replace this object wholesale. */
object StubCodec {
  /** Byte-histogram moment features: mean, variance, and bucketed byte
    * frequencies — pure function of payload bytes. */
  def decode(payload: Array[Byte], dim: Int): Array[Float] = {
    require(dim >= 3, s"feature dim must be >= 3 (mean, stddev, >=1 bucket); got $dim")
    val out = new Array[Float](dim)
    if (payload.isEmpty) return out
    var sum = 0.0
    payload.foreach(b => sum += (b & 0xff))
    val mean = sum / payload.length
    var varSum = 0.0
    payload.foreach { b => val d = (b & 0xff) - mean; varSum += d * d }
    out(0) = mean.toFloat
    out(1) = math.sqrt(varSum / payload.length).toFloat
    var i = 0
    while (i < payload.length) {
      val bucket = 2 + ((payload(i) & 0xff) * (dim - 2)) / 256
      out(bucket) += 1f
      i += 1
    }
    var j = 2
    while (j < dim) { out(j) /= payload.length.toFloat; j += 1 }
    out
  }
}
