package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `BINARY` columns
  * with typed metadata, plus decode/feature-extract/resize/frame-sample
  * stages. The Spark-side shape — schema, partition-preserving batch
  * transforms, deterministic fan-out — is real and tested; the actual codec
  * calls are STUBBED (no image/audio libraries in this container) behind
  * [[MediaCodec]], which derives deterministic fake outputs from the bytes so
  * tests are exact.
  */
object Multimodal {

  /** media table schema: one row per asset. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_frames", IntegerType))))))

  final case class MediaMeta(format: String, width: Int, height: Int, n_frames: Int)
  final case class Media(media_id: Long, content: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(media_id: Long, byte_len: Long, features: Seq[Double])
  final case class Frame(media_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** STUB decoder: a real build would link an image/audio codec here. The
    * fake is a pure function of the bytes (md5-derived), so the pipeline
    * around it — batching, schema, shuffle boundaries — is exactly testable.
    */
  object MediaCodec {
    def decodeFeatures(content: Array[Byte], dim: Int): Array[Double] = {
      // ??? real codec goes here; deterministic fake below.
      val digest = java.security.MessageDigest.getInstance("MD5").digest(content)
      Array.tabulate(dim)(i => (digest(i % digest.length) & 0xff) / 255.0)
    }

    def resize(content: Array[Byte], w: Int, h: Int): Array[Byte] =
      // ??? real resample goes here; fake keeps a size-proportional prefix.
      content.take(math.max(1, math.min(content.length, w * h)))
  }

  /** Demo media table derived from the documents table (text bytes as the
    * opaque payload) — stands in for a parquet of real assets.
    */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("content"),
      struct(
        lit("fake/rgb8").as("format"),
        (col("n_chars") % 64 + 1).cast("int").as("width"),
        (col("n_chars") % 48 + 1).cast("int").as("height"),
        (col("n_chars") % 16 + 1).cast("int").as("n_frames")).as("meta"))

  /** Feature extraction: batch-at-a-time over partitions (the Scala analog of
    * `mapInPandas` — one codec invocation per row, vectorizable per batch,
    * partitioning preserved, no shuffle).
    */
  def extractFeatures(spark: SparkSession, media: DataFrame, dim: Int = 8): Dataset[MediaFeatures] = {
    import spark.implicits._
    // null assets are SKIPPED (a real pipeline dead-letters them): the typed
    // decode would otherwise NPE the whole task on one null payload
    media.select("media_id", "content").where(col("content").isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        MediaFeatures(id, bytes.length.toLong,
          MediaCodec.decodeFeatures(bytes, dim).toIndexedSeq)
      })
  }

  /** Frame sampling: fan one asset out to ≤ maxFrames rows (UDTF shape).
    * Deterministic stride over n_frames; the per-frame payload is the stub
    * codec's slice.
    */
  def sampleFrames(spark: SparkSession, media: DataFrame, maxFrames: Int = 4): Dataset[Frame] = {
    import spark.implicits._
    media.select(col("media_id"), col("content"), col("meta.n_frames").as("n_frames"))
      .where(col("content").isNotNull) // null assets skipped, as in extractFeatures
      .as[(Long, Array[Byte], Int)]
      .flatMap { case (id, bytes, nFrames) =>
        val stride = math.max(1, nFrames / maxFrames)
        (0 until nFrames by stride).take(maxFrames).map { f =>
          val chunk = math.max(1, bytes.length / math.max(1, nFrames))
          Frame(id, f, bytes.slice(f * chunk, (f + 1) * chunk))
        }
      }
  }

  /** Resize stage: metadata-driven, partition-preserving. */
  def resizeAll(spark: SparkSession, media: DataFrame, w: Int, h: Int): DataFrame = {
    import spark.implicits._
    media.select("media_id", "content").where(col("content").isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => (id, MediaCodec.resize(bytes, w, h)) })
      .toDF("media_id", "resized")
  }
}
