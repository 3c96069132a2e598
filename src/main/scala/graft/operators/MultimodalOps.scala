package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Multimodal-column plumbing for a training-data pipeline: media as
  * opaque `binary` columns with typed metadata, and the
  * decode / feature-extract / resize / frame-sample stages.
  *
  * The container has no image/audio codecs, so the DECODE STEP IS
  * STUBBED with a deterministic fake (clearly marked below); everything
  * Spark-side — schema, batching, partitioning, the shape of the
  * per-batch UDF contract — is real and tested. On a cluster the stub
  * body is replaced by the actual codec call; the plan is unchanged.
  *
  * Scale notes: media rows are kilobytes-to-megabytes; the pipeline
  * keeps bytes in a single column, never in the shuffle key, and all
  * derived features are computed map-side (zero shuffle until an
  * explicit aggregation).
  */
object MultimodalOps {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("bytes", BinaryType, nullable = false),
    StructField("meta", MapType(StringType, StringType), nullable = false)))

  /** Synthesizes a deterministic media table from `documents` (the
    * text bytes stand in for encoded media payloads). */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("bytes"),
      map(lit("source"), col("source"), lit("n_bytes"),
        col("n_chars").cast("string")).as("meta"))

  /** STUB — decode(image bytes) → (width, height, channels).
    * A real deployment decodes via an image codec in a per-partition
    * batch; here dimensions are derived deterministically from the
    * payload hash so the plumbing (schema, nullability, batch shape)
    * is exercised end-to-end. */
  def decodeImageStub(media: DataFrame): DataFrame =
    media.withColumn("width", (pmod(xxhash64(col("bytes")), lit(1920)) + 32).cast("int"))
      .withColumn("height", (pmod(xxhash64(col("bytes"), lit(1)), lit(1080)) + 32).cast("int"))
      .withColumn("channels", lit(3))

  /** STUB — resize to fit (maxW, maxH) preserving aspect ratio; the
    * arithmetic is real, only the pixel transform is absent. */
  def resizeStub(decoded: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val scale = least(lit(maxW.toDouble) / col("width"),
      lit(maxH.toDouble) / col("height"), lit(1.0))
    decoded
      .withColumn("out_width", floor(col("width") * scale).cast("int"))
      .withColumn("out_height", floor(col("height") * scale).cast("int"))
  }

  /** STUB — sample up to `n` frame offsets, uniformly spaced over a
    * fake duration derived from the payload size. */
  def frameSampleStub(media: DataFrame, n: Int = 8): DataFrame =
    media.filter(col("kind") === "video")
      .withColumn("duration_ms", (length(col("bytes")) * 40).cast("long"))
      .withColumn("frame_offsets_ms",
        transform(sequence(lit(0), lit(n - 1)),
          i => (i * col("duration_ms") / n).cast("long")))

  /** STUB — feature extraction: bytes → dense Array[Float] embedding.
    * Deterministic hash-projection stands in for a model forward pass;
    * the output schema/partitioning is what a real encoder returns. */
  def featureExtractStub(media: DataFrame, dim: Int = 64): DataFrame =
    media.withColumn("embedding",
      transform(sequence(lit(0), lit(dim - 1)),
        i => (pmod(xxhash64(col("bytes"), i), lit(2000L)).cast("double") / 1000.0 - 1.0)
          .cast("float")))

  /** Full pipeline query: media → decode → resize → features, grouped
    * stats per kind (driver-checkable rows-only). */
  def pipelineSummary(s: SparkSession, d: String): DataFrame = {
    val media = mediaTable(s, d)
    val img = resizeStub(decodeImageStub(media), 512, 512)
    val feats = featureExtractStub(media)
    img.select("media_id", "kind", "out_width", "out_height")
      .join(feats.select(col("media_id"),
        aggregate(col("embedding"), lit(0.0), (a, x) => a + x * x).as("feat_norm_sq")),
        "media_id")
      .groupBy("kind")
      .agg(count(lit(1)).as("cnt"),
        sum(col("out_width")).as("sum_w"),
        sum(col("out_height")).as("sum_h"),
        round(sum(col("feat_norm_sq")), 4).as("sum_norm"))
      .orderBy("kind")
  }
}
