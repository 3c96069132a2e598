package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** 32-bit integer from 8 hex chars of the payload md5 (offset is
    * 1-based). One md5 per row feeds every derived fake — and because
    * the slices are plain hex arithmetic, DuckDB reproduces them
    * bit-for-bit (same trick as TextOps.stratifiedSample), which is
    * what lets the whole stubbed pipeline carry a full oracle. */
  private def mdSlice(bytes: Column, off: Int): Column =
    conv(substring(md5(bytes), off, 8), 16, 10).cast("bigint")

  /** STUB — decode(image bytes) → (width, height, channels).
    * A real deployment decodes via an image codec in a per-partition
    * batch; here dimensions are derived deterministically from the
    * payload md5 so the plumbing (schema, nullability, batch shape)
    * is exercised end-to-end AND the values are engine-portable. */
  def decodeImageStub(media: DataFrame): DataFrame =
    media.withColumn("width", (mdSlice(col("bytes"), 1) % 1920 + 32).cast("int"))
      .withColumn("height", (mdSlice(col("bytes"), 9) % 1080 + 32).cast("int"))
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

  /** Per-element integer level of the fake embedding: one 32-bit md5
    * slice affinely spread per dimension (the q26 one-digest trick),
    * k_i ∈ [0, 2000). The float embedding is k_i/1000 − 1. */
  private def featLevel(h: Column, i: Column): Column =
    (h * (i * 2 + 1) + i * 7919) % 2000

  /** STUB — feature extraction: bytes → dense Array[Float] embedding.
    * Deterministic md5-projection stands in for a model forward pass;
    * the output schema/partitioning is what a real encoder returns. */
  def featureExtractStub(media: DataFrame, dim: Int = 64): DataFrame =
    media.withColumn("__h", mdSlice(col("bytes"), 17))
      .withColumn("embedding",
        transform(sequence(lit(0L), lit(dim - 1L)),
          i => (featLevel(col("__h"), i).cast("double") / 1000.0 - 1.0)
            .cast("float")))
      .drop("__h")

  /** Exact-integer squared norm of the fake embedding, scaled by 10⁶:
    * Σ (k_i − 1000)² over the same integer levels the float embedding
    * is built from — BIGINT on both engines, so the pipeline summary
    * is hash-checkable with no floating-point accumulation order in
    * sight. */
  def featNormSqScaled(media: DataFrame, dim: Int = 64): DataFrame =
    media.withColumn("__h", mdSlice(col("bytes"), 17))
      .select(col("media_id"),
        aggregate(sequence(lit(0L), lit(dim - 1L)), lit(0L),
          (acc, i) => acc +
            (featLevel(col("__h"), i) - 1000L) * (featLevel(col("__h"), i) - 1000L))
          .as("norm_sq_scaled"))

  /** Full pipeline query: media → decode → resize → features, grouped
    * stats per kind. Every aggregate is an exact integer (dimensions
    * from md5 slices, norms over scaled integer levels), so the paired
    * DuckDB oracle matches bit-for-bit — the decode/encode bodies stay
    * stubs, but the entire Spark plumbing around them is oracle-gated. */
  def pipelineSummary(s: SparkSession, d: String): DataFrame = {
    val media = mediaTable(s, d)
    // one pass: dims, resize, and norm are all per-row functions of the
    // payload md5, so the whole query is map-only until the final
    // groupBy — no self-join, one md5 per row
    resizeStub(decodeImageStub(media), 512, 512)
      .withColumn("__h", mdSlice(col("bytes"), 17))
      .select(col("kind"), col("out_width"), col("out_height"),
        aggregate(sequence(lit(0L), lit(63L)), lit(0L),
          (acc, i) => acc +
            (featLevel(col("__h"), i) - 1000L) * (featLevel(col("__h"), i) - 1000L))
          .as("norm_sq_scaled"))
      .groupBy("kind")
      .agg(count(lit(1)).as("cnt"),
        sum(col("out_width")).as("sum_w"),
        sum(col("out_height")).as("sum_h"),
        sum(col("norm_sq_scaled")).as("sum_norm_sq"))
      .orderBy("kind")
  }

  /** DuckDB rendering of [[pipelineSummary]] — the md5-hex slices are
    * recovered with the strpos polynomial; resize runs the identical
    * IEEE-double least/floor arithmetic. */
  def pipelineOracleSql(dim: Int = 64): String = {
    def hexPoly(off: Int): String = OracleSql.hexPoly("h", off, 8)
    s"""WITH m AS (
       |  SELECT doc_id AS media_id,
       |    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
       |      WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
       |    md5(text) AS h
       |  FROM documents),
       |dims AS (
       |  SELECT media_id, kind,
       |    (${hexPoly(1)}) % 1920 + 32 AS width,
       |    (${hexPoly(9)}) % 1080 + 32 AS height,
       |    (${hexPoly(17)}) AS h3
       |  FROM m),
       |resized AS (
       |  SELECT media_id, kind, h3,
       |    CAST(floor(width * least(512.0 / width, 512.0 / height, 1.0)) AS INT)
       |      AS out_width,
       |    CAST(floor(height * least(512.0 / width, 512.0 / height, 1.0)) AS INT)
       |      AS out_height
       |  FROM dims),
       |lv AS (
       |  SELECT media_id, h3, unnest(range(0, $dim)) AS i FROM dims),
       |norms AS (
       |  SELECT media_id,
       |    SUM(((h3 * (i * 2 + 1) + i * 7919) % 2000 - 1000)
       |      * ((h3 * (i * 2 + 1) + i * 7919) % 2000 - 1000)) AS norm_sq_scaled
       |  FROM lv GROUP BY media_id)
       |SELECT kind, COUNT(*) AS cnt,
       |  CAST(SUM(out_width) AS BIGINT) AS sum_w,
       |  CAST(SUM(out_height) AS BIGINT) AS sum_h,
       |  CAST(SUM(norm_sq_scaled) AS BIGINT) AS sum_norm_sq
       |FROM resized JOIN norms USING (media_id)
       |GROUP BY kind ORDER BY kind""".stripMargin
  }
}
