package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for a training-data pipeline: media as
  * opaque `BINARY` columns + typed metadata, with decode / feature
  * extraction staged behind a narrow interface.
  *
  * The real decode step (image/audio codecs) is STUBBED — the container
  * has no media libraries — as a deterministic fake deriving pseudo
  * features from the payload bytes. Everything Spark-side is real:
  * schema, batching, partition sizing, and the pure-column fast paths
  * (byte length, digest) that never deserialize the payload into the JVM
  * heap twice.
  */
object Multimodal {

  /** Asset schema: payload + typed metadata, the shape a 100 TB media
    * lake would use (payloads in parquet binary columns or referenced by
    * URI; metadata always columnar for pruning).
    */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("payload", BinaryType),
    StructField("byte_len", LongType),
    StructField("payload_md5", StringType)))

  /** Wrap a string column as a binary payload column with metadata —
    * stands in for reading raw media files at scale.
    */
  def toAssets(df: DataFrame, idCol: String, payloadFrom: String,
      mediaType: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("asset_id"),
      lit(mediaType).as("media_type"),
      col(payloadFrom).cast("binary").as("payload"),
      length(col(payloadFrom).cast("binary")).cast("long").as("byte_len"),
      md5(col(payloadFrom).cast("binary")).as("payload_md5"))

  /** STUB decode: deterministic pseudo image dimensions + channel stats
    * derived from payload bytes. A real deployment swaps this for an
    * `mapInPandas`-style vectorized decode (or a JVM codec) with the SAME
    * column contract — callers never see the difference.
    */
  def withFakeDecodedFeatures(assets: DataFrame): DataFrame =
    assets
      .withColumn("width", (col("byte_len") % 640 + 1).cast("int"))
      .withColumn("height", ((col("byte_len") * 7) % 480 + 1).cast("int"))
      .withColumn("aspect_ratio",
        round(col("width").cast("double") / col("height") + lit(1e-9), 6))

  /** Frame/patch sampling plan: deterministic offsets into the payload —
    * the plumbing (explode to one row per sample, carry metadata) is the
    * real thing; only the per-sample decode is fake.
    */
  def samplePatches(assets: DataFrame, n: Int): DataFrame =
    assets
      .withColumn("patch_idx", explode(sequence(lit(0), lit(n - 1))))
      .withColumn("patch_offset",
        (col("patch_idx") * (col("byte_len") / n)).cast("long"))
      .withColumn("patch_sig",
        md5(concat(col("payload_md5"), col("patch_idx").cast("string"))))
}
