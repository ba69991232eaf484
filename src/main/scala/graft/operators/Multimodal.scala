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

  case class AssetRow(asset_id: Long, payload: Array[Byte])
  case class DecodedRow(asset_id: Long, width: Int, height: Int,
      mean_luma: Double)

  /** Batched decode harness — the JVM shape a real vectorized codec
    * plugs into (the Scala analogue of Python's `mapInPandas`): a
    * `mapPartitions` that groups the partition's payloads into batches
    * of at most `maxBatchRows` / `maxBatchBytes` and hands each batch to
    * the decoder in one call. Batching matters at scale for the same
    * reason arrow batches do — codec setup is amortized per batch, and
    * the bound keeps a partition of large payloads from materializing in
    * heap at once (the iterator stays lazy between batches). This is the
    * one justified `mapPartitions` in the library: an opaque codec can't
    * be a Catalyst expression. The default `decode` is the deterministic
    * stub (no media libs in this container); swap the function, keep the
    * contract.
    */
  def decodeBatched(assets: DataFrame, maxBatchRows: Int = 64,
      maxBatchBytes: Long = 8L << 20)(
      decode: Seq[AssetRow] => Seq[DecodedRow] = stubDecode): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id").cast("long"), col("payload"))
      .as[AssetRow]
      .mapPartitions { rows =>
        new Iterator[Seq[DecodedRow]] {
          def hasNext: Boolean = rows.hasNext
          def next(): Seq[DecodedRow] = {
            val batch = scala.collection.mutable.Buffer.empty[AssetRow]
            var bytes = 0L
            while (rows.hasNext && batch.size < maxBatchRows &&
                bytes < maxBatchBytes) {
              val r = rows.next()
              batch += r
              bytes += (if (r.payload == null) 0L else r.payload.length.toLong)
            }
            decode(batch.toSeq)
          }
        }.flatten
      }
      .toDF("asset_id", "width", "height", "mean_luma")
  }

  /** The stub codec: same pseudo-dimensions as
    * [[withFakeDecodedFeatures]], computed per batch.
    */
  def stubDecode(batch: Seq[AssetRow]): Seq[DecodedRow] = batch.map { r =>
    val len = if (r.payload == null) 0L else r.payload.length.toLong
    DecodedRow(r.asset_id, (len % 640 + 1).toInt, ((len * 7) % 480 + 1).toInt,
      (len % 256).toDouble)
  }

  // ---- real JVM codec (javax.imageio PNG) -------------------------------

  /** Render a deterministic two-band grayscale PNG per row — the in-repo
    * stand-in for raw media files (no network, no native libs: PNG encode
    * is pure-JVM `javax.imageio`). Input columns: `asset_id, width,
    * height, luma_top, luma_bottom`; rows `[0, height/2)` get `luma_top`,
    * the rest `luma_bottom`. Pixels are written straight to the raster
    * (no sRGB color conversion), so the lossless PNG roundtrip is exact
    * and the decoded mean luma has a closed form an external oracle can
    * reproduce. Encoding rides the typed `Dataset.map` family (same
    * justified non-Catalyst island as [[decodeBatched]]): an opaque codec
    * can't be a Catalyst expression.
    */
  def renderPngAssets(spec: DataFrame): DataFrame = {
    val spark = spec.sparkSession
    import spark.implicits._
    spec.select(col("asset_id").cast("long"), col("width").cast("int"),
        col("height").cast("int"), col("luma_top").cast("int"),
        col("luma_bottom").cast("int"))
      .as[(Long, Int, Int, Int, Int)]
      .map { case (id, w, h, lt, lb) =>
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          val luma = if (y < h / 2) lt else lb
          var x = 0
          while (x < w) { raster.setSample(x, y, 0, luma); x += 1 }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        // MemoryCacheImageOutputStream sidesteps ImageIO's global disk-
        // cache setting — no temp files on executor-local disk.
        val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
        try javax.imageio.ImageIO.write(img, "png", ios) finally ios.close()
        (id, bos.toByteArray)
      }
      .toDF("asset_id", "payload")
  }

  /** The real codec for [[decodeBatched]]: `javax.imageio` PNG decode to
    * actual pixels — dimensions from the decoded image, mean luma summed
    * over the raster (exact: integer sum, one double division). Swapping
    * this for [[stubDecode]] changes no plumbing, which is the whole
    * point of the batched-decode contract. Reference bar: the reference's
    * embedding generation consumes real decoded images
    * (scripts/embeddings/generate_clip_embeddings.py:40-91).
    */
  def imageIoDecode(batch: Seq[AssetRow]): Seq[DecodedRow] = batch.map { r =>
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(r.payload))
    require(img != null, s"undecodable payload for asset ${r.asset_id}")
    val (w, h) = (img.getWidth, img.getHeight)
    val raster = img.getRaster
    var sum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
      y += 1
    }
    DecodedRow(r.asset_id, w, h, sum.toDouble / (w.toLong * h))
  }

  /** mm3's in-plan raster decode: the first 64 payload bytes as an 8×8
    * grayscale raster, average-pooled to 4×4 — (asset_id, pool_idx,
    * pooled) with pool cells in row-major order. Byte reads are hex
    * substring + base-16 conv (codegen'd string ops, reproducible in
    * the oracle); a real codec replaces only this byte→pixel read.
    * Shared by the raster stats query (mm3) and [[aHash16]] so the two
    * can never decode differently.
    */
  def rasterPool16(assets: DataFrame): DataFrame = {
    val h = hex(col("payload"))
    def pix(byteIdx: org.apache.spark.sql.Column) =
      conv(h.substr(byteIdx * 2 + 1, lit(2)), 16, 10).cast("int")
    assets
      .withColumn("pool_idx", explode(sequence(lit(0), lit(15))))
      .withColumn("__b", (col("pool_idx") / 4).cast("int") * 16 +
        pmod(col("pool_idx"), lit(4)) * 2)
      .withColumn("pooled",
        (pix(col("__b")) + pix(col("__b") + 1) +
          pix(col("__b") + 8) + pix(col("__b") + 9)) / 4.0)
      .select(col("asset_id"), col("pool_idx"), col("pooled"))
  }

  /** 16-bit average-hash perceptual fingerprint: bit i set iff pool
    * cell i sits above the image mean. Pool means are quarter-integers
    * and the image mean a /16 of their sum — both exact in binary, so
    * the > compare (and therefore the hash) is bit-identical
    * cross-engine. One groupBy per asset; the fold over collected cells
    * is order-independent (commutative sum of per-cell bits).
    */
  def aHash16(assets: DataFrame): DataFrame =
    rasterPool16(assets)
      .groupBy(col("asset_id"))
      .agg(sum(col("pooled")).as("__tot"),
        collect_list(struct(col("pool_idx"), col("pooled"))).as("__c"))
      .select(col("asset_id"),
        aggregate(col("__c"), lit(0L), (acc, c) =>
          acc + when(c.getField("pooled") > col("__tot") / 16,
            pow(lit(2.0), c.getField("pool_idx")).cast("long"))
            .otherwise(lit(0L))).as("phash"))

  /** Windowed RMS energy over an audio-like binary payload — the
    * frame-level feature pass (silence detection, VAD pre-filter) an
    * audio corpus runs before transcription. The payload is interpreted
    * as unsigned 8-bit PCM; the STUB codec here is "UTF-8 decode +
    * non-ASCII scrub, code point − 32 = amplitude" so the result is
    * deterministic and cross-engine oracle-checkable — a real deployment
    * swaps the sample extraction for a PCM/Opus decoder with the SAME
    * (asset_id, frame_idx, n_samples, rms, is_silence) contract.
    *
    * Shape is the real thing: per-row bounded decode (`maxSamples` caps
    * bytes read per asset), a generate (explode) that never shuffles,
    * and ONE aggregate keyed (asset, frame) — at 100 TB the frame grid
    * partitions on asset_id with the scan.
    */
  def audioFrameEnergy(assets: DataFrame, frameLen: Int = 256,
      maxSamples: Int = 1024, silenceRms: Double = 16.0): DataFrame = {
    val base = assets.select(col("asset_id"),
        substring(regexp_replace(col("payload").cast("string"),
          "[^ -~]", ""), 1, maxSamples).as("__s"))
      .where(length(col("__s")) >= frameLen)
    base.select(col("asset_id"), col("__s"),
        posexplode(sequence(lit(1), length(col("__s"))))
          .as(Seq("__p", "__i")))
      .select(col("asset_id"),
        floor((col("__i") - 1) / frameLen).cast("long").as("frame_idx"),
        (ascii(col("__s").substr(col("__i"), lit(1))) - 32)
          .cast("double").as("__amp"))
      .groupBy(col("asset_id"), col("frame_idx"))
      .agg(count(lit(1)).as("n_samples"),
        round(sqrt(avg(col("__amp") * col("__amp"))) + lit(1e-9), 6)
          .as("rms"))
      .withColumn("is_silence", col("rms") < silenceRms)
  }

  /** Per-channel pixel statistics over an RGB-interleaved payload
    * prefix: byte 3k+c is channel c of pixel k — the white-balance /
    * tint screen (and the cheapest "is this image basically one color"
    * near-dup prefilter) a vision-data pipeline runs before any real
    * decode. Reads exactly `nBytes` bytes per asset (explode bounded by
    * a constant, the mm3/mm4 discipline), aggregates mean and
    * population stddev per channel, and flags the dominant channel —
    * channel means are exact multiples of 3/nBytes in binary, so the
    * argmax compare is bit-identical cross-engine.
    */
  def channelStats(assets: DataFrame, nBytes: Int = 96): DataFrame = {
    require(nBytes >= 3 && nBytes % 3 == 0,
      s"need a positive multiple of 3; got $nBytes")
    import org.apache.spark.sql.expressions.Window
    val h = hex(col("payload"))
    val byteVal = conv(h.substr(col("__i") * 2 + 1, lit(2)), 16, 10)
      .cast("double")
    val perChannel = assets.where(col("byte_len") >= nBytes)
      .withColumn("__i", explode(sequence(lit(0), lit(nBytes - 1))))
      .select(col("asset_id"), pmod(col("__i"), lit(3)).as("channel"),
        byteVal.as("__b"))
      .groupBy(col("asset_id"), col("channel"))
      .agg(count(lit(1)).as("n_px"), avg(col("__b")).as("__mean"),
        stddev_pop(col("__b")).as("__sd"))
    val w = Window.partitionBy(col("asset_id"))
      .orderBy(col("__mean").desc, col("channel"))
    perChannel
      .withColumn("is_dominant",
        when(row_number().over(w) === 1, 1L).otherwise(0L))
      .select(col("asset_id"), col("channel"), col("n_px"),
        round(col("__mean") + lit(1e-9), 6).as("ch_mean"),
        round(col("__sd") + lit(1e-9), 6).as("ch_std"),
        col("is_dominant"))
  }
}
