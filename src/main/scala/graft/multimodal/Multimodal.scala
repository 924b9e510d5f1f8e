package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns next to a typed metadata struct; decode / feature
  * extraction runs batched per partition at the executor.
  *
  * The actual codec step is STUBBED (this container has no image/audio
  * libraries): [[DeterministicStubDecoder]] derives a fake-but-stable
  * feature vector from the bytes, so the Spark-side contract — schema,
  * partitioning, per-partition batch shape, null handling — is real and
  * tested, and a production decoder drops in behind [[MediaDecoder]]
  * without touching the plan.
  */
object Multimodal {

  /** media row schema: payload + typed metadata (modality, mime, width/
    * height for images, duration_ms for audio/video). */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("modality", StringType, nullable = false),
      StructField("mime", StringType, nullable = false),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))), nullable = false)))

  /** Batched decode boundary — the only non-declarative step. Implemented
    * per partition so a real decoder amortizes model/codec init across the
    * batch (the Spark analog of the reference's pooled browser contexts,
    * `services/browser.ts:21`). */
  trait MediaDecoder extends Serializable {
    /** bytes → fixed-size feature vector (null payload → null). */
    def decode(payload: Array[Byte]): Array[Float]
    def dim: Int
  }

  /** REAL image decoder for the uncompressed container: parses the BMP
    * byte layout ([[MediaKernels.bmpParse]] — header walk + padded
    * bottom-up pixel rows) and emits [mean_r, mean_g, mean_b] in [0, 1].
    * No external codec needed; proof that the [[MediaDecoder]] boundary
    * carries real byte-level decode, not only the stub. Invalid payloads
    * → null features (the decoder analog of the parser's all(-1)). */
  final class BmpPixelDecoder extends MediaDecoder {
    val dim = 3
    def decode(payload: Array[Byte]): Array[Float] = {
      if (payload == null) return null
      val p = MediaKernels.bmpParse(payload)
      if (p.getLong(0) < 0) return null
      val n = (p.getLong(0) * p.getLong(1)).toFloat // width * height
      Array(p.getLong(7) / (255.0f * n),            // sum_r
        p.getLong(6) / (255.0f * n),                // sum_g
        p.getLong(5) / (255.0f * n))                // sum_b
    }
  }

  /** REAL decoder for a COMPRESSED codec, in pure JDK: the full PNG read
    * path — CRC-verified chunk walk, zlib inflate
    * (`java.util.zip.Inflater`), five-filter scanline reconstruction
    * ([[MediaKernels.pngParse]]) — behind the same boundary. Emits
    * [mean_r, mean_g, mean_b] in [0, 1]: a PNG and a BMP of the same
    * pixels decode to IDENTICAL features, which is the cross-codec
    * parity the spec asserts. */
  final class PngPixelDecoder extends MediaDecoder {
    val dim = 3
    def decode(payload: Array[Byte]): Array[Float] = {
      if (payload == null) return null
      val p = MediaKernels.pngParse(payload)
      if (p.getLong(0) < 0) return null
      val n = (p.getLong(0) * p.getLong(1)).toFloat // width * height
      Array(p.getLong(4) / (255.0f * n),            // sum_r
        p.getLong(5) / (255.0f * n),                // sum_g
        p.getLong(6) / (255.0f * n))                // sum_b
    }
  }

  /** REAL decoder for the palette-indexed compressed codec: the full GIF
    * read path — block walk, variable-width LZW (9→12 bits, CLEAR
    * resets, the code==next KwKwK case), palette-mapped channel sums
    * ([[MediaKernels.gifParse]]) — behind the same boundary. Emits
    * [mean_r, mean_g, mean_b] in [0, 1] like its BMP/PNG siblings. */
  final class GifPixelDecoder extends MediaDecoder {
    val dim = 3
    def decode(payload: Array[Byte]): Array[Float] = {
      if (payload == null) return null
      val p = MediaKernels.gifParse(payload)
      if (p.getLong(0) < 0) return null
      val n = (p.getLong(0) * p.getLong(1)).toFloat // width * height
      Array(p.getLong(4) / (255.0f * n),            // sum_r
        p.getLong(5) / (255.0f * n),                // sum_g
        p.getLong(6) / (255.0f * n))                // sum_b
    }
  }

  /** REAL decoder for the dominant crawl format: the full baseline JPEG
    * read path — marker walk, DHT-built Huffman decode, zigzag, dequant,
    * IDCT, restart intervals ([[MediaKernels.jpegParse]]) — behind the
    * same boundary. Emits [mean_y, mean_cb, mean_cr] in [0, 1] (the
    * codec layer stops at YCbCr; color transforms are a feature-layer
    * concern). */
  final class JpegPixelDecoder extends MediaDecoder {
    val dim = 3
    def decode(payload: Array[Byte]): Array[Float] = {
      if (payload == null) return null
      val p = MediaKernels.jpegParse(payload)
      if (p.getLong(0) < 0) return null
      val n = (p.getLong(0) * p.getLong(1)).toFloat // width * height
      Array(p.getLong(4) / (255.0f * n),            // sum_y
        p.getLong(5) / (255.0f * n),                // sum_cb
        p.getLong(6) / (255.0f * n))                // sum_cr
    }
  }

  /** Stable fake decoder for formats whose codecs live outside this
    * container (MP3/H.264): features are a seeded hash cascade of
    * the bytes — deterministic, mixes with payload content, right shape.
    * A production build swaps its codec in behind [[MediaDecoder]];
    * [[BmpPixelDecoder]] shows the boundary carrying a real decode. */
  final class DeterministicStubDecoder(val dim: Int = 16) extends MediaDecoder {
    def decode(payload: Array[Byte]): Array[Float] = {
      if (payload == null) return null
      var h = 1125899906842597L
      payload.foreach(b => h = h * 31 + b)
      Array.tabulate(dim) { i =>
        val x = h ^ (i.toLong * 0x9E3779B97F4A7C15L)
        ((x % 1000).toFloat / 1000.0f)
      }
    }
  }

  /** Attach decoded features: output schema = input + `features
    * array<float>`. Runs as the custom whole-operator plan
    * ([[graft.plans.MediaFeaturesPlan]] — logical node + strategy +
    * physical exec over Tungsten rows, partitioning/ordering preserved
    * through the plan); [[withFeaturesEncoderPath]] keeps the original
    * tier-(d) `mapPartitions` formulation as the spec's parity
    * reference. */
  def withFeatures(media: DataFrame, decoder: MediaDecoder,
                   payloadCol: String = "payload",
                   out: String = "features"): DataFrame = {
    import graft.plans.MediaFeaturesPlan._
    val spark = media.sparkSession
    MediaFeaturesStrategy.install(spark)
    val child = org.apache.spark.sql.graftbridge.PlanBridge.analyzed(media)
    val attr = org.apache.spark.sql.catalyst.expressions
      .AttributeReference(out, ArrayType(FloatType), nullable = true)()
    org.apache.spark.sql.graftbridge.PlanBridge.ofRows(spark,
      MediaFeatures(decoder, media.schema.fieldIndex(payloadCol), attr, child))
  }

  /** The pre-physical-operator formulation (Dataset.mapPartitions over
    * external Rows) — kept ONLY as the bit-parity reference the spec
    * holds [[withFeatures]] against; the encoder round-trip boxes every
    * field and hides partitioning from Catalyst. */
  private[graft] def withFeaturesEncoderPath(
      media: DataFrame, decoder: MediaDecoder,
      payloadCol: String = "payload",
      out: String = "features"): DataFrame = {
    val schema = media.schema.add(out, ArrayType(FloatType), nullable = true)
    val payloadIdx = media.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    media.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val feats = decoder.decode(payload)
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ feats)
      }
    }(enc)
  }

  /** Frame sampling plan for video/audio: given duration and a stride,
    * produce one row per sampled offset — pure expression, the decode of
    * each frame goes through [[withFeatures]] afterwards. */
  def sampleOffsets(media: DataFrame, strideMs: Long, maxFrames: Int = 16): DataFrame =
    media
      .withColumn("offset_ms",
        explode(sequence(lit(0L),
          least(coalesce(col("meta.duration_ms"), lit(0L)),
            lit(strideMs * (maxFrames - 1))), lit(strideMs))))

  /** Resize metadata rewrite (the transform itself is decoder work): scale
    * width/height to fit `maxSide`, preserving aspect ratio — pure plan. */
  def resizePlan(media: DataFrame, maxSide: Int): DataFrame = {
    val w = col("meta.width"); val h = col("meta.height")
    val scale = least(lit(1.0), lit(maxSide) / greatest(w, h).cast("double"))
    media
      .withColumn("target_width", ceil(w * scale).cast("int"))
      .withColumn("target_height", ceil(h * scale).cast("int"))
  }

  /** Deterministic synthetic media table (for tests/benches): payload bytes
    * derived from the id, mixed modalities, some null payloads. */
  def synthetic(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    spark.range(n.toLong).select(
      col("id").as("media_id"),
      when(col("id") % 17 === 0, lit(null).cast(BinaryType))
        .otherwise(sha2(col("id").cast("string"), 256).cast(BinaryType)).as("payload"),
      struct(
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("id") % 3 + 1).cast("int")).as("modality"),
        lit("application/octet-stream").as("mime"),
        when(col("id") % 3 === 0, (col("id") % 1000 + 100).cast("int")).as("width"),
        when(col("id") % 3 === 0, (col("id") % 800 + 100).cast("int")).as("height"),
        when(col("id") % 3 =!= 0, (col("id") % 60000 + 1000)).as("duration_ms")
      ).as("meta"))
  }
}
