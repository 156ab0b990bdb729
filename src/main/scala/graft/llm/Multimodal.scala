package graft.llm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque binary payloads + typed metadata.
  *
  * Images/audio/video ride through the pipeline as `binary` columns with a
  * metadata struct alongside; decode / feature-extraction runs per
  * partition so batch-oriented native decoders amortize setup. The decode
  * kernel itself is STUBBED with a deterministic fake (this container has
  * no image/audio libraries) — the Spark-side contract (schema, partition
  * batching, output shape) is real and tested, and a real decoder slots
  * into [[fakeDecode]] without touching the plumbing.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("media", BinaryType),
    StructField("media_meta", StructType(Seq(
      StructField("n_bytes", LongType),
      StructField("content_hash", StringType),
      StructField("format", StringType))))))

  /** Wrap a text column as an opaque binary payload + metadata struct —
    * the ingestion-side shape for any media column.
    */
  def asMediaColumn(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("doc_id"),
      to_binary(col(payloadCol), lit("utf-8")).as("media"),
      struct(
        octet_length(col(payloadCol)).cast("long").as("n_bytes"),
        sha2(col(payloadCol), 256).as("content_hash"),
        lit("text/plain").as("format")).as("media_meta"))

  /** STUB decode kernel: deterministic fake "feature extraction" from raw
    * bytes (length-derived width/height + first-bytes checksum). A real
    * implementation would hand `bytes` to an image/audio decoder here.
    */
  def fakeDecode(bytes: Array[Byte]): (Int, Int, Long) = {
    val w = 64 + (if (bytes.isEmpty) 0 else java.lang.Byte.toUnsignedInt(bytes(0)) % 64)
    val h = 64 + (bytes.length % 64)
    var checksum = 0L
    var i = 0
    while (i < math.min(bytes.length, 256)) {
      checksum = checksum * 31 + java.lang.Byte.toUnsignedInt(bytes(i)); i += 1
    }
    (w, h, checksum)
  }

  private val featureSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("checksum", LongType)))

  /** Per-partition batched "decode": the mapPartitions boundary where a
    * native decoder would process a batch of payloads at once (same batch
    * shape a vectorized/Arrow UDF would see).
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(featureSchema)
    media.select("doc_id", "media").mapPartitions { rows =>
      rows.map { r =>
        val (w, h, c) = fakeDecode(r.getAs[Array[Byte]]("media"))
        Row(r.getLong(0), w, h, c)
      }
    }(enc)
  }

  /** STUB resize kernel: a real implementation hands the payload to an
    * image scaler; the fake is deterministic (truncate/cycle bytes to a
    * target-size-derived length) so the pipeline contract is testable.
    */
  def fakeResize(bytes: Array[Byte], targetW: Int, targetH: Int): Array[Byte] = {
    val outLen = math.max(1, (targetW * targetH) / 64)
    val out = new Array[Byte](outLen)
    var i = 0
    while (i < outLen) {
      out(i) = if (bytes.isEmpty) 0 else bytes(i % bytes.length); i += 1
    }
    out
  }

  private val resizedSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("media", BinaryType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** Resize every payload to (targetW × targetH) — per-partition batching,
    * output is again a media-shaped frame so resizes chain with the other
    * multimodal stages.
    */
  def resize(media: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(resizedSchema)
    media.select("doc_id", "media").mapPartitions { rows =>
      rows.map { r =>
        Row(r.getLong(0), fakeResize(r.getAs[Array[Byte]]("media"), targetW, targetH),
          targetW, targetH)
      }
    }(enc)
  }

  private val frameSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("frame_idx", IntegerType),
    StructField("frame", BinaryType)))

  /** Frame sampling for video-shaped payloads: every `stride`-th fixed-size
    * chunk becomes one output row (doc_id, frame_idx, frame) — the 1→N
    * explode shape of real frame extraction, with deterministic fake
    * "frames" (byte chunks) standing in for a video decoder.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    require(frameBytes > 0 && stride > 0)
    val enc = org.apache.spark.sql.Encoders.row(frameSchema)
    media.select("doc_id", "media").mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]]("media")
        val nFrames = bytes.length / frameBytes
        (0 until nFrames by stride).iterator.map { f =>
          Row(r.getLong(0), f,
            java.util.Arrays.copyOfRange(bytes, f * frameBytes, (f + 1) * frameBytes))
        }
      }
    }(enc)
  }
}
