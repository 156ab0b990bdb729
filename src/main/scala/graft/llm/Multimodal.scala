package graft.llm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque binary payloads + typed metadata.
  *
  * Images/audio/video ride through the pipeline as `binary` columns with a
  * metadata struct alongside; decode / feature-extraction runs per
  * partition so batch-oriented native decoders amortize setup. Image
  * payloads (PNG/JPEG/GIF/BMP, sniffed by magic bytes) decode for REAL via
  * the JDK's `javax.imageio` — true dimensions, pixel checksum, and a
  * bilinear resize — and audio payloads (WAV/AIFF/AU) via
  * `javax.sound.sampled` — format parameters and PCM checksum. Only video
  * (no JDK codec exists) falls back to the deterministic fake kernels,
  * keeping the batching contract testable end-to-end.
  */
object Multimodal {

  // ImageIO defaults to a disk-backed read cache (a temp file per decode);
  // payloads here are in-memory byte arrays, so the cache is pure overhead
  javax.imageio.ImageIO.setUseCache(false)

  /** Magic-byte sniff for the formats the JDK ships decoders for. */
  def looksLikeImage(b: Array[Byte]): Boolean =
    b.length >= 4 && (
      (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
      (b(0) == 0xFF.toByte && b(1) == 0xD8.toByte && b(2) == 0xFF.toByte) ||
      (b(0) == 'G' && b(1) == 'I' && b(2) == 'F') ||
      (b(0) == 'B' && b(1) == 'M'))

  /** Real image decode: true width/height plus a row-major ARGB pixel
    * checksum. The fixed iteration order makes the checksum
    * partition-independent; it is also platform-independent for the
    * LOSSLESS formats (PNG/GIF/BMP) — JPEG decoding may legitimately vary
    * by ±1 per pixel across JDK/libjpeg IDCT implementations, so treat
    * JPEG checksums as per-cluster, not portable identity keys (hash the
    * encoded bytes for that, as `media_meta.content_hash` already does).
    * None when the payload isn't a decodable image — including a corrupt
    * body behind a valid magic, which ImageIO reports by THROWING —
    * callers fall back to [[fakeDecode]].
    */
  def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Long)] =
    if (!looksLikeImage(bytes)) None
    else try {
      Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
        .map { img =>
          var checksum = 0L
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) { checksum = checksum * 31 + img.getRGB(x, y); x += 1 }
            y += 1
          }
          (img.getWidth, img.getHeight, checksum)
        }
    } catch {
      // one truncated upload must not fail the whole partition's task
      case _: java.io.IOException | _: RuntimeException => None
    }

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

  /** Magic-byte sniff for the audio containers the JDK decodes
    * (WAV/AIFF/AU via `javax.sound.sampled`).
    */
  def looksLikeAudio(b: Array[Byte]): Boolean =
    b.length >= 12 && (
      (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') ||
      (b(0) == 'F' && b(1) == 'O' && b(2) == 'R' && b(3) == 'M') || // AIFF
      (b(0) == '.' && b(1) == 's' && b(2) == 'n' && b(3) == 'd')) // AU

  /** Real audio decode: format parameters plus a checksum over the decoded
    * PCM byte stream (fixed stream order → partition-independent; PCM
    * containers are lossless so the value is also platform-independent).
    * None when the payload isn't decodable audio — including a corrupt
    * body behind a valid magic — callers fall back to the fake kernel.
    */
  def decodeAudio(bytes: Array[Byte]): Option[(Double, Int, Int, Long, Long)] =
    if (!looksLikeAudio(bytes)) None
    else try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val f = in.getFormat
        var checksum = 0L
        var total = 0L
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n > 0) {
          var i = 0
          while (i < n) { checksum = checksum * 31 + java.lang.Byte.toUnsignedInt(buf(i)); i += 1 }
          total += n
          n = in.read(buf)
        }
        // count frames from the bytes actually decoded: getFrameLength is
        // NOT_SPECIFIED (-1) for AU headers with the unknown-length marker
        val frames =
          if (f.getFrameSize > 0) total / f.getFrameSize else in.getFrameLength
        Some((f.getSampleRate.toDouble, f.getChannels, f.getSampleSizeInBits,
          frames, checksum))
      } finally in.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException | _: RuntimeException => None
    }

  private val audioSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("sample_rate", DoubleType),
    StructField("channels", IntegerType),
    StructField("bits_per_sample", IntegerType),
    StructField("n_frames", LongType),
    StructField("checksum", LongType),
    StructField("decoder", StringType)))

  /** Per-partition batched audio feature extraction: WAV/AIFF/AU decode
    * for real (`decoder = "javasound"`), anything else through the
    * deterministic fake (`decoder = "opaque"`, format fields derived from
    * the fake width/height so the schema stays total).
    */
  def audioFeatures(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(audioSchema)
    media.select("doc_id", "media").mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]]("media")
        decodeAudio(bytes) match {
          case Some((sr, ch, bits, frames, cs)) =>
            Row(r.getLong(0), sr, ch, bits, frames, cs, "javasound")
          case None =>
            val (w, h, cs) = fakeDecode(bytes)
            Row(r.getLong(0), (w * 100).toDouble, 1, 16, h.toLong, cs, "opaque")
        }
      }
    }(enc)
  }

  /** Fallback kernel for non-image payloads: deterministic fake "feature
    * extraction" from raw bytes (length-derived width/height + first-bytes
    * checksum). Video decoders would slot in beside [[decodeImage]] and
    * [[decodeAudio]] (the JDK ships no video codec, so frame sampling
    * stays on the deterministic fake).
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
    StructField("checksum", LongType),
    StructField("decoder", StringType)))

  /** Per-partition batched decode: images go through [[decodeImage]]
    * (real dimensions + pixel checksum, `decoder = "imageio"`); everything
    * else through the deterministic fallback (`decoder = "opaque"`). The
    * mapPartitions boundary is where a batch-oriented native decoder
    * amortizes its setup (same batch shape a vectorized/Arrow UDF sees).
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(featureSchema)
    media.select("doc_id", "media").mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]]("media")
        decodeImage(bytes) match {
          case Some((w, h, c)) => Row(r.getLong(0), w, h, c, "imageio")
          case None =>
            val (w, h, c) = fakeDecode(bytes)
            Row(r.getLong(0), w, h, c, "opaque")
        }
      }
    }(enc)
  }

  private val gateSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_bytes", LongType),
    StructField("decoder", StringType)))

  /** Multimodal curation gate — [[graft.llm.TextOps.qualityGate]] for
    * media columns: decode metadata (real `javax.imageio` dimensions for
    * images, the deterministic fallback otherwise) drives keep/drop
    * reasons, so undersized/oversized payloads are quarantined with an
    * audit trail before any expensive downstream featurization. One
    * mapPartitions decode pass (batch boundary for native decoders) + a
    * scan-local gate projection — no shuffle at any corpus size. The
    * audio analogue composes the same way over [[audioFeatures]]'s
    * sample-rate/channel fields.
    */
  def mediaQualityGate(media: DataFrame, minW: Int, minH: Int,
      minBytes: Long, maxBytes: Long): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(gateSchema)
    val decoded = media.select("doc_id", "media").mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]]("media")
        decodeImage(bytes) match {
          case Some((w, h, _)) =>
            Row(r.getLong(0), w, h, bytes.length.toLong, "imageio")
          case None =>
            val (w, h, _) = fakeDecode(bytes)
            Row(r.getLong(0), w, h, bytes.length.toLong, "opaque")
        }
      }
    }(enc)
    decoded.select(
      col("doc_id"), col("width"), col("height"), col("n_bytes"), col("decoder"),
      (col("width") >= minW && col("height") >= minH &&
        col("n_bytes") >= minBytes && col("n_bytes") <= maxBytes).as("keep"),
      concat_ws(";",
        when(col("width") < minW, lit("too_narrow")),
        when(col("height") < minH, lit("too_flat")),
        when(col("n_bytes") < minBytes, lit("too_few_bytes")),
        when(col("n_bytes") > maxBytes, lit("too_many_bytes")))
        .as("drop_reasons"))
  }

  /** Real image resize: bilinear scale to (targetW × targetH), re-encoded
    * as PNG (deterministic for a fixed input). None for non-images.
    */
  def imageResize(bytes: Array[Byte], targetW: Int, targetH: Int): Option[Array[Byte]] =
    if (!looksLikeImage(bytes)) None
    else try imageResizeUnsafe(bytes, targetW, targetH) catch {
      // corrupt body behind a valid magic: fall back, don't fail the task
      case _: java.io.IOException | _: RuntimeException => None
    }

  private def imageResizeUnsafe(bytes: Array[Byte], targetW: Int,
      targetH: Int): Option[Array[Byte]] =
    Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      .map { img =>
        import java.awt.RenderingHints
        val out = new java.awt.image.BufferedImage(
          targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
            RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, targetW, targetH, null)
        } finally g.dispose()
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", baos)
        baos.toByteArray
      }

  /** Fallback resize kernel for non-image payloads: deterministic
    * (truncate/cycle bytes to a target-size-derived length) so the
    * pipeline contract stays testable without an audio/video scaler.
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
    * multimodal stages. Images scale for real ([[imageResize]]); other
    * payloads use the deterministic fallback.
    */
  def resize(media: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(resizedSchema)
    media.select("doc_id", "media").mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]]("media")
        val out = imageResize(bytes, targetW, targetH)
          .getOrElse(fakeResize(bytes, targetW, targetH))
        Row(r.getLong(0), out, targetW, targetH)
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
