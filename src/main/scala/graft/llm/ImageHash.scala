package graft.llm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Perceptual image hashing (dHash) + hamming-banded near-dup pairs —
  * the image twin of [[SimHash]]: near-duplicate IMAGES (resizes,
  * re-encodes, minor edits) collapse to fingerprints within a few bits
  * even when their encoded bytes share nothing, which is exactly what
  * the exact-checksum image dedup (`media_meta.content_hash`) misses.
  *
  * dHash (difference hash, the standard aHash-family variant with the
  * best robustness/cost ratio): normalize the image to a 9×8 grayscale
  * grid, emit one bit per horizontal neighbor pair (left < right), 8×8 =
  * 64 bits. Geometry normalization makes it survive resize/re-encode;
  * gradients (not absolute levels) make it survive brightness shifts.
  *
  * Two decode paths, same discipline as [[Multimodal]]:
  *   - real images (PNG/JPEG/GIF/BMP) decode via `javax.imageio`, then a
  *     DETERMINISTIC integer box-average downscale (own arithmetic — no
  *     AWT rendering in the hash path, so the value is platform- and
  *     partition-independent for lossless formats);
  *   - anything else falls back to sampling the payload bytes as the
  *     gray grid (position (i·len)/72) — deterministic, and simple
  *     enough that the DuckDB oracle replays it byte for byte.
  *
  * Pair generation reuses [[SimHash.hammingPairsOn]] verbatim (4×16-bit
  * bands, pigeonhole recall to hamming ≤ 3, bucketCap guard): the
  * banding is a property of 64-bit fingerprints, not of text.
  */
object ImageHashImpl {
  val GridW = 9
  val GridH = 8

  /** 64-bit dHash from a row-major 9×8 gray grid: bit j (MSB-first,
    * j = y·8+x) is set iff grid(y·9+x+1) > grid(y·9+x).
    */
  def dhashFromGrays(g: Array[Int]): Long = {
    require(g.length == GridW * GridH, s"grid must be ${GridW * GridH} cells")
    var out = 0L
    var j = 0
    var y = 0
    while (y < GridH) {
      var x = 0
      while (x < GridW - 1) {
        if (g(y * GridW + x + 1) > g(y * GridW + x)) out |= 1L << (63 - j)
        j += 1
        x += 1
      }
      y += 1
    }
    out
  }

  /** Fallback gray grid for opaque payloads: sample byte (i·len)/72 for
    * i in 0..71 (0 for an empty payload). Long arithmetic — i·len
    * overflows Int past ~30 MB payloads.
    */
  def fallbackGrays(bytes: Array[Byte]): Array[Int] =
    Array.tabulate(GridW * GridH) { i =>
      if (bytes.isEmpty) 0
      else java.lang.Byte.toUnsignedInt(bytes(((i.toLong * bytes.length) / 72).toInt))
    }

  /** Deterministic box-average downscale of a decoded image to the 9×8
    * luma grid: cell (x,y) averages integer luma (299r+587g+114b)/1000
    * over source pixels [x·W/9, (x+1)·W/9) × [y·H/8, (y+1)·H/8) (cells
    * clamped to ≥ 1 px for degenerate tiny images). Integer sums and
    * divisions only — bit-identical everywhere.
    */
  def grayGrid(img: java.awt.image.BufferedImage): Array[Int] = {
    val w = img.getWidth
    val h = img.getHeight
    val out = new Array[Int](GridW * GridH)
    var cy = 0
    while (cy < GridH) {
      val sy0 = (cy.toLong * h / GridH).toInt
      val sy1 = math.max(sy0 + 1, ((cy + 1).toLong * h / GridH).toInt)
      var cx = 0
      while (cx < GridW) {
        val sx0 = (cx.toLong * w / GridW).toInt
        val sx1 = math.max(sx0 + 1, ((cx + 1).toLong * w / GridW).toInt)
        var sum = 0L
        var n = 0L
        var y = math.min(sy0, h - 1)
        val yEnd = math.min(sy1, h)
        while (y < yEnd) {
          var x = math.min(sx0, w - 1)
          val xEnd = math.min(sx1, w)
          while (x < xEnd) {
            val p = img.getRGB(x, y)
            val luma = (299 * ((p >> 16) & 0xFF) + 587 * ((p >> 8) & 0xFF) +
              114 * (p & 0xFF)) / 1000
            sum += luma
            n += 1
            x += 1
          }
          y += 1
        }
        out(cy * GridW + cx) = if (n == 0) 0 else (sum / n).toInt
        cx += 1
      }
      cy += 1
    }
    out
  }

  /** dHash of a payload: real decode for images (`"imageio"`), byte
    * sampling otherwise (`"opaque"`) — same fallback contract as
    * [[Multimodal.extractFeatures]] (a corrupt body behind a valid magic
    * falls back rather than failing the task).
    */
  def dhash(bytes: Array[Byte]): (Long, String) = {
    val real: Option[Long] =
      if (!Multimodal.looksLikeImage(bytes)) None
      else try {
        Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
          .map(img => dhashFromGrays(grayGrid(img)))
      } catch {
        case _: java.io.IOException | _: RuntimeException => None
      }
    real match {
      case Some(h) => (h, "imageio")
      case None => (dhashFromGrays(fallbackGrays(bytes)), "opaque")
    }
  }
}

object ImageHash {

  private val dhashSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("dhash", LongType),
    StructField("decoder", StringType)))

  /** Per-payload perceptual hash `(doc_id, dhash, decoder)` over a
    * media-shaped frame ([[Multimodal.asMediaColumn]]). Per-partition
    * batched like every decode stage — scan-local, no shuffle.
    */
  def dhashFrame(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(dhashSchema)
    media.select("doc_id", "media").mapPartitions { rows =>
      rows.map { r =>
        val (h, dec) = ImageHashImpl.dhash(r.getAs[Array[Byte]]("media"))
        Row(r.getLong(0), h, dec)
      }
    }(enc)
  }

  /** Perceptual near-dup pairs at hamming ≤ maxHamming over the dHashes —
    * [[SimHash.hammingPairsOn]] on the image plane: 4×16-bit bands give
    * pigeonhole recall to hamming 3, hot buckets (e.g. a solid-color
    * thumbnail repeated across the corpus) are bucketCap-dropped before
    * any pair expansion.
    */
  def dhashPairs(media: DataFrame, maxHamming: Int,
      bucketCap: Int = 10000): DataFrame =
    SimHash.hammingPairsOn(dhashFrame(media), "doc_id", "dhash",
      maxHamming, bucketCap, bits = 64)
}
