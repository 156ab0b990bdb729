package graft.llm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Perceptual audio fingerprinting + hamming-banded near-dup pairs — the
  * audio twin of [[ImageHash]]: near-duplicate CLIPS (re-encodes, gain
  * changes, resamples) collapse to fingerprints within a few bits even
  * when their container bytes share nothing, which the exact PCM
  * checksum (`Multimodal.audioFeatures.checksum`) misses.
  *
  * The fingerprint is a time-domain ENERGY-ENVELOPE difference hash
  * (the robust-hash recipe of Haitsma & Kalker 2002, with time-domain
  * energy in place of their FFT bands — the JDK ships no FFT, and the
  * envelope keeps the two properties that matter for dedup):
  * normalize the clip to 65 equal time cells, mean |sample| per cell
  * (integer arithmetic), one bit per neighbor-cell comparison → 64 bits.
  * Time normalization makes it survive resampling; the comparisons (not
  * absolute levels) make it survive uniform gain. It is deliberately
  * blind to pitch — a spectral-band variant is the classical refinement
  * and plugs into [[AudioHashImpl.hashFromEnergies]] unchanged given
  * per-band energies.
  *
  * Two decode paths, same discipline as [[Multimodal]]/[[ImageHash]]:
  * real PCM (WAV/AIFF/AU, 8- or 16-bit) decodes via `javax.sound` with
  * own integer sample parsing (no float resampling — platform- and
  * partition-independent); anything else samples the payload bytes as
  * the energy curve (position (i·len)/65) — deterministic and
  * DuckDB-replayable. Pair generation reuses [[SimHash.hammingPairsOn]]
  * (4×16-bit bands, pigeonhole recall to hamming ≤ 3, bucketCap guard).
  */
object AudioHashImpl {
  val Cells = 65

  /** 64-bit envelope hash from 65 cell energies: bit j (MSB-first) is
    * set iff e(j+1) > e(j).
    */
  def hashFromEnergies(e: Array[Long]): Long = {
    require(e.length == Cells, s"energy curve must be $Cells cells")
    var out = 0L
    var j = 0
    while (j < Cells - 1) {
      if (e(j + 1) > e(j)) out |= 1L << (63 - j)
      j += 1
    }
    out
  }

  /** Fallback energy curve for opaque payloads: unsigned byte at
    * (i·len)/65 — the audio-plane mirror of `ImageHashImpl.fallbackGrays`
    * (long arithmetic: i·len overflows Int past ~33 MB).
    */
  def fallbackEnergies(bytes: Array[Byte]): Array[Long] =
    Array.tabulate(Cells) { i =>
      if (bytes.isEmpty) 0L
      else java.lang.Byte.toUnsignedInt(
        bytes(((i.toLong * bytes.length) / Cells).toInt)).toLong
    }

  /** Mean-|sample| energy per time cell from decoded PCM. Integer-only:
    * per-cell sums of absolute sample values over all channels, divided
    * by the cell's frame count. Supports the PCM layouts `javax.sound`
    * emits for WAV/AIFF/AU (8-bit signed/unsigned, 16-bit either
    * endianness); None for anything else — caller falls back.
    */
  def pcmEnergies(pcm: Array[Byte],
      f: javax.sound.sampled.AudioFormat): Option[Array[Long]] = {
    val enc = f.getEncoding
    val signed = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
    val unsigned = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
    val bits = f.getSampleSizeInBits
    val frameSize = f.getFrameSize
    val channels = f.getChannels
    // 16-bit unsigned PCM never occurs in WAV/AIFF/AU; excluding it keeps
    // the sign-extending hi-byte parse below unconditionally correct
    if ((!signed && !unsigned) || (bits != 8 && bits != 16) ||
      (bits == 16 && !signed) || frameSize <= 0 || channels <= 0) return None
    val nFrames = pcm.length / frameSize
    if (nFrames == 0) return Some(new Array[Long](Cells))
    val sums = new Array[Long](Cells)
    val counts = new Array[Long](Cells)
    val bytesPerSample = bits / 8
    var i = 0
    while (i < nFrames) {
      val cell = ((i.toLong * Cells) / nFrames).toInt
      var c = 0
      var acc = 0L
      while (c < channels) {
        val off = i * frameSize + c * bytesPerSample
        val v =
          if (bits == 8) {
            val b = pcm(off)
            if (signed) b.toInt else java.lang.Byte.toUnsignedInt(b) - 128
          } else {
            val (lo, hi) = if (f.isBigEndian) (off + 1, off) else (off, off + 1)
            (pcm(hi).toInt << 8) | java.lang.Byte.toUnsignedInt(pcm(lo))
          }
        acc += math.abs(v.toLong)
        c += 1
      }
      sums(cell) += acc
      counts(cell) += 1
      i += 1
    }
    Some(Array.tabulate(Cells)(j => if (counts(j) == 0) 0L else sums(j) / counts(j)))
  }

  /** Envelope hash of a payload: real PCM decode for WAV/AIFF/AU
    * (`"javasound"`), byte sampling otherwise (`"opaque"`) — a corrupt
    * body or an exotic PCM layout falls back rather than failing.
    */
  def audioHash(bytes: Array[Byte]): (Long, String) = {
    val real: Option[Long] =
      if (!Multimodal.looksLikeAudio(bytes)) None
      else try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val bos = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          var n = in.read(buf)
          while (n > 0) { bos.write(buf, 0, n); n = in.read(buf) }
          pcmEnergies(bos.toByteArray, in.getFormat).map(hashFromEnergies)
        } finally in.close()
      } catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => None
        case _: java.io.IOException | _: RuntimeException => None
      }
    real match {
      case Some(h) => (h, "javasound")
      case None => (hashFromEnergies(fallbackEnergies(bytes)), "opaque")
    }
  }
}

object AudioHash {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("ahash", LongType),
    StructField("decoder", StringType)))

  /** Per-payload envelope hash `(doc_id, ahash, decoder)` over a
    * media-shaped frame — per-partition batched, scan-local, no shuffle.
    */
  def audioHashFrame(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(schema)
    media.select("doc_id", "media").mapPartitions { rows =>
      rows.map { r =>
        val (h, dec) = AudioHashImpl.audioHash(r.getAs[Array[Byte]]("media"))
        Row(r.getLong(0), h, dec)
      }
    }(enc)
  }

  /** Envelope near-dup pairs at hamming ≤ maxHamming — the same banded
    * candidate chain as every other 64-bit fingerprint plane.
    */
  def audioPairs(media: DataFrame, maxHamming: Int,
      bucketCap: Int = 10000): DataFrame =
    SimHash.hammingPairsOn(audioHashFrame(media), "doc_id", "ahash",
      maxHamming, bucketCap, bits = 64)
}
