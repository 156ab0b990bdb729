package graft.tables

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.CRC32

import org.roaringbitmap.RoaringBitmap

/** Delta Lake deletion vectors, straight from the public protocol spec
  * (github.com/delta-io/delta/blob/master/PROTOCOL.md — "Deletion
  * Vectors" / "Deletion Vector Format"). Everything here is format
  * code shared by the bridge's read and write paths:
  *
  *   - the DESCRIPTOR (`add.deletionVector`): `storageType` `u`
  *     (table-relative file, UUID z85-coded in the path field), `i`
  *     (the whole serialized bitmap inline, z85-coded), or `p`
  *     (absolute path); `offset` into the file for `u`/`p`;
  *     `sizeInBytes` of the serialized bitmap; `cardinality` = rows
  *     deleted. The action key is `(path, uniqueId)` where uniqueId =
  *     storageType + pathOrInlineDv (+ "@offset" when present);
  *   - the BITMAP: a 4-byte little-endian magic (1681511377) followed
  *     by the 64-bit RoaringBitmap "portable" serialization
  *     (RoaringFormatSpec 64-bit extension: an 8-byte little-endian
  *     bucket count, then per bucket a 4-byte little-endian high-32-bit
  *     key and the standard 32-bit roaring serialization — which
  *     `org.roaringbitmap.RoaringBitmap`, Spark's own dependency, IS
  *     the reference implementation of);
  *   - the FILE (`deletion_vector_<uuid>.bin`): a single version byte
  *     (1), then per stored DV a 4-byte BIG-endian size, the bitmap
  *     bytes, and a 4-byte big-endian CRC-32 of those bytes; the
  *     descriptor's `offset` points at the size field;
  *   - Z85 (the base85 variant Delta names): 4 bytes → 5 chars over
  *     ZeroMQ's alphabet, most-significant digit first.
  *
  * Row indexes are the row's ordinal WITHIN its parquet file — the
  * same value Spark's `_metadata.row_index` column surfaces — so the
  * read side filters `(file, row_index) ∉ DV` and the write side
  * collects exactly that column.
  */
/** Executor-side deletion-vector probe: the broadcast carries bitmaps
  * SERIALIZED (compact), each deserializing at most once per executor
  * into the transient cache. Files without a DV miss the map → row
  * kept. Shared by the bridge's Delta reads and the commitlog's
  * adopted-DV scan planes.
  */
private[graft] final class DvLookup(
    bc: org.apache.spark.broadcast.Broadcast[Map[String, Array[Byte]]])
    extends Serializable {
  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, DeletionVectors.Resolved]()
  def has(filePath: String): Boolean = bc.value.contains(filePath)
  def deleted(filePath: String, rowIndex: Long): Boolean =
    bc.value.contains(filePath) &&
      cache.computeIfAbsent(filePath, fp =>
        DeletionVectors.Resolved(
          DeletionVectors.deserializeBitmap(bc.value(fp))))
        .contains(rowIndex)
}

private[graft] object DeletionVectors {

  /** `add.deletionVector` / `remove.deletionVector` as the log carries
    * it. `offset` is present only for on-disk storage (`u`/`p`).
    */
  final case class Descriptor(storageType: String, pathOrInlineDv: String,
      offset: Option[Int], sizeInBytes: Int, cardinality: Long) {
    /** The protocol's file-action key suffix: two adds for one data
      * file with different DV states are DIFFERENT actions.
      */
    def uniqueId: String =
      storageType + pathOrInlineDv + offset.map("@" + _).getOrElse("")
  }

  /** Compact single-string descriptor form for manifest storage
    * (`LogFile.adoptedDv`): colon-separated fixed fields with the
    * path LAST — the z85 alphabet contains ':' so only a
    * limit-bounded split is safe.
    */
  def encodeDescriptor(d: Descriptor): String =
    s"${d.storageType}:${d.offset.map(_.toString).getOrElse("")}:" +
      s"${d.sizeInBytes}:${d.cardinality}:${d.pathOrInlineDv}"

  def decodeDescriptor(s: String): Descriptor = {
    val parts = s.split(":", 5)
    require(parts.length == 5, s"malformed stored DV descriptor '$s'")
    Descriptor(parts(0), parts(4),
      if (parts(1).isEmpty) None else Some(parts(1).toInt),
      parts(2).toInt, parts(3).toLong)
  }

  val Magic: Int = 1681511377
  val FormatVersion: Byte = 1

  // --------------------------------------------------------------- z85

  private val Z85Alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ" +
      ".-:+=^!/*?&<>()[]{}@%$#"
  private val Z85Decode: Array[Int] = {
    val a = Array.fill(128)(-1)
    Z85Alphabet.zipWithIndex.foreach { case (c, i) => a(c.toInt) = i }
    a
  }

  /** Z85-encode; input length must be a multiple of 4 (the spec's
    * payloads — UUIDs and serialized bitmaps — are padded by the
    * writer when needed; Delta pads inline DVs to 4 with zero bytes?
    * No: the serialized bitmap length is already 4-aligned by
    * construction — magic 4 + count 8 + per-bucket 4+4k… every piece
    * is a multiple of 4).
    */
  def z85Encode(bytes: Array[Byte]): String = {
    require(bytes.length % 4 == 0,
      s"z85 encodes 4-byte groups, got ${bytes.length} bytes")
    val sb = new StringBuilder(bytes.length / 4 * 5)
    var i = 0
    while (i < bytes.length) {
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (bytes(i + j) & 0xffL); j += 1 }
      var div = 85L * 85 * 85 * 85
      while (div > 0) {
        sb.append(Z85Alphabet(((v / div) % 85).toInt))
        div /= 85
      }
      i += 4
    }
    sb.toString
  }

  /** Inline-DV encoding: a serialized bitmap is not 4-aligned in
    * general (array containers are 2 bytes per value), so the writer
    * zero-pads to alignment and the descriptor's `sizeInBytes` records
    * the TRUE length — exactly delta-spark's Base85 codec behavior,
    * which [[resolve]]'s tolerance mirrors on the read side.
    */
  def z85EncodePadded(bytes: Array[Byte]): String = {
    val pad = (4 - bytes.length % 4) % 4
    z85Encode(if (pad == 0) bytes else bytes ++ Array.fill(pad)(0.toByte))
  }

  def z85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0, s"z85 decodes 5-char groups, got ${s.length}")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j)
        val d = if (c < 128) Z85Decode(c.toInt) else -1
        require(d >= 0, s"invalid z85 character '$c'")
        v = v * 85 + d
        j += 1
      }
      var k = 3
      while (k >= 0) {
        out(i / 5 * 4 + (3 - k)) = ((v >>> (k * 8)) & 0xff).toByte
        k -= 1
      }
      i += 5
    }
    out
  }

  /** A UUID as the 20 z85 characters `u`-storage paths embed (16 raw
    * bytes, big-endian halves — the JVM UUID's natural byte order).
    */
  def z85Uuid(u: java.util.UUID): String = {
    val b = ByteBuffer.allocate(16)
    b.putLong(u.getMostSignificantBits)
    b.putLong(u.getLeastSignificantBits)
    z85Encode(b.array())
  }

  def uuidFromZ85(s: String): java.util.UUID = {
    val b = ByteBuffer.wrap(z85Decode(s))
    new java.util.UUID(b.getLong, b.getLong)
  }

  // ----------------------------------------------- 64-bit portable bitmap

  /** Serialize sorted-or-not row indexes as `<magic><64-bit portable
    * RoaringBitmap>`. Buckets are written densely from 0 to the highest
    * occupied key — what delta-spark's RoaringBitmapArray emits — and
    * each 32-bit bucket is `runOptimize`d first, so the bytes are a
    * pure function of the SET (no insertion-order dependence: the
    * mirror's racing writers must produce identical files).
    */
  def serializeBitmap(rowIndexes: Iterator[Long]): Array[Byte] = {
    val buckets = scala.collection.mutable.LongMap.empty[RoaringBitmap]
    rowIndexes.foreach { ri =>
      require(ri >= 0, s"negative row index $ri")
      buckets.getOrElseUpdate(ri >>> 32, new RoaringBitmap()).add(ri.toInt)
    }
    val maxKey = if (buckets.isEmpty) -1L else buckets.keys.max
    val bs = (0L to maxKey).map(k =>
      buckets.getOrElse(k, new RoaringBitmap()))
    bs.foreach(_.runOptimize())
    val size = 4 + 8 + bs.map(4 + _.serializedSizeInBytes()).sum
    val buf = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(Magic)
    buf.putLong(bs.size.toLong)
    bs.zipWithIndex.foreach { case (b, k) =>
      buf.putInt(k)
      b.serialize(buf)
    }
    require(!buf.hasRemaining, "bitmap size accounting bug")
    buf.array()
  }

  /** The deleted row indexes as (bucketKey → 32-bit bitmap) — the
    * contains-probe form. Accepts sparse ascending keys (the spec
    * allows skipping empty buckets even though delta writes densely).
    */
  def deserializeBitmap(bytes: Array[Byte]): Map[Long, RoaringBitmap] = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = buf.getInt
    require(magic == Magic,
      s"deletion-vector magic mismatch: got $magic, want $Magic")
    val n = buf.getLong
    require(n >= 0 && n < Int.MaxValue, s"absurd bucket count $n")
    var last = -1L
    (0L until n).map { _ =>
      val key = buf.getInt.toLong & 0xffffffffL
      require(key > last, s"bucket keys must ascend, got $key after $last")
      last = key
      val b = new RoaringBitmap()
      b.deserialize(buf)
      // deserialize(ByteBuffer) does not advance the buffer position —
      // skip the bucket's serialized bytes explicitly
      buf.position(buf.position() + b.serializedSizeInBytes())
      key -> b
    }.toMap
  }

  /** One resolved DV: the probe-form bitmap plus its cardinality. */
  final case class Resolved(buckets: Map[Long, RoaringBitmap]) {
    def contains(rowIndex: Long): Boolean =
      buckets.get(rowIndex >>> 32).exists(_.contains(rowIndex.toInt))
    def cardinality: Long = buckets.valuesIterator.map(_.getLongCardinality).sum
    /** Every marked row index, ascending — the merge input when an
      * adopted DV unions with later lazy-delete marks.
      */
    def rowIndexes: Iterator[Long] =
      buckets.toSeq.sortBy(_._1).iterator.flatMap { case (k, b) =>
        val it = b.iterator()
        Iterator.continually(()).takeWhile(_ => it.hasNext)
          .map(_ => (k << 32) | (it.next().toLong & 0xffffffffL))
      }
  }

  // ------------------------------------------------------------ file IO

  /** Read ONE DV out of a `.bin` per the file framing: at `offset`, a
    * 4-byte big-endian size (must equal the descriptor's), the bitmap
    * bytes, a 4-byte big-endian CRC-32 over them. RANGED read — many
    * descriptors share one packed `.bin` (how Databricks writes them),
    * and re-reading the whole file per marked data file would multiply
    * the I/O by the file count.
    */
  def readFromFile(file: GPath, offset: Int, sizeInBytes: Int): Array[Byte] = {
    val total = GFiles.size(file)
    require(total >= 1, s"deletion-vector file $file is empty")
    val vb = GFiles.readRange(file, 0L, 1)
    require(vb(0) == FormatVersion,
      s"deletion-vector file $file has version ${vb(0)}")
    require(offset >= 1 && offset.toLong + 8 + sizeInBytes <= total,
      s"deletion-vector offset $offset + $sizeInBytes overruns $file ($total bytes)")
    val buf = ByteBuffer.wrap(GFiles.readRange(file, offset.toLong, 8 + sizeInBytes))
      .order(ByteOrder.BIG_ENDIAN)
    val declared = buf.getInt
    require(declared == sizeInBytes,
      s"deletion-vector size mismatch in $file@$offset: file says $declared, " +
        s"descriptor says $sizeInBytes")
    val data = new Array[Byte](sizeInBytes)
    buf.get(data)
    val crcStored = buf.getInt
    val crc = new CRC32()
    crc.update(data)
    require(crcStored == crc.getValue.toInt,
      s"deletion-vector checksum mismatch in $file@$offset")
    data
  }

  /** Read the single DV a one-bitmap `.bin` stores at offset 1 (the
    * layout [[writeFile]] produces for the mirror), trusting the file's
    * own size field — the idempotency probe: a later translation
    * recovers size and cardinality without re-scanning the data file.
    */
  def readSole(file: GPath): Array[Byte] = {
    val header = ByteBuffer.wrap(GFiles.readRange(file, 0L, 5))
    require(header.get(0) == FormatVersion,
      s"deletion-vector file $file has version ${header.get(0)}")
    val size = header.order(ByteOrder.BIG_ENDIAN).getInt(1)
    readFromFile(file, 1, size)
  }

  /** Write one-or-more DVs into a single `.bin` (version byte, then
    * each as size/data/crc) atomically; returns each bitmap's offset in
    * descriptor order. The caller owns naming (deterministic UUIDs for
    * the mirror's racing writers).
    */
  def writeFile(target: GPath, bitmaps: Seq[Array[Byte]]): Seq[Int] = {
    val size = 1 + bitmaps.map(8 + _.length).sum
    val buf = ByteBuffer.allocate(size).order(ByteOrder.BIG_ENDIAN)
    buf.put(FormatVersion)
    val offsets = bitmaps.map { data =>
      val off = buf.position()
      buf.putInt(data.length)
      buf.put(data)
      val crc = new CRC32()
      crc.update(data)
      buf.putInt(crc.getValue.toInt)
      off
    }
    GFiles.createDirectories(target.getParent)
    val tmp = target.getParent.resolve(
      s".tmp-dv-${java.util.UUID.randomUUID()}")
    GFiles.write(tmp, buf.array())
    try GFiles.moveReplaceIdempotent(tmp, target)
    finally GFiles.deleteIfExists(tmp)
    offsets
  }

  /** The on-disk path a `u`-storage descriptor names: the
    * pathOrInlineDv's LAST 20 chars are the z85 UUID, anything before
    * them is a directory prefix under the table root; the file is
    * `<prefix>/deletion_vector_<canonical uuid>.bin`.
    */
  def uStoragePath(tableDir: String, pathOrInlineDv: String): GPath = {
    require(pathOrInlineDv.length >= 20,
      s"u-storage pathOrInlineDv too short: '$pathOrInlineDv'")
    val (prefix, z) = pathOrInlineDv.splitAt(pathOrInlineDv.length - 20)
    val name = s"deletion_vector_${uuidFromZ85(z)}.bin"
    if (prefix.isEmpty) GPath(tableDir, name)
    else GPath(tableDir, prefix, name)
  }

  /** Resolve a descriptor to its probe-form bitmap. */
  def resolve(tableDir: String, d: Descriptor): Resolved =
    Resolved(deserializeBitmap(resolveData(tableDir, d)))

  /** Resolve a descriptor to the VALIDATED serialized bitmap bytes
    * (magic + portable) — deserialized once here to check magic and
    * cardinality, returned serialized so a caller can broadcast the
    * compact form. `p` (absolute-path) storage reads under an explicit
    * scope rule: a LOCAL absolute path (no scheme, or `file:`) that
    * exists — the shallow-clone case, where the clone's log references
    * the SOURCE table's DV files by absolute path. Remote schemes and
    * dangling paths refuse by name, the bridge's posture on absolute
    * URIs everywhere (add.path, sidecars): never silently re-scope.
    */
  def resolveData(tableDir: String, d: Descriptor): Array[Byte] = {
    val data = d.storageType match {
      case "i" => z85Decode(d.pathOrInlineDv)
      case "u" =>
        val off = d.offset.getOrElse(1)
        readFromFile(uStoragePath(tableDir, d.pathOrInlineDv), off, d.sizeInBytes)
      case "p" =>
        val u = new java.net.URI(d.pathOrInlineDv)
        require(u.getScheme == null || u.getScheme == "file",
          s"deletion vector with absolute-path ('p') storage on scheme " +
            s"'${u.getScheme}' — this bridge reads local paths only, " +
            "refusing rather than guessing scope")
        val p = GPath(Option(u.getPath).getOrElse(d.pathOrInlineDv))
        require(p.raw.startsWith("/"),
          s"'p'-storage deletion vector path must be absolute, got " +
            s"'${d.pathOrInlineDv}'")
        require(GFiles.isRegularFile(p),
          s"'p'-storage deletion vector $p does not exist — the source " +
            "table this (likely shallow-cloned) log references is gone " +
            "or unreachable from here")
        readFromFile(p, d.offset.getOrElse(1), d.sizeInBytes)
      case o => throw new IllegalArgumentException(
        s"unknown deletion-vector storageType '$o'")
    }
    require(d.storageType != "i" || data.length == d.sizeInBytes || {
      // inline payloads are z85-padded to 4 bytes; tolerate descriptors
      // whose sizeInBytes is the unpadded length
      data.length > d.sizeInBytes && data.length - d.sizeInBytes < 4 &&
        data.drop(d.sizeInBytes).forall(_ == 0)
    }, s"inline deletion vector is ${data.length} bytes, descriptor says ${d.sizeInBytes}")
    val trimmed =
      if (data.length == d.sizeInBytes) data else data.take(d.sizeInBytes)
    val r = Resolved(deserializeBitmap(trimmed))
    require(r.cardinality == d.cardinality,
      s"deletion vector cardinality mismatch: bitmap has ${r.cardinality}, " +
        s"descriptor says ${d.cardinality}")
    trimmed
  }
}
