package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

import java.security.MessageDigest

/** SimHash document fingerprint (32- or 64-bit) as a native Catalyst
  * expression.
  *
  * Near-duplicate fingerprinting for the training-data plane: documents
  * whose simhashes differ in few bits are near-dups. The per-row algorithm
  * (token-set sha256 → per-bit vote → sign) has no Spark built-in and a
  * Scala UDF would box every row, so it's a codegen-friendly
  * `UnaryExpression`: `doGenCode` emits a static call, keeping the operator
  * inside the whole-stage-codegen span (no iterator breaks, no row boxing —
  * the property that matters when fingerprinting 100 TB of text).
  *
  * Bit convention (mirrors the SQL-expressible oracle formulation): token
  * hash bit j (0..bits−1, MSB-first) is bit (7−j%8) of byte j/8 of
  * sha256(token); tokens are the DISTINCT space-separated pieces (empties
  * kept, like `split`); output = Σ_j sign_j · 2^(bits−1−j) where sign_j is
  * 1 iff more tokens set bit j than clear it. The first 32 signs are the
  * same at either width, so `simhash64 >>> 32 == simhash32` — widening the
  * fingerprint refines, never reshuffles, the 32-bit prefix. 64-bit is the
  * production width (16-bit bands don't saturate at corpus scale); 32-bit
  * stays for compactness and the legacy oracle.
  */
object SimHashImpl {
  def compute(text: UTF8String, bits: Int): Long = {
    if (text == null) return 0L
    val toks = text.toString.split(" ", -1).distinct
    val votes = new Array[Int](bits)
    val md = MessageDigest.getInstance("SHA-256")
    var i = 0
    while (i < toks.length) {
      val d = md.digest(toks(i).getBytes("UTF-8"))
      var j = 0
      while (j < bits) {
        val bit = (d(j / 8) >> (7 - j % 8)) & 1
        votes(j) += (2 * bit - 1)
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < bits) {
      if (votes(j) > 0) out |= 1L << (bits - 1 - j)
      j += 1
    }
    out
  }
}

case class SimHashN(child: Expression, bits: Int) extends UnaryExpression {
  require(bits == 32 || bits == 64, s"simhash width must be 32 or 64, got $bits")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = s"simhash$bits"
  override def nullSafeEval(v: Any): Any =
    SimHashImpl.compute(v.asInstanceOf[UTF8String], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.llm.SimHashImpl.compute($c, $bits)")
  override protected def withNewChildInternal(newChild: Expression): SimHashN =
    copy(child = newChild)
}

object SimHash {
  /** Column API: `simhash32($"text")`. */
  def simhash32(c: Column): Column = toColumn(SimHashN(toExpression(c), 32))

  /** Column API: `simhash64($"text")` — the production width. */
  def simhash64(c: Column): Column = toColumn(SimHashN(toExpression(c), 64))

  /** The 4-band LSH decomposition of a fingerprint column — ONE
    * definition shared by the batch pair join ([[hammingPairs]]) and the
    * streaming bucket state ([[graft.streaming.StatefulOps.nearDupPairs]]),
    * whose pair-set equality depends on banding identically. Logical
    * shift: a 64-bit fingerprint uses the sign bit as data.
    */
  def bandStructs(simhashCol: Column, bits: Int): Column = {
    require(bits == 32 || bits == 64, s"simhash width must be 32 or 64, got $bits")
    import org.apache.spark.sql.functions._
    val bandBits = bits / 4
    val mask = (1L << bandBits) - 1
    array((0 until 4).map(i => struct(lit(i).as("band"),
      shiftrightunsigned(simhashCol, bandBits * i)
        .bitwiseAND(lit(mask)).as("bv"))): _*)
  }

  /** SimHash near-dup pairs with hamming distance ≤ maxHamming (≤ 3).
    *
    * Banded join, not a cross product: the fingerprint splits into 4
    * equal bands; by pigeonhole, any pair within hamming 3 matches on at
    * least one untouched band, so candidates come from equi-joins on
    * (band, value) buckets — the same linear-vs-quadratic trade as MinHash
    * LSH. Buckets over `bucketCap` docs are dropped, the same guard as
    * `MinHashDedup.candidatePairs`.
    *
    * `bits=64` (16-bit bands, 65 536 values each) is the production
    * setting: 32-bit byte-bands have only 256 values, so at corpus scale
    * every band value floods its bucket and the cap starts costing recall;
    * 64-bit moves that saturation point out by 256×.
    */
  /** The (id, fingerprint) projection at one width, input-spread for the
    * per-row-heavy hash pass — the frame callers memoize so one
    * fingerprint pass serves every simhash consumer.
    */
  def hashes(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, bits: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val sh = if (bits == 64) simhash64(col(textCol)) else simhash32(col(textCol))
    Spread(docs).select(col(idCol), sh.as("simhash"))
  }

  def hammingPairs(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, maxHamming: Int, bucketCap: Int = 10000,
      bits: Int = 32): org.apache.spark.sql.DataFrame = {
    require(maxHamming <= 3, "4 bands guarantee recall only up to hamming 3")
    // width check lives in bandStructs: any other value silently computes
    // the 32-bit fingerprint with misaligned bands (e.g. bits=48 → one
    // all-zero band = a single capped mega-bucket, losing recall silently)
    hammingPairsOn(hashes(docs, idCol, textCol, bits),
      idCol, "simhash", maxHamming, bucketCap, bits)
  }

  /** Band-bucket occupancy audit for [[hammingPairsOn]]'s cap gate — the
    * SimHash member of the no-silent-caps family (`MinHashDedup
    * .bucketStats`, `TextOps.winnowCoverage`). This is the plane where
    * the audit earns its keep: the 10× scale probe's one superlinear
    * finding is simhash band buckets saturating on dense corpora, and
    * 32-bit fingerprints (256-value byte bands) saturate 256× sooner
    * than the production 64-bit width. One corpus-size-invariant row off
    * the (band, bv) exchange: bucket counts by occupancy class, row mass
    * per class, and `pair_coverage` under `bucketCap`.
    */
  def bandCoverage(hashes: org.apache.spark.sql.DataFrame, idCol: String,
      hashCol: String, bucketCap: Int, bits: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val per = hashes.select(col(hashCol).as("__h"))
      .select(explode(bandStructs(col("__h"), bits)).as("b"))
      .select(col("b.band").as("band"), col("b.bv").as("bv"))
      .groupBy(col("band"), col("bv")).agg(count(lit(1)).as("n_occ"))
    per.agg(
        count(lit(1)).as("n_buckets"),
        sum(col("n_occ")).as("n_rows_total"),
        sum(when(col("n_occ") === 1, 1L).otherwise(0L))
          .as("n_buckets_singleton"),
        sum(when(col("n_occ") > bucketCap, 1L).otherwise(0L))
          .as("n_buckets_hot"),
        sum(when(col("n_occ") > bucketCap, col("n_occ")).otherwise(0L))
          .as("n_rows_hot"),
        sum(when(col("n_occ").between(2, bucketCap), col("n_occ"))
          .otherwise(0L)).as("n_rows_pairable"))
      .select(col("n_buckets"), col("n_rows_total"),
        col("n_buckets_singleton"), col("n_buckets_hot"), col("n_rows_hot"),
        col("n_rows_pairable"),
        (col("n_rows_pairable").cast("double") / col("n_rows_total"))
          .as("pair_coverage"))
  }

  /** The banded hamming join over a PRECOMPUTED fingerprint column — the
    * candidate machinery of [[hammingPairs]], factored out because the
    * banding is a property of the fingerprint width, not of text:
    * [[graft.llm.ImageHash.dhashPairs]] runs perceptual image hashes
    * through the identical stage. Same guarantees: 4-band pigeonhole
    * recall to hamming ≤ 3, bucketCap gate BEFORE pair expansion, one
    * (band, value) exchange reused by the self-join.
    */
  def hammingPairsOn(hashes: org.apache.spark.sql.DataFrame, idCol: String,
      hashCol: String, maxHamming: Int, bucketCap: Int,
      bits: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(maxHamming <= 3, "4 bands guarantee recall only up to hamming 3")
    val h = hashes.select(col(idCol), col(hashCol).as("__h"))
    val bands = h.select(col(idCol), col("__h"),
      explode(bandStructs(col("__h"), bits)).as("b"))
      .select(col(idCol), col("__h"), col("b.band").as("band"), col("b.bv").as("bv"))
    // bucket gate as a window count over the (band, bv) shuffle the
    // self-join reuses — one exchange for the whole candidate stage
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band"), col("bv"))
    val inOk = bands
      .withColumn("__bn", count(lit(1)).over(w))
      .filter(col("__bn") >= 2 && col("__bn") <= bucketCap)
      .drop("__bn")
    // the probe side arrives partitioned by (band, bv) from the window's
    // exchange, so a HOT bucket's whole n² pair expansion lands in ONE
    // task while the rest of the cluster idles (the build side is a
    // broadcast — generation cost lives entirely on the probe side).
    // Re-keying the probe side by doc id spreads each bucket's rows
    // evenly: per-row probe work is proportional to its bucket's size,
    // so hot-bucket rows distribute across all tasks (guide §2.5 —
    // deterministic key, safe under retry). The tiny band-row shuffle
    // costs far less than a serialized hot bucket.
    val a = inOk.select(col(idCol).as("doc_a"), col("__h").as("sh_a"),
      col("band"), col("bv")).repartition(col("doc_a"))
    val b = inOk.select(col(idCol).as("doc_b"), col("__h").as("sh_b"),
      col("band"), col("bv"))
    // hamming filter BEFORE the dedup shuffle: a saturated band (the
    // 32-bit byte-band regime) emits millions of candidate pairs but
    // only a sliver survive the distance cut — bit_count is a scan-local
    // per-row op, so applying it first means the distinct() exchange
    // carries matching pairs only (guide §2.3, shuffle fewer bytes)
    a.join(b, Seq("band", "bv"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("hamming", expr("bit_count(sh_a ^ sh_b)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .distinct()
  }
}
