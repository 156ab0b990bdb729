package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import java.security.MessageDigest

/** One-pass MinHash signature as a native Catalyst expression.
  *
  * Semantically identical to: explode char-k-shingles → sha256 per shingle →
  * per-doc MIN of each 8-hex-char digest slice (the SQL-oracle formulation),
  * but computed per ROW with a reused digest instance and unsigned-int
  * minima — no 300×-row explode, no string aggregation buffers, no shuffle.
  * At corpus scale this turns the signature stage from a wide explode+agg
  * into a scan-local projection (the difference between re-shuffling 100 TB
  * of shingles and streaming over documents once).
  *
  * Returns an array of `numHashes` 8-hex-char strings (null for texts
  * shorter than k, which have no shingles).
  */
object MinHashSlicesImpl {
  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("SHA-256")
  }
  private val hex = "0123456789abcdef".toCharArray

  private val digestOut = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](32)
  }

  def compute(text: UTF8String, k: Int, numHashes: Int): ArrayData = {
    if (text == null) return null
    // operate on UTF-8 bytes directly: shingle windows count CODE POINTS
    // (matching Spark/DuckDB substring semantics — UTF-16 code-unit windows
    // would split surrogate pairs), and a code point's first byte is
    // recognizable from its high bits, so windows are byte ranges with no
    // per-window String/copy allocations. The UTF-8 slice of a code-point
    // substring is bit-identical to substring(..).getBytes("UTF-8").
    val bytes = text.getBytes
    val nb = bytes.length
    // code point start offsets (starts(i) = byte offset of cp i)
    val starts = new Array[Int](nb + 1)
    var nCp = 0
    var off = 0
    while (off < nb) {
      starts(nCp) = off
      val b = bytes(off) & 0xFF
      off += (if (b < 0x80) 1 else if (b < 0xE0) 2 else if (b < 0xF0) 3 else 4)
      nCp += 1
    }
    starts(nCp) = nb
    if (nCp < k) return null
    val digest = md.get()
    val out32 = digestOut.get()
    val mins = Array.fill(numHashes)(0xFFFFFFFFFFFFFFFL) // > any unsigned 32-bit
    var i = 0
    val last = nCp - k
    while (i <= last) {
      digest.reset()
      digest.update(bytes, starts(i), starts(i + k) - starts(i))
      digest.digest(out32, 0, 32)
      val d = out32
      var j = 0
      while (j < numHashes) {
        // slice j = digest bytes 4j..4j+3 == hex chars 8j..8j+7; unsigned
        // comparison of the 4-byte big-endian value == lexicographic
        // comparison of the lowercase-hex slice
        val v = ((d(4 * j) & 0xFFL) << 24) | ((d(4 * j + 1) & 0xFFL) << 16) |
          ((d(4 * j + 2) & 0xFFL) << 8) | (d(4 * j + 3) & 0xFFL)
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    val out = new Array[AnyRef](numHashes)
    var j = 0
    while (j < numHashes) {
      val v = mins(j)
      val cs = new Array[Char](8)
      var b = 0
      while (b < 8) { cs(b) = hex(((v >>> (28 - 4 * b)) & 0xF).toInt); b += 1 }
      out(j) = UTF8String.fromString(new String(cs))
      j += 1
    }
    new GenericArrayData(out)
  }
}

case class MinHashSlices(child: Expression, k: Int, numHashes: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    MinHashSlicesImpl.compute(v.asInstanceOf[UTF8String], k, numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.llm.MinHashSlicesImpl.compute($c, $k, $numHashes);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  override def prettyName: String = "minhash_slices"
  override protected def withNewChildInternal(newChild: Expression): MinHashSlices =
    copy(child = newChild)
}

object MinHashExpr {
  def minhashSlices(c: Column, k: Int, numHashes: Int): Column =
    toColumn(MinHashSlices(toExpression(c), k, numHashes))
}
