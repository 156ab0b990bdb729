package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

import java.security.MessageDigest

/** 32-bit SimHash document fingerprint as a native Catalyst expression.
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
  * hash bit j (0..31, MSB-first) is bit (7−j%8) of byte j/8 of
  * sha256(token); tokens are the DISTINCT space-separated pieces (empties
  * kept, like `split`); output = Σ_j sign_j · 2^(31−j) where sign_j is 1
  * iff more tokens set bit j than clear it.
  */
object SimHashImpl {
  def compute(text: UTF8String): Long = {
    if (text == null) return 0L
    val toks = text.toString.split(" ", -1).distinct
    val votes = new Array[Int](32)
    val md = MessageDigest.getInstance("SHA-256")
    var i = 0
    while (i < toks.length) {
      val d = md.digest(toks(i).getBytes("UTF-8"))
      var j = 0
      while (j < 32) {
        val bit = (d(j / 8) >> (7 - j % 8)) & 1
        votes(j) += (2 * bit - 1)
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 32) {
      if (votes(j) > 0) out |= 1L << (31 - j)
      j += 1
    }
    out
  }
}

case class SimHash32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    SimHashImpl.compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.llm.SimHashImpl.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

object SimHash {
  /** Column API: `simhash32($"text")`. */
  def simhash32(c: Column): Column = toColumn(SimHash32(toExpression(c)))

  /** SimHash near-dup pairs with hamming distance ≤ maxHamming (≤ 3).
    *
    * Banded join, not a cross product: the 32-bit fingerprint splits into 4
    * byte-bands; by pigeonhole, any pair within hamming 3 matches on at
    * least one untouched band, so candidates come from equi-joins on
    * (band, byte) buckets — the same linear-vs-quadratic trade as MinHash
    * LSH. Buckets over `bucketCap` docs are dropped (a byte band has only
    * 256 values, so at corpus scale hot buckets are inevitable — the cap is
    * the same guard as `MinHashDedup.candidatePairs`; a production-scale
    * corpus would move to a 64-bit simhash with 16-bit bands before ever
    * raising the cap).
    */
  def hammingPairs(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, maxHamming: Int, bucketCap: Int = 10000): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(maxHamming <= 3, "4 byte-bands guarantee recall only up to hamming 3")
    val h = Spread(docs).select(col(idCol), simhash32(col(textCol)).as("simhash"))
    val bands = h.select(col(idCol), col("simhash"),
      explode(array((0 until 4).map(i => struct(lit(i).as("band"),
        shiftright(col("simhash"), 8 * i).bitwiseAND(lit(255L)).as("bv"))): _*)).as("b"))
      .select(col(idCol), col("simhash"), col("b.band").as("band"), col("b.bv").as("bv"))
    // bucket gate as a window count over the (band, bv) shuffle the
    // self-join reuses — one exchange for the whole candidate stage
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band"), col("bv"))
    val inOk = bands
      .withColumn("__bn", count(lit(1)).over(w))
      .filter(col("__bn") >= 2 && col("__bn") <= bucketCap)
      .drop("__bn")
    val a = inOk.select(col(idCol).as("doc_a"), col("simhash").as("sh_a"),
      col("band"), col("bv"))
    val b = inOk.select(col(idCol).as("doc_b"), col("simhash").as("sh_b"),
      col("band"), col("bv"))
    a.join(b, Seq("band", "bv"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "sh_a", "sh_b").distinct()
      .withColumn("hamming", expr("bit_count(sh_a ^ sh_b)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }
}
