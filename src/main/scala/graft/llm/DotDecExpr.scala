package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

import java.math.{BigDecimal => JBigDecimal, BigInteger, RoundingMode}

/** Decimal-exact dot product of two float/double arrays as a native
  * codegen'd expression.
  *
  * Bit-identical to the declarative formulation it replaces
  * (`aggregate(zip_with(a, b, (x, y) => (x*y).cast(decimal(28,12))), 0, +)`
  * — and to the DuckDB oracle's `list_sum(list_transform(...DECIMAL(28,12)))`):
  * each pairwise product is rounded to scale 12 exactly as Spark's
  * double→decimal cast does (`BigDecimal.valueOf` + HALF_UP), the sum is
  * exact integer arithmetic on the unscaled values, and the final
  * decimal→double conversion is correctly rounded. Association-independent,
  * so results are reproducible across partitionings — which keeps top-k
  * cutoffs stable at any scale.
  *
  * Why native: the zip_with/aggregate pair is interpreted per element with
  * boxed Decimal allocations — on an n×K IVF assignment that is the entire
  * query cost. This runs as one fused loop with a long accumulator inside
  * whole-stage codegen.
  */
object DotDecImpl {

  // largest decimal(28,12) unscaled magnitude (28 nines)
  private val Max28 = new BigInteger("9" * 28)

  /** Null (boxed) on: null/length-mismatched arrays, null elements, or
    * decimal(28,12) overflow — mirroring the null-propagation of the
    * declarative form under non-ANSI casts. The overflow check runs on
    * the RUNNING sum after every term, matching the stepwise
    * `(acc + z).cast(decimal(28,12))` of the declarative/DuckDB twin: a
    * transiently overflowing intermediate that would cancel back under
    * precision 28 must still latch null.
    */
  def compute(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    if (a == null || b == null) return null
    val n = a.numElements()
    if (b.numElements() != n) return null // zip_with pads nulls → null sum
    var sum = 0L
    var overflowed = false
    var big: BigInteger = BigInteger.ZERO
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      val p = x * y
      if (java.lang.Double.isNaN(p) || java.lang.Double.isInfinite(p)) return null
      // Fast path: scale-12 HALF_UP of p via scaled-double arithmetic,
      // guarded so it is used ONLY when the float error bound provably
      // cannot straddle the .5 rounding boundary — otherwise fall back to
      // the exact BigDecimal path. Keeps bit-identical semantics while
      // skipping Double.toString/BigDecimal on ~all real data.
      val s = Math.abs(p) * 1e12
      var u: BigInteger = null
      var l = 0L
      var fits = false
      if (s < (1L << 50).toDouble) {
        val m = Math.floor(s)
        val f = s - m
        val margin = s * 1e-15 + 1e-9
        if (f > 0.5 + margin || f < 0.5 - margin) {
          l = m.toLong + (if (f > 0.5) 1L else 0L)
          if (p < 0) l = -l
          fits = true
        }
      }
      if (!fits) {
        val r = JBigDecimal.valueOf(p).setScale(12, RoundingMode.HALF_UP)
        if (r.precision() > 28) return null // cast overflow → null term → null sum
        u = r.unscaledValue()
        if (u.bitLength() <= 62) { l = u.longValue(); fits = true; u = null }
      }
      if (overflowed) big = big.add(if (u != null) u else BigInteger.valueOf(l))
      else if (u != null) { overflowed = true; big = BigInteger.valueOf(sum).add(u) }
      else {
        val s2 = sum + l
        // overflow check: sign flip against both operands
        if (((sum ^ s2) & (l ^ s2)) < 0) {
          overflowed = true; big = BigInteger.valueOf(sum).add(BigInteger.valueOf(l))
        } else sum = s2
      }
      // stepwise precision-28 latch (a plain long is ≤19 digits, so only
      // the BigInteger branch can ever trip it)
      if (overflowed && big.abs().compareTo(Max28) > 0) return null
      i += 1
    }
    val unscaled = if (overflowed) big else BigInteger.valueOf(sum)
    new JBigDecimal(unscaled, 12).doubleValue()
  }
}

case class DotDecimal(left: Expression, right: Expression) extends BinaryExpression {
  private def isFloatArr(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(s"dot_decimal needs array<float|double>, got $t")
  }
  private lazy val aFloat = isFloatArr(left)
  private lazy val bFloat = isFloatArr(right)

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    DotDecImpl.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], aFloat, bFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}_r =
        graft.llm.DotDecImpl.compute($a, $b, $aFloat, $bFloat);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.doubleValue(); }
    """)

  override def prettyName: String = "dot_decimal"
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotDecimal =
    copy(left = newLeft, right = newRight)
}

object DotDecExpr {
  /** Exact decimal-accumulated dot product, as double. */
  def dotDecimal(a: Column, b: Column): Column =
    toColumn(DotDecimal(toExpression(a), toExpression(b)))
}
