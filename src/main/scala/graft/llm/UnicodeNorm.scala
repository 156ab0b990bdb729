package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import java.text.Normalizer

/** Unicode normalization as a native codegen'd expression — the
  * canonicalization step that must run BEFORE any text dedup or hashing:
  * "é" (U+00E9) and "e"+combining-acute (U+0065 U+0301) are the same text
  * to a reader but different bytes to sha256/MinHash/SimHash, so an
  * unnormalized corpus under-deduplicates and double-counts vocabulary.
  *
  * NFC is the storage/dedup form (canonical composition, lossless); NFKC
  * additionally folds compatibility forms (ligatures, full-width digits)
  * and is the usual pre-tokenization form. Both via `java.text.Normalizer`
  * (the JDK's Unicode implementation). The fast path returns the input
  * buffer untouched when it is already normalized — on real corpora the
  * overwhelmingly common case, checked without allocation — so the scan
  * cost is one pass over the bytes, not a rewrite.
  *
  * Spark has no built-in for this; a Scala UDF would box every row. As a
  * `UnaryExpression` with a static-call `doGenCode` it stays inside the
  * whole-stage-codegen span like [[SimHashN]] and [[MinHashSigExpr]].
  */
object UnicodeNormImpl {
  def normalize(s: UTF8String, nfkc: Boolean): UTF8String = {
    if (s == null) return null
    val form = if (nfkc) Normalizer.Form.NFKC else Normalizer.Form.NFC
    val str = s.toString
    if (Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(Normalizer.normalize(str, form))
  }
}

case class UnicodeNormalize(child: Expression, nfkc: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = if (nfkc) "nfkc_normalize" else "nfc_normalize"
  override def nullSafeEval(v: Any): Any =
    UnicodeNormImpl.normalize(v.asInstanceOf[UTF8String], nfkc)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.llm.UnicodeNormImpl.normalize($c, $nfkc)")
  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object UnicodeNorm {
  /** Column API: canonical composition (the dedup/storage form). */
  def nfc(c: Column): Column = toColumn(UnicodeNormalize(toExpression(c), nfkc = false))

  /** Column API: compatibility composition (the pre-tokenization form). */
  def nfkc(c: Column): Column = toColumn(UnicodeNormalize(toExpression(c), nfkc = true))

  /** C0/DEL control characters that survive in scraped text (everything
    * except \t \n \r) — stripped by [[sanitize]]. Same class syntax in
    * Java regex and RE2, so the oracle regexp is byte-for-byte this.
    */
  val ControlClass = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"

  /** The full text-sanitize step: NFC-compose, strip stray control
    * characters, trim. Idempotent; scan-local.
    */
  def sanitize(c: Column): Column =
    trim(regexp_replace(nfc(c), ControlClass, ""))
}
