package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import java.security.MessageDigest

/** Raw-zone envelope builder + content hashing.
  *
  * Reproduces the reference's NDJSON statement envelope
  * (`stock_pipeline/scripts/fmp_dump_raw.py:197-243`): the raw payload JSON
  * is preserved as a string column, with promoted metadata around it —
  * symbol, snapshot date, endpoint, fetch timestamp, source literal, HTTP
  * status — plus two semantic extractions with fallback key aliases
  * (`fiscal_period_end` = payload.date ?? payload.fiscalDateEnding;
  * `filing_date` = payload.fillingDate ?? payload.filingDate, `:226-227`)
  * and a sha256 content hash of the canonical payload (`:222-223`).
  *
  * Everything is a narrow projection over built-ins (`get_json_object`,
  * `coalesce`, `sha2`) — codegen'd, scan-local, no shuffle.
  */
object Envelope {

  /** Extract a payload field trying `keys` in order (coalesce-fallback). */
  def jsonField(payload: Column, keys: Seq[String]): Column =
    coalesce(keys.map(k => get_json_object(payload, s"$$.$k")): _*)

  /** Ingest-run metadata columns (reference `fmp_dump_raw.py:236-241` and
    * `bronze_fundamentals_auto_loader.ipynb:101-108`): a per-row `request_id`
    * uuid plus the `_processing_time` ingest timestamp. Nondeterministic by
    * design — shape-tested in specs, never oracle-compared.
    */
  def withIngestMeta(df: DataFrame): DataFrame =
    df.withColumn("request_id", expr("uuid()"))
      .withColumn("_processing_time", current_timestamp())

  /** Row-level sha256 of the payload string (P9). */
  def payloadHash(payload: Column): Column = sha2(payload, 256)

  /** File-level hash: sha256 over the newline-joined payloads in canonical
    * (sorted) order — order-insensitive to input arrival, matching the
    * reference's deterministic per-day file hash (`ingest_fmp_prices.py:281-284`).
    * Use inside a groupBy(day).agg(...).
    */
  def fileHash(payload: Column): Column =
    sha2(array_join(array_sort(collect_list(payload)), "\n"), 256)

  // JSON parser/serializer reproducing CPython's
  // `json.dumps(json.loads(s), sort_keys=True)` BYTE FOR BYTE — the
  // reference hashes `sha256(json.dumps(payload, sort_keys=True))`
  // (`fmp_dump_raw.py:222`), so cross-system dedup/idempotency keyed on
  // that hash only works if we emit the exact same text: `", "`/`": "`
  // separators, ensure_ascii \uXXXX escaping, code-point key order,
  // Python int/float repr for numbers. Spark's `to_json` keeps struct
  // field order and cannot sort keys, hence the hand-rolled serializer
  // behind a UDF (sanctioned by SURVEY §2.11).
  private object MiniJson {
    sealed trait J
    case class JObj(fields: List[(String, J)]) extends J
    case class JArr(items: List[J]) extends J
    case class JStr(s: String) extends J // decoded
    case class JInt(digits: String) extends J // canonical int repr
    case class JFloat(d: Double) extends J
    case class JLit(s: String) extends J // true / false / null

    def parse(s: String): (J, Int) = parseValue(s, skipWs(s, 0))

    private def skipWs(s: String, i: Int): Int = {
      var j = i; while (j < s.length && s(j).isWhitespace) j += 1; j
    }
    private def parseValue(s: String, i0: Int): (J, Int) = s(i0) match {
      case '{' =>
        var i = skipWs(s, i0 + 1); var fs = List.empty[(String, J)]
        if (s(i) == '}') (JObj(Nil), i + 1)
        else {
          while (s(i) != '}') {
            val (JStr(k), i1) = parseValue(s, skipWs(s, i)): @unchecked
            val i2 = skipWs(s, i1)
            require(s(i2) == ':', s"expected : at $i2")
            val (v, i3) = parseValue(s, skipWs(s, i2 + 1))
            fs ::= (k -> v)
            i = skipWs(s, i3)
            if (s(i) == ',') i = skipWs(s, i + 1)
          }
          (JObj(fs.reverse), i + 1)
        }
      case '[' =>
        var i = skipWs(s, i0 + 1); var items = List.empty[J]
        if (s(i) == ']') (JArr(Nil), i + 1)
        else {
          while (s(i) != ']') {
            val (v, i1) = parseValue(s, i)
            items ::= v
            i = skipWs(s, i1)
            if (s(i) == ',') i = skipWs(s, i + 1)
          }
          (JArr(items.reverse), i + 1)
        }
      case '"' =>
        val sb = new StringBuilder; var i = i0 + 1
        while (s(i) != '"') {
          if (s(i) == '\\') {
            s(i + 1) match {
              case 'n' => sb.append('\n'); i += 2
              case 't' => sb.append('\t'); i += 2
              case 'r' => sb.append('\r'); i += 2
              case 'b' => sb.append('\b'); i += 2
              case 'f' => sb.append('\f'); i += 2
              case 'u' =>
                sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
                i += 6
              case c => sb.append(c); i += 2 // \" \\ \/
            }
          } else { sb.append(s(i)); i += 1 }
        }
        (JStr(sb.toString), i + 1)
      case _ =>
        var i = i0
        while (i < s.length && !",}]: \t\n\r".contains(s(i))) i += 1
        val tok = s.substring(i0, i)
        val j = tok match {
          case "true" | "false" | "null" => JLit(tok)
          case "NaN" => JFloat(Double.NaN)
          case "Infinity" => JFloat(Double.PositiveInfinity)
          case "-Infinity" => JFloat(Double.NegativeInfinity)
          case t if t.forall(c => c.isDigit || c == '-') => JInt(canonInt(t))
          case t => JFloat(t.toDouble)
        }
        (j, i)
    }

    // Python int repr of the token: arbitrary precision, "-0"/leading
    // zeros normalized
    private def canonInt(t: String): String = {
      val neg = t.startsWith("-")
      val digits = (if (neg) t.substring(1) else t).dropWhile(_ == '0')
      if (digits.isEmpty) "0" else (if (neg) "-" else "") + digits
    }

    // Python code-point string order (UTF-16 compareTo misorders
    // supplementary chars against U+E000..U+FFFF)
    private def cpLt(a: String, b: String): Boolean = {
      var i = 0; var j = 0
      while (i < a.length && j < b.length) {
        val ca = a.codePointAt(i); val cb = b.codePointAt(j)
        if (ca != cb) return ca < cb
        i += Character.charCount(ca); j += Character.charCount(cb)
      }
      a.length - i < b.length - j
    }

    def write(j: J): String = j match {
      case JObj(fs) =>
        // duplicate keys: Python dict keeps the LAST value per key
        val lastWins = fs.foldLeft(Map.empty[String, J])(_ + _)
        lastWins.keys.toList.sortWith(cpLt)
          .map(k => pyStr(k) + ": " + write(lastWins(k)))
          .mkString("{", ", ", "}")
      case JArr(items) => items.map(write).mkString("[", ", ", "]")
      case JStr(s) => pyStr(s)
      case JInt(d) => d
      case JFloat(d) => pyFloatRepr(d)
      case JLit(s) => s
    }

    // json.dumps default ensure_ascii: everything outside 0x20..0x7E
    // escaped (\uXXXX per UTF-16 unit, so non-BMP becomes a surrogate pair)
    private def pyStr(s: String): String = {
      val sb = new StringBuilder("\"")
      s.foreach {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case c if c < 0x20 || c > 0x7E => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      sb.append('"').toString
    }

    /** Python float.__repr__: shortest decimal digits that round-trip,
      * fixed notation for decimal exponent in (-4, 16], else scientific
      * with signed ≥2-digit exponent.
      */
    def pyFloatRepr(d: Double): String = {
      if (d.isNaN) return "NaN"
      if (d == Double.PositiveInfinity) return "Infinity"
      if (d == Double.NegativeInfinity) return "-Infinity"
      if (d == 0.0) return if (1.0 / d < 0) "-0.0" else "0.0"
      val neg = d < 0
      val a = math.abs(d)
      // shortest correctly-rounded digits: minimal precision that round-trips
      val exact = new java.math.BigDecimal(a)
      var bd: java.math.BigDecimal = null
      var p = 1
      while (bd == null && p <= 17) {
        val cand = exact.round(new java.math.MathContext(p, java.math.RoundingMode.HALF_EVEN))
        if (cand.doubleValue() == a) bd = cand
        p += 1
      }
      if (bd == null) bd = exact // unreachable: 17 digits always round-trip
      val stripped = bd.stripTrailingZeros()
      val digits = stripped.unscaledValue().abs().toString
      val decpt = digits.length - stripped.scale() // value = 0.digits × 10^decpt
      val body =
        if (decpt > 16 || decpt <= -4) { // scientific
          val mant = if (digits.length == 1) digits
            else digits.substring(0, 1) + "." + digits.substring(1)
          f"${mant}e${decpt - 1}%+03d"
        } else if (decpt <= 0) "0." + ("0" * -decpt) + digits
        else if (decpt >= digits.length)
          digits + ("0" * (decpt - digits.length)) + ".0"
        else digits.substring(0, decpt) + "." + digits.substring(decpt)
      if (neg) "-" + body else body
    }
  }

  /** Canonical form of a JSON document: byte-identical to CPython's
    * `json.dumps(json.loads(s), sort_keys=True)` — sorted keys (code-point
    * order) at every nesting level, `", "`/`": "` separators, ensure_ascii
    * escapes, Python int/float repr.
    */
  def canonicalize(s: String): String =
    if (s == null) null else MiniJson.write(MiniJson.parse(s)._1)

  /** Rescue-friendly canonicalization: malformed payloads yield null
    * instead of failing the job (the raw-zone posture — bad rows land in
    * quarantine/_rescued_data, they don't kill a 100 TB backfill).
    */
  def canonicalizeOrNull(s: String): String =
    try canonicalize(s) catch { case _: Exception => null }

  val canonicalizeOrNullUdf = udf(canonicalizeOrNull _)

  /** Exposed for fixture tests against CPython output. */
  private[graft] def pyFloatRepr(d: Double): String = MiniJson.pyFloatRepr(d)

  val canonicalJsonUdf = udf(canonicalize _)

  /** sha256 hex of the canonical JSON — matches the reference's
    * `sha256(json.dumps(payload, sort_keys=True))` key-order-independent
    * content hash (`fmp_dump_raw.py:222-223`,
    * `tests/test_fmp_dump_raw.py:127-149`).
    */
  def canonicalHash(s: String): String =
    if (s == null) null
    else MessageDigest.getInstance("SHA-256")
      .digest(canonicalize(s).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  val canonicalHashUdf = udf(canonicalHash _)
}
