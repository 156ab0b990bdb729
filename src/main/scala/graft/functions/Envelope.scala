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

  // Minimal JSON parser/serializer for canonicalization: re-serialize a
  // (flat or nested) JSON object with lexicographically sorted keys — the
  // semantics of the reference's `json.dumps(payload, sort_keys=True)`
  // (`fmp_dump_raw.py:222`). Spark's `to_json` keeps struct field order and
  // cannot sort keys, hence the tiny hand-rolled serializer behind a UDF.
  private object MiniJson {
    sealed trait J
    case class JObj(fields: List[(String, J)]) extends J
    case class JArr(items: List[J]) extends J
    case class JStr(s: String) extends J
    case class JRaw(s: String) extends J // numbers / true / false / null verbatim

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
          if (s(i) == '\\') { sb.append(s(i)).append(s(i + 1)); i += 2 }
          else { sb.append(s(i)); i += 1 }
        }
        (JStr(sb.toString), i + 1)
      case _ =>
        var i = i0
        while (i < s.length && !",}] \t\n\r".contains(s(i))) i += 1
        (JRaw(s.substring(i0, i)), i)
    }

    def write(j: J): String = j match {
      case JObj(fs) =>
        fs.sortBy(_._1).map { case (k, v) => "\"" + k + "\":" + write(v) }
          .mkString("{", ",", "}")
      case JArr(items) => items.map(write).mkString("[", ",", "]")
      case JStr(s) => "\"" + s + "\""
      case JRaw(s) => s
    }
  }

  /** Sorted-keys canonical form of a JSON document (nulls stay, key order
    * lexicographic at every nesting level, separators `,`/`:`).
    */
  def canonicalize(s: String): String =
    if (s == null) null else MiniJson.write(MiniJson.parse(s)._1)

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
