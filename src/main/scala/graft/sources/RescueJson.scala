package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

/** Auto-Loader-style rescue for NDJSON: the shared projection behind the
  * batch ([[Sources.ndjsonWithRescue]]) and streaming
  * ([[graft.streaming.FileStreamIngest.bronzeJsonStream]]) sources.
  *
  * `schemaEvolutionMode=rescue` (`bronze_fundamentals_auto_loader.ipynb:91-95`)
  * has TWO capture paths, both emulated here:
  *   - a line that doesn't parse into the declared schema lands whole in
  *     `_rescued_data` (permissive corrupt-record capture);
  *   - a VALID row carrying top-level fields the schema doesn't declare
  *     gets those extra fields — original JSON values preserved, plus the
  *     `_file_path` breadcrumb Auto Loader adds — as a JSON object in
  *     `_rescued_data`, instead of silently dropping them.
  * Field-name matching is case-sensitive (Spark's JSON parser resolution).
  *
  * The extras pass re-reads the raw line in a UDF — acceptable at the
  * ingest boundary (one extra parse per arriving row, scan-local, no
  * shuffle), and the price of exact value preservation: assembling extras
  * from `get_json_object` cannot tell the string "2" from the number 2.
  */
object RescueJson {

  private val mapper = new ObjectMapper()

  /** JSON object of the top-level fields of `raw` that are NOT in
    * `declared` (original values verbatim), tagged with `_file_path`;
    * null when `raw` isn't a JSON object or has no undeclared fields.
    */
  def extraFields(raw: String, declared: Set[String], filePath: String): String = {
    if (raw == null) return null
    try {
      val node = mapper.readTree(raw)
      node match {
        case obj: ObjectNode =>
          val extras = mapper.createObjectNode()
          obj.fields().forEachRemaining { e =>
            if (!declared.contains(e.getKey)) extras.set[ObjectNode](e.getKey, e.getValue)
          }
          if (extras.isEmpty) null
          else {
            if (filePath != null) extras.put("_file_path", filePath)
            mapper.writeValueAsString(extras)
          }
        case _ => null
      }
    } catch { case _: Exception => null } // corrupt path owns malformed lines
  }

  /** Columns projecting a raw NDJSON line (`value` from a text source)
    * into the declared schema plus `_rescued_data`.
    */
  def rescueProjection(value: Column, schema: StructType): Seq[Column] = {
    val corruptField = "__corrupt"
    val parsed = from_json(value, schema.add(StructField(corruptField, StringType)),
      Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> corruptField))
    val declared = schema.fieldNames.toSet
    val extrasUdf = udf((raw: String, path: String) => extraFields(raw, declared, path))
    schema.fieldNames.toIndexedSeq.map(f => parsed.getField(f).as(f)) :+
      coalesce(
        parsed.getField(corruptField), // malformed line: whole line rescued
        extrasUdf(value, col("_metadata.file_path"))).as("_rescued_data")
  }
}
