package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Streaming run metrics — the K3 metrics document on the streaming side
  * (reference writes one JSON metrics doc per batch run,
  * `ingest_fmp_prices.py:580-604`; Databricks surfaces the same numbers
  * via query progress). A [[StreamingQueryListener]] appends one JSON line
  * per micro-batch progress event: query id, batch id, input rows,
  * processed rows/sec, sink description.
  *
  * Driver-side file append is deliberate: progress events are tiny,
  * ordered, and emitted once per batch — no executor involvement.
  */
class MetricsListener(outFile: String) extends StreamingQueryListener {
  import MetricsListener.{jsonEscape, jsonNum}

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    val line = s"""{"query_id":"${p.id}","run_id":"${p.runId}","batch_id":${p.batchId},""" +
      s""""timestamp":"${p.timestamp}","num_input_rows":${p.numInputRows},""" +
      s""""processed_rows_per_second":${jsonNum(p.processedRowsPerSecond)},""" +
      s""""sink":"${jsonEscape(p.sink.description)}"}""" + "\n"
    val path = Paths.get(outFile)
    if (path.getParent != null) Files.createDirectories(path.getParent)
    Files.write(path, line.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
}

object MetricsListener {

  // the metrics file is consumed by JSON parsers (spark.read.json,
  // json.loads): bare NaN from a zero-duration/no-data micro-batch or an
  // unescaped backslash/newline in a sink description would corrupt the
  // whole line — emit null for non-finite doubles and escape strings fully
  private[graft] def jsonNum(d: Double): String =
    if (java.lang.Double.isFinite(d)) d.toString else "null"
  private[graft] def jsonEscape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** Attach a metrics listener to the session; returns it for removal. */
  def attach(spark: SparkSession, outFile: String): MetricsListener = {
    val l = new MetricsListener(outFile)
    spark.streams.addListener(l)
    l
  }
}
