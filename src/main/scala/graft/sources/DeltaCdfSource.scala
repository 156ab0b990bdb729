package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType

import graft.tables.{DeltaLogBridge, GFiles, GPath}

/** Checkpointed STREAMING consumption of a foreign Delta table's change
  * feed — `spark.readStream.format("delta-cdf").option("path", dir)` —
  * without adopting the table first. The reference's Silver layer is
  * exactly this consumer: an incremental `readChangeFeed` over the
  * Bronze Delta table (`docs/databricks_setup.md:170-198`), MERGEd
  * forward per micro-batch. Until now the bridge served CDF in batch
  * ranges only ([[DeltaLogBridge.readChanges]]) and a streaming
  * consumer had to adopt the table (`convertFromDelta` +
  * `readChangesStream`); a read-only consumer shouldn't have to take
  * ownership of a log to follow it.
  *
  * Offsets are DELTA COMMIT VERSIONS (the last consumed one), the same
  * shape as the commitlog CDF stream: versions are immutable, so a
  * checkpointed offset replays deterministically and exactly-once falls
  * out of the engine's offset log. Each micro-batch is
  * `readChanges(lastConsumed + 1, head)` — cdc-exclusive when the
  * foreign writer emitted cdc, derived insert/whole-file-delete images
  * otherwise, and the underivable commits refuse loudly mid-stream
  * rather than serving a silent hole (the bridge's batch rule, which a
  * stream must inherit: an incremental consumer that silently skips a
  * rewrite has lost data).
  *
  * `startingVersion` defaults to the oldest commit JSON still in the
  * log (the from-the-beginning read over a retention-trimmed log serves
  * the survivors); an explicit version below the floor refuses via the
  * bridge's own range check. `maxVersionsPerTrigger` paces catch-up
  * reads (planning per trigger is one log listing + O(range) JSON
  * reads — Delta's own per-version CDF cost).
  *
  * The declared schema is the log HEAD's schema at stream construction
  * (+ `_change_type`, `_commit_version`); restart after a foreign
  * schema evolution to widen — the same contract every streaming
  * source here has.
  */
final class DeltaCdfDataSource extends DataSourceRegister
    with org.apache.spark.sql.sources.StreamSourceProvider {

  override def shortName(): String = "delta-cdf"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "delta-cdf source: missing path"))

  private def cdfSchema(spark: SparkSession, dir: String): StructType = {
    val s = DeltaLogBridge.snapshot(spark, dir).schema
    StructType(s.fields.map(_.copy(metadata =
        org.apache.spark.sql.types.Metadata.empty)) :+
      org.apache.spark.sql.types.StructField("_change_type",
        org.apache.spark.sql.types.StringType) :+
      org.apache.spark.sql.types.StructField("_commit_version",
        org.apache.spark.sql.types.LongType, nullable = false))
  }

  override def sourceSchema(sqlContext: org.apache.spark.sql.SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), cdfSchema(sqlContext.sparkSession, pathOf(parameters)))

  override def createSource(sqlContext: org.apache.spark.sql.SQLContext,
      metadataPath: String, schema: Option[StructType],
      providerName: String, parameters: Map[String, String])
      : org.apache.spark.sql.execution.streaming.Source = {
    import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
    import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
    val spark = sqlContext.sparkSession
    val dir = pathOf(parameters)
    val logDir = GPath(dir, "_delta_log")
    require(GFiles.isDirectory(logDir), s"delta-cdf source: no _delta_log at $dir")
    def jsonVersions(): Seq[Long] =
      GFiles.list(logDir).map(_.fileName)
        .filter(n => n.length == 25 && n.endsWith(".json") &&
          n.dropRight(5).forall(_.isDigit))
        .map(_.dropRight(5).toLong).sorted
    val starting: Long = parameters.get("startingVersion").map(_.toLong)
      .getOrElse {
        val vs = jsonVersions()
        require(vs.nonEmpty, s"delta-cdf source: empty _delta_log at $dir")
        vs.head
      }
    val maxVersions: Long = parameters.get("maxVersionsPerTrigger")
      .map(_.toLong).getOrElse(Long.MaxValue)
    require(maxVersions > 0, "maxVersionsPerTrigger must be positive")
    val declaredSchema = cdfSchema(spark, dir)
    new Source {
      private def ver(o: V1Offset): Long = o match {
        case l: LongOffset => l.offset
        case s: SerializedOffset => LongOffset(s).offset
        case other => other.json.toLong
      }
      // catch-up pacing state: the newest version a produced batch
      // ENDED at (seeded by the checkpoint via getBatch on restart)
      @volatile private var consumed: Long = starting - 1
      override def schema: StructType = declaredSchema
      override def getOffset: Option[V1Offset] = {
        val vs = jsonVersions()
        val head = if (vs.isEmpty) -1L else vs.max
        if (head < starting) None
        else {
          val cap = // saturating: the default pace is "everything"
            if (Long.MaxValue - maxVersions < consumed) Long.MaxValue
            else consumed + maxVersions
          Some(LongOffset(math.min(head, cap)))
        }
      }
      override def getBatch(start: Option[V1Offset],
          end: V1Offset): org.apache.spark.sql.DataFrame = {
        val from = start.map(ver(_) + 1).getOrElse(starting)
        // seed pacing from BOTH bounds: recovery may call this with the
        // checkpointed range, and the start offset alone must be enough
        // to keep getOffset at-or-above the checkpoint even if the
        // engine's recovery replay behavior ever changes
        consumed = math.max(consumed,
          math.max(ver(end), start.map(ver).getOrElse(Long.MinValue)))
        if (ver(end) < from)
          // a stale/clamped end below the recovered start is an empty
          // batch, never a "bad CDF bounds" failure wedging the
          // checkpoint
          return org.apache.spark.sql.graftbridge.asStreamingFrame(
            spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
              declaredSchema))
        org.apache.spark.sql.graftbridge.asStreamingFrame(
          DeltaLogBridge.readChanges(spark, dir, from, ver(end)))
      }
      override def stop(): Unit = ()
      override def toString: String = s"DeltaCdfSource[$dir]"
    }
  }
}
