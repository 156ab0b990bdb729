package graft.sources

import scala.collection.mutable

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Cast, EvalMode}
import org.apache.spark.sql.connector.write.{DataWriter, LogicalWriteInfo, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.util.SerializableConfiguration

import graft.tables.CommitLogTable

/** V2 streaming WRITE into a commit-log catalog table — the
  * `writeStream.toTable("cat.ns.t")` the reference's Auto Loader
  * notebook runs against its bronze Delta table
  * (`bronze_prices_auto_loader.ipynb` cell 3). Two-phase, exactly-once:
  *
  *  1. '''Executors''' write their partition's rows as parquet files —
  *     under the table's immutable PHYSICAL column names, routed by the
  *     table-partition value — into a per-epoch staging area
  *     (`_streaming_stage/<queryId>/<epoch>/`). Only files named in a
  *     task's commit message exist for the driver; a retried or
  *     speculative task's abandoned output stays in staging and is
  *     swept with the epoch.
  *  2. '''The driver''' commits the epoch: the staged files MOVE
  *     (same-filesystem renames) into a fresh commit dir and publish as
  *     ONE transactional append — footer-derived stats, CDF insert
  *     images, CHECK constraints, bloom sidecars — recorded under txn
  *     `(queryId, epochId)`, so a replayed epoch after a crash between
  *     the table commit and the engine's checkpoint publishes nothing
  *     ([[CommitLogTable.appendStagedFiles]]).
  *
  * Append output mode only (Complete would need per-epoch overwrite —
  * refused explicitly, like the format sink). Schema is pinned at
  * stream start; a mid-stream table evolution fails the next epoch's
  * commit with a restart instruction rather than writing files the
  * manifest schema can't describe.
  *
  * Scale: rows never funnel through the driver — each executor streams
  * its partition straight to parquet; the driver touches only file
  * metadata (one footer read per staged file, same as every other
  * commit path).
  */
final class CommitLogStreamingWrite(spark: SparkSession, dir: String,
    info: LogicalWriteInfo) extends StreamingWrite {

  private val table = CommitLogTable.open(spark, dir)
  private val snap = table.resolvedManifest(None)
  private val logicalSchema: StructType = info.schema()
  private val physSchema: StructType = StructType(logicalSchema.fields.map(
    f => f.copy(name = snap.columnMapping.getOrElse(f.name, f.name))))
  private val stageRoot = s"$dir/_streaming_stage/${info.queryId()}"

  override def createStreamingWriterFactory(
      physicalInfo: PhysicalWriteInfo): StreamingDataWriterFactory = {
    val sqlConf = spark.sessionState.conf
    val hc: Configuration = spark.sessionState.newHadoopConf()
    ParquetWriteSupport.setSchema(physSchema, hc)
    // ParquetWriteSupport.init and SparkToParquetSchemaConverter read
    // these with NO default (`conf.get(key).toBoolean` throws on an
    // absent key) — the same plants ParquetFileFormat.prepareWrite makes
    // and the read path's reader factory already documents
    Seq(SQLConf.PARQUET_WRITE_LEGACY_FORMAT,
      SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED,
      SQLConf.PARQUET_BINARY_AS_STRING,
      SQLConf.PARQUET_INT96_AS_TIMESTAMP,
      SQLConf.CASE_SENSITIVE,
      SQLConf.PARQUET_FIELD_ID_READ_ENABLED,
      SQLConf.PARQUET_INFER_TIMESTAMP_NTZ_ENABLED,
      SQLConf.LEGACY_PARQUET_NANOS_AS_LONG,
      SQLConf.PARQUET_IGNORE_VARIANT_ANNOTATION,
      SQLConf.PARQUET_READER_RESPECT_UNKNOWN_TYPE_ANNOTATION,
      SQLConf.VARIANT_ALLOW_READING_SHREDDED,
      SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE)
      .foreach(e => hc.setBoolean(e.key, sqlConf.getConf(e)))
    hc.set(SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key,
      sqlConf.getConf(SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE).toString)
    hc.set(SQLConf.PARQUET_REBASE_MODE_IN_WRITE.key, "CORRECTED")
    hc.set(SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE.key, "CORRECTED")
    CommitLogEpochWriterFactory(stageRoot,
      new SerializableConfiguration(hc), physSchema,
      snap.partitionCols.map(logicalSchema.fieldIndex),
      sqlConf.sessionLocalTimeZone)
  }

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val staged = messages.toSeq.flatMap {
      case m: CommitLogStageMessage => m.files
      case other => throw new IllegalStateException(
        s"unexpected commit message $other")
    }.map { case (p, part) => (graft.tables.GPath(p), part) }
    table.appendStagedFiles(staged, logicalSchema,
      txn = (s"toTable:${info.queryId()}", epochId))
    sweepEpoch(epochId)
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = sweepEpoch(epochId)

  /** Remove the epoch's staging dir — committed files already moved out;
    * whatever remains is abandoned task output.
    */
  private def sweepEpoch(epochId: Long): Unit = {
    graft.tables.GFiles.deleteRecursively(
      graft.tables.GPath(s"$stageRoot/$epochId"))
  }

  override def toString: String = s"CommitLogStreamingWrite[$dir]"
}

/** One commit message per task: the staged files it wrote, each with
  * its table-partition value strings (empty on unpartitioned tables),
  * positionally aligned with the table's partition columns.
  */
final case class CommitLogStageMessage(files: Seq[(String, Seq[String])])
    extends WriterCommitMessage

final case class CommitLogEpochWriterFactory(stageRoot: String,
    conf: SerializableConfiguration, physSchema: StructType,
    partIdx: Seq[Int], zone: String) extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new CommitLogEpochWriter(s"$stageRoot/$epochId", conf.value, physSchema,
      partIdx, zone, partitionId, taskId)
}

/** Executor-side writer: one open parquet writer per table-partition
  * value encountered (appends cluster by arrival, so the fan-out is the
  * batch's touched partitions, not the table's). Partition values
  * render through a real Catalyst `Cast` to STRING in the session
  * timezone — the identical string the batch write path's
  * `col(p).cast("string")` produces, so both paths agree on directory
  * values.
  */
final class CommitLogEpochWriter(stageDir: String, conf: Configuration,
    physSchema: StructType, partIdx: Seq[Int], zone: String,
    partitionId: Int, taskId: Long) extends DataWriter[InternalRow] {

  private val writers =
    mutable.LinkedHashMap.empty[Seq[String], (String, ParquetWriter[InternalRow])]

  private val partOf: InternalRow => Seq[String] =
    if (partIdx.isEmpty) { _ => Seq.empty }
    else {
      val casts = partIdx.map { i =>
        val f = physSchema(i)
        Cast(BoundReference(i, f.dataType, f.nullable), StringType,
          Some(zone), EvalMode.LEGACY)
      }
      row => casts.map { cast =>
        val v = cast.eval(row)
        // null partition value routes to the default-partition sentinel
        // (appendStagedFiles maps "" there, matching partitionBy)
        if (v == null) "" else v.toString
      }
    }

  private final class B(path: HPath)
      extends ParquetWriter.Builder[InternalRow, B](path) {
    override def getWriteSupport(c: Configuration): WriteSupport[InternalRow] =
      new ParquetWriteSupport
    override def self(): B = this
  }

  override def write(row: InternalRow): Unit = {
    val part = partOf(row)
    val (_, w) = writers.getOrElseUpdate(part, {
      val path = s"$stageDir/t$partitionId-$taskId-${writers.size}.parquet"
      graft.tables.GFiles.createDirectories(graft.tables.GPath(stageDir))
      (path, new B(new HPath(path)).withConf(conf)
        .withCompressionCodec(CompressionCodecName.SNAPPY).build())
    })
    w.write(row)
  }

  override def commit(): WriterCommitMessage = {
    writers.values.foreach(_._2.close())
    CommitLogStageMessage(writers.toSeq.map { case (part, (path, _)) =>
      (path, part)
    })
  }

  override def abort(): Unit = {
    writers.values.foreach(w =>
      try w._2.close() catch { case _: Exception => () })
    writers.values.foreach(w =>
      graft.tables.GFiles.deleteIfExists(graft.tables.GPath(w._1)))
  }

  override def close(): Unit = ()
}
