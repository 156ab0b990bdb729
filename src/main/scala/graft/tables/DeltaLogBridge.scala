package graft.tables

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{DataType, StructType}

/** Protocol-level Delta Lake interop WITHOUT the delta-spark
  * dependency: a minimal reader for `_delta_log` JSON commits and a
  * zero-copy exporter of a commit-log snapshot to those same actions —
  * the public Delta transaction-protocol spec
  * (github.com/delta-io/delta/blob/master/PROTOCOL.md), nothing else.
  *
  * This validates the commitlog↔delta semantic mapping the
  * [[graft.operators.DeltaSqlTableOps]] seam assumes, in-sandbox (the
  * environment carries no delta artifacts, so `DeltaInteropSpec`
  * self-cancels):
  *
  *   - version-numbered JSON commits `v%020d.json` ↔ Delta's
  *     `%020d.json` — both logs are ordered action streams;
  *   - manifest `files` diff (added/removed per version) ↔ `add` /
  *     `remove` actions with `dataChange`;
  *   - manifest `schema` ↔ `metaData.schemaString` (the SAME Spark
  *     StructType JSON encoding on both sides);
  *   - manifest `partitionCol` + per-file partition value ↔
  *     `metaData.partitionColumns` + `add.partitionValues`;
  *   - snapshot resolve (replay to a pin) ↔ Delta time travel
  *     (`versionAsOf` here = replay actions through that version).
  *
  * Scope is the protocol's v1 reader surface: JSON commits only (a
  * `_last_checkpoint` is refused loudly), protocol/metaData/add/remove
  * actions honored, commitInfo/txn ignored. Exported logs declare
  * `minReaderVersion=1, minWriterVersion=2`, so any spec-conforming
  * Delta reader (delta-spark, delta-rs, DuckDB delta) can read a graft
  * table's files in place — zero data copied. Export refuses snapshots
  * whose semantics v1 cannot carry: live column mapping (renames/drops
  * need reader v2+) or pending merge-on-read delete marks (deletion
  * vectors need reader v3).
  */
object DeltaLogBridge {

  private val M = new ObjectMapper()

  private def deltaName(v: Long): String = f"$v%020d.json"

  // add.path is a RELATIVE URI per the protocol — %-encode on write,
  // decode on read
  private def encodePath(p: String): String =
    new java.net.URI(null, null, p, null).getRawPath
  private def decodePath(p: String): String = {
    val u = new java.net.URI(p)
    // the protocol also allows ABSOLUTE URIs (s3://…) — out of this
    // bridge's scope; refuse loudly rather than silently mangling the
    // path into a table-relative one
    require(u.getScheme == null && !p.startsWith("/"),
      s"DeltaLogBridge reads table-relative add/remove paths only, got $p")
    u.getPath
  }

  /** Read a Delta table directory (JSON-commit log) into a DataFrame,
    * optionally pinned at `versionAsOf` — replaying
    * protocol/metaData/add/remove exactly as the spec orders them.
    * Partition-column values come from `add.partitionValues` (Delta
    * files need not carry those columns physically), attached per
    * file-group and cast to the declared type.
    */
  def read(spark: SparkSession, dir: String,
      versionAsOf: Option[Long] = None): DataFrame = {
    val logDir = Paths.get(dir, "_delta_log")
    require(Files.isDirectory(logDir), s"no _delta_log at $dir")
    require(!Files.exists(logDir.resolve("_last_checkpoint")),
      "DeltaLogBridge reads JSON-commit logs only (protocol v1 surface); " +
        "this table has parquet checkpoints — use a full Delta reader")
    val versions = {
      val s = Files.list(logDir)
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(n => n.length == 25 && n.endsWith(".json") &&
          n.dropRight(5).forall(_.isDigit))
        .map(_.dropRight(5).toLong).toVector.sorted
      finally s.close()
    }
    require(versions.headOption.contains(0L),
      s"log at $dir does not start at version 0 (vacuumed?): $versions")
    val upTo = versionAsOf.getOrElse(versions.max)
    val vset = versions.toSet
    require(vset.contains(upTo), s"version $upTo not in log $versions")
    // contiguity: replay must not skip commits
    (0L to upTo).foreach(v => require(vset.contains(v),
      s"log at $dir is missing version $v"))

    var schema: Option[StructType] = None
    var partCols: Seq[String] = Seq.empty
    // live file set: decoded relative path → partitionValues
    val live = scala.collection.mutable.LinkedHashMap.empty[String, Map[String, String]]
    (0L to upTo).foreach { v =>
      val lines = new String(
        Files.readAllBytes(logDir.resolve(deltaName(v))), UTF_8)
        .split('\n').filter(_.trim.nonEmpty)
      lines.foreach { line =>
        val n = M.readTree(line)
        if (n.has("protocol")) {
          val r = n.get("protocol").get("minReaderVersion").asInt
          require(r <= 1,
            s"table requires Delta reader version $r; this bridge " +
              "implements the v1 (JSON actions) surface only")
        }
        if (n.has("metaData")) {
          val md = n.get("metaData")
          require(md.get("format").get("provider").asText == "parquet",
            "non-parquet Delta tables are out of scope")
          schema = Some(DataType.fromJson(md.get("schemaString").asText)
            .asInstanceOf[StructType])
          partCols = md.get("partitionColumns").elements().asScala
            .map(_.asText).toSeq
        }
        if (n.has("add")) {
          val a = n.get("add")
          val pv =
            if (a.has("partitionValues"))
              a.get("partitionValues").properties().asScala
                .map(e => e.getKey -> (if (e.getValue.isNull) null
                  else e.getValue.asText)).toMap
            else Map.empty[String, String]
          live.put(decodePath(a.get("path").asText), pv)
        }
        if (n.has("remove"))
          live.remove(decodePath(n.get("remove").get("path").asText))
      }
    }
    val s = schema.getOrElse(
      throw new IllegalStateException(s"log at $dir carries no metaData"))
    val dataSchema = StructType(s.fields.filterNot(f => partCols.contains(f.name)))
    if (live.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
    // one read per distinct partitionValues tuple, values attached as
    // typed literals (Delta semantics: the LOG is the source of
    // partition values, whether or not files carry the columns)
    val groups = live.toSeq.groupBy(_._2).toSeq
    groups.map { case (pv, files) =>
      val paths = files.map { case (p, _) => s"$dir/$p" }
      val df = spark.read.schema(dataSchema).parquet(paths: _*)
      partCols.foldLeft(df) { (d, pc) =>
        val f = s.fields.find(_.name == pc).getOrElse(
          throw new IllegalStateException(
            s"partition column $pc missing from schemaString"))
        d.withColumn(pc, lit(pv.getOrElse(pc, null)).cast(f.dataType))
      }.select(s.fieldNames.map(col).toSeq: _*)
    }.reduce(_.unionByName(_))
  }

  /** Export the CURRENT snapshot of a commit-log table as a Delta v1
    * log next to its data — `_delta_log/00000000000000000000.json` with
    * protocol, metaData (the manifest schema verbatim — both formats
    * store Spark StructType JSON), and one `add` per live file,
    * partition values carried from the manifest. ZERO data copied: the
    * actions reference the table's existing parquet in place (graft
    * data files also carry the partition column physically, which the
    * protocol tolerates — readers source those values from the log).
    * Refuses what v1 can't express: live column mapping or pending
    * lazy-delete marks. Returns the number of files exported.
    */
  def export(table: CommitLogTable, overwrite: Boolean = false): Int = {
    val snap = table.resolvedManifest(None)
    require(snap.columnMapping.isEmpty,
      "export: live column mapping (renames/drops) needs Delta column " +
        "mapping (reader v2+); compactRewrite the table first")
    require(snap.files.forall(_.pendingDelete.isEmpty),
      "export: pending lazy-delete marks need deletion vectors (reader " +
        "v3); run OPTIMIZE to materialize them first")
    val logDir = Paths.get(table.dir, "_delta_log")
    require(overwrite || !Files.exists(logDir.resolve(deltaName(0L))),
      s"a _delta_log already exists at ${table.dir}")
    Files.createDirectories(logDir)
    val now = System.currentTimeMillis()
    val sb = new StringBuilder
    sb.append(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""").append('\n')
    val md = M.createObjectNode()
    val mdN = md.putObject("metaData")
    mdN.put("id", java.util.UUID.randomUUID().toString)
    val fmt = mdN.putObject("format")
    fmt.put("provider", "parquet")
    fmt.putObject("options")
    mdN.put("schemaString", snap.schema.json)
    val pc = mdN.putArray("partitionColumns")
    snap.partitionCol.foreach(pc.add)
    mdN.putObject("configuration")
    mdN.put("createdTime", now)
    sb.append(M.writeValueAsString(md)).append('\n')
    snap.files.foreach { f =>
      val add = M.createObjectNode()
      val a = add.putObject("add")
      a.put("path", encodePath(f.path))
      val pv = a.putObject("partitionValues")
      (snap.partitionCol, f.partition) match {
        case (Some(c), Some(v)) =>
          if (v == org.apache.spark.sql.catalyst.catalog
              .ExternalCatalogUtils.DEFAULT_PARTITION_NAME) pv.putNull(c)
          else pv.put(c, v)
        case _ => ()
      }
      a.put("size", f.bytes)
      a.put("modificationTime", now)
      a.put("dataChange", true)
      sb.append(M.writeValueAsString(add)).append('\n')
    }
    val tmp = logDir.resolve(s".tmp-export-${java.util.UUID.randomUUID()}")
    Files.write(tmp, sb.toString.getBytes(UTF_8))
    try Files.move(tmp, logDir.resolve(deltaName(0L)),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    finally Files.deleteIfExists(tmp)
    snap.files.size
  }
}
