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

  private val HiveNull = org.apache.spark.sql.catalyst.catalog
    .ExternalCatalogUtils.DEFAULT_PARTITION_NAME

  /** A file's `add.partitionValues` entries: one per table partition
    * column, positionally zipped with the file's recorded values; the
    * Hive default-partition marker maps to the protocol's JSON null.
    */
  private def partitionValuesOf(partitionCols: Seq[String],
      f: CommitLogTable.LogFile): Seq[(String, Option[String])] =
    partitionCols.zip(f.partitionVals).map { case (c, v) =>
      c -> (if (v == HiveNull) None else Some(v))
    }

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
    val versions = {
      val s = Files.list(logDir)
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(n => n.length == 25 && n.endsWith(".json") &&
          n.dropRight(5).forall(_.isDigit))
        .map(_.dropRight(5).toLong).toVector.sorted
      finally s.close()
    }
    val vset = versions.toSet

    // table state the actions mutate, replayed in spec order
    var schema: Option[StructType] = None
    var partCols: Seq[String] = Seq.empty
    // live file set: decoded relative path → partitionValues
    val live = scala.collection.mutable.LinkedHashMap.empty[String, Map[String, String]]

    def requireReaderV1(minReader: Int): Unit = require(minReader <= 1,
      s"table requires Delta reader version $minReader; this bridge " +
        "implements the v1 (JSON actions + classic checkpoints) surface only")
    def applyMetaData(schemaString: String, provider: String,
        pcs: Seq[String]): Unit = {
      require(provider == "parquet",
        "non-parquet Delta tables are out of scope")
      schema = Some(DataType.fromJson(schemaString).asInstanceOf[StructType])
      partCols = pcs
    }
    def applyJson(v: Long): Unit = {
      val lines = new String(
        Files.readAllBytes(logDir.resolve(deltaName(v))), UTF_8)
        .split('\n').filter(_.trim.nonEmpty)
      lines.foreach { line =>
        val n = M.readTree(line)
        if (n.has("protocol"))
          requireReaderV1(n.get("protocol").get("minReaderVersion").asInt)
        if (n.has("metaData")) {
          val md = n.get("metaData")
          applyMetaData(md.get("schemaString").asText,
            md.get("format").get("provider").asText,
            md.get("partitionColumns").elements().asScala
              .map(_.asText).toSeq)
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

    /** `_last_checkpoint` → (version, checkpoint part files), classic
      * (pre-v2) checkpoints only.
      */
    def lastCheckpoint: Option[(Long, Seq[String])] = {
      val p = logDir.resolve("_last_checkpoint")
      if (!Files.exists(p)) return None
      val n = M.readTree(new String(Files.readAllBytes(p), UTF_8))
      val v = n.get("version").asLong
      val parts = Option(n.get("parts")).map(_.asInt)
      val names = parts match {
        case Some(k) => (1 to k).map(i =>
          f"$v%020d.checkpoint.$i%010d.$k%010d.parquet")
        case None => Seq(f"$v%020d.checkpoint.parquet")
      }
      names.foreach(f => require(Files.exists(logDir.resolve(f)),
        s"checkpoint part $f named by _last_checkpoint is missing " +
          "(UUID-named v2/sidecar checkpoints are out of this bridge's scope)"))
      Some((v, names))
    }

    /** Seed the state from a classic checkpoint parquet: one row per
      * action, nullable structs `protocol`/`metaData`/`add` (`remove`
      * rows are tombstones — already absent from the live set). Driver-
      * collected, same driver-sized-state scope as the JSON replay.
      */
    def applyCheckpoint(names: Seq[String]): Unit = {
      val df = spark.read.parquet(names.map(n => s"$dir/_delta_log/$n"): _*)
      val cols = df.columns.toSet
      if (cols.contains("protocol"))
        df.select("protocol.minReaderVersion").na.drop().collect()
          .foreach(r => requireReaderV1(r.getInt(0)))
      require(cols.contains("metaData") && cols.contains("add"),
        "checkpoint carries no metaData/add columns")
      df.select("metaData.schemaString", "metaData.format.provider",
          "metaData.partitionColumns")
        .where("metaData IS NOT NULL").collect()
        .foreach(r => applyMetaData(r.getString(0), r.getString(1),
          r.getSeq[String](2)))
      df.select("add.path", "add.partitionValues")
        .where("add IS NOT NULL").collect()
        .foreach { r =>
          val pv = Option(r.getMap[String, String](1))
            .map(_.toMap).getOrElse(Map.empty[String, String])
          live.put(decodePath(r.getString(0)), pv)
        }
    }

    val ckpt = lastCheckpoint
    val upTo = versionAsOf.getOrElse(
      (versions :+ ckpt.map(_._1).getOrElse(-1L)).max)
    require(vset.contains(upTo) || ckpt.exists(_._1 == upTo),
      s"version $upTo not in log (json $versions, checkpoint " +
        s"${ckpt.map(_._1)})")
    // prefer the pure JSON replay when the full chain exists (it also
    // serves pins BELOW the checkpoint); otherwise seed from the
    // checkpoint and replay the JSON tail
    if (versions.headOption.contains(0L) &&
        (0L to upTo).forall(vset.contains)) {
      (0L to upTo).foreach(applyJson)
    } else ckpt match {
      case Some((cv, names)) if cv <= upTo =>
        ((cv + 1) to upTo).foreach(v => require(vset.contains(v),
          s"log at $dir is missing version $v after checkpoint $cv"))
        applyCheckpoint(names)
        ((cv + 1) to upTo).foreach(applyJson)
      case Some((cv, _)) =>
        throw new IllegalArgumentException(
          s"version $upTo predates checkpoint $cv and the JSON chain " +
            s"0..$upTo is no longer complete (vacuumed)")
      case None =>
        throw new IllegalArgumentException(
          s"log at $dir does not start at version 0 and carries no " +
            s"checkpoint: $versions")
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
    snap.partitionCols.foreach(pc.add)
    mdN.putObject("configuration")
    mdN.put("createdTime", now)
    sb.append(M.writeValueAsString(md)).append('\n')
    snap.files.foreach { f =>
      val add = M.createObjectNode()
      val a = add.putObject("add")
      a.put("path", encodePath(f.path))
      val pv = a.putObject("partitionValues")
      partitionValuesOf(snap.partitionCols, f).foreach {
        case (c, Some(v)) => pv.put(c, v)
        case (c, None) => pv.putNull(c)
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

  // ----------------------------------------------------------- live mirror

  /** `TBLPROPERTIES('graft.deltaMirror.enabled'='true')` keeps a
    * `_delta_log` in lockstep with the commit log — external Delta
    * readers (delta-spark, delta-rs, DuckDB delta) FOLLOW the live
    * table, zero data copied. The post-commit hook calls
    * [[mirrorCatchUp]]: the first run seeds a classic CHECKPOINT at the
    * current graft version (so late enablement and vacuumed history
    * need no version 0), then every graft commit appends the 1:1 Delta
    * JSON commit translated from its manifest diff. Translation is
    * DETERMINISTIC (stable table id, manifest timestamps), so racing
    * catch-up writers produce byte-identical commits and the
    * atomic-create claim makes the duplicate write harmless.
    *
    * Commits the v1 protocol can't express — a lazy-delete mark, live
    * column mapping, an in-place file-entry change — write a
    * `_GRAFT_MIRROR_BROKEN` marker and STOP the mirror: Delta readers
    * keep the last consistent snapshot rather than silently drifting
    * (delete the marker and the `_delta_log` after an OPTIMIZE to
    * re-seed). Compaction mirrors with `dataChange=false`.
    */
  val MirrorProp = "graft.deltaMirror.enabled"
  private val BrokenMarker = "_GRAFT_MIRROR_BROKEN"

  private def stableId(dir: String): String =
    java.util.UUID.nameUUIDFromBytes(
      s"graft-delta-mirror:$dir".getBytes(UTF_8)).toString

  private def metaDataJson(dir: String, schema: StructType,
      partitionCols: Seq[String], tsMillis: Long): String = {
    val md = M.createObjectNode()
    val mdN = md.putObject("metaData")
    mdN.put("id", stableId(dir))
    val fmt = mdN.putObject("format")
    fmt.put("provider", "parquet")
    fmt.putObject("options")
    mdN.put("schemaString", schema.json)
    val pc = mdN.putArray("partitionColumns")
    partitionCols.foreach(pc.add)
    mdN.putObject("configuration")
    mdN.put("createdTime", tsMillis)
    M.writeValueAsString(md)
  }

  private def addJson(partitionCols: Seq[String], f: CommitLogTable.LogFile,
      tsMillis: Long, dataChange: Boolean): String = {
    val add = M.createObjectNode()
    val a = add.putObject("add")
    a.put("path", encodePath(f.path))
    val pv = a.putObject("partitionValues")
    partitionValuesOf(partitionCols, f).foreach {
      case (c, Some(v)) => pv.put(c, v)
      case (c, None) => pv.putNull(c)
    }
    a.put("size", f.bytes)
    a.put("modificationTime", tsMillis)
    a.put("dataChange", dataChange)
    M.writeValueAsString(add)
  }

  /** Bring the mirror up to the table's latest version. Returns the
    * mirrored head, or -1 if the mirror is (or just became) broken.
    * Best-effort by contract: a crash mid-catch-up just re-runs on the
    * next commit (translation is deterministic, claims are atomic).
    */
  def mirrorCatchUp(table: CommitLogTable): Long = {
    val logDir = Paths.get(table.dir, "_delta_log")
    if (Files.exists(logDir.resolve(BrokenMarker))) return -1L
    val head = table.latestVersion
    val snap = table.resolvedManifest(None)

    def break(reason: String): Long = {
      Files.createDirectories(logDir)
      Files.write(logDir.resolve(BrokenMarker),
        s"mirror stopped at graft version $head: $reason\n".getBytes(UTF_8))
      -1L
    }

    // first contact: seed a classic checkpoint at the CURRENT version
    val mirrored: Long = {
      if (!Files.isDirectory(logDir)) -1L
      else {
        val s = Files.list(logDir)
        val vs = try s.iterator().asScala.map(_.getFileName.toString)
          .flatMap { n =>
            if (n.length == 25 && n.endsWith(".json") &&
              n.dropRight(5).forall(_.isDigit)) Some(n.dropRight(5).toLong)
            else if (n.endsWith(".checkpoint.parquet") &&
              n.takeWhile(_.isDigit).length == 20)
              Some(n.take(20).toLong)
            else None
          }.toVector
        finally s.close()
        if (vs.isEmpty) -1L else vs.max
      }
    }
    if (mirrored < 0) {
      if (snap.columnMapping.nonEmpty)
        return break("live column mapping needs Delta reader v2+")
      if (snap.files.exists(_.pendingDelete.isDefined))
        return break("pending lazy-delete marks need deletion vectors")
      exportCheckpoint(table, head)
      return head
    }

    ((mirrored + 1) to head).foreach { v =>
      val (action, added, removed) = table.versionFileDiff(v)
      val m = table.resolvedManifest(Some(v))
      if (m.columnMapping.nonEmpty)
        return break(s"v$v introduced column mapping (Delta reader v2+)")
      if (added.exists(_.pendingDelete.isDefined))
        return break(s"v$v carries a lazy-delete mark (deletion vectors)")
      if (added.exists(f => removed.contains(f.path)))
        return break(s"v$v changed a file entry in place")
      val prevSchema = table.resolvedManifest(Some(v - 1))
      val sb = new StringBuilder
      if (m.schema != prevSchema.schema ||
          m.partitionCols != prevSchema.partitionCols)
        sb.append(metaDataJson(table.dir, m.schema, m.partitionCols,
          m.tsMillis)).append('\n')
      val dataChange = action != "compact"
      removed.toSeq.sorted.foreach { p =>
        val rm = M.createObjectNode()
        val r = rm.putObject("remove")
        r.put("path", encodePath(p))
        r.put("deletionTimestamp", m.tsMillis)
        r.put("dataChange", dataChange)
        sb.append(M.writeValueAsString(rm)).append('\n')
      }
      added.foreach(f =>
        sb.append(addJson(m.partitionCols, f, m.tsMillis, dataChange))
          .append('\n'))
      // a no-op translation (e.g. a properties commit) still writes the
      // empty commit — Delta versions must stay contiguous with graft's
      AtomicCreateCoordinator.tryClaim(logDir, deltaName(v),
        sb.toString.getBytes(UTF_8))
    }
    head
  }

  /** Seed a Delta log with ONE classic checkpoint at `version` (the
    * current snapshot's protocol/metaData/adds as parquet action rows)
    * plus `_last_checkpoint` — a legal log start with no version 0, so
    * a mirror enabled late (or after history vacuum) begins exactly
    * where the table is.
    */
  def exportCheckpoint(table: CommitLogTable, version: Long): Unit = {
    val spark = table.spark
    val snap = table.resolvedManifest(None)
    val logDir = Paths.get(table.dir, "_delta_log")
    Files.createDirectories(logDir)
    import spark.implicits._
    val hiveNull = org.apache.spark.sql.catalyst.catalog
      .ExternalCatalogUtils.DEFAULT_PARTITION_NAME
    val rows: Seq[(Option[(Int, Int)],
        Option[(String, String, String, Seq[String])],
        Option[(String, Map[String, String], Long, Long, Boolean)])] =
      (Some((1, 2)), None, None) +:
      (None, Some((stableId(table.dir), "parquet", snap.schema.json,
        snap.partitionCols)), None) +:
      snap.files.map { f =>
        val pv: Map[String, String] =
          partitionValuesOf(snap.partitionCols, f)
            .map { case (c, v) => c -> v.orNull }.toMap
        (None, None,
          Some((encodePath(f.path), pv, f.bytes, snap.tsMillis, false)))
      }
    val df = rows.toDF("p", "m", "a").selectExpr(
      "named_struct('minReaderVersion', p._1, 'minWriterVersion', p._2) AS protocol",
      "named_struct('id', m._1, 'format', named_struct('provider', m._2, " +
        "'options', map()), 'schemaString', m._3, 'partitionColumns', m._4, " +
        "'configuration', map(), 'createdTime', 0L) AS metaData",
      "named_struct('path', a._1, 'partitionValues', a._2, 'size', a._3, " +
        "'modificationTime', a._4, 'dataChange', a._5) AS add")
      .selectExpr(
        "IF(protocol.minReaderVersion IS NULL, NULL, protocol) AS protocol",
        "IF(metaData.id IS NULL, NULL, metaData) AS metaData",
        "IF(add.path IS NULL, NULL, add) AS add")
    val tmp = Files.createTempDirectory("graft-delta-ckpt").toString
    df.coalesce(1).write.parquet(tmp + "/ck")
    val part = { val s = Files.list(Paths.get(tmp, "ck"))
      try s.iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      finally s.close() }
    Files.copy(part, logDir.resolve(f"$version%020d.checkpoint.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    Files.write(logDir.resolve("_last_checkpoint"),
      s"""{"version":$version,"size":${rows.size}}""".getBytes(UTF_8))
  }
}
