package graft.tables

import java.nio.charset.StandardCharsets.UTF_8

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
  *   - manifest `partitionCols` + per-file partition tuples ↔
  *     `metaData.partitionColumns` + `add.partitionValues`;
  *   - snapshot resolve (replay to a pin) ↔ Delta time travel
  *     (`versionAsOf` here = replay actions through that version).
  *
  * READ scope is the protocol's v1–v3 reader surface: JSON commits,
  * classic (single and multi-part) checkpoints, UUID-named v2
  * manifest+sidecar checkpoints (parquet AND JSON manifests), and the
  * table-features protocol — reader v2/v3 tables read when every
  * declared feature is IMPLEMENTED: column mapping modes `name` AND
  * `id` resolve fields (physical names / parquet field ids), and live
  * DELETION VECTORS (inline `i`, table-relative `u`, and local
  * absolute-path `p` storage, [[DeletionVectors]]) filter their marked
  * row indexes out of the scan — the post-DBR-14 Databricks default,
  * so any table that saw an UPDATE/DELETE/MERGE reads correctly,
  * including shallow clones whose DVs reference the source table. The
  * remaining loud refusals are genuine scope edges: remote-scheme URIs
  * (add paths, sidecars, `p` DVs) and reader features this bridge has
  * no implementation for. File actions key by
  * `(path, deletionVector.uniqueId)` exactly as the spec demands.
  * `_last_checkpoint` is a HINT, tolerated when stale or unreadable.
  * protocol/metaData/add/remove actions honored, commitInfo/txn ignored.
  *
  * EXPORTED logs declare the protocol the snapshot NEEDS — (1,2) for
  * plain snapshots, the legacy writer ladder for constraints / CDF /
  * generated / identity state, reader-v2 NAME mode for column-mapped
  * snapshots (mapped schemaString field metadata,
  * `delta.columnMapping.mode=name`, physical partitionValues keys),
  * and v3/v7 table features with protocol DELETION VECTORS for
  * merge-on-read delete marks — the same encodings Databricks-written
  * tables use, so any spec-conforming Delta reader (delta-spark,
  * delta-rs, DuckDB delta) can read a graft table's files in place,
  * zero data copied. Stored CHECK constraints, user TBLPROPERTIES,
  * and generated/identity specs travel in `metaData`, so an external
  * Delta WRITER appending to the exported log enforces them too.
  */
object DeltaLogBridge {

  private val M = new ObjectMapper()

  private[tables] def deltaName(v: Long): String = f"$v%020d.json"

  private val HiveNull = org.apache.spark.sql.catalyst.catalog
    .ExternalCatalogUtils.DEFAULT_PARTITION_NAME

  /** A file's `add.partitionValues` entries: one per table partition
    * column, positionally zipped with the file's recorded values; the
    * Hive default-partition marker maps to the protocol's JSON null.
    */
  private def partitionValuesOf(partitionCols: Seq[String],
      f: CommitLogTable.LogFile): Seq[(String, Option[String])] = {
    // the spec requires one partitionValues entry per partition column —
    // a short tuple (a pre-partitioning legacy file) must refuse loudly,
    // not zip-truncate into an action missing required keys
    require(f.partitionVals.lengthCompare(partitionCols.length) == 0,
      s"file ${f.path} carries ${f.partitionVals.length} partition " +
        s"value(s) for ${partitionCols.length} partition column(s) — " +
        "inexpressible as a Delta add action")
    partitionCols.zip(f.partitionVals).map { case (c, v) =>
      c -> (if (v == HiveNull) None else Some(v))
    }
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

  private val IdKey = "delta.columnMapping.id"
  private val PhysKey = "delta.columnMapping.physicalName"
  private val MaxIdKey = "delta.columnMapping.maxColumnId"

  /** Field-id state already declared by a `_delta_log`: ids by PHYSICAL
    * path (top-level physical name, nested joined with '.') from the
    * NEWEST metaData action, plus the declared maxColumnId. The protocol
    * makes both immutable-forward — a column keeps its id for life and
    * maxColumnId never decreases, even across drops of the
    * highest-numbered column — so every metaData rewrite must seed from
    * what the log last said, never recompute. Scans mirrored commits
    * newest-first, then the seed checkpoint.
    */
  private def fieldIdsFromSchemaJson(schemaString: String,
      conf: Map[String, String]): (Map[String, Long], Long) = {
    val ids = scala.collection.mutable.Map.empty[String, Long]
    // path segments MUST mirror mappedSchemaJson's decorate exactly
    // ('.element'/'.key'/'.value' for containers) or ids carried
    // forward never match for struct fields nested in arrays/maps and
    // silently reassign on every rewrite
    def walk(dt: DataType, prefix: String): Unit = dt match {
      case st: StructType => st.fields.foreach { f =>
        val phys = if (f.metadata.contains(PhysKey))
          f.metadata.getString(PhysKey) else f.name
        val path = if (prefix.isEmpty) phys else s"$prefix.$phys"
        if (f.metadata.contains(IdKey))
          ids.put(path, f.metadata.getLong(IdKey))
        walk(f.dataType, path)
      }
      case at: org.apache.spark.sql.types.ArrayType =>
        walk(at.elementType, s"$prefix.element")
      case mt: org.apache.spark.sql.types.MapType =>
        walk(mt.keyType, s"$prefix.key")
        walk(mt.valueType, s"$prefix.value")
      case _ => ()
    }
    walk(DataType.fromJson(schemaString).asInstanceOf[StructType], "")
    val declaredMax = conf.get(MaxIdKey).map(_.toLong).getOrElse(0L)
    (ids.toMap, math.max(declaredMax, (ids.values.toSeq :+ 0L).max))
  }

  private def priorFieldIds(spark: SparkSession,
      logDir: GPath): (Map[String, Long], Long) = {
    if (!GFiles.isDirectory(logDir)) return (Map.empty, 0L)
    val names = GFiles.list(logDir).map(_.fileName)
    val jsonVs = names.filter(n => n.length == 25 && n.endsWith(".json") &&
      n.dropRight(5).forall(_.isDigit)).map(_.dropRight(5).toLong).sorted
    // the NEWEST metaData provides the live path→id map; maxColumnId
    // folds over EVERY metaData still in the log, so a schema rewrite
    // that momentarily shed the mapping cannot reset the counter and
    // re-issue a retired id
    var newest: Option[Map[String, Long]] = None
    var maxSeen = 0L
    def fold(schemaString: String, conf: Map[String, String]): Unit = {
      val (ids, mx) = fieldIdsFromSchemaJson(schemaString, conf)
      if (newest.isEmpty) newest = Some(ids)
      maxSeen = math.max(maxSeen, mx)
    }
    jsonVs.reverse.foreach { v =>
      val lines = new String(
        GFiles.readAllBytes(logDir.resolve(deltaName(v))), UTF_8)
        .split('\n').filter(_.trim.nonEmpty)
      lines.foreach { line =>
        val n = M.readTree(line)
        if (n.has("metaData")) {
          val md = n.get("metaData")
          val conf = if (!md.hasNonNull("configuration")) Map.empty[String, String]
            else md.get("configuration").properties().asScala
              .map(e => e.getKey -> (if (e.getValue.isNull) null
                else e.getValue.asText)).toMap
          fold(md.get("schemaString").asText, conf)
        }
      }
    }
    // classic AND v2 UUID manifests both carry the metaData row (the
    // v2 seed puts adds in sidecars but metaData in the manifest) —
    // ignoring the v2 shape would reassign ids right after a v2 seed
    val Classic = """(\d{20})\.checkpoint\.parquet""".r
    val V2M = """(\d{20})\.checkpoint\.([^.]+)\.parquet""".r
    val cks = names.collect {
      case n @ Classic(v) => (v.toLong, n)
      case n @ V2M(v, u) if !u.forall(_.isDigit) => (v.toLong, n)
    }
    cks.sortBy(-_._1).headOption.foreach { case (_, n) =>
      // the checkpoint is parquet: one tiny Spark read, seed-rare
      spark.read.parquet(logDir.resolve(n).toString)
        .selectExpr("metaData.schemaString", "metaData.configuration")
        .where("metaData IS NOT NULL").collect()
        .foreach(r => fold(r.getString(0),
          Option(r.getMap[String, String](1)).map(_.toMap)
            .getOrElse(Map.empty)))
    }
    (newest.getOrElse(Map.empty), maxSeen)
  }

  /** Spark StructType JSON with Delta column-mapping field metadata
    * (`delta.columnMapping.id` / `.physicalName`) on EVERY field — the
    * spec requires the annotations on nested struct fields too, and
    * delta-spark validates exactly that. graft's own mapping renames
    * only top-level columns, so nested fields keep their names as
    * physical; their ids key by the physical PATH.
    *
    * Ids are SEQUENTIAL and carried forward from `prior` (the log's
    * newest metaData): a column keeps the id the log first gave it,
    * new physical paths take maxColumnId+1… in schema order, and the
    * returned maxColumnId is monotonic across rewrites — dropping the
    * highest-numbered column never re-issues its id to a later add,
    * exactly the protocol's never-reuse invariant.
    */
  private def mappedSchemaJson(schema: StructType,
      mapping: Map[String, String],
      prior: (Map[String, Long], Long) = (Map.empty, 0L)): (String, Long) = {
    val (priorIds, priorMax) = prior
    var nextId = priorMax
    val seen = scala.collection.mutable.Set.empty[Long]
    def idFor(path: String): Long = {
      val id = priorIds.getOrElse(path, { nextId += 1; nextId })
      require(seen.add(id),
        s"column-mapping field id $id assigned twice (at $path) — " +
          "corrupt prior metaData")
      id
    }
    def annotate(f: org.apache.spark.sql.types.StructField,
        phys: String, path: String): org.apache.spark.sql.types.StructField = {
      val id = idFor(path)
      val mb = new org.apache.spark.sql.types.MetadataBuilder()
        .withMetadata(f.metadata)
        .putLong(IdKey, id)
        .putString(PhysKey, phys)
        .build()
      f.copy(dataType = decorate(f.dataType, path), metadata = mb)
    }
    def decorate(dt: org.apache.spark.sql.types.DataType,
        path: String): org.apache.spark.sql.types.DataType = dt match {
      case st: StructType =>
        StructType(st.fields.map(f => annotate(f, f.name, s"$path.${f.name}")))
      case at: org.apache.spark.sql.types.ArrayType =>
        at.copy(elementType = decorate(at.elementType, s"$path.element"))
      case mt: org.apache.spark.sql.types.MapType =>
        mt.copy(keyType = decorate(mt.keyType, s"$path.key"),
          valueType = decorate(mt.valueType, s"$path.value"))
      case o => o
    }
    val fields = schema.fields.map { f =>
      val phys = mapping.getOrElse(f.name, f.name)
      annotate(f, phys, phys)
    }
    (StructType(fields).json, math.max(nextId, (seen.toSeq :+ 0L).max))
  }

  /** The PHYSICAL rendering of a (possibly nested) field per the
    * column-mapping metadata: every struct field anywhere takes its
    * declared physicalName (absent = its own name) — the read schema a
    * name-mode scan requests from the parquet files. In id mode each
    * field ADDITIONALLY carries `parquet.field.id` (from its
    * delta.columnMapping.id, required on every field — a mode-id schema
    * without ids is corrupt), which flips Spark's parquet reader to
    * field-id matching.
    */
  private def physicalField(f: org.apache.spark.sql.types.StructField,
      phys: String, idMode: Boolean): org.apache.spark.sql.types.StructField = {
    val mb = new org.apache.spark.sql.types.MetadataBuilder()
    if (idMode) {
      require(f.metadata.contains(IdKey),
        s"column mapping mode 'id': field '${f.name}' carries no $IdKey " +
          "annotation — corrupt mapped schema, refusing")
      mb.putLong("parquet.field.id", f.metadata.getLong(IdKey))
    }
    f.copy(name = phys, dataType = physicalType(f.dataType, idMode),
      metadata = mb.build())
  }

  private def physicalType(dt: org.apache.spark.sql.types.DataType,
      idMode: Boolean): org.apache.spark.sql.types.DataType = dt match {
    case st: StructType => StructType(st.fields.map { f =>
      val phys = if (f.metadata.contains(PhysKey))
        f.metadata.getString(PhysKey) else f.name
      physicalField(f, phys, idMode)
    })
    case at: org.apache.spark.sql.types.ArrayType =>
      at.copy(elementType = physicalType(at.elementType, idMode))
    case mt: org.apache.spark.sql.types.MapType =>
      mt.copy(keyType = physicalType(mt.keyType, idMode),
        valueType = physicalType(mt.valueType, idMode))
    case o => o
  }

  /** Reader features this bridge can either EXECUTE or PROVE unused.
    * A declared feature outside this set refuses loudly — the protocol
    * forbids reading past a feature you don't understand.
    */
  private val TolerableReaderFeatures = Set(
    "columnMapping", // modes name AND id IMPLEMENTED (names / field ids)
    "deletionVectors", // IMPLEMENTED — live DVs filter out of the scan
    "timestampNtz", // a type, carried by schemaString — Spark reads it
    "variantType-preview", "variantType", // ditto
    "typeWidening-preview", "typeWidening", // widened types live in schemaString
    "v2Checkpoint", // this bridge reads manifest+sidecar checkpoints
    "vacuumProtocolCheck" // write-side only; no read semantics
  )

  /** Read a Delta table directory into a DataFrame, optionally pinned
    * at `versionAsOf` — replaying protocol/metaData/add/remove exactly
    * as the spec orders them, seeded from the newest usable checkpoint
    * (classic single-file, classic multi-part, or v2 manifest+sidecar)
    * when the JSON chain alone can't serve the pin.
    *
    * Protocol handling follows the table-features spec: reader v1 reads
    * as before; v2 (implicit column mapping) and v3 (explicit
    * readerFeatures) are accepted when every declared feature is
    * IMPLEMENTED — column mapping mode `name` reads files by their
    * PHYSICAL field names, mode `id` by parquet field ids (both
    * surface logical names), and live deletion vectors filter their
    * marked row indexes out of the scan. A feature outside
    * [[TolerableReaderFeatures]] refuses loudly.
    *
    * `_last_checkpoint` is a HINT, per the spec: unreadable, stale, or
    * dangling hints never fail a read the log itself can serve — the
    * reader falls back to the complete JSON chain or a listed
    * checkpoint.
    *
    * Partition-column values come from `add.partitionValues` (Delta
    * files need not carry those columns physically), attached via ONE
    * parquet scan over all live files plus a broadcast
    * `_metadata.file_path` → values lookup — never a per-partition
    * union (a 1 000-partition table must plan one FileScan, not 1 000).
    */
  def read(spark: SparkSession, dir: String,
      versionAsOf: Option[Long] = None): DataFrame = {
    val snap = snapshot(spark, dir, versionAsOf)
    readSnapshot(spark, dir, snap)
  }

  /** The replayed table state of a Delta log at a version — what
    * [[read]] assembles a scan from and what
    * `CommitLogTable.convertFromDelta` adopts. `live` preserves the
    * log's action order: (decoded add path, partitionValues as
    * recorded, live deletion vector if any).
    */
  final case class Snapshot(version: Long, schema: StructType,
      partitionCols: Seq[String], columnMappingMode: String,
      live: Seq[(String, Map[String, String],
        Option[DeletionVectors.Descriptor])],
      configuration: Map[String, String] = Map.empty)

  def snapshot(spark: SparkSession, dir: String,
      versionAsOf: Option[Long] = None): Snapshot = {
    val logDir = GPath(dir, "_delta_log")
    require(GFiles.isDirectory(logDir), s"no _delta_log at $dir")
    val names = GFiles.list(logDir).map(_.fileName)
    val versions = names
      .filter(n => n.length == 25 && n.endsWith(".json") &&
        n.dropRight(5).forall(_.isDigit))
      .map(_.dropRight(5).toLong).sorted
    val vset = versions.toSet

    // table state the actions mutate, replayed in spec order
    var schema: Option[StructType] = None
    var partCols: Seq[String] = Seq.empty
    var columnMappingMode: String = "none"
    var configuration: Map[String, String] = Map.empty
    var declaredFeatures: Seq[String] = Seq.empty
    var minReaderSeen: Int = 1
    // live file set keyed the way the PROTOCOL keys file actions:
    // (path, deletionVector.uniqueId) — an add that swaps a file's DV
    // is a DIFFERENT action from the add it supersedes, and the paired
    // remove names the OLD uniqueId; keying by path alone would let
    // that remove delete the new add. value = (partitionValues, DV)
    val live = scala.collection.mutable.LinkedHashMap
      .empty[(String, String), (Map[String, String],
        Option[DeletionVectors.Descriptor])]

    def applyProtocol(minReader: Int, features: Seq[String]): Unit = {
      minReaderSeen = minReader
      declaredFeatures = features
      require(minReader <= 3,
        s"table requires Delta reader version $minReader; this bridge " +
          "implements the v1-v3 (table features) surface")
      val unknown = features.filterNot(TolerableReaderFeatures.contains)
      require(unknown.isEmpty,
        s"table declares reader feature(s) ${unknown.mkString(", ")} this " +
          "bridge does not understand — refusing rather than misreading")
    }
    def applyMetaData(schemaString: String, provider: String,
        pcs: Seq[String], conf: Map[String, String]): Unit = {
      require(provider == "parquet",
        "non-parquet Delta tables are out of scope")
      schema = Some(DataType.fromJson(schemaString).asInstanceOf[StructType])
      partCols = pcs
      configuration = conf
      columnMappingMode = conf
        .getOrElse("delta.columnMapping.mode", "none")
    }
    // DVs are recorded per action and SERVED at assembly: the marked
    // row indexes filter out of the scan. Only the final LIVE set's
    // descriptors are resolved (a historical DV whose file action was
    // removed before the pin costs nothing), mirroring how
    // columnMappingMode validates after replay.
    def applyAdd(path: String, pv: Map[String, String],
        dv: Option[DeletionVectors.Descriptor]): Unit =
      live.put((path, dv.map(_.uniqueId).getOrElse("")), (pv, dv))
    def applyRemove(path: String,
        dv: Option[DeletionVectors.Descriptor]): Unit =
      live.remove((path, dv.map(_.uniqueId).getOrElse("")))
    def parseDv(a: com.fasterxml.jackson.databind.JsonNode)
        : Option[DeletionVectors.Descriptor] =
      if (!a.hasNonNull("deletionVector")) None
      else {
        val d = a.get("deletionVector")
        Some(DeletionVectors.Descriptor(
          d.get("storageType").asText,
          d.get("pathOrInlineDv").asText,
          if (d.hasNonNull("offset")) Some(d.get("offset").asInt) else None,
          d.get("sizeInBytes").asInt,
          d.get("cardinality").asLong))
      }
    def applyJson(v: Long): Unit = {
      val lines = new String(
        GFiles.readAllBytes(logDir.resolve(deltaName(v))), UTF_8)
        .split('\n').filter(_.trim.nonEmpty)
      lines.foreach { line =>
        val n = M.readTree(line)
        if (n.has("protocol")) {
          val p = n.get("protocol")
          val feats =
            if (p.hasNonNull("readerFeatures"))
              p.get("readerFeatures").elements().asScala.map(_.asText).toSeq
            else Seq.empty
          applyProtocol(p.get("minReaderVersion").asInt, feats)
        }
        if (n.has("metaData")) {
          val md = n.get("metaData")
          val conf =
            if (md.hasNonNull("configuration")) {
              val c = md.get("configuration")
              c.properties().asScala.map(e =>
                e.getKey -> (if (e.getValue.isNull) null
                  else e.getValue.asText)).toMap
            } else Map.empty[String, String]
          applyMetaData(md.get("schemaString").asText,
            md.get("format").get("provider").asText,
            md.get("partitionColumns").elements().asScala
              .map(_.asText).toSeq, conf)
        }
        if (n.has("add")) {
          val a = n.get("add")
          val pv =
            if (a.has("partitionValues"))
              a.get("partitionValues").properties().asScala
                .map(e => e.getKey -> (if (e.getValue.isNull) null
                  else e.getValue.asText)).toMap
            else Map.empty[String, String]
          applyAdd(decodePath(a.get("path").asText), pv, parseDv(a))
        }
        if (n.has("remove")) {
          val r = n.get("remove")
          applyRemove(decodePath(r.get("path").asText), parseDv(r))
        }
      }
    }

    /** A checkpoint this reader could seed from: (version, the parquet
      * files to read, isV2). Classic: `v.checkpoint.parquet` or
      * `v.checkpoint.i.k.parquet` (all k parts present). V2:
      * `v.checkpoint.<unique>.parquet` (manifest; sidecars resolve at
      * read). Discovered from the LISTING — `_last_checkpoint` only
      * prioritizes, never gates.
      */
    def listedCheckpoints: Seq[(Long, Seq[String], Boolean)] = {
      val Classic = """(\d{20})\.checkpoint\.parquet""".r
      val classic = names.collect {
        case n @ Classic(v) => (v.toLong, Seq(n), false)
      }
      val MultiPart = """(\d{20})\.checkpoint\.(\d{10})\.(\d{10})\.parquet""".r
      val multi = names.collect { case MultiPart(v, _, k) => (v.toLong, k.toInt) }
        .distinct.flatMap { case (v, k) =>
          val parts = (1 to k).map(i =>
            f"$v%020d.checkpoint.$i%010d.$k%010d.parquet")
          if (parts.forall(names.contains)) Some((v, parts, false)) else None
        }
      // v2 manifests come in BOTH spec formats: parquet and JSON
      // (commit-version names are all-digit middles — excluded)
      val V2Name = """(\d{20})\.checkpoint\.([^.]+)\.(parquet|json)""".r
      val v2 = names.collect {
        case n @ V2Name(v, u, _) if !u.forall(_.isDigit) =>
          (v.toLong, Seq(n), true)
      }
      classic ++ multi ++ v2
    }
    // `_last_checkpoint` is deliberately NOT consulted: the listing
    // already discovers a superset of what the hint could name, and the
    // spec calls the hint something readers must merely survive — so
    // the simplest conforming posture is to ignore it on reads

    /** Seed the state from a checkpoint: one row per action, nullable
      * structs `protocol`/`metaData`/`add` (`remove` rows are tombstones
      * — already absent from the live set). A v2 manifest additionally
      * carries `sidecar` rows naming `_delta_log/_sidecars/` files that
      * hold the add/remove actions. Driver-collected, same driver-sized-
      * state scope as the JSON replay.
      */
    // sidecar paths are URI-encoded and _sidecars-relative per the spec
    // (absolute URIs are legal there too — out of scope, refused loudly
    // like absolute add.paths, never silently mangled)
    def sidecarFile(raw: String): String = {
      val u = new java.net.URI(raw)
      require(u.getScheme == null && !raw.startsWith("/"),
        s"v2 checkpoint sidecar must be _sidecars-relative, got $raw")
      u.getPath
    }

    /** A JSON-format v2 manifest (`<v>.checkpoint.<uuid>.json`, spec-
      * legal): newline-delimited actions exactly like a commit, plus
      * `sidecar` rows naming the parquet files that hold the adds.
      */
    def applyJsonV2Manifest(name: String): Unit = {
      val lines = new String(
        GFiles.readAllBytes(logDir.resolve(name)), UTF_8)
        .split('\n').filter(_.trim.nonEmpty)
      val sidecars = scala.collection.mutable.ArrayBuffer.empty[String]
      lines.foreach { line =>
        val n = M.readTree(line)
        if (n.has("protocol")) {
          val p = n.get("protocol")
          val feats =
            if (p.hasNonNull("readerFeatures"))
              p.get("readerFeatures").elements().asScala.map(_.asText).toSeq
            else Seq.empty
          applyProtocol(p.get("minReaderVersion").asInt, feats)
        }
        if (n.has("metaData")) {
          val md = n.get("metaData")
          val conf =
            if (md.hasNonNull("configuration")) {
              val c = md.get("configuration")
              c.properties().asScala.map(e =>
                e.getKey -> (if (e.getValue.isNull) null
                  else e.getValue.asText)).toMap
            } else Map.empty[String, String]
          applyMetaData(md.get("schemaString").asText,
            md.get("format").get("provider").asText,
            md.get("partitionColumns").elements().asScala
              .map(_.asText).toSeq, conf)
        }
        if (n.has("add")) {
          val a = n.get("add")
          val pv =
            if (a.has("partitionValues"))
              a.get("partitionValues").properties().asScala
                .map(e => e.getKey -> (if (e.getValue.isNull) null
                  else e.getValue.asText)).toMap
            else Map.empty[String, String]
          applyAdd(decodePath(a.get("path").asText), pv, parseDv(a))
        }
        if (n.has("sidecar"))
          sidecars += sidecarFile(n.get("sidecar").get("path").asText)
      }
      if (sidecars.nonEmpty)
        applyActionFrames(sidecars.toSeq.map(p =>
          spark.read.parquet(s"$dir/_delta_log/_sidecars/$p")))
    }

    def applyActionFrames(frames: Seq[DataFrame]): Unit =
      frames.foreach { fr =>
        val fc = fr.columns.toSet
        if (fc.contains("add")) {
          val hasDv = fr.select("add.*").columns.contains("deletionVector")
          val sel =
            if (hasDv) fr.selectExpr("add.path", "add.partitionValues",
              "add.deletionVector.storageType",
              "add.deletionVector.pathOrInlineDv",
              "add.deletionVector.offset",
              "add.deletionVector.sizeInBytes",
              "add.deletionVector.cardinality")
            else fr.selectExpr("add.path", "add.partitionValues",
              "CAST(NULL AS STRING)", "CAST(NULL AS STRING)",
              "CAST(NULL AS INT)", "CAST(NULL AS INT)",
              "CAST(NULL AS BIGINT)")
          sel.where("add IS NOT NULL").collect().foreach { r =>
            val pv = Option(r.getMap[String, String](1))
              .map(_.toMap).getOrElse(Map.empty[String, String])
            val dv =
              if (r.isNullAt(2)) None
              else Some(DeletionVectors.Descriptor(r.getString(2),
                r.getString(3),
                if (r.isNullAt(4)) None else Some(r.getInt(4)),
                r.getInt(5), r.getLong(6)))
            applyAdd(decodePath(r.getString(0)), pv, dv)
          }
        }
      }

    def applyCheckpoint(ckNames: Seq[String], isV2: Boolean): Unit = {
      if (isV2 && ckNames.forall(_.endsWith(".json"))) {
        ckNames.foreach(applyJsonV2Manifest)
        return
      }
      val df = spark.read.parquet(ckNames.map(n => s"$dir/_delta_log/$n"): _*)
      val cols = df.columns.toSet
      if (cols.contains("protocol")) {
        val hasFeats = df.select("protocol.*").columns.contains("readerFeatures")
        val sel =
          if (hasFeats) df.selectExpr("protocol.minReaderVersion",
            "protocol.readerFeatures")
          else df.selectExpr("protocol.minReaderVersion",
            "CAST(NULL AS ARRAY<STRING>)")
        sel.where("protocol.minReaderVersion IS NOT NULL").collect()
          .foreach(r => applyProtocol(r.getInt(0),
            Option(r.getSeq[String](1)).getOrElse(Seq.empty)))
      }
      require(cols.contains("metaData"),
        "checkpoint carries no metaData column")
      val hasConf = df.select("metaData.*").columns.contains("configuration")
      df.selectExpr("metaData.schemaString", "metaData.format.provider",
          "metaData.partitionColumns",
          if (hasConf) "metaData.configuration"
          else "CAST(NULL AS MAP<STRING, STRING>)")
        .where("metaData IS NOT NULL").collect()
        .foreach(r => applyMetaData(r.getString(0), r.getString(1),
          r.getSeq[String](2),
          Option(r.getMap[String, String](3)).map(_.toMap)
            .getOrElse(Map.empty)))
      val actionFrames: Seq[DataFrame] =
        if (!isV2) Seq(df)
        else {
          // the v2 manifest may carry actions inline AND/OR in sidecars
          val side =
            if (!cols.contains("sidecar")) Seq.empty
            else df.select("sidecar.path").where("sidecar IS NOT NULL")
              .collect().map(r => sidecarFile(r.getString(0))).toSeq
          df +: side.map(p =>
            spark.read.parquet(s"$dir/_delta_log/_sidecars/$p"))
        }
      applyActionFrames(actionFrames)
    }

    val ckpts = listedCheckpoints
    val upTo = versionAsOf.getOrElse(
      (versions ++ ckpts.map(_._1) :+ -1L).max)
    require(vset.contains(upTo) || ckpts.exists(_._1 == upTo),
      s"version $upTo not in log (json $versions, checkpoints " +
        s"${ckpts.map(_._1).sorted.distinct})")
    // prefer the pure JSON replay when the full chain exists (it also
    // serves pins BELOW the checkpoint); otherwise seed from the newest
    // usable checkpoint at-or-below the pin and replay the JSON tail
    if (versions.headOption.contains(0L) &&
        (0L to upTo).forall(vset.contains)) {
      (0L to upTo).foreach(applyJson)
    } else {
      // newest usable version; classic preferred over v2 at a tie
      // (fewer files to open)
      val usable = ckpts.filter(c => c._1 <= upTo &&
          ((c._1 + 1) to upTo).forall(vset.contains))
        .sortBy(c => (c._1, !c._3)).lastOption
      usable match {
        case Some((cv, ckNames, isV2)) =>
          applyCheckpoint(ckNames, isV2)
          ((cv + 1) to upTo).foreach(applyJson)
        case None if ckpts.exists(_._1 > upTo) =>
          throw new IllegalArgumentException(
            s"version $upTo predates checkpoint " +
              s"${ckpts.map(_._1).filter(_ > upTo).min} and the JSON " +
              s"chain 0..$upTo is no longer complete (vacuumed)")
        case None =>
          throw new IllegalArgumentException(
            s"log at $dir cannot serve version $upTo: the JSON chain is " +
              s"incomplete and no checkpoint at-or-below it has a " +
              s"complete tail (json $versions, checkpoints " +
              s"${ckpts.map(_._1).sorted.distinct})")
      }
    }
    // feature validation against the REPLAYED state: column mapping
    // mode NAME resolves files by physical field names, mode ID by
    // parquet field ids (Spark's field-id matching over an id-annotated
    // read schema); both surface logical names. Anything else refuses.
    require(columnMappingMode == "none" || columnMappingMode == null ||
        columnMappingMode == "name" || columnMappingMode == "id",
      s"table uses column mapping mode '$columnMappingMode' — this " +
        "bridge implements name- and id-mode resolution")
    require(minReaderSeen < 3 || declaredFeatures.nonEmpty,
      "reader version 3 requires an explicit readerFeatures list")
    // one data file surviving under TWO action keys (distinct DV states,
    // neither removed) is a log no conforming writer produces — refuse
    // rather than double-read the file
    val dupPaths = live.keysIterator.map(_._1).toVector
      .groupBy(identity).collect { case (p, g) if g.size > 1 => p }
    require(dupPaths.isEmpty,
      s"file(s) ${dupPaths.take(3).mkString(", ")} are live under multiple " +
        "deletion-vector states — corrupt log (the paired remove is missing)")
    Snapshot(upTo,
      schema.getOrElse(throw new IllegalStateException(
        s"log at $dir carries no metaData")),
      partCols, Option(columnMappingMode).getOrElse("none"),
      live.iterator.map { case ((p, _), (pv, dv)) => (p, pv, dv) }.toVector,
      configuration)
  }

  /** The adoption view of a [[Snapshot]] — what
    * `CommitLogTable.convertFromDelta` stores: the logical schema with
    * every column-mapping / field-id annotation STRIPPED (the adopting
    * table's own `columnMapping` carries the physical names), plus the
    * top-level logical→physical map for name-mode tables. Refuses a
    * NESTED physical rename: the commitlog format's mapping is
    * top-level-only, and adopting around it would read nested fields
    * under the wrong names.
    */
  def adoptionSchema(snap: Snapshot): (StructType, Map[String, String]) = {
    import org.apache.spark.sql.types._
    def nestedRename(dt: DataType): Option[String] = dt match {
      case st: StructType => st.fields.iterator.flatMap { f =>
        (if (f.metadata.contains(PhysKey) &&
            f.metadata.getString(PhysKey) != f.name) Some(f.name)
         else None).orElse(nestedRename(f.dataType))
      }.toSeq.headOption
      case at: ArrayType => nestedRename(at.elementType)
      case mt: MapType =>
        nestedRename(mt.keyType).orElse(nestedRename(mt.valueType))
      case _ => None
    }
    snap.schema.fields.foreach { f =>
      nestedRename(f.dataType).foreach(n => throw new IllegalArgumentException(
        s"convert: nested field '$n' (inside '${f.name}') carries a " +
          "physical rename — the commitlog column mapping is " +
          "top-level-only; read through DeltaLogBridge.read instead"))
    }
    // mode `id` tables carry the same physicalName annotations (the
    // spec requires both in any mapped mode); they adopt name-mapped
    // AFTER the caller's field-id proof (`convertFromDelta` verifies
    // every file binds each id to its declared physical name)
    val mapping: Map[String, String] =
      if (snap.columnMappingMode != "name" &&
          snap.columnMappingMode != "id") Map.empty
      else snap.schema.fields.collect {
        case f if f.metadata.contains(PhysKey) &&
            f.metadata.getString(PhysKey) != f.name =>
          f.name -> f.metadata.getString(PhysKey)
      }.toMap
    def strip(m: org.apache.spark.sql.types.Metadata)
        : org.apache.spark.sql.types.Metadata =
      new org.apache.spark.sql.types.MetadataBuilder().withMetadata(m)
        .remove(PhysKey).remove(IdKey).remove("parquet.field.id")
        // generated/identity specs IMPORT as property specs
        // ([[adoptionMetadata]]) — the stored schema stays bare, like
        // the engine's own declarations
        .remove("delta.generationExpression")
        .remove("delta.identity.start").remove("delta.identity.step")
        .remove("delta.identity.allowExplicitInsert")
        .remove("delta.identity.highWaterMark").build()
    def cleanType(dt: DataType): DataType = dt match {
      case st: StructType => StructType(st.fields.map(f =>
        f.copy(dataType = cleanType(f.dataType), metadata = strip(f.metadata))))
      case at: ArrayType => at.copy(elementType = cleanType(at.elementType))
      case mt: MapType => mt.copy(keyType = cleanType(mt.keyType),
        valueType = cleanType(mt.valueType))
      case o => o
    }
    (StructType(snap.schema.fields.map(f =>
      f.copy(dataType = cleanType(f.dataType), metadata = strip(f.metadata)))),
      mapping)
  }

  /** Top-level (field id → physical name) a mode-`id` snapshot
    * declares — the adoption proof's expectation table: a file whose
    * parquet field ids bind these ids to DIFFERENT names cannot adopt
    * name-resolved.
    */
  private[tables] def fieldIdExpectations(snap: Snapshot): Map[Long, String] =
    snap.schema.fields.flatMap { f =>
      if (!f.metadata.contains(IdKey)) None
      else Some(f.metadata.getLong(IdKey) ->
        (if (f.metadata.contains(PhysKey)) f.metadata.getString(PhysKey)
         else f.name))
    }.toMap

  /** The inverse of [[deltaConfiguration]]/[[deltaSchema]] — what a
    * zero-copy adoption IMPORTS so a migrated table loses nothing:
    * `delta.constraints.<name>` entries → stored CHECKs (future graft
    * writes enforce them), every other configuration key → table
    * properties verbatim (`delta.columnMapping.*` stays in the log —
    * the manifest's own mapping carries it; an imported
    * `delta.enableChangeDataFeed=true` keeps the mirror emitting cdc
    * through the migration), and generated/identity FIELD metadata →
    * the engine's `graft.generated.`/`graft.identity.` property specs,
    * so the write planes fill/assert/allocate exactly as for
    * natively-declared columns. Returns (constraints, properties).
    */
  def adoptionMetadata(
      snap: Snapshot): (Map[String, String], Map[String, String]) = {
    val constraints = snap.configuration.collect {
      case (k, v) if k.startsWith("delta.constraints.") =>
        k.stripPrefix("delta.constraints.") -> v
    }
    val passthrough = snap.configuration.filterNot { case (k, _) =>
      k.startsWith("delta.constraints.") ||
        k.startsWith("delta.columnMapping.") }
    val genId: Seq[(String, String)] = snap.schema.fields.toSeq.flatMap { f =>
      val m = f.metadata
      val gen =
        if (!m.contains("delta.generationExpression")) Nil
        else Seq(CommitLogTable.GeneratedPropPrefix + f.name ->
          m.getString("delta.generationExpression"))
      val id =
        if (!m.contains("delta.identity.start")) Nil
        else {
          val step = if (m.contains("delta.identity.step"))
            m.getLong("delta.identity.step") else 1L
          val allow = m.contains("delta.identity.allowExplicitInsert") &&
            m.getBoolean("delta.identity.allowExplicitInsert")
          Seq(CommitLogTable.IdentityPropPrefix + f.name ->
            s"${m.getLong("delta.identity.start")},$step,$allow") ++
            (if (!m.contains("delta.identity.highWaterMark")) Nil
             else Seq(CommitLogTable.IdentityPropPrefix + f.name +
               ".highWater" ->
               m.getLong("delta.identity.highWaterMark").toString))
        }
      gen ++ id
    }
    (constraints, passthrough ++ genId)
  }

  private def readSnapshot(spark: SparkSession, dir: String,
      snap: Snapshot): DataFrame = {
    val partCols = snap.partitionCols
    val columnMappingMode = snap.columnMappingMode
    // live deletion vectors RESOLVE here (inline or u-storage .bin),
    // validated against their declared size/cardinality — the assembly
    // filters the marked row indexes out of the single scan
    val dvByPath: Map[String, Array[Byte]] = snap.live.iterator.collect {
      case (p, _, Some(d)) => p -> DeletionVectors.resolveData(dir, d)
    }.toMap
    val s = snap.schema
    // name-mode: scan by PHYSICAL names (nested fields included) and
    // surface logical ones; partitionValues keys are physical per the
    // protocol's column-mapping rules (logical keys tolerated — some
    // writers emit them). Id-mode additionally annotates the read
    // schema with `parquet.field.id` so Spark's reader matches by the
    // delta.columnMapping.id — a file PREDATING the ids fails Spark's
    // own "no field ids" check, the loud refusal the protocol wants.
    // Mode none/absent IGNORES any leftover mapping metadata, as the
    // spec requires — stale annotations on a derived schema must not
    // redirect the scan.
    val mappedMode = columnMappingMode == "name" || columnMappingMode == "id"
    val idMode = columnMappingMode == "id"
    val physOf: Map[String, String] =
      if (!mappedMode) s.fieldNames.map(n => n -> n).toMap
      else s.fields.map { f =>
        f.name -> (if (f.metadata.contains(PhysKey))
          f.metadata.getString(PhysKey) else f.name)
      }.toMap
    val physSchema =
      if (!mappedMode) s
      else StructType(s.fields.map(f =>
        physicalField(f, physOf(f.name), idMode)))
    if (idMode)
      // session-scoped AND sticky on purpose: Spark's parquet reader
      // re-reads this flag from the session conf when the physical plan
      // builds, so a set/restore around this (lazy) DataFrame would
      // race its own execution. The flag only activates for scans whose
      // REQUESTED schema carries parquet.field.id metadata — the
      // schemas this bridge builds, plus any user schema that already
      // carries explicit ids, for which id-resolution is the annotated
      // intent anyway.
      spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    val physPartCols = partCols.map(pc => physOf.getOrElse(pc, pc))
    val liveNorm = snap.live.map { case (p, pv, _) =>
      (p, partCols.zip(physPartCols).map { case (lc, pc) =>
        pc -> pv.getOrElse(pc, pv.getOrElse(lc, null))
      }.toMap)
    }
    assembleRead(spark, dir, physSchema, physPartCols, liveNorm,
      outFields = s.fields.toSeq, dvByPath = dvByPath)
  }

  /** ONE parquet scan over every live file, with log-sourced partition
    * values attached via a broadcast `_metadata.file_path` → values
    * lookup — the scale path: a 1 000-partition snapshot plans a single
    * FileScan node instead of a 1 000-way union. An unmatched file path
    * RAISES (a silent null partition value would be corruption, and the
    * lookup key is an exact SparkPath rendering that must track the
    * scan's).
    */
  private def assembleRead(spark: SparkSession, dir: String,
      s: StructType, partCols: Seq[String],
      live: Seq[(String, Map[String, String])],
      outFields: Seq[org.apache.spark.sql.types.StructField],
      dvByPath: Map[String, Array[Byte]] = Map.empty,
      perFileVersion: Seq[Long] = null): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    // perFileVersion (aligned with `live`): attach `_commit_version`
    // per FILE through the same broadcast file_path join the partition
    // values ride — the CDF consolidation's one-scan-per-kind shape. A
    // path listed at several versions (foreign RESTORE, remove-then-
    // re-add) must surface once PER LISTING: the scan reads each
    // DISTINCT path exactly once and the broadcast rows alone fan the
    // multiplicity out — scanning the duplicated path list too would
    // square it (k listings → k scans × k join rows = k² copies),
    // because Spark does not dedupe duplicate scan paths.
    require(perFileVersion == null || perFileVersion.size == live.size,
      "perFileVersion must align with live")
    // surface each column under its LOGICAL name and type: the cast
    // renames name-mode nested struct fields back to logical
    // (struct casts are positional), and the empty-metadata alias
    // strips the columnMapping annotations — a frame derived from this
    // read must never carry stale physical redirections
    // cast targets are all-nullable: parquet scans surface nullable
    // structs, and a cast TO a non-nullable nested field is illegal —
    // the cast exists to restore logical NAMES, never to tighten nulls
    def nullableDeep(dt: org.apache.spark.sql.types.DataType)
        : org.apache.spark.sql.types.DataType = dt match {
      case st: StructType => StructType(st.fields.map(f =>
        f.copy(dataType = nullableDeep(f.dataType), nullable = true)))
      case at: org.apache.spark.sql.types.ArrayType =>
        at.copy(elementType = nullableDeep(at.elementType),
          containsNull = true)
      case mt: org.apache.spark.sql.types.MapType =>
        mt.copy(keyType = nullableDeep(mt.keyType),
          valueType = nullableDeep(mt.valueType), valueContainsNull = true)
      case o => o
    }
    def out(cols: Seq[org.apache.spark.sql.Column])
        : Seq[org.apache.spark.sql.Column] =
      cols.zip(outFields).map { case (c, f) =>
        c.cast(nullableDeep(f.dataType)).as(f.name,
          org.apache.spark.sql.types.Metadata.empty) }
    val dataSchema = StructType(s.fields.filterNot(f => partCols.contains(f.name)))
    if (live.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(outFields.map(f =>
          f.copy(metadata = org.apache.spark.sql.types.Metadata.empty))))
    partCols.foreach(pc => require(s.fields.exists(_.name == pc),
      s"partition column $pc missing from schemaString"))
    val allPaths = live.map { case (p, _) => s"$dir/$p" }
    // when the broadcast join attaches pv/version, it alone carries the
    // per-listing multiplicity, so the scan MUST be distinct; on the
    // join-less early-return path below the scan itself is the
    // multiplicity, so the raw list is the correct one there
    val joinAttaches = partCols.nonEmpty || perFileVersion != null
    val paths = if (joinAttaches) allPaths.distinct else allPaths
    val base = spark.read.schema(dataSchema).parquet(paths: _*)
    // lookup keys must render exactly as the scan's _metadata.file_path
    // does: the listing's FileStatus paths carry a NULL authority on
    // filesystems whose default has none (local → "file:/x", not
    // "file:///x"), so the qualified URI re-renders with an empty
    // authority stripped; the path part URL-encodes exactly as
    // SparkPath does (space → %20, % → %25)
    val hconf = spark.sessionState.newHadoopConf()
    def key(abs: String): String = {
      val p = new org.apache.hadoop.fs.Path(abs)
      val q = p.getFileSystem(hconf).makeQualified(p).toUri
      new java.net.URI(q.getScheme,
        if (q.getAuthority != null && q.getAuthority.isEmpty) null
        else q.getAuthority,
        q.getPath, null, null).toString
    }
    // deletion vectors filter by (file, row-ordinal-within-file) — the
    // exact pair `_metadata` surfaces. Bitmaps travel SERIALIZED in one
    // broadcast and deserialize once per executor (DvLookup's transient
    // cache); per row the probe is a bitmap contains. DV-less files miss
    // the map and pass untouched. This is the bridge/interop read path —
    // a scalar UDF probe is the honest cost of merge-on-read parity, and
    // it never touches the engine's own (manifest-native) scans.
    val deduped =
      if (dvByPath.isEmpty) base
      else {
        val dvByKey = dvByPath.map { case (p, b) => key(s"$dir/$p") -> b }
        val lookup = new DvLookup(spark.sparkContext.broadcast(dvByKey))
        val deletedUdf = org.apache.spark.sql.functions.udf(
          (fp: String, ri: Long) => lookup.deleted(fp, ri))
        base.where(!deletedUdf(col("_metadata.file_path"),
          col("_metadata.row_index")))
      }
    if (partCols.isEmpty && perFileVersion == null)
      return deduped.select(out(s.fieldNames.toSeq.map(col)): _*)
    val withVer = perFileVersion != null
    val pvSchema = StructType(
      (org.apache.spark.sql.types.StructField("__graft_fp",
        org.apache.spark.sql.types.StringType, nullable = false) +:
      partCols.map(pc => org.apache.spark.sql.types.StructField(
        s"__graft_pv_$pc", org.apache.spark.sql.types.StringType))) ++
      (if (withVer) Seq(org.apache.spark.sql.types.StructField(
        "__graft_ver", org.apache.spark.sql.types.LongType,
        nullable = false)) else Seq.empty))
    val rows = live.zipWithIndex.map { case ((p, pv), i) =>
      org.apache.spark.sql.Row.fromSeq(
        (key(s"$dir/$p") +: partCols.map(pc => pv.getOrElse(pc, null))) ++
          (if (withVer) Seq(perFileVersion(i)) else Seq.empty))
    }
    val pvDf = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](rows.asJava), pvSchema)
      .withColumn("__graft_hit", lit(true))
    val joined = deduped
      .withColumn("__graft_fp", col("_metadata.file_path"))
      .join(broadcast(pvDf), Seq("__graft_fp"), "left")
    def onHit(c: org.apache.spark.sql.Column, what: String)
        : org.apache.spark.sql.Column =
      org.apache.spark.sql.functions.when(col("__graft_hit").isNull,
          org.apache.spark.sql.functions.raise_error(
            org.apache.spark.sql.functions.concat(
              lit(s"DeltaLogBridge: no $what for file "),
              col("__graft_fp"))))
        .otherwise(c)
    val outCols = s.fields.toSeq.map { f =>
      if (partCols.contains(f.name))
        onHit(col(s"__graft_pv_${f.name}").cast(f.dataType),
          "partition values")
      else col(f.name)
    }
    val verCol =
      if (!withVer) Seq.empty
      else Seq(org.apache.spark.sql.graftbridge.toColumn(
        org.apache.spark.sql.catalyst.expressions.objects.AssertNotNull(
          org.apache.spark.sql.graftbridge.toCatalystExpression(
            onHit(col("__graft_ver"), "commit version"))))
        .as("_commit_version"))
    joined.select(out(outCols) ++ verCol: _*)
  }

  /** CHANGE DATA FEED read of a Delta log — the consumption half of
    * the protocol's CDF surface (the reference's Silver MERGE reads
    * exactly this, `docs/databricks_setup.md:170-198`): per commit in
    * `[startingVersion, endingVersion]`, serve the commit's `cdc`
    * actions when present (their `_change_data` parquet IS the exact
    * image set — used EXCLUSIVELY, per the spec), else DERIVE: adds
    * with `dataChange=true` are insert images, removes with
    * `dataChange=true` are whole-file delete images (partition values
    * from the remove's own `partitionValues`). A commit that BOTH adds
    * and removes data without cdc — a copy-on-write rewrite whose
    * per-row images were never persisted — refuses loudly instead of
    * fabricating wrong images, as does a DV swap without cdc and a
    * removed file the disk no longer holds (vacuumed past the
    * consumer's lag). Rows surface under the END version's schema with
    * `_change_type` and `_commit_version` appended — the same shape
    * `CommitLogTable.readChanges` serves, so the mirror's cdc output
    * round-trips through this reader 1:1 with the engine's own feed.
    */
  def readChanges(spark: SparkSession, dir: String,
      startingVersion: Long, endingVersion: Long): DataFrame = {
    require(startingVersion >= 0 && endingVersion >= startingVersion,
      s"bad CDF bounds [$startingVersion, $endingVersion]")
    val logDir = GPath(dir, "_delta_log")
    require(GFiles.isDirectory(logDir), s"no _delta_log at $dir")
    (startingVersion to endingVersion).foreach(v =>
      require(GFiles.exists(logDir.resolve(deltaName(v))),
        s"CDF version $v is not in the log at $dir (vacuumed or never " +
          "written) — change feeds replay commit JSONs, not checkpoints"))
    // schema/mapping/partitioning resolve at the END version — Delta's
    // batch-CDF rule; an incompatible mid-range schema change surfaces
    // as the read error it is
    val snap = snapshot(spark, dir, Some(endingVersion))
    val s = snap.schema
    val mappedMode = snap.columnMappingMode == "name" ||
      snap.columnMappingMode == "id"
    val physOf: Map[String, String] =
      if (!mappedMode) s.fieldNames.map(n => n -> n).toMap
      else s.fields.map { f =>
        f.name -> (if (f.metadata.contains(PhysKey))
          f.metadata.getString(PhysKey) else f.name)
      }.toMap
    val idMode = snap.columnMappingMode == "id"
    val physSchema =
      if (!mappedMode) s
      else StructType(s.fields.map(f =>
        physicalField(f, physOf(f.name), idMode)))
    if (idMode)
      spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    val ctField = org.apache.spark.sql.types.StructField(
      "_change_type", org.apache.spark.sql.types.StringType)
    val physPart = snap.partitionCols.map(pc => physOf.getOrElse(pc, pc))
    def pvOf(n: com.fasterxml.jackson.databind.JsonNode)
        : Map[String, String] =
      if (!n.hasNonNull("partitionValues")) Map.empty
      else n.get("partitionValues").properties().asScala
        .map(e => e.getKey -> (if (e.getValue.isNull) null
          else e.getValue.asText)).toMap
    def normPv(pv: Map[String, String]): Map[String, String] =
      snap.partitionCols.zip(physPart).map { case (lc, pc) =>
        pc -> pv.getOrElse(pc, pv.getOrElse(lc, null))
      }.toMap
    // ONE pass parses and validates every commit JSON, then AT MOST
    // THREE scans serve the whole range — cdc files, derived inserts,
    // derived deletes — with `_commit_version` attached per file by the
    // same broadcast file_path join the partition values ride. The old
    // shape unioned one frame PER VERSION: a consumer catching up over
    // thousands of commits built a thousands-deep union plan; this one
    // stays three scans deep no matter how wide the range is.
    val cdcFiles = Vector.newBuilder[(String, Map[String, String], Long)]
    val insFiles = Vector.newBuilder[(String, Map[String, String], Long)]
    val delFiles = Vector.newBuilder[(String, Map[String, String], Long)]
    (startingVersion to endingVersion).foreach { v =>
      val lines = new String(
        GFiles.readAllBytes(logDir.resolve(deltaName(v))), UTF_8)
        .split('\n').filter(_.trim.nonEmpty).map(M.readTree)
      val cdcs = lines.filter(_.has("cdc")).map(_.get("cdc"))
        .map(c => (decodePath(c.get("path").asText), normPv(pvOf(c))))
      if (cdcs.nonEmpty) {
        // exact images: the cdc parquet carries _change_type in-data
        cdcs.foreach { case (p, pv) => cdcFiles += ((p, pv, v)) }
      } else {
        val adds = lines.filter(_.has("add")).map(_.get("add"))
          .filter(a => !a.has("dataChange") || a.get("dataChange").asBoolean)
        val removes = lines.filter(_.has("remove")).map(_.get("remove"))
          .filter(r => !r.has("dataChange") || r.get("dataChange").asBoolean)
        require(adds.isEmpty || removes.isEmpty,
          s"CDF: commit $v of $dir rewrote files (adds AND removes) " +
            "without cdc actions — its per-row images were never " +
            "persisted; enable delta.enableChangeDataFeed before the " +
            "commit, or start the feed after it")
        require(!adds.exists(_.hasNonNull("deletionVector")) &&
            !removes.exists(_.hasNonNull("deletionVector")),
          s"CDF: commit $v of $dir changed deletion-vector state " +
            "without cdc actions — underivable, refusing")
        adds.foreach(a => insFiles +=
          ((decodePath(a.get("path").asText), normPv(pvOf(a)), v)))
        removes.foreach { r =>
          val p = decodePath(r.get("path").asText)
          require(GFiles.exists(GPath(dir, p)),
            s"CDF: commit $v removed $p, whose bytes are gone " +
              "(vacuumed) — delete images are unrecoverable; keep " +
              "retention deeper than the slowest consumer's lag")
          require(snap.partitionCols.isEmpty ||
              r.hasNonNull("partitionValues"),
            s"CDF: commit $v's remove of $p carries no " +
              "partitionValues on a partitioned table — " +
              "underivable delete images")
          delFiles += ((p, normPv(pvOf(r)), v))
        }
      }
    }
    def grouped(files: Seq[(String, Map[String, String], Long)],
        withCt: Boolean, ct: String): Option[DataFrame] =
      if (files.isEmpty) None
      else {
        val base = assembleRead(spark, dir,
          if (withCt) StructType(physSchema.fields :+ ctField)
          else physSchema,
          physPart, files.map(f => (f._1, f._2)),
          outFields =
            if (withCt) s.fields.toSeq :+ ctField else s.fields.toSeq,
          perFileVersion = files.map(_._3))
        Some(if (withCt) base else base.withColumn("_change_type", lit(ct)))
      }
    val frames =
      grouped(cdcFiles.result(), withCt = true, ct = "").toSeq ++
      grouped(insFiles.result(), withCt = false, ct = "insert").toSeq ++
      grouped(delFiles.result(), withCt = false, ct = "delete").toSeq
    frames.map(_.select((s.fieldNames.toSeq :+ "_change_type" :+
        "_commit_version").map(col): _*))
      .reduceOption(_.unionByName(_)).getOrElse {
      import org.apache.spark.sql.types._
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(s.fields.map(_.copy(metadata = Metadata.empty)) :+
          ctField :+ StructField("_commit_version", LongType,
            nullable = false)))
    }
  }

  /** Export the CURRENT snapshot of a commit-log table as a Delta log
    * next to its data — `_delta_log/00000000000000000000.json` with
    * protocol, metaData (the manifest schema verbatim — both formats
    * store Spark StructType JSON), and one `add` per live file,
    * partition values carried from the manifest. ZERO data copied: the
    * actions reference the table's existing parquet in place (graft
    * data files also carry the partition column physically, which the
    * protocol tolerates — readers source those values from the log).
    * Column mapping exports as reader-v2 name mode; merge-on-read
    * delete marks export as protocol deletion vectors (v3/v7);
    * constraints/properties/generated/identity specs travel in
    * metaData. Returns the number of files exported.
    */
  def export(table: CommitLogTable, overwrite: Boolean = false): Int = {
    val snap = table.resolvedManifest(None)
    // live column mapping (renames, post-drop re-adds) exports as a
    // reader-v2 NAME-mode log: schemaString fields carry the mapping
    // metadata, partitionValues key by physical names — the same
    // encoding Databricks-written mapped tables use. Pending lazy-delete
    // marks export as protocol DELETION VECTORS (reader v3 / writer v7
    // table features), so merge-on-read state ships without a rewrite.
    val mapped = snap.columnMapping.nonEmpty
    val logDir = GPath(table.dir, "_delta_log")
    require(overwrite || !GFiles.exists(logDir.resolve(deltaName(0L))),
      s"a _delta_log already exists at ${table.dir}")
    GFiles.createDirectories(logDir)
    val now = System.currentTimeMillis()
    val sb = new StringBuilder
    sb.append(protocolJson(protocolNeed(snap))).append('\n')
    val md = M.createObjectNode()
    val mdN = md.putObject("metaData")
    mdN.put("id", java.util.UUID.randomUUID().toString)
    val fmt = mdN.putObject("format")
    fmt.put("provider", "parquet")
    fmt.putObject("options")
    val conf = mdN.putObject("configuration")
    // constraints, user TBLPROPERTIES, and generated/identity specs
    // travel with the export — an external Delta WRITER appending to
    // this log enforces what the graft side guarantees
    deltaConfiguration(snap).toSeq.sortBy(_._1).foreach {
      case (k, v) => conf.put(k, v) }
    val exportSchema = deltaSchema(snap)
    if (mapped) {
      // ids carry forward from whatever the log (overwrite case) already
      // declared — maxColumnId is monotonic, retired ids never re-issue
      val (json, maxId) = mappedSchemaJson(exportSchema, snap.columnMapping,
        priorFieldIds(table.spark, logDir))
      mdN.put("schemaString", json)
      conf.put("delta.columnMapping.mode", "name")
      conf.put(MaxIdKey, maxId.toString)
    } else mdN.put("schemaString", exportSchema.json)
    val pc = mdN.putArray("partitionColumns")
    snap.partitionCols.foreach(pc.add)
    mdN.put("createdTime", now)
    sb.append(M.writeValueAsString(md)).append('\n')
    snap.files.foreach { f =>
      val add = M.createObjectNode()
      val a = add.putObject("add")
      a.put("path", encodePath(f.path))
      val pv = a.putObject("partitionValues")
      // column-mapped logs key partition values by PHYSICAL name
      partitionValuesOf(snap.partitionCols
          .map(c => snap.columnMapping.getOrElse(c, c)), f).foreach {
        case (c, Some(v)) => pv.put(c, v)
        case (c, None) => pv.putNull(c)
      }
      a.put("size", f.bytes)
      a.put("modificationTime", now)
      a.put("dataChange", true)
      if (dvMarked(f)) putDv(a, dvDescriptorFor(table, snap, f))
      sb.append(M.writeValueAsString(add)).append('\n')
    }
    val tmp = logDir.resolve(s".tmp-export-${java.util.UUID.randomUUID()}")
    GFiles.write(tmp, sb.toString.getBytes(UTF_8))
    try GFiles.moveReplaceIdempotent(tmp, logDir.resolve(deltaName(0L)))
    finally GFiles.deleteIfExists(tmp)
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
    * A lazy-delete mark mirrors as a protocol DELETION VECTOR (reader
    * v3 / writer v7 table features): the mark's matching row indexes
    * materialize once into a deterministic `deletion_vector_<uuid>.bin`
    * and the commit swaps the file action to one carrying the DV — the
    * table's cheapest write verb never pauses the mirror, and the later
    * OPTIMIZE mirrors as the DV-clearing rewrite. Live column mapping
    * mirrors as reader-v2 name mode. The only genuinely inexpressible
    * commit left — an in-place file-entry mutation beyond the mark —
    * writes a `_GRAFT_MIRROR_BROKEN` marker and STOPS the mirror: Delta
    * readers keep the last consistent snapshot rather than silently
    * drifting. The break SELF-CURES: the next catch-up re-seeds a fresh
    * checkpoint at the current head and drops the marker — external
    * readers jump to the cured snapshot via `_last_checkpoint`.
    * Compaction mirrors with `dataChange=false`.
    */
  val MirrorProp = "graft.deltaMirror.enabled"
  private val BrokenMarker = "_GRAFT_MIRROR_BROKEN"
  /** Stamped into `_delta_log` by a HEAD-version `convertFromDelta`:
    * the adopted log's state at its head equals the graft genesis
    * manifest, so the mirror may CONTINUE this log at N+1 (the one
    * append-alignment proof besides the mirror's own seed claims).
    */
  private[tables] val AlignedMarker = "_graft_aligned"

  private def stableId(dir: String): String =
    java.util.UUID.nameUUIDFromBytes(
      s"graft-delta-mirror:$dir".getBytes(UTF_8)).toString

  /** File-count threshold past which a seed writes the V2
    * (manifest+sidecar) checkpoint instead of one classic parquet —
    * Delta splits its checkpoints for the same reason: at 100 TB file
    * counts a monolithic checkpoint file is the write AND read
    * bottleneck. Table-property tunable for tests and small tables.
    */
  val V2CheckpointMinFilesProp = "graft.deltaMirror.v2CheckpointMinFiles"
  private val V2CheckpointMinFilesDefault = 10000
  private def v2CheckpointMinFiles(m: CommitLogTable.Manifest): Int =
    m.properties.get(V2CheckpointMinFilesProp).map(_.toInt)
      .getOrElse(V2CheckpointMinFilesDefault)

  /** Mirror checkpoint cadence — Delta's `delta.checkpointInterval`
    * semantics (default 10): every Nth mirrored commit also writes a
    * checkpoint, bounding how many jsons an external reader replays.
    */
  val CheckpointIntervalProp = "graft.deltaMirror.checkpointInterval"
  private val CheckpointIntervalDefault = 10
  private def checkpointInterval(m: CommitLogTable.Manifest): Long =
    math.max(1L, m.properties.get(CheckpointIntervalProp).map(_.toLong)
      .getOrElse(CheckpointIntervalDefault.toLong))

  /** Mirror LOG retention — Delta's `delta.logRetentionDuration`
    * hygiene, version-spelled like the table's own log vacuum: keep the
    * newest N checkpoints and every json at-or-above the OLDEST kept
    * one; older jsons, checkpoints, their sidecars, and seed-claim
    * markers are dropped at checkpoint time (Delta cleans on checkpoint
    * too). OFF by default (0 = keep everything): log history is a
    * time-travel asset, and trimming it is an explicit retention
    * decision. External readers keep working — a log starting at a
    * checkpoint is the vacuumed-history shape every Delta reader
    * handles; pins below the floor fail with the version-not-found
    * error, exactly like Delta.
    */
  val LogRetainCheckpointsProp = "graft.deltaMirror.logRetainCheckpoints"

  private def vacuumMirrorLog(m: CommitLogTable.Manifest,
      logDir: GPath): Unit = {
    val retain = m.properties.get(LogRetainCheckpointsProp)
      .map(_.toInt).getOrElse(0)
    if (retain <= 0) return
    val names = GFiles.list(logDir).map(_.fileName)
    val Classic = """(\d{20})\.checkpoint(?:\.\d+\.\d+)?\.parquet""".r
    val V2 = """(\d{20})\.checkpoint\.[^.]+\.(?:parquet|json)""".r
    def ckVersion(n: String): Option[Long] = n match {
      case Classic(v) => Some(v.toLong)
      case V2(v) => Some(v.toLong)
      case _ => None
    }
    val ckVs = names.flatMap(ckVersion).distinct.sorted
    if (ckVs.size <= retain) return
    val floor = ckVs.takeRight(retain).head
    val droppedUuids = scala.collection.mutable.Set.empty[String]
    names.foreach { n =>
      val jsonV: Option[Long] =
        if (n.length == 25 && n.endsWith(".json") &&
            n.dropRight(5).forall(_.isDigit))
          Some(n.dropRight(5).toLong)
        else None
      val drop =
        ckVersion(n).exists(_ < floor) ||
        jsonV.exists(_ < floor) ||
        (n.startsWith("_graft_seed.") &&
          n.stripPrefix("_graft_seed.").forall(_.isDigit) &&
          n.stripPrefix("_graft_seed.").toLong < floor)
      if (drop) {
        if (ckVersion(n).exists(_ < floor))
          """\d{20}\.checkpoint\.([^.]+)\.parquet""".r
            .findFirstMatchIn(n).foreach(m0 => droppedUuids += m0.group(1))
        // a dropped commit's `_change_data` goes with its json — the
        // cdc directory name derives deterministically from the version
        jsonV.filter(_ < floor).foreach { v =>
          val tableDir = logDir.getParent.toString
          deleteTree(logDir.getParent.resolve("_change_data")
            .resolve(cdcUuid(tableDir, v).toString))
        }
        GFiles.deleteIfExists(logDir.resolve(n))
      }
    }
    // sidecars: delete ONLY the dropped manifests' own `<uuid>.parquet`
    // (the name this mirror writes) — a foreign/adopted log's sidecars
    // may be referenced under arbitrary names by manifests we keep
    val sidecarDir = logDir.resolve("_sidecars")
    if (GFiles.isDirectory(sidecarDir))
      droppedUuids.foreach(u =>
        GFiles.deleteIfExists(sidecarDir.resolve(s"$u.parquet")))
  }

  private val V2CheckpointNeed: (Int, Int, Seq[String], Seq[String]) =
    (3, 7, Seq("v2Checkpoint"), Seq("v2Checkpoint"))

  /** Deterministic v2-checkpoint identity: racing seeders of the same
    * version produce the same manifest and sidecar names, so the
    * atomic-replace redo converges exactly like the classic seed.
    */
  private def v2CheckpointUuid(dir: String, version: Long): java.util.UUID =
    java.util.UUID.nameUUIDFromBytes(
      s"graft-v2ck:${stableId(dir)}:$version".getBytes(UTF_8))
  private def v2ManifestName(dir: String, version: Long): String =
    f"$version%020d.checkpoint.${v2CheckpointUuid(dir, version)}.parquet"

  /** `delta.enableChangeDataFeed` truthy in table properties — the
    * user-facing CDF switch (the reference's own Bronze DDL sets it as
    * a TBLPROPERTY, `docs/databricks_setup.md:96`): when ON, the
    * mirror writes `_change_data/` parquet + `cdc` actions for every
    * change-bearing commit, so external Delta consumers run the
    * reference's CDF-driven Silver MERGE against a graft table.
    */
  private def cdfEnabled(m: CommitLogTable.Manifest): Boolean =
    m.properties.get("delta.enableChangeDataFeed")
      .exists(_.equalsIgnoreCase("true"))

  /** Delta-native `metaData.configuration` of a manifest: user
    * TBLPROPERTIES pass through verbatim (the reference sets `delta.*`
    * keys this way), stored CHECK constraints translate to
    * `delta.constraints.<name>` — the spelling an external Delta
    * WRITER enforces before appending. Engine-internal `graft.*` keys
    * stay home (generated/identity specs travel as schemaString field
    * metadata instead, [[deltaSchema]]); column-mapping keys are the
    * emitters' own concern (they depend on the id carry).
    */
  private def deltaConfiguration(
      m: CommitLogTable.Manifest): Map[String, String] =
    m.properties.filterNot { case (k, _) => k.startsWith("graft.") } ++
      m.constraints.map { case (n, sql) => s"delta.constraints.$n" -> sql }

  /** The manifest schema with Delta generated/identity FIELD metadata
    * attached: `graft.generated.<col>` → `delta.generationExpression`,
    * `graft.identity.<col>` (+ `.highWater`) → `delta.identity.{start,
    * step,allowExplicitInsert,highWaterMark}` — what delta-spark reads
    * (and enforces on its own writes) from a mirrored or exported log.
    */
  private def deltaSchema(m: CommitLogTable.Manifest): StructType = {
    val gens = CommitLogTable.generatedExprs(m.properties).toMap
    val ids = CommitLogTable.identitySpecs(m.properties)
      .map(s => s.col -> s).toMap
    if (gens.isEmpty && ids.isEmpty) return m.schema
    StructType(m.schema.fields.map { f =>
      val mb = new org.apache.spark.sql.types.MetadataBuilder()
        .withMetadata(f.metadata)
      gens.get(f.name).foreach(e =>
        mb.putString("delta.generationExpression", e))
      ids.get(f.name).foreach { s =>
        mb.putLong("delta.identity.start", s.start)
        mb.putLong("delta.identity.step", s.step)
        mb.putBoolean("delta.identity.allowExplicitInsert", s.allowExplicit)
        m.properties
          .get(CommitLogTable.IdentityPropPrefix + f.name + ".highWater")
          .foreach(h => mb.putLong("delta.identity.highWaterMark", h.toLong))
      }
      f.copy(metadata = mb.build())
    })
  }

  /** One metaData action line; returns it plus the UPDATED field-id
    * carry (new columns consumed ids) for the caller's next emission.
    */
  private def metaDataJson(dir: String, schema: StructType,
      partitionCols: Seq[String], tsMillis: Long,
      mapping: Map[String, String],
      extraConf: Map[String, String],
      prior: (Map[String, Long], Long)): (String, (Map[String, Long], Long)) = {
    val md = M.createObjectNode()
    val mdN = md.putObject("metaData")
    mdN.put("id", stableId(dir))
    val fmt = mdN.putObject("format")
    fmt.put("provider", "parquet")
    fmt.putObject("options")
    val conf = mdN.putObject("configuration")
    extraConf.toSeq.sortBy(_._1).foreach { case (k, v) => conf.put(k, v) }
    var carry = prior
    if (mapping.nonEmpty) {
      val (json, maxId) = mappedSchemaJson(schema, mapping, prior)
      mdN.put("schemaString", json)
      conf.put("delta.columnMapping.mode", "name")
      conf.put(MaxIdKey, maxId.toString)
      carry = (fieldIdsFromSchemaJson(json, Map.empty)._1, maxId)
    } else mdN.put("schemaString", schema.json)
    val pc = mdN.putArray("partitionColumns")
    partitionCols.foreach(pc.add)
    mdN.put("createdTime", tsMillis)
    (M.writeValueAsString(md), carry)
  }

  private def addJson(partitionCols: Seq[String], f: CommitLogTable.LogFile,
      tsMillis: Long, dataChange: Boolean,
      dv: Option[DeletionVectors.Descriptor] = None): String = {
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
    dv.foreach(putDv(a, _))
    M.writeValueAsString(add)
  }

  private def putDv(parent: com.fasterxml.jackson.databind.node.ObjectNode,
      d: DeletionVectors.Descriptor): Unit = {
    val dn = parent.putObject("deletionVector")
    dn.put("storageType", d.storageType)
    dn.put("pathOrInlineDv", d.pathOrInlineDv)
    d.offset.foreach(dn.put("offset", _))
    dn.put("sizeInBytes", d.sizeInBytes)
    dn.put("cardinality", d.cardinality)
  }

  // ------------------------------------------------- deletion-vector writes

  /** Deterministic DV identity for a (file, cumulative-predicate) mark:
    * the UUID derives from the stable table id + path + predicate text,
    * so racing mirror writers — and the LATER translation that must
    * emit the matching `remove` — all derive the identical descriptor
    * from the manifest alone, no side registry. One `.bin` per marked
    * file at the table root (vacuum sweeps only `data/`), written
    * idempotently at first need.
    */
  private def dvUuid(dir: String, path: String,
      predicate: String, adoptedId: String = ""): java.util.UUID =
    java.util.UUID.nameUUIDFromBytes(
      (s"graft-dv:${stableId(dir)}:$path:$predicate" +
        (if (adoptedId.isEmpty) "" else s":$adoptedId")).getBytes(UTF_8))

  /** The descriptor for a marked file entry, materializing the `.bin`
    * on first need: an existing file answers size/cardinality without
    * re-scanning data (how a remove-side translation stays cheap); a
    * missing one recomputes the bitmap from the data file — a pure
    * function of (file content, predicate), so the redo converges.
    * An entry whose ONLY merge-on-read state is an adopted DV
    * ([[CommitLogTable.LogFile.adoptedDv]]) translates to its original
    * descriptor verbatim — the continued `_delta_log` keeps referencing
    * the very bytes the source table wrote, zero copies; a predicate
    * mark layered on top derives a fresh DV covering the UNION
    * ([[CommitLogTable.pendingDeleteBitmap]] merges).
    */
  private def dvDescriptorFor(table: CommitLogTable,
      m: CommitLogTable.Manifest,
      f: CommitLogTable.LogFile): DeletionVectors.Descriptor = {
    val adopted = f.adoptedDv.map(DeletionVectors.decodeDescriptor)
    if (f.pendingDelete.isEmpty)
      return adopted.getOrElse(throw new IllegalStateException(
        s"dvDescriptorFor on unmarked file ${f.path}"))
    val pred = f.pendingDelete.get
    val uuid = dvUuid(table.dir, f.path, pred,
      adopted.map(_.uniqueId).getOrElse(""))
    val z = DeletionVectors.z85Uuid(uuid)
    val bin = DeletionVectors.uStoragePath(table.dir, z)
    val data =
      if (GFiles.exists(bin)) DeletionVectors.readSole(bin)
      else {
        val (bm, _) = table.pendingDeleteBitmap(m, f)
        DeletionVectors.writeFile(bin, Seq(bm))
        bm
      }
    val card = DeletionVectors
      .Resolved(DeletionVectors.deserializeBitmap(data)).cardinality
    DeletionVectors.Descriptor("u", z, Some(1), data.length, card)
  }

  /** Merge-on-read state a file entry carries — either kind translates
    * to a protocol deletion vector.
    */
  private def dvMarked(f: CommitLogTable.LogFile): Boolean =
    f.pendingDelete.isDefined || f.adoptedDv.isDefined

  // ------------------------------------------------------- change data (cdc)

  /** Deterministic `_change_data` directory identity for one mirrored
    * commit — racing/redone catch-ups converge on the first writer's
    * directory, like every other mirror artifact.
    */
  private def cdcUuid(dir: String, version: Long): java.util.UUID =
    java.util.UUID.nameUUIDFromBytes(
      s"graft-cdc:${stableId(dir)}:$version".getBytes(UTF_8))

  private def deleteTree(p: GPath): Unit = GFiles.deleteRecursively(p)

  /** Materialize one mirrored commit's persisted change rows as Delta
    * `_change_data/` parquet and return its `cdc` action lines —
    * emitted only when `delta.enableChangeDataFeed` is set AND the
    * commit carries update/delete images; pure-insert commits let CDF
    * readers derive inserts from the adds, exactly Delta's own writer
    * rule (a cdc action makes readers use cdc files EXCLUSIVELY for
    * that commit, so it must exist precisely when derivation would be
    * wrong). The parquet is the commit's change files minus the
    * engine's `_commit_version` stamp (readers take the version from
    * the action), laid out `partitionBy` the table's physical
    * partition columns — Delta cdc files omit partition columns and
    * readers fill them from `cdc.partitionValues`. Cost is
    * batch-proportional (the change volume Delta's own CDF writer
    * pays), never table-proportional; the copy also decouples external
    * CDF retention from the table's own change-log vacuum. Idempotent:
    * an existing directory is reused byte-for-byte (sizes in the
    * action lines re-read from it), so a crash-redo emits the
    * identical commit.
    */
  private def cdcActions(table: CommitLogTable,
      m: CommitLogTable.Manifest): Seq[String] = {
    if (!cdfEnabled(m)) return Seq.empty
    if (m.changesDir.isEmpty || m.rowsUpdated + m.rowsDeleted == 0L)
      return Seq.empty
    val sub = s"_change_data/${cdcUuid(table.dir, m.version)}"
    val target = GPath(table.dir, sub)
    if (!GFiles.isDirectory(target)) {
      val changeFiles = table.changeFilesAt(m.version)
      if (changeFiles.isEmpty) return Seq.empty
      val tmp = GPath(table.dir, "_change_data",
        s".tmp-${java.util.UUID.randomUUID()}")
      GFiles.createDirectories(tmp.getParent)
      val df = table.spark.read.parquet(changeFiles.map(_._1): _*)
        .drop("_commit_version")
      val pvPhys = m.partitionCols.map(c => m.columnMapping.getOrElse(c, c))
      (if (pvPhys.nonEmpty) df.write.partitionBy(pvPhys: _*) else df.write)
        .parquet(tmp.toString)
      try GFiles.moveNoReplace(tmp, target)
      catch { case e: java.io.IOException =>
        if (GFiles.isDirectory(target))
          deleteTree(tmp) // a racer landed it first — use theirs
        else throw e
      }
    }
    val parts = GFiles.walkFiles(target).filter { p =>
      val n = p.fileName
      n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".")
    }.sortBy(_.toString)
    val root = GPath(table.dir)
    parts.map { p =>
      val node = M.createObjectNode()
      val c = node.putObject("cdc")
      c.put("path", encodePath(root.relativize(p)))
      val pv = c.putObject("partitionValues")
      // Hive `col=value` segments between the cdc root and the part
      // file carry the partition values (unescaped; the default
      // marker is the protocol's JSON null)
      target.relativize(p).split('/').toSeq
        .dropRight(1).foreach { seg =>
          val i = seg.indexOf('=')
          require(i > 0, s"unexpected _change_data layout segment $seg")
          val k = seg.substring(0, i)
          val v = org.apache.spark.sql.catalyst.catalog
            .ExternalCatalogUtils.unescapePathName(seg.substring(i + 1))
          if (v == HiveNull) pv.putNull(k) else pv.put(k, v)
        }
      c.put("size", GFiles.size(p))
      c.put("dataChange", false)
      M.writeValueAsString(node)
    }
  }

  /** The protocol a snapshot NEEDS: (minReader, minWriter,
    * readerFeatures, writerFeatures). Legacy writer levels express the
    * feature ladder Delta itself climbs: CHECK constraints need writer
    * v3; change data feed and generated columns v4; column mapping the
    * (2,5) pair; identity columns v6. Merge-on-read marks / adopted
    * DVs need the deletionVectors reader-writer FEATURE (v3/v7, with
    * the implied legacy writer features listed explicitly, as the
    * table-features spec requires). Plain snapshots stay (1,2).
    */
  private def protocolNeed(m: CommitLogTable.Manifest)
      : (Int, Int, Seq[String], Seq[String]) = {
    val marks = m.files.exists(dvMarked)
    val mapped = m.columnMapping.nonEmpty
    val w = Seq(2,
      if (m.constraints.nonEmpty) 3 else 2,
      if (cdfEnabled(m) ||
          CommitLogTable.generatedExprs(m.properties).nonEmpty) 4 else 2,
      if (mapped) 5 else 2,
      if (CommitLogTable.identitySpecs(m.properties).nonEmpty) 6 else 2).max
    val legacy = (if (mapped) 2 else 1, w,
      Seq.empty[String], Seq.empty[String])
    if (!marks) legacy
    else mergeNeed(legacy, (3, 7, Seq("deletionVectors"),
      Seq("appendOnly", "invariants", "deletionVectors")))
  }

  /** A legacy protocol level expressed as its IMPLIED feature lists —
    * the table-features spec's translation table. Needed whenever a
    * legacy need merges into (or compares against) an explicit-features
    * protocol: upgrading a (2,5) column-mapped table to v3/v7 must list
    * columnMapping explicitly or strict readers reject the table.
    */
  private def featForm(n: (Int, Int, Seq[String], Seq[String]))
      : (Int, Int, Seq[String], Seq[String]) =
    if (n._1 >= 3 || n._2 >= 7) n
    else {
      val rf = if (n._1 >= 2) Seq("columnMapping") else Seq.empty
      val wf = Seq("appendOnly", "invariants") ++
        (if (n._2 >= 3) Seq("checkConstraints") else Seq.empty) ++
        (if (n._2 >= 4) Seq("changeDataFeed", "generatedColumns") else Seq.empty) ++
        (if (n._2 >= 5) Seq("columnMapping") else Seq.empty) ++
        (if (n._2 >= 6) Seq("identityColumns") else Seq.empty)
      (n._1, n._2, rf, wf)
    }

  /** Does `by` already grant everything `need` asks? Feature subsets
    * compare in feature FORM, so a legacy (2,5) need is not "covered"
    * by a (3,7) protocol that never listed columnMapping. The mirror
    * emits a protocol action only on a genuine upgrade — never a
    * downgrade.
    */
  private def needCovered(by: (Int, Int, Seq[String], Seq[String]),
      need: (Int, Int, Seq[String], Seq[String])): Boolean = {
    val (bf, nf) = (featForm(by), featForm(need))
    need._1 <= by._1 && need._2 <= by._2 &&
      nf._3.toSet.subsetOf(bf._3.toSet) &&
      nf._4.toSet.subsetOf(bf._4.toSet)
  }

  /** Componentwise-max merge; stays in the legacy spelling while both
    * sides are legacy, otherwise unions the feature forms.
    */
  private def mergeNeed(a: (Int, Int, Seq[String], Seq[String]),
      b: (Int, Int, Seq[String], Seq[String]))
      : (Int, Int, Seq[String], Seq[String]) = {
    val r = math.max(a._1, b._1)
    val w = math.max(a._2, b._2)
    if (r < 3 && w < 7) (r, w, Seq.empty, Seq.empty)
    else {
      val (af, bf) = (featForm(a), featForm(b))
      (math.max(3, r), math.max(7, w),
        (af._3 ++ bf._3).distinct.sorted, (af._4 ++ bf._4).distinct.sorted)
    }
  }

  private def protocolJson(n: (Int, Int, Seq[String], Seq[String])): String = {
    val p = M.createObjectNode()
    val pn = p.putObject("protocol")
    pn.put("minReaderVersion", n._1)
    pn.put("minWriterVersion", n._2)
    if (n._1 >= 3 || n._3.nonEmpty) {
      val rf = pn.putArray("readerFeatures"); n._3.foreach(rf.add)
    }
    if (n._2 >= 7 || n._4.nonEmpty) {
      val wf = pn.putArray("writerFeatures"); n._4.foreach(wf.add)
    }
    M.writeValueAsString(p)
  }

  /** `_last_checkpoint`'s version, when it parses AND its checkpoint
    * file exists (classic single-part OR a v2 UUID manifest) — the
    * mirror's seed COMMIT POINT: a checkpoint parquet without the hint
    * is an in-flight (or crashed) seed, never a mirrored head.
    */
  private def committedSeedVersion(logDir: GPath): Option[Long] =
    try {
      val p = logDir.resolve("_last_checkpoint")
      if (!GFiles.exists(p)) None
      else {
        val v = M.readTree(new String(GFiles.readAllBytes(p), UTF_8))
          .get("version").asLong
        val Named = (f"$v%020d" + """\.checkpoint(\.[^.]+)?\.parquet""").r
        val hit = GFiles.list(logDir).exists(f =>
          Named.pattern.matcher(f.fileName).matches())
        if (hit) Some(v) else None
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Seed (or re-seed) the mirror: ONE classic checkpoint pinned at
    * `version`, made visible by `_last_checkpoint` — which is written
    * LAST, so a torn seed is invisible rather than a log no reader can
    * open. The seed is arbitrated through the table's commit
    * COORDINATOR (atomic-create locally, the lease on object stores):
    * racing seeders claim per-version markers, and a loser whose winner
    * crashed redoes the same deterministic translation idempotently
    * (REPLACE_EXISTING on identical content). Returns the seeded head.
    */
  private def seed(table: CommitLogTable, logDir: GPath,
      version: Long): Long = {
    GFiles.createDirectories(logDir)
    val won = table.coordinator.tryClaim(logDir,
      f"_graft_seed.$version%020d",
      s"seed claim for graft v$version\n".getBytes(UTF_8))
    if (!won && committedSeedVersion(logDir).exists(_ >= version))
      return version // another seeder already committed this (or newer)
    // winner — or crash-repair of one: the translation is deterministic
    // for a pinned version, so the redo converges
    exportCheckpoint(table, version)
    version
  }

  /** The protocol the mirrored log has DECLARED so far: the newest
    * protocol action in the JSON chain, else the seed checkpoint's —
    * recomputed deterministically from the seed version's manifest
    * (plus the v2Checkpoint feature when the seed wrote the v2 format)
    * instead of a per-commit parquet read.
    */
  private def priorProtocol(table: CommitLogTable, logDir: GPath,
      jsonVs: Seq[Long], seedV: Option[Long])
      : (Int, Int, Seq[String], Seq[String]) = {
    jsonVs.sorted.reverse.foreach { v =>
      val lines = new String(
        GFiles.readAllBytes(logDir.resolve(deltaName(v))), UTF_8)
        .split('\n').filter(_.trim.nonEmpty)
      lines.reverse.foreach { line =>
        if (line.contains("\"protocol\"")) {
          val n = M.readTree(line)
          if (n.has("protocol")) {
            val p = n.get("protocol")
            def arr(k: String): Seq[String] =
              if (p.hasNonNull(k))
                p.get(k).elements().asScala.map(_.asText).toSeq
              else Seq.empty
            return (p.get("minReaderVersion").asInt,
              p.get("minWriterVersion").asInt,
              arr("readerFeatures"), arr("writerFeatures"))
          }
        }
      }
    }
    seedV match {
      case Some(v) =>
        val base = protocolNeed(table.resolvedManifest(Some(v)))
        // the checkpoint PARQUET stores the merged declared protocol
        // (exportCheckpoint) — read it when present: once log retention
        // drops the jsons that declared a feature, the manifest-derived
        // recomputation alone would forget it (a protocol downgrade)
        val stored: Option[(Int, Int, Seq[String], Seq[String])] = {
          val classic = logDir.resolve(f"$v%020d.checkpoint.parquet")
          val v2m = logDir.resolve(v2ManifestName(table.dir, v))
          val target = if (GFiles.exists(classic)) Some(classic)
            else if (GFiles.exists(v2m)) Some(v2m) else None
          target.flatMap { p =>
            try {
              val r = table.spark.read.parquet(p.toString)
              if (!r.columns.contains("protocol")) None
              else r.selectExpr(
                  "protocol.minReaderVersion", "protocol.minWriterVersion",
                  "protocol.readerFeatures", "protocol.writerFeatures")
                .where("protocol IS NOT NULL").collect().headOption.map { row =>
                  def arr(i: Int): Seq[String] =
                    if (row.isNullAt(i)) Seq.empty
                    else row.getSeq[String](i)
                  (row.getInt(0), row.getInt(1), arr(2), arr(3))
                }
            } catch { case scala.util.control.NonFatal(_) => None }
          }
        }
        val withV2 =
          if (GFiles.exists(logDir.resolve(v2ManifestName(table.dir, v))))
            mergeNeed(base, V2CheckpointNeed)
          else base
        stored.map(mergeNeed(_, withV2)).getOrElse(withV2)
      case None => (1, 2, Seq.empty, Seq.empty)
    }
  }

  /** Bring the mirror up to the table's latest version. Returns the
    * mirrored head, or -1 if the mirror is (or just became) broken.
    * Best-effort by contract: a crash mid-catch-up just re-runs on the
    * next commit (translation is deterministic, claims are atomic).
    *
    * A BROKEN mirror self-cures: when the marker is present but the
    * current snapshot is expressible again (an OPTIMIZE materialized
    * the lazy deletes, a compactRewrite shed the column mapping), the
    * next catch-up re-seeds a fresh checkpoint at the current head —
    * `_last_checkpoint` jumps external readers over the stale chain,
    * old JSON below it is dead weight, and the marker comes off.
    */
  def mirrorCatchUp(table: CommitLogTable): Long = {
    val logDir = GPath(table.dir, "_delta_log")
    val head = table.latestVersion

    def break(reason: String): Long = {
      GFiles.createDirectories(logDir)
      GFiles.write(logDir.resolve(BrokenMarker),
        s"mirror stopped at graft version $head: $reason\n".getBytes(UTF_8))
      -1L
    }

    val jsonVs: Seq[Long] =
      if (!GFiles.isDirectory(logDir)) Seq.empty
      else GFiles.list(logDir).map(_.fileName)
        .filter(n => n.length == 25 && n.endsWith(".json") &&
          n.dropRight(5).forall(_.isDigit))
        .map(_.dropRight(5).toLong).sorted

    if (GFiles.exists(logDir.resolve(BrokenMarker))) {
      // auto-reseed at the current head: every snapshot is expressible
      // now that marks write as deletion vectors — only a mid-chain
      // in-place mutation (detected per-commit below) breaks, and a
      // fresh checkpoint expresses the RESULTING state regardless.
      // EXCEPT when the log carries commits ABOVE the graft head (a
      // foreign log this table does not version-align with): a seed
      // checkpoint at head would have those stale jsons replay on top
      // of it — stay broken rather than cure into corruption.
      if (jsonVs.exists(_ > head)) return -1L
      seed(table, logDir, head)
      GFiles.deleteIfExists(logDir.resolve(BrokenMarker))
      return head
    }

    val seedV = committedSeedVersion(logDir)
    val mirrored: Long = (jsonVs ++ seedV).foldLeft(-1L)(math.max)
    if (mirrored < 0) return seed(table, logDir, head)
    // a log AHEAD of the table is not this table's 1:1 mirror — e.g. a
    // convertFromDelta pinned BELOW the Delta head, or a foreign log.
    // Appending would interleave graft translations with stale foreign
    // commits; break loudly (and the reseed path above refuses too)
    if (mirrored > head)
      return break(s"the _delta_log is at version $mirrored, ahead of " +
        s"graft version $head — not this table's 1:1 mirror (adopt at " +
        "the latest Delta version, or remove the stale log)")
    // appending requires PROVEN alignment: either this mirror seeded
    // the log (a `_graft_seed.*` claim exists), or convertFromDelta
    // adopted the log's HEAD and stamped `_graft_aligned` — graft
    // versions then continue the original log 1:1. Anything else (a
    // version-pinned adoption whose stale tail versions happen to not
    // exceed head yet, a foreign log) must not be appended to; break,
    // and let the reseed cure take over once head passes every stale
    // json (a fresh checkpoint at head expresses the true state, and
    // jsons BELOW a checkpoint never replay on top of it).
    val selfMarked = GFiles.list(logDir).map(_.fileName).exists(n =>
      n.startsWith("_graft_seed.") || n == AlignedMarker)
    if (!selfMarked)
      return break("the _delta_log was written by neither this mirror " +
        "nor a head-version adoption — refusing to append to a log " +
        "whose history this table cannot vouch for")
    // contiguity from the committed seed (or 0) to the mirrored head:
    // appending past a gap would hand external readers a log that skips
    // commits — break instead, and let the reseed path cure it
    val base = seedV.getOrElse(0L)
    val gap = ((base + 1) to mirrored).filterNot(jsonVs.contains)
    if (gap.nonEmpty)
      return break(s"mirror log gap at Delta version(s) " +
        s"${gap.min}..${gap.max} — refusing to append past it")

    // field-id carry across this catch-up's metaData emissions: seeded
    // from the log's own declarations, so a crash-redo racer converges
    // LAZY like declared0: priorFieldIds parses the whole json chain
    // and Spark-reads the newest checkpoint — the steady-state append
    // emits no metaData, so the common catch-up must not pay it
    var idCarryCache: Option[(Map[String, Long], Long)] = None
    def idCarry: (Map[String, Long], Long) = idCarryCache.getOrElse {
      val c = priorFieldIds(table.spark, logDir); idCarryCache = Some(c); c
    }
    // DECLARED-protocol carry for upgrade emission: seeded lazily from
    // the log (plain (1,2) tables never pay the walk), merged upward
    // only — the log must never downgrade below a feature still gating
    // an earlier artifact (a v2 seed checkpoint, a past DV commit)
    lazy val declared0 = priorProtocol(table, logDir, jsonVs, seedV)
    var declaredCur: Option[(Int, Int, Seq[String], Seq[String])] = None
    val LegacyBase = (1, 2, Seq.empty[String], Seq.empty[String])
    ((mirrored + 1) to head).foreach { v => try {
      val (action, added, removed) = table.versionFileDiff(v)
      val m = table.resolvedManifest(Some(v))
      val prevM = table.resolvedManifest(Some(v - 1))
      val prevByPath = prevM.files.map(f => f.path -> f).toMap
      // a same-path remove+add pair is expressible exactly when the ONLY
      // entry change is the lazy-delete mark (Delta's DV swap: remove the
      // old (path, uniqueId) state, re-add with the new DV); any other
      // in-place mutation still breaks
      val badInPlace = added.filter(f => removed.contains(f.path) &&
        prevByPath.get(f.path).forall(p =>
          p.copy(pendingDelete = None) != f.copy(pendingDelete = None)))
      if (badInPlace.nonEmpty)
        return break(s"v$v changed file entr${
          if (badInPlace.size == 1) "y" else "ies"} in place beyond the " +
          s"lazy-delete mark (first: ${badInPlace.head.path})")
      val sb = new StringBuilder
      // a rename/drop upgrades the log to reader-v2 name mode; a
      // lazy-delete mark upgrades it to v3/v7 table features with
      // deletionVectors — each IN the commit that first needs it,
      // exactly how Delta itself enables features. Never a downgrade:
      // the emission merges into what the log already DECLARED.
      val need = protocolNeed(m)
      if (need != LegacyBase) {
        val d = declaredCur.getOrElse(declared0)
        if (!needCovered(d, need)) {
          val up = mergeNeed(d, need)
          sb.append(protocolJson(up)).append('\n')
          declaredCur = Some(up)
        } else declaredCur = Some(d)
      }
      // metaData re-emits whenever anything it CARRIES moved: the
      // schema (incl. generated/identity field metadata — an identity
      // high-water advance re-emits, exactly Delta's own behavior),
      // partitioning, mapping, or the translated configuration
      // (constraints, TBLPROPERTIES)
      if (deltaSchema(m) != deltaSchema(prevM) ||
          m.partitionCols != prevM.partitionCols ||
          m.columnMapping != prevM.columnMapping ||
          deltaConfiguration(m) != deltaConfiguration(prevM)) {
        val (line, carry2) = metaDataJson(table.dir, deltaSchema(m),
          m.partitionCols, m.tsMillis, m.columnMapping,
          deltaConfiguration(m), idCarry)
        idCarryCache = Some(carry2)
        sb.append(line).append('\n')
      }
      val dataChange = action != "compact"
      removed.toSeq.sorted.foreach { p =>
        val rm = M.createObjectNode()
        val r = rm.putObject("remove")
        r.put("path", encodePath(p))
        r.put("deletionTimestamp", m.tsMillis)
        r.put("dataChange", dataChange)
        // the remove must name the DV state it retires — (path, uniqueId)
        // is the action key; descriptors re-derive deterministically
        prevByPath.get(p).filter(dvMarked)
          .foreach(pf => putDv(r, dvDescriptorFor(table, prevM, pf)))
        sb.append(M.writeValueAsString(rm)).append('\n')
      }
      added.foreach(f =>
        sb.append(addJson(
          m.partitionCols.map(c => m.columnMapping.getOrElse(c, c)),
          f, m.tsMillis, dataChange,
          dv = if (dvMarked(f)) Some(dvDescriptorFor(table, m, f))
            else None))
          .append('\n'))
      // CDF: a change-bearing commit ships its update/delete images as
      // `_change_data` parquet + cdc actions (cdfEnabled-gated) — the
      // reference's CDF-driven Silver MERGE pattern for external
      // Delta consumers of this table
      cdcActions(table, m).foreach(l => sb.append(l).append('\n'))
      // a no-op translation (e.g. a properties commit) still writes the
      // empty commit — Delta versions must stay contiguous with graft's.
      // Claims route through the table's SESSION-SELECTED coordinator,
      // so a lease-configured (object-store) table mirrors safely too.
      val payload = sb.toString.getBytes(UTF_8)
      if (!table.coordinator.tryClaim(logDir, deltaName(v), payload)) {
        // a lost claim is routine for a crash-redo racer — the emission
        // is deterministic, so a fellow mirror wrote these exact bytes.
        // DIFFERENT bytes mean a foreign Delta writer committed this
        // version number while graft committed it too: the histories
        // forked, and appending past the fork would corrupt both —
        // break loudly (reconcile pulls foreign commits BEFORE a graft
        // commit precisely so this cannot happen in the pull-sync flow)
        val existing = GFiles.readAllBytes(logDir.resolve(deltaName(v)))
        if (!java.util.Arrays.equals(existing, payload))
          return break(s"Delta version $v was also committed by a " +
            "foreign writer with different content — the graft log and " +
            "the _delta_log forked at this version; restore one side")
      }
      // periodic CHECKPOINT cadence, Delta's delta.checkpointInterval
      // (default 10): without it an external reader replays every json
      // since the last seed — at 100 TB commit rates that chain is the
      // read bottleneck Delta bounds the same way. Same deterministic
      // seed path (claim-arbitrated, _last_checkpoint written last), so
      // racing catch-up writers converge; a failure is non-fatal (the
      // json chain still serves readers, the next multiple retries).
      if (v % checkpointInterval(m) == 0)
        try { seed(table, logDir, v); vacuumMirrorLog(m, logDir); () }
        catch { case scala.util.control.NonFatal(_) => () }
    } catch {
      // a translation failure (e.g. a DV recompute whose source file was
      // since vacuumed) must BREAK visibly — the post-commit hook
      // swallows exceptions, and a silent stall would pin external
      // readers to a stale snapshot with no marker and no self-cure
      case scala.util.control.NonFatal(e) =>
        return break(s"translating v$v failed: ${e.getMessage}")
    }}
    head
  }

  /** Checkpointed STREAMING read of a foreign Delta table's change
    * feed — [[readChanges]] as a micro-batch source with Delta commit
    * versions for offsets, no adoption required (the reference's
    * CDF-driven Silver consumes exactly this way,
    * `docs/databricks_setup.md:170-198`). Sugar over
    * `spark.readStream.format("delta-cdf")`
    * ([[graft.sources.DeltaCdfDataSource]]).
    */
  def readChangesStream(spark: SparkSession, dir: String,
      startingVersion: Option[Long] = None,
      maxVersionsPerTrigger: Option[Long] = None): DataFrame = {
    var r = spark.readStream.format("delta-cdf").option("path", dir)
    startingVersion.foreach(v => r = r.option("startingVersion", v))
    maxVersionsPerTrigger.foreach(n =>
      r = r.option("maxVersionsPerTrigger", n))
    r.load()
  }

  // --------------------------------------------- foreign-commit pull-sync

  /** Two-engine coexistence on one `_delta_log`: replay FOREIGN Delta
    * commits (an external writer — the reference's still-running
    * Databricks Silver MERGE job, `docs/databricks_setup.md:352-373` —
    * committing mid-cutover) into this table's commit log, one graft
    * manifest per Delta version, then let the mirror continue 1:1 at
    * the new head. Invoked automatically before every graft commit on
    * mirror-enabled tables (one O(1) existence probe on the quiet
    * path), and callable directly.
    *
    * Per foreign version v (graft head + 1 … Delta head):
    *   - the file DIFF comes from the Delta snapshot at v vs the graft
    *     manifest at v-1 (aligned by induction): added files footer-
    *     probe into manifest entries (O(diff) — ONE distributed job per
    *     version over just its adds), removed paths drop, files whose
    *     deletion-vector state moved re-enter as adopted merge-on-read
    *     state ([[CommitLogTable.LogFile.adoptedDv]]);
    *   - CHANGE IMAGES come from [[readChanges]] over exactly v — cdc
    *     parquet when the foreign writer emitted it, derived insert /
    *     whole-file-delete images otherwise, and the underivable cases
    *     (an image-less COW rewrite, a DV swap without cdc) REFUSE BY
    *     NAME rather than silently serving an empty feed;
    *   - metadata (schema evolution, constraints, TBLPROPERTIES,
    *     generated/identity specs) imports through the same
    *     [[adoptionSchema]]/[[adoptionMetadata]] path adoption uses,
    *     with graft-internal properties carried forward when the
    *     foreign configuration still holds them.
    *
    * Refusals are loud and name the untranslatable action; nothing is
    * applied for the refused version (the graft log stops at v-1 and
    * the mirror keeps refusing to fork). Racing reconcilers converge:
    * the translation is deterministic and version-claimed, so a lost
    * publish race verifies the winner reconciled the same version.
    * Returns the graft head after the pull.
    */
  def reconcile(table: CommitLogTable): Long = {
    val spark = table.spark
    val dir = table.dir
    val logDir = GPath(dir, "_delta_log")
    var head = table.latestVersion
    if (!GFiles.isDirectory(logDir)) return head
    val names = GFiles.list(logDir).map(_.fileName)
    val jsonVs = names
      .filter(n => n.length == 25 && n.endsWith(".json") &&
        n.dropRight(5).forall(_.isDigit))
      .map(_.dropRight(5).toLong).sorted
    if (jsonVs.isEmpty || jsonVs.max <= head) return head
    // only a log this table provably shares history with may pull:
    // the mirror seeded it, or a head-version adoption aligned it
    require(names.exists(n =>
        n.startsWith("_graft_seed.") || n == AlignedMarker),
      s"reconcile: the _delta_log at $dir was written by neither this " +
        "table's mirror nor a head-version adoption — refusing to pull " +
        "commits from a log whose history this table cannot vouch for")
    val deltaHead = jsonVs.max
    val gap = ((head + 1) to deltaHead).filterNot(jsonVs.toSet)
    require(gap.isEmpty,
      s"reconcile: the _delta_log at $dir is missing version(s) " +
        s"${gap.min}..${gap.max} between the graft head and its own — " +
        "cannot replay across the hole")
    ((head + 1) to deltaHead).foreach { v =>
      reconcileOne(table, logDir, v)
      head = v
    }
    head
  }

  private def reconcileOne(table: CommitLogTable, logDir: GPath,
      v: Long): Unit = {
    val spark = table.spark
    val dir = table.dir
    val prevM = table.resolvedManifest(Some(v - 1))
    val dsnap = snapshot(spark, dir, Some(v))
    val (schema, mapping) = adoptionSchema(dsnap)
    require(dsnap.partitionCols == prevM.partitionCols,
      s"reconcile: foreign commit $v repartitioned the table " +
        s"(${prevM.partitionCols.mkString(",")} -> " +
        s"${dsnap.partitionCols.mkString(",")}) — untranslatable")
    // physical identities are immutable on both planes: a surviving
    // logical column must keep its physical name across the pull
    prevM.columnMapping.foreach { case (lc, pc) =>
      if (schema.fieldNames.contains(lc))
        require(mapping.get(lc).contains(pc),
          s"reconcile: foreign commit $v moved column '$lc' to physical " +
            s"'${mapping.getOrElse(lc, lc)}' (was '$pc') — physical " +
            "names are immutable; untranslatable")
    }
    CommitLogTable.requireFieldIdAlignment(spark, dir, dsnap, "reconcile")
    val liveByPath = dsnap.live.map(f => f._1 -> f).toMap
    require(liveByPath.size == dsnap.live.size,
      s"reconcile: Delta version $v holds multiple live DV states for " +
        "one path — untranslatable")
    val prevByPath = prevM.files.map(f => f.path -> f).toMap
    val addedPaths = liveByPath.keySet -- prevByPath.keySet
    // CHANGE IMAGES first: the underivable cases must refuse BEFORE any
    // state is built (readChanges is the shared judge of derivability).
    // Cached across the two consumers (counters + change-file write) so
    // the foreign commit's data is read once, not twice
    val images = readChanges(spark, dir, v, v)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = images.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val hasImages = counts.values.sum > 0
    // continuing files: keep the graft entry VERBATIM (stats, blooms,
    // marks) unless the foreign commit moved its DV state
    val kept = prevM.files.flatMap { f =>
      liveByPath.get(f.path).map { case (_, _, liveDv) =>
        val prevEmitted: Option[String] =
          if (f.adoptedDv.isDefined && f.pendingDelete.isEmpty)
            Some(DeletionVectors.decodeDescriptor(f.adoptedDv.get).uniqueId)
          else if (dvMarked(f))
            Some(dvDescriptorFor(table, prevM, f).uniqueId)
          else None
        (liveDv.map(_.uniqueId), prevEmitted) match {
          case (l, p) if l == p => f
          case (Some(_), _) =>
            // the foreign writer swapped/added this file's DV (a Delta
            // merge-on-read delete on top of our emitted state): the new
            // descriptor is the FULL deleted set — adopt it, superseding
            // any graft-local mark it already covers
            val d = liveDv.get
            try { DeletionVectors.resolveData(dir, d); () }
            catch { case e: Exception => throw new IllegalArgumentException(
              s"reconcile: foreign commit $v put an unresolvable " +
                s"deletion vector on '${f.path}': ${e.getMessage}", e) }
            f.copy(adoptedDv = Some(DeletionVectors.encodeDescriptor(d)),
              pendingDelete = None)
          case (None, Some(_)) => throw new IllegalArgumentException(
            s"reconcile: foreign commit $v dropped the deletion-vector " +
              s"state of '${f.path}' without rewriting the file — " +
              "untranslatable (a Delta writer never un-deletes in place)")
        }
      }
    }
    val added = CommitLogTable.deltaLogFiles(spark, dir, dsnap, schema,
      mapping, onlyPaths = Some(addedPaths), what = "reconcile")
    // metadata travels like adoption; graft-internal properties the
    // foreign configuration dropped (it shouldn't — writers preserve
    // configuration) carry forward so the mirror stays enabled
    val (constraints, adoptedProps) = adoptionMetadata(dsnap)
    val props = prevM.properties.filter(_._1.startsWith("graft."))
      .filterNot { case (k, _) => adoptedProps.contains(k) } ++ adoptedProps
    try table.reconcilePublish(v, kept ++ added, schema, mapping,
      dsnap.partitionCols, constraints, props,
      changes = if (hasImages) Some(images.drop("_commit_version")) else None,
      counters = (counts.getOrElse("insert", 0L),
        counts.getOrElse("update_postimage", 0L),
        counts.getOrElse("delete", 0L)))
    finally images.unpersist()
  }

  /** Write ONE classic checkpoint PINNED at `version` (that version's
    * protocol/metaData/adds as parquet action rows) plus
    * `_last_checkpoint` — written LAST: it is the seed's commit point
    * ([[committedSeedVersion]]), so a crash before it leaves an
    * invisible orphan parquet, never a half-seeded log. A legal log
    * start with no version 0 — a mirror enabled late (or after history
    * vacuum) begins exactly where the table is.
    */
  def exportCheckpoint(table: CommitLogTable, version: Long): Unit = {
    val spark = table.spark
    val snap = table.resolvedManifest(Some(version))
    val logDir = GPath(table.dir, "_delta_log")
    GFiles.createDirectories(logDir)
    import spark.implicits._
    // a column-mapped snapshot seeds a reader-v2 NAME-mode checkpoint:
    // mapped schemaString, mode configuration, physical pv keys
    val mapped = snap.columnMapping.nonEmpty
    val ckSchema = deltaSchema(snap)
    val (schemaJson, conf) =
      if (!mapped) (ckSchema.json, deltaConfiguration(snap))
      else {
        // a RESEED carries the old log's ids forward before overwriting
        val (json, maxId) = mappedSchemaJson(ckSchema,
          snap.columnMapping, priorFieldIds(spark, logDir))
        (json, deltaConfiguration(snap) ++
          Map("delta.columnMapping.mode" -> "name",
            MaxIdKey -> maxId.toString))
      }
    val pvCols = snap.partitionCols
      .map(c => snap.columnMapping.getOrElse(c, c))
    // past the file-count threshold the seed writes the V2 format:
    // one small UUID manifest + the adds in a `_sidecars/` parquet —
    // the split Delta itself uses so a 100 TB table's checkpoint is not
    // one monolithic file every reader must fully parse. V2 checkpoints
    // are gated by the v2Checkpoint table feature (reader v3).
    val v2 = snap.files.size >= v2CheckpointMinFiles(snap)
    // the checkpoint's protocol merges the log's DECLARED protocol, not
    // just this snapshot's need: a cadence checkpoint of a momentarily
    // clean snapshot (the marks were cleared two commits ago) must not
    // DOWNGRADE a (3,7 deletionVectors) log to (1,2) — the protocol has
    // no downgrade action, and a reader seeding from the checkpoint
    // would replay a later DV commit with no upgrade in sight
    val declared = {
      val jsonVs = {
        if (!GFiles.isDirectory(logDir)) Seq.empty[Long]
        else {
          GFiles.list(logDir).map(_.fileName)
            .filter(n => n.length == 25 && n.endsWith(".json") &&
              n.dropRight(5).forall(_.isDigit))
            .map(_.dropRight(5).toLong).sorted
        }
      }
      if (jsonVs.isEmpty) None
      else Some(priorProtocol(table, logDir, jsonVs,
        committedSeedVersion(logDir)))
    }
    val need0 = declared.map(mergeNeed(_, protocolNeed(snap)))
      .getOrElse(protocolNeed(snap))
    val need = if (v2) mergeNeed(need0, V2CheckpointNeed) else need0
    val rows: Seq[(Option[(Int, Int, Seq[String], Seq[String])],
        Option[(String, String, String, Seq[String], Map[String, String])],
        Option[(String, Map[String, String], Long, Long, Boolean,
          Option[(String, String, Int, Int, Long)])])] =
      (Some(need), None, None) +:
      (None, Some((stableId(table.dir), "parquet", schemaJson,
        snap.partitionCols, conf)), None) +:
      snap.files.map { f =>
        val pv: Map[String, String] =
          partitionValuesOf(pvCols, f)
            .map { case (c, v) => c -> v.orNull }.toMap
        // marked files checkpoint WITH their deletion vector — a seed at
        // a marks-bearing head is a complete, readable log start
        val dv = if (!dvMarked(f)) None else Some {
          val d = dvDescriptorFor(table, snap, f)
          (d.storageType, d.pathOrInlineDv, d.offset.getOrElse(1),
            d.sizeInBytes, d.cardinality)
        }
        (None, None,
          Some((encodePath(f.path), pv, f.bytes, snap.tsMillis, false, dv)))
      }
    val protocolExpr =
      "named_struct('minReaderVersion', p._1, 'minWriterVersion', p._2, " +
        "'readerFeatures', IF(p._1 >= 3, p._3, CAST(NULL AS ARRAY<STRING>)), " +
        "'writerFeatures', IF(p._2 >= 7, p._4, CAST(NULL AS ARRAY<STRING>))" +
        ") AS protocol"
    val metaExpr =
      "named_struct('id', m._1, 'format', named_struct('provider', m._2, " +
        "'options', map()), 'schemaString', m._3, 'partitionColumns', m._4, " +
        "'configuration', m._5, 'createdTime', 0L) AS metaData"
    val df = rows.toDF("p", "m", "a").selectExpr(
      protocolExpr,
      metaExpr,
      "named_struct('path', a._1, 'partitionValues', a._2, 'size', a._3, " +
        "'modificationTime', a._4, 'dataChange', a._5, " +
        "'deletionVector', IF(a._6 IS NULL, NULL, named_struct(" +
        "'storageType', a._6._1, 'pathOrInlineDv', a._6._2, " +
        "'offset', a._6._3, 'sizeInBytes', a._6._4, " +
        "'cardinality', a._6._5))) AS add")
      .selectExpr(
        "IF(protocol.minReaderVersion IS NULL, NULL, protocol) AS protocol",
        "IF(metaData.id IS NULL, NULL, metaData) AS metaData",
        "IF(add.path IS NULL, NULL, add) AS add")
    def writeOne(frame: DataFrame, sub: String): GPath = {
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-delta-ckpt").toString
      frame.coalesce(1).write.parquet(s"$tmp/$sub")
      GFiles.list(GPath(tmp, sub))
        .find(_.fileName.endsWith(".parquet")).get
    }
    // atomic moves: a racing seed redo must never expose a half-copied
    // checkpoint to a reader that already followed _last_checkpoint
    def atomically(target: GPath, write: GPath => Unit): Unit = {
      val t = target.getParent.resolve(
        s".tmp-${java.util.UUID.randomUUID()}")
      write(t)
      try GFiles.moveReplaceIdempotent(t, target)
      finally GFiles.deleteIfExists(t)
    }
    def copyTo(target: GPath, part: GPath): Unit =
      atomically(target, t => GFiles.copyReplace(part, t))
    if (!v2) {
      copyTo(logDir.resolve(f"$version%020d.checkpoint.parquet"),
        writeOne(df, "ck"))
    } else {
      // sidecar first (the adds), manifest second, hint LAST — each
      // earlier artifact is invisible until the later ones land
      val uuid = v2CheckpointUuid(table.dir, version)
      GFiles.createDirectories(logDir.resolve("_sidecars"))
      val sidecarTarget = logDir.resolve(s"_sidecars/$uuid.parquet")
      copyTo(sidecarTarget, writeOne(df.where("add IS NOT NULL")
        .select("add"), "sc"))
      val scSize = GFiles.size(sidecarTarget)
      // the spec requires EXACTLY ONE checkpointMetadata action in a V2
      // checkpoint (carrying its version) — delta-spark's checkpoint
      // provider keys on it to recognize and validate the format
      val mrows: Seq[(Option[(Int, Int, Seq[String], Seq[String])],
          Option[(String, String, String, Seq[String], Map[String, String])],
          Option[(String, Long)],
          Option[Long])] = Seq(
        (None, None, None, Some(version)),
        (rows.head._1, None, None, None),
        (None, rows(1)._2, None, None),
        (None, None, Some((s"$uuid.parquet", scSize)), None))
      val mdf = mrows.toDF("p", "m", "sc", "ck").selectExpr(
        protocolExpr, metaExpr,
        "named_struct('path', sc._1, 'sizeInBytes', sc._2) AS sidecar",
        "named_struct('version', ck) AS checkpointMetadata")
        .selectExpr(
          "IF(protocol.minReaderVersion IS NULL, NULL, protocol) AS protocol",
          "IF(metaData.id IS NULL, NULL, metaData) AS metaData",
          "IF(sidecar.path IS NULL, NULL, sidecar) AS sidecar",
          "IF(checkpointMetadata.version IS NULL, NULL, " +
            "checkpointMetadata) AS checkpointMetadata")
      copyTo(logDir.resolve(v2ManifestName(table.dir, version)),
        writeOne(mdf, "mf"))
    }
    atomically(logDir.resolve("_last_checkpoint"),
      t => { GFiles.write(t,
        s"""{"version":$version,"size":${rows.size}}""".getBytes(UTF_8)); () })
  }
}
