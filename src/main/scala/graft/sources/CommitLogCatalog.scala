package graft.sources

import graft.tables.{GFiles, GPath}
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, ProcedureCatalog, SupportsDelete, SupportsWrite, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{Filter, InsertableRelation}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.tables.CommitLogTable

/** SQL catalog over commit-log tables — the `CREATE TABLE … USING DELTA`
  * / `ALTER TABLE` / `INSERT INTO` surface the reference drives through
  * Databricks DDL (`docs/databricks_setup.md:75-100,145-165`), on the
  * standalone table format:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft", classOf[CommitLogCatalog].getName)
  *   spark.conf.set("spark.sql.catalog.graft.warehouse", "/data/warehouse")
  *   spark.sql("CREATE TABLE graft.bronze.prices (sym STRING, d DATE, px DOUBLE) PARTITIONED BY (d)")
  *   spark.sql("INSERT INTO graft.bronze.prices VALUES (...)")
  *   spark.sql("SELECT * FROM graft.bronze.prices VERSION AS OF 3")
  *   spark.sql("ALTER TABLE graft.bronze.prices SET TBLPROPERTIES ('pipeline'='fmp')")
  *   spark.sql("ALTER TABLE graft.bronze.prices RENAME COLUMN px TO close")
  * }}}
  *
  * Tables live at `warehouse/<namespace…>/<name>`; the namespace is the
  * directory tree (no separate metastore — the table format's own log IS
  * the metadata, so the catalog is stateless and any number of sessions
  * or JVMs share it through the filesystem). Writes ride the V1Write
  * bridge onto the table's transactional append/overwrite, so INSERT
  * INTO is one atomic commit with CDF and stats like every other write.
  * ALTER TABLE maps onto the table format's metadata-only commits:
  * SET/UNSET TBLPROPERTIES, RENAME/DROP/ADD COLUMN — each one manifest
  * write, never a data rewrite.
  */
final class CommitLogCatalog extends TableCatalog with ProcedureCatalog
    with org.apache.spark.sql.connector.catalog.ViewCatalog {
  private var catalogName: String = _
  private var warehouse: String = _

  /** ANSI constraint DDL (`ALTER TABLE … ADD CONSTRAINT … CHECK`) and
    * `GENERATED ALWAYS AS (expr)` columns route through this catalog
    * only when it declares the capability; Spark validates generation
    * expressions (deterministic, no subqueries, no references to other
    * generated columns) before [[createTable]] ever sees them.
    */
  override def capabilities(): java.util.Set[
      org.apache.spark.sql.connector.catalog.TableCatalogCapability] =
    java.util.EnumSet.of(
      org.apache.spark.sql.connector.catalog
        .TableCatalogCapability.SUPPORT_TABLE_CONSTRAINT,
      org.apache.spark.sql.connector.catalog.TableCatalogCapability
        .SUPPORTS_CREATE_TABLE_WITH_GENERATED_COLUMNS,
      org.apache.spark.sql.connector.catalog.TableCatalogCapability
        .SUPPORTS_CREATE_TABLE_WITH_IDENTITY_COLUMNS)

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"commitlog catalog '$name': set spark.sql.catalog.$name.warehouse"))
    // MERGE INTO needs a planner strategy (Spark only plans MergeIntoTable
    // for row-level-operation connectors); install it with the catalog so
    // `MERGE INTO <cat>.ns.t` works without spark.sql.extensions. The
    // experimental-methods list is the supported runtime injection point;
    // idempotent by identity (the strategy is a singleton object).
    val exp = SparkSession.active.experimental
    Seq(graft.plans.MergeIntoCommitLogStrategy,
        graft.plans.UpdateCommitLogStrategy,
        graft.plans.DeleteFromCommitLogStrategy).foreach { st =>
      if (!exp.extraStrategies.contains(st))
        exp.extraStrategies = exp.extraStrategies :+ st
    }
  }
  override def name(): String = catalogName

  private def spark: SparkSession = SparkSession.active
  private def dirOf(ident: Identifier): String =
    (Seq(warehouse) ++ ident.namespace().toSeq :+ ident.name()).mkString("/")

  /** Table directory resolution for package-internal callers (the
    * `commitlog_table_changes` TVF resolves `cat.ns.t` names).
    */
  private[graft] def tableDir(ident: Identifier): String = dirOf(ident)

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val nsDir = GPath((Seq(warehouse) ++ namespace.toSeq).mkString("/"))
    if (!GFiles.isDirectory(nsDir)) throw new NoSuchNamespaceException(namespace)
    GFiles.list(nsDir)
      .filter(p => CommitLogTable.exists(p.toString))
      .map(p => Identifier.of(namespace, p.fileName))
      .toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    CommitLogTable.exists(dirOf(ident))

  override def loadTable(ident: Identifier): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    new CommitLogCatalogTable(spark, dirOf(ident), None)
  }

  /** SQL time travel: `SELECT … FROM graft.ns.t VERSION AS OF 3`. */
  override def loadTable(ident: Identifier, version: String): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    new CommitLogCatalogTable(spark, dirOf(ident), Some(version.toLong))
  }

  /** SQL time travel by instant: `… FOR TIMESTAMP AS OF '2026-08-14
    * 12:00:00'` — Spark hands epoch MICROseconds; resolves to the
    * latest commit at-or-before it (Delta's timestampAsOf rule).
    */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val dir = dirOf(ident)
    val v = graft.tables.CommitLogTable.open(spark, dir)
      .versionAt(Math.floorDiv(timestampMicros, 1000L))
    new CommitLogCatalogTable(spark, dir, Some(v))
  }

  /** GENERATED ALWAYS AS columns travel on the V2 [[Column]] objects
    * (the schema-based conversion drops `generationExpression`), so the
    * Column[] variant — the one Spark's CREATE TABLE actually calls —
    * extracts them here. Spark already validated the expressions
    * (deterministic, no subqueries, no generated-on-generated) under
    * the declared capability; they persist as `graft.generated.<col>`
    * properties because the manifest schema round-trips through DDL,
    * which drops metadata.
    */
  override def createTable(ident: Identifier,
      columns: Array[org.apache.spark.sql.connector.catalog.Column],
      partitions: Array[Transform], properties: JMap[String, String]): Table = {
    val gencols = columns.flatMap(c =>
      Option(c.generationExpression()).map(c.name -> _)).toMap
    // IDENTITY columns persist as graft.identity.<col> specs; the
    // table's write planes own assignment and high-water sync
    val idProps = columns.flatMap(c =>
      Option(c.identityColumnSpec()).map { s =>
        // BIGINT only (Delta's rule): assignment is base + step *
        // monotonically_increasing_id(), where partition p contributes
        // p * 2^33 — out of INT range for any multi-partition batch, so
        // an INT identity would overflow under ANSI or silently collide
        // across partitions with ANSI off
        require(c.dataType == org.apache.spark.sql.types.LongType,
          s"identity column '${c.name}' must be BIGINT")
        (CommitLogTable.IdentityPropPrefix + c.name) ->
          s"${s.getStart},${s.getStep},${s.isAllowExplicitInsert}"
      }).toMap
    val schema = StructType(columns.map { c =>
      require(c.defaultValue() == null,
        s"commitlog: column DEFAULT values are not supported ('${c.name}')")
      val base = org.apache.spark.sql.types.StructField(
        c.name, c.dataType, c.nullable,
        Option(c.metadataInJSON())
          .map(org.apache.spark.sql.types.Metadata.fromJson)
          .getOrElse(org.apache.spark.sql.types.Metadata.empty))
      Option(c.comment()).map(base.withComment).getOrElse(base)
    })
    createTableImpl(ident, schema, partitions, properties, gencols, idProps)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String]): Table = {
    // legacy schema-based entry: generation expressions ride field
    // metadata when present (programmatic callers)
    val gencols = schema.fields.flatMap(f =>
      org.apache.spark.sql.catalyst.util.GeneratedColumn
        .getGenerationExpression(f).map(e => f.name -> e)).toMap
    createTableImpl(ident, schema, partitions, properties, gencols, Map.empty)
  }

  private def createTableImpl(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String],
      gencols: Map[String, String],
      idProps: Map[String, String]): Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    val partitionCols = partitions.toSeq.map {
      case t if t.name == "identity" && t.references.length == 1 =>
        t.references.head.fieldNames.mkString(".")
      case other => throw new IllegalArgumentException(
        s"commitlog tables support identity partition columns only, got " +
          other.toString)
    }
    GFiles.createDirectories(GPath(dirOf(ident)).getParent)
    val cleanSchema =
      if (gencols.isEmpty) schema
      else StructType(schema.fields.map { f =>
        if (!gencols.contains(f.name)) f
        else f.copy(metadata = new org.apache.spark.sql.types
          .MetadataBuilder().withMetadata(f.metadata)
          .remove(org.apache.spark.sql.catalyst.util.GeneratedColumn
            .GENERATION_EXPRESSION_METADATA_KEY).build())
      })
    val t = CommitLogTable.create(spark, dirOf(ident), cleanSchema,
      partitionCols)
    // USING/option properties that are Spark bookkeeping don't persist
    val props = properties.asScala.toMap --
      Seq("provider", "location", "owner", "external")
    val allProps = props ++ gencols.map { case (c, e) =>
      (CommitLogTable.GeneratedPropPrefix + c) -> e } ++ idProps
    if (allProps.nonEmpty) t.setProperties(allProps)
    loadTable(ident)
  }

  /** Each supported change is ONE metadata-only table-format commit. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val t = CommitLogTable.open(spark, dirOf(ident))
    changes.foreach {
      case c: TableChange.SetProperty =>
        t.setProperties(Map(c.property -> c.value))
      case c: TableChange.RemoveProperty =>
        t.unsetProperties(Seq(c.property))
      case c: TableChange.RenameColumn =>
        require(c.fieldNames.length == 1,
          "commitlog: nested column rename unsupported")
        t.renameColumn(c.fieldNames.head, c.newName)
      case c: TableChange.DeleteColumn =>
        require(c.fieldNames.length == 1,
          "commitlog: nested column drop unsupported")
        t.dropColumn(c.fieldNames.head)
      case c: TableChange.AddColumn =>
        require(c.fieldNames.length == 1,
          "commitlog: nested column add unsupported")
        t.addColumns(Seq(org.apache.spark.sql.types.StructField(
          c.fieldNames.head, c.dataType, c.isNullable)))
      // ANSI constraint DDL (Spark 4.1): `ALTER TABLE t ADD CONSTRAINT
      // n CHECK (expr)` lands as the table format's stored CHECK — the
      // add validates existing rows and every later write enforces it,
      // Delta's constraint semantics
      case c: TableChange.AddConstraint =>
        c.constraint match {
          case chk: org.apache.spark.sql.connector.catalog.constraints.Check =>
            t.addConstraint(chk.name, chk.predicateSql)
          case other => throw new UnsupportedOperationException(
            s"commitlog: only CHECK constraints are supported, got " +
              other.toDDL)
        }
      case c: TableChange.DropConstraint =>
        // IF EXISTS forgives ONLY the constraint being absent — a
        // require tripped inside the commit path must still surface
        if (!c.ifExists || t.constraints.contains(c.name))
          t.dropConstraint(c.name)
      case other => throw new UnsupportedOperationException(
        s"commitlog catalog: unsupported ALTER ${other.getClass.getSimpleName}")
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean =
    if (!tableExists(ident)) false
    else {
      GFiles.deleteRecursively(GPath(dirOf(ident)))
      true
    }

  override def renameTable(from: Identifier, to: Identifier): Unit = {
    if (!tableExists(from)) throw new NoSuchTableException(from)
    if (tableExists(to)) throw new TableAlreadyExistsException(to)
    GFiles.createDirectories(GPath(dirOf(to)).getParent)
    GFiles.moveNoReplace(GPath(dirOf(from)), GPath(dirOf(to)))
  }

  // ---- table-services procedures: `CALL graft.system.optimize(...)` —
  //      the OPTIMIZE / OPTIMIZE ZORDER BY / VACUUM surface of the
  //      reference's Delta maintenance (`docs/databricks_setup.md`
  //      OPTIMIZE ... ZORDER BY (as_of_date, symbol)), as SQL-callable
  //      stored procedures over the table format

  // ---- views (the reference's `CREATE OR REPLACE VIEW gold.price_features
  // AS …`, docs/databricks_setup.md:209): each view is one JSON file
  // `<warehouse>/<ns…>/<name>.view.json` holding the definition Spark
  // hands over — SQL text, the session's catalog/namespace context (so
  // unqualified names in the text re-resolve identically later), the
  // analyzed schema, column aliases/comments, properties. Stateless like
  // the tables: the filesystem IS the metastore, atomic replace via
  // temp-file + ATOMIC_MOVE. ----

  private def viewPath(ident: Identifier): GPath =
    GPath((Seq(warehouse) ++ ident.namespace().toSeq :+
      s"${ident.name()}.view.json").mkString("/"))

  override def viewExists(ident: Identifier): Boolean =
    GFiles.isRegularFile(viewPath(ident))

  override def listViews(namespace: String*): Array[Identifier] = {
    val nsDir = GPath((Seq(warehouse) ++ namespace).mkString("/"))
    if (!GFiles.isDirectory(nsDir)) Array.empty
    else GFiles.list(nsDir)
      .filter(p => p.fileName.endsWith(".view.json"))
      .map(p => Identifier.of(namespace.toArray,
        p.fileName.stripSuffix(".view.json")))
      .toArray
  }

  override def loadView(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.View = {
    if (!viewExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchViewException(ident)
    val n = CommitLogCatalog.viewMapper.readTree(
      GFiles.readString(viewPath(ident)))
    def strs(field: String): Array[String] = {
      val a = n.get(field)
      if (a == null || a.isNull) null
      else (0 until a.size).map(i =>
        if (a.get(i).isNull) null else a.get(i).asText()).toArray
    }
    new org.apache.spark.sql.connector.catalog.View {
      override def name(): String = ident.toString
      override def query(): String = n.get("sql").asText()
      override def currentCatalog(): String = n.get("currentCatalog").asText()
      override def currentNamespace(): Array[String] = strs("currentNamespace")
      override def schema(): StructType =
        org.apache.spark.sql.types.DataType.fromJson(
          n.get("schemaJson").asText()).asInstanceOf[StructType]
      override def queryColumnNames(): Array[String] =
        Option(strs("queryColumnNames")).getOrElse(Array.empty)
      override def columnAliases(): Array[String] = strs("columnAliases")
      override def columnComments(): Array[String] = strs("columnComments")
      override def properties(): JMap[String, String] = {
        val p = n.get("properties")
        val m = new java.util.HashMap[String, String]()
        if (p != null) p.properties().asScala
          .foreach(e => m.put(e.getKey, e.getValue.asText()))
        m
      }
    }
  }

  private def writeViewFile(
      info: org.apache.spark.sql.connector.catalog.ViewInfo,
      replace: Boolean): Unit = {
    val m = CommitLogCatalog.viewMapper
    val root = m.createObjectNode()
    root.put("sql", info.sql)
    root.put("currentCatalog", info.currentCatalog)
    def putArr(field: String, a: Array[String]): Unit =
      if (a != null) {
        val arr = root.putArray(field)
        a.foreach(arr.add)
      }
    putArr("currentNamespace", info.currentNamespace)
    root.put("schemaJson", info.schema.json)
    putArr("queryColumnNames", info.queryColumnNames)
    putArr("columnAliases", info.columnAliases)
    putArr("columnComments", info.columnComments)
    val props = root.putObject("properties")
    info.properties.asScala.foreach { case (k, v) => props.put(k, v) }
    val path = viewPath(info.ident)
    GFiles.createDirectories(path.getParent)
    val tmp = path.getParent.resolve(path.fileName +
      s".tmp-${java.util.UUID.randomUUID()}")
    GFiles.writeString(tmp, m.writerWithDefaultPrettyPrinter()
      .writeValueAsString(root))
    try {
      if (replace) GFiles.moveReplace(tmp, path)
      else GFiles.moveNoReplace(tmp, path)
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        GFiles.deleteIfExists(tmp)
        throw new org.apache.spark.sql.catalyst.analysis
          .ViewAlreadyExistsException(info.ident)
    }
  }

  override def createView(
      info: org.apache.spark.sql.connector.catalog.ViewInfo)
      : org.apache.spark.sql.connector.catalog.View = {
    if (tableExists(info.ident))
      throw new TableAlreadyExistsException(info.ident)
    if (viewExists(info.ident))
      throw new org.apache.spark.sql.catalyst.analysis
        .ViewAlreadyExistsException(info.ident)
    writeViewFile(info, replace = false)
    loadView(info.ident)
  }

  override def replaceView(
      info: org.apache.spark.sql.connector.catalog.ViewInfo,
      orCreate: Boolean): org.apache.spark.sql.connector.catalog.View = {
    if (!orCreate && !viewExists(info.ident))
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchViewException(info.ident)
    writeViewFile(info, replace = true)
    loadView(info.ident)
  }

  override def alterView(ident: Identifier,
      changes: org.apache.spark.sql.connector.catalog.ViewChange*)
      : org.apache.spark.sql.connector.catalog.View = {
    import org.apache.spark.sql.connector.catalog.ViewChange
    val v = loadView(ident) // throws NoSuchViewException when absent
    val props = new java.util.HashMap[String, String](v.properties())
    changes.foreach {
      case s: ViewChange.SetProperty => props.put(s.property(), s.value())
      case r: ViewChange.RemoveProperty => props.remove(r.property())
      case other => throw new IllegalArgumentException(
        s"commitlog catalog: unsupported view change $other")
    }
    writeViewFile(new org.apache.spark.sql.connector.catalog.ViewInfo(
      ident, v.query(), v.currentCatalog(), v.currentNamespace(),
      v.schema(), v.queryColumnNames(), v.columnAliases(),
      v.columnComments(), props), replace = true)
    loadView(ident)
  }

  override def dropView(ident: Identifier): Boolean =
    GFiles.deleteIfExists(viewPath(ident))

  override def renameView(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!viewExists(oldIdent))
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchViewException(oldIdent)
    if (viewExists(newIdent) || tableExists(newIdent))
      throw new org.apache.spark.sql.catalyst.analysis
        .ViewAlreadyExistsException(newIdent)
    GFiles.createDirectories(viewPath(newIdent).getParent)
    try GFiles.moveNoReplace(viewPath(oldIdent), viewPath(newIdent))
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new org.apache.spark.sql.catalyst.analysis
          .ViewAlreadyExistsException(newIdent)
    }
  }

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(Array("system")))
      Array("optimize", "vacuum", "restore", "history", "detail",
        "convert", "clone", "delta_reconcile")
        .map(Identifier.of(Array("system"), _))
    else Array.empty

  override def loadProcedure(ident: Identifier): UnboundProcedure = {
    if (!ident.namespace.sameElements(Array("system")))
      throw new UnsupportedOperationException(
        s"commitlog catalog: procedures live in the `system` namespace, got $ident")
    val tableOf: String => CommitLogTable = { name =>
      val parts = name.split('.')
      val id = Identifier.of(parts.init, parts.last)
      if (!tableExists(id)) throw new NoSuchTableException(id)
      CommitLogTable.open(spark, dirOf(id))
    }
    // a target identifier's directory — for CLONE, whose target must
    // NOT exist yet (shallowCloneTo enforces)
    val dirOfName: String => String = { name =>
      val parts = name.split('.')
      dirOf(Identifier.of(parts.init, parts.last))
    }
    ident.name match {
      case "optimize" => new OptimizeProcedure(tableOf)
      case "vacuum" => new VacuumProcedure(tableOf)
      case "restore" => new RestoreProcedure(tableOf)
      case "history" => new HistoryProcedure(tableOf)
      case "detail" => new DetailProcedure(tableOf)
      case "convert" => new ConvertProcedure(spark)
      case "clone" => new CloneProcedure(tableOf, dirOfName)
      case "delta_reconcile" => new DeltaReconcileProcedure(tableOf)
      case other => throw new UnsupportedOperationException(
        s"commitlog catalog: no procedure `$other` " +
          "(have: optimize, vacuum, restore, history, detail, convert, " +
          "clone, delta_reconcile)")
    }
  }
}

/** `CALL cat.system.convert(path => '/data/dump' [, source =>
  * 'parquet'|'delta'] [, partition_cols => 'a,b'] [, version => 3])` —
  * Delta's `CONVERT TO DELTA parquet.`…``: zero-copy adoption of an
  * existing parquet directory — or an existing DELTA table via its log
  * ([[CommitLogTable.convertFromDelta]], optionally at a pinned
  * version) — into a commit-log table IN PLACE. The table methods own
  * the safety rules: PAR1 magic, foreign-log refusal, Hive-layout
  * checks; live-DV / id-mapping refusal on the delta side.
  */
private final class ConvertProcedure(spark: SparkSession)
    extends UnboundProcedure with BoundProcedure {
  override def name(): String = "convert"
  override def description(): String =
    "zero-copy adoption of a parquet directory or Delta table " +
      "(CONVERT TO COMMITLOG)"
  override def bind(inputType: StructType): BoundProcedure = this
  override def isDeterministic: Boolean = false
  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("path", StringType).build(),
    ProcedureParameter.in("partition_cols", StringType)
      .defaultValue("CAST(NULL AS STRING)").build(),
    ProcedureParameter.in("source", StringType)
      .defaultValue("'parquet'").build(),
    ProcedureParameter.in("version", org.apache.spark.sql.types.LongType)
      .defaultValue("CAST(NULL AS BIGINT)").build())

  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val path = input.getUTF8String(0).toString
    val cols = if (input.isNullAt(1)) Seq.empty[String]
      else input.getUTF8String(1).toString.split(',')
        .map(_.trim).filter(_.nonEmpty).toSeq
    val source = if (input.isNullAt(2)) "parquet"
      else input.getUTF8String(2).toString.toLowerCase(java.util.Locale.ROOT)
    val version = if (input.isNullAt(3)) None else Some(input.getLong(3))
    val t = source match {
      case "parquet" =>
        require(version.isEmpty,
          "convert: version pins apply to delta sources only")
        CommitLogTable.convert(spark, path, cols)
      case "delta" =>
        require(cols.isEmpty, "convert: a delta source takes its " +
          "partition columns from the log — drop partition_cols")
        CommitLogTable.convertFromDelta(spark, path, version)
      case other => throw new IllegalArgumentException(
        s"convert: unknown source '$other' (parquet, delta)")
    }
    val m = t.resolvedManifest(None)
    val schema = StructType(Seq(
      org.apache.spark.sql.types.StructField("location", StringType),
      org.apache.spark.sql.types.StructField("num_files",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("rows_total",
        org.apache.spark.sql.types.LongType)))
    java.util.Collections.singletonList(
      new ProcedureResult(schema, Seq(Seq[Any](
        UTF8String.fromString(t.dir), m.files.size, m.rowsTotal)))
        : Scan).iterator()
  }
}

/** `CALL cat.system.delta_reconcile(table => 'ns.t')` — pull FOREIGN
  * Delta commits (an external writer mid-cutover) from the table's own
  * `_delta_log` into the commit log, one graft version per Delta
  * version ([[graft.tables.DeltaLogBridge.reconcile]]). Also runs
  * automatically before every graft commit on mirror-enabled tables;
  * the explicit call is for pulling WITHOUT writing.
  */
private final class DeltaReconcileProcedure(
    tableOf: String => CommitLogTable)
    extends UnboundProcedure with BoundProcedure {
  override def name(): String = "delta_reconcile"
  override def description(): String =
    "replay foreign Delta commits from the table's _delta_log into " +
      "the commit log"
  override def bind(inputType: StructType): BoundProcedure = this
  override def isDeterministic: Boolean = false
  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("table", StringType).build())

  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val t = tableOf(input.getUTF8String(0).toString)
    val before = t.latestVersion
    val head = graft.tables.DeltaLogBridge.reconcile(t)
    val schema = StructType(Seq(
      org.apache.spark.sql.types.StructField("versions_pulled",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("head",
        org.apache.spark.sql.types.LongType)))
    java.util.Collections.singletonList(
      new ProcedureResult(schema, Seq(Seq[Any](head - before, head)))
        : Scan).iterator()
  }
}

/** `CALL cat.system.clone(table => 'ns.src', target => 'ns.tgt'
  * [, version => 3])` — Delta's `CREATE TABLE tgt SHALLOW CLONE src
  * [VERSION AS OF n]`: a metadata-only copy referencing the source's
  * files in place ([[CommitLogTable.shallowCloneTo]]).
  */
private final class CloneProcedure(tableOf: String => CommitLogTable,
    dirOfName: String => String)
    extends UnboundProcedure with BoundProcedure {
  override def name(): String = "clone"
  override def description(): String =
    "metadata-only shallow clone (CREATE TABLE … SHALLOW CLONE …)"
  override def bind(inputType: StructType): BoundProcedure = this
  override def isDeterministic: Boolean = false
  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("table", StringType).build(),
    ProcedureParameter.in("target", StringType).build(),
    ProcedureParameter.in("version", org.apache.spark.sql.types.LongType)
      .defaultValue("CAST(NULL AS BIGINT)").build())

  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val src = tableOf(input.getUTF8String(0).toString)
    val targetDir = dirOfName(input.getUTF8String(1).toString)
    val version = if (input.isNullAt(2)) None else Some(input.getLong(2))
    val t = src.shallowCloneTo(targetDir, version)
    val schema = StructType(Seq(
      org.apache.spark.sql.types.StructField("location", StringType),
      org.apache.spark.sql.types.StructField("cloned_version",
        org.apache.spark.sql.types.LongType)))
    java.util.Collections.singletonList(
      new ProcedureResult(schema, Seq(Seq[Any](
        UTF8String.fromString(t.dir),
        version.getOrElse(src.latestVersion)))): Scan).iterator()
  }
}

/** `CALL cat.system.detail(table => 'ns.t')` — Delta's `DESCRIBE
  * DETAIL`: one row of snapshot facts (format, location, version, file
  * and row counts, byte size, partition columns, clustering marker,
  * properties), answered from the latest manifest alone — no data read.
  */
private final class DetailProcedure(tableOf: String => CommitLogTable)
    extends UnboundProcedure with BoundProcedure {
  override def name(): String = "detail"
  override def description(): String =
    "one-row snapshot detail (DESCRIBE DETAIL), manifest-only"
  override def bind(inputType: StructType): BoundProcedure = this
  override def isDeterministic: Boolean = false
  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("table", StringType).build())

  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    import org.apache.spark.sql.types.{LongType, IntegerType}
    val t = tableOf(input.getUTF8String(0).toString)
    val m = t.resolvedManifest(None)
    val schema = StructType(Seq(
      org.apache.spark.sql.types.StructField("format", StringType),
      org.apache.spark.sql.types.StructField("location", StringType),
      org.apache.spark.sql.types.StructField("version", LongType),
      org.apache.spark.sql.types.StructField("num_files", IntegerType),
      org.apache.spark.sql.types.StructField("size_bytes", LongType),
      org.apache.spark.sql.types.StructField("rows_total", LongType),
      org.apache.spark.sql.types.StructField("partition_columns", StringType),
      org.apache.spark.sql.types.StructField("clustered_by", StringType),
      org.apache.spark.sql.types.StructField("properties", StringType)))
    val props = m.properties.toSeq.sortBy(_._1)
      .map { case (k, v) => s"$k=$v" }.mkString(",")
    val row = Seq[Any](
      UTF8String.fromString("commitlog"),
      UTF8String.fromString(t.dir),
      m.version,
      m.files.size,
      m.files.map(_.bytes).sum,
      m.rowsTotal,
      UTF8String.fromString(m.partitionCols.mkString(",")),
      m.clusteredBy.map(UTF8String.fromString).orNull,
      UTF8String.fromString(props))
    java.util.Collections.singletonList(
      new ProcedureResult(schema, Seq(row)): Scan).iterator()
  }
}

/** A procedure's result set: a driver-local one-shot scan (the rows were
  * computed by the maintenance op itself — nothing to distribute).
  */
private final class ProcedureResult(schema: StructType,
    rowData: Seq[Seq[Any]]) extends LocalScan {
  override def readSchema(): StructType = schema
  override def rows(): Array[InternalRow] = rowData.map(r =>
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      r.toArray)).toArray[InternalRow]
}

/** `CALL cat.system.optimize(table => 'ns.t' [, target_file_mb => 128]
  * [, zorder_by => 'c1,c2'] [, sort_by => 'c1'])` — bin-packing compact,
  * optionally clustered: `zorder_by` interleaves 2-4 dimensions
  * (multi-column range pruning), `sort_by` is the linear lexicographic
  * layout. One transactional commit; returns per-partition file counts.
  */
private final class OptimizeProcedure(tableOf: String => CommitLogTable)
    extends UnboundProcedure with BoundProcedure {
  override def name(): String = "optimize"
  override def description(): String =
    "bin-packing compaction, optionally Z-ordered or sorted"
  override def bind(inputType: StructType): BoundProcedure = this
  override def isDeterministic: Boolean = false
  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("table", StringType).build(),
    ProcedureParameter.in("target_file_mb", IntegerType)
      .defaultValue("128").build(),
    ProcedureParameter.in("zorder_by", StringType)
      .defaultValue("CAST(NULL AS STRING)").build(),
    ProcedureParameter.in("sort_by", StringType)
      .defaultValue("CAST(NULL AS STRING)").build(),
    // partition-scoped OPTIMIZE (Delta's `OPTIMIZE t WHERE …`): a SQL
    // boolean over the PARTITION columns picks the leaves to compact
    ProcedureParameter.in("where", StringType)
      .defaultValue("CAST(NULL AS STRING)").build())

  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val t = tableOf(input.getUTF8String(0).toString)
    val targetBytes = input.getInt(1).toLong * 1024 * 1024
    val zorder = if (input.isNullAt(2)) None
      else Some(input.getUTF8String(2).toString.split(',').map(_.trim).toSeq)
    val sortBy = if (input.isNullAt(3)) None
      else Some(input.getUTF8String(3).toString.split(',').map(_.trim).toSeq)
    require(zorder.isEmpty || sortBy.isEmpty,
      "optimize: give zorder_by OR sort_by, not both")
    val values = if (input.isNullAt(4)) None
      else Some(t.partitionKeysWhere(input.getUTF8String(4).toString))
    val report = zorder match {
      case Some(cols) => t.compactZOrder(targetBytes, cols, values = values)
      case None => t.compact(targetBytes, values = values,
        sortCols = sortBy.getOrElse(Seq.empty).map(col))
    }
    val schema = StructType(Seq(
      org.apache.spark.sql.types.StructField("partition", StringType),
      org.apache.spark.sql.types.StructField("files_before", IntegerType),
      org.apache.spark.sql.types.StructField("files_after", IntegerType)))
    val rows = report.toSeq.sortBy(_._1).map { case (p, (b, a)) =>
      Seq[Any](UTF8String.fromString(p), b, a) }
    java.util.Collections.singletonList(
      new ProcedureResult(schema, rows): Scan).iterator()
  }
}

/** `CALL cat.system.vacuum(table => 'ns.t' [, retain_versions => 2]
  * [, vacuum_log => true])` — drop data files only superseded versions
  * reference (plus aged write orphans), and optionally checkpoint-
  * superseded log segments. Returns (data_files_removed,
  * log_segments_removed).
  */
private final class VacuumProcedure(tableOf: String => CommitLogTable)
    extends UnboundProcedure with BoundProcedure {
  override def name(): String = "vacuum"
  override def description(): String =
    "remove data files and log segments only superseded versions reference"
  override def bind(inputType: StructType): BoundProcedure = this
  override def isDeterministic: Boolean = false
  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("table", StringType).build(),
    ProcedureParameter.in("retain_versions", IntegerType)
      .defaultValue("2").build(),
    ProcedureParameter.in("vacuum_log", org.apache.spark.sql.types.BooleanType)
      .defaultValue("false").build())

  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val t = tableOf(input.getUTF8String(0).toString)
    val retain = input.getInt(1)
    val nData = t.vacuum(retain)
    val nLog = if (input.getBoolean(2)) t.vacuumLog(retain) else 0
    val schema = StructType(Seq(
      org.apache.spark.sql.types.StructField("data_files_removed", IntegerType),
      org.apache.spark.sql.types.StructField("log_segments_removed", IntegerType)))
    java.util.Collections.singletonList(
      new ProcedureResult(schema, Seq(Seq[Any](nData, nLog))): Scan).iterator()
  }
}

/** `CALL cat.system.restore(table => 'ns.t', version => 3)` — Delta's
  * `RESTORE TABLE`: one metadata-only commit re-pointing the snapshot
  * at the target version (fails fast if vacuum dropped its files).
  * Returns (restored_to_version, new_version).
  */
private final class RestoreProcedure(tableOf: String => CommitLogTable)
    extends UnboundProcedure with BoundProcedure {
  override def name(): String = "restore"
  override def description(): String =
    "metadata-only rollback of the table to an earlier version"
  override def bind(inputType: StructType): BoundProcedure = this
  override def isDeterministic: Boolean = false
  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("table", StringType).build(),
    ProcedureParameter.in("version", org.apache.spark.sql.types.LongType)
      .defaultValue("CAST(NULL AS BIGINT)").build(),
    // Delta's `RESTORE … TIMESTAMP AS OF`: an instant resolves to the
    // latest version committed at-or-before it (versionAt's rule)
    ProcedureParameter.in("timestamp", StringType)
      .defaultValue("CAST(NULL AS STRING)").build())

  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val t = tableOf(input.getUTF8String(0).toString)
    require(input.isNullAt(1) != input.isNullAt(2),
      "restore: give exactly one of version / timestamp")
    val target =
      if (!input.isNullAt(1)) input.getLong(1)
      else t.versionAt(CommitLogTable.parseTsMillis(
        input.getUTF8String(2).toString, t.spark))
    val newV = t.restore(target)
    val schema = StructType(Seq(
      org.apache.spark.sql.types.StructField("restored_to_version",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("new_version",
        org.apache.spark.sql.types.LongType)))
    java.util.Collections.singletonList(
      new ProcedureResult(schema, Seq(Seq[Any](target, newV))): Scan).iterator()
  }
}

/** `CALL cat.system.history(table => 'ns.t')` — the reference's
  * `DESCRIBE HISTORY` surface on its Delta tables: one row per
  * committed version (action + row/file statistics), computed from
  * manifests alone — no data read.
  */
private final class HistoryProcedure(tableOf: String => CommitLogTable)
    extends UnboundProcedure with BoundProcedure {
  override def name(): String = "history"
  override def description(): String =
    "per-version commit history from the manifests (no data read)"
  override def bind(inputType: StructType): BoundProcedure = this
  override def isDeterministic: Boolean = false
  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("table", StringType).build())

  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val t = tableOf(input.getUTF8String(0).toString)
    val rows = t.history.collect().toSeq.map { r =>
      Seq[Any](r.getLong(0), UTF8String.fromString(r.getString(1)),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
        r.getInt(6), r.getLong(7))
    }
    java.util.Collections.singletonList(
      new ProcedureResult(CommitLogTable.HistorySchema, rows): Scan).iterator()
  }
}

/** V1 `Filter` → `Column` for the SQL DELETE path: the supported shapes
  * translate exactly; an untranslatable filter makes `canDeleteWhere`
  * refuse, and Spark reports the unsupported DELETE instead of silently
  * deleting the wrong rows.
  */
private object FilterToColumn {
  def apply(f: Filter): Option[Column] = f match {
    case sources.EqualTo(a, v) => Some(col(a) === lit(v))
    case sources.EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case sources.GreaterThan(a, v) => Some(col(a) > lit(v))
    case sources.GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case sources.LessThan(a, v) => Some(col(a) < lit(v))
    case sources.LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case sources.In(a, vs) => Some(col(a).isInCollection(vs.toSeq))
    case sources.IsNull(a) => Some(col(a).isNull)
    case sources.IsNotNull(a) => Some(col(a).isNotNull)
    case sources.StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case sources.StringEndsWith(a, v) => Some(col(a).endsWith(v))
    case sources.StringContains(a, v) => Some(col(a).contains(v))
    case sources.And(l, r) => for { a <- apply(l); b <- apply(r) } yield a && b
    case sources.Or(l, r) => for { a <- apply(l); b <- apply(r) } yield a || b
    case sources.Not(c) => apply(c).map(!_)
    case sources.AlwaysTrue() => Some(lit(true))
    case sources.AlwaysFalse() => Some(lit(false))
    case _ => None
  }
}

/** A catalog-bound commit-log table: the DSv2 read path of
  * [[CommitLogV2Table]] plus the V1Write bridge, so `INSERT INTO` /
  * `INSERT OVERWRITE` / `df.writeTo(...).append()` land as single
  * transactional commits (append / atomic overwrite with CDF). Kept
  * separate from the PATH-based table on purpose: declaring
  * V1_BATCH_WRITE there would reroute `df.write.save(dir)` through the
  * V2 planner, which refuses ErrorIfExists/Ignore for path tables.
  */
final class CommitLogCatalogTable(spark: SparkSession, dir: String,
    version: Option[Long]) extends CommitLogV2Table(spark, dir, version)
    with SupportsWrite with SupportsDelete {

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      // readStream.table(...): the V2 micro-batch DATA stream — the
      // read the reference's silver notebook opens on bronze
      TableCapability.MICRO_BATCH_READ,
      // writeStream.toTable(...): the two-phase exactly-once epoch sink
      TableCapability.STREAMING_WRITE,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)

  /** Stored CHECK constraints surfaced through the V2 metadata API
    * (what `DESCRIBE EXTENDED` and constraint-aware planning read).
    * Enforced-and-validated: the add scanned the table, every write
    * re-validates ([[graft.tables.CommitLogTable.addConstraint]]).
    */
  override def constraints()
      : Array[org.apache.spark.sql.connector.catalog.constraints.Constraint] =
    snap.constraints.toSeq.sortBy(_._1).map { case (n, sql) =>
      org.apache.spark.sql.connector.catalog.constraints.Constraint
        .check(n).predicateSql(sql)
        .validationStatus(org.apache.spark.sql.connector.catalog
          .constraints.Constraint.ValidationStatus.VALID)
        .build(): org.apache.spark.sql.connector.catalog.constraints.Constraint
    }.toArray

  /** SQL `DELETE FROM cat.ns.t WHERE …` (and, via the default
    * `truncateTable`, `TRUNCATE TABLE`): the conjunction lands as ONE
    * transactional copy-on-write delete — stats-pruned file carry-over,
    * CDF delete images, no-op publishes nothing. Non-subquery DELETEs
    * are normally intercepted upstream by
    * [[graft.plans.DeleteFromCommitLogStrategy]] (which also takes
    * predicates this V1-Filter bridge can't express); this path remains
    * for sessions without the injected strategies and for TRUNCATE.
    */
  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    filters.forall(f => FilterToColumn(f).isDefined)

  override def deleteWhere(filters: Array[Filter]): Unit = {
    val cond = filters.flatMap(FilterToColumn(_))
      .reduceOption(_ && _).getOrElse(lit(true))
    CommitLogTable.open(spark, dir).delete(cond)
  }

  override def properties(): JMap[String, String] = {
    val m = new java.util.HashMap[String, String]()
    snap.properties.foreach { case (k, v) => m.put(k, v) }
    // reserved key SHOW CREATE TABLE / DESCRIBE render as `USING`
    m.put(TableCatalog.PROP_PROVIDER, "commitlog")
    m
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var replace = false
      override def truncate(): WriteBuilder = { replace = true; this }
      override def build(): Write = new V1Write
          with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: org.apache.spark.sql.DataFrame,
                overwrite: Boolean): Unit = {
              val t = CommitLogTable.open(data.sparkSession, dir)
              if (replace || overwrite) t.overwrite(data)
              else t.append(data)
            }
          }
        /** Cluster epoch rows by the table-partition column before the
          * STREAMING writers: without it every task opens a writer per
          * partition value it sees — task-count × partition-value small
          * files per epoch at scale. Scoped to streaming writes only
          * (detected by the checkpointLocation option every stream
          * carries): V2Writes applies this to batch AppendData too, and
          * the V1 batch path already repartitions inside `writeData` —
          * declaring it there would shuffle every INSERT twice.
          */
        override def requiredDistribution()
            : org.apache.spark.sql.connector.distributions.Distribution = {
          import org.apache.spark.sql.connector.distributions.Distributions
          val streaming = info.options().containsKey("checkpointLocation")
          val pcols = if (streaming) snap.partitionCols else Seq.empty
          if (pcols.nonEmpty) Distributions.clustered(pcols.map(p =>
            org.apache.spark.sql.connector.expressions.Expressions
              .identity(p): org.apache.spark.sql.connector.expressions
              .Expression).toArray)
          else Distributions.unspecified()
        }
        override def requiredOrdering()
            : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
          Array.empty
        /** `writeStream.toTable(...)` — see [[CommitLogStreamingWrite]]. */
        override def toStreaming
            : org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
          require(!replace, "commitlog streaming write supports Append " +
            "output mode only (Complete would overwrite the table each epoch)")
          new CommitLogStreamingWrite(spark, dir, info)
        }
      }
    }
}

object CommitLogCatalog {
  /** Shared, thread-safe Jackson mapper for the view-definition files. */
  private[sources] val viewMapper =
    new com.fasterxml.jackson.databind.ObjectMapper()
}
