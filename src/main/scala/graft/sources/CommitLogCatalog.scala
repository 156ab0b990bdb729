package graft.sources

import java.nio.file.{Files, Paths}
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsWrite, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

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
final class CommitLogCatalog extends TableCatalog {
  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"commitlog catalog '$name': set spark.sql.catalog.$name.warehouse"))
  }
  override def name(): String = catalogName

  private def spark: SparkSession = SparkSession.active
  private def dirOf(ident: Identifier): String =
    (Seq(warehouse) ++ ident.namespace().toSeq :+ ident.name()).mkString("/")

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val nsDir = Paths.get((Seq(warehouse) ++ namespace.toSeq).mkString("/"))
    if (!Files.isDirectory(nsDir)) throw new NoSuchNamespaceException(namespace)
    val s = Files.list(nsDir)
    try s.iterator().asScala
      .filter(p => CommitLogTable.exists(p.toString))
      .map(p => Identifier.of(namespace, p.getFileName.toString))
      .toArray
    finally s.close()
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

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String]): Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    val partitionCol = partitions.toSeq match {
      case Seq() => None
      case Seq(t) if t.name == "identity" && t.references.length == 1 =>
        Some(t.references.head.fieldNames.mkString("."))
      case other => throw new IllegalArgumentException(
        s"commitlog tables support one identity partition column, got " +
          other.mkString(", "))
    }
    Files.createDirectories(Paths.get(dirOf(ident)).getParent)
    val t = CommitLogTable.create(spark, dirOf(ident), schema, partitionCol)
    // USING/option properties that are Spark bookkeeping don't persist
    val props = properties.asScala.toMap --
      Seq("provider", "location", "owner", "external")
    if (props.nonEmpty) t.setProperties(props)
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
      case other => throw new UnsupportedOperationException(
        s"commitlog catalog: unsupported ALTER ${other.getClass.getSimpleName}")
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean =
    if (!tableExists(ident)) false
    else {
      val root = Paths.get(dirOf(ident))
      val s = Files.walk(root)
      try s.iterator().asScala.toVector.sortBy(-_.getNameCount)
        .foreach(Files.deleteIfExists)
      finally s.close()
      true
    }

  override def renameTable(from: Identifier, to: Identifier): Unit = {
    if (!tableExists(from)) throw new NoSuchTableException(from)
    if (tableExists(to)) throw new TableAlreadyExistsException(to)
    Files.createDirectories(Paths.get(dirOf(to)).getParent)
    Files.move(Paths.get(dirOf(from)), Paths.get(dirOf(to)))
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
    with SupportsWrite {

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)

  override def properties(): JMap[String, String] =
    snap.properties.asJava

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var replace = false
      override def truncate(): WriteBuilder = { replace = true; this }
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: org.apache.spark.sql.DataFrame,
                overwrite: Boolean): Unit = {
              val t = CommitLogTable.open(data.sparkSession, dir)
              if (replace || overwrite) t.overwrite(data)
              else t.append(data)
            }
          }
      }
    }
}
