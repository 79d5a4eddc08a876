package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import java.nio.file.{Files, Paths}

import graft.ops.TableManifest

/** Catalog plugin exposing [[graft.ops.TableManifest]] tables to SQL — the
  * final piece of the table-format-in-miniature: manifest-committed tables
  * become first-class SQL identifiers, and the commit log's immutable
  * `_manifest-v{N}` snapshots become `VERSION AS OF` time travel THROUGH
  * SPARK'S OWN SYNTAX (the analyzer resolves `FOR VERSION AS OF v` to
  * `loadTable(ident, version)` on this catalog — no custom parsing, the
  * exact plugin seam Delta/Iceberg use).
  *
  * Reads delegate to Spark's builtin parquet DSv2 `ParquetTable` pinned to
  * the SNAPSHOT'S FILE LIST, so every scan feature the suite relies on —
  * filter/aggregate pushdown, column pruning, vectorized read — applies
  * unchanged to a time-traveled read, and snapshot isolation is inherited
  * from the manifest protocol (old files are retained until vacuum; a
  * version reads identically until then, ManifestCommitSpec's claim).
  * Writes go through the graft ops' commit path, not SQL DDL — this catalog
  * is deliberately read-only (mutating methods throw), the
  * catalog-as-a-view-of-the-commit-log design.
  *
  * Configuration:
  * {{{
  *   spark.sql.catalog.<name>      = graft.sources.GraftLakeCatalog
  *   spark.sql.catalog.<name>.root = <warehouse dir: root/<table>/_manifest.json>
  * }}}
  */
class GraftLakeCatalog extends TableCatalog {

  private var catalogName: String = _
  private var root: java.nio.file.Path = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    require(options.containsKey("root"), s"catalog $name requires option 'root'")
    root = Paths.get(options.get("root"))
  }

  override def name(): String = catalogName

  /** The warehouse is flat (root/<table>): the only valid namespace is the
    * empty one. Without this check `cat.bogus_ns.tbl` would silently resolve
    * to root/tbl and `SHOW TABLES IN cat.anything` would list every table. */
  private def validNamespace(ns: Array[String]): Boolean = ns.isEmpty

  private def tableDir(ident: Identifier) = root.resolve(ident.name())

  private def noSuchTable(ident: Identifier, extra: String*) =
    throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
      (catalogName +: ident.namespace().toSeq :+ ident.name()) ++ extra)

  private def parquetTable(ident: Identifier, files: Seq[java.nio.file.Path],
      versionLabel: String): Table =
    ParquetTable(
      s"$catalogName.${ident.name()}$versionLabel",
      SparkSession.active,
      CaseInsensitiveStringMap.empty(),
      files.map(_.toString),
      None,
      classOf[ParquetFileFormat])

  override def loadTable(ident: Identifier): Table = {
    if (!validNamespace(ident.namespace())) noSuchTable(ident)
    val dir = tableDir(ident)
    if (!Files.exists(dir.resolve(TableManifest.fileName))) noSuchTable(ident)
    parquetTable(ident, TableManifest.read(dir)._2, "")
  }

  /** `SELECT ... FROM t VERSION AS OF v` lands here. Snapshot parsing is
    * [[TableManifest.filesAsOf]] — the catalog holds no copy of the wire
    * format. */
  override def loadTable(ident: Identifier, version: String): Table = {
    if (!validNamespace(ident.namespace())) noSuchTable(ident)
    val dir = tableDir(ident)
    if (!Files.exists(dir.resolve(s"_manifest-v$version.json")))
      noSuchTable(ident, s"version $version")
    val v = try version.toLong catch {
      case _: NumberFormatException => noSuchTable(ident, s"version $version")
    }
    parquetTable(ident, TableManifest.filesAsOf(dir, v), s"@v$version")
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (!validNamespace(namespace))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(
        catalogName +: namespace.toSeq)
    if (!Files.exists(root)) return Array.empty
    val s = Files.list(root)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala
        .filter(d => Files.exists(d.resolve(TableManifest.fileName)))
        .map(d => Identifier.of(namespace, d.getFileName.toString))
        .toArray
    } finally s.close()
  }

  override def tableExists(ident: Identifier): Boolean =
    validNamespace(ident.namespace()) &&
      Files.exists(tableDir(ident).resolve(TableManifest.fileName))

  private def readOnly(op: String) = throw new UnsupportedOperationException(
    s"$catalogName is read-only: tables are published by graft's manifest " +
      s"commit protocol, not SQL DDL ($op)")

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: java.util.Map[String, String]): Table =
    readOnly("createTable")
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    readOnly("alterTable")
  override def dropTable(ident: Identifier): Boolean = readOnly("dropTable")
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    readOnly("renameTable")
}
