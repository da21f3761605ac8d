package graft.table.catalog

import java.nio.file.{Files, Paths}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.table.VersionedTable

/** DataSource-V2 catalog exposing the [[VersionedTable]] manifest-log tier
  * to SQL — the reference's analytics surface IS SQL text submitted to a
  * warehouse (`advanced_monitoring.py:78-199`), so the engine's own table
  * tier must be reachable the same way:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
  *   spark.sql("SELECT * FROM graft.db.orders VERSION AS OF 2")
  *   spark.sql("SELECT * FROM graft.db.orders TIMESTAMP AS OF '...'")
  * }}}
  *
  * Resolution is PURE METADATA, one manifest read per query: the
  * identifier maps to `<warehouse>/<namespace...>/<name>`, `VERSION AS OF`
  * routes through Spark's `loadTable(ident, version)` hook to the pinned
  * manifest, and the returned table is Spark's own parquet DSv2
  * [[ParquetTable]] constructed over EXACTLY the manifest's frozen file
  * list with the manifest's committed `S`-record schema. There is no
  * second read path: the SQL scan is the same pruned parquet scan
  * [[VersionedTable.readVersion]] compiles (GraftCatalogSpec pins
  * file-set identity via `inputFiles` and bit-identical results), and
  * Catalyst's filter pushdown / column pruning apply to it like any
  * parquet relation. At 100 TB a `VERSION AS OF` query costs one KB-sized
  * manifest read on the driver before the distributed scan starts.
  *
  * Scope guard (fail fast, never serve wrong rows): a version carrying
  * merge-on-read state — equality-delete `E` records, deletion-vector `V`
  * records, or rename `R` mappings — cannot be served by a bare parquet
  * scan (the read would need the anti-join / aliasing resolution the API
  * path applies), so loadTable refuses with the compact-first message
  * instead of returning a table that silently includes deleted rows.
  * Writes stay on the `VersionedTable` API (atomic CAS publish); SQL DDL
  * mutation is out of scope and throws.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse"))
      .getOrElse(GraftCatalog.defaultWarehouse)
  }

  override def name(): String = catalogName

  private def rootFor(ident: Identifier): String =
    (warehouse +: ident.namespace.toSeq :+ ident.name).mkString("/")

  override def tableExists(ident: Identifier): Boolean =
    VersionedTable.latestVersion(rootFor(ident)) > 0

  override def loadTable(ident: Identifier): Table = {
    val root = rootFor(ident)
    val latest = VersionedTable.latestVersion(root)
    if (latest == 0) throw new NoSuchTableException(ident)
    tableAt(ident, root, latest)
  }

  /** `VERSION AS OF <v>` — Spark routes the parsed literal here. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val root = rootFor(ident)
    val v = try version.toInt catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"graft catalog versions are integers; got '$version'")
    }
    if (v < 1 || v > VersionedTable.latestVersion(root))
      throw new NoSuchTableException(ident)
    tableAt(ident, root, v)
  }

  /** `TIMESTAMP AS OF <ts>` — micros since epoch; resolves to the NEWEST
    * version whose commit instant is at or before it (the Delta/Iceberg
    * timestamp-travel contract: "the table as it stood then"). The commit
    * clock is the manifest's own `T` record — durable commit metadata
    * written at publish time, exactly like Delta/Iceberg store the commit
    * instant inside the log — NOT the manifest file's mtime, which a
    * warehouse copy/restore/rsync rewrites and would silently pin a
    * different version. mtime remains only as the fallback for legacy
    * manifests that predate the record. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val root = rootFor(ident)
    val latest = VersionedTable.latestVersion(root)
    if (latest == 0) throw new NoSuchTableException(ident)
    val v = (1 to latest).filter { v =>
      val m = Paths.get(s"$root/_commits/v$v.manifest")
      Files.exists(m) && {
        val millis = VersionedTable.commitTimestampMillis(root, v)
          .getOrElse(Files.getLastModifiedTime(m).toMillis)
        millis * 1000L <= timestampMicros
      }
    }
    if (v.isEmpty) throw new NoSuchTableException(ident)
    tableAt(ident, root, v.max)
  }

  /** The version pinned as Spark's own parquet DSv2 table over the
    * manifest's frozen files — the identical relation
    * `VersionedTable.readVersion` scans, resolved through SQL. */
  private def tableAt(ident: Identifier, root: String, v: Int): Table = {
    require(VersionedTable.deleteFiles(root, v).isEmpty &&
        VersionedTable.dvFiles(root, v).isEmpty,
      s"version $v of ${ident.name} carries merge-on-read delete records — " +
        "a bare SQL scan would serve deleted rows; compact first " +
        "(VersionedTable.compact folds them into a clean snapshot)")
    require(VersionedTable.renameMap(root, v).isEmpty,
      s"version $v of ${ident.name} carries column-rename mappings — " +
        "read through VersionedTable.readVersionRenamed (SQL rename " +
        "resolution is not served by this catalog)")
    val files = VersionedTable.manifest(root, v)
    val schema: Option[StructType] = VersionedTable.tableSchema(root, v)
    ParquetTable(
      s"${ident.name}@v$v",
      SparkSession.active,
      CaseInsensitiveStringMap.empty(),
      files,
      schema,
      classOf[ParquetFileFormat])
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = Paths.get((warehouse +: namespace.toSeq).mkString("/"))
    if (!Files.isDirectory(dir)) throw new NoSuchNamespaceException(namespace)
    scala.util.Using.resource(Files.list(dir)) { st =>
      st.iterator().asScala
        .filter(p => Files.isDirectory(p.resolve("_commits")))
        .map(p => Identifier.of(namespace, p.getFileName.toString))
        .toArray
    }
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "graft tables are created by VersionedTable.commit (atomic CAS publish)")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "graft table evolution goes through VersionedTable commits " +
        "(commitRename / schema-widening commit)")

  override def dropTable(ident: Identifier): Boolean = {
    val root = rootFor(ident)
    if (VersionedTable.latestVersion(root) == 0) false
    else { graft.sink.Sinks.deleteDir(root); true }
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "graft table renames are manifest commits, not catalog moves")

  // ---- SupportsNamespaces (directory-backed, read-mostly) -------------------

  override def listNamespaces(): Array[Array[String]] = {
    val wh = Paths.get(warehouse)
    if (!Files.isDirectory(wh)) return Array.empty
    scala.util.Using.resource(Files.list(wh)) { st =>
      st.iterator().asScala.filter(Files.isDirectory(_))
        .map(p => Array(p.getFileName.toString)).toArray
    }
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException(namespace)

  override def namespaceExists(namespace: Array[String]): Boolean =
    Files.isDirectory(Paths.get((warehouse +: namespace.toSeq).mkString("/")))

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] =
    if (namespaceExists(namespace)) util.Collections.emptyMap()
    else throw new NoSuchNamespaceException(namespace)

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit =
    Files.createDirectories(
      Paths.get((warehouse +: namespace.toSeq).mkString("/")))

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("graft namespaces carry no metadata")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val dir = (warehouse +: namespace.toSeq).mkString("/")
    if (!Files.isDirectory(Paths.get(dir))) false
    else if (!cascade && listTables(namespace).nonEmpty)
      throw new IllegalStateException(s"namespace ${namespace.mkString(".")} not empty")
    else { graft.sink.Sinks.deleteDir(dir); true }
  }
}

object GraftCatalog {
  /** One warehouse per JVM (pid-scoped like TableQueries' staging
    * namespace): catalog options are frozen at first SQL resolution, so
    * the default must be stable for the session's whole lifetime. */
  lazy val defaultWarehouse: String =
    s"${sys.props("java.io.tmpdir")}/graft_warehouse/p${ProcessHandle.current().pid()}"

  /** Idempotently register this catalog as `graft` on the session (a
    * no-op re-set after first use — Spark caches the initialized
    * instance per session). */
  def install(s: SparkSession): Unit =
    s.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
}
