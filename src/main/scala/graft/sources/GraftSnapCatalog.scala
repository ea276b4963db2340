package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsRead, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.execution.datasources.{FileStatusCache, PartitionSpec, PartitioningAwareFileIndex}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.ops.{SnapIO, Snapshots}

/** A v2 `TableCatalog` over a directory of graft-snap tables — REAL SQL
  * names and NATIVE time-travel syntax instead of temp-view options:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft",
  *     "graft.sources.GraftSnapCatalog")
  *   spark.conf.set("spark.sql.catalog.graft.root", "/lake")
  *
  *   SELECT * FROM graft.events                       -- /lake/events
  *   SELECT * FROM graft.events VERSION AS OF 3       -- time travel
  *   SELECT * FROM graft.events TIMESTAMP AS OF '2026-08-16 12:00:00'
  *   SHOW TABLES IN graft
  * }}}
  *
  * Spark's parser binds `VERSION AS OF` / `TIMESTAMP AS OF` to the v2
  * `loadTable(ident, version)` / `loadTable(ident, timestampMicros)`
  * overloads — exactly what this catalog implements over the manifest
  * chain ([[Snapshots.versionAsOf]] resolves the wall-clock form, same
  * contract as the reader option). The returned table's scan is Spark's
  * OWN vectorized parquet batch scan (`ParquetScanBuilder`) over the
  * pinned version's [[GraftSnapFileIndex]], so the manifest-embedded
  * stats pruning (numeric AND string bounds, zero footer I/O at
  * planning) rides through SQL untouched.
  *
  * READ-ONLY by design in this round: writes go through the DataFrame
  * front door (`df.write.format("graft-snap").save(root)`) or the Scala
  * surface — a catalog `createTable` would have to invent a schema-only
  * commit shape the format does not define (a table IS its first
  * commit). The mutating verbs refuse loudly.
  */
class GraftSnapCatalog extends TableCatalog {

  private var catalogName: String = _
  private var rootDir: String = _

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    rootDir = Option(options.get("root")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name needs spark.sql.catalog.$name.root — the " +
          "directory whose children are graft-snap table roots"))
  }

  override def name(): String = catalogName

  /** `graft.t` → `<root>/t`; nested namespaces map to subdirectories. */
  private def tableRoot(ident: Identifier): String =
    (ident.namespace() :+ ident.name())
      .foldLeft(rootDir)((p, seg) => SnapIO.join(p, seg))

  private def spark: SparkSession = SparkSession.active

  override def tableExists(ident: Identifier): Boolean =
    Snapshots.latestVersion(tableRoot(ident)).nonEmpty

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = namespace.foldLeft(rootDir)((p, seg) => SnapIO.join(p, seg))
    // an existing-but-empty namespace lists as empty; only a MISSING
    // directory is NoSuchNamespace (SnapIO.list returns empty for both,
    // so the distinction needs the existence probe)
    if (namespace.nonEmpty && !SnapIO.exists(dir))
      throw new NoSuchNamespaceException(namespace)
    SnapIO.list(dir).filterNot(_.isFile)
      .filter(s => Snapshots.latestVersion(s.path).nonEmpty)
      .map(s => Identifier.of(namespace, s.name)).toArray
  }

  override def loadTable(ident: Identifier): Table = {
    val root = tableRoot(ident)
    val v = Snapshots.latestVersion(root).getOrElse(
      throw new NoSuchTableException(ident))
    new GraftSnapTable(spark, fullName(ident), root, v)
  }

  /** `VERSION AS OF <v>` — the parser hands the version verbatim. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val root = tableRoot(ident)
    if (Snapshots.latestVersion(root).isEmpty)
      throw new NoSuchTableException(ident)
    val v = scala.util.Try(version.trim.toLong).getOrElse(
      throw new IllegalArgumentException(
        s"graft-snap versions are numbers; got '$version'"))
    new GraftSnapTable(spark, s"${fullName(ident)}@v$v", root, v)
  }

  /** `TIMESTAMP AS OF <ts>` — Spark resolves the literal in the session
    * zone and hands epoch MICROseconds.
    */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val root = tableRoot(ident)
    if (Snapshots.latestVersion(root).isEmpty)
      throw new NoSuchTableException(ident)
    val v = Snapshots.versionAsOf(root, timestampMicros / 1000L)
    new GraftSnapTable(spark, s"${fullName(ident)}@v$v", root, v)
  }

  private def fullName(ident: Identifier): String =
    (Seq(catalogName) ++ ident.namespace() :+ ident.name()).mkString(".")

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "graft-snap tables are born from their first commit — write " +
        s"df.write.format(\"graft-snap\").save(\"${tableRoot(ident)}\") " +
        "instead of CREATE TABLE")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "ALTER via the Scala surface: Snapshots.renameColumn/dropColumn " +
        "(zero-rewrite manifest rules)")

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException(
      "graft-snap history retirement is VACUUM (Snapshots.vacuum), " +
        "never a catalog drop — pinned readers own the retention contract")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "a graft-snap table root is its identity; move the directory")
}

/** One pinned version of a graft-snap table as a v2 `Table`: batch-read
  * capable, schema from the manifest's files' footers ([[SnapshotDataSource]]
  * rules — nullable, front-door contract enforced), scan =
  * `ParquetScanBuilder` over the manifest-backed file index, so filter
  * pushdown reaches BOTH parquet (row-group/page skipping) and the
  * manifest stats (file skipping with zero footer I/O).
  */
private[sources] class GraftSnapTable(spark: SparkSession, tblName: String,
                                      root: String, version: Long)
    extends Table with SupportsRead {

  private lazy val snap = {
    val s = Snapshots.snapshot(root, version)
    Snapshots.requireFrontDoor(s, root)
    s
  }

  override def name(): String = tblName

  override lazy val schema: StructType =
    SnapshotDataSource.cdcBaseSchema(spark, root, version)

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = {
    Snapshots.requireFrontDoor(snap, root)
    ParquetScanBuilder(spark,
      new GraftSnapPartitioningIndex(spark, root, snap), schema, schema,
      options)
  }
}

/** [[GraftSnapFileIndex]] adapted to the `PartitioningAwareFileIndex`
  * shape `ParquetScanBuilder` requires (the v2 file-scan route) — the
  * table is unpartitioned (layout comes from OPTIMIZE/z-order), so the
  * partition surface is empty and `listFiles` delegates straight to the
  * manifest-stats pruning index.
  */
private[graft] class GraftSnapPartitioningIndex(
    spark: SparkSession, root: String, snap: Snapshots.Snapshot)
    extends PartitioningAwareFileIndex(spark, Map.empty, None,
      FileStatusCache.getOrCreate(spark)) {

  private val inner = new GraftSnapFileIndex(root, snap)

  override def partitionSpec(): PartitionSpec = PartitionSpec.emptySpec

  override def leafFiles
      : scala.collection.mutable.LinkedHashMap[org.apache.hadoop.fs.Path,
        org.apache.hadoop.fs.FileStatus] = {
    val m = scala.collection.mutable.LinkedHashMap
      .empty[org.apache.hadoop.fs.Path, org.apache.hadoop.fs.FileStatus]
    inner.allStatuses.foreach(s => m.put(s.getPath, s): Unit)
    m
  }

  override def leafDirToChildrenFiles
      : Map[org.apache.hadoop.fs.Path, Array[org.apache.hadoop.fs.FileStatus]] =
    inner.allStatuses.groupBy(_.getPath.getParent)
      .map { case (d, ss) => d -> ss.toArray }

  // the load-bearing override: planning flows through the manifest's
  // file list and its embedded-stats pruning, not a directory listing
  override def listFiles(partitionFilters: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
                         dataFilters: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Seq[org.apache.spark.sql.execution.datasources.PartitionDirectory] =
    inner.listFiles(partitionFilters, dataFilters)

  override def rootPaths: Seq[org.apache.hadoop.fs.Path] = inner.rootPaths
  override def partitionSchema: StructType = StructType(Nil)
  override def sizeInBytes: Long = inner.sizeInBytes
  override def inputFiles: Array[String] = inner.inputFiles
  override def refresh(): Unit = ()
}
