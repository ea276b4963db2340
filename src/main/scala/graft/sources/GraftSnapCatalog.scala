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
  * Writes: `INSERT INTO graft.t` / `INSERT OVERWRITE graft.t` ride the
  * v2 `V1Write` fallback straight into the commit protocol (append /
  * pinned replace) — see [[GraftSnapTable.newWriteBuilder]]. DDL stays
  * out by design: a catalog `createTable` would have to invent a
  * schema-only commit shape the format does not define (a table IS its
  * first commit — make one with the DataFrame writer), ALTER is the
  * zero-rewrite rule surface, and retirement is VACUUM; those verbs
  * refuse loudly with pointers.
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

  /** `t$history` / `t$files` — the metadata tables every lakehouse
    * catalog grows (`DESCRIBE HISTORY` as a queryable relation): the
    * suffix selects the metadata view of table `t`, served by a
    * [[org.apache.spark.sql.connector.read.LocalScan]] (the rows ARE
    * driver-side manifest metadata — O(versions·segments) text, no
    * executor work to plan). A REAL committed table whose directory
    * name literally contains the suffix always wins — the meta route
    * only fires when no table exists at the literal name AND the suffix
    * is a known view, so no listed table ever becomes unqueryable.
    * Time travel composes: `$files VERSION AS OF v` lists that
    * version's manifest entries; `$history AS OF v` the history up to
    * it.
    */
  private def metaTable(ident: Identifier,
                        vOpt: Option[Long]): Option[Table] = {
    val cut = ident.name().lastIndexOf('$')
    if (cut <= 0) return None
    val meta = ident.name().substring(cut + 1)
    if (meta != "history" && meta != "files") return None
    if (Snapshots.latestVersion(tableRoot(ident)).nonEmpty)
      return None // a real table at the literal name wins
    val base = Identifier.of(ident.namespace(), ident.name().take(cut))
    val root = tableRoot(base)
    Snapshots.latestVersion(root).map { head =>
      val v = vOpt.getOrElse(head)
      require(Snapshots.versions(root).contains(v),
        s"version $v of ${fullName(base)} is not committed/retained")
      GraftSnapMetaTable(spark, fullName(ident), root, v, meta)
    }
  }

  override def loadTable(ident: Identifier): Table =
    metaTable(ident, None).getOrElse {
      val root = tableRoot(ident)
      val v = Snapshots.latestVersion(root).getOrElse(
        throw new NoSuchTableException(ident))
      new GraftSnapTable(spark, fullName(ident), root, v, pinned = false)
    }

  /** `VERSION AS OF <v>` — the parser hands the version verbatim. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val v = scala.util.Try(version.trim.toLong).getOrElse(
      throw new IllegalArgumentException(
        s"graft-snap versions are numbers; got '$version'"))
    metaTable(ident, Some(v)).getOrElse {
      val root = tableRoot(ident)
      if (Snapshots.latestVersion(root).isEmpty)
        throw new NoSuchTableException(ident)
      new GraftSnapTable(spark, s"${fullName(ident)}@v$v", root, v,
        pinned = true)
    }
  }

  /** `TIMESTAMP AS OF <ts>` — Spark resolves the literal in the session
    * zone and hands epoch MICROseconds.
    */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    // resolve the wall-clock against the DATA table's history in both
    // routes (a meta ident resolves via its base table)
    val cut = ident.name().lastIndexOf('$')
    val baseForTs =
      if (cut > 0 && Snapshots.latestVersion(tableRoot(ident)).isEmpty)
        Identifier.of(ident.namespace(), ident.name().take(cut))
      else ident
    val root = tableRoot(baseForTs)
    if (Snapshots.latestVersion(root).isEmpty)
      throw new NoSuchTableException(ident)
    val v = Snapshots.versionAsOf(root, timestampMicros / 1000L)
    metaTable(ident, Some(v)).getOrElse(
      new GraftSnapTable(spark, s"${fullName(ident)}@v$v", root, v,
        pinned = true))
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
  *
  * WRITES ride the `V1Write` fallback straight into the format's commit
  * protocol: `INSERT INTO graft.t` publishes an append commit (rebases
  * over concurrent committers like every append), `INSERT OVERWRITE` a
  * replace pinned to the table's latest (a concurrent commit conflicts
  * loudly, never a silent drop). A time-travel-pinned table
  * (`VERSION/TIMESTAMP AS OF`) refuses writes — history is immutable;
  * restore is the Scala surface's job.
  */
private[sources] class GraftSnapTable(spark: SparkSession, tblName: String,
                                      root: String, version: Long,
                                      pinned: Boolean)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {

  private lazy val snap = {
    val s = Snapshots.snapshot(root, version)
    Snapshots.requireFrontDoor(s, root)
    s
  }

  override def name(): String = tblName

  override lazy val schema: StructType =
    SnapshotDataSource.cdcBaseSchema(spark, root, version)

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = {
    Snapshots.requireFrontDoor(snap, root)
    ParquetScanBuilder(spark,
      new GraftSnapPartitioningIndex(spark, root, snap), schema, schema,
      options)
  }

  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    if (pinned) throw new UnsupportedOperationException(
      s"$tblName is a time-travel read (VERSION/TIMESTAMP AS OF) — " +
        "history is immutable; INSERT into the plain table name, or " +
        "Snapshots.restore to make an old state the new head")
    new org.apache.spark.sql.connector.write.WriteBuilder
        with org.apache.spark.sql.connector.write.SupportsTruncate {
      private var replace = false
      override def truncate()
          : org.apache.spark.sql.connector.write.WriteBuilder = {
        replace = true; this
      }
      override def build(): org.apache.spark.sql.connector.write.Write =
        new org.apache.spark.sql.connector.write.V1Write {
          override def toInsertableRelation
              : org.apache.spark.sql.sources.InsertableRelation =
            new org.apache.spark.sql.sources.InsertableRelation {
              override def insert(data: org.apache.spark.sql.DataFrame,
                                  overwrite: Boolean): Unit = {
                // SQL has no statsCols option, so INHERIT the stats
                // column set from the head's own entries — otherwise
                // one INSERT OVERWRITE would silently strip every
                // manifest bound and kill file skipping table-wide
                // (columns the footer lacks decode to "no bounds",
                // never an error)
                val head = Snapshots.latestVersion(root)
                val statsCols = head.map { h =>
                  val fs = Snapshots.snapshot(root, h).files
                  (fs.flatMap(_.stats.keys) ++ fs.flatMap(_.strStats.keys))
                    .distinct.sorted
                }.getOrElse(Seq.empty)
                // appends rebase over concurrent committers; an
                // overwrite is a replace pinned to the CURRENT latest
                // (not the loaded version — the standard lost-update
                // guard surfaces a concurrent commit as a conflict)
                if (replace || overwrite)
                  Snapshots.commit(root, data, "sql-insert-overwrite",
                    replace = true, basedOn = head,
                    statsCols = statsCols): Unit
                else
                  Snapshots.commit(root, data, "sql-insert",
                    statsCols = statsCols): Unit
              }
            }
        }
    }
  }
}

/** The `t$history` / `t$files` metadata tables: read-only relations
  * over manifest METADATA, served by a `LocalScan` (planning already
  * holds the rows — no executor job).
  *
  *  - `$history`: one row per retained version — the `DESCRIBE
  *    HISTORY` surface as a queryable relation (version, parent, note,
  *    commit_ts, n_files, n_tombstones, manifest_rows);
  *  - `$files`: one row per manifest entry of the LATEST version, all
  *    three kinds (`data` / `delete` / `posdelete`), with the entry's
  *    row count, commit seq and embedded size — the small-files /
  *    tombstone-churn inspection surface (`WHERE kind = 'posdelete'`,
  *    `ORDER BY bytes`).
  */
private[sources] object GraftSnapMetaTable {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.connector.read.{LocalScan, Scan}
  import org.apache.spark.sql.types.{LongType, StringType, StructField}
  import org.apache.spark.unsafe.types.UTF8String

  def apply(spark: SparkSession, name: String, root: String, v: Long,
            meta: String): Table = meta match {
    case "history" =>
      // a pinned read (`$history VERSION AS OF v`) shows history UP TO v
      val rows = Snapshots.versions(root).filter(_ <= v).map { ver =>
        val s = Snapshots.snapshot(root, ver)
        InternalRow.fromSeq(Seq(s.version, s.parent,
          UTF8String.fromString(s.note), s.ts, s.files.size.toLong,
          (s.deletes.size + s.posDeletes.size).toLong,
          s.files.map(_.rows).sum))
      }
      val schema = StructType(Seq(
        StructField("version", LongType), StructField("parent", LongType),
        StructField("note", StringType), StructField("commit_ts", LongType),
        StructField("n_files", LongType),
        StructField("n_tombstones", LongType),
        StructField("manifest_rows", LongType)))
      new MetaTable(name, schema, rows.toArray)
    case "files" =>
      val s = Snapshots.snapshot(root, v)
      def rowsOf(kind: String, es: Seq[Snapshots.FileEntry]) = es.map(e =>
        InternalRow.fromSeq(Seq(UTF8String.fromString(kind),
          UTF8String.fromString(e.path), e.rows, e.seq, e.bytes)))
      val rows = rowsOf("data", s.files) ++ rowsOf("delete", s.deletes) ++
        rowsOf("posdelete", s.posDeletes)
      val schema = StructType(Seq(
        StructField("kind", StringType), StructField("path", StringType),
        StructField("n_rows", LongType), StructField("seq", LongType),
        StructField("bytes", LongType)))
      new MetaTable(name, schema, rows.toArray)
    case other => throw new IllegalArgumentException(
      s"unknown metadata view '$other' (known: history, files)")
  }

  private final class MetaTable(tblName: String,
                                override val schema: StructType,
                                rowData: Array[InternalRow])
      extends Table with SupportsRead {
    override def name(): String = tblName
    override def capabilities(): util.Set[TableCapability] =
      util.EnumSet.of(TableCapability.BATCH_READ)
    override def newScanBuilder(options: CaseInsensitiveStringMap)
        : ScanBuilder = new ScanBuilder {
      override def build(): Scan = new LocalScan {
        override def rows(): Array[InternalRow] = rowData
        override def readSchema(): StructType = schema
        override def description(): String = tblName
      }
    }
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
