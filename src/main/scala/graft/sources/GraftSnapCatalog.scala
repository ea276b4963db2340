package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * pinned replace) — see [[GraftSnapTable.newWriteBuilder]].
  * `CREATE TABLE graft.t AS SELECT …` is ATOMIC CTAS (the
  * `StagingTableCatalog` route): the query's output stages under the
  * final root and manifest v1 publishes at commit — first-commit
  * semantics, a failed CTAS leaves no table behind. Row-level DML:
  * `DELETE FROM graft.t WHERE …` (v2 `SupportsDelete` → position
  * tombstones, O(matched) written) plus `CALL graft.update_where /
  * delete_where` for arbitrary SQL predicates; tombstone-bearing
  * versions READ through a merge-on-read `V1Scan`
  * ([[GraftSnapTable.newScanBuilder]]), so `SELECT` follows DML with no
  * compaction step. Schema-only `CREATE TABLE` stays out by design (a
  * table IS its first commit), ALTER is the zero-rewrite rule surface,
  * and retirement is VACUUM; those verbs refuse loudly with pointers.
  *
  * MAINTENANCE and DML procedures run as v2 PROCEDURES (the Iceberg
  * `CALL` surface, on Spark's native procedure API):
  *
  * {{{
  *   CALL graft.optimize(table => 't', order_by => 'k', target_mb => 128)
  *   CALL graft.checkpoint('t')
  *   CALL graft.vacuum('t', 5)          -- keep 5 versions (1 h age guard)
  *   CALL graft.restore('t', 3)         -- make v3 the new head
  *   CALL graft.update_where('t', 'b = b + 1; s = upper(s)', 'k % 7 = 0')
  *   CALL graft.delete_where('t', 'k % 7 = 0')
  * }}}
  *
  * Each returns its outcome as a one-row result (new version, counts),
  * so maintenance is scriptable from pure SQL.
  */
class GraftSnapCatalog extends TableCatalog
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog
    with org.apache.spark.sql.connector.catalog.StagingTableCatalog {

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
    // routes (a meta ident resolves via its base table). The ident is a
    // meta ident ONLY when its suffix is a KNOWN view — an unknown
    // suffix (`t$foo`) must resolve at its literal name and throw
    // NoSuchTableException like the other two overloads, never silently
    // serve the base table's data
    val cut = ident.name().lastIndexOf('$')
    val isMeta = cut > 0 &&
      Set("history", "files").contains(ident.name().substring(cut + 1)) &&
      Snapshots.latestVersion(tableRoot(ident)).isEmpty
    val baseForTs =
      if (isMeta) Identifier.of(ident.namespace(), ident.name().take(cut))
      else ident
    val root = tableRoot(baseForTs)
    if (Snapshots.latestVersion(root).isEmpty)
      throw new NoSuchTableException(ident)
    val v = Snapshots.versionAsOf(root, timestampMicros / 1000L)
    if (isMeta) metaTable(ident, Some(v)).getOrElse(
      throw new NoSuchTableException(ident))
    else new GraftSnapTable(spark, s"${fullName(ident)}@v$v", root, v,
      pinned = true)
  }

  private def fullName(ident: Identifier): String =
    (Seq(catalogName) ++ ident.namespace() :+ ident.name()).mkString(".")

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "graft-snap tables are born from their first commit — use " +
        s"CREATE TABLE ${fullName(ident)} AS SELECT ... (atomic CTAS) " +
        "or write df.write.format(\"graft-snap\")" +
        s".save(\"${tableRoot(ident)}\"); a schema-only CREATE would " +
        "invent a commit shape the format does not define")

  // ---- atomic CTAS (StagingTableCatalog) ---------------------------------
  // `CREATE TABLE graft.t AS SELECT …` stages the query's output under
  // the FINAL root (a manifest-less root is invisible to every reader
  // and catalog probe) and publishes manifest v1 only at
  // commitStagedChanges — first-commit semantics through the same
  // arbiter as every other commit, so a concurrent creator loses
  // LOUDLY and a failed CTAS leaves no table behind.

  override def stageCreate(ident: Identifier,
                           info: org.apache.spark.sql.connector.catalog.TableInfo)
      : org.apache.spark.sql.connector.catalog.StagedTable =
    stagedCreate(ident, info.schema(), info.partitions(), info.properties())

  override def stageCreate(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String])
      : org.apache.spark.sql.connector.catalog.StagedTable =
    stagedCreate(ident, schema, partitions, properties)

  private def stagedCreate(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String])
      : org.apache.spark.sql.connector.catalog.StagedTable = {
    require(partitions.isEmpty,
      "graft-snap is unpartitioned (layout comes from OPTIMIZE/z-order)")
    if (tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(ident)
    // TBLPROPERTIES('statsCols' = 'k,s') embeds manifest bounds in the
    // first commit — the CTAS twin of the writer's statsCols option
    val statsCols = Option(properties.get("statsCols"))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    new GraftSnapStagedTable(fullName(ident), tableRoot(ident), schema,
      statsCols)
  }

  override def stageReplace(ident: Identifier,
                            info: org.apache.spark.sql.connector.catalog.TableInfo)
      : org.apache.spark.sql.connector.catalog.StagedTable =
    throw new UnsupportedOperationException(
      "REPLACE TABLE rewrites a table's identity; use INSERT OVERWRITE " +
        s"${fullName(ident)} (a replace commit — history kept, pinned " +
        "readers unaffected) instead")

  override def stageCreateOrReplace(ident: Identifier,
                                    info: org.apache.spark.sql.connector.catalog.TableInfo)
      : org.apache.spark.sql.connector.catalog.StagedTable =
    if (tableExists(ident)) stageReplace(ident, info)
    else stageCreate(ident, info)

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

  // ---- maintenance procedures (CALL graft.<proc>(...)) -------------------

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.sameElements(Array("system")))
      GraftSnapProcedures.Names
        .map(Identifier.of(namespace, _)).toArray
    else Array.empty

  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure = {
    require(ident.namespace().isEmpty ||
      ident.namespace().sameElements(Array("system")),
      s"unknown procedure namespace ${ident.namespace().mkString(".")}")
    GraftSnapProcedures.load(this, ident.name())
  }

  /** Procedure support: table-name → root, via the catalog's mapping. */
  private[sources] def rootOfTableName(name: String): String = {
    val root = tableRoot(Identifier.of(Array.empty, name))
    require(Snapshots.latestVersion(root).nonEmpty,
      s"$catalogName.$name is not a committed graft-snap table")
    root
  }
}

/** The maintenance verbs as Spark v2 PROCEDURES — `OPTIMIZE` /
  * `CHECKPOINT` / `VACUUM` / `RESTORE` runnable from pure SQL, each
  * returning its outcome as a one-row [[org.apache.spark.sql.connector.read.LocalScan]]
  * result. The procedure bodies are thin delegations to the format's
  * Scala surface — same conflicts, same retention contract, same
  * age guards (`vacuum` keeps the 1 h in-flight-commit guard; tests
  * and emergency reclamation can pass `min_age_sec => 0`).
  */
private[sources] object GraftSnapProcedures {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
  import org.apache.spark.sql.connector.read.{LocalScan, Scan}
  import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructField}
  import org.apache.spark.unsafe.types.UTF8String

  val Names: Seq[String] =
    Seq("optimize", "checkpoint", "vacuum", "restore",
      "update_where", "delete_where")

  def load(cat: GraftSnapCatalog, name: String): UnboundProcedure =
    name match {
      case "optimize" => proc(name,
        "collapse a fragmented table into ~target_mb clustered files " +
          "(REPLACE commit; stats columns inherited from the head)",
        Seq(in("table", StringType), in("order_by", StringType),
          inDef("target_mb", IntegerType, "128")),
        StructType(Seq(StructField("version", LongType),
          StructField("n_files", LongType)))) { row =>
        val root = cat.rootOfTableName(row.getUTF8String(0).toString)
        val spark = SparkSession.active
        val v = Snapshots.optimizeFiles(spark, root,
          row.getUTF8String(1).toString.split(",").map(_.trim).toSeq,
          row.getInt(2).toLong * 1024 * 1024, Snapshots.headStatsCols(root))
        InternalRow.fromSeq(Seq(v,
          Snapshots.snapshot(root, v).files.size.toLong))
      }
      case "checkpoint" => proc(name,
        "collapse the head's segment-ref chain into one consolidated " +
          "segment (metadata-only commit)",
        Seq(in("table", StringType)),
        StructType(Seq(StructField("version", LongType)))) { row =>
        val root = cat.rootOfTableName(row.getUTF8String(0).toString)
        InternalRow.fromSeq(Seq(Snapshots.checkpoint(root)))
      }
      case "vacuum" => proc(name,
        "retire history past keep_versions and reclaim unreferenced " +
          "files (age-guarded; the retention window is the reader " +
          "contract)",
        Seq(in("table", StringType), in("keep_versions", IntegerType),
          inDef("min_age_sec", IntegerType, "3600")),
        StructType(Seq(StructField("deleted_files", LongType)))) { row =>
        val root = cat.rootOfTableName(row.getUTF8String(0).toString)
        InternalRow.fromSeq(Seq(Snapshots.vacuum(root, row.getInt(1),
          row.getInt(2).toLong * 1000L).toLong))
      }
      case "restore" => proc(name,
        "make an old version's exact state the new head (new commit " +
          "referencing its segments verbatim — nothing rewritten, " +
          "history kept)",
        Seq(in("table", StringType), in("version", LongType)),
        StructType(Seq(StructField("version", LongType)))) { row =>
        val root = cat.rootOfTableName(row.getUTF8String(0).toString)
        InternalRow.fromSeq(Seq(Snapshots.restore(root, row.getLong(1))))
      }
      case "update_where" => proc(name,
        "row-level UPDATE: assignments = 'col = expr; col2 = expr2' " +
          "(every expression evaluates against the OLD row), predicate " +
          "= any SQL boolean over the current shape; O(matched) " +
          "rewritten as one atomic commit (position tombstones + " +
          "rewrites), nothing else touched",
        Seq(in("table", StringType), in("assignments", StringType),
          in("predicate", StringType)),
        StructType(Seq(StructField("version", LongType)))) { row =>
        val root = cat.rootOfTableName(row.getUTF8String(0).toString)
        val spark = SparkSession.active
        import org.apache.spark.sql.functions.expr
        val sets = row.getUTF8String(1).toString.split(";")
          .map(_.trim).filter(_.nonEmpty).map { cl =>
            val i = cl.indexOf('=')
            require(i > 0,
              s"assignment '$cl' must be <column> = <expression> " +
                "(';'-separated)")
            cl.substring(0, i).trim -> expr(cl.substring(i + 1).trim)
          }.toMap
        InternalRow.fromSeq(Seq(Snapshots.updateWhere(spark, root,
          expr(row.getUTF8String(2).toString), sets,
          note = "call-update-where")))
      }
      case "delete_where" => proc(name,
        "row-level DELETE on ANY SQL predicate (the native DELETE FROM " +
          "covers v1-filter shapes; this covers the rest): O(matched) " +
          "position tombstones, nothing rewritten",
        Seq(in("table", StringType), in("predicate", StringType)),
        StructType(Seq(StructField("version", LongType)))) { row =>
        val root = cat.rootOfTableName(row.getUTF8String(0).toString)
        val spark = SparkSession.active
        InternalRow.fromSeq(Seq(Snapshots.deleteWhere(spark, root,
          org.apache.spark.sql.functions.expr(row.getUTF8String(1).toString),
          note = "call-delete-where")))
      }
      case other => throw new IllegalArgumentException(
        s"unknown procedure '$other' (known: ${Names.mkString(", ")})")
    }

  private def in(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()
  private def inDef(name: String, dt: DataType,
                    default: String): ProcedureParameter =
    ProcedureParameter.in(name, dt).defaultValue(default).build()

  private def proc(procName: String, desc: String,
                   params: Seq[ProcedureParameter], outSchema: StructType)
                  (body: InternalRow => InternalRow): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = procName
      override def description(): String = desc
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = procName
          override def description(): String = desc
          override def parameters(): Array[ProcedureParameter] =
            params.toArray
          override def isDeterministic: Boolean = false // commits/deletes
          override def call(input: InternalRow)
              : java.util.Iterator[Scan] = {
            val out = body(input)
            java.util.Collections.singletonList[Scan](new LocalScan {
              override def rows(): Array[InternalRow] = Array(out)
              override def readSchema(): StructType = outSchema
              override def description(): String = s"graft.$procName"
            }).iterator()
          }
        }
    }
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
    with org.apache.spark.sql.connector.catalog.SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsDelete {

  private lazy val snap = Snapshots.snapshot(root, version)

  /** Plain versions ride the vectorized parquet fast path; anything
    * else — live merge-on-read tombstones or rename/drop rules — reads
    * through the MERGED route below.
    */
  private def isPlain: Boolean =
    snap.deletes.isEmpty && snap.posDeletes.isEmpty && snap.rules.isEmpty

  /** The merge-on-read state as a planned frame (tombstone anti-joins,
    * per-group schema rules — [[Snapshots.readMerged]]). The key column
    * equality tombstones join on is recovered from the tombstone files'
    * OWN footers (`commitChanges` writes exactly the key column), so a
    * SQL reader needs no option; position-only tables never consult it.
    */
  private lazy val mergedFrame: DataFrame = {
    val keyCol =
      if (snap.deletes.isEmpty) ""
      else {
        val cols = spark.read
          .parquet(SnapIO.join(root, snap.deletes.head.path))
          .schema.fieldNames
        require(cols.length == 1,
          s"cannot infer the CDC key column of $tblName: its equality " +
            s"tombstones carry (${cols.mkString(", ")}) — read through " +
            "Snapshots.readMerged with an explicit keyCol")
        cols.head
      }
    Snapshots.readMerged(spark, root, keyCol, Some(version))
  }

  override def name(): String = tblName

  override lazy val schema: StructType =
    if (isPlain) SnapshotDataSource.cdcBaseSchema(spark, root, version)
    else mergedFrame.schema

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder =
    if (isPlain) {
      Snapshots.requireFrontDoor(snap, root)
      ParquetScanBuilder(spark,
        new GraftSnapPartitioningIndex(spark, root, snap), schema, schema,
        options)
    } else {
      // MERGE-ON-READ (or schema-rule) versions: one v2 batch scan
      // cannot express the tombstone anti-joins or the per-group rename
      // union, so the scan is a V1Scan handing Spark the format's own
      // readMerged plan — `SELECT` works right after a row-level
      // UPDATE/DELETE with NO compaction, the lakehouse contract. The
      // frame's InternalRow RDD passes through unconverted
      // (needConversion = false); predicates apply above the scan
      // (MOR read cost is the anti-join, not the missed pushdown).
      val declared = schema
      val frame = mergedFrame.select(
        declared.fieldNames.toSeq.map(mergedFrame.col): _*)
      new ScanBuilder {
        override def build(): org.apache.spark.sql.connector.read.Scan =
          new org.apache.spark.sql.connector.read.V1Scan {
            override def readSchema(): StructType = declared
            override def description(): String = s"$tblName (merge-on-read)"
            override def toV1TableScan[T <: org.apache.spark.sql.sources.BaseRelation
                with org.apache.spark.sql.sources.TableScan](
                context: org.apache.spark.sql.SQLContext): T =
              (new org.apache.spark.sql.sources.BaseRelation
                  with org.apache.spark.sql.sources.TableScan {
                override def sqlContext: org.apache.spark.sql.SQLContext =
                  context
                override def schema: StructType = declared
                override def needConversion: Boolean = false
                override def buildScan()
                    : org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] =
                  frame.queryExecution.toRdd
                    .asInstanceOf[org.apache.spark.rdd.RDD[
                      org.apache.spark.sql.Row]]
              }).asInstanceOf[T]
          }
      }
    }

  // ---- SQL row-level DELETE (SupportsDelete) -----------------------------
  // `DELETE FROM graft.t WHERE <pred>` — Spark translates the condition
  // to v1 filters and hands them here; the delete publishes POSITION
  // tombstones (O(matched) written, nothing rewritten), and the merged
  // scan above serves the post-DML state to the very next SELECT.
  // Predicates outside the v1 Filter algebra refuse at canDeleteWhere
  // (Spark surfaces the standard error); `CALL graft.delete_where` takes
  // arbitrary SQL predicates.

  override def canDeleteWhere(
      filters: Array[org.apache.spark.sql.sources.Filter]): Boolean = {
    if (pinned) throw new UnsupportedOperationException(
      s"$tblName is a time-travel read (VERSION/TIMESTAMP AS OF) — " +
        "history is immutable; DELETE from the plain table name")
    filters.forall(f => GraftSnapTable.filterToColumn(f).isDefined)
  }

  override def deleteWhere(
      filters: Array[org.apache.spark.sql.sources.Filter]): Unit = {
    val pred = filters.toSeq.flatMap(GraftSnapTable.filterToColumn)
      .reduceOption(_ && _)
      .getOrElse(org.apache.spark.sql.functions.lit(true))
    Snapshots.deleteWhere(spark, root, pred,
      note = "sql-delete-where"): Unit
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
                // SQL has no statsCols option — inherit the head's
                // (Snapshots.headStatsCols), else one INSERT OVERWRITE
                // would silently strip every manifest bound and kill
                // file skipping table-wide
                val statsCols = Snapshots.headStatsCols(root)
                // appends rebase over concurrent committers; an
                // overwrite is a replace pinned to the CURRENT latest
                // (not the loaded version — the standard lost-update
                // guard surfaces a concurrent commit as a conflict)
                if (replace || overwrite)
                  Snapshots.commit(root, data, "sql-insert-overwrite",
                    replace = true, basedOn = Snapshots.latestVersion(root),
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

/** One in-flight CTAS: the query's output stages under the final root
  * (invisible — no manifest yet), `commitStagedChanges` publishes
  * version 1 through the arbiter as a replace pinned to "empty", so a
  * concurrent creator of the same name loses LOUDLY. `abortStagedChanges`
  * removes only THIS attempt's staged data dirs, and drops the root only
  * when no committer published — a failed CTAS leaves no table behind,
  * and a lost create race never deletes the winner's table.
  */
private[graft] class GraftSnapStagedTable(tblName: String, root: String,
                                          expected: StructType,
                                          statsCols: Seq[String])
    extends org.apache.spark.sql.connector.catalog.StagedTable
    with org.apache.spark.sql.connector.catalog.SupportsWrite {

  @volatile private var staged: Seq[Snapshots.FileEntry] = Seq.empty

  // THIS attempt's commit dir, chosen up front: the abort path can then
  // reclaim even a mid-write failure's debris (whose entries were never
  // returned) without touching a concurrent attempt's staging
  private val attemptDir =
    s"ctas_${java.util.UUID.randomUUID().toString.take(12)}"

  override def name(): String = tblName
  override def schema(): StructType = expected
  // write-only during CTAS: advertising BATCH_READ without SupportsRead
  // would invite a capability-driven cast to blow up
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.V1_BATCH_WRITE)

  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new org.apache.spark.sql.connector.write.WriteBuilder {
      override def build(): org.apache.spark.sql.connector.write.Write =
        new org.apache.spark.sql.connector.write.V1Write {
          override def toInsertableRelation
              : org.apache.spark.sql.sources.InsertableRelation =
            new org.apache.spark.sql.sources.InsertableRelation {
              override def insert(data: DataFrame,
                                  overwrite: Boolean): Unit =
                staged = Snapshots.stageData(root, data, statsCols,
                  Some(attemptDir))
            }
        }
    }

  override def commitStagedChanges(): Unit =
    Snapshots.commitStaged(root, staged, "ctas"): Unit

  override def abortStagedChanges(): Unit = {
    // reclaim THIS attempt's commit dir (covers mid-write failures,
    // whose entries were never returned)…
    SnapIO.deleteTree(SnapIO.join(root, s"data/$attemptDir"))
    // …then retire the scaffold with strict RMDIR semantics (refuse
    // non-empty): a CONCURRENT CTAS of the same name may have staged
    // its own (unpublished) files here — an emptiness CHECK followed by
    // a recursive delete would race it and destroy the future winner's
    // data, so each level deletes only if actually empty
    if (Snapshots.latestVersion(root).isEmpty) {
      SnapIO.deleteDirIfEmpty(SnapIO.join(root, "data"))
      SnapIO.deleteDirIfEmpty(SnapIO.join(root, "_graft_snaps"))
      SnapIO.deleteDirIfEmpty(root)
    }
  }
}

private[sources] object GraftSnapTable {
  import org.apache.spark.sql.{functions => F}
  import org.apache.spark.sql.sources._

  /** One v1 `Filter` as a `Column` predicate — the algebra Spark's
    * DELETE translation emits. `None` = not expressible (the caller
    * refuses at `canDeleteWhere`, so Spark surfaces its standard
    * "cannot delete" error; arbitrary predicates take the
    * `CALL delete_where` route).
    */
  private[sources] def filterToColumn(f: Filter)
      : Option[org.apache.spark.sql.Column] = f match {
    case EqualTo(a, v) => Some(F.col(a) === F.lit(v))
    case EqualNullSafe(a, v) => Some(F.col(a) <=> F.lit(v))
    case GreaterThan(a, v) => Some(F.col(a) > F.lit(v))
    case GreaterThanOrEqual(a, v) => Some(F.col(a) >= F.lit(v))
    case LessThan(a, v) => Some(F.col(a) < F.lit(v))
    case LessThanOrEqual(a, v) => Some(F.col(a) <= F.lit(v))
    case In(a, vs) => Some(F.col(a).isin(vs.toIndexedSeq: _*))
    case IsNull(a) => Some(F.col(a).isNull)
    case IsNotNull(a) => Some(F.col(a).isNotNull)
    case And(l, r) =>
      for { lc <- filterToColumn(l); rc <- filterToColumn(r) } yield lc && rc
    case Or(l, r) =>
      for { lc <- filterToColumn(l); rc <- filterToColumn(r) } yield lc || rc
    case Not(c) => filterToColumn(c).map(!_)
    case StringStartsWith(a, v) => Some(F.col(a).startsWith(v))
    case StringEndsWith(a, v) => Some(F.col(a).endsWith(v))
    case StringContains(a, v) => Some(F.col(a).contains(v))
    case _: AlwaysTrue => Some(F.lit(true))
    case _: AlwaysFalse => Some(F.lit(false))
    case _ => None
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

  override lazy val leafFiles
      : scala.collection.mutable.LinkedHashMap[org.apache.hadoop.fs.Path,
        org.apache.hadoop.fs.FileStatus] = {
    val m = scala.collection.mutable.LinkedHashMap
      .empty[org.apache.hadoop.fs.Path, org.apache.hadoop.fs.FileStatus]
    inner.allStatuses.foreach(s => m.put(s.getPath, s): Unit)
    m
  }

  override lazy val leafDirToChildrenFiles
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
